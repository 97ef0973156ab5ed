"""CCNet-style language-model quality scoring: train an add-one-smoothed
bigram LM on a deterministic hash-sample of the corpus, then score every
document by its per-bigram negative log-likelihood. CCNet (Wenzek et al.,
2020) ranks crawl text by LM perplexity exactly this way (they use
KenLM 5-grams; the bigram form keeps the architecture while staying
dependency-free and oracle-expressible).

Scale shape (the sf0.01 plan IS the 100 TB plan):
- tokenize = narrow map; token positions via posexplode (the generator
  expression is evaluated once per row, so no persist is needed here);
- vocab (count >= min_count) is small and bounded by language, not corpus
  size -> broadcast join for the <unk> mapping;
- bigram formation via lead() over (doc_id, pos) — one shuffle, the same
  partitioning the per-doc aggregation reuses;
- unigram/bigram counts are groupBys with map-side partial aggregation;
- the scoring join is keyed by bigram; hot keys ("of the") are exactly
  what AQE skew-join splits. The LM table itself is capped by min_count,
  so it broadcasts in practice (smoothing absorbs the long tail).

Exactness: every per-bigram log-probability is quantized to integer
micro-nats (round(ln(p)*1e6) as BIGINT) BEFORE summing — integer sums are
order-independent, so the DuckDB oracle twin matches bit-for-bit even
though float summation order differs between engines. IEEE division is
correctly rounded in both engines; ln may differ by 1 ulp, which is ~10
orders of magnitude below the micro-nat quantum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import DUCK_WS_CLASS, md5_prefix_long

UNK = "<unk>"


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, tok) — lowercased whitespace tokens with position."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    return docs.select(F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok"))


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_pct: int = 40,
    min_count: int = 5,
    salt: str = "lm",
) -> DataFrame:
    """Score each document under a bigram LM trained on `sample_pct`% of
    the corpus (membership = md5 hash of the id — identical on retries
    and reproducible in any engine).

    Returns (doc_id, n_bigrams, n_oov_bigrams, nll_micro):
    nll_micro = -sum(round(ln p(w2|w1) * 1e6)) over the doc's bigrams,
    p = (c(w1,w2)+1) / (c(w1)+V), V = |vocab|+1 (the +1 is <unk>).
    Docs with < 2 tokens have no bigrams and are absent from the output.
    """
    ex = _doc_tokens(docs, id_col, text_col)

    in_sample = (
        md5_prefix_long(F.concat(F.lit(salt + ":"), F.col("id").cast("string")))
        % 100
        < sample_pct
    )
    ex = ex.withColumn("is_train", in_sample)

    # vocab from the training sample only (the LM must not see eval-side
    # tokens — same discipline as decontamination)
    vocab = (
        ex.where("is_train")
        .groupBy("tok")
        .count()
        .where(F.col("count") >= min_count)
        .select("tok")
    )
    v_size = vocab.agg((F.count("*") + 1).alias("V"))  # +1: <unk>

    mapped = (
        ex.join(F.broadcast(vocab.withColumn("_kept", F.lit(True))), "tok", "left")
        .select(
            "id",
            "pos",
            "is_train",
            F.when(F.col("_kept"), F.col("tok")).otherwise(F.lit(UNK)).alias("w"),
        )
    )

    w_doc = Window.partitionBy("id").orderBy("pos")
    bigrams = (
        mapped.withColumn("w2", F.lead("w").over(w_doc))
        .where(F.col("w2").isNotNull())
        .select("id", "is_train", F.col("w").alias("w1"), "w2")
    )

    bg_counts = (
        bigrams.where("is_train").groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    )
    ctx_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))

    scored = (
        bigrams.join(bg_counts, ["w1", "w2"], "left")
        .join(ctx_counts, ["w1"], "left")
        .crossJoin(F.broadcast(v_size))
        .select(
            "id",
            F.col("c12").isNull().cast("int").alias("is_oov"),
            F.round(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("V")).cast("double")
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )

    return scored.groupBy("id").agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.sum("is_oov").cast("int").alias("n_oov_bigrams"),
        (-F.sum("logp_micro")).alias("nll_micro"),
    ).withColumnRenamed("id", id_col)


def duck_bigram_lm_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_pct: int = 40,
    min_count: int = 5,
    salt: str = "lm",
) -> str:
    """ANSI/DuckDB twin of :func:`bigram_lm_scores` — same sample, same
    vocab, same smoothing, same micro-nat quantization."""
    member = (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" % 100 < {sample_pct}"
    )
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id,
                   list_filter(string_split_regex(lower(trim({text_col})),
                               '{DUCK_WS_CLASS}'),
                               x -> x != '') AS t
            FROM {table}
        ),
        ex AS (
            SELECT id, ({member}) AS is_train, u.pos AS pos, u.tok AS tok
            FROM (
                SELECT id, unnest(list_transform(range(1, len(t) + 1),
                           i -> struct_pack(pos := i, tok := t[i]))) AS u
                FROM toks
            )
        ),
        vocab AS (
            SELECT tok FROM ex WHERE is_train
            GROUP BY tok HAVING count(*) >= {min_count}
        ),
        vsize AS (SELECT count(*) + 1 AS V FROM vocab),
        mapped AS (
            SELECT e.id, e.pos, e.is_train,
                   CASE WHEN v.tok IS NOT NULL THEN e.tok ELSE '<unk>' END AS w
            FROM ex e LEFT JOIN vocab v ON v.tok = e.tok
        ),
        bigrams AS (
            SELECT id, is_train, w AS w1,
                   lead(w) OVER (PARTITION BY id ORDER BY pos) AS w2
            FROM mapped
        ),
        bg AS (SELECT * FROM bigrams WHERE w2 IS NOT NULL),
        bgc AS (
            SELECT w1, w2, count(*) AS c12 FROM bg WHERE is_train GROUP BY w1, w2
        ),
        ctx AS (SELECT w1, sum(c12) AS c1 FROM bgc GROUP BY w1),
        scored AS (
            SELECT b.id,
                   CASE WHEN c.c12 IS NULL THEN 1 ELSE 0 END AS is_oov,
                   CAST(round(ln((coalesce(c.c12, 0) + 1)
                        / CAST(coalesce(x.c1, 0) + (SELECT V FROM vsize) AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS logp_micro
            FROM bg b
            LEFT JOIN bgc c ON c.w1 = b.w1 AND c.w2 = b.w2
            LEFT JOIN ctx x ON x.w1 = b.w1
        )
        SELECT id AS {id_col},
               CAST(count(*) AS INTEGER) AS n_bigrams,
               CAST(sum(is_oov) AS INTEGER) AS n_oov_bigrams,
               CAST(-sum(logp_micro) AS BIGINT) AS nll_micro
        FROM scored
        GROUP BY id
    """
