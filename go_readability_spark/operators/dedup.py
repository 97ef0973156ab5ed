"""Deduplication operators for web-scale corpora.

Four tiers, cheapest to most semantic:
  * exact        — hash-groupBy on a normalized-text fingerprint
  * n-gram Jaccard — exact set similarity over word shingles (oracle-able)
  * MinHash+LSH  — the scale path: signatures → bands → bucket join
  * SimHash      — bitwise near-dup fingerprint (vectorized pandas UDF)

All the heavy lifting is JVM-side DataFrame ops; the only Python is the
SimHash bit-twiddling (Arrow-batched). Shuffle analysis in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint


def normalized_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one shuffle (groupBy fingerprint). Returns
    (fingerprint, canonical_id, dup_count) for groups with >1 member.
    At 100 TB: the groupBy key is a 32-char md5 — partial aggregation
    (map-side combine) reduces shuffle volume to ~#distinct docs."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
        .where(F.col("dup_count") > 1)
    )


def deduplicate_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of every exact-duplicate group."""
    w = df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint")
    )
    keep = w.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


def word_shingles(col, n: int = 3):
    """Distinct word n-grams from a *token array column*. IMPORTANT: pass a
    staged column (see shingle_table), not a raw expression — Catalyst does
    not CSE subexpressions into higher-order-function lambdas, so an inline
    tokenizer would re-split the text once per shingle (measured 19x slower
    at sf0.1)."""
    count = F.size(col) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(0))),
        lambda i: F.array_join(F.slice(col, i, n), " "),
    )
    return F.array_distinct(grams)


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """(id, shingles) with tokens staged as a real column between the two
    selects, keeping every lambda O(1) per element."""
    tokens = F.split(F.trim(normalized_text(F.col(text_col))), " ")
    staged = df.select(F.col(id_col).alias("id"), tokens.alias("toks"))
    return staged.select(
        "id", word_shingles(F.col("toks"), n).alias("shingles")
    ).where(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.

    Plan: explode distinct shingles → self-join on shingle (the shuffle is
    on the shingle hash — hot shingles are the skew risk; at 100 TB add a
    frequency cap on shingles before the join) → count intersections →
    jaccard = inter / (|A| + |B| - inter).
    """
    # persist before exploding (CollapseProject would re-inline the shingle
    # expression into the Generate operator — see winnowing.py)
    shingled = shingle_table(df, id_col, text_col, n).persist()
    sizes = shingled.select("id", F.size("shingles").alias("n_shingles"))
    exploded = shingled.select("id", F.explode("shingles").alias("shingle"))

    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes).withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "size_a"), "id_a")
        .join(F.broadcast(sizes).withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "size_b"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document, entirely JVM-side:
    sig[k] = min over shingles of xxhash64(k, shingle). One narrow pass,
    no shuffle (array ops per row over a staged shingle column)."""
    shingled = shingle_table(df, id_col, text_col, n)
    sh = F.col("shingles")
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, k=k: F.xxhash64(F.lit(k), s)))
            for k in range(num_hashes)
        ]
    )
    return shingled.select("id", sig.alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame, num_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: hash each signature band, bucket-join docs sharing a
    band bucket. Shuffle key = (band, bucket-hash) — uniformly distributed
    by construction, so no salting needed. Returns candidate pairs."""
    bands = F.posexplode(
        F.array(
            *[
                F.xxhash64(
                    F.lit(b),
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(F.col("signature"), b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    ),
                )
                for b in range(num_bands)
            ]
        )
    )
    buckets = signatures.select(F.col("id"), bands.alias("band", "bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline with exact-Jaccard verification
    of the (small) candidate set.

    Verification is per-PAIR: candidate pairs join the shingle arrays of
    both sides and compute |A∩B| via array_intersect — O(candidates), not
    a second global shingle self-join. At 100 TB the candidate set is
    orders of magnitude smaller than the corpus, so this is the step that
    keeps the exact check affordable."""
    rows_per_band = num_hashes // num_bands
    # materialize signatures once: the banding self-join references the
    # signature plan on both sides (at 10^12 scale this is a checkpointed
    # signatures table, not a cache)
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).persist()
    candidates = minhash_lsh_candidates(sigs, num_bands, rows_per_band)
    shingled = shingle_table(df, id_col, text_col, n)
    sa = shingled.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", inter)
        .withColumn("size_a", F.size("sh_a"))
        .withColumn("size_b", F.size("sh_b"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
    )


# --------------------------------------------------------------------- SimHash

SIMHASH_SCHEMA = "id long, simhash long"


def simhash_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc via an Arrow-batched mapInPandas (the bit
    accumulation isn't expressible as a reasonable column tree)."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), normalized_text(F.col(text_col)).alias("t"))

    def compute(batches):
        import hashlib

        import numpy as np

        # bit i of the hash == bit i of the little-endian unpacked matrix
        for pdf in batches:
            out_ids, out_hashes = [], []
            for i in range(len(pdf)):
                toks = (pdf["t"].iat[i] or "").split()
                if toks:
                    digests = np.frombuffer(
                        b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks),
                        dtype=np.uint8,
                    ).reshape(len(toks), 8)
                    bits = np.unpackbits(digests, axis=1, bitorder="big")
                    # digest bytes are big-endian 64-bit ints: column j holds
                    # bit (63-j); accumulate +1/-1 votes per bit position
                    votes = (2 * bits.astype(np.int32) - 1).sum(axis=0)
                    sh = 0
                    for j in range(64):
                        if votes[j] > 0:
                            sh |= 1 << (63 - j)
                else:
                    sh = 0
                out_ids.append(pdf["id"].iat[i])
                # store as signed int64
                out_hashes.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({"id": out_ids, "simhash": out_hashes})

    return src.mapInPandas(compute, schema=SIMHASH_SCHEMA)


def simhash_near_pairs(simhashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ k. Banding on 16-bit chunks
    (pigeonhole: distance ≤3 ⇒ at least one of 4 chunks equal) keeps the
    join keyed instead of cross."""
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).cast("int")
            for i in range(4)
        ]
    )
    banded = simhashes.select("id", "simhash", F.posexplode(chunks).alias("chunk_no", "chunk"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_no") == F.col("b.chunk_no"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
