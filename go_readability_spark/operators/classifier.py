"""Trained document-quality classifier (fastText-style linear model).

The third standard leg of quality filtering next to the heuristic gates
(functions/quality_filters.py) and the bigram-LM score (operators/
lm_score.py): a linear classifier DISTILLED from the cheap gates — train
once against weak-supervision labels, then score the whole corpus with
pure column arithmetic (no UDF, no model server). Training uses
pyspark.ml's LogisticRegression (distributed L-BFGS over the assembled
feature vectors); the trained weights are a tiny frozen artifact shipped
next to the corpus, exactly like the IVF index (sources/
ivf_index_sf001.json).

Engine-portability design: the five features derive from the
hash-verified text_features columns with +,-,*,/ and least() only (no
transcendentals — IEEE divide/multiply are correctly rounded, so the
values are bit-identical in Spark and DuckDB), and the logit is one
shared SQL template evaluated left-to-right in both engines — which is
what lets the driver's DuckDB oracle hash-verify even the float logits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# shared-dialect feature expressions over the text_features columns
# (ws_tokens, bpe_tokens, punct_ratio, stopword_ratio) plus raw text.
# Valid verbatim in BOTH Spark SQL and DuckDB.
FEATURE_SQL = {
    "f_tokens": "least(ws_tokens, 500) / 500.0",
    "f_punct": "punct_ratio",
    "f_stop": "stopword_ratio",
    "f_bpe_per_ws": (
        "CASE WHEN ws_tokens = 0 THEN 0.0 "
        "ELSE least(bpe_tokens / ws_tokens, 3.0) / 3.0 END"
    ),
    "f_len": "least(length({text}), 5000) / 5000.0",
}
FEATURE_ORDER = tuple(FEATURE_SQL)


def feature_sql(text_col: str = "text") -> dict:
    """The feature templates bound to a concrete text column name."""
    return {k: v.format(text=text_col) for k, v in FEATURE_SQL.items()}


def logit_sql(weights: dict, text_col: str = "text") -> str:
    """One left-to-right linear-combination template, shared by both
    engines; repr() keeps the float64 weights exact."""
    feats = feature_sql(text_col)
    expr = f"({repr(float(weights['intercept']))})"
    for name in FEATURE_ORDER:
        expr += f" + ({repr(float(weights['coefs'][name]))}) * ({feats[name]})"
    return expr


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text -> the verified text_features columns -> the five model
    features (as DoubleType columns f_*)."""
    from ..functions import with_text_features

    out = with_text_features(df, text_col)
    feats = feature_sql(text_col)
    for name in FEATURE_ORDER:
        out = out.withColumn(name, F.expr(feats[name]).cast("double"))
    return out


def train_quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_expr: str = "CASE WHEN quality >= 0.5 AND lang_id = 'en' THEN 1.0 ELSE 0.0 END",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> dict:
    """Distributed training via pyspark.ml LogisticRegression against
    weak-supervision labels (default: the heuristic quality gate — the
    classic distillation setup; swap label_expr for human labels when
    you have them). Returns {intercept, coefs: {feature: w}} — the
    frozen artifact for score_with_weights."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    staged = with_quality_features(docs, text_col).withColumn(
        "label", F.expr(label_expr)
    )
    assembled = VectorAssembler(
        inputCols=list(FEATURE_ORDER), outputCol="features"
    ).transform(staged)
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features",
        labelCol="label",
    ).fit(assembled)
    return {
        "intercept": float(model.intercept),
        "coefs": {
            name: float(w)
            for name, w in zip(FEATURE_ORDER, model.coefficients.toArray())
        },
    }


def score_with_weights(df: DataFrame, weights: dict,
                       text_col: str = "text") -> DataFrame:
    """Score every document with a frozen weight artifact: adds
    `logit` (rounded to 6 for portability) and `pred_quality`
    (logit >= 0). Pure column arithmetic — map-only at any scale."""
    staged = with_quality_features(df, text_col)
    z = F.expr(logit_sql(weights, text_col))
    return staged.withColumn("logit", F.round(z, 6)).withColumn(
        "pred_quality", z >= 0
    )
