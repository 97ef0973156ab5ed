"""Deterministic sampling and corpus mixing.

Training pipelines never use rand() sampling: runs must be reproducible,
resumable, and consistent across retries — so membership is a pure
function of the row key. `hash_sample` keeps a row iff a hash of its key
falls under the rate; `mix_corpus` applies per-source rates (the standard
source-weighting step when blending crawl slices).

The hash is an md5 prefix (engine-portable — the DuckDB oracle reproduces
membership bit-for-bit); a `salt` decorrelates independent samples drawn
from the same keys. Map-only: no shuffle, prunes with the scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import md5_prefix_long

_BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt:key) — deterministic and
    engine-portable (32-bit prefix, same formula as the oracle twins)."""
    keyed = F.concat(F.lit(f"{salt}:"), key.cast("string"))
    return F.pmod(md5_prefix_long(keyed), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, decided per-key (stable across runs/retries)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(hash_bucket(F.col(key_col), salt) < int(rate * _BUCKETS))


def mix_corpus(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-source sampling rates in ONE scan (no per-source unions): the
    row's threshold comes from its source. Sources absent from `rates` use
    default_rate (0.0 = drop — the allowlist semantics of corpus mixing)."""
    thresh = F.lit(int(default_rate * _BUCKETS))
    for src, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {src!r} must be in [0, 1], got {rate}")
        thresh = F.when(
            F.col(source_col) == src, F.lit(int(rate * _BUCKETS))
        ).otherwise(thresh)
    return df.where(hash_bucket(F.col(key_col), salt) < thresh)
