"""Deterministic sampling operators for training-data pipelines.

A 100 TB curation run samples constantly — smoke subsets, eval
holdouts, per-source quotas — and `df.sample()` is the wrong tool: it
is seed- and partitioning-dependent, so reruns, retries, and other
engines disagree about membership. These operators decide membership
from a content hash (md5 — identical in Spark and DuckDB, like the
dedup family), so a sample is a pure FUNCTION of (key, salt):
reproducible across runs, engines, and cluster layouts, and stable
under appends (existing rows never change membership when new rows
arrive — the property that makes eval holdouts trustworthy).

* ``deterministic_sample`` — Bernoulli-style keep/drop per row:
  map-only, no shuffle, the predicate whole-stage-codegens right after
  the scan. The salt separates independent samples of the same table
  (holdout vs smoke subset) — WITHOUT it, every 1% sample would be a
  subset of every 10% sample.
* ``stratified_sample`` — top-n per stratum in hash order (quota
  sampling): one window shuffle on the strata key; balances skewed
  strata (a dominant source/language cannot flood the sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BUCKETS = 1_000_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from the first 8 hex chars of
    md5(salt || key) — portable to any engine with md5."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(_BUCKETS)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "smp",
) -> DataFrame:
    """Keep each row iff its hash bucket falls below ``rate`` — a
    reproducible, append-stable Bernoulli(rate) sample keyed on
    ``key_col``. Map-only (no shuffle)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]; got {rate}")
    cut = int(rate * _BUCKETS)
    return df.where(_hash_bucket(F.col(key_col), salt) < F.lit(cut))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "smp",
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen in hash order
    (deterministic quota sampling). Output adds ``smp_rank`` (1-based
    position within the stratum) so callers can take nested prefixes
    (rank <= m is itself a valid smaller sample)."""
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1; got {n_per_stratum}")
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("smp_rank", F.row_number().over(w))
        .where(F.col("smp_rank") <= n_per_stratum)
    )
