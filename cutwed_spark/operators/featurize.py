"""Per-turn featurization: text/role/tool -> R^dim double vector.

The reference scores series of points in R^dim (dim <= 32,
/root/reference/src/cuTWED.cu:38); our points are per-turn feature
vectors built ENTIRELY from Catalyst built-ins (higher-order functions +
xxhash64) — no Python in this stage, so it whole-stage-codegens and the
``text`` column can be pruned immediately after
(SURVEY.md §4 "column pruning").

Layout of the vector (default n_buckets=8 -> dim=14):
  [0..n_buckets)   hashed bag-of-words bucket counts (pmod(xxhash64(w), n))
  [n_buckets + 0]  role code * 3  (user=0, assistant=1, tool=2, system=3)
  [n_buckets + 1]  tool bucket (pmod(xxhash64(tool), 7) + 1; 0 if no tool)
  [n_buckets + 2]  log1p(char length)
  [n_buckets + 3]  word count
  [n_buckets + 4]  mean word length
  [n_buckets + 5]  punctuation count

Deterministic, locale-free, and cheap; duplicates with small word edits
land at small L2 distance per turn, so TWED separates them from
same-topic non-duplicates.

The word-bucket array is materialized as an aliased column in its OWN
projection before the n_buckets count filters consume it: Spark skips
common-subexpression elimination inside higher-order-function lambdas,
so inlining the split+lower+xxhash64 tree into every filter recomputes
it n_buckets times (measured ~3.8x on this stage at n_buckets=16; same
trap as assemble.assemble_with_signatures). The non-cheap multiply-
referenced alias also stops CollapseProject from undoing the split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def feature_dim(n_buckets: int = DEFAULT_BUCKETS) -> int:
    return n_buckets + 6


def words_col(text: str = "text") -> Column:
    """Lower-cased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(F.col(text)), r"\s+"), lambda w: w != "")


def _feature_array(
    wb: Column,
    n_buckets: int,
    bucket_scale: float,
    role_scale: float,
) -> Column:
    """array<double> feature vector from a MATERIALIZED word-bucket-id
    array column ``wb`` plus the raw text/role/tool columns. ``size(wb)``
    doubles as the word count (one bucket id per word)."""
    buckets = [
        (
            F.size(F.filter(wb, lambda h: h == k)) * F.lit(float(bucket_scale))
        ).cast("double")
        for k in range(n_buckets)
    ]
    role_code = (
        F.when(F.col("role") == "user", 0.0)
        .when(F.col("role") == "assistant", 1.0)
        .when(F.col("role") == "tool", 2.0)
        .otherwise(3.0)
    )
    tool_code = F.when(
        (F.col("tool").isNotNull()) & (F.col("tool") != ""),
        (F.pmod(F.xxhash64(F.col("tool")), F.lit(7)) + F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    n_chars = F.length(F.coalesce(F.col("text"), F.lit(""))).cast("double")
    n_words = F.size(wb).cast("double")
    surface = [
        role_code * F.lit(float(role_scale)),
        tool_code,
        F.log1p(n_chars),
        n_words,
        F.when(n_words > 0, n_chars / n_words).otherwise(0.0),
        F.length(
            F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"[^.!?,;:]", "")
        ).cast("double"),
    ]
    return F.array(*buckets, *surface)


def with_turn_features(
    df: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    out: str = "feat",
    bucket_scale: float = 1.0,
    role_scale: float = 3.0,
) -> DataFrame:
    """transcripts + ``feat: array<double>`` + ``text_hash: bigint``
    (per-turn text-equality invariant carrier) + ``t: double`` (epoch
    seconds, float64 — the TWED time axis, matching the reference's
    plain-float time stamps, /root/reference/cuTWED/cuTWED.py:38-44)."""
    staged = df.select(
        "*",
        F.transform(
            words_col(), lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets))
        ).alias("_wb"),
    )
    return staged.select(
        *df.columns,
        _feature_array(
            F.col("_wb"), n_buckets, bucket_scale, role_scale
        ).alias(out),
        F.xxhash64(F.col("text")).alias("text_hash"),
        # cast covers TIMESTAMP_NTZ parquet columns (session TZ is UTC)
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000.0)
        ).cast("double").alias("t"),
    )
