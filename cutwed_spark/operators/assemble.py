"""Series assembly: transcripts (one row per turn) -> one row per
conversation with sorted value/time arrays.

The Spark analog of the reference's "dense C-ordered (n, dim) array with
time the slow axis" (/root/reference/README.rst:40-42): per conversation
we build ``values: array<array<double>>`` (n_turns x dim) and
``times: array<double>`` (relative float64 seconds).

Stable ordering invariant: ``collect_list`` order is NOT deterministic
under shuffle, so turns are collected as structs keyed by ``turn_idx``
and ``array_sort``-ed — the per-row invariant the driver checks
(SURVEY.md §7 hard part 6). Never rely on collect_list order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cutwed_spark.operators.featurize import DEFAULT_BUCKETS, with_turn_features


def assemble_series(
    transcripts: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    max_turns: int | None = 512,
    bucket_scale: float = 1.0,
    role_scale: float = 3.0,
) -> DataFrame:
    """-> conv_id, n_turns, values, times, text_hashes, tool_sig, n_truncated.

    * ``times`` are made conversation-relative (t - t_first) so absolute
      epoch offsets never enter the DP (float64 precision at 2025 epochs
      would eat ~6 significant digits otherwise).
    * ``max_turns`` caps DP cost (O(nA*nB) per pair); truncation is
      SURFACED in ``n_truncated`` — no silent truncation
      (SURVEY.md §7 hard part 3).
    * ``tool_sig`` is the exact tool-sequence signature used as a
      blocking axis (north_star: "tool-sequence signatures").
    """
    feat = with_turn_features(
        transcripts, n_buckets, bucket_scale=bucket_scale, role_scale=role_scale
    )
    collected = feat.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "feat", "t", "text_hash", "tool"))
        ).alias("turns"),
        F.count(F.lit(1)).alias("n_turns_raw"),
    )
    turns = F.col("turns")
    if max_turns is not None:
        turns = F.slice(F.col("turns"), 1, max_turns)
    t0 = turns[0]["t"]
    out = collected.select(
        "conv_id",
        F.size(turns).cast("int").alias("n_turns"),
        (F.col("n_turns_raw") - F.size(turns)).cast("int").alias("n_truncated"),
        # FLAT (n_turns * dim) value buffer — the reference's dense
        # C-ordered layout (README.rst:40-42). One list level fewer
        # halves Arrow offset overhead on the scoring hot path; reshape
        # is free NumPy inside the UDF. Stored as float32: every feature
        # is a small count/ratio (24-bit mantissa exact for the counts,
        # ~1e-7 relative on the ratios), which halves state size and
        # scoring shuffle/transfer bytes; the scoring UDF upcasts to
        # float64 before the DP, so scores stay oracle-exact for these
        # stored values. Times stay float64 (sub-second precision over
        # long conversations).
        F.flatten(F.transform(turns, lambda s: s["feat"]))
        .cast("array<float>")
        .alias("values_flat"),
        F.transform(turns, lambda s: s["t"] - t0).alias("times"),
        F.transform(turns, lambda s: s["text_hash"]).alias("text_hashes"),
        F.concat_ws(
            "|", F.filter(F.transform(turns, lambda s: s["tool"]), lambda x: x != "")
        ).alias("tool_sig"),
    )
    return out


def assembly_stats(series: DataFrame) -> DataFrame:
    """Per-corpus assembly metrics (lineage/metrics table input)."""
    return series.agg(
        F.count(F.lit(1)).alias("n_conversations"),
        F.sum("n_turns").alias("n_turns_total"),
        F.max("n_turns").alias("max_turns"),
        F.sum("n_truncated").alias("n_turns_truncated"),
        F.avg("n_turns").alias("avg_turns"),
    )
