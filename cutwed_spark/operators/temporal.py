"""Temporal join operators Spark lacks as built-ins: as-of join and
bucketed interval (range) join.

Both are expressed as compositions of existing DataFrame ops chosen
for their shuffle shape, not as UDFs:

- ``asof_join`` is the union+running-window formulation: ZERO joins,
  exactly one Exchange per side (hash on the key), then a single
  running ``last(..., ignorenulls=True)`` over the time-merged stream.
  The usual sort-merge-with-inequality or per-key collect formulations
  either degenerate to a broadcast-nested-loop (O(n*m) per key) or
  hold whole keys in memory; this one is a linear scan per partition
  and skew is bounded by the per-key row count, same as any window.

- ``range_join_bucketed`` is the bin-bucketing formulation of an
  interval join: each right row lands in exactly ONE time bucket, each
  left interval explodes to the few buckets it spans (2 when
  ``bucket_width`` >= the interval length), and the O(n*m) inequality
  join becomes an equi-join on (key, bucket) + an exact residual
  filter. Catalyst turns the equi-join into a plain shuffled hash
  join; no BroadcastNestedLoopJoin anywhere. A matched (left, right)
  pair appears exactly once because the right side is NOT exploded.

Reference analog: the reference's batch API evaluates all (A[i], B[j])
pairs of a rectangular grid (/root/reference/src/cuTWED.cu:219-258);
these operators are the engine's way of NOT materializing such a grid
when the predicate is temporal — candidate generation by time locality
instead of all-pairs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_TIE = "__asof_tie"
_PAY = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    *,
    strict: bool = False,
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row at or
    before (``strict=True``: strictly before) its timestamp, per key.

    Left rows with no prior right row keep NULLs (left-join
    semantics). Ties on ``right_ts`` break deterministically toward
    the greatest ``tie_col`` (default: the last of ``right_cols``), so
    results are stable under re-partitioning — required for the
    engine's hash-compared oracle contract.

    Plan shape: union -> one Exchange(key) -> one in-partition sort
    (ts, side, tie) -> running ``last`` -> filter. No join operator.
    """
    if tie_col is None:
        tie_col = right_cols[-1]
    r_payload = F.struct(*[F.col(c) for c in right_cols]).alias(_PAY)
    r_arm = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias(_TS),
        # strict=False: right rows sort BEFORE left rows at equal ts
        # (side 0 < 1) so same-instant rights are visible; strict=True
        # flips the order so they are not.
        F.lit(0 if not strict else 1).alias(_SIDE),
        # natural type, NOT a numeric cast: a cast("long") of a string
        # id would NULL out and silently lose tie determinism
        F.col(tie_col).alias(_TIE),
        r_payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
    )
    l_arm = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias(_TS),
        F.lit(1 if not strict else 0).alias(_SIDE),
        F.lit(None).cast(right.schema[tie_col].dataType).alias(_TIE),
        F.lit(None).cast(r_arm.schema[_PAY].dataType).alias(_PAY),
        *[F.col(c) for c in left.columns if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_arm.unionByName(r_arm).withColumn(
        _PAY, F.last(_PAY, ignorenulls=True).over(w)
    )
    left_side = 1 if not strict else 0
    out_cols = (
        [F.col(on)]
        + [F.col(c) for c in left.columns if c != on]
        + [F.col(f"{_PAY}.{c}").alias(c) for c in right_cols]
    )
    return matched.where(F.col(_SIDE) == left_side).select(*out_cols)


def _bucket(ts: Column, width_sec: float) -> Column:
    # cast to double = epoch seconds (fractional); floor-divide into
    # fixed-width bins. TIMESTAMP_NTZ can't cast to double directly,
    # so route through TIMESTAMP first — the session-TZ shift this
    # implies is the SAME on both join sides, and bucketing only needs
    # a consistent monotone mapping (the residual filter compares the
    # original columns), so the result is TZ-independent.
    return F.floor(
        ts.cast("timestamp").cast("double") / F.lit(float(width_sec))
    ).cast("long")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_ts: str,
    *,
    bucket_width_sec: float,
) -> DataFrame:
    """Inner interval join: pairs (l, r) sharing key ``on`` with
    ``l.left_start <= r.right_ts <= l.left_end``, via time-bucketing.

    ``bucket_width_sec`` should be >= the typical interval length so
    each left interval explodes into ~2 buckets; the result carries
    every column of both sides (right's key column dropped). Exactly
    one output row per matching pair — the right side is never
    exploded, so no dedup step is needed.
    """
    lb = _bucket(F.col(left_start), bucket_width_sec)
    ub = _bucket(F.col(left_end), bucket_width_sec)
    l_expl = left.withColumn("__rj_bucket", F.explode(F.sequence(lb, ub)))
    r_b = right.withColumnRenamed(on, "__rj_key").withColumn(
        "__rj_bucket", _bucket(F.col(right_ts), bucket_width_sec)
    )
    joined = l_expl.join(
        r_b,
        (l_expl[on] == r_b["__rj_key"])
        & (l_expl["__rj_bucket"] == r_b["__rj_bucket"])
        & (r_b[right_ts] >= l_expl[left_start])
        & (r_b[right_ts] <= l_expl[left_end]),
        "inner",
    )
    return joined.drop("__rj_bucket", "__rj_key")
