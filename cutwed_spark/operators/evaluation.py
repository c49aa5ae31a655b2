"""ER evaluation operators: blocking quality and threshold sweep.

The north rule's quality criterion is pairwise F1 on labeled pairs "at
the same blocking key" — these operators measure the two halves of
that directly, fully distributed (no driver collect, unlike
``plans.pipeline.calibrate_threshold`` whose driver-side numpy curve is
documented as evaluation-scale-only):

* :func:`blocking_quality` — the standard record-linkage blocking
  metrics (reduction ratio, pair completeness) of a candidate-pair
  table against labeled ground truth. A blocking scheme is only as good
  as the true pairs it keeps; the reference has no blocking at all (its
  ``twed_batch`` scores every pair of the nAA x nBB grid,
  /root/reference/src/cuTWED_core.h:583-620), so at 10^12 turns this
  is the operator that decides feasibility.
* :func:`threshold_sweep` — precision/recall/F1 at a caller-supplied
  threshold grid over scored pairs, the distributed analog of the
  driver-side calibration curve. One join + one explode + one
  aggregation: scales with |labeled| x |grid|, not with the corpus.

Both evaluate over the labeled universe only (pairs with known ground
truth); scored pairs without a label are ignored, and labeled pairs the
pipeline never scored count as non-predicted at every threshold
(score = +infinity), matching ``calibrate_threshold``'s convention.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocking_quality(
    candidate_pairs: DataFrame,
    labeled: DataFrame,
    n_records: int,
) -> DataFrame:
    """One-row blocking-stage report card.

    Output columns:
      n_candidate_pairs — pairs the blocking surfaced
      n_possible_pairs  — n_records * (n_records - 1) / 2
      reduction_ratio   — 1 - candidates/possible (how much work
                          blocking saved vs all-pairs; ~1.0 at scale)
      n_true_pairs      — labeled is_match pairs
      n_true_covered    — true pairs present among the candidates
      pair_completeness — covered/true (recall ceiling: a true pair
                          blocking drops can never be matched)

    ``candidate_pairs`` and ``labeled`` must both use the canonical
    (conv_id_a < conv_id_b) orientation, as the blocking and synth
    operators emit.
    """
    cand = candidate_pairs.select("conv_id_a", "conv_id_b").withColumn(
        "cand", F.lit(True)
    )
    true_pairs = labeled.where(F.col("is_match")).select(
        "conv_id_a", "conv_id_b"
    )
    covered = (
        true_pairs.join(cand, ["conv_id_a", "conv_id_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum(F.when(F.col("cand").isNotNull(), 1).otherwise(0)).alias(
                "n_true_covered"
            ),
        )
    )
    n_cand = candidate_pairs.agg(
        F.count(F.lit(1)).alias("n_candidate_pairs")
    )
    n_possible = n_records * (n_records - 1) // 2
    return (
        n_cand.crossJoin(covered)
        .select(
            "n_candidate_pairs",
            F.lit(n_possible).cast("long").alias("n_possible_pairs"),
            F.round(
                1.0 - F.col("n_candidate_pairs") / F.lit(float(max(n_possible, 1))),
                6,
            ).alias("reduction_ratio"),
            F.col("n_true_pairs").cast("long").alias("n_true_pairs"),
            F.col("n_true_covered").cast("long").alias("n_true_covered"),
            F.round(
                F.col("n_true_covered")
                / F.greatest(F.col("n_true_pairs"), F.lit(1)),
                6,
            ).alias("pair_completeness"),
        )
    )


def threshold_sweep(
    scored: DataFrame,
    labeled: DataFrame,
    thresholds: Sequence[float],
    score_col: str = "twed_ratio",
) -> DataFrame:
    """Precision/recall/F1 per threshold, distributed.

    Predicted-match iff score <= threshold (TWED is a distance).
    Labeled pairs never scored get score = +infinity — non-predicted at
    every threshold. Output: (threshold, tp, fp, fn, precision, recall,
    f1), one row per grid point, ordered by threshold.
    """
    grid = F.array(*[F.lit(float(t)) for t in thresholds])
    j = (
        labeled.select("conv_id_a", "conv_id_b", "is_match")
        .join(
            scored.select("conv_id_a", "conv_id_b", score_col),
            ["conv_id_a", "conv_id_b"],
            "left",
        )
        .select(
            "is_match",
            F.coalesce(
                F.col(score_col), F.lit(float("inf"))
            ).alias("score"),
        )
    )
    per_thr = j.select(
        F.explode(grid).alias("threshold"), "is_match", "score"
    ).groupBy("threshold").agg(
        F.sum(
            F.when(F.col("is_match") & (F.col("score") <= F.col("threshold")), 1)
            .otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(~F.col("is_match") & (F.col("score") <= F.col("threshold")), 1)
            .otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(F.col("is_match") & (F.col("score") > F.col("threshold")), 1)
            .otherwise(0)
        ).alias("fn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return (
        per_thr.select(
            F.round("threshold", 4).alias("threshold"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.col("fn").cast("long").alias("fn"),
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(
                2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12)), 6
            ).alias("f1"),
        )
        .orderBy("threshold")
    )
