"""Unit tests for the distributed ER evaluation operators
(operators/evaluation.py) on hand-built inputs with known answers."""

from pyspark.sql import functions as F


def _labeled(spark):
    # 3 true pairs, 2 false pairs
    return spark.createDataFrame(
        [
            ("a", "b", True),
            ("a", "c", True),
            ("d", "e", True),
            ("a", "d", False),
            ("b", "c", False),
        ],
        "conv_id_a string, conv_id_b string, is_match boolean",
    )


def test_blocking_quality_known_answer(spark):
    from cutwed_spark.operators.evaluation import blocking_quality

    # blocking surfaced 3 pairs; covers 2 of the 3 true pairs
    cand = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")],
        "conv_id_a string, conv_id_b string",
    )
    row = blocking_quality(cand, _labeled(spark), n_records=5).collect()[0]
    assert row["n_candidate_pairs"] == 3
    assert row["n_possible_pairs"] == 10
    assert abs(row["reduction_ratio"] - 0.7) < 1e-9
    assert row["n_true_pairs"] == 3
    assert row["n_true_covered"] == 2
    assert abs(row["pair_completeness"] - 2 / 3) < 1e-6


def test_threshold_sweep_known_answer(spark):
    from cutwed_spark.operators.evaluation import threshold_sweep

    # scores: true pairs at 0.1 and 0.6; (d,e) never scored -> inf;
    # false pair (a,d) at 0.4, (b,c) at 2.0
    scored = spark.createDataFrame(
        [("a", "b", 0.1), ("a", "c", 0.6), ("a", "d", 0.4), ("b", "c", 2.0)],
        "conv_id_a string, conv_id_b string, twed_ratio double",
    )
    rows = {
        r["threshold"]: r
        for r in threshold_sweep(
            scored, _labeled(spark), [0.5, 1.0]
        ).collect()
    }
    # thr=0.5: tp={ab}, fp={ad}, fn={ac, de}
    r = rows[0.5]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 2)
    assert abs(r["precision"] - 0.5) < 1e-9
    assert abs(r["recall"] - 1 / 3) < 1e-6
    # thr=1.0: tp={ab, ac}, fp={ad}, fn={de}
    r = rows[1.0]
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
    assert abs(r["f1"] - (2 * (2 / 3) * (2 / 3) / (4 / 3))) < 1e-6


def test_threshold_sweep_plan_has_no_python_node(spark):
    """The sweep must stay JVM-side (join + explode + hash agg)."""
    from cutwed_spark.operators.evaluation import threshold_sweep

    scored = spark.createDataFrame(
        [("a", "b", 0.1)], "conv_id_a string, conv_id_b string, twed_ratio double"
    )
    plan = threshold_sweep(scored, _labeled(spark), [0.5])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
