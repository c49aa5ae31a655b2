"""Known-answer tests for the temporal join operators (as-of join,
bucketed range join) plus plan-shape assertions: the as-of join must
compile to union+window with ZERO join operators, and the range join
must be an equi shuffled-hash/sort-merge join, never a
BroadcastNestedLoopJoin."""

import pytest
from pyspark.sql import functions as F

from cutwed_spark.operators.temporal import asof_join, range_join_bucketed


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "p1"), (1, 20.0, "p2"), (2, 5.0, "p3"), (3, 7.0, "p4")],
        "k bigint, lts double, lname string",
    )
    right = spark.createDataFrame(
        [
            (1, 10.0, 100, 1.5),
            (1, 15.0, 101, 2.5),
            (1, 15.0, 102, 3.5),  # tie on rts with 101 -> max rid wins
            (2, 9.0, 103, 4.5),
        ],
        "k bigint, rts double, rid bigint, rv double",
    )
    return left, right


def test_asof_join_semantics(sides):
    left, right = sides
    rows = {
        r["lname"]: r
        for r in asof_join(
            left, right, "k", "lts", "rts", ["rts", "rid", "rv"], tie_col="rid"
        ).collect()
    }
    assert rows["p1"]["rid"] == 100          # same-instant right visible
    assert rows["p2"]["rid"] == 102          # tie at rts=15 -> greatest rid
    assert rows["p2"]["rv"] == 3.5
    assert rows["p3"]["rid"] is None         # right at 9.0 is AFTER lts=5.0
    assert rows["p4"]["rid"] is None         # key has no right rows at all


def test_asof_join_strict(sides):
    left, right = sides
    rows = {
        r["lname"]: r
        for r in asof_join(
            left, right, "k", "lts", "rts", ["rid"], strict=True, tie_col="rid"
        ).collect()
    }
    assert rows["p1"]["rid"] is None         # strictly-before excludes ==
    assert rows["p2"]["rid"] == 102


def test_asof_join_plan_has_no_join(sides):
    left, right = sides
    out = asof_join(left, right, "k", "lts", "rts", ["rid"], tie_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_semantics(sides):
    left, right = sides
    intervals = left.select(
        "k", F.col("lts").alias("start"), (F.col("lts") + 6.0).alias("end"), "lname"
    )
    got = {
        (r["lname"], r["rid"])
        for r in range_join_bucketed(
            intervals, right, "k", "start", "end", "rts", bucket_width_sec=6.0
        ).collect()
    }
    assert got == {("p1", 100), ("p1", 101), ("p1", 102), ("p3", 103)}


def test_range_join_bucket_width_invariance(sides):
    """Result must not depend on the bucket width (only the plan cost
    does) — the residual filter makes any width exact."""
    left, right = sides
    intervals = left.select(
        "k", F.col("lts").alias("start"), (F.col("lts") + 6.0).alias("end"), "lname"
    )
    for width in (1.0, 3.0, 50.0):
        got = {
            (r["lname"], r["rid"])
            for r in range_join_bucketed(
                intervals, right, "k", "start", "end", "rts", bucket_width_sec=width
            ).collect()
        }
        assert got == {("p1", 100), ("p1", 101), ("p1", 102), ("p3", 103)}, width


def test_range_join_no_nested_loop(sides):
    left, right = sides
    intervals = left.select(
        "k", F.col("lts").alias("start"), (F.col("lts") + 6.0).alias("end"), "lname"
    )
    out = range_join_bucketed(
        intervals, right, "k", "start", "end", "rts", bucket_width_sec=6.0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
