"""Bucketed-table co-location: joins and aggregations on the bucket
columns must plan WITHOUT an Exchange (the property that makes the
multi-TB state-table attach join feasible at warehouse scale — see
sources/io.py:write_bucketed and streaming/ingest.py's scoring note).
"""

import pytest
from pyspark.sql import functions as F

from cutwed_spark.sources.io import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS bk_state")
    spark.sql("DROP TABLE IF EXISTS bk_cand")
    state = spark.range(0, 2000).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 7).alias("payload"),
    )
    cand = spark.range(0, 500).select(
        F.concat(F.lit("c"), F.col("id") * 3).alias("conv_id"),
        F.lit(1).alias("tag"),
    )
    write_bucketed(state, "bk_state", ["conv_id"], n_buckets=8,
                   sort_cols=["conv_id"])
    write_bucketed(cand, "bk_cand", ["conv_id"], n_buckets=8,
                   sort_cols=["conv_id"])
    yield spark
    spark.sql("DROP TABLE IF EXISTS bk_state")
    spark.sql("DROP TABLE IF EXISTS bk_cand")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(bucketed_pair):
    spark = bucketed_pair
    # AQE re-plans around cached shuffle stats; disable broadcast so the
    # join exercises the bucketed sort-merge path deterministically.
    with _no_broadcast(spark):
        joined = read_bucketed(spark, "bk_state").join(
            read_bucketed(spark, "bk_cand"), "conv_id"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 500


def test_bucketed_groupby_has_no_exchange(bucketed_pair):
    spark = bucketed_pair
    agg = (
        read_bucketed(spark, "bk_state")
        .groupBy("conv_id")
        .agg(F.sum("payload").alias("s"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_unbucketed_join_does_exchange(bucketed_pair):
    """Control: the same join WITHOUT bucketing shuffles — proves the
    no-Exchange assertions above are measuring bucketing, not AQE."""
    spark = bucketed_pair
    with _no_broadcast(spark):
        a = spark.range(0, 2000).select(
            F.concat(F.lit("c"), F.col("id")).alias("conv_id")
        )
        b = spark.range(0, 500).select(
            F.concat(F.lit("c"), F.col("id") * 3).alias("conv_id")
        )
        plan = _plan(a.join(b, "conv_id"))
        assert "Exchange" in plan


def test_bucketed_state_attach_join_drops_state_exchanges(spark, tmp_path):
    """publish_bucketed_state + scoring's attach_series: the bucketed
    state side must contribute NO Exchange (only the candidate-pair side
    shuffles) — vs the plain-parquet state where both sides shuffle."""
    from cutwed_spark.streaming.ingest import publish_bucketed_state

    work = str(tmp_path / "wd")
    state = spark.range(0, 300).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        F.array(F.lit(0.1), F.lit(0.2)).alias("values_flat"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("times"),
    )
    state.write.parquet(f"{work}/state")
    pairs = spark.range(0, 100).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id_a"),
        F.concat(F.lit("c"), F.col("id") + 1).alias("conv_id_b"),
    )

    from cutwed_spark.operators.scoring import attach_series

    with _no_broadcast(spark):
        plain = _plan(
            attach_series(pairs, spark.read.parquet(f"{work}/state"))
        )
        spark.sql("DROP TABLE IF EXISTS t_state_bk")
        bucketed_state = publish_bucketed_state(
            spark, work, table="t_state_bk", n_buckets=8
        )
        try:
            bucketed = _plan(attach_series(pairs, bucketed_state))
        finally:
            spark.sql("DROP TABLE IF EXISTS t_state_bk")
    assert "Bucketed: true" in bucketed
    # plain: both attach joins shuffle both sides; bucketed: only the
    # pair/intermediate side shuffles (2 fewer Exchanges).
    assert bucketed.count("Exchange") == plain.count("Exchange") - 2, (
        f"bucketed={bucketed.count('Exchange')} "
        f"plain={plain.count('Exchange')}\n{bucketed}"
    )


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", self.prev
        )
