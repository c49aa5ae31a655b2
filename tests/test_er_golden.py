"""Drift guard for the committed golden edge/cluster sets
(cutwed_spark/plans/er_golden.py): a fresh flagship pipeline run on the
deterministic seed-42 corpus must reproduce them exactly. If this fails
after an intentional scoring/blocking change, regenerate with
tools/gen_er_golden.py (and expect the driver's er_match_edges /
er_clusters oracles to change with it)."""

from pyspark.sql import functions as F

from cutwed_spark.plans.er_golden import (
    ER_CLUSTERS_ROWS,
    ER_LABELED_ROWS,
    ER_MATCH_EDGES_ROWS,
    ER_SCORED_ROWS,
    N_CONVERSATIONS,
)


def test_er_golden_matches_fresh_run(spark):
    from cutwed_spark.plans.pipeline import PipelineConfig, run_pipeline
    from cutwed_spark.sources.synth import synth_corpus

    tr, lab = synth_corpus(N_CONVERSATIONS)
    res = run_pipeline(
        spark,
        spark.createDataFrame(tr),
        PipelineConfig(),
        labeled=spark.createDataFrame(lab),
    )
    edges = sorted(
        (
            r["conv_id_a"],
            r["conv_id_b"],
            int(r["n_a"]),
            int(r["n_b"]),
            float(r["twed"]),
            float(r["twed_norm"]),
        )
        for r in res.edges.select(
            "conv_id_a",
            "conv_id_b",
            "n_a",
            "n_b",
            F.round("twed", 4).alias("twed"),
            F.round("twed_norm", 4).alias("twed_norm"),
        ).collect()
    )
    assert edges == sorted(map(tuple, ER_MATCH_EDGES_ROWS))
    clusters = sorted(
        (r["conv_id"], r["cluster_id"]) for r in res.clusters.collect()
    )
    assert clusters == sorted(map(tuple, ER_CLUSTERS_ROWS))
    scored = sorted(
        (r["conv_id_a"], r["conv_id_b"], float(r["twed_ratio"]))
        for r in res.scored.select(
            "conv_id_a", "conv_id_b",
            F.round("twed_ratio", 4).alias("twed_ratio"),
        ).collect()
    )
    assert scored == sorted(map(tuple, ER_SCORED_ROWS))
    labeled_rows = sorted(
        (r["conv_id_a"], r["conv_id_b"], bool(r["is_match"]))
        for r in spark.createDataFrame(lab)
        .select("conv_id_a", "conv_id_b", "is_match")
        .collect()
    )
    assert labeled_rows == sorted(map(tuple, ER_LABELED_ROWS))


def test_er_golden_oracle_sql_runs_in_duckdb():
    """The literal-VALUES oracles must parse and return the pinned row
    counts in DuckDB (the engine the driver uses for the comparison)."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    edges = con.execute(entry._er_match_edges_oracle()).fetchall()
    assert len(edges) == len(ER_MATCH_EDGES_ROWS)
    assert edges[0][0].startswith("c")
    types = [d[1] for d in con.execute(
        f"DESCRIBE {entry._er_match_edges_oracle()}"
    ).fetchall()]
    assert types == ["VARCHAR", "VARCHAR", "INTEGER", "INTEGER", "DOUBLE", "DOUBLE"]
    clusters = con.execute(entry._er_clusters_oracle()).fetchall()
    assert len(clusters) == len(ER_CLUSTERS_ROWS)


def test_er_eval_oracles_run_in_duckdb():
    """blocking-quality and threshold-sweep oracles parse, and their
    invariants hold on the pinned goldens (completeness <= 1, the sweep
    is monotone in recall as the threshold loosens)."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    bq = con.execute(entry._er_blocking_quality_oracle()).fetchall()
    assert len(bq) == 1
    n_cand, n_possible, rr, n_true, n_cov, pc = bq[0]
    assert n_cand == len(ER_SCORED_ROWS)
    assert 0.0 <= rr <= 1.0 and 0.0 <= pc <= 1.0
    assert n_cov <= n_true
    sweep = con.execute(entry._er_threshold_sweep_oracle()).fetchall()
    assert len(sweep) == len(entry.ER_SWEEP_GRID)
    recalls = [row[5] for row in sweep]
    assert recalls == sorted(recalls)  # looser threshold never loses recall
