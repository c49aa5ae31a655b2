"""CLI end-to-end + storage adapter tests."""

import json
import os

import pytest


def test_io_roundtrip_parquet(spark, tmp_path):
    from cutwed_spark.sources.io import read_table, write_table

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    dst = str(tmp_path / "t")
    write_table(df, dst)
    back = read_table(spark, dst)
    assert back.count() == 10
    write_table(df, dst, mode="append")
    assert read_table(spark, dst).count() == 20


def test_io_iceberg_requires_runtime(spark, tmp_path):
    """Without the Iceberg runtime on the classpath, iceberg: addresses
    fail with an actionable error instead of a cryptic one."""
    from cutwed_spark.sources.io import iceberg_available, read_table

    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; error path not reachable")
    with pytest.raises(RuntimeError, match="Iceberg"):
        read_table(spark, "iceberg:cat.db.t")


def test_cli_synth_and_run(spark, tmp_path, capsys):
    """The spark-submit entry end-to-end: synth a corpus, run the
    pipeline, check outputs + metrics land on disk."""
    from cutwed_spark.cli import main

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    assert main(["synth", "--out", corpus, "--n", "80"]) == 0
    assert (
        main(
            [
                "run",
                "--input", os.path.join(corpus, "transcripts.parquet"),
                "--labeled", os.path.join(corpus, "labeled_pairs.parquet"),
                "--output", out,
                "--master", "local[4]",
                "--shuffle-partitions", "8",
            ]
        )
        == 0
    )
    captured = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(captured[-1])
    assert metrics["evaluation"]["f1"] >= 0.99
    assert os.path.isdir(os.path.join(out, "clusters"))
    assert os.path.isdir(os.path.join(out, "edges"))
    assert any(f.startswith("metrics_") for f in os.listdir(out))
