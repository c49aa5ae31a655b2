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


def test_cli_curate(spark, tmp_path, capsys):
    """curate subcommand: funnel counts on stdout + curated parquet +
    funnel.json on disk."""
    import pandas as pd

    from cutwed_spark.cli import main

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                "the quick brown fox jumps over the lazy dog and it runs far "
                f"away into the field while the sun is high number {i % 20}"
                for i in range(40)
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    docs.to_parquet(src, index=False)
    out = str(tmp_path / "cur")
    assert main(["curate", "--input", src, "--output", out,
                 "--master", "local[4]"]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    counts = json.loads(line)
    assert counts["n_input"] == 40
    # doc i and doc i+20 are exact duplicates -> exact stage halves it
    assert counts["n_after_exact"] == 20
    assert os.path.isfile(os.path.join(out, "funnel.json"))
    assert spark.read.parquet(os.path.join(out, "curated")).count() == counts[
        "n_after_neardup"
    ]


def test_cli_stream(spark, tmp_path, capsys):
    """stream subcommand: incremental ingest over two drops, then
    finalize writes edges/clusters."""
    from cutwed_spark.cli import main
    from cutwed_spark.sources.synth import synth_corpus

    tr, _ = synth_corpus(60)
    tr = tr.assign(ts=tr["ts"].astype("datetime64[us]"))
    convs = sorted(tr.conv_id.unique())
    half = set(convs[: len(convs) // 2])
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    tr[tr.conv_id.isin(half)].to_parquet(in_dir / "d1.parquet", index=False)
    tr[~tr.conv_id.isin(half)].to_parquet(in_dir / "d2.parquet", index=False)
    work = str(tmp_path / "work")
    assert main(["stream", "--input", str(in_dir), "--work", work,
                 "--threshold", "0.5", "--max-files", "1",
                 "--master", "local[4]"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_match_edges"] > 0
    assert spark.read.parquet(os.path.join(summary["out"], "clusters")).count() > 0
