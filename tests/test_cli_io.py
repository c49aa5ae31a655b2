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
    # the drained state is published as a conv_id-bucketed catalog
    # table by default (finalize + later scoring sessions join it
    # Exchange-free on the state side)
    try:
        assert summary["bucketed_state_table"] == "er_state_bucketed"
        assert spark.catalog.tableExists("er_state_bucketed")
        n_state = spark.read.parquet(os.path.join(work, "state")).count()
        assert spark.table("er_state_bucketed").count() == n_state
    finally:
        spark.sql("DROP TABLE IF EXISTS er_state_bucketed")


def test_cli_stream_dedup(spark, tmp_path, capsys):
    """stream-dedup subcommand over two drops: an exact pair must be
    counted ONCE (kind='exact' only — the near path anti-joins it
    away), and a cross-batch near dup appears as one 'near' edge."""
    import pandas as pd

    from cutwed_spark.cli import main

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill every single afternoon"
    )
    in_dir = tmp_path / "drops"
    os.makedirs(in_dir)
    pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [base, base, "unrelated words here"]}
    ).to_parquet(in_dir / "d1.parquet", index=False)
    pd.DataFrame(
        {"doc_id": [3], "text": [base.replace("warm", "cold")]}
    ).to_parquet(in_dir / "d2.parquet", index=False)
    work = str(tmp_path / "work")
    assert main(["stream-dedup", "--input", str(in_dir), "--work", work,
                 "--master", "local[4]"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # edges: (0,1) exact once, (0,3) and (1,3) near — never an 'exact'
    # pair re-emitted through the near path
    assert summary["n_exact"] == 1
    assert summary["n_dup_edges"] == 3
    edges = spark.read.parquet(summary["edges"]).dropDuplicates(
        ["doc_id_a", "doc_id_b", "kind"]
    )
    kinds = {(r.doc_id_a, r.doc_id_b): r.kind for r in edges.collect()}
    assert kinds == {(0, 1): "exact", (0, 3): "near", (1, 3): "near"}

    # --- compact subcommand over the same (stopped) work dir ---
    # auto-detect must pick the dedup layout, shrink the edge table to
    # one file, and leave the reader-visible edge set unchanged
    from cutwed_spark.cli import main as cli_main

    assert cli_main(["compact", "--work", work, "--target-files", "1",
                     "--master", "local[4]"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "dedup"
    assert out["tables"]["edges"]["files_after"] == 1
    after = spark.read.parquet(summary["edges"])
    kinds2 = {(r.doc_id_a, r.doc_id_b): r.kind for r in after.collect()}
    assert kinds2 == kinds
    # the compacted table needs no reader-side dedup anymore
    assert after.count() == 3


def test_cli_compact_auto_detect_fails_cleanly(tmp_path, capsys):
    """Ambiguous/empty work dirs are refused with an actionable error."""
    from cutwed_spark.cli import main

    work = str(tmp_path / "empty")
    os.makedirs(work)
    assert main(["compact", "--work", work, "--master", "local[2]"]) == 2
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "auto-detect" in out["error"]


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    """The north rule's launch shape, actually executed: package the
    engine as a zip, ship it with ``spark-submit --py-files``, and run
    the flagship pipeline from a cwd that does NOT contain the package
    (so the zip is the only import source, as on a real cluster where
    executors have no repo checkout)."""
    import shutil
    import subprocess
    import sys
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "cutwed_spark")
    zpath = str(tmp_path / "cutwed_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    # the submitted script, copied out of the repo like a real deploy
    script = str(tmp_path / "cli.py")
    shutil.copy(os.path.join(pkg, "cli.py"), script)

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    corpus = str(tmp_path / "corpus")
    from cutwed_spark.cli import main

    assert main(["synth", "--out", corpus, "--n", "80"]) == 0

    out = str(tmp_path / "out")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    # cwd=tmp_path: imports must come from the shipped zip
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zpath,
            script, "run",
            "--input", os.path.join(corpus, "transcripts.parquet"),
            "--labeled", os.path.join(corpus, "labeled_pairs.parquet"),
            "--output", out,
            "--shuffle-partitions", "8",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    metrics = json.loads(json_lines[-1])
    assert metrics["evaluation"]["f1"] >= 0.99
    assert os.path.isdir(os.path.join(out, "clusters"))
