"""Watermarked windowed aggregation: per-window stats finalize once
(append mode) and a row later than the watermark cannot change a closed
window — the standard late-data contract, tested deterministically with
two ordered file drops."""

import os

import pandas as pd

from cutwed_spark.streaming.ingest import TRANSCRIPT_SCHEMA
from cutwed_spark.streaming.windows import run_windowed_stats, windowed_turn_stats


def _rows(times_roles):
    return pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(times_roles))],
            "turn_idx": [0] * len(times_roles),
            "role": [r for _, r in times_roles],
            "text": ["x" * 10] * len(times_roles),
            "tool": [""] * len(times_roles),
            "ts": pd.to_datetime([t for t, _ in times_roles]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_windowed_stats_late_data_contract(spark, tmp_path):
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    # drop1: window W1 = [10:00, 10:10) x3 user, W2 = [11:00, 11:10) x2.
    # max ts 11:05 -> watermark 10:35 after batch1 -> W1 closes+emits.
    drop1 = _rows(
        [
            ("2025-01-01 10:01:00", "user"),
            ("2025-01-01 10:04:00", "user"),
            ("2025-01-01 10:08:00", "user"),
            ("2025-01-01 11:02:00", "user"),
            ("2025-01-01 11:05:00", "user"),
        ]
    )
    # drop2: one LATE row for W1 (10:05 < watermark 10:35 -> dropped;
    # W1 already finalized) + one 12:00 row advancing the watermark to
    # 11:30 so W2 closes. The 12:00 row's own window stays open and is
    # never emitted.
    drop2 = _rows(
        [
            ("2025-01-01 10:05:00", "user"),
            ("2025-01-01 12:00:00", "user"),
        ]
    )
    p1, p2 = str(in_dir / "a_drop1.parquet"), str(in_dir / "b_drop2.parquet")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # Two sequential availableNow runs sharing one checkpoint: the
    # watermark persists in the checkpoint between them, so drop2 is
    # processed strictly AFTER the watermark advanced past W1's end —
    # deterministic regardless of file-batching heuristics.
    def run_once():
        run_windowed_stats(
            spark,
            str(in_dir),
            out,
            ckpt,
            TRANSCRIPT_SCHEMA,
            window_duration="10 minutes",
            watermark="30 minutes",
        )

    drop1.to_parquet(p1, index=False)
    run_once()
    drop2.to_parquet(p2, index=False)
    run_once()
    got = {
        (str(r["window_start"]), r["role"]): (r["n_rows"], r["total_chars"])
        for r in spark.read.parquet(out).collect()
    }
    # W1 finalized from drop1 ONLY (late 10:05 row dropped): 3 rows.
    assert got[("2025-01-01 10:00:00", "user")] == (3, 30)
    # W2 finalized once the 12:00 row advanced the watermark: 2 rows.
    assert got[("2025-01-01 11:00:00", "user")] == (2, 20)
    # The 12:00 window never closed -> not in append output.
    assert ("2025-01-01 12:00:00", "user") not in got


def test_windowed_stats_batch_twin(spark):
    """The same function over a batch DataFrame = plain window groupBy
    (watermark no-op) — used as the oracle shape."""
    df = spark.createDataFrame(
        _rows(
            [
                ("2025-01-01 10:01:00", "user"),
                ("2025-01-01 10:04:00", "assistant"),
                ("2025-01-01 10:21:00", "user"),
            ]
        )
    )
    got = {
        (str(r["window_start"]), r["role"]): r["n_rows"]
        for r in windowed_turn_stats(df).collect()
    }
    assert got[("2025-01-01 10:00:00", "user")] == 1
    assert got[("2025-01-01 10:00:00", "assistant")] == 1
    assert got[("2025-01-01 10:20:00", "user")] == 1
