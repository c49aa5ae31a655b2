"""applyInPandasWithState conversation accumulation: conversations that
SPAN microbatches are emitted once, whole, after the event-time
watermark passes their quiescence gap."""

import os

import pandas as pd
import pytest


def _write_turn_file(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf.to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )


def test_cross_batch_conversation_assembly(spark, tmp_path):
    from cutwed_spark.streaming.state import (
        accumulate_conversations,
        conversations_to_turns,
    )

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    sec = pd.Timedelta(seconds=1)
    src = str(tmp_path / "stream_in")
    # file 1: first half of conversation A + all of conversation B
    _write_turn_file(
        os.path.join(src, "f1.parquet"),
        [
            ("A", 0, "user", "hello there", "", t0),
            ("A", 1, "assistant", "hi how can i help", "", t0 + 5 * sec),
            ("B", 0, "user", "quick question", "", t0 + 2 * sec),
            ("B", 1, "assistant", "sure", "", t0 + 8 * sec),
        ],
    )
    # file 2: second half of A (still within its 60s quiescence gap)
    _write_turn_file(
        os.path.join(src, "f2.parquet"),
        [
            ("A", 2, "user", "tell me about spark", "", t0 + 30 * sec),
            ("A", 3, "assistant", "a distributed engine", "", t0 + 40 * sec),
        ],
    )
    # file 3: a far-future conversation that advances the watermark past
    # A's and B's last turn + gap, flushing them
    _write_turn_file(
        os.path.join(src, "f3.parquet"),
        [("Z", 0, "user", "much later", "", t0 + pd.Timedelta(hours=3))],
    )

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    conv = accumulate_conversations(
        stream, gap_seconds=60.0, watermark_delay="1 seconds", max_turns=64
    )
    q = (
        conv.writeStream.format("memory")
        .queryName("completed_convs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["conv_id"]: r for r in spark.sql("select * from completed_convs").collect()}
    # A spans two files yet is emitted ONCE with all four turns sorted
    assert "A" in out and "B" in out
    assert out["A"]["n_turns"] == 4
    assert out["A"]["turn_idx"] == [0, 1, 2, 3]
    assert out["A"]["text"][2] == "tell me about spark"
    assert out["B"]["n_turns"] == 2
    # Z is still live (watermark never passed its gap): not emitted
    assert "Z" not in out
    # round-trip back to the standard transcript layout
    conv_df = spark.sql("select * from completed_convs")
    turns = conversations_to_turns(conv_df)
    assert turns.count() == 6
    cols = set(turns.columns)
    assert cols == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
