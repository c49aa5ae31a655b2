"""Watermarked windowed aggregation over event/turn streams.

The reference is strictly batch (SURVEY.md §2.2: no streaming surface);
this module supplies the standard Structured Streaming late-data
pattern the engine's monitoring plane needs: event-time tumbling/
sliding windows with a watermark, so per-window turn/event statistics
finalize exactly once and arbitrarily late rows cannot reopen closed
windows.

All pure built-ins (``withWatermark`` + ``window()`` + hash aggs) —
state is Spark-managed, bounded by (watermark horizon / slide) windows
per key, and the sink can run in append mode (emit-once-on-close) for
exactly-once downstream consumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "role",
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """transcript-shaped stream (requires ``ts_col`` timestamp,
    ``key_col``, ``conv_id`` and ``text`` columns) -> per-(window, key)
    row/conversation counts and text-length stats.

    * ``watermark`` bounds state AND defines the late-data contract:
      rows older than (max event time seen - watermark) are dropped by
      Spark before the aggregate — a closed window's counts never
      change (append-mode emit-once).
    * tumbling when ``slide`` is None, sliding otherwise.

    Works identically on a batch DataFrame (watermark is a no-op there)
    — the batch twin used by the parity test.
    """
    win = (
        F.window(F.col(ts_col), window_duration)
        if slide is None
        else F.window(F.col(ts_col), window_duration, slide)
    )
    src = stream
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct("conv_id").alias("n_conversations"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
                "total_chars"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_rows",
            "n_conversations",
            "total_chars",
        )
    )


def run_windowed_stats(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
    ts_col: str = "ts",
    key_col: str = "role",
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """readStream(parquet) -> watermarked windowed stats -> append-mode
    parquet sink; availableNow trigger (process everything, stop).
    Append mode means a window row is written exactly once, when the
    watermark passes its end — the late-data contract made durable.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stats = windowed_turn_stats(
        stream,
        ts_col=ts_col,
        key_col=key_col,
        window_duration=window_duration,
        watermark=watermark,
    )
    q = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
