"""Structured-streaming incremental entity resolution.

The reference is strictly batch (SURVEY.md §2.2: no streaming surface),
but a transcript corpus GROWS — this module ingests new conversations
with ``readStream`` and resolves them incrementally via
``foreachBatch``:

  new turn files -> assemble + sign the NEW conversations only
                 -> block them against the accumulated state table
                    (signatures stored with the series: old transcripts
                    are never re-read — the point of
                    assemble.assemble_with_signatures)
                 -> score only pairs touching a new conversation
                 -> append scored edges + new state

Invariant: a conversation's turns arrive within one file/microbatch
(conversation-complete ingestion). For streams whose conversations SPAN
microbatches, compose with ``cutwed_spark.streaming.state.
accumulate_conversations`` (applyInPandasWithState + event-time
timeout) upstream: it emits completed conversations, and
``conversations_to_turns`` restores the transcript layout this module
expects. Clustering stays a batch job over the
accumulated edges (``finalize``) — connected components is iterative
and belongs outside the stream.

The foreachBatch body is idempotent per batch id in the usual Spark
sense: the stream checkpoint prevents reprocessing, and candidate
generation anti-joins pairs already scored.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cutwed_spark.operators.assemble import assemble_with_signatures
from cutwed_spark.operators.blocking import (
    SIGNATURE_FAMILY_VERSION,
    block_keys_from_state,
    prune_oversized_blocks,
)
from cutwed_spark.operators.clustering import assign_clusters
from cutwed_spark.operators.scoring import score_candidates
from cutwed_spark.plans.pipeline import PipelineConfig

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

# Bump state_format when the persisted state table's physical schema
# changes (e.g. values_flat float64 -> float32).
STATE_FORMAT_VERSION = 2


def _paths(work_dir: str) -> dict:
    return {
        "state": os.path.join(work_dir, "state"),
        "scored": os.path.join(work_dir, "scored"),
        "stream_ckpt": os.path.join(work_dir, "stream_ckpt"),
    }


def _state_version_marker(state_dir: str) -> str:
    # underscore-prefixed files are invisible to Spark's parquet listing
    return os.path.join(state_dir, "_state_version.json")


def check_state_version(state_dir: str) -> None:
    """Refuse to mix incompatible persisted state.

    Signatures from different hash families NEVER collide in LSH bands
    — unioning old-family state rows with new-family batches would
    silently miss every old-vs-new duplicate — and mixed
    float64/float32 ``values_flat`` files make the directory unreadable
    on append. Raises ValueError on mismatch (rebuild the state dir by
    re-ingesting); writes the marker for a fresh/unmarked dir.
    """
    if not os.path.isdir(state_dir):
        return
    current = {
        "signature_family_version": SIGNATURE_FAMILY_VERSION,
        "state_format": STATE_FORMAT_VERSION,
    }
    marker = _state_version_marker(state_dir)
    has_parquet = any(f.endswith(".parquet") for f in os.listdir(state_dir))
    if os.path.isfile(marker):
        with open(marker) as fh:
            found = json.load(fh)
        if found != current:
            raise ValueError(
                f"incremental state at {state_dir} was written by version "
                f"{found}, engine is {current}: old-family signatures never "
                f"band-collide with new ones (silently missed duplicates). "
                f"Rebuild the state dir by re-ingesting from the source "
                f"transcripts."
            )
    elif has_parquet:
        raise ValueError(
            f"incremental state at {state_dir} predates state versioning "
            f"(no _state_version.json); rebuild it by re-ingesting."
        )
    else:
        with open(marker, "w") as fh:
            json.dump(current, fh)


def _write_state_marker(state_dir: str) -> None:
    marker = _state_version_marker(state_dir)
    if not os.path.isfile(marker):
        with open(marker, "w") as fh:
            json.dump(
                {
                    "signature_family_version": SIGNATURE_FAMILY_VERSION,
                    "state_format": STATE_FORMAT_VERSION,
                },
                fh,
            )


def _incremental_batch(
    spark: SparkSession, batch_df: DataFrame, cfg: PipelineConfig, p: dict
) -> None:
    new_state = assemble_with_signatures(
        batch_df,
        cfg.n_buckets,
        cfg.max_turns,
        bucket_scale=cfg.bucket_scale,
        role_scale=cfg.role_scale,
        num_hashes=cfg.num_hashes,
        shingle_k=cfg.shingle_k,
    ).persist()
    if new_state.isEmpty():
        return
    check_state_version(p["state"])
    have_state = os.path.isdir(p["state"])
    full = (
        spark.read.parquet(p["state"]).unionByName(new_state)
        if have_state
        else new_state
    )

    blocks = block_keys_from_state(full, cfg.band_size, cfg.num_hashes).persist()
    kept, _ = prune_oversized_blocks(blocks, cfg.max_block)
    new_ids = new_state.select("conv_id")
    # one side restricted to NEW conversations: old-x-old pairs are
    # structurally impossible, so incremental cost ~ new x neighborhood
    new_keys = kept.join(new_ids, "conv_id", "left_semi")
    cand = (
        kept.alias("l")
        .join(new_keys.alias("r"), "block_key")
        .where(F.col("l.conv_id") != F.col("r.conv_id"))
        .select(
            F.least("l.conv_id", "r.conv_id").alias("conv_id_a"),
            F.greatest("l.conv_id", "r.conv_id").alias("conv_id_b"),
        )
        .dropDuplicates(["conv_id_a", "conv_id_b"])
    )
    if os.path.isdir(p["scored"]):
        prior = spark.read.parquet(p["scored"]).select("conv_id_a", "conv_id_b")
        cand = cand.join(prior, ["conv_id_a", "conv_id_b"], "left_anti")

    scored = score_candidates(
        cand,
        full,
        dim=cfg.dim,
        nu=cfg.nu,
        lamb=cfg.lamb,
        degree=cfg.degree,
        time_scale=cfg.time_scale,
        transfer_dtype=cfg.transfer_dtype,
    )
    scored.write.mode("append").parquet(p["scored"])
    new_state.write.mode("append").parquet(p["state"])
    _write_state_marker(p["state"])
    new_state.unpersist()
    blocks.unpersist()


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    cfg: PipelineConfig | None = None,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
):
    """Stream transcript parquet files from ``input_dir``; process
    available data and stop (availableNow trigger). Returns the query.
    """
    cfg = cfg or PipelineConfig()
    p = _paths(work_dir)
    os.makedirs(work_dir, exist_ok=True)
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _incremental_batch(spark, batch_df, cfg, p)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", p["stream_ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def finalize(
    spark: SparkSession, work_dir: str, cfg: PipelineConfig | None = None
) -> tuple[DataFrame, DataFrame]:
    """Batch epilogue over the accumulated stream state: threshold the
    scored edges (cfg.threshold required — streaming has no labeled
    calibration) and run connected components.
    Returns (edges, clusters)."""
    cfg = cfg or PipelineConfig()
    p = _paths(work_dir)
    scored = spark.read.parquet(p["scored"]).dropDuplicates(
        ["conv_id_a", "conv_id_b"]
    )
    thr = cfg.threshold if cfg.threshold is not None else 0.35
    edges = scored.where(F.col(cfg.score_col) <= F.lit(thr))
    state = spark.read.parquet(p["state"])
    clusters, _ = assign_clusters(state.select("conv_id"), edges)
    return edges, clusters
