"""Structured-streaming incremental entity resolution.

The reference is strictly batch (SURVEY.md §2.2: no streaming surface),
but a transcript corpus GROWS — this module ingests new conversations
with ``readStream`` and resolves them incrementally via
``foreachBatch``:

  new turn files -> assemble + sign the NEW conversations only
                 -> derive the NEW conversations' block keys and join
                    them against the persisted block-key index (old
                    transcripts are never re-read and old block keys
                    are never re-derived: signatures live with the
                    state, keys live in the append-only index)
                 -> score only pairs touching a new conversation
                 -> append scored edges + new block keys + new state

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
        "keys": os.path.join(work_dir, "block_keys"),
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


def incremental_candidates(
    spark: SparkSession, new_state: DataFrame, p: dict, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs touching a NEW conversation, from the persisted
    block-key index — the accumulated state table is never rescanned
    and its block keys are never re-derived.

    Returns ``(cand, new_keys)``; the caller appends ``new_keys`` to the
    index after the batch's writes succeed. Per-batch work is
    O(new batch) key derivation + one narrow scan of the (conv_id,
    block_key) index, restricted immediately to blocks a new
    conversation touches — NOT O(full state) signature re-derivation
    (the reference's device-resident-reuse principle,
    /root/reference/src/cuTWED.h:47-53: don't recompute what hasn't
    changed). Block-size pruning counts DISTINCT conv_ids per touched
    block, so a replayed batch (crash between the keys append and the
    stream checkpoint commit) cannot inflate sizes past ``max_block``.
    """
    new_keys = block_keys_from_state(new_state, cfg.band_size, cfg.num_hashes)
    all_keys = (
        spark.read.parquet(p["keys"]).unionByName(new_keys)
        if os.path.isdir(p["keys"])
        else new_keys
    )
    # Only blocks containing a new conversation can produce a new pair;
    # everything else in the index is dead weight for this batch.
    hot = new_keys.select("block_key").dropDuplicates(["block_key"])
    touched = all_keys.join(hot, "block_key", "left_semi")
    sized = touched.groupBy("block_key").agg(
        F.count_distinct("conv_id").alias("block_size")
    )
    pair_keys = sized.where(
        (F.col("block_size") >= 2) & (F.col("block_size") <= cfg.max_block)
    ).select("block_key")
    kept = touched.join(pair_keys, "block_key")
    # one side restricted to NEW conversations: old-x-old pairs are
    # structurally impossible, so incremental cost ~ new x neighborhood
    kept_new = kept.join(new_state.select("conv_id"), "conv_id", "left_semi")
    cand = (
        kept.alias("l")
        .join(kept_new.alias("r"), "block_key")
        .where(F.col("l.conv_id") != F.col("r.conv_id"))
        .select(
            F.least("l.conv_id", "r.conv_id").alias("conv_id_a"),
            F.greatest("l.conv_id", "r.conv_id").alias("conv_id_b"),
        )
        .dropDuplicates(["conv_id_a", "conv_id_b"])
    )
    return cand, new_keys


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
    try:
        if new_state.isEmpty():
            return
        check_state_version(p["state"])
        # Marker BEFORE the first state append: a crash between the two
        # must not leave compatible state that the version guard then
        # rejects as pre-versioning.
        os.makedirs(p["state"], exist_ok=True)
        _write_state_marker(p["state"])
        have_state = any(
            f.endswith(".parquet") for f in os.listdir(p["state"])
        )

        cand, new_keys = incremental_candidates(spark, new_state, p, cfg)
        new_keys = new_keys.persist()
        if os.path.isdir(p["scored"]):
            prior = spark.read.parquet(p["scored"]).select(
                "conv_id_a", "conv_id_b"
            )
            cand = cand.join(prior, ["conv_id_a", "conv_id_b"], "left_anti")

        # Scoring still reads the state table — candidate pairs need the
        # OLD side's series payload. That is a payload fetch (column-
        # pruned, join-filtered), not a recompute; at warehouse scale the
        # state table should be bucketed by conv_id so this join
        # co-locates without a shuffle of the big side.
        full = (
            spark.read.parquet(p["state"]).unionByName(new_state)
            if have_state
            else new_state
        )
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
        # Write order is the crash-safety contract: scored -> keys ->
        # state. The stream checkpoint commits only after this function
        # returns, so a crash replays the whole batch; the replay is
        # idempotent at every cut point (already-scored pairs are
        # anti-joined away, replayed key rows are absorbed by the
        # distinct-count pruning and pair-level dropDuplicates, and the
        # state append is guarded by a conv_id anti-join below).
        scored.write.mode("append").parquet(p["scored"])
        new_keys.write.mode("append").parquet(p["keys"])
        state_rows = new_state
        if have_state:
            # replay guard: a crash after the state append but before the
            # stream-checkpoint commit replays the batch; without this
            # narrow (conv_id-only) anti-join the replay would append the
            # same conversations twice.
            state_rows = new_state.join(
                spark.read.parquet(p["state"]).select("conv_id"),
                "conv_id",
                "left_anti",
            )
        state_rows.write.mode("append").parquet(p["state"])
        new_keys.unpersist()
    finally:
        new_state.unpersist()


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


def _compact_dir(
    spark: SparkSession,
    path: str,
    dedup_cols: list[str],
    n_files: int,
    partition_col: str | None = None,
) -> tuple[int, int]:
    """Rewrite a parquet dir to ``n_files`` files, deduped on
    ``dedup_cols``; returns (files_before, files_after). Swap is two
    renames — run with the stream stopped (documented, not enforced).

    ``partition_col``: preserve a hive-partitioned layout (e.g. the
    dedup shingle store's doc_id buckets, whose partition pruning the
    verification fetch depends on); rows are repartitioned BY that
    column so each partition directory compacts to ONE file —
    ``n_files`` is ignored on this path (the file count is the number
    of non-empty partitions). The dedup shingle store hash-buckets
    doc_ids into a fixed bucket count, so per-bucket volume stays
    balanced; a layout with genuinely hot partitions would want a salt
    column added to the repartition to bound per-partition file size."""
    import shutil

    def _n_parquet(d: str) -> int:
        return sum(
            1
            for _root, _dirs, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )

    before = _n_parquet(path)
    df = spark.read.parquet(path).dropDuplicates(dedup_cols)
    tmp = path + "._compact_tmp"
    if partition_col is not None:
        df.repartition(F.col(partition_col)).write.mode(
            "overwrite"
        ).partitionBy(partition_col).parquet(tmp)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # preserve underscore-prefixed sidecars (the version marker)
    for f in os.listdir(path):
        if f.startswith("_") and os.path.isfile(os.path.join(path, f)):
            shutil.copy2(os.path.join(path, f), os.path.join(tmp, f))
    old = path + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # drop Spark's cached file listing for the path — readers planned
    # before the swap would otherwise chase the deleted file names
    spark.catalog.refreshByPath(path)
    return before, _n_parquet(path)


def compact_stream_state(
    spark: SparkSession, work_dir: str, target_files: int | None = None
) -> dict:
    """Maintenance pass for a long-lived incremental work dir: every
    microbatch appends one file-set each to the block-key index, the
    scored table, and the state table, so after thousands of batches
    the per-batch narrow scans pay footer/listing overhead per tiny
    file (the classic streaming small-files problem). Rewrites each
    table to ``target_files`` files (default: the session's shuffle
    partitions), deduping replay artifacts on the way (keys on
    (conv_id, block_key), scored on the pair, state on conv_id).

    Run while the stream is STOPPED — the directory swap is two
    renames, and a concurrent append between them would be lost.
    Returns {table: {"files_before": n, "files_after": m}}.
    """
    p = _paths(work_dir)
    n = target_files or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    plan = {
        "keys": (p["keys"], ["conv_id", "block_key"]),
        "scored": (p["scored"], ["conv_id_a", "conv_id_b"]),
        "state": (p["state"], ["conv_id"]),
    }
    out = {}
    for name, (path, cols) in plan.items():
        if not os.path.isdir(path):
            continue
        before, after = _compact_dir(spark, path, cols, n)
        out[name] = {"files_before": before, "files_after": after}
    return out


def publish_bucketed_state(
    spark: SparkSession,
    work_dir: str,
    table: str = "er_state_bucketed",
    n_buckets: int | None = None,
) -> DataFrame:
    """Publish the accumulated state table as a catalog table BUCKETED
    by ``conv_id`` (maintenance pass, like ``compact_stream_state``).

    Scoring's attach joins fetch each candidate's series payload by
    conv_id (operators/scoring.py:attach_series). Against the plain
    parquet state dir both join sides shuffle; against the bucketed
    table the state side's HashPartitioning comes from the bucket spec,
    so only the per-batch candidate side exchanges — at warehouse scale
    that is the difference between shuffling a multi-TB table every
    batch and shuffling kilobytes of pair ids
    (tests/test_bucketed_io.py asserts the Exchange elimination).

    Run with the stream stopped, after ``compact_stream_state``; pass
    the returned DataFrame (or ``read_bucketed(spark, table)``) as the
    ``series`` argument to ``score_candidates``. Durable only with a
    persistent metastore (Hive/Iceberg); with the sandbox's in-memory
    catalog the table lives for the session and the call is repeated
    per session — degrading to the plain dir is correctness-neutral.
    """
    from cutwed_spark.sources.io import read_bucketed, write_bucketed

    p = _paths(work_dir)
    n = n_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    state = spark.read.parquet(p["state"]).dropDuplicates(["conv_id"])
    _clear_stale_managed_location(spark, table)
    write_bucketed(state, table, ["conv_id"], n_buckets=n,
                   sort_cols=["conv_id"])
    return read_bucketed(spark, table)


def _clear_stale_managed_location(spark: SparkSession, table: str) -> None:
    """Remove a leftover managed-table directory for ``table`` when the
    table is NOT registered in the current catalog.

    With the in-memory catalog, a previous session's
    ``publish_bucketed_state`` leaves the table's files under the
    warehouse dir while the registration dies with that session; the
    next session's ``saveAsTable`` then refuses ("location is not
    empty") and the publish would silently degrade on every subsequent
    run. Only acts on local ``file:`` warehouses — with a persistent
    metastore (Hive/Iceberg) the table stays registered and overwrite
    mode handles it, so this is a no-op there."""
    if spark.catalog.tableExists(table):
        return  # saveAsTable(mode=overwrite) replaces a registered table
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme not in ("", "file"):
        return
    parts = table.split(".")
    if len(parts) == 2:
        loc = os.path.join(wh.path, f"{parts[0].lower()}.db",
                           parts[1].lower())
    else:
        loc = os.path.join(wh.path, parts[-1].lower())
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc)


def finalize(
    spark: SparkSession,
    work_dir: str,
    cfg: PipelineConfig | None = None,
    state_table: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Batch epilogue over the accumulated stream state: threshold the
    scored edges (cfg.threshold required — streaming has no labeled
    calibration) and run connected components.

    ``state_table``: name of a catalog table published by
    :func:`publish_bucketed_state`. When given and present, the state
    side reads from it instead of the plain parquet dir — the scan
    arrives hash-partitioned by conv_id, so the distinct and any
    downstream conv_id join/agg plan without an Exchange on the
    multi-TB side. Falls back to the plain dir when the table is
    absent (no metastore), correctness-neutral either way.
    Returns (edges, clusters)."""
    cfg = cfg or PipelineConfig()
    p = _paths(work_dir)
    scored = spark.read.parquet(p["scored"]).dropDuplicates(
        ["conv_id_a", "conv_id_b"]
    )
    thr = cfg.threshold if cfg.threshold is not None else 0.35
    edges = scored.where(F.col(cfg.score_col) <= F.lit(thr))
    if state_table is not None and spark.catalog.tableExists(state_table):
        from cutwed_spark.sources.io import read_bucketed

        state = read_bucketed(spark, state_table)
    else:
        state = spark.read.parquet(p["state"])
    clusters, _ = assign_clusters(
        state.select("conv_id").dropDuplicates(["conv_id"]), edges
    )
    return edges, clusters
