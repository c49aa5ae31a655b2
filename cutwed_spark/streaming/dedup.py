"""Structured-streaming incremental document deduplication.

Batch dedup re-shingles the whole corpus per run; a training-data
corpus GROWS, so this module dedups new document drops incrementally
with ``readStream`` + ``foreachBatch`` (the same indexed-state design
as ``streaming.ingest`` for ER — the reference's device-resident-reuse
principle, /root/reference/src/cuTWED.h:47-53: never recompute what
hasn't changed):

  new doc files -> shingle + digest-split MinHash band keys for the
                   NEW docs only
                -> exact dup edges: md5(normalized text) joined against
                   the persisted (dup_hash, doc_id) index
                -> near-dup candidates: new band keys joined against
                   the persisted (band_key, doc_id) index, one side
                   restricted to new docs (old x old structurally
                   impossible), band sizes capped
                -> candidates VERIFIED by exact Jaccard before they are
                   emitted (a band collision must never delete a
                   distinct document — operators/dedup.py contract);
                   old docs' shingles come from the persisted shingle
                   store, which is PARTITIONED BY doc_id bucket so the
                   fetch prunes to the touched buckets instead of
                   scanning the store
                -> append edges + new hashes + new band keys + new
                   shingles

Per-batch cost ~ O(batch + touched neighborhood + touched buckets),
never O(corpus). The stream checkpoint provides exactly-once batch
processing in the usual foreachBatch sense; every state table is
append-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cutwed_spark.operators.dedup import doc_shingles, normalized_text

DOC_SCHEMA = "doc_id bigint, text string"

# number of doc_id-hash partitions of the shingle store; the
# verification fetch reads only the buckets of the docs it needs
N_SHINGLE_BUCKETS = 64


def _paths(work_dir: str) -> dict:
    return {
        "hashes": os.path.join(work_dir, "dup_hashes"),
        "bands": os.path.join(work_dir, "band_keys"),
        "shingles": os.path.join(work_dir, "shingles"),
        "edges": os.path.join(work_dir, "dup_edges"),
        "stream_ckpt": os.path.join(work_dir, "stream_ckpt"),
    }


def _bucket(col):
    return F.pmod(F.xxhash64(col), F.lit(N_SHINGLE_BUCKETS)).cast("int")


def _band_keys(sh: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, band_key) via the digest-split
    signature (same family as the batch operator, so batch and stream
    agree on collisions)."""
    n_digests = (num_hashes + 3) // 4
    pre = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.col("shingle"), F.lit(f"#{d}"))).alias(f"d{d}")
            for d in range(n_digests)
        ],
    )
    mins = [
        F.min(F.substring(F.col(f"d{i // 4}"), 1 + 8 * (i % 4), 8)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = pre.groupBy("doc_id").agg(*mins)
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"h{b * band_size + r}") for r in range(band_size)],
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("band_key"))


def _tril(pairs: DataFrame, a: str, b: str) -> DataFrame:
    return (
        pairs.where(F.col(a) != F.col(b))
        .select(
            F.least(a, b).alias("doc_id_a"),
            F.greatest(a, b).alias("doc_id_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )


def _dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    p: dict,
    k: int = 3,
    num_hashes: int = 12,
    band_size: int = 2,
    max_band: int = 64,
    min_jaccard: float = 0.5,
) -> None:
    docs = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"]).persist()

    # --- exact dedup via the persisted hash index ------------------
    h_new = docs.select(
        F.md5(normalized_text()).alias("dup_hash"), "doc_id"
    ).persist()
    all_h = (
        spark.read.parquet(p["hashes"]).unionByName(h_new)
        if os.path.isdir(p["hashes"])
        else h_new
    )
    exact = _tril(
        all_h.join(
            h_new.select("dup_hash", F.col("doc_id").alias("doc_id_r")),
            "dup_hash",
        ).select(F.col("doc_id").alias("a"), F.col("doc_id_r").alias("b")),
        "a",
        "b",
    ).select(
        "doc_id_a",
        "doc_id_b",
        F.lit("exact").alias("kind"),
        F.lit(1.0).alias("jaccard"),
    ).persist()

    # --- near-dup candidates via the persisted band index ----------
    sh_new = doc_shingles(docs, k).persist()
    keys_new = _band_keys(sh_new, num_hashes, band_size).persist()
    all_keys = (
        spark.read.parquet(p["bands"]).unionByName(keys_new)
        if os.path.isdir(p["bands"])
        else keys_new
    )
    hot = keys_new.select("band_key").dropDuplicates(["band_key"])
    touched = all_keys.join(hot, "band_key", "left_semi")
    # band-size cap (count_distinct: replay-safe, like ER blocking)
    ok = (
        touched.groupBy("band_key")
        .agg(F.count_distinct("doc_id").alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= max_band))
        .select("band_key")
    )
    kept = touched.join(ok, "band_key")
    kept_new = kept.join(docs.select("doc_id"), "doc_id", "left_semi")
    # exact pairs verify trivially at jaccard 1.0 through the band path
    # (identical docs share every band key), so anti-join them away:
    # each exact pair is emitted exactly once with kind='exact', and no
    # shingle-intersection work is spent on pairs already known
    # identical. This batch's `exact` set is complete for the purpose:
    # every candidate has >=1 new side, and any exact dup touching a
    # new doc is caught above via the hash index.
    cand = _tril(
        kept.alias("l")
        .join(kept_new.alias("r"), "band_key")
        .select(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        ),
        "a",
        "b",
    ).join(
        exact.select("doc_id_a", "doc_id_b"),
        ["doc_id_a", "doc_id_b"],
        "left_anti",
    )

    # --- verification: exact Jaccard over the shingle sets ---------
    # old docs' shingles come from the bucketed store with partition
    # pruning: only the buckets of the docs the candidates touch are
    # read, never the whole store.
    need = (
        cand.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_id_b").alias("doc_id")))
        .dropDuplicates(["doc_id"])
        .join(docs.select("doc_id"), "doc_id", "left_anti")  # old docs only
        .persist()
    )
    if os.path.isdir(p["shingles"]):
        bkts = [r["b"] for r in need.select(_bucket("doc_id").alias("b")).distinct().collect()]
        old_sh = (
            spark.read.parquet(p["shingles"])
            .where(F.col("bkt").isin(bkts) if bkts else F.lit(False))
            .join(need, "doc_id", "left_semi")
            .select("doc_id", "shingle")
        )
        sh_all = sh_new.unionByName(old_sh)
    else:
        sh_all = sh_new
    # Replay safety: a foreachBatch crash-replay (at-least-once) or a
    # doc_id re-delivered across drops re-appends that doc's shingle
    # rows to the store; row-counted sizes/intersections would then
    # inflate asymmetrically and can flip the min_jaccard decision.
    # Dedup on (doc_id, shingle) first so both aggregates count SETS,
    # matching the band cap's count_distinct convention.
    sh_all = sh_all.dropDuplicates(["doc_id", "shingle"])
    sizes = sh_all.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(
            sh_all.select(F.col("doc_id").alias("doc_id_a"), "shingle"),
            "doc_id_a",
        )
        .join(
            sh_all.select(F.col("doc_id").alias("doc_id_b"), "shingle"),
            ["doc_id_b", "shingle"],
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    verified = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a")),
            "doc_id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b")),
            "doc_id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select(
            "doc_id_a",
            "doc_id_b",
            F.lit("near").alias("kind"),
            F.col("jaccard").cast("double"),
        )
    )

    # --- append outputs and state -----------------------------------
    # edges first (replays overwrite-by-append and are deduped by
    # readers on (doc_id_a, doc_id_b, kind)); state appends last so a
    # crash mid-batch replays the batch against the old state.
    exact.unionByName(verified).write.mode("append").parquet(p["edges"])
    h_new.write.mode("append").parquet(p["hashes"])
    keys_new.write.mode("append").parquet(p["bands"])
    (
        sh_new.withColumn("bkt", _bucket("doc_id"))
        .write.mode("append")
        .partitionBy("bkt")
        .parquet(p["shingles"])
    )
    for df in (docs, h_new, sh_new, keys_new, need, exact):
        df.unpersist()


def compact_dedup_state(
    spark: SparkSession, work_dir: str, target_files: int | None = None
) -> dict:
    """Maintenance pass for a long-lived dedup work dir (the
    ``compact_stream_state`` analog, streaming/ingest.py): every
    microbatch appends one file-set each to the hash index, band index,
    shingle store, and edge table, so after thousands of drops the
    per-batch narrow scans pay footer/listing overhead per tiny file.
    Rewrites each table to ``target_files`` files, deduping replay
    artifacts on the way (hashes on (dup_hash, doc_id), bands on
    (band_key, doc_id), shingles on (doc_id, shingle), edges on
    (doc_id_a, doc_id_b, kind)) — the same row sets every reader
    already dedups to, so answers are unchanged. The shingle store
    keeps its doc_id-bucket partitioning (the verification fetch's
    partition pruning depends on it).

    Run while the stream is STOPPED — the directory swap is two
    renames. Returns {table: {"files_before": n, "files_after": m}}.
    """
    from cutwed_spark.streaming.ingest import _compact_dir

    p = _paths(work_dir)
    n = target_files or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    plan = {
        "hashes": (p["hashes"], ["dup_hash", "doc_id"], None),
        "bands": (p["bands"], ["band_key", "doc_id"], None),
        "shingles": (p["shingles"], ["doc_id", "shingle"], "bkt"),
        "edges": (p["edges"], ["doc_id_a", "doc_id_b", "kind"], None),
    }
    out = {}
    for name, (path, cols, part_col) in plan.items():
        if not os.path.isdir(path):
            continue
        before, after = _compact_dir(
            spark, path, cols, n, partition_col=part_col
        )
        out[name] = {"files_before": before, "files_after": after}
    return out


def run_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    k: int = 3,
    num_hashes: int = 12,
    band_size: int = 2,
    max_band: int = 64,
    min_jaccard: float = 0.5,
    await_termination: bool = True,
):
    """Stream document parquet files from ``input_dir``; process
    available data and stop (availableNow trigger). Returns the query.

    Outputs under ``work_dir``: ``dup_edges`` (doc_id_a, doc_id_b,
    kind in {'exact','near'}, jaccard), plus the append-only state
    tables (``dup_hashes``, ``band_keys``, bucketed ``shingles``).
    """
    p = _paths(work_dir)
    os.makedirs(work_dir, exist_ok=True)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _dedup_batch(
            spark,
            batch_df,
            p,
            k=k,
            num_hashes=num_hashes,
            band_size=band_size,
            max_band=max_band,
            min_jaccard=min_jaccard,
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", p["stream_ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
