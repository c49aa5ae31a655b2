"""End-to-end training-data curation pass: the composition a 100 TB
pipeline actually runs, built ENTIRELY from the existing operators so
the whole funnel stays one Catalyst plan (filters push into the scan,
each dedup stage sees only survivors of the previous one).

    documents
      -> quality gate   (quality_score + language heuristic)
      -> exact dedup    (keep the min doc_id of each normalized-text
                         duplicate group)
      -> near-dup prune (MinHash/LSH candidates among survivors; keep
                         the smaller doc_id of each candidate pair)

Every stage is deterministic and SQL-portable, so the funnel counts are
oracle-checkable in DuckDB end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cutwed_spark.cache import scoped_persist
from cutwed_spark.operators.dedup import minhash_lsh_verified_pairs, normalized_text
from cutwed_spark.operators.textstats import quality_stats


def curate_documents(
    docs: DataFrame,
    min_quality: float = 0.5,
    require_lang: str | None = "en",
    en_threshold: float = 0.08,
    k: int = 3,
    num_hashes: int = 12,
    band_size: int = 2,
    max_df: int = 100,
    min_jaccard: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """-> (survivors, funnel).

    survivors: the curated documents table (doc_id + text untouched).
    funnel: ONE row (n_input, n_after_quality, n_after_exact,
    n_after_neardup) — the per-stage retention record every curation
    run should emit (no silent drops; the dedup analog of blocking's
    cap-and-report contract).

    Near-dup pruning drops only VERIFIED pairs (exact Jaccard >=
    ``min_jaccard``, computed on the LSH candidates only): a
    false-positive band collision between two unrelated documents can
    never delete a distinct document from the curated set.
    """
    if require_lang not in (None, "en"):
        raise ValueError(
            f"require_lang={require_lang!r} is not supported; the language "
            f"gate is the stopword-ratio English heuristic — pass 'en' or "
            f"None (silently ignoring an unknown language would skip the "
            f"gate the caller asked for)"
        )
    q = quality_stats(docs)
    gate = q.where(F.col("quality_score") >= min_quality)
    if require_lang == "en":
        gate = gate.where(F.col("stopword_ratio") >= en_threshold)
    quality_ids = gate.select("doc_id")
    # Each stage feeds both the next stage AND a funnel count (and the
    # returned survivors are consumed again by the caller) — persist the
    # stage outputs so the regex-heavy quality pass and the dedup window
    # run once, not once per consumer. Run inside cache.cache_scope()
    # for deterministic release (materialize the funnel first).
    qdocs = scoped_persist(docs.join(quality_ids, "doc_id"))

    # exact dedup: drop every non-minimum member of a duplicate group
    dup_losers = (
        qdocs.select(F.md5(normalized_text()).alias("dup_hash"), "doc_id")
        .withColumn(
            "min_id", F.min("doc_id").over(Window.partitionBy("dup_hash"))
        )
        .where(F.col("doc_id") != F.col("min_id"))
        .select("doc_id")
    )
    edocs = scoped_persist(qdocs.join(dup_losers, "doc_id", "left_anti"))

    # near-dup prune among exact-dedup survivors: for each VERIFIED
    # near-dup pair keep the smaller id (pairs are TRIL-ordered already)
    near_losers = (
        minhash_lsh_verified_pairs(
            edocs, k, num_hashes, band_size, max_df, min_jaccard
        )
        .select(F.col("doc_id_b").alias("doc_id"))
        .dropDuplicates(["doc_id"])
    )
    survivors = scoped_persist(edocs.join(near_losers, "doc_id", "left_anti"))

    funnel = (
        docs.agg(F.count(F.lit(1)).alias("n_input"))
        .crossJoin(qdocs.agg(F.count(F.lit(1)).alias("n_after_quality")))
        .crossJoin(edocs.agg(F.count(F.lit(1)).alias("n_after_exact")))
        .crossJoin(survivors.agg(F.count(F.lit(1)).alias("n_after_neardup")))
    )
    return survivors, funnel
