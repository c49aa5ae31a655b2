"""Blocking: MinHash/LSH over turn-text shingles + exact tool-sequence
signatures -> deduped candidate pairs.

The reference computes ALL pairs (the nAA x nBB loop in
/root/reference/src/cuTWED_core.h:583-620) because batches are small;
at 10^12-turn scale all-pairs is impossible, so blocking bounds the
candidate set. The reference's triangular dedup (TRIL enum,
/root/reference/src/cuTWED.h:24-26) becomes the
``conv_id_a < conv_id_b`` predicate pushed into the self-join — no
triangle is ever materialized.

Everything here is Catalyst built-ins (xxhash64, higher-order functions,
joins, aggregates): map-side partial aggregation computes the k minhash
mins per conversation, and oversized LSH buckets (non-discriminative
"stopword" blocks — the skew hazard, SURVEY.md §7 hard part 4) are
dropped with the drop surfaced as a metric, never silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 32
DEFAULT_BAND_SIZE = 2
DEFAULT_SHINGLE_K = 3
DEFAULT_MAX_BLOCK = 64


def conversation_shingles(
    transcripts: DataFrame, k: int = DEFAULT_SHINGLE_K, dedup: bool = True
) -> DataFrame:
    """-> (conv_id, shingle) word-k-gram shingles per conversation.

    Shingles are formed within each turn's text (word k-grams); short
    turns contribute their whole text as one shingle so no turn is
    invisible to blocking. ``dedup=False`` skips the distinct (a full
    shuffle of the exploded shingles) — MIN aggregation for MinHash is
    duplicate-insensitive, so the minhash path never needs it.
    """
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    shingles = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    out = transcripts.select("conv_id", F.explode(shingles).alias("shingle")).where(
        F.col("shingle") != ""
    )
    return out.dropDuplicates(["conv_id", "shingle"]) if dedup else out


def turn_shingle_hashes(
    transcripts: DataFrame, k: int = DEFAULT_SHINGLE_K
) -> DataFrame:
    """-> (conv_id, shb: array<bigint>) — per-TURN shingle hash arrays.

    Each shingle string is hashed exactly once (string hashing is the
    dominant cost of blocking); the k-member hash family downstream
    re-hashes the fixed-width bigint, which is several times cheaper.
    No explode: the shingle set never becomes rows, so the minhash
    aggregation shuffles 3 orders of magnitude fewer rows at 10^12-turn
    scale (turns, not turn x shingle x hash).
    """
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    shingles = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    shb = F.transform(
        F.filter(shingles, lambda s: s != ""), lambda s: F.xxhash64(s)
    )
    return transcripts.select("conv_id", shb.alias("shb"))


_LONG_MAX = (1 << 63) - 1


def minhash_from_hashes(
    turn_hashes: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """(conv_id, shb) per turn -> (conv_id, sig: array<bigint>).

    Family member i of a shingle with base hash b is xxhash64(b, i)
    (bigint re-hash — an independent family, cheap on fixed width).
    Per-turn partial mins fold through an ordinary min() aggregate, so
    Catalyst's map-side partial aggregation applies and the shuffle
    carries num_hashes bigints per turn-group, never shingle rows.
    """
    def _merge(i):
        return lambda acc, b: F.least(acc, F.xxhash64(b, F.lit(i)))

    per_turn = [
        F.aggregate(F.col("shb"), F.lit(_LONG_MAX), _merge(i)).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    agg = (
        turn_hashes.select("conv_id", *per_turn)
        .groupBy("conv_id")
        .agg(*[F.min(f"m{i}").alias(f"h{i}") for i in range(num_hashes)])
    )
    sig = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
    # A conversation whose every turn is empty text has no shingles at
    # all; its sentinel-only signature would LSH-collide with every
    # other empty conversation — that is exactly the non-discriminative
    # block the size cap would drop anyway, so null it out here.
    return agg.select(
        "conv_id",
        F.when(sig[0] == F.lit(_LONG_MAX), F.lit(None)).otherwise(sig).alias("sig"),
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """-> (conv_id, sig: array<bigint>) — one pass, k min-aggregates.

    Seed variation via xxhash64(shingle, seed_i) (extra hashed column =
    an independent hash family member). Partial/final agg is automatic.
    """
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = shingles.groupBy("conv_id").agg(*mins)
    return agg.select(
        "conv_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_block_keys(
    signatures: DataFrame,
    band_size: int = DEFAULT_BAND_SIZE,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """-> (conv_id, block_key: bigint): one row per LSH band.

    band key = xxhash64(band_id, sig values in the band); band_id is
    mixed in so identical mins in different bands cannot collide.
    """
    n_bands = num_hashes // band_size
    bands = [
        F.xxhash64(
            F.lit(b), *[F.col("sig")[b * band_size + r] for r in range(band_size)]
        ).alias("block_key")
        for b in range(n_bands)
    ]
    return signatures.select(
        "conv_id", F.explode(F.array(*bands)).alias("block_key")
    )


def turn_text_block_keys(transcripts: DataFrame) -> DataFrame:
    """Exact per-turn text fingerprint blocks (third blocking axis).

    Near-duplicate conversations typically share >= 1 verbatim turn;
    unrelated conversations essentially never share a full turn text.
    One block key per distinct (conv_id, turn text). Boilerplate turns
    (greetings, empty tool outputs) create huge blocks — those are
    exactly what ``prune_oversized_blocks`` drops.
    """
    return (
        transcripts.where(F.length("text") > 0)
        .select(
            "conv_id",
            F.xxhash64(F.lit("turntext"), F.col("text")).alias("block_key"),
        )
        .dropDuplicates(["conv_id", "block_key"])
    )


def tool_sig_block_keys(series: DataFrame) -> DataFrame:
    """Exact tool-sequence signature blocks (second blocking axis).
    Only conversations that used >= 1 tool participate."""
    return series.where(F.col("tool_sig") != "").select(
        "conv_id", F.xxhash64(F.lit("toolsig"), F.col("tool_sig")).alias("block_key")
    )


def prune_oversized_blocks(
    blocks: DataFrame, max_block: int = DEFAULT_MAX_BLOCK
) -> tuple[DataFrame, DataFrame]:
    """Split blocks into (kept, block_stats).

    A block of size s generates s*(s-1)/2 pairs; blocks above
    ``max_block`` are almost always non-discriminative boilerplate and
    are the skew bombs at scale. They are dropped here and REPORTED in
    block_stats (n_blocks, n_dropped_blocks, max size, pairs estimate).
    """
    # One pass: sized is tiny (one row per block key) — persist it so
    # the stats agg, the keep-keys broadcast, and the candidate join do
    # NOT each recompute the shingle/minhash subtree.
    sized = (
        blocks.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("block_size"))
        .persist()
    )
    stats = sized.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(F.col("block_size") > max_block, 1).otherwise(0)).alias(
            "n_dropped_blocks"
        ),
        F.max("block_size").alias("max_block_size"),
        F.sum(
            F.when(
                F.col("block_size") <= max_block,
                F.col("block_size") * (F.col("block_size") - 1) / 2,
            ).otherwise(0)
        ).cast("long").alias("est_candidate_pairs"),
    )
    keep_keys = sized.where(F.col("block_size") <= max_block).select("block_key")
    # keep_keys is small relative to blocks; broadcast when it fits.
    kept = blocks.join(F.broadcast(keep_keys), "block_key")
    return kept, stats


def candidate_pairs(blocks: DataFrame) -> DataFrame:
    """Self-join block table on block_key -> deduped ordered pairs.

    The ``conv_id_a < conv_id_b`` predicate is the reference's TRIL
    optimization (/root/reference/src/cuTWED_core.h:598-600) expressed
    declaratively; Catalyst pushes it into the join. Multi-band hits
    are collapsed by dropDuplicates (the reference's
    dropDuplicates-after-union analog, SURVEY.md §2.2 "Distinct").
    """
    left = blocks.select(F.col("block_key"), F.col("conv_id").alias("conv_id_a"))
    right = blocks.select(F.col("block_key"), F.col("conv_id").alias("conv_id_b"))
    return (
        left.join(right, "block_key")
        .where(F.col("conv_id_a") < F.col("conv_id_b"))
        .select("conv_id_a", "conv_id_b")
        .dropDuplicates(["conv_id_a", "conv_id_b"])
    )


def with_signatures(
    transcripts: DataFrame,
    series: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_k: int = DEFAULT_SHINGLE_K,
    word_num_hashes: int = 8,
    short_conv_turns: int = 8,
) -> DataFrame:
    """series + ``sig`` (k-gram minhash) + ``wsig`` (word minhash, short
    conversations only, else null) — the blocking STATE columns.

    Persisting these alongside the series makes blocking derivable from
    state alone: the streaming/incremental path never re-reads old
    transcripts, and the batch path computes each signature exactly once.
    """
    sh = turn_shingle_hashes(transcripts, shingle_k)
    sig = minhash_from_hashes(sh, num_hashes)
    # Short-conversation ids from a plain turn count on transcripts —
    # NOT from ``series`` (series is usually an unpersisted plan here,
    # and filtering it would re-run the whole featurize+collect subtree
    # just to read n_turns). The count agg reuses the conv_id
    # partitioning: no extra shuffle.
    short_ids = (
        transcripts.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") < F.lit(short_conv_turns))
        .select("conv_id")
    )
    words = turn_shingle_hashes(transcripts.join(short_ids, "conv_id"), 1)
    wsig = minhash_from_hashes(words, word_num_hashes).withColumnRenamed(
        "sig", "wsig"
    )
    return series.join(sig, "conv_id", "left").join(wsig, "conv_id", "left")


def block_keys_from_state(
    state: DataFrame,
    band_size: int = DEFAULT_BAND_SIZE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    word_num_hashes: int = 8,
) -> DataFrame:
    """All four blocking axes derived purely from the state table
    (conv_id, sig, wsig, tool_sig, text_hashes):

    1. k-gram minhash LSH bands (sig),
    2. word minhash single-row bands (wsig; short conversations),
    3. exact tool-sequence signature,
    4. exact per-turn text fingerprint (text_hashes).
    """
    lsh = lsh_block_keys(state.where(F.col("sig").isNotNull()), band_size, num_hashes)
    wbands = [
        F.xxhash64(F.lit("wordmh"), F.lit(b), F.col("wsig")[b]).alias("bk")
        for b in range(word_num_hashes)
    ]
    wlsh = (
        state.where(F.col("wsig").isNotNull())
        .select("conv_id", F.explode(F.array(*wbands)).alias("block_key"))
    )
    tool = state.where(F.col("tool_sig") != "").select(
        "conv_id", F.xxhash64(F.lit("toolsig"), F.col("tool_sig")).alias("block_key")
    )
    ttext = state.select(
        "conv_id",
        F.explode_outer(F.col("text_hashes")).alias("th"),
    ).select(
        "conv_id", F.xxhash64(F.lit("turntext"), F.col("th")).alias("block_key")
    ).where(F.col("block_key").isNotNull()).dropDuplicates(["conv_id", "block_key"])
    return lsh.unionByName(wlsh).unionByName(tool).unionByName(ttext)


def build_candidate_pairs_from_state(
    state: DataFrame,
    band_size: int = DEFAULT_BAND_SIZE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> tuple[DataFrame, DataFrame]:
    """Blocking from the signature-carrying state table
    -> (pairs, block_stats)."""
    blocks = block_keys_from_state(state, band_size, num_hashes).persist()
    kept, stats = prune_oversized_blocks(blocks, max_block)
    return candidate_pairs(kept), stats


def build_candidate_pairs(
    transcripts: DataFrame,
    series: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_k: int = DEFAULT_SHINGLE_K,
    max_block: int = DEFAULT_MAX_BLOCK,
    short_conv_turns: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Full blocking stage -> (pairs, block_stats)."""
    sh = conversation_shingles(transcripts, shingle_k, dedup=False)
    sig = minhash_signatures(sh, num_hashes)
    lsh = lsh_block_keys(sig, band_size, num_hashes)
    # Fourth axis: word-level (k=1) minhash with single-row bands, for
    # SHORT conversations only — their k-gram shingle sets are too small
    # to survive banding after heavy edits. Word-level hashing collides
    # heavily (same-domain conversations share vocabulary), so gating it
    # on conversation length bounds the candidate blow-up to
    # short-x-short pairs; the block-size cap and scoring handle those.
    short_ids = series.where(F.col("n_turns") < F.lit(short_conv_turns)).select(
        "conv_id"
    )
    # plain join (AQE picks the strategy): short_ids can itself be huge
    # at 10^12-turn scale, so no forced broadcast here
    words = conversation_shingles(
        transcripts.join(short_ids, "conv_id"), 1, dedup=False
    )
    wsig = minhash_signatures(words, 8)
    wlsh = lsh_block_keys(wsig, 1, 8).withColumn(
        "block_key", F.xxhash64(F.lit("wordmh"), F.col("block_key"))
    )
    blocks = (
        lsh.unionByName(wlsh)
        .unionByName(tool_sig_block_keys(series))
        .unionByName(turn_text_block_keys(transcripts))
        .persist()  # read by the size profile AND the candidate join
    )
    kept, stats = prune_oversized_blocks(blocks, max_block)
    return candidate_pairs(kept), stats
