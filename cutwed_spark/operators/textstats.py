"""Text analysis operators for training-data curation: quality
scoring, language ID, token counting, document fingerprinting.

All pure Catalyst built-ins over a ``documents``-shaped table; every
formula is arithmetic/string-function-portable so the DuckDB oracle
can reproduce values exactly (floats rounded at the output edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cutwed_spark.operators.dedup import normalized_text

# Compact English stopword list shared verbatim with the oracle SQL.
STOPWORDS = (
    "the a an and or of to in for on with from by at as is are was were "
    "be been it this that these those i you he she we they not no".split()
)


def quality_stats(docs: DataFrame) -> DataFrame:
    """Per-doc surface statistics + a composite quality score.
    Output: (doc_id, n_chars, n_words, avg_word_len, stopword_ratio,
    punct_ratio, digit_ratio, quality_score)."""
    norm = normalized_text()
    words = F.split(norm, " ")
    n_chars = F.length(norm).cast("double")
    n_words = F.size(words).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).cast(
        "double"
    )
    n_punct = F.length(F.regexp_replace(norm, r"[^.!?,;:]", "")).cast("double")
    n_digit = F.length(F.regexp_replace(norm, r"[^0-9]", "")).cast("double")
    avg_wl = F.when(n_words > 0, F.round(n_chars / n_words, 4)).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, F.round(n_stop / n_words, 4)).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, F.round(n_punct / n_chars, 4)).otherwise(0.0)
    digit_ratio = F.when(n_chars > 0, F.round(n_digit / n_chars, 4)).otherwise(0.0)
    # quality: long-enough, word-length sane, not digit/punct soup
    score = F.round(
        F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.when((avg_wl >= 3) & (avg_wl <= 10), 0.3).otherwise(0.0)
        + F.when(digit_ratio <= 0.3, 0.2).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.1).otherwise(0.0),
        4,
    )
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        avg_wl.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, en_threshold: float = 0.08) -> DataFrame:
    """Stopword-ratio language heuristic: docs whose stopword ratio
    clears the threshold are tagged 'en', else 'other'.
    Output: (doc_id, lang_pred)."""
    q = quality_stats(docs)
    return q.select(
        "doc_id",
        F.when(F.col("stopword_ratio") >= en_threshold, "en")
        .otherwise("other")
        .alias("lang_pred"),
    )


# GPT-2-style pre-tokenizer shape, simplified to the subset whose
# semantics agree between Java regex (Spark) and RE2 (DuckDB):
# contraction suffixes, letter runs, digit runs, punctuation runs.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9 ']+|'"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens, a chars/4 BPE estimate (the standard
    back-of-envelope for LLM corpus sizing), and an actual BPE-ish
    REGEX pre-token count (contractions / letter runs / digit runs /
    punctuation runs — the GPT-2 pre-tokenizer shape).
    Output: (doc_id, n_words, est_bpe_tokens, n_regex_tokens)."""
    norm = normalized_text()
    n_words = F.size(F.split(norm, " ")).cast("bigint")
    n_chars = F.length(norm).cast("double")
    est = F.ceil(n_chars / F.lit(4.0)).cast("bigint")
    n_regex = F.regexp_count(norm, F.lit(BPE_TOKEN_PATTERN)).cast("bigint")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.greatest(est, n_words).alias("est_bpe_tokens"),
        n_regex.alias("n_regex_tokens"),
    )


WINNOW_K = 8


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of normalized text, a coarse 64-char
    prefix fingerprint for prefix-dup detection, and a ROLLING-HASH
    winnowing fingerprint — the lexicographic min over all char-8-gram
    hashes, invariant to local insertions/deletions elsewhere in the
    document (one linear pass; the min selection is the 1-fingerprint
    degenerate case of the winnowing scheme).
    Output: (doc_id, fingerprint, prefix_fingerprint, winnow_fingerprint).
    """
    # norm is materialized as a column in its own projection BEFORE the
    # per-gram lambda references it: HOF lambdas are excluded from
    # subexpression elimination, so inlining the normalization tree
    # would re-run it once per gram (O(len^2) per document).
    base = docs.select("doc_id", normalized_text().alias("norm"))
    norm = F.col("norm")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(norm) - F.lit(WINNOW_K - 1)),
        lambda i: F.md5(F.substring(norm, i, F.lit(WINNOW_K))),
    )
    winnow = F.when(
        F.length(norm) >= WINNOW_K, F.array_min(grams)
    ).otherwise(F.md5(norm))
    return base.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.md5(F.substring(norm, 1, 64)).alias("prefix_fingerprint"),
        winnow.alias("winnow_fingerprint"),
    )


def hashed_embedding(docs: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-hashing text embedding (the "hashing trick"): word w
    adds sign(w) to component bucket(w), then L2-normalize. No model,
    no vocabulary, deterministic and engine-portable (md5-derived
    bucket + sign, like simhash_docs) — the scalable baseline embedder
    that connects the documents table to the similarity stack
    (cosine_topk / topk_neighbors / embedding near-dup) when no neural
    embedder is available. One explode + one groupBy (map-side partial
    agg). Output: (doc_id, embedding array<double>), components
    rounded to 4dp AFTER normalization so the DuckDB oracle matches
    exactly; all-empty docs embed as the zero vector.
    """
    words = docs.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("word")
    ).where(F.col("word") != "")
    h = F.md5(F.col("word"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(dim)
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 1, F.lit(1)
    ).otherwise(F.lit(-1))
    # Materialize bucket/sign ONCE per word in their own projection,
    # then branch on the cheap scalar columns: inlining the md5 tree in
    # dim conditional columns blows codegen past janino's method limit
    # (interpreted fallback) and recomputes the hash up to 2*dim times.
    hashed = words.select("doc_id", bucket.alias("b"), sign.alias("s"))
    sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("b") == j, F.col("s")).otherwise(0)).alias(f"s{j}")
            for j in range(dim)
        ]
    )
    # Same codegen discipline for the norm: alias it in its own
    # projection so the 2*dim references below stay one sqrt per row
    # (CollapseProject keeps the split — the alias is non-cheap and
    # multiply-referenced).
    nrm_expr = F.sqrt(
        sum(F.col(f"s{j}") * F.col(f"s{j}") for j in range(dim)).cast("double")
    )
    n = sums.select("*", nrm_expr.alias("nrm"))
    nrm = F.col("nrm")
    emb = F.array(
        *[
            F.when(nrm > 0, F.round(F.col(f"s{j}") / nrm, 4)).otherwise(F.lit(0.0))
            for j in range(dim)
        ]
    )
    return n.select("doc_id", emb.alias("embedding"))


def sentence_split_udtf():
    """Python UDTF (table function) splitting a document into trimmed,
    non-empty sentences with positions and word counts — the Spark
    UDTF family, invoked via ``LATERAL``:

        spark.udtf.register("split_sentences", sentence_split_udtf())
        SELECT d.doc_id, s.* FROM docs d, LATERAL split_sentences(d.text) s

    UDTF ``eval`` runs per input ROW (unlike the engine's hot paths,
    which are Arrow-batched) — this is coverage of the UDF-surface
    family, not a throughput path; the production-scale equivalent of
    this particular split is pure Catalyst
    (``explode(split(text, '[.!?]+'))`` + trim/filter/window). The
    split regex matches DuckDB's ``string_split_regex`` so the driver
    oracle checks it end-to-end.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string, n_words: int")
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            if text is None:
                return
            idx = 0
            for raw in re.split(r"[.!?]+", text):
                s = raw.strip()
                if not s:
                    continue
                idx += 1
                yield idx, s, len(s.split())

    return SplitSentences
