"""Spark-level integration tests (SURVEY.md §5 'Our test plan' item 3):
pipeline F1, blocking recall, stable-ordering invariant, full-path
numerical parity, checkpoint/resume idempotence.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cutwed_spark.operators.assemble import assemble_series
from cutwed_spark.operators.blocking import (
    build_candidate_pairs_from_state,
    with_signatures,
)
from cutwed_spark.operators.scoring import score_candidates, twed_scalar_udf, attach_series
from cutwed_spark.plans.pipeline import PipelineConfig, run_pipeline
from cutwed_spark.sources.synth import synth_corpus
from cutwed_spark.twed.core import twed_reference


@pytest.fixture(scope="module")
def corpus(spark):
    tr, lab = synth_corpus(120)
    return spark.createDataFrame(tr), spark.createDataFrame(lab), tr, lab


@pytest.fixture(scope="module")
def result(spark, corpus):
    trdf, labdf, _, _ = corpus
    return run_pipeline(spark, trdf, PipelineConfig(), labeled=labdf)


def test_pipeline_f1(result):
    """The headline gate: pairwise F1 >= 0.99 on labeled pairs."""
    assert result.evaluation["f1"] >= 0.99, result.evaluation


def test_blocking_recall(spark, corpus):
    """Every (or nearly every) labeled positive must surface as a
    candidate pair — blocking recall bounds pipeline recall."""
    trdf, labdf, _, lab = corpus
    cfg = PipelineConfig()
    series = with_signatures(trdf, assemble_series(trdf, cfg.n_buckets, cfg.max_turns))
    pairs, _ = build_candidate_pairs_from_state(series)
    pos = labdf.where("is_match")
    covered = pos.join(pairs, ["conv_id_a", "conv_id_b"]).count()
    total = pos.count()
    assert covered / total >= 0.99, (covered, total)


def test_degenerate_single_conversation(spark):
    """One conversation: no pairs, no edges, one singleton cluster —
    every stage must handle the empty-downstream case without crashing."""
    import pandas as pd

    tr = pd.DataFrame(
        {
            "conv_id": ["only"] * 3,
            "turn_idx": [0, 1, 2],
            "role": ["user", "assistant", "user"],
            "text": ["hello there", "hi how can i help", "thanks bye"],
            "tool": ["", "", ""],
            "ts": pd.to_datetime(
                ["2025-01-01 00:00:00", "2025-01-01 00:00:30",
                 "2025-01-01 00:01:00"]
            ),
        }
    )
    res = run_pipeline(spark, spark.createDataFrame(tr), PipelineConfig(threshold=0.5))
    assert res.edges.count() == 0
    clusters = res.clusters.collect()
    assert len(clusters) == 1
    assert clusters[0]["cluster_id"] == "only"


def test_one_pass_assembly_matches_separate_trees(spark, corpus):
    """assemble_with_signatures (single scan/shuffle, zero joins — the
    pipeline default) must produce exactly the rows of the two-tree
    formulation assemble_series + with_signatures."""
    from cutwed_spark.operators.assemble import assemble_with_signatures

    trdf, _, _, _ = corpus
    cfg = PipelineConfig()
    one = assemble_with_signatures(
        trdf, cfg.n_buckets, cfg.max_turns, num_hashes=cfg.num_hashes
    )
    two = with_signatures(
        trdf,
        assemble_series(trdf, cfg.n_buckets, cfg.max_turns),
        num_hashes=cfg.num_hashes,
    ).select(*one.columns)
    def key(r):
        return r["conv_id"]
    rows_one = sorted(one.collect(), key=key)
    rows_two = sorted(two.collect(), key=key)
    assert len(rows_one) == len(rows_two)
    for a, b in zip(rows_one, rows_two):
        assert a.asDict() == b.asDict(), (a["conv_id"],)


def test_stable_turn_ordering_invariant(spark, corpus):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the per-row invariant from BASELINE.json input_hint. Assembled
    text_hashes must equal the pandas-side ordering regardless of
    shuffle; exercised against a deliberately shuffled input."""
    trdf, _, tr, _ = corpus
    shuffled = trdf.orderBy(F.rand(seed=1))  # scramble row order
    series = assemble_series(shuffled, 8, None)
    got = {r["conv_id"]: list(r["text_hashes"]) for r in series.collect()}
    # expected: xxhash64 of text in turn_idx order, computed via Spark
    # on the UNshuffled input
    exp_df = trdf.select("conv_id", "turn_idx", F.xxhash64("text").alias("h"))
    exp = {}
    for r in exp_df.collect():
        exp.setdefault(r["conv_id"], []).append((r["turn_idx"], r["h"]))
    for cid, pairs_ in exp.items():
        want = [h for _, h in sorted(pairs_)]
        assert got[cid] == want, cid


def test_full_path_numerical_parity(spark, result):
    """A pair scored through mapInArrow must match the O(n^2) Marteau
    oracle recomputed on the driver (float64, ~bit-exact)."""
    cfg = PipelineConfig()
    rows = result.scored.orderBy("conv_id_a", "conv_id_b").limit(3).collect()
    ids = {r["conv_id_a"] for r in rows} | {r["conv_id_b"] for r in rows}
    sa = {
        x["conv_id"]: x
        for x in result.series.where(F.col("conv_id").isin(list(ids))).collect()
    }
    for row in rows:
        A = np.array(sa[row["conv_id_a"]]["values_flat"]).reshape(-1, cfg.dim)
        TA = np.array(sa[row["conv_id_a"]]["times"]) * cfg.time_scale
        B = np.array(sa[row["conv_id_b"]]["values_flat"]).reshape(-1, cfg.dim)
        TB = np.array(sa[row["conv_id_b"]]["times"]) * cfg.time_scale
        want = twed_reference(A, TA, B, TB, cfg.nu, cfg.lamb, cfg.degree)
        assert abs(row["twed"] - want) <= 1e-9 * max(1.0, want)


def test_scalar_udf_matches_arrow_path(spark, corpus):
    """SURVEY.md §2 row 1 vs row 3: the scalar pandas UDF (correctness
    path) and mapInArrow batch path agree."""
    trdf, _, _, _ = corpus
    cfg = PipelineConfig()
    series = with_signatures(trdf, assemble_series(trdf, cfg.n_buckets, cfg.max_turns))
    pairs, _ = build_candidate_pairs_from_state(series)
    # deterministic subset: limit() on an unordered DF differs per run
    pairs = pairs.orderBy("conv_id_a", "conv_id_b").limit(20)
    batch = {
        (r["conv_id_a"], r["conv_id_b"]): r["twed"]
        for r in score_candidates(pairs, series, dim=cfg.dim, nu=cfg.nu, lamb=cfg.lamb).collect()
    }
    udf = twed_scalar_udf(cfg.dim, cfg.nu, cfg.lamb, cfg.degree)
    scalar = {
        (r["conv_id_a"], r["conv_id_b"]): r["d"]
        for r in attach_series(pairs, series)
        .select("conv_id_a", "conv_id_b", udf("va", "ta", "vb", "tb").alias("d"))
        .collect()
    }
    assert set(batch) == set(scalar)
    for k in batch:
        assert abs(batch[k] - scalar[k]) <= 1e-9 * max(1.0, scalar[k]), k


def test_checkpoint_resume_idempotent(spark, corpus, tmp_path):
    trdf, labdf, _, _ = corpus
    ck = str(tmp_path / "ckpt")
    r1 = run_pipeline(spark, trdf, PipelineConfig(), labeled=labdf, checkpoint_dir=ck)
    r2 = run_pipeline(spark, trdf, PipelineConfig(), labeled=labdf, checkpoint_dir=ck)
    assert r1.metrics["n_scored_pairs"] == r2.metrics["n_scored_pairs"]
    assert r1.metrics["n_clusters"] == r2.metrics["n_clusters"]
    assert r2.evaluation["f1"] >= 0.99


def test_cluster_recovery(result, corpus):
    """Planted duplicate groups cluster together; distinct base
    conversations never merge."""
    _, _, _, lab = corpus
    cl = {r["conv_id"]: r["cluster_id"] for r in result.clusters.collect()}
    pos = lab[lab.is_match]
    neg = lab[~lab.is_match]
    pos_ok = sum(cl[a] == cl[b] for a, b in zip(pos.conv_id_a, pos.conv_id_b))
    neg_bad = sum(cl[a] == cl[b] for a, b in zip(neg.conv_id_a, neg.conv_id_b))
    assert pos_ok / len(pos) >= 0.99
    assert neg_bad == 0


def test_salted_scoring_is_correctness_neutral(spark, corpus):
    """SURVEY.md §4 manual item (a): salted repartitioning defuses hot
    keys WITHOUT changing any score — same pairs, same TWED values as
    the unsalted path."""
    trdf, _, _, _ = corpus
    cfg = PipelineConfig()
    series = with_signatures(trdf, assemble_series(trdf, cfg.n_buckets, cfg.max_turns))
    pairs, _ = build_candidate_pairs_from_state(series)
    plain = {
        (r["conv_id_a"], r["conv_id_b"]): r["twed"]
        for r in score_candidates(
            pairs, series, dim=cfg.dim, nu=cfg.nu, lamb=cfg.lamb
        ).collect()
    }
    salted = {
        (r["conv_id_a"], r["conv_id_b"]): r["twed"]
        for r in score_candidates(
            pairs, series, dim=cfg.dim, nu=cfg.nu, lamb=cfg.lamb, salt=7
        ).collect()
    }
    assert set(plain) == set(salted)
    for k, v in plain.items():
        assert abs(v - salted[k]) <= 1e-12 * max(1.0, abs(v)), k


def test_cogrouped_scoring_matches_join_path(spark, corpus):
    """score_candidates_cogrouped (dictionary-encoded transfer) computes
    the same edges as the per-pair-join path."""
    from cutwed_spark.operators.scoring import score_candidates_cogrouped

    trdf, _, _, _ = corpus
    cfg = PipelineConfig()
    series = with_signatures(trdf, assemble_series(trdf, cfg.n_buckets, cfg.max_turns))
    pairs, _ = build_candidate_pairs_from_state(series)
    a = {
        (r["conv_id_a"], r["conv_id_b"]): r["twed"]
        for r in score_candidates(
            pairs, series, dim=cfg.dim, nu=cfg.nu, lamb=cfg.lamb
        ).collect()
    }
    b = {
        (r["conv_id_a"], r["conv_id_b"]): r["twed"]
        for r in score_candidates_cogrouped(
            pairs, series, dim=cfg.dim, nu=cfg.nu, lamb=cfg.lamb
        ).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) <= 1e-9 * max(1.0, abs(a[k])), k
