"""Regenerate cutwed_spark/plans/er_golden.py — the pytest-verified
golden edge/cluster sets of the deterministic flagship pipeline run
(seed-42 corpus, n=150), used as literal-VALUES DuckDB oracles for the
driver's er_match_edges / er_clusters contract entries.

The reference pins its kernel with golden matrices generated once from
a seeded run (/root/reference/tests/test_batch.py:34-66); this is the
same idea one level up: the full pipeline output on the fixed corpus.
tests/test_er_golden.py re-runs the pipeline and asserts equality, so
drift between code and goldens fails CI rather than the driver sweep.

Usage: python tools/gen_er_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = '''"""Golden edge/cluster sets of the deterministic flagship ER run
(seed-42 synthetic corpus, n_conversations=150) — regenerate with
tools/gen_er_golden.py whenever the pipeline's scoring/blocking
semantics change. tests/test_er_golden.py asserts the committed values
match a fresh pipeline run.

These back the literal-VALUES DuckDB oracles for the er_match_edges /
er_clusters driver entries: TWED DP + iterative connected components
are not SQL-expressible, but their output on the fixed corpus is a
constant — the reference pins its kernel the same way with seeded
golden matrices (/root/reference/tests/test_batch.py:34-66).

AUTO-GENERATED — do not edit by hand.
"""

N_CONVERSATIONS = {n}

# (conv_id_a, conv_id_b, n_a, n_b, twed, twed_norm) — twed/twed_norm
# rounded to 4dp (float64 repr round-trips exactly through SQL literals)
ER_MATCH_EDGES_ROWS = {edges}

# (conv_id, cluster_id)
ER_CLUSTERS_ROWS = {clusters}

# (conv_id_a, conv_id_b, twed_ratio) — every candidate pair the
# blocking surfaced, with its scored ratio (4dp). Doubles as the golden
# candidate-pair table for the blocking-quality oracle: scoring maps
# 1:1 over candidate pairs.
ER_SCORED_ROWS = {scored}

# (conv_id_a, conv_id_b, is_match) — the deterministic labeled pairs
# the seed-42 generator emits (ground truth for eval oracles)
ER_LABELED_ROWS = {labeled}
'''


def main() -> None:
    from cutwed_spark.plans.pipeline import PipelineConfig, run_pipeline
    from cutwed_spark.session import get_spark
    from cutwed_spark.sources.synth import synth_corpus
    from pyspark.sql import functions as F

    n = 150
    spark = get_spark(app_name="gen-er-golden", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tr, lab = synth_corpus(n)
    res = run_pipeline(
        spark,
        spark.createDataFrame(tr),
        PipelineConfig(),
        labeled=spark.createDataFrame(lab),
    )
    edges = sorted(
        (
            r["conv_id_a"],
            r["conv_id_b"],
            int(r["n_a"]),
            int(r["n_b"]),
            float(r["twed"]),
            float(r["twed_norm"]),
        )
        for r in res.edges.select(
            "conv_id_a",
            "conv_id_b",
            "n_a",
            "n_b",
            F.round("twed", 4).alias("twed"),
            F.round("twed_norm", 4).alias("twed_norm"),
        ).collect()
    )
    clusters = sorted(
        (r["conv_id"], r["cluster_id"]) for r in res.clusters.collect()
    )
    scored = sorted(
        (r["conv_id_a"], r["conv_id_b"], float(r["twed_ratio"]))
        for r in res.scored.select(
            "conv_id_a", "conv_id_b",
            F.round("twed_ratio", 4).alias("twed_ratio"),
        ).collect()
    )
    labeled_rows = sorted(
        (r["conv_id_a"], r["conv_id_b"], bool(r["is_match"]))
        for r in spark.createDataFrame(lab)
        .select("conv_id_a", "conv_id_b", "is_match")
        .collect()
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "cutwed_spark", "plans", "er_golden.py",
    )
    edges_lit = "[\n" + "".join(f"    {e!r},\n" for e in edges) + "]"
    clusters_lit = "[\n" + "".join(f"    {c!r},\n" for c in clusters) + "]"
    scored_lit = "[\n" + "".join(f"    {s!r},\n" for s in scored) + "]"
    labeled_lit = "[\n" + "".join(f"    {r!r},\n" for r in labeled_rows) + "]"
    with open(out, "w") as fh:
        fh.write(
            HEADER.format(
                n=n,
                edges=edges_lit,
                clusters=clusters_lit,
                scored=scored_lit,
                labeled=labeled_lit,
            )
        )
    print(
        f"wrote {out}: {len(edges)} edges, {len(clusters)} cluster rows, "
        f"{len(scored)} scored, {len(labeled_rows)} labeled"
    )
    spark.stop()


if __name__ == "__main__":
    main()
