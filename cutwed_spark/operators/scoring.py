"""Batched TWED scoring of candidate pairs — the throughput path.

``mapInArrow`` over candidate-pair record batches: the JVM->Python Arrow
transfer is the engine's analog of the reference's host->device memcpy
(/root/reference/src/cuTWED_core.h:394-404), and the Arrow batch is the
analog of its (nAA, nA, dim) device batch
(/root/reference/cuTWED/cuTWED.py:157-178). Inside the UDF everything is
vectorized NumPy — packing from Arrow list buffers to padded
(P, n_max, dim) ndarrays is pure offset arithmetic, NOT per-row Python
(the input_hint's "no per-row Python" requirement).

Scale/throughput design (measured on the 20k-conversation bench):
* series travel as ONE flat array<double> per conversation (the
  reference's dense C-ordered buffer, README.rst:40-42) — one Arrow
  offset level fewer than array<array<double>> = ~1.4x faster transfer;
* NO unconditional repartition: the join output feeds mapInArrow
  directly and AQE handles partition sizing/skew. An optional ``salt``
  forces a salted redistribution for pathologically hot conversations
  (SURVEY.md §4 manual item a) — it costs a full extra shuffle of the
  array payload, so it is opt-in, not default;
* optional ``transfer_dtype='float'`` halves transfer bytes (the
  reference's float32 twin kernels, src/cuTWED.cu:120-158) at ~1e-7
  relative score error; float64 stays the default (oracle-exact).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cutwed_spark.twed.core import _root, twed_pairs

SCORE_SCHEMA = (
    "conv_id_a string, conv_id_b string, n_a int, n_b int, "
    "twed double, twed_norm double, twed_ratio double"
)


def _self_delete_cost(V, T, L, nu, lamb, degree):
    """d(X, empty) per padded series: the delete-everything TWED path =
    sum of local delete costs + lambda*n + nu*t_last (htrans telescopes,
    twed.c:179-181). Normalizing d(A,B) by d(A,0)+d(0,B) gives a
    length- and magnitude-invariant score in (0, 1].

    Local costs follow the kernel's root convention (core._root):
    degree<0 is the Marteau no-root repro mode (twed.c:114-119), so
    ``twed_ratio`` stays consistent with the kernel there too."""
    deg = abs(int(degree))
    P, n_max, _ = V.shape
    first = _root(np.sum(np.abs(V[:, 0]) ** deg, axis=-1), degree, deg)
    if n_max >= 2:
        d = V[:, 1:] - V[:, :-1]
        step = _root(np.sum(np.abs(d) ** deg, axis=-1), degree, deg)
        mask = np.arange(1, n_max)[None, :] < L[:, None]
        local = first + np.sum(step * mask, axis=1)
    else:
        local = first
    local[L == 0] = 0.0
    idx = np.maximum(L - 1, 0)
    t_last = T[np.arange(P), idx]
    t_last = np.where(L > 0, t_last, 0.0)
    return local + lamb * L + nu * t_last


def _pad_from_arrow(values_flat: pa.Array, times: pa.Array, dim: int):
    """Flat list<double> (len n*dim) + list<double> (len n) Arrow columns
    -> padded NumPy (V (P, n_max, dim), T (P, n_max), L (P,)).

    Lengths come from the times column; the flat value buffer reshapes
    to (total_turns, dim) and scatters with vectorized indices.
    """
    lens = pc.list_value_length(times).to_numpy().astype(np.int64)
    P = len(lens)
    total = int(lens.sum())
    n_max = int(lens.max()) if P else 0
    flat_turns = np.asarray(values_flat.flatten(), dtype=np.float64).reshape(
        total, dim
    )
    flat_t = np.asarray(times.flatten(), dtype=np.float64)
    V = np.zeros((P, n_max, dim), dtype=np.float64)
    T = np.zeros((P, n_max), dtype=np.float64)
    starts = np.zeros(P, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    rows = np.repeat(np.arange(P, dtype=np.int64), lens)
    cols = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    V[rows, cols] = flat_turns
    T[rows, cols] = flat_t
    return V, T, lens


def _dedup_side(ids: pa.Array, values: pa.Array, times: pa.Array, dim: int):
    """Dictionary-encode one pair side so each distinct conversation in
    the batch is padded and self-cost-scored ONCE (a series appears in
    several candidate pairs; the join output materializes it per pair).
    Returns (V_unique, T_unique, L_unique, codes) where ``codes[k]`` is
    the unique-stack row of pair ``k`` — the gather contract of
    :func:`cutwed_spark.twed.core.twed_pairs` (its ``idxA``/``idxB``).
    The reference's batch API has the same shape: unique series stacks
    + an implicit all-pairs index (/root/reference/src/cuTWED.h:97-105)."""
    enc = pc.dictionary_encode(ids)
    codes = np.asarray(enc.indices, dtype=np.int64)
    # dictionary codes are dense 0..K-1 in first-appearance order
    _, first = np.unique(codes, return_index=True)
    take = pa.array(first)
    V, T, L = _pad_from_arrow(values.take(take), times.take(take), dim)
    return V, T, L, codes


def make_score_fn(dim: int, nu: float, lamb: float, degree: int):
    """Arrow batch iterator for mapInArrow (picklable closure)."""

    def score(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            if batch.num_rows == 0:
                continue
            cols = {name: batch.column(name) for name in batch.schema.names}
            Va, Ta, La, ia = _dedup_side(
                cols["conv_id_a"], cols["va"], cols["ta"], dim
            )
            Vb, Tb, Lb, ib = _dedup_side(
                cols["conv_id_b"], cols["vb"], cols["tb"], dim
            )
            d = twed_pairs(Va, Ta, La, ia, Vb, Tb, Lb, ib, nu, lamb, degree)
            na = La[ia]
            nb = Lb[ib]
            denom = np.maximum(na + nb, 1).astype(np.float64)
            self_cost = (
                _self_delete_cost(Va, Ta, La, nu, lamb, degree)[ia]
                + _self_delete_cost(Vb, Tb, Lb, nu, lamb, degree)[ib]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    cols["conv_id_a"],
                    cols["conv_id_b"],
                    pa.array(na.astype(np.int32)),
                    pa.array(nb.astype(np.int32)),
                    pa.array(d),
                    pa.array(d / denom),
                    pa.array(d / np.maximum(self_cost, 1e-12)),
                ],
                names=[
                    "conv_id_a", "conv_id_b", "n_a", "n_b",
                    "twed", "twed_norm", "twed_ratio",
                ],
            )

    return score


def attach_series(
    pairs: DataFrame,
    series: DataFrame,
    time_scale: float = 1.0,
    transfer_dtype: str = "double",
) -> DataFrame:
    """pairs (conv_id_a, conv_id_b) x series -> pair rows carrying both
    flat series buffers. Two shuffle joins on conv_id; Catalyst prunes
    the series table to (conv_id, values_flat, times) before the
    shuffle."""
    v = F.col("values_flat")
    if transfer_dtype == "float":
        v = v.cast("array<float>")
    t = F.col("times")
    if time_scale != 1.0:
        t = F.transform(t, lambda x: x * F.lit(float(time_scale)))
    slim = series.select("conv_id", v.alias("v"), t.alias("t"))
    a = slim.select(
        F.col("conv_id").alias("conv_id_a"),
        F.col("v").alias("va"),
        F.col("t").alias("ta"),
    )
    b = slim.select(
        F.col("conv_id").alias("conv_id_b"),
        F.col("v").alias("vb"),
        F.col("t").alias("tb"),
    )
    # SHUFFLE_HASH on the series side: skips SortMergeJoin's sort of the
    # array-payload rows (~15-20% off the stage). Safe at scale — the
    # per-partition build side is series_bytes / n_shuffle_partitions,
    # which the partition count already bounds; AQE may still upgrade to
    # broadcast when the series table is small enough.
    return pairs.join(a.hint("shuffle_hash"), "conv_id_a").join(
        b.hint("shuffle_hash"), "conv_id_b"
    )


def score_candidates(
    pairs: DataFrame,
    series: DataFrame,
    dim: int,
    nu: float = 1.0,
    lamb: float = 1.0,
    degree: int = 2,
    num_partitions: int | None = None,
    salt: int | None = None,
    time_scale: float = 1.0,
    transfer_dtype: str = "double",
) -> DataFrame:
    """Candidate pairs -> scored edges (conv_id_a, conv_id_b, n_a, n_b,
    twed, twed_norm) via per-pair join + mapInArrow — the DEFAULT
    scoring path (see score_candidates_cogrouped for when the
    dictionary-encoded variant wins instead).

    ``twed_norm = twed / (n_a + n_b)`` is the length-normalized score the
    thresholding stage uses (raw TWED grows with series length).
    ``salt`` (opt-in) forces a salted repartition for hot-key skew that
    AQE cannot split; it costs an extra shuffle of the array payload.
    """
    joined = attach_series(pairs, series, time_scale, transfer_dtype)
    if salt:
        n_part = num_partitions or int(
            joined.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        joined = joined.repartition(
            n_part, F.pmod(F.xxhash64("conv_id_a", "conv_id_b"), F.lit(salt))
        )
    # Length-homogeneous Arrow batches: an in-partition sort (no shuffle)
    # by DP extent means each batch pads to ~its own mean instead of the
    # partition max — less zero-fill memory traffic in the UDF and
    # tighter kernel chunks (the reference's equal-length-batch
    # requirement, cuTWED/cuTWED.py:167-175, recovered as an optimization).
    joined = joined.sortWithinPartitions(F.greatest(F.size("ta"), F.size("tb")))
    return joined.mapInArrow(make_score_fn(dim, nu, lamb, degree), SCORE_SCHEMA)


def make_cogroup_score_fn(dim: int, nu: float, lamb: float, degree: int):
    """(pairs_pdf, series_pdf) -> scored pandas frame, for cogrouped
    applyInPandas. The series frame holds each conversation ONCE; pairs
    reference them by id — the gather happens via twed_pairs' index
    arrays, exactly like the reference scoring one device-resident batch
    against index pairs (/root/reference/src/cuTWED_core.h:583-620)."""

    def fn(pairs_pdf: pd.DataFrame, series_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "conv_id_a", "conv_id_b", "n_a", "n_b",
            "twed", "twed_norm", "twed_ratio",
        ]
        if len(pairs_pdf) == 0 or len(series_pdf) == 0:
            return pd.DataFrame({c: [] for c in cols})
        ids = series_pdf["conv_id"].to_numpy()
        pos = pd.Series(np.arange(len(ids)), index=ids)
        lens = series_pdf["times"].map(len).to_numpy(np.int64)
        N = len(ids)
        n_max = int(lens.max())
        total = int(lens.sum())
        flat_v = np.concatenate(series_pdf["values_flat"].to_list()).reshape(
            total, dim
        )
        flat_t = np.concatenate(series_pdf["times"].to_list())
        V = np.zeros((N, n_max, dim), dtype=np.float64)
        T = np.zeros((N, n_max), dtype=np.float64)
        starts = np.zeros(N, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        rows = np.repeat(np.arange(N, dtype=np.int64), lens)
        colix = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        V[rows, colix] = flat_v
        T[rows, colix] = flat_t
        ia = pos[pairs_pdf["conv_id_a"].to_numpy()].to_numpy(np.int64)
        ib = pos[pairs_pdf["conv_id_b"].to_numpy()].to_numpy(np.int64)
        d = twed_pairs(V, T, lens, ia, V, T, lens, ib, nu, lamb, degree)
        la, lb = lens[ia], lens[ib]
        self_cost = _self_delete_cost(V, T, lens, nu, lamb, degree)
        return pd.DataFrame(
            {
                "conv_id_a": pairs_pdf["conv_id_a"].to_numpy(),
                "conv_id_b": pairs_pdf["conv_id_b"].to_numpy(),
                "n_a": la.astype(np.int32),
                "n_b": lb.astype(np.int32),
                "twed": d,
                "twed_norm": d / np.maximum(la + lb, 1),
                "twed_ratio": d / np.maximum(self_cost[ia] + self_cost[ib], 1e-12),
            }
        )

    return fn


def make_cogroup_score_arrow_fn(dim: int, nu: float, lamb: float, degree: int):
    """(pairs_tbl, series_tbl) -> scored pa.Table, for cogrouped
    applyInArrow (no pandas materialization)."""

    def fn(pairs_tbl: pa.Table, series_tbl: pa.Table) -> pa.Table:
        if pairs_tbl.num_rows == 0 or series_tbl.num_rows == 0:
            return pa.table(
                {
                    "conv_id_a": pa.array([], pa.string()),
                    "conv_id_b": pa.array([], pa.string()),
                    "n_a": pa.array([], pa.int32()),
                    "n_b": pa.array([], pa.int32()),
                    "twed": pa.array([], pa.float64()),
                    "twed_norm": pa.array([], pa.float64()),
                    "twed_ratio": pa.array([], pa.float64()),
                }
            )
        series_tbl = series_tbl.combine_chunks()
        vcol = series_tbl.column("values_flat").chunk(0)
        tcol = series_tbl.column("times").chunk(0)
        lens = pc.list_value_length(tcol).to_numpy().astype(np.int64)
        N = len(lens)
        total = int(lens.sum())
        n_max = int(lens.max())
        flat_v = np.asarray(vcol.flatten(), dtype=np.float64).reshape(total, dim)
        flat_t = np.asarray(tcol.flatten(), dtype=np.float64)
        V = np.zeros((N, n_max, dim), dtype=np.float64)
        T = np.zeros((N, n_max), dtype=np.float64)
        starts = np.zeros(N, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        rows = np.repeat(np.arange(N, dtype=np.int64), lens)
        colix = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        V[rows, colix] = flat_v
        T[rows, colix] = flat_t
        ids = series_tbl.column("conv_id").to_pandas()
        pos = pd.Series(np.arange(N), index=ids.to_numpy())
        pa_ids_a = pairs_tbl.column("conv_id_a").to_pandas().to_numpy()
        pa_ids_b = pairs_tbl.column("conv_id_b").to_pandas().to_numpy()
        ia = pos[pa_ids_a].to_numpy(np.int64)
        ib = pos[pa_ids_b].to_numpy(np.int64)
        d = twed_pairs(V, T, lens, ia, V, T, lens, ib, nu, lamb, degree)
        la, lb = lens[ia], lens[ib]
        self_cost = _self_delete_cost(V, T, lens, nu, lamb, degree)
        return pa.table(
            {
                "conv_id_a": pa.array(pa_ids_a, pa.string()),
                "conv_id_b": pa.array(pa_ids_b, pa.string()),
                "n_a": pa.array(la.astype(np.int32)),
                "n_b": pa.array(lb.astype(np.int32)),
                "twed": pa.array(d),
                "twed_norm": pa.array(d / np.maximum(la + lb, 1)),
                "twed_ratio": pa.array(
                    d / np.maximum(self_cost[ia] + self_cost[ib], 1e-12)
                ),
            },
        )

    return fn


def score_candidates_cogrouped(
    pairs: DataFrame,
    series: DataFrame,
    dim: int,
    nu: float = 1.0,
    lamb: float = 1.0,
    degree: int = 2,
    num_partitions: int | None = None,
    time_scale: float = 1.0,
    transfer_dtype: str = "double",
    use_arrow: bool = True,
) -> DataFrame:
    """Dictionary-encoded scoring: partition pairs by a hash bucket,
    ship each partition the DISTINCT series it needs (once, not once
    per pair), cogroup, score.

    The transfer analog of the reference copying the series batch to
    the device once and sweeping all pairs against it
    (/root/reference/src/cuTWED_core.h:583-620). NOT the default: a
    series lands in ~min(pair_degree, n_partitions) partitions either
    way, so the volume saving only materializes when pair-degree >>
    shuffle partitions (hot-conversation skew), while this path always
    pays the needed-series dedup, an extra series shuffle, and
    full-group materialization — measured ~6x slower than
    score_candidates at the 100k bench corpus (degree ~5). Use it as
    the escape hatch for high-degree corpora.
    """
    spark = pairs.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    keyed = pairs.select(
        F.pmod(F.xxhash64("conv_id_a", "conv_id_b"), F.lit(n_part))
        .cast("int")
        .alias("part"),
        "conv_id_a",
        "conv_id_b",
    )
    # distinct (partition, conv) pairs; renamed key avoids Spark's
    # ambiguous-self-join check when cogrouping against `keyed`
    needed = (
        keyed.select(F.col("part").alias("p"), F.col("conv_id_a").alias("conv_id"))
        .unionAll(
            keyed.select(F.col("part").alias("p"), F.col("conv_id_b").alias("conv_id"))
        )
        .dropDuplicates(["p", "conv_id"])
    )
    v = F.col("values_flat")
    if transfer_dtype == "float":
        v = v.cast("array<float>")
    t = F.col("times")
    if time_scale != 1.0:
        t = F.transform(t, lambda x: x * F.lit(float(time_scale)))
    slim = series.select("conv_id", v.alias("values_flat"), t.alias("times"))
    part_series = needed.join(slim, "conv_id").select(
        "p", "conv_id", "values_flat", "times"
    )
    cg = keyed.groupBy("part").cogroup(part_series.groupBy("p"))
    if use_arrow:
        return cg.applyInArrow(
            make_cogroup_score_arrow_fn(dim, nu, lamb, degree), SCORE_SCHEMA
        )
    return cg.applyInPandas(make_cogroup_score_fn(dim, nu, lamb, degree), SCORE_SCHEMA)


def twed_scalar_udf(dim: int, nu: float, lamb: float, degree: int = 2):
    """Scalar pandas UDF over flat series buffers — the correctness/debug
    path (SURVEY.md §2 row 1). Per-row packing (slow by design; use
    score_candidates for throughput)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _twed(
        va: pd.Series, ta: pd.Series, vb: pd.Series, tb: pd.Series
    ) -> pd.Series:
        from cutwed_spark.twed.core import twed as twed_scalar

        out = np.empty(len(va), dtype=np.float64)
        for k in range(len(va)):
            out[k] = twed_scalar(
                np.asarray(va.iloc[k], dtype=np.float64).reshape(-1, dim),
                np.asarray(ta.iloc[k], dtype=np.float64),
                np.asarray(vb.iloc[k], dtype=np.float64).reshape(-1, dim),
                np.asarray(tb.iloc[k], dtype=np.float64),
                nu,
                lamb,
                degree,
            )
        return pd.Series(out)

    return _twed
