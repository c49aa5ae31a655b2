"""Batched TWED scoring of candidate pairs — the throughput path.

``mapInArrow`` over candidate-pair record batches: the JVM->Python Arrow
transfer is the engine's analog of the reference's host->device memcpy
(/root/reference/src/cuTWED_core.h:394-404), and the Arrow batch is the
analog of its (nAA, nA, dim) device batch
(/root/reference/cuTWED/cuTWED.py:157-178). Inside the UDF everything is
vectorized NumPy — the packing from Arrow list buffers to padded
(P, n_max, dim) ndarrays uses offset arithmetic, NOT per-row Python
(the input_hint's "no per-row Python" requirement).

Scale design:
* pairs are repartitioned on a salted key so one hot conversation cannot
  pin a single task (SURVEY.md §4 manual-engineering item a);
* within partitions rows are sorted by series length so each Arrow batch
  is length-homogeneous -> minimal padding waste (the analog of the
  reference's equal-length batch requirement, cuTWED/cuTWED.py:167-175,
  recovered as an optimization instead of a constraint);
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (tuning knob #4 in SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cutwed_spark.twed.core import twed_pairs

SCORE_SCHEMA = (
    "conv_id_a string, conv_id_b string, n_a int, n_b int, "
    "twed double, twed_norm double"
)


def _pad_from_arrow(values: pa.Array, times: pa.Array, dim: int):
    """list<list<double>> + list<double> Arrow columns -> padded NumPy.

    Pure offset arithmetic: flatten twice, reshape by the fixed dim,
    scatter into the padded block with vectorized row/col indices.
    Returns (V (P, n_max, dim), T (P, n_max), L (P,)).
    """
    lens = pc.list_value_length(values).to_numpy().astype(np.int64)
    P = len(lens)
    total = int(lens.sum())
    n_max = int(lens.max()) if P else 0
    flat_turns = np.asarray(values.flatten().flatten(), dtype=np.float64).reshape(
        total, dim
    )
    flat_t = np.asarray(times.flatten(), dtype=np.float64)
    if len(flat_t) != total:
        raise ValueError("times/values length mismatch inside Arrow batch")
    V = np.zeros((P, n_max, dim), dtype=np.float64)
    T = np.zeros((P, n_max), dtype=np.float64)
    starts = np.zeros(P, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    rows = np.repeat(np.arange(P, dtype=np.int64), lens)
    cols = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    V[rows, cols] = flat_turns
    T[rows, cols] = flat_t
    return V, T, lens


def _score_batch(batch: pa.RecordBatch, dim: int, nu: float, lamb: float, degree: int):
    cols = {name: batch.column(name) for name in batch.schema.names}
    Va, Ta, La = _pad_from_arrow(cols["va"], cols["ta"], dim)
    Vb, Tb, Lb = _pad_from_arrow(cols["vb"], cols["tb"], dim)
    idx = np.arange(batch.num_rows, dtype=np.int64)
    d = twed_pairs(Va, Ta, La, idx, Vb, Tb, Lb, idx, nu, lamb, degree)
    denom = np.maximum(La + Lb, 1).astype(np.float64)
    return pa.RecordBatch.from_arrays(
        [
            cols["conv_id_a"],
            cols["conv_id_b"],
            pa.array(La.astype(np.int32)),
            pa.array(Lb.astype(np.int32)),
            pa.array(d),
            pa.array(d / denom),
        ],
        names=["conv_id_a", "conv_id_b", "n_a", "n_b", "twed", "twed_norm"],
    )


def make_score_fn(dim: int, nu: float, lamb: float, degree: int):
    """Arrow batch iterator function for mapInArrow (picklable closure)."""

    def score(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            if batch.num_rows == 0:
                continue
            yield _score_batch(batch, dim, nu, lamb, degree)

    return score


def attach_series(pairs: DataFrame, series: DataFrame) -> DataFrame:
    """pairs (conv_id_a, conv_id_b) x series -> pair rows carrying both
    padded-ready series. Two shuffle joins on conv_id; Catalyst prunes
    the series table to (conv_id, values, times) before the shuffle."""
    a = series.select(
        F.col("conv_id").alias("conv_id_a"),
        F.col("values").alias("va"),
        F.col("times").alias("ta"),
    )
    b = series.select(
        F.col("conv_id").alias("conv_id_b"),
        F.col("values").alias("vb"),
        F.col("times").alias("tb"),
    )
    return pairs.join(a, "conv_id_a").join(b, "conv_id_b")


def score_candidates(
    pairs: DataFrame,
    series: DataFrame,
    dim: int,
    nu: float = 1.0,
    lamb: float = 1.0,
    degree: int = 2,
    num_partitions: int | None = None,
    salt: int = 64,
    time_scale: float = 1.0,
) -> DataFrame:
    """Candidate pairs -> scored edges (conv_id_a, conv_id_b, n_a, n_b,
    twed, twed_norm).

    ``twed_norm = twed / (n_a + n_b)`` is the length-normalized score the
    thresholding stage uses (raw TWED grows with series length).
    ``salt`` spreads pairs of a hot conversation across tasks.
    """
    if time_scale != 1.0:
        series = series.withColumn(
            "times", F.transform("times", lambda x: x * F.lit(float(time_scale)))
        )
    joined = attach_series(pairs, series)
    spark = joined.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # Salted repartition + length-sorted partitions -> homogeneous batches.
    salted = joined.repartition(
        n_part,
        F.pmod(F.xxhash64("conv_id_a", "conv_id_b"), F.lit(salt)),
    ).sortWithinPartitions(F.greatest(F.size("va"), F.size("vb")))
    return salted.mapInArrow(make_score_fn(dim, nu, lamb, degree), SCORE_SCHEMA)


def twed_scalar_udf(dim: int, nu: float, lamb: float, degree: int = 2):
    """Scalar pandas UDF — the correctness/debug path (SURVEY.md §2 row 1).

    Same kernel, but fed from pandas list columns; packing is per-row
    (slow path by design; use score_candidates for throughput).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _twed(
        va: pd.Series, ta: pd.Series, vb: pd.Series, tb: pd.Series
    ) -> pd.Series:
        out = np.empty(len(va), dtype=np.float64)
        from cutwed_spark.twed.core import twed as twed_scalar

        for k in range(len(va)):
            out[k] = twed_scalar(
                np.asarray(list(va.iloc[k]), dtype=np.float64).reshape(-1, dim),
                np.asarray(ta.iloc[k], dtype=np.float64),
                np.asarray(list(vb.iloc[k]), dtype=np.float64).reshape(-1, dim),
                np.asarray(tb.iloc[k], dtype=np.float64),
                nu,
                lamb,
                degree,
            )
        return pd.Series(out)

    return _twed
