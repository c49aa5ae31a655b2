"""cutwed_spark — a PySpark-native entity-resolution engine for
multi-turn conversation transcripts, scored with Time Warp Edit
Distance (TWED).

Layout (SURVEY.md §7):

* :mod:`cutwed_spark.twed` — the NumPy TWED kernels (reference-parity
  API: ``twed``, ``twed_batch``, ``ctwed``, + engine-native
  ``twed_pairs``).
* :mod:`cutwed_spark.operators` — Spark operators: series assembly,
  featurization, MinHash/LSH blocking, Arrow-batched scoring,
  connected-components clustering, plus training-data ops
  (dedup, similarity search, text stats, multimodal plumbing).
* :mod:`cutwed_spark.plans` — the end-to-end pipeline driver
  (:func:`cutwed_spark.plans.pipeline.run_pipeline`).
* :mod:`cutwed_spark.streaming` — incremental/streaming ER over the
  signature-carrying state table.
* :mod:`cutwed_spark.sources` — deterministic synthetic corpus.
* :mod:`cutwed_spark.session` — tuned SparkSession factory.

Heavy imports stay lazy: importing ``cutwed_spark`` does not pull in
pyspark (worker-side kernel code must import fast).
"""

__version__ = "0.1.0"
