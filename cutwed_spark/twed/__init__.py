"""Public TWED kernel API — parity surface with the reference package.

The reference exports exactly ``twed, twed_dev, twed_batch,
twed_batch_dev, ctwed`` (/root/reference/cuTWED/__init__.py:1-8). This
package exposes the same names:

* :func:`twed` / :func:`twed_batch` — same signatures and defaults as
  the reference's host-array API (``cuTWED/cuTWED.py:37-88,211-271``),
  including 1-D auto-reshape, dtype honoring, ``degree`` conventions and
  ``tri`` options.
* ``twed_dev`` / ``twed_batch_dev`` — aliases of the host-array
  functions. The reference's ``*_dev`` twins exist only to skip a
  host->device memcpy for already-device-resident arrays
  (``cuTWED/cuTWED.py:91-142,145-208``); NumPy has no such split, so
  the collapse is semantic parity (SURVEY.md §2 rows 2, 18, 20).
* :func:`ctwed` — the Marteau O(n^2) reference oracle
  (``reference_implementation/twed.c:74-210``), float64 only, with the
  negative-degree "no nth-root" reproduction mode.
* :func:`twed_pairs` — the engine-native batched pair scorer the Arrow
  UDFs wrap (generalizes ``twed_batch`` to variable-length series).
"""

from cutwed_spark.twed.core import (
    local_costs,
    pytwed_oracle,
    twed,
    twed_batch,
    twed_pairs,
    twed_reference,
)

# Reference-API aliases (see module docstring).
twed_dev = twed
twed_batch_dev = twed_batch
ctwed = twed_reference

__all__ = [
    "twed",
    "twed_dev",
    "twed_batch",
    "twed_batch_dev",
    "ctwed",
    "twed_pairs",
    "twed_reference",
    "pytwed_oracle",
    "local_costs",
]
