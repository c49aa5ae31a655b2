"""Scoped persist lifecycle for operator-internal caches.

Several operators persist an intermediate subtree that feeds multiple
consumers inside one logical call (the shingle table in the dedup
operators, the block-size table in blocking, the funnel stages in
curation) — the Spark analog of the reference's device-resident reuse
(``twed_malloc_dev``/``twed_free_dev``,
/root/reference/src/cuTWED.h:59-76). Without a release path those
caches live for the session and accumulate across calls on a long-lived
100 TB driver.

``cache_scope()`` gives callers deterministic release: any persist an
operator takes via :func:`scoped_persist` while a scope is active is
unpersisted when the scope exits. Outside any scope the behavior is
unchanged (session-lifetime cache, LRU-evicted) so existing callers and
the driver-contract entries keep their semantics.

    with cache_scope():
        survivors, funnel = curate_documents(docs)
        funnel.collect()          # materialize while caches are alive
    # all operator-internal caches released here
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_SCOPES: list[list[DataFrame]] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() that registers with the innermost active cache_scope
    (no-op registration when no scope is active)."""
    df = df.persist()
    if _SCOPES:
        _SCOPES[-1].append(df)
    return df


@contextmanager
def cache_scope():
    """Unpersist every scoped_persist taken inside the block on exit.

    Materialize (collect/write) anything that needs the caches BEFORE
    the scope closes — after exit the plans recompute from source.
    Scopes nest; each releases only its own persists.
    """
    frame: list[DataFrame] = []
    _SCOPES.append(frame)
    try:
        yield
    finally:
        _SCOPES.pop()
        for df in frame:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped; nothing to release
