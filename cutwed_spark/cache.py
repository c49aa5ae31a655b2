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
from contextvars import ContextVar

from pyspark.sql import DataFrame

# Scope stacks are per-context (contextvars), so concurrent entry
# invocations on a threaded driver cannot pop each other's frames or
# release another context's deferred caches. The cost of the isolation:
# a thread that opens a deferred scope and never opens another (or calls
# release_deferred) holds its last scope's caches until LRU eviction —
# acceptable, since cross-thread release was never sound anyway.
_SCOPES_VAR: ContextVar[list[list[DataFrame]]] = ContextVar("cutwed_scopes")
_DEFERRED_VAR: ContextVar[list[DataFrame]] = ContextVar("cutwed_deferred")


def _scopes() -> list[list[DataFrame]]:
    try:
        return _SCOPES_VAR.get()
    except LookupError:
        stack: list[list[DataFrame]] = []
        _SCOPES_VAR.set(stack)
        return stack


def _deferred() -> list[DataFrame]:
    try:
        return _DEFERRED_VAR.get()
    except LookupError:
        pending: list[DataFrame] = []
        _DEFERRED_VAR.set(pending)
        return pending


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() that registers with the innermost active cache_scope
    (no-op registration when no scope is active)."""
    df = df.persist()
    scopes = _scopes()
    if scopes:
        scopes[-1].append(df)
    return df


def release_deferred() -> int:
    """Unpersist the caches captured by the most recent
    :func:`deferred_cache_scope` in THIS thread/context; returns how
    many were released."""
    pending = _deferred()
    n = len(pending)
    for df in pending:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped; nothing to release
    pending.clear()
    return n


@contextmanager
def deferred_cache_scope():
    """A cache_scope whose release is deferred to the NEXT
    deferred_cache_scope entry (or an explicit
    :func:`release_deferred`).

    Driver-contract entries return LAZY DataFrames that the harness
    materializes only after the callable returns, so an in-call
    cache_scope would unpersist before execution and forfeit the
    multi-consumer reuse the persist exists for. Deferring release to
    the next entry keeps at most ONE entry's operator-internal caches
    alive at a time: a full queries() sweep (or repeated sweeps on a
    long-lived driver) no longer accumulates persists for the session
    lifetime. Scopes are per-thread/context (see module note); a
    threaded driver gets one independent release chain per thread."""
    release_deferred()
    frame: list[DataFrame] = []
    scopes = _scopes()
    scopes.append(frame)
    try:
        yield
    finally:
        scopes.pop()
        _deferred().extend(frame)


@contextmanager
def cache_scope():
    """Unpersist every scoped_persist taken inside the block on exit.

    Materialize (collect/write) anything that needs the caches BEFORE
    the scope closes — after exit the plans recompute from source.
    Scopes nest; each releases only its own persists.
    """
    frame: list[DataFrame] = []
    scopes = _scopes()
    scopes.append(frame)
    try:
        yield
    finally:
        scopes.pop()
        for df in frame:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped; nothing to release
