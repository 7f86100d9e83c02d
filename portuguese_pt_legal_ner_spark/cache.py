"""Operator-internal persist lifecycle.

Several blocking/dedup operators persist a slim intermediate (gram
spine, signature table, posting lists) because their band self-joins
reference it from multiple plan branches and Spark does NOT reuse the
exchange across differently-aliased sides (measured: no ReusedExchange
on the banded self-join — each unpersisted branch recomputes the whole
signature aggregate). The operators return LAZY DataFrames, so they
cannot unpersist before the caller materializes the result — doing so
would silently void the single-evaluation guarantee.

Lifecycle contract (round-3 verdict item 3 — the persist-leak class):

  * operators accept ``persist_registry``: callers that materialize
    internally (minhash_dedup) pass their own list and unpersist as
    soon as the result is counted;
  * when no registry is passed, persists are recorded in the module
    tracker below; a long-lived driver (bench loop, query service)
    calls :func:`release_tracked` once the previous result is
    materialized — the entry-point wrappers in ``__spark_entry__``
    drain it at the start of each query, bounding cached blocks to one
    query's working set.

``localCheckpoint`` blocks are NOT tracked here: their lineage is
truncated, so unpersisting them before the consumer runs would lose
data, and Spark's ContextCleaner reclaims them when the driver-side
DataFrame is garbage-collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def register(persist_registry: list[DataFrame] | None, *dfs: DataFrame) -> None:
    """Record persisted intermediates for later release: in the
    caller's registry when one is given, else in the module tracker."""
    target = persist_registry if persist_registry is not None else _TRACKED
    target.extend(dfs)


def release_tracked() -> int:
    """Unpersist every module-tracked intermediate; returns how many.

    Safe to call at any time — unpersist only removes cache intent, a
    plan that still references the DataFrame recomputes instead of
    failing. DataFrames from an already-stopped SparkSession are
    skipped."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — dead session; nothing to free
            pass
    _TRACKED.clear()
    return n


def tracked_count() -> int:
    return len(_TRACKED)
