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


def sql_over(query: str, **dfs: DataFrame) -> DataFrame:
    """``spark.sql`` over temp-view references instead of DataFrame
    parameter binding.

    Parameter-bound DataFrames (``spark.sql("... {df}", df=df)``) are
    re-wrapped at every analysis, so a PERSISTED df referenced that way
    never matches its CacheManager entry — every plan branch silently
    recomputes the "cached" subtree from source (measured at sf1.0:
    the minhash band self-join re-ran the shingle explode + signature
    aggregate on each side despite sig.persist(); the plan showed raw
    `Scan parquet → Generate → HashAggregate` instead of
    InMemoryTableScan). A temp view resolves to the df's own analyzed
    plan, which the cache matches exactly.

    Views are NEVER dropped: ``catalog.dropTempView`` UNCACHES the
    plan bound to the view — for a persisted input that silently
    destroys the very cache entry this helper exists to preserve
    (measured: everything downstream of the drop recomputed from
    source). Instead each (thread, key) pair reuses one stable view
    name via createOrReplaceTempView (replacement does NOT uncache the
    previous binding — verified), so the catalog holds at most
    #keys × #threads entries and concurrent driver threads never race
    on a name. spark.sql analyzes eagerly, so the returned DataFrame
    keeps its resolved plan even after the name is later rebound.
    `query` uses ``{key}`` placeholders matching the kwargs, exactly
    like parameterized sql.
    """
    import threading  # noqa: PLC0415

    spark = next(iter(dfs.values())).sparkSession
    names: dict[str, str] = {}
    for key, df in dfs.items():
        name = f"_sg_view_{key}_{threading.get_ident()}"
        df.createOrReplaceTempView(name)
        names[key] = name
    return spark.sql(query.format(**names))
