"""Canonicalization: connected components over co-reference edges.

GraphFrames is not assumed (no extra jars in the sandbox, and the
north_star explicitly allows "iterative DataFrame joins" instead).
This is the alternating large-star / small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14), expressed as DataFrame joins:

  large-star: for each edge (u, v), attach every neighbor that is
              LARGER than u to u's current minimum neighbor;
  small-star: attach all smaller-or-equal neighbors to the minimum.

Each iteration is two self-joins + aggregations; the driver loop
persists each round's edge set to cut lineage — Catalyst cannot
optimize across iterations (SURVEY §4) — and stops when the edge set
reaches a fixpoint (the convergence aggregate is a count+checksum of
edges, the reference's early-stopping analog, src/training.py:268-272),
costing exactly one Spark job per iteration.

Converges in O(log n) rounds; our co-reference graphs are star-like
(surfaces around canonicals) so 2-4 rounds in practice. Node ids are
strings; ordering is lexicographic, deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected edge list (u, v), deduped, self-loops dropped."""
    e = edges.toDF("u", "v").filter(F.col("u") != F.col("v"))
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates(["u", "v"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star (Kiveris alg. 2): over the SYMMETRIC edge set,
    m(u) = min(Γ(u) ∪ {u}); emit (v, m(u)) for every neighbor v > u."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
    )
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    # no dropDuplicates here: duplicates cannot change small-star's
    # min-aggregates and ITS trailing dedup feeds the convergence
    # checksum — skipping the dedup removes one exchange per iteration
    return out.filter(F.col("u") != F.col("v"))


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star (Kiveris alg. 3): orient each edge toward the larger
    endpoint, m(u) = min(Γ(u) ∪ {u}) over the smaller neighbors; emit
    (v, m(u)) for every smaller neighbor plus (u, m(u))."""
    oriented = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))  # m ≤ all v ≤ u
    nbrs = (
        oriented.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfs = m.select("u", F.col("m").alias("v"))
    return (
        nbrs.unionByName(selfs)
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node
    id (lexicographic) in the component — matching the serial
    union-find oracle (oracle_kg.connected_components)."""
    e = _symmetrize(edges.select(
        F.col(edges.columns[0]).cast("string"),
        F.col(edges.columns[1]).cast("string"),
    )).localCheckpoint(eager=False)

    # One Spark job per iteration (round-1 ran two per round —
    # eager checkpoint, then the convergence collect — pure scheduler
    # overhead on the small post-threshold graphs): a LAZY
    # localCheckpoint truncates the LOGICAL plan immediately (the
    # self-joins otherwise nest the tree exponentially across
    # iterations — plain persist() OOMs on plan stringification by
    # ~iteration 8) while deferring materialization, so the
    # convergence aggregate's collect is the only action per round.
    # Convergence: edge-set signature (count + checksum) fixpoint.
    # bit_xor: order-independent and overflow-free (ANSI mode rejects
    # a bigint sum of hashes); edges are deduped so xor cancellation
    # of duplicates cannot occur.
    prev_sig = None
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig

    # after convergence every node points at its component minimum
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    comp = comp.groupBy("node").agg(F.min("component").alias("component"))
    # the minima themselves are their own component
    roots = comp.select(F.col("component").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return (
        comp.unionByName(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
