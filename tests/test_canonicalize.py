"""Connected-components tests vs the union-find oracle: chain, star,
two components, random graphs (seeded), and convergence behavior."""

from __future__ import annotations

import random

import pytest

from portuguese_pt_legal_ner_spark.operators.canonicalize import connected_components
from portuguese_pt_legal_ner_spark.oracle_kg import (
    connected_components as oracle_cc,
)


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_chain(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _spark_cc(spark, edges)
    assert got == {n: "a" for n in "abcde"}


def test_star(spark):
    edges = [("m", x) for x in ["a", "b", "c", "d"]]
    got = _spark_cc(spark, edges)
    assert got == {n: "a" for n in "abcdm"}


def test_two_components(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    got = _spark_cc(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_self_loop_and_duplicates(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")]
    got = _spark_cc(spark, edges)
    assert got == {"a": "a", "b": "a"}


@pytest.mark.parametrize("seed", [1, 7, 99])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    want = oracle_cc(edges)
    got = _spark_cc(spark, edges)
    assert got == want


def test_long_chain_converges(spark):
    # diameter 40 — exercises the O(log n) star rounds, not 40 rounds
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(40)]
    got = _spark_cc(spark, edges)
    assert set(got.values()) == {"n00"}
    assert len(got) == 41


@pytest.mark.parametrize("seed", [3, 42])
def test_union_find_fast_path_matches_distributed(spark, seed):
    """The bounded driver union-find (the small-pair-set fast path the
    dedup clusterers gate into) must agree with distributed CC and the
    serial oracle on the same graphs."""
    from portuguese_pt_legal_ner_spark.operators.canonicalize import (
        union_find_components,
    )

    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(50)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {
        r["node"]: r["component"] for r in union_find_components(df).collect()
    }
    assert fast == oracle_cc(edges)
    assert fast == _spark_cc(spark, edges)


def test_distributed_cc_reliable_checkpoint(spark, tmp_path):
    """connected_components with checkpoint_dir (the executor-loss-safe
    cluster mode) writes reliable checkpoints and returns the same
    components."""
    import os

    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, checkpoint_dir=str(tmp_path / "cc_ckpt")
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    assert os.listdir(tmp_path / "cc_ckpt")
