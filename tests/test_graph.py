"""Graph materialization tests: entity resolution (exact + LSH +
components), entities/edges tables, salted-vs-plain aggregation
equivalence, id stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portuguese_pt_legal_ner_spark.operators.graph import (
    edges_table,
    entities_table,
    entity_id_col,
    resolve_entities,
)
from portuguese_pt_legal_ner_spark.operators.mentions import (
    detect_mentions,
    mentions_with_context,
)
from portuguese_pt_legal_ner_spark.operators.triples import lift_triples
from portuguese_pt_legal_ner_spark.sources.tables import (
    alias_dict_df,
    synthetic_transcripts,
)


@pytest.fixture(scope="module")
def kg(spark):
    t = synthetic_transcripts(spark, n_conversations=60, seed=42, partitions=4)
    mentions = mentions_with_context(detect_mentions(t), t).persist()
    triples = lift_triples(mentions).persist()
    resolution = resolve_entities(mentions, alias_dict_df(spark)).persist()
    return {"mentions": mentions, "triples": triples, "resolution": resolution}


def test_resolution_covers_all_surfaces(spark, kg):
    surfaces = kg["mentions"].select("surface", "label").distinct()
    missing = surfaces.join(
        kg["resolution"].select("surface", "label"), ["surface", "label"], "left_anti"
    )
    assert missing.count() == 0


def test_alias_family_collapses_to_one_entity(spark, kg):
    res = {
        (r["surface"], r["label"]): (r["canonical"], r["entity_id"])
        for r in kg["resolution"].collect()
    }
    tj = res.get(("Tribunal de Justiça", "ORG"))
    tj_lx = res.get(("TJ Lisboa", "ORG"))
    tj_full = res.get(("Tribunal de Justiça de Lisboa", "ORG"))
    present = [x for x in (tj, tj_lx, tj_full) if x is not None]
    assert len(present) >= 2
    assert len({eid for _, eid in present}) == 1, present


def test_unlinked_surface_becomes_own_entity(spark):
    m = spark.createDataFrame(
        [("c", 0, 0, 0, 5, "PER", "Zz Unknown Person", 0.9)],
        "conv_id string, turn_idx int, para_idx int, start int, end int,"
        " label string, surface string, score double",
    )
    res = resolve_entities(m, alias_dict_df(spark)).collect()
    assert len(res) == 1
    assert res[0]["canonical"] == "zz unknown person"


def test_entities_table_shape(spark, kg):
    ents = entities_table(kg["resolution"])
    rows = ents.collect()
    assert all(r["entity_id"] and r["canonical"] and r["label"] for r in rows)
    # aliases contain at least the surfaces that resolved to the entity
    by_id = {r["entity_id"]: r for r in rows}
    for r in kg["resolution"].collect():
        assert r["surface"] in by_id[r["entity_id"]]["aliases"]
    # entity_id unique per (canonical, label)
    assert ents.count() == ents.select("entity_id").distinct().count()


def test_entity_id_deterministic(spark):
    df = spark.range(1).select(
        entity_id_col(F.lit("PER"), F.lit("João Silva")).alias("a"),
        entity_id_col(F.lit("PER"), F.lit("João Silva")).alias("b"),
        entity_id_col(F.lit("ORG"), F.lit("João Silva")).alias("c"),
    )
    r = df.collect()[0]
    assert r["a"] == r["b"]
    assert r["a"] != r["c"]


def test_edges_plain_equals_salted(spark, kg):
    plain = edges_table(kg["triples"], kg["resolution"], salt_buckets=0)
    salted = edges_table(kg["triples"], kg["resolution"], salt_buckets=16)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    assert a, "no edges produced"


def test_edges_shuffle_join_fallback_equals_broadcast(spark, kg):
    """The size-guarded broadcast (BROADCAST_SURFACE_LIMIT) must be a
    pure strategy choice: forcing the shuffle-join path yields the
    identical edge set."""
    bcast = edges_table(kg["triples"], kg["resolution"], broadcast_resolution=True)
    shuffled = edges_table(kg["triples"], kg["resolution"], broadcast_resolution=False)
    assert sorted(map(tuple, bcast.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_edge_weights_match_triple_counts(spark, kg):
    edges = edges_table(kg["triples"], kg["resolution"])
    total_weight = edges.agg(F.sum("weight")).collect()[0][0]
    # every triple whose subj and obj both resolve contributes weight 1
    assert total_weight == kg["triples"].count()
