"""Linking tests: normalization parity, exact tier, LSH recall on
planted near-duplicates, tier precedence, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portuguese_pt_legal_ner_spark.operators.linking import (
    char_shingles,
    link_surfaces,
    normalize_surface_col,
)
from portuguese_pt_legal_ner_spark.oracle_kg import link_surfaces as oracle_link
from portuguese_pt_legal_ner_spark.sources.tables import alias_dict_df
from portuguese_pt_legal_ner_spark.synth import generate_alias_dict, normalize_surface


@pytest.fixture()
def mentions_df(spark):
    rows = [
        ("João Silva", "PER"),
        ("  joão   silva ", "PER"),      # whitespace/case → exact tier
        ("Joao Silva", "PER"),           # missing diacritic → LSH tier
        ("Tribunal de Justiça", "ORG"),
        ("TJ Lisboa", "ORG"),
        ("Tribunal de Justica", "ORG"),  # missing cedilla → LSH tier
        ("Lisboa", "LOC"),
        ("Completely Unknown Zzz", "PER"),  # no match at all
    ]
    return spark.createDataFrame(rows, "surface string, label string")


def test_normalization_matches_python_oracle(spark):
    surfaces = ["  João   SILVA ", "TJ  Lisboa", " united\tstates\nof brazil"]
    df = spark.createDataFrame([(s,) for s in surfaces], "s string").select(
        normalize_surface_col(F.col("s")).alias("n")
    )
    got = [r["n"] for r in df.collect()]
    want = [normalize_surface(s) for s in surfaces]
    assert got == want


def test_char_shingles_short_strings(spark):
    df = spark.createDataFrame([("ab",), ("abcd",)], "s string").select(
        char_shingles(F.col("s")).alias("sh")
    )
    got = [sorted(r["sh"]) for r in df.collect()]
    assert got[0] == ["ab"]            # len < 3 → whole string
    assert got[1] == ["abc", "bcd"]


def test_exact_tier_links_normalized_variants(spark, mentions_df):
    links = link_surfaces(mentions_df, alias_dict_df(spark))
    by_surface = {(r["surface"], r["label"]): r for r in links.collect()}
    assert by_surface[("João Silva", "PER")]["canonical"] == "João Silva"
    assert by_surface[("João Silva", "PER")]["tier"] == "exact"
    assert by_surface[("  joão   silva ", "PER")]["canonical"] == "João Silva"
    assert (
        by_surface[("TJ Lisboa", "ORG")]["canonical"]
        == "Tribunal de Justiça de Lisboa"
    )


def test_lsh_tier_catches_near_duplicates(spark, mentions_df):
    links = link_surfaces(mentions_df, alias_dict_df(spark))
    by_surface = {(r["surface"], r["label"]): r for r in links.collect()}
    joao = by_surface[("Joao Silva", "PER")]
    assert joao["canonical"] == "João Silva"
    assert joao["tier"] in ("exact", "lsh")
    trib = by_surface[("Tribunal de Justica", "ORG")]
    assert trib["canonical"] in (
        "Tribunal de Justiça de Lisboa",  # via 'tribunal de justiça' alias
        "Tribunal de Justiça",
    )
    assert trib["tier"] == "lsh"


def test_unknown_surface_not_linked(spark, mentions_df):
    links = link_surfaces(mentions_df, alias_dict_df(spark))
    surfaces = {r["surface"] for r in links.collect()}
    assert "Completely Unknown Zzz" not in surfaces


def test_exact_tier_agrees_with_serial_oracle(spark, mentions_df):
    links = link_surfaces(mentions_df, alias_dict_df(spark))
    exact = {
        (r["surface"], r["label"]): r["canonical"]
        for r in links.collect()
        if r["tier"] == "exact"
    }
    pairs = [(r["surface"], r["label"]) for r in mentions_df.collect()]
    want = oracle_link(pairs, generate_alias_dict())
    assert exact == want


def test_linking_deterministic(spark, mentions_df):
    d = alias_dict_df(spark)
    a = sorted(map(tuple, link_surfaces(mentions_df, d).collect()))
    b = sorted(map(tuple, link_surfaces(mentions_df, d).collect()))
    assert a == b
