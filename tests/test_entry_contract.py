"""Driver-contract tests: every oracle-backed queries() entry must match
its DuckDB oracle_sql() at sf0.01 — row count, column names, and
order-insensitive values — mirroring the driver's CORRECTNESS check."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(value):
    if value is None:
        return ""
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    return str(value)


def _rows_to_set(columns, rows):
    # sort columns by name (driver semantics), normalize values
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(_normalize(row[i]) for i in order) for row in rows
    )


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows, f"{name}: empty result — a trivially-matching query proves nothing"
    a = _rows_to_set(spark_cols, spark_rows)
    b = _rows_to_set(duck_cols, duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"subj", "pred", "obj", "conv_id", "turn_idx"} <= set(df.columns)


DRIVER_WINDOW = 50


def test_oracled_queries_inside_driver_window():
    """The correctness driver hard-checks only the first 50 queries()
    entries. Round 5 appended new queries and silently evicted two
    driver-green oracled queries past the window; this guard makes the
    registry invariant explicit: every oracle_sql() key must sit inside
    the window, and oracled entries must precede every rows-only entry
    so future growth fails loudly here instead of silently there."""
    order = list(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    assert oracled <= set(order), sorted(oracled - set(order))
    outside = [k for k in order[DRIVER_WINDOW:] if k in oracled]
    assert not outside, f"oracled queries past the driver window: {outside}"
    first_rows_only = next(i for i, k in enumerate(order) if k not in oracled)
    stragglers = [k for k in order[first_rows_only:] if k in oracled]
    assert not stragglers, f"oracled entries after rows-only ones: {stragglers}"


def test_rows_only_queries_run(spark):
    rows_only = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))
    for name in rows_only:
        df = entrymod.queries()[name](spark, SF_DIR)
        assert df.count() > 0, name


def test_bench_headline_names_resolve():
    """Registry-drift guard for bench.py (same failure class as the
    round-5 correctness-window eviction): every headline query name
    must exist in queries(), so a rename or removal fails here instead
    of crashing the driver's per-round bench run."""
    import ast
    from pathlib import Path

    src = Path(__file__).resolve().parent.parent / "bench.py"
    tree = ast.parse(src.read_text())
    names = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "headline" for t in node.targets
        ):
            names = [ast.literal_eval(e) for e in node.value.elts]
    assert names, "bench.py headline list not found"
    missing = [n for n in names if n not in entrymod.queries()]
    assert not missing, f"bench names missing from registry: {missing}"
