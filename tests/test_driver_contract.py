"""Local replica of the driver's correctness gate: every REGISTRY entry's
Spark DataFrame must match its DuckDB oracle SQL at sf=0.01 —
same columns, same row multiset (order-insensitive), values compared
exactly (all outputs are ints/strings by design; floats are emitted as
*_q6 micro-unit BIGINTs — see docix_spark.driver_queries docstring).
"""

from __future__ import annotations

import duckdb
import pytest

from docix_spark.driver_queries import REGISTRY

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_registry_bindings_name_their_functions():
    """Guard against the decorator-binding trap: a def/class inserted
    between ``@register(...)`` and the query function silently binds the
    registry entry to the wrong object (hit once in round 4 — the entry
    for dedup_connected_components briefly pointed at an exception class).
    Every entry's bound function must carry the registered name."""
    bad = {n: REGISTRY[n].fn.__name__ for n in REGISTRY if REGISTRY[n].fn.__name__ != n}
    assert not bad, f"registry entries bound to mis-named functions: {bad}"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_driver_query_matches_oracle(spark, duck, name):
    dq = REGISTRY[name]
    got = dq.fn(spark, SF_DIR).toPandas()
    if dq.sql is None:
        assert got is not None  # rows-only check
        return
    want = duck.execute(dq.sql).fetch_df()
    assert sorted(got.columns) == sorted(want.columns), f"{name}: schema"
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    a, b = canon(got), canon(want)
    mism = (a != b).any(axis=1)
    assert not mism.any(), f"{name}: first mismatched rows\n{a[mism].head()}\nvs\n{b[mism].head()}"


def test_front_rotation_names_are_real_and_unique():
    """A typo'd _FRONT entry is silently DROPPED by the reordering dict
    comprehension (the registry keeps working, but the driver-sampling
    rotation quietly loses the slot) — guard the list the same way the
    binding test guards the decorator."""
    from docix_spark.driver_queries import _FRONT

    missing = [n for n in _FRONT if n not in REGISTRY]
    assert not missing, f"_FRONT names not in REGISTRY: {missing}"
    dupes = sorted({n for n in _FRONT if _FRONT.count(n) > 1})
    assert not dupes, f"_FRONT duplicate names: {dupes}"


def test_every_registry_entry_has_an_oracle():
    """320/320 entries carry DuckDB oracle SQL — the strong (hash) check;
    a rows-only entry would silently downgrade to the weak check."""
    no_sql = [n for n, dq in REGISTRY.items() if dq.sql is None]
    assert not no_sql, f"entries without oracle SQL: {no_sql}"
