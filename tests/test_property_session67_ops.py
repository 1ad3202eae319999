"""Property-based semantics checks for the session-67 operators.

Models: the sorted-list Pareto model lifted onto per-part revenue, a
decile×lang share model, and a day-lag bucket model over injected
order/lineitem pairs. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # partkey
            st.integers(min_value=1, max_value=9999),  # cents-ish price*100
            st.integers(min_value=0, max_value=10),  # discount %
        ),
        min_size=1,
        max_size=25,
    )
)
def test_part_pareto_matches_sorted_model(items):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": range(len(items)),
                "l_partkey": [p for p, *_ in items],
                "l_extendedprice": [c / 100.0 for _, c, _ in items],
                "l_discount": [d / 100.0 for *_, d in items],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["part_revenue_pareto"].sql).fetchall()}
    pr: dict[int, int] = {}
    for p, c, d in items:
        cents = _round_away(100 * (c / 100.0) * (1 - d / 100.0))
        pr[p] = pr.get(p, 0) + cents
    vals = sorted(pr.values(), reverse=True)
    n, rev = len(vals), sum(vals)
    for p_q6 in (100000, 10000):
        k = (p_q6 * n + 999999) // 1_000_000
        rev_top = sum(vals[:k])
        share = 0 if rev == 0 else _round_away(1_000_000.0 * rev_top / rev)
        assert got[p_q6] == (k, rev_top, share)


@settings(max_examples=40, deadline=None)
@given(
    langs=st.lists(st.sampled_from(["en", "zh", "de"]), min_size=1, max_size=20)
)
def test_lang_drift_matches_model(langs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(langs)), "text": ["w"] * len(langs), "lang": langs}
        ),
    )
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(REGISTRY["lang_drift_deciles"].sql).fetchall()
    }
    n = len(langs)
    cells: dict[tuple[int, str], int] = {}
    totals: dict[int, int] = {}
    for d, lg in enumerate(langs):
        dec = (d * 10) // n
        cells[(dec, lg)] = cells.get((dec, lg), 0) + 1
        totals[dec] = totals.get(dec, 0) + 1
    model = {
        k: (c, _round_away(1_000_000.0 * c / totals[k[0]])) for k, c in cells.items()
    }
    assert got == model
    # shares per decile sum to ~1e6 (within a rounding ulp per lang)
    for dec, tot in totals.items():
        s = sum(v[1] for k, v in got.items() if k[0] == dec)
        langs_in = sum(1 for k in got if k[0] == dec)
        assert abs(s - 1_000_000) <= langs_in


_D0 = datetime.date(1996, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # order day offset
            st.integers(min_value=-2, max_value=80),  # ship lag days
            st.sampled_from(["1-URGENT", "3-MEDIUM"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_ship_lag_matches_model(items):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(items)),
                "o_orderdate": [_D0 + datetime.timedelta(days=o) for o, *_ in items],
                "o_orderpriority": [p for *_, p in items],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": range(len(items)),
                "l_shipdate": [
                    _D0 + datetime.timedelta(days=o + s) for o, s, _ in items
                ],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["ship_lag_histogram"].sql).fetchall()
    }
    cells: dict[tuple[str, int], int] = {}
    for o, s, p in items:
        b = -1 if s <= 0 else s.bit_length() - 1
        cells[(p, b)] = cells.get((p, b), 0) + 1
    assert got == cells
