"""Property-based semantics checks for the session-81 operators.

Models: per-brand OLS and per-segment stats against exact centered-
integer models (dyadic prices so round() is ulp-unambiguous), and the
rerank band curve's nesting monotonicity on injected embeddings.
DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


def _ols(pts):
    n = len(pts)
    mx = sum(x for x, _ in pts) // n
    my = sum(y for _, y in pts) // n
    sxc = sum(x - mx for x, _ in pts)
    syc = sum(y - my for _, y in pts)
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    syy = sum((y - my) ** 2 for _, y in pts)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    cov = float(n) * sxy - float(sxc) * syc
    vx = float(n) * sxx - float(sxc) * sxc
    vy = float(n) * syy - float(syc) * syc
    slope = 0 if n < 2 or vx == 0.0 else _round_away(1_000_000 * (cov / vx))
    r2 = (
        0
        if n < 2 or vx == 0.0 or vy == 0.0
        else _round_away(1_000_000 * (cov * cov / (vx * vy)))
    )
    return slope, r2


@settings(max_examples=40, deadline=None)
@given(
    parts=st.lists(
        st.tuples(
            st.sampled_from(["B1", "B2"]),
            st.integers(min_value=1, max_value=50),
            _price,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_brand_trend_matches_model(parts):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(len(parts)),
                "p_brand": [b for b, _, _ in parts],
                "p_size": [s for _, s, _ in parts],
                "p_retailprice": [p for _, _, p in parts],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["brand_size_price_trend"].sql).fetchall()
    }
    model = {}
    for brand in {b for b, _, _ in parts}:
        pts = [
            (s, _round_away(p * 100) // 100)
            for b, s, p in parts
            if b == brand
        ]
        slope, r2 = _ols(pts)
        model[brand] = (len(pts), slope, r2)
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), _price),
        min_size=1,
        max_size=25,
    ),
    segs=st.lists(
        st.sampled_from(["AUTO", "MACH", "BLDG"]), min_size=6, max_size=6
    ),
)
def test_segment_stats_match_model(orders, segs):
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(6), "c_mktsegment": segs}),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["segment_value_stats"].sql).fetchall()
    }
    per: dict[str, list] = {}
    for c, p in orders:
        cents = _round_away(p * 100)
        per.setdefault(segs[c], []).append(cents)
    model = {}
    for seg, vals in per.items():
        n = len(vals)
        s = sum(vals)
        ys = [v // 100 for v in vals]
        my = sum(ys) // n
        syc = sum(y - my for y in ys)
        syy = sum((y - my) ** 2 for y in ys)
        mean = _round_away(1_000_000 * (float(s) / n))
        var = (
            0
            if n < 2
            else _round_away(
                1_000_000
                * ((float(n) * syy - float(syc) * syc) / (float(n) * n))
            )
        )
        model[seg] = (n, s, mean, var)
    assert got == model


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=25, max_value=35))
def test_rerank_curve_monotone(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["rerank_band_curve"].sql).fetchall()
    assert [r[0] for r in rows] == [10, 25, 50]
    rec = [r[1] for r in rows]
    assert all(0 <= x <= 10 for x in rec)
    # bands nest: recall never drops as R grows
    assert rec[0] <= rec[1] <= rec[2]
