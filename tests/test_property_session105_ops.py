"""Property-based semantics checks for the session-105 operators.

Models: monthly HHI against per-cell share² q6-first sums, seasonality
strength against a literal weekday-mean + quantized-residual model,
sentence dup rate against direct normalised-key counting. DuckDB-only.
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


_MT0 = datetime.datetime(1995, 1, 15)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=120),
            _price,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_monthly_hhi_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _, _ in orders],
                "o_orderdate": [
                    _MT0 + datetime.timedelta(days=d) for _, d, _ in orders
                ],
                "o_totalprice": [p for _, _, p in orders],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["monthly_revenue_hhi"].sql).fetchall()
    }
    cells: dict[tuple[int, int], int] = {}
    for c, d, p in orders:
        dt = _MT0 + datetime.timedelta(days=d)
        mkey = dt.year * 12 + dt.month - 1
        cells[(mkey, c)] = cells.get((mkey, c), 0) + _round_away(p * 100)
    model = {}
    for mkey in {m for m, _ in cells}:
        vals = [v for (m, _), v in cells.items() if m == mkey]
        tot = sum(vals)
        if tot <= 0:
            continue
        hhi = sum(
            _round_away(1_000_000.0 * v * v / (float(tot) * tot)) for v in vals
        )
        model[mkey] = (len(vals), hhi)
    assert got == model


_DT0 = datetime.datetime(2024, 3, 4)  # a Monday


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=20), min_size=2, max_size=40
    )
)
def test_seasonality_strength_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(days)),
                "ts": [_DT0 + datetime.timedelta(days=d) for d in days],
            }
        ),
    )
    n_days, var_s, var_r, strength = con.execute(
        REGISTRY["seasonality_strength"].sql
    ).fetchall()[0]
    day0 = (_DT0 - datetime.datetime(1970, 1, 1)).days
    lo, hi = min(days), max(days)
    series = [
        (day0 + d, days.count(d)) for d in range(lo, hi + 1)
    ]
    from collections import defaultdict

    dowsum = defaultdict(lambda: [0, 0])
    for dn, n in series:
        dw = (dn + 3) % 7
        dowsum[dw][0] += n
        dowsum[dw][1] += 1
    mean_q6 = {
        dw: _round_away(1_000_000.0 * s / c) for dw, (s, c) in dowsum.items()
    }
    rs = [
        (n, _round_away((1_000_000 * n - mean_q6[(dn + 3) % 7]) / 1_000_000.0))
        for dn, n in series
    ]
    n = len(rs)
    assert n_days == n

    def cvar(vals):
        s = sum(vals)
        m = -((-s) // n) if s < 0 else s // n  # trunc-toward-zero, both engines
        syc = sum(v - m for v in vals)
        syy = sum((v - m) ** 2 for v in vals)
        if n < 2:
            return 0, 0.0
        v = (float(n) * syy - float(syc) * syc) / (float(n) * n)
        return _round_away(1_000_000 * v), v

    vs_q6, vs = cvar([x for x, _ in rs])
    vr_q6, vr = cvar([r for _, r in rs])
    assert (var_s, var_r) == (vs_q6, vr_q6)
    if n < 2 or vs == 0.0:
        assert strength == 0
    else:
        assert strength == _round_away(1_000_000 * (1.0 - vr / vs))


@st.composite
def _sent_doc(draw):
    sents = draw(
        st.lists(
            st.sampled_from(
                ["aa bb", "cc dd ee", "shared footer line", "zz", ""]
            ),
            min_size=0,
            max_size=4,
        )
    )
    return ". ".join(sents) + ("." if sents else "")


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_sent_doc(), min_size=1, max_size=10))
def test_sentence_dup_rate_matches_model(docs):
    import re

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n_s, n_d, n_dup, rate = con.execute(
        REGISTRY["sentence_dup_rate"].sql
    ).fetchall()[0]
    inst = []
    for d, t in enumerate(docs):
        for seg in re.split(r"[.!?]+", t):
            toks = re.findall(r"[a-z0-9]+", seg.lower())
            if toks:
                inst.append((d, " ".join(toks)))
    keys: dict[str, set[int]] = {}
    for d, k in inst:
        keys.setdefault(k, set()).add(d)
    assert n_s == len(inst)
    assert n_d == len(keys)
    dup = sum(1 for _, k in inst if len(keys[k]) >= 2)
    assert n_dup == dup
    assert rate == (1_000_000 * dup) // max(len(inst), 1)
