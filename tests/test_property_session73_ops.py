"""Property-based semantics checks for the session-73 operators.

Models: Monroe informative-Dirichlet log-odds replicated float-op-for-
float-op (±3 q6 tolerance, the ln-based-score convention, with a margin
guard on the top-5 selection), CUSUM checked against the LITERAL
recursion S+_t = max(0, S+_{t-1} + d_t) — proving the window identity
the implementation relies on — and the OLS trend against an exact
integer/float model over dyadic prices. DuckDB-only (ms per example).
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


# ---------------------------------------------------------------------------
# logodds_terms_source
# ---------------------------------------------------------------------------

_VOCAB = ["aa", "bb", "cc", "dd", "ee"]
_text = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=6).map(" ".join)
_doc = st.tuples(st.sampled_from(["s0", "s1", "s2"]), _text)


def _logodds_model(docs):
    y: dict[tuple[str, str], int] = {}
    for src, t in docs:
        for w in t.split():
            y[(src, w)] = y.get((src, w), 0) + 1
    ns: dict[str, int] = {}
    cf: dict[str, int] = {}
    for (src, w), c in y.items():
        ns[src] = ns.get(src, 0) + c
        cf[w] = cf.get(w, 0) + c
    n = sum(ns.values())
    rows: dict[str, list] = {}
    for (src, w), cnt in y.items():
        a = (1e3 * cf[w]) / n
        d1 = math.log((cnt + a) / max(ns[src] + 1e3 - cnt - a, 1e-9))
        d2 = math.log(
            (cf[w] - cnt + a) / max(n - ns[src] + 1e3 - (cf[w] - cnt) - a, 1e-9)
        )
        delta = d1 - d2
        v = 1.0 / (cnt + a) + 1.0 / (cf[w] - cnt + a)
        dq6 = _round_away(1000000 * delta)
        z2 = _round_away(1000000 * delta * delta / v)
        z2s = -z2 if delta < 0 else z2
        rows.setdefault(src, []).append((w, dq6, z2s))
    for src in rows:
        rows[src].sort(key=lambda r: (-r[2], r[0]))
    return rows


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=12))
def test_logodds_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["logodds_terms_source"].sql).fetchall()
    model = _logodds_model(docs)
    # per-source row counts and rank sequence
    per_src: dict[str, list] = {}
    for src, term, rank, dq6, z2s in got:
        per_src.setdefault(src, []).append((rank, term, dq6, z2s))
    assert set(per_src) == set(model)
    for src, rows in per_src.items():
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) == min(5, len(model[src]))
        # emitted ordering is consistent with the emitted quantized scores
        z = [r[3] for r in rows]
        assert all(a >= b for a, b in zip(z, z[1:]))
        mrows = {w: (dq6, z2s) for w, dq6, z2s in model[src]}
        for _, term, dq6, z2s in rows:
            assert abs(dq6 - mrows[term][0]) <= 3
            assert abs(z2s - mrows[term][1]) <= 3
        # selection check only when the model's cut margin clears the
        # float tolerance (identical-count ties are exact on both sides)
        msorted = model[src]
        if len(msorted) > 5 and msorted[4][2] - msorted[5][2] > 10:
            assert {r[1] for r in rows} == {w for w, _, _ in msorted[:5]}


# ---------------------------------------------------------------------------
# events_cusum_anomaly — window form == literal recursion
# ---------------------------------------------------------------------------

_EV_T0 = datetime.datetime(2024, 1, 5)
_EV_DAY0 = (_EV_T0 - datetime.datetime(1970, 1, 1)).days


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=0, max_value=23),  # hour
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cusum_matches_literal_recursion(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [
                    _EV_T0 + datetime.timedelta(days=d, hours=h)
                    for d, h in events
                ],
            }
        ),
    )
    got = con.execute(REGISTRY["events_cusum_anomaly"].sql).fetchall()
    counts: dict[int, int] = {}
    for d, _ in events:
        counts[d] = counts.get(d, 0) + 1
    lo, hi = min(counts), max(counts)
    xs = [counts.get(d, 0) for d in range(lo, hi + 1)]
    nd, tot = len(xs), sum(xs)
    sp = sn = 0
    model = []
    for i, x in enumerate(xs):
        dd = nd * x - tot
        sp = max(0, sp + dd)
        sn = max(0, sn - dd)
        model.append(
            (
                _EV_DAY0 + lo + i,
                x,
                _round_away(1000000 * (sp / float(nd))),
                _round_away(1000000 * (sn / float(nd))),
            )
        )
    assert got == model


# ---------------------------------------------------------------------------
# daily_revenue_trend
# ---------------------------------------------------------------------------

_TR_D0 = datetime.datetime(1995, 3, 1)

# dyadic quarters so round(price*100) is ulp-unambiguous (session-39 rule)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), _price),
        min_size=1,
        max_size=30,
    )
)
def test_revenue_trend_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _TR_D0 + datetime.timedelta(days=d) for d, _ in orders
                ],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    n_days, cents, slope, r2 = con.execute(
        REGISTRY["daily_revenue_trend"].sql
    ).fetchall()[0]
    day_cents: dict[int, int] = {}
    for d, p in orders:
        day_cents[d] = day_cents.get(d, 0) + _round_away(p * 100)
    lo = min(day_cents)
    pts = [(d - lo, c, c // 100) for d, c in sorted(day_cents.items())]
    n = len(pts)
    mx = sum(x for x, _, _ in pts) // n
    my = sum(y for _, _, y in pts) // n
    sxc = sum(x - mx for x, _, _ in pts)
    syc = sum(y - my for _, _, y in pts)
    sxx = sum((x - mx) * (x - mx) for x, _, _ in pts)
    syy = sum((y - my) * (y - my) for _, _, y in pts)
    sxy = sum((x - mx) * (y - my) for x, _, y in pts)
    assert n_days == n
    assert cents == sum(c for _, c, _ in pts)
    cov = float(n) * sxy - float(sxc) * syc
    vx = float(n) * sxx - float(sxc) * sxc
    vy = float(n) * syy - float(syc) * syc
    if n < 2 or vx == 0.0:
        assert slope == 0
    else:
        assert slope == _round_away(1000000 * (cov / vx))
    if n < 2 or vx == 0.0 or vy == 0.0:
        assert r2 == 0
    else:
        assert r2 == _round_away(1000000 * (cov * cov / (vx * vy)))
        assert 0 <= r2 <= 1000000 + 3
