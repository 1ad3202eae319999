"""Property-based semantics checks for the session-77 operators.

Models: the HLL curve against a literal register simulation at each
precision (exact — integer register sums, one float division), weekly
JSD against a per-cell q6-first model, and the supplier delay board
against direct aggregation. DuckDB-only.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _HLL_ALPHA, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


# ---------------------------------------------------------------------------
# hll_precision_curve
# ---------------------------------------------------------------------------

_W3 = ["aa", "bb", "cc", "dd", "ee"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=8).map(" ".join)


def _shingles(text):
    ws = text.lower().split()
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_text3, min_size=1, max_size=10))
def test_hll_curve_matches_register_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["s0"] * len(docs),
                "text": docs,
            }
        ),
    )
    got = con.execute(REGISTRY["hll_precision_curve"].sql).fetchall()
    shs = set()
    for t in docs:
        shs |= _shingles(t)
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shs]
    model = []
    for p in (4, 6, 8):
        m = 1 << p
        w1 = 61 - p
        regs: dict[int, int] = {}
        for h in hs:
            reg = h % m
            w = h >> p
            rnk = w1 if w == 0 else w1 - w.bit_length()
            regs[reg] = max(regs.get(reg, 0), rnk)
        z_int = sum(1 << (w1 - r) for r in regs.values()) + (m - len(regs)) * (
            1 << w1
        )
        zeros = m - len(regs)
        c = _HLL_ALPHA[p] * m * m * float(1 << w1)
        raw = c / float(z_int)
        if raw <= 2.5 * m and zeros > 0:
            est = float(m) * math.log(float(m) / zeros)
        else:
            est = raw
        model.append((p, m, len(shs), _round_away(est * 1_000_000)))
    assert got == model
    # the estimate should be in the right ballpark at p=8 for small n
    p8 = got[2]
    if p8[2] > 0:
        assert 0 < p8[3] // 1_000_000 <= 4 * p8[2] + 4


# ---------------------------------------------------------------------------
# events_weekly_type_jsd
# ---------------------------------------------------------------------------

_JT0 = datetime.datetime(2024, 1, 1)
_JDAY0 = (_JT0 - datetime.datetime(1970, 1, 1)).days


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weekly_jsd_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [_JT0 + datetime.timedelta(days=d) for d, _ in events],
                "event_type": [e for _, e in events],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.execute(
        REGISTRY["events_weekly_type_jsd"].sql
    ).fetchall()}
    cells: dict[tuple[int, str], int] = {}
    for d, e in events:
        wk = (_JDAY0 + d) // 7
        cells[(wk, e)] = cells.get((wk, e), 0) + 1
    weeks = sorted({w for w, _ in cells})
    types = sorted({e for _, e in cells})
    gt = {e: sum(n for (w, ee), n in cells.items() if ee == e) for e in types}
    nt = sum(gt.values())
    model = {}
    for wk in weeks:
        nw = sum(n for (w, _), n in cells.items() if w == wk)
        jsd = 0
        for e in types:
            n = cells.get((wk, e), 0)
            pp = float(n) / nw
            gg = float(gt[e]) / nt
            mm = (pp + gg) / 2.0
            contrib = (0.0 if n == 0 else 0.5 * pp * math.log(pp / mm)) + (
                0.5 * gg * math.log(gg / mm)
            )
            jsd += _round_away(1_000_000 * contrib)
        model[wk] = (nw, jsd)
        assert -3 * len(types) <= jsd <= round(1_000_000 * math.log(2)) + 3 * len(types)
    assert got == model


# ---------------------------------------------------------------------------
# supplier_ship_delay_topk
# ---------------------------------------------------------------------------

_ST0 = datetime.datetime(1996, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # supplier
            st.integers(min_value=0, max_value=9),  # order index
            st.integers(min_value=0, max_value=90),  # ship delay days
        ),
        min_size=1,
        max_size=40,
    ),
    odays=st.lists(
        st.integers(min_value=0, max_value=60), min_size=10, max_size=10
    ),
)
def test_supplier_delay_matches_model(items, odays):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(10),
                "o_orderdate": [
                    _ST0 + datetime.timedelta(days=d) for d in odays
                ],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _, _ in items],
                "l_orderkey": [o for _, o, _ in items],
                "l_shipdate": [
                    _ST0 + datetime.timedelta(days=odays[o] + d)
                    for _, o, d in items
                ],
            }
        ),
    )
    got = con.execute(REGISTRY["supplier_ship_delay_topk"].sql).fetchall()
    per: dict[int, list[int]] = {}
    for s, o, d in items:
        per.setdefault(s, []).append(d)
    rows = []
    for s, lags in per.items():
        if len(lags) < 5:
            continue
        mean = _round_away(1_000_000 * (float(sum(lags)) / len(lags)))
        rows.append((s, len(lags), mean))
    rows.sort(key=lambda r: (-r[2], r[0]))
    want = [(s, n, m, r) for r, (s, n, m) in enumerate(rows[:10], start=1)]
    assert got == want
