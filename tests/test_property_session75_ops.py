"""Property-based semantics checks for the session-75 operators.

Models: PL2 replicated float-op-for-float-op (folded log2(e)/2pi
constants, exact assert — the bm25-model precedent), session first-touch
attribution against a literal gaps-and-islands model, and Spearman
against midranks computed by brute force. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _PL2_TERMS, REGISTRY

_LOG2E = 1.4426950408889634
_2PI = 6.283185307179586


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


# ---------------------------------------------------------------------------
# dfr_pl2_search
# ---------------------------------------------------------------------------

_WP = list(_PL2_TERMS) + ["zz", "yy"]
_textp = st.lists(st.sampled_from(_WP), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textp, min_size=1, max_size=12))
def test_pl2_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["dfr_pl2_search"].sql).fetchall()
    tfs: dict[tuple[int, str], int] = {}
    dls: dict[int, int] = {}
    cf: dict[str, int] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
            cf[w] = cf.get(w, 0) + 1
    nd = len(docs)
    tot = sum(dls.values())

    def pl2(d, w):
        tfn = tfs[(d, w)] * (math.log(1.0 + (tot / nd) / dls[d]) * _LOG2E)
        lam = cf[w] / nd
        return (
            _LOG2E
            * (tfn * math.log(tfn / lam) + (lam - tfn) + 0.5 * math.log(_2PI * tfn))
            / (tfn + 1.0)
        )

    model = []
    for d in range(nd):
        ss = [pl2(d, w) for w in _PL2_TERMS if (d, w) in tfs]
        if ss:
            model.append((d, _round_away(sum(ss) * 1_000_000), len(ss)))
    model.sort(key=lambda r: (-r[1], r[0]))
    want = [(d, s, nm, r) for r, (d, s, nm) in enumerate(model[:10], start=1)]
    assert got == want


# ---------------------------------------------------------------------------
# session_entry_conversion
# ---------------------------------------------------------------------------

_SE_T0 = datetime.datetime(2024, 2, 1)
_GAP_US = 1_800_000_000


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=7200),  # seconds offset
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_entry_conversion_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _SE_T0 + datetime.timedelta(seconds=s) for _, s, _ in events
                ],
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["session_entry_conversion"].sql).fetchall()
    }
    per_user: dict[int, list] = {}
    for i, (u, s, e) in enumerate(events):
        per_user.setdefault(u, []).append((s * 1_000_000, i, e))
    agg: dict[str, list[int]] = {}
    for rows in per_user.values():
        rows.sort()
        sessions: list[list] = []
        prev = None
        for t_us, i, e in rows:
            if prev is None or t_us - prev > _GAP_US:
                sessions.append([])
            sessions[-1].append(e)
            prev = t_us
        for sess in sessions:
            entry = sess[0]
            conv = 1 if "purchase" in sess else 0
            a = agg.setdefault(entry, [0, 0])
            a[0] += 1
            a[1] += conv
    model = {
        e: (n, c, (1_000_000 * c) // n) for e, (n, c) in agg.items()
    }
    assert got == model


# ---------------------------------------------------------------------------
# spearman_len_ttr
# ---------------------------------------------------------------------------

_WS = ["aa", "bb", "cc"]
_texts = st.lists(st.sampled_from(_WS), min_size=1, max_size=9).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_texts, min_size=1, max_size=12))
def test_spearman_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n_docs, rho2s = con.execute(REGISTRY["spearman_len_ttr"].sql).fetchall()[0]
    pts = []
    for t in docs:
        ws = t.split()
        a = len(ws)
        b = (1_000_000 * len(set(ws))) // a
        pts.append((a, b))

    def midranks2(vals):
        out = {}
        cum = 0
        for v in sorted(set(vals)):
            c = vals.count(v)
            out[v] = 2 * (cum + c) - c + 1
            cum += c
        return out

    ra = midranks2([a for a, _ in pts])
    rb = midranks2([b for _, b in pts])
    xy = [(ra[a], rb[b]) for a, b in pts]
    n = len(xy)
    assert n_docs == n
    mx = sum(x for x, _ in xy) // n
    my = sum(y for _, y in xy) // n
    sxc = sum(x - mx for x, _ in xy)
    syc = sum(y - my for _, y in xy)
    sxx = sum((x - mx) ** 2 for x, _ in xy)
    syy = sum((y - my) ** 2 for _, y in xy)
    sxy = sum((x - mx) * (y - my) for x, y in xy)
    cov = float(n) * sxy - float(sxc) * syc
    vx = float(n) * sxx - float(sxc) * sxc
    vy = float(n) * syy - float(syc) * syc
    if n < 2 or vx == 0.0 or vy == 0.0:
        assert rho2s == 0
    else:
        mag = _round_away(1_000_000 * (cov * cov / (vx * vy)))
        assert rho2s == (-mag if cov < 0.0 else mag)
        assert abs(rho2s) <= 1_000_000 + 3
