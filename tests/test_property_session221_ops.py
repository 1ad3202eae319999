"""Property-based semantics checks for the session-221 operators.

DuckDB-only (oracle SQL vs exact Python models): reuse-distance bands
over the fully-keyed layout, the Clauset xmin selection replayed with
identical expression shapes, and the circular hour statistics.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _CIRC24
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=1, max_value=7),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
def test_part_reuse_distance_matches_model(rows):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _, _ in rows],
                "l_linenumber": [l for _, l, _ in rows],
                "l_partkey": [p for _, _, p in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["part_reuse_distance_histogram"].sql).fetchall()

    order = sorted(rows)
    last = {}
    bands = {}
    for i, (_, _, p) in enumerate(order):
        if p in last:
            gap = i - last[p]
            band = gap.bit_length() - 1
            bands[band] = bands.get(band, 0) + 1
        last[p] = i
    n_acc = len(order)
    n_parts = len({p for _, _, p in order})
    model = [
        (band, bands[band], n_acc, n_parts) for band in sorted(bands)
    ]
    assert got == model


_WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _shingles(words):
    return (
        {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if len(words) >= 3
        else set()
    )


def _bands(sh):
    if not sh:
        return []
    mins = [
        min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sh)
        for p in range(4)
    ]
    return [mins[0] + mins[1], mins[2] + mins[3]]


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=9),
        min_size=2,
        max_size=10,
    )
)
def test_degree_powerlaw_xmin_matches_model(docs):
    texts = [" ".join(ws) for ws in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "source": "s"}
        ),
    )
    got = con.execute(REGISTRY["degree_powerlaw_xmin"].sql).fetchall()

    shs = [_shingles(tokenize(t)) for t in texts]
    bnds = [_bands(s) for s in shs]
    deg = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if set(bnds[i]) & set(bnds[j]):
                deg[i] = deg.get(i, 0) + 1
                deg[j] = deg.get(j, 0) + 1
    if not deg:
        assert got == []
        return
    dh = {}
    for d in deg.values():
        dh[d] = dh.get(d, 0) + 1
    cands = []
    for xmin in sorted(dh):
        tail = [(d, c) for d, c in sorted(dh.items()) if d >= xmin]
        n_tail = sum(c for _, c in tail)
        slnr = sum(
            c * _round_away(1000000 * math.log(d / xmin)) for d, c in tail
        )
        if slnr <= 0:
            continue
        alpha = 1 + (float(n_tail) * 1000000) / slnr
        cum = 0
        ksv = 0
        for d, c in tail:
            cum += c
            term = _round_away(
                1000000
                * abs(cum / n_tail - (1 - math.pow(d / xmin, 1 - alpha)))
            )
            ksv = max(ksv, term)
        cands.append((ksv, xmin, alpha, n_tail))
    if not cands:
        assert got == []
        return
    ksv, xmin, alpha, n_tail = min(cands)
    model = (xmin, n_tail, _round_away(1000000 * alpha), ksv)
    assert got == [model]


_T0 = datetime.datetime(2025, 12, 1)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.integers(min_value=0, max_value=200),  # hours since T0
        ),
        min_size=1,
        max_size=50,
    )
)
def test_hour_circular_stats_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_type": [t for t, _ in evs],
                "ts": [_T0 + datetime.timedelta(hours=h) for _, h in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["hour_circular_stats"].sql).fetchall()
    }

    base_h = int(_T0.timestamp()) // 3600
    cq = {h: c for h, c, _ in _CIRC24}
    sq = {h: s_ for h, _, s_ in _CIRC24}
    rad2hour = 24 / (2 * math.pi)
    model = {}
    for t in {t for t, _ in evs}:
        hs = [(base_h + h) % 24 for tt, h in evs if tt == t]
        n = len(hs)
        sc = sum(cq[h] for h in hs)
        ss = sum(sq[h] for h in hs)
        r = _round_away(
            1000000
            * math.sqrt(float(sc) * sc + float(ss) * ss)
            / (float(n) * 1000000000)
        )
        ang = math.atan2(float(ss), float(sc)) * rad2hour
        if ang < 0:
            ang += 24
        model[t] = (n, r, _round_away(1000000 * ang))
    assert got == model
    # R is a valid concentration in [0, 1]
    for n, r, mh in got.values():
        assert 0 <= r <= 1000001 and 0 <= mh < 24000001
