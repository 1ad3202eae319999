"""Property-based semantics checks for the session-216 operators.

DuckDB-only (oracle SQL vs exact Python models): 1-D DBSCAN islands,
the info-gain stump (entropy replayed with identical expression shape),
and the PVM bridge incl. its exact reconciliation identity.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=60)
)
def test_doclen_dbscan_matches_model(lens):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"text": [" ".join("w" for _ in range(k)) for k in lens]}),
    )
    got = con.execute(REGISTRY["doclen_dbscan_1d"].sql).fetchall()

    vals = sorted(set(lens))
    cnt = {v: lens.count(v) for v in vals}
    clusters, cur = [], [vals[0]]
    for a, b in zip(vals, vals[1:]):
        if b - a > 4:
            clusters.append(cur)
            cur = []
        cur.append(b)
    clusters.append(cur)
    cs = [(min(c), max(c), sum(cnt[v] for v in c)) for c in clusters]
    dense = [c for c in cs if c[2] >= 5]
    noise = sum(c[2] for c in cs if c[2] < 5)
    dense.sort(key=lambda c: (-c[2], c[0]))
    model = [
        (i + 1, vmin, vmax, mass, len(dense), noise)
        for i, (vmin, vmax, mass) in enumerate(dense[:5])
    ]
    assert got == model


_WORDS = ["aa", "bb", "cc", "dd"]


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        min_size=2,
        max_size=14,
    ),
    dups=st.integers(min_value=0, max_value=3),
)
def test_quality_stump_matches_bruteforce(docs, dups):
    texts = [" ".join(ws) for ws in docs]
    for k in range(min(dups, len(texts))):
        texts.append(texts[k])
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = con.execute(REGISTRY["quality_stump_threshold"].sql).fetchall()

    from collections import Counter

    hh = Counter(texts)
    rows = []
    for t in texts:
        ts = tokenize(t)
        rows.append(
            (
                _round_away(1e6 * len(set(ts)) / len(ts)),
                1 if hh[t] > 1 else 0,
            )
        )
    cells = {}
    for s, d in rows:
        c = cells.setdefault(s, [0, 0])
        if d:
            c[0] += 1
        else:
            c[1] += 1
    P = sum(c[0] for c in cells.values())
    N = sum(c[1] for c in cells.values())
    n = P + N

    def h2(x, m):
        if x == 0 or x == m:
            return 0.0
        p = x / m
        return -(p * math.log(p) + (1 - p) * math.log(1 - p))

    cands = []
    cp = cn = 0
    for s in sorted(cells):
        cp += cells[s][0]
        cn += cells[s][1]
        nl, nr = cp + cn, n - cp - cn
        if nl < 1 or nr < 1:
            continue
        ig = h2(P, n) - (nl / n) * h2(cp, nl) - (nr / n) * h2(P - cp, nr)
        cands.append((_round_away(1000000 * ig), -s, cp, cn))
    if not cands:
        assert got == []
        return
    ig, ns, cp, cn = max(cands)
    s = -ns
    nl, nr = cp + cn, n - cp - cn
    model = (
        s,
        nl,
        nr,
        (1000000 * cp) // max(nl, 1),
        (1000000 * (P - cp)) // max(nr, 1),
        ig,
    )
    assert got == [model]


_T0 = datetime.datetime(2025, 7, 1)


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["B1", "B2", "B3"]),
            st.integers(min_value=0, max_value=200),  # ship day
            st.integers(min_value=100, max_value=500000),  # cents
            st.integers(min_value=1, max_value=50),  # quantity
        ),
        min_size=1,
        max_size=40,
    )
)
def test_brand_pvm_bridge_matches_model(rows):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [i % 7 for i in range(len(rows))],
                "l_shipdate": [_T0 + datetime.timedelta(days=d) for _, d, _, _ in rows],
                "l_extendedprice": [c / 100 for _, _, c, _ in rows],
                "l_quantity": [float(q) for _, _, _, q in rows],
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(7),
                "p_brand": [rows[i % len(rows)][0] if rows else "B1" for i in range(7)],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["brand_pvm_bridge"].sql).fetchall()
    }

    base = int(_T0.timestamp()) // 86400
    days = [base + d for _, d, _, _ in rows]
    lo, hi = min(days), max(days)
    mid = (lo + hi) // 2
    brands = {}
    for i, (_, d, c, q) in enumerate(rows):
        brand = [rows[j % len(rows)][0] for j in range(7)][i % 7]
        half = 1 if base + d <= mid else 2
        cell = brands.setdefault(brand, [0, 0, 0, 0])  # q1 r1 q2 r2
        if half == 1:
            cell[0] += 100 * q
            cell[1] += c
        else:
            cell[2] += 100 * q
            cell[3] += c
    model = {}
    for brand, (q1, r1, q2, r2) in brands.items():
        if q1 == 0 or q2 == 0:
            vol = r2 - r1
        else:
            vol = _round_away(float(r1) * (q2 - q1) / q1)
        model[brand] = (r1, r2, r2 - r1, vol, (r2 - r1) - vol)
    assert got == model
    # the bridge reconciles exactly
    for r1, r2, delta, vol, price in got.values():
        assert vol + price == delta == r2 - r1
