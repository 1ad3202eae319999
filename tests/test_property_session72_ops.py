"""Property-based semantics checks for the session-72 operators.

Models: common-terms semantics via a full Python BM25 model (common
terms score only on low-term matchers; docs matched ONLY by common
terms disappear), a two-proportion z² model with the md5 arms, and an
order-gap bucket model. DuckDB-only.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _CT_QUERY, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_W = list(_CT_QUERY) + ["zz", "yy"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=10))
def test_common_terms_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["common_terms_search"].sql).fetchall()
    tfs: dict[tuple[int, str], int] = {}
    df: dict[str, int] = {}
    dls: dict[int, int] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    n_docs = len(docs)
    avgdl = sum(dls.values()) / float(n_docs)
    common = {t for t in _CT_QUERY if t in df and df[t] > n_docs / 2.0}
    low = [t for t in _CT_QUERY if t in df and t not in common]
    low_docs = {d for (d, w) in tfs if w in low}

    def bm25(d, w):
        tf = tfs[(d, w)]
        return (
            math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            * tf * 2.2
            / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        )

    model = []
    for d in range(n_docs):
        s = 0.0
        matched = False
        for w in _CT_QUERY:
            if (d, w) not in tfs:
                continue
            matched = True
            if w not in common or d in low_docs:
                s += bm25(d, w)
        if not matched:
            continue
        sq = _round_away(1_000_000 * s)
        if sq > 0:
            model.append((d, sq, 1 if d in low_docs else 0))
    model.sort(key=lambda r: (-r[1], r[0]))
    assert got == model[:10]
    # a doc matched ONLY by common terms never appears
    for d, sq, has_low in got:
        assert has_low == 1 or any(
            (d, w) in tfs for w in _CT_QUERY if w not in common
        )


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.booleans()),
        min_size=1,
        max_size=20,
    )
)
def test_ab_significance_matches_model(users):
    rows = []
    for i, (u, conv) in enumerate(users):
        rows.append((i, u, "purchase" if conv else "view"))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
            }
        ),
    )
    n0, c0, n1, c1, z2 = con.execute(REGISTRY["ab_significance"].sql).fetchall()[0]
    per: dict[int, int] = {}
    for _, u, et in rows:
        per[u] = max(per.get(u, 0), 1 if et == "purchase" else 0)
    arms: dict[int, list[int]] = {0: [0, 0], 1: [0, 0]}
    for u, conv in per.items():
        arm = int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:4], 16) % 2
        arms[arm][0] += 1
        arms[arm][1] += conv
    assert (n0, c0, n1, c1) == (arms[0][0], arms[0][1], arms[1][0], arms[1][1])
    if n0 == 0 or n1 == 0 or (c0 + c1) == 0 or (c0 + c1) == (n0 + n1):
        assert z2 == 0
    else:
        p0, p1 = c0 / float(n0), c1 / float(n1)
        pp = (c0 + c1) / float(n0 + n1)
        want = _round_away(
            1_000_000 * ((p0 - p1) * (p0 - p1)) / (pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
        )
        assert z2 == want


_D0 = datetime.date(1996, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # custkey
            st.integers(min_value=0, max_value=60),  # day offset
        ),
        min_size=1,
        max_size=25,
    )
)
def test_order_gaps_match_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_orderdate": [_D0 + datetime.timedelta(days=d) for _, d in orders],
            }
        ),
    )
    got = dict(con.execute(REGISTRY["order_gap_histogram"].sql).fetchall())
    seqs: dict[int, list] = {}
    for i, (c, d) in enumerate(orders):
        seqs.setdefault(c, []).append((d, i))
    hist: dict[int, int] = {}
    for rows in seqs.values():
        rows.sort()
        for a, b in zip(rows, rows[1:]):
            gap = b[0] - a[0]
            bkt = -1 if gap == 0 else gap.bit_length() - 1
            hist[bkt] = hist.get(bkt, 0) + 1
    assert got == hist
