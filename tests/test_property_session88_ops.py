"""Property-based semantics checks for the session-88 operators.

Models: idf split stability against a full two-half idf + centered-
Pearson model, label MRR against a same-label first-hit invariant set,
and erratic customers against a direct CV² model. DuckDB-only.
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


_WI = ["aa", "bb", "cc", "dd"]
_texti = st.lists(st.sampled_from(_WI), min_size=1, max_size=6).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_texti, min_size=2, max_size=14))
def test_idf_stability_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    rows = con.execute(REGISTRY["idf_split_stability"].sql).fetchall()
    halves: dict[int, dict] = {0: {}, 1: {}}
    nh = {0: 0, 1: 0}
    for d, t in enumerate(docs):
        h = d % 2
        nh[h] += 1
        for w in set(t.split()):
            halves[h][w] = halves[h].get(w, 0) + 1

    def idf(h, w):
        return _round_away(
            1_000_000
            * math.log(1.0 + (float(nh[h]) - halves[h][w] + 0.5) / (halves[h][w] + 0.5))
        )

    shared = sorted(set(halves[0]) & set(halves[1]))
    if not shared:
        # empty shared vocabulary -> the grouped census has no groups,
        # identically in both engines
        assert rows == []
        return
    n_sh, corr, mad = rows[0]
    assert n_sh == len(shared)
    xy = [(idf(0, w), idf(1, w)) for w in shared]
    n = len(xy)
    assert mad == sum(abs(x - y) for x, y in xy) // n
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
        assert corr == 0
    else:
        mag = _round_away(1_000_000 * (cov * cov / (vx * vy)))
        assert corr == (-mag if cov < 0.0 else mag)


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=38, max_value=45))
def test_label_mrr_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    labels = [i % 3 for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(n), "label": labels, "embedding": vecs}),
    )
    n_q, n_hit, mrr = con.execute(REGISTRY["ann_label_mrr"].sql).fetchall()[0]
    assert n_q == len([i for i in range(n) if i % 37 == 0])
    assert 0 <= n_hit <= n_q
    assert 0 <= mrr <= 1_000_000
    if n_hit == 0:
        assert mrr == 0
    else:
        # MRR is at most n_hit/n_q (each hit contributes <= 1)
        assert mrr <= _round_away(1_000_000 * (n_hit / n_q)) + 1


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), _price),
        min_size=5,
        max_size=30,
    )
)
def test_erratic_matches_model(orders):
    con = duckdb.connect()
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
    got = con.execute(REGISTRY["erratic_customers_topk"].sql).fetchall()
    per: dict[int, list[int]] = {}
    for c, p in orders:
        per.setdefault(c, []).append(_round_away(p * 100) // 100)
    rows = []
    for c, ys in per.items():
        n = len(ys)
        if n < 5:
            continue
        s = sum(ys)
        if s <= 0:
            continue
        sq = sum(y * y for y in ys)
        var = (float(n) * sq - float(s) * s) / (float(n) * n)
        mean = float(s) / n
        cv2 = _round_away(1_000_000 * (var / (mean * mean)))
        rows.append((c, n, cv2))
    rows.sort(key=lambda r: (-r[2], r[0]))
    want = [(c, n, cv2, r) for r, (c, n, cv2) in enumerate(rows[:10], start=1)]
    assert got == want
