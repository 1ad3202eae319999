"""Property-based semantics checks for the session-108 operators.

Models: pairwise-cosine moments against the BRUTE-FORCE pair table
(the whole point: the Gram-trick op must agree with the O(n²)
computation it replaces, within the documented q3-floor tolerance),
coordination census against a full BM25 model, weekday purchase share
against direct counting. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=10, deadline=None)
@given(data=st.data(), n=st.integers(min_value=7, max_value=12))
def test_cos_moments_match_bruteforce(data, n):
    # n >= 7: the q3 M-floor's absolute f2 error is divided by n(n-1),
    # so the documented tolerance only holds once that divisor tempers
    # it (at n=2 a single pair amplifies the floor to ~3.5e-3)
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    n_vecs, mean_q6, var_q6 = con.execute(
        REGISTRY["pairwise_cos_moments"].sql
    ).fetchall()[0]
    # brute-force over the SAME q6-normalized vectors
    uns = []
    for v in vecs[1:]:  # vec_id 0 excluded
        acc = 0.0
        for x in v:
            acc += x * x
        nrm = math.sqrt(acc)
        uns.append([_round_away(1_000_000 * x / nrm) for x in v])
    m = len(uns)
    assert n_vecs == m
    dots = []
    for i in range(m):
        for j in range(m):
            if i != j:
                dots.append(
                    sum(a * b for a, b in zip(uns[i], uns[j])) / 1e12
                )
    bf_mean = sum(dots) / len(dots)
    bf_var = sum(d * d for d in dots) / len(dots) - bf_mean * bf_mean
    # mean uses exact integer sums -> tight; var pays the q3 M-floor,
    # whose f2 error is ~2e-3 * sum|M| / (m(m-1)) — sum|M| runs a few
    # times the trace (= m) on these vectors, so allow ~1.2e-2 absolute
    assert abs(mean_q6 - 1_000_000 * bf_mean) <= 5
    assert abs(var_q6 - 1_000_000 * bf_var) <= 12_000
    assert var_q6 >= -12_000  # variance can't be meaningfully negative


_WM = list(_RANKEVAL_TERMS) + ["zz", "yy"]
_textm = st.lists(st.sampled_from(_WM), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textm, min_size=1, max_size=12))
def test_coordination_census_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["match_coordination_census"].sql
        ).fetchall()
    }
    tfs: dict[tuple[int, str], int] = {}
    dfc: dict[str, int] = {}
    dls: dict[int, int] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
    nd = len(docs)
    avgdl = sum(dls.values()) / float(nd)
    model: dict[int, list[int]] = {}
    for d in range(nd):
        ss = []
        for w in _RANKEVAL_TERMS:
            if (d, w) not in tfs:
                continue
            tf = tfs[(d, w)]
            ss.append(
                math.log(1.0 + (nd - dfc[w] + 0.5) / (dfc[w] + 0.5))
                * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            )
        if ss:
            sq = _round_away(sum(ss) * 1_000_000)
            cell = model.setdefault(len(ss), [0, 0])
            cell[0] += 1
            cell[1] += sq
    want = {
        nm: (nd_, ssum // nd_) for nm, (nd_, ssum) in model.items()
    }
    assert got == want


_WT0 = datetime.datetime(2024, 9, 2)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weekday_purchase_share_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [_WT0 + datetime.timedelta(days=d) for d, _ in events],
                "event_type": [e for _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["purchase_share_by_weekday"].sql
        ).fetchall()
    }
    day0 = (_WT0 - datetime.datetime(1970, 1, 1)).days
    agg = {d: [0, 0] for d in range(7)}
    for d, e in events:
        dow = (day0 + d + 3) % 7
        agg[dow][0] += 1
        agg[dow][1] += 1 if e == "purchase" else 0
    model = {
        d: (n, p, 0 if n == 0 else (1_000_000 * p) // n)
        for d, (n, p) in agg.items()
    }
    assert got == model
