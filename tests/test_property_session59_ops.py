"""Property-based semantics checks for the session-59 operators.

Models: a Python per-user feature model (sessions via the 30-min rule),
collapse-inner invariants over sf0.001 (group ordering, inner ranks,
agreement with search_collapse's winners), and a union-find over
replicated PPMI edges for the term clusters. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    _SESSION_GAP_US,
    _TCC_MIN_W,
    _US_PER_DAY,
    REGISTRY,
)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_ev = st.tuples(
    st.integers(min_value=0, max_value=4 * 86_400_000_000),
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["view", "click", "purchase"]),
    st.integers(min_value=-300, max_value=3000),
)


@settings(max_examples=40, deadline=None)
@given(evs=st.lists(_ev, min_size=1, max_size=30))
def test_user_features_match_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": pd.to_datetime(
                    pd.Series([t for t, *_ in evs], dtype="int64"), unit="us"
                ),
                "user_id": [u for _, u, *_ in evs],
                "event_type": [et for _, _, et, _ in evs],
                "value": [c / 100.0 for *_, c in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["user_feature_vectors"].sql).fetchall()
    }
    max_day = max(t // _US_PER_DAY for t, *_ in evs)
    users: dict[int, list] = {}
    for i, (t, u, et, c) in enumerate(evs):
        users.setdefault(u, []).append((t, i, et, c))
    model = {}
    for u, rows in users.items():
        rows.sort()
        sessions = 1 + sum(
            1 for a, b in zip(rows, rows[1:]) if b[0] - a[0] > _SESSION_GAP_US
        )
        days = {t // _US_PER_DAY for t, *_ in rows}
        model[u] = (
            max_day - max(days),
            len(rows),
            sum(c for *_, c in rows),
            sessions,
            len({et for _, _, et, _ in rows}),
            len(days),
        )
    assert got == model


def test_collapse_inner_invariants_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    rows = con.execute(REGISTRY["search_collapse_inner"].sql).fetchall()
    assert rows
    # per-source: inner_rank contiguous from 1, scores non-increasing
    by_src: dict[str, list] = {}
    for src, rn, doc, score, n_hits in rows:
        by_src.setdefault(src, []).append((rn, doc, score, n_hits))
    for src, hits in by_src.items():
        hits.sort()
        assert [h[0] for h in hits] == list(range(1, len(hits) + 1))
        scores = [h[2] for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert len(hits) <= min(3, hits[0][3])
    # winners agree with search_collapse (both rank groups by top hit)
    coll = con.execute(REGISTRY["search_collapse"].sql).fetchall()
    coll_top = {r[0]: r[1] for r in coll}  # source -> best doc_id
    for src, hits in by_src.items():
        if src in coll_top:
            assert hits[0][1] == coll_top[src]


_TC_VOCAB = ["aa", "bb", "cc", "xx", "yy"]
_tc_text = st.lists(st.sampled_from(_TC_VOCAB), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_tc_text, min_size=1, max_size=8))
def test_term_clusters_match_unionfind(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(REGISTRY["term_cluster_cc"].sql).fetchall()
    }
    pc: dict[tuple[str, str], int] = {}
    uc: dict[str, int] = {}
    for t in docs:
        ws = t.split()
        for w_ in ws:
            uc[w_] = uc.get(w_, 0) + 1
        for i in range(len(ws) - 1):
            k = tuple(sorted((ws[i], ws[i + 1])))
            pc[k] = pc.get(k, 0) + 2
        for i in range(len(ws) - 2):
            k = tuple(sorted((ws[i], ws[i + 2])))
            pc[k] = pc.get(k, 0) + 1
    n_tok = sum(uc.values())
    w_tot = sum(pc.values())
    edges = []
    for (a, b), w_ab in pc.items():
        if w_ab < _TCC_MIN_W:
            continue
        ppmi = _round_away(
            1_000_000
            * max(
                0.0,
                math.log(
                    (w_ab / float(w_tot))
                    / ((uc[a] / float(n_tok)) * (uc[b] / float(n_tok)))
                ),
            )
        )
        if ppmi > 0:
            edges.append((a, b))
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[str, list[str]] = {}
    for a, b in edges:
        for x in (a, b):
            r = find(x)
            if x not in clusters.setdefault(r, []):
                clusters[r].append(x)
    # the CC label is the lexicographic-min member of each cluster
    model = {
        min(ms): (len(set(ms)), " ".join(sorted(set(ms))))
        for ms in clusters.values()
    }
    assert got == model
