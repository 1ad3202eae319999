"""Property-based semantics checks for the session-114 operators.

Models: the lexical×semantic census rebuilt from the pair oracle +
exact Jaccard + float cosine, the prefix curve against direct prefix
sets, WAU against direct counting. DuckDB-only.
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


_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=7).map(" ".join)
_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=15, deadline=None)
@given(data=st.data(), docs=st.lists(_text3, min_size=2, max_size=8))
def test_lexical_semantic_census_matches_model(data, docs):
    vecs = [data.draw(_vec(i)) for i in range(len(docs))]
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
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(docs)),
                "label": [0] * len(docs),
                "embedding": vecs,
            }
        ),
    )
    pairs = con.execute(REGISTRY["minhash_lsh_pairs"].sql).fetchall()
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            REGISTRY["lexical_semantic_pair_census"].sql
        ).fetchall()
    }

    def shingles(t):
        ws = t.lower().split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    model: dict[tuple[int, int], int] = {}
    for a, b in pairs:
        sa, sb = shingles(docs[a]), shingles(docs[b])
        inter = len(sa & sb)
        j = (1_000_000 * inter) // (len(sa) + len(sb) - inter)
        va, vb = vecs[a], vecs[b]
        dd = sum(x * y for x, y in zip(va, vb))
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        cq = _round_away(1_000_000 * dd / (na * nb))
        key = (min(j // 200_000, 4), min(max((cq + 1_000_000) // 400_000, 0), 4))
        model[key] = model.get(key, 0) + 1
    assert got == model


_words = st.sampled_from(
    ["a", "ab", "abc", "abcd", "b", "bc", "bcd", "zzzz", "zzza"]
)
_textp = st.lists(_words, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_textp, min_size=1, max_size=10))
def test_prefix_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["prefix_branching_curve"].sql).fetchall()
    }
    vocab = {w for t in docs for w in t.split()}
    model = {}
    for k in (1, 2, 3, 4):
        covered = [w for w in vocab if len(w) >= k]
        if not covered:
            continue
        model[k] = (len({w[:k] for w in covered}), len(covered))
    assert got == model
    # fanout grows with depth over the covered set
    ks = sorted(model)
    for a, b in zip(ks, ks[1:]):
        assert model[a][0] <= model[b][0] + model[a][1]


_WT0 = datetime.datetime(2025, 2, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_wau_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_WT0 + datetime.timedelta(days=d) for _, d in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["weekly_active_users"].sql).fetchall()
    }
    day0 = (_WT0 - datetime.datetime(1970, 1, 1)).days
    per: dict[int, list] = {}
    for u, d in events:
        wk = (day0 + d) // 7
        per.setdefault(wk, []).append(u)
    model = {wk: (len(set(us)), len(us)) for wk, us in per.items()}
    assert got == model
