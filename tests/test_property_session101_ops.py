"""Property-based semantics checks for the session-101 operators.

Models: edge embeddedness rebuilt from the minhash_lsh_pairs oracle's
own edges (exact common-neighbor counts), hub census invariants
(handshake: total in-degree == neighbor rows), and exclusive vocab
against direct set arithmetic. DuckDB-only.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=7).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_text3, min_size=2, max_size=10))
def test_edge_embeddedness_matches_pair_model(docs):
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
    pairs = con.execute(REGISTRY["minhash_lsh_pairs"].sql).fetchall()
    got = dict(
        con.execute(REGISTRY["lsh_edge_embeddedness"].sql).fetchall()
    )
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hist: dict[int, int] = {}
    for a, b in pairs:
        emb = len(adj[a] & adj[b])
        bucket = -1 if emb == 0 else emb.bit_length() - 1
        hist[bucket] = hist.get(bucket, 0) + 1
    assert got == hist


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=38, max_value=45))
def test_hub_census_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["ann_hub_census"].sql).fetchall()
    n_queries = len([i for i in range(n) if i % 37 == 0])
    degs = [r[1] for r in rows]
    assert degs == sorted(degs, reverse=True)
    for vec_id, deg, rank in rows:
        assert 1 <= deg <= n_queries  # one slot per query's list at most 10x
        assert 0 <= vec_id < n
    # the hub board is capped at 10 rows
    assert len(rows) <= 10


_WS = ["aa", "bb", "cc", "dd", "ee"]
_texts = st.lists(st.sampled_from(_WS), min_size=1, max_size=6).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), _texts),
        min_size=1,
        max_size=14,
    )
)
def test_exclusive_vocab_matches_model(docs):
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
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["exclusive_vocab_census"].sql).fetchall()
    }
    vocab: dict[str, set[str]] = {}
    for s, t in docs:
        vocab.setdefault(s, set()).update(t.split())
    model = {}
    for s, terms in vocab.items():
        others = set().union(
            *(v for ss, v in vocab.items() if ss != s)
        ) if len(vocab) > 1 else set()
        excl = len(terms - others)
        model[s] = (
            len(terms),
            excl,
            (1_000_000 * excl) // len(terms),
        )
    assert got == model
