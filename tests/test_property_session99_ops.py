"""Property-based semantics checks for the session-99 operators.

Models: assignment margins on structural invariants over injected
embeddings, label centroids against an exact integer-sum model, and
the leading-token census against direct counting. DuckDB-only.
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


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=8, deadline=None)
@given(data=st.data(), n=st.integers(min_value=15, max_value=25))
def test_assign_margin_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["ivf_assign_margin"].sql).fetchall()
    # every non-query vector has a top-2 margin (K=8 cells exist)
    assert sum(c for _, c in rows) == n - 1
    for bucket, c in rows:
        assert 0 <= bucket <= 20  # q9 cosine gaps live in [0, 2e9]
        assert c >= 1


@settings(max_examples=10, deadline=None)
@given(data=st.data(), n=st.integers(min_value=6, max_value=15))
def test_label_centroids_match_model(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    labels = [i % 3 for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(n), "label": labels, "embedding": vecs}),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["label_centroid_matrix"].sql).fetchall()
    }
    cents: dict[int, list[int]] = {}
    for lb, v in zip(labels[1:], vecs[1:]):  # vec_id 0 excluded
        c = cents.setdefault(lb, [0] * 64)
        for i, x in enumerate(v):
            c[i] += _round_away(1_000_000 * x)
    model = {}
    ls = sorted(cents)
    for i, a in enumerate(ls):
        for b in ls[i + 1 :]:
            ca, cb = cents[a], cents[b]
            nab = 0.0
            naa = 0.0
            nbb = 0.0
            for x, y in zip(ca, cb):  # left-to-right fold
                nab += float(x) * y
                naa += float(x) * x
                nbb += float(y) * y
            if naa == 0.0 or nbb == 0.0:
                model[(a, b)] = 0
            else:
                model[(a, b)] = _round_away(
                    1_000_000 * nab / (math.sqrt(naa) * math.sqrt(nbb))
                )
    assert got == model


_WL = ["aa", "bb", "cc", "dd"]
_textl = st.lists(st.sampled_from(_WL), min_size=0, max_size=6).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_textl, min_size=1, max_size=15))
def test_leading_token_census_matches_model(docs):
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
    got = con.execute(REGISTRY["leading_token_census"].sql).fetchall()
    firsts = [t.split()[0] for t in docs if t.split()]
    if not firsts:
        assert got == []
        return
    from collections import Counter

    c = Counter(firsts)
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    t = len(firsts)
    want = [
        (tok, r, n, (1_000_000 * n) // t)
        for r, (tok, n) in enumerate(rows, start=1)
    ]
    assert got == want
