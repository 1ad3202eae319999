"""Property-based semantics checks for the session-112 operators.

Models: the collision audit against direct hashing, the nearest-
centroid classifier against an exact integer-centroid + q9-cosine
model, the max-tf histogram against direct counting. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_text3, min_size=1, max_size=10))
def test_hash_collision_audit_matches_model(docs):
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
    n_sh, n_h, n_c = con.execute(
        REGISTRY["shingle_hash_collisions"].sql
    ).fetchall()[0]
    shs = set()
    for t in docs:
        ws = t.lower().split()
        shs |= {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    hs = {int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shs}
    assert (n_sh, n_h, n_c) == (len(shs), len(hs), len(shs) - len(hs))


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=10, deadline=None)
@given(data=st.data(), n=st.integers(min_value=7, max_value=15))
def test_centroid_accuracy_matches_model(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    labels = [i % 3 for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(n), "label": labels, "embedding": vecs}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["centroid_classifier_accuracy"].sql
        ).fetchall()
    }
    cents: dict[int, list[int]] = {}
    for lb, v in zip(labels[1:], vecs[1:]):
        c = cents.setdefault(lb, [0] * 64)
        for i, x in enumerate(v):
            c[i] += _round_away(1_000_000 * x)

    def cosq(v, c):
        dv = dc = dd = 0.0
        for x, y in zip(v, c):
            dd += x * float(y)
            dv += x * x
            dc += float(y) * y
        if dc == 0.0:
            return 0
        return _round_away(1_000_000_000 * dd / (math.sqrt(dv) * math.sqrt(dc)))

    model: dict[int, list[int]] = {}
    for lb, v in zip(labels[1:], vecs[1:]):
        best = max(
            sorted(cents), key=lambda cl: (cosq(v, cents[cl]), -cl)
        )
        cell = model.setdefault(lb, [0, 0])
        cell[0] += 1
        cell[1] += 1 if best == lb else 0
    assert got == {
        lb: (nv, nc, (1_000_000 * nc) // nv) for lb, (nv, nc) in model.items()
    }


_textm = st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=10).map(
    " ".join
)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_textm, min_size=1, max_size=12))
def test_maxtf_histogram_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = dict(
        con.execute(REGISTRY["maxtf_ratio_histogram"].sql).fetchall()
    )
    hist = {b: 0 for b in range(10)}
    for t in docs:
        ws = t.split()
        from collections import Counter

        c = Counter(ws)
        mx, n = max(c.values()), len(ws)
        hist[min(((1_000_000 * mx) // n) // 100_000, 9)] += 1
    assert got == hist
