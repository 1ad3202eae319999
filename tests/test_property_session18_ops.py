"""Property-based semantics checks for the session-18 operators.

Models: a pure-numpy SQ8 integer codec and a numpy semdedup drop rule
(run against the oracle's OWN k-means assignment, so the test pins the
dedup logic independently of the kmeans chain the ann_ivf suites already
pin); Counter models for rare_terms / multi_terms_agg. DuckDB-only —
ms per example.
"""

from __future__ import annotations

from collections import Counter

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _KMEANS_SQL_PRELUDE,
    _SEMDEDUP_T,
    SQL_TF,
)

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20)
_corpus = st.lists(_doc, min_size=1, max_size=12)

# 64-dim vectors (the ops' fixed dimensionality); >= 9 rows so vec_id 0
# (query) and the 1..8 centroid seeds exist. The semdedup variant is
# positive-orthant: hypothesis shrinks toward 0, and all-zero vectors (or
# cancelling centroid sums) make every norm 0 — NaN cosines diverge
# between engines by construction, and no real embedding is the zero
# vector. SQ8 doesn't normalize, so it keeps mixed signs.
_vec = st.lists(
    st.integers(min_value=-3_000_000, max_value=3_000_000).map(lambda i: i / 1e6),
    min_size=64,
    max_size=64,
)
_vecs = st.lists(_vec, min_size=9, max_size=24)
_vec_pos = st.lists(
    st.integers(min_value=1, max_value=3_000_000).map(lambda i: i / 1e6),
    min_size=64,
    max_size=64,
)
_vecs_pos = st.lists(_vec_pos, min_size=9, max_size=24)


def _doc_con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en" if i % 4 else "de" for i in range(len(docs))],
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


def _emb_con(vecs: list[list[float]]) -> duckdb.DuckDBPyConnection:
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), type=pa.int32()),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", tbl)
    return con


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_rare_terms_matches_model(docs):
    con = _doc_con(docs)
    got = con.execute(REGISTRY["rare_terms"].sql).fetchall()
    df: Counter = Counter()
    for d in docs:
        for t in set(d):
            df[t] += 1
    model = sorted(((t, n) for t, n in df.items() if n <= 2), key=lambda x: (x[1], x[0]))
    assert got == model[:50]


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_multi_terms_agg_matches_model(docs):
    con = _doc_con(docs)
    got = con.execute(REGISTRY["multi_terms_agg"].sql).fetchall()
    buckets: dict[tuple, list[int]] = {}
    for i, d in enumerate(docs):
        key = (f"src{i % 3}", "en" if i % 4 else "de")
        b = buckets.setdefault(key, [0, 0])
        b[0] += 1
        b[1] += len(" ".join(d))
    model = sorted(
        ((s, g, n, c) for (s, g), (n, c) in buckets.items()),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:20]
    assert got == model


def _sq8_model(vecs: list[list[float]]) -> list[tuple]:
    xq = np.round(np.array(vecs[1:], dtype=np.float64) * 1_000_000).astype(np.int64)
    out = []
    for dim in range(64):
        col = xq[:, dim]
        mn, mx = int(col.min()), int(col.max())
        span = mx - mn
        if span == 0:
            rq = np.full_like(col, mn)
        else:
            code = (col - mn) * 255 // span
            rq = mn + code * span // 255
        err = col - rq
        out.append((dim, mn, mx, int((err * err).sum())))
    return out


@settings(max_examples=20, deadline=None)
@given(vecs=_vecs)
def test_sq8_quantization_error_matches_model(vecs):
    con = _emb_con(vecs)
    got = con.execute(REGISTRY["sq8_quantization_error"].sql).fetchall()
    model = _sq8_model(vecs)
    assert got == model
    # reconstruction error is bounded by one code step per element:
    # |err| <= span/255 (+1 for the floor), so sse <= n * (span/255 + 1)^2
    n = len(vecs) - 1
    for (dim, mn, mx, sse), _ in zip(got, model):
        step = (mx - mn) / 255 + 1
        assert sse <= n * step * step


@settings(max_examples=10, deadline=None)
@given(vecs=_vecs_pos)
def test_semdedup_drop_rule_matches_oracle(vecs):
    """Pin the dedup logic against the oracle's OWN kmeans assignment:
    fetch a3 + normalized vectors from the prelude, apply the q6-cosine
    keep-first rule in numpy, compare rollups."""
    con = _emb_con(vecs)
    got = con.execute(REGISTRY["semdedup"].sql).fetchall()
    a3 = dict(con.execute(_KMEANS_SQL_PRELUDE + " SELECT vec_id, cid FROM a3").fetchall())

    # sequential fold like both engines — numpy's pairwise dot differs in
    # the last ulp and can flip the q6 rounding at the threshold boundary
    def _seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    u = {}
    for vid, vec in enumerate(vecs):
        # float32 round-trip: the embeddings column is float32 in the
        # real parquet schema and in _emb_con's arrow table
        v32 = np.array(vec, dtype=np.float32).astype(np.float64).tolist()
        nrm = float(np.sqrt(_seq_dot(v32, v32)))
        u[vid] = [x / nrm for x in v32]
    dropped: set[int] = set()
    ids = sorted(a3)
    for i, va in enumerate(ids):
        for vb in ids[i + 1 :]:
            if a3[va] != a3[vb]:
                continue
            cq6 = int(math.floor(1_000_000 * _seq_dot(u[va], u[vb]) + 0.5))
            if cq6 >= _SEMDEDUP_T:
                dropped.add(vb)
    roll: dict[int, list[int]] = {}
    for vid, cid in a3.items():
        r = roll.setdefault(cid, [0, 0])
        r[0] += 1
        r[1] += vid in dropped
    model = sorted((cid, n, d) for cid, (n, d) in roll.items())
    assert got == model


def test_registry_names_bound():
    for name in ["semdedup", "rare_terms", "multi_terms_agg", "sq8_quantization_error"]:
        assert REGISTRY[name].fn.__name__ == name
