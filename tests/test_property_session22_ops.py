"""Property-based semantics checks for the session-22 operators.

Models: a numpy greedy farthest-point traversal with the ops' exact
q9-cosine decision rule (including the 2-approximation invariant that
each pick's max-cos is non-decreasing over rounds), and a numpy norm-QA
z^2 model. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _KCENTER_K

_vec_pos = st.lists(
    st.integers(min_value=1, max_value=3_000_000).map(lambda i: i / 1e6),
    min_size=64,
    max_size=64,
)
_vecs_pos = st.lists(_vec_pos, min_size=9, max_size=24)
_vec = st.lists(
    st.integers(min_value=-3_000_000, max_value=3_000_000).map(lambda i: i / 1e6),
    min_size=64,
    max_size=64,
)
_vecs = st.lists(_vec, min_size=3, max_size=24)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


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


def _seq_dot(a: list[float], b: list[float]) -> float:
    # both engines fold left-to-right (Spark aggregate(), DuckDB
    # list_dot_product); numpy's pairwise/SIMD summation differs in the
    # last ulp and flips q9 roundings — the model must accumulate
    # sequentially
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _seq_norm(v: list[float]) -> list[float]:
    n = math.sqrt(_seq_dot(v, v))
    return [x / n for x in v]


@settings(max_examples=15, deadline=None)
@given(vecs=_vecs_pos)
def test_kcenter_matches_model(vecs):
    con = _emb_con(vecs)
    got = con.execute(REGISTRY["kcenter_coreset"].sql).fetchall()
    # the embeddings column is float32 (the real parquet schema) — the
    # model must see the same float32-rounded values the engines read
    vecs32 = [np.array(v, dtype=np.float32).astype(np.float64).tolist() for v in vecs]
    u = [_seq_norm(v) for v in vecs32]
    members = list(range(1, len(vecs)))
    mc = {
        m: _round_away(1_000_000_000 * _seq_dot(u[m], u[1])) for m in members if m != 1
    }
    model = [(0, 1, 1_000_000_000)]
    for i in range(1, _KCENTER_K):
        pick = min(mc, key=lambda m: (mc[m], m))
        model.append((i, pick, mc[pick]))
        mc.pop(pick)
        for m in mc:
            mc[m] = max(mc[m], _round_away(1_000_000_000 * _seq_dot(u[m], u[pick])))
    assert got == model
    # greedy invariant: the max-cos at selection is non-decreasing
    # (each later pick is at most as far from the chosen set)
    sels = [r[2] for r in got[1:]]
    assert sels == sorted(sels)


@settings(max_examples=25, deadline=None)
@given(vecs=_vecs)
def test_embedding_norm_outliers_matches_model(vecs):
    con = _emb_con(vecs)
    got = con.execute(REGISTRY["embedding_norm_outliers"].sql).fetchall()
    n2m = {}
    for vid, vec in enumerate(vecs):
        if vid == 0:
            continue
        xq = np.round(np.array(vec, dtype=np.float64) * 1_000_000).astype(np.int64)
        n2m[vid] = int((xq * xq).sum()) // 1_000_000_000
    nv = len(n2m)
    s = sum(n2m.values())
    ss = sum(x * x for x in n2m.values())
    model = []
    for vid in sorted(n2m):
        if nv < 2 or nv * ss == s * s:
            z2 = 0
        else:
            dev = (nv * n2m[vid] - s) / nv
            var = (nv * ss - s * s) / (nv * nv)
            z2 = _round_away(1_000_000 * (dev * dev) / var)
        model.append((vid, n2m[vid], z2))
    model.sort(key=lambda r: (-r[2], r[0]))
    assert got == model[:20]


def test_registry_names_bound():
    for name in ["kcenter_coreset", "embedding_norm_outliers"]:
        assert REGISTRY[name].fn.__name__ == name
