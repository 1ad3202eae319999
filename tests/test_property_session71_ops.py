"""Property-based semantics checks for the session-71 operators.

Models: a cf-band mean-length model, a Pearson model over q3 norms of
injected exact-in-float vectors, and a union-find keep-min dedup-loss
model over the minhash-band graph. DuckDB-only.
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


_W = ["a", "bb", "ccc", "dddd", "eeeee"]
_text = st.lists(st.sampled_from(_W), min_size=0, max_size=10).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_abbreviation_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["abbreviation_law_curve"].sql).fetchall()}
    cf: dict[str, int] = {}
    for t in docs:
        for w in t.split():
            cf[w] = cf.get(w, 0) + 1
    bands: dict[int, list] = {}
    for w, c in cf.items():
        b = c.bit_length() - 1
        cell = bands.setdefault(b, [0, 0, 0])
        cell[0] += 1
        cell[1] += c
        cell[2] += len(w)
    model = {
        b: (c[0], c[1], _round_away(c[2] / float(c[0]) * 1_000_000))
        for b, c in bands.items()
    }
    assert got == model


_comp = st.integers(min_value=-63, max_value=63).map(lambda k: k / 64.0)
_vec = st.lists(_comp, min_size=64, max_size=64)


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_vec, st.integers(min_value=0, max_value=20)), min_size=1, max_size=6
    )
)
def test_norm_doclen_corr_matches_model(rows):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(rows) + 1),
                "embedding": [[1.0] + [0.0] * 63] + [v for v, _ in rows],
            }
        ),
    )
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows) + 1),
                "text": ["q"] + ["w " * n for _, n in rows],
            }
        ),
    )
    n, corr = con.execute(REGISTRY["norm_doclen_corr"].sql).fetchall()[0]
    assert n == len(rows)
    xs = [
        _round_away(1000 * math.sqrt(sum(x * x for x in v))) for v, _ in rows
    ]
    ys = [m for _, m in rows]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    if n < 2 or n * sxx == sx * sx or n * syy == sy * sy:
        assert corr == 0
    else:
        want = _round_away(
            1_000_000
            * (float(n) * sxy - float(sx) * sy)
            / (
                math.sqrt(float(n) * sxx - float(sx) * sx)
                * math.sqrt(float(n) * syy - float(sy) * sy)
            )
        )
        assert corr == want


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not sh:
        return set()
    mh = [min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh) for k in range(4)]
    return {mh[0] + mh[1], mh[2] + mh[3]}


_dup_text = st.lists(
    st.sampled_from(["aa bb cc dd", "aa bb cc", "ee ff gg hh", ""]),
    min_size=1,
    max_size=2,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["sa", "sb"]), _dup_text), min_size=2, max_size=9
    )
)
def test_dedup_loss_matches_unionfind(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [t for _, t in docs],
                "source": [s for s, _ in docs],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["dedup_loss_by_source"].sql).fetchall()}
    bands = [_mh_bands(t) for _, t in docs]
    parent = list(range(len(docs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    clustered = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if bands[i] & bands[j]:
                clustered |= {i, j}
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    cells: dict[str, list[int]] = {}
    for d, (s, t) in enumerate(docs):
        n = len(t.split())
        dropped = 1 if (d in clustered and find(d) != d) else 0
        c = cells.setdefault(s, [0, 0, 0, 0])
        c[0] += 1
        c[1] += n
        c[2] += dropped
        c[3] += dropped * n
    model = {}
    for s, c in cells.items():
        loss = 0 if c[1] == 0 else _round_away(1_000_000.0 * c[3] / c[1])
        model[s] = (c[0], c[1], c[2], c[3], loss)
    assert got == model
