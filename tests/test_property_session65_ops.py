"""Property-based semantics checks for the session-65 operators.

Models: the dispersion identity checked against a BRUTE-FORCE pairwise
sum over the quantized unit vectors (the n² computation the op exists to
avoid), a Pearson degree-correlation model over the minhash-band graph,
and a sorted-list Gini model (the histogram rank decomposition must
equal the textbook sorted formula). DuckDB-only.
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


_comp = st.integers(min_value=-63, max_value=63).map(lambda k: k / 64.0)
_vec = st.lists(_comp, min_size=64, max_size=64).filter(lambda v: any(x != 0 for x in v))


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["sa", "sb"]), _vec), min_size=1, max_size=6
    )
)
def test_dispersion_identity_equals_bruteforce(data):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(data) + 1),
                "embedding": [[1.0] + [0.0] * 63] + [v for _, v in data],
            }
        ),
    )
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(data) + 1),
                "text": ["t"] * (len(data) + 1),
                "source": ["q"] + [s for s, _ in data],
            }
        ),
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(REGISTRY["source_embedding_dispersion"].sql).fetchall()
    }
    by_src: dict[str, list[list[int]]] = {}
    for s, v in data:
        nrm = math.sqrt(sum(x * x for x in v))
        u = [_round_away(1_000_000 * x / nrm) for x in v]
        by_src.setdefault(s, []).append(u)
    model = {}
    for s, us in by_src.items():
        n = len(us)
        if n < 2:
            model[s] = (n, 0)
            continue
        # the n^2 brute force the identity replaces
        tot = 0
        for i in range(n):
            for j in range(n):
                if i != j:
                    tot += sum(a * b for a, b in zip(us[i], us[j]))
        model[s] = (n, _round_away(tot / (float(n) * (n - 1)) / 1_000_000.0))
    assert got == model


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not sh:
        return set()
    mh = [min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh) for k in range(4)]
    return {mh[0] + mh[1], mh[2] + mh[3]}


_dup_text = st.lists(
    st.sampled_from(["aa bb cc dd", "aa bb cc", "ee ff gg hh", "ii jj kk ll"]),
    min_size=1,
    max_size=2,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_dup_text, min_size=2, max_size=9))
def test_assortativity_matches_pearson(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    m, r = con.execute(REGISTRY["lsh_assortativity"].sql).fetchall()[0]
    bands = [_mh_bands(t) for t in docs]
    edges = []
    for i in range(len(docs)):
        for j in range(len(docs)):
            if i != j and bands[i] & bands[j]:
                edges.append((i, j))
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    assert m == len(edges)
    if not edges:
        assert r == 0
        return
    xs = [deg[a] for a, _ in edges]
    ys = [deg[b] for _, b in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    if n * sxx == sx * sx or n * syy == sy * sy:
        assert r == 0
    else:
        want = _round_away(
            1_000_000
            * (float(n) * sxy - float(sx) * sy)
            / (
                math.sqrt(float(n) * sxx - float(sx) * sx)
                * math.sqrt(float(n) * syy - float(sy) * sy)
            )
        )
        assert r == want


@settings(max_examples=50, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=-200, max_value=5000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_gini_matches_sorted_formula(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "value": [c / 100.0 for _, c in evs],
            }
        ),
    )
    n, tot, gini = con.execute(REGISTRY["revenue_gini_users"].sql).fetchall()[0]
    ur: dict[int, int] = {}
    for u, c in evs:
        ur[u] = ur.get(u, 0) + c
    vals = sorted(v for v in ur.values() if v > 0)
    assert (n, tot) == (len(vals), sum(vals))
    if len(vals) < 2 or sum(vals) == 0:
        assert gini == 0
        return
    rw = sum((i + 1) * v for i, v in enumerate(vals))
    want = _round_away(
        1_000_000.0
        * (2.0 * rw / (float(len(vals)) * sum(vals)) - (len(vals) + 1.0) / len(vals))
    )
    assert gini == want
    assert 0 <= gini < 1_000_000
