"""Property-based semantics checks for the session-107 operators.

Models: HLL intersection against a literal register simulation (exact
inclusion-exclusion identity over the three estimates), scan-cost
invariants over injected embeddings, gap entropy against a direct
per-band model. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_ALPHA8 = 0.7213 / (1.0 + 1.079 / 256.0)
_HLL_C = _ALPHA8 * 65536.0 * 9007199254740992.0


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _hll_est(shingles):
    regs: dict[int, int] = {}
    for s in shingles:
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        reg = h % 256
        w = h >> 8
        rnk = 53 if w == 0 else 53 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rnk)
    z = sum(1 << (53 - r) for r in regs.values()) + (256 - len(regs)) * (1 << 53)
    zeros = 256 - len(regs)
    raw = _HLL_C / float(z)
    if raw <= 640.0 and zeros > 0:
        return _round_away(1_000_000 * (256.0 * math.log(256.0 / zeros)))
    return _round_away(1_000_000 * raw)


def _shingles(text):
    ws = text.lower().split()
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


_W3 = ["aa", "bb", "cc", "dd", "ee"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=8).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), _text3),
        min_size=2,
        max_size=10,
    )
)
def test_hll_intersection_matches_model(docs):
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
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["hll_source_intersection"].sql).fetchall()
    }
    per: dict[str, set] = {}
    for s, t in docs:
        per.setdefault(s, set()).update(_shingles(t))
    per = {s: v for s, v in per.items() if v}
    srcs = sorted(per)
    model = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            ea, eb = _hll_est(per[a]), _hll_est(per[b])
            eu = _hll_est(per[a] | per[b])
            model[(a, b)] = (ea + eb - eu, len(per[a] & per[b]), eu)
    assert got == model


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=38, max_value=45))
def test_scan_cost_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["ann_scan_cost_histogram"].sql).fetchall()
    n_queries = len([i for i in range(n) if i % 37 == 0])
    assert sum(c for _, c in rows) == n_queries
    for bucket, c in rows:
        # a query scans at least its own 3 cells' members, at most all
        assert 0 <= bucket <= (n - 1).bit_length()
        assert c >= 1


_WG = ["aa", "bb", "cc"]
_textg = st.lists(st.sampled_from(_WG), min_size=1, max_size=6).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textg, min_size=2, max_size=14))
def test_gap_entropy_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["postings_gap_entropy"].sql).fetchall()
    }
    post: dict[str, list[int]] = {}
    for d, t in enumerate(docs):
        for w in set(t.split()):
            post.setdefault(w, []).append(d)
    bands: dict[int, dict[int, int]] = {}
    for w, ids in post.items():
        ids.sort()
        band = len(ids).bit_length() - 1
        for a, b in zip(ids, ids[1:]):
            cell = bands.setdefault(band, {})
            cell[b - a] = cell.get(b - a, 0) + 1
    model = {}
    for band, gaps in bands.items():
        tot = sum(gaps.values())
        h = sum(
            _round_away(1_000_000 * (-(c / tot) * math.log(c / tot)))
            for c in gaps.values()
        )
        model[band] = (tot, len(gaps), h)
    assert got == model
