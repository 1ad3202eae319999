"""Property-based semantics checks for the session-198 operators.

DuckDB-only (oracle SQL vs exact Python models).
zorder_pruning_estimate: Morton interleave + all four layouts replayed in
Python over dense-id corpora; quantile_sketch_error: exact type-7 and the
32-bin equi-width sketch mirrored with identical double expression order;
tiered_index_plan: exact posting-count model + the df≤1 tier==full
identity (float score columns are bounds-checked, not value-matched —
the BM25 sum is a float op).
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


_LANGS = ["de", "en", "es", "fr", "zh"]
_RG = 64


def _interleave(a: int, b: int) -> int:
    z = 0
    for i in range(4):
        z += ((a >> i) & 1) * (1 << (2 * i + 1)) + ((b >> i) & 1) * (1 << (2 * i))
    return z


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(_LANGS), st.integers(min_value=0, max_value=600)
        ),
        min_size=1,
        max_size=200,
    )
)
def test_zorder_pruning_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [l for l, _ in docs],
                "n_chars": [n for _, n in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["zorder_pruning_estimate"].sql).fetchall()
    }

    langs = sorted({l for l, _ in docs})
    la = {l: min(15, i) for i, l in enumerate(langs)}
    rows = []
    for i, (l, n) in enumerate(docs):
        lb = min(15, max(n, 1).bit_length() - 1)
        m = l == "en" and lb in (6, 7)
        rows.append((i, l, lb, _interleave(la[l], lb), m))

    def layout(key):
        order = sorted(rows, key=lambda r: (key(r), r[0]))
        grp = {}
        for pos, r in enumerate(order):
            grp.setdefault(pos // _RG, []).append(r[4])
        n_groups = len(grp)
        touched = sum(1 for ms in grp.values() if any(ms))
        return (n_groups, touched, (1000000 * touched) // max(n_groups, 1))

    model = {
        "doc_id_order": None,
        "lang_sorted": layout(lambda r: r[1]),
        "len_sorted": layout(lambda r: r[2]),
        "zorder": layout(lambda r: r[3]),
    }
    # doc_id layout groups directly by the dense id
    grp = {}
    for r in rows:
        grp.setdefault(r[0] // _RG, []).append(r[4])
    touched = sum(1 for ms in grp.values() if any(ms))
    model["doc_id_order"] = (
        len(grp),
        touched,
        (1000000 * touched) // max(len(grp), 1),
    )
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=800), min_size=1, max_size=60)
)
def test_quantile_sketch_error_matches_model(vals):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"n_chars": vals}))
    got = con.execute(REGISTRY["quantile_sketch_error"].sql).fetchall()

    s = sorted(vals)
    n, mn, mx = len(s), min(s), max(s)
    w = mx - mn + 1
    cnt = {}
    for v in s:
        b = min(31, ((v - mn) * 32) // w)
        cnt[b] = cnt.get(b, 0) + 1
    bins = sorted(cnt)
    cbs, run = {}, 0
    for b in bins:
        cbs[b] = run
        run += cnt[b]
    model = []
    for p in (100000, 250000, 500000, 750000, 900000):
        x = (n - 1) * p
        r = x // 1000000
        v_lo, v_hi = s[r], s[min(r + 1, n - 1)]
        exact = _round_away(
            1000000.0 * (v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo))
        )
        bsel = next(
            b for b in bins if 1000000 * cbs[b] <= x < 1000000 * (cbs[b] + cnt[b])
        )
        est = (mn + (bsel * w) / 32.0) + (
            (x - 1000000 * cbs[bsel]) / (1000000.0 * cnt[bsel])
        ) * (w / 32.0)
        sketch = _round_away(1000000.0 * est)
        model.append((p, exact, sketch, sketch - exact))
    assert got == model


_FILLER = ["alpha", "beta", "gamma", "delta"]
_QTERMS = ["spark", "hash", "join"]


def _run_tiered(texts):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    row = con.execute(REGISTRY["tiered_index_plan"].sql).fetchall()
    assert len(row) == 1
    return row[0]


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(_FILLER + _QTERMS), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=15,
    )
)
def test_tiered_index_counts_and_bounds(docs):
    texts = [" ".join(ws) for ws in docs]
    n_full, n_tier, overlap, sum_full, sum_tier = _run_tiered(texts)

    dfs = {
        t: sum(1 for ws in docs if t in ws) for t in _QTERMS
    }
    exp_full = sum(dfs.values())
    exp_tier = sum((df + 3) // 4 for df in dfs.values() if df > 0)
    n_matched_docs = sum(1 for ws in docs if any(t in ws for t in _QTERMS))
    assert n_full == exp_full
    assert n_tier == exp_tier
    assert 0 <= overlap <= min(10, n_matched_docs)
    assert n_tier <= n_full
    if exp_full == 0:
        assert (overlap, sum_full, sum_tier) == (0, 0, 0)


@settings(max_examples=15, deadline=None)
@given(
    fillers=st.lists(
        st.lists(st.sampled_from(_FILLER), min_size=1, max_size=8),
        min_size=1,
        max_size=10,
    ),
    qdoc=st.lists(st.sampled_from(_QTERMS + _FILLER), min_size=1, max_size=8),
)
def test_tiered_identity_when_every_df_is_one(fillers, qdoc):
    """df ≤ 1 per query term ⇒ tier-1 IS the full index ⇒ identical
    rankings: overlap = matched docs (≤10) and equal score sums."""
    texts = [" ".join(ws) for ws in fillers] + [" ".join(qdoc)]
    n_full, n_tier, overlap, sum_full, sum_tier = _run_tiered(texts)
    assert n_tier == n_full
    n_matched = 1 if any(t in qdoc for t in _QTERMS) else 0
    assert overlap == min(10, n_matched)
    assert sum_full == sum_tier
