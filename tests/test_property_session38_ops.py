"""Property-based semantics checks for the session-38 operators.

Models: exact 3-gram-shingle Jaccard + drop-larger survivor policy for the
dedup threshold curve (candidates read from the oracle's own pairs CTE —
the session-17 convention), a pure-Python type-token-ratio gate for the
quality ablation curve, and an interval-ladder model for
auto_date_histogram. DuckDB-only — ms per example.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _ADH_LADDER,
    _ADH_TARGET,
    _DEDUP_THRESHOLDS,
    _QUALITY_THRESHOLDS,
    _SQL_LSH_PAIRS,
)

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30)
_corpus = st.lists(_doc, min_size=1, max_size=10)


def _con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


# ---------------------------------------------------------------------------
# dedup_threshold_curve — oracle vs exact-Jaccard + drop-larger model, and
# the sweep must be monotone non-increasing in the threshold
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_dedup_threshold_curve_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["dedup_threshold_curve"].sql).fetchall()
    cand = con.execute(_SQL_LSH_PAIRS + " SELECT doc_a, doc_b FROM pairs").fetchall()
    shingles = {
        i: {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}
        for i, t in enumerate(docs)
    }
    model = []
    for t in _DEDUP_THRESHOLDS:
        surv = []
        for a, b in cand:
            c = len(shingles[a] & shingles[b])
            union = len(shingles[a]) + len(shingles[b]) - c
            if 100 * c >= t * union:
                surv.append((a, b))
        dropped = {b for _, b in surv}
        model.append((t, len(surv), len(dropped), sum(len(docs[b]) for b in dropped)))
    assert got == model
    # the sweep is monotone: tightening the threshold never admits more
    for (_, p0, d0, k0), (_, p1, d1, k1) in zip(got, got[1:]):
        assert p0 >= p1 and d0 >= d1 and k0 >= k1


# ---------------------------------------------------------------------------
# quality_ablation_curve — oracle vs type-token-ratio gate model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_quality_ablation_curve_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["quality_ablation_curve"].sql).fetchall()
    total = sum(len(d) for d in docs)
    model = []
    for t in _QUALITY_THRESHOLDS:
        kept = [d for d in docs if 100 * len(set(d)) >= t * len(d)]
        tok = sum(len(d) for d in kept)
        share = 0 if total == 0 else (1_000_000 * tok) // total
        model.append((t, len(kept), tok, share))
    assert got == model
    # monotone: a stricter gate never keeps more docs/tokens
    for (_, n0, k0, s0), (_, n1, k1, s1) in zip(got, got[1:]):
        assert n0 >= n1 and k0 >= k1 and s0 >= s1
    # thr=0 is the no-op gate: everything survives
    assert got[0][1] == len(docs) and got[0][2] == total


# ---------------------------------------------------------------------------
# auto_date_histogram — oracle vs ladder model; bucket-count bound and
# event-mass conservation
# ---------------------------------------------------------------------------

# spans from minutes to years so every ladder rung gets picked sometimes
_ts_strategy = st.lists(
    st.integers(min_value=0, max_value=40_000_000_000_000), min_size=1, max_size=60
)


@settings(max_examples=40, deadline=None)
@given(ts=_ts_strategy)
def test_auto_date_histogram_matches_model(ts):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(ts)),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": [i % 5 for i in range(len(ts))],
            "event_type": ["view"] * len(ts),
            "value": [0.0] * len(ts),
            "props": ["{}"] * len(ts),
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(REGISTRY["auto_date_histogram"].sql).fetchall()

    mn, mx = min(ts), max(ts)
    pick = next(
        (i for i in _ADH_LADDER if (mx // i) - (mn // i) + 1 <= _ADH_TARGET), None
    )
    if pick is None:
        assert got == []
        return
    buckets: dict[int, int] = {}
    for t in ts:
        buckets[(t // pick) * pick] = buckets.get((t // pick) * pick, 0) + 1
    model = [(pick, b, n) for b, n in sorted(buckets.items())]
    assert got == model
    assert len(got) <= _ADH_TARGET
    assert sum(n for _, _, n in got) == len(ts)


# ---------------------------------------------------------------------------
# sf0.001 invariants (plain tests, DuckDB on the driver tables): recall@k
# hits are non-decreasing in k (both rankings nest), clip bounds ordered
# ---------------------------------------------------------------------------


def _sf_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet'"
    )
    return con


def test_recall_at_k_hits_monotone_and_bounded():
    rows = _sf_con().execute(REGISTRY["ann_recall_at_k_curve"].sql).fetchall()
    ks = [r[0] for r in rows]
    assert ks == sorted(ks)
    for (k0, nq0, h0, r0), (k1, nq1, h1, r1) in zip(rows, rows[1:]):
        assert nq0 == nq1 and nq0 > 0
        assert h1 >= h0  # nested prefixes: deepening the cut never loses hits
    for k, nq, h, rq6 in rows:
        assert 0 <= h <= k * nq
        assert 0 <= rq6 <= 1_000_000
        assert rq6 == (1_000_000 * h) // (k * nq)


def test_clip_bounds_ordered_per_dim():
    rows = _sf_con().execute(REGISTRY["embedding_dim_clip_bounds"].sql).fetchall()
    by_dim: dict[int, dict[int, int]] = {}
    for dim, p_q6, clip_q6 in rows:
        by_dim.setdefault(dim, {})[p_q6] = clip_q6
    assert len(by_dim) == 64
    for dim, ps in by_dim.items():
        assert set(ps) == {10_000, 990_000}
        assert ps[10_000] <= ps[990_000]
