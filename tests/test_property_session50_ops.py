"""Property-based semantics checks for the session-50 operators.

Models: a Python Laplace-bigram phrase-suggester model (own levenshtein
DP, exact ln replication), and spherical-k-means monotonicity invariants
for the training-convergence curve over the sf0.001 fixture (the mean
direction maximizes within-cell cosine for a fixed assignment, and
re-assignment only improves — so the summed best-assignment cosine must
be non-decreasing across Lloyd rounds, up to q9 rounding slack).
DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _PS_NEXT, _PS_TYPO, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# vocabulary clustered around the typo so candidates actually exist
_PS_VOCAB = ["spak", "spark", "spa", "soak", "peak", "join", "spank", "zzzz"]
_ps_text = st.lists(st.sampled_from(_PS_VOCAB), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_ps_text, min_size=1, max_size=6))
def test_phrase_suggester_matches_lm_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s0"] * len(docs)}
        ),
    )
    got = con.execute(REGISTRY["phrase_suggester"].sql).fetchall()
    # corpus stats
    cf: dict[str, int] = {}
    df: dict[str, int] = {}
    c12: dict[str, int] = {}
    for t in docs:
        ws = t.split()
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
        for i in range(len(ws) - 1):
            if ws[i + 1] == _PS_NEXT:
                c12[ws[i]] = c12.get(ws[i], 0) + 1
    v = len(cf)
    cands = []
    for term in cf:
        d = _lev(_PS_TYPO, term)
        if 1 <= d <= 2:
            s = _round_away(
                1_000_000 * math.log((c12.get(term, 0) + 1) / float(cf[term] + v))
            )
            cands.append((term, d, df[term], c12.get(term, 0), s))
    cands.sort(key=lambda r: (-r[4], r[1], r[0]))
    model = [(t, d, dfv, c, s, i + 1) for i, (t, d, dfv, c, s) in enumerate(cands[:5])]
    assert got == model


def test_phrase_suggester_context_beats_distance():
    """A distance-2 candidate that DOES precede 'join' must outrank a
    distance-1 candidate that never does — the context-awareness that
    separates the phrase suggester from spell_correct."""
    docs = ["spark join spark join spark join", "spak alone", "spa alone spa alone"]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(3), "text": docs, "source": ["s"] * 3}),
    )
    rows = con.execute(REGISTRY["phrase_suggester"].sql).fetchall()
    by_term = {r[0]: r[5] for r in rows}
    assert by_term["spark"] < by_term["spa"]  # lower rank number = better


def test_ivf_convergence_invariants_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet'"
    )
    rows = con.execute(REGISTRY["ivf_train_convergence"].sql).fetchall()
    assert [r[0] for r in rows] == [1, 2, 3]
    n_vecs = {r[1] for r in rows}
    assert len(n_vecs) == 1  # every round assigns every vector
    (n_vec,) = n_vecs
    s1, s2, s3 = (r[2] for r in rows)
    # spherical-k-means objective is non-decreasing; allow 1 q9 ulp per
    # vector of rounding slack
    assert s2 >= s1 - n_vec and s3 >= s2 - n_vec
    ch = [r[3] for r in rows]
    assert ch[0] == -1 and ch[1] >= 0 and ch[2] >= 0
    assert ch[1] <= n_vec and ch[2] <= n_vec
