"""Property-based semantics checks for the session-14 operators.

Same methodology as the session-12/13 suites: drive the DuckDB oracle SQL
over hypothesis-generated corpora and compare against independent Python
models. quality_budget_select uses the `_budget_sql` generator with small
budgets so the cut line actually lands inside the generated corpora (the
registered 12k-token budget never crosses on a 12-doc example).
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _IV_GAPS, _IV_TERMS, _budget_sql

_WORDS = ["the", "a", "of", "spark", "join", "hash", "scan", "x9"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=12)


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
# quality_budget_select — oracle vs a greedy-fill model at budgets that cross
# ---------------------------------------------------------------------------

_STOPS = {"the", "a", "of", "to", "is"}


@settings(max_examples=40, deadline=None)
@given(docs=_corpus, budget=st.integers(1, 120))
def test_quality_budget_select_matches_model(docs, budget):
    con = _con(docs)
    got = con.execute(_budget_sql(budget)).fetchall()
    rows = []
    for i, toks in enumerate(docs):
        n = len(toks)
        stop = sum(t in _STOPS for t in toks)
        q = 0 if n == 0 else (stop * 1_000_000) // n
        rows.append((i, q, n, hashlib.md5(str(i).encode()).hexdigest()))
    rows.sort(key=lambda r: (-r[1], r[3], r[0]))
    model, cum = [], 0
    for doc_id, q, n, _h in rows:
        if cum < budget:
            model.append((doc_id, q, n))
        cum += n
    model.sort()
    assert got == model
    # greedy-fill invariants: admitted tokens minus the crossing doc stay
    # under budget; anything rejected would only push further over
    total = sum(n for _, _, n in model)
    if len(model) < len(rows):
        assert total >= min(budget, sum(n for _, _, n, _ in rows))


# ---------------------------------------------------------------------------
# intervals_unordered — oracle vs a brute-force minimal-window model
# ---------------------------------------------------------------------------

_W = len(_IV_TERMS) - 1 + _IV_GAPS


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_intervals_unordered_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["intervals_unordered"].sql).fetchall()
    model = []
    for i, toks in enumerate(docs):
        pos = {t: [j for j, w in enumerate(toks) if w == t] for t in _IV_TERMS}
        spans = [
            max(a, b, c) - min(a, b, c)
            for a in pos[_IV_TERMS[0]]
            for b in pos[_IV_TERMS[1]]
            for c in pos[_IV_TERMS[2]]
        ]
        ok = [s for s in spans if s <= _W]
        if ok:
            model.append((i, min(ok)))
    assert got == model
