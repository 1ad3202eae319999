"""Session-243 check: taat_accumulator_budget vs an exact set model."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _TAAT_QUERIES
from docix_spark.analysis.tokenizer import tokenize

_W = ["spark", "hash", "join", "dup", "the", "z9"]


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_W), min_size=1, max_size=8),
        min_size=1,
        max_size=20,
    )
)
def test_taat_accumulator_budget_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(docs) + 1), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["taat_accumulator_budget"].sql).fetchall()

    postings = {}
    for d, ws in enumerate(docs, start=1):
        for t in set(tokenize(" ".join(ws))):
            postings.setdefault(t, set()).add(d)
    model = []
    for q, terms in sorted(_TAAT_QUERIES):
        matched = [t for t in set(terms) if t in postings]
        if not matched:
            continue
        scanned = sum(len(postings[t]) for t in matched)
        accs = set().union(*(postings[t] for t in matched))
        model.append(
            (q, len(matched), scanned, len(accs), 10, (1_000_000 * len(accs)) // 10)
        )
    assert got == model
    for _, nt, scanned, accs, _, _ in got:
        # the accumulator union is bounded by the scanned posting mass
        # (terms can share docs, so nt is NOT a lower bound)
        assert 1 <= accs <= scanned
