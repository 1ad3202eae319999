"""Property-based semantics check for greedy_vocab_coverage: the oracle
replayed against a brute-force greedy max-coverage model, plus the
submodularity invariant (marginal gains never increase)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _GVC_ROUNDS
from docix_spark.analysis.tokenizer import tokenize

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        min_size=1,
        max_size=15,
    )
)
def test_greedy_vocab_coverage_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["greedy_vocab_coverage"].sql).fetchall()

    sets = {i: set(tokenize(" ".join(ws))) for i, ws in enumerate(docs)}
    vocab = set().union(*sets.values())
    covered = set()
    model = []
    for r in range(1, _GVC_ROUNDS + 1):
        gains = {
            i: len(s - covered) for i, s in sets.items() if len(s - covered) > 0
        }
        if not gains:
            break
        doc = min(gains, key=lambda i: (-gains[i], i))
        covered |= sets[doc]
        model.append(
            (
                r,
                doc,
                gains[doc],
                len(covered),
                (1000000 * len(covered)) // max(len(vocab), 1),
            )
        )
    assert got == model
    # submodularity: marginal gains are nonincreasing
    gs = [m[2] for m in model]
    assert all(a >= b for a, b in zip(gs, gs[1:]))
    # final coverage never exceeds the vocabulary
    if model:
        assert model[-1][3] <= len(vocab)
