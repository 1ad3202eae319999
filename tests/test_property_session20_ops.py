"""Property-based semantics checks for the session-20 operators.

Models: brute-force longest-common-token-substring DP over the oracle's
own LSH candidate pairs (the gram-diagonal trick must reproduce it
exactly for spans >= 8); numpy type-7 quantiles for the boxplot pivot;
Counter models for the termvectors point read. DuckDB-only.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _SQL_LSH_PAIRS,
    _TV_DOC_ID,
)

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=24)
_corpus = st.lists(_doc, min_size=1, max_size=12)
# termvectors needs doc_id 42 to exist
_corpus_big = st.lists(_doc, min_size=_TV_DOC_ID + 1, max_size=_TV_DOC_ID + 6)


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


def _lcs_tokens(a: list[str], b: list[str]) -> int:
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


@settings(max_examples=30, deadline=None)
@given(docs=_corpus, run=st.lists(st.sampled_from(_WORDS), min_size=8, max_size=12))
def test_longest_shared_span_matches_lcs(docs, run):
    # plant a shared run so non-trivial spans exist in most examples
    docs = list(docs) + [run + ["x9"], ["dup"] + run]
    con = _con(docs)
    got = con.execute(REGISTRY["longest_shared_span"].sql).fetchall()
    pairs = con.execute(_SQL_LSH_PAIRS + " SELECT doc_a, doc_b FROM pairs").fetchall()
    model = []
    for a, b in sorted(pairs):
        span = _lcs_tokens(docs[a], docs[b])
        if span >= 8:
            model.append((a, b, span))
    assert got == model


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_boxplot_matches_numpy(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["boxplot_doclen"].sql).fetchall()
    lens: dict[str, list[int]] = {}
    for i, d in enumerate(docs):
        lens.setdefault(f"src{i % 3}", []).append(len(d))
    model = []
    for src in sorted(lens):
        arr = np.array(lens[src])
        q1, q2, q3 = (
            round(1_000_000.0 * float(np.quantile(arr, p, method="linear")))
            for p in (0.25, 0.5, 0.75)
        )
        model.append((src, q1, q2, q3, q3 - q1))
    assert got == model


@settings(max_examples=25, deadline=None)
@given(docs=_corpus_big)
def test_term_vectors_doc_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["term_vectors_doc"].sql).fetchall()
    tf = Counter(docs[_TV_DOC_ID])
    df: Counter = Counter()
    for d in docs:
        for t in set(d):
            df[t] += 1
    first = {}
    for i, t in enumerate(docs[_TV_DOC_ID]):
        first.setdefault(t, i)
    model = sorted((t, n, df[t], first[t]) for t, n in tf.items())
    assert got == model


def test_registry_names_bound():
    for name in ["longest_shared_span", "boxplot_doclen", "term_vectors_doc"]:
        assert REGISTRY[name].fn.__name__ == name
