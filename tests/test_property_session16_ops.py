"""Property-based semantics checks for the session-16 operators.

Same methodology as the session-12/13/14 suites: DuckDB oracle SQL over
hypothesis-generated corpora vs independent Python models; the BM25-based
query_string test consumes the oracle's own match-set CTE (already pinned
elsewhere) so it isolates the parse + must/must_not splice logic.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _QS_QUERY,
    _bm25_agg_ctes,
    parse_query_string,
)

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9"]

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


def test_parse_query_string():
    assert parse_query_string("+spark -join hash") == (["spark"], ["join"], ["hash"])
    assert parse_query_string("a +B -C +d") == (["b", "d"], ["c"], ["a"])
    # bare +/- are literal tokens, not operators
    assert parse_query_string("+ - x") == ([], [], ["+", "-", "x"])


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_query_string_search_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["query_string_search"].sql).fetchall()
    must, must_not, should = parse_query_string(_QS_QUERY)
    agg = con.execute(
        _bm25_agg_ctes(must + should) + " SELECT doc_id, score_q6 FROM agg"
    ).fetchall()
    kept = [
        (d, s)
        for d, s in agg
        if all(t in docs[d] for t in must) and not any(t in docs[d] for t in must_not)
    ]
    kept.sort(key=lambda h: (-h[1], h[0]))
    model = [(d, s, i + 1) for i, (d, s) in enumerate(kept[:10])]
    assert got == model


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_source_gram_novelty_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["source_gram_novelty"].sql).fetchall()
    per_src: dict[str, set[str]] = {}
    for i, toks in enumerate(docs):
        grams = {
            " ".join(toks[j : j + 8]) for j in range(len(toks) - 7)
        } if len(toks) >= 8 else set()
        per_src.setdefault(f"src{i % 3}", set()).update(grams)
    owners: dict[str, int] = {}
    for src, grams in per_src.items():
        for g in grams:
            owners[g] = owners.get(g, 0) + 1
    model = []
    for src in sorted(per_src):
        grams = per_src[src]
        if not grams:
            continue
        uniq = sum(owners[g] == 1 for g in grams)
        model.append((src, len(grams), uniq, (uniq * 1_000_000) // len(grams)))
    assert got == model


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_nested_pages_agg_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["nested_pages_agg"].sql).fetchall()
    tok = re.compile(r"[a-z0-9]+")
    model = []
    for i, toks in enumerate(docs):
        text = " ".join(toks).replace("spark", "spark\f")
        pages = text.split("\f")
        counts = [len(tok.findall(p.lower())) for p in pages]
        model.append((i, len(pages), max(counts), sum(counts)))
    assert got == model
