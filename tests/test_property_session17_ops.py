"""Property-based semantics checks for the session-17 dedup diagnostics.

Models: a standalone Python winnowing implementation (4-gram md5 hashes,
window-5 minima, distinct) for containment; exact set Jaccard for the LSH
precision summary (candidates read from the oracle's own pairs CTE, which
winnow/LSH property suites already pin); a bit-level simhash band model
for the hamming histogram.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _SQL_LSH_PAIRS,
    _SIMHASH_CTE,
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


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _winnow_fps(toks: list[str]) -> set[str]:
    if len(toks) < 8:
        return set()
    hs = [_md5(" ".join(toks[i : i + 4])) for i in range(len(toks) - 3)]
    return {min(hs[j : j + 5]) for j in range(len(hs) - 4)}


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_winnow_containment_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["winnow_containment"].sql).fetchall()
    fps = {i: _winnow_fps(t) for i, t in enumerate(docs)}
    model = []
    for a in fps:
        for b in fps:
            if a == b or not fps[a]:
                continue
            shared = len(fps[a] & fps[b])
            if shared and 2 * shared >= len(fps[a]):
                model.append((a, b, shared, len(fps[a]), (shared * 1_000_000) // len(fps[a])))
    model.sort()
    assert got == model
    # self-containment sanity: identical docs contain each other fully
    for a, b, shared, n_a, cq6 in model:
        if docs[a] == docs[b]:
            assert cq6 == 1_000_000


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_lsh_candidate_precision_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["lsh_candidate_precision"].sql).fetchall()
    cand = con.execute(_SQL_LSH_PAIRS + " SELECT doc_a, doc_b FROM pairs").fetchall()
    shingles = {
        i: {" ".join(t[j : j + 3]) for j in range(len(t) - 2)} for i, t in enumerate(docs)
    }
    n_true = 0
    for a, b in cand:
        inter = len(shingles[a] & shingles[b])
        union = len(shingles[a] | shingles[b])
        if union and 2 * inter >= union:
            n_true += 1
    n_cand = len(cand)
    prec = 0 if n_cand == 0 else (n_true * 1_000_000) // n_cand
    assert got == [(n_cand, n_true, prec)]


@settings(max_examples=25, deadline=None)
@given(docs=_corpus)
def test_simhash_hamming_histogram_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["simhash_hamming_histogram"].sql).fetchall()
    sim = dict(
        con.execute(_SIMHASH_CTE + " SELECT doc_id, simhash FROM sh").fetchall()
    )
    hist: Counter = Counter()
    ids = sorted(sim)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            collides = any(
                ((sim[a] >> (15 * j)) & 0x7FFF) == ((sim[b] >> (15 * j)) & 0x7FFF)
                for j in range(4)
            )
            if collides:
                hist[bin(sim[a] ^ sim[b]).count("1")] += 1
    model = sorted(hist.items())
    assert got == model
    # pigeonhole: every true near-dup (hamming <= 3) must be a candidate
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sim[a] ^ sim[b]).count("1") <= 3:
                assert any(
                    ((sim[a] >> (15 * j)) & 0x7FFF) == ((sim[b] >> (15 * j)) & 0x7FFF)
                    for j in range(4)
                )
