"""Rank-identity harness — the north-rule correctness gate.

Deterministic synthetic corpus + fixed reference query set → the Spark
engine's top-k (doc_id, score) must be rank-identical to the pure-Python
oracle (same composite semantics as the query the reference sends to ES:
best_fields 5/3/3, msm 50%, fuzzy AUTO, wildcard fallback, tiebreak
score desc / doc_id asc — SearchAdapter.java:394-449). Scores compared at
6 decimals (float-sum order differs across partitions — SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from docix_spark.corpus import synth_corpus_pdf, with_doc_ids
from docix_spark.index.build import build_index
from docix_spark.oracle import OracleIndex
from docix_spark.query.bm25 import search_topk

N_DOCS = 120

# Reference query-set coverage classes (FIXTURES.md §2):
QUERIES = [
    "uniq_7_0",                   # single rare term (exact hit)
    "parse_0 build_1",            # common multi-term
    "index_2 uniq_11_0",          # 50% msm edge: one common + one rare
    "parse_0 zzz_nonexistent_term qqq_also_missing wuwu",  # msm filters
    "merge_3",                    # fuzzy 1-edit band neighbors (len 7 → 2 edits)
    "scan",                       # len 4 → 1 edit band
    "module7",                    # filename-only hit (path tokens)
    "kg7/modu",                   # wildcard-fallback-only (substring, not a token)
    "value data",                 # stopword-like high-df identifiers
    "permission granted sublicense",  # license boilerplate (skewed df)
    "get value",                  # short terms, 0-edit band
    "parse_0 parse_0 parse_0 build_1",  # duplicate clauses count + score per ES
]


@pytest.fixture(scope="module")
def corpus_pdf():
    return synth_corpus_pdf(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def eng_index(spark, tmp_root, corpus_pdf):
    corpus = spark.createDataFrame(corpus_pdf)
    return build_index(spark, corpus, f"{tmp_root}/idx_rank", n_buckets=16)


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    docs = []
    for _, r in corpus_pdf.iterrows():
        docs.append(
            {
                "doc_id": hashlib.sha256(r.content.encode()).hexdigest(),
                "content": r.content,
                "file_name": r.path,
                "original_file_name": r.path.rsplit("/", 1)[-1],
            }
        )
    return OracleIndex(docs)


def test_sha256_invariant(spark, eng_index, corpus_pdf):
    """Per-row invariant: indexed doc_id == sha2(source content) for every row
    (BASELINE.json input_hint)."""
    stored = {r.doc_id for r in eng_index.docs(spark).select("doc_id").collect()}
    expected = {hashlib.sha256(c.encode()).hexdigest() for c in corpus_pdf.content}
    assert stored == expected


def test_stats_match_bruteforce(spark, eng_index, oracle):
    n, avgdl = eng_index.corpus_constants(spark, "content")
    assert n == oracle.n_docs["content"]
    assert abs(avgdl - oracle.avgdl["content"]) < 1e-9
    df_rows = {
        (r.field, r.term): r.df for r in eng_index.df_stats(spark).collect()
    }
    assert df_rows == oracle.df


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity(spark, eng_index, oracle, query):
    k = 10
    got = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(spark, eng_index, query, size=k, with_metadata=False).collect()
    ]
    want = [(d, round(s, 6)) for d, s in oracle.search(query, k=k)]
    assert got == want, f"query={query!r}"


def test_match_all_adapter_level(spark, eng_index, oracle):
    """"*" → match_all below validation (SearchAdapter.java:395-397); the
    public path rejects it at the 2-char minimum."""
    with pytest.raises(ValueError):
        search_topk(spark, eng_index, "*", size=5, with_metadata=False)
    got = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(spark, eng_index, "*", size=5, with_metadata=False, validate=False).collect()
    ]
    want = [(d, round(s, 6)) for d, s in oracle.search("*", k=5)]
    assert got == want


def test_pagination_consistency(spark, eng_index, oracle):
    """page 1 of size 5 == results 6-10 of the oracle ranking
    (from = page·size, SearchAdapter.java:446-447)."""
    got = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(spark, eng_index, "parse_0 build_1", page=1, size=5, with_metadata=False).collect()
    ]
    want = [(d, round(s, 6)) for d, s in oracle.search("parse_0 build_1", k=5, page=1)]
    assert got == want


def test_validation_bounds():
    from docix_spark.query.plan import validate_search

    for bad in [("", 0, 10), ("a", 0, 10), ("ok", -1, 10), ("ok", 0, 0), ("ok", 0, 101)]:
        with pytest.raises(ValueError):
            validate_search(*bad)
    validate_search("ok", 0, 100)
