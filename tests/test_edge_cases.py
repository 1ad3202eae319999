"""Edge cases: empty corpus, empty/whitespace content, unicode, huge terms,
single-doc corpus — the inputs a 100 TB crawl actually contains."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from docix_spark.analysis.tokenizer import tokenize
from docix_spark.corpus import CORPUS_COLUMNS
from docix_spark.index.build import build_index
from docix_spark.query.bm25 import search_topk
from docix_spark.query.service import autocomplete, estimate_total_hits


def _mk(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=CORPUS_COLUMNS))


@pytest.fixture(scope="module")
def weird_index(spark, tmp_root):
    rows = [
        ("o/r1", "a/empty.txt", "c1", "txt", ""),                      # empty content
        ("o/r1", "a/space.txt", "c2", "txt", "   \n\t  "),             # whitespace only
        ("o/r1", "a/uni.txt", "c3", "txt", "naïve café 中文 emoji 🎉 mixed ascii_term"),
        ("o/r1", "a/huge.txt", "c4", "txt", "x" * 50_000 + " needle_term"),
        ("o/r2", "b/dup1.txt", "c5", "txt", "identical content here"),
        ("o/r2", "b/dup2.txt", "c6", "txt", "identical content here"),  # same sha
        ("o/r2", "b/norm.txt", "c7", "txt", "plain ascii_term document with words"),
    ]
    return build_index(spark, _mk(spark, rows), f"{tmp_root}/weird_idx", n_buckets=4)


def test_tokenizer_unicode_and_empty():
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("   \n\t") == []
    # ASCII tokenizer: non-ascii letters are separators, ascii runs survive
    assert "ascii_term" in tokenize("naïve café 中文 🎉 ascii_term")
    assert tokenize("x" * 50_000)[0] == "x" * 50_000


def test_duplicate_content_collapses(spark, weird_index):
    docs = weird_index.docs(spark)
    assert docs.count() == 6  # 7 rows, one sha-dup pair
    assert docs.where(F.col("content") == "identical content here").count() == 1


def test_empty_docs_not_in_content_stats(spark, weird_index):
    """Docs with no content tokens must not distort avgdl or appear in
    content postings (but still exist for filename matching)."""
    cs = {r.field: r for r in weird_index.corpus_stats(spark).collect()}
    # content field: 4 docs have content tokens (uni, huge, identical, norm)
    assert cs["content"].n_docs == 4
    # empty-content docs still findable by filename
    hits = search_topk(spark, weird_index, "empty", size=5, with_metadata=True)
    assert any("empty.txt" in r.path for r in hits.collect())


def test_search_huge_doc_and_needle(spark, weird_index):
    got = search_topk(spark, weird_index, "needle_term", size=5, with_metadata=False).collect()
    assert len(got) == 1


def test_search_empty_index(spark, tmp_root):
    empty = spark.createDataFrame([], ", ".join(f"{c} string" for c in CORPUS_COLUMNS))
    idx = build_index(spark, empty, f"{tmp_root}/empty_idx", n_buckets=4)
    assert search_topk(spark, idx, "anything here", size=5, with_metadata=False).count() == 0
    assert estimate_total_hits(spark, idx, "anything here") == 0


def test_autocomplete_no_matches(spark, weird_index):
    assert autocomplete(spark, weird_index, "zzzznope") == []


def test_parse_size_reference_semantics():
    """F10: exact parseMaxFileSize behavior (BulkUploadService.java:222-244)
    — binary multiples, bare bytes, 50MB default on null/blank/junk."""
    from docix_spark.config import DEFAULT_MAX_FILE_SIZE, parse_size

    assert parse_size("100MB") == 100 * 1024 * 1024
    assert parse_size("128KB") == 128 * 1024
    assert parse_size("2GB") == 2 * 1024 * 1024 * 1024
    assert parse_size("4096") == 4096
    assert parse_size(None) == DEFAULT_MAX_FILE_SIZE
    assert parse_size("   ") == DEFAULT_MAX_FILE_SIZE
    assert parse_size("12XB") == DEFAULT_MAX_FILE_SIZE
    assert parse_size("notasize") == DEFAULT_MAX_FILE_SIZE
