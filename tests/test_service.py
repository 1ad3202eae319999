"""M5 service layer — highlight/snippet (F6/F7), phrase match (F4),
autocomplete (§3.3), delete/compact (S7), probes & quirks (P3, W5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docix_spark.analysis.highlight import create_snippet, highlight_field
from docix_spark.corpus import synth_corpus_pdf
from docix_spark.index.build import build_index
from docix_spark.query import service as svc
from docix_spark.query.bm25 import search_topk


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    corpus = spark.createDataFrame(synth_corpus_pdf(200, seed=23))
    return build_index(spark, corpus, f"{tmp_root}/svc_idx", n_buckets=8)


# -- highlight / snippet (pure functions, reference-exact rules) -----------

def test_highlight_marks_matched_terms():
    text = "the Parser calls tokenize then Parser emits tokens"
    frag = highlight_field(text, {"parser"}, 300)
    assert frag == "the <mark>Parser</mark> calls tokenize then <mark>Parser</mark> emits tokens"


def test_highlight_window_and_ellipsis():
    text = "x " * 300 + "needle" + " y" * 300
    frag = highlight_field(text, {"needle"}, 50)
    assert "<mark>needle</mark>" in frag
    assert frag.startswith("...") and frag.endswith("...")
    raw = frag.replace("<mark>", "").replace("</mark>", "").strip(".")
    assert len(raw) <= 52


def test_highlight_no_match_empty():
    assert highlight_field("alpha beta", {"gamma"}, 300) == ""
    assert highlight_field(None, {"gamma"}, 300) == ""


def test_snippet_found_with_context():
    """Exact port of createSnippet (SearchAdapter.java:580-610)."""
    content = "A" * 150 + "needle" + "B" * 150
    s = create_snippet(content, "NEEDLE", 300)
    assert s == "..." + "A" * 100 + "needle" + "B" * 100 + "..."


def test_snippet_not_found_leading_300():
    content = "z" * 400
    assert create_snippet(content, "absent", 300) == "z" * 300 + "..."
    assert create_snippet("short", "absent", 300) == "short"


def test_snippet_no_leading_ellipsis_at_start():
    content = "needle" + "B" * 200
    s = create_snippet(content, "needle", 300)
    assert s == "needle" + "B" * 100 + "..."


# -- phrase matching (positions, Catalyst-side) ----------------------------

def test_phrase_filter_consecutive_only(spark, built):
    """'permission is hereby' occurs in boilerplate docs; reversed order
    must not match."""
    hits = svc.phrase_filter(spark, built, "permission is hereby").toPandas()
    docs = built.docs(spark).select("doc_id", "content").toPandas()
    expect = set(docs[docs.content.str.contains("permission is hereby")].doc_id)
    assert set(hits.doc_id) == expect and len(expect) > 0
    assert svc.phrase_filter(spark, built, "hereby is permission").count() == 0


def test_phrase_filter_single_term(spark, built):
    hits = svc.phrase_filter(spark, built, "uniq_17_0")
    assert hits.count() == 1


# -- autocomplete ----------------------------------------------------------

def test_autocomplete_bigram_loop(spark, built):
    sugg = svc.autocomplete(spark, built, "permission", max_suggestions=5)
    assert 0 < len(sugg) <= 5
    # every suggestion is "word nextWord" with query inside the first word
    for s in sugg:
        w1, w2 = s.split(" ", 1)
        assert "permission" in w1
    assert len(set(sugg)) == len(sugg)  # deduped


def test_autocomplete_validation(spark, built):
    with pytest.raises(ValueError):
        svc.autocomplete(spark, built, "   ")
    with pytest.raises(ValueError):
        svc.autocomplete(spark, built, "q" * 101)


# -- probes / quirks -------------------------------------------------------

def test_document_exists(spark, built):
    some = built.docs(spark).select("doc_id").first().doc_id
    assert svc.document_exists(spark, built, some)
    assert not svc.document_exists(spark, built, "0" * 64)


def test_estimate_total_hits_quirk(spark, built):
    assert svc.estimate_total_hits(spark, built, "permission software") == 1000
    assert svc.estimate_total_hits(spark, built, "qqqq9 zzzz8") == 0


# -- search page shaping ---------------------------------------------------

def test_search_page_shape_and_paging(spark, built):
    p0 = svc.search(spark, built, "permission software", page=0, size=5)
    assert list(p0.results["rank"]) == [1, 2, 3, 4, 5]
    assert p0.has_next and not p0.has_previous
    assert p0.total_hits_estimate == 1000
    assert (p0.results["highlight"].str.contains("<mark>")).all()
    p1 = svc.search(spark, built, "permission software", page=1, size=5)
    assert p1.has_previous
    assert list(p1.results["rank"]) == [6, 7, 8, 9, 10]
    assert set(p0.results.doc_id).isdisjoint(set(p1.results.doc_id))


def test_search_highlight_fallback_snippet(spark, built):
    """A query that only matches via wildcard fallback (mid-token substring,
    beyond fuzzy-AUTO reach) must fall back to the snippet path — unmarked,
    non-empty, with the raw query string in context."""
    page = svc.search(spark, built, "iq_17", page=0, size=3)
    assert len(page.results) > 0
    assert (~page.results["highlight"].str.contains("<mark>")).all()
    assert page.results["highlight"].str.contains("iq_17").all()


# -- delete / compaction (S7) ----------------------------------------------

def test_delete_hides_doc_then_compact_drops_it(spark, built, tmp_root):
    target = search_topk(spark, built, "permission software", size=1,
                         with_metadata=False).first().doc_id
    svc.Tombstones(built).delete(spark, [target])
    try:
        page = svc.search(spark, built, "permission software", page=0, size=10)
        assert target not in set(page.results.doc_id)
        assert not svc.document_exists(spark, built, target)

        # stats unchanged until compaction (Lucene: deletes applied at merge)
        n_before, _ = built.corpus_constants(spark)
        svc.compact(spark, built)
        n_after, _ = built.corpus_constants(spark)
        assert n_after == n_before - 1
        assert built.postings(spark).where(F.col("doc_id") == target).count() == 0
        page2 = svc.search(spark, built, "permission software", page=0, size=10)
        assert target not in set(page2.results.doc_id)
    finally:
        import shutil

        shutil.rmtree(svc.Tombstones(built).path, ignore_errors=True)
