"""Composite serving tier (VERDICT r1 missing #2): CompositeSearcher must
serve the FULL reference query tree (best_fields 5/3/3 + fuzzy AUTO + msm
50% + wildcard fallback) rank-identically to the Spark-job path
(search_topk), at millisecond latency, honoring tombstones."""

from __future__ import annotations

import time

import pytest

from docix_spark.corpus import synth_corpus_pdf
from docix_spark.index.build import build_index
from docix_spark.index.segments import build_segments
from docix_spark.query.bm25 import search_topk
from docix_spark.query.serve import CompositeSearcher

# the rank-identity query classes of test_rank_identity.py
QUERIES = [
    "uniq_7_0",
    "parse_0 build_1",
    "index_2 uniq_11_0",
    "parse_0 zzz_nonexistent_term qqq_also_missing wuwu",
    "merge_3",
    "scan",
    "module7",
    "kg7/modu",
    "value data",
    "permission granted sublicense",
    "get value",
    "parse_0 parse_0 parse_0 build_1",
]


@pytest.fixture(scope="module")
def served(spark, tmp_root):
    root = f"{tmp_root}/comp_idx"
    corpus = spark.createDataFrame(synth_corpus_pdf(120, seed=42))
    index = build_index(spark, corpus, root, n_buckets=16)
    build_segments(spark, index, docs_per_shard=64)
    return index, CompositeSearcher(root)


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical_to_spark_path(spark, served, query):
    index, searcher = served
    got = [(d, round(s, 6)) for d, s in searcher.search_composite(query, size=10)]
    want = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(spark, index, query, size=10, with_metadata=False).collect()
    ]
    assert got == want, f"query={query!r}"


def test_match_all_and_pagination(spark, served):
    index, searcher = served
    got = [(d, round(s, 6)) for d, s in searcher.search_composite("*", size=5, validate=False)]
    want = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(spark, index, "*", size=5, with_metadata=False, validate=False).collect()
    ]
    assert got == want

    g1 = [(d, round(s, 6)) for d, s in searcher.search_composite("parse_0 build_1", page=1, size=5)]
    w1 = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(spark, index, "parse_0 build_1", page=1, size=5, with_metadata=False).collect()
    ]
    assert g1 == w1


def test_validation(served):
    _, searcher = served
    with pytest.raises(ValueError):
        searcher.search_composite(" ")
    with pytest.raises(ValueError):
        searcher.search_composite("ok query", page=-1)


def test_tombstones_respected(spark, served):
    import shutil

    from docix_spark.query.service import Tombstones

    index, searcher = served
    top = searcher.search_composite("permission software", size=10)
    target = top[0][0]
    ts = Tombstones(index)
    try:
        ts.delete(spark, [target])
        searcher.refresh_tombstones()
        after = searcher.search_composite("permission software", size=10)
        assert target not in {d for d, _ in after}
        want = [
            (r.doc_id, round(r.score, 6))
            for r in search_topk(
                spark, index, "permission software", size=10,
                with_metadata=False, exclude=ts.read(spark),
            ).collect()
        ]
        assert [(d, round(s, 6)) for d, s in after] == want
    finally:
        shutil.rmtree(ts.path, ignore_errors=True)
        searcher.refresh_tombstones()


def test_warm_latency_is_milliseconds(served):
    _, searcher = served
    searcher.search_composite("permission software scan_3", size=10)  # warm
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        searcher.search_composite("permission software scan_3", size=10)
    per_query = (time.perf_counter() - t0) / n
    assert per_query < 0.05, f"warm composite serve latency {per_query*1000:.1f} ms"


def test_autocomplete_matches_service_layer(spark, served):
    """Serving-tier autocomplete must reproduce the Spark service-layer
    pipeline (phrase filter → phrase-BM25 order → bigram loop) exactly."""
    from docix_spark.query import service as svc

    index, searcher = served
    for q in ["permission", "parse_0", "software to"]:
        got = searcher.autocomplete(q, max_suggestions=5)
        want = svc.autocomplete(spark, index, q, max_suggestions=5)
        assert got == want, q
    assert searcher.autocomplete("zzz_absent_prefix") == []

    import pytest as _pytest

    with _pytest.raises(ValueError):
        searcher.autocomplete("   ")
    with _pytest.raises(ValueError):
        searcher.autocomplete("q" * 101)


def test_phrase_docs_matches_service_filter(spark, served):
    from docix_spark.query import service as svc

    index, searcher = served
    for phrase in ["permission is hereby", "hereby is permission", "parse_0"]:
        got = searcher.phrase_docs(phrase)
        want = {r.doc_id for r in svc.phrase_filter(spark, index, phrase).collect()}
        assert got == want, phrase


def test_search_page_matches_service_layer(spark, served):
    """The in-process SearchPage (metadata, ranks, highlights, paging
    metadata) must match the Spark service-layer page field-for-field."""
    from docix_spark.query import service as svc

    index, searcher = served
    for q, page in [("permission software", 0), ("permission software", 1), ("kg7/modu", 0)]:
        got = searcher.search_page(q, page=page, size=5)
        want = svc.search(spark, index, q, page=page, size=5)
        assert list(got.results["rank"]) == list(want.results["rank"])
        assert list(got.results["doc_id"]) == list(want.results["doc_id"])
        assert [round(s, 6) for s in got.results["score"]] == [
            round(s, 6) for s in want.results["score"]
        ]
        for col in ["repo", "path", "lang", "file_name", "highlight"]:
            assert list(got.results[col]) == list(want.results[col]), (q, page, col)
        assert (got.has_next, got.has_previous) == (want.has_next, want.has_previous)
        assert got.total_hits_estimate == want.total_hits_estimate
        assert got.highlight_empty_ratio == want.highlight_empty_ratio


def test_composite_fleet_matches_single_node(spark, served):
    """Two CompositeSearcher nodes over disjoint doc-range shard subsets,
    coordinator merge — identical to the single whole-index node for the
    FULL query tree (incl. wildcard-only and fuzzy queries)."""
    from docix_spark.index.segments import SegmentIndex
    from docix_spark.query.serve import fleet_search_composite

    index, searcher = served
    seg = SegmentIndex.load(index.root)
    shards = sorted(
        r.shard for r in seg.segments(spark).select("shard").distinct().collect()
    )
    assert len(shards) >= 2
    half = set(shards[: len(shards) // 2])
    node_a = CompositeSearcher(index.root, shards=half)
    node_b = CompositeSearcher(index.root, shards=set(shards) - half)

    for q in ["permission software", "kg7/modu", "merge_3", "parse_0 build_1"]:
        merged = [
            (d, round(s, 6))
            for d, s in fleet_search_composite([node_a, node_b], q, size=10)
        ]
        single = [(d, round(s, 6)) for d, s in searcher.search_composite(q, size=10)]
        assert merged == single and len(merged) > 0, q
    # pagination through the coordinator
    p1 = [
        (d, round(s, 6))
        for d, s in fleet_search_composite([node_a, node_b], "parse_0 build_1", page=1, size=5)
    ]
    w1 = [(d, round(s, 6)) for d, s in searcher.search_composite("parse_0 build_1", page=1, size=5)]
    assert p1 == w1


def test_composite_gate_prunes_on_skewed_corpus(spark, tmp_root):
    """VERDICT r2 next #4: on a skewed corpus (one selective term + a
    stopword-like term in every doc) the gated composite serving path must
    (a) fire, (b) decode well under half the available blocks, and (c)
    stay rank-identical to the Spark path."""
    import pandas as pd

    from docix_spark.index.build import build_index
    from docix_spark.index.ngram import build_trigram_index
    from docix_spark.index.segments import build_segments
    from docix_spark.query.bm25 import search_topk
    from docix_spark.query.serve import CompositeSearcher

    rng = __import__("numpy").random.default_rng(77)
    rows = []
    n = 8000
    strong = set(rng.choice(n, 200, replace=False).tolist())
    for i in range(n):
        n_fill = int(rng.integers(5, 120))
        body = [f"pad{int(x)}" for x in rng.integers(0, 40, n_fill)]
        body.append("alltoken")  # the stopword: df == N
        if i in strong:
            body.append("strongterm")
        body.append(f"uniqmark{i}")  # defeat content-sha dedup
        rows.append(("r", f"s/{i}.txt", "c", "txt", " ".join(body)))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    root = f"{tmp_root}/skew_idx"
    idx = build_index(spark, spark.createDataFrame(pdf), root, n_buckets=8)
    build_segments(spark, idx, docs_per_shard=1 << 14, block_size=16)
    build_trigram_index(spark, idx)

    comp = CompositeSearcher(root)
    got = [(d, round(s, 6)) for d, s in comp.search_composite("strongterm alltoken", size=10)]
    st = comp.last_stats
    assert st["path"] == "gated", st
    assert st["blocks_total"] > 500  # the corpus really is block-heavy
    ratio = st["blocks_decoded"] / st["blocks_total"]
    assert ratio < 0.5, f"decoded {st['blocks_decoded']}/{st['blocks_total']}"

    want = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(
            spark, idx, "strongterm alltoken", size=10, with_metadata=False
        ).collect()
    ]
    assert got == want and len(got) == 10
