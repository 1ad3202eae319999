"""Atomic table rewrites (VERDICT r2 missing #1 / next #3): merge and
compaction publish new table versions behind a manifest pointer flip, so a
live searcher keeps answering from its open snapshot until refresh() —
the ES refcounted-segment-commit semantics the reference relies on."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from docix_spark.corpus import synth_corpus_pdf
from docix_spark.index.build import build_index
from docix_spark.index.manifest import read_manifest, resolve, swap_table
from docix_spark.index.segments import SegmentIndex, build_segments, merge_segments
from docix_spark.query.bm25 import search_topk
from docix_spark.query.serve import CompositeSearcher, LocalSearcher
from docix_spark.query.service import Tombstones, compact


def test_swap_table_unit(tmp_root):
    root = f"{tmp_root}/swap_unit"
    os.makedirs(root, exist_ok=True)

    def writer(content):
        def fn(p):
            os.makedirs(p)
            with open(os.path.join(p, "part-0.parquet"), "w") as fh:
                fh.write(content)
        return fn

    p1 = swap_table(root, "t", writer("v1"))
    assert p1.endswith("t__v1") and resolve(root, "t") == p1
    p2 = swap_table(root, "t", writer("v2"))
    assert p2.endswith("t__v2") and resolve(root, "t") == p2
    # previous version retained for open readers, nothing older
    assert os.path.isdir(p1) and os.path.isdir(p2)
    p3 = swap_table(root, "t", writer("v3"))
    assert not os.path.isdir(p1) and os.path.isdir(p2) and os.path.isdir(p3)
    assert read_manifest(root)["t"] == "t__v3"
    # a sibling table whose name is a prefix is never collateral damage
    os.makedirs(os.path.join(root, "t_other"))
    swap_table(root, "t", writer("v4"))
    assert os.path.isdir(os.path.join(root, "t_other"))


def test_searcher_snapshot_survives_merge_and_compact(spark, tmp_root):
    """Hold a searcher open across delete → compact (which swaps postings,
    docs, stats, segments, doc_ords): the open searcher still answers
    EXACTLY its pre-compact results from the retained old version; after
    refresh() it sees the post-compact state, identical to a fresh
    searcher."""
    pdf = synth_corpus_pdf(120, seed=301)
    root = f"{tmp_root}/swap_idx"
    idx = build_index(spark, spark.createDataFrame(pdf), root, n_buckets=8)
    build_segments(spark, idx, docs_per_shard=64)

    searcher = LocalSearcher(root)
    q1 = ["permission", "software"]
    before = [(d, round(s, 6)) for d, s in searcher.search_terms(q1, 10)[0]]
    assert len(before) > 0

    # delete the top hit, then physically purge it via compact
    victim = before[0][0]
    Tombstones(idx).delete(spark, [victim])
    compact(spark, idx)

    # the live tables moved to new versioned dirs
    m = read_manifest(root)
    for t in ("postings", "docs", "df_stats", "corpus_stats", "segments", "doc_ords"):
        assert "__v" in m.get(t, t), t

    # the OPEN searcher still serves its snapshot (victim included), and a
    # term it never touched still resolves from the retained old files
    again = [(d, round(s, 6)) for d, s in searcher.search_terms(q1, 10)[0]]
    assert again == before
    fresh_term = [(d, round(s, 6)) for d, s in searcher.search_terms(["uniq_17_0"], 5)[0]]
    assert len(fresh_term) > 0

    # refresh() re-resolves: now identical to a brand-new searcher, victim gone
    searcher.refresh()
    after = [(d, round(s, 6)) for d, s in searcher.search_terms(q1, 10)[0]]
    fresh = LocalSearcher(root)
    after_fresh = [(d, round(s, 6)) for d, s in fresh.search_terms(q1, 10)[0]]
    assert after == after_fresh
    assert victim not in {d for d, _ in after}

    # the Spark query path resolves the new versions too
    hits = search_topk(spark, idx, "permission software", size=10, with_metadata=False).collect()
    assert victim not in {r.doc_id for r in hits} and len(hits) > 0


def test_composite_searcher_snapshot_across_merge(spark, tmp_root):
    """merge_segments alone (no deletes) swaps the segments table; an open
    CompositeSearcher keeps serving; refresh() picks up the merged table
    with identical ranks (merge is rank-preserving)."""
    pdf = synth_corpus_pdf(100, seed=302)
    root = f"{tmp_root}/swap_merge_idx"
    idx = build_index(spark, spark.createDataFrame(pdf), root, n_buckets=8)
    build_segments(spark, idx, docs_per_shard=64)
    from docix_spark.index.ngram import build_trigram_index

    build_trigram_index(spark, idx)

    searcher = CompositeSearcher(root)
    q = "permission software"
    before = [(d, round(s, 6)) for d, s in searcher.search_composite(q, size=10)]
    assert len(before) > 0

    seg = SegmentIndex.load(root)
    merge_segments(spark, seg)
    assert "__v" in read_manifest(root).get("segments", "segments")

    assert [(d, round(s, 6)) for d, s in searcher.search_composite(q, size=10)] == before
    searcher.refresh()
    assert [(d, round(s, 6)) for d, s in searcher.search_composite(q, size=10)] == before
