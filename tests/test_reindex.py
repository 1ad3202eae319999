"""Reindex orchestration (VERDICT r1 missing #4): reindex-missing driven by
the consistency anti-join, and per-path delete→re-extract→re-index with the
reference's immediate-delete / deferred-purge semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from docix_spark.corpus import CORPUS_COLUMNS, synth_corpus_pdf, with_doc_ids
from docix_spark.index.build import build_index
from docix_spark.index.reindex import reindex_missing, reindex_paths
from docix_spark.query.bm25 import search_topk
from docix_spark.query.service import Tombstones, compact


def test_reindex_missing_matches_fresh_build(spark, tmp_root):
    p1 = synth_corpus_pdf(120, seed=201)
    p2 = synth_corpus_pdf(60, seed=202)
    union = pd.concat([p1, p2], ignore_index=True)

    root = f"{tmp_root}/reindex_idx"
    idx = build_index(spark, spark.createDataFrame(p1), root, n_buckets=8)
    processed = spark.createDataFrame(union)

    n = reindex_missing(spark, idx, processed)
    expect_new = (
        with_doc_ids(spark.createDataFrame(union)).select("doc_id").distinct().count()
        - with_doc_ids(spark.createDataFrame(p1)).select("doc_id").distinct().count()
    )
    assert n == expect_new > 0
    # idempotent: a second pass finds nothing missing
    assert reindex_missing(spark, idx, processed) == 0

    fresh = build_index(spark, spark.createDataFrame(union), f"{tmp_root}/reindex_fresh", n_buckets=8)
    for q in ["permission software", "parse_0 index_2", "uniq_17_0"]:
        a = [
            (r.doc_id, round(r.score, 6))
            for r in search_topk(spark, idx, q, size=10, with_metadata=False).collect()
        ]
        b = [
            (r.doc_id, round(r.score, 6))
            for r in search_topk(spark, fresh, q, size=10, with_metadata=False).collect()
        ]
        assert a == b and len(a) > 0


def test_reindex_paths_replaces_changed_content(spark, tmp_root):
    p1 = synth_corpus_pdf(100, seed=203)
    root = f"{tmp_root}/reindex_paths_idx"
    idx = build_index(spark, spark.createDataFrame(p1), root, n_buckets=8)

    # replace one file's content (same path), keep another unchanged
    changed = p1.iloc[[3]].copy()
    old_content = changed.iloc[0]["content"]
    changed.loc[changed.index[0], "content"] = "completely reextracted zyzzyva_token content"
    unchanged = p1.iloc[[5]].copy()
    repl = spark.createDataFrame(
        pd.concat([changed, unchanged], ignore_index=True)[CORPUS_COLUMNS]
    )

    out = reindex_paths(spark, idx, repl)
    assert out == {"deleted": 1, "indexed": 1}

    dead = Tombstones(idx).read(spark)
    hits = search_topk(
        spark, idx, "zyzzyva_token", size=5, with_metadata=False, exclude=dead
    ).collect()
    assert len(hits) == 1
    import hashlib

    old_id = hashlib.sha256(old_content.encode()).hexdigest()
    # the stale version is tombstoned: invisible on the read path
    uniq_q = "uniq_3_0"  # a term of the old content
    vis = search_topk(spark, idx, uniq_q, size=5, with_metadata=False, exclude=dead).collect()
    assert old_id not in {r.doc_id for r in vis}

    # physical purge on compaction
    compact(spark, idx)
    assert idx.postings(spark).where(F.col("doc_id") == old_id).count() == 0
    assert idx.docs(spark).where(F.col("doc_id") == old_id).count() == 0


def test_reindex_paths_untombstones_reverted_content(spark, tmp_root):
    """Content X→Y then Y→X before any compact(): sha(X) must come OFF the
    tombstone ledger so the reverted file is visible again, and compaction
    must NOT purge it (ADVICE r2 #1)."""
    p1 = synth_corpus_pdf(60, seed=207)
    root = f"{tmp_root}/reindex_revert_idx"
    idx = build_index(spark, spark.createDataFrame(p1), root, n_buckets=8)

    import hashlib

    orig = p1.iloc[[4]].copy()
    x_content = orig.iloc[0]["content"]
    x_id = hashlib.sha256(x_content.encode()).hexdigest()

    changed = orig.copy()
    changed.loc[changed.index[0], "content"] = "temporary interim revision qqxjzv"
    reindex_paths(spark, idx, spark.createDataFrame(changed[CORPUS_COLUMNS]))
    assert Tombstones(idx).read(spark).where(F.col("doc_id") == x_id).count() == 1

    # revert to the original content
    out = reindex_paths(spark, idx, spark.createDataFrame(orig[CORPUS_COLUMNS]))
    assert out["deleted"] == 1  # the interim revision gets tombstoned
    # sha(X) is no longer tombstoned → visible on the query path again
    assert Tombstones(idx).read(spark).where(F.col("doc_id") == x_id).count() == 0
    from docix_spark.query.service import document_exists

    assert document_exists(spark, idx, x_id)
    dead = Tombstones(idx).read(spark)
    uniq_q = "uniq_4_0"
    # wide window: fuzzy AUTO expands uniq_4_0 to many uniq_*_0 neighbors
    vis = search_topk(spark, idx, uniq_q, size=30, with_metadata=False, exclude=dead).collect()
    assert x_id in {r.doc_id for r in vis}

    # compaction purges only the interim revision, not the reverted content
    compact(spark, idx)
    assert idx.docs(spark).where(F.col("doc_id") == x_id).count() == 1
    vis2 = search_topk(spark, idx, uniq_q, size=30, with_metadata=False).collect()
    assert x_id in {r.doc_id for r in vis2}
