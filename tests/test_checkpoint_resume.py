"""M2 — checkpointed build, kill-resume, status rollup (SURVEY.md §5.3).

Mirrors the reference state machine: per-page PENDING → INDEXED/FAILED rows
(V3__Create_indexing_log_table.sql:25-41), retry of failed pages only
(DocumentIndexingService.java:361-378), FULLY/PARTIALLY/FAILED rollup
(DocumentIndexingService.java:250-259).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from docix_spark.corpus import synth_corpus_pdf, with_doc_ids
from docix_spark.index import checkpoint as cp
from docix_spark.index.build import build_index
from docix_spark.query.bm25 import search_topk

N_DOCS = 120
N_PARTS = 8


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(synth_corpus_pdf(N_DOCS, seed=7))


def _fail_parts(parts: set[int], on_attempt: int = 1):
    def hook(part: int, attempt: int) -> None:
        if part in parts and attempt == on_attempt:
            raise RuntimeError(f"injected failure part={part}")

    return hook


def test_fresh_build_fully_indexed(spark, corpus, tmp_path):
    root = str(tmp_path / "idx")
    build = cp.start_build(spark, corpus, root, n_parts=N_PARTS, n_buckets=8)
    assert cp.overall_status(spark, root) == cp.FULLY_INDEXED
    assert cp.indexing_progress(spark, root) == 1.0

    m = cp.build_metrics(spark, root).toPandas()
    assert len(m) == N_PARTS
    assert (m.status == cp.INDEXED).all()
    nonempty = m[m.docs > 0]
    assert (nonempty.postings > 0).all()
    assert (nonempty.docs_per_sec > 0).all()
    assert (nonempty.bytes_out > 0).all()
    assert build.n_parts == N_PARTS


def test_kill_resume_reprocesses_only_failed(spark, corpus, tmp_path):
    root = str(tmp_path / "idx")
    bad = {2, 5}
    cp.start_build(
        spark, corpus, root, n_parts=N_PARTS, n_buckets=8,
        fail_hook=_fail_parts(bad),
    )
    assert cp.overall_status(spark, root) == cp.PARTIALLY_INDEXED
    latest = cp.latest_manifest(spark, root).toPandas().set_index("partition_id")
    failed = set(latest[latest.status == cp.FAILED].index)
    assert failed == bad
    assert all("injected failure" in e for e in latest.loc[sorted(bad), "error"])

    # resume touches ONLY the failed partitions
    redone = cp.resume_build(spark, root)
    assert set(redone) == bad
    assert cp.overall_status(spark, root) == cp.FULLY_INDEXED
    latest2 = cp.latest_manifest(spark, root).toPandas().set_index("partition_id")
    assert (latest2.status == cp.INDEXED).all()
    # untouched partitions keep their attempt-1 rows
    ok = sorted(set(range(N_PARTS)) - bad)
    assert (latest2.loc[ok, "attempt"] == 1).all()
    assert (latest2.loc[sorted(bad), "attempt"] == 2).all()


def test_max_retry_exhaustion(spark, corpus, tmp_path):
    root = str(tmp_path / "idx")
    always = _fail_parts({3}, on_attempt=1)

    def hook(part, attempt):
        if part == 3:
            raise RuntimeError("permanently broken")

    cp.start_build(spark, corpus, root, n_parts=N_PARTS, n_buckets=8, fail_hook=hook)
    assert cp.resume_build(spark, root, fail_hook=hook) == [3]
    assert cp.resume_build(spark, root, fail_hook=hook) == [3]
    # attempt == MAX_RETRY(3) → no longer selected (reference maxRetry=3)
    assert cp.resume_build(spark, root, fail_hook=hook) == []
    assert cp.overall_status(spark, root) == cp.PARTIALLY_INDEXED
    del always


def test_resumed_index_rank_identical_to_oneshot(spark, corpus, tmp_path):
    """A build that failed and resumed must serve results identical to a
    fresh uninterrupted build (idempotent re-index — SearchAdapter.java:118)."""
    root_cp = str(tmp_path / "cp")
    root_os = str(tmp_path / "os")
    cp.start_build(
        spark, corpus, root_cp, n_parts=N_PARTS, n_buckets=8,
        fail_hook=_fail_parts({1, 6}),
    )
    cp.resume_build(spark, root_cp)
    idx_resumed = cp.finalize_index(spark, root_cp)
    idx_fresh = build_index(spark, corpus, root_os, n_buckets=8)

    for q in ["parse_0 index_2", "permission software", "uniq_17_0"]:
        a = [
            (r.doc_id, round(r.score, 6))
            for r in search_topk(spark, idx_resumed, q, size=10, with_metadata=False).collect()
        ]
        b = [
            (r.doc_id, round(r.score, 6))
            for r in search_topk(spark, idx_fresh, q, size=10, with_metadata=False).collect()
        ]
        assert a == b and len(a) > 0


def test_lineage_input_sha(spark, corpus, tmp_path):
    """Manifest lineage: input_sha per partition equals sha256 over the
    sorted doc_ids of that partition's slice (content-sha256 invariant)."""
    root = str(tmp_path / "idx")
    cp.start_build(spark, corpus, root, n_parts=4, n_buckets=8)
    docs = spark.read.parquet(f"{root}/docs").select("build_part", "doc_id").toPandas()
    m = cp.latest_manifest(spark, root).toPandas().set_index("partition_id")
    for part, grp in docs.groupby("build_part"):
        expect = hashlib.sha256("\n".join(sorted(grp.doc_id)).encode()).hexdigest()
        assert m.loc[part, "input_sha"] == expect
    # and doc_id itself is sha2(content,256)
    d = spark.read.parquet(f"{root}/docs").select(
        (F.col("doc_id") == F.sha2(F.col("content"), 256)).alias("ok")
    )
    assert d.where(~F.col("ok")).count() == 0


def test_finalize_with_empty_partitions(spark, tmp_path):
    """A corpus smaller than n_parts leaves build partitions empty; those
    are ledgered INDEXED without a fragment dir — finalize must skip the
    nonexistent paths instead of failing with PATH_NOT_FOUND."""
    tiny = spark.createDataFrame(synth_corpus_pdf(5, seed=99))
    root = str(tmp_path / "idx_empty")
    cp.start_build(spark, tiny, root, n_parts=16, n_buckets=8)
    assert cp.overall_status(spark, root) == cp.FULLY_INDEXED
    idx = cp.finalize_index(spark, root)
    assert idx.docs(spark).count() == 5
    assert idx.postings(spark).count() > 0
