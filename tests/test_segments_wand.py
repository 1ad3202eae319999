"""M3/M4/M5 — compressed segments, salted term shuffle, block-max WAND
(SURVEY.md §5.1/§5.2): rank identity vs brute force, skew fan-out, pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from docix_spark import BM25_B, BM25_K1
from docix_spark.corpus import synth_corpus_pdf
from docix_spark.index.build import build_index
from docix_spark.index.codec import encode_posting_list
from docix_spark.index.segments import assign_doc_ords, build_segments, shard_fanout
from docix_spark.query.wand import wand_shard, wand_topk

N_DOCS = 400
DOCS_PER_SHARD = 64  # small so the salted shuffle actually fans out


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    root = f"{tmp_root}/seg_idx"
    corpus = spark.createDataFrame(synth_corpus_pdf(N_DOCS, seed=11))
    index = build_index(spark, corpus, root, n_buckets=8)
    seg = build_segments(spark, index, docs_per_shard=DOCS_PER_SHARD)
    return index, seg


def brute_force_topk(spark, index, terms: list[str], k: int, field="content"):
    """Reference scoring straight off the uncompressed postings tables."""
    from collections import Counter

    w = Counter(terms)
    n, avgdl = index.corpus_constants(spark, field)
    post = (
        index.postings(spark)
        .where((F.col("field") == field) & F.col("term").isin(sorted(w)))
        .join(index.df_stats(spark).select("field", "term", "df"), ["field", "term"])
        .toPandas()
    )
    if post.empty:
        return []
    post["wt"] = post["term"].map(w).astype(float)
    idf = np.log(1.0 + (n - post["df"] + 0.5) / (post["df"] + 0.5))
    tfn = post.tf * (BM25_K1 + 1) / (post.tf + BM25_K1 * (1 - BM25_B + BM25_B * post.doc_len / avgdl))
    post["s"] = post["wt"] * idf * tfn
    agg = post.groupby("doc_id")["s"].sum().reset_index()
    agg = agg.sort_values(["s", "doc_id"], ascending=[False, True]).head(k)
    return [(r.doc_id, round(r.s, 6)) for r in agg.itertuples()]


def test_doc_ords_dense_and_ordered(spark, built):
    index, seg = built
    ords = seg.doc_ords(spark).orderBy("doc_ord").toPandas()
    assert list(ords.doc_ord) == list(range(len(ords)))
    assert list(ords.doc_id) == sorted(ords.doc_id)


def test_doc_ords_parallelism_invariant(spark, built):
    """Ordinal assignment is identical at different range-partition counts
    (the resume-at-different-cluster-size guarantee)."""
    index, _ = built
    docs = index.docs(spark)
    a = assign_doc_ords(spark, docs, n_range_parts=2).toPandas().sort_values("doc_id")
    b = assign_doc_ords(spark, docs, n_range_parts=7).toPandas().sort_values("doc_id")
    assert list(a.doc_ord) == list(b.doc_ord)


def test_segments_cover_all_postings(spark, built):
    index, seg = built
    seg_counts = (
        seg.segments(spark).groupBy("field", "term").agg(F.sum("count").alias("n")).toPandas()
    )
    post_counts = (
        index.postings(spark).groupBy("field", "term").agg(F.count("*").alias("n")).toPandas()
    )
    a = seg_counts.sort_values(["field", "term"]).reset_index(drop=True)
    b = post_counts.sort_values(["field", "term"]).reset_index(drop=True)
    assert a.equals(b)


def test_salted_fanout_balances_hot_terms(spark, built):
    """Stopword-like terms (df≈N) must split into many doc-range shards; no
    shard segment may exceed docs_per_shard postings (the skew guarantee)."""
    index, seg = built
    fan = shard_fanout(spark, seg).toPandas().set_index("term")
    hot = fan.loc["software"]  # license boilerplate, df ≈ 0.3·N
    assert hot.n_shards > 1
    maxseg = seg.segments(spark).agg(F.max("count")).collect()[0][0]
    assert maxseg <= DOCS_PER_SHARD
    # rare terms don't pay the salt: single shard
    assert fan.loc["uniq_17_0"].n_shards == 1


@pytest.mark.parametrize(
    "terms,k",
    [
        (["parse_0", "index_2"], 10),
        (["permission", "software"], 10),          # max-skew boilerplate terms
        (["uniq_17_0"], 5),                         # df=1 needle
        (["parse_0", "parse_0", "merge_1"], 10),    # duplicate → weight 2
        (["software", "scan_3", "query_0", "block_1"], 25),
    ],
)
def test_wand_rank_identical_to_brute_force(spark, built, terms, k):
    index, seg = built
    expect = brute_force_topk(spark, index, terms, k)
    got = [
        (r.doc_id, round(r.score, 6))
        for r in wand_topk(spark, index, seg, terms, k=k).collect()
    ]
    assert got == expect and len(got) > 0


def test_wand_unknown_term_empty(spark, built):
    index, seg = built
    assert wand_topk(spark, index, seg, ["zzz_not_a_term"], k=5).count() == 0


def test_wand_shard_pruning_skips_blocks():
    """With one dominant rare term and a huge flat common list, block-max
    pruning must decode only a fraction of the common term's blocks."""
    rng = np.random.default_rng(5)
    n_common = 20_000
    common_ords = np.arange(n_common, dtype=np.int64)
    common_tfs = np.ones(n_common, dtype=np.int64)
    dls = np.full(n_common, 100, dtype=np.int64)
    common = encode_posting_list(common_ords, common_tfs, dls)
    rare_ords = np.sort(rng.choice(n_common, 40, replace=False)).astype(np.int64)
    rare = encode_posting_list(rare_ords, np.full(40, 5, dtype=np.int64),
                               np.full(40, 100, dtype=np.int64))
    segs = [
        {**common, "weight": 1.0, "idf": 0.05, "avgdl": 100.0},
        {**rare, "weight": 1.0, "idf": 6.0, "avgdl": 100.0},
    ]
    ords, scores, stats = wand_shard(segs, k=10, k1=1.2, b=0.75)
    assert stats.blocks_decoded < stats.blocks_total * 0.6
    assert stats.skip_ratio > 0.4

    # exact vs fully-decoded brute force
    from docix_spark.index.codec import bm25_impact

    full = np.zeros(n_common)
    full += bm25_impact(common_tfs, dls, 0.05, 100.0, 1.2, 0.75)
    np.add.at(full, rare_ords, bm25_impact(np.full(40, 5), np.full(40, 100), 6.0, 100.0, 1.2, 0.75))
    order = np.lexsort((np.arange(n_common), -full))[:10]
    assert np.array_equal(ords, order)
    assert np.allclose(scores, full[order])


def test_compression_ratio_recorded(spark, built):
    """Segment bytes must be far below raw 8B/posting for doc stream."""
    index, seg = built
    s = seg.segments(spark).select(
        F.sum(F.length("doc_bytes")).alias("bytes"), F.sum("count").alias("n")
    ).collect()[0]
    assert s.bytes < s.n * 4  # varint gaps ≪ 8-byte ords


def test_extend_segments_matches_full_rebuild(spark, tmp_root):
    """Append-only segment growth: base build + extend with a second doc
    batch must serve the same top-k (rounded scores) as a from-scratch
    segment build over the full index — old rows stay valid because block
    bounds are stats-free (codec docstring)."""
    import pandas as pd

    from docix_spark.corpus import synth_corpus_pdf
    from docix_spark.index.build import build_index, build_postings
    from docix_spark.index.segments import build_segments, extend_segments
    from docix_spark.query.serve import LocalSearcher

    p1 = synth_corpus_pdf(150, seed=91)
    p2 = synth_corpus_pdf(100, seed=92)
    union = pd.concat([p1, p2], ignore_index=True)

    # incremental: index+segments over batch 1, then extend with batch 2
    inc_root = f"{tmp_root}/inc_seg"
    idx_inc = build_index(spark, spark.createDataFrame(union), inc_root, n_buckets=8)
    # base segments from batch-1 docs only
    from docix_spark.corpus import with_doc_ids

    b1_ids = {r.doc_id for r in with_doc_ids(spark.createDataFrame(p1)).select("doc_id").distinct().collect()}
    post_all = idx_inc.postings(spark)
    post_b1 = post_all.where(F.col("doc_id").isin(sorted(b1_ids)))
    post_b2 = post_all.join(post_b1.select("doc_id").distinct(), "doc_id", "left_anti")

    import shutil

    # build base segments over batch-1 postings via a temp index view
    seg = build_segments(spark, idx_inc, docs_per_shard=64)
    # rebuild base from scratch restricted to b1: easier — overwrite
    # segments dir with b1-only segments, then extend with b2
    shutil.rmtree(f"{inc_root}/segments", ignore_errors=True)
    shutil.rmtree(f"{inc_root}/doc_ords", ignore_errors=True)

    class _B1Index:
        n_buckets = idx_inc.n_buckets
        root = idx_inc.root

        def postings(self, s):
            return post_b1

        def docs(self, s):
            return post_b1.select("doc_id").distinct()

    seg = build_segments(spark, _B1Index(), out_root=inc_root, docs_per_shard=64)
    n_added = extend_segments(spark, seg, post_b2)
    assert n_added == post_b2.select("doc_id").distinct().count() > 0

    # fresh: full segment build in a separate dir
    full_root = f"{tmp_root}/full_seg"
    idx_full = build_index(spark, spark.createDataFrame(union), full_root, n_buckets=8)
    build_segments(spark, idx_full, docs_per_shard=64)

    s_inc = LocalSearcher(inc_root)
    s_full = LocalSearcher(full_root)
    for terms in [["permission", "software"], ["parse_0", "merge_1"], ["uniq_17_0"]]:
        a = [(d, round(s, 6)) for d, s in s_inc.search_terms(terms, 10)[0]]
        b = [(d, round(s, 6)) for d, s in s_full.search_terms(terms, 10)[0]]
        assert a == b and len(a) > 0


def test_merge_segments_defragments_and_preserves_ranks(spark, tmp_root):
    """VERDICT r1 missing #5: after extend_segments appends, a (term,
    shard) can hold several rows; merge_segments must collapse every
    (field, term, shard) back to ONE row with wand/serve results
    unchanged."""
    import pandas as pd

    from docix_spark.corpus import synth_corpus_pdf, with_doc_ids
    from docix_spark.index.build import build_index
    from docix_spark.index.segments import build_segments, extend_segments, merge_segments
    from docix_spark.query.serve import LocalSearcher

    p1 = synth_corpus_pdf(120, seed=71)
    p2 = synth_corpus_pdf(80, seed=72)
    union = pd.concat([p1, p2], ignore_index=True)
    root = f"{tmp_root}/merge_seg"
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
    assert extend_segments(spark, seg, post_b2) > 0

    frag = (
        seg.segments(spark).groupBy("field", "term", "shard").count()
        .where(F.col("count") > 1).count()
    )
    assert frag > 0  # the append really fragmented some (term, shard)s

    terms_sets = [["permission", "software"], ["parse_0", "merge_1"], ["uniq_17_0"]]
    before = {
        tuple(ts): [(d, round(s, 6)) for d, s in LocalSearcher(root).search_terms(ts, 10)[0]]
        for ts in terms_sets
    }

    merge_segments(spark, seg)

    frag_after = (
        seg.segments(spark).groupBy("field", "term", "shard").count()
        .where(F.col("count") > 1).count()
    )
    assert frag_after == 0
    after_searcher = LocalSearcher(root)
    for ts in terms_sets:
        assert [(d, round(s, 6)) for d, s in after_searcher.search_terms(ts, 10)[0]] == before[tuple(ts)]


def test_compact_purges_segments(spark, tmp_root):
    """compact() with segments present expunges tombstoned docs from the
    segment postings and the ordinal map — the doc is gone from the
    serving path even after the ledger is dropped."""
    from docix_spark.corpus import synth_corpus_pdf
    from docix_spark.index.build import build_index
    from docix_spark.index.segments import build_segments
    from docix_spark.query.serve import LocalSearcher
    from docix_spark.query.service import Tombstones, compact

    root = f"{tmp_root}/compact_seg"
    idx = build_index(spark, spark.createDataFrame(synth_corpus_pdf(100, seed=81)), root, n_buckets=8)
    build_segments(spark, idx, docs_per_shard=32)

    target = LocalSearcher(root).search_terms(["permission", "software"], 1)[0][0][0]
    Tombstones(idx).delete(spark, [target])
    compact(spark, idx)

    import os

    assert not os.path.exists(Tombstones(idx).path)  # ledger consumed
    s = LocalSearcher(root)
    assert s._dead_ords.size == 0
    hits = [d for d, _ in s.search_terms(["permission", "software"], 10)[0]]
    assert target not in hits and len(hits) > 0
    assert target not in s._doc_to_ord


def test_extend_crash_between_appends_recovers(spark, tmp_root, monkeypatch):
    """ADVICE r2 #2: a crash after the doc_ords append but before the
    segment rows land must NOT silently lose the batch — the intent marker
    plus staged files let the next extend_segments repair it."""
    import os

    import pandas as pd
    import pytest as _pytest

    import docix_spark.index.segments as segmod
    from docix_spark.corpus import synth_corpus_pdf, with_doc_ids
    from docix_spark.index.build import build_index
    from docix_spark.index.segments import build_segments, extend_segments
    from docix_spark.query.serve import LocalSearcher

    p1 = synth_corpus_pdf(80, seed=95)
    p2 = synth_corpus_pdf(50, seed=96)
    union = pd.concat([p1, p2], ignore_index=True)
    root = f"{tmp_root}/crash_seg"
    idx = build_index(spark, spark.createDataFrame(union), root, n_buckets=8)

    b1_ids = {r.doc_id for r in with_doc_ids(spark.createDataFrame(p1)).select("doc_id").distinct().collect()}
    post_all = idx.postings(spark)
    post_b1 = post_all.where(F.col("doc_id").isin(sorted(b1_ids)))
    post_b2 = post_all.join(post_b1.select("doc_id").distinct(), "doc_id", "left_anti")

    import shutil

    shutil.rmtree(f"{root}/segments", ignore_errors=True)
    shutil.rmtree(f"{root}/doc_ords", ignore_errors=True)

    class _B1Index:
        n_buckets = idx.n_buckets
        root = idx.root

        def postings(self, s):
            return post_b1

        def docs(self, s):
            return post_b1.select("doc_id").distinct()

    seg = build_segments(spark, _B1Index(), out_root=root, docs_per_shard=64)
    n_b2 = post_b2.select("doc_id").distinct().count()

    real_publish = segmod._publish_staged_files

    def boom(*a, **k):
        raise RuntimeError("simulated crash between the two appends")

    monkeypatch.setattr(segmod, "_publish_staged_files", boom)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        extend_segments(spark, seg, post_b2)
    # crashed state: doc_ords claims the batch, segments lack its rows
    assert os.path.exists(f"{root}/_extend_intent.json")
    assert seg.doc_ords(spark).count() == len(b1_ids) + n_b2
    monkeypatch.setattr(segmod, "_publish_staged_files", real_publish)

    # the old code's anti-join would return 0 here AND leave the segment
    # rows missing forever; now recover_extend publishes the staged files
    assert extend_segments(spark, seg, post_b2) == 0
    assert not os.path.exists(f"{root}/_extend_intent.json")
    assert not os.path.isdir(f"{root}/_seg_delta_tmp")

    # full-rebuild parity proves zero loss
    full_root = f"{tmp_root}/crash_seg_full"
    idx_full = build_index(spark, spark.createDataFrame(union), full_root, n_buckets=8)
    build_segments(spark, idx_full, docs_per_shard=64)
    s_inc = LocalSearcher(root)
    s_full = LocalSearcher(full_root)
    for terms in [["permission", "software"], ["uniq_17_0"]]:
        a = [(d, round(s, 6)) for d, s in s_inc.search_terms(terms, 10)[0]]
        b = [(d, round(s, 6)) for d, s in s_full.search_terms(terms, 10)[0]]
        assert a == b and len(a) > 0
