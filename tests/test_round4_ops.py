"""Round-4 scale-correctness guards (VERDICT r3 "Next round" #1/#3/#5):

- connected components converge on adversarial chain-shaped graphs
  (diameter ≫ the old 15-round cap) and RAISE instead of silently
  mislabeling when the budget is genuinely exhausted;
- pack_sequences' two-pass sub-sharded prefix sum is byte-identical to
  the single-window form AND its doc-level window really is sub-sharded
  (the plan assertion a small-scale run can check);
- the reindex paths never collect doc ids to the driver.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# connected components: pointer doubling + bounded-correct
# ---------------------------------------------------------------------------

def _chain_edges(spark, n: int):
    """0-1-2-...-n chain (diameter n), both directions."""
    rows = [(i, i + 1) for i in range(n)]
    e = spark.createDataFrame(rows, "src long, dst long")
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _init_labels(edges):
    return (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )


def test_cc_chain_deeper_than_old_cap(spark):
    """A diameter-120 chain: plain min-label propagation needs 120 rounds
    (the r3 loop silently mislabeled past 15); pointer doubling converges
    in O(log 120) ≈ 7 — well inside max_rounds=20 — with every node
    labeled 0."""
    from docix_spark.driver_queries import connected_components

    edges = _chain_edges(spark, 120).localCheckpoint()
    labels = connected_components(_init_labels(edges), edges, max_rounds=20)
    got = {(r.doc_id, r.lbl) for r in labels.collect()}
    assert got == {(i, 0) for i in range(121)}


def test_cc_two_components_and_selfcontained(spark):
    """Two disjoint chains keep distinct min labels."""
    from docix_spark.driver_queries import connected_components

    a = _chain_edges(spark, 20)
    b = _chain_edges(spark, 20).select(
        (F.col("src") + 1000).alias("src"), (F.col("dst") + 1000).alias("dst")
    )
    edges = a.unionByName(b).localCheckpoint()
    labels = connected_components(_init_labels(edges), edges, max_rounds=20)
    pdf = labels.toPandas()
    assert set(pdf.lbl[pdf.doc_id < 1000]) == {0}
    assert set(pdf.lbl[pdf.doc_id >= 1000]) == {1000}


def test_cc_raises_instead_of_wrong_labels(spark):
    """Exhausting the round budget RAISES — unconverged labels can never
    escape (the r3 silent-cap bug made wrong output possible)."""
    from docix_spark.driver_queries import ConvergenceError, connected_components

    edges = _chain_edges(spark, 200).localCheckpoint()
    with pytest.raises(ConvergenceError):
        connected_components(_init_labels(edges), edges, max_rounds=2)


# ---------------------------------------------------------------------------
# pack_sequences: distributed two-pass == single window, plan sub-sharded
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def packed(spark):
    from docix_spark.driver_queries import pack_sequences

    # n_shards=7 (odd, forces uneven ranges), bin_tokens=64 (every source
    # spans MANY bins, so a wrong cumulative offset anywhere shifts a bin
    # boundary — at the driver's 2048 default the sandbox corpus fits in
    # bin 0 and boundary errors would be invisible)
    return pack_sequences(spark, SF_DIR, n_shards=7, bin_tokens=64)


def test_pack_sequences_matches_single_window(spark, packed):
    """The sub-sharded two-pass prefix sum must be BYTE-IDENTICAL to one
    whole-source window (the definitional form / the DuckDB oracle)."""
    from docix_spark.analysis.tokenizer import spark_tokens

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t = d.select(
        "doc_id", "source", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = (
        t.withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .groupBy(
            "source",
            F.floor(F.col("cum_before") / F.lit(64)).cast("long").alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    got = {tuple(r) for r in packed.collect()}
    assert got == {tuple(r) for r in want.collect()}
    # real boundary coverage: multiple bins per source
    assert len({(r[0], r[1]) for r in got}) > 3 * len({r[0] for r in got})


def test_pack_sequences_plan_is_subsharded(spark, packed):
    """The doc-level cumsum window must partition by (source, pack_shard) —
    never by source alone over doc rows (the r3 single-reducer window). The
    only source-only window allowed is the one over the per-shard TOTALS
    table, which sits above an Aggregate."""
    plan = packed._jdf.queryExecution().optimizedPlan().toString()
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert specs, plan
    doc_level = [s for s in specs if "n_tok" in s]
    assert doc_level, plan  # the cumsum window over doc rows
    assert all("pack_shard" in s for s in doc_level), plan
    # shard offsets come from an aggregated (vocabulary-sized) table
    assert "shard_tok" in plan, plan


def test_pack_sequences_split_bins_are_exact(spark):
    """GPT-style splitting: every interior bin holds EXACTLY bin_tokens
    tokens (only each source's last bin may be short), and the per-bin
    shares conserve the corpus token total — the two invariants the
    start-offset variant (pack_sequences) cannot satisfy."""
    from docix_spark.analysis.tokenizer import spark_tokens
    from docix_spark.driver_queries import pack_sequences_split

    rows = pack_sequences_split(spark, SF_DIR, n_shards=7, bin_tokens=64).collect()
    last = {}
    for r in rows:
        last[r.source] = max(last.get(r.source, -1), r.bin_id)
    interior = [r for r in rows if r.bin_id < last[r.source]]
    assert interior, rows  # boundaries actually exercised
    assert all(r.n_tokens == 64 for r in interior), [
        r for r in interior if r.n_tokens != 64
    ][:5]
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = d.select(F.sum(F.size(spark_tokens("text"))).alias("s")).first().s
    assert sum(r.n_tokens for r in rows) == total
    # split actually happened: membership rows exceed non-empty doc count
    n_docs = d.where(F.size(spark_tokens("text")) >= 1).count()
    assert sum(r.n_docs for r in rows) > n_docs
    # the same sub-sharded plan guarantee as pack_sequences
    plan = (
        pack_sequences_split(spark, SF_DIR, n_shards=7, bin_tokens=64)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    doc_level = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition(" in ln and "n_tok" in ln
    ]
    assert doc_level and all("pack_shard" in s for s in doc_level), plan


# ---------------------------------------------------------------------------
# batch ANN: plan shape
# ---------------------------------------------------------------------------

def test_ann_batch_plan_broadcasts_probe(spark):
    """The (qid, cid, qv) probe table and the trained centroids must land
    on the BUILD side of broadcast joins — the members scan streams. A
    shuffle of the corpus keyed on anything but cid would not survive
    10^9 vectors."""
    from docix_spark.driver_queries import REGISTRY

    df = REGISTRY["ann_ivf_batch"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# reindex: no driver-side doc-id funnels
# ---------------------------------------------------------------------------

def test_reindex_source_never_collects_doc_ids():
    """reindex_missing/reindex_paths keep every doc-id set distributed
    (VERDICT r3 wrong #3): the module must not contain a .collect() at
    all — counts are scalar aggs, ledger appends are DataFrame writes."""
    import inspect

    import docix_spark.index.reindex as rx

    src = inspect.getsource(rx)
    assert ".collect()" not in src


# ---------------------------------------------------------------------------
# events_funnel: step order is causal, not just presence
# ---------------------------------------------------------------------------

def test_events_funnel_order_matters(spark):
    """A click BEFORE any view must not advance the funnel, and a purchase
    between the first view and the first qualifying click must not count —
    the dependent-min semantics that a naive presence pivot gets wrong."""
    import datetime as dt

    from docix_spark.driver_queries import events_funnel

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # u1: clean view(1) -> click(2) -> purchase(3): completes all steps
        (1, t(1), 1, "view", 0.0, "{}"),
        (2, t(2), 1, "click", 0.0, "{}"),
        (3, t(3), 1, "purchase", 0.0, "{}"),
        # u2: click(1) BEFORE view(2) -- click must NOT count; no purchase
        (4, t(1), 2, "click", 0.0, "{}"),
        (5, t(2), 2, "view", 0.0, "{}"),
        # u3: view(1) -> purchase(2) -> click(3): purchase precedes the
        # qualifying click, so u3 reaches step 2 only
        (6, t(1), 3, "view", 0.0, "{}"),
        (7, t(2), 3, "purchase", 0.0, "{}"),
        (8, t(3), 3, "click", 0.0, "{}"),
        # u4: purchase only: no step at all
        (9, t(1), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {r.step_name: r.n_users for r in events_funnel(spark, d).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}, got


def test_ann_ivfpq_plan_shape(spark):
    """The composed IVF+PQ must keep the standalone plans' broadcast
    discipline: probe/LUT/query tables broadcast, the corpus-sized sides
    (codes, cell members) meet only on vec_id equi-joins. The only
    cartesian products allowed are the literal 1-row query-vector and
    query-norm cross joins."""
    from docix_spark.driver_queries import REGISTRY

    df = REGISTRY["ann_ivfpq_adc"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # every nested-loop join is a broadcast of a 1-row side (qv/qn), never
    # a partitioned cartesian product of two corpus-sized relations
    assert "CartesianProduct" not in plan, plan


def test_dehinted_joins_still_broadcast_at_small_scale(spark):
    """The unbounded-side joins (funnel stages, survivor labels, pack
    offsets) carry NO broadcast hint — a forced hint cannot back off when
    the side grows corpus-sized. This pins the flip side: at test scale
    AQE's runtime stats still choose a broadcast join, so de-hinting cost
    nothing where broadcasting is right."""
    from docix_spark.driver_queries import REGISTRY

    for name in ("events_funnel", "dedup_survivor_tokens", "pack_sequences"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.collect()  # materialize so AQE finalizes the adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, (name, plan)


def test_pq_index_structure(spark):
    """Structural invariants of the trained PQ index: every non-query
    vector gets exactly one code per subspace (M codes), every code
    references a live codebook entry, and the codebook never exceeds
    M × K entries."""
    from docix_spark.driver_queries import _PQ_K, _PQ_M, _pq_index, _pq_subs

    codes, lut, qn = _pq_index(spark, SF_DIR)
    e, subs = _pq_subs(spark, SF_DIR)
    n_members = e.where(F.col("vec_id") != 0).count()
    pdf = codes.toPandas()
    assert len(pdf) == n_members * _PQ_M
    assert set(pdf.groupby("vec_id").size()) == {_PQ_M}
    lut_pdf = lut.toPandas()
    assert len(lut_pdf) <= _PQ_M * _PQ_K
    # every (m, cid) a code references exists in the LUT
    refs = set(map(tuple, pdf[["m", "cid"]].drop_duplicates().values))
    have = set(map(tuple, lut_pdf[["m", "cid"]].values))
    assert refs <= have, refs - have


# ---------------------------------------------------------------------------
# round-4 session additions: quantiles / surprisal / dup-gram semantics
# (the driver-contract replica proves Spark==DuckDB; these prove both match
# an INDEPENDENT Python/numpy ground truth, guarding shared-bug false passes)
# ---------------------------------------------------------------------------

def _py_token_lists(sf_dir=SF_DIR):
    import pyarrow.parquet as pq

    from docix_spark.analysis.tokenizer import tokenize

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
    return [
        (d, s, tokenize(x))
        for d, s, x in zip(
            t.column("doc_id").to_pylist(),
            t.column("source").to_pylist(),
            t.column("text").to_pylist(),
        )
    ]


def test_doclen_quantiles_matches_numpy(spark):
    """The weighted-histogram quantile must reproduce numpy's type-7
    (method='linear') quantile over the raw per-doc token counts."""
    import numpy as np

    from docix_spark.driver_queries import REGISTRY

    rows = REGISTRY["doclen_quantiles"].fn(spark, SF_DIR).collect()
    by_source: dict[str, list[int]] = {}
    for d, s, toks in _py_token_lists():
        by_source.setdefault(s, []).append(len(toks))
    assert rows, "no output"
    for r in rows:
        p = r.p_q6 / 1_000_000.0
        expect = round(1_000_000.0 * float(np.quantile(np.array(by_source[r.source]), p, method="linear")))
        assert r.q_q6 == expect, (r.source, r.p_q6, r.q_q6, expect)


def test_doclen_quantiles_plan_has_no_raw_value_buffering(spark):
    """The plan must aggregate to the histogram BEFORE any window — no
    `percentile` aggregate (which buffers every group value on one
    reducer) anywhere in the physical plan."""
    from docix_spark.driver_queries import REGISTRY

    plan = REGISTRY["doclen_quantiles"].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()


def test_unigram_logprob_matches_python_lm(spark):
    """Independent Python recomputation of the unigram-LM surprisal.
    Per-term q6 values may differ by 1 micro-nat where Java's and libm's
    ln disagree in the last ulp AND the product lands on a rounding
    boundary; the doc totals therefore get a doc_len-proportional
    tolerance. Integer relations (doc_len, floor-div mean) are exact."""
    import math
    from collections import Counter

    from docix_spark.driver_queries import REGISTRY

    rows = {r.doc_id: r for r in REGISTRY["unigram_logprob"].fn(spark, SF_DIR).collect()}
    tf: dict[int, Counter] = {}
    total = Counter()
    for d, _s, toks in _py_token_lists():
        if toks:
            tf[d] = Counter(toks)
            total.update(toks)
    big_t = float(sum(total.values()))
    nlp_q6 = {t: round(-math.log(c / big_t) * 1_000_000) for t, c in total.items()}
    assert set(rows) == set(tf)
    for d, c in tf.items():
        r = rows[d]
        assert r.doc_len == sum(c.values())
        expect = sum(n * nlp_q6[t] for t, n in c.items())
        assert abs(r.surprisal_q6 - expect) <= r.doc_len, (d, r.surprisal_q6, expect)
        assert r.mean_nlp_q6 == r.surprisal_q6 // r.doc_len


def test_dup_ngram_fraction_matches_python(spark):
    """Independent Python recomputation of the cross-doc 8-gram document
    frequency and the per-doc duplicated fraction."""
    from collections import Counter

    from docix_spark.driver_queries import REGISTRY

    rows = {r.doc_id: r for r in REGISTRY["dup_ngram_fraction"].fn(spark, SF_DIR).collect()}
    grams = {}
    for d, _s, toks in _py_token_lists():
        if len(toks) >= 8:
            grams[d] = {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}
    df = Counter(g for gs in grams.values() for g in gs)
    assert set(rows) == set(grams)
    any_dup = False
    for d, gs in grams.items():
        r = rows[d]
        n_dup = sum(1 for g in gs if df[g] >= 2)
        any_dup = any_dup or n_dup > 0
        assert r.n_grams == len(gs)
        assert r.n_dup_grams == n_dup
        assert r.dup_pct_q6 == round(1_000_000.0 * n_dup / len(gs))
    assert any_dup, "corpus has no cross-doc duplicate grams — test is vacuous"


def test_winnow_fingerprints_match_python_and_guarantee(spark):
    """Independent Python recomputation of the winnowing selection, plus
    the Schleimer-et-al recall guarantee: any two docs sharing a token
    run of length >= w+k-1 = 8 (i.e. any cross-doc duplicate 8-gram)
    must share at least one fingerprint."""
    import hashlib

    from docix_spark.driver_queries import REGISTRY

    k, w = 4, 5
    got: dict[int, set] = {}
    for r in REGISTRY["winnow_fingerprints"].fn(spark, SF_DIR).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    expect: dict[int, set] = {}
    grams8: dict[int, set] = {}
    for d, _s, toks in _py_token_lists():
        if len(toks) < w + k - 1:
            continue
        hs = [
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
            for i in range(len(toks) - k + 1)
        ]
        expect[d] = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
        grams8[d] = {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}
    assert got == expect
    # recall guarantee over every cross-doc duplicated 8-gram pair
    docs = sorted(grams8)
    checked = 0
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            if grams8[a] & grams8[b]:
                assert got[a] & got[b], (a, b)
                checked += 1
    assert checked > 0, "no duplicated 8-gram pairs in corpus — test is vacuous"


def test_code_subtoken_splitter_on_real_identifiers(spark):
    """The camel/snake splitter applied to REAL code identifiers (the
    contract query synthesizes its idents from prose tokens; this drives
    the same Spark expression over actual code naming shapes) against a
    plain-Python model. Documented simple-splitter semantics: acronym
    runs do NOT split internally (HTTPServer -> httpserver), digit-to-
    upper boundaries split (v2Parser -> v2, parser)."""
    import re

    from pyspark.sql import functions as F

    from docix_spark.analysis.tokenizer import TOKEN_PATTERN, spark_tokens

    idents = [
        "camelCaseVar", "snake_case_name", "HTTPServer", "getHTTPResponse",
        "v2Parser", "__dunder_init__", "CONSTANT_NAME", "mixedSnake_caseX",
        "a", "α_βGamma", "id2name3", "x9Y",
    ]

    def py_split(s: str) -> list[str]:
        s = s.replace("_", " ")
        s = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", s)
        return re.findall(TOKEN_PATTERN, s.lower())

    df = spark.createDataFrame([(i,) for i in idents], "ident string").select(
        "ident",
        spark_tokens(
            F.regexp_replace(
                F.regexp_replace("ident", F.lit("_"), F.lit(" ")),
                F.lit("([a-z0-9])([A-Z])"),
                F.lit("$1 $2"),
            )
        ).alias("subs"),
    )
    got = {r.ident: list(r.subs) for r in df.collect()}
    assert got == {i: py_split(i) for i in idents}
    assert got["HTTPServer"] == ["httpserver"]
    assert got["v2Parser"] == ["v2", "parser"]
    assert got["snake_case_name"] == ["snake", "case", "name"]
    # camel boundary class is ASCII-only: β is not in [a-z0-9], so no split
    # before G — both engines and the Python model agree on this.
    assert got["α_βGamma"] == ["α", "βgamma"]
