"""Top-k BM25 ranked retrieval as a declarative DataFrame plan.

Scoring spec (the engine's contract, mirrored exactly by the pure-Python
oracle in docix_spark.oracle — rank identity between the two is the north
rule's correctness gate):

    score(q,d,field) = Σ_{t∈q} fuzzy_boost(t,t') · idf(t') · tf(t',d) · (k1+1)
                       / (tf(t',d) + k1·(1 - b + b·|d|_field/avgdl_field))
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),  k1=1.2, b=0.75

(The Lucene BM25 formula with ES defaults — DocIx sets no similarity in its
mapping, reference ElasticsearchDocumentSearchAdapter.java:249-262.)

Composite document score for the reference's query tree
(SearchAdapter.java:394-440, semantics in SURVEY.md §2.8):

    final(d)      = bestfields(d) + fallback(d)            [outer bool, msm=1]
    bestfields(d) = max_field( boost_f · score(q,d,f) )     [best_fields, tie_breaker=0]
                    where field f only counts if d matches >= msm(50%) of the
                    query terms in f                         [msm "50%"]
    fallback(d)   = Σ_f  wboost_f · [lower(f) contains lower(q)]
                                                             [constant-score wildcards]

Fuzzy expansion (fuzziness=AUTO, SearchAdapter.java:407): each query term t
of length>=3 additionally matches dictionary terms t' within
``auto_max_edits(len(t))`` Levenshtein edits, capped at 50 expansions chosen
by (df desc, term asc), contributing with
``fuzzy_boost = 1 - dist/min(len(t), len(t'))`` (the classic Lucene
FuzzyQuery degradation). Exact occurrences always contribute with boost 1.
Where Lucene's blended-frequency rewrite differs in low-level detail, this
engine's spec above is authoritative for both the Spark plan and the oracle,
keeping rank identity well-defined and deterministic (SURVEY.md §7.3).

Tiebreak + pagination: ``ORDER BY score DESC, doc_id ASC`` then
``from = page·size`` (SearchAdapter.java:446-449) — Spark compiles the
orderBy().limit() into TakeOrderedAndProject (no global sort).

Scale notes (100 TB): the postings read is pruned to the term_buckets of the
(expanded) query terms — an explicit driver-side partition filter
(SURVEY.md §4.3); the expanded-terms relation is broadcast; per-doc
aggregation is a partial+final hash agg on doc_id. The segment/WAND path
(docix_spark.index.segments + docix_spark.query.wand) replaces the raw
postings scan for latency-critical serving.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from docix_spark import BM25_B, BM25_K1
from docix_spark.corpus import FIELDS
from docix_spark.index.build import Index, term_bucket
from docix_spark.query.plan import (
    FIELD_BOOSTS,
    MAX_FUZZY_EXPANSIONS,
    WILDCARD_BOOSTS,
    AnalyzedQuery,
    analyze_query,
    auto_max_edits,
    validate_search,
)


def bm25_score_col(tf, df, doc_len, n_docs, avgdl, k1: float = BM25_K1, b: float = BM25_B):
    """BM25 as a Column expression (whole-stage-codegen'd, JVM-side)."""
    idf = F.log(F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)))
    tf_norm = (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doc_len / avgdl))
    return idf * tf_norm


# driver-side expansion cache: repeated queries skip the dictionary-scan
# Spark job entirely (ES likewise caches query analysis). Invalidated by
# the term_dict directory mtime — any build/merge/stats refresh rewrites it.
_EXPANSION_CACHE: dict[tuple, list[tuple[str, str, float]]] = {}
_EXPANSION_CACHE_MAX = 512


def expand_query_terms(spark: SparkSession, index: Index, terms: list[str]) -> list[tuple[str, str, float]]:
    """Fuzzy-AUTO expansion against the term dictionary.

    Returns driver-side [(query_term, index_term, fuzzy_boost)] — bounded by
    50 expansions/term (ES max_expansions default), so collecting is safe at
    any corpus scale; the dictionary scan itself is a column-pruned parquet
    scan of df_stats (term dictionary), the one query-path stage that cannot
    be bucket-pruned (fuzzy matches any bucket — SURVEY.md §7.3).
    """
    uniq = sorted(set(terms))
    try:
        # manifest-resolved path: a swap-published dictionary rewrite lands
        # in a NEW directory, so (path, mtime) changes and the cache rolls
        from docix_spark.index.build import table_version

        dict_path = index.path("term_dict")
        dict_mtime = table_version(dict_path)
    except OSError:
        dict_path, dict_mtime = "", (-1, -1)
    cache_key = (dict_path, dict_mtime, tuple(uniq))
    cached = _EXPANSION_CACHE.get(cache_key)
    if cached is not None:
        return cached
    def _remember(result: list[tuple[str, str, float]]) -> list[tuple[str, str, float]]:
        if len(_EXPANSION_CACHE) >= _EXPANSION_CACHE_MAX:
            _EXPANSION_CACHE.clear()
        _EXPANSION_CACHE[cache_key] = result
        return result

    exact = [(t, t, 1.0) for t in uniq]
    fuzzy_qs = [(t, len(t), auto_max_edits(len(t))) for t in uniq if auto_max_edits(len(t)) > 0]
    if not fuzzy_qs:
        return _remember(exact)

    qdf = spark.createDataFrame(fuzzy_qs, "qt string, qlen int, max_edits int")
    dictionary = index.term_dict(spark)
    lo = min(q[1] - q[2] for q in fuzzy_qs)
    hi = max(q[1] + q[2] for q in fuzzy_qs)
    cand = (
        dictionary.where((F.col("tlen") >= lo) & (F.col("tlen") <= hi))
        .join(F.broadcast(qdf), on=F.expr("abs(tlen - qlen) <= max_edits"))
        .withColumn("dist", F.levenshtein(F.col("term"), F.col("qt")))
        .where((F.col("dist") > 0) & (F.col("dist") <= F.col("max_edits")))
    )
    w = Window.partitionBy("qt").orderBy(F.desc("df"), F.asc("term"))
    capped = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MAX_FUZZY_EXPANSIONS)
        .select(
            "qt",
            "term",
            (F.lit(1.0) - F.col("dist") / F.least(F.col("qlen"), F.col("tlen"))).alias("boost"),
        )
    )
    out = exact + [(r.qt, r.term, float(r.boost)) for r in capped.collect()]
    return _remember(out)


def _bucket_ids(spark: SparkSession, terms: list[str], n_buckets: int) -> list[int]:
    """term_bucket values for a term list, computed driver-side with the
    pure-Python XXH64 replica of the build's ``pmod(xxhash64(term), B)`` —
    saves one Spark job per query (parity proven in tests/test_xxh64.py)."""
    from docix_spark.index.xxh64 import term_bucket_py

    return sorted({term_bucket_py(t, n_buckets) for t in set(terms)})


@dataclass
class SearchResultPage:
    """Shaped like the reference's SearchResult page (SURVEY.md §3.1 step 5)."""

    results: DataFrame  # doc_id, score, rank, repo, path, lang, ...
    page: int
    size: int


# broadcast expansion-relation handle cache (see score_fields); bounded,
# cleared wholesale at capacity
_EXP_DF_CACHE: dict[tuple, DataFrame] = {}

# prepared bestfields plan cache: the lazy score_fields DataFrame is a pure
# function of (expansions, index table versions, k1, b, msm) — repeated
# queries skip ~0.2 s of Py4J plan construction (prepared-statement
# semantics; the TakeOrdered job itself still runs per query)
_PLAN_CACHE: dict[tuple, DataFrame] = {}


# pure-Python StructTypes (no JVM gateway needed — safe at module level,
# unlike Column constants; see CLAUDE.md)
_PAGE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("score", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)
_PAGE_META_SCHEMA = StructType(
    _PAGE_SCHEMA.fields
    + [
        StructField(c, StringType())
        for c in ["repo", "path", "commit", "lang", "file_name", "original_file_name"]
    ]
)
_EXP_SCHEMA = StructType(
    [
        StructField("qt", StringType()),
        StructField("term", StringType()),
        StructField("fboost", DoubleType()),
        StructField("qcount", DoubleType()),
        StructField("qi", IntegerType()),
    ]
)


def _local_df(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Local relation via a pandas roundtrip: ~10x faster than the tuple
    path (~30 ms vs ~280 ms — per-row Py4J verification dominates the
    latter), measured on 10-row pages. Row order is preserved on collect."""
    import pandas as pd

    names = [f.name for f in schema.fields]
    return spark.createDataFrame(
        pd.DataFrame(rows or None, columns=names), schema
    )


def score_fields(
    spark: SparkSession,
    index: Index,
    aq: AnalyzedQuery,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """bestfields(d): per-field BM25 with fuzzy expansion, msm 50%, field
    boosts, best_fields max. Returns (doc_id, best_score)."""
    expansions = expand_query_terms(spark, index, aq.terms)
    exp_terms = sorted({e[1] for e in expansions})
    buckets = _bucket_ids(spark, exp_terms, index.n_buckets)

    # ES keeps duplicate analyzed terms as separate clauses: each duplicate
    # both scores again and counts again toward minimum_should_match — so a
    # query term carries its multiplicity as a clause weight.
    from collections import Counter

    qt_counts = Counter(aq.terms)
    qi_map = {qt: i for i, qt in enumerate(sorted(qt_counts))}
    exp_rows = [
        (qt, t, fb, float(qt_counts[qt]), qi_map[qt]) for qt, t, fb in expansions
    ]
    # expansion rows are immutable for a given query string + dictionary
    # version, so cache the broadcast handle (saves the local-relation
    # roundtrip + hint construction on repeats)
    from docix_spark.index.build import session_key, table_version

    # applicationId, not id(spark): a GC'd session's id can alias a new
    # session's (ADVICE r3 #5)
    ekey = (session_key(spark), tuple(exp_rows))
    exp_df = _EXP_DF_CACHE.get(ekey)
    if exp_df is None:
        if len(_EXP_DF_CACHE) >= 256:
            _EXP_DF_CACHE.clear()
        exp_df = F.broadcast(_local_df(spark, exp_rows, _EXP_SCHEMA))
        _EXP_DF_CACHE[ekey] = exp_df

    # prepared-plan cache: the lazy plan below is fully determined by the
    # expansion rows, the index table versions (path + mtime_ns + file
    # count — appends and pointer flips both change it; same invalidation
    # as Index._read), msm and the BM25 constants
    def _mt(name: str) -> tuple[int, int]:
        return table_version(index.path(name))

    pkey = (
        ekey,
        index.root,
        _mt("postings"),
        _mt("df_stats"),
        _mt("corpus_stats"),
        aq.msm,
        k1,
        b,
    )
    cached = _PLAN_CACHE.get(pkey)
    if cached is not None:
        return cached

    postings = index.postings(spark).where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(exp_terms)
    )
    df_stats = index.df_stats(spark).where(F.col("term").isin(exp_terms))
    cstats = F.broadcast(index.corpus_stats(spark))

    # doc_len rides inside every posting row (build-time denormalization) —
    # no doc_stats join in the hot path
    matched = (
        postings.join(exp_df, "term")
        .join(df_stats.select("field", "term", "df"), ["field", "term"])
        .join(cstats, "field")
    )
    per_term = matched.select(
        "field",
        "doc_id",
        "qi",
        "qcount",
        (
            F.col("qcount")
            * F.col("fboost")
            * bm25_score_col(
                F.col("tf").cast("double"),
                F.col("df").cast("double"),
                F.col("doc_len").cast("double"),
                F.col("n_docs").cast("double"),
                F.col("avgdl"),
                k1=k1,
                b=b,
            )
        ).alias("tscore"),
    )
    # ONE shuffle on doc_id decides bestfields (was three: per-qt collapse,
    # per-field agg, per-doc max — each a full exchange). Per-qt collapse is
    # algebraically a plain sum (fscore = Σ_qt Σ_t tscore = Σ tscore), and
    # the msm count — Σ over DISTINCT matched query terms of their clause
    # multiplicity — comes from a per-field collect_set of bounded (qi,
    # qcount) structs (<= #unique query terms <= ~100 entries per group, so
    # the partial aggregation stays map-side and memory-bounded). Fields
    # are a fixed 3-entry set, unrolled into 2 agg expressions each.
    fields = list(FIELD_BOOSTS)
    aggs = []
    for i, f in enumerate(fields):
        in_f = F.col("field") == f
        aggs.append(F.sum(F.when(in_f, F.col("tscore"))).alias(f"fs_{i}"))
        aggs.append(
            F.collect_set(
                F.when(in_f, F.struct(F.col("qi"), F.col("qcount")))
            ).alias(f"ws_{i}")
        )
    agg = per_term.groupBy("doc_id").agg(*aggs)
    cands = []
    for i, f in enumerate(fields):
        nm = F.aggregate(
            F.col(f"ws_{i}"), F.lit(0.0), lambda acc, x: acc + x["qcount"]
        )
        cands.append(
            F.when(nm >= F.lit(aq.msm), F.lit(FIELD_BOOSTS[f]) * F.col(f"fs_{i}"))
        )
    best_col = F.greatest(*cands) if len(cands) > 1 else cands[0]
    best = agg.select("doc_id", best_col.alias("best_score")).where(
        F.col("best_score").isNotNull()
    )
    if len(_PLAN_CACHE) >= 256:
        _PLAN_CACHE.clear()
    _PLAN_CACHE[pkey] = best
    return best


def wildcard_fallback(spark: SparkSession, index: Index, aq: AnalyzedQuery) -> DataFrame:
    """fallback(d): constant-score substring clauses, Σ of matching boosts
    (reference SearchAdapter.java:412-429). Returns (doc_id, fb_score).

    Scale path: when the character-trigram index exists (index/ngram.py)
    and the query is >= 3 chars, candidates come from the trigram
    intersection and the contains() verification runs only on the pruned
    candidate probe — results are EXACTLY the full scan's (candidates are
    a superset of true matches). Otherwise: the reference full scan."""
    from docix_spark.index.ngram import substring_candidates

    q = aq.lower
    docs = index.docs(spark)
    cand = substring_candidates(spark, index, q, fields=list(WILDCARD_BOOSTS))
    if cand is not None:
        docs = docs.join(cand, "doc_id")
    clauses = [
        F.when(F.lower(F.col(fld)).contains(q), F.lit(bo)).otherwise(F.lit(0.0))
        for fld, bo in WILDCARD_BOOSTS.items()
    ]
    total = sum(clauses[1:], clauses[0])
    return (
        docs.select("doc_id", total.alias("fb_score"))
        .where(F.col("fb_score") > 0)
    )


# Upper bound of the constant-score wildcard clause sum — the MaxScore-style
# gate constant for skipping the full-corpus content scan.
_MAX_FB = sum(WILDCARD_BOOSTS.values())


def _probe_doc_rows(index: Index, ids: list[str], cols: list[str]) -> list[dict]:
    """Driver-side point read of a BOUNDED doc_id set through the
    doc_id-sorted docs table — pyarrow prunes row groups on the sorted
    min/max stats, so this touches only the groups containing the ids
    (the serving tier's ``_fetch_docs`` pattern). Replaces a whole Spark
    job (scheduler ~0.2-0.5 s) for candidate sets capped at
    ``cand_cap + 1`` rows; at cluster scale the same read goes through
    the shared filesystem and stays a few-row-group fetch."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    dset = ds.dataset(index.path("docs"), format="parquet")
    t = dset.to_table(columns=cols, filter=pc.field("doc_id").isin(ids))
    return t.to_pylist()


def _gated_topk(
    spark: SparkSession,
    index: Index,
    aq: AnalyzedQuery,
    best: DataFrame,
    k_need: int,
    cand_cap: int = 1000,
) -> list[tuple[str, float]] | None:
    """Provably-exact wildcard gate (VERDICT r1 "what's wrong" #3): decide
    the top-k WITHOUT scanning every document's text for the substring
    clauses. Returns the exact ranked [(doc_id, score)] prefix, or None
    when the bound cannot exclude wildcard-only docs (caller falls back to
    the reference's full fallback scan).

    Soundness: with kth_best the k-th bestfields score,

    1. any bestfields doc below ``kth_best - MAX_FB`` cannot reach the
       top-k even with every wildcard clause (fb <= MAX_FB) — so exact
       combined scores are needed only for the candidate set above that
       threshold (collected, capped);
    2. the wildcard boosts for the candidates come from a DRIVER-SIDE
       pyarrow point read of the docs table — row-group pruned by the
       doc_id-sorted layout, never a full text scan, and no second Spark
       job (warm queries run exactly ONE job: the TakeOrdered);
    3. a doc with NO bestfields match scores <= MAX_FB; if the exact
       k-th combined score is strictly above MAX_FB, no such doc can enter
       (or tie into) the top-k and the scan is skipped entirely.
    """
    # ONE TakeOrdered job fetches the top-k AND the candidate band above
    # (kth_best - MAX_FB) together — the bestfields pipeline must not
    # execute twice (measured 2x warm-latency regression at sf0.01).
    rows = (
        best.orderBy(F.desc("best_score"), F.asc("doc_id"))
        .limit(cand_cap + 1)
        .collect()
    )
    if len(rows) < k_need:
        return None  # bestfields can't fill the page — wildcard docs needed
    kth_best = rows[k_need - 1].best_score
    thresh = kth_best - _MAX_FB
    if len(rows) == cand_cap + 1 and rows[-1].best_score >= thresh:
        return None  # candidate band extends past the cap — bound too loose
    cand_rows = [r for r in rows if r.best_score >= thresh]
    ids = [r.doc_id for r in cand_rows]
    q = aq.lower
    fb: dict[str, float] = {}
    for rd in _probe_doc_rows(index, ids, ["doc_id", *WILDCARD_BOOSTS]):
        s = 0.0
        for fld, bo in WILDCARD_BOOSTS.items():
            if q in (rd.get(fld) or "").lower():
                s += bo
        fb[rd["doc_id"]] = s
    combined = sorted(
        ((r.doc_id, r.best_score + fb.get(r.doc_id, 0.0)) for r in cand_rows),
        key=lambda x: (-x[1], x[0]),
    )
    kth_combined = combined[k_need - 1][1]
    if kth_combined <= _MAX_FB:
        return None  # a wildcard-only doc could still enter or tie
    return combined[:k_need]


def search_topk(
    spark: SparkSession,
    index: Index,
    query: str,
    page: int = 0,
    size: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    with_metadata: bool = True,
    validate: bool = True,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Full reference search semantics → one result DataFrame.

    Columns: doc_id, score, rank (1-based, global) + doc metadata.
    Empty-index guard replicates the count-probe at SearchAdapter.java:385-389.

    ``validate=False`` enters at the adapter level (below the use-case
    validation), where ``"*"`` → match_all is honored
    (SearchAdapter.java:395-397); through the public path a bare ``"*"``
    never survives the 2-char minimum (SearchDocumentService.java:115-131).
    """
    if validate:
        validate_search(query, page, size)
    aq = analyze_query(query)
    docs = index.docs(spark)

    top = None
    if aq.is_match_all:
        scored = docs.select("doc_id", F.lit(1.0).alias("score"))
    else:
        best = score_fields(spark, index, aq, k1=k1, b=b)
        if exclude is not None:
            best = best.join(exclude, "doc_id", "left_anti")
        gated = _gated_topk(spark, index, aq, best, (page + 1) * size)
        if gated is not None:
            # the gate decided the exact page driver-side; fetch the <=size
            # result docs' metadata through the SAME pyarrow point-read
            # path as the fb probe — a Spark metadata join here would scan
            # the whole docs table (a broadcast join pushes no doc_id
            # filter), and warm queries must stay at ONE Spark job
            page_rows = [
                (d, float(s), i + 1)
                for i, (d, s) in enumerate(gated)
                if i >= page * size
            ]
            # rows are already rank-sorted; a local-relation createDataFrame
            # preserves input order on collect, so no sort operator at all
            # (orderBy costs a range-sampling job; even coalesce(1)+
            # sortWithinPartitions measured slower than the plain relation)
            if not with_metadata:
                return _local_df(spark, page_rows, _PAGE_SCHEMA)
            meta_cols = ["doc_id", "repo", "path", "commit", "lang", "file_name", "original_file_name"]
            meta = {
                r["doc_id"]: r
                for r in _probe_doc_rows(index, [d for d, _, _ in page_rows], meta_cols)
            }
            return _local_df(
                spark,
                [
                    (d, s, rk, *(meta.get(d, {}).get(c) for c in meta_cols[1:]))
                    for d, s, rk in page_rows
                ],
                _PAGE_META_SCHEMA,
            )
        else:
            fb = wildcard_fallback(spark, index, aq)
            scored = (
                best.join(fb, "doc_id", "full_outer")
                .select(
                    "doc_id",
                    (F.coalesce("best_score", F.lit(0.0)) + F.coalesce("fb_score", F.lit(0.0))).alias("score"),
                )
            )

    if top is None:
        if exclude is not None:
            # deleted-doc mask applied before ranking (Lucene live-docs
            # bitmap; delete-by-query, SearchAdapter.java:331-354)
            scored = scored.join(exclude, "doc_id", "left_anti")
        top = (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit((page + 1) * size)
            .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))))
            .where(F.col("rank") > page * size)
        )
    if with_metadata:
        # Broadcast the <=k result rows, never the docs table: at 10^9+ docs
        # broadcasting the metadata side OOMs the executors, while the top-k
        # side is bounded by page*size. Inner join is safe — every scored
        # doc_id exists in docs by construction (the index was built from it).
        meta_cols = ["doc_id", "repo", "path", "commit", "lang", "file_name", "original_file_name"]
        top = F.broadcast(top).join(docs.select(*meta_cols), "doc_id")
    return top.orderBy("rank")
