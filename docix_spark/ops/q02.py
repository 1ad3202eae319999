"""driver_queries chunk q02 (original lines 6961-10382): composite_agg_page, tokenizer_fertility, cross_source_dup_matrix, adjacency_matrix_agg, ... prf_rocchio_expand (55 ops).

Linearized continuation of docix_spark.ops.q01 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q01")

@register(
    "composite_agg_page",
    """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM documents
       WHERE source > 'src1' OR (source = 'src1' AND lang > 'en')
       GROUP BY source, lang ORDER BY source, lang LIMIT 8""",
)
def composite_agg_page(spark, sf_dir):
    """ES ``composite`` aggregation — the keyset-paged bucket enumerator
    (the only ES agg that can walk ALL buckets of a high-cardinality key
    without deep from/size): buckets keyed (source, lang) with count +
    sum(n_chars) stats, page size 8, after_key = ('src1', 'en'). Exactly
    the search_after discipline applied to BUCKETS: the cursor is pushed
    as a row-level PREDICATE before the aggregation, so every page costs
    one pruned scan + one bounded agg — never materializing the full
    bucket list to skip into it.

    Scale shape: the after-key predicate pushes to the parquet scan
    (source is a stats-pruned column); the agg key is low-cardinality with
    map-side combine; LIMIT 8 is a TakeOrdered on bucket rows."""
    d = _docs(spark, sf_dir)
    after = (F.col("source") > "src1") | ((F.col("source") == "src1") & (F.col("lang") > "en"))
    return (
        d.where(after)
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("source", "lang")
        .limit(8)
    )


@register(
    "tokenizer_fertility",
    rf"""WITH per AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS w,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS b
  FROM documents
)
SELECT source,
       CAST(sum(w) AS BIGINT) AS word_tokens,
       CAST(sum(b) AS BIGINT) AS bpe_tokens,
       CASE WHEN sum(w) = 0 THEN 0
            ELSE (CAST(sum(b) AS BIGINT) * 1000000) // CAST(sum(w) AS BIGINT)
       END AS fertility_q6
FROM per GROUP BY source ORDER BY source""",
)
def tokenizer_fertility(spark, sf_dir):
    """Per-source tokenizer fertility — subword tokens per word (the
    budget planner's bridge between corpus word counts and model token
    counts; high fertility flags sources the tokenizer fragments, e.g.
    code or non-Latin scripts, which cost more context per word). Uses
    the same BPE-ish counter as token_count_bpe over the same word
    tokenizer as everything else; ratio in exact integer micro-units
    with the all-empty-source guard (temperature_mix_weights lesson:
    0/0 diverges between engines).

    Scale shape: both counts are map-side regexp counters inside codegen
    folded into ONE sources-sized hash agg — no token explosion, no
    shuffle beyond the 20-group rollup."""
    d = _docs(spark, sf_dir)
    per = d.select(
        "source",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)).alias("w"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]|[^a-z0-9\s]"), 0)
        ).alias("b"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum("w").cast("long").alias("word_tokens"),
            F.sum("b").cast("long").alias("bpe_tokens"),
        )
        .withColumn(
            "fertility_q6",
            F.expr(
                "CASE WHEN word_tokens = 0 THEN 0"
                " ELSE (bpe_tokens * 1000000) div word_tokens END"
            ),
        )
        .orderBy("source")
    )


@register(
    "cross_source_dup_matrix",
    _SQL_LSH_PAIRS
    + """
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN documents da ON da.doc_id = pairs.doc_a
JOIN documents db ON db.doc_id = pairs.doc_b
GROUP BY 1, 2 ORDER BY source_a, source_b""",
)
def cross_source_dup_matrix(spark, sf_dir):
    """Cross-source duplication matrix — the provenance readout a corpus
    curator asks for right after the dedup rate: WHICH sources duplicate
    WHICH (a crawl mirroring another crawl, a dump re-scraped under a new
    name). Near-dup candidate pairs from the shared MinHash-LSH banding
    are rolled up by unordered source pair (least/greatest normalizes the
    key so the matrix is upper-triangular); the diagonal is within-source
    duplication.

    Scale shape: reuses `_lsh_pair_edges`' banded equi-join (candidates
    only, never all-pairs); attaching sources is two doc_id equi-joins
    against the doc-metadata table (pair volume is candidate-sized), and
    the matrix rollup keys on source pairs — sources² rows at most, with
    map-side combine absorbing the pair stream."""
    edges = _lsh_pair_edges(spark, sf_dir)
    pairs = edges.where(F.col("src") < F.col("dst"))
    d = _docs(spark, sf_dir).select("doc_id", "source")
    da = d.select(F.col("doc_id").alias("src"), F.col("source").alias("sa"))
    db = d.select(F.col("doc_id").alias("dst"), F.col("source").alias("sb"))
    return (
        pairs.join(da, "src").join(db, "dst")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


@register(
    "adjacency_matrix_agg",
    """WITH m AS (
  SELECT lower(text) LIKE '%spark%' AS fa,
         lower(text) LIKE '%join%' AS fb,
         lang = 'en' AS fc
  FROM documents
)
SELECT key, n_docs FROM (
  SELECT 'en' AS key, CAST(sum(CASE WHEN fc THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM m
  UNION ALL SELECT 'en&join', CAST(sum(CASE WHEN fc AND fb THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'en&spark', CAST(sum(CASE WHEN fc AND fa THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'join', CAST(sum(CASE WHEN fb THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'join&spark', CAST(sum(CASE WHEN fb AND fa THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL SELECT 'spark', CAST(sum(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) FROM m
) WHERE n_docs > 0 ORDER BY key""",
)
def adjacency_matrix_agg(spark, sf_dir):
    """ES ``adjacency_matrix`` aggregation: given named filters (here
    spark-match, join-match, lang=en), report the doc count of every
    filter AND every pairwise intersection, keys joined with '&' in
    alphabetical order and empty buckets omitted — ES's own output
    contract. The co-occurrence overview a search UI's "refine by"
    panel is built from.

    Scale shape: ONE corpus scan computes all filter bits map-side
    (ES does the same with per-filter bitsets); the 6 conditional sums
    collapse in a single map-side-combined agg to one row, unpivoted to
    bucket rows with stack() — output size is filters², independent of
    corpus size. The oracle's UNION ALL re-scans per bucket; the Spark
    plan does not."""
    m = _docs(spark, sf_dir).select(
        F.lower("text").contains("spark").alias("fa"),
        F.lower("text").contains("join").alias("fb"),
        (F.col("lang") == "en").alias("fc"),
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = m.agg(
        cnt(F.col("fc")).alias("en"),
        cnt(F.col("fc") & F.col("fb")).alias("en_join"),
        cnt(F.col("fc") & F.col("fa")).alias("en_spark"),
        cnt(F.col("fb")).alias("join"),
        cnt(F.col("fb") & F.col("fa")).alias("join_spark"),
        cnt(F.col("fa")).alias("spark"),
    )
    return (
        agg.selectExpr(
            "stack(6, 'en', en, 'en&join', en_join, 'en&spark', en_spark,"
            " 'join', `join`, 'join&spark', join_spark, 'spark', spark)"
            " AS (key, n_docs)"
        )
        .where(F.col("n_docs") > 0)
        .orderBy("key")
    )


@register(
    "language_confusion_matrix",
    f"""WITH pred AS ({_lang_sql()})
SELECT d.lang, pred.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred JOIN documents d USING (doc_id)
GROUP BY d.lang, pred.pred_lang ORDER BY d.lang, pred.pred_lang""",
)
def language_confusion_matrix(spark, sf_dir):
    """Language-ID confusion matrix — declared `lang` vs the heuristic's
    `pred_lang`, the quality-control readout that decides whether the
    cheap classifier is trustworthy enough to gate admission on (CCNet
    runs exactly this audit before letting fastText route documents).
    Reuses lang_id_heuristic verbatim as the prediction stage, so the
    matrix always reflects the shipped classifier.

    Scale shape: the prediction is the existing per-doc agg; the matrix
    rollup keys on (lang, pred_lang) — at most |langs|² rows with
    map-side combine. One metadata equi-join on doc_id."""
    pred = lang_id_heuristic(spark, sf_dir)
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        pred.join(d, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


@register(
    "train_eval_split",
    f"""WITH dl AS ({SQL_DL}),
sp AS (SELECT d.doc_id,
              CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 5, 4))::UBIGINT::BIGINT % 100 < 98 THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 5, 4))::UBIGINT::BIGINT % 100 = 98 THEN 'valid'
                   ELSE 'test' END AS split,
              COALESCE(dl.doc_len, 0) AS n_tok
       FROM documents d LEFT JOIN dl USING (doc_id)),
agg AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM sp GROUP BY split)
SELECT split, n_docs, n_tokens,
       (n_tokens * 1000000) // (SELECT CAST(sum(n_tokens) AS BIGINT) FROM agg) AS token_share_q6
FROM agg ORDER BY split""",
)
def train_eval_split(spark, sf_dir):
    """Deterministic train/valid/test split (98/1/1) — the hold-out
    assignment a training pipeline must make REPRODUCIBLY (a rand()-based
    split reshuffles on every retry and leaks eval docs into training).
    The split key is a 16-bit md5 slice of the doc id taken at hex chars
    5-8 — a DIFFERENT coordinate of the same hash than shard_token_balance
    (chars 1-4), so a doc's output shard and its split are independent:
    every shard contains all three splits. Per split: docs, tokens, token
    share in exact micro-units.

    Scale shape: the split key is map-side; the rollup is a 3-group
    map-side-combined agg. The actual split WRITE is a partition filter
    on the same expression — no shuffle at all."""
    dl = _toks(_docs(spark, sf_dir)).groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    v = "cast(conv(substring(md5(cast(doc_id as string)), 5, 4), 16, 10) as bigint) % 100"
    sp = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(dl, "doc_id", "left")
        .select(
            F.expr(
                f"CASE WHEN {v} < 98 THEN 'train' WHEN {v} = 98 THEN 'valid' ELSE 'test' END"
            ).alias("split"),
            F.coalesce("doc_len", F.lit(0)).alias("n_tok"),
        )
    )
    agg = sp.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"), F.sum("n_tok").cast("long").alias("n_tokens")
    )
    # shard_token_balance's lesson: the total comes from an unpartitioned
    # window over the 3-row agg, never a crossJoin that re-derives it
    return (
        agg.withColumn("t", F.sum("n_tokens").over(Window.partitionBy()))
        .withColumn("token_share_q6", F.expr("(n_tokens * 1000000) div t"))
        .select("split", "n_docs", "n_tokens", "token_share_q6")
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# session 13 — ES result shaping (collapse / pinned / shard-error terms agg /
# extended_stats / percentile_ranks / string_stats / pipeline aggs) + corpus
# lexical-growth diagnostics
# ---------------------------------------------------------------------------


@register(
    "search_collapse",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
j AS (SELECT d.source, agg.doc_id, agg.score_q6
      FROM agg JOIN documents d USING (doc_id)),
r AS (SELECT source, doc_id, score_q6,
             row_number() OVER (PARTITION BY source
                                ORDER BY score_q6 DESC, doc_id ASC) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_hits
      FROM j)
SELECT source, doc_id, score_q6, n_hits,
       CAST(row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS BIGINT) AS rank
FROM r WHERE rn = 1 ORDER BY rank LIMIT 10""",
)
def search_collapse(spark, sf_dir):
    """ES field collapsing (``collapse: {field: source}``): the result list
    keeps only the BEST hit per collapse-key, with the group's total hit
    count (the ``inner_hits`` size) — dedup-by-site in a search UI. Groups
    rank by their top hit's (score desc, doc_id asc), same tiebreak as W1.

    Scale shape: the collapse is ONE map-side-combinable agg over the match
    set — max(struct(score, -doc_id)) picks the per-group winner without a
    per-group sort window, so no reducer ever holds a group's full hit list
    (ES collapses inside the shard-level priority queue the same way). The
    final rank window runs over the collapsed (key-cardinality-bounded,
    then LIMITed) rows only."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    d = _docs(spark, sf_dir).select("doc_id", "source")
    j = agg.join(d, "doc_id")
    g = j.groupBy("source").agg(
        F.max(F.struct(F.col("score_q6").alias("s"), (-F.col("doc_id")).alias("nd"))).alias("top"),
        F.count("*").cast("long").alias("n_hits"),
    )
    sel = g.select(
        "source",
        (-F.col("top.nd")).cast("long").alias("doc_id"),
        F.col("top.s").alias("score_q6"),
        "n_hits",
    )
    topk = sel.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    return (
        topk.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))).cast("long"),
        )
        .select("source", "doc_id", "score_q6", "n_hits", "rank")
        .orderBy("rank")
    )


@register(
    "pinned_query",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
pin AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(pos AS BIGINT) AS pos
        FROM (VALUES (7, 1), (3, 2)) AS t(doc_id, pos)),
pinned AS (
  SELECT pin.pos AS rank, pin.doc_id, CAST(1 AS BIGINT) AS pinned,
         COALESCE(agg.score_q6, 0) AS score_q6
  FROM pin LEFT JOIN agg USING (doc_id)),
organic AS (
  SELECT CAST(2 + row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS BIGINT) AS rank,
         doc_id, CAST(0 AS BIGINT) AS pinned, score_q6
  FROM agg WHERE doc_id NOT IN (7, 3)
  ORDER BY score_q6 DESC, doc_id ASC LIMIT 8)
SELECT rank, doc_id, pinned, score_q6 FROM pinned
UNION ALL
SELECT rank, doc_id, pinned, score_q6 FROM organic
ORDER BY rank""",
)
def pinned_query(spark, sf_dir):
    """ES ``pinned`` query: curated doc ids [7, 3] surface FIRST in their
    given order (merchandising/editorial promotion), organic BM25 fills the
    remaining slots with pinned ids excluded. Pinned rows report their
    organic score when they match (0 when they don't — they're promoted
    regardless, which is the point of the feature).

    Scale shape: the pinned list is user-sized (a handful of ids) — its
    score lookup is a tiny left join the optimizer resolves as a broadcast;
    the organic leg is the standard match-set TakeOrdered with a NOT IN
    filter pushed below the sort. The match set is localCheckpoint'd: two
    consumers (pinned lookup + organic top-k) would each replay the
    tokenize upstream otherwise."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)  # checkpointed + memoized
    pin = spark.createDataFrame([(7, 1), (3, 2)], "doc_id long, pos long")
    pinned = (
        pin.join(agg, "doc_id", "left")
        .select(
            F.col("pos").alias("rank"),
            "doc_id",
            F.lit(1).cast("long").alias("pinned"),
            F.coalesce("score_q6", F.lit(0)).cast("long").alias("score_q6"),
        )
    )
    org_top = (
        agg.where(~F.col("doc_id").isin(7, 3))
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(8)
    )
    organic = org_top.withColumn(
        "rank",
        (F.lit(2) + F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))).cast("long"),
    ).select("rank", "doc_id", F.lit(0).cast("long").alias("pinned"), "score_q6")
    return pinned.unionByName(organic).orderBy("rank")


@register(
    "terms_shard_error",
    f"""WITH dt AS (SELECT DISTINCT doc_id, term FROM ({SQL_TOKS})),
sc AS (SELECT doc_id % 4 AS shard, term, CAST(count(*) AS BIGINT) AS cnt
       FROM dt GROUP BY 1, 2),
rk AS (SELECT shard, term, cnt,
              row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, term ASC) AS rn
       FROM sc),
rep AS (SELECT shard, term, cnt FROM rk WHERE rn <= 5),
cut AS (SELECT shard, min(cnt) AS cutoff FROM rep GROUP BY shard),
tot AS (SELECT CAST(sum(cutoff) AS BIGINT) AS total_cut FROM cut),
mg AS (SELECT term, CAST(sum(rep.cnt) AS BIGINT) AS df_est,
              CAST(sum(cut.cutoff) AS BIGINT) AS covered
       FROM rep JOIN cut USING (shard) GROUP BY term)
SELECT term, df_est, (SELECT total_cut FROM tot) - covered AS err_bound
FROM mg ORDER BY df_est DESC, term ASC LIMIT 10""",
)
def terms_shard_error(spark, sf_dir):
    """ES ``terms`` aggregation with ``shard_size`` semantics: each shard
    (doc_id % 4) reports only its local top-5 terms by doc count; the
    coordinator sums what was reported and publishes
    ``doc_count_error_upper_bound`` per term = Σ over NON-reporting shards
    of that shard's last-place reported count (the most a missing shard
    could have contributed). The distributed-correctness artifact ES users
    actually read to size shard_size.

    Scale shape: per-shard counts are one map-side-combined agg; the
    per-shard rank window runs over PRE-AGGREGATED (shard, term, cnt) rows
    — vocab-bounded per shard, never posting-sized. The reported set
    (shards × 5 rows) is localCheckpoint'd: cutoffs, the total, and the
    merge all reuse it instead of replaying the tokenize upstream, and
    every downstream join broadcasts."""
    dt = _toks(_docs(spark, sf_dir)).distinct()
    sc = dt.groupBy((F.col("doc_id") % 4).alias("shard"), "term").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    rep = (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
        .localCheckpoint()
    )
    cut = rep.groupBy("shard").agg(F.min("cnt").alias("cutoff"))
    tot = cut.agg(F.sum("cutoff").cast("long").alias("total_cut"))
    mg = rep.join(F.broadcast(cut), "shard").groupBy("term").agg(
        F.sum("cnt").cast("long").alias("df_est"),
        F.sum("cutoff").cast("long").alias("covered"),
    )
    return (
        mg.crossJoin(F.broadcast(tot))
        .select("term", "df_est", (F.col("total_cut") - F.col("covered")).cast("long").alias("err_bound"))
        .orderBy(F.desc("df_est"), F.asc("term"))
        .limit(10)
    )


@register(
    "extended_stats_source",
    f"""WITH dl AS ({SQL_DL}),
x AS (SELECT d.source, COALESCE(dl.doc_len, 0) AS x
      FROM documents d LEFT JOIN dl USING (doc_id)),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(x) AS BIGINT) AS sum_len,
             CAST(min(x) AS BIGINT) AS min_len,
             CAST(max(x) AS BIGINT) AS max_len,
             CAST(sum(x * x) AS BIGINT) AS sum_sq
      FROM x GROUP BY source)
SELECT source, n_docs, sum_len, min_len, max_len,
       (sum_len * 1000000) // n_docs AS avg_len_q6,
       ((n_docs * sum_sq - sum_len * sum_len) * 1000000) // (n_docs * n_docs) AS var_q6
FROM a ORDER BY source""",
)
def extended_stats_source(spark, sf_dir):
    """ES ``extended_stats`` aggregation over doc token length per source:
    count/sum/min/max plus mean and POPULATION variance — the one-shot
    distribution readout (ES adds sum_of_squares for exactly this
    mergeability). Variance from the sufficient statistics
    (n·Σx² − (Σx)²)/n², so every per-source value is derived from three
    exact BIGINT sums; the q6 division is integer floor-div in both
    engines — no float accumulation anywhere (std_dev is deliberately
    omitted: sqrt is the one step that would reintroduce float bits).

    Scale shape: one map-side-combined agg keyed on source; empty docs are
    kept via the LEFT JOIN + COALESCE 0 (an inner join would silently drop
    them from n). BIGINT headroom: n·Σx²·10⁶ stays under 2⁶³ through sf1;
    beyond that the same expressions move to DECIMAL(38,0)."""
    dl = _toks(_docs(spark, sf_dir)).groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    x = (
        _docs(spark, sf_dir)
        .select("doc_id", "source")
        .join(dl, "doc_id", "left")
        .select("source", F.coalesce("doc_len", F.lit(0)).alias("x"))
    )
    a = x.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("x").cast("long").alias("sum_len"),
        F.min("x").cast("long").alias("min_len"),
        F.max("x").cast("long").alias("max_len"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_sq"),
    )
    return (
        a.withColumn("avg_len_q6", F.expr("(sum_len * 1000000) div n_docs"))
        .withColumn(
            "var_q6",
            F.expr("((n_docs * sum_sq - sum_len * sum_len) * 1000000) div (n_docs * n_docs)"),
        )
        .select("source", "n_docs", "sum_len", "min_len", "max_len", "avg_len_q6", "var_q6")
        .orderBy("source")
    )


@register(
    "percentile_ranks_doclen",
    f"""WITH dl AS ({SQL_DL}),
x AS (SELECT d.source, COALESCE(dl.doc_len, 0) AS x
      FROM documents d LEFT JOIN dl USING (doc_id))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       (CAST(count(*) FILTER (x <= 30) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS le30_q6,
       (CAST(count(*) FILTER (x <= 60) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS le60_q6,
       (CAST(count(*) FILTER (x <= 90) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS le90_q6
FROM x GROUP BY source ORDER BY source""",
)
def percentile_ranks_doclen(spark, sf_dir):
    """ES ``percentile_ranks`` aggregation (the inverse of percentiles):
    for fixed cutoffs 30/60/90 tokens, the fraction of each source's docs
    at or under the cutoff — how a curator reads "what share of this crawl
    is under the short-doc filter line" without computing a full quantile
    sketch. Exact integer counts and floor-div micro-unit shares (the
    doclen_quantiles lesson: never percentile(), never float division).

    Scale shape: three conditional counters fold into ONE map-side-combined
    agg keyed on source — a single pass, output rows = |sources|."""
    dl = _toks(_docs(spark, sf_dir)).groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    x = (
        _docs(spark, sf_dir)
        .select("doc_id", "source")
        .join(dl, "doc_id", "left")
        .select("source", F.coalesce("doc_len", F.lit(0)).alias("x"))
    )

    def le(c):
        return F.sum(F.when(F.col("x") <= c, 1).otherwise(0)).cast("long")

    a = x.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        le(30).alias("c30"), le(60).alias("c60"), le(90).alias("c90"),
    )
    return (
        a.select(
            "source", "n_docs",
            F.expr("(c30 * 1000000) div n_docs").alias("le30_q6"),
            F.expr("(c60 * 1000000) div n_docs").alias("le60_q6"),
            F.expr("(c90 * 1000000) div n_docs").alias("le90_q6"),
        )
        .orderBy("source")
    )


@register(
    "heaps_law_source",
    f"""WITH t AS (SELECT d.source, tk.term
         FROM documents d LEFT JOIN ({SQL_TOKS}) tk USING (doc_id)),
a AS (SELECT source, CAST(count(term) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT term) AS BIGINT) AS n_types
      FROM t GROUP BY source)
SELECT source, n_tokens, n_types,
       CASE WHEN n_tokens = 0 THEN 0 ELSE (n_types * 1000000) // n_tokens END AS ttr_q6
FROM a ORDER BY source""",
)
def heaps_law_source(spark, sf_dir):
    """Heaps'-law readout per source: total tokens vs distinct types and
    the type-token ratio — the vocabulary-growth curve input that flags
    templated/generated sources (TTR collapses when a crawl is one page
    stamped a million times) and sizes tokenizer vocab against corpus
    growth. Integer micro-unit ratio with the 0/0 guard.

    Scale shape: the distinct-type count is Spark's two-phase partial
    distinct (expand on (source, term), map-side dedup before the shuffle)
    — never a collect_set; output rows = |sources|. LEFT JOIN keeps
    all-empty sources at n_tokens 0 instead of dropping the row."""
    t = (
        _docs(spark, sf_dir)
        .select("doc_id", "source")
        .join(_toks(_docs(spark, sf_dir)), "doc_id", "left")
    )
    a = t.groupBy("source").agg(
        F.count("term").cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types"),
    )
    return (
        a.withColumn(
            "ttr_q6",
            F.expr("CASE WHEN n_tokens = 0 THEN 0 ELSE (n_types * 1000000) div n_tokens END"),
        )
        .orderBy("source")
    )


@register(
    "events_cum_derivative",
    """WITH d AS (
     SELECT event_type, epoch_us(ts) // 86400000000 AS day_num,
            CAST(count(*) AS BIGINT) AS n
     FROM events GROUP BY 1, 2)
SELECT event_type, day_num, n,
       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day_num) AS BIGINT) AS cum_n,
       n - COALESCE(lag(n) OVER (PARTITION BY event_type ORDER BY day_num), n) AS deriv_n
FROM d ORDER BY event_type, day_num""",
)
def events_cum_derivative(spark, sf_dir):
    """ES ``cumulative_sum`` + ``derivative`` pipeline aggregations over a
    per-type daily date_histogram: running total and day-over-day delta —
    the growth dashboard pair. The first bucket's derivative is 0 by the
    lag-defaults-to-self convention (ES omits the bucket; a fixed 0 keeps
    the row set schema-stable for the contract).

    Determinism: integer-microsecond day keys (no session timezone in
    either engine, the events_daily_mavg rule), exact BIGINT counts and
    window sums. Scale shape: the raw shuffle is the (type, day) groupBy
    with map-side combine; both windows then run over DAY-granularity rows
    partitioned by event_type — calendar-bounded, not event-bounded."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day_num"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day_num")
    return (
        d.withColumn("cum_n", F.sum("n").over(w).cast("long"))
        .withColumn("deriv_n", (F.col("n") - F.coalesce(F.lag("n").over(w), F.col("n"))).cast("long"))
        .orderBy("event_type", "day_num")
    )


@register(
    "string_stats_source",
    f"""WITH w AS ({SQL_WORDS}),
t AS (SELECT source, unnest(words) AS term FROM w),
base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                CAST(min(strlen(term)) AS BIGINT) AS min_len,
                CAST(max(strlen(term)) AS BIGINT) AS max_len,
                CAST(sum(strlen(term)) AS BIGINT) AS sum_len
         FROM t GROUP BY source),
ch AS (SELECT source, ch, CAST(count(*) AS BIGINT) AS c
       FROM (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS ch
             FROM documents)
       GROUP BY source, ch),
n AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM ch GROUP BY source),
per AS (SELECT ch.source,
               CAST(round(-(CAST(ch.c AS DOUBLE) / n.tot)
                          * ln(CAST(ch.c AS DOUBLE) / n.tot) * 1000000) AS BIGINT) AS h_q6
        FROM ch JOIN n USING (source)),
ent AS (SELECT source, CAST(sum(h_q6) AS BIGINT) AS entropy_q6 FROM per GROUP BY source)
SELECT base.source, n_terms, min_len, max_len,
       (sum_len * 1000000) // n_terms AS avg_len_q6,
       ent.entropy_q6
FROM base JOIN ent USING (source) ORDER BY base.source""",
)
def string_stats_source(spark, sf_dir):
    """ES ``string_stats`` aggregation per source: term count, min/max/avg
    term length, and Shannon entropy over the character distribution (ES
    computes exactly this char-level entropy; here over the analyzer
    alphabet [a-z0-9] so both engines count the identical event set). Low
    char entropy flags base64 blobs, padding and repeated boilerplate that
    token-level stats miss. Float discipline = source_unigram_entropy: each
    char's −p·ln p is one double expression rounded to q6 FIRST, the
    per-source total is an exact BIGINT sum.

    Scale shape: length stats fold into one source-keyed map-side agg; the
    char rollup keys on (source, char) — at most 36 rows per source after
    the map-side combine absorbs the stream. Sources with zero tokens have
    no term row and are omitted (inner-join semantics, documented)."""
    d = _docs(spark, sf_dir)
    t = d.select("source", F.explode(spark_tokens("text")).alias("term"))
    base = t.groupBy("source").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.min(F.length("term")).cast("long").alias("min_len"),
        F.max(F.length("term")).cast("long").alias("max_len"),
        F.sum(F.length("term")).cast("long").alias("sum_len"),
    )
    ch = (
        d.select("source", F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]"), 0)).alias("ch"))
        .groupBy("source", "ch")
        .agg(F.count("*").cast("long").alias("c"))
        # (source, char) rows; two consumers (totals + per-char terms)
        .localCheckpoint()
    )
    n = ch.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    p = F.col("c").cast("double") / F.col("tot")
    ent = (
        ch.join(F.broadcast(n), "source")
        .select("source", _q6(-p * F.log(p)).alias("h_q6"))
        .groupBy("source")
        .agg(F.sum("h_q6").cast("long").alias("entropy_q6"))
    )
    return (
        base.join(ent, "source")
        .withColumn("avg_len_q6", F.expr("(sum_len * 1000000) div n_terms"))
        .select("source", "n_terms", "min_len", "max_len", "avg_len_q6", "entropy_q6")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# session 14 — budgeted selection, cluster-balanced sampling, intervals query
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 12_000


def _budget_sql(budget: int) -> str:
    """Generated DuckDB oracle for quality_budget_select — kept as a
    generator so the property suite can exercise budgets that actually
    cross on hypothesis-sized corpora."""
    return f"""WITH t AS ({SQL_TOKS}),
m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             CAST(count(*) FILTER (term IN ('the','a','of','to','is')) AS BIGINT) AS stop_hits
      FROM t GROUP BY doc_id),
q AS (SELECT d.doc_id,
             CASE WHEN COALESCE(m.n_tok, 0) = 0 THEN 0
                  ELSE (m.stop_hits * 1000000) // m.n_tok END AS q_q6,
             COALESCE(m.n_tok, 0) AS n_tok,
             md5(CAST(d.doc_id AS VARCHAR)) AS h
      FROM documents d LEFT JOIN m USING (doc_id)),
c AS (SELECT doc_id, q_q6, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY q_q6 DESC, h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM q)
SELECT doc_id, q_q6, n_tok FROM c WHERE cum_before < {budget}
ORDER BY doc_id"""


@register("quality_budget_select", _budget_sql(_BUDGET_TOKENS))
def quality_budget_select(spark, sf_dir):
    """Token-budgeted quality selection — "take the best documents until
    the training budget of {B} tokens is filled", the greedy fill every
    mix-construction pipeline runs after scoring. Quality here is the
    stopword-hit ratio in integer micro-units (any per-doc integer score
    slots in); within a score tie, docs order by (md5(doc_id), doc_id) so
    the cut is reproducible, and the doc that crosses the budget line is
    admitted (greedy fill).

    The oracle is the naive global window (ORDER BY quality over every
    row). The Spark plan never sorts the corpus: it aggregates a per-SCORE
    histogram (score-cardinality rows), takes an exclusive prefix sum over
    that tiny table to classify every score bin as fully-funded /
    boundary / rejected, admits full bins with no ordering at all, and
    resolves ONLY the single boundary bin with the domain_cap sub-sharded
    two-pass cumsum (md5-prefix range shards + per-shard token totals) —
    so no whole-corpus or whole-bin sort ever lands on one reducer. The
    doclen_quantiles histogram trick applied to SELECTION."""
    B = _BUDGET_TOKENS
    toks = _toks(_docs(spark, sf_dir))
    m = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.when(F.col("term").isin("the", "a", "of", "to", "is"), 1).otherwise(0)).alias("stop_hits"),
    )
    q = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(m, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN COALESCE(n_tok, 0) = 0 THEN 0"
                " ELSE (stop_hits * 1000000) div n_tok END"
            ).alias("q_q6"),
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        # three consumers below (bin histogram, full-bin admit, boundary
        # resolve) — without this each would replay the tokenize upstream
        .localCheckpoint()
    )
    bins = q.groupBy("q_q6").agg(F.sum("n_tok").alias("bt"))
    w_bin = Window.orderBy(F.desc("q_q6")).rowsBetween(Window.unboundedPreceding, -1)
    # score-cardinality rows only — the unpartitioned window is histogram-
    # sized (quantize q_q6 to fixed bins if a score is continuous)
    binoff = bins.withColumn("bin_off", F.coalesce(F.sum("bt").over(w_bin), F.lit(0)))
    j = q.join(F.broadcast(binoff), "q_q6")
    full = j.where(F.col("bin_off") + F.col("bt") <= B).select("doc_id", "q_q6", "n_tok")
    bnd = j.where((F.col("bin_off") < B) & (F.col("bin_off") + F.col("bt") > B)).select(
        "doc_id", "q_q6", "n_tok", "h", "bin_off", F.substring("h", 1, 1).alias("sh")
    )
    sh_tot = bnd.groupBy("q_q6", "sh").agg(F.sum("n_tok").alias("st"))
    w_off = Window.partitionBy("q_q6").orderBy("sh").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sh_tot.withColumn("off", F.coalesce(F.sum("st").over(w_off), F.lit(0))).select(
        "q_q6", "sh", "off"
    )
    w_local = (
        Window.partitionBy("q_q6", "sh")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    admitted_bnd = (
        bnd.withColumn("loc", F.coalesce(F.sum("n_tok").over(w_local), F.lit(0)))
        .join(offsets, ["q_q6", "sh"])
        .where(F.col("bin_off") + F.col("off") + F.col("loc") < B)
        .select("doc_id", "q_q6", "n_tok")
    )
    return full.unionByName(admitted_bnd).orderBy("doc_id")


@register(
    "cluster_balanced_sample",
    _SQL_EMB_E
    + _coarse_ctes()
    + """
rk AS (SELECT ccid AS cid, vec_id,
              row_number() OVER (PARTITION BY ccid
                                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       FROM ca3)
SELECT cid, vec_id, CAST(rk AS BIGINT) AS rk
FROM rk WHERE rk <= 10 ORDER BY cid, rk""",
)
def cluster_balanced_sample(spark, sf_dir):
    """Cluster-balanced (diversity) sampling: at most 10 vectors per
    trained-IVF cell, picked in deterministic md5-of-id order — the
    embedding-space analogue of stratified_sample (equal representation
    across LEARNED clusters instead of declared sources; the
    SemDeDup/DiverseSample shape for training-mix diversity). Reuses the
    shared `_trained_ivf` k-means index, so the sample always reflects the
    shipped quantizer.

    Scale shape: the quota pick is the domain_cap sub-sharded exact rank
    re-keyed to cid (md5's leading hex char gives 16 ordered range shards
    per cell; local ranks + a tiny (cells × 16) offset table) — no
    whole-cell sort on one reducer even when a cell holds a third of the
    corpus. The oracle is the naive per-cell window."""
    _members, _cent, final_assign = _trained_ivf(spark, sf_dir)
    d = final_assign.select(
        "cid", "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
    ).withColumn("sh", F.substring("h", 1, 1))
    counts = d.groupBy("cid", "sh").agg(F.count("*").alias("n"))
    w_off = Window.partitionBy("cid").orderBy("sh").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("off", F.coalesce(F.sum("n").over(w_off), F.lit(0))).select(
        "cid", "sh", "off"
    )
    w_local = Window.partitionBy("cid", "sh").orderBy("h", "vec_id")
    ranked = (
        d.withColumn("lr", F.row_number().over(w_local))
        .join(offsets, ["cid", "sh"])
        .select("cid", "vec_id", (F.col("off") + F.col("lr")).cast("long").alias("rk"))
    )
    return ranked.where(F.col("rk") <= 10).orderBy("cid", "rk")


_IV_TERMS = ("spark", "hash", "join")
_IV_GAPS = 3  # ES intervals max_gaps: window width = n_terms + max_gaps


@register(
    "intervals_unordered",
    f"""WITH t AS (
  SELECT doc_id, words[i] AS term, i AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words
        FROM documents),
       unnest(generate_series(1, len(words))) AS u(i)
),
p1 AS (SELECT doc_id, pos FROM t WHERE term = '{_IV_TERMS[0]}'),
p2 AS (SELECT doc_id, pos FROM t WHERE term = '{_IV_TERMS[1]}'),
p3 AS (SELECT doc_id, pos FROM t WHERE term = '{_IV_TERMS[2]}'),
spans AS (
  SELECT p1.doc_id,
         greatest(p1.pos, p2.pos, p3.pos) - least(p1.pos, p2.pos, p3.pos) AS span
  FROM p1
  JOIN p2 ON p2.doc_id = p1.doc_id AND abs(p2.pos - p1.pos) <= {len(_IV_TERMS) - 1 + _IV_GAPS}
  JOIN p3 ON p3.doc_id = p1.doc_id AND abs(p3.pos - p1.pos) <= {len(_IV_TERMS) - 1 + _IV_GAPS}
)
SELECT doc_id, CAST(min(span) AS BIGINT) AS min_span
FROM spans WHERE span <= {len(_IV_TERMS) - 1 + _IV_GAPS}
GROUP BY doc_id ORDER BY doc_id""",
)
def intervals_unordered(spark, sf_dir):
    """ES ``intervals`` query, ``all_of`` with ``ordered: false`` and
    ``max_gaps``: documents where all three terms co-occur inside a token
    window of width ≤ n_terms + max_gaps (here 3 terms, 3 gaps → span ≤ 5
    positions), reporting the tightest such span — proximity matching
    that phrase_slop's ORDERED adjacency can't express.

    Scale shape: the three posting sets join per doc_id with the span
    bound pushed into each join condition as a BAND predicate
    (|p2−p1| ≤ W), so the per-doc combination blowup is capped at
    occurrences-per-window — never the |p1|·|p2|·|p3| cross product (the
    same bounding trick as the events as-of horizon). Position extraction
    is one map-side explode; doc_ids with any qualifying window collapse
    through a min agg."""
    W = len(_IV_TERMS) - 1 + _IV_GAPS
    d = _docs(spark, sf_dir).select("doc_id", F.posexplode(spark_tokens("text")).alias("i", "term"))
    # Spark positions are 0-based, DuckDB's 1-based — spans are differences,
    # so the origins cancel (the phrase_slop rule)
    t = d.select("doc_id", "term", (F.col("i") + 1).alias("pos")).where(
        F.col("term").isin(*_IV_TERMS)
    )
    # one pruned position table, three filtered consumers — materialize once
    t = t.localCheckpoint()
    p1 = t.where(F.col("term") == _IV_TERMS[0]).select("doc_id", F.col("pos").alias("pos1"))
    p2 = t.where(F.col("term") == _IV_TERMS[1]).select("doc_id", F.col("pos").alias("pos2"))
    p3 = t.where(F.col("term") == _IV_TERMS[2]).select("doc_id", F.col("pos").alias("pos3"))
    spans = (
        p1.join(p2, "doc_id")
        .where(F.abs(F.col("pos2") - F.col("pos1")) <= W)
        .join(p3, "doc_id")
        .where(F.abs(F.col("pos3") - F.col("pos1")) <= W)
        .select(
            "doc_id",
            (
                F.greatest("pos1", "pos2", "pos3") - F.least("pos1", "pos2", "pos3")
            ).alias("span"),
        )
    )
    return (
        spans.where(F.col("span") <= W)
        .groupBy("doc_id")
        .agg(F.min("span").cast("long").alias("min_span"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# session 16 — gram-level provenance, sampler facets, nested page rollup,
# query-string syntax
# ---------------------------------------------------------------------------

_GRAM8 = (
    "words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]"
    " || ' ' || words[i+4] || ' ' || words[i+5] || ' ' || words[i+6] || ' ' || words[i+7]"
)


@register(
    "source_gram_novelty",
    f"""WITH w AS ({SQL_WORDS}),
g AS (SELECT DISTINCT source, {_GRAM8} AS g
      FROM w, unnest(generate_series(1, len(words) - 7)) AS t(i)
      WHERE len(words) >= 8),
gs AS (SELECT g, count(*) AS n_src FROM g GROUP BY g)
SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (gs.n_src = 1) AS BIGINT) AS n_unique,
       (CAST(count(*) FILTER (gs.n_src = 1) AS BIGINT) * 1000000)
         // CAST(count(*) AS BIGINT) AS novelty_q6
FROM g JOIN gs USING (g) GROUP BY source ORDER BY source""",
)
def source_gram_novelty(spark, sf_dir):
    """Gram-level originality per source: the share of a source's distinct
    8-grams that occur in NO other source — the provenance readout that
    separates original content from mirrors/aggregators (a crawl that's
    90% other sources' grams adds tokens but no new text to a training
    mix). Complements cross_source_dup_matrix: that counts near-dup DOC
    pairs, this measures text-level novelty even when no whole document
    duplicates.

    Scale shape: the (source, gram) table is DISTINCT'd map-side before
    the gram-keyed shuffle and localCheckpoint'd for its two consumers
    (the per-gram source count and the join back); both rollups are
    map-side-combined aggs. Same gram construction as dup_ngram_fraction,
    keyed by source instead of doc."""
    w = _docs(spark, sf_dir).select("source", spark_tokens("text").alias("words"))
    g = (
        w.where(F.size("words") >= 8)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-8), i -> "
                    "concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3],"
                    " words[i+4], words[i+5], words[i+6], words[i+7]))"
                )
            ).alias("g"),
        )
        .distinct()
        .localCheckpoint()
    )
    gs = g.groupBy("g").agg(F.count(F.lit(1)).alias("n_src"))
    uniq = F.col("n_src") == 1
    return (
        g.join(gs, "g")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count_if(uniq).cast("long").alias("n_unique"),
        )
        .withColumn("novelty_q6", F.expr("(n_unique * 1000000) div n_grams"))
        .orderBy("source")
    )


@register(
    "search_sampler_facets",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
top AS (SELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 100)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_hits
FROM top JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source""",
)
def search_sampler_facets(spark, sf_dir):
    """ES ``sampler`` aggregation: facets computed over only the TOP-100
    scored hits instead of the full match set — the cheap "what's in the
    best results" breakdown a search UI shows when exact full-corpus
    facet counts would cost too much (search_facets is the exact twin;
    this is the sampled one, and on a 100 TB match set it is the only
    affordable default).

    Scale shape: the sample is ONE TakeOrdered (never a global sort), the
    metadata join is a 100-row broadcast, and the facet rollup is
    sources-sized. The match set itself comes memoized from
    `_bm25_match_set`."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    top = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(100).select("doc_id")
    d = _docs(spark, sf_dir).select("doc_id", "source")
    return (
        F.broadcast(top).join(d, "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_hits"))
        .orderBy("source")
    )


# The driver corpus has no form feeds (every doc is one page), so the
# nested rollup injects a deterministic page break after each 'spark' —
# the text_scrub/unicode_tokens injection approach.
_PAGE_INJECT_SPARK = "replace(text, 'spark', concat('spark', char(12)))"
_PAGE_INJECT_DUCK = "replace(text, 'spark', 'spark' || chr(12))"


@register(
    "nested_pages_agg",
    f"""WITH d AS (SELECT doc_id, string_split({_PAGE_INJECT_DUCK}, chr(12)) AS pages
            FROM documents),
p AS (SELECT doc_id, pages[i] AS page
      FROM d, unnest(generate_series(1, len(pages))) AS t(i)),
m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pages,
             CAST(max(len(regexp_extract_all(lower(page), '{TOKEN_PATTERN}'))) AS BIGINT) AS max_page_toks,
             CAST(sum(len(regexp_extract_all(lower(page), '{TOKEN_PATTERN}'))) AS BIGINT) AS total_toks
      FROM p GROUP BY doc_id)
SELECT doc_id, n_pages, max_page_toks, total_toks FROM m ORDER BY doc_id""",
)
def nested_pages_agg(spark, sf_dir):
    """Parent-child rollup over the reference's page model (ES ``nested``
    aggregation shape): documents explode into form-feed pages (S4), then
    per-document page count, largest-page token count and total tokens
    roll back up — the per-parent child statistics the reference's
    indexing_log progress rows are built from
    (DocumentIndexingService.java:218-266 walks exactly this
    parent→pages→rollup loop).

    Scale shape: the page explode is map-side (no shuffle until the
    doc_id rollup, which map-side combines); per-page token counts are
    one regexp counter inside codegen, never a token explosion."""
    d = _docs(spark, sf_dir)
    p = d.select(
        "doc_id",
        F.explode(F.split(F.expr(_PAGE_INJECT_SPARK), "\f")).alias("page"),
    )
    ntok = F.size(F.regexp_extract_all(F.lower("page"), F.lit(TOKEN_PATTERN), 0))
    return (
        p.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.max(ntok).cast("long").alias("max_page_toks"),
            F.sum(ntok).cast("long").alias("total_toks"),
        )
        .orderBy("doc_id")
    )


def parse_query_string(q: str) -> tuple[list[str], list[str], list[str]]:
    """Lucene simple_query_string operators: '+term' = must, '-term' =
    must_not, bare = should. Returns (must, must_not, should), each in
    first-appearance order."""
    must, must_not, should = [], [], []
    for tok in q.split():
        if tok.startswith("+") and len(tok) > 1:
            must.append(tok[1:].lower())
        elif tok.startswith("-") and len(tok) > 1:
            must_not.append(tok[1:].lower())
        else:
            should.append(tok.lower())
    return must, must_not, should


_QS_QUERY = "+spark -join hash"


def _query_string_sql(q: str) -> str:
    must, must_not, should = parse_query_string(q)
    scored = must + should
    filt = ""
    for t in must:
        filt += f" AND agg.doc_id IN (SELECT doc_id FROM tf WHERE term = '{t}')"
    for t in must_not:
        filt += f" AND agg.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = '{t}')"
    return (
        _bm25_agg_ctes(scored)
        + f""",
ranked AS (
  SELECT agg.doc_id, score_q6,
         row_number() OVER (ORDER BY score_q6 DESC, agg.doc_id ASC) AS rank
  FROM agg WHERE 1=1 {filt})
SELECT doc_id, score_q6, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank"""
    )


@register("query_string_search", _query_string_sql(_QS_QUERY))
def query_string_search(spark, sf_dir):
    """Lucene ``simple_query_string`` syntax end-to-end: '+spark -join
    hash' parses to must=[spark], must_not=[join], should=[hash]; docs
    must contain every must term and no must_not term, and BM25-score
    over the must+should terms. The user-facing operator syntax the
    reference's ES delegate accepts, parsed by our own
    :func:`parse_query_string` and driving BOTH engines from one parse.

    Scale shape: scoring is the memoized match set; the must filter is a
    semi-join and must_not an anti-join on pruned single-term posting
    sets (bool_filter_query's algebra applied to the scored set); top-10
    is a TakeOrdered."""
    must, must_not, should = parse_query_string(_QS_QUERY)
    agg = _bm25_match_set(spark, sf_dir, must + should)
    toks = _toks(_docs(spark, sf_dir))
    for t in must:
        agg = agg.join(
            toks.where(F.col("term") == t).select("doc_id").distinct(), "doc_id", "semi"
        )
    for t in must_not:
        agg = agg.join(
            toks.where(F.col("term") == t).select("doc_id").distinct(), "doc_id", "anti"
        )
    topk = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    return (
        topk.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))).cast("long"),
        )
        .select("doc_id", "score_q6", "rank")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# session 17 — dedup-pipeline tuning diagnostics: banding precision,
# hamming histogram, asymmetric containment
# ---------------------------------------------------------------------------


@register(
    "lsh_candidate_precision",
    _SQL_LSH_PAIRS
    + """,
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS c,
         any_value(na.n) AS na, any_value(nb.n) AS nb
  FROM pairs c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
  JOIN sizes na ON na.doc_id = c.doc_a
  JOIN sizes nb ON nb.doc_id = c.doc_b
  GROUP BY c.doc_a, c.doc_b),
agg AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_candidates,
               (SELECT CAST(count(*) FILTER (3 * c >= na + nb) AS BIGINT) FROM inter) AS n_true)
SELECT n_candidates, n_true,
       CASE WHEN n_candidates = 0 THEN 0
            ELSE (n_true * 1000000) // n_candidates END AS precision_q6
FROM agg""",
)
def lsh_candidate_precision(spark, sf_dir):
    """LSH banding precision — of the candidate pairs the band join emits,
    the fraction whose EXACT shingle Jaccard clears the dedup threshold
    (J ≥ 0.5): the tuning readout that decides whether the band count is
    wasting verify budget on false candidates (precision near 0 → add
    bands/rows; near 1 with low yield → loosen). The threshold test is a
    pure-integer cross-multiplication, 2·|∩| ≥ |∪| ⟺ 3c ≥ n_a + n_b —
    no float Jaccard anywhere.

    Scale shape: the exact intersection is computed on CANDIDATES ONLY
    (the shingle join is pre-filtered by the pair set, never all-pairs);
    sizes is a doc-keyed agg; the summary is two scalar counts. The edge
    set itself comes from the memoized `_lsh_pair_edges` graph."""
    edges = _lsh_pair_edges(spark, sf_dir)
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    sh = _shingles_spark(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .where(F.col("sh") == F.col("sh_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )
    n_cand = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_true = inter.agg(
        F.count_if(F.expr("3 * c >= na + nb")).cast("long").alias("n_true")
    )
    return (
        n_cand.crossJoin(n_true)
        .withColumn(
            "precision_q6",
            F.expr(
                "CASE WHEN n_candidates = 0 THEN 0"
                " ELSE (n_true * 1000000) div n_candidates END"
            ),
        )
        .select("n_candidates", "n_true", "precision_q6")
    )


@register(
    "simhash_hamming_histogram",
    _SIMHASH_CTE
    + """,
bands AS (
  SELECT doc_id, simhash, j, (simhash >> (15 * j)) & 32767 AS bv
  FROM sh, (SELECT unnest(generate_series(0, 3)) AS j)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
FROM cand GROUP BY hamming ORDER BY hamming""",
)
def simhash_hamming_histogram(spark, sf_dir):
    """Hamming-distance histogram over the SimHash band-collision
    candidates — the threshold-tuning curve for simhash_band_pairs' ≤ 3
    verify: how many candidate pairs sit at each distance tells you what
    a looser/tighter cut would admit and what the verify stage actually
    pays per band collision. (Deliberately over CANDIDATES, not all
    pairs: beyond distance 3 the pigeonhole guarantee lapses, so this is
    the banding's own view — exactly what the operator tunes.)

    Scale shape: identical band equi-join as simhash_band_pairs (keys are
    (band_idx, 15-bit value) — never all-pairs), distinct pair set, then
    a ≤ 60-bucket map-side-combined histogram."""
    sh = _simhash_spark(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.expr(f"(simhash >> {15 * j}) & 32767").alias("bv"),
                )
                for j in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", F.col("band.j").alias("j"), F.col("band.bv").alias("bv"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").alias("hamming"),
        )
        .distinct()
    )
    return (
        cand.groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("hamming")
    )


@register(
    "winnow_containment",
    f"""WITH fps AS ({_WINNOW_FPS_SQL}),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM fps GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id <> b.doc_id
  GROUP BY 1, 2),
c AS (SELECT doc_a, doc_b, n_shared, s.n AS n_fp_a
      FROM shared JOIN sizes s ON s.doc_id = shared.doc_a)
SELECT doc_a, doc_b, n_shared, n_fp_a,
       (n_shared * 1000000) // n_fp_a AS containment_q6
FROM c WHERE 2 * n_shared >= n_fp_a ORDER BY doc_a, doc_b""",
)
def winnow_containment(spark, sf_dir):
    """Asymmetric fingerprint containment (Broder's containment, computed
    over winnowing fingerprints): for each ORDERED pair, the share of
    doc_a's fingerprints that doc_b also has — ≥ 0.5 flags doc_a as
    substantially quoted/embedded inside doc_b even when symmetric
    Jaccard is tiny (a README pasted into a mega-repo dump never shows up
    in resemblance-based dedup; it does here). The MOSS plagiarism
    direction the symmetric pair ops can't express; threshold is the
    integer test 2·shared ≥ |fps_a|.

    Scale shape: the self-join blocks on the fingerprint (winnow_pairs'
    shape) and the fps table is localCheckpoint'd for its three consumers
    (two join sides + sizes); both directions fall out of the one
    unordered join since the group key is ordered (doc_a, doc_b)."""
    fps = _winnow_fps_spark(spark, sf_dir).localCheckpoint()
    sizes = fps.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_fp_a")), "doc_a")
        .where(F.expr("2 * n_shared >= n_fp_a"))
        .select(
            "doc_a", "doc_b", "n_shared", "n_fp_a",
            F.expr("(n_shared * 1000000) div n_fp_a").alias("containment_q6"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# session 18 — SemDedup embedding dedup, rare/multi terms aggs, scalar
# quantization audit
# ---------------------------------------------------------------------------


# Calibrated to the sandbox's i.i.d. vectors (max pairwise cosine ~0.55 —
# a real 0.95+ paraphrase threshold would drop nothing here; the OPERATOR
# SHAPE is what ships, the cut is a knob).
_SEMDEDUP_T = 350_000

_SEMDEDUP_SQL = (
    _KMEANS_SQL_PRELUDE
    + f""",
un AS (
  SELECT vec_id, list_transform(v, x -> x / n) AS u
  FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e WHERE vec_id <> 0)
),
mem AS (SELECT a3.vec_id, a3.cid, un.u FROM a3 JOIN un USING (vec_id)),
dup AS (
  SELECT DISTINCT b.vec_id AS dropped
  FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE CAST(round(1000000 * list_dot_product(a.u, b.u)) AS BIGINT) >= {_SEMDEDUP_T}
)
SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(dup.dropped) AS BIGINT) AS n_dropped
FROM mem LEFT JOIN dup ON mem.vec_id = dup.dropped
GROUP BY cid ORDER BY cid"""
)


@register("semdedup", _SEMDEDUP_SQL)
def semdedup(spark, sf_dir):
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    only compares embeddings WITHIN a k-means cluster — pairs with cosine
    above the threshold are semantic duplicates, the larger vec_id is
    dropped (keep-first greedy), and the per-cluster (members, dropped)
    rollup is the pruning report a curation run reads. Reuses the shared
    memoized `_trained_ivf` quantizer, so the dedup clusters ARE the
    serving index's cells.

    Cross-engine determinism: vectors are normalized ONCE per row (the
    pagerank edge-build lesson — one interpreted array dot per pair, not
    cosine's three) and the drop decision compares q6-rounded cosines, so
    both engines drop the identical id set.

    Scale shape: the pair scores come from the MEMOIZED
    `_incell_pair_cos` table (round 5 — one localCheckpoint'd in-cell
    pair build serves six ops); the join blocks on cid — never
    all-pairs; with K cells the pair count is sum_c |c|^2, and K is the
    sqrt(N)-ish knob that keeps per-cell membership bounded (the paper
    runs ~100k clusters at 100 TB). The rollup output is K rows. Threshold 0.35 is calibrated
    to the sandbox's i.i.d. vectors (max pairwise cosine ~0.55); the real
    knob at scale is 0.95+."""
    members, cent, assign = _trained_ivf(spark, sf_dir)
    mem = assign  # rollup only needs (vec_id, cid)
    dup = (
        _incell_pair_cos(spark, sf_dir)
        .where(F.col("cosn_q6") >= F.lit(_SEMDEDUP_T))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("flag", F.lit(1))
    )
    return (
        mem.join(dup, "vec_id", "left")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.count("flag").cast("long").alias("n_dropped"),
        )
        .orderBy("cid")
    )


@register(
    "rare_terms",
    f"""SELECT term, CAST(count(*) AS BIGINT) AS df FROM ({SQL_TF})
GROUP BY term HAVING count(*) <= 2 ORDER BY df ASC, term ASC LIMIT 50""",
)
def rare_terms(spark, sf_dir):
    """ES rare_terms agg (max_doc_count=2): the long-tail terms a normal
    terms agg never surfaces — hapax/near-hapax mining for typo discovery
    and contamination canaries. Ascending-df order is the agg's defining
    contract (rarest first), term tiebreak makes the cut deterministic.

    Scale shape: df is the standard two-phase partial agg over the tf
    table; the HAVING cut prunes the (vocab-sized) result before the
    top-50 TakeOrdered. ES implements this with a CuckooFilter over
    multiple passes — a distributed engine just filters the df table."""
    return (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") <= 2)
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(50)
    )


@register(
    "multi_terms_agg",
    """SELECT source, lang, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source, lang
ORDER BY doc_count DESC, source ASC, lang ASC LIMIT 20""",
)
def multi_terms_agg(spark, sf_dir):
    """ES multi_terms agg: buckets keyed by a COMPOUND of fields
    (source, lang), ordered by doc count — the cross-facet breakdown a
    single-field terms agg can't express without nesting. One map-side-
    combined agg; bucket count is |sources|x|langs|, trivially bounded."""
    return (
        _docs(spark, sf_dir)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy(F.desc("doc_count"), F.asc("source"), F.asc("lang"))
        .limit(20)
    )


_SQ8_SQL = (
    _SQL_EMB_E
    + """
ex AS (
  SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xq
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i) WHERE vec_id <> 0),
mm AS (SELECT dim, min(xq) AS mn, max(xq) AS mx FROM ex GROUP BY dim),
rec AS (
  SELECT ex.dim, mn, mx,
         xq - (mn + CASE WHEN mx = mn THEN 0
                         ELSE (((xq - mn) * 255) // (mx - mn)) * (mx - mn) // 255 END) AS err
  FROM ex JOIN mm USING (dim))
SELECT dim, mn AS min_q6, mx AS max_q6,
       CAST(sum(err * err) AS BIGINT) AS sse_q12
FROM rec GROUP BY dim, mn, mx ORDER BY dim"""
)


@register("sq8_quantization_error", _SQ8_SQL)
def sq8_quantization_error(spark, sf_dir):
    """Scalar int8 quantization audit (the SQ8 codec FAISS/Lucene ship for
    4x vector-store compression): per-dimension min/max train the affine
    code, every value maps to 0..255, and the per-dim sum of squared
    reconstruction error is the fidelity report that decides SQ8 vs PQ vs
    float16 for a corpus. Entirely integer after the one q6 rounding:
    code = ((xq-mn)*255) div (mx-mn), reconstruction = mn + (code*span)
    div 255, so both engines agree bit-for-bit (xq-mn >= 0, floor ==
    trunc — no negative-division divergence).

    Scale shape: two passes over the exploded (vec, dim) table — a 64-row
    min/max agg (broadcast back), then a map-side err computation feeding
    a 64-group sum. Per-dim SSE sums stay under BIGINT even at 1e9
    vectors (err <= span/255 ~ 4e4 q6-units -> err^2 ~ 1.6e9/row)."""
    ex = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias(
                "dim", "x"
            ),
        )
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
    )
    mm = ex.groupBy("dim").agg(F.min("xq").alias("mn"), F.max("xq").alias("mx"))
    rec = ex.join(F.broadcast(mm), "dim").withColumn(
        "err",
        F.expr(
            "xq - (mn + CASE WHEN mx = mn THEN 0"
            " ELSE (((xq - mn) * 255) div (mx - mn)) * (mx - mn) div 255 END)"
        ),
    )
    return (
        rec.groupBy("dim", "mn", "mx")
        .agg(F.sum(F.expr("err * err")).cast("long").alias("sse_q12"))
        .select(
            "dim", F.col("mn").alias("min_q6"), F.col("mx").alias("max_q6"), "sse_q12"
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# session 19 — two-sample inference (ES t_test / matrix_stats), BPE merge
# candidates, diversified sampling
# ---------------------------------------------------------------------------

# Welch t^2 from exact BIGINT sufficient statistics. The ONLY float math is
# this single shared expression over six exact integers (all < 2^53, so
# their doubles are exact and every division/rounding is IEEE-identical in
# both engines — the same reasoning corpus_stats' avg() relies on). No
# float SUM exists anywhere; sums are integers.
_TTEST_EXPR = (
    "CASE WHEN na < 2 OR nb < 2 OR (na*ssa = sa*sa AND nb*ssb = sb*sb) THEN 0 "
    "ELSE CAST(round(1000000 * ((sa/na - sb/nb) * (sa/na - sb/nb)) "
    "/ ((na*ssa - sa*sa)/(na*na*(na-1)) + (nb*ssb - sb*sb)/(nb*nb*(nb-1)))) AS BIGINT) END"
)


@register(
    "ttest_lang_doclen",
    f"""WITH t AS (
  SELECT lang, CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS x
  FROM documents WHERE lang IN ('en', 'zh')),
s AS (SELECT
  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS na,
  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS nb,
  CAST(COALESCE(sum(x) FILTER (WHERE lang = 'en'), 0) AS BIGINT) AS sa,
  CAST(COALESCE(sum(x) FILTER (WHERE lang = 'zh'), 0) AS BIGINT) AS sb,
  CAST(COALESCE(sum(x*x) FILTER (WHERE lang = 'en'), 0) AS BIGINT) AS ssa,
  CAST(COALESCE(sum(x*x) FILTER (WHERE lang = 'zh'), 0) AS BIGINT) AS ssb
  FROM t)
SELECT na, nb, sa, sb, {_TTEST_EXPR} AS t2_q6 FROM s""",
)
def ttest_lang_doclen(spark, sf_dir):
    """ES ``t_test`` agg (unpaired heteroscedastic — Welch): is the token-
    length distribution of 'en' documents different from 'zh'? Emits the
    squared t statistic (t^2 needs no sqrt; significance thresholds square
    just as well) plus the group counts/sums so the consumer can recover
    direction. Welch denominator = s_a^2/n_a + s_b^2/n_b with sample
    variances from exact integer sufficient statistics.

    Scale shape: ONE map-side-combined pass over the corpus produces six
    BIGINTs; the t^2 arithmetic is a single scalar expression. The exact-
    double envelope (every integer < 2^53) holds to ~1e9 docs of 1e4
    tokens; past that the stats need per-group scaling, not a new plan."""
    t = (
        _docs(spark, sf_dir)
        .where(F.col("lang").isin("en", "zh"))
        .select("lang", F.size(spark_tokens("text")).cast("long").alias("x"))
    )
    s = t.agg(
        F.count_if(F.col("lang") == "en").cast("long").alias("na"),
        F.count_if(F.col("lang") == "zh").cast("long").alias("nb"),
        F.coalesce(F.sum(F.when(F.col("lang") == "en", F.col("x"))), F.lit(0)).cast("long").alias("sa"),
        F.coalesce(F.sum(F.when(F.col("lang") == "zh", F.col("x"))), F.lit(0)).cast("long").alias("sb"),
        F.coalesce(F.sum(F.when(F.col("lang") == "en", F.expr("x*x"))), F.lit(0)).cast("long").alias("ssa"),
        F.coalesce(F.sum(F.when(F.col("lang") == "zh", F.expr("x*x"))), F.lit(0)).cast("long").alias("ssb"),
    )
    return s.select("na", "nb", "sa", "sb", F.expr(_TTEST_EXPR).alias("t2_q6"))


# matrix_stats: covariance divides BEFORE the 1e6 scale (double-exact), so
# the integer cross term never multiplies by the scale; correlation splits
# sqrt(A*B) into sqrt(A)*sqrt(B) to keep each sqrt argument an exact
# double (A*B would pass 2^63 first).
_MSTATS_COV = "CAST(round(1000000 * ((n*sxy - sx*sy) / (n*n))) AS BIGINT)"
_MSTATS_CORR = (
    "CASE WHEN n*sxx = sx*sx OR n*syy = sy*sy THEN 0 "
    "ELSE CAST(round(1000000 * (n*sxy - sx*sy) "
    "/ (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))) AS BIGINT) END"
)


@register(
    "matrix_stats_docs",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS x,
         n_chars AS y
  FROM documents),
s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(sum(x*y) AS BIGINT) AS sxy
      FROM t GROUP BY source)
SELECT source, n, sx, sy, {_MSTATS_COV} AS cov_q6, {_MSTATS_CORR} AS corr_q6
FROM s ORDER BY source""",
)
def matrix_stats_docs(spark, sf_dir):
    """ES ``matrix_stats`` agg over (token_count, n_chars) per source:
    population covariance and Pearson correlation from exact BIGINT
    sufficient statistics — the field-relationship readout (a source
    whose char count doesn't track its token count is binary/CJK/base64-
    shaped). Like extended_stats_source, all SUMS are integers; the two
    scalar outputs are single float expressions over exact doubles, with
    sqrt(A·B) split into sqrt(A)·sqrt(B) so each argument stays under
    2^53.

    Scale shape: one map-side-combined agg to |sources| rows of seven
    integers; the matrix math is per-row scalar arithmetic."""
    t = _docs(spark, sf_dir).select(
        "source",
        F.size(spark_tokens("text")).cast("long").alias("x"),
        F.col("n_chars").alias("y"),
    )
    s = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x*x")).cast("long").alias("sxx"),
        F.sum(F.expr("y*y")).cast("long").alias("syy"),
        F.sum(F.expr("x*y")).cast("long").alias("sxy"),
    )
    return s.select(
        "source", "n", "sx", "sy",
        F.expr(_MSTATS_COV).alias("cov_q6"),
        F.expr(_MSTATS_CORR).alias("corr_q6"),
    ).orderBy("source")


@register(
    "bpe_merge_candidates",
    f"""WITH toks AS ({SQL_TOKS}),
p AS (
  SELECT substring(term, i, 2) AS pair
  FROM toks, unnest(generate_series(1, len(term) - 1)) AS t(i)
  WHERE len(term) >= 2)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20""",
)
def bpe_merge_candidates(spark, sf_dir):
    """The first BPE training step (Sennrich et al. 2016): count adjacent
    symbol pairs over every token OCCURRENCE (character-level symbols
    before any merge) and rank merge candidates — the top pair is the
    merge a tokenizer-induction run would commit. Full iterative BPE is a
    driver loop re-running this exact plan after each merge; the operator
    ships the dominant per-iteration cost as one declarative pass.

    Both engines' substring/length are character-based (UTF-8 aware), so
    CJK text contributes kana/han pairs identically; 1-character tokens
    (Han unigrams) are filtered BEFORE the explode — Spark sequence(1, 0)
    infers step -1 and emits junk (the documented sequence guard).

    Scale shape: explode is map-side (~word_len rows per token), the pair
    count is a two-phase agg over an alphabet^2-bounded key space, then
    one TakeOrdered(20)."""
    return (
        _toks(_docs(spark, sf_dir))
        .where(F.length("term") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))")
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@register(
    "diversified_sampler",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
dv AS (
  SELECT agg.doc_id, d.lang, agg.score_q6,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY agg.score_q6 DESC, agg.doc_id ASC) AS rn
  FROM agg JOIN documents d USING (doc_id)),
top AS (SELECT doc_id, lang FROM dv WHERE rn <= 2
        ORDER BY score_q6 DESC, doc_id ASC LIMIT 100)
SELECT lang, CAST(count(*) AS BIGINT) AS n_hits
FROM top GROUP BY lang ORDER BY lang""",
)
def diversified_sampler(spark, sf_dir):
    """ES ``diversified_sampler`` agg: sample the top-100 hits but admit at
    most 2 documents per source (max_docs_per_value), then facet by lang —
    the de-biased version of search_sampler_facets for a corpus where one
    crawl would otherwise fill the whole sample. The per-source cap is the
    dedup-aware sampling primitive ES ships for exactly this.

    Scale shape: the cap is a per-source window over the match set (keyed
    shuffle on source, never a global sort), the survivor set is one
    TakeOrdered(100), the facet rollup is langs-sized. Match set comes
    memoized from `_bm25_match_set`."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    d = _docs(spark, sf_dir).select("doc_id", "source", "lang")
    w = Window.partitionBy("source").orderBy(F.desc("score_q6"), F.asc("doc_id"))
    top = (
        agg.join(d, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(100)
    )
    return (
        top.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# session 20 — exact-substring span detection, ES boxplot, termvectors API
# ---------------------------------------------------------------------------


_GRAM8_DUCK = " || ' ' || ".join(f"words[i+{j}]" for j in range(8)).replace("words[i+0]", "words[i]")
_GRAM8_SPARK = ", ".join(f"words[i+{j}]" for j in range(8)).replace("words[i+0]", "words[i]")


@register(
    "longest_shared_span",
    _SQL_LSH_PAIRS
    + f""",
w AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words FROM documents),
g AS (
  SELECT doc_id, i AS pos, {_GRAM8_DUCK} AS g
  FROM w, unnest(generate_series(1, len(words) - 7)) AS t(i)
  WHERE len(words) >= 8),
m AS (
  SELECT p.doc_a, p.doc_b, ga.pos AS pa, gb.pos AS pb
  FROM pairs p
  JOIN g ga ON ga.doc_id = p.doc_a
  JOIN g gb ON gb.doc_id = p.doc_b AND gb.g = ga.g),
r AS (
  SELECT doc_a, doc_b, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp,
         pa - pb AS d
  FROM m),
runs AS (
  SELECT doc_a, doc_b, CAST(count(*) + 7 AS BIGINT) AS span
  FROM r GROUP BY doc_a, doc_b, d, grp)
SELECT doc_a, doc_b, CAST(max(span) AS BIGINT) AS longest_span_toks
FROM runs GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""",
)
def longest_shared_span(spark, sf_dir):
    """Longest exactly-shared token span per near-dup candidate pair — the
    exact-substring dedup signal of Lee et al. 2022 (arXiv:2107.06499,
    'Deduplicating Training Data Makes Language Models Better'), which
    removes repeated SPANS rather than whole documents. Their suffix
    array becomes relational via the gram-diagonal trick: two docs share
    an L-token substring iff L-7 consecutive 8-grams match along one
    diagonal (pa - pb constant), so the longest run of consecutive pa on
    a diagonal + 7 IS the longest common substring in tokens.

    Runs are found with the classic gaps-and-islands grouping
    (pa - row_number() over the diagonal) — position ORIGINS differ
    between engines (Spark 0-based, DuckDB 1-based) but both the diagonal
    and the island key are position DIFFERENCES, so they cancel (the
    phrase_slop lesson). Candidate pairs with no shared 8-gram are
    omitted (span < 8 is not a dedup signal).

    Scale shape: the gram join is restricted to the memoized LSH
    candidate pairs (never all-pairs) and blocks on (doc_b, gram); the
    window partitions by (pair, diagonal) — bounded by the shorter doc,
    never a global sort. Suffix-array construction at 100 TB is exactly
    this shuffle in disguise."""
    edges = _lsh_pair_edges(spark, sf_dir)
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    w = (
        _docs(spark, sf_dir)
        .select("doc_id", spark_tokens("text").alias("words"))
        .where(F.size("words") >= 8)
    )
    g = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(words)-8), i -> "
                f"struct(i AS pos, concat_ws(' ', {_GRAM8_SPARK}) AS g))"
            )
        ).alias("t"),
    ).select("doc_id", F.col("t.pos").alias("pos"), F.col("t.g").alias("g"))
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g")
    m = pairs.join(ga, "doc_a").join(gb, ["doc_b", "g"])
    wd = Window.partitionBy("doc_a", "doc_b", "d").orderBy("pa")
    r = m.select(
        "doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("d")
    ).withColumn("grp", F.col("pa") - F.row_number().over(wd))
    runs = r.groupBy("doc_a", "doc_b", "d", "grp").agg(
        (F.count(F.lit(1)) + F.lit(7)).cast("long").alias("span")
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(F.max("span").cast("long").alias("longest_span_toks"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "boxplot_doclen",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
hist AS (SELECT source, n_tok, count(*) AS cnt FROM t GROUP BY source, n_tok),
h AS (
  SELECT source, n_tok, cnt,
         CAST(COALESCE(SUM(cnt) OVER (
           PARTITION BY source ORDER BY n_tok
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES (250000), (500000), (750000)) AS v(p_q6)),
agg AS (
  SELECT h.source, q.p_q6, max(h.n) AS n,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1))
                  THEN h.n_tok END) AS v_lo,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1)) + 1
                  THEN h.n_tok END) AS v_hi
  FROM h, q GROUP BY h.source, q.p_q6),
qq AS (
  SELECT source, p_q6,
         CAST(round(1000000.0 * (v_lo + ((p_q6 / 1000000.0) * (n - 1)
              - floor((p_q6 / 1000000.0) * (n - 1))) * (v_hi - v_lo))) AS BIGINT) AS q_q6
  FROM agg)
SELECT source,
       max(CASE WHEN p_q6 = 250000 THEN q_q6 END) AS q1_q6,
       max(CASE WHEN p_q6 = 500000 THEN q_q6 END) AS q2_q6,
       max(CASE WHEN p_q6 = 750000 THEN q_q6 END) AS q3_q6,
       max(CASE WHEN p_q6 = 750000 THEN q_q6 END)
         - max(CASE WHEN p_q6 = 250000 THEN q_q6 END) AS iqr_q6
FROM qq GROUP BY source ORDER BY source""",
)
def boxplot_doclen(spark, sf_dir):
    """ES ``boxplot`` agg per source: q1/median/q3 + IQR of the token-
    length distribution — doclen_quantiles' machinery (exact type-7
    percentiles from the weighted histogram + exclusive prefix sum, never
    Spark's raw-value-buffering ``percentile``) at the quartile probes,
    pivoted to the one-row-per-source boxplot shape. IQR is a BIGINT
    subtraction of q6 values — no new float math."""
    t = _docs(spark, sf_dir).select(
        "source", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    hist = t.groupBy("source", "n_tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("source")
    h = hist.select(
        "source",
        "n_tok",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(250000,), (500000,), (750000,)], "p_q6 long")
    rank = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    agg = (
        h.crossJoin(F.broadcast(q))
        .groupBy("source", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank), F.col("n_tok"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank) + 1, F.col("n_tok"))).alias("v_hi"),
        )
    )
    r = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    frac = r - F.floor(r)
    qq = agg.select(
        "source",
        "p_q6",
        F.round(F.lit(1_000_000.0) * (F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo"))))
        .cast("long")
        .alias("q_q6"),
    )
    return (
        qq.groupBy("source")
        .agg(
            F.max(F.when(F.col("p_q6") == 250000, F.col("q_q6"))).alias("q1_q6"),
            F.max(F.when(F.col("p_q6") == 500000, F.col("q_q6"))).alias("q2_q6"),
            F.max(F.when(F.col("p_q6") == 750000, F.col("q_q6"))).alias("q3_q6"),
        )
        .withColumn("iqr_q6", F.col("q3_q6") - F.col("q1_q6"))
        .orderBy("source")
    )


_TV_DOC_ID = 42


@register(
    "term_vectors_doc",
    f"""WITH tf AS ({SQL_TF}),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
w AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words
      FROM documents WHERE doc_id = {_TV_DOC_ID}),
pos AS (SELECT words[i] AS term, CAST(min(i - 1) AS BIGINT) AS first_pos
        FROM w, unnest(generate_series(1, len(words))) AS t(i) GROUP BY words[i])
SELECT tf.term, CAST(tf.tf AS BIGINT) AS tf, dfs.df, pos.first_pos
FROM tf JOIN dfs USING (term) JOIN pos USING (term)
WHERE tf.doc_id = {_TV_DOC_ID} ORDER BY tf.term""",
)
def term_vectors_doc(spark, sf_dir):
    """ES ``_termvectors`` API for one document: per term its tf in the
    doc, corpus df, and first position (0-based both engines — DuckDB's
    1-based series is shifted at the source). ES serves this from the
    index; the serving twin here is a pyarrow point read — this is the
    declarative oracle-checkable shape.

    Scale shape: the doc-side tokenize runs on ONE row (doc filter pushed
    to the parquet scan before any explode); only the df lookup touches
    the corpus, and it's the standard two-phase agg semi-joined down to
    the doc's own vocabulary."""
    doc = _docs(spark, sf_dir).where(F.col("doc_id") == _TV_DOC_ID)
    tf = (
        _toks(doc)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    pos = (
        doc.select(F.posexplode(spark_tokens("text")).alias("pos", "term"))
        .groupBy("term")
        .agg(F.min("pos").cast("long").alias("first_pos"))
    )
    dfs = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term").agg(F.count("*").alias("_tf"))
        .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return (
        tf.join(dfs, "term")
        .join(pos, "term")
        .select("term", "tf", "df", "first_pos")
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# session 21 — content-defined chunk dedup, daily anomaly z-scores, Zipf
# slope per source
# ---------------------------------------------------------------------------


@register(
    "cdc_chunk_dedup",
    f"""WITH w AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words
  FROM documents),
t AS (
  SELECT doc_id, source, i AS pos, words[i] AS term,
         CASE WHEN ('0x' || substr(md5(words[i]), 1, 4))::UBIGINT::BIGINT % 16 = 0
              THEN 1 ELSE 0 END AS b
  FROM w, unnest(generate_series(1, len(words))) AS s(i)),
c AS (
  SELECT doc_id, source, pos, term,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS cidx
  FROM t),
chunks AS (
  SELECT source, md5(string_agg(term, ' ' ORDER BY pos)) AS ch
  FROM c GROUP BY source, doc_id, cidx)
SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT ch) AS BIGINT) AS n_distinct_chunks,
       ((count(*) - count(DISTINCT ch)) * 1000000) // count(*) AS dup_ratio_q6
FROM chunks GROUP BY source ORDER BY source""",
)
def cdc_chunk_dedup(spark, sf_dir):
    """Content-defined chunking dedup (the LBFS/rsync/restic family): a
    chunk boundary opens wherever the token's own 16-bit md5 slice ≡ 0
    mod 16 (expected chunk ~16 tokens), so boundaries depend ONLY on
    local content — an insertion near the top of a doc shifts every
    fixed-window chunk (chunk_dedup_scrub's 8-token grid) but leaves all
    CDC chunks after the edit identical. Per-source duplicated-chunk
    ratio is the storage-dedup readout.

    Scale shape: the boundary flag is map-side; the chunk index is a
    per-doc prefix sum (doc-bounded window, the standard positions
    shuffle); chunk assembly is one (doc, chunk) group with an in-group
    sort bounded by chunk length; the rollup is sources-sized. The
    distinct-count is Spark's two-phase partial distinct."""
    t = (
        _docs(spark, sf_dir)
        .select("doc_id", "source", F.posexplode(spark_tokens("text")).alias("pos", "term"))
        .withColumn(
            "b",
            F.expr(
                "CASE WHEN cast(conv(substring(md5(term), 1, 4), 16, 10) as bigint) % 16 = 0"
                " THEN 1 ELSE 0 END"
            ),
        )
    )
    wc = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = t.withColumn("cidx", F.sum("b").over(wc))
    chunks = c.groupBy("source", "doc_id", "cidx").agg(
        F.md5(
            F.expr(
                "concat_ws(' ', transform(sort_array(collect_list(struct(pos, term))),"
                " x -> x.term))"
            )
        ).alias("ch")
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.countDistinct("ch").cast("long").alias("n_distinct_chunks"),
        )
        .withColumn(
            "dup_ratio_q6",
            F.expr("((n_chunks - n_distinct_chunks) * 1000000) div n_chunks"),
        )
        .orderBy("source")
    )


# z^2 from exact integer day counts: dev and var are each ONE division of
# exact BIGINTs (the float-mean form — products like (nd*n-s)^2 would pass
# 2^63 at real scale; divided first, everything stays an exact double).
_ANOM_Z2 = (
    "CASE WHEN nd < 2 OR nd*ss = s*s THEN 0 "
    "ELSE CAST(round(1000000 * (((nd*n - s)/nd) * ((nd*n - s)/nd)) "
    "/ ((nd*ss - s*s)/(nd*nd))) AS BIGINT) END"
)


@register(
    "events_daily_anomaly",
    f"""WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
s AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n*n) AS BIGINT) AS ss FROM d),
z AS (SELECT day_num, n, {_ANOM_Z2} AS z2_q6 FROM d CROSS JOIN s)
SELECT day_num, n, z2_q6,
       CASE WHEN z2_q6 >= 4000000 THEN 1 ELSE 0 END AS is_spike
FROM z ORDER BY day_num""",
)
def events_daily_anomaly(spark, sf_dir):
    """Daily volume anomaly detection: squared z-score of each day's event
    count against the corpus of days (population mean/variance from exact
    BIGINT sufficient statistics), spike flag at |z| >= 2 — the pipeline-
    health alarm a date_histogram dashboard derives. z^2 avoids sqrt; the
    flag is an integer comparison on the q6 output, so both engines flag
    identical days.

    Scale shape: the only corpus-sized pass is the day groupBy (map-side
    partial); the stats row is a 1-row cross join onto day-granularity
    rows (calendar-bounded, the events_daily_mavg argument)."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day_num")
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.expr("n*n")).cast("long").alias("ss"),
    )
    z = d.crossJoin(F.broadcast(s)).select(
        "day_num", "n", F.expr(_ANOM_Z2).alias("z2_q6")
    )
    return z.select(
        "day_num",
        "n",
        "z2_q6",
        F.expr("CASE WHEN z2_q6 >= 4000000 THEN 1 ELSE 0 END").alias("is_spike"),
    ).orderBy("day_num")


# Least-squares slope over q6-rounded (ln rank, ln freq) points. The ln
# values are rounded per TERM first (the unigram_logprob rule — libm ln is
# 1-ulp, never let raw ln floats into a sum); the slope then uses the
# float-mean form (sxy/n - mx*my) / (sxx/n - mx*mx) so no BIGINT product
# exceeds the sums themselves (q6 lns keep sxx exact-double to ~1e5 terms
# per source).
_ZIPF_SLOPE = (
    "CASE WHEN n < 2 OR n*sxx = sx*sx THEN 0 "
    "ELSE CAST(round(1000000 * (sxy/n - (sx/n)*(sy/n)) / (sxx/n - (sx/n)*(sx/n))) AS BIGINT) END"
)


@register(
    "zipf_slope_source",
    f"""WITH tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
        FROM documents) GROUP BY source, term),
r AS (
  SELECT source, f,
         row_number() OVER (PARTITION BY source ORDER BY f DESC, term ASC) AS rnk
  FROM tf),
l AS (
  SELECT source, CAST(round(1000000 * ln(rnk)) AS BIGINT) AS x,
         CAST(round(1000000 * ln(f)) AS BIGINT) AS y
  FROM r),
s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
      FROM l GROUP BY source)
SELECT source, n AS n_terms, {_ZIPF_SLOPE} AS slope_q6
FROM s ORDER BY source""",
)
def zipf_slope_source(spark, sf_dir):
    """Zipf rank-frequency slope per source: least-squares fit of
    ln(freq) ~ ln(rank) over the source's term distribution — natural
    language sits near −1; templated/boilerplate sources flatten toward
    0 and spam/generated text steepens. A corpus-quality diagnostic the
    Gopher-style per-doc flags can't see (it's a property of the whole
    source's vocabulary, not any document).

    Scale shape: term frequencies are the standard two-phase agg; the
    rank window runs over PRE-AGGREGATED vocab-sized rows per source
    (the top_terms_per_source argument); the fit consumes six integers
    per source."""
    tf = (
        _docs(spark, sf_dir)
        .select("source", F.explode(spark_tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    wr = Window.partitionBy("source").orderBy(F.desc("f"), F.asc("term"))
    lpts = tf.withColumn("rnk", F.row_number().over(wr)).select(
        "source",
        F.round(F.lit(1_000_000.0) * F.log("rnk")).cast("long").alias("x"),
        F.round(F.lit(1_000_000.0) * F.log("f")).cast("long").alias("y"),
    )
    s = lpts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x*x")).cast("long").alias("sxx"),
        F.sum(F.expr("x*y")).cast("long").alias("sxy"),
    )
    return s.select(
        "source", F.col("n").alias("n_terms"), F.expr(_ZIPF_SLOPE).alias("slope_q6")
    ).orderBy("source")


# ---------------------------------------------------------------------------
# session 22 — k-center coreset selection, embedding norm QA
# ---------------------------------------------------------------------------

_KCENTER_K = 8


def _kcenter_sql(k: int = _KCENTER_K) -> str:
    """Unrolled greedy farthest-point CTE chain (the pagerank unroll
    pattern). `un` and every running max-cos table are AS MATERIALIZED —
    DuckDB inlines multiply-referenced CTEs and an unrolled chain
    re-derives them with compounding fan-out otherwise (the oracle
    lesson from pagerank_ann_graph: 139 s -> 0.24 s)."""
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        "un AS MATERIALIZED (",
        "  SELECT vec_id, list_transform(v, x -> x / n) AS u",
        "  FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e WHERE vec_id <> 0)),",
        "m1 AS MATERIALIZED (",
        "  SELECT un.vec_id,",
        "         CAST(round(1000000000 * list_dot_product(un.u, c.u)) AS BIGINT) AS mc",
        "  FROM un, (SELECT u FROM un WHERE vec_id = 1) c WHERE un.vec_id <> 1),",
    ]
    for i in range(1, k):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT vec_id, mc FROM m{i} ORDER BY mc ASC, vec_id ASC LIMIT 1),"
        )
        if i < k - 1:
            parts.append(
                f"m{i + 1} AS MATERIALIZED (\n"
                f"  SELECT m.vec_id,\n"
                f"         GREATEST(m.mc, CAST(round(1000000000 * list_dot_product(a.u, c.u)) AS BIGINT)) AS mc\n"
                f"  FROM m{i} m JOIN un a ON a.vec_id = m.vec_id,\n"
                f"       (SELECT un.u FROM un JOIN p{i} USING (vec_id)) c\n"
                f"  WHERE m.vec_id NOT IN (SELECT vec_id FROM p{i})),"
            )
    sels = ["SELECT CAST(0 AS BIGINT) AS sel_order, CAST(1 AS BIGINT) AS vec_id, CAST(1000000000 AS BIGINT) AS maxcos_q9"]
    sels += [
        f"SELECT CAST({i} AS BIGINT), vec_id, mc FROM p{i}" for i in range(1, k)
    ]
    parts.append("sel AS (" + " UNION ALL ".join(sels) + ")")
    parts.append("SELECT sel_order, vec_id, maxcos_q9 FROM sel ORDER BY sel_order")
    return "\n".join(parts)


@register("kcenter_coreset", _kcenter_sql())
def kcenter_coreset(spark, sf_dir):
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal):
    pick 8 maximally-diverse representative vectors — seed at vec_id 1
    (the kmeans seed convention), then repeatedly choose the vector LEAST
    similar to its nearest already-chosen center. The selection order and
    each pick's max-cosine-at-selection are the output: the curation
    primitive for diverse seed/eval-set selection, and the 2-approximation
    to the k-center clustering objective. Decisions compare q9-rounded
    cosines with a vec_id tiebreak, so both engines pick identical
    centers.

    Scale shape: each of the 7 rounds is one broadcast of the single new
    center onto the running max-cos table (map-side GREATEST — the
    running table means round i costs O(N), not O(N·i)) plus one
    TakeOrdered(1); the table is localCheckpoint'd per round to cut the
    unrolled lineage. Driver state is exactly the k chosen rows — the
    same bounded-collect budget as kmeans training."""
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, z) -> acc + z)"
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    un = (
        e.where(F.col("vec_id") != 0)
        .withColumn("n", F.sqrt(F.expr(dot.format(a="v", b="v"))))
        .select("vec_id", F.expr("transform(v, x -> x / n)").alias("u"))
        .localCheckpoint()
    )
    cos_q9 = F.expr(
        f"cast(round(1000000000 * ({dot.format(a='u', b='cu')})) as bigint)"
    )
    center = un.where(F.col("vec_id") == 1).select(F.col("u").alias("cu"))
    m = (
        un.where(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(center))
        .select("vec_id", "u", cos_q9.alias("mc"))
        .localCheckpoint()
    )
    chosen = [(0, 1, 1_000_000_000)]
    for i in range(1, _KCENTER_K):
        pick = m.orderBy(F.asc("mc"), F.asc("vec_id")).limit(1).collect()[0]
        chosen.append((i, pick.vec_id, pick.mc))
        if i == _KCENTER_K - 1:
            break
        center = un.where(F.col("vec_id") == pick.vec_id).select(F.col("u").alias("cu"))
        m = (
            m.where(F.col("vec_id") != pick.vec_id)
            .crossJoin(F.broadcast(center))
            .select("vec_id", "u", F.greatest(F.col("mc"), cos_q9).alias("mc"))
            .localCheckpoint()
        )
    return spark.createDataFrame(
        chosen, "sel_order long, vec_id long, maxcos_q9 long"
    ).orderBy("sel_order")


# norm^2 lives in q12 BIGINT per vector (exact); the corpus stats divide
# it to q3 FIRST (n2*n2 at q12 would pass 2^63 immediately) — milli-units
# of squared norm are ample resolution for an outlier flag.
_NORMQA_Z2 = (
    "CASE WHEN nv < 2 OR nv*ss = s*s THEN 0 "
    "ELSE CAST(round(1000000 * (((nv*n2m - s)/nv) * ((nv*n2m - s)/nv)) "
    "/ ((nv*ss - s*s)/(nv*nv))) AS BIGINT) END"
)

_NORMQA_SQL = (
    _SQL_EMB_E
    + """
ex AS (
  SELECT vec_id, i, CAST(round(v[i] * 1000000) AS BIGINT) AS xq
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i) WHERE vec_id <> 0),
n2 AS (SELECT vec_id, CAST(sum(xq * xq) // 1000000000 AS BIGINT) AS n2m
       FROM ex GROUP BY vec_id),
s AS (SELECT CAST(count(*) AS BIGINT) AS nv, CAST(sum(n2m) AS BIGINT) AS s,
             CAST(sum(n2m * n2m) AS BIGINT) AS ss FROM n2)
SELECT vec_id, n2m AS norm2_q3, """
    + _NORMQA_Z2
    + """ AS z2_q6
FROM n2 CROSS JOIN s ORDER BY z2_q6 DESC, vec_id ASC LIMIT 20"""
)


@register("embedding_norm_outliers", _NORMQA_SQL)
def embedding_norm_outliers(spark, sf_dir):
    """Embedding QA: the 20 most norm-anomalous vectors by squared z-score
    of ||v||^2 against the corpus — catches truncated/zeroed/blown-up
    rows from a bad embedding batch before they poison ANN recall.
    Per-vector squared norm is an exact q12 BIGINT (sum of squared q6
    elements) floored to q3 before the corpus stats so no product passes
    2^63; z^2 uses the float-mean form over exact doubles.

    Scale shape: one exploded map-side pass per vector, a 1-row stats
    agg broadcast back, one TakeOrdered(20)."""
    ex = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias("i", "x"),
        )
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
    )
    n2 = ex.groupBy("vec_id").agg(
        F.expr("cast(sum(xq * xq) div 1000000000 as bigint)").alias("n2m")
    )
    s = n2.agg(
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.sum("n2m").cast("long").alias("s"),
        F.sum(F.expr("n2m * n2m")).cast("long").alias("ss"),
    )
    return (
        n2.crossJoin(F.broadcast(s))
        .select(
            "vec_id",
            F.col("n2m").alias("norm2_q3"),
            F.expr(_NORMQA_Z2).alias("z2_q6"),
        )
        .orderBy(F.desc("z2_q6"), F.asc("vec_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# session 23 — streaming-maintained count-min sketch (batch twin)
# ---------------------------------------------------------------------------


@register(
    "countmin_user_cells",
    """WITH pos AS (
  SELECT i,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1 + 4 * i, 4))::INT % 1024 AS pos
  FROM events, unnest([0, 1, 2, 3]) AS t(i))
SELECT CAST(i AS BIGINT) AS i, CAST(pos AS BIGINT) AS pos,
       CAST(count(*) AS BIGINT) AS cell
FROM pos GROUP BY i, pos ORDER BY i, pos""",
)
def countmin_user_cells(spark, sf_dir):
    """Batch twin of the streaming count-min maintenance
    (streaming/events.py::countmin_user_stream): the 4 x 1024 CMS cell
    table of per-user event counts. Cells are ADDITIVE, so the streaming
    side maintains the identical table as a running aggregation whose
    state is 4 096 rows regardless of stream length — stream-vs-batch
    identity is pytest-proven (test_events_streaming.py). Same hash
    family as countmin_heavyhitters, keyed on user_id."""
    from docix_spark.streaming.events import countmin_user_cells as _twin

    return _twin(_events(spark, sf_dir)).select(
        F.col("i").cast("long").alias("i"),
        F.col("pos").cast("long").alias("pos"),
        "cell",
    )


# ---------------------------------------------------------------------------
# session 24 — trained n-gram language ID, fixed-size priority sample
# ---------------------------------------------------------------------------

_CT_K = 20  # profile size (and the out-of-place max penalty)

# char 1-/2-/3-grams of every token occurrence: three explicit UNION ALL
# levels with a length guard each — Spark sequence(1, 0) infers step -1
# and emits junk, and DuckDB laterals referencing an unnested L are
# fragile; three selects are identical everywhere.
_CT_GRAMS_DUCK = """
  SELECT doc_id, lang, substring(term, i, 1) AS g
  FROM toks, unnest(generate_series(1, len(term))) AS t1(i)
  UNION ALL
  SELECT doc_id, lang, substring(term, i, 2) AS g
  FROM toks, unnest(generate_series(1, len(term) - 1)) AS t2(i) WHERE len(term) >= 2
  UNION ALL
  SELECT doc_id, lang, substring(term, i, 3) AS g
  FROM toks, unnest(generate_series(1, len(term) - 2)) AS t3(i) WHERE len(term) >= 3
"""

_CT_SQL = f"""WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents),
g AS ({_CT_GRAMS_DUCK}),
prof AS (
  SELECT lang, g, row_number() OVER (
    PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS rp
  FROM g GROUP BY lang, g QUALIFY rp <= {_CT_K}),
docg AS (
  SELECT doc_id, g, row_number() OVER (
    PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rd
  FROM g GROUP BY doc_id, g QUALIFY rd <= {_CT_K}),
langs AS (SELECT DISTINCT lang FROM documents),
dist AS (
  SELECT d.doc_id, l.lang,
         CAST(sum(COALESCE(abs(d.rd - p.rp), {_CT_K})) AS BIGINT) AS dist
  FROM docg d CROSS JOIN langs l
  LEFT JOIN prof p ON p.lang = l.lang AND p.g = d.g
  GROUP BY d.doc_id, l.lang),
pred AS (
  SELECT doc_id, lang AS pred_lang FROM (
    SELECT doc_id, lang, row_number() OVER (
      PARTITION BY doc_id ORDER BY dist ASC, lang ASC) AS rn
    FROM dist) WHERE rn = 1)
SELECT dcl.lang, pred.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM (SELECT doc_id, lang FROM documents) dcl JOIN pred USING (doc_id)
GROUP BY dcl.lang, pred.pred_lang ORDER BY dcl.lang, pred.pred_lang"""


@register("cavnar_trenkle_langid", _CT_SQL)
def cavnar_trenkle_langid(spark, sf_dir):
    """Cavnar-Trenkle n-gram language ID (the 1994 'N-Gram-Based Text
    Categorization' classifier): per-language profiles are the top-20
    char 1-/2-/3-grams TRAINED from the corpus's own labels, a document
    is classified by the out-of-place distance between its own top-20
    gram ranking and each profile (missing gram = max penalty 20),
    argmin wins. Reported as the declared-vs-predicted confusion matrix
    — the TRAINED counterpart of lang_id_heuristic's hand-written
    stopword profiles.

    Scale shape: profiles are |langs| x 20 rows (broadcast); the per-doc
    ranking windows run over doc-bounded gram counts; the distance join
    fans each doc's <= 20 grams across |langs| — candidates only, never
    corpus x corpus. All-integer ranks and distances.

    Honesty note (the PQ-recall rule): the sandbox corpus's lang labels
    are weakly signaled — 'zh' docs carry the same shared vocabulary —
    so accuracy is ~0.33 vs the stopword heuristic's 0.36 and a 0.2
    chance floor; a K sweep (20/50/100/200) moves nothing. The OPERATOR
    SHAPE is what ships; on real multilingual text C&T profiles separate
    cleanly."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.explode(spark_tokens("text")).alias("term")
    )
    levels = []
    for L in (1, 2, 3):
        levels.append(
            toks.where(F.length("term") >= L).select(
                "doc_id",
                "lang",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, length(term) - {L - 1}), i -> substring(term, i, {L}))"
                    )
                ).alias("g"),
            )
        )
    g = levels[0].unionByName(levels[1]).unionByName(levels[2]).localCheckpoint()
    wp = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    prof = (
        g.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rp", F.row_number().over(wp))
        .where(F.col("rp") <= _CT_K)
        .select("lang", "g", "rp")
    )
    wd = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    docg = (
        g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rd", F.row_number().over(wd))
        .where(F.col("rd") <= _CT_K)
        .select("doc_id", "g", "rd")
    )
    langs = _docs(spark, sf_dir).select("lang").distinct()
    dist = (
        docg.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["lang", "g"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.coalesce(F.abs(F.col("rd") - F.col("rp")), F.lit(_CT_K)))
            .cast("long")
            .alias("dist")
        )
    )
    wn = Window.partitionBy("doc_id").orderBy(F.asc("dist"), F.asc("lang"))
    pred = (
        dist.withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


@register(
    "priority_sample_docs",
    """SELECT doc_id, source, substr(md5(CAST(doc_id AS VARCHAR)), 9, 4) AS hk
FROM documents ORDER BY hk, doc_id LIMIT 100""",
)
def priority_sample_docs(spark, sf_dir):
    """Priority sampling: an EXACTLY-100-row uniform corpus sample as the
    top-100 by a content-independent hash key — one TakeOrdered, no
    global sort, no rate tuning (stratified_sample admits by rate and
    returns a binomial-sized sample; this returns a fixed-size one, the
    shape an eval-set builder needs). Hash coordinate is md5 hex chars
    9-12 — independent of the shard (1-4) and split (5-8) coordinates, so
    sampling is orthogonal to sharding and hold-out.

    Scale shape: TakeOrdered(100) over a map-side projection — per-
    partition top-100 then a driver merge; nothing global."""
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "source",
            F.expr("substring(md5(cast(doc_id as string)), 9, 4)").alias("hk"),
        )
        .orderBy("hk", "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# session 25 — RAG window chunking, shingle-size tuning curve, epoch
# shuffle plan
# ---------------------------------------------------------------------------

_SWC_W, _SWC_S = 128, 64  # window / stride (HF tokenizers' return_overflowing semantics)


@register(
    "sliding_window_chunks",
    f"""WITH t AS (
  SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n
  FROM documents),
nc AS (
  SELECT doc_id, n,
         CASE WHEN n <= {_SWC_W} THEN 1
              ELSE (n - {_SWC_W} + {_SWC_S} - 1) // {_SWC_S} + 1 END AS n_chunks
  FROM t WHERE n >= 1),
c AS (
  SELECT doc_id, i AS chunk_idx, CAST(i * {_SWC_S} AS BIGINT) AS start_pos,
         CAST(LEAST({_SWC_W}, n - i * {_SWC_S}) AS BIGINT) AS chunk_len
  FROM nc, unnest(generate_series(0, n_chunks - 1)) AS u(i))
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, start_pos, chunk_len
FROM c ORDER BY doc_id, chunk_idx""",
)
def sliding_window_chunks(spark, sf_dir):
    """RAG/pretraining window chunking: overlapping 128-token windows at
    stride 64 per document (HF tokenizers' return_overflowing_tokens
    semantics: chunk count = 1 for n <= W else ceil((n-W)/S)+1, so every
    token is covered and the final chunk may be short). The output is
    the chunk GEOMETRY — (doc, index, start, length) — which is what a
    downstream embed-and-index pass maps over; emitting text would just
    re-serialize the corpus.

    Scale shape: one map-side token count per doc, then a per-doc
    integer explode of n_chunks rows — no shuffle at all until the
    output sort (which a real pipeline drops). All-integer chunk math."""
    t = _docs(spark, sf_dir).select(
        "doc_id", F.size(spark_tokens("text")).cast("long").alias("n")
    )
    nc = t.where(F.col("n") >= 1).withColumn(
        "n_chunks",
        F.expr(
            f"CASE WHEN n <= {_SWC_W} THEN 1"
            f" ELSE (n - {_SWC_W} + {_SWC_S} - 1) div {_SWC_S} + 1 END"
        ),
    )
    return (
        nc.select(
            "doc_id",
            "n",
            F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * F.lit(_SWC_S)).cast("long").alias("start_pos"),
            F.expr(f"cast(least({_SWC_W}, n - chunk_idx * {_SWC_S}) as bigint)").alias(
                "chunk_len"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# one gram level per shingle size k — explicit selects, the session-24 rule
def _shingle_level_duck(k: int) -> str:
    gram = " || ' ' || ".join(
        f"words[i+{j}]" if j else "words[i]" for j in range(k)
    )
    return (
        f"SELECT {k} AS k, doc_id, {gram} AS g\n"
        f"  FROM w, unnest(generate_series(1, len(words) - {k - 1})) AS t{k}(i)"
        f" WHERE len(words) >= {k}"
    )


@register(
    "shingle_size_curve",
    f"""WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words FROM documents),
g AS ({" UNION ALL ".join(_shingle_level_duck(k) for k in (2, 3, 4))}),
d AS (SELECT k, g, CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM g GROUP BY k, g)
SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(n) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE df >= 2) AS BIGINT) AS n_cross_doc
FROM d GROUP BY k ORDER BY k""",
)
def shingle_size_curve(spark, sf_dir):
    """Shingle-size tuning curve for the dedup blocking key: at k = 2/3/4
    words, the distinct-shingle count, total occurrences, and how many
    shingles appear in 2+ documents — the k that balances collision rate
    (small k = everything collides) against recall (big k = near-dups
    stop sharing shingles). Completes the tuning-diagnostic family
    (lsh_candidate_precision / simhash_hamming_histogram) on the third
    axis the MinHash ops fix by fiat (k=3).

    Scale shape: per-level map-side explodes into one (k, gram) two-phase
    agg; the curve is 3 rows."""
    w = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words"))
    levels = []
    for k in (2, 3, 4):
        gram = ", ".join(f"words[i+{j}]" if j else "words[i]" for j in range(k))
        levels.append(
            w.where(F.size("words") >= k).select(
                F.lit(k).cast("long").alias("k"),
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, size(words)-{k}), i -> concat_ws(' ', {gram}))"
                    )
                ).alias("g"),
            )
        )
    g = levels[0].unionByName(levels[1]).unionByName(levels[2])
    d = g.groupBy("k", "g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    return (
        d.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum("n").cast("long").alias("n_total"),
            F.count_if(F.col("df") >= 2).cast("long").alias("n_cross_doc"),
        )
        .orderBy("k")
    )


@register(
    "epoch_shuffle_order",
    """WITH r AS (
  SELECT e.epoch, d.doc_id,
         md5('e' || CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS hk
  FROM documents d, (SELECT unnest([1, 2]) AS epoch) e),
rk AS (
  SELECT epoch, doc_id,
         row_number() OVER (PARTITION BY epoch ORDER BY hk, doc_id) AS rank
  FROM r)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(rank AS BIGINT) AS rank, doc_id
FROM rk WHERE rank <= 20 ORDER BY epoch, rank""",
)
def epoch_shuffle_order(spark, sf_dir):
    """Deterministic per-epoch data-loader shuffle: epoch e's document
    order is ORDER BY md5('e' || e || ':' || doc_id) — reproducible
    across reruns and engines, different between epochs, no RNG state to
    checkpoint (the property torch's DistributedSampler gets from
    set_epoch, as a relational operator). First 20 positions of epochs
    1-2 are the contract sample.

    Scale shape: the hash is map-side; the per-epoch rank is a window
    whose top-20 a real loader never materializes globally (it streams
    the order); here the sample keeps the contract small. At scale the
    shuffle IS the shard assignment: hash-range-partition by hk and read
    shards in order."""
    epochs = spark.createDataFrame([(1,), (2,)], "epoch long")
    r = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .select(
            "epoch",
            "doc_id",
            F.expr(
                "md5(concat('e', cast(epoch as string), ':', cast(doc_id as string)))"
            ).alias("hk"),
        )
    )
    wk = Window.partitionBy("epoch").orderBy("hk", "doc_id")
    return (
        r.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= 20)
        .select("epoch", F.col("rank").cast("long").alias("rank"), "doc_id")
        .orderBy("epoch", "rank")
    )


# ---------------------------------------------------------------------------
# session 26 — batch padding efficiency, vocab coverage curve, trained
# multinomial naive Bayes language ID
# ---------------------------------------------------------------------------

# shared float expression strings (the session-19 rule: ONE textual form in
# both engines so the double rounds identically)
_PAD_OVERHEAD_EXPR = (
    "cast(round(1000000 * ((bucket_cap * n_docs - sum_tokens)"
    " / cast(bucket_cap * n_docs as double))) as bigint)"
)
_VOCAB_COV_EXPR = (
    "cast(round(1000000 * (covered_tokens / cast(total_tokens as double))) as bigint)"
)
_NB_LAM_EXPR = "cast(round(1000000 * ln((c + 1) / cast(ntok + vs as double))) as bigint)"
_NB_LAM0_EXPR = "cast(round(1000000 * ln(1 / cast(ntok + vs as double))) as bigint)"
_NB_PRI_EXPR = "cast(round(1000000 * ln(nd / cast(n as double))) as bigint)"


@register(
    "pad_efficiency_buckets",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n
  FROM documents),
b AS (
  SELECT ((n + 63) // 64) * 64 AS bucket_cap,
         CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens
  FROM t WHERE n >= 1 GROUP BY 1)
SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap, n_docs, sum_tokens,
       {_PAD_OVERHEAD_EXPR} AS pad_overhead_q6
FROM b ORDER BY bucket_cap""",
)
def pad_efficiency_buckets(spark, sf_dir):
    """Dynamic-batching diagnostic: bucket documents by padded length
    (next multiple of 64 tokens — the bucketed-batching trick every
    training loader uses to bound padding waste), and report per bucket
    the doc count, real token count, and the padding overhead
    (padded - real) / padded in q6. The curve tells you what fraction of
    batch FLOPs a given bucket granularity burns on pad tokens.

    Scale shape: map-side token count + integer bucket key, one small
    groupBy (bucket count = max_len / 64 rows). Overhead divides exact
    BIGINTs under 2^53 in one shared float expression."""
    t = _docs(spark, sf_dir).select(
        F.size(spark_tokens("text")).cast("long").alias("n")
    )
    b = (
        t.where(F.col("n") >= 1)
        .groupBy(F.expr("((n + 63) div 64) * 64").alias("bucket_cap"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("sum_tokens"),
        )
    )
    return b.select(
        F.col("bucket_cap").cast("long").alias("bucket_cap"),
        "n_docs",
        "sum_tokens",
        F.expr(_PAD_OVERHEAD_EXPR).alias("pad_overhead_q6"),
    ).orderBy("bucket_cap")


_VOCAB_KS = (4, 8, 16, 32)


@register(
    "vocab_coverage_curve",
    f"""WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term FROM documents),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM tf),
rk AS (SELECT term, c, row_number() OVER (ORDER BY c DESC, term ASC) AS rn
       FROM tf QUALIFY rn <= {max(_VOCAB_KS)}),
ks AS (SELECT unnest({list(_VOCAB_KS)}) AS k),
cov AS (
  SELECT k, CAST(count(*) AS BIGINT) AS vocab_terms,
         CAST(sum(c) AS BIGINT) AS covered_tokens
  FROM rk JOIN ks ON rk.rn <= ks.k GROUP BY k)
SELECT CAST(k AS BIGINT) AS k, vocab_terms, covered_tokens, total_tokens,
       {_VOCAB_COV_EXPR} AS coverage_q6
FROM cov CROSS JOIN tot ORDER BY k""",
)
def vocab_coverage_curve(spark, sf_dir):
    """Vocabulary coverage curve: what fraction of all token occurrences
    the top-k most frequent terms cover, at k = 4/8/16/32 (ties broken
    term-ascending) — the tokenizer/vocab-size tuning curve (1 − coverage
    is the OOV rate a k-entry vocab would eat). Complements
    heaps_law_source (vocab GROWTH) with vocab CONCENTRATION.

    Scale shape: one term-count agg, then TakeOrdered(32) — the global
    ranking window runs over 32 collected rows, never the vocabulary;
    totals are a 1-row broadcast. The k fan-out is a broadcast theta-join
    against 32 rows."""
    tf = (
        _docs(spark, sf_dir)
        .select(F.explode(spark_tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = tf.agg(F.sum("c").cast("long").alias("total_tokens"))
    top = tf.orderBy(F.desc("c"), F.asc("term")).limit(max(_VOCAB_KS))
    rk = top.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("term")))
    )
    ks = spark.createDataFrame([(k,) for k in _VOCAB_KS], "k long")
    cov = (
        rk.crossJoin(F.broadcast(ks))
        .where(F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_terms"),
            F.sum("c").cast("long").alias("covered_tokens"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "vocab_terms",
            "covered_tokens",
            "total_tokens",
            F.expr(_VOCAB_COV_EXPR).alias("coverage_q6"),
        )
        .orderBy("k")
    )


_NB_SQL = f"""WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term),
ct AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY lang, term),
v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS vs FROM toks),
tl AS (SELECT lang, CAST(count(*) AS BIGINT) AS ntok FROM toks GROUP BY lang),
pri AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY lang),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
lam AS (
  SELECT ct.lang, ct.term, {_NB_LAM_EXPR} AS lam_q6
  FROM ct JOIN tl USING (lang) CROSS JOIN v),
l0 AS (
  SELECT tl.lang, {_NB_LAM0_EXPR} AS lam0_q6, {_NB_PRI_EXPR} AS pri_q6
  FROM tl JOIN pri USING (lang) CROSS JOIN v CROSS JOIN nn),
sc AS (
  SELECT f.doc_id, l.lang,
         l.pri_q6 + CAST(sum(f.tf * COALESCE(m.lam_q6, l.lam0_q6)) AS BIGINT) AS score
  FROM tf f CROSS JOIN l0 l
  LEFT JOIN lam m ON m.lang = l.lang AND m.term = f.term
  GROUP BY f.doc_id, l.lang, l.pri_q6),
pred AS (
  SELECT doc_id, lang AS pred_lang FROM (
    SELECT doc_id, lang, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
    FROM sc) WHERE rn = 1)
SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY d.lang, p.pred_lang ORDER BY d.lang, p.pred_lang"""


@register("naive_bayes_langid", _NB_SQL)
def naive_bayes_langid(spark, sf_dir):
    """Multinomial naive Bayes language ID trained on the corpus's own
    labels (the fastText-baseline linear-classifier family): add-1
    smoothed token likelihoods p(t|l) = (c+1)/(ntok_l + |V|) and doc
    priors, argmax of log prior + Σ tf·log p(t|l); reported as the
    declared-vs-predicted confusion matrix. Third model family next to
    lang_id_heuristic (hand stopword lists) and cavnar_trenkle_langid
    (char-gram rank profiles).

    Determinism: per-(lang,term) log-likelihood is q6-rounded FIRST
    (one shared ln expression string both engines), doc scores are exact
    BIGINT sums of tf·λ_q6 — no float accumulation order anywhere.
    Empty docs have no tf rows and drop out of the matrix on both sides.

    Scale shape: tf and ct are two-phase aggs off one tokenize pass
    (localCheckpoint'd — two consumers); λ join is candidates-only on
    term (un-hinted: vocab×langs is unbounded, AQE decides); priors and
    per-lang constants broadcast; argmax is a doc-bounded window."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", F.explode(spark_tokens("text")).alias("term"))
        .localCheckpoint()
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    ct = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    v = ct.agg(F.countDistinct("term").cast("long").alias("vs"))
    tl = ct.groupBy("lang").agg(F.sum("c").cast("long").alias("ntok"))
    pri = _docs(spark, sf_dir).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    nn = _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n"))
    lam = (
        ct.join(F.broadcast(tl), "lang")
        .crossJoin(F.broadcast(v))
        .select("lang", "term", F.expr(_NB_LAM_EXPR).alias("lam_q6"))
    )
    l0 = (
        tl.join(F.broadcast(pri), "lang")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(nn))
        .select(
            "lang",
            F.expr(_NB_LAM0_EXPR).alias("lam0_q6"),
            F.expr(_NB_PRI_EXPR).alias("pri_q6"),
        )
    )
    sc = (
        tf.crossJoin(F.broadcast(l0))
        .join(lam, ["lang", "term"], "left")
        .groupBy("doc_id", "lang", "pri_q6")
        .agg(
            F.sum(
                F.col("tf") * F.coalesce(F.col("lam_q6"), F.col("lam0_q6"))
            ).cast("long").alias("s")
        )
        .select("doc_id", "lang", (F.col("pri_q6") + F.col("s")).alias("score"))
    )
    wn = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    pred = (
        sc.withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# session 27 — windowed co-occurrence PPMI, LSH (b,r) config sweep,
# streaming-maintained HLL registers (batch twin)
# ---------------------------------------------------------------------------

# divide-first PPMI over exact BIGINTs; cast(0 as double) because a plain
# 0.0 literal is DECIMAL in Spark SQL
_PPMI_EXPR = (
    "cast(round(1000000 * greatest(cast(0 as double), ln((w_ab / cast(w_tot as double))"
    " / ((n_a / cast(n_tok as double)) * (n_b / cast(n_tok as double)))))) as bigint)"
)


@register(
    "cooccurrence_ppmi",
    f"""WITH w AS ({SQL_WORDS}),
p AS (
  SELECT least(words[i], words[i+1]) AS a, greatest(words[i], words[i+1]) AS b, 2 AS wt
  FROM w, unnest(generate_series(1, len(words) - 1)) AS t1(i) WHERE len(words) >= 2
  UNION ALL
  SELECT least(words[i], words[i+2]), greatest(words[i], words[i+2]), 1
  FROM w, unnest(generate_series(1, len(words) - 2)) AS t2(i) WHERE len(words) >= 3),
pc AS (SELECT a, b, CAST(sum(wt) AS BIGINT) AS w_ab FROM p GROUP BY a, b),
uc AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM ({SQL_TOKS}) GROUP BY term),
tot AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM uc) AS n_tok,
               (SELECT CAST(sum(w_ab) AS BIGINT) FROM pc) AS w_tot)
SELECT a AS term_a, b AS term_b, w_ab, {_PPMI_EXPR} AS ppmi_q6
FROM pc JOIN (SELECT term, n AS n_a FROM uc) ua ON ua.term = pc.a
        JOIN (SELECT term, n AS n_b FROM uc) ub ON ub.term = pc.b
        CROSS JOIN tot
WHERE w_ab >= 4
ORDER BY ppmi_q6 DESC, term_a ASC, term_b ASC LIMIT 30""",
)
def cooccurrence_ppmi(spark, sf_dir):
    """GloVe/word2vec-style distance-weighted co-occurrence + PPMI: every
    unordered token pair within a +-2 window, weighted 2/d (d=1 -> 2,
    d=2 -> 1, exact integers), PPMI = max(0, ln(p(a,b)/(p(a)p(b)))) over
    the weighted pair distribution; top-30 pairs at weight >= 4 (the
    classic min-count guard against rare-pair PMI blowup). The
    co-occurrence matrix build step of an embedding-training pipeline —
    windowed and distance-weighted where collocations_pmi is
    adjacent-bigram only.

    Scale shape: pair generation is a per-doc map-side transform (no
    position self-join — offsets +1/+2 are array indexing), then ONE
    (a,b) groupBy; unigram joins are term-keyed and un-hinted (vocab is
    unbounded — AQE decides); totals broadcast; top-30 is a TakeOrdered
    over quantized scores with (a,b) tiebreak."""
    w = (
        _docs(spark, sf_dir)
        .select("doc_id", spark_tokens("text").alias("words"))
        .localCheckpoint()
    )
    lv = []
    for d, wt in ((1, 2), (2, 1)):
        lv.append(
            w.where(F.size("words") >= d + 1).select(
                F.explode(
                    F.expr(
                        f"transform(sequence(0, size(words)-{d + 1}),"
                        f" i -> struct(least(words[i], words[i+{d}]) as a,"
                        f" greatest(words[i], words[i+{d}]) as b))"
                    )
                ).alias("p"),
                F.lit(wt).alias("wt"),
            ).select("p.a", "p.b", "wt")
        )
    pc = (
        lv[0].unionByName(lv[1])
        .groupBy("a", "b")
        .agg(F.sum("wt").cast("long").alias("w_ab"))
    )
    uc = (
        w.select(F.explode("words").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = uc.agg(F.sum("n").cast("long").alias("n_tok")).crossJoin(
        pc.agg(F.sum("w_ab").cast("long").alias("w_tot"))
    )
    return (
        pc.where(F.col("w_ab") >= 4)
        .join(uc.select(F.col("term").alias("a"), F.col("n").alias("n_a")), "a")
        .join(uc.select(F.col("term").alias("b"), F.col("n").alias("n_b")), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            "w_ab",
            F.expr(_PPMI_EXPR).alias("ppmi_q6"),
        )
        .orderBy(F.desc("ppmi_q6"), F.asc("term_a"), F.asc("term_b"))
        .limit(30)
    )


@register(
    "lsh_band_config_curve",
    f"""WITH sh AS MATERIALIZED ({_SQL_SHINGLES}),
sig AS MATERIALIZED (
  SELECT doc_id, min(md5('0:' || sh)) AS m0, min(md5('1:' || sh)) AS m1,
         min(md5('2:' || sh)) AS m2, min(md5('3:' || sh)) AS m3
  FROM sh GROUP BY doc_id),
bands AS (
  SELECT 1 AS b, doc_id, '0:' || m0 || m1 || m2 || m3 AS band FROM sig
  UNION ALL SELECT 2, doc_id, '0:' || m0 || m1 FROM sig
  UNION ALL SELECT 2, doc_id, '1:' || m2 || m3 FROM sig
  UNION ALL SELECT 4, doc_id, '0:' || m0 FROM sig
  UNION ALL SELECT 4, doc_id, '1:' || m1 FROM sig
  UNION ALL SELECT 4, doc_id, '2:' || m2 FROM sig
  UNION ALL SELECT 4, doc_id, '3:' || m3 FROM sig),
pairs AS (
  SELECT DISTINCT a.b, a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2
    ON a.b = b2.b AND a.band = b2.band AND a.doc_id < b2.doc_id),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.b, p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS c,
         any_value(na.n) AS na, any_value(nb.n) AS nb
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh bb ON bb.doc_id = p.doc_b AND bb.sh = a.sh
  JOIN sizes na ON na.doc_id = p.doc_a
  JOIN sizes nb ON nb.doc_id = p.doc_b
  GROUP BY p.b, p.doc_a, p.doc_b),
cand AS (SELECT b, CAST(count(*) AS BIGINT) AS n_cand FROM pairs GROUP BY b),
tru AS (SELECT b, CAST(count(*) FILTER (3 * c >= na + nb) AS BIGINT) AS n_true
        FROM inter GROUP BY b),
cfg AS (SELECT unnest([1, 2, 4]) AS b)
SELECT CAST(cfg.b AS BIGINT) AS n_bands, CAST(4 // cfg.b AS BIGINT) AS rows_per_band,
       COALESCE(n_cand, 0) AS n_cand, COALESCE(n_true, 0) AS n_true,
       CASE WHEN COALESCE(n_cand, 0) = 0 THEN 0
            ELSE (COALESCE(n_true, 0) * 1000000) // n_cand END AS precision_q6
FROM cfg LEFT JOIN cand ON cand.b = cfg.b LEFT JOIN tru ON tru.b = cfg.b
ORDER BY n_bands""",
)
def lsh_band_config_curve(spark, sf_dir):
    """MinHash banding (b, r) sweep over the 4-permutation signature:
    b=1/r=4 (full-signature equality), b=2/r=2 (the shipped config),
    b=4/r=1 (single-hash bands) — per config the candidate-pair count,
    how many clear exact Jaccard >= 0.5 (integer cross-mult 3c >= na+nb),
    and the precision. The S-curve knob itself, completing the dedup
    tuning family: shingle_size_curve tunes k, lsh_candidate_precision
    reads one config, this sweeps the configs. Candidate sets nest
    (b=1 subset of b=2 subset of b=4) — pytest-proven.

    Scale shape: bands are 7 map-side projections of the doc-keyed
    signature table; pairs come from per-config band equi-joins (the
    shuffle carries signatures, never documents); the exact intersection
    runs on CANDIDATES ONLY; the report is 3 rows."""
    sh = _shingles_spark(spark, sf_dir).localCheckpoint()
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"m{i}")
        for i in range(4)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    # ONE map-side explode of 7 (config, band) structs per doc — a 7-way
    # union of sig projections would re-run the signature agg per leg
    parts = [
        (1, "0:", ["m0", "m1", "m2", "m3"]),
        (2, "0:", ["m0", "m1"]),
        (2, "1:", ["m2", "m3"]),
        (4, "0:", ["m0"]),
        (4, "1:", ["m1"]),
        (4, "2:", ["m2"]),
        (4, "3:", ["m3"]),
    ]
    structs = [
        F.struct(
            F.lit(b).alias("b"),
            F.concat(F.lit(pfx), *[F.col(c) for c in cols]).alias("band"),
        )
        for b, pfx, cols in parts
    ]
    bands = sig.select("doc_id", F.explode(F.array(*structs)).alias("x")).select(
        F.col("x.b").alias("b"), "doc_id", F.col("x.band").alias("band")
    )
    a, b2 = bands.alias("a"), bands.alias("b2")
    pairs = (
        a.join(
            b2,
            (F.col("a.b") == F.col("b2.b"))
            & (F.col("a.band") == F.col("b2.band"))
            & (F.col("a.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("a.b").alias("b"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b2.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .where(F.col("sh") == F.col("sh_b"))
        .groupBy("b", "doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )
    cand = pairs.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    tru = inter.groupBy("b").agg(
        F.count_if(F.expr("3 * c >= na + nb")).cast("long").alias("n_true")
    )
    cfg = spark.createDataFrame([(1,), (2,), (4,)], "b long")
    return (
        cfg.join(F.broadcast(cand), "b", "left")
        .join(F.broadcast(tru), "b", "left")
        .select(
            F.col("b").cast("long").alias("n_bands"),
            F.expr("cast(4 div b as bigint)").alias("rows_per_band"),
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce(F.col("n_true"), F.lit(0)).cast("long").alias("n_true"),
            F.expr(
                "CASE WHEN COALESCE(n_cand, 0) = 0 THEN 0"
                " ELSE (COALESCE(n_true, 0) * 1000000) div n_cand END"
            ).cast("long").alias("precision_q6"),
        )
        .orderBy("n_bands")
    )


@register(
    "hll_user_registers",
    """WITH h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS h
  FROM events),
rr AS (
  SELECT h % 256 AS reg,
         CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END AS rnk
  FROM h)
SELECT CAST(reg AS BIGINT) AS reg, CAST(max(rnk) AS BIGINT) AS maxr
FROM rr GROUP BY reg ORDER BY reg""",
)
def hll_user_registers(spark, sf_dir):
    """Batch twin of the streaming HLL maintenance
    (streaming/events.py::hll_user_stream): the 256-register table of
    distinct-user structure over the events stream, same deterministic
    p=8 family as cardinality_sketch (whose docstring carries the
    estimator math). Registers merge by MAX, so the streaming side
    maintains the identical table as a complete-mode running aggregation
    with <= 256 rows of state — stream-vs-batch identity is pytest-proven
    (test_events_streaming.py). Duplicate user_ids need no distinct pass:
    max absorbs them, which is exactly what makes the sketch streamable."""
    from docix_spark.streaming.events import hll_user_registers as _twin

    return _twin(_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# session 28 — robust stats (MAD), deterministic bootstrap, pseudo-relevance
# feedback expansion
# ---------------------------------------------------------------------------

# type-7 median probe shared by both passes: rank r = 0.5 * (n - 1), v_lo /
# v_hi bracket it in the weighted histogram, interpolate. p derived from the
# integer 500000 — never a decimal literal (doclen_quantiles rule).
_MED_RANK = "(500000 / 1000000.0) * (n - 1)"


@register(
    "mad_doclen",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
hist AS (SELECT source, n_tok AS v, count(*) AS cnt FROM t GROUP BY source, n_tok),
h AS (
  SELECT source, v, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM hist),
med AS (
  SELECT source,
         CAST(round(1000000.0 * (v_lo + (({_MED_RANK}) - floor({_MED_RANK})) * (v_hi - v_lo))) AS BIGINT) AS median_q6
  FROM (
    SELECT source, max(n) AS n,
           max(CASE WHEN cum_before <= floor({_MED_RANK}) THEN v END) AS v_lo,
           max(CASE WHEN cum_before <= floor({_MED_RANK}) + 1 THEN v END) AS v_hi
    FROM h GROUP BY source)),
dev AS (
  SELECT t.source, abs(t.n_tok * 1000000 - m.median_q6) AS d
  FROM t JOIN med m USING (source)),
dhist AS (SELECT source, d AS v, count(*) AS cnt FROM dev GROUP BY source, d),
dh AS (
  SELECT source, v, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM dhist),
mad AS (
  SELECT source,
         CAST(round(v_lo + (({_MED_RANK}) - floor({_MED_RANK})) * (v_hi - v_lo)) AS BIGINT) AS mad_q6
  FROM (
    SELECT source, max(n) AS n,
           max(CASE WHEN cum_before <= floor({_MED_RANK}) THEN v END) AS v_lo,
           max(CASE WHEN cum_before <= floor({_MED_RANK}) + 1 THEN v END) AS v_hi
    FROM dh GROUP BY source))
SELECT source, median_q6, mad_q6 FROM med JOIN mad USING (source) ORDER BY source""",
)
def mad_doclen(spark, sf_dir):
    """ES ``median_absolute_deviation`` aggregation over per-source token
    lengths, EXACT: median of |n_tok − median(n_tok)| (type-7
    interpolation both passes), the robust dispersion measure that a few
    giant crawl documents can't blow up the way variance does. ES ships
    an approximate TDigest version; ours is exact from the same weighted-
    histogram machinery as doclen_quantiles, run twice — deviations are
    q6 BIGINTs so the second histogram is integer-keyed too.

    Scale shape: both passes collapse map-side into (source, value)
    histogram cells bounded by distinct lengths, never raw docs on a
    reducer; the per-source median joins back as a broadcast (|sources|
    rows). No percentile() anywhere (it buffers raw group values)."""
    t = (
        _docs(spark, sf_dir)
        .select("source", F.size(spark_tokens("text")).cast("long").alias("n_tok"))
        .localCheckpoint()
    )

    def _median(vals: DataFrame, val: str, scale: bool) -> DataFrame:
        hist = vals.groupBy("source", val).agg(F.count(F.lit(1)).alias("cnt"))
        w_cum = (
            Window.partitionBy("source")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_all = Window.partitionBy("source")
        h = hist.select(
            "source",
            F.col(val).alias("v"),
            F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
            F.sum("cnt").over(w_all).cast("long").alias("n"),
        )
        rank = F.expr(_MED_RANK)
        agg = h.groupBy("source").agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank), F.col("v"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank) + 1, F.col("v"))).alias("v_hi"),
        )
        r = F.expr(_MED_RANK)
        interp = F.col("v_lo") + (r - F.floor(r)) * (F.col("v_hi") - F.col("v_lo"))
        out = F.lit(1_000_000.0) * interp if scale else interp
        return agg.select("source", F.round(out).cast("long").alias("m"))

    med = _median(t, "n_tok", scale=True).withColumnRenamed("m", "median_q6")
    dev = t.join(F.broadcast(med), "source").select(
        "source",
        F.abs(F.col("n_tok") * F.lit(1_000_000) - F.col("median_q6")).alias("d"),
    )
    mad = _median(dev, "d", scale=False).withColumnRenamed("m", "mad_q6")
    return med.join(mad, "source").select("source", "median_q6", "mad_q6").orderBy("source")


# Poisson(1) inverse-CDF thresholds, folded in Python and inlined in
# e-notation (the HLL-constant rule: decimal literals are DECIMAL in Spark
# SQL). cdf(k) = e^-1 * Σ_{{j<=k}} 1/j!; weights capped at 5
# (P(X>5) ≈ 6e-4 — documented truncation).
_BOOT_T = [
    repr(math.exp(-1.0) * c) for c in (1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0)
]
_BOOT_B = 16
# 13 hex digits = 52 bits; u = k / 2^52 is EXACT in double, so the
# threshold comparisons are deterministic across engines
_BOOT_W_CASE = (
    "CASE WHEN u < {t0} THEN 0 WHEN u < {t1} THEN 1 WHEN u < {t2} THEN 2"
    " WHEN u < {t3} THEN 3 WHEN u < {t4} THEN 4 ELSE 5 END"
).format(t0=_BOOT_T[0], t1=_BOOT_T[1], t2=_BOOT_T[2], t3=_BOOT_T[3], t4=_BOOT_T[4])
_BOOT_MEAN_EXPR = (
    "cast(round(1000000 * (sum_wn / cast(sum_w as double))) as bigint)"
)


@register(
    "bootstrap_mean_doclen",
    f"""WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
u AS (
  SELECT r, n_tok,
         ('0x' || substr(md5('b' || CAST(r AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
           / 4503599627370496.0 AS u
  FROM t, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS r)),
w AS (SELECT r, n_tok, {_BOOT_W_CASE} AS w FROM u),
rep AS (
  SELECT r, CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(w * n_tok) AS BIGINT) AS sum_wn
  FROM w GROUP BY r)
SELECT CAST(r AS BIGINT) AS r, sum_w, sum_wn,
       CASE WHEN sum_w = 0 THEN 0 ELSE {_BOOT_MEAN_EXPR} END AS mean_q6
FROM rep ORDER BY r""",
)
def bootstrap_mean_doclen(spark, sf_dir):
    """Deterministic Poisson bootstrap of the corpus mean document length:
    16 replicates where doc i's weight in replicate r is
    Poisson(1)-distributed via the inverse CDF over a 52-bit md5 uniform
    (u = hash/2^52 is exact in double, thresholds are Python-folded
    e-notation constants — comparisons are bit-identical across engines).
    The replicate means' spread IS the standard error of the mean — the
    sampling-uncertainty readout a data-mix ablation needs, with zero RNG
    state and full reproducibility (a reader takes stddev of mean_q6).
    The Poisson bootstrap (Chamandy et al., 'Estimating Uncertainty for
    Massive Data Streams') is THE distributed form: independent per-doc
    weights need no resample-by-index pass over the corpus.

    Scale shape: the replicate fan-out is a map-side explode of B=16
    weights per doc; each replicate collapses to two BIGINT sufficient
    stats; the output is 16 rows. Weights cap at 5 (P(X>5) ≈ 6e-4,
    documented truncation). mean_q6 guards the all-zero-weight replicate
    (possible only on tiny corpora)."""
    reps = spark.createDataFrame([(r,) for r in range(_BOOT_B)], "r long")
    t = _docs(spark, sf_dir).select(
        "doc_id", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    u = t.crossJoin(F.broadcast(reps)).select(
        "r",
        "n_tok",
        F.expr(
            "cast(conv(substring(md5(concat('b', cast(r as string), ':',"
            " cast(doc_id as string))), 1, 13), 16, 10) as bigint)"
            " / 4503599627370496.0"
        ).alias("u"),
    )
    w = u.select("r", "n_tok", F.expr(_BOOT_W_CASE).alias("w"))
    rep = w.groupBy("r").agg(
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.expr("w * n_tok")).cast("long").alias("sum_wn"),
    )
    return rep.select(
        F.col("r").cast("long").alias("r"),
        "sum_w",
        "sum_wn",
        F.expr(
            f"CASE WHEN sum_w = 0 THEN 0 ELSE {_BOOT_MEAN_EXPR} END"
        ).alias("mean_q6"),
    ).orderBy("r")


_PRF_EXCLUDE = ", ".join(f"'{t}'" for t in _TOPK_TERMS)


@register(
    "prf_rocchio_expand",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
top10 AS (SELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
idf AS (
  SELECT term, CAST(round(1000000 * ln((SELECT n_docs FROM st) / df)) AS BIGINT) AS idf_q6
  FROM dfs),
expd AS (
  SELECT tf.term, CAST(sum(tf.tf * idf.idf_q6) AS BIGINT) AS w_q6
  FROM tf JOIN top10 USING (doc_id) JOIN idf USING (term)
  WHERE tf.term NOT IN ({_PRF_EXCLUDE})
  GROUP BY tf.term)
SELECT term, w_q6, CAST(rank AS BIGINT) AS rank FROM (
  SELECT term, w_q6, row_number() OVER (ORDER BY w_q6 DESC, term ASC) AS rank
  FROM expd)
WHERE rank <= 8 ORDER BY rank""",
)
def prf_rocchio_expand(spark, sf_dir):
    """Pseudo-relevance feedback (Rocchio term selection): run the query,
    take the BM25 top-10 as the pseudo-relevant set, and rank candidate
    expansion terms by Σ tf·idf over that set (idf q6-rounded per TERM
    first, doc sums exact BIGINT), excluding the original query terms —
    the classic two-pass query expansion a retrieval pipeline bolts onto
    BM25 when recall matters (RM1/Rocchio positive centroid, Manning IR
    ch. 9). Top-8 expansion terms with ranks.

    Scale shape: the pseudo-relevant set is the memoized
    `_bm25_match_set` truncated by one TakeOrdered(10) and broadcast back
    into the tf table (a 10-key semi-join — postings for 10 docs, never
    the corpus); idf is a vocab-keyed map-side projection off the shared
    tf exchange; top-8 is a TakeOrdered over exact integers."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    top10 = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10).select("doc_id")
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    st = dl.agg(F.count("*").cast("double").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = dfs.crossJoin(F.broadcast(st)).select(
        "term",
        F.expr("cast(round(1000000 * ln(n_docs / df)) as bigint)").alias("idf_q6"),
    )
    expd = (
        tf.join(F.broadcast(top10), "doc_id")
        .where(~F.col("term").isin(*_TOPK_TERMS))
        .join(idf, "term")
        .groupBy("term")
        .agg(F.sum(F.expr("tf * idf_q6")).cast("long").alias("w_q6"))
    )
    top8 = expd.orderBy(F.desc("w_q6"), F.asc("term")).limit(8)
    return (
        top8.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("w_q6"), F.asc("term"))).cast("long"),
        )
        .select("term", "w_q6", "rank")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# session 29 — learning-to-rank feature extraction, query-performance
# prediction (clarity score)
# ---------------------------------------------------------------------------

_IDF_Q6_EXPR_DUCK = (
    "CAST(round(1000000 * ln(1.0 + ((SELECT n_docs FROM st) - df + 0.5) / (df + 0.5))) AS BIGINT)"
)
_CLARITY_EXPR = (
    "cast(round(1000000 * ((a / cast(atot as double))"
    " * ln((a / cast(atot as double)) / (c / cast(ctot as double))))) as bigint)"
)
