"""driver_queries chunk q03 (original lines 10385-13859): ltr_features, clarity_score, ann_ivf_nprobe_curve, hard_negative_mining, ... events_weekday_profile (49 ops).

Linearized continuation of docix_spark.ops.q02 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q02")

@register(
    "ltr_features",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
top20 AS (
  SELECT doc_id, score_q6, nm,
         row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
  FROM agg QUALIFY rank <= 20),
idf AS (SELECT term, {_IDF_Q6_EXPR_DUCK} AS idf_q6 FROM dfs JOIN q USING (term)),
feat AS (
  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS sum_tf,
         CAST(max(idf.idf_q6) AS BIGINT) AS max_idf_q6
  FROM tf JOIN idf USING (term) JOIN top20 USING (doc_id)
  GROUP BY tf.doc_id)
SELECT t.doc_id, CAST(t.rank AS BIGINT) AS rank, t.score_q6 AS bm25_q6,
       CAST(t.nm AS BIGINT) AS n_matched, CAST(dl.doc_len AS BIGINT) AS doc_len,
       f.sum_tf, f.max_idf_q6
FROM top20 t JOIN dl USING (doc_id) JOIN feat f USING (doc_id)
ORDER BY rank""",
)
def ltr_features(spark, sf_dir):
    """Learning-to-rank feature extraction (the ES LTR plugin's feature-
    logging step): for the query's BM25 top-20, emit the per-(query, doc)
    feature vector a reranker trains on — BM25 score, matched-term count,
    document length, total query-term frequency, and the strongest
    matched term's idf (q6). The output table IS the training set a
    GBDT/cross-encoder reranker consumes; features are exact integers so
    the logged set is reproducible across engines.

    Scale shape: candidates come from the memoized `_bm25_match_set`
    truncated by one TakeOrdered(20); the 20-key set broadcasts back into
    the shared tf exchange for the per-doc feature aggs; idf is a
    map-side projection over query terms only."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    top20 = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))),
        )
    )
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    st = dl.agg(F.count("*").cast("double").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = F.broadcast(spark.createDataFrame([(t,) for t in _TOPK_TERMS], "term string"))
    idf = (
        dfs.join(q, "term")
        .crossJoin(F.broadcast(st))
        .select(
            "term",
            F.expr(
                "cast(round(1000000 * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))) as bigint)"
            ).alias("idf_q6"),
        )
    )
    feat = (
        tf.join(F.broadcast(top20.select("doc_id")), "doc_id")
        .join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("sum_tf"),
            F.max("idf_q6").cast("long").alias("max_idf_q6"),
        )
    )
    return (
        top20.join(dl, "doc_id")
        .join(feat, "doc_id")
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("score_q6").alias("bm25_q6"),
            F.col("nm").cast("long").alias("n_matched"),
            F.col("doc_len").cast("long").alias("doc_len"),
            "sum_tf",
            "max_idf_q6",
        )
        .orderBy("rank")
    )


@register(
    "clarity_score",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
top10 AS (SELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
qtf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS a FROM tf JOIN top10 USING (doc_id) GROUP BY term),
qa AS (SELECT CAST(sum(a) AS BIGINT) AS atot FROM qtf),
ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY term),
cn AS (SELECT CAST(sum(c) AS BIGINT) AS ctot FROM ctf),
contrib AS (
  SELECT qtf.term, {_CLARITY_EXPR} AS kl_q6
  FROM qtf JOIN ctf USING (term) CROSS JOIN qa CROSS JOIN cn)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(COALESCE(sum(kl_q6), 0) AS BIGINT) AS clarity_q6
FROM contrib""",
)
def clarity_score(spark, sf_dir):
    """Query-performance prediction: the CLARITY score (Cronen-Townsend
    et al. 2002) — KL divergence between the language model of the BM25
    top-10 result set and the corpus LM, Σ_t p(t|topk)·ln(p(t|topk)/p(t|C)).
    High clarity = the result set's vocabulary is focused (query is
    answerable); near zero = results look like random corpus text (query
    is ambiguous) — the retrieval-quality readout a query router/rewriter
    keys on, with no relevance labels needed.

    Determinism: the per-TERM KL contribution is q6-rounded first (one
    shared divide-first expression string), the score is an exact BIGINT
    sum. Empty match set → 0 terms, clarity 0, both engines.

    Scale shape: the pseudo-relevant set is the memoized match set's
    TakeOrdered(10) broadcast into tf (postings of 10 docs); the corpus
    LM is the shared term-count agg; the report is one row."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    top10 = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10).select("doc_id")
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    qtf = (
        tf.join(F.broadcast(top10), "doc_id")
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("a"))
    )
    qa = qtf.agg(F.sum("a").cast("long").alias("atot"))
    ctf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("c"))
    cn = ctf.agg(F.sum("c").cast("long").alias("ctot"))
    contrib = (
        qtf.join(ctf, "term")
        .crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(cn))
        .select(F.expr(_CLARITY_EXPR).alias("kl_q6"))
    )
    return contrib.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.coalesce(F.sum("kl_q6"), F.lit(0)).cast("long").alias("clarity_q6"),
    )


# ---------------------------------------------------------------------------
# session 30 — ANN nprobe tuning curve
# ---------------------------------------------------------------------------

_NPROBE_RECALL_EXPR = (
    "cast(round(1000000 * (sum_overlap / cast(10 * n_queries as double))) as bigint)"
)

_NPROBE_SQL = (
    _KMEANS_SQL_PRELUDE
    + f""", qs AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 37 = 0),
bp3 AS MATERIALIZED (
  SELECT qid, qv, cid, rn FROM (
    SELECT qs.qid, qs.qv, c.cid,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             CAST(round(1000000000 * list_dot_product(c.cv, qs.qv)
               / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) DESC,
             c.cid ASC) AS rn
    FROM qs, cent2 c) WHERE rn <= 3),
ps AS (SELECT unnest([1, 2, 3]) AS p),
sc AS MATERIALIZED (
  SELECT ps.p, b.qid, e.vec_id,
         CAST(round(1000000 * list_dot_product(e.v, b.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(b.qv, b.qv)))) AS BIGINT) AS cos_q6
  FROM ps, bp3 b, a3, e
  WHERE b.rn <= ps.p AND a3.cid = b.cid AND e.vec_id = a3.vec_id),
tops AS (
  SELECT p, qid, vec_id FROM (
    SELECT p, qid, vec_id,
           row_number() OVER (PARTITION BY p, qid ORDER BY cos_q6 DESC, vec_id ASC) AS rnk
    FROM sc) WHERE rnk <= 10),
bexact AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT qs.qid, e.vec_id,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             CAST(round(1000000 * list_dot_product(e.v, qs.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) DESC,
             e.vec_id ASC) AS rn
    FROM qs, e WHERE e.vec_id <> 0) WHERE rn <= 10),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM qs),
ov AS (SELECT p, CAST(count(*) AS BIGINT) AS sum_overlap
       FROM tops JOIN bexact USING (qid, vec_id) GROUP BY p),
fin AS (
  SELECT CAST(ps.p AS BIGINT) AS nprobe, n_queries,
         CAST(COALESCE(sum_overlap, 0) AS BIGINT) AS sum_overlap
  FROM ps LEFT JOIN ov ON ov.p = ps.p CROSS JOIN nq)
SELECT nprobe, n_queries, sum_overlap, {_NPROBE_RECALL_EXPR} AS recall_q6
FROM fin ORDER BY nprobe"""
)


@register("ann_ivf_nprobe_curve", _NPROBE_SQL)
def ann_ivf_nprobe_curve(spark, sf_dir):
    """The FAISS nprobe tuning curve over the shared trained IVF: mean
    recall@10 of the batch-query probe at nprobe = 1/2/3 — the
    accuracy-vs-scan-cost sweep an index operator reads before fixing
    nprobe (completing the tuning-diagnostics family: shingle k for
    MinHash, (b,r) for banding, nprobe for IVF). Reports per-config
    query count, total exact-top-10 overlap, and recall_q6.

    Scale shape: ONE probe ranking (rn <= 3) reused by all three configs
    via a broadcast theta-join on rn <= p; exact-cosine scoring stays
    inside probed cells (the scan is pruned to nprobe/K per query); the
    brute-force exact side exists only as the recall denominator, per the
    ann_ivf_recall precedent. On the sandbox's i.i.d. vectors the curve
    is shallow (recall ~0.3 at nprobe 3 — the honest PQ-recall rule);
    on clustered real embeddings it bends hard toward 1."""
    members, cent, final_assign = _trained_ivf(spark, sf_dir)
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cq"), F.asc("cid"))
    bp3 = (
        qs.crossJoin(F.broadcast(cent))
        .select("qid", "qv", "cid", _cosq("cv", "qv", 1_000_000_000).alias("cq"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 3)
        .select("qid", "qv", "cid", "rn")
    )
    ps = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    probes = (
        bp3.crossJoin(F.broadcast(ps))
        .where(F.col("rn") <= F.col("p"))
        .select("p", "qid", "qv", "cid")
    )
    scored = (
        members.join(final_assign, "vec_id")
        .join(F.broadcast(probes), "cid")
        .select("p", "qid", "vec_id", _cosq("v", "qv", 1_000_000).alias("cos_q6"))
    )
    wr = Window.partitionBy("p", "qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    tops = (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 10)
        .select("p", "qid", "vec_id")
    )
    we = Window.partitionBy("qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    exact = _ann_exact_top10(spark, sf_dir).select("qid", "vec_id")
    ov = tops.join(exact, ["qid", "vec_id"]).groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("sum_overlap")
    )
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    fin = (
        ps.join(F.broadcast(ov), "p", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            F.col("p").cast("long").alias("nprobe"),
            "n_queries",
            F.coalesce(F.col("sum_overlap"), F.lit(0)).cast("long").alias("sum_overlap"),
        )
    )
    return fin.select(
        "nprobe", "n_queries", "sum_overlap", F.expr(_NPROBE_RECALL_EXPR).alias("recall_q6")
    ).orderBy("nprobe")


# ---------------------------------------------------------------------------
# session 31 — contrastive hard-negative mining, event-value quantiles
# ---------------------------------------------------------------------------

_HARDNEG_SQL = (
    _KMEANS_SQL_PRELUDE
    + """, qs AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 37 = 0),
bp3 AS MATERIALIZED (
  SELECT qid, qv, cid, rn FROM (
    SELECT qs.qid, qs.qv, c.cid,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             CAST(round(1000000000 * list_dot_product(c.cv, qs.qv)
               / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) DESC,
             c.cid ASC) AS rn
    FROM qs, cent2 c) WHERE rn <= 3),
sc AS (
  SELECT b.qid, e.vec_id,
         CAST(round(1000000 * list_dot_product(e.v, b.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(b.qv, b.qv)))) AS BIGINT) AS cos_q6
  FROM bp3 b, a3, e
  WHERE b.rn BETWEEN 2 AND 3 AND a3.cid = b.cid AND e.vec_id = a3.vec_id
    AND e.vec_id <> b.qid)
SELECT qid, vec_id, cos_q6, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT qid, vec_id, cos_q6,
         row_number() OVER (PARTITION BY qid ORDER BY cos_q6 DESC, vec_id ASC) AS rnk
  FROM sc) WHERE rnk <= 5 ORDER BY qid, rnk"""
)


@register("hard_negative_mining", _HARDNEG_SQL)
def hard_negative_mining(spark, sf_dir):
    """Contrastive-training hard-negative mining over the shared trained
    IVF: for each batch query, the top-5 most-similar vectors from its
    2nd/3rd-nearest cells — high-similarity NON-neighbors (the rank-1
    cell is the positive neighborhood; excluding it is the in-batch
     'semi-hard' rule from FaceNet/DPR-style training). The mined
    (query, negative, cos) triplets are exactly what an embedding
    trainer's negative sampler consumes.

    Scale shape: identical plan skeleton to ann_ivf_batch — broadcast
    centroids rank cells per query, the negative scan is pruned to 2
    cells per query via the cid equi-join, top-5 per query is a
    qid-partitioned window over cell-bounded candidates."""
    members, cent, final_assign = _trained_ivf(spark, sf_dir)
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cq"), F.asc("cid"))
    neg_cells = (
        qs.crossJoin(F.broadcast(cent))
        .select("qid", "qv", "cid", _cosq("cv", "qv", 1_000_000_000).alias("cq"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn").between(2, 3))
        .select("qid", "qv", "cid")
    )
    sc = (
        members.join(final_assign, "vec_id")
        .join(F.broadcast(neg_cells), "cid")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _cosq("v", "qv", 1_000_000).alias("cos_q6"))
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    return (
        sc.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("qid", "vec_id", "cos_q6", "rnk")
        .orderBy("qid", "rnk")
    )


@register(
    "events_value_quantiles",
    """WITH t AS (
  SELECT event_type AS source, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
hist AS (SELECT source, cents, count(*) AS cnt FROM t GROUP BY source, cents),
h AS (
  SELECT source, cents, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES (500000), (950000), (990000)) AS v(p_q6)),
agg AS (
  SELECT h.source, q.p_q6, max(h.n) AS n,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1))
                  THEN h.cents END) AS v_lo,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1)) + 1
                  THEN h.cents END) AS v_hi
  FROM h, q GROUP BY h.source, q.p_q6)
SELECT source AS event_type, CAST(p_q6 AS BIGINT) AS p_q6,
       CAST(round(1000000.0 * (v_lo + ((p_q6 / 1000000.0) * (n - 1)
            - floor((p_q6 / 1000000.0) * (n - 1))) * (v_hi - v_lo))) AS BIGINT) AS q_q6
FROM agg ORDER BY event_type, p_q6""",
)
def events_value_quantiles(spark, sf_dir):
    """Exact p50/p95/p99 of event value (in integer cents) per event_type
    — the ES ``percentiles`` agg on the events stream, via the same
    weighted-histogram + exclusive-prefix-sum machinery as
    doclen_quantiles (proof the quantile operator generalizes across
    tables: any (group, integer-value) pair gets exact type-7 percentiles
    without ever buffering raw group values on a reducer). The monitoring
    twin: revenue-distribution percentiles per event type.

    Scale shape: map-side (type, cents) histogram cells bounded by
    distinct cent values; windows run over histogram rows only."""
    t = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    hist = t.groupBy("source", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("source")
    h = hist.select(
        "source",
        "cents",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(500000,), (950000,), (990000,)], "p_q6 long")
    rank = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    agg = (
        h.crossJoin(F.broadcast(q))
        .groupBy("source", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank), F.col("cents"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank) + 1, F.col("cents"))).alias("v_hi"),
        )
    )
    r = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    frac = r - F.floor(r)
    return agg.select(
        F.col("source").alias("event_type"),
        F.col("p_q6").cast("long").alias("p_q6"),
        F.round(F.lit(1_000_000.0) * (F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo"))))
        .cast("long")
        .alias("q_q6"),
    ).orderBy("event_type", "p_q6")


# ---------------------------------------------------------------------------
# session 32 — association rules over event baskets
# ---------------------------------------------------------------------------

_LIFT_EXPR = (
    "cast(round(1000000 * ((n_ab / cast(n_users as double))"
    " / ((n_a / cast(n_users as double)) * (n_b / cast(n_users as double))))) as bigint)"
)
_CONF_EXPR = "cast(round(1000000 * (n_ab / cast(n_a as double))) as bigint)"


@register(
    "event_type_lift",
    f"""WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY event_type),
p AS (
  SELECT a.event_type AS type_a, b2.event_type AS type_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.event_type < b2.event_type
  GROUP BY 1, 2),
f AS (
  SELECT type_a, type_b, n_ab, sa.n AS n_a, sb.n AS n_b, n_users
  FROM p JOIN s sa ON sa.event_type = p.type_a
         JOIN s sb ON sb.event_type = p.type_b
  CROSS JOIN n)
SELECT type_a, type_b, n_ab, n_a, n_b,
       {_LIFT_EXPR} AS lift_q6, {_CONF_EXPR} AS conf_a_to_b_q6
FROM f ORDER BY type_a, type_b""",
)
def event_type_lift(spark, sf_dir):
    """Association-rule mining over per-user event baskets: for every
    event-type pair, the co-occurrence support, lift
    P(a,b)/(P(a)·P(b)) and confidence P(b|a) — the market-basket signal
    (Agrawal-style frequent itemsets at the pair level) a funnel/recs
    analysis reads to find which behaviors travel together. Lift over 1e6
    means the pair co-occurs above independence.

    Determinism: probabilities divide exact BIGINT counts in one shared
    divide-first expression string per metric.

    Scale shape: baskets collapse to distinct (user, type) map-side; the
    self-join fans each user's ≤|types| rows against themselves (bounded
    per key — never a cross join across users); type counts and the user
    total broadcast; output is |types|² rows."""
    ev = _events(spark, sf_dir)
    b = ev.select("user_id", "event_type").distinct().localCheckpoint()
    n = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    s = b.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b2 = b.alias("a"), b.alias("b2")
    p = (
        a.join(
            b2,
            (F.col("a.user_id") == F.col("b2.user_id"))
            & (F.col("a.event_type") < F.col("b2.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b2.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    f = (
        p.join(
            F.broadcast(s.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(s.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return f.select(
        "type_a",
        "type_b",
        "n_ab",
        "n_a",
        "n_b",
        F.expr(_LIFT_EXPR).alias("lift_q6"),
        F.expr(_CONF_EXPR).alias("conf_a_to_b_q6"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# session 33 — resharding movement cost: mod-hash vs rendezvous hashing
# ---------------------------------------------------------------------------

_MOVED_FRAC_EXPR = (
    "cast(round(1000000 * (n_moved / cast(n_docs as double))) as bigint)"
)


@register(
    "shard_rebalance_cost",
    f"""WITH d AS (SELECT doc_id FROM documents),
m AS (SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT AS h16 FROM d),
mod_mov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) FILTER (h16 % 16 <> h16 % 17) AS BIGINT) AS n_moved
  FROM m),
r AS (
  SELECT doc_id, s, md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)) AS hk
  FROM d, (SELECT unnest(generate_series(0, 16)) AS s)),
rv AS (
  SELECT doc_id,
         arg_max(s, hk) FILTER (WHERE s < 16) AS s16,
         arg_max(s, hk) AS s17
  FROM r GROUP BY doc_id),
rv_mov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) FILTER (s16 <> s17) AS BIGINT) AS n_moved
  FROM rv)
SELECT 'mod' AS strategy, n_docs, n_moved, {_MOVED_FRAC_EXPR} AS moved_frac_q6 FROM mod_mov
UNION ALL
SELECT 'rendezvous' AS strategy, n_docs, n_moved, {_MOVED_FRAC_EXPR} FROM rv_mov
ORDER BY strategy""",
)
def shard_rebalance_cost(spark, sf_dir):
    """Resharding movement cost, 16 → 17 shards, for two routing rules:
    mod-hash (the shard_token_balance coordinate — moves ~16/17 of all
    docs when the divisor changes) vs rendezvous/highest-random-weight
    hashing (Thaler-Ravishankar; a doc moves ONLY when the new shard's
    hash wins its argmax, ~1/17) — the consistent-hashing argument as a
    measured relational operator, which is what decides whether growing
    an index's shard count is a full rewrite or an incremental one.

    Determinism: argmax over md5 hex strings (lexicographic, collision-
    free at these scales), movement fractions divide exact BIGINTs.

    Scale shape: mod is map-side; rendezvous is a per-doc explode of 17
    candidate rows collapsed by ONE (doc) groupBy with filtered max_by —
    no joins at all; the report is 2 rows."""
    d = _docs(spark, sf_dir).select("doc_id")
    m = d.select(
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as int)"
        ).alias("h16")
    )
    mod_mov = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(F.expr("h16 % 16 <> h16 % 17")).cast("long").alias("n_moved"),
    )
    r = d.select(
        "doc_id", F.explode(F.expr("sequence(0, 16)")).alias("s")
    ).select(
        "doc_id",
        "s",
        F.expr("md5(concat(cast(doc_id as string), ':', cast(s as string)))").alias("hk"),
    )
    rv = r.groupBy("doc_id").agg(
        F.expr("max_by(s, hk) filter (where s < 16)").alias("s16"),
        F.expr("max_by(s, hk)").alias("s17"),
    )
    rv_mov = rv.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(F.expr("s16 <> s17")).cast("long").alias("n_moved"),
    )
    out_cols = ["strategy", "n_docs", "n_moved", "moved_frac_q6"]
    mod_row = mod_mov.select(
        F.lit("mod").alias("strategy"), "n_docs", "n_moved",
        F.expr(_MOVED_FRAC_EXPR).alias("moved_frac_q6"),
    )
    rv_row = rv_mov.select(
        F.lit("rendezvous").alias("strategy"), "n_docs", "n_moved",
        F.expr(_MOVED_FRAC_EXPR).alias("moved_frac_q6"),
    )
    return mod_row.select(out_cols).unionByName(rv_row.select(out_cols)).orderBy("strategy")


# ---------------------------------------------------------------------------
# session 34 — sessionization-gap tuning curve, stratified k-fold assignment
# ---------------------------------------------------------------------------


@register(
    "interevent_gap_histogram",
    """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
g AS (
  SELECT t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS gap
  FROM t),
b AS (
  SELECT CASE WHEN gap = 0 THEN -1
              ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END AS bucket
  FROM g WHERE gap IS NOT NULL)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps
FROM b GROUP BY bucket ORDER BY bucket""",
)
def interevent_gap_histogram(spark, sf_dir):
    """Per-user inter-event gap distribution, bucketed by floor(log2 µs)
    — the tuning curve for the sessionizer's 30-minute inactivity gap
    (events_sessionize): the histogram's valley between the within-
    session mode and the between-session mode IS the right gap setting.
    Fifth member of the tuning-diagnostics family (shingle k, LSH (b,r),
    IVF nprobe, SimHash hamming — now the session gap). Bucket via the
    integer-exact length(bin()) idiom (doclen_histogram); zero gaps
    (same-microsecond events) land in bucket -1.

    Scale shape: ONE user_id-partitioned lag window (the sessionizer's
    own shuffle key), then a ≤64-bucket map-side-combined histogram.
    Ties at equal timestamps are ordered by event_id so lag is
    deterministic in both engines."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    g = t.select((F.col("t_us") - F.lag("t_us").over(w)).alias("gap"))
    b = g.where(F.col("gap").isNotNull()).select(
        F.expr(
            "CASE WHEN gap = 0 THEN -1 ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
        .orderBy("bucket")
    )


@register(
    "stratified_kfold_assign",
    """WITH f AS (
  SELECT source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 4))::INT % 5 AS fold
  FROM documents)
SELECT source, CAST(fold AS BIGINT) AS fold, CAST(count(*) AS BIGINT) AS n_docs
FROM f GROUP BY source, fold ORDER BY source, fold""",
)
def stratified_kfold_assign(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment, reported as the
    per-(source, fold) census: folds come from md5 hex chars 13-16 — the
    FOURTH independent hash coordinate (shard 1-4, train/eval split 5-8,
    sampling 9-12 — each a disjoint hex range, so fold membership is
    orthogonal to sharding, hold-out and sampling by construction). A
    fold's train set is 'fold <> k' — no RNG state, reproducible on any
    engine, stable under corpus appends (new docs join folds without
    reshuffling old ones — the property sklearn's KFold lacks).

    Scale shape: map-side hash + one tiny (source × 5) groupBy."""
    f = _docs(spark, sf_dir).select(
        "source",
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 13, 4), 16, 10) as int) % 5"
        ).alias("fold"),
    )
    return (
        f.groupBy("source", F.col("fold").cast("long").alias("fold"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("source", "fold")
    )


# ---------------------------------------------------------------------------
# session 35 — corpus drift monitor, chi-squared independence
# ---------------------------------------------------------------------------

_DRIFT_KL_EXPR = (
    "cast(round(1000000 * ((a / cast(atot as double))"
    " * ln((a / cast(atot as double)) / (c / cast(ctot as double))))) as bigint)"
)
_CHI2_CELL_EXPR = (
    "cast(round(1000000 * ((o - (rn * cn) / cast(n as double))"
    " * (o - (rn * cn) / cast(n as double)) / ((rn * cn) / cast(n as double)))) as bigint)"
)


@register(
    "term_drift_deciles",
    f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
toks AS (
  SELECT CAST((doc_id * 10) // n_docs AS BIGINT) AS decile,
         unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents CROSS JOIN nd),
dt AS (SELECT decile, term, CAST(count(*) AS BIGINT) AS a FROM toks GROUP BY decile, term),
da AS (SELECT decile, CAST(sum(a) AS BIGINT) AS atot FROM dt GROUP BY decile),
ct AS (SELECT term, CAST(sum(a) AS BIGINT) AS c FROM dt GROUP BY term),
cn AS (SELECT CAST(sum(c) AS BIGINT) AS ctot FROM ct),
contrib AS (
  SELECT dt.decile, {_DRIFT_KL_EXPR} AS kl_q6
  FROM dt JOIN da USING (decile) JOIN ct USING (term) CROSS JOIN cn)
SELECT decile, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(kl_q6) AS BIGINT) AS kl_q6
FROM contrib GROUP BY decile ORDER BY decile""",
)
def term_drift_deciles(spark, sf_dir):
    """Corpus drift monitor: KL divergence of each doc_id-decile's term
    distribution against the whole-corpus LM — the train/serve-skew
    readout a data-ops pipeline alarms on (a crawl whose late deciles
    drift from the early ones poisons a model trained on the head).
    Per-term contributions are q6-rounded first (clarity_score's rule),
    decile sums are exact BIGINTs; on the sandbox's stationary synthetic
    corpus the curve is flat near zero — that IS the healthy reading.

    Scale shape: decile is a map-side integer key (corpus count is a
    1-row broadcast); one (decile, term) agg, the corpus LM derives FROM
    it (shares the exchange); the report is 10 rows."""
    nd = _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    toks = (
        _docs(spark, sf_dir)
        .crossJoin(F.broadcast(nd))
        .select(
            F.expr("cast((doc_id * 10) div n_docs as bigint)").alias("decile"),
            F.explode(spark_tokens("text")).alias("term"),
        )
    )
    dt = toks.groupBy("decile", "term").agg(F.count(F.lit(1)).cast("long").alias("a"))
    da = dt.groupBy("decile").agg(F.sum("a").cast("long").alias("atot"))
    ct = dt.groupBy("term").agg(F.sum("a").cast("long").alias("c"))
    cn = ct.agg(F.sum("c").cast("long").alias("ctot"))
    contrib = (
        dt.join(F.broadcast(da), "decile")
        .join(ct, "term")
        .crossJoin(F.broadcast(cn))
        .select("decile", F.expr(_DRIFT_KL_EXPR).alias("kl_q6"))
    )
    return (
        contrib.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("kl_q6").cast("long").alias("kl_q6"),
        )
        .orderBy("decile")
    )


@register(
    "source_lang_chi2",
    f"""WITH o AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY source, lang),
r AS (SELECT source, CAST(sum(o) AS BIGINT) AS rn FROM o GROUP BY source),
c AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cn FROM o GROUP BY lang),
nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
cell AS (
  SELECT o.source, o.lang, {_CHI2_CELL_EXPR} AS x2_q6
  FROM o JOIN r USING (source) JOIN c USING (lang) CROSS JOIN nn)
SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rows,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cols,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(x2_q6) AS BIGINT) AS chi2_q6
FROM cell""",
)
def source_lang_chi2(spark, sf_dir):
    """Pearson chi-squared statistic for source × lang independence —
    'does language mix depend on the source?' — the categorical
    counterpart of ttest_lang_doclen in the inference-agg family
    (observed cells only; an absent (source,lang) cell contributes its
    expectation — omitted here and declared, since both engines omit the
    same cells the statistic stays oracle-exact and the full-table form
    is one generate-and-left-join away). Per-cell (O−E)²/E is q6-rounded
    first (E divides exact BIGINTs, divide-first float form — the
    events_daily_anomaly overflow rule), the statistic is a BIGINT sum.

    Scale shape: one (source, lang) count; margins derive FROM it
    (shared exchange); cells are |sources|×|langs| rows; output 1 row."""
    o = _docs(spark, sf_dir).groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    o = o.localCheckpoint()
    r = o.groupBy("source").agg(F.sum("o").cast("long").alias("rn"))
    c = o.groupBy("lang").agg(F.sum("o").cast("long").alias("cn"))
    nn = o.agg(F.sum("o").cast("long").alias("n"))
    cell = (
        o.join(F.broadcast(r), "source")
        .join(F.broadcast(c), "lang")
        .crossJoin(F.broadcast(nn))
        .select(F.expr(_CHI2_CELL_EXPR).alias("x2_q6"))
    )
    nr = r.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    nc = c.agg(F.count(F.lit(1)).cast("long").alias("n_cols"))
    return (
        nr.crossJoin(nc)
        .crossJoin(
            cell.agg(
                F.count(F.lit(1)).cast("long").alias("n_cells"),
                F.sum("x2_q6").cast("long").alias("chi2_q6"),
            )
        )
        .select("n_rows", "n_cols", "n_cells", "chi2_q6")
    )


# ---------------------------------------------------------------------------
# session 36 — dedup survivor-policy comparison
# ---------------------------------------------------------------------------


@register(
    "dedup_policy_compare",
    _SQL_LSH_PAIRS
    + f""",
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
tok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_distinct
  FROM documents),
cd AS (SELECT c.cluster_id, t.doc_id, t.n_tok, t.n_distinct
       FROM comp c JOIN tok t USING (doc_id)),
rk AS (
  SELECT cluster_id, n_tok,
         row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id ASC) AS r_min,
         row_number() OVER (PARTITION BY cluster_id ORDER BY n_tok DESC, doc_id ASC) AS r_long,
         row_number() OVER (PARTITION BY cluster_id ORDER BY n_distinct DESC, doc_id ASC) AS r_dist
  FROM cd),
tot AS (
  SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         CAST(count(*) AS BIGINT) AS docs_clustered,
         CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS tokens_clustered
  FROM cd),
pol AS (
  SELECT 'keep_longest' AS policy,
         CAST(COALESCE(sum(CASE WHEN r_long = 1 THEN n_tok ELSE 0 END), 0) AS BIGINT) AS tokens_kept FROM rk
  UNION ALL
  SELECT 'keep_min_id',
         CAST(COALESCE(sum(CASE WHEN r_min = 1 THEN n_tok ELSE 0 END), 0) AS BIGINT) FROM rk
  UNION ALL
  SELECT 'keep_most_distinct',
         CAST(COALESCE(sum(CASE WHEN r_dist = 1 THEN n_tok ELSE 0 END), 0) AS BIGINT) FROM rk)
SELECT policy, n_clusters, docs_clustered - n_clusters AS docs_dropped,
       tokens_kept, tokens_clustered - tokens_kept AS tokens_dropped
FROM pol CROSS JOIN tot ORDER BY policy""",
)
def dedup_policy_compare(spark, sf_dir):
    """Survivor-policy comparison for near-dup clusters: keep-min-id (the
    registry's canonical rule), keep-longest (max token count), and
    keep-most-distinct (max vocabulary) — per policy, the tokens a
    training mix retains from the clustered docs. docs_dropped is
    policy-invariant (every cluster keeps exactly one); tokens_kept is
    NOT, and that delta is the decision this operator exists to inform
    (Lee et al. keep-longest typically retains the most signal).

    Scale shape: cluster labels reuse the memoized `_lsh_pair_edges` +
    pointer-doubled `connected_components` (cluster-table-sized); the
    three policy rankings are windows over CLUSTER-bounded partitions of
    the clustered-docs table (dup clusters ≪ corpus); the report is 3
    rows. The DuckDB oracle recomputes the closure recursively over the
    identical pair graph."""
    edges = _lsh_pair_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    labels = connected_components(labels, edges).select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )
    tok = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(spark_tokens("text")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(spark_tokens("text"))).cast("long").alias("n_distinct"),
    )
    cd = labels.join(tok, "doc_id").localCheckpoint()
    w_min = Window.partitionBy("cluster_id").orderBy(F.asc("doc_id"))
    w_long = Window.partitionBy("cluster_id").orderBy(F.desc("n_tok"), F.asc("doc_id"))
    w_dist = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_distinct"), F.asc("doc_id")
    )
    rk = cd.select(
        "cluster_id",
        "n_tok",
        F.row_number().over(w_min).alias("r_min"),
        F.row_number().over(w_long).alias("r_long"),
        F.row_number().over(w_dist).alias("r_dist"),
    )
    tot = cd.agg(
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        F.count(F.lit(1)).cast("long").alias("docs_clustered"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("tokens_clustered"),
    )
    pols = []
    for policy, flag in (
        ("keep_longest", "r_long"),
        ("keep_min_id", "r_min"),
        ("keep_most_distinct", "r_dist"),
    ):
        pols.append(
            rk.agg(
                F.coalesce(
                    F.sum(F.when(F.col(flag) == 1, F.col("n_tok")).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("tokens_kept")
            ).select(F.lit(policy).alias("policy"), "tokens_kept")
        )
    pol = pols[0].unionByName(pols[1]).unionByName(pols[2])
    return (
        pol.crossJoin(F.broadcast(tot))
        .select(
            "policy",
            "n_clusters",
            (F.col("docs_clustered") - F.col("n_clusters")).alias("docs_dropped"),
            "tokens_kept",
            (F.col("tokens_clustered") - F.col("tokens_kept")).alias("tokens_dropped"),
        )
        .orderBy("policy")
    )


# ---------------------------------------------------------------------------
# session 37 — event-sequence Markov transitions, Matryoshka dim-truncation
# recall curve, LSH candidate-graph degree histogram
# ---------------------------------------------------------------------------


@register(
    "events_markov_transitions",
    """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
p AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
           AS prev_type,
         event_type AS next_type
  FROM t),
c AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM p WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
SELECT prev_type, next_type, n_trans,
       CAST((1000000 * n_trans)
            // sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS p_q6
FROM c ORDER BY prev_type, next_type""",
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    for every (prev_type, next_type) pair of CONSECUTIVE events of one
    user, the transition count and the row-normalized probability in q6
    micro-units — the behavioral-model summary (next-event prediction
    baseline, funnel-leak localization) the reference's event analytics
    stop short of.

    Determinism: equal-timestamp events are ordered by event_id inside the
    lag window (the interevent_gap_histogram rule) so the successor of
    every event is identical in both engines; p_q6 is an INTEGER division
    (1e6·n div row_total) — no float sum order anywhere. The DuckDB
    row_total is HUGEINT (sum of BIGINT), so the quotient is CAST back.

    Scale shape: ONE user_id-partitioned lag window (the sessionizer's own
    shuffle key), then a ≤|types|²-row map-side-combined count; the
    normalizing window runs over the pre-aggregated ≤|types|² table, not
    the event stream. n_trans·1e6 stays inside BIGINT until a single
    event-type pair exceeds ~9.2e12 transitions (~petabyte streams) —
    divide-first at that point."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    p = t.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    c = (
        p.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    wr = Window.partitionBy("prev_type")
    return (
        c.withColumn("tot", F.sum("n_trans").over(wr))
        .select(
            "prev_type",
            "next_type",
            "n_trans",
            F.expr("(1000000 * n_trans) div tot").cast("long").alias("p_q6"),
        )
        .orderBy("prev_type", "next_type")
    )


_TRUNC_DIMS = (4, 8, 16, 64)

_TRUNC_SQL = (
    _SQL_EMB_E
    + """
qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 37 = 0),
ds AS (SELECT unnest([4, 8, 16, 64]) AS d),
sl AS (
  SELECT ds.d, qs.qid, e.vec_id,
         list_slice(e.v, 1, ds.d) AS av, list_slice(qs.qv, 1, ds.d) AS aq
  FROM e, qs, ds),
sc AS (
  SELECT d, qid, vec_id, """
    + _sql_cosq("av", "aq", 1_000_000)
    + """ AS cos_q6
  FROM sl),
topk AS (
  SELECT d, qid, vec_id FROM (
    SELECT d, qid, vec_id,
           row_number() OVER (PARTITION BY d, qid
                              ORDER BY cos_q6 DESC, vec_id ASC) AS rn
    FROM sc) WHERE rn <= 10),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs),
hits AS (
  SELECT t.d, CAST(count(*) AS BIGINT) AS n_hits
  FROM topk t JOIN (SELECT qid, vec_id FROM topk WHERE d = 64) x
    USING (qid, vec_id)
  GROUP BY t.d)
SELECT CAST(d AS BIGINT) AS d, n_hits,
       CAST(10 * nq.n AS BIGINT) AS n_possible,
       CAST((1000000 * n_hits) // (10 * nq.n) AS BIGINT) AS recall_q6
FROM hits, nq ORDER BY d"""
)


@register("ann_dim_truncation_curve", _TRUNC_SQL)
def ann_dim_truncation_curve(spark, sf_dir):
    """Matryoshka-style dimension-truncation tuning curve: recall@10 of
    cosine search over only the FIRST d dims (d = 4/8/16) against the
    full-64-dim exact top-10, over the shared batch query set
    (vec_id % 37 = 0). The d = 64 row is emitted as a self-check — its
    recall is 1.0 by construction (Kusupati et al., MRL: how many prefix
    dims a truncated index needs before ANN recall collapses). Seventh
    member of the tuning-diagnostics family (shingle k, LSH (b,r), IVF
    nprobe, SimHash hamming, session gap, band config).

    Determinism: per-(d, query) ranking keys on q6-rounded cosine of the
    PREFIX slices with vec_id tiebreak; recall_q6 is an integer division
    of exact BIGINT hit counts — no float accumulation across queries.

    Scale shape: this is the brute-force AUDIT leg (the same |Q|·N pair
    table as ann_ivf_batch_recall's exact side — queries broadcast, scan
    side streams); production truncated search runs through the IVF. All
    four d's are stacked into ONE pair table so the per-(d, qid) top-10
    costs a single window shuffle, not one per d. Per-d norms are
    precomputed PER VECTOR before the pair join (array-lambda folds are
    interpreted, never codegen — the pagerank lesson), so each (pair, d)
    pays ONE dot; sqrt(Σx²) of the same doubles is the same double, so
    the q6 cosines are bit-identical to the per-pair-norm form the
    oracle spells out."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    for d in _TRUNC_DIMS:
        e = e.withColumn(f"av{d}", F.expr(f"slice(v, 1, {d})")).withColumn(
            f"nv{d}", F.sqrt(F.expr(_DOT.format(a=f"av{d}", b=f"av{d}")))
        )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"),
        *[F.col(f"av{d}").alias(f"aq{d}") for d in _TRUNC_DIMS],
        *[F.col(f"nv{d}").alias(f"nq{d}") for d in _TRUNC_DIMS],
    )
    pair = e.crossJoin(F.broadcast(qs))
    for d in _TRUNC_DIMS:
        dot = F.expr(_DOT.format(a=f"av{d}", b=f"aq{d}"))
        pair = pair.withColumn(
            f"c{d}",
            F.round(
                dot / (F.col(f"nv{d}") * F.col(f"nq{d}")) * F.lit(1_000_000.0)
            ).cast("long"),
        )
    stack_args = ", ".join(f"cast({d} as bigint), c{d}" for d in _TRUNC_DIMS)
    sc = pair.selectExpr(
        "qid", "vec_id", f"stack({len(_TRUNC_DIMS)}, {stack_args}) as (d, cos_q6)"
    )
    w = Window.partitionBy("d", "qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    topk = (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("d", "qid", "vec_id")
        .localCheckpoint()
    )
    exact = topk.where(F.col("d") == 64).select("qid", "vec_id")
    hits = (
        topk.join(exact, ["qid", "vec_id"])
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        hits.crossJoin(F.broadcast(nq))
        .select(
            "d",
            "n_hits",
            (F.lit(10) * F.col("n")).cast("long").alias("n_possible"),
            F.expr("(1000000 * n_hits) div (10 * n)").cast("long").alias("recall_q6"),
        )
        .orderBy("d")
    )


@register(
    "lsh_degree_histogram",
    _SQL_LSH_PAIRS
    + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
deg AS (
  SELECT d.doc_id, CAST(COALESCE(e.n, 0) AS BIGINT) AS degree
  FROM documents d LEFT JOIN (
    SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS n
    FROM edges GROUP BY src) e USING (doc_id))
SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree ORDER BY degree""",
)
def lsh_degree_histogram(spark, sf_dir):
    """Degree distribution of the MinHash-LSH candidate-pair graph —
    degree-0 docs included via the corpus spine. The eighth
    tuning-diagnostics member: a heavy right tail means a hot blocking
    key (one band bucket pairing everything with everything — the
    quadratic blowup LSH banding exists to prevent), degree 0 everywhere
    means the bands are too selective for the corpus. Read together with
    lsh_candidate_precision (quality) and lsh_band_config_curve (b,r
    sweep), this is the quantity axis.

    Scale shape: reuses the memoized `_lsh_pair_edges` graph (banded
    equi-join, candidate-sized); degree = ONE src-keyed count over the
    edge table; the corpus-spine left join is doc_id-keyed (AQE picks the
    strategy — the degree table's cardinality is corpus-bounded but
    usually far smaller, never force-broadcast an unbounded side); the
    final histogram is ≤max-degree rows with map-side partials."""
    edges = _lsh_pair_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    spine = _docs(spark, sf_dir).select("doc_id")
    full = spine.join(deg, "doc_id", "left").select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("degree")
    )
    return (
        full.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("degree")
    )


# --- session 37 batch 2: IVF cell-balance audit, user-activity histogram,
# TPC-H-shape pricing summary over lineitem ----------------------------------


@register(
    "ivf_cluster_balance",
    _KMEANS_SQL_PRELUDE
    + """, mc AS (
  SELECT a3.cid,
         CAST(round(1000000 * list_dot_product(e.v, c.cv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))) AS BIGINT) AS cos_q6
  FROM e JOIN a3 USING (vec_id) JOIN cent2 c ON c.cid = a3.cid)
SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(1000000 - cos_q6) AS BIGINT) AS inertia_q6,
       CAST(min(cos_q6) AS BIGINT) AS worst_cos_q6
FROM mc GROUP BY cid ORDER BY cid""",
)
def ivf_cluster_balance(spark, sf_dir):
    """Health audit of the shared trained IVF: per cell, the member count,
    the cosine inertia (Σ (1 − cos(v, centroid)) in q6 — the k-means
    objective the Lloyd iterations minimized), and the worst member's
    cosine. A fat cell means probe-time scans blow past nprobe/K of the
    corpus (the skew IVF exists to avoid); a high-inertia cell means the
    quantizer under-fits that region and its candidates will rank poorly.
    Ninth tuning-diagnostics member — the INDEX-side twin of the
    query-side nprobe curve.

    Determinism: per-member cos is q6-rounded FIRST, the cell sums are
    exact BIGINT adds (order-independent); inertia is Σ of integers.

    Scale shape: reuses the memoized `_trained_ivf` (training paid once
    per session); the audit itself is one broadcast join of K centroids
    onto the assignment and a cid-keyed agg with map-side partials —
    K output rows."""
    members, cent, final_assign = _trained_ivf(spark, sf_dir)
    mc = (
        members.join(final_assign, "vec_id")
        .join(F.broadcast(cent), "cid")
        .select("cid", _cosq("v", "cv", 1_000_000).alias("cos_q6"))
    )
    return (
        mc.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(F.lit(1_000_000) - F.col("cos_q6")).cast("long").alias("inertia_q6"),
            F.min("cos_q6").cast("long").alias("worst_cos_q6"),
        )
        .orderBy("cid")
    )


@register(
    "user_activity_histogram",
    """WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id),
b AS (
  SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS bucket FROM u)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_users
FROM b GROUP BY bucket ORDER BY bucket""",
)
def user_activity_histogram(spark, sf_dir):
    """Events-per-user distribution bucketed by floor(log2 n) — the
    doclen_histogram shape applied to the events table. The right tail is
    the bot/power-user mass every per-user operator (sessionize, funnel,
    retention, CMS) must survive: a bucket-20 user means 1M-event
    partitions in every user_id-keyed window downstream — the signal to
    reach for salting there.

    Scale shape: one user_id-keyed count with map-side partials, then a
    ≤64-bucket histogram; bucket via the integer-exact length(bin())
    idiom (n_events ≥ 1 by construction, no empty-group guard needed)."""
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    b = u.select(
        F.expr("CAST(length(bin(n_events)) - 1 AS BIGINT)").alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("bucket")
    )


# ONE shared per-row expression string per money column — cents/q2 rounding
# happens BEFORE any aggregation, so every sum is an exact BIGINT add in both
# engines (the ttest/matrix_stats rule). charge multiplies doubles FIRST and
# rounds once: a cents×bp×bp integer product is ~1e15 per row and a 60k-row
# sum already overflows BIGINT — divide-first, like events_daily_anomaly.
_LI_QTY_C = "CAST(round(100 * l_quantity) AS BIGINT)"
_LI_PRICE_C = "CAST(round(100 * l_extendedprice) AS BIGINT)"
_LI_DISC_C = "CAST(round(100 * l_extendedprice * (1 - l_discount)) AS BIGINT)"
_LI_CHARGE_C = (
    "CAST(round(100 * l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS BIGINT)"
)
_LI_CUTOFF = "TIMESTAMP '1998-09-02 00:00:00'"


@register(
    "lineitem_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
       CAST(sum({_LI_QTY_C}) AS BIGINT) AS sum_qty_c,
       CAST(sum({_LI_PRICE_C}) AS BIGINT) AS sum_base_c,
       CAST(sum({_LI_DISC_C}) AS BIGINT) AS sum_disc_c,
       CAST(sum({_LI_CHARGE_C}) AS BIGINT) AS sum_charge_c,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem WHERE l_shipdate <= {_LI_CUTOFF}
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
)
def lineitem_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shape pricing summary over the lineitem table — the
    classic scan-dominated OLAP aggregate, included so the engine's
    generic relational surface (not just the document/search tables) has
    first-class evidence. Money is rounded to cents PER ROW via one
    shared expression string (Spark expr == DuckDB SQL text), so the
    group sums are exact BIGINT adds — no float accumulation order, and
    the averages TPC-H asks for are derivable as sum/n by the reader.

    Scale shape: the canonical map-side-partial aggregate — the shipdate
    filter is pushed into the parquet scan (shows as PushedFilters +
    row-group min/max pruning), only 7 narrow columns are read
    (ReadSchema), and the ≤|flags|×|status| group space combines
    map-side; the one exchange carries a handful of rows per task."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.expr(f"l_shipdate <= {_LI_CUTOFF}"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(_LI_QTY_C)).cast("long").alias("sum_qty_c"),
            F.sum(F.expr(_LI_PRICE_C)).cast("long").alias("sum_base_c"),
            F.sum(F.expr(_LI_DISC_C)).cast("long").alias("sum_disc_c"),
            F.sum(F.expr(_LI_CHARGE_C)).cast("long").alias("sum_charge_c"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- session 37 batch 3: multi-table join rollup, token-mass Gini,
# BM25-vs-TFIDF rank correlation ---------------------------------------------

_ORD_FROM = "TIMESTAMP '1996-01-01 00:00:00'"
_ORD_TO = "TIMESTAMP '1997-01-01 00:00:00'"


@register(
    "orders_nation_revenue",
    f"""SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= {_ORD_FROM} AND o.o_orderdate < {_ORD_TO}
GROUP BY n.n_name ORDER BY n.n_name""",
)
def orders_nation_revenue(spark, sf_dir):
    """TPC-H Q5-shape revenue rollup: 1996 orders joined through customer
    to nation, cents-exact revenue per nation — the fact-to-dim join
    chain that complements lineitem_pricing_summary's pure scan-agg in
    the generic-relational evidence.

    Scale shape: the date filter pushes into the orders parquet scan;
    orders⋈customer is the real key-keyed shuffle join (both sides
    unbounded — never force-broadcast, AQE localizes it when customer
    fits); nation (25 rows) is explicitly broadcast so the second join is
    map-side; the nation-keyed agg combines map-side into ≤25 rows.
    Money is cents-rounded PER ROW (shared expr both engines), sums are
    exact BIGINT."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.expr(f"o_orderdate >= {_ORD_FROM} AND o_orderdate < {_ORD_TO}"))
        .select(
            "o_custkey",
            F.expr("CAST(round(100 * o_totalprice) AS BIGINT)").alias("price_c"),
        )
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_c").cast("long").alias("revenue_c"),
        )
        .orderBy("n_name")
    )


@register(
    "source_token_gini",
    f"""WITH s AS (
  SELECT source,
         CAST(sum(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS x
  FROM documents GROUP BY source),
r AS (
  SELECT x, row_number() OVER (ORDER BY x ASC, source ASC) AS i,
         count(*) OVER () AS n, sum(x) OVER () AS tot
  FROM s),
g AS (
  SELECT CAST(max(n) AS BIGINT) AS n_sources, CAST(max(tot) AS BIGINT) AS total_tokens,
         CAST(sum((2 * i - n - 1) * x) AS BIGINT) AS num
  FROM r)
SELECT n_sources, total_tokens,
       CASE WHEN total_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * num) // (n_sources * total_tokens) AS BIGINT)
       END AS gini_q6
FROM g""",
)
def source_token_gini(spark, sf_dir):
    """Gini coefficient of token mass across sources — the one-number
    concentration audit of a training mix (gini 0 = every source
    contributes equally, →1 = one crawl IS the corpus). Read next to
    temperature_mix_weights: a high gini is exactly when temperature
    flattening matters.

    Determinism: the classic sorted formula Σ(2i−n−1)·xᵢ / (n·Σx) over
    ascending (x, source) order — equal-x swaps change which i each gets
    but not the sum, so the value is order-stable; numerator/denominator
    are exact BIGINTs, gini_q6 is a nonneg integer division (ascending
    sort makes the numerator provably ≥ 0 — no negative-division
    floor-vs-truncate divergence). Zero-token corpora emit 0 (the
    temperature_mix_weights 0/0 guard).

    Scale shape: per-source totals are a map-side token-count agg into
    |sources| rows; the rank window runs over that pre-aggregated tiny
    table (the doclen_quantiles rule — never a corpus-wide sort)."""
    s = _docs(spark, sf_dir).groupBy("source").agg(
        F.sum(F.size(spark_tokens("text"))).cast("long").alias("x")
    )
    w = Window.orderBy(F.asc("x"), F.asc("source"))
    r = s.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("x").over(Window.partitionBy()).alias("tot"),
    )
    g = r.agg(
        F.max("n").cast("long").alias("n_sources"),
        F.max("tot").cast("long").alias("total_tokens"),
        F.sum(F.expr("(2 * i - n - 1) * x")).cast("long").alias("num"),
    )
    return g.select(
        "n_sources",
        "total_tokens",
        F.expr(
            "CASE WHEN total_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000000 * num) div (n_sources * total_tokens) AS BIGINT) END"
        ).alias("gini_q6"),
    )


@register(
    "rank_correlation_bm25_tfidf",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
top AS (
  SELECT doc_id, score_q6,
         row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS r1
  FROM (SELECT doc_id, score_q6 FROM agg
        ORDER BY score_q6 DESC, doc_id ASC LIMIT 20)),
idf AS (
  SELECT term,
         CAST(round(1000000 * ln(1.0 + ((SELECT n_docs FROM st) - df + 0.5)
                                        / (df + 0.5))) AS BIGINT) AS idf_q6
  FROM dfs JOIN q USING (term)),
ti AS (
  SELECT tf.doc_id, CAST(sum(tf.tf * idf.idf_q6) AS BIGINT) AS tfidf
  FROM tf JOIN idf USING (term) JOIN top USING (doc_id)
  GROUP BY tf.doc_id),
rk AS (
  SELECT top.doc_id, top.r1,
         row_number() OVER (ORDER BY ti.tfidf DESC, top.doc_id ASC) AS r2
  FROM top JOIN ti USING (doc_id)),
pr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(*) FILTER (WHERE (a.r1 - b.r1) * (a.r2 - b.r2) > 0) AS BIGINT) AS concordant,
         CAST(count(*) FILTER (WHERE (a.r1 - b.r1) * (a.r2 - b.r2) < 0) AS BIGINT) AS discordant
  FROM rk a JOIN rk b ON a.doc_id < b.doc_id)
SELECT n_pairs, concordant, discordant,
       CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT)
            WHEN concordant >= discordant
              THEN CAST((1000000 * (concordant - discordant)) // n_pairs AS BIGINT)
            ELSE -CAST((1000000 * (discordant - concordant)) // n_pairs AS BIGINT)
       END AS tau_q6
FROM pr""",
)
def rank_correlation_bm25_tfidf(spark, sf_dir):
    """Kendall tau-a between the BM25 top-20 ranking and a plain tf·idf
    ranking of the SAME docs for the shared query — the scoring-model
    A/B diagnostic (how much does the saturation/length normalization
    BM25 adds actually reorder results here?). Both legs rank over exact
    integers (score_q6 / Σ tf·idf_q6 with doc_id tiebreaks — the
    hybrid_rrf quantized-legs rule), so the pair counts are engine-exact;
    tau_q6's sign is handled by an explicit CASE because Spark's `div`
    truncates toward zero while DuckDB's `//` floors — they only agree on
    nonnegative operands.

    Scale shape: candidates from the memoized `_bm25_match_set` truncated
    by one TakeOrdered(20); idf is |q|-row map-side; the tfidf rescore is
    a 20-key broadcast back into tf (the ltr_features shape); the pair
    join is 20×20 driver-trivial rows."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    top = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "r1",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))),
        )
        .select("doc_id", "r1")
    )
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    st = dl.agg(F.count("*").cast("double").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = F.broadcast(spark.createDataFrame([(t,) for t in _TOPK_TERMS], "term string"))
    idf = (
        dfs.join(q, "term")
        .crossJoin(F.broadcast(st))
        .select(
            "term",
            F.expr(
                "cast(round(1000000 * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))) as bigint)"
            ).alias("idf_q6"),
        )
    )
    ti = (
        tf.join(F.broadcast(top.select("doc_id")), "doc_id")
        .join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.expr("tf * idf_q6")).cast("long").alias("tfidf"))
    )
    rk = (
        top.join(ti, "doc_id")
        .withColumn(
            "r2",
            F.row_number().over(Window.orderBy(F.desc("tfidf"), F.asc("doc_id"))),
        )
        .select("doc_id", "r1", "r2")
    )
    a, b = rk.alias("a"), rk.alias("b")
    pr = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            ((F.col("a.r1") - F.col("b.r1")) * (F.col("a.r2") - F.col("b.r2"))).alias(
                "prod"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count_if(F.col("prod") > 0).cast("long").alias("concordant"),
            F.count_if(F.col("prod") < 0).cast("long").alias("discordant"),
        )
    )
    return pr.select(
        "n_pairs",
        "concordant",
        "discordant",
        F.expr(
            "CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT) "
            "WHEN concordant >= discordant "
            "THEN CAST((1000000 * (concordant - discordant)) div n_pairs AS BIGINT) "
            "ELSE -CAST((1000000 * (discordant - concordant)) div n_pairs AS BIGINT) END"
        ).alias("tau_q6"),
    )


# ---------------------------------------------------------------------------
# session 38 — TPC-H join-shape evidence (Q3/Q10), ES boosting/dis_max
# query parity, auto_date_histogram, dedup/quality threshold curves,
# SQ-clip calibration, recall@k curve
# ---------------------------------------------------------------------------

_Q3_CUT = "TIMESTAMP '1998-01-01 00:00:00'"


@register(
    "orders_topk_unshipped",
    f"""WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
o AS (
  SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS o_date_us, o_orderpriority
  FROM orders WHERE o_orderdate < {_Q3_CUT}),
l AS (
  SELECT l_orderkey, {_LI_DISC_C} AS rev_c
  FROM lineitem WHERE l_shipdate > {_Q3_CUT})
SELECT l.l_orderkey, o.o_date_us, o.o_orderpriority,
       CAST(sum(l.rev_c) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
JOIN c ON o.o_custkey = c.c_custkey
GROUP BY l.l_orderkey, o.o_date_us, o.o_orderpriority
ORDER BY revenue_c DESC, l_orderkey ASC LIMIT 10""",
)
def orders_topk_unshipped(spark, sf_dir):
    """TPC-H Q3-shape shipping-priority query: revenue still unshipped as
    of the cutoff for one market segment, top-10 orders — the canonical
    3-way fact⋈fact⋈dim join with a selective top-k, completing the
    generic-relational evidence family (Q1 scan-agg, Q5 dim rollup, Q3
    join+topk). Money is cents-rounded PER ROW via the shared
    `_LI_DISC_C` expr string, so group sums are exact BIGINT and the
    top-10 cut (revenue desc, orderkey asc) is an integer ordering both
    engines agree on; dates travel as `unix_micros`/`epoch_us` BIGINTs
    (the events-table rule).

    Scale shape: both date filters and the segment filter push into their
    parquet scans; orders⋈customer and lineitem⋈orders are key-keyed
    shuffle joins (all sides unbounded — never force-broadcast; AQE
    localizes when one side fits); the groupBy key is the join key
    (l_orderkey), so it reuses the lineitem⋈orders exchange, and top-10
    is a TakeOrdered, never a global sort."""
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.expr(f"o_orderdate < {_Q3_CUT}"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("o_date_us"),
            "o_orderpriority",
        )
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.expr(f"l_shipdate > {_Q3_CUT}"))
        .select("l_orderkey", F.expr(_LI_DISC_C).alias("rev_c"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_date_us", "o_orderpriority")
        .agg(
            F.sum("rev_c").cast("long").alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q10_FROM = "TIMESTAMP '1996-01-01 00:00:00'"
_Q10_TO = "TIMESTAMP '1996-04-01 00:00:00'"


@register(
    "customer_returns_topk",
    f"""WITH o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= {_Q10_FROM} AND o_orderdate < {_Q10_TO}),
l AS (
  SELECT l_orderkey, {_LI_DISC_C} AS rev_c
  FROM lineitem WHERE l_returnflag = 'R'),
r AS (
  SELECT o.o_custkey, CAST(sum(l.rev_c) AS BIGINT) AS revenue_c,
         CAST(count(*) AS BIGINT) AS n_items
  FROM l JOIN o ON l.l_orderkey = o.o_orderkey GROUP BY o.o_custkey)
SELECT c.c_custkey, c.c_name, n.n_name, r.revenue_c, r.n_items
FROM r JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY revenue_c DESC, c_custkey ASC LIMIT 20""",
)
def customer_returns_topk(spark, sf_dir):
    """TPC-H Q10-shape returned-item report: per-customer revenue of
    returned lineitems for one quarter's orders, top-20 customers with
    their nation — the agg-THEN-join shape (fact joins collapse to a
    custkey rollup BEFORE the dim joins, so the customer join carries
    |customers-with-returns| rows, not |lineitems|).

    Scale shape: returnflag and the date window push into the scans;
    lineitem⋈orders shuffles on orderkey; the custkey agg combines
    map-side; customer joins the pre-aggregated rollup un-hinted (AQE
    broadcasts the ≤|custkey| rollup when it fits) and nation (25 rows)
    is explicitly broadcast; top-20 is a TakeOrdered over exact
    cents-BIGINT revenue with the custkey tiebreak."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.expr(f"o_orderdate >= {_Q10_FROM} AND o_orderdate < {_Q10_TO}"))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", F.expr(_LI_DISC_C).alias("rev_c"))
    )
    r = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum("rev_c").cast("long").alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return (
        r.join(c, r["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("c_custkey", "c_name", "n_name", "revenue_c", "n_items")
        .orderBy(F.desc("revenue_c"), F.asc("c_custkey"))
        .limit(20)
    )


# --- session 38 batch 2: ES boosting / dis_max query parity + ES
# auto_date_histogram --------------------------------------------------------

# shared BM25 stats prelude (tf/dl/st/dfs) for oracles that score MORE than
# one term set over the same corpus stats — the _bm25_agg_ctes chain split so
# two query legs can share one tf scan (the formula text is identical, so leg
# scores match _bm25_match_set bit-for-bit)
_BM25_STATS_CTES = f"""
WITH tf AS ({SQL_TF}),
dl AS ({SQL_DL}),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)"""


def _bm25_leg_ctes(suffix: str, terms: list[str]) -> str:
    """One scored query leg (q/per/agg CTEs, ``agg{suffix}(doc_id,
    score_q6)``) over the shared `_BM25_STATS_CTES` prelude."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
q{suffix} AS (SELECT unnest([{tlist}]) AS term),
per{suffix} AS (
  SELECT tf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st))) AS s
  FROM tf JOIN q{suffix} USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id)
),
agg{suffix} AS (
  SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
  FROM per{suffix} GROUP BY doc_id
)"""


_BOOST_NEG_TERM = "slow"


@register(
    "boosting_query",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
neg AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{_BOOST_NEG_TERM}'),
adj AS (
  SELECT agg.doc_id,
         CASE WHEN neg.doc_id IS NOT NULL THEN agg.score_q6 // 2
              ELSE agg.score_q6 END AS score_q6,
         CAST(neg.doc_id IS NOT NULL AS BIGINT) AS demoted
  FROM agg LEFT JOIN neg ON agg.doc_id = neg.doc_id)
SELECT doc_id, score_q6, demoted,
       CAST(row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS BIGINT) AS rank
FROM adj ORDER BY score_q6 DESC, doc_id ASC LIMIT 10""",
)
def boosting_query(spark, sf_dir):
    """ES `boosting` query: positive BM25 clause scored normally, docs
    matching the negative clause demoted by negative_boost = 0.5 — the
    soft-exclusion ES exposes when must_not is too blunt (demote, don't
    drop). The demotion is score_q6 div 2 on the already-quantized score:
    operands are nonnegative so Spark's truncating `div` and DuckDB's
    flooring `//` agree, and no float re-rounding enters after the match
    set's one q6 rounding.

    Scale shape: scoring is the memoized `_bm25_match_set`; the negative
    clause is a pure MAP-SIDE membership filter (array_contains over the
    token array — no explode, no distinct shuffle; a full posting-set
    distinct for one term cost 3× the whole query at sf0.1) left-joined
    as a flag (the bool_filter_query algebra, demote instead of
    anti-join); top-10 is a TakeOrdered over the match set, never a
    global sort."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    neg = (
        _docs(spark, sf_dir)
        .where(F.array_contains(spark_tokens("text"), F.lit(_BOOST_NEG_TERM)))
        .select("doc_id")
        .withColumn("is_neg", F.lit(1))
    )
    adj = agg.join(neg, "doc_id", "left").select(
        "doc_id",
        F.expr(
            "CASE WHEN is_neg IS NOT NULL THEN score_q6 div 2 ELSE score_q6 END"
        ).alias("score_q6"),
        F.expr("CAST(is_neg IS NOT NULL AS BIGINT)").alias("demoted"),
    )
    topk = adj.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    return (
        topk.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))
            .cast("long"),
        )
        .select("doc_id", "score_q6", "demoted", "rank")
        .orderBy("rank")
    )


_DISMAX_Q1 = ["spark", "hash"]
_DISMAX_Q2 = ["join", "scan"]


@register(
    "dis_max_query",
    _BM25_STATS_CTES
    + ","
    + _bm25_leg_ctes("1", _DISMAX_Q1)
    + ","
    + _bm25_leg_ctes("2", _DISMAX_Q2)
    + """,
u AS (
  SELECT doc_id, COALESCE(a1.score_q6, 0) AS s1, COALESCE(a2.score_q6, 0) AS s2
  FROM agg1 a1 FULL JOIN agg2 a2 USING (doc_id)),
adj AS (
  SELECT doc_id, s1, s2,
         greatest(s1, s2) + (3 * least(s1, s2)) // 10 AS score_q6
  FROM u)
SELECT doc_id, s1, s2, score_q6,
       CAST(row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS BIGINT) AS rank
FROM adj ORDER BY score_q6 DESC, doc_id ASC LIMIT 10""",
)
def dis_max_query(spark, sf_dir):
    """ES `dis_max` query across two scored legs with tie_breaker = 0.3:
    per-doc score = best leg + 0.3 × other leg — the multi-query
    disjunction ES uses when summing legs would double-count (the
    query-level analogue of cross_fields_search's per-term dis-max).
    The combine is pure integer over the legs' q6 scores (3·min div 10,
    nonnegative operands → div == //), so no float enters after each
    leg's one rounding; a doc matching one leg scores COALESCE 0 on the
    other via the full outer join.

    Scale shape: each leg is a memoized `_bm25_match_set` (match-set
    sized, term-pruned); the full outer join keys on doc_id and both
    sides are match sets — bounded by matching docs, not the corpus;
    top-10 is a TakeOrdered."""
    a1 = _bm25_match_set(spark, sf_dir, _DISMAX_Q1).select(
        "doc_id", F.col("score_q6").alias("s1")
    )
    a2 = _bm25_match_set(spark, sf_dir, _DISMAX_Q2).select(
        "doc_id", F.col("score_q6").alias("s2")
    )
    u = (
        a1.join(a2, ["doc_id"], "full")
        .select(
            "doc_id",
            F.coalesce(F.col("s1"), F.lit(0)).alias("s1"),
            F.coalesce(F.col("s2"), F.lit(0)).alias("s2"),
        )
    )
    adj = u.select(
        "doc_id",
        "s1",
        "s2",
        F.expr("greatest(s1, s2) + (3 * least(s1, s2)) div 10").alias("score_q6"),
    )
    topk = adj.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    return (
        topk.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))
            .cast("long"),
        )
        .select("doc_id", "s1", "s2", "score_q6", "rank")
        .orderBy("rank")
    )


# ES auto_date_histogram ladder (µs): hour, day, 7 days, 30 days
_ADH_LADDER = [3_600_000_000, 86_400_000_000, 604_800_000_000, 2_592_000_000_000]
_ADH_TARGET = 20


@register(
    "auto_date_histogram",
    f"""WITH t AS (SELECT epoch_us(ts) AS t_us FROM events),
mm AS (SELECT min(t_us) AS mn, max(t_us) AS mx FROM t),
ladder AS (SELECT unnest([{", ".join(str(i) for i in _ADH_LADDER)}]) AS interval_us),
pick AS (
  SELECT interval_us FROM ladder, mm
  WHERE (mx // interval_us) - (mn // interval_us) + 1 <= {_ADH_TARGET}
  ORDER BY interval_us ASC LIMIT 1)
SELECT CAST(p.interval_us AS BIGINT) AS interval_us,
       CAST((t.t_us // p.interval_us) * p.interval_us AS BIGINT) AS bucket_start_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM t, pick p GROUP BY 1, 2 ORDER BY bucket_start_us""",
)
def auto_date_histogram(spark, sf_dir):
    """ES `auto_date_histogram`: pick the SMALLEST interval from a fixed
    ladder (hour/day/week/30-day) that keeps the bucket count ≤ the
    target (20), then histogram event time at that interval — the
    "zoom-to-fit" histogram dashboards issue when the time span is
    unknown. Bucket count and bucket ids are pure integer floor-division
    on nonnegative epoch-µs (div == //), so the interval choice — the
    part that could diverge — is bit-exact across engines.

    Scale shape: one map-side min/max agg picks the interval (2 scalar
    rows broadcast); the histogram is a ≤target-group hash agg with
    map-side partials — the one exchange carries ≤20 rows per task
    regardless of event count."""
    t = _events(spark, sf_dir).select(
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us")
    )
    mm = t.agg(F.min("t_us").alias("mn"), F.max("t_us").alias("mx"))
    ladder = spark.createDataFrame(
        [(i,) for i in _ADH_LADDER], "interval_us long"
    )
    pick = (
        ladder.crossJoin(F.broadcast(mm))
        .where(
            F.expr(
                f"(mx div interval_us) - (mn div interval_us) + 1 <= {_ADH_TARGET}"
            )
        )
        .orderBy(F.asc("interval_us"))
        .limit(1)
        .select("interval_us")
    )
    return (
        t.crossJoin(F.broadcast(pick))
        .groupBy(
            F.col("interval_us").cast("long").alias("interval_us"),
            F.expr("CAST((t_us div interval_us) * interval_us AS BIGINT)").alias(
                "bucket_start_us"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("bucket_start_us")
    )


# --- session 38 batch 3: dedup-threshold and quality-ablation tuning
# curves — the "what does the knob cost in tokens" sweeps a pipeline owner
# reads before fixing a cutoff ------------------------------------------------

_DEDUP_THRESHOLDS = [50, 60, 70, 80, 90]  # Jaccard percent cutoffs


@register(
    "dedup_threshold_curve",
    _SQL_LSH_PAIRS
    + f""",
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
thr AS (SELECT unnest([{", ".join(str(t) for t in _DEDUP_THRESHOLDS)}]) AS thr_pct),
surv AS (
  SELECT t.thr_pct, i.doc_a, i.doc_b
  FROM inter i JOIN thr t ON 100 * i.c >= t.thr_pct * (i.na + i.nb - i.c)),
drops AS (SELECT thr_pct, doc_b FROM surv GROUP BY thr_pct, doc_b),
ntok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
pa AS (SELECT thr_pct, CAST(count(*) AS BIGINT) AS n_pairs FROM surv GROUP BY thr_pct),
da AS (
  SELECT d.thr_pct, CAST(count(*) AS BIGINT) AS n_docs_dropped,
         CAST(COALESCE(sum(n.n_tok), 0) AS BIGINT) AS tokens_removed
  FROM drops d JOIN ntok n ON n.doc_id = d.doc_b GROUP BY d.thr_pct)
SELECT CAST(t.thr_pct AS BIGINT) AS thr_pct,
       CAST(COALESCE(pa.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(da.n_docs_dropped, 0) AS BIGINT) AS n_docs_dropped,
       CAST(COALESCE(da.tokens_removed, 0) AS BIGINT) AS tokens_removed
FROM thr t LEFT JOIN pa USING (thr_pct) LEFT JOIN da USING (thr_pct)
ORDER BY thr_pct""",
)
def dedup_threshold_curve(spark, sf_dir):
    """Dedup Jaccard-threshold sweep: for each candidate cutoff
    (J ≥ 0.5 … 0.9), how many LSH candidate pairs survive exact
    verification, and what the drop-larger-doc_id survivor policy would
    remove in docs and tokens — the cost curve read BEFORE fixing the
    dedup threshold (fourth member of the tuning-diagnostics family:
    banding precision, (b,r) sweep, shingle-k curve, now the threshold
    itself). The survival test is the integer cross-multiplication
    100·|∩| ≥ t·|∪| (|∪| = na+nb−c) — no float Jaccard anywhere; the
    threshold spine LEFT JOINs so zero-survivor cutoffs still emit rows
    (the lsh_band_config_curve rule), and the possibly-empty token sum is
    COALESCE'd on BOTH engines (the dedup_policy_compare NULL lesson).

    Scale shape: exact intersections are computed on CANDIDATES ONLY from
    the memoized `_lsh_pair_edges` graph (never all-pairs); the 5-row
    threshold spine fans the candidate table via a broadcast theta-join
    (the nprobe-curve idiom); per-doc token counts are map-side. inter is
    localCheckpoint'd — two aggregates (pair counts, drop ledger) consume
    it and each would re-run the shingle join otherwise."""
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
        .localCheckpoint()
    )
    thr = F.broadcast(
        spark.createDataFrame([(t,) for t in _DEDUP_THRESHOLDS], "thr_pct long")
    )
    surv = inter.join(thr, F.expr("100 * c >= thr_pct * (na + nb - c)")).select(
        "thr_pct", "doc_a", "doc_b"
    )
    pa = surv.groupBy("thr_pct").agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    drops = surv.select("thr_pct", "doc_b").distinct()
    ntok = _docs(spark, sf_dir).select(
        "doc_id", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    da = (
        drops.join(ntok, drops["doc_b"] == ntok["doc_id"])
        .groupBy("thr_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_dropped"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("tokens_removed"),
        )
    )
    spine = spark.createDataFrame([(t,) for t in _DEDUP_THRESHOLDS], "thr_pct long")
    return (
        spine.join(pa, "thr_pct", "left")
        .join(da, "thr_pct", "left")
        .select(
            "thr_pct",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_docs_dropped"), F.lit(0)).cast("long").alias("n_docs_dropped"),
            F.coalesce(F.col("tokens_removed"), F.lit(0)).cast("long").alias("tokens_removed"),
        )
        .orderBy("thr_pct")
    )


_QUALITY_THRESHOLDS = [0, 20, 40, 60, 80]  # type-token-ratio percent gates


@register(
    "quality_ablation_curve",
    f"""WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_distinct
  FROM documents),
tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tokens FROM d),
thr AS (SELECT unnest([{", ".join(str(t) for t in _QUALITY_THRESHOLDS)}]) AS thr_pct),
k AS (
  SELECT t.thr_pct, CAST(count(*) AS BIGINT) AS n_docs_kept,
         CAST(COALESCE(sum(d.n_tok), 0) AS BIGINT) AS tokens_kept
  FROM d JOIN thr t ON 100 * d.n_distinct >= t.thr_pct * d.n_tok
  GROUP BY t.thr_pct)
SELECT CAST(t.thr_pct AS BIGINT) AS thr_pct,
       CAST(COALESCE(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept,
       CASE WHEN (SELECT total_tokens FROM tot) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * COALESCE(k.tokens_kept, 0))
                      // (SELECT total_tokens FROM tot) AS BIGINT)
       END AS kept_share_q6
FROM thr t LEFT JOIN k USING (thr_pct) ORDER BY thr_pct""",
)
def quality_ablation_curve(spark, sf_dir):
    """Quality-gate ablation sweep: token/doc survival at increasing
    type-token-ratio cutoffs (distinct/total ≥ 0 … 0.8) — the "how much
    of the corpus does this filter actually cost" curve read next to
    quality_budget_select (which fills a budget) and the Gopher flags
    (which gate individually). The gate is the integer cross-mult
    100·n_distinct ≥ t·n_tok (training_mix_pipeline's bit-exact ratio
    rule — empty docs pass every gate as 0 ≥ 0 and contribute 0 tokens);
    the share divides exact BIGINTs with the all-empty-corpus 0/0 guard
    (temperature_mix_weights lesson).

    Scale shape: per-doc (n_tok, n_distinct) is computed map-side from
    the words array (size/array_distinct — never a tf shuffle); the 5-row
    threshold spine fans it via a broadcast theta-join and each gate
    collapses map-side to one row; total_tokens is one scalar agg."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(spark_tokens("text")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(spark_tokens("text"))).cast("long").alias("n_distinct"),
    )
    tot = d.agg(F.sum("n_tok").cast("long").alias("total_tokens"))
    thr = F.broadcast(
        spark.createDataFrame([(t,) for t in _QUALITY_THRESHOLDS], "thr_pct long")
    )
    k = (
        d.join(thr, F.expr("100 * n_distinct >= thr_pct * n_tok"))
        .groupBy("thr_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("tokens_kept"),
        )
    )
    spine = spark.createDataFrame([(t,) for t in _QUALITY_THRESHOLDS], "thr_pct long")
    return (
        spine.join(k, "thr_pct", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "thr_pct",
            F.coalesce(F.col("n_docs_kept"), F.lit(0)).cast("long").alias("n_docs_kept"),
            F.coalesce(F.col("tokens_kept"), F.lit(0)).cast("long").alias("tokens_kept"),
            F.expr(
                "CASE WHEN total_tokens = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((1000000 * COALESCE(tokens_kept, 0)) div total_tokens AS BIGINT) END"
            ).alias("kept_share_q6"),
        )
        .orderBy("thr_pct")
    )


# --- session 38 batch 4: SQ clip-bound calibration + recall@k curve ----------


@register(
    "embedding_dim_clip_bounds",
    _SQL_EMB_E
    + """
ex AS (
  SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000) AS BIGINT) AS xq3
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i) WHERE vec_id <> 0),
hist AS (SELECT dim, xq3, count(*) AS cnt FROM ex GROUP BY dim, xq3),
h AS (
  SELECT dim, xq3, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY dim ORDER BY xq3
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(cnt) OVER (PARTITION BY dim) AS BIGINT) AS n
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES (10000), (990000)) AS v(p_q6)),
agg AS (
  SELECT h.dim, q.p_q6, max(h.n) AS n,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1))
                  THEN h.xq3 END) AS v_lo,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1)) + 1
                  THEN h.xq3 END) AS v_hi
  FROM h, q GROUP BY h.dim, q.p_q6)
SELECT CAST(dim AS BIGINT) AS dim, CAST(p_q6 AS BIGINT) AS p_q6,
       CAST(round(1000.0 * (v_lo + ((p_q6 / 1000000.0) * (n - 1)
            - floor((p_q6 / 1000000.0) * (n - 1))) * (v_hi - v_lo))) AS BIGINT) AS clip_q6
FROM agg ORDER BY dim, p_q6""",
)
def embedding_dim_clip_bounds(spark, sf_dir):
    """Per-dimension p1/p99 clip bounds — the calibration pass a scalar
    quantizer runs BEFORE sq8_quantization_error's min/max affine code:
    training the code on percentile clips instead of raw min/max is what
    keeps one outlier from wasting the int8 range (the FAISS
    SQ8/Milvus-style clip-train). Exact type-7 percentiles from a
    weighted histogram — the doclen_quantiles machinery partitioned by
    dim — with values quantized to q3 integers FIRST (round(1000·x): the
    histogram stays ≤ ~4k cells per dim at ANY corpus size, and the one
    rounding happens before ordering, so both engines interpolate
    identical integers; clip_q6 = 1000 × the q3 interpolation lands back
    in micro-units of the original value).

    Scale shape: the explode is map-side (64 rows per vector) collapsing
    into a (dim × q3-cell) histogram via map-side partials; the prefix-sum
    windows partition by dim — 64-way parallel, never a corpus-wide sort;
    the rank probes fan the histogram against a 2-row percentile spine."""
    ex = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias(
                "dim", "x"
            ),
        )
        .select("dim", F.expr("CAST(round(x * 1000) AS BIGINT)").alias("xq3"))
    )
    hist = ex.groupBy("dim", "xq3").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("dim")
        .orderBy("xq3")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("dim")
    h = hist.select(
        "dim",
        "xq3",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(10000,), (990000,)], "p_q6 long")
    rank = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    agg = (
        h.crossJoin(F.broadcast(q))
        .groupBy("dim", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank), F.col("xq3"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank) + 1, F.col("xq3"))).alias("v_hi"),
        )
    )
    r = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    frac = r - F.floor(r)
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("p_q6").cast("long").alias("p_q6"),
        F.round(F.lit(1000.0) * (F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo"))))
        .cast("long")
        .alias("clip_q6"),
    ).orderBy("dim", "p_q6")


_RECALL_KS = [1, 5, 10]


@register(
    "ann_recall_at_k_curve",
    _BATCH_SQL
    + f""", bexact AS (
  SELECT qid, vec_id, rn FROM (
    SELECT qs.qid, e.vec_id,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             CAST(round(1000000 * list_dot_product(e.v, qs.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) DESC,
             e.vec_id ASC) AS rn
    FROM qs, e WHERE e.vec_id <> 0) WHERE rn <= 10
),
ks AS (SELECT unnest([{", ".join(str(k) for k in _RECALL_KS)}]) AS k),
j AS (
  SELECT b.qid, b.rnk, x.rn
  FROM (SELECT qid, vec_id, rnk FROM btop WHERE rnk <= 10) b
  JOIN bexact x USING (qid, vec_id)),
hits AS (
  SELECT ks.k, CAST(count(*) AS BIGINT) AS sum_hits
  FROM j JOIN ks ON j.rnk <= ks.k AND j.rn <= ks.k GROUP BY ks.k),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs)
SELECT CAST(ks.k AS BIGINT) AS k, (SELECT n FROM nq) AS n_queries,
       CAST(COALESCE(h.sum_hits, 0) AS BIGINT) AS sum_hits,
       CAST((1000000 * COALESCE(h.sum_hits, 0)) // (ks.k * (SELECT n FROM nq)) AS BIGINT) AS recall_q6
FROM ks LEFT JOIN hits h ON h.k = ks.k ORDER BY k""",
)
def ann_recall_at_k_curve(spark, sf_dir):
    """Recall@k curve (k = 1/5/10) of the batch IVF probe against the
    brute-force exact ranking — the DEPTH axis of the ANN evaluation
    (nprobe_curve sweeps cells, dim_truncation sweeps dimensions; this
    sweeps the result-list cut the downstream consumer actually reads).
    hits@k counts approx∩exact pairs where BOTH ranks ≤ k — since both
    rankings nest by construction, sum_hits is provably non-decreasing
    in k (property-tested); recall_q6 divides exact integers by k·|Q|.

    Scale shape: reuses the memoized batch-probe top-10 (`_ivf_batch_topk`
    plan — probe table broadcasts) and one exact ranking; the k spine is
    a 3-row broadcast theta-join over the ≤10·|Q| joined rank pairs."""
    ivf = _ivf_batch_topk(spark, sf_dir).select("qid", "vec_id", "rnk")
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    exact = _ann_exact_top10(spark, sf_dir)
    j = ivf.join(exact, ["qid", "vec_id"]).select("rnk", "rn")
    ks = F.broadcast(spark.createDataFrame([(k,) for k in _RECALL_KS], "k long"))
    hits = (
        j.join(ks, F.expr("rnk <= k AND rn <= k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("sum_hits"))
    )
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    spine = spark.createDataFrame([(k,) for k in _RECALL_KS], "k long")
    return (
        spine.join(hits, "k", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "k",
            "n_queries",
            F.coalesce(F.col("sum_hits"), F.lit(0)).cast("long").alias("sum_hits"),
            F.expr(
                "CAST((1000000 * COALESCE(sum_hits, 0)) div (k * n_queries) AS BIGINT)"
            ).alias("recall_q6"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# session 39 — TPC-H semi-join/having/ratio shapes (Q4/Q18/Q14), embedding
# label-centroid drift QA, ES span_first + stats_bucket, and a distributed
# contiguous-row-id assigner (the scalable zipWithIndex)
# ---------------------------------------------------------------------------

_Q4_FROM = "TIMESTAMP '1996-01-01 00:00:00'"
_Q4_TO = "TIMESTAMP '1997-01-01 00:00:00'"
_Q4_GAP_US = 90 * 86_400_000_000  # 90 days in microseconds


@register(
    "orders_late_shipment_priority",
    f"""SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= {_Q4_FROM} AND o.o_orderdate < {_Q4_TO}
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {_Q4_GAP_US})
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
)
def orders_late_shipment_priority(spark, sf_dir):
    """TPC-H Q4-shape order-priority check: 1996 orders with at least one
    lineitem shipped more than 90 days after the order date, counted by
    priority — the canonical EXISTS/semi-join shape the relational family
    was still missing (Q1 scan-agg, Q5 dim rollup, Q3 join+topk, Q10
    returns). The lateness predicate compares columns from BOTH sides, so
    it cannot be pushed below the join; it rides the semi-join itself.
    Dates travel as unix_micros/epoch_us BIGINTs (the events-table rule),
    so the +90d arithmetic is an exact integer add in both engines.

    Scale shape: the order-date window pushes into the orders parquet
    scan; the LEFT SEMI join on l_orderkey is one key-keyed shuffle that
    short-circuits per probe row (no fanout — an order with 40 late items
    emits once), and the priority agg combines map-side into ≤5 rows."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.expr(f"o_orderdate >= {_Q4_FROM} AND o_orderdate < {_Q4_TO}"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("o_date_us"),
        )
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        F.expr("unix_micros(cast(l_shipdate as timestamp))").alias("ship_us"),
    )
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["ship_us"] > o["o_date_us"] + F.lit(_Q4_GAP_US)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_Q14_FROM = "TIMESTAMP '1996-09-01 00:00:00'"
_Q14_TO = "TIMESTAMP '1996-10-01 00:00:00'"


@register(
    "promo_revenue_ratio",
    f"""WITH l AS (
  SELECT l_partkey, {_LI_DISC_C} AS rev_c
  FROM lineitem WHERE l_shipdate >= {_Q14_FROM} AND l_shipdate < {_Q14_TO}),
j AS (
  SELECT CASE WHEN p.p_type = 'PROMO' THEN l.rev_c ELSE 0 END AS promo_c, l.rev_c
  FROM l JOIN part p ON l.l_partkey = p.p_partkey),
t AS (SELECT CAST(COALESCE(sum(promo_c), 0) AS BIGINT) AS promo_rev_c,
             CAST(COALESCE(sum(rev_c), 0) AS BIGINT) AS total_rev_c,
             CAST(count(*) AS BIGINT) AS n_items FROM j)
SELECT promo_rev_c, total_rev_c, n_items,
       CASE WHEN total_rev_c = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * promo_rev_c) // total_rev_c AS BIGINT)
       END AS promo_share_q6
FROM t""",
)
def promo_revenue_ratio(spark, sf_dir):
    """TPC-H Q14-shape promo-revenue share: of September-1996 shipped
    revenue, the fraction attributable to PROMO-type parts, as an exact
    integer q6 share (the integer-cross-multiplication idiom — no float
    division order). Money is cents-rounded PER ROW via the shared
    `_LI_DISC_C` expr string; the share's 1e6 cross-multiplication holds
    to ~9.2e12 cents (~$92B) in the month slice — beyond that, pre-scale
    the cents sums before the ratio (same note as the recall curves).

    Scale shape: the one-month shipdate window pushes into the lineitem
    scan (row-group pruning makes this the cheapest Q14 month at any SF);
    lineitem⋈part is a key-keyed shuffle join left UN-hinted — part
    grows with SF (never force-broadcast an unbounded side; AQE localizes
    it while it fits). The final scalar agg combines map-side into one
    row per task before the single-row reduce."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.expr(f"l_shipdate >= {_Q14_FROM} AND l_shipdate < {_Q14_TO}"))
        .select("l_partkey", F.expr(_LI_DISC_C).alias("rev_c"))
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_type")
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        F.expr("CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END").alias("promo_c"),
        "rev_c",
    )
    t = j.agg(
        F.coalesce(F.sum("promo_c"), F.lit(0)).cast("long").alias("promo_rev_c"),
        F.coalesce(F.sum("rev_c"), F.lit(0)).cast("long").alias("total_rev_c"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return t.select(
        "promo_rev_c",
        "total_rev_c",
        "n_items",
        F.expr(
            "CASE WHEN total_rev_c = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000000 * promo_rev_c) div total_rev_c AS BIGINT) END"
        ).alias("promo_share_q6"),
    )


_Q18_QTY_C = 30_000  # 300.00 quantity units, in the shared cents scale


@register(
    "large_orders_topk",
    f"""WITH lq AS (
  SELECT l_orderkey, CAST(sum({_LI_QTY_C}) AS BIGINT) AS total_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum({_LI_QTY_C}) AS BIGINT) > {_Q18_QTY_C})
SELECT o.o_orderkey, o.o_custkey, epoch_us(o.o_orderdate) AS o_date_us,
       lq.total_qty_c
FROM lq JOIN orders o ON lq.l_orderkey = o.o_orderkey
ORDER BY lq.total_qty_c DESC, o.o_orderkey ASC LIMIT 10""",
)
def large_orders_topk(spark, sf_dir):
    """TPC-H Q18-shape large-volume orders: the group-then-HAVING filter
    (orders whose total lineitem quantity exceeds 300 units) joined back
    to the order header, top-10 by volume — the aggregate-as-filter shape
    (ES bucket_selector / SQL HAVING) the relational family was missing.
    Quantity is cents-rounded per row via the shared `_LI_QTY_C` string,
    so the HAVING cut is an exact integer comparison in both engines.

    Scale shape: the l_orderkey agg combines map-side (TPC-H orders have
    ≤7 lineitems, so partial aggs collapse hard); the HAVING filter drops
    ~99.9% of groups BEFORE the join back to orders, so the join's build
    side is the tiny surviving set (un-hinted — survivor count is
    data-dependent; AQE broadcasts it when small); top-10 is a
    TakeOrdered, never a global sort."""
    lq = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.sum(F.expr(_LI_QTY_C)).cast("long").alias("total_qty_c"))
        .where(F.col("total_qty_c") > _Q18_QTY_C)
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("o_date_us"),
    )
    return (
        lq.join(o, lq["l_orderkey"] == o["o_orderkey"])
        .select("o_orderkey", "o_custkey", "o_date_us", "total_qty_c")
        .orderBy(F.desc("total_qty_c"), F.asc("o_orderkey"))
        .limit(10)
    )


# cosine of two q6-integer mean vectors; dp/nm/ng are exact BIGINTs
# (components ≤ ~1e6, 64 dims → |dp| ≤ ~6.4e13 < 2^53, so the double
# casts below are exact). dp is divided FIRST — a 1e6·dp integer product
# would pass 2^63 — and the whole expression is ONE shared string so both
# engines evaluate the identical IEEE operation order.
_CENTROID_COS = (
    "CASE WHEN nm = 0 OR ng = 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(round(1000000 * (dp / (sqrt(nm) * sqrt(ng)))) AS BIGINT) END"
)
_MEAN_Q6_M = "CAST(round(s / n) AS BIGINT)"


@register(
    "label_centroid_drift",
    f"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
  SELECT label, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS cq6
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i)),
ld AS (
  SELECT label, dim, CAST(sum(cq6) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM x GROUP BY label, dim),
gd AS (
  SELECT dim, CAST(sum(s) AS BIGINT) AS s, CAST(sum(n) AS BIGINT) AS n
  FROM ld GROUP BY dim),
m AS (
  SELECT ld.label, ld.n AS n_vecs, {_MEAN_Q6_M.replace('s / n', 'ld.s / ld.n')} AS mq6,
         {_MEAN_Q6_M.replace('s / n', 'gd.s / gd.n')} AS gq6
  FROM ld JOIN gd USING (dim)),
a AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(max(n_vecs) AS BIGINT) AS n_vecs,
         CAST(sum(mq6 * gq6) AS BIGINT) AS dp,
         CAST(sum(mq6 * mq6) AS BIGINT) AS nm,
         CAST(sum(gq6 * gq6) AS BIGINT) AS ng
  FROM m GROUP BY label)
SELECT label, n_vecs, {_CENTROID_COS} AS cos_q6
FROM a ORDER BY label""",
)
def label_centroid_drift(spark, sf_dir):
    """Embedding-space drift QA: per label, the cosine between the label's
    mean vector and the whole-corpus mean vector — the one-number check
    that a class/source's embedding mass hasn't wandered from the corpus
    center (a freshly ingested crawl whose centroid sits far off-center is
    the classic distribution-shift smell before any model sees it).

    Determinism: components are q6-rounded FIRST, per-(label, dim) sums
    are exact BIGINT adds (order-free); the mean is round(s/n) of exact
    doubles (s < 2^53); the final cosine is one shared expression string
    (`_CENTROID_COS`) over exact-integer dot/norms, so both engines run
    the identical IEEE sequence.

    Scale shape: one posexplode + (label, dim) agg with map-side partials
    — the shuffle carries |labels|·64 rows no matter the corpus size; the
    global centroid is derived from the per-label sums (labels·64 rows),
    never a second pass over the vectors; the dim join is labels·64 ⋈ 64."""
    x = _emb(spark, sf_dir).select(
        "label", F.posexplode("embedding").alias("dim", "xv")
    ).select(
        "label",
        "dim",
        F.expr("CAST(round(cast(xv as double) * 1000000) AS BIGINT)").alias("cq6"),
    )
    ld = x.groupBy("label", "dim").agg(
        F.sum("cq6").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    gd = ld.groupBy("dim").agg(
        F.sum("s").cast("long").alias("gs"), F.sum("n").cast("long").alias("gn")
    )
    m = ld.join(gd, "dim").select(
        "label",
        F.col("n").alias("n_vecs"),
        F.expr("CAST(round(s / n) AS BIGINT)").alias("mq6"),
        F.expr("CAST(round(gs / gn) AS BIGINT)").alias("gq6"),
    )
    a = m.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.max("n_vecs").cast("long").alias("n_vecs"),
        F.sum(F.col("mq6") * F.col("gq6")).cast("long").alias("dp"),
        F.sum(F.col("mq6") * F.col("mq6")).cast("long").alias("nm"),
        F.sum(F.col("gq6") * F.col("gq6")).cast("long").alias("ng"),
    )
    return a.select(
        "label", "n_vecs", F.expr(_CENTROID_COS).alias("cos_q6")
    ).orderBy("label")


_SPAN_FIRST_N = 8


@register(
    "span_first_match",
    f"""WITH w AS ({SQL_WORDS}),
f AS (SELECT doc_id, unnest(list_distinct(words[1:{_SPAN_FIRST_N}])) AS term FROM w),
nf AS (SELECT term, CAST(count(*) AS BIGINT) AS n_docs_first FROM f GROUP BY term),
d AS (SELECT doc_id, unnest(list_distinct(words)) AS term FROM w),
dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM d GROUP BY term)
SELECT nf.term, nf.n_docs_first, dfx.df
FROM nf JOIN dfx USING (term)
ORDER BY n_docs_first DESC, term ASC LIMIT 20""",
)
def span_first_match(spark, sf_dir):
    """ES span_first-query analytics: for every term, the number of docs
    where it appears within the first 8 token positions, next to its
    plain df — the lead-position bias profile (titles/openers) that
    span_first(match, end=8) queries exploit, and the evidence for
    position-boosted ranking. Top-20 by lead-doc count, term tiebreak.

    Scale shape: both legs are map-side explodes of per-doc arrays (the
    lead leg slices BEFORE distinct-ing, so it explodes ≤8 tokens/doc)
    feeding vocab-keyed aggs with map-side partials; the term join is
    vocab-sized ⋈ vocab-sized (un-hinted); top-20 is a TakeOrdered."""
    w = _docs(spark, sf_dir).select(
        "doc_id", spark_tokens("text").alias("words")
    )
    nf = (
        w.select(
            F.explode(
                F.array_distinct(F.slice("words", 1, _SPAN_FIRST_N))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_first"))
    )
    dfx = (
        w.select(F.explode(F.array_distinct("words")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return (
        nf.join(dfx, "term")
        .select("term", "n_docs_first", "df")
        .orderBy(F.desc("n_docs_first"), F.asc("term"))
        .limit(20)
    )


@register(
    "stats_bucket_daily",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(COALESCE(min(n), 0) AS BIGINT) AS min_events,
       CAST(COALESCE(max(n), 0) AS BIGINT) AS max_events,
       CAST(COALESCE(sum(n), 0) AS BIGINT) AS sum_events,
       CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * COALESCE(sum(n), 0)) // count(*) AS BIGINT)
       END AS avg_events_q6
FROM d""",
)
def stats_bucket_daily(spark, sf_dir):
    """ES stats_bucket pipeline aggregation: min/max/sum/avg OF the daily
    event-count buckets (a sibling agg over another agg's buckets) — the
    load-profile summary that pairs with the derivative/moving-average/
    anomaly members of the pipeline-agg family. avg is the integer q6
    cross-multiplication; day keys are integer-µs days (the events-table
    rule — NTZ-safe, floor/div agree because epoch_us ≥ 0 here).

    Scale shape: two stacked aggs, both map-side combined — the first
    shuffles ≤|days| rows, the second is a single-row scalar reduce over
    the tiny day table."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day_num"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.coalesce(F.min("n"), F.lit(0)).cast("long").alias("min_events"),
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("max_events"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("sum_events"),
        F.expr(
            "CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000000 * COALESCE(sum(n), 0)) div count(*) AS BIGINT) END"
        ).alias("avg_events_q6"),
    )


@register(
    "global_row_ids",
    """SELECT doc_id, source,
       CAST(row_number() OVER (ORDER BY source, doc_id) - 1 AS BIGINT) AS global_id
FROM documents ORDER BY global_id""",
)
def global_row_ids(spark, sf_dir, n_shards: int = 64):
    """Contiguous global row ids in (source, doc_id) order — the
    distributed zipWithIndex every sharded-export / curriculum / loader
    pipeline needs (`monotonically_increasing_id` is non-contiguous by
    design, and a global `row_number()` window sorts the corpus on ONE
    reducer). Same two-pass trick as `_pack_cum_before`, generalized
    across sources:

    1. order-aligned sub-shards (`g_shard = (doc_id - lo) // range` —
       monotone in doc_id, so shard order == row order within a source);
    2. per-(source, shard) row counts — a tiny sources×shards table —
       exclusive-prefix-summed in GLOBAL (source, shard) order (the only
       unpartitioned window runs on shard-count rows, never doc rows);
    3. within-shard row_number (each window partition is a bounded doc_id
       range) plus the shard offset via an un-hinted equi-join.

    Byte-identical to the single-window oracle; no doc-scale sort ever
    lands on one reducer."""
    d = _docs(spark, sf_dir).select("doc_id", "source")
    bounds = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
    lo = int(bounds.lo) if bounds.lo is not None else 0
    hi = int(bounds.hi) if bounds.hi is not None else 0
    rng = max(1, -(-(hi - lo + 1) // n_shards))
    t = d.withColumn(
        "g_shard", ((F.col("doc_id") - F.lit(lo)) / F.lit(rng)).cast("long")
    )
    totals = t.groupBy("source", "g_shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    # unpartitioned window is deliberate: totals is sources × n_shards rows
    w_off = Window.orderBy("source", "g_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "off", F.coalesce(F.sum("n_docs").over(w_off), F.lit(0))
    ).select("source", "g_shard", "off")
    w_loc = Window.partitionBy("source", "g_shard").orderBy("doc_id")
    return (
        t.join(offsets, ["source", "g_shard"])
        .select(
            "doc_id",
            "source",
            (F.col("off") + F.row_number().over(w_loc) - 1)
            .cast("long")
            .alias("global_id"),
        )
        .orderBy("global_id")
    )


# ---------------------------------------------------------------------------
# session 40 — remaining TPC-H decision-support shapes (Q13 outer-join
# distribution, Q17 correlated-avg filter, Q15 argmax-vs-scalar, Q8 star-join
# market share, Q16 anti-join distinct count, Q22 scalar-threshold + anti-join)
# and distributed triangle counting over the LSH candidate graph
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    """WITH co AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM co GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC""",
)
def customer_order_distribution(spark, sf_dir):
    """TPC-H Q13-shape customer order-count distribution: per-customer
    order counts INCLUDING zero-order customers (the LEFT OUTER join is
    the point — an inner join silently drops the idle tail, which is
    usually the business question), then the histogram of those counts.
    `count(o_orderkey)` counts non-null join matches, so a customer with
    no orders lands in the n_orders=0 bucket in both engines.

    Scale shape: customer⋈orders is one custkey-keyed shuffle (both sides
    unbounded — un-hinted, AQE picks); the first agg rides the SAME
    custkey partitioning (no second exchange); the histogram agg shuffles
    ≤|distinct counts| rows with map-side partials."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    )
    co = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return (
        co.groupBy("n_orders")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


_Q17_BRAND = "Brand#1"


@register(
    "small_quantity_revenue",
    f"""WITH bl AS (
  SELECT l.l_partkey, {_LI_QTY_C} AS qty_c, {_LI_DISC_C} AS rev_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{_Q17_BRAND}'),
pa AS (
  SELECT l_partkey, CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
         CAST(count(*) AS BIGINT) AS n FROM bl GROUP BY l_partkey),
q AS (
  SELECT bl.rev_c FROM bl JOIN pa USING (l_partkey)
  WHERE 5 * bl.qty_c * pa.n < pa.sum_qty_c)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(COALESCE(sum(rev_c), 0) AS BIGINT) AS revenue_c,
       CAST(COALESCE(sum(rev_c), 0) // 7 AS BIGINT) AS avg_yearly_c
FROM q""",
)
def small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-shape small-quantity revenue: for one brand, the revenue
    of lineitems whose quantity is below 20% of that part's average
    quantity — the correlated-aggregate-subquery shape, decorrelated as
    per-part sufficient stats joined back to the rows. The 20%-of-avg cut
    is the integer cross-multiplication ``5·qty·n < Σqty`` (qty and Σqty
    in exact cents), so no float average ever exists to diverge.

    Scale shape: the brand filter pushes into the part scan and the
    part⋈lineitem join prunes ~96% of lineitem rows BEFORE any agg (part
    is un-hinted — it scales with SF; AQE broadcasts the filtered slice
    when small); per-part stats and the join back share the l_partkey
    partitioning; the final agg is a 1-row scalar reduce."""
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.expr(_LI_QTY_C).alias("qty_c"),
        F.expr(_LI_DISC_C).alias("rev_c"),
    )
    bl = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "qty_c", "rev_c"
    )
    pa = bl.groupBy("l_partkey").agg(
        F.sum("qty_c").cast("long").alias("sum_qty_c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    q = bl.join(pa, "l_partkey").where(
        F.lit(5) * F.col("qty_c") * F.col("n") < F.col("sum_qty_c")
    )
    return q.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(F.sum("rev_c"), F.lit(0)).cast("long").alias("revenue_c"),
        F.expr("CAST(COALESCE(sum(rev_c), 0) div 7 AS BIGINT)").alias(
            "avg_yearly_c"
        ),
    )


_Q15_FROM = "TIMESTAMP '1996-01-01 00:00:00'"
_Q15_TO = "TIMESTAMP '1996-04-01 00:00:00'"


@register(
    "top_supplier_revenue",
    f"""WITH sr AS (
  SELECT l_suppkey, CAST(sum({_LI_DISC_C}) AS BIGINT) AS revenue_c
  FROM lineitem
  WHERE l_shipdate >= {_Q15_FROM} AND l_shipdate < {_Q15_TO}
  GROUP BY l_suppkey),
mx AS (SELECT CAST(max(revenue_c) AS BIGINT) AS m FROM sr)
SELECT s.s_suppkey, s.s_name, sr.revenue_c
FROM sr JOIN mx ON sr.revenue_c = mx.m
JOIN supplier s ON s.s_suppkey = sr.l_suppkey
ORDER BY s.s_suppkey""",
)
def top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15-shape top supplier: per-supplier revenue over one
    quarter, returning every supplier whose revenue EQUALS the global
    maximum (the argmax-vs-scalar-subquery shape — ties must all
    surface, which is why this is an equality join against a 1-row max,
    not a LIMIT 1). Money is exact cents, so revenue ties are exact
    integer ties in both engines.

    Scale shape: the quarter filter pushes into the lineitem scan; the
    suppkey agg combines map-side into |suppliers| rows; the 1-row max
    broadcasts back over that agg (never a window over all suppliers —
    an unpartitioned window would single-reduce a table that scales with
    SF); the supplier name join is un-hinted (supplier scales)."""
    sr = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.expr(f"l_shipdate >= {_Q15_FROM} AND l_shipdate < {_Q15_TO}"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr(_LI_DISC_C)).cast("long").alias("revenue_c"))
    )
    mx = sr.agg(F.max("revenue_c").cast("long").alias("m"))
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    return (
        sr.join(F.broadcast(mx), sr["revenue_c"] == mx["m"])
        .join(s, sr["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "revenue_c")
        .orderBy("s_suppkey")
    )


_Q8_REGION = "EUROPE"


@register(
    "promo_market_share_by_year",
    f"""WITH eur AS (
  SELECT n.n_nationkey FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{_Q8_REGION}'),
pl AS (
  SELECT l.l_orderkey, l.l_suppkey, {_LI_DISC_C} AS rev_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'PROMO'),
j AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year, pl.rev_c,
         CASE WHEN e.n_nationkey IS NOT NULL THEN pl.rev_c ELSE 0 END AS eur_c
  FROM pl JOIN orders o ON pl.l_orderkey = o.o_orderkey
  JOIN supplier s ON pl.l_suppkey = s.s_suppkey
  LEFT JOIN eur e ON s.s_nationkey = e.n_nationkey),
y AS (
  SELECT o_year, CAST(sum(rev_c) AS BIGINT) AS total_rev_c,
         CAST(sum(eur_c) AS BIGINT) AS europe_rev_c
  FROM j GROUP BY o_year)
SELECT o_year, total_rev_c, europe_rev_c,
       CASE WHEN total_rev_c = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * europe_rev_c) // total_rev_c AS BIGINT)
       END AS europe_share_q6
FROM y ORDER BY o_year""",
)
def promo_market_share_by_year(spark, sf_dir):
    """TPC-H Q8-shape market share: per order year, the fraction of
    PROMO-part revenue supplied by suppliers from {_Q8_REGION!r} nations
    — the five-table star join (lineitem ⋈ part ⋈ orders ⋈ supplier ⋈
    nation⋈region) with a conditional-sum ratio. Share is the q6 integer
    cross-multiplication; `year()` of a date-typed column agrees across
    engines (no timezone — the events-table NTZ rule doesn't bite on
    DATE-granularity values).

    Scale shape: the p_type filter prunes into the part scan and the
    part join drops ~83% of lineitem before the expensive orderkey join;
    nation⋈region (≤25 rows) broadcasts as the membership flag; orders
    and supplier joins are un-hinted key shuffles; the year agg combines
    map-side into ≤|years| rows."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_regionkey"
    )
    r = spark.read.parquet(f"{sf_dir}/region.parquet").where(
        F.col("r_name") == _Q8_REGION
    )
    eur = n.join(r, n["n_regionkey"] == r["r_regionkey"]).select("n_nationkey")
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_orderkey", "l_suppkey", F.expr(_LI_DISC_C).alias("rev_c")
    )
    pl = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "l_orderkey", "l_suppkey", "rev_c"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("o_year")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    j = (
        pl.join(o, pl["l_orderkey"] == o["o_orderkey"])
        .join(s, pl["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(eur), s["s_nationkey"] == eur["n_nationkey"], "left")
        .select(
            "o_year",
            "rev_c",
            F.expr(
                "CASE WHEN n_nationkey IS NOT NULL THEN rev_c ELSE 0 END"
            ).alias("eur_c"),
        )
    )
    y = j.groupBy("o_year").agg(
        F.sum("rev_c").cast("long").alias("total_rev_c"),
        F.sum("eur_c").cast("long").alias("europe_rev_c"),
    )
    return y.select(
        "o_year",
        "total_rev_c",
        "europe_rev_c",
        F.expr(
            "CASE WHEN total_rev_c = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000000 * europe_rev_c) div total_rev_c AS BIGINT) END"
        ).alias("europe_share_q6"),
    ).orderBy("o_year")


@register(
    "supplier_parts_exclusion",
    """WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
ps AS (
  SELECT DISTINCT l.l_partkey, l.l_suppkey
  FROM lineitem l WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM bad))
SELECT p.p_type, CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS n_suppliers
FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
GROUP BY p.p_type ORDER BY n_suppliers DESC, p.p_type ASC""",
)
def supplier_parts_exclusion(spark, sf_dir):
    """TPC-H Q16-shape supplier count with exclusion: distinct suppliers
    who ship each part type, EXCLUDING suppliers in a deny set (negative
    account balance here; the reference Q16 uses a complaints predicate)
    — the NOT-IN/anti-join + count-distinct shape. The part-supplier
    relation is derived from lineitem (this sandbox has no partsupp
    table), deduplicated before counting.

    Scale shape: the deny set is a LEFT ANTI join (un-hinted — its size
    is data-dependent; AQE broadcasts the usually-tiny bad list); the
    (partkey, suppkey) DISTINCT and the part join share the l_partkey
    shuffle; count(DISTINCT suppkey) per type expands to a two-level agg
    with map-side partials under AQE."""
    bad = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    ps = (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .distinct()
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type"
    )
    return (
        ps.join(p, ps["l_partkey"] == p["p_partkey"])
        .groupBy("p_type")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), F.asc("p_type"))
    )


_Q22_FROM = "TIMESTAMP '2001-01-01 00:00:00'"


@register(
    "idle_rich_customers",
    f"""WITH bal AS (
  SELECT c_custkey, c_nationkey, CAST(round(100 * c_acctbal) AS BIGINT) AS bal_c
  FROM customer),
ap AS (SELECT CAST(COALESCE(sum(bal_c), 0) AS BIGINT) AS s,
              CAST(count(*) AS BIGINT) AS n FROM bal WHERE bal_c > 0),
rich AS (SELECT b.* FROM bal b, ap WHERE b.bal_c * ap.n > ap.s),
recent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= {_Q22_FROM}),
idle AS (
  SELECT r.* FROM rich r WHERE r.c_custkey NOT IN (SELECT o_custkey FROM recent))
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(bal_c) AS BIGINT) AS total_bal_c
FROM idle GROUP BY c_nationkey ORDER BY c_nationkey""",
)
def idle_rich_customers(spark, sf_dir):
    """TPC-H Q22-shape lost-opportunity audit: customers whose balance
    exceeds the positive-balance average but who placed no order since
    2001, rolled up by nation — the scalar-threshold + anti-join
    composite. The above-average cut is the integer cross-multiplication
    ``bal·n > Σbal`` over exact cents (both sides BIGINT; negative
    balances compare correctly because only the left side can be
    negative), so no float average exists to diverge.

    Scale shape: the positive-balance stats are a 1-row scalar broadcast
    back over customer (map-side filter, no shuffle); the recent-buyer
    set pushes the date filter into the orders scan and LEFT ANTI joins
    on custkey (un-hinted — buyer count is unbounded); the nation rollup
    combines map-side into ≤|nations| rows."""
    bal = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(round(100 * c_acctbal) AS BIGINT)").alias("bal_c"),
    )
    ap = bal.where(F.col("bal_c") > 0).agg(
        F.coalesce(F.sum("bal_c"), F.lit(0)).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    rich = bal.crossJoin(F.broadcast(ap)).where(
        F.col("bal_c") * F.col("n") > F.col("s")
    )
    recent = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.expr(f"o_orderdate >= {_Q22_FROM}"))
        .select("o_custkey")
        .distinct()
    )
    idle = rich.join(
        recent, rich["c_custkey"] == recent["o_custkey"], "left_anti"
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("bal_c").cast("long").alias("total_bal_c"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "lsh_triangle_count",
    _SQL_LSH_PAIRS
    + """,
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b FROM pairs)
  GROUP BY v),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM pairs p1
  JOIN pairs p2 ON p2.doc_a = p1.doc_b
  JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM pairs),
w AS (SELECT CAST(COALESCE(sum(d * (d - 1) // 2), 0) AS BIGINT) AS n_wedges FROM deg)
SELECT e.n_edges, w.n_wedges, tri.n_triangles,
       CASE WHEN w.n_wedges = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * 3 * tri.n_triangles) // w.n_wedges AS BIGINT)
       END AS clustering_q6
FROM e, w, tri""",
)
def lsh_triangle_count(spark, sf_dir):
    """Triangle count + global clustering coefficient of the MinHash-LSH
    candidate graph — the transitivity audit of a near-dup graph (high
    clustering = dup CLUSTERS, low = chained false positives bridging
    unrelated docs; read next to lsh_degree_histogram). Exact counts:
    clustering_q6 = 1e6·3·triangles/wedges, wedges = Σ d(d−1)/2.

    Scale shape: the classic degree-ordered orientation (MapReduce
    node-iterator, Cohen 2009 / Suri-Vassilvitskii 2011): each undirected
    edge is oriented low→high by (degree, id), so every vertex's
    out-degree is bounded near sqrt(|E|) even on power-law graphs — the
    wedge join explodes Σ outdeg(v)² candidates instead of Σ deg(v)²,
    which is what makes a celebrity node survivable. Each triangle has
    exactly ONE vertex with two out-edges under a total-order
    orientation, so candidates close against the undirected edge set
    without double counting. Reuses the memoized `_lsh_pair_edges`
    front half; all joins are key-equi on doc ids."""
    edges = _lsh_pair_edges(spark, sf_dir)  # symmetric, checkpointed
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("src").alias("b"), F.col("d").alias("db"))
    # orient each edge from the (degree, id)-smaller endpoint outward
    wd = pairs.join(da, "a").join(db, "b")
    out = wd.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
        )
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
        .alias("e")
    ).select("e.u", "e.v")
    e1 = out.select(F.col("u"), F.col("v").alias("x"))
    e2 = out.select(F.col("u"), F.col("v").alias("y"))
    cand = e1.join(e2, "u").where(F.col("x") < F.col("y")).select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    )
    tri = cand.join(pairs, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    scal = deg.agg(
        F.expr("CAST(COALESCE(sum(d) div 2, 0) AS BIGINT)").alias("n_edges"),
        F.expr("CAST(COALESCE(sum(d * (d - 1) div 2), 0) AS BIGINT)").alias(
            "n_wedges"
        ),
    )
    return scal.crossJoin(tri).select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr(
            "CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000000 * 3 * n_triangles) div n_wedges AS BIGINT) END"
        ).alias("clustering_q6"),
    )


# ---------------------------------------------------------------------------
# session 41 — pipeline hygiene ops: PII scrub stats, train/eval split
# leakage, temperature epoch planning, Adamic-Adar link prediction on the
# LSH graph, and two calendar pipeline aggs (weekday profile, lag-7 diff)
# ---------------------------------------------------------------------------

# RE2 ∩ Java-regex subset only (no backreferences, no lookaround): Spark
# compiles these with java.util.regex, DuckDB with RE2 — a construct outside
# the intersection silently changes semantics on one side.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "number": r"\b[0-9]+\b",
    "url": r"https?://[^\s]+",
}

_PII_SQL = (
    " UNION ALL ".join(
        f"""SELECT '{c}' AS pii_class,
       CAST(count(*) FILTER (WHERE len(regexp_extract_all(text, '{p}')) > 0) AS BIGINT) AS n_docs_hit,
       CAST(COALESCE(sum(len(regexp_extract_all(text, '{p}'))), 0) AS BIGINT) AS n_matches,
       CAST(COALESCE(sum(length(text) - length(regexp_replace(text, '{p}', '', 'g'))), 0) AS BIGINT) AS chars_matched
FROM documents"""
        for c, p in sorted(_PII_PATTERNS.items())
    )
    + " ORDER BY pii_class"
)


@register("pii_scrub_stats", _PII_SQL)
def pii_scrub_stats(spark, sf_dir):
    """PII / structured-token scrub audit: per pattern class (email, ipv4,
    url, bare number), how many docs hit, total matches, and total matched
    characters — the before/after accounting every C4/Dolma-style scrub
    stage reports (the redaction itself is `regexp_replace(text, pat, '')`
    with the same patterns). The sandbox corpus is a clean word soup, so
    all-zero rows here are the CORRECT reading; the property suite and the
    Spark-vs-oracle pytest inject real emails/IPs/URLs to prove the
    counters (same honesty rule as composite_skip_ratio's 0.0).

    Scale shape: entirely map-side — one pass over the text column
    computing all 12 counters as conditional sums in ONE agg, then a
    4-row stack() unpivot (the adjacency_matrix_agg idiom; the oracle
    UNION-ALLs per class, which is fine for DuckDB but would be four
    corpus scans in Spark). No shuffle beyond the 1-row agg combine."""
    d = _docs(spark, sf_dir)
    aggs = []
    for c, p in sorted(_PII_PATTERNS.items()):
        m = F.regexp_extract_all(F.col("text"), F.lit(p), F.lit(0))
        aggs.extend(
            [
                F.sum((F.size(m) > 0).cast("long")).cast("long").alias(f"{c}_h"),
                F.sum(F.size(m)).cast("long").alias(f"{c}_m"),
                F.sum(
                    F.length("text")
                    - F.length(F.regexp_replace(F.col("text"), p, ""))
                )
                .cast("long")
                .alias(f"{c}_c"),
            ]
        )
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}_h, {c}_m, {c}_c" for c in sorted(_PII_PATTERNS)
    )
    return one.select(
        F.expr(
            f"stack({len(_PII_PATTERNS)}, {stack_args}) "
            "as (pii_class, n_docs_hit, n_matches, chars_matched)"
        )
    ).orderBy("pii_class")


_SPLIT_DUCK = (
    "CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))::UBIGINT::BIGINT % 100 < 98 THEN 'train' "
    "WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))::UBIGINT::BIGINT % 100 = 98 THEN 'valid' "
    "ELSE 'test' END"
)
_SPLIT_SPARK = (
    "CASE WHEN cast(conv(substring(md5(cast(doc_id as string)), 5, 4), 16, 10) as bigint) % 100 < 98 THEN 'train' "
    "WHEN cast(conv(substring(md5(cast(doc_id as string)), 5, 4), 16, 10) as bigint) % 100 = 98 THEN 'valid' "
    "ELSE 'test' END"
)


@register(
    "split_leakage_check",
    f"""WITH w AS ({SQL_WORDS}),
g AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
         || ' ' || words[i+4] || ' ' || words[i+5] || ' ' || words[i+6] || ' ' || words[i+7] AS g
  FROM w, unnest(generate_series(1, len(words) - 7)) AS t(i)
  WHERE len(words) >= 8),
sp AS (SELECT doc_id, {_SPLIT_DUCK} AS split FROM documents),
gs AS (SELECT g.doc_id, g.g, sp.split FROM g JOIN sp USING (doc_id)),
tg AS (SELECT DISTINCT g FROM gs WHERE split = 'train'),
ev AS (
  SELECT gs.split, gs.doc_id,
         CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END AS leaked
  FROM gs LEFT JOIN tg USING (g) WHERE gs.split <> 'train'),
d AS (
  SELECT split, doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(leaked) AS BIGINT) AS n_leaked
  FROM ev GROUP BY split, doc_id)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_leaked > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_leaked,
       CAST(sum(n_grams) AS BIGINT) AS n_grams,
       CAST(sum(n_leaked) AS BIGINT) AS n_leaked_grams,
       CASE WHEN sum(n_grams) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * sum(n_leaked)) // sum(n_grams) AS BIGINT)
       END AS leak_q6
FROM d GROUP BY split ORDER BY split""",
)
def split_leakage_check(spark, sf_dir):
    """Train→eval contamination audit INSIDE the pipeline's own split: for
    each held-out split (test/valid, per the train_eval_split md5 5-8
    coordinate), the share of its distinct 8-grams that also occur in any
    TRAIN doc — the leakage number a dedup stage must drive to ~0 before
    the held-out loss means anything. Docs shorter than 8 tokens carry no
    grams and drop out of the denominator on both sides by construction.

    Scale shape: the decontamination_ngram_overlap pattern with the split
    as the eval set — the tiny (~2%) eval gram set is distinct'd and
    semi-joined INTO the train-side gram stream first (map-side filter on
    the huge side once AQE broadcasts the eval set), the surviving
    leaked-gram set is distinct'd small, and the per-doc flag join is
    small ⋈ small. The full train gram table is never distinct'd or
    shuffled whole."""
    w = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words"))
    g = (
        w.where(F.size("words") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-8), i -> "
                    "concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3],"
                    " words[i+4], words[i+5], words[i+6], words[i+7]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    sp = _docs(spark, sf_dir).select("doc_id", F.expr(_SPLIT_SPARK).alias("split"))
    gs = g.join(sp, "doc_id")
    ev = gs.where(F.col("split") != "train")
    evset = ev.select("g").distinct()
    # filter the huge train stream by the small eval set FIRST, then shrink
    leaked = (
        gs.where(F.col("split") == "train")
        .join(evset, "g", "left_semi")
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    d = (
        ev.join(leaked, "g", "left")
        .groupBy("split", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_leaked"),
        )
    )
    return (
        d.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_leaked") > 0).cast("long")).cast("long").alias("n_docs_leaked"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_leaked").cast("long").alias("n_leaked_grams"),
            F.expr(
                "CASE WHEN sum(n_grams) = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((1000000 * sum(n_leaked)) div sum(n_grams) AS BIGINT) END"
            ).alias("leak_q6"),
        )
        .orderBy("split")
    )


_EPOCH_BUDGET = 100_000  # target training tokens for the plan


@register(
    "source_epoch_plan",
    f"""WITH t AS (
  SELECT source,
         CAST(sum(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
w AS (
  SELECT source, n_tokens,
         CAST(round(1000000 * pow(CAST(n_tokens AS DOUBLE), 0.7)) AS BIGINT) AS weight_q6
  FROM t),
tot AS (SELECT CAST(sum(weight_q6) AS DOUBLE) AS total_w FROM w),
p AS (
  SELECT source, n_tokens,
         CASE WHEN total_w = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round({_EPOCH_BUDGET} * weight_q6 / total_w) AS BIGINT)
         END AS target_tokens
  FROM w, tot)
SELECT source, n_tokens, target_tokens,
       CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * target_tokens) // n_tokens AS BIGINT)
       END AS epochs_q6
FROM p ORDER BY source""",
)
def source_epoch_plan(spark, sf_dir):
    """Training-mix epoch plan: given a token budget and the temperature-
    flattened (T=0.7) source weights of temperature_mix_weights, how many
    PASSES over each source the loader must schedule (epochs_q6 > 1e6 =
    the source repeats; ≫1e6 on a small source is the over-epoching alarm
    from the data-constrained-scaling literature). target_tokens uses the
    same one-double-division convention as the share it derives from;
    epochs is an exact integer cross-division of two BIGINTs.

    Scale shape: identical to temperature_mix_weights — a map-side token
    count into |sources| rows, the weight normalization over that tiny
    table via an unpartitioned window (never a crossJoin re-derive), all
    downstream arithmetic row-local."""
    t = _docs(spark, sf_dir).groupBy("source").agg(
        F.sum(F.size(spark_tokens("text"))).cast("long").alias("n_tokens")
    )
    w = t.select(
        "source",
        "n_tokens",
        F.expr(
            "CAST(round(1000000 * pow(CAST(n_tokens AS DOUBLE), 0.7)) AS BIGINT)"
        ).alias("weight_q6"),
    )
    p = w.withColumn(
        "total_w",
        F.sum("weight_q6").over(Window.partitionBy()).cast("double"),
    ).select(
        "source",
        "n_tokens",
        F.expr(
            f"CASE WHEN total_w = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(round({_EPOCH_BUDGET} * weight_q6 / total_w) AS BIGINT) END"
        ).alias("target_tokens"),
    )
    return p.select(
        "source",
        "n_tokens",
        "target_tokens",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000000 * target_tokens) div n_tokens AS BIGINT) END"
        ).alias("epochs_q6"),
    ).orderBy("source")


# per-middle Adamic-Adar weight — q6-rounded per NODE first (libm ln is
# 1-ulp; never sum raw doubles), then exact BIGINT sums per pair
_AA_W = "CAST(round(1000000 / ln(CAST(d AS DOUBLE))) AS BIGINT)"


@register(
    "lsh_common_neighbors",
    _SQL_LSH_PAIRS
    + f""",
ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       UNION ALL SELECT doc_b, doc_a FROM pairs),
deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS d FROM ed GROUP BY src),
wq AS (SELECT v, {_AA_W} AS aaw_q6 FROM deg WHERE d >= 2),
wedge AS (
  SELECT e1.dst AS u, e2.dst AS v, e1.src AS w
  FROM ed e1 JOIN ed e2 ON e1.src = e2.src AND e1.dst < e2.dst),
cn AS (
  SELECT wedge.u, wedge.v, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(wq.aaw_q6) AS BIGINT) AS aa_q6
  FROM wedge JOIN wq ON wedge.w = wq.v GROUP BY wedge.u, wedge.v),
fl AS (
  SELECT cn.u, cn.v, cn.n_common, cn.aa_q6,
         CASE WHEN p.doc_a IS NOT NULL THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS is_edge
  FROM cn LEFT JOIN pairs p ON cn.u = p.doc_a AND cn.v = p.doc_b)
SELECT u, v, n_common, aa_q6, is_edge FROM fl
ORDER BY n_common DESC, aa_q6 DESC, u ASC, v ASC LIMIT 20""",
)
def lsh_common_neighbors(spark, sf_dir):
    """Adamic-Adar link prediction over the LSH candidate graph: for every
    pair at distance 2, the common-neighbor count and the AA score
    Σ 1/ln(deg(w)) over shared neighbors w — the second-order dedup sweep
    (two docs sharing many dup-neighbors are likely dups the banding
    missed; is_edge=0 rows are exactly those missed candidates). Top-20 by
    (common count, AA, ids).

    Determinism: 1/ln(deg) is q6-rounded PER NODE first (the zipf_slope
    ln rule), pair scores are exact BIGINT sums. A wedge middle always
    has degree ≥ 2, so the weight join never drops wedges.

    Scale shape: the wedge self-join fans out Σ deg(w)² rows — intrinsic
    to exact common-neighbor counting; the group key (u, v) spreads the
    shuffle, and a real deployment caps neighbor lists per node before
    the join (top-R by band count), same knob as the ANN rerank band.
    Top-20 is a TakeOrdered, never a global sort. Reuses the memoized
    `_lsh_pair_edges` front half."""
    edges = _lsh_pair_edges(spark, sf_dir)  # symmetric, checkpointed
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    wq = deg.where(F.col("d") >= 2).select(
        F.col("src").alias("w"), F.expr(_AA_W).alias("aaw_q6")
    )
    e1 = edges.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = edges.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedge = e1.join(e2, "w").where(F.col("u") < F.col("v"))
    cn = (
        wedge.join(wq, "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("aaw_q6").cast("long").alias("aa_q6"),
        )
    )
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).alias("e")
    )
    fl = cn.join(pairs, ["u", "v"], "left").select(
        "u",
        "v",
        "n_common",
        "aa_q6",
        F.coalesce(F.col("e"), F.lit(0)).cast("long").alias("is_edge"),
    )
    return fl.orderBy(
        F.desc("n_common"), F.desc("aa_q6"), F.asc("u"), F.asc("v")
    ).limit(20)


@register(
    "events_weekday_profile",
    """WITH d AS (
  SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY dow),
spine AS (SELECT unnest(generate_series(0, 6)) AS dow),
f AS (SELECT spine.dow, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
      FROM spine LEFT JOIN d USING (dow)),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS t FROM f)
SELECT CAST(f.dow AS BIGINT) AS dow, f.n_events,
       CASE WHEN tot.t = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * f.n_events) // tot.t AS BIGINT)
       END AS share_q6
FROM f, tot ORDER BY dow""",
)
def events_weekday_profile(spark, sf_dir):
    """Day-of-week load profile of the event stream (0 = Monday), all 7
    days always present via a spine LEFT JOIN (the lsh_band_config_curve
    rule — an empty weekday must emit a 0 row, not vanish). The weekday
    is pure integer arithmetic on microsecond days (epoch day 0 was a
    Thursday, hence the +3) — never a locale/timezone-dependent dayname()
    that the two engines format differently.

    Scale shape: map-side day math into a ≤7-group agg; the spine join
    and share window run on 7 rows."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr(
                "(unix_micros(cast(ts as timestamp)) div 86400000000 + 3) % 7"
            ).alias("dow")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spine = spark.range(7).select(F.col("id").alias("dow"))
    f = spine.join(d, "dow", "left").select(
        "dow", F.coalesce("n", F.lit(0)).cast("long").alias("n_events")
    )
    return (
        f.withColumn("t", F.sum("n_events").over(Window.partitionBy()))
        .select(
            F.col("dow").cast("long").alias("dow"),
            "n_events",
            F.expr(
                "CASE WHEN t = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((1000000 * n_events) div t AS BIGINT) END"
            ).alias("share_q6"),
        )
        .orderBy("dow")
    )
