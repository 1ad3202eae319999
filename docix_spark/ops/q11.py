"""driver_queries chunk q11 (original lines 38230-41710): discount_tax_hist2d, ann_recall_by_scancost, ab_power_table, part_nation_concentration, ... score_relevance_calibration (46 ops).

Linearized continuation of docix_spark.ops.q10 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q10")

@register(
    "discount_tax_hist2d",
    """SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pp,
       CAST(round(l_tax * 100) AS BIGINT) AS tax_pp,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY discount_pp, tax_pp ORDER BY discount_pp, tax_pp""",
)
def discount_tax_hist2d(spark, sf_dir):
    """Joint census of the two rate columns in integer percent points —
    the 2-D grid that shows whether discount and tax co-vary (they are
    drawn independently in TPC-H, so a product-of-marginals grid is the
    correct sandbox reading; a real ledger shows jurisdiction bands).
    The marginals of THIS table are the inputs every pricing op
    (Q6/Q19's discount windows, the tax audit) filters on — the grid
    says how selective those predicates are jointly.

    Determinism: per-row percent-point rounding (the Q1 cents rule at
    q2), pure integer counts.

    Scale shape: one map-side-combined agg over two narrow columns into
    a ≤|discounts|×|taxes| grid."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("discount_pp"),
        F.expr("CAST(round(l_tax * 100) AS BIGINT)").alias("tax_pp"),
    )
    return (
        li.groupBy("discount_pp", "tax_pp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        .orderBy("discount_pp", "tax_pp")
    )


# ---------------------------------------------------------------------------
# session 149 — recall vs scan cost, A/B power table, supply concentration
# ---------------------------------------------------------------------------


@register(
    "ann_recall_by_scancost",
    _BATCH_SQL
    + """, bexact AS (
  SELECT qid, vec_id FROM (
    SELECT qs.qid, e.vec_id,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             CAST(round(1000000 * list_dot_product(e.v, qs.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) DESC,
             e.vec_id ASC) AS rn
    FROM qs, e WHERE e.vec_id <> 0) WHERE rn <= 10
),
ov AS (
  SELECT qs.qid, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_overlap
  FROM qs LEFT JOIN (
    SELECT b.qid, count(*) AS n
    FROM (SELECT qid, vec_id FROM btop WHERE rnk <= 10) b
    JOIN bexact USING (qid, vec_id)
    GROUP BY b.qid) o USING (qid)
),
cz AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz FROM a3 GROUP BY cid),
qc AS (SELECT bp.qid, CAST(sum(cz.sz) AS BIGINT) AS scanned
       FROM bp JOIN cz USING (cid) GROUP BY bp.qid)
SELECT CAST(length(bin(qc.scanned)) - 1 AS BIGINT) AS scan_bucket,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(ov.n_overlap) AS BIGINT) AS sum_overlap,
       CAST((1000000 * sum(ov.n_overlap)) // (10 * count(*)) AS BIGINT)
         AS recall_q6
FROM qc JOIN ov USING (qid) WHERE qc.scanned > 0
GROUP BY scan_bucket ORDER BY scan_bucket""",
)
def ann_recall_by_scancost(spark, sf_dir):
    """Does scanning more buy more? Per-query recall@10 of the batch IVF
    probe joined to the per-query scanned-vector count, rolled up by
    log2 scan-cost band — the accuracy-for-latency exchange rate
    (ann_scan_cost_histogram shows WHO pays; ann_ivf_batch_recall shows
    per-query accuracy; THIS is their join, the one table an
    nprobe/K-tuning decision actually reads: if the expensive bands
    aren't more accurate, the big cells are pure waste). Composes the
    two memoized halves — probe ranking and exact brute-force — with no
    new corpus-scale work.

    Determinism: exact integer overlaps and cell sizes off the shared
    `_trained_ivf`; recall_q6 = (1e6·Σoverlap) div (10·n).

    Scale shape: per-query tables are batch-sized (|corpus|/37 rows);
    cell sizes broadcast; the brute-force exact leg is the oracle's own
    price, paid once and shared with ann_ivf_batch_recall's plan."""
    _members, cent, final_assign = _trained_ivf(spark, sf_dir)
    recall = ann_ivf_batch_recall(spark, sf_dir)
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cq"), F.asc("cid"))
    bp = (
        qs.crossJoin(F.broadcast(cent))
        .select("qid", "cid", _cosq("cv", "qv", 1_000_000_000).alias("cq"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 3)
        .select("qid", "cid")
    )
    cz = final_assign.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    qc = (
        bp.join(F.broadcast(cz), "cid")
        .groupBy("qid")
        .agg(F.sum("sz").cast("long").alias("scanned"))
    )
    j = qc.where(F.col("scanned") > 0).join(recall, "qid")
    return (
        j.select(
            F.expr("CAST(length(bin(scanned)) - 1 AS BIGINT)").alias(
                "scan_bucket"
            ),
            "n_overlap",
        )
        .groupBy("scan_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum("n_overlap").cast("long").alias("sum_overlap"),
        )
        .select(
            "scan_bucket",
            "n_queries",
            "sum_overlap",
            F.expr(
                "CAST((1000000 * sum_overlap) div (10 * n_queries) AS BIGINT)"
            ).alias("recall_q6"),
        )
        .orderBy("scan_bucket")
    )


# Lehr's rule n ≈ 16·p(1−p)/δ² per arm (80% power, α=0.05 two-sided) —
# ONE shared float expression; δ folds as mde_pp/1e2 (e-notation divisor:
# a plain 100.0 literal is DECIMAL in Spark SQL).
_POWER_N = (
    "CASE WHEN n_views = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ceil(16e0 * (CAST(n_clicks AS DOUBLE) / n_views)"
    " * (1 - CAST(n_clicks AS DOUBLE) / n_views)"
    " / ((mde_pp / 1e2) * (mde_pp / 1e2))) AS BIGINT) END"
)


@register(
    "ab_power_table",
    f"""WITH t AS (
  SELECT CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks
  FROM events),
m AS (SELECT unnest([1, 2, 5, 10]) AS mde_pp)
SELECT CAST(m.mde_pp AS BIGINT) AS mde_pp, t.n_views, t.n_clicks,
       CASE WHEN t.n_views = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * t.n_clicks) // t.n_views AS BIGINT)
       END AS baseline_q6,
       {_POWER_N} AS n_per_arm
FROM t, m ORDER BY mde_pp""",
)
def ab_power_table(spark, sf_dir):
    """Pre-experiment power table: for the CTR baseline this corpus
    actually has (clicks/views), the sample size PER ARM that Lehr's
    rule n = 16·p(1−p)/δ² demands at 80% power / α=0.05, for minimum
    detectable effects of 1/2/5/10 percent points — the 'how long must
    the test run' row every A/B launch review starts with, computed
    from the live baseline instead of a guessed one (ab_srm_check
    validates a running test; this gates whether to start it).

    Determinism: counts are exact; p and the δ² divisor evaluate in ONE
    shared float expression (δ = mde_pp/1e2 — e-notation divisor, the
    DECIMAL-literal rule); ceil(double) agrees across engines.

    Scale shape: one map-side-combined two-counter scan, fanned by a
    4-row literal spine."""
    t = _events(spark, sf_dir).agg(
        F.sum(F.expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_views"),
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_clicks"),
    )
    m = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(5), F.lit(10))).alias(
            "mde_pp"
        )
    )
    return (
        t.crossJoin(F.broadcast(m))
        .select(
            F.col("mde_pp").cast("long").alias("mde_pp"),
            "n_views",
            "n_clicks",
            F.expr(
                "CASE WHEN n_views = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_clicks) div n_views AS BIGINT) END"
            ).alias("baseline_q6"),
            F.expr(_POWER_N).alias("n_per_arm"),
        )
        .orderBy("mde_pp")
    )


@register(
    "part_nation_concentration",
    """WITH j AS (
  SELECT l.l_partkey, s.s_nationkey
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
per AS (
  SELECT l_partkey, CAST(count(DISTINCT s_nationkey) AS BIGINT) AS n_nations,
         CAST(count(*) AS BIGINT) AS n_items
  FROM j GROUP BY l_partkey)
SELECT n_nations, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(n_items) AS BIGINT) AS n_items
FROM per GROUP BY n_nations ORDER BY n_nations""",
)
def part_nation_concentration(spark, sf_dir):
    """Geographic supply concentration: for every part that actually
    ships, how many DISTINCT supplier nations its volume comes from —
    the parts in the n_nations=1 row are the single-country exposure a
    sourcing review flags first (supplier_brand_matrix finds
    single-SUPPLIER lanes; this is the coarser, geopolitical grain;
    brand_supplier_diversity the brand rollup). n_items weights the
    histogram by shipped volume so a one-nation part that barely sells
    doesn't read like a crisis.

    Determinism: pure integer counts.

    Scale shape: fact⋈dim on suppkey (supplier un-hinted; AQE
    broadcasts when it fits); the partkey agg carries a two-phase
    distinct on the small nation domain; the final rollup is ≤25
    rows."""
    j = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .join(
            spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
                "s_suppkey", "s_nationkey"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    per = j.groupBy("l_partkey").agg(
        F.countDistinct("s_nationkey").cast("long").alias("n_nations"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return (
        per.groupBy("n_nations")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("n_items").cast("long").alias("n_items"),
        )
        .orderBy("n_nations")
    )


# ---------------------------------------------------------------------------
# session 150 — surprisal×quality corr, ship-lag trend, priority values
# ---------------------------------------------------------------------------

# the discount_quantity_corr guarded split-sqrt Pearson, verbatim (a
# session-local copy — module constants are never reused across sessions,
# the _ADH_TARGET lesson)
_PQC_CORR = (
    "CASE WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy THEN 0"
    " ELSE CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT) END"
)


@register(
    "ppl_quality_corr",
    f"""WITH tf AS ({SQL_TF}),
tt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(total_tf) AS DOUBLE) AS big_t FROM tt),
nl AS (
  SELECT term,
         CAST(round(-ln(CAST(total_tf AS DOUBLE) / big_t) * 1000000) AS BIGINT) AS nlp_q6
  FROM tt, tot),
d AS (
  SELECT tf.doc_id,
         CAST(CAST(sum(tf.tf * nl.nlp_q6) AS BIGINT)
              // CAST(sum(tf.tf) AS BIGINT) AS BIGINT) AS mean_nlp_q6
  FROM tf JOIN nl USING (term) GROUP BY tf.doc_id),
q AS (
  SELECT doc_id,
         CAST(round(1e6 * count(*) / CAST(sum(tf) AS BIGINT)) AS BIGINT) AS ttr_q6
  FROM tf GROUP BY doc_id),
j AS (
  SELECT d.mean_nlp_q6 // 1000 AS x, q.ttr_q6 // 1000 AS y
  FROM d JOIN q USING (doc_id)),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM j)
SELECT n AS n_docs, CAST({_PQC_CORR} AS BIGINT) AS corr_q6 FROM s""",
)
def ppl_quality_corr(spark, sf_dir):
    """Does the cheap quality score track the LM signal? Pearson
    correlation between each doc's mean unigram surprisal
    (unigram_logprob's corpus-as-its-own-LM per-token −ln p) and its
    type/token ratio (quality_score's distinct_ratio) — the one-number
    answer to 'can we gate on TTR instead of running perplexity', which
    is the cost question behind every CCNet-style filter stack
    (perplexity_buckets shows the surprisal distribution;
    len_quality_hist2d crosses quality with LENGTH; this crosses the
    two FILTER SIGNALS against each other).

    Determinism: both per-doc metrics are the exact integer q6 values
    of their parent ops, FLOORED to q3 before the sufficient stats (the
    embedding_norm_outliers envelope rule: q6 squares would pass 2^63
    by ~1e5 docs; at q3, x ≤ ~3e4 keeps n·x² exact past 1e12 docs);
    the single guarded float expression is the matrix_stats split-sqrt
    form.

    Scale shape: both metric tables fold off the SAME tf aggregation
    (per-(doc,term) counts), so the only corpus-scale exchanges are
    tf's and the vocab-sized LM join; the stats agg collapses map-side
    to one row."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    tt = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("total_tf"))
    tot = tt.agg(F.sum("total_tf").cast("double").alias("big_t"))
    nl = tt.crossJoin(F.broadcast(tot)).select(
        "term",
        F.expr(
            "CAST(round(-ln(CAST(total_tf AS DOUBLE) / big_t) * 1000000) AS BIGINT)"
        ).alias("nlp_q6"),
    )
    d = (
        tf.join(nl, "term")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(CAST(sum(tf * nlp_q6) AS BIGINT)"
                " div CAST(sum(tf) AS BIGINT) AS BIGINT)"
            ).alias("mean_nlp_q6")
        )
    )
    q = tf.groupBy("doc_id").agg(
        F.expr(
            "CAST(round(1e6 * count(*) / CAST(sum(tf) AS BIGINT)) AS BIGINT)"
        ).alias("ttr_q6")
    )
    j = d.join(q, "doc_id").select(
        F.expr("mean_nlp_q6 div 1000").alias("x"),
        F.expr("ttr_q6 div 1000").alias("y"),
    )
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
        F.sum(F.expr("y * y")).cast("long").alias("syy"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.expr(f"CAST({_PQC_CORR} AS BIGINT)").alias("corr_q6"),
    )


@register(
    "ship_lag_by_month",
    f"""WITH j AS (
  SELECT CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT) AS ym,
         epoch_us(l.l_shipdate) // {_US_PER_DAY}
           - epoch_us(o.o_orderdate) // {_US_PER_DAY} AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT ym, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(lag_days) AS BIGINT) AS sum_lag_days,
       CAST((1000000 * sum(lag_days)) // count(*) AS BIGINT) AS mean_lag_q6
FROM j GROUP BY ym ORDER BY ym""",
)
def ship_lag_by_month(spark, sf_dir):
    """Fulfillment-latency TREND: mean order→ship lag per order month —
    the drift detector on operations (ship_lag_histogram is the static
    distribution, ship_lag_by_priority the SLA slice; this is the time
    axis, where a growing backlog actually shows up first). Month key =
    year·100+month (both engines' year()/month() on timestamps agree —
    the orders_month_seasonality convention); lags are exact epoch-day
    differences.

    Determinism: pure integer day arithmetic; the mean is one integer
    division per month row.

    Scale shape: one orderkey-keyed fact join (the engine's hottest
    edge, audited by join_size_estimates); the month agg combines
    map-side into ≤|months| rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        F.expr(f"unix_micros(cast(l_shipdate as timestamp)) div {_US_PER_DAY}").alias(
            "sd"
        ),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)").alias(
            "ym"
        ),
        F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {_US_PER_DAY}").alias(
            "od"
        ),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "ym", (F.col("sd") - F.col("od")).alias("lag_days")
    )
    return (
        j.groupBy("ym")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("lag_days").cast("long").alias("sum_lag_days"),
        )
        .select(
            "ym",
            "n_items",
            "sum_lag_days",
            F.expr(
                "CAST((1000000 * sum_lag_days) div n_items AS BIGINT)"
            ).alias("mean_lag_q6"),
        )
        .orderBy("ym")
    )


@register(
    "priority_value_profile",
    """SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def priority_value_profile(spark, sf_dir):
    """Order value by priority class — do urgent orders carry more
    money, the demand-side sibling of ship_lag_by_priority's SLA audit
    (if URGENT skews small-value, expediting is costing margin on cheap
    orders). Sum/min/max cents per class; means derive as sum/n. Cents
    are rounded per row before every aggregate (the Q1 rule).

    Scale shape: one map-side-combined agg over two narrow columns into
    ≤5 rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("value_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# session 151 — rank_feature query, weekend value t-test, watermark curve
# ---------------------------------------------------------------------------

_RF_PIVOT = 2000  # rank_feature saturation pivot (chars)


@register(
    "rank_feature_search",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
boosted AS (
  SELECT agg.doc_id, agg.score_q6,
         CAST(round(1000000 * (CAST(d.n_chars AS DOUBLE)
              / (d.n_chars + {_RF_PIVOT}))) AS BIGINT) AS sat_q6
  FROM agg JOIN documents d ON d.doc_id = agg.doc_id
  WHERE agg.doc_id <> 0)
SELECT doc_id, score_q6, sat_q6,
       CAST(score_q6 + sat_q6 AS BIGINT) AS final_q6
FROM boosted ORDER BY final_q6 DESC, doc_id ASC LIMIT 10""",
)
def rank_feature_search(spark, sf_dir):
    """ES ``rank_feature`` query (saturation function, pivot 2000):
    final = bm25 + x/(x+pivot) over the numeric feature n_chars — the
    ADDITIVE static-signal boost (pagerank/popularity slots in exactly
    here in a real deployment). Completes the function_score family's
    third combine mode: function_score_decay multiplies by recency,
    field_value_factor multiplies by ln1p(field), rank_feature ADDS a
    bounded saturated term so relevance can never be zeroed out by a
    weak feature — the property ES documents as the reason rank_feature
    exists.

    Determinism: sat_q6 = round(1e6·x/(x+pivot)) per doc FIRST (one
    float division); the final score is an exact integer ADD — no
    product, so no div-vs-floor concern at all.

    Scale shape: match-set ⋈ metadata on doc_id (the J2 shape; match
    set broadcasts at scale); saturation runs map-side in codegen;
    top-10 is a TakeOrdered."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS).where(F.col("doc_id") != 0)
    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    boosted = agg.join(d, "doc_id").select(
        "doc_id",
        "score_q6",
        F.expr(
            f"CAST(round(1000000 * (CAST(n_chars AS DOUBLE)"
            f" / (n_chars + {_RF_PIVOT}))) AS BIGINT)"
        ).alias("sat_q6"),
    )
    return (
        boosted.select(
            "doc_id",
            "score_q6",
            "sat_q6",
            F.expr("CAST(score_q6 + sat_q6 AS BIGINT)").alias("final_q6"),
        )
        .orderBy(F.desc("final_q6"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "weekend_value_ttest",
    f"""WITH t AS (
  SELECT CASE WHEN (epoch_us(ts) // {_US_PER_DAY} + 3) % 7 >= 5 THEN 'we' ELSE 'wd' END AS grp,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'),
s AS (SELECT
  CAST(count(*) FILTER (WHERE grp = 'we') AS BIGINT) AS na,
  CAST(count(*) FILTER (WHERE grp = 'wd') AS BIGINT) AS nb,
  CAST(COALESCE(sum(x) FILTER (WHERE grp = 'we'), 0) AS BIGINT) AS sa,
  CAST(COALESCE(sum(x) FILTER (WHERE grp = 'wd'), 0) AS BIGINT) AS sb,
  CAST(COALESCE(sum(x*x) FILTER (WHERE grp = 'we'), 0) AS BIGINT) AS ssa,
  CAST(COALESCE(sum(x*x) FILTER (WHERE grp = 'wd'), 0) AS BIGINT) AS ssb
  FROM t)
SELECT na, nb, sa, sb, {_TTEST_EXPR} AS t2_q6 FROM s""",
)
def weekend_value_ttest(spark, sf_dir):
    """Is weekend purchase value different from weekday? Welch t² over
    purchase cents, weekend (dow ≥ 5, the (day+3)%7 0=Mon rule) vs
    weekday — the inference companion to weekend_activity_share's
    descriptive contrast (share says the MIX shifts; this says whether
    the SPEND PER PURCHASE shifts, with a significance number).
    `_TTEST_EXPR` verbatim — six exact BIGINT sufficient stats, one
    shared guarded float expression, t² so no sqrt (the session-19
    rules).

    Scale shape: ONE map-side-combined filtered scan to six integers;
    the t² arithmetic is a scalar expression. Exact-double envelope
    < 2^53 holds to ~1e9 purchases of ~1e4 cents²-scale."""
    t = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.expr(
                f"CASE WHEN (unix_micros(cast(ts as timestamp)) div {_US_PER_DAY} + 3) % 7 >= 5"
                " THEN 'we' ELSE 'wd' END"
            ).alias("grp"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
        )
    )
    s = t.agg(
        F.count_if(F.col("grp") == "we").cast("long").alias("na"),
        F.count_if(F.col("grp") == "wd").cast("long").alias("nb"),
        F.coalesce(F.sum(F.when(F.col("grp") == "we", F.col("x"))), F.lit(0))
        .cast("long")
        .alias("sa"),
        F.coalesce(F.sum(F.when(F.col("grp") == "wd", F.col("x"))), F.lit(0))
        .cast("long")
        .alias("sb"),
        F.coalesce(F.sum(F.when(F.col("grp") == "we", F.expr("x*x"))), F.lit(0))
        .cast("long")
        .alias("ssa"),
        F.coalesce(F.sum(F.when(F.col("grp") == "wd", F.expr("x*x"))), F.lit(0))
        .cast("long")
        .alias("ssb"),
    )
    return s.select("na", "nb", "sa", "sb", F.expr(_TTEST_EXPR).alias("t2_q6"))


# watermark delays swept (µs): 0, 1 min, 5 min, 15 min
_WM_DELAYS = [0, 60_000_000, 300_000_000, 900_000_000]
_WM_SHARD = 4096  # event_id-range sub-shard width for the two-pass max


@register(
    "watermark_drop_curve",
    f"""WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
w AS (
  SELECT us,
         max(us) OVER (ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM e),
l AS (
  SELECT CASE WHEN wm IS NULL OR wm <= us THEN 0 ELSE wm - us END AS late_us
  FROM w),
d AS (SELECT unnest([{", ".join(str(x) for x in _WM_DELAYS)}]) AS delay_us)
SELECT CAST(d.delay_us AS BIGINT) AS delay_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN l.late_us > d.delay_us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST((1000000 * sum(CASE WHEN l.late_us > d.delay_us THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS drop_q6
FROM l, d GROUP BY d.delay_us ORDER BY delay_us""",
)
def watermark_drop_curve(spark, sf_dir):
    """THE watermark tuning table: if the stream ran with
    withWatermark(delay) for delay ∈ {0, 1 min, 5 min, 15 min}, what
    fraction of events would arrive behind the watermark and be
    dropped? Lateness of event i = max event-time seen over STRICTLY
    EARLIER arrivals (arrival order = event_id) minus its own
    event-time — event_disorder_histogram profiles per-KEY disorder;
    this is the global-stream number the delay knob is actually set
    against. The sandbox stream is in-order, so an all-zero dropped
    column is CORRECT — the property suite injects disorder to prove
    the counters (the url_domain_census rule).

    Scale shape (Spark): the running max is NOT one global window — it
    is the pack_sequences two-pass form: event_id-range sub-shards
    compute their running max in parallel, a shards-sized table takes
    an exclusive prefix max, and wm = greatest(prior-shard prefix,
    within-shard running max) — byte-identical to the oracle's single
    window at any shard width. The 4-delay fan and the rollup are
    map-side.

    Determinism: pure integer µs arithmetic throughout."""
    e = _events(spark, sf_dir).select(
        "event_id", F.expr("unix_micros(cast(ts as timestamp))").alias("us")
    )
    sh = e.withColumn("sh", F.expr(f"event_id div {_WM_SHARD}"))
    win = Window.partitionBy("sh").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = sh.withColumn("wmin", F.max("us").over(win))
    smax = sh.groupBy("sh").agg(F.max("us").alias("shmax"))
    wsh = Window.orderBy("sh").rowsBetween(Window.unboundedPreceding, -1)
    pmax = smax.select("sh", F.max("shmax").over(wsh).alias("pmax"))
    w = within.join(pmax, "sh").select(
        "us",
        F.expr(
            "CASE WHEN wmin IS NULL AND pmax IS NULL THEN NULL"
            " WHEN wmin IS NULL THEN pmax"
            " WHEN pmax IS NULL THEN wmin"
            " ELSE greatest(wmin, pmax) END"
        ).alias("wm"),
    )
    late = w.select(
        F.expr(
            "CASE WHEN wm IS NULL OR wm <= us THEN 0 ELSE wm - us END"
        ).alias("late_us")
    )
    d = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in _WM_DELAYS])).alias("delay_us")
    )
    return (
        late.crossJoin(F.broadcast(d))
        .groupBy("delay_us")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("CASE WHEN late_us > delay_us THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_dropped"),
        )
        .select(
            F.col("delay_us").cast("long").alias("delay_us"),
            "n_events",
            "n_dropped",
            F.expr(
                "CAST((1000000 * n_dropped) div n_events AS BIGINT)"
            ).alias("drop_q6"),
        )
        .orderBy("delay_us")
    )


# ---------------------------------------------------------------------------
# session 152 — phrase cost card, encoding advisor, term-length×df profile
# ---------------------------------------------------------------------------


@register(
    "phrase_cost_estimate",
    f"""WITH {_SQL_POS},
t1 AS (SELECT doc_id, i FROM p WHERE term = 'spark'),
t2 AS (SELECT doc_id, i FROM p WHERE term = 'hash'),
d1 AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS df1,
              CAST(count(*) AS BIGINT) AS pos1 FROM t1),
d2 AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS df2,
              CAST(count(*) AS BIGINT) AS pos2 FROM t2),
bothd AS (SELECT doc_id FROM (SELECT DISTINCT doc_id FROM t1) a
         JOIN (SELECT DISTINCT doc_id FROM t2) b USING (doc_id)),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_both FROM bothd),
scan AS (SELECT CAST(count(*) AS BIGINT) AS pos_scanned FROM (
  SELECT t1.i FROM t1 JOIN bothd USING (doc_id)
  UNION ALL SELECT t2.i FROM t2 JOIN bothd USING (doc_id))),
pm AS (SELECT CAST(count(*) AS BIGINT) AS n_phrase_occurrences,
              CAST(count(DISTINCT t1.doc_id) AS BIGINT) AS n_phrase_docs
       FROM t1 JOIN t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1)
SELECT df1, pos1, df2, pos2, n_docs_both, pos_scanned,
       n_phrase_docs, n_phrase_occurrences
FROM d1, d2, nb, scan, pm""",
)
def phrase_cost_estimate(spark, sf_dir):
    """Positional-query cost card for the canned phrase "spark hash":
    per-term df and position counts, the doc_id-intersection size, the
    position rows a phrase evaluator actually decodes (both terms'
    positions WITHIN intersecting docs only — the reason phrase queries
    intersect doc_ids BEFORE touching positions), and the true
    phrase-match count. query_cost_estimate prices the OR-scan; this
    prices the positional stage on top — together they are the
    planner's full cost model for F4 (positions_varint_estimate prices
    the same rows in BYTES).

    Determinism: pure integer counts; 0-based posexplode vs 1-based
    SQL positions cancel in the i+1 adjacency (the phrase_slop rule).

    Scale shape: per-term position sets are df-bounded; the adjacency
    join keys on doc_id (a term's positions within one doc bound the
    per-key fan); five scalar legs cross-join as 1-row tables."""
    pos = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(spark_tokens("text")).alias("i", "term")
    )
    t1 = pos.where(F.col("term") == "spark").select("doc_id", "i").localCheckpoint()
    t2 = pos.where(F.col("term") == "hash").select("doc_id", "i").localCheckpoint()
    d1 = t1.agg(
        F.countDistinct("doc_id").cast("long").alias("df1"),
        F.count(F.lit(1)).cast("long").alias("pos1"),
    )
    d2 = t2.agg(
        F.countDistinct("doc_id").cast("long").alias("df2"),
        F.count(F.lit(1)).cast("long").alias("pos2"),
    )
    both = (
        t1.select("doc_id")
        .distinct()
        .join(t2.select("doc_id").distinct(), "doc_id")
        .localCheckpoint()
    )
    nb = both.agg(F.count(F.lit(1)).cast("long").alias("n_docs_both"))
    scan = (
        t1.join(both, "doc_id")
        .select("i")
        .unionAll(t2.join(both, "doc_id").select("i"))
        .agg(F.count(F.lit(1)).cast("long").alias("pos_scanned"))
    )
    a, b = t1.alias("a"), t2.alias("b")
    pm = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id"))
        & (F.col("b.i") == F.col("a.i") + 1),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_phrase_occurrences"),
        F.countDistinct("a.doc_id").cast("long").alias("n_phrase_docs"),
    )
    return (
        d1.crossJoin(d2)
        .crossJoin(nb)
        .crossJoin(scan)
        .crossJoin(pm)
        .select(
            "df1", "pos1", "df2", "pos2", "n_docs_both", "pos_scanned",
            "n_phrase_docs", "n_phrase_occurrences",
        )
    )


def _enc_arm_sql(col: str) -> str:
    return f"""SELECT '{col}' AS col_name, CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS ndv,
       CAST(sum(CAST(length(v) AS BIGINT) * n) AS BIGINT) AS plain_bytes,
       CAST(sum(CAST(length(v) AS BIGINT))
            + (sum(n) * (length(bin(count(*) - 1))) + 7) // 8 AS BIGINT)
         AS dict_bytes
FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY {col})"""


@register(
    "column_encoding_advisor",
    "\nUNION ALL\n".join(_enc_arm_sql(c) for c in ["source", "lang", "text"])
    + "\nORDER BY col_name",
)
def column_encoding_advisor(spark, sf_dir):
    """Parquet-layout advisor for the documents table's string columns:
    per column, row count, NDV, plain-encoding bytes (Σ value lengths —
    codepoint length as the byte proxy) and dictionary-encoding bytes
    (distinct-value bytes + bit-packed codes at ceil(log2 ndv) bits per
    row, the PLAIN_DICTIONARY cost model). Where dict_bytes ≪
    plain_bytes (source, lang) the writer should dictionary-encode;
    text's NDV ≈ n_rows says the opposite — THIS table is why the
    engine's own parquet writes leave text plain and let source/lang
    dictionary-compress (dict_frontcoding_estimate plays the same
    advisor role for the TERM dictionary).

    Determinism: pure integer arithmetic; code bits =
    length(bin(ndv−1)) exactly as the roaring/varint ops count bits.

    Scale shape: one per-value groupBy per column (map-side partials,
    the column's own NDV bounds the agg) then a 1-row rollup; three
    independent arms union."""
    arms = []
    for c in ["source", "lang", "text"]:
        per = (
            _docs(spark, sf_dir)
            .groupBy(F.col(c).alias("v"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        arms.append(
            per.agg(
                F.sum("n").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("ndv"),
                F.sum(F.expr("CAST(length(v) AS BIGINT) * n"))
                .cast("long")
                .alias("plain_bytes"),
                F.sum(F.expr("CAST(length(v) AS BIGINT)"))
                .cast("long")
                .alias("dict_val_bytes"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "ndv",
                "plain_bytes",
                F.expr(
                    "CAST(dict_val_bytes"
                    " + (n_rows * length(bin(ndv - 1)) + 7) div 8 AS BIGINT)"
                ).alias("dict_bytes"),
            )
        )
    return arms[0].unionByName(arms[1]).unionByName(arms[2]).orderBy("col_name")


@register(
    "term_length_df_profile",
    f"""WITH tf AS ({SQL_TF}),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT CAST(length(term) AS BIGINT) AS term_len,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(df) AS BIGINT) AS n_postings,
       CAST((1000000 * sum(df)) // count(*) AS BIGINT) AS mean_df_q6
FROM dfs GROUP BY length(term) ORDER BY term_len""",
)
def term_length_df_profile(spark, sf_dir):
    """Are long tokens rare? Mean document frequency by term LENGTH —
    the joint view token_length_histogram (length mass) and df_spectrum
    (frequency mass) each project away. The knee of this curve is where
    fuzzy matching's prefix_length and the trigram index's selectivity
    assumptions live: short terms are common AND collision-prone, long
    terms are nearly unique — the empirical basis for length-tiered
    query strategies.

    Determinism: exact integer counts, one division per length row.

    Scale shape: df is the standard two-phase agg; the length rollup
    runs on the vocab-sized table into ≤|max term length| rows."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return (
        dfs.groupBy(F.length("term").cast("long").alias("term_len"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("n_postings"),
        )
        .select(
            "term_len",
            "n_terms",
            "n_postings",
            F.expr(
                "CAST((1000000 * n_postings) div n_terms AS BIGINT)"
            ).alias("mean_df_q6"),
        )
        .orderBy("term_len")
    )


# ---------------------------------------------------------------------------
# session 153 — dedup df movers, open-order aging, histogram join estimate
# ---------------------------------------------------------------------------


@register(
    "dedup_df_shift_topk",
    f"""WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
surv AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM h GROUP BY hh),
tf AS ({SQL_TF}),
df_all AS (SELECT term, CAST(count(*) AS BIGINT) AS df_all FROM tf GROUP BY term),
df_s AS (
  SELECT tf.term, CAST(count(*) AS BIGINT) AS df_surv
  FROM tf JOIN surv ON surv.doc_id = tf.doc_id GROUP BY tf.term)
SELECT da.term, da.df_all,
       CAST(COALESCE(ds.df_surv, 0) AS BIGINT) AS df_surv,
       CAST(da.df_all - COALESCE(ds.df_surv, 0) AS BIGINT) AS df_drop
FROM df_all da LEFT JOIN df_s ds ON ds.term = da.term
WHERE da.df_all - COALESCE(ds.df_surv, 0) > 0
ORDER BY df_drop DESC, da.term ASC LIMIT 20""",
)
def dedup_df_shift_topk(spark, sf_dir):
    """How exact dedup reshapes the LANGUAGE MODEL: the terms whose
    document frequency drops most when only the min-doc_id survivor of
    each md5(text) group is kept — boilerplate/template vocabulary
    concentrates in duplicated docs, so THIS list is what dedup
    actually deletes from the index statistics
    (dedup_quality_shift tracks the TTR shift; idf_split_stability
    checks sampling noise; this names the terms whose idf moves for a
    systematic reason). df_drop = 0 terms are excluded — on a dup-free
    corpus the result is correctly empty.

    Determinism: exact integer counts; top-20 ties break on term.

    Scale shape: the survivor set is the md5-groupBy min (dedup_exact's
    shuffle); survivor membership semi-joins into the tf table on
    doc_id; both df aggs are two-phase; top-20 is a TakeOrdered."""
    h = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("hh"))
    surv = h.groupBy("hh").agg(F.min("doc_id").cast("long").alias("doc_id")).select(
        "doc_id"
    )
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df_all = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_all"))
    df_s = (
        tf.join(surv, "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df_surv"))
    )
    return (
        df_all.join(df_s, "term", "left")
        .select(
            "term",
            "df_all",
            F.coalesce("df_surv", F.lit(0)).cast("long").alias("df_surv"),
            (F.col("df_all") - F.coalesce("df_surv", F.lit(0)))
            .cast("long")
            .alias("df_drop"),
        )
        .where(F.col("df_drop") > 0)
        .orderBy(F.desc("df_drop"), F.asc("term"))
        .limit(20)
    )


@register(
    "open_order_age_histogram",
    f"""WITH b AS (
  SELECT CAST(max(epoch_us(o_orderdate)) // {_US_PER_DAY} AS BIGINT) AS maxd
  FROM orders),
a AS (
  SELECT CAST(b.maxd - epoch_us(o.o_orderdate) // {_US_PER_DAY} AS BIGINT) AS age_days,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o, b WHERE o.o_orderstatus = 'O'),
bk AS (
  SELECT CASE WHEN age_days <= 30 THEN 0 WHEN age_days <= 90 THEN 1
              WHEN age_days <= 365 THEN 2 ELSE 3 END AS age_band,
         cents
  FROM a)
SELECT CAST(age_band AS BIGINT) AS age_band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM bk GROUP BY age_band ORDER BY age_band""",
)
def open_order_age_histogram(spark, sf_dir):
    """Backlog aging: OPEN orders (o_orderstatus = 'O') banded by age
    relative to the dataset's last order date (≤month / ≤quarter /
    ≤year / older), with the money stuck in each band — the
    receivables-aging table every operations review opens with
    (open_lineitems_timeseries tracks in-flight ITEMS over time; this
    is the order-header snapshot at end of data, where old-and-open is
    the anomaly). The dataset-max anchor keeps the op deterministic
    with no wall clock in the contract.

    Determinism: epoch-day integers; per-row cents (the Q1 rule).

    Scale shape: the 1-row max-date bounds table broadcasts; the
    status filter pushes into the scan; one ≤4-band map-side agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    b = o.agg(
        F.expr(
            f"CAST(max(unix_micros(cast(o_orderdate as timestamp))) div {_US_PER_DAY} AS BIGINT)"
        ).alias("maxd")
    )
    a = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(b))
        .select(
            F.expr(
                f"CAST(maxd - unix_micros(cast(o_orderdate as timestamp)) div {_US_PER_DAY} AS BIGINT)"
            ).alias("age_days"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    bk = a.select(
        F.expr(
            "CAST(CASE WHEN age_days <= 30 THEN 0 WHEN age_days <= 90 THEN 1"
            " WHEN age_days <= 365 THEN 2 ELSE 3 END AS BIGINT)"
        ).alias("age_band"),
        "cents",
    )
    return (
        bk.groupBy("age_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("age_band")
    )


@register(
    "join_histogram_estimate",
    """WITH b AS (
  SELECT CAST(min(o_orderkey) AS BIGINT) AS mn, CAST(max(o_orderkey) AS BIGINT) AS mx
  FROM orders),
w AS (SELECT mn, CAST((mx - mn) // 16 + 1 AS BIGINT) AS w FROM b),
lb AS (SELECT (l.l_orderkey - w.mn) // w.w AS bkt,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS ndv
       FROM lineitem l, w GROUP BY (l.l_orderkey - w.mn) // w.w),
ob AS (SELECT (o.o_orderkey - w.mn) // w.w AS bkt,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS ndv
       FROM orders o, w GROUP BY (o.o_orderkey - w.mn) // w.w),
hist AS (SELECT CAST(COALESCE(sum((lb.n * ob.n) // greatest(lb.ndv, ob.ndv, 1)), 0)
                AS BIGINT) AS est_hist
         FROM lb JOIN ob USING (bkt)),
tot AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_left,
  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_right,
  (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS ndv_left,
  (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS ndv_right),
act AS (SELECT CAST(COALESCE(sum(a.n * bb.n), 0) AS BIGINT) AS actual_rows
        FROM (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
              FROM lineitem GROUP BY l_orderkey) a
        JOIN (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY o_orderkey) bb ON a.k = bb.k)
SELECT tot.n_left, tot.n_right,
       CAST((tot.n_left * tot.n_right)
            // greatest(tot.ndv_left, tot.ndv_right, 1) AS BIGINT) AS est_single,
       hist.est_hist, act.actual_rows
FROM tot, hist, act""",
)
def join_histogram_estimate(spark, sf_dir):
    """Do histogram statistics beat single-NDV statistics? For the
    lineitem⋈orders edge: the System-R single-NDV estimate, a
    16-bucket equi-width-histogram estimate (per-bucket n·n/max(ndv) —
    what a CBO with column histograms computes), and the exact join
    cardinality. On uniform TPC-H keys the two estimates agree; on
    skewed/partial-range keys the histogram estimate tracks actual
    while single-NDV drifts — the one-table justification for ANALYZE
    with histograms before trusting join reordering
    (join_size_estimates sweeps edges at single-NDV grain; this deepens
    the hottest edge).

    Determinism: per-bucket estimates are integer divisions summed as
    BIGINTs (a float per-bucket sum would be engine-order-dependent);
    bucket width derives from the orders key range. Envelope:
    n_left·n_right < 2^63 holds to ~3e9×3e9 rows; past that the
    estimate arithmetic moves to doubles, documented at
    join_size_estimates.

    Scale shape: bucket aggs combine map-side (≤16 groups); the exact
    leg joins key-cardinality-sized count tables; nothing materializes
    the join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k")
    )
    b = o.agg(
        F.min("k").cast("long").alias("mn"), F.max("k").cast("long").alias("mx")
    )
    w = b.select("mn", F.expr("CAST((mx - mn) div 16 + 1 AS BIGINT)").alias("w"))
    lb = (
        li.crossJoin(F.broadcast(w))
        .groupBy(F.expr("(k - mn) div w").alias("bkt"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("k").cast("long").alias("ndv"),
        )
    )
    ob = (
        o.crossJoin(F.broadcast(w))
        .groupBy(F.expr("(k - mn) div w").alias("bkt"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("k").cast("long").alias("ndv"),
        )
    )
    hist = (
        lb.alias("lb")
        .join(ob.alias("ob"), "bkt")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "(lb.n * ob.n) div greatest(lb.ndv, ob.ndv, 1)"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("est_hist")
        )
    )
    ls = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_left"),
        F.countDistinct("k").cast("long").alias("ndv_left"),
    )
    rs = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_right"),
        F.countDistinct("k").cast("long").alias("ndv_right"),
    )
    la = li.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("nl"))
    ra = o.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("nr"))
    act = la.join(ra, "k").agg(
        F.coalesce(F.sum(F.expr("nl * nr")), F.lit(0))
        .cast("long")
        .alias("actual_rows")
    )
    return (
        ls.crossJoin(rs)
        .crossJoin(hist)
        .crossJoin(act)
        .select(
            "n_left",
            "n_right",
            F.expr(
                "CAST((n_left * n_right)"
                " div greatest(ndv_left, ndv_right, 1) AS BIGINT)"
            ).alias("est_single"),
            "est_hist",
            "actual_rows",
        )
    )


# ---------------------------------------------------------------------------
# session 154 — rule audit, layout pruning estimate, quality-vs-dup ROC
# ---------------------------------------------------------------------------

# (rule_name, violation predicate) — the dbt-tests / expectations shape:
# each rule is a CHECK whose violation count should be 0 on healthy data.
# All-zero on the sandbox is CORRECT; the property suite injects dirty
# rows to prove every counter (the url_domain_census rule).
_EVENT_RULES = [
    ("nonneg_value", "value < 0"),
    ("known_type", "event_type NOT IN ('view','click','purchase','signup','error')"),
    ("props_has_k", "{props_k} IS NULL"),
    ("ts_in_range", "ts < TIMESTAMP '1990-01-01' OR ts >= TIMESTAMP '2100-01-01'"),
    ("nonneg_user", "user_id < 0"),
]


@register(
    "events_rule_audit",
    "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS rule_name, CAST(count(*) AS BIGINT) AS n_checked,
       CAST(sum(CASE WHEN {pred.format(props_k="json_extract_string(props, '$.k')")} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM events"""
        for name, pred in _EVENT_RULES
    )
    + "\nORDER BY rule_name",
)
def events_rule_audit(spark, sf_dir):
    """Declarative data-quality gate over the events table — five CHECK
    rules (non-negative value/user, closed type vocabulary, props
    carries the 'k' key, timestamp sanity window) with per-rule checked
    and violation counts: the dbt-test / expectations report that runs
    BEFORE any analytics trusts the table (fk_integrity_census audits
    cross-table references; nchars_integrity_audit a denormalized
    column; this is the single-table rule engine beside them).
    All-zero violations on the sandbox stream is the correct healthy
    reading — the property suite injects dirty rows to prove each
    counter fires.

    Determinism: pure integer conditional counts; the JSON probe is
    get_json_object/json_extract_string respectively (the
    props_key_census engine-function pairing).

    Scale shape: every rule is a map-side conditional counter; Spark
    folds all five into ONE scan-and-agg then unpivots via stack()
    (the adjacency_matrix_agg rule: per-rule UNION ALL re-scans are
    oracle-only)."""
    aggs = []
    for name, pred in _EVENT_RULES:
        p = pred.format(props_k="get_json_object(props, '$.k')")
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {p} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"v_{name}")
        )
    one = _events(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"), *aggs
    )
    stack_args = ", ".join(
        f"'{name}', v_{name}" for name, _ in _EVENT_RULES
    )
    return (
        one.select(
            "n_checked",
            F.expr(
                f"stack({len(_EVENT_RULES)}, {stack_args})"
                " AS (rule_name, n_violations)"
            ),
        )
        .select("rule_name", "n_checked", F.col("n_violations").cast("long").alias("n_violations"))
        .orderBy("rule_name")
    )


_RG_ROWS = 64  # simulated parquet row-group size (rows)


@register(
    "sort_layout_pruning_estimate",
    f"""WITH d AS (SELECT doc_id, lang FROM documents),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM d),
ga AS (
  SELECT doc_id // {_RG_ROWS} AS grp, lang FROM d),
ta AS (SELECT CAST(count(DISTINCT grp) AS BIGINT) AS touched
       FROM ga WHERE lang = 'en'),
na AS (SELECT CAST(count(DISTINCT grp) AS BIGINT) AS n_groups FROM ga),
pb AS (
  SELECT (row_number() OVER (ORDER BY lang, doc_id) - 1) // {_RG_ROWS} AS grp,
         lang
  FROM d),
tb AS (SELECT CAST(count(DISTINCT grp) AS BIGINT) AS touched
       FROM pb WHERE lang = 'en'),
nb AS (SELECT CAST(count(DISTINCT grp) AS BIGINT) AS n_groups FROM pb)
SELECT 'doc_id_order' AS layout, na.n_groups, ta.touched,
       CAST((1000000 * ta.touched) // na.n_groups AS BIGINT) AS touched_q6
FROM na, ta
UNION ALL
SELECT 'lang_sorted', nb.n_groups, tb.touched,
       CAST((1000000 * tb.touched) // nb.n_groups AS BIGINT)
FROM nb, tb
ORDER BY layout""",
)
def sort_layout_pruning_estimate(spark, sf_dir):
    """File-layout advisor: how many 64-row row-groups a
    `lang = 'en'` scan must touch under the CURRENT doc_id-ordered
    layout versus a lang-sorted rewrite — row-group min/max pruning can
    only skip a group when the predicate's rows cluster, so touched/total
    IS the expected pruning win of re-sorting (the quantified version
    of the guide's 'sort by your filter column'; the engine's own
    doc_id-sorted docs table makes exactly this trade for doc_id
    probes, _write_bucketed's rationale).

    Determinism: dense doc_ids make layout A's groups a pure integer
    division; layout B's groups come from the (lang, doc_id) rank.

    Scale shape (Spark): layout B avoids the oracle's global window via
    the global_row_ids two-pass form — per-lang row_number windows
    (lang is the partition key) offset by an exclusive prefix sum over
    the tiny per-lang counts table; identical output to the oracle's
    single ORDER BY lang, doc_id window."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    n_groups_a = d.select(
        F.expr(f"doc_id div {_RG_ROWS}").alias("grp")
    )
    na = n_groups_a.agg(F.countDistinct("grp").cast("long").alias("n_groups"))
    ta = (
        d.where(F.col("lang") == "en")
        .select(F.expr(f"doc_id div {_RG_ROWS}").alias("grp"))
        .agg(F.countDistinct("grp").cast("long").alias("touched"))
    )
    lc = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wl = Window.orderBy("lang").rowsBetween(Window.unboundedPreceding, -1)
    off = lc.select(
        "lang", F.coalesce(F.sum("cnt").over(wl), F.lit(0)).alias("off")
    )
    wlang = Window.partitionBy("lang").orderBy("doc_id")
    pb = (
        d.withColumn("rn", F.row_number().over(wlang))
        .join(F.broadcast(off), "lang")
        .select(
            "lang",
            F.expr(f"(off + rn - 1) div {_RG_ROWS}").alias("grp"),
        )
    )
    nb = pb.agg(F.countDistinct("grp").cast("long").alias("n_groups"))
    tb = (
        pb.where(F.col("lang") == "en")
        .agg(F.countDistinct("grp").cast("long").alias("touched"))
    )
    ra = na.crossJoin(ta).select(
        F.lit("doc_id_order").alias("layout"),
        "n_groups",
        "touched",
        F.expr("CAST((1000000 * touched) div n_groups AS BIGINT)").alias(
            "touched_q6"
        ),
    )
    rb = nb.crossJoin(tb).select(
        F.lit("lang_sorted").alias("layout"),
        "n_groups",
        "touched",
        F.expr("CAST((1000000 * touched) div n_groups AS BIGINT)").alias(
            "touched_q6"
        ),
    )
    return ra.unionByName(rb).orderBy("layout")


@register(
    "quality_gate_roc",
    f"""WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
dupg AS (SELECT hh FROM h GROUP BY hh HAVING count(*) > 1),
lab0 AS (SELECT h.doc_id,
                CASE WHEN dupg.hh IS NULL THEN 0 ELSE 1 END AS is_dup
         FROM h LEFT JOIN dupg ON dupg.hh = h.hh),
tf AS ({SQL_TF}),
q AS (SELECT doc_id,
             CAST(round(1e6 * count(*) / CAST(sum(tf) AS BIGINT)) AS BIGINT) AS ttr_q6
      FROM tf GROUP BY doc_id),
lab AS (SELECT q.ttr_q6 AS score_q6, lab0.is_dup
        FROM q JOIN lab0 ON lab0.doc_id = q.doc_id),
cells AS (SELECT score_q6,
                 CAST(COALESCE(sum(is_dup), 0) AS BIGINT) AS ca,
                 CAST(COALESCE(sum(1 - is_dup), 0) AS BIGINT) AS cb
          FROM lab GROUP BY score_q6),
cum AS (SELECT score_q6, ca, cb,
               CAST(COALESCE(sum(cb) OVER (ORDER BY score_q6
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cb_before
        FROM cells),
u AS (SELECT CAST(COALESCE(sum(ca * (2 * cb_before + cb)), 0) AS BIGINT) AS u2,
             CAST(COALESCE(sum(ca), 0) AS BIGINT) AS na,
             CAST(COALESCE(sum(cb), 0) AS BIGINT) AS nb
      FROM cum)
SELECT na AS n_dup, nb AS n_uniq,
       CASE WHEN na = 0 OR nb = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (CAST(u2 AS DOUBLE)
                 / (2e0 * na * nb))) AS BIGINT) END AS auc_q6
FROM u""",
)
def quality_gate_roc(spark, sf_dir):
    """Can the cheap quality signal FIND duplicates? ROC AUC of the
    type/token ratio against exact-duplicate membership (docs whose
    md5(text) group has >1 member) — AUC > ½ means low-TTR docs skew
    duplicated, i.e. a TTR gate deletes dup-heavy mass before the
    expensive MinHash pass even runs; AUC ≈ ½ (the sandbox reading,
    where duplicates are verbatim copies of NORMAL docs) says the two
    signals are orthogonal and both passes earn their keep. Reuses
    ranking_auc's exact Mann-Whitney cell machinery with the label
    flipped from relevance to duplication (ppl_quality_corr relates
    the two CONTINUOUS signals; this scores one as a detector for the
    discrete event).

    Determinism: 2U is an exact BIGINT over TTR-cell counts; one
    division.

    Scale shape: the dup label is dedup_exact's md5 groupBy joined
    back on the 32-byte hash; cells bound the window by distinct TTR
    values."""
    h = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("hh"))
    dupg = (
        h.groupBy("hh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("hh")
        .withColumn("flag", F.lit(1))
    )
    lab0 = h.join(dupg, "hh", "left").select(
        "doc_id", F.coalesce("flag", F.lit(0)).alias("is_dup")
    )
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    q = tf.groupBy("doc_id").agg(
        F.expr(
            "CAST(round(1e6 * count(*) / CAST(sum(tf) AS BIGINT)) AS BIGINT)"
        ).alias("score_q6")
    )
    lab = q.join(lab0, "doc_id").select("score_q6", "is_dup")
    cells = lab.groupBy("score_q6").agg(
        F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("ca"),
        F.coalesce(F.sum(F.lit(1) - F.col("is_dup")), F.lit(0))
        .cast("long")
        .alias("cb"),
    )
    wc = Window.orderBy("score_q6").rowsBetween(Window.unboundedPreceding, -1)
    cum = cells.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(wc), F.lit(0)).cast("long").alias("cb_before"),
    )
    u = cum.agg(
        F.coalesce(
            F.sum(F.col("ca") * (2 * F.col("cb_before") + F.col("cb"))), F.lit(0)
        )
        .cast("long")
        .alias("u2"),
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("na"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nb"),
    )
    return u.select(
        F.col("na").alias("n_dup"),
        F.col("nb").alias("n_uniq"),
        F.expr(
            "CASE WHEN na = 0 OR nb = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (CAST(u2 AS DOUBLE)"
            " / (2e0 * na * nb))) AS BIGINT) END"
        ).alias("auc_q6"),
    )


# ---------------------------------------------------------------------------
# session 155 — MMR diversification rerank, nation trade balance
# ---------------------------------------------------------------------------

_MMR_K = 8  # picks
_MMR_CAND = 20  # candidate pool (BM25 top-20, the rescore_topn band)


def _mmr_sql(k: int = _MMR_K) -> str:
    """Unrolled MMR greedy chain (the kcenter/pagerank unroll pattern,
    AS MATERIALIZED everywhere a CTE is referenced twice). Value =
    7·relz − 3·maxcos in exact q6 integers; ties break on doc_id."""
    parts = [
        _bm25_agg_ctes(_TOPK_TERMS),
        """,
top20 AS MATERIALIZED (
  SELECT doc_id, score_q6 FROM agg WHERE doc_id <> 0
  ORDER BY score_q6 DESC, doc_id ASC LIMIT 20),
bnd AS (SELECT min(score_q6) AS mn, max(score_q6) AS mx FROM top20),
ee AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
un AS MATERIALIZED (
  SELECT t.doc_id,
         CASE WHEN bnd.mx = bnd.mn THEN CAST(0 AS BIGINT)
              ELSE CAST(round(1000000 * ((t.score_q6 - bnd.mn)
                   / CAST(bnd.mx - bnd.mn AS DOUBLE))) AS BIGINT) END AS relz,
         list_transform(e2.v, x -> x / e2.n) AS u
  FROM top20 t
  JOIN (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM ee) e2
    ON e2.vec_id = t.doc_id, bnd),
p0 AS MATERIALIZED (SELECT doc_id, relz, u FROM un ORDER BY relz DESC, doc_id ASC LIMIT 1),
m1 AS MATERIALIZED (
  SELECT un.doc_id, un.relz, un.u,
         CAST(round(1000000 * list_dot_product(un.u, c.u)) AS BIGINT) AS mc
  FROM un, (SELECT u FROM p0) c
  WHERE un.doc_id NOT IN (SELECT doc_id FROM p0)),""",
    ]
    for i in range(1, k):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT doc_id, relz, u, mc FROM m{i}"
            f" ORDER BY 7 * relz - 3 * mc DESC, doc_id ASC LIMIT 1),"
        )
        if i < k - 1:
            parts.append(
                f"m{i + 1} AS MATERIALIZED (\n"
                f"  SELECT m.doc_id, m.relz, m.u,\n"
                f"         GREATEST(m.mc, CAST(round(1000000 * list_dot_product(m.u, c.u)) AS BIGINT)) AS mc\n"
                f"  FROM m{i} m, (SELECT u FROM p{i}) c\n"
                f"  WHERE m.doc_id NOT IN (SELECT doc_id FROM p{i})),"
            )
    sels = [
        "SELECT CAST(0 AS BIGINT) AS sel_order, doc_id, relz AS relz_q6,"
        " CAST(0 AS BIGINT) AS maxcos_q6, CAST(7 * relz AS BIGINT) AS mmr_v FROM p0"
    ]
    sels += [
        f"SELECT CAST({i} AS BIGINT), doc_id, relz, mc, CAST(7 * relz - 3 * mc AS BIGINT) FROM p{i}"
        for i in range(1, k)
    ]
    parts.append("sel AS (" + " UNION ALL ".join(sels) + ")")
    parts.append(
        "SELECT sel_order, doc_id, relz_q6, maxcos_q6, mmr_v FROM sel ORDER BY sel_order"
    )
    return "\n".join(parts)


def _mmr_round(v: float) -> int:
    # half-away-from-zero — Python round() is banker's, never use it
    import math as _m

    return int(_m.floor(v + 0.5)) if v >= 0 else -int(_m.floor(-v + 0.5))


@register("mmr_rerank", _mmr_sql())
def mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance (Carbonell-Goldstein 1998) over the
    BM25 top-20: greedily pick 8 results maximizing λ·relevance −
    (1−λ)·max-cosine-to-already-picked (λ=0.7, embeddings as the
    similarity space via the doc_id↔vec_id alignment) — the
    diversification pass every SERP/RAG retriever layers over raw
    relevance so near-duplicate hits don't fill the page
    (serp_source_diversity MEASURES the diversity cost; this is the
    operator that FIXES it; kcenter_coreset is the λ=0 corner of the
    same greedy form).

    Determinism: relevance min-max-normalizes over the candidate pool
    and rounds to q6 FIRST; per-pair cosines round to q6; the greedy
    value 7·relz − 3·maxcos is exact integer with the doc_id
    tiebreak, so both engines select identical docs in identical
    order. First pick's empty-set similarity is 0 by the standard MMR
    convention.

    Scale shape: the distributed work is the memoized BM25 match set
    + a 20-row embedding fetch; the greedy loop runs driver-side on
    EXACTLY the collected 20-row band (the ltr_features bounded-
    collect budget — candidates are page-sized by construction, never
    corpus-sized). The oracle unrolls the same loop as a MATERIALIZED
    CTE chain."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS).where(F.col("doc_id") != 0)
    top = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(_MMR_CAND)
    e = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    rows = (
        top.join(e, "doc_id")
        .select("doc_id", "score_q6", "embedding")
        .collect()
    )
    cand = []
    for r in rows:
        v = [float(x) for x in r.embedding]
        s = 0.0
        for x in v:
            s += x * x
        n = s ** 0.5
        cand.append((r.doc_id, r.score_q6, [x / n for x in v]))
    cand.sort(key=lambda t: (-t[1], t[0]))
    if not cand:
        return spark.createDataFrame(
            [],
            "sel_order long, doc_id long, relz_q6 long, maxcos_q6 long, mmr_v long",
        )
    mn = min(s for _, s, _ in cand)
    mx = max(s for _, s, _ in cand)
    rel = {
        d: (0 if mx == mn else _mmr_round(1000000 * ((s - mn) / float(mx - mn))))
        for d, s, _ in cand
    }
    uvec = {d: u for d, _, u in cand}

    def cosq(a, b):
        s = 0.0
        for x, y in zip(uvec[a], uvec[b]):
            s += x * y
        return _mmr_round(1000000 * s)

    first = max(cand, key=lambda t: (rel[t[0]], -t[0]))[0]
    out = [(0, first, rel[first], 0, 7 * rel[first])]
    remaining = [d for d, _, _ in cand if d != first]
    mc = {d: cosq(d, first) for d in remaining}
    for i in range(1, min(_MMR_K, len(cand))):
        pick = max(remaining, key=lambda d: (7 * rel[d] - 3 * mc[d], -d))
        out.append((i, pick, rel[pick], mc[pick], 7 * rel[pick] - 3 * mc[pick]))
        remaining.remove(pick)
        for d in remaining:
            c = cosq(d, pick)
            if c > mc[d]:
                mc[d] = c
    return spark.createDataFrame(
        out, "sel_order long, doc_id long, relz_q6 long, maxcos_q6 long, mmr_v long"
    ).orderBy("sel_order")


@register(
    "nation_trade_balance",
    f"""WITH exp AS (
  SELECT s.s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_exp_items,
         CAST(sum({_LI_DISC_C}) AS BIGINT) AS export_c
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey),
imp AS (
  SELECT c.c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_imp_orders,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS import_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey)
SELECT n.n_name,
       CAST(COALESCE(exp.n_exp_items, 0) AS BIGINT) AS n_exp_items,
       CAST(COALESCE(exp.export_c, 0) AS BIGINT) AS export_c,
       CAST(COALESCE(imp.n_imp_orders, 0) AS BIGINT) AS n_imp_orders,
       CAST(COALESCE(imp.import_c, 0) AS BIGINT) AS import_c,
       CAST(COALESCE(exp.export_c, 0) - COALESCE(imp.import_c, 0) AS BIGINT) AS net_c
FROM nation n
LEFT JOIN exp ON exp.nk = n.n_nationkey
LEFT JOIN imp ON imp.nk = n.n_nationkey
ORDER BY n.n_name""",
)
def nation_trade_balance(spark, sf_dir):
    """Per-nation trade balance: supply-side revenue (discounted
    lineitem value attributed to the SUPPLIER's nation) against
    demand-side spend (order totals attributed to the CUSTOMER's
    nation), net in cents — the one-table macro view local_trade_share
    compresses to a single number and region_supply_volume /
    orders_nation_revenue each show one side of. Zero-filled on the
    nation spine (the nation_account_balances rule) so inactive
    nations report. The two legs use their native money rules
    (lineitem discounted cents vs order-header cents — header≈Σlines·tax
    per order_total_consistency), declared, not mixed.

    Scale shape: each leg is a fact⋈dim join collapsing map-side to
    ≤25 rows; the 25-row nation spine broadcasts into both LEFT
    joins; no window."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey", F.expr(_LI_DISC_C).alias("disc_c"))
        .join(
            spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
                "s_suppkey", "s_nationkey"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exp_items"),
            F.sum("disc_c").cast("long").alias("export_c"),
        )
    )
    om = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"))
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_imp_orders"),
            F.sum("cents").cast("long").alias("import_c"),
        )
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return (
        F.broadcast(n)
        .join(li, n["n_nationkey"] == li["nk"], "left")
        .join(om, n["n_nationkey"] == om["nk"], "left")
        .select(
            "n_name",
            F.coalesce("n_exp_items", F.lit(0)).cast("long").alias("n_exp_items"),
            F.coalesce("export_c", F.lit(0)).cast("long").alias("export_c"),
            F.coalesce("n_imp_orders", F.lit(0)).cast("long").alias("n_imp_orders"),
            F.coalesce("import_c", F.lit(0)).cast("long").alias("import_c"),
            (
                F.coalesce("export_c", F.lit(0)) - F.coalesce("import_c", F.lit(0))
            )
            .cast("long")
            .alias("net_c"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# session 156 — Hurst estimate, duplicate-charge census, placeholder docs
# ---------------------------------------------------------------------------

# ln m folded to q6 integers in Python (the _HLL_C rule) for m = 1,2,4,8
_HURST_LNM = {1: 0, 2: 693_147, 4: 1_386_294, 8: 2_079_442}
# slope of y_q6 over x_q6 via the centered form; hurst = slope/2 (block-SUM
# variance scales ~ m^2H). One shared float expression over exact integers.
_HURST_EXPR = (
    "CASE WHEN n_fit < 4 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(500000 * (CAST(n_fit AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n_fit AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT) END"
)


@register(
    "daily_hurst_estimate",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num - b.lo AS k, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num), b),
ms AS (SELECT unnest([1, 2, 4, 8]) AS m),
blk AS (SELECT ms.m, f.k // ms.m AS blkid, CAST(sum(f.n) AS BIGINT) AS s
        FROM f, ms GROUP BY ms.m, f.k // ms.m),
vr AS (SELECT m, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(s) AS BIGINT) AS syc, CAST(sum(s * s) AS BIGINT) AS syy
       FROM blk GROUP BY m),
vv AS (SELECT m, n AS n_blocks, {_SEG_VAR} AS var_q6 FROM vr),
pts AS (SELECT m,
               CAST(CASE m WHEN 1 THEN 0 WHEN 2 THEN 693147 WHEN 4 THEN 1386294
                      ELSE 2079442 END AS BIGINT) AS x_q6,
               CASE WHEN var_q6 > 0
                    THEN CAST(round(1000000 * ln(var_q6 / 1e6)) AS BIGINT)
               END AS y_q6,
               n_blocks, var_q6
        FROM vv),
fit AS (SELECT CAST(count(y_q6) AS BIGINT) AS n_fit,
               CAST(COALESCE(sum(x_q6) FILTER (WHERE y_q6 IS NOT NULL), 0) AS BIGINT) AS sx,
               CAST(COALESCE(sum(y_q6), 0) AS BIGINT) AS sy,
               CAST(COALESCE(sum(x_q6 * x_q6) FILTER (WHERE y_q6 IS NOT NULL), 0) AS BIGINT) AS sxx,
               CAST(COALESCE(sum(x_q6 * y_q6), 0) AS BIGINT) AS sxy
        FROM pts)
SELECT CAST(pts.m AS BIGINT) AS m, pts.n_blocks, pts.var_q6,
       {_HURST_EXPR} AS hurst_q6
FROM pts, fit ORDER BY m""",
)
def daily_hurst_estimate(spark, sf_dir):
    """Long-range dependence of the daily event stream: the
    variance-time plot (variance of m-day block SUMS for m = 1/2/4/8,
    which scales ~ m^2H) and the Hurst exponent from its log-log slope
    — the diagnostic that separates a short-memory series (H ≈ ½,
    yesterday tells you nothing beyond the mean) from a trending/
    self-similar one (H → 1, load forecasting and capacity buffers must
    widen). daily_count_autocorr's replacement events_autocorrelation
    reads fixed lags; Hurst reads ALL scales at once — the two
    disagree exactly when bursts nest (the LRD signature).

    Determinism: block sums are exact integers; per-m variance is the
    `_SEG_VAR` float-mean form; ln m is Python-folded to q6 constants;
    y = ln(var) is q6-rounded PER POINT before the 4-point integer
    OLS sums; the slope/2 is ONE guarded shared expression (0 sentinel
    unless all four scales have positive variance).

    Scale shape: one day-keyed corpus agg; everything after runs on
    the calendar-bounded spine fanned by a 4-row scale spine."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
                "day_num"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(
        F.explode(F.sequence("lo", "hi")).alias("day_num"), "lo"
    )
    f = spine.join(d, "day_num", "left").select(
        (F.col("day_num") - F.col("lo")).alias("k"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )
    ms = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8))).alias("m")
    )
    blk = (
        f.crossJoin(F.broadcast(ms))
        .groupBy("m", F.expr("k div m").alias("blkid"))
        .agg(F.sum("n").cast("long").alias("s"))
    )
    vr = blk.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("syc"),
        F.sum(F.expr("s * s")).cast("long").alias("syy"),
    )
    vv = vr.select("m", F.col("n").alias("n_blocks"), F.expr(_SEG_VAR).alias("var_q6"))
    pts = vv.select(
        "m",
        F.expr(
            "CAST(CASE m WHEN 1 THEN 0 WHEN 2 THEN 693147 WHEN 4 THEN 1386294"
            " ELSE 2079442 END AS BIGINT)"
        ).alias("x_q6"),
        F.expr(
            "CASE WHEN var_q6 > 0"
            " THEN CAST(round(1000000 * ln(var_q6 / 1e6)) AS BIGINT) END"
        ).alias("y_q6"),
        "n_blocks",
        "var_q6",
    ).localCheckpoint()
    fit = pts.agg(
        F.count("y_q6").cast("long").alias("n_fit"),
        F.coalesce(
            F.sum(F.when(F.col("y_q6").isNotNull(), F.col("x_q6"))), F.lit(0)
        )
        .cast("long")
        .alias("sx"),
        F.coalesce(F.sum("y_q6"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(
            F.sum(F.when(F.col("y_q6").isNotNull(), F.expr("x_q6 * x_q6"))),
            F.lit(0),
        )
        .cast("long")
        .alias("sxx"),
        F.coalesce(F.sum(F.expr("x_q6 * y_q6")), F.lit(0))
        .cast("long")
        .alias("sxy"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("m").cast("long").alias("m"),
            "n_blocks",
            "var_q6",
            F.expr(_HURST_EXPR).alias("hurst_q6"),
        )
        .orderBy("m")
    )


_DUPQ_GAP_US = 600_000_000  # 10 minutes


@register(
    "duplicate_charge_census",
    f"""WITH p AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS us, event_id
  FROM events WHERE event_type = 'purchase'),
lg AS (
  SELECT cents,
         us - lag(us) OVER (PARTITION BY user_id, cents ORDER BY us, event_id)
           AS gap_us
  FROM p)
SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchases,
       CAST(COALESCE(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= {_DUPQ_GAP_US}
                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_suspect,
       CAST(COALESCE(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= {_DUPQ_GAP_US}
                THEN cents ELSE 0 END), 0) AS BIGINT) AS suspect_cents
FROM lg""",
)
def duplicate_charge_census(spark, sf_dir):
    """Double-charge detector: purchases by the SAME user for the SAME
    cent amount within 10 minutes of the previous one — the classic
    payments-ops audit (retry storms, double-submit bugs), counted with
    the money at risk. Each repeat links only to its immediate
    predecessor in the (user, amount) stream, so a burst of k
    identical charges reports k−1 suspects, not C(k,2).
    Zero on the sandbox stream is the healthy reading — the property
    suite injects double-charges to prove the counters.

    Determinism: integer µs gaps; equal-timestamp purchases order by
    event_id inside the lag (the interevent rule).

    Scale shape: ONE (user_id, cents)-partitioned lag window — the
    same key family as sessionization; counters fold map-side."""
    p = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
            "event_id",
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("user_id", "cents").orderBy("us", "event_id")
    lg = p.select(
        "cents", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    )
    tot = p.agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
    sus = lg.agg(
        F.coalesce(
            F.sum(
                F.expr(
                    f"CASE WHEN gap_us IS NOT NULL AND gap_us <= {_DUPQ_GAP_US}"
                    " THEN 1 ELSE 0 END"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_suspect"),
        F.coalesce(
            F.sum(
                F.expr(
                    f"CASE WHEN gap_us IS NOT NULL AND gap_us <= {_DUPQ_GAP_US}"
                    " THEN cents ELSE 0 END"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("suspect_cents"),
    )
    return tot.crossJoin(sus).select("n_purchases", "n_suspect", "suspect_cents")


# placeholder classes: empty/whitespace, literal null-ish markers, and
# single-repeated-token bodies — matched on the trimmed lowercased text
_PLACEHOLDER_NULLISH = "('null', 'none', 'n/a', 'na', 'nan', '-', 'missing')"


@register(
    "placeholder_doc_census",
    f"""WITH t AS (SELECT lower(trim(text)) AS t FROM documents),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN t = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
         CAST(sum(CASE WHEN t IN {_PLACEHOLDER_NULLISH} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_nullish,
         CAST(sum(CASE WHEN t <> '' AND t NOT IN {_PLACEHOLDER_NULLISH}
                        AND NOT regexp_matches(t, '[ ]')
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_single_token
  FROM t)
SELECT n_docs, n_empty, n_nullish, n_single_token FROM c""",
)
def placeholder_doc_census(spark, sf_dir):
    """Null-like document census: empty/whitespace-only bodies, literal
    null markers ('null', 'n/a', …), and single-token bodies — the
    extraction-failure fingerprints that slip through length filters
    as 'short docs' but are really ABSENT documents (leading_token_census
    finds shared boilerplate HEADS; this finds bodies that are nothing
    but placeholder). All-zero-ish on the synthetic corpus is expected
    — the property suite injects each class.

    Determinism: exact conditional counts on lower(trim(text)); the
    single-token test is 'contains no space' on the trimmed body
    (regexp_matches/rlike respectively — a literal-class regex).

    Scale shape: three map-side counters in ONE scan-and-agg."""
    t = _docs(spark, sf_dir).select(F.lower(F.trim("text")).alias("t"))
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.expr("CASE WHEN t = '' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_empty"),
        F.sum(F.expr(f"CASE WHEN t IN {_PLACEHOLDER_NULLISH} THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_nullish"),
        F.sum(
            F.expr(
                f"CASE WHEN t <> '' AND t NOT IN {_PLACEHOLDER_NULLISH}"
                " AND NOT t RLIKE '[ ]' THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_single_token"),
    )


# ---------------------------------------------------------------------------
# session 157 — load-error correlation, salting advisor, wildcard selectivity
# ---------------------------------------------------------------------------


@register(
    "load_error_corr",
    f"""WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_num,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e
  FROM events GROUP BY hour_num),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(h.n) AS BIGINT) AS sx, CAST(sum(h.e) AS BIGINT) AS sy,
             CAST(sum(h.n * h.n) AS BIGINT) AS sxx,
             CAST(sum(h.e * h.e) AS BIGINT) AS syy,
             CAST(sum(h.n * h.e) AS BIGINT) AS sxy
      FROM h)
SELECT n AS n_hours, sx AS n_events, sy AS n_errors,
       CAST({_PQC_CORR} AS BIGINT) AS corr_q6
FROM s""",
)
def load_error_corr(spark, sf_dir):
    """Do we fail under load? Pearson correlation between hourly event
    volume and hourly ERROR count over observed epoch hours —
    corr ≈ volume-proportional errors (a constant error RATE, the
    benign reading); corr pushing past the rate line says errors
    super-scale with load, the capacity-cliff signature
    (error_rate_daily shows WHEN; this one number says whether load is
    the cause). Observed hours only — an empty hour has no error
    observations to correlate.

    Determinism: exact BIGINT sufficient stats over hour cells, the
    shared guarded split-sqrt expression (`_PQC_CORR`). Envelope:
    hours·max_hourly² < 2^63 — safe to ~1e6 events/hour over a
    century.

    Scale shape: one hour-keyed map-side-combined agg (both counters
    in one pass), then a calendar-bounded stats fold to one row."""
    h = _events(spark, sf_dir).groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias(
            "hour_num"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("e"),
    )
    s = h.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n").cast("long").alias("sx"),
        F.sum("e").cast("long").alias("sy"),
        F.sum(F.expr("n * n")).cast("long").alias("sxx"),
        F.sum(F.expr("e * e")).cast("long").alias("syy"),
        F.sum(F.expr("n * e")).cast("long").alias("sxy"),
    )
    return s.select(
        F.col("n").alias("n_hours"),
        F.col("sx").alias("n_events"),
        F.col("sy").alias("n_errors"),
        F.expr(f"CAST({_PQC_CORR} AS BIGINT)").alias("corr_q6"),
    )


_SALT_REDUCERS = 32  # target parallelism the salting plan budgets against


@register(
    "salting_plan_advisor",
    f"""WITH k AS (
  SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_orderkey),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM k),
top AS (SELECT key, n_rows FROM k ORDER BY n_rows DESC, key ASC LIMIT 5)
SELECT top.key, top.n_rows,
       CAST((1000000 * top.n_rows) // t.total AS BIGINT) AS share_q6,
       CAST(CASE WHEN top.n_rows * {_SALT_REDUCERS} <= t.total THEN 1
            ELSE (top.n_rows * {_SALT_REDUCERS} + t.total - 1) // t.total
            END AS BIGINT) AS salt_factor
FROM top, t ORDER BY top.n_rows DESC, top.key ASC""",
)
def salting_plan_advisor(spark, sf_dir):
    """Key-salting prescription for the hottest lineitem join keys: for
    the top-5 orderkeys by row count, the share of the table they carry
    and the salt factor that brings each under a 1/32
    reducer budget — salt_factor = ⌈n_rows / (total/32)⌉
    as the exact integer ⌈n·R/total⌉ (the session-53 ceil rule:
    (x+d−1) div d, never the negate trick). fact_key_skew_census
    DETECTS skew; this emits the knob value the salted-join rewrite
    (and the AQE skew threshold) should use: factor 1 = no salting
    needed, the uniform-TPC-H reading.

    Determinism: pure integer arithmetic.

    Scale shape: one key-count agg (map-side partials), a 1-row total,
    a top-5 TakeOrdered; the plan never touches unaggregated rows
    twice."""
    k = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_orderkey").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .localCheckpoint()
    )
    t = k.agg(F.sum("n_rows").cast("long").alias("total"))
    top = k.orderBy(F.desc("n_rows"), F.asc("key")).limit(5)
    return (
        top.crossJoin(F.broadcast(t))
        .select(
            "key",
            "n_rows",
            F.expr("CAST((1000000 * n_rows) div total AS BIGINT)").alias(
                "share_q6"
            ),
            F.expr(
                f"CAST(CASE WHEN n_rows * {_SALT_REDUCERS} <= total THEN 1"
                f" ELSE (n_rows * {_SALT_REDUCERS} + total - 1) div total"
                " END AS BIGINT)"
            ).alias("salt_factor"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
    )


# canned wildcard patterns: leading-anchored (trigram-friendly),
# trailing-anchored, and infix (the expensive shape)
_WC_PATTERNS = [("spa%", "spa%"), ("%ark", "%ark"), ("%par%", "%par%")]


@register(
    "wildcard_selectivity_estimate",
    f"""WITH tf AS ({SQL_TF}),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
pat AS (SELECT * FROM (VALUES {", ".join(f"('{p}')" for p, _ in _WC_PATTERNS)}) AS v(pattern)),
m AS (SELECT pat.pattern, dfs.term, dfs.df
      FROM pat LEFT JOIN dfs ON dfs.term LIKE pat.pattern)
SELECT pattern,
       CAST(count(term) AS BIGINT) AS n_terms,
       CAST(COALESCE(sum(df), 0) AS BIGINT) AS sum_df
FROM m GROUP BY pattern ORDER BY pattern""",
)
def wildcard_selectivity_estimate(spark, sf_dir):
    """Wildcard-query cost card: for a leading-anchored, a
    trailing-anchored, and an infix pattern, how many dictionary terms
    expand and how many postings the OR over them would read — the
    selectivity table behind the trigram gate (index/ngram.py): a
    pattern expanding to few terms rides the normal postings path; one
    matching half the dictionary is why wildcard_substr verifies
    trigram candidates instead of expanding (query_cost_estimate is
    the same card for term queries; this is the wildcard column).
    Zero-match patterns emit 0-rows-read via the LEFT probe (the
    stopword_cut count(term)-not-count(*) rule).

    Determinism: exact integer counts; LIKE semantics agree across
    engines for %-only patterns.

    Scale shape: the pattern spine is 3 broadcast rows against the
    vocab-sized dictionary — the scan cost is the dictionary, never
    postings."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    pat = spark.createDataFrame(
        [(p,) for p, _ in _WC_PATTERNS], "pattern string"
    )
    m = F.broadcast(pat).join(
        dfs, F.expr("term LIKE pattern"), "left"
    )
    return (
        m.groupBy("pattern")
        .agg(
            F.count("term").cast("long").alias("n_terms"),
            F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("sum_df"),
        )
        .orderBy("pattern")
    )


# ---------------------------------------------------------------------------
# session 158 — mutual 1-NN pairs, resurrected users, source-lang MI
# ---------------------------------------------------------------------------


@register(
    "ann_mutual_knn",
    _KMEANS_SQL_PRELUDE
    + """,
un AS (
  SELECT vec_id, list_transform(v, x -> x / n) AS u
  FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e WHERE vec_id <> 0)
),
mem AS (SELECT a3.vec_id, a3.cid, un.u FROM a3 JOIN un USING (vec_id)),
pr AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(round(1000000 * list_dot_product(a.u, b.u)) AS BIGINT) AS cos_q6
  FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id <> b.vec_id),
t1 AS (
  SELECT id_a, id_b, cos_q6 FROM (
    SELECT id_a, id_b, cos_q6,
           row_number() OVER (PARTITION BY id_a ORDER BY cos_q6 DESC, id_b ASC) AS rn
    FROM pr) WHERE rn = 1)
SELECT x.id_a, x.id_b, x.cos_q6
FROM t1 x JOIN t1 y ON y.id_a = x.id_b AND y.id_b = x.id_a AND x.id_a < x.id_b
ORDER BY x.cos_q6 DESC, x.id_a ASC LIMIT 10""",
)
def ann_mutual_knn(spark, sf_dir):
    """Reciprocal nearest neighbors over the memoized IVF cells: pairs
    where each vector is the OTHER's in-cell top-1 — the
    mutual-1-NN matching primitive (margin-based bitext mining, RNN-DBSCAN,
    and the highest-precision near-dup signal there is: a one-sided
    top-1 can be a hub artifact, a RECIPROCAL one almost never is —
    ann_hub_census measures that asymmetry; this extracts the pairs
    that survive it). Top-10 by cosine.

    Determinism: the shared normalize-once/one-dot rule; top-1 picks
    and the final cut order by q6 cosine with vec_id tiebreaks, so
    both engines select identical pairs.

    Scale shape: directed pairs derive from the memoized
    `_incell_pair_cos` table (cosine is IEEE-symmetric, so the swapped
    union is byte-identical to the ordered join it replaced); the top-1
    window partitions by vec_id over in-cell rows; mutuality is a
    self-join of the |vectors|-sized top-1 table on the reversed key."""
    up = _incell_pair_cos(spark, sf_dir).select(
        "id_a", "id_b", F.col("cosn_q6").alias("cos_q6")
    )
    pr = up.unionByName(
        up.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            F.col("cos_q6"),
        )
    )
    w1 = Window.partitionBy("id_a").orderBy(F.desc("cos_q6"), F.asc("id_b"))
    t1 = (
        pr.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select("id_a", "id_b", "cos_q6")
        .localCheckpoint()
    )
    x, y = t1.alias("x"), t1.alias("y")
    return (
        x.join(
            y,
            (F.col("y.id_a") == F.col("x.id_b"))
            & (F.col("y.id_b") == F.col("x.id_a"))
            & (F.col("x.id_a") < F.col("x.id_b")),
        )
        .select(
            F.col("x.id_a").alias("id_a"),
            F.col("x.id_b").alias("id_b"),
            F.col("x.cos_q6").alias("cos_q6"),
        )
        .orderBy(F.desc("cos_q6"), F.asc("id_a"))
        .limit(10)
    )


_RESURRECT_GAP_DAYS = 28


@register(
    "resurrected_users_monthly",
    f"""WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num FROM events),
lg AS (
  SELECT user_id, day_num,
         day_num - lag(day_num) OVER (PARTITION BY user_id ORDER BY day_num)
           AS gap_days
  FROM ud),
dd AS (
  SELECT user_id, gap_days,
         CAST(year(DATE '1970-01-01' + CAST(day_num AS INT)) * 100
              + month(DATE '1970-01-01' + CAST(day_num AS INT)) AS BIGINT) AS ym
  FROM lg),
act AS (SELECT ym, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        FROM dd GROUP BY ym),
res AS (SELECT ym, CAST(count(DISTINCT user_id) AS BIGINT) AS n_resurrected
        FROM dd WHERE gap_days > {_RESURRECT_GAP_DAYS} GROUP BY ym)
SELECT act.ym, act.n_active,
       CAST(COALESCE(res.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST((1000000 * COALESCE(res.n_resurrected, 0)) // act.n_active AS BIGINT)
         AS resurrected_q6
FROM act LEFT JOIN res ON res.ym = act.ym ORDER BY act.ym""",
)
def resurrected_users_monthly(spark, sf_dir):
    """Resurrection series: per month, active users and the share whose
    return that month followed a >28-day silence —
    the third growth-accounting bucket (new_returning_daily splits
    new vs returning; a RESURRECTED user is returning-but-churned, the
    win-back signal a plain returning count hides; events_retention
    tracks the same gap from the other side as decay). Month key =
    calendar month of the activity day.

    Determinism: distinct user-days, integer day gaps from one
    user-partitioned lag, calendar month via epoch-day date
    arithmetic (identical in both engines).

    Scale shape: ONE distinct (user, day) exchange feeds the lag
    window (user-keyed — the sessionizer's shuffle) and both monthly
    rollups; months-sized output."""
    ud = (
        _events(spark, sf_dir)
        .select(
            "user_id",
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
                "day_num"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    lg = ud.select(
        "user_id",
        "day_num",
        (F.col("day_num") - F.lag("day_num").over(w)).alias("gap_days"),
    )
    dd = lg.select(
        "user_id",
        "gap_days",
        F.expr(
            "CAST(year(DATE '1970-01-01' + CAST(day_num AS INT)) * 100"
            " + month(DATE '1970-01-01' + CAST(day_num AS INT)) AS BIGINT)"
        ).alias("ym"),
    ).localCheckpoint()
    act = dd.groupBy("ym").agg(
        F.countDistinct("user_id").cast("long").alias("n_active")
    )
    res = (
        dd.where(F.col("gap_days") > _RESURRECT_GAP_DAYS)
        .groupBy("ym")
        .agg(F.countDistinct("user_id").cast("long").alias("n_resurrected"))
    )
    return (
        act.join(res, "ym", "left")
        .select(
            "ym",
            "n_active",
            F.coalesce("n_resurrected", F.lit(0)).cast("long").alias("n_resurrected"),
            F.expr(
                "CAST((1000000 * COALESCE(n_resurrected, 0)) div n_active AS BIGINT)"
            ).alias("resurrected_q6"),
        )
        .orderBy("ym")
    )


@register(
    "source_lang_mutual_info",
    """WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang),
ns AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM c GROUP BY source),
nl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM c GROUP BY lang),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM c),
cell AS (
  SELECT CAST(round(1000000 * (CAST(c.n AS DOUBLE) / tot.big_n)
       * ln((CAST(c.n AS DOUBLE) * tot.big_n)
            / (CAST(ns.ns AS DOUBLE) * nl.nl))) AS BIGINT) AS mi_q6
  FROM c JOIN ns USING (source) JOIN nl USING (lang), tot)
SELECT (SELECT CAST(big_n AS BIGINT) FROM tot) AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM ns) AS n_sources,
       (SELECT CAST(count(*) AS BIGINT) FROM nl) AS n_langs,
       CAST(COALESCE(sum(mi_q6), 0) AS BIGINT) AS mi_q6
FROM cell""",
)
def source_lang_mutual_info(spark, sf_dir):
    """Mutual information between source and language (nats, q6) — the
    one-number answer to 'does knowing the source tell you the
    language' that source_lang_chi2 tests for significance and the
    confusion/census matrices show cell by cell: MI is the effect
    SIZE, directly comparable to the entropies the corpus already
    reports (MI = H(lang) − H(lang|source)); near 0 → language-routing
    by source is useless, near H(lang) → source IS the language
    partition.

    Determinism: per-cell p·ln(p/(pq)) is q6-rounded FIRST (the
    source_unigram_entropy rule), the sum is exact BIGINT; the log
    argument is assembled from exact integer counts.

    Scale shape: one (source, lang) agg (map-side partials); margins
    and cells are |sources|×|langs|-sized."""
    c = (
        _docs(spark, sf_dir)
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    ns = c.groupBy("source").agg(F.sum("n").cast("long").alias("ns"))
    nl = c.groupBy("lang").agg(F.sum("n").cast("long").alias("nl"))
    tot = c.agg(F.sum("n").cast("long").alias("big_n"))
    cell = (
        c.join(ns, "source")
        .join(nl, "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(round(1000000 * (CAST(n AS DOUBLE) / big_n)"
                " * ln((CAST(n AS DOUBLE) * big_n)"
                " / (CAST(ns AS DOUBLE) * nl))) AS BIGINT)"
            ).alias("mi_q6")
        )
    )
    counts = (
        tot.crossJoin(ns.agg(F.count(F.lit(1)).cast("long").alias("n_sources")))
        .crossJoin(nl.agg(F.count(F.lit(1)).cast("long").alias("n_langs")))
    )
    return counts.crossJoin(
        cell.agg(
            F.coalesce(F.sum("mi_q6"), F.lit(0)).cast("long").alias("mi_q6")
        )
    ).select(
        F.col("big_n").alias("n_docs"), "n_sources", "n_langs", "mi_q6"
    )


# ---------------------------------------------------------------------------
# session 159 — kNN k-sweep, near-constant columns, ts granularity
# ---------------------------------------------------------------------------


@register(
    "knn_k_sweep_accuracy",
    _BATCH_SQL
    + """,
lb AS (SELECT vec_id, label FROM embeddings),
ks AS (SELECT unnest([1, 3, 5, 10]) AS k),
nb AS (SELECT ks.k, btop.qid, btop.vec_id
       FROM btop, ks WHERE btop.rnk <= ks.k AND btop.vec_id <> btop.qid),
cnt AS (SELECT nb.k, nb.qid, ql.label AS qlabel, nl.label AS nlabel,
               CAST(count(*) AS BIGINT) AS c
        FROM nb JOIN lb ql ON ql.vec_id = nb.qid
        JOIN lb nl ON nl.vec_id = nb.vec_id
        GROUP BY nb.k, nb.qid, ql.label, nl.label),
pred AS (SELECT k, qid, qlabel, nlabel AS pred FROM (
           SELECT k, qid, qlabel, nlabel,
                  row_number() OVER (PARTITION BY k, qid
                                     ORDER BY c DESC, nlabel ASC) AS rn
           FROM cnt) WHERE rn = 1)
SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST((1000000 * sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS acc_q6
FROM pred GROUP BY k ORDER BY k""",
)
def knn_k_sweep_accuracy(spark, sf_dir):
    """The k knob of the kNN classifier: accuracy of the majority vote
    at k = 1/3/5/10 over the batch ANN neighbor lists —
    knn_label_confusion fixes k=10 and shows WHERE errors go; this
    sweeps the one hyperparameter and shows the classic k curve (k=1
    overfits neighbor noise, large k washes out minority classes; on
    the sandbox's weak labels the curve is flat at the prior — the
    honest reading, per ann_label_purity). Voting keeps the confusion
    matrix's conventions: self-hits excluded, ties to the smaller
    label, no-neighbor queries drop.

    Determinism: exact counts; majority = (count DESC, label ASC)
    rank; acc is one integer division per k.

    Scale shape: the 4-row k spine fans the 10-row-per-query neighbor
    lists; votes and the rollup are batch-sized."""
    top = _ivf_batch_topk(spark, sf_dir).localCheckpoint()
    lb = _emb(spark, sf_dir).select("vec_id", "label")
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(3), F.lit(5), F.lit(10))).alias("k")
    )
    nb = (
        top.where(F.col("vec_id") != F.col("qid"))
        .crossJoin(F.broadcast(ks))
        .where(F.col("rnk") <= F.col("k"))
        .select("k", "qid", "vec_id")
    )
    ql = lb.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    nl = lb.select("vec_id", F.col("label").alias("nlabel"))
    cnt = (
        nb.join(ql, "qid")
        .join(nl, "vec_id")
        .groupBy("k", "qid", "qlabel", "nlabel")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pred = (
        cnt.groupBy("k", "qid", "qlabel")
        .agg(F.max(F.struct(F.col("c"), (-F.col("nlabel")).alias("nl"))).alias("t"))
        .select("k", "qlabel", (-F.col("t.nl")).alias("pred"))
    )
    return (
        pred.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(F.expr("CASE WHEN pred = qlabel THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            "n_queries",
            "n_correct",
            F.expr(
                "CAST((1000000 * n_correct) div n_queries AS BIGINT)"
            ).alias("acc_q6"),
        )
        .orderBy("k")
    )


@register(
    "near_constant_columns",
    "\nUNION ALL\n".join(
        f"""SELECT '{col}' AS col_name,
       CAST(sum(dom) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS ndv,
       CAST(max(dom) AS BIGINT) AS dominant_rows,
       CAST((1000000 * max(dom)) // sum(dom) AS BIGINT) AS dominant_q6
FROM (SELECT CAST(count(*) AS BIGINT) AS dom
      FROM (SELECT {expr} AS x FROM lineitem) GROUP BY x)"""
        for col, expr in [
            ("l_quantity", "CAST(round(100 * l_quantity) AS BIGINT)"),
            ("l_discount", "CAST(round(100 * l_discount) AS BIGINT)"),
            ("l_tax", "CAST(round(100 * l_tax) AS BIGINT)"),
            ("l_returnflag", "l_returnflag"),
            ("l_linestatus", "l_linestatus"),
        ]
    )
    + "\nORDER BY col_name",
)
def near_constant_columns(spark, sf_dir):
    """Feature-screening census over lineitem's narrow columns: NDV and
    the dominant value's row share — a column whose top value carries
    ~everything is near-constant (useless as an ML feature, but a
    perfect dictionary/RLE target, and a predicate on it won't prune) —
    the modeling-side twin of column_encoding_advisor's storage-side
    report. Values quantize per-row before grouping (cents/percent
    points, the Q1 rule) so floats group exactly.

    Determinism: pure integer counts and one division per column.

    Scale shape: per column, one per-value groupBy (map-side partials,
    NDV-bounded) then a 1-row rollup; five independent arms union."""
    arms = []
    for col, expr in [
        ("l_quantity", "CAST(round(100 * l_quantity) AS BIGINT)"),
        ("l_discount", "CAST(round(100 * l_discount) AS BIGINT)"),
        ("l_tax", "CAST(round(100 * l_tax) AS BIGINT)"),
        ("l_returnflag", "l_returnflag"),
        ("l_linestatus", "l_linestatus"),
    ]:
        per = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(F.expr(expr).alias("x"))
            .groupBy("x")
            .agg(F.count(F.lit(1)).cast("long").alias("dom"))
        )
        arms.append(
            per.agg(
                F.sum("dom").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("ndv"),
                F.max("dom").cast("long").alias("dominant_rows"),
            ).select(
                F.lit(col).alias("col_name"),
                "n_rows",
                "ndv",
                "dominant_rows",
                F.expr(
                    "CAST((1000000 * dominant_rows) div n_rows AS BIGINT)"
                ).alias("dominant_q6"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("col_name")


@register(
    "ts_granularity_census",
    """WITH t AS (SELECT epoch_us(ts) AS us FROM events)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN us % 1000000 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_subsecond,
       CAST(sum(CASE WHEN us % 1000000 = 0 AND us % 60000000 <> 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_second_aligned,
       CAST(sum(CASE WHEN us % 60000000 = 0 AND us % 3600000000 <> 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_minute_aligned,
       CAST(sum(CASE WHEN us % 3600000000 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hour_aligned
FROM t""",
)
def ts_granularity_census(spark, sf_dir):
    """Timestamp-precision census: how many event times carry
    sub-second precision vs landing exactly on second / minute / hour
    boundaries — boundary-aligned masses reveal upstream truncation or
    batch-loader stamping (a minute-aligned spike means the 'event
    time' is really an ingest tick, which silently breaks
    sessionization gaps, as-of joins, and the watermark curve; this is
    the check that says whether those time ops mean what they claim).
    The four classes partition all events (finest wins).

    Determinism: pure integer µs modular arithmetic.

    Scale shape: four map-side counters in ONE scan-and-agg."""
    t = _events(spark, sf_dir).select(
        F.expr("unix_micros(cast(ts as timestamp))").alias("us")
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.expr("CASE WHEN us % 1000000 <> 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_subsecond"),
        F.sum(
            F.expr(
                "CASE WHEN us % 1000000 = 0 AND us % 60000000 <> 0 THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_second_aligned"),
        F.sum(
            F.expr(
                "CASE WHEN us % 60000000 = 0 AND us % 3600000000 <> 0 THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_minute_aligned"),
        F.sum(F.expr("CASE WHEN us % 3600000000 = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_hour_aligned"),
    )


# ---------------------------------------------------------------------------
# session 160 — balanced interleaving, dup locality, type value profile
# ---------------------------------------------------------------------------


@register(
    "balanced_interleaving_eval",
    _bm25_agg_ctes(_PL2_TERMS)
    + f""",
atop AS (SELECT doc_id,
                row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk
         FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
cfs AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
nd2 AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(doc_len) AS BIGINT) AS tot FROM dl),
pin AS (SELECT tf.doc_id, CAST(tf.tf AS BIGINT) AS tfv,
               CAST(dl.doc_len AS BIGINT) AS dlv, cfs.cf AS cf,
               nd2.tot AS tot, nd2.nd AS nd
        FROM tf JOIN q USING (term) JOIN cfs USING (term)
        JOIN dl USING (doc_id) CROSS JOIN nd2),
pper AS (SELECT doc_id, {_PL2_S} AS s FROM pin),
pagg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
         FROM pper GROUP BY doc_id),
ptop AS (SELECT doc_id,
                row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk
         FROM pagg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
seq AS (SELECT doc_id, rnk, 'A' AS team FROM atop
        UNION ALL SELECT doc_id, rnk, 'B' FROM ptop),
ded AS (SELECT doc_id, rnk, team FROM (
          SELECT doc_id, rnk, team,
                 row_number() OVER (PARTITION BY doc_id ORDER BY rnk, team) AS dd
          FROM seq) WHERE dd = 1),
pos AS (SELECT doc_id, team,
               row_number() OVER (ORDER BY rnk, team, doc_id) AS position
        FROM ded),
rel AS (SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup')
SELECT CAST(pos.position AS BIGINT) AS position, pos.doc_id, pos.team,
       CAST(CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_rel
FROM pos LEFT JOIN rel ON rel.doc_id = pos.doc_id
WHERE pos.position <= 10 ORDER BY position""",
)
def balanced_interleaving_eval(spark, sf_dir):
    """Balanced interleaving of two live rankers (BM25 vs DFR-PL2 on
    the same query): merge the two top-10s rank-by-rank (A before B at
    equal rank — the deterministic priority variant), drop a doc the
    second time it appears, keep 10, and credit each position against
    the binary relevance label — the online-evaluation page layout
    (Joachims 2002) that decides A/B ranker rollouts from clicks;
    with the corpus's 'dup' relevance standing in for clicks, the
    is_rel-by-team readout IS the interleaving verdict
    (bm25_pl2_overlap says how much the lists share; this builds the
    page you'd actually serve to compare them).

    Determinism: both legs rank over quantized scores with doc_id
    tiebreaks; the merge order (rnk, team, doc_id) and first-occurrence
    dedup are exact integer/string orderings.

    Scale shape: the legs share tf/dl's exchanges (the
    bm25_pl2_overlap plumbing); every interleaving window runs on ≤20
    rows."""
    a = (
        _bm25_match_set(spark, sf_dir, _PL2_TERMS)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))),
        )
        .select("doc_id", "rnk", F.lit("A").alias("team"))
    )
    b = dfr_pl2_search(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("rnk"), F.lit("B").alias("team")
    )
    seq = a.unionByName(b)
    wd = Window.partitionBy("doc_id").orderBy("rnk", "team")
    ded = (
        seq.withColumn("dd", F.row_number().over(wd))
        .where(F.col("dd") == 1)
        .drop("dd")
    )
    wp = Window.orderBy("rnk", "team", "doc_id")
    pos = ded.withColumn("position", F.row_number().over(wp)).where(
        F.col("position") <= 10
    )
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
        .withColumn("flag", F.lit(1))
    )
    return (
        pos.join(rel, "doc_id", "left")
        .select(
            F.col("position").cast("long").alias("position"),
            "doc_id",
            "team",
            F.coalesce("flag", F.lit(0)).cast("long").alias("is_rel"),
        )
        .orderBy("position")
    )


@register(
    "dup_locality_census",
    """WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
g AS (SELECT hh, CAST(count(*) AS BIGINT) AS n,
             CAST(max(doc_id) - min(doc_id) AS BIGINT) AS span
      FROM h GROUP BY hh HAVING count(*) > 1)
SELECT CAST(length(bin(span)) - 1 AS BIGINT) AS span_band,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n) AS BIGINT) AS n_docs
FROM g GROUP BY span_band ORDER BY span_band""",
)
def dup_locality_census(spark, sf_dir):
    """WHERE do exact duplicates live relative to each other: the
    doc_id span of every md5(text) duplicate group, log2-banded — a
    low-band mass says duplicates arrive near each other (same crawl
    batch; a sort-window or per-partition dedup catches most of them
    cheaply), a flat/high-band spread says duplication is global and
    only the full-shuffle md5 groupBy works (exactly the choice
    dedup_exact vs a cheaper sorted pass at 100 TB hinges on —
    sort_layout_pruning_estimate makes the same locality argument for
    scans).

    Determinism: pure integer spans (distinct doc_ids ⇒ span ≥ 1).

    Scale shape: the dedup_exact shuffle with min/max carried in the
    same agg; band rollup ≤64 rows."""
    h = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("hh"))
    g = (
        h.groupBy("hh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.max("doc_id") - F.min("doc_id")).cast("long").alias("span"),
        )
        .where(F.col("n") > 1)
    )
    return (
        g.select(
            F.expr("CAST(length(bin(span)) - 1 AS BIGINT)").alias("span_band"),
            "n",
        )
        .groupBy("span_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("n").cast("long").alias("n_docs"),
        )
        .orderBy("span_band")
    )


@register(
    "type_value_profile",
    """SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM events GROUP BY event_type ORDER BY event_type""",
)
def type_value_profile(spark, sf_dir):
    """Value profile per event type: count plus cents sum/min/max —
    event_type_census counts heads; THIS shows where the money field
    actually carries signal (purchase values vs the zero/noise values
    other types log), the sanity table before any value-weighted op
    trusts the column. Cents per row first (the Q1 rule).

    Scale shape: one map-side-combined agg into ≤|types| rows."""
    e = _events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# session 161 — value×recency skyline, MMR diversity gain
# ---------------------------------------------------------------------------

_SKY_SHARD = 4096  # cents-range sub-shard width for the two-pass prefix max


@register(
    "orders_value_recency_skyline",
    f"""WITH p AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day_num
  FROM orders),
pts AS (SELECT cents, day_num, CAST(count(*) AS BIGINT) AS n_orders
        FROM p GROUP BY cents, day_num),
c AS (SELECT cents, CAST(max(day_num) AS BIGINT) AS maxd
      FROM pts GROUP BY cents),
w AS (SELECT cents, maxd,
             max(maxd) OVER (ORDER BY cents DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_gt
      FROM c),
sky AS (SELECT cents, maxd AS day_num FROM w
        WHERE m_gt IS NULL OR maxd > m_gt)
SELECT sky.cents, sky.day_num, pts.n_orders
FROM sky JOIN pts ON pts.cents = sky.cents AND pts.day_num = sky.day_num
ORDER BY sky.cents DESC""",
)
def orders_value_recency_skyline(spark, sf_dir):
    """The SKYLINE operator (Börzsönyi 2001) on orders, maximizing
    (value, recency): every order not dominated by one that is both
    more valuable AND at least as recent (ties in both dims keep all
    co-located orders) — the classic multi-criteria shortlist
    ('biggest recent deals') that no single ORDER BY can produce,
    completing the relational-operator family beside CUBE, as-of, and
    the argmax patterns.

    Determinism: cents/epoch-day integers; a point survives iff its
    day strictly exceeds the max day over all STRICTLY higher values
    (and it carries its value's max day) — exact integer comparisons.

    Scale shape (Spark): the per-value max collapses to a
    value-cardinality table; the strict-prefix max over it is NOT one
    global window — it is the watermark_drop_curve two-pass form
    (cents-range sub-shards + exclusive prefix max over the tiny
    shard-max table), byte-identical to the oracle's single window;
    survivors join back to the points table on the (cents, day)
    key."""
    p = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(
            f"CAST(unix_micros(cast(o_orderdate as timestamp)) div {_US_PER_DAY} AS BIGINT)"
        ).alias("day_num"),
    )
    pts = p.groupBy("cents", "day_num").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    ).localCheckpoint()
    c = pts.groupBy("cents").agg(F.max("day_num").cast("long").alias("maxd"))
    sh = c.withColumn("shard", F.expr(f"cents div {_SKY_SHARD}"))
    win = Window.partitionBy("shard").orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = sh.withColumn("m_in", F.max("maxd").over(win))
    smax = sh.groupBy("shard").agg(F.max("maxd").alias("shmax"))
    wsh = Window.orderBy(F.desc("shard")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    pmax = smax.select("shard", F.max("shmax").over(wsh).alias("m_hi"))
    w = within.join(pmax, "shard").select(
        "cents",
        "maxd",
        F.expr(
            "CASE WHEN m_in IS NULL AND m_hi IS NULL THEN NULL"
            " WHEN m_in IS NULL THEN m_hi"
            " WHEN m_hi IS NULL THEN m_in"
            " ELSE greatest(m_in, m_hi) END"
        ).alias("m_gt"),
    )
    sky = w.where(F.col("m_gt").isNull() | (F.col("maxd") > F.col("m_gt"))).select(
        "cents", F.col("maxd").alias("day_num")
    )
    return (
        sky.join(pts, ["cents", "day_num"])
        .select("cents", "day_num", "n_orders")
        .orderBy(F.desc("cents"))
    )


@register(
    "mmr_diversity_gain",
    _mmr_sql()[: _mmr_sql().rindex("SELECT sel_order")]
    + f""",
basetop AS (SELECT doc_id FROM top20 ORDER BY score_q6 DESC, doc_id ASC LIMIT 8),
lab AS (SELECT doc_id, source FROM documents),
bsrc AS (SELECT lab.source, CAST(count(*) AS BIGINT) AS n
         FROM basetop JOIN lab USING (doc_id) GROUP BY lab.source),
msrc AS (SELECT lab.source, CAST(count(*) AS BIGINT) AS n
         FROM sel JOIN lab USING (doc_id) GROUP BY lab.source),
bh AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
              CAST(COALESCE(sum(CAST(round(1000000 * (CAST(n AS DOUBLE) / t.tot)
                   * ln(CAST(t.tot AS DOUBLE) / n)) AS BIGINT)), 0) AS BIGINT) AS ent
       FROM bsrc, (SELECT CAST(sum(n) AS BIGINT) AS tot FROM bsrc) t),
mh AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
              CAST(COALESCE(sum(CAST(round(1000000 * (CAST(n AS DOUBLE) / t.tot)
                   * ln(CAST(t.tot AS DOUBLE) / n)) AS BIGINT)), 0) AS BIGINT) AS ent
       FROM msrc, (SELECT CAST(sum(n) AS BIGINT) AS tot FROM msrc) t)
SELECT 'bm25_top8' AS ranker, bh.n_sources, bh.ent AS entropy_q6 FROM bh
UNION ALL
SELECT 'mmr_top8', mh.n_sources, mh.ent FROM mh
ORDER BY ranker""",
)
def mmr_diversity_gain(spark, sf_dir):
    """Did MMR buy diversity? Source count and source-entropy of the
    plain BM25 top-8 versus mmr_rerank's 8 picks for the same query —
    the before/after of the diversification pass in
    serp_source_diversity's own units (entropy gain at equal page size
    = what λ=0.7 purchased; zero gain on a single-source match set is
    the honest null). Per-source −p·ln p is q6-rounded FIRST (the
    entropy family rule).

    Scale shape: both legs are 8-row pages joined to metadata; the MMR
    leg reuses the mmr_rerank machinery (collected 20-row band in
    Spark, the unrolled MATERIALIZED chain in the oracle)."""
    base = (
        _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
        .where(F.col("doc_id") != 0)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(8)
        .select("doc_id")
    )
    sel = mmr_rerank(spark, sf_dir).select("doc_id")
    lab = _docs(spark, sf_dir).select("doc_id", "source")

    def leg(df, name):
        src = df.join(lab, "doc_id").groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        tot = src.agg(F.sum("n").cast("long").alias("tot"))
        return (
            src.crossJoin(F.broadcast(tot))
            .select(
                F.expr(
                    "CAST(round(1000000 * (CAST(n AS DOUBLE) / tot)"
                    " * ln(CAST(tot AS DOUBLE) / n)) AS BIGINT)"
                ).alias("hq6")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_sources"),
                F.coalesce(F.sum("hq6"), F.lit(0)).cast("long").alias("entropy_q6"),
            )
            .select(F.lit(name).alias("ranker"), "n_sources", "entropy_q6")
        )

    return leg(base, "bm25_top8").unionByName(leg(sel, "mmr_top8")).orderBy(
        "ranker"
    )


# ---------------------------------------------------------------------------
# session 162 — KMV sketch, lexicon sentiment, churn by activity band
# ---------------------------------------------------------------------------

_KMV_K = 64


@register(
    "kmv_distinct_estimate",
    f"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type,
             ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 13))::UBIGINT
               / 4503599627370496.0 AS u
      FROM d),
r AS (SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
      FROM h),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
      FROM h GROUP BY event_type),
kk AS (SELECT event_type, u AS uk FROM r WHERE rn = {_KMV_K}),
est AS (
  SELECT n.event_type, n.n_exact,
         CAST(CASE WHEN kk.uk IS NULL THEN n.n_exact
              ELSE round({_KMV_K - 1} / kk.uk) END AS BIGINT) AS kmv_est
  FROM n LEFT JOIN kk ON kk.event_type = n.event_type)
SELECT event_type, n_exact, kmv_est,
       CAST((1000000 * abs(kmv_est - n_exact)) // n_exact AS BIGINT) AS err_q6
FROM est ORDER BY event_type""",
)
def kmv_distinct_estimate(spark, sf_dir):
    """KMV (bottom-k / k-minimum-values) distinct-count sketch per
    event type: keep the k=64 smallest 52-bit hash values of the
    user ids, estimate NDV as (k−1)/u_k — the OTHER classic
    cardinality sketch beside HLL (theta/KMV sketches union and
    intersect by set algebra on the kept values, which HLL registers
    cannot; this op reports its per-type accuracy against exact so the
    two sketch families can be compared on the same column as
    hll_precision_curve). Types with fewer than k users fall back to
    the exact count (the KMV rule for under-filled sketches).

    Determinism: u = md5('kmv:'||user)/2^52 is an exact double
    (hash-input seeded — the weighted_sample_docs coordinate rule);
    equal-u ties leave u_k the same value; one float division, then
    half-away round.

    Scale shape: distinct (type, user) is a two-phase exchange; the
    per-type rank window runs over user-cardinality rows (at scale:
    keep per-partition bottom-k first — the sketch IS that
    map-combine; documented knob)."""
    d = _events(spark, sf_dir).select("event_type", "user_id").distinct()
    h = d.select(
        "event_type",
        F.expr(
            "cast(conv(substring(md5('kmv:' || cast(user_id as string)), 1, 13), 16, 10) as bigint)"
            " / 4503599627370496e0"
        ).alias("u"),
    ).localCheckpoint()
    w = Window.partitionBy("event_type").orderBy("u")
    kk = (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == _KMV_K)
        .select("event_type", F.col("u").alias("uk"))
    )
    n = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    est = n.join(kk, "event_type", "left").select(
        "event_type",
        "n_exact",
        F.expr(
            f"CAST(CASE WHEN uk IS NULL THEN n_exact"
            f" ELSE round({_KMV_K - 1} / uk) END AS BIGINT)"
        ).alias("kmv_est"),
    )
    return est.select(
        "event_type",
        "n_exact",
        "kmv_est",
        F.expr(
            "CAST((1000000 * abs(kmv_est - n_exact)) div n_exact AS BIGINT)"
        ).alias("err_q6"),
    ).orderBy("event_type")


_SENT_POS = "('good', 'great', 'excellent', 'love', 'best', 'happy', 'win', 'nice')"
_SENT_NEG = "('bad', 'terrible', 'awful', 'hate', 'worst', 'sad', 'fail', 'poor')"


@register(
    "sentiment_lexicon_score",
    f"""WITH tk AS (SELECT source, unnest(words) AS term FROM ({SQL_WORDS}))
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN term IN {_SENT_POS} THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN term IN {_SENT_NEG} THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST((1000000 * (sum(CASE WHEN term IN {_SENT_POS} THEN 1 ELSE 0 END)
            - sum(CASE WHEN term IN {_SENT_NEG} THEN 1 ELSE 0 END)))
            // greatest(count(*), 1) AS BIGINT) AS net_q6
FROM tk GROUP BY source ORDER BY source""",
)
def sentiment_lexicon_score(spark, sf_dir):
    """Dictionary sentiment per source: positive/negative lexicon hits
    (an 8+8-word embedded AFINN-style list — the same embedded-wordlist
    device as the lang-ID profiles) and the token-normalized net score
    — the cheapest corpus-mood gauge, and in a curation pipeline the
    toxicity/advocacy screen's structural template (swap the list,
    keep the plan). Near-zero on the synthetic corpus is the honest
    reading; the property suite injects charged docs.

    Determinism: exact conditional counts; net is one signed integer
    division (both engines truncate toward zero — the session-105
    verified rule).

    Scale shape: one tokenize explode and a per-source conditional
    agg, all map-side combinable."""
    tk = _docs(spark, sf_dir).select(
        "source", F.explode(spark_tokens("text")).alias("term")
    )
    return (
        tk.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.expr(f"CASE WHEN term IN {_SENT_POS} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_pos"),
            F.sum(F.expr(f"CASE WHEN term IN {_SENT_NEG} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_neg"),
        )
        .select(
            "source",
            "n_tokens",
            "n_pos",
            "n_neg",
            F.expr(
                "CAST((1000000 * (n_pos - n_neg)) div greatest(n_tokens, 1)"
                " AS BIGINT)"
            ).alias("net_q6"),
        )
        .orderBy("source")
    )


@register(
    "churn_by_activity_band",
    f"""WITH mx AS (
  SELECT CAST(max(epoch_us(ts)) // {_US_PER_DAY} AS BIGINT) AS maxd FROM events),
u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(epoch_us(ts)) // {_US_PER_DAY} AS BIGINT) AS last_day
  FROM events GROUP BY user_id),
b AS (
  SELECT CAST(length(bin(u.n_events)) - 1 AS BIGINT) AS activity_band,
         CASE WHEN mx.maxd - u.last_day > 28 THEN 1 ELSE 0 END AS churned
  FROM u, mx)
SELECT activity_band, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(churned) AS BIGINT) AS n_churned,
       CAST((1000000 * sum(churned)) // count(*) AS BIGINT) AS churn_q6
FROM b GROUP BY activity_band ORDER BY activity_band""",
)
def churn_by_activity_band(spark, sf_dir):
    """Does engagement protect against churn? Users banded by log2
    lifetime event count, with the share whose LAST activity sits more
    than 28 days before the dataset's end — the retention curve's
    actionable cross-cut (user_activity_histogram counts the bands;
    resurrected_users_monthly tracks comebacks; this says which bands
    the 28-day-silent users come FROM, i.e. whether churn is a
    light-user phenomenon here). Dataset-max anchored, like
    open_order_age_histogram.

    Determinism: pure integers.

    Scale shape: one user-keyed agg (count + max ride one exchange);
    the 1-row max-date broadcast; band rollup ≤64 rows."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
    )
    mx = e.agg(F.max("day_num").cast("long").alias("maxd"))
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("day_num").cast("long").alias("last_day"),
    )
    b = u.crossJoin(F.broadcast(mx)).select(
        F.expr("CAST(length(bin(n_events)) - 1 AS BIGINT)").alias(
            "activity_band"
        ),
        F.expr("CASE WHEN maxd - last_day > 28 THEN 1 ELSE 0 END").alias(
            "churned"
        ),
    )
    return (
        b.groupBy("activity_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("churned").cast("long").alias("n_churned"),
        )
        .select(
            "activity_band",
            "n_users",
            "n_churned",
            F.expr(
                "CAST((1000000 * n_churned) div n_users AS BIGINT)"
            ).alias("churn_q6"),
        )
        .orderBy("activity_band")
    )


# ---------------------------------------------------------------------------
# session 163 — sequence-pair support, trailing tokens, partial shipment
# ---------------------------------------------------------------------------


@register(
    "seq_pair_support",
    """WITH b AS (
  SELECT user_id, event_type,
         CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
  FROM events GROUP BY user_id, event_type),
p AS (
  SELECT a.event_type AS type_a, c.event_type AS type_b,
         CASE WHEN a.first_us < c.last_us THEN 1 ELSE 0 END AS ordered_ab
  FROM b a JOIN b c ON c.user_id = a.user_id AND c.event_type <> a.event_type)
SELECT type_a, type_b,
       CAST(count(*) AS BIGINT) AS n_users_both,
       CAST(sum(ordered_ab) AS BIGINT) AS n_ordered,
       CAST((1000000 * sum(ordered_ab)) // count(*) AS BIGINT) AS support_q6
FROM p GROUP BY type_a, type_b ORDER BY type_a, type_b""",
)
def seq_pair_support(spark, sf_dir):
    """Sequential-pattern support at gap-∞: for every ORDERED type pair
    (a → b), among users who did both, how many ever did a BEFORE some
    b (first a precedes last b) — the order-aware counterpart of
    event_type_lift's unordered co-occurrence and the any-gap
    generalization of events_markov_transitions' adjacent-only counts
    (a funnel hypothesis like signup→purchase lives at exactly this
    grain: ordered, eventually). The asymmetry support(a→b) vs
    support(b→a) is the direction signal.

    Determinism: per-(user, type) first/last epochs are exact integer
    min/max; the pair flag is one integer comparison.

    Scale shape: one (user, type) agg (map-side); the pair table is
    |types|²-bounded PER USER (the event_type_lift bound) keyed on
    user_id; the rollup is ≤|types|² rows."""
    b = (
        _events(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.min("us").cast("long").alias("first_us"),
            F.max("us").cast("long").alias("last_us"),
        )
    )
    a = b.select(
        "user_id", F.col("event_type").alias("type_a"), "first_us"
    )
    c = b.select(
        F.col("user_id").alias("uid2"),
        F.col("event_type").alias("type_b"),
        "last_us",
    )
    p = a.join(
        c,
        (F.col("uid2") == F.col("user_id"))
        & (F.col("type_b") != F.col("type_a")),
    ).select(
        "type_a",
        "type_b",
        F.expr("CASE WHEN first_us < last_us THEN 1 ELSE 0 END").alias(
            "ordered_ab"
        ),
    )
    return (
        p.groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users_both"),
            F.sum("ordered_ab").cast("long").alias("n_ordered"),
        )
        .select(
            "type_a",
            "type_b",
            "n_users_both",
            "n_ordered",
            F.expr(
                "CAST((1000000 * n_ordered) div n_users_both AS BIGINT)"
            ).alias("support_q6"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "trailing_token_census",
    f"""WITH w AS ({SQL_WORDS}),
f AS (SELECT words[len(words)] AS tok FROM w WHERE len(words) >= 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM f),
c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_docs FROM f GROUP BY tok),
rk AS (SELECT tok, n_docs,
              row_number() OVER (ORDER BY n_docs DESC, tok ASC) AS rank
       FROM c)
SELECT rk.tok, CAST(rk.rank AS BIGINT) AS rank, rk.n_docs,
       CAST((1000000 * rk.n_docs) // tot.t AS BIGINT) AS share_q6
FROM rk CROSS JOIN tot WHERE rk.rank <= 10 ORDER BY rank""",
)
def trailing_token_census(spark, sf_dir):
    """Trailing-token census: the 10 most common LAST tokens — the
    boilerplate-FOOTER half of leading_token_census (copyright lines,
    'read more', truncation artifacts all land here; a dominant
    trailer that ISN'T a dominant leader means the template wraps the
    content, which chunk-level dedup sees but doc-level hashes miss).
    Empty documents drop.

    Determinism: exact counts; rank by (n desc, token asc).

    Scale shape: last-element extraction is map-side; one
    vocab-bounded agg; TakeOrdered 10."""
    w = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    f = w.where(F.size("words") >= 1).select(
        F.element_at("words", -1).alias("tok")
    )
    tot = f.agg(F.count(F.lit(1)).cast("long").alias("t"))
    c = f.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    rk = c.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("n_docs"), F.asc("tok")))
        .cast("long"),
    ).where(F.col("rank") <= 10)
    return (
        rk.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "rank",
            "n_docs",
            F.expr("CAST((1000000 * n_docs) div t AS BIGINT)").alias("share_q6"),
        )
        .orderBy("rank")
    )


@register(
    "partially_shipped_orders",
    f"""WITH s AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CASE WHEN l_shipdate <= {_LI_CUTOFF} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_shipped
  FROM lineitem GROUP BY l_orderkey),
c AS (
  SELECT CASE WHEN n_shipped = 0 THEN 'none'
              WHEN n_shipped = n_items THEN 'full'
              ELSE 'partial' END AS ship_state,
         n_items
  FROM s)
SELECT ship_state, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(n_items) AS BIGINT) AS n_items
FROM c GROUP BY ship_state ORDER BY ship_state""",
)
def partially_shipped_orders(spark, sf_dir):
    """Shipment completeness census at the Q1 cutoff date: orders fully
    shipped / untouched / SPLIT (some items out, some pending) — the
    partial-fulfillment state that drives both customer contacts and
    the fragmented-delivery costs order_ship_span_histogram measures in
    days; Q3's backlog revenue comes exclusively from the 'none' and
    'partial' rows of THIS table. One-sided date predicate, counted
    per order.

    Determinism: integer conditional counts against the shared
    `_LI_CUTOFF` timestamp.

    Scale shape: one orderkey agg (both counters ride one exchange);
    3-row rollup."""
    s = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.expr(f"CASE WHEN l_shipdate <= {_LI_CUTOFF} THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias("n_shipped"),
        )
    )
    c = s.select(
        F.expr(
            "CASE WHEN n_shipped = 0 THEN 'none'"
            " WHEN n_shipped = n_items THEN 'full'"
            " ELSE 'partial' END"
        ).alias("ship_state"),
        "n_items",
    )
    return (
        c.groupBy("ship_state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_items").cast("long").alias("n_items"),
        )
        .orderBy("ship_state")
    )


# ---------------------------------------------------------------------------
# session 164 — salting effect, score calibration, functional dependencies
# ---------------------------------------------------------------------------


@register(
    "salting_effect_curve",
    """WITH f AS (SELECT unnest([1, 2, 4, 8]) AS factor),
r AS (
  SELECT f.factor,
         ('0x' || substr(md5(CAST(l.l_orderkey AS VARCHAR) || ':'
            || CAST(('0x' || substr(md5('salt:' || CAST(l.l_linenumber AS VARCHAR)
                     || ':' || CAST(l.l_orderkey AS VARCHAR)), 1, 13))::UBIGINT
                    % f.factor AS VARCHAR)), 1, 13))::UBIGINT % 32 AS bucket
  FROM lineitem l, f),
b AS (SELECT factor, bucket, CAST(count(*) AS BIGINT) AS n
      FROM r GROUP BY factor, bucket),
t AS (SELECT factor, CAST(sum(n) AS BIGINT) AS total,
             CAST(max(n) AS BIGINT) AS max_bucket,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM b GROUP BY factor)
SELECT CAST(factor AS BIGINT) AS factor, n_buckets, max_bucket,
       CAST((1000000 * max_bucket) // total AS BIGINT) AS max_share_q6
FROM t ORDER BY factor""",
)
def salting_effect_curve(spark, sf_dir):
    """Does salting actually flatten the shuffle? The lineitem rows are
    hash-partitioned into 32 reducers on (l_orderkey, salt) for salt
    fan-outs 1/2/4/8 (salt = a per-ROW deterministic hash mod factor —
    the salted-join rewrite's left side), and the hottest reducer's
    share is reported per factor — the empirical curve behind
    salting_plan_advisor's prescription (on uniform TPC-H keys the
    share barely moves, the honest null; the property suite injects a
    celebrity key and watches the share drop ~1/factor).

    Determinism: buckets come from 52-bit md5 slices (hash-input
    seeded 'salt:'), pure integer modular arithmetic.

    Scale shape: the 4-row factor spine fans map-side; bucket loads
    combine map-side into ≤32·4 rows."""
    f = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8))).alias(
            "factor"
        )
    )
    r = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber")
        .crossJoin(F.broadcast(f))
        .select(
            "factor",
            F.expr(
                "cast(conv(substring(md5(cast(l_orderkey as string) || ':'"
                " || cast(cast(conv(substring(md5('salt:' || cast(l_linenumber as string)"
                " || ':' || cast(l_orderkey as string)), 1, 13), 16, 10) as bigint)"
                " % factor as string)), 1, 13), 16, 10) as bigint) % 32"
            ).alias("bucket"),
        )
    )
    b = r.groupBy("factor", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = b.groupBy("factor").agg(
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("max_bucket"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    return t.select(
        F.col("factor").cast("long").alias("factor"),
        "n_buckets",
        "max_bucket",
        F.expr("CAST((1000000 * max_bucket) div total AS BIGINT)").alias(
            "max_share_q6"
        ),
    ).orderBy("factor")


@register(
    "score_relevance_calibration",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + f""",
rel AS (SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup'),
lab AS (SELECT agg.doc_id, agg.score_q6,
               CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
        FROM agg LEFT JOIN rel USING (doc_id)),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_match FROM lab),
rk AS (SELECT score_q6, is_rel,
              row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rn
       FROM lab),
dec AS (SELECT CAST(((rn - 1) * 5) // n.n_match AS BIGINT) AS band, is_rel
        FROM rk, n)
SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_rel) AS BIGINT) AS n_rel,
       CAST((1000000 * sum(is_rel)) // count(*) AS BIGINT) AS rel_rate_q6
FROM dec GROUP BY band ORDER BY band""",
)
def score_relevance_calibration(spark, sf_dir):
    """Score calibration: the BM25 match set cut into 5 score-ordered
    bands (quintiles by rank), each with its observed relevance rate
    against the 'dup' label — the reliability diagram of the ranker
    (ranking_auc summarizes separation in ONE number; this shows WHERE
    the scores are informative: a monotone-decreasing rate column means
    score thresholds transfer to precision targets, a flat one means
    only rank order matters, not magnitude — the decision between
    score-cutoff filtering and fixed-k pages).

    Determinism: bands come from exact integer rank arithmetic
    ((rn−1)·5 div n) over the quantized-score ordering with doc_id
    tiebreaks; counts exact.

    Scale shape: the match-set window is query-bounded (the
    ranking_auc shape); rollup is 5 rows."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
        .withColumn("flag", F.lit(1))
    )
    lab = agg.join(rel, "doc_id", "left").select(
        "doc_id",
        "score_q6",
        F.coalesce("flag", F.lit(0)).alias("is_rel"),
    )
    n = lab.agg(F.count(F.lit(1)).cast("long").alias("n_match"))
    rk = lab.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))),
    )
    dec = rk.crossJoin(F.broadcast(n)).select(
        F.expr("CAST(((rn - 1) * 5) div n_match AS BIGINT)").alias("band"),
        "is_rel",
    )
    return (
        dec.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_rel").cast("long").alias("n_rel"),
        )
        .select(
            "band",
            "n_docs",
            "n_rel",
            F.expr(
                "CAST((1000000 * n_rel) div n_docs AS BIGINT)"
            ).alias("rel_rate_q6"),
        )
        .orderBy("band")
    )


def _fd_arm_sql(name: str, table: str, x: str, y: str) -> str:
    return f"""SELECT '{name}' AS dependency,
       (SELECT CAST(count(DISTINCT {x}) AS BIGINT) FROM {table}) AS ndv_x,
       (SELECT CAST(count(DISTINCT {y}) AS BIGINT) FROM {table}) AS ndv_y,
       (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT DISTINCT {x}, {y} FROM {table})) AS ndv_xy,
       CAST((1000000 * (SELECT count(DISTINCT {x}) FROM {table}))
            // (SELECT count(*) FROM (SELECT DISTINCT {x}, {y} FROM {table}))
            AS BIGINT) AS fd_strength_q6"""
