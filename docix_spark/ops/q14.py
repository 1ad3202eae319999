"""driver_queries chunk q14 (original lines 48593-52047): rank_biased_overlap, user_count_nb_fit, fd_binwidth_advisor, cep_pattern_match, ... quality_cronbach_alpha (32 ops).

Linearized continuation of docix_spark.ops.q13 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q13")

@register(
    "rank_biased_overlap",
    _bm25_agg_ctes(["spark", "dup"])
    + f""",
ar AS (SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS ra
       FROM (SELECT doc_id, score_q6 FROM agg
             ORDER BY score_q6 DESC, doc_id ASC LIMIT 10) _a),
cfs AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
nd2 AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(doc_len) AS BIGINT) AS tot FROM dl),
pin AS (SELECT tf.doc_id, CAST(tf.tf AS BIGINT) AS tfv,
               CAST(dl.doc_len AS BIGINT) AS dlv, cfs.cf AS cf,
               nd2.tot AS tot, nd2.nd AS nd
        FROM tf JOIN q USING (term) JOIN cfs USING (term)
        JOIN dl USING (doc_id) CROSS JOIN nd2),
pper AS (SELECT doc_id, {{PL2S}} AS s FROM pin),
pagg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
         FROM pper GROUP BY doc_id),
pr AS (SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rb
       FROM (SELECT doc_id, score_q6 FROM pagg
             ORDER BY score_q6 DESC, doc_id ASC LIMIT 10) _p),
j AS (SELECT ar.ra, pr.rb FROM ar JOIN pr USING (doc_id)),
ds AS (SELECT unnest(generate_series(1, 10)) AS depth),
xs AS (SELECT ds.depth,
              CAST(COALESCE(sum(CASE WHEN j.ra <= ds.depth AND j.rb <= ds.depth
                                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS x_d
       FROM ds LEFT JOIN j ON TRUE GROUP BY ds.depth),
w AS (SELECT * FROM (VALUES {", ".join(f"({d + 1}, {w})" for d, w in enumerate(_RBO_W))})
      _w(depth, w_q9)),
o AS (SELECT xs.depth, xs.x_d, w.w_q9 FROM xs JOIN w USING (depth))
SELECT CAST(depth AS BIGINT) AS depth, x_d,
       CAST((1000000 * x_d) // depth AS BIGINT) AS agreement_q6,
       CAST(w_q9 AS BIGINT) AS w_q9,
       CAST(CAST(sum(w_q9 * x_d) OVER (ORDER BY depth
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) // 1000
         AS BIGINT) AS rbo_cum_q6
FROM o ORDER BY depth""".replace("{PL2S}", _PL2_S),
)
def rank_biased_overlap(spark, sf_dir):
    """Rank-biased overlap (Webber et al. 2010) between the BM25 and
    DFR-PL2 top-10s for the same query — the TOP-WEIGHTED version of
    bm25_pl2_overlap's set intersection: agreement at depth d gets
    geometric weight (1−p)·p^(d−1)/d (p=0.9), so two rankings that
    agree on the first page's head score far higher than ones agreeing
    only at the tail. Emits the full depth curve (agreement@d + the
    cumulative RBO) — the model-agreement number IR evaluations
    actually quote when comparing rankers, since plain overlap treats
    rank 1 and rank 10 as equals.

    Determinism: both legs rank over quantized scores with the doc_id
    tiebreak; the weights are Python-folded q9 INTEGERS (the ndcg
    rule), so every cumulative contribution w·X_d is exact BIGINT; per-
    depth agreement is an integer cross-multiplication.

    Scale shape: both rankings are TakeOrdered 10-row collects off
    shared tf plumbing (the PL2 leg reuses the overlap op's CTE chain);
    everything downstream runs on ≤10-row tables."""
    bt = (
        _bm25_match_set(spark, sf_dir, _PL2_TERMS)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
    )
    ar = bt.withColumn(
        "ra",
        F.row_number()
        .over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))
        .cast("long"),
    ).select("doc_id", "ra")
    pr = dfr_pl2_search(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("rb")
    )
    j = ar.join(pr, "doc_id").select("ra", "rb")
    ds = spark.createDataFrame([(d,) for d in range(1, 11)], "depth long")
    xs = (
        ds.join(j, F.lit(True), "left")
        .groupBy("depth")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ra") <= F.col("depth"))
                        & (F.col("rb") <= F.col("depth")),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("x_d")
        )
    )
    w = spark.createDataFrame(
        [(d + 1, wq) for d, wq in enumerate(_RBO_W)], "depth long, w_q9 long"
    )
    o = xs.join(F.broadcast(w), "depth")
    wc = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            F.col("depth").cast("long").alias("depth"),
            "x_d",
            F.expr("CAST((1000000 * x_d) div depth AS BIGINT)").alias("agreement_q6"),
            "w_q9",
            F.expr("w_q9 * x_d").alias("contrib"),
        )
        .withColumn("cum", F.sum("contrib").over(wc).cast("long"))
        .select(
            "depth",
            "x_d",
            "agreement_q6",
            "w_q9",
            F.expr("CAST(cum div 1000 AS BIGINT)").alias("rbo_cum_q6"),
        )
        .orderBy("depth")
    )


# NB method-of-moments pieces — population mean/variance in the float-mean
# form (exact-integer numerators, identical IEEE order both engines).
_NB_MU = "(CAST(s1 AS DOUBLE) / n)"
_NB_VAR = "((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1) / (CAST(n AS DOUBLE) * n))"


@register(
    "user_count_nb_fit",
    f"""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY user_id),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(cnt * cnt), 0) AS BIGINT) AS s2
      FROM c)
SELECT n AS n_users,
       CAST(round(1000000 * {_NB_MU}) AS BIGINT) AS mean_q6,
       CAST(round(1000000 * {_NB_VAR}) AS BIGINT) AS var_q6,
       CASE WHEN CAST(n AS DOUBLE) * s2 > CAST(s1 AS DOUBLE) * s1 + CAST(n AS DOUBLE) * s1
            THEN 1 ELSE 0 END AS overdispersed,
       CAST(CASE WHEN CAST(n AS DOUBLE) * s2 > CAST(s1 AS DOUBLE) * s1 + CAST(n AS DOUBLE) * s1
            THEN round(1000000 * ({_NB_MU} * {_NB_MU}) / ({_NB_VAR} - {_NB_MU}))
            ELSE 0 END AS BIGINT) AS nb_r_q6,
       CAST(CASE WHEN CAST(n AS DOUBLE) * s2 > CAST(s1 AS DOUBLE) * s1 + CAST(n AS DOUBLE) * s1
            THEN round(1000000 * {_NB_MU} / {_NB_VAR})
            ELSE 0 END AS BIGINT) AS nb_p_q6
FROM a WHERE n > 0""",
)
def user_count_nb_fit(spark, sf_dir):
    """Negative-binomial fit of per-user event counts by method of
    moments: r = μ²/(σ²−μ), p = μ/σ² — the overdispersed count model
    every traffic simulator and capacity planner reaches for when the
    Poisson assumption fails (events_dispersion_index MEASURES the
    overdispersion; this op converts it into the distribution's
    parameters, the value_lognormal_fit treatment for counts). A
    non-overdispersed stream (σ² ≤ μ — NB undefined) reports the flag 0
    and parameter sentinels, never a negative r.

    Determinism: one map-side (n, Σc, Σc²) aggregate of exact BIGINTs;
    mean/variance in the float-mean form with every product cast from
    the FIRST multiply (the chi² rule — products pass 2^53 before they
    pass BIGINT); the dispersion gate is the same double comparison in
    both engines.

    Scale shape: ONE user-keyed exchange, then scalar math."""
    c = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    a = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("cnt") * F.col("cnt")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    gate = (
        "CAST(n AS DOUBLE) * s2 > CAST(s1 AS DOUBLE) * s1 + CAST(n AS DOUBLE) * s1"
    )
    return a.where(F.col("n") > 0).select(
        F.col("n").alias("n_users"),
        F.expr(f"CAST(round(1000000 * {_NB_MU}) AS BIGINT)").alias("mean_q6"),
        F.expr(f"CAST(round(1000000 * {_NB_VAR}) AS BIGINT)").alias("var_q6"),
        F.expr(f"CASE WHEN {gate} THEN 1 ELSE 0 END").alias("overdispersed"),
        F.expr(
            f"CAST(CASE WHEN {gate}"
            f" THEN round(1000000 * ({_NB_MU} * {_NB_MU}) / ({_NB_VAR} - {_NB_MU}))"
            f" ELSE 0 END AS BIGINT)"
        ).alias("nb_r_q6"),
        F.expr(
            f"CAST(CASE WHEN {gate}"
            f" THEN round(1000000 * {_NB_MU} / {_NB_VAR})"
            f" ELSE 0 END AS BIGINT)"
        ).alias("nb_p_q6"),
    )


@register(
    "fd_binwidth_advisor",
    """WITH v AS (SELECT CAST(n_chars AS BIGINT) AS val FROM documents),
hist AS (SELECT val, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY val),
h AS (
  SELECT val, cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER () AS BIGINT) AS n,
         CAST(min(val) OVER () AS BIGINT) AS mn,
         CAST(max(val) OVER () AS BIGINT) AS mx
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES (250000), (750000)) _p(p_q6)),
ex AS (
  SELECT q.p_q6, max(h.n) AS n, max(h.mn) AS mn, max(h.mx) AS mx,
         max((h.n - 1) * q.p_q6) AS x,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 THEN h.val END) AS v_lo,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 + 1 THEN h.val END) AS v_hi
  FROM h, q GROUP BY q.p_q6),
qq AS (
  SELECT p_q6, n, mn, mx,
         CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)
              * (v_hi - v_lo))) AS BIGINT) AS q_q6
  FROM ex),
iq AS (
  SELECT max(n) AS n, max(mn) AS mn, max(mx) AS mx,
         max(CASE WHEN p_q6 = 750000 THEN q_q6 END)
           - max(CASE WHEN p_q6 = 250000 THEN q_q6 END) AS iqr_q6
  FROM qq)
SELECT n AS n_vals, iqr_q6,
       CAST(round(2.0 * iqr_q6 / cbrt(CAST(n AS DOUBLE))) AS BIGINT) AS fd_width_q6,
       CAST(CASE WHEN round(2.0 * iqr_q6 / cbrt(CAST(n AS DOUBLE))) >= 1
            THEN (1000000 * (mx - mn)
                  + CAST(round(2.0 * iqr_q6 / cbrt(CAST(n AS DOUBLE))) AS BIGINT) - 1)
                 // CAST(round(2.0 * iqr_q6 / cbrt(CAST(n AS DOUBLE))) AS BIGINT)
            ELSE -1 END AS BIGINT) AS fd_n_bins,
       CAST((1000000 * (mx - mn + 1)) // 32 AS BIGINT) AS fixed32_width_q6
FROM iq""",
)
def fd_binwidth_advisor(spark, sf_dir):
    """Freedman-Diaconis histogram bin-width advisor: width = 2·IQR/∛n
    over document character lengths — the statistically-sized answer to
    the bucket-count knob every histogram op in this registry hardcodes
    (quantile_sketch_error's 32 equi-width bins included; the
    fixed-32 width sits beside the FD recommendation so the gap is the
    sizing error). IQR comes from the exact type-7 quartile machinery;
    a degenerate IQR of 0 (half the mass on one value) reports the
    fd_n_bins = −1 sentinel rather than a division blowup.

    Determinism: quartiles are the integer-rank histogram probes with
    ONE shared interpolation expression; cbrt is the engines' shared
    libm cbrt on an exact double; bin count is the exact-ceil integer
    form (x+w−1)//w.

    Scale shape: value-histogram cells only — the doclen_quantiles
    discipline end to end."""
    v = _docs(spark, sf_dir).select(F.col("n_chars").cast("long").alias("val"))
    hist = v.groupBy("val").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cb = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "val",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
        F.min("val").over(w_all).cast("long").alias("mn"),
        F.max("val").over(w_all).cast("long").alias("mx"),
    )
    q = spark.createDataFrame([(250000,), (750000,)], "p_q6 long")
    ex = (
        h.crossJoin(F.broadcast(q))
        .groupBy("p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.max((F.col("n") - 1) * F.col("p_q6")).alias("x"),
            F.max(
                F.when(F.col("cb") <= F.expr("((n - 1) * p_q6) div 1000000"), F.col("val"))
            ).alias("v_lo"),
            F.max(
                F.when(
                    F.col("cb") <= F.expr("((n - 1) * p_q6) div 1000000 + 1"),
                    F.col("val"),
                )
            ).alias("v_hi"),
        )
    )
    qq = ex.select(
        "p_q6",
        "n",
        "mn",
        "mx",
        F.expr(
            "CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)"
            " * (v_hi - v_lo))) AS BIGINT)"
        ).alias("q_q6"),
    )
    iq = qq.agg(
        F.max("n").alias("n"),
        F.max("mn").alias("mn"),
        F.max("mx").alias("mx"),
        (
            F.max(F.when(F.col("p_q6") == 750000, F.col("q_q6")))
            - F.max(F.when(F.col("p_q6") == 250000, F.col("q_q6")))
        ).alias("iqr_q6"),
    )
    wexpr = "round(2.0 * iqr_q6 / cbrt(CAST(n AS DOUBLE)))"
    return iq.select(
        F.col("n").alias("n_vals"),
        "iqr_q6",
        F.expr(f"CAST({wexpr} AS BIGINT)").alias("fd_width_q6"),
        F.expr(
            f"CAST(CASE WHEN {wexpr} >= 1"
            f" THEN (1000000 * (mx - mn) + CAST({wexpr} AS BIGINT) - 1)"
            f" div CAST({wexpr} AS BIGINT)"
            f" ELSE -1 END AS BIGINT)"
        ).alias("fd_n_bins"),
        F.expr("CAST((1000000 * (mx - mn + 1)) div 32 AS BIGINT)").alias(
            "fixed32_width_q6"
        ),
    )


# ---------------------------------------------------------------------------
# session 204 — CEP negation pattern, Davies-Bouldin index, mix rebalance
# ---------------------------------------------------------------------------


@register(
    "cep_pattern_match",
    """WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
  FROM events),
f AS (
  SELECT user_id, us, event_type, rn,
         first_value(CASE WHEN event_type = 'purchase' THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_us,
         first_value(CASE WHEN event_type = 'purchase' THEN rn END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_rn,
         first_value(CASE WHEN event_type = 'error' THEN rn END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS e_rn
  FROM e),
v AS (
  SELECT CASE WHEN p_us IS NOT NULL AND p_us - us <= 3600000000
              THEN 1 ELSE 0 END AS conv,
         CASE WHEN p_us IS NOT NULL AND p_us - us <= 3600000000
                   AND (e_rn IS NULL OR e_rn > p_rn)
              THEN 1 ELSE 0 END AS clean
  FROM f WHERE event_type = 'view')
SELECT CAST(count(*) AS BIGINT) AS n_views,
       CAST(COALESCE(sum(conv), 0) AS BIGINT) AS n_converted_1h,
       CAST(COALESCE(sum(clean), 0) AS BIGINT) AS n_matched,
       CAST(COALESCE(sum(conv), 0) - COALESCE(sum(clean), 0) AS BIGINT)
         AS n_blocked_by_error,
       CAST((1000000 * COALESCE(sum(clean), 0)) // greatest(count(*), 1) AS BIGINT)
         AS match_q6
FROM v""",
)
def cep_pattern_match(spark, sf_dir):
    """Complex-event-processing NEGATION pattern: view → purchase within
    1 hour with NO error event strictly between — the Flink
    CEP / MATCH_RECOGNIZE shape (A followed-by B within T, notFollowedBy
    C) that plain funnels cannot express: events_funnel counts the
    purchase-after-view, this op additionally vetoes matches where an
    error interposed, and reports how many conversions the interposing
    errors blocked (the SRE number connecting error_rate_daily to lost
    revenue). 'Between' is defined on the per-user total order
    (ts, event_id), so equal-timestamp races resolve identically in
    both engines.

    Determinism: next-purchase/next-error are first_value(IGNORE NULLS)
    over strictly-following rows (the events_asof_forward machinery);
    interposition compares row NUMBERS, not timestamps, so ties are
    order-exact.

    Scale shape: all three lookaheads share ONE user-keyed window sort
    (the sessionization exchange); the match rollup is map-side."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    e2 = e.select(
        "user_id",
        "us",
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    )
    f = e2.select(
        "event_type",
        "us",
        F.first(
            F.when(F.col("event_type") == "purchase", F.col("us")), ignorenulls=True
        )
        .over(wf)
        .alias("p_us"),
        F.first(
            F.when(F.col("event_type") == "purchase", F.col("rn")), ignorenulls=True
        )
        .over(wf)
        .alias("p_rn"),
        F.first(
            F.when(F.col("event_type") == "error", F.col("rn")), ignorenulls=True
        )
        .over(wf)
        .alias("e_rn"),
    )
    v = f.where(F.col("event_type") == "view").select(
        F.expr(
            "CASE WHEN p_us IS NOT NULL AND p_us - us <= 3600000000"
            " THEN 1 ELSE 0 END"
        ).alias("conv"),
        F.expr(
            "CASE WHEN p_us IS NOT NULL AND p_us - us <= 3600000000"
            " AND (e_rn IS NULL OR e_rn > p_rn) THEN 1 ELSE 0 END"
        ).alias("clean"),
    )
    return v.agg(
        F.count(F.lit(1)).cast("long").alias("n_views"),
        F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("n_converted_1h"),
        F.coalesce(F.sum("clean"), F.lit(0)).cast("long").alias("n_matched"),
        (
            F.coalesce(F.sum("conv"), F.lit(0)) - F.coalesce(F.sum("clean"), F.lit(0))
        )
        .cast("long")
        .alias("n_blocked_by_error"),
        F.expr(
            "CAST((1000000 * COALESCE(sum(clean), 0))"
            " div greatest(count(*), 1) AS BIGINT)"
        ).alias("match_q6"),
    )


@register(
    "ivf_davies_bouldin",
    _KMEANS_SQL_PRELUDE
    + """, mc AS (
  SELECT a3.cid,
         CAST(round(1000000 * list_dot_product(e.v, c.cv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))) AS BIGINT) AS cos_q6
  FROM e JOIN a3 USING (vec_id) JOIN cent2 c ON c.cid = a3.cid),
sc AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         CAST(CAST(sum(1000000 - cos_q6) AS BIGINT) // count(*) AS BIGINT) AS s_q6
  FROM mc GROUP BY cid),
cm AS (
  SELECT ci.cid AS ca, cj.cid AS cb_,
         CAST(1000000 - round(1000000 * list_dot_product(ci.cv, cj.cv)
           / (sqrt(list_dot_product(ci.cv, ci.cv)) * sqrt(list_dot_product(cj.cv, cj.cv))))
           AS BIGINT) AS m_q6
  FROM cent2 ci JOIN cent2 cj ON ci.cid <> cj.cid),
rr AS (
  SELECT si.cid,
         CAST(round(1000000 * CAST(si.s_q6 + sj.s_q6 AS DOUBLE)
              / greatest(cm.m_q6, 1)) AS BIGINT) AS ratio_q6,
         cm.cb_ AS other_cid
  FROM sc si JOIN cm ON cm.ca = si.cid JOIN sc sj ON sj.cid = cm.cb_),
best AS (
  SELECT cid, ratio_q6, other_cid FROM (
    SELECT cid, ratio_q6, other_cid,
           row_number() OVER (PARTITION BY cid
                              ORDER BY ratio_q6 DESC, other_cid ASC) AS rn
    FROM rr) _r WHERE rn = 1)
SELECT sc.cid, sc.n_members, sc.s_q6,
       best.other_cid AS worst_other_cid, best.ratio_q6 AS r_q6
FROM sc JOIN best USING (cid) ORDER BY sc.cid""",
)
def ivf_davies_bouldin(spark, sf_dir):
    """Davies-Bouldin cluster-validity index over the shared trained IVF
    (cosine-distance form): per cell, intra-cluster scatter S = mean
    (1 − cos(v, centroid)) and R = max over other cells of
    (S_i + S_j)/M_ij with M_ij = centroid-pair distance — the canonical
    'are these clusters compact AND separated' number (mean R over
    cells IS the DB index; per-cell rows also NAME each cell's worst
    neighbor, which is exactly where nprobe multiprobing leaks).
    Completes the cluster-quality family: ivf_cluster_balance audits
    compactness alone, ivf_centroid_matrix separation alone, this is
    their ratio.

    Determinism: per-member cosines q6-rounded FIRST (the
    ivf_cluster_balance rule), S is an integer floor-mean, M from the
    K×K centroid table with a greatest(·,1) zero-distance guard, the
    argmax over quantized ratios tiebreaks on the other cell's id
    (Spark: map-side max(struct) — the search_collapse rule; oracle
    windows).

    Scale shape: one broadcast-centroid join for the member scatter
    (K cells out), then everything runs on K-row / K²-row tables."""
    members, cent, final_assign = _trained_ivf(spark, sf_dir)
    mc = (
        members.join(final_assign, "vec_id")
        .join(F.broadcast(cent), "cid")
        .select("cid", _cosq("v", "cv", 1_000_000).alias("cos_q6"))
    )
    sc = mc.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.expr(
            "CAST(CAST(sum(1000000 - cos_q6) AS BIGINT) div count(*) AS BIGINT)"
        ).alias("s_q6"),
    )
    ci = cent.select(F.col("cid").alias("ca"), F.col("cv").alias("cva"))
    cj = cent.select(F.col("cid").alias("cb_"), F.col("cv").alias("cvb"))
    cm = (
        ci.join(cj, F.col("ca") != F.col("cb_"))
        .select(
            "ca",
            "cb_",
            (F.lit(1_000_000) - _cosq("cva", "cvb", 1_000_000))
            .cast("long")
            .alias("m_q6"),
        )
    )
    si = sc.select(F.col("cid").alias("ca"), F.col("s_q6").alias("sa"))
    sj = sc.select(F.col("cid").alias("cb_"), F.col("s_q6").alias("sb"))
    rr = (
        cm.join(si, "ca")
        .join(sj, "cb_")
        .select(
            F.col("ca").alias("cid"),
            F.expr(
                "CAST(round(1000000 * CAST(sa + sb AS DOUBLE)"
                " / greatest(m_q6, 1)) AS BIGINT)"
            ).alias("ratio_q6"),
            F.col("cb_").alias("other_cid"),
        )
    )
    best = (
        rr.groupBy("cid")
        .agg(F.max(F.struct("ratio_q6", F.expr("-other_cid").alias("no"))).alias("t"))
        .select(
            "cid",
            F.col("t.ratio_q6").alias("r_q6"),
            (-F.col("t.no")).cast("long").alias("worst_other_cid"),
        )
    )
    return (
        sc.join(best, "cid")
        .select("cid", "n_members", "s_q6", "worst_other_cid", "r_q6")
        .orderBy("cid")
    )


@register(
    "mix_rebalance_cost",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
s AS (SELECT source, CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS cur FROM t GROUP BY source),
w AS (SELECT source, cur,
             CAST(round(pow(cur, 7e-1)) AS BIGINT) AS w0
      FROM s),
tot AS (SELECT CAST(COALESCE(sum(cur), 0) AS BIGINT) AS tt,
               CAST(COALESCE(sum(w0), 0) AS BIGINT) AS tw FROM w),
sh AS (SELECT w.source, w.cur,
              CAST((1000000 * w.w0) // greatest(tot.tw, 1) AS BIGINT) AS share_q6,
              tot.tt
       FROM w CROSS JOIN tot)
SELECT source, cur AS cur_tokens,
       CAST((tt * share_q6) // 1000000 AS BIGINT) AS target_tokens,
       CAST(greatest(cur - (tt * share_q6) // 1000000, 0) AS BIGINT) AS surplus_tokens,
       CAST(greatest((tt * share_q6) // 1000000 - cur, 0) AS BIGINT) AS deficit_tokens
FROM sh ORDER BY source""",
)
def mix_rebalance_cost(spark, sf_dir):
    """Temperature-mix rebalancing cost: per source, the CURRENT token
    mass versus the TARGET mass implied by the n^0.7 temperature shares
    (temperature_mix_weights' exponent), with the surplus (tokens to
    down-sample away) and deficit (tokens to up-sample or acquire) —
    Σ surplus IS the minimum data movement to hit the target mix, the
    number that prices an epoch-plan change before anyone reshuffles a
    corpus (the mix-side sibling of shard_rebalance_cost, which prices
    PLACEMENT movement).

    Determinism: weights rounded to INTEGER per source first (pow
    exponent in e-notation; q0 not q6 — shares go through a q6
    intermediate and 1e6·w_q6 would pass 2^63 at ~1e12-token sources),
    then target = (total · share_q6) div 1e6 — every product stays
    under 2^63 at 100 TB; targets sum to ≤ total, the ≤ is rounding
    residue.

    Scale shape: one map-side token count per source (|sources| cells),
    then scalar math against the 1-row totals."""
    t = _docs(spark, sf_dir).select(
        "source", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    s = t.groupBy("source").agg(
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("cur")
    )
    w = s.select(
        "source",
        "cur",
        F.expr("CAST(round(pow(cur, 7e-1)) AS BIGINT)").alias("w0"),
    )
    tot = w.agg(
        F.coalesce(F.sum("cur"), F.lit(0)).cast("long").alias("tt"),
        F.coalesce(F.sum("w0"), F.lit(0)).cast("long").alias("tw"),
    )
    sh = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "cur",
        F.expr("CAST((1000000 * w0) div greatest(tw, 1) AS BIGINT)").alias("share_q6"),
        "tt",
    )
    return sh.select(
        "source",
        F.col("cur").alias("cur_tokens"),
        F.expr("CAST((tt * share_q6) div 1000000 AS BIGINT)").alias("target_tokens"),
        F.expr(
            "CAST(greatest(cur - (tt * share_q6) div 1000000, 0) AS BIGINT)"
        ).alias("surplus_tokens"),
        F.expr(
            "CAST(greatest((tt * share_q6) div 1000000 - cur, 0) AS BIGINT)"
        ).alias("deficit_tokens"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# session 205 — blocked fuzzy ER join, switchback readout, selectivity
# histogram accuracy
# ---------------------------------------------------------------------------


@register(
    "part_name_fuzzy_pairs",
    """WITH p AS (
  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS bk FROM part),
pr AS (
  SELECT levenshtein(a.p_name, b.p_name) AS d
  FROM p a JOIN p b ON a.bk = b.bk AND a.p_partkey < b.p_partkey),
r AS (SELECT d, CAST(count(*) AS BIGINT) AS n_pairs FROM pr
      WHERE d BETWEEN 1 AND 3 GROUP BY d),
spine AS (SELECT unnest(generate_series(1, 3)) AS d)
SELECT CAST(spine.d AS BIGINT) AS edit_distance,
       CAST(COALESCE(r.n_pairs, 0) AS BIGINT) AS n_pairs
FROM spine LEFT JOIN r ON r.d = spine.d ORDER BY edit_distance""",
)
def part_name_fuzzy_pairs(spark, sf_dir):
    """Blocked fuzzy entity resolution on the catalog: candidate part
    pairs whose names sit within edit distance 1-3, generated through a
    first-token blocking key so the quadratic comparison only runs
    INSIDE blocks — the classic ER join shape (block → compare →
    survive), the fuzzy completion of catalog_name_collisions' exact
    md5 groups (typo'd re-listings that exact hashing can never find).
    Distance 0 is excluded (that op owns it); the 3-row spine keeps
    empty distances reporting so a clean catalog reads as zeros, not
    missing rows.

    Determinism: levenshtein() is exact and identical in both engines
    (the fuzzy_prefix_curve precedent); ordered pairs by key.

    Scale shape: the block key bounds the self-join — comparisons are
    Σ|block|², never |catalog|²; at larger catalogs the key widens to
    the first two tokens (documented knob, same plan)."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey",
        "p_name",
        F.expr("split(p_name, ' ')[0]").alias("bk"),
    )
    a = p.alias("a")
    b = p.alias("b")
    pr = a.join(
        b,
        (F.col("a.bk") == F.col("b.bk"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(F.expr("levenshtein(a.p_name, b.p_name)").alias("d"))
    r = (
        pr.where((F.col("d") >= 1) & (F.col("d") <= 3))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    spine = spark.createDataFrame([(1,), (2,), (3,)], "d int")
    return (
        spine.join(r, "d", "left")
        .select(
            F.col("d").cast("long").alias("edit_distance"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        )
        .orderBy("edit_distance")
    )


@register(
    "switchback_readout",
    """WITH e AS (
  SELECT user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         (epoch_us(ts) // 3600000000) % 2 AS arm
  FROM events),
per AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_events,
         CAST(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_purchases,
         CAST(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END), 0)
              AS BIGINT) AS purchase_cents,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM e GROUP BY arm),
bothd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_both FROM (
    SELECT user_id FROM e GROUP BY user_id HAVING count(DISTINCT arm) = 2) _u)
SELECT CAST(per.arm AS BIGINT) AS arm, per.n_events, per.n_purchases,
       CAST((1000000 * per.n_purchases) // greatest(per.n_events, 1) AS BIGINT)
         AS purchase_rate_q6,
       per.purchase_cents, per.n_users, bothd.n_both AS n_cross_arm_users
FROM per CROSS JOIN bothd ORDER BY arm""",
)
def switchback_readout(spark, sf_dir):
    """Switchback (time-sliced) experiment readout: arms alternate by
    epoch HOUR parity instead of by user — the design marketplaces use
    when user-level randomization leaks through shared inventory.
    Per-arm event/purchase/revenue totals plus the diagnostic that
    makes or breaks the design: how many users appear in BOTH arms
    (cross-arm users carry interference and within-user correlation;
    a high count says the analysis needs cluster-robust errors, not
    the iid z-test). Completes the A/B family's assignment axis:
    ab_assignment_readout randomizes by USER hash, this by TIME slice.

    Determinism: hour parity is exact integer arithmetic on event-time
    micros (nonneg — epoch dates); conditional BIGINT sums.

    Scale shape: one map-side pass per arm cell; the cross-arm census
    is a user-keyed distinct-arm count (the engine's one user
    exchange)."""
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "(unix_micros(cast(ts as timestamp)) div 3600000000) % 2"
        ).alias("arm"),
    )
    per = e.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_purchases"),
        F.coalesce(
            F.sum(
                F.expr("CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("purchase_cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    both = (
        e.groupBy("user_id")
        .agg(F.countDistinct("arm").alias("na"))
        .where(F.col("na") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("n_cross_arm_users"))
    )
    return (
        per.crossJoin(both)
        .select(
            F.col("arm").cast("long").alias("arm"),
            "n_events",
            "n_purchases",
            F.expr(
                "CAST((1000000 * n_purchases) div greatest(n_events, 1) AS BIGINT)"
            ).alias("purchase_rate_q6"),
            "purchase_cents",
            "n_users",
            "n_cross_arm_users",
        )
        .orderBy("arm")
    )


# canned range predicates on lineitem extended price, in exact cents
_RSH_RANGES = [(1, 1000000, 3000000), (2, 3000000, 6000000), (3, 6000000, 9000000)]


@register(
    "range_selectivity_histograms",
    f"""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
st2 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(min(c) AS BIGINT) AS mn,
               CAST(max(c) AS BIGINT) AS mx FROM v),
bh AS (
  SELECT least(15, ((v.c - st2.mn) * 16) // (st2.mx - st2.mn + 1)) AS b,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v, st2 GROUP BY 1),
rngs AS (SELECT * FROM (VALUES {", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _RSH_RANGES)})
         _r(rid, lo, hi)),
ex AS (
  SELECT r.rid, CAST(COALESCE(sum(CASE WHEN v.c >= r.lo AND v.c <= r.hi
                                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS exact_rows
  FROM rngs r LEFT JOIN v ON TRUE GROUP BY r.rid),
ew AS (
  SELECT r.rid,
         CAST(COALESCE(sum(round(1000000 * (CAST(bh.cnt AS DOUBLE)
           * greatest(least(st2.mn + ((bh.b + 1) * (st2.mx - st2.mn + 1)) // 16, r.hi + 1)
                      - greatest(st2.mn + (bh.b * (st2.mx - st2.mn + 1)) // 16, r.lo), 0))
           / greatest(st2.mn + ((bh.b + 1) * (st2.mx - st2.mn + 1)) // 16
                      - (st2.mn + (bh.b * (st2.mx - st2.mn + 1)) // 16), 1))), 0)
           AS BIGINT) AS ew_est_q6
  FROM rngs r CROSS JOIN st2 LEFT JOIN bh ON TRUE GROUP BY r.rid),
un AS (
  SELECT r.rid,
         CAST(round(1000000 * (CAST(st2.n AS DOUBLE)
           * greatest(least(st2.mx, r.hi) - greatest(st2.mn, r.lo) + 1, 0))
           / (st2.mx - st2.mn + 1)) AS BIGINT) AS uniform_est_q6
  FROM rngs r CROSS JOIN st2)
SELECT CAST(rngs.rid AS BIGINT) AS range_id,
       CAST(rngs.lo AS BIGINT) AS lo_cents, CAST(rngs.hi AS BIGINT) AS hi_cents,
       ex.exact_rows,
       CAST(un.uniform_est_q6 // 1000000 AS BIGINT) AS uniform_est_rows,
       CAST(ew.ew_est_q6 // 1000000 AS BIGINT) AS ew16_est_rows
FROM rngs JOIN ex ON ex.rid = rngs.rid
JOIN ew ON ew.rid = rngs.rid JOIN un ON un.rid = rngs.rid
ORDER BY range_id""",
)
def range_selectivity_histograms(spark, sf_dir):
    """Optimizer selectivity-estimation accuracy: three canned price
    range predicates estimated (a) with NO statistics — uniform over
    [min, max], what an optimizer does before ANALYZE — and (b) with a
    16-bucket equi-width histogram (uniform within bucket), against the
    exact row count. The gap between the two estimates and truth is
    the concrete argument for collecting column histograms before
    trusting join ordering and filter pushdown decisions on this data
    (join_size_estimates/join_histogram_estimate tell the JOIN side of
    this story; this is the PREDICATE side the pair was missing).

    Determinism: bucket boundaries are pure integer divisions of the
    exact [min, max] span; per-bucket overlaps are integer clamps;
    each bucket's fractional contribution is ONE shared double
    expression q6-rounded FIRST then BIGINT-summed (no float sum
    order), floored to whole rows at the end.

    Scale shape: one map-side histogram pass (16 cells + 1-row stats);
    the estimates run on 3×16 joined cells."""
    v = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c")
    )
    st2 = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("c").cast("long").alias("mn"),
        F.max("c").cast("long").alias("mx"),
    )
    bh = (
        v.crossJoin(F.broadcast(st2))
        .groupBy(
            F.expr("least(15, ((c - mn) * 16) div (mx - mn + 1))").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rngs = spark.createDataFrame(_RSH_RANGES, "rid int, lo long, hi long")
    ex = (
        F.broadcast(rngs)
        .crossJoin(v)
        .groupBy("rid")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi")),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("exact_rows")
        )
    )
    ew = (
        F.broadcast(rngs)
        .crossJoin(F.broadcast(st2))
        .crossJoin(bh)
        .groupBy("rid")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "round(1000000 * (CAST(cnt AS DOUBLE)"
                        " * greatest(least(mn + ((b + 1) * (mx - mn + 1)) div 16, hi + 1)"
                        "            - greatest(mn + (b * (mx - mn + 1)) div 16, lo), 0))"
                        " / greatest(mn + ((b + 1) * (mx - mn + 1)) div 16"
                        "            - (mn + (b * (mx - mn + 1)) div 16), 1))"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("ew_est_q6")
        )
    )
    un = (
        F.broadcast(rngs)
        .crossJoin(st2)
        .select(
            "rid",
            F.expr(
                "CAST(round(1000000 * (CAST(n AS DOUBLE)"
                " * greatest(least(mx, hi) - greatest(mn, lo) + 1, 0))"
                " / (mx - mn + 1)) AS BIGINT)"
            ).alias("uniform_est_q6"),
        )
    )
    return (
        rngs.join(ex, "rid")
        .join(ew, "rid")
        .join(un, "rid")
        .select(
            F.col("rid").cast("long").alias("range_id"),
            F.col("lo").alias("lo_cents"),
            F.col("hi").alias("hi_cents"),
            "exact_rows",
            F.expr("CAST(uniform_est_q6 div 1000000 AS BIGINT)").alias(
                "uniform_est_rows"
            ),
            F.expr("CAST(ew_est_q6 div 1000000 AS BIGINT)").alias("ew16_est_rows"),
        )
        .orderBy("range_id")
    )


# ---------------------------------------------------------------------------
# session 206 — weighted Jaccard, date-partition advisor, exposure fairness
# ---------------------------------------------------------------------------


@register(
    "weighted_jaccard_pairs",
    _SQL_LSH_PAIRS
    + f""",
tf AS ({SQL_TF}),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
sm AS (
  SELECT p.doc_a, p.doc_b,
         CAST(COALESCE(sum(least(ta.tf, tb.tf)), 0) AS BIGINT) AS smin
  FROM pairs p
  JOIN tf ta ON ta.doc_id = p.doc_a
  JOIN tf tb ON tb.doc_id = p.doc_b AND tb.term = ta.term
  GROUP BY p.doc_a, p.doc_b)
SELECT p.doc_a, p.doc_b,
       CAST(COALESCE(sm.smin, 0) AS BIGINT) AS min_mass,
       CAST(da.dl + db.dl - COALESCE(sm.smin, 0) AS BIGINT) AS max_mass,
       CAST((1000000 * COALESCE(sm.smin, 0))
            // greatest(da.dl + db.dl - COALESCE(sm.smin, 0), 1) AS BIGINT)
         AS wjaccard_q6
FROM pairs p
JOIN dl da ON da.doc_id = p.doc_a
JOIN dl db ON db.doc_id = p.doc_b
LEFT JOIN sm ON sm.doc_a = p.doc_a AND sm.doc_b = p.doc_b
ORDER BY p.doc_a, p.doc_b""",
)
def weighted_jaccard_pairs(spark, sf_dir):
    """Weighted (multiset) Jaccard over the LSH candidate pairs:
    Σ_t min(tf_a, tf_b) / Σ_t max(tf_a, tf_b) — the tf-aware
    similarity that set Jaccard (lsh_candidate_precision's verifier)
    flattens: a doc and its doubled concatenation have set-J = 1 but
    weighted-J = ½, exactly the repetition-inflated near-dups a
    training-data dedup wants to treat differently. Σmax needs no max
    join at all — Σmax = dl_a + dl_b − Σmin (min is 0 off the shared
    vocab), so only SHARED terms are joined.

    Determinism: exact BIGINT masses, one integer cross-multiplied
    division; ordered pair keys.

    Scale shape: the per-term join fans candidates × shared vocab only
    (the candidates-then-exact discipline); doc lengths come from tf's
    own exchange."""
    pairs = (
        _lsh_pair_edges(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    )
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()  # dl + both pair legs consume it
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    ta = tf.select(
        F.col("doc_id").alias("doc_a"), F.col("term"), F.col("tf").alias("tfa")
    )
    tb = tf.select(
        F.col("doc_id").alias("doc_b"), F.col("term"), F.col("tf").alias("tfb")
    )
    sm = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.coalesce(F.sum(F.least("tfa", "tfb")), F.lit(0))
            .cast("long")
            .alias("smin")
        )
    )
    da = dl.select(F.col("doc_id").alias("doc_a"), F.col("dl").alias("dla"))
    db = dl.select(F.col("doc_id").alias("doc_b"), F.col("dl").alias("dlb"))
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .join(sm, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("smin", F.lit(0)).cast("long").alias("min_mass"),
            (F.col("dla") + F.col("dlb") - F.coalesce("smin", F.lit(0)))
            .cast("long")
            .alias("max_mass"),
            F.expr(
                "CAST((1000000 * COALESCE(smin, 0))"
                " div greatest(dla + dlb - COALESCE(smin, 0), 1) AS BIGINT)"
            ).alias("wjaccard_q6"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "date_partition_advisor",
    """WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num,
         CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym
  FROM events),
mx AS (SELECT CAST(max(day_num) AS BIGINT) AS mxd FROM e),
k AS (
  SELECT e.day_num AS kd, e.day_num // 7 AS kw, e.ym AS km,
         CASE WHEN e.day_num > mx.mxd - 7 THEN 1 ELSE 0 END AS recent
  FROM e, mx),
g AS (
  SELECT 'a_day' AS granularity, CAST(count(DISTINCT kd) AS BIGINT) AS n_partitions,
         CAST(count(DISTINCT CASE WHEN recent = 1 THEN kd END) AS BIGINT) AS touched_7d,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM k
  UNION ALL
  SELECT 'b_week', CAST(count(DISTINCT kw) AS BIGINT),
         CAST(count(DISTINCT CASE WHEN recent = 1 THEN kw END) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM k
  UNION ALL
  SELECT 'c_month', CAST(count(DISTINCT km) AS BIGINT),
         CAST(count(DISTINCT CASE WHEN recent = 1 THEN km END) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM k)
SELECT granularity, n_partitions, touched_7d,
       CAST(n_rows // greatest(n_partitions, 1) AS BIGINT) AS mean_rows_per_partition,
       CAST((1000000 * touched_7d) // greatest(n_partitions, 1) AS BIGINT)
         AS touched_share_q6
FROM g ORDER BY granularity""",
)
def date_partition_advisor(spark, sf_dir):
    """Directory-partition granularity advisor for the event table: if
    the lake partitions by DAY vs WEEK vs MONTH, how many partitions
    exist, how many a trailing-7-day query touches, and the mean rows
    per partition — the two failure modes in one table: day partitions
    prune beautifully (touched/total tiny) but breed small files (mean
    rows low); month partitions pack well but a 7-day query reads a
    whole month. This is DIRECTORY-level pruning, the layer ABOVE
    sort_layout/zorder's row-group pruning — real lakehouses tune both.

    Determinism: integer day keys (week = day div 7, an arbitrary but
    fixed epoch alignment; month = y·100+m both engines); the recent
    flag anchors to the dataset max (the storage_tier rule).

    Scale shape: one map-side pass; three conditional distinct-counts
    over calendar-bounded keys."""
    e = _events(spark, sf_dir).select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day_num"
        ),
        F.expr(
            "CAST(year(cast(ts as timestamp)) * 100 + month(cast(ts as timestamp)) AS BIGINT)"
        ).alias("ym"),
    )
    mx = e.agg(F.max("day_num").cast("long").alias("mxd"))
    k = e.crossJoin(F.broadcast(mx)).select(
        F.col("day_num").alias("kd"),
        F.expr("day_num div 7").alias("kw"),
        F.col("ym").alias("km"),
        F.expr("CASE WHEN day_num > mxd - 7 THEN 1 ELSE 0 END").alias("recent"),
    ).localCheckpoint()  # three granularity rollups consume it
    rows = []
    for name, col in [("a_day", "kd"), ("b_week", "kw"), ("c_month", "km")]:
        rows.append(
            k.agg(
                F.countDistinct(col).cast("long").alias("n_partitions"),
                F.countDistinct(
                    F.when(F.col("recent") == 1, F.col(col))
                )
                .cast("long")
                .alias("touched_7d"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            ).select(
                F.lit(name).alias("granularity"),
                "n_partitions",
                "touched_7d",
                "n_rows",
            )
        )
    g = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return g.select(
        "granularity",
        "n_partitions",
        "touched_7d",
        F.expr(
            "CAST(n_rows div greatest(n_partitions, 1) AS BIGINT)"
        ).alias("mean_rows_per_partition"),
        F.expr(
            "CAST((1000000 * touched_7d) div greatest(n_partitions, 1) AS BIGINT)"
        ).alias("touched_share_q6"),
    ).orderBy("granularity")


# rank-exposure weights 1/log2(1+r) for r=1..5, folded to q9 integers
_EXF_W = [1000000000, 630929754, 500000000, 430676558, 386852807]


@register(
    "batch_exposure_fairness",
    f"""WITH tf AS MATERIALIZED ({SQL_TF}),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
q AS (SELECT * FROM (VALUES {_BQ_VALUES}) AS v(qid, term)),
per AS (
  SELECT q.qid, tf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st))) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id)),
agg AS (
  SELECT qid, doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
  FROM per GROUP BY qid, doc_id),
r AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_q6 DESC, doc_id ASC) AS rn
  FROM agg),
wt AS (SELECT * FROM (VALUES {", ".join(f"({i + 1}, {w})" for i, w in enumerate(_EXF_W))})
       _w(rn, w_q9)),
hits AS (
  SELECT d.source, wt.w_q9
  FROM r JOIN wt USING (rn) JOIN documents d USING (doc_id)
  WHERE r.rn <= 5),
expo AS (SELECT source, CAST(count(*) AS BIGINT) AS n_hits,
                CAST(COALESCE(sum(w_q9), 0) AS BIGINT) AS ew
         FROM hits GROUP BY source),
tot AS (SELECT CAST(COALESCE(sum(ew), 0) AS BIGINT) AS tew FROM expo),
cs AS (SELECT source, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY source),
nn AS (SELECT CAST(COALESCE(sum(nd), 0) AS BIGINT) AS tn FROM cs)
SELECT cs.source,
       CAST(COALESCE(expo.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((1000000 * COALESCE(expo.ew, 0)) // greatest(tot.tew, 1) AS BIGINT)
         AS exposure_share_q6,
       CAST((1000000 * cs.nd) // greatest(nn.tn, 1) AS BIGINT) AS corpus_share_q6,
       CAST((1000000 * COALESCE(expo.ew, 0)) // greatest(tot.tew, 1)
            - (1000000 * cs.nd) // greatest(nn.tn, 1) AS BIGINT) AS bias_q6
FROM cs LEFT JOIN expo ON expo.source = cs.source
CROSS JOIN tot CROSS JOIN nn ORDER BY cs.source""",
)
def batch_exposure_fairness(spark, sf_dir):
    """Source-exposure fairness across the canned query batch: each
    top-5 hit earns its source the rank-discounted exposure 1/log2(1+r)
    (the nDCG discount, Python-folded q9 integers), summed over all
    batch queries; the per-source exposure SHARE sits beside the
    corpus share, and their difference is the ranking's source bias —
    the fairness-of-exposure metric (Singh & Joachims style) for the
    retrieval stack. serp_source_diversity scores ONE page by entropy;
    this aggregates position-weighted exposure over a QUERY SET, which
    is what fairness audits actually measure. Zero-exposure sources
    report via the corpus-census spine.

    Determinism: rankings over quantized scores, doc_id tiebreak;
    exposure sums are exact BIGINT (folded weights); shares are
    integer cross-multiplied floor divisions.

    Scale shape: ONE postings pass for the whole batch (the
    bm25_batch_queries plan reused as a building block), the weight
    table broadcasts onto ≤5 rows/query, census + rollup map-side."""
    top = bm25_batch_queries(spark, sf_dir).select("doc_id", "rank")
    wt = F.broadcast(
        spark.createDataFrame(
            [(i + 1, w) for i, w in enumerate(_EXF_W)], "rank long, w_q9 long"
        )
    )
    d = _docs(spark, sf_dir).select("doc_id", "source")
    hits = top.join(wt, "rank").join(d, "doc_id").select("source", "w_q9")
    expo = hits.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.coalesce(F.sum("w_q9"), F.lit(0)).cast("long").alias("ew"),
    )
    tot = expo.agg(
        F.coalesce(F.sum("ew"), F.lit(0)).cast("long").alias("tew")
    )
    cs = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    nn = cs.agg(F.coalesce(F.sum("nd"), F.lit(0)).cast("long").alias("tn"))
    return (
        cs.join(expo, "source", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                "CAST((1000000 * COALESCE(ew, 0)) div greatest(tew, 1) AS BIGINT)"
            ).alias("exposure_share_q6"),
            F.expr("CAST((1000000 * nd) div greatest(tn, 1) AS BIGINT)").alias(
                "corpus_share_q6"
            ),
            F.expr(
                "CAST((1000000 * COALESCE(ew, 0)) div greatest(tew, 1)"
                " - (1000000 * nd) div greatest(tn, 1) AS BIGINT)"
            ).alias("bias_q6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# session 207 — NQC predictor, ERR cascade metric, absorbing-chain steps
# ---------------------------------------------------------------------------


@register(
    "nqc_qpp",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + """,
alls AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(COALESCE(sum(score_q6), 0) AS BIGINT) AS s FROM agg),
tops AS (SELECT CAST(count(*) AS BIGINT) AS nt,
                CAST(COALESCE(sum(score_q6), 0) AS BIGINT) AS s1,
                CAST(COALESCE(sum(score_q6 * score_q6), 0) AS BIGINT) AS s2
         FROM (SELECT score_q6 FROM agg
               ORDER BY score_q6 DESC, doc_id ASC LIMIT 10)),
mm AS (SELECT alls.n, alls.s, tops.nt, tops.s1, tops.s2
       FROM alls CROSS JOIN tops)
SELECT n AS n_matches, nt AS n_top,
       CAST(CASE WHEN nt = 0 OR s = 0 THEN 0
            ELSE round(1000000
              * ((CAST(s2 AS DOUBLE) * nt - CAST(s1 AS DOUBLE) * s1)
                 / (CAST(nt AS DOUBLE) * nt))
              / ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
            END AS BIGINT) AS nqc2_q6
FROM mm""",
)
def nqc_qpp(spark, sf_dir):
    """NQC (Normalized Query Commitment, Shtok et al.) post-retrieval
    query-performance prediction — the FOURTH QPP in the family:
    variance of the top-10 scores normalized by the match-set mean
    score. Clarity reads the top docs' language model, WIG reads the
    score GAP, NQC reads the score SPREAD — a committed (low-variance,
    uniformly high) top-10 predicts an easy query, a scattered one
    predicts drift. Reported in the SQUARED form (variance over
    mean², the t²/extended_stats convention — sqrt reintroduces float
    bits the q6 contract can't carry).

    Determinism: BIGINT sufficient stats off the memoized match set
    (score_q6² ≤ ~4e14·10 — far inside 2^63); one shared float
    expression casting from the FIRST multiply; 0-match and zero-mean
    sentinels.

    Scale shape: a 1-row census + one TakeOrdered top-10 — no new
    corpus passes beyond the memoized match set."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    alls = agg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("score_q6"), F.lit(0)).cast("long").alias("s"),
    )
    tops = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .agg(
            F.count(F.lit(1)).cast("long").alias("nt"),
            F.coalesce(F.sum("score_q6"), F.lit(0)).cast("long").alias("s1"),
            F.coalesce(F.sum(F.col("score_q6") * F.col("score_q6")), F.lit(0))
            .cast("long")
            .alias("s2"),
        )
    )
    return alls.crossJoin(tops).select(
        F.col("n").alias("n_matches"),
        F.col("nt").alias("n_top"),
        F.expr(
            "CAST(CASE WHEN nt = 0 OR s = 0 THEN 0"
            " ELSE round(1000000"
            " * ((CAST(s2 AS DOUBLE) * nt - CAST(s1 AS DOUBLE) * s1)"
            "    / (CAST(nt AS DOUBLE) * nt))"
            " / ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))"
            " END AS BIGINT)"
        ).alias("nqc2_q6"),
    )


def _pow_case(var: str, base: int) -> str:
    """Integer base^var for var in 0..9 as an engine-identical CASE —
    exact BIGINT powers without pow() (libm pow is not guaranteed exact
    even on representable integer results)."""
    branches = " ".join(f"WHEN {k} THEN {base ** k}" for k in range(10))
    return f"CASE {var} {branches} ELSE 0 END"


# ERR denominators r·8^r for r=1..10, folded integers
_ERR_DEN = {r: r * 8 ** r for r in range(1, 11)}


@register(
    "err_eval",
    _bm25_agg_ctes(_NDCG_TERMS)
    + f""",
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk
  FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id,
         CAST(CASE least(count(*), 3) WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END
              AS BIGINT) AS rq
  FROM ({SQL_TOKS}) WHERE term = 'dup' GROUP BY doc_id),
rr AS (
  SELECT ranked.rnk, CAST(COALESCE(rel.rq, 0) AS BIGINT) AS rq
  FROM ranked LEFT JOIN rel USING (doc_id)),
cnts AS (
  SELECT rnk, rq,
         CAST(COALESCE(sum(CASE WHEN rq = 3 THEN 1 ELSE 0 END) OVER (ORDER BY rnk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n5,
         CAST(COALESCE(sum(CASE WHEN rq = 1 THEN 1 ELSE 0 END) OVER (ORDER BY rnk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n7,
         CAST(COALESCE(sum(CASE WHEN rq = 0 THEN 1 ELSE 0 END) OVER (ORDER BY rnk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n8
  FROM rr),
terms AS (
  SELECT rnk, rq,
         ({_pow_case('n5', 5)}) * ({_pow_case('n7', 7)}) * ({_pow_case('n8', 8)})
           AS prod_before
  FROM cnts),
den AS (SELECT * FROM (VALUES {", ".join(f"({r}, {d})" for r, d in _ERR_DEN.items())})
        _d(rnk, dd)),
tq AS (
  SELECT terms.rnk, terms.rq, terms.prod_before,
         CAST(round(1000000000 * CAST(terms.rq * terms.prod_before AS DOUBLE) / den.dd)
              AS BIGINT) AS stop_q9
  FROM terms JOIN den USING (rnk))
SELECT CAST(rnk AS BIGINT) AS rank, rq AS gain_eighths, prod_before,
       stop_q9,
       CAST(sum(stop_q9) OVER (ORDER BY rnk
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS err_cum_q9
FROM tq ORDER BY rank""",
)
def err_eval(spark, sf_dir):
    """Expected Reciprocal Rank (Chapelle et al. 2009) of the BM25
    ranking under the cascade user model: the user scans down, stops at
    rank r with probability R_r·Π_{i<r}(1−R_i), and contributes 1/r —
    the eval-family member that models EXAMINATION (nDCG assumes every
    rank is read; ERR says a satisfying early hit shadows everything
    below, which is why it reacts to top-heavy relevance much harder).
    Graded R from the ndcg_eval gains as exact eighths: R = (2^g−1)/8.

    Determinism: with R in eighths, Π(8−R·8) is an exact BIGINT —
    (8−Rq) ∈ {1,5,7,8}, so the running product is 5^n5·7^n7·8^n8 with
    the exponents as window COUNTS and the powers as engine-identical
    CASE lookups (never libm pow); each stop probability divides once
    by the folded integer r·8^r, q9-rounds FIRST, and the cumulative
    ERR is a BIGINT running sum.

    Scale shape: TakeOrdered top-10, relevance join, then 10-row
    windows."""
    bt = (
        _bm25_match_set(spark, sf_dir, _NDCG_TERMS)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
    )
    ranked = bt.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))
        .cast("long"),
    ).select("doc_id", "rnk")
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(CASE least(count(*), 3) WHEN 1 THEN 1 WHEN 2 THEN 3"
                " ELSE 7 END AS BIGINT)"
            ).alias("rq")
        )
    )
    rr = ranked.join(rel, "doc_id", "left").select(
        "rnk", F.coalesce("rq", F.lit(0)).cast("long").alias("rq")
    )
    wb = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, -1)
    cnts = rr.select(
        "rnk",
        "rq",
        F.coalesce(
            F.sum(F.expr("CASE WHEN rq = 3 THEN 1 ELSE 0 END")).over(wb), F.lit(0)
        )
        .cast("long")
        .alias("n5"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN rq = 1 THEN 1 ELSE 0 END")).over(wb), F.lit(0)
        )
        .cast("long")
        .alias("n7"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN rq = 0 THEN 1 ELSE 0 END")).over(wb), F.lit(0)
        )
        .cast("long")
        .alias("n8"),
    )
    terms = cnts.select(
        "rnk",
        "rq",
        F.expr(
            f"({_pow_case('n5', 5)}) * ({_pow_case('n7', 7)})"
            f" * ({_pow_case('n8', 8)})"
        ).alias("prod_before"),
    )
    den = F.broadcast(
        spark.createDataFrame(
            [(r, d) for r, d in _ERR_DEN.items()], "rnk long, dd long"
        )
    )
    tq = terms.join(den, "rnk").select(
        "rnk",
        "rq",
        "prod_before",
        F.expr(
            "CAST(round(1000000000 * CAST(rq * prod_before AS DOUBLE) / dd)"
            " AS BIGINT)"
        ).alias("stop_q9"),
    )
    wc = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        tq.select(
            F.col("rnk").cast("long").alias("rank"),
            F.col("rq").alias("gain_eighths"),
            "prod_before",
            "stop_q9",
            F.sum("stop_q9").over(wc).cast("long").alias("err_cum_q9"),
        )
        .orderBy("rank")
    )


_MSP_ROUNDS = 8


def _markov_steps_sql() -> str:
    parts = [
        """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
pr AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
           AS prev_type, event_type AS next_type
  FROM t),
c AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM pr WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
p AS MATERIALIZED (
  SELECT prev_type, next_type,
         CAST((1000000 * n_trans)
              // sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS p_q6
  FROM c WHERE prev_type <> 'purchase'),
tr AS MATERIALIZED (SELECT DISTINCT prev_type AS et FROM p),
h0 AS MATERIALIZED (SELECT et, CAST(0 AS BIGINT) AS h_q6, CAST(0 AS BIGINT) AS a_q6
                    FROM tr)"""
    ]
    for r in range(_MSP_ROUNDS):
        parts.append(
            f""",
h{r + 1} AS MATERIALIZED (
  SELECT tr.et,
         CAST(1000000 + COALESCE(hs.hh, 0) AS BIGINT) AS h_q6,
         CAST(COALESCE(pa.pp, 0) + COALESCE(hs.aa, 0) AS BIGINT) AS a_q6
  FROM tr
  LEFT JOIN (
    SELECT p.prev_type AS et,
           CAST(COALESCE(sum(p.p_q6 * h{r}.h_q6), 0) // 1000000 AS BIGINT) AS hh,
           CAST(COALESCE(sum(p.p_q6 * h{r}.a_q6), 0) // 1000000 AS BIGINT) AS aa
    FROM p JOIN h{r} ON h{r}.et = p.next_type
    WHERE p.next_type <> 'purchase'
    GROUP BY p.prev_type) hs ON hs.et = tr.et
  LEFT JOIN (
    SELECT prev_type AS et, CAST(p_q6 AS BIGINT) AS pp
    FROM p WHERE next_type = 'purchase') pa ON pa.et = tr.et)"""
        )
    parts.append(
        f"""
SELECT et AS event_type, h_q6 AS steps_q6, a_q6 AS absorb_q6
FROM h{_MSP_ROUNDS} ORDER BY event_type"""
    )
    return "".join(parts)


@register("markov_steps_to_purchase", _markov_steps_sql())
def markov_steps_to_purchase(spark, sf_dir):
    """Absorbing-chain analytics on the user-journey Markov chain with
    'purchase' as the absorbing state: per transient event type, the
    expected number of events taken within the next 8 steps before
    absorption (h ← 1 + P_t·h, the fundamental-matrix recursion
    truncated at the horizon — h_K = Σ_{k<K} P(T > k), monotone toward
    the true expectation) AND the probability of purchasing within
    those 8 steps (a ← P(·,purchase) + P_t·a). The number marketing
    actually asks of markov_stationary's matrix: 'how far is each state
    from a purchase', not 'where does attention converge'.

    Determinism: the same q6 integer matrix as markov_stationary
    (truncating row normalisation, mass leak declared); both
    recursions are exact BIGINT Σ p·v div 1e6 per round with the +1e6
    / +P(s,purchase) constants; states with no transient outflow keep
    their constant term via LEFT joins.

    Scale shape: one lag-window exchange builds the ≤|types|² matrix;
    each of the 8 rounds joins ≤|types|-row tables (localCheckpoint'd
    per round — the markov_stationary rule); |types|−1 output rows."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    pr = t.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    c = (
        pr.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    wr = Window.partitionBy("prev_type")
    p = (
        c.where(F.col("prev_type") != "purchase")
        .withColumn("tot", F.sum("n_trans").over(wr))
        .select(
            "prev_type",
            "next_type",
            F.expr("(1000000 * n_trans) div tot").cast("long").alias("p_q6"),
        )
        .localCheckpoint()
    )
    tr = p.select(F.col("prev_type").alias("et")).distinct().localCheckpoint()
    pa = p.where(F.col("next_type") == "purchase").select(
        F.col("prev_type").alias("et"), F.col("p_q6").cast("long").alias("pp")
    )
    pt = p.where(F.col("next_type") != "purchase")
    h = tr.select(
        "et", F.lit(0).cast("long").alias("h_q6"), F.lit(0).cast("long").alias("a_q6")
    )
    for _ in range(_MSP_ROUNDS):
        hs = (
            pt.join(h, pt["next_type"] == h["et"])
            .groupBy("prev_type")
            .agg(
                F.expr(
                    "CAST(COALESCE(sum(p_q6 * h_q6), 0) div 1000000 AS BIGINT)"
                ).alias("hh"),
                F.expr(
                    "CAST(COALESCE(sum(p_q6 * a_q6), 0) div 1000000 AS BIGINT)"
                ).alias("aa"),
            )
            .select(F.col("prev_type").alias("et"), "hh", "aa")
        )
        h = (
            tr.join(hs, "et", "left")
            .join(pa, "et", "left")
            .select(
                "et",
                (F.lit(1000000) + F.coalesce("hh", F.lit(0)))
                .cast("long")
                .alias("h_q6"),
                (F.coalesce("pp", F.lit(0)) + F.coalesce("aa", F.lit(0)))
                .cast("long")
                .alias("a_q6"),
            )
            .localCheckpoint()
        )
    return h.select(
        F.col("et").alias("event_type"),
        F.col("h_q6").alias("steps_q6"),
        F.col("a_q6").alias("absorb_q6"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# session 208 — Good-Turing counts, conformal interval, k-anonymity census
# ---------------------------------------------------------------------------


@register(
    "good_turing_counts",
    f"""WITH tf AS ({SQL_TF}),
cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS r FROM tf GROUP BY term),
nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM cf GROUP BY r),
tot AS (SELECT CAST(COALESCE(sum(r * n_r), 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END), 0) AS BIGINT)
                 AS n1
        FROM nr),
spine AS (SELECT unnest(generate_series(1, 8)) AS r),
j AS (
  SELECT spine.r,
         CAST(COALESCE(a.n_r, 0) AS BIGINT) AS n_r,
         CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r1
  FROM spine
  LEFT JOIN nr a ON a.r = spine.r
  LEFT JOIN nr b ON b.r = spine.r + 1)
SELECT CAST(j.r AS BIGINT) AS r, j.n_r, j.n_r1,
       CAST(CASE WHEN j.n_r = 0 THEN 0
            ELSE round(1000000 * (CAST((j.r + 1) * j.n_r1 AS DOUBLE)) / j.n_r)
            END AS BIGINT) AS r_star_q6,
       CAST((1000000 * tot.n1) // greatest(tot.n_tokens, 1) AS BIGINT)
         AS p_unseen_q6
FROM j CROSS JOIN tot ORDER BY r""",
)
def good_turing_counts(spark, sf_dir):
    """Good-Turing frequency re-estimation over the vocabulary: for each
    observed collection frequency r, the adjusted count
    r* = (r+1)·N_{r+1}/N_r from the count-of-counts table, plus the
    unseen-event mass P₀ = N₁/N — the THIRD smoothing family in the
    engine beside Laplace (phrase_suggester) and Kneser-Ney
    (kneser_ney_bigram), and the one that directly converts
    tf_spectrum's raw shape into usable discounts (r* < r at the head
    of a Zipfian spectrum is the discount; N₁/N is exactly what
    hapax_token_share's mass means probabilistically). Empty N_r cells
    report r* = 0 via the 8-row spine (raw GT is undefined there — the
    smoothed-GT fit is the documented production fix).

    Determinism: count-of-counts is exact; one float division per row
    (cast from the first multiply), q6-rounded; P₀ is an integer
    cross-multiplication.

    Scale shape: tf → per-term cf → count-of-counts is two map-combined
    exchanges; everything after runs on spectrum cells."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("r"))
    nr = cf.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r")).localCheckpoint()
    tot = nr.agg(
        F.coalesce(F.sum(F.col("r") * F.col("n_r")), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.col("n_r")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("n1"),
    )
    spine = spark.createDataFrame([(r,) for r in range(1, 9)], "r long")
    a = nr.select(F.col("r"), F.col("n_r").alias("na"))
    b = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("nb"))
    j = (
        spine.join(a, "r", "left")
        .join(b, "r", "left")
        .select(
            "r",
            F.coalesce("na", F.lit(0)).cast("long").alias("n_r"),
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_r1"),
        )
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            "n_r1",
            F.expr(
                "CAST(CASE WHEN n_r = 0 THEN 0"
                " ELSE round(1000000 * (CAST((r + 1) * n_r1 AS DOUBLE)) / n_r)"
                " END AS BIGINT)"
            ).alias("r_star_q6"),
            F.expr(
                "CAST((1000000 * n1) div greatest(n_tokens, 1) AS BIGINT)"
            ).alias("p_unseen_q6"),
        )
        .orderBy("r")
    )


@register(
    "conformal_daily_interval",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
             CAST((spine.day_num + 3) % 7 AS BIGINT) AS dow
      FROM spine LEFT JOIN d USING (day_num)),
m AS (SELECT dow, CAST((1000000 * sum(n)) // count(*) AS BIGINT) AS mean_q6
      FROM f GROUP BY dow),
r AS (SELECT abs(1000000 * f.n - m.mean_q6) AS ar
      FROM f JOIN m USING (dow)),
hist AS (SELECT ar, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY ar),
h AS (
  SELECT ar, cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY ar
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER () AS BIGINT) AS nn
  FROM hist),
q AS (
  SELECT max(nn) AS nn,
         max(CASE WHEN cb <= ((nn - 1) * 900000) // 1000000 THEN ar END) AS v_lo,
         max(CASE WHEN cb <= ((nn - 1) * 900000) // 1000000 + 1 THEN ar END) AS v_hi,
         max((nn - 1) * 900000) AS x
  FROM h),
qq AS (
  SELECT nn,
         CAST(round(v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo)) AS BIGINT)
           AS q90_q6
  FROM q)
SELECT qq.nn AS n_days, qq.q90_q6,
       (SELECT CAST(COALESCE(sum(CASE WHEN r.ar <= qq.q90_q6 THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM r) AS n_covered,
       CAST((1000000 * (SELECT COALESCE(sum(CASE WHEN r.ar <= qq.q90_q6
                                              THEN 1 ELSE 0 END), 0) FROM r))
            // greatest(qq.nn, 1) AS BIGINT) AS coverage_q6
FROM qq""",
)
def conformal_daily_interval(spark, sf_dir):
    """Conformal prediction interval for daily event volume: calibrate
    the 90th percentile of |residual| against the weekday-mean
    predictor (the weekday_adjusted machinery's residuals in exact q6
    space) and report the interval half-width plus its EMPIRICAL
    coverage — the distribution-free alternative to the z-score
    anomaly thresholds (weekday_adjusted_anomaly flags by Gaussian z²;
    a conformal band makes no normality assumption and its coverage is
    checkable, which is what this op does). In-sample calibration
    (the same days calibrate and evaluate) biases coverage slightly
    high — the honest split-conformal form holds out days, documented.

    Determinism: residuals subtract in q6 SPACE (the
    weekly_seasonal_decompose rule — never round a float difference);
    the q90 probe is the integer-rank histogram machinery with one
    shared interpolation; coverage is an integer comparison against
    the rounded q90.

    Scale shape: day-spine cells end to end — weekday means are a
    7-cell agg, the |residual| histogram is calendar-bounded."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day_num"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d, "day_num", "left").select(
        "day_num",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.expr("CAST((day_num + 3) % 7 AS BIGINT)").alias("dow"),
    )
    m = f.groupBy("dow").agg(
        F.expr("CAST((1000000 * sum(n)) div count(*) AS BIGINT)").alias("mean_q6")
    )
    r = f.join(F.broadcast(m), "dow").select(
        F.expr("abs(1000000 * n - mean_q6)").alias("ar")
    ).localCheckpoint()  # quantile probe + coverage count consume it
    hist = r.groupBy("ar").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cb = Window.orderBy("ar").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "ar",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("nn"),
    )
    q = h.agg(
        F.max("nn").alias("nn"),
        F.max(
            F.when(F.col("cb") <= F.expr("((nn - 1) * 900000) div 1000000"), F.col("ar"))
        ).alias("v_lo"),
        F.max(
            F.when(
                F.col("cb") <= F.expr("((nn - 1) * 900000) div 1000000 + 1"),
                F.col("ar"),
            )
        ).alias("v_hi"),
        F.max(F.expr("(nn - 1) * 900000")).alias("x"),
    )
    qq = q.select(
        "nn",
        F.expr(
            "CAST(round(v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo)) AS BIGINT)"
        ).alias("q90_q6"),
    )
    rj = r.crossJoin(F.broadcast(qq)).agg(
        F.coalesce(
            F.sum(F.expr("CASE WHEN ar <= q90_q6 THEN 1 ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("n_covered")
    )
    return (
        qq.crossJoin(rj)
        .select(
            F.col("nn").alias("n_days"),
            "q90_q6",
            "n_covered",
            F.expr(
                "CAST((1000000 * n_covered) div greatest(nn, 1) AS BIGINT)"
            ).alias("coverage_q6"),
        )
    )


@register(
    "k_anonymity_census",
    """WITH d AS (
  SELECT source, lang,
         least(15, length(bin(greatest(n_chars, 1))) - 1) AS lb
  FROM documents),
cls AS (SELECT source, lang, lb, CAST(count(*) AS BIGINT) AS sz
        FROM d GROUP BY source, lang, lb),
tot AS (SELECT CAST(COALESCE(sum(sz), 0) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(COALESCE(min(sz), 0) AS BIGINT) AS min_class
        FROM cls),
ks AS (SELECT k FROM (VALUES (2), (5), (10)) _k(k))
SELECT CAST(ks.k AS BIGINT) AS k,
       tot.n_classes, tot.min_class,
       CAST(COALESCE((SELECT sum(sz) FROM cls WHERE sz < ks.k), 0) AS BIGINT)
         AS n_violating_docs,
       CAST((1000000 * COALESCE((SELECT sum(sz) FROM cls WHERE sz < ks.k), 0))
            // greatest(tot.n, 1) AS BIGINT) AS violating_share_q6
FROM ks CROSS JOIN tot ORDER BY k""",
)
def k_anonymity_census(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier triple
    (source, lang, log2-length band): a document is k-anonymous when
    ≥ k−1 others share its equivalence class — classes smaller than k
    make their members re-identifiable from metadata alone, the
    privacy lens COMPLEMENTARY to dp_source_counts (DP noise protects
    the RELEASE; k-anonymity measures the RECORDS). Reported at
    k = 2/5/10 with the minimum class size — the single number a
    release gate checks.

    Determinism: integer class keys (the zorder length-bucket trick),
    exact class sizes, integer cross-multiplied shares.

    Scale shape: one map-combined groupBy on the triple (classes are
    bounded by |sources|·|langs|·16); the k spine scans class CELLS."""
    d = _docs(spark, sf_dir).select(
        "source",
        "lang",
        F.expr("least(15, length(bin(greatest(n_chars, 1))) - 1)").alias("lb"),
    )
    cls = d.groupBy("source", "lang", "lb").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    ).localCheckpoint()  # totals + three k probes consume it
    tot = cls.agg(
        F.coalesce(F.sum("sz"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.coalesce(F.min("sz"), F.lit(0)).cast("long").alias("min_class"),
    )
    ks = spark.createDataFrame([(2,), (5,), (10,)], "k long")
    viol = (
        F.broadcast(ks)
        .crossJoin(cls)
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_violating_docs")
        )
    )
    return (
        ks.join(viol, "k", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "n_classes",
            "min_class",
            F.coalesce("n_violating_docs", F.lit(0))
            .cast("long")
            .alias("n_violating_docs"),
            F.expr(
                "CAST((1000000 * COALESCE(n_violating_docs, 0))"
                " div greatest(n, 1) AS BIGINT)"
            ).alias("violating_share_q6"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# session 209 — Neyman allocation, systematic PPS sample, multi-scale Fano
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000


@register(
    "neyman_allocation",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS x
  FROM documents),
s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(x), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(x * x), 0) AS BIGINT) AS s2
      FROM t GROUP BY source),
w AS (SELECT source, n,
             CAST(round(1000000 * sqrt(greatest(
               (CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)
               / (CAST(n AS DOUBLE) * n), 0e0))) AS BIGINT) AS sd_q6,
             CAST(round(CAST(n AS DOUBLE) * sqrt(greatest(
               (CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)
               / (CAST(n AS DOUBLE) * n), 0e0))) AS BIGINT) AS w0
      FROM s),
tot AS (SELECT CAST(COALESCE(sum(w0), 0) AS BIGINT) AS tw FROM w),
base AS (
  SELECT w.source, w.n, w.sd_q6, w.w0,
         CAST(CASE WHEN tot.tw = 0 THEN 0
              ELSE ({_NEYMAN_BUDGET} * w.w0) // tot.tw END AS BIGINT) AS slots0,
         CAST(CASE WHEN tot.tw = 0 THEN 0
              ELSE ({_NEYMAN_BUDGET} * w.w0) % tot.tw END AS BIGINT) AS rem,
         tot.tw
  FROM w CROSS JOIN tot),
need AS (SELECT CAST(CASE WHEN max(tw) = 0 THEN 0
                     ELSE {_NEYMAN_BUDGET} - COALESCE(sum(slots0), 0) END AS BIGINT) AS k
         FROM base),
rk AS (
  SELECT source, n, sd_q6, w0, slots0, rem,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rr
  FROM base)
SELECT source, n AS n_docs, sd_q6, w0,
       CAST(slots0 + CASE WHEN rr <= (SELECT k FROM need) THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_slots
FROM rk ORDER BY source""",
)
def neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified sample allocation: a 1000-document
    audit budget split across sources proportional to N_h·S_h (stratum
    size × token-length standard deviation) — the survey-statistics
    answer to 'where should QA effort go': a big VARIABLE stratum earns
    more samples than a big uniform one, which proportional allocation
    (and every per-source flat quota) gets wrong. Seats are assigned by
    the Hare largest-remainder method (the negative_sampling_table
    machinery), so slots sum EXACTLY to the budget with zero RNG.

    Determinism: variance from exact BIGINT sufficient stats in the
    float-mean form; sqrt is the one IEEE-EXACT-rounded libm function
    (unlike ln/pow), so sd quantizes identically; weights round to q0
    integers before the pure-BIGINT apportionment; all-zero weights
    (single-length strata) allocate 0 via the tw=0 sentinel.

    Scale shape: one map-side per-source stats pass, a 1-row total,
    and a |sources|-row remainder window."""
    t = _docs(spark, sf_dir).select(
        "source", F.size(spark_tokens("text")).cast("long").alias("x")
    )
    s = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    sdexpr = (
        "sqrt(greatest((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)"
        " / (CAST(n AS DOUBLE) * n), 0e0))"
    )
    w = s.select(
        "source",
        "n",
        F.expr(f"CAST(round(1000000 * {sdexpr}) AS BIGINT)").alias("sd_q6"),
        F.expr(f"CAST(round(CAST(n AS DOUBLE) * {sdexpr}) AS BIGINT)").alias("w0"),
    )
    tot = w.agg(F.coalesce(F.sum("w0"), F.lit(0)).cast("long").alias("tw"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "sd_q6",
        "w0",
        F.expr(
            f"CAST(CASE WHEN tw = 0 THEN 0"
            f" ELSE ({_NEYMAN_BUDGET} * w0) div tw END AS BIGINT)"
        ).alias("slots0"),
        F.expr(
            f"CAST(CASE WHEN tw = 0 THEN 0"
            f" ELSE ({_NEYMAN_BUDGET} * w0) % tw END AS BIGINT)"
        ).alias("rem"),
        "tw",
    ).localCheckpoint()  # need + ranked selection consume it
    need = base.agg(
        F.expr(
            f"CAST(CASE WHEN max(tw) = 0 THEN 0"
            f" ELSE {_NEYMAN_BUDGET} - COALESCE(sum(slots0), 0) END AS BIGINT)"
        ).alias("k")
    )
    rk = base.withColumn(
        "rr", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source")))
    )
    return (
        rk.crossJoin(F.broadcast(need))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "sd_q6",
            "w0",
            F.expr(
                "CAST(slots0 + CASE WHEN rr <= k THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("alloc_slots"),
        )
        .orderBy("source")
    )


_PPS_STRIDES = 10


@register(
    "systematic_pps_sample",
    f"""WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(sum(n_tok) OVER (PARTITION BY source) AS BIGINT) AS w
  FROM t),
ks AS (SELECT unnest(generate_series(0, {_PPS_STRIDES - 1})) AS k)
SELECT c.source, CAST(ks.k AS BIGINT) AS stride, c.doc_id, c.n_tok
FROM c JOIN ks
  ON {2 * _PPS_STRIDES} * c.cum_before < (2 * ks.k + 1) * c.w
 AND (2 * ks.k + 1) * c.w <= {2 * _PPS_STRIDES} * (c.cum_before + c.n_tok)
ORDER BY c.source, stride""",
)
def systematic_pps_sample(spark, sf_dir):
    """Systematic probability-proportional-to-size sampling (Madow):
    per source, lay the documents end to end on their token axis and
    take {_PPS_STRIDES} equally-spaced picks at the stride midpoints
    (2k+1)·W/(2B) — the OTHER classic PPS sampler beside the A-ES
    independent draws of weighted_sample_docs: strided selection has
    zero between-stride variance (every token neighborhood is hit
    exactly once per W/B tokens), which is why PPS frame audits use it.
    A document longer than a stride is legitimately picked by several
    consecutive strides — that IS pps, documented. Zero-token documents
    have zero width and can never be selected.

    Determinism: pick conditions are exact integer
    cross-multiplications against the exclusive prefix sum; no RNG
    anywhere (the midpoint start replaces the random offset, the
    reproducibility trade survey samplers make for audits).

    Scale shape (Spark): the prefix sum is the shared sub-sharded
    two-pass `_pack_cum_before` (never a whole-source window on one
    reducer — the oracle may window); the stride spine is a
    {_PPS_STRIDES}-row broadcast theta join evaluated map-side."""
    p = _pack_cum_before(spark, sf_dir)
    if p is None:
        return spark.createDataFrame(
            [], "source string, stride long, doc_id long, n_tok long"
        )
    w = p.groupBy("source").agg(F.sum("n_tok").cast("long").alias("w"))
    c = p.join(w, "source")
    ks = spark.createDataFrame([(k,) for k in range(_PPS_STRIDES)], "k long")
    b = 2 * _PPS_STRIDES
    sel = c.join(
        F.broadcast(ks),
        (F.lit(b) * F.col("cum_before") < (2 * F.col("k") + 1) * F.col("w"))
        & ((2 * F.col("k") + 1) * F.col("w") <= F.lit(b) * (F.col("cum_before") + F.col("n_tok"))),
    )
    return sel.select(
        "source",
        F.col("k").cast("long").alias("stride"),
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
    ).orderBy("source", "stride")


@register(
    "fano_factor_scales",
    """WITH e AS (SELECT epoch_us(ts) AS us FROM events),
g AS (
  SELECT scale, width_us, us // width_us AS iv FROM e
  CROSS JOIN (VALUES ('a_minute', 60000000), ('b_hour', 3600000000),
                     ('c_day', 86400000000)) _s(scale, width_us)),
cnt AS (SELECT scale, width_us, iv, CAST(count(*) AS BIGINT) AS n
        FROM g GROUP BY scale, width_us, iv),
b AS (SELECT scale, width_us, CAST(min(iv) AS BIGINT) AS lo, CAST(max(iv) AS BIGINT) AS hi
      FROM cnt GROUP BY scale, width_us),
spine AS (SELECT b.scale, unnest(generate_series(b.lo, b.hi)) AS iv FROM b),
f AS (SELECT spine.scale, spine.iv, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN cnt ON cnt.scale = spine.scale AND cnt.iv = spine.iv),
a AS (SELECT scale, CAST(count(*) AS BIGINT) AS ni,
             CAST(COALESCE(sum(n), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(n * n), 0) AS BIGINT) AS s2
      FROM f GROUP BY scale)
SELECT scale, ni AS n_intervals,
       CAST(round(1000000 * CAST(s1 AS DOUBLE) / ni) AS BIGINT) AS mean_q6,
       CAST(CASE WHEN s1 = 0 THEN 0
            ELSE round(1000000
              * ((CAST(s2 AS DOUBLE) * ni - CAST(s1 AS DOUBLE) * s1)
                 / (CAST(ni AS DOUBLE) * ni))
              / (CAST(s1 AS DOUBLE) / ni)) END AS BIGINT) AS fano_q6
FROM a ORDER BY scale""",
)
def fano_factor_scales(spark, sf_dir):
    """Multi-scale Fano factor (variance/mean of interval counts) at
    minute, hour and day granularity over zero-filled spines — the
    burst-SCALE localizer: a Poisson stream reads 1.0 at every scale;
    a stream whose Fano rises with window width carries positive
    correlation at that timescale (batch writes inflate the minute
    scale, weekly habit inflates the day scale).
    events_dispersion_index reports the day point alone — the three-
    point curve is what actually says WHERE the burstiness lives,
    which fixes the aggregation window monitoring should alarm on.

    Determinism: integer interval keys, zero-filled calendar spines,
    variance in the float-mean form off exact BIGINT sufficient stats
    (every product cast from the FIRST multiply), zero-mean sentinel.

    Scale shape: one map-side pass fans each event to 3 scale keys;
    spines and stats run on calendar-bounded interval cells."""
    e = _events(spark, sf_dir).select(
        F.expr("unix_micros(cast(ts as timestamp))").alias("us")
    )
    scales = spark.createDataFrame(
        [("a_minute", 60000000), ("b_hour", 3600000000), ("c_day", 86400000000)],
        "scale string, width_us long",
    )
    g = e.crossJoin(F.broadcast(scales)).select(
        "scale", F.expr("us div width_us").alias("iv")
    )
    cnt = g.groupBy("scale", "iv").agg(F.count(F.lit(1)).cast("long").alias("n"))
    b = cnt.groupBy("scale").agg(
        F.min("iv").cast("long").alias("lo"), F.max("iv").cast("long").alias("hi")
    )
    spine = b.select("scale", F.explode(F.sequence("lo", "hi")).alias("iv"))
    f = spine.join(cnt, ["scale", "iv"], "left").select(
        "scale", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    a = f.groupBy("scale").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("n") * F.col("n")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    return a.select(
        "scale",
        F.col("ni").alias("n_intervals"),
        F.expr("CAST(round(1000000 * CAST(s1 AS DOUBLE) / ni) AS BIGINT)").alias(
            "mean_q6"
        ),
        F.expr(
            "CAST(CASE WHEN s1 = 0 THEN 0"
            " ELSE round(1000000"
            " * ((CAST(s2 AS DOUBLE) * ni - CAST(s1 AS DOUBLE) * s1)"
            "    / (CAST(ni AS DOUBLE) * ni))"
            " / (CAST(s1 AS DOUBLE) / ni)) END AS BIGINT)"
        ).alias("fano_q6"),
    ).orderBy("scale")


# ---------------------------------------------------------------------------
# session 210 — capture-recapture, jackknife variance, Wasserstein distance
# ---------------------------------------------------------------------------


@register(
    "capture_recapture_vocab",
    f"""WITH toks AS ({SQL_TOKS}),
ev AS (SELECT DISTINCT term FROM toks WHERE doc_id % 2 = 0),
od AS (SELECT DISTINCT term FROM toks WHERE doc_id % 2 = 1),
v1 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ev),
v2 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM od),
v12 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ev JOIN od USING (term)),
vu AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM toks),
est AS (
  SELECT v1.v AS v_even, v2.v AS v_odd, v12.v AS v_shared, vu.v AS v_observed,
         CAST(round((CAST(v1.v + 1 AS DOUBLE) * (v2.v + 1)) / (v12.v + 1)) - 1
              AS BIGINT) AS chapman_est
  FROM v1, v2, v12, vu)
SELECT v_even, v_odd, v_shared, v_observed, chapman_est,
       CAST((1000000 * v_observed) // greatest(chapman_est, 1) AS BIGINT)
         AS coverage_q6
FROM est""",
)
def capture_recapture_vocab(spark, sf_dir):
    """Capture-recapture (Chapman-corrected Lincoln-Petersen) estimate
    of the TOTAL vocabulary from the even/odd document halves: treat
    each half as an independent 'capture' of the term population —
    V̂ = (V₁+1)(V₂+1)/(V₁₂+1) − 1 — the ecology estimator for how many
    types exist that the corpus has NOT yet shown (heaps_law_source
    extrapolates growth from a power-law FIT; capture-recapture needs
    no model, only the overlap, and the two disagreeing is itself
    informative since terms are anything but equal-catchability —
    Zipfian heads are always recaptured, documented caveat). The
    coverage ratio observed/estimated is the 'how much vocabulary have
    we seen' number a crawl-planning decision reads.

    Determinism: exact distinct counts; ONE float division (cast from
    the first multiply), half-away rounding; the even/odd split is the
    idf_split_stability coordinate.

    Scale shape: two half-vocab distinct passes + a vocab-sized
    equi-join — all map-combined exchanges."""
    toks = _toks(_docs(spark, sf_dir)).localCheckpoint()  # 4 consumers
    ev = toks.where(F.col("doc_id") % 2 == 0).select("term").distinct()
    od = toks.where(F.col("doc_id") % 2 == 1).select("term").distinct()
    v1 = ev.agg(F.count(F.lit(1)).cast("long").alias("v_even"))
    v2 = od.agg(F.count(F.lit(1)).cast("long").alias("v_odd"))
    v12 = ev.join(od, "term").agg(F.count(F.lit(1)).cast("long").alias("v_shared"))
    vu = toks.agg(F.countDistinct("term").cast("long").alias("v_observed"))
    est = (
        v1.crossJoin(v2)
        .crossJoin(v12)
        .crossJoin(vu)
        .select(
            "v_even",
            "v_odd",
            "v_shared",
            "v_observed",
            F.expr(
                "CAST(round((CAST(v_even + 1 AS DOUBLE) * (v_odd + 1))"
                " / (v_shared + 1)) - 1 AS BIGINT)"
            ).alias("chapman_est"),
        )
    )
    return est.select(
        "*",
        F.expr(
            "CAST((1000000 * v_observed) div greatest(chapman_est, 1) AS BIGINT)"
        ).alias("coverage_q6"),
    )


@register(
    "jackknife_ttr_variance",
    f"""WITH tf AS ({SQL_TF}),
d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dv, CAST(sum(tf) AS BIGINT) AS nt
      FROM tf GROUP BY doc_id),
g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(dv), 0) AS BIGINT) AS dd,
             CAST(COALESCE(sum(nt), 0) AS BIGINT) AS nn
      FROM d),
r AS (
  SELECT CAST(round(1000000000 * CAST(g.dd - d.dv AS DOUBLE) / (g.nn - d.nt)) AS BIGINT)
           - CAST(round(1000000000 * CAST(g.dd AS DOUBLE) / g.nn) AS BIGINT) AS dev
  FROM d, g WHERE g.nn - d.nt > 0),
a AS (SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(COALESCE(sum(dev), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(dev * dev), 0) AS BIGINT) AS s2
      FROM r)
SELECT g.n AS n_docs,
       CAST(round(1000000000 * CAST(g.dd AS DOUBLE) / greatest(g.nn, 1)) AS BIGINT)
         AS ttr_full_q9,
       a.m AS n_loo,
       CAST(CASE WHEN a.m < 2 THEN 0
            ELSE round(1000000000000 * (CAST(a.m - 1 AS DOUBLE) / a.m)
              * ((CAST(a.s2 AS DOUBLE) * a.m - CAST(a.s1 AS DOUBLE) * a.s1)
                 / (CAST(a.m AS DOUBLE) * a.m)) / 1e18) END AS BIGINT) AS jk_var_q12
FROM g, a""",
)
def jackknife_ttr_variance(spark, sf_dir):
    """Jackknife (leave-one-document-out) variance of the corpus-level
    type/token ratio Σdistinct/Σtokens — the SECOND resampling method
    beside bootstrap_mean_doclen, and the one that works for RATIO
    estimators in closed form: each document's pseudo-replicate
    R₍ᵢ₎ = (D−dᵢ)/(N−nᵢ) needs only that doc's two counts, so the
    whole resample is one relational pass (a bootstrap of a ratio
    would re-weight both numerator and denominator jointly). The
    jackknife variance (m−1)/m·Var(R₍ᵢ₎) is the standard error a
    corpus-quality dashboard should print next to the TTR point.

    Determinism: replicates quantize to q9 FIRST, then CENTER on the
    full-sample q9 ratio so the sufficient sums are sums of SMALL
    integers (raw q9² sums pass 2^63 at ~10 docs — centering is the
    envelope fix, exact because Σ(r−r̄)² is translation-invariant);
    one shared float expression does the final combine; docs equal to
    the whole corpus (N−nᵢ=0) drop from the resample, documented.

    Scale shape: per-doc stats off tf's exchange, a 1-row total
    broadcast, map-side deviations, scalar combine."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    d = tf.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dv"),
        F.sum("tf").cast("long").alias("nt"),
    ).localCheckpoint()  # totals + deviations consume it
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("dv"), F.lit(0)).cast("long").alias("dd"),
        F.coalesce(F.sum("nt"), F.lit(0)).cast("long").alias("nn"),
    )
    r = (
        d.crossJoin(F.broadcast(g))
        .where(F.expr("nn - nt > 0"))
        .select(
            (
                F.expr(
                    "CAST(round(1000000000 * CAST(dd - dv AS DOUBLE) / (nn - nt)) AS BIGINT)"
                )
                - F.expr(
                    "CAST(round(1000000000 * CAST(dd AS DOUBLE) / nn) AS BIGINT)"
                )
            ).alias("dev")
        )
    )
    a = r.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.coalesce(F.sum("dev"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("dev") * F.col("dev")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    return g.crossJoin(a).select(
        F.col("n").alias("n_docs"),
        F.expr(
            "CAST(round(1000000000 * CAST(dd AS DOUBLE) / greatest(nn, 1)) AS BIGINT)"
        ).alias("ttr_full_q9"),
        F.col("m").alias("n_loo"),
        F.expr(
            "CAST(CASE WHEN m < 2 THEN 0"
            " ELSE round(1000000000000 * (CAST(m - 1 AS DOUBLE) / m)"
            " * ((CAST(s2 AS DOUBLE) * m - CAST(s1 AS DOUBLE) * s1)"
            "    / (CAST(m AS DOUBLE) * m)) / 1e18) END AS BIGINT)"
        ).alias("jk_var_q12"),
    )


@register(
    "wasserstein_length_pairs",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS v
  FROM documents),
hist AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY source, v),
ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY source),
pr AS (SELECT a.source AS s1, b.source AS s2, a.n AS n1, b.n AS n2
       FROM ns a JOIN ns b ON a.source < b.source),
cells AS (
  SELECT pr.s1, pr.s2, pr.n1, pr.n2, hist.v,
         CAST(COALESCE(sum(CASE WHEN hist.source = pr.s1 THEN hist.c ELSE 0 END), 0)
              AS BIGINT) AS c1,
         CAST(COALESCE(sum(CASE WHEN hist.source = pr.s2 THEN hist.c ELSE 0 END), 0)
              AS BIGINT) AS c2
  FROM pr JOIN hist ON hist.source IN (pr.s1, pr.s2)
  GROUP BY pr.s1, pr.s2, pr.n1, pr.n2, hist.v),
cum AS (
  SELECT s1, s2, n1, n2, v,
         CAST(sum(c1) OVER (PARTITION BY s1, s2 ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
         CAST(sum(c2) OVER (PARTITION BY s1, s2 ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2,
         lead(v) OVER (PARTITION BY s1, s2 ORDER BY v) AS vn
  FROM cells),
terms AS (
  SELECT s1, s2,
         CAST(round(1000000 * (abs(CAST(f1 AS DOUBLE) * n2 - CAST(f2 AS DOUBLE) * n1)
              * (vn - v)) / (CAST(n1 AS DOUBLE) * n2)) AS BIGINT) AS w_q6
  FROM cum WHERE vn IS NOT NULL)
SELECT pr.s1 AS source_a, pr.s2 AS source_b,
       CAST(COALESCE(sum(terms.w_q6), 0) AS BIGINT) AS wasserstein_q6
FROM pr LEFT JOIN terms ON terms.s1 = pr.s1 AND terms.s2 = pr.s2
GROUP BY pr.s1, pr.s2 ORDER BY source_a, source_b""",
)
def wasserstein_length_pairs(spark, sf_dir):
    """Wasserstein-1 (earth-mover) distance between every source pair's
    token-length distributions: W₁ = ∫|F₁−F₂| over the merged value
    axis — the METRIC-AWARE member of the distribution-distance family
    (KL/JSD/Hellinger compare bin masses and treat a 10-token shift
    like a 1000-token shift; KS takes the single worst gap; W₁ prices
    how far the mass must MOVE, in tokens, which is what a
    length-curriculum or packing plan actually cares about). Exact in
    1-D: the integral is a finite sum of |ECDF gap|·Δv over merged
    histogram values.

    Determinism: per-cell contributions use integer cumulative counts
    with every product cast from the FIRST multiply (n₁·n₂ passes 2^63
    long before 2^53 relative error matters — the chi² rule),
    q6-rounded per CELL then BIGINT-summed.

    Scale shape: value histograms collapse map-side; the pair fan
    multiplies |sources|² by histogram cells (both bounded); cum/lead
    windows run per pair over cells only."""
    t = _docs(spark, sf_dir).select(
        "source", F.size(spark_tokens("text")).cast("long").alias("v")
    )
    hist = t.groupBy("source", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint()  # totals + the pair fan consume it
    ns = hist.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = ns.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    b = ns.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    pr = a.join(b, F.col("s1") < F.col("s2"))
    cells = (
        F.broadcast(pr)
        .join(hist, (F.col("source") == F.col("s1")) | (F.col("source") == F.col("s2")))
        .groupBy("s1", "s2", "n1", "n2", "v")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("source") == F.col("s1"), F.col("c")).otherwise(F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("c1"),
            F.coalesce(
                F.sum(F.when(F.col("source") == F.col("s2"), F.col("c")).otherwise(F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("c2"),
        )
    )
    wp = Window.partitionBy("s1", "s2").orderBy("v")
    wc = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cells.select(
        "s1",
        "s2",
        "n1",
        "n2",
        "v",
        F.sum("c1").over(wc).cast("long").alias("f1"),
        F.sum("c2").over(wc).cast("long").alias("f2"),
        F.lead("v").over(wp).alias("vn"),
    )
    terms = cum.where(F.col("vn").isNotNull()).select(
        "s1",
        "s2",
        F.expr(
            "CAST(round(1000000 * (abs(CAST(f1 AS DOUBLE) * n2 - CAST(f2 AS DOUBLE) * n1)"
            " * (vn - v)) / (CAST(n1 AS DOUBLE) * n2)) AS BIGINT)"
        ).alias("w_q6"),
    )
    # aggregate FROM the pair spine: a single-shared-value pair has no
    # interval terms and must still report W1 = 0, not vanish
    return (
        pr.select("s1", "s2")
        .join(terms, ["s1", "s2"], "left")
        .groupBy("s1", "s2")
        .agg(F.coalesce(F.sum("w_q6"), F.lit(0)).cast("long").alias("wasserstein_q6"))
        .select(
            F.col("s1").alias("source_a"),
            F.col("s2").alias("source_b"),
            "wasserstein_q6",
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# session 211 — bloom sizing advisor, fusion headroom, quantile normalization
# ---------------------------------------------------------------------------

# -ln(p)/(ln 2)^2 folded to q6 integers for the two target FPRs, and the
# corresponding optimal k = round(log2(1/p))
_BLOOM_TARGETS = [("a_fpr_1pct", 9585058, 7), ("b_fpr_01pct", 14377588, 10)]


@register(
    "bloom_size_advisor",
    f"""WITH n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nk FROM events),
t AS (SELECT * FROM (VALUES
  {", ".join(f"('{lbl}', {c}, {k})" for lbl, c, k in _BLOOM_TARGETS)})
  _t(target, c_q6, k_opt)),
cur AS (
  SELECT CAST(round(1000000 * pow(1 - exp(-(4.0 * n.nk) / 65536), 4)) AS BIGINT)
           AS current_fpr_q6
  FROM n)
SELECT t.target, n.nk AS n_keys,
       CAST((n.nk * t.c_q6 + 999999) // 1000000 AS BIGINT) AS m_bits,
       CAST(t.k_opt AS BIGINT) AS k_hashes,
       cur.current_fpr_q6
FROM t CROSS JOIN n CROSS JOIN cur ORDER BY t.target""",
)
def bloom_size_advisor(spark, sf_dir):
    """Bloom-filter sizing advisor: for the LIVE distinct-user count,
    the optimal bit count m = −n·ln(p)/(ln 2)² and hash count
    k = log2(1/p) at target FPRs of 1% and 0.1%, next to the PREDICTED
    FPR of the filter the engine actually deploys (m=2^16, k=4 — the
    decontamination_bloom / bloom_user_stream substrate) via
    (1 − e^{{-kn/m}})^k. The sizing twin of bloom_fpr_curve (which
    MEASURES the deployed filter empirically) — the same relationship
    ab_power_table has to ab_significance: size it before you ship it.

    Determinism: the −ln p/(ln2)² constants are Python-folded q6
    INTEGERS so m is the exact-ceil (x+999999) div 1e6; the predicted-
    FPR expression is one shared exp/pow chain q6-rounded (1-ulp libm
    class, accepted as everywhere).

    Scale shape: one distinct-count exchange; everything else is a
    2-row spine against 1-row scalars."""
    n = _events(spark, sf_dir).agg(
        F.countDistinct("user_id").cast("long").alias("nk")
    )
    t = spark.createDataFrame(
        _BLOOM_TARGETS, "target string, c_q6 long, k_opt long"
    )
    cur = n.select(
        F.expr(
            "CAST(round(1000000 * pow(1 - exp(-(4.0 * nk) / 65536), 4)) AS BIGINT)"
        ).alias("current_fpr_q6")
    )
    return (
        t.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(cur))
        .select(
            "target",
            F.col("nk").alias("n_keys"),
            F.expr("CAST((nk * c_q6 + 999999) div 1000000 AS BIGINT)").alias(
                "m_bits"
            ),
            F.col("k_opt").cast("long").alias("k_hashes"),
            "current_fpr_q6",
        )
        .orderBy("target")
    )


@register(
    "fusion_headroom_eval",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS lr
  FROM agg WHERE doc_id <> 0),
lex AS (SELECT * FROM lexr WHERE lr <= 20),
vq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vc AS (
  SELECT e.vec_id AS doc_id,
         CAST(round(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), vq.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(vq.qv, vq.qv))) * 1000000
         ) AS BIGINT) AS cos_q6
  FROM embeddings e, vq WHERE e.vec_id <> 0),
vecr AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos_q6 DESC, doc_id ASC) AS vr FROM vc),
vec AS (SELECT * FROM vecr WHERE vr <= 20),
rel AS (SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup'),
bp AS (SELECT CAST(count(*) AS BIGINT) AS p FROM lex JOIN rel USING (doc_id) WHERE lr <= 10),
vp AS (SELECT CAST(count(*) AS BIGINT) AS p FROM vec JOIN rel USING (doc_id) WHERE vr <= 10),
un AS (SELECT doc_id FROM lex UNION SELECT doc_id FROM vec),
op AS (SELECT CAST(least(count(*), 10) AS BIGINT) AS p FROM un JOIN rel USING (doc_id))
SELECT bp.p AS bm25_p10, vp.p AS cosine_p10, op.p AS oracle_p10,
       CAST(op.p - greatest(bp.p, vp.p) AS BIGINT) AS headroom
FROM bp, vp, op""",
)
def fusion_headroom_eval(spark, sf_dir):
    """Fusion headroom analysis: P@10 of the BM25 leg, of the cosine
    leg, and of the ORACLE fusion — the best any rank-fusion of the two
    top-20s could possibly achieve (place every relevant doc from the
    union first, cap at 10). headroom = oracle − best single leg is the
    number that says whether building a fusion layer (hybrid_rrf,
    hybrid_linear_search) can pay at all: zero headroom means the legs'
    relevant sets coincide and fusion can only reshuffle; large
    headroom means the legs retrieve COMPLEMENTARY relevant docs and
    fusion is where recall lives. Uses hybrid_rrf's exact legs and the
    binary 'dup' relevance, so the three numbers are comparable to
    rank_eval's P@10.

    Determinism: both legs rank over quantized scores with the doc_id
    tiebreak (verbatim hybrid_rrf CTEs); all three metrics are exact
    counts.

    Scale shape: two TakeOrdered top-20s, a relevance semi-join on ≤40
    rows."""
    lex = (
        _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
        .where(F.col("doc_id") != 0)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "lr",
            F.row_number().over(
                Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "lr")
    )
    vc = _cos_spark(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), _q6(F.col("cos")).alias("cos_q6")
    )
    vec = (
        vc.orderBy(F.desc("cos_q6"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "vr",
            F.row_number().over(Window.orderBy(F.desc("cos_q6"), F.asc("doc_id"))),
        )
        .select("doc_id", "vr")
    )
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
    )
    bp = (
        lex.where(F.col("lr") <= 10)
        .join(rel, "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("bm25_p10"))
    )
    vp = (
        vec.where(F.col("vr") <= 10)
        .join(rel, "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cosine_p10"))
    )
    un = lex.select("doc_id").unionByName(vec.select("doc_id")).distinct()
    op = un.join(rel, "doc_id").agg(
        F.least(F.count(F.lit(1)), F.lit(10)).cast("long").alias("oracle_p10")
    )
    return bp.crossJoin(vp).crossJoin(op).select(
        "bm25_p10",
        "cosine_p10",
        "oracle_p10",
        F.expr("CAST(oracle_p10 - greatest(bm25_p10, cosine_p10) AS BIGINT)").alias(
            "headroom"
        ),
    )


@register(
    "quantile_normalization_map",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS v
  FROM documents),
sp AS (SELECT min(source) AS sa FROM t),
sp2 AS (SELECT min(source) AS sb FROM t, sp WHERE source > sp.sa),
hist AS (
  SELECT CASE WHEN t.source = sp.sa THEN 'a' ELSE 'b' END AS side, t.v,
         CAST(count(*) AS BIGINT) AS cnt
  FROM t, sp, sp2 WHERE t.source IN (sp.sa, sp2.sb)
  GROUP BY 1, 2),
h AS (
  SELECT side, v, cnt,
         CAST(COALESCE(sum(cnt) OVER (PARTITION BY side ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER (PARTITION BY side) AS BIGINT) AS n
  FROM hist),
q AS (SELECT unnest(generate_series(1, 9)) * 100000 AS p_q6),
ex AS (
  SELECT h.side, q.p_q6, max(h.n) AS n,
         max((h.n - 1) * q.p_q6) AS x,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 THEN h.v END) AS v_lo,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 + 1 THEN h.v END) AS v_hi
  FROM h, q GROUP BY h.side, q.p_q6),
qq AS (
  SELECT side, p_q6,
         CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)
              * (v_hi - v_lo))) AS BIGINT) AS q_q6
  FROM ex)
SELECT CAST(a.p_q6 AS BIGINT) AS p_q6, a.q_q6 AS q_a_q6, b.q_q6 AS q_b_q6,
       b.q_q6 - a.q_q6 AS shift_q6
FROM qq a JOIN qq b ON a.p_q6 = b.p_q6 AND a.side = 'a' AND b.side = 'b'
ORDER BY p_q6""",
)
def quantile_normalization_map(spark, sf_dir):
    """Quantile-normalization mapping between the two lexicographically
    first sources' token-length distributions: the exact type-7
    quantiles of both at each decile, paired — the TRANSFORM companion
    of wasserstein_length_pairs (that op prices the distance; this
    table IS the monotone map that would remove it, the batch-effect
    correction genomics calls quantile normalization and data
    pipelines use to equalize strata before mixing). A flat shift
    column means a pure location difference; a shift growing with p
    means the tails differ, which truncation/packing policies must
    know.

    Determinism: both quantile chains are the integer-rank histogram
    machinery with ONE shared interpolation expression; the source
    pair is picked by lexicographic minimum (deterministic on any
    corpus).

    Scale shape: two value histograms partitioned by side; the decile
    spine probes histogram cells only."""
    t = _docs(spark, sf_dir).select(
        "source", F.size(spark_tokens("text")).cast("long").alias("v")
    ).localCheckpoint()  # source pick + histogram consume it
    sp = t.agg(F.min("source").alias("sa"))
    sp2 = (
        t.crossJoin(F.broadcast(sp))
        .where(F.col("source") > F.col("sa"))
        .agg(F.min("source").alias("sb"))
    )
    hist = (
        t.crossJoin(F.broadcast(sp))
        .crossJoin(F.broadcast(sp2))
        .where(
            (F.col("source") == F.col("sa")) | (F.col("source") == F.col("sb"))
        )
        .select(
            F.when(F.col("source") == F.col("sa"), F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("side"),
            "v",
        )
        .groupBy("side", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_cb = (
        Window.partitionBy("side")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("side")
    h = hist.select(
        "side",
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(i * 100000,) for i in range(1, 10)], "p_q6 long")
    ex = (
        h.crossJoin(F.broadcast(q))
        .groupBy("side", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max((F.col("n") - 1) * F.col("p_q6")).alias("x"),
            F.max(
                F.when(F.col("cb") <= F.expr("((n - 1) * p_q6) div 1000000"), F.col("v"))
            ).alias("v_lo"),
            F.max(
                F.when(
                    F.col("cb") <= F.expr("((n - 1) * p_q6) div 1000000 + 1"),
                    F.col("v"),
                )
            ).alias("v_hi"),
        )
    )
    qq = ex.select(
        "side",
        "p_q6",
        F.expr(
            "CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)"
            " * (v_hi - v_lo))) AS BIGINT)"
        ).alias("q_q6"),
    )
    a = qq.where(F.col("side") == "a").select("p_q6", F.col("q_q6").alias("q_a_q6"))
    b = qq.where(F.col("side") == "b").select("p_q6", F.col("q_q6").alias("q_b_q6"))
    return (
        a.join(b, "p_q6")
        .select(
            F.col("p_q6").cast("long").alias("p_q6"),
            "q_a_q6",
            "q_b_q6",
            (F.col("q_b_q6") - F.col("q_a_q6")).alias("shift_q6"),
        )
        .orderBy("p_q6")
    )


# ---------------------------------------------------------------------------
# session 212 — equi-depth selectivity, GPD tail fit, b-bit minhash
# ---------------------------------------------------------------------------


@register(
    "equidepth_selectivity_estimate",
    f"""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
hist AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY c),
h AS (
  SELECT c, cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM hist),
ks AS (SELECT unnest(generate_series(0, 16)) AS k),
bd AS (
  SELECT ks.k, max(CASE WHEN h.cb <= ((h.n - 1) * ks.k) // 16 THEN h.c END) AS b,
         max(h.n) AS n
  FROM h, ks GROUP BY ks.k),
seg AS (
  SELECT k, b AS bk, lead(b) OVER (ORDER BY k) AS bk1, n
  FROM bd),
segs AS (SELECT k, bk, bk1, n FROM seg WHERE bk1 IS NOT NULL),
lim AS (SELECT min(bk) AS b0, max(bk1) AS b16, max(n) AS n FROM segs),
rngs AS (SELECT * FROM (VALUES {", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _RSH_RANGES)})
         _r(rid, lo, hi)),
pts AS (
  SELECT rid, lo AS x, 0 AS side FROM rngs
  UNION ALL SELECT rid, hi + 1, 1 FROM rngs),
gg AS (
  SELECT pts.rid, pts.side,
         CAST(CASE WHEN pts.x <= lim.b0 THEN 0
              WHEN pts.x >= lim.b16 THEN 1000000
              ELSE (SELECT (s.k * 1000000
                            + (1000000 * (pts.x - s.bk)) // greatest(s.bk1 - s.bk, 1))
                           // 16
                    FROM segs s
                    WHERE s.bk <= pts.x AND pts.x < s.bk1
                    ORDER BY s.k LIMIT 1)
              END AS BIGINT) AS g_q6
  FROM pts CROSS JOIN lim),
est AS (
  SELECT a.rid,
         CAST((SELECT max(n) FROM lim) * (b.g_q6 - a.g_q6) // 1000000 AS BIGINT)
           AS ed16_est_rows
  FROM gg a JOIN gg b ON a.rid = b.rid AND a.side = 0 AND b.side = 1),
ex AS (
  SELECT r.rid, CAST(COALESCE(sum(CASE WHEN v.c >= r.lo AND v.c <= r.hi
                                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS exact_rows
  FROM rngs r LEFT JOIN v ON TRUE GROUP BY r.rid)
SELECT CAST(rngs.rid AS BIGINT) AS range_id, ex.exact_rows, est.ed16_est_rows,
       est.ed16_est_rows - ex.exact_rows AS err_rows
FROM rngs JOIN ex ON ex.rid = rngs.rid JOIN est ON est.rid = rngs.rid
ORDER BY range_id""",
)
def equidepth_selectivity_estimate(spark, sf_dir):
    """Equi-DEPTH (quantile-boundary) histogram selectivity for the same
    three canned price ranges as range_selectivity_histograms — the
    rival histogram family: equi-width wastes buckets on empty value
    space and crushes dense regions into one bucket; equi-depth puts a
    boundary every n/16 rows, so every bucket carries the same mass and
    the worst-case estimate error is bounded by one bucket (~6% of
    rows) regardless of skew — which is why real optimizers (Postgres,
    ORACLE) store quantile histograms. Boundaries are exact 0-based
    rank probes; F̂ interpolates linearly inside the containing
    segment, clamped outside [b₀, b₁₆]; zero-width segments (duplicate
    boundaries under heavy ties) can never contain a point and fall
    out naturally.

    Determinism: boundaries and segment selection are pure integer
    rank/compare operations; the interpolation is an integer
    cross-multiplied division; est rows floor at the end.

    Scale shape: one value histogram; boundary probes and segment
    joins run over 17-row tables; the exact leg shares the histogram's
    scan."""
    v = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c")
    )
    hist = v.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cb = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "c",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    ks = spark.createDataFrame([(k,) for k in range(17)], "k long")
    bd = (
        h.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.max(
                F.when(F.col("cb") <= F.expr("((n - 1) * k) div 16"), F.col("c"))
            ).alias("b"),
            F.max("n").alias("n"),
        )
    )
    seg = bd.select(
        "k", F.col("b").alias("bk"), F.lead("b").over(Window.orderBy("k")).alias("bk1"), "n"
    )
    segs = seg.where(F.col("bk1").isNotNull()).localCheckpoint()
    lim = segs.agg(
        F.min("bk").alias("b0"),
        F.max("bk1").alias("b16"),
        F.max("n").alias("n"),
    )
    rngs = spark.createDataFrame(_RSH_RANGES, "rid int, lo long, hi long")
    pts = rngs.select("rid", F.col("lo").alias("x"), F.lit(0).alias("side")).unionByName(
        rngs.select("rid", (F.col("hi") + 1).alias("x"), F.lit(1).alias("side"))
    )
    # segment containment: at most one nonzero-width segment holds x
    inseg = (
        pts.crossJoin(F.broadcast(lim))
        .join(
            F.broadcast(segs.select("k", "bk", "bk1")),
            (F.col("bk") <= F.col("x")) & (F.col("x") < F.col("bk1")),
            "left",
        )
        .groupBy("rid", "side", "x", "b0", "b16", "n")
        .agg(
            F.min(
                F.expr(
                    "(k * 1000000 + (1000000 * (x - bk)) div greatest(bk1 - bk, 1)) div 16"
                )
            ).alias("gin")
        )
    )
    gg = inseg.select(
        "rid",
        "side",
        F.expr(
            "CAST(CASE WHEN x <= b0 THEN 0"
            " WHEN x >= b16 THEN 1000000"
            " ELSE gin END AS BIGINT)"
        ).alias("g_q6"),
        "n",
    )
    a = gg.where(F.col("side") == 0).select("rid", F.col("g_q6").alias("ga"), "n")
    b = gg.where(F.col("side") == 1).select("rid", F.col("g_q6").alias("gb"))
    est = a.join(b, "rid").select(
        "rid",
        F.expr("CAST(n * (gb - ga) div 1000000 AS BIGINT)").alias("ed16_est_rows"),
    )
    ex = (
        F.broadcast(rngs)
        .crossJoin(v)
        .groupBy("rid")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi")),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("exact_rows")
        )
    )
    return (
        rngs.join(ex, "rid")
        .join(est, "rid")
        .select(
            F.col("rid").cast("long").alias("range_id"),
            "exact_rows",
            "ed16_est_rows",
            (F.col("ed16_est_rows") - F.col("exact_rows")).alias("err_rows"),
        )
        .orderBy("range_id")
    )


@register(
    "gpd_tail_fit",
    """WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'),
hist AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY c),
h AS (
  SELECT c, cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM hist),
q AS (
  SELECT max(n) AS n,
         max((n - 1) * 900000) AS x,
         max(CASE WHEN cb <= ((n - 1) * 900000) // 1000000 THEN c END) AS v_lo,
         max(CASE WHEN cb <= ((n - 1) * 900000) // 1000000 + 1 THEN c END) AS v_hi
  FROM h),
u AS (SELECT CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)
             * (v_hi - v_lo))) AS BIGINT) AS u_q6 FROM q),
ey AS (
  SELECT (1000000 * v.c - u.u_q6) // 100000000 AS y
  FROM v, u WHERE 1000000 * v.c > u.u_q6),
a AS (SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(COALESCE(sum(y), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(y * y), 0) AS BIGINT) AS s2
      FROM ey)
SELECT u.u_q6 AS threshold_cents_q6, a.m AS n_exceed,
       CAST(round(1000000 * CAST(a.s1 AS DOUBLE) / greatest(a.m, 1)) AS BIGINT)
         AS mean_excess_dollars_q6,
       CAST(CASE WHEN a.m < 2 OR (CAST(a.s2 AS DOUBLE) * a.m
                 - CAST(a.s1 AS DOUBLE) * a.s1) <= 0 THEN 0
            ELSE round(1000000 * (1 - ((CAST(a.s1 AS DOUBLE) / a.m)
                 * (CAST(a.s1 AS DOUBLE) / a.m))
                 / ((CAST(a.s2 AS DOUBLE) * a.m - CAST(a.s1 AS DOUBLE) * a.s1)
                    / (CAST(a.m AS DOUBLE) * a.m))) / 2) END AS BIGINT) AS xi_q6,
       CAST(CASE WHEN a.m < 2 OR (CAST(a.s2 AS DOUBLE) * a.m
                 - CAST(a.s1 AS DOUBLE) * a.s1) <= 0 THEN 0
            ELSE round(1000000 * (CAST(a.s1 AS DOUBLE) / a.m)
                 * (1 - (1 - ((CAST(a.s1 AS DOUBLE) / a.m)
                   * (CAST(a.s1 AS DOUBLE) / a.m))
                   / ((CAST(a.s2 AS DOUBLE) * a.m - CAST(a.s1 AS DOUBLE) * a.s1)
                      / (CAST(a.m AS DOUBLE) * a.m))) / 2)) END AS BIGINT)
         AS sigma_dollars_q6
FROM u, a""",
)
def gpd_tail_fit(spark, sf_dir):
    """Generalized Pareto tail fit of purchase values above the exact
    p90 threshold, by method of moments: ξ = (1 − m²/s²)/2 and
    σ = m(1 − ξ) from the exceedances' mean and variance — the
    extreme-value-theory member no other op covers (value_lognormal_fit
    models the BODY; the peaks-over-threshold GPD is how risk teams
    model the TAIL, and ξ's sign is the headline: ξ > 0 heavy tail
    with possible infinite variance, ξ < 0 bounded tail). Exceedances
    rescale to whole DOLLARS before the sufficient sums (the
    first_order_ltv rule — cent-scale squares pass 2^63 at ~1e9
    purchases); non-overdispersed or tiny tails report 0 sentinels.

    Determinism: the p90 threshold is the integer-rank histogram probe
    with one shared interpolation; exceedance selection is an exact
    integer comparison in q6 space; moments combine in ONE float
    expression each, every product cast from the FIRST multiply.

    Scale shape: one value histogram + one filtered map-side stats
    pass; everything else is scalar."""
    v = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .localCheckpoint()  # quantile histogram + exceedance pass consume it
    )
    hist = v.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cb = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "c",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = h.agg(
        F.max("n").alias("n"),
        F.max(F.expr("(n - 1) * 900000")).alias("x"),
        F.max(
            F.when(F.col("cb") <= F.expr("((n - 1) * 900000) div 1000000"), F.col("c"))
        ).alias("v_lo"),
        F.max(
            F.when(
                F.col("cb") <= F.expr("((n - 1) * 900000) div 1000000 + 1"),
                F.col("c"),
            )
        ).alias("v_hi"),
    )
    u = q.select(
        F.expr(
            "CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)"
            " * (v_hi - v_lo))) AS BIGINT)"
        ).alias("u_q6")
    )
    ey = (
        v.crossJoin(F.broadcast(u))
        .where(F.expr("1000000 * c > u_q6"))
        .select(F.expr("(1000000 * c - u_q6) div 100000000").alias("y"))
    )
    a = ey.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("y") * F.col("y")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    mu = "(CAST(s1 AS DOUBLE) / m)"
    var = (
        "((CAST(s2 AS DOUBLE) * m - CAST(s1 AS DOUBLE) * s1)"
        " / (CAST(m AS DOUBLE) * m))"
    )
    bad = (
        "m < 2 OR (CAST(s2 AS DOUBLE) * m - CAST(s1 AS DOUBLE) * s1) <= 0"
    )
    xi = f"(1 - ({mu} * {mu}) / {var}) / 2"
    return u.crossJoin(a).select(
        F.col("u_q6").alias("threshold_cents_q6"),
        F.col("m").alias("n_exceed"),
        F.expr(
            f"CAST(round(1000000 * CAST(s1 AS DOUBLE) / greatest(m, 1)) AS BIGINT)"
        ).alias("mean_excess_dollars_q6"),
        F.expr(
            f"CAST(CASE WHEN {bad} THEN 0"
            f" ELSE round(1000000 * {xi}) END AS BIGINT)"
        ).alias("xi_q6"),
        F.expr(
            f"CAST(CASE WHEN {bad} THEN 0"
            f" ELSE round(1000000 * {mu} * (1 - {xi})) END AS BIGINT)"
        ).alias("sigma_dollars_q6"),
    )


_BBIT_PERMS = 16
_BBIT_SIG_SQL = ", ".join(
    f"(('0x' || substr(min(md5('bb:{p}:' || sh)), 32, 1))::INT) % 2 AS b{p}"
    for p in range(_BBIT_PERMS)
)
_BBIT_NC_SQL = " + ".join(
    f"CASE WHEN sa.b{p} = sb.b{p} THEN 1 ELSE 0 END" for p in range(_BBIT_PERMS)
)


@register(
    "bbit_minhash_estimate",
    f"""WITH sh AS ({_SQL_SHINGLES}),
ss AS (SELECT doc_id, CAST(count(DISTINCT sh) AS BIGINT) AS ns FROM sh GROUP BY doc_id),
ip AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sig AS (SELECT doc_id, {_BBIT_SIG_SQL} FROM sh GROUP BY doc_id),
pj AS (
  SELECT ip.inter, sa2.ns + sb2.ns - ip.inter AS un,
         CAST({_BBIT_NC_SQL} AS BIGINT) AS nc
  FROM ip
  JOIN ss sa2 ON sa2.doc_id = ip.da
  JOIN ss sb2 ON sb2.doc_id = ip.db
  JOIN sig sa ON sa.doc_id = ip.da
  JOIN sig sb ON sb.doc_id = ip.db),
dd AS (
  SELECT least(9, (10 * inter) // un) AS dec,
         (2 * nc - {_BBIT_PERMS}) * {1000000 // _BBIT_PERMS} AS jhat_q6,
         (1000000 * inter) // un AS jex_q6
  FROM pj),
r AS (
  SELECT dec, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(COALESCE(sum(jhat_q6), 0) AS BIGINT) AS sh_,
         CAST(COALESCE(sum(jex_q6), 0) AS BIGINT) AS se_,
         CAST(COALESCE(sum(abs(jhat_q6 - jex_q6)), 0) AS BIGINT) AS sa_
  FROM dd GROUP BY dec),
spine AS (SELECT unnest(generate_series(0, 9)) AS dec)
SELECT CAST(spine.dec AS BIGINT) AS j_decile,
       CAST(COALESCE(r.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(r.sh_, 0) // greatest(COALESCE(r.n_pairs, 0), 1) AS BIGINT)
         AS mean_jhat_q6,
       CAST(COALESCE(r.se_, 0) // greatest(COALESCE(r.n_pairs, 0), 1) AS BIGINT)
         AS mean_jexact_q6,
       CAST(COALESCE(r.sa_, 0) // greatest(COALESCE(r.n_pairs, 0), 1) AS BIGINT)
         AS mean_abs_err_q6
FROM spine LEFT JOIN r ON r.dec = spine.dec ORDER BY j_decile""",
)
def bbit_minhash_estimate(spark, sf_dir):
    """b-bit minhash (Li & König 2010) accuracy audit at b=1, k=16:
    store only the LOWEST BIT of each of 16 seeded min-hashes — 2 bytes
    per document instead of 16 hex digests — and estimate Jaccard from
    the bit-collision rate as Ĵ = 2·(c − ½): the sketch-COMPRESSION
    story the minhash family was missing (signatures, LSH bands and
    calibration all keep full hashes; b-bit is how billion-document
    dedup actually fits in RAM). Audited per true-Jaccard decile over
    the shingle-blocked universe: the estimator is unbiased only as
    J → the b=1 collision model predicts, and the per-decile |error|
    column shows exactly where 16 bits stop being enough (negative
    Ĵ estimates at low J are the honest noise floor, not clamped).

    Determinism: bits are exact parities of md5 minima (seeded
    'bb:p:' — hash-input disjoint from every other coordinate);
    Ĵ_q6 = (2·matches − 16)·62500 is EXACT integer (1e6/16 divides
    evenly — why k=16); deciles and means are integer
    cross-multiplications and floor divisions.

    Scale shape: the 16 min-aggs ride ONE doc_id exchange over the
    shingle table; pair evaluation touches blocked candidates only."""
    sh = _shingles_spark(spark, sf_dir).select("doc_id", "sh").distinct().localCheckpoint()
    ss = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("ns"))
    a = sh.alias("a")
    b = sh.alias("b")
    ip = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.expr(
                f"cast(conv(substring(min(md5(concat('bb:{p}:', sh))), 32, 1),"
                f" 16, 10) as int) % 2"
            ).alias(f"b{p}")
            for p in range(_BBIT_PERMS)
        ]
    )
    sa = sig.select(
        F.col("doc_id").alias("da"),
        *[F.col(f"b{p}").alias(f"ba{p}") for p in range(_BBIT_PERMS)],
    )
    sb = sig.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"b{p}").alias(f"bb{p}") for p in range(_BBIT_PERMS)],
    )
    nc_expr = " + ".join(
        f"CASE WHEN ba{p} = bb{p} THEN 1 ELSE 0 END" for p in range(_BBIT_PERMS)
    )
    pj = (
        ip.join(ss.select(F.col("doc_id").alias("da"), F.col("ns").alias("nsa")), "da")
        .join(ss.select(F.col("doc_id").alias("db"), F.col("ns").alias("nsb")), "db")
        .join(sa, "da")
        .join(sb, "db")
        .select(
            "inter",
            (F.col("nsa") + F.col("nsb") - F.col("inter")).alias("un"),
            F.expr(f"CAST({nc_expr} AS BIGINT)").alias("nc"),
        )
    )
    dd = pj.select(
        F.expr("least(9, (10 * inter) div un)").alias("dec"),
        F.expr(f"(2 * nc - {_BBIT_PERMS}) * {1000000 // _BBIT_PERMS}").alias("jhat_q6"),
        F.expr("(1000000 * inter) div un").alias("jex_q6"),
    )
    r = dd.groupBy("dec").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum("jhat_q6"), F.lit(0)).cast("long").alias("sh_"),
        F.coalesce(F.sum("jex_q6"), F.lit(0)).cast("long").alias("se_"),
        F.coalesce(F.sum(F.abs(F.col("jhat_q6") - F.col("jex_q6"))), F.lit(0))
        .cast("long")
        .alias("sa_"),
    )
    spine = spark.createDataFrame([(i,) for i in range(10)], "dec long")
    return (
        spine.join(r, "dec", "left")
        .select(
            F.col("dec").cast("long").alias("j_decile"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.expr(
                "CAST(COALESCE(sh_, 0) div greatest(COALESCE(n_pairs, 0), 1)"
                " AS BIGINT)"
            ).alias("mean_jhat_q6"),
            F.expr(
                "CAST(COALESCE(se_, 0) div greatest(COALESCE(n_pairs, 0), 1)"
                " AS BIGINT)"
            ).alias("mean_jexact_q6"),
            F.expr(
                "CAST(COALESCE(sa_, 0) div greatest(COALESCE(n_pairs, 0), 1)"
                " AS BIGINT)"
            ).alias("mean_abs_err_q6"),
        )
        .orderBy("j_decile")
    )


# ---------------------------------------------------------------------------
# session 213 — two-way additive fit, Cronbach alpha, changepoint split
# ---------------------------------------------------------------------------


@register(
    "user_type_additive_fit",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
t AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY user_id, event_type),
grid AS (
  SELECT u.user_id, t.event_type, CAST(COALESCE(c.y, 0) AS BIGINT) AS y
  FROM u CROSS JOIN t
  LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type),
su AS (SELECT user_id, CAST(sum(y) AS BIGINT) AS s FROM grid GROUP BY user_id),
st_ AS (SELECT event_type, CAST(sum(y) AS BIGINT) AS s FROM grid GROUP BY event_type),
agg AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS nu,
         (SELECT CAST(count(*) AS BIGINT) FROM t) AS nt,
         (SELECT CAST(COALESCE(sum(y), 0) AS BIGINT) FROM grid) AS g,
         (SELECT CAST(COALESCE(sum(y * y), 0) AS BIGINT) FROM grid) AS q,
         (SELECT CAST(COALESCE(sum(s * s), 0) AS BIGINT) FROM su) AS uu,
         (SELECT CAST(COALESCE(sum(s * s), 0) AS BIGINT) FROM st_) AS tt),
f AS (
  SELECT nu, nt,
         CAST(q AS DOUBLE) - (CAST(g AS DOUBLE) * g) / (CAST(nu AS DOUBLE) * nt)
           AS ss_tot,
         CAST(uu AS DOUBLE) / nt - (CAST(g AS DOUBLE) * g) / (CAST(nu AS DOUBLE) * nt)
           AS ss_rows,
         CAST(tt AS DOUBLE) / nu - (CAST(g AS DOUBLE) * g) / (CAST(nu AS DOUBLE) * nt)
           AS ss_cols
  FROM agg)
SELECT nu AS n_users, nt AS n_types,
       CAST(CASE WHEN ss_tot <= 0 THEN 0
            ELSE round(1000000 * ss_rows / ss_tot) END AS BIGINT) AS row_share_q6,
       CAST(CASE WHEN ss_tot <= 0 THEN 0
            ELSE round(1000000 * ss_cols / ss_tot) END AS BIGINT) AS col_share_q6,
       CAST(CASE WHEN ss_tot <= 0 THEN 0
            ELSE round(1000000 * (ss_tot - ss_rows - ss_cols) / ss_tot) END
            AS BIGINT) AS interaction_share_q6
FROM f""",
)
def user_type_additive_fit(spark, sf_dir):
    """Two-way additive decomposition of the user×type count matrix
    (zeros included via the full grid): how much of the variance is the
    USER main effect (heavy vs light users), the TYPE main effect (some
    events are just common), and the residual INTERACTION — which is
    the only part a personalized model can learn, the recommender-
    baseline question (a high interaction share says user×type
    preferences exist beyond popularity; near-zero says the additive
    'row mean + column mean' baseline already explains the matrix).
    Uses the complete-grid identity SS_res = SS_tot − SS_rows − SS_cols
    so NO per-cell residual is ever materialized.

    Determinism: four exact BIGINT sufficient sums (Σy, Σy², Σ row
    sums², Σ col sums²) combine in shared float expressions with every
    product cast from the FIRST multiply; degenerate (constant) grids
    report 0 sentinels. Row-sum squares bound the envelope (~1e5
    events/user at 1e9 users — documented).

    Scale shape: the grid is users × |types| rows built from one
    user-type groupBy + a broadcast type spine; everything else is
    map-side sums."""
    ev = _events(spark, sf_dir)
    u = ev.select("user_id").distinct()
    t = ev.select("event_type").distinct()
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    grid = (
        u.crossJoin(F.broadcast(t))
        .join(c, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
        .localCheckpoint()  # four aggregates consume it
    )
    su = grid.groupBy("user_id").agg(F.sum("y").cast("long").alias("s"))
    st_ = grid.groupBy("event_type").agg(F.sum("y").cast("long").alias("s"))
    nu = u.agg(F.count(F.lit(1)).cast("long").alias("nu"))
    nt = t.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    gq = grid.agg(
        F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("g"),
        F.coalesce(F.sum(F.col("y") * F.col("y")), F.lit(0))
        .cast("long")
        .alias("q"),
    )
    uu = su.agg(
        F.coalesce(F.sum(F.col("s") * F.col("s")), F.lit(0)).cast("long").alias("uu")
    )
    tt = st_.agg(
        F.coalesce(F.sum(F.col("s") * F.col("s")), F.lit(0)).cast("long").alias("tt")
    )
    agg = nu.crossJoin(nt).crossJoin(gq).crossJoin(uu).crossJoin(tt)
    sstot = (
        "(CAST(q AS DOUBLE) - (CAST(g AS DOUBLE) * g) / (CAST(nu AS DOUBLE) * nt))"
    )
    ssrows = (
        "(CAST(uu AS DOUBLE) / nt - (CAST(g AS DOUBLE) * g) / (CAST(nu AS DOUBLE) * nt))"
    )
    sscols = (
        "(CAST(tt AS DOUBLE) / nu - (CAST(g AS DOUBLE) * g) / (CAST(nu AS DOUBLE) * nt))"
    )
    return agg.select(
        F.col("nu").alias("n_users"),
        F.col("nt").alias("n_types"),
        F.expr(
            f"CAST(CASE WHEN {sstot} <= 0 THEN 0"
            f" ELSE round(1000000 * {ssrows} / {sstot}) END AS BIGINT)"
        ).alias("row_share_q6"),
        F.expr(
            f"CAST(CASE WHEN {sstot} <= 0 THEN 0"
            f" ELSE round(1000000 * {sscols} / {sstot}) END AS BIGINT)"
        ).alias("col_share_q6"),
        F.expr(
            f"CAST(CASE WHEN {sstot} <= 0 THEN 0"
            f" ELSE round(1000000 * ({sstot} - {ssrows} - {sscols}) / {sstot}) END"
            f" AS BIGINT)"
        ).alias("interaction_share_q6"),
    )


@register(
    "quality_cronbach_alpha",
    f"""WITH tf AS ({SQL_TF}),
d AS (
  SELECT doc_id,
         CAST((1000 * count(*)) // CAST(sum(tf) AS BIGINT) AS BIGINT) AS i1,
         CAST((1000 * COALESCE(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END), 0))
              // count(*) AS BIGINT) AS i2,
         CAST(1000 - (1000 * max(tf)) // CAST(sum(tf) AS BIGINT) AS BIGINT) AS i3
  FROM tf GROUP BY doc_id),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(COALESCE(sum(i1), 0) AS BIGINT) AS s1,
         CAST(COALESCE(sum(i1 * i1), 0) AS BIGINT) AS q1,
         CAST(COALESCE(sum(i2), 0) AS BIGINT) AS s2,
         CAST(COALESCE(sum(i2 * i2), 0) AS BIGINT) AS q2,
         CAST(COALESCE(sum(i3), 0) AS BIGINT) AS s3,
         CAST(COALESCE(sum(i3 * i3), 0) AS BIGINT) AS q3,
         CAST(COALESCE(sum(i1 + i2 + i3), 0) AS BIGINT) AS stt,
         CAST(COALESCE(sum((i1 + i2 + i3) * (i1 + i2 + i3)), 0) AS BIGINT) AS qtt
  FROM d)
SELECT n AS n_docs,
       CAST(CASE WHEN n < 2 OR CAST(qtt AS DOUBLE) * n = CAST(stt AS DOUBLE) * stt
            THEN 0
            ELSE round(1000000 * (3.0 / 2)
              * (1 - ((CAST(q1 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)
                      + (CAST(q2 AS DOUBLE) * n - CAST(s2 AS DOUBLE) * s2)
                      + (CAST(q3 AS DOUBLE) * n - CAST(s3 AS DOUBLE) * s3))
                 / (CAST(qtt AS DOUBLE) * n - CAST(stt AS DOUBLE) * stt)))
            END AS BIGINT) AS alpha_q6
FROM a""",
)
def quality_cronbach_alpha(spark, sf_dir):
    """Cronbach's α over three per-document quality items — type/token
    ratio, hapax share, and (1 − max-tf share) — the psychometric
    internal-consistency number: α near 1 says the three signals
    measure ONE underlying 'quality' trait and a composite gate is
    justified; α near 0 says they are independent checks and should
    gate separately (quality_gate_kappa answers this for TWO binary
    gates; α is the k-item continuous version, and the k/(k−1)
    correction is why it is not just an average correlation).

    Determinism: items quantize to q3 integers per doc FIRST (q6
    squares pass 2^63 at ~1e9 docs — the norm_doclen_corr rule); all
    variances come from exact BIGINT sufficient sums in ONE shared
    float expression (chi²-rule casts); constant composites report 0.

    Scale shape: one tf pass → per-doc 3-item rows → a single 9-number
    map-side aggregate."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    d = tf.groupBy("doc_id").agg(
        F.expr(
            "CAST((1000 * count(*)) div CAST(sum(tf) AS BIGINT) AS BIGINT)"
        ).alias("i1"),
        F.expr(
            "CAST((1000 * COALESCE(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END), 0))"
            " div count(*) AS BIGINT)"
        ).alias("i2"),
        F.expr(
            "CAST(1000 - (1000 * max(tf)) div CAST(sum(tf) AS BIGINT) AS BIGINT)"
        ).alias("i3"),
    )
    a = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("i1"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("i1") * F.col("i1")), F.lit(0)).cast("long").alias("q1"),
        F.coalesce(F.sum("i2"), F.lit(0)).cast("long").alias("s2"),
        F.coalesce(F.sum(F.col("i2") * F.col("i2")), F.lit(0)).cast("long").alias("q2"),
        F.coalesce(F.sum("i3"), F.lit(0)).cast("long").alias("s3"),
        F.coalesce(F.sum(F.col("i3") * F.col("i3")), F.lit(0)).cast("long").alias("q3"),
        F.coalesce(F.sum(F.col("i1") + F.col("i2") + F.col("i3")), F.lit(0))
        .cast("long")
        .alias("stt"),
        F.coalesce(
            F.sum(
                (F.col("i1") + F.col("i2") + F.col("i3"))
                * (F.col("i1") + F.col("i2") + F.col("i3"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("qtt"),
    )
    return a.select(
        F.col("n").alias("n_docs"),
        F.expr(
            "CAST(CASE WHEN n < 2 OR CAST(qtt AS DOUBLE) * n = CAST(stt AS DOUBLE) * stt"
            " THEN 0"
            " ELSE round(1000000 * (3.0 / 2)"
            " * (1 - ((CAST(q1 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)"
            "         + (CAST(q2 AS DOUBLE) * n - CAST(s2 AS DOUBLE) * s2)"
            "         + (CAST(q3 AS DOUBLE) * n - CAST(s3 AS DOUBLE) * s3))"
            "    / (CAST(qtt AS DOUBLE) * n - CAST(stt AS DOUBLE) * stt)))"
            " END AS BIGINT)"
        ).alias("alpha_q6"),
    )
