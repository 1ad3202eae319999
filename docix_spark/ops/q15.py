"""driver_queries chunk q15 (original lines 52050-55479): best_split_changepoint, quality_gate_pr_auc, eb_ctr_shrinkage, post_stratified_estimate, ... logbucket_quantile_estimate (28 ops).

Linearized continuation of docix_spark.ops.q14 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q14")

@register(
    "best_split_changepoint",
    f"""WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
cum AS (
  SELECT day_num, n,
         CAST(sum(1) OVER w AS BIGINT) AS cn,
         CAST(sum(n) OVER w AS BIGINT) AS cs,
         CAST(sum(n * n) OVER w AS BIGINT) AS css,
         CAST(count(*) OVER () AS BIGINT) AS tot_n,
         CAST(sum(n) OVER () AS BIGINT) AS tot_s,
         CAST(sum(n * n) OVER () AS BIGINT) AS tot_ss
  FROM f
  WINDOW w AS (ORDER BY day_num ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
sp AS (
  SELECT day_num, cn AS na, cs AS sa, css AS ssa,
         tot_n - cn AS nb, tot_s - cs AS sb, tot_ss - css AS ssb
  FROM cum WHERE cn >= 2 AND tot_n - cn >= 2),
z AS (SELECT day_num, na, nb, sa, sb, {_TTEST_EXPR} AS t2_q6 FROM sp),
best AS (
  SELECT day_num, na, nb, sa, sb, t2_q6 FROM (
    SELECT *, row_number() OVER (ORDER BY t2_q6 DESC, day_num ASC) AS rn FROM z) _z
  WHERE rn = 1)
SELECT day_num AS split_after_day, na AS n_left, nb AS n_right,
       CAST((1000000 * sa) // na AS BIGINT) AS mean_left_q6,
       CAST((1000000 * sb) // nb AS BIGINT) AS mean_right_q6,
       t2_q6
FROM best""",
)
def best_split_changepoint(spark, sf_dir):
    """Changepoint LOCALIZATION by exhaustive best split: for every day
    boundary, Welch's t² between the daily-count means before and after
    (the binary-segmentation step every changepoint library runs
    first), reporting the argmax split with both segment means —
    events_cusum_anomaly DETECTS that a shift exists and flags when the
    cumulative sum drifts; this names the most likely WHERE, which is
    what an incident review actually needs. The prefix-sum trick makes
    all |days| candidate splits fall out of ONE cumulative pass
    (left stats = prefix, right = total − prefix).

    Determinism: prefix sums are exact BIGINTs over the zero-filled
    spine; each split's t² is the shared _TTEST_EXPR (q6-per-split
    FIRST), and the argmax tiebreaks on the earlier day; both-sides-≥2
    guards the variance terms.

    Scale shape: day cells only — one window pass and a
    calendar-bounded argmax."""
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
        "day_num", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = f.select(
        "day_num",
        F.sum(F.lit(1)).over(w).cast("long").alias("cn"),
        F.sum("n").over(w).cast("long").alias("cs"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("long").alias("css"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("tot_n"),
        F.sum("n").over(w_all).cast("long").alias("tot_s"),
        F.sum(F.col("n") * F.col("n")).over(w_all).cast("long").alias("tot_ss"),
    )
    sp = cum.where(
        (F.col("cn") >= 2) & (F.col("tot_n") - F.col("cn") >= 2)
    ).select(
        "day_num",
        F.col("cn").alias("na"),
        F.col("cs").alias("sa"),
        F.col("css").alias("ssa"),
        (F.col("tot_n") - F.col("cn")).alias("nb"),
        (F.col("tot_s") - F.col("cs")).alias("sb"),
        (F.col("tot_ss") - F.col("css")).alias("ssb"),
    )
    z = sp.select("day_num", "na", "nb", "sa", "sb", F.expr(_TTEST_EXPR).alias("t2_q6"))
    best = (
        z.agg(
            F.max(
                F.struct(
                    F.col("t2_q6"),
                    (-F.col("day_num")).alias("nd"),
                    F.col("na"),
                    F.col("nb"),
                    F.col("sa"),
                    F.col("sb"),
                )
            ).alias("t")
        )
    )
    return best.select(
        (-F.col("t.nd")).cast("long").alias("split_after_day"),
        F.col("t.na").alias("n_left"),
        F.col("t.nb").alias("n_right"),
        F.expr("CAST((1000000 * t.sa) div t.na AS BIGINT)").alias("mean_left_q6"),
        F.expr("CAST((1000000 * t.sb) div t.nb AS BIGINT)").alias("mean_right_q6"),
        F.col("t.t2_q6").alias("t2_q6"),
    )


# ---------------------------------------------------------------------------
# session 214 — PR-AUC, empirical-Bayes shrinkage, post-stratification
# ---------------------------------------------------------------------------


@register(
    "quality_gate_pr_auc",
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
               CAST(sum(ca) OVER (ORDER BY score_q6
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
               CAST(sum(cb) OVER (ORDER BY score_q6
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn
        FROM cells),
ap AS (
  SELECT CAST(COALESCE(sum(ca * ((1000000 * cp) // (cp + cn))), 0) AS BIGINT) AS num,
         CAST(COALESCE(sum(ca), 0) AS BIGINT) AS p,
         CAST(COALESCE(sum(cb), 0) AS BIGINT) AS nn
  FROM cum)
SELECT p AS n_pos, nn AS n_neg,
       CAST(num // greatest(p, 1) AS BIGINT) AS ap_q6,
       CAST((1000000 * p) // greatest(p + nn, 1) AS BIGINT) AS prevalence_q6
FROM ap""",
)
def quality_gate_pr_auc(spark, sf_dir):
    """Precision-recall average precision of the TTR gate as a
    duplicate detector — the PR-space twin of quality_gate_roc: ROC-AUC
    flatters detectors on imbalanced labels (duplicates are rare, so
    the huge true-negative mass props the curve up); average precision
    only looks at where the POSITIVES land, which is the honest number
    for a rare-event gate. Ranked by TTR ASCENDING (low diversity
    predicts duplication); ties resolve at cell granularity — each
    score cell's positives take the precision at the CELL boundary,
    the deterministic tie convention. The prevalence column is PR's
    chance baseline (ROC's is always ½).

    Determinism: precision per cell is an integer cross-multiplied
    floor division, weighted by exact positive counts, one final floor
    division — no floats at all.

    Scale shape: score-histogram cells only (the ranking_auc
    machinery with precision in place of the U statistic)."""
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
    wc = Window.orderBy("score_q6").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "ca",
        "cb",
        F.sum("ca").over(wc).cast("long").alias("cp"),
        F.sum("cb").over(wc).cast("long").alias("cn"),
    )
    ap = cum.agg(
        F.coalesce(
            F.sum(F.expr("ca * ((1000000 * cp) div (cp + cn))")), F.lit(0)
        )
        .cast("long")
        .alias("num"),
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("p"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nn"),
    )
    return ap.select(
        F.col("p").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.expr("CAST(num div greatest(p, 1) AS BIGINT)").alias("ap_q6"),
        F.expr("CAST((1000000 * p) div greatest(p + nn, 1) AS BIGINT)").alias(
            "prevalence_q6"
        ),
    )


@register(
    "eb_ctr_shrinkage",
    """WITH u AS (
  SELECT user_id,
         CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS nv,
         CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS nc
  FROM events GROUP BY user_id),
r AS (SELECT CAST((1000 * nc) // nv AS BIGINT) AS c3 FROM u WHERE nv >= 1),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(c3), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(c3 * c3), 0) AS BIGINT) AS s2
      FROM r),
f AS (
  SELECT n, s1, s2,
         CAST(s1 AS DOUBLE) / (1000 * n) AS mr,
         (CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)
           / ((CAST(n AS DOUBLE) * n) * 1000000) AS vr
  FROM a WHERE n > 0)
SELECT n AS n_users,
       CAST(round(1000000 * mr) AS BIGINT) AS mean_ctr_q6,
       CAST(round(1000000000000 * vr) AS BIGINT) AS var_ctr_q12,
       CAST(CASE WHEN n < 2 OR vr <= 0 OR vr >= mr * (1 - mr) THEN 0
            ELSE round(1000000 * (mr * (1 - mr) / vr - 1)) END AS BIGINT)
         AS prior_strength_q6,
       CAST(CASE WHEN n < 2 OR vr <= 0 OR vr >= mr * (1 - mr) THEN 0
            ELSE round(1000000 * mr * (mr * (1 - mr) / vr - 1)) END AS BIGINT)
         AS alpha_q6,
       CAST(CASE WHEN n < 2 OR vr <= 0 OR vr >= mr * (1 - mr) THEN 0
            ELSE round(1000000 * (1 - mr) * (mr * (1 - mr) / vr - 1)) END AS BIGINT)
         AS beta_q6
FROM f""",
)
def eb_ctr_shrinkage(spark, sf_dir):
    """Empirical-Bayes beta prior for per-user click-through rates, by
    method of moments: α+β = m(1−m)/v − 1 from the mean and variance
    of observed per-user CTRs — the James-Stein machinery for RATES:
    a user with 1 view and 1 click is not a 100%-CTR user, and the
    fitted prior says exactly how many pseudo-observations
    (prior_strength = α+β) to blend in: shrunk CTR =
    (clicks + α)/(views + α + β). user_ctr_histogram shows the raw
    bimodality this op turns into a usable estimator; a prior strength
    of 0 (sentinel) means the observed CTRs are MORE dispersed than
    any beta-binomial allows and shrinkage is unjustified — also worth
    knowing.

    Determinism: per-user CTRs quantize to q3 FIRST (q6 squares pass
    2^63 at ~1e9 users — the norm_doclen_corr rule); mean/variance are
    shared float expressions off exact BIGINT sums with chi²-rule
    casts; three guarded sentinels.

    Scale shape: ONE user exchange, then scalar moment algebra."""
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("nv"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("nc"),
    )
    r = u.where(F.col("nv") >= 1).select(
        F.expr("CAST((1000 * nc) div nv AS BIGINT)").alias("c3")
    )
    a = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("c3"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("c3") * F.col("c3")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    mr = "(CAST(s1 AS DOUBLE) / (1000 * n))"
    vr = (
        "((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)"
        " / ((CAST(n AS DOUBLE) * n) * 1000000))"
    )
    bad = f"n < 2 OR {vr} <= 0 OR {vr} >= {mr} * (1 - {mr})"
    ab = f"({mr} * (1 - {mr}) / {vr} - 1)"
    return a.where(F.col("n") > 0).select(
        F.col("n").alias("n_users"),
        F.expr(f"CAST(round(1000000 * {mr}) AS BIGINT)").alias("mean_ctr_q6"),
        F.expr(f"CAST(round(1000000000000 * {vr}) AS BIGINT)").alias(
            "var_ctr_q12"
        ),
        F.expr(
            f"CAST(CASE WHEN {bad} THEN 0"
            f" ELSE round(1000000 * {ab}) END AS BIGINT)"
        ).alias("prior_strength_q6"),
        F.expr(
            f"CAST(CASE WHEN {bad} THEN 0"
            f" ELSE round(1000000 * {mr} * {ab}) END AS BIGINT)"
        ).alias("alpha_q6"),
        F.expr(
            f"CAST(CASE WHEN {bad} THEN 0"
            f" ELSE round(1000000 * (1 - {mr}) * {ab}) END AS BIGINT)"
        ).alias("beta_q6"),
    )


@register(
    "post_stratified_estimate",
    f"""WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS x
  FROM documents),
samp AS (
  SELECT doc_id, source, x,
         substr(md5(CAST(doc_id AS VARCHAR)), 9, 4) AS hk
  FROM t ORDER BY hk, doc_id LIMIT 100),
sm AS (SELECT source, CAST(count(*) AS BIGINT) AS ns,
              CAST(COALESCE(sum(x), 0) AS BIGINT) AS sx
       FROM samp GROUP BY source),
pop AS (SELECT source, CAST(count(*) AS BIGINT) AS np,
               CAST(COALESCE(sum(x), 0) AS BIGINT) AS px
        FROM t GROUP BY source),
j AS (SELECT sm.source, sm.ns, sm.sx, pop.np FROM sm JOIN pop USING (source)),
w AS (SELECT CAST(COALESCE(sum(np), 0) AS BIGINT) AS covered_pop FROM j),
pt AS (
  SELECT CAST(round(1000000000 * (CAST(j.np AS DOUBLE) * j.sx)
              / (CAST(j.ns AS DOUBLE) * w.covered_pop)) AS BIGINT) AS term_q9
  FROM j CROSS JOIN w),
ps AS (SELECT CAST(COALESCE(sum(term_q9), 0) // 1000 AS BIGINT) AS ps_mean_q6
       FROM pt),
raw AS (SELECT CAST(round(1000000 * CAST(COALESCE(sum(x), 0) AS DOUBLE)
               / greatest(count(*), 1)) AS BIGINT) AS raw_mean_q6,
               CAST(count(*) AS BIGINT) AS n_sample
        FROM samp),
tru AS (SELECT CAST(round(1000000 * CAST(COALESCE(sum(x), 0) AS DOUBLE)
               / greatest(count(*), 1)) AS BIGINT) AS true_mean_q6
        FROM t)
SELECT raw.n_sample, raw.raw_mean_q6, ps.ps_mean_q6, tru.true_mean_q6,
       CAST(abs(raw.raw_mean_q6 - tru.true_mean_q6) AS BIGINT) AS raw_err_q6,
       CAST(abs(ps.ps_mean_q6 - tru.true_mean_q6) AS BIGINT) AS ps_err_q6
FROM raw CROSS JOIN ps CROSS JOIN tru""",
)
def post_stratified_estimate(spark, sf_dir):
    """Post-stratification audit, dog-fooding the engine's own sampler:
    take priority_sample_docs' exact 100-doc hash sample, estimate the
    corpus mean token length (a) raw and (b) post-stratified — each
    source's sample mean reweighted by its TRUE population share — and
    report both errors against the exact answer. Post-stratification
    is the standard correction when a uniform sample lands unevenly
    across strata (sample_mix_bias MEASURES that unevenness; this op
    shows what the correction buys on the estimate itself). Strata the
    sample missed entirely carry no sample mean — weights renormalize
    over covered strata, the documented small-sample caveat.

    Determinism: the sample is the verbatim hash-key TakeOrdered
    (hash coordinate 9-12); estimates are shared float expressions
    over exact integer sums, q6-rounded; COALESCE'd sums keep the
    all-empty-doc corpus defined.

    Scale shape: the sample is a 100-row TakeOrdered; population
    shares are one map-side census; the audit never sorts the
    corpus."""
    t = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(spark_tokens("text")).cast("long").alias("x"),
    ).localCheckpoint()  # sample + census + truth consume it
    samp = (
        t.select(
            "doc_id",
            "source",
            "x",
            F.expr("substr(md5(CAST(doc_id AS STRING)), 9, 4)").alias("hk"),
        )
        .orderBy("hk", "doc_id")
        .limit(100)
    )
    sm = samp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("sx"),
    )
    pop = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("px"),
    )
    j = sm.join(pop, "source").select("source", "ns", "sx", "np")
    w = j.agg(F.coalesce(F.sum("np"), F.lit(0)).cast("long").alias("covered_pop"))
    pt = j.crossJoin(F.broadcast(w)).select(
        F.expr(
            "CAST(round(1000000000 * (CAST(np AS DOUBLE) * sx)"
            " / (CAST(ns AS DOUBLE) * covered_pop)) AS BIGINT)"
        ).alias("term_q9")
    )
    ps = pt.agg(
        F.expr("CAST(COALESCE(sum(term_q9), 0) div 1000 AS BIGINT)").alias(
            "ps_mean_q6"
        )
    )
    raw = samp.agg(
        F.expr(
            "CAST(round(1000000 * CAST(COALESCE(sum(x), 0) AS DOUBLE)"
            " / greatest(count(*), 1)) AS BIGINT)"
        ).alias("raw_mean_q6"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    )
    tru = t.agg(
        F.expr(
            "CAST(round(1000000 * CAST(COALESCE(sum(x), 0) AS DOUBLE)"
            " / greatest(count(*), 1)) AS BIGINT)"
        ).alias("true_mean_q6")
    )
    return (
        raw.crossJoin(ps)
        .crossJoin(tru)
        .select(
            "n_sample",
            "raw_mean_q6",
            "ps_mean_q6",
            "true_mean_q6",
            F.expr("CAST(abs(raw_mean_q6 - true_mean_q6) AS BIGINT)").alias(
                "raw_err_q6"
            ),
            F.expr("CAST(abs(ps_mean_q6 - true_mean_q6) AS BIGINT)").alias(
                "ps_err_q6"
            ),
        )
    )


# ---------------------------------------------------------------------------
# session 215 — adaptive nprobe policy, Fleiss kappa, Shapley attribution
# ---------------------------------------------------------------------------


@register(
    "ann_adaptive_nprobe_eval",
    _KMEANS_SQL_PRELUDE
    + f""", qs AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 37 = 0),
bpq AS MATERIALIZED (
  SELECT qid, qv, cid, cq, rn FROM (
    SELECT qs.qid, qs.qv, c.cid,
           CAST(round(1000000000 * list_dot_product(c.cv, qs.qv)
             / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) AS cq,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             CAST(round(1000000000 * list_dot_product(c.cv, qs.qv)
               / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) DESC,
             c.cid ASC) AS rn
    FROM qs, cent2 c) _b WHERE rn <= 3),
mg AS MATERIALIZED (
  SELECT qid,
         max(CASE WHEN rn = 1 THEN cq END)
           - COALESCE(max(CASE WHEN rn = 2 THEN cq END),
                      max(CASE WHEN rn = 1 THEN cq END)) AS margin
  FROM bpq GROUP BY qid),
thr AS (SELECT CAST(COALESCE(sum(margin), 0) // greatest(count(*), 1) AS BIGINT) AS t
        FROM mg),
pols AS MATERIALIZED (
  SELECT 'a_fixed1' AS policy, qid, 1 AS p FROM mg
  UNION ALL
  SELECT 'b_adaptive', mg.qid,
         CASE WHEN mg.margin >= thr.t THEN 1 ELSE 3 END FROM mg, thr
  UNION ALL
  SELECT 'c_fixed3', qid, 3 FROM mg),
sc AS MATERIALIZED (
  SELECT pols.policy, b.qid, e.vec_id,
         CAST(round(1000000 * list_dot_product(e.v, b.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(b.qv, b.qv)))) AS BIGINT) AS cos_q6
  FROM pols, bpq b, a3, e
  WHERE b.qid = pols.qid AND b.rn <= pols.p AND a3.cid = b.cid
    AND e.vec_id = a3.vec_id),
tops AS (
  SELECT policy, qid, vec_id FROM (
    SELECT policy, qid, vec_id,
           row_number() OVER (PARTITION BY policy, qid
                              ORDER BY cos_q6 DESC, vec_id ASC) AS rnk
    FROM sc) _t WHERE rnk <= 10),
bexact AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT qs.qid, e.vec_id,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             CAST(round(1000000 * list_dot_product(e.v, qs.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.qv, qs.qv)))) AS BIGINT) DESC,
             e.vec_id ASC) AS rn
    FROM qs, e WHERE e.vec_id <> 0) _e WHERE rn <= 10),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM qs),
ov AS (SELECT policy, CAST(count(*) AS BIGINT) AS sum_overlap
       FROM tops JOIN bexact USING (qid, vec_id) GROUP BY policy),
cost AS (SELECT policy, CAST(count(*) AS BIGINT) AS scanned_rows FROM sc GROUP BY policy),
pls AS (SELECT DISTINCT policy FROM pols),
fin AS (
  SELECT pls.policy, nq.n_queries,
         CAST(COALESCE(ov.sum_overlap, 0) AS BIGINT) AS sum_overlap,
         CAST(COALESCE(cost.scanned_rows, 0) AS BIGINT) AS scanned_rows
  FROM pls
  LEFT JOIN ov ON ov.policy = pls.policy
  LEFT JOIN cost ON cost.policy = pls.policy
  CROSS JOIN nq)
SELECT policy, n_queries, sum_overlap, {_NPROBE_RECALL_EXPR} AS recall_q6,
       scanned_rows
FROM fin ORDER BY policy""",
)
def ann_adaptive_nprobe_eval(spark, sf_dir):
    """Adaptive-nprobe POLICY evaluation over the shared trained IVF:
    route each query by its coarse top1−top2 margin — confident queries
    (margin ≥ the batch mean) probe 1 cell, boundary queries probe 3 —
    and report recall@10 AND scanned candidate volume against the fixed
    1 and 3 baselines. This is the production capstone of the nprobe
    family: ann_ivf_nprobe_curve prices the fixed knob,
    ivf_assign_margin shows the margin distribution, this op closes the
    loop by SPENDING scan budget only where the margin says the answer
    is ambiguous (the adaptive routing every serious ANN service ships;
    the win condition is adaptive recall ≈ fixed-3 at scan cost ≈
    fixed-1's side of the curve).

    Determinism: margins are exact q9 integer differences (single-cell
    corner COALESCEs to margin 0 → confident); the threshold is an
    integer mean; rankings quantize with vec_id tiebreaks.

    Scale shape: ONE coarse ranking feeds all three policies via a
    policy-spine join; scoring stays inside probed cells; the exact
    side is the recall denominator only (the nprobe-curve precedent)."""
    members, cent, final_assign = _trained_ivf(spark, sf_dir)
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cq"), F.asc("cid"))
    bpq = (
        qs.crossJoin(F.broadcast(cent))
        .select("qid", "qv", "cid", _cosq("cv", "qv", 1_000_000_000).alias("cq"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 3)
        .localCheckpoint()  # margins + three policy probes consume it
    )
    mg = bpq.groupBy("qid").agg(
        (
            F.max(F.when(F.col("rn") == 1, F.col("cq")))
            - F.coalesce(
                F.max(F.when(F.col("rn") == 2, F.col("cq"))),
                F.max(F.when(F.col("rn") == 1, F.col("cq"))),
            )
        ).alias("margin")
    )
    thr = mg.agg(
        F.expr(
            "CAST(COALESCE(sum(margin), 0) div greatest(count(*), 1) AS BIGINT)"
        ).alias("t")
    )
    pols = (
        mg.select(F.lit("a_fixed1").alias("policy"), "qid", F.lit(1).alias("p"))
        .unionByName(
            mg.crossJoin(F.broadcast(thr)).select(
                F.lit("b_adaptive").alias("policy"),
                "qid",
                F.expr("CASE WHEN margin >= t THEN 1 ELSE 3 END").alias("p"),
            )
        )
        .unionByName(
            mg.select(F.lit("c_fixed3").alias("policy"), "qid", F.lit(3).alias("p"))
        )
    )
    sc = (
        members.join(final_assign, "vec_id")
        .join(
            F.broadcast(
                bpq.join(pols, "qid").where(F.col("rn") <= F.col("p")).select(
                    "policy", "qid", "qv", "cid"
                )
            ),
            "cid",
        )
        .select("policy", "qid", "vec_id", _cosq("v", "qv", 1_000_000).alias("cos_q6"))
        .localCheckpoint()  # tops + scan-cost census consume it
    )
    wr = Window.partitionBy("policy", "qid").orderBy(
        F.desc("cos_q6"), F.asc("vec_id")
    )
    tops = (
        sc.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 10)
        .select("policy", "qid", "vec_id")
    )
    we = Window.partitionBy("qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    bexact = _ann_exact_top10(spark, sf_dir).select("qid", "vec_id")
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    ov = tops.join(bexact, ["qid", "vec_id"]).groupBy("policy").agg(
        F.count(F.lit(1)).cast("long").alias("sum_overlap")
    )
    cost = sc.groupBy("policy").agg(
        F.count(F.lit(1)).cast("long").alias("scanned_rows")
    )
    pls = spark.createDataFrame(
        [("a_fixed1",), ("b_adaptive",), ("c_fixed3",)], "policy string"
    )
    return (
        pls.join(ov, "policy", "left")
        .join(cost, "policy", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "policy",
            "n_queries",
            F.coalesce("sum_overlap", F.lit(0)).cast("long").alias("sum_overlap"),
            F.expr(_NPROBE_RECALL_EXPR).alias("recall_q6"),
            F.coalesce("scanned_rows", F.lit(0)).cast("long").alias("scanned_rows"),
        )
        .orderBy("policy")
    )


# the three gates of filter_order_advisor, reused as independent "raters"
_GATES_SQL = f"""tf AS ({SQL_TF}),
s AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM tf GROUP BY doc_id),
g AS (
  SELECT CASE WHEN s.n_tok >= 8 THEN 1 ELSE 0 END AS a,
         CASE WHEN 5 * s.n_distinct >= 2 * s.n_tok THEN 1 ELSE 0 END AS b,
         CASE WHEN d.lang <> 'zh' THEN 1 ELSE 0 END AS c
  FROM s JOIN documents d USING (doc_id))"""


@register(
    "gates_fleiss_kappa",
    f"""WITH {_GATES_SQL},
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(COALESCE(sum(a + b + c), 0) AS BIGINT) AS t,
         CAST(COALESCE(sum(CASE WHEN a + b + c IN (0, 3) THEN 6 ELSE 2 END), 0)
              AS BIGINT) AS s6
  FROM g)
SELECT n AS n_docs,
       CAST(round(1000000 * CAST(s6 AS DOUBLE) / (6 * n)) AS BIGINT) AS pbar_q6,
       CAST(round(1000000 * ((CAST(t AS DOUBLE) / (3 * n)) * (CAST(t AS DOUBLE) / (3 * n))
            + (1 - CAST(t AS DOUBLE) / (3 * n)) * (1 - CAST(t AS DOUBLE) / (3 * n))))
            AS BIGINT) AS pe_q6,
       CAST(CASE WHEN t = 0 OR t = 3 * n THEN 0
            ELSE round(1000000
              * (CAST(s6 AS DOUBLE) / (6 * n)
                 - ((CAST(t AS DOUBLE) / (3 * n)) * (CAST(t AS DOUBLE) / (3 * n))
                    + (1 - CAST(t AS DOUBLE) / (3 * n)) * (1 - CAST(t AS DOUBLE) / (3 * n))))
              / (1 - ((CAST(t AS DOUBLE) / (3 * n)) * (CAST(t AS DOUBLE) / (3 * n))
                    + (1 - CAST(t AS DOUBLE) / (3 * n)) * (1 - CAST(t AS DOUBLE) / (3 * n)))))
            END AS BIGINT) AS fleiss_kappa_q6
FROM m WHERE n > 0""",
)
def gates_fleiss_kappa(spark, sf_dir):
    """Fleiss' κ treating the three quality gates (length, TTR, lang —
    filter_order_advisor's A/B/C) as three RATERS voting pass/fail on
    every document — the multi-rater completion of the agreement
    family: quality_gate_kappa is Cohen's κ for TWO gates,
    quality_cronbach_alpha is consistency of CONTINUOUS items, Fleiss
    is k binary raters. With 3 raters the per-item agreement P_i is an
    exact sixth — (Σn_j² − 3)/6 is 1 for unanimous items and 1/3 for
    2-1 splits — so P̄'s numerator is an exact BIGINT sum of {2, 6}.
    κ near 0 says the gates vote independently (stack them); κ near 1
    says they are one gate in three costumes (keep the cheapest).

    Determinism: exact integer agreement numerators and vote totals;
    the chance-agreement and κ combine in ONE shared float expression;
    unanimous-corpus sentinels.

    Scale shape: the gate flags ride the filter_order tf pass; one
    3-number aggregate."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    g = s.join(d, "doc_id").select(
        F.expr("CASE WHEN n_tok >= 8 THEN 1 ELSE 0 END").alias("a"),
        F.expr("CASE WHEN 5 * n_distinct >= 2 * n_tok THEN 1 ELSE 0 END").alias("b"),
        F.expr("CASE WHEN lang <> 'zh' THEN 1 ELSE 0 END").alias("c"),
    )
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col("a") + F.col("b") + F.col("c")), F.lit(0))
        .cast("long")
        .alias("t"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN a + b + c IN (0, 3) THEN 6 ELSE 2 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("s6"),
    )
    p = "(CAST(t AS DOUBLE) / (3 * n))"
    pe = f"({p} * {p} + (1 - {p}) * (1 - {p}))"
    pbar = "(CAST(s6 AS DOUBLE) / (6 * n))"
    return m.where(F.col("n") > 0).select(
        F.col("n").alias("n_docs"),
        F.expr(f"CAST(round(1000000 * {pbar}) AS BIGINT)").alias("pbar_q6"),
        F.expr(f"CAST(round(1000000 * {pe}) AS BIGINT)").alias("pe_q6"),
        F.expr(
            f"CAST(CASE WHEN t = 0 OR t = 3 * n THEN 0"
            f" ELSE round(1000000 * ({pbar} - {pe}) / (1 - {pe})) END AS BIGINT)"
        ).alias("fleiss_kappa_q6"),
    )


@register(
    "gate_shapley_attribution",
    f"""WITH {_GATES_SQL},
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(COALESCE(sum(a), 0) AS BIGINT) AS na,
         CAST(COALESCE(sum(b), 0) AS BIGINT) AS nb,
         CAST(COALESCE(sum(c), 0) AS BIGINT) AS nc,
         CAST(COALESCE(sum(a * b), 0) AS BIGINT) AS nab,
         CAST(COALESCE(sum(a * c), 0) AS BIGINT) AS nac,
         CAST(COALESCE(sum(b * c), 0) AS BIGINT) AS nbc,
         CAST(COALESCE(sum(a * b * c), 0) AS BIGINT) AS nabc
  FROM g)
SELECT gate, phi_q6, v_solo_q6
FROM (
  SELECT 'a_length' AS gate,
         CAST((1000000 * (2 * (na - n) + (nab - nb) + (nac - nc)
               + 2 * (nabc - nbc))) // (6 * greatest(n, 1)) AS BIGINT) AS phi_q6,
         CAST((1000000 * na) // greatest(n, 1) AS BIGINT) AS v_solo_q6 FROM m
  UNION ALL
  SELECT 'b_ttr',
         CAST((1000000 * (2 * (nb - n) + (nab - na) + (nbc - nc)
               + 2 * (nabc - nac))) // (6 * greatest(n, 1)) AS BIGINT),
         CAST((1000000 * nb) // greatest(n, 1) AS BIGINT) FROM m
  UNION ALL
  SELECT 'c_lang',
         CAST((1000000 * (2 * (nc - n) + (nac - na) + (nbc - nb)
               + 2 * (nabc - nab))) // (6 * greatest(n, 1)) AS BIGINT),
         CAST((1000000 * nc) // greatest(n, 1) AS BIGINT) FROM m
) ORDER BY gate""",
)
def gate_shapley_attribution(spark, sf_dir):
    """Exact Shapley attribution of the quality cascade's removal mass:
    with v(S) = pass share applying the gates in S (v(∅) = 1), each
    gate's Shapley value φ averages its marginal pass-rate change over
    all 3! arrival orders — computable in CLOSED FORM from the same
    8-cell contingency as filter_order_advisor, so no sampling and no
    ordering bias. pipeline_waterfall attributes removals to whichever
    gate happens to run first (order-dependent by construction); φ is
    the order-INDEPENDENT answer to 'which gate is actually doing the
    cutting', and efficiency guarantees Σφ = v(ABC) − 1 exactly — the
    total cut mass splits with nothing lost or double-counted.

    Determinism: φ numerators are exact BIGINT combinations of the
    conditional sums; ONE signed integer division per gate (both
    engines truncate toward zero, the session-105 rule; φ ≤ 0 always
    since gates only remove).

    Scale shape: one map-side 8-counter aggregate; 3 output rows
    stacked from it."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    g = s.join(d, "doc_id").select(
        F.expr("CASE WHEN n_tok >= 8 THEN 1 ELSE 0 END").alias("a"),
        F.expr("CASE WHEN 5 * n_distinct >= 2 * n_tok THEN 1 ELSE 0 END").alias("b"),
        F.expr("CASE WHEN lang <> 'zh' THEN 1 ELSE 0 END").alias("c"),
    )
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("a"), F.lit(0)).cast("long").alias("na"),
        F.coalesce(F.sum("b"), F.lit(0)).cast("long").alias("nb"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("nc"),
        F.coalesce(F.sum(F.col("a") * F.col("b")), F.lit(0)).cast("long").alias("nab"),
        F.coalesce(F.sum(F.col("a") * F.col("c")), F.lit(0)).cast("long").alias("nac"),
        F.coalesce(F.sum(F.col("b") * F.col("c")), F.lit(0)).cast("long").alias("nbc"),
        F.coalesce(F.sum(F.col("a") * F.col("b") * F.col("c")), F.lit(0))
        .cast("long")
        .alias("nabc"),
    )
    cells = [
        (
            "a_length",
            "2 * (na - n) + (nab - nb) + (nac - nc) + 2 * (nabc - nbc)",
            "na",
        ),
        (
            "b_ttr",
            "2 * (nb - n) + (nab - na) + (nbc - nc) + 2 * (nabc - nac)",
            "nb",
        ),
        (
            "c_lang",
            "2 * (nc - n) + (nac - na) + (nbc - nb) + 2 * (nabc - nab)",
            "nc",
        ),
    ]
    stack = ", ".join(
        f"'{g_}', CAST((1000000 * ({num})) div (6 * greatest(n, 1)) AS BIGINT),"
        f" CAST((1000000 * {solo}) div greatest(n, 1) AS BIGINT)"
        for g_, num, solo in cells
    )
    return (
        m.select(
            F.expr(f"stack(3, {stack}) AS (gate, phi_q6, v_solo_q6)")
        ).orderBy("gate")
    )


# ---------------------------------------------------------------------------
# session 216 — 1-D DBSCAN, decision stump, price-volume-mix bridge
# ---------------------------------------------------------------------------


@register(
    "doclen_dbscan_1d",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS v
  FROM documents),
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY v),
brk AS (
  SELECT v, cnt,
         CASE WHEN v - lag(v) OVER (ORDER BY v) > 4 THEN 1 ELSE 0 END AS nb
  FROM hist),
cl AS (
  SELECT v, cnt,
         CAST(COALESCE(sum(nb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS cid
  FROM brk),
cs AS (
  SELECT cid, CAST(min(v) AS BIGINT) AS vmin, CAST(max(v) AS BIGINT) AS vmax,
         CAST(sum(cnt) AS BIGINT) AS mass
  FROM cl GROUP BY cid),
dense AS (SELECT * FROM cs WHERE mass >= 5),
noise AS (SELECT CAST(COALESCE(sum(mass), 0) AS BIGINT) AS n_noise
          FROM cs WHERE mass < 5),
top5 AS (
  SELECT vmin, vmax, mass,
         row_number() OVER (ORDER BY mass DESC, vmin ASC) AS rk
  FROM dense)
SELECT CAST(rk AS BIGINT) AS cluster_rank, vmin, vmax, mass,
       (SELECT CAST(count(*) AS BIGINT) FROM dense) AS n_dense_clusters,
       noise.n_noise AS n_noise_docs
FROM top5 CROSS JOIN noise WHERE rk <= 5 ORDER BY cluster_rank""",
)
def doclen_dbscan_1d(spark, sf_dir):
    """1-D DBSCAN over document token lengths (eps = 4, minPts = 5):
    density clusters are maximal runs of occupied length values with
    gaps ≤ eps, and runs carrying < minPts documents are NOISE — the
    density-based rival to value_kmeans_buckets' centroid clustering
    (k-means must output k buckets even on a unimodal distribution and
    splits bridges arbitrarily; DBSCAN discovers the MODE COUNT, which
    is the real question: 'is this corpus one length population or a
    mixture of tweet-like and article-like sub-corpora'). In 1-D the
    algorithm degenerates to gaps-and-islands on the value histogram —
    no neighborhood queries, no iteration.

    Determinism: integer gap breaks and running cluster ids over
    sorted histogram cells; top-5 clusters rank by (mass DESC, vmin).

    Scale shape: one value-histogram exchange; islands/rollups on
    cells only."""
    t = _docs(spark, sf_dir).select(
        F.size(spark_tokens("text")).cast("long").alias("v")
    )
    hist = t.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wv = Window.orderBy("v")
    brk = hist.select(
        "v",
        "cnt",
        F.expr(
            "CASE WHEN v - lag(v) OVER (ORDER BY v) > 4 THEN 1 ELSE 0 END"
        ).alias("nb"),
    )
    cl = brk.select(
        "v",
        "cnt",
        F.coalesce(
            F.sum("nb").over(
                wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("cid"),
    )
    cs = cl.groupBy("cid").agg(
        F.min("v").cast("long").alias("vmin"),
        F.max("v").cast("long").alias("vmax"),
        F.sum("cnt").cast("long").alias("mass"),
    ).localCheckpoint()  # dense census + noise + top-5 consume it
    dense = cs.where(F.col("mass") >= 5)
    noise = cs.where(F.col("mass") < 5).agg(
        F.coalesce(F.sum("mass"), F.lit(0)).cast("long").alias("n_noise_docs")
    )
    nd = dense.agg(F.count(F.lit(1)).cast("long").alias("n_dense_clusters"))
    top5 = dense.withColumn(
        "cluster_rank",
        F.row_number()
        .over(Window.orderBy(F.desc("mass"), F.asc("vmin")))
        .cast("long"),
    ).where(F.col("cluster_rank") <= 5)
    return (
        top5.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(noise))
        .select(
            "cluster_rank",
            "vmin",
            "vmax",
            "mass",
            "n_dense_clusters",
            "n_noise_docs",
        )
        .orderBy("cluster_rank")
    )


# binary entropy of (x of n) in nats — ONE shared string; 0 at the edges
def _h2(x: str, n: str) -> str:
    return (
        f"(CASE WHEN {x} = 0 OR {x} = {n} THEN 0e0 ELSE "
        f"-((CAST({x} AS DOUBLE) / {n}) * ln(CAST({x} AS DOUBLE) / {n})"
        f" + (1 - CAST({x} AS DOUBLE) / {n}) * ln(1 - CAST({x} AS DOUBLE) / {n}))"
        f" END)"
    )


@register(
    "quality_stump_threshold",
    f"""WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
dupg AS (SELECT hh FROM h GROUP BY hh HAVING count(*) > 1),
lab0 AS (SELECT h.doc_id,
                CASE WHEN dupg.hh IS NULL THEN 0 ELSE 1 END AS is_dup
         FROM h LEFT JOIN dupg ON dupg.hh = h.hh),
tf AS ({SQL_TF}),
q AS (SELECT doc_id,
             CAST(round(1e6 * count(*) / CAST(sum(tf) AS BIGINT)) AS BIGINT) AS ttr_q6
      FROM tf GROUP BY doc_id),
lab AS (SELECT q.ttr_q6 AS s, lab0.is_dup
        FROM q JOIN lab0 ON lab0.doc_id = q.doc_id),
cells AS (SELECT s, CAST(COALESCE(sum(is_dup), 0) AS BIGINT) AS ca,
                 CAST(COALESCE(sum(1 - is_dup), 0) AS BIGINT) AS cb
          FROM lab GROUP BY s),
cum AS (SELECT s,
               CAST(sum(ca) OVER w AS BIGINT) AS cp,
               CAST(sum(cb) OVER w AS BIGINT) AS cn,
               CAST(sum(ca) OVER () AS BIGINT) AS p,
               CAST(sum(cb) OVER () AS BIGINT) AS nn
        FROM cells
        WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
ig AS (
  SELECT s, cp, cn, p, nn,
         CAST(round(1000000 * ({_h2('p', '(p + nn)')}
           - (CAST(cp + cn AS DOUBLE) / (p + nn)) * ({_h2('cp', '(cp + cn)')})
           - (CAST(p + nn - cp - cn AS DOUBLE) / (p + nn))
             * ({_h2('(p - cp)', '(p + nn - cp - cn)')}))) AS BIGINT) AS ig_q6
  FROM cum WHERE cp + cn >= 1 AND p + nn - cp - cn >= 1),
best AS (
  SELECT s, cp, cn, p, nn, ig_q6 FROM (
    SELECT *, row_number() OVER (ORDER BY ig_q6 DESC, s ASC) AS rk FROM ig) _i
  WHERE rk = 1)
SELECT s AS threshold_ttr_q6,
       CAST(cp + cn AS BIGINT) AS n_left,
       CAST(p + nn - cp - cn AS BIGINT) AS n_right,
       CAST((1000000 * cp) // greatest(cp + cn, 1) AS BIGINT) AS left_dup_rate_q6,
       CAST((1000000 * (p - cp)) // greatest(p + nn - cp - cn, 1) AS BIGINT)
         AS right_dup_rate_q6,
       ig_q6
FROM best""",
)
def quality_stump_threshold(spark, sf_dir):
    """Decision-stump training on the TTR signal against the exact-dup
    label: the single threshold maximizing INFORMATION GAIN — the
    supervised completion of the quality-gate family
    (quality_gate_roc/pr score the signal as given; this op picks the
    CUT a tree learner's first node would pick, with the leaf dup
    rates that justify it). Every candidate boundary falls out of one
    cumulative pass over the score histogram, the
    best_split_changepoint discipline with entropy in place of t².

    Determinism: entropies are ONE shared expression over exact
    cumulative integers (edge-entropy CASEs make 0·ln0 exact), IG
    q6-rounds per THRESHOLD before the argmax, tiebreak lower
    threshold; degenerate sides are filtered.

    Scale shape: score-histogram cells only; the argmax is a cell-
    bounded window."""
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
        ).alias("s")
    )
    lab = q.join(lab0, "doc_id").select("s", "is_dup")
    cells = lab.groupBy("s").agg(
        F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("ca"),
        F.coalesce(F.sum(F.lit(1) - F.col("is_dup")), F.lit(0))
        .cast("long")
        .alias("cb"),
    )
    wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cells.select(
        "s",
        F.sum("ca").over(wc).cast("long").alias("cp"),
        F.sum("cb").over(wc).cast("long").alias("cn"),
        F.sum("ca").over(w_all).cast("long").alias("p"),
        F.sum("cb").over(w_all).cast("long").alias("nn"),
    )
    ig = cum.where(
        (F.col("cp") + F.col("cn") >= 1)
        & (F.col("p") + F.col("nn") - F.col("cp") - F.col("cn") >= 1)
    ).select(
        "s",
        "cp",
        "cn",
        "p",
        "nn",
        F.expr(
            f"CAST(round(1000000 * ({_h2('p', '(p + nn)')}"
            f" - (CAST(cp + cn AS DOUBLE) / (p + nn)) * ({_h2('cp', '(cp + cn)')})"
            f" - (CAST(p + nn - cp - cn AS DOUBLE) / (p + nn))"
            f"   * ({_h2('(p - cp)', '(p + nn - cp - cn)')}))) AS BIGINT)"
        ).alias("ig_q6"),
    )
    best = ig.agg(
        F.max(
            F.struct(
                F.col("ig_q6"),
                (-F.col("s")).alias("ns"),
                F.col("cp"),
                F.col("cn"),
                F.col("p"),
                F.col("nn"),
            )
        ).alias("t")
    )
    return best.select(
        (-F.col("t.ns")).cast("long").alias("threshold_ttr_q6"),
        (F.col("t.cp") + F.col("t.cn")).cast("long").alias("n_left"),
        (F.col("t.p") + F.col("t.nn") - F.col("t.cp") - F.col("t.cn"))
        .cast("long")
        .alias("n_right"),
        F.expr(
            "CAST((1000000 * t.cp) div greatest(t.cp + t.cn, 1) AS BIGINT)"
        ).alias("left_dup_rate_q6"),
        F.expr(
            "CAST((1000000 * (t.p - t.cp))"
            " div greatest(t.p + t.nn - t.cp - t.cn, 1) AS BIGINT)"
        ).alias("right_dup_rate_q6"),
        F.col("t.ig_q6").alias("ig_q6"),
    )


@register(
    "brand_pvm_bridge",
    """WITH li AS (
  SELECT p.p_brand AS brand,
         epoch_us(l.l_shipdate) // 86400000000 AS sd,
         CAST(round(100 * l.l_extendedprice) AS BIGINT) AS cents,
         CAST(round(100 * l.l_quantity) AS BIGINT) AS qc
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
b AS (SELECT CAST(min(sd) AS BIGINT) AS lo, CAST(max(sd) AS BIGINT) AS hi FROM li),
hh AS (
  SELECT brand,
         CASE WHEN li.sd <= (b.lo + b.hi) // 2 THEN 1 ELSE 2 END AS half,
         cents, qc
  FROM li, b),
g AS (
  SELECT brand,
         CAST(COALESCE(sum(CASE WHEN half = 1 THEN qc ELSE 0 END), 0) AS BIGINT) AS q1,
         CAST(COALESCE(sum(CASE WHEN half = 1 THEN cents ELSE 0 END), 0) AS BIGINT) AS r1,
         CAST(COALESCE(sum(CASE WHEN half = 2 THEN qc ELSE 0 END), 0) AS BIGINT) AS q2,
         CAST(COALESCE(sum(CASE WHEN half = 2 THEN cents ELSE 0 END), 0) AS BIGINT) AS r2
  FROM hh GROUP BY brand)
SELECT brand, r1 AS h1_cents, r2 AS h2_cents,
       r2 - r1 AS delta_cents,
       CAST(CASE WHEN q1 = 0 OR q2 = 0 THEN r2 - r1
            ELSE round(CAST(r1 AS DOUBLE) * (q2 - q1) / q1) END AS BIGINT)
         AS volume_effect_cents,
       CAST((r2 - r1) - CASE WHEN q1 = 0 OR q2 = 0 THEN r2 - r1
            ELSE round(CAST(r1 AS DOUBLE) * (q2 - q1) / q1) END AS BIGINT)
         AS price_effect_cents
FROM g ORDER BY brand""",
)
def brand_pvm_bridge(spark, sf_dir):
    """Price-volume bridge per brand between the ship-date halves — the
    FP&A decomposition behind every revenue review: ΔR splits into a
    VOLUME effect (second-half quantity at FIRST-half implied price,
    r1·(q2−q1)/q1) and a PRICE effect (the exact residual, so the
    bridge reconciles to the delta BY CONSTRUCTION — no rounding leak
    to chase). Brands trading in only one half attribute the whole
    delta to volume (entering/exiting a market IS a volume event,
    documented convention). discount_rate_by_month shows price-level
    drift; this op says how much of each brand's revenue change that
    drift actually explains versus demand.

    Determinism: cents and centi-quantities are exact per-row
    roundings (the Q1 rule); one float division per brand q0-rounded;
    the residual definition makes the identity exact.

    Scale shape: one fact⋈dim join (part broadcastable), a 1-row
    date-midpoint broadcast, one brand-keyed conditional agg."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            F.broadcast(
                spark.read.parquet(f"{sf_dir}/part.parquet").select(
                    "p_partkey", "p_brand"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.expr(
                "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
            ).alias("sd"),
            F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)").alias("cents"),
            F.expr("CAST(round(100 * l_quantity) AS BIGINT)").alias("qc"),
        )
    )
    b = li.agg(
        F.min("sd").cast("long").alias("lo"), F.max("sd").cast("long").alias("hi")
    )
    hh = li.crossJoin(F.broadcast(b)).select(
        "brand",
        F.expr("CASE WHEN sd <= (lo + hi) div 2 THEN 1 ELSE 2 END").alias("half"),
        "cents",
        "qc",
    )
    g = hh.groupBy("brand").agg(
        F.coalesce(
            F.sum(F.expr("CASE WHEN half = 1 THEN qc ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("q1"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN half = 1 THEN cents ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("r1"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN half = 2 THEN qc ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("q2"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN half = 2 THEN cents ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("r2"),
    )
    vol = (
        "CASE WHEN q1 = 0 OR q2 = 0 THEN r2 - r1"
        " ELSE round(CAST(r1 AS DOUBLE) * (q2 - q1) / q1) END"
    )
    return g.select(
        "brand",
        F.col("r1").alias("h1_cents"),
        F.col("r2").alias("h2_cents"),
        (F.col("r2") - F.col("r1")).alias("delta_cents"),
        F.expr(f"CAST({vol} AS BIGINT)").alias("volume_effect_cents"),
        F.expr(f"CAST((r2 - r1) - {vol} AS BIGINT)").alias("price_effect_cents"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# session 217 — ZIP fit, ABC-XYZ matrix, alert hysteresis
# ---------------------------------------------------------------------------


@register(
    "user_day_zip_fit",
    """WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day_num FROM events),
nz AS (SELECT user_id, day_num, CAST(count(*) AS BIGINT) AS c
       FROM e GROUP BY user_id, day_num),
dims AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
         CAST(max(day_num) - min(day_num) + 1 AS BIGINT) AS nd
  FROM e),
s AS (SELECT CAST(count(*) AS BIGINT) AS nnz,
             CAST(COALESCE(sum(c), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(c * c), 0) AS BIGINT) AS s2
      FROM nz),
f AS (
  SELECT dims.nu * dims.nd AS ncells,
         dims.nu * dims.nd - s.nnz AS zeros,
         s.s1, s.s2,
         CAST(s.s1 AS DOUBLE) / (dims.nu * dims.nd) AS m,
         (CAST(s.s2 AS DOUBLE) * (dims.nu * dims.nd)
           - CAST(s.s1 AS DOUBLE) * s.s1)
           / (CAST(dims.nu * dims.nd AS DOUBLE) * (dims.nu * dims.nd)) AS v
  FROM dims, s)
SELECT CAST(ncells AS BIGINT) AS n_cells,
       CAST((1000000 * zeros) // greatest(ncells, 1) AS BIGINT) AS zero_share_q6,
       CAST(round(1000000 * m) AS BIGINT) AS mean_q6,
       CAST(round(1000000 * v) AS BIGINT) AS var_q6,
       CAST(CASE WHEN m <= 0 OR v <= m THEN 0
            ELSE round(1000000 * (1 - m / ((v + m * m - m) / m))) END AS BIGINT)
         AS pi_q6,
       CAST(CASE WHEN m <= 0 THEN 0
            WHEN v <= m THEN round(1000000 * m)
            ELSE round(1000000 * ((v + m * m - m) / m)) END AS BIGINT) AS lambda_q6,
       CAST(CASE WHEN m <= 0 THEN 1000000
            WHEN v <= m THEN round(1000000 * exp(-m))
            ELSE round(1000000 * ((1 - m / ((v + m * m - m) / m))
                 + (m / ((v + m * m - m) / m)) * exp(-((v + m * m - m) / m))))
            END AS BIGINT) AS p0_pred_q6
FROM f""",
)
def user_day_zip_fit(spark, sf_dir):
    """Zero-inflated Poisson fit of the user×day activity matrix by
    method of moments: π (the share of structurally-silent cells) and
    λ (the activity rate of engaged cells) from mean and variance over
    ALL user-day cells — the count model for data where 'zero' means
    two different things (this user never comes on weekdays vs this
    user just didn't today), which plain Poisson and even the NB fit
    (user_count_nb_fit) conflate. The zero cells are NEVER
    materialized: their count is nu·nd − |nonzero cells|, so the grid
    stays virtual at any scale. v ≤ m (no excess zeros beyond Poisson)
    reports π = 0 with λ = m, the documented degenerate branch; the
    predicted zero share π + (1−π)e^{{-λ}} sits beside the observed one
    as the fit check.

    Determinism: exact BIGINT sufficient stats over nonzero cells;
    mean/variance and the MoM algebra are shared float expressions
    (chi²-rule casts); exp is the accepted 1-ulp libm class.

    Scale shape: one (user, day) groupBy + two scalar censuses."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day_num"
        ),
    )
    nz = e.groupBy("user_id", "day_num").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    dims = e.agg(
        F.countDistinct("user_id").cast("long").alias("nu"),
        (F.max("day_num") - F.min("day_num") + 1).cast("long").alias("nd"),
    )
    s = nz.agg(
        F.count(F.lit(1)).cast("long").alias("nnz"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    m = "(CAST(s1 AS DOUBLE) / (nu * nd))"
    v = (
        "((CAST(s2 AS DOUBLE) * (nu * nd) - CAST(s1 AS DOUBLE) * s1)"
        " / (CAST(nu * nd AS DOUBLE) * (nu * nd)))"
    )
    lam = f"(({v} + {m} * {m} - {m}) / {m})"
    return dims.crossJoin(s).select(
        F.expr("CAST(nu * nd AS BIGINT)").alias("n_cells"),
        F.expr(
            "CAST((1000000 * (nu * nd - nnz)) div greatest(nu * nd, 1) AS BIGINT)"
        ).alias("zero_share_q6"),
        F.expr(f"CAST(round(1000000 * {m}) AS BIGINT)").alias("mean_q6"),
        F.expr(f"CAST(round(1000000 * {v}) AS BIGINT)").alias("var_q6"),
        F.expr(
            f"CAST(CASE WHEN {m} <= 0 OR {v} <= {m} THEN 0"
            f" ELSE round(1000000 * (1 - {m} / {lam})) END AS BIGINT)"
        ).alias("pi_q6"),
        F.expr(
            f"CAST(CASE WHEN {m} <= 0 THEN 0"
            f" WHEN {v} <= {m} THEN round(1000000 * {m})"
            f" ELSE round(1000000 * {lam}) END AS BIGINT)"
        ).alias("lambda_q6"),
        F.expr(
            f"CAST(CASE WHEN {m} <= 0 THEN 1000000"
            f" WHEN {v} <= {m} THEN round(1000000 * exp(-{m}))"
            f" ELSE round(1000000 * ((1 - {m} / {lam})"
            f" + ({m} / {lam}) * exp(-{lam}))) END AS BIGINT)"
        ).alias("p0_pred_q6"),
    )


@register(
    "part_abc_xyz_matrix",
    """WITH li AS (
  SELECT l_partkey,
         CAST(round(100 * l_extendedprice * (1 - l_discount)) AS BIGINT) AS cents,
         CAST(round(100 * l_quantity) AS BIGINT) AS qc,
         CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym
  FROM lineitem),
mm AS (SELECT CAST(count(DISTINCT ym) AS BIGINT) AS nm FROM li),
pm AS (SELECT l_partkey, ym, CAST(sum(qc) AS BIGINT) AS q
       FROM li GROUP BY l_partkey, ym),
pp AS (
  SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS rev
  FROM li GROUP BY l_partkey),
pv AS (
  SELECT pm.l_partkey,
         CAST(COALESCE(sum(pm.q), 0) AS BIGINT) AS s1,
         CAST(COALESCE(sum(pm.q * pm.q), 0) AS BIGINT) AS s2
  FROM pm GROUP BY pm.l_partkey),
rh AS (SELECT rev, CAST(count(*) AS BIGINT) AS nparts,
              CAST(sum(rev) AS BIGINT) AS mass
       FROM pp GROUP BY rev),
rc AS (
  SELECT rev,
         CAST(COALESCE(sum(mass) OVER (ORDER BY rev DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before_,
         CAST(sum(mass) OVER () AS BIGINT) AS tot
  FROM rh),
cls AS (
  SELECT pp.l_partkey, pp.rev,
         CASE WHEN 5 * rc.before_ < 4 * rc.tot THEN 'A'
              WHEN 20 * rc.before_ < 19 * rc.tot THEN 'B'
              ELSE 'C' END AS abc,
         CASE WHEN 4 * (pv.s2 * mm.nm - pv.s1 * pv.s1) <= pv.s1 * pv.s1 THEN 'X'
              WHEN (pv.s2 * mm.nm - pv.s1 * pv.s1) <= pv.s1 * pv.s1 THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM pp JOIN rc ON rc.rev = pp.rev
  JOIN pv ON pv.l_partkey = pp.l_partkey
  CROSS JOIN mm),
spine AS (
  SELECT a.abc, x.xyz
  FROM (VALUES ('A'), ('B'), ('C')) a(abc)
  CROSS JOIN (VALUES ('X'), ('Y'), ('Z')) x(xyz)),
r AS (SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(COALESCE(sum(rev), 0) AS BIGINT) AS revenue_cents
      FROM cls GROUP BY abc, xyz),
tt AS (SELECT CAST(COALESCE(sum(rev), 0) AS BIGINT) AS trev FROM pp)
SELECT spine.abc, spine.xyz,
       CAST(COALESCE(r.n_parts, 0) AS BIGINT) AS n_parts,
       CAST(COALESCE(r.revenue_cents, 0) AS BIGINT) AS revenue_cents,
       CAST((1000000 * COALESCE(r.revenue_cents, 0)) // greatest(tt.trev, 1)
            AS BIGINT) AS rev_share_q6
FROM spine LEFT JOIN r ON r.abc = spine.abc AND r.xyz = spine.xyz
CROSS JOIN tt ORDER BY spine.abc, spine.xyz""",
)
def part_abc_xyz_matrix(spark, sf_dir):
    """ABC-XYZ inventory segmentation of the catalog: ABC by cumulative
    revenue share (A funds 80%, B the next 15%, C the tail — the
    part_revenue_pareto cut turned into a per-part CLASS via the
    value-histogram prefix, ties sharing their bucket's class) crossed
    with XYZ by demand regularity (monthly-quantity CV over the
    observed month span: X steady cv² ≤ ¼, Y variable ≤ 1, Z erratic)
    — the 9-cell board inventory planners actually run replenishment
    policy from (AX: automate, CZ: make-to-order). Both axes exist in
    this registry as separate rankings; the JOINT matrix is where the
    policy lives.

    Determinism: ABC gates are integer cross-multiplications on the
    descending revenue-histogram prefix; XYZ gates are EXACT integer
    comparisons 4·(M·Σq² − (Σq)²) vs (Σq)² — no float CV anywhere
    (zero months enter through M = observed distinct months); the
    9-cell spine keeps empty classes reporting.

    Scale shape: one fact pass fans to per-part revenue + per-(part,
    month) quantities; class assignment joins histogram cells; the
    rollup has 9 cells."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.expr(
            "CAST(round(100 * l_extendedprice * (1 - l_discount)) AS BIGINT)"
        ).alias("cents"),
        F.expr("CAST(round(100 * l_quantity) AS BIGINT)").alias("qc"),
        F.expr(
            "CAST(year(cast(l_shipdate as timestamp)) * 100"
            " + month(cast(l_shipdate as timestamp)) AS BIGINT)"
        ).alias("ym"),
    ).localCheckpoint()  # month census + part rollups consume it
    mm = li.agg(F.countDistinct("ym").cast("long").alias("nm"))
    pm = li.groupBy("l_partkey", "ym").agg(F.sum("qc").cast("long").alias("q"))
    pp = li.groupBy("l_partkey").agg(F.sum("cents").cast("long").alias("rev"))
    pv = pm.groupBy("l_partkey").agg(
        F.coalesce(F.sum("q"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("q") * F.col("q")), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    rh = pp.groupBy("rev").agg(
        F.count(F.lit(1)).cast("long").alias("nparts"),
        F.sum("rev").cast("long").alias("mass"),
    )
    w_b = Window.orderBy(F.col("rev").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rc = rh.select(
        "rev",
        F.coalesce(F.sum("mass").over(w_b), F.lit(0)).cast("long").alias("before_"),
        F.sum("mass").over(w_all).cast("long").alias("tot"),
    )
    cls = (
        pp.join(rc, "rev")
        .join(pv, "l_partkey")
        .crossJoin(F.broadcast(mm))
        .select(
            "l_partkey",
            "rev",
            F.expr(
                "CASE WHEN 5 * before_ < 4 * tot THEN 'A'"
                " WHEN 20 * before_ < 19 * tot THEN 'B' ELSE 'C' END"
            ).alias("abc"),
            F.expr(
                "CASE WHEN 4 * (s2 * nm - s1 * s1) <= s1 * s1 THEN 'X'"
                " WHEN (s2 * nm - s1 * s1) <= s1 * s1 THEN 'Y' ELSE 'Z' END"
            ).alias("xyz"),
        )
    )
    spine = spark.createDataFrame(
        [(a, x) for a in "ABC" for x in "XYZ"], "abc string, xyz string"
    )
    r = cls.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.coalesce(F.sum("rev"), F.lit(0)).cast("long").alias("revenue_cents"),
    )
    tt = pp.agg(F.coalesce(F.sum("rev"), F.lit(0)).cast("long").alias("trev"))
    return (
        spine.join(r, ["abc", "xyz"], "left")
        .crossJoin(F.broadcast(tt))
        .select(
            "abc",
            "xyz",
            F.coalesce("n_parts", F.lit(0)).cast("long").alias("n_parts"),
            F.coalesce("revenue_cents", F.lit(0))
            .cast("long")
            .alias("revenue_cents"),
            F.expr(
                "CAST((1000000 * COALESCE(revenue_cents, 0))"
                " div greatest(trev, 1) AS BIGINT)"
            ).alias("rev_share_q6"),
        )
        .orderBy("abc", "xyz")
    )


@register(
    "alert_hysteresis_advisor",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
st AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS s1,
              CAST(sum(n * n) AS BIGINT) AS s2 FROM f),
z AS (
  SELECT f.day_num, f.n,
         CASE WHEN st.s2 * st.nd = st.s1 * st.s1 THEN 0e0
              ELSE ((f.n - CAST(st.s1 AS DOUBLE) / st.nd)
                    * (f.n - CAST(st.s1 AS DOUBLE) / st.nd))
                   / ((CAST(st.s2 AS DOUBLE) * st.nd - CAST(st.s1 AS DOUBLE) * st.s1)
                      / (CAST(st.nd AS DOUBLE) * st.nd)) END AS z2
  FROM f, st),
mk AS (
  SELECT day_num,
         CASE WHEN z2 > 9 THEN 1 ELSE 0 END AS s_on,
         CASE WHEN z2 > 9 THEN 1 WHEN z2 < 1 THEN 0 END AS marker
  FROM z),
hy AS (
  SELECT day_num, s_on,
         CAST(COALESCE(last_value(marker IGNORE NULLS) OVER (ORDER BY day_num
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS h_on
  FROM mk),
tr AS (
  SELECT s_on, h_on,
         COALESCE(lag(s_on) OVER (ORDER BY day_num), 0) AS ps,
         COALESCE(lag(h_on) OVER (ORDER BY day_num), 0) AS ph
  FROM hy)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_days,
       CAST(COALESCE(sum(s_on), 0) AS BIGINT) AS single_alert_days,
       CAST(COALESCE(sum(CASE WHEN s_on = 1 AND ps = 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS single_episodes,
       CAST(COALESCE(sum(h_on), 0) AS BIGINT) AS hyst_alert_days,
       CAST(COALESCE(sum(CASE WHEN h_on = 1 AND ph = 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS hyst_episodes,
       CAST(COALESCE(sum(CASE WHEN s_on = 1 AND ps = 0 THEN 1 ELSE 0 END), 0)
            - COALESCE(sum(CASE WHEN h_on = 1 AND ph = 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS flaps_saved
FROM tr""",
)
def alert_hysteresis_advisor(spark, sf_dir):
    """Alert hysteresis tuning on the daily-volume z² signal: a single
    threshold (alert while z² > 9) versus a hysteresis pair (enter at
    z² > 9, stay until z² < 1) — counting alert DAYS and alert
    EPISODES under each. Every day the single-threshold detector
    re-crosses 9 it pages again; hysteresis holds the episode open
    through the noisy shoulder, and flaps_saved = episode-count
    difference is exactly the pages the two-threshold config avoids —
    the standard alerting knob (Prometheus `for:`/resolve bands) made
    measurable on this stream. The hysteresis state is NOT a
    sequential scan: it is last_value(IGNORE NULLS) over the
    enter/exit markers (the events_asof carry-forward machinery).

    Determinism: z² from exact day-spine sufficient stats (float-mean
    form, constant-series sentinel); markers and episode starts are
    integer comparisons; windows run over day cells.

    Scale shape: calendar-bounded end to end."""
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
        "day_num", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    st = f.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    z = f.crossJoin(F.broadcast(st)).select(
        "day_num",
        F.expr(
            "CASE WHEN s2 * nd = s1 * s1 THEN 0e0"
            " ELSE ((n - CAST(s1 AS DOUBLE) / nd) * (n - CAST(s1 AS DOUBLE) / nd))"
            " / ((CAST(s2 AS DOUBLE) * nd - CAST(s1 AS DOUBLE) * s1)"
            "    / (CAST(nd AS DOUBLE) * nd)) END"
        ).alias("z2"),
    )
    mk = z.select(
        "day_num",
        F.expr("CASE WHEN z2 > 9 THEN 1 ELSE 0 END").alias("s_on"),
        F.expr("CASE WHEN z2 > 9 THEN 1 WHEN z2 < 1 THEN 0 END").alias("marker"),
    )
    wd = Window.orderBy("day_num")
    hy = mk.select(
        "day_num",
        "s_on",
        F.coalesce(
            F.last("marker", ignorenulls=True).over(
                wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("h_on"),
    )
    tr = hy.select(
        "s_on",
        "h_on",
        F.coalesce(F.lag("s_on").over(wd), F.lit(0)).alias("ps"),
        F.coalesce(F.lag("h_on").over(wd), F.lit(0)).alias("ph"),
    )
    return tr.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.coalesce(F.sum("s_on"), F.lit(0)).cast("long").alias("single_alert_days"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN s_on = 1 AND ps = 0 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("single_episodes"),
        F.coalesce(F.sum("h_on"), F.lit(0)).cast("long").alias("hyst_alert_days"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN h_on = 1 AND ph = 0 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("hyst_episodes"),
        (
            F.coalesce(
                F.sum(F.expr("CASE WHEN s_on = 1 AND ps = 0 THEN 1 ELSE 0 END")),
                F.lit(0),
            )
            - F.coalesce(
                F.sum(F.expr("CASE WHEN h_on = 1 AND ph = 0 THEN 1 ELSE 0 END")),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("flaps_saved"),
    )


# ---------------------------------------------------------------------------
# session 218 — revenue drawdown, A/A calibration, random ranking baseline
# ---------------------------------------------------------------------------


@register(
    "revenue_drawdown",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num,
         CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END), 0) AS BIGINT) AS cents
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.cents, 0) AS BIGINT) AS cents
      FROM spine LEFT JOIN d USING (day_num)),
rm AS (
  SELECT day_num, cents,
         CAST(max(cents) OVER (ORDER BY day_num
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
  FROM f),
dd AS (
  SELECT day_num, cents, peak,
         CAST((1000000 * (peak - cents)) // greatest(peak, 1) AS BIGINT) AS dd_q6
  FROM rm),
best AS (
  SELECT day_num, cents, peak, dd_q6 FROM (
    SELECT *, row_number() OVER (ORDER BY dd_q6 DESC, day_num ASC) AS rk FROM dd) _d
  WHERE rk = 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_days,
       best.day_num AS worst_day, best.cents AS worst_day_cents,
       best.peak AS peak_cents, best.dd_q6 AS max_drawdown_q6
FROM best""",
)
def revenue_drawdown(spark, sf_dir):
    """Maximum drawdown of daily purchase revenue: the worst single-day
    shortfall relative to the best day SEEN SO FAR — the finance-desk
    risk number (how deep did we slump from our own peak, and when)
    that the variance/z² family cannot express: a slow decline and one
    catastrophic day have the same variance but very different
    drawdowns. Running peak via a prefix-max window over the
    zero-filled day spine; the worst day tiebreaks earliest.

    Determinism: per-day drawdown is an integer cross-multiplied
    division against the exact running peak; argmax over quantized
    drawdowns with the day tiebreak (Spark max(struct); oracle
    windows — the search_collapse rule).

    Scale shape: day cells only."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day_num"
            )
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN event_type = 'purchase'"
                        " THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("cents")
        )
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d, "day_num", "left").select(
        "day_num", F.coalesce("cents", F.lit(0)).cast("long").alias("cents")
    ).localCheckpoint()  # census + drawdown chain consume it
    wp = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = f.select(
        "day_num",
        "cents",
        F.max("cents").over(wp).cast("long").alias("peak"),
    ).select(
        "day_num",
        "cents",
        "peak",
        F.expr(
            "CAST((1000000 * (peak - cents)) div greatest(peak, 1) AS BIGINT)"
        ).alias("dd_q6"),
    )
    best = dd.agg(
        F.max(
            F.struct(
                F.col("dd_q6"),
                (-F.col("day_num")).alias("ndy"),
                F.col("cents"),
                F.col("peak"),
            )
        ).alias("t")
    )
    nd = f.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return nd.crossJoin(best).select(
        "n_days",
        (-F.col("t.ndy")).cast("long").alias("worst_day"),
        F.col("t.cents").alias("worst_day_cents"),
        F.col("t.peak").alias("peak_cents"),
        F.col("t.dd_q6").alias("max_drawdown_q6"),
    )


@register(
    "aa_test_readout",
    """WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('aa:' || CAST(user_id AS VARCHAR)), 1, 4))::INT % 2 AS arm,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS conv
  FROM events GROUP BY user_id),
a AS (
  SELECT CAST(COALESCE(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n0,
         CAST(COALESCE(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END), 0) AS BIGINT) AS c0,
         CAST(COALESCE(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n1,
         CAST(COALESCE(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END), 0) AS BIGINT) AS c1
  FROM u)
SELECT n0, c0, n1, c1,
       CAST(CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN 0
            ELSE round(1000000
              * ((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                 * (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1))
              / ((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                 * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                 * (1.0 / n0 + 1.0 / n1))) END AS BIGINT) AS z2_q6
FROM a""",
)
def aa_test_readout(spark, sf_dir):
    """A/A test: split users by a FRESH hash coordinate ('aa:' seed —
    disjoint from the A/B assignment and every other coordinate) where
    NO treatment exists, and compute the same pooled conversion z² as
    ab_significance — the null-calibration run every experimentation
    platform schedules: if the A/A z² regularly clears significance
    thresholds, the unit of randomization, the metric, or the variance
    estimate is broken and every real A/B readout is suspect.
    ab_srm_check validates the SPLIT; this validates the TEST under a
    true null.

    Determinism: arms are exact hash arithmetic; the z² is ONE shared
    float expression with degenerate-pool sentinels (the
    ab_significance conventions).

    Scale shape: ONE user exchange, one 4-counter aggregate."""
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.max(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("conv")
    ).select(
        F.expr(
            "cast(conv(substring(md5(concat('aa:', cast(user_id as string))),"
            " 1, 4), 16, 10) as int) % 2"
        ).alias("arm"),
        "conv",
    )
    a = u.agg(
        F.coalesce(F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END")), F.lit(0))
        .cast("long")
        .alias("n0"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN arm = 0 THEN conv ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("c0"),
        F.coalesce(F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")), F.lit(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN arm = 1 THEN conv ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("c1"),
    )
    return a.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.expr(
            "CAST(CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1"
            " THEN 0"
            " ELSE round(1000000"
            " * ((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)"
            "    * (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1))"
            " / ((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))"
            "    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))"
            "    * (1.0 / n0 + 1.0 / n1))) END AS BIGINT)"
        ).alias("z2_q6"),
    )


@register(
    "random_baseline_eval",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + f""",
rel AS (SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup'),
bt AS (SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rk
       FROM (SELECT doc_id, score_q6 FROM agg
             ORDER BY score_q6 DESC, doc_id ASC LIMIT 10) _b),
rt AS (SELECT doc_id, row_number() OVER (ORDER BY hk ASC, doc_id ASC) AS rk
       FROM (SELECT doc_id, md5('rb:' || CAST(doc_id AS VARCHAR)) AS hk
             FROM documents ORDER BY hk ASC, doc_id ASC LIMIT 10) _r),
bp AS (SELECT CAST(count(*) AS BIGINT) AS p10,
              CAST(COALESCE(max(2520 // rk), 0) AS BIGINT) AS mrr2520
       FROM bt JOIN rel USING (doc_id)),
rp AS (SELECT CAST(count(*) AS BIGINT) AS p10,
              CAST(COALESCE(max(2520 // rk), 0) AS BIGINT) AS mrr2520
       FROM rt JOIN rel USING (doc_id))
SELECT bp.p10 AS bm25_p10, rp.p10 AS random_p10,
       CAST(bp.p10 - rp.p10 AS BIGINT) AS p10_lift,
       bp.mrr2520 AS bm25_mrr2520, rp.mrr2520 AS random_mrr2520
FROM bp, rp""",
)
def random_baseline_eval(spark, sf_dir):
    """Hash-random ranking baseline for the eval family: P@10 and MRR
    of a deterministic pseudo-random top-10 (ordered by a seeded md5
    of the doc id — 'rb:' coordinate, reproducible across engines and
    runs) beside BM25's, with the P@10 lift. Every retrieval metric in
    the registry reports an absolute number; this is the floor that
    turns them into effect sizes — a BM25 P@10 of 3 reads very
    differently when random scores 2 (prevalence-heavy corpus) than
    when it scores 0. The MRR uses the exact 2520-scale (every rank
    1..10 divides it — the map_eval rule), with min() picking the
    FIRST relevant rank.

    Determinism: both rankings are quantized-key TakeOrdereds with
    doc_id tiebreaks; metrics are exact integers.

    Scale shape: a 10-row hash TakeOrdered (the priority_sample
    shape) + the memoized match set's top-10; relevance joins on ≤10
    rows."""
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
    )
    bt = (
        _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rk")
    )
    rt = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.expr("md5(concat('rb:', cast(doc_id as string)))").alias("hk"),
        )
        .orderBy("hk", "doc_id")
        .limit(10)
        .withColumn("rk", F.row_number().over(Window.orderBy("hk", "doc_id")))
        .select("doc_id", "rk")
    )
    bp = bt.join(rel, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("bm25_p10"),
        F.coalesce(F.max(F.expr("2520 div rk")), F.lit(0))
        .cast("long")
        .alias("bm25_mrr2520"),
    )
    rp = rt.join(rel, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("random_p10"),
        F.coalesce(F.max(F.expr("2520 div rk")), F.lit(0))
        .cast("long")
        .alias("random_mrr2520"),
    )
    return bp.crossJoin(rp).select(
        "bm25_p10",
        "random_p10",
        (F.col("bm25_p10") - F.col("random_p10")).alias("p10_lift"),
        "bm25_mrr2520",
        "random_mrr2520",
    )


# ---------------------------------------------------------------------------
# session 219 — parquet bloom advisor, lead-lag crosscorr, term ablation
# ---------------------------------------------------------------------------


@register(
    "parquet_bloom_advisor",
    f"""WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem),
kc AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY 1),
off AS (
  SELECT l_orderkey,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY l_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
  FROM kc),
pos AS (
  SELECT li.l_partkey,
         (off.o + row_number() OVER (PARTITION BY li.l_orderkey
            ORDER BY li.l_linenumber, li.l_partkey) - 1) // {_RG_ROWS} AS grp
  FROM li JOIN off USING (l_orderkey)),
gs AS (
  SELECT grp, CAST(count(DISTINCT l_partkey) AS BIGINT) AS ndv,
         CAST(min(l_partkey) AS BIGINT) AS mn, CAST(max(l_partkey) AS BIGINT) AS mx
  FROM pos GROUP BY grp),
ng AS (SELECT CAST(count(*) AS BIGINT) AS n_groups FROM gs),
probes AS (SELECT unnest([1, 2, 3, 4, 5]) AS pk),
hit AS (
  SELECT pos.grp, probes.pk FROM pos JOIN probes ON pos.l_partkey = probes.pk
  GROUP BY pos.grp, probes.pk),
ev AS (
  SELECT probes.pk, gs.grp, gs.ndv,
         CASE WHEN hit.grp IS NOT NULL THEN 1 ELSE 0 END AS contains_,
         CASE WHEN probes.pk BETWEEN gs.mn AND gs.mx THEN 1 ELSE 0 END AS mmpass,
         CAST(round(1000000 * pow(1 - exp(-(4.0 * gs.ndv) / 1024), 4)) AS BIGINT)
           AS fpr_q6
  FROM probes CROSS JOIN gs
  LEFT JOIN hit ON hit.grp = gs.grp AND hit.pk = probes.pk)
SELECT CAST(ev.pk AS BIGINT) AS probe_partkey, ng.n_groups,
       CAST(COALESCE(sum(ev.mmpass), 0) AS BIGINT) AS minmax_touched,
       CAST(COALESCE(sum(ev.contains_), 0) AS BIGINT) AS true_touched,
       CAST(1000000 * COALESCE(sum(ev.contains_), 0)
            + COALESCE(sum(CASE WHEN ev.contains_ = 0 THEN ev.fpr_q6 ELSE 0 END), 0)
            AS BIGINT) AS bloom_expected_q6
FROM ev CROSS JOIN ng GROUP BY ev.pk, ng.n_groups ORDER BY probe_partkey""",
)
def parquet_bloom_advisor(spark, sf_dir):
    """Parquet bloom-filter benefit model for point lookups on a
    SCATTERED column: under the (orderkey, linenumber) sort, partkey
    values spray across every 64-row row-group, so min/max pruning
    reads essentially the whole table for a partkey probe
    (minmax_touched ≈ n_groups — the sort_layout lesson from the other
    side); a per-row-group bloom (m=1024 bits, k=4, the house
    construction at row-group cardinality) cuts that to the groups
    truly containing the key plus a tiny FPR tail — exactly the
    decision Parquet's bloom_filter_enabled knob encodes, priced per
    probe. Five fixed probe keys.

    Determinism: the row layout is the fully-keyed (orderkey,
    linenumber, partkey) order (the rle_run_census rule — never an
    underspecified sort); group ids come from the global_row_ids
    two-pass form; per-group FPRs q6-round FIRST then sum exact.

    Scale shape (Spark): per-orderkey row_numbers + an offset prefix
    over orderkey-count cells — no global window; group stats are one
    exchange; probes fan over group cells only."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    kc = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wo = Window.orderBy("l_orderkey").rowsBetween(Window.unboundedPreceding, -1)
    off = kc.select(
        "l_orderkey",
        F.coalesce(F.sum("cnt").over(wo), F.lit(0)).cast("long").alias("o"),
    )
    wk = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    pos = (
        li.join(off, "l_orderkey")
        .withColumn("rn", F.row_number().over(wk))
        .select(
            "l_partkey",
            F.expr(f"(o + rn - 1) div {_RG_ROWS}").alias("grp"),
        )
        .localCheckpoint()  # group stats + probe hits consume it
    )
    gs = pos.groupBy("grp").agg(
        F.countDistinct("l_partkey").cast("long").alias("ndv"),
        F.min("l_partkey").cast("long").alias("mn"),
        F.max("l_partkey").cast("long").alias("mx"),
    )
    ng = gs.agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
    probes = spark.createDataFrame([(k,) for k in range(1, 6)], "pk long")
    hit = (
        pos.join(F.broadcast(probes), pos["l_partkey"] == probes["pk"])
        .select("grp", "pk")
        .distinct()
        .withColumn("flag", F.lit(1))
    )
    ev = (
        F.broadcast(probes)
        .crossJoin(gs)
        .join(hit, ["grp", "pk"], "left")
        .select(
            "pk",
            F.coalesce("flag", F.lit(0)).alias("contains_"),
            F.expr(
                "CASE WHEN pk BETWEEN mn AND mx THEN 1 ELSE 0 END"
            ).alias("mmpass"),
            F.expr(
                "CAST(round(1000000 * pow(1 - exp(-(4.0 * ndv) / 1024), 4)) AS BIGINT)"
            ).alias("fpr_q6"),
        )
    )
    return (
        ev.groupBy("pk")
        .agg(
            F.coalesce(F.sum("mmpass"), F.lit(0)).cast("long").alias("minmax_touched"),
            F.coalesce(F.sum("contains_"), F.lit(0)).cast("long").alias("true_touched"),
            (
                F.lit(1000000) * F.coalesce(F.sum("contains_"), F.lit(0))
                + F.coalesce(
                    F.sum(
                        F.when(F.col("contains_") == 0, F.col("fpr_q6")).otherwise(
                            F.lit(0)
                        )
                    ),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("bloom_expected_q6"),
        )
        .crossJoin(F.broadcast(ng))
        .select(
            F.col("pk").cast("long").alias("probe_partkey"),
            "n_groups",
            "minmax_touched",
            "true_touched",
            "bloom_expected_q6",
        )
        .orderBy("probe_partkey")
    )


@register(
    "view_purchase_crosscorr",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num,
         CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS v,
         CAST(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS p
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.v, 0) AS BIGINT) AS v,
             CAST(COALESCE(d.p, 0) AS BIGINT) AS p
      FROM spine LEFT JOIN d USING (day_num)),
lags AS (SELECT unnest(generate_series(-3, 3)) AS lg),
pr AS (
  SELECT lags.lg, a.v AS x, c.p AS y
  FROM lags
  JOIN f a ON TRUE
  JOIN f c ON c.day_num = a.day_num + lags.lg),
s AS (SELECT lg, CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(x), 0) AS BIGINT) AS sx,
             CAST(COALESCE(sum(y), 0) AS BIGINT) AS sy,
             CAST(COALESCE(sum(x * x), 0) AS BIGINT) AS sxx,
             CAST(COALESCE(sum(y * y), 0) AS BIGINT) AS syy,
             CAST(COALESCE(sum(x * y), 0) AS BIGINT) AS sxy
      FROM pr GROUP BY lg)
SELECT CAST(lg AS BIGINT) AS lag_days, n AS n_days,
       CAST(CASE WHEN n < 2
                 OR CAST(sxx AS DOUBLE) * n = CAST(sx AS DOUBLE) * sx
                 OR CAST(syy AS DOUBLE) * n = CAST(sy AS DOUBLE) * sy THEN 0
            ELSE round(1000000
              * (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)
              / (sqrt(CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * sy)))
            END AS BIGINT) AS corr_q6
FROM s ORDER BY lag_days""",
)
def view_purchase_crosscorr(spark, sf_dir):
    """Lead-lag cross-correlation between daily VIEW volume and daily
    PURCHASE volume at lags −3..+3 days: the time-series member the
    autocorrelation family is missing — events_autocorrelation relates
    a series to ITSELF; this relates the funnel's two ends and the
    argmax lag is the aggregate conversion delay (a peak at +1 says
    today's views become tomorrow's purchases — the planning horizon
    for demand-driven capacity). Pearson per lag over the aligned
    zero-filled overlap.

    Determinism: exact BIGINT sufficient sums per lag (the alignment
    join is a calendar-bounded offset equi-join); ONE shared float
    expression with chi²-rule casts and sqrt split across the two
    factors (the matrix_stats rule); constant-series sentinels.

    Scale shape: day cells × 7 lags — everything calendar-bounded."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day_num"
            )
        )
        .agg(
            F.coalesce(
                F.sum(F.expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END")),
                F.lit(0),
            )
            .cast("long")
            .alias("v"),
            F.coalesce(
                F.sum(
                    F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("p"),
        )
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d, "day_num", "left").select(
        "day_num",
        F.coalesce("v", F.lit(0)).cast("long").alias("v"),
        F.coalesce("p", F.lit(0)).cast("long").alias("p"),
    ).localCheckpoint()  # both sides of the lag join consume it
    lags = spark.createDataFrame([(k,) for k in range(-3, 4)], "lg long")
    a = f.select(F.col("day_num").alias("da"), F.col("v").alias("x"))
    c = f.select(F.col("day_num").alias("dc"), F.col("p").alias("y"))
    pr = (
        a.crossJoin(F.broadcast(lags))
        .join(c, F.col("dc") == F.col("da") + F.col("lg"))
        .select("lg", "x", "y")
    )
    s = pr.groupBy("lg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0)).cast("long").alias("sxx"),
        F.coalesce(F.sum(F.col("y") * F.col("y")), F.lit(0)).cast("long").alias("syy"),
        F.coalesce(F.sum(F.col("x") * F.col("y")), F.lit(0)).cast("long").alias("sxy"),
    )
    return s.select(
        F.col("lg").cast("long").alias("lag_days"),
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(CASE WHEN n < 2"
            " OR CAST(sxx AS DOUBLE) * n = CAST(sx AS DOUBLE) * sx"
            " OR CAST(syy AS DOUBLE) * n = CAST(sy AS DOUBLE) * sy THEN 0"
            " ELSE round(1000000"
            " * (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)"
            " / (sqrt(CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx)"
            "    * sqrt(CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * sy)))"
            " END AS BIGINT)"
        ).alias("corr_q6"),
    ).orderBy("lag_days")


def _ablation_chain(tag: str, terms: list[str]) -> str:
    """Prefixed BM25 scoring chain ending in {tag}top (doc_id, rk) —
    verbatim _bm25_agg_ctes math with CTE names namespaced so several
    subqueries coexist in one WITH."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
{tag}q AS (SELECT unnest([{tlist}]) AS term),
{tag}per AS (
  SELECT tf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st))) AS s
  FROM tf JOIN {tag}q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id)),
{tag}agg AS (
  SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
  FROM {tag}per GROUP BY doc_id),
{tag}top AS (
  SELECT doc_id FROM {tag}agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10)"""


@register(
    "query_term_ablation",
    f"""WITH tf AS MATERIALIZED ({SQL_TF}),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
{_ablation_chain('f', ['spark', 'hash', 'join'])[1:]},
{_ablation_chain('d0', ['hash', 'join'])[1:]},
{_ablation_chain('d1', ['spark', 'join'])[1:]},
{_ablation_chain('d2', ['spark', 'hash'])[1:]}
SELECT dropped_term, n_overlap
FROM (
  SELECT 'hash' AS dropped_term,
         (SELECT CAST(count(*) AS BIGINT) FROM d1top JOIN ftop USING (doc_id))
           AS n_overlap
  UNION ALL
  SELECT 'join',
         (SELECT CAST(count(*) AS BIGINT) FROM d2top JOIN ftop USING (doc_id))
  UNION ALL
  SELECT 'spark',
         (SELECT CAST(count(*) AS BIGINT) FROM d0top JOIN ftop USING (doc_id))
) ORDER BY dropped_term""",
)
def query_term_ablation(spark, sf_dir):
    """Query-term ablation: re-rank the canned 3-term query with each
    term REMOVED and report the surviving top-10 overlap with the full
    ranking — term importance measured by its effect on the PAGE, not
    its score share (query_term_share says how much each term
    contributes to the winners' scores; a term can carry 40% of the
    score mass yet change nothing about WHO wins if it co-occurs with
    the others — ablation is the jackknife that catches exactly that).
    The lowest-overlap term is the query's load-bearing word; a
    10/10-overlap term is decorative and a query relaxation
    (common_terms/msm) can drop it for free.

    Determinism: all four rankings share ONE materialized tf/df/dl
    prelude (per-subquery CTEs are namespaced), rank over quantized
    scores, doc_id tiebreak.

    Scale shape: the stats prelude is paid once; each leg is a pruned
    match-set join + TakeOrdered (memoized on the Spark side)."""
    full = (
        _bm25_match_set(spark, sf_dir, ["spark", "hash", "join"])
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id")
    )
    rows = []
    for dropped, rest in [
        ("hash", ["spark", "join"]),
        ("join", ["spark", "hash"]),
        ("spark", ["hash", "join"]),
    ]:
        sub = (
            _bm25_match_set(spark, sf_dir, rest)
            .orderBy(F.desc("score_q6"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id")
        )
        rows.append(
            sub.join(full, "doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
            .select(F.lit(dropped).alias("dropped_term"), "n_overlap")
        )
    return rows[0].unionByName(rows[1]).unionByName(rows[2]).orderBy(
        "dropped_term"
    )


# ---------------------------------------------------------------------------
# session 220 — quantile treatment effects, bandit replay, learned index
# ---------------------------------------------------------------------------


@register(
    "ab_quantile_effects",
    """WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 4))::INT % 2 AS arm
  FROM events GROUP BY user_id),
v AS (
  SELECT u.arm, CAST(round(e.value * 100) AS BIGINT) AS c
  FROM events e JOIN u ON u.user_id = e.user_id
  WHERE e.event_type = 'purchase'),
hist AS (SELECT arm, c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY arm, c),
h AS (
  SELECT arm, c, cnt,
         CAST(COALESCE(sum(cnt) OVER (PARTITION BY arm ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER (PARTITION BY arm) AS BIGINT) AS n
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES (250000), (500000), (750000)) _p(p_q6)),
ex AS (
  SELECT h.arm, q.p_q6, max(h.n) AS n,
         max((h.n - 1) * q.p_q6) AS x,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 THEN h.c END) AS v_lo,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 + 1 THEN h.c END) AS v_hi
  FROM h, q GROUP BY h.arm, q.p_q6),
qq AS (
  SELECT arm, p_q6,
         CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)
              * (v_hi - v_lo))) AS BIGINT) AS q_q6
  FROM ex)
SELECT CAST(a.p_q6 AS BIGINT) AS p_q6,
       a.q_q6 AS arm0_cents_q6, b.q_q6 AS arm1_cents_q6,
       b.q_q6 - a.q_q6 AS effect_cents_q6
FROM qq a JOIN qq b ON a.p_q6 = b.p_q6 AND a.arm = 0 AND b.arm = 1
ORDER BY p_q6""",
)
def ab_quantile_effects(spark, sf_dir):
    """Quantile treatment effects for the A/B assignment: exact type-7
    quartiles of purchase value per arm, paired — the DISTRIBUTIONAL
    causal readout the mean-based family cannot see
    (ab_value_readout's mean difference is identical whether a
    treatment lifts every purchase 5% or doubles the whales while
    gutting small baskets; the per-quantile effect column separates
    those worlds, which is what pricing experiments actually need).
    Same 'ab:' coordinate as the rest of the A/B family.

    Determinism: the quantile chains are the integer-rank histogram
    machinery partitioned by arm with ONE shared interpolation;
    effects are exact q6 differences.

    Scale shape: one user-arm map + a value-histogram per arm; probes
    run over cells."""
    u = (
        _events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.expr(
                "cast(conv(substring(md5(concat('ab:', cast(user_id as string))),"
                " 1, 4), 16, 10) as int) % 2"
            ).alias("arm"),
        )
    )
    v = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .join(u, "user_id")
        .select("arm", F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
    )
    hist = v.groupBy("arm", "c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cb = (
        Window.partitionBy("arm")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("arm")
    h = hist.select(
        "arm",
        "c",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(250000,), (500000,), (750000,)], "p_q6 long")
    ex = (
        h.crossJoin(F.broadcast(q))
        .groupBy("arm", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max((F.col("n") - 1) * F.col("p_q6")).alias("x"),
            F.max(
                F.when(F.col("cb") <= F.expr("((n - 1) * p_q6) div 1000000"), F.col("c"))
            ).alias("v_lo"),
            F.max(
                F.when(
                    F.col("cb") <= F.expr("((n - 1) * p_q6) div 1000000 + 1"),
                    F.col("c"),
                )
            ).alias("v_hi"),
        )
    )
    qq = ex.select(
        "arm",
        "p_q6",
        F.expr(
            "CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)"
            " * (v_hi - v_lo))) AS BIGINT)"
        ).alias("q_q6"),
    )
    a = qq.where(F.col("arm") == 0).select("p_q6", F.col("q_q6").alias("arm0_cents_q6"))
    b = qq.where(F.col("arm") == 1).select("p_q6", F.col("q_q6").alias("arm1_cents_q6"))
    return (
        a.join(b, "p_q6")
        .select(
            F.col("p_q6").cast("long").alias("p_q6"),
            "arm0_cents_q6",
            "arm1_cents_q6",
            (F.col("arm1_cents_q6") - F.col("arm0_cents_q6")).alias(
                "effect_cents_q6"
            ),
        )
        .orderBy("p_q6")
    )


@register(
    "bandit_greedy_replay",
    """WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 4))::INT % 2 AS arm
  FROM events GROUP BY user_id),
e AS (
  SELECT u.arm, epoch_us(ev.ts) // 86400000000 AS day_num, ev.event_type
  FROM events ev JOIN u ON u.user_id = ev.user_id),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM e),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
dd AS (
  SELECT spine.day_num,
         CAST(COALESCE(sum(CASE WHEN e.arm = 0 AND e.event_type = 'view'
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS v0,
         CAST(COALESCE(sum(CASE WHEN e.arm = 0 AND e.event_type = 'click'
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS c0,
         CAST(COALESCE(sum(CASE WHEN e.arm = 1 AND e.event_type = 'view'
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS v1,
         CAST(COALESCE(sum(CASE WHEN e.arm = 1 AND e.event_type = 'click'
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS c1
  FROM spine LEFT JOIN e ON e.day_num = spine.day_num
  GROUP BY spine.day_num),
cum AS (
  SELECT day_num, c0, c1,
         CAST(COALESCE(sum(v0) OVER w, 0) AS BIGINT) AS pv0,
         CAST(COALESCE(sum(c0) OVER w, 0) AS BIGINT) AS pc0,
         CAST(COALESCE(sum(v1) OVER w, 0) AS BIGINT) AS pv1,
         CAST(COALESCE(sum(c1) OVER w, 0) AS BIGINT) AS pc1
  FROM dd
  WINDOW w AS (ORDER BY day_num ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
pick AS (
  SELECT day_num, c0, c1,
         CASE WHEN pc1 * greatest(pv0, 1) > pc0 * greatest(pv1, 1)
              THEN 1 ELSE 0 END AS chosen
  FROM cum)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM pick) AS n_days,
       CAST(COALESCE(sum(CASE WHEN chosen = 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_pick_arm0,
       CAST(COALESCE(sum(CASE WHEN chosen = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_pick_arm1,
       CAST(COALESCE(sum(CASE WHEN chosen = 0 THEN c0 ELSE c1 END), 0) AS BIGINT)
         AS greedy_clicks,
       CAST(greatest(COALESCE(sum(c0), 0), COALESCE(sum(c1), 0)) AS BIGINT)
         AS best_fixed_clicks,
       CAST(greatest(COALESCE(sum(c0), 0), COALESCE(sum(c1), 0))
            - COALESCE(sum(CASE WHEN chosen = 0 THEN c0 ELSE c1 END), 0) AS BIGINT)
         AS regret_clicks
FROM pick""",
)
def bandit_greedy_replay(spark, sf_dir):
    """Offline greedy-bandit replay over the A/B arms: each day the
    policy 'plays' whichever arm has the higher CUMULATIVE prior CTR
    (exact integer cross-multiplication — no division, ties and the
    cold start default to arm 0) and collects that arm's ACTUAL clicks
    for the day; regret is the gap to the best fixed arm in hindsight.
    This is the counterfactual-policy evaluation every bandit rollout
    decision needs BEFORE deploying one — and the greedy state needs
    no sequential scan: the decision at day d reads only exclusive
    prefix sums, so the whole replay is one window pass (the CUSUM
    window-form lesson applied to policy state).

    Determinism: integer cross-multiplied comparisons against
    zero-guarded cumulative views; exact click sums.

    Scale shape: one user-arm map, one day-cell groupBy, prefix
    windows over day cells."""
    u = (
        _events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.expr(
                "cast(conv(substring(md5(concat('ab:', cast(user_id as string))),"
                " 1, 4), 16, 10) as int) % 2"
            ).alias("arm"),
        )
    )
    e = (
        _events(spark, sf_dir)
        .join(u, "user_id")
        .select(
            "arm",
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day_num"
            ),
            "event_type",
        )
    )
    b = e.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    dd = (
        spine.join(e, "day_num", "left")
        .groupBy("day_num")
        .agg(
            *[
                F.coalesce(
                    F.sum(
                        F.expr(
                            f"CASE WHEN arm = {a} AND event_type = '{t}'"
                            f" THEN 1 ELSE 0 END"
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"{t[0]}{a}")
                for a in (0, 1)
                for t in ("view", "click")
            ]
        )
    )
    w = Window.orderBy("day_num").rowsBetween(Window.unboundedPreceding, -1)
    cum = dd.select(
        "day_num",
        "c0",
        "c1",
        F.coalesce(F.sum("v0").over(w), F.lit(0)).cast("long").alias("pv0"),
        F.coalesce(F.sum("c0").over(w), F.lit(0)).cast("long").alias("pc0"),
        F.coalesce(F.sum("v1").over(w), F.lit(0)).cast("long").alias("pv1"),
        F.coalesce(F.sum("c1").over(w), F.lit(0)).cast("long").alias("pc1"),
    )
    pick = cum.select(
        "c0",
        "c1",
        F.expr(
            "CASE WHEN pc1 * greatest(pv0, 1) > pc0 * greatest(pv1, 1)"
            " THEN 1 ELSE 0 END"
        ).alias("chosen"),
    )
    return pick.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN chosen = 0 THEN 1 ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("n_pick_arm0"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN chosen = 1 THEN 1 ELSE 0 END")), F.lit(0)
        )
        .cast("long")
        .alias("n_pick_arm1"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN chosen = 0 THEN c0 ELSE c1 END")), F.lit(0)
        )
        .cast("long")
        .alias("greedy_clicks"),
        F.greatest(
            F.coalesce(F.sum("c0"), F.lit(0)), F.coalesce(F.sum("c1"), F.lit(0))
        )
        .cast("long")
        .alias("best_fixed_clicks"),
        (
            F.greatest(
                F.coalesce(F.sum("c0"), F.lit(0)),
                F.coalesce(F.sum("c1"), F.lit(0)),
            )
            - F.coalesce(
                F.sum(F.expr("CASE WHEN chosen = 0 THEN c0 ELSE c1 END")), F.lit(0)
            )
        )
        .cast("long")
        .alias("regret_clicks"),
    )


@register(
    "learned_index_error",
    """WITH k AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS key FROM lineitem),
r AS (
  SELECT key,
         CAST(row_number() OVER (ORDER BY key) - 1 AS BIGINT) AS rnk
  FROM k),
g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(key), 0) AS BIGINT) AS sk,
             CAST(COALESCE(sum(rnk), 0) AS BIGINT) AS sr FROM r),
c AS (
  SELECT r.key, r.rnk,
         r.key - g.sk // g.n AS dk,
         r.rnk - g.sr // g.n AS dr,
         g.n, g.sk, g.sr
  FROM r, g),
s AS (SELECT max(n) AS n, max(sk) AS sk, max(sr) AS sr,
             CAST(COALESCE(sum(dk * dr), 0) AS BIGINT) AS sxy,
             CAST(COALESCE(sum(dk * dk), 0) AS BIGINT) AS sxx
      FROM c),
fit AS (
  SELECT n, CASE WHEN sxx = 0 THEN 0e0
                 ELSE CAST(sxy AS DOUBLE) / sxx END AS slope,
         (CAST(sr AS DOUBLE) / n)
           - (CASE WHEN sxx = 0 THEN 0e0
                   ELSE CAST(sxy AS DOUBLE) / sxx END)
             * (CAST(sk AS DOUBLE) / n) AS icept
  FROM s),
er AS (
  SELECT CAST(round(1000 * abs(r.rnk - (fit.icept + fit.slope * r.key))) AS BIGINT)
           AS err_q3
  FROM r, fit)
SELECT fit.n AS n_keys,
       CAST(round(1000000000 * fit.slope) AS BIGINT) AS slope_q9,
       (SELECT CAST(COALESCE(max(err_q3), 0) AS BIGINT) FROM er) AS max_err_q3,
       (SELECT CAST(COALESCE(sum(err_q3), 0) // greatest(count(*), 1) AS BIGINT)
        FROM er) AS mean_err_q3
FROM fit""",
)
def learned_index_error(spark, sf_dir):
    """Learned-index (RMI stage-1) error bound on the orderkey column:
    fit rank ≈ a + b·key by least squares over the distinct sorted
    keys and report the MAXIMUM absolute position error — exactly the
    ε that sizes a learned index's last-mile search window (Kraska et
    al.: lookup = predict, then binary-search ±ε rows). A tiny ε on
    this column says a two-number model replaces the B-tree's inner
    nodes; a large ε quantifies how non-linear the key distribution is
    (key_density_census shows the skew; this prices it in LOOKUP
    terms). Mean error sits beside max as the typical-case window.

    Determinism: centered sums use floor-div means and stay EXACT
    BIGINTs (the daily_revenue_trend OLS form; dk·dr ≤ keyrange·n —
    envelope documented); per-key errors q3-round FIRST, max/mean
    exact after;
    constant-key degenerate slope is 0-sentineled.

    Scale shape: the rank is a window over DISTINCT keys (at 1e9-key
    tables it sub-shards by key range exactly like global_row_ids,
    documented); two scalar passes otherwise."""
    k = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_orderkey").cast("long").alias("key"))
        .distinct()
    )
    r = k.withColumn(
        "rnk", (F.row_number().over(Window.orderBy("key")) - 1).cast("long")
    ).localCheckpoint()  # fit + error pass consume it
    g = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("key"), F.lit(0)).cast("long").alias("sk"),
        F.coalesce(F.sum("rnk"), F.lit(0)).cast("long").alias("sr"),
    )
    c = r.crossJoin(F.broadcast(g)).select(
        "key",
        "rnk",
        F.expr("key - sk div n").alias("dk"),
        F.expr("rnk - sr div n").alias("dr"),
        "n",
        "sk",
        "sr",
    )
    s = c.agg(
        F.max("n").alias("n"),
        F.max("sk").alias("sk"),
        F.max("sr").alias("sr"),
        F.coalesce(F.sum(F.col("dk") * F.col("dr")), F.lit(0))
        .cast("long")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("dk") * F.col("dk")), F.lit(0))
        .cast("long")
        .alias("sxx"),
    )
    fit = s.select(
        "n",
        F.expr(
            "CASE WHEN sxx = 0 THEN 0e0 ELSE CAST(sxy AS DOUBLE) / sxx END"
        ).alias("slope"),
        F.expr(
            "(CAST(sr AS DOUBLE) / n)"
            " - (CASE WHEN sxx = 0 THEN 0e0"
            "        ELSE CAST(sxy AS DOUBLE) / sxx END)"
            " * (CAST(sk AS DOUBLE) / n)"
        ).alias("icept"),
    )
    er = r.crossJoin(F.broadcast(fit)).select(
        F.expr(
            "CAST(round(1000 * abs(rnk - (icept + slope * key))) AS BIGINT)"
        ).alias("err_q3")
    )
    ea = er.agg(
        F.coalesce(F.max("err_q3"), F.lit(0)).cast("long").alias("max_err_q3"),
        F.expr(
            "CAST(COALESCE(sum(err_q3), 0) div greatest(count(*), 1) AS BIGINT)"
        ).alias("mean_err_q3"),
    )
    return fit.crossJoin(ea).select(
        F.col("n").alias("n_keys"),
        F.expr("CAST(round(1000000000 * slope) AS BIGINT)").alias("slope_q9"),
        "max_err_q3",
        "mean_err_q3",
    )


# ---------------------------------------------------------------------------
# session 221 — reuse distance, power-law xmin, circular hour statistics
# ---------------------------------------------------------------------------


@register(
    "part_reuse_distance_histogram",
    f"""WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem),
kc AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY 1),
off AS (
  SELECT l_orderkey,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY l_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
  FROM kc),
pos AS (
  SELECT li.l_partkey,
         off.o + row_number() OVER (PARTITION BY li.l_orderkey
            ORDER BY li.l_linenumber, li.l_partkey) - 1 AS p
  FROM li JOIN off USING (l_orderkey)),
gaps AS (
  SELECT l_partkey,
         p - lag(p) OVER (PARTITION BY l_partkey ORDER BY p) AS gap
  FROM pos),
r AS (SELECT CAST(length(bin(gap)) - 1 AS BIGINT) AS band,
             CAST(count(*) AS BIGINT) AS n_reuses
      FROM gaps WHERE gap IS NOT NULL GROUP BY 1),
tot AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM pos) AS n_accesses,
         (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM pos) AS n_parts)
SELECT r.band, r.n_reuses, tot.n_accesses, tot.n_parts
FROM r CROSS JOIN tot ORDER BY r.band""",
)
def part_reuse_distance_histogram(spark, sf_dir):
    """Reuse-distance (time-distance) histogram of part accesses in the
    fact table's keyed scan order: for every re-access of a partkey,
    the row gap since its previous access, log2-banded — the
    locality-of-reference census behind every cache decision
    (lfu_cache_hit_curve sizes by FREQUENCY; reuse distance is the
    LRU-side signal: mass in low bands means a small recency cache
    wins, a flat band profile means recency buys nothing, and
    time-distance upper-bounds true stack distance, documented proxy).

    Determinism: positions come from the fully-keyed (orderkey,
    linenumber, partkey) order via the global_row_ids two-pass form;
    gaps are exact integers, bands the length(bin()) idiom.

    Scale shape: per-orderkey row_numbers + orderkey-cell offsets (no
    global window); the per-partkey lag window is keyed by partkey."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    kc = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wo = Window.orderBy("l_orderkey").rowsBetween(Window.unboundedPreceding, -1)
    off = kc.select(
        "l_orderkey",
        F.coalesce(F.sum("cnt").over(wo), F.lit(0)).cast("long").alias("o"),
    )
    wk = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    pos = (
        li.join(off, "l_orderkey")
        .withColumn("rn", F.row_number().over(wk))
        .select("l_partkey", F.expr("o + rn - 1").alias("p"))
        .localCheckpoint()  # gaps + totals consume it
    )
    wp = Window.partitionBy("l_partkey").orderBy("p")
    gaps = pos.select(
        "l_partkey", (F.col("p") - F.lag("p").over(wp)).alias("gap")
    )
    r = (
        gaps.where(F.col("gap").isNotNull())
        .groupBy(F.expr("CAST(length(bin(gap)) - 1 AS BIGINT)").alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_reuses"))
    )
    tot = pos.agg(
        F.count(F.lit(1)).cast("long").alias("n_accesses"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .select("band", "n_reuses", "n_accesses", "n_parts")
        .orderBy("band")
    )


@register(
    "degree_powerlaw_xmin",
    _SQL_LSH_PAIRS
    + """,
edges AS (SELECT doc_a AS src FROM pairs UNION ALL SELECT doc_b FROM pairs),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
dh AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY d),
xs AS (SELECT d AS xmin FROM dh),
tail AS (
  SELECT xs.xmin, dh.d, dh.cnt,
         CAST(round(1000000 * ln(CAST(dh.d AS DOUBLE) / xs.xmin)) AS BIGINT)
           AS lnr_q6
  FROM xs JOIN dh ON dh.d >= xs.xmin),
fit AS (
  SELECT xmin,
         CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS n_tail,
         CAST(COALESCE(sum(cnt * lnr_q6), 0) AS BIGINT) AS slnr
  FROM tail GROUP BY xmin
  HAVING COALESCE(sum(cnt * lnr_q6), 0) > 0),
al AS (
  SELECT xmin, n_tail,
         1 + (CAST(n_tail AS DOUBLE) * 1000000) / slnr AS alpha
  FROM fit),
kc2 AS (
  SELECT t.xmin, t.d, al.alpha, al.n_tail,
         CAST(sum(t.cnt) OVER (PARTITION BY t.xmin ORDER BY t.d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM tail t JOIN al ON al.xmin = t.xmin),
ks AS (
  SELECT xmin, alpha, n_tail,
         CAST(COALESCE(max(CAST(round(1000000 * abs(
           CAST(cum AS DOUBLE) / n_tail
           - (1 - pow(CAST(d AS DOUBLE) / xmin, 1 - alpha)))) AS BIGINT)), 0)
           AS BIGINT) AS ks_q6
  FROM kc2 GROUP BY xmin, alpha, n_tail),
best AS (
  SELECT xmin, alpha, n_tail, ks_q6 FROM (
    SELECT *, row_number() OVER (ORDER BY ks_q6 ASC, xmin ASC) AS rk FROM ks) _k
  WHERE rk = 1)
SELECT CAST(xmin AS BIGINT) AS xmin, n_tail,
       CAST(round(1000000 * alpha) AS BIGINT) AS alpha_q6, ks_q6
FROM best""",
)
def degree_powerlaw_xmin(spark, sf_dir):
    """Clauset-Shalizi-Newman power-law tail fitting on the LSH
    candidate graph's degree distribution: for every candidate xmin,
    the Hill/MLE exponent α = 1 + n/Σln(d/xmin) over the tail and the
    KS distance between the tail's ECDF and the fitted power-law CDF;
    the reported xmin MINIMIZES KS — the principled where-does-the-
    power-law-start selection that doclen_hill_tail's fixed boundary
    and lsh_degree_histogram's raw shape both skip. The α at the
    chosen xmin is the number to quote for 'the candidate graph is
    scale-free(ish)', and a large best-KS says no power law fits at
    all — equally worth knowing before extrapolating hub behavior.

    Determinism: ln(d/xmin) q6-rounds per CELL before the Σcnt·ln sum
    (the zipf rule); the KS terms are shared float expressions
    q6-rounded per cell then maxed; xmins with zero log-mass (single-
    value tails) are excluded by the HAVING guard; argmin tiebreaks
    on smaller xmin.

    Scale shape: degrees from the memoized edge construction; the
    xmin × degree-cell fan is distinct-degrees² — tiny; windows run
    per xmin over tail cells."""
    pairs = _lsh_pair_edges(spark, sf_dir).where(F.col("src") < F.col("dst"))
    edges = pairs.select("src").unionByName(
        pairs.select(F.col("dst").alias("src"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    dh = deg.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt")).localCheckpoint()
    xs = dh.select(F.col("d").alias("xmin"))
    tail = (
        F.broadcast(xs)
        .join(dh, dh["d"] >= F.col("xmin"))
        .select(
            "xmin",
            "d",
            "cnt",
            F.expr(
                "CAST(round(1000000 * ln(CAST(d AS DOUBLE) / xmin)) AS BIGINT)"
            ).alias("lnr_q6"),
        )
        .localCheckpoint()  # fit + KS chain consume it
    )
    fit = (
        tail.groupBy("xmin")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_tail"),
            F.coalesce(F.sum(F.col("cnt") * F.col("lnr_q6")), F.lit(0))
            .cast("long")
            .alias("slnr"),
        )
        .where(F.col("slnr") > 0)
    )
    al = fit.select(
        "xmin",
        "n_tail",
        F.expr("1 + (CAST(n_tail AS DOUBLE) * 1000000) / slnr").alias("alpha"),
    )
    wx = Window.partitionBy("xmin").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kc2 = tail.join(al, "xmin").select(
        "xmin",
        "d",
        "alpha",
        "n_tail",
        F.sum("cnt").over(wx).cast("long").alias("cum"),
    )
    ks = kc2.groupBy("xmin", "alpha", "n_tail").agg(
        F.coalesce(
            F.max(
                F.expr(
                    "CAST(round(1000000 * abs("
                    "CAST(cum AS DOUBLE) / n_tail"
                    " - (1 - pow(CAST(d AS DOUBLE) / xmin, 1 - alpha)))) AS BIGINT)"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("ks_q6")
    )
    best = ks.agg(
        F.min(
            F.struct(
                F.col("ks_q6"),
                F.col("xmin"),
                F.col("alpha"),
                F.col("n_tail"),
            )
        ).alias("t")
    )
    return best.select(
        F.col("t.xmin").cast("long").alias("xmin"),
        F.col("t.n_tail").alias("n_tail"),
        F.expr("CAST(round(1000000 * t.alpha) AS BIGINT)").alias("alpha_q6"),
        F.col("t.ks_q6").alias("ks_q6"),
    )


# q9-folded cos/sin of 2*pi*h/24 for h = 0..23 (Python-folded, both engines
# sum exact BIGINTs) and the radians-to-hours constant 24/(2*pi)
_CIRC24 = [
    (
        h,
        round(1e9 * math.cos(2 * math.pi * h / 24)),
        round(1e9 * math.sin(2 * math.pi * h / 24)),
    )
    for h in range(24)
]
_RAD2HOUR = repr(24 / (2 * math.pi))


@register(
    "hour_circular_stats",
    f"""WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS h FROM events),
hc AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
cc AS (SELECT * FROM (VALUES
  {", ".join(f"({h}, {c}, {s})" for h, c, s in _CIRC24)}) _c(h, cq9, sq9)),
a AS (
  SELECT hc.event_type,
         CAST(COALESCE(sum(hc.n), 0) AS BIGINT) AS n,
         CAST(COALESCE(sum(hc.n * cc.cq9), 0) AS BIGINT) AS sc,
         CAST(COALESCE(sum(hc.n * cc.sq9), 0) AS BIGINT) AS ss
  FROM hc JOIN cc USING (h) GROUP BY hc.event_type)
SELECT event_type, n,
       CAST(round(1000000 * sqrt(CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)
            / (CAST(n AS DOUBLE) * 1000000000)) AS BIGINT) AS r_q6,
       CAST(round(1000000 * (CASE WHEN atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))
                 * {_RAD2HOUR} < 0
            THEN atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)) * {_RAD2HOUR} + 24
            ELSE atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)) * {_RAD2HOUR} END))
            AS BIGINT) AS mean_hour_q6
FROM a ORDER BY event_type""",
)
def hour_circular_stats(spark, sf_dir):
    """Circular statistics of event hour-of-day per type: the mean
    DIRECTION (peak hour as an angle, so 23:00 and 01:00 average to
    midnight, not noon — the wraparound bug every linear mean-hour
    commits) and the resultant length R (0 = uniform around the clock,
    1 = all events at one hour — the concentration number behind
    type_peak_hour's argmax, which can't distinguish a sharp 9 AM
    spike from a 51%-vs-49% tie). The circular-statistics family
    member the calendar ops were missing.

    Determinism: cos/sin of the 24 hour angles are Python-folded q9
    INTEGERS, so the weighted component sums are exact BIGINTs; one
    atan2/sqrt combine per type (libm 1-ulp class, chi²-rule casts);
    negative angles wrap by +24.

    Scale shape: a 24-cell histogram per type joined to a 24-row
    constant table; scalar math after."""
    e = _events(spark, sf_dir).select(
        "event_type",
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24").alias(
            "h"
        ),
    )
    hc = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    cc = F.broadcast(
        spark.createDataFrame(_CIRC24, "h long, cq9 long, sq9 long")
    )
    a = hc.join(cc, "h").groupBy("event_type").agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col("n") * F.col("cq9")), F.lit(0))
        .cast("long")
        .alias("sc"),
        F.coalesce(F.sum(F.col("n") * F.col("sq9")), F.lit(0))
        .cast("long")
        .alias("ss"),
    )
    ang = f"atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)) * {_RAD2HOUR}"
    return a.select(
        "event_type",
        "n",
        F.expr(
            "CAST(round(1000000 * sqrt(CAST(sc AS DOUBLE) * sc"
            " + CAST(ss AS DOUBLE) * ss)"
            " / (CAST(n AS DOUBLE) * 1000000000)) AS BIGINT)"
        ).alias("r_q6"),
        F.expr(
            f"CAST(round(1000000 * (CASE WHEN {ang} < 0"
            f" THEN {ang} + 24 ELSE {ang} END)) AS BIGINT)"
        ).alias("mean_hour_q6"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# session 222 — higher moments, Durbin-Watson, streaming quantile sketch
# ---------------------------------------------------------------------------


@register(
    "doclen_moments_board",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) // 8
           AS x
  FROM documents),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(x), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(x * x), 0) AS BIGINT) AS s2,
             CAST(COALESCE(sum(x * x * x), 0) AS BIGINT) AS s3,
             CAST(COALESCE(sum(x * x * x * x), 0) AS BIGINT) AS s4
      FROM t),
f AS (
  SELECT n, s1, s2, s3, s4,
         CAST(s1 AS DOUBLE) / n AS m,
         (CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)
           / (CAST(n AS DOUBLE) * n) AS v
  FROM a WHERE n > 0)
SELECT n AS n_docs,
       CAST(round(1000000 * m) AS BIGINT) AS mean8_q6,
       CAST(round(1000000 * v) AS BIGINT) AS var8_q6,
       CAST(CASE WHEN v <= 0 THEN 0
            ELSE round(1000000
              * ((CAST(s3 AS DOUBLE) / n - 3 * m * v - m * m * m)
                 / (sqrt(v) * v))) END AS BIGINT) AS skewness_q6,
       CAST(CASE WHEN v <= 0 THEN 0
            ELSE round(1000000
              * ((CAST(s4 AS DOUBLE) / n - 4 * m * (CAST(s3 AS DOUBLE) / n)
                  + 6 * m * m * (CAST(s2 AS DOUBLE) / n) - 3 * m * m * m * m)
                 / (v * v) - 3)) END AS BIGINT) AS excess_kurtosis_q6
FROM f""",
)
def doclen_moments_board(spark, sf_dir):
    """Third and fourth standardized moments of document length —
    skewness (which way the tail leans) and excess kurtosis (how much
    tail mass vs a Gaussian) — completing the distribution-shape
    family: location (mean/median), spread (variance/MAD/IQR), and now
    SHAPE, the two numbers that say whether z-score thresholds on
    length are even meaningful (kurtosis ≫ 0 means σ-based gates
    misfire) without plotting anything. Lengths rescale to 8-token
    units BEFORE the power sums (x⁴ at raw token counts passes 2^63 at
    ~1e8 docs; in eighths the envelope reaches ~1e11 — the whole-
    dollars rule at the fourth power).

    Determinism: exact BIGINT power sums; central moments expand in
    raw-moment form inside ONE shared float expression each
    (chi²-rule casts; sqrt exact-rounded); degenerate variance
    sentinels.

    Scale shape: one map-side 5-number aggregate."""
    t = _docs(spark, sf_dir).select(
        F.size(spark_tokens("text")).cast("long").alias("nt")
    ).select(F.expr("nt div 8").alias("x"))
    a = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0)).cast("long").alias("s2"),
        F.coalesce(F.sum(F.col("x") * F.col("x") * F.col("x")), F.lit(0))
        .cast("long")
        .alias("s3"),
        F.coalesce(
            F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")), F.lit(0)
        )
        .cast("long")
        .alias("s4"),
    )
    m = "(CAST(s1 AS DOUBLE) / n)"
    v = (
        "((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)"
        " / (CAST(n AS DOUBLE) * n))"
    )
    return a.where(F.col("n") > 0).select(
        F.col("n").alias("n_docs"),
        F.expr(f"CAST(round(1000000 * {m}) AS BIGINT)").alias("mean8_q6"),
        F.expr(f"CAST(round(1000000 * {v}) AS BIGINT)").alias("var8_q6"),
        F.expr(
            f"CAST(CASE WHEN {v} <= 0 THEN 0"
            f" ELSE round(1000000"
            f" * ((CAST(s3 AS DOUBLE) / n - 3 * {m} * {v} - {m} * {m} * {m})"
            f"    / (sqrt({v}) * {v}))) END AS BIGINT)"
        ).alias("skewness_q6"),
        F.expr(
            f"CAST(CASE WHEN {v} <= 0 THEN 0"
            f" ELSE round(1000000"
            f" * ((CAST(s4 AS DOUBLE) / n - 4 * {m} * (CAST(s3 AS DOUBLE) / n)"
            f"     + 6 * {m} * {m} * (CAST(s2 AS DOUBLE) / n)"
            f"     - 3 * {m} * {m} * {m} * {m})"
            f"    / ({v} * {v}) - 3)) END AS BIGINT)"
        ).alias("excess_kurtosis_q6"),
    )


@register(
    "residual_durbin_watson",
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
r AS (SELECT f.day_num, (1000000 * f.n - m.mean_q6) // 1000000 AS e0
      FROM f JOIN m USING (dow)),
lg AS (
  SELECT e0, lag(e0) OVER (ORDER BY day_num) AS pe FROM r),
a AS (
  SELECT CAST(COALESCE(sum(e0 * e0), 0) AS BIGINT) AS sse,
         CAST(COALESCE(sum(CASE WHEN pe IS NULL THEN 0
                                ELSE (e0 - pe) * (e0 - pe) END), 0) AS BIGINT) AS ssd,
         CAST(count(*) AS BIGINT) AS n
  FROM lg)
SELECT n AS n_days,
       CAST(CASE WHEN sse = 0 THEN 2000000
            ELSE round(1000000 * CAST(ssd AS DOUBLE) / sse) END AS BIGINT) AS dw_q6
FROM a""",
)
def residual_durbin_watson(spark, sf_dir):
    """Durbin-Watson statistic of the weekday-adjusted daily-volume
    residuals: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² — the regression diagnostic that
    says whether the residuals the anomaly detectors threshold
    (weekday_adjusted_anomaly, conformal_daily_interval) are actually
    INDEPENDENT: DW ≈ 2 is the clean case their i.i.d. math assumes;
    DW ≪ 2 means positive serial correlation (multi-day incidents,
    trends the weekday model misses) and every 'independent day' p-
    value is overconfident. The constant-residual corpus reports the
    neutral 2.0 sentinel.

    Determinism: residuals subtract in q6 space against the quantized
    weekday means, then FLOOR to whole events before squaring (q6²
    sums pass 2^63 — the documented precision-for-envelope trade,
    ≤1-event quantization); exact BIGINT sums, one division.

    Scale shape: day cells only — weekday means are 7 cells, the lag
    runs over the spine."""
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
        "day_num", F.expr("(1000000 * n - mean_q6) div 1000000").alias("e0")
    )
    lg = r.select("e0", F.lag("e0").over(Window.orderBy("day_num")).alias("pe"))
    a = lg.agg(
        F.coalesce(F.sum(F.col("e0") * F.col("e0")), F.lit(0))
        .cast("long")
        .alias("sse"),
        F.coalesce(
            F.sum(
                F.expr(
                    "CASE WHEN pe IS NULL THEN 0 ELSE (e0 - pe) * (e0 - pe) END"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("ssd"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return a.select(
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(CASE WHEN sse = 0 THEN 2000000"
            " ELSE round(1000000 * CAST(ssd AS DOUBLE) / sse) END AS BIGINT)"
        ).alias("dw_q6"),
    )


@register(
    "logbucket_quantile_estimate",
    """WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'),
bk AS (
  SELECT CAST(length(bin(greatest(c, 1))) - 1 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM v GROUP BY 1),
cum AS (
  SELECT bucket, n,
         CAST(COALESCE(sum(n) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(n) OVER () AS BIGINT) AS tot
  FROM bk),
q AS (SELECT p_q6 FROM (VALUES (500000), (900000)) _p(p_q6)),
sk AS (
  SELECT q.p_q6,
         CAST(round(pow(2e0, cum.bucket)
           * (1 + CAST((cum.tot - 1) * q.p_q6 - 1000000 * cum.cb AS DOUBLE)
                  / (1000000 * cum.n))) AS BIGINT) AS est_cents
  FROM q JOIN cum
    ON 1000000 * cum.cb <= (cum.tot - 1) * q.p_q6
   AND (cum.tot - 1) * q.p_q6 < 1000000 * (cum.cb + cum.n)),
hist AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY c),
h AS (
  SELECT c, cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER () AS BIGINT) AS nn
  FROM hist),
ex AS (
  SELECT q.p_q6,
         max(CASE WHEN h.cb <= ((h.nn - 1) * q.p_q6) // 1000000 THEN h.c END) AS v_lo,
         max(CASE WHEN h.cb <= ((h.nn - 1) * q.p_q6) // 1000000 + 1 THEN h.c END) AS v_hi,
         max((h.nn - 1) * q.p_q6) AS x
  FROM h, q GROUP BY q.p_q6),
exq AS (
  SELECT p_q6,
         CAST(round(v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo)) AS BIGINT)
           AS exact_cents
  FROM ex)
SELECT CAST(exq.p_q6 AS BIGINT) AS p_q6, exq.exact_cents, sk.est_cents,
       CAST((1000000 * abs(sk.est_cents - exq.exact_cents))
            // greatest(exq.exact_cents, 1) AS BIGINT) AS rel_err_q6
FROM exq JOIN sk USING (p_q6) ORDER BY p_q6""",
)
def logbucket_quantile_estimate(spark, sf_dir):
    """Streaming-quantile sketch accuracy audit: estimate p50/p90 of
    purchase value from the LOG2-BUCKET histogram that
    streaming/events.py:value_hist_stream maintains as a running
    SUM aggregation (≤ ~48 cells of state forever), versus the exact
    type-7 percentile. Fixed-boundary buckets are the one quantile
    structure that is truly mergeable and replay-insensitive (t-digest
    centroids drift with arrival order); the price is resolution — at
    log2 boundaries the worst-case relative error is ~2×, and this op
    reports the ACTUAL error on this value distribution, which is what
    decides whether bounded-state percentile dashboards are usable.
    Estimator: linear interpolation inside the containing bucket,
    bucket width 2^b (the same continuous-rank containment as
    quantile_sketch_error).

    Determinism: bucket containment is integer cross-multiplication;
    the estimate is ONE shared float expression (pow(2e0, b) exact —
    powers of two); the exact leg is the standard histogram machinery.

    Scale shape: the sketch side runs on ≤48 cells; the exact side
    exists only as the audit denominator."""
    v = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .localCheckpoint()  # sketch + exact legs consume it
    )
    bk = v.groupBy(
        F.expr("CAST(length(bin(greatest(c, 1))) - 1 AS BIGINT)").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_cb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = bk.select(
        "bucket",
        "n",
        F.coalesce(F.sum("n").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("n").over(w_all).cast("long").alias("tot"),
    )
    q = spark.createDataFrame([(500000,), (900000,)], "p_q6 long")
    sk = (
        F.broadcast(q)
        .join(
            cum,
            (F.lit(1000000) * F.col("cb") <= (F.col("tot") - 1) * F.col("p_q6"))
            & (
                (F.col("tot") - 1) * F.col("p_q6")
                < F.lit(1000000) * (F.col("cb") + F.col("n"))
            ),
        )
        .select(
            "p_q6",
            F.expr(
                "CAST(round(pow(2e0, bucket)"
                " * (1 + CAST((tot - 1) * p_q6 - 1000000 * cb AS DOUBLE)"
                "        / (1000000 * n))) AS BIGINT)"
            ).alias("est_cents"),
        )
    )
    hist = v.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cb2 = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    h = hist.select(
        "c",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb2), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("nn"),
    )
    ex = (
        h.crossJoin(F.broadcast(q))
        .groupBy("p_q6")
        .agg(
            F.max(
                F.when(F.col("cb") <= F.expr("((nn - 1) * p_q6) div 1000000"), F.col("c"))
            ).alias("v_lo"),
            F.max(
                F.when(
                    F.col("cb") <= F.expr("((nn - 1) * p_q6) div 1000000 + 1"),
                    F.col("c"),
                )
            ).alias("v_hi"),
            F.max(F.expr("(nn - 1) * p_q6")).alias("x"),
        )
    )
    exq = ex.select(
        "p_q6",
        F.expr(
            "CAST(round(v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo))"
            " AS BIGINT)"
        ).alias("exact_cents"),
    )
    return (
        exq.join(sk, "p_q6")
        .select(
            F.col("p_q6").cast("long").alias("p_q6"),
            "exact_cents",
            "est_cents",
            F.expr(
                "CAST((1000000 * abs(est_cents - exact_cents))"
                " div greatest(exact_cents, 1) AS BIGINT)"
            ).alias("rel_err_q6"),
        )
        .orderBy("p_q6")
    )


# ---------------------------------------------------------------------------
# session 223 — HITS scores, VIF diagnostics, id-range tiling
# ---------------------------------------------------------------------------

_HITS_ROUNDS = 4


def _hits_sql() -> str:
    parts = [
        _KMEANS_SQL_PRELUDE
        + """, prs AS MATERIALIZED (
  SELECT x.vec_id AS src, y.vec_id AS dst,
         CAST(round(1000000 * list_dot_product(ex.v, ey.v)
           / (sqrt(list_dot_product(ex.v, ex.v)) * sqrt(list_dot_product(ey.v, ey.v)))) AS BIGINT) AS cos_q6
  FROM a3 x JOIN a3 y ON x.cid = y.cid AND x.vec_id <> y.vec_id
  JOIN e ex ON ex.vec_id = x.vec_id
  JOIN e ey ON ey.vec_id = y.vec_id),
ed AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY cos_q6 DESC, dst ASC) AS rn
    FROM prs) _p WHERE rn <= 3),
nodes AS MATERIALIZED (
  SELECT src AS vid FROM ed UNION SELECT dst FROM ed),
zh0 AS MATERIALIZED (SELECT vid, CAST(1000000 AS BIGINT) AS h FROM nodes)"""
    ]
    for r in range(_HITS_ROUNDS):
        parts.append(
            f""",
zar{r} AS MATERIALIZED (
  SELECT n.vid, CAST(COALESCE(sum(zh{r}.h), 0) AS BIGINT) AS raw
  FROM nodes n
  LEFT JOIN ed ON ed.dst = n.vid
  LEFT JOIN zh{r} ON zh{r}.vid = ed.src
  GROUP BY n.vid),
zam{r} AS (SELECT CAST(greatest(max(raw), 1) AS BIGINT) AS mx FROM zar{r}),
za{r + 1} AS MATERIALIZED (
  SELECT vid, CAST((1000000 * raw) // zam{r}.mx AS BIGINT) AS a
  FROM zar{r}, zam{r}),
zhr{r} AS MATERIALIZED (
  SELECT n.vid, CAST(COALESCE(sum(za{r + 1}.a), 0) AS BIGINT) AS raw
  FROM nodes n
  LEFT JOIN ed ON ed.src = n.vid
  LEFT JOIN za{r + 1} ON za{r + 1}.vid = ed.dst
  GROUP BY n.vid),
zhm{r} AS (SELECT CAST(greatest(max(raw), 1) AS BIGINT) AS mx FROM zhr{r}),
zh{r + 1} AS MATERIALIZED (
  SELECT vid, CAST((1000000 * raw) // zhm{r}.mx AS BIGINT) AS h
  FROM zhr{r}, zhm{r})"""
        )
    parts.append(
        f"""
SELECT a.vid AS vec_id, a.a AS auth_q6, h.h AS hub_q6
FROM za{_HITS_ROUNDS} a JOIN zh{_HITS_ROUNDS} h USING (vid)
ORDER BY auth_q6 DESC, vec_id ASC LIMIT 10"""
    )
    return "".join(parts)
