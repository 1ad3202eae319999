"""driver_queries chunk q09 (original lines 31252-34731): brand_cobuy_matrix, ltv_age_curve, order_size_by_status, shingle_hash_collisions, ... source_arrival_matrix (54 ops).

Linearized continuation of docix_spark.ops.q08 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q08")

@register(
    "brand_cobuy_matrix",
    """WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob),
pr AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
              CAST(count(*) AS BIGINT) AS n_both
       FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                          AND a.p_brand < b.p_brand
       GROUP BY a.p_brand, b.p_brand),
rk AS (SELECT brand_a, brand_b, n_both,
              row_number() OVER (ORDER BY n_both DESC, brand_a ASC, brand_b ASC)
                AS rank
       FROM pr)
SELECT rk.brand_a, rk.brand_b, rk.n_both, CAST(rk.rank AS BIGINT) AS rank,
       CAST((1000000 * rk.n_both) // tot.n_orders AS BIGINT) AS support_q6
FROM rk CROSS JOIN tot WHERE rk.rank <= 15 ORDER BY rank""",
)
def brand_cobuy_matrix(spark, sf_dir):
    """Cross-sell matrix at brand grain: the 15 brand pairs most often
    bought in the SAME order, with order-level support — the
    market-basket view of the lineitem star (event_type_lift mines
    behavioral baskets; this mines wallets, and the top cell is the
    bundle promotion a merchandiser runs next). Canonical a < b pairs
    over per-order DISTINCT brand sets.

    Determinism: exact counts; rank by (support desc, lex pair).

    Scale shape: the per-order brand-set self-join keys on orderkey
    with fanout bounded by |brands|²/order (the event_type_lift rule);
    part broadcasts into the brand lookup via AQE."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    ob = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint()  # census + both pair sides consume it
    )
    tot = ob.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    a = ob.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = ob.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    pr = (
        a.join(b, "l_orderkey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    rk = (
        pr.withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc("n_both"), F.asc("brand_a"), F.asc("brand_b")
                )
            )
            .cast("long"),
        )
        .where(F.col("rank") <= 15)
    )
    return (
        rk.crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            "rank",
            F.expr("CAST((1000000 * n_both) div n_orders AS BIGINT)").alias(
                "support_q6"
            ),
        )
        .orderBy("rank")
    )


@register(
    "ltv_age_curve",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
ud AS (SELECT user_id, day_num, CAST(sum(cents) AS BIGINT) AS c
       FROM e GROUP BY user_id, day_num),
cu AS (SELECT user_id, day_num,
              CAST(sum(c) OVER (PARTITION BY user_id ORDER BY day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_c,
              CAST(min(day_num) OVER (PARTITION BY user_id) AS BIGINT) AS d0
       FROM ud),
ag AS (SELECT CAST(day_num - d0 AS BIGINT) AS age_days, cum_c FROM cu)
SELECT age_days, CAST(count(*) AS BIGINT) AS n_observations,
       CAST(round(1000000 * (CAST(sum(cum_c) AS DOUBLE) / count(*))) AS BIGINT)
         AS mean_cum_cents_q6
FROM ag GROUP BY age_days ORDER BY age_days""",
)
def ltv_age_curve(spark, sf_dir):
    """Observed-activity LTV curve: for each user-age (days since the
    user's first event), the mean CUMULATIVE value among users active
    at that age — the curve a lifetime-value model is fitted to
    (events_cohort_revenue slices by signup month; this collapses all
    cohorts onto the age axis). Observation bias is declared: only
    (user, day) cells with activity contribute, so late ages reflect
    survivors — the standard caveat on every LTV plot.

    Determinism: exact per-(user, day) cents; the cumulative and the
    first-day come from user-partitioned windows over per-user DAY
    rows (calendar-bounded per key); one divide-then-round per age.

    Scale shape: one (user, day) agg; the windows run on each user's
    active-day rows; the age rollup is calendar-bounded."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    ud = e.groupBy("user_id", "day_num").agg(
        F.sum("cents").cast("long").alias("c")
    )
    wc = Window.partitionBy("user_id").orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wa = Window.partitionBy("user_id")
    cu = ud.select(
        "user_id",
        "day_num",
        F.sum("c").over(wc).cast("long").alias("cum_c"),
        F.min("day_num").over(wa).cast("long").alias("d0"),
    )
    ag = cu.select(
        (F.col("day_num") - F.col("d0")).cast("long").alias("age_days"),
        "cum_c",
    )
    return (
        ag.groupBy("age_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_observations"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(cum_c) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_cum_cents_q6"),
        )
        .orderBy("age_days")
    )


@register(
    "order_size_by_status",
    """WITH lc AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items FROM lineitem
  GROUP BY l_orderkey),
j AS (SELECT o.o_orderstatus, COALESCE(lc.n_items, 0) AS n_items
      FROM orders o LEFT JOIN lc ON lc.l_orderkey = o.o_orderkey)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(n_items) AS BIGINT) AS n_lineitems,
       CAST(round(1000000 * (CAST(sum(n_items) AS DOUBLE) / count(*)))
            AS BIGINT) AS mean_items_q6
FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""",
)
def order_size_by_status(spark, sf_dir):
    """Order size by fulfilment status: mean lineitems per order for
    each o_orderstatus — the "do big orders get stuck" check
    (order_size_histogram shows the global shape; if the open-status
    mean runs higher, large orders are aging in the pipeline, the
    operational reading behind Q4's lateness counts). Orders with no
    lineitems count as size 0 via the LEFT probe.

    Scale shape: one orderkey agg over lineitem; the LEFT probe keys
    on orderkey (un-hinted); a ≤|statuses| rollup."""
    lc = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    j = o.join(lc, o["o_orderkey"] == lc["l_orderkey"], "left").select(
        "o_orderstatus", F.coalesce("n_items", F.lit(0)).alias("n_items")
    )
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_items").cast("long").alias("n_lineitems"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(n_items) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_items_q6"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# session 112 — shingle hash-collision audit, nearest-centroid accuracy,
# max-tf ratio histogram
# ---------------------------------------------------------------------------


@register(
    "shingle_hash_collisions",
    f"""WITH sh AS ({_SQL_SHINGLES}),
ss AS (SELECT DISTINCT sh FROM sh),
hh AS (SELECT ('0x' || substr(md5(sh), 1, 15))::UBIGINT::BIGINT AS h FROM ss)
SELECT CAST((SELECT count(*) FROM ss) AS BIGINT) AS n_shingles,
       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_hashes,
       CAST((SELECT count(*) FROM ss) - count(DISTINCT h) AS BIGINT)
         AS n_collisions
FROM hh""",
)
def shingle_hash_collisions(spark, sf_dir):
    """Birthday audit of the 60-bit shingle hash that underlies the
    whole minhash substrate: distinct shingles vs distinct truncated-
    md5 values — the collision count every LSH pair op silently
    assumes is zero (it is, until ~2^30 shingles; a 100 TB crawl with
    10^12 shingles EXPECTS ~400k collisions at 60 bits, and this op
    is how you notice the substrate needs 80 bits before the dedup
    labels quietly merge strangers).

    Determinism: exact distinct counts.

    Scale shape: two two-phase distincts over the shingle stream."""
    sh = _shingles_spark(spark, sf_dir)
    ss = sh.select("sh").distinct().localCheckpoint()
    n_sh = ss.agg(F.count(F.lit(1)).cast("long").alias("n_shingles"))
    hh = ss.select(_H60_SPARK(F.col("sh")).alias("h"))
    nh = hh.agg(F.countDistinct("h").cast("long").alias("n_distinct_hashes"))
    return n_sh.crossJoin(nh).select(
        "n_shingles",
        "n_distinct_hashes",
        (F.col("n_shingles") - F.col("n_distinct_hashes"))
        .cast("long")
        .alias("n_collisions"),
    )


@register(
    "centroid_classifier_accuracy",
    """WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id <> 0),
dims AS (
  SELECT label, i, SUM(CAST(round(v[i] * 1000000) AS BIGINT)) AS s
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY label, i),
cv AS (SELECT label AS clabel, list(CAST(s AS DOUBLE) ORDER BY i) AS c
       FROM dims GROUP BY label),
sc AS (
  SELECT e.vec_id, e.label, cv.clabel,
         CASE WHEN list_dot_product(cv.c, cv.c) = 0 THEN 0
              ELSE CAST(round(1000000000 * list_dot_product(e.v, cv.c)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(cv.c, cv.c)))) AS BIGINT)
         END AS cq
  FROM e CROSS JOIN cv),
pred AS (
  SELECT vec_id, label, clabel AS pred FROM (
    SELECT vec_id, label, clabel,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cq DESC, clabel ASC) AS rn
    FROM sc) WHERE rn = 1)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(COALESCE(sum(CASE WHEN pred = label THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_correct,
       CAST((1000000 * COALESCE(sum(CASE WHEN pred = label THEN 1 ELSE 0 END), 0))
            // count(*) AS BIGINT) AS accuracy_q6
FROM pred GROUP BY label ORDER BY label""",
)
def centroid_classifier_accuracy(spark, sf_dir):
    """Nearest-centroid (Rocchio) classifier accuracy per label: every
    vector scored against all label centroids by cosine, predicted
    label = nearest, tallied against truth — the SIMPLEST possible
    classifier baseline, and the number every fancier model must beat
    (kNN's label MRR/purity read neighborhoods; this reads the global
    geometry, and the gap between the two says whether the structure
    is local or global). Training-on-self bias is inherent and
    declared — it's an upper bound.

    Determinism: centroids are exact q6 element sums (the
    _kmeans_cent trick); scores are q9-quantized cosines with the
    label tiebreak; the zero-norm centroid guard scores 0.

    Scale shape: the centroid table is |labels| rows broadcast into a
    map-side scoring pass; the per-vector argmax windows over |labels|
    rows per vector (the _kmeans_assign shape)."""
    e = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
        .localCheckpoint()  # centroid sums + scoring both consume it
    )
    dims = (
        e.select("label", F.posexplode("v").alias("i", "x"))
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
        .groupBy("label", "i")
        .agg(F.sum("xq").alias("s"))
    )
    cv = dims.groupBy("label").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(i, s))), t -> cast(t.s as double))"
        ).alias("c")
    ).select(F.col("label").alias("clabel"), "c")
    sc = e.crossJoin(F.broadcast(cv)).select(
        "vec_id",
        "label",
        "clabel",
        F.expr(
            f"CASE WHEN {_DOT.format(a='c', b='c')} = 0 THEN 0"
            f" ELSE CAST(round(1000000000 * {_DOT.format(a='v', b='c')}"
            f" / (sqrt({_DOT.format(a='v', b='v')})"
            f" * sqrt({_DOT.format(a='c', b='c')}))) AS BIGINT) END"
        ).alias("cq"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cq"), F.asc("clabel"))
    pred = (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("label", F.col("clabel").alias("pred"))
    )
    return (
        pred.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.coalesce(
                F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            "n_correct",
            F.expr(
                "CAST((1000000 * n_correct) div n_vecs AS BIGINT)"
            ).alias("accuracy_q6"),
        )
        .orderBy("label")
    )


@register(
    "maxtf_ratio_histogram",
    f"""WITH tf AS ({SQL_TF}),
d AS (SELECT doc_id, CAST(max(tf) AS BIGINT) AS mx, CAST(sum(tf) AS BIGINT) AS n
      FROM tf GROUP BY doc_id),
bk AS (SELECT least(((1000000 * mx) // n) // 100000, 9) AS bucket FROM d),
h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs FROM bk GROUP BY bucket),
spine AS (SELECT unnest(generate_series(0, 9)) AS bucket)
SELECT CAST(spine.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(h.n_docs, 0) AS BIGINT) AS n_docs
FROM spine LEFT JOIN h USING (bucket) ORDER BY bucket""",
)
def maxtf_ratio_histogram(spark, sf_dir):
    """Within-document term-domination histogram: each document's
    heaviest term's share of its tokens, in deciles — the keyword-
    stuffing/boilerplate gauge at its crudest and fastest
    (low_entropy_docs needs the full distribution; a doc in bucket 9
    is one token repeated, and THIS catches it from two numbers per
    doc). Empty docs drop (no tf rows).

    Determinism: exact integer share and decile with the least(·, 9)
    clamp.

    Scale shape: one doc-keyed agg (max + sum in one pass), a
    10-bucket rollup and spine."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    d = tf.groupBy("doc_id").agg(
        F.max("tf").cast("long").alias("mx"),
        F.sum("tf").cast("long").alias("n"),
    )
    bk = d.select(
        F.expr("least(((1000000 * mx) div n) div 100000, 9)").alias("bucket")
    )
    h = bk.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    return (
        spine.join(h, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 113 — recency-decayed activity, dictionary front-coding
# estimate, event type census
# ---------------------------------------------------------------------------


@register(
    "decayed_activity_scores",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num FROM events),
mx AS (SELECT CAST(max(day_num) AS BIGINT) AS now_day FROM e),
w AS (SELECT e.user_id,
             CAST(round(1000000 * power(2e0,
                  -(CAST(mx.now_day - e.day_num AS DOUBLE) / 7e0))) AS BIGINT)
               AS w_q6
      FROM e CROSS JOIN mx),
s AS (SELECT user_id, CAST(sum(w_q6) AS BIGINT) AS score_q6,
             CAST(count(*) AS BIGINT) AS n_events
      FROM w GROUP BY user_id),
rk AS (SELECT user_id, n_events, score_q6,
              row_number() OVER (ORDER BY score_q6 DESC, user_id ASC) AS rank
       FROM s)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(rank AS BIGINT) AS rank,
       n_events, score_q6
FROM rk WHERE rank <= 10 ORDER BY rank""",
)
def decayed_activity_scores(spark, sf_dir):
    """Recency-weighted activity leaderboard: each event contributes
    2^(−age/7d) (a 7-day half-life), summed per user, top-10 — THE
    feature-store freshness feature (a raw event count calls a
    year-dormant power user "active"; exponential decay is how ranking
    and churn features actually weight history, and the half-life is
    the knob). Age is measured from the stream's max day.

    Determinism: per-event weights q6-round FIRST from the shared
    power() expression (libm pow, the geometric-fit precedent), then
    exact BIGINT sums — no float sum order exists; rank over the
    quantized score with the user tiebreak.

    Scale shape: one map-side weight per event (the 1-row max-day
    broadcast), a user agg, TakeOrdered 10."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
    )
    mx = e.agg(F.max("day_num").cast("long").alias("now_day"))
    w = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr(
            "CAST(round(1000000 * power(2e0,"
            " -(CAST(now_day - day_num AS DOUBLE) / 7e0))) AS BIGINT)"
        ).alias("w_q6"),
    )
    s = w.groupBy("user_id").agg(
        F.sum("w_q6").cast("long").alias("score_q6"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    top = s.orderBy(F.desc("score_q6"), F.asc("user_id")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("score_q6"), F.asc("user_id")))
        .cast("long"),
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        "rank",
        "n_events",
        "score_q6",
    ).orderBy("rank")


@register(
    "dict_frontcoding_estimate",
    f"""WITH tf AS ({SQL_TF}),
dict AS (SELECT DISTINCT term FROM tf),
lagd AS (SELECT term, substr(term, 1, 1) AS blk,
                lag(term) OVER (PARTITION BY substr(term, 1, 1)
                                ORDER BY term) AS prev
         FROM dict),
c8 AS (SELECT term, prev,
              CASE WHEN prev IS NOT NULL
                   AND substr(term, 1, 8) = substr(prev, 1, 8) THEN 8 ELSE 0
              END AS p
       FROM lagd),
c4 AS (SELECT term, prev,
              p + CASE WHEN prev IS NOT NULL
                  AND substr(term, p + 1, 4) = substr(prev, p + 1, 4)
                  AND length(term) >= p + 1 THEN 4 ELSE 0 END AS p
       FROM c8),
c2 AS (SELECT term, prev,
              p + CASE WHEN prev IS NOT NULL
                  AND substr(term, p + 1, 2) = substr(prev, p + 1, 2)
                  AND length(term) >= p + 1 THEN 2 ELSE 0 END AS p
       FROM c4),
c1 AS (SELECT term, prev,
              p + CASE WHEN prev IS NOT NULL
                  AND substr(term, p + 1, 1) = substr(prev, p + 1, 1)
                  AND length(term) >= p + 1 THEN 1 ELSE 0 END AS p
       FROM c2),
fin AS (SELECT length(term) AS lt,
               least(p, length(term),
                     CASE WHEN prev IS NULL THEN 0 ELSE length(prev) END) AS lcp
        FROM c1)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(lt) AS BIGINT) AS raw_bytes,
       CAST(COALESCE(sum(lcp), 0) AS BIGINT) AS saved_bytes,
       CAST((1000000 * COALESCE(sum(lcp), 0)) // greatest(sum(lt), 1) AS BIGINT)
         AS saved_share_q6
FROM fin""",
)
def dict_frontcoding_estimate(spark, sf_dir):
    """Front-coding savings estimate for the term dictionary: bytes of
    shared prefix between each term and its sorted predecessor,
    summed — the third leg of the index-size model (postings and
    positions price the lists; THIS prices the dictionary, where
    Lucene's block-tree front coding typically reclaims 30-50% of an
    English term file). The LCP is computed by the 8/4/2/1 binary
    ladder (four chained substring compares — no per-character loop
    exists in either engine), capped at 15 bytes like a real
    block-coding prefix budget; blocks partition by first byte, so
    each block's first term stores raw — exactly block-wise front
    coding's rule.

    Determinism: pure string ops; the ladder's offsets are identical
    in both engines (1-based substr).

    Scale shape: the lag window partitions by first byte (the block
    key), never the whole dictionary on one reducer; the census is
    1-row."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dic = tf.select("term").distinct()
    wl = Window.partitionBy(F.expr("substr(term, 1, 1)")).orderBy("term")
    lagd = dic.select("term", F.lag("term").over(wl).alias("prev"))
    c = lagd.selectExpr(
        "term",
        "prev",
        "CASE WHEN prev IS NOT NULL AND substr(term, 1, 8) = substr(prev, 1, 8)"
        " THEN 8 ELSE 0 END AS p",
    )
    for step in (4, 2, 1):
        c = c.selectExpr(
            "term",
            "prev",
            f"p + CASE WHEN prev IS NOT NULL"
            f" AND substr(term, p + 1, {step}) = substr(prev, p + 1, {step})"
            f" AND length(term) >= p + 1 THEN {step} ELSE 0 END AS p",
        )
    fin = c.selectExpr(
        "length(term) AS lt",
        "least(p, length(term),"
        " CASE WHEN prev IS NULL THEN 0 ELSE length(prev) END) AS lcp",
    )
    return fin.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("lt").cast("long").alias("raw_bytes"),
        F.coalesce(F.sum("lcp"), F.lit(0)).cast("long").alias("saved_bytes"),
        F.expr(
            "CAST((1000000 * COALESCE(sum(lcp), 0)) div greatest(sum(lt), 1)"
            " AS BIGINT)"
        ).alias("saved_share_q6"),
    )


@register(
    "event_type_census",
    """WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY event_type),
t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM c)
SELECT c.event_type, c.n_events, c.n_users,
       CAST((1000000 * c.n_events) // t.tot AS BIGINT) AS share_q6
FROM c CROSS JOIN t ORDER BY c.event_type""",
)
def event_type_census(spark, sf_dir):
    """The foundational event-type census: volume, distinct users and
    share per type — the first table anyone prints against a new
    stream (every drift/JSD/Markov op in the family normalises by
    exactly these numbers; this op makes them first-class).

    Scale shape: one type agg with a two-phase distinct, a 1-row
    total broadcast."""
    c = _events(spark, sf_dir).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    t = c.agg(F.sum("n_events").cast("long").alias("tot"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "n_events",
            "n_users",
            F.expr("CAST((1000000 * n_events) div tot AS BIGINT)").alias(
                "share_q6"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# session 114 — lexical×semantic pair census, prefix branching curve,
# weekly active users
# ---------------------------------------------------------------------------


@register(
    "lexical_semantic_pair_census",
    _SQL_LSH_PAIRS
    + """,
shs AS (SELECT doc_id, sh FROM sh GROUP BY doc_id, sh),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shs GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS c
  FROM pairs p JOIN shs a ON a.doc_id = p.doc_a
  JOIN shs b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY p.doc_a, p.doc_b),
jac AS (
  SELECT p.doc_a, p.doc_b,
         CAST((1000000 * COALESCE(i.c, 0))
              // (sa.n + sb.n - COALESCE(i.c, 0)) AS BIGINT) AS j_q6
  FROM pairs p JOIN sz sa ON sa.doc_id = p.doc_a
  JOIN sz sb ON sb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b),
ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cosp AS (
  SELECT j.doc_a, j.doc_b, j.j_q6,
         CAST(round(1000000 * list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v)))) AS BIGINT) AS cos_q6
  FROM jac j JOIN ev a ON a.vec_id = j.doc_a JOIN ev b ON b.vec_id = j.doc_b),
bk AS (SELECT least(j_q6 // 200000, 4) AS j_band,
              least(greatest((cos_q6 + 1000000) // 400000, 0), 4) AS c_band
       FROM cosp)
SELECT CAST(j_band AS BIGINT) AS j_band, CAST(c_band AS BIGINT) AS c_band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM bk GROUP BY j_band, c_band ORDER BY j_band, c_band""",
)
def lexical_semantic_pair_census(spark, sf_dir):
    """Lexical × semantic 2-D census of the LSH candidate pairs: exact
    shingle Jaccard (0.2-wide bands) crossed with embedding cosine
    (0.4-wide bands over [−1, 1]) — the cross-modal dedup diagnostic
    (high-Jaccard/high-cosine = true copies; high-Jaccard/low-cosine =
    template shells around different content, the chunk-scrub target;
    low-Jaccard/high-cosine = paraphrases only semdedup would catch —
    each quadrant routes to a DIFFERENT dedup tool, and this table is
    the router's evidence). vec_id == doc_id joins each pair to its
    embeddings.

    Determinism: exact Jaccard integers; cosine q6-rounds per pair;
    band edges are integer divisions with clamps.

    Scale shape: intersection counts block on the candidate pair +
    shingle key (never all-pairs — the lsh_candidate_precision rule);
    the embedding join keys on vec_id; the census is ≤25 cells."""
    edges = _lsh_pair_edges(spark, sf_dir)
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    shs = (
        _shingles_spark(spark, sf_dir)
        .select("doc_id", "sh")
        .distinct()
        .localCheckpoint()  # sizes + both intersection sides consume it
    )
    sz = shs.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sa = shs.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = shs.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    jac = (
        pairs.join(
            sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST((1000000 * COALESCE(c, 0))"
                " div (na + nb - COALESCE(c, 0)) AS BIGINT)"
            ).alias("j_q6"),
        )
    )
    ev = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    va = ev.select(F.col("vec_id").alias("doc_a"), F.col("v").alias("va"))
    vb = ev.select(F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"))
    cosp = (
        jac.join(va, "doc_a")
        .join(vb, "doc_b")
        .select("j_q6", _cosq("va", "vb", 1_000_000).alias("cos_q6"))
    )
    bk = cosp.select(
        F.expr("least(j_q6 div 200000, 4)").alias("j_band"),
        F.expr(
            "least(greatest((cos_q6 + 1000000) div 400000, 0), 4)"
        ).alias("c_band"),
    )
    return (
        bk.groupBy("j_band", "c_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            F.col("j_band").cast("long").alias("j_band"),
            F.col("c_band").cast("long").alias("c_band"),
            "n_pairs",
        )
        .orderBy("j_band", "c_band")
    )


@register(
    "prefix_branching_curve",
    f"""WITH tf AS ({SQL_TF}),
dict AS (SELECT DISTINCT term FROM tf),
ks AS (SELECT unnest([1, 2, 3, 4]) AS k),
pf AS (SELECT ks.k, substr(dict.term, 1, ks.k) AS pfx
       FROM ks CROSS JOIN dict WHERE length(dict.term) >= ks.k)
SELECT CAST(k AS BIGINT) AS prefix_len,
       CAST(count(DISTINCT pfx) AS BIGINT) AS n_prefixes,
       CAST(count(*) AS BIGINT) AS n_terms_covered
FROM pf GROUP BY k ORDER BY prefix_len""",
)
def prefix_branching_curve(spark, sf_dir):
    """Dictionary trie fanout curve: distinct prefixes at depths 1-4
    and the terms long enough to reach each depth — the autocomplete
    cost model (a prefix query at depth k scans
    ~vocab/n_prefixes(k) terms; the depth where the curve flattens is
    where suggest queries get cheap, which is why ES defaults
    bool_prefix expansion gates to 2-3 chars — terms_enum_page walks
    one prefix, THIS sizes them all).

    Determinism: pure string prefixes and exact distincts.

    Scale shape: a 4-row depth spine crossed with the vocab-bounded
    dictionary; one (k, prefix) two-phase distinct."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dic = tf.select("term").distinct()
    ks = F.broadcast(
        spark.createDataFrame([(1,), (2,), (3,), (4,)], "k long")
    )
    pf = (
        ks.crossJoin(dic)
        .where(F.length("term") >= F.col("k"))
        .select(
            "k", F.expr("substr(term, 1, CAST(k AS INT))").alias("pfx")
        )
    )
    return (
        pf.groupBy("k")
        .agg(
            F.countDistinct("pfx").cast("long").alias("n_prefixes"),
            F.count(F.lit(1)).cast("long").alias("n_terms_covered"),
        )
        .select(
            F.col("k").cast("long").alias("prefix_len"),
            "n_prefixes",
            "n_terms_covered",
        )
        .orderBy("prefix_len")
    )


@register(
    "weekly_active_users",
    f"""WITH e AS (
  SELECT epoch_us(ts) // {7 * _US_PER_DAY} AS week_num, user_id FROM events)
SELECT CAST(week_num AS BIGINT) AS week_num,
       CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY week_num ORDER BY week_num""",
)
def weekly_active_users(spark, sf_dir):
    """The WAU series: distinct users and event volume per epoch week —
    the growth chart's denominator (events_stickiness reports the
    DAU/MAU ratio; retention reports comebacks; THIS is the plain
    active-base line everything else is divided by). Observed weeks.

    Scale shape: one week agg with a two-phase distinct."""
    e = _events(spark, sf_dir).select(
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {7 * _US_PER_DAY}"
        ).alias("week_num"),
        "user_id",
    )
    return (
        e.groupBy("week_num")
        .agg(
            F.countDistinct("user_id").cast("long").alias("wau"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.col("week_num").cast("long").alias("week_num"),
            "wau",
            "n_events",
        )
        .orderBy("week_num")
    )


# ---------------------------------------------------------------------------
# session 115 — seasonal-naive forecast error, term position profile,
# source Lorenz points
# ---------------------------------------------------------------------------


@register(
    "seasonal_naive_mae",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
s AS (SELECT day_num, n, lag(n, 7) OVER (ORDER BY day_num) AS pred,
             lag(n) OVER (ORDER BY day_num) AS pred1
      FROM f),
e AS (SELECT CAST(abs(n - pred) AS BIGINT) AS ae,
             CAST(abs(n - pred1) AS BIGINT) AS ae1
      FROM s WHERE pred IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
       CAST(round(1000000 * (CAST(sum(ae) AS DOUBLE) / count(*))) AS BIGINT)
         AS mae_seasonal_q6,
       CAST(round(1000000 * (CAST(COALESCE(sum(ae1), 0) AS DOUBLE)
            / greatest(count(ae1), 1))) AS BIGINT) AS mae_naive_q6
FROM e""",
)
def seasonal_naive_mae(spark, sf_dir):
    """Forecast-baseline scorecard: mean absolute error of the
    seasonal-naive forecast (tomorrow = same weekday last week) beside
    the plain-naive one (tomorrow = today), over the zero-filled
    calendar — the two baselines every real forecasting model must
    beat, and their RATIO is the M-competition's seasonal-strength
    reading from the forecasting side (seasonality_strength measures
    it from variance; if seasonal-naive doesn't beat naive here, the
    weekly cycle isn't worth modeling).

    Determinism: exact integer errors; two divide-then-rounds.

    Scale shape: one day groupBy; lag windows over calendar-bounded
    day rows; a 1-row census."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
                "day_num"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d, "day_num", "left").select(
        "day_num", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = Window.orderBy("day_num")
    s = f.select(
        "day_num", "n", F.lag("n", 7).over(w).alias("pred"),
        F.lag("n", 1).over(w).alias("pred1"),
    )
    e = s.where(F.col("pred").isNotNull()).select(
        F.abs(F.col("n") - F.col("pred")).cast("long").alias("ae"),
        F.abs(F.col("n") - F.col("pred1")).cast("long").alias("ae1"),
    )
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        F.expr(
            "CAST(round(1000000 * (CAST(sum(ae) AS DOUBLE) / count(1)))"
            " AS BIGINT)"
        ).alias("mae_seasonal_q6"),
        F.expr(
            "CAST(round(1000000 * (CAST(COALESCE(sum(ae1), 0) AS DOUBLE)"
            " / greatest(count(ae1), 1))) AS BIGINT)"
        ).alias("mae_naive_q6"),
    )


@register(
    "term_position_profile",
    f"""WITH {_SQL_POS},
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY doc_id),
dfs AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM p GROUP BY term),
top AS (SELECT term, df FROM dfs ORDER BY df DESC, term ASC LIMIT 10),
rp AS (SELECT p.term,
              CAST(round(1000000 * (CAST(p.i - 1 AS DOUBLE)
                   / greatest(dl.n - 1, 1))) AS BIGINT) AS relpos_q6
       FROM p JOIN top USING (term) JOIN dl USING (doc_id))
SELECT rp.term, top.df, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(CAST(sum(rp.relpos_q6) AS BIGINT) // count(*) AS BIGINT)
         AS mean_relpos_q6
FROM rp JOIN top USING (term) GROUP BY rp.term, top.df
ORDER BY top.df DESC, rp.term ASC""",
)
def term_position_profile(spark, sf_dir):
    """Positional bias profile of the 10 highest-df terms: the mean
    relative position (0 = doc start, 1 = doc end) of each term's
    occurrences — the lexical-structure reading behind lead-biased
    scoring (span_first_match profiles where QUERY terms sit; this
    profiles the dictionary head itself: title-ish terms cluster near
    0, closers near 1, and a term at 0.5 is positionally uniform —
    exactly what decides whether position-boosted ranking buys
    anything on this corpus).

    Determinism: relative positions q6-round PER OCCURRENCE
    ((i−1)/(n−1) — both engines' 1-based i minus 1, single-token docs
    guard to denominator 1); means are floor divisions of exact sums.

    Scale shape: the top-10 dictionary picks via TakeOrdered; the
    position stream semi-joins to those 10 terms before any wide
    work."""
    wdf = _docs(spark, sf_dir).select(
        "doc_id", spark_tokens("text").alias("words")
    )
    p = wdf.select(
        "doc_id", F.posexplode("words").alias("i0", "term")
    ).localCheckpoint()  # dl/dfs/positions all consume it
    dl = p.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    dfs = p.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    top = dfs.orderBy(F.desc("df"), F.asc("term")).limit(10)
    rp = (
        p.join(F.broadcast(top), "term")
        .join(dl, "doc_id")
        .select(
            "term",
            "df",
            F.expr(
                "CAST(round(1000000 * (CAST(i0 AS DOUBLE)"
                " / greatest(n - 1, 1))) AS BIGINT)"
            ).alias("relpos_q6"),
        )
    )
    return (
        rp.groupBy("term", "df")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.expr(
                "CAST(CAST(sum(relpos_q6) AS BIGINT) div count(1) AS BIGINT)"
            ).alias("mean_relpos_q6"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
    )


@register(
    "source_lorenz_points",
    f"""WITH t AS (
  SELECT source,
         CAST(COALESCE(sum(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))), 0)
              AS BIGINT) AS n_tok
  FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tt FROM t),
rk AS (SELECT source, n_tok,
              row_number() OVER (ORDER BY n_tok DESC, source ASC) AS rank,
              CAST(sum(n_tok) OVER (ORDER BY n_tok DESC, source ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_tok
       FROM t)
SELECT rk.source, CAST(rk.rank AS BIGINT) AS rank, rk.n_tok,
       CAST((1000000 * rk.cum_tok) // greatest(tot.tt, 1) AS BIGINT)
         AS cum_share_q6
FROM rk CROSS JOIN tot ORDER BY rank""",
)
def source_lorenz_points(spark, sf_dir):
    """The source-concentration Lorenz curve as a table: sources ranked
    by token volume with the cumulative share at each rank —
    source_token_gini's single number, unrolled into the curve a data-
    mix review actually looks at ("the top 3 sources are 80% of the
    tokens" is a POINT on this table; temperature sampling exists to
    flatten it). The per-source window runs on |sources| rows.

    Determinism: exact token counts; cumulative shares are integer
    divisions over the ranked order with the source tiebreak.

    Scale shape: one source agg; the rank/cumsum window runs on
    ≤|sources| rows."""
    t = _docs(spark, sf_dir).groupBy("source").agg(
        F.coalesce(F.sum(F.size(spark_tokens("text"))), F.lit(0))
        .cast("long")
        .alias("n_tok")
    )
    tot = t.agg(F.sum("n_tok").cast("long").alias("tt"))
    wr = Window.orderBy(F.desc("n_tok"), F.asc("source"))
    rk = t.select(
        "source",
        "n_tok",
        F.row_number().over(wr).cast("long").alias("rank"),
        F.sum("n_tok")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_tok"),
    )
    return (
        rk.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "rank",
            "n_tok",
            F.expr(
                "CAST((1000000 * cum_tok) div greatest(tt, 1) AS BIGINT)"
            ).alias("cum_share_q6"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# session 116 — embedding halves drift, weekday-adjusted anomaly, ship
# lag by priority
# ---------------------------------------------------------------------------


@register(
    "embedding_halves_drift",
    """WITH e AS (
  SELECT vec_id, vec_id % 2 AS half, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> 0),
dims AS (
  SELECT half, i, SUM(CAST(round(v[i] * 1000000) AS BIGINT)) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY half, i),
cv AS (SELECT half, list(CAST(s AS DOUBLE) ORDER BY i) AS c, max(n) AS n
       FROM dims GROUP BY half),
px AS (
  SELECT a.n AS n_even, b.n AS n_odd,
         list_dot_product(a.c, b.c) AS nab,
         list_dot_product(a.c, a.c) AS naa,
         list_dot_product(b.c, b.c) AS nbb
  FROM cv a JOIN cv b ON a.half = 0 AND b.half = 1)
SELECT n_even, n_odd, """
    + _CENT_COS
    + """ AS centroid_cos_q6
FROM px""",
)
def embedding_halves_drift(spark, sf_dir):
    """Encoder-drift smoke test: cosine between the centroids of the
    even-vec_id and odd-vec_id halves of the corpus — the idf_split_
    stability argument applied to the embedding space (centroids of
    two random halves of ONE encoder's output should be nearly
    parallel; a cosine visibly below 1 means the corpus mixes encoder
    versions or the id order encodes a batch effect — either poisons
    every centroid/IVF op upstream). Same q6 integer-sum centroid
    construction as source_centroid_matrix.

    Determinism: exact BIGINT centroid sums; one shared _CENT_COS
    float expression with the zero-norm guard.

    Scale shape: one (half, dim) agg with map-side partials (128
    rows), one 2-row pair join."""
    e = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            F.expr("vec_id % 2").alias("half"),
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
    )
    dims = (
        e.select("half", F.posexplode("v").alias("i", "x"))
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
        .groupBy("half", "i")
        .agg(F.sum("xq").alias("s"), F.count(F.lit(1)).cast("long").alias("n"))
    )
    cv = dims.groupBy("half").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(i, s))), t -> cast(t.s as double))"
        ).alias("c"),
        F.expr("CAST(max(n) AS BIGINT)").alias("n"),
    )
    a = cv.where(F.col("half") == 0).select(
        F.col("c").alias("ca"), F.col("n").alias("n_even")
    )
    b = cv.where(F.col("half") == 1).select(
        F.col("c").alias("cb"), F.col("n").alias("n_odd")
    )
    px = a.crossJoin(b).select(
        "n_even",
        "n_odd",
        F.expr(_DOT.format(a="ca", b="cb")).alias("nab"),
        F.expr(_DOT.format(a="ca", b="ca")).alias("naa"),
        F.expr(_DOT.format(a="cb", b="cb")).alias("nbb"),
    )
    return px.select(
        "n_even", "n_odd", F.expr(_CENT_COS).alias("centroid_cos_q6")
    )


@register(
    "weekday_adjusted_anomaly",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, (spine.day_num + 3) % 7 AS dow,
             CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
dw AS (SELECT dow, CAST(round(1000000.0 * sum(n) / count(*)) AS BIGINT) AS mean_q6
       FROM f GROUP BY dow),
r AS (SELECT f.day_num, f.n,
             CAST(round((1000000 * f.n - dw.mean_q6) / 1000000e0) AS BIGINT) AS r0
      FROM f JOIN dw USING (dow)),
m AS (SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(r0) AS BIGINT)
               // greatest(CAST(count(*) AS BIGINT), 1) AS mr
      FROM r),
v AS (SELECT m.nd AS nd,
             CAST(sum((r.r0 - m.mr) * (r.r0 - m.mr)) AS BIGINT) AS srr,
             CAST(sum(r.r0 - m.mr) AS BIGINT) AS src,
             max(m.mr) AS mr
      FROM r CROSS JOIN m GROUP BY m.nd)
SELECT CAST(r.day_num AS BIGINT) AS day_num, r.n,
       CASE WHEN v.nd < 2
            OR (CAST(v.nd AS DOUBLE) * v.srr - CAST(v.src AS DOUBLE) * v.src) = 0e0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(r.r0 - v.mr AS DOUBLE)
                 * (r.r0 - v.mr))
                 / ((CAST(v.nd AS DOUBLE) * v.srr - CAST(v.src AS DOUBLE) * v.src)
                    / (CAST(v.nd AS DOUBLE) * v.nd)))) AS BIGINT)
       END AS z2_q6
FROM r CROSS JOIN v ORDER BY day_num""",
)
def weekday_adjusted_anomaly(spark, sf_dir):
    """Weekday-adjusted daily anomaly score: z² of each day's residual
    AFTER the weekly cycle is removed — the detector people actually
    deploy (events_daily_anomaly's raw z² flags every Saturday on a
    weekday-heavy stream; subtracting the weekday mean first leaves
    only genuine surprises; seasonality_strength says whether the
    adjustment matters at all). Residuals use the shared
    round-of-float-division rule; variance is centered-BIGINT.

    Determinism: one shared z² float expression per day row over exact
    integers; degenerate slates emit 0.

    Scale shape: everything runs on calendar-bounded day rows (the
    whole chain is the seasonality_strength front half plus a per-day
    closing expression)."""
    d = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
                "day_num"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = (
        spine.join(d, "day_num", "left")
        .select(
            "day_num",
            F.expr("(day_num + 3) % 7").alias("dow"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .localCheckpoint()
    )
    dw = f.groupBy("dow").agg(
        F.expr("CAST(round(1000000.0 * sum(n) / count(1)) AS BIGINT)").alias(
            "mean_q6"
        )
    )
    r = (
        f.join(F.broadcast(dw), "dow")
        .select(
            "day_num",
            "n",
            F.expr(
                "CAST(round((1000000 * n - mean_q6) / 1000000e0) AS BIGINT)"
            ).alias("r0"),
        )
        .localCheckpoint()  # stats + per-day closing both consume it
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.expr(
            "CAST(sum(r0) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mr"),
    )
    v = (
        r.crossJoin(F.broadcast(m))
        .groupBy("nd")
        .agg(
            F.sum((F.col("r0") - F.col("mr")) * (F.col("r0") - F.col("mr")))
            .cast("long")
            .alias("srr"),
            F.sum(F.col("r0") - F.col("mr")).cast("long").alias("src"),
            F.max("mr").alias("mr"),
        )
    )
    return (
        r.crossJoin(F.broadcast(v))
        .select(
            F.col("day_num").cast("long").alias("day_num"),
            "n",
            F.expr(
                "CASE WHEN nd < 2"
                " OR (CAST(nd AS DOUBLE) * srr - CAST(src AS DOUBLE) * src) = 0e0"
                " THEN CAST(0 AS BIGINT)"
                " ELSE CAST(round(1000000 * ((CAST(r0 - mr AS DOUBLE)"
                " * (r0 - mr))"
                " / ((CAST(nd AS DOUBLE) * srr - CAST(src AS DOUBLE) * src)"
                " / (CAST(nd AS DOUBLE) * nd)))) AS BIGINT) END"
            ).alias("z2_q6"),
        )
        .orderBy("day_num")
    )


@register(
    "ship_lag_by_priority",
    f"""WITH l AS (
  SELECT l_orderkey,
         epoch_us(CAST(l_shipdate AS TIMESTAMP)) // {_US_PER_DAY} AS ship_day
  FROM lineitem),
o AS (SELECT o_orderkey, o_orderpriority,
             epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_US_PER_DAY} AS order_day
      FROM orders),
j AS (SELECT o.o_orderpriority, CAST(l.ship_day - o.order_day AS BIGINT) AS lag_days
      FROM l JOIN o ON o.o_orderkey = l.l_orderkey)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(round(1000000 * (CAST(sum(lag_days) AS DOUBLE) / count(*)))
            AS BIGINT) AS mean_lag_q6,
       CAST(max(lag_days) AS BIGINT) AS max_lag_days
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def ship_lag_by_priority(spark, sf_dir):
    """Ship lag by order priority: does URGENT actually ship faster —
    the SLA audit of the fulfilment pipe (ship_lag_histogram shows the
    global shape, supplier_ship_delay_topk names slow vendors; THIS
    checks whether the priority field does anything, which is the
    first question when a 1-URGENT order ages like a 5-LOW one).

    Determinism: integer day lags, one divide-then-round, exact max.

    Scale shape: the orderkey join is un-hinted (both sides unbounded
    — the Q4 rule); a ≤|priorities| rollup."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        F.expr(
            f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_US_PER_DAY}"
        ).alias("ship_day"),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(
            f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_PER_DAY}"
        ).alias("order_day"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        (F.col("ship_day") - F.col("order_day")).cast("long").alias("lag_days"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(lag_days) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_lag_q6"),
            F.max("lag_days").cast("long").alias("max_lag_days"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# session 117 — ranking AUC, cluster source spread, props-k histogram
# ---------------------------------------------------------------------------


@register(
    "ranking_auc",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + f""",
rel AS (SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup'),
lab AS (SELECT agg.doc_id, agg.score_q6,
               CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
        FROM agg LEFT JOIN rel USING (doc_id)),
cells AS (SELECT score_q6,
                 CAST(COALESCE(sum(is_rel), 0) AS BIGINT) AS ca,
                 CAST(COALESCE(sum(1 - is_rel), 0) AS BIGINT) AS cb
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
SELECT na AS n_rel, nb AS n_irr,
       CASE WHEN na = 0 OR nb = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (CAST(u2 AS DOUBLE)
                 / (2e0 * na * nb))) AS BIGINT) END AS auc_q6
FROM u""",
)
def ranking_auc(spark, sf_dir):
    """Ranking AUC of the BM25 match set against binary relevance
    (docs containing 'dup'): the probability a relevant match outscores
    an irrelevant one, ties at half — which is EXACTLY the Mann-Whitney
    U statistic, so this reuses the ks/mannwhitney cumulative-histogram
    machinery as an IR metric (AUC is the threshold-free companion to
    P@10/MRR/NDCG: it scores the WHOLE score distribution, the number
    that says whether score-threshold filtering can work at all).

    Determinism: 2U is an exact BIGINT over score-cell counts (the
    session-47 formula — tie midranks never float); one division.

    Scale shape: cells group the match set by quantized score; the
    cumulative window runs over score cells (match-set-bounded, the
    query's own size — never corpus-wide)."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
        .withColumn("is_rel_flag", F.lit(1))
    )
    lab = agg.join(rel, "doc_id", "left").select(
        "score_q6",
        F.coalesce("is_rel_flag", F.lit(0)).alias("is_rel"),
    )
    cells = lab.groupBy("score_q6").agg(
        F.coalesce(F.sum("is_rel"), F.lit(0)).cast("long").alias("ca"),
        F.coalesce(F.sum(F.lit(1) - F.col("is_rel")), F.lit(0))
        .cast("long")
        .alias("cb"),
    )
    wc = Window.orderBy("score_q6").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = cells.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(wc), F.lit(0)).cast("long").alias(
            "cb_before"
        ),
    )
    u = cum.agg(
        F.coalesce(
            F.sum(F.col("ca") * (2 * F.col("cb_before") + F.col("cb"))),
            F.lit(0),
        )
        .cast("long")
        .alias("u2"),
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("na"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nb"),
    )
    return u.select(
        F.col("na").alias("n_rel"),
        F.col("nb").alias("n_irr"),
        F.expr(
            "CASE WHEN na = 0 OR nb = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (CAST(u2 AS DOUBLE)"
            " / (2e0 * na * nb))) AS BIGINT) END"
        ).alias("auc_q6"),
    )


@register(
    "cluster_source_spread",
    _SQL_LSH_PAIRS
    + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
cs AS (SELECT comp.cluster_id,
              CAST(count(*) AS BIGINT) AS n_members,
              CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources
       FROM comp JOIN documents d USING (doc_id) GROUP BY comp.cluster_id)
SELECT n_sources, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(n_members) AS BIGINT) AS n_docs
FROM cs GROUP BY n_sources ORDER BY n_sources""",
)
def cluster_source_spread(spark, sf_dir):
    """Source spread of near-dup clusters: how many distinct sources
    each cluster spans, histogrammed — the one-number-per-cluster view
    of cross_source_dup_matrix's pairwise table (single-source
    clusters are internal re-posts a per-source dedup pass would
    catch; multi-source clusters are syndication/mirrors that ONLY
    global dedup sees — their share is the argument for paying the
    global shuffle).

    Determinism: the memoized LSH→CC labels; exact distincts.

    Scale shape: labels join documents on doc_id; per-cluster aggs are
    cluster-bounded; the spread rollup is ≤|sources| rows."""
    edges = _lsh_pair_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    comp = connected_components(labels, edges).select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )
    d = _docs(spark, sf_dir).select("doc_id", "source")
    cs = (
        comp.join(d, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
    )
    return (
        cs.groupBy("n_sources")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("n_members").cast("long").alias("n_docs"),
        )
        .orderBy("n_sources")
    )


@register(
    "props_k_histogram",
    """WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events),
b AS (SELECT event_type,
             CASE WHEN k IS NULL THEN -2
                  WHEN k <= 0 THEN -1
                  ELSE CAST(length(bin(k)) - 1 AS BIGINT) END AS k_band
      FROM e)
SELECT event_type, k_band, CAST(count(*) AS BIGINT) AS n_events
FROM b GROUP BY event_type, k_band ORDER BY event_type, k_band""",
)
def props_k_histogram(spark, sf_dir):
    """Distribution of the semi-structured payload value: the JSON 'k'
    field in log2 bands per event type (−2 = missing/unparseable, −1 =
    non-positive) — the SHAPE that events_props_json's sum/avg
    flattens (a bimodal k with the same mean is a different product
    reality; the missing band is the schema-compliance rate
    props_key_census only counts keys for).

    Determinism: json_extract_string/get_json_object agree on scalar
    extraction; exact integer bands.

    Scale shape: map-side JSON extraction and banding, one
    ≤|types|×~35-cell agg."""
    e = _events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("k"),
    )
    b = e.select(
        "event_type",
        F.expr(
            "CASE WHEN k IS NULL THEN -2 WHEN k <= 0 THEN -1"
            " ELSE CAST(length(bin(k)) - 1 AS BIGINT) END"
        ).alias("k_band"),
    )
    return (
        b.groupBy("event_type", "k_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("event_type", "k_band")
    )


# ---------------------------------------------------------------------------
# session 118 — sampled-stats ranking fidelity, region×segment matrix,
# order-value drift deciles
# ---------------------------------------------------------------------------


@register(
    "sampled_stats_ranking_fidelity",
    f"""WITH tf AS ({SQL_TF}),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl),
sth AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl
        FROM dl WHERE doc_id % 2 = 0),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
dfh AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
        WHERE doc_id % 2 = 0 GROUP BY term),
q AS (SELECT unnest(['dup', 'spark']) AS term),
pf AS (SELECT tf.doc_id,
              ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
                * tf.tf * 2.2
                / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len
                   / (SELECT avgdl FROM st))) AS s
       FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id)),
af AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
       FROM pf GROUP BY doc_id),
tfull AS (SELECT doc_id FROM af ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
ph AS (SELECT tf.doc_id,
              ln(1.0 + ((SELECT n_docs FROM sth) - COALESCE(dfh.df, 0) + 0.5)
                 / (COALESCE(dfh.df, 0) + 0.5))
                * tf.tf * 2.2
                / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len
                   / (SELECT avgdl FROM sth))) AS s
       FROM tf JOIN q USING (term) LEFT JOIN dfh USING (term)
       JOIN dl USING (doc_id)),
ah AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
       FROM ph GROUP BY doc_id),
thalf AS (SELECT doc_id FROM ah ORDER BY score_q6 DESC, doc_id ASC LIMIT 10)
SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_overlap
FROM tfull JOIN thalf USING (doc_id)""",
)
def sampled_stats_ranking_fidelity(spark, sf_dir):
    """The sampled-statistics license, tested at the RANKING level:
    every document scored twice — once with full-corpus df/avgdl, once
    with statistics computed from the EVEN half only — and the top-10
    overlap reported. idf_split_stability says the statistic VALUES
    correlate; this says whether the rankings users see survive
    (ranking is what a 100 TB engine actually computes df samples
    for; overlap 10/10 is the green light, and terms unseen by the
    sample take the maximal-idf OOV fallback — the preretrieval_qpp
    rule).

    Determinism: both legs are the standard BM25 chain over the same
    tf/dl tables, quantized before their TakeOrdereds.

    Scale shape: one tokenize; the half-stats aggs filter the SAME
    tables (no second corpus pass); two TakeOrdereds, a 10-row join."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()  # both legs + stats consume it
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len")).localCheckpoint()
    stt = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    sth = dl.where(F.expr("doc_id % 2 = 0")).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    dfh = (
        tf.where(F.expr("doc_id % 2 = 0"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    q = F.broadcast(
        spark.createDataFrame([("dup",), ("spark",)], "term string")
    )
    bm = (
        "ln(1.0 + (n_docs - {df} + 0.5) / ({df} + 0.5)) * tf * 2.2"
        " / (tf + 1.2 * (0.25 + 0.75 * doc_len / avgdl))"
    )

    def leg(stats, dftab, df_expr):
        per = (
            tf.join(q, "term")
            .join(F.broadcast(dftab), "term", "left")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", F.expr(bm.format(df=df_expr)).alias("s"))
        )
        return (
            per.groupBy("doc_id")
            .agg(F.expr("CAST(round(sum(s) * 1000000) AS BIGINT)").alias("sq"))
            .orderBy(F.desc("sq"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id")
        )

    tfull = leg(stt, dfs, "df")
    thalf = leg(sth, dfh, "COALESCE(df, 0)")
    return (
        tfull.join(thalf, "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        .select(F.lit(10).cast("long").alias("k"), "n_overlap")
    )


@register(
    "region_segment_matrix",
    """WITH j AS (
  SELECT r.r_name AS region, c.c_mktsegment
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey)
SELECT region, c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM j GROUP BY region, c_mktsegment ORDER BY region, c_mktsegment""",
)
def region_segment_matrix(spark, sf_dir):
    """Customer base by region × market segment — the two-way dimension
    census behind territory planning (region_market_census totals each
    region; this shows WHAT KIND of customer each region holds, and an
    empty cell is an expansion market).

    Scale shape: nation/region broadcast into the customer scan; one
    ≤|regions|×|segments|-cell agg."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_nationkey", "c_mktsegment"
    )
    n = F.broadcast(
        spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_regionkey"
        )
    )
    r = F.broadcast(
        spark.read.parquet(f"{sf_dir}/region.parquet").select(
            "r_regionkey", F.col("r_name").alias("region")
        )
    )
    j = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("region", "c_mktsegment")
    )
    return (
        j.groupBy("region", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("region", "c_mktsegment")
    )


@register(
    "order_value_drift_deciles",
    """WITH b AS (
  SELECT CAST(min(o_orderkey) AS BIGINT) AS lo, CAST(max(o_orderkey) AS BIGINT) AS hi
  FROM orders),
d AS (SELECT least((10 * (o.o_orderkey - b.lo)) // greatest(b.hi - b.lo + 1, 1), 9)
         AS decile,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o CROSS JOIN b)
SELECT CAST(decile AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(1000000 * (CAST(sum(cents) AS DOUBLE) / count(*))) AS BIGINT)
         AS mean_cents_q6
FROM d GROUP BY decile ORDER BY decile""",
)
def order_value_drift_deciles(spark, sf_dir):
    """Order-value drift across the key range: mean order value per
    orderkey decile (the arrival proxy, the term/lang/quality-drift
    convention applied to the fact table) — a trending mean here means
    the generator or the business changed mid-stream, and every
    whole-table average is mixing epochs.

    Determinism: deciles are integer range math off a 1-row bounds
    broadcast; one divide-then-round per decile.

    Scale shape: map-side decile math, a 10-group agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    b = o.agg(
        F.min("o_orderkey").cast("long").alias("lo"),
        F.max("o_orderkey").cast("long").alias("hi"),
    )
    d = o.crossJoin(F.broadcast(b)).select(
        F.expr(
            "least((10 * (o_orderkey - lo)) div greatest(hi - lo + 1, 1), 9)"
        ).alias("decile"),
        "cents",
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(cents) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_cents_q6"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_orders",
            "mean_cents_q6",
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# session 119 — score-rank curve, IVF centroid matrix, cohort retention
# ---------------------------------------------------------------------------


@register(
    "score_rank_curve",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + """,
rk AS (SELECT doc_id, score_q6,
              row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
       FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 20),
t1 AS (SELECT CAST(max(CASE WHEN rank = 1 THEN score_q6 END) AS BIGINT) AS s1
       FROM rk)
SELECT CAST(rk.rank AS BIGINT) AS rank, rk.score_q6,
       CASE WHEN t1.s1 = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * rk.score_q6) // t1.s1 AS BIGINT)
       END AS share_of_top_q6
FROM rk CROSS JOIN t1 ORDER BY rank""",
)
def score_rank_curve(spark, sf_dir):
    """Score decay curve of the result page: the top-20 scores with
    each rank's share of the top score — the page-confidence shape
    (a cliff after rank 2 means two real answers and filler — truncate
    the page; a flat curve means the query doesn't discriminate and
    WIG/clarity will read low; this is the per-query visual those QPP
    summaries compress).

    Determinism: quantized scores; shares are integer divisions of the
    q6 values.

    Scale shape: one TakeOrdered(20); the rank window and share join
    run on 20 rows."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    rk = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))
            .cast("long"),
        )
    )
    t1 = rk.agg(
        F.max(F.when(F.col("rank") == 1, F.col("score_q6")))
        .cast("long")
        .alias("s1")
    )
    return (
        rk.crossJoin(F.broadcast(t1))
        .select(
            "rank",
            "score_q6",
            F.expr(
                "CASE WHEN s1 = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * score_q6) div s1 AS BIGINT) END"
            ).alias("share_of_top_q6"),
        )
        .orderBy("rank")
    )


@register(
    "ivf_centroid_matrix",
    _KMEANS_SQL_PRELUDE
    + f""",
px AS (
  SELECT a.cid AS cid_a, b.cid AS cid_b,
         {_sql_cosq('a.cv', 'b.cv', 1_000_000)} AS cos_q6
  FROM cent2 a JOIN cent2 b ON a.cid < b.cid)
SELECT CAST(cid_a AS BIGINT) AS cid_a, CAST(cid_b AS BIGINT) AS cid_b, cos_q6
FROM px ORDER BY cid_a, cid_b""",
)
def ivf_centroid_matrix(spark, sf_dir):
    """Pairwise cosine matrix of the trained IVF centroids — the cell
    GEOMETRY audit (two near-parallel centroids mean k-means split one
    true cluster, and vectors on their shared boundary are exactly the
    ones ivf_assign_margin counts in bucket 0 and nprobe pays for;
    well-separated centroids license nprobe=1). K=8 → 28 pairs.

    Determinism: q6-quantized cosines over the exact q6-sum centroids.

    Scale shape: a K×K self-join of the K-row centroid table."""
    _members, cent, _assign = _trained_ivf(spark, sf_dir)
    a = cent.select(F.col("cid").alias("cid_a"), F.col("cv").alias("ca"))
    b = cent.select(F.col("cid").alias("cid_b"), F.col("cv").alias("cb"))
    px = a.join(b, F.col("cid_a") < F.col("cid_b")).select(
        "cid_a", "cid_b", _cosq("ca", "cb", 1_000_000).alias("cos_q6")
    )
    return px.select(
        F.col("cid_a").cast("long").alias("cid_a"),
        F.col("cid_b").cast("long").alias("cid_b"),
        "cos_q6",
    ).orderBy("cid_a", "cid_b")


@register(
    "cohort_retention_matrix",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {7 * _US_PER_DAY} AS week_num FROM events),
uw AS (SELECT DISTINCT user_id, week_num FROM e),
c0 AS (SELECT user_id, CAST(min(week_num) AS BIGINT) AS cohort_week
       FROM uw GROUP BY user_id),
cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
       FROM c0 GROUP BY cohort_week),
act AS (SELECT c0.cohort_week,
               CAST(uw.week_num - c0.cohort_week AS BIGINT) AS age_week,
               CAST(count(*) AS BIGINT) AS n_active
        FROM uw JOIN c0 USING (user_id)
        GROUP BY c0.cohort_week, uw.week_num)
SELECT CAST(act.cohort_week AS BIGINT) AS cohort_week, act.age_week,
       cs.cohort_size, act.n_active,
       CAST((1000000 * act.n_active) // cs.cohort_size AS BIGINT)
         AS retention_q6
FROM act JOIN cs USING (cohort_week)
ORDER BY cohort_week, age_week""",
)
def cohort_retention_matrix(spark, sf_dir):
    """The classic cohort-retention triangle: users grouped by first-
    active week, each cohort's share still active at every later age
    week — THE growth artifact (events_retention gives one diagonal;
    new_returning_daily the top row; this is the whole triangle whose
    down-the-column reading separates product decay from cohort
    quality). Age 0 is 100% by construction.

    Determinism: exact distinct (user, week) activity; shares are
    integer divisions over exact cohort sizes.

    Scale shape: one (user, week) distinct; the cohort min-agg keys on
    user; the matrix agg is (cohorts × ages)-bounded — calendar², not
    corpus."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {7 * _US_PER_DAY}"
        ).alias("week_num"),
    )
    uw = e.distinct().localCheckpoint()  # cohorts + activity both consume it
    c0 = uw.groupBy("user_id").agg(
        F.min("week_num").cast("long").alias("cohort_week")
    )
    cs = c0.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    act = (
        uw.join(c0, "user_id")
        .groupBy("cohort_week", "week_num")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .select(
            "cohort_week",
            (F.col("week_num") - F.col("cohort_week"))
            .cast("long")
            .alias("age_week"),
            "n_active",
        )
    )
    return (
        act.join(F.broadcast(cs), "cohort_week")
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            "age_week",
            "cohort_size",
            "n_active",
            F.expr(
                "CAST((1000000 * n_active) div cohort_size AS BIGINT)"
            ).alias("retention_q6"),
        )
        .orderBy("cohort_week", "age_week")
    )


# ---------------------------------------------------------------------------
# session 120 — SQ8 recall, cluster length variance, nation wealth board
# ---------------------------------------------------------------------------


@register(
    "sq8_recall",
    """WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xq
       FROM e, (SELECT unnest(generate_series(1, 64)) AS i)
       WHERE vec_id <> 0),
mm AS (SELECT dim, CAST(min(xq) AS BIGINT) AS mn, CAST(max(xq) AS BIGINT) AS mx
       FROM ex GROUP BY dim),
rec AS (SELECT ex.vec_id, ex.dim,
               CAST(mm.mn + CASE WHEN mm.mx = mm.mn THEN 0
                    ELSE ((((ex.xq - mm.mn) * 255) // (mm.mx - mm.mn))
                         * (mm.mx - mm.mn)) // 255 END AS BIGINT) AS rq
        FROM ex JOIN mm USING (dim)),
rv AS (SELECT vec_id, list(CAST(rq AS DOUBLE) ORDER BY dim) AS r
       FROM rec GROUP BY vec_id),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
approx AS (
  SELECT rv.vec_id FROM rv, q
  ORDER BY CAST(round(1000000 * list_dot_product(rv.r, q.qv)
           / (sqrt(list_dot_product(rv.r, rv.r))
              * sqrt(list_dot_product(q.qv, q.qv)))) AS BIGINT) DESC,
           rv.vec_id ASC
  LIMIT 10),
exact AS (
  SELECT e.vec_id FROM e, q WHERE e.vec_id <> 0
  ORDER BY CAST(round(1000000 * list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v))
              * sqrt(list_dot_product(q.qv, q.qv)))) AS BIGINT) DESC,
           e.vec_id ASC
  LIMIT 10)
SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_overlap
FROM approx JOIN exact USING (vec_id)""",
)
def sq8_recall(spark, sf_dir):
    """Recall@10 of brute-force search over SQ8-RECONSTRUCTED vectors
    vs exact float vectors — the truth behind sq8_quantization_error's
    SSE proxy (SSE says how much the codes distort; recall says
    whether the distortion flips any answer a user sees — the number
    that actually licenses shipping the 4× smaller store, read next to
    ann_pq_recall's 64× trade). Reconstruction is the exact integer
    affine code (xq−mn ≥ 0, floor == trunc).

    Determinism: integer reconstruction; both rankings use quantized
    cosines with the vec_id tiebreak.

    Scale shape: the min/max table is 64 rows broadcast; recon is
    map-side; two TakeOrdereds and a 10-row join."""
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    ex = (
        e.where(F.col("vec_id") != 0)
        .select("vec_id", F.posexplode("v").alias("dim", "x"))
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
    )
    mm = ex.groupBy("dim").agg(
        F.min("xq").alias("mn"), F.max("xq").alias("mx")
    )
    rec = ex.join(F.broadcast(mm), "dim").select(
        "vec_id",
        "dim",
        F.expr(
            "CAST(mn + CASE WHEN mx = mn THEN 0"
            " ELSE ((((xq - mn) * 255) div (mx - mn)) * (mx - mn)) div 255 END"
            " AS BIGINT)"
        ).alias("rq"),
    )
    rv = rec.groupBy("vec_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(dim, rq))),"
            " t -> cast(t.rq as double))"
        ).alias("r")
    )
    qv = e.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    approx = (
        rv.crossJoin(F.broadcast(qv))
        .select("vec_id", _cosq("r", "qv", 1_000_000).alias("cq"))
        .orderBy(F.desc("cq"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id")
    )
    exact = (
        _cos_spark(spark, sf_dir)
        .select("vec_id", _q6(F.col("cos")).alias("cos_q6"))
        .orderBy(F.desc("cos_q6"), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    return (
        approx.join(exact, "vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        .select(F.lit(10).cast("long").alias("k"), "n_overlap")
    )


@register(
    "cluster_length_variance",
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
t AS (SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT)
               AS n_tok
      FROM documents),
cl AS (SELECT comp.cluster_id, CAST(count(*) AS BIGINT) AS n_members,
              CAST(min(t.n_tok) AS BIGINT) AS mn, CAST(max(t.n_tok) AS BIGINT) AS mx
       FROM comp JOIN t USING (doc_id) GROUP BY comp.cluster_id),
bk AS (SELECT CASE WHEN mx = 0 THEN 9
              ELSE least(((1000000 * mn) // mx) // 100000, 9) END AS ratio_bucket
       FROM cl)
SELECT CAST(ratio_bucket AS BIGINT) AS ratio_bucket,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM bk GROUP BY ratio_bucket ORDER BY ratio_bucket""",
)
def cluster_length_variance(spark, sf_dir):
    """Within-cluster length agreement: per near-dup cluster, the
    min/max token-length ratio in deciles (bucket 9 = members are the
    same size, the true-mirror signature; a low-bucket cluster pairs a
    tweet with a novel, which banding can produce but editing rarely
    does — a cheap false-positive screen BEFORE paying exact-Jaccard
    verification on every pair).

    Determinism: memoized LSH→CC labels; exact integer ratio/deciles
    with the least(·, 9) clamp; empty-doc clusters (mx = 0) count as
    bucket 9 (identical trivially).

    Scale shape: labels join a map-side length projection; per-cluster
    min/max in one agg; a 10-bucket rollup."""
    edges = _lsh_pair_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    comp = connected_components(labels, edges).select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )
    t = _docs(spark, sf_dir).select(
        "doc_id", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    cl = (
        comp.join(t, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("n_tok").cast("long").alias("mn"),
            F.max("n_tok").cast("long").alias("mx"),
        )
    )
    bk = cl.select(
        F.expr(
            "CASE WHEN mx = 0 THEN 9"
            " ELSE least(((1000000 * mn) div mx) div 100000, 9) END"
        ).alias("ratio_bucket")
    )
    return (
        bk.groupBy("ratio_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            F.col("ratio_bucket").cast("long").alias("ratio_bucket"),
            "n_clusters",
        )
        .orderBy("ratio_bucket")
    )


@register(
    "nation_richest_customer",
    """WITH c AS (
  SELECT c_nationkey, c_custkey,
         CAST(round(100 * c_acctbal) AS BIGINT) AS bal_c
  FROM customer),
m AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(max(bal_c) AS BIGINT) AS top_bal_c
      FROM c GROUP BY c_nationkey)
SELECT m.c_nationkey, m.n_customers,
       CAST(min(c.c_custkey) AS BIGINT) AS top_custkey, m.top_bal_c
FROM m JOIN c ON c.c_nationkey = m.c_nationkey AND c.bal_c = m.top_bal_c
GROUP BY m.c_nationkey, m.n_customers, m.top_bal_c
ORDER BY m.c_nationkey""",
)
def nation_richest_customer(spark, sf_dir):
    """Per-nation wealth board: each nation's customer count, its
    richest customer and that balance — the per-group argmax via the
    Q2 min_cost_supplier pattern (max join-back + min-key tiebreak on
    the SAME group exchange; DuckDB's max_by rejects composite struct
    keys, so the two-step is the portable form). Ties break to the
    smaller custkey in both engines.

    Scale shape: one customer agg for the maxima, a join-back on the
    (nation, balance) key, a second tiny agg."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_nationkey",
        "c_custkey",
        F.expr("CAST(round(100 * c_acctbal) AS BIGINT)").alias("bal_c"),
    ).localCheckpoint()
    m = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.max("bal_c").cast("long").alias("top_bal_c"),
    ).withColumnRenamed("c_nationkey", "nk")
    j = c.join(
        m,
        (c["c_nationkey"] == m["nk"]) & (c["bal_c"] == m["top_bal_c"]),
    ).select("nk", "n_customers", "c_custkey", "top_bal_c")
    return (
        j.groupBy("nk", "n_customers", "top_bal_c")
        .agg(F.min("c_custkey").cast("long").alias("top_custkey"))
        .select(
            F.col("nk").alias("c_nationkey"),
            "n_customers",
            "top_custkey",
            "top_bal_c",
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# session 121 — monthly repeat share, hour×weekday independence, zero-value
# census
# ---------------------------------------------------------------------------


@register(
    "monthly_repeat_share",
    """WITH o AS (
  SELECT o_custkey,
         (year(CAST(o_orderdate AS TIMESTAMP)) * 12
          + month(CAST(o_orderdate AS TIMESTAMP)) - 1) AS mkey
  FROM orders),
f AS (SELECT o_custkey, CAST(min(mkey) AS BIGINT) AS first_mkey
      FROM o GROUP BY o_custkey),
j AS (SELECT o.mkey, CASE WHEN o.mkey > f.first_mkey THEN 1 ELSE 0 END AS is_rep
      FROM o JOIN f USING (o_custkey))
SELECT CAST(mkey AS BIGINT) AS month_key, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(COALESCE(sum(is_rep), 0) AS BIGINT) AS n_repeat,
       CAST((1000000 * COALESCE(sum(is_rep), 0)) // count(*) AS BIGINT)
         AS repeat_share_q6
FROM j GROUP BY mkey ORDER BY month_key""",
)
def monthly_repeat_share(spark, sf_dir):
    """Acquisition-vs-retention mix over time: per month, the share of
    orders placed by customers whose FIRST order was in an earlier
    month — the maturity curve of the book (young businesses run low;
    the asymptote is the steady-state repeat economy;
    new_customers_monthly counts the new heads, THIS shows what share
    of the month's volume they are NOT). First-month orders count as
    new even when the customer reorders within that same month — the
    declared month-grain rule.

    Determinism: exact month keys; the first-order month is a custkey
    min-agg joined back on the same key.

    Scale shape: one custkey min-agg, an un-hinted join-back, a
    ≤|months| rollup."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr(
            "(year(CAST(o_orderdate AS TIMESTAMP)) * 12"
            " + month(CAST(o_orderdate AS TIMESTAMP)) - 1)"
        ).alias("mkey"),
    )
    f = o.groupBy("o_custkey").agg(
        F.min("mkey").cast("long").alias("first_mkey")
    )
    j = o.join(f, "o_custkey").select(
        "mkey",
        F.when(F.col("mkey") > F.col("first_mkey"), 1).otherwise(0).alias(
            "is_rep"
        ),
    )
    return (
        j.groupBy("mkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.coalesce(F.sum("is_rep"), F.lit(0)).cast("long").alias("n_repeat"),
        )
        .select(
            F.col("mkey").cast("long").alias("month_key"),
            "n_orders",
            "n_repeat",
            F.expr(
                "CAST((1000000 * n_repeat) div n_orders AS BIGINT)"
            ).alias("repeat_share_q6"),
        )
        .orderBy("month_key")
    )


# per-cell chi² contribution from exact integers (n cell, rh row total,
# ch col total, nt grand total) — expected = rh*ch/nt, every product
# CAST(..AS DOUBLE) from the FIRST multiply (session-49 rule), q6-rounded
# per cell then BIGINT-summed.
_HD_CHI = (
    "CAST(round(1000000 * ((CAST(n AS DOUBLE) - CAST(rh AS DOUBLE) * ch / nt)"
    " * (CAST(n AS DOUBLE) - CAST(rh AS DOUBLE) * ch / nt)"
    " / (CAST(rh AS DOUBLE) * ch / nt))) AS BIGINT)"
)


@register(
    "hour_dow_chi2",
    f"""WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
         (epoch_us(ts) // {_US_PER_DAY} + 3) % 7 AS dow
  FROM events),
c AS (SELECT hour, dow, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY hour, dow),
rh AS (SELECT hour, CAST(sum(n) AS BIGINT) AS rh FROM c GROUP BY hour),
ch AS (SELECT dow, CAST(sum(n) AS BIGINT) AS ch FROM c GROUP BY dow),
nt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
spine AS (SELECT rh.hour, rh.rh, ch.dow, ch.ch FROM rh CROSS JOIN ch),
cell AS (SELECT spine.hour, spine.dow, spine.rh, spine.ch, nt.nt,
                CAST(COALESCE(c.n, 0) AS BIGINT) AS n
         FROM spine LEFT JOIN c USING (hour, dow) CROSS JOIN nt)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST((SELECT nt FROM nt) AS BIGINT) AS n_events,
       CAST(COALESCE(sum({_HD_CHI}), 0) AS BIGINT) AS chi2_q6
FROM cell""",
)
def hour_dow_chi2(spark, sf_dir):
    """Independence test for the hour × weekday traffic grid: Pearson
    chi² over the full spine (absent cells contribute their expected
    mass) — the INFERENCE on top of events_hour_weekday_heatmap's
    picture (a significant chi² means hour profiles genuinely differ
    by weekday, so capacity planning needs the full 168-cell grid;
    independence means 24 + 7 numbers suffice — a real model-size
    decision). df = (24−1)(7−1) = 138 for the threshold lookup.

    Determinism: cells/margins exact; per-cell contributions follow
    the significant_terms_chi2 casting discipline and q6-round FIRST.

    Scale shape: one (hour, dow) agg; the spine/margins/census all run
    on ≤168 cells."""
    e = _events(spark, sf_dir).select(
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24").alias(
            "hour"
        ),
        F.expr(
            f"(unix_micros(cast(ts as timestamp)) div {_US_PER_DAY} + 3) % 7"
        ).alias("dow"),
    )
    c = e.groupBy("hour", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint()  # margins + spine join consume it
    rh = c.groupBy("hour").agg(F.sum("n").cast("long").alias("rh"))
    chd = c.groupBy("dow").agg(F.sum("n").cast("long").alias("ch"))
    nt = c.agg(F.sum("n").cast("long").alias("nt"))
    spine = rh.crossJoin(F.broadcast(chd))
    cell = (
        spine.join(c, ["hour", "dow"], "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "rh", "ch", "nt", F.coalesce("n", F.lit(0)).cast("long").alias("n")
        )
    )
    return cell.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.max("nt").cast("long").alias("n_events"),
        F.coalesce(F.sum(F.expr(_HD_CHI)), F.lit(0))
        .cast("long")
        .alias("chi2_q6"),
    )


@register(
    "zero_value_census",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(COALESCE(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) = 0
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_zero,
       CAST((1000000 * COALESCE(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) = 0
            THEN 1 ELSE 0 END), 0)) // count(*) AS BIGINT) AS zero_share_q6
FROM events GROUP BY event_type ORDER BY event_type""",
)
def zero_value_census(spark, sf_dir):
    """Zero-value event census per type: how often the value field
    carries nothing — the instrumentation-health check (a purchase
    with value 0 is either a freebie or a broken price pipe; a CLICK
    with nonzero value is the inverse surprise; both shares belong on
    the data-quality board next to props_k_histogram's missing band).

    Determinism: exact cents-zero test and counts.

    Scale shape: one map-side conditional agg per type."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN CAST(round(value * 100) AS BIGINT) = 0"
                        " THEN 1 ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_zero"),
        )
        .select(
            "event_type",
            "n_events",
            "n_zero",
            F.expr(
                "CAST((1000000 * n_zero) div n_events AS BIGINT)"
            ).alias("zero_share_q6"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# session 122 — user regularity, part type×size matrix, quantity spectrum
# ---------------------------------------------------------------------------


@register(
    "user_regularity_histogram",
    f"""WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {7 * _US_PER_DAY} AS week_num
  FROM events),
u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS active_weeks,
             CAST(max(week_num) - min(week_num) + 1 AS BIGINT) AS span_weeks
      FROM uw GROUP BY user_id),
bk AS (SELECT least(((1000000 * active_weeks) // span_weeks) // 100000, 9)
         AS bucket
       FROM u),
h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_users FROM bk GROUP BY bucket),
spine AS (SELECT unnest(generate_series(0, 9)) AS bucket)
SELECT CAST(spine.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(h.n_users, 0) AS BIGINT) AS n_users
FROM spine LEFT JOIN h USING (bucket) ORDER BY bucket""",
)
def user_regularity_histogram(spark, sf_dir):
    """Engagement regularity census: per user, active weeks over the
    weeks SPANNED (first to last), in deciles — the consistency cut
    the volume metrics miss (two users with 10 active weeks differ
    completely if one spanned 10 weeks and the other 50; bucket 9 is
    the habit population retention teams protect, low buckets are
    sporadic returners — WAU counts both identically). Single-week
    users land in bucket 9 (1/1) by construction — declared.

    Determinism: exact integer shares and deciles with the least(·, 9)
    clamp.

    Scale shape: one (user, week) distinct, a user agg, a 10-bucket
    rollup and spine."""
    uw = (
        _events(spark, sf_dir)
        .select(
            "user_id",
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {7 * _US_PER_DAY}"
            ).alias("week_num"),
        )
        .distinct()
    )
    u = uw.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("active_weeks"),
        (F.max("week_num") - F.min("week_num") + 1)
        .cast("long")
        .alias("span_weeks"),
    )
    bk = u.select(
        F.expr(
            "least(((1000000 * active_weeks) div span_weeks) div 100000, 9)"
        ).alias("bucket")
    )
    h = bk.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    return (
        spine.join(h, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
        .orderBy("bucket")
    )


@register(
    "part_type_size_matrix",
    """SELECT p_type, CAST(p_size AS BIGINT) // 10 AS size_band,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(round(1000000 * (CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
            AS DOUBLE) / count(*))) AS BIGINT) AS mean_price_c_q6
FROM part GROUP BY p_type, size_band ORDER BY p_type, size_band""",
)
def part_type_size_matrix(spark, sf_dir):
    """Catalog structure matrix: part counts and mean price per
    (type, size-decade) cell — the two-way census of the part
    dimension (brand_size_price_trend fits the size-price line per
    brand; this shows the raw cell means per type, where a hole or a
    price cliff is a catalog-entry bug).

    Scale shape: one map-side band projection, a
    ≤|types|×|bands|-cell agg."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_type",
        F.expr("CAST(p_size AS BIGINT) div 10").alias("size_band"),
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        p.groupBy("p_type", "size_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(cents) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_price_c_q6"),
        )
        .orderBy("p_type", "size_band")
    )


@register(
    "quantity_spectrum",
    """SELECT CAST(l_quantity AS BIGINT) AS quantity,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem GROUP BY quantity ORDER BY quantity""",
)
def quantity_spectrum(spark, sf_dir):
    """The order-quantity spectrum: lineitem count at every exact
    quantity — the fact-table twin of tf_spectrum (a uniform spectrum
    is generator-flat; real books spike at 1 and at case sizes; Q17's
    small-quantity logic and the discount bands both read slices of
    exactly this distribution).

    Scale shape: one ≤|distinct quantities|-group agg, map-side."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_quantity").cast("long").alias("quantity")
    )
    return (
        li.groupBy("quantity")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lineitems"))
        .orderBy("quantity")
    )


# ---------------------------------------------------------------------------
# session 123 — dedup quality shift, shingle df spectrum, language census
# ---------------------------------------------------------------------------


@register(
    "dedup_quality_shift",
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
t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT)
           AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')))
           AS BIGINT) AS n_types
  FROM documents),
g AS (SELECT CASE WHEN comp.cluster_id IS NULL THEN 'unique'
                  WHEN comp.cluster_id = t.doc_id THEN 'survivor'
                  ELSE 'dropped' END AS grp,
             t.n_tok,
             CASE WHEN t.n_tok = 0 THEN 0
                  ELSE (1000000 * t.n_types) // t.n_tok END AS ttr_q6
      FROM t LEFT JOIN comp ON comp.doc_id = t.doc_id)
SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(CAST(sum(ttr_q6) AS BIGINT) // count(*) AS BIGINT) AS mean_ttr_q6
FROM g GROUP BY grp ORDER BY grp""",
)
def dedup_quality_shift(spark, sf_dir):
    """Quality shift under keep-min-id dedup: mean TTR of unique docs,
    cluster survivors, and dropped members — the "does dedup make the
    corpus better or just smaller" check (keep-min-id keeps an
    ARBITRARY member; if dropped docs systematically out-TTR the
    survivors, the policy is discarding the good copy and
    dedup_policy_compare's alternatives earn their keep).

    Determinism: memoized LSH→CC labels; TTR is the integer-division
    rule per doc; means are floor divisions.

    Scale shape: labels LEFT-probe a map-side token-stats projection;
    a 3-group rollup."""
    edges = _lsh_pair_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    comp = connected_components(labels, edges).select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(spark_tokens("text")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(spark_tokens("text")))
        .cast("long")
        .alias("n_types"),
    )
    g = t.join(comp, "doc_id", "left").select(
        F.expr(
            "CASE WHEN cluster_id IS NULL THEN 'unique'"
            " WHEN cluster_id = doc_id THEN 'survivor'"
            " ELSE 'dropped' END"
        ).alias("grp"),
        "n_tok",
        F.expr(
            "CASE WHEN n_tok = 0 THEN 0"
            " ELSE (1000000 * n_types) div n_tok END"
        ).alias("ttr_q6"),
    )
    return (
        g.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.expr(
                "CAST(CAST(sum(ttr_q6) AS BIGINT) div count(1) AS BIGINT)"
            ).alias("mean_ttr_q6"),
        )
        .orderBy("grp")
    )


@register(
    "shingle_df_spectrum",
    f"""WITH sh AS ({_SQL_SHINGLES}),
sd AS (SELECT sh, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM sh GROUP BY sh)
SELECT df, CAST(count(*) AS BIGINT) AS n_shingles
FROM sd GROUP BY df ORDER BY df""",
)
def shingle_df_spectrum(spark, sf_dir):
    """Shingle document-frequency spectrum: how many 3-token shingles
    appear in exactly k documents — THE minhash-effectiveness prior
    (if ~every shingle is df=1, no signature can collide and the LSH
    graph is structurally empty regardless of banding; the df≥2 mass
    is the raw material every dedup op mines, and df_spectrum reads
    the same curve for single terms).

    Determinism: exact two-phase distincts.

    Scale shape: one shingle-keyed df agg, a ≤|distinct df|-row
    rollup."""
    sh = _shingles_spark(spark, sf_dir)
    sd = sh.groupBy("sh").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    return (
        sd.groupBy("df")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"))
        .orderBy("df")
    )


@register(
    "lang_census",
    f"""WITH t AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(sum(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))), 0)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td FROM t)
SELECT t.lang, t.n_docs, t.n_tokens,
       CAST((1000000 * t.n_docs) // tot.td AS BIGINT) AS doc_share_q6
FROM t CROSS JOIN tot ORDER BY t.lang""",
)
def lang_census(spark, sf_dir):
    """The foundational language census: docs, tokens and doc share per
    declared lang label — the denominator table the whole language
    family normalises by (confusion matrix, drift deciles, per-lang
    doclen tests all divide by exactly these counts; this op makes
    them first-class the way event_type_census did for events).

    Scale shape: one lang agg with a map-side token counter, a 1-row
    total broadcast."""
    t = _docs(spark, sf_dir).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum(F.size(spark_tokens("text"))), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    tot = t.agg(F.sum("n_docs").cast("long").alias("td"))
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.expr("CAST((1000000 * n_docs) div td AS BIGINT)").alias(
                "doc_share_q6"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# session 124 — ANN-graph components, supplier×brand matrix, balance/order
# correlation
# ---------------------------------------------------------------------------


def _ann_components_sql() -> str:
    """Generated oracle: the pagerank edge chain nested as ONE
    materialized CTE (the WITH RECURSIVE must sit on the OUTER with —
    the prelude's own WITH isn't recursive), then the standard
    reach-closure component labeling and a census."""
    inner = _KMEANS_SQL_PRELUDE + _PR_EDGE_SQL + "\nSELECT src, dst FROM edges"
    return f"""WITH RECURSIVE eg AS MATERIALIZED ({inner}),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM embeddings
       WHERE vec_id <> 0),
und AS (SELECT src, dst FROM eg UNION SELECT dst, src FROM eg),
reach(id, lbl) AS (
  SELECT src, src FROM und
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN und e ON e.src = r.id),
comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
          FROM comp GROUP BY cluster_id),
cen AS (SELECT CAST(count(*) AS BIGINT) AS n_components,
               CAST(max(sz) AS BIGINT) AS largest_component,
               CAST(sum(sz) AS BIGINT) AS n_in_graph
        FROM sizes)
SELECT nn.n_nodes, cen.n_in_graph, cen.n_components, cen.largest_component,
       CAST(nn.n_nodes - cen.n_in_graph AS BIGINT) AS n_singletons
FROM nn CROSS JOIN cen"""


@register("ann_graph_components", _ann_components_sql())
def ann_graph_components(spark, sf_dir):
    """Connected components of the symmetrized approximate-kNN graph
    (the same cell-blocked top-3 edge set pagerank_ann_graph walks):
    component count, the giant component's size, and the vectors no
    edge reaches — the cluster-structure census of the embedding space
    (one giant component = a connected manifold, many components =
    genuine islands an IVF should align with; singletons are the
    unreachable outliers embedding_norm_outliers flags for different
    reasons). Pointer-doubled CC bounds the rounds (the
    ConvergenceError contract).

    Determinism: the quantized-cosine edge set is engine-identical;
    counts exact.

    Scale shape: edges come from the memoized `_ann_knn_edges` table
    (the batch-ANN join, never all-pairs); CC is the O(log diameter)
    label propagation; censuses are tiny."""
    members, cent, final_assign = _trained_ivf(spark, sf_dir)
    dedges = _ann_knn_edges(spark, sf_dir)
    und = dedges.unionByName(
        dedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        und.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    comp = connected_components(labels, und).select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    cen = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.max("sz").cast("long").alias("largest_component"),
        F.sum("sz").cast("long").alias("n_in_graph"),
    )
    nn = members.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return nn.crossJoin(F.broadcast(cen)).select(
        "n_nodes",
        "n_in_graph",
        "n_components",
        "largest_component",
        (F.col("n_nodes") - F.col("n_in_graph"))
        .cast("long")
        .alias("n_singletons"),
    )


@register(
    "supplier_brand_matrix",
    """WITH j AS (
  SELECT l.l_suppkey, p.p_brand, CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
c AS (SELECT l_suppkey, p_brand, CAST(count(*) AS BIGINT) AS n_lineitems,
             CAST(sum(qty) AS BIGINT) AS total_qty
      FROM j GROUP BY l_suppkey, p_brand),
rk AS (SELECT l_suppkey, p_brand, n_lineitems, total_qty,
              row_number() OVER (ORDER BY total_qty DESC, l_suppkey ASC,
                                 p_brand ASC) AS rank
       FROM c)
SELECT l_suppkey, p_brand, CAST(rank AS BIGINT) AS rank, n_lineitems,
       total_qty
FROM rk WHERE rank <= 15 ORDER BY rank""",
)
def supplier_brand_matrix(spark, sf_dir):
    """Supply-chain concentration cells: the 15 heaviest
    (supplier, brand) lanes by shipped quantity — who actually moves
    each brand's volume (part_supplier_hhi scores concentration per
    PART; this names the supplier-brand relationships procurement
    negotiates, and a single lane dominating a brand is the
    single-point-of-failure slide).

    Determinism: exact quantities; rank by (qty desc, lex pair).

    Scale shape: the partkey join is un-hinted; one
    (supplier, brand)-cell agg, TakeOrdered 15."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey",
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    c = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("qty").cast("long").alias("total_qty"),
        )
    )
    rk = (
        c.withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc("total_qty"), F.asc("l_suppkey"), F.asc("p_brand")
                )
            )
            .cast("long"),
        )
        .where(F.col("rank") <= 15)
    )
    return rk.select(
        "l_suppkey", "p_brand", "rank", "n_lineitems", "total_qty"
    ).orderBy("rank")


@register(
    "balance_order_corr",
    f"""WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders
  GROUP BY o_custkey),
j AS (SELECT CAST(round(100 * c.c_acctbal) AS BIGINT) // 100 AS x,
             CAST(COALESCE(oc.n_orders, 0) AS BIGINT) AS y
      FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM j),
mi AS (SELECT n,
              CASE WHEN sx < 0 THEN -((-sx) // greatest(n, 1))
                   ELSE sx // greatest(n, 1) END AS mx,
              sy // greatest(n, 1) AS my
       FROM m),
cs AS (SELECT mi.n AS n,
              CAST(sum(j.x - mi.mx) AS BIGINT) AS sxc,
              CAST(sum(j.y - mi.my) AS BIGINT) AS syc,
              CAST(sum((j.x - mi.mx) * (j.x - mi.mx)) AS BIGINT) AS sxx,
              CAST(sum((j.y - mi.my) * (j.y - mi.my)) AS BIGINT) AS syy,
              CAST(sum((j.x - mi.mx) * (j.y - mi.my)) AS BIGINT) AS sxy
       FROM j CROSS JOIN mi GROUP BY mi.n)
SELECT n AS n_customers, {_SP_RHO2S} AS corr2s_q6 FROM cs""",
)
def balance_order_corr(spark, sf_dir):
    """Does money order: signed squared correlation between a
    customer's account balance (whole dollars) and their order count —
    zero-order customers INCLUDED via the LEFT probe (dropping them is
    the classic survivorship mistake; Q22 builds a strategy on exactly
    the rich-and-idle quadrant this correlation would hide). Balance
    can be negative, so the integer mean uses the explicit
    trunc-toward-zero form both engines share.

    Determinism: centered-BIGINT machinery, signed-r² output (the
    spearman rule).

    Scale shape: one custkey agg, a LEFT probe on custkey, 1-row
    censuses."""
    oc = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        F.expr("CAST(round(100 * c_acctbal) AS BIGINT) div 100").alias("x"),
    )
    j = c.join(oc, c["c_custkey"] == oc["o_custkey"], "left").select(
        "x", F.coalesce("n_orders", F.lit(0)).cast("long").alias("y")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    mi = m.select(
        "n",
        F.expr(
            "CASE WHEN sx < 0 THEN -((-sx) div greatest(n, 1))"
            " ELSE sx div greatest(n, 1) END"
        ).alias("mx"),
        F.expr("sy div greatest(n, 1)").alias("my"),
    )
    cs = (
        j.crossJoin(F.broadcast(mi))
        .groupBy("n")
        .agg(
            F.sum(F.col("x") - F.col("mx")).cast("long").alias("sxc"),
            F.sum(F.col("y") - F.col("my")).cast("long").alias("syc"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
            .cast("long")
            .alias("sxx"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .cast("long")
            .alias("syy"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            .cast("long")
            .alias("sxy"),
        )
    )
    return cs.select(
        F.col("n").alias("n_customers"), F.expr(_SP_RHO2S).alias("corr2s_q6")
    )


# ---------------------------------------------------------------------------
# session 125 — part-name vocabulary, per-type peak hour, kNN two-hop reach
# ---------------------------------------------------------------------------


@register(
    "part_name_term_census",
    f"""WITH t AS (
  SELECT p_partkey, unnest(regexp_extract_all(lower(p_name), '{TOKEN_PATTERN}'))
    AS term
  FROM part),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS n_parts FROM t GROUP BY term),
tot AS (SELECT CAST(count(*) AS BIGINT) AS np FROM part)
SELECT c.term, c.n_parts,
       CAST((1000000 * c.n_parts) // tot.np AS BIGINT) AS share_q6
FROM c CROSS JOIN tot ORDER BY c.n_parts DESC, c.term ASC""",
)
def part_name_term_census(spark, sf_dir):
    """Vocabulary census of the part-name field — the engine's shared
    tokenizer pointed at a SECOND text column (catalog search indexes
    p_name-style fields with exactly this analyzer; the census is its
    dictionary, and a term on 40% of parts is a stopword for catalog
    queries the way 'the' is for documents). Share is per PART, so a
    term repeating inside one name still counts each occurrence — the
    raw token view.

    Determinism: the shared TOKEN_PATTERN both engines; exact counts.

    Scale shape: map-side tokenize over the dimension table, one
    vocab-bounded agg."""
    t = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.explode(spark_tokens("p_name")).alias("term")
    )
    c = t.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    tot = spark.read.parquet(f"{sf_dir}/part.parquet").agg(
        F.count(F.lit(1)).cast("long").alias("np")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "term",
            "n_parts",
            F.expr("CAST((1000000 * n_parts) div np AS BIGINT)").alias(
                "share_q6"
            ),
        )
        .orderBy(F.desc("n_parts"), F.asc("term"))
    )


@register(
    "type_peak_hour",
    """WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour),
m AS (SELECT event_type, CAST(max(n) AS BIGINT) AS peak_n,
             CAST(sum(n) AS BIGINT) AS total_n
      FROM c GROUP BY event_type)
SELECT m.event_type, CAST(min(c.hour) AS BIGINT) AS peak_hour, m.peak_n,
       CAST((1000000 * m.peak_n) // m.total_n AS BIGINT) AS peak_share_q6
FROM m JOIN c ON c.event_type = m.event_type AND c.n = m.peak_n
GROUP BY m.event_type, m.peak_n, m.total_n
ORDER BY m.event_type""",
)
def type_peak_hour(spark, sf_dir):
    """Peak hour per event type: when each behavior peaks and how
    concentrated the peak is — the per-type slice of the hour×weekday
    grid (purchases peaking at a different hour than views is the
    browse-at-lunch/buy-at-night pattern send-time optimisation
    exploits). Argmax via the Q2 max-join-back + min-hour tiebreak.

    Determinism: exact counts; ties take the earliest hour.

    Scale shape: one ≤|types|×24-cell agg; the argmax join runs on
    those cells."""
    c = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.expr(
                "(unix_micros(cast(ts as timestamp)) div 3600000000) % 24"
            ).alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # maxima + join-back both consume it
    )
    m = c.groupBy("event_type").agg(
        F.max("n").cast("long").alias("peak_n"),
        F.sum("n").cast("long").alias("total_n"),
    ).withColumnRenamed("event_type", "et")
    j = c.join(
        m, (c["event_type"] == m["et"]) & (c["n"] == m["peak_n"])
    ).select("et", "hour", "peak_n", "total_n")
    return (
        j.groupBy("et", "peak_n", "total_n")
        .agg(F.min("hour").cast("long").alias("peak_hour"))
        .select(
            F.col("et").alias("event_type"),
            "peak_hour",
            "peak_n",
            F.expr(
                "CAST((1000000 * peak_n) div total_n AS BIGINT)"
            ).alias("peak_share_q6"),
        )
        .orderBy("event_type")
    )


def _ann_twohop_sql() -> str:
    inner = _KMEANS_SQL_PRELUDE + _PR_EDGE_SQL + "\nSELECT src, dst FROM edges"
    return f"""WITH eg AS MATERIALIZED ({inner}),
und AS MATERIALIZED (SELECT src, dst FROM eg UNION SELECT dst, src FROM eg),
hop2 AS (
  SELECT a.src, b.dst FROM und a JOIN und b ON b.src = a.dst
  WHERE b.dst <> a.src
  UNION
  SELECT src, dst FROM und),
rc AS (SELECT src, CAST(count(*) AS BIGINT) AS reach FROM hop2 GROUP BY src),
bk AS (SELECT CAST(length(bin(reach)) - 1 AS BIGINT) AS bucket FROM rc)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_nodes
FROM bk GROUP BY bucket ORDER BY bucket"""


@register("ann_two_hop_histogram", _ann_twohop_sql())
def ann_two_hop_histogram(spark, sf_dir):
    """Two-hop reach histogram of the symmetrized kNN graph: per node,
    the distinct vectors within two hops (log2 bands) — the graph
    EXPANSION rate (diffusion-based ANN search and graph-based index
    builds like HNSW live or die on this number: reach growing ~deg²
    means the graph mixes and greedy routing works; flat reach means
    disconnected clumps, matching ann_graph_components' islands).

    Determinism: the quantized-cosine edge set; exact distinct reach
    counts (UNION dedups the hop-1/hop-2 overlap).

    Scale shape: hop-1 edges come from the memoized `_ann_knn_edges`
    table; the 2-hop join fans out ≤deg² per node (deg ≤ 6 after
    symmetrizing top-3) and dedups on the (src, dst) pair key; rollups
    are ≤|bands| rows."""
    dedges = _ann_knn_edges(spark, sf_dir)
    und = (
        dedges.unionByName(
            dedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()  # hop-1 + both hop-2 sides consume it
    )
    a = und.select(F.col("src"), F.col("dst").alias("mid"))
    b = und.select(F.col("src").alias("mid"), F.col("dst"))
    hop2 = (
        a.join(b, "mid")
        .where(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .unionByName(und.select("src", "dst"))
        .distinct()
    )
    rc = hop2.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("reach"))
    bk = rc.select(
        F.expr("CAST(length(bin(reach)) - 1 AS BIGINT)").alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 126 — user span histogram, discount drift, lang top source
# ---------------------------------------------------------------------------


@register(
    "user_span_histogram",
    f"""WITH u AS (
  SELECT user_id,
         CAST(max(epoch_us(ts) // {_US_PER_DAY})
              - min(epoch_us(ts) // {_US_PER_DAY}) AS BIGINT) AS span_days
  FROM events GROUP BY user_id),
bk AS (SELECT CASE WHEN span_days = 0 THEN -1
              ELSE CAST(length(bin(span_days)) - 1 AS BIGINT) END AS bucket
       FROM u)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_users
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def user_span_histogram(spark, sf_dir):
    """User lifetime-span histogram: days between each user's first and
    last event, log2-banded (bucket −1 = one-day wonders) — the raw
    longevity distribution user_regularity_histogram normalises away
    (regularity says how DENSELY the span is used; this says how long
    the spans even are, and the one-day-wonder share is the top-of-
    funnel leak).

    Scale shape: one user min/max agg, a ≤~16-bucket rollup."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            (
                F.max(
                    F.expr(
                        f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}"
                    )
                )
                - F.min(
                    F.expr(
                        f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}"
                    )
                )
            )
            .cast("long")
            .alias("span_days")
        )
    )
    bk = u.select(
        F.expr(
            "CASE WHEN span_days = 0 THEN -1"
            " ELSE CAST(length(bin(span_days)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("bucket")
    )


@register(
    "discount_rate_by_month",
    """WITH l AS (
  SELECT (year(CAST(l_shipdate AS TIMESTAMP)) * 12
          + month(CAST(l_shipdate AS TIMESTAMP)) - 1) AS mkey,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_pp
  FROM lineitem)
SELECT CAST(mkey AS BIGINT) AS month_key, CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(round(1000000 * (CAST(sum(disc_pp) AS DOUBLE) / count(*)))
            AS BIGINT) AS mean_disc_pp_q6
FROM l GROUP BY mkey ORDER BY month_key""",
)
def discount_rate_by_month(spark, sf_dir):
    """Discount-policy drift: mean discount (percent points) per ship
    month — discount_by_quantity_band shows the SCHEDULE, this shows
    whether the schedule holds over time (a creeping monthly mean is
    margin erosion nobody approved; a step is a policy change to date-
    stamp).

    Scale shape: map-side month/percent math, a ≤|months| agg."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr(
            "(year(CAST(l_shipdate AS TIMESTAMP)) * 12"
            " + month(CAST(l_shipdate AS TIMESTAMP)) - 1)"
        ).alias("mkey"),
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("disc_pp"),
    )
    return (
        li.groupBy("mkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(disc_pp) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_disc_pp_q6"),
        )
        .select(
            F.col("mkey").cast("long").alias("month_key"),
            "n_lineitems",
            "mean_disc_pp_q6",
        )
        .orderBy("month_key")
    )


@register(
    "lang_top_source",
    """WITH c AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source),
m AS (SELECT lang, CAST(max(n) AS BIGINT) AS top_n, CAST(sum(n) AS BIGINT) AS tot
      FROM c GROUP BY lang)
SELECT m.lang, min(c.source) AS top_source, m.top_n,
       CAST((1000000 * m.top_n) // m.tot AS BIGINT) AS top_share_q6
FROM m JOIN c ON c.lang = m.lang AND c.n = m.top_n
GROUP BY m.lang, m.top_n, m.tot ORDER BY m.lang""",
)
def lang_top_source(spark, sf_dir):
    """Dominant source per language: which source supplies most of each
    lang's documents and its share — the provenance-concentration view
    of the lang×source grid (a language fed 90% by one source inherits
    that source's biases wholesale; source_lang_chi2 scores the
    dependence, this names it). Argmax via the Q2 max-join-back with
    the lexicographic source tiebreak.

    Scale shape: one (lang, source) agg; the argmax join runs on those
    cells."""
    c = (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # maxima + join-back both consume it
    )
    m = c.groupBy("lang").agg(
        F.max("n").cast("long").alias("top_n"),
        F.sum("n").cast("long").alias("tot"),
    ).withColumnRenamed("lang", "lg")
    j = c.join(m, (c["lang"] == m["lg"]) & (c["n"] == m["top_n"])).select(
        "lg", "source", "top_n", "tot"
    )
    return (
        j.groupBy("lg", "top_n", "tot")
        .agg(F.min("source").alias("top_source"))
        .select(
            F.col("lg").alias("lang"),
            "top_source",
            "top_n",
            F.expr("CAST((1000000 * top_n) div tot AS BIGINT)").alias(
                "top_share_q6"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# session 127 — A/B value readout, hapax token share, user CTR histogram
# ---------------------------------------------------------------------------


@register(
    "ab_value_readout",
    """WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 4))::INT % 2
           AS arm,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id)
SELECT CAST(arm AS BIGINT) AS arm, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(round(1000000 * (CAST(sum(cents) AS DOUBLE) / count(*))) AS BIGINT)
         AS mean_cents_q6
FROM u GROUP BY arm ORDER BY arm""",
)
def ab_value_readout(spark, sf_dir):
    """A/B VALUE readout: per md5 arm, users, total and mean per-user
    value — the revenue leg of the experimentation family
    (ab_assignment_readout/ab_significance score the conversion RATE;
    most experiments are decided on value per user, whose heavy tail is
    exactly why CUPED and winsorization exist — this is the raw number
    they adjust). Same 'ab:'||user hash arms as every A/B op.

    Scale shape: one user agg with the arm hash, a 2-row rollup."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
        .select(
            F.expr(
                "cast(conv(substring(md5(concat('ab:', cast(user_id as string))),"
                " 1, 4), 16, 10) as int) % 2"
            ).alias("arm"),
            "cents",
        )
    )
    return (
        u.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(cents) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_cents_q6"),
        )
        .select(
            F.col("arm").cast("long").alias("arm"),
            "n_users",
            "total_cents",
            "mean_cents_q6",
        )
        .orderBy("arm")
    )


@register(
    "hapax_token_share",
    f"""WITH t AS (
  SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
    AS term
  FROM documents),
dfs AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM t GROUP BY term),
j AS (SELECT t.source, CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END AS is_hapax
      FROM t JOIN dfs USING (term))
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sum(is_hapax), 0) AS BIGINT) AS n_hapax_tokens,
       CAST((1000000 * COALESCE(sum(is_hapax), 0)) // count(*) AS BIGINT)
         AS hapax_share_q6
FROM j GROUP BY source ORDER BY source""",
)
def hapax_token_share(spark, sf_dir):
    """Token mass carried by corpus-hapax terms (df = 1), per source —
    the tail-weight gauge from the TOKEN side (df_spectrum counts
    hapax TYPES; this weighs them by occurrences, which is what the
    tokenizer/BPE budget actually pays; a source whose token stream is
    5% hapax mass is typo/id-heavy and mindf_prune_curve's cut bites
    it hardest).

    Scale shape: one tokenize, a term-keyed df agg joined back on term
    (vocab-bounded exchange), a ≤|sources| rollup."""
    t = (
        _docs(spark, sf_dir)
        .select(
            "doc_id", "source", F.explode(spark_tokens("text")).alias("term")
        )
        .localCheckpoint()  # df agg + join-back both consume it
    )
    dfs = t.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    j = t.join(dfs, "term").select(
        "source", F.when(F.col("df") == 1, 1).otherwise(0).alias("is_hapax")
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.coalesce(F.sum("is_hapax"), F.lit(0))
            .cast("long")
            .alias("n_hapax_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "n_hapax_tokens",
            F.expr(
                "CAST((1000000 * n_hapax_tokens) div n_tokens AS BIGINT)"
            ).alias("hapax_share_q6"),
        )
        .orderBy("source")
    )


@register(
    "user_ctr_histogram",
    """WITH u AS (
  SELECT user_id,
         CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS views,
         CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS clicks
  FROM events GROUP BY user_id),
v AS (SELECT least((1000000 * clicks) // views // 200000, 5) AS bucket
      FROM u WHERE views > 0)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_users
FROM v GROUP BY bucket ORDER BY bucket""",
)
def user_ctr_histogram(spark, sf_dir):
    """Per-user click-through-rate distribution: clicks/views in
    0.2-wide buckets (clamped at 1.0+, since clicks can exceed views)
    — the behavioral heterogeneity underneath daily_ctr's single line
    (a bimodal user CTR means two populations — browsers and clickers
    — and the aggregate CTR moves when their MIX moves, not their
    behavior; viewless users drop, declared).

    Scale shape: one user agg with two conditional counters, a
    6-bucket rollup."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("views"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("clicks"),
        )
    )
    v = u.where(F.col("views") > 0).select(
        F.expr("least((1000000 * clicks) div views div 200000, 5)").alias(
            "bucket"
        )
    )
    return (
        v.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("bucket").cast("long").alias("bucket"), "n_users")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 128 — hour top type, per-lang length stats, source arrival matrix
# ---------------------------------------------------------------------------


@register(
    "hour_top_type",
    """WITH c AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY hour, event_type),
m AS (SELECT hour, CAST(max(n) AS BIGINT) AS top_n, CAST(sum(n) AS BIGINT) AS tot
      FROM c GROUP BY hour)
SELECT CAST(m.hour AS BIGINT) AS hour, min(c.event_type) AS top_type,
       m.top_n, CAST((1000000 * m.top_n) // m.tot AS BIGINT) AS top_share_q6
FROM m JOIN c ON c.hour = m.hour AND c.n = m.top_n
GROUP BY m.hour, m.top_n, m.tot ORDER BY m.hour""",
)
def hour_top_type(spark, sf_dir):
    """Dominant event type per hour of day — type_peak_hour transposed
    (that op asks when each behavior peaks; this asks what each hour IS
    — the hour-by-hour character of the stream that staffing and
    cache-warming schedules read). Q2 argmax with the lexicographic
    type tiebreak.

    Scale shape: one ≤24×|types|-cell agg and its argmax join."""
    c = (
        _events(spark, sf_dir)
        .groupBy(
            F.expr(
                "(unix_micros(cast(ts as timestamp)) div 3600000000) % 24"
            ).alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    m = c.groupBy("hour").agg(
        F.max("n").cast("long").alias("top_n"),
        F.sum("n").cast("long").alias("tot"),
    ).withColumnRenamed("hour", "h")
    j = c.join(m, (c["hour"] == m["h"]) & (c["n"] == m["top_n"])).select(
        "h", "event_type", "top_n", "tot"
    )
    return (
        j.groupBy("h", "top_n", "tot")
        .agg(F.min("event_type").alias("top_type"))
        .select(
            F.col("h").cast("long").alias("hour"),
            "top_type",
            "top_n",
            F.expr("CAST((1000000 * top_n) div tot AS BIGINT)").alias(
                "top_share_q6"
            ),
        )
        .orderBy("hour")
    )


@register(
    "lang_doclen_stats",
    f"""WITH t AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT)
           AS n_tok
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(round(1000000 * (CAST(sum(n_tok) AS DOUBLE) / count(*))) AS BIGINT)
         AS mean_len_q6,
       CAST(min(n_tok) AS BIGINT) AS min_len, CAST(max(n_tok) AS BIGINT) AS max_len
FROM t GROUP BY lang ORDER BY lang""",
)
def lang_doclen_stats(spark, sf_dir):
    """Document-length profile per language label: count, mean, min,
    max — the plain per-lang table underneath ttest_lang_doclen's
    two-sample inference and ks/mannwhitney's distribution tests (all
    three compare PAIRS; this is the full panel a reviewer scans first,
    and cross-lingual length ratios are the token-budget conversion
    rates multilingual sampling plans need).

    Scale shape: one map-side length projection, a ≤|langs| agg."""
    t = _docs(spark, sf_dir).select(
        "lang", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(n_tok) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_len_q6"),
            F.min("n_tok").cast("long").alias("min_len"),
            F.max("n_tok").cast("long").alias("max_len"),
        )
        .orderBy("lang")
    )


@register(
    "source_arrival_matrix",
    """WITH b AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS lo, CAST(max(doc_id) AS BIGINT) AS hi
  FROM documents),
d AS (SELECT dd.source,
             least((10 * (dd.doc_id - b.lo)) // greatest(b.hi - b.lo + 1, 1), 9)
               AS decile
      FROM documents dd CROSS JOIN b)
SELECT CAST(decile AS BIGINT) AS decile, source,
       CAST(count(*) AS BIGINT) AS n_docs
FROM d GROUP BY decile, source ORDER BY decile, source""",
)
def source_arrival_matrix(spark, sf_dir):
    """Source mix by arrival decile (doc_id key range — the drift
    convention): the RAW matrix underneath every per-source drift
    decile op (term/lang/quality drift normalise by exactly these
    counts; a source that only exists in deciles 7-9 was added
    mid-crawl, and every whole-corpus source share mixes epochs —
    order_value_drift_deciles' argument on the text side).

    Scale shape: map-side decile math off the 1-row bounds broadcast,
    a 10×|sources|-cell agg."""
    docs = _docs(spark, sf_dir)
    b = docs.agg(
        F.min("doc_id").cast("long").alias("lo"),
        F.max("doc_id").cast("long").alias("hi"),
    )
    d = docs.crossJoin(F.broadcast(b)).select(
        "source",
        F.expr(
            "least((10 * (doc_id - lo)) div greatest(hi - lo + 1, 1), 9)"
        ).alias("decile"),
    )
    return (
        d.groupBy("decile", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            F.col("decile").cast("long").alias("decile"), "source", "n_docs"
        )
        .orderBy("decile", "source")
    )
