"""driver_queries chunk q13 (original lines 45188-48590): priority_mix_by_year, lang_share_by_len_band, supplier_breadth_histogram, price_ending_census, ... storage_tier_advisor (43 ops).

Linearized continuation of docix_spark.ops.q12 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q12")

@register(
    "priority_mix_by_year",
    """WITH t AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority FROM orders),
c AS (SELECT yr, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      FROM t GROUP BY yr, o_orderpriority),
y AS (SELECT yr, CAST(sum(n_orders) AS BIGINT) AS yr_total FROM c GROUP BY yr)
SELECT c.yr, c.o_orderpriority, c.n_orders,
       CAST((1000000 * c.n_orders) // y.yr_total AS BIGINT) AS share_q6
FROM c JOIN y USING (yr) ORDER BY c.yr, c.o_orderpriority""",
)
def priority_mix_by_year(spark, sf_dir):
    """Urgency drift: the order-priority mix per year with within-year
    shares — a rising URGENT share is either a customer-expectation
    shift or a field being gamed for queue position, and every
    SLA-by-priority readout (ship_lag_by_priority,
    orders_late_shipment_priority) silently assumes this mix is
    stationary; this is the check. Year via year() (the
    orders_month_seasonality convention).

    Scale shape: one (year, priority) map-side agg; the share window
    runs over the ≤years×5 aggregated rows."""
    t = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
        "o_orderpriority",
    )
    c = t.groupBy("yr", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    y = c.groupBy("yr").agg(F.sum("n_orders").cast("long").alias("yr_total"))
    return (
        c.join(y, "yr")
        .select(
            "yr",
            "o_orderpriority",
            "n_orders",
            F.expr(
                "CAST((1000000 * n_orders) div yr_total AS BIGINT)"
            ).alias("share_q6"),
        )
        .orderBy("yr", "o_orderpriority")
    )


@register(
    "lang_share_by_len_band",
    f"""WITH t AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT)
           AS n_tok
  FROM documents),
b AS (SELECT lang,
             CASE WHEN n_tok = 0 THEN -1
                  ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END AS len_band
      FROM t),
c AS (SELECT len_band, lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM b GROUP BY len_band, lang),
tb AS (SELECT len_band, CAST(sum(n_docs) AS BIGINT) AS band_total
       FROM c GROUP BY len_band)
SELECT c.len_band, c.lang, c.n_docs,
       CAST((1000000 * c.n_docs) // tb.band_total AS BIGINT) AS share_q6
FROM c JOIN tb USING (len_band) ORDER BY c.len_band, c.lang""",
)
def lang_share_by_len_band(spark, sf_dir):
    """Language mix as a function of document LENGTH: per log2 token
    band, each language's document share — the interaction every
    per-language token budget silently assumes away (if long docs skew
    toward one language, a doc-count-balanced mix is token-imbalanced,
    and lang_doclen_stats' per-language means are the marginal view of
    exactly this table; band −1 = empty docs). Length-conditional
    language drift is also the classic symptom of a truncating
    extractor that only bites on one script.

    Determinism: integer log2 bands, exact counts, one share division
    per cell.

    Scale shape: one map-side tokenize-count, a (band, lang) agg, and
    a band-total join over the tiny aggregated grid."""
    t = _docs(spark, sf_dir).select(
        "lang", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    b = t.select(
        "lang",
        F.expr(
            "CASE WHEN n_tok = 0 THEN -1"
            " ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END"
        ).alias("len_band"),
    )
    c = b.groupBy("len_band", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tb = c.groupBy("len_band").agg(
        F.sum("n_docs").cast("long").alias("band_total")
    )
    return (
        c.join(tb, "len_band")
        .select(
            F.col("len_band").cast("long").alias("len_band"),
            "lang",
            "n_docs",
            F.expr(
                "CAST((1000000 * n_docs) div band_total AS BIGINT)"
            ).alias("share_q6"),
        )
        .orderBy("len_band", "lang")
    )


# ---------------------------------------------------------------------------
# session 185 — supplier breadth, price endings
# ---------------------------------------------------------------------------


@register(
    "supplier_breadth_histogram",
    """WITH sp AS (
  SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
  FROM lineitem GROUP BY l_suppkey)
SELECT CAST(length(bin(n_parts)) - 1 AS BIGINT) AS breadth_band,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(n_parts) AS BIGINT) AS n_part_links
FROM sp GROUP BY breadth_band ORDER BY breadth_band""",
)
def supplier_breadth_histogram(spark, sf_dir):
    """Supplier assortment breadth: distinct parts each supplier
    actually shipped, log2-banded — the supply-side catalog shape
    (band-0/1 suppliers are single-part specialists whose failure is a
    part outage; the high bands are the generalists a consolidation
    play courts; part_supplier_hhi reads the same relationship from
    the part side, brand_supplier_diversity from the brand side).

    Determinism: exact two-phase distinct counts, integer bands.

    Scale shape: one suppkey agg with a distinct on the partkey
    domain; ≤64-row rollup."""
    sp = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").cast("long").alias("n_parts"))
    )
    return (
        sp.select(
            F.expr("CAST(length(bin(n_parts)) - 1 AS BIGINT)").alias(
                "breadth_band"
            ),
            "n_parts",
        )
        .groupBy("breadth_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("n_parts").cast("long").alias("n_part_links"),
        )
        .orderBy("breadth_band")
    )


@register(
    "price_ending_census",
    """WITH c AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) % 100 AS ending
  FROM part)
SELECT ending, CAST(count(*) AS BIGINT) AS n_parts
FROM c GROUP BY ending ORDER BY n_parts DESC, ending ASC LIMIT 10""",
)
def price_ending_census(spark, sf_dir):
    """Psychological-pricing fingerprint: the top-10 cent endings of
    catalog prices — a .99/.95 spike is human price-setting, a uniform
    spread is a formula or a generator (round_value_bias runs the same
    audit on transaction VALUES; Benford on leading digits; this is
    the trailing-digit leg on the CATALOG, where pricing policy
    actually lives). Cents per row, pure integer modulus.

    Scale shape: one map-side agg over ≤100 ending cells, top-10
    TakeOrdered."""
    c = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT) % 100").alias(
            "ending"
        )
    )
    return (
        c.groupBy("ending")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy(F.desc("n_parts"), F.asc("ending"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# session 186 — error concentration, exact-dup group sizes
# ---------------------------------------------------------------------------


@register(
    "error_user_concentration",
    """WITH e AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'error' GROUP BY user_id),
t AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_errors,
             CAST(count(*) AS BIGINT) AS n_users FROM e),
top1 AS (SELECT CAST(COALESCE(max(n), 0) AS BIGINT) AS top1 FROM e),
top5 AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS top5
         FROM (SELECT n FROM e ORDER BY n DESC, user_id ASC LIMIT 5))
SELECT t.n_errors, t.n_users, top1.top1 AS top1_errors, top5.top5 AS top5_errors,
       CASE WHEN t.n_errors = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * top5.top5) // t.n_errors AS BIGINT)
       END AS top5_share_q6
FROM t, top1, top5""",
)
def error_user_concentration(spark, sf_dir):
    """WHO is producing the errors: total error volume, distinct
    erroring users, and the share carried by the top 5 — a
    concentrated column means a handful of broken clients (block or
    fix them, the fleet is fine); a flat one means the server
    (error_rate_daily says WHEN, load_error_corr says whether load
    causes it, THIS says who — the triage triangle's third corner).

    Determinism: exact counts; top-5 cut by (n desc, user asc).

    Scale shape: one filtered user agg; top-5 is a TakeOrdered over
    the erroring-user table; scalar rollups."""
    e = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    t = e.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_errors"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    top1 = e.agg(F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("top1_errors"))
    top5 = (
        e.orderBy(F.desc("n"), F.asc("user_id"))
        .limit(5)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("top5_errors"))
    )
    return (
        t.crossJoin(top1)
        .crossJoin(top5)
        .select(
            "n_errors",
            "n_users",
            "top1_errors",
            "top5_errors",
            F.expr(
                "CASE WHEN n_errors = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * top5_errors) div n_errors AS BIGINT) END"
            ).alias("top5_share_q6"),
        )
    )


@register(
    "exact_dup_group_histogram",
    """WITH g AS (
  SELECT md5(text) AS hh, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY hh)
SELECT CAST(least(n, 8) AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n) AS BIGINT) AS n_docs
FROM g GROUP BY group_size ORDER BY group_size""",
)
def exact_dup_group_histogram(spark, sf_dir):
    """Exact-duplicate multiplicity: md5(text) group sizes (clipped at
    8+) with document mass per size — size 1 is the unique corpus,
    size 2 the pair duplicates dedup_exact lists, the 8+ bin the
    template explosions (minhash_cluster_stats shows NEAR-dup cluster
    sizes; this is the exact-hash baseline those clusters are measured
    against, and n_docs − n_groups summed over sizes ≥ 2 is precisely
    the doc count dedup deletes).

    Determinism: exact counts, integer clip.

    Scale shape: the dedup_exact md5 shuffle then an ≤8-row rollup."""
    g = (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("hh"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        g.select(F.expr("CAST(least(n, 8) AS BIGINT)").alias("group_size"), "n")
        .groupBy("group_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("n").cast("long").alias("n_docs"),
        )
        .orderBy("group_size")
    )


# ---------------------------------------------------------------------------
# session 187 — first-purchase calendar, SERP dup collapse
# ---------------------------------------------------------------------------


@register(
    "first_purchase_dow_profile",
    f"""WITH p AS (
  SELECT user_id, min(epoch_us(ts)) AS us
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
d AS (SELECT CAST((us // {_US_PER_DAY} + 3) % 7 AS BIGINT) AS dow FROM p),
spine AS (SELECT unnest(generate_series(0, 6)) AS dow)
SELECT CAST(spine.dow AS BIGINT) AS dow,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_first_purchases
FROM spine LEFT JOIN (SELECT dow, count(*) AS n FROM d GROUP BY dow) c
  ON c.dow = spine.dow
ORDER BY dow""",
)
def first_purchase_dow_profile(spark, sf_dir):
    """The conversion calendar: which weekday each user's FIRST-ever
    purchase lands on (0 = Monday, zero-filled spine) —
    purchase_share_by_weekday profiles ALL purchases, but acquisition
    campaigns pay for the first one, and a first-purchase spike on a
    different day than the steady-state purchase day is the signature
    of promo-driven acquisition (the cohort every LTV curve should be
    segmented by before averaging).

    Determinism: per-user min epoch, integer dow.

    Scale shape: one filtered user-keyed min agg; 7-row spine."""
    p = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.expr("unix_micros(cast(ts as timestamp))")).alias("us"))
    )
    d = p.select(
        F.expr(f"CAST((us div {_US_PER_DAY} + 3) % 7 AS BIGINT)").alias("dow")
    )
    c = d.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("n"))
    spine = spark.range(7).select(F.col("id").cast("long").alias("dow"))
    return (
        spine.join(c, "dow", "left")
        .select(
            "dow",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_first_purchases"),
        )
        .orderBy("dow")
    )


@register(
    "serp_dup_collapse",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
page AS (SELECT doc_id,
                row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk
         FROM agg WHERE doc_id <> 0
         ORDER BY score_q6 DESC, doc_id ASC LIMIT 20),
h AS (SELECT page.rnk, md5(d.text) AS hh
      FROM page JOIN documents d ON d.doc_id = page.doc_id),
k AS (SELECT rnk, row_number() OVER (PARTITION BY hh ORDER BY rnk) AS occ
      FROM h)
SELECT CAST(count(*) AS BIGINT) AS n_page,
       CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collapsed
FROM k""",
)
def serp_dup_collapse(spark, sf_dir):
    """How many page slots exact duplicates waste: the BM25 top-20 with
    positions whose TEXT is byte-identical to a higher-ranked hit —
    the SERP-dedup pass every production engine runs after scoring
    (identical docs score identically, so un-deduplicated corpora
    surface them adjacent; mmr_rerank diversifies by topic, THIS
    counts the cruder exact-copy waste that should be collapsed before
    diversity even gets a say; search_collapse does it by a metadata
    key, this by content hash).

    Determinism: the quantized-score page with doc_id tiebreaks;
    first-occurrence rank per md5 group.

    Scale shape: the match-set window + a 20-row metadata/hash join;
    the dedup window runs on the page."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS).where(F.col("doc_id") != 0)
    page = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))),
        )
        .select("doc_id", "rnk")
    )
    h = page.join(
        _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("hh")),
        "doc_id",
    )
    k = h.withColumn(
        "occ", F.row_number().over(Window.partitionBy("hh").orderBy("rnk"))
    )
    return k.agg(
        F.count(F.lit(1)).cast("long").alias("n_page"),
        F.sum(F.expr("CASE WHEN occ = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_unique"),
        F.sum(F.expr("CASE WHEN occ > 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_collapsed"),
    )


# ---------------------------------------------------------------------------
# session 188 — line-position value, user weekend mix
# ---------------------------------------------------------------------------


@register(
    "linenumber_value_profile",
    f"""SELECT CAST(l_linenumber AS BIGINT) AS linenumber,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({_LI_DISC_C}) AS BIGINT) AS value_c,
       CAST((1000000 * sum({_LI_DISC_C})) // count(*) AS BIGINT)
         AS mean_value_q6
FROM lineitem GROUP BY l_linenumber ORDER BY linenumber""",
)
def linenumber_value_profile(spark, sf_dir):
    """Value by position WITHIN the order: items and discounted cents
    per line number — if line 1 systematically carries the big-ticket
    item (the anchor purchase) and later lines the add-ons, basket
    analyses that sample 'one item per order' are value-biased by
    construction, and the add-on attach economics live entirely in the
    tail positions (linenumber_spectrum counts positions; this prices
    them). Mean in q6 cents per item.

    Determinism: cents per row (the shared `_LI_DISC_C` string), one
    division per position row.

    Scale shape: one map-side agg into ≤7 rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_linenumber").cast("long").alias("linenumber"),
        F.expr(_LI_DISC_C).alias("disc_c"),
    )
    return (
        li.groupBy("linenumber")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("disc_c").cast("long").alias("value_c"),
        )
        .select(
            "linenumber",
            "n_items",
            "value_c",
            F.expr(
                "CAST((1000000 * value_c) div n_items AS BIGINT)"
            ).alias("mean_value_q6"),
        )
        .orderBy("linenumber")
    )


@register(
    "user_weekend_share_histogram",
    f"""WITH e AS (
  SELECT user_id,
         CASE WHEN (epoch_us(ts) // {_US_PER_DAY} + 3) % 7 >= 5 THEN 1 ELSE 0 END
           AS we
  FROM events),
u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(we) AS BIGINT) AS n_we
      FROM e GROUP BY user_id),
d AS (SELECT CAST(least((10 * n_we) // n, 9) AS BIGINT) AS weekend_decile
      FROM u WHERE n >= 5)
SELECT weekend_decile, CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY weekend_decile ORDER BY weekend_decile""",
)
def user_weekend_share_histogram(spark, sf_dir):
    """Behavioral calendar segmentation: each active user's (≥5
    events) share of activity falling on weekends, deciled — the
    weekday-worker vs weekend-shopper split as a DISTRIBUTION
    (weekend_activity_share gives the corpus-level contrast per type;
    a bimodal histogram HERE means two populations that every
    send-time and staffing decision should treat separately, and a
    unimodal one means 'weekend users' is a fiction of averaging).
    The (day+3)%7 ≥ 5 weekend rule.

    Determinism: integer conditional counts; decile = (10·k) div n
    clamped (the typicality rule); the n ≥ 5 floor keeps tiny
    denominators from manufacturing fake deciles.

    Scale shape: one user-keyed agg; 10-row rollup."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(
            f"CASE WHEN (unix_micros(cast(ts as timestamp)) div {_US_PER_DAY} + 3) % 7 >= 5"
            " THEN 1 ELSE 0 END"
        ).alias("we"),
    )
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("we").cast("long").alias("n_we"),
    )
    d = u.where(F.col("n") >= 5).select(
        F.expr("CAST(least((10 * n_we) div n, 9) AS BIGINT)").alias(
            "weekend_decile"
        )
    )
    return (
        d.groupBy("weekend_decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("weekend_decile")
    )


# ---------------------------------------------------------------------------
# session 189 — per-second bursts, SKU repurchase
# ---------------------------------------------------------------------------


@register(
    "per_second_burst_histogram",
    """WITH s AS (
  SELECT epoch_us(ts) // 1000000 AS sec,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY sec)
SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS burst_band,
       CAST(count(*) AS BIGINT) AS n_seconds,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n_users) AS BIGINT) AS max_distinct_users
FROM s GROUP BY burst_band ORDER BY burst_band""",
)
def per_second_burst_histogram(spark, sf_dir):
    """Sub-second burst census: events per OCCUPIED second, log2-banded,
    with the max distinct users seen in any second of each band — the
    batch-write/bot sniff at the grain ts_granularity_census's
    alignment check can't reach (a fat high band made of ONE user is a
    runaway client; the same band with many users is a load spike or a
    loader stamping a batch with one clock — compare with the
    watermark curve before trusting event time). Occupied seconds
    only.

    Determinism: integer second buckets, exact counts.

    Scale shape: one second-keyed agg (map-side partials, two-phase
    distinct) then a ≤64-row band rollup."""
    s = _events(spark, sf_dir).groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("sec")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return (
        s.select(
            F.expr("CAST(length(bin(n)) - 1 AS BIGINT)").alias("burst_band"),
            "n",
            "n_users",
        )
        .groupBy("burst_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seconds"),
            F.sum("n").cast("long").alias("n_events"),
            F.max("n_users").cast("long").alias("max_distinct_users"),
        )
        .orderBy("burst_band")
    )


@register(
    "part_repurchase_rate",
    """WITH cp AS (
  SELECT o.o_custkey, l.l_partkey, CAST(count(*) AS BIGINT) AS n
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, l.l_partkey)
SELECT CAST(count(*) AS BIGINT) AS n_cust_part_pairs,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repurchased,
       CAST((1000000 * sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS repurchase_q6,
       CAST(max(n) AS BIGINT) AS max_repeats
FROM cp""",
)
def part_repurchase_rate(spark, sf_dir):
    """SKU-level loyalty: of all (customer, part) relationships, the
    share bought MORE than once — the replenishment signal
    (user_purchase_histogram counts purchases per user,
    brand_loyalty_histogram concentration per brand; THIS is the part
    grain where subscription/reorder products reveal themselves, and
    max_repeats names the heaviest repeat relationship). TPC-H draws
    parts independently, so a near-zero rate is the honest synthetic
    reading — a real retailer sees consumables dominate.

    Determinism: exact integer counts, one division.

    Scale shape: the orderkey fact join then a (customer, part) agg
    (map-side partials); one scalar rollup."""
    cp = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey", "l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return cp.agg(
        F.count(F.lit(1)).cast("long").alias("n_cust_part_pairs"),
        F.sum(F.expr("CASE WHEN n >= 2 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_repurchased"),
        F.max("n").cast("long").alias("max_repeats"),
    ).select(
        "n_cust_part_pairs",
        "n_repurchased",
        F.expr(
            "CAST((1000000 * n_repurchased) div n_cust_part_pairs AS BIGINT)"
        ).alias("repurchase_q6"),
        "max_repeats",
    )


# ---------------------------------------------------------------------------
# session 190 — onboarding depth vs return, brand price ranges
# ---------------------------------------------------------------------------


@register(
    "onboarding_depth_return_rate",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
f AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t0 FROM e GROUP BY user_id),
fs AS (
  SELECT e.user_id,
         CAST(sum(CASE WHEN e.us < f.t0 + {_MCS_GAP_US}
                        AND e.us >= f.t0 THEN 1 ELSE 0 END) AS BIGINT) AS depth,
         CAST(max(CASE WHEN e.us // {_US_PER_DAY} > f.t0 // {_US_PER_DAY}
                  THEN 1 ELSE 0 END) AS BIGINT) AS returned
  FROM e JOIN f ON f.user_id = e.user_id
  GROUP BY e.user_id),
b AS (SELECT CAST(least(length(bin(depth)) - 1, 4) AS BIGINT) AS depth_band,
             returned
      FROM fs WHERE depth > 0)
SELECT depth_band, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(returned) AS BIGINT) AS n_returned,
       CAST((1000000 * sum(returned)) // count(*) AS BIGINT) AS return_q6
FROM b GROUP BY depth_band ORDER BY depth_band""",
)
def onboarding_depth_return_rate(spark, sf_dir):
    """Does a deeper first visit predict coming back? Each user's event
    count inside the FIRST 30 minutes after their first event (the
    session gap window anchored at t0), log2-banded (clipped at 16+),
    against whether they were EVER active on a later calendar day —
    the onboarding-quality curve (session_depth_conversion scores
    depth against in-session purchase; this scores it against
    RETENTION, the number an activation team actually optimizes: if
    the curve is flat, first-visit depth is vanity).

    Determinism: integer µs window and day comparisons; one exchange
    computes both the depth counter and the return flag.

    Scale shape: a user-keyed min agg broadcast back into one
    user-keyed conditional agg; ≤5-row rollup."""
    e = _events(spark, sf_dir).select(
        "user_id", F.expr("unix_micros(cast(ts as timestamp))").alias("us")
    )
    f = e.groupBy("user_id").agg(F.min("us").cast("long").alias("t0"))
    fs = (
        e.join(f, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN us < t0 + {_MCS_GAP_US} AND us >= t0"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("depth"),
            F.max(
                F.expr(
                    f"CASE WHEN us div {_US_PER_DAY} > t0 div {_US_PER_DAY}"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("returned"),
        )
    )
    b = fs.where(F.col("depth") > 0).select(
        F.expr("CAST(least(length(bin(depth)) - 1, 4) AS BIGINT)").alias(
            "depth_band"
        ),
        "returned",
    )
    return (
        b.groupBy("depth_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("returned").cast("long").alias("n_returned"),
        )
        .select(
            "depth_band",
            "n_users",
            "n_returned",
            F.expr(
                "CAST((1000000 * n_returned) div n_users AS BIGINT)"
            ).alias("return_q6"),
        )
        .orderBy("depth_band")
    )


@register(
    "brand_price_range_topk",
    """WITH b AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
         CAST(min(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS min_c,
         CAST(max(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS max_c
  FROM part GROUP BY p_brand)
SELECT p_brand, n_parts, min_c, max_c,
       CAST(max_c - min_c AS BIGINT) AS range_c
FROM b ORDER BY range_c DESC, p_brand ASC LIMIT 10""",
)
def brand_price_range_topk(spark, sf_dir):
    """Widest price architectures: the 10 brands spanning the largest
    catalog price range — a wide range is a good-better-best ladder
    (or a mislabeled catalog; cross-check catalog_name_collisions),
    a narrow one a single-tier brand, and the distinction decides
    whether 'brand average price' (brand_size_price_trend's inputs)
    means anything. Cents per row, exact integer range.

    Scale shape: one brand agg then a top-10 TakeOrdered."""
    b = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.min(F.expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("min_c"),
            F.max(F.expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("max_c"),
        )
    )
    return (
        b.select(
            "p_brand",
            "n_parts",
            "min_c",
            "max_c",
            (F.col("max_c") - F.col("min_c")).cast("long").alias("range_c"),
        )
        .orderBy(F.desc("range_c"), F.asc("p_brand"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# session 191 — fulfillment month matrix, lifetime entry-exit
# ---------------------------------------------------------------------------


@register(
    "order_ship_month_matrix",
    """WITH j AS (
  SELECT CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT) AS ym_order,
         CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate) AS BIGINT) AS ym_ship
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT ym_order, ym_ship, CAST(count(*) AS BIGINT) AS n_items
FROM j GROUP BY ym_order, ym_ship
ORDER BY ym_order, ym_ship""",
)
def order_ship_month_matrix(spark, sf_dir):
    """The fulfillment cohort triangle: items cross-tabulated by ORDER
    month × SHIP month — the diagonal is same-month fulfillment, each
    step off it a month of carryover, and a column picking up mass
    from many past rows is the backlog-flush month
    (ship_lag_by_month averages this matrix's rows into one number;
    open_lineitems_timeseries integrates it; the matrix itself is what
    an ops review actually scans for the quarter-end push). Month key
    = year·100+month both engines.

    Scale shape: the orderkey fact join then ONE (ym, ym) map-side
    agg; output months²-bounded."""
    j = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.expr(
                "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)"
            ).alias("ym_order"),
            F.expr(
                "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)"
            ).alias("ym_ship"),
        )
    )
    return (
        j.groupBy("ym_order", "ym_ship")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        .orderBy("ym_order", "ym_ship")
    )


@register(
    "lifetime_entry_exit_matrix",
    """WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
rk AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS rf,
         row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rl
  FROM e),
fl AS (
  SELECT f.user_id, f.event_type AS first_type, l.event_type AS last_type
  FROM (SELECT user_id, event_type FROM rk WHERE rf = 1) f
  JOIN (SELECT user_id, event_type FROM rk WHERE rl = 1) l USING (user_id))
SELECT first_type, last_type, CAST(count(*) AS BIGINT) AS n_users
FROM fl GROUP BY first_type, last_type ORDER BY first_type, last_type""",
)
def lifetime_entry_exit_matrix(spark, sf_dir):
    """How relationships BEGIN versus how they (so far) END: each
    user's first-ever and latest-ever event type, cross-tabulated —
    session_entry_exit_matrix at LIFETIME grain (a heavy
    signup→error exit cell is an onboarding cliff; view→purchase
    endings are journeys completing; the diagonal is single-note
    users). Ties at equal timestamps break on event_id via the
    composite argmin/argmax key.

    Determinism: Spark picks both ends map-side as min/max over
    (us, event_id, type) structs; the oracle windows (the
    first_touch_profile convention — DuckDB's min_by/max_by reject
    composite keys, struct AND list).

    Scale shape: one user-keyed map-side argmin/argmax agg; ≤|types|²
    rollup."""
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        "event_id",
    )
    fl = e.groupBy("user_id").agg(
        F.min(F.struct("us", "event_id", "event_type")).alias("f"),
        F.max(F.struct("us", "event_id", "event_type")).alias("l"),
    ).select(
        F.col("f.event_type").alias("first_type"),
        F.col("l.event_type").alias("last_type"),
    )
    return (
        fl.groupBy("first_type", "last_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("first_type", "last_type")
    )


# ---------------------------------------------------------------------------
# session 192 — props-k/value independence, purchase streaks
# ---------------------------------------------------------------------------


@register(
    "props_k_value_corr",
    f"""WITH t AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS sx, CAST(sum(cents) AS BIGINT) AS sy,
             CAST(sum(k * k) AS BIGINT) AS sxx,
             CAST(sum(cents * cents) AS BIGINT) AS syy,
             CAST(sum(k * cents) AS BIGINT) AS sxy
      FROM t)
SELECT n AS n_events, CAST({_PQC_CORR} AS BIGINT) AS corr_q6 FROM s""",
)
def props_k_value_corr(spark, sf_dir):
    """Is the JSON payload's k field tied to event value? Pearson over
    (k, cents) for events carrying the key — the schema-archaeology
    probe for an undocumented property (props_key_census says the key
    exists, props_k_histogram its distribution; THIS says whether it
    encodes anything about money — near 0 on the synthetic stream
    where k is an independent draw, the honest reading; a real payload
    where k is 'quantity' lights up immediately).

    Determinism: JSON extraction via json_extract_string /
    get_json_object (the props_key_census pairing); exact sufficient
    stats; the shared guarded split-sqrt. Envelope: cents² sums cap at
    ~1e9 events of ~1e4 cents.

    Scale shape: one map-side JSON-extracting scan to six integers."""
    t = (
        _events(spark, sf_dir)
        .select(
            F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("k"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .where(F.col("k").isNotNull())
    )
    s = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("sx"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum(F.expr("k * k")).cast("long").alias("sxx"),
        F.sum(F.expr("cents * cents")).cast("long").alias("syy"),
        F.sum(F.expr("k * cents")).cast("long").alias("sxy"),
    )
    return s.select(
        F.col("n").alias("n_events"),
        F.expr(f"CAST({_PQC_CORR} AS BIGINT)").alias("corr_q6"),
    )


@register(
    "purchase_streak_histogram",
    f"""WITH pd AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num
  FROM events WHERE event_type = 'purchase'),
isl AS (
  SELECT user_id,
         day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num)
           AS grp
  FROM pd),
runs AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
         FROM isl GROUP BY user_id, grp),
mx AS (SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
       FROM runs GROUP BY user_id)
SELECT CAST(least(max_streak, 7) AS BIGINT) AS streak_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM mx GROUP BY streak_days ORDER BY streak_days""",
)
def purchase_streak_histogram(spark, sf_dir):
    """Purchase habit streaks: each buyer's longest run of CONSECUTIVE
    purchase days (gaps-and-islands per user, clipped at 7+) — streaks
    are the strongest habit signal there is (the metric behind every
    'don't break the chain' mechanic), and a corpus whose mass sits at
    streak 1 buys occasionally no matter how high the purchase COUNT
    histograms read (user_purchase_histogram counts volume; this
    counts consecutiveness).

    Determinism: integer day arithmetic; the islands key is the
    session-139 day_num − row_number trick.

    Scale shape: distinct purchase user-days, a user-keyed islands
    window, two small aggs; ≤7-row rollup."""
    pd_ = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
                "day_num"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    isl = pd_.select(
        "user_id", (F.col("day_num") - F.row_number().over(w)).alias("grp")
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    mx = runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("max_streak")
    )
    return (
        mx.select(
            F.expr("CAST(least(max_streak, 7) AS BIGINT)").alias("streak_days")
        )
        .groupBy("streak_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("streak_days")
    )


# ---------------------------------------------------------------------------
# session 193 — geographic SLA, conversion by user-day class
# ---------------------------------------------------------------------------


@register(
    "ship_lag_by_nation",
    f"""WITH j AS (
  SELECT s.s_nationkey AS nk,
         epoch_us(l.l_shipdate) // {_US_PER_DAY}
           - epoch_us(o.o_orderdate) // {_US_PER_DAY} AS lag_days
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
a AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(lag_days) AS BIGINT) AS sum_lag
      FROM j GROUP BY nk)
SELECT n.n_name, a.n_items, a.sum_lag,
       CAST((1000000 * a.sum_lag) // a.n_items AS BIGINT) AS mean_lag_q6
FROM a JOIN nation n ON n.n_nationkey = a.nk
ORDER BY n.n_name""",
)
def ship_lag_by_nation(spark, sf_dir):
    """Fulfillment latency by SUPPLIER geography: mean order→ship lag
    per supplier nation — the third slice of the lag family
    (ship_lag_by_month = the trend, ship_lag_by_priority = the SLA
    promise, THIS = the supply-chain geography: a nation running a
    week behind the fleet is a routing/logistics finding, not a
    supplier-by-supplier one, and supplier_ship_delay_topk's
    individual laggards should be read against their nation's
    baseline).

    Determinism: integer epoch-day lags; one division per nation row.

    Scale shape: the orderkey fact join then a suppkey⋈supplier dim
    join; the nation agg combines map-side to ≤25 rows; nation
    broadcast for names."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_suppkey",
        F.expr(f"unix_micros(cast(l_shipdate as timestamp)) div {_US_PER_DAY}").alias(
            "sd"
        ),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {_US_PER_DAY}").alias(
            "od"
        ),
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    a = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.expr("sd - od")).cast("long").alias("sum_lag"),
        )
    )
    return (
        a.join(F.broadcast(n), a["nk"] == n["n_nationkey"])
        .select(
            "n_name",
            "n_items",
            "sum_lag",
            F.expr(
                "CAST((1000000 * sum_lag) div n_items AS BIGINT)"
            ).alias("mean_lag_q6"),
        )
        .orderBy("n_name")
    )


@register(
    "resurrected_conversion_rate",
    f"""WITH ud AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS purchased
  FROM events GROUP BY user_id, day_num),
lg AS (
  SELECT purchased,
         day_num - lag(day_num) OVER (PARTITION BY user_id ORDER BY day_num)
           AS gap
  FROM ud),
cls AS (
  SELECT CASE WHEN gap IS NULL THEN 'new'
              WHEN gap > 28 THEN 'resurrected'
              ELSE 'regular' END AS bucket,
         purchased
  FROM lg)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_user_days,
       CAST(sum(purchased) AS BIGINT) AS n_purchase_days,
       CAST((1000000 * sum(purchased)) // count(*) AS BIGINT) AS purchase_q6
FROM cls GROUP BY bucket ORDER BY bucket""",
)
def resurrected_conversion_rate(spark, sf_dir):
    """Do comebacks convert? The purchase rate of each user-day CLASS —
    new / resurrected (>28-day gap) / regular — daily_user_mix's
    buckets joined to the outcome that matters (a resurrected rate
    beating regular says win-back traffic is high-intent and worth
    buying; below new says reactivated users window-shop; the number a
    win-back budget is justified with). Purchase flag folds into the
    SAME (user, day) agg the classifier rides.

    Determinism: integer gaps, conditional counts, one division per
    class.

    Scale shape: one (user, day) agg carrying the flag, the user-keyed
    lag, a 3-row rollup."""
    ud = (
        _events(spark, sf_dir)
        .groupBy(
            "user_id",
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
                "day_num"
            ),
        )
        .agg(
            F.max(
                F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias("purchased")
        )
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    lg = ud.select(
        "purchased",
        (F.col("day_num") - F.lag("day_num").over(w)).alias("gap"),
    )
    cls = lg.select(
        F.expr(
            "CASE WHEN gap IS NULL THEN 'new'"
            " WHEN gap > 28 THEN 'resurrected' ELSE 'regular' END"
        ).alias("bucket"),
        "purchased",
    )
    return (
        cls.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_user_days"),
            F.sum("purchased").cast("long").alias("n_purchase_days"),
        )
        .select(
            "bucket",
            "n_user_days",
            "n_purchase_days",
            F.expr(
                "CAST((1000000 * n_purchase_days) div n_user_days AS BIGINT)"
            ).alias("purchase_q6"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 194 — mix volatility, onboarding intensity
# ---------------------------------------------------------------------------


@register(
    "type_share_volatility",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num, event_type),
t AS (SELECT day_num, CAST(sum(n) AS BIGINT) AS day_total FROM d GROUP BY day_num),
sh AS (SELECT d.event_type,
              CAST((1000000 * d.n) // t.day_total AS BIGINT) AS share_q6
       FROM d JOIN t USING (day_num))
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_present,
       CAST(min(share_q6) AS BIGINT) AS min_share_q6,
       CAST(max(share_q6) AS BIGINT) AS max_share_q6,
       CAST(max(share_q6) - min(share_q6) AS BIGINT) AS range_q6
FROM sh GROUP BY event_type ORDER BY event_type""",
)
def type_share_volatility(spark, sf_dir):
    """Mix volatility per event type: each type's daily share of
    traffic, summarized as min/max/range over the days it appears —
    events_weekly_type_jsd scores whole-mix drift as one divergence
    per week; THIS names WHICH type's share swings and by how much (a
    stable view share with a wildly swinging error share is a very
    different stream than uniform jitter, and alerts are set per type,
    not per JSD). Observed (day, type) cells only.

    Determinism: integer per-day shares (q6 floor division), exact
    min/max.

    Scale shape: one (day, type) agg, a day-total join over
    calendar-bounded rows, ≤|types| output rows."""
    d = _events(spark, sf_dir).groupBy(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = d.groupBy("day_num").agg(F.sum("n").cast("long").alias("day_total"))
    sh = d.join(t, "day_num").select(
        "event_type",
        F.expr("CAST((1000000 * n) div day_total AS BIGINT)").alias("share_q6"),
    )
    return (
        sh.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_present"),
            F.min("share_q6").cast("long").alias("min_share_q6"),
            F.max("share_q6").cast("long").alias("max_share_q6"),
        )
        .select(
            "event_type",
            "n_days_present",
            "min_share_q6",
            "max_share_q6",
            (F.col("max_share_q6") - F.col("min_share_q6"))
            .cast("long")
            .alias("range_q6"),
        )
        .orderBy("event_type")
    )


@register(
    "first_day_share_histogram",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num FROM events),
u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_total,
         CAST(min(day_num) AS BIGINT) AS d0
  FROM e GROUP BY user_id),
fd AS (
  SELECT e.user_id,
         CAST(count(*) AS BIGINT) AS n_first_day
  FROM e JOIN u ON u.user_id = e.user_id AND e.day_num = u.d0
  GROUP BY e.user_id),
d AS (
  SELECT CAST(least((10 * fd.n_first_day) // u.n_total, 9) AS BIGINT) AS decile
  FROM u JOIN fd ON fd.user_id = u.user_id
  WHERE u.n_total >= 3)
SELECT decile, CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY decile ORDER BY decile""",
)
def first_day_share_histogram(spark, sf_dir):
    """Onboarding intensity vs lifetime: the share of each user's (≥3
    events) LIFETIME activity that happened on their first calendar
    day, deciled — decile 9 is the binge-and-vanish pattern (all value
    extracted up front; retention programs can't help), low deciles
    the slow-burn relationships (onboarding_depth_return_rate asks
    whether a deep first session predicts return; this measures how
    front-loaded the whole relationship turned out to be).

    Determinism: integer counts; decile = (10·k) div n clamped (the
    typicality rule); n ≥ 3 floor.

    Scale shape: two user-keyed aggs sharing the user exchange; a
    10-row rollup."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
    )
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.min("day_num").cast("long").alias("d0"),
    )
    fd = (
        e.join(u, "user_id")
        .where(F.col("day_num") == F.col("d0"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_first_day"))
    )
    d = (
        u.join(fd, "user_id")
        .where(F.col("n_total") >= 3)
        .select(
            F.expr(
                "CAST(least((10 * n_first_day) div n_total, 9) AS BIGINT)"
            ).alias("decile")
        )
    )
    return (
        d.groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# session 195 — geographic price level, per-type cadence
# ---------------------------------------------------------------------------


@register(
    "supply_price_by_nation",
    f"""WITH j AS (
  SELECT s.s_nationkey AS nk, {_LI_DISC_C} AS disc_c, {_LI_QTY_C} AS qty_c
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
a AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(disc_c) AS BIGINT) AS value_c,
             CAST(sum(qty_c) AS BIGINT) AS qty_c
      FROM j GROUP BY nk)
SELECT n.n_name, a.n_items, a.value_c, a.qty_c,
       CAST((1000000 * a.value_c) // a.qty_c AS BIGINT) AS price_per_unit_q6
FROM a JOIN nation n ON n.n_nationkey = a.nk
ORDER BY n.n_name""",
)
def supply_price_by_nation(spark, sf_dir):
    """Geographic price level of supply: per supplier nation, shipped
    value over shipped quantity — the realized price-per-unit each
    sourcing geography commands (region_supply_volume counts the flow,
    ship_lag_by_nation times it; this PRICES it, and a nation whose
    unit price sits far off the fleet is either a premium-mix
    specialist or a negotiation target — join against
    part_nation_concentration before concluding which). Both money
    columns take their shared per-row cents rules, so the ratio is one
    division of exact BIGINTs.

    Scale shape: one fact⋈dim join collapsing map-side to ≤25 rows;
    nation broadcast for names."""
    j = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_suppkey",
            F.expr(_LI_DISC_C).alias("disc_c"),
            F.expr(_LI_QTY_C).alias("qty_c"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
                "s_suppkey", "s_nationkey"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    a = j.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("disc_c").cast("long").alias("value_c"),
        F.sum("qty_c").cast("long").alias("qty_c"),
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return (
        a.join(F.broadcast(n), a["nk"] == n["n_nationkey"])
        .select(
            "n_name",
            "n_items",
            "value_c",
            "qty_c",
            F.expr(
                "CAST((1000000 * value_c) div qty_c AS BIGINT)"
            ).alias("price_per_unit_q6"),
        )
        .orderBy("n_name")
    )


@register(
    "type_cadence_profile",
    """WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, event_id FROM events),
lg AS (
  SELECT event_type,
         us - lag(us) OVER (PARTITION BY event_type ORDER BY us, event_id)
           AS gap_us
  FROM e)
SELECT event_type,
       CAST(count(gap_us) AS BIGINT) AS n_gaps,
       CAST(COALESCE(sum(gap_us), 0) // 1000000 AS BIGINT) AS total_gap_seconds,
       CAST(COALESCE(sum(gap_us), 0) // greatest(count(gap_us), 1) // 1000000 AS BIGINT)
         AS mean_gap_seconds
FROM lg GROUP BY event_type ORDER BY event_type""",
)
def type_cadence_profile(spark, sf_dir):
    """Global cadence per event type: the mean gap between consecutive
    occurrences of the SAME type anywhere in the stream — the
    freshness clock each type ticks at (a purchase every 40 s and an
    error every 10 min set very different alert windows and watermark
    expectations; interevent ops measure per-USER rhythm, this is the
    fleet-level arrival rate's reciprocal in plain seconds).

    Determinism: equal-timestamp events order by event_id in the lag
    (the interevent rule); integer µs sums with floor divisions to
    seconds.

    Scale shape: ONE type-partitioned lag window (|types| partitions —
    at scale pre-aggregate to per-type counts/min/max instead, since
    mean gap = span/(n−1) for a totally ordered stream; documented
    equivalent), then a ≤|types|-row rollup."""
    e = _events(spark, sf_dir).select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    lg = e.select(
        "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    )
    return (
        lg.groupBy("event_type")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.coalesce(F.sum("gap_us"), F.lit(0)).alias("sg"),
        )
        .select(
            "event_type",
            "n_gaps",
            F.expr("CAST(sg div 1000000 AS BIGINT)").alias(
                "total_gap_seconds"
            ),
            F.expr(
                "CAST(sg div greatest(n_gaps, 1) div 1000000 AS BIGINT)"
            ).alias("mean_gap_seconds"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# session 196 — idle customer balances
# ---------------------------------------------------------------------------


@register(
    "customer_idle_balance",
    """WITH act AS (SELECT DISTINCT o_custkey FROM orders)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_customers,
       (SELECT CAST(count(*) AS BIGINT) FROM act) AS n_active,
       (SELECT CAST(COALESCE(sum(CAST(round(c_acctbal * 100) AS BIGINT)), 0) AS BIGINT)
        FROM customer LEFT JOIN act ON act.o_custkey = customer.c_custkey
        WHERE act.o_custkey IS NULL) AS idle_balance_cents,
       (SELECT CAST(COALESCE(sum(CAST(round(c_acctbal * 100) AS BIGINT)), 0) AS BIGINT)
        FROM customer) AS total_balance_cents""",
)
def customer_idle_balance(spark, sf_dir):
    """The money sitting with never-buyers: account balance held by
    customers who placed NO order, beside the book total — the
    demand-side completion of the activation-coverage trio
    (customer_order_coverage counts the idle heads,
    supplier_sales_coverage prices the idle supply side; this prices
    idle demand: a large idle balance is either pre-funded accounts
    waiting for activation outreach or stale master data inflating the
    book). Cents per row, LEFT-IS-NULL anti probe.

    Scale shape: one distinct custkey projection of orders, one anti
    probe, scalar rollups."""
    act = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    nc = c.agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    na = act.agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    idle = c.join(act, c["c_custkey"] == act["o_custkey"], "anti").agg(
        F.coalesce(F.sum("cents"), F.lit(0))
        .cast("long")
        .alias("idle_balance_cents")
    )
    tot = c.agg(
        F.coalesce(F.sum("cents"), F.lit(0))
        .cast("long")
        .alias("total_balance_cents")
    )
    return nc.crossJoin(na).crossJoin(idle).crossJoin(tot)


# ---------------------------------------------------------------------------
# session 197 — runtime-filter benefit, Kaplan-Meier conversion survival,
# broadcast-threshold audit
# ---------------------------------------------------------------------------


@register(
    "runtime_filter_benefit",
    """WITH sel AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
bpos AS (
  SELECT DISTINCT
    ('0x' || substr(md5('rf:' || CAST(o_orderkey AS VARCHAR)), 1 + 4 * j, 4))::UBIGINT::BIGINT AS pos
  FROM sel, js),
keyrows AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS nrows FROM lineitem GROUP BY 1),
kpos AS (
  SELECT l_orderkey, j,
    ('0x' || substr(md5('rf:' || CAST(l_orderkey AS VARCHAR)), 1 + 4 * j, 4))::UBIGINT::BIGINT AS pos
  FROM keyrows, js),
bl AS (
  SELECT l_orderkey FROM kpos JOIN bpos USING (pos)
  GROUP BY l_orderkey HAVING count(DISTINCT j) = 4),
fl AS (
  SELECT k.nrows,
         CASE WHEN s.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS ex,
         CASE WHEN b.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS bp
  FROM keyrows k
  LEFT JOIN sel s ON s.o_orderkey = k.l_orderkey
  LEFT JOIN bl b ON b.l_orderkey = k.l_orderkey),
agg AS (
  SELECT CAST(COALESCE(sum(nrows), 0) AS BIGINT) AS n_fact,
         CAST(COALESCE(sum(nrows * ex), 0) AS BIGINT) AS n_semijoin_rows,
         CAST(COALESCE(sum(nrows * bp), 0) AS BIGINT) AS n_bloom_rows
  FROM fl)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM sel) AS n_sel_orders,
       n_fact, n_semijoin_rows, n_bloom_rows,
       n_bloom_rows - n_semijoin_rows AS n_false_rows,
       CAST((1000000 * (n_fact - n_semijoin_rows)) // greatest(n_fact, 1) AS BIGINT)
         AS skip_exact_q6,
       CAST((1000000 * (n_fact - n_bloom_rows)) // greatest(n_fact, 1) AS BIGINT)
         AS skip_bloom_q6
FROM agg""",
)
def runtime_filter_benefit(spark, sf_dir):
    """Runtime-filter (dynamic semi-join / bloom pushdown) benefit model
    for the schema's hottest selective join: orders filtered to
    '1-URGENT' joined to lineitem on orderkey. A perfect runtime filter
    skips every fact row whose key misses the filtered build side
    (n_fact − n_semijoin_rows); the deployable approximation — a Bloom
    filter built from the build-side keys (m = 2^16 positions, k = 4
    16-bit md5 slices, the decontamination_bloom substrate, seeded
    'rf:' for hash-input disjointness) — passes a small false-positive
    tail on top. Reported side by side, the two skip fractions price
    exactly what Spark's runtime row-level filtering buys on this join
    and what the bloom's FPR costs versus the unachievable exact
    semi-join.

    Determinism: membership is a distinct-positions table + equi-join
    (a bitset stand-in), identical integer positions both engines; skip
    fractions are nonnegative integer cross-multiplications.

    Scale shape: the bloom position table is bounded at 65 536 rows no
    matter how large the filtered build side — THAT is what gets
    broadcast, never the keys themselves; the probe evaluates per
    DISTINCT fact key (the dictionary-probe shape) and row counts join
    back, so the wide fact table is touched once for the key histogram.
    The exact-flag join is un-hinted (the filtered dimension is
    unbounded at scale — AQE decides)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sel = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    js = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    bpos = (
        sel.select("o_orderkey", js)
        .select(
            F.expr(
                "cast(conv(substring(md5(concat('rf:', cast(o_orderkey as string))),"
                " 1 + 4 * j, 4), 16, 10) as bigint)"
            ).alias("pos")
        )
        .distinct()
    )
    keyrows = li.groupBy("l_orderkey").agg(F.count("*").cast("long").alias("nrows"))
    kpos = keyrows.select("l_orderkey", js).select(
        "l_orderkey",
        "j",
        F.expr(
            "cast(conv(substring(md5(concat('rf:', cast(l_orderkey as string))),"
            " 1 + 4 * j, 4), 16, 10) as bigint)"
        ).alias("pos"),
    )
    bl = (
        kpos.join(F.broadcast(bpos), "pos")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("j").alias("nj"))
        .where(F.col("nj") == 4)
        .select(F.col("l_orderkey").alias("bk"))
    )
    fl = (
        keyrows.join(sel, keyrows["l_orderkey"] == sel["o_orderkey"], "left")
        .join(bl, keyrows["l_orderkey"] == bl["bk"], "left")
        .select(
            "nrows",
            F.when(F.col("o_orderkey").isNotNull(), F.col("nrows"))
            .otherwise(F.lit(0))
            .alias("ex_rows"),
            F.when(F.col("bk").isNotNull(), F.col("nrows"))
            .otherwise(F.lit(0))
            .alias("bp_rows"),
        )
    )
    agg = fl.agg(
        F.coalesce(F.sum("nrows"), F.lit(0)).cast("long").alias("n_fact"),
        F.coalesce(F.sum("ex_rows"), F.lit(0)).cast("long").alias("n_semijoin_rows"),
        F.coalesce(F.sum("bp_rows"), F.lit(0)).cast("long").alias("n_bloom_rows"),
    )
    nsel = sel.agg(F.count(F.lit(1)).cast("long").alias("n_sel_orders"))
    return nsel.crossJoin(agg).select(
        "n_sel_orders",
        "n_fact",
        "n_semijoin_rows",
        "n_bloom_rows",
        (F.col("n_bloom_rows") - F.col("n_semijoin_rows")).alias("n_false_rows"),
        F.expr(
            "CAST((1000000 * (n_fact - n_semijoin_rows)) div greatest(n_fact, 1) AS BIGINT)"
        ).alias("skip_exact_q6"),
        F.expr(
            "CAST((1000000 * (n_fact - n_bloom_rows)) div greatest(n_fact, 1) AS BIGINT)"
        ).alias("skip_bloom_q6"),
    )


@register(
    "km_conversion_survival",
    """WITH u AS (
  SELECT user_id,
         min(epoch_us(ts) // 86400000000) AS fd,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) // 86400000000 END) AS pd
  FROM events GROUP BY user_id),
m AS (SELECT max(epoch_us(ts) // 86400000000) AS D FROM events),
obs AS (
  SELECT CASE WHEN pd IS NOT NULL THEN pd - fd ELSE D - fd END AS t,
         CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u, m),
h AS (SELECT t, CAST(count(*) AS BIGINT) AS n_obs, CAST(sum(ev) AS BIGINT) AS n_ev
      FROM obs GROUP BY t),
r AS (
  SELECT t, n_obs, n_ev,
         CAST(sum(n_obs) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
  FROM h),
f AS (
  SELECT t, n_risk, n_ev, n_obs - n_ev AS n_censored_at,
         CASE WHEN n_ev >= n_risk THEN CAST(-1000000000000 AS BIGINT)
              ELSE CAST(round(1000000 * ln(CAST(n_risk - n_ev AS DOUBLE) / n_risk))
                        AS BIGINT) END AS f_q6
  FROM r WHERE n_ev > 0),
s AS (
  SELECT t, n_risk, n_ev, n_censored_at,
         CAST(sum(f_q6) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM f)
SELECT CAST(t AS BIGINT) AS t_days, n_risk, n_ev AS n_events, n_censored_at,
       CAST(greatest(cum, -1000000000000) AS BIGINT) AS ln_surv_q6
FROM s ORDER BY t_days""",
)
def km_conversion_survival(spark, sf_dir):
    """Kaplan-Meier time-to-first-purchase: the statistically correct
    completion of conversion_latency_histogram — users who never
    purchase are RIGHT-CENSORED at the stream end (duration = last
    stream day − their first day) instead of silently dropped, so the
    curve is unbiased by the observation window. Standard KM: at each
    event time t, S multiplies by (n_risk − d)/n_risk where n_risk
    counts everyone (converted or censored) still under observation at
    t; censored-at-t users count as at-risk at t (deaths before
    censorings, the textbook tie rule). Output per event time: at-risk
    count, conversions, censorings at that time, and cumulative
    ln-survival in q6 (per-factor ln((n−d)/n) q6-rounded FIRST, then an
    exact BIGINT running sum — no float sum order). d = n only happens
    at the maximum observed time (no one outlives it); that row emits
    the S=0 sentinel −1e12, and the sandbox's all-converter stream
    exercises it — the curve there equals 1−ECDF, the honest
    no-censoring reading.

    Scale shape: ONE user-keyed exchange for the per-user min-aggs, a
    1-row max-day crossJoin, then every window runs over histogram
    CELLS only (distinct durations, calendar-bounded) — the
    doclen_quantiles convention, never a per-user global sort."""
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day"),
    )
    u = e.groupBy("user_id").agg(
        F.min("day").alias("fd"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("day"))).alias("pd"),
    )
    m = e.agg(F.max("day").alias("D"))
    obs = u.crossJoin(m).select(
        F.when(F.col("pd").isNotNull(), F.col("pd") - F.col("fd"))
        .otherwise(F.col("D") - F.col("fd"))
        .alias("t"),
        F.when(F.col("pd").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("ev"),
    )
    h = obs.groupBy("t").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("ev").cast("long").alias("n_ev"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = h.select(
        "t",
        "n_obs",
        "n_ev",
        F.sum("n_obs").over(w_desc).cast("long").alias("n_risk"),
    )
    f = r.where(F.col("n_ev") > 0).select(
        "t",
        "n_risk",
        "n_ev",
        (F.col("n_obs") - F.col("n_ev")).alias("n_censored_at"),
        F.when(F.col("n_ev") >= F.col("n_risk"), F.lit(-1000000000000).cast("long"))
        .otherwise(
            F.expr(
                "CAST(round(1000000 * ln(CAST(n_risk - n_ev AS DOUBLE) / n_risk)) AS BIGINT)"
            )
        )
        .alias("f_q6"),
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        f.select(
            "t",
            "n_risk",
            "n_ev",
            "n_censored_at",
            F.sum("f_q6").over(w_asc).cast("long").alias("cum"),
        )
        .select(
            F.col("t").cast("long").alias("t_days"),
            "n_risk",
            F.col("n_ev").alias("n_events"),
            "n_censored_at",
            F.greatest(F.col("cum"), F.lit(-1000000000000).cast("long")).alias(
                "ln_surv_q6"
            ),
        )
        .orderBy("t_days")
    )


# broadcast-threshold audit: one shared per-table byte model generates BOTH
# engines' expressions (the _pq_sql rule — scales/conventions in one place).
# Convention: 8 B per scalar column (int/double/date/timestamp alike — the
# in-memory unsafe-row word), length+4 per string, 4*len+4 per float array.
_BTA_SPEC = [
    ("customer", 3, ["c_name", "c_mktsegment"], None),
    ("documents", 2, ["text", "lang", "source"], None),
    ("embeddings", 2, [], "embedding"),
    ("events", 4, ["event_type", "props"], None),
    ("lineitem", 9, ["l_returnflag", "l_linestatus"], None),
    ("nation", 2, ["n_name"], None),
    ("orders", 4, ["o_orderstatus", "o_orderpriority"], None),
    ("part", 3, ["p_name", "p_brand", "p_type"], None),
    ("region", 1, ["r_name"], None),
    ("supplier", 3, ["s_name"], None),
]
_BTA_THRESHOLD = 10 * 1024 * 1024  # Spark's default autoBroadcastJoinThreshold


def _bta_sql() -> str:
    parts = []
    for name, n_scalar, strs, arr in _BTA_SPEC:
        terms = [f"8 * {n_scalar} * count(*)"]
        for c in strs:
            terms.append(f"COALESCE(sum(length({c}) + 4), 0)")
        if arr is not None:
            terms.append(f"COALESCE(sum(4 * len({arr}) + 4), 0)")
        parts.append(
            f"SELECT '{name}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST({' + '.join(terms)} AS BIGINT) AS est_bytes FROM {name}"
        )
    body = " UNION ALL ".join(parts)
    return (
        f"WITH b AS ({body}) SELECT table_name, n_rows, est_bytes,"
        f" CASE WHEN est_bytes <= {_BTA_THRESHOLD} THEN 1 ELSE 0 END AS fits_10mb,"
        f" CASE WHEN est_bytes * 100 <= {_BTA_THRESHOLD} THEN 1 ELSE 0 END AS fits_10mb_100x"
        f" FROM b ORDER BY table_name"
    )


@register("broadcast_threshold_audit", _bta_sql())
def broadcast_threshold_audit(spark, sf_dir):
    """Join-strategy advisor: estimated in-memory bytes per table versus
    Spark's 10 MiB autoBroadcastJoinThreshold, now AND at a 100× scale-up
    — the pre-flight that says which sides of the engine's joins are
    legitimately broadcastable (nation/region/supplier: always; part/
    customer: at this SF but NOT at 100× — exactly the force-broadcast
    trap the un-hinted-join rule guards against). Byte model: 8 B per
    scalar column, length+4 per string, 4·len+4 per float array —
    generated from ONE spec for both engines.

    Scale shape: one map-side agg per table (count + length sums), a
    ten-row union; nothing shuffles."""
    out = None
    for name, n_scalar, strs, arr in _BTA_SPEC:
        t = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        terms = [F.lit(8 * n_scalar) * F.count("*")]
        for c in strs:
            terms.append(F.coalesce(F.sum(F.length(c) + F.lit(4)), F.lit(0)))
        if arr is not None:
            terms.append(
                F.coalesce(F.sum(F.lit(4) * F.size(arr) + F.lit(4)), F.lit(0))
            )
        est = terms[0]
        for x in terms[1:]:
            est = est + x
        row = t.agg(
            F.count("*").cast("long").alias("n_rows"),
            est.cast("long").alias("est_bytes"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "est_bytes")
        out = row if out is None else out.unionByName(row)
    return out.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.when(F.col("est_bytes") <= F.lit(_BTA_THRESHOLD), F.lit(1))
        .otherwise(F.lit(0))
        .alias("fits_10mb"),
        F.when(F.col("est_bytes") * F.lit(100) <= F.lit(_BTA_THRESHOLD), F.lit(1))
        .otherwise(F.lit(0))
        .alias("fits_10mb_100x"),
    ).orderBy("table_name")


# ---------------------------------------------------------------------------
# session 198 — z-order layout estimate, quantile-sketch error, tiered index
# ---------------------------------------------------------------------------


def _z_interleave(a: str, b: str, intdiv: str) -> str:
    """4+4-bit Morton interleave of two clamped nonneg ints as ONE shared
    integer expression (no shiftleft — DuckDB lacks it; powers folded)."""
    terms = []
    for i in range(4):
        terms.append(f"(({a} {intdiv} {2 ** i}) % 2) * {2 ** (2 * i + 1)}")
        terms.append(f"(({b} {intdiv} {2 ** i}) % 2) * {2 ** (2 * i)}")
    return " + ".join(terms)


_ZO_PRED = "lang = 'en' AND lb IN (6, 7)"


@register(
    "zorder_pruning_estimate",
    f"""WITH d0 AS (
  SELECT doc_id, lang,
         least(15, length(bin(greatest(n_chars, 1))) - 1) AS lb
  FROM documents),
lr AS (SELECT lang, least(15, row_number() OVER (ORDER BY lang) - 1) AS la
       FROM (SELECT DISTINCT lang FROM documents) _t),
d AS (
  SELECT doc_id, lang, lb, {_z_interleave('la', 'lb', '//')} AS z,
         CASE WHEN {_ZO_PRED} THEN 1 ELSE 0 END AS m
  FROM d0 JOIN lr USING (lang)),
pa AS (SELECT doc_id // {_RG_ROWS} AS grp, m FROM d),
pb AS (SELECT (row_number() OVER (ORDER BY lang, doc_id) - 1) // {_RG_ROWS} AS grp, m FROM d),
pc AS (SELECT (row_number() OVER (ORDER BY lb, doc_id) - 1) // {_RG_ROWS} AS grp, m FROM d),
pd AS (SELECT (row_number() OVER (ORDER BY z, doc_id) - 1) // {_RG_ROWS} AS grp, m FROM d)
SELECT layout, n_groups, touched,
       CAST((1000000 * touched) // greatest(n_groups, 1) AS BIGINT) AS touched_q6
FROM (
  SELECT 'doc_id_order' AS layout,
         CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
         CAST(count(DISTINCT CASE WHEN m = 1 THEN grp END) AS BIGINT) AS touched
  FROM pa
  UNION ALL
  SELECT 'lang_sorted', CAST(count(DISTINCT grp) AS BIGINT),
         CAST(count(DISTINCT CASE WHEN m = 1 THEN grp END) AS BIGINT) FROM pb
  UNION ALL
  SELECT 'len_sorted', CAST(count(DISTINCT grp) AS BIGINT),
         CAST(count(DISTINCT CASE WHEN m = 1 THEN grp END) AS BIGINT) FROM pc
  UNION ALL
  SELECT 'zorder', CAST(count(DISTINCT grp) AS BIGINT),
         CAST(count(DISTINCT CASE WHEN m = 1 THEN grp END) AS BIGINT) FROM pd
) ORDER BY layout""",
)
def zorder_pruning_estimate(spark, sf_dir):
    """Multi-dimensional clustering advisor: 64-row row-group touch
    counts for the CONJUNCTIVE predicate lang='en' AND log2-length band
    {6,7} under four physical layouts — doc_id order (the current
    table), each single-column sort, and a 4+4-bit Morton/Z-ORDER
    interleave of (lang ordinal, length bucket). The single-column
    sorts each optimize ONE predicate leg and leave the other scattered
    through every run; the z-curve trades a little locality on both
    axes for clustering on BOTH at once — this op quantifies that trade
    (the Delta/Iceberg OPTIMIZE ZORDER decision) the same way
    sort_layout_pruning_estimate quantifies the 1-D sort.

    Determinism: dense doc_ids make layout A a pure division; keyed
    layouts rank by (key, doc_id); the interleave is ONE generated
    integer expression (no engine shift builtins), lang ordinals come
    from the sorted distinct-lang table.

    Scale shape (Spark): every keyed layout uses the global_row_ids
    two-pass form — per-key row_number + an exclusive prefix sum over
    the tiny per-key counts table (≤256 z values) — never the oracle's
    single global-ORDER window; the distinct-group rollups are map-side
    conditional counts."""
    d0 = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.expr("least(15, length(bin(greatest(n_chars, 1))) - 1)").alias("lb"),
    )
    lr = (
        d0.select("lang")
        .distinct()
        .select(
            "lang",
            F.expr(
                "least(15, row_number() OVER (ORDER BY lang) - 1)"
            ).alias("la"),
        )
    )
    d = (
        d0.join(F.broadcast(lr), "lang")
        .select(
            "doc_id",
            "lang",
            "lb",
            F.expr(_z_interleave("la", "lb", "div")).alias("z"),
            F.expr(f"CASE WHEN {_ZO_PRED} THEN 1 ELSE 0 END").alias("m"),
        )
        .localCheckpoint()  # four layout consumers would re-derive otherwise
    )

    def _rollup(grp_df, name):
        return grp_df.agg(
            F.countDistinct("grp").cast("long").alias("n_groups"),
            F.countDistinct(F.when(F.col("m") == 1, F.col("grp")))
            .cast("long")
            .alias("touched"),
        ).select(
            F.lit(name).alias("layout"),
            "n_groups",
            "touched",
            F.expr(
                "CAST((1000000 * touched) div greatest(n_groups, 1) AS BIGINT)"
            ).alias("touched_q6"),
        )

    def _keyed(key, name):
        kc = d.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        wk = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
        off = kc.select(
            key, F.coalesce(F.sum("cnt").over(wk), F.lit(0)).alias("off")
        )
        wr = Window.partitionBy(key).orderBy("doc_id")
        p = (
            d.withColumn("rn", F.row_number().over(wr))
            .join(F.broadcast(off), key)
            .select(F.expr(f"(off + rn - 1) div {_RG_ROWS}").alias("grp"), "m")
        )
        return _rollup(p, name)

    pa = _rollup(
        d.select(F.expr(f"doc_id div {_RG_ROWS}").alias("grp"), "m"),
        "doc_id_order",
    )
    return (
        pa.unionByName(_keyed("lang", "lang_sorted"))
        .unionByName(_keyed("lb", "len_sorted"))
        .unionByName(_keyed("z", "zorder"))
        .orderBy("layout")
    )


@register(
    "quantile_sketch_error",
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
q AS (SELECT p_q6 FROM (VALUES (100000), (250000), (500000), (750000), (900000)) _p(p_q6)),
ex AS (
  SELECT q.p_q6, max(h.n) AS n, max(h.mn) AS mn, max(h.mx) AS mx,
         max((h.n - 1) * q.p_q6) AS x,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 THEN h.val END) AS v_lo,
         max(CASE WHEN h.cb <= ((h.n - 1) * q.p_q6) // 1000000 + 1 THEN h.val END) AS v_hi
  FROM h, q GROUP BY q.p_q6),
bh AS (
  SELECT least(31, ((val - mn) * 32) // (mx - mn + 1)) AS bin,
         mn, mx, n, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM h GROUP BY 1, 2, 3, 4),
bc AS (
  SELECT bin, mn, mx, n, cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
  FROM bh),
sk AS (
  SELECT ex.p_q6,
         CAST(round(1000000.0 * ((bc.mn + (bc.bin * (bc.mx - bc.mn + 1)) / 32.0)
           + ((ex.x - 1000000 * bc.cb) / (1000000.0 * bc.cnt))
             * ((bc.mx - bc.mn + 1) / 32.0))) AS BIGINT) AS sketch_q6
  FROM ex JOIN bc
    ON 1000000 * bc.cb <= ex.x AND ex.x < 1000000 * (bc.cb + bc.cnt))
SELECT CAST(ex.p_q6 AS BIGINT) AS p_q6,
       CAST(round(1000000.0 * (ex.v_lo + ((ex.x % 1000000) / 1000000.0)
            * (ex.v_hi - ex.v_lo))) AS BIGINT) AS exact_q6,
       sk.sketch_q6,
       sk.sketch_q6 - CAST(round(1000000.0 * (ex.v_lo + ((ex.x % 1000000) / 1000000.0)
            * (ex.v_hi - ex.v_lo))) AS BIGINT) AS err_q6
FROM ex JOIN sk USING (p_q6) ORDER BY p_q6""",
)
def quantile_sketch_error(spark, sf_dir):
    """Approximate-quantile accuracy audit: a 32-bucket EQUI-WIDTH
    histogram sketch (the classic streaming/approx-percentile structure
    — constant memory, mergeable, what monitoring systems actually
    store) versus the exact type-7 percentile at p10/p25/p50/p75/p90
    over document character lengths. The error column prices what the
    bounded sketch gives up on THIS distribution — the same
    sketch-vs-truth audit the cardinality family gets from
    kmv_distinct_estimate/hll_precision_curve, pointed at quantiles.

    Determinism: the continuous rank x = (n−1)·p_q6 stays a BIGINT;
    bin membership is the integer cross-multiplication 1e6·cb ≤ x <
    1e6·(cb+cnt) (exactly one bin qualifies — rank space is covered by
    the bins' disjoint [cb, cb+cnt) ranges); both estimates are ONE
    shared double expression from integer inputs, q6-rounded.

    Scale shape: values collapse map-side to a value-histogram; every
    window runs over histogram cells, the bin table is ≤32 rows and the
    probe spine 5 rows — the doclen_quantiles discipline with a
    32-cell second stage."""
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
    q = spark.createDataFrame(
        [(100000,), (250000,), (500000,), (750000,), (900000,)], "p_q6 long"
    )
    x = (F.col("n") - 1) * F.col("p_q6")
    ex = (
        h.crossJoin(F.broadcast(q))
        .groupBy("p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.max(x).alias("x"),
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
    bh = h.groupBy(
        F.expr("least(31, ((val - mn) * 32) div (mx - mn + 1))").alias("bin"),
        "mn",
        "mx",
        "n",
    ).agg(F.sum("cnt").cast("long").alias("cnt"))
    w_bc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    bc = bh.select(
        "bin",
        "mn",
        "mx",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_bc), F.lit(0)).cast("long").alias("cb"),
    )
    exs = ex.select("p_q6", "x", "v_lo", "v_hi")
    sk = exs.join(
        bc.select("bin", "mn", "mx", "cnt", "cb"),
        (F.lit(1000000) * F.col("cb") <= F.col("x"))
        & (F.col("x") < F.lit(1000000) * (F.col("cb") + F.col("cnt"))),
    ).select(
        "p_q6",
        F.expr(
            "CAST(round(1000000.0 * ((mn + (bin * (mx - mn + 1)) / 32.0)"
            " + ((x - 1000000 * cb) / (1000000.0 * cnt))"
            " * ((mx - mn + 1) / 32.0))) AS BIGINT)"
        ).alias("sketch_q6"),
    )
    exact = F.expr(
        "CAST(round(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0)"
        " * (v_hi - v_lo))) AS BIGINT)"
    )
    return (
        exs.join(sk, "p_q6")
        .select(
            F.col("p_q6").cast("long").alias("p_q6"),
            exact.alias("exact_q6"),
            "sketch_q6",
            (F.col("sketch_q6") - exact).alias("err_q6"),
        )
        .orderBy("p_q6")
    )


@register(
    "tiered_index_plan",
    _bm25_agg_ctes(["spark", "hash", "join"])
    + """,
tper AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfs.df,
         row_number() OVER (PARTITION BY tf.term
                            ORDER BY tf.tf DESC, tf.doc_id ASC) AS r
  FROM tf JOIN q USING (term) JOIN dfs USING (term)),
tsel AS (SELECT doc_id, term, tf FROM tper
         WHERE r <= (CAST(df AS BIGINT) + 3) // 4),
tsc AS (
  SELECT tf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st))) AS s
  FROM tsel tf JOIN dfs USING (term) JOIN dl USING (doc_id)),
tagg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
         FROM tsc GROUP BY doc_id),
ftop AS (SELECT doc_id, score_q6 FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
ttop AS (SELECT doc_id, score_q6 FROM tagg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM tper) AS n_full_postings,
       (SELECT CAST(count(*) AS BIGINT) FROM tsel) AS n_tier_postings,
       (SELECT CAST(count(*) AS BIGINT) FROM ftop JOIN ttop USING (doc_id)) AS top10_overlap,
       (SELECT CAST(COALESCE(sum(score_q6), 0) AS BIGINT) FROM ftop) AS sum_full_q6,
       (SELECT CAST(COALESCE(sum(score_q6), 0) AS BIGINT) FROM ttop) AS sum_tier_q6""",
)
def tiered_index_plan(spark, sf_dir):
    """Static index pruning / impact-tier audit (Lucene impact blocks,
    Ntoulas-Cho static pruning): tier-1 keeps only each query term's
    top ⌈df/4⌉ postings by tf (the high-impact quarter); score the
    canned query against tier-1 alone — with FULL-corpus idf/avgdl, as
    a pruned index serves — and report top-10 agreement with the
    unpruned ranking plus the candidate-volume saving. High overlap at
    4× fewer postings is the argument for serving head queries from a
    tier-1-resident index and falling back to the full tier only on
    disagreement risk (the two-tier architecture next to the engine's
    own MaxScore gate, which prunes per-QUERY; this prunes the INDEX).

    Determinism: tier membership ranks by (tf DESC, doc_id ASC); both
    rankings order by quantized score with the doc_id tiebreak.

    Scale shape: the per-term tier rank windows run on MATCHED postings
    only (query-term partitions, df-bounded — in a real build this rank
    is computed once at index time inside the segment writer's existing
    term sharding); the tf table is localCheckpoint'd (dl/dfs/tier all
    consume it — un-checkpointed each branch re-tokenizes); top-10s are
    TakeOrdered collects, never corpus sorts."""
    terms = ["spark", "hash", "join"]
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    st = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = F.broadcast(spark.createDataFrame([(t,) for t in terms], "term string"))

    def _score(df_in):
        return (
            df_in.join(dl, "doc_id")
            .crossJoin(F.broadcast(st))
            .select(
                "doc_id",
                (
                    F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    )
                    * F.col("tf").cast("double")
                    * F.lit(2.2)
                    / (
                        F.col("tf").cast("double")
                        + F.lit(1.2)
                        * (
                            F.lit(0.25)
                            + F.lit(0.75) * F.col("doc_len") / F.col("avgdl")
                        )
                    )
                ).alias("s"),
            )
            .groupBy("doc_id")
            .agg(_q6(F.sum("s")).alias("score_q6"))
        )

    mtf = tf.join(q, "term").join(dfs, "term")
    wr = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    ranked = mtf.withColumn("r", F.row_number().over(wr))
    tsel = ranked.where(
        F.col("r") <= F.expr("(CAST(df AS BIGINT) + 3) div 4")
    ).select("doc_id", "term", "tf", "df")
    full_agg = _score(mtf.select("doc_id", "term", "tf", "df"))
    tier_agg = _score(tsel)
    ftop = full_agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    ttop = tier_agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    nf = mtf.agg(F.count(F.lit(1)).cast("long").alias("n_full_postings"))
    nt = tsel.agg(F.count(F.lit(1)).cast("long").alias("n_tier_postings"))
    ov = (
        ftop.select("doc_id")
        .join(ttop.select("doc_id"), "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("top10_overlap"))
    )
    sf = ftop.agg(
        F.coalesce(F.sum("score_q6"), F.lit(0)).cast("long").alias("sum_full_q6")
    )
    st2 = ttop.agg(
        F.coalesce(F.sum("score_q6"), F.lit(0)).cast("long").alias("sum_tier_q6")
    )
    return nf.crossJoin(nt).crossJoin(ov).crossJoin(sf).crossJoin(st2)


# ---------------------------------------------------------------------------
# session 199 — LFU cache-hit curve, k-mins cardinality sketch (streaming
# twin in streaming/events.py), sampling-weight effective sample size
# ---------------------------------------------------------------------------


@register(
    "lfu_cache_hit_curve",
    """WITH fr AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS f FROM lineitem GROUP BY 1),
cells AS (SELECT f, CAST(count(*) AS BIGINT) AS nk FROM fr GROUP BY f),
c2 AS (
  SELECT f, nk,
         CAST(COALESCE(sum(nk) OVER (ORDER BY f DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ka,
         CAST(COALESCE(sum(f * nk) OVER (ORDER BY f DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ma
  FROM cells),
tot AS (SELECT CAST(COALESCE(sum(nk), 0) AS BIGINT) AS tk,
               CAST(COALESCE(sum(f * nk), 0) AS BIGINT) AS tm FROM cells),
ss AS (SELECT s FROM (VALUES (16), (64), (256), (1024)) _s(s)),
sel AS (SELECT ss.s, c2.ma + (ss.s - c2.ka) * c2.f AS hit
        FROM ss JOIN c2 ON c2.ka < ss.s AND ss.s <= c2.ka + c2.nk)
SELECT CAST(ss.s AS BIGINT) AS cache_size,
       CAST(COALESCE(sel.hit, tot.tm) AS BIGINT) AS hit_rows,
       tot.tm AS total_rows,
       CAST((1000000 * COALESCE(sel.hit, tot.tm)) // greatest(tot.tm, 1) AS BIGINT) AS hit_q6
FROM ss LEFT JOIN sel ON sel.s = ss.s CROSS JOIN tot ORDER BY cache_size""",
)
def lfu_cache_hit_curve(spark, sf_dir):
    """Serving-cache sizing curve: the EXACT hit rate an LFU (keep the
    hottest keys) cache of size 16/64/256/1024 would achieve on the
    part-access stream (lineitem rows per partkey) — what cache memory
    buys what hit rate, the capacity-planning number behind every
    hot-set residency decision (the engine's own block/doc caches
    included). Computed with NO per-key global sort: the frequency
    HISTOGRAM's descending prefix sums fund whole frequency bins and
    only the boundary bin contributes a partial s−keys_above slice —
    the quality_budget_select discipline pointed at cache planning.
    Within the boundary bin any key choice gives the same mass (all
    have frequency f), so the curve is choice-free exact.

    Determinism: pure BIGINT bin arithmetic; the containment predicate
    ka < s ≤ ka+nk selects exactly one bin for s ≤ total keys, and
    larger caches COALESCE to total mass.

    Scale shape: per-key counts are one map-combined exchange; the
    prefix windows run over frequency-histogram CELLS only and the
    4-row size spine theta-joins against them broadcast."""
    fr = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    cells = fr.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("nk"))
    w = Window.orderBy(F.col("f").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c2 = cells.select(
        "f",
        "nk",
        F.coalesce(F.sum("nk").over(w), F.lit(0)).cast("long").alias("ka"),
        F.coalesce(F.sum(F.col("f") * F.col("nk")).over(w), F.lit(0))
        .cast("long")
        .alias("ma"),
    )
    tot = cells.agg(
        F.coalesce(F.sum("nk"), F.lit(0)).cast("long").alias("tk"),
        F.coalesce(F.sum(F.col("f") * F.col("nk")), F.lit(0))
        .cast("long")
        .alias("tm"),
    )
    ss = spark.createDataFrame([(16,), (64,), (256,), (1024,)], "s long")
    sel = (
        F.broadcast(ss)
        .join(
            c2,
            (F.col("ka") < F.col("s"))
            & (F.col("s") <= F.col("ka") + F.col("nk")),
        )
        .select("s", (F.col("ma") + (F.col("s") - F.col("ka")) * F.col("f")).alias("hit"))
    )
    return (
        ss.join(sel, "s", "left")
        .crossJoin(tot)
        .select(
            F.col("s").cast("long").alias("cache_size"),
            F.coalesce(F.col("hit"), F.col("tm")).cast("long").alias("hit_rows"),
            F.col("tm").alias("total_rows"),
            F.expr(
                "CAST((1000000 * COALESCE(hit, tm)) div greatest(tm, 1) AS BIGINT)"
            ).alias("hit_q6"),
        )
        .orderBy("cache_size")
    )


# k(k-1)·2^47 for the k=32 k-mins estimator, folded in Python and inlined
# in e-notation (a plain decimal literal is DECIMAL in Spark SQL)
_KMINS_C = repr(float(32 * 31 * (1 << 47)))


@register(
    "kmins_user_estimate",
    f"""WITH h AS (
  SELECT ('0x' || substr(md5('km:' || CAST(user_id AS VARCHAR)), 1, 13))::UBIGINT::BIGINT AS h
  FROM events),
r AS (SELECT h % 32 AS reg, h // 32 AS v FROM h),
c AS (SELECT reg, CAST(min(v) AS BIGINT) AS minv FROM r GROUP BY reg),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_filled,
             CAST(COALESCE(sum(minv), 0) AS BIGINT) AS sv FROM c),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
e AS (
  SELECT n.n_users, a.n_filled,
         CAST(CASE WHEN a.n_filled < 32 THEN n.n_users
              ELSE round({_KMINS_C} / CAST(greatest(a.sv, 1) AS DOUBLE)) END AS BIGINT)
           AS kmins_est
  FROM n, a)
SELECT n_users, n_filled, kmins_est,
       CAST((1000000 * abs(kmins_est - n_users)) // greatest(n_users, 1) AS BIGINT) AS err_q6
FROM e""",
)
def kmins_user_estimate(spark, sf_dir):
    """k-mins (per-register minimum hash) cardinality sketch accuracy
    audit: 32 registers each keep the SMALLEST 47-bit seeded hash value
    routed to them (h % 32 → register, h div 32 → value); NDV ≈
    k(k−1)·2^47 / Σ min — the THIRD cardinality-sketch family beside
    HLL (register max-merge) and KMV (bottom-k). Its reason to exist
    here: unlike KMV, the register-min table IS a running aggregation
    (min-merge, idempotent), so it streams with ≤32 rows of state —
    streaming/events.py:kmins_user_stream maintains the identical table
    and the stream/batch identity is pytest-proven. Under-filled
    sketches (n_filled < 32, the sf0.001 reading) fall back to exact,
    the KMV rule.

    Determinism: register minima are exact BIGINTs, Σ min ≤ 32·2^47
    stays BIGINT; ONE float division against the Python-folded constant
    (e-notation, the _HLL_C rule), then half-away round.

    Scale shape: one map-combined groupBy(reg).min — 32 cells out
    regardless of user cardinality; the exact count is audit-only."""
    from docix_spark.streaming.events import kmins_user_cells

    ev = _events(spark, sf_dir)
    cells = kmins_user_cells(ev)
    a = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_filled"),
        F.coalesce(F.sum("minv"), F.lit(0)).cast("long").alias("sv"),
    )
    n = ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    e = n.crossJoin(a).select(
        "n_users",
        "n_filled",
        F.expr(
            f"CAST(CASE WHEN n_filled < 32 THEN n_users"
            f" ELSE round({_KMINS_C} / CAST(greatest(sv, 1) AS DOUBLE)) END AS BIGINT)"
        ).alias("kmins_est"),
    )
    return e.select(
        "n_users",
        "n_filled",
        "kmins_est",
        F.expr(
            "CAST((1000000 * abs(kmins_est - n_users)) div greatest(n_users, 1) AS BIGINT)"
        ).alias("err_q6"),
    )


@register(
    "sampling_weight_ess",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
w AS (SELECT CAST(round(1000000 * pow(n_tok, 7e-1)) AS BIGINT) // 1000 AS w3 FROM t),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(COALESCE(sum(w3), 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(w3 * w3), 0) AS BIGINT) AS s2,
             CAST(COALESCE(max(w3), 0) AS BIGINT) AS mx
      FROM w)
SELECT n_docs,
       CAST(CASE WHEN s2 = 0 THEN 0
            ELSE round((CAST(s1 AS DOUBLE) * s1) / s2) END AS BIGINT) AS ess_docs,
       CAST(CASE WHEN s2 = 0 THEN 0
            ELSE round(1000000 * (CAST(s1 AS DOUBLE) * s1)
                 / (CAST(n_docs AS DOUBLE) * s2)) END AS BIGINT) AS ess_ratio_q6,
       CAST((1000000 * mx) // greatest(s1, 1) AS BIGINT) AS max_share_q6
FROM a""",
)
def sampling_weight_ess(spark, sf_dir):
    """Effective sample size of the temperature-sampling weights: with
    per-doc weight w = n_tok^0.7 (the temperature_mix_weights exponent
    applied at DOCUMENT grain), ESS = (Σw)²/Σw² is how many
    equally-weighted documents the weighted corpus is WORTH — the
    importance-sampling diagnostic that says whether a weighted epoch
    plan is effectively training on the whole corpus (ESS/n → 1) or on
    a heavy-tailed sliver (ESS/n → 0, with max_share naming the worst
    single-document concentration). The standard pre-flight before
    trusting any weighted sampler (weighted_sample_docs, the epoch
    plans) at scale.

    Determinism: w is q6-rounded per DOC first (pow exponent in
    e-notation), floored to q3 BEFORE the sums so Σw² stays inside the
    2^63 envelope (~1e8 docs, the embedding_norm_outliers rule); the
    two ratios are single float expressions casting from the FIRST
    multiply; max_share is an integer cross-multiplication.

    Scale shape: entirely map-side into one 4-number aggregate."""
    t = _docs(spark, sf_dir).select(
        F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    w = t.select(
        F.expr("CAST(round(1000000 * pow(n_tok, 7e-1)) AS BIGINT) div 1000").alias("w3")
    )
    a = w.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("w3"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("w3") * F.col("w3")), F.lit(0))
        .cast("long")
        .alias("s2"),
        F.coalesce(F.max("w3"), F.lit(0)).cast("long").alias("mx"),
    )
    return a.select(
        "n_docs",
        F.expr(
            "CAST(CASE WHEN s2 = 0 THEN 0"
            " ELSE round((CAST(s1 AS DOUBLE) * s1) / s2) END AS BIGINT)"
        ).alias("ess_docs"),
        F.expr(
            "CAST(CASE WHEN s2 = 0 THEN 0"
            " ELSE round(1000000 * (CAST(s1 AS DOUBLE) * s1)"
            " / (CAST(n_docs AS DOUBLE) * s2)) END AS BIGINT)"
        ).alias("ess_ratio_q6"),
        F.expr("CAST((1000000 * mx) div greatest(s1, 1) AS BIGINT)").alias(
            "max_share_q6"
        ),
    )


# ---------------------------------------------------------------------------
# session 200 — runs test, filter-order advisor, stream-state sizing
# ---------------------------------------------------------------------------

# Wald-Wolfowitz z² from exact per-user integers (n, n1, n2, R) — ONE
# shared float expression string, cast from the FIRST multiply.
_RUNS_Z2 = (
    "round(1000000 * "
    "((R - 1.0 - (CAST(2 * n1 AS DOUBLE) * n2) / n)"
    " * (R - 1.0 - (CAST(2 * n1 AS DOUBLE) * n2) / n))"
    " / ((CAST(2 * n1 * n2 AS DOUBLE) * (2 * n1 * n2 - n))"
    " / ((CAST(n AS DOUBLE) * n) * (n - 1))))"
)


@register(
    "user_runs_test",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS mk
  FROM events),
lg AS (
  SELECT user_id, mk,
         lag(mk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pm
  FROM e),
u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(mk) AS BIGINT) AS n1,
         CAST(count(*) - sum(mk) AS BIGINT) AS n2,
         CAST(1 + COALESCE(sum(CASE WHEN pm IS NOT NULL AND mk <> pm
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS R
  FROM lg GROUP BY user_id),
t AS (SELECT * FROM u WHERE n1 >= 1 AND n2 >= 1),
z AS (SELECT CAST({_RUNS_Z2} AS BIGINT) AS z2_q6
      FROM t WHERE 2 * n1 * n2 > n)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_tested,
       (SELECT CAST(COALESCE(sum(CASE WHEN n * R < n + 2 * n1 * n2 THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM t) AS n_blocky,
       (SELECT CAST(COALESCE(sum(CASE WHEN n * R > n + 2 * n1 * n2 THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM t) AS n_alternating,
       (SELECT CAST(count(*) AS BIGINT) FROM z) AS n_scored,
       (SELECT CAST(COALESCE(sum(z2_q6), 0) // greatest(count(*), 1) AS BIGINT) FROM z)
         AS mean_z2_q6""",
)
def user_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on each user's event sequence, marked
    purchase vs everything else: do purchases CLUSTER in bursts (fewer
    runs than the 1 + 2·n1·n2/n expectation — 'blocky', binge-buying /
    batch writes) or ALTERNATE more than chance (periodic cart
    behavior)? Completes the inference family (KS, Mann-Whitney,
    t-test, chi², ANOVA) with the SEQUENCE-randomness test none of the
    others sees — they all treat the event stream as an exchangeable
    bag. Blocky/alternating classification is the exact integer
    comparison n·R vs n + 2·n1·n2; the z² summary averages the exact
    per-user statistic over users where its variance is positive
    (2·n1·n2 > n, the textbook condition).

    Determinism: equal-timestamp events order by event_id in the lag
    (the interevent rule); z² is ONE shared float expression over exact
    BIGINTs, q6-rounded per USER first, mean = BIGINT sum // count.

    Scale shape: ONE user-keyed lag window (the sessionization
    exchange), then per-user 4-number rows roll up map-side."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        "event_id",
        F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END").alias("mk"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lg = e.select("user_id", "mk", F.lag("mk").over(w).alias("pm"))
    u = lg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mk").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("mk")).cast("long").alias("n2"),
        (
            F.lit(1)
            + F.coalesce(
                F.sum(
                    F.when(
                        F.col("pm").isNotNull() & (F.col("mk") != F.col("pm")),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("R"),
    )
    t = u.where((F.col("n1") >= 1) & (F.col("n2") >= 1)).localCheckpoint()
    z = t.where(F.expr("2 * n1 * n2 > n")).select(
        F.expr(f"CAST({_RUNS_Z2} AS BIGINT)").alias("z2_q6")
    )
    tested = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_tested"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN n * R < n + 2 * n1 * n2 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_blocky"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN n * R > n + 2 * n1 * n2 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_alternating"),
    )
    zz = z.agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.expr(
            "CAST(COALESCE(sum(z2_q6), 0) div greatest(count(*), 1) AS BIGINT)"
        ).alias("mean_z2_q6"),
    )
    return tested.crossJoin(zz)


_FOA_PERMS = [
    ("ABC", "na", "nab"), ("ACB", "na", "nac"),
    ("BAC", "nb", "nab"), ("BCA", "nb", "nbc"),
    ("CAB", "nc", "nac"), ("CBA", "nc", "nbc"),
]


@register(
    "filter_order_advisor",
    f"""WITH tf AS ({SQL_TF}),
s AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM tf GROUP BY doc_id),
g AS (
  SELECT CASE WHEN s.n_tok >= 8 THEN 1 ELSE 0 END AS a,
         CASE WHEN 5 * s.n_distinct >= 2 * s.n_tok THEN 1 ELSE 0 END AS b,
         CASE WHEN d.lang <> 'zh' THEN 1 ELSE 0 END AS c
  FROM s JOIN documents d USING (doc_id)),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(COALESCE(sum(a), 0) AS BIGINT) AS na,
         CAST(COALESCE(sum(b), 0) AS BIGINT) AS nb,
         CAST(COALESCE(sum(c), 0) AS BIGINT) AS nc,
         CAST(COALESCE(sum(a * b), 0) AS BIGINT) AS nab,
         CAST(COALESCE(sum(a * c), 0) AS BIGINT) AS nac,
         CAST(COALESCE(sum(b * c), 0) AS BIGINT) AS nbc
  FROM g)
SELECT perm, actual_cost, indep_cost, actual_cost - indep_cost AS err_rows
FROM (
  SELECT 'ABC' AS perm, n + na + nab AS actual_cost,
         n + na + (na * nb) // greatest(n, 1) AS indep_cost FROM m
  UNION ALL SELECT 'ACB', n + na + nac, n + na + (na * nc) // greatest(n, 1) FROM m
  UNION ALL SELECT 'BAC', n + nb + nab, n + nb + (nb * na) // greatest(n, 1) FROM m
  UNION ALL SELECT 'BCA', n + nb + nbc, n + nb + (nb * nc) // greatest(n, 1) FROM m
  UNION ALL SELECT 'CAB', n + nc + nac, n + nc + (nc * na) // greatest(n, 1) FROM m
  UNION ALL SELECT 'CBA', n + nc + nbc, n + nc + (nc * nb) // greatest(n, 1) FROM m
) ORDER BY perm""",
)
def filter_order_advisor(spark, sf_dir):
    """Predicate-ordering advisor — the classic optimizer decision made
    measurable: three independent quality gates (A: length ≥ 8 tokens,
    B: the training-mix TTR gate 5·distinct ≥ 2·tokens, C: lang ≠ 'zh')
    can cascade in 6 orders; rows examined = n + pass(first) +
    pass(first two). The ACTUAL cost uses the measured pairwise pass
    counts (gate correlation included); the INDEPENDENCE estimate uses
    only marginal selectivities (p1·p2/n) — their gap is exactly the
    correlation an optimizer's independence assumption gets wrong
    (the row-count side of join_size_estimates' NDV story, applied to
    predicate pushdown order).

    Determinism: everything is conditional BIGINT sums off ONE 7-number
    aggregate; the independence product uses floor division,
    documented.

    Scale shape: one tokenize → per-doc stats → a single map-side
    7-counter agg; the 6 output rows are constructed FROM that one row
    (Spark: a 6-element stack over the broadcast scalar row — the
    adjacency_matrix_agg rule; the oracle UNION-ALLs per perm, fine for
    DuckDB, never for Spark)."""
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
    )
    stack = ", ".join(
        f"'{p}', n + {p1} + {p12},"
        f" n + {p1} + ({p1} * {m2}) div greatest(n, 1)"
        for (p, p1, p12), m2 in zip(
            _FOA_PERMS, ["nb", "nc", "na", "nc", "na", "nb"]
        )
    )
    return (
        m.select(
            F.expr(
                f"stack(6, {stack}) AS (perm, actual_cost, indep_cost)"
            )
        )
        .select(
            "perm",
            "actual_cost",
            "indep_cost",
            (F.col("actual_cost") - F.col("indep_cost")).alias("err_rows"),
        )
        .orderBy("perm")
    )


@register(
    "stream_state_size_curve",
    """WITH e AS (
  SELECT epoch_us(ts) // 60000000 AS minute
  FROM events WHERE event_type IN ('view', 'click')),
c AS (SELECT minute, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY minute),
w AS (
  SELECT minute, n,
         CAST(sum(n) OVER (ORDER BY minute
           RANGE BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS s10,
         CAST(sum(n) OVER (ORDER BY minute
           RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS BIGINT) AS s60,
         CAST(sum(n) OVER (ORDER BY minute
           RANGE BETWEEN 359 PRECEDING AND CURRENT ROW) AS BIGINT) AS s360
  FROM c)
SELECT w_minutes, max_state_rows, total_rows,
       CAST((1000000 * max_state_rows) // greatest(total_rows, 1) AS BIGINT)
         AS peak_share_q6
FROM (
  SELECT CAST(10 AS BIGINT) AS w_minutes,
         CAST(COALESCE(max(s10), 0) AS BIGINT) AS max_state_rows,
         CAST(COALESCE(sum(n), 0) AS BIGINT) AS total_rows FROM w
  UNION ALL
  SELECT 60, CAST(COALESCE(max(s60), 0) AS BIGINT),
         CAST(COALESCE(sum(n), 0) AS BIGINT) FROM w
  UNION ALL
  SELECT 360, CAST(COALESCE(max(s360), 0) AS BIGINT),
         CAST(COALESCE(sum(n), 0) AS BIGINT) FROM w
) ORDER BY w_minutes""",
)
def stream_state_size_curve(spark, sf_dir):
    """Stream-stream join state sizing: the view⋈click funnel join holds
    BOTH sides' rows for the watermark window, so its state at time t is
    the arrival count in (t−W, t] — this op reports the PEAK of that
    sliding count for W = 10/60/360 minutes, the number that decides
    executor memory for Spark's streaming joins (state grows linearly
    in W; the curve prices each watermark-relaxation step). The peak of
    a trailing count is always attained at an arrival minute (state
    only decays between arrivals), so the maximum over observed minute
    CELLS is exact — no spine fill needed.

    Determinism: integer minute keys; RANGE window frames (value-based,
    so calendar gaps expire correctly — a ROWS frame over sparse cells
    would silently widen the window across gaps, the
    events_daily_envelope contrast); exact BIGINT sums and maxima.

    Scale shape: arrivals collapse map-side to per-minute cells; the
    three RANGE windows share ONE sort over cells (calendar-bounded
    rows); the 3-row rollup is map-side."""
    e = _events(spark, sf_dir).where(
        F.col("event_type").isin("view", "click")
    ).select(
        F.expr("unix_micros(cast(ts as timestamp)) div 60000000").alias("minute")
    )
    c = e.groupBy("minute").agg(F.count(F.lit(1)).cast("long").alias("n"))

    def _frame(back):
        return (
            Window.orderBy("minute").rangeBetween(-back, 0)
        )

    w = c.select(
        "minute",
        "n",
        F.sum("n").over(_frame(9)).cast("long").alias("s10"),
        F.sum("n").over(_frame(59)).cast("long").alias("s60"),
        F.sum("n").over(_frame(359)).cast("long").alias("s360"),
    ).localCheckpoint()  # three per-W rollups consume it
    rows = []
    for wm, col in [(10, "s10"), (60, "s60"), (360, "s360")]:
        rows.append(
            w.agg(
                F.coalesce(F.max(col), F.lit(0)).cast("long").alias("max_state_rows"),
                F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("total_rows"),
            ).select(
                F.lit(wm).cast("long").alias("w_minutes"),
                "max_state_rows",
                "total_rows",
            )
        )
    out = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return out.select(
        "w_minutes",
        "max_state_rows",
        "total_rows",
        F.expr(
            "CAST((1000000 * max_state_rows) div greatest(total_rows, 1) AS BIGINT)"
        ).alias("peak_share_q6"),
    ).orderBy("w_minutes")


# ---------------------------------------------------------------------------
# session 201 — Fellegi-Sunter linkage weights, SPRT curve, exchange sizing
# ---------------------------------------------------------------------------


def _fs_weights(ma: str, ua: str) -> tuple[str, str]:
    """Fellegi-Sunter agreement/disagreement weights ln(m/u) with +1
    smoothing as TWO shared float expressions over exact integer counts
    (nm, nu in scope) — cast from the FIRST multiply; per-feature
    placeholders substituted by name so chained features can't collide
    (the _sb_nlp rule)."""
    agree = (
        f"CAST(round(1000000 * ln((CAST({ma} + 1 AS DOUBLE) * (nu + 2))"
        f" / (CAST(nm + 2 AS DOUBLE) * ({ua} + 1)))) AS BIGINT)"
    )
    disagree = (
        f"CAST(round(1000000 * ln((CAST(nm + 1 - {ma} AS DOUBLE) * (nu + 2))"
        f" / (CAST(nm + 2 AS DOUBLE) * (nu + 1 - {ua})))) AS BIGINT)"
    )
    return agree, disagree


@register(
    "linkage_mu_weights",
    _SQL_LSH_PAIRS
    + f""",
at AS (SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS nc, md5(text) AS hh
       FROM documents),
pf AS (
  SELECT CASE WHEN x.hh = y.hh THEN 1 ELSE 0 END AS is_match,
         CASE WHEN x.source = y.source THEN 1 ELSE 0 END AS fs,
         CASE WHEN 10 * abs(x.nc - y.nc) <= greatest(x.nc, y.nc) THEN 1 ELSE 0 END AS fl,
         CASE WHEN x.lang = y.lang THEN 1 ELSE 0 END AS fg
  FROM pairs p JOIN at x ON x.doc_id = p.doc_a JOIN at y ON y.doc_id = p.doc_b),
m AS (
  SELECT CAST(COALESCE(sum(is_match), 0) AS BIGINT) AS nm,
         CAST(COALESCE(sum(1 - is_match), 0) AS BIGINT) AS nu,
         CAST(COALESCE(sum(is_match * fs), 0) AS BIGINT) AS ms,
         CAST(COALESCE(sum((1 - is_match) * fs), 0) AS BIGINT) AS us,
         CAST(COALESCE(sum(is_match * fl), 0) AS BIGINT) AS ml,
         CAST(COALESCE(sum((1 - is_match) * fl), 0) AS BIGINT) AS ul,
         CAST(COALESCE(sum(is_match * fg), 0) AS BIGINT) AS mg,
         CAST(COALESCE(sum((1 - is_match) * fg), 0) AS BIGINT) AS ug
  FROM pf)
SELECT feature, n_match, n_match_agree, n_nonmatch, n_nonmatch_agree,
       w_agree_q6, w_disagree_q6
FROM (
  SELECT 'lang_same' AS feature, nm AS n_match, mg AS n_match_agree,
         nu AS n_nonmatch, ug AS n_nonmatch_agree,
         {_fs_weights('mg', 'ug')[0]} AS w_agree_q6,
         {_fs_weights('mg', 'ug')[1]} AS w_disagree_q6 FROM m
  UNION ALL
  SELECT 'len_close', nm, ml, nu, ul,
         {_fs_weights('ml', 'ul')[0]}, {_fs_weights('ml', 'ul')[1]} FROM m
  UNION ALL
  SELECT 'source_same', nm, ms, nu, us,
         {_fs_weights('ms', 'us')[0]}, {_fs_weights('ms', 'us')[1]} FROM m
) ORDER BY feature""",
)
def linkage_mu_weights(spark, sf_dir):
    """Fellegi-Sunter probabilistic record linkage, trained on the
    engine's own dedup signals: over the MinHash-LSH candidate pairs,
    exact-duplicate membership (md5 equality) is the match label and
    three cheap comparators (same source, character lengths within 10%,
    same lang) get their m = P(agree|match) and u = P(agree|non-match)
    estimated from the counts — the log ratio ln(m/u) IS the classic
    linkage weight (+1 smoothing, since a perfect comparator has
    u = 0). The weights turn ad-hoc blocking heuristics into a
    calibrated match score; features whose agree/disagree weights
    straddle 0 widely are the informative ones (the supervised
    completion of blocking_strategy_compare, which scores candidate
    GENERATORS — this scores the comparators applied after blocking).

    Determinism: all counts are conditional BIGINT sums off ONE
    8-counter aggregate; the four weights per feature are shared float
    expressions (cast from the first multiply) q6-rounded.

    Scale shape: the candidate pairs come from the memoized LSH edge
    front half; doc attributes join on doc_id (un-hinted — corpus-sized
    at scale); one map-side aggregate, 3 output rows stacked from it
    (Spark stack; the oracle UNION-ALLs, fine for DuckDB only)."""
    pairs = _lsh_pair_edges(spark, sf_dir).where(F.col("src") < F.col("dst"))
    at = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("nc"),
        F.md5("text").alias("hh"),
    )
    x = at.alias("x")
    y = at.alias("y")
    pf = (
        pairs.join(x, F.col("src") == F.col("x.doc_id"))
        .join(y, F.col("dst") == F.col("y.doc_id"))
        .select(
            F.expr("CASE WHEN x.hh = y.hh THEN 1 ELSE 0 END").alias("is_match"),
            F.expr("CASE WHEN x.source = y.source THEN 1 ELSE 0 END").alias("fs"),
            F.expr(
                "CASE WHEN 10 * abs(x.nc - y.nc) <= greatest(x.nc, y.nc)"
                " THEN 1 ELSE 0 END"
            ).alias("fl"),
            F.expr("CASE WHEN x.lang = y.lang THEN 1 ELSE 0 END").alias("fg"),
        )
    )
    m = pf.agg(
        F.coalesce(F.sum("is_match"), F.lit(0)).cast("long").alias("nm"),
        F.coalesce(F.sum(F.lit(1) - F.col("is_match")), F.lit(0))
        .cast("long")
        .alias("nu"),
        F.coalesce(F.sum(F.col("is_match") * F.col("fs")), F.lit(0))
        .cast("long")
        .alias("ms"),
        F.coalesce(F.sum((F.lit(1) - F.col("is_match")) * F.col("fs")), F.lit(0))
        .cast("long")
        .alias("us"),
        F.coalesce(F.sum(F.col("is_match") * F.col("fl")), F.lit(0))
        .cast("long")
        .alias("ml"),
        F.coalesce(F.sum((F.lit(1) - F.col("is_match")) * F.col("fl")), F.lit(0))
        .cast("long")
        .alias("ul"),
        F.coalesce(F.sum(F.col("is_match") * F.col("fg")), F.lit(0))
        .cast("long")
        .alias("mg"),
        F.coalesce(F.sum((F.lit(1) - F.col("is_match")) * F.col("fg")), F.lit(0))
        .cast("long")
        .alias("ug"),
    )
    cells = []
    for name, ma, ua in [
        ("lang_same", "mg", "ug"),
        ("len_close", "ml", "ul"),
        ("source_same", "ms", "us"),
    ]:
        wa, wd = _fs_weights(ma, ua)
        cells.append(f"'{name}', nm, {ma}, nu, {ua}, {wa}, {wd}")
    return (
        m.select(
            F.expr(
                f"stack(3, {', '.join(cells)}) AS (feature, n_match,"
                " n_match_agree, n_nonmatch, n_nonmatch_agree,"
                " w_agree_q6, w_disagree_q6)"
            )
        )
        .orderBy("feature")
    )


# SPRT constants folded in Python (the ndcg integer-fold rule):
# per-observation LLR magnitude for symmetric H0 p=0.45 vs H1 p=0.55,
# and the alpha=beta=0.05 decision boundary ln(19).
_SPRT_C = 200671  # round(1e6 * ln(0.55/0.45))
_SPRT_B = 2944439  # round(1e6 * ln(19))


@register(
    "ab_sprt_curve",
    f"""WITH u AS (
  SELECT user_id,
         min(epoch_us(ts)) AS first_us,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
  FROM events GROUP BY user_id),
r AS (
  SELECT seq, cumc FROM (
    SELECT row_number() OVER (ORDER BY first_us, user_id) AS seq,
           CAST(sum(conv) OVER (ORDER BY first_us, user_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumc
    FROM u) _w)
SELECT CAST(seq AS BIGINT) AS seq, cumc AS cum_converted,
       CAST((2 * cumc - seq) * {_SPRT_C} AS BIGINT) AS cum_llr_q6,
       CASE WHEN (2 * cumc - seq) * {_SPRT_C} >= {_SPRT_B} THEN 'accept_h1'
            WHEN (2 * cumc - seq) * {_SPRT_C} <= -{_SPRT_B} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM r ORDER BY seq""",
)
def ab_sprt_curve(spark, sf_dir):
    """Wald's sequential probability ratio test on user conversion, in
    user-ARRIVAL order: H0 p=0.45 vs H1 p=0.55 (symmetric, so the
    cumulative log-likelihood ratio is EXACTLY (2·converted − n)·c with
    c = ln(.55/.45) folded once to a q6 integer — the whole curve is
    integer arithmetic). Each row is the state after the n-th user
    arrived, with the α=β=0.05 decision (±ln 19): the sequential-
    analysis member of the A/B family — ab_significance tests at a
    FIXED n, ab_power_table sizes that n in advance, this is the test
    that is valid to PEEK at after every user, the thing naive repeated
    z-testing is not.

    Determinism: arrival order is (first event time, user_id); per-user
    conversion is a max-flag; the LLR and boundaries are exact BIGINTs.

    Scale shape: ONE user-keyed exchange for the per-user min/max aggs;
    the rank and running-sum windows share one sort over the per-user
    3-column table (users ≪ events; at corpus scale the sequence index
    takes the global_row_ids sub-shard form, documented)."""
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.expr("min(unix_micros(cast(ts as timestamp)))").alias("first_us"),
        F.max(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("conv"),
    )
    w = Window.orderBy("first_us", "user_id")
    r = u.select(
        F.row_number().over(w).cast("long").alias("seq"),
        F.sum("conv")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cumc"),
    )
    return r.select(
        "seq",
        F.col("cumc").alias("cum_converted"),
        F.expr(f"CAST((2 * cumc - seq) * {_SPRT_C} AS BIGINT)").alias("cum_llr_q6"),
        F.expr(
            f"CASE WHEN (2 * cumc - seq) * {_SPRT_C} >= {_SPRT_B} THEN 'accept_h1'"
            f" WHEN (2 * cumc - seq) * {_SPRT_C} <= -{_SPRT_B} THEN 'accept_h0'"
            f" ELSE 'continue' END"
        ).alias("decision"),
    ).orderBy("seq")


@register(
    "exchange_volume_board",
    f"""WITH tf AS ({SQL_TF}),
t1 AS (SELECT CAST(COALESCE(sum(tf), 0) AS BIGINT) AS rows_in,
              CAST(count(*) AS BIGINT) AS rows_shuffled,
              CAST(COALESCE(sum(20 + length(term)), 0) AS BIGINT) AS est_bytes
       FROM tf),
t2 AS (SELECT CAST(count(*) AS BIGINT) AS rows_in,
              CAST(count(*) AS BIGINT) AS rows_shuffled,
              CAST(24 * count(*) AS BIGINT) AS est_bytes FROM lineitem),
s3 AS (SELECT source, CAST(count(*) AS BIGINT) AS nr FROM documents GROUP BY source),
t3 AS (SELECT CAST(COALESCE(sum(nr), 0) AS BIGINT) AS rows_in,
              CAST(count(*) AS BIGINT) AS rows_shuffled,
              CAST(COALESCE(sum(length(source) + 12), 0) AS BIGINT) AS est_bytes
       FROM s3)
SELECT exchange, rows_in, rows_shuffled, est_bytes,
       CAST((1000000 * rows_shuffled) // greatest(rows_in, 1) AS BIGINT)
         AS reduction_q6
FROM (
  SELECT 'docs_to_source_agg' AS exchange, rows_in, rows_shuffled, est_bytes FROM t3
  UNION ALL
  SELECT 'lineitem_to_orders_join', rows_in, rows_shuffled, est_bytes FROM t2
  UNION ALL
  SELECT 'tokens_to_tf', rows_in, rows_shuffled, est_bytes FROM t1
) ORDER BY exchange""",
)
def exchange_volume_board(spark, sf_dir):
    """Shuffle-volume sizing board for the engine's three exchange
    archetypes, using the broadcast_threshold_audit byte model: (1) the
    tokenize→tf aggregation — map-side combine shrinks token
    occurrences to distinct (doc,term) cells BEFORE the wire, so
    rows_shuffled/rows_in is the partial-agg reduction factor; (2) the
    lineitem→orders FK join — joins cannot combine, every projected
    fact row crosses the wire (8 B key + 16 B payload, the Q5
    projection); (3) the docs→source rollup — low-cardinality partial
    agg, near-total reduction. The board is the quantified version of
    'minimize shuffles': it prices each exchange in rows AND bytes so
    the costliest wire is named before any plan change (the network
    sibling of join_size_estimates' cardinality story and
    fact_key_skew_census's balance story).

    Determinism: exact counts and length sums; one floor division.

    Scale shape: three independent map-side aggregates — the board
    itself shuffles nothing beyond the tf table's own exchange."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    t1 = tf.agg(
        F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("rows_in"),
        F.count(F.lit(1)).cast("long").alias("rows_shuffled"),
        F.coalesce(F.sum(F.lit(20) + F.length("term")), F.lit(0))
        .cast("long")
        .alias("est_bytes"),
    ).select(F.lit("tokens_to_tf").alias("exchange"), "rows_in", "rows_shuffled", "est_bytes")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t2 = li.agg(
        F.count(F.lit(1)).cast("long").alias("rows_in"),
        F.count(F.lit(1)).cast("long").alias("rows_shuffled"),
        (F.lit(24) * F.count(F.lit(1))).cast("long").alias("est_bytes"),
    ).select(
        F.lit("lineitem_to_orders_join").alias("exchange"),
        "rows_in",
        "rows_shuffled",
        "est_bytes",
    )
    s3 = _docs(spark, sf_dir).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nr")
    )
    t3 = s3.agg(
        F.coalesce(F.sum("nr"), F.lit(0)).cast("long").alias("rows_in"),
        F.count(F.lit(1)).cast("long").alias("rows_shuffled"),
        F.coalesce(F.sum(F.length("source") + F.lit(12)), F.lit(0))
        .cast("long")
        .alias("est_bytes"),
    ).select(
        F.lit("docs_to_source_agg").alias("exchange"),
        "rows_in",
        "rows_shuffled",
        "est_bytes",
    )
    return (
        t3.unionByName(t2)
        .unionByName(t1)
        .select(
            "exchange",
            "rows_in",
            "rows_shuffled",
            "est_bytes",
            F.expr(
                "CAST((1000000 * rows_shuffled) div greatest(rows_in, 1) AS BIGINT)"
            ).alias("reduction_q6"),
        )
        .orderBy("exchange")
    )


# ---------------------------------------------------------------------------
# session 202 — minhash collision calibration, Theil-Sen trend, storage tiers
# ---------------------------------------------------------------------------

# per-pair 2-rows-2-bands collision theory 1 - (1 - J^2)^2 from exact
# integer (inter, un) — ONE shared double expression, j2 inlined twice
_MHC_J2 = "((CAST(inter AS DOUBLE) * inter) / (CAST(un AS DOUBLE) * un))"
_MHC_TH = (
    f"CAST(round(1000000 * (1 - (1 - {_MHC_J2}) * (1 - {_MHC_J2}))) AS BIGINT)"
)


@register(
    "minhash_collision_calibration",
    _SQL_LSH_PAIRS
    + f""",
ss AS (SELECT doc_id, CAST(count(DISTINCT sh) AS BIGINT) AS ns FROM sh GROUP BY doc_id),
ip AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pj AS (
  SELECT ip.inter, sa.ns + sb.ns - ip.inter AS un,
         CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_cand
  FROM ip
  JOIN ss sa ON sa.doc_id = ip.da
  JOIN ss sb ON sb.doc_id = ip.db
  LEFT JOIN pairs p ON p.doc_a = ip.da AND p.doc_b = ip.db),
dd AS (
  SELECT least(9, (10 * inter) // un) AS dec, is_cand,
         {_MHC_TH} AS th_q6
  FROM pj),
r AS (
  SELECT dec, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(COALESCE(sum(is_cand), 0) AS BIGINT) AS n_cand,
         CAST(COALESCE(sum(th_q6), 0) AS BIGINT) AS th_sum
  FROM dd GROUP BY dec),
spine AS (SELECT unnest(generate_series(0, 9)) AS dec)
SELECT CAST(spine.dec AS BIGINT) AS j_decile,
       CAST(COALESCE(r.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(r.n_cand, 0) AS BIGINT) AS n_candidates,
       CAST((1000000 * COALESCE(r.n_cand, 0)) // greatest(COALESCE(r.n_pairs, 0), 1)
            AS BIGINT) AS empirical_q6,
       CAST(COALESCE(r.th_sum, 0) // greatest(COALESCE(r.n_pairs, 0), 1) AS BIGINT)
         AS theory_q6
FROM spine LEFT JOIN r ON r.dec = spine.dec ORDER BY j_decile""",
)
def minhash_collision_calibration(spark, sf_dir):
    """MinHash-LSH calibration curve — the banded-collision probability
    as a function of TRUE Jaccard, empirical vs the textbook
    1 − (1 − J^r)^b (r=2 rows/band, b=2 bands, the engine's own band
    construction): over the shingle-blocked pair universe (every pair
    sharing ≥1 shingle — exact J computable there, and pairs outside it
    have J=0), bucket by J decile and report the observed candidate
    rate next to the mean theoretical collision probability. The
    minhash twin of signlsh_calibration_curve: deviations price what 4
    correlated salt-permutations give up versus the idealized
    independent-permutation S-curve, and the decile where empirical
    crosses ~50% IS the sketch's effective threshold
    (lsh_candidate_precision/recall report single points; this is the
    whole curve).

    Determinism: J deciles are integer cross-multiplications; per-pair
    theory is ONE shared double expression q6-rounded FIRST, means are
    BIGINT sums with one floor division; the 10-row spine keeps empty
    deciles reporting.

    Scale shape: the truth join blocks on shingle equality (never
    all-pairs), candidates come from the memoized LSH edge table, and
    the decile rollup is map-side."""
    sh = _shingles_spark(spark, sf_dir).select("doc_id", "sh").distinct().localCheckpoint()
    ss = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("ns"))
    a = sh.alias("a")
    b = sh.alias("b")
    ip = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    cand = (
        _lsh_pair_edges(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("ca"), F.col("dst").alias("cb"))
        .withColumn("flag", F.lit(1))
    )
    pj = (
        ip.join(ss.select(F.col("doc_id").alias("da"), F.col("ns").alias("nsa")), "da")
        .join(ss.select(F.col("doc_id").alias("db"), F.col("ns").alias("nsb")), "db")
        .join(
            cand,
            (F.col("da") == F.col("ca")) & (F.col("db") == F.col("cb")),
            "left",
        )
        .select(
            "inter",
            (F.col("nsa") + F.col("nsb") - F.col("inter")).alias("un"),
            F.coalesce("flag", F.lit(0)).alias("is_cand"),
        )
    )
    dd = pj.select(
        F.expr("least(9, (10 * inter) div un)").alias("dec"),
        "is_cand",
        F.expr(_MHC_TH).alias("th_q6"),
    )
    r = dd.groupBy("dec").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum("is_cand"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.sum("th_q6"), F.lit(0)).cast("long").alias("th_sum"),
    )
    spine = spark.createDataFrame([(i,) for i in range(10)], "dec long")
    return (
        spine.join(r, "dec", "left")
        .select(
            F.col("dec").cast("long").alias("j_decile"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_cand", F.lit(0)).cast("long").alias("n_candidates"),
            F.expr(
                "CAST((1000000 * COALESCE(n_cand, 0))"
                " div greatest(COALESCE(n_pairs, 0), 1) AS BIGINT)"
            ).alias("empirical_q6"),
            F.expr(
                "CAST(COALESCE(th_sum, 0) div greatest(COALESCE(n_pairs, 0), 1)"
                " AS BIGINT)"
            ).alias("theory_q6"),
        )
        .orderBy("j_decile")
    )


@register(
    "theil_sen_daily_trend",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
sl AS (
  SELECT CAST((1000000 * (f2.n - f1.n)) // (f2.day_num - f1.day_num) AS BIGINT) AS s_q6
  FROM f f1 JOIN f f2 ON f2.day_num > f1.day_num),
hist AS (SELECT s_q6, CAST(count(*) AS BIGINT) AS cnt FROM sl GROUP BY s_q6),
h AS (
  SELECT s_q6, cnt,
         CAST(COALESCE(sum(cnt) OVER (ORDER BY s_q6
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         CAST(sum(cnt) OVER () AS BIGINT) AS np
  FROM hist),
med AS (
  SELECT CAST(COALESCE(max(np), 0) AS BIGINT) AS np,
         max(CASE WHEN 2 * cb <= np - 1 THEN s_q6 END) AS v_lo,
         max(CASE WHEN 2 * cb <= np THEN s_q6 END) AS v_hi
  FROM h),
sg AS (
  SELECT CAST(COALESCE(sum(CASE WHEN s_q6 > 0 THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_pos,
         CAST(COALESCE(sum(CASE WHEN s_q6 < 0 THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_neg,
         CAST(COALESCE(sum(CASE WHEN s_q6 = 0 THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_zero
  FROM h)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_days,
       med.np AS n_pairs,
       CAST(COALESCE(round((v_lo + v_hi) / 2.0), 0) AS BIGINT) AS ts_slope_q6,
       sg.n_pos AS n_pos_slopes, sg.n_neg AS n_neg_slopes, sg.n_zero AS n_zero_slopes
FROM med, sg""",
)
def theil_sen_daily_trend(spark, sf_dir):
    """Theil-Sen robust trend of daily event volume: the MEDIAN of all
    pairwise day-to-day slopes over the zero-filled calendar spine —
    the robust-regression completion of the family (MAD = robust
    spread, winsorized mean = robust location, bootstrap = robust CI;
    daily_revenue_trend's OLS slope moves arbitrarily far under one
    outage day, Theil-Sen tolerates ~29% corruption). The sign census
    (positive/negative/zero pairwise slopes) is Kendall's S statistic
    for free — direction evidence independent of magnitude.

    Determinism: slopes are quantized to q6 by truncating integer
    division FIRST (both engines truncate toward zero, the session-105
    verified rule — negative slopes included), so the median runs over
    exact integers; the median of n values is (v@⌊(n−1)/2⌋ +
    v@⌈(n−1)/2⌉)/2 via the histogram cum-before probes (2·cb ≤ n∓1),
    one shared float rounding.

    Scale shape: the day×day pair join is CALENDAR-bounded (the
    half_mass_window argument — ~10^5 pairs for a year, independent of
    corpus size); the median machinery runs over slope-histogram
    cells."""
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
    f = (
        spine.join(d, "day_num", "left")
        .select("day_num", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .localCheckpoint()  # pair join consumes it twice + the day count
    )
    f1 = f.select(F.col("day_num").alias("d1"), F.col("n").alias("n1"))
    f2 = f.select(F.col("day_num").alias("d2"), F.col("n").alias("n2"))
    sl = f1.join(f2, F.col("d2") > F.col("d1")).select(
        F.expr("CAST((1000000 * (n2 - n1)) div (d2 - d1) AS BIGINT)").alias("s_q6")
    )
    hist = sl.groupBy("s_q6").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cb = Window.orderBy("s_q6").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "s_q6",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cb), F.lit(0)).cast("long").alias("cb"),
        F.sum("cnt").over(w_all).cast("long").alias("np"),
    ).localCheckpoint()  # median probes + sign census
    med = h.agg(
        F.coalesce(F.max("np"), F.lit(0)).cast("long").alias("np"),
        F.max(F.when(F.expr("2 * cb <= np - 1"), F.col("s_q6"))).alias("v_lo"),
        F.max(F.when(F.expr("2 * cb <= np"), F.col("s_q6"))).alias("v_hi"),
    )
    sg = h.agg(
        F.coalesce(F.sum(F.when(F.col("s_q6") > 0, F.col("cnt")).otherwise(F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_pos"),
        F.coalesce(F.sum(F.when(F.col("s_q6") < 0, F.col("cnt")).otherwise(F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_neg"),
        F.coalesce(F.sum(F.when(F.col("s_q6") == 0, F.col("cnt")).otherwise(F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_zero"),
    )
    nd = f.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return nd.crossJoin(med).crossJoin(sg).select(
        "n_days",
        F.col("np").alias("n_pairs"),
        F.expr("CAST(COALESCE(round((v_lo + v_hi) / 2.0), 0) AS BIGINT)").alias(
            "ts_slope_q6"
        ),
        F.col("n_pos").alias("n_pos_slopes"),
        F.col("n_neg").alias("n_neg_slopes"),
        F.col("n_zero").alias("n_zero_slopes"),
    )


@register(
    "storage_tier_advisor",
    """WITH li AS (
  SELECT epoch_us(l_shipdate) // 86400000000 AS sd,
         CAST(72 + length(l_returnflag) + 4 + length(l_linestatus) + 4 AS BIGINT)
           AS row_bytes
  FROM lineitem),
mx AS (SELECT CAST(max(sd) AS BIGINT) AS mxd FROM li),
t AS (
  SELECT CASE WHEN mx.mxd - li.sd < 30 THEN 'a_hot'
              WHEN mx.mxd - li.sd < 90 THEN 'b_warm'
              WHEN mx.mxd - li.sd < 180 THEN 'c_cool'
              ELSE 'd_cold' END AS tier,
         row_bytes
  FROM li, mx),
r AS (SELECT tier, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(COALESCE(sum(row_bytes), 0) AS BIGINT) AS est_bytes
      FROM t GROUP BY tier),
tot AS (SELECT CAST(COALESCE(sum(n_rows), 0) AS BIGINT) AS tn FROM r),
spine AS (SELECT tier FROM (VALUES ('a_hot'), ('b_warm'), ('c_cool'), ('d_cold')) _t(tier))
SELECT spine.tier AS tier,
       CAST(COALESCE(r.n_rows, 0) AS BIGINT) AS n_rows,
       CAST(COALESCE(r.est_bytes, 0) AS BIGINT) AS est_bytes,
       CAST((1000000 * COALESCE(r.n_rows, 0)) // greatest(tot.tn, 1) AS BIGINT)
         AS row_share_q6
FROM spine LEFT JOIN r ON r.tier = spine.tier CROSS JOIN tot ORDER BY spine.tier""",
)
def storage_tier_advisor(spark, sf_dir):
    """Hot/warm/cool/cold storage tiering board: lineitem rows and
    estimated bytes (the broadcast_threshold_audit byte model: 9
    scalars + the two flag strings) bucketed by ship-date age relative
    to the dataset's own maximum — <30 / <90 / <180 / ≥180 days. The
    cold tier's byte mass is exactly what moving to object storage or
    a slower Parquet pool saves, and the hot share sizes the cache/SSD
    tier — the data-lifecycle sibling of lfu_cache_hit_curve (that op
    tiers by ACCESS frequency, this one by AGE, the two axes real
    lifecycle policies combine). Anchoring to the dataset max keeps the
    op deterministic on static data (the open_order_age rule).

    Determinism: integer day arithmetic off one 1-row max broadcast;
    the 4-row spine keeps empty tiers reporting; exact byte sums.

    Scale shape: one map-side pass over the fact table; the rollup has
    4 cells."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000").alias("sd"),
        F.expr(
            "CAST(72 + length(l_returnflag) + 4 + length(l_linestatus) + 4 AS BIGINT)"
        ).alias("row_bytes"),
    )
    mx = li.agg(F.max("sd").cast("long").alias("mxd"))
    t = li.crossJoin(F.broadcast(mx)).select(
        F.expr(
            "CASE WHEN mxd - sd < 30 THEN 'a_hot'"
            " WHEN mxd - sd < 90 THEN 'b_warm'"
            " WHEN mxd - sd < 180 THEN 'c_cool'"
            " ELSE 'd_cold' END"
        ).alias("tier"),
        "row_bytes",
    )
    r = t.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum("row_bytes"), F.lit(0)).cast("long").alias("est_bytes"),
    )
    tot = r.agg(F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("tn"))
    spine = spark.createDataFrame(
        [("a_hot",), ("b_warm",), ("c_cool",), ("d_cold",)], "tier string"
    )
    return (
        spine.join(r, "tier", "left")
        .crossJoin(tot)
        .select(
            "tier",
            F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce("est_bytes", F.lit(0)).cast("long").alias("est_bytes"),
            F.expr(
                "CAST((1000000 * COALESCE(n_rows, 0)) div greatest(tn, 1) AS BIGINT)"
            ).alias("row_share_q6"),
        )
        .orderBy("tier")
    )


# ---------------------------------------------------------------------------
# session 203 — rank-biased overlap, NB dispersion fit, FD bin-width advisor
# ---------------------------------------------------------------------------

# RBO weights (1-p)·p^(d-1)/d at p=0.9, d=1..10, folded to q9 INTEGERS in
# Python (the ndcg rule) — the per-depth contribution is then w·X_d exact.
_RBO_W = [
    100000000, 45000000, 27000000, 18225000, 13122000,
    9841500, 7592014, 5978711, 4782969, 3874205,
]
