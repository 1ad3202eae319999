"""driver_queries chunk q04 (original lines 13862-17344): events_serial_diff, most_fields_search, span_not_match, disjunctive_predicate_revenue, ... conversion_latency_histogram (46 ops).

Linearized continuation of docix_spark.ops.q03 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q03")

@register(
    "events_serial_diff",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
s AS (SELECT day_num, n,
             CAST(n - lag(n, 7) OVER (ORDER BY day_num) AS BIGINT) AS wow_diff
      FROM f)
SELECT CAST(day_num AS BIGINT) AS day_num, n, wow_diff
FROM s WHERE wow_diff IS NOT NULL ORDER BY day_num""",
)
def events_serial_diff(spark, sf_dir):
    """ES serial_diff pipeline aggregation at lag 7: week-over-week change
    in daily event count — the seasonality-aware sibling of
    events_cum_derivative (lag 1 confounds weekday effects with trend;
    lag 7 cancels them). The calendar spine fills empty days with 0 so
    the lag is a true 7-DAY offset, not 7-bucket (a gap would silently
    shorten the comparison window); the first 7 spine days have no
    comparand and drop, on both sides, by the IS NOT NULL rule.

    Scale shape: the raw shuffle is the day groupBy (map-side partials);
    spine, join, and the unpartitioned lag window all run on
    day-granularity rows — bounded by the calendar, not the corpus (the
    events_daily_mavg argument)."""
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
    w = Window.orderBy("day_num")
    s = f.select(
        F.col("day_num").cast("long").alias("day_num"),
        "n",
        (F.col("n") - F.lag("n", 7).over(w)).cast("long").alias("wow_diff"),
    )
    return s.where(F.col("wow_diff").isNotNull()).orderBy("day_num")


# ---------------------------------------------------------------------------
# session 42 — ES most_fields + span_not, and the TPC-H Q19/Q7/Q2/Q11
# shapes (disjunctive-predicate join, nation-pair matrix, per-group argmin
# join-back, share-of-total HAVING)
# ---------------------------------------------------------------------------


@register(
    "most_fields_search",
    f"""WITH {_SQL_POS},
fld AS (SELECT doc_id, CASE WHEN i <= 8 THEN 'title' ELSE 'body' END AS field, term FROM p),
tf AS (SELECT doc_id, field, term, count(*) AS tf FROM fld GROUP BY doc_id, field, term),
dl AS (SELECT doc_id, field, count(*) AS dl FROM fld GROUP BY doc_id, field),
av AS (SELECT field, avg(dl) AS avgdl FROM dl GROUP BY field),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM fld),
dfs AS (SELECT field, term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY field, term),
per AS (
  SELECT tf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM nd) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / av.avgdl)) AS s
  FROM tf JOIN dfs USING (field, term) JOIN dl USING (doc_id, field)
  JOIN av USING (field)
  WHERE tf.term IN ('spark', 'hash', 'join')),
agg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6,
               CAST(count(*) AS BIGINT) AS nm
        FROM per GROUP BY doc_id),
ranked AS (SELECT doc_id, score_q6, nm,
                  row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
           FROM agg)
SELECT doc_id, score_q6, nm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def most_fields_search(spark, sf_dir):
    """ES ``multi_match`` type=most_fields — completes the multi_match
    family (best_fields §2.8, cross_fields, phrase, phrase_prefix): each
    field scores the term with its OWN df and length norm and the doc
    SUMS every field's contribution (the "same text analyzed several
    ways" type — stemmed + exact fields reinforcing each other), where
    cross_fields blends df and dis-maxes. nm counts matched (field, term)
    legs, so it exceeds cross_fields' nm on multi-field hits.

    Scale shape: identical pruned postings plan to cross_fields_search —
    per-field tf/dl ride one doc_id exchange, per-(field, term) df and the
    2-row avgdl broadcast, and the per-doc sum absorbs map-side. The
    field-tagged table is localCheckpoint'd for its three consumers."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(spark_tokens("text")).alias("pos", "term")
    )
    fld = toks.select(
        "doc_id",
        F.when(F.col("pos") <= 7, F.lit("title")).otherwise(F.lit("body")).alias("field"),
        "term",
    ).localCheckpoint()
    tf = fld.groupBy("doc_id", "field", "term").agg(F.count("*").alias("tf"))
    dl = fld.groupBy("doc_id", "field").agg(F.count("*").alias("dl"))
    av = dl.groupBy("field").agg(F.avg("dl").alias("avgdl"))
    nd = fld.select("doc_id").distinct().agg(
        F.count("*").cast("double").alias("n_docs")
    )
    dfs = tf.groupBy("field", "term").agg(F.count("*").cast("double").alias("df"))
    per = (
        tf.where(F.col("term").isin(list(_TOPK_TERMS)))
        .join(F.broadcast(dfs), ["field", "term"])
        .join(dl, ["doc_id", "field"])
        .join(F.broadcast(av), "field")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf")
                * 2.2
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    agg = per.groupBy("doc_id").agg(
        F.expr("CAST(round(sum(s) * 1000000) AS BIGINT)").alias("score_q6"),
        F.count(F.lit(1)).cast("long").alias("nm"),
    )
    w = Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("doc_id", "score_q6", "nm", "rank")
        .orderBy("rank")
    )


_SPAN_NOT_W = 2  # exclusion window (positions either side)


@register(
    "span_not_match",
    f"""WITH w AS ({SQL_WORDS}),
p AS (SELECT doc_id, i, words[i] AS term FROM w, unnest(generate_series(1, len(words))) AS t(i)),
a AS (SELECT doc_id, i FROM p WHERE term = 'spark'),
b AS (SELECT doc_id, i FROM p WHERE term = 'hash'),
cl AS (
  SELECT a.doc_id, a.i FROM a
  WHERE NOT EXISTS (SELECT 1 FROM b
                    WHERE b.doc_id = a.doc_id AND abs(b.i - a.i) <= {_SPAN_NOT_W})),
d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_clean FROM cl GROUP BY doc_id),
ta AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total FROM a GROUP BY doc_id)
SELECT ta.doc_id, ta.n_total, CAST(COALESCE(d.n_clean, 0) AS BIGINT) AS n_clean
FROM ta LEFT JOIN d USING (doc_id)
ORDER BY n_clean DESC, ta.doc_id ASC LIMIT 20""",
)
def span_not_match(spark, sf_dir):
    """ES span_not query analytics: per doc, occurrences of 'spark' NOT
    within ±2 positions of 'hash' — the positional exclusion primitive
    ("java but not java script"-style) the span family needs beyond
    span_first/phrase_slop/intervals. Both engines count positions (their
    0- vs 1-based origins cancel inside |pa − pb|); docs whose every
    occurrence is excluded still emit with n_clean = 0 (the spine rule).

    Scale shape: filter the token stream to the TWO query terms first (at
    scale: two pruned positional-postings reads), then a doc_id-keyed
    LEFT ANTI join with the |Δpos| ≤ w band as the join residual — the
    intervals_unordered plan with anti semantics; both position sets are
    query-term-sized, never corpus-sized. Top-20 is a TakeOrdered."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(spark_tokens("text")).alias("i", "term")
    )
    a = toks.where(F.col("term") == "spark").select("doc_id", "i")
    b = toks.where(F.col("term") == "hash").select(
        F.col("doc_id").alias("b_doc"), F.col("i").alias("bi")
    )
    cl = a.join(
        b,
        (a["doc_id"] == b["b_doc"])
        & (F.abs(b["bi"] - a["i"]) <= _SPAN_NOT_W),
        "left_anti",
    )
    d = cl.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_clean"))
    ta = a.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        ta.join(d, "doc_id", "left")
        .select(
            "doc_id",
            "n_total",
            F.coalesce("n_clean", F.lit(0)).cast("long").alias("n_clean"),
        )
        .orderBy(F.desc("n_clean"), F.asc("doc_id"))
        .limit(20)
    )


# Q19's disjunction over cents-rounded quantity — ONE shared string so the
# residual predicate is bit-identical in both engines
_Q19_PRED = (
    "((p_brand = 'Brand#12' AND qty_c BETWEEN 100 AND 1100 AND p_size BETWEEN 1 AND 5) "
    "OR (p_brand = 'Brand#23' AND qty_c BETWEEN 1000 AND 2000 AND p_size BETWEEN 1 AND 10) "
    "OR (p_brand = 'Brand#3' AND qty_c BETWEEN 2000 AND 3000 AND p_size BETWEEN 1 AND 15))"
)


@register(
    "disjunctive_predicate_revenue",
    f"""WITH l AS (
  SELECT l_partkey, {_LI_QTY_C} AS qty_c, {_LI_DISC_C} AS rev_c FROM lineitem),
j AS (
  SELECT l.rev_c FROM l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE {_Q19_PRED})
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(COALESCE(sum(rev_c), 0) AS BIGINT) AS revenue_c
FROM j""",
)
def disjunctive_predicate_revenue(spark, sf_dir):
    """TPC-H Q19-shape disjunctive-predicate join: revenue from lineitems
    matching any of three (brand, quantity-range, size-range) clauses —
    the OR-of-ANDs join every optimizer must decompose into an equi-join
    on partkey plus a residual disjunction (a naive plan treats the OR as
    a cross-join filter). Quantity enters the predicate as exact cents
    via the shared `_LI_QTY_C` string.

    Scale shape: Catalyst derives the brand-IN-set implied by the
    disjunction and pushes `p_brand IN ('Brand#12','Brand#23','Brand#3')`
    into the part scan (constraint propagation — visible as PushedFilters),
    so the join's build side is ~12% of part before the residual runs; the
    join stays a single partkey-keyed equi-join, the final agg a 1-row
    scalar reduce."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.expr(_LI_QTY_C).alias("qty_c"),
        F.expr(_LI_DISC_C).alias("rev_c"),
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).where(F.expr(_Q19_PRED))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(F.sum("rev_c"), F.lit(0)).cast("long").alias("revenue_c"),
    )


_Q7_NATION_A = "NATION_2"
_Q7_NATION_B = "NATION_7"


@register(
    "nation_pair_trade_volume",
    f"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({_LI_DISC_C}) AS BIGINT) AS revenue_c
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE (ns.n_name = '{_Q7_NATION_A}' AND nc.n_name = '{_Q7_NATION_B}')
   OR (ns.n_name = '{_Q7_NATION_B}' AND nc.n_name = '{_Q7_NATION_A}')
GROUP BY supp_nation, cust_nation, o_year
ORDER BY supp_nation, cust_nation, o_year""",
)
def nation_pair_trade_volume(spark, sf_dir):
    """TPC-H Q7-shape bilateral trade volume: revenue flowing between two
    nations in both directions, by supplier-nation × customer-nation ×
    order year — the same-dimension-joined-twice shape (nation enters
    once through supplier, once through customer; the two roles must stay
    distinct aliases or the optimizer dedups them wrongly).

    Scale shape: both nation legs broadcast (25 rows each) and their
    name filters CUT the supplier/customer join inputs before the big
    joins (only ~8% of suppliers/customers survive a 2-of-25 nation
    filter); lineitem⋈orders is the one large keyed shuffle; the
    (2×2×years) agg combines map-side. Money cents-exact per row."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    ns = n.where(F.col("n_name").isin(_Q7_NATION_A, _Q7_NATION_B))
    s = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(ns.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(ns.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .select("c_custkey", "cust_nation")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("o_year"),
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", F.expr(_LI_DISC_C).alias("rev_c")
    )
    j = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "o_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("rev_c").cast("long").alias("revenue_c"),
        )
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


@register(
    "min_cost_supplier_per_part",
    """WITH up AS (
  SELECT l_partkey, l_suppkey, CAST(round(100 * l_extendedprice) AS BIGINT) AS price_c
  FROM lineitem),
mn AS (SELECT l_partkey, CAST(min(price_c) AS BIGINT) AS min_price_c
       FROM up GROUP BY l_partkey),
am AS (
  SELECT up.l_partkey, mn.min_price_c, CAST(min(up.l_suppkey) AS BIGINT) AS s_suppkey
  FROM up JOIN mn ON up.l_partkey = mn.l_partkey AND up.price_c = mn.min_price_c
  GROUP BY up.l_partkey, mn.min_price_c)
SELECT am.l_partkey AS p_partkey, p.p_name, am.min_price_c, am.s_suppkey, s.s_name
FROM am JOIN part p ON am.l_partkey = p.p_partkey
JOIN supplier s ON am.s_suppkey = s.s_suppkey
ORDER BY p_partkey ASC LIMIT 20""",
)
def min_cost_supplier_per_part(spark, sf_dir):
    """TPC-H Q2-shape minimum-cost supplier: per part, the cheapest
    observed price and the supplier offering it (ties broken by smallest
    suppkey — Q2's correlated MIN subquery, decorrelated as a per-part
    min joined back; this sandbox derives the part-supplier price list
    from lineitem since it has no partsupp table). First 20 parts by key.

    Scale shape: the min agg and the equality join back ride ONE
    l_partkey-keyed exchange (never a per-part sort window — the
    search_collapse rule); the tie-break min is a second map-side-combined
    agg on the same key; part/supplier name joins attach to the 20-row
    TakeOrdered result side after the limit pushes down."""
    up = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        "l_suppkey",
        F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)").alias("price_c"),
    )
    mn = up.groupBy("l_partkey").agg(
        F.min("price_c").cast("long").alias("min_price_c")
    )
    am = (
        up.join(
            mn.select(
                F.col("l_partkey").alias("m_pk"), F.col("min_price_c")
            ),
            (up["l_partkey"] == F.col("m_pk"))
            & (up["price_c"] == F.col("min_price_c")),
        )
        .groupBy("l_partkey", "min_price_c")
        .agg(F.min("l_suppkey").cast("long").alias("s_suppkey"))
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("sk"), "s_name"
    )
    return (
        am.join(p, am["l_partkey"] == p["p_partkey"])
        .join(s, am["s_suppkey"] == F.col("sk"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "min_price_c",
            "s_suppkey",
            "s_name",
        )
        .orderBy(F.asc("p_partkey"))
        .limit(20)
    )


@register(
    "part_revenue_concentration",
    f"""WITH pr AS (
  SELECT l_partkey, CAST(sum({_LI_DISC_C}) AS BIGINT) AS revenue_c
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(sum(revenue_c) AS BIGINT) AS tot FROM pr)
SELECT pr.l_partkey AS p_partkey, pr.revenue_c,
       CAST((1000000 * pr.revenue_c) // t.tot AS BIGINT) AS share_q6
FROM pr, t WHERE 100000 * pr.revenue_c > 65 * t.tot
ORDER BY revenue_c DESC, p_partkey ASC LIMIT 25""",
)
def part_revenue_concentration(spark, sf_dir):
    """TPC-H Q11-shape concentration screen: parts whose revenue exceeds
    0.065% of TOTAL revenue — the group-sum-vs-global-scalar HAVING shape
    (Q11's `having sum(...) > (select sum(...) * fraction)`). The cut is
    RELATIVE (an integer cross-multiplication against the grand total),
    so it means the same thing at every scale factor — an absolute cents
    cutoff dies at scale (the sparse_cosine_pairs rule). Top-25 by
    revenue, partkey tiebreak.

    Scale shape: one l_partkey-keyed agg with map-side partials; the
    grand total derives from the per-part sums (never a second corpus
    pass) and broadcasts as a 1-row table; the screen is then map-side
    and top-25 a TakeOrdered."""
    pr = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(_LI_DISC_C)).cast("long").alias("revenue_c"))
    )
    t = pr.agg(F.sum("revenue_c").cast("long").alias("tot"))
    return (
        pr.crossJoin(F.broadcast(t))
        .where(F.lit(100_000) * F.col("revenue_c") > F.lit(65) * F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "revenue_c",
            F.expr("CAST((1000000 * revenue_c) div tot AS BIGINT)").alias("share_q6"),
        )
        .orderBy(F.desc("revenue_c"), F.asc("p_partkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# session 43 — BM25F field-weighted scoring, Kneser-Ney bigram LM, the
# hashing-trick collision audit, and TPC-H Q6
# ---------------------------------------------------------------------------

_Q6_FROM = "TIMESTAMP '1996-01-01 00:00:00'"
_Q6_TO = "TIMESTAMP '1997-01-01 00:00:00'"
# discount grid is percent-points — round(100·d) is EXACT on the 0.00-0.10 grid
_LI_DPOINTS = "CAST(round(100 * l_discount) AS BIGINT)"
_LI_DISCAMT_C = "CAST(round(100 * l_extendedprice * l_discount) AS BIGINT)"


@register(
    "forecast_revenue_change",
    f"""SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(COALESCE(sum({_LI_DISCAMT_C}), 0) AS BIGINT) AS discount_rev_c
FROM lineitem
WHERE l_shipdate >= {_Q6_FROM} AND l_shipdate < {_Q6_TO}
  AND {_LI_DPOINTS} BETWEEN 5 AND 7 AND l_quantity < 24""",
)
def forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6-shape forecasting query: the revenue that would be
    recovered by eliminating 5-7% discounts on small-quantity 1996
    shipments — the pure scan-aggregate member of the relational family
    (no join at all; its entire cost is how much of the scan the
    predicates eliminate). The discount band compares integer
    percent-points (the 0.00-0.10 grid is exact under round(100·d)), the
    discounted amount is cents-rounded per row via one shared string.

    Scale shape: every predicate pushes into the parquet scan (shipdate
    range prunes row groups via min/max stats; the ReadSchema carries 4
    columns); the agg is a 1-row scalar reduce with map-side partials —
    the whole query is one pipelined scan, zero exchanges beyond the
    final combine."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.expr(
            f"l_shipdate >= {_Q6_FROM} AND l_shipdate < {_Q6_TO} "
            f"AND {_LI_DPOINTS} BETWEEN 5 AND 7 AND l_quantity < 24"
        )
    )
    return li.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(F.sum(F.expr(_LI_DISCAMT_C)), F.lit(0))
        .cast("long")
        .alias("discount_rev_c"),
    )


# BM25F per-field constants: weight and length-norm b per field
_BM25F_W = "CASE WHEN field = 'title' THEN 2.0 ELSE 1.0 END"
_BM25F_B = "CASE WHEN field = 'title' THEN 0.5 ELSE 0.75 END"


@register(
    "bm25f_search",
    f"""WITH {_SQL_POS},
fld AS (SELECT doc_id, CASE WHEN i <= 8 THEN 'title' ELSE 'body' END AS field, term FROM p),
tf AS (SELECT doc_id, field, term, count(*) AS tf FROM fld GROUP BY doc_id, field, term),
dl AS (SELECT doc_id, field, count(*) AS dl FROM fld GROUP BY doc_id, field),
av AS (SELECT field, avg(dl) AS avgdl FROM dl GROUP BY field),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM fld),
ddf AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM fld WHERE term IN ('spark', 'hash', 'join') GROUP BY term),
wtf AS (
  SELECT tf.doc_id, tf.term,
         sum(({_BM25F_W}) * tf.tf
             / ((1.0 - ({_BM25F_B})) + ({_BM25F_B}) * dl.dl / av.avgdl)) AS wt
  FROM tf JOIN dl USING (doc_id, field) JOIN av USING (field)
  WHERE tf.term IN ('spark', 'hash', 'join')
  GROUP BY tf.doc_id, tf.term),
per AS (
  SELECT wtf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM nd) - ddf.df + 0.5) / (ddf.df + 0.5))
           * wtf.wt / (1.2 + wtf.wt) AS s
  FROM wtf JOIN ddf USING (term)),
agg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6,
               CAST(count(*) AS BIGINT) AS nm
        FROM per GROUP BY doc_id),
ranked AS (SELECT doc_id, score_q6, nm,
                  row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
           FROM agg)
SELECT doc_id, score_q6, nm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def bm25f_search(spark, sf_dir):
    """BM25F (Robertson/Zaragoza) — the PRINCIPLED field-weighted scoring
    that closes the field-scoring family: best_fields dis-maxes whole
    queries, cross_fields dis-maxes per term, most_fields sums per-field
    scores (double-counting saturation), BM25F instead folds weighted,
    per-field-length-normalized term frequencies into ONE pseudo-tf
    (title w=2 b=0.5, body w=1 b=0.75) and saturates ONCE against a
    DOCUMENT-level idf — a term stuffed into both fields cannot earn two
    saturation curves.

    Scale shape: the cross_fields postings plan plus one extra
    (doc, term)-keyed partial agg (the weighted-tf fold, ≤|fields| rows
    per group, absorbed map-side); doc-level df is a distinct-doc count
    on the query terms only; everything small broadcasts."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(spark_tokens("text")).alias("pos", "term")
    )
    fld = toks.select(
        "doc_id",
        F.when(F.col("pos") <= 7, F.lit("title")).otherwise(F.lit("body")).alias("field"),
        "term",
    ).localCheckpoint()
    tf = fld.groupBy("doc_id", "field", "term").agg(F.count("*").alias("tf"))
    dl = fld.groupBy("doc_id", "field").agg(F.count("*").alias("dl"))
    av = dl.groupBy("field").agg(F.avg("dl").alias("avgdl"))
    nd = fld.select("doc_id").distinct().agg(
        F.count("*").cast("double").alias("n_docs")
    )
    ddf = (
        fld.where(F.col("term").isin(list(_TOPK_TERMS)))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("double").alias("df"))
    )
    wtf = (
        tf.where(F.col("term").isin(list(_TOPK_TERMS)))
        .join(dl, ["doc_id", "field"])
        .join(F.broadcast(av), "field")
        .groupBy("doc_id", "term")
        .agg(
            F.sum(
                F.expr(
                    f"({_BM25F_W}) * tf / ((1.0 - ({_BM25F_B})) + ({_BM25F_B}) * dl / avgdl)"
                )
            ).alias("wt")
        )
    )
    per = (
        wtf.join(F.broadcast(ddf), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("wt")
                / (F.lit(1.2) + F.col("wt"))
            ).alias("s"),
        )
    )
    agg = per.groupBy("doc_id").agg(
        F.expr("CAST(round(sum(s) * 1000000) AS BIGINT)").alias("score_q6"),
        F.count(F.lit(1)).cast("long").alias("nm"),
    )
    w = Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("doc_id", "score_q6", "nm", "rank")
        .orderBy("rank")
    )


_KN_D = 0.75  # absolute-discount mass


@register(
    "kneser_ney_bigram",
    f"""WITH w AS ({SQL_WORDS}),
bg AS (SELECT words[i] AS w1, words[i+1] AS w2
       FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
       WHERE len(words) >= 2),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1f
       FROM c12 GROUP BY w1),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM c12 GROUP BY w2),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nbt FROM c12)
SELECT c12.w1, c12.w2, c12.c12,
       CAST(round(1000000 * ((c12.c12 - {_KN_D}) / c1.c1
            + ({_KN_D} * c1.n1f / c1.c1) * (CAST(cont.n1b AS DOUBLE) / nb.nbt))) AS BIGINT) AS pkn_q6
FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2), nb
ORDER BY pkn_q6 DESC, c12.w1 ASC, c12.w2 ASC LIMIT 20""",
)
def kneser_ney_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (D=0.75) — the LM the
    n-gram-filtering literature actually uses (CCNet's perplexity filter
    is a KN 5-gram): discounted ML estimate plus the CONTINUATION-count
    backoff (how many distinct contexts precede w2 — 'francisco' is
    frequent but follows only 'san', so its continuation probability is
    tiny; a raw-unigram backoff gets this exactly wrong). Top-20 pairs.

    Determinism: every component (c12, c1, N1+(w1·), N1+(·w2), |bigram
    types|) is an exact BIGINT; the probability is ONE shared float
    expression string over exact-integer doubles, so both engines run
    the identical IEEE sequence. c12 ≥ 1 in the table so the max(c12−D,0)
    clamp is vacuous and omitted.

    Scale shape: one (w1,w2)-keyed agg with map-side partials (the
    bigram-type table is vocab²-bounded, in practice Zipf-tiny); the
    three marginal tables derive from IT, never from a second corpus
    pass; |types| broadcasts as a 1-row table; top-20 is a TakeOrdered."""
    w = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    bg = w.where(F.size("words") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(words)-2), i -> "
                "struct(words[i] AS w1, words[i+1] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    nb = c12.agg(F.count(F.lit(1)).cast("long").alias("nbt"))
    return (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr(
                f"CAST(round(1000000 * ((c12 - {_KN_D}) / c1 "
                f"+ ({_KN_D} * n1f / c1) * (CAST(n1b AS DOUBLE) / nbt))) AS BIGINT)"
            ).alias("pkn_q6"),
        )
        .orderBy(F.desc("pkn_q6"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


_FEAT_BUCKETS = 256


@register(
    "feature_hash_collisions",
    f"""WITH w AS ({SQL_WORDS}),
t AS (SELECT unnest(words) AS term FROM w),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY term),
h AS (SELECT term, n,
             ('0x' || substr(md5(term), 1, 4))::UBIGINT::BIGINT % {_FEAT_BUCKETS} AS bucket
      FROM tc)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(n) AS BIGINT) AS n_tokens
FROM h GROUP BY bucket
ORDER BY n_terms DESC, bucket ASC LIMIT 20""",
)
def feature_hash_collisions(spark, sf_dir):
    """Hashing-trick collision audit: the vocabulary hashed into 256
    feature buckets (fastText / vw-style feature hashing), reporting the
    most-collided buckets (n_terms > 1 = distinct words sharing one
    feature dimension) and the token mass they conflate — the curve that
    sizes the feature table (the third knob of the routing family after
    shard_token_balance's doc routing and shingle_size_curve's blocking
    keys). Bucket = 16-bit md5 slice of the TERM, same hash convention as
    every routing op.

    Scale shape: term counts are one vocab-keyed agg with map-side
    partials; hashing and the bucket rollup run over VOCAB-sized rows
    (≤256 output groups), never token-sized; top-20 is a TakeOrdered."""
    t = _docs(spark, sf_dir).select(
        F.explode(spark_tokens("text")).alias("term")
    )
    tc = t.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    h = tc.select(
        "n",
        F.expr(
            f"cast(conv(substring(md5(term), 1, 4), 16, 10) as bigint) % {_FEAT_BUCKETS}"
        ).alias("bucket"),
    )
    return (
        h.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("n").cast("long").alias("n_tokens"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n_terms", "n_tokens")
        .orderBy(F.desc("n_terms"), F.asc("bucket"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# session 44 — distributed power iteration (PCA-1 direction of the
# embedding gram matrix) in exact integer arithmetic
# ---------------------------------------------------------------------------

_PI_ITERS = 3
# shared per-stage expression strings — every float op both engines run.
# Stage bounds (|component| < 0.6 → x ≤ 6e5 q6 units, n ≤ ~10^6 vectors):
#   s = Σ_d x·v        ≤ 64·6e5·1e6 ≈ 3.8e13  (exact BIGINT, < 2^53 so the
#                        /1e6 double division below is exact)
#   u = round(s/1e6)   ≤ 3.8e7
#   w = Σ_i x·u        ≤ n·6e5·3.8e7 — BIGINT-safe to n ≈ 4·10^5; beyond
#                        that, raise the u divisor (the documented knob) or
#                        pre-aggregate per shard and re-sum
#   ws = |·| ≤ 3e8     → Σ ws² ≤ 64·9e16 ≈ 5.8e18 exact BIGINT
# BIGINT→DOUBLE casts round-to-nearest identically in both engines, sqrt is
# correctly rounded — each stage is ONE shared IEEE sequence.
_PI_U = "CAST(round(s / 1000000.0) AS BIGINT)"
_PI_WS = (
    "CASE WHEN mx = 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(round(300000000 * (CAST(w AS DOUBLE) / CAST(mx AS DOUBLE))) AS BIGINT) END"
)
_PI_V = (
    "CASE WHEN n2 = 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(round(1000000 * (CAST(ws AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)))) AS BIGINT) END"
)


def _poweriter_sql(iters: int = _PI_ITERS) -> str:
    """Unrolled power-iteration CTE chain (the kcenter/pagerank unroll
    pattern — xq and every per-iteration table AS MATERIALIZED, or DuckDB
    re-derives the corpus scan with compounding fan-out)."""
    parts = [
        "WITH xq AS MATERIALIZED (",
        "  SELECT vec_id, i - 1 AS dim, CAST(round(1000000 * v[i]) AS BIGINT) AS x",
        "  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e,",
        "       (SELECT unnest(generate_series(1, 64)) AS i)),",
        "v0 AS (SELECT dim, CAST(50000 + 3000 * dim AS BIGINT) AS v\n"
        "  FROM (SELECT unnest(generate_series(0, 63)) AS dim)),",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT xq.vec_id, CAST(sum(xq.x * vv.v) AS BIGINT) AS s\n"
            f"  FROM xq JOIN v{t - 1} vv USING (dim) GROUP BY xq.vec_id),"
        )
        parts.append(
            f"u{t} AS MATERIALIZED (SELECT vec_id, {_PI_U} AS u FROM s{t}),"
        )
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT xq.dim, CAST(sum(xq.x * uu.u) AS BIGINT) AS w\n"
            f"  FROM xq JOIN u{t} uu USING (vec_id) GROUP BY xq.dim),"
        )
        parts.append(f"m{t} AS (SELECT CAST(max(abs(w)) AS BIGINT) AS mx FROM w{t}),")
        parts.append(
            f"ws{t} AS MATERIALIZED (SELECT dim, {_PI_WS} AS ws FROM w{t}, m{t}),"
        )
        parts.append(
            f"n{t} AS (SELECT CAST(COALESCE(sum(ws * ws), 0) AS BIGINT) AS n2 FROM ws{t}),"
        )
        parts.append(
            f"v{t} AS MATERIALIZED (SELECT dim, {_PI_V} AS v FROM ws{t}, n{t}),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT CAST(dim AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_q6 "
        f"FROM v{iters} ORDER BY dim"
    )
    return "\n".join(parts)


@register("embedding_power_iteration", _poweriter_sql())
def embedding_power_iteration(spark, sf_dir):
    """Top principal direction of the (uncentered) embedding gram matrix
    XᵀX via POWER ITERATION — distributed linear algebra as relational
    ops: each iteration is the matvec pair s = Xv (map-side fold per
    vector) and w = Xᵀs (ONE dim-keyed agg — the only shuffle, 64 output
    groups with map-side partials), then a normalize over the 64-row
    result. The PCA-1 direction feeds embedding whitening, ANN rotation,
    and the "is one direction eating the space" anisotropy check
    (Ethayarajh 2019) a training pipeline runs on fresh encoders. The
    start vector varies by dimension (v₀_d = 50000 + 3000·d) — a UNIFORM
    start is exactly orthogonal to every zero-mean direction (Σe_d = 0
    ⇒ Xv₀ = 0, the planted-direction pytest caught it) and would return
    all-zeros on mean-free data; a generic injective start makes exact
    orthogonality measure-zero.

    Determinism: components q6-rounded once; every sum is an exact BIGINT
    (bounds in the _PI_* comment — the u-divisor is the documented knob
    past ~4·10⁵ vectors); the three per-iteration float steps are shared
    expression strings over exact or deterministically-cast doubles. Sign
    follows the deterministic v₀ = 1/8·𝟙 start, not a random seed.

    Scale shape: the q6 matrix is localCheckpoint'd once (2 passes per
    iteration would re-read parquet otherwise); v lives as a 64-element
    LITERAL inlined into the plan each iteration (collected 64 rows — the
    kmeans/kcenter bounded-collect convention), so s = Xv is pure
    map-side with no join; the normalize runs on 64-row tables."""
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr(
            "transform(embedding, c -> CAST(round(1000000 * cast(c as double)) AS BIGINT))"
        ).alias("xarr"),
    ).localCheckpoint()
    v = [50000 + 3000 * d for d in range(64)]
    out = None
    for t in range(_PI_ITERS):
        vlit = "array(" + ",".join(f"{int(x)}L" for x in v) + ")"
        u = e.select(
            "xarr",
            F.expr(
                f"aggregate(zip_with(xarr, {vlit}, (a, b) -> a * b), 0L, (acc, z) -> acc + z)"
            ).alias("s"),
        ).select("xarr", F.expr(_PI_U).alias("u"))
        wdf = (
            u.select(F.posexplode("xarr").alias("dim", "x"), "u")
            .groupBy("dim")
            .agg(F.sum(F.expr("x * u")).cast("long").alias("w"))
        )
        m = wdf.agg(F.max(F.abs(F.col("w"))).cast("long").alias("mx"))
        ws = wdf.crossJoin(F.broadcast(m)).select("dim", F.expr(_PI_WS).alias("ws"))
        n2 = ws.agg(
            F.coalesce(F.sum(F.expr("ws * ws")), F.lit(0)).cast("long").alias("n2")
        )
        out = ws.crossJoin(F.broadcast(n2)).select(
            F.col("dim").cast("long").alias("dim"), F.expr(_PI_V).alias("v_q6")
        )
        if t < _PI_ITERS - 1:  # the last iteration returns the plan itself
            v = [r.v_q6 for r in out.orderBy("dim").collect()]
    return out.orderBy("dim")


# ---------------------------------------------------------------------------
# session 45 — Dirichlet query-likelihood ranking + TPC-H Q9/Q20/Q21
# adaptations (profit rollup, excess-share suppliers, sole-supplier orders)
# ---------------------------------------------------------------------------

_QL_MU = 2000.0  # Dirichlet pseudo-count


@register(
    "dirichlet_ql_search",
    f"""WITH w AS ({SQL_WORDS}),
t AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
tot AS (SELECT CAST(count(*) AS BIGINT) AS big_t FROM t),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM t
       WHERE term IN ('spark', 'hash', 'join') GROUP BY term),
mt AS (
  SELECT tf.doc_id, sum(ln(1.0 + (tf.tf * tot.big_t) / ({_QL_MU} * cf.cf))) AS ms,
         CAST(count(*) AS BIGINT) AS nm
  FROM tf JOIN cf USING (term), tot GROUP BY tf.doc_id),
sc AS (
  SELECT dl.doc_id,
         CAST(round(1000000 * (COALESCE(mt.ms, 0.0)
              + 3 * ln({_QL_MU} / (dl.dl + {_QL_MU})))) AS BIGINT) AS score_q6,
         CAST(COALESCE(mt.nm, 0) AS BIGINT) AS nm
  FROM dl LEFT JOIN mt USING (doc_id)),
ranked AS (SELECT doc_id, score_q6, nm,
                  row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
           FROM sc)
SELECT doc_id, score_q6, nm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def dirichlet_ql_search(spark, sf_dir):
    """Dirichlet-smoothed query likelihood (Zhai-Lafferty, μ=2000) — the
    generative retrieval model next to BM25's probabilistic one, in its
    RANK-EQUIVALENT decomposed form: score = Σ_matched ln(1 + tf·T/(μ·cf))
    + |q|·ln(μ/(dl+μ)). The decomposition is the scale story — the naive
    form scores every (doc, term) pair including zeros (a match_all
    scan per query term); decomposed, the first sum runs only over
    MATCHING postings and the second is a per-doc length prior computed
    from the doc-stats table the index already has. Unmatched docs rank
    by prior alone (QL is generative — every doc has nonzero likelihood),
    so nm=0 rows are correct, not missing.

    Scale shape: tf/dl/cf all derive from one token explode (tf and dl
    share the doc_id exchange — the session-15 rule); cf is
    query-terms-sized and broadcasts with the 1-row corpus total; the
    final per-doc sum absorbs map-side; top-10 is a TakeOrdered."""
    t = _docs(spark, sf_dir).select(
        "doc_id", F.explode(spark_tokens("text")).alias("term")
    ).localCheckpoint()
    tf = t.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = t.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    tot = t.agg(F.count(F.lit(1)).cast("long").alias("big_t"))
    cf = (
        t.where(F.col("term").isin(list(_TOPK_TERMS)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cf"))
    )
    mt = (
        tf.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(f"ln(1.0 + (tf * big_t) / ({_QL_MU} * cf))")
            ).alias("ms"),
            F.count(F.lit(1)).cast("long").alias("nm"),
        )
    )
    sc = dl.join(mt, "doc_id", "left").select(
        "doc_id",
        F.expr(
            f"CAST(round(1000000 * (COALESCE(ms, 0.0) "
            f"+ 3 * ln({_QL_MU} / (dl + {_QL_MU})))) AS BIGINT)"
        ).alias("score_q6"),
        F.coalesce("nm", F.lit(0)).cast("long").alias("nm"),
    )
    w = Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("doc_id", "score_q6", "nm", "rank")
        .orderBy("rank")
    )


# synthetic unit cost: 60% of the part's retail price, in cents — the
# 0.6·100 fold is the exact integer 60, so the per-line cost is ONE float
# product rounded once (the Q9 adaptation for a schema without partsupp)
_Q9_COST_C = "CAST(round(60 * l_quantity * p_retailprice) AS BIGINT)"


@register(
    "product_profit_by_nation_year",
    f"""SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_LI_DISC_C} - {_Q9_COST_C}) AS BIGINT) AS profit_c
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name, o_year ORDER BY n.n_name, o_year""",
)
def product_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9-shape profit rollup: per supplier nation and order year,
    revenue minus cost of goods (cost synthesized as 60% of the part's
    retail price — this schema has no partsupp; the fold 0.6·100 = 60
    keeps the per-line cost a single rounded float product). The shape is
    Q9's: a fact table joined to THREE dimensions plus a second fact
    (orders) purely for the date attribute, rolled up to a tiny matrix.

    Scale shape: part and supplier joins are key shuffles (both scale
    with SF — un-hinted, AQE broadcasts the small side); nation (25 rows)
    broadcasts; lineitem⋈orders is the big keyed shuffle; the
    (nation, year) agg combines map-side into ≤25·|years| rows. Profit
    summands are exact BIGINT cents differences."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("o_year")
    )
    j = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
    )
    return (
        j.groupBy("n_name", "o_year")
        .agg(
            F.sum(F.expr(f"{_LI_DISC_C} - {_Q9_COST_C}"))
            .cast("long")
            .alias("profit_c")
        )
        .orderBy("n_name", "o_year")
    )


@register(
    "excess_share_suppliers",
    f"""WITH sq AS (
  SELECT l_partkey, l_suppkey, CAST(sum({_LI_QTY_C}) AS BIGINT) AS qty_c
  FROM lineitem GROUP BY l_partkey, l_suppkey),
pt AS (SELECT l_partkey, CAST(sum(qty_c) AS BIGINT) AS total_c FROM sq GROUP BY l_partkey),
dom AS (
  SELECT sq.l_suppkey, CAST(count(*) AS BIGINT) AS n_parts_dominated
  FROM sq JOIN pt USING (l_partkey)
  WHERE 2 * sq.qty_c > pt.total_c
  GROUP BY sq.l_suppkey)
SELECT l_suppkey AS s_suppkey, n_parts_dominated
FROM dom ORDER BY n_parts_dominated DESC, s_suppkey ASC LIMIT 20""",
)
def excess_share_suppliers(spark, sf_dir):
    """TPC-H Q20-shape excess-share screen: suppliers who shipped MORE
    THAN HALF of some part's total shipped quantity (Q20's
    "quantity > 50% of the part's demand" correlated subquery,
    decorrelated as per-(part, supplier) sums vs per-part totals — the
    same two-level-aggregate cross-filter as small_quantity_revenue but
    with the share on the GROUP, not the row). Top-20 by parts dominated.

    Scale shape: the part total derives from the (part, supplier) sums
    (never a second lineitem pass) and the share test joins back on
    l_partkey — all three steps ride ONE l_partkey-keyed exchange; the
    supplier rollup is a second small agg; integer cross-multiplication
    for the 50% cut."""
    sq = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr(_LI_QTY_C)).cast("long").alias("qty_c"))
    )
    pt = sq.groupBy("l_partkey").agg(
        F.sum("qty_c").cast("long").alias("total_c")
    )
    dom = (
        sq.join(pt, "l_partkey")
        .where(F.lit(2) * F.col("qty_c") > F.col("total_c"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts_dominated"))
    )
    return (
        dom.select(F.col("l_suppkey").alias("s_suppkey"), "n_parts_dominated")
        .orderBy(F.desc("n_parts_dominated"), F.asc("s_suppkey"))
        .limit(20)
    )


@register(
    "sole_supplier_orders",
    """WITH po AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
         CAST(min(l_suppkey) AS BIGINT) AS the_supp
  FROM lineitem GROUP BY l_orderkey)
SELECT the_supp AS s_suppkey, CAST(count(*) AS BIGINT) AS n_sole_orders
FROM po WHERE n_items >= 2 AND n_supp = 1
GROUP BY the_supp ORDER BY n_sole_orders DESC, s_suppkey ASC LIMIT 20""",
)
def sole_supplier_orders(spark, sf_dir):
    """TPC-H Q21-shape sole-supplier screen: multi-item orders fulfilled
    entirely by ONE supplier (Q21's EXISTS another-lineitem /
    NOT-EXISTS another-supplier pair, flattened into a per-order
    aggregate: n_items ≥ 2 ∧ distinct suppliers = 1 — when n_supp is 1
    the min IS that supplier, so no join back is needed). Top-20
    suppliers by such orders.

    Scale shape: one l_orderkey-keyed agg (count-distinct expands to a
    two-level agg with map-side partials under AQE), a map-side filter,
    and a supplier-keyed rollup; the correlated EXISTS pair never
    materializes as joins at all."""
    po = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
            F.min("l_suppkey").cast("long").alias("the_supp"),
        )
    )
    return (
        po.where((F.col("n_items") >= 2) & (F.col("n_supp") == 1))
        .groupBy("the_supp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sole_orders"))
        .select(F.col("the_supp").alias("s_suppkey"), "n_sole_orders")
        .orderBy(F.desc("n_sole_orders"), F.asc("s_suppkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# session 46 — TPC-H Q12 (completes the 22-query relational deck), cohort
# revenue analysis over events, two corpus-quality scores (Flesch
# readability proxy, Yule's K lexical diversity), and binary sign-sketch
# ANN — the 8-byte hamming-scan member of the compression family next to
# SQ8 / PQ / IVFPQ.
# ---------------------------------------------------------------------------

_Q12_FROM = "TIMESTAMP '1996-01-01 00:00:00'"
_Q12_TO = "TIMESTAMP '1997-01-01 00:00:00'"
_Q12_FAST_US = 30 * 86_400_000_000  # 30 days in microseconds
_Q12_HIGH = "('1-URGENT', '2-HIGH')"


@register(
    "shipmode_priority_counts",
    f"""SELECT CASE WHEN epoch_us(l.l_shipdate) <= epoch_us(o.o_orderdate) + {_Q12_FAST_US}
            THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
       CAST(count(*) FILTER (o.o_orderpriority IN {_Q12_HIGH}) AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (o.o_orderpriority NOT IN {_Q12_HIGH}) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= {_Q12_FROM} AND l.l_shipdate < {_Q12_TO}
GROUP BY ship_bucket ORDER BY ship_bucket""",
)
def shipmode_priority_counts(spark, sf_dir):
    """TPC-H Q12-shape shipping-mode priority check — the last missing
    member of the 22-query deck (reference Q12 buckets lines by
    l_shipmode and counts urgent-vs-other order priorities; this schema
    has no shipmode column, so the bucket is the ship-latency class the
    mode proxies for: FAST = shipped within 30 days of the order,
    SLOW otherwise). The bucket predicate compares columns from BOTH
    sides, so — like the Q4 lateness predicate — it lives above the
    join, not below it. Dates travel as unix_micros/epoch_us BIGINTs.

    Scale shape: the 1996 shipdate window pushes into the lineitem
    parquet scan; lineitem⋈orders is one keyed shuffle (both sides
    unbounded — un-hinted); the two conditional counts fold map-side
    into a 2-row agg."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.expr(f"l_shipdate >= {_Q12_FROM} AND l_shipdate < {_Q12_TO}"))
        .select(
            "l_orderkey",
            F.expr("unix_micros(cast(l_shipdate as timestamp))").alias("ship_us"),
        )
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("o_date_us"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.expr(
            f"CASE WHEN ship_us <= o_date_us + {_Q12_FAST_US} THEN 'FAST' ELSE 'SLOW' END"
        ).alias("ship_bucket"),
        F.expr(
            f"CASE WHEN o_orderpriority IN {_Q12_HIGH} THEN 1 ELSE 0 END"
        ).alias("is_high"),
    )
    return (
        j.groupBy("ship_bucket")
        .agg(
            F.sum("is_high").cast("long").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("is_high")).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# shared cents expr for the events value column (events_value_quantiles
# convention: money becomes exact BIGINT cents per row, never a float sum)
_EV_CENTS = "CAST(round(100 * value) AS BIGINT)"


@register(
    "events_cohort_revenue",
    f"""WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS wk, {_EV_CENTS} AS cents
  FROM events),
fw AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(ev.wk - cohort_week AS BIGINT) AS age_weeks,
       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_active,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS revenue_c
FROM ev JOIN fw USING (user_id)
GROUP BY cohort_week, age_weeks ORDER BY cohort_week, age_weeks""",
)
def events_cohort_revenue(spark, sf_dir):
    """Cohort revenue matrix — the product-analytics staple next to
    events_retention: users are cohorted by the week of their first
    event (week = integer-µs day key div 7, the events-table date rule),
    and every event lands in the (cohort_week, age_weeks) cell with its
    active-user count and exact cents revenue. Both engines floor the
    positive week arithmetic identically (Spark div truncates, DuckDB
    // floors — equal on non-negatives; epoch weeks are positive).

    Scale shape: first-seen is one user_id-keyed agg; the join back is
    user_id-keyed too, so both ride ONE exchange; the cohort matrix agg
    is calendar-bounded (weeks² cells), with count(DISTINCT user_id)
    expanding to a two-level agg with map-side partials under AQE. The
    first-seen side is unbounded (one row per user) — un-hinted, never
    force-broadcast."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000 div 7").alias("wk"),
        F.expr(_EV_CENTS).alias("cents"),
    )
    fw = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    j = e.join(fw, "user_id")
    return (
        j.groupBy(
            F.col("cohort_week"),
            (F.col("wk") - F.col("cohort_week")).alias("age_weeks"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_active"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("revenue_c"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


# Flesch reading ease from BIGINT sufficient stats — ONE shared expression
# string (ttest_lang_doclen convention) evaluated over exact-double-safe
# integer sums; constants in E-NOTATION (a plain decimal literal is
# DECIMAL in Spark SQL and diverges — the _HLL_C lesson).
_FLESCH_Q6 = (
    "CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(round(1000000 * (2.06835e2 "
    "- 1.015e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) "
    "- 8.46e1 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))) AS BIGINT) END"
)


@register(
    "readability_flesch",
    f"""WITH per AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS w,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s
  FROM documents),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS n_words,
         CAST(sum(s) AS BIGINT) AS n_sentences,
         CAST(sum(y) AS BIGINT) AS n_syllables
  FROM per GROUP BY source)
SELECT source, n_docs, n_words, n_sentences, n_syllables,
       {_FLESCH_Q6} AS flesch_q6
FROM agg ORDER BY source""",
)
def readability_flesch(spark, sf_dir):
    """Per-source Flesch reading-ease proxy — the classic quality score
    (206.835 − 1.015·words/sentences − 84.6·syllables/word) with
    deterministic regex stand-ins: words = shared-tokenizer matches,
    syllables = vowel-group runs [aeiouy]+ (a vowel run never crosses a
    token boundary, so counting on the raw lowered text equals the
    per-token sum), sentences = [.!?]+ runs floored at 1 per doc (the
    0-denominator guard; CJK text without terminal punctuation scores
    as one sentence per doc — documented, not hidden). The formula runs
    ONCE per source over exact BIGINT sums via one shared expr string.

    Scale shape: all three counters are map-side regexp counts inside
    codegen — no token explosion, no shuffle beyond the sources-sized
    hash agg (tokenizer_fertility's plan, one more counter)."""
    d = _docs(spark, sf_dir)
    per = d.select(
        "source",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)).alias("w"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)).alias("y"),
        F.greatest(
            F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
        ).alias("s"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("s").cast("long").alias("n_sentences"),
            F.sum("y").cast("long").alias("n_syllables"),
        )
        .select(
            "source", "n_docs", "n_words", "n_sentences", "n_syllables",
            F.expr(_FLESCH_Q6).alias("flesch_q6"),
        )
        .orderBy("source")
    )


# Yule's K from the tf spectrum: K = 1e4·(S2 − S1)/S1², S1 = Σtf,
# S2 = Σtf². S1/S2 are exact BIGINTs (< 2^53 ⇒ exact doubles); the single
# divide + round happens once in ONE shared string. At extreme scale S2
# can pass 2^63 (a 1e12-tf term squares to 1e24) — there, fold per-term
# contributions to double before the sum; at any tested SF it is exact.
_YULE_Q6 = (
    "CAST(round(1.0e10 * CAST(sum_tf2 - n_tokens AS DOUBLE) / "
    "(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))) AS BIGINT)"
)


@register(
    "yule_k_source",
    f"""WITH t AS (SELECT source, unnest(words) AS term FROM ({SQL_WORDS})),
tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY source, term),
agg AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(c * c) AS BIGINT) AS sum_tf2
  FROM tf GROUP BY source)
SELECT source, n_tokens, n_terms, sum_tf2, {_YULE_Q6} AS yule_k_q6
FROM agg ORDER BY source""",
)
def yule_k_source(spark, sf_dir):
    """Yule's K lexical-diversity characteristic per source — the
    length-robust repetitiveness score (K grows as token mass
    concentrates on few types; a boilerplate-heavy crawl scores high)
    complementing heaps_law_source's vocab-growth view. Sources whose
    docs are all empty have no token rows and drop from the output on
    both engines by construction.

    Scale shape: one (source, term)-keyed agg off the token explode,
    then a sources-sized rollup — S1, S2, |V| all fold map-side; the
    K formula runs once per source on the tiny agg table."""
    d = _docs(spark, sf_dir)
    t = d.select("source", F.explode(spark_tokens("text")).alias("term"))
    tf = t.groupBy("source", "term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        tf.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.expr("c * c")).cast("long").alias("sum_tf2"),
        )
        .select("source", "n_tokens", "n_terms", "sum_tf2", F.expr(_YULE_Q6).alias("yule_k_q6"))
        .orderBy("source")
    )


# --- binary sign-sketch ANN (hamming scan + exact rerank) -------------------
#
# The 64-dim embedding quantizes to ONE bit per dimension (sign), packed
# into two BIGINT halves so neither engine's 2^63 arithmetic is touched —
# bit weights are literal constants ≤ 2^31, the halves XOR and popcount.
# The scan side of the band carries 16 bytes per vector instead of 256:
# that ratio IS the operator (FAISS IndexBinaryFlat's rationale). On this
# sandbox's i.i.d. vectors sign bits are weakly angle-correlated, so
# band-50 recall@10 is honest-but-modest, like PQ's — the knob is R.

_BH_R = 50  # hamming band width before the exact rerank


def _bh_half_spark(base: int) -> str:
    # Spark arrays are 0-based: dims base..base+31 -> bits 0..31
    return " + ".join(
        f"(CASE WHEN v[{base + i}] > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(32)
    )


def _bh_half_sql(base: int) -> str:
    # DuckDB arrays are 1-based
    return " + ".join(
        f"(CASE WHEN v[{base + i + 1}] > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(32)
    )


_BH_PRELUDE = (
    _SQL_EMB_E
    + f"""
codes AS (SELECT vec_id, {_bh_half_sql(0)} AS lo, {_bh_half_sql(32)} AS hi FROM e),
qc AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi FROM codes WHERE vec_id % 37 = 0),
qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 37 = 0),
h0 AS (
  SELECT qc.qid, c.vec_id,
         CAST(bit_count(xor(c.lo, qc.qlo)) + bit_count(xor(c.hi, qc.qhi)) AS BIGINT) AS hamming
  FROM codes c, qc),
band AS (
  SELECT qid, vec_id, hamming FROM (
    SELECT qid, vec_id, hamming,
           row_number() OVER (PARTITION BY qid ORDER BY hamming ASC, vec_id ASC) AS rn
    FROM h0) WHERE rn <= {_BH_R}),
rr0 AS (
  SELECT band.qid, band.vec_id, band.hamming,
         {_sql_cosq("e.v", "qs.qv", 1_000_000)} AS cos_q6
  FROM band JOIN e ON e.vec_id = band.vec_id JOIN qs ON qs.qid = band.qid),
rr AS (
  SELECT qid, vec_id, hamming, cos_q6,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_q6 DESC, vec_id ASC) AS BIGINT) AS rnk
  FROM rr0)"""
)


def _bh_rerank_topk(spark, sf_dir) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    codes = e.select(
        "vec_id",
        F.expr(_bh_half_spark(0)).alias("lo"),
        F.expr(_bh_half_spark(32)).alias("hi"),
    )
    qc = codes.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wh = Window.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("vec_id"))
    band = (
        codes.crossJoin(F.broadcast(qc))
        .select(
            "qid",
            "vec_id",
            F.expr("CAST(bit_count(lo ^ qlo) + bit_count(hi ^ qhi) AS BIGINT)").alias("hamming"),
        )
        .withColumn("rn", F.row_number().over(wh))
        .where(F.col("rn") <= _BH_R)
        .select("qid", "vec_id", "hamming")
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    return (
        e.join(F.broadcast(band), "vec_id")
        .join(F.broadcast(qs), "qid")
        .select("qid", "vec_id", "hamming", _cosq("v", "qv", 1_000_000).alias("cos_q6"))
        .withColumn("rnk", F.row_number().over(wr).cast("long"))
        .where(F.col("rnk") <= 10)
        .select("qid", "vec_id", "hamming", "cos_q6", "rnk")
    )


@register(
    "ann_hamming_rerank",
    _BH_PRELUDE
    + "\nSELECT qid, vec_id, hamming, cos_q6, rnk FROM rr WHERE rnk <= 10 ORDER BY qid, rnk",
)
def ann_hamming_rerank(spark, sf_dir):
    """Binary sign-sketch ANN with exact rerank (FAISS IndexBinaryFlat +
    refine): every vector packs to a 64-bit sign code in two BIGINT
    halves; the %37 query batch scans CODES ONLY (16 bytes/vector — a
    16× payload cut vs the float scan) for a hamming top-R=50 band
    with (hamming, vec_id) tiebreak, then the small band joins BACK to
    the vector table for exact cosine top-10. Query self-hits retained
    (hamming 0 → cos 1 → rank 1, oracle-checkable).

    Scale shape: the code table is map-side arithmetic inside codegen;
    the band scan carries no float payload and broadcasts the query
    codes; only band rows (R·|Q|, bounded) rejoin the vectors — both
    rerank joins broadcast the band/query side."""
    return _bh_rerank_topk(spark, sf_dir).orderBy("qid", "rnk")


@register(
    "ann_hamming_recall",
    _BH_PRELUDE
    + """,
ex0 AS (
  SELECT qs.qid, e.vec_id,
         row_number() OVER (PARTITION BY qs.qid ORDER BY
           """
    + _sql_cosq("e.v", "qs.qv", 1_000_000)
    + """ DESC, e.vec_id ASC) AS rn
  FROM qs, e),
bexact AS (SELECT qid, vec_id FROM ex0 WHERE rn <= 10)
SELECT qs.qid, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_overlap
FROM qs LEFT JOIN (
  SELECT r.qid, count(*) AS n
  FROM (SELECT qid, vec_id FROM rr WHERE rnk <= 10) r JOIN bexact USING (qid, vec_id)
  GROUP BY r.qid
) o USING (qid) ORDER BY qs.qid""",
)
def ann_hamming_recall(spark, sf_dir):
    """Per-query recall@10 of the hamming-band rerank vs the exact
    cosine top-10 — the accuracy half of the 16×-payload trade. On
    i.i.d. sandbox vectors sign bits carry weak angle signal, so
    modest recall is the HONEST reading (the PQ lesson); the knob is
    the band width _BH_R, not the measurement."""
    bh = _bh_rerank_topk(spark, sf_dir).select("qid", "vec_id")
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cos_q6"), F.asc("vec_id"))
    exact = (
        e.crossJoin(F.broadcast(qs))
        .select("qid", "vec_id", _cosq("v", "qv", 1_000_000).alias("cos_q6"))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    overlap = bh.join(exact, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        qs.select("qid")
        .join(overlap, "qid", "left")
        .select("qid", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_overlap"))
        .orderBy("qid")
    )


# --- full BPE trainer rounds (Sennrich) -------------------------------------
#
# bpe_merge_candidates is step 1 of the BPE loop; this runs the LOOP —
# _BPE_ROUNDS greedy merges, each round = (pair-count agg → argmax pair →
# corpus-wide merge). The merge is pure string algebra, no per-row Python:
# a word's symbol sequence is a string with the invariant "single space at
# both ends, double space between symbols" (' h  e  l  l  o '), so the
# pattern ' a  b ' can only match at symbol boundaries (symbols contain no
# spaces) and plain left-to-right non-overlapping replace() IS the BPE
# greedy merge — including the ' a  a  a ' → ' aa  a ' leftmost rule,
# because each flanking space is shared with the neighbor match.

_BPE_ROUNDS = 3


def _bpe_sql() -> str:
    """Generated oracle: _BPE_ROUNDS unrolled (pairs → argmax → merge)
    CTE rounds. wt/b tables are multiply-referenced — AS MATERIALIZED or
    DuckDB inlines and re-derives them with compounding fan-out (the
    pagerank-oracle lesson)."""
    parts = [
        f"""WITH w AS (
  SELECT term AS word, CAST(count(*) AS BIGINT) AS cnt FROM ({SQL_TOKS})
  WHERE length(term) >= 2 GROUP BY term),
wt0 AS MATERIALIZED (
  SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS s, cnt FROM w)"""
    ]
    for r in range(_BPE_ROUNDS):
        parts.append(
            f""",
p{r} AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, cnt
  FROM (SELECT str_split(trim(s), '  ') AS syms, cnt FROM wt{r}),
       unnest(generate_series(1, len(syms) - 1)) AS t(i)
  WHERE len(syms) >= 2),
b{r} AS MATERIALIZED (
  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pc FROM p{r} GROUP BY a, b
  ORDER BY pc DESC, a ASC, b ASC LIMIT 1)"""
        )
        if r < _BPE_ROUNDS - 1:
            parts.append(
                f""",
wt{r + 1} AS MATERIALIZED (
  SELECT replace(s, ' ' || b{r}.a || '  ' || b{r}.b || ' ',
                 ' ' || b{r}.a || b{r}.b || ' ') AS s, cnt
  FROM wt{r}, b{r})"""
            )
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS merge_rank, a AS sym_a, b AS sym_b, pc AS pair_count FROM b{r}"
        for r in range(_BPE_ROUNDS)
    )
    parts.append(f"\nSELECT * FROM ({sel}) ORDER BY merge_rank")
    return "".join(parts)


def _bpe_pairs_best(wt: DataFrame) -> DataFrame:
    sy = wt.select(F.expr("split(trim(s), '  ')").alias("syms"), "cnt").where(
        F.expr("size(syms) >= 2")  # sequence(0, negative) junk guard
    )
    pairs = sy.select(
        F.expr(
            "explode(transform(sequence(0, size(syms) - 2),"
            " i -> struct(syms[i] AS a, syms[i + 1] AS b)))"
        ).alias("p"),
        "cnt",
    ).select("p.a", "p.b", "cnt")
    return (
        pairs.groupBy("a", "b")
        .agg(F.sum("cnt").cast("long").alias("pc"))
        .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
        .limit(1)
    )


@register("bpe_train_merges", _bpe_sql())
def bpe_train_merges(spark, sf_dir):
    """BPE trainer, 3 greedy merge rounds (Sennrich 2016 — the loop
    bpe_merge_candidates is one step of): per round, the max-count
    adjacent symbol pair (count desc, pair lexicographic tiebreak) merges
    corpus-wide via the space-anchored replace() described above. Word
    TYPES with counts are the training set (classic BPE), so all strings
    are vocab-bounded regardless of corpus size. An exhausted corpus
    (fewer distinct pairs than rounds) yields fewer rows — identically in
    both engines, since an empty argmax empties every later round.

    Scale shape: the type table localCheckpoints once per round (3
    bounded materializations, the kmeans-round pattern); each round is
    ONE (a, b)-keyed agg off a map-side explode plus a 1-row broadcast
    crossJoin for the merge — no driver collect, no per-row Python."""
    t = _toks(_docs(spark, sf_dir))
    wt = (
        t.where(F.length("term") >= 2)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.expr("regexp_replace(term, '(.)', ' $1 ')").alias("s"), "cnt")
        .localCheckpoint()
    )
    merges = []
    for r in range(_BPE_ROUNDS):
        best = _bpe_pairs_best(wt).localCheckpoint()
        merges.append(
            best.select(
                F.lit(r + 1).cast("long").alias("merge_rank"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("pc").alias("pair_count"),
            )
        )
        if r < _BPE_ROUNDS - 1:
            wt = (
                wt.crossJoin(F.broadcast(best))
                .select(
                    F.expr(
                        "replace(s, ' ' || a || '  ' || b || ' ',"
                        " ' ' || a || b || ' ')"
                    ).alias("s"),
                    "cnt",
                )
                .localCheckpoint()
            )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out.orderBy("merge_rank")


# --- per-source script-composition audit -------------------------------------
#
# Multilingual pipeline smell test: which SCRIPTS (not langs) each source
# actually carries, as exact char counts — a lang-id disagreeing with the
# script mix flags mislabeled docs. Classes are literal-codepoint ranges
# (the tokenizer convention) so Java/RE2 agree byte-for-byte.

_SCRIPTS = [
    ("latin", "[a-zA-Z]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[ά-ώΆ-Ϋ]"),
    ("cjk", "[一-鿿㐀-䶿豈-﫿]"),
    ("kana", "[゠-ヿ぀-ゟ]"),
]


@register(
    "script_mix_source",
    f"""WITH per AS (
  SELECT source,
         {", ".join(f"len(regexp_extract_all(text, '{pat}')) AS {name}" for name, pat in _SCRIPTS)}
  FROM documents)
SELECT source,
       {", ".join(f"CAST(sum({name}) AS BIGINT) AS n_{name}" for name, _ in _SCRIPTS)}
FROM per GROUP BY source ORDER BY source""",
)
def script_mix_source(spark, sf_dir):
    """Per-source script composition: exact character counts per Unicode
    script class (Latin/digit/Cyrillic/Greek/CJK/kana — the tokenizer's
    own literal ranges). The multilingual-corpus audit that catches
    mislabeled or mixed-script sources before lang-dependent stages
    (stopword lists, analyzers) run on them.

    Scale shape: six map-side regexp counters inside codegen folded into
    one sources-sized hash agg — the tokenizer_fertility plan widened."""
    d = _docs(spark, sf_dir)
    per = d.select(
        "source",
        *[
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).alias(name)
            for name, pat in _SCRIPTS
        ],
    )
    return (
        per.groupBy("source")
        .agg(*[F.sum(name).cast("long").alias(f"n_{name}") for name, _ in _SCRIPTS])
        .orderBy("source")
    )


# --- held-out perplexity under the corpus's own unigram LM -------------------

# the train/eval split reuses train_eval_split's md5 hex-5-8 coordinate
# VERBATIM so the evaluated split is the one the pipeline actually ships
_SPLIT_V_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))::UBIGINT::BIGINT % 100"
_SPLIT_V_SPARK = "cast(conv(substring(md5(cast(doc_id as string)), 5, 4), 16, 10) as bigint) % 100"
_OOV_NLP = (
    "CAST(round(-ln(1.0 / CAST(big_t + vocab + 1 AS DOUBLE)) * 1000000) AS BIGINT)"
)


@register(
    "heldout_unigram_ppl",
    f"""WITH tf AS MATERIALIZED ({SQL_TF}),
sp AS (SELECT doc_id, {_SPLIT_V_SQL} AS v FROM documents),
trtf AS MATERIALIZED (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf
  FROM tf JOIN sp USING (doc_id) WHERE v < 98 GROUP BY term),
st AS MATERIALIZED (
  SELECT CAST(COALESCE(sum(cf), 0) AS BIGINT) AS big_t,
         CAST(count(*) AS BIGINT) AS vocab FROM trtf),
nl AS (
  SELECT term, CAST(round(-ln(CAST(cf + 1 AS DOUBLE)
         / CAST(big_t + vocab + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS nlp_q6
  FROM trtf, st),
ev AS (SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf
       FROM tf JOIN sp USING (doc_id) WHERE v >= 98),
sc AS (
  SELECT CAST(COALESCE(sum(ev.tf * COALESCE(nl.nlp_q6, {_OOV_NLP})), 0) AS BIGINT) AS nll_q6,
         CAST(COALESCE(sum(ev.tf), 0) AS BIGINT) AS n_eval_tokens
  FROM ev LEFT JOIN nl USING (term) CROSS JOIN st),
ed AS (SELECT CAST(count(*) AS BIGINT) AS n_eval_docs FROM sp WHERE v >= 98)
SELECT st.big_t AS n_train_tokens, st.vocab AS train_vocab,
       ed.n_eval_docs, sc.n_eval_tokens, sc.nll_q6,
       CASE WHEN sc.n_eval_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * exp(CAST(sc.nll_q6 AS DOUBLE)
                 / (1.0e6 * CAST(sc.n_eval_tokens AS DOUBLE)))) AS BIGINT) END AS ppl_q6
FROM st, sc, ed""",
)
def heldout_unigram_ppl(spark, sf_dir):
    """Held-out perplexity — the LM-eval loop run end to end inside the
    engine: an add-1-smoothed unigram LM is TRAINED on the md5-5-8 train
    split (train_eval_split's exact coordinate, so what's evaluated is
    what ships) and scored on the held-out 2%. Per-TERM −ln p is
    q6-rounded FIRST (the unigram_logprob rule), the eval NLL is an
    exact BIGINT Σ tf·nlp_q6, and OOV terms take the add-1 floor
    1/(T+V+1) via a 1-row broadcast. Degenerate splits stay defined:
    an empty train side gives every eval term the OOV score; an empty
    eval side reports ppl 0 via the 0-token guard.

    Scale shape: tf materializes once and feeds both splits (the
    three-consumer unigram_logprob lesson); the LM is the A2 dictionary
    agg on the train side only; scoring is the postings ⋈ dictionary J1
    join with the 1-row stats broadcast. The final exp runs once on two
    exact integers."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    sp = _docs(spark, sf_dir).select("doc_id", F.expr(_SPLIT_V_SPARK).alias("v"))
    trtf = (
        tf.join(sp, "doc_id")
        .where(F.col("v") < 98)
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cf"))
    )
    st = trtf.agg(
        F.coalesce(F.sum("cf"), F.lit(0)).cast("long").alias("big_t"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    nl = trtf.crossJoin(F.broadcast(st)).select(
        "term",
        F.expr(
            "CAST(round(-ln(CAST(cf + 1 AS DOUBLE)"
            " / CAST(big_t + vocab + 1 AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("nlp_q6"),
    )
    ev = tf.join(sp, "doc_id").where(F.col("v") >= 98).select("doc_id", "term", "tf")
    sc = (
        ev.join(nl, "term", "left")
        .crossJoin(F.broadcast(st))
        .agg(
            F.coalesce(
                F.sum(F.col("tf") * F.expr(f"COALESCE(nlp_q6, {_OOV_NLP})")), F.lit(0)
            )
            .cast("long")
            .alias("nll_q6"),
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("n_eval_tokens"),
        )
    )
    ed = sp.where(F.col("v") >= 98).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_docs")
    )
    return (
        st.crossJoin(sc)
        .crossJoin(ed)
        .select(
            F.col("big_t").alias("n_train_tokens"),
            F.col("vocab").alias("train_vocab"),
            "n_eval_docs",
            "n_eval_tokens",
            "nll_q6",
            F.expr(
                "CASE WHEN n_eval_tokens = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(round(1000000 * exp(CAST(nll_q6 AS DOUBLE)"
                " / (1.0e6 * CAST(n_eval_tokens AS DOUBLE)))) AS BIGINT) END"
            ).alias("ppl_q6"),
        )
    )


# --- daily-count autocorrelation ---------------------------------------------
#
# ACF at lags 1..7 over the zero-filled day spine, from exact BIGINT
# sufficient stats: acf_k = [N²·Sxy − N·S·(Sh+St) + n_pairs·S²]
#                         / [N²·Sxx − N·S²]  (the ×N² clearing keeps every
# term an exact integer; at extreme daily counts the products approach
# 2^63 — there, divide first in doubles, the events_daily_anomaly note).

_ACF_NUM = "nd * nd * sxy - nd * s * (sh + stl) + n_pairs * s * s"
_ACF_DEN = "nd * nd * sxx - nd * s * s"
_ACF_Q6 = (
    f"CASE WHEN ({_ACF_DEN}) = 0 THEN CAST(0 AS BIGINT) "
    f"ELSE CAST(round(1000000 * CAST({_ACF_NUM} AS DOUBLE) / CAST({_ACF_DEN} AS DOUBLE)) AS BIGINT) END"
)


@register(
    "events_autocorrelation",
    f"""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day FROM events),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM bounds),
dc AS MATERIALIZED (
  SELECT spine.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
  FROM spine LEFT JOIN (SELECT day, count(*) AS n FROM e GROUP BY day) c USING (day)),
g AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n * n) AS BIGINT) AS sxx FROM dc),
ks AS (SELECT unnest(generate_series(1, 7)) AS k),
pr AS (SELECT ks.k, a.n AS x, b.n AS y
       FROM ks CROSS JOIN dc a JOIN dc b ON b.day = a.day + ks.k),
pk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_pairs, CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x) AS BIGINT) AS sh, CAST(sum(y) AS BIGINT) AS stl
       FROM pr GROUP BY k)
SELECT CAST(k AS BIGINT) AS k, n_pairs, {_ACF_Q6} AS acf_q6
FROM (SELECT ks.k, CAST(COALESCE(pk.n_pairs, 0) AS BIGINT) AS n_pairs,
             COALESCE(pk.sxy, 0) AS sxy, COALESCE(pk.sh, 0) AS sh,
             COALESCE(pk.stl, 0) AS stl, g.nd, g.s, g.sxx
      FROM ks LEFT JOIN pk USING (k) CROSS JOIN g)
ORDER BY k""",
)
def events_autocorrelation(spark, sf_dir):
    """Sample autocorrelation of the daily event count at lags 1..7 —
    the seasonality detector behind events_serial_diff's lag-7 choice
    (a weekly cycle shows as an acf_7 spike). Zero-filled calendar
    spine, global mean/variance and per-lag cross-products all as exact
    BIGINT sufficient stats; the single divide happens once per lag in
    one shared expr (a float Σ(x−μ)(y−μ) would be partial-agg-order
    dependent). Lags longer than the observed span emit n_pairs = 0
    rows with acf 0 — the COALESCE(...,0)-on-empty rule.

    Scale shape: the spine is calendar-bounded; the per-day agg
    combines map-side; the lag pairs come from a 7-row broadcast theta
    fan + an equi-join on day+k over the tiny spine table."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day")
    )
    counts = e.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n"))
    bounds = e.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
    dc = (
        spine.join(counts, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .localCheckpoint()
    )
    g = dc.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.expr("n * n")).cast("long").alias("sxx"),
    )
    ks = spark.createDataFrame([(k,) for k in range(1, 8)], "k long")
    a = dc.select(F.col("day").alias("da"), F.col("n").alias("x"))
    b = dc.select(F.col("day").alias("db"), F.col("n").alias("y"))
    pr = a.crossJoin(F.broadcast(ks)).join(b, F.expr("db = da + k"))
    pk = pr.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        F.sum("x").cast("long").alias("sh"),
        F.sum("y").cast("long").alias("stl"),
    )
    full = (
        spark.createDataFrame([(k,) for k in range(1, 8)], "k long")
        .join(pk, "k", "left")
        .crossJoin(F.broadcast(g))
        .select(
            "k",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("sxy", F.lit(0)).cast("long").alias("sxy"),
            F.coalesce("sh", F.lit(0)).cast("long").alias("sh"),
            F.coalesce("stl", F.lit(0)).cast("long").alias("stl"),
            "nd", "s", "sxx",
        )
    )
    return full.select(
        "k", "n_pairs", F.expr(_ACF_Q6).alias("acf_q6")
    ).orderBy("k")


# --- cross-source vocabulary overlap -----------------------------------------


@register(
    "source_vocab_overlap",
    f"""WITH t AS (
  SELECT DISTINCT source, term
  FROM (SELECT source, unnest(words) AS term FROM ({SQL_WORDS}))),
vs AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM t GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM t a JOIN t b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT sp.source_a, sp.source_b, sp.nv_a, sp.nv_b,
       CAST(COALESCE(i.n_shared, 0) AS BIGINT) AS n_shared,
       CAST((1000000 * COALESCE(i.n_shared, 0)) // (sp.nv_a + sp.nv_b - COALESCE(i.n_shared, 0)) AS BIGINT) AS jaccard_q6
FROM (SELECT a.source AS source_a, b.source AS source_b, a.nv AS nv_a, b.nv AS nv_b
      FROM vs a JOIN vs b ON a.source < b.source) sp
LEFT JOIN inter i USING (source_a, source_b)
ORDER BY source_a, source_b""",
)
def source_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary Jaccard between sources — the corpus-level
    similarity matrix (two crawls sharing 90% of their vocabulary are
    near-duplicates at the SOURCE granularity — merge or dedup them
    before the doc-level passes bother). Zero-overlap pairs still emit
    via the source-pair spine (COALESCE rule); the Jaccard is an exact
    integer micro-unit division.

    Scale shape: the distinct (source, term) table is one exchange; the
    intersection joins it to itself ON TERM — per-term fanout is bounded
    by |sources|², and |sources| is small by definition, so the pair agg
    and the spine crossJoin never grow with corpus size."""
    d = _docs(spark, sf_dir)
    t = (
        d.select("source", F.explode(spark_tokens("text")).alias("term"))
        .distinct()
        .localCheckpoint()
    )
    vs = t.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    ta = t.select(F.col("source").alias("source_a"), "term")
    tb = t.select(F.col("source").alias("source_b"), "term")
    inter = (
        ta.join(tb, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    va = vs.select(F.col("source").alias("source_a"), F.col("nv").alias("nv_a"))
    vb = vs.select(F.col("source").alias("source_b"), F.col("nv").alias("nv_b"))
    spine = va.crossJoin(vb).where(F.col("source_a") < F.col("source_b"))
    return (
        spine.join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a", "source_b", "nv_a", "nv_b",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.expr(
                "CAST((1000000 * COALESCE(n_shared, 0))"
                " div (nv_a + nv_b - COALESCE(n_shared, 0)) AS BIGINT)"
            ).alias("jaccard_q6"),
        )
        .orderBy("source_a", "source_b")
    )


# --- bloom sizing curve (the decontamination_bloom tuning diagnostic) --------

_BLOOM_MS = (4096, 16384, 65536)


@register(
    "bloom_fpr_curve",
    f"""WITH w AS ({SQL_WORDS}),
g AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
         || ' ' || words[i+4] || ' ' || words[i+5] || ' ' || words[i+6] || ' ' || words[i+7] AS g
  FROM w, unnest(generate_series(1, len(words) - 7)) AS t(i)
  WHERE len(words) >= 8),
ev AS MATERIALIZED (SELECT DISTINCT g FROM g WHERE doc_id % 29 = 0),
trg AS MATERIALIZED (SELECT DISTINCT g FROM g WHERE doc_id % 29 <> 0),
ms AS (SELECT unnest([{", ".join(str(m) for m in _BLOOM_MS)}]) AS m),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
evpos AS MATERIALIZED (
  SELECT DISTINCT m, ('0x' || substr(md5(g), 1 + 4 * j, 4))::UBIGINT::BIGINT % m AS pos
  FROM ev, js, ms),
fill AS (SELECT m, CAST(count(*) AS BIGINT) AS n_set_positions FROM evpos GROUP BY m),
cand AS (
  SELECT tp.m, CAST(count(*) AS BIGINT) AS n_candidates FROM (
    SELECT m, g FROM (
      SELECT ms.m, trg.g,
             ('0x' || substr(md5(trg.g), 1 + 4 * js.j, 4))::UBIGINT::BIGINT % ms.m AS pos, js.j
      FROM trg, js, ms) tj
    JOIN evpos USING (m, pos)
    GROUP BY m, g HAVING count(DISTINCT j) = 4) tp
  GROUP BY tp.m),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_probes,
         CAST(count(*) FILTER (g IN (SELECT g FROM ev)) AS BIGINT) AS n_exact
  FROM trg)
SELECT CAST(ms.m AS BIGINT) AS m,
       CAST(COALESCE(f.n_set_positions, 0) AS BIGINT) AS n_set_positions,
       s.n_probes, s.n_exact,
       CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(c.n_candidates, 0) - s.n_exact AS BIGINT) AS n_false_pos,
       CASE WHEN s.n_probes - s.n_exact = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * (COALESCE(c.n_candidates, 0) - s.n_exact))
                 // (s.n_probes - s.n_exact) AS BIGINT) END AS fpr_q6
FROM ms LEFT JOIN cand c USING (m) LEFT JOIN fill f USING (m) CROSS JOIN stats s
ORDER BY m""",
)
def bloom_fpr_curve(spark, sf_dir):
    """Bloom-filter sizing curve — decontamination_bloom's tuning
    diagnostic (the third member of the prefilter-tuning family next to
    lsh_band_config_curve and shingle_size_curve): the SAME k=4 md5-slice
    construction evaluated at m = 4096/16384/65536 positions, reporting
    fill, candidate count, and the measured false-positive rate against
    exact membership (candidates minus true members over non-member
    probes). Bloom filters have no false negatives, so n_candidates ≥
    n_exact at every m and FPR falls monotonically with m — both facts
    property-tested.

    Scale shape: probes are DISTINCT training grams (corpus-sized but
    deduplicated map-side); the position table stays ≤ m rows per size
    and broadcasts; the 4-of-4 check is one (m, g)-keyed agg; everything
    downstream is 3 rows."""
    docs = _docs(spark, sf_dir)
    w = docs.select("doc_id", spark_tokens("text").alias("words"))
    grams = (
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
    ev = grams.where(F.col("doc_id") % 29 == 0).select("g").distinct().localCheckpoint()
    trg = grams.where(F.col("doc_id") % 29 != 0).select("g").distinct().localCheckpoint()
    ms = spark.createDataFrame([(m,) for m in _BLOOM_MS], "m long")
    js = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    pos = F.expr(
        "cast(conv(substring(md5(g), 1 + 4 * j, 4), 16, 10) as bigint) % m"
    ).alias("pos")
    evpos = (
        ev.select("g", js).crossJoin(F.broadcast(ms)).select("m", pos).distinct()
        .localCheckpoint()
    )
    fill = evpos.groupBy("m").agg(F.count(F.lit(1)).cast("long").alias("n_set_positions"))
    tj = trg.select("g", js).crossJoin(F.broadcast(ms)).select("m", "g", "j", pos)
    cand = (
        tj.join(F.broadcast(evpos), ["m", "pos"])
        .groupBy("m", "g")
        .agg(F.countDistinct("j").alias("nj"))
        .where(F.col("nj") == 4)
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    )
    stats = trg.join(ev.withColumn("hit", F.lit(1)), "g", "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_exact"),
    )
    return (
        ms.join(cand, "m", "left")
        .join(fill, "m", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "m",
            F.coalesce("n_set_positions", F.lit(0)).cast("long").alias("n_set_positions"),
            "n_probes",
            "n_exact",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            (F.coalesce("n_candidates", F.lit(0)) - F.col("n_exact"))
            .cast("long")
            .alias("n_false_pos"),
            F.expr(
                "CASE WHEN n_probes - n_exact = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * (COALESCE(n_candidates, 0) - n_exact))"
                " div (n_probes - n_exact) AS BIGINT) END"
            ).alias("fpr_q6"),
        )
        .orderBy("m")
    )


# --- context-length truncation loss -------------------------------------------

_TRUNC_LS = (128, 512, 2048)


@register(
    "truncation_loss_curve",
    f"""WITH dl AS (
  SELECT source, len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS n_tok
  FROM documents),
ls AS (SELECT unnest([{", ".join(str(x) for x in _TRUNC_LS)}]) AS max_len)
SELECT source, CAST(max_len AS BIGINT) AS max_len,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (n_tok > max_len) AS BIGINT) AS n_truncated,
       CAST(sum(least(n_tok, max_len)) AS BIGINT) AS tokens_kept,
       CAST(sum(greatest(n_tok - max_len, 0)) AS BIGINT) AS tokens_lost,
       CASE WHEN sum(n_tok) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * CAST(sum(greatest(n_tok - max_len, 0)) AS BIGINT))
                 // CAST(sum(n_tok) AS BIGINT) AS BIGINT) END AS loss_share_q6
FROM dl, ls GROUP BY source, max_len ORDER BY source, max_len""",
)
def truncation_loss_curve(spark, sf_dir):
    """Context-length truncation loss per source at max_len 128/512/2048
    — the budget curve behind choosing a sequence length (vs paying for
    sliding_window_chunks): docs over the limit, tokens kept, tokens
    lost, and the lost share in exact micro-units. The doc length is the
    map-side tokenizer counter (no explode); the 3-limit fan is a
    broadcast of 3 rows.

    Scale shape: one corpus scan, one (source, max_len) agg with
    map-side combine into |sources|·3 rows."""
    d = _docs(spark, sf_dir)
    dl = d.select(
        "source",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0))
        .cast("long")
        .alias("n_tok"),
    )
    ls = spark.createDataFrame([(x,) for x in _TRUNC_LS], "max_len long")
    return (
        dl.crossJoin(F.broadcast(ls))
        .groupBy("source", "max_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr("CASE WHEN n_tok > max_len THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_truncated"),
            F.sum(F.expr("least(n_tok, max_len)")).cast("long").alias("tokens_kept"),
            F.sum(F.expr("greatest(n_tok - max_len, 0)")).cast("long").alias("tokens_lost"),
            F.sum("n_tok").cast("long").alias("tt"),
        )
        .select(
            "source", "max_len", "n_docs", "n_truncated", "tokens_kept", "tokens_lost",
            F.expr(
                "CASE WHEN tt = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * tokens_lost) div tt AS BIGINT) END"
            ).alias("loss_share_q6"),
        )
        .orderBy("source", "max_len")
    )


# --- per-source boilerplate trigrams ------------------------------------------


@register(
    "boilerplate_trigram_topk",
    f"""WITH w AS ({SQL_WORDS}),
g AS (
  SELECT source, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS g
  FROM w, unnest(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3),
c AS (SELECT source, g, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY source, g),
r AS (SELECT source, g, cnt,
             CAST(row_number() OVER (PARTITION BY source ORDER BY cnt DESC, g ASC) AS BIGINT) AS rn
      FROM c)
SELECT source, g, cnt, rn FROM r WHERE rn <= 5 ORDER BY source, rn""",
)
def boilerplate_trigram_topk(spark, sf_dir):
    """Top-5 word trigrams per source — the C4-style boilerplate detector
    (navigation chrome, cookie banners and license headers surface as
    implausibly frequent trigrams long before doc-level dedup sees them).
    Counting is the salted two-phase aggregation (top_terms_per_source's
    skew rule: a hot (source, gram) cell spreads over N_SALT reducers
    before the re-sum); the window ranks the pre-aggregated
    gram-vocabulary rows only.

    Scale shape: map-side gram explode → (source, g, salt) partial agg →
    (source, g) re-sum → per-source window over vocabulary-bounded rows;
    5 rows per source survive."""
    N_SALT = 16
    w = _docs(spark, sf_dir).select(
        "doc_id", "source", spark_tokens("text").alias("words")
    )
    g = (
        w.where(F.size("words") >= 3)
        .select(
            "source",
            (F.abs(F.xxhash64("doc_id")) % N_SALT).alias("salt"),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-3),"
                    " i -> concat_ws(' ', words[i], words[i+1], words[i+2]))"
                )
            ).alias("g"),
        )
    )
    partial = g.groupBy("source", "g", "salt").agg(F.count(F.lit(1)).alias("pcnt"))
    c = partial.groupBy("source", "g").agg(F.sum("pcnt").cast("long").alias("cnt"))
    win = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("g"))
    return (
        c.withColumn("rn", F.row_number().over(win).cast("long"))
        .where(F.col("rn") <= 5)
        .orderBy("source", "rn")
    )


# ---------------------------------------------------------------------------
# session 47 — nonparametric two-sample inference (KS / Mann-Whitney) and
# pairwise source-LM Jensen-Shannon divergence
# ---------------------------------------------------------------------------

# KS/MWU run over the (lang, n_tok) WEIGHTED HISTOGRAM — the same
# never-buffer-raw-values rule as doclen_quantiles: the cumulative windows
# see histogram cells (bounded by distinct document lengths, ~1e5 rows at
# any corpus size), never documents. The D statistic is kept integer until
# the single final division: D = max |nb*cum_a - na*cum_b| / (na*nb), all
# BIGINT cross-multiplications (exact to na, nb ~ 1e9).


@register(
    "ks_test_doclen",
    f"""WITH t AS (
  SELECT lang, CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents WHERE lang IN ('en', 'zh')),
hist AS (
  SELECT n_tok,
         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS cb
  FROM t GROUP BY n_tok),
c AS (
  SELECT n_tok,
         CAST(SUM(ca) OVER (ORDER BY n_tok) AS BIGINT) AS cuma,
         CAST(SUM(cb) OVER (ORDER BY n_tok) AS BIGINT) AS cumb
  FROM hist),
tot AS (SELECT CAST(COALESCE(sum(ca), 0) AS BIGINT) AS na,
               CAST(COALESCE(sum(cb), 0) AS BIGINT) AS nb FROM hist),
d AS (SELECT n_tok, abs(nb * cuma - na * cumb) AS diff FROM c, tot),
m AS (SELECT CAST(COALESCE(max(diff), 0) AS BIGINT) AS mx FROM d)
SELECT na, nb,
       CASE WHEN na * nb = 0 THEN 0
            ELSE CAST(round(1000000.0 * mx / (na * nb)) AS BIGINT) END AS d_q6,
       CAST(COALESCE((SELECT min(n_tok) FROM d WHERE diff = (SELECT mx FROM m)), -1) AS BIGINT) AS at_n_tok
FROM tot, m""",
)
def ks_test_doclen(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the 'en' and 'zh'
    token-length distributions — the distribution-level counterpart of
    ttest_lang_doclen (which only compares means): D = sup |F_en - F_zh|,
    plus the length at which the gap peaks (where the distributions
    actually diverge — the actionable readout for a length-filter audit).
    Completes the inference-agg family: mean (t-test), categorical
    (chi-squared), and now whole-CDF shape.

    Determinism: D is the max of |nb*cum_a - na*cum_b| over histogram
    cells — pure BIGINT cross-multiplication (doclen_quantiles' integer
    rule); the single division happens once on two exact integers. The
    argmax location takes min(n_tok) among maximizers, identical both
    engines.

    Scale shape: one map-side histogram agg to (n_tok, ca, cb) cells; the
    cumulative window runs over histogram rows only (bounded by distinct
    lengths regardless of corpus size — same argument as
    doclen_quantiles); output is 1 row."""
    t = (
        _docs(spark, sf_dir)
        .where(F.col("lang").isin("en", "zh"))
        .select("lang", F.size(spark_tokens("text")).cast("long").alias("n_tok"))
    )
    hist = t.groupBy("n_tok").agg(
        F.count_if(F.col("lang") == "en").cast("long").alias("ca"),
        F.count_if(F.col("lang") == "zh").cast("long").alias("cb"),
    )
    hist = hist.localCheckpoint()  # feeds totals AND the cumulative window
    tot = hist.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("na"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nb"),
    )
    w = Window.orderBy("n_tok").rowsBetween(Window.unboundedPreceding, 0)
    c = hist.select(
        "n_tok",
        F.sum("ca").over(w).cast("long").alias("cuma"),
        F.sum("cb").over(w).cast("long").alias("cumb"),
    )
    d = (
        c.crossJoin(F.broadcast(tot))
        .select(
            "n_tok", "na", "nb", F.expr("abs(nb * cuma - na * cumb)").alias("diff")
        )
        .localCheckpoint()  # feeds the max AND the argmax join-back
    )
    m = d.agg(F.coalesce(F.max("diff"), F.lit(0)).cast("long").alias("mx"))
    at = (
        d.join(F.broadcast(m), F.col("diff") == F.col("mx"))
        .agg(F.coalesce(F.min("n_tok"), F.lit(-1)).cast("long").alias("at_n_tok"))
    )
    return (
        tot.crossJoin(m)
        .crossJoin(at)
        .select(
            "na",
            "nb",
            F.expr(
                "CASE WHEN na * nb = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * mx / (na * nb)) AS BIGINT) END"
            ).alias("d_q6"),
            "at_n_tok",
        )
    )


@register(
    "mannwhitney_doclen",
    f"""WITH t AS (
  SELECT lang, CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents WHERE lang IN ('en', 'zh')),
hist AS (
  SELECT n_tok,
         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS cb
  FROM t GROUP BY n_tok),
c AS (
  SELECT ca, cb,
         CAST(COALESCE(SUM(cb) OVER (ORDER BY n_tok
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb_before
  FROM hist),
s AS (SELECT CAST(COALESCE(sum(ca), 0) AS BIGINT) AS na,
             CAST(COALESCE(sum(cb), 0) AS BIGINT) AS nb,
             CAST(COALESCE(sum(ca * (2 * cb_before + cb)), 0) AS BIGINT) AS u2
      FROM c)
SELECT na, nb, u2,
       CASE WHEN na * nb = 0 THEN 0
            ELSE CAST(round(1000000.0 * (u2 - na * nb) / (na * nb)) AS BIGINT) END AS rb_q6
FROM s""",
)
def mannwhitney_doclen(spark, sf_dir):
    """Mann-Whitney U between 'en' and 'zh' token lengths — the rank-based
    two-sample test that is robust where ttest_lang_doclen is not (heavy
    Zipf tails make doclen means meaningless). Ties handled by midranks:
    U = sum over values v of ca(v)·(cb_less(v) + cb(v)/2), emitted as the
    EXACT integer 2U = Σ ca·(2·cb_before + cb) so no half ever floats.
    rb_q6 is the rank-biserial effect size (2U/(na·nb) − 1): 0 = no
    stochastic dominance, ±1e6 = total separation.

    Scale shape: identical to ks_test_doclen — one histogram agg, one
    exclusive-prefix window over histogram cells, a 1-row output. The
    2U sum stays under 2^63 to na·nb ~ 4e18 pair comparisons (~1e9 docs
    per side)."""
    t = (
        _docs(spark, sf_dir)
        .where(F.col("lang").isin("en", "zh"))
        .select("lang", F.size(spark_tokens("text")).cast("long").alias("n_tok"))
    )
    hist = t.groupBy("n_tok").agg(
        F.count_if(F.col("lang") == "en").cast("long").alias("ca"),
        F.count_if(F.col("lang") == "zh").cast("long").alias("cb"),
    )
    w = Window.orderBy("n_tok").rowsBetween(Window.unboundedPreceding, -1)
    c = hist.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w), F.lit(0)).cast("long").alias("cb_before"),
    )
    s = c.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("na"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nb"),
        F.coalesce(F.sum(F.expr("ca * (2 * cb_before + cb)")), F.lit(0))
        .cast("long")
        .alias("u2"),
    )
    return s.select(
        "na",
        "nb",
        "u2",
        F.expr(
            "CASE WHEN na * nb = 0 THEN 0"
            " ELSE CAST(round(1000000.0 * (u2 - na * nb) / (na * nb)) AS BIGINT) END"
        ).alias("rb_q6"),
    )


# Jensen-Shannon divergence between two source unigram LMs, decomposed so
# single-source terms are NEVER enumerated: for terms present in both
# sources the per-term contribution is q6-rounded FIRST (the KL-family
# rule); the terms present in only one source contribute exactly
# (ln 2 / 2)·(residual mass), computed ONCE from four exact integers —
# no pairs×vocab spine, the join carries co-occurring terms only.
_LN2_HALF = f"{math.log(2.0) / 2.0:.17e}"
_JSD_TERM_EXPR = (
    "cast(round(500000 * ("
    "(ca / cast(na as double)) * ln(2 * (ca / cast(na as double))"
    " / ((ca / cast(na as double)) + (cb / cast(nb as double))))"
    " + (cb / cast(nb as double)) * ln(2 * (cb / cast(nb as double))"
    " / ((ca / cast(na as double)) + (cb / cast(nb as double))))"
    ")) as bigint)"
)
_JSD_RESID_EXPR = (
    f"cast(round(1000000 * {_LN2_HALF} * "
    "(((na - sa_int) / cast(na as double)) + ((nb - sb_int) / cast(nb as double)))"
    ") as bigint)"
)


@register(
    "jsd_source_pairs",
    f"""WITH w AS ({SQL_WORDS}),
st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
       FROM (SELECT source, unnest(words) AS term FROM w) GROUP BY source, term),
stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY source),
ix AS (
  SELECT a.source AS src_a, b.source AS src_b, a.c AS ca, b.c AS cb
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source),
ij AS (
  SELECT src_a, src_b,
         CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum(ca) AS BIGINT) AS sa_int, CAST(sum(cb) AS BIGINT) AS sb_int,
         CAST(max(ta.n) AS BIGINT) AS na, CAST(max(tb.n) AS BIGINT) AS nb,
         CAST(sum({_JSD_TERM_EXPR.replace('na', 'ta.n').replace('nb', 'tb.n')}) AS BIGINT) AS int_q6
  FROM ix JOIN stot ta ON ta.source = ix.src_a JOIN stot tb ON tb.source = ix.src_b
  GROUP BY src_a, src_b)
SELECT src_a, src_b, n_shared,
       CAST(int_q6 + {_JSD_RESID_EXPR} AS BIGINT) AS jsd_q6
FROM ij ORDER BY src_a, src_b""",
)
def jsd_source_pairs(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between source unigram LMs — the
    SYMMETRIC, bounded ([0, ln 2]) cousin of term_drift_deciles' KL: the
    standard corpus-similarity matrix a data-mixing run reads before
    merging or re-weighting sources (two sources at jsd ≈ 0 are redundant;
    near ln 2 ≈ 0.693 they are disjoint registers). Decomposition: terms
    shared by both sources get per-term q6-rounded contributions (BIGINT
    sum); single-source terms collapse into (ln 2 / 2)·(residual mass),
    one float expression over four exact integers — so the op never
    enumerates a pairs×vocab spine.

    Scale shape: the per-source term table is vocab-bounded; the pair
    join is TERM-keyed (fanout |sources|² per term, sources are tens);
    per-pair aggregation is map-side-combinable; totals broadcast.
    Output is |source-pairs| rows."""
    st = (
        _docs(spark, sf_dir)
        .select("source", F.explode(spark_tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    st = st.localCheckpoint()  # feeds totals AND both sides of the pair join
    stot = st.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = st.select(F.col("source").alias("src_a"), "term", F.col("c").alias("ca"))
    b = st.select(F.col("source").alias("src_b"), "term", F.col("c").alias("cb"))
    ix = a.join(b, "term").where(F.col("src_a") < F.col("src_b"))
    ta = F.broadcast(stot.select(F.col("source").alias("src_a"), F.col("n").alias("na")))
    tb = F.broadcast(stot.select(F.col("source").alias("src_b"), F.col("n").alias("nb")))
    ij = (
        ix.join(ta, "src_a")
        .join(tb, "src_b")
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum("ca").cast("long").alias("sa_int"),
            F.sum("cb").cast("long").alias("sb_int"),
            F.max("na").cast("long").alias("na"),
            F.max("nb").cast("long").alias("nb"),
            F.sum(F.expr(_JSD_TERM_EXPR)).cast("long").alias("int_q6"),
        )
    )
    return ij.select(
        "src_a",
        "src_b",
        "n_shared",
        (F.col("int_q6") + F.expr(_JSD_RESID_EXPR)).cast("long").alias("jsd_q6"),
    ).orderBy("src_a", "src_b")


# ---------------------------------------------------------------------------
# session 47b — weighted priority sampling, stupid-backoff trigram LM,
# minhash fuzzy decontamination
# ---------------------------------------------------------------------------


@register(
    "weighted_sample_docs",
    f"""WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
k AS (
  SELECT doc_id, source, n_tok,
         CAST(round(1000000 * ln(
           ('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
           / 4503599627370496.0) / n_tok) AS BIGINT) AS key_q6
  FROM t WHERE n_tok > 0)
SELECT doc_id, source, n_tok, key_q6 FROM k
ORDER BY key_q6 DESC, doc_id ASC LIMIT 100""",
)
def weighted_sample_docs(spark, sf_dir):
    """Weight-proportional sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES, the distributed-systems standard): doc i gets key
    u_i^(1/w_i) — equivalently ln(u_i)/w_i, monotone — and the sample is
    the top-100 keys. Weights are token counts, so the sample is
    token-mass-proportional: the shape a data-mix ablation needs when
    'pick 100 docs uniformly' (priority_sample_docs) would over-represent
    tiny documents. u is the exact-double 52-bit md5 uniform of
    bootstrap_mean_doclen, seeded 'ws:'||doc_id — a hash input disjoint
    from every hex-range coordinate, so sampling stays orthogonal to
    shard/split/fold. Zero-weight (empty) docs are unsampleable and
    excluded, matching the w->0 limit.

    Determinism: key_q6 is q6-rounded per doc FIRST (one ln per doc,
    the zipf_slope rule), then a (key_q6 desc, doc_id asc) TakeOrdered.

    Scale shape: map-side key computation + TakeOrdered(100) — per-
    partition top-100, driver merges partition heads; no global sort."""
    t = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    k = t.where(F.col("n_tok") > 0).select(
        "doc_id",
        "source",
        "n_tok",
        F.expr(
            "CAST(round(1000000 * ln("
            "cast(conv(substring(md5(concat('ws:', cast(doc_id as string))), 1, 13), 16, 10) as bigint)"
            " / 4503599627370496.0) / n_tok) AS BIGINT)"
        ).alias("key_q6"),
    )
    return k.orderBy(F.desc("key_q6"), F.asc("doc_id")).limit(100)


# Stupid backoff (Brants et al. 2007, "Large Language Models in Machine
# Translation"): S(w3|w1w2) = c123/c12, backing off with alpha = 0.4 per
# level; the unigram floor is add-1 smoothed (heldout_unigram_ppl's
# convention) so OOV words score finitely. Scores are relative
# frequencies, NOT normalized probabilities — that is the published
# trade: no discount bookkeeping, so every level is one count join.
# Alpha literals are e-notation (4e-1, 16e-2) — a plain 0.4 is DECIMAL
# in Spark SQL and diverges (the _HLL_C lesson).
# Placeholders TRI_C/BI12_C/BI23_C/UNI2_C/UNI3_C are deliberately non-
# overlapping strings (a naive c12/c123 naming makes chained .replace()
# corrupt the longer token) — each engine substitutes its own column refs.
_SB_NLP_CASE = (
    "CASE WHEN TRI_C IS NOT NULL THEN"
    " CAST(round(-ln(CAST(TRI_C AS DOUBLE) / BI12_C) * 1000000) AS BIGINT)"
    " WHEN BI23_C IS NOT NULL THEN"
    " CAST(round(-ln(4e-1 * CAST(BI23_C AS DOUBLE) / UNI2_C) * 1000000) AS BIGINT)"
    " ELSE"
    " CAST(round(-ln(16e-2 * CAST(COALESCE(UNI3_C, 0) + 1 AS DOUBLE)"
    " / (big_n + vocab + 1)) * 1000000) AS BIGINT) END"
)


def _sb_nlp(tri_c: str, bi12_c: str, bi23_c: str, uni2_c: str, uni3_c: str) -> str:
    return (
        _SB_NLP_CASE.replace("TRI_C", tri_c)
        .replace("BI12_C", bi12_c)
        .replace("BI23_C", bi23_c)
        .replace("UNI2_C", uni2_c)
        .replace("UNI3_C", uni3_c)
    )


@register(
    "stupid_backoff_surprisal",
    f"""WITH w AS MATERIALIZED (
  SELECT doc_id, source, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words,
         {_SPLIT_V_SQL} AS v
  FROM documents),
tri AS MATERIALIZED (
  SELECT words[i] AS w1, words[i+1] AS w2, words[i+2] AS w3,
         CAST(count(*) AS BIGINT) AS c123
  FROM w, unnest(generate_series(1, len(words) - 2)) AS t(i)
  WHERE v < 98 AND len(words) >= 3 GROUP BY 1, 2, 3),
bi AS MATERIALIZED (
  SELECT words[i] AS a, words[i+1] AS b, CAST(count(*) AS BIGINT) AS cb
  FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
  WHERE v < 98 AND len(words) >= 2 GROUP BY 1, 2),
uc AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(words) AS term FROM w WHERE v < 98) GROUP BY term),
st AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS big_n,
              CAST(count(*) AS BIGINT) AS vocab FROM uc),
evt AS (
  SELECT source, words[i] AS w1, words[i+1] AS w2, words[i+2] AS w3,
         CAST(count(*) AS BIGINT) AS tf
  FROM w, unnest(generate_series(1, len(words) - 2)) AS t(i)
  WHERE v >= 98 AND len(words) >= 3 GROUP BY 1, 2, 3, 4),
sc AS (
  SELECT evt.source, evt.tf,
         CASE WHEN tri.c123 IS NOT NULL THEN 0
              WHEN b23.cb IS NOT NULL THEN 1 ELSE 2 END AS lvl,
         {_sb_nlp('tri.c123', 'b12.cb', 'b23.cb', 'u2.c', 'u3.c')} AS nlp_q6
  FROM evt
  LEFT JOIN tri ON tri.w1 = evt.w1 AND tri.w2 = evt.w2 AND tri.w3 = evt.w3
  LEFT JOIN bi b12 ON b12.a = evt.w1 AND b12.b = evt.w2
  LEFT JOIN bi b23 ON b23.a = evt.w2 AND b23.b = evt.w3
  LEFT JOIN uc u2 ON u2.term = evt.w2
  LEFT JOIN uc u3 ON u3.term = evt.w3
  CROSS JOIN st)
SELECT source,
       CAST(COALESCE(sum(tf), 0) AS BIGINT) AS n_scored,
       CAST(COALESCE(sum(tf) FILTER (WHERE lvl = 0), 0) AS BIGINT) AS n_tri,
       CAST(COALESCE(sum(tf) FILTER (WHERE lvl = 1), 0) AS BIGINT) AS n_bi,
       CAST(COALESCE(sum(tf) FILTER (WHERE lvl = 2), 0) AS BIGINT) AS n_uni,
       CAST(COALESCE(sum(tf * nlp_q6), 0) AS BIGINT) AS nll_q6
FROM sc GROUP BY source ORDER BY source""",
)
def stupid_backoff_surprisal(spark, sf_dir):
    """Trigram stupid-backoff LM (Brants et al. 2007) trained on the
    md5-5-8 train split and scored on the held-out 2% — the trigram
    extension of heldout_unigram_ppl, reporting per source both the NLL
    and the BACKOFF LEVEL CENSUS (n_tri/n_bi/n_uni): the level mix is
    the actionable diagnostic (a source scoring mostly at the unigram
    level shares no 3-gram structure with the training mix). Per-trigram
    -ln S is q6-rounded FIRST (one CASE, one ln per eval trigram type),
    the rollup is an exact BIGINT Σ tf·nlp_q6.

    Invariants a trigram hit relies on: c123 in train implies its prefix
    bigram b12 and its suffix bigram b23 exist in train, and c23 implies
    w2 in the train vocab — so no guarded division ever sees NULL.

    Scale shape: the corpus tokenizes ONCE into a checkpointed word-array
    table; trigram/bigram/unigram train counts and the eval trigram table
    are four map-side explodes of those arrays into hash aggs (Zipf-
    bounded type tables, never position self-joins — the cooccurrence
    rule). Scoring joins the SMALL eval side against the count tables on
    their natural n-gram keys; level stats and the 1-row (N, V) table
    broadcast."""
    w = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "source",
            spark_tokens("text").alias("words"),
            F.expr(_SPLIT_V_SPARK).alias("v"),
        )
        .localCheckpoint()  # four explodes below — tokenize exactly once
    )
    tr_w = w.where(F.col("v") < 98)
    tri = (
        tr_w.where(F.size("words") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-3), i -> "
                    "struct(words[i] AS w1, words[i+1] AS w2, words[i+2] AS w3))"
                )
            ).alias("t")
        )
        .select("t.w1", "t.w2", "t.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c123"))
    )
    bi = (
        tr_w.where(F.size("words") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-2), i -> "
                    "struct(words[i] AS a, words[i+1] AS b))"
                )
            ).alias("t")
        )
        .select("t.a", "t.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    uc = (
        tr_w.select(F.explode("words").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stt = uc.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("big_n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    evt = (
        w.where((F.col("v") >= 98) & (F.size("words") >= 3))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-3), i -> "
                    "struct(words[i] AS w1, words[i+1] AS w2, words[i+2] AS w3))"
                )
            ).alias("t"),
        )
        .select("source", "t.w1", "t.w2", "t.w3")
        .groupBy("source", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    b12 = bi.select(F.col("a").alias("w1"), F.col("b").alias("w2"), F.col("cb").alias("c12x"))
    b23 = bi.select(F.col("a").alias("w2"), F.col("b").alias("w3"), F.col("cb").alias("c23x"))
    u2 = uc.select(F.col("term").alias("w2"), F.col("c").alias("c2x"))
    u3 = uc.select(F.col("term").alias("w3"), F.col("c").alias("c3x"))
    sc = (
        evt.join(tri, ["w1", "w2", "w3"], "left")
        .join(b12, ["w1", "w2"], "left")
        .join(b23, ["w2", "w3"], "left")
        .join(u2, ["w2"], "left")
        .join(u3, ["w3"], "left")
        .crossJoin(F.broadcast(stt))
        .select(
            "source",
            "tf",
            F.expr(
                "CASE WHEN c123 IS NOT NULL THEN 0"
                " WHEN c23x IS NOT NULL THEN 1 ELSE 2 END"
            ).alias("lvl"),
            F.expr(_sb_nlp("c123", "c12x", "c23x", "c2x", "c3x")).alias("nlp_q6"),
        )
    )
    return (
        sc.groupBy("source")
        .agg(
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("n_scored"),
            F.coalesce(F.sum(F.when(F.col("lvl") == 0, F.col("tf"))), F.lit(0))
            .cast("long")
            .alias("n_tri"),
            F.coalesce(F.sum(F.when(F.col("lvl") == 1, F.col("tf"))), F.lit(0))
            .cast("long")
            .alias("n_bi"),
            F.coalesce(F.sum(F.when(F.col("lvl") == 2, F.col("tf"))), F.lit(0))
            .cast("long")
            .alias("n_uni"),
            F.coalesce(F.sum(F.expr("tf * nlp_q6")), F.lit(0))
            .cast("long")
            .alias("nll_q6"),
        )
        .orderBy("source")
    )


@register(
    "decontamination_minhash",
    f"""WITH sh AS ({_SQL_SHINGLES}),
sig AS (
  SELECT doc_id,
         min(md5('0:' || sh)) || min(md5('1:' || sh)) AS band0,
         min(md5('2:' || sh)) || min(md5('3:' || sh)) AS band1
  FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, band0 AS band FROM sig UNION ALL SELECT doc_id, band1 FROM sig),
ev AS (SELECT DISTINCT band, doc_id AS eval_id FROM bands WHERE doc_id % 29 = 0),
tr AS (
  SELECT b.doc_id, CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n
  FROM bands b JOIN ev USING (band)
  WHERE b.doc_id % 29 <> 0 GROUP BY b.doc_id)
SELECT d.doc_id, CAST(COALESCE(tr.n, 0) AS BIGINT) AS n_eval_matches,
       CAST(COALESCE(tr.n, 0) > 0 AS INT) AS contaminated_fuzzy
FROM documents d LEFT JOIN tr ON d.doc_id = tr.doc_id
WHERE d.doc_id % 29 <> 0 ORDER BY d.doc_id""",
)
def decontamination_minhash(spark, sf_dir):
    """FUZZY benchmark decontamination: training docs whose MinHash-LSH
    band collides with any eval-split doc (doc_id % 29 == 0, the
    decontamination_ngram_overlap split) — the near-duplicate
    complement of the exact 8-gram check (a lightly paraphrased eval
    answer shares no verbatim 8-gram but keeps most of its 3-shingle
    set, so its minhash bands still collide). Reuses the corpus LSH
    parameters verbatim (4 permutations, 2 bands of 2 — minhash_lsh_pairs),
    so 'contaminated_fuzzy' triggers at the same similarity threshold the
    dedup pass uses. Reports per training doc the count of DISTINCT eval
    docs collided with.

    Scale shape: the eval band table is benchmark-sized and BROADCASTS
    (the decontamination invariant: eval ≪ corpus); the training side
    streams map-side through the hash join — the count-distinct
    aggregates collision rows only, never the corpus."""
    sh = _shingles_spark(spark, sf_dir)
    sig = sh.groupBy("doc_id").agg(
        F.concat(
            F.min(F.md5(F.concat(F.lit("0:"), F.col("sh")))),
            F.min(F.md5(F.concat(F.lit("1:"), F.col("sh")))),
        ).alias("band0"),
        F.concat(
            F.min(F.md5(F.concat(F.lit("2:"), F.col("sh")))),
            F.min(F.md5(F.concat(F.lit("3:"), F.col("sh")))),
        ).alias("band1"),
    )
    bands = sig.select("doc_id", F.col("band0").alias("band")).unionByName(
        sig.select("doc_id", F.col("band1").alias("band"))
    )
    ev = F.broadcast(
        bands.where(F.col("doc_id") % 29 == 0)
        .select("band", F.col("doc_id").alias("eval_id"))
        .distinct()
    )
    tr = (
        bands.where(F.col("doc_id") % 29 != 0)
        .join(ev, "band")
        .groupBy("doc_id")
        .agg(F.countDistinct("eval_id").cast("long").alias("n"))
    )
    return (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") % 29 != 0)
        .select("doc_id")
        .join(tr, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_eval_matches"),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).cast("int").alias("contaminated_fuzzy"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# session 47c — linear hybrid retriever, field_value_factor scoring,
# Benford first-digit audit
# ---------------------------------------------------------------------------

# min-max leg normalization over exact q6 integers; a degenerate leg
# (max == min over its top-20) contributes 0, and a doc absent from a leg
# contributes 0 for that leg (the ES `linear` retriever convention).
_LIN_NORM = (
    "CASE WHEN {id} IS NULL OR {mx} = {mn} THEN cast(0 as double)"
    " ELSE ({s} - {mn}) / CAST({mx} - {mn} AS DOUBLE) END"
)


@register(
    "hybrid_linear_search",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
lex AS (SELECT doc_id, score_q6 FROM agg WHERE doc_id <> 0
        ORDER BY score_q6 DESC, doc_id ASC LIMIT 20),
lst AS (SELECT min(score_q6) AS lmn, max(score_q6) AS lmx FROM lex),
vq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vc AS (
  SELECT e.vec_id AS doc_id,
         CAST(round(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), vq.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(vq.qv, vq.qv))) * 1000000
         ) AS BIGINT) AS cos_q6
  FROM embeddings e, vq WHERE e.vec_id <> 0),
vec AS (SELECT doc_id, cos_q6 FROM vc ORDER BY cos_q6 DESC, doc_id ASC LIMIT 20),
vst AS (SELECT min(cos_q6) AS vmn, max(cos_q6) AS vmx FROM vec),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         CAST(COALESCE(lex.score_q6, 0) AS BIGINT) AS lex_q6,
         CAST(COALESCE(vec.cos_q6, 0) AS BIGINT) AS vec_q6,
         CAST(round(
           700000 * ({_LIN_NORM.format(id='lex.doc_id', s='lex.score_q6', mn='lmn', mx='lmx')})
         + 300000 * ({_LIN_NORM.format(id='vec.doc_id', s='vec.cos_q6', mn='vmn', mx='vmx')})
         ) AS BIGINT) AS lin_q6
  FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id, lst, vst)
SELECT doc_id, lex_q6, vec_q6, lin_q6 FROM fused
ORDER BY lin_q6 DESC, doc_id ASC LIMIT 10""",
)
def hybrid_linear_search(spark, sf_dir):
    """Hybrid retrieval via weighted linear combination of min-max
    normalized legs (the ES 8.16 ``linear`` retriever; also the standard
    academic fusion baseline CombSUM-normalized): 0.7·norm(BM25 top-20) +
    0.3·norm(cosine top-20). Complements hybrid_rrf — RRF fuses RANKS
    (scale-free, robust), linear fuses normalized SCORES (preserves
    score gaps, tunable weights); shipping both is what ES does.

    Determinism: each leg ranks and normalizes over its QUANTIZED q6
    scores, min/max are exact integers, and the combination is one
    shared float expression (weights as integer 700000/300000 — never
    decimal literals, which are DECIMAL in Spark SQL).

    Scale shape: identical to hybrid_rrf — each leg ends in a
    TakeOrdered(20), the leg stats are 20-row aggs that broadcast, and
    fusion sees ≤40 rows regardless of corpus size."""
    lex = (
        _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
        .where(F.col("doc_id") != 0)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "score_q6")
        .localCheckpoint()  # feeds the fusion join AND the 20-row stats agg
    )
    lst = lex.agg(F.min("score_q6").alias("lmn"), F.max("score_q6").alias("lmx"))
    vec = (
        _cos_spark(spark, sf_dir)
        .select(F.col("vec_id").alias("doc_id"), _q6(F.col("cos")).alias("cos_q6"))
        .orderBy(F.desc("cos_q6"), F.asc("doc_id"))
        .limit(20)
        .localCheckpoint()
    )
    vst = vec.agg(F.min("cos_q6").alias("vmn"), F.max("cos_q6").alias("vmx"))
    a = lex.select(F.col("doc_id").alias("ldoc"), "score_q6")
    b = vec.select(F.col("doc_id").alias("vdoc"), "cos_q6")
    fused = (
        a.join(b, F.col("ldoc") == F.col("vdoc"), "full")
        .crossJoin(F.broadcast(lst))
        .crossJoin(F.broadcast(vst))
        .select(
            F.coalesce(F.col("ldoc"), F.col("vdoc")).alias("doc_id"),
            F.coalesce(F.col("score_q6"), F.lit(0)).cast("long").alias("lex_q6"),
            F.coalesce(F.col("cos_q6"), F.lit(0)).cast("long").alias("vec_q6"),
            F.expr(
                "CAST(round("
                f"700000 * ({_LIN_NORM.format(id='ldoc', s='score_q6', mn='lmn', mx='lmx')})"
                f" + 300000 * ({_LIN_NORM.format(id='vdoc', s='cos_q6', mn='vmn', mx='vmx')})"
                ") AS BIGINT)"
            ).alias("lin_q6"),
        )
    )
    return fused.orderBy(F.desc("lin_q6"), F.asc("doc_id")).limit(10)


@register(
    "field_value_factor_search",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
boosted AS (
  SELECT agg.doc_id, agg.score_q6,
         CAST(round(ln(1 + d.n_chars) * 1000000) AS BIGINT) AS boost_q6
  FROM agg JOIN documents d ON d.doc_id = agg.doc_id
  WHERE agg.doc_id <> 0)
SELECT doc_id, score_q6, boost_q6,
       CAST((score_q6 * boost_q6) // 1000000 AS BIGINT) AS final_q6
FROM boosted ORDER BY final_q6 DESC, doc_id ASC LIMIT 10""",
)
def field_value_factor_search(spark, sf_dir):
    """ES ``function_score`` with ``field_value_factor`` (field n_chars,
    modifier ln1p, multiply mode): final = bm25 · ln(1 + n_chars) — the
    document-length/popularity boost every content site layers over
    relevance (function_score_decay covers the date-decay flavor; this is
    the numeric-field flavor that completes the function_score family).

    Determinism: boost_q6 = round(1e6·ln(1+n_chars)) per doc FIRST (one
    libm ln per doc), then final = (score_q6 · boost_q6) div 1e6 — an
    all-integer product/floor-division of NON-NEGATIVE values, where
    Spark's div (truncate) and DuckDB's // (floor) agree.

    Scale shape: the boost join is match-set ⋈ metadata on doc_id (the
    J2 shape — at 100 TB the match set is the small side and broadcasts);
    ln runs map-side in codegen; top-10 is a TakeOrdered."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS).where(F.col("doc_id") != 0)
    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    boosted = agg.join(d, "doc_id").select(
        "doc_id",
        "score_q6",
        F.expr("CAST(round(ln(1 + n_chars) * 1000000) AS BIGINT)").alias("boost_q6"),
    )
    return (
        boosted.select(
            "doc_id",
            "score_q6",
            "boost_q6",
            F.expr("CAST((score_q6 * boost_q6) div 1000000 AS BIGINT)").alias("final_q6"),
        )
        .orderBy(F.desc("final_q6"), F.asc("doc_id"))
        .limit(10)
    )


# Benford expected first-digit masses log10(1+1/d), folded to q6 integers in
# Python (the _HLL_C constant-folding rule) so both engines compare against
# identical integers.
_BENFORD_EXP = [(d, round(1_000_000 * math.log10(1 + 1 / d))) for d in range(1, 10)]
_BENFORD_VALUES = ", ".join(f"({d}, {e})" for d, e in _BENFORD_EXP)
_BENFORD_X2 = (
    "CASE WHEN n_tot = 0 THEN 0 ELSE CAST(round("
    "1000000 * (o - n_tot * (exp_q6 / 1000000.0))"
    " * (o - n_tot * (exp_q6 / 1000000.0))"
    " / (n_tot * (exp_q6 / 1000000.0))) AS BIGINT) END"
)


@register(
    "benford_value_audit",
    f"""WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
dg AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM ev WHERE cents > 0),
cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS o FROM dg GROUP BY digit),
tot AS (SELECT CAST(COALESCE(sum(o), 0) AS BIGINT) AS n_tot FROM cnt),
spine AS (SELECT * FROM (VALUES {_BENFORD_VALUES}) AS b(digit, exp_q6))
SELECT CAST(spine.digit AS BIGINT) AS digit,
       CAST(COALESCE(cnt.o, 0) AS BIGINT) AS n_obs,
       CASE WHEN n_tot = 0 THEN 0
            ELSE CAST(round(1000000.0 * COALESCE(cnt.o, 0) / n_tot) AS BIGINT) END AS obs_q6,
       CAST(spine.exp_q6 AS BIGINT) AS exp_q6,
       {_BENFORD_X2.replace('o ', 'COALESCE(cnt.o, 0) ')} AS x2_q6
FROM spine LEFT JOIN cnt ON cnt.digit = spine.digit CROSS JOIN tot
ORDER BY digit""",
)
def benford_value_audit(spark, sf_dir):
    """Benford's-law first-digit audit of the events value stream — the
    classic synthetic-data / fraud detector (organically-generated
    monetary amounts follow P(d) = log10(1+1/d); uniform or fabricated
    generators don't). Reports per digit the observed count/share, the
    Benford expectation (Python-folded q6 constants), and the chi-squared
    contribution. On the sandbox's uniform synthetic values the fit is
    poor — that is the CORRECT reading (the generator is uniform, and the
    audit exists to say so).

    Determinism: cents = round(value·100) BIGINT first (the
    events_value_quantiles rule); the first digit comes from the decimal
    string of a positive integer — no float log10 binning; the x2
    expression is one shared float string over exact integers.

    Scale shape: one map-side digit projection into a 9-group agg; the
    9-row Benford spine LEFT JOINs so unobserved digits still report;
    output is 9 rows."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"))
        .where(F.col("cents") > 0)
    )
    cnt = ev.select(
        F.expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)").alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = cnt.agg(F.coalesce(F.sum("o"), F.lit(0)).cast("long").alias("n_tot"))
    spine = spark.createDataFrame(_BENFORD_EXP, "digit long, exp_q6 long")
    return (
        F.broadcast(spine)
        .join(cnt, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("n_obs"),
            F.expr(
                "CASE WHEN n_tot = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * COALESCE(o, 0) / n_tot) AS BIGINT) END"
            ).alias("obs_q6"),
            F.col("exp_q6").cast("long").alias("exp_q6"),
            F.expr(_BENFORD_X2.replace("o ", "COALESCE(o, 0) ")).alias("x2_q6"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# session 48 — ES pipeline/metric agg completions (percentiles_bucket,
# top_metrics), multi_match bool_prefix, and the length×quality 2-D census
# ---------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


@register(
    "percentiles_bucket_daily",
    f"""WITH e AS (SELECT epoch_us(ts) // {_US_PER_DAY} AS day FROM events),
dc AS (SELECT day, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY day),
hist AS (SELECT cnt, CAST(count(*) AS BIGINT) AS w FROM dc GROUP BY cnt),
h AS (
  SELECT cnt, w,
         CAST(COALESCE(SUM(w) OVER (ORDER BY cnt
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(w) OVER () AS BIGINT) AS n
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES (500000), (900000)) AS v(p_q6)),
agg AS (
  SELECT q.p_q6, max(h.n) AS n,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1))
                  THEN h.cnt END) AS v_lo,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1)) + 1
                  THEN h.cnt END) AS v_hi
  FROM h, q GROUP BY q.p_q6)
SELECT CAST(p_q6 AS BIGINT) AS p_q6,
       CAST(round(1000000.0 * (v_lo + ((p_q6 / 1000000.0) * (n - 1)
            - floor((p_q6 / 1000000.0) * (n - 1))) * (v_hi - v_lo))) AS BIGINT) AS q_q6
FROM agg ORDER BY p_q6""",
)
def percentiles_bucket_daily(spark, sf_dir):
    """ES ``percentiles_bucket`` pipeline agg: exact p50/p90 of the DAILY
    EVENT COUNT distribution — percentiles over the buckets of a
    date_histogram (the 'what does a typical day look like' readout that
    stats_bucket_daily's mean/min/max can't answer under skew). Type-7
    interpolation via the doclen_quantiles weighted-histogram machinery.

    Scale shape: the date_histogram is a calendar-bounded day agg; the
    histogram-of-counts and its windows run over ≤|days| rows; output is
    2 rows. Day keys are integer epoch-microsecond divisions
    (events_daily_mavg's rule — no timezone-dependent date functions)."""
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias("day"))
    )
    dc = e.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    hist = dc.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("w"))
    w_cum = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "cnt",
        F.coalesce(F.sum("w").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
        F.sum("w").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(500000,), (900000,)], "p_q6 long")
    rank = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    agg = (
        h.crossJoin(F.broadcast(q))
        .groupBy("p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank), F.col("cnt"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank) + 1, F.col("cnt"))).alias("v_hi"),
        )
    )
    r = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    frac = r - F.floor(r)
    return agg.select(
        F.col("p_q6").cast("long").alias("p_q6"),
        F.round(F.lit(1_000_000.0) * (F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo"))))
        .cast("long")
        .alias("q_q6"),
    ).orderBy("p_q6")


@register(
    "top_metrics_latest",
    f"""WITH e AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_type, ts_us, event_id, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM e)
SELECT event_type, ts_us, event_id, cents FROM r WHERE rn = 1
ORDER BY event_type""",
)
def top_metrics_latest(spark, sf_dir):
    """ES ``top_metrics`` agg (sort: ts desc): per event type, the metric
    value carried by the LATEST event — the 'current reading per series'
    lookup a monitoring dashboard issues (last price, last gauge value).
    Tie on ts broken by event_id desc.

    Scale shape: the per-type argmax is ONE map-side-combinable
    max(struct(ts_us, event_id, cents)) — lexicographic struct max, the
    search_collapse rule — so no reducer ever holds a type's event list
    and there is no per-type sort window (the oracle's window is fine
    for DuckDB, never for Spark). Output is |event_types| rows."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    g = e.groupBy("event_type").agg(
        F.max(F.struct("ts_us", "event_id", "cents")).alias("top")
    )
    return g.select(
        "event_type",
        F.col("top.ts_us").cast("long").alias("ts_us"),
        F.col("top.event_id").cast("long").alias("event_id"),
        F.col("top.cents").cast("long").alias("cents"),
    ).orderBy("event_type")


_MBP_FULL = ["spark", "join"]
_MBP_PREFIX = "ha"


@register(
    "match_bool_prefix_search",
    _bm25_agg_ctes(_MBP_FULL)
    + f""",
dict AS (SELECT DISTINCT term FROM tf WHERE term LIKE '{_MBP_PREFIX}%'
         ORDER BY term LIMIT 50),
pd AS (SELECT DISTINCT tf.doc_id FROM tf JOIN dict USING (term)),
fused AS (
  SELECT COALESCE(agg.doc_id, pd.doc_id) AS doc_id,
         CAST(COALESCE(agg.score_q6, 0)
              + CASE WHEN pd.doc_id IS NULL THEN 0 ELSE 1000000 END AS BIGINT) AS score_q6,
         CAST(COALESCE(agg.nm, 0)
              + CASE WHEN pd.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS nm,
         CAST(pd.doc_id IS NOT NULL AS INT) AS has_prefix
  FROM agg FULL JOIN pd ON agg.doc_id = pd.doc_id)
SELECT doc_id, score_q6, nm, has_prefix FROM fused
ORDER BY score_q6 DESC, doc_id ASC LIMIT 10""",
)
def match_bool_prefix_search(spark, sf_dir):
    """ES ``multi_match`` type ``bool_prefix`` (the search-as-you-type
    query): every term but the last scores as a normal BM25 term clause,
    the trailing partial term becomes a PREFIX clause — expanded via the
    dictionary walk (LIKE 'ha%', lexicographic top-50, the
    match_phrase_prefix rule) and scored CONSTANT 1.0 (Lucene's default
    constant-score prefix rewrite). Docs matching only the prefix still
    appear (bool should), which is exactly why the suggest box shows
    results before the word is finished. Completes the multi_match
    family: best_fields / most_fields / cross_fields / phrase /
    phrase_prefix / bool_prefix.

    Scale shape: the corpus tokenizes ONCE (checkpointed — the rescore_topn
    rule: the BM25 leg, the dictionary walk and the prefix-doc semi-join
    are three consumers, and un-checkpointed each would re-run the
    tokenize); the expansion is dictionary-bounded (≤50 terms, broadcast)
    and the prefix-doc set is one semi-join over postings; fusion is a
    FULL JOIN of two match sets on doc_id followed by a TakeOrdered(10)."""
    toks = _toks(_docs(spark, sf_dir)).localCheckpoint()
    agg = _bm25_match_set(spark, sf_dir, _MBP_FULL, toks=toks)
    dict_df = (
        toks.select("term")
        .where(F.col("term").like(f"{_MBP_PREFIX}%"))
        .distinct()
        .orderBy("term")
        .limit(50)
    )
    pd_df = (
        toks.join(F.broadcast(dict_df), "term")
        .select("doc_id")
        .distinct()
        .select(F.col("doc_id").alias("pdoc"))
    )
    fused = (
        agg.join(pd_df, F.col("doc_id") == F.col("pdoc"), "full")
        .select(
            F.coalesce(F.col("doc_id"), F.col("pdoc")).alias("doc_id"),
            (
                F.coalesce(F.col("score_q6"), F.lit(0))
                + F.when(F.col("pdoc").isNull(), F.lit(0)).otherwise(F.lit(1_000_000))
            )
            .cast("long")
            .alias("score_q6"),
            (
                F.coalesce(F.col("nm"), F.lit(0))
                + F.when(F.col("pdoc").isNull(), F.lit(0)).otherwise(F.lit(1))
            )
            .cast("long")
            .alias("nm"),
            F.col("pdoc").isNotNull().cast("int").alias("has_prefix"),
        )
    )
    return fused.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)


@register(
    "len_quality_hist2d",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_distinct
  FROM documents),
b AS (
  SELECT CASE WHEN n_tok = 0 THEN -1
              ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END AS len_bucket,
         CASE WHEN n_tok = 0 THEN CAST(-1 AS BIGINT)
              ELSE LEAST(CAST(4 AS BIGINT),
                   (CAST(round(1000000.0 * n_distinct / n_tok) AS BIGINT) * 5) // 1000000)
         END AS q_bucket,
         n_tok
  FROM t)
SELECT len_bucket, q_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM b GROUP BY len_bucket, q_bucket ORDER BY len_bucket, q_bucket""",
)
def len_quality_hist2d(spark, sf_dir):
    """2-D corpus census: log2 document-length bucket × type-token-ratio
    quintile — the filter-interaction heatmap behind length and quality
    gates (short docs dominate the low-TTR cells ↔ a TTR cut silently
    becomes a length cut; the 2-D view is what catches that coupling,
    which the two 1-D curves — doclen_histogram, quality_ablation_curve —
    cannot). Cells report docs and token mass.

    Determinism: len_bucket = floor(log2 n) via the binary-string length
    (doclen_histogram's integer-exact rule); TTR is q6-rounded FIRST and
    the quintile is (ttr_q6·5) div 1e6 — non-negative integer division,
    identical both engines, clamped to 4 at ttr = 1.0. Empty docs land in
    the (-1, -1) cell.

    Scale shape: both keys are map-side expressions; one 2-D hash agg,
    ≤ 5·64 cells regardless of corpus size."""
    t = _docs(spark, sf_dir).select(
        F.size(spark_tokens("text")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(spark_tokens("text"))).cast("long").alias("n_distinct"),
    )
    b = t.select(
        F.expr(
            "CASE WHEN n_tok = 0 THEN -1"
            " ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END"
        ).alias("len_bucket"),
        F.expr(
            "CASE WHEN n_tok = 0 THEN CAST(-1 AS BIGINT)"
            " ELSE LEAST(CAST(4 AS BIGINT),"
            " (CAST(round(1000000.0 * n_distinct / n_tok) AS BIGINT) * 5) div 1000000)"
            " END"
        ).alias("q_bucket"),
        "n_tok",
    )
    return (
        b.groupBy("len_bucket", "q_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("len_bucket", "q_bucket")
    )


# ---------------------------------------------------------------------------
# session 49 — segmental lexical diversity, product analytics (stickiness,
# conversion latency), chi-squared significant terms
# ---------------------------------------------------------------------------

_MSTTR_W = 25  # MSTTR segment width (Johnson 1944's standard segmental TTR)


@register(
    "msttr_source",
    f"""WITH w AS ({SQL_WORDS}),
seg AS (
  SELECT source,
         CAST(len(list_distinct(list_slice(words, i * {_MSTTR_W} + 1, (i + 1) * {_MSTTR_W}))) AS BIGINT) AS nd
  FROM w, unnest(generate_series(0, len(words) // {_MSTTR_W} - 1)) AS t(i)
  WHERE len(words) >= {_MSTTR_W}),
tt AS (SELECT source,
              CAST(round(1000000.0 * nd / {_MSTTR_W}) AS BIGINT) AS ttr_q6
       FROM seg)
SELECT source, CAST(count(*) AS BIGINT) AS n_segs,
       CAST(round(sum(ttr_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS msttr_q6
FROM tt GROUP BY source ORDER BY source""",
)
def msttr_source(spark, sf_dir):
    """Mean Segmental Type-Token Ratio (MSTTR-25, Johnson 1944) per
    source — the LENGTH-ROBUST lexical-diversity score: plain TTR falls
    with document length by construction (heaps_law_source measures that
    curve), so corpora of different doclen mixes can't be compared on it;
    MSTTR instead averages the TTR of consecutive fixed-width 25-token
    segments (trailing partial segment discarded, per the standard), so
    every segment is measured at the same length. Completes the
    diversity family: TTR cut (quality_ablation_curve), Yule's K
    (yule_k_source), Heaps exponent, now MSTTR.

    Determinism: per-segment TTR is q6-rounded FIRST (nd/25 over exact
    integers); the per-source mean is ONE float division of two exact
    BIGINTs. Segment slices are 1-based in BOTH engines (Spark slice and
    DuckDB list_slice) — no index-origin shim needed, unlike words[i].

    Scale shape: one map-side explode of n_tok/25 segment rows per doc
    (each segment a bounded 25-element slice+distinct, not a per-token
    lambda), into a sources-sized agg."""
    w = _docs(spark, sf_dir).select("source", spark_tokens("text").alias("words"))
    seg = (
        w.where(F.size("words") >= _MSTTR_W)
        .select(
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(words) div {_MSTTR_W} - 1), i -> "
                    f"cast(size(array_distinct(slice(words, i * {_MSTTR_W} + 1, {_MSTTR_W}))) as bigint))"
                )
            ).alias("nd"),
        )
    )
    tt = seg.select(
        "source",
        F.expr(f"CAST(round(1000000.0 * nd / {_MSTTR_W}) AS BIGINT)").alias("ttr_q6"),
    )
    return (
        tt.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.expr("CAST(round(sum(ttr_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT)").alias(
                "msttr_q6"
            ),
        )
        .orderBy("source")
    )


@register(
    "events_stickiness",
    f"""WITH du AS (
  SELECT DISTINCT epoch_us(ts) // {_US_PER_DAY} AS day, user_id FROM events),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day),
mp AS (
  SELECT DISTINCT du.day + o AS day, du.user_id
  FROM du, unnest(generate_series(0, 27)) AS t(o)),
mau AS (SELECT day, CAST(count(*) AS BIGINT) AS mau FROM mp GROUP BY day)
SELECT dau.day AS day, dau.dau, mau.mau,
       CAST(round(1000000.0 * dau.dau / mau.mau) AS BIGINT) AS stickiness_q6
FROM dau JOIN mau ON mau.day = dau.day
ORDER BY day""",
)
def events_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per day — THE product-analytics engagement
    ratio (what fraction of the trailing-28-day user base showed up
    today). The trailing-window distinct is decomposed without any
    sliding-window distinct state: each (day, user) activity pair is
    fanned to the 28 future days whose MAU window contains it (offset
    explode, bounded fanout 28), then deduplicated — a user active 5×
    in a window still counts once. Days without activity have no DAU
    row and are omitted (their stickiness is 0 by definition).

    Scale shape: the (day, user) distinct is one exchange; the
    28-offset fan is map-side; the MAU distinct/count is a second
    bounded exchange (28× the first's rows, the documented trade);
    stickiness is a calendar-sized join. DAU/MAU are exact BIGINTs,
    the ratio one float division.

    Day keys: integer epoch-microsecond division (events_daily_mavg)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    du = (
        e.select(
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias("day"),
            "user_id",
        )
        .distinct()
        .localCheckpoint()  # feeds DAU and the 28-day fan
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    mp = (
        du.select(
            F.explode(F.expr("sequence(0, 27)")).alias("o"), "day", "user_id"
        )
        .select((F.col("day") + F.col("o")).alias("day"), "user_id")
        .distinct()
    )
    mau = mp.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            F.expr("CAST(round(1000000.0 * dau / mau) AS BIGINT)").alias("stickiness_q6"),
        )
        .orderBy("day")
    )


@register(
    "conversion_latency_histogram",
    f"""WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
v AS (SELECT user_id, min(ts_us) AS v_ts FROM e WHERE event_type = 'view' GROUP BY user_id),
p AS (
  SELECT e.user_id, min(e.ts_us) AS p_ts
  FROM e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us >= v.v_ts
  GROUP BY e.user_id),
g AS (
  SELECT p.user_id, p.p_ts - v.v_ts AS gap
  FROM p JOIN v USING (user_id)),
b AS (
  SELECT CASE WHEN gap = 0 THEN -1
              ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END AS bucket
  FROM g)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_users
FROM b GROUP BY bucket ORDER BY bucket""",
)
def conversion_latency_histogram(spark, sf_dir):
    """Time-to-convert distribution: for each user, the latency from
    FIRST view to the first purchase AT OR AFTER it, bucketed into
    log2-microsecond bins (the interevent_gap_histogram scale, bucket -1
    for same-microsecond conversion) — the funnel-latency curve that
    sizes attribution windows and the sessionization gap
    (events_funnel counts who converts; this measures how long it
    takes). A purchase at exactly the first-view timestamp counts
    (ts >= v_ts — declared, both engines identical).

    Scale shape: the events_funnel plan truncated at two stages — both
    min-aggs and both joins key on user_id, so everything rides ONE
    user exchange; the histogram is a ≤64-bucket agg."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us")
    )
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_ts"))
    )
    p = (
        e.join(v, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts_us") >= F.col("v_ts")))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_ts"))
    )
    g = p.join(v, "user_id").select((F.col("p_ts") - F.col("v_ts")).alias("gap"))
    b = g.select(
        F.expr(
            "CASE WHEN gap = 0 THEN -1 ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("bucket")
    )


# 2x2 chi-squared over exact contingency integers: a = fg docs with term,
# b = fg docs without, c = bg-only docs with term, d = the rest. Every
# product is forced to DOUBLE from the first multiplication (CAST(x AS
# DOUBLE) * y) so both engines run the identical IEEE sequence even where
# a*d would pass 2^53 at corpus scale.
_CHI2_SIG_EXPR = (
    "CASE WHEN (c + d) = 0 OR (b + d) = 0 THEN 0 ELSE "
    "CAST(round(1000000 * (CAST(n AS DOUBLE)"
    " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)"
    " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c))"
    " / ((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d)"
    " * (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d))) AS BIGINT) END"
)
