"""driver_queries chunk q10 (original lines 34740-38227): supplier_discount_topk, month_type_matrix, source_token_length, round_value_bias, ... brand_promo_lift (55 ops).

Linearized continuation of docix_spark.ops.q09 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q09")

@register(
    "supplier_discount_topk",
    """WITH s AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lineitems,
         CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_pp
  FROM lineitem GROUP BY l_suppkey),
r AS (SELECT l_suppkey, n_lineitems,
             CAST(round(1000000 * (CAST(disc_pp AS DOUBLE) / n_lineitems))
                  AS BIGINT) AS mean_disc_pp_q6
      FROM s WHERE n_lineitems >= 5)
SELECT l_suppkey, n_lineitems, mean_disc_pp_q6,
       CAST(row_number() OVER (ORDER BY mean_disc_pp_q6 DESC, l_suppkey ASC)
            AS BIGINT) AS rank
FROM r ORDER BY mean_disc_pp_q6 DESC, l_suppkey ASC LIMIT 10""",
)
def supplier_discount_topk(spark, sf_dir):
    """Heaviest-discounting suppliers: mean discount (percent points)
    per supplier, volume-gated (n ≥ 5), top-10 — the margin-leak board
    beside supplier_ship_delay_topk's SLA board (a supplier that is
    both slow AND deep-discounted is being paid twice to disappoint;
    discount_by_quantity_band explains the legitimate volume part).

    Scale shape: one suppkey agg, a filtered TakeOrdered 10."""
    s = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(F.expr("CAST(round(l_discount * 100) AS BIGINT)"))
            .cast("long")
            .alias("disc_pp"),
        )
    )
    r = s.where(F.col("n_lineitems") >= 5).select(
        "l_suppkey",
        "n_lineitems",
        F.expr(
            "CAST(round(1000000 * (CAST(disc_pp AS DOUBLE) / n_lineitems))"
            " AS BIGINT)"
        ).alias("mean_disc_pp_q6"),
    )
    top = r.orderBy(F.desc("mean_disc_pp_q6"), F.asc("l_suppkey")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("mean_disc_pp_q6"), F.asc("l_suppkey")))
        .cast("long"),
    ).select("l_suppkey", "n_lineitems", "mean_disc_pp_q6", "rank")


@register(
    "month_type_matrix",
    """WITH e AS (
  SELECT (year(ts) * 12 + month(ts) - 1) AS mkey, event_type FROM events)
SELECT CAST(mkey AS BIGINT) AS month_key, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY mkey, event_type ORDER BY month_key, event_type""",
)
def month_type_matrix(spark, sf_dir):
    """Event volume by calendar month × type — the raw long-horizon mix
    matrix (events_weekly_type_jsd scores week-level drift as one
    number per week; this is the month-grain table a quarterly review
    actually reads, and the input any seasonal type-mix model fits).

    Scale shape: map-side month math, a ≤|months|×|types|-cell agg."""
    e = _events(spark, sf_dir).select(
        F.expr(
            "(year(cast(ts as timestamp)) * 12"
            " + month(cast(ts as timestamp)) - 1)"
        ).alias("mkey"),
        "event_type",
    )
    return (
        e.groupBy("mkey", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("mkey").cast("long").alias("month_key"),
            "event_type",
            "n_events",
        )
        .orderBy("month_key", "event_type")
    )


@register(
    "source_token_length",
    f"""WITH t AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
    AS term
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(round(1000000 * (CAST(sum(length(term)) AS DOUBLE) / count(*)))
            AS BIGINT) AS mean_term_len_q6
FROM t GROUP BY source ORDER BY source""",
)
def source_token_length(spark, sf_dir):
    """Mean token length (characters) per source — the one-number
    register gauge (legalese and German compounds run long, chat runs
    short; token_length_histogram shows the global shape,
    abbreviation_law_curve conditions on frequency — this is the
    per-source marginal a mix report quotes, and a byte-budget
    converter between sources).

    Scale shape: map-side length over the token stream, a ≤|sources|
    agg."""
    t = _docs(spark, sf_dir).select(
        "source", F.explode(spark_tokens("text")).alias("term")
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(length(term)) AS DOUBLE)"
                " / count(1))) AS BIGINT)"
            ).alias("mean_term_len_q6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# session 130 — round-number bias, query-term PMI, key density census
# ---------------------------------------------------------------------------


@register(
    "round_value_bias",
    """WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(COALESCE(sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_whole_dollar,
       CAST(COALESCE(sum(CASE WHEN cents % 10000 = 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_whole_hundred,
       CAST((1000000 * COALESCE(sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END), 0))
            // count(*) AS BIGINT) AS whole_dollar_share_q6
FROM o""",
)
def round_value_bias(spark, sf_dir):
    """Round-number bias of order values: the share landing exactly on
    whole dollars and whole hundreds — the human-fingerprint audit
    beside benford_value_audit's leading-digit law (negotiated and
    fabricated numbers cluster on round figures; machine-priced ones
    don't — auditors read both tests together). Exact cents modular
    arithmetic.

    Scale shape: one map-side conditional 1-row agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents")
    )
    return o.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.coalesce(
            F.sum(F.when(F.col("cents") % 100 == 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_whole_dollar"),
        F.coalesce(
            F.sum(F.when(F.col("cents") % 10000 == 0, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_whole_hundred"),
        F.expr(
            "CAST((1000000 * COALESCE(sum(CASE WHEN cents % 100 = 0"
            " THEN 1 ELSE 0 END), 0)) div count(1) AS BIGINT)"
        ).alias("whole_dollar_share_q6"),
    )


@register(
    "query_term_pmi",
    f"""WITH t AS (SELECT DISTINCT doc_id, term FROM ({SQL_TOKS})
                  WHERE term IN ('dup', 'spark')),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
       FROM ({SQL_TOKS})),
d AS (SELECT CAST(count(*) FILTER (WHERE term = 'dup') AS BIGINT) AS da,
             CAST(count(*) FILTER (WHERE term = 'spark') AS BIGINT) AS db
      FROM t),
co AS (SELECT CAST(count(*) AS BIGINT) AS dab FROM (
         SELECT doc_id FROM t GROUP BY doc_id HAVING count(*) = 2))
SELECT d.da AS df_dup, d.db AS df_spark, co.dab AS df_both, nd.n AS n_docs,
       CASE WHEN co.dab = 0 OR d.da = 0 OR d.db = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ln((CAST(co.dab AS DOUBLE) * nd.n)
                 / (CAST(d.da AS DOUBLE) * d.db))) AS BIGINT)
       END AS pmi_q6
FROM d CROSS JOIN co CROSS JOIN nd""",
)
def query_term_pmi(spark, sf_dir):
    """Document-level PMI between the canned query's two terms ('dup',
    'spark'): ln(P(both)/(P(a)·P(b))) over document occurrence — the
    one number that says whether the conjunctive query is coherent
    (positive PMI: the terms travel together, AND-ish semantics and
    msm make sense; ≈0: statistically independent, the match set is a
    coincidence product; collocations_pmi ranks ALL pairs — this reads
    the one pair the rank_eval family queries with, and a 0-sentinel
    covers the no-cooccurrence case).

    Scale shape: a tiny 2-term df census plus one co-occurrence count."""
    toks = (
        _toks(_docs(spark, sf_dir)).localCheckpoint()
    )  # census + filtered df both consume it
    t = (
        toks.where(F.col("term").isin("dup", "spark"))
        .select("doc_id", "term")
        .distinct()
    )
    nd = toks.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    d = t.agg(
        F.count_if(F.col("term") == "dup").cast("long").alias("da"),
        F.count_if(F.col("term") == "spark").cast("long").alias("db"),
    )
    co = (
        t.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("dab"))
    )
    return (
        d.crossJoin(co)
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("da").alias("df_dup"),
            F.col("db").alias("df_spark"),
            F.col("dab").alias("df_both"),
            F.col("n").alias("n_docs"),
            F.expr(
                "CASE WHEN dab = 0 OR da = 0 OR db = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(round(1000000 * ln((CAST(dab AS DOUBLE) * n)"
                " / (CAST(da AS DOUBLE) * db))) AS BIGINT) END"
            ).alias("pmi_q6"),
        )
    )


def _key_leg_sql(name, table, col):
    return f"""SELECT '{name}' AS key_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min({col}) AS BIGINT) AS min_key, CAST(max({col}) AS BIGINT) AS max_key,
       CAST((1000000 * count(*)) // greatest(max({col}) - min({col}) + 1, 1)
            AS BIGINT) AS density_q6
FROM {table}"""


@register(
    "key_density_census",
    _key_leg_sql("customer.c_custkey", "customer", "c_custkey")
    + "\nUNION ALL\n"
    + _key_leg_sql("orders.o_orderkey", "orders", "o_orderkey")
    + "\nUNION ALL\n"
    + _key_leg_sql("part.p_partkey", "part", "p_partkey")
    + "\nUNION ALL\n"
    + _key_leg_sql("supplier.s_suppkey", "supplier", "s_suppkey")
    + "\nORDER BY key_name",
)
def key_density_census(spark, sf_dir):
    """Primary-key density census: rows over key-range span for every
    entity key — the load-integrity twin of fk_integrity_census
    (density 1.0 = contiguous surrogate keys; a drop below 1 means
    deleted rows, a partial load, or TPC-H's deliberate orderkey
    sparsity — and any range-based splitter (order_value_drift_deciles'
    buckets, JDBC partitioning) inherits exactly this skew).

    Determinism: exact counts and integer density division.

    Scale shape: one min/max/count agg per table, map-side."""
    legs = [
        ("customer.c_custkey", "customer", "c_custkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("part.p_partkey", "part", "p_partkey"),
        ("supplier.s_suppkey", "supplier", "s_suppkey"),
    ]
    outs = []
    for name, table, col in legs:
        t = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(
            F.col(col).alias("k")
        )
        outs.append(
            t.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("k").cast("long").alias("min_key"),
                F.max("k").cast("long").alias("max_key"),
            ).select(
                F.lit(name).alias("key_name"),
                "n_rows",
                "min_key",
                "max_key",
                F.expr(
                    "CAST((1000000 * n_rows)"
                    " div greatest(max_key - min_key + 1, 1) AS BIGINT)"
                ).alias("density_q6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("key_name")


# ---------------------------------------------------------------------------
# session 131 — basket brand breadth, order-size trend, top value events
# ---------------------------------------------------------------------------


@register(
    "order_brand_breadth",
    """WITH ob AS (
  SELECT l.l_orderkey, CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY l.l_orderkey),
bk AS (SELECT CASE WHEN n_brands >= 3 THEN 3 ELSE n_brands END AS breadth
       FROM ob)
SELECT CAST(breadth AS BIGINT) AS breadth, CAST(count(*) AS BIGINT) AS n_orders
FROM bk GROUP BY breadth ORDER BY breadth""",
)
def order_brand_breadth(spark, sf_dir):
    """Basket brand breadth: orders by how many distinct brands they mix
    (1 / 2 / 3+) — the demand-side reading of brand_cobuy_matrix (that
    names WHICH brands co-sell; this says how much cross-brand demand
    exists at all, the number a marketplace's bundle strategy starts
    from).

    Scale shape: one orderkey agg with a two-phase distinct, a
    3-bucket rollup."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    ob = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_orderkey")
        .agg(F.countDistinct("p_brand").cast("long").alias("n_brands"))
    )
    bk = ob.select(
        F.expr("CASE WHEN n_brands >= 3 THEN 3 ELSE n_brands END").alias(
            "breadth"
        )
    )
    return (
        bk.groupBy("breadth")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .select(F.col("breadth").cast("long").alias("breadth"), "n_orders")
        .orderBy("breadth")
    )


@register(
    "order_size_by_month",
    """WITH lc AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items FROM lineitem
  GROUP BY l_orderkey),
j AS (SELECT (year(CAST(o.o_orderdate AS TIMESTAMP)) * 12
              + month(CAST(o.o_orderdate AS TIMESTAMP)) - 1) AS mkey,
             COALESCE(lc.n_items, 0) AS n_items
      FROM orders o LEFT JOIN lc ON lc.l_orderkey = o.o_orderkey)
SELECT CAST(mkey AS BIGINT) AS month_key, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(1000000 * (CAST(sum(n_items) AS DOUBLE) / count(*)))
            AS BIGINT) AS mean_items_q6
FROM j GROUP BY mkey ORDER BY month_key""",
)
def order_size_by_month(spark, sf_dir):
    """Mean items per order by month — the basket-size trend
    (order_size_by_status slices by state, order_size_histogram shows
    the shape; a drifting monthly mean changes pick-pack economics and
    is the operations twin of monthly_revenue_growth's top line).
    Itemless orders count 0 via the LEFT probe.

    Scale shape: one orderkey agg, an un-hinted LEFT probe, a
    ≤|months| rollup."""
    lc = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr(
            "(year(CAST(o_orderdate AS TIMESTAMP)) * 12"
            " + month(CAST(o_orderdate AS TIMESTAMP)) - 1)"
        ).alias("mkey"),
    )
    j = o.join(lc, o["o_orderkey"] == lc["l_orderkey"], "left").select(
        "mkey", F.coalesce("n_items", F.lit(0)).alias("n_items")
    )
    return (
        j.groupBy("mkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(n_items) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_items_q6"),
        )
        .select(
            F.col("mkey").cast("long").alias("month_key"),
            "n_orders",
            "mean_items_q6",
        )
        .orderBy("month_key")
    )


@register(
    "top_value_events",
    """WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
       event_type, cents,
       CAST(row_number() OVER (ORDER BY cents DESC, event_id ASC) AS BIGINT)
         AS rank
FROM e ORDER BY cents DESC, event_id ASC LIMIT 10""",
)
def top_value_events(spark, sf_dir):
    """The 10 highest-value single events — the whale-transaction board
    every finance review opens with (events_value_quantiles shows the
    distribution; these are the rows someone actually eyeballs for
    fraud or fat fingers, with user and type attached for the
    follow-up).

    Scale shape: one TakeOrdered(10) over a map-side cents
    projection."""
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    top = e.orderBy(F.desc("cents"), F.asc("event_id")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("event_id")))
        .cast("long"),
    ).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        "cents",
        "rank",
    )


# ---------------------------------------------------------------------------
# session 132 — session threshold curve, brand supplier diversity, length
# gate curve
# ---------------------------------------------------------------------------


@register(
    "session_threshold_curve",
    """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
g AS (SELECT t_us - lag(t_us) OVER (PARTITION BY user_id
                                    ORDER BY t_us, event_id) AS gap
      FROM t),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(COALESCE(sum(CASE WHEN gap IS NULL OR gap > 600000000
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS s10,
             CAST(COALESCE(sum(CASE WHEN gap IS NULL OR gap > 1800000000
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS s30,
             CAST(COALESCE(sum(CASE WHEN gap IS NULL OR gap > 3600000000
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS s60
      FROM g)
SELECT 10 AS gap_minutes, s10 AS n_sessions,
       CAST(round(1000000 * (CAST(n_events AS DOUBLE) / greatest(s10, 1)))
            AS BIGINT) AS mean_len_q6
FROM c
UNION ALL
SELECT 30, s30, CAST(round(1000000 * (CAST(n_events AS DOUBLE)
       / greatest(s30, 1))) AS BIGINT) FROM c
UNION ALL
SELECT 60, s60, CAST(round(1000000 * (CAST(n_events AS DOUBLE)
       / greatest(s60, 1))) AS BIGINT) FROM c
ORDER BY gap_minutes""",
)
def session_threshold_curve(spark, sf_dir):
    """Sessionization-threshold tuning curve: session count and mean
    session length at 10/30/60-minute gap rules — the knob every
    session op fixes at 30, swept in ONE pass (a session count is just
    the number of gap-exceeding starts, so three thresholds are three
    conditional counters over the SAME lag column — no triple
    sessionization; interevent_gap_histogram shows the gap
    distribution, THIS shows what each cut does to the session
    censuses built on it). Counts are monotone decreasing in the
    threshold — property-asserted.

    Scale shape: ONE user exchange for the lag, a 1-row 3-counter agg."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    g = t.select((F.col("t_us") - F.lag("t_us").over(w)).alias("gap"))
    c = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("gap").isNull() | (F.col("gap") > thr), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"s{m}")
            for m, thr in ((10, 600_000_000), (30, 1_800_000_000), (60, 3_600_000_000))
        ],
    )
    outs = []
    for m in (10, 30, 60):
        outs.append(
            c.select(
                F.lit(m).cast("long").alias("gap_minutes"),
                F.col(f"s{m}").alias("n_sessions"),
                F.expr(
                    f"CAST(round(1000000 * (CAST(n_events AS DOUBLE)"
                    f" / greatest(s{m}, 1))) AS BIGINT)"
                ).alias("mean_len_q6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("gap_minutes")


@register(
    "brand_supplier_diversity",
    """WITH j AS (
  SELECT DISTINCT p.p_brand, l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers
FROM j GROUP BY p_brand ORDER BY p_brand""",
)
def brand_supplier_diversity(spark, sf_dir):
    """Supplier diversity per brand: distinct suppliers who have ever
    shipped each brand — the brand-level resilience view
    (supplier_brand_matrix names the heavy lanes; a brand with ONE
    supplier here has no lanes to fail over to, Q16's question asked
    at the brand grain).

    Scale shape: one distinct over the joined pair, a ≤|brands|
    rollup."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_partkey"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    j = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .select("p_brand", "l_suppkey")
        .distinct()
    )
    return (
        j.groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_suppliers"))
        .orderBy("p_brand")
    )


@register(
    "length_gate_curve",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT)
    AS n_tok
  FROM documents),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(COALESCE(sum(CASE WHEN n_tok >= 8 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS d8,
             CAST(COALESCE(sum(CASE WHEN n_tok >= 8 THEN n_tok ELSE 0 END), 0)
                  AS BIGINT) AS t8,
             CAST(COALESCE(sum(CASE WHEN n_tok >= 16 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS d16,
             CAST(COALESCE(sum(CASE WHEN n_tok >= 16 THEN n_tok ELSE 0 END), 0)
                  AS BIGINT) AS t16,
             CAST(COALESCE(sum(CASE WHEN n_tok >= 32 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS d32,
             CAST(COALESCE(sum(CASE WHEN n_tok >= 32 THEN n_tok ELSE 0 END), 0)
                  AS BIGINT) AS t32
      FROM t)
SELECT 8 AS min_tokens, d8 AS docs_kept, t8 AS tokens_kept,
       CAST((1000000 * t8) // greatest(n_tokens, 1) AS BIGINT) AS token_share_q6
FROM c
UNION ALL
SELECT 16, d16, t16, CAST((1000000 * t16) // greatest(n_tokens, 1) AS BIGINT) FROM c
UNION ALL
SELECT 32, d32, t32, CAST((1000000 * t32) // greatest(n_tokens, 1) AS BIGINT) FROM c
ORDER BY min_tokens""",
)
def length_gate_curve(spark, sf_dir):
    """Minimum-length gate tuning curve: documents and token mass
    surviving min-length cuts of 8/16/32 tokens, in ONE pass (the
    Gopher-style length gate every pipeline applies; the DOC count
    falls much faster than the TOKEN share — short docs are many and
    light — and this pair of columns is that argument with numbers;
    quality_ablation_curve sweeps richer gates, this isolates the
    length knob). Monotone in the cut — property-asserted.

    Scale shape: one map-side length projection, a 1-row 6-counter
    agg, a 3-row union."""
    t = _docs(spark, sf_dir).select(
        F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    ]
    for k in (8, 16, 32):
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("n_tok") >= k, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"d{k}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("n_tok") >= k, F.col("n_tok")).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"t{k}")
        )
    c = t.agg(*aggs)
    outs = []
    for k in (8, 16, 32):
        outs.append(
            c.select(
                F.lit(k).cast("long").alias("min_tokens"),
                F.col(f"d{k}").alias("docs_kept"),
                F.col(f"t{k}").alias("tokens_kept"),
                F.expr(
                    f"CAST((1000000 * t{k}) div greatest(n_tokens, 1)"
                    " AS BIGINT)"
                ).alias("token_share_q6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("min_tokens")


# ---------------------------------------------------------------------------
# session 133 — type session position, price-band returns, view→click
# latency
# ---------------------------------------------------------------------------


@register(
    "type_session_position",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
fl AS (
  SELECT user_id, t_us, event_id, event_type,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL
              OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM t),
se AS (
  SELECT user_id, t_us, event_id, event_type,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM fl),
rk AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY t_us, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id, sid) AS slen
  FROM se),
rp AS (SELECT event_type,
              CAST(round(1000000 * (CAST(pos - 1 AS DOUBLE)
                   / greatest(slen - 1, 1))) AS BIGINT) AS relpos_q6
       FROM rk)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(CAST(sum(relpos_q6) AS BIGINT) // count(*) AS BIGINT)
         AS mean_relpos_q6
FROM rp GROUP BY event_type ORDER BY event_type""",
)
def type_session_position(spark, sf_dir):
    """Where each event type lives inside sessions: mean relative
    position (0 = session start, 1 = end) per type — the journey-shape
    profile (views should front-load, purchases should back-load; a
    purchase type at 0.3 means journeys continue after buying — the
    post-purchase browse pattern — and session_entry_exit_matrix's
    door/exit cells are this table's endpoints). Single-event sessions
    guard to denominator 1.

    Determinism: per-occurrence relpos q6-first (the
    term_position_profile rule on the time axis); identical
    (t_us, event_id) ordering as every session op.

    Scale shape: ONE user exchange for all three windows, a ≤|types|
    rollup."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    fl = t.withColumn(
        "is_start",
        F.expr(
            "CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            " IS NULL OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us,"
            f" event_id) > {_SESSION_GAP_US} THEN 1 ELSE 0 END"
        ),
    )
    se = fl.withColumn(
        "sid",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("t_us", "event_id")
    wsa = Window.partitionBy("user_id", "sid")
    rk = se.select(
        "event_type",
        F.row_number().over(ws).alias("pos"),
        F.count(F.lit(1)).over(wsa).alias("slen"),
    )
    rp = rk.select(
        "event_type",
        F.expr(
            "CAST(round(1000000 * (CAST(pos - 1 AS DOUBLE)"
            " / greatest(slen - 1, 1))) AS BIGINT)"
        ).alias("relpos_q6"),
    )
    return (
        rp.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.expr(
                "CAST(CAST(sum(relpos_q6) AS BIGINT) div count(1) AS BIGINT)"
            ).alias("mean_relpos_q6"),
        )
        .orderBy("event_type")
    )


@register(
    "price_band_return_rate",
    """WITH j AS (
  SELECT CASE WHEN CAST(round(l_extendedprice * 100) AS BIGINT) <= 0 THEN -1
         ELSE CAST(length(bin(CAST(round(l_extendedprice * 100) AS BIGINT))) - 1
              AS BIGINT) END AS price_band,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem)
SELECT price_band, CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(COALESCE(sum(ret), 0) AS BIGINT) AS n_returned,
       CAST((1000000 * COALESCE(sum(ret), 0)) // count(*) AS BIGINT)
         AS return_rate_q6
FROM j GROUP BY price_band ORDER BY price_band""",
)
def price_band_return_rate(spark, sf_dir):
    """Return rate by price band (log2-cents of the line value) — do
    expensive lines come back more (buyer's remorse scales with
    price; a flat curve means returns are product-driven, matching
    brand_return_rate's attribution; rising means value-driven and
    insurance/restocking fees price off THIS curve).

    Scale shape: map-side band/flag math, a ≤~40-band agg."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr(
            "CASE WHEN CAST(round(l_extendedprice * 100) AS BIGINT) <= 0 THEN -1"
            " ELSE CAST(length(bin(CAST(round(l_extendedprice * 100) AS BIGINT)))"
            " - 1 AS BIGINT) END"
        ).alias("price_band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    return (
        li.groupBy("price_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.coalesce(F.sum("ret"), F.lit(0)).cast("long").alias("n_returned"),
        )
        .select(
            "price_band",
            "n_lineitems",
            "n_returned",
            F.expr(
                "CAST((1000000 * n_returned) div n_lineitems AS BIGINT)"
            ).alias("return_rate_q6"),
        )
        .orderBy("price_band")
    )


@register(
    "view_click_latency_histogram",
    """WITH v AS (
  SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS c_us
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us
  GROUP BY e.user_id),
lat AS (SELECT CAST((c.c_us - v.v_us) // 1000000 AS BIGINT) AS lat_s
        FROM v JOIN c USING (user_id)),
bk AS (SELECT CASE WHEN lat_s = 0 THEN -1
              ELSE CAST(length(bin(lat_s)) - 1 AS BIGINT) END AS bucket
       FROM lat)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_users
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def view_click_latency_histogram(spark, sf_dir):
    """First-view to first-click latency (log2 seconds; bucket −1 =
    same-second) — the TOP of the funnel's reaction-time curve
    (conversion_latency_histogram measures view→purchase, the whole
    funnel; this isolates the first hop, where UI latency and
    relevance show up years before revenue does). Users who never
    click after viewing drop — the funnel convention.

    Scale shape: two user-keyed min-aggs on one exchange shape, a
    ≤~32-bucket rollup."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t_us").cast("long").alias("v_us"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("t_us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("t_us").cast("long").alias("c_us"))
    )
    lat = v.join(c, "user_id").select(
        F.expr("CAST((c_us - v_us) div 1000000 AS BIGINT)").alias("lat_s")
    )
    bk = lat.select(
        F.expr(
            "CASE WHEN lat_s = 0 THEN -1"
            " ELSE CAST(length(bin(lat_s)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 134 — purchase-count histogram, n_chars integrity, linenumber
# spectrum
# ---------------------------------------------------------------------------


@register(
    "user_purchase_histogram",
    """WITH u AS (
  SELECT user_id,
         CAST(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_purchases
  FROM events GROUP BY user_id),
bk AS (SELECT CASE WHEN n_purchases >= 4 THEN 4 ELSE n_purchases END AS bucket
       FROM u)
SELECT CAST(bucket AS BIGINT) AS n_purchases_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM bk GROUP BY bucket ORDER BY n_purchases_bucket""",
)
def user_purchase_histogram(spark, sf_dir):
    """Purchases-per-user histogram (0/1/2/3/4+) — the repeat-purchase
    shape behind segment_repeat_rate's single share (bucket 0 is the
    never-converted base every growth plan targets; the 1-vs-2+ split
    is the habit threshold loyalty programs are priced on).

    Scale shape: one user agg with a conditional counter, a 5-bucket
    rollup."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_purchases")
        )
    )
    bk = u.select(
        F.expr(
            "CASE WHEN n_purchases >= 4 THEN 4 ELSE n_purchases END"
        ).alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("bucket").cast("long").alias("n_purchases_bucket"),
            "n_users",
        )
        .orderBy("n_purchases_bucket")
    )


@register(
    "nchars_integrity_audit",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_consistent,
       CAST(COALESCE(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_mismatch,
       CAST(COALESCE(max(abs(n_chars - length(text))), 0) AS BIGINT)
         AS max_abs_diff
FROM documents""",
)
def nchars_integrity_audit(spark, sf_dir):
    """Materialized-column integrity audit: does the precomputed
    n_chars column actually equal length(text) — the denormalization
    drift check (precomputed stats columns rot silently when an
    upstream rewrite forgets them; fk_integrity_census guards the
    keys, THIS guards the derived column the schema carries, and any
    mismatch means every consumer of n_chars is reading a lie).

    Scale shape: one map-side comparison, a 1-row agg."""
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(
                F.when(F.col("n_chars") == F.length("text"), 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_consistent"),
        F.coalesce(
            F.sum(
                F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_mismatch"),
        F.coalesce(
            F.max(F.abs(F.col("n_chars") - F.length("text"))), F.lit(0)
        )
        .cast("long")
        .alias("max_abs_diff"),
    )


@register(
    "linenumber_spectrum",
    """SELECT CAST(l_linenumber AS BIGINT) AS linenumber,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem GROUP BY linenumber ORDER BY linenumber""",
)
def linenumber_spectrum(spark, sf_dir):
    """Line-number spectrum of the lineitem table: how many lines carry
    each within-order position — the count at position k equals the
    number of orders with ≥k lines, so this spectrum IS the order-size
    survival curve read column-wise (a gap or non-monotonic step means
    broken line numbering — the within-order key integrity check
    key_density_census can't see).

    Scale shape: one ≤|positions|-group map-side agg."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_linenumber").cast("long").alias("linenumber")
    )
    return (
        li.groupBy("linenumber")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lineitems"))
        .orderBy("linenumber")
    )


# ---------------------------------------------------------------------------
# session 135 — supply-side region volume, local-trade share, order total
# consistency
# ---------------------------------------------------------------------------


@register(
    "region_supply_volume",
    """WITH j AS (
  SELECT r.r_name AS region, CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey)
SELECT region, CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(qty) AS BIGINT) AS total_qty,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM j GROUP BY region ORDER BY region""",
)
def region_supply_volume(spark, sf_dir):
    """Shipped volume and value by SUPPLIER region — the supply-side
    twin of region_revenue_rollup (that one rolls up where the money
    comes FROM; this rolls up where the goods come from, and the gap
    between a region's demand and supply rows is its trade balance —
    Q5's local-trade question at the region grain).

    Scale shape: supplier/nation/region broadcast into the lineitem
    scan; a ≤|regions| rollup."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    s = F.broadcast(
        spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
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
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("region", "qty", "cents")
    )
    return (
        j.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("qty").cast("long").alias("total_qty"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("region")
    )


@register(
    "local_trade_share",
    """WITH j AS (
  SELECT CASE WHEN c.c_nationkey = s.s_nationkey THEN 1 ELSE 0 END AS is_local
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey)
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(COALESCE(sum(is_local), 0) AS BIGINT) AS n_local,
       CAST((1000000 * COALESCE(sum(is_local), 0)) // count(*) AS BIGINT)
         AS local_share_q6
FROM j""",
)
def local_trade_share(spark, sf_dir):
    """Local-trade share: what fraction of lineitems ship from a
    supplier in the CUSTOMER'S own nation — the single number TPC-H Q5
    filters for and Q7 matrixes (under random supplier assignment the
    expectation is 1/|nations| ≈ 4%; a synthetic generator that
    encodes no home bias should sit exactly there, and a real
    marketplace far above it).

    Scale shape: the Q7-style star — orderkey and custkey joins
    un-hinted, supplier broadcast via AQE; a 1-row census."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.when(F.col("c_nationkey") == F.col("s_nationkey"), 1)
            .otherwise(0)
            .alias("is_local")
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.coalesce(F.sum("is_local"), F.lit(0)).cast("long").alias("n_local"),
        F.expr(
            "CAST((1000000 * COALESCE(sum(is_local), 0)) div count(1)"
            " AS BIGINT)"
        ).alias("local_share_q6"),
    )


@register(
    "order_total_consistency",
    """WITH ls AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS line_cents
  FROM lineitem GROUP BY l_orderkey),
j AS (SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
             CAST(COALESCE(ls.line_cents, 0) AS BIGINT) AS line_cents
      FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(COALESCE(sum(CASE WHEN total_cents = line_cents THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_exact_match,
       CAST(round(1000000 * (CAST(COALESCE(sum(abs(total_cents - line_cents)), 0)
            AS DOUBLE) / count(*))) AS BIGINT) AS mean_abs_diff_c_q6
FROM j""",
)
def order_total_consistency(spark, sf_dir):
    """Header-vs-lines reconciliation: does o_totalprice equal the sum
    of its lines' extended prices — the classic two-grain consistency
    audit (real schemas drift apart under tax/discount/rounding rules;
    whatever this corpus's rule is, the exact-match count and mean
    absolute gap DOCUMENT it, and a drift in that gap over loads is
    the alarm). Orders with no lines compare against 0.

    Scale shape: one orderkey agg over lineitem, an un-hinted LEFT
    probe, a 1-row census."""
    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("line_cents")
        )
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("total_cents"),
    )
    j = o.join(ls, o["o_orderkey"] == ls["l_orderkey"], "left").select(
        "total_cents",
        F.coalesce("line_cents", F.lit(0)).cast("long").alias("line_cents"),
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.coalesce(
            F.sum(
                F.when(F.col("total_cents") == F.col("line_cents"), 1).otherwise(
                    0
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_exact_match"),
        F.expr(
            "CAST(round(1000000 * (CAST(COALESCE(sum(abs(total_cents"
            " - line_cents)), 0) AS DOUBLE) / count(1))) AS BIGINT)"
        ).alias("mean_abs_diff_c_q6"),
    )


# ---------------------------------------------------------------------------
# session 136 — breadth vs value, region top part, top value users
# ---------------------------------------------------------------------------


@register(
    "basket_breadth_value",
    """WITH ob AS (
  SELECT l.l_orderkey, CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY l.l_orderkey),
j AS (SELECT CASE WHEN ob.n_brands >= 3 THEN 3 ELSE ob.n_brands END AS breadth,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM ob JOIN orders o ON o.o_orderkey = ob.l_orderkey)
SELECT CAST(breadth AS BIGINT) AS breadth, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(1000000 * (CAST(sum(cents) AS DOUBLE) / count(*))) AS BIGINT)
         AS mean_cents_q6
FROM j GROUP BY breadth ORDER BY breadth""",
)
def basket_breadth_value(spark, sf_dir):
    """Do multi-brand baskets spend more: mean order value per brand-
    breadth bucket (1/2/3+) — the cross-sell VALUE argument
    (order_brand_breadth counts the baskets; this prices them, and the
    uplift from bucket 1 to 2 is the number a bundle-promotion business
    case quotes).

    Scale shape: one orderkey distinct-brand agg, an un-hinted
    join-back to order headers, a 3-bucket rollup."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    ob = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_orderkey")
        .agg(F.countDistinct("p_brand").cast("long").alias("n_brands"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    j = ob.join(o, ob["l_orderkey"] == o["o_orderkey"]).select(
        F.expr("CASE WHEN n_brands >= 3 THEN 3 ELSE n_brands END").alias(
            "breadth"
        ),
        "cents",
    )
    return (
        j.groupBy("breadth")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(cents) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_cents_q6"),
        )
        .select(
            F.col("breadth").cast("long").alias("breadth"),
            "n_orders",
            "mean_cents_q6",
        )
        .orderBy("breadth")
    )


@register(
    "region_top_part",
    """WITH j AS (
  SELECT r.r_name AS region, l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey),
c AS (SELECT region, l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
      FROM j GROUP BY region, l_partkey),
m AS (SELECT region, CAST(max(total_qty) AS BIGINT) AS top_qty
      FROM c GROUP BY region)
SELECT m.region, CAST(min(c.l_partkey) AS BIGINT) AS top_partkey, m.top_qty
FROM m JOIN c ON c.region = m.region AND c.total_qty = m.top_qty
GROUP BY m.region, m.top_qty ORDER BY m.region""",
)
def region_top_part(spark, sf_dir):
    """Highest-volume part per supplier region — the regional bestseller
    board (region_supply_volume totals each region; this names what
    each region actually moves, the Q2 argmax on the supply star with
    the min-partkey tiebreak).

    Scale shape: dims broadcast into the lineitem scan; the
    (region, part) agg and its argmax join run on cell-bounded rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_partkey", F.col("l_quantity").cast("long").alias("qty")
    )
    s = F.broadcast(
        spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
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
    c = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("region", "l_partkey")
        .agg(F.sum("qty").cast("long").alias("total_qty"))
        .localCheckpoint()  # maxima + join-back both consume it
    )
    m = c.groupBy("region").agg(
        F.max("total_qty").cast("long").alias("top_qty")
    ).withColumnRenamed("region", "rg")
    j = c.join(
        m, (c["region"] == m["rg"]) & (c["total_qty"] == m["top_qty"])
    ).select("rg", "l_partkey", "top_qty")
    return (
        j.groupBy("rg", "top_qty")
        .agg(F.min("l_partkey").cast("long").alias("top_partkey"))
        .select(F.col("rg").alias("region"), "top_partkey", "top_qty")
        .orderBy("region")
    )


@register(
    "top_value_users",
    """WITH u AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(row_number() OVER (ORDER BY total_cents DESC, user_id ASC)
            AS BIGINT) AS rank,
       n_events, total_cents
FROM u ORDER BY total_cents DESC, user_id ASC LIMIT 10""",
)
def top_value_users(spark, sf_dir):
    """Top-10 users by lifetime event value — the whale-USER board
    (top_value_events flags single transactions; revenue_pareto_users
    proves concentration exists; these are the named accounts the
    concentration IS, with volume attached).

    Scale shape: one user agg, TakeOrdered 10."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("total_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    top = u.orderBy(F.desc("total_cents"), F.asc("user_id")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("total_cents"), F.asc("user_id")))
        .cast("long"),
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        "rank",
        "n_events",
        "total_cents",
    )


# ---------------------------------------------------------------------------
# session 137 — supplier returns board, day-of-month profile, lang vocab
# overlap
# ---------------------------------------------------------------------------


@register(
    "supplier_return_topk",
    """WITH s AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lineitems,
         CAST(COALESCE(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_returned
  FROM lineitem GROUP BY l_suppkey),
r AS (SELECT l_suppkey, n_lineitems, n_returned,
             CAST((1000000 * n_returned) // n_lineitems AS BIGINT)
               AS return_rate_q6
      FROM s WHERE n_lineitems >= 5)
SELECT l_suppkey, n_lineitems, n_returned, return_rate_q6,
       CAST(row_number() OVER (ORDER BY return_rate_q6 DESC, l_suppkey ASC)
            AS BIGINT) AS rank
FROM r ORDER BY return_rate_q6 DESC, l_suppkey ASC LIMIT 10""",
)
def supplier_return_topk(spark, sf_dir):
    """Worst-returning suppliers: return rate per supplier, volume-
    gated, top-10 — the third leg of the vendor scorecard (delay board
    says who ships late, discount board who erodes margin, THIS who
    ships product that comes back; one supplier on all three boards is
    a terminated contract).

    Scale shape: one suppkey agg, a filtered TakeOrdered 10."""
    s = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.coalesce(
                F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_returned"),
        )
    )
    r = s.where(F.col("n_lineitems") >= 5).select(
        "l_suppkey",
        "n_lineitems",
        "n_returned",
        F.expr(
            "CAST((1000000 * n_returned) div n_lineitems AS BIGINT)"
        ).alias("return_rate_q6"),
    )
    top = r.orderBy(F.desc("return_rate_q6"), F.asc("l_suppkey")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("return_rate_q6"), F.asc("l_suppkey")))
        .cast("long"),
    ).select(
        "l_suppkey", "n_lineitems", "n_returned", "return_rate_q6", "rank"
    )


@register(
    "day_of_month_profile",
    """WITH o AS (
  SELECT day(CAST(o_orderdate AS TIMESTAMP)) AS dom,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders)
SELECT CAST(dom AS BIGINT) AS day_of_month, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM o GROUP BY dom ORDER BY day_of_month""",
)
def day_of_month_profile(spark, sf_dir):
    """Order volume by day of month (1-31) — the salary-cycle/billing-
    cycle detector (consumer books spike after paydays, B2B at
    month-end close; a flat profile means neither drives this
    generator — the third calendar axis after weekday and month).
    day() is pure Gregorian arithmetic in both engines.

    Scale shape: map-side day math, a ≤31-group agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("day(CAST(o_orderdate AS TIMESTAMP))").alias("dom"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        o.groupBy("dom")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            F.col("dom").cast("long").alias("day_of_month"),
            "n_orders",
            "revenue_cents",
        )
        .orderBy("day_of_month")
    )


@register(
    "lang_vocab_overlap",
    f"""WITH t AS (
  SELECT DISTINCT lang, term FROM (
    SELECT lang, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
    FROM documents)),
sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY lang),
pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(count(*) AS BIGINT) AS inter
       FROM t a JOIN t b ON a.term = b.term AND a.lang < b.lang
       GROUP BY a.lang, b.lang)
SELECT pr.lang_a, pr.lang_b, sa.n AS n_terms_a, sb.n AS n_terms_b, pr.inter,
       CAST((1000000 * pr.inter) // (sa.n + sb.n - pr.inter) AS BIGINT)
         AS jaccard_q6
FROM pr JOIN sz sa ON sa.lang = pr.lang_a JOIN sz sb ON sb.lang = pr.lang_b
ORDER BY lang_a, lang_b""",
)
def lang_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary Jaccard between language labels — the
    lexical-separation audit of the lang dimension
    (source_vocab_overlap asks it of sources; high overlap between two
    LANG labels means the labels don't mark real languages — exactly
    what language_confusion_matrix's classifier struggles with, read
    from the vocabulary side). Pairs with zero shared terms drop out.

    Scale shape: one (lang, term) distinct; the pair join blocks on
    the term key (fanout = langs per term); rollups on |langs|² rows."""
    t = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(spark_tokens("text")).alias("term"))
        .distinct()
        .localCheckpoint()  # sizes + both pair sides consume it
    )
    sz = t.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = t.select(F.col("lang").alias("lang_a"), "term")
    b = t.select(F.col("lang").alias("lang_b"), "term")
    pr = (
        a.join(b, "term")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = F.broadcast(
        sz.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_terms_a"))
    )
    sb = F.broadcast(
        sz.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_terms_b"))
    )
    return (
        pr.join(sa, "lang_a")
        .join(sb, "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_terms_a",
            "n_terms_b",
            "inter",
            F.expr(
                "CAST((1000000 * inter) div (n_terms_a + n_terms_b - inter)"
                " AS BIGINT)"
            ).alias("jaccard_q6"),
        )
        .orderBy("lang_a", "lang_b")
    )


# ---------------------------------------------------------------------------
# session 138 — purchase value by hour, customer order coverage, quality
# extremes board
# ---------------------------------------------------------------------------


@register(
    "purchase_value_by_hour",
    """WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
h AS (SELECT hour, CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(cents) AS BIGINT) AS value_cents
      FROM e GROUP BY hour),
t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS tot FROM h)
SELECT CAST(h.hour AS BIGINT) AS hour, h.n_purchases, h.value_cents,
       CASE WHEN t.tot = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * h.value_cents) // t.tot AS BIGINT)
       END AS value_share_q6
FROM h CROSS JOIN t ORDER BY hour""",
)
def purchase_value_by_hour(spark, sf_dir):
    """When the MONEY moves: purchase value by hour of day — the
    value-weighted version of the hour profiles (events_hour_profile
    counts traffic; type_peak_hour finds each type's peak; THIS
    weights by cents, and the hours where value share exceeds volume
    share are the big-basket hours fraud screens watch hardest).
    Observed hours only.

    Scale shape: a filtered map-side projection, a ≤24-group agg."""
    e = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.expr(
                "(unix_micros(cast(ts as timestamp)) div 3600000000) % 24"
            ).alias("hour"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    h = e.groupBy("hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("value_cents"),
    )
    t = h.agg(F.sum("value_cents").cast("long").alias("tot"))
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            F.col("hour").cast("long").alias("hour"),
            "n_purchases",
            "value_cents",
            F.expr(
                "CASE WHEN tot = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * value_cents) div tot AS BIGINT) END"
            ).alias("value_share_q6"),
        )
        .orderBy("hour")
    )


@register(
    "customer_order_coverage",
    """WITH oc AS (SELECT DISTINCT o_custkey FROM orders),
j AS (SELECT c.c_mktsegment,
             CASE WHEN oc.o_custkey IS NULL THEN 0 ELSE 1 END AS has_order
      FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(COALESCE(sum(has_order), 0) AS BIGINT) AS n_buyers,
       CAST((1000000 * COALESCE(sum(has_order), 0)) // count(*) AS BIGINT)
         AS coverage_q6
FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""",
)
def customer_order_coverage(spark, sf_dir):
    """Customer activation coverage per segment: what share of the
    customer base has EVER ordered — customer is the LEFT spine so
    never-buyers COUNT (segment_repeat_rate conditions on buyers; the
    gap between the two is the dormant-account pool, and Q22 hunts its
    rich corner).

    Scale shape: one distinct over orders' custkey, a LEFT probe on
    custkey, a ≤|segments| rollup."""
    oc = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .withColumn("has_order_flag", F.lit(1))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    j = c.join(oc, c["c_custkey"] == oc["o_custkey"], "left").select(
        "c_mktsegment",
        F.coalesce("has_order_flag", F.lit(0)).alias("has_order"),
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.coalesce(F.sum("has_order"), F.lit(0))
            .cast("long")
            .alias("n_buyers"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "n_buyers",
            F.expr(
                "CAST((1000000 * n_buyers) div n_customers AS BIGINT)"
            ).alias("coverage_q6"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "quality_extremes_board",
    f"""WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT)
           AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')))
           AS BIGINT) AS n_types
  FROM documents),
q AS (SELECT doc_id, n_tok,
             CAST((1000000 * n_types) // n_tok AS BIGINT) AS ttr_q6
      FROM t WHERE n_tok >= 8)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tok, ttr_q6,
       CAST(row_number() OVER (ORDER BY ttr_q6 ASC, doc_id ASC) AS BIGINT)
         AS rank
FROM q ORDER BY ttr_q6 ASC, doc_id ASC LIMIT 10""",
)
def quality_extremes_board(spark, sf_dir):
    """The manual-review queue: the 10 lowest-TTR documents among those
    long enough to judge (≥8 tokens — a 2-token doc trivially scores
    low) — every quality histogram in the family summarises; THIS
    hands a reviewer the actual worst rows, which is how quality
    thresholds get calibrated in practice (look at the docs the gate
    would cut, then set the gate).

    Scale shape: map-side token stats, a filtered TakeOrdered 10."""
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(spark_tokens("text")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(spark_tokens("text")))
        .cast("long")
        .alias("n_types"),
    )
    q = t.where(F.col("n_tok") >= 8).select(
        "doc_id",
        "n_tok",
        F.expr("CAST((1000000 * n_types) div n_tok AS BIGINT)").alias(
            "ttr_q6"
        ),
    )
    top = q.orderBy(F.asc("ttr_q6"), F.asc("doc_id")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.asc("ttr_q6"), F.asc("doc_id")))
        .cast("long"),
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_tok", "ttr_q6", "rank"
    )


# ---------------------------------------------------------------------------
# session 139 — session value histogram, repeat-run census, user-day
# intensity
# ---------------------------------------------------------------------------


@register(
    "session_value_histogram",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
fl AS (
  SELECT user_id, t_us, event_id, cents,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL
              OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM t),
se AS (
  SELECT user_id, cents,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM fl),
ses AS (SELECT user_id, sid, CAST(sum(cents) AS BIGINT) AS c
        FROM se GROUP BY user_id, sid),
bk AS (SELECT CASE WHEN c <= 0 THEN -1
              ELSE CAST(length(bin(c)) - 1 AS BIGINT) END AS bucket
       FROM ses)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def session_value_histogram(spark, sf_dir):
    """Value per session (log2-cents; bucket −1 = zero-value sessions)
    — the monetisation shape at session grain (session_duration and
    session_depth measure engagement; this measures what a session is
    WORTH, and the zero-value bucket share is the browse-only rate
    the conversion family divides by).

    Scale shape: the session machinery's ONE user exchange, a
    (user, session) sum, a ≤~40-bucket rollup."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    fl = t.withColumn(
        "is_start",
        F.expr(
            "CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            " IS NULL OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us,"
            f" event_id) > {_SESSION_GAP_US} THEN 1 ELSE 0 END"
        ),
    )
    se = fl.withColumn(
        "sid",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ses = se.groupBy("user_id", "sid").agg(
        F.sum("cents").cast("long").alias("c")
    )
    bk = ses.select(
        F.expr(
            "CASE WHEN c <= 0 THEN -1"
            " ELSE CAST(length(bin(c)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy("bucket")
    )


@register(
    "repeat_run_histogram",
    f"""WITH {_SQL_POS},
r AS (SELECT doc_id, i, term,
             CASE WHEN lag(term) OVER (PARTITION BY doc_id ORDER BY i) = term
             THEN 0 ELSE 1 END AS brk
      FROM p),
g AS (SELECT doc_id,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM r),
runs AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS run_len
         FROM g GROUP BY doc_id, grp),
mx AS (SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run FROM runs
       GROUP BY doc_id),
bk AS (SELECT CASE WHEN max_run >= 5 THEN 5 ELSE max_run END AS bucket FROM mx)
SELECT CAST(bucket AS BIGINT) AS max_run_bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM bk GROUP BY bucket ORDER BY max_run_bucket""",
)
def repeat_run_histogram(spark, sf_dir):
    """Longest CONSECUTIVE same-token run per document (1/2/3/4/5+) —
    the stutter detector (maxtf_ratio_histogram counts repetition
    anywhere in the doc; a RUN is the 'foo foo foo foo' generation/
    scrape failure mode, invisible to bag-of-words stats and the
    specific pattern repetition penalties in decoders exist for).
    Gaps-and-islands per document on the equality-break flag.

    Scale shape: both windows partition by doc_id (bounded by one
    doc's length); the run/max aggs are doc-keyed; a 5-bucket
    rollup."""
    wdf = _docs(spark, sf_dir).select(
        "doc_id", spark_tokens("text").alias("words")
    )
    p = wdf.select("doc_id", F.posexplode("words").alias("i", "term"))
    wd = Window.partitionBy("doc_id").orderBy("i")
    r = p.withColumn(
        "brk",
        F.when(F.lag("term").over(wd) == F.col("term"), 0).otherwise(1),
    )
    g = r.select(
        "doc_id",
        F.sum("brk")
        .over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("grp"),
    )
    runs = g.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    mx = runs.groupBy("doc_id").agg(
        F.max("run_len").cast("long").alias("max_run")
    )
    bk = mx.select(
        F.expr("CASE WHEN max_run >= 5 THEN 5 ELSE max_run END").alias(
            "bucket"
        )
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            F.col("bucket").cast("long").alias("max_run_bucket"), "n_docs"
        )
        .orderBy("max_run_bucket")
    )


@register(
    "user_day_intensity_histogram",
    f"""WITH ud AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, day_num),
bk AS (SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket FROM ud)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_user_days
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def user_day_intensity_histogram(spark, sf_dir):
    """Events per active user-day, log2-banded — the intensity grain
    between per-event and per-user views (user_activity_histogram
    totals a user's whole history; THIS asks how hard a user hits the
    product on a day they show up at all, the engagement-DEPTH
    distribution whose heavy tail is either power users or runaway
    clients).

    Scale shape: one (user, day) agg, a ≤~16-bucket rollup."""
    ud = (
        _events(spark, sf_dir)
        .groupBy(
            "user_id",
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
                "day_num"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    bk = ud.select(
        F.expr("CAST(length(bin(n)) - 1 AS BIGINT)").alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_user_days"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 140 — session bounce rate, segment revenue, balance quantiles
# ---------------------------------------------------------------------------


@register(
    "session_bounce_rate",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
fl AS (
  SELECT user_id, t_us, event_id, event_type,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL
              OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM t),
se AS (
  SELECT user_id, event_type, is_start,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM fl),
ses AS (SELECT user_id, sid,
               CAST(count(*) AS BIGINT) AS n_ev,
               max(CASE WHEN is_start = 1 THEN event_type END) AS entry_type
        FROM se GROUP BY user_id, sid)
SELECT entry_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n_ev = 1) AS BIGINT) AS n_bounce,
       CAST((1000000 * count(*) FILTER (WHERE n_ev = 1)) // count(*) AS BIGINT)
         AS bounce_q6
FROM ses GROUP BY entry_type ORDER BY entry_type""",
)
def session_bounce_rate(spark, sf_dir):
    """Bounce rate by session ENTRY event type — single-event sessions
    as a share of sessions that started with each type (the landing-
    quality readout: an entry type with a high bounce share is a door
    users open and immediately close; session_depth_conversion measures
    depth given entry, this measures abandonment given entry).

    The entry event needs no argmin: the session machinery's is_start
    flag marks EXACTLY one row per session, so the entry type is a
    plain conditional max within the (user, sid) group — no min_by, no
    struct-ordering portability trap (DuckDB max_by rejects struct
    keys).

    Scale shape: the session machinery's ONE user exchange; the
    (user, sid) agg rides the same partitioning; the final rollup is
    ≤ #event-types rows."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    fl = t.withColumn(
        "is_start",
        F.expr(
            "CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            " IS NULL OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us,"
            f" event_id) > {_SESSION_GAP_US} THEN 1 ELSE 0 END"
        ),
    )
    se = fl.withColumn(
        "sid",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ses = se.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.max(F.when(F.col("is_start") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
    )
    return (
        ses.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.count_if(F.col("n_ev") == 1).cast("long").alias("n_bounce"),
            F.expr(
                "CAST((1000000 * count_if(n_ev = 1)) div count(*) AS BIGINT)"
            ).alias("bounce_q6"),
        )
        .orderBy("entry_type")
    )


@register(
    "mktsegment_revenue",
    """WITH oc AS (
  SELECT c.c_mktsegment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
seg AS (SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM oc GROUP BY c_mktsegment)
SELECT c_mktsegment, n_orders, revenue_cents,
       CAST((1000000 * revenue_cents) // sum(revenue_cents) OVER () AS BIGINT)
         AS share_q6
FROM seg ORDER BY c_mktsegment""",
)
def mktsegment_revenue(spark, sf_dir):
    """Order revenue by customer market segment — the demand-side
    mix counterpart to region_revenue_rollup's supply-side view, and
    the denominator table for any per-segment normalisation.

    Scale shape: orders⋈customer is un-hinted (customer cardinality is
    unbounded — AQE picks broadcast when the dim is small, sort-merge
    when it isn't); the per-segment agg collapses map-side to
    ≤ #segments partial rows; the share window runs over the
    ≤ #segments aggregated rows only, never the fact table."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    seg = (
        o.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    return seg.select(
        "c_mktsegment",
        "n_orders",
        "revenue_cents",
        F.expr(
            "CAST((1000000 * revenue_cents) div sum(revenue_cents) OVER ()"
            " AS BIGINT)"
        ).alias("share_q6"),
    ).orderBy("c_mktsegment")


@register(
    "customer_balance_quantiles",
    """WITH t AS (
  SELECT c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer),
hist AS (SELECT c_mktsegment, cents, count(*) AS cnt
         FROM t GROUP BY c_mktsegment, cents),
h AS (
  SELECT c_mktsegment, cents, cnt,
         CAST(COALESCE(SUM(cnt) OVER (
           PARTITION BY c_mktsegment ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before,
         CAST(SUM(cnt) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES (250000), (500000), (750000)) AS v(p_q6)),
agg AS (
  SELECT h.c_mktsegment, q.p_q6,
         max(h.n) AS n,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1))
                  THEN h.cents END) AS v_lo,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1)) + 1
                  THEN h.cents END) AS v_hi
  FROM h, q GROUP BY h.c_mktsegment, q.p_q6
)
SELECT c_mktsegment, CAST(p_q6 AS BIGINT) AS p_q6,
       CAST(round(1000000.0 * (v_lo + ((p_q6 / 1000000.0) * (n - 1)
            - floor((p_q6 / 1000000.0) * (n - 1))) * (v_hi - v_lo))) AS BIGINT)
         AS q_cents_q6
FROM agg ORDER BY c_mktsegment, p_q6""",
)
def customer_balance_quantiles(spark, sf_dir):
    """Exact per-segment account-balance quartiles (type-7) via the
    weighted-histogram machinery (doclen_quantiles' shape pointed at
    money). Balances are NEGATIVE for overdrawn customers — the
    interpolation runs entirely in one shared double expression (no
    integer division anywhere), so sign never meets a trunc-vs-floor
    divergence; round() is half-away-from-zero in both engines.

    Scale shape: per-doc values collapse map-side into (segment,
    cents) histogram cells; windows and rank probes run over histogram
    rows only — never Spark's percentile() (which buffers raw group
    values on one reducer)."""
    t = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_mktsegment",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    hist = t.groupBy("c_mktsegment", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("c_mktsegment")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("c_mktsegment")
    h = hist.select(
        "c_mktsegment",
        "cents",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0))
        .cast("long")
        .alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(250000,), (500000,), (750000,)], "p_q6 long")
    rank = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    agg = (
        h.crossJoin(F.broadcast(q))
        .groupBy("c_mktsegment", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(F.col("cum_before") <= F.floor(rank), F.col("cents"))
            ).alias("v_lo"),
            F.max(
                F.when(
                    F.col("cum_before") <= F.floor(rank) + 1, F.col("cents")
                )
            ).alias("v_hi"),
        )
    )
    r = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    frac = r - F.floor(r)
    return agg.select(
        "c_mktsegment",
        F.col("p_q6").cast("long").alias("p_q6"),
        F.round(
            F.lit(1_000_000.0)
            * (F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo")))
        )
        .cast("long")
        .alias("q_cents_q6"),
    ).orderBy("c_mktsegment", "p_q6")


# ---------------------------------------------------------------------------
# session 141 — first-touch profile, weekend share, tax audit
# ---------------------------------------------------------------------------


@register(
    "first_touch_profile",
    """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
rk AS (SELECT user_id, event_type,
              row_number() OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                AS rn
       FROM t),
ft AS (SELECT user_id, event_type AS first_type FROM rk WHERE rn = 1),
pu AS (SELECT user_id,
              max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purch
       FROM t GROUP BY user_id)
SELECT first_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(purch) AS BIGINT) AS n_converted,
       CAST((1000000 * sum(purch)) // count(*) AS BIGINT) AS conv_q6
FROM ft JOIN pu USING (user_id)
GROUP BY first_type ORDER BY first_type""",
)
def first_touch_profile(spark, sf_dir):
    """First-EVER event type per user and the lifetime purchase
    conversion given it — classic first-touch attribution at user
    grain (attribution_window_curve credits per-purchase within a
    window; this asks what door users ARRIVED through and whether
    they ever bought; a user whose first touch IS a purchase counts
    converted by construction).

    Spark takes the first event map-side as min(struct(t_us,
    event_id, event_type)) — no window over the full history; the
    oracle may window (search_collapse rule). event_id breaks ts
    ties so the struct min is total.

    Scale shape: ONE user_id exchange carries both the argmin and
    the purchase flag; the rollup is ≤ #event-types rows."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        "event_type",
    )
    per = t.groupBy("user_id").agg(
        F.min(F.struct("t_us", "event_id", "event_type"))
        .getField("event_type")
        .alias("first_type"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("purch"),
    )
    return (
        per.groupBy("first_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("purch").cast("long").alias("n_converted"),
            F.expr(
                "CAST((1000000 * sum(purch)) div count(*) AS BIGINT)"
            ).alias("conv_q6"),
        )
        .orderBy("first_type")
    )


@register(
    "weekend_activity_share",
    f"""WITH t AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {_US_PER_DAY} + 3) % 7 AS BIGINT) AS dow,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE dow >= 5) AS BIGINT) AS n_weekend,
       CAST((1000000 * count(*) FILTER (WHERE dow >= 5)) // count(*) AS BIGINT)
         AS weekend_q6,
       CAST(sum(cents) AS BIGINT) AS cents,
       CAST(COALESCE(sum(cents) FILTER (WHERE dow >= 5), 0) AS BIGINT)
         AS cents_weekend
FROM t GROUP BY event_type ORDER BY event_type""",
)
def weekend_activity_share(spark, sf_dir):
    """Weekend share of events and of value, per event type — the
    day-mix readout (events_weekday_profile gives the full 7-day
    curve; this collapses it to the one contrast product teams act
    on, split by type so browse vs buy weekend-shift separate).
    dow = (epoch_day + 3) % 7 with 0 = Monday (never dayname()).

    Scale shape: pure map-side conditional agg — one partial row
    per (task, event_type), no joins, no windows."""
    t = _events(spark, sf_dir).select(
        "event_type",
        F.expr(
            f"CAST((unix_micros(cast(ts as timestamp)) div {_US_PER_DAY} + 3)"
            " % 7 AS BIGINT)"
        ).alias("dow"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_if(F.col("dow") >= 5).cast("long").alias("n_weekend"),
            F.expr(
                "CAST((1000000 * count_if(dow >= 5)) div count(*) AS BIGINT)"
            ).alias("weekend_q6"),
            F.sum("cents").cast("long").alias("cents"),
            F.coalesce(F.sum(F.when(F.col("dow") >= 5, F.col("cents"))), F.lit(0))
            .cast("long")
            .alias("cents_weekend"),
        )
        .orderBy("event_type")
    )


@register(
    "lineitem_tax_audit",
    """WITH t AS (
  SELECT CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS base_cents,
         CAST(round(l_extendedprice * l_tax * 100) AS BIGINT) AS tax_cents
  FROM lineitem)
SELECT tax_pct,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(base_cents) AS BIGINT) AS base_cents,
       CAST(sum(tax_cents) AS BIGINT) AS tax_cents
FROM t GROUP BY tax_pct ORDER BY tax_pct""",
)
def lineitem_tax_audit(spark, sf_dir):
    """Tax-rate band census over lineitem: items, taxable base and
    estimated tax revenue per integer tax percent — the fiscal
    counterpart of discount_rate_by_month (the other per-row rate
    column), and a data-quality probe (a tax_pct outside the
    expected 0–8 band is a corrupt row).

    Money rule: tax per row is ONE rounded float product
    round(price·tax·100) (the Q9 rule — never chain rounded integer
    products, and a cents×bp product would need a divide anyway).

    Scale shape: pure map-side agg; ≤ ~9 groups."""
    t = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("CAST(round(l_tax * 100) AS BIGINT)").alias("tax_pct"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
            "base_cents"
        ),
        F.expr(
            "CAST(round(l_extendedprice * l_tax * 100) AS BIGINT)"
        ).alias("tax_cents"),
    )
    return (
        t.groupBy("tax_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("base_cents").cast("long").alias("base_cents"),
            F.sum("tax_cents").cast("long").alias("tax_cents"),
        )
        .orderBy("tax_pct")
    )


# ---------------------------------------------------------------------------
# session 142 — nation balances, ship-span histogram, embedding components
# ---------------------------------------------------------------------------


@register(
    "nation_account_balances",
    """WITH cb AS (
  SELECT c_nationkey AS nk,
         CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS cust_cents
  FROM customer GROUP BY c_nationkey),
sb AS (
  SELECT s_nationkey AS nk,
         CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS supp_cents
  FROM supplier GROUP BY s_nationkey)
SELECT n.n_name,
       CAST(COALESCE(cb.n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(cb.cust_cents, 0) AS BIGINT) AS cust_cents,
       CAST(COALESCE(sb.n_supp, 0) AS BIGINT) AS n_supp,
       CAST(COALESCE(sb.supp_cents, 0) AS BIGINT) AS supp_cents
FROM nation n
LEFT JOIN cb ON cb.nk = n.n_nationkey
LEFT JOIN sb ON sb.nk = n.n_nationkey
ORDER BY n.n_name""",
)
def nation_account_balances(spark, sf_dir):
    """Demand- and supply-side account balances on the nation spine —
    customers and suppliers aggregated independently, then joined onto
    nation so every nation reports (zero-filled) even with no parties
    on one side. The per-row cents rounding happens BEFORE the sum
    (balances are negative for overdrawn accounts; round-then-sum is
    the only order both engines agree on bit-for-bit).

    Scale shape: both legs collapse map-side to ≤ #nations rows; the
    25-row nation spine broadcasts into both joins; no window, no
    fact-table shuffle."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    cb = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
            .cast("long")
            .alias("cust_cents"),
        )
    )
    sb = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_supp"),
            F.sum(F.expr("CAST(round(s_acctbal * 100) AS BIGINT)"))
            .cast("long")
            .alias("supp_cents"),
        )
    )
    return (
        F.broadcast(n)
        .join(cb, n.n_nationkey == cb.nk, "left")
        .join(sb, n.n_nationkey == sb.nk, "left")
        .select(
            "n_name",
            F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_cust"),
            F.coalesce("cust_cents", F.lit(0)).cast("long").alias("cust_cents"),
            F.coalesce("n_supp", F.lit(0)).cast("long").alias("n_supp"),
            F.coalesce("supp_cents", F.lit(0)).cast("long").alias("supp_cents"),
        )
        .orderBy("n_name")
    )


@register(
    "order_ship_span_histogram",
    f"""WITH t AS (
  SELECT l_orderkey,
         epoch_us(CAST(l_shipdate AS TIMESTAMP)) // {_US_PER_DAY} AS day_num
  FROM lineitem),
per AS (SELECT l_orderkey,
               CAST(max(day_num) - min(day_num) AS BIGINT) AS span_days,
               CAST(count(*) AS BIGINT) AS n_items
        FROM t GROUP BY l_orderkey),
bk AS (SELECT CASE WHEN span_days = 0 THEN 0
                   WHEN span_days <= 7 THEN 1
                   WHEN span_days <= 30 THEN 2
                   WHEN span_days <= 90 THEN 3
                   ELSE 4 END AS span_band,
              n_items
       FROM per)
SELECT CAST(span_band AS BIGINT) AS span_band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(n_items) AS BIGINT) AS n_items
FROM bk GROUP BY span_band ORDER BY span_band""",
)
def order_ship_span_histogram(spark, sf_dir):
    """Fulfillment spread per order: days between the first and last
    line-item shipment, banded (same-day / ≤week / ≤month / ≤quarter /
    longer) — the order-level delivery-fragmentation curve
    (ship_lag_histogram measures order→ship latency per item; this
    measures how SCATTERED one order's shipments are).

    Scale shape: one l_orderkey agg (min/max/count ride one
    exchange), then a 5-bucket rollup. Dates become epoch-day
    BIGINTs before any arithmetic."""
    t = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        F.expr(
            f"unix_micros(cast(l_shipdate as timestamp)) div {_US_PER_DAY}"
        ).alias("day_num"),
    )
    per = t.groupBy("l_orderkey").agg(
        (F.max("day_num") - F.min("day_num")).cast("long").alias("span_days"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    bk = per.select(
        F.expr(
            "CASE WHEN span_days = 0 THEN 0 WHEN span_days <= 7 THEN 1"
            " WHEN span_days <= 30 THEN 2 WHEN span_days <= 90 THEN 3"
            " ELSE 4 END"
        ).alias("span_band"),
        "n_items",
    )
    return (
        bk.groupBy("span_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_items").cast("long").alias("n_items"),
        )
        .select(
            F.col("span_band").cast("long").alias("span_band"),
            "n_orders",
            "n_items",
        )
        .orderBy("span_band")
    )


@register(
    "embedding_component_histogram",
    """WITH c AS (
  SELECT CAST(round(u.v * 100) AS BIGINT) AS bucket
  FROM embeddings, unnest(embedding) AS u(v))
SELECT bucket, CAST(count(*) AS BIGINT) AS n_components
FROM c GROUP BY bucket ORDER BY bucket""",
)
def embedding_component_histogram(spark, sf_dir):
    """Distribution of raw embedding component values (centi-unit
    buckets over ALL vector·dim cells) — the saturation/clipping
    audit at component grain (embedding_dim_stats is per-DIMENSION;
    a healthy encoder shows a smooth bell here, int8-clipped or
    dead-ReLU exports show spikes at the rails and at zero).

    The parquet column is FLOAT32; both engines promote to double
    before the *100 and the half-away-from-zero round, so buckets
    match bit-for-bit.

    Scale shape: map-side explode + hash agg; output bounded at a
    few hundred buckets regardless of corpus size."""
    c = _emb(spark, sf_dir).select(
        F.explode("embedding").alias("v")
    ).select(F.expr("CAST(round(v * 100) AS BIGINT)").alias("bucket"))
    return (
        c.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 143 — roaring postings estimate
# ---------------------------------------------------------------------------


@register(
    "postings_roaring_estimate",
    f"""WITH tf AS ({SQL_TF}),
cc AS (SELECT term, doc_id // 65536 AS chunk, CAST(count(*) AS BIGINT) AS n
       FROM tf GROUP BY term, doc_id // 65536),
ct AS (SELECT term, CAST(sum(n) AS BIGINT) AS df,
              CAST(count(*) AS BIGINT) AS n_containers,
              CAST(sum(8 + CASE WHEN n <= 4096 THEN 2 * n ELSE 8192 END)
                   AS BIGINT) AS bytes_est
       FROM cc GROUP BY term),
bd AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_band, df,
              n_containers, bytes_est
       FROM ct)
SELECT df_band, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(df) AS BIGINT) AS n_postings,
       CAST(sum(n_containers) AS BIGINT) AS n_containers,
       CAST(sum(bytes_est) AS BIGINT) AS bytes_est,
       CAST((1000000 * sum(bytes_est)) // sum(df) AS BIGINT)
         AS bytes_per_posting_q6
FROM bd GROUP BY df_band ORDER BY df_band""",
)
def postings_roaring_estimate(spark, sf_dir):
    """Index-size cost model #2: Roaring-bitmap bytes for each term's
    doc_id set, by log2-df band — the alternative postings layout next
    to postings_varint_estimate's LEB128 curve (Lucene stores its live
    doc and filter sets exactly this way). The model is the published
    Roaring layout: doc_ids chunk by high 16 bits (doc_id // 65536);
    a chunk holding n ids costs 2n bytes as a sorted-array container
    when n ≤ 4096, else a fixed 8192-byte bitmap, plus 8 bytes of
    per-container header/offset. Crossover vs varint: delta-dense terms
    varint toward ~1 byte/posting while arrays pay a flat 2 — THIS
    table is the evidence for which structure each df band should get.
    On the sandbox corpus every term fits one container (doc_ids <
    65536); the multi-chunk path is exercised by the property suite
    with injected wide-id corpora.

    Determinism: pure integer arithmetic end to end.

    Scale shape: (term, chunk) counts combine map-side (the chunk key
    subdivides a celebrity term's group instead of concentrating it);
    the per-term rollup is vocab-sized; band rollup ≤64 rows."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cc = tf.groupBy("term", F.expr("doc_id div 65536").alias("chunk")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ct = cc.groupBy("term").agg(
        F.sum("n").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("n_containers"),
        F.sum(
            F.expr("8 + CASE WHEN n <= 4096 THEN 2 * n ELSE 8192 END")
        )
        .cast("long")
        .alias("bytes_est"),
    )
    bd = ct.select(
        F.expr("CAST(length(bin(df)) - 1 AS BIGINT)").alias("df_band"),
        "df",
        "n_containers",
        "bytes_est",
    )
    return (
        bd.groupBy("df_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("n_postings"),
            F.sum("n_containers").cast("long").alias("n_containers"),
            F.sum("bytes_est").cast("long").alias("bytes_est"),
        )
        .select(
            "df_band",
            "n_terms",
            "n_postings",
            "n_containers",
            "bytes_est",
            F.expr(
                "CAST((1000000 * bytes_est) div n_postings AS BIGINT)"
            ).alias("bytes_per_posting_q6"),
        )
        .orderBy("df_band")
    )


# ---------------------------------------------------------------------------
# session 144 — char-bigram entropy, size-price curve
# ---------------------------------------------------------------------------


@register(
    "char_bigram_entropy_source",
    """WITH t AS (SELECT source, lower(text) AS t FROM documents WHERE length(text) >= 2),
bg AS (
  SELECT source,
         unnest(list_transform(generate_series(1, length(t) - 1),
                               i -> substring(t, i, 2))) AS gram
  FROM t),
c AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY source, gram),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM c GROUP BY source),
h AS (
  SELECT c.source,
         CAST(round(1000000 * (CAST(c.c AS DOUBLE) / tot.tot)
              * ln(CAST(tot.tot AS DOUBLE) / c.c)) AS BIGINT) AS hq6
  FROM c JOIN tot USING (source))
SELECT h.source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(max(tot.tot) AS BIGINT) AS total_bigrams,
       CAST(sum(h.hq6) AS BIGINT) AS entropy_q6
FROM h JOIN tot ON h.source = tot.source
GROUP BY h.source ORDER BY h.source""",
)
def char_bigram_entropy_source(spark, sf_dir):
    """Character-BIGRAM Shannon entropy per source — the order-1
    compressibility gauge (source_unigram_entropy is token-level;
    low_entropy_docs is per-doc char-UNIGRAM; this one sees character
    CONTEXT, so templated/boilerplate sources score visibly below prose
    even when their unigram mix looks normal — entropy here ≈ bits/char
    an order-1 coder would pay, the cheap proxy for 'how much would
    this source deflate').

    Bigrams come from codepoint-indexed substring(t, i, 2) — both
    engines index substrings by codepoint, so CJK text yields identical
    grams. Per-(source, gram) −p·ln p is q6-rounded FIRST (the
    source_unigram_entropy rule), then the sum is an exact BIGINT add.
    Both engines build the per-doc gram list with the same
    transform-over-sequence lambda and explode it (DuckDB's
    unnest(list_transform(...)) avoids the correlated lateral unnest
    that is a DuckDB internal error — the cooccur_window_curve
    lesson).

    Scale shape: the gram explode is map-side (≈ one row per character
    of corpus — the same cost class as tokenize); both aggs are
    hash-combinable; output is |sources| rows."""
    t = (
        _docs(spark, sf_dir)
        .where(F.length("text") >= 2)
        .select("source", F.lower("text").alias("t"))
    )
    bg = t.select(
        "source",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("gram"),
    )
    c = bg.groupBy("source", "gram").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = c.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    h = c.join(tot, "source").select(
        "source",
        F.expr(
            "CAST(round(1000000 * (CAST(c AS DOUBLE) / tot)"
            " * ln(CAST(tot AS DOUBLE) / c)) AS BIGINT)"
        ).alias("hq6"),
        "tot",
    )
    return (
        h.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.max("tot").cast("long").alias("total_bigrams"),
            F.sum("hq6").cast("long").alias("entropy_q6"),
        )
        .orderBy("source")
    )


@register(
    "size_price_profile",
    """SELECT CAST(p_size AS BIGINT) AS p_size,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
       CAST(min(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM part GROUP BY p_size ORDER BY p_size""",
)
def size_price_profile(spark, sf_dir):
    """Retail price by part size — does bigger cost more, and how wide
    is the spread per size rung (part_type_size_matrix counts the
    type×size grid; part_type_anova tests price against TYPE — this is
    the SIZE axis, the one physical attribute, with sum/min/max cents
    so the reader derives mean and range). Cents are rounded per row
    before every aggregate (the Q1 rule).

    Scale shape: one map-side-combined agg over the part scan into
    ≤|sizes| rows; only 2 columns read."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_size").cast("long").alias("p_size"),
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        p.groupBy("p_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("price_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .orderBy("p_size")
    )


# ---------------------------------------------------------------------------
# session 145 — sign-LSH calibration, auto date histogram, Yule's K
# ---------------------------------------------------------------------------

# math.pi folded to a repr() e-notation literal (the _HLL_C rule: a plain
# decimal literal is DECIMAL in Spark SQL and diverges from DuckDB's double).
_PI_E = "3.141592653589793e0"

# 16-bit sign signature from the first 16 raw components (the exact bit
# substrate embedding_lsh_pairs banding uses: component > 0 → bit set).
# ONE shared string so both engines test the identical predicate per dim;
# {i1} is the 1-based index (DuckDB arrays; Spark uses 0-based v[i] so its
# expr is generated separately below with the same > 0 convention).
_SIGN_BIT_SQL = " + ".join(
    f"CASE WHEN v[{i + 1}] > 0 THEN {1 << i} ELSE 0 END" for i in range(16)
)
_SIGN_BIT_SPARK = " + ".join(
    f"CASE WHEN v[{i}] > 0 THEN {1 << i} ELSE 0 END" for i in range(16)
)
_BAND_BV_SQL = " + ".join(
    f"CASE WHEN v[4 * j + {i + 1}] > 0 THEN {1 << i} ELSE 0 END" for i in range(4)
)


@register(
    "signlsh_calibration_curve",
    _SQL_EMB_E
    + f"""
bnd AS (
  SELECT vec_id, j, {_BAND_BV_SQL} AS bv
  FROM e, (SELECT unnest(generate_series(0, 3)) AS j)),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM bnd a JOIN bnd b2 ON a.j = b2.j AND a.bv = b2.bv AND a.vec_id < b2.vec_id),
sg AS (SELECT vec_id, CAST({_SIGN_BIT_SQL} AS BIGINT) AS sig FROM e),
un AS (
  SELECT vec_id, list_transform(v, x -> x / n) AS u
  FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e)),
p AS (
  SELECT bit_count(xor(sa.sig, sb.sig)) AS hd,
         CAST(round(1000000 * list_dot_product(ua.u, ub.u)) AS BIGINT) AS cos_q6
  FROM cand
  JOIN sg sa ON cand.id_a = sa.vec_id JOIN sg sb ON cand.id_b = sb.vec_id
  JOIN un ua ON cand.id_a = ua.vec_id JOIN un ub ON cand.id_b = ub.vec_id)
SELECT CAST(hd AS BIGINT) AS hamming, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(CAST(sum(cos_q6) AS BIGINT) // count(*) AS BIGINT) AS mean_cos_q6,
       CAST(round(1000000 * cos({_PI_E} * hd / 16)) AS BIGINT) AS pred_cos_q6
FROM p GROUP BY hd ORDER BY hamming""",
)
def signlsh_calibration_curve(spark, sf_dir):
    """Calibration of the sign-LSH angle estimator over the engine's OWN
    candidate set: for every banded collision pair (the exact
    embedding_lsh_pairs OR-construction — 4 tables × 4 sign bits), the
    16-bit Hamming distance between full sign signatures versus the true
    cosine, plus the Goemans-Williamson prediction cos(π·d/16). Where
    the mean observed cosine tracks the predicted curve the sketch is
    honest; a flat observed curve says 16 axis-aligned hyperplanes
    aren't discriminating this embedding space (the tuning knob is more
    bits, not more tables). Third member of the sketch-calibration
    family after simhash_hamming_histogram and lsh_candidate_precision.

    Determinism: signatures/bands test raw components > 0 (floats are
    float32→double exact both engines); vectors are normalized ONCE and
    each pair pays one fold dot (the pagerank rule); per-pair cos is
    q6-rounded FIRST, the mean is an exact-BIGINT sum with one
    truncating division (both engines truncate toward zero); the
    predicted value folds math.pi as an e-notation literal.

    Scale shape: candidates come only from the 4 band equi-joins —
    never all-pairs; signatures/norms are map-side; the rollup is ≤17
    rows."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    band_structs = []
    for j in range(4):
        bv = None
        for i in range(4):
            bit = F.when(F.expr(f"v[{4 * j + i}]") > 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            bv = bit if bv is None else bv + bit
        band_structs.append(F.struct(F.lit(j).alias("j"), bv.alias("bv")))
    bands = e.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("vec_id", F.col("band.j").alias("j"), F.col("band.bv").alias("bv"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    sg = e.select(
        "vec_id", F.expr(f"CAST({_SIGN_BIT_SPARK} AS BIGINT)").alias("sig")
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, z) -> acc + z)"
    un = e.withColumn("nrm", F.sqrt(F.expr(dot.format(a="v", b="v")))).select(
        "vec_id", F.expr("transform(v, x -> x / nrm)").alias("u")
    )
    p = (
        cand.join(sg.select(F.col("vec_id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sg.select(F.col("vec_id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
        .join(un.select(F.col("vec_id").alias("id_a"), F.col("u").alias("ua")), "id_a")
        .join(un.select(F.col("vec_id").alias("id_b"), F.col("u").alias("ub")), "id_b")
        .select(
            F.expr("bit_count(sa ^ sb)").alias("hd"),
            F.expr(
                f"CAST(round(1000000 * ({dot.format(a='ua', b='ub')})) AS BIGINT)"
            ).alias("cos_q6"),
        )
    )
    return (
        p.groupBy("hd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("cos_q6").cast("long").alias("sum_cos"),
        )
        .select(
            F.col("hd").cast("long").alias("hamming"),
            "n_pairs",
            F.expr("CAST(sum_cos div n_pairs AS BIGINT)").alias("mean_cos_q6"),
            F.expr(
                f"CAST(round(1000000 * cos({_PI_E} * hd / 16)) AS BIGINT)"
            ).alias("pred_cos_q6"),
        )
        .orderBy("hamming")
    )


@register(
    "events_markov2_transitions",
    """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
p AS (
  SELECT lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
           AS prev2_type,
         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
           AS prev1_type,
         event_type AS next_type
  FROM t),
c AS (
  SELECT prev2_type, prev1_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM p WHERE prev2_type IS NOT NULL
  GROUP BY prev2_type, prev1_type, next_type)
SELECT prev2_type, prev1_type, next_type, n_trans,
       CAST((1000000 * n_trans)
            // sum(n_trans) OVER (PARTITION BY prev2_type, prev1_type)
            AS BIGINT) AS p_q6
FROM c ORDER BY prev2_type, prev1_type, next_type""",
)
def events_markov2_transitions(spark, sf_dir):
    """SECOND-order Markov transitions over per-user event sequences:
    counts and row-normalized probabilities of next_type given the
    (prev2, prev1) context — the lift this table shows over
    events_markov_transitions' first-order rows is exactly the evidence
    that journeys have memory (e.g. view→click→purchase vs
    click→view→purchase converting differently is invisible at order
    1). markov_row_entropy on both orders quantifies the memory as an
    entropy drop.

    Determinism: equal-timestamp events order by event_id inside BOTH
    lag windows (the interevent_gap_histogram rule); p_q6 is the
    integer (1e6·n) div context_total — no float anywhere; DuckDB's
    HUGEINT window sum is CAST back (the session-37 rule).

    Scale shape: the two lags share ONE user_id-partitioned window
    sort (same frame, same ordering — one exchange, one sort); counts
    combine map-side into ≤|types|³ rows and the normalizing window
    runs over that tiny table only."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    p = t.select(
        F.lag("event_type", 2).over(w).alias("prev2_type"),
        F.lag("event_type", 1).over(w).alias("prev1_type"),
        F.col("event_type").alias("next_type"),
    )
    c = (
        p.where(F.col("prev2_type").isNotNull())
        .groupBy("prev2_type", "prev1_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    wr = Window.partitionBy("prev2_type", "prev1_type")
    return (
        c.withColumn("tot", F.sum("n_trans").over(wr))
        .select(
            "prev2_type",
            "prev1_type",
            "next_type",
            "n_trans",
            F.expr("CAST((1000000 * n_trans) div tot AS BIGINT)").alias("p_q6"),
        )
        .orderBy("prev2_type", "prev1_type", "next_type")
    )


# ---------------------------------------------------------------------------
# session 146 — error-rate series, block-max tightness, join-size estimates
# ---------------------------------------------------------------------------


@register(
    "error_rate_daily",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
             CAST(COALESCE(d.n_errors, 0) AS BIGINT) AS n_errors
      FROM spine LEFT JOIN d USING (day_num))
SELECT CAST(day_num AS BIGINT) AS day_num, n_events, n_errors,
       CASE WHEN n_events = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * n_errors) // n_events AS BIGINT)
       END AS err_rate_q6
FROM f ORDER BY day_num""",
)
def error_rate_daily(spark, sf_dir):
    """Daily error-rate series — the first SRE chart (volume and the
    'error' share of it, day by day) on the zero-filled calendar spine
    so quiet days read as 0-volume rows rather than vanishing (the
    events_serial_diff rule; a gap that disappears from the series is
    exactly the outage you were looking for). daily_ctr is the same
    shape for the click/view pair; this is the reliability leg.

    Determinism: counts are integers; the rate is the integer
    (1e6·errors) div events with an explicit 0 for empty days.

    Scale shape: one day-keyed map-side-combined agg (the conditional
    error counter folds in the same pass); spine join and output are
    calendar-bounded."""
    d = _events(spark, sf_dir).groupBy(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_errors"),
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d, "day_num", "left").select(
        F.col("day_num").cast("long").alias("day_num"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("n_errors", F.lit(0)).cast("long").alias("n_errors"),
    )
    return f.select(
        "day_num",
        "n_events",
        "n_errors",
        F.expr(
            "CASE WHEN n_events = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * n_errors) div n_events AS BIGINT) END"
        ).alias("err_rate_q6"),
    ).orderBy("day_num")


@register(
    "blockmax_tightness_curve",
    f"""WITH tf AS ({SQL_TF}),
blk AS (SELECT term, doc_id // 64 AS blk, CAST(max(tf) AS BIGINT) AS bmax,
               CAST(count(*) AS BIGINT) AS nb
        FROM tf GROUP BY term, doc_id // 64),
per AS (SELECT term, CAST(sum(nb) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(bmax) AS BIGINT) AS sum_bmax,
               CAST(max(bmax) AS BIGINT) AS gmax
        FROM blk GROUP BY term),
bd AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_band,
              n_blocks, sum_bmax, gmax
       FROM per)
SELECT df_band, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(n_blocks) AS BIGINT) AS n_blocks,
       CAST((1000000 * sum(sum_bmax)) // sum(n_blocks * gmax) AS BIGINT)
         AS tightness_q6
FROM bd GROUP BY df_band ORDER BY df_band""",
)
def blockmax_tightness_curve(spark, sf_dir):
    """Why block-max beats MaxScore, measured on this corpus: for each
    term, postings are cut into 64-doc_id blocks (the codec's own block
    grain) and the mean per-block tf bound is compared to the term's
    GLOBAL tf bound — tightness_q6 = Σbmax / (n_blocks·gmax) per log2-df
    band. 1.0 means every block hits the global max (block bounds buy
    no extra skipping over MaxScore); the lower the curve, the more
    blocks a block-max WAND can prune that a global-bound WAND cannot.
    This is the capacity-planning table behind wand.py's block-max
    serving path, with tf as the score surrogate (BM25's per-term
    contribution is monotone in tf at fixed df/dl, so a tf bound IS the
    score bound's shape).

    Determinism: pure integer arithmetic; the single division happens
    once per band row.

    Scale shape: the (term, block) agg combines map-side and subdivides
    celebrity terms instead of concentrating them (the roaring-chunk
    argument); per-term and band rollups are vocab- then ≤64-row
    sized."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    blk = tf.groupBy("term", F.expr("doc_id div 64").alias("blk")).agg(
        F.max("tf").cast("long").alias("bmax"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    per = blk.groupBy("term").agg(
        F.sum("nb").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("bmax").cast("long").alias("sum_bmax"),
        F.max("bmax").cast("long").alias("gmax"),
    )
    bd = per.select(
        F.expr("CAST(length(bin(df)) - 1 AS BIGINT)").alias("df_band"),
        "n_blocks",
        "sum_bmax",
        "gmax",
    )
    return (
        bd.groupBy("df_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("n_blocks").cast("long").alias("n_blocks"),
            F.sum("sum_bmax").alias("sb"),
            F.sum(F.expr("n_blocks * gmax")).alias("den"),
        )
        .select(
            "df_band",
            "n_terms",
            "n_blocks",
            F.expr("CAST((1000000 * sb) div den AS BIGINT)").alias(
                "tightness_q6"
            ),
        )
        .orderBy("df_band")
    )


def _join_est_sql(name: str, lt: str, lk: str, rt: str, rk: str) -> str:
    """One System-R join-size row: |L⋈R| estimate n_l·n_r/max(ndv) vs the
    exact per-key Σ n_l(k)·n_r(k)."""
    return f"""SELECT '{name}' AS join_name,
       (SELECT CAST(count(*) AS BIGINT) FROM {lt}) AS n_left,
       (SELECT CAST(count(*) AS BIGINT) FROM {rt}) AS n_right,
       (SELECT CAST(count(DISTINCT {lk}) AS BIGINT) FROM {lt}) AS ndv_left,
       (SELECT CAST(count(DISTINCT {rk}) AS BIGINT) FROM {rt}) AS ndv_right,
       CAST(round(CAST((SELECT count(*) FROM {lt}) AS DOUBLE)
            * CAST((SELECT count(*) FROM {rt}) AS DOUBLE)
            / greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                       (SELECT count(DISTINCT {rk}) FROM {rt}), 1))
         AS BIGINT) AS est_rows,
       (SELECT CAST(COALESCE(sum(a.n * b.n), 0) AS BIGINT)
        FROM (SELECT {lk} AS k, CAST(count(*) AS BIGINT) AS n FROM {lt} GROUP BY {lk}) a
        JOIN (SELECT {rk} AS k, CAST(count(*) AS BIGINT) AS n FROM {rt} GROUP BY {rk}) b
        ON a.k = b.k) AS actual_rows"""


@register(
    "join_size_estimates",
    "\nUNION ALL\n".join(
        [
            _join_est_sql("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
            _join_est_sql("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
            _join_est_sql("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ]
    )
    + "\nORDER BY join_name",
)
def join_size_estimates(spark, sf_dir):
    """Cost-model audit for the engine's three hottest FK joins: the
    System-R join-size estimate |L|·|R|/max(ndv_L, ndv_R) — exactly what
    a Catalyst-style optimizer computes from table statistics — beside
    the EXACT join cardinality (Σ_k n_L(k)·n_R(k), computed from
    per-key counts, never by materializing the join). Where est and
    actual diverge is where the optimizer's independence/containment
    assumptions break on this data — the pre-flight for trusting
    size-based join reordering and broadcast thresholds
    (fact_key_skew_census audits per-KEY skew; this audits the TOTAL).

    Determinism: counts and the actual sum are exact BIGINTs; the
    estimate is one double product-then-divide (counts stay exact
    doubles to ~9e15 rows; beyond 2^53 the rounding is still the same
    IEEE operation in both engines).

    Scale shape: per edge — two scans' count/ndv aggs plus a per-key
    count join whose sides are key-cardinality-sized (the FK join
    itself never materializes); three independent one-row subplans
    union at the end."""
    rows = []
    for name, lt, lk, rt, rk in [
        ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ]:
        lt_df = spark.read.parquet(f"{sf_dir}/{lt}.parquet").select(
            F.col(lk).alias("k")
        )
        rt_df = spark.read.parquet(f"{sf_dir}/{rt}.parquet").select(
            F.col(rk).alias("k")
        )
        ls = lt_df.agg(
            F.count(F.lit(1)).cast("long").alias("n_left"),
            F.countDistinct("k").cast("long").alias("ndv_left"),
        )
        rs = rt_df.agg(
            F.count(F.lit(1)).cast("long").alias("n_right"),
            F.countDistinct("k").cast("long").alias("ndv_right"),
        )
        la = lt_df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("nl"))
        ra = rt_df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("nr"))
        act = la.join(ra, "k").agg(
            F.coalesce(F.sum(F.expr("nl * nr")), F.lit(0))
            .cast("long")
            .alias("actual_rows")
        )
        rows.append(
            ls.crossJoin(rs)
            .crossJoin(act)
            .select(
                F.lit(name).alias("join_name"),
                "n_left",
                "n_right",
                "ndv_left",
                "ndv_right",
                F.expr(
                    "CAST(round(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)"
                    " / greatest(ndv_left, ndv_right, 1)) AS BIGINT)"
                ).alias("est_rows"),
                "actual_rows",
            )
        )
    return rows[0].unionByName(rows[1]).unionByName(rows[2]).orderBy("join_name")


# ---------------------------------------------------------------------------
# session 147 — sales-weighted name terms, script mix, signup activation
# ---------------------------------------------------------------------------


@register(
    "part_term_sales_topk",
    f"""WITH tk AS (
  SELECT DISTINCT p_partkey,
         unnest(regexp_extract_all(lower(p_name), '{TOKEN_PATTERN}')) AS term
  FROM part),
j AS (
  SELECT tk.term, l.l_partkey, {_LI_QTY_C} AS qty_c
  FROM lineitem l JOIN tk ON l.l_partkey = tk.p_partkey)
SELECT term, CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(sum(qty_c) AS BIGINT) AS qty_c
FROM j GROUP BY term ORDER BY qty_c DESC, term ASC LIMIT 20""",
)
def part_term_sales_topk(spark, sf_dir):
    """What words SELL: the shared tokenizer over part names, weighted
    by shipped quantity — part_name_term_census counts the catalog's
    dictionary; this joins it to the lineitem fact so each term carries
    its demand mass (the merchandising/search-relevance signal: boost
    query terms whose products actually move). DISTINCT (part, term)
    first, so a name like 'steel steel bolt' counts once per item.

    Determinism: quantities take the shared `_LI_QTY_C` cents rule;
    top-20 ties break on term.

    Scale shape: the token table is |parts|×|name terms| (a dim-table
    explode); the fact join keys on partkey (un-hinted — AQE broadcasts
    the token side when it fits); the term agg combines map-side;
    top-20 is a TakeOrdered."""
    tk = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(
            "p_partkey", F.explode(spark_tokens("p_name")).alias("term")
        )
        .distinct()
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", F.expr(_LI_QTY_C).alias("qty_c")
    )
    return (
        li.join(tk, li["l_partkey"] == tk["p_partkey"])
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.countDistinct("l_partkey").cast("long").alias("n_parts"),
            F.sum("qty_c").cast("long").alias("qty_c"),
        )
        .orderBy(F.desc("qty_c"), F.asc("term"))
        .limit(20)
    )


_ACT_DAY_US = 86_400_000_000


@register(
    "signup_activation_rates",
    f"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
su AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t0
       FROM e WHERE event_type = 'signup' GROUP BY user_id),
act AS (
  SELECT su.user_id,
         max(CASE WHEN e.event_type = 'view'
                   AND e.us >= su.t0 AND e.us < su.t0 + {_ACT_DAY_US}
              THEN 1 ELSE 0 END) AS activated,
         max(CASE WHEN e.event_type = 'purchase'
                   AND e.us >= su.t0 AND e.us < su.t0 + {7 * _ACT_DAY_US}
              THEN 1 ELSE 0 END) AS converted
  FROM su JOIN e ON e.user_id = su.user_id
  GROUP BY su.user_id)
SELECT CAST(count(*) AS BIGINT) AS n_signup_users,
       CAST(sum(activated) AS BIGINT) AS n_activated,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * sum(activated)) // count(*) AS BIGINT)
       END AS activation_q6,
       CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * sum(converted)) // count(*) AS BIGINT)
       END AS conversion_q6
FROM act""",
)
def signup_activation_rates(spark, sf_dir):
    """Signup-cohort activation: of users who ever signed up (anchor =
    their FIRST signup), how many viewed anything within 24 h and
    purchased within 7 days — the onboarding funnel that
    events_funnel's view-anchored chain can't see (it starts at view;
    this starts at the account event, the number a growth review
    actually asks for). Flags are per-user conditional MAXes over the
    user's own stream, so multiple qualifying events count once.

    Determinism: pure integer µs arithmetic; rates are integer
    (1e6·k) div n with a 0 sentinel (the sandbox always has signups;
    the guard keeps the empty corpus defined on both engines).

    Scale shape: the signup min-agg and the flag agg both key on
    user_id — one exchange re-used (the events_funnel shape, truncated
    to one stage-join); the su⋈events join is un-hinted (signup-user
    count is unbounded); final rollup is one row."""
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )
    su = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").cast("long").alias("t0"))
    )
    act = (
        su.join(e, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.expr(
                    f"CASE WHEN event_type = 'view' AND us >= t0"
                    f" AND us < t0 + {_ACT_DAY_US} THEN 1 ELSE 0 END"
                )
            ).alias("activated"),
            F.max(
                F.expr(
                    f"CASE WHEN event_type = 'purchase' AND us >= t0"
                    f" AND us < t0 + {7 * _ACT_DAY_US} THEN 1 ELSE 0 END"
                )
            ).alias("converted"),
        )
    )
    return act.agg(
        F.count(F.lit(1)).cast("long").alias("n_signup_users"),
        F.sum("activated").cast("long").alias("n_activated"),
        F.sum("converted").cast("long").alias("n_converted"),
    ).select(
        "n_signup_users",
        "n_activated",
        "n_converted",
        F.expr(
            "CASE WHEN n_signup_users = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * n_activated) div n_signup_users AS BIGINT) END"
        ).alias("activation_q6"),
        F.expr(
            "CASE WHEN n_signup_users = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * n_converted) div n_signup_users AS BIGINT) END"
        ).alias("conversion_q6"),
    )


@register(
    "wau_overlap_series",
    f"""WITH wu AS (
  SELECT DISTINCT epoch_us(ts) // {7 * _US_PER_DAY} AS week_num, user_id
  FROM events),
wc AS (SELECT week_num, CAST(count(*) AS BIGINT) AS n_users
       FROM wu GROUP BY week_num),
iv AS (SELECT a.week_num + 1 AS week_num, CAST(count(*) AS BIGINT) AS n_retained
       FROM wu a JOIN wu b
         ON b.user_id = a.user_id AND b.week_num = a.week_num + 1
       GROUP BY a.week_num + 1),
b AS (SELECT CAST(min(week_num) AS BIGINT) AS lo, CAST(max(week_num) AS BIGINT) AS hi
      FROM wc),
spine AS (SELECT unnest(generate_series(b.lo + 1, b.hi)) AS week_num FROM b),
f AS (SELECT spine.week_num,
             CAST(COALESCE(p.n_users, 0) AS BIGINT) AS n_prev,
             CAST(COALESCE(c.n_users, 0) AS BIGINT) AS n_curr,
             CAST(COALESCE(iv.n_retained, 0) AS BIGINT) AS n_retained
      FROM spine
      LEFT JOIN wc p ON p.week_num = spine.week_num - 1
      LEFT JOIN wc c ON c.week_num = spine.week_num
      LEFT JOIN iv ON iv.week_num = spine.week_num)
SELECT CAST(week_num AS BIGINT) AS week_num, n_prev, n_curr, n_retained,
       CASE WHEN n_prev + n_curr - n_retained = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * n_retained)
                 // (n_prev + n_curr - n_retained) AS BIGINT)
       END AS jaccard_q6
FROM f ORDER BY week_num""",
)
def wau_overlap_series(spark, sf_dir):
    """Week-over-week active-user overlap: for every calendar week, the
    users shared with the PREVIOUS week and the Jaccard of the two
    active sets — the audience-churn series (weekly_active_users counts
    heads; events_retention follows one cohort; THIS says how much of
    the base is the SAME people week to week, the number behind 'is our
    WAU growth new users or the same core'). Weeks ride the epoch-week
    key (the weekly_active_users rule) on a zero-filled spine, so a
    dead week shows as jaccard 0, not a missing row.

    Determinism: set sizes are exact distinct counts; jaccard is the
    integer (1e6·∩) div (∪) with a 0 sentinel for the empty union.

    Scale shape: ONE distinct (week, user) exchange feeds both the
    per-week counts and the adjacent-week self-join (which shuffles on
    user_id — the retention family's key); spine joins run on
    calendar-bounded rows."""
    wu = (
        _events(spark, sf_dir)
        .select(
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {7 * _US_PER_DAY}"
            ).alias("week_num"),
            "user_id",
        )
        .distinct()
    )
    wc = wu.groupBy("week_num").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    a, bb = wu.alias("a"), wu.alias("b")
    iv = (
        a.join(
            bb,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.week_num") == F.col("a.week_num") + 1),
        )
        .groupBy((F.col("a.week_num") + 1).alias("week_num"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_retained"))
    )
    bnd = wc.agg(
        F.min("week_num").cast("long").alias("lo"),
        F.max("week_num").cast("long").alias("hi"),
    )
    spine = bnd.select(
        F.explode(F.sequence(F.col("lo") + 1, F.col("hi"))).alias("week_num")
    )
    p = wc.select(
        (F.col("week_num") + 1).alias("week_num"),
        F.col("n_users").alias("n_prev"),
    )
    c = wc.select("week_num", F.col("n_users").alias("n_curr"))
    f = (
        spine.join(p, "week_num", "left")
        .join(c, "week_num", "left")
        .join(iv, "week_num", "left")
        .select(
            F.col("week_num").cast("long").alias("week_num"),
            F.coalesce("n_prev", F.lit(0)).cast("long").alias("n_prev"),
            F.coalesce("n_curr", F.lit(0)).cast("long").alias("n_curr"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
        )
    )
    return f.select(
        "week_num",
        "n_prev",
        "n_curr",
        "n_retained",
        F.expr(
            "CASE WHEN n_prev + n_curr - n_retained = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * n_retained)"
            " div (n_prev + n_curr - n_retained) AS BIGINT) END"
        ).alias("jaccard_q6"),
    ).orderBy("week_num")


# ---------------------------------------------------------------------------
# session 148 — daily envelope, brand promo lift, discount×tax census
# ---------------------------------------------------------------------------


@register(
    "events_daily_envelope",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
w AS (SELECT day_num, n,
             CAST(min(n) OVER (ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS lo7,
             CAST(max(n) OVER (ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS hi7,
             CAST(count(*) OVER (ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS nw
      FROM f)
SELECT CAST(day_num AS BIGINT) AS day_num, n, lo7, hi7
FROM w WHERE nw = 7 ORDER BY day_num""",
)
def events_daily_envelope(spark, sf_dir):
    """ES moving_fn (min/max flavors) over the daily count series: the
    trailing-7-day envelope — the volatility band an on-call dashboard
    draws around the volume line (events_daily_mavg is the center;
    these are the edges; a point outside ITS OWN trailing envelope is
    the eyeball version of weekday_adjusted_anomaly). Zero-filled
    calendar spine, and only days with a FULL 7-day trailing window
    emit (the first 6 spine days drop on both sides — the serial_diff
    IS-NOT-NULL rule expressed as a window count).

    Determinism: pure integers.

    Scale shape: one day-keyed map-side agg; the three frames share
    ONE unpartitioned window sort over calendar-bounded rows."""
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
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d, "day_num", "left").select(
        "day_num", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = Window.orderBy("day_num").rowsBetween(-6, 0)
    out = f.select(
        F.col("day_num").cast("long").alias("day_num"),
        "n",
        F.min("n").over(w).cast("long").alias("lo7"),
        F.max("n").over(w).cast("long").alias("hi7"),
        F.count(F.lit(1)).over(w).cast("long").alias("nw"),
    )
    return out.where(F.col("nw") == 7).drop("nw").orderBy("day_num")


@register(
    "brand_promo_lift",
    f"""WITH j AS (
  SELECT p.p_brand,
         CASE WHEN l.l_discount > 0 THEN 1 ELSE 0 END AS promo,
         {_LI_QTY_C} AS qty_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
a AS (
  SELECT p_brand,
         CAST(sum(promo) AS BIGINT) AS n_promo,
         CAST(sum(1 - promo) AS BIGINT) AS n_full,
         CAST(sum(CASE WHEN promo = 1 THEN qty_c ELSE 0 END) AS BIGINT) AS promo_qty_c,
         CAST(sum(CASE WHEN promo = 0 THEN qty_c ELSE 0 END) AS BIGINT) AS full_qty_c
  FROM j GROUP BY p_brand)
SELECT p_brand, n_promo, n_full, promo_qty_c, full_qty_c,
       CASE WHEN n_promo = 0 OR n_full = 0 OR full_qty_c = 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * promo_qty_c * n_full)
                 // (CAST(full_qty_c AS BIGINT) * n_promo) AS BIGINT)
       END AS qty_lift_q6
FROM a ORDER BY p_brand""",
)
def brand_promo_lift(spark, sf_dir):
    """Promo lift per brand: mean quantity on DISCOUNTED line items over
    mean quantity at full price, as the integer cross-multiplication
    (Σq_promo·n_full)/(Σq_full·n_promo) — 'does a markdown move more
    units of THIS brand', the per-brand elasticity read
    (discount_quantity_corr is the global Pearson; this is the
    conditional-means contrast, grouped where pricing decisions are
    made). TPC-H draws discount independently, so lift ≈ 1e6 is the
    correct sandbox reading — a real table separates brands.

    Determinism: quantities take the shared cents rule; the lift is one
    integer division with 0 sentinels for one-sided brands. Envelope:
    1e6·Σqty_c·n needs ~(1e6·corpus_qty_cents·rows_per_brand) < 2^63 —
    divide-first when a single brand's cents pass ~9e9.

    Scale shape: fact⋈dim on partkey (un-hinted); all four counters
    fold into ONE map-side-combinable brand agg; output |brands|
    rows."""
    j = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_discount", F.expr(_LI_QTY_C).alias("qty_c"))
        .join(
            spark.read.parquet(f"{sf_dir}/part.parquet").select(
                "p_partkey", "p_brand"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.expr("CASE WHEN l_discount > 0 THEN 1 ELSE 0 END").alias("promo"),
            "qty_c",
        )
    )
    a = j.groupBy("p_brand").agg(
        F.sum("promo").cast("long").alias("n_promo"),
        F.sum(F.expr("1 - promo")).cast("long").alias("n_full"),
        F.sum(F.expr("CASE WHEN promo = 1 THEN qty_c ELSE 0 END"))
        .cast("long")
        .alias("promo_qty_c"),
        F.sum(F.expr("CASE WHEN promo = 0 THEN qty_c ELSE 0 END"))
        .cast("long")
        .alias("full_qty_c"),
    )
    return a.select(
        "p_brand",
        "n_promo",
        "n_full",
        "promo_qty_c",
        "full_qty_c",
        F.expr(
            "CASE WHEN n_promo = 0 OR n_full = 0 OR full_qty_c = 0"
            " THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * promo_qty_c * n_full)"
            " div (full_qty_c * n_promo) AS BIGINT) END"
        ).alias("qty_lift_q6"),
    ).orderBy("p_brand")
