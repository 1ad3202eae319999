"""driver_queries chunk q08 (original lines 27749-31244): score_by_length_band, daily_ctr, fk_integrity_census, unit_price_dispersion, ... session_entry_exit_matrix (47 ops).

Linearized continuation of docix_spark.ops.q07 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q07")

@register(
    "score_by_length_band",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + """,
band AS (SELECT dl.doc_id, CAST(length(bin(dl.doc_len)) - 1 AS BIGINT) AS len_band
         FROM dl),
tot AS (SELECT len_band, CAST(count(*) AS BIGINT) AS n_docs
        FROM band GROUP BY len_band),
mtc AS (SELECT band.len_band, CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(agg.score_q6) AS BIGINT) AS sum_score
        FROM agg JOIN band USING (doc_id) GROUP BY band.len_band)
SELECT tot.len_band, tot.n_docs,
       CAST(COALESCE(mtc.n_matched, 0) AS BIGINT) AS n_matched,
       CAST((1000000 * COALESCE(mtc.n_matched, 0)) // tot.n_docs AS BIGINT)
         AS match_share_q6,
       CASE WHEN COALESCE(mtc.n_matched, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(mtc.sum_score // mtc.n_matched AS BIGINT)
       END AS mean_score_q6
FROM tot LEFT JOIN mtc USING (len_band) ORDER BY tot.len_band""",
)
def score_by_length_band(spark, sf_dir):
    """BM25 length-bias audit: per log2-doc-length band, what share of
    the band's documents match the canned query and their mean match
    score — the empirical check on the b = 0.75 length normalisation
    (rising mean score with length says the penalty undershoots and
    long docs win on sheer term volume; falling says it overshoots —
    the evidence a bm25_param_sweep b-decision should read first).

    Determinism: bands are exact floor-log2; mean score is a floor
    division of exact q6 sums.

    Scale shape: the memoized match set joins the doc-length table on
    doc_id (match-set-sized); band rollups combine map-side into ≤32
    rows."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    dl = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("doc_len"))
        .select(
            "doc_id",
            F.expr("CAST(length(bin(doc_len)) - 1 AS BIGINT)").alias(
                "len_band"
            ),
        )
        .localCheckpoint()  # totals + match join both consume it
    )
    tot = dl.groupBy("len_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    mtc = (
        agg.join(dl, "doc_id")
        .groupBy("len_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("score_q6").cast("long").alias("sum_score"),
        )
    )
    return (
        tot.join(mtc, "len_band", "left")
        .select(
            "len_band",
            "n_docs",
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.expr(
                "CAST((1000000 * COALESCE(n_matched, 0)) div n_docs AS BIGINT)"
            ).alias("match_share_q6"),
            F.expr(
                "CASE WHEN COALESCE(n_matched, 0) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(sum_score div n_matched AS BIGINT) END"
            ).alias("mean_score_q6"),
        )
        .orderBy("len_band")
    )


@register(
    "daily_ctr",
    f"""WITH e AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, event_type FROM events),
d AS (SELECT day_num,
             CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_views,
             CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_clicks
      FROM e GROUP BY day_num)
SELECT CAST(day_num AS BIGINT) AS day_num, n_views, n_clicks,
       CASE WHEN n_views = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * n_clicks) // n_views AS BIGINT)
       END AS ctr_q6
FROM d ORDER BY day_num""",
)
def daily_ctr(spark, sf_dir):
    """Daily click-through rate: clicks over views per calendar day —
    the front-page KPI timeseries (events_funnel measures the
    per-user journey once; THIS is the daily pulse the on-call dashboard
    plots, and the series events_cusum_anomaly would monitor next).
    Zero-view days emit the 0 sentinel; observed days only.

    Scale shape: one day groupBy with two conditional counters
    (map-side partials), a per-row division."""
    e = _events(spark, sf_dir).select(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
        "event_type",
    )
    d = e.groupBy("day_num").agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_views"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_clicks"),
    )
    return d.select(
        F.col("day_num").cast("long").alias("day_num"),
        "n_views",
        "n_clicks",
        F.expr(
            "CASE WHEN n_views = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * n_clicks) div n_views AS BIGINT) END"
        ).alias("ctr_q6"),
    ).orderBy("day_num")


# ---------------------------------------------------------------------------
# session 95 — FK integrity census, unit-price dispersion, min-df pruning
# curve
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _fk_leg_sql(name, child, ckey, parent, pkey):
    return f"""SELECT '{name}' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_child_rows,
       CAST(COALESCE(sum(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_orphans
FROM {child} c LEFT JOIN {parent} p ON p.{pkey} = c.{ckey}"""


@register(
    "fk_integrity_census",
    "\nUNION ALL\n".join(_fk_leg_sql(*e) for e in _FK_EDGES)
    + "\nORDER BY fk_edge",
)
def fk_integrity_census(spark, sf_dir):
    """Referential-integrity census of the star schema: every FK edge's
    child-row count and orphan count (children whose parent key is
    missing) — the warehouse smoke test that runs before ANY join is
    trusted (an orphan rate > 0 silently shrinks every inner join
    downstream, which is how revenue "disappears" in rollups; J3's
    consistency anti-join does this for the index, THIS does it for
    the data). Six edges, one row each, all zeros on healthy data —
    and the op exists so a broken load shows WHERE.

    Determinism: exact counts.

    Scale shape: each leg is a LEFT probe keyed on the FK (un-hinted —
    dims broadcast via AQE, fact-fact legs shuffle); orphan counting
    is map-side conditional aggregation."""
    outs = []
    for name, child, ckey, parent, pkey in _FK_EDGES:
        c = spark.read.parquet(f"{sf_dir}/{child}.parquet").select(
            F.col(ckey).alias("ck")
        )
        p = spark.read.parquet(f"{sf_dir}/{parent}.parquet").select(
            F.col(pkey).alias("pk")
        )
        j = c.join(p, c["ck"] == p["pk"], "left")
        outs.append(
            j.agg(
                F.count(F.lit(1)).cast("long").alias("n_child_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_orphans"),
            ).select(
                F.lit(name).alias("fk_edge"), "n_child_rows", "n_orphans"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fk_edge")


@register(
    "unit_price_dispersion",
    """WITH l AS (
  SELECT l_partkey,
         CAST(round(100 * l_extendedprice / l_quantity) AS BIGINT) AS unit_c
  FROM lineitem WHERE l_quantity > 0),
p AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_items,
             CAST(count(DISTINCT unit_c) AS BIGINT) AS n_prices
      FROM l GROUP BY l_partkey),
b AS (SELECT CASE WHEN n_prices = 1 THEN 1
                  WHEN n_prices = 2 THEN 2 ELSE 3 END AS price_bucket,
             n_items
      FROM p)
SELECT CAST(price_bucket AS BIGINT) AS price_bucket,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(n_items) AS BIGINT) AS n_lineitems
FROM b GROUP BY price_bucket ORDER BY price_bucket""",
)
def unit_price_dispersion(spark, sf_dir):
    """Pricing-consistency census: per part, how many DISTINCT implied
    unit prices (extendedprice/quantity, exact cents) its lineitems
    carry, rolled up into one/two/many buckets — the audit behind
    "is pricing rule-driven or negotiated per deal" (bucket 1 = a
    price list; heavy bucket 3 = discount chaos or a data bug, read
    next to discount_by_quantity_band which explains the LEGITIMATE
    variation).

    Determinism: unit price rounds to exact cents per row; counts and
    buckets exact.

    Scale shape: one partkey agg with a two-phase distinct, a 3-bucket
    rollup."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            F.expr(
                "CAST(round(100 * l_extendedprice / l_quantity) AS BIGINT)"
            ).alias("unit_c"),
        )
    )
    p = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.countDistinct("unit_c").cast("long").alias("n_prices"),
    )
    b = p.select(
        F.expr(
            "CASE WHEN n_prices = 1 THEN 1 WHEN n_prices = 2 THEN 2 ELSE 3 END"
        ).alias("price_bucket"),
        "n_items",
    )
    return (
        b.groupBy("price_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("n_items").cast("long").alias("n_lineitems"),
        )
        .select(
            F.col("price_bucket").cast("long").alias("price_bucket"),
            "n_parts",
            "n_lineitems",
        )
        .orderBy("price_bucket")
    )


@register(
    "mindf_prune_curve",
    f"""WITH tf AS ({SQL_TF}),
pt AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
              CAST(sum((length(bin(doc_id + 1)) + 6) // 7) AS BIGINT) AS bytes_ub
       FROM tf GROUP BY term),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(df) AS BIGINT) AS n_postings,
               CAST(sum(bytes_ub) AS BIGINT) AS bytes_tot
        FROM pt),
ks AS (SELECT unnest([1, 2, 4]) AS k),
cut AS (SELECT ks.k, CAST(count(pt.term) AS BIGINT) AS terms_dropped,
               CAST(COALESCE(sum(pt.df), 0) AS BIGINT) AS postings_dropped,
               CAST(COALESCE(sum(pt.bytes_ub), 0) AS BIGINT) AS bytes_saved
        FROM ks LEFT JOIN pt ON pt.df <= ks.k GROUP BY ks.k)
SELECT CAST(cut.k AS BIGINT) AS min_df,
       CAST(COALESCE(cut.terms_dropped, 0) AS BIGINT) AS terms_dropped,
       cut.postings_dropped, cut.bytes_saved,
       CAST((1000000 * cut.bytes_saved) // greatest(tot.bytes_tot, 1) AS BIGINT)
         AS bytes_share_q6
FROM cut CROSS JOIN tot ORDER BY min_df""",
)
def mindf_prune_curve(spark, sf_dir):
    """min_df pruning curve: what dropping df ≤ 1/2/4 terms from the
    dictionary saves — terms, postings, and an upper-bound byte
    estimate (absolute-id varint cost per posting, the worst case for
    the rare terms this cut targets), as a share of the whole index.
    The classic vocabulary-pruning decision (typo hapaxes are most of
    any web dictionary and nearly none of its usefulness — but every
    dropped term is an exact-match query that now returns nothing;
    rare_terms shows WHAT they are, this prices the cut).

    Determinism: pure integer arithmetic; the LEFT theta-join keeps a
    row per k even when nothing is dropped.

    Scale shape: one vocab-sized term table; the curve is a 3-row
    theta-join against it (the nprobe-curve fan pattern)."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    pt = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum(F.expr("(length(bin(doc_id + 1)) + 6) div 7"))
            .cast("long")
            .alias("bytes_ub"),
        )
        .localCheckpoint()  # totals + the 3-way theta join consume it
    )
    tot = pt.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum("bytes_ub").cast("long").alias("bytes_tot"),
    )
    ks = spark.createDataFrame([(1,), (2,), (4,)], "k long")
    cut = (
        F.broadcast(ks)
        .join(pt, pt["df"] <= ks["k"], "left")
        .groupBy("k")
        .agg(
            F.count("term").cast("long").alias("terms_dropped"),
            F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias(
                "postings_dropped"
            ),
            F.coalesce(F.sum("bytes_ub"), F.lit(0)).cast("long").alias(
                "bytes_saved"
            ),
        )
    )
    return (
        cut.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("min_df"),
            "terms_dropped",
            "postings_dropped",
            "bytes_saved",
            F.expr(
                "CAST((1000000 * bytes_saved) div greatest(bytes_tot, 1)"
                " AS BIGINT)"
            ).alias("bytes_share_q6"),
        )
        .orderBy("min_df")
    )


# ---------------------------------------------------------------------------
# session 96 — IVF cell label purity, sentence length histogram, monthly
# revenue growth
# ---------------------------------------------------------------------------


@register(
    "ivf_label_purity",
    _KMEANS_SQL_PRELUDE
    + """,
lb AS (SELECT vec_id, label FROM embeddings),
mem AS (SELECT a3.cid, lb.label FROM a3 JOIN lb USING (vec_id)),
cellcnt AS (SELECT cid, label, CAST(count(*) AS BIGINT) AS n
            FROM mem GROUP BY cid, label),
per AS (SELECT cid, CAST(sum(n) AS BIGINT) AS n_members FROM cellcnt GROUP BY cid),
top AS (SELECT cid, label AS top_label, n AS top_n FROM (
          SELECT cid, label, n,
                 row_number() OVER (PARTITION BY cid
                                    ORDER BY n DESC, label ASC) AS rn
          FROM cellcnt) WHERE rn = 1)
SELECT CAST(per.cid AS BIGINT) AS cid, per.n_members,
       CAST(top.top_label AS BIGINT) AS top_label, top.top_n,
       CAST((1000000 * top.top_n) // per.n_members AS BIGINT) AS purity_q6
FROM per JOIN top USING (cid) ORDER BY cid""",
)
def ivf_label_purity(spark, sf_dir):
    """Label homogeneity of the trained IVF cells: per cell, its
    majority label and that label's share — the cluster-quality
    reading ivf_cluster_balance doesn't give (balance says cells are
    SIZED right; purity says whether the geometry k-means found aligns
    with the labels at all — purity at the label prior means clusters
    and classes are independent, the honest expectation on i.i.d.
    sandbox vectors).

    Determinism: majority = map-side max(struct(n, -label)) per cell
    (oracle windows); purity is integer division.

    Scale shape: the memoized assignment joins labels on vec_id
    (un-hinted); everything downstream is ≤K×|labels| rows."""
    _members, _cent, final_assign = _trained_ivf(spark, sf_dir)
    lb = _emb(spark, sf_dir).select("vec_id", "label")
    mem = final_assign.join(lb, "vec_id").select("cid", "label")
    cellcnt = mem.groupBy("cid", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per = cellcnt.groupBy("cid").agg(
        F.sum("n").cast("long").alias("n_members"),
        F.max(F.struct(F.col("n"), (-F.col("label")).alias("nl"))).alias("t"),
    )
    return per.select(
        F.col("cid").cast("long").alias("cid"),
        "n_members",
        (-F.col("t.nl")).cast("long").alias("top_label"),
        F.col("t.n").alias("top_n"),
        F.expr("CAST((1000000 * t.n) div n_members AS BIGINT)").alias(
            "purity_q6"
        ),
    ).orderBy("cid")


@register(
    "sentence_length_histogram",
    f"""WITH s AS (
  SELECT unnest(string_split_regex(text, '[.!?]+')) AS seg FROM documents),
c AS (SELECT CAST(len(regexp_extract_all(lower(seg), '{TOKEN_PATTERN}'))
             AS BIGINT) AS n_words
      FROM s),
b AS (SELECT CAST(length(bin(n_words)) - 1 AS BIGINT) AS len_band
      FROM c WHERE n_words > 0)
SELECT len_band, CAST(count(*) AS BIGINT) AS n_sentences
FROM b GROUP BY len_band ORDER BY len_band""",
)
def sentence_length_histogram(spark, sf_dir):
    """Sentence-length distribution (words per sentence, log2 bands) —
    the syntax-complexity census underneath readability_flesch's single
    mean (two corpora with the same words/sentence average read very
    differently if one mixes 3-word fragments with 60-word
    run-ons; heavy ≥32 bands also flag punctuation-stripped boilerplate
    that flesch's floor-at-1 hides). Sentences split on [.!?]+ runs
    (the flesch convention); empty segments (trailing terminators)
    drop.

    Determinism: DuckDB string_split_regex vs Spark split() on the
    same pattern produce the same segments; word counts use the shared
    tokenizer regex per segment.

    Scale shape: per-doc split + per-segment count are map-side; one
    ≤~12-band agg."""
    s = _docs(spark, sf_dir).select(
        F.explode(F.expr("split(text, '[.!?]+')")).alias("seg")
    )
    c = s.select(
        F.expr(
            f"CAST(size(regexp_extract_all(lower(seg), '{TOKEN_PATTERN}', 0))"
            " AS BIGINT)"
        ).alias("n_words")
    )
    b = c.where(F.col("n_words") > 0).select(
        F.expr("CAST(length(bin(n_words)) - 1 AS BIGINT)").alias("len_band")
    )
    return (
        b.groupBy("len_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sentences"))
        .orderBy("len_band")
    )


@register(
    "monthly_revenue_growth",
    """WITH o AS (
  SELECT (year(CAST(o_orderdate AS TIMESTAMP)) * 12
          + month(CAST(o_orderdate AS TIMESTAMP)) - 1) AS mkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
m AS (SELECT mkey, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM o GROUP BY mkey),
g AS (SELECT mkey, n_orders, revenue_cents,
             lag(revenue_cents) OVER (ORDER BY mkey) AS prev
      FROM m)
SELECT CAST(mkey AS BIGINT) AS month_key, n_orders, revenue_cents,
       CAST(round(1000000 * ((CAST(revenue_cents AS DOUBLE) - prev) / prev))
            AS BIGINT) AS growth_q6
FROM g WHERE prev IS NOT NULL AND prev > 0 ORDER BY month_key""",
)
def monthly_revenue_growth(spark, sf_dir):
    """Month-over-month revenue growth: the KPI series behind every
    board slide, as signed q6 rates between consecutive OBSERVED months
    (month_key = 12·year + month − 1; a calendar gap compares across it
    — the declared rule; the first month and zero-revenue predecessors
    drop by the serial_diff IS NOT NULL convention). Growth is
    one float division per row — a signed integer division would hit
    the truncate-vs-floor divergence on negative months (the
    rank_correlation lesson).

    Scale shape: one month agg (map-side partials); the lag window
    runs over calendar-bounded month rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr(
            "(year(CAST(o_orderdate AS TIMESTAMP)) * 12"
            " + month(CAST(o_orderdate AS TIMESTAMP)) - 1)"
        ).alias("mkey"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    m = o.groupBy("mkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    w = Window.orderBy("mkey")
    g = m.withColumn("prev", F.lag("revenue_cents").over(w))
    return (
        g.where(F.col("prev").isNotNull() & (F.col("prev") > 0))
        .select(
            F.col("mkey").cast("long").alias("month_key"),
            "n_orders",
            "revenue_cents",
            F.expr(
                "CAST(round(1000000 * ((CAST(revenue_cents AS DOUBLE) - prev)"
                " / prev)) AS BIGINT)"
            ).alias("growth_q6"),
        )
        .orderBy("month_key")
    )


# ---------------------------------------------------------------------------
# session 97 — A/B sample-ratio mismatch, exact-duplicate embeddings,
# SERP source diversity
# ---------------------------------------------------------------------------


@register(
    "ab_srm_check",
    """WITH u AS (
  SELECT DISTINCT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 4))::INT % 2
           AS arm
  FROM events),
s AS (SELECT CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1
      FROM u)
SELECT n0, n1,
       CASE WHEN n0 + n1 = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(n0 - n1 AS DOUBLE) * (n0 - n1))
                 / (n0 + n1))) AS BIGINT) END AS srm_chi2_q6
FROM s""",
)
def ab_srm_check(spark, sf_dir):
    """Sample-ratio mismatch check for the A/B assignment: chi² of the
    two arm sizes against the designed 50/50 split — the experiment-
    VALIDITY gate that runs before ab_significance is allowed to mean
    anything (an SRM (chi² > ~3.84) says the assignment or logging is
    biased, and every downstream p-value is garbage; it is the single
    most common way real experiments silently break). Uses the same
    md5('ab:'||user) arms as the readout ops.

    Determinism: exact arm counts; chi² = (n0−n1)²/(n0+n1) as ONE
    shared float expression ((O−E)²/E summed over two cells collapses
    to exactly this).

    Scale shape: a distinct-user census with map-side arm hashing, a
    1-row agg."""
    u = (
        _events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .select(
            F.expr(
                "cast(conv(substring(md5(concat('ab:', cast(user_id as string))),"
                " 1, 4), 16, 10) as int) % 2"
            ).alias("arm")
        )
    )
    s = u.agg(
        F.count_if(F.col("arm") == 0).cast("long").alias("n0"),
        F.count_if(F.col("arm") == 1).cast("long").alias("n1"),
    )
    return s.select(
        "n0",
        "n1",
        F.expr(
            "CASE WHEN n0 + n1 = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * ((CAST(n0 - n1 AS DOUBLE) * (n0 - n1))"
            " / (n0 + n1))) AS BIGINT) END"
        ).alias("srm_chi2_q6"),
    )


@register(
    "embedding_exact_dups",
    """WITH k AS (
  SELECT md5(array_to_string(list_transform(CAST(embedding AS DOUBLE[]),
         x -> CAST(CAST(round(1000000 * x) AS BIGINT) AS VARCHAR)), ',')) AS h
  FROM embeddings),
g AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY h)
SELECT CAST(sum(n) AS BIGINT) AS n_vecs,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(COALESCE(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_dup_groups,
       CAST(max(n) AS BIGINT) AS max_group
FROM g""",
)
def embedding_exact_dups(spark, sf_dir):
    """Exact-duplicate embedding census: vectors hashed by the md5 of
    their comma-joined q6-component string, grouped — the upstream-bug
    detector for vector stores (identical embeddings for distinct
    items mean an encoder fed truncated/empty inputs or a batch-copy
    bug; semdedup finds NEAR-dups expensively, this finds the
    degenerate exact case in one agg and should run first).

    Determinism: components q6-round per element before joining (the
    same quantization every vector op uses), so the hash key is
    identical across engines.

    Scale shape: map-side hashing, one hash-keyed agg, a 1-row census."""
    k = _emb(spark, sf_dir).select(
        F.md5(
            F.expr(
                "array_join(transform(embedding,"
                " x -> CAST(CAST(round(1000000 * cast(x as double)) AS BIGINT)"
                " AS STRING)), ',')"
            )
        ).alias("h")
    )
    g = k.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return g.agg(
        F.sum("n").cast("long").alias("n_vecs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.coalesce(
            F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_dup_groups"),
        F.max("n").cast("long").alias("max_group"),
    )


@register(
    "serp_source_diversity",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + """,
page AS (SELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
ps AS (SELECT d.source FROM page JOIN documents d USING (doc_id)),
cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ps GROUP BY source),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cnt),
ent AS (SELECT CAST(COALESCE(sum(CAST(round(1000000 * (-1e0
             * (CAST(cnt.n AS DOUBLE) / tot.t)
             * ln(CAST(cnt.n AS DOUBLE) / tot.t))) AS BIGINT)), 0) AS BIGINT)
               AS h_q6,
             CAST(count(*) AS BIGINT) AS n_sources,
             CAST(max(cnt.n) AS BIGINT) AS top_n
      FROM cnt CROSS JOIN tot)
SELECT ent.n_sources, ent.top_n,
       CAST((1000000 * ent.top_n) // greatest(tot.t, 1) AS BIGINT)
         AS top_share_q6,
       ent.h_q6 AS entropy_q6
FROM ent CROSS JOIN tot""",
)
def serp_source_diversity(spark, sf_dir):
    """Result-page diversity: how many distinct sources the BM25 top-10
    spans, the top source's share, and the Shannon entropy of the
    page's source mix — the SERP-diversity metric behind "one domain
    owns the whole page" complaints (search_facets counts sources over
    the full MATCH SET; ranking then re-concentrates them, and THIS
    measures what the user actually sees — the gap between the two is
    the ranking's diversity cost; domain_cap is the remedy).

    Determinism: per-source entropy terms q6-round FIRST (the
    source_unigram_entropy rule) then BIGINT-sum over ≤10 rows.

    Scale shape: the page is 10 rows; its source join broadcasts the
    page into documents; every agg downstream is ≤10 rows."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    page = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id")
    )
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    ps = docs.join(F.broadcast(page), "doc_id").select("source")
    cnt = ps.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.agg(F.sum("n").cast("long").alias("t"))
    ent = cnt.crossJoin(F.broadcast(tot)).agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(round(1000000 * (-1e0 * (CAST(n AS DOUBLE) / t)"
                    " * ln(CAST(n AS DOUBLE) / t))) AS BIGINT)"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("h_q6"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.max("n").cast("long").alias("top_n"),
    )
    return ent.crossJoin(F.broadcast(tot)).select(
        "n_sources",
        "top_n",
        F.expr("CAST((1000000 * top_n) div greatest(t, 1) AS BIGINT)").alias(
            "top_share_q6"
        ),
        F.col("h_q6").alias("entropy_q6"),
    )


# ---------------------------------------------------------------------------
# session 98 — title/body language divergence, top moving parts, customer
# acquisition curve
# ---------------------------------------------------------------------------

# per-term JSD contribution between the title (p) and body (q) unigram
# LMs, q6-rounded FIRST (the hellinger/weekly-JSD rule). Columns:
# nt (term count in title), tt (title total), nb, tb; the union-vocab
# spine guarantees nt + nb >= 1 so m > 0.
_TB_P = "(CAST(nt AS DOUBLE) / tt)"
_TB_Q = "(CAST(nb AS DOUBLE) / tb)"
_TB_M = f"(({_TB_P} + {_TB_Q}) / 2e0)"
_TB_C = (
    f"CAST(round(1000000 * ((CASE WHEN nt = 0 THEN 0e0"
    f" ELSE 5e-1 * {_TB_P} * ln({_TB_P} / {_TB_M}) END)"
    f" + (CASE WHEN nb = 0 THEN 0e0"
    f" ELSE 5e-1 * {_TB_Q} * ln({_TB_Q} / {_TB_M}) END))) AS BIGINT)"
)


@register(
    "title_body_jsd",
    f"""WITH {_SQL_POS},
fld AS (SELECT CASE WHEN i <= 8 THEN 'title' ELSE 'body' END AS field, term
        FROM p),
c AS (SELECT field, term, CAST(count(*) AS BIGINT) AS n
      FROM fld GROUP BY field, term),
tt AS (SELECT CAST(COALESCE(sum(CASE WHEN field = 'title' THEN n END), 0)
              AS BIGINT) AS tt,
              CAST(COALESCE(sum(CASE WHEN field = 'body' THEN n END), 0)
              AS BIGINT) AS tb
       FROM c),
v AS (SELECT term,
             CAST(COALESCE(sum(CASE WHEN field = 'title' THEN n END), 0)
                  AS BIGINT) AS nt,
             CAST(COALESCE(sum(CASE WHEN field = 'body' THEN n END), 0)
                  AS BIGINT) AS nb
      FROM c GROUP BY term)
SELECT tt.tt AS n_title_tokens, tt.tb AS n_body_tokens,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(COALESCE(sum({_TB_C}), 0) AS BIGINT) AS jsd_q6
FROM v CROSS JOIN tt
WHERE tt.tt > 0 AND tt.tb > 0
GROUP BY tt.tt, tt.tb""",
)
def title_body_jsd(spark, sf_dir):
    """Language divergence between the title field (first 8 tokens —
    the most_fields convention) and the body: Jensen-Shannon divergence
    of the two unigram LMs over the union vocabulary — the number that
    JUSTIFIES per-field scoring (bm25f/cross_fields pay real plan cost
    for field structure; if titles speak the body's language, JSD ≈ 0
    and one field would do; headline-style titles push it up).

    Determinism: per-term contributions q6-round FIRST from exact
    counts; terms absent from one field contribute only the other
    half (the weekly-JSD 0-guards); an all-title or all-body corpus
    emits no row identically in both engines.

    Scale shape: one (field, term) agg (vocab-bounded ×2), a vocab
    pivot, 1-row totals broadcast; the JSD sum runs on vocab rows."""
    wdf = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    fld = wdf.select(
        F.posexplode("words").alias("i", "term")
    ).select(
        F.expr("CASE WHEN i < 8 THEN 'title' ELSE 'body' END").alias("field"),
        "term",
    )
    c = (
        fld.groupBy("field", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # totals + pivot both consume it
    )
    tt = c.agg(
        F.coalesce(
            F.sum(F.when(F.col("field") == "title", F.col("n"))), F.lit(0)
        )
        .cast("long")
        .alias("tt"),
        F.coalesce(
            F.sum(F.when(F.col("field") == "body", F.col("n"))), F.lit(0)
        )
        .cast("long")
        .alias("tb"),
    )
    v = c.groupBy("term").agg(
        F.coalesce(
            F.sum(F.when(F.col("field") == "title", F.col("n"))), F.lit(0)
        )
        .cast("long")
        .alias("nt"),
        F.coalesce(
            F.sum(F.when(F.col("field") == "body", F.col("n"))), F.lit(0)
        )
        .cast("long")
        .alias("nb"),
    )
    return (
        v.crossJoin(F.broadcast(tt))
        .where((F.col("tt") > 0) & (F.col("tb") > 0))
        .groupBy("tt", "tb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.coalesce(F.sum(F.expr(_TB_C)), F.lit(0))
            .cast("long")
            .alias("jsd_q6"),
        )
        .select(
            F.col("tt").alias("n_title_tokens"),
            F.col("tb").alias("n_body_tokens"),
            "n_terms",
            "jsd_q6",
        )
    )


@register(
    "top_moving_parts",
    """WITH l AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         (year(CAST(l_shipdate AS TIMESTAMP)) * 12
          + month(CAST(l_shipdate AS TIMESTAMP)) - 1) AS mkey
  FROM lineitem),
s AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty,
             CAST(count(*) AS BIGINT) AS n_lineitems,
             CAST(count(DISTINCT mkey) AS BIGINT) AS n_months
      FROM l GROUP BY l_partkey)
SELECT l_partkey, total_qty, n_lineitems, n_months,
       CAST(row_number() OVER (ORDER BY total_qty DESC, l_partkey ASC)
            AS BIGINT) AS rank
FROM s ORDER BY total_qty DESC, l_partkey ASC LIMIT 10""",
)
def top_moving_parts(spark, sf_dir):
    """Fastest-moving parts: top-10 by total shipped quantity, with the
    number of distinct active ship-months — the inventory-velocity
    board (a part moving the same volume in 2 months vs 24 needs a
    completely different stocking policy; part_revenue_pareto ranks by
    money, THIS ranks by units and spread).

    Determinism: exact integer quantities; rank over (qty desc,
    partkey).

    Scale shape: one partkey agg (two-phase distinct for months), a
    TakeOrdered top-10."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr(
            "(year(CAST(l_shipdate AS TIMESTAMP)) * 12"
            " + month(CAST(l_shipdate AS TIMESTAMP)) - 1)"
        ).alias("mkey"),
    )
    s = li.groupBy("l_partkey").agg(
        F.sum("qty").cast("long").alias("total_qty"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.countDistinct("mkey").cast("long").alias("n_months"),
    )
    top = s.orderBy(F.desc("total_qty"), F.asc("l_partkey")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("total_qty"), F.asc("l_partkey")))
        .cast("long"),
    ).select("l_partkey", "total_qty", "n_lineitems", "n_months", "rank")


@register(
    "new_customers_monthly",
    """WITH f AS (
  SELECT o_custkey,
         CAST(min(year(CAST(o_orderdate AS TIMESTAMP)) * 12
              + month(CAST(o_orderdate AS TIMESTAMP)) - 1) AS BIGINT) AS first_mkey
  FROM orders GROUP BY o_custkey),
m AS (SELECT first_mkey, CAST(count(*) AS BIGINT) AS n_new
      FROM f GROUP BY first_mkey),
c AS (SELECT first_mkey, n_new,
             CAST(sum(n_new) OVER (ORDER BY first_mkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_customers
      FROM m)
SELECT first_mkey AS month_key, n_new, cum_customers
FROM c ORDER BY month_key""",
)
def new_customers_monthly(spark, sf_dir):
    """Customer acquisition curve: first-order month per customer,
    rolled up into new-buyer counts and the cumulative book — the
    orders-side twin of new_returning_daily (that one reads activity;
    this reads WALLET acquisition, the denominator every cohort and
    CAC metric divides by). Observed months only; the cumulative
    window runs over calendar-bounded month rows.

    Determinism: exact integer month keys, min/count/cumsum exact.

    Scale shape: one custkey min-agg (map-side partials), a ≤|months|
    rollup and window."""
    f = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.expr(
                    "(year(CAST(o_orderdate AS TIMESTAMP)) * 12"
                    " + month(CAST(o_orderdate AS TIMESTAMP)) - 1)"
                )
            )
            .cast("long")
            .alias("first_mkey")
        )
    )
    m = f.groupBy("first_mkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    wc = Window.orderBy("first_mkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        m.select(
            F.col("first_mkey").alias("month_key"),
            "n_new",
            F.sum("n_new").over(wc).cast("long").alias("cum_customers"),
        )
        .orderBy("month_key")
    )


# ---------------------------------------------------------------------------
# session 99 — quantizer assignment margins, label centroid matrix,
# leading-token census
# ---------------------------------------------------------------------------


@register(
    "ivf_assign_margin",
    _KMEANS_SQL_PRELUDE
    + f""",
sc AS (SELECT e.vec_id, c.cid, {_sql_cosq('e.v', 'c.cv', 1_000_000_000)} AS cq
       FROM e, cent2 c WHERE e.vec_id <> 0),
r2 AS (SELECT vec_id, cq,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cq DESC, cid ASC) AS rn
       FROM sc),
mg AS (SELECT vec_id,
              CAST(max(CASE WHEN rn = 1 THEN cq END) AS BIGINT) AS c1,
              CAST(max(CASE WHEN rn = 2 THEN cq END) AS BIGINT) AS c2
       FROM r2 WHERE rn <= 2 GROUP BY vec_id),
bk AS (SELECT (c1 - c2) // 100000000 AS bucket FROM mg WHERE c2 IS NOT NULL)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_vectors
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def ivf_assign_margin(spark, sf_dir):
    """Coarse-quantizer confidence histogram: per vector, the q9-cosine
    gap between its best and second-best trained cell, bucketed at 0.1
    — the boundary-population audit behind the nprobe decision
    (vectors in bucket 0 sit ON a cell boundary, and they are exactly
    the ones a 1-probe search loses; ann_ivf_nprobe_curve shows the
    recall cost, THIS shows the population paying it — mass in low
    buckets predicts how much nprobe buys before either is run).

    Determinism: the same broadcast-centroid q9 scores the assignment
    uses; margins and buckets are exact integer ops.

    Scale shape: the score table is K=8 rows per vector with the
    centroid table broadcast; the top-2 window partitions per vector
    over those 8 rows (the _kmeans_assign shape); the rollup is ≤21
    buckets."""
    members, cent, _assign = _trained_ivf(spark, sf_dir)
    sc = members.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", _cosq("v", "cv", 1_000_000_000).alias("cq")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cq"), F.asc("cid"))
    r2 = sc.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
    mg = r2.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cq"))).alias("c1"),
        F.max(F.when(F.col("rn") == 2, F.col("cq"))).alias("c2"),
    )
    bk = mg.where(F.col("c2").isNotNull()).select(
        F.expr("(c1 - c2) div 100000000").alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .select(F.col("bucket").cast("long").alias("bucket"), "n_vectors")
        .orderBy("bucket")
    )


@register(
    "label_centroid_matrix",
    """WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id <> 0),
dims AS (
  SELECT label, i, SUM(CAST(round(v[i] * 1000000) AS BIGINT)) AS s
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY label, i),
cv AS (SELECT label, list(CAST(s AS DOUBLE) ORDER BY i) AS c
       FROM dims GROUP BY label),
px AS (
  SELECT a.label AS label_a, b.label AS label_b,
         list_dot_product(a.c, b.c) AS nab,
         list_dot_product(a.c, a.c) AS naa,
         list_dot_product(b.c, b.c) AS nbb
  FROM cv a JOIN cv b ON a.label < b.label)
SELECT CAST(label_a AS BIGINT) AS label_a, CAST(label_b AS BIGINT) AS label_b,
       """
    + _CENT_COS
    + """ AS cos_q6
FROM px ORDER BY label_a, label_b""",
)
def label_centroid_matrix(spark, sf_dir):
    """Pairwise LABEL-centroid cosine matrix — the class-separability
    view in centroid space that complements the kNN family (purity/
    confusion read local neighborhoods; two labels whose CENTROIDS
    align are globally entangled and no k will separate them — and the
    confusable pair knn_label_confusion flags should show up here as
    the highest cosine). Same construction as source_centroid_matrix
    (q6 integer element sums — cosine's scale-invariance makes the sum
    the mean), keyed by the embeddings' own label column.

    Determinism: exact BIGINT centroid sums; one shared _CENT_COS
    float expression with the zero-norm guard.

    Scale shape: one (label, dim) agg with map-side partials, then a
    |labels|²-bounded pair join of 64-element arrays."""
    e = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            "label",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
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
    )
    a = cv.select(F.col("label").alias("label_a"), F.col("c").alias("ca"))
    b = cv.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    px = a.join(b, F.col("label_a") < F.col("label_b")).select(
        "label_a",
        "label_b",
        F.expr(_DOT.format(a="ca", b="cb")).alias("nab"),
        F.expr(_DOT.format(a="ca", b="ca")).alias("naa"),
        F.expr(_DOT.format(a="cb", b="cb")).alias("nbb"),
    )
    return px.select(
        F.col("label_a").cast("long").alias("label_a"),
        F.col("label_b").cast("long").alias("label_b"),
        F.expr(_CENT_COS).alias("cos_q6"),
    ).orderBy("label_a", "label_b")


@register(
    "leading_token_census",
    f"""WITH w AS ({SQL_WORDS}),
f AS (SELECT words[1] AS tok FROM w WHERE len(words) >= 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM f),
c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_docs FROM f GROUP BY tok),
rk AS (SELECT tok, n_docs,
              row_number() OVER (ORDER BY n_docs DESC, tok ASC) AS rank
       FROM c)
SELECT rk.tok, CAST(rk.rank AS BIGINT) AS rank, rk.n_docs,
       CAST((1000000 * rk.n_docs) // tot.t AS BIGINT) AS share_q6
FROM rk CROSS JOIN tot WHERE rk.rank <= 10 ORDER BY rank""",
)
def leading_token_census(spark, sf_dir):
    """Leading-token census: the 10 most common FIRST tokens across
    documents with their share — the cheapest boilerplate-header
    detector in the quality family (a crawl where 30% of docs open
    with the same token is template debris; span_first_match profiles
    where QUERY terms sit, this profiles what the documents themselves
    lead with — and a dominant leader is what chunk_dedup_scrub will
    spend its budget removing). Empty documents drop.

    Determinism: exact counts; rank by (n desc, token asc).

    Scale shape: first-element extraction is map-side; one
    vocab-bounded agg; TakeOrdered 10."""
    w = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    f = w.where(F.size("words") >= 1).select(
        F.element_at("words", 1).alias("tok")
    )
    tot = f.agg(F.count(F.lit(1)).cast("long").alias("t"))
    c = f.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    rk = (
        c.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("n_docs"), F.asc("tok")))
            .cast("long"),
        )
        .where(F.col("rank") <= 10)
    )
    return (
        rk.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "rank",
            "n_docs",
            F.expr("CAST((1000000 * n_docs) div t AS BIGINT)").alias(
                "share_q6"
            ),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# session 101 — edge embeddedness, ANN hub census, exclusive vocabulary
# ---------------------------------------------------------------------------


@register(
    "lsh_edge_embeddedness",
    _SQL_LSH_PAIRS
    + """,
tri3 AS (SELECT p1.doc_a AS v1, p1.doc_b AS v2, p2.doc_b AS v3
         FROM pairs p1 JOIN pairs p2 ON p2.doc_a = p1.doc_b
         JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
te AS (SELECT v1 AS a, v2 AS b FROM tri3
       UNION ALL SELECT v1, v3 FROM tri3
       UNION ALL SELECT v2, v3 FROM tri3),
sup AS (SELECT a, b, CAST(count(*) AS BIGINT) AS emb FROM te GROUP BY a, b),
pe AS (SELECT pairs.doc_a, pairs.doc_b,
              CAST(COALESCE(sup.emb, 0) AS BIGINT) AS emb
       FROM pairs LEFT JOIN sup ON sup.a = pairs.doc_a AND sup.b = pairs.doc_b),
bk AS (SELECT CASE WHEN emb = 0 THEN -1
              ELSE CAST(length(bin(emb)) - 1 AS BIGINT) END AS bucket
       FROM pe)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_edges
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def lsh_edge_embeddedness(spark, sf_dir):
    """Edge embeddedness of the LSH candidate graph: per candidate
    edge, how many common neighbors its endpoints share (= triangles
    through the edge), bucketed — bucket −1 is the BRIDGE population,
    edges with zero social support, which in a near-dup graph are the
    classic false-positive signature (a real dup cluster embeds every
    internal edge; a hash collision connects strangers). The
    per-EDGE refinement of lsh_clustering_histogram's per-node view —
    and the principled edge-filter threshold (drop emb=0 edges before
    connected components) reads straight off this table.

    Determinism: exact counts; canonical (a < b) edges throughout.

    Scale shape: triangles come from the oriented wedge join on the
    Spark side (one apex per triangle, each exploded to its 3 member
    edges); the support agg and the LEFT probe back onto the edge list
    are edge-keyed."""
    edges = _lsh_pair_edges(spark, sf_dir)
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("src").alias("b"), F.col("d").alias("db"))
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
    cand = (
        e1.join(e2, "u")
        .where(F.col("x") < F.col("y"))
        .select("u", F.col("x").alias("a"), F.col("y").alias("b"))
    )
    tri = cand.join(pairs, ["a", "b"], "left_semi").select(
        F.col("u").alias("v1"), F.col("a").alias("v2"), F.col("b").alias("v3")
    )
    te = (
        tri.select(
            F.least("v1", "v2").alias("a"), F.greatest("v1", "v2").alias("b")
        )
        .unionByName(
            tri.select(
                F.least("v1", "v3").alias("a"),
                F.greatest("v1", "v3").alias("b"),
            )
        )
        .unionByName(
            tri.select(
                F.least("v2", "v3").alias("a"),
                F.greatest("v2", "v3").alias("b"),
            )
        )
    )
    sup = te.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("emb"))
    pe = pairs.join(sup, ["a", "b"], "left").select(
        F.coalesce("emb", F.lit(0)).cast("long").alias("emb")
    )
    bk = pe.select(
        F.expr(
            "CASE WHEN emb = 0 THEN -1"
            " ELSE CAST(length(bin(emb)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .orderBy("bucket")
    )


@register(
    "ann_hub_census",
    _BATCH_SQL
    + """,
nb AS (SELECT vec_id FROM btop WHERE rnk <= 10 AND vec_id <> qid),
deg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS in_degree
        FROM nb GROUP BY vec_id),
rk AS (SELECT vec_id, in_degree,
              row_number() OVER (ORDER BY in_degree DESC, vec_id ASC) AS rank
       FROM deg)
SELECT CAST(vec_id AS BIGINT) AS vec_id, in_degree,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= 10 ORDER BY rank""",
)
def ann_hub_census(spark, sf_dir):
    """Hub census of the kNN graph: which vectors appear most often in
    OTHER queries' top-10 lists (self-hits excluded) — hubness, the
    canonical high-dimensional ANN pathology (Radovanović et al. 2010:
    as dimension grows, a few points become everyone's neighbor and
    poison both retrieval diversity and kNN classification; a hub
    whose in-degree ≫ 10·|queries|/n is the point to down-weight or
    whiten away, and ann_label_purity's misses concentrate on it).

    Determinism: exact in-degrees; rank by (degree desc, vec_id).

    Scale shape: the neighbor stream is 10 rows/query; one vec_id agg,
    TakeOrdered 10."""
    top = _ivf_batch_topk(spark, sf_dir)
    nb = top.where(F.col("vec_id") != F.col("qid")).select("vec_id")
    deg = nb.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )
    rk = (
        deg.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("in_degree"), F.asc("vec_id")))
            .cast("long"),
        )
        .where(F.col("rank") <= 10)
    )
    return rk.select(
        F.col("vec_id").cast("long").alias("vec_id"), "in_degree", "rank"
    ).orderBy("rank")


@register(
    "exclusive_vocab_census",
    f"""WITH t AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
    FROM documents)),
ts AS (SELECT term, CAST(count(*) AS BIGINT) AS n_sources FROM t GROUP BY term),
j AS (SELECT t.source, CASE WHEN ts.n_sources = 1 THEN 1 ELSE 0 END AS excl
      FROM t JOIN ts USING (term))
SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(COALESCE(sum(excl), 0) AS BIGINT) AS n_exclusive,
       CAST((1000000 * COALESCE(sum(excl), 0)) // count(*) AS BIGINT)
         AS exclusive_share_q6
FROM j GROUP BY source ORDER BY source""",
)
def exclusive_vocab_census(spark, sf_dir):
    """Exclusive-vocabulary census: per source, how much of its
    vocabulary appears NOWHERE else — the domain-jargon signal that
    source_vocab_overlap's pairwise view dilutes (a source that is 40%
    exclusive terms is a genuinely different register — its own BPE
    merges, its own stopwords — while 2% exclusive means the mix is
    stylistic, not lexical; the temperature-sampling debate starts
    here).

    Determinism: exact distincts; share is integer division.

    Scale shape: one (source, term) distinct, a term-keyed
    source-count agg joined back on term (vocab-bounded exchange), a
    ≤|sources| rollup."""
    t = (
        _docs(spark, sf_dir)
        .select("source", F.explode(spark_tokens("text")).alias("term"))
        .distinct()
        .localCheckpoint()  # source-count + join both consume it
    )
    ts = t.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources")
    )
    j = t.join(ts, "term").select(
        "source",
        F.when(F.col("n_sources") == 1, 1).otherwise(0).alias("excl"),
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.coalesce(F.sum("excl"), F.lit(0)).cast("long").alias("n_exclusive"),
        )
        .select(
            "source",
            "n_terms",
            "n_exclusive",
            F.expr(
                "CAST((1000000 * n_exclusive) div n_terms AS BIGINT)"
            ).alias("exclusive_share_q6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# session 102 — region revenue rollup, sampler bias audit, token shapes
# ---------------------------------------------------------------------------


@register(
    "region_revenue_rollup",
    """WITH o AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
j AS (SELECT r.r_name AS region, o.cents
      FROM o JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey)
SELECT region, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM j GROUP BY region ORDER BY region""",
)
def region_revenue_rollup(spark, sf_dir):
    """Revenue by region through the full dimension chain
    (orders→customer→nation→region) — the fact-side companion to
    region_market_census's balance sheet, and the canonical 3-hop
    snowflake rollup every BI tool generates first. Exact cents.

    Scale shape: the custkey join is un-hinted (both sides unbounded);
    nation (25 rows) and region (5 rows) broadcast; the rollup
    combines map-side into ≤|regions| rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
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
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("region", "cents")
    )
    return (
        j.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("region")
    )


@register(
    "sample_mix_bias",
    """WITH smp AS (
  SELECT source FROM (
    SELECT source, substr(md5(CAST(doc_id AS VARCHAR)), 9, 4) AS hk, doc_id
    FROM documents ORDER BY hk, doc_id LIMIT 100)),
sc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sample
       FROM smp GROUP BY source),
cc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_corpus
       FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_corpus) AS BIGINT) AS nc,
               (SELECT CAST(count(*) AS BIGINT) FROM smp) AS ns
        FROM cc)
SELECT cc.source, cc.n_corpus,
       CAST(COALESCE(sc.n_sample, 0) AS BIGINT) AS n_sample,
       CAST((1000000 * cc.n_corpus) // tot.nc AS BIGINT) AS corpus_share_q6,
       CAST((1000000 * COALESCE(sc.n_sample, 0)) // greatest(tot.ns, 1)
            AS BIGINT) AS sample_share_q6
FROM cc LEFT JOIN sc USING (source) CROSS JOIN tot ORDER BY cc.source""",
)
def sample_mix_bias(spark, sf_dir):
    """Composition audit of our own fixed-size sampler: source shares
    inside priority_sample_docs' 100-doc hash-top sample, side by side
    with the corpus shares — eating our own dog food (a uniform hash
    sample SHOULD track the corpus mix within binomial noise; a
    persistent skew here means the hash coordinate correlates with
    source, which would poison every eval set built on it). Sources
    missing from the sample still report via the LEFT join.

    Determinism: the sample is the deterministic TakeOrdered(100) on
    the 9-12 hex coordinate; counts and shares exact.

    Scale shape: the sample is 100 rows; corpus shares come from one
    source agg; everything downstream is ≤|sources| rows."""
    smp = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.expr("substr(md5(CAST(doc_id AS STRING)), 9, 4)").alias("hk"),
            "doc_id",
        )
        .orderBy("hk", "doc_id")
        .limit(100)
        .select("source")
    )
    sc = smp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sample")
    )
    cc = _docs(spark, sf_dir).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus")
    )
    tot = cc.agg(F.sum("n_corpus").cast("long").alias("nc")).crossJoin(
        smp.agg(F.count(F.lit(1)).cast("long").alias("ns"))
    )
    return (
        cc.join(sc, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_corpus",
            F.coalesce("n_sample", F.lit(0)).cast("long").alias("n_sample"),
            F.expr("CAST((1000000 * n_corpus) div nc AS BIGINT)").alias(
                "corpus_share_q6"
            ),
            F.expr(
                "CAST((1000000 * COALESCE(n_sample, 0)) div greatest(ns, 1)"
                " AS BIGINT)"
            ).alias("sample_share_q6"),
        )
        .orderBy("source")
    )


@register(
    "token_shape_census",
    f"""WITH t AS ({SQL_TOKS}),
s AS (SELECT CASE WHEN term = regexp_replace(term, '[0-9]', '', 'g') THEN 'alpha'
                  WHEN length(regexp_replace(term, '[0-9]', '', 'g')) = 0
                  THEN 'digit'
                  ELSE 'mixed' END AS shape,
             term
      FROM t)
SELECT shape, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT term) AS BIGINT) AS n_types
FROM s GROUP BY shape ORDER BY shape""",
)
def token_shape_census(spark, sf_dir):
    """Token shape census: pure-alphabetic vs pure-digit vs mixed
    (model numbers, hashes, hex ids) tokens with type counts — the
    vocabulary-pollution gauge that decides number-normalisation
    ('mixed' types are the long tail that bloats dictionaries and BPE
    vocab; the pii 'number' counter finds digit RUNS in raw text,
    this classifies the TOKENIZED stream the index actually stores).

    Determinism: shape classes via the delete-and-measure idiom
    (DuckDB 'g' flag, Spark global — the charclass rule); counts
    exact.

    Scale shape: map-side classification, one 3-group agg with a
    two-phase distinct."""
    t = _toks(_docs(spark, sf_dir))
    s = t.select(
        F.expr(
            "CASE WHEN term = regexp_replace(term, '[0-9]', '') THEN 'alpha'"
            " WHEN length(regexp_replace(term, '[0-9]', '')) = 0 THEN 'digit'"
            " ELSE 'mixed' END"
        ).alias("shape"),
        "term",
    )
    return (
        s.groupBy("shape")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("term").cast("long").alias("n_types"),
        )
        .orderBy("shape")
    )


# ---------------------------------------------------------------------------
# session 103 — attribution window curve, user behavioral entropy, brand
# return rates
# ---------------------------------------------------------------------------

_ATTR_WINDOWS_H = (1, 6, 24)


@register(
    "attribution_window_curve",
    f"""WITH v AS (
  SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY user_id),
p AS (
  SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS p_us
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_us
  GROUP BY e.user_id),
j AS (SELECT v.user_id, v.v_us, p.p_us
      FROM v LEFT JOIN p ON p.user_id = v.user_id),
ws AS (SELECT unnest([{", ".join(str(h) for h in _ATTR_WINDOWS_H)}]) AS w_h),
c AS (SELECT ws.w_h,
             CAST(count(*) AS BIGINT) AS n_viewers,
             CAST(COALESCE(sum(CASE WHEN j.p_us IS NOT NULL
                  AND j.p_us - j.v_us <= ws.w_h * 3600000000
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converted
      FROM ws CROSS JOIN j GROUP BY ws.w_h)
SELECT CAST(w_h AS BIGINT) AS window_hours, n_viewers, n_converted,
       CAST((1000000 * n_converted) // greatest(n_viewers, 1) AS BIGINT)
         AS conv_rate_q6
FROM c ORDER BY window_hours""",
)
def attribution_window_curve(spark, sf_dir):
    """Attribution-window tuning curve: of users who viewed, how many
    purchased within 1/6/24 hours of their FIRST view — the knob every
    attribution model fixes by fiat, swept (conversion_latency_histogram
    shows the latency distribution; this is its cumulative reading at
    the three windows people actually argue about, and the marginal
    conversions between 6h and 24h are exactly the credit that
    last-click vs any-click disputes). Conversion is monotone in the
    window by construction — the property suite asserts it.

    Determinism: exact integer microseconds; the purchase must be at
    or after the first view (the funnel's strictly-ordered rule,
    ties allowed at equality).

    Scale shape: two user-keyed min-aggs on one exchange shape, a
    3-row window spine crossed with the user table (map-side
    conditional counters)."""
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
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("t_us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("t_us").cast("long").alias("p_us"))
    )
    j = v.join(p, "user_id", "left")
    ws = F.broadcast(
        spark.createDataFrame([(h,) for h in _ATTR_WINDOWS_H], "w_h long")
    )
    c = (
        ws.crossJoin(j)
        .groupBy("w_h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_viewers"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("p_us").isNotNull()
                        & (
                            F.col("p_us") - F.col("v_us")
                            <= F.col("w_h") * 3_600_000_000
                        ),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_converted"),
        )
    )
    return c.select(
        F.col("w_h").cast("long").alias("window_hours"),
        "n_viewers",
        "n_converted",
        F.expr(
            "CAST((1000000 * n_converted) div greatest(n_viewers, 1) AS BIGINT)"
        ).alias("conv_rate_q6"),
    ).orderBy("window_hours")


@register(
    "user_type_entropy_histogram",
    """WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type),
u AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY user_id),
h AS (SELECT c.user_id,
             CAST(COALESCE(sum(CAST(round(1000000 * (-1e0
                  * (CAST(c.n AS DOUBLE) / u.tot)
                  * ln(CAST(c.n AS DOUBLE) / u.tot))) AS BIGINT)), 0) AS BIGINT)
               AS h_q6
      FROM c JOIN u USING (user_id) GROUP BY c.user_id),
bk AS (SELECT least(h_q6 // 200000, 8) AS bucket FROM h)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_users
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def user_type_entropy_histogram(spark, sf_dir):
    """Behavioral-diversity census: per user, the Shannon entropy of
    their event-type mix, bucketed at 0.2 nats (clamped at 1.6+) —
    single-behavior users (pure viewers, pure API pings) land in
    bucket 0 and are the bot/lurker population; high-entropy users
    exercise the whole product. The per-USER refinement of
    events_weekly_type_jsd's aggregate drift view.

    Determinism: per-(user, type) entropy terms q6-round FIRST (the
    serp-diversity rule) then BIGINT-sum per user; buckets are integer
    divisions with the least(·, 8) clamp.

    Scale shape: one (user, type) agg, user totals joined back on the
    same key, a ≤9-bucket rollup."""
    c = (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    u = c.groupBy("user_id").agg(F.sum("n").cast("long").alias("tot"))
    h = (
        c.join(u, "user_id")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(round(1000000 * (-1e0 * (CAST(n AS DOUBLE) / tot)"
                        " * ln(CAST(n AS DOUBLE) / tot))) AS BIGINT)"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("h_q6")
        )
    )
    bk = h.select(F.expr("least(h_q6 div 200000, 8)").alias("bucket"))
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("bucket").cast("long").alias("bucket"), "n_users")
        .orderBy("bucket")
    )


@register(
    "brand_return_rate",
    """WITH j AS (
  SELECT p.p_brand,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(COALESCE(sum(ret), 0) AS BIGINT) AS n_returned,
       CAST((1000000 * COALESCE(sum(ret), 0)) // count(*) AS BIGINT)
         AS return_rate_q6
FROM j GROUP BY p_brand ORDER BY p_brand""",
)
def brand_return_rate(spark, sf_dir):
    """Return rate by brand: share of lineitems flagged 'R' per p_brand
    — the product-quality scorecard (return_rate_by_priority slices
    returns by order urgency; THIS slices by what was actually sold,
    which is where a defective product line shows first).

    Determinism: exact counts, one integer share division.

    Scale shape: the partkey join is un-hinted (part broadcasts via
    AQE at sandbox scale, shuffles at warehouse scale); the brand
    rollup combines map-side into ≤|brands| rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).select("p_brand", "ret")
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.coalesce(F.sum("ret"), F.lit(0)).cast("long").alias("n_returned"),
        )
        .select(
            "p_brand",
            "n_lineitems",
            "n_returned",
            F.expr(
                "CAST((1000000 * n_returned) div n_lineitems AS BIGINT)"
            ).alias("return_rate_q6"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# session 104 — dup rate by length, query term share, SQ bits curve
# ---------------------------------------------------------------------------


@register(
    "dup_rate_by_length",
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
           AS n_tok
  FROM documents),
fl AS (
  SELECT CASE WHEN t.n_tok = 0 THEN -1
         ELSE CAST(length(bin(t.n_tok)) - 1 AS BIGINT) END AS len_band,
         CAST(comp.cluster_id IS NOT NULL AS INT) AS in_cluster
  FROM t LEFT JOIN comp ON comp.doc_id = t.doc_id)
SELECT len_band, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(in_cluster), 0) AS BIGINT) AS n_in_cluster,
       CAST((1000000 * COALESCE(sum(in_cluster), 0)) // count(*) AS BIGINT)
         AS dup_rate_q6
FROM fl GROUP BY len_band ORDER BY len_band""",
)
def dup_rate_by_length(spark, sf_dir):
    """Near-dup membership rate by document length band — the "are dups
    short boilerplate or long mirrors" diagnostic that decides WHERE
    dedup effort pays (short-band dup mass is template debris a chunk
    scrub kills cheaply; long-band mass is mirrored articles worth the
    full LSH pipeline; dedup_loss_by_source slices the same labels by
    origin, THIS slices by shape). In-cluster means ANY near-dup
    relation, survivors included.

    Determinism: the memoized LSH→CC labels; exact counts and bands.

    Scale shape: labels are cluster-bounded; the LEFT probe joins them
    to a map-side length projection; the rollup is ≤32 bands."""
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
    fl = t.join(comp, "doc_id", "left").select(
        F.expr(
            "CASE WHEN n_tok = 0 THEN -1"
            " ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END"
        ).alias("len_band"),
        F.expr("CAST(cluster_id IS NOT NULL AS INT)").alias("in_cluster"),
    )
    return (
        fl.groupBy("len_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("in_cluster"), F.lit(0))
            .cast("long")
            .alias("n_in_cluster"),
        )
        .select(
            "len_band",
            "n_docs",
            "n_in_cluster",
            F.expr(
                "CAST((1000000 * n_in_cluster) div n_docs AS BIGINT)"
            ).alias("dup_rate_q6"),
        )
        .orderBy("len_band")
    )


@register(
    "query_term_share",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + """,
page AS (SELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
pt AS (
  SELECT tf.term, CAST(round(1000000 * (
           ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st)))
         )) AS BIGINT) AS c_q6
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id)
  JOIN page ON page.doc_id = tf.doc_id),
ag2 AS (SELECT term, CAST(sum(c_q6) AS BIGINT) AS contrib_q6 FROM pt GROUP BY term),
tot AS (SELECT CAST(COALESCE(sum(contrib_q6), 0) AS BIGINT) AS t FROM ag2)
SELECT ag2.term, ag2.contrib_q6,
       CAST((1000000 * ag2.contrib_q6) // greatest(tot.t, 1) AS BIGINT)
         AS share_q6
FROM ag2 CROSS JOIN tot ORDER BY ag2.term""",
)
def query_term_share(spark, sf_dir):
    """Per-term share of the top-10 page's total score mass — the
    page-level aggregation of bm25_explain (explain justifies ONE
    hit; this says which query term actually carried the PAGE, the
    first thing a relevance engineer checks when a two-term query
    behaves like a one-term query: a term at 95% share means its
    partner contributes nothing and the query needs rewriting or
    boosting).

    Determinism: per-(doc, term) contributions q6-round FIRST (the
    unigram_logprob rule) then BIGINT-sum; shares are integer
    divisions.

    Scale shape: the page is 10 broadcast rows pruning the postings
    join; term sums run on ≤10×|query| rows."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    page = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id")
    )
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()  # dfs/dl/page-join all consume it
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    stt = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    q = F.broadcast(
        spark.createDataFrame([(t,) for t in _RANKEVAL_TERMS], "term string")
    )
    pt = (
        tf.join(q, "term")
        .join(F.broadcast(page), "doc_id")
        .join(dfs, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stt))
        .select(
            "term",
            F.expr(
                "CAST(round(1000000 * ("
                "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
                " * tf * 2.2"
                " / (tf + 1.2 * (0.25 + 0.75 * doc_len / avgdl)))) AS BIGINT)"
            ).alias("c_q6"),
        )
    )
    ag2 = pt.groupBy("term").agg(
        F.sum("c_q6").cast("long").alias("contrib_q6")
    )
    tot = ag2.agg(
        F.coalesce(F.sum("contrib_q6"), F.lit(0)).cast("long").alias("t")
    )
    return (
        ag2.crossJoin(F.broadcast(tot))
        .select(
            "term",
            "contrib_q6",
            F.expr(
                "CAST((1000000 * contrib_q6) div greatest(t, 1) AS BIGINT)"
            ).alias("share_q6"),
        )
        .orderBy("term")
    )


def _sq_err(levels: int, d: str) -> str:
    return (
        f"(xq - (mn + CASE WHEN mx = mn THEN 0"
        f" ELSE ((((xq - mn) * {levels}) {d} (mx - mn)) * (mx - mn)) {d} {levels}"
        f" END))"
    )


@register(
    "sq_bits_curve",
    f"""WITH ex AS (
  SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xq
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id <> 0),
       (SELECT unnest(generate_series(1, 64)) AS i)),
mm AS (SELECT dim, CAST(min(xq) AS BIGINT) AS mn, CAST(max(xq) AS BIGINT) AS mx
       FROM ex GROUP BY dim),
r AS (SELECT ex.xq, mm.mn, mm.mx FROM ex JOIN mm USING (dim)),
e AS (SELECT {_sq_err(15, "//")} AS e4, {_sq_err(63, "//")} AS e6,
             {_sq_err(255, "//")} AS e8
      FROM r),
s AS (SELECT CAST(COALESCE(sum(e4 * e4), 0) AS BIGINT) AS s4,
             CAST(COALESCE(sum(e6 * e6), 0) AS BIGINT) AS s6,
             CAST(COALESCE(sum(e8 * e8), 0) AS BIGINT) AS s8
      FROM e)
SELECT 4 AS bits, 15 AS levels, s4 AS total_sse_q12 FROM s
UNION ALL SELECT 6, 63, s6 FROM s
UNION ALL SELECT 8, 255, s8 FROM s
ORDER BY bits""",
)
def sq_bits_curve(spark, sf_dir):
    """Scalar-quantization bit-width curve: corpus reconstruction SSE at
    4/6/8 bits per dimension — the compression knob
    sq8_quantization_error fixes at 8, swept (each 2 bits halve the
    store again and SSE should rise ~16× per step for uniform data;
    where it rises faster, the corpus has per-dim outliers and
    embedding_dim_clip_bounds' clipping pays before dropping bits).
    SSE is monotone non-increasing in bits — the property suite
    asserts it.

    Determinism: the sq8 integer affine code at three level counts,
    all three errors computed in ONE pass (one agg, three counters —
    the adjacency_matrix rule); xq−mn ≥ 0 so floor == trunc.

    Scale shape: one exploded (vec, dim) pass joined to the 64-row
    broadcast min/max table; a 1-row, 3-counter agg."""
    ex = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            F.posexplode(
                F.expr("transform(embedding, x -> cast(x as double))")
            ).alias("dim", "x")
        )
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
    )
    mm = ex.groupBy("dim").agg(
        F.min("xq").alias("mn"), F.max("xq").alias("mx")
    )
    r = ex.join(F.broadcast(mm), "dim")
    s = r.agg(
        *[
            F.coalesce(
                F.sum(
                    F.expr(f"{_sq_err(lv, 'div')} * {_sq_err(lv, 'div')}")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"s{b}")
            for b, lv in ((4, 15), (6, 63), (8, 255))
        ]
    )
    outs = []
    for b, lv in ((4, 15), (6, 63), (8, 255)):
        outs.append(
            s.select(
                F.lit(b).cast("long").alias("bits"),
                F.lit(lv).cast("long").alias("levels"),
                F.col(f"s{b}").alias("total_sse_q12"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("bits")


# ---------------------------------------------------------------------------
# session 105 — monthly revenue concentration, seasonality strength,
# sentence-level duplication
# ---------------------------------------------------------------------------


@register(
    "monthly_revenue_hhi",
    """WITH o AS (
  SELECT (year(CAST(o_orderdate AS TIMESTAMP)) * 12
          + month(CAST(o_orderdate AS TIMESTAMP)) - 1) AS mkey,
         o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
mc AS (SELECT mkey, o_custkey, CAST(sum(cents) AS BIGINT) AS c
       FROM o GROUP BY mkey, o_custkey),
mt AS (SELECT mkey, CAST(sum(c) AS BIGINT) AS tot,
              CAST(count(*) AS BIGINT) AS n_customers
       FROM mc GROUP BY mkey),
sh AS (SELECT mc.mkey,
              CAST(round(1000000.0 * mc.c * mc.c
                   / (CAST(mt.tot AS DOUBLE) * mt.tot)) AS BIGINT) AS sh2_q6
       FROM mc JOIN mt USING (mkey) WHERE mt.tot > 0)
SELECT CAST(sh.mkey AS BIGINT) AS month_key, mt.n_customers,
       CAST(sum(sh.sh2_q6) AS BIGINT) AS hhi_q6
FROM sh JOIN mt USING (mkey)
GROUP BY sh.mkey, mt.n_customers ORDER BY month_key""",
)
def monthly_revenue_hhi(spark, sf_dir):
    """Revenue-concentration timeseries: per month, the Herfindahl index
    of customer revenue shares — "is the book diversifying or
    collapsing onto whales" as a trend (revenue_pareto_users is one
    month's snapshot of the same risk; a rising HHI series is customer
    concentration building, the thing CFOs disclose). Same per-cell
    share² q6-first construction as part_supplier_hhi.

    Scale shape: one (month, customer) agg, month totals joined back
    on the month key, a ≤|months| rollup."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr(
            "(year(CAST(o_orderdate AS TIMESTAMP)) * 12"
            " + month(CAST(o_orderdate AS TIMESTAMP)) - 1)"
        ).alias("mkey"),
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    mc = o.groupBy("mkey", "o_custkey").agg(
        F.sum("cents").cast("long").alias("c")
    )
    mt = mc.groupBy("mkey").agg(
        F.sum("c").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
    sh = (
        mc.join(mt, "mkey")
        .where(F.col("tot") > 0)
        .select(
            "mkey",
            "n_customers",
            F.expr(
                "CAST(round(1000000.0 * c * c / (CAST(tot AS DOUBLE) * tot))"
                " AS BIGINT)"
            ).alias("sh2_q6"),
        )
    )
    return (
        sh.groupBy("mkey", "n_customers")
        .agg(F.sum("sh2_q6").cast("long").alias("hhi_q6"))
        .select(
            F.col("mkey").cast("long").alias("month_key"),
            "n_customers",
            "hhi_q6",
        )
        .orderBy("month_key")
    )


@register(
    "seasonality_strength",
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
r AS (SELECT f.n, CAST(round((1000000 * f.n - dw.mean_q6) / 1000000e0) AS BIGINT) AS r0
      FROM f JOIN dw USING (dow)),
m AS (SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(n) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mn,
             CAST(sum(r0) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mr
      FROM r),
cs AS (SELECT m.nd AS n,
              CAST(sum(r.n - m.mn) AS BIGINT) AS syc,
              CAST(sum((r.n - m.mn) * (r.n - m.mn)) AS BIGINT) AS syy,
              CAST(sum(r.r0 - m.mr) AS BIGINT) AS src,
              CAST(sum((r.r0 - m.mr) * (r.r0 - m.mr)) AS BIGINT) AS srr
       FROM r CROSS JOIN m GROUP BY m.nd)
SELECT n AS n_days,
       {_SEG_VAR} AS var_series_q6,
       CASE WHEN n < 2 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(n AS DOUBLE) * srr
                 - CAST(src AS DOUBLE) * src) / (CAST(n AS DOUBLE) * n)))
                 AS BIGINT) END AS var_resid_q6,
       CASE WHEN n < 2 OR (CAST(n AS DOUBLE) * syy - CAST(syc AS DOUBLE) * syc) = 0e0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (1e0
                 - (CAST(n AS DOUBLE) * srr - CAST(src AS DOUBLE) * src)
                 / (CAST(n AS DOUBLE) * syy - CAST(syc AS DOUBLE) * syc)))
                 AS BIGINT) END AS strength_q6
FROM cs""",
)
def seasonality_strength(spark, sf_dir):
    """Seasonality strength of daily traffic: 1 − var(residual)/var(series)
    after removing weekday means (the STL-style strength statistic,
    Hyndman's F_s) — ONE number saying how much of the day-to-day
    variance the weekly cycle explains (≈1: schedule your capacity by
    weekday; ≈0: weekday means are noise and
    weekly_seasonal_decompose's residuals ARE the series).

    Determinism: weekday means are one divide-then-round each (q6);
    residuals floor to whole counts before the centered-BIGINT
    variance machinery (the q12-overflow guard at warehouse-scale
    daily counts — documented quantization, far below any decision
    threshold on strength); one shared float expression per output.

    Scale shape: the day/weekday aggs and both variance passes run on
    calendar-bounded rows."""
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
            F.expr("(day_num + 3) % 7").alias("dow"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .localCheckpoint()  # weekday means + residual pass both consume it
    )
    dw = f.groupBy("dow").agg(
        F.expr("CAST(round(1000000.0 * sum(n) / count(1)) AS BIGINT)").alias(
            "mean_q6"
        )
    )
    r = f.join(F.broadcast(dw), "dow").select(
        "n",
        F.expr(
            "CAST(round((1000000 * n - mean_q6) / 1000000e0) AS BIGINT)"
        ).alias("r0"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.expr(
            "CAST(sum(n) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mn"),
        F.expr(
            "CAST(sum(r0) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mr"),
    )
    cs = (
        r.crossJoin(F.broadcast(m))
        .groupBy("nd")
        .agg(
            F.sum(F.col("n") - F.col("mn")).cast("long").alias("syc"),
            F.sum((F.col("n") - F.col("mn")) * (F.col("n") - F.col("mn")))
            .cast("long")
            .alias("syy"),
            F.sum(F.col("r0") - F.col("mr")).cast("long").alias("src"),
            F.sum((F.col("r0") - F.col("mr")) * (F.col("r0") - F.col("mr")))
            .cast("long")
            .alias("srr"),
        )
        .withColumnRenamed("nd", "n")
    )
    return cs.select(
        F.col("n").alias("n_days"),
        F.expr(_SEG_VAR).alias("var_series_q6"),
        F.expr(
            "CASE WHEN n < 2 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * ((CAST(n AS DOUBLE) * srr"
            " - CAST(src AS DOUBLE) * src) / (CAST(n AS DOUBLE) * n)))"
            " AS BIGINT) END"
        ).alias("var_resid_q6"),
        F.expr(
            "CASE WHEN n < 2 OR (CAST(n AS DOUBLE) * syy - CAST(syc AS DOUBLE)"
            " * syc) = 0e0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (1e0"
            " - (CAST(n AS DOUBLE) * srr - CAST(src AS DOUBLE) * src)"
            " / (CAST(n AS DOUBLE) * syy - CAST(syc AS DOUBLE) * syc)))"
            " AS BIGINT) END"
        ).alias("strength_q6"),
    )


@register(
    "sentence_dup_rate",
    f"""WITH s AS (
  SELECT doc_id,
         md5(array_to_string(regexp_extract_all(lower(seg), '{TOKEN_PATTERN}'),
             ' ')) AS k,
         len(regexp_extract_all(lower(seg), '{TOKEN_PATTERN}')) AS nw
  FROM (SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS seg
        FROM documents)
  WHERE len(regexp_extract_all(lower(seg), '{TOKEN_PATTERN}')) > 0),
df AS (SELECT k, CAST(count(DISTINCT doc_id) AS BIGINT) AS ddf FROM s GROUP BY k),
j AS (SELECT CASE WHEN df.ddf >= 2 THEN 1 ELSE 0 END AS dup FROM s JOIN df USING (k))
SELECT CAST(count(*) AS BIGINT) AS n_sentences,
       CAST((SELECT count(*) FROM df) AS BIGINT) AS n_distinct,
       CAST(COALESCE(sum(dup), 0) AS BIGINT) AS n_dup_instances,
       CAST((1000000 * COALESCE(sum(dup), 0)) // greatest(count(*), 1) AS BIGINT)
         AS dup_rate_q6
FROM j""",
)
def sentence_dup_rate(spark, sf_dir):
    """Sentence-level cross-document duplication: share of sentence
    instances whose normalised token string appears in 2+ distinct
    documents — boilerplate at SENTENCE grain, between the 8-gram
    chunk scrubbers (fixed grid) and whole-doc dedup (too coarse):
    legal footers and cookie banners live exactly here. Sentences are
    the flesch [.!?]+ split; the key is the md5 of the space-joined
    token list, so punctuation/spacing variants collapse.

    Determinism: identical tokenize-then-join keys in both engines;
    exact counts.

    Scale shape: map-side split+hash; one key-keyed df agg (two-phase
    distinct) joined back on the key; 1-row census."""
    s = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.expr("split(text, '[.!?]+')")).alias("seg"))
        .select(
            "doc_id",
            F.md5(
                F.expr(
                    f"array_join(regexp_extract_all(lower(seg),"
                    f" '{TOKEN_PATTERN}', 0), ' ')"
                )
            ).alias("k"),
            F.expr(
                f"size(regexp_extract_all(lower(seg), '{TOKEN_PATTERN}', 0))"
            ).alias("nw"),
        )
        .where(F.col("nw") > 0)
        .localCheckpoint()  # df agg + join-back both consume it
    )
    dfk = s.groupBy("k").agg(
        F.countDistinct("doc_id").cast("long").alias("ddf")
    )
    nd = dfk.agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    j = s.join(dfk, "k").select(
        F.when(F.col("ddf") >= 2, 1).otherwise(0).alias("dup")
    )
    ag = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.coalesce(F.sum("dup"), F.lit(0)).cast("long").alias("n_dup_instances"),
    )
    return ag.crossJoin(F.broadcast(nd)).select(
        "n_sentences",
        "n_distinct",
        "n_dup_instances",
        F.expr(
            "CAST((1000000 * n_dup_instances) div greatest(n_sentences, 1)"
            " AS BIGINT)"
        ).alias("dup_rate_q6"),
    )


# ---------------------------------------------------------------------------
# session 106 — CUPED adjustment, Markov row entropy, segment×value census
# ---------------------------------------------------------------------------


@register(
    "ab_cuped_adjustment",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num, event_type
  FROM events),
b AS (SELECT (CAST(min(day_num) AS BIGINT) + CAST(max(day_num) AS BIGINT)) // 2
         AS ms
      FROM t),
u AS (SELECT t.user_id,
             CAST(COALESCE(sum(CASE WHEN t.day_num <= b.ms THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS x,
             CAST(max(CASE WHEN t.day_num > b.ms
                  AND t.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM t CROSS JOIN b GROUP BY t.user_id),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mx,
             CAST(sum(y) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS my
      FROM u),
cs AS (SELECT m.n AS n,
              CAST(sum(u.x - m.mx) AS BIGINT) AS sxc,
              CAST(sum(u.y - m.my) AS BIGINT) AS syc,
              CAST(sum((u.x - m.mx) * (u.x - m.mx)) AS BIGINT) AS sxx,
              CAST(sum((u.y - m.my) * (u.y - m.my)) AS BIGINT) AS syy,
              CAST(sum((u.x - m.mx) * (u.y - m.my)) AS BIGINT) AS sxy
       FROM u CROSS JOIN m GROUP BY m.n)
SELECT n AS n_users, {_TR_SLOPE} AS theta_q6, {_TR_R2} AS var_reduction_q6
FROM cs""",
)
def ab_cuped_adjustment(spark, sf_dir):
    """CUPED pre-experiment adjustment fitted on the event stream: the
    covariate is each user's PRE-period activity (events up to the
    calendar midpoint), the outcome their POST-period conversion, and
    the op reports θ = cov(X,Y)/var(X) — the coefficient CUPED
    subtracts — plus the variance reduction it buys (= the squared
    correlation; Deng et al. 2013: a CUPED'd experiment needs
    (1 − r²)× the sample, which is why every mature platform runs it).
    θ IS an OLS slope, so this is the _TR_* centered-integer machinery
    verbatim (daily_revenue_trend's, pointed at users).

    Determinism: exact integer X/Y and centered sums; calendar
    midpoint split (documented — not a median, no quantile pass).

    Scale shape: one user agg with period-conditional counters, 1-row
    censuses."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
        "event_type",
    )
    b = t.agg(
        F.expr(
            "(CAST(min(day_num) AS BIGINT) + CAST(max(day_num) AS BIGINT)) div 2"
        ).alias("ms")
    )
    u = (
        t.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("day_num") <= F.col("ms"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("x"),
            F.max(
                F.when(
                    (F.col("day_num") > F.col("ms"))
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(x) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mx"),
        F.expr(
            "CAST(sum(y) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("my"),
    )
    cs = (
        u.crossJoin(F.broadcast(m))
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
        F.col("n").alias("n_users"),
        F.expr(_TR_SLOPE).alias("theta_q6"),
        F.expr(_TR_R2).alias("var_reduction_q6"),
    )


@register(
    "markov_row_entropy",
    """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
tr AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY t_us, event_id) AS ft,
         event_type AS tt
  FROM t),
c AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS n
      FROM tr WHERE ft IS NOT NULL GROUP BY ft, tt),
rt AS (SELECT ft, CAST(sum(n) AS BIGINT) AS tot,
              CAST(count(*) AS BIGINT) AS n_targets
       FROM c GROUP BY ft),
h AS (SELECT c.ft,
             CAST(COALESCE(sum(CAST(round(1000000 * (-1e0
                  * (CAST(c.n AS DOUBLE) / rt.tot)
                  * ln(CAST(c.n AS DOUBLE) / rt.tot))) AS BIGINT)), 0) AS BIGINT)
               AS h_q6
      FROM c JOIN rt USING (ft) GROUP BY c.ft)
SELECT h.ft AS from_type, rt.tot AS n_transitions, rt.n_targets, h.h_q6
FROM h JOIN rt USING (ft) ORDER BY from_type""",
)
def markov_row_entropy(spark, sf_dir):
    """Per-state transition entropy of the event Markov chain: for each
    from-type, the Shannon entropy of WHERE users go next — the
    predictability profile underneath events_markov_transitions' raw
    matrix (a 0-entropy state is a forced funnel step; max-entropy
    states are where recommendations have room to act). Same
    (t_us, event_id) ordering as every transition op.

    Determinism: per-(from, to) entropy terms q6-round FIRST, BIGINT
    sums per row.

    Scale shape: ONE user_id exchange for the lag window, a
    ≤|types|²-cell agg and |types|-row rollups."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    tr = t.select(
        F.lag("event_type").over(w).alias("ft"),
        F.col("event_type").alias("tt"),
    )
    c = (
        tr.where(F.col("ft").isNotNull())
        .groupBy("ft", "tt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rt = c.groupBy("ft").agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_targets"),
    )
    h = (
        c.join(rt, "ft")
        .groupBy("ft", "tot", "n_targets")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(round(1000000 * (-1e0 * (CAST(n AS DOUBLE) / tot)"
                        " * ln(CAST(n AS DOUBLE) / tot))) AS BIGINT)"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("h_q6")
        )
    )
    return h.select(
        F.col("ft").alias("from_type"),
        F.col("tot").alias("n_transitions"),
        "n_targets",
        "h_q6",
    ).orderBy("from_type")


@register(
    "segment_value_hist2d",
    """WITH j AS (
  SELECT c.c_mktsegment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
b AS (SELECT c_mktsegment,
             CASE WHEN cents <= 0 THEN -1
                  ELSE CAST(length(bin(cents)) - 1 AS BIGINT) END AS vband,
             cents
      FROM j)
SELECT c_mktsegment, vband, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM b GROUP BY c_mktsegment, vband ORDER BY c_mktsegment, vband""",
)
def segment_value_hist2d(spark, sf_dir):
    """Segment × order-value 2-D census (log2-cents bands) — the shape
    behind segment_value_stats' single mean/variance pair (two
    segments with identical means can be a tight band vs a barbell;
    pricing and credit teams read the bands, not the moments).
    Observed cells only.

    Scale shape: the custkey join is un-hinted; one
    ≤|segments|×~40-cell agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "cents"
    )
    b = j.select(
        "c_mktsegment",
        F.expr(
            "CASE WHEN cents <= 0 THEN -1"
            " ELSE CAST(length(bin(cents)) - 1 AS BIGINT) END"
        ).alias("vband"),
        "cents",
    )
    return (
        b.groupBy("c_mktsegment", "vband")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("c_mktsegment", "vband")
    )


# ---------------------------------------------------------------------------
# session 107 — HLL intersection estimates, ANN scan-cost histogram,
# postings gap entropy
# ---------------------------------------------------------------------------

# p=8 HLL estimator over (zeros, z_int) columns — the cardinality_sketch
# expression factored for reuse at pair grain.
_HLL_EST_Q6 = (
    f"CAST(round(CASE WHEN ({_HLL_C} / CAST(z_int AS DOUBLE)) <= 640e0"
    f" AND zeros > 0 THEN 256e0 * ln(256e0 / CAST(zeros AS DOUBLE))"
    f" ELSE {_HLL_C} / CAST(z_int AS DOUBLE) END * 1000000) AS BIGINT)"
)


@register(
    "hll_source_intersection",
    f"""WITH sh AS ({_SQL_SHINGLES}),
ss AS MATERIALIZED (SELECT DISTINCT source, sh FROM sh),
h AS MATERIALIZED (
  SELECT source, ('0x' || substr(md5(sh), 1, 15))::UBIGINT::BIGINT AS hv
  FROM ss),
regs AS MATERIALIZED (
  SELECT source, hv % 256 AS reg,
         CAST(max(CASE WHEN (hv >> 8) = 0 THEN 53
                  ELSE 53 - length(bin(hv >> 8)) END) AS BIGINT) AS maxr
  FROM h GROUP BY source, reg),
est1 AS (
  SELECT source, {_HLL_EST_Q6} AS est_q6 FROM (
    SELECT source, CAST(256 - count(*) AS BIGINT) AS zeros,
           CAST(COALESCE(sum((1::BIGINT << (53 - maxr))), 0)
                + (256 - count(*)) * (1::BIGINT << 53) AS BIGINT) AS z_int
    FROM regs GROUP BY source)),
prs AS (SELECT a.source AS sa, b.source AS sb
        FROM (SELECT DISTINCT source FROM ss) a
        JOIN (SELECT DISTINCT source FROM ss) b ON a.source < b.source),
ur AS (SELECT prs.sa, prs.sb, regs.reg, CAST(max(regs.maxr) AS BIGINT) AS maxr
       FROM prs JOIN regs ON regs.source = prs.sa OR regs.source = prs.sb
       GROUP BY prs.sa, prs.sb, regs.reg),
uest AS (
  SELECT sa, sb, {_HLL_EST_Q6} AS est_union_q6 FROM (
    SELECT sa, sb, CAST(256 - count(*) AS BIGINT) AS zeros,
           CAST(COALESCE(sum((1::BIGINT << (53 - maxr))), 0)
                + (256 - count(*)) * (1::BIGINT << 53) AS BIGINT) AS z_int
    FROM ur GROUP BY sa, sb)),
ext AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS exact_int
        FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
        GROUP BY a.source, b.source)
SELECT uest.sa AS source_a, uest.sb AS source_b,
       CAST(ea.est_q6 + eb.est_q6 - uest.est_union_q6 AS BIGINT) AS est_int_q6,
       CAST(COALESCE(ext.exact_int, 0) AS BIGINT) AS exact_int,
       uest.est_union_q6
FROM uest JOIN est1 ea ON ea.source = uest.sa
JOIN est1 eb ON eb.source = uest.sb
LEFT JOIN ext ON ext.sa = uest.sa AND ext.sb = uest.sb
ORDER BY source_a, source_b""",
)
def hll_source_intersection(spark, sf_dir):
    """Sketch set algebra: pairwise shingle-overlap estimates from the
    per-source HLL registers via inclusion-exclusion
    (|A∩B| ≈ ê(A) + ê(B) − ê(A∪B), the union sketch being the
    register-wise MAX — the merge that makes HLLs composable), beside
    the exact intersection. This is how cross-source contamination is
    triaged at 100 TB: unions are free register merges, so every pair
    is estimable WITHOUT touching data twice — and the estimate can go
    negative on near-disjoint pairs, which is honest (inclusion-
    exclusion subtracts three noisy numbers; the exact column shows
    the error).

    Determinism: register tables are exact integers; each estimate is
    the one-division cardinality_sketch expression (_HLL_EST_Q6).

    Scale shape: registers are ≤256 rows per source; pair unions group
    ≤512 register rows per pair over a bounded source-pair spine; the
    exact column joins distinct shingles on the shingle key (fanout
    bounded by sources per shingle)."""
    sh = _shingles_spark(spark, sf_dir)
    ss = sh.select("source", "sh").distinct().localCheckpoint()
    h = ss.select("source", _H60_SPARK(F.col("sh")).alias("hv"))
    regs = (
        h.select(
            "source",
            F.expr("hv % 256").alias("reg"),
            F.expr(
                "CASE WHEN (hv >> 8) = 0 THEN 53"
                " ELSE 53 - length(bin(hv >> 8)) END"
            ).alias("rnk"),
        )
        .groupBy("source", "reg")
        .agg(F.max("rnk").cast("long").alias("maxr"))
        .localCheckpoint()  # singles + pair unions both consume it
    )
    e1 = (
        regs.groupBy("source")
        .agg(
            (F.lit(256) - F.count(F.lit(1))).cast("long").alias("zeros"),
            F.expr(
                "CAST(COALESCE(sum(shiftleft(cast(1 as bigint),"
                " cast(53 - maxr as int))), 0)"
                " + (256 - count(1)) * shiftleft(cast(1 as bigint), 53)"
                " AS BIGINT)"
            ).alias("z_int"),
        )
        .select("source", F.expr(_HLL_EST_Q6).alias("est_q6"))
    )
    srcs = ss.select("source").distinct()
    prs = (
        srcs.select(F.col("source").alias("sa"))
        .join(
            srcs.select(F.col("source").alias("sb")),
            F.col("sa") < F.col("sb"),
        )
        .localCheckpoint()
    )
    ur = (
        F.broadcast(prs)
        .join(
            regs,
            (regs["source"] == F.col("sa")) | (regs["source"] == F.col("sb")),
        )
        .groupBy("sa", "sb", "reg")
        .agg(F.max("maxr").cast("long").alias("maxr"))
    )
    uest = (
        ur.groupBy("sa", "sb")
        .agg(
            (F.lit(256) - F.count(F.lit(1))).cast("long").alias("zeros"),
            F.expr(
                "CAST(COALESCE(sum(shiftleft(cast(1 as bigint),"
                " cast(53 - maxr as int))), 0)"
                " + (256 - count(1)) * shiftleft(cast(1 as bigint), 53)"
                " AS BIGINT)"
            ).alias("z_int"),
        )
        .select("sa", "sb", F.expr(_HLL_EST_Q6).alias("est_union_q6"))
    )
    a = ss.select(F.col("source").alias("sa"), "sh")
    b = ss.select(F.col("source").alias("sb"), "sh")
    ext = (
        a.join(b, "sh")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_int"))
    )
    ea = e1.select(F.col("source").alias("sa"), F.col("est_q6").alias("ea"))
    eb = e1.select(F.col("source").alias("sb"), F.col("est_q6").alias("eb"))
    return (
        uest.join(F.broadcast(ea), "sa")
        .join(F.broadcast(eb), "sb")
        .join(ext, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            (F.col("ea") + F.col("eb") - F.col("est_union_q6"))
            .cast("long")
            .alias("est_int_q6"),
            F.coalesce("exact_int", F.lit(0)).cast("long").alias("exact_int"),
            "est_union_q6",
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "ann_scan_cost_histogram",
    _BATCH_SQL
    + """,
cz AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz FROM a3 GROUP BY cid),
qc AS (SELECT bp.qid, CAST(sum(cz.sz) AS BIGINT) AS scanned
       FROM bp JOIN cz USING (cid) GROUP BY bp.qid),
bk AS (SELECT CAST(length(bin(scanned)) - 1 AS BIGINT) AS bucket FROM qc
       WHERE scanned > 0)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_queries
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def ann_scan_cost_histogram(spark, sf_dir):
    """Per-query scan-cost distribution of the batch ANN: vectors
    inside each query's 3 probed cells, log2-bucketed — the TAIL
    LATENCY profile of the IVF (mean cost is nprobe/K of the corpus,
    but a query probing the three celebrity cells scans multiples of
    that — ivf_cluster_balance shows the skewed cells, THIS shows how
    that skew lands on queries, which is what a latency SLO feels).

    Determinism: exact cell sizes from the memoized assignment; exact
    buckets.

    Scale shape: cell sizes are a K-row agg; the per-query sum joins
    the 3-row-per-query probe table to K broadcast rows."""
    _members, _cent, final_assign = _trained_ivf(spark, sf_dir)
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cq"), F.asc("cid"))
    bp = (
        qs.crossJoin(F.broadcast(_cent))
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
    bk = qc.where(F.col("scanned") > 0).select(
        F.expr("CAST(length(bin(scanned)) - 1 AS BIGINT)").alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
        .orderBy("bucket")
    )


@register(
    "postings_gap_entropy",
    f"""WITH tf AS ({SQL_TF}),
d AS (SELECT term, doc_id,
             doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS gap
      FROM tf),
g AS (SELECT term, CAST(gap AS BIGINT) AS gap FROM d WHERE gap IS NOT NULL),
pt AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
bg AS (SELECT CAST(length(bin(pt.df)) - 1 AS BIGINT) AS df_band, g.gap
       FROM g JOIN pt USING (term)),
cells AS (SELECT df_band, gap, CAST(count(*) AS BIGINT) AS n
          FROM bg GROUP BY df_band, gap),
bt AS (SELECT df_band, CAST(sum(n) AS BIGINT) AS tot,
              CAST(count(*) AS BIGINT) AS n_distinct_gaps
       FROM cells GROUP BY df_band),
h AS (SELECT cells.df_band,
             CAST(COALESCE(sum(CAST(round(1000000 * (-1e0
                  * (CAST(cells.n AS DOUBLE) / bt.tot)
                  * ln(CAST(cells.n AS DOUBLE) / bt.tot))) AS BIGINT)), 0)
                  AS BIGINT) AS h_q6
      FROM cells JOIN bt USING (df_band) GROUP BY cells.df_band)
SELECT h.df_band, bt.tot AS n_gaps, bt.n_distinct_gaps, h.h_q6 AS entropy_q6
FROM h JOIN bt USING (df_band) ORDER BY df_band""",
)
def postings_gap_entropy(spark, sf_dir):
    """Entropy of the doc-id gap distribution per log2-df band — the
    Shannon LOWER BOUND on postings compression that
    postings_varint_estimate's LEB128 bytes should be compared against
    (varint pays ≥8 bits/gap; when a band's gap entropy is 3 bits, a
    bit-packed or Elias-Fano coding takes the difference — per band,
    which is how real engines pick per-block codecs). First postings
    (absolute ids) are excluded — only gaps compress.

    Determinism: per-(band, gap) entropy terms q6-round FIRST, BIGINT
    sums per band.

    Scale shape: the term-partitioned lag window mirrors the codec's
    ordering; (band, gap) cells are bounded by distinct gap values,
    which cluster small for dense terms."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()  # gaps + df both consume it
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    g = (
        tf.select(
            "term", (F.col("doc_id") - F.lag("doc_id").over(w)).alias("gap")
        )
        .where(F.col("gap").isNotNull())
        .select("term", F.col("gap").cast("long").alias("gap"))
    )
    pt = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    bg = g.join(pt, "term").select(
        F.expr("CAST(length(bin(df)) - 1 AS BIGINT)").alias("df_band"), "gap"
    )
    cells = bg.groupBy("df_band", "gap").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    bt = cells.groupBy("df_band").agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_gaps"),
    )
    h = (
        cells.join(bt, "df_band")
        .groupBy("df_band", "tot", "n_distinct_gaps")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(round(1000000 * (-1e0 * (CAST(n AS DOUBLE) / tot)"
                        " * ln(CAST(n AS DOUBLE) / tot))) AS BIGINT)"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("h_q6")
        )
    )
    return h.select(
        "df_band",
        F.col("tot").alias("n_gaps"),
        "n_distinct_gaps",
        F.col("h_q6").alias("entropy_q6"),
    ).orderBy("df_band")


# ---------------------------------------------------------------------------
# session 108 — pairwise-cosine moments, match coordination census,
# purchase share by weekday
# ---------------------------------------------------------------------------


@register(
    "pairwise_cos_moments",
    """WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id <> 0),
un AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(round(1000000 * x
             / sqrt(list_dot_product(v, v))) AS BIGINT)) AS u
  FROM e WHERE list_dot_product(v, v) > 0),
ux AS (SELECT vec_id, i - 1 AS k, u[i] AS xk
       FROM un, (SELECT unnest(generate_series(1, 64)) AS i)),
sv AS (SELECT k, CAST(sum(xk) AS BIGINT) AS s FROM ux GROUP BY k),
nrm AS (SELECT CAST(COALESCE(sum(s * s), 0) AS BIGINT) AS s2 FROM sv),
mkl AS (SELECT a.k AS ka, b.k AS kb,
               CAST(sum(a.xk * b.xk) AS BIGINT) // 1000000000 AS m3
        FROM ux a JOIN ux b ON a.vec_id = b.vec_id
        GROUP BY a.k, b.k),
frob AS (SELECT CAST(COALESCE(sum(m3 * m3), 0) AS BIGINT) AS f2 FROM mkl),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM un)
SELECT n.n AS n_vecs,
       CASE WHEN n.n < 2 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(nrm.s2 AS DOUBLE) / 1000000000000e0
                 - n.n) / (CAST(n.n AS DOUBLE) * (n.n - 1)))) AS BIGINT)
       END AS mean_cos_q6,
       CASE WHEN n.n < 2 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(frob.f2 AS DOUBLE) / 1000000e0 - n.n)
                 / (CAST(n.n AS DOUBLE) * (n.n - 1))
                 - ((CAST(nrm.s2 AS DOUBLE) / 1000000000000e0 - n.n)
                    / (CAST(n.n AS DOUBLE) * (n.n - 1)))
                 * ((CAST(nrm.s2 AS DOUBLE) / 1000000000000e0 - n.n)
                    / (CAST(n.n AS DOUBLE) * (n.n - 1))))) AS BIGINT)
       END AS var_cos_q6
FROM n CROSS JOIN nrm CROSS JOIN frob""",
)
def pairwise_cos_moments(spark, sf_dir):
    """Mean AND variance of all pairwise cosines with NO pair table:
    the mean comes from ‖Σû‖² − n (the source_embedding_dispersion
    identity) and the second moment from the Gram Frobenius norm —
    Σ_{i≠j}(ûᵢ·ûⱼ)² = ‖UᵀU‖²_F − n, where UᵀU is just 64×64
    column-product sums. The variance is THE concentration-of-measure
    gauge (i.i.d. high-dim vectors: mean ≈ 0, var ≈ 1/d — a var ≫ 1/d
    says the space has cluster structure worth an IVF; ≈ 1/d says
    nprobe tuning is fighting physics). O(n·d²) map-side work replaces
    the O(n²) pair table — the scale trade that makes the audit
    runnable at corpus size.

    Determinism: û components q6-round once per component (shared
    normalize expression); M entries floor q12→q3 before squaring (the
    norm-outliers envelope rule — documented quantization, ~1e-3 on a
    [−1,1] cosine scale); the two closing expressions are shared float
    strings over exact BIGINTs.

    Scale shape: one exploded (vec, dim) table; the M matrix is a
    4096-group agg of within-vector dim pairs (d²-bounded); censuses
    are 1-row."""
    e = _emb(spark, sf_dir).where(F.col("vec_id") != 0).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    un = (
        e.where(F.expr(_DOT.format(a="v", b="v")) > 0)
        .select(
            "vec_id",
            F.expr(
                f"transform(v, x -> CAST(round(1000000 * x"
                f" / sqrt({_DOT.format(a='v', b='v')})) AS BIGINT))"
            ).alias("u"),
        )
        .localCheckpoint()  # column sums + M matrix both consume it
    )
    ux = un.select("vec_id", F.posexplode("u").alias("k", "xk"))
    sv = ux.groupBy("k").agg(F.sum("xk").cast("long").alias("s"))
    nrm = sv.agg(
        F.coalesce(F.sum(F.expr("s * s")), F.lit(0)).cast("long").alias("s2")
    )
    a = ux.select("vec_id", F.col("k").alias("ka"), F.col("xk").alias("xa"))
    b = ux.select("vec_id", F.col("k").alias("kb"), F.col("xk").alias("xb"))
    mkl = (
        a.join(b, "vec_id")
        .groupBy("ka", "kb")
        .agg(
            F.expr("CAST(sum(xa * xb) AS BIGINT) div 1000000000").alias("m3")
        )
    )
    frob = mkl.agg(
        F.coalesce(F.sum(F.expr("m3 * m3")), F.lit(0)).cast("long").alias("f2")
    )
    nn = un.agg(F.count(F.lit(1)).cast("long").alias("n"))
    mean_expr = (
        "((CAST(s2 AS DOUBLE) / 1000000000000e0 - n)"
        " / (CAST(n AS DOUBLE) * (n - 1)))"
    )
    return (
        nn.crossJoin(F.broadcast(nrm))
        .crossJoin(F.broadcast(frob))
        .select(
            F.col("n").alias("n_vecs"),
            F.expr(
                f"CASE WHEN n < 2 THEN CAST(0 AS BIGINT)"
                f" ELSE CAST(round(1000000 * {mean_expr}) AS BIGINT) END"
            ).alias("mean_cos_q6"),
            F.expr(
                f"CASE WHEN n < 2 THEN CAST(0 AS BIGINT)"
                f" ELSE CAST(round(1000000 * ((CAST(f2 AS DOUBLE) / 1000000e0 - n)"
                f" / (CAST(n AS DOUBLE) * (n - 1))"
                f" - {mean_expr} * {mean_expr})) AS BIGINT) END"
            ).alias("var_cos_q6"),
        )
    )


@register(
    "match_coordination_census",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + """
SELECT CAST(nm AS BIGINT) AS n_terms_matched,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CAST(sum(score_q6) AS BIGINT) // count(*) AS BIGINT)
         AS mean_score_q6
FROM agg GROUP BY nm ORDER BY n_terms_matched""",
)
def match_coordination_census(spark, sf_dir):
    """Coordination census of the match set: how many documents matched
    1, 2, … of the query's terms, with each stratum's mean score — the
    table a minimum_should_match decision reads (if the 1-term stratum
    is huge and weak, msm=2 deletes noise for free; if it scores close
    to the 2-term stratum, msm costs recall — bm25_msm50 applies the
    cut, THIS shows what it cuts).

    Determinism: exact nm counts; mean is a floor division of exact
    q6 sums.

    Scale shape: one ≤|query|-group agg over the memoized match set."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    return (
        agg.groupBy("nm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                "CAST(CAST(sum(score_q6) AS BIGINT) div count(1) AS BIGINT)"
            ).alias("mean_score_q6"),
        )
        .select(
            F.col("nm").cast("long").alias("n_terms_matched"),
            "n_docs",
            "mean_score_q6",
        )
        .orderBy("n_terms_matched")
    )


@register(
    "purchase_share_by_weekday",
    """WITH e AS (
  SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS dow, event_type FROM events),
d AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_events,
             CAST(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_purchases
      FROM e GROUP BY dow),
spine AS (SELECT unnest(generate_series(0, 6)) AS dow)
SELECT CAST(spine.dow AS BIGINT) AS dow,
       CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(d.n_purchases, 0) AS BIGINT) AS n_purchases,
       CASE WHEN COALESCE(d.n_events, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * d.n_purchases) // d.n_events AS BIGINT)
       END AS purchase_share_q6
FROM spine LEFT JOIN d USING (dow) ORDER BY dow""",
)
def purchase_share_by_weekday(spark, sf_dir):
    """Purchase intensity by weekday: what fraction of each weekday's
    events are purchases (0 = Monday, the epoch+3 rule) — the
    CONVERSION cut of events_weekday_profile's volume view (volume
    peaks and buying peaks routinely disagree; campaign scheduling
    wants this one). All 7 days present via the spine.

    Scale shape: map-side day math with a conditional counter, a
    ≤7-group agg, a 7-row spine."""
    e = _events(spark, sf_dir).select(
        F.expr(
            "(unix_micros(cast(ts as timestamp)) div 86400000000 + 3) % 7"
        ).alias("dow"),
        "event_type",
    )
    d = e.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_purchases"),
    )
    spine = spark.range(7).select(F.col("id").alias("dow"))
    return (
        spine.join(d, "dow", "left")
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
            F.expr(
                "CASE WHEN COALESCE(n_events, 0) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_purchases) div n_events AS BIGINT) END"
            ).alias("purchase_share_q6"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# session 109 — IQR outlier census, forward as-of join, daily hour entropy
# ---------------------------------------------------------------------------


def _iqr_census_sql() -> str:
    """Generated oracle nesting boxplot_doclen's full statement as a CTE
    (its quartile machinery stays in ONE place); fences compare as
    integer cross-multiplications — 1.5·IQR never becomes a float."""
    bp = REGISTRY["boxplot_doclen"].sql
    return f"""WITH bp AS ({bp}),
t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT)
           AS n_tok
  FROM documents),
j AS (SELECT t.source, t.n_tok, bp.q1_q6, bp.q3_q6, bp.iqr_q6
      FROM t JOIN bp USING (source))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(CASE WHEN 2000000 * n_tok < 2 * q1_q6 - 3 * iqr_q6
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_low,
       CAST(COALESCE(sum(CASE WHEN 2000000 * n_tok > 2 * q3_q6 + 3 * iqr_q6
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_high,
       CAST((1000000 * (COALESCE(sum(CASE WHEN 2000000 * n_tok < 2 * q1_q6
            - 3 * iqr_q6 THEN 1 ELSE 0 END), 0)
            + COALESCE(sum(CASE WHEN 2000000 * n_tok > 2 * q3_q6 + 3 * iqr_q6
            THEN 1 ELSE 0 END), 0))) // count(*) AS BIGINT) AS outlier_share_q6
FROM j GROUP BY source ORDER BY source"""


@register("iqr_outlier_census", _iqr_census_sql())
def iqr_outlier_census(spark, sf_dir):
    """Tukey-fence outlier census per source: documents whose token
    length falls below q1 − 1.5·IQR or above q3 + 1.5·IQR — the
    standard boxplot-whisker rule turned into counts (boxplot_doclen
    draws the box; THIS counts what hangs outside it, which is the
    truncation/padding-budget question: a 4% high-outlier share is 4%
    of docs paying sliding-window costs). Fences compare as exact
    integer cross-multiplications (2e6·len vs 2q1 − 3·IQR), so the
    1.5× never exists as a float.

    Determinism: quartiles are boxplot_doclen's exact type-7 values;
    everything after is integer.

    Scale shape: the quartile table is ≤|sources| rows broadcast into
    a map-side length projection; one source rollup."""
    bp = boxplot_doclen(spark, sf_dir).select(
        "source", "q1_q6", "q3_q6", "iqr_q6"
    )
    t = _docs(spark, sf_dir).select(
        "source", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    j = t.join(F.broadcast(bp), "source")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN 2000000 * n_tok < 2 * q1_q6 - 3 * iqr_q6"
                        " THEN 1 ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_low"),
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN 2000000 * n_tok > 2 * q3_q6 + 3 * iqr_q6"
                        " THEN 1 ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_high"),
        )
        .select(
            "source",
            "n_docs",
            "n_low",
            "n_high",
            F.expr(
                "CAST((1000000 * (n_low + n_high)) div n_docs AS BIGINT)"
            ).alias("outlier_share_q6"),
        )
        .orderBy("source")
    )


@register(
    "events_asof_forward",
    """WITH t AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v
  FROM events WHERE event_type IN ('view', 'purchase')),
w AS (
  SELECT event_id, user_id, t_us, is_v,
         first_value(CASE WHEN is_p = 1 THEN t_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_us ASC, is_p ASC, event_id ASC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_us
  FROM t)
SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(t_us AS BIGINT) AS view_us,
       CAST(COALESCE(p_us - t_us, -1) AS BIGINT) AS wait_us
FROM w WHERE is_v = 1 ORDER BY event_id""",
)
def events_asof_forward(spark, sf_dir):
    """FORWARD as-of join: for every view, the wait until the SAME
    user's next purchase (at-or-after — a same-timestamp purchase
    counts, the declared tie rule via the is_p sort key), −1 when none
    ever comes. Completes the as-of family (events_asof_join looks
    backward, _horizon bounds it, THIS looks forward) — forward as-of
    is the label-generation join for time-to-convert models, where
    each impression needs its outcome delay.

    Determinism: the tagged union orders by (t_us, is_p, event_id) —
    views sort before purchases at equal ts, so the purchase is
    visible to the view's forward scan; exact integer microseconds.

    Scale shape: ONE user_id exchange; the forward-looking
    first_value(IGNORE NULLS) window is the reversed tagged-union
    trick — no self-join, no per-event probe."""
    t = (
        _events(spark, sf_dir)
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
                "is_p"
            ),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_v"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.asc("t_us"), F.asc("is_p"), F.asc("event_id")
    ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j = t.withColumn(
        "p_us",
        F.first(
            F.when(F.col("is_p") == 1, F.col("t_us")), ignorenulls=True
        ).over(w),
    )
    return (
        j.where(F.col("is_v") == 1)
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.col("t_us").cast("long").alias("view_us"),
            F.coalesce(F.col("p_us") - F.col("t_us"), F.lit(-1))
            .cast("long")
            .alias("wait_us"),
        )
        .orderBy("event_id")
    )


@register(
    "daily_hour_entropy",
    f"""WITH e AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num,
         (epoch_us(ts) // 3600000000) % 24 AS hour
  FROM events),
c AS (SELECT day_num, hour, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY day_num, hour),
d AS (SELECT day_num, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY day_num),
h AS (SELECT c.day_num,
             CAST(COALESCE(sum(CAST(round(1000000 * (-1e0
                  * (CAST(c.n AS DOUBLE) / d.tot)
                  * ln(CAST(c.n AS DOUBLE) / d.tot))) AS BIGINT)), 0) AS BIGINT)
               AS h_q6
      FROM c JOIN d USING (day_num) GROUP BY c.day_num)
SELECT CAST(h.day_num AS BIGINT) AS day_num, d.tot AS n_events,
       h.h_q6 AS hour_entropy_q6
FROM h JOIN d USING (day_num) ORDER BY day_num""",
)
def daily_hour_entropy(spark, sf_dir):
    """Traffic-shape regularity series: per day, the Shannon entropy of
    the hour-of-day distribution — a day whose entropy collapses is a
    burst (one hour took all the traffic: incident, batch job, or
    launch), the SHAPE anomaly events_daily_anomaly's volume z² can't
    see (a perfectly average-sized day can still be all one hour).
    Observed days only; max is ln 24 ≈ 3.178.

    Determinism: per-(day, hour) entropy terms q6-round FIRST, BIGINT
    sums per day.

    Scale shape: one (day, hour) agg (≤24 cells/day), day totals
    joined back on the day key."""
    e = _events(spark, sf_dir).select(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24").alias(
            "hour"
        ),
    )
    c = e.groupBy("day_num", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    d = c.groupBy("day_num").agg(F.sum("n").cast("long").alias("tot"))
    h = (
        c.join(d, "day_num")
        .groupBy("day_num", "tot")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(round(1000000 * (-1e0 * (CAST(n AS DOUBLE) / tot)"
                        " * ln(CAST(n AS DOUBLE) / tot))) AS BIGINT)"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("h_q6")
        )
    )
    return h.select(
        F.col("day_num").cast("long").alias("day_num"),
        F.col("tot").alias("n_events"),
        F.col("h_q6").alias("hour_entropy_q6"),
    ).orderBy("day_num")


# ---------------------------------------------------------------------------
# session 110 — inter-event burstiness, catalog sales coverage, session
# entry/exit matrix
# ---------------------------------------------------------------------------


@register(
    "interevent_cv2",
    """WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
g AS (SELECT CAST((t_us - lag(t_us) OVER (PARTITION BY user_id
                   ORDER BY t_us, event_id)) // 1000000 AS BIGINT) AS gap_s
      FROM t),
gg AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap_s) AS BIGINT) AS s,
             CAST(sum(gap_s) AS BIGINT)
               // greatest(CAST(count(*) AS BIGINT), 1) AS mg
      FROM gg),
cs AS (SELECT m.n AS n, m.s AS s,
              CAST(sum(gg.gap_s - m.mg) AS BIGINT) AS syc,
              CAST(sum((gg.gap_s - m.mg) * (gg.gap_s - m.mg)) AS BIGINT) AS syy
       FROM gg CROSS JOIN m GROUP BY m.n, m.s)
SELECT n AS n_gaps,
       CAST(round(1000000 * (CAST(s AS DOUBLE) / greatest(n, 1))) AS BIGINT)
         AS mean_gap_s_q6,
       CASE WHEN n < 2 OR s = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (((CAST(n AS DOUBLE) * syy
                 - CAST(syc AS DOUBLE) * syc) / (CAST(n AS DOUBLE) * n))
                 / ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))))
                 AS BIGINT) END AS cv2_q6
FROM cs""",
)
def interevent_cv2(spark, sf_dir):
    """Burstiness of the event stream as ONE number: the squared
    coefficient of variation of user-keyed inter-event gaps (seconds).
    A Poisson process sits at CV² = 1; heavy-tailed human burstiness
    pushes it far above; a metronomic bot below —
    interevent_gap_histogram shows the whole distribution, THIS is the
    summary a monitoring threshold watches (the erratic_customers CV²
    machinery pointed at time instead of money; squared — the no-sqrt
    rule).

    Determinism: integer-second gaps; centered-BIGINT variance; one
    shared float expression.

    Scale shape: ONE user exchange for the lag window; the stats pass
    is a 1-row census with a broadcast mean."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    g = (
        t.select(
            (F.col("t_us") - F.lag("t_us").over(w)).alias("gap_us")
        )
        .where(F.col("gap_us").isNotNull())
        .select(F.expr("CAST(gap_us div 1000000 AS BIGINT)").alias("gap_s"))
        .localCheckpoint()  # mean + centered pass both consume it
    )
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_s").cast("long").alias("s"),
        F.expr(
            "CAST(sum(gap_s) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mg"),
    )
    cs = (
        g.crossJoin(F.broadcast(m))
        .groupBy("n", "s")
        .agg(
            F.sum(F.col("gap_s") - F.col("mg")).cast("long").alias("syc"),
            F.sum((F.col("gap_s") - F.col("mg")) * (F.col("gap_s") - F.col("mg")))
            .cast("long")
            .alias("syy"),
        )
    )
    return cs.select(
        F.col("n").alias("n_gaps"),
        F.expr(
            "CAST(round(1000000 * (CAST(s AS DOUBLE) / greatest(n, 1)))"
            " AS BIGINT)"
        ).alias("mean_gap_s_q6"),
        F.expr(
            "CASE WHEN n < 2 OR s = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (((CAST(n AS DOUBLE) * syy"
            " - CAST(syc AS DOUBLE) * syc) / (CAST(n AS DOUBLE) * n))"
            " / ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))))"
            " AS BIGINT) END"
        ).alias("cv2_q6"),
    )


@register(
    "part_sales_coverage",
    """WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem),
j AS (SELECT p.p_brand,
             CASE WHEN sold.l_partkey IS NULL THEN 0 ELSE 1 END AS is_sold
      FROM part p LEFT JOIN sold ON sold.l_partkey = p.p_partkey)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(COALESCE(sum(is_sold), 0) AS BIGINT) AS n_sold,
       CAST((1000000 * COALESCE(sum(is_sold), 0)) // count(*) AS BIGINT)
         AS coverage_q6
FROM j GROUP BY p_brand ORDER BY p_brand""",
)
def part_sales_coverage(spark, sf_dir):
    """Catalog sales coverage per brand: what share of listed parts
    have EVER shipped — the dead-stock census (the complement of
    top_moving_parts: that board shows the head, this measures the
    tail that ties up shelf space; a brand at 60% coverage carries 40%
    catalog debt). The LEFT probe direction matters: part is the spine
    so never-sold parts COUNT.

    Determinism: exact distincts and counts.

    Scale shape: one distinct over lineitem's partkey (two-phase),
    a LEFT probe keyed on partkey, a ≤|brands| rollup."""
    sold = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .withColumn("is_sold_flag", F.lit(1))
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    j = p.join(sold, p["p_partkey"] == sold["l_partkey"], "left").select(
        "p_brand", F.coalesce("is_sold_flag", F.lit(0)).alias("is_sold")
    )
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.coalesce(F.sum("is_sold"), F.lit(0)).cast("long").alias("n_sold"),
        )
        .select(
            "p_brand",
            "n_parts",
            "n_sold",
            F.expr(
                "CAST((1000000 * n_sold) div n_parts AS BIGINT)"
            ).alias("coverage_q6"),
        )
        .orderBy("p_brand")
    )


@register(
    "session_entry_exit_matrix",
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
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY t_us ASC, event_id ASC) AS rf,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY t_us DESC, event_id DESC) AS rl
  FROM se),
ses AS (
  SELECT user_id, sid,
         max(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
         max(CASE WHEN rl = 1 THEN event_type END) AS exit_type
  FROM rk GROUP BY user_id, sid)
SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions
FROM ses GROUP BY entry_type, exit_type ORDER BY entry_type, exit_type""",
)
def session_entry_exit_matrix(spark, sf_dir):
    """Session flow matrix: first event type × last event type per
    session — where journeys begin crossed with where they die
    (session_entry_conversion scores the door by outcome; THIS shows
    the full door→exit flow, and the (view, view) cell is the
    window-shopper population every growth review argues about).

    Determinism: entry/exit are map-side min/max(struct(...)) picks in
    Spark (the search_collapse rule — the oracle may window); ties
    break on (t_us, event_id) both directions.

    Scale shape: ONE user exchange for the session machinery, a
    (user, session) agg carrying both ends in one pass, a
    ≤|types|²-cell rollup."""
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
        F.min(F.struct("t_us", "event_id", "event_type"))["event_type"].alias(
            "entry_type"
        ),
        F.max(F.struct("t_us", "event_id", "event_type"))["event_type"].alias(
            "exit_type"
        ),
    )
    return (
        ses.groupBy("entry_type", "exit_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy("entry_type", "exit_type")
    )
