"""driver_queries chunk q07 (original lines 24290-27746): orders_month_seasonality, wig_qpp, ann_label_purity, url_domain_census, ... dp_source_counts (46 ops).

Linearized continuation of docix_spark.ops.q06 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q06")

@register(
    "orders_month_seasonality",
    """WITH o AS (
  SELECT month(CAST(o_orderdate AS TIMESTAMP)) AS mon,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
c AS (SELECT mon, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM o GROUP BY mon),
spine AS (SELECT unnest(generate_series(1, 12)) AS mon),
f AS (SELECT spine.mon, CAST(COALESCE(c.n_orders, 0) AS BIGINT) AS n_orders,
             CAST(COALESCE(c.revenue_cents, 0) AS BIGINT) AS revenue_cents
      FROM spine LEFT JOIN c USING (mon)),
t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS tot FROM f)
SELECT CAST(f.mon AS BIGINT) AS mon, f.n_orders, f.revenue_cents,
       CASE WHEN t.tot = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * f.revenue_cents) // t.tot AS BIGINT)
       END AS share_q6
FROM f CROSS JOIN t ORDER BY mon""",
)
def orders_month_seasonality(spark, sf_dir):
    """Calendar-month revenue seasonality of the order book — the
    orders-side twin of events_weekday_profile (retail Decembers,
    fiscal-year-end spikes), all 12 months always present via the
    spine. month() is pure Gregorian arithmetic in both engines —
    never a locale-dependent monthname().

    Scale shape: map-side month math into a ≤12-group agg; the spine
    join and share division run on 12 rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("month(CAST(o_orderdate AS TIMESTAMP))").alias("mon"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = o.groupBy("mon").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    spine = spark.range(1, 13).select(F.col("id").alias("mon"))
    f = spine.join(c, "mon", "left").select(
        "mon",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("revenue_cents", F.lit(0)).cast("long").alias("revenue_cents"),
    )
    t = f.agg(F.sum("revenue_cents").cast("long").alias("tot"))
    return (
        f.crossJoin(F.broadcast(t))
        .select(
            F.col("mon").cast("long").alias("mon"),
            "n_orders",
            "revenue_cents",
            F.expr(
                "CASE WHEN tot = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * revenue_cents) div tot AS BIGINT) END"
            ).alias("share_q6"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# session 79 — WIG post-retrieval QPP, kNN label purity, URL domain census
# ---------------------------------------------------------------------------

_WIG_NORM = "7.0710678118654755e-1"  # 1/sqrt(|q|) for the 2-term query


@register(
    "wig_qpp",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + f""",
alls AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(COALESCE(sum(score_q6), 0) AS BIGINT) AS s FROM agg),
tops AS (SELECT CAST(count(*) AS BIGINT) AS nt,
                CAST(COALESCE(sum(score_q6), 0) AS BIGINT) AS st
         FROM (SELECT score_q6 FROM agg
               ORDER BY score_q6 DESC, doc_id ASC LIMIT 10)),
mm AS (SELECT alls.n,
              CAST(tops.st // greatest(tops.nt, 1) AS BIGINT) AS mean_top10_q6,
              CAST(alls.s // greatest(alls.n, 1) AS BIGINT) AS mean_all_q6
       FROM alls CROSS JOIN tops)
SELECT n AS n_matches, mean_top10_q6, mean_all_q6,
       CAST(round((mean_top10_q6 - mean_all_q6) * {_WIG_NORM}) AS BIGINT) AS wig_q6
FROM mm""",
)
def wig_qpp(spark, sf_dir):
    """WIG (Weighted Information Gain, Zhou & Croft 2007) post-retrieval
    query-performance prediction adapted to BM25: how far the top-10
    scores sit above the full match set's mean, normalised by 1/√|q| —
    the third QPP beside preretrieval_qpp (no retrieval at all) and
    clarity_score (needs the LM of the top docs). A peaked score curve
    (top ≫ mean) predicts an easy query; flat predicts ambiguity — WIG
    is the cheapest of the three because it reads NOTHING but scores
    already in hand.

    Determinism: BIGINT score sums; both means are floor divisions;
    the √|q| normaliser is a folded e-notation constant.

    Scale shape: the memoized match set feeds a 1-row census and one
    TakeOrdered top-10 — no new corpus passes."""
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
            F.coalesce(F.sum("score_q6"), F.lit(0)).cast("long").alias("st"),
        )
    )
    mm = alls.crossJoin(tops).select(
        "n",
        F.expr("CAST(st div greatest(nt, 1) AS BIGINT)").alias("mean_top10_q6"),
        F.expr("CAST(s div greatest(n, 1) AS BIGINT)").alias("mean_all_q6"),
    )
    return mm.select(
        F.col("n").alias("n_matches"),
        "mean_top10_q6",
        "mean_all_q6",
        F.expr(
            f"CAST(round((mean_top10_q6 - mean_all_q6) * {_WIG_NORM}) AS BIGINT)"
        ).alias("wig_q6"),
    )


@register(
    "ann_label_purity",
    _BATCH_SQL
    + """,
lb AS (SELECT vec_id, label FROM embeddings),
nb AS (SELECT qid, vec_id FROM btop WHERE rnk <= 10 AND vec_id <> qid),
qn AS (SELECT lb.label, CAST(count(*) AS BIGINT) AS n_queries
       FROM lb WHERE lb.vec_id % 37 = 0 GROUP BY lb.label),
j AS (SELECT ql.label AS label,
             CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END AS same
      FROM nb JOIN lb ql ON ql.vec_id = nb.qid
      JOIN lb nl ON nl.vec_id = nb.vec_id),
ag AS (SELECT label, CAST(count(*) AS BIGINT) AS n_neighbors,
              CAST(COALESCE(sum(same), 0) AS BIGINT) AS n_same
       FROM j GROUP BY label)
SELECT CAST(qn.label AS BIGINT) AS label, qn.n_queries,
       CAST(COALESCE(ag.n_neighbors, 0) AS BIGINT) AS n_neighbors,
       CAST(COALESCE(ag.n_same, 0) AS BIGINT) AS n_same,
       CASE WHEN COALESCE(ag.n_neighbors, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * ag.n_same) // ag.n_neighbors AS BIGINT)
       END AS purity_q6
FROM qn LEFT JOIN ag USING (label) ORDER BY label""",
)
def ann_label_purity(spark, sf_dir):
    """kNN label consistency of the embedding space: for the %37 query
    batch, what fraction of each query's top-10 IVF neighbors (self-hit
    excluded) carry the query's own label — the class-separability
    probe run before trusting embeddings for classification or
    hard-negative mining (purity ≈ label prior means the space ignores
    the label; ≈1 means nearest-neighbor rule would work). On the
    i.i.d. sandbox vectors purity sits AT the label prior — the honest
    reading, don't "fix" it.

    Determinism: reuses the batch-ANN top-10 (quantized cosine ranks);
    counts exact; purity is integer division; labels absent from the
    neighbor set emit 0-rows via the query-census LEFT JOIN.

    Scale shape: the neighbor table is 10 rows per query; both label
    joins key on vec_id with the small side being the neighbor list
    (un-hinted — AQE broadcasts when the batch is small)."""
    top = _ivf_batch_topk(spark, sf_dir)
    lb = _emb(spark, sf_dir).select("vec_id", "label")
    nb = top.where(F.col("vec_id") != F.col("qid")).select("qid", "vec_id")
    qn = (
        lb.where(F.col("vec_id") % 37 == 0)
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    )
    ql = lb.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    nl = lb.select("vec_id", F.col("label").alias("nlabel"))
    j = nb.join(ql, "qid").join(nl, "vec_id").select(
        F.col("qlabel").alias("label"),
        F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0).alias("same"),
    )
    ag = j.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        F.coalesce(F.sum("same"), F.lit(0)).cast("long").alias("n_same"),
    )
    return (
        qn.join(ag, "label", "left")
        .select(
            F.col("label").cast("long").alias("label"),
            "n_queries",
            F.coalesce("n_neighbors", F.lit(0)).cast("long").alias("n_neighbors"),
            F.coalesce("n_same", F.lit(0)).cast("long").alias("n_same"),
            F.expr(
                "CASE WHEN COALESCE(n_neighbors, 0) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_same) div n_neighbors AS BIGINT) END"
            ).alias("purity_q6"),
        )
        .orderBy("label")
    )


_URL_DOMAIN_RE = "https?://([a-z0-9.-]+)"


@register(
    "url_domain_census",
    f"""WITH d AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_URL_DOMAIN_RE}', 1)) AS domain
  FROM documents),
g AS (SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_mentions
      FROM d GROUP BY domain),
rk AS (SELECT domain, n_docs, n_mentions,
              row_number() OVER (ORDER BY n_mentions DESC, domain ASC) AS rank
       FROM g)
SELECT domain, CAST(rank AS BIGINT) AS rank, n_docs, n_mentions
FROM rk WHERE rank <= 20 ORDER BY rank""",
)
def url_domain_census(spark, sf_dir):
    """Top-20 linked domains across the corpus — the crawl-mix audit a
    web-scale pipeline runs before sampling (one SEO farm dominating
    the link graph shows up here first). Domains come from the
    lowercased text via a capture group of the shared URL pattern (RE2
    ∩ Java-regex subset, no backslash classes — the pii_scrub_stats
    rule). The sandbox corpus contains no URLs, so the live table is
    empty — CORRECT, and the injected-parquet pytest proves the
    extraction (the pii_scrub_stats precedent).

    Scale shape: map-side extraction exploding only matched spans; one
    domain-keyed agg (two-phase distinct for n_docs); TakeOrdered 20."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{_URL_DOMAIN_RE}', 1)")
        ).alias("domain"),
    )
    g = d.groupBy("domain").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
    )
    return (
        g.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("n_mentions"), F.asc("domain")))
            .cast("long"),
        )
        .where(F.col("rank") <= 20)
        .select("domain", "rank", "n_docs", "n_mentions")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# session 80 — fuzzy prefix-length curve, varint index-size estimate,
# token length histogram
# ---------------------------------------------------------------------------

_FUZZY_TYPO = "spakr"


@register(
    "fuzzy_prefix_curve",
    f"""WITH tf AS ({SQL_TF}),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
ps AS (SELECT unnest(generate_series(0, 2)) AS prefix_len),
cand AS (
  SELECT ps.prefix_len, dict.term, dict.df,
         CAST(levenshtein(dict.term, '{_FUZZY_TYPO}') AS BIGINT) AS dist
  FROM ps CROSS JOIN dict
  WHERE levenshtein(dict.term, '{_FUZZY_TYPO}') <= 2
    AND (ps.prefix_len = 0
         OR substr(dict.term, 1, ps.prefix_len)
            = substr('{_FUZZY_TYPO}', 1, ps.prefix_len))),
best AS (
  SELECT prefix_len, term AS best_term, dist AS best_dist FROM (
    SELECT prefix_len, term, dist,
           row_number() OVER (PARTITION BY prefix_len
                              ORDER BY dist ASC, df DESC, term ASC) AS rn
    FROM cand) WHERE rn = 1),
cnt AS (SELECT prefix_len, CAST(count(*) AS BIGINT) AS n_candidates
        FROM cand GROUP BY prefix_len)
SELECT CAST(ps.prefix_len AS BIGINT) AS prefix_len,
       CAST(COALESCE(cnt.n_candidates, 0) AS BIGINT) AS n_candidates,
       COALESCE(best.best_term, '') AS best_term,
       CAST(COALESCE(best.best_dist, -1) AS BIGINT) AS best_dist
FROM ps LEFT JOIN cnt USING (prefix_len) LEFT JOIN best USING (prefix_len)
ORDER BY prefix_len""",
)
def fuzzy_prefix_curve(spark, sf_dir):
    """Fuzzy-query prefix_length tuning curve: for the canonical typo
    '{typo}', how many dictionary candidates survive edit-distance ≤ 2
    when 0/1/2 leading characters must match exactly — Lucene's
    ``prefix_length`` knob measured the way the LSH/HLL/bloom curves
    measure theirs. prefix_length is THE fuzzy-cost lever (ES defaults
    it to 0 and every sizing guide says raise it): each step shrinks
    the automaton's dictionary intersection ~|Σ|-fold at the price of
    missing first-letter typos. The best candidate follows
    spell_correct's rule (dist asc, df desc, term asc).

    Determinism: levenshtein() is exact integer edit distance in both
    engines; the best pick is map-side min(struct(dist, -df, term)) in
    Spark (the search_collapse rule — the oracle may window); empty
    candidate sets emit ('', -1) sentinels via the spine LEFT JOIN.

    Scale shape: the distance scan is dictionary-sized (vocab-bounded,
    the F2 fuzzy-join precedent), crossed with a 3-row spine; aggs
    land on 3 rows."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dic = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ps = spark.range(3).select(F.col("id").alias("prefix_len"))
    cand = (
        ps.crossJoin(dic)
        .withColumn(
            "dist", F.expr(f"CAST(levenshtein(term, '{_FUZZY_TYPO}') AS BIGINT)")
        )
        .where(
            (F.col("dist") <= 2)
            & (
                (F.col("prefix_len") == 0)
                | (
                    F.expr(
                        f"substr(term, 1, prefix_len)"
                        f" = substr('{_FUZZY_TYPO}', 1, CAST(prefix_len AS INT))"
                    )
                )
            )
        )
    )
    ag = cand.groupBy("prefix_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.min(
            F.struct(F.col("dist"), (-F.col("df")).alias("ndf"), F.col("term"))
        ).alias("b"),
    )
    return (
        ps.join(ag, "prefix_len", "left")
        .select(
            F.col("prefix_len").cast("long").alias("prefix_len"),
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce(F.col("b.term"), F.lit("")).alias("best_term"),
            F.coalesce(F.col("b.dist"), F.lit(-1)).cast("long").alias("best_dist"),
        )
        .orderBy("prefix_len")
    )


fuzzy_prefix_curve.__doc__ = fuzzy_prefix_curve.__doc__.replace(
    "{typo}", _FUZZY_TYPO
)


@register(
    "postings_varint_estimate",
    f"""WITH tf AS ({SQL_TF}),
d AS (SELECT term, doc_id,
             doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS delta
      FROM tf),
b AS (SELECT term,
             CAST(CASE WHEN delta IS NULL
                  THEN (length(bin(doc_id + 1)) + 6) // 7
                  ELSE (length(bin(delta)) + 6) // 7 END AS BIGINT) AS nbytes
      FROM d),
pt AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
              CAST(sum(nbytes) AS BIGINT) AS bytes_est
       FROM b GROUP BY term),
bd AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_band, df, bytes_est
       FROM pt)
SELECT df_band, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(df) AS BIGINT) AS n_postings,
       CAST(sum(bytes_est) AS BIGINT) AS bytes_est,
       CAST((1000000 * sum(bytes_est)) // sum(df) AS BIGINT) AS bytes_per_posting_q6
FROM bd GROUP BY df_band ORDER BY df_band""",
)
def postings_varint_estimate(spark, sf_dir):
    """Index-size cost model: estimated varint bytes of the delta-encoded
    doc_id postings, rolled up by log2-df band — the capacity-planning
    table behind the real codec (docix_spark.index.codec stores exactly
    these deltas; bytes(x) = ⌈bits(x)/7⌉ is the LEB128 length, computed
    as the exact integer (length(bin(x))+6)//7). Dense terms compress
    toward 1 byte/posting (small deltas), rare terms pay absolute-id
    prices — THIS curve says where the bytes live and what a df-banded
    tiering would save. First posting stores doc_id+1 (absolute,
    shifted positive); deltas are ≥1 because doc_ids are distinct
    per term.

    Determinism: pure integer arithmetic end to end.

    Scale shape: the term-partitioned lag window mirrors the build's
    own per-term doc_id ordering (segment encode groups salt exactly
    this partition at build time — a celebrity term's window is bounded
    by its df, the same bound the codec accepts); both rollups combine
    map-side into ≤64 band rows."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    d = tf.select(
        "term", "doc_id", (F.col("doc_id") - F.lag("doc_id").over(w)).alias("delta")
    )
    b = d.select(
        "term",
        F.expr(
            "CAST(CASE WHEN delta IS NULL THEN (length(bin(doc_id + 1)) + 6) div 7"
            " ELSE (length(bin(delta)) + 6) div 7 END AS BIGINT)"
        ).alias("nbytes"),
    )
    pt = b.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("nbytes").cast("long").alias("bytes_est"),
    )
    bd = pt.select(
        F.expr("CAST(length(bin(df)) - 1 AS BIGINT)").alias("df_band"),
        "df",
        "bytes_est",
    )
    return (
        bd.groupBy("df_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("n_postings"),
            F.sum("bytes_est").cast("long").alias("bytes_est"),
        )
        .select(
            "df_band",
            "n_terms",
            "n_postings",
            "bytes_est",
            F.expr(
                "CAST((1000000 * bytes_est) div n_postings AS BIGINT)"
            ).alias("bytes_per_posting_q6"),
        )
        .orderBy("df_band")
    )


@register(
    "token_length_histogram",
    f"""WITH t AS ({SQL_TOKS}),
g AS (SELECT CAST(length(term) AS BIGINT) AS term_len,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT term) AS BIGINT) AS n_types
      FROM t GROUP BY term_len),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM g)
SELECT g.term_len, g.n_tokens, g.n_types,
       CASE WHEN tot.t = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * g.n_tokens) // tot.t AS BIGINT) END AS share_q6
FROM g CROSS JOIN tot ORDER BY g.term_len""",
)
def token_length_histogram(spark, sf_dir):
    """Token-length distribution (characters) with per-length type
    counts — the vocabulary-shape census that reads next to
    abbreviation_law_curve (that one conditions length on frequency;
    this is the marginal): single-char floods signal a broken
    tokenizer, a heavy ≥15-char tail signals unsplit compounds or
    markup leakage. Observed lengths only — no spine, the set is
    data-defined identically in both engines.

    Scale shape: map-side length over the token stream, one ≤~40-group
    agg (two-phase distinct for types), a 1-row total broadcast."""
    t = _toks(_docs(spark, sf_dir))
    g = t.groupBy(F.length("term").cast("long").alias("term_len")).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types"),
    )
    tot = g.agg(F.sum("n_tokens").cast("long").alias("t"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "term_len",
            "n_tokens",
            "n_types",
            F.expr(
                "CASE WHEN t = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_tokens) div t AS BIGINT) END"
            ).alias("share_q6"),
        )
        .orderBy("term_len")
    )


# ---------------------------------------------------------------------------
# session 81 — per-brand price/size OLS, segment value stats, rerank band
# curve
# ---------------------------------------------------------------------------


@register(
    "brand_size_price_trend",
    f"""WITH p AS (
  SELECT p_brand, CAST(p_size AS BIGINT) AS x,
         CAST(round(p_retailprice * 100) AS BIGINT) // 100 AS y
  FROM part),
m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mx,
             CAST(sum(y) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS my
      FROM p GROUP BY p_brand),
cs AS (SELECT p.p_brand, m.n AS n,
              CAST(sum(p.x - m.mx) AS BIGINT) AS sxc,
              CAST(sum(p.y - m.my) AS BIGINT) AS syc,
              CAST(sum((p.x - m.mx) * (p.x - m.mx)) AS BIGINT) AS sxx,
              CAST(sum((p.y - m.my) * (p.y - m.my)) AS BIGINT) AS syy,
              CAST(sum((p.x - m.mx) * (p.y - m.my)) AS BIGINT) AS sxy
       FROM p JOIN m USING (p_brand) GROUP BY p.p_brand, m.n)
SELECT p_brand, n AS n_parts, {_TR_SLOPE} AS slope_q6, {_TR_R2} AS r2_q6
FROM cs ORDER BY p_brand""",
)
def brand_size_price_trend(spark, sf_dir):
    """Does size buy price, per brand: OLS slope (whole dollars per size
    unit, q6) and R² of retail price on p_size within each brand — the
    catalog-pricing consistency audit (a brand whose slope is flat with
    high R² prices by something other than size; one with negative
    slope has data-entry suspects). The daily_revenue_trend centered-
    BIGINT machinery GROUPED: per-brand integer means join back on the
    bounded brand key, centered products sum exactly, slope/R² are the
    shared _TR_* expressions per brand row.

    Scale shape: one part-table pass for means (map-side partials into
    |brands| rows, broadcast back), one for centered sums; nothing
    bigger than |brands| leaves an agg."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_brand",
        F.col("p_size").cast("long").alias("x"),
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT) div 100").alias("y"),
    )
    m = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(x) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mx"),
        F.expr(
            "CAST(sum(y) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("my"),
    )
    cs = (
        p.join(F.broadcast(m), "p_brand")
        .groupBy("p_brand", "n")
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
        "p_brand",
        F.col("n").alias("n_parts"),
        F.expr(_TR_SLOPE).alias("slope_q6"),
        F.expr(_TR_R2).alias("r2_q6"),
    ).orderBy("p_brand")


# one-variable centered variance from exact BIGINTs (columns n, syc, syy)
_SEG_VAR = (
    "CASE WHEN n < 2 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(1000000 * ((CAST(n AS DOUBLE) * syy"
    " - CAST(syc AS DOUBLE) * syc) / (CAST(n AS DOUBLE) * n))) AS BIGINT) END"
)


@register(
    "segment_value_stats",
    f"""WITH o AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
j AS (SELECT c.c_mktsegment, o.cents, o.cents // 100 AS y
      FROM o JOIN customer c ON c.c_custkey = o.o_custkey),
m AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(y) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS my
      FROM j GROUP BY c_mktsegment),
cs AS (SELECT j.c_mktsegment, m.n AS n, m.s AS s,
              CAST(sum(j.y - m.my) AS BIGINT) AS syc,
              CAST(sum((j.y - m.my) * (j.y - m.my)) AS BIGINT) AS syy
       FROM j JOIN m USING (c_mktsegment) GROUP BY j.c_mktsegment, m.n, m.s)
SELECT c_mktsegment, n AS n_orders, s AS revenue_cents,
       CAST(round(1000000 * (CAST(s AS DOUBLE) / n)) AS BIGINT) AS mean_cents_q6,
       {_SEG_VAR} AS var_dlr_q6
FROM cs ORDER BY c_mktsegment""",
)
def segment_value_stats(spark, sf_dir):
    """Order-value profile per market segment: count, exact revenue,
    mean, and variance — "do MACHINERY customers place bigger but
    steadier orders than AUTOMOBILE" as one table, the extended_stats
    reading on the orders⋈customer star. Variance uses the two-pass
    centered form on whole dollars (the daily_revenue_trend envelope
    rule — raw cents squares pass 2^63 at warehouse scale; centered
    dollar deviations don't); std_dev is deliberately omitted (sqrt
    reintroduces float bits — the extended_stats_source rule).

    Scale shape: the custkey join is un-hinted (both sides unbounded);
    segment stats combine map-side into ≤|segments| rows, broadcast
    back for the centering pass."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "cents", F.expr("cents div 100").alias("y")
    )
    m = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.expr(
            "CAST(sum(y) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("my"),
    )
    cs = (
        j.join(F.broadcast(m), "c_mktsegment")
        .groupBy("c_mktsegment", "n", "s")
        .agg(
            F.sum(F.col("y") - F.col("my")).cast("long").alias("syc"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .cast("long")
            .alias("syy"),
        )
    )
    return cs.select(
        "c_mktsegment",
        F.col("n").alias("n_orders"),
        F.col("s").alias("revenue_cents"),
        F.expr(
            "CAST(round(1000000 * (CAST(s AS DOUBLE) / n)) AS BIGINT)"
        ).alias("mean_cents_q6"),
        F.expr(_SEG_VAR).alias("var_dlr_q6"),
    ).orderBy("c_mktsegment")


_RERANK_BANDS = (10, 25, 50)


def _rerank_curve_sql() -> str:
    """Generated oracle: the IVF+PQ chain once, then per-R band/rerank/
    overlap CTEs UNION ALL'd (the nprobe-curve pattern — bands nest, so
    recall is provably monotone in R)."""
    parts = [_ivfpq_sql().rstrip()]
    parts.append(
        f""", rq AS (SELECT v AS qv FROM e WHERE vec_id = 0),
rexact AS (
  SELECT e.vec_id FROM e, rq WHERE e.vec_id <> 0
  ORDER BY {_sql_cosq('e.v', 'rq.qv', 1_000_000)} DESC, e.vec_id LIMIT 10)"""
    )
    sels = []
    for r in _RERANK_BANDS:
        parts.append(
            f""",
band{r} AS (SELECT vec_id FROM adc ORDER BY adc_q6 DESC, vec_id LIMIT {r}),
rr{r} AS (
  SELECT e.vec_id FROM e JOIN band{r} USING (vec_id), rq
  ORDER BY {_sql_cosq('e.v', 'rq.qv', 1_000_000)} DESC, e.vec_id LIMIT 10)"""
        )
        sels.append(
            f"SELECT {r} AS band_r, CAST(count(*) AS BIGINT) AS n_overlap"
            f" FROM rr{r} JOIN rexact USING (vec_id)"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sels) + "\nORDER BY band_r"


@register("rerank_band_curve", _rerank_curve_sql())
def rerank_band_curve(spark, sf_dir):
    """Refine-band tuning curve: recall@10 of the IVF+PQ→exact-rerank
    stack at R = 10/25/50 — the R knob ann_ivfpq_rerank documents,
    actually swept (the nprobe-curve treatment for the refine stage).
    Recall is monotone in R by construction: the ADC bands nest, so a
    true neighbor surviving at R=10 survives every wider band — the
    property suite asserts it. Where the curve flattens tells you the
    remaining loss is coarse-cell misses (raise nprobe), not band
    truncation (raise R) — the two knobs separate HERE.

    Scale shape: ONE ADC scan ranks the candidates; each band is a
    ≤R-row broadcast into the vec_id-sorted vector table (min/max
    prunable scan), each rerank a ≤R-row TakeOrdered."""
    outs = []
    for r in _RERANK_BANDS:
        cand = _ivfpq_adc_topk(spark, sf_dir, k=r).select("vec_id")
        e = _emb(spark, sf_dir).select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
        qv = e.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
        rr = (
            e.join(F.broadcast(cand), "vec_id")
            .crossJoin(F.broadcast(qv))
            .select("vec_id", _cosq("v", "qv", 1_000_000).alias("cos_q6"))
            .orderBy(F.desc("cos_q6"), F.asc("vec_id"))
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
        outs.append(
            rr.join(exact, "vec_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
            .select(F.lit(r).cast("long").alias("band_r"), "n_overlap")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("band_r")


# ---------------------------------------------------------------------------
# session 82 — retrieval-model agreement, kNN confusion matrix, region
# market census
# ---------------------------------------------------------------------------


@register(
    "bm25_pl2_overlap",
    _bm25_agg_ctes(_PL2_TERMS)
    + f""",
btop AS (SELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
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
ptop AS (SELECT doc_id FROM pagg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10)
SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_overlap
FROM btop JOIN ptop USING (doc_id)""",
)
def bm25_pl2_overlap(spark, sf_dir):
    """Retrieval-model agreement: overlap of the BM25 and DFR-PL2 top-10
    pages for the same query — the cheap ensemble-worthiness probe (two
    models that return the same 10 docs fuse to nothing; low overlap is
    where hybrid_rrf-style fusion buys recall). Both rankings use
    identical tokenize/tf/df plumbing, so the overlap isolates the
    MODEL difference, not pipeline noise.

    Determinism: both legs rank over quantized scores with the doc_id
    tiebreak; the overlap is an exact 10×10 join.

    Scale shape: the BM25 leg is the memoized match set; the PL2 leg
    shares tf's exchange; two TakeOrdereds and a 10-row join."""
    btop = (
        _bm25_match_set(spark, sf_dir, _PL2_TERMS)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id")
    )
    ptop = dfr_pl2_search(spark, sf_dir).select("doc_id")
    return (
        btop.join(ptop, "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        .select(F.lit(10).cast("long").alias("k"), "n_overlap")
    )


@register(
    "knn_label_confusion",
    _BATCH_SQL
    + """,
lb AS (SELECT vec_id, label FROM embeddings),
nb AS (SELECT qid, vec_id FROM btop WHERE rnk <= 10 AND vec_id <> qid),
cnt AS (SELECT nb.qid, ql.label AS qlabel, nl.label AS nlabel,
               CAST(count(*) AS BIGINT) AS c
        FROM nb JOIN lb ql ON ql.vec_id = nb.qid
        JOIN lb nl ON nl.vec_id = nb.vec_id
        GROUP BY nb.qid, ql.label, nl.label),
pred AS (SELECT qid, qlabel, nlabel AS pred FROM (
           SELECT qid, qlabel, nlabel,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY c DESC, nlabel ASC) AS rn
           FROM cnt) WHERE rn = 1)
SELECT CAST(qlabel AS BIGINT) AS true_label, CAST(pred AS BIGINT) AS pred_label,
       CAST(count(*) AS BIGINT) AS n_queries
FROM pred GROUP BY qlabel, pred ORDER BY true_label, pred_label""",
)
def knn_label_confusion(spark, sf_dir):
    """The kNN classifier's confusion matrix: each batch query predicts
    the MAJORITY label of its 10 IVF neighbors (ties to the smaller
    label), tabulated against its true label — ann_label_purity gives
    the per-class rate, THIS says which classes leak into which (the
    actionable half: merge the confusable labels or mine hard
    negatives across exactly that pair). Queries whose probed cells
    contain only themselves have no neighbors and drop out — the
    matrix row count says how many actually voted.

    Determinism: majority = map-side max(struct(count, -label)) per
    query in Spark (oracle windows); matrix counts exact.

    Scale shape: neighbor lists are 10 rows/query; the vote agg and
    matrix rollup are query-batch-sized."""
    top = _ivf_batch_topk(spark, sf_dir)
    lb = _emb(spark, sf_dir).select("vec_id", "label")
    nb = top.where(F.col("vec_id") != F.col("qid")).select("qid", "vec_id")
    ql = lb.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    nl = lb.select("vec_id", F.col("label").alias("nlabel"))
    cnt = (
        nb.join(ql, "qid")
        .join(nl, "vec_id")
        .groupBy("qid", "qlabel", "nlabel")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pred = (
        cnt.groupBy("qid", "qlabel")
        .agg(
            F.max(
                F.struct(F.col("c"), (-F.col("nlabel")).alias("nl"))
            ).alias("t")
        )
        .select("qlabel", (-F.col("t.nl")).alias("pred"))
    )
    return (
        pred.groupBy("qlabel", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
        .select(
            F.col("qlabel").cast("long").alias("true_label"),
            F.col("pred").cast("long").alias("pred_label"),
            "n_queries",
        )
        .orderBy("true_label", "pred_label")
    )


@register(
    "region_market_census",
    """WITH n AS (SELECT n_nationkey, n_regionkey FROM nation),
c AS (SELECT c_nationkey, CAST(round(100 * c_acctbal) AS BIGINT) AS bal
      FROM customer),
s AS (SELECT s_nationkey, CAST(round(100 * s_acctbal) AS BIGINT) AS bal
      FROM supplier),
cn AS (SELECT n.n_regionkey AS rk, CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(c.bal) AS BIGINT) AS cust_bal_c
       FROM c JOIN n ON n.n_nationkey = c.c_nationkey GROUP BY rk),
sn AS (SELECT n.n_regionkey AS rk, CAST(count(*) AS BIGINT) AS n_suppliers,
              CAST(sum(s.bal) AS BIGINT) AS supp_bal_c
       FROM s JOIN n ON n.n_nationkey = s.s_nationkey GROUP BY rk),
nn AS (SELECT n_regionkey AS rk, CAST(count(*) AS BIGINT) AS n_nations
       FROM n GROUP BY rk)
SELECT r.r_name AS region, nn.n_nations,
       CAST(COALESCE(cn.n_customers, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(cn.cust_bal_c, 0) AS BIGINT) AS cust_bal_c,
       CAST(COALESCE(sn.n_suppliers, 0) AS BIGINT) AS n_suppliers,
       CAST(COALESCE(sn.supp_bal_c, 0) AS BIGINT) AS supp_bal_c
FROM region r JOIN nn ON nn.rk = r.r_regionkey
LEFT JOIN cn ON cn.rk = r.r_regionkey
LEFT JOIN sn ON sn.rk = r.r_regionkey
ORDER BY region""",
)
def region_market_census(spark, sf_dir):
    """Region-level market rollup of the full dimension star: nations,
    customers and suppliers per region with exact account-balance
    totals — the top-of-the-snowflake census (region is the one table
    nothing else summarises). Balances in exact cents (Q1 rule;
    negative balances sum correctly).

    Scale shape: nation (25 rows) broadcasts into both fact-side scans;
    region (5 rows) broadcasts into the final rollup; every agg output
    is ≤|regions| rows."""
    n = F.broadcast(
        spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_regionkey"
        )
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_nationkey", F.expr("CAST(round(100 * c_acctbal) AS BIGINT)").alias("bal")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_nationkey", F.expr("CAST(round(100 * s_acctbal) AS BIGINT)").alias("bal")
    )
    cn = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("bal").cast("long").alias("cust_bal_c"),
        )
    )
    sn = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("bal").cast("long").alias("supp_bal_c"),
        )
    )
    nn = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nations"))
    )
    r = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    return (
        r.join(nn, r["r_regionkey"] == nn["n_regionkey"])
        .drop("n_regionkey")
        .join(
            cn.withColumnRenamed("n_regionkey", "crk"),
            F.col("r_regionkey") == F.col("crk"),
            "left",
        )
        .join(
            sn.withColumnRenamed("n_regionkey", "srk"),
            F.col("r_regionkey") == F.col("srk"),
            "left",
        )
        .select(
            "region",
            "n_nations",
            F.coalesce("n_customers", F.lit(0)).cast("long").alias("n_customers"),
            F.coalesce("cust_bal_c", F.lit(0)).cast("long").alias("cust_bal_c"),
            F.coalesce("n_suppliers", F.lit(0)).cast("long").alias("n_suppliers"),
            F.coalesce("supp_bal_c", F.lit(0)).cast("long").alias("supp_bal_c"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# session 83 — Bloom user estimate (streaming-twinned), event-type user
# overlap matrix
# ---------------------------------------------------------------------------


@register(
    "bloom_user_estimate",
    """WITH pos AS (
  SELECT DISTINCT p FROM (
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::INT AS p FROM events
    UNION ALL
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 5, 4))::INT FROM events
    UNION ALL
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 4))::INT FROM events
    UNION ALL
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 13, 4))::INT FROM events)),
t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM pos),
ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events)
SELECT t.t AS n_set_bits,
       CASE WHEN t.t >= 65536 THEN CAST(-1 AS BIGINT)
            ELSE CAST(round(-16384e0 * ln(1e0 - CAST(t.t AS DOUBLE) / 65536e0))
                 AS BIGINT) END AS est_users,
       ex.n AS n_exact_users
FROM t CROSS JOIN ex""",
)
def bloom_user_estimate(spark, sf_dir):
    """Bloom-filter cardinality estimate of distinct users: k=4 16-bit
    md5-slice positions into an m=2^16 filter (the decontamination_bloom
    construction pointed at users), the set-bit count t, and the
    standard swamidass-baldi estimate n̂ = −(m/k)·ln(1 − t/m) beside the
    exact count. This is the SUMMARY twin of the streaming-maintained
    bit table (streaming/events.py bloom_user_stream — Bloom bits
    OR-merge, the fourth mergeable-state flavor): the stream keeps the
    bits, this op reads them into one number. A saturated filter
    (t = m) emits the −1 sentinel.

    Determinism: positions are exact integer hash slices; the estimate
    is one ln over an exact ratio with folded e-notation constants.

    Scale shape: the position set is a ≤65 536-row distinct (map-side
    partials); the exact count is the usual two-phase distinct; both
    censuses are 1-row."""
    ev = _events(spark, sf_dir)
    slices = ", ".join(
        f"cast(conv(substring(md5(cast(user_id as string)), {s}, 4), 16, 10) as int)"
        for s in (1, 5, 9, 13)
    )
    pos = ev.select(F.explode(F.expr(f"array({slices})")).alias("p")).distinct()
    t = pos.agg(F.count(F.lit(1)).cast("long").alias("t"))
    ex = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    return t.crossJoin(ex).select(
        F.col("t").alias("n_set_bits"),
        F.expr(
            "CASE WHEN t >= 65536 THEN CAST(-1 AS BIGINT)"
            " ELSE CAST(round(-16384e0 * ln(1e0 - CAST(t AS DOUBLE) / 65536e0))"
            " AS BIGINT) END"
        ).alias("est_users"),
        F.col("n").alias("n_exact_users"),
    )


@register(
    "event_type_user_overlap",
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        FROM ut GROUP BY event_type),
pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              CAST(count(*) AS BIGINT) AS n_both
       FROM ut a JOIN ut b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
       GROUP BY a.event_type, b.event_type)
SELECT pr.type_a, pr.type_b, ta.n_users AS n_users_a, tb.n_users AS n_users_b,
       pr.n_both,
       CAST((1000000 * pr.n_both) // (ta.n_users + tb.n_users - pr.n_both)
            AS BIGINT) AS jaccard_q6
FROM pr JOIN tot ta ON ta.event_type = pr.type_a
JOIN tot tb ON tb.event_type = pr.type_b
ORDER BY type_a, type_b""",
)
def event_type_user_overlap(spark, sf_dir):
    """User-base overlap between event types: for each type pair, how
    many users do BOTH, with the Jaccard of the two audiences — the
    audience-segmentation matrix behind "do purchasers also click"
    (event_type_lift measures co-occurrence strength per basket; this
    measures user-base containment). Pairs with zero shared users drop
    out — observed pairs only, identical in both engines.

    Determinism: exact distinct counts; Jaccard is integer division
    over the inclusion-exclusion union.

    Scale shape: the per-user type-set join is bounded by
    |types|²/user (the event_type_lift self-join rule); totals are
    |types| rows broadcast back."""
    ut = (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint()  # totals + both pair sides consume it
    )
    tot = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pr = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ta = F.broadcast(
        tot.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_users_a"))
    )
    tb = F.broadcast(
        tot.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_users_b"))
    )
    return (
        pr.join(ta, "type_a")
        .join(tb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_users_a",
            "n_users_b",
            "n_both",
            F.expr(
                "CAST((1000000 * n_both) div (n_users_a + n_users_b - n_both)"
                " AS BIGINT)"
            ).alias("jaccard_q6"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# session 84 — order status×month matrix, char-class source profile,
# ANN neighborhood-margin histogram
# ---------------------------------------------------------------------------


@register(
    "order_status_month_matrix",
    """WITH o AS (
  SELECT month(CAST(o_orderdate AS TIMESTAMP)) AS mon, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders)
SELECT CAST(mon AS BIGINT) AS mon, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM o GROUP BY mon, o_orderstatus ORDER BY mon, o_orderstatus""",
)
def order_status_month_matrix(spark, sf_dir):
    """Order-status mix by calendar month — the fulfilment-health matrix
    (a month whose open-order share climbs is a backlog forming;
    orders_month_seasonality shows the volume wave, THIS shows what
    state that volume is in). Observed cells only, exact cents.

    Scale shape: one map-side month/status projection into a
    ≤12×|statuses| agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("month(CAST(o_orderdate AS TIMESTAMP))").alias("mon"),
        "o_orderstatus",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        o.groupBy("mon", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            F.col("mon").cast("long").alias("mon"),
            "o_orderstatus",
            "n_orders",
            "revenue_cents",
        )
        .orderBy("mon", "o_orderstatus")
    )


@register(
    "charclass_profile_source",
    """WITH d AS (
  SELECT source, CAST(length(text) AS BIGINT) AS n,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS a,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS g,
         CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
              AS BIGINT) AS s
  FROM documents),
ag AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_chars,
              CAST(sum(a) AS BIGINT) AS alpha, CAST(sum(g) AS BIGINT) AS digit,
              CAST(sum(s) AS BIGINT) AS space
       FROM d GROUP BY source)
SELECT source, n_chars,
       CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * alpha) // n_chars AS BIGINT) END AS alpha_q6,
       CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * digit) // n_chars AS BIGINT) END AS digit_q6,
       CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * space) // n_chars AS BIGINT) END AS space_q6,
       CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * (n_chars - alpha - digit - space)) // n_chars
                 AS BIGINT) END AS other_q6
FROM ag ORDER BY source""",
)
def charclass_profile_source(spark, sf_dir):
    """Character-class composition per source: letter/digit/space/other
    shares of the RAW text — the cheapest markup/structure detector in
    the quality family (tables and code push 'other' up, number dumps
    push digits, prose sits near English's ~15% space share). Counts
    use the delete-and-measure idiom (length minus class-stripped
    length — the pii_scrub_stats formula); DuckDB regexp_replace needs
    the explicit 'g' flag, Spark is global by default (the
    code_subtokens rule).

    Scale shape: three map-side regexp counters per doc, a ≤|sources|
    agg, integer share divisions."""
    d = _docs(spark, sf_dir).select(
        "source",
        F.length("text").cast("long").alias("n"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
        ).cast("long").alias("a"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).cast("long").alias("g"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[ ]", ""))
        ).cast("long").alias("s"),
    )
    ag = d.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_chars"),
        F.sum("a").cast("long").alias("alpha"),
        F.sum("g").cast("long").alias("digit"),
        F.sum("s").cast("long").alias("space"),
    )
    share = (
        "CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)"
        " ELSE CAST((1000000 * {x}) div n_chars AS BIGINT) END"
    )
    return ag.select(
        "source",
        "n_chars",
        F.expr(share.format(x="alpha")).alias("alpha_q6"),
        F.expr(share.format(x="digit")).alias("digit_q6"),
        F.expr(share.format(x="space")).alias("space_q6"),
        F.expr(share.format(x="(n_chars - alpha - digit - space)")).alias(
            "other_q6"
        ),
    ).orderBy("source")


@register(
    "ann_margin_histogram",
    _BATCH_SQL
    + """,
mg AS (SELECT qid,
              CAST(max(CASE WHEN rnk = 1 THEN cos_q6 END) AS BIGINT) AS c1,
              CAST(max(CASE WHEN rnk = 10 THEN cos_q6 END) AS BIGINT) AS c10
       FROM btop WHERE rnk <= 10 GROUP BY qid),
bk AS (SELECT (c1 - c10) // 100000 AS bucket FROM mg WHERE c10 IS NOT NULL)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_queries
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def ann_margin_histogram(spark, sf_dir):
    """ANN neighborhood-margin distribution: per batch query, the gap
    between its best and its 10th-best cosine (the 'how separated is
    the answer' margin), bucketed at 0.1 — the query-difficulty audit
    for vector search (tight margins mean quantization flips ranks and
    recall knobs matter; wide margins mean even coarse ADC suffices).
    Queries with fewer than 10 in-cell candidates drop out — their
    margin is undefined.

    Determinism: both endpoints are the quantized cosines the batch op
    already ranks; the margin and bucket are exact integer ops
    (nonnegative since rank 1 ≥ rank 10).

    Scale shape: one ≤10-rows-per-query agg over the batch top-k, a
    ≤21-bucket rollup."""
    top = _ivf_batch_topk(spark, sf_dir)
    mg = top.groupBy("qid").agg(
        F.max(F.when(F.col("rnk") == 1, F.col("cos_q6"))).alias("c1"),
        F.max(F.when(F.col("rnk") == 10, F.col("cos_q6"))).alias("c10"),
    )
    bk = mg.where(F.col("c10").isNotNull()).select(
        F.expr("(c1 - c10) div 100000").alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
        .select(F.col("bucket").cast("long").alias("bucket"), "n_queries")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 85 — traffic dispersion index, segment repeat rate, terms-enum
# paging
# ---------------------------------------------------------------------------


@register(
    "events_dispersion_index",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
m AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mn
      FROM f),
cs AS (SELECT m.nd AS n, m.s AS s,
              CAST(sum(f.n - m.mn) AS BIGINT) AS syc,
              CAST(sum((f.n - m.mn) * (f.n - m.mn)) AS BIGINT) AS syy
       FROM f CROSS JOIN m GROUP BY m.nd, m.s)
SELECT n AS n_days, s AS n_events,
       CAST(round(1000000 * (CAST(s AS DOUBLE) / n)) AS BIGINT) AS mean_q6,
       {_SEG_VAR} AS var_q6,
       CASE WHEN s = 0 OR n < 2 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (((CAST(n AS DOUBLE) * syy
                 - CAST(syc AS DOUBLE) * syc) / (CAST(n AS DOUBLE) * n))
                 / (CAST(s AS DOUBLE) / n))) AS BIGINT) END AS fano_q6
FROM cs""",
)
def events_dispersion_index(spark, sf_dir):
    """Fano factor (variance-to-mean dispersion index) of daily event
    counts over the zero-filled calendar — the one-number burstiness
    verdict (a Poisson arrival stream sits at 1; campaign-driven
    traffic overdisperses ≫1; rate-limited pipelines underdisperse
    < 1). Reads next to events_cusum_anomaly: CUSUM finds WHERE the
    level shifted, Fano says whether shifts are the norm.

    Determinism: centered-BIGINT variance (the _SEG_VAR machinery on
    day counts), then ONE shared float expression for the ratio;
    degenerate slates (empty stream, single day) emit the 0 sentinel.

    Scale shape: one day groupBy over events; everything after runs on
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
        .select(F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .localCheckpoint()
    )
    m = f.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s"),
        F.expr(
            "CAST(sum(n) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mn"),
    )
    cs = (
        f.crossJoin(F.broadcast(m))
        .groupBy("nd", "s")
        .agg(
            F.sum(F.col("n") - F.col("mn")).cast("long").alias("syc"),
            F.sum((F.col("n") - F.col("mn")) * (F.col("n") - F.col("mn")))
            .cast("long")
            .alias("syy"),
        )
        .withColumnRenamed("nd", "n")
    )
    return cs.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("n_events"),
        F.expr(
            "CAST(round(1000000 * (CAST(s AS DOUBLE) / n)) AS BIGINT)"
        ).alias("mean_q6"),
        F.expr(_SEG_VAR).alias("var_q6"),
        F.expr(
            "CASE WHEN s = 0 OR n < 2 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (((CAST(n AS DOUBLE) * syy"
            " - CAST(syc AS DOUBLE) * syc) / (CAST(n AS DOUBLE) * n))"
            " / (CAST(s AS DOUBLE) / n))) AS BIGINT) END"
        ).alias("fano_q6"),
    )


@register(
    "segment_repeat_rate",
    """WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders
  GROUP BY o_custkey),
j AS (SELECT c.c_mktsegment, oc.n_orders
      FROM oc JOIN customer c ON c.c_custkey = oc.o_custkey)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_buyers,
       CAST(COALESCE(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_repeat,
       CAST((1000000 * COALESCE(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END), 0))
            // count(*) AS BIGINT) AS repeat_rate_q6,
       CAST(sum(n_orders) AS BIGINT) AS n_orders
FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""",
)
def segment_repeat_rate(spark, sf_dir):
    """Repeat-buyer rate per market segment: of the customers who
    ordered at all, how many came back — the retention cut of
    segment_value_stats (value says how big the orders are; THIS says
    whether the relationship repeats; RFM slices the same question at
    customer grain). One-time-buyer-heavy segments are acquisition
    channels, repeat-heavy ones are the book of business.

    Determinism: exact counts, one integer share division.

    Scale shape: the per-customer order count is one custkey agg; the
    customer join is un-hinted; the segment rollup is ≤|segments|."""
    oc = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    j = oc.join(c, oc["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "n_orders"
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buyers"),
            F.coalesce(
                F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_repeat"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
        .select(
            "c_mktsegment",
            "n_buyers",
            "n_repeat",
            F.expr(
                "CAST((1000000 * n_repeat) div n_buyers AS BIGINT)"
            ).alias("repeat_rate_q6"),
            "n_orders",
        )
        .orderBy("c_mktsegment")
    )


_ENUM_PREFIX = ""  # enumerate the whole dictionary ('' = LIKE '%')
_ENUM_AFTER = "group"  # keyset cursor: strictly-after this term (page 2+)


@register(
    "terms_enum_page",
    f"""WITH tf AS ({SQL_TF}),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
pg AS (SELECT term, df FROM dict
       WHERE term LIKE '{_ENUM_PREFIX}%' AND term > '{_ENUM_AFTER}'
       ORDER BY term ASC LIMIT 10)
SELECT term, df,
       CAST(row_number() OVER (ORDER BY term ASC) AS BIGINT) AS rank
FROM pg ORDER BY rank""",
)
def terms_enum_page(spark, sf_dir):
    """ES ``_terms_enum`` API page: dictionary terms under a prefix,
    resumed via a keyset cursor (term > last-seen), 10 per page — the
    index-backed autocomplete/discovery walk over the TERM dictionary
    rather than documents (suggest_completion ranks by popularity;
    this enumerates lexicographically with df attached, the shape the
    ES API returns). The cursor is a predicate, so every page costs
    one dictionary range scan — the search_after argument applied to
    the dictionary.

    Determinism: pure string comparisons and exact df.

    Scale shape: the dictionary agg is vocab-bounded; the LIKE-prefix +
    cursor predicates push into the scan (a sorted term dictionary
    serves this from one range); TakeOrdered 10."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dic = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    pg = (
        dic.where(
            F.col("term").startswith(_ENUM_PREFIX)
            & (F.col("term") > _ENUM_AFTER)
        )
        .orderBy(F.asc("term"))
        .limit(10)
    )
    return pg.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.asc("term"))).cast("long")
    ).select("term", "df", "rank")


# ---------------------------------------------------------------------------
# session 86 — light-stemmer vocab reduction, join-key skew census,
# case-folding impact
# ---------------------------------------------------------------------------

# S-stemmer-plus (Harman's light English stemmer + -ing/-ed): ONE shared
# CASE over the term string, identical string ops in both engines. Rule
# order matters and is part of the contract.
_SSTEM_CASE = (
    "CASE WHEN length(term) > 5 AND term LIKE '%ing'"
    " THEN substr(term, 1, length(term) - 3)"
    " WHEN length(term) > 4 AND term LIKE '%ed'"
    " THEN substr(term, 1, length(term) - 2)"
    " WHEN length(term) > 3 AND term LIKE '%es'"
    " THEN substr(term, 1, length(term) - 2)"
    " WHEN length(term) > 3 AND term LIKE '%s' AND term NOT LIKE '%ss'"
    " THEN substr(term, 1, length(term) - 1)"
    " ELSE term END"
)


@register(
    "sstem_vocab_reduction",
    f"""WITH t AS ({SQL_TOKS}),
st AS (SELECT term, {_SSTEM_CASE} AS stem FROM t)
SELECT CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT term) AS BIGINT) AS n_types_raw,
       CAST(count(DISTINCT stem) AS BIGINT) AS n_types_stemmed,
       CAST(count(DISTINCT term) - count(DISTINCT stem) AS BIGINT) AS types_merged,
       CASE WHEN count(DISTINCT term) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * (count(DISTINCT term) - count(DISTINCT stem)))
                 // count(DISTINCT term) AS BIGINT) END AS reduction_q6
FROM st""",
)
def sstem_vocab_reduction(spark, sf_dir):
    """Light-stemmer impact audit: vocabulary size before and after the
    S-stemmer-plus rules (-ing/-ed/-es/-s with length guards, the
    Harman 1991 family Lucene ships as EnglishMinimalStemFilter) — the
    analyzer-pipeline decision table: each merged type is a postings
    list the index no longer stores AND a recall conflation risk
    ('was' issues aside, 'joins'→'join' is why stemmed indexes shrink
    ~20% on English). The stem rule is ONE shared CASE expression —
    rule ORDER is part of the contract ('goes' must hit -es before -s).

    Determinism: pure string ops; distincts exact.

    Scale shape: one map-side CASE over the token stream, three
    two-phase distincts in a single 1-row agg."""
    t = _toks(_docs(spark, sf_dir)).select(
        "term", F.expr(_SSTEM_CASE).alias("stem")
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types_raw"),
        F.countDistinct("stem").cast("long").alias("n_types_stemmed"),
        (F.countDistinct("term") - F.countDistinct("stem"))
        .cast("long")
        .alias("types_merged"),
        F.expr(
            "CASE WHEN count(DISTINCT term) = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * (count(DISTINCT term) - count(DISTINCT stem)))"
            " div count(DISTINCT term) AS BIGINT) END"
        ).alias("reduction_q6"),
    )


def _skew_leg_sql(key_name: str, table: str, col: str) -> str:
    return f"""SELECT '{key_name}' AS join_key,
       CAST(sum(c) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_rows_per_key,
       CAST((1000000 * max(c)) // sum(c) AS BIGINT) AS top_share_q6
FROM (SELECT {col}, CAST(count(*) AS BIGINT) AS c FROM {table} GROUP BY {col})"""


@register(
    "fact_key_skew_census",
    _skew_leg_sql("lineitem.l_orderkey", "lineitem", "l_orderkey")
    + "\nUNION ALL\n"
    + _skew_leg_sql("lineitem.l_suppkey", "lineitem", "l_suppkey")
    + "\nUNION ALL\n"
    + _skew_leg_sql("orders.o_custkey", "orders", "o_custkey")
    + "\nORDER BY join_key",
)
def fact_key_skew_census(spark, sf_dir):
    """Join-key skew census of the fact tables: rows, distinct keys,
    the heaviest key's row count and share for every key the star-
    schema queries shuffle on — THE pre-flight diagnostic for AQE
    skew-join tuning (a key holding >1% of a 100 TB fact table is the
    straggler every suppkey/custkey join will hit; salting and
    `skewJoin.skewedPartitionFactor` decisions start from exactly this
    table, the way shard_token_balance reads the doc side).

    Determinism: exact counts, integer share division.

    Scale shape: one map-side-combinable groupBy per key (the count
    table is |keys| rows), a 1-row census per leg, a 3-row union."""
    legs = [
        (
            "lineitem.l_orderkey",
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            "l_orderkey",
        ),
        (
            "lineitem.l_suppkey",
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            "l_suppkey",
        ),
        (
            "orders.o_custkey",
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            "o_custkey",
        ),
    ]
    outs = []
    for name, df, col in legs:
        c = df.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        outs.append(
            c.agg(
                F.sum("c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("c").cast("long").alias("max_rows_per_key"),
            ).select(
                F.lit(name).alias("join_key"),
                "n_rows",
                "n_keys",
                "max_rows_per_key",
                F.expr(
                    "CAST((1000000 * max_rows_per_key) div n_rows AS BIGINT)"
                ).alias("top_share_q6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("join_key")


@register(
    "casefold_impact",
    """WITH t AS (
  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS tok FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sum(CASE WHEN tok <> lower(tok) THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_cased,
       CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * COALESCE(sum(CASE WHEN tok <> lower(tok)
                 THEN 1 ELSE 0 END), 0)) // count(*) AS BIGINT) END AS cased_q6,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types_cased,
       CAST(count(DISTINCT lower(tok)) AS BIGINT) AS n_types_folded
FROM t""",
)
def casefold_impact(spark, sf_dir):
    """Case-folding impact audit: how many RAW tokens carry uppercase
    (and how many distinct types collapse when lowercased) — the
    analyzer stage the engine applies unconditionally (tokenizer.py
    lowercases first), measured for what it destroys: acronym/proper-
    noun signal ('US' vs 'us') against the recall it buys. The sandbox
    corpus is all-lowercase so the live counters read 0 — CORRECT (the
    pii_scrub_stats precedent); the injected-case pytest proves them.

    Scale shape: map-side extraction + one 1-row agg with two
    two-phase distincts."""
    # NOTE: Spark's regexp_extract_all defaults the group index to 1 and
    # ERRORS on a group-less pattern — group 0 must be explicit (DuckDB
    # defaults to 0; both engines accept the explicit form).
    t = _docs(spark, sf_dir).select(
        F.explode(
            F.expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)")
        ).alias("tok")
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("tok") != F.lower("tok"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_cased"),
        F.expr(
            "CASE WHEN count(1) = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * COALESCE(sum(CASE WHEN tok <> lower(tok)"
            " THEN 1 ELSE 0 END), 0)) div count(1) AS BIGINT) END"
        ).alias("cased_q6"),
        F.countDistinct("tok").cast("long").alias("n_types_cased"),
        F.countDistinct(F.lower("tok")).cast("long").alias("n_types_folded"),
    )


# ---------------------------------------------------------------------------
# session 87 — deflated second principal direction, orders weekday
# profile, props key census
# ---------------------------------------------------------------------------


def _pca2_sql() -> str:
    """Generated oracle: the PI chain through v3 (first direction), the
    Hotelling deflation x₂ = x − (x·v₁/‖v₁‖²)v₁ as ONE shared float
    expression into a MATERIALIZED q6 matrix, a SECOND full PI chain
    (q-prefixed CTEs) over the deflated matrix, and the two Rayleigh
    shares against the ORIGINAL trace."""
    chain = _poweriter_sql(_PI_ITERS)
    chain = chain[: chain.rindex("SELECT CAST(dim AS BIGINT)")].rstrip()
    if chain.endswith(","):
        chain = chain[:-1]
    parts = [
        chain,
        f""",
s4 AS MATERIALIZED (SELECT xq.vec_id, CAST(sum(xq.x * vv.v) AS BIGINT) AS s
  FROM xq JOIN v{_PI_ITERS} vv USING (dim) GROUP BY xq.vec_id),
vv1n AS (SELECT CAST(COALESCE(sum(v * v), 0) AS BIGINT) AS vv FROM v{_PI_ITERS}),
xq2 AS MATERIALIZED (
  SELECT xq.vec_id, xq.dim,
         CAST(round(CAST(xq.x AS DOUBLE) - CASE WHEN vv1n.vv = 0 THEN 0e0
              ELSE (CAST(s4.s AS DOUBLE) / vv1n.vv) * v3c.v END) AS BIGINT) AS x
  FROM xq JOIN s4 USING (vec_id) JOIN v{_PI_ITERS} v3c USING (dim)
  CROSS JOIN vv1n),
qv0 AS (SELECT dim, CAST(50000 + 3000 * dim AS BIGINT) AS v
  FROM (SELECT unnest(generate_series(0, 63)) AS dim))""",
    ]
    for t in range(1, _PI_ITERS + 1):
        parts.append(
            f""",
qs{t} AS MATERIALIZED (SELECT xq2.vec_id, CAST(sum(xq2.x * vv.v) AS BIGINT) AS s
  FROM xq2 JOIN qv{t - 1} vv USING (dim) GROUP BY xq2.vec_id),
qu{t} AS MATERIALIZED (SELECT vec_id, {_PI_U} AS u FROM qs{t}),
qw{t} AS MATERIALIZED (SELECT xq2.dim, CAST(sum(xq2.x * uu.u) AS BIGINT) AS w
  FROM xq2 JOIN qu{t} uu USING (vec_id) GROUP BY xq2.dim),
qm{t} AS (SELECT CAST(max(abs(w)) AS BIGINT) AS mx FROM qw{t}),
qws{t} AS MATERIALIZED (SELECT dim, {_PI_WS} AS ws FROM qw{t}, qm{t}),
qn{t} AS (SELECT CAST(COALESCE(sum(ws * ws), 0) AS BIGINT) AS n2 FROM qws{t}),
qv{t} AS MATERIALIZED (SELECT dim, {_PI_V} AS v FROM qws{t}, qn{t})""",
        )
    parts.append(
        f""",
s5 AS MATERIALIZED (SELECT xq2.vec_id, CAST(sum(xq2.x * vv.v) AS BIGINT) AS s
  FROM xq2 JOIN qv{_PI_ITERS} vv USING (dim) GROUP BY xq2.vec_id),
u4 AS (SELECT vec_id, {_PI_U} AS u FROM s4),
u5 AS (SELECT vec_id, {_PI_U} AS u FROM s5),
vv2n AS (SELECT CAST(COALESCE(sum(v * v), 0) AS BIGINT) AS vv FROM qv{_PI_ITERS}),
tt AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS t FROM xq GROUP BY vec_id),
ag AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(COALESCE(sum((u4.u * u4.u) // 1000000), 0) AS BIGINT) AS sa1,
              CAST(COALESCE(sum((u5.u * u5.u) // 1000000), 0) AS BIGINT) AS sa2,
              CAST(COALESCE(sum(tt.t // 1000000), 0) AS BIGINT) AS st6
       FROM tt JOIN u4 USING (vec_id) JOIN u5 USING (vec_id))
SELECT n_vecs,
       CASE WHEN st6 = 0 OR vv1n.vv = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(sa1 AS DOUBLE) / st6)
                 * (1000000000000e0 / vv1n.vv))) AS BIGINT) END AS var1_q6,
       CASE WHEN st6 = 0 OR vv2n.vv = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(sa2 AS DOUBLE) / st6)
                 * (1000000000000e0 / vv2n.vv))) AS BIGINT) END AS var2_q6
FROM ag CROSS JOIN vv1n CROSS JOIN vv2n""",
    )
    return "".join(parts)


@register("embedding_pca2_share", _pca2_sql())
def embedding_pca2_share(spark, sf_dir):
    """Variance shares of the TOP TWO principal directions via Hotelling
    deflation: after power iteration finds v₁, every vector is deflated
    x₂ = x − (x·v₁/‖v₁‖²)v₁ (one shared float expression into a fresh
    q6 integer matrix) and the SAME power iteration runs again on the
    residual — v₂'s Rayleigh share against the ORIGINAL trace completes
    the eigengap reading embedding_isotropy starts (var1 ≫ var2 means
    one rogue direction — whiten it away; var1 ≈ var2 ≫ 1/d means a
    low-rank subspace — rotate, don't truncate).

    Determinism: both PI stages are the exact-integer _PI_* machinery;
    the deflation coefficient divides exact BIGINTs once per vector and
    the deflated components re-quantize to q6 — both engines run the
    identical expression; Rayleigh shares floor q12→q6 before summing
    (the isotropy rule) and correct by each direction's exact ‖v‖².

    Scale shape: per PI stage, matvecs are map-side with the direction
    as a 64-literal array (bounded collects); the deflated matrix is
    one map-side transform, checkpointed once; censuses are 1-row."""
    vrows = embedding_power_iteration(spark, sf_dir).orderBy("dim").collect()
    v1 = [int(r["v_q6"]) for r in vrows]
    vv1 = sum(x * x for x in v1)
    e = (
        _emb(spark, sf_dir)
        .select(
            F.expr(
                "transform(embedding, c -> CAST(round(1000000 * cast(c as double)) AS BIGINT))"
            ).alias("xarr")
        )
        .localCheckpoint()
    )
    v1lit = "array(" + ",".join(f"{int(x)}L" for x in v1) + ")"
    dot1 = (
        f"aggregate(zip_with(xarr, {v1lit}, (a, b) -> a * b), 0L,"
        " (acc, z) -> acc + z)"
    )
    if vv1 == 0:
        defl = "xarr"
    else:
        defl = (
            f"zip_with(xarr, {v1lit}, (x, v) -> CAST(round(CAST(x AS DOUBLE)"
            f" - (CAST(s AS DOUBLE) / {vv1}) * v) AS BIGINT))"
        )
    e2 = (
        e.select("xarr", F.expr(dot1).alias("s"))
        .select("xarr", F.expr(defl).alias("x2arr"), "s")
        .localCheckpoint()  # the second PI loop re-reads it per iteration
    )
    # second power iteration over the deflated matrix (the PI op's loop)
    v = [50000 + 3000 * d for d in range(64)]
    for _ in range(_PI_ITERS):
        vlit = "array(" + ",".join(f"{int(x)}L" for x in v) + ")"
        u = e2.select(
            "x2arr",
            F.expr(
                f"aggregate(zip_with(x2arr, {vlit}, (a, b) -> a * b), 0L,"
                " (acc, z) -> acc + z)"
            ).alias("s"),
        ).select("x2arr", F.expr(_PI_U).alias("u"))
        wdf = (
            u.select(F.posexplode("x2arr").alias("dim", "x"), "u")
            .groupBy("dim")
            .agg(F.sum(F.expr("x * u")).cast("long").alias("w"))
        )
        m = wdf.agg(F.max(F.abs(F.col("w"))).cast("long").alias("mx"))
        ws = wdf.crossJoin(F.broadcast(m)).select(
            "dim", F.expr(_PI_WS).alias("ws")
        )
        n2 = ws.agg(
            F.coalesce(F.sum(F.expr("ws * ws")), F.lit(0))
            .cast("long")
            .alias("n2")
        )
        out = ws.crossJoin(F.broadcast(n2)).select(
            "dim", F.expr(_PI_V).alias("v_q6")
        )
        v = [
            int(r["v_q6"]) for r in out.orderBy("dim").collect()
        ]  # bounded 64-row collect
    v2, vv2 = v, sum(x * x for x in v)
    v2lit = "array(" + ",".join(f"{int(x)}L" for x in v2) + ")"
    per = e2.select(
        F.expr(_PI_U).alias("u1"),  # s is still the v1 dot
        F.expr(
            f"CAST(round(aggregate(zip_with(x2arr, {v2lit}, (a, b) -> a * b),"
            " 0L, (acc, z) -> acc + z) / 1000000.0) AS BIGINT)"
        ).alias("u2"),
        F.expr(
            "aggregate(zip_with(xarr, xarr, (a, b) -> a * b), 0L,"
            " (acc, z) -> acc + z)"
        ).alias("t"),
    )
    ag = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.coalesce(F.sum(F.expr("(u1 * u1) div 1000000")), F.lit(0))
        .cast("long")
        .alias("sa1"),
        F.coalesce(F.sum(F.expr("(u2 * u2) div 1000000")), F.lit(0))
        .cast("long")
        .alias("sa2"),
        F.coalesce(F.sum(F.expr("t div 1000000")), F.lit(0))
        .cast("long")
        .alias("st6"),
    )
    def _share(sa: str, vv: int) -> F.Column:
        if vv == 0:
            return F.lit(0).cast("long")
        return F.expr(
            f"CASE WHEN st6 = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE CAST(round(1000000 * ((CAST({sa} AS DOUBLE) / st6)"
            f" * (1000000000000e0 / {vv}))) AS BIGINT) END"
        )
    return ag.select(
        "n_vecs",
        _share("sa1", vv1).alias("var1_q6"),
        _share("sa2", vv2).alias("var2_q6"),
    )


@register(
    "orders_weekday_profile",
    """WITH o AS (
  SELECT (epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 + 3) % 7 AS dow,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
d AS (SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS rc
      FROM o GROUP BY dow),
spine AS (SELECT unnest(generate_series(0, 6)) AS dow),
f AS (SELECT spine.dow, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_orders,
             CAST(COALESCE(d.rc, 0) AS BIGINT) AS revenue_cents
      FROM spine LEFT JOIN d USING (dow)),
t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS tot FROM f)
SELECT CAST(f.dow AS BIGINT) AS dow, f.n_orders, f.revenue_cents,
       CASE WHEN t.tot = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * f.revenue_cents) // t.tot AS BIGINT)
       END AS share_q6
FROM f CROSS JOIN t ORDER BY dow""",
)
def orders_weekday_profile(spark, sf_dir):
    """Day-of-week revenue profile of the order book (0 = Monday, the
    epoch-day +3 integer rule — never dayname()) — the orders twin of
    events_weekday_profile, with exact cents. B2B books go quiet on
    weekends; a flat profile here says the generator or the channel
    isn't calendar-driven.

    Scale shape: map-side day math, ≤7-group agg, 7-row spine."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr(
            "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 + 3) % 7"
        ).alias("dow"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    d = o.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("rc"),
    )
    spine = spark.range(7).select(F.col("id").alias("dow"))
    f = spine.join(d, "dow", "left").select(
        "dow",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("rc", F.lit(0)).cast("long").alias("revenue_cents"),
    )
    t = f.agg(F.sum("revenue_cents").cast("long").alias("tot"))
    return (
        f.crossJoin(F.broadcast(t))
        .select(
            F.col("dow").cast("long").alias("dow"),
            "n_orders",
            "revenue_cents",
            F.expr(
                "CASE WHEN tot = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * revenue_cents) div tot AS BIGINT) END"
            ).alias("share_q6"),
        )
        .orderBy("dow")
    )


@register(
    "props_key_census",
    """WITH k AS (
  SELECT event_type, unnest(json_keys(props)) AS key FROM events
  WHERE props IS NOT NULL)
SELECT event_type, key, CAST(count(*) AS BIGINT) AS n_events
FROM k GROUP BY event_type, key ORDER BY event_type, key""",
)
def props_key_census(spark, sf_dir):
    """Schema discovery over the semi-structured props payload: which
    JSON keys occur, per event type, how often — the first query anyone
    runs against an events firehose before writing extraction rules
    (events_props_json reads a KNOWN key; this finds the unknowns, and
    a key appearing on 0.1% of rows is either an experiment or a bug).

    Determinism: key enumeration is json_object_keys in Spark and
    json_keys in DuckDB — both return the object's own keys; counts
    exact.

    Scale shape: map-side key explode, one (type, key) agg — output
    bounded by the payload schema, not the stream."""
    k = (
        _events(spark, sf_dir)
        .where(F.col("props").isNotNull())
        .select(
            "event_type",
            F.explode(F.expr("json_object_keys(props)")).alias("key"),
        )
    )
    return (
        k.groupBy("event_type", "key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("event_type", "key")
    )


# ---------------------------------------------------------------------------
# session 88 — idf split stability, label-aware ANN MRR, erratic customers
# ---------------------------------------------------------------------------

# per-(half, term) BM25 idf, q6-rounded FIRST from exact integers
_IDF_Q6 = (
    "CAST(round(1000000 * ln(1e0 + (CAST(nh AS DOUBLE) - df + 5e-1)"
    " / (df + 5e-1))) AS BIGINT)"
)


@register(
    "idf_split_stability",
    f"""WITH t AS ({SQL_TOKS}),
h AS (SELECT doc_id % 2 AS half, doc_id, term FROM t),
dfh AS (SELECT half, term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM h GROUP BY half, term),
nh AS (SELECT half, CAST(count(DISTINCT doc_id) AS BIGINT) AS nh
       FROM h GROUP BY half),
idf AS (SELECT dfh.half, dfh.term, {_IDF_Q6} AS idf_q6
        FROM dfh JOIN nh USING (half)),
pr AS (SELECT a.term, a.idf_q6 AS x, b.idf_q6 AS y
       FROM idf a JOIN idf b ON a.term = b.term AND a.half = 0 AND b.half = 1),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mx,
             CAST(sum(y) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS my
      FROM pr),
cs AS (SELECT m.n AS n,
              CAST(sum(pr.x - m.mx) AS BIGINT) AS sxc,
              CAST(sum(pr.y - m.my) AS BIGINT) AS syc,
              CAST(sum((pr.x - m.mx) * (pr.x - m.mx)) AS BIGINT) AS sxx,
              CAST(sum((pr.y - m.my) * (pr.y - m.my)) AS BIGINT) AS syy,
              CAST(sum((pr.x - m.mx) * (pr.y - m.my)) AS BIGINT) AS sxy,
              CAST(COALESCE(sum(abs(pr.x - pr.y)), 0) AS BIGINT) AS sad
       FROM pr CROSS JOIN m GROUP BY m.n)
SELECT n AS n_shared_terms, {_SP_RHO2S} AS corr2s_q6,
       CAST(sad // greatest(n, 1) AS BIGINT) AS mean_abs_diff_q6
FROM cs""",
)
def idf_split_stability(spark, sf_dir):
    """Do the collection statistics generalise: BM25 idf computed
    independently on the even-doc_id and odd-doc_id halves of the
    corpus, compared term-by-term over the shared vocabulary — signed
    Pearson r² of the two idf vectors plus the mean absolute q6 gap.
    High correlation licenses computing df on a sample at 100 TB (the
    production shortcut everyone takes); a low one says the corpus is
    too heterogeneous for sampled statistics, and THIS op is the test
    that says which.

    Determinism: idf is q6-rounded PER (half, term) from exact
    integers; the correlation is the centered-BIGINT machinery with
    the signed-r² output (spearman rule).

    Scale shape: one (half, term) df agg; the half-vs-half pair join is
    vocab-keyed; censuses are 1-row."""
    t = _toks(_docs(spark, sf_dir)).select(
        F.expr("doc_id % 2").alias("half"), "doc_id", "term"
    )
    dfh = (
        t.groupBy("half", "term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .localCheckpoint()  # nh + both pair sides consume it
    )
    nh = t.groupBy("half").agg(
        F.countDistinct("doc_id").cast("long").alias("nh")
    )
    idf = dfh.join(F.broadcast(nh), "half").select(
        "half", "term", F.expr(_IDF_Q6).alias("idf_q6")
    )
    a = idf.where(F.col("half") == 0).select("term", F.col("idf_q6").alias("x"))
    b = idf.where(F.col("half") == 1).select("term", F.col("idf_q6").alias("y"))
    pr = a.join(b, "term")
    m = pr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(x) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mx"),
        F.expr(
            "CAST(sum(y) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("my"),
    )
    cs = (
        pr.crossJoin(F.broadcast(m))
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
            F.coalesce(F.sum(F.abs(F.col("x") - F.col("y"))), F.lit(0))
            .cast("long")
            .alias("sad"),
        )
    )
    return cs.select(
        F.col("n").alias("n_shared_terms"),
        F.expr(_SP_RHO2S).alias("corr2s_q6"),
        F.expr("CAST(sad div greatest(n, 1) AS BIGINT)").alias(
            "mean_abs_diff_q6"
        ),
    )


@register(
    "ann_label_mrr",
    _BATCH_SQL
    + """,
lb AS (SELECT vec_id, label FROM embeddings),
nb AS (SELECT b.qid, b.vec_id, b.rnk FROM btop b WHERE b.rnk <= 10 AND b.vec_id <> b.qid),
hit AS (SELECT nb.qid, CAST(min(nb.rnk) AS BIGINT) AS first_rank
        FROM nb JOIN lb ql ON ql.vec_id = nb.qid
        JOIN lb nl ON nl.vec_id = nb.vec_id
        WHERE nl.label = ql.label GROUP BY nb.qid),
qn AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM embeddings
       WHERE vec_id % 37 = 0),
ag AS (SELECT CAST(count(*) AS BIGINT) AS n_hit,
              CAST(COALESCE(sum(2520 // first_rank), 0) AS BIGINT) AS rr2520
       FROM hit)
SELECT qn.n_queries, ag.n_hit,
       CASE WHEN qn.n_queries = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (CAST(ag.rr2520 AS DOUBLE)
                 / (2520 * qn.n_queries))) AS BIGINT) END AS mrr_q6
FROM qn CROSS JOIN ag""",
)
def ann_label_mrr(spark, sf_dir):
    """Label-aware MRR of the batch ANN: per query, the reciprocal rank
    of the FIRST same-label neighbor in its top-10 (self excluded),
    averaged over the whole query batch — the retrieval-style eval that
    completes the label triptych (purity = how much of the
    neighborhood agrees, confusion = who it confuses, MRR = how FAR
    you must scan to find an agreeing example, which is what few-shot
    retrieval actually pays for). Queries with no same-label hit
    contribute 0.

    Determinism: reciprocal ranks scaled by 2520 (the map_eval lcm
    rule — every rank 1..10 divides it, so the sum is exact); one
    division at the end.

    Scale shape: neighbor lists are 10 rows/query; the first-hit agg
    and censuses are query-batch-sized."""
    top = _ivf_batch_topk(spark, sf_dir)
    lb = _emb(spark, sf_dir).select("vec_id", "label")
    nb = top.where(F.col("vec_id") != F.col("qid")).select(
        "qid", "vec_id", "rnk"
    )
    ql = lb.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    nl = lb.select("vec_id", F.col("label").alias("nlabel"))
    hit = (
        nb.join(ql, "qid")
        .join(nl, "vec_id")
        .where(F.col("nlabel") == F.col("qlabel"))
        .groupBy("qid")
        .agg(F.min("rnk").cast("long").alias("first_rank"))
    )
    qn = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") % 37 == 0)
        .agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    )
    ag = hit.agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        F.coalesce(F.sum(F.expr("2520 div first_rank")), F.lit(0))
        .cast("long")
        .alias("rr2520"),
    )
    return qn.crossJoin(ag).select(
        "n_queries",
        "n_hit",
        F.expr(
            "CASE WHEN n_queries = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (CAST(rr2520 AS DOUBLE)"
            " / (2520 * n_queries))) AS BIGINT) END"
        ).alias("mrr_q6"),
    )


@register(
    "erratic_customers_topk",
    """WITH o AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS y
  FROM orders),
s AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS sq
      FROM o GROUP BY o_custkey),
cv AS (SELECT o_custkey, n,
              CAST(round(1000000 * (((CAST(n AS DOUBLE) * sq
                   - CAST(s AS DOUBLE) * s) / (CAST(n AS DOUBLE) * n))
                   / ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))))
                   AS BIGINT) AS cv2_q6
       FROM s WHERE n >= 5 AND s > 0)
SELECT o_custkey, n AS n_orders, cv2_q6,
       CAST(row_number() OVER (ORDER BY cv2_q6 DESC, o_custkey ASC) AS BIGINT)
         AS rank
FROM cv ORDER BY cv2_q6 DESC, o_custkey ASC LIMIT 10""",
)
def erratic_customers_topk(spark, sf_dir):
    """Most erratic customers: squared coefficient of variation
    (variance/mean², scale-free) of per-order value, volume-gated
    (n ≥ 5), top-10 — the fraud/anomaly cut of the customer book
    (segment_repeat_rate says WHO returns; this says whose basket is
    unpredictable, the classic precursor signal in transaction
    monitoring). CV² rather than CV: the no-sqrt rule.

    Determinism: per-customer sufficient stats on whole dollars (the
    per-key sums are bounded by one customer's history — the envelope
    note); variance and mean are ONE shared float expression from
    exact BIGINTs; rank over the quantized CV².

    Scale shape: one custkey agg (map-side partials), a filtered
    TakeOrdered top-10."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").alias("y"),
    )
    s = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sq"),
    )
    cv = s.where((F.col("n") >= 5) & (F.col("s") > 0)).select(
        "o_custkey",
        "n",
        F.expr(
            "CAST(round(1000000 * (((CAST(n AS DOUBLE) * sq"
            " - CAST(s AS DOUBLE) * s) / (CAST(n AS DOUBLE) * n))"
            " / ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))))"
            " AS BIGINT)"
        ).alias("cv2_q6"),
    )
    top = cv.orderBy(F.desc("cv2_q6"), F.asc("o_custkey")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("cv2_q6"), F.asc("o_custkey")))
        .cast("long"),
    ).select("o_custkey", F.col("n").alias("n_orders"), "cv2_q6", "rank")


# ---------------------------------------------------------------------------
# session 89 — session depth vs conversion, activity decile lift,
# co-occurrence window-size curve
# ---------------------------------------------------------------------------


@register(
    "session_depth_conversion",
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
  SELECT user_id, event_type,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM fl),
ses AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS conv
  FROM se GROUP BY user_id, sid),
bk AS (SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS depth_bucket, conv
       FROM ses)
SELECT depth_bucket, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(COALESCE(sum(conv), 0) AS BIGINT) AS n_converted,
       CAST((1000000 * COALESCE(sum(conv), 0)) // count(*) AS BIGINT)
         AS conv_rate_q6
FROM bk GROUP BY depth_bucket ORDER BY depth_bucket""",
)
def session_depth_conversion(spark, sf_dir):
    """Conversion rate by session depth: sessions bucketed by log2 of
    their event count, each bucket's purchase rate — the engagement-
    to-outcome curve product teams tune onboarding against (monotone-
    rising says depth drives conversion; a hump says long sessions are
    lost users thrashing — session_entry_conversion slices by door,
    THIS slices by dwell). Gaps-and-islands sessionisation is the
    shared 30-min rule.

    Determinism: the (t_us, event_id) window orders exactly as every
    session op; buckets are the integer floor-log2 idiom.

    Scale shape: ONE user exchange for the two windows, a
    (user, session) agg, a ≤32-bucket rollup."""
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
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("conv"),
    )
    bk = ses.select(
        F.expr("CAST(length(bin(n_events)) - 1 AS BIGINT)").alias(
            "depth_bucket"
        ),
        "conv",
    )
    return (
        bk.groupBy("depth_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("n_converted"),
        )
        .select(
            "depth_bucket",
            "n_sessions",
            "n_converted",
            F.expr(
                "CAST((1000000 * n_converted) div n_sessions AS BIGINT)"
            ).alias("conv_rate_q6"),
        )
        .orderBy("depth_bucket")
    )


@register(
    "activity_decile_lift",
    """WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS conv
  FROM events GROUP BY user_id),
h AS (SELECT n_events, CAST(count(*) AS BIGINT) AS c,
             CAST(COALESCE(sum(conv), 0) AS BIGINT) AS cv
      FROM u GROUP BY n_events),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS nu, CAST(sum(cv) AS BIGINT) AS nc FROM h),
cumh AS (SELECT n_events, c, cv,
                CAST(sum(c) OVER (ORDER BY n_events
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                     AS BIGINT) AS cum_before
         FROM h),
dk AS (SELECT least((10 * cum_before) // tot.nu, 9) AS decile, c, cv
       FROM cumh CROSS JOIN tot),
ag AS (SELECT decile, CAST(sum(c) AS BIGINT) AS n_users,
              CAST(sum(cv) AS BIGINT) AS n_converted
       FROM dk GROUP BY decile),
spine AS (SELECT unnest(generate_series(0, 9)) AS decile)
SELECT CAST(spine.decile AS BIGINT) AS decile,
       CAST(COALESCE(ag.n_users, 0) AS BIGINT) AS n_users,
       CAST(COALESCE(ag.n_converted, 0) AS BIGINT) AS n_converted,
       CASE WHEN COALESCE(ag.n_users, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * ag.n_converted) // ag.n_users AS BIGINT)
       END AS conv_rate_q6,
       CASE WHEN COALESCE(ag.n_users, 0) = 0 OR tot.nc = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * ag.n_converted * tot.nu)
                 // (ag.n_users * tot.nc) AS BIGINT)
       END AS lift_q6
FROM spine LEFT JOIN ag USING (decile) CROSS JOIN tot ORDER BY decile""",
)
def activity_decile_lift(spark, sf_dir):
    """Lift table of conversion by activity decile — the model-eval
    artifact scored on the simplest possible score (event count): users
    sorted into activity deciles, each decile's conversion rate and its
    lift over the base rate. The shape every targeting model is
    benchmarked against ("does decile 9 convert 3× base"). Deciles are
    assigned VALUE-wise from the activity histogram (a user's decile =
    decile of its count's cumulative start; ties share one decile —
    the declared rule), so NO per-user rank window exists — the
    histogram cells are count-cardinality-bounded (the
    doclen_quantiles argument).

    Determinism: exact integers end to end; lift is the integer
    cross-multiplication (conv·NU)/(users·NC).

    Scale shape: one user agg, a count-histogram cumulative window
    over bounded cells, a 10-row spine."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("conv"),
        )
    )
    h = u.groupBy("n_events").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("cv"),
    )
    tot = h.agg(
        F.sum("c").cast("long").alias("nu"), F.sum("cv").cast("long").alias("nc")
    )
    wc = Window.orderBy("n_events").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumh = h.select(
        "n_events",
        "c",
        "cv",
        (F.sum("c").over(wc) - F.col("c")).cast("long").alias("cum_before"),
    )
    dk = cumh.crossJoin(F.broadcast(tot)).select(
        F.expr("least((10 * cum_before) div nu, 9)").alias("decile"), "c", "cv"
    )
    ag = dk.groupBy("decile").agg(
        F.sum("c").cast("long").alias("n_users"),
        F.sum("cv").cast("long").alias("n_converted"),
    )
    spine = spark.range(10).select(F.col("id").alias("decile"))
    return (
        spine.join(ag, "decile", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
            F.coalesce("n_converted", F.lit(0)).cast("long").alias("n_converted"),
            F.expr(
                "CASE WHEN COALESCE(n_users, 0) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_converted) div n_users AS BIGINT) END"
            ).alias("conv_rate_q6"),
            F.expr(
                "CASE WHEN COALESCE(n_users, 0) = 0 OR nc = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_converted * nu) div (n_users * nc)"
                " AS BIGINT) END"
            ).alias("lift_q6"),
        )
        .orderBy("decile")
    )


@register(
    "cooccur_window_curve",
    f"""WITH w AS ({SQL_WORDS}),
pairs AS MATERIALIZED (
  {" UNION ALL ".join(
    f'''SELECT {off} AS off, least(words[t.i], words[t.i + {off}]) AS a,
       greatest(words[t.i], words[t.i + {off}]) AS b
FROM w, unnest(generate_series(1, len(words) - {off})) AS t(i)
WHERE len(words) > {off}''' for off in (1, 2, 3, 4))}),
pc AS (SELECT 1 AS win, a, b, CAST(count(*) AS BIGINT) AS n FROM pairs
       WHERE off <= 1 GROUP BY a, b
       UNION ALL
       SELECT 2, a, b, CAST(count(*) AS BIGINT) FROM pairs
       WHERE off <= 2 GROUP BY a, b
       UNION ALL
       SELECT 4, a, b, CAST(count(*) AS BIGINT) FROM pairs
       WHERE off <= 4 GROUP BY a, b),
best AS (SELECT win, a AS top_a, b AS top_b, n AS top_n FROM (
           SELECT win, a, b, n,
                  row_number() OVER (PARTITION BY win
                                     ORDER BY n DESC, a ASC, b ASC) AS rn
           FROM pc) WHERE rn = 1),
cnt AS (SELECT win, CAST(count(*) AS BIGINT) AS n_distinct_pairs,
               CAST(sum(n) AS BIGINT) AS n_cooccurrences
        FROM pc GROUP BY win)
SELECT CAST(cnt.win AS BIGINT) AS win, cnt.n_distinct_pairs,
       cnt.n_cooccurrences, best.top_a, best.top_b, best.top_n
FROM cnt JOIN best USING (win) ORDER BY win""",
)
def cooccur_window_curve(spark, sf_dir):
    """Co-occurrence window-size tuning curve: distinct pair count,
    total pair mass, and the heaviest pair at context windows ±1/±2/±4
    — the knob cooccurrence_ppmi fixes at ±2, swept the way the
    LSH/HLL/bloom/fuzzy curves sweep theirs (window size is word2vec's
    most consequential hyperparameter: small windows learn syntax,
    large ones topic — and pair-table SIZE grows near-linearly in w,
    which is the cost axis this curve prices).

    Determinism: pairs are canonically ordered (least/greatest); the
    top pair picks by (n desc, a, b) via min(struct(-n, a, b))
    map-side in Spark (the oracle windows).

    Scale shape: offsets explode per doc via transform over the word
    array (NEVER a position self-join — the cooccurrence_ppmi rule);
    the tagged pair stream is checkpointed once and each window's agg
    filters it; vocab²-bounded tables everywhere downstream."""
    w = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    pairs = (
        w.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, 4), off ->"
                    " CASE WHEN size(words) > off THEN"
                    " transform(sequence(0, size(words) - off - 1), i ->"
                    " struct(off AS off,"
                    " least(words[i], words[i + off]) AS a,"
                    " greatest(words[i], words[i + off]) AS b))"
                    " ELSE array() END))"
                )
            ).alias("p")
        )
        .select("p.off", "p.a", "p.b")
        .localCheckpoint()  # three window aggs consume the tagged stream
    )
    outs = []
    for win in (1, 2, 4):
        pcw = (
            pairs.where(F.col("off") <= win)
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        ag = pcw.agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_pairs"),
            F.sum("n").cast("long").alias("n_cooccurrences"),
            F.min(
                F.struct((-F.col("n")).alias("nn"), F.col("a"), F.col("b"))
            ).alias("t"),
        )
        outs.append(
            ag.select(
                F.lit(win).cast("long").alias("win"),
                "n_distinct_pairs",
                "n_cooccurrences",
                F.col("t.a").alias("top_a"),
                F.col("t.b").alias("top_b"),
                (-F.col("t.nn")).cast("long").alias("top_n"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("win")


# ---------------------------------------------------------------------------
# session 90 — value×hour 2-D census, order concentration, geometric fit
# of session lengths
# ---------------------------------------------------------------------------


@register(
    "events_value_hour_hist2d",
    """WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
b AS (SELECT hour,
             CASE WHEN cents <= 0 THEN -1
                  ELSE CAST(length(bin(cents)) - 1 AS BIGINT) END AS vbucket,
             cents
      FROM e)
SELECT CAST(hour AS BIGINT) AS hour, vbucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY hour, vbucket ORDER BY hour, vbucket""",
)
def events_value_hour_hist2d(spark, sf_dir):
    """Two-dimensional value×hour census of the event stream: hour of
    day crossed with log2-cents value buckets — the fraud/ops heatmap
    ("do big-ticket events cluster at 3am") completing the 2-D census
    family (len_quality_hist2d profiles documents; this profiles
    money). Bucket −1 holds zero-value events. Observed cells only.

    Scale shape: map-side hour/bucket math into a ≤24×~40-cell agg."""
    e = _events(spark, sf_dir).select(
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24").alias(
            "hour"
        ),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    b = e.select(
        "hour",
        F.expr(
            "CASE WHEN cents <= 0 THEN -1"
            " ELSE CAST(length(bin(cents)) - 1 AS BIGINT) END"
        ).alias("vbucket"),
        "cents",
    )
    return (
        b.groupBy("hour", "vbucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            F.col("hour").cast("long").alias("hour"),
            "vbucket",
            "n_events",
            "sum_cents",
        )
        .orderBy("hour", "vbucket")
    )


@register(
    "order_concentration_histogram",
    """WITH s AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
         CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mx,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS tot
  FROM orders GROUP BY o_custkey),
c AS (SELECT least(((1000000 * mx) // tot) // 100000, 9) AS bucket
      FROM s WHERE n >= 2 AND tot > 0),
h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_customers
      FROM c GROUP BY bucket),
spine AS (SELECT unnest(generate_series(0, 9)) AS bucket)
SELECT CAST(spine.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(h.n_customers, 0) AS BIGINT) AS n_customers
FROM spine LEFT JOIN h USING (bucket) ORDER BY bucket""",
)
def order_concentration_histogram(spark, sf_dir):
    """Whale-order concentration: per repeat customer, the share of
    lifetime spend held by their single biggest order, bucketed into
    deciles — the "is the relationship one big deal or steady flow"
    histogram (mass near bucket 9 means every account hinges on one
    order; erratic_customers_topk names the worst offenders, this
    shows the distribution). One-order customers are excluded — their
    share is trivially 1.

    Determinism: exact cents; share and decile are integer divisions
    with the least(·, 9) top-bucket clamp.

    Scale shape: one custkey agg, a ≤10-bucket rollup, a 10-row spine."""
    s = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_custkey",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("cents").cast("long").alias("mx"),
            F.sum("cents").cast("long").alias("tot"),
        )
    )
    c = s.where((F.col("n") >= 2) & (F.col("tot") > 0)).select(
        F.expr("least(((1000000 * mx) div tot) div 100000, 9)").alias("bucket")
    )
    h = c.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    return (
        spine.join(h, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("n_customers", F.lit(0)).cast("long").alias("n_customers"),
        )
        .orderBy("bucket")
    )


# geometric-fit shared expressions over exact BIGINTs (S sessions, E
# events): p = S/E, survival at depth k is (1-p)^k = ((E-S)/E)^k; the
# bucket [2^b, 2^(b+1)) has mass surv(2^b - 1) - surv(2^(b+1) - 1).
_GEO_Q = "(CAST(es AS DOUBLE) / e)"  # 1 - p, from es = E - S


def _geo_mass(b: str) -> str:
    # 2^b via power(2e0, ·) — exact in double for bucket-sized exponents
    # and available in BOTH engines (DuckDB has no shiftleft function).
    return (
        f"(power({_GEO_Q}, power(2e0, CAST({b} AS DOUBLE)) - 1e0)"
        f" - power({_GEO_Q}, power(2e0, CAST({b} AS DOUBLE) + 1e0) - 1e0))"
    )


@register(
    "session_length_geometric_fit",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
fl AS (
  SELECT user_id, t_us, event_id,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL
              OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM t),
se AS (
  SELECT user_id,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM fl),
ses AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS len
        FROM se GROUP BY user_id, sid),
tot AS (SELECT CAST(count(*) AS BIGINT) AS s, CAST(sum(len) AS BIGINT) AS e,
               CAST(sum(len) - count(*) AS BIGINT) AS es
        FROM ses),
ob AS (SELECT CAST(length(bin(len)) - 1 AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_obs
       FROM ses GROUP BY bucket),
x AS (SELECT ob.bucket, ob.n_obs, tot.s, tot.e, tot.es,
             CAST(round(1000000 * (tot.s * {_geo_mass("ob.bucket")})) AS BIGINT)
               AS exp_q6
      FROM ob CROSS JOIN tot)
SELECT bucket, n_obs, exp_q6,
       CAST(round(1000000 * ((n_obs - s * {_geo_mass("bucket")})
            * (n_obs - s * {_geo_mass("bucket")})
            / greatest(s * {_geo_mass("bucket")}, 1e-9))) AS BIGINT) AS chi2_q6
FROM x ORDER BY bucket""",
)
def session_length_geometric_fit(spark, sf_dir):
    """Goodness-of-fit of session lengths to the geometric distribution:
    the MLE continuation probability is the exact rational 1−p =
    (E−S)/E (E events in S sessions), expected bucket masses come from
    the geometric survival function at the log2 bucket edges, and each
    observed bucket contributes a chi²-term — the "is session length
    memoryless" test behind every session-based capacity model (a fat
    tail vs geometric means power-user sessions need their own model;
    value_lognormal_fit is this op's sibling for money).

    Determinism: S/E/E−S are exact BIGINTs; masses are shared power()
    expressions over one exact ratio (libm pow, the ln precedent);
    chi² terms q6-round per bucket; expected counts floor at 1e-9 so
    a p=1 stream (all singleton sessions) stays finite.

    Scale shape: the session machinery's ONE user exchange; the fit
    runs on ≤32 bucket rows."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
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
    ses = (
        se.groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
        .localCheckpoint()  # census + histogram both consume it
    )
    tot = ses.agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("len").cast("long").alias("e"),
        (F.sum("len") - F.count(F.lit(1))).cast("long").alias("es"),
    )
    ob = ses.groupBy(
        F.expr("CAST(length(bin(len)) - 1 AS BIGINT)").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    x = ob.crossJoin(F.broadcast(tot))
    return x.select(
        "bucket",
        "n_obs",
        F.expr(
            f"CAST(round(1000000 * (s * {_geo_mass('bucket')})) AS BIGINT)"
        ).alias("exp_q6"),
        F.expr(
            f"CAST(round(1000000 * ((n_obs - s * {_geo_mass('bucket')})"
            f" * (n_obs - s * {_geo_mass('bucket')})"
            f" / greatest(s * {_geo_mass('bucket')}, 1e-9))) AS BIGINT)"
        ).alias("chi2_q6"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# session 91 — frequent event triples, night-owl census, price ANOVA
# ---------------------------------------------------------------------------


@register(
    "event_triple_support",
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nt AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM ut),
tr AS (SELECT a.user_id, a.event_type AS ta, b.event_type AS tb,
              c.event_type AS tc
       FROM ut a JOIN ut b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
       JOIN ut c ON b.user_id = c.user_id AND b.event_type < c.event_type),
sup AS (SELECT ta, tb, tc, CAST(count(*) AS BIGINT) AS n_users
        FROM tr GROUP BY ta, tb, tc),
rk AS (SELECT ta, tb, tc, n_users,
              row_number() OVER (ORDER BY n_users DESC, ta ASC, tb ASC, tc ASC)
                AS rank
       FROM sup)
SELECT rk.ta AS type_a, rk.tb AS type_b, rk.tc AS type_c, rk.n_users,
       CAST(rk.rank AS BIGINT) AS rank,
       CAST((1000000 * rk.n_users) // nt.nu AS BIGINT) AS support_q6
FROM rk CROSS JOIN nt WHERE rk.rank <= 10 ORDER BY rank""",
)
def event_triple_support(spark, sf_dir):
    """Frequent 3-itemsets over per-user event-type baskets: the top-10
    type TRIPLES by user support — the next Apriori level after
    event_type_lift's pairs (a high-support triple that no pair
    predicts is a genuine interaction path, the thing funnel designers
    mine for). Canonical ordering ta < tb < tc counts each basket
    subset once.

    Determinism: exact counts; support is integer division over the
    distinct-user census; ranks tiebreak lexicographically.

    Scale shape: the double self-join keys on user_id with both sides
    the per-user DISTINCT type set — fanout bounded by |types|³ per
    user (the event_type_lift rule, one level up); the support agg is
    ≤|types|³ rows."""
    ut = (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint()  # census + three join sides consume it
    )
    nt = ut.agg(F.countDistinct("user_id").cast("long").alias("nu"))
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select("user_id", F.col("event_type").alias("tb"))
    c = ut.select("user_id", F.col("event_type").alias("tc"))
    tr = (
        a.join(b, "user_id")
        .where(F.col("ta") < F.col("tb"))
        .join(c, "user_id")
        .where(F.col("tb") < F.col("tc"))
    )
    sup = tr.groupBy("ta", "tb", "tc").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rk = sup.withColumn(
        "rank",
        F.row_number()
        .over(
            Window.orderBy(
                F.desc("n_users"), F.asc("ta"), F.asc("tb"), F.asc("tc")
            )
        )
        .cast("long"),
    ).where(F.col("rank") <= 10)
    return (
        rk.crossJoin(F.broadcast(nt))
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("tc").alias("type_c"),
            "n_users",
            "rank",
            F.expr("CAST((1000000 * n_users) div nu AS BIGINT)").alias(
                "support_q6"
            ),
        )
        .orderBy("rank")
    )


@register(
    "night_owl_census",
    """WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(COALESCE(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 6
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS night
  FROM events GROUP BY user_id),
c AS (SELECT least(((1000000 * night) // n) // 100000, 9) AS bucket FROM u),
h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_users FROM c GROUP BY bucket),
spine AS (SELECT unnest(generate_series(0, 9)) AS bucket)
SELECT CAST(spine.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(h.n_users, 0) AS BIGINT) AS n_users
FROM spine LEFT JOIN h USING (bucket) ORDER BY bucket""",
)
def night_owl_census(spark, sf_dir):
    """Night-owl distribution: per user, the share of their events in
    the 00:00-06:00 UTC window, bucketed into deciles — the audience-
    timezone/behavior census behind send-time optimisation and bot
    screening (humans pile into buckets 0-2; a uniform histogram says
    the user base spans timezones OR isn't human —
    events_hour_weekday_heatmap shows the aggregate, THIS shows the
    per-user mix).

    Determinism: exact counts, integer share and decile with the
    least(·, 9) clamp.

    Scale shape: one user agg with a conditional counter, a ≤10-bucket
    rollup, a 10-row spine."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN (unix_micros(cast(ts as timestamp))"
                        " div 3600000000) % 24 < 6 THEN 1 ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("night"),
        )
    )
    c = u.select(
        F.expr("least(((1000000 * night) div n) div 100000, 9)").alias("bucket")
    )
    h = c.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    return (
        spine.join(h, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
        .orderBy("bucket")
    )


# one-way ANOVA F from quantized per-group terms (columns k, n, ssb, ssw)
_ANOVA_F = (
    "CASE WHEN k < 2 OR n <= k OR ssw <= 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(1000000 * ((CAST(ssb AS DOUBLE) / (k - 1))"
    " / (CAST(ssw AS DOUBLE) / (n - k)))) AS BIGINT) END"
)


@register(
    "part_type_anova",
    """WITH p AS (
  SELECT p_type, CAST(round(p_retailprice * 100) AS BIGINT) // 100 AS y
  FROM part),
gm AS (SELECT CAST(sum(y) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS my,
              CAST(count(*) AS BIGINT) AS n
       FROM p),
g AS (SELECT p.p_type, gm.n,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(p.y - gm.my) AS BIGINT) AS sg,
             CAST(sum((p.y - gm.my) * (p.y - gm.my)) AS BIGINT) AS qg
      FROM p CROSS JOIN gm GROUP BY p.p_type, gm.n),
t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(sg) AS BIGINT) AS s, CAST(sum(qg) AS BIGINT) AS q,
             CAST(COALESCE(sum(CAST(round(CAST(sg AS DOUBLE) * sg / ng)
                  AS BIGINT)), 0) AS BIGINT) AS sgq
      FROM g),
f AS (SELECT k, n,
             CAST(sgq - CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT)
                  AS BIGINT) AS ssb,
             CAST(q - sgq AS BIGINT) AS ssw
      FROM t)
SELECT k AS n_types, n AS n_parts, ssb AS ssb_dlr2, ssw AS ssw_dlr2,
       """
    + _ANOVA_F
    + """ AS f_q6
FROM f""",
)
def part_type_anova(spark, sf_dir):
    """One-way ANOVA of retail price across part types: the F statistic
    (between-group over within-group mean squares) — the k-group
    generalisation of ttest_lang_doclen's two-sample Welch (does the
    TYPE dimension explain price at all, before any pairwise digging).
    Sums of squares come from GLOBALLY-integer-centered exact BIGINTs;
    the only order-sensitive float sums are avoided by quantizing each
    group's s²/n term to whole dollars² BEFORE the BIGINT sum (the
    q6-per-cell-first rule at q0 — dollars² granularity is far below
    any decision threshold on F).

    Determinism: one shared _ANOVA_F expression over four integers;
    degenerate designs (k < 2, n ≤ k, SSW ≤ 0) emit the 0 sentinel.

    Scale shape: one part pass for the global mean (1-row broadcast),
    one for per-type centered stats (≤|types| rows), 1-row censuses."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_type",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT) div 100").alias("y"),
    )
    gm = p.agg(
        F.expr(
            "CAST(sum(y) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("my"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    g = (
        p.crossJoin(F.broadcast(gm))
        .groupBy("p_type", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum(F.col("y") - F.col("my")).cast("long").alias("sg"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .cast("long")
            .alias("qg"),
        )
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").cast("long").alias("q"),
        F.coalesce(
            F.sum(
                F.expr("CAST(round(CAST(sg AS DOUBLE) * sg / ng) AS BIGINT)")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sgq"),
    )
    f = t.select(
        "k",
        "n",
        F.expr(
            "CAST(sgq - CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT)"
            " AS BIGINT)"
        ).alias("ssb"),
        F.expr("CAST(q - sgq AS BIGINT)").alias("ssw"),
    )
    return f.select(
        F.col("k").alias("n_types"),
        F.col("n").alias("n_parts"),
        F.col("ssb").alias("ssb_dlr2"),
        F.col("ssw").alias("ssw_dlr2"),
        F.expr(_ANOVA_F).alias("f_q6"),
    )


# ---------------------------------------------------------------------------
# session 92 — discount policy bands, query cost estimate, peak concurrency
# ---------------------------------------------------------------------------


@register(
    "discount_by_quantity_band",
    """WITH l AS (
  SELECT CAST(l_quantity AS BIGINT) // 10 AS qty_band,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_pp
  FROM lineitem)
SELECT qty_band, CAST(count(*) AS BIGINT) AS n_items,
       CAST(round(1000000 * (CAST(sum(disc_pp) AS DOUBLE) / count(*)))
            AS BIGINT) AS mean_disc_pp_q6
FROM l GROUP BY qty_band ORDER BY qty_band""",
)
def discount_by_quantity_band(spark, sf_dir):
    """The volume-discount policy table: mean discount (integer percent
    points — the Q6 forecast convention) per quantity decade band —
    discount_quantity_corr says WHETHER quantity buys discount as one
    number; this is the actual schedule a pricing analyst reads
    (non-monotone bands are negotiation leakage).

    Scale shape: map-side band/percent math, a ≤|bands|-group agg."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("CAST(l_quantity AS BIGINT) div 10").alias("qty_band"),
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("disc_pp"),
    )
    return (
        li.groupBy("qty_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.expr(
                "CAST(round(1000000 * (CAST(sum(disc_pp) AS DOUBLE) / count(1)))"
                " AS BIGINT)"
            ).alias("mean_disc_pp_q6"),
        )
        .orderBy("qty_band")
    )


_COST_QUERIES = [
    ("spark hash join", ["spark", "hash", "join"]),
    ("dup", ["dup"]),
    ("the spark", ["the", "spark"]),
]


def _cost_q_sql() -> str:
    rows = []
    for qs, terms in _COST_QUERIES:
        for t in terms:
            rows.append(f"SELECT '{qs}' AS query, '{t}' AS term")
    return " UNION ALL ".join(rows)


@register(
    "query_cost_estimate",
    f"""WITH tf AS ({SQL_TF}),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
q AS ({_cost_q_sql()}),
pq AS (SELECT q.query, CAST(count(dfs.term) AS BIGINT) AS n_terms,
              CAST(COALESCE(sum(dfs.df), 0) AS BIGINT) AS sum_df
       FROM q LEFT JOIN dfs USING (term) GROUP BY q.query),
mt AS (SELECT q.query, CAST(count(DISTINCT tf.doc_id) AS BIGINT) AS n_matching
       FROM q JOIN tf USING (term) GROUP BY q.query)
SELECT pq.query, pq.n_terms, pq.sum_df,
       CAST(COALESCE(mt.n_matching, 0) AS BIGINT) AS n_matching_docs,
       CAST((1000000 * COALESCE(mt.n_matching, 0)) // nd.n_docs AS BIGINT)
         AS selectivity_q6
FROM pq LEFT JOIN mt USING (query) CROSS JOIN nd ORDER BY pq.query""",
)
def query_cost_estimate(spark, sf_dir):
    """Planner-style cost card for three canned queries: dictionary
    terms found, total postings the OR-scan would read (Σ df), distinct
    matching documents, and match selectivity — the numbers a query
    planner (and the MaxScore gate in query/wand.py) decides with
    before touching a posting ('the spark' reads half the index to
    match most of it; 'dup' reads a sliver). Terms missing from the
    dictionary count 0 via the LEFT probe (the preretrieval_qpp rule).

    Determinism: exact counts, one integer share division.

    Scale shape: the query spine is 6 broadcast rows; sum_df reads the
    vocab-sized df table; the match count is a term-semi-joined
    two-phase distinct."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()  # nd/dfs/match all consume it
    )
    nd = tf.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qrows = [(qs, t) for qs, terms in _COST_QUERIES for t in terms]
    q = F.broadcast(spark.createDataFrame(qrows, "query string, term string"))
    pq = (
        q.join(dfs, "term", "left")
        .groupBy("query")
        .agg(
            F.count("df").cast("long").alias("n_terms"),
            F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("sum_df"),
        )
    )
    mt = (
        tf.join(q, "term")
        .groupBy("query")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_matching"))
    )
    return (
        pq.join(mt, "query", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            "query",
            "n_terms",
            "sum_df",
            F.coalesce("n_matching", F.lit(0))
            .cast("long")
            .alias("n_matching_docs"),
            F.expr(
                "CAST((1000000 * COALESCE(n_matching, 0)) div n_docs AS BIGINT)"
            ).alias("selectivity_q6"),
        )
        .orderBy("query")
    )


@register(
    "peak_concurrent_sessions",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
fl AS (
  SELECT user_id, t_us, event_id,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL
              OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM t),
se AS (
  SELECT user_id, t_us,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM fl),
ses AS (SELECT user_id, sid,
               CAST(min(t_us) // 60000000 AS BIGINT) AS m0,
               CAST(max(t_us) // 60000000 AS BIGINT) AS m1
        FROM se GROUP BY user_id, sid),
d AS (SELECT m0 AS minute, CAST(1 AS BIGINT) AS delta FROM ses
      UNION ALL
      SELECT m1 + 1, CAST(-1 AS BIGINT) FROM ses),
g AS (SELECT minute, CAST(sum(delta) AS BIGINT) AS delta FROM d GROUP BY minute),
c AS (SELECT minute,
             CAST(sum(delta) OVER (ORDER BY minute
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS conc
      FROM g)
SELECT CAST(max(conc) AS BIGINT) AS peak_concurrency,
       CAST(min(CASE WHEN conc = (SELECT max(conc) FROM c) THEN minute END)
            AS BIGINT) AS at_minute
FROM c""",
)
def peak_concurrent_sessions(spark, sf_dir):
    """Peak concurrent sessions (minute grain) and when it happened —
    THE capacity-planning number (connection pools, websocket fleets
    and rate limits are sized off peak concurrency, not event volume).
    Sweep-line over session intervals: +1 at the start minute, −1
    after the end minute, running sum, max — the
    open_lineitems_timeseries decomposition pointed at sessions; the
    earliest peak minute is the deterministic tiebreak.

    Determinism: exact integer minutes and counters.

    Scale shape: sessionisation is the usual ONE user exchange; deltas
    aggregate to OBSERVED boundary minutes (≤ min(2·sessions,
    calendar minutes) cells — the delta-days argument), and the
    cumulative window runs over those cells only."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
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
        F.expr("CAST(min(t_us) div 60000000 AS BIGINT)").alias("m0"),
        F.expr("CAST(max(t_us) div 60000000 AS BIGINT)").alias("m1"),
    )
    d = ses.select(
        F.col("m0").alias("minute"), F.lit(1).cast("long").alias("delta")
    ).unionByName(
        ses.select(
            (F.col("m1") + 1).alias("minute"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    g = d.groupBy("minute").agg(F.sum("delta").cast("long").alias("delta"))
    wc = Window.orderBy("minute").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select("minute", F.sum("delta").over(wc).cast("long").alias("conc"))
    return c.agg(
        F.max(F.struct(F.col("conc"), (-F.col("minute")).alias("nm"))).alias("t")
    ).select(
        F.col("t.conc").cast("long").alias("peak_concurrency"),
        (-F.col("t.nm")).cast("long").alias("at_minute"),
    )


# ---------------------------------------------------------------------------
# session 93 — event-time disorder census, positional index size,
# per-label norm bias
# ---------------------------------------------------------------------------


@register(
    "event_disorder_histogram",
    """WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
r AS (SELECT user_id, event_id, t_us,
             CAST(max(t_us) OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS seen
      FROM t),
lt AS (SELECT CAST(seen - t_us AS BIGINT) AS late_us FROM r),
bk AS (SELECT CASE WHEN late_us = 0 THEN -1
              ELSE CAST(length(bin((late_us // 1000000) + 1)) - 1 AS BIGINT)
              END AS bucket
       FROM lt)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_events
FROM bk GROUP BY bucket ORDER BY bucket""",
)
def event_disorder_histogram(spark, sf_dir):
    """Event-time disorder census: per event, how far its timestamp lags
    behind the maximum already seen in ARRIVAL order (event_id) within
    its key — the empirical curve a Structured Streaming watermark is
    tuned against (`withWatermark("ts", X)` drops exactly the events
    whose lateness exceeds X; this histogram says what X costs).
    Bucket −1 = in-order arrivals; else log2 of (late seconds + 1), so
    sub-second jitter lands in bucket 0. Lateness is per-KEY (the
    per-user running max) — the per-partition watermark view; a global
    arrival order would need a stream-wide sort no engine does.

    Determinism: exact integer lateness and buckets; the running max
    orders by (event_id) — the arrival proxy.

    Scale shape: ONE user_id exchange for the running-max window, a
    ≤~40-bucket rollup."""
    t = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = t.select(
        (F.max("t_us").over(w) - F.col("t_us")).cast("long").alias("late_us")
    )
    bk = r.select(
        F.expr(
            "CASE WHEN late_us = 0 THEN -1"
            " ELSE CAST(length(bin((late_us div 1000000) + 1)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        bk.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("bucket")
    )


@register(
    "positions_varint_estimate",
    f"""WITH w AS ({SQL_WORDS}),
p AS (SELECT doc_id, words[i] AS term, CAST(i AS BIGINT) AS pos
      FROM w, unnest(generate_series(1, len(words))) AS t(i)
      WHERE len(words) >= 1),
d AS (SELECT doc_id, term, pos,
             pos - lag(pos) OVER (PARTITION BY doc_id, term ORDER BY pos) AS delta
      FROM p),
b AS (SELECT doc_id, term,
             CAST(CASE WHEN delta IS NULL THEN (length(bin(pos)) + 6) // 7
                  ELSE (length(bin(delta)) + 6) // 7 END AS BIGINT) AS nbytes
      FROM d),
pt AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
              CAST(count(*) AS BIGINT) AS n_positions,
              CAST(sum(nbytes) AS BIGINT) AS bytes_est
       FROM b GROUP BY term),
bd AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_band,
              n_positions, bytes_est
       FROM pt)
SELECT df_band, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(n_positions) AS BIGINT) AS n_positions,
       CAST(sum(bytes_est) AS BIGINT) AS bytes_est,
       CAST((1000000 * sum(bytes_est)) // sum(n_positions) AS BIGINT)
         AS bytes_per_position_q6
FROM bd GROUP BY df_band ORDER BY df_band""",
)
def positions_varint_estimate(spark, sf_dir):
    """Positional-index size model: LEB128 bytes of the within-document
    position deltas per log2-df band — the companion table to
    postings_varint_estimate that prices the PHRASE-QUERY capability
    (a positional index is typically 2-4× the doc-id index; whether to
    pay that is decided by exactly this ratio, per band — maybe only
    mid-df terms need positions, stopwords never do). First position
    per (doc, term) is stored absolute (1-based), then gaps.

    Determinism: pure integer arithmetic; positions are the 1-based
    token indexes on BOTH sides (DuckDB generate_series matches
    Spark's posexplode+1 — the term_vectors_doc shift, pre-applied).

    Scale shape: the (doc, term) lag window partitions by the posting
    key — bounded by one doc's tf (tiny), never corpus-wide; rollups
    combine map-side into ≤64 band rows."""
    wdf = _docs(spark, sf_dir).select(
        "doc_id", spark_tokens("text").alias("words")
    )
    p = wdf.select(
        "doc_id", F.posexplode("words").alias("i", "term")
    ).select("doc_id", "term", (F.col("i") + 1).cast("long").alias("pos"))
    wlag = Window.partitionBy("doc_id", "term").orderBy("pos")
    d = p.select(
        "doc_id",
        "term",
        "pos",
        (F.col("pos") - F.lag("pos").over(wlag)).alias("delta"),
    )
    b = d.select(
        "doc_id",
        "term",
        F.expr(
            "CAST(CASE WHEN delta IS NULL THEN (length(bin(pos)) + 6) div 7"
            " ELSE (length(bin(delta)) + 6) div 7 END AS BIGINT)"
        ).alias("nbytes"),
    )
    pt = b.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("n_positions"),
        F.sum("nbytes").cast("long").alias("bytes_est"),
    )
    bd = pt.select(
        F.expr("CAST(length(bin(df)) - 1 AS BIGINT)").alias("df_band"),
        "n_positions",
        "bytes_est",
    )
    return (
        bd.groupBy("df_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("n_positions").cast("long").alias("n_positions"),
            F.sum("bytes_est").cast("long").alias("bytes_est"),
        )
        .select(
            "df_band",
            "n_terms",
            "n_positions",
            "bytes_est",
            F.expr(
                "CAST((1000000 * bytes_est) div n_positions AS BIGINT)"
            ).alias("bytes_per_position_q6"),
        )
        .orderBy("df_band")
    )


@register(
    "label_norm_bias",
    """WITH e AS (
  SELECT label,
         CAST(CAST(round(1000000 * sqrt(list_dot_product(
              CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))))
              AS BIGINT) AS BIGINT) AS norm_q6
  FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(CAST(sum(norm_q6) AS BIGINT) // count(*) AS BIGINT) AS mean_norm_q6,
       CAST(min(norm_q6) AS BIGINT) AS min_norm_q6,
       CAST(max(norm_q6) AS BIGINT) AS max_norm_q6
FROM e GROUP BY label ORDER BY label""",
)
def label_norm_bias(spark, sf_dir):
    """Per-label embedding-norm profile: mean/min/max vector norm by
    class label — the norm-bias audit for classification use (softmax
    logits scale with the norm, so a label whose vectors run
    systematically longer gets a baked-in prior; norm_doclen_corr
    catches the length confound, THIS catches the label confound).

    Determinism: the norm is q6-rounded PER VECTOR from the double
    dot product (same fold both engines — the float32 column casts to
    double element-wise); the mean is a floor division of the exact
    BIGINT sum.

    Scale shape: map-side norm per vector, a ≤|labels|-group agg."""
    e = _emb(spark, sf_dir).select(
        "label",
        F.expr(
            "CAST(round(1000000 * sqrt(aggregate(zip_with("
            "transform(embedding, x -> cast(x as double)),"
            "transform(embedding, x -> cast(x as double)),"
            " (a, b) -> a * b), cast(0.0 as double), (acc, z) -> acc + z)))"
            " AS BIGINT)"
        ).alias("norm_q6"),
    )
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr(
                "CAST(CAST(sum(norm_q6) AS BIGINT) div count(1) AS BIGINT)"
            ).alias("mean_norm_q6"),
            F.min("norm_q6").cast("long").alias("min_norm_q6"),
            F.max("norm_q6").cast("long").alias("max_norm_q6"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            "mean_norm_q6",
            "min_norm_q6",
            "max_norm_q6",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# session 94 — DP noisy release, BM25 length-bias audit, daily CTR
# ---------------------------------------------------------------------------

# Laplace(b=1/eps, eps=1) inverse CDF over the 52-bit md5 uniform
# u = k/2^52 (exact in double — the bootstrap_mean_doclen construction);
# the 1-2|u-1/2| argument floors at 2^-52 so u=0 can't reach ln(0).
_DP_U = (
    "(CAST(('0x' || substr(md5('dp:' || source), 1, 13))::UBIGINT AS DOUBLE)"
    " / 4503599627370496e0)"
)
_DP_U_SPARK = (
    "(CAST(conv(substring(md5(concat('dp:', source)), 1, 13), 16, 10) AS DOUBLE)"
    " / 4503599627370496e0)"
)


def _dp_noise(u: str) -> str:
    return (
        f"(CASE WHEN {u} >= 5e-1 THEN -1e0 ELSE 1e0 END"
        f" * ln(greatest(1e0 - 2e0 * abs({u} - 5e-1), 2.220446049250313e-16)))"
    )


@register(
    "dp_source_counts",
    f"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       FROM documents GROUP BY source),
z AS (SELECT source, n,
             CAST(round(1000000 * (n + {_dp_noise(_DP_U)})) AS BIGINT)
               AS noisy_q6
      FROM c)
SELECT source, n AS n_docs, noisy_q6,
       CAST(abs(noisy_q6 - 1000000 * n) AS BIGINT) AS abs_err_q6
FROM z ORDER BY source""",
)
def dp_source_counts(spark, sf_dir):
    """Differentially-private release of per-source document counts:
    each count gets Laplace(1/ε) noise (ε = 1) drawn by inverse CDF
    from the SEEDED 52-bit md5 uniform ('dp:'||source — hash-input
    disjointness, the weighted_sample_docs rule), beside the true
    count and the realised absolute error. This is the publishable
    version of dataset_datasheet's volume column: ε=1 count noise is
    ±1-ish, invisible at corpus scale but formally private. The
    deterministic seed makes the "noise" reproducible across engines
    and rounds — exactly how a DP release pipeline pins its
    randomness for auditability.

    Determinism: u = k/2^52 is exact in double; the inverse CDF is one
    shared expression (ln floored away from ln(0)); one q6 rounding.

    Scale shape: one source agg; noise is a map-side expression over
    ≤|sources| rows."""
    c = _docs(spark, sf_dir).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    z = c.select(
        "source",
        "n",
        F.expr(
            f"CAST(round(1000000 * (n + {_dp_noise(_DP_U_SPARK)})) AS BIGINT)"
        ).alias("noisy_q6"),
    )
    return z.select(
        "source",
        F.col("n").alias("n_docs"),
        "noisy_q6",
        F.expr("CAST(abs(noisy_q6 - 1000000 * n) AS BIGINT)").alias(
            "abs_err_q6"
        ),
    ).orderBy("source")
