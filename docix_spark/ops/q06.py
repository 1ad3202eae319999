"""driver_queries chunk q06 (original lines 20811-24287): preretrieval_qpp, new_returning_daily, quality_drift_deciles, source_embedding_dispersion, ... pq_code_histogram (44 ops).

Linearized continuation of docix_spark.ops.q05 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q05")

@register(
    "preretrieval_qpp",
    f"""WITH tf AS ({SQL_TF}),
a2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
       FROM tf GROUP BY term),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
q AS (SELECT * FROM (VALUES {_BQ_VALUES}) AS v(qid, term)),
pt AS (
  SELECT q.qid, q.term,
         CAST(round(1000000 * ln(1.0 + (nd.n - COALESCE(a2.df, 0) + 0.5)
              / (COALESCE(a2.df, 0) + 0.5))) AS BIGINT) AS idf_q6,
         CAST(round(1000000 * (1.0 + ln(greatest(COALESCE(a2.cf, 0), 1)))
              * ln(1.0 + (nd.n - COALESCE(a2.df, 0) + 0.5)
                   / (COALESCE(a2.df, 0) + 0.5))) AS BIGINT) AS scq_q6
  FROM q LEFT JOIN a2 USING (term) CROSS JOIN nd)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(round(sum(idf_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avg_idf_q6,
       CAST(max(idf_q6) AS BIGINT) AS max_idf_q6,
       CAST(COALESCE(sum(scq_q6), 0) AS BIGINT) AS scq_q6
FROM pt GROUP BY qid ORDER BY qid""",
)
def preretrieval_qpp(spark, sf_dir):
    """PRE-retrieval query-performance prediction (He & Ounis 2004): per
    query of the _msearch batch, avgIDF / maxIDF and the summed
    collection-query similarity SCQ = Σ (1+ln cf)·idf — the difficulty
    estimate a router reads BEFORE spending a retrieval pass (route
    easy queries to the cheap tier, hard ones to rerankers; clarity_score
    is the post-retrieval sibling that needs the top-10 first). Terms
    absent from the collection carry cf 0 → the greatest(·,1) guard and
    a maximal idf — the classic OOV-is-hard signal.

    Determinism: per-(query, term) idf/scq are single q6-rounded float
    expressions over exact integers; the per-query rollup divides exact
    sums once.

    Scale shape: the A2 dictionary probe is a ≤|query-terms| broadcast
    LEFT JOIN; no postings are touched at all — that absence IS the op."""
    tf = _toks(_docs(spark, sf_dir)).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    tf = tf.localCheckpoint()  # feeds a2 AND the corpus doc count
    a2 = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
    nd = tf.select("doc_id").distinct().agg(F.count(F.lit(1)).cast("long").alias("n"))
    q = F.broadcast(
        spark.createDataFrame(
            [(qid, t) for qid, terms in _BATCH_QUERIES for t in terms],
            "qid long, term string",
        )
    )
    pt = (
        q.join(a2, "term", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            "qid",
            F.expr(
                "CAST(round(1000000 * ln(1.0 + (n - COALESCE(df, 0) + 0.5)"
                " / (COALESCE(df, 0) + 0.5))) AS BIGINT)"
            ).alias("idf_q6"),
            F.expr(
                "CAST(round(1000000 * (1.0 + ln(greatest(COALESCE(cf, 0), 1)))"
                " * ln(1.0 + (n - COALESCE(df, 0) + 0.5)"
                " / (COALESCE(df, 0) + 0.5))) AS BIGINT)"
            ).alias("scq_q6"),
        )
    )
    return (
        pt.groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.expr(
                "CAST(round(sum(idf_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT)"
            ).alias("avg_idf_q6"),
            F.max("idf_q6").cast("long").alias("max_idf_q6"),
            F.coalesce(F.sum("scq_q6"), F.lit(0)).cast("long").alias("scq_q6"),
        )
        .orderBy("qid")
    )


@register(
    "new_returning_daily",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
fs AS (SELECT user_id, CAST(min(day) AS BIGINT) AS first_day FROM e GROUP BY user_id),
j AS (
  SELECT e.day, CAST(e.day = fs.first_day AS INT) AS is_new,
         e.user_id, e.cents
  FROM e JOIN fs USING (user_id))
SELECT day, CAST(is_new AS BIGINT) AS is_new,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM j GROUP BY day, is_new ORDER BY day, is_new""",
)
def new_returning_daily(spark, sf_dir):
    """New-vs-returning split per day — the growth-accounting census
    every product dashboard leads with (is today's activity acquisition
    or retention?): a user's events on their FIRST-SEEN day count as
    'new', every later day as 'returning'. Distinct users, events and
    exact cents per (day, cohort-side).

    Scale shape: first-seen is one user-keyed min agg; the join back
    rides the same user exchange (the events_cohort_revenue rule); the
    census is calendar×2 rows. Day keys integer."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    fs = e.groupBy("user_id").agg(F.min("day").cast("long").alias("first_day"))
    j = e.join(fs, "user_id").select(
        "day",
        (F.col("day") == F.col("first_day")).cast("int").alias("is_new"),
        "user_id",
        "cents",
    )
    return (
        j.groupBy("day", F.col("is_new").cast("long").alias("is_new"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("day", "is_new")
    )


@register(
    "quality_drift_deciles",
    f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
t AS (
  SELECT CAST((doc_id * 10) // n_docs AS BIGINT) AS decile,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_distinct
  FROM documents CROSS JOIN nd),
v AS (
  SELECT decile, n_tok,
         CAST(round(1000000.0 * n_distinct / n_tok) AS BIGINT) AS ttr_q6
  FROM t WHERE n_tok > 0)
SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS n_tokens,
       CAST(round(sum(ttr_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_ttr_q6,
       CAST(round(sum(n_tok) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_len
FROM v GROUP BY decile ORDER BY decile""",
)
def quality_drift_deciles(spark, sf_dir):
    """Quality drift monitor: mean TTR and mean length per doc_id decile
    — term_drift_deciles' QUALITY-AXIS sibling (a crawl whose late
    deciles get shorter and less diverse is degrading at the source, and
    a model trained on the head overfits clean data). Flat curves on the
    stationary sandbox are the healthy reading.

    Scale shape: decile is a map-side key off the 1-row count broadcast;
    one 10-group agg; per-doc TTR q6-rounds first, means divide exact
    sums once."""
    nd = _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    t = (
        _docs(spark, sf_dir)
        .crossJoin(F.broadcast(nd))
        .select(
            F.expr("cast((doc_id * 10) div n_docs as bigint)").alias("decile"),
            F.size(spark_tokens("text")).cast("long").alias("n_tok"),
            F.size(F.array_distinct(spark_tokens("text"))).cast("long").alias("n_distinct"),
        )
    )
    v = t.where(F.col("n_tok") > 0).select(
        "decile",
        "n_tok",
        F.expr("CAST(round(1000000.0 * n_distinct / n_tok) AS BIGINT)").alias("ttr_q6"),
    )
    return (
        v.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
            F.expr(
                "CAST(round(sum(ttr_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT)"
            ).alias("mean_ttr_q6"),
            F.expr(
                "CAST(round(sum(n_tok) / CAST(count(*) AS DOUBLE)) AS BIGINT)"
            ).alias("mean_len"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# session 65 — pair-free embedding dispersion, graph assortativity,
# revenue Gini
# ---------------------------------------------------------------------------


@register(
    "source_embedding_dispersion",
    """WITH e AS (
  SELECT d.source, CAST(em.embedding AS DOUBLE[]) AS v
  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id
  WHERE em.vec_id <> 0),
nv AS (
  SELECT source,
         list_transform(v, x -> CAST(CAST(round(1000000 * x / nrm) AS BIGINT) AS DOUBLE)) AS u
  FROM (SELECT source, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)),
dims AS (
  SELECT source, i, CAST(SUM(CAST(u[i] AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(u[i] AS BIGINT) * CAST(u[i] AS BIGINT)) AS BIGINT) AS ss
  FROM nv, (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY source, i),
agg AS (
  SELECT source,
         CAST(sum(s * s) AS BIGINT) AS sum_sq,
         CAST(sum(ss) AS BIGINT) AS self_sq
  FROM dims GROUP BY source),
cnt AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM nv GROUP BY source)
SELECT cnt.source, cnt.n,
       CASE WHEN cnt.n < 2 THEN 0
            ELSE CAST(round((CAST(agg.sum_sq AS DOUBLE) - agg.self_sq)
                 / (CAST(cnt.n AS DOUBLE) * (cnt.n - 1)) / 1000000.0) AS BIGINT)
       END AS mean_pair_cos_q6
FROM cnt JOIN agg USING (source) ORDER BY cnt.source""",
)
def source_embedding_dispersion(spark, sf_dir):
    """Mean PAIRWISE cosine within each source — computed WITHOUT any
    pair join via the sum-vector identity Σ_{i≠j} û_i·û_j = ‖Σû‖² − Σ‖û‖²
    over q6-quantized unit vectors: the tightness/diversity score of a
    source's embedding cloud (≈1 = near-duplicate topic silo, ≈0 =
    diverse; the semdedup threshold should sit well above a source's own
    dispersion). The identity is THE 100 TB trick — an n² pair sum
    collapses to one linear pass and a 64-row-per-source reduction,
    where every pairwise formulation (semdedup's in-cell join included)
    pays quadratic cost.

    Determinism: each vector normalizes ONCE to integer q6 components
    (the normalize-once/one-dot rule); ‖Σû‖² and Σ‖û‖² are exact BIGINTs
    (envelope: component sums < 2^31.5 per source-dim at 1e9 docs, their
    squares < 2^63); the final expression is one guarded float division
    landing back in q6.

    Scale shape: one map-side normalize + a (source, dim)-keyed integer
    agg (64 rows per source), then a sources-sized rollup. No pair
    table EXISTS."""
    e = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .join(
            _docs(spark, sf_dir).select(F.col("doc_id").alias("vec_id"), "source"),
            "vec_id",
        )
        .select("source", F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    )
    # hoist the norm OUT of the element lambda — an in-lambda
    # sqrt(dot(v,v)) is re-evaluated per element by the interpreted HOF
    # (the pagerank lesson: one dot per row, not 64)
    nv = e.withColumn("nrm", F.sqrt(F.expr(_DOT.format(a="v", b="v")))).select(
        "source",
        F.expr(
            "transform(v, x -> cast(cast(round(1000000 * x / nrm) as bigint) as double))"
        ).alias("u"),
    )
    nv = nv.localCheckpoint()  # feeds the dim sums AND the count
    dims = (
        nv.select("source", F.posexplode("u").alias("i", "x"))
        .withColumn("xq", F.col("x").cast("long"))
        .groupBy("source", "i")
        .agg(
            F.sum("xq").cast("long").alias("s"),
            F.sum(F.expr("xq * xq")).cast("long").alias("ss"),
        )
    )
    agg = dims.groupBy("source").agg(
        F.sum(F.expr("s * s")).cast("long").alias("sum_sq"),
        F.sum("ss").cast("long").alias("self_sq"),
    )
    cnt = nv.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        cnt.join(agg, "source")
        .select(
            "source",
            "n",
            F.expr(
                "CASE WHEN n < 2 THEN 0"
                " ELSE CAST(round((CAST(sum_sq AS DOUBLE) - self_sq)"
                " / (CAST(n AS DOUBLE) * (n - 1)) / 1000000.0) AS BIGINT) END"
            ).alias("mean_pair_cos_q6"),
        )
        .orderBy("source")
    )


@register(
    "lsh_assortativity",
    _SQL_LSH_PAIRS
    + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
de AS (
  SELECT da.d AS x, db.d AS y
  FROM edges e JOIN deg da ON da.id = e.src JOIN deg db ON db.id = e.dst),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(COALESCE(sum(x), 0) AS BIGINT) AS sx,
         CAST(COALESCE(sum(y), 0) AS BIGINT) AS sy,
         CAST(COALESCE(sum(x * x), 0) AS BIGINT) AS sxx,
         CAST(COALESCE(sum(y * y), 0) AS BIGINT) AS syy,
         CAST(COALESCE(sum(x * y), 0) AS BIGINT) AS sxy
  FROM de)
SELECT m,
       CASE WHEN m = 0 OR m * sxx = sx * sx OR m * syy = sy * sy THEN 0
            ELSE CAST(round(1000000 * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
       END AS assortativity_q6
FROM s""",
)
def lsh_assortativity(spark, sf_dir):
    """Degree assortativity of the near-dup candidate graph (Newman
    2002): Pearson correlation of endpoint degrees over DIRECTED edge
    instances — do heavy near-dup nodes link to other heavy nodes
    (mirror farms interlinking → positive) or to leaves (one template
    spraying one-off copies → negative)? The last summary statistic of
    the graph family (degrees, triangles, cores, components, AA) and
    the shape diagnostic that picks between 'delete the cluster' and
    'keep one canonical per star'.

    Determinism: six exact BIGINT sufficient stats over integer degree
    pairs; the correlation is one guarded float expression (the
    matrix_stats sqrt-split rule).

    Scale shape: one degree agg + two broadcast-degree probes into the
    edge stream; the stats collapse map-side to one row."""
    edges = _lsh_pair_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    deg = deg.localCheckpoint()  # probed from BOTH endpoints
    da = deg.select(F.col("src").alias("esrc"), F.col("d").alias("x"))
    db = deg.select(F.col("src").alias("edst"), F.col("d").alias("y"))
    de = (
        edges.select(F.col("src").alias("esrc"), F.col("dst").alias("edst"))
        .join(da, "esrc")
        .join(db, "edst")
        .select("x", "y")
    )
    s = de.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("sx"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("sy"),
        F.coalesce(F.sum(F.expr("x * x")), F.lit(0)).cast("long").alias("sxx"),
        F.coalesce(F.sum(F.expr("y * y")), F.lit(0)).cast("long").alias("syy"),
        F.coalesce(F.sum(F.expr("x * y")), F.lit(0)).cast("long").alias("sxy"),
    )
    return s.select(
        "m",
        F.expr(
            "CASE WHEN m = 0 OR m * sxx = sx * sx OR m * syy = sy * sy THEN 0"
            " ELSE CAST(round(1000000 * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT) END"
        ).alias("assortativity_q6"),
    )


@register(
    "revenue_gini_users",
    """WITH ur AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id),
pos AS (SELECT cents FROM ur WHERE cents > 0),
hist AS (SELECT cents, CAST(count(*) AS BIGINT) AS nu FROM pos GROUP BY cents),
h AS (
  SELECT cents, nu,
         CAST(COALESCE(SUM(nu) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM hist),
s AS (
  SELECT CAST(COALESCE(sum(nu), 0) AS BIGINT) AS n,
         CAST(COALESCE(sum(nu * cents), 0) AS BIGINT) AS tot,
         CAST(COALESCE(sum(cents * (nu * cum_before + (nu * (nu + 1)) // 2)), 0) AS BIGINT) AS rw
  FROM h)
SELECT n, tot,
       CASE WHEN n < 2 OR tot = 0 THEN 0
            ELSE CAST(round(1000000.0 * (2.0 * rw / (CAST(n AS DOUBLE) * tot)
                 - (n + 1.0) / n)) AS BIGINT) END AS gini_q6
FROM s""",
)
def revenue_gini_users(spark, sf_dir):
    """Gini coefficient of per-user revenue — the single-number
    inequality summary next to revenue_pareto_users' curve (0 = everyone
    equal, →1 = one whale), via the SORTED formula G = 2Σrᵢxᵢ/(nΣx) −
    (n+1)/n decomposed over the value HISTOGRAM: a bin of nu tied users
    entering at cumulative position c contributes rank mass
    nu·c + nu(nu+1)/2 — an exact integer, so no user-table sort exists
    (the source_token_gini formula lifted onto the Pareto machinery).
    Non-positive totals are non-revenue users and excluded, declared.

    Determinism: all sums are exact BIGINTs ((nu·(nu+1))/2 is even-
    product-exact); the coefficient is one guarded float expression.

    Scale shape: user agg → value histogram → prefix window over
    histogram CELLS → 1-row stats."""
    ur = (
        _events(spark, sf_dir)
        .select("user_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .groupBy("user_id")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    hist = (
        ur.where(F.col("cents") > 0)
        .groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("nu"))
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    h = hist.select(
        "cents",
        "nu",
        F.coalesce(F.sum("nu").over(w), F.lit(0)).cast("long").alias("cum_before"),
    )
    s = h.agg(
        F.coalesce(F.sum("nu"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(F.expr("nu * cents")), F.lit(0)).cast("long").alias("tot"),
        F.coalesce(
            F.sum(F.expr("cents * (nu * cum_before + (nu * (nu + 1)) div 2)")), F.lit(0)
        )
        .cast("long")
        .alias("rw"),
    )
    return s.select(
        "n",
        "tot",
        F.expr(
            "CASE WHEN n < 2 OR tot = 0 THEN 0"
            " ELSE CAST(round(1000000.0 * (2.0 * rw / (CAST(n AS DOUBLE) * tot)"
            " - (n + 1.0) / n)) AS BIGINT) END"
        ).alias("gini_q6"),
    )


# ---------------------------------------------------------------------------
# session 66 — vocabulary growth curve, session durations, dup-pair distance
# ---------------------------------------------------------------------------


@register(
    "vocab_growth_curve",
    f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
toks AS (
  SELECT CAST((doc_id * 10) // n_docs AS BIGINT) AS decile,
         unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents CROSS JOIN nd),
fo AS (SELECT term, CAST(min(decile) AS BIGINT) AS first_decile FROM toks GROUP BY term),
per AS (SELECT first_decile AS decile, CAST(count(*) AS BIGINT) AS new_terms
        FROM fo GROUP BY first_decile),
spine AS (SELECT unnest(generate_series(0, 9)) AS decile)
SELECT CAST(spine.decile AS BIGINT) AS decile,
       CAST(COALESCE(per.new_terms, 0) AS BIGINT) AS new_terms,
       CAST(SUM(COALESCE(per.new_terms, 0)) OVER (ORDER BY spine.decile) AS BIGINT)
         AS vocab_so_far
FROM spine LEFT JOIN per ON per.decile = spine.decile
ORDER BY decile""",
)
def vocab_growth_curve(spark, sf_dir):
    """Empirical vocabulary-growth curve: NEW terms first seen in each
    doc_id decile plus the cumulative vocabulary — the measured Heaps
    curve (heaps_law_source fits the exponent; this is the raw curve the
    fit summarizes), and the OOV-rate planning input (a tokenizer frozen
    at decile 5 will miss exactly the later bars). A flat new-terms
    tail = closed vocabulary; a fat one = open-class drift.

    Determinism: first occurrence is min(decile) per term — exact; the
    cumulative runs over a 10-row spine.

    Scale shape: one vocab-keyed min agg (map-side combinable) then
    10-row tables; the spine LEFT JOIN keeps empty deciles visible."""
    nd = _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    toks = (
        _docs(spark, sf_dir)
        .crossJoin(F.broadcast(nd))
        .select(
            F.expr("cast((doc_id * 10) div n_docs as bigint)").alias("decile"),
            F.explode(spark_tokens("text")).alias("term"),
        )
    )
    fo = toks.groupBy("term").agg(F.min("decile").cast("long").alias("first_decile"))
    per = fo.groupBy(F.col("first_decile").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("new_terms")
    )
    spine = spark.createDataFrame([(d,) for d in range(10)], "decile long")
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        F.broadcast(spine)
        .join(per, "decile", "left")
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.coalesce(F.col("new_terms"), F.lit(0)).cast("long").alias("new_terms"),
        )
        .withColumn("vocab_so_far", F.sum("new_terms").over(w).cast("long"))
        .orderBy("decile")
    )


@register(
    "session_duration_histogram",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
g AS (
  SELECT user_id, t_us,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL THEN 1
              WHEN t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM t),
s AS (
  SELECT user_id, t_us,
         CAST(SUM(is_start) OVER (PARTITION BY user_id
           ORDER BY t_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM g),
d AS (
  SELECT user_id, session_id,
         CAST(max(t_us) - min(t_us) AS BIGINT) AS dur,
         CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, session_id),
b AS (
  SELECT CASE WHEN dur = 0 THEN -1
              ELSE CAST(length(bin(dur)) - 1 AS BIGINT) END AS bucket, n_events
  FROM d)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM b GROUP BY bucket ORDER BY bucket""",
)
def session_duration_histogram(spark, sf_dir):
    """Session-duration distribution under the 30-min-gap rule: sessions
    materialized by GAPS-AND-ISLANDS (session_id = running sum of
    is_start flags — the longest_shared_span decomposition applied to
    time), duration = last−first event µs, histogram in log2-µs buckets
    (bucket −1 = single-event bounce sessions, whose share IS the bounce
    rate). Completes the session family: count census
    (user_session_histogram), gap tuning (interevent_gap_histogram),
    now dwell time.

    Determinism: both windows order by (ts, event_id); running sums and
    durations are exact integers.

    Scale shape: TWO windows on the same user_id exchange (lag + running
    sum — one shuffle), a (user, session) agg, a ≤64-bucket rollup."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    g = t.select(
        "user_id",
        "t_us",
        "event_id",
        F.expr(
            f"CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            f" IS NULL THEN 1"
            f" WHEN t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            f" > {_SESSION_GAP_US} THEN 1 ELSE 0 END"
        ).alias("is_start"),
    )
    s = g.select(
        "user_id",
        "t_us",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_id"),
    )
    d = s.groupBy("user_id", "session_id").agg(
        (F.max("t_us") - F.min("t_us")).cast("long").alias("dur"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    b = d.select(
        F.expr(
            "CASE WHEN dur = 0 THEN -1 ELSE CAST(length(bin(dur)) - 1 AS BIGINT) END"
        ).alias("bucket"),
        "n_events",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy("bucket")
    )


@register(
    "dup_pair_distance_histogram",
    _SQL_LSH_PAIRS
    + """
SELECT CASE WHEN doc_b - doc_a = 0 THEN -1
            ELSE CAST(length(bin(doc_b - doc_a)) - 1 AS BIGINT) END AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY bucket ORDER BY bucket""",
)
def dup_pair_distance_histogram(spark, sf_dir):
    """Near-dup pair LOCALITY: histogram of log2(doc_id distance) over
    the LSH candidate pairs — are duplicates ingestion-neighbors (small
    gaps: re-crawls, pagination echoes — a streaming window dedup
    catches them) or long-range (mirrors across the corpus — only the
    global LSH pass sees those)? The knob this tunes is REAL: a bounded
    dedup window is orders cheaper than global LSH, and this curve says
    what it would miss.

    Scale shape: the memoized candidate pairs, one map-side bucket key,
    a ≤64-bucket agg."""
    pairs = (
        _lsh_pair_edges(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    )
    b = pairs.select(
        F.expr(
            "CASE WHEN doc_b - doc_a = 0 THEN -1"
            " ELSE CAST(length(bin(doc_b - doc_a)) - 1 AS BIGINT) END"
        ).alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 67 — part-revenue Pareto, language drift, ship-lag histogram
# ---------------------------------------------------------------------------


@register(
    "part_revenue_pareto",
    f"""WITH pr AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(100 * l_extendedprice * (1 - l_discount)) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY l_partkey),
hist AS (SELECT cents, CAST(count(*) AS BIGINT) AS np FROM pr GROUP BY cents),
h AS (
  SELECT cents, np,
         CAST(COALESCE(SUM(np) OVER (ORDER BY cents DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM hist),
tot AS (SELECT CAST(COALESCE(sum(np), 0) AS BIGINT) AS n_parts,
               CAST(COALESCE(sum(np * cents), 0) AS BIGINT) AS rev FROM hist),
p AS (SELECT p_q6 FROM (VALUES (100000), (10000)) AS v(p_q6)),
kk AS (SELECT p_q6, CAST((p_q6 * n_parts + 999999) // 1000000 AS BIGINT) AS k FROM p, tot),
top AS (
  SELECT kk.p_q6, kk.k,
         CAST(COALESCE(sum(CASE
           WHEN h.cum_before + h.np <= kk.k THEN h.np * h.cents
           WHEN h.cum_before < kk.k THEN (kk.k - h.cum_before) * h.cents
           ELSE 0 END), 0) AS BIGINT) AS rev_top
  FROM kk LEFT JOIN h ON TRUE GROUP BY kk.p_q6, kk.k)
SELECT top.p_q6, top.k AS k_parts, top.rev_top,
       CASE WHEN tot.rev = 0 THEN 0
            ELSE CAST(round(1000000.0 * top.rev_top / tot.rev) AS BIGINT) END AS share_q6
FROM top, tot ORDER BY p_q6 DESC""",
)
def part_revenue_pareto(spark, sf_dir):
    """Catalog concentration: the share of discounted revenue carried by
    the top 10% / 1% of PARTS — revenue_pareto_users' machinery pointed
    at the TPC-H fact table (the assortment-planning readout: a catalog
    where 1% of SKUs carry half the revenue prunes its long tail). Money
    follows the Q1 rule: cents = round(100·extprice·(1−disc)) per ROW,
    exact BIGINT sums after.

    Scale shape: one partkey agg, histogram over DISTINCT revenue
    values, prefix window over cells, 2-row output — no part-table
    sort."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.expr("CAST(round(100 * l_extendedprice * (1 - l_discount)) AS BIGINT)").alias("c"),
    )
    pr = li.groupBy("l_partkey").agg(F.sum("c").cast("long").alias("cents"))
    hist = pr.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("np"))
    hist = hist.localCheckpoint()
    w = Window.orderBy(F.desc("cents")).rowsBetween(Window.unboundedPreceding, -1)
    h = hist.select(
        "cents",
        "np",
        F.coalesce(F.sum("np").over(w), F.lit(0)).cast("long").alias("cum_before"),
    )
    tot = hist.agg(
        F.coalesce(F.sum("np"), F.lit(0)).cast("long").alias("n_parts"),
        F.coalesce(F.sum(F.expr("np * cents")), F.lit(0)).cast("long").alias("rev"),
    )
    p = spark.createDataFrame([(100000,), (10000,)], "p_q6 long")
    kk = F.broadcast(p).crossJoin(F.broadcast(tot)).select(
        "p_q6", F.expr("CAST((p_q6 * n_parts + 999999) div 1000000 AS BIGINT)").alias("k")
    )
    top = (
        F.broadcast(kk)
        .join(h, F.lit(True), "left")
        .groupBy("p_q6", "k")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN cum_before + np <= k THEN np * cents"
                        " WHEN cum_before < k THEN (k - cum_before) * cents"
                        " ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("rev_top")
        )
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "p_q6",
            F.col("k").alias("k_parts"),
            "rev_top",
            F.expr(
                "CASE WHEN rev = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * rev_top / rev) AS BIGINT) END"
            ).alias("share_q6"),
        )
        .orderBy(F.desc("p_q6"))
    )


@register(
    "lang_drift_deciles",
    """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
t AS (
  SELECT CAST((doc_id * 10) // n_docs AS BIGINT) AS decile, lang
  FROM documents CROSS JOIN nd),
c AS (SELECT decile, lang, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY decile, lang),
dt AS (SELECT decile, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY decile)
SELECT c.decile, c.lang, c.n,
       CAST(round(1000000.0 * c.n / dt.tot) AS BIGINT) AS share_q6
FROM c JOIN dt USING (decile) ORDER BY c.decile, c.lang""",
)
def lang_drift_deciles(spark, sf_dir):
    """Language-mix drift: per doc_id decile, each language's document
    share — the LANG axis of the drift-monitor family (terms:
    term_drift_deciles; quality: quality_drift_deciles; this one catches
    a crawl whose language mix shifts over time, which silently re-weights
    every lang-conditional stage downstream). Flat shares on the
    stationary sandbox are the healthy reading.

    Scale shape: map-side keys, a ≤10×|langs| agg, shares from a 10-row
    broadcast."""
    nd = _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    t = (
        _docs(spark, sf_dir)
        .crossJoin(F.broadcast(nd))
        .select(
            F.expr("cast((doc_id * 10) div n_docs as bigint)").alias("decile"), "lang"
        )
    )
    c = t.groupBy("decile", "lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    c = c.localCheckpoint()  # feeds the decile totals AND the share join
    dt = c.groupBy("decile").agg(F.sum("n").cast("long").alias("tot"))
    return (
        c.join(F.broadcast(dt), "decile")
        .select(
            "decile",
            "lang",
            "n",
            F.expr("CAST(round(1000000.0 * n / tot) AS BIGINT)").alias("share_q6"),
        )
        .orderBy("decile", "lang")
    )


@register(
    "ship_lag_histogram",
    f"""WITH j AS (
  SELECT o.o_orderpriority AS priority,
         epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // {_US_PER_DAY}
           - epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // {_US_PER_DAY} AS lag_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
b AS (
  SELECT priority,
         CASE WHEN lag_days <= 0 THEN -1
              ELSE CAST(length(bin(lag_days)) - 1 AS BIGINT) END AS bucket
  FROM j)
SELECT priority, bucket, CAST(count(*) AS BIGINT) AS n_items
FROM b GROUP BY priority, bucket ORDER BY priority, bucket""",
)
def ship_lag_histogram(spark, sf_dir):
    """Fulfillment-latency distribution: log2-day histogram of
    (shipdate − orderdate) per order priority — the SLA curve behind
    TPC-H Q12's two-bucket summary (Q12 counts late-vs-priority; this
    shows the whole latency shape per priority class, which is what an
    ops dashboard actually plots). Same-day-or-earlier ships land in
    bucket −1.

    Scale shape: one orderkey join (both sides unbounded, un-hinted —
    AQE decides), map-side integer day subtraction, a ≤|priorities|×64
    agg."""
    j = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority", "o_orderdate"
            ),
            "l_orderkey",
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.expr(
                f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_US_PER_DAY}"
                f" - unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_PER_DAY}"
            ).alias("lag_days"),
        )
    )
    b = j.select(
        "priority",
        F.expr(
            "CASE WHEN lag_days <= 0 THEN -1"
            " ELSE CAST(length(bin(lag_days)) - 1 AS BIGINT) END"
        ).alias("bucket"),
    )
    return (
        b.groupBy("priority", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        .orderBy("priority", "bucket")
    )


# ---------------------------------------------------------------------------
# session 68 — intrinsic dimension, discount elasticity, order sizes
# ---------------------------------------------------------------------------


@register(
    "embedding_intrinsic_dim",
    _SQL_EMB_E
    + _coarse_ctes()
    + """
px AS (
  SELECT ca3.ccid, a.vec_id AS qid, b.vec_id AS nid,
         CAST(round(1000000 * list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))
           AS BIGINT) AS cos_q6
  FROM ca3 JOIN e a ON a.vec_id = ca3.vec_id
  JOIN ca3 cb ON cb.ccid = ca3.ccid AND cb.vec_id <> ca3.vec_id
  JOIN e b ON b.vec_id = cb.vec_id),
rk AS (
  SELECT qid, cos_q6,
         row_number() OVER (PARTITION BY qid ORDER BY cos_q6 DESC, nid ASC) AS rn
  FROM px),
two AS (
  SELECT qid,
         max(CASE WHEN rn = 1 THEN cos_q6 END) AS c1,
         max(CASE WHEN rn = 2 THEN cos_q6 END) AS c2
  FROM rk WHERE rn <= 2 GROUP BY qid),
mu AS (
  SELECT qid,
         CAST(round(1000000 * ln(sqrt(greatest(2000000 - 2 * c2, 1)
              / CAST(greatest(2000000 - 2 * c1, 1) AS DOUBLE)))) AS BIGINT) AS lmu_q6
  FROM two WHERE c2 IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_points,
       CAST(COALESCE(sum(lmu_q6), 0) AS BIGINT) AS sum_lmu_q6,
       CASE WHEN COALESCE(sum(lmu_q6), 0) <= 0 THEN 0
            ELSE CAST(round(1000000.0 * count(*)
                 / (COALESCE(sum(lmu_q6), 0) / 1000000.0)) AS BIGINT)
       END AS id_q6
FROM mu""",
)
def embedding_intrinsic_dim(spark, sf_dir):
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017) of the
    embedding manifold: per vector, the ratio μ = r₂/r₁ of its two
    nearest-neighbor distances, d̂ = n / Σ ln μ — the
    is-my-64-dim-space-really-64-dimensional audit that sizes PCA
    truncation and PQ budgets (ann_dim_truncation_curve measures recall
    loss; this predicts it from geometry). Neighbors come from WITHIN
    each trained-IVF cell (the semdedup blocking rule — exact 2-NN is an
    all-pairs problem; in-cell 2-NN is the documented approximation and
    biases d̂ at cell boundaries only). Unit-sphere distances derive
    from cosines: r² = 2 − 2cos, so ln μ = ln √((2−2c₂)/(2−2c₁)) —
    per-point q6-rounded FIRST, with a 1-µunit floor against exact-
    duplicate neighbors (r₁ = 0).

    Scale shape: in-cell pairs come from the memoized
    `_incell_pair_cos` table (cosq pipeline, swapped-union directed
    view); per-point top-2 is a qid window over in-cell rows; the
    estimator is a 1-row reduction. On i.i.d. 64-dim sandbox vectors d̂
    lands far above real-data manifolds — the honest reading (real
    embeddings report 10-20).
    """
    upq = _incell_pair_cos(spark, sf_dir).select(
        F.col("id_a").alias("qid"),
        F.col("id_b").alias("nid"),
        F.col("cosq_q6").alias("cos_q6"),
    )
    pairs = upq.unionByName(
        upq.select(
            F.col("nid").alias("qid"),
            F.col("qid").alias("nid"),
            F.col("cos_q6"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_q6"), F.asc("nid"))
    rk = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
    two = rk.groupBy("qid").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cos_q6"))).alias("c1"),
        F.max(F.when(F.col("rn") == 2, F.col("cos_q6"))).alias("c2"),
    )
    mu = two.where(F.col("c2").isNotNull()).select(
        F.expr(
            "CAST(round(1000000 * ln(sqrt(greatest(2000000 - 2 * c2, 1)"
            " / CAST(greatest(2000000 - 2 * c1, 1) AS DOUBLE)))) AS BIGINT)"
        ).alias("lmu_q6")
    )
    return mu.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.coalesce(F.sum("lmu_q6"), F.lit(0)).cast("long").alias("sum_lmu_q6"),
    ).select(
        "n_points",
        "sum_lmu_q6",
        F.expr(
            "CASE WHEN sum_lmu_q6 <= 0 THEN 0"
            " ELSE CAST(round(1000000.0 * n_points / (sum_lmu_q6 / 1000000.0)) AS BIGINT) END"
        ).alias("id_q6"),
    )


@register(
    "discount_quantity_corr",
    """WITH t AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS d_bp,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d_bp) AS BIGINT) AS sx, CAST(sum(q) AS BIGINT) AS sy,
             CAST(sum(d_bp * d_bp) AS BIGINT) AS sxx, CAST(sum(q * q) AS BIGINT) AS syy,
             CAST(sum(d_bp * q) AS BIGINT) AS sxy
      FROM t)
SELECT n,
       CASE WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy THEN 0
            ELSE CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
       END AS corr_q6
FROM s""",
)
def discount_quantity_corr(spark, sf_dir):
    """Discount elasticity smell test: Pearson correlation between the
    line-item discount (integer percent points) and the quantity — 'does
    discounting move volume?', the first chart of every pricing review
    (TPC-H's generator draws them independently, so ≈0 is the correct
    sandbox reading — a real sales table shows the positive elasticity).
    Six exact BIGINT sufficient statistics, one guarded float expression
    (the matrix_stats split-sqrt rule).

    Scale shape: one map-side-combined pass to a single row."""
    t = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("d_bp"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    s = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d_bp").cast("long").alias("sx"),
        F.sum("q").cast("long").alias("sy"),
        F.sum(F.expr("d_bp * d_bp")).cast("long").alias("sxx"),
        F.sum(F.expr("q * q")).cast("long").alias("syy"),
        F.sum(F.expr("d_bp * q")).cast("long").alias("sxy"),
    )
    return s.select(
        "n",
        F.expr(
            "CASE WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy THEN 0"
            " ELSE CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT) END"
        ).alias("corr_q6"),
    )


@register(
    "order_size_histogram",
    """WITH c AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items FROM lineitem GROUP BY l_orderkey)
SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY n_items ORDER BY n_items""",
)
def order_size_histogram(spark, sf_dir):
    """Items-per-order census — the basket-size distribution behind Q13's
    per-customer version and the shuffle-skew input for every
    orderkey-keyed join (a fat basket tail is the key-skew the AQE
    skew-join handles; this measures whether it exists). All-integer.

    Scale shape: one orderkey agg (map-side combinable) then a tiny
    histogram rollup."""
    c = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )
    return (
        c.groupBy("n_items")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("n_items")
    )


# ---------------------------------------------------------------------------
# session 69 — supplier HHI, return rates, simhash bit bias
# ---------------------------------------------------------------------------


@register(
    "part_supplier_hhi",
    """WITH ps AS (
  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey),
pt AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS qt,
              CAST(count(*) AS BIGINT) AS n_supp
       FROM ps GROUP BY l_partkey),
sh AS (
  SELECT ps.l_partkey,
         CAST(round(1000000.0 * ps.q * ps.q / (CAST(pt.qt AS DOUBLE) * pt.qt)) AS BIGINT)
           AS sh2_q6
  FROM ps JOIN pt USING (l_partkey)),
hhi AS (
  SELECT sh.l_partkey, CAST(sum(sh2_q6) AS BIGINT) AS hhi_q6
  FROM sh GROUP BY sh.l_partkey)
SELECT hhi.l_partkey AS partkey, pt.n_supp, pt.qt AS quantity, hhi.hhi_q6
FROM hhi JOIN pt USING (l_partkey)
WHERE pt.n_supp >= 2
ORDER BY hhi_q6 DESC, partkey ASC LIMIT 20""",
)
def part_supplier_hhi(spark, sf_dir):
    """Supply-concentration audit: the Herfindahl-Hirschman index of each
    part's supplier quantity shares — the antitrust / supply-risk statistic
    (HHI → 1e6 = one supplier carries the part; ≤ 2.5e5 ≈ 'competitive').
    Top-20 most concentrated MULTI-supplier parts (single-supplier parts
    are trivially 1e6 and excluded — the interesting risk is masked
    concentration among several suppliers).

    Determinism: per-(part, supplier) share² is one q6-rounded float
    expression of exact integers (q²/qt² with the divide-first double
    product in the denominator); the HHI sums quantized contributions.

    Scale shape: a (part, supplier) agg; totals derive FROM it (shared
    partkey exchange); TakeOrdered(20)."""
    ps = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    ps = ps.localCheckpoint()  # feeds totals AND the share rows
    pt = ps.groupBy("l_partkey").agg(
        F.sum("q").cast("long").alias("qt"), F.count(F.lit(1)).cast("long").alias("n_supp")
    )
    sh = ps.join(pt, "l_partkey").select(
        "l_partkey",
        F.expr(
            "CAST(round(1000000.0 * q * q / (CAST(qt AS DOUBLE) * qt)) AS BIGINT)"
        ).alias("sh2_q6"),
    )
    hhi = sh.groupBy("l_partkey").agg(F.sum("sh2_q6").cast("long").alias("hhi_q6"))
    return (
        hhi.join(pt, "l_partkey")
        .where(F.col("n_supp") >= 2)
        .select(
            F.col("l_partkey").alias("partkey"),
            "n_supp",
            F.col("qt").alias("quantity"),
            "hhi_q6",
        )
        .orderBy(F.desc("hhi_q6"), F.asc("partkey"))
        .limit(20)
    )


@register(
    "return_rate_by_priority",
    """WITH j AS (
  SELECT o.o_orderpriority AS priority, l.l_returnflag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(COALESCE(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_returned,
       CAST(round(1000000.0 * COALESCE(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END), 0)
            / count(*)) AS BIGINT) AS return_rate_q6
FROM j GROUP BY priority ORDER BY priority""",
)
def return_rate_by_priority(spark, sf_dir):
    """Return-rate census by order priority — the fulfillment-quality
    readout crossing Q10's returned-items analysis with Q12's priority
    axis (a priority class with an elevated R-flag share has a handling
    problem). One keyed join, conditional counts, a single float
    division per row.

    Scale shape: the un-hinted orderkey join (both sides unbounded, AQE
    decides), then a ≤|priorities|-row agg."""
    j = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_returnflag")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
            ),
            "l_orderkey",
        )
    )
    return (
        j.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.coalesce(
                F.sum(F.expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END")), F.lit(0)
            )
            .cast("long")
            .alias("n_returned"),
            F.expr(
                "CAST(round(1000000.0 * COALESCE(sum(CASE WHEN l_returnflag = 'R'"
                " THEN 1 ELSE 0 END), 0) / count(*)) AS BIGINT)"
            ).alias("return_rate_q6"),
        )
        .orderBy("priority")
    )


@register(
    "simhash_bit_bias",
    _SIMHASH_CTE
    + """,
bitsx AS (
  SELECT j, CAST(count(*) AS BIGINT) AS n,
         CAST(COALESCE(sum((simhash >> j) & 1), 0) AS BIGINT) AS ones
  FROM sh, (SELECT unnest(generate_series(0, 59)) AS j)
  GROUP BY j)
SELECT CAST(j AS BIGINT) AS bit, ones, n,
       CAST(round(1000000.0 * ones / n) AS BIGINT) AS share_q6,
       CAST(abs(CAST(round(1000000.0 * ones / n) AS BIGINT) - 500000) AS BIGINT) AS bias_q6
FROM bitsx ORDER BY bit""",
)
def simhash_bit_bias(spark, sf_dir):
    """SimHash bit-balance audit: the share of documents with each of the
    60 sketch bits set, and its deviation from the unbiased 50% — the
    sketch-HEALTH diagnostic behind every banded op (a biased bit family
    concentrates band values, inflating collision candidates exactly
    like a hot shard; corpus-wide common terms bias bits in the
    direction of their hash, and this table shows it before the banding
    pays for it).

    Scale shape: the per-doc simhash table (the sketch ops' own front
    half), a 60-way map-side bit explode into a 60-row agg."""
    sh = _simhash_spark(spark, sf_dir)
    bits = (
        sh.select(
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("j"), "simhash"
        )
        .groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum(F.expr("(simhash >> j) & 1")), F.lit(0))
            .cast("long")
            .alias("ones"),
        )
    )
    return bits.select(
        F.col("j").cast("long").alias("bit"),
        "ones",
        "n",
        F.expr("CAST(round(1000000.0 * ones / n) AS BIGINT)").alias("share_q6"),
        F.expr(
            "CAST(abs(CAST(round(1000000.0 * ones / n) AS BIGINT) - 500000) AS BIGINT)"
        ).alias("bias_q6"),
    ).orderBy("bit")


# ---------------------------------------------------------------------------
# session 70 — winsorized mean, hour×weekday heatmap, Hellinger distance
# ---------------------------------------------------------------------------

_WINSOR_LO, _WINSOR_HI = 50_000, 950_000  # p5 / p95 in q6


@register(
    "winsorized_mean_doclen",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
hist AS (SELECT n_tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY n_tok),
h AS (
  SELECT n_tok, cnt,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY n_tok
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM hist),
-- integer rank cutoffs: lo = floor(p5·(n−1)), hi = ceil(p95·(n−1)) as 0-based ranks
kk AS (
  SELECT CAST(({_WINSOR_LO} * (max(n) - 1)) // 1000000 AS BIGINT) AS k_lo,
         CAST(({_WINSOR_HI} * (max(n) - 1) + 999999) // 1000000 AS BIGINT) AS k_hi,
         max(n) AS n
  FROM h),
bv AS (
  SELECT
    (SELECT max(CASE WHEN cum_before <= kk.k_lo THEN n_tok END) FROM h) AS v_lo,
    (SELECT max(CASE WHEN cum_before <= kk.k_hi THEN n_tok END) FROM h) AS v_hi,
    kk.n
  FROM kk),
wz AS (
  SELECT h.cnt,
         CASE WHEN h.n_tok < bv.v_lo THEN bv.v_lo
              WHEN h.n_tok > bv.v_hi THEN bv.v_hi
              ELSE h.n_tok END AS x
  FROM h, bv)
SELECT bv.n, bv.v_lo AS clip_lo, bv.v_hi AS clip_hi,
       CAST(round((SELECT sum(cnt * x) FROM wz) / CAST(bv.n AS DOUBLE)) AS BIGINT)
         AS winsor_mean
FROM bv""",
)
def winsorized_mean_doclen(spark, sf_dir):
    """5%-winsorized mean document length: values below the p5 order
    statistic clip UP to it, above p95 clip DOWN, then the plain mean —
    the robust center that keeps tail MASS (unlike a trimmed mean) while
    killing tail LEVERAGE (unlike the raw mean a single 10M-token doc
    drags; the MAD gives robust SPREAD — this is its location partner).
    Clip points are exact order statistics (rank floor(p·(n−1)) /
    ceil(p·(n−1)) — integer ceil via the additive identity).

    Scale shape: the weighted-histogram machinery end to end — the
    probes, the clip, and the mean all run over histogram CELLS; no raw
    value is ever buffered (the percentile rule).

    Determinism: all-integer until the single final division."""
    t = _docs(spark, sf_dir).select(
        F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    hist = t.groupBy("n_tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    hist = hist.localCheckpoint()
    w_cum = Window.orderBy("n_tok").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("n_tok").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "n_tok",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    ).localCheckpoint()  # feeds cutoffs, clip values AND the clipped mean
    kk = h.agg(
        F.expr(f"CAST(({_WINSOR_LO} * (max(n) - 1)) div 1000000 AS BIGINT)").alias("k_lo"),
        F.expr(
            f"CAST(({_WINSOR_HI} * (max(n) - 1) + 999999) div 1000000 AS BIGINT)"
        ).alias("k_hi"),
    )
    bv = (
        h.crossJoin(F.broadcast(kk))
        .agg(
            F.max(F.when(F.col("cum_before") <= F.col("k_lo"), F.col("n_tok"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.col("k_hi"), F.col("n_tok"))).alias("v_hi"),
            F.max("n").alias("n"),
        )
    )
    wz = (
        h.select("n_tok", "cnt")
        .crossJoin(F.broadcast(bv))
        .select(
            "cnt",
            "n",
            "v_lo",
            "v_hi",
            F.expr(
                "CASE WHEN n_tok < v_lo THEN v_lo WHEN n_tok > v_hi THEN v_hi"
                " ELSE n_tok END"
            ).alias("x"),
        )
    )
    return wz.groupBy("n", "v_lo", "v_hi").agg(
        F.expr("CAST(round(sum(cnt * x) / CAST(max(n) AS DOUBLE)) AS BIGINT)").alias(
            "winsor_mean"
        )
    ).select(
        "n",
        F.col("v_lo").alias("clip_lo"),
        F.col("v_hi").alias("clip_hi"),
        "winsor_mean",
    )


@register(
    "events_hour_weekday_heatmap",
    f"""WITH e AS (
  SELECT ((epoch_us(ts) // {_US_PER_DAY}) + 3) % 7 AS dow,
         (epoch_us(ts) // 3600000000) % 24 AS hour
  FROM events)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY dow, hour ORDER BY dow, hour""",
)
def events_hour_weekday_heatmap(spark, sf_dir):
    """Hour × weekday activity heatmap (UTC; dow 0 = Monday, the
    events_weekday_profile rule) — the 2-D seasonality surface whose two
    marginals are events_hour_profile and events_weekday_profile (a
    weekday-lunchtime spike and a weekend-evening one have identical
    marginals; only the heatmap separates them). Observed cells only —
    the two 1-D spines already pin the calendar.

    Scale shape: two map-side integer keys into a ≤168-cell agg."""
    e = _events(spark, sf_dir).select(
        F.expr(
            f"((unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}) + 3) % 7"
        ).alias("dow"),
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24").alias("hour"),
    )
    return (
        e.groupBy(
            F.col("dow").cast("long").alias("dow"),
            F.col("hour").cast("long").alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("dow", "hour")
    )


# Hellinger affinity per shared term, q6-first: BC contribution
# sqrt(pa·pb); single-source terms contribute 0 to BC by construction, so
# no pairs×vocab spine is needed — the JSD decomposition made trivial.
_HELL_TERM_EXPR = (
    "cast(round(1000000 * sqrt((ca / cast(na as double))"
    " * (cb / cast(nb as double)))) as bigint)"
)


@register(
    "hellinger_source_pairs",
    f"""WITH w AS ({SQL_WORDS}),
st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
       FROM (SELECT source, unnest(words) AS term FROM w) GROUP BY source, term),
stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY source),
ix AS (
  SELECT a.source AS src_a, b.source AS src_b, a.c AS ca, b.c AS cb
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source),
ij AS (
  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared,
         CAST(sum({_HELL_TERM_EXPR.replace('na', 'ta.n').replace('nb', 'tb.n')}) AS BIGINT)
           AS bc_q6
  FROM ix JOIN stot ta ON ta.source = ix.src_a JOIN stot tb ON tb.source = ix.src_b
  GROUP BY src_a, src_b)
SELECT src_a, src_b, n_shared,
       CAST(greatest(1000000 - bc_q6, 0) AS BIGINT) AS hellinger2_q6
FROM ij ORDER BY src_a, src_b""",
)
def hellinger_source_pairs(spark, sf_dir):
    """Squared Hellinger distance between source unigram LMs: H² = 1 −
    Σ√(pa·pb) — the BOUNDED, metric-friendly member of the divergence
    family (KL explodes on disjoint support, JSD needs the residual-mass
    decomposition; Hellinger's Bhattacharyya coefficient simply ignores
    single-source terms, so the pair join over CO-OCCURRING terms is the
    whole computation). H² respects √H as a true metric — the one you
    can feed to clustering.

    Determinism: per-shared-term BC contribution q6-rounds FIRST (one
    sqrt per term); H² = max(1e6 − ΣBC, 0) — the clamp absorbs the
    +ulp-per-term rounding that could push BC past 1e6.

    Scale shape: identical to jsd_source_pairs minus its residual stage
    — term-keyed pair join, |sources|² bounded fanout, broadcast
    totals."""
    st = (
        _docs(spark, sf_dir)
        .select("source", F.explode(spark_tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
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
            F.sum(F.expr(_HELL_TERM_EXPR)).cast("long").alias("bc_q6"),
        )
    )
    return ij.select(
        "src_a",
        "src_b",
        "n_shared",
        F.expr("CAST(greatest(1000000 - bc_q6, 0) AS BIGINT)").alias("hellinger2_q6"),
    ).orderBy("src_a", "src_b")


# ---------------------------------------------------------------------------
# session 71 — abbreviation law, norm/length QA, per-source dedup loss
# ---------------------------------------------------------------------------


@register(
    "abbreviation_law_curve",
    f"""WITH toks AS ({SQL_TOKS}),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
b AS (
  SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS band,
         CAST(length(term) AS BIGINT) AS len, c
  FROM cf)
SELECT band, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(c) AS BIGINT) AS tokens,
       CAST(round(sum(len) / CAST(count(*) AS DOUBLE) * 1000000) AS BIGINT)
         AS mean_len_q6
FROM b GROUP BY band ORDER BY band""",
)
def abbreviation_law_curve(spark, sf_dir):
    """Zipf's law of ABBREVIATION: mean term length per log2
    collection-frequency band — the third classical linguistic law in
    the audit family (rank-frequency: zipf_slope_source; vocabulary
    growth: heaps_law_source; now frequency-length). Natural language
    slopes DOWN (frequent words are short — the compression argument);
    a corpus that doesn't (codes, ids, synthetic text) isn't prose, and
    that's a data-quality signal per se. The uniform sandbox vocabulary
    is flat — the expected reading.

    Scale shape: the A2 cf agg then a ≤64-band rollup; mean divides
    exact sums once per band."""
    cf = _toks(_docs(spark, sf_dir)).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    b = cf.select(
        F.expr("CAST(length(bin(c)) - 1 AS BIGINT)").alias("band"),
        F.length("term").cast("long").alias("len"),
        "c",
    )
    return (
        b.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("c").cast("long").alias("tokens"),
            F.expr(
                "CAST(round(sum(len) / CAST(count(*) AS DOUBLE) * 1000000) AS BIGINT)"
            ).alias("mean_len_q6"),
        )
        .orderBy("band")
    )


@register(
    "norm_doclen_corr",
    f"""WITH t AS (
  SELECT em.vec_id,
         CAST(round(1000 * sqrt(list_dot_product(CAST(em.embedding AS DOUBLE[]),
                                                 CAST(em.embedding AS DOUBLE[])))) AS BIGINT)
           AS nq3,
         CAST(len(regexp_extract_all(lower(d.text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id
  WHERE em.vec_id <> 0),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(nq3) AS BIGINT) AS sx, CAST(sum(n_tok) AS BIGINT) AS sy,
             CAST(sum(nq3 * nq3) AS BIGINT) AS sxx, CAST(sum(n_tok * n_tok) AS BIGINT) AS syy,
             CAST(sum(nq3 * n_tok) AS BIGINT) AS sxy
      FROM t)
SELECT n,
       CASE WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy THEN 0
            ELSE CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
       END AS corr_q6
FROM s""",
)
def norm_doclen_corr(spark, sf_dir):
    """Cross-modal leak audit: Pearson correlation between a document's
    embedding NORM and its token length — a properly normalized encoder
    shows ≈0; a strong correlation means the vector index is silently a
    length index, and every cosine-adjacent op (kNN, semdedup,
    centroids) inherits a length bias (the embedding-QA family member
    that looks ACROSS modalities; norms alone: embedding_norm_outliers).
    Norms quantize at q3 (the norm_outliers envelope rule: q6 squares
    would pass 2^63 in the sufficient sums at corpus scale).

    Scale shape: one id-keyed join of the two tables (both unbounded,
    un-hinted), a single-row sufficient-stats agg."""
    t = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.expr(
                "CAST(round(1000 * sqrt(aggregate(zip_with(transform(embedding, x -> cast(x as double)),"
                " transform(embedding, x -> cast(x as double)), (a, b) -> a * b),"
                " cast(0.0 as double), (acc, v) -> acc + v))) AS BIGINT)"
            ).alias("nq3"),
        )
        .join(
            _docs(spark, sf_dir).select(
                F.col("doc_id").alias("vec_id"),
                F.size(spark_tokens("text")).cast("long").alias("n_tok"),
            ),
            "vec_id",
        )
    )
    s = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("nq3").cast("long").alias("sx"),
        F.sum("n_tok").cast("long").alias("sy"),
        F.sum(F.expr("nq3 * nq3")).cast("long").alias("sxx"),
        F.sum(F.expr("n_tok * n_tok")).cast("long").alias("syy"),
        F.sum(F.expr("nq3 * n_tok")).cast("long").alias("sxy"),
    )
    return s.select(
        "n",
        F.expr(
            "CASE WHEN n < 2 OR n * sxx = sx * sx OR n * syy = sy * sy THEN 0"
            " ELSE CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT) END"
        ).alias("corr_q6"),
    )


@register(
    "dedup_loss_by_source",
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
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
fl AS (
  SELECT t.source, t.n_tok,
         CAST(comp.cluster_id IS NOT NULL AND comp.cluster_id <> t.doc_id AS INT) AS dropped
  FROM t LEFT JOIN comp ON comp.doc_id = t.doc_id)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sum(dropped), 0) AS BIGINT) AS docs_dropped,
       CAST(COALESCE(sum(dropped * n_tok), 0) AS BIGINT) AS tokens_dropped,
       CASE WHEN COALESCE(sum(n_tok), 0) = 0 THEN 0
            ELSE CAST(round(1000000.0 * COALESCE(sum(dropped * n_tok), 0)
                 / sum(n_tok)) AS BIGINT) END AS loss_q6
FROM fl GROUP BY source ORDER BY source""",
)
def dedup_loss_by_source(spark, sf_dir):
    """Near-dup dedup loss per SOURCE under the canonical keep-min-id
    policy — the MIX-SHIFT view the corpus-level dedup ops hide: dedup
    does not remove tokens uniformly, it RE-WEIGHTS the source mix (a
    mirror-heavy source loses half its mass and every downstream
    temperature/epoch plan computed on pre-dedup counts is silently
    wrong). Per source: docs/tokens, dropped docs/tokens, loss share.

    Scale shape: cluster labels reuse the memoized LSH edges +
    pointer-doubled CC; the loss census is one LEFT join of the doc
    stats against the cluster-bounded label table and a sources-sized
    agg."""
    edges = _lsh_pair_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    comp = connected_components(labels, edges).select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )
    t = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    fl = t.join(comp, "doc_id", "left").select(
        "source",
        "n_tok",
        F.expr(
            "CAST(cluster_id IS NOT NULL AND cluster_id <> doc_id AS INT)"
        ).alias("dropped"),
    )
    return (
        fl.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.sum("dropped"), F.lit(0)).cast("long").alias("docs_dropped"),
            F.coalesce(F.sum(F.expr("dropped * n_tok")), F.lit(0))
            .cast("long")
            .alias("tokens_dropped"),
            F.expr(
                "CASE WHEN COALESCE(sum(n_tok), 0) = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * COALESCE(sum(dropped * n_tok), 0)"
                " / sum(n_tok)) AS BIGINT) END"
            ).alias("loss_q6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# session 72 — common-terms query, A/B significance, order gaps
# ---------------------------------------------------------------------------

_CT_QUERY = ["the", "spark", "dup"]


@register(
    "common_terms_search",
    _bm25_agg_ctes(_CT_QUERY)
    + """,
qdf AS (
  SELECT q.term,
         CAST(dfs.df > (SELECT n_docs FROM st) / 2.0 AS INT) AS is_common
  FROM q JOIN dfs USING (term)),
low AS (SELECT term FROM qdf WHERE is_common = 0),
lowm AS (
  SELECT DISTINCT tf.doc_id FROM tf JOIN low USING (term)),
per2 AS (
  SELECT tf.doc_id, qdf.is_common,
         ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st))) AS s
  FROM tf JOIN qdf ON qdf.term = tf.term
  JOIN dfs ON dfs.term = tf.term JOIN dl ON dl.doc_id = tf.doc_id),
sc AS (
  SELECT per2.doc_id,
         CAST(round(1000000 * sum(CASE
           WHEN per2.is_common = 0 THEN per2.s
           WHEN lowm.doc_id IS NOT NULL THEN per2.s
           ELSE 0.0 END)) AS BIGINT) AS score_q6,
         CAST(max(CASE WHEN lowm.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS has_low
  FROM per2 LEFT JOIN lowm ON lowm.doc_id = per2.doc_id
  GROUP BY per2.doc_id)
SELECT doc_id, score_q6, has_low FROM sc
WHERE score_q6 > 0
ORDER BY score_q6 DESC, doc_id ASC LIMIT 10""",
)
def common_terms_search(spark, sf_dir):
    """Lucene/ES ``common_terms`` query: query terms split by document
    frequency at the 50% cutoff — LOW-frequency terms always score;
    HIGH-frequency terms (stopword-band, here 'the') contribute ONLY to
    documents that already match a low-frequency term. The stopword
    problem solved without a stopword list: 'the' never drags in its
    million-doc posting list as matches, but still boosts ranking among
    real matches — precisely the optimization the common-terms query
    shipped for (and the historical ancestor of BM25 WAND pruning).

    Determinism: the cutoff compares exact df against n_docs/2.0 (one
    float halving); scoring is the shared BM25 expression; docs whose
    entire score comes from suppressed common terms drop via the
    score > 0 gate identically in both engines.

    Scale shape: the low-term match set is the small postings subset and
    drives the common-term contribution via a LEFT membership probe —
    the high-df posting list is scanned once but never creates a match
    row by itself."""
    toks = _toks(_docs(spark, sf_dir)).localCheckpoint()
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    stt = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = F.broadcast(
        spark.createDataFrame([(t,) for t in _CT_QUERY], "term string")
    )
    qdf = (
        q.join(dfs, "term")
        .crossJoin(F.broadcast(stt))
        .select(
            "term", F.expr("CAST(df > n_docs / 2.0 AS INT)").alias("is_common")
        )
    )
    low = qdf.where(F.col("is_common") == 0).select("term")
    lowm = (
        tf.join(F.broadcast(low), "term")
        .select("doc_id")
        .distinct()
        .select(F.col("doc_id").alias("ldoc"))
    )
    per2 = (
        tf.join(F.broadcast(qdf), "term")
        .join(dfs, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stt))
        .select(
            "doc_id",
            "is_common",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf").cast("double") * F.lit(2.2)
                / (
                    F.col("tf").cast("double")
                    + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doc_len") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    sc = (
        per2.join(lowm, F.col("doc_id") == F.col("ldoc"), "left")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(round(1000000 * sum(CASE"
                " WHEN is_common = 0 THEN s"
                " WHEN ldoc IS NOT NULL THEN s"
                " ELSE cast(0 as double) END)) AS BIGINT)"
            ).alias("score_q6"),
            F.max(
                F.when(F.col("ldoc").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("has_low"),
        )
    )
    return (
        sc.where(F.col("score_q6") > 0)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "ab_significance",
    """WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 4))::INT % 2 AS arm,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT) AS conv
  FROM events GROUP BY user_id),
s AS (
  SELECT CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
         CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1,
         CAST(COALESCE(sum(conv) FILTER (WHERE arm = 0), 0) AS BIGINT) AS c0,
         CAST(COALESCE(sum(conv) FILTER (WHERE arm = 1), 0) AS BIGINT) AS c1
  FROM u)
SELECT n0, c0, n1, c1,
       CASE WHEN n0 = 0 OR n1 = 0 OR (c0 + c1) = 0 OR (c0 + c1) = (n0 + n1) THEN 0
            ELSE CAST(round(1000000
                 * ((c0 / CAST(n0 AS DOUBLE) - c1 / CAST(n1 AS DOUBLE))
                    * (c0 / CAST(n0 AS DOUBLE) - c1 / CAST(n1 AS DOUBLE)))
                 / (((c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / n0 + 1.0 / n1))) AS BIGINT) END AS z2_q6
FROM s""",
)
def ab_significance(spark, sf_dir):
    """Two-proportion z-test for the A/B arms' conversion rates — the
    significance readout that closes the experimentation loop
    (ab_assignment_readout reports the rates; this says whether the gap
    beats noise): z² = (p₀−p₁)² / (p̂(1−p̂)(1/n₀+1/n₁)) with the pooled
    p̂, emitted squared (the ttest no-sqrt rule — significance thresholds
    square just as well: z² > 3.84 ≈ p < .05). Degenerate pools (no
    converters, all converters, an empty arm) emit the 0 sentinel.

    Determinism: four exact BIGINTs; z² is ONE shared float expression.

    Scale shape: the user-keyed conversion agg then a 1-row census."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .withColumn(
            "arm",
            F.expr(
                "cast(conv(substring(md5(concat('ab:', cast(user_id as string))), 1, 4), 16, 10) as int) % 2"
            ),
        )
    )
    s = u.agg(
        F.count_if(F.col("arm") == 0).cast("long").alias("n0"),
        F.count_if(F.col("arm") == 1).cast("long").alias("n1"),
        F.coalesce(F.sum(F.when(F.col("arm") == 0, F.col("conv"))), F.lit(0))
        .cast("long")
        .alias("c0"),
        F.coalesce(F.sum(F.when(F.col("arm") == 1, F.col("conv"))), F.lit(0))
        .cast("long")
        .alias("c1"),
    )
    return s.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.expr(
            "CASE WHEN n0 = 0 OR n1 = 0 OR (c0 + c1) = 0 OR (c0 + c1) = (n0 + n1) THEN 0"
            " ELSE CAST(round(1000000"
            " * ((c0 / CAST(n0 AS DOUBLE) - c1 / CAST(n1 AS DOUBLE))"
            " * (c0 / CAST(n0 AS DOUBLE) - c1 / CAST(n1 AS DOUBLE)))"
            " / (((c0 + c1) / CAST(n0 + n1 AS DOUBLE))"
            " * (1.0 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))"
            " * (1.0 / n0 + 1.0 / n1))) AS BIGINT) END"
        ).alias("z2_q6"),
    )


@register(
    "order_gap_histogram",
    f"""WITH o AS (
  SELECT o_custkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_US_PER_DAY} AS day,
         o_orderkey
  FROM orders),
g AS (
  SELECT day - lag(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap
  FROM o),
b AS (
  SELECT CASE WHEN gap = 0 THEN -1
              ELSE CAST(length(bin(gap)) - 1 AS BIGINT) END AS bucket
  FROM g WHERE gap IS NOT NULL)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps
FROM b GROUP BY bucket ORDER BY bucket""",
)
def order_gap_histogram(spark, sf_dir):
    """Customer order-interarrival distribution: log2-day gaps between a
    customer's consecutive orders (bucket −1 = same-day reorders) — the
    purchase-cadence curve behind replenishment forecasting and the
    TPC-H twin of interevent_gap_histogram (events measure clicks;
    this measures wallets). Ties order by orderkey — the event-sequence
    tie rule.

    Scale shape: ONE custkey-partitioned lag window, a ≤64-bucket agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_PER_DAY}").alias("day"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    g = o.select((F.col("day") - F.lag("day").over(w)).alias("gap"))
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


# ---------------------------------------------------------------------------
# session 73 — informative-Dirichlet log-odds, CUSUM drift, revenue trend
# ---------------------------------------------------------------------------

# Monroe et al. (2008) "Fightin' Words" shared float expressions. Inputs are
# exact BIGINT columns (y = source term count, ns = source total, cf = corpus
# term count, n = corpus total); the A0 = 1000 pseudo-count prior is split
# proportionally to corpus frequency (a_w = A0 * cf_w / N). E-notation
# literals only (1e3/1e0/1e-9) — a plain decimal literal is DECIMAL in
# Spark SQL and diverges (the _HLL_C rule).
_LO_A = "(1e3 * cf / CAST(n AS DOUBLE))"
_LO_D = (
    f"(ln((y + {_LO_A}) / greatest(ns + 1e3 - y - {_LO_A}, 1e-9))"
    f" - ln((cf - y + {_LO_A}) / greatest(n - ns + 1e3 - (cf - y) - {_LO_A}, 1e-9)))"
)
_LO_V = f"(1e0 / (y + {_LO_A}) + 1e0 / (cf - y + {_LO_A}))"
_LO_DQ6 = f"CAST(round(1000000 * {_LO_D}) AS BIGINT)"
_LO_Z2 = f"CAST(round(1000000 * {_LO_D} * {_LO_D} / {_LO_V}) AS BIGINT)"
_LO_Z2S = f"CASE WHEN {_LO_D} < 0e0 THEN -{_LO_Z2} ELSE {_LO_Z2} END"


@register(
    "logodds_terms_source",
    f"""WITH tk AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents),
y AS (SELECT source, term, CAST(count(*) AS BIGINT) AS y FROM tk GROUP BY source, term),
ns AS (SELECT source, CAST(sum(y) AS BIGINT) AS ns FROM y GROUP BY source),
cf AS (SELECT term, CAST(sum(y) AS BIGINT) AS cf FROM y GROUP BY term),
nt AS (SELECT CAST(sum(y) AS BIGINT) AS n FROM y),
r AS (SELECT y.source AS source, y.term AS term, y.y AS y, ns.ns AS ns,
             cf.cf AS cf, nt.n AS n
      FROM y JOIN ns USING (source) JOIN cf USING (term) CROSS JOIN nt),
sc AS (SELECT source, term, {_LO_DQ6} AS delta_q6, {_LO_Z2S} AS z2s_q6 FROM r),
rk AS (SELECT source, term, delta_q6, z2s_q6,
              row_number() OVER (PARTITION BY source
                                 ORDER BY z2s_q6 DESC, term ASC) AS rank
       FROM sc)
SELECT source, term, CAST(rank AS BIGINT) AS rank, delta_q6, z2s_q6
FROM rk WHERE rank <= 5 ORDER BY source, rank""",
)
def logodds_terms_source(spark, sf_dir):
    """Monroe et al. "Fightin' Words" log-odds with an informative
    Dirichlet prior: per source, the 5 terms most over-represented vs the
    REST of the corpus, scored by z = delta / sqrt(var) where
    delta = ln-odds(source) - ln-odds(rest) under a prior that splits
    A0 = 1000 pseudo-counts proportionally to corpus frequency. The
    third member of the significant-terms family — JLH rewards raw lift,
    chi2 rewards any dependence, log-odds shrinks rare-term noise toward
    the corpus LM (the prior does the regularising that JLH's min-df
    cutoffs fake). Emitted squared-with-sign (z2s, the ttest no-sqrt
    rule); ranks order by the QUANTIZED z2s (hybrid_rrf rule) with a
    term tiebreak.

    Determinism: all inputs exact BIGINTs; delta/var/z2 are the shared
    _LO_* expression strings evaluated per (source, term) row in both
    engines; degenerate denominators floored at 1e-9 identically.

    Scale shape: tokenize -> ONE (source, term) agg; cf re-keys that
    table on term (vocab-bounded exchange); ns/nt broadcast; the
    per-source rank window runs over vocab-sized rows, never postings."""
    docs = _docs(spark, sf_dir)
    tk = docs.select("source", F.explode(spark_tokens("text")).alias("term"))
    y = (
        tk.groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .localCheckpoint()  # 4 consumers (ns/cf/nt/join) would re-tokenize
    )
    ns = y.groupBy("source").agg(F.sum("y").cast("long").alias("ns"))
    cf = y.groupBy("term").agg(F.sum("y").cast("long").alias("cf"))
    nt = y.agg(F.sum("y").cast("long").alias("n"))
    r = (
        y.join(F.broadcast(ns), "source")
        .join(cf, "term")
        .crossJoin(F.broadcast(nt))
    )
    sc = r.select(
        "source",
        "term",
        F.expr(_LO_DQ6).alias("delta_q6"),
        F.expr(_LO_Z2S).alias("z2s_q6"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("z2s_q6"), F.asc("term"))
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "source",
            "term",
            F.col("rank").cast("long").alias("rank"),
            "delta_q6",
            "z2s_q6",
        )
        .orderBy("source", "rank")
    )


@register(
    "events_cusum_anomaly",
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
t AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS tot FROM f),
g AS (SELECT f.day_num, f.n, CAST(t.nd * f.n - t.tot AS BIGINT) AS dd, t.nd AS nd
      FROM f CROSS JOIN t),
c AS (SELECT day_num, n, nd,
             CAST(sum(dd) OVER (ORDER BY day_num
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM g),
s AS (SELECT day_num, n, nd, cum,
             CAST(least(CAST(0 AS BIGINT), min(cum) OVER (ORDER BY day_num
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS rmin,
             CAST(greatest(CAST(0 AS BIGINT), max(cum) OVER (ORDER BY day_num
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS rmax
      FROM c)
SELECT CAST(day_num AS BIGINT) AS day_num, n,
       CAST(round(1000000 * ((cum - rmin) / CAST(nd AS DOUBLE))) AS BIGINT) AS cusum_pos_q6,
       CAST(round(1000000 * ((rmax - cum) / CAST(nd AS DOUBLE))) AS BIGINT) AS cusum_neg_q6
FROM s ORDER BY day_num""",
)
def events_cusum_anomaly(spark, sf_dir):
    """Page's CUSUM drift detector over daily event counts: S+_t =
    max(0, S+_{t-1} + (x_t - mean)), S-_t likewise downward — the
    sustained-shift detector that complements events_daily_anomaly's
    pointwise z² (a 10-day 10% lift never trips a per-day z but climbs
    the CUSUM linearly). The recursion is NOT a prefix sum, but it has
    an exact window form: S+_t = cum_t - min(0, running-min(cum)) and
    S-_t = max(0, running-max(cum)) - cum_t over the cumulative sum of
    deviations — two stock windows instead of a sequential loop (the
    property suite proves the identity against the literal recursion).

    Determinism: deviations are kept integer by scaling through the day
    count (dd = nd*x - tot, exact BIGINT); the only float op is the
    final divide-then-round per row. Empty days are zero-filled via the
    calendar spine so the recursion sees true days (serial_diff rule).

    Scale shape: ONE day groupBy over events (map-side partials); every
    window runs on calendar-bounded day rows."""
    ev = _events(spark, sf_dir)
    d = (
        ev.groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day_num"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # bounds + spine join both consume it
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = (
        spine.join(d, "day_num", "left")
        .select("day_num", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .localCheckpoint()  # census + deviation rows both consume it
    )
    t = f.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("tot"),
    )
    g = f.crossJoin(F.broadcast(t)).select(
        "day_num",
        "n",
        (F.col("nd") * F.col("n") - F.col("tot")).cast("long").alias("dd"),
        "nd",
    )
    wc = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "day_num", "n", "nd", F.sum("dd").over(wc).cast("long").alias("cum")
    )
    s = c.select(
        "day_num",
        "n",
        "nd",
        "cum",
        F.least(F.lit(0).cast("long"), F.min("cum").over(wc))
        .cast("long")
        .alias("rmin"),
        F.greatest(F.lit(0).cast("long"), F.max("cum").over(wc))
        .cast("long")
        .alias("rmax"),
    )
    return s.select(
        F.col("day_num").cast("long").alias("day_num"),
        "n",
        F.expr(
            "CAST(round(1000000 * ((cum - rmin) / CAST(nd AS DOUBLE))) AS BIGINT)"
        ).alias("cusum_pos_q6"),
        F.expr(
            "CAST(round(1000000 * ((rmax - cum) / CAST(nd AS DOUBLE))) AS BIGINT)"
        ).alias("cusum_neg_q6"),
    ).orderBy("day_num")


# OLS-on-centered-integers shared expressions (inputs: n, sxc, syc, sxx,
# syy, sxy — exact BIGINTs; every product CAST(x AS DOUBLE)*y from the
# FIRST multiply, the session-49 rule).
_TR_COV = "(CAST(n AS DOUBLE) * sxy - CAST(sxc AS DOUBLE) * syc)"
_TR_VX = "(CAST(n AS DOUBLE) * sxx - CAST(sxc AS DOUBLE) * sxc)"
_TR_VY = "(CAST(n AS DOUBLE) * syy - CAST(syc AS DOUBLE) * syc)"
_TR_SLOPE = (
    f"CASE WHEN n < 2 OR {_TR_VX} = 0e0 THEN CAST(0 AS BIGINT)"
    f" ELSE CAST(round(1000000 * ({_TR_COV} / {_TR_VX})) AS BIGINT) END"
)
_TR_R2 = (
    f"CASE WHEN n < 2 OR {_TR_VX} = 0e0 OR {_TR_VY} = 0e0 THEN CAST(0 AS BIGINT)"
    f" ELSE CAST(round(1000000 * ({_TR_COV} * {_TR_COV} / ({_TR_VX} * {_TR_VY})))"
    f" AS BIGINT) END"
)


@register(
    "daily_revenue_trend",
    f"""WITH o AS (
  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day_num,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
d AS (SELECT day_num, CAST(sum(cents) AS BIGINT) AS cents FROM o GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo FROM d),
x AS (SELECT CAST(d.day_num - b.lo AS BIGINT) AS x, d.cents AS cents,
             CAST(d.cents // 100 AS BIGINT) AS y
      FROM d CROSS JOIN b),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mx,
             CAST(sum(y) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS my
      FROM x),
cs AS (SELECT m.n AS n,
              CAST(sum(x.x - m.mx) AS BIGINT) AS sxc,
              CAST(sum(x.y - m.my) AS BIGINT) AS syc,
              CAST(sum((x.x - m.mx) * (x.x - m.mx)) AS BIGINT) AS sxx,
              CAST(sum((x.y - m.my) * (x.y - m.my)) AS BIGINT) AS syy,
              CAST(sum((x.x - m.mx) * (x.y - m.my)) AS BIGINT) AS sxy,
              CAST(sum(x.cents) AS BIGINT) AS toty
       FROM x CROSS JOIN m GROUP BY m.n)
SELECT n AS n_days, toty AS revenue_cents,
       {_TR_SLOPE} AS slope_q6, {_TR_R2} AS r2_q6
FROM cs""",
)
def daily_revenue_trend(spark, sf_dir):
    """OLS trend of daily order revenue: slope (whole-dollars/day, q6)
    and R² of revenue regressed on the day index — the one-number "is
    the business growing and how noisily" readout, and the trend leg
    that weekly_seasonal_decompose deliberately removes. Two-pass
    centered sufficient statistics (the numerically-standard OLS form):
    integer means (floor-div, nonneg so Spark div == DuckDB //), then
    exact BIGINT sums of centered products; slope/R² are ONE shared
    float expression over six integers. Stats run on whole dollars
    (cents // 100) so the squared-deviation envelope fits BIGINT at
    ~$1e9-per-day deviations over 1e4 days; revenue_cents stays exact.

    Degenerate slates (single day, zero variance) emit the 0 sentinel.

    Scale shape: one day groupBy over orders (map-side partials); the
    centering pass and census run on calendar-bounded day rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
        ).alias("day_num"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    d = (
        o.groupBy("day_num")
        .agg(F.sum("cents").cast("long").alias("cents"))
        .localCheckpoint()  # bounds + stats both consume the day table
    )
    b = d.agg(F.min("day_num").cast("long").alias("lo"))
    x = d.crossJoin(F.broadcast(b)).select(
        (F.col("day_num") - F.col("lo")).cast("long").alias("x"),
        "cents",
        F.expr("CAST(cents div 100 AS BIGINT)").alias("y"),
    )
    m = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(x) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mx"),
        F.expr(
            "CAST(sum(y) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("my"),
    )
    cs = (
        x.crossJoin(F.broadcast(m))
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
            F.sum("cents").cast("long").alias("toty"),
        )
    )
    return cs.select(
        F.col("n").alias("n_days"),
        F.col("toty").alias("revenue_cents"),
        F.expr(_TR_SLOPE).alias("slope_q6"),
        F.expr(_TR_R2).alias("r2_q6"),
    )


# ---------------------------------------------------------------------------
# session 74 — local clustering histogram, graded NDCG, variable-width
# value buckets (ES variable_width_histogram as deterministic 1-D k-means)
# ---------------------------------------------------------------------------


@register(
    "lsh_clustering_histogram",
    _SQL_LSH_PAIRS
    + """,
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b FROM pairs)
        GROUP BY v),
tri3 AS (SELECT p1.doc_a AS v1, p1.doc_b AS v2, p2.doc_b AS v3
         FROM pairs p1 JOIN pairs p2 ON p2.doc_a = p1.doc_b
         JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
tv AS (SELECT v, CAST(count(*) AS BIGINT) AS t
       FROM (SELECT v1 AS v FROM tri3 UNION ALL SELECT v2 FROM tri3
             UNION ALL SELECT v3 FROM tri3)
       GROUP BY v),
cc AS (SELECT deg.v, deg.d, CAST(COALESCE(tv.t, 0) AS BIGINT) AS t
       FROM deg LEFT JOIN tv USING (v)),
bk AS (SELECT CASE WHEN d < 2 THEN -1
              ELSE least(((2000000 * t) // (d * (d - 1))) // 100000, 9)
              END AS bucket
       FROM cc),
h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_nodes FROM bk GROUP BY bucket),
spine AS (SELECT unnest(generate_series(-1, 9)) AS bucket)
SELECT CAST(spine.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(h.n_nodes, 0) AS BIGINT) AS n_nodes
FROM spine LEFT JOIN h USING (bucket) ORDER BY bucket""",
)
def lsh_clustering_histogram(spark, sf_dir):
    """Per-node local clustering coefficient histogram of the LSH
    candidate graph: c_v = 2·t_v / (d_v(d_v−1)) bucketed into deciles
    (bucket −1 = degree-1 nodes where c is undefined) — the NODE-level
    refinement of lsh_triangle_count's single global transitivity. A
    dup graph should be bimodal (tight clique members at c≈1, bridge
    false-positives at c≈0); a flat histogram means the banding
    threshold is admitting chains — the third panel of the dedup tuning
    triptych after the degree histogram and candidate precision.

    Determinism: c is the exact integer division (2e6·t) div (d(d−1))
    floored to deciles (both engines truncate nonnegatives
    identically); c = 1 lands in bucket 9 via least(·, 9).

    Scale shape: per-node triangle counts come from the degree-ordered
    oriented wedge join (the lsh_triangle_count bound — Σ outdeg²
    candidates, one apex per triangle) then exploding each triangle to
    its 3 members; everything downstream is node-keyed aggs. The
    DuckDB oracle uses the id-ordered triple join instead — fine at
    oracle scale, never the Spark plan."""
    edges = _lsh_pair_edges(spark, sf_dir)  # symmetric, checkpointed
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
    tri = cand.join(pairs, ["a", "b"], "left_semi")
    mem = (
        tri.select(F.col("u").alias("v"))
        .unionByName(tri.select(F.col("a").alias("v")))
        .unionByName(tri.select(F.col("b").alias("v")))
    )
    tv = mem.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("t"))
    nodes = deg.select(F.col("src").alias("v"), "d")
    cc = nodes.join(tv, "v", "left").select(
        "d", F.coalesce("t", F.lit(0)).cast("long").alias("t")
    )
    bk = cc.select(
        F.expr(
            "CASE WHEN d < 2 THEN -1"
            " ELSE least(((2000000 * t) div (d * (d - 1))) div 100000, 9) END"
        ).alias("bucket")
    )
    h = bk.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n"))
    spine = spark.range(-1, 10).select(F.col("id").alias("bucket"))
    return (
        spine.join(h, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_nodes"),
        )
        .orderBy("bucket")
    )


_NDCG_TERMS = ["dup", "spark"]
# q9 integer rank discounts round(1e9 / log2(r+1)) folded in Python so both
# engines sum EXACT BIGINTs — a per-row float discount would make the DCG a
# float sum whose order differs between engines.
_NDCG_W = {r: round(1e9 / math.log2(r + 1)) for r in range(1, 11)}


def _ndcg_w_case(col: str) -> str:
    whens = " ".join(f"WHEN {r} THEN {w}" for r, w in _NDCG_W.items())
    return f"CASE {col} {whens} ELSE 0 END"


@register(
    "ndcg_eval",
    _bm25_agg_ctes(_NDCG_TERMS)
    + f""",
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk
  FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id,
         CAST(CASE least(count(*), 3) WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END
              AS BIGINT) AS gain
  FROM ({SQL_TOKS}) WHERE term = 'dup' GROUP BY doc_id),
dcg AS (
  SELECT CAST(COALESCE(sum(COALESCE(rel.gain, 0) * ({_ndcg_w_case("ranked.rnk")})), 0)
              AS BIGINT) AS dcg
  FROM ranked LEFT JOIN rel USING (doc_id)),
ideal AS (
  SELECT gain, rnk FROM (
    SELECT gain, row_number() OVER (ORDER BY gain DESC, doc_id ASC) AS rnk
    FROM rel) WHERE rnk <= 10),
idcg AS (SELECT CAST(COALESCE(sum(gain * ({_ndcg_w_case("rnk")})), 0) AS BIGINT) AS idcg
         FROM ideal)
SELECT dcg.dcg AS dcg_wq9, idcg.idcg AS idcg_wq9,
       CASE WHEN idcg.idcg = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (CAST(dcg.dcg AS DOUBLE) / idcg.idcg)) AS BIGINT)
       END AS ndcg_q6
FROM dcg, idcg""",
)
def ndcg_eval(spark, sf_dir):
    """NDCG@10 of the BM25 ranking against GRADED relevance — the metric
    rank_eval's binary P@10/MRR can't express (a rank-1 marginally-
    relevant doc and a rank-1 perfect doc score identically under P@10;
    NDCG separates them). Grades: tf of the rare judgment term 'dup'
    capped at 3; gains 2^g − 1 (the web-search convention); discounts
    1/log2(rank+1) folded to q9 INTEGERS in Python (the _HLL_C
    constant-folding rule) so DCG and IDCG are exact BIGINT sums — the
    only float op is the final dcg/idcg division.

    Scale shape: the ranked page is the usual TakeOrdered top-10; IDCG
    ranks the judgment set (human-sized by nature); both windows run on
    ≤judgment-set rows."""
    agg = _bm25_match_set(spark, sf_dir, _NDCG_TERMS)
    top10 = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    ranked = top10.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))),
    ).select("doc_id", "rnk")
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "doc_id",
            F.expr(
                "CAST(CASE least(c, 3) WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END"
                " AS BIGINT)"
            ).alias("gain"),
        )
    )
    dcg = (
        ranked.join(rel, "doc_id", "left")
        .select(
            (
                F.coalesce("gain", F.lit(0)) * F.expr(_ndcg_w_case("rnk"))
            ).alias("term_w")
        )
        .agg(F.coalesce(F.sum("term_w"), F.lit(0)).cast("long").alias("dcg_wq9"))
    )
    ideal = (
        rel.orderBy(F.desc("gain"), F.asc("doc_id"))
        .limit(10)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("gain"), F.asc("doc_id"))),
        )
    )
    idcg = ideal.select(
        (F.col("gain") * F.expr(_ndcg_w_case("rnk"))).alias("term_w")
    ).agg(F.coalesce(F.sum("term_w"), F.lit(0)).cast("long").alias("idcg_wq9"))
    return dcg.crossJoin(idcg).select(
        "dcg_wq9",
        "idcg_wq9",
        F.expr(
            "CASE WHEN idcg_wq9 = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (CAST(dcg_wq9 AS DOUBLE) / idcg_wq9))"
            " AS BIGINT) END"
        ).alias("ndcg_q6"),
    )


# ES variable_width_histogram — deterministic 1-D k-means (k=4, 2 Lloyd
# rounds). The shared assignment rule: sorted centroids make
# nearest-centroid equivalent to midpoint thresholds, ties to the LOWER
# cluster via 2x <= c_i + c_{i+1} (exact integer compares, no |x−c| floats).
_VWH_CASE = (
    "CASE WHEN 2 * x <= {b01} THEN 0 WHEN 2 * x <= {b12} THEN 1"
    " WHEN 2 * x <= {b23} THEN 2 ELSE 3 END"
)


def _vwh_sql() -> str:
    """Generated oracle (the _pq_sql rule — scales/tiebreaks live in ONE
    place): init centroids on the [lo, hi] spread, two unrolled Lloyd
    rounds with sum-as-mean integer updates, empty clusters keep their
    centroid."""
    parts = [
        """WITH o AS MATERIALIZED (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders),
bnd AS (SELECT CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi FROM o),
p0 AS (SELECT lo + (1 * (hi - lo)) // 8 AS c0, lo + (3 * (hi - lo)) // 8 AS c1,
              lo + (5 * (hi - lo)) // 8 AS c2, lo + (7 * (hi - lo)) // 8 AS c3
       FROM bnd)"""
    ]
    for r in range(1, 3):
        case = _VWH_CASE.format(b01="(c0 + c1)", b12="(c1 + c2)", b23="(c2 + c3)")
        parts.append(
            f"""a{r} AS (SELECT x, {case} AS k FROM o, p{r - 1}),
s{r} AS (SELECT k, CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
         FROM a{r} GROUP BY k),
p{r} AS (SELECT
  COALESCE((SELECT s.s // s.n FROM s{r} s WHERE s.k = 0), (SELECT c0 FROM p{r - 1})) AS c0,
  COALESCE((SELECT s.s // s.n FROM s{r} s WHERE s.k = 1), (SELECT c1 FROM p{r - 1})) AS c1,
  COALESCE((SELECT s.s // s.n FROM s{r} s WHERE s.k = 2), (SELECT c2 FROM p{r - 1})) AS c2,
  COALESCE((SELECT s.s // s.n FROM s{r} s WHERE s.k = 3), (SELECT c3 FROM p{r - 1})) AS c3)"""
        )
    case = _VWH_CASE.format(b01="(c0 + c1)", b12="(c1 + c2)", b23="(c2 + c3)")
    parts.append(
        f"""a3 AS (SELECT x, {case} AS k FROM o, p2),
s3 AS (SELECT k, CAST(count(*) AS BIGINT) AS n, CAST(min(x) AS BIGINT) AS mn,
              CAST(max(x) AS BIGINT) AS mx
       FROM a3 GROUP BY k),
spine AS (SELECT unnest(generate_series(0, 3)) AS k),
cent AS (SELECT 0 AS k, c0 AS c FROM p2 UNION ALL SELECT 1, c1 FROM p2
         UNION ALL SELECT 2, c2 FROM p2 UNION ALL SELECT 3, c3 FROM p2)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT CAST(spine.k AS BIGINT) AS bucket,
       CAST(COALESCE(s3.n, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(s3.mn, -1) AS BIGINT) AS min_c,
       CAST(COALESCE(s3.mx, -1) AS BIGINT) AS max_c,
       CAST(cent.c AS BIGINT) AS centroid_c
FROM spine LEFT JOIN s3 ON s3.k = spine.k JOIN cent ON cent.k = spine.k
ORDER BY bucket"""
    )


@register("value_kmeans_buckets", _vwh_sql())
def value_kmeans_buckets(spark, sf_dir):
    """ES ``variable_width_histogram`` over order values: k=4 buckets
    whose boundaries ADAPT to the value distribution via deterministic
    1-D k-means (evenly-spread init on [lo, hi], two Lloyd rounds) —
    the agg ES ships for skewed money/value fields where fixed-width
    histograms put 99% of rows in bin 0. Emits per-bucket count,
    min/max (−1 sentinels when empty) and the final centroid.

    Determinism: exact cents; assignment is the shared _VWH_CASE
    midpoint-threshold rule (nearest centroid for sorted centroids,
    ties to the lower cluster — Lloyd preserves centroid order in 1-D);
    centroid updates are sum-div-count floor divisions (nonneg, so
    Spark div == DuckDB //); empty clusters keep their centroid.

    Scale shape: per round, ONE map-side assignment expression (the
    4 centroids are driver literals — the embedding_power_iteration
    bounded-collect rule, 4 values per round, never a data-sized
    collect) feeding a ≤4-group agg; no joins, no windows over data."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("x"))
        .localCheckpoint()  # 3 assignment passes reuse the cents column
    )
    b = o.agg(
        F.min("x").cast("long").alias("lo"), F.max("x").cast("long").alias("hi")
    ).collect()[0]
    lo, hi = b["lo"], b["hi"]
    cents = [lo + ((2 * i + 1) * (hi - lo)) // 8 for i in range(4)]
    for _ in range(2):
        case = _VWH_CASE.format(
            b01=cents[0] + cents[1], b12=cents[1] + cents[2], b23=cents[2] + cents[3]
        )
        rows = (
            o.select(F.expr(case).alias("k"), "x")
            .groupBy("k")
            .agg(F.sum("x").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )
        got = {r["k"]: (r["s"], r["n"]) for r in rows}
        cents = [
            got[i][0] // got[i][1] if i in got and got[i][1] else cents[i]
            for i in range(4)
        ]
    case = _VWH_CASE.format(
        b01=cents[0] + cents[1], b12=cents[1] + cents[2], b23=cents[2] + cents[3]
    )
    s3 = (
        o.select(F.expr(case).alias("bucket"), "x")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("x").cast("long").alias("mn"),
            F.max("x").cast("long").alias("mx"),
        )
    )
    spine = spark.range(4).select(F.col("id").alias("bucket"))
    cent_case = " ".join(f"WHEN {i} THEN {c}" for i, c in enumerate(cents))
    return (
        spine.join(s3, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("mn", F.lit(-1)).cast("long").alias("min_c"),
            F.coalesce("mx", F.lit(-1)).cast("long").alias("max_c"),
            F.expr(f"CAST(CASE bucket {cent_case} END AS BIGINT)").alias(
                "centroid_c"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# session 75 — DFR PL2 ranking, first-touch session attribution, exact
# Spearman from midrank histograms
# ---------------------------------------------------------------------------

# PL2 divergence-from-randomness (Amati & van Rijsbergen): Poisson model,
# Laplace aftereffect, length normalisation 2 (c=1). Shared expressions
# over exact BIGINT columns (tfv, dlv, cf, tot, nd); log2's are ln·log2(e)
# with the constant folded in e-notation so both engines run the same
# float ops (never the engine's own log2()).
_PL2_TFN = "(tfv * (ln(1e0 + (CAST(tot AS DOUBLE) / nd) / dlv) * 1.4426950408889634e0))"
_PL2_LAM = "(CAST(cf AS DOUBLE) / nd)"
_PL2_S = (
    f"(1.4426950408889634e0 * ({_PL2_TFN} * ln({_PL2_TFN} / {_PL2_LAM})"
    f" + ({_PL2_LAM} - {_PL2_TFN}) + 5e-1 * ln(6.283185307179586e0 * {_PL2_TFN}))"
    f" / ({_PL2_TFN} + 1e0))"
)

_PL2_TERMS = ["spark", "dup"]


@register(
    "dfr_pl2_search",
    f"""WITH tf AS ({SQL_TF}),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id),
nd AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(doc_len) AS BIGINT) AS tot FROM dl),
cfs AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
q AS (SELECT unnest([{", ".join(f"'{t}'" for t in _PL2_TERMS)}]) AS term),
pin AS (SELECT tf.doc_id, CAST(tf.tf AS BIGINT) AS tfv, dl.doc_len AS dlv,
               cfs.cf AS cf, nd.tot AS tot, nd.nd AS nd
        FROM tf JOIN q USING (term) JOIN cfs USING (term)
        JOIN dl USING (doc_id) CROSS JOIN nd),
per AS (SELECT doc_id, {_PL2_S} AS s FROM pin),
agg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6,
               CAST(count(*) AS BIGINT) AS nm
        FROM per GROUP BY doc_id),
ranked AS (SELECT doc_id, score_q6, nm,
                  row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
           FROM agg)
SELECT doc_id, score_q6, nm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def dfr_pl2_search(spark, sf_dir):
    """Divergence-From-Randomness PL2 ranking (Amati & van Rijsbergen
    2002; Terrier's default model): information content of the Poisson-
    deviating term count, discounted by the Laplace aftereffect
    1/(tfn+1), over the length-normalised tfn = tf·log2(1 + avgdl/dl).
    The third retrieval model in the engine beside BM25 and Dirichlet
    QL — the DFR family scores the IMPROBABILITY of the observed tf
    under a random corpus, so it needs cf (collection frequency), which
    BM25 never looks at; λ = cf/N is the Poisson rate.

    Determinism: inputs are exact BIGINTs; _PL2_S is one shared
    expression (log2 via ln·log2(e) with the folded e-notation constant
    — an engine-native log2() could round differently); the per-doc sum
    covers ≤|query| terms before the single q6 rounding.

    Scale shape: identical to bm25_topk — postings semi-joined to the
    query terms FIRST (match-set-sized rows downstream), cf/nd
    broadcast, ONE TakeOrdered top-10. doc_len derives FROM tf so dl
    shares tf's exchange (session-15 rule)."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tfv"))
        .localCheckpoint()  # dl/cfs/match all consume it
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tfv").cast("long").alias("dlv"))
    nd = dl.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("dlv").cast("long").alias("tot"),
    )
    q = F.broadcast(
        spark.createDataFrame([(t,) for t in _PL2_TERMS], "term string")
    )
    cfs = tf.groupBy("term").agg(F.sum("tfv").cast("long").alias("cf"))
    pin = (
        tf.join(q, "term")
        .join(F.broadcast(cfs.join(q, "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(nd))
    )
    per = pin.select("doc_id", F.expr(_PL2_S).alias("s"))
    agg = per.groupBy("doc_id").agg(
        F.expr("CAST(round(sum(s) * 1000000) AS BIGINT)").alias("score_q6"),
        F.count(F.lit(1)).cast("long").alias("nm"),
    )
    top10 = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    return top10.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))
        .cast("long"),
    ).select("doc_id", "score_q6", "nm", "rank")


@register(
    "session_entry_conversion",
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
fr AS (
  SELECT user_id, sid, event_type, t_us, event_id,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY t_us, event_id) AS rn
  FROM se),
ses AS (
  SELECT f.user_id, f.sid, f.event_type AS entry_type,
         (SELECT max(CASE WHEN s2.event_type = 'purchase' THEN 1 ELSE 0 END)
          FROM se s2 WHERE s2.user_id = f.user_id AND s2.sid = f.sid) AS conv
  FROM fr f WHERE f.rn = 1)
SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(COALESCE(sum(conv), 0) AS BIGINT) AS n_converted,
       CAST((1000000 * COALESCE(sum(conv), 0)) // count(*) AS BIGINT) AS conv_rate_q6
FROM ses GROUP BY entry_type ORDER BY entry_type""",
)
def session_entry_conversion(spark, sf_dir):
    """First-touch attribution at session grain: sessions materialised
    under the 30-min-gap rule, each attributed to its ENTRY event type,
    with the share that go on to convert (contain a purchase) — the
    marketing-attribution readout that the event-level funnel can't
    give (a purchase preceded by view→click credits 'view' here, the
    session's door, not the last click).

    Determinism: session ids are running sums of is_start flags ordered
    by (t_us, event_id) — the session_duration_histogram machinery; the
    entry event is the session's (t_us, event_id)-min, picked map-side
    via min(struct(...)) (the search_collapse rule — never a per-group
    sort window in Spark; the oracle may window).

    Scale shape: lag + running-sum on ONE user_id exchange, a
    (user, session) agg carrying entry/conv in the same pass, then a
    ≤|event_type| rollup."""
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
        F.min(
            F.struct("t_us", "event_id", "event_type")
        )["event_type"].alias("entry_type"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    return (
        ses.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("n_converted"),
        )
        .select(
            "entry_type",
            "n_sessions",
            "n_converted",
            F.expr(
                "CAST((1000000 * n_converted) div n_sessions AS BIGINT)"
            ).alias("conv_rate_q6"),
        )
        .orderBy("entry_type")
    )


_SP_RHO2S = f"CASE WHEN {_TR_COV} < 0e0 THEN -({_TR_R2}) ELSE {_TR_R2} END"


@register(
    "spearman_len_ttr",
    f"""WITH dstat AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS a,
         CAST((1000000 * count(DISTINCT term)) // count(*) AS BIGINT) AS b
  FROM ({SQL_TOKS}) GROUP BY doc_id),
ha AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM dstat GROUP BY a),
ra AS (SELECT a, CAST(2 * sum(c) OVER (ORDER BY a
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1
             AS BIGINT) AS r2a
       FROM ha),
hb AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM dstat GROUP BY b),
rb AS (SELECT b, CAST(2 * sum(c) OVER (ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1
             AS BIGINT) AS r2b
       FROM hb),
j AS (SELECT ra.r2a AS x, rb.r2b AS y
      FROM dstat JOIN ra USING (a) JOIN rb USING (b)),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS mx,
             CAST(sum(y) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1) AS my
      FROM j),
cs AS (SELECT m.n AS n,
              CAST(sum(j.x - m.mx) AS BIGINT) AS sxc,
              CAST(sum(j.y - m.my) AS BIGINT) AS syc,
              CAST(sum((j.x - m.mx) * (j.x - m.mx)) AS BIGINT) AS sxx,
              CAST(sum((j.y - m.my) * (j.y - m.my)) AS BIGINT) AS syy,
              CAST(sum((j.x - m.mx) * (j.y - m.my)) AS BIGINT) AS sxy
       FROM j CROSS JOIN m GROUP BY m.n)
SELECT n AS n_docs, {_SP_RHO2S} AS rho2s_q6 FROM cs""",
)
def spearman_len_ttr(spark, sf_dir):
    """Exact Spearman rank correlation between document length and
    type-token-ratio quality — "are longer docs lexically poorer" as one
    number, the rank-based sibling of norm_doclen_corr (Pearson dies on
    doclen's heavy tail; Spearman is tail-immune). NO global sort
    exists: midranks come from the VALUE HISTOGRAMS via cumulative
    windows over distinct-value cells (the doclen_quantiles argument —
    windows see cardinality-bounded rows, never the corpus), doubled to
    2·midrank so tied ranks stay integer. Spearman = Pearson over the
    midranks, computed with the daily_revenue_trend centered-BIGINT
    machinery and emitted as signed rho² (the no-sqrt rule; sign from
    the covariance). Envelope: centered squared midrank sums fit BIGINT
    to ~1e9 docs per run — beyond that, pre-aggregate per (a,b) cell.

    Scale shape: one doc-keyed tokenize agg; two cardinality-bounded
    histogram windows; midranks join back keyed on the value (AQE
    broadcasts the small value tables); a 1-row census."""
    dstat = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("a"),
            F.expr(
                "CAST((1000000 * count(DISTINCT term)) div count(1) AS BIGINT)"
            ).alias("b"),
        )
        .localCheckpoint()  # two histograms + the join-back consume it
    )
    wa = Window.orderBy("a").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ra = (
        dstat.groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "a",
            (F.lit(2) * F.sum("c").over(wa) - F.col("c") + 1)
            .cast("long")
            .alias("r2a"),
        )
    )
    wb = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rb = (
        dstat.groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "b",
            (F.lit(2) * F.sum("c").over(wb) - F.col("c") + 1)
            .cast("long")
            .alias("r2b"),
        )
    )
    j = (
        dstat.join(ra, "a")
        .join(rb, "b")
        .select(F.col("r2a").alias("x"), F.col("r2b").alias("y"))
    )
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(x) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("mx"),
        F.expr(
            "CAST(sum(y) AS BIGINT) div greatest(CAST(count(1) AS BIGINT), 1)"
        ).alias("my"),
    )
    cs = (
        j.crossJoin(F.broadcast(m))
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
        F.col("n").alias("n_docs"), F.expr(_SP_RHO2S).alias("rho2s_q6")
    )


# ---------------------------------------------------------------------------
# session 76 — exact average precision, RM3 pseudo-relevance expansion,
# per-source dataset datasheet
# ---------------------------------------------------------------------------


@register(
    "map_eval",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + f""",
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk
  FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
rel AS (SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup'),
nrel AS (SELECT CAST(count(*) AS BIGINT) AS r FROM rel),
j AS (SELECT ranked.rnk, CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
      FROM ranked LEFT JOIN rel USING (doc_id)),
cum AS (SELECT rnk, is_rel,
               CAST(sum(is_rel) OVER (ORDER BY rnk
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cr
        FROM j),
ap AS (SELECT CAST(COALESCE(sum(CASE WHEN is_rel = 1
                                     THEN (2520 * cr) // rnk ELSE 0 END), 0)
              AS BIGINT) AS ap2520,
              CAST(COALESCE(sum(is_rel), 0) AS BIGINT) AS nr10
       FROM cum)
SELECT nrel.r AS n_rel_total, ap.nr10 AS n_rel_at_10,
       CASE WHEN nrel.r = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (CAST(ap.ap2520 AS DOUBLE)
                 / (2520 * least(nrel.r, 10)))) AS BIGINT) END AS ap_q6
FROM nrel, ap""",
)
def map_eval(spark, sf_dir):
    """Average precision @10 of the BM25 ranking — the metric that
    completes the rank_eval family (P@10 ignores rank position, MRR
    sees only the first hit, NDCG needs grades; AP is the binary
    judgment standard). EXACT until one division: each P@k = cumrel/k
    term is scaled by lcm(1..10) = 2520, which every rank 1..10
    divides, so the sum is a true integer — no per-term float rounding
    to drift between engines. AP = Σ rel_k·P@k / min(R, 10).

    Scale shape: the usual TakeOrdered top-10; the judgment set and
    its census; the cumulative window runs over 10 rows."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    ranked = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rnk")
    )
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
        .localCheckpoint()  # census + page join both consume it
    )
    nrel = rel.agg(F.count(F.lit(1)).cast("long").alias("r"))
    j = ranked.join(
        rel.withColumn("is_rel_flag", F.lit(1)), "doc_id", "left"
    ).select("rnk", F.coalesce("is_rel_flag", F.lit(0)).alias("is_rel"))
    wc = Window.orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = j.select(
        "rnk", "is_rel", F.sum("is_rel").over(wc).cast("long").alias("cr")
    )
    ap = cum.agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "CASE WHEN is_rel = 1 THEN (2520 * cr) div rnk ELSE 0 END"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("ap2520"),
        F.coalesce(F.sum("is_rel"), F.lit(0)).cast("long").alias("nr10"),
    )
    return nrel.crossJoin(ap).select(
        F.col("r").alias("n_rel_total"),
        F.col("nr10").alias("n_rel_at_10"),
        F.expr(
            "CASE WHEN r = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (CAST(ap2520 AS DOUBLE)"
            " / (2520 * least(r, 10)))) AS BIGINT) END"
        ).alias("ap_q6"),
    )


_RM3_TERMS = ["spark", "join"]
# P(w|R) contribution of one feedback doc: linear score normalisation
# P(d|Q) = score/S times the doc LM P(w|d) = tf/dl, q6-rounded PER
# (doc, term) first (the unigram_logprob rule), then BIGINT-summed.
_RM3_W = (
    "CASE WHEN s = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(1000000 * ((CAST(score_q6 AS DOUBLE) / s)"
    " * (CAST(tf AS DOUBLE) / dl))) AS BIGINT) END"
)


@register(
    "rm3_expansion_terms",
    _bm25_agg_ctes(_RM3_TERMS)
    + f""",
fb AS (SELECT doc_id, score_q6 FROM agg
       ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
stot AS (SELECT CAST(COALESCE(sum(score_q6), 0) AS BIGINT) AS s FROM fb),
ftf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM ({SQL_TOKS}) WHERE doc_id IN (SELECT doc_id FROM fb)
        GROUP BY doc_id, term),
fdl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM ftf GROUP BY doc_id),
w AS (SELECT ftf.term, {_RM3_W} AS wq6
      FROM ftf JOIN fb USING (doc_id) JOIN fdl USING (doc_id) CROSS JOIN stot
      WHERE ftf.term NOT IN ({", ".join(f"'{t}'" for t in _RM3_TERMS)})),
ws AS (SELECT term, CAST(sum(wq6) AS BIGINT) AS weight_q6 FROM w GROUP BY term),
rk AS (SELECT term, weight_q6,
              row_number() OVER (ORDER BY weight_q6 DESC, term ASC) AS rank
       FROM ws)
SELECT term, CAST(rank AS BIGINT) AS rank, weight_q6
FROM rk WHERE rank <= 10 ORDER BY rank""",
)
def rm3_expansion_terms(spark, sf_dir):
    """RM3 pseudo-relevance feedback (Lavrenko & Croft relevance model):
    expansion-term weights P(w|R) = Σ_d P(d|Q)·P(w|d) over the top-10
    feedback docs — the language-model PRF that complements
    prf_rocchio_expand's vector-space tf·idf centroid (RM3 weights by
    the DOC's retrieval score, so one strongly-matching doc dominates;
    Rocchio averages democratically). P(d|Q) is the linear score
    normalisation score/Σscore (documented variant — a softmax would
    put exp() floats in the contract); original query terms excluded.

    Determinism: per-(doc, term) contributions q6-round FIRST from
    exact integers (score_q6, S, tf, dl), then BIGINT sums; rank over
    the quantized weight with a term tiebreak; an all-zero score page
    emits zero weights via the s = 0 guard.

    Scale shape: the feedback page is 10 rows broadcast into the token
    stream (the ltr_features trick) — tf/dl exist only for 10 docs;
    the weight agg is vocab-of-10-docs-sized."""
    agg = _bm25_match_set(spark, sf_dir, _RM3_TERMS)
    fb = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    stot = fb.agg(
        F.coalesce(F.sum("score_q6"), F.lit(0)).cast("long").alias("s")
    )
    ftf = (
        _toks(_docs(spark, sf_dir))
        .join(F.broadcast(fb.select("doc_id")), "doc_id", "left_semi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()  # dl + weight rows both consume it
    )
    fdl = ftf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    w = (
        ftf.where(~F.col("term").isin(_RM3_TERMS))
        .join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(fdl), "doc_id")
        .crossJoin(F.broadcast(stot))
        .select("term", F.expr(_RM3_W).alias("wq6"))
    )
    ws = w.groupBy("term").agg(F.sum("wq6").cast("long").alias("weight_q6"))
    return (
        ws.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("weight_q6"), F.asc("term")))
            .cast("long"),
        )
        .where(F.col("rank") <= 10)
        .select("term", "rank", "weight_q6")
        .orderBy("rank")
    )


@register(
    "dataset_datasheet",
    f"""WITH tk AS (
  SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents),
ts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(count(DISTINCT term) AS BIGINT) AS n_types
       FROM tk GROUP BY source),
ds AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dup
       FROM documents GROUP BY source)
SELECT ds.source AS source, ds.n_docs AS n_docs,
       CAST(COALESCE(ts.n_tokens, 0) AS BIGINT) AS n_tokens,
       ds.n_exact_dup AS n_exact_dup,
       CAST(round(1000000 * (CAST(COALESCE(ts.n_tokens, 0) AS DOUBLE) / ds.n_docs))
            AS BIGINT) AS mean_len_q6,
       CASE WHEN COALESCE(ts.n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * ts.n_types) // ts.n_tokens AS BIGINT)
       END AS ttr_q6
FROM ds LEFT JOIN ts USING (source) ORDER BY source""",
)
def dataset_datasheet(spark, sf_dir):
    """Per-source dataset datasheet — the one-table "datasheets for
    datasets" census a model card quotes: volume (docs, tokens), exact-
    duplicate load (docs minus distinct content hashes — the upper
    bound exact dedup would reclaim), mean length, and lexical
    diversity (TTR). Each column exists elsewhere at full depth
    (pipeline_waterfall, dedup censuses, msttr); this is the
    side-by-side per-source summary those ops don't give.

    Determinism: counts exact; mean_len is one divide-then-round;
    ttr is the integer division rule (line-7395 convention).

    Scale shape: ONE tokenize pass aggregated per source (count +
    two-phase distinct), ONE documents pass for the md5 census; the
    join runs on |sources| rows."""
    docs = _docs(spark, sf_dir)
    tk = docs.select("source", F.explode(spark_tokens("text")).alias("term"))
    ts = tk.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types"),
    )
    ds = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
        .cast("long")
        .alias("n_exact_dup"),
    )
    return (
        ds.join(ts, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "n_exact_dup",
            F.expr(
                "CAST(round(1000000 * (CAST(COALESCE(n_tokens, 0) AS DOUBLE)"
                " / n_docs)) AS BIGINT)"
            ).alias("mean_len_q6"),
            F.expr(
                "CASE WHEN COALESCE(n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_types) div n_tokens AS BIGINT) END"
            ).alias("ttr_q6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# session 77 — HLL precision curve, weekly type-mix JSD, supplier ship delay
# ---------------------------------------------------------------------------

# Flajolet alpha constants per precision; the folded estimator constant is
# alpha * m^2 * 2^(61-p) (register sums are exact BIGINTs in 2^-(61-p)
# units — the cardinality_sketch construction at three precisions).
_HLL_ALPHA = {4: 0.673, 6: 0.709, 8: 0.7213 / (1.0 + 1.079 / 256.0)}


def _hll_curve_block(p: int) -> str:
    m = 1 << p
    w1 = 61 - p  # max rank; register sum unit is 2^-(w1)
    c = repr(_HLL_ALPHA[p] * m * m * float(1 << w1))
    return f"""SELECT {p} AS p, {m} AS m_regs, ex.n_exact,
       CAST(round(
         CASE WHEN ({c} / CAST(z_int AS DOUBLE)) <= {int(2.5 * m)}e0
                   AND zeros > 0
              THEN {m}e0 * ln({m}e0 / CAST(zeros AS DOUBLE))
              ELSE {c} / CAST(z_int AS DOUBLE)
         END * 1000000) AS BIGINT) AS hll_q6
FROM (
  SELECT CAST({m} - count(*) AS BIGINT) AS zeros,
         CAST(COALESCE(sum((1::BIGINT << ({w1} - maxr))), 0)
              + ({m} - count(*)) * (1::BIGINT << {w1}) AS BIGINT) AS z_int
  FROM (SELECT reg, max(rnk) AS maxr FROM
        (SELECT h % {m} AS reg,
                CASE WHEN (h >> {p}) = 0 THEN {w1}
                     ELSE {w1} - length(bin(h >> {p})) END AS rnk
         FROM hh) GROUP BY reg)
) z CROSS JOIN ex"""


@register(
    "hll_precision_curve",
    f"""WITH sh AS ({_SQL_SHINGLES}),
ss AS MATERIALIZED (SELECT DISTINCT sh FROM sh),
hh AS MATERIALIZED (SELECT ('0x' || substr(md5(sh), 1, 15))::UBIGINT::BIGINT AS h FROM ss),
ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ss)
{_hll_curve_block(4)}
UNION ALL
{_hll_curve_block(6)}
UNION ALL
{_hll_curve_block(8)}
ORDER BY p""",
)
def hll_precision_curve(spark, sf_dir):
    """HLL register-count tuning curve: the same 60-bit-hash shingle
    stream sketched at p = 4/6/8 (16/64/256 registers) beside the exact
    distinct count — the memory-vs-error knob read the way
    lsh_band_config_curve reads (b, r) and bloom_fpr_curve reads bits
    per key. Each precision is the cardinality_sketch construction:
    register = low p bits, rank = leading-zero count of the remaining
    60−p bits, register sum as an exact BIGINT in 2^-(61-p) units,
    Flajolet linear-counting correction below 2.5m.

    Determinism: one double division per precision, estimator constants
    folded via repr() e-notation (_HLL_C rule); GROUP BY () makes the
    one-row register census explicit on both engines.

    Scale shape: the hash stream is scanned once per precision but each
    register agg is map-side max-mergeable into ≤256 rows — the whole
    curve's state is 336 registers regardless of input size (maxr per
    (p, reg) could even share one pass; three passes keep the generated
    SQL one-block-per-p)."""
    sh = _shingles_spark(spark, sf_dir)
    ss = sh.select("sh").distinct()
    hh = ss.select(_H60_SPARK(F.col("sh")).alias("h")).localCheckpoint()
    ex = hh.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    outs = []
    for p in (4, 6, 8):
        m = 1 << p
        w1 = 61 - p
        c = repr(_HLL_ALPHA[p] * m * m * float(1 << w1))
        rr = hh.select(
            F.expr(f"h % {m}").alias("reg"),
            F.expr(
                f"CASE WHEN (h >> {p}) = 0 THEN {w1}"
                f" ELSE {w1} - length(bin(h >> {p})) END"
            ).alias("rnk"),
        )
        regs = rr.groupBy("reg").agg(F.max("rnk").alias("maxr"))
        z = regs.agg(
            (F.lit(m) - F.count(F.lit(1))).cast("long").alias("zeros"),
            F.expr(
                f"CAST(COALESCE(sum(shiftleft(cast(1 as bigint),"
                f" cast({w1} - maxr as int))), 0)"
                f" + ({m} - count(1)) * shiftleft(cast(1 as bigint), {w1})"
                " AS BIGINT)"
            ).alias("z_int"),
        )
        outs.append(
            z.crossJoin(F.broadcast(ex)).select(
                F.lit(p).cast("long").alias("p"),
                F.lit(m).cast("long").alias("m_regs"),
                "n_exact",
                F.expr(
                    f"CAST(round(CASE WHEN ({c} / CAST(z_int AS DOUBLE)) <= {int(2.5 * m)}e0"
                    f" AND zeros > 0 THEN {m}e0 * ln({m}e0 / CAST(zeros AS DOUBLE))"
                    f" ELSE {c} / CAST(z_int AS DOUBLE) END * 1000000) AS BIGINT)"
                ).alias("hll_q6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("p")


# Per-cell JSD contribution, q6-rounded FIRST (the hellinger/KL rule).
# Columns: n (week-type count), nw (week total), gt (global type count),
# nt (global total); gt > 0 by spine construction so M > 0 always.
_WJSD_P = "(CAST(n AS DOUBLE) / nw)"
_WJSD_G = "(CAST(gt AS DOUBLE) / nt)"
_WJSD_M = f"(({_WJSD_P} + {_WJSD_G}) / 2e0)"
_WJSD_C = (
    f"CAST(round(1000000 * ((CASE WHEN n = 0 THEN 0e0"
    f" ELSE 5e-1 * {_WJSD_P} * ln({_WJSD_P} / {_WJSD_M}) END)"
    f" + 5e-1 * {_WJSD_G} * ln({_WJSD_G} / {_WJSD_M}))) AS BIGINT)"
)


@register(
    "events_weekly_type_jsd",
    f"""WITH e AS (
  SELECT epoch_us(ts) // {7 * _US_PER_DAY} AS week_num, event_type FROM events),
c AS (SELECT week_num, event_type, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY week_num, event_type),
wt AS (SELECT week_num, CAST(sum(n) AS BIGINT) AS nw FROM c GROUP BY week_num),
gt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS gt FROM c GROUP BY event_type),
nt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
spine AS (SELECT wt.week_num, wt.nw, gt.event_type, gt.gt FROM wt CROSS JOIN gt),
cell AS (SELECT spine.week_num, spine.nw, spine.gt,
                CAST(COALESCE(c.n, 0) AS BIGINT) AS n, nt.nt
         FROM spine LEFT JOIN c USING (week_num, event_type) CROSS JOIN nt),
j AS (SELECT week_num, nw, CAST(sum({_WJSD_C}) AS BIGINT) AS jsd_q6
      FROM cell GROUP BY week_num, nw)
SELECT CAST(week_num AS BIGINT) AS week_num, nw AS n_events, jsd_q6
FROM j ORDER BY week_num""",
)
def events_weekly_type_jsd(spark, sf_dir):
    """Weekly event-type mix drift: Jensen-Shannon divergence of each
    week's type distribution against the whole stream's — the
    distribution-shift monitor for the event mix itself (term/lang/
    quality drift watch the corpus by decile; this watches traffic by
    calendar). JSD is bounded (≤ ln 2) and symmetric, so weeks are
    comparable; a launch week where clicks double shows as a spike.

    Determinism: the (week × type) spine gives every cell a row (absent
    types contribute only the global half — the 0-guard is inside the
    shared expr); per-cell contributions q6-round FIRST from exact
    integers, then BIGINT-sum per week.

    Scale shape: one (week, type) groupBy over events (map-side
    partials); spine, join, and the per-week sum all run on
    calendar×type-bounded cells."""
    e = _events(spark, sf_dir).select(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {7 * _US_PER_DAY}").alias(
            "week_num"
        ),
        "event_type",
    )
    c = (
        e.groupBy("week_num", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # 4 consumers (wt/gt/nt/cell join)
    )
    wt = c.groupBy("week_num").agg(F.sum("n").cast("long").alias("nw"))
    gtd = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("gt"))
    nt = c.agg(F.sum("n").cast("long").alias("nt"))
    spine = wt.crossJoin(F.broadcast(gtd))
    cell = (
        spine.join(c, ["week_num", "event_type"], "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "week_num",
            "nw",
            "gt",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            "nt",
        )
    )
    return (
        cell.groupBy("week_num", "nw")
        .agg(F.sum(F.expr(_WJSD_C)).cast("long").alias("jsd_q6"))
        .select(
            F.col("week_num").cast("long").alias("week_num"),
            F.col("nw").alias("n_events"),
            "jsd_q6",
        )
        .orderBy("week_num")
    )


@register(
    "supplier_ship_delay_topk",
    f"""WITH l AS (
  SELECT l_suppkey, l_orderkey,
         epoch_us(CAST(l_shipdate AS TIMESTAMP)) // {_US_PER_DAY} AS ship_day
  FROM lineitem),
o AS (SELECT o_orderkey,
             epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_US_PER_DAY} AS order_day
      FROM orders),
lag AS (SELECT l.l_suppkey, l.ship_day - o.order_day AS lag_days
        FROM l JOIN o ON o.o_orderkey = l.l_orderkey),
s AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(lag_days) AS BIGINT) AS sum_lag
      FROM lag GROUP BY l_suppkey),
r AS (SELECT l_suppkey, n_items,
             CAST(round(1000000 * (CAST(sum_lag AS DOUBLE) / n_items)) AS BIGINT)
               AS mean_lag_q6
      FROM s WHERE n_items >= 5)
SELECT l_suppkey, n_items, mean_lag_q6,
       CAST(row_number() OVER (ORDER BY mean_lag_q6 DESC, l_suppkey ASC)
            AS BIGINT) AS rank
FROM r ORDER BY mean_lag_q6 DESC, l_suppkey ASC LIMIT 10""",
)
def supplier_ship_delay_topk(spark, sf_dir):
    """Slowest-shipping suppliers: mean order-to-ship lag in days per
    supplier, volume-gated (n ≥ 5 — a one-item supplier with one slow
    order isn't a signal), top-10 worst. The supplier-accountability
    cut of ship_lag_histogram's global distribution — the vendor
    scorecard a procurement review asks for.

    Determinism: integer day lags summed exact; mean is one
    divide-then-round; rank over the quantized mean, suppkey tiebreak.

    Scale shape: the lineitem⋈orders join keys both sides on orderkey
    (un-hinted, both unbounded — the Q4 rule); the supplier agg
    combines map-side into |suppliers| rows; TakeOrdered top-10."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey",
        "l_orderkey",
        F.expr(
            f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_US_PER_DAY}"
        ).alias("ship_day"),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.expr(
            f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_PER_DAY}"
        ).alias("order_day"),
    )
    lag = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_suppkey", (F.col("ship_day") - F.col("order_day")).alias("lag_days")
    )
    s = lag.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("lag_days").cast("long").alias("sum_lag"),
    )
    r = s.where(F.col("n_items") >= 5).select(
        "l_suppkey",
        "n_items",
        F.expr(
            "CAST(round(1000000 * (CAST(sum_lag AS DOUBLE) / n_items)) AS BIGINT)"
        ).alias("mean_lag_q6"),
    )
    top = r.orderBy(F.desc("mean_lag_q6"), F.asc("l_suppkey")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("mean_lag_q6"), F.asc("l_suppkey")))
        .cast("long"),
    ).select("l_suppkey", "n_items", "mean_lag_q6", "rank")


# ---------------------------------------------------------------------------
# session 78 — embedding anisotropy share, PQ codebook utilization,
# order-month seasonality
# ---------------------------------------------------------------------------


def _isotropy_sql() -> str:
    """Generated oracle: the power-iteration chain through v3 (reused via
    :func:`_poweriter_sql`'s building blocks — same MATERIALIZED tables),
    one extra matvec for the Rayleigh numerator, trace from the q6
    matrix; per-vector squares floored q12→q6 BEFORE summing (the
    embedding_norm_outliers envelope rule)."""
    chain = _poweriter_sql(_PI_ITERS)
    # drop the final SELECT of the PI oracle, keep its CTE chain
    chain = chain[: chain.rindex("SELECT CAST(dim AS BIGINT)")].rstrip()
    if chain.endswith(","):
        chain = chain[:-1]
    return (
        chain
        + f""",
s4 AS MATERIALIZED (SELECT xq.vec_id, CAST(sum(xq.x * vv.v) AS BIGINT) AS s
  FROM xq JOIN v{_PI_ITERS} vv USING (dim) GROUP BY xq.vec_id),
u4 AS (SELECT vec_id, {_PI_U} AS u FROM s4),
tt AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS t FROM xq GROUP BY vec_id),
vvn AS (SELECT CAST(COALESCE(sum(v * v), 0) AS BIGINT) AS vv FROM v{_PI_ITERS}),
ag AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(COALESCE(sum((u4.u * u4.u) // 1000000), 0) AS BIGINT) AS sa,
              CAST(COALESCE(sum(tt.t // 1000000), 0) AS BIGINT) AS st6
       FROM u4 JOIN tt USING (vec_id))
SELECT n_vecs,
       CASE WHEN st6 = 0 OR vv = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * ((CAST(sa AS DOUBLE) / st6)
                 * (1000000000000e0 / vv))) AS BIGINT) END AS var_explained_q6
FROM ag CROSS JOIN vvn"""
    )


@register("embedding_isotropy", _isotropy_sql())
def embedding_isotropy(spark, sf_dir):
    """Anisotropy share of the embedding space: the fraction of total
    (uncentered) variance captured by the top principal direction —
    Rayleigh quotient Σ(x·v̂)² / Σ‖x‖² with v from
    embedding_power_iteration. The Ethayarajh-2019 "is one direction
    eating the space" check as ONE number: isotropic random vectors sit
    near 1/d; a contextual encoder whose outputs collapse toward a cone
    sits near 1. Feeds the whiten-or-not decision before ANN indexing.

    Determinism: v is the PI op's own 64-row output (collected — the
    bounded-collect convention); dots are exact q6-integer folds; the
    per-vector squares (u², ‖x‖²_q12) are floored q12→q6 BEFORE the
    BIGINT sums (the norm-outliers envelope rule — sums then fit to
    ~1e12 vectors); ‖v‖² corrects the q6-rounded direction's length
    exactly. One shared float expression at the end.

    Scale shape: one extra map-side matvec over the checkpointed q6
    matrix (no joins — v is a 64-literal array) and a 1-row census."""
    vrows = embedding_power_iteration(spark, sf_dir).orderBy("dim").collect()
    v = [int(r["v_q6"]) for r in vrows]
    vv = sum(x * x for x in v)
    e = _emb(spark, sf_dir).select(
        F.expr(
            "transform(embedding, c -> CAST(round(1000000 * cast(c as double)) AS BIGINT))"
        ).alias("xarr")
    )
    vlit = "array(" + ",".join(f"{int(x)}L" for x in v) + ")"
    per = e.select(
        F.expr(
            f"aggregate(zip_with(xarr, {vlit}, (a, b) -> a * b), 0L, (acc, z) -> acc + z)"
        ).alias("s"),
        F.expr(
            "aggregate(zip_with(xarr, xarr, (a, b) -> a * b), 0L, (acc, z) -> acc + z)"
        ).alias("t"),
    ).select(F.expr(_PI_U).alias("u"), "t")
    ag = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.coalesce(F.sum(F.expr("(u * u) div 1000000")), F.lit(0))
        .cast("long")
        .alias("sa"),
        F.coalesce(F.sum(F.expr("t div 1000000")), F.lit(0))
        .cast("long")
        .alias("st6"),
    )
    if vv == 0:
        return ag.select(
            "n_vecs", F.lit(0).cast("long").alias("var_explained_q6")
        )
    return ag.select(
        "n_vecs",
        F.expr(
            f"CASE WHEN st6 = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE CAST(round(1000000 * ((CAST(sa AS DOUBLE) / st6)"
            f" * (1000000000000e0 / {vv}))) AS BIGINT) END"
        ).alias("var_explained_q6"),
    )


@register(
    "pq_code_histogram",
    _pq_sql()
    + """,
h AS (SELECT m, cid, CAST(count(*) AS BIGINT) AS n FROM codes GROUP BY m, cid),
per AS (SELECT m, CAST(count(*) AS BIGINT) AS n_codes_used,
               CAST(sum(n) AS BIGINT) AS tot
        FROM h GROUP BY m),
top AS (SELECT m, cid AS top_cid, n AS top_n FROM (
          SELECT m, cid, n,
                 row_number() OVER (PARTITION BY m ORDER BY n DESC, cid ASC) AS rn
          FROM h) WHERE rn = 1)
SELECT CAST(per.m AS BIGINT) AS m, per.n_codes_used,
       CAST(top.top_cid AS BIGINT) AS top_cid, top.top_n,
       CAST((1000000 * top.top_n) // per.tot AS BIGINT) AS top_share_q6
FROM per JOIN top USING (m) ORDER BY m""",
)
def pq_code_histogram(spark, sf_dir):
    """PQ codebook utilization audit: per subspace, how many of the 16
    codewords the corpus actually uses, and how concentrated the
    assignment is (top codeword's share) — the ivf_cluster_balance
    reading applied to the PQ index. A subspace where one codeword
    holds 90% of vectors contributes ~0 bits of its 4-bit budget; the
    fix is codebook retraining or OPQ rotation, and THIS table is how
    you notice.

    Determinism: counts exact; share is integer division; the top
    codeword picks by (count desc, cid asc) — Spark map-side
    max(struct(n, -cid)) (the search_collapse rule), the oracle may
    window.

    Scale shape: codes are M rows per vector; the (m, cid) agg is
    map-side into ≤128 rows and everything downstream is tiny."""
    codes, _lut, _qn = _pq_index(spark, sf_dir)
    h = codes.groupBy("m", "cid").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per = h.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_codes_used"),
        F.sum("n").cast("long").alias("tot"),
        F.max(F.struct(F.col("n"), (-F.col("cid")).alias("nc"))).alias("t"),
    )
    return per.select(
        F.col("m").cast("long").alias("m"),
        "n_codes_used",
        (-F.col("t.nc")).cast("long").alias("top_cid"),
        F.col("t.n").alias("top_n"),
        F.expr("CAST((1000000 * t.n) div tot AS BIGINT)").alias(
            "top_share_q6"
        ),
    ).orderBy("m")
