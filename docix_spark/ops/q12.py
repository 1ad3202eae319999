"""driver_queries chunk q12 (original lines 41713-45180): functional_dependency_census, negative_idf_census, ann_quantization_sensitivity, rle_run_census, ... bigram_hapax_share (45 ops).

Linearized continuation of docix_spark.ops.q11 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q11")

@register(
    "functional_dependency_census",
    "\nUNION ALL\n".join(
        [
            _fd_arm_sql("source_to_lang", "documents", "source", "lang"),
            _fd_arm_sql("lang_to_source", "documents", "lang", "source"),
            _fd_arm_sql("brand_to_type", "part", "p_brand", "p_type"),
        ]
    )
    + "\nORDER BY dependency",
)
def functional_dependency_census(spark, sf_dir):
    """Approximate functional-dependency detector: for X→Y candidate
    pairs, ndv(X) / ndv(X,Y) — exactly 1e6 when each X value maps to
    ONE Y (a true FD: Y is derivable, joins on X can carry Y for free,
    and the optimizer may treat ndv(X,Y) = ndv(X)); the fraction below
    1e6 measures how many X values split across Ys
    (source_lang_mutual_info scores the same relationship
    information-theoretically; THIS is the schema-design/CBO form).

    Determinism: exact distinct counts, one integer division per
    dependency.

    Scale shape: each arm is two two-phase distinct aggs over one
    table; three independent arms union."""
    arms = []
    for name, table, x, y in [
        ("source_to_lang", "documents", "source", "lang"),
        ("lang_to_source", "documents", "lang", "source"),
        ("brand_to_type", "part", "p_brand", "p_type"),
    ]:
        t = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        s = t.agg(
            F.countDistinct(x).cast("long").alias("ndv_x"),
            F.countDistinct(y).cast("long").alias("ndv_y"),
            F.countDistinct(x, y).cast("long").alias("ndv_xy"),
        )
        arms.append(
            s.select(
                F.lit(name).alias("dependency"),
                "ndv_x",
                "ndv_y",
                "ndv_xy",
                F.expr(
                    "CAST((1000000 * ndv_x) div ndv_xy AS BIGINT)"
                ).alias("fd_strength_q6"),
            )
        )
    return arms[0].unionByName(arms[1]).unionByName(arms[2]).orderBy(
        "dependency"
    )


# ---------------------------------------------------------------------------
# session 165 — negative-idf census, ANN quantization check, RLE runs
# ---------------------------------------------------------------------------


@register(
    "negative_idf_census",
    f"""WITH tf AS ({SQL_TF}),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
neg AS (
  SELECT dfs.term, dfs.df, nd.n_docs,
         CAST(round(1000000 * ln(CAST(nd.n_docs AS DOUBLE) / dfs.df)) AS BIGINT)
           AS idf_classic_q6
  FROM dfs, nd WHERE 2 * dfs.df > nd.n_docs)
SELECT term, df, n_docs, idf_classic_q6
FROM neg ORDER BY df DESC, term ASC LIMIT 20""",
)
def negative_idf_census(spark, sf_dir):
    """The idf floor's caseload: terms appearing in MORE than half the
    corpus, with their classic ln(N/df) idf — the zone where naive
    tf·idf goes ≤ ln 2 and the probabilistic idf ln((N−df+.5)/(df+.5))
    goes NEGATIVE, which is why Lucene floors BM25's idf at 0 and why
    common_terms_search demotes these terms to low-frequency matchers;
    THIS table names the terms that policy actually touches and how
    much mass they carry (empty on a diverse corpus; the synthetic
    sandbox's tight vocabulary populates it honestly).

    Determinism: exact integer df/N; one ln per surviving term, q6.

    Scale shape: standard df agg; the df > N/2 cut leaves a handful of
    rows before the TakeOrdered."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    nd = tf.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    neg = (
        dfs.crossJoin(F.broadcast(nd))
        .where(F.expr("2 * df > n_docs"))
        .select(
            "term",
            "df",
            "n_docs",
            F.expr(
                "CAST(round(1000000 * ln(CAST(n_docs AS DOUBLE) / df)) AS BIGINT)"
            ).alias("idf_classic_q6"),
        )
    )
    return neg.orderBy(F.desc("df"), F.asc("term")).limit(20)


@register(
    "ann_quantization_sensitivity",
    _SQL_EMB_E
    + """
qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 37 = 0),
sc AS (
  SELECT qs.qid, e.vec_id,
         list_dot_product(e.v, qs.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.qv, qs.qv))) AS c
  FROM qs, e WHERE e.vec_id <> 0),
t6 AS (SELECT qid, vec_id FROM (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY
           CAST(round(1000000 * c) AS BIGINT) DESC, vec_id ASC) AS rn
  FROM sc) WHERE rn <= 10),
t9 AS (SELECT qid, vec_id FROM (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY
           CAST(round(1000000000 * c) AS BIGINT) DESC, vec_id ASC) AS rn
  FROM sc) WHERE rn <= 10)
SELECT t6.qid, CAST(count(*) AS BIGINT) AS n_overlap
FROM t6 JOIN t9 USING (qid, vec_id)
GROUP BY t6.qid ORDER BY t6.qid""",
)
def ann_quantization_sensitivity(spark, sf_dir):
    """Is the q6 contract rounding ever DECIDING a ranking? For each
    batch query, the overlap between the exact top-10 under q6-rounded
    cosines and under q9-rounded cosines — anything below 10 means two
    true cosines within 1e-6 straddled a rank boundary and the house
    quantization (not geometry) picked the winner. A full-10 column is
    the evidence the q6 convention is safe on this data; where it ever
    dips, the affected op should move to q9 (as the centroid/assign
    ops already do).

    Determinism: both rankings round the SAME double cosine at two
    scales with vec_id tiebreaks — each is individually exact.

    Scale shape: ONE brute-force scoring pass feeds both windows
    (query-batch × corpus, the recall oracles' price, shared);
    overlap is a 10-row-per-query join."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    qs = e.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, z) -> acc + z)"
    sc = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qs))
        .select(
            "qid",
            "vec_id",
            F.expr(
                f"{dot.format(a='v', b='qv')}"
                f" / (sqrt({dot.format(a='v', b='v')}) * sqrt({dot.format(a='qv', b='qv')}))"
            ).alias("c"),
        )
        .localCheckpoint()
    )
    w6 = Window.partitionBy("qid").orderBy(
        F.expr("CAST(round(1000000 * c) AS BIGINT)").desc(), F.asc("vec_id")
    )
    w9 = Window.partitionBy("qid").orderBy(
        F.expr("CAST(round(1000000000 * c) AS BIGINT)").desc(), F.asc("vec_id")
    )
    t6 = (
        sc.withColumn("rn", F.row_number().over(w6))
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    t9 = (
        sc.withColumn("rn", F.row_number().over(w9))
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    return (
        t6.join(t9, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        .orderBy("qid")
    )


_RLE_SHARD = 1024  # (orderkey-range) sub-shard width for the boundary pass


@register(
    "rle_run_census",
    """WITH s AS (
  SELECT l_returnflag AS v,
         row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_returnflag) AS rn
  FROM lineitem),
lg AS (SELECT v, lag(v) OVER (ORDER BY rn) AS pv FROM s),
tr AS (SELECT CAST(sum(CASE WHEN pv IS NOT NULL AND v <> pv THEN 1 ELSE 0 END)
              AS BIGINT) AS transitions,
              CAST(count(*) AS BIGINT) AS n_rows
       FROM lg),
srt AS (SELECT CAST(count(DISTINCT v) AS BIGINT) AS ndv FROM s)
SELECT tr.n_rows, CAST(tr.transitions + 1 AS BIGINT) AS n_runs_natural,
       srt.ndv AS n_runs_sorted,
       CAST((1000000 * (tr.transitions + 1)) // srt.ndv AS BIGINT)
         AS run_inflation_q6
FROM tr, srt""",
)
def rle_run_census(spark, sf_dir):
    """Run-length encoding audit for l_returnflag: runs under the
    table's natural (l_orderkey, l_linenumber) order versus the ndv
    runs a value-sort would produce — RLE/dictionary-RLE pays by the
    RUN, so run_inflation (natural/sorted) is exactly the compression
    a re-sort buys on this column (column_encoding_advisor prices
    dictionary codes; sort_layout_pruning_estimate prices scan
    pruning; this completes the layout-advisor trio with the RLE
    axis).

    Determinism: pure integer transition counts over a TOTAL order —
    the synthetic data repeats (orderkey, linenumber) pairs, so the
    value itself is the final sort key (rows identical in all three
    are interchangeable and can't create a transition).

    Scale shape (Spark): the transition count is NOT one global lag
    window — orderkey-range sub-shards count their internal
    transitions in parallel and the shard-boundary transitions come
    from the tiny (shard → first/last value) table joined to itself
    shifted by one (the watermark/skyline two-pass family, third
    member); identical to the oracle's single window."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", F.col("l_returnflag").alias("v")
    )
    sh = li.withColumn("shard", F.expr(f"l_orderkey div {_RLE_SHARD}"))
    win = Window.partitionBy("shard").orderBy("l_orderkey", "l_linenumber", "v")
    lg = sh.withColumn("pv", F.lag("v").over(win))
    within = lg.agg(
        F.sum(
            F.expr("CASE WHEN pv IS NOT NULL AND v <> pv THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("t_in"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    fl = (
        sh.groupBy("shard")
        .agg(
            F.min(F.struct("l_orderkey", "l_linenumber", "v")).alias("first"),
            F.max(F.struct("l_orderkey", "l_linenumber", "v")).alias("last"),
        )
        .select(
            "shard",
            F.col("first.v").alias("first_v"),
            F.col("last.v").alias("last_v"),
        )
    )
    bnd = (
        fl.withColumn(
            "prev_last", F.lag("last_v").over(Window.orderBy("shard"))
        )
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN prev_last IS NOT NULL AND first_v <> prev_last"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("t_bnd")
        )
    )
    ndv = li.agg(F.countDistinct("v").cast("long").alias("ndv"))
    return (
        within.crossJoin(bnd)
        .crossJoin(ndv)
        .select(
            "n_rows",
            F.expr("CAST(t_in + t_bnd + 1 AS BIGINT)").alias("n_runs_natural"),
            F.col("ndv").alias("n_runs_sorted"),
            F.expr(
                "CAST((1000000 * (t_in + t_bnd + 1)) div ndv AS BIGINT)"
            ).alias("run_inflation_q6"),
        )
    )


# ---------------------------------------------------------------------------
# session 166 — LSH candidate recall, temporal FK audit, cosine histogram
# ---------------------------------------------------------------------------


@register(
    "lsh_candidate_recall",
    _SQL_LSH_PAIRS
    + """,
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
tp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON b.sh = a.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
truth AS (
  SELECT tp.doc_a, tp.doc_b
  FROM tp JOIN sizes na ON na.doc_id = tp.doc_a
  JOIN sizes nb ON nb.doc_id = tp.doc_b
  WHERE 3 * tp.c >= na.n + nb.n),
hit AS (SELECT truth.doc_a, truth.doc_b
        FROM truth JOIN pairs ON pairs.doc_a = truth.doc_a
                             AND pairs.doc_b = truth.doc_b)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_found,
       CASE WHEN (SELECT count(*) FROM truth) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(((SELECT count(*) FROM hit) * 1000000)
                 // (SELECT count(*) FROM truth) AS BIGINT)
       END AS recall_q6""",
)
def lsh_candidate_recall(spark, sf_dir):
    """LSH banding RECALL — of all true near-duplicate pairs (exact
    shingle Jaccard ≥ 0.5, enumerated over the shingle-blocked
    universe: only pairs sharing ≥1 shingle can clear J ≥ 0.5, so the
    blocked join IS the complete truth set), the fraction the band
    join actually surfaces — the missing half of
    lsh_candidate_precision's tuning pair: precision says how much
    verify budget is wasted, recall says how many real duplicates the
    banding LOSES (the b/r S-curve trades exactly these two).

    Determinism: the truth test is the integer cross-multiplication
    3c ≥ n_a + n_b; counts exact.

    Scale shape: the truth join blocks on the shingle key (per-shingle
    df bounds the fan — the ngram_jaccard bound); the hit check is a
    pair-key join against the memoized candidate edges; three scalar
    counts."""
    edges = _lsh_pair_edges(spark, sf_dir)
    pairs = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    sh = _shingles_spark(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    tp = (
        a.join(b, (F.col("sh") == F.col("sh_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    truth = (
        tp.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .where(F.expr("3 * c >= na + nb"))
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    hit = truth.join(pairs, ["doc_a", "doc_b"])
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
    nf = hit.agg(F.count(F.lit(1)).cast("long").alias("n_found"))
    return nt.crossJoin(nf).select(
        "n_true_pairs",
        "n_found",
        F.expr(
            "CASE WHEN n_true_pairs = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((n_found * 1000000) div n_true_pairs AS BIGINT) END"
        ).alias("recall_q6"),
    )


@register(
    "ship_before_order_census",
    f"""WITH j AS (
  SELECT epoch_us(l.l_shipdate) // {_US_PER_DAY}
           - epoch_us(o.o_orderdate) // {_US_PER_DAY} AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST((1000000 * sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS violation_q6,
       CAST(min(lag_days) AS BIGINT) AS worst_lag_days
FROM j""",
)
def ship_before_order_census(spark, sf_dir):
    """Temporal referential-integrity audit: line items whose ship date
    precedes their order's order date — the cross-table CHECK rule the
    single-table audits (events_rule_audit, nchars_integrity_audit)
    can't see, and the silent poison in every lag/backlog op
    (ship_lag_by_month's means, the aging buckets). worst_lag_days
    names the magnitude. Zero violations is the healthy TPC-H reading
    — the property suite injects time-travelers.

    Determinism: integer epoch-day arithmetic, conditional counts.

    Scale shape: the engine's hottest FK join (orderkey), then one
    map-side-combined counter row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
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
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("sd") - F.col("od")).alias("lag_days")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.expr("CASE WHEN lag_days < 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_violations"),
    ).crossJoin(
        j.agg(F.min("lag_days").cast("long").alias("worst_lag_days"))
    ).select(
        "n_items",
        "n_violations",
        F.expr(
            "CAST((1000000 * n_violations) div n_items AS BIGINT)"
        ).alias("violation_q6"),
        "worst_lag_days",
    )


@register(
    "semdedup_threshold_histogram",
    _KMEANS_SQL_PRELUDE
    + """,
un AS (
  SELECT vec_id, list_transform(v, x -> x / n) AS u
  FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e WHERE vec_id <> 0)
),
mem AS (SELECT a3.vec_id, a3.cid, un.u FROM a3 JOIN un USING (vec_id)),
pr AS (
  SELECT CAST(round(1000000 * list_dot_product(a.u, b.u)) AS BIGINT) AS cos_q6
  FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id < b.vec_id),
bk AS (SELECT CASE WHEN cos_q6 >= 1000000 THEN 9
                   WHEN cos_q6 < -1000000 THEN -10
                   ELSE CAST(floor(cos_q6 / 100000.0) AS BIGINT) END AS band
       FROM pr)
SELECT band, CAST(count(*) AS BIGINT) AS n_pairs
FROM bk GROUP BY band ORDER BY band""",
)
def semdedup_threshold_histogram(spark, sf_dir):
    """The raw material behind semdedup's threshold: the full
    distribution of WITHIN-CELL pairwise cosines, banded at 0.1 — the
    curve you read before setting the drop cutoff (semdedup applies
    one fixed threshold; ann_mutual_knn takes the extreme top; THIS
    shows where the mass sits, so the 0.35-on-sandbox /
    0.95-in-production calibration stops being folklore). Bands clamp
    to [-10, 9] so ±1.0 cosines land in the edge bins.

    Determinism: the shared normalize-once q6 cosine; band =
    floor(cos/0.1) via float floor on an exact integer/1e5 — identical
    both engines.

    Scale shape: pairs come from the memoized `_incell_pair_cos` front
    half (blocked on cid — the semdedup bound); the band rollup is ≤20
    rows."""
    pr = _incell_pair_cos(spark, sf_dir).select(F.col("cosn_q6").alias("cos_q6"))
    bk = pr.select(
        F.expr(
            "CASE WHEN cos_q6 >= 1000000 THEN 9 WHEN cos_q6 < -1000000 THEN -10"
            " ELSE CAST(floor(cos_q6 / 100000.0) AS BIGINT) END"
        ).alias("band")
    )
    return (
        bk.groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# session 167 — unified blocking-strategy comparison
# ---------------------------------------------------------------------------


@register(
    "blocking_strategy_compare",
    f"""WITH w AS ({SQL_WORDS}),
shg AS (SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s
        FROM w, unnest(generate_series(1, len(words) - 2)) AS t(i)),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shg GROUP BY doc_id),
tp AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS c
       FROM shg a JOIN shg b ON b.s = a.s AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id),
truth AS (SELECT tp.da, tp.db FROM tp
          JOIN sizes na ON na.doc_id = tp.da
          JOIN sizes nb ON nb.doc_id = tp.db
          WHERE 3 * tp.c >= na.n + nb.n),
ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
sig AS (SELECT doc_id, min(md5('0:' || s)) AS mh0, min(md5('1:' || s)) AS mh1,
               min(md5('2:' || s)) AS mh2, min(md5('3:' || s)) AS mh3
        FROM shg GROUP BY doc_id),
mbands AS (SELECT doc_id, mh0 || mh1 AS band FROM sig
           UNION ALL SELECT doc_id, mh2 || mh3 FROM sig),
mpairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM mbands a JOIN mbands b
             ON a.band = b.band AND a.doc_id < b.doc_id),
tf2 AS (SELECT doc_id, term, count(*) AS tf FROM ({SQL_TOKS}) GROUP BY doc_id, term),
h2 AS (SELECT doc_id, tf, {_H60_SQL} AS h FROM tf2),
bits2 AS (SELECT doc_id, j, sum(tf * (((h >> j) & 1) * 2 - 1)) AS vote
          FROM h2, (SELECT unnest(generate_series(0, 59)) AS j)
          GROUP BY doc_id, j),
sh2 AS (SELECT doc_id,
               CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sim
        FROM bits2 GROUP BY doc_id),
sbands AS (SELECT doc_id, sim, j, (sim >> (15 * j)) & 32767 AS bv
           FROM sh2, (SELECT unnest(generate_series(0, 3)) AS j)),
spairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM sbands a JOIN sbands b
             ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
           WHERE bit_count(xor(a.sim, b.sim)) <= 3),
fp AS (SELECT doc_id, md5(array_to_string(words[1:8], ' ')) AS f FROM w),
ppairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM fp a JOIN fp b ON b.f = a.f AND a.doc_id < b.doc_id),
arm AS (
  SELECT 'minhash_band' AS strategy,
         (SELECT CAST(count(*) AS BIGINT) FROM mpairs) AS n_candidates,
         (SELECT CAST(count(*) AS BIGINT) FROM mpairs
          JOIN truth ON truth.da = mpairs.da AND truth.db = mpairs.db) AS n_found
  UNION ALL
  SELECT 'simhash_band',
         (SELECT CAST(count(*) AS BIGINT) FROM spairs),
         (SELECT CAST(count(*) AS BIGINT) FROM spairs
          JOIN truth ON truth.da = spairs.da AND truth.db = spairs.db)
  UNION ALL
  SELECT 'prefix_fingerprint',
         (SELECT CAST(count(*) AS BIGINT) FROM ppairs),
         (SELECT CAST(count(*) AS BIGINT) FROM ppairs
          JOIN truth ON truth.da = ppairs.da AND truth.db = ppairs.db))
SELECT arm.strategy, arm.n_candidates, arm.n_found, ntr.n_truth,
       CASE WHEN arm.n_candidates = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * arm.n_found) // arm.n_candidates AS BIGINT)
       END AS precision_q6,
       CASE WHEN ntr.n_truth = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * arm.n_found) // ntr.n_truth AS BIGINT)
       END AS recall_q6
FROM arm, ntr ORDER BY arm.strategy""",
)
def blocking_strategy_compare(spark, sf_dir):
    """The record-linkage bake-off: the three blocking strategies the
    engine ships — MinHash banding (4 perms × 2 bands), SimHash banding
    (4×15-bit bands, Hamming ≤ 3 verify), and the leading-8-token
    prefix fingerprint — scored on ONE corpus against ONE truth set
    (exact shingle Jaccard ≥ 0.5 over the shingle-blocked universe),
    each with candidate volume, precision, and recall. Until now each
    strategy carried its own diagnostic (lsh_candidate_precision/
    recall, simhash_hamming_histogram, dedup_method_agreement's
    contingency); THIS is the unified table a pipeline owner reads to
    pick the blocker — cheap-and-sharp (prefix), guaranteed-recall-
    within-Hamming (simhash), or tunable-S-curve (minhash).

    Determinism: every candidate set and the truth test are exact
    integer/hash constructions already proven pairwise; two guarded
    divisions per row.

    Scale shape: each candidate generator blocks on its own key (band
    value / fingerprint) — nothing all-pairs; the truth join blocks on
    shingles; hit checks are pair-key joins; output is 3 rows."""
    w = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words"))
    sh = _shingles_spark(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    a_ = sh.select(F.col("doc_id").alias("da"), "sh")
    b_ = sh.select(F.col("doc_id").alias("db"), F.col("sh").alias("sh_b"))
    tp = (
        a_.join(b_, (F.col("sh") == F.col("sh_b")) & (F.col("da") < F.col("db")))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    truth = (
        tp.join(sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db")
        .where(F.expr("3 * c >= na + nb"))
        .select("da", "db")
        .localCheckpoint()
    )
    ntr = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))

    mpairs = (
        _lsh_pair_edges(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("da"), F.col("dst").alias("db"))
    )
    shh = _simhash_spark(spark, sf_dir)
    sbands = shh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(f"(simhash >> {15 * j}) & 32767").alias("bv"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("band"),
    ).select(
        "doc_id", "simhash", F.col("band.j").alias("j"), F.col("band.bv").alias("bv")
    )
    sa, sb = sbands.alias("a"), sbands.alias("b")
    spairs = (
        sa.join(
            sb,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(F.expr("bit_count(a.simhash ^ b.simhash) <= 3"))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    fp = w.select(
        "doc_id", F.md5(F.array_join(F.slice("words", 1, 8), " ")).alias("f")
    )
    fa = fp.select(F.col("doc_id").alias("da"), "f")
    fb = fp.select(F.col("doc_id").alias("db"), F.col("f").alias("f_b"))
    ppairs = (
        fa.join(fb, (F.col("f") == F.col("f_b")) & (F.col("da") < F.col("db")))
        .select("da", "db")
        .distinct()
    )

    def arm(pairs, name):
        nc = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        nf = pairs.join(truth, ["da", "db"]).agg(
            F.count(F.lit(1)).cast("long").alias("n_found")
        )
        return nc.crossJoin(nf).select(
            F.lit(name).alias("strategy"), "n_candidates", "n_found"
        )

    arms = (
        arm(mpairs, "minhash_band")
        .unionByName(arm(spairs, "simhash_band"))
        .unionByName(arm(ppairs, "prefix_fingerprint"))
    )
    return (
        arms.crossJoin(F.broadcast(ntr))
        .select(
            "strategy",
            "n_candidates",
            "n_found",
            "n_truth",
            F.expr(
                "CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_found) div n_candidates AS BIGINT) END"
            ).alias("precision_q6"),
            F.expr(
                "CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * n_found) div n_truth AS BIGINT) END"
            ).alias("recall_q6"),
        )
        .orderBy("strategy")
    )


# ---------------------------------------------------------------------------
# session 168 — fold balance, relevant-rank histogram, hash uniformity
# ---------------------------------------------------------------------------


@register(
    "fold_balance_audit",
    f"""WITH f AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 4))::INT % 5 AS fold
  FROM documents),
tk AS (SELECT f.fold, t.term FROM ({SQL_TOKS}) t JOIN f USING (doc_id)),
d AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_docs
      FROM f GROUP BY fold),
s AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT term) AS BIGINT) AS n_terms
      FROM tk GROUP BY fold)
SELECT CAST(d.fold AS BIGINT) AS fold, d.n_docs,
       CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.n_terms, 0) AS BIGINT) AS n_terms,
       CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1e6 * s.n_terms / CAST(s.n_tokens AS BIGINT)) AS BIGINT)
       END AS ttr_q6
FROM d LEFT JOIN s ON s.fold = d.fold ORDER BY fold""",
)
def fold_balance_audit(spark, sf_dir):
    """Are the five CV folds actually exchangeable? Per fold (the
    VERBATIM stratified_kfold_assign hex-13-16 coordinate): docs,
    tokens, vocabulary, TTR — the balance check that closes the
    cross-validation story (assign → fold_leakage_check →
    THIS): folds differing materially in size or lexical texture bias
    every per-fold metric before leakage is even a question
    (idf_split_stability is the same license test at the even/odd
    grain). Empty folds report zeros by the LEFT-join rule.

    Determinism: the fold hash is the shared coordinate; counts
    exact; TTR uses the 1e6-e-notation divide-round.

    Scale shape: fold tags are map-side; one token explode feeds a
    5-group agg with a two-phase distinct."""
    f = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 13, 4), 16, 10) as int) % 5"
        ).alias("fold"),
    )
    tk = _toks(_docs(spark, sf_dir)).join(f, "doc_id")
    d = f.groupBy("fold").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    s = tk.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_terms"),
    )
    return (
        d.join(s, "fold", "left")
        .select(
            F.col("fold").cast("long").alias("fold"),
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            F.expr(
                "CASE WHEN COALESCE(n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(round(1e6 * n_terms / n_tokens) AS BIGINT) END"
            ).alias("ttr_q6"),
        )
        .orderBy("fold")
    )


@register(
    "relevant_rank_histogram",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + f""",
rel AS (SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup'),
rk AS (SELECT agg.doc_id, row_number() OVER (ORDER BY agg.score_q6 DESC, agg.doc_id ASC) AS rnk,
              CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
       FROM agg LEFT JOIN rel USING (doc_id)),
bd AS (SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS rank_band, is_rel FROM rk)
SELECT rank_band, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_rel) AS BIGINT) AS n_rel,
       CAST((1000000 * sum(is_rel)) // count(*) AS BIGINT) AS rel_share_q6
FROM bd GROUP BY rank_band ORDER BY rank_band""",
)
def relevant_rank_histogram(spark, sf_dir):
    """WHERE the relevant documents rank: the 'dup'-labeled docs'
    positions in the full BM25 ordering, log2-banded — the raw
    material of a recall@k curve (band b holding relevants means
    k must reach 2^(b+1) to fetch them; score_relevance_calibration
    reads the same labels against score MAGNITUDE, this reads them
    against RANK, which is what a page-size decision consumes).

    Determinism: ranks from the quantized-score ordering with doc_id
    tiebreaks; exact counts.

    Scale shape: the ranking window is match-set-bounded (the
    ranking_auc shape); band rollup ≤ log2(match set) rows."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
        .withColumn("flag", F.lit(1))
    )
    rk = (
        agg.join(rel, "doc_id", "left")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
            ),
        )
        .select(
            F.expr("CAST(length(bin(rnk)) - 1 AS BIGINT)").alias("rank_band"),
            F.coalesce("flag", F.lit(0)).alias("is_rel"),
        )
    )
    return (
        rk.groupBy("rank_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_rel").cast("long").alias("n_rel"),
        )
        .select(
            "rank_band",
            "n_docs",
            "n_rel",
            F.expr(
                "CAST((1000000 * n_rel) div n_docs AS BIGINT)"
            ).alias("rel_share_q6"),
        )
        .orderBy("rank_band")
    )


# the four disjoint md5 hex coordinates the pipeline routes on
_HASH_COORDS = [("shard_1_4", 1), ("split_5_8", 5), ("sample_9_12", 9), ("fold_13_16", 13)]


@register(
    "hash_coordinate_uniformity",
    "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS coordinate, n_docs, max_bucket,
       CAST(round(1000000 * x2) AS BIGINT) AS chi2_q6
FROM (
  SELECT CAST(sum(o) AS BIGINT) AS n_docs, CAST(max(o) AS BIGINT) AS max_bucket,
         sum((CAST(o AS DOUBLE) - tt.t / 16) * (CAST(o AS DOUBLE) - tt.t / 16)
             / (tt.t / 16)) AS x2
  FROM (SELECT substr(md5(CAST(doc_id AS VARCHAR)), {pos}, 1) AS b,
               CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY b) per,
       (SELECT CAST(count(*) AS DOUBLE) AS t FROM documents) tt
  GROUP BY tt.t
)"""
        for name, pos in _HASH_COORDS
    )
    + "\nORDER BY coordinate",
)
def hash_coordinate_uniformity(spark, sf_dir):
    """Trust-but-verify for the hash-coordinate system: each of the
    four disjoint md5 hex ranges the pipeline routes on (shard 1-4,
    split 5-8, sample 9-12, fold 13-16) is bucketed by its leading hex
    character and tested against uniform with a 16-cell chi² — the
    audit that the shard/split/sample/fold machinery really behaves as
    four independent fair 16-way dice on THIS id population (a skewed
    coordinate silently unbalances everything built on it; the
    coordinate-disjointness test in the session-32 suite greps the
    SQL, this one measures the data). chi² ≫ 25 (df=15) flags a bad
    die. Observed-bucket cells only (the significant_terms_chi2
    convention — an UNOBSERVED hex bucket, possible only on tiny
    populations, omits its e-term on both engines identically).

    Determinism: bucket counts exact; the chi² is one shared float
    expression with e = n/16 (the significant_terms_chi2
    cast-at-first-multiply rule).

    Scale shape: four map-side 16-group aggs, one row each."""
    arms = []
    for name, pos in _HASH_COORDS:
        per = (
            _docs(spark, sf_dir)
            .groupBy(
                F.expr(
                    f"substring(md5(cast(doc_id as string)), {pos}, 1)"
                ).alias("b")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("o"))
        )
        tot = per.agg(F.sum("o").cast("long").alias("n"))
        arms.append(
            per.crossJoin(F.broadcast(tot))
            .agg(
                F.max("n").cast("long").alias("n_docs"),
                F.max("o").cast("long").alias("max_bucket"),
                F.sum(
                    F.expr(
                        "(CAST(o AS DOUBLE) - CAST(n AS DOUBLE) / 16)"
                        " * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) / 16)"
                        " / (CAST(n AS DOUBLE) / 16)"
                    )
                ).alias("x2"),
            )
            .select(
                F.lit(name).alias("coordinate"),
                "n_docs",
                "max_bucket",
                F.expr("CAST(round(1000000 * x2) AS BIGINT)").alias("chi2_q6"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("coordinate")


# ---------------------------------------------------------------------------
# session 169 — join-order costs, dedup centroid shift, peak concentration
# ---------------------------------------------------------------------------


def _jo_edge(lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""(SELECT CAST(round(
      CAST((SELECT count(*) FROM {lt}) AS DOUBLE)
      * CAST((SELECT count(*) FROM {rt}) AS DOUBLE)
      / greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                 (SELECT count(DISTINCT {rk}) FROM {rt}), 1)) AS BIGINT))"""


@register(
    "join_order_cost_compare",
    f"""WITH est AS (
  SELECT {_jo_edge("lineitem", "l_orderkey", "orders", "o_orderkey")} AS li_o,
         {_jo_edge("orders", "o_custkey", "customer", "c_custkey")} AS o_c)
SELECT 'lineitem_orders_first' AS plan, est.li_o AS intermediate_rows
FROM est
UNION ALL
SELECT 'orders_customer_first', est.o_c FROM est
ORDER BY plan""",
)
def join_order_cost_compare(spark, sf_dir):
    """The join-ORDER decision the size estimates exist for: for the
    3-table chain lineitem⋈orders⋈customer, the System-R estimated
    intermediate size of each left-deep plan's FIRST join —
    (li⋈o) first versus (o⋈c) first — the smaller intermediate is the
    plan a cost-based optimizer picks (join_size_estimates audits the
    per-edge estimates against truth; join_histogram_estimate deepens
    one edge; THIS is the comparison those numbers feed). On TPC-H
    shapes (o⋈c) first wins by the lineitem fan-out — the table makes
    that visible as data, not folklore.

    Determinism: the estimate is the shared double
    product-then-divide over exact counts (the join_size_estimates
    rule).

    Scale shape: count/ndv aggs per table only; nothing joins."""
    def edge(lt, lk, rt, rk):
        l = spark.read.parquet(f"{sf_dir}/{lt}.parquet").select(
            F.col(lk).alias("k")
        )
        r = spark.read.parquet(f"{sf_dir}/{rt}.parquet").select(
            F.col(rk).alias("k")
        )
        ls = l.agg(
            F.count(F.lit(1)).cast("long").alias("nl"),
            F.countDistinct("k").cast("long").alias("dl"),
        )
        rs = r.agg(
            F.count(F.lit(1)).cast("long").alias("nr"),
            F.countDistinct("k").cast("long").alias("dr"),
        )
        return ls.crossJoin(rs).select(
            F.expr(
                "CAST(round(CAST(nl AS DOUBLE) * CAST(nr AS DOUBLE)"
                " / greatest(dl, dr, 1)) AS BIGINT)"
            ).alias("est")
        )

    lio = edge("lineitem", "l_orderkey", "orders", "o_orderkey").select(
        F.lit("lineitem_orders_first").alias("plan"),
        F.col("est").alias("intermediate_rows"),
    )
    oc = edge("orders", "o_custkey", "customer", "c_custkey").select(
        F.lit("orders_customer_first").alias("plan"),
        F.col("est").alias("intermediate_rows"),
    )
    return lio.unionByName(oc).orderBy("plan")


@register(
    "semdedup_centroid_shift",
    _SEMDEDUP_SQL[: _SEMDEDUP_SQL.rindex("SELECT cid")]
    + """,
keep AS (SELECT mem.vec_id, mem.u FROM mem
         WHERE mem.vec_id NOT IN (SELECT dropped FROM dup)),
cf AS (SELECT i, CAST(sum(CAST(round(u[i] * 1000000) AS BIGINT)) AS BIGINT) AS s
       FROM mem, (SELECT unnest(generate_series(1, 64)) AS i)
       GROUP BY i),
ck AS (SELECT i, CAST(sum(CAST(round(u[i] * 1000000) AS BIGINT)) AS BIGINT) AS s
       FROM keep, (SELECT unnest(generate_series(1, 64)) AS i) GROUP BY i),
j AS (SELECT CAST(sum(cf.s * ck.s) AS BIGINT) AS dp,
             CAST(sum(cf.s * cf.s) AS BIGINT) AS nf,
             CAST(sum(ck.s * ck.s) AS BIGINT) AS nk
      FROM cf JOIN ck USING (i)),
cnt AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_total,
               (SELECT CAST(count(*) AS BIGINT) FROM keep) AS n_kept)
SELECT cnt.n_total, cnt.n_kept,
       CASE WHEN j.nf = 0 OR j.nk = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (j.dp / (sqrt(CAST(j.nf AS DOUBLE))
                 * sqrt(CAST(j.nk AS DOUBLE))))) AS BIGINT)
       END AS centroid_cos_q6
FROM cnt, j""",
)
def semdedup_centroid_shift(spark, sf_dir):
    """Does semantic dedup MOVE the corpus? Cosine between the unit-sum
    centroid of all clustered vectors and the centroid of semdedup's
    SURVIVORS — dedup_df_shift_topk names what dedup deletes from the
    LEXICAL statistics; this is the embedding-space analogue (cos ≈ 1e6
    = dropping duplicates didn't tilt the semantic center, the safe
    reading; a visible shift means duplicates cluster in one region
    and their removal re-weights the space — exactly what a
    temperature/mixture plan computed pre-dedup would get wrong).

    Determinism: centroids are exact q6-integer component sums of unit
    vectors (cosine scale-invariance makes sum == mean — the
    _kmeans_cent trick); one guarded split-sqrt division. dp ≤
    64·(1e6·n)² needs n ≲ 1e5 per the source_centroid_matrix envelope;
    beyond that, components floor to q3 first.

    Scale shape: the drop set filters the memoized `_incell_pair_cos`
    table (semdedup's own bounded pair join); both centroids are 64-row
    aggs; the cosine is a 64-row join."""
    members, cent, assign = _trained_ivf(spark, sf_dir)
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, z) -> acc + z)"
    un = (
        members.withColumn("n", F.sqrt(F.expr(dot.format(a="v", b="v"))))
        .select("vec_id", F.expr("transform(v, x -> x / n)").alias("u"))
    )
    mem = un.join(assign, "vec_id").localCheckpoint()
    dup = (
        _incell_pair_cos(spark, sf_dir)
        .where(F.col("cosn_q6") >= F.lit(_SEMDEDUP_T))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    keep = mem.join(dup, "vec_id", "anti")

    def centroid(df):
        return (
            df.select(
                F.posexplode(
                    F.expr("transform(u, x -> CAST(round(x * 1000000) AS BIGINT))")
                ).alias("i0", "cq")
            )
            .groupBy("i0")
            .agg(F.sum("cq").cast("long").alias("s"))
        )

    cf = centroid(mem)
    ck = centroid(keep)
    j = (
        cf.select(F.col("i0"), F.col("s").alias("sf"))
        .join(ck.select(F.col("i0"), F.col("s").alias("sk")), "i0")
        .agg(
            F.sum(F.expr("sf * sk")).cast("long").alias("dp"),
            F.sum(F.expr("sf * sf")).cast("long").alias("nf"),
            F.sum(F.expr("sk * sk")).cast("long").alias("nk"),
        )
    )
    cnt = mem.agg(F.count(F.lit(1)).cast("long").alias("n_total")).crossJoin(
        keep.agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    return cnt.crossJoin(j).select(
        "n_total",
        "n_kept",
        F.expr(
            "CASE WHEN nf = 0 OR nk = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (dp / (sqrt(CAST(nf AS DOUBLE))"
            " * sqrt(CAST(nk AS DOUBLE))))) AS BIGINT) END"
        ).alias("centroid_cos_q6"),
    )


@register(
    "peak_day_concentration",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, day_num ASC) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS nd,
             CAST(sum(n) OVER () AS BIGINT) AS tot
      FROM d),
k AS (SELECT nd, tot, CAST((nd + 9) // 10 AS BIGINT) AS k FROM r LIMIT 1),
top AS (SELECT CAST(COALESCE(sum(r.n), 0) AS BIGINT) AS top_events
        FROM r, k WHERE r.rn <= k.k)
SELECT k.nd AS n_days, k.k AS n_peak_days, top.top_events,
       CAST(k.tot AS BIGINT) AS n_events,
       CAST((1000000 * top.top_events) // k.tot AS BIGINT) AS peak_share_q6
FROM k, top""",
)
def peak_day_concentration(spark, sf_dir):
    """Capacity-planning one-number: the share of ALL events carried by
    the busiest ⌈10%⌉ of observed days — the peak-to-base ratio a
    provisioning decision actually uses (events_dispersion_index and
    daily_hurst_estimate characterize burstiness statistically; this
    is the operational translation: 'a tenth of the days carry X% of
    the load, size for it'). Exact integer ceil (the session-53 rule).

    Determinism: day counts exact; the top-k cut orders by
    (n desc, day asc).

    Scale shape: one day agg; ranking windows run over
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
    stats = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("tot"),
    ).select("nd", "tot", F.expr("CAST((nd + 9) div 10 AS BIGINT)").alias("k"))
    rk = d.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("day_num")))
    )
    top = (
        rk.crossJoin(F.broadcast(stats))
        .where(F.col("rn") <= F.col("k"))
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("top_events"))
    )
    return (
        stats.crossJoin(top)
        .select(
            F.col("nd").alias("n_days"),
            F.col("k").alias("n_peak_days"),
            "top_events",
            F.col("tot").alias("n_events"),
            F.expr(
                "CAST((1000000 * top_events) div tot AS BIGINT)"
            ).alias("peak_share_q6"),
        )
    )


# ---------------------------------------------------------------------------
# session 170 — PRF agreement, Wilson CI, cross-modal dup consistency
# ---------------------------------------------------------------------------


@register(
    "prf_method_overlap",
    _bm25_agg_ctes(_RM3_TERMS)
    + f""",
fb AS (SELECT doc_id, score_q6 FROM agg
       ORDER BY score_q6 DESC, doc_id ASC LIMIT 10),
idf AS (
  SELECT term, CAST(round(1000000 * ln((SELECT n_docs FROM st) / df)) AS BIGINT) AS idf_q6
  FROM dfs),
roc AS (SELECT term FROM (
  SELECT tf.term,
         row_number() OVER (ORDER BY sum(tf.tf * idf.idf_q6) DESC, tf.term ASC) AS rank
  FROM tf JOIN fb USING (doc_id) JOIN idf USING (term)
  WHERE tf.term NOT IN ({", ".join(f"'{t}'" for t in _RM3_TERMS)})
  GROUP BY tf.term) WHERE rank <= 8),
stot AS (SELECT CAST(COALESCE(sum(score_q6), 0) AS BIGINT) AS s FROM fb),
ftf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM ({SQL_TOKS}) WHERE doc_id IN (SELECT doc_id FROM fb)
        GROUP BY doc_id, term),
fdl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM ftf GROUP BY doc_id),
w AS (SELECT ftf.term, {_RM3_W} AS wq6
      FROM ftf JOIN fb USING (doc_id) JOIN fdl USING (doc_id) CROSS JOIN stot
      WHERE ftf.term NOT IN ({", ".join(f"'{t}'" for t in _RM3_TERMS)})),
rm3 AS (SELECT term FROM (
  SELECT term, row_number() OVER (ORDER BY sum(wq6) DESC, term ASC) AS rank
  FROM w GROUP BY term) WHERE rank <= 8)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM roc) AS n_rocchio,
       (SELECT CAST(count(*) AS BIGINT) FROM rm3) AS n_rm3,
       (SELECT CAST(count(*) AS BIGINT) FROM roc JOIN rm3 USING (term)) AS n_overlap""",
)
def prf_method_overlap(spark, sf_dir):
    """Do the two PRF models agree on what the query is ABOUT? Top-8
    expansion terms from Rocchio (vector-space tf·idf) and RM3
    (relevance-model P(w|R)) over the SAME query and the SAME top-10
    feedback page, with the overlap count — the model-agreement probe
    in bm25_pl2_overlap's mold, applied to query expansion: high
    overlap means the expansion is robust to the PRF model choice; low
    overlap means expansion quality is a modeling decision, not a
    corpus fact, and rank_eval should arbitrate before either ships.

    Determinism: both legs rank over exact BIGINT weights with term
    tiebreaks (the parent ops' rules verbatim).

    Scale shape: one shared match set + feedback page; both legs'
    aggs are feedback-page-bounded; the overlap is an 8×8 join."""
    agg = _bm25_match_set(spark, sf_dir, _RM3_TERMS).localCheckpoint()
    fb = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .localCheckpoint()
    )
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    nd = tf.select("doc_id").distinct().count()
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfs.select(
        "term",
        F.expr(
            f"CAST(round(1000000 * ln({nd} / df)) AS BIGINT)"
        ).alias("idf_q6"),
    )
    excl = [t for t in _RM3_TERMS]
    roc = (
        tf.join(fb.select("doc_id"), "doc_id")
        .join(idf, "term")
        .where(~F.col("term").isin(excl))
        .groupBy("term")
        .agg(F.sum(F.expr("tf * idf_q6")).alias("wq"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("wq"), F.asc("term"))),
        )
        .where(F.col("rank") <= 8)
        .select("term")
    )
    stot = fb.agg(
        F.coalesce(F.sum("score_q6"), F.lit(0)).cast("long").alias("s")
    )
    ftf = (
        toks.join(fb.select("doc_id"), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    fdl = ftf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    w = (
        ftf.join(fb, "doc_id")
        .join(fdl, "doc_id")
        .crossJoin(F.broadcast(stot))
        .where(~F.col("term").isin(excl))
        .select("term", F.expr(_RM3_W).alias("wq6"))
    )
    rm3 = (
        w.groupBy("term")
        .agg(F.sum("wq6").alias("wq"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("wq"), F.asc("term"))),
        )
        .where(F.col("rank") <= 8)
        .select("term")
    )
    nroc = roc.agg(F.count(F.lit(1)).cast("long").alias("n_rocchio"))
    nrm = rm3.agg(F.count(F.lit(1)).cast("long").alias("n_rm3"))
    nov = roc.join(rm3, "term").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    return nroc.crossJoin(nrm).crossJoin(nov)


# Wilson interval at z=1.96: center (p + z²/2n)/(1+z²/n), half-width
# z·sqrt(p(1−p)/n + z²/4n²)/(1+z²/n); z² folded as 3.8416e0
_WILSON_Z2 = "3.8416e0"


def _wilson(bound: str) -> str:
    sign = "+" if bound == "hi" else "-"
    return (
        f"CAST(round(1000000 * (((p + {_WILSON_Z2} / (2 * n))"
        f" {sign} 1.96e0 * sqrt(p * (1 - p) / n + {_WILSON_Z2} / (4 * n * n)))"
        f" / (1 + {_WILSON_Z2} / n))) AS BIGINT)"
    )


@register(
    "activation_wilson_ci",
    f"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
su AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t0
       FROM e WHERE event_type = 'signup' GROUP BY user_id),
act AS (
  SELECT su.user_id,
         max(CASE WHEN e.event_type = 'view'
                   AND e.us >= su.t0 AND e.us < su.t0 + {_ACT_DAY_US}
              THEN 1 ELSE 0 END) AS activated
  FROM su JOIN e ON e.user_id = su.user_id GROUP BY su.user_id),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(COALESCE(sum(activated), 0) AS BIGINT) AS n_activated
      FROM act),
p AS (SELECT n_users, n_activated,
             CAST(n_users AS DOUBLE) AS n,
             CAST(n_activated AS DOUBLE) / n_users AS p
      FROM s WHERE n_users > 0)
SELECT n_users, n_activated,
       CAST((1000000 * n_activated) // n_users AS BIGINT) AS rate_q6,
       {_wilson("lo")} AS wilson_lo_q6,
       {_wilson("hi")} AS wilson_hi_q6
FROM p""",
)
def activation_wilson_ci(spark, sf_dir):
    """The activation rate WITH its uncertainty: the 24-hour
    signup→view rate (signup_activation_rates' first leg) wrapped in a
    95% Wilson score interval — the one-sample inference that says
    whether this month's 62% and last month's 58% are even
    distinguishable before anyone celebrates (ab_significance compares
    two arms; Wilson bounds ONE observed proportion, and unlike the
    normal interval it stays inside [0,1] at small n — why it's the
    standard for rate dashboards).

    Determinism: z²=3.8416 and z=1.96 fold as e-notation literals; the
    whole interval is ONE shared float expression per bound over two
    exact integers.

    Scale shape: the signup/flag aggs ride one user exchange (the
    parent op's plan); the CI arithmetic is a 1-row expression."""
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
            ).alias("activated")
        )
    )
    s = act.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.coalesce(F.sum("activated"), F.lit(0)).cast("long").alias("n_activated"),
    )
    p = s.where(F.col("n_users") > 0).select(
        "n_users",
        "n_activated",
        F.expr("CAST(n_users AS DOUBLE)").alias("n"),
        F.expr("CAST(n_activated AS DOUBLE) / n_users").alias("p"),
    )
    return p.select(
        "n_users",
        "n_activated",
        F.expr("CAST((1000000 * n_activated) div n_users AS BIGINT)").alias(
            "rate_q6"
        ),
        F.expr(_wilson("lo")).alias("wilson_lo_q6"),
        F.expr(_wilson("hi")).alias("wilson_hi_q6"),
    )


@register(
    "text_embedding_dup_consistency",
    """WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
g AS (SELECT hh FROM h GROUP BY hh HAVING count(*) > 1),
pr AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM h a JOIN g ON g.hh = a.hh
  JOIN h b ON b.hh = a.hh AND a.doc_id < b.doc_id),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
un AS (SELECT vec_id, list_transform(v, x -> x / n) AS u
       FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e)),
pc AS (
  SELECT CAST(round(1000000 * list_dot_product(ua.u, ub.u)) AS BIGINT) AS cos_q6
  FROM pr JOIN un ua ON ua.vec_id = pr.id_a
          JOIN un ub ON ub.vec_id = pr.id_b)
SELECT CAST(count(*) AS BIGINT) AS n_text_dup_pairs,
       CAST(COALESCE(sum(CASE WHEN cos_q6 >= 999000 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_emb_consistent,
       CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * sum(CASE WHEN cos_q6 >= 999000 THEN 1 ELSE 0 END))
                 // count(*) AS BIGINT)
       END AS consistency_q6
FROM pc""",
)
def text_embedding_dup_consistency(spark, sf_dir):
    """Cross-modal integrity: documents with IDENTICAL text should
    carry (near-)identical embeddings if the embeddings were really
    computed from that text — exact-dup pairs joined to their vectors,
    counted at cosine ≥ 0.999. On the sandbox the embeddings are
    synthesized independently of the text, so consistency ≈ 0 is the
    HONEST finding — and exactly the report this op exists to produce
    in production, where a low number means the embedding column is
    stale, mis-keyed, or from a different model than claimed (the
    doc_id↔vec_id alignment every hybrid op trusts, audited).

    Determinism: pair set from the md5 groupBy; the shared
    normalize-once q6 cosine; exact conditional counts.

    Scale shape: pairs are dup-group-bounded (the dedup_exact
    shuffle); the vector join is pair-keyed; one counter row."""
    h = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("hh"))
    g = (
        h.groupBy("hh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("hh")
    )
    hh = h.join(g, "hh")
    a = hh.select("hh", F.col("doc_id").alias("id_a"))
    b = hh.select(F.col("hh").alias("hh_b"), F.col("doc_id").alias("id_b"))
    pr = a.join(
        b, (F.col("hh") == F.col("hh_b")) & (F.col("id_a") < F.col("id_b"))
    ).select("id_a", "id_b")
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, z) -> acc + z)"
    un = e.withColumn("nrm", F.sqrt(F.expr(dot.format(a="v", b="v")))).select(
        "vec_id", F.expr("transform(v, x -> x / nrm)").alias("u")
    )
    pc = (
        pr.join(un.select(F.col("vec_id").alias("id_a"), F.col("u").alias("ua")), "id_a")
        .join(un.select(F.col("vec_id").alias("id_b"), F.col("u").alias("ub")), "id_b")
        .select(
            F.expr(
                f"CAST(round(1000000 * ({dot.format(a='ua', b='ub')})) AS BIGINT)"
            ).alias("cos_q6")
        )
    )
    return pc.agg(
        F.count(F.lit(1)).cast("long").alias("n_text_dup_pairs"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN cos_q6 >= 999000 THEN 1 ELSE 0 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_emb_consistent"),
    ).select(
        "n_text_dup_pairs",
        "n_emb_consistent",
        F.expr(
            "CASE WHEN n_text_dup_pairs = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((1000000 * n_emb_consistent) div n_text_dup_pairs"
            " AS BIGINT) END"
        ).alias("consistency_q6"),
    )


# ---------------------------------------------------------------------------
# session 171 — midnight sessions, idle hours, lang-ID margin
# ---------------------------------------------------------------------------

_MCS_GAP_US = 1_800_000_000  # 30-minute session gap


@register(
    "midnight_crossing_sessions",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
lg AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                   > {_MCS_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM e),
sid AS (
  SELECT user_id, us,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM lg),
s AS (
  SELECT user_id, sess,
         CAST(min(us) // {_US_PER_DAY} AS BIGINT) AS d0,
         CAST(max(us) // {_US_PER_DAY} AS BIGINT) AS d1
  FROM sid GROUP BY user_id, sess)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN d1 > d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
       CAST((1000000 * sum(CASE WHEN d1 > d0 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS crossing_q6
FROM s""",
)
def midnight_crossing_sessions(spark, sf_dir):
    """How many sessions straddle a calendar-day boundary — the share
    of user journeys every day-bucketed metric (daily_ctr, DAU, the
    day spines) silently splits in two. A high crossing share says the
    'daily' grain is fighting real behavior (night-owl populations,
    cross-timezone users) and session-grain metrics should anchor on
    SESSION START day instead (night_owl_census counts the people;
    this counts the measurement damage). 30-minute gap sessionization,
    the session family's shared rule.

    Determinism: integer µs/day arithmetic; equal-timestamp events
    order by event_id in the lag.

    Scale shape: the standard ONE-user-exchange sessionizer (lag +
    running sum + session agg all share the user_id partition); one
    counter row."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lg = e.select(
        "user_id",
        "us",
        F.expr(
            f"CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)"
            f" > {_MCS_GAP_US} OR lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)"
            " IS NULL THEN 1 ELSE 0 END"
        ).alias("is_start"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sid = lg.select(
        "user_id", "us", F.sum("is_start").over(ws).alias("sess")
    )
    s = sid.groupBy("user_id", "sess").agg(
        F.expr(f"CAST(min(us) div {_US_PER_DAY} AS BIGINT)").alias("d0"),
        F.expr(f"CAST(max(us) div {_US_PER_DAY} AS BIGINT)").alias("d1"),
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.expr("CASE WHEN d1 > d0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_crossing"),
    ).select(
        "n_sessions",
        "n_crossing",
        F.expr(
            "CAST((1000000 * n_crossing) div n_sessions AS BIGINT)"
        ).alias("crossing_q6"),
    )


@register(
    "idle_hours_census",
    """WITH h AS (
  SELECT DISTINCT epoch_us(ts) // 3600000000 AS hour_num FROM events),
b AS (SELECT CAST(min(hour_num) AS BIGINT) AS lo, CAST(max(hour_num) AS BIGINT) AS hi FROM h),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS hour_num FROM b),
f AS (SELECT spine.hour_num,
             CASE WHEN h.hour_num IS NULL THEN 1 ELSE 0 END AS idle
      FROM spine LEFT JOIN h USING (hour_num)),
isl AS (
  SELECT idle, hour_num - row_number() OVER (PARTITION BY idle ORDER BY hour_num)
           AS grp
  FROM f),
runs AS (SELECT CAST(count(*) AS BIGINT) AS len
         FROM isl WHERE idle = 1 GROUP BY grp)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_hours_span,
       (SELECT CAST(COALESCE(sum(CASE WHEN idle = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM f) AS n_idle_hours,
       (SELECT CAST(count(*) AS BIGINT) FROM runs) AS n_outages,
       (SELECT CAST(COALESCE(max(len), 0) AS BIGINT) FROM runs) AS longest_outage_hours""",
)
def idle_hours_census(spark, sf_dir):
    """Silence detector: hours inside the observed span with ZERO
    events, their count, and the longest consecutive outage — the
    failure mode error_rate_daily cannot see (an ingest pipeline that
    dies produces no errors, just silence; the zero-filled day spine
    shows n=0 days, this works at the hour grain and measures STREAK
    length via gaps-and-islands, the session-139 trick on the time
    axis itself).

    Determinism: pure integer hour arithmetic.

    Scale shape: distinct observed hours collapse map-side; spine,
    islands, and runs are calendar-bounded."""
    h = (
        _events(spark, sf_dir)
        .select(
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias(
                "hour_num"
            )
        )
        .distinct()
    )
    b = h.agg(
        F.min("hour_num").cast("long").alias("lo"),
        F.max("hour_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("hour_num"))
    f = spine.join(h.withColumn("seen", F.lit(1)), "hour_num", "left").select(
        "hour_num",
        F.expr("CASE WHEN seen IS NULL THEN 1 ELSE 0 END").alias("idle"),
    ).localCheckpoint()
    wi = Window.partitionBy("idle").orderBy("hour_num")
    isl = f.select(
        "idle", (F.col("hour_num") - F.row_number().over(wi)).alias("grp")
    )
    runs = (
        isl.where(F.col("idle") == 1)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
    )
    span = f.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours_span"),
        F.coalesce(F.sum("idle"), F.lit(0)).cast("long").alias("n_idle_hours"),
    )
    outs = runs.agg(
        F.count(F.lit(1)).cast("long").alias("n_outages"),
        F.coalesce(F.max("len"), F.lit(0)).cast("long").alias(
            "longest_outage_hours"
        ),
    )
    return span.crossJoin(outs)


@register(
    "lang_margin_histogram",
    f"""WITH t AS ({SQL_TOKS}),
c AS (SELECT doc_id,
             {", ".join(f"count(*) FILTER (term IN ({', '.join(repr(w) for w in ws)})) AS c_{lang}" for lang, ws in _LANG_PROFILES.items())}
      FROM t GROUP BY doc_id),
d AS (SELECT doc_id,
             strlen(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS non_ascii,
             strlen(text) AS n_bytes
      FROM documents),
j AS (SELECT d.doc_id, d.non_ascii, d.n_bytes,
             {", ".join(f"CAST(COALESCE(c.c_{lang}, 0) AS BIGINT) AS c_{lang}" for lang in _LANG_PROFILES)}
      FROM d LEFT JOIN c ON c.doc_id = d.doc_id),
lf AS ({" UNION ALL ".join(f"SELECT doc_id, non_ascii, n_bytes, '{lang}' AS lang, c_{lang} AS cnt FROM j" for lang in _LANG_PROFILES)}),
rk AS (SELECT doc_id, non_ascii, n_bytes, cnt,
              row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lang ASC) AS rn
       FROM lf),
m AS (SELECT a.doc_id,
             CASE WHEN a.non_ascii * 10 > a.n_bytes * 3 THEN -1
                  ELSE a.cnt - b.cnt END AS margin
      FROM rk a JOIN rk b ON b.doc_id = a.doc_id AND a.rn = 1 AND b.rn = 2),
bd AS (SELECT CASE WHEN margin = -1 THEN -1
                   WHEN margin = 0 THEN 0
                   WHEN margin <= 2 THEN 1
                   WHEN margin <= 5 THEN 2 ELSE 3 END AS margin_band
       FROM m)
SELECT CAST(margin_band AS BIGINT) AS margin_band,
       CAST(count(*) AS BIGINT) AS n_docs
FROM bd GROUP BY margin_band ORDER BY margin_band""",
)
def lang_margin_histogram(spark, sf_dir):
    """How CONFIDENT is the language-ID heuristic? Per doc, the margin
    between the winning and runner-up stopword-profile counts, banded
    (CJK route = −1, tie = 0, 1-2, 3-5, 6+) — the abstention curve the
    accuracy numbers (language_confusion_matrix, naive_bayes/
    cavnar-trenkle comparisons) hide: a margin-0 doc is a coin flip
    wearing a label, and the share of band 0/1 mass is how much of the
    corpus should route to a stronger model instead
    (ivf_assign_margin is the same diagnostic for the vector
    quantizer).

    Determinism: exact counters; the runner-up comes from a
    per-doc rank over the 4-language long form with the alphabetical
    tiebreak (the heuristic's own rule).

    Scale shape: one token agg + map-side byte counters; the per-doc
    window runs over exactly 4 rows per doc."""
    t = _toks(_docs(spark, sf_dir))
    aggs = [
        F.sum(F.when(F.col("term").isin(ws), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, ws in _LANG_PROFILES.items()
    ]
    c = t.groupBy("doc_id").agg(*aggs)
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.octet_length(F.regexp_replace("text", r"[\x00-\x7F]", "")).alias(
            "non_ascii"
        ),
        F.octet_length("text").alias("n_bytes"),
    )
    j = d.join(c, "doc_id", "left").select(
        "doc_id",
        "non_ascii",
        "n_bytes",
        *[
            F.coalesce(F.col(f"c_{lang}"), F.lit(0)).cast("long").alias(f"c_{lang}")
            for lang in _LANG_PROFILES
        ],
    )
    lf = j.select(
        "doc_id",
        "non_ascii",
        "n_bytes",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lang).alias("lang"), F.col(f"c_{lang}").alias("cnt")
                    )
                    for lang in _LANG_PROFILES
                ]
            )
        ).alias("x"),
    ).select(
        "doc_id",
        "non_ascii",
        "n_bytes",
        F.col("x.lang").alias("lang"),
        F.col("x.cnt").alias("cnt"),
    )
    wr = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("lang"))
    rk = lf.withColumn("rn", F.row_number().over(wr)).localCheckpoint()
    a = rk.where(F.col("rn") == 1).select(
        "doc_id", "non_ascii", "n_bytes", F.col("cnt").alias("c1")
    )
    b = rk.where(F.col("rn") == 2).select(
        F.col("doc_id").alias("doc_b"), F.col("cnt").alias("c2")
    )
    m = a.join(b, a["doc_id"] == b["doc_b"]).select(
        F.expr(
            "CASE WHEN non_ascii * 10 > n_bytes * 3 THEN -1 ELSE c1 - c2 END"
        ).alias("margin")
    )
    bd = m.select(
        F.expr(
            "CAST(CASE WHEN margin = -1 THEN -1 WHEN margin = 0 THEN 0"
            " WHEN margin <= 2 THEN 1 WHEN margin <= 5 THEN 2 ELSE 3 END"
            " AS BIGINT)"
        ).alias("margin_band")
    )
    return (
        bd.groupBy("margin_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("margin_band")
    )


# ---------------------------------------------------------------------------
# session 172 — text hygiene, digit runs, doc↔vector alignment
# ---------------------------------------------------------------------------

# (counter, literal-class regex) — delete-and-measure per class; literal
# codepoints only (the pii_scrub RE2∩Java rule). Tabs/newlines use the
# \t escape which both engines accept inside a character class.
_HYGIENE_CLASSES = [
    ("double_space", "  "),
    ("tab", "\t"),
    ("curly_quote", "[‘’“”]"),
    ("em_dash", "—"),
]


@register(
    "text_hygiene_census",
    f"""WITH t AS (SELECT source, text FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN text LIKE '  %' OR text LIKE '% ' OR text LIKE ' %'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_edge_ws,
       {", ".join(
           f"CAST(sum(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS n_{name}"
           for name, pat in _HYGIENE_CLASSES
       )}
FROM t GROUP BY source ORDER BY source""",
)
def text_hygiene_census(spark, sf_dir):
    """Typographic hygiene per source: leading/trailing-space docs,
    double spaces, tabs, curly quotes, em-dashes — the extraction-bug
    and provenance fingerprints (curly quotes mean a word-processor or
    proper typography pipeline; tabs and double spaces mean PDF/table
    extraction; placeholder_doc_census finds ABSENT bodies, this
    grades the present ones' plumbing). All-zero-ish on the synthetic
    corpus is expected — the property suite injects each class.

    Determinism: exact counts of literal-codepoint patterns; the edge
    whitespace test is three LIKE probes.

    Scale shape: map-side regex counters folded into one per-source
    agg."""
    t = _docs(spark, sf_dir).select("source", "text")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.expr(
                "CASE WHEN text LIKE '  %' OR text LIKE '% ' OR text LIKE ' %'"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_edge_ws"),
    ]
    for name, pat in _HYGIENE_CLASSES:
        aggs.append(
            F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)))
            .cast("long")
            .alias(f"n_{name}")
        )
    return t.groupBy("source").agg(*aggs).orderBy("source")


@register(
    "digit_run_histogram",
    r"""WITH r AS (
  SELECT unnest(regexp_extract_all(text, '[0-9]+')) AS run FROM documents)
SELECT CAST(least(length(run), 10) AS BIGINT) AS run_len,
       CAST(count(*) AS BIGINT) AS n_runs
FROM r GROUP BY run_len ORDER BY run_len""",
)
def digit_run_histogram(spark, sf_dir):
    """What the numbers in the text ARE: maximal digit-run lengths,
    histogrammed (1-2 = counts/quantities, 4 = years, 7-10+ = phone
    numbers/ids/hashes — clipped at 10) — the cheap provenance and
    PII-prior signal (pii_scrub_stats matches specific formats; this
    is the format-free prior that says which detectors are even worth
    running, and a heavy 8+ tail flags id-dump pages the quality
    filters score as 'text').

    Determinism: exact integer lengths of maximal runs (regex + both
    engines' greedy [0-9]+).

    Scale shape: map-side extract + explode, ≤10-row rollup."""
    r = _docs(spark, sf_dir).select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)
        ).alias("run")
    )
    return (
        r.select(
            F.expr("CAST(least(length(run), 10) AS BIGINT)").alias("run_len")
        )
        .groupBy("run_len")
        .agg(F.count(F.lit(1)).cast("long").alias("n_runs"))
        .orderBy("run_len")
    )


@register(
    "doc_vec_alignment_census",
    """WITH d AS (SELECT doc_id FROM documents),
v AS (SELECT vec_id FROM embeddings),
m AS (SELECT d.doc_id FROM d JOIN v ON v.vec_id = d.doc_id)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_vecs,
       (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_matched,
       (SELECT CAST(count(*) AS BIGINT) FROM d
        WHERE doc_id NOT IN (SELECT vec_id FROM v)) AS n_doc_only,
       (SELECT CAST(count(*) AS BIGINT) FROM v
        WHERE vec_id NOT IN (SELECT doc_id FROM d)) AS n_vec_only""",
)
def doc_vec_alignment_census(spark, sf_dir):
    """The doc_id↔vec_id alignment audit: how many documents have an
    embedding, how many vectors are orphaned — the fk_integrity_census
    of the MODAL join every hybrid/cross-modal op silently trusts
    (hybrid_rrf, mmr_rerank, norm_doclen_corr,
    text_embedding_dup_consistency all inner-join on this key; any
    doc_only mass means their results quietly exclude documents, and
    vec_only mass means stale vectors from deleted docs are still
    searchable). The first number to check when hybrid search 'loses'
    documents.

    Determinism: exact counts, semi/anti probes.

    Scale shape: two id-projection scans, one key join, two anti
    probes — all id-column-narrow."""
    d = _docs(spark, sf_dir).select("doc_id")
    v = _emb(spark, sf_dir).select("vec_id")
    m = d.join(v, d["doc_id"] == v["vec_id"])
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    nv = v.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    nm = m.agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    ndo = d.join(v, d["doc_id"] == v["vec_id"], "anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_doc_only")
    )
    nvo = v.join(d, v["vec_id"] == d["doc_id"], "anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_vec_only")
    )
    return nd.crossJoin(nv).crossJoin(nm).crossJoin(ndo).crossJoin(nvo)


# ---------------------------------------------------------------------------
# session 173 — activity migration, Simpson check, unsold inventory
# ---------------------------------------------------------------------------


@register(
    "activity_band_migration",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num FROM events),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM e),
u AS (
  SELECT e.user_id,
         CAST(sum(CASE WHEN e.day_num <= (b.lo + b.hi) // 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN e.day_num > (b.lo + b.hi) // 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS n2
  FROM e, b GROUP BY e.user_id),
m AS (
  SELECT CASE WHEN n1 = 0 THEN -1 ELSE CAST(length(bin(n1)) - 1 AS BIGINT) END AS band_first,
         CASE WHEN n2 = 0 THEN -1 ELSE CAST(length(bin(n2)) - 1 AS BIGINT) END AS band_second
  FROM u)
SELECT CAST(band_first AS BIGINT) AS band_first,
       CAST(band_second AS BIGINT) AS band_second,
       CAST(count(*) AS BIGINT) AS n_users
FROM m GROUP BY band_first, band_second ORDER BY band_first, band_second""",
)
def activity_band_migration(spark, sf_dir):
    """Engagement migration matrix: each user's log2 activity band in
    the FIRST calendar half of the data versus the SECOND (calendar
    midpoint split — the ab_cuped_adjustment rule; band −1 = inactive
    in that half) — the dynamics the static user_activity_histogram
    projects away: mass on the diagonal is stable habit, below it is
    decay, the (−1, b) column is acquisition and (b, −1) is churn in
    one table (churn_by_activity_band summarizes one slice of this).

    Determinism: pure integer day/count arithmetic.

    Scale shape: one user-keyed agg (both half-counters in one pass,
    1-row bounds broadcast); matrix rollup ≤ bands² rows."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias(
            "day_num"
        ),
    )
    b = e.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    u = (
        e.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN day_num <= (lo + hi) div 2 THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias("n1"),
            F.sum(
                F.expr("CASE WHEN day_num > (lo + hi) div 2 THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias("n2"),
        )
    )
    m = u.select(
        F.expr(
            "CASE WHEN n1 = 0 THEN -1 ELSE CAST(length(bin(n1)) - 1 AS BIGINT) END"
        ).alias("band_first"),
        F.expr(
            "CASE WHEN n2 = 0 THEN -1 ELSE CAST(length(bin(n2)) - 1 AS BIGINT) END"
        ).alias("band_second"),
    )
    return (
        m.groupBy("band_first", "band_second")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("band_first").cast("long").alias("band_first"),
            F.col("band_second").cast("long").alias("band_second"),
            "n_users",
        )
        .orderBy("band_first", "band_second")
    )


@register(
    "simpson_check_discount",
    f"""WITH t AS (
  SELECT p.p_brand,
         CAST(round(l.l_discount * 100) AS BIGINT) AS x,
         CAST(l.l_quantity AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM t),
gc AS (SELECT CAST({_PQC_CORR} AS BIGINT) AS corr_q6 FROM g),
pb AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
              CAST(sum(x * y) AS BIGINT) AS sxy
       FROM t GROUP BY p_brand),
bc AS (SELECT p_brand, CAST({_PQC_CORR} AS BIGINT) AS corr_q6 FROM pb),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_brands,
             CAST(sum(CASE WHEN corr_q6 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN corr_q6 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      FROM bc)
SELECT gc.corr_q6 AS global_corr_q6, s.n_brands, s.n_pos, s.n_neg,
       CAST(CASE WHEN (gc.corr_q6 > 0 AND 2 * s.n_neg > s.n_brands)
                  OR (gc.corr_q6 < 0 AND 2 * s.n_pos > s.n_brands)
            THEN 1 ELSE 0 END AS BIGINT) AS paradox_flag
FROM gc, s""",
)
def simpson_check_discount(spark, sf_dir):
    """Simpson's-paradox screen for the discount→quantity read: the
    GLOBAL Pearson correlation beside the per-brand sign census, with
    a flag when the aggregate sign contradicts the majority of
    within-brand signs — the one-table guard against acting on a
    pooled elasticity that brand mix manufactured
    (discount_quantity_corr reports the pooled number; this says
    whether it's trustworthy at the grain pricing decisions are made).
    On TPC-H's independent draws both levels sit near zero — flag 0,
    the honest null.

    Determinism: exact sufficient stats at both grains, the shared
    guarded split-sqrt expression, integer majority tests.

    Scale shape: ONE fact⋈dim pass feeds both the global and the
    per-brand stats (map-side combinable); the sign census runs over
    |brands| rows."""
    t = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_partkey",
            F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("x"),
            F.col("l_quantity").cast("long").alias("y"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/part.parquet").select(
                "p_partkey", "p_brand"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_brand", "x", "y")
        .localCheckpoint()
    )

    def stats(df, keys):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.expr("x * x")).cast("long").alias("sxx"),
            F.sum(F.expr("y * y")).cast("long").alias("syy"),
            F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        ) if keys else df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.expr("x * x")).cast("long").alias("sxx"),
            F.sum(F.expr("y * y")).cast("long").alias("syy"),
            F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        )

    gc = stats(t, []).select(
        F.expr(f"CAST({_PQC_CORR} AS BIGINT)").alias("global_corr_q6")
    )
    bc = stats(t, ["p_brand"]).select(
        F.expr(f"CAST({_PQC_CORR} AS BIGINT)").alias("corr_q6")
    )
    s = bc.agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum(F.expr("CASE WHEN corr_q6 > 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.expr("CASE WHEN corr_q6 < 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_neg"),
    )
    return gc.crossJoin(s).select(
        "global_corr_q6",
        "n_brands",
        "n_pos",
        "n_neg",
        F.expr(
            "CAST(CASE WHEN (global_corr_q6 > 0 AND 2 * n_neg > n_brands)"
            " OR (global_corr_q6 < 0 AND 2 * n_pos > n_brands)"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("paradox_flag"),
    )


@register(
    "unsold_inventory_value",
    """WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem),
u AS (SELECT p.p_partkey, CAST(round(p.p_retailprice * 100) AS BIGINT) AS cents
      FROM part p LEFT JOIN sold ON sold.l_partkey = p.p_partkey
      WHERE sold.l_partkey IS NULL),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                 AS catalog_cents
        FROM part)
SELECT tot.n_parts,
       (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_unsold,
       (SELECT CAST(COALESCE(sum(cents), 0) AS BIGINT) FROM u) AS unsold_cents,
       tot.catalog_cents,
       CAST((1000000 * (SELECT count(*) FROM u)) // tot.n_parts AS BIGINT)
         AS unsold_share_q6
FROM tot""",
)
def unsold_inventory_value(spark, sf_dir):
    """Dead-stock board: parts that never appear on a line item, with
    the retail value parked in them — part_sales_coverage counts the
    gap; this prices it (the number a catalog-pruning or promotion
    decision needs: 3% of parts unsold is noise if they're cheap,
    capital if they're the premium tier). Cents per row first.

    Determinism: exact counts/sums; anti-join via the LEFT-IS-NULL
    probe.

    Scale shape: one distinct partkey projection of the fact table,
    one anti probe against the dim, two scalar rollups."""
    sold = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
    )
    u = p.join(sold, p["p_partkey"] == sold["l_partkey"], "anti")
    tot = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("catalog_cents"),
    )
    uu = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_unsold"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("unsold_cents"),
    )
    return tot.crossJoin(uu).select(
        "n_parts",
        "n_unsold",
        "unsold_cents",
        "catalog_cents",
        F.expr(
            "CAST((1000000 * n_unsold) div n_parts AS BIGINT)"
        ).alias("unsold_share_q6"),
    )


# ---------------------------------------------------------------------------
# session 175 — business-calendar detector (plus tests/test_plan_quality.py)
# ---------------------------------------------------------------------------


@register(
    "zero_order_days_by_weekday",
    f"""WITH d AS (
  SELECT DISTINCT epoch_us(o_orderdate) // {_US_PER_DAY} AS day_num FROM orders),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num,
             CAST((spine.day_num + 3) % 7 AS BIGINT) AS dow,
             CASE WHEN d.day_num IS NULL THEN 1 ELSE 0 END AS zero
      FROM spine LEFT JOIN d USING (day_num))
SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(zero) AS BIGINT) AS n_zero_days,
       CAST((1000000 * sum(zero)) // count(*) AS BIGINT) AS zero_q6
FROM f GROUP BY dow ORDER BY dow""",
)
def zero_order_days_by_weekday(spark, sf_dir):
    """Business-calendar detector: calendar days with NO orders, split
    by weekday (0 = Monday, the (day+3)%7 rule) — a weekend-heavy zero
    column reveals a B2B order flow (and says weekday-naive forecasts
    will systematically overshoot Saturdays); uniformly scattered
    zeros are ingest gaps instead, the idle_hours_census reading at
    order grain. The distinction decides whether missing days get
    imputed as 'closed' or investigated as 'broken'.

    Determinism: pure integer day/dow arithmetic on the zero-filled
    spine.

    Scale shape: distinct order days collapse map-side; spine and the
    7-row rollup are calendar-bounded."""
    d = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.expr(
                f"unix_micros(cast(o_orderdate as timestamp)) div {_US_PER_DAY}"
            ).alias("day_num")
        )
        .distinct()
    )
    b = d.agg(
        F.min("day_num").cast("long").alias("lo"),
        F.max("day_num").cast("long").alias("hi"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d.withColumn("seen", F.lit(1)), "day_num", "left").select(
        F.expr("CAST((day_num + 3) % 7 AS BIGINT)").alias("dow"),
        F.expr("CASE WHEN seen IS NULL THEN 1 ELSE 0 END").alias("zero"),
    )
    return (
        f.groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("zero").cast("long").alias("n_zero_days"),
        )
        .select(
            "dow",
            "n_days",
            "n_zero_days",
            F.expr("CAST((1000000 * n_zero_days) div n_days AS BIGINT)").alias(
                "zero_q6"
            ),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# session 176 — KMV set algebra, customer lifespan, undiscounted share
# ---------------------------------------------------------------------------


@register(
    "kmv_union_estimate",
    f"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, user_id,
             ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 13))::UBIGINT
               / 4503599627370496.0 AS u
      FROM d),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM d) a
  JOIN (SELECT DISTINCT event_type FROM d) b ON a.event_type < b.event_type),
uh AS (
  SELECT p.type_a, p.type_b, h.user_id, min(h.u) AS u
  FROM pairs p JOIN h ON h.event_type IN (p.type_a, p.type_b)
  GROUP BY p.type_a, p.type_b, h.user_id),
r AS (SELECT type_a, type_b, u,
             row_number() OVER (PARTITION BY type_a, type_b ORDER BY u) AS rn
      FROM uh),
n AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_exact_union
      FROM uh GROUP BY type_a, type_b),
kk AS (SELECT type_a, type_b, u AS uk FROM r WHERE rn = {_KMV_K}),
ex AS (
  SELECT p.type_a, p.type_b,
         CAST(count(DISTINCT CASE WHEN ha.user_id IS NOT NULL
                                   AND hb.user_id IS NOT NULL
                              THEN ha.user_id END) AS BIGINT) AS n_exact_inter
  FROM pairs p
  LEFT JOIN d ha ON ha.event_type = p.type_a
  LEFT JOIN d hb ON hb.event_type = p.type_b AND hb.user_id = ha.user_id
  GROUP BY p.type_a, p.type_b)
SELECT n.type_a, n.type_b, n.n_exact_union,
       CAST(CASE WHEN kk.uk IS NULL THEN n.n_exact_union
            ELSE round({_KMV_K - 1} / kk.uk) END AS BIGINT) AS kmv_union_est,
       ex.n_exact_inter
FROM n LEFT JOIN kk ON kk.type_a = n.type_a AND kk.type_b = n.type_b
JOIN ex ON ex.type_a = n.type_a AND ex.type_b = n.type_b
ORDER BY n.type_a, n.type_b""",
)
def kmv_union_estimate(spark, sf_dir):
    """The set algebra KMV exists for: per event-type PAIR, the
    bottom-k estimate of the UNION audience beside the exact union and
    exact intersection — union of two KMV sketches is just the
    bottom-k of their merged values (no re-scan of raw data in
    production; here the estimate is audited against truth), and
    intersection follows by inclusion-exclusion — the operation HLL
    registers cannot do without large-error tricks
    (hll_source_intersection shows that family's strain;
    kmv_distinct_estimate calibrated the single-set case).
    Under-filled unions fall back to exact.

    Determinism: the shared 'kmv:' 52-bit uniforms; per-pair
    bottom-k via one window; exact counts.

    Scale shape: the pair spine is |types|²; per-pair unions are
    user-cardinality-bounded; at scale the merge runs on the k-row
    SKETCHES, never the raw sets (documented — the audit needs truth,
    production doesn't)."""
    d = _events(spark, sf_dir).select("event_type", "user_id").distinct().localCheckpoint()
    h = d.select(
        "event_type",
        "user_id",
        F.expr(
            "cast(conv(substring(md5('kmv:' || cast(user_id as string)), 1, 13), 16, 10) as bigint)"
            " / 4503599627370496e0"
        ).alias("u"),
    )
    types = d.select("event_type").distinct()
    a = types.select(F.col("event_type").alias("type_a"))
    b = types.select(F.col("event_type").alias("type_b"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    uh = (
        pairs.join(
            h,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "user_id")
        .agg(F.min("u").alias("u"))
        .localCheckpoint()
    )
    w = Window.partitionBy("type_a", "type_b").orderBy("u")
    kk = (
        uh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == _KMV_K)
        .select("type_a", "type_b", F.col("u").alias("uk"))
    )
    n = uh.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_union")
    )
    da = d.select(F.col("event_type").alias("type_a"), "user_id")
    db = d.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("uid_b")
    )
    ex = (
        pairs.join(da, "type_a")
        .join(
            db,
            (F.col("uid_b") == F.col("user_id"))
            & (db["type_b"] == pairs["type_b"]),
        )
        .groupBy(pairs["type_a"], pairs["type_b"])
        .agg(F.countDistinct("user_id").cast("long").alias("n_exact_inter"))
    )
    return (
        n.join(kk, ["type_a", "type_b"], "left")
        .join(ex, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_exact_union",
            F.expr(
                f"CAST(CASE WHEN uk IS NULL THEN n_exact_union"
                f" ELSE round({_KMV_K - 1} / uk) END AS BIGINT)"
            ).alias("kmv_union_est"),
            "n_exact_inter",
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "customer_lifespan_histogram",
    f"""WITH c AS (
  SELECT o_custkey,
         CAST(max(epoch_us(o_orderdate)) // {_US_PER_DAY}
              - min(epoch_us(o_orderdate)) // {_US_PER_DAY} AS BIGINT) AS span_days,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey),
bk AS (SELECT CASE WHEN span_days = 0 THEN 0
                   WHEN span_days <= 90 THEN 1
                   WHEN span_days <= 365 THEN 2
                   WHEN span_days <= 1095 THEN 3 ELSE 4 END AS span_band,
              n_orders
       FROM c)
SELECT CAST(span_band AS BIGINT) AS span_band,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(n_orders) AS BIGINT) AS n_orders
FROM bk GROUP BY span_band ORDER BY span_band""",
)
def customer_lifespan_histogram(spark, sf_dir):
    """Customer relationship lifespan: days between first and last
    order, banded (one-shot / ≤quarter / ≤year / ≤3y / longer) with
    the order volume each band carries — the purchasing-side twin of
    user_span_histogram's event-side lifespan (band 0 is the
    one-order-wonder population; where the volume column concentrates
    says whether revenue rides long relationships or churn-and-burn).

    Determinism: pure integer day arithmetic.

    Scale shape: one custkey agg (min/max/count on one exchange);
    5-band rollup."""
    c = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                f"CAST(max(unix_micros(cast(o_orderdate as timestamp))) div {_US_PER_DAY}"
                f" - min(unix_micros(cast(o_orderdate as timestamp))) div {_US_PER_DAY}"
                " AS BIGINT)"
            ).alias("span_days"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    bk = c.select(
        F.expr(
            "CAST(CASE WHEN span_days = 0 THEN 0 WHEN span_days <= 90 THEN 1"
            " WHEN span_days <= 365 THEN 2 WHEN span_days <= 1095 THEN 3"
            " ELSE 4 END AS BIGINT)"
        ).alias("span_band"),
        "n_orders",
    )
    return (
        bk.groupBy("span_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("span_band")
    )


@register(
    "undiscounted_revenue_share",
    f"""WITH t AS (
  SELECT {_LI_DISC_C} AS disc_c,
         CASE WHEN l_discount = 0 THEN 1 ELSE 0 END AS full_price
  FROM lineitem)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(full_price) AS BIGINT) AS n_full_price,
       CAST(sum(CASE WHEN full_price = 1 THEN disc_c ELSE 0 END) AS BIGINT)
         AS full_price_cents,
       CAST(sum(disc_c) AS BIGINT) AS total_cents,
       CAST((1000000 * sum(CASE WHEN full_price = 1 THEN disc_c ELSE 0 END))
            // sum(disc_c) AS BIGINT) AS full_price_share_q6
FROM t""",
)
def undiscounted_revenue_share(spark, sf_dir):
    """Pricing-lever exposure: the share of revenue earned at ZERO
    discount — the flip side of every discount-effect op
    (brand_promo_lift, discount bands, the Q6/Q19 windows all study
    the discounted flow; this one number says how much of the business
    never touches the lever at all, i.e. the ceiling on what discount
    optimization can possibly move). Cents per row first (the Q1
    rule); one integer division.

    Scale shape: one map-side-combined scan to a single row."""
    t = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr(_LI_DISC_C).alias("disc_c"),
        F.expr("CASE WHEN l_discount = 0 THEN 1 ELSE 0 END").alias("full_price"),
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("full_price").cast("long").alias("n_full_price"),
        F.sum(F.expr("CASE WHEN full_price = 1 THEN disc_c ELSE 0 END"))
        .cast("long")
        .alias("full_price_cents"),
        F.sum("disc_c").cast("long").alias("total_cents"),
    ).select(
        "n_items",
        "n_full_price",
        "full_price_cents",
        "total_cents",
        F.expr(
            "CAST((1000000 * full_price_cents) div total_cents AS BIGINT)"
        ).alias("full_price_share_q6"),
    )


# ---------------------------------------------------------------------------
# session 177 — doclen quantization, doc typicality, half-mass window
# ---------------------------------------------------------------------------

# keep the top 4 significant bits of dl (Lucene-style small-float length
# compression, house variant): q = (dl >> s) << s with s = bits(dl) − 4
_DLQ = (
    "CASE WHEN dl < 16 THEN dl"
    " ELSE (dl >> (length(bin(dl)) - 4)) << (length(bin(dl)) - 4) END"
)


@register(
    "doclen_quantization_error",
    f"""WITH dl0 AS ({SQL_DL}),
d AS (SELECT CAST(doc_len AS BIGINT) AS dl FROM dl0 WHERE doc_len > 0),
q AS (SELECT dl, CAST({_DLQ} AS BIGINT) AS dlq FROM d),
b AS (SELECT CAST(length(bin(dl)) - 1 AS BIGINT) AS len_band,
             dl, dl - dlq AS err
      FROM q)
SELECT len_band, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(err) AS BIGINT) AS sum_abs_err,
       CAST((1000000 * sum(err)) // sum(dl) AS BIGINT) AS rel_err_q6
FROM b GROUP BY len_band ORDER BY len_band""",
)
def doclen_quantization_error(spark, sf_dir):
    """What 1-byte length norms cost BM25: document lengths compressed
    to their top 4 significant bits (the Lucene small-float norm idea,
    house variant: floor-quantize below 16 bits of mantissa), with the
    absolute and relative error per log2 length band — Lucene pays this
    exact distortion in every score's length normalization and nobody
    notices below ~3%; THIS table says where on the length axis the
    distortion concentrates (always just under a power of two) and
    whether this corpus would care (sq8_quantization_error is the same
    audit for vector components; this is the doc-length leg the BM25
    family stands on).

    Determinism: pure integer bit arithmetic (quantization error is
    always ≥ 0 by floor construction).

    Scale shape: one doc-length agg (shared SQL_DL shape) then
    map-side bit ops into ≤64 band rows."""
    dl = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dl"))
        .where(F.col("dl") > 0)
    )
    q = dl.select("dl", F.expr(f"CAST({_DLQ} AS BIGINT)").alias("dlq"))
    b = q.select(
        F.expr("CAST(length(bin(dl)) - 1 AS BIGINT)").alias("len_band"),
        "dl",
        (F.col("dl") - F.col("dlq")).alias("err"),
    )
    return (
        b.groupBy("len_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("err").cast("long").alias("sum_abs_err"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
        .select(
            "len_band",
            "n_docs",
            "sum_abs_err",
            F.expr(
                "CAST((1000000 * sum_abs_err) div sum_dl AS BIGINT)"
            ).alias("rel_err_q6"),
        )
        .orderBy("len_band")
    )


@register(
    "doc_typicality_histogram",
    f"""WITH tf AS ({SQL_TF}),
cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
top AS (SELECT term FROM cf ORDER BY cf DESC, term ASC LIMIT 64),
per AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS n_tok,
         CAST(COALESCE(sum(CASE WHEN top.term IS NOT NULL THEN tf.tf END), 0)
              AS BIGINT) AS n_top
  FROM tf LEFT JOIN top ON top.term = tf.term
  GROUP BY tf.doc_id),
t AS (SELECT CAST((10 * n_top) // n_tok AS BIGINT) AS decile FROM per)
SELECT CAST(least(decile, 9) AS BIGINT) AS typicality_decile,
       CAST(count(*) AS BIGINT) AS n_docs
FROM t GROUP BY typicality_decile ORDER BY typicality_decile""",
)
def doc_typicality_histogram(spark, sf_dir):
    """How TYPICAL each document's vocabulary is: the share of its
    tokens drawn from the corpus's top-64 terms, deciled — the
    distribution behind every 'weird doc' intuition (decile 9 docs are
    pure common-word glue, decile 0 docs live in the vocabulary tail —
    jargon, other languages, or junk; vocab_coverage_curve reports the
    CORPUS-level top-k mass, this shows how unevenly that mass sits
    across documents, which is what a tail-doc review queue actually
    samples from).

    Determinism: exact integer tf sums; the top-64 cut breaks ties on
    term; decile = (10·n_top) div n_tok clamped at 9.

    Scale shape: cf is the standard vocab agg; the 64-row top set
    broadcasts into the tf LEFT probe (the vocab_coverage trick); one
    doc-keyed agg then a 10-row rollup."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    top = (
        cf.orderBy(F.desc("cf"), F.asc("term"))
        .limit(64)
        .select("term")
        .withColumn("is_top", F.lit(1))
    )
    per = (
        tf.join(F.broadcast(top), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tok"),
            F.coalesce(
                F.sum(F.when(F.col("is_top") == 1, F.col("tf"))), F.lit(0)
            )
            .cast("long")
            .alias("n_top"),
        )
    )
    t = per.select(
        F.expr("CAST(least((10 * n_top) div n_tok, 9) AS BIGINT)").alias(
            "typicality_decile"
        )
    )
    return (
        t.groupBy("typicality_decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("typicality_decile")
    )


@register(
    "half_mass_window",
    f"""WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day_num, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day_num),
b AS (SELECT CAST(min(day_num) AS BIGINT) AS lo, CAST(max(day_num) AS BIGINT) AS hi,
             CAST(sum(n) AS BIGINT) AS tot FROM d),
spine AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_num FROM b),
f AS (SELECT spine.day_num, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN d USING (day_num)),
c AS (SELECT day_num, n, CAST(sum(n) OVER (ORDER BY day_num
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM f),
w AS (
  SELECT j.day_num - i.day_num + 1 AS win_len,
         j.cum - i.cum + i.n AS mass
  FROM c i JOIN c j ON j.day_num >= i.day_num),
ok AS (SELECT win_len, mass FROM w, b WHERE 2 * mass >= b.tot),
best AS (SELECT win_len, mass FROM ok ORDER BY win_len ASC, mass DESC LIMIT 1)
SELECT (SELECT CAST(hi - lo + 1 AS BIGINT) FROM b) AS n_days_span,
       (SELECT CAST(tot AS BIGINT) FROM b) AS n_events,
       best.win_len AS half_mass_days, best.mass AS window_events,
       CAST((1000000 * best.win_len)
            // (SELECT hi - lo + 1 FROM b) AS BIGINT) AS window_share_q6
FROM best""",
)
def half_mass_window(spark, sf_dir):
    """The burst core: the SHORTEST contiguous day window holding at
    least half of all events — peak_day_concentration measures the
    top-days' share at fixed count; this inverts it (fixed mass,
    minimal span) and answers the capacity question directly: 'half
    our annual traffic happens inside N days'. A window_share near
    50% is a flat business; near 5% is a launch/seasonal spike
    economy.

    Determinism: integer cumulative sums over the zero-filled spine;
    the (win_len asc, mass desc) tiebreak pins the reported window.

    Scale shape: the day table is calendar-bounded, so the start×end
    theta join is days² on CALENDAR rows (≤ ~4M cells for a decade) —
    bounded by time, not data; everything upstream is one map-side
    day agg."""
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
        F.sum("n").cast("long").alias("tot"),
    )
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day_num"))
    f = spine.join(d, "day_num", "left").select(
        "day_num", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    ).localCheckpoint()
    wc = Window.orderBy("day_num").rowsBetween(Window.unboundedPreceding, 0)
    c = f.select("day_num", "n", F.sum("n").over(wc).cast("long").alias("cum"))
    i = c.select(
        F.col("day_num").alias("d_i"), F.col("n").alias("n_i"), F.col("cum").alias("cum_i")
    )
    j = c.select(F.col("day_num").alias("d_j"), F.col("cum").alias("cum_j"))
    w = i.join(j, F.col("d_j") >= F.col("d_i")).select(
        (F.col("d_j") - F.col("d_i") + 1).alias("win_len"),
        (F.col("cum_j") - F.col("cum_i") + F.col("n_i")).alias("mass"),
    )
    ok = w.crossJoin(F.broadcast(b)).where(F.expr("2 * mass >= tot"))
    best = ok.orderBy(F.asc("win_len"), F.desc("mass")).limit(1).select(
        "win_len", "mass"
    )
    return (
        b.crossJoin(best)
        .select(
            F.expr("CAST(hi - lo + 1 AS BIGINT)").alias("n_days_span"),
            F.col("tot").alias("n_events"),
            F.col("win_len").cast("long").alias("half_mass_days"),
            F.col("mass").cast("long").alias("window_events"),
            F.expr(
                "CAST((1000000 * win_len) div (hi - lo + 1) AS BIGINT)"
            ).alias("window_share_q6"),
        )
    )


# ---------------------------------------------------------------------------
# session 178 — attribution model compare, basket price spread
# ---------------------------------------------------------------------------


@register(
    "attribution_model_compare",
    """WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
lt AS (
  SELECT p.event_id, p.cents,
         COALESCE((SELECT e.event_type FROM events e
                   WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
                     AND epoch_us(e.ts) < p.us
                   ORDER BY epoch_us(e.ts) DESC, e.event_id DESC LIMIT 1),
                  'none') AS touch_type
  FROM p),
ft AS (
  SELECT p.event_id, p.cents,
         (SELECT e.event_type FROM events e
          WHERE e.user_id = p.user_id
          ORDER BY epoch_us(e.ts) ASC, e.event_id ASC LIMIT 1) AS touch_type
  FROM p),
fa AS (SELECT touch_type, CAST(count(*) AS BIGINT) AS ft_purchases,
              CAST(sum(cents) AS BIGINT) AS ft_cents
       FROM ft GROUP BY touch_type),
la AS (SELECT touch_type, CAST(count(*) AS BIGINT) AS lt_purchases,
              CAST(sum(cents) AS BIGINT) AS lt_cents
       FROM lt GROUP BY touch_type)
SELECT COALESCE(fa.touch_type, la.touch_type) AS touch_type,
       CAST(COALESCE(fa.ft_purchases, 0) AS BIGINT) AS ft_purchases,
       CAST(COALESCE(fa.ft_cents, 0) AS BIGINT) AS ft_cents,
       CAST(COALESCE(la.lt_purchases, 0) AS BIGINT) AS lt_purchases,
       CAST(COALESCE(la.lt_cents, 0) AS BIGINT) AS lt_cents
FROM fa FULL JOIN la ON la.touch_type = fa.touch_type
ORDER BY touch_type""",
)
def attribution_model_compare(spark, sf_dir):
    """The attribution war, settled on one table: every purchase's
    cents credited TWICE — to the user's FIRST-ever event type
    (first-touch) and to the LAST non-purchase event strictly before
    the purchase (last-touch) — per touch type, side by side. Where
    the two columns diverge is exactly the budget that moves when the
    org switches attribution model (session_entry_conversion and
    first_touch_profile each show one model; events_asof_join is the
    primitive the last-touch leg rides). 'none' = purchases with no
    prior event.

    Determinism: both touch picks are total-order argmins/argmaxes
    ((us, event_id) tiebreaks, purchases sort before same-µs
    candidates via the strict < — the as-of rule); cents per row.

    Scale shape (Spark): NO correlated subqueries — the last-touch leg
    is the asof tagged-union carry-forward (ONE user_id window) and
    the first-touch leg a map-side min(struct) per user broadcast back;
    the oracle's independent correlated formulation is the semantic
    cross-check."""
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    ).localCheckpoint()
    tagged = e.select(
        "event_id",
        "user_id",
        "us",
        "cents",
        F.when(F.col("event_type") == "purchase", F.lit(0))
        .otherwise(F.lit(1))
        .alias("tag"),
        F.when(F.col("event_type") != "purchase", F.col("event_type")).alias(
            "cand_type"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lt = (
        tagged.withColumn(
            "touch_type", F.last("cand_type", ignorenulls=True).over(w)
        )
        .where(F.col("tag") == 0)
        .select(
            F.coalesce("touch_type", F.lit("none")).alias("touch_type"),
            "cents",
        )
    )
    first = (
        e.groupBy("user_id")
        .agg(
            F.min(F.struct("us", "event_id", "event_type")).alias("t")
        )
        .select("user_id", F.col("t.event_type").alias("touch_type"))
    )
    ft = (
        e.where(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .select("touch_type", "cents")
    )
    fa = ft.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("ft_purchases"),
        F.sum("cents").cast("long").alias("ft_cents"),
    )
    la = lt.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("lt_purchases"),
        F.sum("cents").cast("long").alias("lt_cents"),
    )
    return (
        fa.join(la, "touch_type", "full")
        .select(
            "touch_type",
            F.coalesce("ft_purchases", F.lit(0)).cast("long").alias("ft_purchases"),
            F.coalesce("ft_cents", F.lit(0)).cast("long").alias("ft_cents"),
            F.coalesce("lt_purchases", F.lit(0)).cast("long").alias("lt_purchases"),
            F.coalesce("lt_cents", F.lit(0)).cast("long").alias("lt_cents"),
        )
        .orderBy("touch_type")
    )


@register(
    "basket_price_spread_histogram",
    """WITH o AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS min_c,
         CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS max_c
  FROM lineitem GROUP BY l_orderkey),
bk AS (
  SELECT CASE WHEN n_items < 2 THEN -1
              WHEN max_c * 10 <= min_c * 12 THEN 0
              WHEN max_c <= min_c * 2 THEN 1
              WHEN max_c <= min_c * 5 THEN 2 ELSE 3 END AS spread_band
  FROM o)
SELECT CAST(spread_band AS BIGINT) AS spread_band,
       CAST(count(*) AS BIGINT) AS n_orders
FROM bk GROUP BY spread_band ORDER BY spread_band""",
)
def basket_price_spread_histogram(spark, sf_dir):
    """Mixed-basket detector: the max/min item-price ratio within each
    multi-item order, banded (≤1.2× near-uniform, ≤2×, ≤5×, wider;
    single-item orders at −1) — wide-spread baskets are the
    cross-category trips (a big-ticket item plus accessories, the
    bundle-pricing and pick-route planning signal) that basket
    COUNT metrics (order_size_histogram, basket_breadth_value) can't
    separate from n cheap items. Integer cross-multiplication bands —
    no division.

    Scale shape: one orderkey agg (count/min/max on one exchange);
    5-band rollup."""
    o = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.min(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("min_c"),
            F.max(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("max_c"),
        )
    )
    bk = o.select(
        F.expr(
            "CAST(CASE WHEN n_items < 2 THEN -1"
            " WHEN max_c * 10 <= min_c * 12 THEN 0"
            " WHEN max_c <= min_c * 2 THEN 1"
            " WHEN max_c <= min_c * 5 THEN 2 ELSE 3 END AS BIGINT)"
        ).alias("spread_band")
    )
    return (
        bk.groupBy("spread_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("spread_band")
    )


# ---------------------------------------------------------------------------
# session 179 — dormancy spells, catalog collisions, return value share
# ---------------------------------------------------------------------------


@register(
    "dormancy_spell_histogram",
    f"""WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num FROM events),
lg AS (
  SELECT day_num - lag(day_num) OVER (PARTITION BY user_id ORDER BY day_num)
           AS gap_days
  FROM ud),
sp AS (SELECT gap_days FROM lg WHERE gap_days > 28)
SELECT CAST(length(bin(gap_days)) - 1 AS BIGINT) AS gap_band,
       CAST(count(*) AS BIGINT) AS n_spells
FROM sp GROUP BY gap_band ORDER BY gap_band""",
)
def dormancy_spell_histogram(spark, sf_dir):
    """How LONG the churned stay gone: the duration distribution of
    dormancy spells (within-user activity gaps > 28 days), log2-banded
    — resurrected_users_monthly counts the comebacks; this measures
    the silences they return FROM, which is what a win-back campaign's
    timing window is actually tuned against (a 32-64-day mode says
    nudge at five weeks; a fat 128+ band says those users are
    effectively new and CAC applies, not reactivation spend).

    Determinism: integer day gaps from one user-partitioned lag.

    Scale shape: the distinct (user, day) exchange + user-keyed lag
    (the resurrection op's own plan), then a ≤64-row band rollup."""
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
        (F.col("day_num") - F.lag("day_num").over(w)).alias("gap_days")
    )
    sp = lg.where(F.col("gap_days") > 28)
    return (
        sp.select(
            F.expr("CAST(length(bin(gap_days)) - 1 AS BIGINT)").alias("gap_band")
        )
        .groupBy("gap_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_spells"))
        .orderBy("gap_band")
    )


@register(
    "catalog_name_collisions",
    """WITH c AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name HAVING count(*) > 1)
SELECT p_name, n_parts
FROM c ORDER BY n_parts DESC, p_name ASC LIMIT 10""",
)
def catalog_name_collisions(spark, sf_dir):
    """Catalog hygiene: part NAMES shared by multiple part keys, top-10
    by collision count — name-keyed joins, search-by-name, and any
    'distinct products' business metric silently merge these rows
    (dedup_exact's question asked of the dimension table instead of the
    corpus; functional_dependency_census would score name→key as a
    broken FD, this names the offenders). Empty on a clean catalog.

    Determinism: exact counts, (n desc, name asc) cut.

    Scale shape: one name-keyed agg with the HAVING cut before the
    top-10 TakeOrdered."""
    c = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .where(F.col("n_parts") > 1)
    )
    return c.orderBy(F.desc("n_parts"), F.asc("p_name")).limit(10)


@register(
    "return_value_share",
    f"""WITH t AS (
  SELECT {_LI_DISC_C} AS disc_c,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(ret) AS BIGINT) AS n_returned,
       CAST((1000000 * sum(ret)) // count(*) AS BIGINT) AS count_share_q6,
       CAST(sum(disc_c) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN ret = 1 THEN disc_c ELSE 0 END) AS BIGINT)
         AS returned_cents,
       CAST((1000000 * sum(CASE WHEN ret = 1 THEN disc_c ELSE 0 END))
            // sum(disc_c) AS BIGINT) AS value_share_q6
FROM t""",
)
def return_value_share(spark, sf_dir):
    """Are returns biased toward expensive items? The returned share of
    ITEMS beside the returned share of VALUE — value_share exceeding
    count_share means big-ticket items come back disproportionately
    (restocking economics, fraud screens, and the real cost of the
    return policy all key off this gap; return_rate_by_priority/brand
    slice the count rate, none of them weigh it). Cents per row.

    Scale shape: one map-side-combined scan to a single row."""
    t = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr(_LI_DISC_C).alias("disc_c"),
        F.expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END").alias("ret"),
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("ret").cast("long").alias("n_returned"),
        F.sum("disc_c").cast("long").alias("total_cents"),
        F.sum(F.expr("CASE WHEN ret = 1 THEN disc_c ELSE 0 END"))
        .cast("long")
        .alias("returned_cents"),
    ).select(
        "n_items",
        "n_returned",
        F.expr("CAST((1000000 * n_returned) div n_items AS BIGINT)").alias(
            "count_share_q6"
        ),
        "total_cents",
        "returned_cents",
        F.expr(
            "CAST((1000000 * returned_cents) div total_cents AS BIGINT)"
        ).alias("value_share_q6"),
    )


# ---------------------------------------------------------------------------
# session 180 — first-order LTV predictiveness, brand loyalty
# ---------------------------------------------------------------------------


@register(
    "first_order_ltv_corr",
    f"""WITH o AS (
  SELECT o_custkey, o_orderkey,
         epoch_us(o_orderdate) AS us,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
per AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS total_c,
         CAST(min(us) AS BIGINT) AS first_us
  FROM o GROUP BY o_custkey),
fo AS (
  SELECT o.o_custkey, min(o.o_orderkey) AS first_key
  FROM o JOIN per ON per.o_custkey = o.o_custkey AND o.us = per.first_us
  GROUP BY o.o_custkey),
fx AS (
  SELECT per.o_custkey, per.n_orders,
         (o.cents // 10000) AS x, ((per.total_c - o.cents) // 10000) AS y
  FROM per JOIN fo ON fo.o_custkey = per.o_custkey
  JOIN o ON o.o_orderkey = fo.first_key AND o.o_custkey = per.o_custkey
  WHERE per.n_orders >= 2),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM fx)
SELECT n AS n_repeat_customers, CAST({_PQC_CORR} AS BIGINT) AS corr_q6
FROM s""",
)
def first_order_ltv_corr(spark, sf_dir):
    """Does the first order predict the relationship? Pearson
    correlation between each REPEAT customer's first-order value and
    the rest of their lifetime spend — the number behind every
    'high-value first purchase' onboarding rule (ltv_age_curve shows
    value accrual over time; this says whether the FIRST transaction
    already sorts the customers, i.e. whether early-tenure
    segmentation is signal or astrology). First order = earliest
    order date, min-orderkey tiebreak (the Q2 argmin rule); values in
    HUNDRED-dollar units — whole dollars made n·Σy² pass 2^63 at
    sf0.01 already (caught live), and correlation is scale-invariant
    up to the coarser binning, documented.

    Determinism: exact integer sufficient stats, the shared guarded
    split-sqrt expression.

    Scale shape: one custkey agg + the argmin join-back (both on the
    custkey exchange); the stats fold map-side to one row."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("us"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    ).localCheckpoint()
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_c"),
        F.min("us").cast("long").alias("first_us"),
    )
    fo = (
        o.join(
            per.select("o_custkey", "first_us"),
            ["o_custkey"],
        )
        .where(F.col("us") == F.col("first_us"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("fk"))
    )
    first_o = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("fk2"),
        F.col("cents").alias("first_c"),
    )
    fx = (
        per.where(F.col("n_orders") >= 2)
        .join(fo, "o_custkey")
        .join(
            first_o,
            (F.col("ck") == F.col("o_custkey")) & (F.col("fk2") == F.col("fk")),
        )
        .select(
            F.expr("first_c div 10000").alias("x"),
            F.expr("(total_c - first_c) div 10000").alias("y"),
        )
    )
    s = fx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
        F.sum(F.expr("y * y")).cast("long").alias("syy"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
    )
    return s.select(
        F.col("n").alias("n_repeat_customers"),
        F.expr(f"CAST({_PQC_CORR} AS BIGINT)").alias("corr_q6"),
    )


@register(
    "brand_loyalty_histogram",
    """WITH j AS (
  SELECT o.o_custkey, p.p_brand
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey),
cb AS (SELECT o_custkey, p_brand, CAST(count(*) AS BIGINT) AS n
       FROM j GROUP BY o_custkey, p_brand),
per AS (SELECT o_custkey, CAST(sum(n) AS BIGINT) AS n_items,
               CAST(max(n) AS BIGINT) AS top_brand_items
        FROM cb GROUP BY o_custkey),
d AS (SELECT CAST(least((10 * top_brand_items) // n_items, 9) AS BIGINT)
         AS loyalty_decile
      FROM per WHERE n_items >= 2)
SELECT loyalty_decile, CAST(count(*) AS BIGINT) AS n_customers
FROM d GROUP BY loyalty_decile ORDER BY loyalty_decile""",
)
def brand_loyalty_histogram(spark, sf_dir):
    """Brand loyalty distribution: each multi-item customer's TOP brand
    as a share of their items, deciled — the mass at decile 9 is the
    single-brand loyalist base, at 1-3 the promiscuous shoppers
    (brand_cobuy_matrix shows which brands share baskets;
    order_brand_breadth counts brands per order; this is the
    CUSTOMER-level loyalty curve a brand-retention program is actually
    sized against). Single-item customers drop — loyalty is undefined
    on one observation.

    Determinism: integer counts; decile = (10·top) div n clamped at 9
    (the typicality rule).

    Scale shape: the 3-table star collapses to (customer, brand)
    counts (map-side partials); per-customer max/sum ride one
    exchange; 10-row rollup."""
    j = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/part.parquet").select(
                "p_partkey", "p_brand"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("o_custkey", "p_brand")
    )
    cb = j.groupBy("o_custkey", "p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per = cb.groupBy("o_custkey").agg(
        F.sum("n").cast("long").alias("n_items"),
        F.max("n").cast("long").alias("top_brand_items"),
    )
    d = per.where(F.col("n_items") >= 2).select(
        F.expr(
            "CAST(least((10 * top_brand_items) div n_items, 9) AS BIGINT)"
        ).alias("loyalty_decile")
    )
    return (
        d.groupBy("loyalty_decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("loyalty_decile")
    )


# ---------------------------------------------------------------------------
# session 181 — the full growth-accounting series
# ---------------------------------------------------------------------------


@register(
    "daily_user_mix",
    f"""WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_num FROM events),
lg AS (
  SELECT user_id, day_num,
         lag(day_num) OVER (PARTITION BY user_id ORDER BY day_num) AS prev_day
  FROM ud),
cls AS (
  SELECT day_num,
         CASE WHEN prev_day IS NULL THEN 'new'
              WHEN day_num - prev_day > 28 THEN 'resurrected'
              ELSE 'regular' END AS bucket
  FROM lg)
SELECT CAST(day_num AS BIGINT) AS day_num,
       CAST(sum(CASE WHEN bucket = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN bucket = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resurrected,
       CAST(sum(CASE WHEN bucket = 'regular' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_regular
FROM cls GROUP BY day_num ORDER BY day_num""",
)
def daily_user_mix(spark, sf_dir):
    """The complete growth-accounting series: every active user-day
    classified as NEW (first day ever), RESURRECTED (returning from a
    >28-day silence) or REGULAR, per day — new_returning_daily's
    two-way split and resurrected_users_monthly's monthly rollup
    unified at the grain growth teams actually chart (DAU = the row
    sum; 'is growth new users or a win-back spike or the core' is
    literally the three columns). Observed days only — a day with no
    users has no mix.

    Determinism: one user-partitioned lag over distinct user-days;
    exact conditional counts.

    Scale shape: the distinct (user, day) exchange + user-keyed lag
    (the dormancy op's plan), then a day-keyed map-side rollup."""
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
        "day_num", F.lag("day_num").over(w).alias("prev_day")
    )
    cls = lg.select(
        "day_num",
        F.expr(
            "CASE WHEN prev_day IS NULL THEN 'new'"
            " WHEN day_num - prev_day > 28 THEN 'resurrected'"
            " ELSE 'regular' END"
        ).alias("bucket"),
    )
    return (
        cls.groupBy("day_num")
        .agg(
            F.sum(F.expr("CASE WHEN bucket = 'new' THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_new"),
            F.sum(F.expr("CASE WHEN bucket = 'resurrected' THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_resurrected"),
            F.sum(F.expr("CASE WHEN bucket = 'regular' THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_regular"),
        )
        .select(
            F.col("day_num").cast("long").alias("day_num"),
            "n_new",
            "n_resurrected",
            "n_regular",
        )
        .orderBy("day_num")
    )


# ---------------------------------------------------------------------------
# session 182 — quality-gate kappa, supplier coverage
# ---------------------------------------------------------------------------

# Cohen's kappa from the 2×2 agreement cells (a,b,c,d = ++, +-, -+, --):
# po = (a+d)/n, pe = ((a+b)(a+c) + (c+d)(b+d))/n² — ONE shared float
# expression; every product casts to DOUBLE at the first multiply (the
# significant_terms_chi2 rule), degenerate marginals → 0 sentinel.
_KAPPA = (
    "CASE WHEN n = 0 OR (CAST(n AS DOUBLE) * n"
    " - (CAST(a + b AS DOUBLE) * (a + c) + CAST(c + d AS DOUBLE) * (b + d))) = 0"
    " THEN CAST(0 AS BIGINT)"
    " ELSE CAST(round(1000000 * ((CAST(a + d AS DOUBLE) * n"
    " - (CAST(a + b AS DOUBLE) * (a + c) + CAST(c + d AS DOUBLE) * (b + d)))"
    " / (CAST(n AS DOUBLE) * n"
    " - (CAST(a + b AS DOUBLE) * (a + c) + CAST(c + d AS DOUBLE) * (b + d)))))"
    " AS BIGINT) END"
)


@register(
    "quality_gate_kappa",
    f"""WITH tf AS ({SQL_TF}),
per AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM tf GROUP BY doc_id),
m AS (SELECT CAST(sum(n_terms) AS BIGINT) AS st, CAST(sum(n_tok) AS BIGINT) AS sn,
             CAST(count(*) AS BIGINT) AS nd
      FROM per),
lab AS (
  SELECT CASE WHEN per.n_terms * m.sn >= per.n_tok * m.st THEN 1 ELSE 0 END AS hi_ttr,
         CASE WHEN per.n_tok * m.nd >= m.sn THEN 1 ELSE 0 END AS hi_len
  FROM per, m),
cells AS (
  SELECT CAST(sum(CASE WHEN hi_ttr = 1 AND hi_len = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN hi_ttr = 1 AND hi_len = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN hi_ttr = 0 AND hi_len = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN hi_ttr = 0 AND hi_len = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM lab)
SELECT a, b, c, d, n, {_KAPPA} AS kappa_q6 FROM cells""",
)
def quality_gate_kappa(spark, sf_dir):
    """Do two cheap quality gates agree beyond chance? Each doc is cut
    at the corpus MEAN on two axes — type/token ratio (vs the corpus
    ratio, by integer cross-multiplication) and length — and the 2×2
    agreement table yields Cohen's kappa: κ ≈ 0 means the gates filter
    DIFFERENT documents (stack them), κ → 1 means they're redundant
    (drop one and save the pass) — the inter-rater statistic the
    filter-stack design question actually needs (ppl_quality_corr
    relates continuous signals; κ scores the DECISIONS after
    thresholding, which is what the pipeline executes). TTR
    anti-correlates with length, so a negative κ is the expected
    honest reading here.

    Determinism: both cuts are exact integer cross-multiplications
    against corpus totals; κ is one guarded shared float expression.

    Scale shape: one doc agg; the 1-row totals broadcast; four
    counters in one pass."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    per = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    m = per.agg(
        F.sum("n_terms").cast("long").alias("st"),
        F.sum("n_tok").cast("long").alias("sn"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    lab = per.crossJoin(F.broadcast(m)).select(
        F.expr(
            "CASE WHEN n_terms * sn >= n_tok * st THEN 1 ELSE 0 END"
        ).alias("hi_ttr"),
        F.expr("CASE WHEN n_tok * nd >= sn THEN 1 ELSE 0 END").alias("hi_len"),
    )
    cells = lab.agg(
        F.sum(F.expr("CASE WHEN hi_ttr = 1 AND hi_len = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("a"),
        F.sum(F.expr("CASE WHEN hi_ttr = 1 AND hi_len = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("b"),
        F.sum(F.expr("CASE WHEN hi_ttr = 0 AND hi_len = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("c"),
        F.sum(F.expr("CASE WHEN hi_ttr = 0 AND hi_len = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return cells.select(
        "a", "b", "c", "d", "n", F.expr(_KAPPA).alias("kappa_q6")
    )


@register(
    "supplier_sales_coverage",
    """WITH act AS (SELECT DISTINCT l_suppkey FROM lineitem)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM supplier) AS n_suppliers,
       (SELECT CAST(count(*) AS BIGINT) FROM act) AS n_active,
       CAST((1000000 * (SELECT count(*) FROM act))
            // (SELECT count(*) FROM supplier) AS BIGINT) AS active_share_q6,
       (SELECT CAST(COALESCE(sum(CAST(round(s_acctbal * 100) AS BIGINT)), 0) AS BIGINT)
        FROM supplier LEFT JOIN act ON act.l_suppkey = supplier.s_suppkey
        WHERE act.l_suppkey IS NULL) AS idle_balance_cents""",
)
def supplier_sales_coverage(spark, sf_dir):
    """Supply-side activation: suppliers who actually shipped anything,
    and the account balance parked with the idle rest —
    customer_order_coverage and part_sales_coverage for the third
    party table, completing the activation-coverage trio (an idle
    supplier with a large balance is either onboarding inventory or a
    stale master-data row; either way the procurement review wants the
    list this number heads).

    Determinism: exact counts, cents per row, LEFT-IS-NULL anti probe.

    Scale shape: one distinct suppkey projection of the fact table,
    one anti probe, scalar rollups."""
    act = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey")
        .distinct()
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey",
        F.expr("CAST(round(s_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    ns = s.agg(F.count(F.lit(1)).cast("long").alias("n_suppliers"))
    na = act.agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    idle = s.join(act, s["s_suppkey"] == act["l_suppkey"], "anti").agg(
        F.coalesce(F.sum("cents"), F.lit(0))
        .cast("long")
        .alias("idle_balance_cents")
    )
    return (
        ns.crossJoin(na)
        .crossJoin(idle)
        .select(
            "n_suppliers",
            "n_active",
            F.expr(
                "CAST((1000000 * n_active) div n_suppliers AS BIGINT)"
            ).alias("active_share_q6"),
            "idle_balance_cents",
        )
    )


# ---------------------------------------------------------------------------
# session 183 — shipping calendar, bigram hapax share
# ---------------------------------------------------------------------------


@register(
    "ship_dow_profile",
    f"""WITH d AS (
  SELECT CAST((epoch_us(l_shipdate) // {_US_PER_DAY} + 3) % 7 AS BIGINT) AS dow,
         {_LI_DISC_C} AS disc_c
  FROM lineitem),
s AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(disc_c) AS BIGINT) AS value_c
      FROM d GROUP BY dow),
spine AS (SELECT unnest(generate_series(0, 6)) AS dow)
SELECT CAST(spine.dow AS BIGINT) AS dow,
       CAST(COALESCE(s.n_items, 0) AS BIGINT) AS n_items,
       CAST(COALESCE(s.value_c, 0) AS BIGINT) AS value_c
FROM spine LEFT JOIN s ON s.dow = spine.dow ORDER BY dow""",
)
def ship_dow_profile(spark, sf_dir):
    """The SHIPPING calendar: items and value shipped by weekday
    (0 = Monday, the (day+3)%7 rule, 7-row zero-filled spine) —
    zero_order_days_by_weekday reads the demand-side calendar from
    order dates; this is the fulfillment-side one (a warehouse that
    ships Saturdays but books no Saturday orders, or vice versa, is a
    day of latency hiding in plain sight next to ship_lag_by_month's
    trend). Cents per row.

    Scale shape: one map-side dow agg; 7-row spine."""
    d = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr(
            f"CAST((unix_micros(cast(l_shipdate as timestamp)) div {_US_PER_DAY} + 3) % 7 AS BIGINT)"
        ).alias("dow"),
        F.expr(_LI_DISC_C).alias("disc_c"),
    )
    s = d.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("disc_c").cast("long").alias("value_c"),
    )
    spine = spark.range(7).select(F.col("id").cast("long").alias("dow"))
    return (
        spine.join(s, "dow", "left")
        .select(
            "dow",
            F.coalesce("n_items", F.lit(0)).cast("long").alias("n_items"),
            F.coalesce("value_c", F.lit(0)).cast("long").alias("value_c"),
        )
        .orderBy("dow")
    )


@register(
    "bigram_hapax_share",
    f"""WITH w AS ({SQL_WORDS}),
bg AS (
  SELECT words[i] || ' ' || words[i+1] AS bigram
  FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)),
c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY bigram)
SELECT CAST(sum(n) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((1000000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS hapax_type_share_q6,
       CAST((1000000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END))
            // sum(n) AS BIGINT) AS hapax_token_share_q6
FROM c""",
)
def bigram_hapax_share(spark, sf_dir):
    """The bigram LM's sparsity exposure: how many token bigrams occur
    exactly once — both as a share of TYPES (how much of the bigram
    table is unestimatable) and of TOKENS (how often a decoder lands on
    one) — the number that justifies smoothing choices
    (kneser_ney_bigram's discount, stupid_backoff's alpha, the Laplace
    +1 in the suggester all exist BECAUSE this share is large;
    hapax_token_share is the unigram version; Good-Turing's leading
    term is literally this count).

    Determinism: exact integer counts, two divisions.

    Scale shape: the bigram explode is the tokenize cost class; one
    bigram-keyed agg (map-side partials) then a 1-row rollup."""
    w = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    bg = w.where(F.size("words") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(words) - 2),"
                " i -> concat(words[i], ' ', words[i+1]))"
            )
        ).alias("bigram")
    )
    c = bg.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return c.agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.expr("CASE WHEN n = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_hapax"),
    ).select(
        "n_bigrams",
        "n_distinct",
        "n_hapax",
        F.expr(
            "CAST((1000000 * n_hapax) div n_distinct AS BIGINT)"
        ).alias("hapax_type_share_q6"),
        F.expr(
            "CAST((1000000 * n_hapax) div n_bigrams AS BIGINT)"
        ).alias("hapax_token_share_q6"),
    )
