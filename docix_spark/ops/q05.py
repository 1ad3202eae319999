"""driver_queries chunk q05 (original lines 17347-20803): significant_terms_chi2, phrase_suggester, ivf_train_convergence, bpe_apply_compression, ... open_lineitems_timeseries (42 ops).

Linearized continuation of docix_spark.ops.q04 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q04")

@register(
    "significant_terms_chi2",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
fg AS (SELECT DISTINCT doc_id FROM agg),
fgn AS (SELECT CAST(count(*) AS BIGINT) AS ft FROM fg),
fgc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS a
  FROM tf JOIN fg USING (doc_id) GROUP BY term),
cells AS (
  SELECT fgc.term, fgc.a,
         (SELECT ft FROM fgn) - fgc.a AS b,
         CAST(dfs.df AS BIGINT) - fgc.a AS c,
         CAST((SELECT n_docs FROM st) AS BIGINT) - (SELECT ft FROM fgn)
           - (CAST(dfs.df AS BIGINT) - fgc.a) AS d,
         CAST((SELECT n_docs FROM st) AS BIGINT) AS n
  FROM fgc JOIN dfs USING (term)
  WHERE fgc.a >= 3),
sc AS (
  SELECT term, a AS fg_df, a + c AS bg_df, {_CHI2_SIG_EXPR} AS chi2_q6
  FROM cells WHERE a * d > b * c)
SELECT term, fg_df, bg_df, chi2_q6 FROM sc
ORDER BY chi2_q6 DESC, term ASC LIMIT 25""",
)
def significant_terms_chi2(spark, sf_dir):
    """ES ``significant_terms`` with the ``chi_square`` heuristic — the
    second significance lens next to the default JLH
    (significant_terms): chi² rewards terms whose foreground/background
    contingency deviates most from independence, which surfaces
    lower-frequency terms JLH's ratio term drowns. Same ES gates:
    min_doc_count 3 on the foreground, over-represented terms only
    (a·d > b·c — the exact-integer cross-multiplication, never a float
    sign test).

    Scale shape: identical to significant_terms — the foreground count
    is the only new exchange; the 2×2 cells are per-term scalar
    arithmetic over the vocab-bounded join of foreground counts with
    the A2 df table; top-25 is a TakeOrdered."""
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(
        F.count("*").cast("long").alias("n")
    )
    fg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS).select("doc_id").distinct()
    fgn = fg.agg(F.count("*").cast("long").alias("ft"))
    fgc = tf.join(fg, "doc_id").groupBy("term").agg(
        F.count("*").cast("long").alias("a")
    )
    cells = (
        fgc.join(dfs, "term")
        .crossJoin(F.broadcast(fgn))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("a") >= 3)
        .select(
            "term",
            "a",
            (F.col("ft") - F.col("a")).alias("b"),
            (F.col("df") - F.col("a")).alias("c"),
            (F.col("n") - F.col("ft") - (F.col("df") - F.col("a"))).alias("d"),
            "n",
        )
    )
    return (
        cells.where(F.expr("a * d > b * c"))
        .select(
            "term",
            F.col("a").alias("fg_df"),
            (F.col("a") + F.col("c")).cast("long").alias("bg_df"),
            F.expr(_CHI2_SIG_EXPR).alias("chi2_q6"),
        )
        .orderBy(F.desc("chi2_q6"), F.asc("term"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# session 50 — phrase suggester (did-you-mean), IVF training convergence
# ---------------------------------------------------------------------------

_PS_TYPO, _PS_NEXT = "spak", "join"  # "spak join" -> "spark join"


@register(
    "phrase_suggester",
    f"""WITH toks AS ({SQL_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
         FROM tf GROUP BY term),
vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM dict),
w AS ({SQL_WORDS}),
bg AS (SELECT words[i] AS w1, words[i+1] AS w2, CAST(count(*) AS BIGINT) AS c12
       FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
       WHERE len(words) >= 2 GROUP BY 1, 2),
cand AS (
  SELECT dict.term, CAST(levenshtein('{_PS_TYPO}', dict.term) AS BIGINT) AS dist,
         dict.df, dict.cf
  FROM dict WHERE levenshtein('{_PS_TYPO}', dict.term) BETWEEN 1 AND 2),
sc AS (
  SELECT cand.term, cand.dist, cand.df,
         CAST(COALESCE(bg.c12, 0) AS BIGINT) AS c12,
         CAST(round(1000000 * ln((COALESCE(bg.c12, 0) + 1)
              / CAST(cand.cf + vocab.v AS DOUBLE))) AS BIGINT) AS score_q6
  FROM cand LEFT JOIN bg ON bg.w1 = cand.term AND bg.w2 = '{_PS_NEXT}'
  CROSS JOIN vocab),
ranked AS (
  SELECT term, dist, df, c12, score_q6,
         CAST(row_number() OVER (
           ORDER BY score_q6 DESC, dist ASC, term ASC) AS BIGINT) AS rank
  FROM sc)
SELECT term, dist, df, c12, score_q6, rank FROM ranked
WHERE rank <= 5 ORDER BY rank""",
)
def phrase_suggester(spark, sf_dir):
    """ES PHRASE suggester ('did you mean: spark join'): correction
    candidates for the typo'd first term of 'spak join' are ranked by a
    Laplace bigram LM — P(join | cand) = (c(cand, join)+1)/(c(cand)+V) —
    instead of spell_correct's (dist, df) term-level ordering. This is
    the context-aware upgrade: 'spar'-like candidates that never precede
    'join' in the corpus drop below ones that do, exactly the
    real-word-error case the ES phrase suggester exists for (its
    laplace smoothing default, α folded to add-1).

    Determinism: per-candidate score_q6 is one q6-rounded ln over exact
    integers; rank orders by (score desc, dist asc, term asc).

    Scale shape: candidates come from the bounded dictionary scan (F2's
    shape); the bigram probe is a LEFT JOIN of ≤|candidates| rows
    against the Zipf-bounded bigram-type table on (w1 = cand,
    w2 = 'join'); vocab size broadcasts as one row. The corpus
    tokenizes ONCE into a checkpointed word-array table feeding both
    the dictionary chain and the bigram explode."""
    wdf = (
        _docs(spark, sf_dir)
        .select("doc_id", spark_tokens("text").alias("words"))
        .localCheckpoint()
    )
    toks = wdf.select("doc_id", F.explode("words").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dic = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
    vocab = dic.agg(F.count(F.lit(1)).cast("long").alias("v"))
    bg = (
        wdf.where(F.size("words") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-2), i -> "
                    "struct(words[i] AS w1, words[i+1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .where(F.col("w2") == _PS_NEXT)
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    cand = (
        dic.withColumn("dist", F.levenshtein(F.lit(_PS_TYPO), F.col("term")).cast("long"))
        .where((F.col("dist") >= 1) & (F.col("dist") <= 2))
    )
    sc = (
        cand.join(bg.select(F.col("w1").alias("term"), "c12"), "term", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "term",
            "dist",
            "df",
            F.coalesce(F.col("c12"), F.lit(0)).cast("long").alias("c12"),
            F.expr(
                "CAST(round(1000000 * ln((COALESCE(c12, 0) + 1)"
                " / CAST(cf + v AS DOUBLE))) AS BIGINT)"
            ).alias("score_q6"),
        )
    )
    w_rank = Window.orderBy(F.desc("score_q6"), F.asc("dist"), F.asc("term"))
    return (
        sc.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= 5)
        .select("term", "dist", "df", "c12", "score_q6", "rank")
        .orderBy("rank")
    )


@register(
    "ivf_train_convergence",
    _KMEANS_SQL_PRELUDE
    + """,
b1 AS (SELECT vec_id, max(cq) AS bc FROM s1 GROUP BY vec_id),
b2 AS (SELECT vec_id, max(cq) AS bc FROM s2 GROUP BY vec_id),
b3 AS (SELECT vec_id, max(cq) AS bc FROM s3 GROUP BY vec_id),
ch2 AS (SELECT CAST(count(*) FILTER (WHERE a2.cid <> a1.cid) AS BIGINT) AS ch
        FROM a2 JOIN a1 USING (vec_id)),
ch3 AS (SELECT CAST(count(*) FILTER (WHERE a3.cid <> a2.cid) AS BIGINT) AS ch
        FROM a3 JOIN a2 USING (vec_id))
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS round, CAST(count(*) AS BIGINT) AS n_vec,
         CAST(sum(bc) AS BIGINT) AS sum_cosq9, CAST(-1 AS BIGINT) AS n_changed
  FROM b1
  UNION ALL
  SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT), CAST(sum(bc) AS BIGINT),
         (SELECT ch FROM ch2) FROM b2
  UNION ALL
  SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT), CAST(sum(bc) AS BIGINT),
         (SELECT ch FROM ch3) FROM b3
) ORDER BY round""",
)
def ivf_train_convergence(spark, sf_dir):
    """k-means training convergence curve for the IVF coarse quantizer:
    per Lloyd round, the summed best-assignment cosine (q9 — higher =
    tighter cells; the cosine-k-means objective) and the number of
    vectors that CHANGED cells versus the previous round (round 1 assigns
    against the seed centroids; its n_changed is the -1 sentinel). The
    train-loop observability the 2-round choice in `_trained_ivf` rests
    on: sum_cosq9 must be non-decreasing and n_changed shrinking, else
    more rounds are warranted. Completes the index-health family next to
    ivf_cluster_balance (trained-state audit) — this is the
    during-training audit.

    Determinism: per-vector best cosine is the same integer q9 the
    assignment ranks on, so sums are exact BIGINTs; change counts are
    exact joins of integer assignments.

    Scale shape: per round, ONE broadcast-centroid scan (K rows
    broadcast, members stream) into a per-vector max — map-side
    combinable — plus the q6-integer centroid re-sum; assignments
    localCheckpoint per round (the kmeans-round pattern: lineage cut,
    each round's table materialized once). The oracle unrolls the same
    three rounds as CTEs (UNION ALL per round is DuckDB-only — the
    Spark side unions three 1-row aggregates)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    members = e.where(F.col("vec_id") != 0)
    cent = members.where(F.col("vec_id").between(1, _KMEANS_K)).select(
        F.col("vec_id").alias("cid"),
        F.expr(
            "transform(v, x -> cast(cast(round(x * 1000000) as bigint) as double))"
        ).alias("cv"),
    )
    prev = None
    rounds = []
    for j in (1, 2, 3):
        s = members.crossJoin(F.broadcast(cent)).select(
            "vec_id", "cid", _cosq("v", "cv", 1_000_000_000).alias("cq")
        )
        s = s.localCheckpoint()  # feeds the best-cos agg AND the assignment
        stat = s.groupBy("vec_id").agg(F.max("cq").alias("bc")).agg(
            F.count(F.lit(1)).cast("long").alias("n_vec"),
            F.sum("bc").cast("long").alias("sum_cosq9"),
        )
        w_rn = Window.partitionBy("vec_id").orderBy(F.desc("cq"), F.asc("cid"))
        assign = (
            s.withColumn("rn", F.row_number().over(w_rn))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid")
            .localCheckpoint()
        )
        if prev is None:
            ch = spark.createDataFrame([(-1,)], "ch long")
        else:
            ch = assign.join(
                prev.select("vec_id", F.col("cid").alias("pcid")), "vec_id"
            ).agg(F.count_if(F.col("cid") != F.col("pcid")).cast("long").alias("ch"))
        rounds.append(
            stat.crossJoin(ch).select(
                F.lit(j).cast("long").alias("round"),
                "n_vec",
                "sum_cosq9",
                F.col("ch").alias("n_changed"),
            )
        )
        if j < 3:
            cent = _kmeans_cent(members, assign)
        prev = assign
    return rounds[0].unionByName(rounds[1]).unionByName(rounds[2]).orderBy("round")


# ---------------------------------------------------------------------------
# session 51 — BPE apply/compression, k-fold near-dup leakage, weighted_avg
# ---------------------------------------------------------------------------


def _bpe_apply_sql() -> str:
    """Generated oracle for bpe_apply_compression: the _bpe_sql training
    chain extended by the FINAL merge application, with every application
    guarded by `CASE WHEN b.a IS NULL` over a LEFT JOIN ON TRUE — an
    exhausted corpus (empty argmax) must pass words through unchanged,
    where the trainer's plain cross join (correctly, for merge ROWS)
    empties the table. Aggregates include single-char words (excluded
    from the trainable table; their unit counts pass through verbatim)."""
    parts = [
        f"""WITH toks AS ({SQL_TOKS}),
allw AS MATERIALIZED (
  SELECT term AS word, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY term),
wt0 AS MATERIALIZED (
  SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS s, cnt FROM allw
  WHERE length(word) >= 2)"""
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
  ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
wt{r + 1} AS MATERIALIZED (
  SELECT CASE WHEN b{r}.a IS NULL THEN s
              ELSE replace(s, ' ' || b{r}.a || '  ' || b{r}.b || ' ',
                           ' ' || b{r}.a || b{r}.b || ' ') END AS s, cnt
  FROM wt{r} LEFT JOIN b{r} ON TRUE)"""
        )
    parts.append(
        f""",
after AS (
  SELECT CAST(COALESCE(sum(cnt * len(str_split(trim(s), '  '))), 0) AS BIGINT) AS u
  FROM wt{_BPE_ROUNDS}),
shortu AS (
  SELECT CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS u FROM allw WHERE length(word) < 2),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_types,
         CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS n_words,
         CAST(COALESCE(sum(cnt * length(word)), 0) AS BIGINT) AS units_before
  FROM allw)
SELECT tot.n_types, tot.n_words, tot.units_before,
       CAST(after.u + shortu.u AS BIGINT) AS units_after,
       CASE WHEN tot.units_before = 0 THEN 0
            ELSE CAST(round(1000000.0 * (after.u + shortu.u) / tot.units_before) AS BIGINT)
       END AS compression_q6
FROM tot, after, shortu"""
    )
    return "".join(parts)


@register("bpe_apply_compression", _bpe_apply_sql())
def bpe_apply_compression(spark, sf_dir):
    """BPE apply + compression audit — closes the tokenizer-training loop
    that bpe_merge_candidates (one step) and bpe_train_merges (the greedy
    loop) opened: train the 3 merges, APPLY them to the word-type table,
    and report corpus-level token-instance units before (characters) and
    after, plus the compression ratio — the bytes-per-token curve that
    decides a tokenizer's merge budget. Single-character words can't
    merge and pass through with unchanged units.

    Determinism: identical greedy path to bpe_train_merges (count desc,
    pair lexicographic); every unit count is an exact BIGINT; the ratio
    is one float division. An exhausted corpus (no pair to merge) leaves
    words unchanged — the application joins are LEFT ON TRUE with a
    NULL-guard CASE, never a plain cross join (which empties the table
    when the argmax is empty).

    Scale shape: the trainer's shape (vocab-bounded type table,
    localCheckpoint per round, 1-row broadcast merges) plus one final
    aggregate; the corpus is never rescanned after the first tf pass."""
    t = _toks(_docs(spark, sf_dir))
    allw = (
        t.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()  # feeds the trainable table AND the totals
    )
    wt = (
        allw.where(F.length("term") >= 2)
        .select(F.expr("regexp_replace(term, '(.)', ' $1 ')").alias("s"), "cnt")
        .localCheckpoint()
    )
    for _ in range(_BPE_ROUNDS):
        best = _bpe_pairs_best(wt).localCheckpoint()
        wt = (
            wt.join(F.broadcast(best), F.lit(True), "left")
            .select(
                F.expr(
                    "CASE WHEN a IS NULL THEN s"
                    " ELSE replace(s, ' ' || a || '  ' || b || ' ',"
                    " ' ' || a || b || ' ') END"
                ).alias("s"),
                "cnt",
            )
            .localCheckpoint()
        )
    after = wt.agg(
        F.coalesce(F.sum(F.expr("cnt * size(split(trim(s), '  '))")), F.lit(0))
        .cast("long")
        .alias("u")
    )
    shortu = allw.where(F.length("term") < 2).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("su")
    )
    tot = allw.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.sum(F.expr("cnt * length(term)")), F.lit(0))
        .cast("long")
        .alias("units_before"),
    )
    return (
        tot.crossJoin(after)
        .crossJoin(shortu)
        .select(
            "n_types",
            "n_words",
            "units_before",
            (F.col("u") + F.col("su")).cast("long").alias("units_after"),
            F.expr(
                "CASE WHEN units_before = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * (u + su) / units_before) AS BIGINT) END"
            ).alias("compression_q6"),
        )
    )


@register(
    "fold_leakage_check",
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
cf AS (
  SELECT comp.cluster_id,
         ('0x' || substr(md5(CAST(comp.doc_id AS VARCHAR)), 13, 4))::INT % 5 AS fold
  FROM comp),
cl AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT fold) AS BIGINT) AS n_folds
  FROM cf GROUP BY cluster_id)
SELECT n_folds, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(n_docs) AS BIGINT) AS n_docs
FROM cl GROUP BY n_folds ORDER BY n_folds""",
)
def fold_leakage_check(spark, sf_dir):
    """Cross-validation leakage audit: near-duplicate clusters whose
    members land in DIFFERENT folds of the stratified_kfold_assign split
    — training on fold≠k while evaluating on fold=k then leaks the
    near-dup twin of every eval doc (the reason sklearn grew GroupKFold).
    Reports the histogram of folds-spanned per cluster: every row at
    n_folds ≥ 2 is leakage the doc-level split cannot see, and the fix
    is assigning folds by CLUSTER id instead of doc id. Uses the
    kfold coordinate VERBATIM (md5 hex 13-16 % 5) so what's audited is
    the split that ships.

    Scale shape: cluster labels reuse the memoized `_lsh_pair_edges` +
    pointer-doubled connected components; the fold key is map-side; the
    rollup is cluster-table-sized then ≤5 rows."""
    edges = _lsh_pair_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    labels = connected_components(labels, edges).select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )
    cf = labels.select(
        "cluster_id",
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 13, 4), 16, 10) as int) % 5"
        ).alias("fold"),
    )
    cl = cf.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("fold").cast("long").alias("n_folds"),
    )
    return (
        cl.groupBy("n_folds")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("n_folds")
    )


@register(
    "weighted_avg_ttr",
    f"""WITH t AS (
  SELECT source,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_distinct
  FROM documents),
v AS (
  SELECT source, n_tok,
         CAST(round(1000000.0 * n_distinct / n_tok) AS BIGINT) AS ttr_q6
  FROM t WHERE n_tok > 0)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(round(sum(n_tok * ttr_q6) / CAST(sum(n_tok) AS DOUBLE)) AS BIGINT) AS wavg_ttr_q6,
       CAST(round(sum(ttr_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avg_ttr_q6
FROM v GROUP BY source ORDER BY source""",
)
def weighted_avg_ttr(spark, sf_dir):
    """ES ``weighted_avg`` aggregation: per-source type-token ratio
    averaged with TOKEN-MASS weights next to the naive doc-average — the
    pair answers 'what diversity does a sampled TOKEN see' vs 'what does
    a sampled DOC see' (they diverge exactly when short docs have
    atypical diversity, the coupling len_quality_hist2d maps). Completes
    the metric-agg family's last missing member.

    Determinism: per-doc ttr_q6 is rounded FIRST; both averages are one
    float division over exact BIGINT sufficient sums (Σ w·v stays under
    2^63 to ~9e6 docs·1e6-token docs per source — the extended_stats
    envelope). Empty docs carry zero weight and an undefined TTR and are
    excluded from both averages.

    Scale shape: one map-side projection into a sources-sized agg."""
    t = _docs(spark, sf_dir).select(
        "source",
        F.size(spark_tokens("text")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(spark_tokens("text"))).cast("long").alias("n_distinct"),
    )
    v = t.where(F.col("n_tok") > 0).select(
        "source",
        "n_tok",
        F.expr("CAST(round(1000000.0 * n_distinct / n_tok) AS BIGINT)").alias("ttr_q6"),
    )
    return (
        v.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                "CAST(round(sum(n_tok * ttr_q6) / CAST(sum(n_tok) AS DOUBLE)) AS BIGINT)"
            ).alias("wavg_ttr_q6"),
            F.expr(
                "CAST(round(sum(ttr_q6) / CAST(count(*) AS DOUBLE)) AS BIGINT)"
            ).alias("avg_ttr_q6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# session 52 — sketch-method agreement, source centroid matrix, per-dim
# embedding stats
# ---------------------------------------------------------------------------


@register(
    "dedup_method_agreement",
    f"""WITH msh AS ({_SQL_SHINGLES}),
sig AS (
  SELECT doc_id,
         min(md5('0:' || sh)) || min(md5('1:' || sh)) AS band0,
         min(md5('2:' || sh)) || min(md5('3:' || sh)) AS band1
  FROM msh GROUP BY doc_id),
bands AS (
  SELECT doc_id, band0 AS band FROM sig UNION ALL SELECT doc_id, band1 FROM sig),
mpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
tf AS ({SQL_TF}),
h AS (SELECT doc_id, tf, {_H60_SQL} AS h FROM tf),
bits AS (
  SELECT doc_id, j, sum(tf * (((h >> j) & 1) * 2 - 1)) AS vote
  FROM h, (SELECT unnest(generate_series(0, 59)) AS j)
  GROUP BY doc_id, j),
smh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id),
spairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM smh a JOIN smh b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
f AS (
  SELECT CAST(m.doc_a IS NOT NULL AS INT) AS in_m,
         CAST(s.doc_a IS NOT NULL AS INT) AS in_s
  FROM mpairs m FULL JOIN spairs s
    ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b)
SELECT CAST(COALESCE(sum(in_m), 0) AS BIGINT) AS n_minhash,
       CAST(COALESCE(sum(in_s), 0) AS BIGINT) AS n_simhash,
       CAST(COALESCE(sum(in_m * in_s), 0) AS BIGINT) AS n_both,
       CAST(count(*) AS BIGINT) AS n_union,
       CASE WHEN count(*) = 0 THEN 0
            ELSE CAST(round(1000000.0 * COALESCE(sum(in_m * in_s), 0) / count(*)) AS BIGINT)
       END AS agree_jaccard_q6
FROM f""",
)
def dedup_method_agreement(spark, sf_dir):
    """Sketch-method agreement audit: the candidate-pair sets of the two
    production near-dup sketches — MinHash-LSH (3-shingle bands, set
    similarity) and SimHash (tf-weighted bit votes, hamming ≤ 3, cosine
    similarity) — compared as a contingency: pairs both catch, pairs
    only one catches, and the Jaccard of the two candidate sets. The
    'which sketch sees what' readout behind choosing (or unioning) dedup
    methods: shingle-LSH catches reorderings simhash misses, simhash
    catches tf-weighted drift LSH's fixed threshold misses.

    Scale shape: both candidate generators are their existing banded
    forms (never all-pairs — the simhash side's oracle uses the hamming
    filter directly, the Spark side the 15-bit band equi-join); the
    FULL JOIN compares candidate-sized sets on the pair key; output is
    1 row. The minhash side reads the MEMOIZED `_lsh_pair_edges` graph
    (src < dst halves it back to pairs) — in a session that already ran
    any LSH op, this side is free."""
    mp = (
        _lsh_pair_edges(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    )
    sp = simhash_band_pairs(spark, sf_dir).select(
        F.col("id_a").alias("sa"), F.col("id_b").alias("sb")
    )
    f = mp.join(
        sp, (F.col("doc_a") == F.col("sa")) & (F.col("doc_b") == F.col("sb")), "full"
    ).select(
        F.col("doc_a").isNotNull().cast("int").alias("in_m"),
        F.col("sa").isNotNull().cast("int").alias("in_s"),
    )
    return f.agg(
        F.coalesce(F.sum("in_m"), F.lit(0)).cast("long").alias("n_minhash"),
        F.coalesce(F.sum("in_s"), F.lit(0)).cast("long").alias("n_simhash"),
        F.coalesce(F.sum(F.expr("in_m * in_s")), F.lit(0)).cast("long").alias("n_both"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.expr(
            "CASE WHEN count(*) = 0 THEN 0"
            " ELSE CAST(round(1000000.0 * COALESCE(sum(in_m * in_s), 0) / count(*)) AS BIGINT) END"
        ).alias("agree_jaccard_q6"),
    )


# centroid cosine with a zero-norm guard: a source whose q6 component sums
# are ALL exactly zero has no direction; both engines emit 0 for its pairs.
_CENT_COS = (
    "CASE WHEN naa = 0 OR nbb = 0 THEN 0"
    " ELSE CAST(round(1000000 * nab / (sqrt(naa) * sqrt(nbb))) AS BIGINT) END"
)


@register(
    "source_centroid_matrix",
    """WITH e AS (
  SELECT d.source, CAST(em.embedding AS DOUBLE[]) AS v
  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id
  WHERE em.vec_id <> 0),
dims AS (
  SELECT source, i, SUM(CAST(round(v[i] * 1000000) AS BIGINT)) AS s
  FROM e, (SELECT unnest(generate_series(1, 64)) AS i)
  GROUP BY source, i),
cv AS (SELECT source, list(CAST(s AS DOUBLE) ORDER BY i) AS c FROM dims GROUP BY source),
px AS (
  SELECT a.source AS src_a, b.source AS src_b,
         list_dot_product(a.c, b.c) AS nab,
         list_dot_product(a.c, a.c) AS naa,
         list_dot_product(b.c, b.c) AS nbb
  FROM cv a JOIN cv b ON a.source < b.source)
SELECT src_a, src_b, """
    + _CENT_COS
    + """ AS cos_q6
FROM px ORDER BY src_a, src_b""",
)
def source_centroid_matrix(spark, sf_dir):
    """Pairwise SOURCE-CENTROID cosine matrix — the semantic counterpart
    of jsd_source_pairs' lexical LM divergence (vec_id == doc_id joins
    each embedding to its document's source): two sources whose
    centroids align are topically redundant even when their vocabularies
    differ (translations, paraphrase mirrors) — exactly what the lexical
    matrix cannot see, which is why a data-mix audit reads both.

    Determinism: centroids are element-wise BIGINT q6 SUMS (cosine is
    scale-invariant, so the sum stands in for the mean — the
    _kmeans_cent trick); the pairwise cosine is one shared float
    expression with an exact zero-norm guard.

    Scale shape: one (source, dim) agg with map-side partials (64 rows
    per source), then a |sources|²-bounded pair join of 64-element
    arrays; the corpus is scanned once."""
    e = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .join(
            _docs(spark, sf_dir).select(F.col("doc_id").alias("vec_id"), "source"),
            "vec_id",
        )
        .select("source", F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    )
    dims = (
        e.select("source", F.posexplode("v").alias("i", "x"))
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
        .groupBy("source", "i")
        .agg(F.sum("xq").alias("s"))
    )
    cv = dims.groupBy("source").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(i, s))), t -> cast(t.s as double))"
        ).alias("c")
    )
    a = cv.select(F.col("source").alias("src_a"), F.col("c").alias("ca"))
    b = cv.select(F.col("source").alias("src_b"), F.col("c").alias("cb"))
    px = (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.expr(_DOT.format(a="ca", b="cb")).alias("nab"),
            F.expr(_DOT.format(a="ca", b="ca")).alias("naa"),
            F.expr(_DOT.format(a="cb", b="cb")).alias("nbb"),
        )
    )
    return px.select("src_a", "src_b", F.expr(_CENT_COS).alias("cos_q6")).orderBy(
        "src_a", "src_b"
    )


# variance in the FLOAT-MEAN form (ss/n - (s/n)^2) — the integer products
# n*ss overflow BIGINT at corpus scale (events_daily_anomaly's lesson);
# s is q6-scaled, ss q12-scaled, so the expression lands directly in q12.
_DIM_VAR = "CAST(round(ss / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) AS BIGINT)"


@register(
    "embedding_dim_stats",
    """WITH ex AS (
  SELECT i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xq
  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
       (SELECT unnest(generate_series(1, 64)) AS i)),
st AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(xq) AS BIGINT) AS s,
         CAST(sum(xq * xq) AS BIGINT) AS ss
  FROM ex GROUP BY dim)
SELECT dim, n, CAST(round(s / CAST(n AS DOUBLE)) AS BIGINT) AS mean_q6,
       """
    + _DIM_VAR
    + """ AS var_q12
FROM st ORDER BY dim""",
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension mean/variance of the embedding matrix — the
    whitening/normalization audit read before PCA or product
    quantization (a dimension with outsized variance dominates every
    unnormalized distance; dead dimensions waste code budget — the
    flat-variance sandbox reading IS what i.i.d. synthetic vectors
    should show). Completes the embedding-QA family: norms
    (embedding_norm_outliers), clip bounds (embedding_dim_clip_bounds),
    principal direction (embedding_power_iteration), now the per-dim
    moment table.

    Determinism: q6 quantization per element FIRST, sums are exact
    BIGINTs (Σ xq² at q12 caps the envelope at ~9e6 vectors — beyond
    that the elements floor to q3, the norm_outliers rule); mean and
    variance are single float expressions in the divide-first form (the
    n·ss integer product would overflow first).

    Scale shape: one map-side explode into a 64-group agg; output 64
    rows."""
    ex = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias("dim", "x"))
        .withColumn("xq", F.round(F.col("x") * F.lit(1_000_000.0)).cast("long"))
    )
    stt = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s"),
        F.sum(F.expr("xq * xq")).cast("long").alias("ss"),
    )
    return stt.select(
        "dim",
        "n",
        F.expr("CAST(round(s / CAST(n AS DOUBLE)) AS BIGINT)").alias("mean_q6"),
        F.expr(_DIM_VAR).alias("var_q12"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# session 53 — BM25 parameter sweep, df spectrum, revenue Pareto
# ---------------------------------------------------------------------------

# (k1, b) grid in integer basis points; constants enter both engines as
# (bp / 100.0) integer-over-float divisions — never decimal literals.
_BM25_SWEEP = [(120, 75), (90, 40), (200, 75)]  # first = the engine default


def _bm25_cfg_score(k1_bp: int, b_bp: int) -> str:
    k1 = f"({k1_bp} / 100.0)"
    b = f"({b_bp} / 100.0)"
    return (
        f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * ({k1} + 1.0)"
        f" / (tf + {k1} * (1.0 - {b} + {b} * doc_len / avgdl))"
    )


def _bm25_sweep_sql() -> str:
    parts = [
        f"""WITH tf AS MATERIALIZED ({SQL_TF}),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
q AS (SELECT unnest([{", ".join(repr(t) for t in _TOPK_TERMS)}]) AS term)"""
    ]
    for i, (k1_bp, b_bp) in enumerate(_BM25_SWEEP):
        parts.append(
            f""",
agg{i} AS (
  SELECT tf.doc_id,
         CAST(round(1000000 * sum({_bm25_cfg_score(k1_bp, b_bp)})) AS BIGINT) AS score_q6
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id), st
  GROUP BY tf.doc_id),
top{i} AS MATERIALIZED (
  SELECT doc_id FROM agg{i} ORDER BY score_q6 DESC, doc_id ASC LIMIT 10)"""
        )
    sel = "\nUNION ALL ".join(
        f"""SELECT CAST({k1_bp} AS BIGINT) AS k1_bp, CAST({b_bp} AS BIGINT) AS b_bp,
       (SELECT CAST(count(*) AS BIGINT) FROM top{i} t JOIN top0 t0 ON t.doc_id = t0.doc_id) AS overlap10"""
        for i, (k1_bp, b_bp) in enumerate(_BM25_SWEEP)
    )
    parts.append(f"\nSELECT * FROM ({sel}) ORDER BY k1_bp, b_bp")
    return "".join(parts)


@register("bm25_param_sweep", _bm25_sweep_sql())
def bm25_param_sweep(spark, sf_dir):
    """BM25 (k1, b) hyperparameter sweep — the tuning curve for the CORE
    scoring function itself (the family's other members tune sketches
    and indexes; this tunes relevance): top-10 overlap of each grid
    config against the engine default (1.2, 0.75). Grid: lower
    saturation + weak length norm (0.9, 0.4 — the 'modern default'
    proposed by Trotman), and high-k1 (2.0, 0.75). Overlap@10 is the
    cheap stability readout — a config whose top-10 barely overlaps the
    default's changes user-visible ranking and needs a judgment pass.

    Determinism: every config's constants enter both engines as integer
    /100.0 divisions (never decimal literals — the DECIMAL divergence
    rule); scores quantize to q6 before ranking; ranks tiebreak on
    doc_id.

    Scale shape: tf/dl/st/dfs compute ONCE (MATERIALIZED / checkpointed
    token table) and every config reuses them; each config adds only a
    match-set-sized scoring join ending in a TakeOrdered(10); the
    overlap joins see 10-row tables."""
    toks = _toks(_docs(spark, sf_dir)).localCheckpoint()
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    stt = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    qdf = F.broadcast(
        spark.createDataFrame([(t,) for t in _TOPK_TERMS], "term string")
    )
    base = (
        tf.join(qdf, "term")
        .join(dfs, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stt))
        .localCheckpoint()  # one scoring input, reused by every config
    )
    tops = []
    for k1_bp, b_bp in _BM25_SWEEP:
        agg = base.groupBy("doc_id").agg(
            F.expr(
                f"CAST(round(1000000 * sum({_bm25_cfg_score(k1_bp, b_bp)})) AS BIGINT)"
            ).alias("score_q6")
        )
        tops.append(
            agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id")
            .localCheckpoint()
        )
    rows = []
    for (k1_bp, b_bp), top in zip(_BM25_SWEEP, tops):
        ov = top.join(tops[0], "doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("overlap10")
        )
        rows.append(
            ov.select(
                F.lit(k1_bp).cast("long").alias("k1_bp"),
                F.lit(b_bp).cast("long").alias("b_bp"),
                "overlap10",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("k1_bp", "b_bp")


@register(
    "df_spectrum",
    f"""WITH tf AS ({SQL_TF}),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
        FROM tf GROUP BY term),
b AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS band, df, cf FROM dfs)
SELECT band, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(df) AS BIGINT) AS postings,
       CAST(sum(cf) AS BIGINT) AS tokens
FROM b GROUP BY band ORDER BY band""",
)
def df_spectrum(spark, sf_dir):
    """Vocabulary document-frequency spectrum: terms, posting-list
    entries, and token mass per log2(df) band — the index-sizing curve
    (how much of the postings volume lives in stopword-band terms decides
    block-max budgets, stopword cuts, and the impact-ordered skip data;
    the Zipf tail bands size the dictionary). The A2 aggregate read as a
    distribution instead of a lookup table.

    Scale shape: the vocab-keyed A2 agg then a ≤64-band rollup; all
    counts exact BIGINTs, no floats anywhere."""
    tf = _toks(_docs(spark, sf_dir)).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    dfs = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
    b = dfs.select(
        F.expr("CAST(length(bin(df)) - 1 AS BIGINT)").alias("band"), "df", "cf"
    )
    return (
        b.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("postings"),
            F.sum("cf").cast("long").alias("tokens"),
        )
        .orderBy("band")
    )


_PARETO_PCTS = [(100000,), (10000,)]  # q6 fractions: 10%, 1%


@register(
    "revenue_pareto_users",
    f"""WITH ur AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id),
hist AS (SELECT cents, CAST(count(*) AS BIGINT) AS nu FROM ur GROUP BY cents),
h AS (
  SELECT cents, nu,
         CAST(COALESCE(SUM(nu) OVER (ORDER BY cents DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM hist),
tot AS (SELECT CAST(COALESCE(sum(nu), 0) AS BIGINT) AS n_users,
               CAST(COALESCE(sum(nu * cents), 0) AS BIGINT) AS rev FROM hist),
p AS (SELECT p_q6 FROM (VALUES {", ".join(str(t) for t in _PARETO_PCTS)}) AS v(p_q6)),
kk AS (SELECT p_q6, CAST((p_q6 * n_users + 999999) // 1000000 AS BIGINT) AS k FROM p, tot),
top AS (
  SELECT kk.p_q6, kk.k,
         CAST(COALESCE(sum(CASE
           WHEN h.cum_before + h.nu <= kk.k THEN h.nu * h.cents
           WHEN h.cum_before < kk.k THEN (kk.k - h.cum_before) * h.cents
           ELSE 0 END), 0) AS BIGINT) AS rev_top
  FROM kk LEFT JOIN h ON TRUE GROUP BY kk.p_q6, kk.k)
SELECT top.p_q6, top.k AS k_users, top.rev_top,
       CASE WHEN tot.rev = 0 THEN 0
            ELSE CAST(round(1000000.0 * top.rev_top / tot.rev) AS BIGINT) END AS share_q6
FROM top, tot ORDER BY p_q6 DESC""",
)
def revenue_pareto_users(spark, sf_dir):
    """Revenue concentration (Pareto/Lorenz): the share of total event
    value held by the top 10% and top 1% of users — THE whale-curve
    readout behind every monetization dashboard ('do 1% of users carry
    half the revenue?'). k = ceil(p·U) top users; the boundary bin
    (users tied at the same cents total) contributes exactly its
    marginal k − cum_before users, so the answer is order-free and
    EXACT — no sort of the user table exists anywhere.

    Determinism: cents are exact per-event BIGINTs summed per user;
    ceil is the ADDITIVE identity (x + 999999) div 1e6 over non-negative
    x — the negate trick −((−x) div d) is NOT ceil here because BOTH
    engines truncate integer division toward zero (hypothesis caught
    it); the share is one float division.

    Scale shape: one user-keyed agg, then the doclen_quantiles
    histogram trick over DISTINCT revenue values (histogram cells ≪
    users); the prefix window runs over cells only; output is 2 rows."""
    ur = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .groupBy("user_id")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    hist = ur.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("nu"))
    hist = hist.localCheckpoint()  # feeds totals AND the cumulative window
    w = Window.orderBy(F.desc("cents")).rowsBetween(Window.unboundedPreceding, -1)
    h = hist.select(
        "cents",
        "nu",
        F.coalesce(F.sum("nu").over(w), F.lit(0)).cast("long").alias("cum_before"),
    )
    tot = hist.agg(
        F.coalesce(F.sum("nu"), F.lit(0)).cast("long").alias("n_users"),
        F.coalesce(F.sum(F.expr("nu * cents")), F.lit(0)).cast("long").alias("rev"),
    )
    p = spark.createDataFrame(_PARETO_PCTS, "p_q6 long")
    kk = F.broadcast(p).crossJoin(F.broadcast(tot)).select(
        "p_q6", F.expr("CAST((p_q6 * n_users + 999999) div 1000000 AS BIGINT)").alias("k")
    )
    top = (
        F.broadcast(kk)
        .join(h, F.lit(True), "left")
        .groupBy("p_q6", "k")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN cum_before + nu <= k THEN nu * cents"
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
            F.col("k").alias("k_users"),
            "rev_top",
            F.expr(
                "CASE WHEN rev = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * rev_top / rev) AS BIGINT) END"
            ).alias("share_q6"),
        )
        .orderBy(F.desc("p_q6"))
    )


# ---------------------------------------------------------------------------
# session 54 — batched multi-query BM25, interpolated-LM lambda sweep,
# term burstiness
# ---------------------------------------------------------------------------

_BATCH_QUERIES = [
    (0, ["spark", "hash"]),
    (1, ["merge", "sort", "window"]),
    (2, ["table", "scan"]),
    (3, ["join", "batch"]),
]
_BQ_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BATCH_QUERIES for t in terms
)


@register(
    "bm25_batch_queries",
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
  SELECT qid, doc_id, score_q6,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_q6 DESC, doc_id ASC) AS rn
  FROM agg)
SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_q6, CAST(rn AS BIGINT) AS rank
FROM r WHERE rn <= 5 ORDER BY qid, rank""",
)
def bm25_batch_queries(spark, sf_dir):
    """BATCHED multi-query BM25 — ES ``_msearch`` re-expressed as ONE
    relational plan: a query-set table (qid, term) joins the postings
    ONCE and every query's match set falls out of the same exchange,
    with per-query top-5 from a qid-partitioned window. The lexical twin
    of ann_ivf_batch: single-query TakeOrdered loops (what a naive
    _msearch translation does) scan the postings |queries| times; the
    batch join scans them once — the shape that matters when an offline
    eval set replays thousands of queries over 100 TB.

    Scale shape: tf materializes once; the query table broadcasts; the
    per-query window partitions by qid over match-set-sized input (same
    bound as ann_ivf_batch's per-qid window); scores quantize before
    ranking, doc_id tiebreak."""
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint()  # feeds dl/dfs/the scoring join off one pass
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    stt = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = F.broadcast(
        spark.createDataFrame(
            [(qid, t) for qid, terms in _BATCH_QUERIES for t in terms],
            "qid long, term string",
        )
    )
    per = (
        tf.join(q, "term")
        .join(dfs, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stt))
        .select(
            "qid",
            "doc_id",
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
    agg = per.groupBy("qid", "doc_id").agg(_q6(F.sum("s")).alias("score_q6"))
    w = Window.partitionBy("qid").orderBy(F.desc("score_q6"), F.asc("doc_id"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            F.col("qid").cast("long").alias("qid"),
            "doc_id",
            "score_q6",
            F.col("rn").cast("long").alias("rank"),
        )
        .orderBy("qid", "rank")
    )


# lambda grid as integer percents; the interpolated probability
# lam*p_bi + (1-lam)*p_uni is ONE shared float expression per (type, lam),
# q6-rounded FIRST (the KL-family rule), summed as exact BIGINT tf·nlp.
_LM_LAMBDAS = [25, 50, 75]
# greatest(denom, 1): an EMPTY train split zeroes c1+vocab — both engines
# would hit a double division by zero (inf/NULL divergence); the guard
# makes the no-information reading p_bi = (0+1)/1 = 1, nlp = 0.
_LM_INTERP_NLP = (
    "CAST(round(-ln((LAM / 100.0) * (CAST(COALESCE(cb, 0) + 1 AS DOUBLE)"
    " / greatest(COALESCE(c1, 0) + vocab, 1))"
    " + (1.0 - (LAM / 100.0)) * (CAST(COALESCE(cu, 0) + 1 AS DOUBLE)"
    " / (big_n + vocab + 1))) * 1000000) AS BIGINT)"
)


@register(
    "interpolated_lm_sweep",
    f"""WITH w AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words,
         {_SPLIT_V_SQL} AS v
  FROM documents),
bi AS MATERIALIZED (
  SELECT words[i] AS a, words[i+1] AS b, CAST(count(*) AS BIGINT) AS cb
  FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
  WHERE v < 98 AND len(words) >= 2 GROUP BY 1, 2),
uc AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(words) AS term FROM w WHERE v < 98) GROUP BY term),
st AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS big_n,
              CAST(count(*) AS BIGINT) AS vocab FROM uc),
evb AS (
  SELECT words[i] AS a, words[i+1] AS b, CAST(count(*) AS BIGINT) AS tf
  FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
  WHERE v >= 98 AND len(words) >= 2 GROUP BY 1, 2),
lam AS (SELECT unnest([{", ".join(str(x) for x in _LM_LAMBDAS)}]) AS lam),
sc AS (
  SELECT lam.lam, evb.tf,
         {_LM_INTERP_NLP.replace('LAM', 'lam.lam').replace('cb', 'bi.cb')
            .replace('c1', 'u1.c').replace('cu', 'u2.c')} AS nlp_q6
  FROM evb
  LEFT JOIN bi ON bi.a = evb.a AND bi.b = evb.b
  LEFT JOIN uc u1 ON u1.term = evb.a
  LEFT JOIN uc u2 ON u2.term = evb.b
  CROSS JOIN st CROSS JOIN lam)
SELECT CAST(lam AS BIGINT) AS lam_pct,
       CAST(COALESCE(sum(tf), 0) AS BIGINT) AS n_scored,
       CAST(COALESCE(sum(tf * nlp_q6), 0) AS BIGINT) AS nll_q6
FROM sc GROUP BY lam ORDER BY lam""",
)
def interpolated_lm_sweep(spark, sf_dir):
    """Jelinek-Mercer interpolation sweep: held-out bigram NLL at
    λ ∈ {{0.25, 0.5, 0.75}} of λ·P_add1(w2|w1) + (1−λ)·P_add1(w2) — the
    LM-smoothing hyperparameter curve (the λ a CCNet-style perplexity
    filter fixes by exactly this sweep). Unseen contexts fall back
    through the same formula (add-1 keeps every component finite, with
    COALESCE(c1,0) for OOV contexts). Trained on the shipped md5-5-8
    split, scored on the 2%% holdout, like every LM-eval op.

    Determinism: λ enters as (pct / 100.0); per-(bigram-type, λ) NLP is
    one q6-rounded shared float expression; NLL is the exact BIGINT
    Σ tf·nlp.

    Scale shape: the corpus tokenizes once (checkpointed arrays); train
    bigram/unigram tables are Zipf-bounded aggs; the eval side joins
    them on n-gram keys and fans ×3 over the broadcast λ spine — the
    fan multiplies eval-TYPE rows, never the corpus."""
    wdf = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            spark_tokens("text").alias("words"),
            F.expr(_SPLIT_V_SPARK).alias("v"),
        )
        .localCheckpoint()
    )

    def _bigrams(df):
        return (
            df.where(F.size("words") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(words)-2), i -> "
                        "struct(words[i] AS a, words[i+1] AS b))"
                    )
                ).alias("t")
            )
            .select("t.a", "t.b")
        )

    tr = wdf.where(F.col("v") < 98)
    bi = _bigrams(tr).groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    uc = (
        tr.select(F.explode("words").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stt = uc.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("big_n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    evb = (
        _bigrams(wdf.where(F.col("v") >= 98))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    lam = F.broadcast(
        spark.createDataFrame([(x,) for x in _LM_LAMBDAS], "lam long")
    )
    u1 = uc.select(F.col("term").alias("a"), F.col("c").alias("c1x"))
    u2 = uc.select(F.col("term").alias("b"), F.col("c").alias("cux"))
    sc = (
        evb.join(bi, ["a", "b"], "left")
        .join(u1, "a", "left")
        .join(u2, "b", "left")
        .crossJoin(F.broadcast(stt))
        .crossJoin(lam)
        .select(
            "lam",
            "tf",
            F.expr(
                _LM_INTERP_NLP.replace("LAM", "lam")
                .replace("cb", "cb")
                .replace("c1", "c1x")
                .replace("cu", "cux")
            ).alias("nlp_q6"),
        )
    )
    return (
        sc.groupBy("lam")
        .agg(
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("n_scored"),
            F.coalesce(F.sum(F.expr("tf * nlp_q6")), F.lit(0)).cast("long").alias("nll_q6"),
        )
        .select(F.col("lam").cast("long").alias("lam_pct"), "n_scored", "nll_q6")
        .orderBy("lam_pct")
    )


@register(
    "term_burstiness",
    f"""WITH tf AS ({SQL_TF}),
a2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
       FROM tf GROUP BY term)
SELECT term, df, cf,
       CAST(round(1000000.0 * cf / df) AS BIGINT) AS burst_q6
FROM a2 WHERE df >= 5
ORDER BY burst_q6 DESC, term ASC LIMIT 20""",
)
def term_burstiness(spark, sf_dir):
    """Term burstiness (Church & Gale): E[tf | term present] = cf/df per
    term, top-20 among terms with df ≥ 5 — the statistic separating
    TOPICAL terms (bursty: rare across docs but repeated within them)
    from FUNCTION words (evenly spread, ratio ≈ 1). Drives stopword
    cuts, impact-ordered index budgets, and the repetition-quality
    flags' thresholds — all currently tuned on df alone, which cannot
    see the within-doc axis.

    Determinism: one q6 division of two exact BIGINTs per term.
    Scale shape: the A2 agg plus a TakeOrdered(20) — no new exchange."""
    tf = _toks(_docs(spark, sf_dir)).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    a2 = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
    return (
        a2.where(F.col("df") >= 5)
        .select(
            "term",
            "df",
            "cf",
            F.expr("CAST(round(1000000.0 * cf / df) AS BIGINT)").alias("burst_q6"),
        )
        .orderBy(F.desc("burst_q6"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# session 55 — routed percolation, MLM masking plan, hour-of-day profile
# ---------------------------------------------------------------------------


@register(
    "percolate_routed",
    f"""WITH dtf AS MATERIALIZED (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM ({SQL_TOKS}) GROUP BY term),
top4 AS (SELECT term FROM dtf ORDER BY df DESC, term LIMIT 4),
qt AS (SELECT term FROM top4 UNION SELECT 'dup'),
q AS (SELECT a.term AS qa, b.term AS qb FROM qt a JOIN qt b ON a.term < b.term),
qr AS (
  SELECT q.qa, q.qb,
         CASE WHEN fa.df <= fb.df THEN q.qa ELSE q.qb END AS route,
         CASE WHEN fa.df <= fb.df THEN q.qb ELSE q.qa END AS other
  FROM q JOIN dtf fa ON fa.term = q.qa JOIN dtf fb ON fb.term = q.qb),
dt AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM ({SQL_TOKS})),
cand AS (
  SELECT qr.qa, qr.qb, qr.route, qr.other, dt.doc_id
  FROM qr JOIN dt ON dt.term = qr.route),
ver AS (
  SELECT cand.qa, cand.qb, cand.route, cand.doc_id,
         CAST(db.doc_id IS NOT NULL AS INT) AS hit
  FROM cand LEFT JOIN dt db
    ON db.term = cand.other AND db.doc_id = cand.doc_id)
SELECT qa, qb, route,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(COALESCE(sum(hit), 0) AS BIGINT) AS n_matched
FROM ver GROUP BY qa, qb, route ORDER BY qa, qb""",
)
def percolate_routed(spark, sf_dir):
    """ROUTED percolation — the ES percolator's candidate-pruning
    optimization made explicit: each stored query routes by its RAREST
    term (min df; the percolator's `query_terms` extraction), documents
    probe only the queries whose routing term they contain, and full
    verification runs on candidates alone. Reports per query the
    candidate count next to the true match count — the pruning-factor
    evidence (candidates = rarest-term df, instead of the corpus scan a
    naive percolator pays per document).

    Scale shape: the query registry and its routing table broadcast; the
    candidate join streams postings map-side ONCE (the routing term is
    the equi-key); verification is a LEFT probe of candidate-sized rows
    against the postings on the (other-term, doc) key. The distinct
    token table materializes once for its three consumers."""
    toks = _toks(_docs(spark, sf_dir))
    dt = toks.distinct().localCheckpoint()
    dtf = dt.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top4 = dtf.orderBy(F.desc("df"), "term").limit(4).select("term")
    qt = top4.unionByName(
        top4.sparkSession.range(1).select(F.lit("dup").alias("term"))
    ).distinct()
    q = (
        qt.alias("a")
        .crossJoin(qt.alias("b"))
        .where(F.col("a.term") < F.col("b.term"))
        .select(F.col("a.term").alias("qa"), F.col("b.term").alias("qb"))
    )
    fa = dtf.select(F.col("term").alias("qa"), F.col("df").alias("dfa"))
    fb = dtf.select(F.col("term").alias("qb"), F.col("df").alias("dfb"))
    qr = (
        q.join(fa, "qa")
        .join(fb, "qb")
        .select(
            "qa",
            "qb",
            F.expr("CASE WHEN dfa <= dfb THEN qa ELSE qb END").alias("route"),
            F.expr("CASE WHEN dfa <= dfb THEN qb ELSE qa END").alias("other"),
        )
    )
    cand = (
        F.broadcast(qr)
        .join(dt.alias("da"), F.col("da.term") == F.col("route"))
        .select("qa", "qb", "route", "other", F.col("da.doc_id").alias("doc_id"))
    )
    db = dt.select(F.col("term").alias("vterm"), F.col("doc_id").alias("vdoc"))
    ver = cand.join(
        db,
        (F.col("vterm") == F.col("other")) & (F.col("vdoc") == F.col("doc_id")),
        "left",
    ).select(
        "qa", "qb", "route", F.col("vdoc").isNotNull().cast("int").alias("hit")
    )
    return (
        ver.groupBy("qa", "qb", "route")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_matched"),
        )
        .orderBy("qa", "qb")
    )


# BERT MLM plan: select 15% of token positions by a position-keyed hash
# coordinate (hash-INPUT disjoint: 'mask:'||doc_id||':'||pos), then split
# selected positions 80/10/10 into mask/random/keep by a second slice.
_MLM_SEL = (
    "('0x' || substr(md5('mask:' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 4))::INT % 100"
)
_MLM_SUB = (
    "('0x' || substr(md5('mask:' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 5, 2))::INT % 10"
)
_MLM_SEL_SPARK = (
    "cast(conv(substring(md5(concat('mask:', cast(doc_id as string), ':', cast(pos as string))), 1, 4), 16, 10) as int) % 100"
)
_MLM_SUB_SPARK = (
    "cast(conv(substring(md5(concat('mask:', cast(doc_id as string), ':', cast(pos as string))), 5, 2), 16, 10) as int) % 10"
)


@register(
    "mlm_masking_plan",
    f"""WITH w AS ({SQL_WORDS}),
p AS (
  SELECT doc_id, source, i - 1 AS pos
  FROM w, unnest(generate_series(1, len(words))) AS t(i)),
m AS (
  SELECT source,
         CAST({_MLM_SEL} < 15 AS INT) AS sel,
         CASE WHEN {_MLM_SEL} < 15 THEN {_MLM_SUB} ELSE -1 END AS sub
  FROM p)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sum(sel), 0) AS BIGINT) AS n_selected,
       CAST(COALESCE(sum(CASE WHEN sub BETWEEN 0 AND 7 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_mask,
       CAST(COALESCE(sum(CASE WHEN sub = 8 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_random,
       CAST(COALESCE(sum(CASE WHEN sub = 9 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_keep
FROM m GROUP BY source ORDER BY source""",
)
def mlm_masking_plan(spark, sf_dir):
    """Deterministic BERT-style MLM masking plan: 15% of token POSITIONS
    selected by a position-keyed md5 coordinate, the selection split
    80/10/10 into [MASK] / random-token / keep-original (Devlin et al.
    2019) — as a reproducible RELATIONAL op: the same (doc, pos) masks
    identically on every engine, epoch-stable and shard-independent (an
    RNG-state masker reshuffles on retry and leaks positions across
    re-runs). Reports the per-source census a pretraining run logs.

    Determinism: selection and sub-split read DISJOINT slices (hex 1-4,
    5-6) of the 'mask:'-seeded hash — hash-input disjointness from every
    other coordinate family, slice disjointness between the two
    decisions.

    Scale shape: one map-side position explode into a sources-sized agg;
    no shuffle before the final small groupBy."""
    p = _docs(spark, sf_dir).select(
        "doc_id", "source", F.posexplode(spark_tokens("text")).alias("pos", "term")
    )
    m = p.select(
        "source",
        F.expr(f"CAST({_MLM_SEL_SPARK} < 15 AS INT)").alias("sel"),
        F.expr(
            f"CASE WHEN {_MLM_SEL_SPARK} < 15 THEN {_MLM_SUB_SPARK} ELSE -1 END"
        ).alias("sub"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.coalesce(F.sum("sel"), F.lit(0)).cast("long").alias("n_selected"),
            F.coalesce(F.sum(F.expr("CASE WHEN sub BETWEEN 0 AND 7 THEN 1 ELSE 0 END")), F.lit(0))
            .cast("long")
            .alias("n_mask"),
            F.coalesce(F.sum(F.expr("CASE WHEN sub = 8 THEN 1 ELSE 0 END")), F.lit(0))
            .cast("long")
            .alias("n_random"),
            F.coalesce(F.sum(F.expr("CASE WHEN sub = 9 THEN 1 ELSE 0 END")), F.lit(0))
            .cast("long")
            .alias("n_keep"),
        )
        .orderBy("source")
    )


@register(
    "events_hour_profile",
    f"""WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
c AS (SELECT hour, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(cents) AS BIGINT) AS value_cents
      FROM e GROUP BY hour),
spine AS (SELECT unnest(generate_series(0, 23)) AS hour)
SELECT CAST(spine.hour AS BIGINT) AS hour,
       CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(c.value_cents, 0) AS BIGINT) AS value_cents
FROM spine LEFT JOIN c ON c.hour = spine.hour ORDER BY hour""",
)
def events_hour_profile(spark, sf_dir):
    """Hour-of-day activity profile (UTC): event count and exact cents
    value per hour over a zero-filled 24-row spine — the intraday
    seasonality twin of events_weekday_profile (hours come from integer
    epoch-microsecond division, never timezone-dependent hour()).

    Scale shape: map-side integer keys into a 24-group agg; the spine
    LEFT JOIN keeps silent hours visible."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24").alias("hour"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    c = e.groupBy("hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("value_cents"),
    )
    spine = spark.createDataFrame([(h,) for h in range(24)], "hour long")
    return (
        F.broadcast(spine)
        .join(c, "hour", "left")
        .select(
            F.col("hour").cast("long").alias("hour"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("value_cents"), F.lit(0)).cast("long").alias("value_cents"),
        )
        .orderBy("hour")
    )


# ---------------------------------------------------------------------------
# session 56 — negative-sampling apportionment, bigram entropy rate,
# tf spectrum
# ---------------------------------------------------------------------------

_NEG_SLOTS = 4096  # sampling-table size (2^12; word2vec uses 1e8 at scale)


@register(
    "negative_sampling_table",
    f"""WITH toks AS ({SQL_TOKS}),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
wq AS (SELECT term, c, CAST(round(1000000 * pow(c, 75e-2)) AS BIGINT) AS w_q6 FROM cf),
tot AS (SELECT CAST(COALESCE(sum(w_q6), 0) AS BIGINT) AS tw FROM wq),
base AS (
  SELECT term, c, w_q6,
         CAST(({_NEG_SLOTS} * w_q6) // tw AS BIGINT) AS slots0,
         CAST(({_NEG_SLOTS} * w_q6) % tw AS BIGINT) AS rem
  FROM wq, tot),
need AS (SELECT CAST({_NEG_SLOTS} - COALESCE(sum(slots0), 0) AS BIGINT) AS k FROM base),
rk AS (
  SELECT term, c, w_q6, slots0, rem,
         row_number() OVER (ORDER BY rem DESC, term ASC) AS rr
  FROM base)
SELECT term, c, w_q6,
       CAST(slots0 + CASE WHEN rr <= (SELECT k FROM need) THEN 1 ELSE 0 END AS BIGINT) AS slots
FROM rk
ORDER BY slots DESC, term ASC LIMIT 20""",
)
def negative_sampling_table(spark, sf_dir):
    """word2vec negative-sampling table (Mikolov 2013: draw negatives
    ∝ count^0.75) built by LARGEST-REMAINDER apportionment — every term
    gets floor(S·w/W) slots and the S − Σfloor leftover slots go to the
    largest remainders (Hare quota; the same algorithm that seats
    parliaments), so the table is EXACTLY S slots with zero RNG and a
    bounded ±1-slot error per term — reproducible where the usual
    cumulative-float fill drifts with summation order. Top-20 rows by
    slot count.

    Determinism: w_q6 = round(1e6·c^0.75) per term FIRST (one libm pow,
    the temperature_mix rule); floor/mod apportionment is pure BIGINT;
    the remainder ranking tiebreaks on term.

    Scale shape: the A2-sized weight table, a 1-row total broadcast, and
    ONE vocab-sized remainder window (ranked rows are vocab-bounded;
    at 1e9-term vocabularies the window sub-shards on a hash prefix
    exactly like global_row_ids). Output is 20 rows."""
    cf = _toks(_docs(spark, sf_dir)).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wq = cf.select(
        "term", "c",
        F.expr("CAST(round(1000000 * pow(c, 75e-2)) AS BIGINT)").alias("w_q6"),
    )
    wq = wq.localCheckpoint()  # feeds the total AND the apportionment
    tot = wq.agg(F.coalesce(F.sum("w_q6"), F.lit(0)).cast("long").alias("tw"))
    base = wq.crossJoin(F.broadcast(tot)).select(
        "term", "c", "w_q6",
        F.expr(f"CAST(({_NEG_SLOTS} * w_q6) div tw AS BIGINT)").alias("slots0"),
        F.expr(f"CAST(({_NEG_SLOTS} * w_q6) % tw AS BIGINT)").alias("rem"),
    )
    base = base.localCheckpoint()  # feeds the leftover count AND the ranking
    need = base.agg(
        (F.lit(_NEG_SLOTS) - F.coalesce(F.sum("slots0"), F.lit(0)))
        .cast("long")
        .alias("k")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("term"))
    rk = base.withColumn("rr", F.row_number().over(w))
    return (
        rk.crossJoin(F.broadcast(need))
        .select(
            "term", "c", "w_q6",
            F.expr("CAST(slots0 + CASE WHEN rr <= k THEN 1 ELSE 0 END AS BIGINT)").alias("slots"),
        )
        .orderBy(F.desc("slots"), F.asc("term"))
        .limit(20)
    )


@register(
    "bigram_entropy_rate",
    f"""WITH w AS ({SQL_WORDS}),
bg AS (SELECT words[i] AS w1, words[i+1] AS w2, CAST(count(*) AS BIGINT) AS c12
       FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
       WHERE len(words) >= 2 GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bg GROUP BY w1),
nb AS (SELECT CAST(COALESCE(sum(c12), 0) AS BIGINT) AS n FROM bg),
contrib AS (
  SELECT CAST(round(-1000000 * (CAST(c12 AS DOUBLE) / nb.n)
       * ln(CAST(c12 AS DOUBLE) / c1.c1)) AS BIGINT) AS h_q6
  FROM bg JOIN c1 USING (w1) CROSS JOIN nb)
SELECT (SELECT n FROM nb) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(COALESCE(sum(h_q6), 0) AS BIGINT) AS entropy_rate_q6
FROM contrib""",
)
def bigram_entropy_rate(spark, sf_dir):
    """Conditional bigram entropy rate H(W2|W1) = −Σ p(w1,w2)·ln p(w2|w1)
    — the corpus's per-token predictability under a first-order model
    (Shannon's entropy-rate estimate; the information-theoretic summary
    next to source_unigram_entropy's H(W) — the gap between them is the
    mutual information consecutive tokens share, i.e. how much a bigram
    LM can ever help). Low rate = templated/boilerplate corpus; compare
    across snapshots for drift.

    Determinism: per bigram-TYPE contribution is one q6-rounded float
    expression over exact integers (p(pair) from the 1-row total
    broadcast, p(w2|w1) from the context marginal); the sum is BIGINT.

    Scale shape: one Zipf-bounded bigram-type agg; the context marginal
    derives FROM it (shared exchange); output is 1 row."""
    wdf = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    bg = (
        wdf.where(F.size("words") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-2), i -> "
                    "struct(words[i] AS w1, words[i+1] AS w2))"
                )
            ).alias("t")
        )
        .select("t.w1", "t.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    bg = bg.localCheckpoint()  # feeds the marginal, the total AND contribs
    c1 = bg.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    nb = bg.agg(F.coalesce(F.sum("c12"), F.lit(0)).cast("long").alias("n"))
    contrib = (
        bg.join(c1, "w1")
        .crossJoin(F.broadcast(nb))
        .select(
            F.expr(
                "CAST(round(-1000000 * (CAST(c12 AS DOUBLE) / n)"
                " * ln(CAST(c12 AS DOUBLE) / c1)) AS BIGINT)"
            ).alias("h_q6")
        )
    )
    return (
        contrib.agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.coalesce(F.sum("h_q6"), F.lit(0)).cast("long").alias("entropy_rate_q6"),
        )
        .crossJoin(F.broadcast(nb))
        .select(F.col("n").alias("n_bigrams"), "n_types", "entropy_rate_q6")
    )


@register(
    "tf_spectrum",
    f"""WITH tf AS ({SQL_TF}),
b AS (SELECT CAST(length(bin(tf)) - 1 AS BIGINT) AS band, tf FROM tf)
SELECT band, CAST(count(*) AS BIGINT) AS n_postings,
       CAST(sum(tf) AS BIGINT) AS tokens
FROM b GROUP BY band ORDER BY band""",
)
def tf_spectrum(spark, sf_dir):
    """Within-document term-frequency spectrum: posting count and token
    mass per log2(tf) band — df_spectrum's within-doc sibling and the
    BM25-saturation evidence (k1 = 1.2 means a tf ≥ 8 posting scores
    barely above tf = 4: the token mass sitting in high-tf bands is mass
    the ranking function deliberately ignores, which is what justifies
    impact-bucketed/quantized posting formats at 100 TB).

    Scale shape: the A1 posting agg then a ≤32-band rollup; all-integer."""
    tf = _toks(_docs(spark, sf_dir)).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    b = tf.select(F.expr("CAST(length(bin(tf)) - 1 AS BIGINT)").alias("band"), "tf")
    return (
        b.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_postings"),
            F.sum("tf").cast("long").alias("tokens"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# session 57 — RFM segmentation, Markov stationary distribution, sessions
# per user
# ---------------------------------------------------------------------------

_RFM_PROBES = "(200000), (400000), (600000), (800000)"


@register(
    "rfm_segments",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
mx AS (SELECT CAST(max(day) AS BIGINT) AS max_day FROM e),
u AS (
  SELECT user_id,
         CAST((SELECT max_day FROM mx) - max(day) AS BIGINT) AS r,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(cents) AS BIGINT) AS m
  FROM e GROUP BY user_id),
lf AS (
  SELECT 'r' AS metric, r AS val FROM u
  UNION ALL SELECT 'f', f FROM u
  UNION ALL SELECT 'm', m FROM u),
hist AS (SELECT metric, val, CAST(count(*) AS BIGINT) AS cnt FROM lf GROUP BY metric, val),
h AS (
  SELECT metric, val, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY metric ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(SUM(cnt) OVER (PARTITION BY metric) AS BIGINT) AS n
  FROM hist),
q AS (SELECT p_q6 FROM (VALUES {_RFM_PROBES}) AS v(p_q6)),
agg AS (
  SELECT h.metric, q.p_q6, max(h.n) AS n,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1))
                  THEN h.val END) AS v_lo,
         max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1)) + 1
                  THEN h.val END) AS v_hi
  FROM h, q GROUP BY h.metric, q.p_q6),
bnd AS (
  SELECT metric, p_q6,
         round(1000000.0 * (v_lo + ((p_q6 / 1000000.0) * (n - 1)
              - floor((p_q6 / 1000000.0) * (n - 1))) * (v_hi - v_lo))) AS b_q6
  FROM agg),
sc AS (
  SELECT u.user_id,
         1 + CAST(COALESCE(sum(CASE WHEN 1000000 * u.r > br.b_q6 THEN 1 ELSE 0 END), 0) AS BIGINT) AS r_score,
         1 + CAST(COALESCE(sum(CASE WHEN 1000000 * u.f > bf.b_q6 THEN 1 ELSE 0 END), 0) AS BIGINT) AS f_score,
         1 + CAST(COALESCE(sum(CASE WHEN 1000000 * u.m > bm.b_q6 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_score,
         max(u.m) AS m
  FROM u
  JOIN bnd br ON br.metric = 'r'
  JOIN bnd bf ON bf.metric = 'f' AND bf.p_q6 = br.p_q6
  JOIN bnd bm ON bm.metric = 'm' AND bm.p_q6 = br.p_q6
  GROUP BY u.user_id)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(m) AS BIGINT) AS cents_total
FROM sc GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score""",
)
def rfm_segments(spark, sf_dir):
    """RFM user segmentation — THE classic marketing/product census:
    every user scored 1–5 on Recency (days since last event — score 5 =
    longest-idle), Frequency (event count) and Monetary (exact cents),
    segment = the (r, f, m) triple, reported as a census with revenue
    mass. Quintile boundaries are exact type-7 quantiles computed from
    ONE long-form weighted histogram over all three metrics at once (the
    doclen_quantiles machinery, metric as the partition key) and
    broadcast back; scores are boundary comparisons in integer cross-
    multiplied form (1e6·value vs b_q6 — the boundary stays q6, the
    value stays exact).

    Scale shape: one user-keyed agg; histograms over DISTINCT metric
    values; the 12-row boundary table broadcasts; the census is ≤125
    rows. No user-table sort or window anywhere.

    Day keys integer (events_daily_mavg); ties at boundaries score LOW
    (strict >), identically in both engines."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    mx = e.agg(F.max("day").cast("long").alias("max_day"))
    u = (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            (F.max("max_day") - F.max("day")).cast("long").alias("r"),
            F.count(F.lit(1)).cast("long").alias("f"),
            F.sum("cents").cast("long").alias("m"),
        )
        .localCheckpoint()  # feeds the histogram AND the scoring join
    )
    lf = (
        u.select(F.lit("r").alias("metric"), F.col("r").alias("val"))
        .unionByName(u.select(F.lit("f").alias("metric"), F.col("f").alias("val")))
        .unionByName(u.select(F.lit("m").alias("metric"), F.col("m").alias("val")))
    )
    hist = lf.groupBy("metric", "val").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_cum = (
        Window.partitionBy("metric").orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("metric")
    h = hist.select(
        "metric",
        "val",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(200000,), (400000,), (600000,), (800000,)], "p_q6 long")
    rank = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    agg = (
        h.crossJoin(F.broadcast(q))
        .groupBy("metric", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank), F.col("val"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank) + 1, F.col("val"))).alias("v_hi"),
        )
    )
    r2 = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    frac = r2 - F.floor(r2)
    bnd = agg.select(
        "metric",
        "p_q6",
        F.round(F.lit(1_000_000.0) * (F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo")))).alias("b_q6"),
    )
    # one broadcast of the 12 boundary rows; scores via conditional sums
    sc = (
        u.crossJoin(F.broadcast(bnd))
        .groupBy("user_id")
        .agg(
            (1 + F.coalesce(F.sum(F.expr("CASE WHEN metric = 'r' AND 1000000 * r > b_q6 THEN 1 ELSE 0 END")), F.lit(0)))
            .cast("long")
            .alias("r_score"),
            (1 + F.coalesce(F.sum(F.expr("CASE WHEN metric = 'f' AND 1000000 * f > b_q6 THEN 1 ELSE 0 END")), F.lit(0)))
            .cast("long")
            .alias("f_score"),
            (1 + F.coalesce(F.sum(F.expr("CASE WHEN metric = 'm' AND 1000000 * m > b_q6 THEN 1 ELSE 0 END")), F.lit(0)))
            .cast("long")
            .alias("m_score"),
            F.max("m").alias("m"),
        )
    )
    return (
        sc.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("m").cast("long").alias("cents_total"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_MARKOV_ROUNDS = 5


def _markov_stationary_sql() -> str:
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
  FROM c),
types AS MATERIALIZED (SELECT DISTINCT prev_type AS et FROM p),
k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
v0 AS MATERIALIZED (SELECT et, CAST(1000000 // (SELECT k FROM k) AS BIGINT) AS v_q6 FROM types)"""
    ]
    for r in range(_MARKOV_ROUNDS):
        parts.append(
            f""",
v{r + 1} AS MATERIALIZED (
  SELECT p.next_type AS et,
         CAST(COALESCE(sum(v{r}.v_q6 * p.p_q6), 0) // 1000000 AS BIGINT) AS v_q6
  FROM v{r} JOIN p ON p.prev_type = v{r}.et
  GROUP BY p.next_type)"""
        )
    parts.append(
        f"""
SELECT v0.et AS event_type, v0.v_q6 AS v0_q6,
       CAST(COALESCE(vlast.v_q6, 0) AS BIGINT) AS stationary_q6
FROM v0 LEFT JOIN v{_MARKOV_ROUNDS} vlast ON vlast.et = v0.et
ORDER BY event_type"""
    )
    return "".join(parts)


@register("markov_stationary", _markov_stationary_sql())
def markov_stationary(spark, sf_dir):
    """Stationary distribution of the user-journey Markov chain: 5 power-
    iteration rounds of v ← vP over the q6-integer transition matrix from
    events_markov_transitions — where user attention CONVERGES (the
    long-run share of each event type if behavior keeps its transition
    structure), vs the v0 uniform start. The chain analytics member that
    turns the transition matrix into a ranking.

    Determinism: P is the integer-division q6 matrix (rows sum ≤ 1e6 by
    truncation — mass leaks ~1e-6/round identically in both engines,
    declared); each round is an exact BIGINT Σ v·p div 1e6. Power
    iteration, not an eigensolver — 5 rounds on a mixing 5-state chain
    sits well inside q6 resolution.

    Scale shape: the one event-stream window builds the ≤|types|² matrix;
    every round is a join of two ≤|types| tables (broadcast); output is
    |types| rows."""
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
        c.withColumn("tot", F.sum("n_trans").over(wr))
        .select(
            "prev_type",
            "next_type",
            F.expr("(1000000 * n_trans) div tot").cast("long").alias("p_q6"),
        )
        .localCheckpoint()  # the per-round join side
    )
    types = p.select(F.col("prev_type").alias("et")).distinct().localCheckpoint()
    kk = types.agg(F.count(F.lit(1)).cast("long").alias("k"))
    v = (
        types.crossJoin(F.broadcast(kk))
        .select("et", F.expr("CAST(1000000 div k AS BIGINT)").alias("v_q6"))
        .localCheckpoint()
    )
    v0 = v
    for _ in range(_MARKOV_ROUNDS):
        v = (
            v.join(p, F.col("et") == F.col("prev_type"))
            .groupBy(F.col("next_type").alias("et2"))
            .agg(
                F.expr("CAST(COALESCE(sum(v_q6 * p_q6), 0) div 1000000 AS BIGINT)").alias(
                    "v_q6"
                )
            )
            .select(F.col("et2").alias("et"), "v_q6")
            .localCheckpoint()
        )
    return (
        v0.select(F.col("et").alias("event_type"), F.col("v_q6").alias("v0_q6"))
        .join(
            v.select(F.col("et").alias("event_type"), F.col("v_q6").alias("stationary_q6")),
            "event_type",
            "left",
        )
        .select(
            "event_type",
            "v0_q6",
            F.coalesce(F.col("stationary_q6"), F.lit(0)).cast("long").alias("stationary_q6"),
        )
        .orderBy("event_type")
    )


_SESSION_GAP_US = 1_800_000_000  # 30 min


@register(
    "user_session_histogram",
    f"""WITH t AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
g AS (
  SELECT user_id,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL THEN 1
              WHEN t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM t),
s AS (SELECT user_id, CAST(sum(is_start) AS BIGINT) AS n_sessions FROM g GROUP BY user_id)
SELECT n_sessions, CAST(count(*) AS BIGINT) AS n_users
FROM s GROUP BY n_sessions ORDER BY n_sessions""",
)
def user_session_histogram(spark, sf_dir):
    """Sessions-per-user distribution under the 30-minute-gap rule (the
    sessionizer's own cut, interevent_gap_histogram's calibrated knob):
    a session starts at a user's first event or after a gap > 30 min;
    the histogram of per-user session counts is the engagement-depth
    census (one-session drive-bys vs habitual returners) that the
    streaming sessionizer's per-session output doesn't aggregate.

    Determinism: gaps order by (ts, event_id) — the tie rule every
    event-sequence op shares; counts are exact.

    Scale shape: ONE user-partitioned lag window (the sessionizer's
    shuffle key), a user-keyed sum, and a small histogram agg."""
    t = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    g = t.select(
        "user_id",
        F.expr(
            f"CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            f" IS NULL THEN 1"
            f" WHEN t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            f" > {_SESSION_GAP_US} THEN 1 ELSE 0 END"
        ).alias("is_start"),
    )
    s = g.groupBy("user_id").agg(F.sum("is_start").cast("long").alias("n_sessions"))
    return (
        s.groupBy("n_sessions")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("n_sessions")
    )


# ---------------------------------------------------------------------------
# session 58 — k-core peeling, query decompounding, low-entropy outliers
# ---------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 8


def _lsh_kcore_sql() -> str:
    parts = [
        _SQL_LSH_PAIRS
        + """,
e0 AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs)"""
    ]
    for r in range(_KCORE_ROUNDS):
        parts.append(
            f""",
d{r} AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e{r} GROUP BY src),
keep{r} AS MATERIALIZED (SELECT src AS id FROM d{r} WHERE deg >= {_KCORE_K}),
e{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r} e
  JOIN keep{r} ka ON ka.id = e.src
  JOIN keep{r} kb ON kb.id = e.dst)"""
        )
    last = _KCORE_ROUNDS
    parts.append(
        f"""
SELECT CAST((SELECT count(*) FROM keep{last - 1}) AS BIGINT) AS n_core_nodes,
       CAST((SELECT count(*) FROM e{last}) / 2 AS BIGINT) AS n_core_edges,
       CAST((SELECT count(DISTINCT src) FROM e0) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e0) / 2 AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM e{last - 1}) - (SELECT count(*) FROM e{last}) AS BIGINT)
         AS last_round_delta"""
    )
    return "".join(parts)


@register("lsh_kcore", _lsh_kcore_sql())
def lsh_kcore(spark, sf_dir):
    """{k}-core of the near-dup candidate graph (k = 2): iteratively peel
    nodes of degree < k until fixpoint — the DENSE-cluster extractor
    (boilerplate farms and mirror rings survive the peel; one-off
    accidental band collisions do not), which is how a dedup pipeline
    separates 'delete the whole cluster' candidates from pair noise.
    Completes the graph family: components, triangles, Adamic-Adar,
    degrees, now coreness.

    Convergence is VERIFIED, not assumed: if the last peel round still
    removed edges, the op raises ConvergenceError instead of returning a
    non-core (the dedup_connected_components rule) — 8 rounds suffice
    because each round at minimum halves the sub-k fringe on this graph
    family; the oracle unrolls the identical rounds.

    Scale shape: per round ONE degree agg + a semi-join of the edge
    table against the survivor set (both keyed on the node id);
    localCheckpoint per round cuts lineage. Output is one summary row."""
    edges = _lsh_pair_edges(spark, sf_dir)
    e = edges.select("src", "dst").localCheckpoint()
    e0_nodes = e.select("src").distinct().count()
    e0_edges = e.count() // 2
    prev_cnt = e.count()
    last_keep = None
    for _ in range(_KCORE_ROUNDS):
        d = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = d.where(F.col("deg") >= _KCORE_K).select(F.col("src").alias("id"))
        keep = keep.localCheckpoint()
        e = (
            e.join(keep.select(F.col("id").alias("src")), "src")
            .join(keep.select(F.col("id").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint()
        )
        last_keep = keep
        cnt = e.count()
        if cnt == prev_cnt:
            break
        prev_cnt = cnt
    else:
        raise ConvergenceError(
            f"k-core peel did not reach a fixpoint in {_KCORE_ROUNDS} rounds"
        )
    # mirror the oracle's fixed-round outputs: after convergence the
    # remaining rounds are no-ops, so keep/e equal the unrolled tables
    n_core_nodes = last_keep.count() if last_keep is not None else 0
    n_core_edges = e.count() // 2
    return spark.createDataFrame(
        [(n_core_nodes, n_core_edges, e0_nodes, e0_edges, 0)],
        "n_core_nodes long, n_core_edges long, n_nodes long, n_edges long, last_round_delta long",
    )


_DECOMPOUND_Q = "sparkjoin"


@register(
    "decompound_query",
    f"""WITH tf AS ({SQL_TF}),
dict AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
sp AS (SELECT unnest(generate_series(1, {len(_DECOMPOUND_Q) - 1})) AS i),
cand AS (
  SELECT sp.i,
         substr('{_DECOMPOUND_Q}', 1, sp.i) AS left_part,
         substr('{_DECOMPOUND_Q}', sp.i + 1, {len(_DECOMPOUND_Q)}) AS right_part
  FROM sp),
sc AS (
  SELECT cand.i, cand.left_part, cand.right_part,
         dl.cf AS cf_left, dr.cf AS cf_right,
         CAST(dl.cf * dr.cf AS BIGINT) AS score
  FROM cand
  JOIN dict dl ON dl.term = cand.left_part
  JOIN dict dr ON dr.term = cand.right_part)
SELECT CAST(i AS BIGINT) AS split_at, left_part, right_part,
       cf_left, cf_right, score
FROM sc ORDER BY score DESC, split_at ASC LIMIT 3""",
)
def decompound_query(spark, sf_dir):
    """Query decompounding (the ES/Lucene dictionary-decompounder token
    filter, as a query-time op): split the unsegmented query token
    'sparkjoin' at every position, keep splits where BOTH halves are
    dictionary words, rank by the corpus-frequency product — the
    compound-splitting heuristic German/Dutch/Nordic search ships, and
    the fallback an English engine needs for concatenation typos
    ('newyork'). Top-3 splits with their evidence.

    Scale shape: the split spine is |query|−1 rows; each candidate half
    probes the vocab-bounded dictionary by equality (two broadcast hash
    probes) — no LIKE scan, no fuzzy expansion; the corpus is read once
    to build the A2 dictionary it probes."""
    tf = _toks(_docs(spark, sf_dir)).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    dic = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    n = len(_DECOMPOUND_Q)
    cand = spark.createDataFrame(
        [(i, _DECOMPOUND_Q[:i], _DECOMPOUND_Q[i:]) for i in range(1, n)],
        "i long, left_part string, right_part string",
    )
    dl = dic.select(F.col("term").alias("left_part"), F.col("cf").alias("cf_left"))
    dr = dic.select(F.col("term").alias("right_part"), F.col("cf").alias("cf_right"))
    sc = (
        F.broadcast(cand)
        .join(dl, "left_part")
        .join(dr, "right_part")
        .select(
            F.col("i").alias("split_at"),
            "left_part",
            "right_part",
            "cf_left",
            "cf_right",
            (F.col("cf_left") * F.col("cf_right")).cast("long").alias("score"),
        )
    )
    return sc.orderBy(F.desc("score"), F.asc("split_at")).limit(3)


@register(
    "low_entropy_docs",
    """WITH ch AS (
  SELECT doc_id, unnest(str_split(lower(text), '')) AS c FROM documents
  WHERE length(text) > 0),
cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY doc_id, c),
dl AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS len FROM cc GROUP BY doc_id),
contrib AS (
  SELECT cc.doc_id,
         CAST(round(-1000000 * (CAST(cc.n AS DOUBLE) / dl.len)
              * ln(CAST(cc.n AS DOUBLE) / dl.len)) AS BIGINT) AS h_q6
  FROM cc JOIN dl USING (doc_id)),
ent AS (
  SELECT contrib.doc_id, CAST(sum(h_q6) AS BIGINT) AS entropy_q6
  FROM contrib GROUP BY contrib.doc_id)
SELECT ent.doc_id, dl.len AS n_chars, ent.entropy_q6
FROM ent JOIN dl ON dl.doc_id = ent.doc_id
ORDER BY entropy_q6 ASC, ent.doc_id ASC LIMIT 10""",
)
def low_entropy_docs(spark, sf_dir):
    """Per-document character-entropy outliers: the 10 LOWEST-entropy
    documents — the gibberish/padding/base64 detector at doc granularity
    (string_stats_source reports the per-source aggregate; quality gates
    need the per-doc ranking to actually drop offenders — a doc of one
    repeated character scores ~0, random base64 scores ~ln 64). Per-char
    contributions are q6-rounded FIRST (the entropy-family rule), doc
    entropy is a BIGINT sum, and the ranking is a TakeOrdered(10).

    Scale shape: the char explode is map-side into a (doc, char)-keyed
    agg (≤ alphabet rows per doc); doc length derives FROM it (shared
    exchange); the outlier cut is a TakeOrdered, never a global sort."""
    ch = (
        _docs(spark, sf_dir)
        .where(F.length("text") > 0)
        .select("doc_id", F.explode(F.split(F.lower("text"), "")).alias("c"))
        .where(F.col("c") != "")
    )
    cc = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cc = cc.localCheckpoint()  # feeds dl AND the contribution join
    dl = cc.groupBy("doc_id").agg(F.sum("n").cast("long").alias("len"))
    contrib = cc.join(dl, "doc_id").select(
        "doc_id",
        F.expr(
            "CAST(round(-1000000 * (CAST(n AS DOUBLE) / len)"
            " * ln(CAST(n AS DOUBLE) / len)) AS BIGINT)"
        ).alias("h_q6"),
    )
    ent = contrib.groupBy("doc_id").agg(F.sum("h_q6").cast("long").alias("entropy_q6"))
    return (
        ent.join(dl, "doc_id")
        .select("doc_id", F.col("len").alias("n_chars"), "entropy_q6")
        .orderBy(F.asc("entropy_q6"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# session 59 — user feature vectors, collapse inner_hits, PPMI term clusters
# ---------------------------------------------------------------------------


@register(
    "user_feature_vectors",
    f"""WITH e AS (
  SELECT user_id, epoch_us(ts) AS t_us, epoch_us(ts) // {_US_PER_DAY} AS day,
         event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
mx AS (SELECT CAST(max(day) AS BIGINT) AS max_day FROM e),
g AS (
  SELECT user_id, day, event_type, cents,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   IS NULL THEN 1
              WHEN t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_start
  FROM e)
SELECT user_id,
       CAST((SELECT max_day FROM mx) - max(day) AS BIGINT) AS recency_days,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS monetary_cents,
       CAST(sum(is_start) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(count(DISTINCT day) AS BIGINT) AS n_active_days
FROM g GROUP BY user_id ORDER BY user_id""",
)
def user_feature_vectors(spark, sf_dir):
    """Feature-store export: one row per user with the six behavioral
    features a churn/LTV model trains on — recency, frequency, monetary
    (exact cents), session count (30-min rule), event-type breadth and
    active days. The RELATIONAL feature-engineering step every events
    pipeline ships to a model: all-integer, reproducible, append-stable
    (features are pure aggregates — no RNG, no sampling). rfm_segments
    buckets three of these; this emits the raw vectors the model wants.

    Scale shape: ONE user-partitioned lag window (for session starts)
    feeding ONE user-keyed agg — everything rides the sessionizer's own
    exchange; two count-distincts are per-user-bounded."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias("day"),
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    mx = e.agg(F.max("day").cast("long").alias("max_day"))
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    g = e.select(
        "user_id",
        "day",
        "event_type",
        "cents",
        F.expr(
            f"CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            f" IS NULL THEN 1"
            f" WHEN t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)"
            f" > {_SESSION_GAP_US} THEN 1 ELSE 0 END"
        ).alias("is_start"),
    )
    return (
        g.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            (F.max("max_day") - F.max("day")).cast("long").alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("monetary_cents"),
            F.sum("is_start").cast("long").alias("n_sessions"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.countDistinct("day").cast("long").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


@register(
    "search_collapse_inner",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
j AS (SELECT d.source, agg.doc_id, agg.score_q6
      FROM agg JOIN documents d USING (doc_id)),
r AS (SELECT source, doc_id, score_q6,
             row_number() OVER (PARTITION BY source
                                ORDER BY score_q6 DESC, doc_id ASC) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_hits
      FROM j),
gtop AS (SELECT source, score_q6 AS top_q6, doc_id AS top_doc FROM r WHERE rn = 1)
SELECT r.source, CAST(r.rn AS BIGINT) AS inner_rank, r.doc_id, r.score_q6, r.n_hits
FROM r JOIN gtop ON gtop.source = r.source
WHERE r.rn <= 3
ORDER BY gtop.top_q6 DESC, gtop.top_doc ASC, r.rn ASC
LIMIT 15""",
)
def search_collapse_inner(spark, sf_dir):
    """ES field collapsing WITH ``inner_hits`` (size 3): the collapsed
    result list (groups ranked by their best hit — search_collapse's
    output) EXPANDED to each group's top-3 hits, the way the UI shows
    'more from this site'. Top-5 groups × ≤3 inner hits.

    Scale shape: one source-partitioned window over the match set (the
    match set is query-bounded — the window input is hits, not corpus);
    group ordering reuses the rn=1 rows; output ≤15 rows. The oracle's
    identical window is vocabulary for DuckDB."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    d = _docs(spark, sf_dir).select("doc_id", "source")
    j = agg.join(d, "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("score_q6"), F.asc("doc_id"))
    wcnt = Window.partitionBy("source")
    r = j.select(
        "source",
        "doc_id",
        "score_q6",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wcnt).cast("long").alias("n_hits"),
    ).localCheckpoint()  # feeds group-top ranking AND the inner-hit rows
    gtop = r.where(F.col("rn") == 1).select(
        F.col("source").alias("gsrc"),
        F.col("score_q6").alias("top_q6"),
        F.col("doc_id").alias("top_doc"),
    )
    return (
        r.where(F.col("rn") <= 3)
        .join(F.broadcast(gtop), F.col("source") == F.col("gsrc"))
        .orderBy(F.desc("top_q6"), F.asc("top_doc"), F.asc("rn"))
        .limit(15)
        .select(
            "source",
            F.col("rn").cast("long").alias("inner_rank"),
            "doc_id",
            "score_q6",
            "n_hits",
        )
    )


_TCC_MIN_W = 4  # minimum distance-weighted pair mass for a cluster edge


@register(
    "term_cluster_cc",
    f"""WITH RECURSIVE w AS ({SQL_WORDS}),
p AS (
  SELECT least(words[i], words[i+1]) AS a, greatest(words[i], words[i+1]) AS b, 2 AS wt
  FROM w, unnest(generate_series(1, len(words) - 1)) AS t1(i) WHERE len(words) >= 2
  UNION ALL
  SELECT least(words[i], words[i+2]), greatest(words[i], words[i+2]), 1
  FROM w, unnest(generate_series(1, len(words) - 2)) AS t2(i) WHERE len(words) >= 3),
pc AS (SELECT a, b, CAST(sum(wt) AS BIGINT) AS w_ab FROM p GROUP BY a, b),
uc AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM ({SQL_TOKS}) GROUP BY term),
tot AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM uc) AS n_tok,
               (SELECT CAST(sum(w_ab) AS BIGINT) FROM pc) AS w_tot),
ed AS MATERIALIZED (
  SELECT pc.a, pc.b FROM pc
  JOIN (SELECT term, n AS n_a FROM uc) ua ON ua.term = pc.a
  JOIN (SELECT term, n AS n_b FROM uc) ub ON ub.term = pc.b
  CROSS JOIN tot
  WHERE w_ab >= {_TCC_MIN_W} AND {_PPMI_EXPR} > 0),
edges AS (SELECT a AS src, b AS dst FROM ed UNION SELECT b, a FROM ed),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
comp AS (SELECT id AS term, min(lbl) AS cluster FROM reach GROUP BY id)
SELECT cluster, CAST(count(*) AS BIGINT) AS n_terms,
       string_agg(term, ' ' ORDER BY term) AS members
FROM comp GROUP BY cluster ORDER BY cluster""",
)
def term_cluster_cc(spark, sf_dir):
    """Distributional term clusters: connected components over the PPMI
    co-occurrence graph (edges = pairs with positive PPMI and weighted
    mass ≥ 4 — cooccurrence_ppmi's table read as a graph) — the cheap
    word-cluster pass (Brown-cluster ancestor) behind query-expansion
    dictionaries and topic smell tests. Emits per cluster its size and
    the sorted member list.

    Scale shape: the edge table is vocab²-bounded (Zipf-tiny after the
    mass gate); clustering reuses the pointer-doubled
    connected_components (string labels — min is lexicographic in both
    engines, the convergence checksum hashes strings); the member list
    aggregates with an explicit ORDER BY (the cdc_chunk rule — unordered
    string_agg is nondeterministic).

    The oracle recomputes the closure recursively over the identical
    edges."""
    wdf = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    p1 = wdf.where(F.size("words") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(words)-2), i -> "
                "struct(least(words[i], words[i+1]) AS a,"
                " greatest(words[i], words[i+1]) AS b, 2 AS wt))"
            )
        ).alias("t")
    )
    p2 = wdf.where(F.size("words") >= 3).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(words)-3), i -> "
                "struct(least(words[i], words[i+2]) AS a,"
                " greatest(words[i], words[i+2]) AS b, 1 AS wt))"
            )
        ).alias("t")
    )
    p = p1.unionByName(p2).select("t.a", "t.b", "t.wt")
    pc = p.groupBy("a", "b").agg(F.sum("wt").cast("long").alias("w_ab"))
    uc = (
        _toks(_docs(spark, sf_dir))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    uc = uc.localCheckpoint()  # feeds totals AND both probe sides
    tot = uc.agg(F.sum("n").cast("long").alias("n_tok")).crossJoin(
        pc.agg(F.sum("w_ab").cast("long").alias("w_tot"))
    )
    ua = uc.select(F.col("term").alias("a"), F.col("n").alias("n_a"))
    ub = uc.select(F.col("term").alias("b"), F.col("n").alias("n_b"))
    ed = (
        pc.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .where((F.col("w_ab") >= _TCC_MIN_W) & (F.expr(_PPMI_EXPR) > 0))
        .select("a", "b")
    )
    edges = (
        ed.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(ed.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    comp = connected_components(labels, edges).select(
        F.col("doc_id").alias("term"), F.col("lbl").alias("cluster")
    )
    return (
        comp.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.expr("array_join(sort_array(collect_list(term)), ' ')").alias("members"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# session 60 — cleaning-gate waterfall, deterministic A/B readout,
# stopword-cut impact
# ---------------------------------------------------------------------------


@register(
    "pipeline_waterfall",
    f"""WITH t AS ({SQL_TOKS}),
m AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         avg(length(term)) AS mean_len,
         count(*) FILTER (term IN ('the','a','of','to','is')) AS stop_hits
  FROM t GROUP BY doc_id),
surv AS (
  SELECT d.doc_id, md5(d.text) AS h,
         CAST(d.doc_id = min(d.doc_id) OVER (PARTITION BY md5(d.text)) AS INT) AS is_surv
  FROM documents d),
fl AS (
  SELECT m.doc_id, m.n_tokens,
         CAST(m.n_tokens >= 20 AS INT) AS g1,
         CAST(m.n_tokens >= 20 AND m.mean_len >= 2.0 AND m.mean_len <= 12.0 AS INT) AS g2,
         CAST(m.n_tokens >= 20 AND m.mean_len >= 2.0 AND m.mean_len <= 12.0
              AND m.stop_hits > 0 AS INT) AS g3,
         CAST(m.n_tokens >= 20 AND m.mean_len >= 2.0 AND m.mean_len <= 12.0
              AND m.stop_hits > 0 AND surv.is_surv = 1 AS INT) AS g4
  FROM m JOIN surv ON surv.doc_id = m.doc_id),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS d0, CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) AS t0,
         CAST(COALESCE(sum(g1), 0) AS BIGINT) AS d1, CAST(COALESCE(sum(g1 * n_tokens), 0) AS BIGINT) AS t1,
         CAST(COALESCE(sum(g2), 0) AS BIGINT) AS d2, CAST(COALESCE(sum(g2 * n_tokens), 0) AS BIGINT) AS t2,
         CAST(COALESCE(sum(g3), 0) AS BIGINT) AS d3, CAST(COALESCE(sum(g3 * n_tokens), 0) AS BIGINT) AS t3,
         CAST(COALESCE(sum(g4), 0) AS BIGINT) AS d4, CAST(COALESCE(sum(g4 * n_tokens), 0) AS BIGINT) AS t4
  FROM fl)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage, 'ingest' AS gate, d0 AS n_docs, t0 AS n_tokens FROM agg
  UNION ALL SELECT 1, 'min_length', d1, t1 FROM agg
  UNION ALL SELECT 2, 'token_len_band', d2, t2 FROM agg
  UNION ALL SELECT 3, 'stopword_presence', d3, t3 FROM agg
  UNION ALL SELECT 4, 'exact_dedup', d4, t4 FROM agg
) ORDER BY stage""",
)
def pipeline_waterfall(spark, sf_dir):
    """Cleaning-funnel waterfall: docs and token mass surviving each
    SUCCESSIVE admission gate — min-length → mean-token-length band →
    stopword presence (quality_filter_flags' exact Gopher-shape rules)
    → exact-dedup survivorship — the attrition report every data-ops
    dashboard shows (training_mix_pipeline applies a mix of gates; this
    op shows WHERE the mass goes, stage by stage, so a surprising gate
    is localizable). Monotone by construction.

    Scale shape: one per-doc metrics agg + the md5-partitioned survivor
    window (group-bounded); the cumulative gate flags are map-side; ONE
    aggregate row carries all five stages (the Spark side unpivots with
    stack() — per-stage UNION-ALL scans are DuckDB-only vocabulary).

    The float mean_len comparisons are exact-double divisions of
    integers — identical in both engines (the quality_filter_flags
    contract, driver-green since r2)."""
    t = _toks(_docs(spark, sf_dir))
    m = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg(F.length("term")).alias("mean_len"),
        F.sum(
            F.when(F.col("term").isin("the", "a", "of", "to", "is"), 1).otherwise(0)
        ).alias("stop_hits"),
    )
    wsurv = Window.partitionBy(F.md5("text"))
    surv = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(wsurv)).cast("int").alias("is_surv"),
    )
    fl = m.join(surv, "doc_id").select(
        "n_tokens",
        F.expr("CAST(n_tokens >= 20 AS INT)").alias("g1"),
        F.expr(
            "CAST(n_tokens >= 20 AND mean_len >= 2.0 AND mean_len <= 12.0 AS INT)"
        ).alias("g2"),
        F.expr(
            "CAST(n_tokens >= 20 AND mean_len >= 2.0 AND mean_len <= 12.0"
            " AND stop_hits > 0 AS INT)"
        ).alias("g3"),
        F.expr(
            "CAST(n_tokens >= 20 AND mean_len >= 2.0 AND mean_len <= 12.0"
            " AND stop_hits > 0 AND is_surv = 1 AS INT)"
        ).alias("g4"),
    )
    agg = fl.agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("t0"),
        *[
            c
            for i in (1, 2, 3, 4)
            for c in (
                F.coalesce(F.sum(f"g{i}"), F.lit(0)).cast("long").alias(f"d{i}"),
                F.coalesce(F.sum(F.expr(f"g{i} * n_tokens")), F.lit(0))
                .cast("long")
                .alias(f"t{i}"),
            )
        ],
    )
    return (
        agg.select(
            F.expr(
                "stack(5,"
                " cast(0 as bigint), 'ingest', d0, t0,"
                " cast(1 as bigint), 'min_length', d1, t1,"
                " cast(2 as bigint), 'token_len_band', d2, t2,"
                " cast(3 as bigint), 'stopword_presence', d3, t3,"
                " cast(4 as bigint), 'exact_dedup', d4, t4)"
                " AS (stage, gate, n_docs, n_tokens)"
            )
        )
        .orderBy("stage")
    )


@register(
    "ab_assignment_readout",
    f"""WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 4))::INT % 2 AS arm,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT) AS converted
  FROM events GROUP BY user_id)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(COALESCE(sum(converted), 0) AS BIGINT) AS n_converted,
       CAST(round(1000000.0 * COALESCE(sum(converted), 0) / count(*)) AS BIGINT) AS conv_q6,
       CAST(COALESCE(sum(cents), 0) AS BIGINT) AS revenue_cents,
       CAST(round(COALESCE(sum(cents), 0) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS arpu_cents
FROM u GROUP BY arm ORDER BY arm""",
)
def ab_assignment_readout(spark, sf_dir):
    """Deterministic A/B experimentation primitive: users split 50/50 by
    a dedicated hash coordinate (md5('ab:'||user_id) — hash-INPUT
    disjoint from every other coordinate family, so experiment arms are
    independent of shards/splits/folds/samples), with the per-arm readout
    an experiment dashboard serves: users, converters (≥1 purchase),
    conversion rate, revenue, ARPU. A rand()-based assigner re-arms users
    on every run; this one is stable under re-runs, appends and replays —
    the property A/B bucketing actually requires.

    Scale shape: arm is map-side; ONE user-keyed agg then a 2-group
    rollup; conversion/ARPU are single float divisions of exact sums."""
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).cast("long").alias("cents"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
        .withColumn(
            "arm",
            F.expr(
                "cast(conv(substring(md5(concat('ab:', cast(user_id as string))), 1, 4), 16, 10) as int) % 2"
            ),
        )
    )
    return (
        u.groupBy(F.col("arm").cast("long").alias("arm"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.coalesce(F.sum("converted"), F.lit(0)).cast("long").alias("n_converted"),
            F.expr(
                "CAST(round(1000000.0 * COALESCE(sum(converted), 0) / count(*)) AS BIGINT)"
            ).alias("conv_q6"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("revenue_cents"),
            F.expr(
                "CAST(round(COALESCE(sum(cents), 0) / CAST(count(*) AS DOUBLE)) AS BIGINT)"
            ).alias("arpu_cents"),
        )
        .orderBy("arm")
    )


_STOP_CUTS = [2, 4, 8]


@register(
    "stopword_cut_impact",
    f"""WITH tf AS ({SQL_TF}),
a2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
       FROM tf GROUP BY term),
tot AS (SELECT CAST(COALESCE(sum(df), 0) AS BIGINT) AS postings,
               CAST(COALESCE(sum(cf), 0) AS BIGINT) AS tokens FROM a2),
top AS (
  SELECT term, df, cf, row_number() OVER (ORDER BY cf DESC, term ASC) AS rn
  FROM a2 ORDER BY cf DESC, term ASC LIMIT {max(_STOP_CUTS)}),
cuts AS (SELECT unnest([{", ".join(str(k) for k in _STOP_CUTS)}]) AS k)
SELECT CAST(cuts.k AS BIGINT) AS k,
       CAST(count(top.term) AS BIGINT) AS n_cut,
       CAST(COALESCE(sum(top.df), 0) AS BIGINT) AS postings_removed,
       CAST(COALESCE(sum(top.cf), 0) AS BIGINT) AS tokens_removed,
       CASE WHEN (SELECT tokens FROM tot) = 0 THEN 0
            ELSE CAST(round(1000000.0 * COALESCE(sum(top.cf), 0)
                 / (SELECT tokens FROM tot)) AS BIGINT) END AS token_share_q6
FROM cuts LEFT JOIN top ON top.rn <= cuts.k
GROUP BY cuts.k ORDER BY k""",
)
def stopword_cut_impact(spark, sf_dir):
    """Stopword-cut impact curve: postings and token mass removed by
    dropping the top-k collection-frequency terms (k = 2/4/8) — the
    actionable knob on top of df_spectrum's bands (Lucene/ES ship
    stopword lists precisely to cut this mass from the index and from
    every scoring loop; the curve says what each extra cut buys). The
    share column reads directly as index-size savings.

    Scale shape: A2 agg, a TakeOrdered(max k) then ranking over those
    ≤8 rows (the vocab_coverage_curve rule — never a vocab-wide window),
    and a cuts×top theta-join of tiny tables."""
    tf = _toks(_docs(spark, sf_dir)).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    a2 = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf")
    )
    a2 = a2.localCheckpoint()  # feeds totals AND the top-k cut
    tot = a2.agg(
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("postings"),
        F.coalesce(F.sum("cf"), F.lit(0)).cast("long").alias("tokens"),
    )
    top = (
        a2.orderBy(F.desc("cf"), F.asc("term"))
        .limit(max(_STOP_CUTS))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("cf"), F.asc("term"))))
    )
    cuts = spark.createDataFrame([(k,) for k in _STOP_CUTS], "k long")
    return (
        F.broadcast(cuts)
        .join(F.broadcast(top), F.col("rn") <= F.col("k"), "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count("term").cast("long").alias("n_cut"),
            F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("postings_removed"),
            F.coalesce(F.sum("cf"), F.lit(0)).cast("long").alias("tokens_removed"),
            F.expr(
                "CASE WHEN max(tokens) = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * COALESCE(sum(cf), 0) / max(tokens)) AS BIGINT) END"
            ).alias("token_share_q6"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# session 61 — trending terms, weekly seasonal decomposition, Hill tail
# ---------------------------------------------------------------------------


@register(
    "trending_terms",
    f"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
toks AS (
  SELECT doc_id, CAST((doc_id * 10) // n_docs AS BIGINT) AS decile,
         unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents CROSS JOIN nd),
dt AS (SELECT DISTINCT doc_id, decile, term FROM toks),
fg AS (SELECT term, CAST(count(*) AS BIGINT) AS fg_df FROM dt WHERE decile = 9 GROUP BY term),
bg AS (SELECT term, CAST(count(*) AS BIGINT) AS bg_df FROM dt GROUP BY term),
fgn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS ft FROM dt WHERE decile = 9),
sc AS (
  SELECT fg.term, fg.fg_df, bg.bg_df,
         CAST(round(
           ((fg.fg_df / CAST((SELECT ft FROM fgn) AS DOUBLE))
              - (bg.bg_df / CAST((SELECT n_docs FROM nd) AS DOUBLE)))
           * ((fg.fg_df / CAST((SELECT ft FROM fgn) AS DOUBLE))
              / (bg.bg_df / CAST((SELECT n_docs FROM nd) AS DOUBLE)))
           * 1000000) AS BIGINT) AS jlh_q6
  FROM fg JOIN bg USING (term)
  WHERE fg.fg_df >= 3)
SELECT term, fg_df, bg_df, jlh_q6 FROM sc
WHERE jlh_q6 > 0 ORDER BY jlh_q6 DESC, term ASC LIMIT 20""",
)
def trending_terms(spark, sf_dir):
    """Trending-terms detector: significant_terms' JLH heuristic with the
    NEWEST doc_id decile as the foreground and the whole corpus as
    background — 'what is the fresh slice about that the archive is not'
    (ES's significant_terms over a time-filtered query; the emerging-
    topics feed a news/search dashboard runs hourly). On the stationary
    sandbox corpus nothing genuinely trends and the list hugs jlh ≈ 0 —
    that is the correct reading (term_drift_deciles' flat-curve rule).

    Scale shape: the decile key is map-side (1-row count broadcast);
    fg/bg doc-frequency aggs share the distinct (doc, term) exchange;
    the JLH scoring joins vocab-bounded tables; top-20 is a TakeOrdered."""
    nd = _docs(spark, sf_dir).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    dt = (
        _docs(spark, sf_dir)
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.expr("cast((doc_id * 10) div n_docs as bigint)").alias("decile"),
            F.explode(spark_tokens("text")).alias("term"),
        )
        .distinct()
        .localCheckpoint()  # feeds fg, bg AND the foreground size
    )
    fg = dt.where(F.col("decile") == 9).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("fg_df")
    )
    bg = dt.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("bg_df"))
    fgn = dt.where(F.col("decile") == 9).agg(
        F.countDistinct("doc_id").cast("long").alias("ft")
    )
    fg_pct = F.col("fg_df") / F.col("ft").cast("double")
    bg_pct = F.col("bg_df") / F.col("n_docs").cast("double")
    return (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(fgn))
        .crossJoin(F.broadcast(nd))
        .where(F.col("fg_df") >= 3)
        .select(
            "term",
            "fg_df",
            "bg_df",
            _q6((fg_pct - bg_pct) * (fg_pct / bg_pct)).alias("jlh_q6"),
        )
        .where(F.col("jlh_q6") > 0)
        .orderBy(F.desc("jlh_q6"), F.asc("term"))
        .limit(20)
    )


@register(
    "weekly_seasonal_decompose",
    f"""WITH e AS (SELECT epoch_us(ts) // {_US_PER_DAY} AS day FROM events),
dc AS (SELECT day, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY day),
mm AS (SELECT CAST(min(day) AS BIGINT) AS d0, CAST(max(day) AS BIGINT) AS d1 FROM dc),
spine AS (
  SELECT d0 + i AS day, ((d0 + i) + 3) % 7 AS dow
  FROM mm, unnest(generate_series(0, CAST(d1 - d0 AS INT))) AS t(i)),
f AS (
  SELECT spine.day, spine.dow, CAST(COALESCE(dc.cnt, 0) AS BIGINT) AS cnt
  FROM spine LEFT JOIN dc ON dc.day = spine.day),
dw AS (
  SELECT dow, CAST(sum(cnt) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM f GROUP BY dow)
SELECT f.day, CAST(f.dow AS BIGINT) AS dow, f.cnt,
       CAST(round(1000000.0 * dw.s / dw.n) AS BIGINT) AS seasonal_q6,
       CAST(round(1000000.0 * f.cnt - 1000000.0 * dw.s / dw.n) AS BIGINT) AS residual_q6
FROM f JOIN dw USING (dow) ORDER BY f.day""",
)
def weekly_seasonal_decompose(spark, sf_dir):
    """Weekly seasonal decomposition of the daily event count (STL-lite):
    per calendar day, the observed count, the day-of-week seasonal
    component (that weekday's mean over the zero-filled spine) and the
    residual — the de-seasonalized series an anomaly alarm should watch
    (events_daily_anomaly's z-scores fire on weekends without this).
    dow = (day+3) % 7, 0 = Monday (the events_weekday_profile rule —
    never dayname()).

    Determinism: the seasonal mean is ONE float division of two exact
    integers per weekday, q6-rounded; the residual subtracts in q6 space
    so observed = seasonal + residual exactly, by construction.

    Scale shape: calendar-bounded throughout — day counts, a ≤7-row
    weekday table (broadcast), and a spine join."""
    e = _events(spark, sf_dir).select(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}").alias("day")
    )
    dc = e.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    mm = dc.agg(
        F.min("day").cast("long").alias("d0"), F.max("day").cast("long").alias("d1")
    )
    spine = mm.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day")
    ).select("day", F.expr("(day + 3) % 7").alias("dow"))
    f = (
        spine.join(dc, "day", "left")
        .select("day", "dow", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"))
        .localCheckpoint()  # feeds the weekday means AND the output join
    )
    dw = f.groupBy("dow").agg(
        F.sum("cnt").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        f.join(F.broadcast(dw), "dow")
        .select(
            "day",
            F.col("dow").cast("long").alias("dow"),
            "cnt",
            F.expr("CAST(round(1000000.0 * s / n) AS BIGINT)").alias("seasonal_q6"),
            F.expr(
                "CAST(round(1000000.0 * cnt - 1000000.0 * s / n) AS BIGINT)"
            ).alias("residual_q6"),
        )
        .orderBy("day")
    )


_HILL_K = 50


@register(
    "doclen_hill_tail",
    f"""WITH t AS (
  SELECT CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
  FROM documents),
top AS (
  SELECT n_tok, row_number() OVER (ORDER BY n_tok DESC) AS rn
  FROM t WHERE n_tok > 0 ORDER BY n_tok DESC LIMIT {_HILL_K + 1}),
xk AS (SELECT n_tok AS x_k FROM top WHERE rn = {_HILL_K + 1}),
lr AS (
  SELECT CAST(round(1000000 * ln(CAST(top.n_tok AS DOUBLE) / xk.x_k)) AS BIGINT) AS l_q6
  FROM top, xk WHERE top.rn <= {_HILL_K})
SELECT CAST(count(*) AS BIGINT) AS k,
       CAST(COALESCE((SELECT x_k FROM xk), -1) AS BIGINT) AS x_k,
       CAST(COALESCE(sum(l_q6), 0) AS BIGINT) AS sum_log_q6,
       CASE WHEN COALESCE(sum(l_q6), 0) = 0 THEN 0
            ELSE CAST(round(1000000.0 * count(*) / (COALESCE(sum(l_q6), 0) / 1000000.0)) AS BIGINT)
       END AS alpha_q6
FROM lr""",
)
def doclen_hill_tail(spark, sf_dir):
    """Hill estimator of the document-length tail index: α̂ = k / Σ ln(x_i
    / x_(k+1)) over the k = 50 largest documents — the heavy-tail
    exponent that decides executor sizing and straggler risk (a crawl
    with α < 2 has infinite-variance lengths: one partition WILL get a
    monster doc, and maxPartitionBytes must assume it). Complements the
    percentile family (quantiles bound the bulk; Hill characterizes the
    extreme tail the quantile probes never reach).

    Determinism: the order statistics are a TakeOrdered(k+1); ties at
    the boundary don't matter (only VALUES enter the estimator, not
    identities); per-order-statistic ln is q6-rounded FIRST, then one
    scalar expression.

    Scale shape: TakeOrdered(51) over a map-side length projection —
    per-partition top-51 then a driver merge; the ratio math runs over
    51 rows. A corpus with a constant tail (Σ ln = 0) reports α = 0
    sentinel rather than dividing by zero."""
    t = (
        _docs(spark, sf_dir)
        .select(F.size(spark_tokens("text")).cast("long").alias("n_tok"))
        .where(F.col("n_tok") > 0)
    )
    top = (
        t.orderBy(F.desc("n_tok"))
        .limit(_HILL_K + 1)
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("n_tok"))))
        .localCheckpoint()  # feeds the boundary value AND the log rows
    )
    xk = top.where(F.col("rn") == _HILL_K + 1).select(F.col("n_tok").alias("x_k"))
    lr = (
        top.where(F.col("rn") <= _HILL_K)
        .crossJoin(F.broadcast(xk))
        .select(
            F.expr(
                "CAST(round(1000000 * ln(CAST(n_tok AS DOUBLE) / x_k)) AS BIGINT)"
            ).alias("l_q6")
        )
    )
    return (
        lr.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.coalesce(F.sum("l_q6"), F.lit(0)).cast("long").alias("sum_log_q6"),
        )
        .join(F.broadcast(xk), F.lit(True), "left")
        .select(
            "k",
            F.coalesce(F.col("x_k"), F.lit(-1)).cast("long").alias("x_k"),
            "sum_log_q6",
            F.expr(
                "CASE WHEN sum_log_q6 = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * k / (sum_log_q6 / 1000000.0)) AS BIGINT) END"
            ).alias("alpha_q6"),
        )
    )


# ---------------------------------------------------------------------------
# session 62 — lognormal value fit, Burrows' Delta stylometry, char coverage
# ---------------------------------------------------------------------------


@register(
    "value_lognormal_fit",
    """WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
  WHERE CAST(round(value * 100) AS BIGINT) > 0),
l AS (SELECT CAST(round(1000000 * ln(CAST(cents AS DOUBLE))) AS BIGINT) AS l_q6 FROM v),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(COALESCE(sum(l_q6), 0) AS BIGINT) AS sl,
             CAST(COALESCE(sum(l_q6 * l_q6), 0) AS BIGINT) AS sll
      FROM l)
SELECT n,
       CASE WHEN n = 0 THEN 0 ELSE CAST(round(sl / CAST(n AS DOUBLE)) AS BIGINT) END AS mu_q6,
       CASE WHEN n < 2 THEN 0
            ELSE CAST(round((sll / CAST(n AS DOUBLE)
                 - (sl / CAST(n AS DOUBLE)) * (sl / CAST(n AS DOUBLE))) / 1000000.0) AS BIGINT)
       END AS sigma2_q6
FROM s""",
)
def value_lognormal_fit(spark, sf_dir):
    """Method-of-moments lognormal fit of the positive event values:
    μ̂ and σ̂² of ln(cents) — the two parameters a revenue model (LTV
    simulation, price-tier planning) needs, and the distribution-shape
    check behind revenue_pareto_users' whale curve (a lognormal with
    small σ² has no whales; a fat σ² predicts them). Negative/zero
    values are non-revenue events and excluded, declared.

    Determinism: per-event ln(cents) is q6-rounded FIRST (the zipf
    rule — never sum raw libm outputs), the sums are exact BIGINTs, and
    the two moments are single divide-first float expressions (σ² lands
    in q12 and is rescaled to q6 once). Envelope: Σ l_q6² < 2^63 to
    ~4e7 events of cents ≤ 1e9 — beyond that l floors to q3.

    Scale shape: one map-side projection into a 1-row sufficient-stats
    agg."""
    v = (
        _events(spark, sf_dir)
        .select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"))
        .where(F.col("cents") > 0)
    )
    l = v.select(
        F.expr("CAST(round(1000000 * ln(CAST(cents AS DOUBLE))) AS BIGINT)").alias("l_q6")
    )
    s = l.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("l_q6"), F.lit(0)).cast("long").alias("sl"),
        F.coalesce(F.sum(F.expr("l_q6 * l_q6")), F.lit(0)).cast("long").alias("sll"),
    )
    return s.select(
        "n",
        F.expr(
            "CASE WHEN n = 0 THEN 0 ELSE CAST(round(sl / CAST(n AS DOUBLE)) AS BIGINT) END"
        ).alias("mu_q6"),
        F.expr(
            "CASE WHEN n < 2 THEN 0"
            " ELSE CAST(round((sll / CAST(n AS DOUBLE)"
            " - (sl / CAST(n AS DOUBLE)) * (sl / CAST(n AS DOUBLE))) / 1000000.0) AS BIGINT) END"
        ).alias("sigma2_q6"),
    )


_DELTA_M = 8  # number of marker words (top corpus cf)


@register(
    "burrows_delta_sources",
    f"""WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents),
stc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY source, term),
stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM stc GROUP BY source),
cf AS (SELECT term, CAST(sum(c) AS BIGINT) AS cf FROM stc GROUP BY term),
mk AS (SELECT term FROM cf ORDER BY cf DESC, term ASC LIMIT {_DELTA_M}),
f AS (
  SELECT stot.source, mk.term,
         CAST(round(1000000.0 * COALESCE(stc.c, 0) / stot.n) AS BIGINT) AS f_q6
  FROM stot CROSS JOIN mk
  LEFT JOIN stc ON stc.source = stot.source AND stc.term = mk.term),
ms AS (
  SELECT term, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(f_q6) AS BIGINT) AS s, CAST(sum(f_q6 * f_q6) AS BIGINT) AS ss
  FROM f GROUP BY term),
z AS (
  SELECT f.source, f.term,
         CASE WHEN ms.k < 2 OR ms.k * ms.ss = ms.s * ms.s THEN CAST(0 AS BIGINT)
              ELSE CAST(round(1000000 * (f.f_q6 - ms.s / CAST(ms.k AS DOUBLE))
                   / sqrt(ms.ss / CAST(ms.k AS DOUBLE)
                          - (ms.s / CAST(ms.k AS DOUBLE)) * (ms.s / CAST(ms.k AS DOUBLE))))
                   AS BIGINT) END AS z_q6
  FROM f JOIN ms USING (term)),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(round(avg(abs(a.z_q6 - b.z_q6))) AS BIGINT) AS delta_q6
  FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT src_a, src_b, delta_q6 FROM pairs ORDER BY src_a, src_b""",
)
def burrows_delta_sources(spark, sf_dir):
    """Burrows' Delta between sources — the STYLOMETRIC distance (the
    authorship-attribution standard): z-scores of the top-8
    corpus-frequency marker words' relative frequencies across sources,
    Delta = mean |z_a − z_b| per source pair. The third axis of the
    source-similarity family: JSD sees vocabulary, centroids see topics,
    Delta sees FUNCTION-WORD STYLE (two mirrors of one crawl match on
    all three; a paraphrase mirror matches centroids but not Delta).

    Determinism: per-(source, marker) relative frequency q6-rounds
    FIRST; marker means/stds come from exact BIGINT sufficient stats
    with the degenerate-variance guard (the ttest rule); z quantizes to
    q6 before the pair averages; |z| differences of integers make the
    final avg a single float division.

    Scale shape: the (source, term) agg is the unigram-LM table; markers
    are a TakeOrdered(8); the spine is |sources|×8 rows; the pair join
    fans |sources|² per marker. Nothing corpus-sized shuffles twice."""
    stc = (
        _docs(spark, sf_dir)
        .select("source", F.explode(spark_tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()  # feeds totals, marker ranking AND the spine probe
    )
    stot = stc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    cf = stc.groupBy("term").agg(F.sum("c").cast("long").alias("cf"))
    mk = cf.orderBy(F.desc("cf"), F.asc("term")).limit(_DELTA_M).select("term")
    f = (
        stot.crossJoin(F.broadcast(mk))
        .join(stc, ["source", "term"], "left")
        .select(
            "source",
            "term",
            F.expr("CAST(round(1000000.0 * COALESCE(c, 0) / n) AS BIGINT)").alias("f_q6"),
        )
        .localCheckpoint()  # feeds the marker stats AND the z table
    )
    ms = f.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("f_q6").cast("long").alias("s"),
        F.sum(F.expr("f_q6 * f_q6")).cast("long").alias("ss"),
    )
    z = f.join(F.broadcast(ms), "term").select(
        "source",
        "term",
        F.expr(
            "CASE WHEN k < 2 OR k * ss = s * s THEN CAST(0 AS BIGINT)"
            " ELSE CAST(round(1000000 * (f_q6 - s / CAST(k AS DOUBLE))"
            " / sqrt(ss / CAST(k AS DOUBLE)"
            " - (s / CAST(k AS DOUBLE)) * (s / CAST(k AS DOUBLE)))) AS BIGINT) END"
        ).alias("z_q6"),
    )
    a = z.select(F.col("source").alias("src_a"), "term", F.col("z_q6").alias("za"))
    b = z.select(F.col("source").alias("src_b"), "term", F.col("z_q6").alias("zb"))
    return (
        a.join(b, "term")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.avg(F.abs(F.col("za") - F.col("zb")))).cast("long").alias("delta_q6"))
        .orderBy("src_a", "src_b")
    )


_CHAR_COV_KS = [4, 8, 16, 32]


@register(
    "char_coverage_curve",
    f"""WITH ch AS (
  SELECT unnest(str_split(lower(text), '')) AS c FROM documents WHERE length(text) > 0),
cc AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY c),
tot AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS t FROM cc),
top AS (
  SELECT c, n, row_number() OVER (ORDER BY n DESC, c ASC) AS rn
  FROM cc ORDER BY n DESC, c ASC LIMIT {max(_CHAR_COV_KS)}),
ks AS (SELECT unnest([{", ".join(str(k) for k in _CHAR_COV_KS)}]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(count(top.c) AS BIGINT) AS n_chars,
       CAST(COALESCE(sum(top.n), 0) AS BIGINT) AS chars_covered,
       CASE WHEN (SELECT t FROM tot) = 0 THEN 0
            ELSE CAST(round(1000000.0 * COALESCE(sum(top.n), 0)
                 / (SELECT t FROM tot)) AS BIGINT) END AS coverage_q6
FROM ks LEFT JOIN top ON top.rn <= ks.k
GROUP BY ks.k ORDER BY k""",
)
def char_coverage_curve(spark, sf_dir):
    """Character-coverage curve: share of the corpus's character stream
    covered by the top-4/8/16/32 characters — SentencePiece's
    ``character_coverage`` knob measured on the actual data (0.9995 for
    multilingual, 1.0 for ASCII corpora; the curve says which, and how
    big the byte-fallback alphabet must be). vocab_coverage_curve's
    sibling one level down the tokenizer stack.

    Scale shape: a map-side char explode into an alphabet-sized agg, a
    TakeOrdered(32) then ranking over 32 rows, and a cuts theta-join —
    the stopword_cut_impact plan at character granularity."""
    ch = (
        _docs(spark, sf_dir)
        .where(F.length("text") > 0)
        .select(F.explode(F.split(F.lower("text"), "")).alias("c"))
        .where(F.col("c") != "")
    )
    cc = ch.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cc = cc.localCheckpoint()  # feeds the total AND the top cut
    tot = cc.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("t"))
    top = (
        cc.orderBy(F.desc("n"), F.asc("c"))
        .limit(max(_CHAR_COV_KS))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("c"))))
    )
    ks = spark.createDataFrame([(k,) for k in _CHAR_COV_KS], "k long")
    return (
        F.broadcast(ks)
        .join(F.broadcast(top), F.col("rn") <= F.col("k"), "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count("c").cast("long").alias("n_chars"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("chars_covered"),
            F.expr(
                "CASE WHEN max(t) = 0 THEN 0"
                " ELSE CAST(round(1000000.0 * COALESCE(sum(n), 0) / max(t)) AS BIGINT) END"
            ).alias("coverage_q6"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# session 63 — PPMI query expansion, quality×dup census, sweep-line backlog
# ---------------------------------------------------------------------------


@register(
    "ppmi_query_expansion",
    f"""WITH w AS ({SQL_WORDS}),
p AS (
  SELECT least(words[i], words[i+1]) AS a, greatest(words[i], words[i+1]) AS b, 2 AS wt
  FROM w, unnest(generate_series(1, len(words) - 1)) AS t1(i) WHERE len(words) >= 2
  UNION ALL
  SELECT least(words[i], words[i+2]), greatest(words[i], words[i+2]), 1
  FROM w, unnest(generate_series(1, len(words) - 2)) AS t2(i) WHERE len(words) >= 3),
pc AS (SELECT a, b, CAST(sum(wt) AS BIGINT) AS w_ab FROM p GROUP BY a, b),
uc AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM ({SQL_TOKS}) GROUP BY term),
tot AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM uc) AS n_tok,
               (SELECT CAST(sum(w_ab) AS BIGINT) FROM pc) AS w_tot),
q AS (SELECT unnest([{", ".join(repr(t) for t in _TOPK_TERMS)}]) AS qt),
nb AS (
  SELECT q.qt, CASE WHEN pc.a = q.qt THEN pc.b ELSE pc.a END AS neighbor, pc.w_ab,
         {_PPMI_EXPR} AS ppmi_q6
  FROM q JOIN pc ON pc.a = q.qt OR pc.b = q.qt
  JOIN (SELECT term, n AS n_a FROM uc) ua ON ua.term = pc.a
  JOIN (SELECT term, n AS n_b FROM uc) ub ON ub.term = pc.b
  CROSS JOIN tot
  WHERE pc.w_ab >= {_TCC_MIN_W}),
rk AS (
  SELECT qt, neighbor, w_ab, ppmi_q6,
         row_number() OVER (PARTITION BY qt
                            ORDER BY ppmi_q6 DESC, neighbor ASC) AS rn
  FROM nb WHERE ppmi_q6 > 0)
SELECT qt, neighbor, w_ab, ppmi_q6, CAST(rn AS BIGINT) AS rank
FROM rk WHERE rn <= 3 ORDER BY qt, rank""",
)
def ppmi_query_expansion(spark, sf_dir):
    """Corpus-driven query expansion: for each query term, its top-3
    positive-PPMI co-occurrence neighbors — the thesaurus the
    distributional family (cooccurrence_ppmi, term_cluster_cc) exists to
    feed BACK into search (prf_rocchio_expand expands from relevant
    DOCS; this expands from corpus STATISTICS and needs no first
    retrieval pass — ES's 'related terms' suggestion).

    Scale shape: the pair table is the Zipf-bounded PPMI co-occurrence
    agg; the query probe is a ≤|Q|-row broadcast against it (the OR-key
    join touches a query term's own pair rows only); per-query ranking
    windows over candidate-bounded rows."""
    wdf = _docs(spark, sf_dir).select(spark_tokens("text").alias("words"))
    p1 = wdf.where(F.size("words") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(words)-2), i -> "
                "struct(least(words[i], words[i+1]) AS a,"
                " greatest(words[i], words[i+1]) AS b, 2 AS wt))"
            )
        ).alias("t")
    )
    p2 = wdf.where(F.size("words") >= 3).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(words)-3), i -> "
                "struct(least(words[i], words[i+2]) AS a,"
                " greatest(words[i], words[i+2]) AS b, 1 AS wt))"
            )
        ).alias("t")
    )
    pc = (
        p1.unionByName(p2)
        .select("t.a", "t.b", "t.wt")
        .groupBy("a", "b")
        .agg(F.sum("wt").cast("long").alias("w_ab"))
        .localCheckpoint()  # w_tot must see the UNFILTERED pair mass
    )
    uc = (
        _toks(_docs(spark, sf_dir))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    tot = uc.agg(F.sum("n").cast("long").alias("n_tok")).crossJoin(
        pc.agg(F.sum("w_ab").cast("long").alias("w_tot"))
    )
    q = F.broadcast(
        spark.createDataFrame([(t,) for t in _TOPK_TERMS], "qt string")
    )
    ua = uc.select(F.col("term").alias("a"), F.col("n").alias("n_a"))
    ub = uc.select(F.col("term").alias("b"), F.col("n").alias("n_b"))
    nb = (
        q.join(
            pc.where(F.col("w_ab") >= _TCC_MIN_W),
            (F.col("a") == F.col("qt")) | (F.col("b") == F.col("qt")),
        )
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "qt",
            F.expr("CASE WHEN a = qt THEN b ELSE a END").alias("neighbor"),
            "w_ab",
            F.expr(_PPMI_EXPR).alias("ppmi_q6"),
        )
        .where(F.col("ppmi_q6") > 0)
    )
    wq = Window.partitionBy("qt").orderBy(F.desc("ppmi_q6"), F.asc("neighbor"))
    return (
        nb.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 3)
        .select("qt", "neighbor", "w_ab", "ppmi_q6", F.col("rn").cast("long").alias("rank"))
        .orderBy("qt", "rank")
    )


@register(
    "quality_dup_census",
    _SQL_LSH_PAIRS
    + f""",
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
dup AS (SELECT DISTINCT src AS doc_id FROM edges),
t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_distinct
  FROM documents),
b AS (
  SELECT t.doc_id, t.n_tok,
         CASE WHEN t.n_tok = 0 THEN CAST(-1 AS BIGINT)
              ELSE LEAST(CAST(4 AS BIGINT),
                   (CAST(round(1000000.0 * t.n_distinct / t.n_tok) AS BIGINT) * 5) // 1000000)
         END AS q_bucket,
         CAST(dup.doc_id IS NOT NULL AS INT) AS is_dup
  FROM t LEFT JOIN dup ON dup.doc_id = t.doc_id)
SELECT q_bucket, CAST(is_dup AS BIGINT) AS is_dup,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS n_tokens
FROM b GROUP BY q_bucket, is_dup ORDER BY q_bucket, is_dup""",
)
def quality_dup_census(spark, sf_dir):
    """Quality × near-duplication interaction census: TTR quintile
    (len_quality_hist2d's bucket) crossed with LSH-candidate membership
    — 'are my duplicates concentrated in the low-quality band?' If yes,
    the quality gate already removes most dup mass and the dedup pass
    can run lighter; if the dup mass sits in HIGH-quality bins
    (boilerplate-free mirrors), dedup must run first. The gate-ORDERING
    decision behind pipeline_waterfall's fixed sequence, made with data.

    Scale shape: dup membership reuses the memoized LSH edge graph
    (node list, cluster-bounded); quality keys are map-side; the census
    is ≤12 cells."""
    edges = _lsh_pair_edges(spark, sf_dir)
    dup = edges.select(F.col("src").alias("doc_id")).distinct()
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(spark_tokens("text")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(spark_tokens("text"))).cast("long").alias("n_distinct"),
    )
    b = t.join(dup.withColumn("d", F.lit(1)), "doc_id", "left").select(
        "n_tok",
        F.expr(
            "CASE WHEN n_tok = 0 THEN CAST(-1 AS BIGINT)"
            " ELSE LEAST(CAST(4 AS BIGINT),"
            " (CAST(round(1000000.0 * n_distinct / n_tok) AS BIGINT) * 5) div 1000000)"
            " END"
        ).alias("q_bucket"),
        F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("is_dup"),
    )
    return (
        b.groupBy("q_bucket", "is_dup")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        )
        .orderBy("q_bucket", "is_dup")
    )


_BACKLOG_STRIDE = 30  # sample the backlog curve every 30 days


@register(
    "open_lineitems_timeseries",
    f"""WITH li AS (
  SELECT epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // {_US_PER_DAY} AS od,
         epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // {_US_PER_DAY} AS sd
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
delta AS (
  SELECT od AS day, CAST(1 AS BIGINT) AS d FROM li
  UNION ALL SELECT sd, CAST(-1 AS BIGINT) FROM li),
dd AS (SELECT day, CAST(sum(d) AS BIGINT) AS d FROM delta GROUP BY day),
c AS (
  SELECT day, CAST(SUM(d) OVER (ORDER BY day) AS BIGINT) AS backlog
  FROM dd),
mm AS (SELECT CAST(min(day) AS BIGINT) AS d0 FROM dd)
SELECT c.day, c.backlog
FROM c, mm WHERE (c.day - mm.d0) % {_BACKLOG_STRIDE} = 0
ORDER BY c.day""",
)
def open_lineitems_timeseries(spark, sf_dir):
    """Order-backlog time series by SWEEP-LINE: lineitems ordered but not
    yet shipped on day d (orderdate ≤ d < shipdate), computed as +1/−1
    deltas at the boundary days with a cumulative sum — the classic
    interval-stabbing decomposition that replaces the quadratic
    'spine × intervals BETWEEN join' with two map-side rows per interval
    (at 100 TB the range join fans |days|×|lineitems|; the sweep is
    2 rows per lineitem, then a DELTA-DAY-bounded window). Sampled every
    30 days at delta days (the curve only changes there).

    Determinism: all-integer day keys (epoch_us division, the TPC-H date
    rule) and exact delta sums.

    Scale shape: one orderkey join, a map-side delta union, a day-keyed
    agg (≤|calendar| rows) and a cumulative window over those rows."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
            ),
            "l_orderkey",
        )
        .select(
            F.expr(
                f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_PER_DAY}"
            ).alias("od"),
            F.expr(
                f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_US_PER_DAY}"
            ).alias("sd"),
        )
    )
    delta = li.select(F.col("od").alias("day"), F.lit(1).cast("long").alias("d")).unionByName(
        li.select(F.col("sd").alias("day"), F.lit(-1).cast("long").alias("d"))
    )
    dd = delta.groupBy("day").agg(F.sum("d").cast("long").alias("d"))
    dd = dd.localCheckpoint()  # feeds the min-day AND the cumulative window
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = dd.select("day", F.sum("d").over(w).cast("long").alias("backlog"))
    mm = dd.agg(F.min("day").cast("long").alias("d0"))
    return (
        c.crossJoin(F.broadcast(mm))
        .where(F.expr(f"(day - d0) % {_BACKLOG_STRIDE} = 0"))
        .select("day", "backlog")
        .orderBy("day")
    )
