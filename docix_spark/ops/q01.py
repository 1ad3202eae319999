"""driver_queries chunk q01 (original lines 3487-6958): pack_sequences, pack_sequences_fine, pack_sequences_split, events_windowed, ... cross_fields_search (66 ops).

Linearized continuation of docix_spark.ops.q00 — see
docix_spark/ops/_chain.py for the namespace-inheritance contract.
"""

from __future__ import annotations

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q00")

@register(
    "pack_sequences",
    f"""WITH w AS ({SQL_WORDS}),
    t AS (SELECT doc_id, source, CAST(len(words) AS BIGINT) AS n_tok FROM w),
    p AS (
      SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT source,
           CAST(cum_before // 2048 AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM p GROUP BY source, bin_id ORDER BY source, bin_id""",
)
def pack_sequences(spark, sf_dir, n_shards: int = 64, bin_tokens: int = 2048):
    """Sequence packing for pretraining: concatenate each source's docs in
    doc_id order and assign each doc to the 2048-token bin of its STARTING
    cumulative offset (start-offset bin assignment: a doc spanning a bin
    boundary is not split, so a bin's token fill can exceed 2048 by up to
    one doc's tail -- the per-(source, bin) doc/token counts returned here
    are the packing manifest, not padded tensors); returns per-(source,
    bin) doc/token counts. For the GPT-style variant that DOES split
    boundary-crossing docs across bins, see :func:`pack_sequences_split`.

    Spark plan: the distributed two-pass sub-sharded prefix sum of
    :func:`_pack_cum_before` (VERDICT r3 ask #1; see its docstring -- no
    whole-source sort ever lands on one reducer), then one small
    per-(source, bin) rollup.
    """
    p = _pack_cum_before(spark, sf_dir, n_shards)
    if p is None:
        return spark.createDataFrame(
            [], "source string, bin_id long, n_docs long, n_tokens long"
        )
    return (
        p.groupBy(
            "source",
            F.floor(F.col("cum_before") / F.lit(bin_tokens)).cast("long").alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@register(
    "pack_sequences_fine",
    f"""WITH w AS ({SQL_WORDS}),
    t AS (SELECT doc_id, source, CAST(len(words) AS BIGINT) AS n_tok FROM w),
    p AS (
      SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT source,
           CAST(cum_before // 256 AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM p GROUP BY source, bin_id ORDER BY source, bin_id""",
)
def pack_sequences_fine(spark, sf_dir):
    """256-token-bin variant of :func:`pack_sequences`, registered so the
    driver's oracle actually EXERCISES bin boundaries: at the 2048 default
    every sandbox source fits inside bin 0 (≈1.4k tokens/source at
    sf=0.01) and a wrong cumulative offset would be invisible to the hash
    compare — at 256 every source spans ~6 bins and any error in the
    sub-sharded prefix sum shifts a boundary. Same distributed plan."""
    return pack_sequences(spark, sf_dir, bin_tokens=256)


@register(
    "pack_sequences_split",
    f"""WITH w AS ({SQL_WORDS}),
    t AS (SELECT doc_id, source, CAST(len(words) AS BIGINT) AS n_tok FROM w),
    p AS (
      SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    ),
    s AS (
      SELECT source, doc_id, n_tok, cum_before,
             unnest(generate_series(CAST(cum_before // 256 AS BIGINT),
                                    CAST((cum_before + n_tok - 1) // 256 AS BIGINT))) AS bin_id
      FROM p WHERE n_tok >= 1
    )
    SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(cum_before + n_tok, (bin_id + 1) * 256)
                    - greatest(cum_before, bin_id * 256)) AS BIGINT) AS n_tokens
    FROM s GROUP BY source, bin_id ORDER BY source, bin_id""",
)
def pack_sequences_split(spark, sf_dir, n_shards: int = 64, bin_tokens: int = 256):
    """GPT-style sequence packing WITH boundary splitting: each source's
    docs are concatenated in doc_id order into a token stream that is cut
    into fixed 256-token bins; a doc whose token interval crosses a bin
    boundary contributes its per-bin token SHARE to every bin it touches
    (unlike :func:`pack_sequences`, whose start-offset assignment leaves
    bin fill unbounded — the distinction ADVICE r4 #4 asked to make
    explicit). Every interior bin's n_tokens is exactly the bin size;
    only each source's final bin is short — the padded-tensor-exact
    packing manifest.

    Spark plan: the same distributed two-pass prefix sum
    (:func:`_pack_cum_before`), then a map-side explode of
    ``sequence(first_bin, last_bin)`` — a doc expands to one row per bin
    it touches (len/bin_tokens + 1 rows at most, so the explode is
    output-proportional, never quadratic), and the share arithmetic is
    pure integer column math. One small per-(source, bin) rollup ends the
    plan. ``n_tok >= 1`` guards Spark's sequence() from a negative range
    (empty docs occupy no bins; their zero length can't shift anyone's
    cumulative offset either).
    """
    p = _pack_cum_before(spark, sf_dir, n_shards)
    if p is None:
        return spark.createDataFrame(
            [], "source string, bin_id long, n_docs long, n_tokens long"
        )
    B = F.lit(bin_tokens)
    spans = (
        p.where(F.col("n_tok") >= 1)
        .withColumn(
            "bin_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("cum_before") / B).cast("long"),
                    F.floor((F.col("cum_before") + F.col("n_tok") - 1) / B).cast("long"),
                )
            ),
        )
        .withColumn(
            "share",
            F.least(F.col("cum_before") + F.col("n_tok"), (F.col("bin_id") + 1) * B)
            - F.greatest(F.col("cum_before"), F.col("bin_id") * B),
        )
    )
    return (
        spans.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("share").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "bin_id")
    )


# ---------------------------------------------------------------------------
# Event-stream analytics (batch twins of docix_spark.streaming.events;
# the streaming paths — watermarked windows, applyInPandasWithState
# sessionization — are verified equal to these twins in
# tests/test_events_streaming.py)
# ---------------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@register(
    "events_windowed",
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
              event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
)
def events_windowed(spark, sf_dir):
    """Tumbling 1-hour window aggregation per event_type — the batch twin
    of the watermarked streaming window (streaming/events.py)."""
    from docix_spark.streaming.events import windowed_counts

    return windowed_counts(_events(spark, sf_dir))


@register(
    "events_sessionize",
    """WITH e AS (SELECT user_id, epoch(ts) AS t FROM events),
       m AS (
         SELECT user_id, t,
                CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                       OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
                     THEN 1 ELSE 0 END AS ns
         FROM e
       ),
       s AS (
         SELECT user_id, t,
                sum(ns) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sess
         FROM m
       )
       SELECT user_id, CAST(floor(min(t)) AS BIGINT) AS session_start_epoch,
              CAST(count(*) AS BIGINT) AS n_events
       FROM s GROUP BY user_id, sess ORDER BY user_id, session_start_epoch""",
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) — the batch twin of
    the applyInPandasWithState stateful operator (streaming/events.py)."""
    from docix_spark.streaming.events import sessionize

    return sessionize(_events(spark, sf_dir))


@register(
    "events_props_json",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
              CAST(round(1000000.0 * avg(CAST(json_extract_string(props, '$.k') AS BIGINT))) AS BIGINT) AS k_avg_q6
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def events_props_json(spark, sf_dir):
    """JSON payload handling on the props column (get_json_object vs
    json_extract) — per-event_type stats."""
    from docix_spark.streaming.events import props_json_stats

    return props_json_stats(_events(spark, sf_dir))


@register(
    "events_funnel",
    """WITH v AS (
         SELECT user_id, min(ts) AS t1 FROM events
         WHERE event_type = 'view' GROUP BY user_id
       ),
       c AS (
         SELECT e.user_id, min(e.ts) AS t2 FROM events e
         JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
         WHERE e.event_type = 'click' GROUP BY e.user_id
       ),
       p AS (
         SELECT e.user_id, min(e.ts) AS t3 FROM events e
         JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
         WHERE e.event_type = 'purchase' GROUP BY e.user_id
       )
       SELECT * FROM (
         SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM v
         UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
         UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p
       ) ORDER BY step""",
)
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel over the event stream: users with a
    view, users with a click STRICTLY AFTER their first view, users with
    a purchase strictly after that first qualifying click — the product-
    analytics query every event pipeline serves (order matters: a click
    before any view must not count, which is why this is three dependent
    min-aggregations, not one pivot).

    Spark plan: each stage is a user_id groupBy-min joined against the
    previous stage's one-row-per-user table — three passes over events,
    each filtered map-side by event_type (the pushed-down type filter is
    what keeps the passes cheap: purchase events ≪ all events). The
    stage joins are deliberately un-hinted: user cardinality is NOT
    bounded, so AQE broadcasts a small previous stage and falls back to a
    user_id shuffle join at billion-user scale — where all three stage
    joins and groupBys share the same user_id partitioning, so the
    exchanges are reused, never events-sized.
    """
    e = _events(spark, sf_dir)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    def _step(df, n, name):
        return df.agg(
            F.lit(n).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    return (
        _step(v, 1, "view")
        .unionByName(_step(c, 2, "click"))
        .unionByName(_step(p, 3, "purchase"))
        .orderBy("step")
    )


# The driver text is clean prose, so the scrub operator is exercised by
# deterministically injecting URLs/emails first (same rewrite both engines)
# — mirroring the unicode_tokens approach.
_SCRUB_INJECT_SQL = (
    "replace(replace(text, 'spark', 'see http://example.com/spark?q=1 now'), "
    "'window', 'mail win@example.com here')"
)
_URL_RE = r"https?://[^\s]+"
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"


@register(
    "text_scrub",
    f"""WITH d AS (SELECT doc_id, {_SCRUB_INJECT_SQL} AS t FROM documents),
        s AS (
          SELECT doc_id, t,
                 regexp_replace(regexp_replace(t, '{_URL_RE}', '<URL>', 'g'),
                                '{_EMAIL_RE}', '<EMAIL>', 'g') AS clean
          FROM d
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_URL_RE}')) AS BIGINT) AS n_urls,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(strlen(clean) AS BIGINT) AS clean_len
        FROM s ORDER BY doc_id""",
)
def text_scrub(spark, sf_dir):
    """Training-pipeline scrubbing: URL/email detection + placeholder
    replacement (the PII/link-stripping pass), counts + cleaned length
    oracle-checked; JVM-side regexp only."""
    d = _docs(spark, sf_dir).select("doc_id", F.expr(_SCRUB_INJECT_SQL).alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), _URL_RE, "<URL>"), _EMAIL_RE, "<EMAIL>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_URL_RE), 0)).cast("long").alias("n_urls"),
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.octet_length(clean).cast("long").alias("clean_len"),
    ).orderBy("doc_id")


@register(
    "repetition_ratio",
    f"""WITH w AS ({SQL_WORDS}),
        g AS (
          SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sh
          FROM w, unnest(generate_series(1, len(words) - 2)) AS t(i)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(round(1000000.0 * (count(*) - count(DISTINCT sh)) / count(*)) AS BIGINT) AS dup_ratio_q6
        FROM g GROUP BY doc_id ORDER BY doc_id""",
)
def repetition_ratio(spark, sf_dir):
    """Gopher-style repetition filter input: fraction of duplicate
    3-gram occurrences per doc (1 - distinct/total) — the classic
    boilerplate/loop-spam detector for training corpora."""
    d = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words"))
    g = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(words)-3), i -> concat_ws(' ', words[i], words[i+1], words[i+2]))")
        ).alias("sh"),
    )
    return (
        g.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            _q6((F.count("*") - F.countDistinct("sh")) / F.count("*")).alias("dup_ratio_q6"),
        )
        .orderBy("doc_id")
    )


@register(
    "quality_filter_flags",
    f"""WITH t AS ({SQL_TOKS}),
        m AS (
          SELECT doc_id, count(*) AS n_tokens,
                 avg(length(term)) AS mean_len,
                 count(*) FILTER (term IN ('the','a','of','to','is')) AS stop_hits
          FROM t GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END AS BIGINT) AS flag_too_short,
               CAST(CASE WHEN mean_len < 2.0 OR mean_len > 12.0 THEN 1 ELSE 0 END AS BIGINT) AS flag_token_len,
               CAST(CASE WHEN stop_hits = 0 THEN 1 ELSE 0 END AS BIGINT) AS flag_no_stopwords,
               CAST(CASE WHEN n_tokens >= 20 AND mean_len >= 2.0 AND mean_len <= 12.0
                          AND stop_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS admitted
        FROM m ORDER BY doc_id""",
)
def quality_filter_flags(spark, sf_dir):
    """The actual admission FILTER a pipeline runs from the quality
    features (Gopher-rule shape): min length, mean-token-length band,
    stopword presence — flags + the combined admit decision per doc."""
    t = _toks(_docs(spark, sf_dir))
    stop_hit = F.when(F.col("term").isin("the", "a", "of", "to", "is"), 1).otherwise(0)
    m = t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.avg(F.length("term")).alias("mean_len"),
        F.sum(stop_hit).alias("stop_hits"),
    )
    admitted = (
        (F.col("n_tokens") >= 20)
        & (F.col("mean_len") >= 2.0)
        & (F.col("mean_len") <= 12.0)
        & (F.col("stop_hits") > 0)
    )
    return m.select(
        "doc_id",
        F.when(F.col("n_tokens") < 20, 1).otherwise(0).cast("long").alias("flag_too_short"),
        F.when((F.col("mean_len") < 2.0) | (F.col("mean_len") > 12.0), 1).otherwise(0).cast("long").alias("flag_token_len"),
        F.when(F.col("stop_hits") == 0, 1).otherwise(0).cast("long").alias("flag_no_stopwords"),
        F.when(admitted, 1).otherwise(0).cast("long").alias("admitted"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# M3/M5 — compressed-segment WAND serving path + snippet fallback (F7)
# ---------------------------------------------------------------------------


def _cached_seg_index(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir per process) the full engine index + compressed
    segments over the driver documents table, for the serving-path queries."""
    import hashlib as _h
    import os
    import tempfile

    from docix_spark.corpus import from_driver_documents
    from docix_spark.index.build import Index, build_index
    from docix_spark.index.segments import SegmentIndex, build_segments

    from docix_spark.index.segments import SEGMENT_SCHEMA

    # cache key covers the segment schema AND the tokenizer pattern so a
    # stale layout or stale analysis never survives an engine upgrade
    key = _h.sha256(f"{sf_dir}|{SEGMENT_SCHEMA}|{TOKEN_PATTERN}".encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"docix_dq_idx_{key}")
    marker = os.path.join(root, "seg_meta.json")
    if not os.path.exists(marker):
        corpus = from_driver_documents(spark, sf_dir)
        index = build_index(spark, corpus, root, n_buckets=16)
        build_segments(spark, index, docs_per_shard=1 << 12)
    else:
        index = Index(root=root, n_buckets=16)
    return index, SegmentIndex.load(root)


_WAND_SQL = f"""
WITH tf AS ({SQL_TF}),
dl AS ({SQL_DL}),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
q AS (SELECT unnest(['spark', 'hash', 'join']) AS term),
per AS (
  SELECT tf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st))) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id)
)
SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6
FROM per GROUP BY doc_id
ORDER BY score_q6 DESC, doc_id ASC LIMIT 10
"""


@register("wand_segments_topk", _WAND_SQL)
def wand_segments_topk(spark, sf_dir):
    """M3/M5 serving path end-to-end: compressed varint segments + block-max
    (MaxScore) pruning, rank-identical to the plain BM25 oracle. The engine's
    content-sha doc_id is mapped back to the driver's numeric doc_id through
    the synthesized path (docs/<source>/doc_<id>.txt)."""
    from docix_spark.query.wand import wand_topk

    index, seg = _cached_seg_index(spark, sf_dir)
    top = wand_topk(spark, index, seg, ["spark", "hash", "join"], k=10)
    meta = index.docs(spark).select(
        F.col("doc_id"),
        F.regexp_extract("path", r"doc_(\d+)\.txt", 1).cast("long").alias("orig_id"),
    )
    return (
        top.join(meta, "doc_id")
        .select(F.col("orig_id").alias("doc_id"), _q6(F.col("score")).alias("score_q6"))
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
    )


def _composite_sql(query_terms: list[tuple[str, int]], msm: int, qstr: str, k: int) -> str:
    """Full composite query tree (best_fields 5/3/3 + fuzzy AUTO capped at
    50 by (df desc, term asc) + msm + constant-score wildcard fallback) as
    one DuckDB statement over the documents table with the engine's
    synthesized filename fields — the independent oracle for the REAL
    engine search path (reference SearchAdapter.java:394-440)."""
    vals = ", ".join(f"('{t}', {me}, 1.0)" for t, me in query_terms)
    return f"""
WITH d AS (
  SELECT doc_id,
         text AS content,
         'docs/' || source || '/doc_' || doc_id || '.txt' AS file_name,
         'doc_' || doc_id || '.txt' AS original_file_name
  FROM documents
),
fields AS (
  SELECT doc_id, 'content' AS field, content AS val FROM d
  UNION ALL SELECT doc_id, 'file_name', file_name FROM d
  UNION ALL SELECT doc_id, 'original_file_name', original_file_name FROM d
),
toks AS (
  SELECT field, doc_id, unnest(regexp_extract_all(lower(val), '{TOKEN_PATTERN}')) AS term
  FROM fields
),
tf AS (SELECT field, doc_id, term, count(*) AS tf FROM toks GROUP BY ALL),
dl AS (SELECT field, doc_id, count(*) AS doc_len FROM toks GROUP BY ALL),
st AS (SELECT field, CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl GROUP BY field),
dfs AS (SELECT field, term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY ALL),
dict AS (SELECT term, max(df) AS df FROM dfs GROUP BY term),
q(qt, max_edits, qcount) AS (VALUES {vals}),
fuzz AS (
  SELECT qt, term, qcount,
         1.0 - levenshtein(qt, term) * 1.0 / least(strlen(qt), strlen(term)) AS fboost,
         row_number() OVER (PARTITION BY qt ORDER BY df DESC, term ASC) AS rn
  FROM q JOIN dict ON abs(strlen(term) - strlen(qt)) <= q.max_edits
                  AND levenshtein(qt, term) BETWEEN 1 AND q.max_edits
),
exp AS (
  SELECT qt, qt AS term, qcount, 1.0 AS fboost FROM q
  UNION ALL
  SELECT qt, term, qcount, fboost FROM fuzz WHERE rn <= 50
),
per AS (
  SELECT tf.field, tf.doc_id, e.qt, e.qcount,
         e.qcount * e.fboost
           * ln(1.0 + (st.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / st.avgdl)) AS s
  FROM tf
  JOIN exp e ON tf.term = e.term
  JOIN dfs ON dfs.field = tf.field AND dfs.term = tf.term
  JOIN dl ON dl.field = tf.field AND dl.doc_id = tf.doc_id
  JOIN st ON st.field = tf.field
),
per_qt AS (
  SELECT field, doc_id, qt, sum(s) AS qt_score, any_value(qcount) AS qcount
  FROM per GROUP BY ALL
),
per_field AS (
  SELECT field, doc_id, sum(qt_score) AS fscore, sum(qcount) AS n_matched
  FROM per_qt GROUP BY ALL
),
best AS (
  SELECT doc_id,
         max(fscore * CASE field WHEN 'content' THEN 5.0 ELSE 3.0 END) AS best_score
  FROM per_field WHERE n_matched >= {msm}
  GROUP BY doc_id
),
fb AS (
  SELECT doc_id,
         -- literal substring test via contains(): the engine uses
         -- Column.contains (no wildcards), while LIKE would treat '_'/'%'
         -- in the query (e.g. 'doc_42') as pattern metacharacters
         (CASE WHEN contains(lower(content), '{qstr}') THEN 1.0 ELSE 0.0 END)
       + (CASE WHEN contains(lower(file_name), '{qstr}') THEN 2.0 ELSE 0.0 END)
       + (CASE WHEN contains(lower(original_file_name), '{qstr}') THEN 2.0 ELSE 0.0 END) AS fb_score
  FROM d
),
scored AS (
  SELECT coalesce(b.doc_id, f.doc_id) AS doc_id,
         coalesce(b.best_score, 0) + coalesce(f.fb_score, 0) AS score
  FROM best b FULL OUTER JOIN (SELECT * FROM fb WHERE fb_score > 0) f USING (doc_id)
)
-- top-k selection tiebreaks on the CONTENT-SHA id, exactly the engine's
-- doc_id (and the reference's ES _id asc, SearchAdapter.java:448-449)
SELECT s.doc_id, CAST(round(s.score * 1000000) AS BIGINT) AS score_q6
FROM scored s JOIN d ON s.doc_id = d.doc_id
ORDER BY s.score DESC, sha256(d.content) ASC LIMIT {k}
"""


def _composite_engine(spark, sf_dir, query: str) -> DataFrame:
    """Run the REAL engine search path (index tables + fuzzy expansion +
    msm + wildcard gate) and map content-sha doc_ids back to driver ids."""
    from docix_spark.query.bm25 import search_topk

    index, _ = _cached_seg_index(spark, sf_dir)
    top = search_topk(spark, index, query, size=10, with_metadata=False)
    meta = index.docs(spark).select(
        F.col("doc_id"),
        F.regexp_extract("path", r"doc_(\d+)\.txt", 1).cast("long").alias("orig_id"),
    )
    return (
        top.join(meta, "doc_id")
        .select(F.col("orig_id").alias("doc_id"), _q6(F.col("score")).alias("score_q6"))
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
    )


@register(
    "composite_search",
    _composite_sql([("spark", 1), ("hash", 1), ("join", 1), ("windoww", 2)], 2,
                   "spark hash join windoww", 10),
)
def composite_search(spark, sf_dir):
    """§2.8 flagship END-TO-END: the real engine (built index, term_dict
    fuzzy expansion, multiplicity-weighted msm 50%, best_fields 5/3/3,
    gated wildcard fallback) vs an independent full-tree SQL oracle —
    4 terms incl. a 2-edit fuzzy ('windoww'→'window'), msm=2."""
    return _composite_engine(spark, sf_dir, "spark hash join windoww")


@register(
    "composite_search_filename",
    _composite_sql([("doc_42", 2)], 1, "doc_42", 10),  # len 6 → AUTO 2 edits
)
def composite_search_filename(spark, sf_dir):
    """Composite tree, filename/wildcard branches: 'doc_42' scores via the
    boosted filename fields AND the constant-score wildcard clauses
    (substring of file_name), exercising the full-scan fallback path."""
    return _composite_engine(spark, sf_dir, "doc_42")


_SNIPPET_SQL = """
SELECT doc_id,
  CASE WHEN pos > 0 THEN
    concat(
      CASE WHEN pos - 1 - 100 > 0 THEN '...' ELSE '' END,
      substr(text, greatest(pos - 100, 1),
             least(cast(length(text) as bigint), pos + 5 + 100) - greatest(pos - 100, 1) + 1),
      CASE WHEN pos + 5 + 100 < length(text) THEN '...' ELSE '' END)
  ELSE
    concat(substr(text, 1, 300), CASE WHEN length(text) > 300 THEN '...' ELSE '' END)
  END AS snippet
FROM (SELECT doc_id, text, position('spark' in lower(text)) AS pos FROM documents)
ORDER BY doc_id
"""


@register("snippet_fallback", _SNIPPET_SQL)
def snippet_fallback(spark, sf_dir):
    """F7: the reference's manual snippet rule (SearchAdapter.java:580-610) —
    ±100 chars around the first occurrence of the query string with ellipses,
    else leading 300 chars — as a pure Catalyst expression ('spark', len 5)."""
    d = _docs(spark, sf_dir)
    qlen = 5  # len("spark")
    pos = F.instr(F.lower(F.col("text")), "spark")
    tlen = F.length("text")
    start = F.greatest(pos - 100, F.lit(1))
    end = F.least(tlen.cast("long"), (pos + qlen + 100).cast("long"))
    found = F.concat(
        F.when(pos - 1 - 100 > 0, F.lit("...")).otherwise(F.lit("")),
        F.substring(F.col("text"), start, (end - start + F.lit(1)).cast("int")),
        F.when(pos + qlen + 100 < tlen, F.lit("...")).otherwise(F.lit("")),
    )
    missing = F.concat(
        F.substring("text", 1, 300),
        F.when(tlen > 300, F.lit("...")).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id", F.when(pos > 0, found).otherwise(missing).alias("snippet")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Training-pipeline ops round 2: SimHash, embedding near-dup, language-ID,
# multimodal feature plumbing
# ---------------------------------------------------------------------------

_SIMHASH_CTE = f"""
WITH tf AS ({SQL_TF}),
h AS (SELECT doc_id, tf, {_H60_SQL} AS h FROM tf),
bits AS (
  SELECT doc_id, j, sum(tf * (((h >> j) & 1) * 2 - 1)) AS vote
  FROM h, (SELECT unnest(generate_series(0, 59)) AS j)
  GROUP BY doc_id, j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
"""

_SIMHASH_SQL = _SIMHASH_CTE + "SELECT doc_id, simhash FROM sh ORDER BY doc_id"


def _simhash_spark(spark, sf_dir) -> DataFrame:
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        .withColumn("h", _H60_SPARK(F.col("term")))
    )
    votes = (
        tf.select("doc_id", "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("j"))
        .withColumn("bit", F.expr("(h >> j) & 1"))
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("tf") * (F.col("bit") * 2 - 1)).alias("vote"))
    )
    return (
        votes.groupBy("doc_id")
        .agg(F.sum(F.when(F.col("vote") > 0, F.expr("cast(1 as bigint) << j")).otherwise(F.lit(0))).alias("simhash"))
    )


@register("simhash64", _SIMHASH_SQL)
def simhash64(spark, sf_dir):
    """SimHash document fingerprint (60-bit): tf-weighted bit votes over
    md5-derived term hashes — near-dup sketch whose hamming distance bounds
    cosine similarity of the tf vectors."""
    return _simhash_spark(spark, sf_dir).orderBy("doc_id")


@register(
    "simhash_neardup_pairs",
    _SIMHASH_CTE
    + """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
ORDER BY hamming ASC, id_a ASC, id_b ASC LIMIT 20""",
)
def simhash_neardup_pairs(spark, sf_dir):
    """SimHash near-duplicate candidates: 20 closest pairs by hamming
    distance (deterministic tiebreak). The 100 TB path blocks on simhash
    bands before pairing; the all-pairs join here is the exact oracle."""
    sh = _simhash_spark(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr("cast(bit_count(sa ^ sb) as bigint)").alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
    )


@register(
    "simhash_band_pairs",
    _SIMHASH_CTE
    + """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY hamming, id_a, id_b""",
)
def simhash_band_pairs(spark, sf_dir):
    """SimHash near-dup at scale (VERDICT r1 next #6): split the 60-bit
    hash into 4 bands of 15 bits used as equi-join keys, then verify
    Hamming <= 3 on band-collision candidates only — NO all-pairs join.

    Recall is PROVABLE, not probabilistic: <= 3 differing bits can dirty at
    most 3 of the 4 bands, so every qualifying pair shares a clean band
    (pigeonhole; t < n_bands). The oracle is therefore the brute-force
    all-pairs filter — a hash match proves the banded plan loses nothing.
    At 10^12 docs the shuffle carries (band_id, 15-bit value) keys instead
    of N^2/2 comparisons."""
    sh = _simhash_spark(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.expr(f"(simhash >> {15 * j}) & 32767").alias("bv"),
                )
                for j in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", F.col("band.j").alias("j"), F.col("band.bv").alias("bv"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .distinct()
        .orderBy("hamming", "id_a", "id_b")
    )


_EMB_PAIRS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, CAST(round(cos * 1000000) AS BIGINT) AS cos_q6
FROM p ORDER BY cos_q6 DESC, id_a ASC, id_b ASC LIMIT 20
"""


@register("embedding_neardup_pairs", _EMB_PAIRS_SQL)
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup: 20 most-similar vector pairs (exact
    brute force — the oracle for the LSH/IVF blocked variant at scale)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            _q6(
                F.expr(dot.format(a="va", b="vb"))
                / (F.sqrt(F.expr(dot.format(a="va", b="va"))) * F.sqrt(F.expr(dot.format(a="vb", b="vb"))))
            ).alias("cos_q6"),
        )
        .orderBy(F.desc("cos_q6"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
    )


# sign-LSH for embeddings: 4 hash tables, each keyed by the sign bits of 4
# dimensions (axis-aligned random-hyperplane LSH; deterministic + identical
# across engines). DuckDB arrays are 1-based, Spark 0-based — offsets align.
_EMB_LSH_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (
  SELECT vec_id, j,
         (CASE WHEN v[4*j+1] > 0 THEN 1 ELSE 0 END)
       + (CASE WHEN v[4*j+2] > 0 THEN 2 ELSE 0 END)
       + (CASE WHEN v[4*j+3] > 0 THEN 4 ELSE 0 END)
       + (CASE WHEN v[4*j+4] > 0 THEN 8 ELSE 0 END) AS bv
  FROM e, (SELECT unnest(generate_series(0, 3)) AS j)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM b a JOIN b b2 ON a.j = b2.j AND a.bv = b2.bv AND a.vec_id < b2.vec_id
),
p AS (
  SELECT id_a, id_b,
         list_dot_product(ea.v, eb.v)
           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
  FROM cand JOIN e ea ON id_a = ea.vec_id JOIN e eb ON id_b = eb.vec_id
)
SELECT id_a, id_b, CAST(round(cos * 1000000) AS BIGINT) AS cos_q6
FROM p ORDER BY cos_q6 DESC, id_a ASC, id_b ASC LIMIT 20
"""


@register("embedding_lsh_pairs", _EMB_LSH_SQL)
def embedding_lsh_pairs(spark, sf_dir):
    """Embedding near-dup at scale (VERDICT r1 next #6): candidates come
    from an EQUI-JOIN on sign-LSH bucket keys (4 tables x 4 sign bits, the
    OR-construction), exact cosine verified on candidates only — no
    all-pairs join. On genuinely near-duplicate vectors (cos -> 1) the sign
    bits agree w.h.p. per table and the OR of 4 tables drives recall toward
    1; ``embedding_neardup_pairs`` remains the exact all-pairs oracle. At
    10^9 vectors the shuffle carries (table_id, 4-bit bucket) keys."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    band_structs = []
    for j in range(4):
        bv = None
        for i in range(4):
            bit = F.when(F.expr(f"v[{4 * j + i}]") > 0, F.lit(1 << i)).otherwise(F.lit(0))
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
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a", "id_b",
            _q6(
                F.expr(dot.format(a="va", b="vb"))
                / (F.sqrt(F.expr(dot.format(a="va", b="va"))) * F.sqrt(F.expr(dot.format(a="vb", b="vb"))))
            ).alias("cos_q6"),
        )
        .orderBy(F.desc("cos_q6"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
    )


_LANG_PROFILES = {
    "de": ["der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "des"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "with", "as"],
    "es": ["el", "la", "que", "y", "los", "del", "se", "las", "por", "un"],
    "fr": ["le", "les", "et", "des", "du", "une", "est", "dans", "pour", "sur"],
}


def _lang_sql() -> str:
    counts = ",\n".join(
        f"count(*) FILTER (term IN ({', '.join(repr(w) for w in ws)})) AS c_{lang}"
        for lang, ws in _LANG_PROFILES.items()
    )
    return f"""
WITH t AS ({SQL_TOKS}),
c AS (SELECT doc_id, {counts} FROM t GROUP BY doc_id),
d AS (
  SELECT doc_id,
         strlen(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS non_ascii,
         strlen(text) AS n_bytes
  FROM documents
)
SELECT d.doc_id,
  CASE WHEN d.non_ascii * 10 > d.n_bytes * 3 THEN 'zh'
       WHEN coalesce(c_de,0) >= coalesce(c_en,0) AND coalesce(c_de,0) >= coalesce(c_es,0) AND coalesce(c_de,0) >= coalesce(c_fr,0) THEN 'de'
       WHEN coalesce(c_en,0) >= coalesce(c_es,0) AND coalesce(c_en,0) >= coalesce(c_fr,0) THEN 'en'
       WHEN coalesce(c_es,0) >= coalesce(c_fr,0) THEN 'es'
       ELSE 'fr' END AS pred_lang
FROM d LEFT JOIN c ON d.doc_id = c.doc_id
ORDER BY d.doc_id
"""


@register("lang_id_heuristic", _lang_sql())
def lang_id_heuristic(spark, sf_dir):
    """Language-ID heuristic: CJK via non-ASCII byte ratio > 0.3, else
    argmax of stopword-profile hits (deterministic alphabetical tiebreak)."""
    t = _toks(_docs(spark, sf_dir))
    aggs = [
        F.sum(F.when(F.col("term").isin(ws), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, ws in _LANG_PROFILES.items()
    ]
    c = t.groupBy("doc_id").agg(*aggs)
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.octet_length(F.regexp_replace("text", r"[\x00-\x7F]", "")).alias("non_ascii"),
        F.octet_length("text").alias("n_bytes"),
    )
    j = d.join(c, "doc_id", "left")
    cz = {lang: F.coalesce(F.col(f"c_{lang}"), F.lit(0)) for lang in _LANG_PROFILES}
    pred = (
        F.when(F.col("non_ascii") * 10 > F.col("n_bytes") * 3, F.lit("zh"))
        .when((cz["de"] >= cz["en"]) & (cz["de"] >= cz["es"]) & (cz["de"] >= cz["fr"]), F.lit("de"))
        .when((cz["en"] >= cz["es"]) & (cz["en"] >= cz["fr"]), F.lit("en"))
        .when(cz["es"] >= cz["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return j.select("doc_id", pred.alias("pred_lang")).orderBy("doc_id")


@register(
    "media_features",
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, sha256(text) AS sha
       FROM documents ORDER BY doc_id""",
)
def media_features(spark, sf_dir):
    """Multimodal plumbing end-to-end: text → binary payload column →
    Arrow-batched mapInPandas feature extraction (decode stubbed
    deterministically; docix_spark.analysis.multimodal). Byte length and
    sha256 are the payload invariants the SQL oracle can check."""
    from docix_spark.analysis.multimodal import extract_media_features, synth_media

    media = synth_media(_docs(spark, sf_dir))
    feats = extract_media_features(media)
    # synth_media stringifies doc_id (media tables key on opaque ids);
    # cast back to long so the value hash matches the BIGINT oracle column
    return feats.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_bytes"),
        F.col("sha256").alias("sha"),
    ).orderBy("doc_id")


# The driver tables are ASCII-only, so Unicode coverage is exercised by
# deterministically rewriting words to CJK/Katakana/accented forms inside
# the query (identical replace() on both engines), then tokenizing: Han →
# one token per character, Katakana → runs, ß/é → word-forming.
_UNI_REWRITE_SQL = (
    "replace(replace(replace(text, 'spark', '火花引擎'), "
    "'window', 'ウィンドウ'), 'merge', 'straße café')"
)


@register(
    "unicode_tokens",
    f"""WITH t AS (
          SELECT doc_id, unnest(regexp_extract_all(lower({_UNI_REWRITE_SQL}),
                 '{TOKEN_PATTERN}')) AS term
          FROM documents WHERE lang = 'zh'
        )
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS total_tf
        FROM t WHERE regexp_matches(term, '[^\\x00-\\x7F]')
        GROUP BY term ORDER BY term""",
)
def unicode_tokens(spark, sf_dir):
    """F1 (Unicode): CJK/Katakana/accented text is tokenized and indexable —
    Han unigrams, Katakana runs, word-forming accents — with identical
    segmentation in Spark and the DuckDB oracle (ES standard-analyzer
    semantics, SearchAdapter.java:253-258)."""
    d = _docs(spark, sf_dir).where(F.col("lang") == "zh")
    rewritten = F.expr(_UNI_REWRITE_SQL)
    t = d.select("doc_id", F.explode(spark_tokens(rewritten)).alias("term"))
    return (
        t.where(F.col("term").rlike("[^\\x00-\\x7F]"))
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("total_tf"),
        )
        .orderBy("term")
    )


@register(
    "unicode_search",
    f"""WITH t AS (
          SELECT doc_id, unnest(regexp_extract_all(lower({_UNI_REWRITE_SQL}),
                 '{TOKEN_PATTERN}')) AS term
          FROM documents WHERE lang = 'zh'
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term)
        SELECT doc_id, CAST(tf AS BIGINT) AS tf FROM tf
        WHERE term = '火' ORDER BY tf DESC, doc_id LIMIT 10""",
)
def unicode_search(spark, sf_dir):
    """A CJK query term ('火') retrieves documents — the end-to-end proof
    that non-ASCII content is searchable after the Unicode tokenizer."""
    d = _docs(spark, sf_dir).where(F.col("lang") == "zh")
    rewritten = F.expr(_UNI_REWRITE_SQL)
    t = d.select("doc_id", F.explode(spark_tokens(rewritten)).alias("term"))
    return (
        t.where(F.col("term") == "火")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "media_frames",
    """SELECT doc_id, least(CAST(ceil(strlen(text) / 4096.0) AS BIGINT), 8) AS n_frames
       FROM documents ORDER BY doc_id""",
)
def media_frames(spark, sf_dir):
    """Multimodal frame-sampling plumbing: binary payloads → mapInPandas
    byte-window "frames" (keyframe-extraction stand-in; every_n_bytes=4096,
    max 8). The oracle checks the deterministic frame count per doc."""
    from docix_spark.analysis.multimodal import frame_sample, synth_media

    media = synth_media(_docs(spark, sf_dir))
    frames = frame_sample(media, every_n_bytes=4096, max_frames=8)
    return (
        frames.groupBy(F.col("doc_id").cast("long").alias("doc_id"))
        .agg(F.count("*").alias("n_frames"))
        .orderBy("doc_id")
    )


@register(
    "media_resize",
    """WITH p AS (
         SELECT doc_id, ascii(substr(text, 1, 1)) + 1 AS w,
                ascii(substr(text, 2, 1)) + 1 AS h, strlen(text) AS nb
         FROM documents
       ),
       s AS (SELECT doc_id, w, h, least(64.0 / greatest(w, h, 1), 1.0) AS sc, nb FROM p)
       SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
              CAST(greatest(floor(w * sc), 1) AS BIGINT) AS resized_width,
              CAST(greatest(floor(h * sc), 1) AS BIGINT) AS resized_height,
              CAST(least(nb, greatest(floor(w * sc), 1) * greatest(floor(h * sc), 1)) AS BIGINT) AS thumb_len
       FROM s ORDER BY doc_id""",
)
def media_resize(spark, sf_dir):
    """Multimodal resize stage plumbing: fake-decoded dimensions scaled to
    max 64 preserving aspect ratio, thumbnail payload truncated to the
    resized pixel budget (decode/encode stubbed — analysis/multimodal)."""
    from docix_spark.analysis.multimodal import resize_media, synth_media

    media = synth_media(_docs(spark, sf_dir))
    r = resize_media(media, max_dim=64)
    return r.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("width").cast("long"),
        F.col("height").cast("long"),
        F.col("resized_width").cast("long"),
        F.col("resized_height").cast("long"),
        F.octet_length("thumb_bytes").cast("long").alias("thumb_len"),
    ).orderBy("doc_id")


@register(
    "token_count_bpe",
    rf"""SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens
        FROM documents ORDER BY doc_id""",
)
def token_count_bpe(spark, sf_dir):
    """BPE-ish token estimate (letter runs + single digits + single
    punctuation/other marks) — the subword-budget counter a training
    pipeline runs next to the whitespace/word counts (token_count)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]|[^a-z0-9\s]"), 0)
        ).cast("long").alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


@register(
    "source_filter_lang",
    """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
       FROM documents WHERE lang IN ('en', 'de') GROUP BY lang ORDER BY lang""",
)
def source_filter_lang(spark, sf_dir):
    """P8: content-type/source admission predicate (the reference's isPdf
    gate, UploadDocumentService.java:122-140) as source filtering — a
    pushed-down lang predicate with per-type admission stats."""
    d = _docs(spark, sf_dir)
    return (
        d.where(F.col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").cast("long").alias("chars"))
        .orderBy("lang")
    )


@register(
    "pages_formfeed_split",
    """SELECT doc_id, CAST(i - 1 AS BIGINT) AS page_number,
              CAST(strlen(pages[i]) AS BIGINT) AS page_chars
       FROM (SELECT doc_id, string_split(text, chr(12)) AS pages FROM documents),
            (SELECT unnest(generate_series(1, 100)) AS i)
       WHERE i <= len(pages)
       ORDER BY doc_id, page_number""",
)
def pages_formfeed_split(spark, sf_dir):
    """S4: the reference's fallback page model — full text split on form
    feed, one row per page with its ordinal (Tika parseToString + split
    on \\f, PageBasedContentExtractor.java:63-79) — F.split + posexplode."""
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.posexplode(F.split("text", "\f")).alias("page_number", "page"))
        .select(
            "doc_id",
            F.col("page_number").cast("long"),
            F.octet_length("page").cast("long").alias("page_chars"),
        )
        .orderBy("doc_id", "page_number")
    )


@register(
    "training_mix_pipeline",
    f"""WITH feat AS (
      SELECT doc_id, source, md5(text) AS h,
             CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_distinct
      FROM documents
    ),
    dedup AS (
      SELECT arg_min(doc_id, doc_id) AS doc_id,
             arg_min(source, doc_id) AS source,
             arg_min(n_tok, doc_id) AS n_tok,
             arg_min(n_distinct, doc_id) AS n_distinct
      FROM feat GROUP BY h
    ),
    q AS (
      SELECT * FROM dedup
      WHERE n_tok >= 32 AND n_distinct * 5 >= n_tok * 2
    ),
    s AS (
      SELECT q.*, 2000 + 500 * (CAST(substr(source, 4) AS BIGINT) % 16) AS rate_bp
      FROM q
      WHERE ((doc_id * 2654435761) % 4294967296) % 10000
            < 2000 + 500 * (CAST(substr(source, 4) AS BIGINT) % 16)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
           CAST((sum(n_tok) + 2047) // 2048 AS BIGINT) AS bins_2048,
           CAST(min(rate_bp) AS BIGINT) AS rate_bp
    FROM s GROUP BY source ORDER BY source""",
)
def training_mix_pipeline(spark, sf_dir):
    """End-to-end training-mix construction — the composition a 100 TB
    pretraining pipeline actually runs, as ONE declarative plan:

      1. exact dedup (keep the min-doc_id representative per content hash),
      2. quality gate (>=32 analyzer tokens AND type/token ratio >=0.4),
      3. deterministic stratified sampling (the Knuth multiplicative-hash
         admission rule of ``stratified_sample``),
      4. pack accounting (ceil-divide surviving tokens into 2048-token
         bins per source — the capacity plan for ``pack_sequences``).

    100 TB shape: the per-doc features (token count, distinct count, hash)
    are map-side column expressions — no token explode, no shuffle. The
    ONLY full shuffle is the dedup groupBy on the 16-byte content hash,
    which carries four small columns via min_by (never the text). The
    quality gate + sampling filter are map-side; the final per-source agg
    is a 20-row rollup. Quality/ratio compares are integer cross-
    multiplications (n_distinct*5 >= n_tok*2) so Spark and DuckDB agree
    bit-for-bit at the boundary.
    """
    d = _docs(spark, sf_dir)
    w = spark_tokens("text")
    feat = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(w).cast("long").alias("n_tok"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
    )
    dedup = feat.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
        F.min_by("n_tok", "doc_id").alias("n_tok"),
        F.min_by("n_distinct", "doc_id").alias("n_distinct"),
    )
    q = dedup.where(
        (F.col("n_tok") >= 32) & (F.col("n_distinct") * 5 >= F.col("n_tok") * 2)
    )
    rate = F.lit(2000) + F.lit(500) * (F.substring("source", 4, 10).cast("long") % 16)
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(10000)
    s = q.withColumn("rate_bp", rate).where(u < F.col("rate_bp"))
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.sum("n_tok").cast("long").alias("kept_tokens"),
            ((F.sum("n_tok") + F.lit(2047)) / F.lit(2048)).cast("long").alias("bins_2048"),
            F.min("rate_bp").cast("long").alias("rate_bp"),
        )
        .orderBy("source")
    )


@register(
    "unigram_logprob",
    f"""WITH tf AS ({SQL_TF}),
    tt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term),
    tot AS (SELECT CAST(sum(total_tf) AS DOUBLE) AS big_t FROM tt),
    nl AS (
      SELECT term,
             CAST(round(-ln(CAST(total_tf AS DOUBLE) / big_t) * 1000000) AS BIGINT) AS nlp_q6
      FROM tt, tot
    ),
    d AS (
      SELECT tf.doc_id,
             CAST(sum(tf.tf * nl.nlp_q6) AS BIGINT) AS surprisal_q6,
             CAST(sum(tf.tf) AS BIGINT) AS doc_len
      FROM tf JOIN nl USING (term) GROUP BY tf.doc_id
    )
    SELECT doc_id, doc_len, surprisal_q6,
           CAST(surprisal_q6 // doc_len AS BIGINT) AS mean_nlp_q6
    FROM d ORDER BY doc_id""",
)
def unigram_logprob(spark, sf_dir):
    """Model-based quality filter: per-document cross-entropy under the
    corpus's own unigram LM (CCNet/Gopher-style "perplexity" gate without
    an external KenLM — the corpus is its own language model). Score =
    Σ_t tf_d(t)·(−ln p(t)) with p(t) = corpus_tf(t)/total_tokens; high
    mean surprisal → gibberish/rare-token soup, low → boilerplate.

    Cross-engine determinism: the per-TERM surprisal is rounded to q6
    micro-nats FIRST (one ln per dictionary entry — bit-identical input
    doubles in both engines), then the per-doc score is an exact BIGINT
    dot product Σ tf·nlp_q6 — no float summation order can diverge. The
    mean is integer floor division (both operands positive).

    100 TB shape: term totals are the A2 dictionary aggregation (map-side
    partial combine absorbs stopword skew); the scalar corpus total is a
    1-row broadcast cross join; scoring joins postings ⋈ dictionary on
    term — the exact BM25 J1 shape (query/bm25.py) with the same AQE
    broadcast-when-small behavior. No collect, no window, no explode
    beyond the shared tokenizer. The tf table feeds three subtrees
    (dictionary, corpus total, scoring join); the DataFrame API would
    re-tokenize the corpus per subtree, so it is materialized ONCE via
    localCheckpoint — in the real engine this is the already-persisted
    postings parquet (index/build.py), read, never recomputed."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    tt = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("total_tf"))
    tot = tt.agg(F.sum("total_tf").cast("double").alias("big_t"))
    nl = tt.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(-F.log(F.col("total_tf").cast("double") / F.col("big_t")) * 1_000_000)
        .cast("long")
        .alias("nlp_q6"),
    )
    d = (
        tf.join(nl, "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("nlp_q6")).cast("long").alias("surprisal_q6"),
            F.sum("tf").cast("long").alias("doc_len"),
        )
    )
    return d.select(
        "doc_id",
        "doc_len",
        "surprisal_q6",
        F.expr("surprisal_q6 div doc_len").cast("long").alias("mean_nlp_q6"),
    ).orderBy("doc_id")


@register(
    "dup_ngram_fraction",
    f"""WITH w AS ({SQL_WORDS}),
    g AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
             || ' ' || words[i+4] || ' ' || words[i+5] || ' ' || words[i+6] || ' ' || words[i+7] AS g
      FROM w, unnest(generate_series(1, len(words) - 7)) AS t(i)
      WHERE len(words) >= 8
    ),
    gdf AS (SELECT g, count(*) AS n_docs FROM g GROUP BY g)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE gdf.n_docs >= 2) AS BIGINT) AS n_dup_grams,
           CAST(round(1000000.0 * count(*) FILTER (WHERE gdf.n_docs >= 2) / count(*)) AS BIGINT) AS dup_pct_q6
    FROM g JOIN gdf USING (g)
    GROUP BY g.doc_id ORDER BY g.doc_id""",
)
def dup_ngram_fraction(spark, sf_dir):
    """Cross-document duplicated-text fraction: for each doc, the share of
    its distinct 8-gram windows that also occur in at least one OTHER
    document — the first stage of exact-substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better") expressed
    as n-gram document frequency instead of a suffix array. Docs above a
    threshold (boilerplate, licenses, mirrored pages) get dropped or
    trimmed in a real pretraining mix.

    100 TB shape: the gram-df aggregation is a straight hash agg on the
    gram string — map-side partial combine caps hot grams (license
    boilerplate is THE skew case) at one partial row per map task; the
    join back to (doc_id, gram) is a high-cardinality equi-join on the
    gram, so no salting is needed (the key itself spreads). Counting
    distinct grams per doc first (DISTINCT inside the gram CTE) bounds
    both sides at distinct-window cardinality. Outputs are exact BIGINTs
    plus one q6 ratio of two small integers (identical doubles both
    engines). The (doc_id, gram) table feeds two subtrees (the df
    aggregation and the join back), so it is materialized once via
    localCheckpoint instead of exploding the corpus twice — at scale this
    is a written-once gram parquet, the suffix-array-file analogue."""
    w = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words"))
    g = (
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
        .localCheckpoint()
    )
    gdf = g.groupBy("g").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.col("n_docs") >= 2
    return (
        g.join(gdf, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count_if(dup).cast("long").alias("n_dup_grams"),
            F.round(F.lit(1_000_000.0) * F.count_if(dup) / F.count(F.lit(1)))
            .cast("long")
            .alias("dup_pct_q6"),
        )
        .orderBy("doc_id")
    )


@register(
    "doclen_quantiles",
    f"""WITH t AS (
      SELECT source,
             CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tok
      FROM documents
    ),
    hist AS (SELECT source, n_tok, count(*) AS cnt FROM t GROUP BY source, n_tok),
    h AS (
      SELECT source, n_tok, cnt,
             CAST(COALESCE(SUM(cnt) OVER (
               PARTITION BY source ORDER BY n_tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
             CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM hist
    ),
    q AS (SELECT p_q6 FROM (VALUES (500000), (900000), (990000)) AS v(p_q6)),
    agg AS (
      SELECT h.source, q.p_q6,
             max(h.n) AS n,
             max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1))
                      THEN h.n_tok END) AS v_lo,
             max(CASE WHEN h.cum_before <= floor((q.p_q6 / 1000000.0) * (h.n - 1)) + 1
                      THEN h.n_tok END) AS v_hi
      FROM h, q GROUP BY h.source, q.p_q6
    )
    SELECT source, CAST(p_q6 AS BIGINT) AS p_q6,
           CAST(round(1000000.0 * (v_lo + ((p_q6 / 1000000.0) * (n - 1)
                - floor((p_q6 / 1000000.0) * (n - 1))) * (v_hi - v_lo))) AS BIGINT) AS q_q6
    FROM agg ORDER BY source, p_q6""",
)
def doclen_quantiles(spark, sf_dir):
    """Exact per-source token-length percentiles (p50/p90/p99, type-7
    linear interpolation — numpy/DuckDB quantile_cont semantics) computed
    from a WEIGHTED HISTOGRAM instead of Spark's ``percentile`` aggregate.
    ``percentile`` buffers every raw value of a group on one reducer — a
    single crawl source at 100 TB OOMs it. Here the per-doc token count
    collapses map-side into (source, n_tok) → cnt histogram cells (bounded
    by distinct document lengths, ~1e5 rows worst case, regardless of doc
    count); the exclusive-prefix-sum window and the rank probes then run
    over histogram rows only. Same two-pass shape as the distributed
    ``pack_sequences`` prefix sum.

    Determinism: rank r = p·(n−1) and the interpolation are computed from
    identical integer inputs through identical double expressions in both
    engines (p is derived from the integer p_q6, never a decimal literal),
    so the final q6 rounding matches bit-for-bit."""
    t = _docs(spark, sf_dir).select(
        "source", F.size(spark_tokens("text")).cast("long").alias("n_tok")
    )
    hist = t.groupBy("source", "n_tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("source")
    h = hist.select(
        "source",
        "n_tok",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("long").alias("cum_before"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(500000,), (900000,), (990000,)], "p_q6 long")
    rank = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    agg = (
        h.crossJoin(F.broadcast(q))
        .groupBy("source", "p_q6")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank), F.col("n_tok"))).alias("v_lo"),
            F.max(F.when(F.col("cum_before") <= F.floor(rank) + 1, F.col("n_tok"))).alias("v_hi"),
        )
    )
    r = (F.col("p_q6") / F.lit(1_000_000.0)) * (F.col("n") - 1)
    frac = r - F.floor(r)
    return agg.select(
        "source",
        F.col("p_q6").cast("long").alias("p_q6"),
        F.round(F.lit(1_000_000.0) * (F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo"))))
        .cast("long")
        .alias("q_q6"),
    ).orderBy("source", "p_q6")


_WINNOW_FPS_SQL = f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words FROM documents),
h AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(words) - 3),
           i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3])) AS hs
  FROM w WHERE len(words) >= 8
),
f AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(hs) - 4),
           j -> list_min(list_slice(hs, j, j + 4)))) AS fps
  FROM h
)
SELECT doc_id, unnest(fps) AS fp FROM f
"""


def _winnow_fps_spark(spark, sf_dir) -> DataFrame:
    w = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words"))
    h = w.where(F.size("words") >= 8).select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(words)-4), i -> "
            "md5(concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3])))"
        ).alias("hs"),
    )
    return h.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(hs)-5), "
                "j -> array_min(slice(hs, j+1, 5))))"
            )
        ).alias("fp"),
    )


@register("winnow_fingerprints", _WINNOW_FPS_SQL + "ORDER BY doc_id, fp")
def winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    the MOSS algorithm): hash every token 4-gram, slide a window of 5
    consecutive hashes, keep each window's MINIMUM hash. Guarantee: any
    shared token run of length ≥ w+k−1 = 8 produces at least one shared
    fingerprint, while only ~2/(w+1) of all grams are retained — a
    provable-recall sketch that is 3× smaller than the full gram table
    the `dup_ngram_fraction` stage scans.

    Determinism: md5 hex digests compared lexicographically (the minhash
    family's convention), so the per-window minimum is the same string in
    Spark, DuckDB and Python. Window minima are per-DOC array lambdas
    (JVM-side `transform`/`array_min`/`slice`) — no cross-row window
    function, no shuffle before the explode; the whole selection is
    map-side, O(w) per gram with doc-bounded memory."""
    return _winnow_fps_spark(spark, sf_dir).orderBy("doc_id", "fp")


@register(
    "winnow_pairs",
    f"""WITH fps AS ({_WINNOW_FPS_SQL})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY doc_a, doc_b""",
)
def winnow_pairs(spark, sf_dir):
    """Near-dup candidate pairs by shared winnowing fingerprints (≥ 2
    shared minima — one can be a coincidental boilerplate window). The
    blocking key is the fingerprint itself: the self-equi-join shuffles
    the doc-bounded fingerprint table, never documents, and a hot
    fingerprint (license boilerplate) fans out only within its own hash
    bucket — the same candidate-generation shape as `minhash_lsh_pairs`
    with a provable-recall selection rule instead of a probabilistic one."""
    fps = _winnow_fps_spark(spark, sf_dir)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "temperature_mix_weights",
    f"""WITH t AS (
      SELECT source,
             CAST(sum(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_tokens,
             CAST(round(1000000 * pow(CAST(n_tokens AS DOUBLE), 0.7)) AS BIGINT) AS weight_q6
      FROM t
    ),
    tot AS (SELECT CAST(sum(weight_q6) AS DOUBLE) AS total_w FROM w)
    SELECT source, n_tokens, weight_q6,
           CASE WHEN total_w = 0 THEN 0
                ELSE CAST(round(1000000 * weight_q6 / total_w) AS BIGINT)
           END AS share_q6
    FROM w, tot ORDER BY source""",
)
def temperature_mix_weights(spark, sf_dir):
    """Temperature-scaled source mixing weights (τ = 0.7): the sampling
    shares behind a multi-source pretraining mix — raw token mass per
    source raised to τ < 1 and renormalized, up-weighting small
    high-quality sources against a dominant crawl (the standard recipe
    in multilingual/multi-corpus training runs). These shares are what
    `stratified_sample`'s per-source admission rates get derived from.

    Determinism: ONE pow per source is rounded to a q6 integer first
    (the `unigram_logprob` trick), so the normalizing sum is an exact
    BIGINT sum and the final share divides two exactly-agreed numbers.
    100 TB shape: per-source token mass is a map-side size() sum (no
    token explode), the source rollup is ~20 rows, the normalizer is a
    1-row broadcast cross join."""
    t = (
        _docs(spark, sf_dir)
        .select("source", F.size(spark_tokens("text")).cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    w = t.select(
        "source",
        "n_tokens",
        F.round(F.lit(1_000_000) * F.pow(F.col("n_tokens").cast("double"), F.lit(0.7)))
        .cast("long")
        .alias("weight_q6"),
    )
    tot = w.agg(F.sum("weight_q6").cast("double").alias("total_w"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            "weight_q6",
            F.when(F.col("total_w") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.round(F.lit(1_000_000) * F.col("weight_q6") / F.col("total_w")).cast("long")
            )
            .alias("share_q6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Session 9: event-time analytics (as-of join, date_histogram + moving_fn,
# retention cohorts), mergeable sketches (count-min heavy hitters, HLL
# register merge), boolean filter / percolator query shapes, CUBE rollup
# ---------------------------------------------------------------------------


@register(
    "events_asof_join",
    """WITH p AS (
         SELECT event_id, user_id, epoch_us(ts) AS purchase_us
         FROM events WHERE event_type = 'purchase'
       ),
       sel AS (
         SELECT p.event_id, p.user_id, p.purchase_us,
                (SELECT max(epoch_us(v.ts)) FROM events v
                 WHERE v.user_id = p.user_id AND v.event_type = 'view'
                   AND epoch_us(v.ts) < p.purchase_us) AS view_us
         FROM p
       )
       SELECT event_id, user_id, purchase_us, view_us,
              purchase_us - view_us AS gap_us
       FROM sel WHERE view_us IS NOT NULL
       ORDER BY event_id LIMIT 200""",
)
def events_asof_join(spark, sf_dir):
    """Backward as-of join: each purchase picks the LATEST strictly-prior
    'view' by the same user — the attribution/feature-join primitive
    (kdb aj / pandas merge_asof / Flink temporal join) that Spark lacks
    as a built-in.

    Spark shape: NOT a per-row range join (quadratic in events per user)
    — both streams union into ONE window over (user_id) ordered by
    (t_us, tag, event_id) with a last(ignorenulls) carry-forward of the
    view timestamp; purchases sort BEFORE views at equal timestamps so
    'strictly prior' holds. One user_id shuffle total, state = one value
    per row; at 100 TB this is a sort-merge pass, never a join explosion.
    The oracle is an independent formulation (correlated max subquery) so
    agreement is evidence of semantics, not of shared code."""
    e = (
        _events(spark, sf_dir)
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
            F.when(F.col("event_type") == "view", F.lit(1)).otherwise(F.lit(0)).alias("tag"),
            F.when(F.col("event_type") == "view", F.expr("unix_micros(cast(ts as timestamp))")).alias("v_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = e.withColumn("view_us", F.last("v_ts", ignorenulls=True).over(w))
    return (
        asof.where((F.col("tag") == 0) & F.col("view_us").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("t_us").alias("purchase_us"),
            "view_us",
            (F.col("t_us") - F.col("view_us")).alias("gap_us"),
        )
        .orderBy("event_id")
        .limit(200)
    )


@register(
    "events_daily_mavg",
    """WITH d AS (
         SELECT epoch_us(ts) // 86400000000 AS day_num,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1
       )
       SELECT day_num, n, value_cents,
              CAST(round(1000000.0 * avg(n) OVER (
                ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
              )) AS BIGINT) AS mavg7_n_q6
       FROM d ORDER BY day_num""",
)
def events_daily_mavg(spark, sf_dir):
    """ES date_histogram + moving_fn pipeline aggregation: per-day event
    count/value plus a trailing 7-day moving average of the count.

    Determinism: the day key is integer microsecond division (no session
    timezone in either engine); the moving average divides an exact
    BIGINT window sum by an exact count — one double division, same bits.
    Scale shape: the raw shuffle is the day groupBy (map-side partial);
    the un-partitioned window then runs over DAY-GRANULARITY rows — a few
    thousand rows for a decade of data — so the single-reducer window is
    bounded by the calendar, not the corpus (the same argument as
    doclen_quantiles' histogram window)."""
    d = (
        _events(spark, sf_dir)
        .groupBy(F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day_num"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
    )
    w = Window.orderBy("day_num").rowsBetween(-6, 0)
    return d.select(
        "day_num", "n", "value_cents", _q6(F.avg("n").over(w)).alias("mavg7_n_q6")
    ).orderBy("day_num")


@register(
    "events_retention",
    """WITH ud AS (
         SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_num FROM events
       ),
       u AS (SELECT user_id, min(day_num) AS cohort_day FROM ud GROUP BY user_id)
       SELECT u.cohort_day, ud.day_num - u.cohort_day AS day_offset,
              CAST(count(*) AS BIGINT) AS n_users
       FROM ud JOIN u ON ud.user_id = u.user_id
       WHERE ud.day_num - u.cohort_day <= 7
       GROUP BY 1, 2 ORDER BY 1, 2""",
)
def events_retention(spark, sf_dir):
    """Cohort retention triangle: users bucketed by first-active day,
    counted at each day offset 0..7 — the product-analytics companion to
    events_funnel.

    Scale shape: distinct (user, day) and the per-user min both key on
    user_id, so the cohort join reuses one partitioning (AQE broadcasts
    the cohort table when small, falls back to the already-aligned
    shuffle join at billion-user scale). count(*) is exact-distinct here
    because (user, day) rows are pre-deduped and a user has one cohort."""
    ud = (
        _events(spark, sf_dir)
        .select("user_id", F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day_num"))
        .distinct()
    )
    u = ud.groupBy("user_id").agg(F.min("day_num").alias("cohort_day"))
    return (
        ud.join(u, "user_id")
        .select("cohort_day", (F.col("day_num") - F.col("cohort_day")).alias("day_offset"))
        .where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "countmin_heavyhitters",
    f"""WITH tot AS (
      SELECT term, CAST(count(*) AS BIGINT) AS total_tf FROM ({SQL_TOKS}) GROUP BY term
    ),
    pos AS (
      SELECT term, total_tf, i,
             ('0x' || substr(md5(term), 1 + 4 * i, 4))::INT % 1024 AS pos
      FROM tot, unnest([0, 1, 2, 3]) AS t(i)
    ),
    cells AS (SELECT i, pos, CAST(sum(total_tf) AS BIGINT) AS cell FROM pos GROUP BY i, pos),
    cand AS (SELECT term, total_tf FROM tot ORDER BY total_tf DESC, term LIMIT 20)
    SELECT c.term, c.total_tf, CAST(min(cells.cell) AS BIGINT) AS cms_est
    FROM cand c
    JOIN pos ON pos.term = c.term
    JOIN cells ON cells.i = pos.i AND cells.pos = pos.pos
    GROUP BY c.term, c.total_tf
    ORDER BY c.total_tf DESC, c.term""",
)
def countmin_heavyhitters(spark, sf_dir):
    """Count-min sketch heavy hitters: term frequencies estimated from a
    4 x 1024 integer cell table (rows = four 16-bit md5 slices mod 1024),
    reported next to the exact counts for the top-20 terms — estimates
    are provably >= exact (pure overestimate), which the hash equality
    check witnesses on every row.

    Scale shape: the sketch is 4 096 BIGINT cells REGARDLESS of corpus
    size, built by one map-side-partial groupBy; cells merge across
    partitions/segments by elementwise sum (the mergeability that makes
    CMS the streaming-heavy-hitter structure). The probe reads 80 cells.
    All integer arithmetic — bit-exact across engines by construction."""
    toks = _toks(_docs(spark, sf_dir))
    # tot feeds three consumers (pos->cells, the probe join, cand); without
    # the lineage cut each would re-run the corpus-sized token scan.
    tot = (
        toks.groupBy("term").agg(F.count("*").cast("long").alias("total_tf")).localCheckpoint()
    )
    pos = tot.select(
        "term",
        "total_tf",
        F.explode(F.array([F.lit(i) for i in range(4)])).alias("i"),
    ).withColumn(
        "pos", F.expr("cast(conv(substring(md5(term), 1 + 4 * i, 4), 16, 10) as int) % 1024")
    )
    cells = pos.groupBy("i", "pos").agg(F.sum("total_tf").cast("long").alias("cell"))
    cand = tot.orderBy(F.desc("total_tf"), "term").limit(20)
    return (
        F.broadcast(cand)
        .join(pos.select("term", "i", "pos"), "term")
        .join(F.broadcast(cells), ["i", "pos"])
        .groupBy("term", "total_tf")
        .agg(F.min("cell").cast("long").alias("cms_est"))
        .orderBy(F.desc("total_tf"), "term")
    )


@register(
    "cardinality_merge",
    f"""
WITH sh AS ({_SQL_SHINGLES}),
ss AS (SELECT DISTINCT sh FROM sh),
h AS (SELECT ('0x' || substr(md5(sh), 1, 15))::UBIGINT::BIGINT AS h FROM ss),
rr AS (
  SELECT h % 256 AS reg,
         CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END AS rnk
  FROM h
),
regs AS (SELECT reg, max(rnk) AS maxr FROM rr GROUP BY reg),
z AS (
  SELECT count(*) AS hit, sum((1::BIGINT << (53 - maxr))) AS z_hit FROM regs
),
est AS (
  SELECT CAST(256 - hit AS BIGINT) AS zeros,
         z_hit + (256 - hit) * (1::BIGINT << 53) AS z_int
  FROM z
),
ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ss)
SELECT ex.n_exact,
       CAST(round(
         CASE WHEN ({_HLL_C} / CAST(z_int AS DOUBLE)) <= 640.0 AND zeros > 0
              THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
              ELSE {_HLL_C} / CAST(z_int AS DOUBLE)
         END * 1000000
       ) AS BIGINT) AS hll_q6
FROM est, ex""",
)
def cardinality_merge(spark, sf_dir):
    """HLL register MERGE: the global distinct-shingle estimate obtained
    by max-merging the per-source register sets from cardinality_sketch —
    the property that lets every executor (or every index segment) keep a
    256-byte sketch and the coordinator combine them without re-reading
    data.

    The Spark plan deliberately aggregates per (source, reg) FIRST and
    max-merges the 20 register sets; the oracle hashes the global
    distinct set directly. Agreement witnesses max-associativity — the
    merged sketch is bit-identical to the sketch of the union."""
    sh = _shingles_spark(spark, sf_dir)
    ss = sh.select("source", "sh").distinct()
    h = ss.select("source", _H60_SPARK(F.col("sh")).alias("h"))
    rr = h.select(
        "source",
        F.expr("h % 256").alias("reg"),
        F.expr("CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END").alias("rnk"),
    )
    regs_src = rr.groupBy("source", "reg").agg(F.max("rnk").alias("maxr"))
    regs = regs_src.groupBy("reg").agg(F.max("maxr").alias("maxr"))
    z = regs.agg(
        F.count("*").alias("hit"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), cast(53 - maxr as int))")).alias("z_hit"),
    )
    est = z.select(
        (F.lit(256) - F.col("hit")).cast("long").alias("zeros"),
        F.expr("z_hit + (256 - hit) * shiftleft(cast(1 as bigint), 53)").alias("z_int"),
    )
    ex = sh.select("sh").distinct().agg(F.count("*").cast("long").alias("n_exact"))
    raw = F.expr(f"{_HLL_C} / cast(z_int as double)")
    lin = F.expr("256.0 * ln(256.0 / cast(zeros as double))")
    return est.crossJoin(F.broadcast(ex)).select(
        "n_exact",
        _q6(F.when((raw <= 640.0) & (F.col("zeros") > 0), lin).otherwise(raw)).alias("hll_q6"),
    )


@register(
    "bool_filter_query",
    f"""WITH dt AS (
      SELECT DISTINCT doc_id, term FROM ({SQL_TOKS})
      WHERE term IN ('dup', 'spark', 'window')
    ),
    f AS (
      SELECT doc_id,
             bool_or(term = 'dup') AS has_dup,
             bool_or(term = 'spark') AS has_spark,
             bool_or(term = 'window') AS has_window
      FROM dt GROUP BY doc_id
    )
    SELECT doc_id FROM f
    WHERE has_dup AND has_spark AND NOT has_window
    ORDER BY doc_id""",
)
def bool_filter_query(spark, sf_dir):
    """ES bool filter (must: [dup, spark], must_not: [window]) as pure
    posting-list set algebra — no scoring, no text re-scan.

    Scale shape: the term IN (...) predicate reaches the postings scan
    (pushed-down on the term-bucketed index tables this mirrors), so the
    plan reads THREE posting lists, not the corpus; the AND/NOT fold is
    one doc_id groupBy with boolean aggregates — intersection and
    difference in a single exchange, the Lucene BooleanQuery execution
    re-expressed relationally (reference query tree:
    DocumentSearchService.java composite bool)."""
    dt = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term").isin("dup", "spark", "window"))
        .distinct()
    )
    f = dt.groupBy("doc_id").agg(
        F.bool_or(F.col("term") == "dup").alias("has_dup"),
        F.bool_or(F.col("term") == "spark").alias("has_spark"),
        F.bool_or(F.col("term") == "window").alias("has_window"),
    )
    return (
        f.where(F.col("has_dup") & F.col("has_spark") & ~F.col("has_window"))
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "percolate_queries",
    f"""WITH dtf AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM ({SQL_TOKS}) GROUP BY term
    ),
    top4 AS (SELECT term FROM dtf ORDER BY df DESC, term LIMIT 4),
    qt AS (SELECT term FROM top4 UNION SELECT 'dup'),
    q AS (SELECT a.term AS qa, b.term AS qb FROM qt a JOIN qt b ON a.term < b.term),
    dt AS (SELECT DISTINCT doc_id, term FROM ({SQL_TOKS})),
    m AS (
      SELECT q.qa, q.qb, da.doc_id FROM q
      JOIN dt da ON da.term = q.qa
      JOIN dt db ON db.term = q.qb AND db.doc_id = da.doc_id
    )
    SELECT qa, qb, CAST(count(*) AS BIGINT) AS n_docs
    FROM m GROUP BY qa, qb ORDER BY qa, qb""",
)
def percolate_queries(spark, sf_dir):
    """ES percolator: a REGISTRY of stored queries (here: every pair of
    the 4 highest-df terms plus the rare term 'dup', AND semantics)
    matched against the document stream — reverse search, where documents
    probe queries instead of queries probing documents.

    Scale shape: the stored-query table is small by nature (thousands of
    alerts), so it BROADCASTS into the postings scan twice (one hash
    probe per required term); matches group on the query key. Documents
    stream through map-side; nothing document-sized shuffles on the query
    axis. This is exactly how a distributed percolator sidesteps
    per-document query re-execution."""
    toks = _toks(_docs(spark, sf_dir))
    # dt has three consumers (df ranking + both match-probe sides); cut
    # lineage so the corpus tokenize+distinct runs once, not three times.
    dt = toks.distinct().localCheckpoint()
    dtf = dt.groupBy("term").agg(F.count("*").alias("df"))
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
    m = (
        F.broadcast(q)
        .join(dt.alias("da"), F.col("da.term") == F.col("qa"))
        .select("qa", "qb", F.col("da.doc_id").alias("m_doc"))
        .join(
            dt.alias("db"),
            (F.col("db.term") == F.col("qb")) & (F.col("db.doc_id") == F.col("m_doc")),
        )
        .select("qa", "qb", "m_doc")
    )
    return m.groupBy("qa", "qb").agg(F.count("*").cast("long").alias("n_docs")).orderBy("qa", "qb")


@register(
    "docs_rollup_cube",
    """SELECT coalesce(source, '(all)') AS source, coalesce(lang, '(all)') AS lang,
              CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
       FROM documents GROUP BY CUBE (source, lang)
       ORDER BY source, lang""",
)
def docs_rollup_cube(spark, sf_dir):
    """OLAP CUBE over (source, lang): per-cell, per-source, per-lang and
    grand-total doc counts + character mass in ONE pass — the corpus-
    composition dashboard query (ES multi-level terms agg + summaries).

    Scale shape: Spark expands grouping sets BEFORE the exchange, so all
    four rollup levels share one shuffle whose key count is bounded by
    |sources| x |langs| — partial aggregation absorbs the document axis
    map-side. The synthetic corpus has no NULL keys, so coalesce markers
    are unambiguous."""
    return (
        _docs(spark, sf_dir)
        .cube("source", "lang")
        .agg(F.count("*").cast("long").alias("n_docs"), F.sum("n_chars").cast("long").alias("chars"))
        .select(
            F.coalesce("source", F.lit("(all)")).alias("source"),
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            "n_docs",
            "chars",
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# Session 9b: filtered vector search (ES kNN filter / FAISS IDSelector),
# ES top_hits aggregation, sparse tf-idf cosine with rare-term blocking
# ---------------------------------------------------------------------------


_FILTERED_IVF_SQL_TAIL = """, lab AS (SELECT vec_id, label FROM embeddings),
fivf AS (
  SELECT e.vec_id,
         CAST(round(1000000 * list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))) AS BIGINT) AS cos_q6
  FROM e JOIN a3 USING (vec_id) JOIN probe USING (cid) JOIN lab USING (vec_id), q
  WHERE e.vec_id <> 0 AND lab.label % 2 = 0
  ORDER BY cos_q6 DESC, e.vec_id LIMIT 10
)"""


def _ivf_filtered_topk(spark, sf_dir) -> DataFrame:
    members, cent, final_assign = _trained_ivf(spark, sf_dir)
    e = _emb(spark, sf_dir)
    lab = e.select("vec_id", "label")
    qv = (
        e.where(F.col("vec_id") == 0)
        .select(F.expr("transform(embedding, x -> cast(x as double))").alias("qv"))
    )
    probe = (
        cent.crossJoin(F.broadcast(qv))
        .select("cid", _cosq("cv", "qv", 1_000_000_000).alias("cq"))
        .orderBy(F.desc("cq"), F.asc("cid"))
        .limit(3)
        .select("cid")
    )
    return (
        members.join(final_assign, "vec_id")
        .join(F.broadcast(probe), "cid")
        .join(lab, "vec_id")
        .where(F.col("label") % 2 == 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", _cosq("v", "qv", 1_000_000).alias("cos_q6"))
        .orderBy(F.desc("cos_q6"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "ann_ivf_filtered",
    _KMEANS_SQL_PRELUDE + _FILTERED_IVF_SQL_TAIL + "\nSELECT vec_id, cos_q6 FROM fivf",
)
def ann_ivf_filtered(spark, sf_dir):
    """FILTERED vector search (ES 8 kNN `filter` / FAISS IDSelector): the
    trained-IVF probe with a metadata predicate (label % 2 = 0) applied to
    candidates DURING the search — pre-filter semantics, so the top-10 is
    taken over filtered candidates inside the probed cells, never a
    post-filtered (and therefore under-filled) result page.

    Scale shape: the probe prunes to nprobe/K of the corpus FIRST; the
    label predicate then drops candidates before any scoring. Here the
    label joins back by vec_id because the shared trained index carries
    only vectors; in production the filter column lives in the vector
    table and the predicate is pushed into the pruned scan map-side, so
    filtering is free. The selectivity interplay (a too-strict filter
    empties the probed cells — FAISS's documented IDSelector caveat)
    belongs to the recall twin below."""
    return _ivf_filtered_topk(spark, sf_dir)


@register(
    "ann_ivf_filtered_recall",
    _KMEANS_SQL_PRELUDE
    + _FILTERED_IVF_SQL_TAIL
    + """, fexact AS (
  SELECT e.vec_id,
         CAST(round(1000000 * list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))) AS BIGINT) AS cos_q6
  FROM e JOIN lab USING (vec_id), q
  WHERE e.vec_id <> 0 AND lab.label % 2 = 0
  ORDER BY cos_q6 DESC, e.vec_id LIMIT 10
)
SELECT count(*) AS n_overlap FROM fivf JOIN fexact USING (vec_id)""",
)
def ann_ivf_filtered_recall(spark, sf_dir):
    """Recall@10 of the filtered IVF probe against the filtered brute-force
    oracle. The filter halves every probed cell, so recall measures how
    much of the filtered neighborhood the unfiltered cell geometry still
    covers — the number that tells an operator whether nprobe must rise
    when filters tighten."""
    fivf = _ivf_filtered_topk(spark, sf_dir).select("vec_id")
    fexact = (
        _cos_spark(spark, sf_dir)
        .where(F.col("label") % 2 == 0)
        .select("vec_id", _q6(F.col("cos")).alias("cos_q6"))
        .orderBy(F.desc("cos_q6"), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    return fivf.join(fexact, "vec_id").agg(F.count(F.lit(1)).alias("n_overlap"))


@register(
    "search_top_hits",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """
SELECT source, doc_id, score_q6, CAST(rk AS BIGINT) AS rk FROM (
  SELECT d.source, agg.doc_id, agg.score_q6,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY agg.score_q6 DESC, agg.doc_id ASC) AS rk
  FROM agg JOIN documents d USING (doc_id)
) WHERE rk <= 2 ORDER BY source, rk""",
)
def search_top_hits(spark, sf_dir):
    """ES ``top_hits`` aggregation: the best 2 documents PER SOURCE for a
    query — grouped search results (one exemplar page per bucket), the
    companion to search_facets' counts.

    Scale shape: the window runs over the query's MATCH SET (already
    pruned by the postings join), partitioned by source — no corpus-wide
    sort. A single source dominating the match set degrades the window to
    that source's matches only; if that matters, the domain_cap
    sub-sharded two-pass rank applies verbatim (same output contract)."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    d = _docs(spark, sf_dir).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(F.desc("score_q6"), F.asc("doc_id"))
    return (
        agg.join(d, "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 2)
        .select("source", "doc_id", "score_q6", "rk")
        .orderBy("source", "rk")
    )


@register(
    "sparse_cosine_pairs",
    f"""WITH tf AS ({SQL_TF}),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(1000000 * tf.tf * ln((SELECT n_docs FROM nd) / dfs.df)) AS BIGINT) AS wq
  FROM tf JOIN dfs USING (term)
),
n2 AS (SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS nrm2 FROM w GROUP BY doc_id),
rare AS (SELECT term FROM dfs WHERE df * 10 <= (SELECT n_docs FROM nd)),
rp AS (SELECT DISTINCT doc_id, term FROM tf JOIN rare USING (term)),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM rp a JOIN rp b ON a.term = b.term AND a.doc_id < b.doc_id
),
dot AS (
  SELECT cand.da, cand.db, CAST(sum(wa.wq * wb.wq) AS BIGINT) AS d
  FROM cand
  JOIN w wa ON wa.doc_id = cand.da
  JOIN w wb ON wb.doc_id = cand.db AND wb.term = wa.term
  GROUP BY cand.da, cand.db
)
SELECT da, db,
       CAST(round(1000000 * CAST(d AS DOUBLE) / (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))) AS BIGINT) AS cos_q6
FROM dot JOIN n2 na ON na.doc_id = dot.da JOIN n2 nb ON nb.doc_id = dot.db
ORDER BY cos_q6 DESC, da, db LIMIT 20""",
)
def sparse_cosine_pairs(spark, sf_dir):
    """Sparse tf-idf cosine similarity with RARE-TERM BLOCKING: candidate
    pairs must share a term with df <= N/10 (rarity is RELATIVE — an
    absolute cutoff stops producing candidates as the corpus grows), then
    exact tf-idf cosine is
    computed on candidates only — the inverted-index document-similarity
    plan (pair generation cost is Σ rare-df², never corpus²; ubiquitous
    terms have idf ≈ 0 and contribute nothing to the score anyway).

    Determinism (the unigram_logprob recipe): per-(doc, term) weight is
    q6-rounded ONCE from identical doubles, so dot products and norms are
    exact BIGINT sums with no float accumulation order; the final cosine
    is one double expression over exactly-agreed integers.

    Scale shape: blocking is an equi-join on rare terms (the MinHash-band
    pattern applied to the lexical space); the dot product joins the two
    docs' posting rows on term — bounded by candidates × doc length. The
    weight table has three consumers, hence the lineage cut."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    nd = tf.select("doc_id").distinct().agg(F.count("*").cast("double").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    w = (
        tf.join(dfs, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(F.lit(1_000_000) * F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
            .cast("long")
            .alias("wq"),
        )
        .localCheckpoint()
    )
    n2 = w.groupBy("doc_id").agg(F.sum(F.col("wq") * F.col("wq")).cast("long").alias("nrm2"))
    rare = (
        dfs.crossJoin(F.broadcast(nd))
        .where(F.col("df") * 10 <= F.col("n_docs"))
        .select("term")
    )
    rp = tf.join(F.broadcast(rare), "term").select("doc_id", "term").distinct()
    cand = (
        rp.alias("a")
        .join(rp.alias("b"), F.col("a.term") == F.col("b.term"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    dot = (
        cand.join(w.alias("wa"), F.col("wa.doc_id") == F.col("da"))
        .join(
            w.alias("wb"),
            (F.col("wb.doc_id") == F.col("db")) & (F.col("wb.term") == F.col("wa.term")),
        )
        .groupBy("da", "db")
        .agg(F.sum(F.col("wa.wq") * F.col("wb.wq")).cast("long").alias("d"))
    )
    na = n2.select(F.col("doc_id").alias("da"), F.col("nrm2").alias("na2"))
    nb = n2.select(F.col("doc_id").alias("db"), F.col("nrm2").alias("nb2"))
    return (
        dot.join(na, "da")
        .join(nb, "db")
        .select(
            "da",
            "db",
            F.round(
                F.lit(1_000_000)
                * F.col("d").cast("double")
                / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double")))
            )
            .cast("long")
            .alias("cos_q6"),
        )
        .orderBy(F.desc("cos_q6"), "da", "db")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Session 9c: ES explain / search_after / rank_eval parity, DSIR-style
# importance resampling, completion suggester
# ---------------------------------------------------------------------------


@register(
    "bm25_explain",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
top1 AS (SELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 1)
SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf, CAST(dfs.df AS BIGINT) AS df,
       CAST(round(1000000 * ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))) AS BIGINT) AS idf_q6,
       CAST(round(1000000 *
         ln(1.0 + ((SELECT n_docs FROM st) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st)))
       ) AS BIGINT) AS contrib_q6
FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id)
JOIN top1 USING (doc_id)
ORDER BY term""",
)
def bm25_explain(spark, sf_dir):
    """ES ``_explain`` API: the per-term score decomposition (tf, df, idf,
    BM25 contribution) for the query's #1 hit — the relevance-debugging
    surface every search team leans on (reference exposes ES explain
    implicitly via its adapter's search response).

    Scale shape: the top-1 doc comes from the same pruned match-set
    TakeOrdered as bm25_topk; the explain join then touches ONE doc's
    posting rows for the query terms (a doc_id point probe). Contribution
    floats use the identical expression shape as the scoring CTE, rounded
    once to q6."""
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # dl derives FROM tf (doc_len = Σ tf), so dl/st/dfs all share tf's
    # exchange and ReusedExchange collapses the whole stats chain to ONE
    # tokenize pass — a dl keyed on toks directly was a second lineage
    # branch that re-ran the tokenize (4 scans per match set)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    st = dl.agg(F.count("*").cast("double").alias("n_docs"), F.avg("doc_len").alias("avgdl"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = F.broadcast(
        spark.createDataFrame([(t,) for t in _TOPK_TERMS], "term string")
    )
    top1 = (
        _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(1)
        .select("doc_id")
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        idf
        * F.col("tf").cast("double")
        * F.lit(2.2)
        / (
            F.col("tf").cast("double")
            + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doc_len") / F.col("avgdl"))
        )
    )
    return (
        tf.join(q, "term")
        .join(dfs, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(top1), "doc_id")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            _q6(idf).alias("idf_q6"),
            _q6(contrib).alias("contrib_q6"),
        )
        .orderBy("term")
    )


@register(
    "search_after",
    _bm25_agg_ctes(_TOPK_TERMS)
    + """,
cur AS (
  SELECT score_q6 AS cs, doc_id AS cd FROM (
    SELECT doc_id, score_q6,
           row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rn
    FROM agg) WHERE rn = 10
)
SELECT doc_id, score_q6 FROM agg, cur
WHERE score_q6 < cs OR (score_q6 = cs AND doc_id > cd)
ORDER BY score_q6 DESC, doc_id ASC LIMIT 10""",
)
def search_after(spark, sf_dir):
    """ES ``search_after`` keyset pagination: page 2 fetched via the
    (score, doc_id) cursor of page 1's last hit, NOT via from+size. This
    is the deep-pagination fix — from+size must rank (page+1)*size rows
    per shard forever deeper, while search_after pushes the cursor as a
    PREDICATE into the match set and every page is the same TakeOrdered
    top-k cost (why ES deprecates scroll-by-offset past 10k).

    Spark shape: cursor = one-row broadcast from the page-1 TakeOrdered;
    page 2 = filter + TakeOrdered over the match set — no rank window at
    all."""
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS)
    cur = (
        agg.orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
        .orderBy(F.asc("score_q6"), F.desc("doc_id"))
        .limit(1)
        .select(F.col("score_q6").alias("cs"), F.col("doc_id").alias("cd"))
    )
    return (
        agg.crossJoin(F.broadcast(cur))
        .where(
            (F.col("score_q6") < F.col("cs"))
            | ((F.col("score_q6") == F.col("cs")) & (F.col("doc_id") > F.col("cd")))
        )
        .select("doc_id", "score_q6")
        .orderBy(F.desc("score_q6"), F.asc("doc_id"))
        .limit(10)
    )


_RANKEVAL_TERMS = ["dup", "spark"]


@register(
    "rank_eval",
    _bm25_agg_ctes(_RANKEVAL_TERMS)
    + f""",
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk
  FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10
),
rel AS (
  SELECT DISTINCT doc_id FROM ({SQL_TOKS}) WHERE term = 'dup'
),
j AS (
  SELECT ranked.rnk, CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
  FROM ranked LEFT JOIN rel USING (doc_id)
)
SELECT CAST(sum(is_rel) AS BIGINT) AS n_rel_at_10,
       CAST(round(1000000.0 * sum(is_rel) / 10) AS BIGINT) AS p_at_10_q6,
       CAST(coalesce(round(1000000.0 / min(CASE WHEN is_rel = 1 THEN rnk END)), 0) AS BIGINT) AS mrr_q6
FROM j""",
)
def rank_eval(spark, sf_dir):
    """ES ``_rank_eval`` API: precision@10 and reciprocal rank of the BM25
    ranking against a judgment set (binary relevance: documents containing
    the rare term 'dup') — offline search-quality measurement as a query,
    the way ranking regressions get caught in CI.

    Scale shape: the ranked page is the usual TakeOrdered top-10; the
    judgment set joins by doc_id onto TEN rows. Judgment lists are
    human-sized by nature — this never touches corpus-scale data beyond
    the match set itself."""
    agg = _bm25_match_set(spark, sf_dir, _RANKEVAL_TERMS)
    top10 = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    ranked = top10.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id")))
    ).select("doc_id", "rnk")
    rel = (
        _toks(_docs(spark, sf_dir))
        .where(F.col("term") == "dup")
        .select("doc_id")
        .distinct()
        .withColumn("is_rel_flag", F.lit(1))
    )
    j = ranked.join(rel, "doc_id", "left").select(
        "rnk", F.coalesce("is_rel_flag", F.lit(0)).alias("is_rel")
    )
    return j.agg(
        F.sum("is_rel").cast("long").alias("n_rel_at_10"),
        F.round(F.lit(1_000_000.0) * F.sum("is_rel") / 10).cast("long").alias("p_at_10_q6"),
        F.coalesce(
            F.round(F.lit(1_000_000.0) / F.min(F.when(F.col("is_rel") == 1, F.col("rnk")))),
            F.lit(0),
        )
        .cast("long")
        .alias("mrr_q6"),
    )


@register(
    "dsir_importance",
    f"""WITH tf AS ({SQL_TF}),
v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS vsz FROM tf),
tgt AS (
  SELECT term, CAST(sum(tf.tf) AS BIGINT) AS c
  FROM tf JOIN documents d USING (doc_id) WHERE d.source = 'src0'
  GROUP BY term
),
cor AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY term),
tott AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS t FROM tgt),
totc AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM cor),
lam AS (
  SELECT cor.term,
         CAST(round(1000000 * (
           ln((coalesce(tgt.c, 0) + 1.0) / ((SELECT t FROM tott) + (SELECT vsz FROM v)))
           - ln((cor.c + 1.0) / ((SELECT t FROM totc) + (SELECT vsz FROM v)))
         )) AS BIGINT) AS lam_q6
  FROM cor LEFT JOIN tgt USING (term)
)
SELECT tf.doc_id, CAST(sum(tf.tf * lam.lam_q6) AS BIGINT) AS imp_q6
FROM tf JOIN lam USING (term)
GROUP BY tf.doc_id ORDER BY imp_q6 DESC, doc_id ASC LIMIT 20""",
)
def dsir_importance(spark, sf_dir):
    """DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-document
    log-importance weight Σ tf·(ln p_target − ln p_raw) under add-1
    unigram LMs, target = the in-domain slice (source 'src0'), raw = the
    whole corpus; top-20 admitted. The selection recipe behind
    domain-matched pretraining mixes.

    Determinism (unigram_logprob recipe): per-TERM log-ratio is q6-rounded
    once — both engines take the same two ln's of the same doubles — and
    the per-doc weight is an exact BIGINT dot product with tf.
    Scale shape: λ is vocab-sized and joins the postings stream map-side
    (broadcast/AQE); the only corpus-scale exchange is the per-doc sum,
    keyed on doc_id. tf has four consumers, hence the lineage cut."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    v = tf.select("term").distinct().agg(F.count("*").cast("long").alias("vsz"))
    d = _docs(spark, sf_dir).select("doc_id", "source")
    tgt = (
        tf.join(d, "doc_id")
        .where(F.col("source") == "src0")
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("tc"))
    )
    cor = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cc"))
    tott = tgt.agg(F.coalesce(F.sum("tc"), F.lit(0)).cast("long").alias("tt"))
    totc = cor.agg(F.sum("cc").cast("long").alias("ct"))
    lam = (
        cor.join(tgt, "term", "left")
        .crossJoin(F.broadcast(tott))
        .crossJoin(F.broadcast(totc))
        .crossJoin(F.broadcast(v))
        .select(
            "term",
            F.round(
                F.lit(1_000_000)
                * (
                    F.log(
                        (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                        / (F.col("tt") + F.col("vsz")).cast("double")
                    )
                    - F.log((F.col("cc") + 1.0) / (F.col("ct") + F.col("vsz")).cast("double"))
                )
            )
            .cast("long")
            .alias("lam_q6"),
        )
    )
    return (
        tf.join(lam, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("lam_q6")).cast("long").alias("imp_q6"))
        .orderBy(F.desc("imp_q6"), F.asc("doc_id"))
        .limit(20)
    )


@register(
    "suggest_completion",
    f"""WITH dtf AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM ({SQL_TOKS}) GROUP BY term
    )
    SELECT term, CAST(df AS BIGINT) AS df FROM dtf
    WHERE term LIKE 's%' ORDER BY df DESC, term ASC LIMIT 5""",
)
def suggest_completion(spark, sf_dir):
    """ES completion suggester: prefix 's' → top-5 dictionary terms by
    document frequency — the search-box type-ahead fed from the term
    dictionary (weight = df), complementing autocomplete_bigrams' context
    suggestions.

    Scale shape: a dictionary-sized scan with a pushed-down prefix
    predicate (the term dictionary is range-partitioned on term in the
    real index, so the prefix prunes partitions) and a 5-row TakeOrdered."""
    dt = _toks(_docs(spark, sf_dir)).distinct()
    dtf = dt.groupBy("term").agg(F.count("*").alias("df"))
    return (
        dtf.where(F.col("term").startswith("s"))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(5)
    )


@register(
    "events_asof_horizon",
    """WITH v AS (
         SELECT user_id, epoch_us(ts) AS v_us FROM events WHERE event_type = 'view'
       ),
       p AS (
         SELECT event_id, user_id, epoch_us(ts) AS p_us
         FROM events WHERE event_type = 'purchase'
       )
       SELECT p.event_id, p.user_id, p.p_us AS purchase_us,
              max(v.v_us) AS view_us, p.p_us - max(v.v_us) AS gap_us
       FROM p JOIN v ON v.user_id = p.user_id
         AND v.v_us < p.p_us AND v.v_us >= p.p_us - 3600000000
       GROUP BY p.event_id, p.user_id, p.p_us
       ORDER BY event_id""",
)
def events_asof_horizon(spark, sf_dir):
    """Horizon-bounded as-of attribution (1-hour lookback) — the batch
    twin of the STREAMING stream-stream time-interval join
    (streaming/events.py::asof_attribution_stream, proven equal over
    chronological micro-batches in tests/test_events_streaming.py). The
    bounded lookback is the contract that makes the streaming form
    possible: join state is evictable once the watermark passes
    p_ts − horizon, unlike the unbounded `events_asof_join`."""
    from docix_spark.streaming.events import asof_attribution

    return asof_attribution(_events(spark, sf_dir), horizon_sec=3600)


_DECAY_S_US = 14 * 86_400_000_000  # ES linear decay: s = scale/(1-decay) = 7d/0.5


@register(
    "function_score_decay",
    f"""WITH o AS (SELECT max(epoch_us(ts)) AS origin_us FROM events),
    p AS (
      SELECT event_id, epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS value_cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT event_id, value_cents,
           o.origin_us - t_us AS age_us,
           (1000000 * greatest(0, {_DECAY_S_US} - (o.origin_us - t_us))) // {_DECAY_S_US} AS decay_q6,
           value_cents * ((1000000 * greatest(0, {_DECAY_S_US} - (o.origin_us - t_us))) // {_DECAY_S_US}) AS boosted_q6c
    FROM p, o
    ORDER BY boosted_q6c DESC, event_id ASC LIMIT 20""",
)
def function_score_decay(spark, sf_dir):
    """ES ``function_score`` with a LINEAR date decay (the reference's ES
    tier exposes function_score; decay scoring is its canonical recency
    use): score = value × max(0, (s − age)/s) with origin = newest event,
    scale 7d, decay 0.5 ⇒ s = scale/(1−decay) = 14d, offset 0 — the exact
    ES linear formula. Linear (not gauss/exp) is chosen deliberately: it
    is a RATIONAL of integer microsecond ages, so the whole score is
    computed in BIGINT floor division — no exp/ln call whose last-ulp
    libm behavior could diverge between engines. decay_q6 =
    (10^6·max(0, s−age)) div s; boost = cents × decay_q6.

    Scale shape: origin is a 1-row scalar agg broadcast by crossJoin; the
    scoring is pure map-side column math on the filtered scan (predicate
    pushed to parquet); the cut is a 20-row TakeOrdered — no shuffle at
    any size. 10^6·s ≈ 1.2e18 stays inside BIGINT."""
    e = _events(spark, sf_dir)
    origin = e.agg(F.expr("max(unix_micros(cast(ts as timestamp)))").alias("origin_us"))
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    age = F.col("origin_us") - F.col("t_us")
    decay_q6 = F.expr(
        f"(1000000 * greatest(0, {_DECAY_S_US} - (origin_us - t_us))) div {_DECAY_S_US}"
    )
    return (
        p.crossJoin(F.broadcast(origin))
        .select(
            "event_id",
            "value_cents",
            age.cast("long").alias("age_us"),
            decay_q6.cast("long").alias("decay_q6"),
            (F.col("value_cents") * decay_q6).cast("long").alias("boosted_q6c"),
        )
        .orderBy(F.desc("boosted_q6c"), F.asc("event_id"))
        .limit(20)
    )


@register(
    "orders_date_histogram",
    """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
              CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
              CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents,
              CAST((1000000 * sum(CAST(round(o_totalprice * 100) AS BIGINT)))
                   // count(*) AS BIGINT) AS avg_cents_q6
       FROM orders GROUP BY 1 ORDER BY 1""",
)
def orders_date_histogram(spark, sf_dir):
    """ES ``date_histogram`` aggregation with calendar_interval=month plus
    a stats sub-agg (count/sum/min/max/avg) over order totals — the
    time-bucketed dashboard agg the reference's ES tier serves. Prices
    become exact BIGINT cents FIRST (round(×100) — TPC-H prices carry two
    decimals, so the rounding is exact), every stat is integer math, and
    the mean is 10^6·sum div n — float summation order can't diverge.

    Scale shape: ONE hash aggregation keyed on the truncated month —
    map-side partial combine collapses each scan partition to
    months-per-partition rows before the exchange; the month key is
    low-cardinality and uniform so no salting is warranted. At a 10^12-row
    scale the cents sums approach BIGINT range; production would widen to
    DECIMAL(38,0) — noted, not needed at any tested SF."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(
            F.expr(
                "unix_seconds(cast(date_trunc('month', o_orderdate) as timestamp))"
            ).alias("month_epoch"),
            cents.alias("cents"),
        )
        .groupBy("month_epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
            F.expr("(1000000 * sum(cents)) div count(*)").cast("long").alias("avg_cents_q6"),
        )
        .orderBy("month_epoch")
    )


@register(
    "bigram_lm_surprisal",
    f"""WITH w AS ({SQL_WORDS}),
    bg AS (
      SELECT doc_id, words[i] AS w1, words[i+1] AS w2
      FROM w, unnest(generate_series(1, len(words) - 1)) AS t(i)
      WHERE len(words) >= 2
    ),
    bt AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf FROM bg GROUP BY doc_id, w1, w2),
    bc AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c_xy FROM bt GROUP BY w1, w2),
    cx AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x FROM bc GROUP BY w1),
    v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vocab FROM bc),
    nl AS (
      SELECT bc.w1, bc.w2,
             CAST(round(-ln(CAST(bc.c_xy + 1 AS DOUBLE) / CAST(cx.c_x + v.vocab AS DOUBLE))
                        * 1000000) AS BIGINT) AS nlp_q6
      FROM bc JOIN cx USING (w1), v
    )
    SELECT bt.doc_id,
           CAST(sum(bt.tf) AS BIGINT) AS n_bigrams,
           CAST(sum(bt.tf * nl.nlp_q6) AS BIGINT) AS surprisal_q6,
           CAST(sum(bt.tf * nl.nlp_q6) // sum(bt.tf) AS BIGINT) AS mean_nlp_q6
    FROM bt JOIN nl ON bt.w1 = nl.w1 AND bt.w2 = nl.w2
    GROUP BY bt.doc_id ORDER BY bt.doc_id""",
)
def bigram_lm_surprisal(spark, sf_dir):
    """Per-document cross-entropy under an add-1-smoothed BIGRAM language
    model trained on the corpus itself — the KenLM-shaped sharpening of
    `unigram_logprob` (CCNet filters on n-gram LM perplexity, not unigram):
    p(w2|w1) = (c(w1w2)+1) / (c(w1·)+|V|) with c(w1·) the bigram-context
    count and |V| the outcome vocabulary (distinct w2 in the bigram
    table — self-contained so both engines derive it from the same CTE).

    Determinism (the unigram_logprob recipe): the ln argument is ONE
    rational of exact BIGINTs, per-BIGRAM −ln is q6-rounded FIRST, the
    per-doc score is an exact BIGINT dot product Σ tf·nlp_q6, and the
    mean is floor division. Docs under 2 tokens have no bigrams and are
    excluded (Spark's sequence(0, negative) junk-index guard).

    100 TB shape: the bigram tf table is the A1 postings aggregation on a
    pair key (map-side combine absorbs boilerplate skew); the model join
    keys on the pair (high-cardinality — the key itself spreads); context
    counts and |V| are dictionary-sized. bt feeds two subtrees (model
    estimation + scoring join), so it is materialized once via
    localCheckpoint — at scale, a written-once bigram-postings parquet."""
    d = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words"))
    bg = (
        d.where(F.size("words") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words)-2), i -> struct(words[i] as w1, words[i+1] as w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    bt = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    bc = bt.groupBy("w1", "w2").agg(F.sum("tf").cast("long").alias("c_xy"))
    cx = bc.groupBy("w1").agg(F.sum("c_xy").cast("long").alias("c_x"))
    v = bc.agg(F.count_distinct("w2").cast("long").alias("vocab"))
    nl = (
        bc.join(cx, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    (F.col("c_xy") + 1).cast("double")
                    / (F.col("c_x") + F.col("vocab")).cast("double")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("nlp_q6"),
        )
    )
    return (
        bt.join(nl, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("nlp_q6")).cast("long").alias("surprisal_q6"),
            F.expr("sum(tf * nlp_q6) div sum(tf)").cast("long").alias("mean_nlp_q6"),
        )
        .orderBy("doc_id")
    )


_SQL_UNI_MEAN = f"""WITH tf AS ({SQL_TF}),
    tt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term),
    tot AS (SELECT CAST(sum(total_tf) AS DOUBLE) AS big_t FROM tt),
    nl AS (
      SELECT term,
             CAST(round(-ln(CAST(total_tf AS DOUBLE) / big_t) * 1000000) AS BIGINT) AS nlp_q6
      FROM tt, tot
    ),
    d AS (
      SELECT tf.doc_id,
             CAST(sum(tf.tf * nl.nlp_q6) AS BIGINT) // CAST(sum(tf.tf) AS BIGINT) AS mean_nlp_q6
      FROM tf JOIN nl USING (term) GROUP BY tf.doc_id
    ),
    m AS (
      SELECT d.doc_id, documents.source, CAST(d.mean_nlp_q6 AS BIGINT) AS mean_nlp_q6
      FROM d JOIN documents ON documents.doc_id = d.doc_id
    )"""


def _unigram_doc_mean(spark, sf_dir) -> DataFrame:
    """(doc_id, source, mean_nlp_q6) under the corpus unigram LM — the
    exact per-doc mean surprisal of `unigram_logprob`, joined back to the
    doc's source (column-pruned documents scan). Empty docs (no tokens)
    have no tf rows and are excluded, matching the SQL twin."""
    tf = (
        _toks(_docs(spark, sf_dir))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    tt = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("total_tf"))
    tot = tt.agg(F.sum("total_tf").cast("double").alias("big_t"))
    nl = tt.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(-F.log(F.col("total_tf").cast("double") / F.col("big_t")) * 1_000_000)
        .cast("long")
        .alias("nlp_q6"),
    )
    d = (
        tf.join(nl, "term")
        .groupBy("doc_id")
        .agg(F.expr("sum(tf * nlp_q6) div sum(tf)").cast("long").alias("mean_nlp_q6"))
    )
    src = _docs(spark, sf_dir).select("doc_id", "source")
    return d.join(src, "doc_id").select("doc_id", "source", "mean_nlp_q6")


@register(
    "perplexity_buckets",
    _SQL_UNI_MEAN
    + """,
    r AS (
      SELECT source, mean_nlp_q6,
             row_number() OVER (PARTITION BY source ORDER BY mean_nlp_q6, doc_id) AS rnk,
             count(*) OVER (PARTITION BY source) AS n
      FROM m
    )
    SELECT source, CAST(((rnk - 1) * 3) // n AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(mean_nlp_q6) AS BIGINT) AS min_nlp_q6,
           CAST(max(mean_nlp_q6) AS BIGINT) AS max_nlp_q6
    FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
)
def perplexity_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail quality buckets: per source, rank
    documents by mean unigram-LM surprisal and cut into exact terciles
    (bucket = (rank−1)·3 div n — integer math, identical split both
    engines and NEVER ntile(), whose remainder placement differs from
    this formula only when n%3≠0 — so the formula is spelled out in both).
    Head (bucket 0) = most-fluent-per-the-LM, tail (2) = rare-token soup;
    CCNet keeps head+middle and drops or down-weights tail.

    Scale shape: the rank is the `domain_cap` sub-sharded two-pass rank,
    NOT a whole-source window — mean_nlp_q6 div 10^6 (whole nats) splits
    each source into order-aligned range shards, per-(source, shard)
    counts get exclusive-prefix-summed (a window over the tiny
    sources×shards table), local ranks window over bounded shards, and
    the shard offset joins back un-hinted (AQE broadcasts when small).
    The oracle is the naive whole-source window — byte-identical ranks."""
    # m feeds two subtrees (shard counts + the ranked join) — materialize
    # once or the whole unigram-LM chain re-executes per consumer
    m = (
        _unigram_doc_mean(spark, sf_dir)
        .withColumn("shard", F.expr("mean_nlp_q6 div 1000000"))
        .localCheckpoint()
    )
    counts = m.groupBy("source", "shard").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "source",
        "shard",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("n"),
    )
    w_loc = Window.partitionBy("source", "shard").orderBy("mean_nlp_q6", "doc_id")
    ranked = (
        m.withColumn("lr", F.row_number().over(w_loc))
        .join(offsets, ["source", "shard"])
        .select(
            "source",
            "mean_nlp_q6",
            F.expr("((off + lr - 1) * 3) div n").cast("long").alias("bucket"),
        )
    )
    return (
        ranked.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("mean_nlp_q6").cast("long").alias("min_nlp_q6"),
            F.max("mean_nlp_q6").cast("long").alias("max_nlp_q6"),
        )
        .orderBy("source", "bucket")
    )


@register(
    "minhash_cluster_stats",
    _SQL_LSH_PAIRS
    + """,
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
    sizes AS (SELECT lbl, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY lbl),
    hist AS (
      SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
      FROM sizes GROUP BY cluster_size
    ),
    singles AS (
      SELECT CAST(1 AS BIGINT) AS cluster_size,
             CAST((SELECT count(*) FROM documents) - (SELECT count(*) FROM comp) AS BIGINT) AS n_clusters
    )
    SELECT cluster_size, n_clusters FROM hist
    UNION ALL SELECT cluster_size, n_clusters FROM singles WHERE n_clusters > 0
    ORDER BY cluster_size""",
)
def minhash_cluster_stats(spark, sf_dir):
    """Near-dup cluster-size histogram — the dedup QA readout (how much of
    the corpus is duplicated, and in what clump sizes) that decides
    keep-one-per-cluster savings: LSH candidate pairs → connected
    components → per-cluster sizes → (cluster_size, n_clusters), with
    unclustered docs reported as size-1 clusters (total docs − labeled).

    Scale shape: reuses `_lsh_pair_edges` (banded equi-join, nothing
    all-pairs) and the pointer-doubling `connected_components` (O(log
    diameter) rounds, raise-on-nonconvergence); the histogram is two
    doc_id-keyed aggs whose outputs shrink geometrically (docs → clusters
    → size classes). The singleton count is total − labeled, two scalar
    aggs — no join against the unlabeled majority."""
    edges = _lsh_pair_edges(spark, sf_dir)  # already checkpointed + memoized
    labels = edges.select(F.col("src").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("lbl")
    )
    comp = connected_components(labels, edges)
    sizes = comp.groupBy("lbl").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    n_total = _docs(spark, sf_dir).count()
    n_labeled = comp.count()
    singles = spark.createDataFrame(
        [(1, n_total - n_labeled)], "cluster_size long, n_clusters long"
    ).where(F.col("n_clusters") > 0)
    return hist.unionByName(singles).orderBy("cluster_size")


@register(
    "events_exactly_once_counts",
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
              event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
       FROM (SELECT DISTINCT event_id, ts, event_type, value FROM events)
       GROUP BY 1, 2 ORDER BY 1, 2""",
)
def events_exactly_once_counts(spark, sf_dir):
    """Exactly-once windowed counts over an at-least-once stream: dedup by
    event_id (replays are full-row broker redeliveries, so by-key dedup is
    deterministic), then the tumbling 1-hour rollup — the batch twin of
    the STREAMING ``dropDuplicatesWithinWatermark`` → windowed-agg chain
    (streaming/events.py::exactly_once_counts_stream, two stateful
    operators in one append-mode query; proven equal over micro-batches
    with injected replays in tests/test_events_streaming.py). On the
    driver's clean table (unique event_ids) this equals events_windowed —
    the dedup is the semantic contract, exercised by the replay test."""
    from docix_spark.streaming.events import exactly_once_counts

    return exactly_once_counts(_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# session 12 — ES query-surface completions (phrase_prefix, SynonymQuery,
# rescore window) + pipeline chunk dedup / output sharding / source entropy
# ---------------------------------------------------------------------------

# Positions CTE shared by the session-12 positional queries (1-based in
# DuckDB via generate_series; Spark uses 0-based posexplode — origins cancel
# in every gap/adjacency expression, per the phrase_slop precedent).
_SQL_POS = f"""pw AS ({SQL_WORDS}),
p AS (SELECT doc_id, i, words[i] AS term FROM pw, unnest(generate_series(1, len(words))) AS t(i))"""


@register(
    "match_phrase_prefix",
    f"""WITH {_SQL_POS},
dict AS (SELECT DISTINCT term FROM p),
exp AS (SELECT term FROM dict WHERE term LIKE 's%' ORDER BY term LIMIT 50),
a AS (SELECT doc_id, i FROM p WHERE term = 'fast'),
b AS (SELECT doc_id, i, term FROM p JOIN exp USING (term))
SELECT a.doc_id,
       CAST(count(*) AS BIGINT) AS n_positions,
       CAST(count(DISTINCT b.term) AS BIGINT) AS n_expansions
FROM a JOIN b ON a.doc_id = b.doc_id AND b.i = a.i + 1
GROUP BY a.doc_id ORDER BY a.doc_id""",
)
def match_phrase_prefix(spark, sf_dir):
    """ES ``match_phrase_prefix`` — the search-as-you-type phrase form the
    reference UI issues while the user is mid-word (the phrase analogue of
    the F5 prefix suggester, SearchAdapter.java:198-228): phrase
    "fast s*", where the LAST position is a prefix expanded to at most
    max_expansions=50 dictionary terms in term-dictionary (lexicographic)
    order — exactly Lucene's expansion rule, which walks the term dict in
    sorted order and stops at the cap, so the cap is deterministic
    cross-engine. A doc matches where 'fast' at position i is immediately
    followed by any expansion at i+1; per doc we report the occurrence
    count and how many distinct expansions fired.

    Scale shape: the expansion scan is vocab-sized (the A2 dictionary,
    orders smaller than the corpus) with a 50-row TakeOrdered; the
    positional legs are two pruned postings reads (first-term postings +
    the ≤50 expansion terms' postings), then ONE doc_id equi-join between
    two small position sets — phrase_slop's plan with a broadcast
    expansion set on the b side. Never a corpus scan."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(spark_tokens("text")).alias("pos", "term")
    )
    exp = (
        toks.select("term").distinct()
        .where(F.col("term").startswith("s"))
        .orderBy("term")
        .limit(50)
    )
    a = toks.where(F.col("term") == "fast").select("doc_id", F.col("pos").alias("pa"))
    b = toks.join(F.broadcast(exp), "term").select("doc_id", F.col("pos").alias("pb"), "term")
    return (
        a.join(b, "doc_id")
        .where(F.col("pb") == F.col("pa") + 1)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_positions"),
            F.countDistinct("term").cast("long").alias("n_expansions"),
        )
        .orderBy("doc_id")
    )


@register(
    "synonym_query_search",
    f"""WITH tf AS ({SQL_TF}),
dl AS ({SQL_DL}),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
syn AS (SELECT * FROM (VALUES ('scan', 0), ('filter', 0), ('join', 1)) AS t(term, gid)),
gdf AS (SELECT gid, max(df) AS df FROM syn JOIN dfs USING (term) GROUP BY gid),
gtf AS (SELECT tf.doc_id, syn.gid, CAST(sum(tf.tf) AS DOUBLE) AS tf
        FROM tf JOIN syn USING (term) GROUP BY tf.doc_id, syn.gid),
per AS (
  SELECT gtf.doc_id,
         ln(1.0 + ((SELECT n_docs FROM st) - gdf.df + 0.5) / (gdf.df + 0.5))
           * gtf.tf * 2.2
           / (gtf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / (SELECT avgdl FROM st))) AS s
  FROM gtf JOIN gdf USING (gid) JOIN dl USING (doc_id)
),
agg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6,
               CAST(count(*) AS BIGINT) AS nm
        FROM per GROUP BY doc_id),
ranked AS (SELECT doc_id, score_q6, nm,
                  row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
           FROM agg)
SELECT doc_id, score_q6, nm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def synonym_query_search(spark, sf_dir):
    """Lucene ``SynonymQuery`` scoring — what ES actually runs when the
    analyzer emits query-time synonyms at one position (the synonym
    token-filter layer under the reference's match queries,
    SearchAdapter.java:398-405 analysis chain): synonyms are ONE scoring
    atom, not a boolean OR. Per Lucene's SynonymQuery: the atom's document
    frequency is the MAX over member terms' df (blended idf — an OR would
    overcount), and its within-doc tf is the SUM of member tfs. Query here:
    group (scan ≡ filter) + plain term join, BM25 per atom, summed, top 10
    with the doc_id tiebreak.

    Scale shape: identical to bm25_topk — the synonym map is a broadcast
    VALUES table folded into the pruned postings join, the per-(doc, group)
    sum is absorbed by the same map-side partial agg as A1, and the blended
    df table is group-count-sized. Synonyms add zero exchanges over the
    plain query."""
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # dl derives FROM tf (doc_len = Σ tf), so dl/st/dfs all share tf's
    # exchange and ReusedExchange collapses the whole stats chain to ONE
    # tokenize pass — a dl keyed on toks directly was a second lineage
    # branch that re-ran the tokenize (4 scans per match set)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    st = dl.agg(F.count("*").cast("double").alias("n_docs"), F.avg("doc_len").alias("avgdl"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    syn = F.broadcast(
        spark.createDataFrame([("scan", 0), ("filter", 0), ("join", 1)], "term string, gid int")
    )
    gdf = syn.join(dfs, "term").groupBy("gid").agg(F.max("df").alias("df"))
    gtf = (
        tf.join(syn, "term")
        .groupBy("doc_id", "gid")
        .agg(F.sum("tf").cast("double").alias("tf"))
    )
    per = (
        gtf.join(F.broadcast(gdf), "gid").join(dl, "doc_id").crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf") * F.lit(2.2)
                / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doc_len") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    agg = per.groupBy("doc_id").agg(
        _q6(F.sum("s")).alias("score_q6"), F.count("*").cast("long").alias("nm")
    )
    topk = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    return (
        topk.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))).cast("long"),
        )
        .select("doc_id", "score_q6", "nm", "rank")
        .orderBy("rank")
    )


@register(
    "rescore_topn",
    _bm25_agg_ctes(_TOPK_TERMS)
    + f""",
{_SQL_POS},
ga AS (SELECT doc_id, i FROM p WHERE term = 'spark'),
gb AS (SELECT doc_id, i FROM p WHERE term = 'join'),
prox AS (SELECT ga.doc_id, 1000000 // (1 + min(gb.i - ga.i)) AS resc_q6
         FROM ga JOIN gb ON ga.doc_id = gb.doc_id AND gb.i - ga.i BETWEEN 1 AND 3
         GROUP BY ga.doc_id),
win AS (SELECT doc_id, score_q6 FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 30),
resc AS (SELECT win.doc_id, win.score_q6,
                CAST(COALESCE(prox.resc_q6, 0) AS BIGINT) AS resc_q6,
                win.score_q6 + 2 * CAST(COALESCE(prox.resc_q6, 0) AS BIGINT) AS combined_q6
         FROM win LEFT JOIN prox USING (doc_id)),
ranked AS (SELECT *, row_number() OVER (ORDER BY combined_q6 DESC, doc_id ASC) AS rank FROM resc)
SELECT doc_id, score_q6, resc_q6, combined_q6, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def rescore_topn(spark, sf_dir):
    """ES ``rescore`` — the two-pass ranking window every relevance-tuned
    deployment of the reference's search tier ends up using: pass 1 is the
    cheap BM25 query (bm25_topk's match set), pass 2 re-scores only the
    top window_size=30 docs with an expensive proximity query ('spark'
    followed by 'join' within slop 3; tightness bonus = 1e6 div (1+gap),
    pure integer), combined with ES's default score_mode=total as
    query_weight·orig + rescore_query_weight·resc (1 and 2 here) — all in
    BIGINT micro-units, so cross-engine equality is exact. Top 10 of the
    re-sorted window, doc_id tiebreak.

    Scale shape: THE point of rescore — the proximity legs join against a
    30-row broadcast window, never the corpus; cost of pass 2 is bounded by
    window_size regardless of data size. Pass 1 is the standard pruned
    postings plan; the window is one TakeOrdered. The positional token
    table is localCheckpoint'd ONCE and feeds all four consumers (tf, dl,
    and both proximity legs) — without it each lineage branch re-tokenizes
    the corpus (measured 10.7 s → 4.4 s at sf0.1; over a built index the
    legs are two pruned positional-postings reads instead)."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(spark_tokens("text")).alias("pos", "term")
    ).localCheckpoint()
    agg = _bm25_match_set(spark, sf_dir, _TOPK_TERMS, toks=toks.select("doc_id", "term"))
    win = agg.select("doc_id", "score_q6").orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(30)
    a = toks.where(F.col("term") == "spark").select("doc_id", F.col("pos").alias("pa"))
    b = toks.where(F.col("term") == "join").select("doc_id", F.col("pos").alias("pb"))
    gap = F.col("pb") - F.col("pa")
    prox = (
        a.join(b, "doc_id")
        .where(gap.between(1, 3))
        .groupBy("doc_id")
        .agg(F.expr("1000000 div (1 + min(pb - pa))").alias("resc_q6"))
    )
    resc = (
        win.join(prox, "doc_id", "left")
        .select(
            "doc_id",
            "score_q6",
            F.coalesce("resc_q6", F.lit(0)).cast("long").alias("resc_q6"),
        )
        .withColumn("combined_q6", F.col("score_q6") + F.lit(2) * F.col("resc_q6"))
    )
    return (
        resc.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("combined_q6"), F.asc("doc_id"))).cast("long"),
        )
        .where(F.col("rank") <= 10)
        .select("doc_id", "score_q6", "resc_q6", "combined_q6", "rank")
        .orderBy("rank")
    )


@register(
    "chunk_dedup_scrub",
    f"""WITH w AS ({SQL_WORDS}),
ch AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_to_string(words[(1 + 8 * i):(8 + 8 * i)], ' ')) AS h
  FROM w, unnest(generate_series(0, CAST(ceil(len(words) / 8.0) AS BIGINT) - 1)) AS t(i)
  WHERE len(words) >= 1
),
rk AS (SELECT doc_id, row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn FROM ch)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       (CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*) AS kept_frac_q6
FROM rk GROUP BY doc_id ORDER BY doc_id""",
)
def chunk_dedup_scrub(spark, sf_dir):
    """Paragraph-level exact dedup, the Dolma/CCNet scrub pass that runs
    BELOW whole-doc dedup (dedup_exact) and ABOVE n-gram overlap
    (dup_ngram_fraction): the corpus is chunked into non-overlapping
    8-token spans (the paragraph stand-in for this corpus's unstructured
    text — real pipelines split on newlines), each chunk keyed by md5, and
    a chunk SURVIVES iff this occurrence is the global first by
    (doc_id, chunk_idx) — every later copy anywhere in the corpus is
    scrubbed. Per doc: chunk count, surviving count, and the kept fraction
    in integer micro-units (exact BIGINT cross-multiplication, no float
    division).

    Scale shape: chunking is map-side array work inside codegen; the ONE
    shuffle is the chunk-hash key (md5 — uniform, self-spreading, no salt
    needed; the first-occurrence window partitions by it), then the
    per-doc rollup rides the doc_id key. Identical shape to
    dedup_survivor_tokens; at 100 TB this is the textbook
    hash-partitioned scrub."""
    w = _docs(spark, sf_dir).select("doc_id", spark_tokens("text").alias("words")).where(
        F.size("words") >= 1
    )
    ch = w.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(words) / 8.0) as int) - 1),"
                " i -> md5(concat_ws(' ', slice(words, 1 + 8 * i, 8))))"
            )
        ).alias("chunk_idx", "h"),
    )
    rk = ch.withColumn(
        "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "chunk_idx"))
    )
    kept = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long")
    return (
        rk.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            kept.alias("kept_chunks"),
        )
        .withColumn("kept_frac_q6", F.expr("(kept_chunks * 1000000) div n_chunks"))
        .orderBy("doc_id")
    )


@register(
    "shard_token_balance",
    f"""WITH dl AS ({SQL_DL}),
sh AS (SELECT d.doc_id,
              ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::UBIGINT::BIGINT % 16 AS shard,
              COALESCE(dl.doc_len, 0) AS n_tok
       FROM documents d LEFT JOIN dl USING (doc_id)),
agg AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM sh GROUP BY shard)
SELECT shard, n_docs, n_tokens,
       (n_tokens * 1000000) // (SELECT CAST(sum(n_tokens) AS BIGINT) FROM agg) AS share_q6
FROM agg ORDER BY shard""",
)
def shard_token_balance(spark, sf_dir):
    """Training-output shard plan: route every doc to one of 16 output
    shards by a content-independent deterministic hash (16-bit md5 slice
    of the doc id — the same cross-engine hash family as
    decontamination_bloom), and report per-shard doc count, token count,
    and token share in micro-units — the balance evidence a dataloader
    needs before writing tokenized shards (uneven shards straggle every
    training epoch). Docs with zero tokens still occupy a slot (LEFT join,
    length 0).

    Scale shape: the shard key is computed map-side; the rollup is a
    16-group hash agg fully absorbed by map-side partial aggregation —
    the output is 16 rows no matter the corpus size, and the actual shard
    WRITE this plans for is a single hash repartition by the same key
    (the _write_bucketed discipline, never dynamic-partition insert)."""
    dl = _toks(_docs(spark, sf_dir)).groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    sh = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(dl, "doc_id", "left")
        .select(
            F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 16"
            ).alias("shard"),
            F.coalesce("doc_len", F.lit(0)).alias("n_tok"),
        )
    )
    agg = sh.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"), F.sum("n_tok").cast("long").alias("n_tokens")
    )
    # total via an unpartitioned window over the 16-row agg — NOT a
    # crossJoin against agg.agg(...), whose second lineage branch would
    # re-run the whole tokenize upstream
    return (
        agg.withColumn("t", F.sum("n_tokens").over(Window.partitionBy()))
        .withColumn("share_q6", F.expr("(n_tokens * 1000000) div t"))
        .select("shard", "n_docs", "n_tokens", "share_q6")
        .orderBy("shard")
    )


@register(
    "source_unigram_entropy",
    f"""WITH tf AS ({SQL_TF}),
stf AS (SELECT d.source, tf.term, CAST(sum(tf.tf) AS BIGINT) AS tf
        FROM tf JOIN documents d USING (doc_id) GROUP BY d.source, tf.term),
n AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens FROM stf GROUP BY source),
per AS (SELECT stf.source,
               CAST(round(-(CAST(stf.tf AS DOUBLE) / n.n_tokens)
                          * ln(CAST(stf.tf AS DOUBLE) / n.n_tokens) * 1000000) AS BIGINT) AS h_q6
        FROM stf JOIN n USING (source))
SELECT per.source, n.n_tokens, CAST(sum(per.h_q6) AS BIGINT) AS entropy_q6
FROM per JOIN n USING (source)
GROUP BY per.source, n.n_tokens ORDER BY per.source""",
)
def source_unigram_entropy(spark, sf_dir):
    """Per-source unigram entropy H = -Σ p·ln p — the lexical-diversity
    score a training-mix curator reads next to temperature_mix_weights
    (low entropy = repetitive/templated source → down-weight; the
    Shannon-diversity gate in Gopher-style quality pipelines). Float
    discipline follows unigram_logprob exactly: each term's -p·ln p is
    computed in double with the IDENTICAL expression shape in both
    engines, rounded to q6 micro-nats FIRST, and the per-source total is
    an exact BIGINT sum — no float-accumulation order anywhere.

    Scale shape: per-(source, term) tf is the A1 agg re-keyed (one
    shuffle, map-side combine absorbs the volume — the key is
    vocab×sources, self-spreading); the per-source totals table is
    sources-sized and broadcast back. Nothing wider than the vocabulary
    ever sits in one task."""
    d = _docs(spark, sf_dir)
    tf = _toks(d).groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    stf = (
        tf.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", "term")
        .agg(F.sum("tf").cast("long").alias("tf"))
        # vocab×sources rows; three consumers (n, per, final join) would
        # each replay the tokenize upstream without this
        .localCheckpoint()
    )
    n = stf.groupBy("source").agg(F.sum("tf").cast("long").alias("n_tokens"))
    p = F.col("tf").cast("double") / F.col("n_tokens")
    per = stf.join(F.broadcast(n), "source").select(
        "source", _q6(-p * F.log(p)).alias("h_q6")
    )
    return (
        per.groupBy("source")
        .agg(F.sum("h_q6").cast("long").alias("entropy_q6"))
        .join(F.broadcast(n), "source")
        .select("source", "n_tokens", "entropy_q6")
        .orderBy("source")
    )


@register(
    "cross_fields_search",
    f"""WITH {_SQL_POS},
fld AS (SELECT doc_id, CASE WHEN i <= 8 THEN 'title' ELSE 'body' END AS field, term FROM p),
tf AS (SELECT doc_id, field, term, count(*) AS tf FROM fld GROUP BY doc_id, field, term),
dl AS (SELECT doc_id, field, count(*) AS dl FROM fld GROUP BY doc_id, field),
av AS (SELECT field, avg(dl) AS avgdl FROM dl GROUP BY field),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM fld),
dfs AS (SELECT field, term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY field, term),
bdf AS (SELECT term, max(df) AS df FROM dfs WHERE term IN ('spark', 'hash', 'join') GROUP BY term),
per AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + ((SELECT n_docs FROM nd) - bdf.df + 0.5) / (bdf.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / av.avgdl)) AS s
  FROM tf JOIN bdf USING (term) JOIN dl USING (doc_id, field) JOIN av USING (field)
),
mx AS (SELECT doc_id, term, max(s) AS s FROM per GROUP BY doc_id, term),
agg AS (SELECT doc_id, CAST(round(sum(s) * 1000000) AS BIGINT) AS score_q6,
               CAST(count(*) AS BIGINT) AS nm
        FROM mx GROUP BY doc_id),
ranked AS (SELECT doc_id, score_q6, nm,
                  row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
           FROM agg)
SELECT doc_id, score_q6, nm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def cross_fields_search(spark, sf_dir):
    """ES ``multi_match`` type=cross_fields — the term-centric complement
    of best_fields (§2.8's composite tree, SearchAdapter.java:388-397):
    where best_fields asks "which FIELD best matches the whole query",
    cross_fields asks "which DOC matches all terms, in whichever field
    each lands" — names split across firstname/lastname are the canonical
    case; here the fields are title (first 8 positions) / body (rest).
    Per Lucene's blended term query: each term's df is BLENDED to the max
    across fields (a per-field idf would overweight a term rare in one
    field but common elsewhere), each field keeps its own length norm,
    and per term the doc takes the best field's contribution
    (tie_breaker=0 dis-max), summed over terms. N for idf = docs with any
    tokens (the blended docCount simplification, stated here).

    Scale shape: same pruned postings plan as bm25_topk with field as one
    extra grouping column (per-field tf/dl ride the SAME doc_id-keyed
    exchange); the blended-df table is query-terms-sized and the per-field
    avgdl table is 2 rows — both broadcast. The per-(doc, term) dis-max is
    a 2-row-per-group partial agg absorbed map-side. The field-tagged
    token table is localCheckpoint'd once for its three consumers
    (tf → dfs, dl → av, nd) — the rescore_topn lesson."""
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
    nd = fld.select("doc_id").distinct().agg(F.count("*").cast("double").alias("n_docs"))
    dfs = tf.groupBy("field", "term").agg(F.count("*").cast("double").alias("df"))
    q = F.broadcast(spark.createDataFrame([(t,) for t in _TOPK_TERMS], "term string"))
    bdf = dfs.join(q, "term").groupBy("term").agg(F.max("df").alias("df"))
    per = (
        tf.join(F.broadcast(bdf), "term")
        .join(dl, ["doc_id", "field"])
        .join(F.broadcast(av), "field")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf").cast("double") * F.lit(2.2)
                / (F.col("tf").cast("double") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    mx = per.groupBy("doc_id", "term").agg(F.max("s").alias("s"))
    agg = mx.groupBy("doc_id").agg(
        _q6(F.sum("s")).alias("score_q6"), F.count("*").cast("long").alias("nm")
    )
    topk = agg.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(10)
    return (
        topk.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))).cast("long"),
        )
        .select("doc_id", "score_q6", "nm", "rank")
        .orderBy("rank")
    )
