"""Event-stream analytics — Structured Streaming operators over the
``events`` table shape (event_id, ts, user_id, event_type, value, props).

The reference has no temporal semantics (SURVEY.md §2.9); these are the
beyond-reference streaming operators a training-data pipeline needs
(task brief: watermarks + windowed aggs for late data,
applyInPandasWithState for custom stateful operators). Every streaming
operator has a BATCH TWIN with identical semantics — the twin is the
driver-contract oracle (DuckDB-checkable SQL) and the pytest ground truth
for the streaming path.

- :func:`windowed_counts` / :func:`windowed_counts_stream` — tumbling
  1-hour windows per event_type (count + value sum). The stream is
  watermarked: state for windows older than the watermark is dropped, so
  state size is bounded by (active windows x event types) regardless of
  stream length — the 100 TB property.
- :func:`sessionize` / :func:`sessionize_stream` — gap-based sessions per
  user (a new session starts after > ``gap_sec`` of inactivity). Batch:
  gaps-and-islands over a lag window. Streaming: a custom stateful
  operator via ``applyInPandasWithState`` — per-user state holds
  (last_ts, session_start, n_events); a closed session is emitted the
  moment the gap is observed. State is one tiny tuple per ACTIVE user.
- :func:`props_json_stats` — JSON handling on the props column
  (get_json_object / json_extract), per event_type.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800  # 30 min inactivity closes a session

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _q6(col) -> F.Column:
    return F.round(col * F.lit(1_000_000.0)).cast("long")


# ---------------------------------------------------------------------------
# tumbling-window aggregation
# ---------------------------------------------------------------------------


def windowed_counts(events: DataFrame) -> DataFrame:
    """Batch twin: tumbling 1-hour windows per event_type."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            # cents-exact integer sum: float addition order differs across
            # engines/partitions, integer sums do not
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start_epoch"),
            "event_type",
            "n",
            "value_cents",
        )
        .orderBy("window_start_epoch", "event_type")
    )


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_windowed",
    watermark: str = "10 minutes",
):
    """Streaming path: file-source micro-batches → tumbling windows.

    Complete-output memory sink for in-process verification of ALL windows
    (including ones the watermark has not finalized). NOTE: in complete
    mode Spark retains every window's state and ignores the watermark for
    both eviction and late-row dropping — so this specific query does NOT
    demonstrate bounded state on an unbounded stream. The bounded-state /
    late-drop property (windows older than max(ts) - watermark finalized,
    state evicted, late rows dropped) is exercised by the append-mode query
    in tests/test_events_streaming.py::test_watermark_drops_late_rows,
    which is the production shape; complete mode exists only so the driver
    contract can compare the FULL window set against the batch twin."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start_epoch"),
            "event_type",
            "n",
            "value_cents",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# gap sessionization
# ---------------------------------------------------------------------------


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Batch twin: gaps-and-islands — a session break wherever the gap to
    the previous event of the same user exceeds ``gap_sec``. One row per
    session: (user_id, session_start_epoch, n_events)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t")
    # parquet timestamps arrive as TIMESTAMP_NTZ; route through timestamp
    # (UTC session) to get epoch seconds with sub-second precision
    e = events.select(
        "user_id", F.col("ts").cast("timestamp").cast("double").alias("t")
    )
    marked = e.withColumn(
        "new_sess",
        F.when(
            F.lag("t").over(w).isNull() | (F.col("t") - F.lag("t").over(w) > gap_sec),
            1,
        ).otherwise(0),
    ).withColumn("sess_no", F.sum("new_sess").over(w))
    return (
        marked.groupBy("user_id", "sess_no")
        .agg(
            # explicit floor: DuckDB's double->BIGINT cast ROUNDS while
            # Spark's truncates — floor on both sides is unambiguous
            F.floor(F.min("t")).cast("long").alias("session_start_epoch"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select("user_id", "session_start_epoch", "n_events")
        .orderBy("user_id", "session_start_epoch")
    )


def closed_sessions(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """All sessions EXCEPT each user's last (still-open) one — exactly the
    set the streaming operator has emitted when the stream pauses."""
    from pyspark.sql import Window

    s = sessionize(events, gap_sec)
    w = Window.partitionBy("user_id")
    return (
        s.withColumn("last_start", F.max("session_start_epoch").over(w))
        .where(F.col("session_start_epoch") < F.col("last_start"))
        .select("user_id", "session_start_epoch", "n_events")
        .orderBy("user_id", "session_start_epoch")
    )


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_sessions",
    gap_sec: int = SESSION_GAP_SEC,
):
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    state is (last_ts, session_start, n_events); a session is emitted the
    moment an event arrives past the gap. State is O(active users), not
    O(events) — the property that survives an unbounded stream.

    Requires event-time-ordered micro-batches per user (file source fed in
    ts order), the standard log-ingest contract."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_t, start_t, n = state.get
        else:
            last_t, start_t, n = None, None, 0
        out = []
        ts_all: list[float] = []
        for pdf in pdfs:
            ts_all.extend(pdf["t"].tolist())
        for t in sorted(ts_all):
            if last_t is not None and t - last_t > gap_sec:
                import math

                out.append((user_id, int(math.floor(start_t)), n))
                start_t, n = t, 0
            if start_t is None:
                start_t = t
            n += 1
            last_t = t
        state.update((float(last_t), float(start_t), int(n)))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start_epoch", "n_events"]
        )

    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    sessions = (
        stream.select(
            "user_id", F.col("ts").cast("timestamp").cast("double").alias("t")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, session_start_epoch long, n_events long",
            stateStructType="last_t double, start_t double, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_stream_timeout(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_sessions_to",
    gap_sec: int = SESSION_GAP_SEC,
):
    """Sessionization with EVENT-TIME TIMEOUTS: like
    :func:`sessionize_stream`, but a session idle past ``gap_sec`` is
    ALSO flushed when the watermark passes its deadline — no later event
    from the same user is needed. This is the state-expiry half of the
    stateful-operator contract: without it, one-visit users would pin
    state forever; with it, state strictly tracks users active within the
    gap window."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        (user_id,) = key
        cols = ["user_id", "session_start_epoch", "n_events"]
        if state.hasTimedOut:
            # watermark passed last_t + gap: flush the idle session
            last_t, start_t, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, int(math.floor(start_t)), int(n))], columns=cols
            )
            return
        if state.exists:
            last_t, start_t, n = state.get
        else:
            last_t, start_t, n = None, None, 0
        out = []
        ts_all: list[float] = []
        for pdf in pdfs:
            ts_all.extend(pdf["t"].tolist())
        for t in sorted(ts_all):
            if last_t is not None and t - last_t > gap_sec:
                out.append((user_id, int(math.floor(start_t)), n))
                start_t, n = t, 0
            if start_t is None:
                start_t = t
            n += 1
            last_t = t
        state.update((float(last_t), float(start_t), int(n)))
        # deadline: the watermark crossing last_t + gap closes this session
        state.setTimeoutTimestamp(int((last_t + gap_sec) * 1000))
        yield pd.DataFrame(out, columns=cols)

    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    sessions = (
        stream.select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("ts").cast("timestamp").cast("double").alias("t"),
        )
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, session_start_epoch long, n_events long",
            stateStructType="last_t double, start_t double, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# JSON props handling
# ---------------------------------------------------------------------------


def props_json_stats(events: DataFrame) -> DataFrame:
    """Per-event_type stats over the JSON props payload (k extraction)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(k).cast("long").alias("k_sum"),
            _q6(F.avg(k)).alias("k_avg_q6"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# as-of attribution (stream-stream time-interval join)
# ---------------------------------------------------------------------------

ASOF_HORIZON_SEC = 3600  # attribution lookback window


def asof_attribution(events: DataFrame, horizon_sec: int = ASOF_HORIZON_SEC) -> DataFrame:
    """Batch twin: each purchase matched to the LATEST 'view' by the same
    user within ``horizon_sec`` strictly before it. The bounded lookback
    is what makes the streaming form possible at all — an unbounded as-of
    (driver op ``events_asof_join``) would need infinite join state on a
    stream; the horizon caps state at (views inside the watermark+horizon
    band) per user.

    One row per attributable purchase:
    (event_id, user_id, purchase_us, view_us, gap_us)."""
    v = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").cast("timestamp").alias("v_ts")
    )
    p = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("p_ts")
    )
    j = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {int(horizon_sec)} SECOND")),
    )
    return (
        j.groupBy("event_id", "user_id", "p_ts")
        .agg(F.max("v_ts").alias("v_ts"))
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(p_ts)").alias("purchase_us"),
            F.expr("unix_micros(v_ts)").alias("view_us"),
            (F.expr("unix_micros(p_ts)") - F.expr("unix_micros(v_ts)")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


def asof_attribution_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_asof",
    horizon_sec: int = ASOF_HORIZON_SEC,
    watermark: str = "10 minutes",
):
    """Streaming as-of attribution: a watermarked STREAM-STREAM
    time-interval self-join (purchases ⋈ views on user within the horizon)
    followed by a second stateful operator — the per-purchase max-view
    aggregation — emitting in append mode once the watermark passes the
    purchase's event time.

    State bounds (the 100 TB property): the join buffers each side only
    inside watermark + horizon (Spark evicts view rows once no future
    purchase can match them — the time-interval condition is what enables
    eviction); the aggregation holds one row per in-flight purchase.
    Late views beyond the watermark are dropped, exactly the trade the
    batch twin's horizon encodes."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    v = (
        stream.where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").cast("timestamp").alias("v_ts"))
        .withWatermark("v_ts", watermark)
    )
    p = (
        stream.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    j = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {int(horizon_sec)} SECOND")),
    )
    best = (
        j.groupBy("event_id", "user_id", "p_ts")
        .agg(F.max("v_ts").alias("v_ts"))
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(p_ts)").alias("purchase_us"),
            F.expr("unix_micros(v_ts)").alias("view_us"),
            (F.expr("unix_micros(p_ts)") - F.expr("unix_micros(v_ts)")).alias("gap_us"),
        )
    )
    return (
        best.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# exactly-once window counts over an at-least-once stream
# ---------------------------------------------------------------------------


def exactly_once_counts(events: DataFrame) -> DataFrame:
    """Batch twin: tumbling 1-hour window counts AFTER dedup by event_id —
    the exactly-once rollup of an at-least-once delivery (replays are
    full-row copies with the same event_id, the broker-redelivery
    contract; dedup-by-key is therefore deterministic)."""
    return windowed_counts(events.dropDuplicates(["event_id"]))


def exactly_once_counts_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_dedup",
    watermark: str = "10 minutes",
):
    """Streaming exactly-once windowed counts: ``dropDuplicatesWithinWatermark``
    on event_id CHAINED into the watermarked tumbling-window aggregation —
    two stateful operators in one append-mode query (the shape Spark 3.5+
    multi-stateful support exists for).

    State bounds (the 100 TB property): the dedup operator keeps one key
    per event_id seen inside the watermark band and EVICTS it once the
    watermark passes — unlike plain ``dropDuplicates`` on a stream, whose
    state grows forever; the window state is (active windows × event
    types). A replay arriving later than the watermark would slip through
    dedup — the same late-data trade every watermarked operator makes, and
    exactly why the broker's redelivery timeout must sit inside the
    watermark delay."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    dd = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = (
        dd.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start_epoch"),
            "event_type",
            "n",
            "value_cents",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# mergeable count-min sketch over the user-activity stream
# ---------------------------------------------------------------------------


def _cms_positions(events: DataFrame) -> DataFrame:
    """Four (row, position) coordinates per event: 16-bit md5 slices of
    the user id mod 1024 — the countmin_heavyhitters hash family keyed on
    user_id instead of term (same cross-engine integer construction)."""
    return events.select(
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"), "user_id"
    ).select(
        "i",
        F.expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1 + 4 * i, 4), 16, 10) as int) % 1024"
        ).alias("pos"),
    )


def countmin_user_cells(events: DataFrame) -> DataFrame:
    """Batch twin: the 4 x 1024 count-min cell table of per-user event
    counts (cells absent when no user hashes there). CMS cells are
    ADDITIVE — the batch table over a union of days equals the cell-wise
    sum of per-day tables, which is exactly why the streaming side can
    maintain it as a running aggregation with 4 096 rows of state."""
    return (
        _cms_positions(events)
        .groupBy("i", "pos")
        .agg(F.count("*").cast("long").alias("cell"))
        .orderBy("i", "pos")
    )


def countmin_user_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_cms",
):
    """Streaming count-min maintenance: the same four-coordinate explode
    feeding a running groupBy in COMPLETE output mode — the sketch IS the
    streaming state, bounded at 4 096 cells no matter how many trillion
    events flow through (the property that makes CMS the streaming
    heavy-hitter structure; contrast a per-user exact count, whose state
    is user-cardinality-sized). availableNow file-drop trigger matches
    the incremental-index ingest harness."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    cells = (
        _cms_positions(stream)
        .groupBy("i", "pos")
        .agg(F.count("*").cast("long").alias("cell"))
    )
    return (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _hll_user_ranks(events: DataFrame) -> DataFrame:
    # 60-bit md5 hash of user_id -> register = h % 256, rank = leading-zero
    # count of the remaining 52 bits + 1 (the integer-exact length(bin())
    # idiom) — the same deterministic HLL p=8 family as cardinality_sketch
    return events.select(
        F.expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"
        ).alias("h")
    ).select(
        F.expr("h % 256").alias("reg"),
        F.expr(
            "CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END"
        ).alias("rnk"),
    )


def hll_user_registers(events: DataFrame) -> DataFrame:
    """Batch twin: the 256-register HLL table of distinct-user structure.
    Registers merge by MAX — the register table over a union of days is
    the register-wise max of per-day tables, which is why the streaming
    side maintains the identical table as a running aggregation whose
    state is <= 256 rows no matter how many events flow (and why
    duplicate user_ids need no distinct pass anywhere)."""
    return (
        _hll_user_ranks(events)
        .groupBy("reg")
        .agg(F.max("rnk").cast("long").alias("maxr"))
        .select(F.col("reg").cast("long").alias("reg"), "maxr")
        .orderBy("reg")
    )


def hll_user_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_hll",
):
    """Streaming HLL maintenance: the register table as a COMPLETE-mode
    running max-aggregation — the sketch IS the streaming state, bounded
    at 256 rows regardless of stream length or user cardinality (contrast
    a distinct-user count, whose state grows with users). Second
    streaming-maintained sketch next to countmin_user_stream: CMS cells
    merge by SUM, HLL registers by MAX — both land on bounded-state
    running aggs with availableNow file-drop ingestion."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    regs = _hll_user_ranks(stream).groupBy("reg").agg(
        F.max("rnk").cast("long").alias("maxr")
    )
    return (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# top-metrics (latest reading per series) over the event stream
# ---------------------------------------------------------------------------


def _top_metric_rows(events: DataFrame) -> DataFrame:
    return events.select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )


def top_metrics_cells(events: DataFrame) -> DataFrame:
    """Batch twin: the latest (ts, event_id)-argmax metric per event type
    — driver_queries.top_metrics_latest's plan, repeated here so the
    stream/batch identity test compares the exact expression tree. The
    per-type argmax struct merges by lexicographic MAX, which is what
    makes the streaming side a bounded running aggregation."""
    g = _top_metric_rows(events).groupBy("event_type").agg(
        F.max(F.struct("ts_us", "event_id", "cents")).alias("top")
    )
    return g.select(
        "event_type",
        F.col("top.ts_us").cast("long").alias("ts_us"),
        F.col("top.event_id").cast("long").alias("event_id"),
        F.col("top.cents").cast("long").alias("cents"),
    ).orderBy("event_type")


def top_metrics_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_topm",
):
    """Streaming top-metrics maintenance: the per-type latest reading as a
    COMPLETE-mode running MAX-of-struct aggregation — state is
    |event_types| rows no matter how many events flow, and the argmax
    struct is REPLAY-INSENSITIVE (max is idempotent and commutative, so
    duplicate or reordered file drops cannot change the answer). Third
    mergeable-state flavor next to CMS (sum-merge) and HLL (max-merge):
    this one max-merges a composite ORDER, the 'last value' every
    metrics dashboard serves."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    g = _top_metric_rows(stream).groupBy("event_type").agg(
        F.max(F.struct("ts_us", "event_id", "cents")).alias("top")
    )
    cells = g.select(
        "event_type",
        F.col("top.ts_us").cast("long").alias("ts_us"),
        F.col("top.event_id").cast("long").alias("event_id"),
        F.col("top.cents").cast("long").alias("cents"),
    )
    return (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership bits over the event stream's users
# ---------------------------------------------------------------------------


def _bloom_user_positions(events: DataFrame) -> DataFrame:
    # k=4 16-bit positions from disjoint md5 hex slices of the user id —
    # the decontamination_bloom construction pointed at users; m = 2^16.
    slices = ", ".join(
        f"cast(conv(substring(md5(cast(user_id as string)), {s}, 4), 16, 10) as int)"
        for s in (1, 5, 9, 13)
    )
    return events.select(F.explode(F.expr(f"array({slices})")).alias("pos"))


def bloom_user_bits(events: DataFrame) -> DataFrame:
    """Batch twin: the set-bit table of the user Bloom filter. Bits merge
    by OR (presence is idempotent), so the bit table over a union of
    drops is the union of per-drop tables — which is why the streaming
    side maintains the identical table as a running aggregation whose
    state is <= 65 536 rows regardless of stream length, and why
    duplicate user_ids need no distinct pass anywhere."""
    return (
        _bloom_user_positions(events)
        .groupBy("pos")
        .agg(F.max(F.lit(1)).cast("long").alias("hit"))
        .select(F.col("pos").cast("long").alias("pos"), "hit")
        .orderBy("pos")
    )


def bloom_user_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_bloom",
):
    """Streaming Bloom-filter maintenance: the set-bit table as a
    COMPLETE-mode running aggregation — the fourth mergeable-state
    flavor next to CMS (sum-merge), HLL (max-merge) and top-metrics
    (argmax-merge): Bloom bits OR-merge, the idempotent one. The live
    use is streaming novelty ("have we seen this user") with bounded
    state: membership probes read k=4 cells, and the bit count feeds
    the standard -m/k ln(1-t/m) cardinality estimate
    (driver_queries.bloom_user_estimate is the summary twin)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    bits = _bloom_user_positions(stream).groupBy("pos").agg(
        F.max(F.lit(1)).cast("long").alias("hit")
    )
    return (
        bits.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# k-mins (per-register minimum hash) cardinality sketch over the stream
# ---------------------------------------------------------------------------


def _kmins_user_values(events: DataFrame) -> DataFrame:
    # 52-bit md5 hash seeded 'km:' (hash-input disjointness from the HLL
    # and bloom coordinates) -> register = h % 32, value = h div 32
    # (47 uniform bits) — the stochastic-averaging k-mins layout.
    return events.select(
        F.expr(
            "cast(conv(substring(md5(concat('km:', cast(user_id as string))), 1, 13),"
            " 16, 10) as bigint)"
        ).alias("h")
    ).select(
        F.expr("h % 32").alias("reg"),
        F.expr("h div 32").alias("v"),
    )


def kmins_user_cells(events: DataFrame) -> DataFrame:
    """Batch twin: the 32-register minimum-hash table of distinct-user
    structure (Flajolet/Cohen k-mins with stochastic averaging — each
    register keeps the SMALLEST 47-bit hash value routed to it).
    Registers merge by MIN — the table over a union of drops is the
    register-wise min of per-drop tables — so the streaming side
    maintains the identical table as a running aggregation with <= 32
    rows of state, and duplicate user_ids need no distinct pass. The
    k(k-1)·2^47/Σmin estimator lives in
    driver_queries.kmins_user_estimate (the accuracy-audit twin)."""
    return (
        _kmins_user_values(events)
        .groupBy("reg")
        .agg(F.min("v").cast("long").alias("minv"))
        .select(F.col("reg").cast("long").alias("reg"), "minv")
        .orderBy("reg")
    )


def kmins_user_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_kmins",
):
    """Streaming k-mins maintenance: the register-minimum table as a
    COMPLETE-mode running MIN-aggregation — the FIFTH mergeable-state
    flavor next to CMS (sum), HLL (max), top-metrics (argmax) and Bloom
    (OR): per-register minima MIN-merge, idempotent and commutative, so
    replayed or reordered file drops cannot change the answer. Contrast
    the bottom-k (KMV) sketch, which is NOT a running aggregation — its
    k smallest values interact across rows — while the k-mins register
    layout is exactly groupBy(reg).min(v) with bounded state."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    cells = _kmins_user_values(stream).groupBy("reg").agg(
        F.min("v").cast("long").alias("minv")
    )
    return (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# log-bucket value histogram (streaming quantile sketch) over purchase values
# ---------------------------------------------------------------------------


def _value_log_buckets(events: DataFrame) -> DataFrame:
    # purchase cents -> log2 bucket via the integer-exact length(bin()) idiom;
    # zero/negative-cent rows clamp to bucket 0
    return events.where(F.col("event_type") == "purchase").select(
        F.expr(
            "CAST(length(bin(greatest(CAST(round(value * 100) AS BIGINT), 1))) - 1"
            " AS BIGINT)"
        ).alias("bucket")
    )


def value_hist_cells(events: DataFrame) -> DataFrame:
    """Batch twin: the log2-bucket count table of purchase values — a
    fixed-boundary quantile SKETCH whose cells merge by SUM, so the
    streaming side maintains the identical table as a running
    aggregation with <= ~48 rows of state no matter how many purchases
    flow. The percentile estimator (interpolate inside the containing
    bucket) lives in driver_queries.logbucket_quantile_estimate, which
    also audits it against the exact quantile."""
    return (
        _value_log_buckets(events)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("bucket")
    )


def value_hist_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_vhist",
):
    """Streaming quantile-sketch maintenance: the log-bucket histogram as
    a COMPLETE-mode running SUM aggregation — the sketch family's
    QUANTILE member next to CMS (frequencies), HLL/k-mins (cardinality),
    Bloom (membership) and top-metrics (argmax): fixed boundaries make
    the cells mergeable where data-dependent structures (t-digest)
    are not order-insensitive, and any percentile is answerable from
    bounded state at log2-bucket resolution."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    cells = _value_log_buckets(stream).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# WINDOWED HLL — per-tumbling-window sketch under a watermark (round 5)
# ---------------------------------------------------------------------------


def hll_window_registers(events: DataFrame) -> DataFrame:
    """Batch twin: the 256-register HLL table PER tumbling 1-hour window —
    distinct-user structure per hour, the windowed counterpart of
    hll_user_registers' single running sketch. Register rows per window
    merge by MAX exactly as in the running form; the window key just
    scopes the merge."""
    return (
        _hll_user_ranks_windowed(events)
        .groupBy("window_start_epoch", "reg")
        .agg(F.max("rnk").cast("long").alias("maxr"))
        .select(
            "window_start_epoch", F.col("reg").cast("long").alias("reg"), "maxr"
        )
        .orderBy("window_start_epoch", "reg")
    )


def _hll_user_ranks_windowed(events: DataFrame) -> DataFrame:
    return events.select(
        F.window("ts", "1 hour").alias("w"),
        F.expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    ).select(
        F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start_epoch"),
        F.expr("h % 256").alias("reg"),
        F.expr(
            "CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END"
        ).alias("rnk"),
    )


def hll_window_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_hll_window",
    watermark: str = "30 minutes",
):
    """Streaming windowed-HLL maintenance in APPEND mode — the seventh
    streaming-state shape and the first WINDOWED sketch (all prior sketch
    twins are complete-mode running aggs): tumbling 1-hour windows of
    distinct-user registers under a watermark, each window's ≤256-row
    register block emitted exactly once when the watermark passes its
    end, its state then evicted. State is bounded by (open windows ×
    256) rows regardless of stream length OR user cardinality — the
    production shape for 'distinct users per hour' on an unbounded
    stream, where the exact-distinct form's per-window state grows with
    users. Late rows beyond the watermark are dropped, the documented
    append-mode trade (the batch twin over the full file set is the
    reconciliation path)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir)
    regs = (
        stream.withWatermark("ts", watermark)
        .select(
            F.col("ts"),
            F.expr(
                "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"
            ).alias("h"),
        )
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.expr("h % 256").alias("reg"),
        )
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END"
                )
            ).cast("long").alias("maxr")
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start_epoch"),
            F.col("reg").cast("long").alias("reg"),
            "maxr",
        )
    )
    return (
        regs.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
