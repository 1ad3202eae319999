"""Structured Streaming event analytics == their batch twins.

The batch twins are the DuckDB-checked driver-contract entries
(events_windowed / events_sessionize); here the REAL streaming paths —
watermarked tumbling windows and the applyInPandasWithState gap
sessionizer — must produce the same answers over chronological
micro-batches of the events table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from docix_spark.streaming.events import (
    closed_sessions,
    sessionize_stream,
    windowed_counts,
    windowed_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_drops(spark, tmp_root):
    """The events table split into 3 chronological parquet files — each
    becomes one micro-batch (maxFilesPerTrigger=1)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("ts")
    rows = events.collect()
    n = len(rows)
    d = f"{tmp_root}/event_drops"
    os.makedirs(d, exist_ok=True)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        chunk = spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], events.schema)
        chunk.coalesce(1).write.mode("overwrite").parquet(f"{tmp_root}/_ev{i}")
        for f in os.listdir(f"{tmp_root}/_ev{i}"):
            if f.endswith(".parquet"):
                os.replace(
                    os.path.join(f"{tmp_root}/_ev{i}", f),
                    os.path.join(d, f"chunk_{i}.parquet"),
                )
    return d


def test_windowed_stream_matches_batch(spark, event_drops, tmp_root):
    q = windowed_counts_stream(
        spark, event_drops, f"{tmp_root}/ev_win_ckpt", query_name="t_ev_win"
    )
    q.awaitTermination(180)
    got = {
        (r.window_start_epoch, r.event_type): (r.n, r.value_cents)
        for r in spark.sql("SELECT * FROM t_ev_win").collect()
    }
    want = {
        (r.window_start_epoch, r.event_type): (r.n, r.value_cents)
        for r in windowed_counts(spark.read.parquet(f"{SF_DIR}/events.parquet")).collect()
    }
    assert got == want and len(want) > 10


def test_sessionize_stream_matches_batch(spark, event_drops, tmp_root):
    q = sessionize_stream(
        spark, event_drops, f"{tmp_root}/ev_sess_ckpt", query_name="t_ev_sess"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.user_id, r.session_start_epoch, r.n_events)
        for r in spark.sql("SELECT * FROM t_ev_sess").collect()
    )
    want = sorted(
        (r.user_id, r.session_start_epoch, r.n_events)
        for r in closed_sessions(spark.read.parquet(f"{SF_DIR}/events.parquet")).collect()
    )
    assert got == want and len(want) > 10


def test_watermark_drops_late_events_in_append_mode(spark, tmp_root):
    """Late-data semantics, concretely: an event arriving AFTER the
    watermark passed its window is dropped from the append-mode stream
    (the batch twin still counts it) — the state-bounding contract that
    lets the windowed aggregation run forever."""
    import datetime as dt

    from docix_spark.streaming.events import EVENTS_SCHEMA

    def ev(eid, hh, mm, etype="click"):
        return (
            eid,
            dt.datetime(2024, 3, 1, hh, mm, 0),
            1,
            etype,
            1.0,
            '{"k": 1}',
        )

    d = f"{tmp_root}/late_drops"
    os.makedirs(d, exist_ok=True)
    # the engine applies the advanced watermark with a one-batch lag, so
    # the late event arrives TWO batches after the advance (measured:
    # numRowsDroppedByWatermark=1 in its batch)
    batches = [
        [ev(0, 10, 0), ev(1, 10, 30)],   # window [10:00, 11:00)
        [ev(2, 12, 0)],                   # advances watermark to 11:50
        [ev(3, 12, 5)],                   # watermark now applied
        [ev(4, 10, 15)],                  # LATE: 10:15 << watermark -> dropped
        [ev(5, 12, 10)],                  # finalizes [10:00) after the late one
    ]
    import time

    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, EVENTS_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_root}/_late{i}")
        for f in os.listdir(f"{tmp_root}/_late{i}"):
            if f.endswith(".parquet"):
                os.replace(
                    os.path.join(f"{tmp_root}/_late{i}", f),
                    os.path.join(d, f"chunk_{i}.parquet"),
                )
        time.sleep(1.1)  # distinct mtimes: file-source batch order

    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start_epoch"),
            "n",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_win")
        .option("checkpointLocation", f"{tmp_root}/late_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        r.window_start_epoch: r.n for r in spark.sql("SELECT * FROM t_late_win").collect()
    }
    w10 = int(dt.datetime(2024, 3, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp())
    # the finalized 10:00 window counts ONLY the on-time events — the late
    # arrival (event 3) was dropped by the watermark
    assert emitted[w10] == 2
    # the batch twin over the same files counts all three
    batch = (
        spark.read.parquet(d)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").cast("long").alias("s"), "n")
    )
    assert {r.s: r.n for r in batch.collect()}[w10] == 3


def test_event_time_timeout_flushes_idle_session(spark, tmp_root):
    """EventTimeTimeout: a user's idle session is emitted once the
    watermark passes last_event + gap — WITHOUT any further event from
    that user (the state-expiry half NoTimeout can't provide)."""
    import datetime as dt
    import time

    from docix_spark.streaming.events import EVENTS_SCHEMA, sessionize_stream_timeout

    def ev(eid, uid, hh, mm):
        return (eid, dt.datetime(2024, 3, 1, hh, mm, 0), uid, "click", 1.0, '{"k": 1}')

    d = f"{tmp_root}/timeout_drops"
    os.makedirs(d, exist_ok=True)
    batches = [
        [ev(0, 1, 10, 0), ev(1, 1, 10, 5)],  # user 1: one session, then idle
        [ev(2, 2, 12, 0)],                   # user 2 advances the watermark
        [ev(3, 2, 12, 5)],
        [ev(4, 2, 12, 10)],                  # extra batches so the timeout
        [ev(5, 2, 12, 15)],                  # fires (watermark lags a batch)
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, EVENTS_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_root}/_to{i}")
        for f in os.listdir(f"{tmp_root}/_to{i}"):
            if f.endswith(".parquet"):
                os.replace(
                    os.path.join(f"{tmp_root}/_to{i}", f),
                    os.path.join(d, f"chunk_{i}.parquet"),
                )
        time.sleep(1.1)

    q = sessionize_stream_timeout(
        spark, d, f"{tmp_root}/to_ckpt", query_name="t_to_sess"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.user_id, r.session_start_epoch, r.n_events)
        for r in spark.sql("SELECT * FROM t_to_sess").collect()
    )
    import datetime as dt2

    u1_start = int(dt2.datetime(2024, 3, 1, 10, 0, tzinfo=dt2.timezone.utc).timestamp())
    # user 1's idle session flushed by the timeout; user 2 still active
    # (last event within gap of the final watermark) so not emitted
    assert (1, u1_start, 2) in got
    assert all(u != 2 for u, _, _ in got)


def test_asof_attribution_stream_matches_batch(spark, tmp_root):
    """Stream-stream time-interval self-join (purchases ⋈ views within the
    horizon) + downstream max-agg == the batch twin. Two far-future flush
    chunks advance BOTH sides' watermarks (the engine applies an advanced
    watermark with a one-batch lag) so every real purchase finalizes; the
    flush rows themselves produce no output (purchase user has no views)."""
    import datetime as dt
    import time

    from docix_spark.streaming.events import (
        EVENTS_SCHEMA,
        asof_attribution,
        asof_attribution_stream,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("ts")
    rows = events.collect()
    n = len(rows)
    d = f"{tmp_root}/asof_drops"
    os.makedirs(d, exist_ok=True)
    cuts = [0, n // 3, 2 * n // 3, n]
    chunks = [rows[cuts[i]:cuts[i + 1]] for i in range(3)]
    far = max(r.ts for r in rows) + dt.timedelta(days=30)
    for k in range(2):
        t = far + dt.timedelta(days=k)
        chunks.append(
            [
                (10_000_000 + 2 * k, t, 888888, "view", 0.0, "{}"),
                (10_000_001 + 2 * k, t, 999999, "purchase", 0.0, "{}"),
            ]
        )
    for i, chunk in enumerate(chunks):
        df = spark.createDataFrame(chunk, events.schema if i < 3 else EVENTS_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_root}/_asof{i}")
        for f in os.listdir(f"{tmp_root}/_asof{i}"):
            if f.endswith(".parquet"):
                os.replace(
                    os.path.join(f"{tmp_root}/_asof{i}", f),
                    os.path.join(d, f"chunk_{i}.parquet"),
                )
        time.sleep(1.1)  # distinct mtimes: file-source batch order

    # 1-day horizon: ~70 attributable purchases at sf0.001 (the registry op's
    # 1-hour horizon matches only 3 here — too thin to exercise join state)
    q = asof_attribution_stream(
        spark, d, f"{tmp_root}/asof_ckpt", query_name="t_ev_asof",
        horizon_sec=86400,
    )
    q.awaitTermination(180)
    got = sorted(
        (r.event_id, r.user_id, r.purchase_us, r.view_us, r.gap_us)
        for r in spark.sql("SELECT * FROM t_ev_asof").collect()
    )
    want = sorted(
        (r.event_id, r.user_id, r.purchase_us, r.view_us, r.gap_us)
        for r in asof_attribution(
            spark.read.parquet(f"{SF_DIR}/events.parquet"), horizon_sec=86400
        ).collect()
    )
    assert got == want and len(want) > 50


def test_exactly_once_counts_stream_dedups_replays(spark, tmp_root):
    """dropDuplicatesWithinWatermark → windowed agg (two chained stateful
    operators, append mode) over micro-batches with INJECTED REPLAYS: each
    chunk re-delivers the tail of the previous one (at-least-once broker
    semantics). Output must equal the batch twin over the ORIGINAL events —
    replays must not double-count. A generous 30-day watermark keeps every
    replay inside the dedup band (the production contract: redelivery
    timeout < watermark delay); two far-apart flush chunks advance the
    watermark past all real windows so they finalize."""
    import datetime as dt
    import time

    from docix_spark.streaming.events import (
        EVENTS_SCHEMA,
        exactly_once_counts,
    )
    from docix_spark.streaming.events import exactly_once_counts_stream

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("ts")
    rows = events.collect()
    n = len(rows)
    d = f"{tmp_root}/dedup_drops"
    os.makedirs(d, exist_ok=True)
    cuts = [0, n // 3, 2 * n // 3, n]
    chunks = [rows[cuts[i]:cuts[i + 1]] for i in range(3)]
    # inject replays: chunk i+1 re-delivers the last 10 rows of chunk i,
    # and chunk 0 contains an in-batch duplicate of its own first row
    chunks[0] = chunks[0] + chunks[0][:1]
    chunks[1] = chunks[0][-11:-1] + chunks[1]
    chunks[2] = chunks[1][-10:] + chunks[2]
    far = max(r.ts for r in rows) + dt.timedelta(days=90)
    for k in range(2):
        t = far + dt.timedelta(days=40 * k)
        chunks.append([(20_000_000 + k, t, 777777, "flush", 0.0, "{}")])
    for i, chunk in enumerate(chunks):
        df = spark.createDataFrame(chunk, events.schema if i < 3 else EVENTS_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_root}/_dd{i}")
        for f in os.listdir(f"{tmp_root}/_dd{i}"):
            if f.endswith(".parquet"):
                os.replace(
                    os.path.join(f"{tmp_root}/_dd{i}", f),
                    os.path.join(d, f"chunk_{i}.parquet"),
                )
        time.sleep(1.1)  # distinct mtimes: file-source batch order

    q = exactly_once_counts_stream(
        spark, d, f"{tmp_root}/dedup_ckpt", query_name="t_ev_dedup",
        watermark="30 days",
    )
    q.awaitTermination(180)
    max_real = max(r.ts for r in rows).replace(tzinfo=dt.timezone.utc).timestamp()
    got = sorted(
        (r.window_start_epoch, r.event_type, r.n, r.value_cents)
        for r in spark.sql("SELECT * FROM t_ev_dedup").collect()
        if r.window_start_epoch <= max_real  # drop flush-row windows
    )
    want = sorted(
        (r.window_start_epoch, r.event_type, r.n, r.value_cents)
        for r in exactly_once_counts(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).collect()
    )
    assert got == want and len(want) > 20


def test_countmin_stream_equals_batch_cells(spark, event_drops, tmp_root):
    """The streaming-maintained CMS (complete-mode running agg, 4 096-cell
    bounded state) must equal the batch twin's cell table exactly after
    the availableNow drain — cell additivity IS the mergeable-sketch
    property the operator exists to demonstrate."""
    from docix_spark.streaming.events import countmin_user_cells, countmin_user_stream

    q = countmin_user_stream(
        spark, event_drops, f"{tmp_root}/cms_ckpt", query_name="t_ev_cms"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.i, r.pos, r.cell) for r in spark.sql("SELECT * FROM t_ev_cms").collect()
    )
    want = sorted(
        (r.i, r.pos, r.cell)
        for r in countmin_user_cells(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).collect()
    )
    assert got == want and len(want) > 30
    # bounded-state invariant: never more cells than the 4 x 1024 sketch
    assert len(got) <= 4096
    # CMS overestimate property on a probed user: min over its 4 cells
    # >= the user's true event count
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    top = events.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first()
    import hashlib

    cells = {(i, p): c for i, p, c in got}
    est = min(
        cells[(i, int(hashlib.md5(str(top.user_id).encode()).hexdigest()[4 * i : 4 * i + 4], 16) % 1024)]
        for i in range(4)
    )
    assert est >= top["count"]


def test_hll_stream_equals_batch_registers(spark, event_drops, tmp_root):
    """The streaming-maintained HLL (complete-mode running MAX agg,
    <= 256 rows of state) must equal the batch twin's register table
    exactly after the availableNow drain — max-mergeability IS the
    property the operator exists to demonstrate (the sum-merge
    counterpart is the CMS test above)."""
    from docix_spark.streaming.events import hll_user_registers, hll_user_stream

    q = hll_user_stream(
        spark, event_drops, f"{tmp_root}/hll_ckpt", query_name="t_ev_hll"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.reg, r.maxr) for r in spark.sql("SELECT * FROM t_ev_hll").collect()
    )
    want = sorted(
        (r.reg, r.maxr)
        for r in hll_user_registers(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).collect()
    )
    assert got == want and len(want) > 5
    # bounded-state invariant: never more rows than the 256 registers
    assert len(got) <= 256
    # every rank is in the valid 1..53 window for a 52-bit suffix
    assert all(1 <= m <= 53 for _, m in got)
    # register table is insensitive to duplicate user_ids: doubling the
    # stream's events changes nothing (max-merge absorbs replays)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    doubled = sorted(
        (r.reg, r.maxr)
        for r in hll_user_registers(ev.unionAll(ev)).collect()
    )
    assert doubled == want


def test_top_metrics_stream_equals_batch(spark, event_drops, tmp_root):
    """The streaming-maintained per-type latest reading (complete-mode
    running MAX-of-struct, |event_types| rows of state) must equal the
    batch twin exactly after the availableNow drain — lexicographic
    struct-max mergeability is the third sketch-merge flavor (CMS sums,
    HLL maxes scalars, this maxes a composite order)."""
    from docix_spark.streaming.events import top_metrics_cells, top_metrics_stream

    q = top_metrics_stream(
        spark, event_drops, f"{tmp_root}/topm_ckpt", query_name="t_ev_topm"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.event_type, r.ts_us, r.event_id, r.cents)
        for r in spark.sql("SELECT * FROM t_ev_topm").collect()
    )
    batch = top_metrics_cells(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    want = sorted(
        (r.event_type, r.ts_us, r.event_id, r.cents) for r in batch.collect()
    )
    assert got == want and len(want) >= 3
    # bounded state: one row per event type
    assert len(got) == len({t for t, *_ in got})
    # the registry op is the same expression tree
    from docix_spark.driver_queries import REGISTRY

    reg = sorted(
        (r.event_type, r.ts_us, r.event_id, r.cents)
        for r in REGISTRY["top_metrics_latest"].fn(spark, SF_DIR).collect()
    )
    assert reg == want


def test_bloom_stream_equals_batch_bits(spark, event_drops, tmp_root):
    """The streaming-maintained Bloom bit table (complete-mode running
    agg, <= 65 536 rows of bounded state) must equal the batch twin's
    bit table exactly after the availableNow drain — OR-mergeability
    (idempotent presence) is the property the operator exists to
    demonstrate, the fourth flavor after CMS-sum, HLL-max and
    top-metrics-argmax."""
    from docix_spark.streaming.events import bloom_user_bits, bloom_user_stream

    q = bloom_user_stream(
        spark, event_drops, f"{tmp_root}/bloom_ckpt", query_name="t_ev_bloom"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.pos, r.hit) for r in spark.sql("SELECT * FROM t_ev_bloom").collect()
    )
    want = sorted(
        (r.pos, r.hit)
        for r in bloom_user_bits(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).collect()
    )
    assert got == want and len(want) > 10
    assert len(got) <= 65536
    # membership property: every real user's 4 positions are all set
    import hashlib

    bits = {p for p, _ in got}
    users = [
        r.user_id
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    ]
    for u in users:
        h = hashlib.md5(str(u).encode()).hexdigest()
        for s in (0, 4, 8, 12):
            assert int(h[s : s + 4], 16) in bits


def test_kmins_stream_equals_batch_cells(spark, event_drops, tmp_root):
    """The streaming-maintained k-mins register table (complete-mode
    running MIN agg, <= 32 rows of state) must equal the batch twin's
    table exactly after the availableNow drain — MIN-mergeability
    (idempotent, commutative) is the property the operator exists to
    demonstrate, the fifth flavor after CMS-sum, HLL-max,
    top-metrics-argmax and Bloom-OR."""
    from docix_spark.streaming.events import kmins_user_cells, kmins_user_stream

    q = kmins_user_stream(
        spark, event_drops, f"{tmp_root}/kmins_ckpt", query_name="t_ev_kmins"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.reg, r.minv) for r in spark.sql("SELECT * FROM t_ev_kmins").collect()
    )
    want = sorted(
        (r.reg, r.minv)
        for r in kmins_user_cells(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).collect()
    )
    assert got == want and 1 <= len(got) <= 32
    # exact model: per-register minimum of the seeded 52-bit hashes
    import hashlib

    users = {
        r.user_id
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    }
    model = {}
    for u in users:
        h = int(hashlib.md5(f"km:{u}".encode()).hexdigest()[:13], 16)
        reg, v = h % 32, h // 32
        model[reg] = min(model.get(reg, v), v)
    assert got == sorted(model.items())


def test_value_hist_stream_equals_batch_cells(spark, event_drops, tmp_root):
    """The streaming-maintained log-bucket value histogram (complete-mode
    running SUM agg, <= ~48 rows of state) must equal the batch twin
    exactly after the availableNow drain — the sketch family's QUANTILE
    member: fixed boundaries are what make the cells mergeable and
    replay-insensitive where data-dependent digests are not."""
    from docix_spark.streaming.events import value_hist_cells, value_hist_stream

    q = value_hist_stream(
        spark, event_drops, f"{tmp_root}/vhist_ckpt", query_name="t_ev_vhist"
    )
    q.awaitTermination(180)
    got = sorted(
        (r.bucket, r.n) for r in spark.sql("SELECT * FROM t_ev_vhist").collect()
    )
    want = sorted(
        (r.bucket, r.n)
        for r in value_hist_cells(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).collect()
    )
    assert got == want and len(got) >= 1
    # exact model: log2 buckets of purchase cents
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("CAST(round(value * 100) AS BIGINT) AS c")
        .collect()
    )
    model = {}
    for r in rows:
        b = max(r.c, 1).bit_length() - 1
        model[b] = model.get(b, 0) + 1
    assert got == sorted(model.items())


def test_hll_window_stream_append_equals_batch_finalized(spark, event_drops, tmp_root):
    """Round-5 windowed-sketch shape: the APPEND-mode tumbling-window HLL
    emits exactly the windows the watermark finalized, each window's
    register block identical to the batch twin's — per-window max-merge
    + watermark finalization composing correctly is THE property. With
    availableNow over chronological drops, every window strictly older
    than max(ts) - watermark - 1h is guaranteed finalized."""
    from docix_spark.streaming.events import (
        hll_window_registers,
        hll_window_stream,
    )

    q = hll_window_stream(
        spark, event_drops, f"{tmp_root}/hllw_ckpt", query_name="t_ev_hllw",
        watermark="30 minutes",
    )
    q.awaitTermination(180)
    got = {
        (r.window_start_epoch, r.reg): r.maxr
        for r in spark.sql("SELECT * FROM t_ev_hllw").collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want_all = {
        (r.window_start_epoch, r.reg): r.maxr
        for r in hll_window_registers(ev).collect()
    }
    assert got, "append stream emitted no finalized windows"
    # every emitted block matches the batch twin exactly
    for k, v in got.items():
        assert want_all[k] == v
    # emitted windows are exactly a prefix of event time: everything
    # guaranteed-finalized is present
    import datetime as _dt

    max_ts = ev.agg({"ts": "max"}).collect()[0][0]
    cutoff = max_ts - _dt.timedelta(minutes=30) - _dt.timedelta(hours=1)
    cutoff_epoch = int(cutoff.replace(tzinfo=_dt.timezone.utc).timestamp())
    finalized = {w for (w, _) in want_all if w < cutoff_epoch}
    emitted = {w for (w, _) in got}
    assert finalized <= emitted
    # state/emission bound: no window block exceeds the 256 registers
    from collections import Counter

    per_w = Counter(w for (w, _) in got)
    assert max(per_w.values()) <= 256
