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
