"""Session-238 checks (events_daily_mad_anomaly, shard_local_idf_effect).
DuckDB-only; the MAD op runs against an exact model on injected event
streams (one planted mega-spike demonstrates masking resistance)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _SLI_SHARDS

_C2 = 0.6745 ** 2


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=20),
    spike_day=st.integers(min_value=0, max_value=19),
)
def test_events_daily_mad_anomaly_matches_model(days, spike_day):
    # per-day event counts; one day may be a planted mega-spike
    counts = list(days)
    if spike_day < len(counts):
        counts[spike_day] *= 50
    ts, rows = [], []
    for d, n in enumerate(counts):
        for i in range(n):
            rows.append(pd.Timestamp(1970, 1, 1) + pd.Timedelta(days=d, seconds=i))
    con = duckdb.connect()
    con.register("events", pd.DataFrame({"ts": rows}))
    got = con.execute(REGISTRY["events_daily_mad_anomaly"].sql).fetchall()

    nd = len(counts)
    med = sorted(counts)[(nd + 1) // 2 - 1]
    ads = sorted(abs(n - med) for n in counts)
    mad = ads[(nd + 1) // 2 - 1]
    model = []
    for d, n in enumerate(counts):
        if mad == 0:
            rz = 0
        else:
            rz = int(round(1_000_000 * _C2 * (n - med) ** 2 / float(mad * mad)))
        model.append((d, n, med, mad, rz, int(mad != 0 and rz >= 4_000_000)))
    assert got == model
    # a 50x planted spike must flag when there is any robust scale and
    # enough baseline days to out-vote it in the median
    if mad != 0 and nd >= 5 and spike_day < len(counts):
        spike = got[spike_day]
        others = [r for i, r in enumerate(got) if i != spike_day]
        # the spike's robust z dominates every unspiked day's
        assert spike[4] >= max(r[4] for r in others)


def test_shard_local_idf_effect_bounds():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    )
    (s, n_matched, ov, mean_d, max_d) = con.execute(
        REGISTRY["shard_local_idf_effect"].sql
    ).fetchall()[0]
    assert s == _SLI_SHARDS
    assert 0 <= ov <= 10
    assert 0 <= mean_d <= max_d
    assert n_matched > 0
