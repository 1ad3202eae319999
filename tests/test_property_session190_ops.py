"""Property-based semantics checks for the session-190 operators."""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5000),  # minutes
        ),
        min_size=1,
        max_size=40,
    )
)
def test_onboarding_depth_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "ts": [_D0 + datetime.timedelta(minutes=m) for _, m in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["onboarding_depth_return_rate"].sql
        ).fetchall()
    }

    epoch = datetime.datetime(1970, 1, 1)
    per: dict[int, list[int]] = {}
    for u, m in evs:
        us = int(
            (_D0 + datetime.timedelta(minutes=m) - epoch).total_seconds() * 1e6
        )
        per.setdefault(u, []).append(us)
    model: dict[int, list[int]] = {}
    for times in per.values():
        t0 = min(times)
        depth = sum(1 for t in times if t0 <= t < t0 + 1_800_000_000)
        returned = int(
            any(t // 86_400_000_000 > t0 // 86_400_000_000 for t in times)
        )
        band = min(depth.bit_length() - 1, 4)
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += returned
    assert got == {
        b: (c[0], c[1], (1000000 * c[1]) // c[0]) for b, c in model.items()
    }


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)
_brand = st.sampled_from(["B1", "B2", "B3", "B4"])


@settings(max_examples=30, deadline=None)
@given(parts=st.lists(st.tuples(_brand, _price), min_size=1, max_size=25))
def test_brand_price_range_matches_model(parts):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(len(parts)),
                "p_brand": [b for b, _ in parts],
                "p_retailprice": [p for _, p in parts],
            }
        ),
    )
    got = con.execute(REGISTRY["brand_price_range_topk"].sql).fetchall()

    agg: dict[str, list[int]] = {}
    for b, p in parts:
        c = _round_away(p * 100)
        cell = agg.setdefault(b, [0, None, None])
        cell[0] += 1
        cell[1] = c if cell[1] is None else min(cell[1], c)
        cell[2] = c if cell[2] is None else max(cell[2], c)
    rows = [(b, c[0], c[1], c[2], c[2] - c[1]) for b, c in agg.items()]
    rows.sort(key=lambda r: (-r[4], r[0]))
    assert got == rows[:10]
