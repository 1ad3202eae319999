"""Property-based semantics checks for the session-192 operators."""

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
            st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
            st.sampled_from([0.0, 4.25, 12.0, 99.5]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_props_k_value_corr_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "props": [
                    '{"k": %d}' % k if k is not None else "{}"
                    for k, _ in evs
                ],
                "value": [v for _, v in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["props_k_value_corr"].sql).fetchall()[0]

    rows = [
        (k, _round_away(v * 100)) for k, v in evs if k is not None
    ]
    n = len(rows)
    if n < 2:
        corr = 0
    else:
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxx = sum(x * x for x, _ in rows)
        syy = sum(y * y for _, y in rows)
        sxy = sum(x * y for x, y in rows)
        if n * sxx == sx * sx or n * syy == sy * sy:
            corr = 0
        else:
            corr = _round_away(
                1000000
                * (float(n) * sxy - float(sx) * sy)
                / (
                    math.sqrt(float(n) * sxx - float(sx) * sx)
                    * math.sqrt(float(n) * syy - float(sy) * sy)
                )
            )
    assert got == (n, corr)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=20),
            st.sampled_from(["purchase", "view"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_purchase_streaks_match_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "ts": [_D0 + datetime.timedelta(days=d, hours=5) for _, d, _ in evs],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["purchase_streak_histogram"].sql
        ).fetchall()
    }

    per: dict[int, set[int]] = {}
    for u, d, t in evs:
        if t == "purchase":
            per.setdefault(u, set()).add(d)
    model: dict[int, int] = {}
    for days in per.values():
        sd = sorted(days)
        best = cur = 1
        for i in range(1, len(sd)):
            cur = cur + 1 if sd[i] == sd[i - 1] + 1 else 1
            best = max(best, cur)
        k = min(best, 7)
        model[k] = model.get(k, 0) + 1
    assert got == model
