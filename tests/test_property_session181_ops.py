"""Property-based semantics check for the session-181 operator."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)
_BASE = (_D0 - datetime.datetime(1970, 1, 1)).days


@settings(max_examples=35, deadline=None)
@given(
    ud=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_daily_user_mix_matches_model(ud):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(ud)),
                "user_id": [u for u, _ in ud],
                "ts": [_D0 + datetime.timedelta(days=d, hours=2) for _, d in ud],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["daily_user_mix"].sql).fetchall()
    }

    per: dict[int, set[int]] = {}
    for u, d in ud:
        per.setdefault(u, set()).add(_BASE + d)
    model: dict[int, list[int]] = {}
    for days in per.values():
        sd = sorted(days)
        for i, d in enumerate(sd):
            if i == 0:
                b = 0
            elif d - sd[i - 1] > 28:
                b = 1
            else:
                b = 2
            cell = model.setdefault(d, [0, 0, 0])
            cell[b] += 1
    assert got == {d: tuple(c) for d, c in model.items()}
