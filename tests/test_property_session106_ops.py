"""Property-based semantics checks for the session-106 operators.

Models: CUPED θ/variance-reduction against the centered-OLS model over
a literal pre/post split, row entropy against per-cell q6-first sums,
and the 2-D segment census against direct counting. DuckDB-only.
"""

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


_CT0 = datetime.datetime(2024, 8, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=20),
            st.sampled_from(["view", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cuped_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _CT0 + datetime.timedelta(days=d) for _, d, _ in events
                ],
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    n, theta, vr = con.execute(
        REGISTRY["ab_cuped_adjustment"].sql
    ).fetchall()[0]
    day0 = (_CT0 - datetime.datetime(1970, 1, 1)).days
    days = [day0 + d for _, d, _ in events]
    ms = (min(days) + max(days)) // 2
    per: dict[int, list[int]] = {}
    for u, d, e in events:
        cell = per.setdefault(u, [0, 0])
        if day0 + d <= ms:
            cell[0] += 1
        elif e == "purchase":
            cell[1] = 1
    pts = list(per.values())
    nn = len(pts)
    assert n == nn
    mx = sum(x for x, _ in pts) // nn
    my = sum(y for _, y in pts) // nn
    sxc = sum(x - mx for x, _ in pts)
    syc = sum(y - my for _, y in pts)
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    syy = sum((y - my) ** 2 for _, y in pts)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    cov = float(nn) * sxy - float(sxc) * syc
    vx = float(nn) * sxx - float(sxc) * sxc
    vy = float(nn) * syy - float(syc) * syc
    if nn < 2 or vx == 0.0:
        assert theta == 0
    else:
        assert theta == _round_away(1_000_000 * (cov / vx))
    if nn < 2 or vx == 0.0 or vy == 0.0:
        assert vr == 0
    else:
        assert vr == _round_away(1_000_000 * (cov * cov / (vx * vy)))
        assert 0 <= vr <= 1_000_003


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5000),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_markov_row_entropy_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _CT0 + datetime.timedelta(seconds=s) for _, s, _ in events
                ],
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["markov_row_entropy"].sql).fetchall()
    }
    per_user: dict[int, list] = {}
    for i, (u, s, e) in enumerate(events):
        per_user.setdefault(u, []).append((s * 1_000_000, i, e))
    cells: dict[tuple[str, str], int] = {}
    for rows in per_user.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            cells[(a, b)] = cells.get((a, b), 0) + 1
    model = {}
    for ft in {a for a, _ in cells}:
        tos = {b: n for (a, b), n in cells.items() if a == ft}
        tot = sum(tos.values())
        h = sum(
            _round_away(1_000_000 * (-(n / tot) * math.log(n / tot)))
            for n in tos.values()
        )
        model[ft] = (tot, len(tos), h)
    assert got == model


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), _price),
        min_size=1,
        max_size=25,
    ),
    segs=st.lists(st.sampled_from(["AU", "MA"]), min_size=6, max_size=6),
)
def test_segment_value_hist2d_matches_model(orders, segs):
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(6), "c_mktsegment": segs}),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["segment_value_hist2d"].sql).fetchall()
    }
    model: dict[tuple[str, int], list[int]] = {}
    for c, p in orders:
        cents = _round_away(p * 100)
        vb = -1 if cents <= 0 else cents.bit_length() - 1
        cell = model.setdefault((segs[c], vb), [0, 0])
        cell[0] += 1
        cell[1] += cents
    assert got == {k: tuple(v) for k, v in model.items()}
