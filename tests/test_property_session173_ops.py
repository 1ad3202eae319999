"""Property-based semantics checks for the session-173 operators.

Models: half-split activity-band migration, the Simpson flag over
grouped correlations, and the dead-stock rollup. DuckDB-only.
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


_D0 = datetime.datetime(1996, 3, 1)
_BASE = (_D0 - datetime.datetime(1970, 1, 1)).days


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_band_migration_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "ts": [_D0 + datetime.timedelta(days=d, hours=4) for _, d in evs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            REGISTRY["activity_band_migration"].sql
        ).fetchall()
    }

    days = [_BASE + d for _, d in evs]
    lo, hi = min(days), max(days)
    mid = (lo + hi) // 2
    per: dict[int, list[int]] = {}
    for (u, d), dd in zip(evs, days):
        cell = per.setdefault(u, [0, 0])
        if dd <= mid:
            cell[0] += 1
        else:
            cell[1] += 1
    model: dict[tuple[int, int], int] = {}
    for n1, n2 in per.values():
        b1 = -1 if n1 == 0 else n1.bit_length() - 1
        b2 = -1 if n2 == 0 else n2.bit_length() - 1
        model[(b1, b2)] = model.get((b1, b2), 0) + 1
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from([0.0, 0.02, 0.05, 0.1]),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=2,
        max_size=30,
    ),
    brands=st.lists(st.sampled_from(["B1", "B2", "B3"]), min_size=6, max_size=6),
)
def test_simpson_check_matches_model(li, brands):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _, _ in li],
                "l_discount": [d for _, d, _ in li],
                "l_quantity": [float(q) for _, _, q in li],
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame({"p_partkey": range(6), "p_brand": brands}),
    )
    got = con.execute(REGISTRY["simpson_check_discount"].sql).fetchall()[0]

    def corr(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxx = sum(x * x for x, _ in rows)
        syy = sum(y * y for _, y in rows)
        sxy = sum(x * y for x, y in rows)
        if n < 2 or n * sxx == sx * sx or n * syy == sy * sy:
            return 0
        return _round_away(
            1000000
            * (float(n) * sxy - float(sx) * sy)
            / (
                math.sqrt(float(n) * sxx - float(sx) * sx)
                * math.sqrt(float(n) * syy - float(sy) * sy)
            )
        )

    rows = [(round(d * 100), q) for _, d, q in li]
    g = corr(rows)
    per: dict[str, list] = {}
    for (p, d, q) in li:
        per.setdefault(brands[p], []).append((round(d * 100), q))
    bcs = [corr(r) for r in per.values()]
    n_brands = len(bcs)
    n_pos = sum(1 for c in bcs if c > 0)
    n_neg = sum(1 for c in bcs if c < 0)
    flag = int(
        (g > 0 and 2 * n_neg > n_brands) or (g < 0 and 2 * n_pos > n_brands)
    )
    assert got == (g, n_brands, n_pos, n_neg, flag)


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    parts=st.lists(_price, min_size=1, max_size=15),
    sold=st.sets(st.integers(min_value=0, max_value=20)),
)
def test_unsold_inventory_matches_model(parts, sold):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {"p_partkey": range(len(parts)), "p_retailprice": parts}
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame({"l_partkey": sorted(sold) or [10**9]}),
    )
    got = con.execute(REGISTRY["unsold_inventory_value"].sql).fetchall()[0]

    cents = [_round_away(p * 100) for p in parts]
    unsold = [c for i, c in enumerate(cents) if i not in sold]
    assert got == (
        len(parts),
        len(unsold),
        sum(unsold),
        sum(cents),
        (1000000 * len(unsold)) // len(parts),
    )
