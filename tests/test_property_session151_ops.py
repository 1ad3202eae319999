"""Property-based semantics checks for the session-151 operators.

Models: weekend/weekday Welch t² over purchase cents (shared float
expression replicated), and the watermark drop curve with INJECTED
disorder (the sandbox stream is in-order, so the live counters are all
zero — the url_domain_census rule). rank_feature_search rides the
shared _bm25_match_set chain whose cross-engine identity the
driver-contract replica proves; here we check the saturation algebra
standalone. DuckDB-only (ms per example).
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


_D0 = datetime.datetime(1996, 3, 4)  # a Monday
_cents = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=13),
            _cents,
            st.sampled_from(["purchase", "view"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weekend_value_ttest_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": [_D0 + datetime.timedelta(days=d, hours=10) for d, _, _ in evs],
                "value": [v for _, v, _ in evs],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["weekend_value_ttest"].sql).fetchall()[0]

    a, b = [], []  # weekend, weekday
    for d, v, t in evs:
        if t != "purchase":
            continue
        x = _round_away(v * 100)
        # _D0 is Monday → dow = d % 7 with 0=Mon
        (a if d % 7 >= 5 else b).append(x)
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    ssa = sum(x * x for x in a)
    ssb = sum(x * x for x in b)
    if na < 2 or nb < 2 or (na * ssa == sa * sa and nb * ssb == sb * sb):
        t2 = 0
    else:
        diff = sa / na - sb / nb
        den = (na * ssa - sa * sa) / (na * na * (na - 1)) + (
            nb * ssb - sb * sb
        ) / (nb * nb * (nb - 1))
        t2 = _round_away(1000000 * (diff * diff) / den)
    assert got == (na, nb, sa, sb, t2)


_DELAYS = [0, 60_000_000, 300_000_000, 900_000_000]


@settings(max_examples=35, deadline=None)
@given(
    offs=st.lists(
        st.integers(min_value=0, max_value=2000), min_size=1, max_size=40
    )
)
def test_watermark_drop_curve_matches_model(offs):
    # arrival order = event_id = list order; event times deliberately
    # out of order (offs in seconds, arbitrary)
    ts = [_D0 + datetime.timedelta(seconds=s) for s in offs]
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": range(len(ts)), "ts": ts}),
    )
    got = con.execute(REGISTRY["watermark_drop_curve"].sql).fetchall()

    us = [s * 10**6 for s in offs]
    late = []
    wm = None
    for u in us:
        late.append(0 if wm is None or wm <= u else wm - u)
        wm = u if wm is None else max(wm, u)
    model = []
    for dl in _DELAYS:
        nd = sum(1 for x in late if x > dl)
        model.append((dl, len(us), nd, (1000000 * nd) // len(us)))
    assert got == model


@settings(max_examples=25, deadline=None)
@given(
    chars=st.lists(
        st.integers(min_value=0, max_value=10000), min_size=1, max_size=20
    )
)
def test_rank_feature_saturation_algebra(chars):
    # standalone check of the saturation expression both engines run:
    # round(1e6 * x / (x + 2000)) — bounded in [0, 1e6], monotone in x
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": chars}))
    got = [
        r[0]
        for r in con.execute(
            "SELECT CAST(round(1000000 * (CAST(x AS DOUBLE) / (x + 2000)))"
            " AS BIGINT) FROM t"
        ).fetchall()
    ]
    model = [_round_away(1000000 * (x / (x + 2000))) for x in chars]
    assert got == model
    for x, s in zip(chars, got):
        assert 0 <= s < 1000000 or (s == 1000000 and x >= 2000 * 999999)
