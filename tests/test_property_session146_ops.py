"""Property-based semantics checks for the session-146 operators.

Models: zero-filled daily error-rate series, per-term block-max
tightness (64-doc_id blocks), and the System-R join-size estimate vs
the exact per-key product sum. DuckDB-only (ms per example).
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


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.sampled_from(["error", "view", "click"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_error_rate_daily_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": [_D0 + datetime.timedelta(days=d, hours=3) for d, _ in evs],
                "event_type": [t for _, t in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["error_rate_daily"].sql).fetchall()

    per: dict[int, list[int]] = {}
    for d, t in evs:
        cell = per.setdefault(d, [0, 0])
        cell[0] += 1
        cell[1] += 1 if t == "error" else 0
    lo, hi = min(per), max(per)
    base = (_D0 - datetime.datetime(1970, 1, 1)).days
    model = []
    for d in range(lo, hi + 1):
        n, e = per.get(d, (0, 0))
        rate = 0 if n == 0 else (1000000 * e) // n
        model.append((base + d, n, e, rate))
    assert got == model


_word = st.sampled_from(["alpha", "beta", "gamma"])


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.lists(_word, min_size=1, max_size=8),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_blockmax_tightness_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [i for i, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["blockmax_tightness_curve"].sql
        ).fetchall()
    }

    tf: dict[str, dict[int, int]] = {}
    for i, ws in docs:
        for w in ws:
            tf.setdefault(w, {}).setdefault(i, 0)
            tf[w][i] += 1
    bands: dict[int, list[int]] = {}
    for w, postings in tf.items():
        blocks: dict[int, int] = {}
        for d, c in postings.items():
            blocks[d // 64] = max(blocks.get(d // 64, 0), c)
        df = len(postings)
        band = df.bit_length() - 1
        gmax = max(blocks.values())
        cell = bands.setdefault(band, [0, 0, 0, 0])
        cell[0] += 1
        cell[1] += len(blocks)
        cell[2] += sum(blocks.values())
        cell[3] += len(blocks) * gmax
    model = {
        b: (c[0], c[1], (1000000 * c[2]) // c[3]) for b, c in bands.items()
    }
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=25,
    ),
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=10,
    ),
    custs=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=5),
    parts=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
)
def test_join_size_estimates_match_model(li, orders, custs, parts):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_partkey": [p for _, p in li],
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [o for o, _ in orders],
                "o_custkey": [c for _, c in orders],
            }
        ),
    )
    con.register("customer", pd.DataFrame({"c_custkey": custs}))
    con.register("part", pd.DataFrame({"p_partkey": parts}))
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["join_size_estimates"].sql).fetchall()
    }

    def edge(lvals, rvals):
        n_l, n_r = len(lvals), len(rvals)
        ndv_l, ndv_r = len(set(lvals)), len(set(rvals))
        est = _round_away(float(n_l) * float(n_r) / max(ndv_l, ndv_r, 1))
        cl: dict[int, int] = {}
        cr: dict[int, int] = {}
        for v in lvals:
            cl[v] = cl.get(v, 0) + 1
        for v in rvals:
            cr[v] = cr.get(v, 0) + 1
        actual = sum(cl[k] * cr.get(k, 0) for k in cl)
        return (n_l, n_r, ndv_l, ndv_r, est, actual)

    model = {
        "lineitem_orders": edge([o for o, _ in li], [o for o, _ in orders]),
        "orders_customer": edge([c for _, c in orders], custs),
        "lineitem_part": edge([p for _, p in li], parts),
    }
    assert got == model
