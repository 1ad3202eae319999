"""Property-based semantics checks for the session-219 operators.

DuckDB-only (oracle SQL vs exact Python models): the bloom-advisor
row-group model incl. the fully-keyed layout, the 7-lag Pearson
cross-correlation, and the ablation's exact overlap derived from the
oracle's own single-leg rankings.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _RG_ROWS, _bm25_agg_ctes


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # orderkey
            st.integers(min_value=1, max_value=7),  # linenumber
            st.integers(min_value=1, max_value=12),  # partkey
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
def test_parquet_bloom_advisor_matches_model(rows):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _, _ in rows],
                "l_linenumber": [l for _, l, _ in rows],
                "l_partkey": [p for _, _, p in rows],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["parquet_bloom_advisor"].sql).fetchall()
    }

    order = sorted(rows)
    groups = {}
    for i, (_, _, p) in enumerate(order):
        groups.setdefault(i // _RG_ROWS, []).append(p)
    ngroups = len(groups)
    model = {}
    for pk in range(1, 6):
        mm = true = 0
        fprsum = 0
        for ps in groups.values():
            ndv = len(set(ps))
            if pk in ps:
                true += 1
            else:
                fprsum += _round_away(
                    1000000 * (1 - math.exp(-(4.0 * ndv) / 1024)) ** 4
                )
            if min(ps) <= pk <= max(ps):
                mm += 1
        model[pk] = (ngroups, mm, true, 1000000 * true + fprsum)
    assert got == model
    # the bloom never misses a containing group, min/max never does either
    for pk, (_, mm, true, be) in got.items():
        assert mm >= true and be >= 1000000 * true


_T0 = datetime.datetime(2025, 10, 1)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.sampled_from(["view", "purchase", "click"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_view_purchase_crosscorr_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "ts": [_T0 + datetime.timedelta(days=d) for d, _ in evs],
                "event_type": [t for _, t in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["view_purchase_crosscorr"].sql).fetchall()
    }

    lo = min(d for d, _ in evs)
    hi = max(d for d, _ in evs)
    v = {x: 0 for x in range(lo, hi + 1)}
    p = {x: 0 for x in range(lo, hi + 1)}
    for d, t in evs:
        if t == "view":
            v[d] += 1
        elif t == "purchase":
            p[d] += 1
    model = {}
    for lg in range(-3, 4):
        xs, ys = [], []
        for d in range(lo, hi + 1):
            if lo <= d + lg <= hi:
                xs.append(v[d])
                ys.append(p[d + lg])
        n = len(xs)
        if n == 0:
            continue
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        if (
            n < 2
            or float(sxx) * n == float(sx) * sx
            or float(syy) * n == float(sy) * sy
        ):
            c = 0
        else:
            c = _round_away(
                1000000
                * (float(sxy) * n - float(sx) * sy)
                / (
                    math.sqrt(float(sxx) * n - float(sx) * sx)
                    * math.sqrt(float(syy) * n - float(sy) * sy)
                )
            )
        model[lg] = (n, c)
    assert got == model


_VOCAB = ["spark", "hash", "join", "alpha"]


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )
)
def test_query_term_ablation_consistent_with_single_legs(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(REGISTRY["query_term_ablation"].sql).fetchall()
    }

    def top10(terms):
        sql = (
            _bm25_agg_ctes(terms)
            + "\nSELECT doc_id FROM agg ORDER BY score_q6 DESC, doc_id ASC LIMIT 10"
        )
        return [r[0] for r in con.execute(sql).fetchall()]

    full = set(top10(["spark", "hash", "join"]))
    model = {
        "hash": len(set(top10(["spark", "join"])) & full),
        "join": len(set(top10(["spark", "hash"])) & full),
        "spark": len(set(top10(["hash", "join"])) & full),
    }
    assert got == model
