"""Property-based semantics checks for the session-159 operators.

Models: the k-sweep majority-vote tail on an injected neighbor table
(the k-means front is driver-contract territory), the dominant-value
column screen, and the timestamp-granularity partition. DuckDB-only.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    nbrs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # qid
            st.integers(min_value=10, max_value=25),  # neighbor vec
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    labels=st.data(),
)
def test_k_sweep_vote_semantics(nbrs, labels):
    # build a rank table: per qid, neighbors ranked by insertion order
    per_q: dict[int, list[int]] = {}
    rows = []
    for q, v in nbrs:
        per_q.setdefault(q, [])
        if v not in per_q[q]:
            per_q[q].append(v)
            rows.append((q, v, len(per_q[q])))
    all_ids = sorted({q for q, _, _ in rows} | {v for _, v, _ in rows})
    lab = {i: labels.draw(st.integers(min_value=0, max_value=2)) for i in all_ids}
    con = duckdb.connect()
    con.register(
        "btop",
        pd.DataFrame(
            {
                "qid": [q for q, _, _ in rows],
                "vec_id": [v for _, v, _ in rows],
                "rnk": [r for _, _, r in rows],
            }
        ),
    )
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": all_ids, "label": [lab[i] for i in all_ids]}
        ),
    )
    sql_tail = REGISTRY["knn_k_sweep_accuracy"].sql.split("lb AS (SELECT vec_id, label FROM embeddings)")[1]
    got = con.execute(
        "WITH lb AS (SELECT vec_id, label FROM embeddings)" + sql_tail
    ).fetchall()

    model = []
    for k in (1, 3, 5, 10):
        n_q = n_c = 0
        for q, vs in per_q.items():
            votes = [lab[v] for v in vs[:k] if v != q]
            if not votes:
                continue
            from collections import Counter

            cc = Counter(votes)
            pred = min(cc, key=lambda l: (-cc[l], l))
            n_q += 1
            n_c += 1 if pred == lab[q] else 0
        if n_q:
            model.append((k, n_q, n_c, (1000000 * n_c) // n_q))
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.sampled_from([0.0, 0.05]),
            st.sampled_from([0.0, 0.04, 0.08]),
            st.sampled_from(["R", "N"]),
            st.sampled_from(["O", "F"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_near_constant_columns_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_quantity": [float(q) for q, _, _, _, _ in li],
                "l_discount": [d for _, d, _, _, _ in li],
                "l_tax": [t for _, _, t, _, _ in li],
                "l_returnflag": [r for _, _, _, r, _ in li],
                "l_linestatus": [s for _, _, _, _, s in li],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["near_constant_columns"].sql).fetchall()
    }

    from collections import Counter

    cols = {
        "l_quantity": [round(100 * q) for q, _, _, _, _ in li],
        "l_discount": [round(100 * d) for _, d, _, _, _ in li],
        "l_tax": [round(100 * t) for _, _, t, _, _ in li],
        "l_returnflag": [r for _, _, _, r, _ in li],
        "l_linestatus": [s for _, _, _, _, s in li],
    }
    model = {}
    for c, vals in cols.items():
        cnt = Counter(vals)
        dom = max(cnt.values())
        model[c] = (len(vals), len(cnt), dom, (1000000 * dom) // len(vals))
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    offs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # hours
            st.sampled_from([0, 60, 61]),  # seconds within hour (minute tick)
            st.sampled_from([0, 250000]),  # microseconds
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ts_granularity_matches_model(offs):
    ts = [
        _D0 + datetime.timedelta(hours=h, seconds=s, microseconds=us)
        for h, s, us in offs
    ]
    con = duckdb.connect()
    con.register(
        "events", pd.DataFrame({"event_id": range(len(ts)), "ts": ts})
    )
    got = con.execute(REGISTRY["ts_granularity_census"].sql).fetchall()[0]

    epoch = datetime.datetime(1970, 1, 1)
    n_sub = n_sec = n_min = n_hr = 0
    for t in ts:
        us = int((t - epoch).total_seconds() * 1e6)
        us = (t - epoch) // datetime.timedelta(microseconds=1)
        if us % 1_000_000 != 0:
            n_sub += 1
        elif us % 60_000_000 != 0:
            n_sec += 1
        elif us % 3_600_000_000 != 0:
            n_min += 1
        else:
            n_hr += 1
    assert got == (len(ts), n_sub, n_sec, n_min, n_hr)
