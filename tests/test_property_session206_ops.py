"""Property-based semantics checks for the session-206 operators.

DuckDB-only (oracle SQL vs exact Python models).
weighted_jaccard_pairs: multiset Jaccard over brute-force LSH
candidates; date_partition_advisor: the three-granularity census;
batch_exposure_fairness: exposure shares replayed over the oracle's OWN
batch ranking (the float ranking legs are the contract test's job —
here the ranking is re-derived from the same oracle prefix).
"""

from __future__ import annotations

import datetime
import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _EXF_W
from docix_spark.analysis.tokenizer import tokenize


def _shingles(words):
    return (
        {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if len(words) >= 3
        else set()
    )


def _bands(sh):
    if not sh:
        return []
    mins = [
        min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sh)
        for p in range(4)
    ]
    return [mins[0] + mins[1], mins[2] + mins[3]]


_WORDS = ["aa", "bb", "cc", "dd"]


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    )
)
def test_weighted_jaccard_matches_bruteforce(docs):
    texts = [" ".join(ws) for ws in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "source": "s"}
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["weighted_jaccard_pairs"].sql).fetchall()
    }

    toks = [tokenize(t) for t in texts]
    tfs = []
    for ts in toks:
        tf = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        tfs.append(tf)
    bands = [_bands(_shingles(ts)) for ts in toks]
    model = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if not (set(bands[i]) & set(bands[j])):
                continue
            smin = sum(
                min(tfs[i][t], tfs[j][t]) for t in set(tfs[i]) & set(tfs[j])
            )
            smax = sum(tfs[i].values()) + sum(tfs[j].values()) - smin
            model[(i, j)] = (smin, smax, (1000000 * smin) // max(smax, 1))
    assert got == model
    # multiset J never exceeds set J's trivial bound of 1
    for _, _, wj in got.values():
        assert 0 <= wj <= 1000000


_T0 = datetime.datetime(2024, 2, 1)


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=50)
)
def test_date_partition_advisor_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"ts": [_T0 + datetime.timedelta(days=d) for d in days]}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["date_partition_advisor"].sql).fetchall()
    }

    base = int(_T0.timestamp()) // 86400
    keys = []
    for d in days:
        dt = _T0 + datetime.timedelta(days=d)
        keys.append((base + d, (base + d) // 7, dt.year * 100 + dt.month))
    mxd = max(k[0] for k in keys)
    model = {}
    for name, idx in [("a_day", 0), ("b_week", 1), ("c_month", 2)]:
        parts = {k[idx] for k in keys}
        touched = {k[idx] for k in keys if k[0] > mxd - 7}
        n = len(keys)
        model[name] = (
            len(parts),
            len(touched),
            n // max(len(parts), 1),
            (1000000 * len(touched)) // max(len(parts), 1),
        )
    assert got == model


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki"]),
            st.lists(
                st.sampled_from(
                    ["spark", "hash", "merge", "sort", "window", "table",
                     "scan", "join", "batch", "filler"]
                ),
                min_size=1,
                max_size=10,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_batch_exposure_fairness_consistent_with_batch_ranking(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    fair = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["batch_exposure_fairness"].sql).fetchall()
    }
    # re-derive exposure from the oracle's own batch ranking
    top = con.execute(REGISTRY["bm25_batch_queries"].sql).fetchall()
    src = {i: s for i, (s, _) in enumerate(docs)}
    ew, hits = {}, {}
    for _, doc_id, _, rank in top:
        s = src[doc_id]
        ew[s] = ew.get(s, 0) + _EXF_W[rank - 1]
        hits[s] = hits.get(s, 0) + 1
    tew = sum(ew.values())
    counts = {}
    for s, _ in docs:
        counts[s] = counts.get(s, 0) + 1
    tn = len(docs)
    model = {}
    for s in counts:
        e = (1000000 * ew.get(s, 0)) // max(tew, 1)
        c = (1000000 * counts[s]) // max(tn, 1)
        model[s] = (hits.get(s, 0), e, c, e - c)
    assert fair == model
