"""Property-based semantics checks for the session-210 operators.

DuckDB-only (oracle SQL vs exact Python models): Chapman
capture-recapture, the centered jackknife variance pipeline, and the
exact 1-D Wasserstein distance vs a brute-force transport model.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
        min_size=1,
        max_size=16,
    )
)
def test_capture_recapture_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["capture_recapture_vocab"].sql).fetchall()
    assert len(got) == 1

    ev, od, al = set(), set(), set()
    for i, ws in enumerate(docs):
        ts = set(tokenize(" ".join(ws)))
        al |= ts
        if i % 2 == 0:
            ev |= ts
        else:
            od |= ts
    v1, v2, v12, vo = len(ev), len(od), len(ev & od), len(al)
    chap = _round_away((float(v1 + 1) * (v2 + 1)) / (v12 + 1)) - 1
    cov = (1000000 * vo) // max(chap, 1)
    assert got[0] == (v1, v2, v12, vo, chap, cov)
    # the estimator never undershoots the shared vocabulary
    assert chap >= v12


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
        min_size=1,
        max_size=15,
    )
)
def test_jackknife_ttr_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["jackknife_ttr_variance"].sql).fetchall()
    assert len(got) == 1

    stats = []
    for ws in docs:
        ts = tokenize(" ".join(ws))
        stats.append((len(set(ts)), len(ts)))
    n = len(stats)
    dd = sum(d for d, _ in stats)
    nn = sum(t for _, t in stats)
    full_q9 = _round_away(1000000000 * float(dd) / max(nn, 1))
    devs = []
    for d, t in stats:
        if nn - t > 0:
            loo = _round_away(1000000000 * float(dd - d) / (nn - t))
            devs.append(loo - _round_away(1000000000 * float(dd) / nn))
    m = len(devs)
    if m < 2:
        var = 0
    else:
        s1, s2 = sum(devs), sum(v * v for v in devs)
        var = _round_away(
            1000000000000
            * (float(m - 1) / m)
            * ((float(s2) * m - float(s1) * s1) / (float(m) * m))
            / 1e18
        )
    assert got[0] == (n, full_q9, m, var)


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki", "books"]),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_wasserstein_matches_model(docs):
    texts = [" ".join(_WORDS[i % 7] for i in range(k)) for _, k in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"source": [s for s, _ in docs], "text": texts}),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["wasserstein_length_pairs"].sql).fetchall()
    }

    vals = {}
    for (s, _), t in zip(docs, texts):
        vals.setdefault(s, []).append(len(tokenize(t)))
    model = {}
    srcs = sorted(vals)
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            v1, v2 = vals[s1], vals[s2]
            n1, n2 = len(v1), len(v2)
            merged = sorted(set(v1) | set(v2))
            w = 0
            for v, vn in zip(merged, merged[1:]):
                f1 = sum(1 for x in v1 if x <= v)
                f2 = sum(1 for x in v2 if x <= v)
                w += _round_away(
                    1000000
                    * (abs(float(f1) * n2 - float(f2) * n1) * (vn - v))
                    / (float(n1) * n2)
                )
            model[(s1, s2)] = w
    assert got == model
    # W1 of identical empirical distributions is 0
    for (s1, s2), w in got.items():
        if sorted(vals[s1]) == sorted(vals[s2]):
            assert w == 0
