"""Property-based semantics checks for the session-162 operators.

Models: KMV bottom-k estimator (exact md5 52-bit uniforms, under-fill
fallback), the lexicon sentiment counts with injected charged docs,
and churn-by-activity banding. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _u52(s: str) -> float:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16) / 4503599627370496.0


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=25, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_kmv_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "event_type": [t for t, _ in evs],
                "user_id": [u for _, u in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["kmv_distinct_estimate"].sql).fetchall()
    }

    per: dict[str, set[int]] = {}
    for t, u in evs:
        per.setdefault(t, set()).add(u)
    model = {}
    for t, us in per.items():
        n = len(us)
        hs = sorted(_u52(f"kmv:{u}") for u in us)
        if n < 64:
            est = n
        else:
            est = _round_away(63 / hs[63])
        model[t] = (n, est, (1000000 * abs(est - n)) // n)
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "code"]),
            st.lists(
                st.sampled_from(
                    ["good", "bad", "love", "hate", "table", "chair", "win"]
                ),
                min_size=1,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_sentiment_matches_model(docs):
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
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["sentiment_lexicon_score"].sql
        ).fetchall()
    }

    pos = {"good", "great", "excellent", "love", "best", "happy", "win", "nice"}
    neg = {"bad", "terrible", "awful", "hate", "worst", "sad", "fail", "poor"}
    model = {}
    agg: dict[str, list[int]] = {}
    for s, ws in docs:
        cell = agg.setdefault(s, [0, 0, 0])
        for w in ws:
            cell[0] += 1
            cell[1] += 1 if w in pos else 0
            cell[2] += 1 if w in neg else 0
    for s, (n, p, ng) in agg.items():
        diff = 1000000 * (p - ng)
        q = abs(diff) // max(n, 1)
        net = q if diff >= 0 else -q
        model[s] = (n, p, ng, net)
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=90),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_churn_band_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "ts": [_D0 + datetime.timedelta(days=d, hours=2) for _, d in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["churn_by_activity_band"].sql
        ).fetchall()
    }

    per: dict[int, list[int]] = {}
    for u, d in evs:
        cell = per.setdefault(u, [0, -1])
        cell[0] += 1
        cell[1] = max(cell[1], d)
    maxd = max(d for _, d in evs)
    model: dict[int, list[int]] = {}
    for n, last in per.values():
        band = n.bit_length() - 1
        churned = 1 if maxd - last > 28 else 0
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += churned
    assert got == {
        b: (c[0], c[1], (1000000 * c[1]) // c[0]) for b, c in model.items()
    }
