"""Property-based semantics checks for the session-222 operators.

DuckDB-only (oracle SQL vs exact Python models): raw-moment skew/kurt,
Durbin-Watson over the quantized residual pipeline, and the log-bucket
quantile estimator incl. its containment convention.
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


@settings(max_examples=40, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=50)
)
def test_doclen_moments_matches_model(lens):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"text": [" ".join("w" for _ in range(k)) for k in lens]}),
    )
    got = con.execute(REGISTRY["doclen_moments_board"].sql).fetchall()
    assert len(got) == 1

    xs = [k // 8 for k in lens]
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    s3 = sum(x**3 for x in xs)
    s4 = sum(x**4 for x in xs)
    m = float(s1) / n
    v = (float(s2) * n - float(s1) * s1) / (float(n) * n)
    if v <= 0:
        sk = ku = 0
    else:
        sk = _round_away(
            1000000 * ((float(s3) / n - 3 * m * v - m**3) / (math.sqrt(v) * v))
        )
        ku = _round_away(
            1000000
            * (
                (
                    float(s4) / n
                    - 4 * m * (float(s3) / n)
                    + 6 * m * m * (float(s2) / n)
                    - 3 * m**4
                )
                / (v * v)
                - 3
            )
        )
    assert got[0] == (
        n,
        _round_away(1000000 * m),
        _round_away(1000000 * v),
        sk,
        ku,
    )


_T0 = datetime.datetime(2026, 1, 5)  # a Monday


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60)
)
def test_durbin_watson_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"ts": [_T0 + datetime.timedelta(days=d) for d in days]}),
    )
    got = con.execute(REGISTRY["residual_durbin_watson"].sql).fetchall()
    assert len(got) == 1

    base = int(_T0.timestamp()) // 86400
    lo, hi = min(days), max(days)
    counts = {x: 0 for x in range(lo, hi + 1)}
    for d in days:
        counts[d] += 1
    by_dow = {}
    for x, c in counts.items():
        by_dow.setdefault((base + x + 3) % 7, []).append(c)
    means = {dow: (1000000 * sum(cs)) // len(cs) for dow, cs in by_dow.items()}

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    es = [
        tdiv(1000000 * counts[x] - means[(base + x + 3) % 7], 1000000)
        for x in range(lo, hi + 1)
    ]
    sse = sum(e * e for e in es)
    ssd = sum((a - b) ** 2 for a, b in zip(es[1:], es))
    if sse == 0:
        dw = 2000000
    else:
        dw = _round_away(1000000 * float(ssd) / sse)
    assert got[0] == (hi - lo + 1, dw)


@settings(max_examples=40, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=1, max_value=3000000), min_size=1, max_size=60
    )
)
def test_logbucket_quantile_matches_model(cents):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_type": "purchase",
                "value": [c / 100 for c in cents],
                "ts": [_T0 + datetime.timedelta(seconds=i) for i in range(len(cents))],
            }
        ),
    )
    got = con.execute(REGISTRY["logbucket_quantile_estimate"].sql).fetchall()

    s = sorted(cents)
    n = len(s)
    bk = {}
    for c in cents:
        b = max(c, 1).bit_length() - 1
        bk[b] = bk.get(b, 0) + 1
    model = []
    for p in (500000, 900000):
        x = (n - 1) * p
        # exact leg
        r = x // 1000000
        v_lo, v_hi = s[r], s[min(r + 1, n - 1)]
        exact = _round_away(v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo))
        # sketch leg: containing log bucket + interpolation
        cb = 0
        for b in sorted(bk):
            if 1000000 * cb <= x < 1000000 * (cb + bk[b]):
                est = _round_away(
                    (2.0**b)
                    * (1 + float(x - 1000000 * cb) / (1000000 * bk[b]))
                )
                break
            cb += bk[b]
        rel = (1000000 * abs(est - exact)) // max(exact, 1)
        model.append((p, exact, est, rel))
    assert got == model
    # log-bucket estimates are within one bucket width of truth
    for _, exact, est, _ in model:
        assert est <= 4 * max(exact, 1)
