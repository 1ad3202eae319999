"""Property-based semantics checks for the session-126 operators.

Models: user spans, discount drift and lang provenance against direct
aggregation. DuckDB-only.
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


_ST0 = datetime.datetime(2025, 9, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_user_span_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_ST0 + datetime.timedelta(days=d) for _, d in events],
            }
        ),
    )
    got = dict(con.execute(REGISTRY["user_span_histogram"].sql).fetchall())
    per: dict[int, list[int]] = {}
    for u, d in events:
        per.setdefault(u, []).append(d)
    hist: dict[int, int] = {}
    for ds in per.values():
        span = max(ds) - min(ds)
        b = -1 if span == 0 else span.bit_length() - 1
        hist[b] = hist.get(b, 0) + 1
    assert got == hist


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=0, max_value=10).map(lambda k: k / 100),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_discount_drift_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_shipdate": [
                    _ST0 + datetime.timedelta(days=d) for d, _ in li
                ],
                "l_discount": [x for _, x in li],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["discount_rate_by_month"].sql).fetchall()
    }
    per: dict[int, list[int]] = {}
    for d, x in li:
        dt = _ST0 + datetime.timedelta(days=d)
        mk = dt.year * 12 + dt.month - 1
        per.setdefault(mk, []).append(_round_away(x * 100))
    assert got == {
        mk: (len(v), _round_away(1_000_000 * (float(sum(v)) / len(v))))
        for mk, v in per.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr"]), st.sampled_from(["s0", "s1", "s2"])
        ),
        min_size=1,
        max_size=25,
    )
)
def test_lang_top_source_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [lg for lg, _ in docs],
                "source": [s for _, s in docs],
                "text": [""] * len(docs),
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["lang_top_source"].sql).fetchall()
    }
    model = {}
    for lg in {l for l, _ in docs}:
        srcs = [s for l, s in docs if l == lg]
        from collections import Counter

        c = Counter(srcs)
        top = max(c.values())
        src = min(s for s, n in c.items() if n == top)
        model[lg] = (src, top, (1_000_000 * top) // len(srcs))
    assert got == model
