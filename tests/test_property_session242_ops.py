"""Session-242 check: tf_saturation_profile vs exact models."""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize

_W = ["a1", "b2", "c3"]


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_W), min_size=1, max_size=20),
        min_size=1,
        max_size=12,
    )
)
def test_tf_saturation_profile_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(docs) + 1), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["tf_saturation_profile"].sql).fetchall()

    bands = Counter()
    for ws in docs:
        for t, c in Counter(tokenize(" ".join(ws))).items():
            bands[min(c, 8)] += 1

    def sat(tf):
        return (1_000_000 * tf * 22) // (10 * tf + 12)

    model = [
        (tfb, bands.get(tfb, 0), sat(tfb), sat(tfb) - (sat(tfb - 1) if tfb > 1 else 0))
        for tfb in range(1, 9)
    ]
    assert got == model
    # exactness: the integer form equals the rational 2.2tf/(tf+1.2) floored
    for tfb, _, s, _ in got:
        frac = Fraction(22 * tfb, 10 * tfb + 12) * 1_000_000
        assert s == frac.numerator // frac.denominator
    # saturation is increasing and concave (marginals strictly decreasing)
    margs = [r[3] for r in got]
    assert all(m > 0 for m in margs)
    assert margs == sorted(margs, reverse=True)
