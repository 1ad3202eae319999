"""Session-241 check: percentile_method_compare vs exact numpy/python
models of both estimator types (the sandbox's dense lengths make the two
agree; small hypothesis corpora force fractional ranks and real
divergence)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _PMC_PS


@settings(max_examples=50, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=14)
)
def test_percentile_method_compare_matches_model(lens):
    docs = [" ".join(["w"] * L) for L in lens]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(1, len(docs) + 1), "text": docs}),
    )
    got = con.execute(REGISTRY["percentile_method_compare"].sql).fetchall()

    vals = sorted(lens)
    n = len(vals)
    model = []
    for p in _PMC_PS:
        x = (n - 1) * p // 100          # 0-based floor index
        frac = (n - 1) * p % 100
        vx = vals[x]
        vx1 = vals[min(x + 1, n - 1)]
        t7 = 1_000_000 * vx + 10_000 * frac * (vx1 - vx)
        r1 = min((n * p + 99) // 100, n)
        t1 = vals[r1 - 1]
        model.append((p, t7, t1, t7 - 1_000_000 * t1))
    assert got == model
    # type-7 equals numpy's default percentile (scaled), the estimator's
    # defining property
    for (p, t7, _, _) in got:
        np_v = float(np.percentile(np.array(vals, dtype=np.float64), p))
        assert abs(t7 / 1_000_000 - np_v) < 1e-9
    # both estimators are monotone in p
    t7s = [r[1] for r in got]
    t1s = [r[2] for r in got]
    assert t7s == sorted(t7s) and t1s == sorted(t1s)
