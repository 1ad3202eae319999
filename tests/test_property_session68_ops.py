"""Property-based semantics checks for the session-68 operators.

Models: Pearson over exact integer pairs for discount/quantity, a
basket-size census, and TwoNN invariants over the sf0.001 fixture (the
full in-cell 2-NN model would re-implement the k-means pipeline — the
oracle already does that; here we pin the estimator's algebra:
ln μ ≥ 0 per point since r₂ ≥ r₁, so d̂ > 0 whenever any point has two
neighbors). DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_intrinsic_dim_invariants_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet'"
    )
    n_points, sum_lmu, id_q6 = con.execute(
        REGISTRY["embedding_intrinsic_dim"].sql
    ).fetchall()[0]
    assert n_points > 0
    # r2 >= r1 per point -> every ln mu >= 0 (up to q6 rounding) -> sum >= -n
    assert sum_lmu >= -n_points
    assert id_q6 > 0
    # i.i.d. 64-dim vectors: the estimate must land in a plausibly-high
    # band (far above real-manifold 10-20 is the honest reading); bound
    # loosely to catch sign/scale regressions only
    assert 2_000_000 < id_q6 < 200_000_000


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),  # discount %
            st.integers(min_value=1, max_value=50),  # quantity
        ),
        min_size=1,
        max_size=30,
    )
)
def test_discount_corr_matches_pearson(rows):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": range(len(rows)),
                "l_discount": [d / 100.0 for d, _ in rows],
                "l_quantity": [q for _, q in rows],
            }
        ),
    )
    n, corr = con.execute(REGISTRY["discount_quantity_corr"].sql).fetchall()[0]
    assert n == len(rows)
    xs = [d for d, _ in rows]
    ys = [q for _, q in rows]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    if n < 2 or n * sxx == sx * sx or n * syy == sy * sy:
        assert corr == 0
    else:
        want = _round_away(
            1_000_000
            * (float(n) * sxy - float(sx) * sy)
            / (
                math.sqrt(float(n) * sxx - float(sx) * sx)
                * math.sqrt(float(n) * syy - float(sy) * sy)
            )
        )
        assert corr == want
        assert -1_000_001 <= corr <= 1_000_001


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=30)
)
def test_order_size_matches_census(keys):
    con = duckdb.connect()
    con.register(
        "lineitem", pd.DataFrame({"l_orderkey": keys, "l_quantity": [1] * len(keys)})
    )
    got = dict(con.execute(REGISTRY["order_size_histogram"].sql).fetchall())
    per: dict[int, int] = {}
    for k in keys:
        per[k] = per.get(k, 0) + 1
    hist: dict[int, int] = {}
    for n in per.values():
        hist[n] = hist.get(n, 0) + 1
    assert got == hist
    assert sum(k * v for k, v in got.items()) == len(keys)  # items conserve
