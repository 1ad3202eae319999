"""Property-based semantics checks for embedding_power_iteration.

The model mirrors every stage of the operator in pure Python: integer
matvecs (exact), then the three per-iteration float steps written with the
IDENTICAL operation order as the shared `_PI_U/_PI_WS/_PI_V` expression
strings (float(int) conversion, one division, one multiply, sqrt — all
IEEE ops both engines run on the same exact integers). Components are
multiples of 1/64 so the q6 input rounding is ulp-unambiguous
(x = 15625·k exactly). DuckDB-only plus semantic checks: unit norm and
alignment with a planted dominant direction.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _PI_ITERS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _model(xrows: list[list[int]]) -> list[int]:
    v = [50000 + 3000 * d for d in range(64)]
    for _ in range(_PI_ITERS):
        s = [sum(x[d] * v[d] for d in range(64)) for x in xrows]
        u = [_round_away(si / 1000000.0) for si in s]
        w = [sum(x[d] * ui for x, ui in zip(xrows, u)) for d in range(64)]
        mx = max((abs(wd) for wd in w), default=0)
        ws = [
            0 if mx == 0 else _round_away(300000000 * (float(wd) / float(mx)))
            for wd in w
        ]
        n2 = sum(wd * wd for wd in ws)
        v = [
            0 if n2 == 0 else _round_away(1000000 * (float(wd) / math.sqrt(float(n2))))
            for wd in ws
        ]
    return v


def _run_oracle(vecs: list[list[int]]):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [[k / 64.0 for k in v] for v in vecs],
            }
        ),
    )
    return con.execute(REGISTRY["embedding_power_iteration"].sql).fetchall()


_vec = st.lists(st.integers(min_value=-64, max_value=64), min_size=64, max_size=64)


@settings(max_examples=25, deadline=None)
@given(vecs=st.lists(_vec, min_size=1, max_size=6))
def test_power_iteration_matches_model(vecs):
    got = _run_oracle(vecs)
    xrows = [[15625 * k for k in v] for v in vecs]
    model = _model(xrows)
    assert got == [(d, model[d]) for d in range(64)]
    # unit norm up to quantization: ||v||² within 1e-3 of 1 unless degenerate
    n2 = sum(x * x for _, x in got)
    if any(any(k for k in v) for v in vecs) and n2 > 0:
        assert abs(n2 - 10**12) < 2e9


def test_power_iteration_finds_planted_direction():
    """Rank-1 data: every row is ±c·e where e alternates ±1/64 — three
    iterations must align v with e up to sign (|cos| > 0.999)."""
    e = [1 if d % 2 == 0 else -1 for d in range(64)]
    vecs = [[k * s * ei for ei in e] for k, s in [(3, 1), (2, -1), (4, 1), (1, -1)]]
    got = _run_oracle(vecs)
    v = [x for _, x in got]
    dot = sum(vi * ei for vi, ei in zip(v, e))
    nv = math.sqrt(sum(x * x for x in v))
    ne = math.sqrt(64)
    assert nv > 0
    assert abs(dot / (nv * ne)) > 0.999


def test_power_iteration_zero_corpus_is_all_zero():
    got = _run_oracle([[0] * 64])
    assert got == [(d, 0) for d in range(64)]
