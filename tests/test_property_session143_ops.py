"""Property-based semantics checks for the session-143 operators.

Model: the Roaring container size model (multi-chunk doc_ids injected —
the sandbox corpus never crosses a 65536 boundary). DuckDB-only.
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


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300000),
            st.lists(
                st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_roaring_estimate_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [i for i, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["postings_roaring_estimate"].sql).fetchall()
    }

    per_term: dict[str, set[int]] = {}
    for i, ws in docs:
        for w in set(ws):
            per_term.setdefault(w, set()).add(i)
    model: dict[int, list[int]] = {}
    for ids in per_term.values():
        df = len(ids)
        chunks: dict[int, int] = {}
        for i in ids:
            chunks[i // 65536] = chunks.get(i // 65536, 0) + 1
        byts = sum(8 + (2 * n if n <= 4096 else 8192) for n in chunks.values())
        band = df.bit_length() - 1
        cell = model.setdefault(band, [0, 0, 0, 0])
        cell[0] += 1
        cell[1] += df
        cell[2] += len(chunks)
        cell[3] += byts
    expect = {
        b: (c[0], c[1], c[2], c[3], (1000000 * c[3]) // c[1])
        for b, c in model.items()
    }
    assert got == expect
