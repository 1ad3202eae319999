"""Property-based semantics checks for the session-152 operators.

Models: phrase-stage cost card (positions, intersection, adjacency),
the PLAIN_DICTIONARY encoding cost model, and the term-length×df
rollup. DuckDB-only (ms per example).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_word = st.sampled_from(["spark", "hash", "join", "filler"])


@settings(max_examples=35, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=8),
        min_size=1,
        max_size=10,
    )
)
def test_phrase_cost_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["web"] * len(docs),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["phrase_cost_estimate"].sql).fetchall()[0]

    t1 = [(d, i) for d, ws in enumerate(docs) for i, w in enumerate(ws) if w == "spark"]
    t2 = [(d, i) for d, ws in enumerate(docs) for i, w in enumerate(ws) if w == "hash"]
    d1 = {d for d, _ in t1}
    d2 = {d for d, _ in t2}
    both = d1 & d2
    scanned = sum(1 for d, _ in t1 if d in both) + sum(
        1 for d, _ in t2 if d in both
    )
    occ = [
        (d, i)
        for d, i in t1
        if (d, i + 1) in set(t2)
    ]
    model = (
        len(d1),
        len(t1),
        len(d2),
        len(t2),
        len(both),
        scanned,
        len({d for d, _ in occ}),
        len(occ),
    )
    assert got == model


_val = st.sampled_from(["web", "news", "a-longer-value", "x"])


@settings(max_examples=35, deadline=None)
@given(vals=st.lists(_val, min_size=1, max_size=20))
def test_encoding_advisor_matches_model(vals):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(vals)),
                "source": vals,
                "lang": ["en"] * len(vals),
                "text": [v + v for v in vals],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["column_encoding_advisor"].sql
        ).fetchall()
    }

    def model_col(values):
        n_rows = len(values)
        distinct = set(values)
        ndv = len(distinct)
        plain = sum(len(v) for v in values)
        bits = max(1, (ndv - 1).bit_length()) if ndv > 1 else 1
        dict_b = sum(len(v) for v in distinct) + (n_rows * bits + 7) // 8
        return (n_rows, ndv, plain, dict_b)

    assert got["source"] == model_col(vals)
    assert got["lang"] == model_col(["en"] * len(vals))
    assert got["text"] == model_col([v + v for v in vals])


@settings(max_examples=35, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "dddd", "bb"]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_term_length_df_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["term_length_df_profile"].sql
        ).fetchall()
    }

    df: dict[str, int] = {}
    for ws in docs:
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    model: dict[int, list[int]] = {}
    for w, d in df.items():
        cell = model.setdefault(len(w), [0, 0])
        cell[0] += 1
        cell[1] += d
    assert got == {
        k: (c[0], c[1], (1000000 * c[1]) // c[0]) for k, c in model.items()
    }
