"""Property-based semantics checks for the session-172 operators.

Models: hygiene counters with injected typographic debris, digit-run
length histogram, and the modal-alignment census with planted
orphans. DuckDB-only (ms per example).
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_frag = st.sampled_from(
    ["plain words", "  double", "tab\there", "“curly”", "dash—here", " lead", "trail "]
)


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["web", "code"]), _frag),
        min_size=1,
        max_size=20,
    )
)
def test_text_hygiene_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["text_hygiene_census"].sql).fetchall()
    }

    model: dict[str, list[int]] = {}
    for s, t in docs:
        cell = model.setdefault(s, [0, 0, 0, 0, 0, 0])
        cell[0] += 1
        if t.startswith("  ") or t.endswith(" ") or t.startswith(" "):
            cell[1] += 1
        cell[2] += len(re.findall("  ", t))
        cell[3] += len(re.findall("\t", t))
        cell[4] += len(re.findall("[‘’“”]", t))
        cell[5] += len(re.findall("—", t))
    assert got == {s: tuple(v) for s, v in model.items()}


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.sampled_from(
            ["a 12 b", "year 1996", "id 1234567890123", "no digits", "7"]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_digit_run_matches_model(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(REGISTRY["digit_run_histogram"].sql).fetchall()
    }
    model: dict[int, int] = {}
    for t in texts:
        for run in re.findall("[0-9]+", t):
            k = min(len(run), 10)
            model[k] = model.get(k, 0) + 1
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    nd=st.integers(min_value=0, max_value=15),
    nv=st.integers(min_value=0, max_value=15),
    shared=st.integers(min_value=0, max_value=10),
)
def test_alignment_census_matches_model(nd, nv, shared):
    shared = min(shared, nd, nv)
    doc_ids = list(range(shared)) + [100 + i for i in range(nd - shared)]
    vec_ids = list(range(shared)) + [200 + i for i in range(nv - shared)]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": doc_ids or [999999]}),
    )
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": vec_ids or [888888]}),
    )
    got = con.execute(REGISTRY["doc_vec_alignment_census"].sql).fetchall()[0]

    ds, vs = set(doc_ids or [999999]), set(vec_ids or [888888])
    inter = len(ds & vs)
    assert got == (
        len(ds),
        len(vs),
        inter,
        len(ds - vs),
        len(vs - ds),
    )
