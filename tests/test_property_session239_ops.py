"""Session-239 check: intersection_order_cost vs an exact set model."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _IOC_TERMS
from docix_spark.analysis.tokenizer import tokenize

_W = list(_IOC_TERMS) + ["x", "y"]


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_W), min_size=1, max_size=6),
        min_size=1,
        max_size=25,
    )
)
def test_intersection_order_cost_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(docs) + 1), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["intersection_order_cost"].sql).fetchall()

    sets = {
        i: {d for d, ws in enumerate(docs, start=1) if t in tokenize(" ".join(ws))}
        for i, t in enumerate(_IOC_TERMS, start=1)
    }
    d = {i: len(sets[i]) for i in sets}
    i123 = len(sets[1] & sets[2] & sets[3])

    def row(name, order):
        first = d[order[0]]
        a2 = len(sets[order[0]] & sets[order[1]])
        return (name, first, a2, i123, first + a2)

    asc = sorted(sets, key=lambda i: (d[i], i))
    desc = sorted(sets, key=lambda i: (-d[i], i))
    model = sorted(
        [row("given", (1, 2, 3)), row("df_asc", tuple(asc)), row("df_desc", tuple(desc))]
    )
    assert got == model
    by = {r[0]: r for r in got}
    # the textbook law: ascending-df order never probes more than descending
    assert by["df_asc"][4] <= by["df_desc"][4]
    # candidate sets only shrink along the chain
    for r in got:
        assert r[1] >= r[2] >= r[3]
