"""Property-based semantics checks for the session-225 operators.

DuckDB-only. autocomplete_self_mrr runs against an exact Python model;
ann_result_ild is checked on the sandbox table via structural bounds
plus an exact replay of the pair-mean over the op's own result pages.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize

_WORDS = [
    "aardvark", "aaron", "abacus", "banana", "band", "bandit",
    "cat", "catalog", "dd", "a",
]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
        min_size=1,
        max_size=20,
    )
)
def test_autocomplete_self_mrr_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["autocomplete_self_mrr"].sql).fetchall()
    assert len(got) == 1

    df = {}
    for i, ws in enumerate(docs):
        for t in set(tokenize(" ".join(ws))):
            df[t] = df.get(t, 0) + 1
    el = {t: d for t, d in df.items() if d >= 2 and len(t) >= 2}
    groups = {}
    for t, d in el.items():
        groups.setdefault(t[:2], []).append((t, d))
    n_terms = n_top1 = n_top5 = mrr_sum = 0
    for g in groups.values():
        g.sort(key=lambda td: (-td[1], td[0]))
        for rn, _ in enumerate(g, start=1):
            n_terms += 1
            if rn == 1:
                n_top1 += 1
            if rn <= 5:
                n_top5 += 1
            if rn <= 10:
                mrr_sum += 2520 // rn
    model = (n_terms, n_top1, n_top5, mrr_sum // max(n_terms, 1))
    assert got[0] == model
    # every nonempty prefix group contributes exactly one rank-1 term
    assert n_top1 == len(groups)


def test_ann_result_ild_bounds_and_replay():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        " '/root/testdata/sf0.001/embeddings.parquet'"
    )
    got = con.execute(REGISTRY["ann_result_ild"].sql).fetchall()
    assert len(got) == 1
    n_q, mean_ild, min_ild, max_ild = got[0]
    assert n_q >= 1
    assert 0 <= min_ild <= mean_ild <= max_ild <= 2000000
    # replay the summary from the op's own per-query table
    sql = REGISTRY["ann_result_ild"].sql
    prefix = sql[: sql.rindex("SELECT CAST(count(*) AS BIGINT) AS n_queries")]
    per = con.execute(prefix + "SELECT qid, ild_q6 FROM per").fetchall()
    ilds = [r[1] for r in per]
    assert len(ilds) == n_q
    assert mean_ild == sum(ilds) // max(len(ilds), 1)
    assert min_ild == min(ilds) and max_ild == max(ilds)
