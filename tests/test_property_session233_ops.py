"""Session-233 operator checks (bm25_idf_variant_compare,
multibyte_offset_census). DuckDB-only."""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _IDFV_TERMS
from docix_spark.analysis.tokenizer import tokenize

_WORDS = ["the", "spark", "join", "loop", "x"]


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        min_size=2,
        max_size=20,
    )
)
def test_bm25_idf_variant_compare_structure(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(docs) + 1), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    rows = con.execute(REGISTRY["bm25_idf_variant_compare"].sql).fetchall()
    by = {r[0]: r for r in rows}
    assert set(by) == {"lucene", "plain", "rsj"}

    # exact model of the negative-idf counts
    n = len(docs)
    df = Counter()
    for ws in docs:
        for t in set(tokenize(" ".join(ws))):
            df[t] += 1
    import math

    negs = {"lucene": 0, "plain": 0, "rsj": 0}
    for t in _IDFV_TERMS:
        d = df.get(t)
        if not d:
            continue  # unmatched terms never reach the per CTE
        if math.log(1.0 + (n - d + 0.5) / (d + 0.5)) < 0:
            negs["lucene"] += 1
        if math.log(n / d) < 0:
            negs["plain"] += 1
        if math.log((n - d + 0.5) / (d + 0.5)) < 0:
            negs["rsj"] += 1
    for v in negs:
        assert by[v][4] == negs[v]
    # lucene/plain idf are nonnegative by construction (df <= n)
    assert by["lucene"][4] == 0 and by["plain"][4] == 0
    # lucene's own overlap is its full page
    if by["lucene"][1] is not None:
        assert 1 <= by["lucene"][3] <= 10
        # overlap vs itself equals the page size, which caps every other row
        assert by["plain"][3] <= by["lucene"][3]
        assert by["rsj"][3] <= by["lucene"][3]
        # when NO query term is negative under rsj, rsj == lucene ordering
        if negs["rsj"] == 0:
            # identical monotone idf transform need not give identical
            # pages, but the top1 doc must score positive
            assert by["rsj"][2] >= 0


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1"]),
            st.text(min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_multibyte_offset_census_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(1, len(docs) + 1),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["multibyte_offset_census"].sql).fetchall()

    per = {}
    for s, t in docs:
        bl, cl = len(t.encode("utf-8")), len(t)
        nd, na, eb, mx = per.get(s, (0, 0, 0, 0))
        per[s] = (nd + 1, na + (bl == cl), eb + (bl - cl), max(mx, bl - cl))
    model = [(s, *vals) for s, vals in sorted(per.items())]
    assert got == model
    for _, nd, na, eb, mx in got:
        assert 0 <= na <= nd and 0 <= mx <= eb
