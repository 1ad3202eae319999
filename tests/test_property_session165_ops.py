"""Property-based semantics checks for the session-165 operators.

Models: negative-idf term census, q6-vs-q9 top-10 overlap on injected
vectors, and the RLE run count against a literal run-scan model.
DuckDB-only (ms per example).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_word = st.sampled_from(["common", "common", "rare", "mid"])


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=4), min_size=1, max_size=12
    )
)
def test_negative_idf_matches_model(docs):
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
    got = con.execute(REGISTRY["negative_idf_census"].sql).fetchall()

    df: dict[str, int] = {}
    for ws in docs:
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    n = len(docs)
    rows = [
        (w, d, n, _round_away(1000000 * math.log(n / d)))
        for w, d in df.items()
        if 2 * d > n
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    assert got == rows[:20]


_comp = st.integers(min_value=-16, max_value=16).map(lambda k: k / 32)
_vec = st.lists(_comp, min_size=4, max_size=4).filter(
    lambda v: any(x != 0 for x in v)
)


@settings(max_examples=20, deadline=None)
@given(vecs=st.lists(_vec, min_size=2, max_size=12))
def test_quantization_overlap_is_ten_or_tied(vecs):
    # vec_id 0 is excluded corpus-side; %37==0 queries => only qid 0
    # with tiny lists, so plant ids 1..n and add id 37 as a query too
    ids = list(range(1, len(vecs) + 1))
    if 37 not in ids:
        ids[-1] = 37  # ensure at least one query id
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": ids,
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            }
        ),
    )
    got = con.execute(
        REGISTRY["ann_quantization_sensitivity"].sql
    ).fetchall()

    # model: per query, both rankings from the same double cosines
    fv = {i: [float(np.float32(x)) for x in v] for i, v in zip(ids, vecs)}

    def cos(a, b):
        d = na = nb = 0.0
        for x, y in zip(fv[a], fv[b]):
            d += x * y
            na += x * x
            nb += y * y
        return d / (math.sqrt(na) * math.sqrt(nb))

    model = []
    for q in sorted(i for i in ids if i % 37 == 0):
        scored = [(v, cos(v, q)) for v in ids if v != 0]
        t6 = sorted(scored, key=lambda t: (-_round_away(1e6 * t[1]), t[0]))[:10]
        t9 = sorted(scored, key=lambda t: (-_round_away(1e9 * t[1]), t[0]))[:10]
        ov = len({v for v, _ in t6} & {v for v, _ in t9})
        model.append((q, ov))
    assert got == model


@settings(max_examples=35, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),
            st.integers(min_value=1, max_value=7),
            st.sampled_from(["R", "N", "A"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_rle_runs_match_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _, _ in li],
                "l_linenumber": [l for _, l, _ in li],
                "l_returnflag": [v for _, _, v in li],
            }
        ),
    )
    got = con.execute(REGISTRY["rle_run_census"].sql).fetchall()[0]

    seq = [v for _, _, v in sorted(li, key=lambda t: (t[0], t[1]))]
    runs = 1 + sum(1 for i in range(1, len(seq)) if seq[i] != seq[i - 1])
    ndv = len(set(seq))
    assert got == (len(seq), runs, ndv, (1000000 * runs) // ndv)
