"""Session-234 check: nextword_index_estimate vs an exact Python model."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _NW_P1, _NW_P2
from docix_spark.analysis.tokenizer import tokenize

_WORDS = ["spark", "hash", "join", "x"]


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
        min_size=1,
        max_size=20,
    )
)
def test_nextword_index_estimate_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(1, len(docs) + 1),
                "source": ["s0"] * len(docs),  # SQL_WORDS carries source
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["nextword_index_estimate"].sql).fetchall()
    assert len(got) == 1

    toks = {i: tokenize(" ".join(ws)) for i, ws in enumerate(docs, start=1)}
    bigrams = [
        (d, f"{t[i]} {t[i+1]}") for d, t in toks.items() for i in range(len(t) - 1)
    ]
    uni = len({(d, w) for d, t in toks.items() for w in t})
    d1 = {d for d, t in toks.items() if _NW_P1 in t}
    d2 = {d for d, t in toks.items() if _NW_P2 in t}
    bothd = d1 & d2
    pos_rows = sum(
        t.count(_NW_P1) + t.count(_NW_P2) for d, t in toks.items() if d in bothd
    )
    nw_rows = len({d for d, b in bigrams if b == f"{_NW_P1} {_NW_P2}"})
    model = (
        len({b for _, b in bigrams}),
        len(set(bigrams)),
        len(bigrams),
        uni,
        (1_000_000 * len(set(bigrams))) // uni,
        pos_rows,
        nw_rows,
        (1_000_000 * pos_rows) // max(nw_rows, 1),
    )
    assert got[0] == model
    # structural: bigram postings can never exceed occurrences, and the
    # phrase's nextword rows never exceed its positional doc coverage
    assert got[0][1] <= got[0][2]
    assert got[0][6] <= len(bothd)
