"""Property-based semantics checks for the session-123 operators.

Models: dedup quality shift via union-find + TTR over the pair oracle,
shingle df spectrum and lang census against direct counting.
DuckDB-only.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=8).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_text3, min_size=2, max_size=10))
def test_dedup_quality_shift_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["s0"] * len(docs),
                "text": docs,
            }
        ),
    )
    pairs = con.execute(REGISTRY["minhash_lsh_pairs"].sql).fetchall()
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["dedup_quality_shift"].sql).fetchall()
    }
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    model: dict[str, list[int]] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        n_tok = len(ws)
        ttr = 0 if n_tok == 0 else (1_000_000 * len(set(ws))) // n_tok
        if d not in parent:
            grp = "unique"
        elif find(d) == d:
            grp = "survivor"
        else:
            grp = "dropped"
        cell = model.setdefault(grp, [0, 0, 0])
        cell[0] += 1
        cell[1] += n_tok
        cell[2] += ttr
    assert got == {
        g: (n, tk, s // n) for g, (n, tk, s) in model.items()
    }


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_text3, min_size=1, max_size=10))
def test_shingle_spectrum_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["s0"] * len(docs),
                "text": docs,
            }
        ),
    )
    got = dict(con.execute(REGISTRY["shingle_df_spectrum"].sql).fetchall())
    dfc: dict[str, set[int]] = {}
    for d, t in enumerate(docs):
        ws = t.lower().split()
        for i in range(len(ws) - 2):
            dfc.setdefault(" ".join(ws[i : i + 3]), set()).add(d)
    from collections import Counter

    assert got == dict(Counter(len(s) for s in dfc.values()))


_textl = st.lists(st.sampled_from(["aa", "bb"]), min_size=0, max_size=5).map(
    " ".join
)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["en", "fr", "zz"]), _textl),
        min_size=1,
        max_size=15,
    )
)
def test_lang_census_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [lg for lg, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["lang_census"].sql).fetchall()
    }
    model = {}
    for lg in {l for l, _ in docs}:
        mine = [t for l, t in docs if l == lg]
        model[lg] = (
            len(mine),
            sum(len(t.split()) for t in mine),
            (1_000_000 * len(mine)) // len(docs),
        )
    assert got == model
