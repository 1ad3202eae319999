"""Property-based semantics checks for the session-86 operators.

Models: the S-stemmer against a literal Python rule chain (rule ORDER
is the contract), the skew census against direct counting, and
case-folding against injected mixed-case text (the prove-the-counters
convention). DuckDB-only.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _sstem(w: str) -> str:
    if len(w) > 5 and w.endswith("ing"):
        return w[:-3]
    if len(w) > 4 and w.endswith("ed"):
        return w[:-2]
    if len(w) > 3 and w.endswith("es"):
        return w[:-2]
    if len(w) > 3 and w.endswith("s") and not w.endswith("ss"):
        return w[:-1]
    return w


_WS = [
    "joins", "join", "joining", "joined", "goes", "glass", "pass",
    "es", "ing", "axes", "cats", "cat", "reading",
]
_texts = st.lists(st.sampled_from(_WS), min_size=1, max_size=10).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_texts, min_size=1, max_size=10))
def test_sstem_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n_tok, raw, stemmed, merged, red = con.execute(
        REGISTRY["sstem_vocab_reduction"].sql
    ).fetchall()[0]
    toks = [w for t in docs for w in t.split()]
    types = set(toks)
    stems = {_sstem(w) for w in types}
    assert n_tok == len(toks)
    assert raw == len(types)
    assert stemmed == len(stems)
    assert merged == raw - stemmed
    assert red == (0 if raw == 0 else (1_000_000 * merged) // raw)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=30,
    ),
    oc=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=20),
)
def test_skew_census_matches_model(li, oc):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_suppkey": [s for _, s in li],
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(len(oc)), "o_custkey": oc}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["fact_key_skew_census"].sql).fetchall()
    }

    def leg(vals):
        from collections import Counter

        c = Counter(vals)
        mx = max(c.values())
        return (len(vals), len(c), mx, (1_000_000 * mx) // len(vals))

    assert got == {
        "lineitem.l_orderkey": leg([o for o, _ in li]),
        "lineitem.l_suppkey": leg([s for _, s in li]),
        "orders.o_custkey": leg(oc),
    }


_WC = ["Spark", "SPARK", "spark", "Hash42", "us", "US", "MiXeD"]
_textc = st.lists(st.sampled_from(_WC), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_textc, min_size=1, max_size=10))
def test_casefold_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n_tok, n_cased, cased_q6, t_cased, t_folded = con.execute(
        REGISTRY["casefold_impact"].sql
    ).fetchall()[0]
    toks = [w for t in docs for w in t.split()]
    assert n_tok == len(toks)
    want_cased = sum(1 for w in toks if w != w.lower())
    assert n_cased == want_cased
    assert cased_q6 == (
        0 if not toks else (1_000_000 * want_cased) // len(toks)
    )
    assert t_cased == len(set(toks))
    assert t_folded == len({w.lower() for w in toks})
