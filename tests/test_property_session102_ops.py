"""Property-based semantics checks for the session-102 operators.

Models: the region rollup and sampler audit against direct counting
(sampler model replicates the md5 hash-top-100), token shapes against
literal classification. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), _price),
        min_size=1,
        max_size=25,
    ),
    cnat=st.lists(st.integers(min_value=0, max_value=3), min_size=6, max_size=6),
    nreg=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_region_rollup_matches_model(orders, cnat, nreg):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(6), "c_nationkey": cnat}),
    )
    con.register(
        "nation", pd.DataFrame({"n_nationkey": range(4), "n_regionkey": nreg})
    )
    con.register(
        "region",
        pd.DataFrame({"r_regionkey": [0, 1, 2], "r_name": ["RA", "RB", "RC"]}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["region_revenue_rollup"].sql).fetchall()
    }
    names = {0: "RA", 1: "RB", 2: "RC"}
    model: dict[str, list[int]] = {}
    for c, p in orders:
        reg = names[nreg[cnat[c]]]
        cell = model.setdefault(reg, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(p * 100)
    assert got == {k: tuple(v) for k, v in model.items()}


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.sampled_from(["s0", "s1", "s2"]), min_size=1, max_size=30
    )
)
def test_sample_mix_bias_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": docs,
                "text": [""] * len(docs),
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["sample_mix_bias"].sql).fetchall()
    }
    ranked = sorted(
        range(len(docs)),
        key=lambda d: (hashlib.md5(str(d).encode()).hexdigest()[8:12], d),
    )[:100]
    ns = len(ranked)
    nc = len(docs)
    model = {}
    for src in set(docs):
        n_corpus = docs.count(src)
        n_sample = sum(1 for d in ranked if docs[d] == src)
        model[src] = (
            n_corpus,
            n_sample,
            (1_000_000 * n_corpus) // nc,
            (1_000_000 * n_sample) // max(ns, 1),
        )
    assert got == model


_WS = ["spark", "42", "h4sh", "a1", "zz", "007"]
_texts = st.lists(st.sampled_from(_WS), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_texts, min_size=1, max_size=10))
def test_token_shapes_match_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["token_shape_census"].sql).fetchall()
    }
    toks = [w for t in docs for w in t.split()]
    model: dict[str, list] = {}
    for w in toks:
        stripped = "".join(c for c in w if not c.isdigit())
        shape = (
            "alpha" if stripped == w else ("digit" if not stripped else "mixed")
        )
        cell = model.setdefault(shape, [0, set()])
        cell[0] += 1
        cell[1].add(w)
    assert got == {s: (n, len(tys)) for s, (n, tys) in model.items()}
