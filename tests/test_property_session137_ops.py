"""Property-based semantics checks for the session-137 operators.

Models: supplier returns board, day-of-month profile and lang vocab
overlap against direct aggregation. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["R", "N", "A"]),
        ),
        min_size=5,
        max_size=30,
    )
)
def test_supplier_returns_match_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _ in li],
                "l_returnflag": [f for _, f in li],
            }
        ),
    )
    got = con.execute(REGISTRY["supplier_return_topk"].sql).fetchall()
    per: dict[int, list[int]] = {}
    for s, f in li:
        cell = per.setdefault(s, [0, 0])
        cell[0] += 1
        cell[1] += 1 if f == "R" else 0
    rows = []
    for s, (n, r) in per.items():
        if n < 5:
            continue
        rows.append((s, n, r, (1_000_000 * r) // n))
    rows.sort(key=lambda r: (-r[3], r[0]))
    want = [
        (s, n, r, q, rk) for rk, (s, n, r, q) in enumerate(rows[:10], start=1)
    ]
    assert got == want


_DT0 = datetime.datetime(1996, 3, 1)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=100), _price),
        min_size=1,
        max_size=25,
    )
)
def test_day_of_month_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _DT0 + datetime.timedelta(days=d) for d, _ in orders
                ],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["day_of_month_profile"].sql).fetchall()
    }
    model: dict[int, list[int]] = {}
    for d, p in orders:
        dom = (_DT0 + datetime.timedelta(days=d)).day
        cell = model.setdefault(dom, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(p * 100)
    assert got == {k: tuple(v) for k, v in model.items()}


_W = ["aa", "bb", "cc", "dd", "ee"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=6).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["en", "fr", "de"]), _text),
        min_size=1,
        max_size=15,
    )
)
def test_lang_vocab_overlap_matches_model(docs):
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
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["lang_vocab_overlap"].sql).fetchall()
    }
    vocab: dict[str, set[str]] = {}
    for lg, t in docs:
        vocab.setdefault(lg, set()).update(t.split())
    model = {}
    langs = sorted(vocab)
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            union = len(vocab[a]) + len(vocab[b]) - inter
            model[(a, b)] = (
                len(vocab[a]),
                len(vocab[b]),
                inter,
                (1_000_000 * inter) // union,
            )
    assert got == model
