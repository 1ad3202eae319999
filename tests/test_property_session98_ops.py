"""Property-based semantics checks for the session-98 operators.

Models: title/body JSD against a literal field-split + per-term-q6
model, top moving parts and the acquisition curve against direct
aggregation. DuckDB-only.
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


_WT = ["aa", "bb", "cc", "dd"]
_textt = st.lists(st.sampled_from(_WT), min_size=1, max_size=14).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_textt, min_size=1, max_size=10))
def test_title_body_jsd_matches_model(docs):
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
    rows = con.execute(REGISTRY["title_body_jsd"].sql).fetchall()
    tcnt: dict[str, int] = {}
    bcnt: dict[str, int] = {}
    for t in docs:
        for i, w in enumerate(t.split(), start=1):
            (tcnt if i <= 8 else bcnt)[w] = (
                (tcnt if i <= 8 else bcnt).get(w, 0) + 1
            )
    tt, tb = sum(tcnt.values()), sum(bcnt.values())
    if tt == 0 or tb == 0:
        assert rows == []
        return
    vocab = sorted(set(tcnt) | set(bcnt))
    jsd = 0
    for w in vocab:
        nt, nb = tcnt.get(w, 0), bcnt.get(w, 0)
        p = float(nt) / tt
        q = float(nb) / tb
        m = (p + q) / 2.0
        c = (0.0 if nt == 0 else 0.5 * p * math.log(p / m)) + (
            0.0 if nb == 0 else 0.5 * q * math.log(q / m)
        )
        jsd += _round_away(1_000_000 * c)
    assert rows == [(tt, tb, len(vocab), jsd)]


_ST0 = datetime.datetime(1996, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # partkey
            st.integers(min_value=1, max_value=50),  # qty
            st.integers(min_value=0, max_value=200),  # ship day offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_top_moving_parts_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _, _ in li],
                "l_quantity": [float(q) for _, q, _ in li],
                "l_shipdate": [
                    _ST0 + datetime.timedelta(days=d) for _, _, d in li
                ],
            }
        ),
    )
    got = con.execute(REGISTRY["top_moving_parts"].sql).fetchall()
    per: dict[int, list] = {}
    for p, q, d in li:
        dt = _ST0 + datetime.timedelta(days=d)
        mkey = dt.year * 12 + dt.month - 1
        cell = per.setdefault(p, [0, 0, set()])
        cell[0] += q
        cell[1] += 1
        cell[2].add(mkey)
    rows = sorted(
        ((p, tq, nl, len(ms)) for p, (tq, nl, ms) in per.items()),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    want = [(p, tq, nl, nm, r) for r, (p, tq, nl, nm) in enumerate(rows, start=1)]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_new_customers_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_orderdate": [
                    _ST0 + datetime.timedelta(days=d) for _, d in orders
                ],
            }
        ),
    )
    got = con.execute(REGISTRY["new_customers_monthly"].sql).fetchall()
    first: dict[int, int] = {}
    for c, d in orders:
        dt = _ST0 + datetime.timedelta(days=d)
        mkey = dt.year * 12 + dt.month - 1
        first[c] = min(first.get(c, mkey), mkey)
    per: dict[int, int] = {}
    for mk in first.values():
        per[mk] = per.get(mk, 0) + 1
    cum = 0
    model = []
    for mk in sorted(per):
        cum += per[mk]
        model.append((mk, per[mk], cum))
    assert got == model
    assert model[-1][2] == len(first)
