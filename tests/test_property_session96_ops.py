"""Property-based semantics checks for the session-96 operators.

Models: IVF label purity on structural invariants (membership totals
against the vector census), sentence lengths against a literal regex
split, and MoM growth against direct month math. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math
import re

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=20, max_value=30))
def test_ivf_label_purity_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    labels = [i % 3 for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(n), "label": labels, "embedding": vecs}),
    )
    rows = con.execute(REGISTRY["ivf_label_purity"].sql).fetchall()
    # every non-query vector is assigned to exactly one cell
    assert sum(r[1] for r in rows) == n - 1
    for cid, members, top_label, top_n, purity in rows:
        assert 1 <= cid <= 8
        assert top_label in (0, 1, 2)
        assert 1 <= top_n <= members
        assert purity == (1_000_000 * top_n) // members
        assert 3 * top_n >= members  # majority of 3 labels holds >= 1/3


_SEGW = ["aa", "bb", "cc"]


@st.composite
def _sent_text(draw):
    n_sent = draw(st.integers(min_value=0, max_value=4))
    parts = []
    for _ in range(n_sent):
        ws = draw(st.lists(st.sampled_from(_SEGW), min_size=0, max_size=5))
        parts.append(" ".join(ws))
        parts.append(draw(st.sampled_from([".", "!", "?", "!?", ".."])))
    return "".join(parts)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_sent_text(), min_size=1, max_size=10))
def test_sentence_histogram_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = dict(
        con.execute(REGISTRY["sentence_length_histogram"].sql).fetchall()
    )
    hist: dict[int, int] = {}
    for t in docs:
        for seg in re.split(r"[.!?]+", t):
            n = len(re.findall(r"[a-z0-9]+", seg.lower()))
            if n > 0:
                b = n.bit_length() - 1
                hist[b] = hist.get(b, 0) + 1
    assert got == hist


_MT0 = datetime.datetime(1995, 1, 15)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=400), _price),
        min_size=1,
        max_size=30,
    )
)
def test_monthly_growth_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _MT0 + datetime.timedelta(days=d) for d, _ in orders
                ],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["monthly_revenue_growth"].sql).fetchall()
    }
    per: dict[int, list[int]] = {}
    for d, p in orders:
        dt = _MT0 + datetime.timedelta(days=d)
        mkey = dt.year * 12 + dt.month - 1
        cell = per.setdefault(mkey, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(p * 100)
    model = {}
    keys = sorted(per)
    for prev_k, k in zip(keys, keys[1:]):
        prev_rc = per[prev_k][1]
        if prev_rc > 0:
            rc = per[k][1]
            model[k] = (
                per[k][0],
                rc,
                _round_away(1_000_000 * ((float(rc) - prev_rc) / prev_rc)),
            )
    assert got == model
