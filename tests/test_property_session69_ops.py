"""Property-based semantics checks for the session-69 operators.

Models: an exact HHI model with share²-q6-first quantization, a
return-rate census, and a simhash bit-share model replicating the
tf-weighted vote construction. DuckDB-only.
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


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # partkey
            st.integers(min_value=0, max_value=3),  # suppkey
            st.integers(min_value=1, max_value=40),  # quantity
        ),
        min_size=1,
        max_size=25,
    )
)
def test_hhi_matches_model(rows):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": range(len(rows)),
                "l_partkey": [p for p, *_ in rows],
                "l_suppkey": [s for _, s, _ in rows],
                "l_quantity": [q for *_, q in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["part_supplier_hhi"].sql).fetchall()
    ps: dict[tuple[int, int], int] = {}
    for p, s, q in rows:
        ps[(p, s)] = ps.get((p, s), 0) + q
    parts: dict[int, dict[int, int]] = {}
    for (p, s), q in ps.items():
        parts.setdefault(p, {})[s] = q
    model = []
    for p, supps in parts.items():
        if len(supps) < 2:
            continue
        qt = sum(supps.values())
        hhi = sum(
            _round_away(1_000_000.0 * q * q / (float(qt) * qt)) for q in supps.values()
        )
        model.append((p, len(supps), qt, hhi))
    model.sort(key=lambda r: (-r[3], r[0]))
    assert got == model[:20]
    for _, n_supp, _, hhi in got:
        # HHI bounded: 1/n_supp <= HHI <= 1 (up to per-share rounding)
        assert hhi <= 1_000_000 + n_supp
        assert hhi >= 1_000_000 // n_supp - n_supp


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["1-URGENT", "3-MEDIUM"]),
            st.sampled_from(["R", "N", "A"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_return_rate_matches_model(rows):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(rows)),
                "o_orderpriority": [p for p, _ in rows],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": range(len(rows)),
                "l_returnflag": [f for _, f in rows],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["return_rate_by_priority"].sql).fetchall()}
    cells: dict[str, list[int]] = {}
    for p, f in rows:
        c = cells.setdefault(p, [0, 0])
        c[0] += 1
        c[1] += 1 if f == "R" else 0
    model = {
        p: (c[0], c[1], _round_away(1_000_000.0 * c[1] / c[0]))
        for p, c in cells.items()
    }
    assert got == model


_W = ["aa", "bb", "cc", "dd"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=8).map(" ".join)


def _simhash(text: str) -> int:
    tf: dict[str, int] = {}
    for w in text.lower().split():
        tf[w] = tf.get(w, 0) + 1
    votes = [0] * 60
    for w, c in tf.items():
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for j in range(60):
            votes[j] += c * (((h >> j) & 1) * 2 - 1)
    return sum(1 << j for j in range(60) if votes[j] > 0)


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=6))
def test_simhash_bit_bias_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["simhash_bit_bias"].sql).fetchall()}
    hashes = [_simhash(t) for t in docs]
    n = len(hashes)
    model = {}
    for j in range(60):
        ones = sum((h >> j) & 1 for h in hashes)
        share = _round_away(1_000_000.0 * ones / n)
        model[j] = (ones, n, share, abs(share - 500000))
    assert got == model
