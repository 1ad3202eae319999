"""Property-based semantics checks for the session-201 operators.

DuckDB-only (oracle SQL vs exact Python models).
linkage_mu_weights: m/u counts + smoothed weights replayed over a
brute-force LSH candidate set; ab_sprt_curve: the integer LLR recursion
and decision boundaries; exchange_volume_board: the byte model in plain
Python.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _SPRT_B, _SPRT_C
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _shingles(words):
    return {
        " ".join(words[i : i + 3]) for i in range(len(words) - 2)
    } if len(words) >= 3 else set()


def _bands(words):
    sh = _shingles(words)
    if not sh:
        return []
    mins = [
        min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sh)
        for p in range(4)
    ]
    return [mins[0] + mins[1], mins[2] + mins[3]]


_TEXTS = [
    "alpha beta gamma delta epsilon",
    "alpha beta gamma delta zeta",
    "one two three four five six",
    "uno dos tres cuatro cinco seis",
]


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(_TEXTS),
            st.sampled_from(["web", "wiki"]),
            st.sampled_from(["en", "fr"]),
            st.integers(min_value=50, max_value=200),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_linkage_mu_weights_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [t for t, _, _, _ in docs],
                "source": [s for _, s, _, _ in docs],
                "lang": [l for _, _, l, _ in docs],
                "n_chars": [n for _, _, _, n in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["linkage_mu_weights"].sql).fetchall()
    }

    bands = {i: _bands(tokenize(t)) for i, (t, _, _, _) in enumerate(docs)}
    pairs = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if set(bands[i]) & set(bands[j]):
                pairs.add((i, j))
    nm = nu = 0
    agree = {"lang_same": [0, 0], "len_close": [0, 0], "source_same": [0, 0]}
    for i, j in pairs:
        ti, si, li, ni = docs[i]
        tj, sj, lj, nj = docs[j]
        is_m = ti == tj
        if is_m:
            nm += 1
        else:
            nu += 1
        k = 0 if is_m else 1
        if li == lj:
            agree["lang_same"][k] += 1
        if 10 * abs(ni - nj) <= max(ni, nj):
            agree["len_close"][k] += 1
        if si == sj:
            agree["source_same"][k] += 1

    model = {}
    for f, (ma, ua) in agree.items():
        wa = _round_away(
            1000000
            * math.log((float(ma + 1) * (nu + 2)) / (float(nm + 2) * (ua + 1)))
        )
        wd = _round_away(
            1000000
            * math.log(
                (float(nm + 1 - ma) * (nu + 2)) / (float(nm + 2) * (nu + 1 - ua))
            )
        )
        model[f] = (nm, ma, nu, ua, wa, wd)
    assert got == model


_T0 = datetime.datetime(2024, 5, 1)


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50000),  # first-event second
            st.booleans(),  # converts?
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ab_sprt_curve_matches_model(users):
    rows = []
    for uid, (s, conv) in enumerate(users):
        rows.append((uid, "view", s))
        if conv:
            rows.append((uid, "purchase", s + 100000))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "event_type": [r[1] for r in rows],
                "ts": [_T0 + datetime.timedelta(seconds=r[2]) for r in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["ab_sprt_curve"].sql).fetchall()

    order = sorted(range(len(users)), key=lambda u: (users[u][0], u))
    cumc, model = 0, []
    for seq, u in enumerate(order, start=1):
        cumc += 1 if users[u][1] else 0
        llr = (2 * cumc - seq) * _SPRT_C
        dec = (
            "accept_h1"
            if llr >= _SPRT_B
            else "accept_h0" if llr <= -_SPRT_B else "continue"
        )
        model.append((seq, cumc, llr, dec))
    assert got == model
    # symmetric hypotheses: all-converter stream drifts to accept_h1
    if all(c for _, c in users) and len(users) >= 15:
        assert got[-1][3] == "accept_h1"


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=10),
            st.sampled_from(["web", "wiki", "books"]),
        ),
        min_size=1,
        max_size=15,
    ),
    n_li=st.integers(min_value=0, max_value=30),
)
def test_exchange_volume_board_matches_model(docs, n_li):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for ws, _ in docs],
                "source": [s for _, s in docs],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame({"l_orderkey": pd.Series(range(n_li), dtype="int64")}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["exchange_volume_board"].sql).fetchall()
    }

    tf = {}
    for i, (ws, _) in enumerate(docs):
        for t in tokenize(" ".join(ws)):
            tf[(i, t)] = tf.get((i, t), 0) + 1
    rows_in = sum(tf.values())
    cells = len(tf)
    bytes_tf = sum(20 + len(t) for (_, t) in tf)
    srcs = {}
    for _, s in docs:
        srcs[s] = srcs.get(s, 0) + 1
    model = {
        "tokens_to_tf": (
            rows_in,
            cells,
            bytes_tf,
            (1000000 * cells) // max(rows_in, 1),
        ),
        "lineitem_to_orders_join": (n_li, n_li, 24 * n_li, 1000000 if n_li else 0),
        "docs_to_source_agg": (
            len(docs),
            len(srcs),
            sum(len(s) + 12 for s in srcs),
            (1000000 * len(srcs)) // max(len(docs), 1),
        ),
    }
    assert got == model
