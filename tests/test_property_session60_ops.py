"""Property-based semantics checks for the session-60 operators.

Models: a Python gate-cascade model for the waterfall (with the monotone
invariant), an md5-replicating A/B model, and a top-k cut model.
DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _STOP_CUTS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


# words chosen so every gate can flip: short/long tokens, stopwords, dups
_W = ["the", "of", "alpha", "supercalifragilistic", "x"]
_text = st.lists(st.sampled_from(_W), min_size=0, max_size=25).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_waterfall_matches_gate_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(REGISTRY["pipeline_waterfall"].sql).fetchall()}
    stages = {i: [0, 0] for i in range(5)}
    first_of_hash: dict[str, int] = {}
    for d, t in enumerate(docs):
        h = hashlib.md5(t.encode()).hexdigest()
        first_of_hash.setdefault(h, d)
    for d, t in enumerate(docs):
        ws = t.split()
        n = len(ws)
        if n == 0:
            continue  # no tokens -> no per-doc metrics row
        mean_len = sum(len(w) for w in ws) / n
        stop = sum(1 for w in ws if w in ("the", "a", "of", "to", "is"))
        g1 = n >= 20
        g2 = g1 and 2.0 <= mean_len <= 12.0
        g3 = g2 and stop > 0
        g4 = g3 and first_of_hash[hashlib.md5(t.encode()).hexdigest()] == d
        for i, ok in enumerate([True, g1, g2, g3, g4]):
            if ok:
                stages[i][0] += 1
                stages[i][1] += n
    names = ["ingest", "min_length", "token_len_band", "stopword_presence", "exact_dedup"]
    model = {i: (names[i], stages[i][0], stages[i][1]) for i in range(5)}
    assert got == model
    # monotone attrition
    counts = [got[i][1] for i in range(5)]
    assert counts == sorted(counts, reverse=True)


_ev = st.tuples(
    st.integers(min_value=0, max_value=9),  # user
    st.sampled_from(["view", "purchase"]),
    st.integers(min_value=-200, max_value=2000),  # cents
)


@settings(max_examples=40, deadline=None)
@given(evs=st.lists(_ev, min_size=1, max_size=30))
def test_ab_readout_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, *_ in evs],
                "event_type": [et for _, et, _ in evs],
                "value": [c / 100.0 for *_, c in evs],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["ab_assignment_readout"].sql).fetchall()}
    users: dict[int, list] = {}
    for u, et, c in evs:
        users.setdefault(u, []).append((et, c))
    arms: dict[int, list] = {}
    for u, rows in users.items():
        arm = int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:4], 16) % 2
        a = arms.setdefault(arm, [0, 0, 0])
        a[0] += 1
        a[1] += 1 if any(et == "purchase" for et, _ in rows) else 0
        a[2] += sum(c for _, c in rows)
    model = {}
    for arm, (n, conv, cents) in arms.items():
        model[arm] = (
            n,
            conv,
            _round_away(1_000_000.0 * conv / n),
            cents,
            _round_away(cents / float(n)),
        )
    assert got == model


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_stopword_cut_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["stopword_cut_impact"].sql).fetchall()}
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for t in docs:
        ws = t.split()
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    order = sorted(cf, key=lambda w: (-cf[w], w))
    tokens = sum(cf.values())
    model = {}
    for k in _STOP_CUTS:
        cut = order[:k]
        tr = sum(cf[w] for w in cut)
        model[k] = (
            len(cut),
            sum(df[w] for w in cut),
            tr,
            0 if tokens == 0 else _round_away(1_000_000.0 * tr / tokens),
        )
    assert got == model
