"""Property-based semantics checks for the session-64 operators.

Models: a Python avgIDF/maxIDF/SCQ model (with the OOV guard), a
first-seen growth-accounting model, and a decile quality-drift model.
DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _BATCH_QUERIES, _US_PER_DAY, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_QW = sorted({t for _, terms in _BATCH_QUERIES for t in terms})
_text = st.lists(st.sampled_from(_QW + ["zz"]), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_preretrieval_qpp_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["preretrieval_qpp"].sql).fetchall()}
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    n_docs = 0
    for t in docs:
        ws = t.split()
        if ws:
            n_docs += 1
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    model = {}
    for qid, terms in _BATCH_QUERIES:
        idfs, scqs = [], []
        for w in terms:
            d = df.get(w, 0)
            idf = _round_away(1_000_000 * math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)))
            scq = _round_away(
                1_000_000
                * (1.0 + math.log(max(cf.get(w, 0), 1)))
                * math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
            )
            idfs.append(idf)
            scqs.append(scq)
        model[qid] = (
            len(terms),
            _round_away(sum(idfs) / float(len(idfs))),
            max(idfs),
            sum(scqs),
        )
    assert got == model


_ev = st.tuples(
    st.integers(min_value=0, max_value=10),  # day
    st.integers(min_value=0, max_value=4),  # user
    st.integers(min_value=-200, max_value=2000),  # cents
)


@settings(max_examples=40, deadline=None)
@given(evs=st.lists(_ev, min_size=1, max_size=30))
def test_new_returning_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": pd.to_datetime(
                    pd.Series([d * _US_PER_DAY + i for i, (d, _, _) in enumerate(evs)],
                              dtype="int64"),
                    unit="us",
                ),
                "user_id": [u for _, u, _ in evs],
                "value": [c / 100.0 for *_, c in evs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["new_returning_daily"].sql).fetchall()
    }
    first = {}
    for d, u, _ in evs:
        first[u] = min(first.get(u, d), d)
    cells: dict[tuple[int, int], list] = {}
    for d, u, c in evs:
        k = (d, 1 if d == first[u] else 0)
        cell = cells.setdefault(k, [set(), 0, 0])
        cell[0].add(u)
        cell[1] += 1
        cell[2] += c
    assert got == {k: (len(v[0]), v[1], v[2]) for k, v in cells.items()}


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=15))
def test_quality_drift_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["quality_drift_deciles"].sql).fetchall()}
    n = len(docs)
    cells: dict[int, list] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        if not ws:
            continue
        dec = (d * 10) // n
        ttr = _round_away(1_000_000.0 * len(set(ws)) / len(ws))
        cell = cells.setdefault(dec, [0, 0, 0])
        cell[0] += 1
        cell[1] += len(ws)
        cell[2] += ttr
    model = {
        dec: (
            c[0],
            c[1],
            _round_away(c[2] / float(c[0])),
            _round_away(c[1] / float(c[0])),
        )
        for dec, c in cells.items()
    }
    assert got == model
