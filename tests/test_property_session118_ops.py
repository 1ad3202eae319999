"""Property-based semantics checks for the session-118 operators.

Models: sampled-stats ranking fidelity against a dual BM25 model (full
vs even-half statistics, OOV fallback included), the region×segment
matrix and value-drift deciles against direct counting. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WF = ["dup", "spark", "zz", "yy"]
_textf = st.lists(st.sampled_from(_WF), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textf, min_size=1, max_size=12))
def test_sampled_fidelity_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    k, ov = con.execute(
        REGISTRY["sampled_stats_ranking_fidelity"].sql
    ).fetchall()[0]
    assert k == 10
    tfs: dict[tuple[int, str], int] = {}
    dls: dict[int, int] = {}
    dfc: dict[str, int] = {}
    dfhalf: dict[str, int] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
            if d % 2 == 0:
                dfhalf[w] = dfhalf.get(w, 0) + 1
    nd = len(docs)
    avgdl = sum(dls.values()) / float(nd)
    half_ids = [d for d in range(nd) if d % 2 == 0]
    nh = float(len(half_ids))
    avgdlh = (
        sum(dls[d] for d in half_ids) / nh if half_ids else 0.0
    )

    def top10(n_docs, avg, dftab, fallback_zero):
        scores = {}
        for d in range(nd):
            ss = []
            for w in ("dup", "spark"):
                if (d, w) not in tfs:
                    continue
                df = dftab.get(w, 0 if fallback_zero else None)
                tf = tfs[(d, w)]
                ss.append(
                    math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                    * tf * 2.2
                    / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avg))
                )
            if ss:
                scores[d] = _round_away(sum(ss) * 1_000_000)
        return set(sorted(scores, key=lambda d: (-scores[d], d))[:10])

    tfull = top10(float(nd), avgdl, dfc, False)
    thalf = top10(nh, avgdlh, dfhalf, True) if half_ids else set()
    assert ov == len(tfull & thalf)


@settings(max_examples=40, deadline=None)
@given(
    cnat=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=15),
    segs=st.lists(st.sampled_from(["AU", "MA"]), min_size=1, max_size=15),
    nreg=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_region_segment_matrix_matches_model(cnat, segs, nreg):
    n = min(len(cnat), len(segs))
    cnat, segs = cnat[:n], segs[:n]
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(n),
                "c_nationkey": cnat,
                "c_mktsegment": segs,
            }
        ),
    )
    con.register(
        "nation", pd.DataFrame({"n_nationkey": range(4), "n_regionkey": nreg})
    )
    con.register(
        "region",
        pd.DataFrame({"r_regionkey": [0, 1, 2], "r_name": ["RA", "RB", "RC"]}),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["region_segment_matrix"].sql).fetchall()
    }
    names = {0: "RA", 1: "RB", 2: "RC"}
    model: dict[tuple[str, str], int] = {}
    for nk, sg in zip(cnat, segs):
        key = (names[nreg[nk]], sg)
        model[key] = model.get(key, 0) + 1
    assert got == model


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=500), _price),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_value_drift_deciles_match_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [k for k, _ in orders],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["order_value_drift_deciles"].sql
        ).fetchall()
    }
    lo = min(k for k, _ in orders)
    hi = max(k for k, _ in orders)
    model: dict[int, list[int]] = {}
    for k, p in orders:
        d = min((10 * (k - lo)) // max(hi - lo + 1, 1), 9)
        cell = model.setdefault(d, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(p * 100)
    assert got == {
        d: (n, _round_away(1_000_000 * (float(s) / n)))
        for d, (n, s) in model.items()
    }
