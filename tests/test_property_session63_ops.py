"""Property-based semantics checks for the session-63 operators.

Models: a PPMI neighbor-ranking model over the ±2-window pair table, a
band-membership × TTR-bucket census model, and a brute-force
interval-stabbing model for the sweep-line backlog (the sweep must equal
counting orderdate <= d < shipdate directly). DuckDB-only.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    _BACKLOG_STRIDE,
    _TCC_MIN_W,
    _TOPK_TERMS,
    REGISTRY,
)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_W = list(_TOPK_TERMS) + ["aa", "bb"]
_text = st.lists(st.sampled_from(_W), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_ppmi_expansion_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    got = con.execute(REGISTRY["ppmi_query_expansion"].sql).fetchall()
    pc: dict[tuple[str, str], int] = {}
    uc: dict[str, int] = {}
    for t in docs:
        ws = t.split()
        for w in ws:
            uc[w] = uc.get(w, 0) + 1
        for i in range(len(ws) - 1):
            k = tuple(sorted((ws[i], ws[i + 1])))
            pc[k] = pc.get(k, 0) + 2
        for i in range(len(ws) - 2):
            k = tuple(sorted((ws[i], ws[i + 2])))
            pc[k] = pc.get(k, 0) + 1
    n_tok = sum(uc.values())
    w_tot = sum(pc.values())
    model = []
    for qt in _TOPK_TERMS:
        cands = []
        for (a, b), w_ab in pc.items():
            if w_ab < _TCC_MIN_W or qt not in (a, b):
                continue
            ppmi = _round_away(
                1_000_000
                * max(
                    0.0,
                    math.log(
                        (w_ab / float(w_tot))
                        / ((uc[a] / float(n_tok)) * (uc[b] / float(n_tok)))
                    ),
                )
            )
            if ppmi > 0:
                cands.append((b if a == qt else a, w_ab, ppmi))
        cands.sort(key=lambda r: (-r[2], r[0]))
        for rn, (nb, w_ab, ppmi) in enumerate(cands[:3], 1):
            model.append((qt, nb, w_ab, ppmi, rn))
    model.sort(key=lambda r: (r[0], r[4]))
    assert got == model


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not sh:
        return set()
    mh = [min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh) for k in range(4)]
    return {mh[0] + mh[1], mh[2] + mh[3]}


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.sampled_from(["aa bb cc dd", "aa bb cc", "x", "", "aa aa aa aa"]),
        min_size=1,
        max_size=8,
    )
)
def test_quality_dup_census_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(REGISTRY["quality_dup_census"].sql).fetchall()
    }
    bands = [_mh_bands(t) for t in docs]
    dup = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if bands[i] & bands[j]:
                dup |= {i, j}
    cells: dict[tuple[int, int], list[int]] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        n, nd = len(ws), len(set(ws))
        qb = -1 if n == 0 else min(4, (_round_away(1_000_000.0 * nd / n) * 5) // 1_000_000)
        cell = cells.setdefault((qb, 1 if d in dup else 0), [0, 0])
        cell[0] += 1
        cell[1] += n
    assert got == {k: tuple(v) for k, v in cells.items()}


_D0 = datetime.date(1995, 1, 1)


@settings(max_examples=30, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),  # order day offset
            st.integers(min_value=0, max_value=90),  # ship delay
        ),
        min_size=1,
        max_size=25,
    )
)
def test_backlog_sweep_matches_stabbing(items):
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(items)),
            "o_orderdate": [_D0 + datetime.timedelta(days=o) for o, _ in items],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": range(len(items)),
            "l_shipdate": [
                _D0 + datetime.timedelta(days=o + s) for o, s in items
            ],
        }
    )
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("lineitem", lineitem)
    got = dict(con.execute(REGISTRY["open_lineitems_timeseries"].sql).fetchall())
    base = (_D0 - datetime.date(1970, 1, 1)).days
    deltas = set()
    for o, s in items:
        deltas.add(base + o)
        deltas.add(base + o + s)
    d0 = min(deltas)
    for day in sorted(deltas):
        if (day - d0) % _BACKLOG_STRIDE != 0:
            continue
        open_now = sum(1 for o, s in items if base + o <= day < base + o + s)
        assert got[day] == open_now
    assert set(got) == {d for d in deltas if (d - d0) % _BACKLOG_STRIDE == 0}
