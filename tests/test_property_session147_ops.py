"""Property-based semantics checks for the session-147 operators.

Models: sales-weighted part-name term census (distinct (part, term)
explode then fact join), the script-mix delete-and-measure counters
(CJK injected — the sandbox corpus is Latin-only), and signup
activation flags. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.analysis.tokenizer import tokenize
from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_name_word = st.sampled_from(["steel", "brass", "bolt", "tiny", "bolt"])


@settings(max_examples=30, deadline=None)
@given(
    parts=st.lists(
        st.lists(_name_word, min_size=1, max_size=4),
        min_size=1,
        max_size=6,
    ),
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_part_term_sales_matches_model(parts, li):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(len(parts)),
                "p_name": [" ".join(ws) for ws in parts],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _ in li],
                "l_quantity": [float(q) for _, q in li],
            }
        ),
    )
    got = con.execute(REGISTRY["part_term_sales_topk"].sql).fetchall()

    agg: dict[str, list] = {}
    for pk, q in li:
        if pk >= len(parts):
            continue
        for term in set(tokenize(" ".join(parts[pk]))):
            cell = agg.setdefault(term, [0, set(), 0])
            cell[0] += 1
            cell[1].add(pk)
            cell[2] += 100 * q
    model = sorted(
        ((t, n, len(pks), qc) for t, (n, pks, qc) in agg.items()),
        key=lambda r: (-r[3], r[0]),
    )[:20]
    assert got == model


@settings(max_examples=35, deadline=None)
@given(
    wu=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_wau_overlap_matches_model(wu):
    rows = []
    eid = 0
    d0 = datetime.datetime(1996, 3, 2)  # inside some epoch week
    for w, u in wu:
        rows.append(
            (eid, u, d0 + datetime.timedelta(weeks=w, hours=eid % 24))
        )
        eid += 1
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "ts": [r[2] for r in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["wau_overlap_series"].sql).fetchall()

    epoch = datetime.datetime(1970, 1, 1)
    sets: dict[int, set[int]] = {}
    for _, u, ts in rows:
        wk = int((ts - epoch).total_seconds() * 1e6) // (7 * 86400 * 10**6)
        sets.setdefault(wk, set()).add(u)
    lo, hi = min(sets), max(sets)
    model = []
    for w in range(lo + 1, hi + 1):
        prev = sets.get(w - 1, set())
        cur = sets.get(w, set())
        inter = len(prev & cur)
        union = len(prev) + len(cur) - inter
        j = 0 if union == 0 else (1000000 * inter) // union
        model.append((w, len(prev), len(cur), inter, j))
    assert got == model


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=20 * 24),
            st.sampled_from(["signup", "view", "purchase", "click"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_signup_activation_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "ts": [_D0 + datetime.timedelta(hours=h) for _, h, _ in evs],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["signup_activation_rates"].sql).fetchall()[0]

    t0: dict[int, int] = {}
    for u, h, t in evs:
        if t == "signup":
            t0[u] = min(t0.get(u, 10**9), h)
    n = len(t0)
    na = nc = 0
    for u, start in t0.items():
        if any(
            t == "view" and start <= h < start + 24
            for uu, h, t in evs
            if uu == u
        ):
            na += 1
        if any(
            t == "purchase" and start <= h < start + 7 * 24
            for uu, h, t in evs
            if uu == u
        ):
            nc += 1
    model = (
        n,
        na if n else None,
        nc if n else None,
        (1000000 * na) // n if n else 0,
        (1000000 * nc) // n if n else 0,
    )
    if n == 0:
        assert got[0] == 0
    else:
        assert got == model
