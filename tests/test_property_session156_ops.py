"""Property-based semantics checks for the session-156 operators.

Models: variance-time Hurst (block sums, _SEG_VAR float-mean variance,
q6-per-point ln, 4-point integer OLS), duplicate-charge lag pairs with
INJECTED double-charges, and the placeholder census with injected
null-ish bodies. DuckDB-only (ms per example).
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


_D0 = datetime.datetime(1996, 3, 1)
_LNM = {1: 0, 2: 693147, 4: 1386294, 8: 2079442}


@settings(max_examples=35, deadline=None)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_hurst_matches_model(days):
    rows = []
    eid = 0
    for d, k in days:
        for _ in range(k):
            rows.append((eid, _D0 + datetime.timedelta(days=d, hours=eid % 20)))
            eid += 1
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": [r[0] for r in rows], "ts": [r[1] for r in rows]}),
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["daily_hurst_estimate"].sql).fetchall()}

    per: dict[int, int] = {}
    for d, k in days:
        per[d] = per.get(d, 0) + k
    lo, hi = min(per), max(per)
    series = [per.get(d, 0) for d in range(lo, hi + 1)]
    pts = []
    model = {}
    for m in (1, 2, 4, 8):
        sums: dict[int, int] = {}
        for k, n in enumerate(series):
            sums[k // m] = sums.get(k // m, 0) + n
        vals = list(sums.values())
        n = len(vals)
        syc, syy = sum(vals), sum(v * v for v in vals)
        if n < 2:
            var = 0
        else:
            var = _round_away(
                1000000 * ((float(n) * syy - float(syc) * syc) / (float(n) * n))
            )
        model[m] = (n, var)
        if var > 0:
            pts.append((_LNM[m], _round_away(1000000 * math.log(var / 1e6))))
    if len(pts) < 4:
        hurst = 0
    else:
        nf = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        hurst = _round_away(
            500000
            * (float(nf) * sxy - float(sx) * sy)
            / (float(nf) * sxx - float(sx) * sx)
        )
    assert got == {m: (model[m][0], model[m][1], hurst) for m in (1, 2, 4, 8)}


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.sampled_from([5.0, 5.0, 7.25]),
            st.integers(min_value=0, max_value=3600),
            st.sampled_from(["purchase", "view"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_duplicate_charge_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _, _ in evs],
                "value": [v for _, v, _, _ in evs],
                "ts": [_D0 + datetime.timedelta(seconds=s) for _, _, s, _ in evs],
                "event_type": [t for _, _, _, t in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["duplicate_charge_census"].sql).fetchall()[0]

    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    n_purch = 0
    for eid, (u, v, s, t) in enumerate(evs):
        if t != "purchase":
            continue
        n_purch += 1
        groups.setdefault((u, round(v * 100)), []).append((s * 10**6, eid))
    n_sus = 0
    sus_cents = 0
    for (u, cents), lst in groups.items():
        lst.sort()
        for i in range(1, len(lst)):
            if lst[i][0] - lst[i - 1][0] <= 600_000_000:
                n_sus += 1
                sus_cents += cents
    assert got == (n_purch, n_sus, sus_cents)


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.sampled_from(
            ["real words here", "null", "  ", "", "N/A", "single", "x y", "-"]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_placeholder_census_matches_model(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = con.execute(REGISTRY["placeholder_doc_census"].sql).fetchall()[0]

    nullish = {"null", "none", "n/a", "na", "nan", "-", "missing"}
    n_empty = n_null = n_single = 0
    for t in texts:
        s = t.strip().lower()
        if s == "":
            n_empty += 1
        elif s in nullish:
            n_null += 1
        elif " " not in s:
            n_single += 1
    assert got == (len(texts), n_empty, n_null, n_single)
