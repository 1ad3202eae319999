"""Property-based semantics checks for the session-157 operators.

Models: hourly load×error Pearson, the integer-ceil salting plan, and
wildcard LIKE selectivity with the zero-match LEFT-probe rule.
DuckDB-only (ms per example).
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


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["error", "view", "view", "click"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_load_error_corr_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": [_D0 + datetime.timedelta(hours=h) for h, _ in evs],
                "event_type": [t for _, t in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["load_error_corr"].sql).fetchall()[0]

    per: dict[int, list[int]] = {}
    for h, t in evs:
        cell = per.setdefault(h, [0, 0])
        cell[0] += 1
        cell[1] += 1 if t == "error" else 0
    xs = [c[0] for c in per.values()]
    ys = [c[1] for c in per.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    if n < 2 or n * sxx == sx * sx or n * syy == sy * sy:
        corr = 0
    else:
        corr = _round_away(
            1000000
            * (float(n) * sxy - float(sx) * sy)
            / (
                math.sqrt(float(n) * sxx - float(sx) * sx)
                * math.sqrt(float(n) * syy - float(sy) * sy)
            )
        )
    assert got == (n, sx, sy, corr)


@settings(max_examples=35, deadline=None)
@given(
    li=st.lists(
        st.integers(min_value=0, max_value=6), min_size=1, max_size=40
    )
)
def test_salting_plan_matches_model(li):
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame({"l_orderkey": li}))
    got = con.execute(REGISTRY["salting_plan_advisor"].sql).fetchall()

    cnt: dict[int, int] = {}
    for k in li:
        cnt[k] = cnt.get(k, 0) + 1
    total = len(li)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    model = []
    for k, n in top:
        share = (1000000 * n) // total
        sf = 1 if n * 32 <= total else (n * 32 + total - 1) // total
        model.append((k, n, share, sf))
    assert got == model


_word = st.sampled_from(["spark", "spa", "park", "dark", "sparking", "zq"])


@settings(max_examples=35, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    )
)
def test_wildcard_selectivity_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["wildcard_selectivity_estimate"].sql
        ).fetchall()
    }

    df: dict[str, int] = {}
    for ws in docs:
        for w in set(ws):
            df[w] = df.get(w, 0) + 1

    def like(term, pat):
        if pat == "spa%":
            return term.startswith("spa")
        if pat == "%ark":
            return term.endswith("ark")
        return "par" in term

    model = {}
    for pat in ("spa%", "%ark", "%par%"):
        hits = [t for t in df if like(t, pat)]
        model[pat] = (len(hits), sum(df[t] for t in hits))
    assert got == model
