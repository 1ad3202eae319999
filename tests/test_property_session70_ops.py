"""Property-based semantics checks for the session-70 operators.

Models: an exact winsorized-mean model over sorted value lists (clip at
the floor/ceil rank order statistics), a 2-D hour×weekday census, and a
Hellinger model with the H ≤ JSD-family bound invariants. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    _US_PER_DAY,
    _WINSOR_HI,
    _WINSOR_LO,
    REGISTRY,
)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=50, deadline=None)
@given(lens=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60))
def test_winsorized_mean_matches_model(lens):
    docs = ["w " * n for n in lens]
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n, lo, hi, wm = con.execute(REGISTRY["winsorized_mean_doclen"].sql).fetchall()[0]
    vs = sorted(lens)
    assert n == len(vs)
    k_lo = (_WINSOR_LO * (n - 1)) // 1_000_000
    k_hi = (_WINSOR_HI * (n - 1) + 999_999) // 1_000_000
    v_lo, v_hi = vs[k_lo], vs[k_hi]
    assert (lo, hi) == (v_lo, v_hi)
    clipped = [min(max(x, v_lo), v_hi) for x in vs]
    assert wm == _round_away(sum(clipped) / float(n))
    # robust-center sandwich: clip_lo <= winsor_mean <= clip_hi
    assert lo <= wm <= hi


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.integers(min_value=0, max_value=10 * 86_400_000_000), min_size=1, max_size=30
    )
)
def test_heatmap_matches_model_and_marginals(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": pd.to_datetime(pd.Series(evs, dtype="int64"), unit="us"),
                "value": [1.0] * len(evs),
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["events_hour_weekday_heatmap"].sql).fetchall()
    }
    model: dict[tuple[int, int], int] = {}
    for t in evs:
        k = (((t // _US_PER_DAY) + 3) % 7, (t // 3_600_000_000) % 24)
        model[k] = model.get(k, 0) + 1
    assert got == model
    # the heatmap's hour-marginal equals events_hour_profile's counts
    hour_prof = {
        r[0]: r[1] for r in con.execute(REGISTRY["events_hour_profile"].sql).fetchall()
    }
    for h in range(24):
        assert hour_prof[h] == sum(v for (d, hh), v in got.items() if hh == h)


_W = ["aa", "bb", "cc", "dd"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(
    ta=st.lists(_text, min_size=1, max_size=4),
    tb=st.lists(_text, min_size=1, max_size=4),
)
def test_hellinger_matches_model(ta, tb):
    docs = [(t, "sa") for t in ta] + [(t, "sb") for t in tb]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [t for t, _ in docs],
                "source": [s for _, s in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["hellinger_source_pairs"].sql).fetchall()
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for t in ta:
        for w in t.split():
            ca[w] = ca.get(w, 0) + 1
    for t in tb:
        for w in t.split():
            cb[w] = cb.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    shared = sorted(set(ca) & set(cb))
    if not shared:
        assert got == []
        return
    bc = sum(
        _round_away(
            1_000_000 * math.sqrt((ca[w] / float(na)) * (cb[w] / float(nb)))
        )
        for w in shared
    )
    h2 = max(1_000_000 - bc, 0)
    assert got == [("sa", "sb", len(shared), h2)]
    # identical sources -> H^2 ~ 0; disjoint-support pairs never appear
    if ta == tb:
        assert h2 <= len(shared) + 1
