"""Property-based semantics checks for the session-91 operators.

Models: frequent triples against direct basket enumeration, the
night-owl census against per-user share counting, and the ANOVA F
against an exact replica of the quantized sum-of-squares pipeline.
DuckDB-only.
"""

from __future__ import annotations

import datetime
import math
from itertools import combinations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_triple_support_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "event_type": [e for _, e in events],
            }
        ),
    )
    got = con.execute(REGISTRY["event_triple_support"].sql).fetchall()
    baskets: dict[int, set[str]] = {}
    for u, e in events:
        baskets.setdefault(u, set()).add(e)
    nu = len(baskets)
    sup: dict[tuple, int] = {}
    for types in baskets.values():
        for tri in combinations(sorted(types), 3):
            sup[tri] = sup.get(tri, 0) + 1
    rows = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [
        (a, b, c, n, r, (1_000_000 * n) // nu)
        for r, ((a, b, c), n) in enumerate(rows, start=1)
    ]
    assert got == want


_NT0 = datetime.datetime(2024, 4, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=47),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_night_owl_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_NT0 + datetime.timedelta(hours=h) for _, h in events],
            }
        ),
    )
    got = dict(con.execute(REGISTRY["night_owl_census"].sql).fetchall())
    base_h = int((_NT0 - datetime.datetime(1970, 1, 1)).total_seconds()) // 3600
    per: dict[int, list[int]] = {}
    for u, h in events:
        a = per.setdefault(u, [0, 0])
        a[0] += 1
        if (base_h + h) % 24 < 6:
            a[1] += 1
    hist = {b: 0 for b in range(10)}
    for n, night in per.values():
        hist[min(((1_000_000 * night) // n) // 100_000, 9)] += 1
    assert got == hist


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    parts=st.lists(
        st.tuples(st.sampled_from(["T1", "T2", "T3"]), _price),
        min_size=2,
        max_size=30,
    )
)
def test_anova_matches_model(parts):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(len(parts)),
                "p_type": [t for t, _ in parts],
                "p_retailprice": [p for _, p in parts],
            }
        ),
    )
    k, n, ssb, ssw, f = con.execute(REGISTRY["part_type_anova"].sql).fetchall()[0]
    ys = [(t, _round_away(p * 100) // 100) for t, p in parts]
    nn = len(ys)
    my = sum(y for _, y in ys) // nn
    groups: dict[str, list[int]] = {}
    for t, y in ys:
        groups.setdefault(t, []).append(y - my)
    s = sum(sum(g) for g in groups.values())
    q = sum(sum(d * d for d in g) for g in groups.values())
    sgq = sum(
        _round_away(float(sum(g)) * sum(g) / len(g)) for g in groups.values()
    )
    essb = sgq - _round_away(float(s) * s / nn)
    essw = q - sgq
    assert (k, n, ssb, ssw) == (len(groups), nn, essb, essw)
    if k < 2 or nn <= k or essw <= 0:
        assert f == 0
    else:
        assert f == _round_away(
            1_000_000 * ((essb / (k - 1)) / (essw / (nn - k)))
        )
