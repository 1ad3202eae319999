"""Property-based semantics checks for the session-85 operators.

Models: Fano dispersion against a literal zero-filled-calendar model,
repeat rate against direct counting, and the terms-enum page against a
sorted-dictionary walk (including the keyset identity: page 2 equals
the full enumeration sliced after the cursor). DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _ENUM_AFTER, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_DT0 = datetime.datetime(2024, 3, 1)


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=15), min_size=1, max_size=40
    )
)
def test_dispersion_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(days)),
                "ts": [_DT0 + datetime.timedelta(days=d) for d in days],
            }
        ),
    )
    n_days, n_ev, mean_q6, var_q6, fano_q6 = con.execute(
        REGISTRY["events_dispersion_index"].sql
    ).fetchall()[0]
    lo, hi = min(days), max(days)
    xs = [days.count(d) for d in range(lo, hi + 1)]
    n, s = len(xs), sum(xs)
    assert (n_days, n_ev) == (n, s)
    assert mean_q6 == _round_away(1_000_000 * (float(s) / n))
    mn = s // n
    syc = sum(x - mn for x in xs)
    syy = sum((x - mn) ** 2 for x in xs)
    var = (float(n) * syy - float(syc) * syc) / (float(n) * n)
    if n < 2:
        assert var_q6 == 0 and fano_q6 == 0
    else:
        assert var_q6 == _round_away(1_000_000 * var)
        assert fano_q6 == _round_away(1_000_000 * (var / (float(s) / n)))


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=25
    ),
    segs=st.lists(
        st.sampled_from(["AUTO", "MACH"]), min_size=6, max_size=6
    ),
)
def test_repeat_rate_matches_model(orders, segs):
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(6), "c_mktsegment": segs}),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {"o_orderkey": range(len(orders)), "o_custkey": orders}
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["segment_repeat_rate"].sql).fetchall()
    }
    per: dict[int, int] = {}
    for c in orders:
        per[c] = per.get(c, 0) + 1
    model: dict[str, list[int]] = {}
    for c, n in per.items():
        m = model.setdefault(segs[c], [0, 0, 0])
        m[0] += 1
        m[1] += 1 if n >= 2 else 0
        m[2] += n
    assert got == {
        s: (b, r, (1_000_000 * r) // b, o) for s, (b, r, o) in model.items()
    }


_WT = ["alpha", "beta", "gamma", "group", "groupx", "hash", "zeta"]
_textt = st.lists(st.sampled_from(_WT), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textt, min_size=1, max_size=10))
def test_terms_enum_keyset_identity(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["terms_enum_page"].sql).fetchall()
    df: dict[str, int] = {}
    for d, t in enumerate(docs):
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    walk = sorted(w for w in df if w > _ENUM_AFTER)[:10]
    want = [(w, df[w], r) for r, w in enumerate(walk, start=1)]
    assert got == want
