"""Property-based semantics checks for the session-127 operators.

Models: A/B value against the literal md5 arms, hapax mass against
token-level df counting, user CTR buckets against direct ratios.
DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_val = st.integers(min_value=0, max_value=4000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=200), _val),
        min_size=1,
        max_size=30,
    )
)
def test_ab_value_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "value": [v for _, v in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["ab_value_readout"].sql).fetchall()
    }
    per: dict[int, int] = {}
    for u, v in events:
        per[u] = per.get(u, 0) + _round_away(v * 100)
    arms: dict[int, list[int]] = {}
    for u, c in per.items():
        a = int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:4], 16) % 2
        arms.setdefault(a, []).append(c)
    model = {
        a: (
            len(cs),
            sum(cs),
            _round_away(1_000_000 * (float(sum(cs)) / len(cs))),
        )
        for a, cs in arms.items()
    }
    assert got == model


_W = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=6).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1"]), _text),
        min_size=1,
        max_size=12,
    )
)
def test_hapax_share_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["hapax_token_share"].sql).fetchall()
    }
    dfc: dict[str, set[int]] = {}
    for d, (_, t) in enumerate(docs):
        for w in set(t.split()):
            dfc.setdefault(w, set()).add(d)
    model: dict[str, list[int]] = {}
    for s, t in docs:
        for w in t.split():
            cell = model.setdefault(s, [0, 0])
            cell[0] += 1
            cell[1] += 1 if len(dfc[w]) == 1 else 0
    assert got == {
        s: (n, h, (1_000_000 * h) // n) for s, (n, h) in model.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_user_ctr_matches_model(events):
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
    got = dict(con.execute(REGISTRY["user_ctr_histogram"].sql).fetchall())
    per: dict[int, list[int]] = {}
    for u, e in events:
        cell = per.setdefault(u, [0, 0])
        if e == "view":
            cell[0] += 1
        elif e == "click":
            cell[1] += 1
    hist: dict[int, int] = {}
    for views, clicks in per.values():
        if views == 0:
            continue
        b = min((1_000_000 * clicks) // views // 200_000, 5)
        hist[b] = hist.get(b, 0) + 1
    assert got == hist
