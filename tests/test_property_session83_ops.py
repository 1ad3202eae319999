"""Property-based semantics checks for the session-83 operators.

Models: the Bloom estimate against a literal k=4 position simulation
(exact positions, one ln at the end), and the type-overlap matrix
against direct set arithmetic. DuckDB-only.
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


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=40
    )
)
def test_bloom_estimate_matches_model(users):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": range(len(users)), "user_id": users}),
    )
    t, est, n_exact = con.execute(
        REGISTRY["bloom_user_estimate"].sql
    ).fetchall()[0]
    pos = set()
    for u in set(users):
        h = hashlib.md5(str(u).encode()).hexdigest()
        for s in (0, 4, 8, 12):
            pos.add(int(h[s : s + 4], 16))
    assert t == len(pos)
    assert n_exact == len(set(users))
    want = _round_away(-16384.0 * math.log(1.0 - len(pos) / 65536.0))
    assert est == want
    # for sparse filters the estimate is within rounding of the truth
    assert abs(est - 4 * n_exact / 4) <= n_exact  # sanity envelope


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_type_overlap_matches_model(events):
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
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["event_type_user_overlap"].sql).fetchall()
    }
    aud: dict[str, set[int]] = {}
    for u, e in events:
        aud.setdefault(e, set()).add(u)
    model = {}
    types = sorted(aud)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            both = len(aud[a] & aud[b])
            if both == 0:
                continue
            union = len(aud[a]) + len(aud[b]) - both
            model[(a, b)] = (
                len(aud[a]),
                len(aud[b]),
                both,
                (1_000_000 * both) // union,
            )
    assert got == model
