"""Property-based semantics checks for the session-145 operators.

Models: sign-LSH calibration (band-collision candidates, 16-bit
signatures, normalize-once fold dots with the float32 round-trip and
left-to-right accumulation — the session-22 rules) and the order-2
Markov table. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


_comp = st.integers(min_value=-32, max_value=32).map(lambda k: k / 64)
_vec = st.lists(_comp, min_size=16, max_size=16).filter(
    lambda v: any(x != 0 for x in v)
)


@settings(max_examples=25, deadline=None)
@given(vecs=st.lists(_vec, min_size=2, max_size=10))
def test_signlsh_calibration_matches_model(vecs):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["signlsh_calibration_curve"].sql
        ).fetchall()
    }

    fv = [[float(np.float32(x)) for x in v] for v in vecs]

    def band(v, j):
        return sum(1 << i for i in range(4) if v[4 * j + i] > 0)

    def sig(v):
        return sum(1 << i for i in range(16) if v[i] > 0)

    cand = set()
    for a in range(len(fv)):
        for b in range(a + 1, len(fv)):
            if any(band(fv[a], j) == band(fv[b], j) for j in range(4)):
                cand.add((a, b))

    def unit(v):
        s = 0.0
        for x in v:
            s += x * x
        n = math.sqrt(s)
        return [x / n for x in v]

    cells: dict[int, list[int]] = {}
    for a, b in cand:
        hd = bin(sig(fv[a]) ^ sig(fv[b])).count("1")
        ua, ub = unit(fv[a]), unit(fv[b])
        d = 0.0
        for x, y in zip(ua, ub):
            d += x * y
        cq6 = _round_away(1000000 * d)
        cell = cells.setdefault(hd, [0, 0])
        cell[0] += 1
        cell[1] += cq6
    model = {
        hd: (
            n,
            _trunc_div(s, n),
            _round_away(1000000 * math.cos(math.pi * hd / 16)),
        )
        for hd, (n, s) in cells.items()
    }
    assert got == model


_D0 = datetime.datetime(1996, 3, 1)
_etype = st.sampled_from(["view", "click", "purchase"])


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5),
            _etype,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_markov2_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "ts": [
                    _D0 + datetime.timedelta(hours=h) for _, h, _ in evs
                ],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in con.execute(
            REGISTRY["events_markov2_transitions"].sql
        ).fetchall()
    }

    per_user: dict[int, list[tuple[int, int, str]]] = {}
    for eid, (u, h, t) in enumerate(evs):
        per_user.setdefault(u, []).append((h, eid, t))
    cnt: dict[tuple[str, str, str], int] = {}
    for seq in per_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(2, len(types)):
            k = (types[i - 2], types[i - 1], types[i])
            cnt[k] = cnt.get(k, 0) + 1
    ctx_tot: dict[tuple[str, str], int] = {}
    for (a, b, _), n in cnt.items():
        ctx_tot[(a, b)] = ctx_tot.get((a, b), 0) + n
    model = {
        k: (n, (1000000 * n) // ctx_tot[(k[0], k[1])]) for k, n in cnt.items()
    }
    assert got == model
