"""Property-based semantics checks for the session-89 operators.

Models: session depth conversion against a literal gaps-and-islands
model, the decile lift table against a value-wise decile assignment
model, and the co-occurrence curve against direct pair counting
(including nesting monotonicity of pair mass in the window).
DuckDB-only.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_SE_T0 = datetime.datetime(2024, 2, 1)
_GAP_US = 1_800_000_000


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=7200),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_depth_conversion_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _SE_T0 + datetime.timedelta(seconds=s) for _, s, _ in events
                ],
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["session_depth_conversion"].sql
        ).fetchall()
    }
    per_user: dict[int, list] = {}
    for i, (u, s, e) in enumerate(events):
        per_user.setdefault(u, []).append((s * 1_000_000, i, e))
    agg: dict[int, list[int]] = {}
    for rows in per_user.values():
        rows.sort()
        sessions: list[list] = []
        prev = None
        for t_us, i, e in rows:
            if prev is None or t_us - prev > _GAP_US:
                sessions.append([])
            sessions[-1].append(e)
            prev = t_us
        for sess in sessions:
            bucket = len(sess).bit_length() - 1
            conv = 1 if "purchase" in sess else 0
            a = agg.setdefault(bucket, [0, 0])
            a[0] += 1
            a[1] += conv
    model = {
        b: (n, c, (1_000_000 * c) // n) for b, (n, c) in agg.items()
    }
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.sampled_from(["view", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_decile_lift_matches_model(events):
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
        r[0]: r[1:]
        for r in con.execute(REGISTRY["activity_decile_lift"].sql).fetchall()
    }
    per: dict[int, list[int]] = {}
    for u, e in events:
        a = per.setdefault(u, [0, 0])
        a[0] += 1
        a[1] = max(a[1], 1 if e == "purchase" else 0)
    hist: dict[int, list[int]] = {}
    for n_ev, conv in per.values():
        cell = hist.setdefault(n_ev, [0, 0])
        cell[0] += 1
        cell[1] += conv
    nu = sum(c for c, _ in hist.values())
    nc = sum(v for _, v in hist.values())
    agg = {d: [0, 0] for d in range(10)}
    cum = 0
    for val in sorted(hist):
        c, cv = hist[val]
        d = min((10 * cum) // nu, 9)
        agg[d][0] += c
        agg[d][1] += cv
        cum += c
    model = {}
    for d in range(10):
        users, conv = agg[d]
        rate = 0 if users == 0 else (1_000_000 * conv) // users
        lift = (
            0
            if users == 0 or nc == 0
            else (1_000_000 * conv * nu) // (users * nc)
        )
        model[d] = (users, conv, rate, lift)
    assert got == model


_WC = ["aa", "bb", "cc"]
_textc = st.lists(st.sampled_from(_WC), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textc, min_size=1, max_size=10))
def test_window_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["s0"] * len(docs),
                "text": docs,
            }
        ),
    )
    got = con.execute(REGISTRY["cooccur_window_curve"].sql).fetchall()
    model = []
    for win in (1, 2, 4):
        cnt: dict[tuple[str, str], int] = {}
        for t in docs:
            ws = t.split()
            for off in range(1, win + 1):
                for i in range(len(ws) - off):
                    a, b = sorted((ws[i], ws[i + off]))
                    cnt[(a, b)] = cnt.get((a, b), 0) + 1
        if not cnt:
            continue
        top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        model.append(
            (win, len(cnt), sum(cnt.values()), top[0][0], top[0][1], top[1])
        )
    assert got == model
    # pair mass nests: more window, never less mass
    masses = [r[2] for r in got]
    assert all(x <= y for x, y in zip(masses, masses[1:]))
