"""Property-based semantics checks for the session-197 operators.

DuckDB-only (oracle SQL vs exact Python models) — ms per example.
runtime_filter_benefit: exact bloom-position model over injected
orders/lineitem; km_conversion_survival: textbook KM with injected
censoring (the sandbox corpus has none — every user converts — so the
censored branch lives here); broadcast_threshold_audit: the byte model
recomputed in plain Python over ten tiny injected tables.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _BTA_SPEC, _BTA_THRESHOLD, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _bloom_pos(key: int) -> list[int]:
    h = hashlib.md5(f"rf:{key}".encode()).hexdigest()
    return [int(h[4 * j : 4 * j + 4], 16) for j in range(4)]


@settings(max_examples=30, deadline=None)
@given(
    okeys=st.lists(
        st.tuples(st.integers(min_value=0, max_value=40), st.booleans()),
        min_size=0,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    lkeys=st.lists(st.integers(min_value=0, max_value=60), min_size=0, max_size=40),
)
def test_runtime_filter_benefit_matches_model(okeys, lkeys):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [k for k, _ in okeys],
                "o_orderpriority": [
                    "1-URGENT" if u else "5-LOW" for _, u in okeys
                ],
            }
        ),
    )
    con.register("lineitem", pd.DataFrame({"l_orderkey": lkeys}))
    got = con.execute(REGISTRY["runtime_filter_benefit"].sql).fetchall()
    assert len(got) == 1

    sel = {k for k, u in okeys if u}
    bits = {p for k in sel for p in _bloom_pos(k)}
    n_fact = len(lkeys)
    n_semi = sum(1 for k in lkeys if k in sel)
    n_bloom = sum(1 for k in lkeys if all(p in bits for p in _bloom_pos(k)))
    d = max(n_fact, 1)
    model = (
        len(sel),
        n_fact,
        n_semi,
        n_bloom,
        n_bloom - n_semi,
        (1000000 * (n_fact - n_semi)) // d,
        (1000000 * (n_fact - n_bloom)) // d,
    )
    assert got[0] == model
    # bloom has no false negatives: every semi-join row passes the bloom
    assert n_bloom >= n_semi


_T0 = datetime.datetime(2024, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(
        # (first_day, purchase_offset or None) — None = never converts
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.one_of(st.none(), st.integers(min_value=0, max_value=15)),
        ),
        min_size=1,
        max_size=25,
    ),
    tail=st.integers(min_value=0, max_value=10),
)
def test_km_conversion_survival_matches_model(users, tail):
    rows = []
    max_day = max(fd + (po or 0) for fd, po in users) + tail
    for uid, (fd, po) in enumerate(users):
        rows.append((uid * 100, uid, "view", fd))
        if po is not None:
            rows.append((uid * 100 + 1, uid, "purchase", fd + po))
    # anchor the stream end so censoring durations are driven by `tail`
    rows.append((999999, 999, "purchase", max_day))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
                "ts": [_T0 + datetime.timedelta(days=r[3]) for r in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["km_conversion_survival"].sql).fetchall()

    # model: per-user observation time + event flag (incl. the anchor user)
    obs = []
    for fd, po in users:
        if po is not None:
            obs.append((po, 1))
        else:
            obs.append((max_day - fd, 0))
    obs.append((0, 1))  # anchor user converts instantly
    times = sorted({t for t, ev in obs if ev == 1})
    out, cum = [], 0
    for t in times:
        n_risk = sum(1 for ot, _ in obs if ot >= t)
        d = sum(1 for ot, ev in obs if ot == t and ev == 1)
        c = sum(1 for ot, ev in obs if ot == t and ev == 0)
        if d >= n_risk:
            f = -1000000000000
        else:
            f = _round_away(1000000 * math.log((n_risk - d) / n_risk))
        cum += f
        out.append((t, n_risk, d, c, max(cum, -1000000000000)))
    assert got == out
    # survival is monotone nonincreasing and the last row with d=n is S=0
    lns = [r[4] for r in got]
    assert all(a >= b for a, b in zip(lns, lns[1:]))


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_broadcast_threshold_audit_matches_model(data):
    con = duckdb.connect()
    model = {}
    for name, n_scalar, strs, arr in _BTA_SPEC:
        n = data.draw(st.integers(min_value=0, max_value=6), label=name)
        cols = {}
        est = 8 * n_scalar * n
        for c in strs:
            vals = data.draw(
                st.lists(
                    st.text(
                        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                        max_size=12,
                    ),
                    min_size=n,
                    max_size=n,
                ),
                label=f"{name}.{c}",
            )
            cols[c] = vals
            est += sum(len(v) + 4 for v in vals)
        if arr is not None:
            lens = data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=8), min_size=n, max_size=n
                ),
                label=f"{name}.{arr}",
            )
            cols[arr] = [[0.5] * k for k in lens]
            est += sum(4 * k + 4 for k in lens)
        if not cols:  # count-only table still needs a row anchor column
            cols["_x"] = list(range(n))
        # empty pandas frames garble VARCHAR columns in DuckDB registration
        # (the session-47 lesson) — anchor with one ignored typed row
        if n == 0:
            for c in strs:
                cols[c] = pd.Series([], dtype=str)
            if arr is not None:
                cols[arr] = pd.Series([], dtype=object)
            if "_x" in cols:
                cols["_x"] = pd.Series([], dtype="int64")
        con.register(name, pd.DataFrame(cols))
        model[name] = (
            n,
            est,
            1 if est <= _BTA_THRESHOLD else 0,
            1 if est * 100 <= _BTA_THRESHOLD else 0,
        )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["broadcast_threshold_audit"].sql).fetchall()
    }
    assert got == model
