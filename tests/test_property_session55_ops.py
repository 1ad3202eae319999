"""Property-based semantics checks for the session-55 operators.

Models: a Python routed-percolation model (rarest-term routing, exact
candidate/match counts), an md5-replicating MLM masking model (the
selection and sub-split slices), and an hour-bucket model. DuckDB-only.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _US_PER_DAY, REGISTRY

_V = ["alpha", "beta", "gamma", "dup"]
_text = st.lists(st.sampled_from(_V), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=10))
def test_percolate_routed_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(REGISTRY["percolate_routed"].sql).fetchall()
    }
    # corpus df + doc term sets
    dsets = [set(t.split()) for t in docs]
    df: dict[str, int] = {}
    for s in dsets:
        for w in s:
            df[w] = df.get(w, 0) + 1
    top4 = sorted(df, key=lambda w: (-df[w], w))[:4]
    qt = sorted(set(top4) | {"dup"})
    model = {}
    for i, qa in enumerate(qt):
        for qb in qt[i + 1 :]:
            dfa, dfb = df.get(qa, 0), df.get(qb, 0)
            route, other = (qa, qb) if dfa <= dfb else (qb, qa)
            cands = [s for s in dsets if route in s]
            matched = sum(1 for s in cands if other in s)
            if cands:
                model[(qa, qb)] = (route, len(cands), matched)
    assert got == model
    for route, n_cand, n_match in got.values():
        assert n_match <= n_cand == df.get(route, 0)


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y"]), min_size=0, max_size=30).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_mlm_masking_matches_md5_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s0"] * len(docs)}
        ),
    )
    out = con.execute(REGISTRY["mlm_masking_plan"].sql).fetchall()
    n_tok = n_sel = n_mask = n_rand = n_keep = 0
    for d, t in enumerate(docs):
        for pos in range(len(t.split())):
            n_tok += 1
            h = hashlib.md5(f"mask:{d}:{pos}".encode()).hexdigest()
            if int(h[:4], 16) % 100 < 15:
                n_sel += 1
                sub = int(h[4:6], 16) % 10
                if sub <= 7:
                    n_mask += 1
                elif sub == 8:
                    n_rand += 1
                else:
                    n_keep += 1
    if n_tok == 0:
        assert out == []
        return
    assert out == [("s0", n_tok, n_sel, n_mask, n_rand, n_keep)]
    assert n_sel == n_mask + n_rand + n_keep


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3 * 86_400_000_000),  # ts_us
            st.integers(min_value=-500, max_value=5000),  # cents
        ),
        min_size=1,
        max_size=25,
    )
)
def test_hour_profile_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": pd.to_datetime(
                    pd.Series([t for t, _ in evs], dtype="int64"), unit="us"
                ),
                "value": [c / 100.0 for _, c in evs],
            }
        ),
    )
    got = {r[0]: (r[1], r[2]) for r in con.execute(REGISTRY["events_hour_profile"].sql).fetchall()}
    model = {h: [0, 0] for h in range(24)}
    for ts, c in evs:
        h = (ts // 3_600_000_000) % 24
        model[h][0] += 1
        model[h][1] += c
    assert got == {h: tuple(v) for h, v in model.items()}
    assert len(got) == 24  # zero-filled spine
