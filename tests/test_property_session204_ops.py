"""Property-based semantics checks for the session-204 operators.

DuckDB-only. cep_pattern_match: the negation-pattern semantics replayed
by a brute-force per-user scan (incl. equal-timestamp ordering by
event_id); mix_rebalance_cost: the q0-weight share pipeline in Python;
ivf_davies_bouldin is checked through structural invariants (its legs
reuse the pytest-proven k-means prelude; cross-engine value equality is
the contract test's job).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize

_T0 = datetime.datetime(2024, 10, 1)


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.sampled_from(["view", "purchase", "error", "click"]),
            st.integers(min_value=0, max_value=7200),  # seconds
        ),
        min_size=1,
        max_size=50,
    )
)
def test_cep_pattern_match_matches_bruteforce(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "event_type": [t for _, t, _ in evs],
                "ts": [_T0 + datetime.timedelta(seconds=s) for _, _, s in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["cep_pattern_match"].sql).fetchall()
    assert len(got) == 1

    by_user = {}
    for i, (u, t, s) in enumerate(evs):
        by_user.setdefault(u, []).append((s * 1000000, i, t))
    n_views = conv = clean = 0
    for rows in by_user.values():
        rows.sort()
        for k, (us, _, t) in enumerate(rows):
            if t != "view":
                continue
            n_views += 1
            p_pos = next(
                (m for m in range(k + 1, len(rows)) if rows[m][2] == "purchase"),
                None,
            )
            e_pos = next(
                (m for m in range(k + 1, len(rows)) if rows[m][2] == "error"),
                None,
            )
            if p_pos is not None and rows[p_pos][0] - us <= 3600000000:
                conv += 1
                if e_pos is None or e_pos > p_pos:
                    clean += 1
    model = (
        n_views,
        conv,
        clean,
        conv - clean,
        (1000000 * clean) // max(n_views, 1),
    )
    assert got[0] == model


_WORDS = ["aa", "bb", "cc", "dd"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki", "books"]),
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_mix_rebalance_cost_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "source": [s for s, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["mix_rebalance_cost"].sql).fetchall()
    }

    cur = {}
    for s, ws in docs:
        cur[s] = cur.get(s, 0) + len(tokenize(" ".join(ws)))
    w0 = {s: round(math.pow(c, 0.7)) for s, c in cur.items()}
    tt, tw = sum(cur.values()), sum(w0.values())
    model = {}
    for s in cur:
        share = (1000000 * w0[s]) // max(tw, 1)
        tgt = (tt * share) // 1000000
        model[s] = (cur[s], tgt, max(cur[s] - tgt, 0), max(tgt - cur[s], 0))
    assert got == model
    # targets never exceed the corpus total
    assert sum(m[1] for m in model.values()) <= tt


def test_ivf_davies_bouldin_invariants():
    """Structural check on the real sandbox table: every cell reports a
    positive scatter bound, a worst-neighbor distinct from itself, and
    internal consistency n_members >= 1."""
    con = duckdb.connect()
    for t in ["embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    rows = con.execute(REGISTRY["ivf_davies_bouldin"].sql).fetchall()
    assert rows, "no cells"
    cids = [r[0] for r in rows]
    assert cids == sorted(cids)
    for cid, n_members, s_q6, worst_other, r_q6 in rows:
        assert n_members >= 1
        assert s_q6 >= 0
        assert worst_other != cid and worst_other in cids
        assert r_q6 >= 0
