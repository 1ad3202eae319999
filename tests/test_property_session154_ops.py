"""Property-based semantics checks for the session-154 operators.

Models: the five-rule event audit with INJECTED dirty rows (sandbox is
all-clean), the row-group pruning simulation under both layouts, and
the TTR-vs-duplication AUC (Mann-Whitney cell model). DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_D0 = datetime.datetime(1996, 3, 1)
_BAD_TS = datetime.datetime(1980, 1, 1)


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.sampled_from(["view", "click", "weird"]),
            st.sampled_from([1.0, -2.5, 0.0]),
            st.sampled_from(['{"k": 3}', "{}", '{"j": 1}']),
            st.booleans(),  # bad ts?
            st.sampled_from([5, -1]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_events_rule_audit_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "event_type": [t for t, _, _, _, _ in evs],
                "value": [v for _, v, _, _, _ in evs],
                "props": [p for _, _, p, _, _ in evs],
                "ts": [_BAD_TS if bad else _D0 for _, _, _, bad, _ in evs],
                "user_id": [u for _, _, _, _, u in evs],
            }
        ),
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(REGISTRY["events_rule_audit"].sql).fetchall()
    }
    n = len(evs)
    model = {
        "nonneg_value": (n, sum(1 for _, v, _, _, _ in evs if v < 0)),
        "known_type": (n, sum(1 for t, _, _, _, _ in evs if t == "weird")),
        "props_has_k": (n, sum(1 for _, _, p, _, _ in evs if '"k"' not in p)),
        "ts_in_range": (n, sum(1 for _, _, _, bad, _ in evs if bad)),
        "nonneg_user": (n, sum(1 for _, _, _, _, u in evs if u < 0)),
    }
    assert got == model


@settings(max_examples=35, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.sampled_from(["en", "de", "fr"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_sort_layout_pruning_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [i for i, _ in docs],
                "lang": [l for _, l in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["sort_layout_pruning_estimate"].sql
        ).fetchall()
    }

    ga = {(i // 64) for i, _ in docs}
    ta = {(i // 64) for i, l in docs if l == "en"}
    srt = sorted(docs, key=lambda t: (t[1], t[0]))
    gb = {(pos // 64) for pos, _ in enumerate(srt)}
    tb = {(pos // 64) for pos, (_, l) in enumerate(srt) if l == "en"}
    model = {
        "doc_id_order": (len(ga), len(ta), (1000000 * len(ta)) // len(ga)),
        "lang_sorted": (len(gb), len(tb), (1000000 * len(tb)) // len(gb)),
    }
    assert got == model


_word = st.sampled_from(["alpha", "beta", "gamma", "gamma"])


@settings(max_examples=30, deadline=None)
@given(
    base=st.lists(
        st.lists(_word, min_size=1, max_size=6), min_size=1, max_size=8
    ),
    ndup=st.integers(min_value=0, max_value=3),
)
def test_quality_gate_roc_matches_model(base, ndup):
    texts = [" ".join(ws) for ws in base]
    texts += texts[:ndup]  # exact duplicates
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = con.execute(REGISTRY["quality_gate_roc"].sql).fetchall()[0]

    from collections import Counter

    cnt = Counter(texts)
    rows = []
    for t in texts:
        ws = t.split()
        ttr = _round_away(1e6 * len(set(ws)) / len(ws))
        rows.append((ttr, 1 if cnt[t] > 1 else 0))
    na = sum(f for _, f in rows)
    nb = len(rows) - na
    cells: dict[int, list[int]] = {}
    for s, f in rows:
        cell = cells.setdefault(s, [0, 0])
        cell[f == 0] += 0  # no-op for clarity
        if f:
            cell[0] += 1
        else:
            cell[1] += 1
    u2 = 0
    cb_before = 0
    for s in sorted(cells):
        ca, cb = cells[s]
        u2 += ca * (2 * cb_before + cb)
        cb_before += cb
    if na == 0 or nb == 0:
        auc = 0
    else:
        auc = _round_away(1000000 * (float(u2) / (2.0 * na * nb)))
    assert got == (na, nb, auc)
