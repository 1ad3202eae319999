"""Property-based semantics checks for the session-158 operators.

Models: resurrected-user monthly accounting and source×lang mutual
information (q6-per-cell). ann_mutual_knn rides the k-means prelude
(driver-contract territory); its reciprocity semantics are proven here
standalone on an injected top-1 table shape via a direct pair model
over one shared cell. DuckDB-only (ms per example).
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


_D0 = datetime.datetime(1996, 1, 15)


@settings(max_examples=35, deadline=None)
@given(
    ud=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_resurrected_monthly_matches_model(ud):
    rows = []
    for i, (u, d) in enumerate(ud):
        rows.append((i, u, _D0 + datetime.timedelta(days=d, hours=5)))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "ts": [r[2] for r in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["resurrected_users_monthly"].sql).fetchall()

    epoch = datetime.date(1970, 1, 1)
    days: dict[int, set[int]] = {}
    for _, u, ts in rows:
        days.setdefault(u, set()).add((ts.date() - epoch).days)
    act: dict[int, set[int]] = {}
    res: dict[int, set[int]] = {}
    for u, ds in days.items():
        sd = sorted(ds)
        for i, d in enumerate(sd):
            dt = epoch + datetime.timedelta(days=d)
            ym = dt.year * 100 + dt.month
            act.setdefault(ym, set()).add(u)
            if i > 0 and d - sd[i - 1] > 28:
                res.setdefault(ym, set()).add(u)
    model = []
    for ym in sorted(act):
        na = len(act[ym])
        nr = len(res.get(ym, set()))
        model.append((ym, na, nr, (1000000 * nr) // na))
    assert got == model


@settings(max_examples=35, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "code", "news"]),
            st.sampled_from(["en", "de"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_source_lang_mi_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "lang": [l for _, l in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["source_lang_mutual_info"].sql).fetchall()[0]

    from collections import Counter

    cells = Counter(docs)
    ns = Counter(s for s, _ in docs)
    nl = Counter(l for _, l in docs)
    n = len(docs)
    mi = sum(
        _round_away(
            1000000 * (c / n) * math.log((c * n) / (ns[s] * nl[l]))
        )
        for (s, l), c in cells.items()
    )
    assert got == (n, len(ns), len(nl), mi)


@settings(max_examples=25, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=-1000000, max_value=1000000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_mutual_knn_reciprocity_semantics(pairs):
    # standalone check of the top-1 + reciprocity + top-10 SQL tail on an
    # injected in-cell pair table (one shared cell): argmax per id with
    # (cos DESC, id ASC) tiebreak, mutual = both directions pick each
    # other, cut ordered by cos DESC, id_a ASC
    pr = [(a, b, c) for a, b, c in pairs if a != b]
    if not pr:
        return
    con = duckdb.connect()
    con.register(
        "pr",
        pd.DataFrame(
            {
                "id_a": [a for a, _, _ in pr],
                "id_b": [b for _, b, _ in pr],
                "cos_q6": [c for _, _, c in pr],
            }
        ),
    )
    got = con.execute(
        """WITH d AS (SELECT DISTINCT id_a, id_b, cos_q6 FROM pr),
t1 AS (
  SELECT id_a, id_b, cos_q6 FROM (
    SELECT id_a, id_b, cos_q6,
           row_number() OVER (PARTITION BY id_a ORDER BY cos_q6 DESC, id_b ASC) AS rn
    FROM d) WHERE rn = 1)
SELECT x.id_a, x.id_b, x.cos_q6
FROM t1 x JOIN t1 y ON y.id_a = x.id_b AND y.id_b = x.id_a AND x.id_a < x.id_b
ORDER BY x.cos_q6 DESC, x.id_a ASC LIMIT 10"""
    ).fetchall()

    dd = {}
    for a, b, c in pr:
        dd[(a, b)] = c  # last write wins is NOT deterministic; dedupe below
    # rebuild as the DISTINCT set the SQL sees
    dset = {(a, b, c) for a, b, c in pr}
    best: dict[int, tuple[int, int]] = {}
    for a, b, c in dset:
        cur = best.get(a)
        if cur is None or (c, -b) > (cur[0], -cur[1]):
            best[a] = (c, b)
    mutual = []
    for a, (c, b) in best.items():
        if a < b and b in best and best[b][1] == a:
            mutual.append((a, b, c))
    mutual.sort(key=lambda t: (-t[2], t[0]))
    assert got == mutual[:10]
