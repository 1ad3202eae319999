"""Property-based semantics checks for the session-160 operators.

Models: the balanced-interleave merge tail on injected ranked lists
(the BM25/PL2 front is driver-contract territory), duplicate-group
doc_id span bands, and the per-type value profile. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=35, deadline=None)
@given(
    la=st.lists(
        st.integers(min_value=0, max_value=15), min_size=1, max_size=10,
        unique=True,
    ),
    lb=st.lists(
        st.integers(min_value=0, max_value=15), min_size=1, max_size=10,
        unique=True,
    ),
    rel=st.sets(st.integers(min_value=0, max_value=15)),
)
def test_balanced_interleave_merge_semantics(la, lb, rel):
    con = duckdb.connect()
    con.register(
        "atop",
        pd.DataFrame({"doc_id": la, "rnk": range(1, len(la) + 1)}),
    )
    con.register(
        "ptop",
        pd.DataFrame({"doc_id": lb, "rnk": range(1, len(lb) + 1)}),
    )
    con.register("relt", pd.DataFrame({"doc_id": sorted(rel) or [10**9]}))
    got = con.execute(
        """WITH seq AS (SELECT doc_id, rnk, 'A' AS team FROM atop
        UNION ALL SELECT doc_id, rnk, 'B' FROM ptop),
ded AS (SELECT doc_id, rnk, team FROM (
          SELECT doc_id, rnk, team,
                 row_number() OVER (PARTITION BY doc_id ORDER BY rnk, team) AS dd
          FROM seq) WHERE dd = 1),
pos AS (SELECT doc_id, team,
               row_number() OVER (ORDER BY rnk, team, doc_id) AS position
        FROM ded)
SELECT CAST(pos.position AS BIGINT), pos.doc_id, pos.team,
       CAST(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
FROM pos LEFT JOIN relt r ON r.doc_id = pos.doc_id
WHERE pos.position <= 10 ORDER BY position"""
    ).fetchall()

    seq = [(r, "A", d) for r, d in enumerate(la, 1)]
    seq += [(r, "B", d) for r, d in enumerate(lb, 1)]
    seen = {}
    for r, t, d in sorted(seq):
        if d not in seen or (r, t) < seen[d]:
            seen[d] = (r, t)
    merged = sorted(
        ((r, t, d) for d, (r, t) in seen.items()),
        key=lambda x: (x[0], x[1], x[2]),
    )
    model = [
        (i + 1, d, t, 1 if d in rel else 0)
        for i, (r, t, d) in enumerate(merged[:10])
    ]
    assert got == model


_word = st.sampled_from(["alpha", "beta", "gamma"])


@settings(max_examples=30, deadline=None)
@given(
    base=st.lists(
        st.lists(_word, min_size=1, max_size=4), min_size=1, max_size=6
    ),
    place=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[1],
    ),
)
def test_dup_locality_matches_model(base, place):
    texts = {i: " ".join(ws) for i, ws in enumerate(base)}
    # duplicates planted at arbitrary doc_ids ≥ 1000
    for src, off in place:
        if src < len(base):
            texts[1000 + off] = " ".join(base[src])
    con = duckdb.connect()
    ids = sorted(texts)
    con.register(
        "documents",
        pd.DataFrame({"doc_id": ids, "text": [texts[i] for i in ids]}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["dup_locality_census"].sql).fetchall()
    }

    groups: dict[str, list[int]] = {}
    for i, t in texts.items():
        groups.setdefault(t, []).append(i)
    model: dict[int, list[int]] = {}
    for ids_ in groups.values():
        if len(ids_) < 2:
            continue
        span = max(ids_) - min(ids_)
        band = span.bit_length() - 1
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += len(ids_)
    assert got == {k: tuple(v) for k, v in model.items()}


_val = st.integers(min_value=0, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(st.sampled_from(["view", "purchase", "error"]), _val),
        min_size=1,
        max_size=30,
    )
)
def test_type_value_profile_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_type": [t for t, _ in evs],
                "value": [v for _, v in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["type_value_profile"].sql).fetchall()
    }
    model: dict[str, list[int]] = {}
    for t, v in evs:
        c = _round_away(v * 100)
        cell = model.setdefault(t, [0, 0, None, None])
        cell[0] += 1
        cell[1] += c
        cell[2] = c if cell[2] is None else min(cell[2], c)
        cell[3] = c if cell[3] is None else max(cell[3], c)
    assert got == {t: tuple(v) for t, v in model.items()}
