"""Property-based semantics checks for the session-168 operators.

Models: fold balance over the verbatim hex-13-16 coordinate,
relevant-rank banding on an injected match set, and the 16-cell chi²
uniformity arithmetic. DuckDB-only (ms per example).
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


_word = st.sampled_from(["alpha", "beta", "gamma", "delta"])


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=0, max_size=5), min_size=1, max_size=15
    )
)
def test_fold_balance_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["fold_balance_audit"].sql).fetchall()
    }

    model: dict[int, list] = {}
    for i, ws in enumerate(docs):
        fold = int(hashlib.md5(str(i).encode()).hexdigest()[12:16], 16) % 5
        cell = model.setdefault(fold, [0, 0, set()])
        cell[0] += 1
        cell[1] += len(ws)
        cell[2].update(ws)
    expect = {}
    for fold, (nd, nt, terms) in model.items():
        ttr = 0 if nt == 0 else _round_away(1e6 * len(terms) / nt)
        expect[fold] = (nd, nt, len(terms), ttr)
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(
    lab=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rank_band_semantics(lab):
    con = duckdb.connect()
    con.register(
        "agg",
        pd.DataFrame(
            {
                "doc_id": range(len(lab)),
                "score_q6": [s for s, _ in lab],
                "is_rel": [1 if r else 0 for _, r in lab],
            }
        ),
    )
    got = con.execute(
        """WITH rk AS (SELECT row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rnk,
              is_rel FROM agg),
bd AS (SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS band, is_rel FROM rk)
SELECT band, CAST(count(*) AS BIGINT), CAST(sum(is_rel) AS BIGINT),
       CAST((1000000 * sum(is_rel)) // count(*) AS BIGINT)
FROM bd GROUP BY band ORDER BY band"""
    ).fetchall()

    order = sorted(range(len(lab)), key=lambda i: (-lab[i][0], i))
    bands: dict[int, list[int]] = {}
    for pos, i in enumerate(order, 1):
        b = pos.bit_length() - 1
        cell = bands.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += 1 if lab[i][1] else 0
    model = [
        (b, c[0], c[1], (1000000 * c[1]) // c[0])
        for b, c in sorted(bands.items())
    ]
    assert got == model


@settings(max_examples=25, deadline=None)
@given(n_docs=st.integers(min_value=1, max_value=60))
def test_hash_uniformity_matches_model(n_docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(n_docs)})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["hash_coordinate_uniformity"].sql
        ).fetchall()
    }

    model = {}
    for name, pos in [
        ("shard_1_4", 1),
        ("split_5_8", 5),
        ("sample_9_12", 9),
        ("fold_13_16", 13),
    ]:
        from collections import Counter

        cnt = Counter(
            hashlib.md5(str(i).encode()).hexdigest()[pos - 1]
            for i in range(n_docs)
        )
        t = float(n_docs)
        x2 = sum(
            (float(o) - t / 16) * (float(o) - t / 16) / (t / 16)
            for o in cnt.values()
        )
        model[name] = (n_docs, max(cnt.values()), _round_away(1000000 * x2))
    assert got == model
