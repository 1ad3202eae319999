"""Property-based semantics checks for the session-164 operators.

Models: the salting load curve with an INJECTED celebrity key (uniform
TPC-H keys barely move — the honest null), score-band calibration on an
injected label table, and the approximate-FD census. DuckDB-only.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _h52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


@settings(max_examples=20, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=1, max_value=7),
        ),
        min_size=1,
        max_size=25,
    ),
    hot=st.integers(min_value=0, max_value=20),
)
def test_salting_effect_matches_model(li, hot):
    rows = list(li) + [(999, i + 1) for i in range(hot)]  # celebrity key
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in rows],
                "l_linenumber": [l for _, l in rows],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["salting_effect_curve"].sql).fetchall()
    }

    model = {}
    for factor in (1, 2, 4, 8):
        buckets: dict[int, int] = {}
        for o, l in rows:
            salt = _h52(f"salt:{l}:{o}") % factor
            b = _h52(f"{o}:{salt}") % 32
            buckets[b] = buckets.get(b, 0) + 1
        mx = max(buckets.values())
        model[factor] = (
            len(buckets),
            mx,
            (1000000 * mx) // len(rows),
        )
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    lab=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # score cell
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_score_band_calibration_semantics(lab):
    # standalone check of the quintile-band tail on an injected match set
    con = duckdb.connect()
    con.register(
        "lab",
        pd.DataFrame(
            {
                "doc_id": range(len(lab)),
                "score_q6": [s for s, _ in lab],
                "is_rel": [1 if r else 0 for _, r in lab],
            }
        ),
    )
    got = con.execute(
        """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_match FROM lab),
rk AS (SELECT score_q6, is_rel,
              row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rn
       FROM lab),
dec AS (SELECT CAST(((rn - 1) * 5) // n.n_match AS BIGINT) AS band, is_rel
        FROM rk, n)
SELECT band, CAST(count(*) AS BIGINT), CAST(sum(is_rel) AS BIGINT),
       CAST((1000000 * sum(is_rel)) // count(*) AS BIGINT)
FROM dec GROUP BY band ORDER BY band"""
    ).fetchall()

    order = sorted(
        range(len(lab)), key=lambda i: (-lab[i][0], i)
    )
    n = len(lab)
    bands: dict[int, list[int]] = {}
    for pos, i in enumerate(order):
        b = (pos * 5) // n
        cell = bands.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += 1 if lab[i][1] else 0
    model = [
        (b, c[0], c[1], (1000000 * c[1]) // c[0])
        for b, c in sorted(bands.items())
    ]
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "code", "news"]),
            st.sampled_from(["en", "de"]),
        ),
        min_size=1,
        max_size=25,
    ),
    parts=st.lists(
        st.tuples(
            st.sampled_from(["B#1", "B#2"]),
            st.sampled_from(["small", "large", "steel"]),
        ),
        min_size=1,
        max_size=15,
    ),
)
def test_fd_census_matches_model(docs, parts):
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
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(len(parts)),
                "p_brand": [b for b, _ in parts],
                "p_type": [t for _, t in parts],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["functional_dependency_census"].sql
        ).fetchall()
    }

    def fd(pairs):
        xs = {x for x, _ in pairs}
        ys = {y for _, y in pairs}
        xy = set(pairs)
        return (
            len(xs),
            len(ys),
            len(xy),
            (1000000 * len(xs)) // len(xy),
        )

    model = {
        "source_to_lang": fd(docs),
        "lang_to_source": fd([(l, s) for s, l in docs]),
        "brand_to_type": fd(parts),
    }
    assert got == model
