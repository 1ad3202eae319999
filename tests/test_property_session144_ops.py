"""Property-based semantics checks for the session-144 operators.

Models: per-source char-bigram entropy (q6-per-cell model) and the
size-price rollup. DuckDB-only (ms per example).
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


_word = st.sampled_from(["spark", "héllo", "ab", "zq", "データ", "x"])


@settings(max_examples=35, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "code"]),
            st.lists(_word, min_size=0, max_size=5),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_char_bigram_entropy_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [" ".join(ws).upper() for _, ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["char_bigram_entropy_source"].sql
        ).fetchall()
    }

    cnt: dict[str, dict[str, int]] = {}
    for s, ws in docs:
        t = " ".join(ws).upper().lower()
        if len(t) < 2:
            continue
        for i in range(len(t) - 1):
            g = t[i : i + 2]
            cnt.setdefault(s, {})[g] = cnt.get(s, {}).get(g, 0) + 1
    model = {}
    for s, grams in cnt.items():
        tot = sum(grams.values())
        hq6 = sum(
            _round_away(1000000 * (c / tot) * math.log(tot / c))
            for c in grams.values()
        )
        model[s] = (len(grams), tot, hq6)
    assert got == model


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    parts=st.lists(
        st.tuples(st.integers(min_value=1, max_value=6), _price),
        min_size=1,
        max_size=25,
    )
)
def test_size_price_profile_matches_model(parts):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(len(parts)),
                "p_size": [s for s, _ in parts],
                "p_retailprice": [p for _, p in parts],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["size_price_profile"].sql).fetchall()
    }
    model: dict[int, list[int]] = {}
    for s, p in parts:
        c = _round_away(p * 100)
        cell = model.setdefault(s, [0, 0, None, None])
        cell[0] += 1
        cell[1] += c
        cell[2] = c if cell[2] is None else min(cell[2], c)
        cell[3] = c if cell[3] is None else max(cell[3], c)
    assert got == {s: tuple(v) for s, v in model.items()}
