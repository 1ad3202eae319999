"""Property-based semantics checks for the session-184 operators."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1995, 6, 1)
_prio = st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"])


@settings(max_examples=30, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=1200), _prio),
        min_size=1,
        max_size=30,
    )
)
def test_priority_mix_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderdate": [
                    _D0 + datetime.timedelta(days=d) for d, _ in orders
                ],
                "o_orderpriority": [p for _, p in orders],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["priority_mix_by_year"].sql).fetchall()
    }

    from collections import Counter

    cnt = Counter(
        ((_D0 + datetime.timedelta(days=d)).year, p) for d, p in orders
    )
    yr_tot = Counter()
    for (yr, _), n in cnt.items():
        yr_tot[yr] += n
    model = {
        k: (n, (1000000 * n) // yr_tot[k[0]]) for k, n in cnt.items()
    }
    assert got == model


_word = st.sampled_from(["a", "b", "c"])


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(_word, min_size=0, max_size=20),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_lang_share_by_len_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [l for l, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(
            REGISTRY["lang_share_by_len_band"].sql
        ).fetchall()
    }

    from collections import Counter

    cells = Counter()
    for l, ws in docs:
        n = len(ws)
        band = -1 if n == 0 else n.bit_length() - 1
        cells[(band, l)] += 1
    band_tot = Counter()
    for (b, _), n in cells.items():
        band_tot[b] += n
    model = {
        k: (n, (1000000 * n) // band_tot[k[0]]) for k, n in cells.items()
    }
    assert got == model
