"""Property-based semantics checks for the session-177 operators.

Models: 4-significant-bit length quantization, top-64 typicality
deciles, and the shortest half-mass window against a brute-force
two-pointer model. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_word = st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "rare"])


@settings(max_examples=30, deadline=None)
@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=5000), min_size=1, max_size=20
    )
)
def test_doclen_quantization_matches_model(lens):
    texts = [" ".join("w" for _ in range(n)) for n in lens]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["doclen_quantization_error"].sql
        ).fetchall()
    }

    model: dict[int, list[int]] = {}
    for dl in lens:
        if dl < 16:
            q = dl
        else:
            s = dl.bit_length() - 4
            q = (dl >> s) << s
        band = dl.bit_length() - 1
        cell = model.setdefault(band, [0, 0, 0])
        cell[0] += 1
        cell[1] += dl - q
        cell[2] += dl
    assert got == {
        b: (c[0], c[1], (1000000 * c[1]) // c[2]) for b, c in model.items()
    }


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=10), min_size=1, max_size=12
    )
)
def test_typicality_matches_model(docs):
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
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["doc_typicality_histogram"].sql
        ).fetchall()
    }

    from collections import Counter

    cf = Counter(w for ws in docs for w in ws)
    top = {
        t
        for t, _ in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
    }
    model: dict[int, int] = {}
    for ws in docs:
        n_top = sum(1 for w in ws if w in top)
        dec = min((10 * n_top) // len(ws), 9)
        model[dec] = model.get(dec, 0) + 1
    assert got == model


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_half_mass_window_matches_model(days):
    rows = []
    eid = 0
    for d, k in days:
        for _ in range(k):
            rows.append((eid, _D0 + datetime.timedelta(days=d, hours=eid % 20)))
            eid += 1
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": [r[0] for r in rows], "ts": [r[1] for r in rows]}),
    )
    got = con.execute(REGISTRY["half_mass_window"].sql).fetchall()[0]

    per: dict[int, int] = {}
    for d, k in days:
        per[d] = per.get(d, 0) + k
    lo, hi = min(per), max(per)
    series = [per.get(d, 0) for d in range(lo, hi + 1)]
    tot = sum(series)
    best = None  # (win_len, -mass)
    for i in range(len(series)):
        for j in range(i, len(series)):
            mass = sum(series[i : j + 1])
            if 2 * mass >= tot:
                cand = (j - i + 1, -mass)
                if best is None or cand < best:
                    best = cand
    win_len, mass = best[0], -best[1]
    span = hi - lo + 1
    assert got == (span, tot, win_len, mass, (1000000 * win_len) // span)
