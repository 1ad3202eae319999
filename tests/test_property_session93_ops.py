"""Property-based semantics checks for the session-93 operators.

Models: the disorder histogram against a literal per-user running-max
model (with injected out-of-order arrivals — the sandbox stream is
in-order, so the −1 bucket alone would never prove the counters), the
positional size model against per-(doc,term) delta encoding, and the
label norm profile against numpy-free per-vector norms. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_DT0 = datetime.datetime(2024, 5, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=5000),  # seconds (arrival != time)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_disorder_histogram_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_DT0 + datetime.timedelta(seconds=s) for _, s in events],
            }
        ),
    )
    got = dict(
        con.execute(REGISTRY["event_disorder_histogram"].sql).fetchall()
    )
    seen: dict[int, int] = {}
    hist: dict[int, int] = {}
    for i, (u, s) in enumerate(events):
        t_us = s * 1_000_000
        mx = max(seen.get(u, t_us), t_us)
        late = mx - t_us
        seen[u] = mx
        if late == 0:
            b = -1
        else:
            b = ((late // 1_000_000) + 1).bit_length() - 1
        hist[b] = hist.get(b, 0) + 1
    assert got == hist


_WV = ["aa", "bb", "cc"]
_textv = st.lists(st.sampled_from(_WV), min_size=1, max_size=8).map(" ".join)


def _vbytes(x: int) -> int:
    return (x.bit_length() + 6) // 7


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textv, min_size=1, max_size=12))
def test_positions_estimate_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["s0"] * len(docs),
                "text": docs,
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["positions_varint_estimate"].sql
        ).fetchall()
    }
    per_term: dict[str, dict[int, list[int]]] = {}
    for d, t in enumerate(docs):
        for i, w in enumerate(t.split(), start=1):
            per_term.setdefault(w, {}).setdefault(d, []).append(i)
    bands: dict[int, list[int]] = {}
    for w, by_doc in per_term.items():
        df = len(by_doc)
        npos = sum(len(ps) for ps in by_doc.values())
        byt = 0
        for ps in by_doc.values():
            byt += _vbytes(ps[0]) + sum(
                _vbytes(b - a) for a, b in zip(ps, ps[1:])
            )
        band = df.bit_length() - 1
        cell = bands.setdefault(band, [0, 0, 0])
        cell[0] += 1
        cell[1] += npos
        cell[2] += byt
    model = {
        band: (nt, np_, by, (1_000_000 * by) // np_)
        for band, (nt, np_, by) in bands.items()
    }
    assert got == model


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(min_value=4, max_value=12))
def test_label_norms_match_model(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    labels = [i % 3 for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(n), "label": labels, "embedding": vecs}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["label_norm_bias"].sql).fetchall()
    }
    per: dict[int, list[int]] = {}
    for lb, v in zip(labels, vecs):
        acc = 0.0
        for x in v:  # left-to-right fold, the engines' order
            acc += x * x
        per.setdefault(lb, []).append(_round_away(1_000_000 * math.sqrt(acc)))
    model = {
        lb: (len(ns), sum(ns) // len(ns), min(ns), max(ns))
        for lb, ns in per.items()
    }
    assert got == model
