"""Property-based semantics checks for the session-56 operators.

Models: an exact Hare largest-remainder apportionment model (and the
invariant that slots sum to EXACTLY the table size — the property the
float-cumulative fill lacks), a per-type conditional-entropy model, and
a tf-band model. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _NEG_SLOTS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_V = ["aa", "bb", "cc", "dd", "ee"]
_text = st.lists(st.sampled_from(_V), min_size=1, max_size=10).map(" ".join)


def _docs_con(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    return con


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_negative_sampling_matches_hare_model(docs):
    con = _docs_con(docs)
    got = con.execute(REGISTRY["negative_sampling_table"].sql).fetchall()
    cf: dict[str, int] = {}
    for t in docs:
        for w in t.split():
            cf[w] = cf.get(w, 0) + 1
    wq = {w: _round_away(1_000_000 * (c**0.75)) for w, c in cf.items()}
    tw = sum(wq.values())
    base = {w: (_NEG_SLOTS * q) // tw for w, q in wq.items()}
    rem = {w: (_NEG_SLOTS * q) % tw for w, q in wq.items()}
    k = _NEG_SLOTS - sum(base.values())
    order = sorted(wq, key=lambda w: (-rem[w], w))
    slots = dict(base)
    for w in order[:k]:
        slots[w] += 1
    model = sorted(
        ((w, cf[w], wq[w], slots[w]) for w in wq), key=lambda r: (-r[3], r[0])
    )[:20]
    assert got == model
    # the defining property: total slots are EXACTLY the table size
    assert sum(slots.values()) == _NEG_SLOTS
    # bounded error: every term within 1 slot of its exact share
    for w, q in wq.items():
        exact = _NEG_SLOTS * q / tw
        assert abs(slots[w] - exact) < 1 + 1e-9


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_bigram_entropy_matches_model(docs):
    con = _docs_con(docs)
    out = con.execute(REGISTRY["bigram_entropy_rate"].sql).fetchall()
    bg: dict[tuple[str, str], int] = {}
    for t in docs:
        ws = t.split()
        for i in range(len(ws) - 1):
            bg[(ws[i], ws[i + 1])] = bg.get((ws[i], ws[i + 1]), 0) + 1
    if not bg:
        # no bigram anywhere: the contrib aggregate still emits one row
        assert out[0][1] == 0 and out[0][2] == 0
        return
    n = sum(bg.values())
    c1: dict[str, int] = {}
    for (a, _), c in bg.items():
        c1[a] = c1.get(a, 0) + c
    h = sum(
        _round_away(-1_000_000 * (c / float(n)) * math.log(c / float(c1[a])))
        for (a, _), c in bg.items()
    )
    assert out == [(n, len(bg), h)]
    assert h >= -len(bg)  # entropy non-negative up to per-type rounding


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8))
def test_tf_spectrum_matches_model(docs):
    con = _docs_con(docs)
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["tf_spectrum"].sql).fetchall()}
    tfs: dict[tuple[int, str], int] = {}
    for d, t in enumerate(docs):
        for w in t.split():
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
    bands: dict[int, list[int]] = {}
    for tf in tfs.values():
        b = tf.bit_length() - 1
        cell = bands.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += tf
    assert got == {b: tuple(c) for b, c in bands.items()}
