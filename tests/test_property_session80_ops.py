"""Property-based semantics checks for the session-80 operators.

Models: the fuzzy prefix curve against a literal Levenshtein scan,
the varint estimate against a per-term delta-encoding model (exact
integer bytes), and the token-length histogram against direct
counting. DuckDB-only.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _FUZZY_TYPO, REGISTRY


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_WF = ["spark", "spakr", "spa", "spur", "park", "zz", "sparkle", "soakr"]
_textf = st.lists(st.sampled_from(_WF), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textf, min_size=1, max_size=10))
def test_fuzzy_prefix_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["fuzzy_prefix_curve"].sql).fetchall()
    df: dict[str, int] = {}
    for d, t in enumerate(docs):
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    model = []
    for p in range(3):
        cands = [
            (w, df[w], _lev(w, _FUZZY_TYPO))
            for w in df
            if _lev(w, _FUZZY_TYPO) <= 2
            and (p == 0 or w[:p] == _FUZZY_TYPO[:p])
        ]
        if not cands:
            model.append((p, 0, "", -1))
            continue
        best = min(cands, key=lambda c: (c[2], -c[1], c[0]))
        model.append((p, len(cands), best[0], best[2]))
    assert got == model
    # candidate sets shrink monotonically as the required prefix grows
    assert got[0][1] >= got[1][1] >= got[2][1]


_WV = ["aa", "bb", "cc", "dd"]
_textv = st.lists(st.sampled_from(_WV), min_size=1, max_size=6).map(" ".join)


def _vbytes(x: int) -> int:
    return (x.bit_length() + 6) // 7


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textv, min_size=1, max_size=14))
def test_varint_estimate_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["postings_varint_estimate"].sql).fetchall()
    post: dict[str, list[int]] = {}
    for d, t in enumerate(docs):
        for w in set(t.split()):
            post.setdefault(w, []).append(d)
    bands: dict[int, list[int]] = {}
    for w, ids in post.items():
        ids.sort()
        byt = _vbytes(ids[0] + 1) + sum(
            _vbytes(b - a) for a, b in zip(ids, ids[1:])
        )
        band = len(ids).bit_length() - 1
        bands.setdefault(band, [0, 0, 0])
        bands[band][0] += 1
        bands[band][1] += len(ids)
        bands[band][2] += byt
    model = [
        (band, nt, np_, by, (1_000_000 * by) // np_)
        for band, (nt, np_, by) in sorted(bands.items())
    ]
    assert got == model


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textf, min_size=1, max_size=10))
def test_token_length_histogram_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["token_length_histogram"].sql).fetchall()
    toks = [w for t in docs for w in t.split()]
    per: dict[int, list] = {}
    for w in toks:
        per.setdefault(len(w), [0, set()])
        per[len(w)][0] += 1
        per[len(w)][1].add(w)
    tot = len(toks)
    model = [
        (ln, n, len(tys), (1_000_000 * n) // tot)
        for ln, (n, tys) in sorted(per.items())
    ]
    assert got == model
