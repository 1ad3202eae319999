"""Property-based semantics checks for the session-52 operators.

Models: Python minhash-band + simhash-hamming candidate sets for the
agreement contingency, and exact integer centroid / moment models over
injected 64-dim embeddings whose components are multiples of 1/64 (exact
in float and double — the session-39 rule), so every q6 quantization and
dot product is reproducible to the bit. DuckDB-only.
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


# ---------------------------------------------------------------------------
# dedup_method_agreement
# ---------------------------------------------------------------------------


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not sh:
        return set()
    mh = [min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh) for k in range(4)]
    return {mh[0] + mh[1], mh[2] + mh[3]}


def _simhash(text: str) -> int | None:
    ws = text.lower().split()
    if not ws:
        return None
    tf: dict[str, int] = {}
    for w in ws:
        tf[w] = tf.get(w, 0) + 1
    votes = [0] * 60
    for w, c in tf.items():
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for j in range(60):
            votes[j] += c * (((h >> j) & 1) * 2 - 1)
    return sum(1 << j for j in range(60) if votes[j] > 0)


_texts = st.lists(
    st.sampled_from(["aa bb cc dd", "aa bb cc", "aa bb cc dd ee", "zz yy xx ww"]),
    min_size=1,
    max_size=3,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_texts, min_size=2, max_size=7))
def test_dedup_method_agreement_matches_models(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    got = con.execute(REGISTRY["dedup_method_agreement"].sql).fetchall()[0]
    bands = [_mh_bands(t) for t in docs]
    sims = [_simhash(t) for t in docs]
    mp, sp = set(), set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if bands[i] & bands[j]:
                mp.add((i, j))
            if sims[i] is not None and sims[j] is not None:
                if bin(sims[i] ^ sims[j]).count("1") <= 3:
                    sp.add((i, j))
    union = mp | sp
    both = mp & sp
    jac = 0 if not union else _round_away(1_000_000.0 * len(both) / len(union))
    assert got == (len(mp), len(sp), len(both), len(union), jac)


# ---------------------------------------------------------------------------
# source_centroid_matrix / embedding_dim_stats over injected embeddings
# ---------------------------------------------------------------------------

_comp = st.integers(min_value=-63, max_value=63).map(lambda k: k / 64.0)


def _emb_con(vecs: list[list[float]], sources: list[str]):
    con = duckdb.connect()
    # vec_id 0 is the conventional query vector, excluded by both ops
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs) + 1),
                "embedding": [[0.0] * 64] + vecs,
                "label": [0] * (len(vecs) + 1),
            }
        ),
    )
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(vecs) + 1),
                "text": ["t"] * (len(vecs) + 1),
                "source": ["q"] + sources,
            }
        ),
    )
    return con


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["sa", "sb", "sc"]), st.lists(_comp, min_size=64, max_size=64)),
        min_size=1,
        max_size=6,
    )
)
def test_source_centroid_matrix_matches_model(data):
    vecs = [v for _, v in data]
    sources = [s for s, _ in data]
    con = _emb_con(vecs, sources)
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["source_centroid_matrix"].sql).fetchall()
    }
    cents: dict[str, list[int]] = {}
    for s, v in data:
        c = cents.setdefault(s, [0] * 64)
        for i, x in enumerate(v):
            c[i] += _round_away(x * 1_000_000)
    model = {}
    for sa in cents:
        for sb in cents:
            if sa < sb:
                ca, cb = cents[sa], cents[sb]
                nab = sum(a * b for a, b in zip(ca, cb))
                naa = sum(a * a for a in ca)
                nbb = sum(b * b for b in cb)
                model[(sa, sb)] = (
                    0
                    if naa == 0 or nbb == 0
                    else _round_away(1_000_000 * nab / (math.sqrt(naa) * math.sqrt(nbb)))
                )
    assert got == model


@settings(max_examples=25, deadline=None)
@given(vecs=st.lists(st.lists(_comp, min_size=64, max_size=64), min_size=1, max_size=5))
def test_embedding_dim_stats_matches_model(vecs):
    con = _emb_con(vecs, ["s"] * len(vecs))
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["embedding_dim_stats"].sql).fetchall()}
    model = {}
    n = len(vecs)
    for d in range(64):
        xs = [_round_away(v[d] * 1_000_000) for v in vecs]
        s, ss = sum(xs), sum(x * x for x in xs)
        model[d] = (
            n,
            _round_away(s / float(n)),
            _round_away(ss / float(n) - (s / float(n)) * (s / float(n))),
        )
    assert got == model
    # variance is non-negative up to one rounding ulp
    assert all(v[2] >= -1 for v in got.values())
