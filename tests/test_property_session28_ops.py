"""Property-based semantics checks for the session-28 operators.

Models: a pure-Python type-7 median/MAD chain over per-source lengths,
the md5 Poisson bootstrap with math.exp-folded thresholds, and
invariant checks on the PRF expansion (whose full model is BM25 — the
driver-contract replica covers value parity). DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _BOOT_B, _TOPK_TERMS, REGISTRY

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=120)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


def _type7(vals: list[int]) -> float:
    """Type-7 interpolated median over exact-integer values, replicating
    the histogram probe: r = 0.5*(n-1), v_lo at floor(r), v_hi at
    floor(r)+1 — identical double arithmetic to both engines."""
    s = sorted(vals)
    n = len(s)
    r = (500000 / 1000000.0) * (n - 1)
    lo = int(math.floor(r))
    hi = min(lo + 1, n - 1)
    return s[lo] + (r - math.floor(r)) * (s[hi] - s[lo])


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_mad_doclen_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["mad_doclen"].sql).fetchall()
    by_src: dict[str, list[int]] = {}
    for i, d in enumerate(docs):
        by_src.setdefault(f"src{i % 3}", []).append(len(d))
    model = []
    for src in sorted(by_src):
        med_q6 = _round_away(1_000_000.0 * _type7(by_src[src]))
        devs = [abs(n * 1_000_000 - med_q6) for n in by_src[src]]
        mad_q6 = _round_away(_type7(devs))
        model.append((src, med_q6, mad_q6))
    assert got == model
    # MAD is nonnegative and zero for single-doc sources
    for (src, m, mad), vals in zip(model, (by_src[s] for s in sorted(by_src))):
        assert mad >= 0
        if len(vals) == 1:
            assert mad == 0 and m == vals[0] * 1_000_000


_BOOT_THRESH = [math.exp(-1.0) * c for c in (1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0)]


def _poisson_w(r: int, doc_id: int) -> int:
    k = int(hashlib.md5(f"b{r}:{doc_id}".encode()).hexdigest()[:13], 16)
    u = k / 4503599627370496.0
    for w, t in enumerate(_BOOT_THRESH):
        if u < t:
            return w
    return 5


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_bootstrap_mean_doclen_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["bootstrap_mean_doclen"].sql).fetchall()
    model = []
    for r in range(_BOOT_B):
        ws = [(_poisson_w(r, i), len(d)) for i, d in enumerate(docs)]
        sum_w = sum(w for w, _ in ws)
        sum_wn = sum(w * n for w, n in ws)
        mean_q6 = (
            0 if sum_w == 0 else _round_away(1_000_000 * (sum_wn / float(sum_w)))
        )
        model.append((r, sum_w, sum_wn, mean_q6))
    assert got == model
    # weights average ~1: total resampled mass is within 4 sigma of B*n
    n = len(docs)
    tot = sum(r[1] for r in got)
    assert abs(tot - _BOOT_B * n) <= 4 * math.sqrt(_BOOT_B * n) + 8


@settings(max_examples=25, deadline=None)
@given(docs=_corpus)
def test_prf_expansion_invariants(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["prf_rocchio_expand"].sql).fetchall()
    # ranks are 1..k contiguous, query terms never expand, weights sorted
    assert [r[2] for r in got] == list(range(1, len(got) + 1))
    assert all(r[0] not in _TOPK_TERMS for r in got)
    ws = [r[1] for r in got]
    assert ws == sorted(ws, reverse=True)
    assert len(got) <= 8
    # any term appearing in a top-10 doc with positive idf must be
    # expandable: if no doc matches the query, the expansion is empty
    vocab = {t for d in docs for t in d}
    if not vocab & set(_TOPK_TERMS):
        assert got == []


def test_registry_names_bound():
    for name in ["mad_doclen", "bootstrap_mean_doclen", "prf_rocchio_expand"]:
        assert REGISTRY[name].fn.__name__ == name
