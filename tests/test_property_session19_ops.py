"""Property-based semantics checks for the session-19 operators.

Models: Welch t^2 and matrix-stats covariance/correlation recomputed in
pure Python doubles over the same integer sufficient statistics (same
expression shape, half-away-from-zero rounding — both engines' round());
a Counter model for BPE pair counts; the diversified-sampler cap applied
in Python to the oracle's OWN match-set CTE (the BM25 chain itself is
pinned by the rank-identity suites). DuckDB-only — ms per example.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _TOPK_TERMS,
    _bm25_agg_ctes,
)

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en" if i % 2 else "zh" for i in range(len(docs))],
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_ttest_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["ttest_lang_doclen"].sql).fetchall()
    ga = [len(d) for i, d in enumerate(docs) if i % 2]       # en
    gb = [len(d) for i, d in enumerate(docs) if not i % 2]   # zh
    na, nb = len(ga), len(gb)
    sa, sb = sum(ga), sum(gb)
    ssa, ssb = sum(x * x for x in ga), sum(x * x for x in gb)
    if na < 2 or nb < 2 or (na * ssa == sa * sa and nb * ssb == sb * sb):
        t2 = 0
    else:
        num = (sa / na - sb / nb) ** 2
        den = (na * ssa - sa * sa) / (na * na * (na - 1)) + (nb * ssb - sb * sb) / (
            nb * nb * (nb - 1)
        )
        t2 = _round_away(1_000_000 * num / den)
    assert got == [(na, nb, sa, sb, t2)]


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_matrix_stats_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["matrix_stats_docs"].sql).fetchall()
    groups: dict[str, list[tuple[int, int]]] = {}
    for i, d in enumerate(docs):
        groups.setdefault(f"src{i % 3}", []).append((len(d), len(" ".join(d))))
    model = []
    for src in sorted(groups):
        pts = groups[src]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        cov = _round_away(1_000_000 * ((n * sxy - sx * sy) / (n * n)))
        if n * sxx == sx * sx or n * syy == sy * sy:
            corr = 0
        else:
            corr = _round_away(
                1_000_000
                * (n * sxy - sx * sy)
                / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
            )
        model.append((src, n, sx, sy, cov, corr))
    assert got == model
    # Cauchy-Schwarz: |corr| <= 1 (+1 micro-unit of rounding)
    for *_, corr in got:
        assert abs(corr) <= 1_000_001


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_bpe_merge_candidates_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["bpe_merge_candidates"].sql).fetchall()
    pairs: Counter = Counter()
    for d in docs:
        for w in d:
            for i in range(len(w) - 1):
                pairs[w[i : i + 2]] += 1
    model = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == model


@settings(max_examples=25, deadline=None)
@given(docs=_corpus)
def test_diversified_sampler_cap_matches_oracle(docs):
    """Apply the per-source cap + top-100 + lang facet in Python to the
    oracle's own match-set CTE and compare rollups."""
    con = _con(docs)
    got = con.execute(REGISTRY["diversified_sampler"].sql).fetchall()
    agg = con.execute(
        _bm25_agg_ctes(_TOPK_TERMS) + " SELECT doc_id, score_q6 FROM agg"
    ).fetchall()
    rows = []
    for doc_id, score in agg:
        rows.append((f"src{doc_id % 3}", "en" if doc_id % 2 else "zh", doc_id, score))
    rows.sort(key=lambda r: (-r[3], r[2]))
    seen: Counter = Counter()
    top = []
    for src, lang, doc_id, score in rows:
        seen[src] += 1
        if seen[src] <= 2:
            top.append(lang)
    facets: Counter = Counter(top[:100])
    assert got == sorted(facets.items())


def test_registry_names_bound():
    for name in [
        "ttest_lang_doclen",
        "matrix_stats_docs",
        "bpe_merge_candidates",
        "diversified_sampler",
    ]:
        assert REGISTRY[name].fn.__name__ == name
