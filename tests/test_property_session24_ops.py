"""Property-based semantics checks for the session-24 operators.

Models: a full pure-Python Cavnar-Trenkle reimplementation (gram
generation, profile ranking, out-of-place distance, argmin, confusion
rollup) and an md5-sort priority-sample model. DuckDB-only.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _CT_K

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=20)
_corpus = st.lists(_doc, min_size=2, max_size=14)
_LANGS = ["en", "zh", "de"]


def _con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": [_LANGS[i % 3] for i in range(len(docs))],
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


def _grams(tok: str) -> list[str]:
    out = list(tok)
    out += [tok[i : i + 2] for i in range(len(tok) - 1)]
    out += [tok[i : i + 3] for i in range(len(tok) - 2)]
    return out


def _top_k(counts: Counter, k: int) -> dict[str, int]:
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {g: r for r, (g, _) in enumerate(ranked, start=1)}


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_cavnar_trenkle_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["cavnar_trenkle_langid"].sql).fetchall()
    lang_counts: dict[str, Counter] = {}
    doc_counts: dict[int, Counter] = {}
    langs_present = sorted({_LANGS[i % 3] for i in range(len(docs))})
    for i, d in enumerate(docs):
        lang = _LANGS[i % 3]
        c = Counter(g for t in d for g in _grams(t))
        doc_counts[i] = c
        lang_counts.setdefault(lang, Counter()).update(c)
    profiles = {lang: _top_k(c, _CT_K) for lang, c in lang_counts.items()}
    conf: Counter = Counter()
    for i, d in enumerate(docs):
        dr = _top_k(doc_counts[i], _CT_K)
        if not dr:
            continue
        best = min(
            (
                (
                    sum(
                        abs(rd - profiles[lang][g]) if g in profiles[lang] else _CT_K
                        for g, rd in dr.items()
                    ),
                    lang,
                )
                for lang in langs_present
            ),
        )
        conf[(_LANGS[i % 3], best[1])] += 1
    model = sorted((a, b, n) for (a, b), n in conf.items())
    assert got == model


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_priority_sample_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["priority_sample_docs"].sql).fetchall()
    rows = [
        (i, f"src{i % 3}", hashlib.md5(str(i).encode()).hexdigest()[8:12])
        for i in range(len(docs))
    ]
    rows.sort(key=lambda r: (r[2], r[0]))
    assert got == rows[:100]


def test_registry_names_bound():
    for name in ["cavnar_trenkle_langid", "priority_sample_docs"]:
        assert REGISTRY[name].fn.__name__ == name
