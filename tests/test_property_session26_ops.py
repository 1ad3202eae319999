"""Property-based semantics checks for the session-26 operators.

Models: integer bucket/padding math, a Counter-based coverage curve,
and a pure-Python multinomial naive Bayes with the same q6-per-term
quantization as both engines. DuckDB-only (ms per example).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _VOCAB_KS

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_LANGS = ["de", "en", "es"]
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
            "lang": [_LANGS[i % len(_LANGS)] for i in range(len(docs))],
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_pad_efficiency_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["pad_efficiency_buckets"].sql).fetchall()
    buckets: dict[int, list[int]] = {}
    for d in docs:
        n = len(d)
        if n >= 1:
            buckets.setdefault(((n + 63) // 64) * 64, []).append(n)
    model = []
    for cap in sorted(buckets):
        ns = buckets[cap]
        padded = cap * len(ns)
        model.append(
            (
                cap,
                len(ns),
                sum(ns),
                _round_away(1_000_000 * ((padded - sum(ns)) / float(padded))),
            )
        )
    assert got == model
    # overhead is a proper fraction and buckets hold their docs
    for cap, nd, s, oq6 in got:
        assert 0 <= oq6 < 1_000_000
        assert s <= cap * nd


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_vocab_coverage_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["vocab_coverage_curve"].sql).fetchall()
    tf = Counter(t for d in docs for t in d)
    total = sum(tf.values())
    if total == 0:
        assert got == []
        return
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    model = []
    for k in _VOCAB_KS:
        top = ranked[:k]
        cov = sum(c for _, c in top)
        model.append(
            (
                k,
                len(top),
                cov,
                total,
                _round_away(1_000_000 * (cov / float(total))),
            )
        )
    assert got == model
    # coverage is monotone nondecreasing in k and ends at 1.0 when k >= |V|
    qs = [r[4] for r in got]
    assert qs == sorted(qs)
    if len(tf) <= _VOCAB_KS[-1]:
        assert got[-1][4] == 1_000_000


def _nb_model(docs):
    langs = [_LANGS[i % len(_LANGS)] for i in range(len(docs))]
    ct: Counter = Counter()
    tl: Counter = Counter()
    for lang, d in zip(langs, docs):
        for t in d:
            ct[(lang, t)] += 1
            tl[lang] += 1
    vocab = {t for d in docs for t in d}
    vs = len(vocab)
    nd = Counter(langs)
    n = len(docs)
    present = sorted(set(langs))
    lam = {
        (lang, t): _round_away(1_000_000 * math.log((c + 1) / float(tl[lang] + vs)))
        for (lang, t), c in ct.items()
    }
    lam0 = {
        lang: _round_away(1_000_000 * math.log(1 / float(tl[lang] + vs)))
        for lang in tl
    }
    pri = {
        lang: _round_away(1_000_000 * math.log(nd[lang] / float(n))) for lang in nd
    }
    conf: Counter = Counter()
    for i, d in enumerate(docs):
        if not d:
            continue  # no tf rows -> dropped on both sides
        tf = Counter(d)
        best = None
        # score only langs that have tokens (tl) — matches the tl-driven
        # l0 table in the SQL
        for lang in sorted(tl):
            score = pri[lang] + sum(
                c * lam.get((lang, t), lam0[lang]) for t, c in tf.items()
            )
            key = (-score, lang)
            if best is None or key < best[0]:
                best = (key, lang)
        conf[(langs[i], best[1])] += 1
    return sorted((l, p, c) for (l, p), c in conf.items()), present


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_naive_bayes_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["naive_bayes_langid"].sql).fetchall()
    model, _ = _nb_model(docs)
    assert got == model
    # the matrix accounts for exactly the non-empty docs
    assert sum(c for _, _, c in got) == sum(1 for d in docs if d)


def test_registry_names_bound():
    for name in [
        "pad_efficiency_buckets",
        "vocab_coverage_curve",
        "naive_bayes_langid",
    ]:
        assert REGISTRY[name].fn.__name__ == name
