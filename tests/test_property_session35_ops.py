"""Property-based checks for the session-35 operators: decile KL drift
and the chi-squared cross-tab, each against a pure-Python model using
the shared divide-first float forms."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=60)
_corpus = st.lists(_doc, min_size=1, max_size=25)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _con(docs, langs=None):
    n = len(docs)
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(n)],
            "lang": langs if langs is not None else ["en"] * n,
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_term_drift_deciles_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["term_drift_deciles"].sql).fetchall()
    n = len(docs)
    dt: Counter = Counter()
    for i, d in enumerate(docs):
        dec = (i * 10) // n
        for t in d:
            dt[(dec, t)] += 1
    da: Counter = Counter()
    ct: Counter = Counter()
    for (dec, t), a in dt.items():
        da[dec] += a
        ct[t] += a
    ctot = sum(ct.values())
    agg: dict[int, list[int]] = {}
    for (dec, t), a in dt.items():
        kl = _round_away(
            1_000_000
            * ((a / float(da[dec])) * math.log((a / float(da[dec])) / (ct[t] / float(ctot))))
        )
        agg.setdefault(dec, []).append(kl)
    model = [(dec, len(v), sum(v)) for dec, v in sorted(agg.items())]
    assert got == model
    # KL against the corpus LM is nonneg up to per-term rounding slack
    for _, n_terms, kl in got:
        assert kl >= -n_terms  # each term contributes >= -0.5 q6 rounding


@settings(max_examples=40, deadline=None)
@given(
    langs=st.lists(st.sampled_from(["de", "en", "es", "zh"]), min_size=1, max_size=60)
)
def test_source_lang_chi2_matches_model(langs):
    docs = [["x"] for _ in langs]
    con = _con(docs, langs=langs)
    got = con.execute(REGISTRY["source_lang_chi2"].sql).fetchall()
    o: Counter = Counter()
    for i, l in enumerate(langs):
        o[(f"src{i % 3}", l)] += 1
    r: Counter = Counter()
    c: Counter = Counter()
    for (s, l), v in o.items():
        r[s] += v
        c[l] += v
    n = sum(o.values())
    x2 = 0
    for (s, l), obs in o.items():
        e = (r[s] * c[l]) / float(n)
        x2 += _round_away(1_000_000 * ((obs - e) * (obs - e) / e))
    assert got == [(len(r), len(c), len(o), x2)]
    # chi2 of a 1x1 table is 0 (O == E exactly)
    if len(r) == 1 and len(c) == 1:
        assert x2 == 0


def test_registry_names_bound():
    for name in ["term_drift_deciles", "source_lang_chi2"]:
        assert REGISTRY[name].fn.__name__ == name
