"""Property-based semantics checks for the round-4 pipeline operators.

The driver-contract replica proves Spark == DuckDB on the fixed corpus;
these drive the registered DuckDB oracle SQL over hypothesis-generated
corpora and compare against an independent Python/numpy model — so a bug
shared by the Spark and SQL twins (they were written together) cannot
hide behind the fixed test data. DuckDB-only keeps each example at ms
cost, letting hypothesis explore aggressively; the Spark twin is pinned
to the same SQL by the hash-equality tests in test_driver_contract.
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_WORDS = ["alpha", "beta", "gamma", "delta", "spark", "join", "hash", "x9", "scan"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_doclen_quantiles_oracle_matches_numpy(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["doclen_quantiles"].sql).fetch_df()
    lens: dict[str, list[int]] = {}
    for i, d in enumerate(docs):
        lens.setdefault(f"src{i % 3}", []).append(len(d))
    assert len(got) == 3 * len(lens)
    for r in got.itertuples():
        p = r.p_q6 / 1_000_000.0
        expect = round(1_000_000.0 * float(np.quantile(np.array(lens[r.source]), p, method="linear")))
        assert r.q_q6 == expect, (r.source, r.p_q6, r.q_q6, expect)


@settings(max_examples=40, deadline=None)
@given(docs=_corpus, run=st.lists(st.sampled_from(_WORDS), min_size=8, max_size=10))
def test_winnow_oracle_selection_and_recall(docs, run):
    """Plant the same >=8-token run into two docs: winnowing MUST give
    them a shared fingerprint (the w+k-1 guarantee), and the whole
    selection must equal the Python model."""
    k, w = 4, 5
    docs = list(docs) + [run, list(reversed(docs[0])) + run if docs else run]
    con = _con(docs)
    got: dict[int, set] = {}
    for r in con.execute(REGISTRY["winnow_fingerprints"].sql).fetch_df().itertuples():
        got.setdefault(r.doc_id, set()).add(r.fp)
    expect: dict[int, set] = {}
    for i, toks in enumerate(docs):
        if len(toks) < w + k - 1:
            continue
        hs = [
            hashlib.md5(" ".join(toks[j : j + k]).encode()).hexdigest()
            for j in range(len(toks) - k + 1)
        ]
        expect[i] = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
    assert got == expect
    a, b = len(docs) - 2, len(docs) - 1
    assert got[a] & got[b], "planted shared 8-token run produced no shared fingerprint"


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_unigram_logprob_oracle_matches_python(docs):
    from collections import Counter

    con = _con(docs)
    got = {r.doc_id: r for r in con.execute(REGISTRY["unigram_logprob"].sql).fetch_df().itertuples()}
    tf: dict[int, Counter] = {}
    total: Counter = Counter()
    for i, toks in enumerate(docs):
        if toks:
            tf[i] = Counter(toks)
            total.update(toks)
    big_t = float(sum(total.values()))
    import math

    nlp = {t: round(-math.log(c / big_t) * 1_000_000) for t, c in total.items()}
    assert set(got) == set(tf)
    for i, c in tf.items():
        r = got[i]
        assert r.doc_len == sum(c.values())
        expect = sum(n * nlp[t] for t, n in c.items())
        # libm vs DuckDB ln may differ in the last ulp per dictionary term
        assert abs(r.surprisal_q6 - expect) <= r.doc_len
        assert r.mean_nlp_q6 == r.surprisal_q6 // r.doc_len


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_temperature_mix_oracle_matches_python(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["temperature_mix_weights"].sql).fetch_df()
    tokens: dict[str, int] = {}
    for i, d in enumerate(docs):
        tokens[f"src{i % 3}"] = tokens.get(f"src{i % 3}", 0) + len(d)
    w_q6 = {s: round(1_000_000 * n**0.7) for s, n in tokens.items()}
    total = float(sum(w_q6.values()))
    for r in got.itertuples():
        assert r.n_tokens == tokens[r.source]
        assert r.weight_q6 == w_q6[r.source]
        expect_share = 0 if total == 0 else round(1_000_000 * w_q6[r.source] / total)
        assert r.share_q6 == expect_share
    # tau < 1 up-weights small sources: share/token-share ratio decreases
    # with token mass (checked on sources with nonzero tokens)
    tot_tok = sum(tokens.values())
    if tot_tok:
        rows = [r for r in got.itertuples() if r.n_tokens > 0]
        rows.sort(key=lambda r: r.n_tokens)
        ratios = [r.share_q6 * tot_tok / (r.n_tokens * 1_000_000) for r in rows]
        for a, b in zip(ratios, ratios[1:]):
            assert a >= b - 1e-9


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_domain_cap_oracle_matches_python(docs):
    """domain_cap: first-3-per-source in md5(doc_id) order — the oracle's
    naive window vs a plain-Python sort (the Spark twin's sub-sharded
    two-pass rank is pinned to the same SQL by the contract test)."""
    con = _con(docs)
    got = [
        (r.doc_id, r.source, r.rnk)
        for r in con.execute(REGISTRY["domain_cap"].sql).fetch_df().itertuples()
    ]
    by_src: dict[str, list[int]] = {}
    for i in range(len(docs)):
        by_src.setdefault(f"src{i % 3}", []).append(i)
    expect = []
    for src in sorted(by_src):
        order = sorted(by_src[src], key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        expect.extend((d, src, k + 1) for k, d in enumerate(order[:3]))
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_tfidf_top_terms_oracle_matches_python(docs):
    """tfidf_top_terms: per-doc top-3 by q6-rounded tf·ln(N/df), term-asc
    tiebreak — oracle vs an independent Python model."""
    import math

    con = _con(docs)
    got: dict[int, list] = {}
    for r in con.execute(REGISTRY["tfidf_top_terms"].sql).fetch_df().itertuples():
        got.setdefault(r.doc_id, []).append((r.term, r.tfidf_q6, r.rnk))
    tf: dict[int, dict[str, int]] = {}
    for i, d in enumerate(docs):
        if d:
            m: dict[str, int] = {}
            for t in d:
                m[t] = m.get(t, 0) + 1
            tf[i] = m
    n_docs = float(len(tf))
    df: dict[str, int] = {}
    for m in tf.values():
        for t in m:
            df[t] = df.get(t, 0) + 1
    expect: dict[int, list] = {}
    for i, m in tf.items():
        scored = sorted(
            ((t, round(1_000_000.0 * c * math.log(n_docs / df[t]))) for t, c in m.items()),
            key=lambda x: (-x[1], x[0]),
        )
        expect[i] = [(t, s, k + 1) for k, (t, s) in enumerate(scored[:3])]
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_collocations_pmi_oracle_matches_python(docs):
    """collocations_pmi: top-20 adjacent bigrams by q6-rounded PMI
    (min count 3), oracle vs an independent Python model."""
    import math

    con = _con(docs)
    got = [
        (r.w1, r.w2, r.c_xy, r.pmi_q6)
        for r in con.execute(REGISTRY["collocations_pmi"].sql).fetch_df().itertuples()
    ]
    uni: dict[str, int] = {}
    bg: dict[tuple, int] = {}
    n_tok = n_bg = 0
    for d in docs:
        for t in d:
            uni[t] = uni.get(t, 0) + 1
            n_tok += 1
        for a, b in zip(d, d[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
            n_bg += 1
    rows = []
    for (a, b), c in bg.items():
        if c >= 3:
            pmi = round(1_000_000.0 * math.log((c * n_tok * n_tok) / (n_bg * uni[a] * uni[b])))
            rows.append((a, b, c, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == rows[:20]
