"""Property-based semantics checks for the session-227 operators
(top_ngram_share_census, prefix_cache_hit_estimate,
speculative_bigram_acceptance, hnsw_level_plan).

DuckDB-only — each oracle runs over hypothesis-generated corpora against
an exact Python model (integer arithmetic mirrored), plus structural
invariants (Gopher cuts bound by n_docs, prefix savings identity,
acceptance ceiling, geometric-level mass conservation)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _HNSW_MAX_LEVEL,
    _PREFIX_KS,
    _TOPGRAM_CUTS,
)
from docix_spark.analysis.tokenizer import tokenize

_WORDS = ["alpha", "beta", "gamma", "delta", "loop", "spam", "x"]

_corpus = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1"]),
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=14),
    ),
    min_size=1,
    max_size=18,
)


def _docs_df(docs):
    return pd.DataFrame(
        {
            "doc_id": range(1, len(docs) + 1),
            "source": [s for s, _ in docs],
            "text": [" ".join(ws) for _, ws in docs],
        }
    )


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_top_ngram_share_census_matches_model(docs):
    con = duckdb.connect()
    con.register("documents", _docs_df(docs))
    got = con.execute(REGISTRY["top_ngram_share_census"].sql).fetchall()

    model = []
    per = {}
    for src, ws in docs:
        toks = tokenize(" ".join(ws))
        for n in (2, 3, 4):
            if len(toks) < n:
                continue
            grams = Counter(
                tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            total = sum(grams.values())
            top_q6 = (1_000_000 * max(grams.values())) // total
            per.setdefault((src, n), []).append(top_q6)
    for (src, n), tops in sorted(per.items()):
        mean = sum(tops) // len(tops)
        n_fail = sum(1 for t in tops if t > _TOPGRAM_CUTS[n])
        model.append((src, n, len(tops), mean, n_fail))
    assert got == model
    for _, _, n_docs, mean, n_fail in got:
        assert 0 <= n_fail <= n_docs and 0 < mean <= 1_000_000


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_prefix_cache_hit_estimate_matches_model(docs):
    con = duckdb.connect()
    con.register("documents", _docs_df(docs))
    got = con.execute(REGISTRY["prefix_cache_hit_estimate"].sql).fetchall()

    model = []
    for k in _PREFIX_KS:
        elig = [tokenize(" ".join(ws)) for _, ws in docs if len(ws) >= k]
        if not elig:
            continue
        groups = {tuple(t[:k]) for t in elig}
        saved = k * (len(elig) - len(groups))
        snt = sum(len(t) for t in elig)
        model.append((k, len(elig), len(groups), saved, (1_000_000 * saved) // snt))
    assert got == model
    for k, n_docs, n_groups, saved, share in got:
        assert saved == k * (n_docs - n_groups)  # savings identity
        assert 0 <= share < 1_000_000


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_speculative_bigram_acceptance_matches_model(docs):
    con = duckdb.connect()
    con.register("documents", _docs_df(docs))
    got = con.execute(REGISTRY["speculative_bigram_acceptance"].sql).fetchall()

    pairs = []
    for src, ws in docs:
        toks = tokenize(" ".join(ws))
        pairs += [(src, toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
    bc = Counter((w1, w2) for _, w1, w2 in pairs)
    best = {}
    for (w1, w2), c in bc.items():
        cur = best.get(w1)
        # max count, lexicographic-min w2 tiebreak
        if cur is None or (c, [-ord(ch) for ch in w2]) > (cur[0], [-ord(ch) for ch in cur[1]]):
            best[w1] = (c, w2)
    model = []
    for src in sorted({s for s, _, _ in pairs}):
        sp = [(w1, w2) for s, w1, w2 in pairs if s == src]
        acc = sum(1 for w1, w2 in sp if best[w1][1] == w2)
        model.append((src, len(sp), acc, (1_000_000 * acc) // len(sp)))
    assert got == model
    for _, n_pairs, n_accept, q6 in got:
        # a source CAN score 0 accepts (its pairs' argmaxes may live in
        # the other source) — only the range is invariant per source
        assert 0 <= n_accept <= n_pairs
    # globally every w1's best pair occurs somewhere and is accepted
    if got:
        assert sum(r[2] for r in got) >= len(best)


@settings(max_examples=40, deadline=None)
@given(ids=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1,
                    max_size=60, unique=True))
def test_hnsw_level_plan_matches_model(ids):
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame({"vec_id": ids}))
    got = con.execute(REGISTRY["hnsw_level_plan"].sql).fetchall()

    def level(vid):
        k52 = int(hashlib.md5(f"hnsw:{vid}".encode()).hexdigest()[:13], 16)
        lvl = 0
        for l in range(_HNSW_MAX_LEVEL, 0, -1):
            if k52 + 1 <= 1 << (52 - 2 * l):
                return l
        return lvl

    counts = Counter(level(v) for v in ids)
    total = len(ids)
    model = [
        (
            l,
            counts.get(l, 0),
            (1_000_000 * total * 3) // 4 ** (l + 1),
        )
        for l in range(0, _HNSW_MAX_LEVEL + 1)
    ]
    assert got == model
    assert sum(r[1] for r in got) == total  # every node has exactly one level
