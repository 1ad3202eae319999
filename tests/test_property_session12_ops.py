"""Property-based semantics checks for the session-12 operators.

Same methodology as test_property_pipeline_ops: drive the registered
DuckDB oracle SQL over hypothesis-generated inputs and compare against an
independent Python model, so a bug shared by the Spark and SQL twins
(written together) cannot hide behind the fixed corpus. DuckDB-only keeps
each example at ms cost; the Spark twin is pinned to the same SQL by the
hash-equality tests in test_driver_contract.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _TOPK_TERMS, _bm25_agg_ctes, REGISTRY

# Includes the query terms the session-12 ops are parameterized on:
# 'fast' + several 's'-prefixed terms (match_phrase_prefix), the synonym
# group (scan, filter) + join, and the rescore terms (spark, hash, join).
_WORDS = ["fast", "scan", "sort", "spark", "slow", "join", "hash", "filter", "x9"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": [["en", "de", "fr"][i % 3] for i in range(len(docs))],
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


# ---------------------------------------------------------------------------
# match_phrase_prefix — oracle vs a positional adjacency model with the
# lexicographic 50-term expansion rule
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_match_phrase_prefix_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["match_phrase_prefix"].sql).fetchall()
    dictionary = sorted({t for d in docs for t in d})
    exp = set([t for t in dictionary if t.startswith("s")][:50])
    model = []
    for i, toks in enumerate(docs):
        hits = [
            toks[j + 1]
            for j in range(len(toks) - 1)
            if toks[j] == "fast" and toks[j + 1] in exp
        ]
        if hits:
            model.append((i, len(hits), len(set(hits))))
    assert got == model


# ---------------------------------------------------------------------------
# synonym_query_search — oracle vs a BM25 model with Lucene SynonymQuery
# blended statistics (df = max over group, tf = sum over group)
# ---------------------------------------------------------------------------

_SYN_GROUPS = {0: ["scan", "filter"], 1: ["join"]}


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_synonym_query_matches_blended_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["synonym_query_search"].sql).fetchall()
    tfs = [Counter(d) for d in docs]
    dls = {i: len(d) for i, d in enumerate(docs) if d}
    if not dls:
        assert got == []
        return
    n_docs = float(len(dls))
    avgdl = sum(dls.values()) / n_docs
    df = Counter()
    for c in tfs:
        for t in c:
            df[t] += 1
    scores: dict[int, tuple[float, int]] = {}
    for i, c in enumerate(tfs):
        s, nm = 0.0, 0
        for gid, members in _SYN_GROUPS.items():
            gdf = max((df[m] for m in members if m in df), default=0)
            gtf = float(sum(c[m] for m in members))
            if gdf == 0 or gtf == 0:
                continue
            idf = math.log(1.0 + (n_docs - gdf + 0.5) / (gdf + 0.5))
            s += idf * gtf * 2.2 / (gtf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
            nm += 1
        if nm:
            scores[i] = (s, nm)
    assert len(got) == min(10, len(scores))
    for doc_id, score_q6, nm, rank in got:
        ms, mnm = scores[doc_id]
        assert nm == mnm
        # float-sum order across atoms may differ by an ulp per atom
        assert abs(score_q6 - round(ms * 1_000_000)) <= 2
    # ranks are self-consistent: strictly ordered by (score desc, doc_id)
    keys = [(-score, doc_id) for doc_id, score, _, _ in got]
    assert keys == sorted(keys)
    assert [r[3] for r in got] == list(range(1, len(got) + 1))


# ---------------------------------------------------------------------------
# rescore_topn — exact integer model over the oracle's OWN first-pass
# scores (re-deriving BM25 in Python would be libm-ulp-sensitive and is
# covered by the synonym test above; the rescore stage itself is exact)
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_rescore_topn_matches_window_model(docs):
    con = _con(docs)
    first = con.execute(
        _bm25_agg_ctes(_TOPK_TERMS) + " SELECT doc_id, score_q6 FROM agg"
    ).fetchall()
    got = con.execute(REGISTRY["rescore_topn"].sql).fetchall()
    win = sorted(first, key=lambda r: (-r[1], r[0]))[:30]
    resc = []
    for doc_id, score_q6 in win:
        toks = docs[doc_id]
        gaps = [
            j - i
            for i, a in enumerate(toks)
            if a == "spark"
            for j in range(i + 1, min(i + 4, len(toks)))
            if toks[j] == "join"
        ]
        r = 1_000_000 // (1 + min(gaps)) if gaps else 0
        resc.append((doc_id, score_q6, r, score_q6 + 2 * r))
    resc.sort(key=lambda r: (-r[3], r[0]))
    want = [(d, s, r, c, k) for k, (d, s, r, c) in enumerate(resc[:10], start=1)]
    assert got == want


# ---------------------------------------------------------------------------
# chunk_dedup_scrub — exact first-occurrence model over 8-token chunks
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_chunk_dedup_matches_first_occurrence_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["chunk_dedup_scrub"].sql).fetchall()
    seen: set[tuple[str, ...]] = set()
    model = []
    for i, toks in enumerate(docs):
        if not toks:
            continue
        chunks = [tuple(toks[j : j + 8]) for j in range(0, len(toks), 8)]
        kept = 0
        for ch in chunks:  # (doc_id, chunk_idx) order IS first-occurrence order
            if ch not in seen:
                seen.add(ch)
                kept += 1
        n = len(chunks)
        model.append((i, n, kept, kept * 1_000_000 // n))
    assert got == model
    # scrub is conservative: at least one copy of every chunk survives
    assert sum(r[2] for r in got) == len(seen)


# ---------------------------------------------------------------------------
# shard_token_balance — exact md5-routing model + conservation
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_shard_token_balance_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["shard_token_balance"].sql).fetchall()
    shards: dict[int, list[int]] = {}
    for i, toks in enumerate(docs):
        sh = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 16
        shards.setdefault(sh, []).append(len(toks))
    total = sum(len(d) for d in docs)
    if total == 0:
        return  # share_q6 is 0/0; the fixed corpus never hits this
    want = sorted(
        (sh, len(ls), sum(ls), sum(ls) * 1_000_000 // total) for sh, ls in shards.items()
    )
    assert got == want
    # conservation: every doc and every token lands in exactly one shard
    assert sum(r[1] for r in got) == len(docs)
    assert sum(r[2] for r in got) == total


# ---------------------------------------------------------------------------
# source_unigram_entropy — per-term q6 model (±1 ulp per term) + bounds
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_source_entropy_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["source_unigram_entropy"].sql).fetchall()
    per_src: dict[str, Counter] = {}
    for i, toks in enumerate(docs):
        per_src.setdefault(f"src{i % 3}", Counter()).update(toks)
    model = {}
    for src, c in per_src.items():
        n = sum(c.values())
        if n == 0:
            continue
        h = sum(round(-(tf / n) * math.log(tf / n) * 1_000_000) for tf in c.values())
        model[src] = (n, h, len(c))
    assert [r[0] for r in got] == sorted(model)
    for src, n_tokens, entropy_q6 in got:
        n, h, vocab = model[src]
        assert n_tokens == n
        # libm vs DuckDB ln may differ in the last ulp per term
        assert abs(entropy_q6 - h) <= vocab
        # Shannon bounds: 0 <= H <= ln(vocab), with q6 rounding slack
        assert -vocab <= entropy_q6 <= round(math.log(vocab) * 1_000_000) + vocab

# ---------------------------------------------------------------------------
# cross_fields_search — oracle vs a blended-df dis-max BM25 model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_cross_fields_matches_blended_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["cross_fields_search"].sql).fetchall()
    fields = {}  # (doc_id, field) -> Counter
    for i, toks in enumerate(docs):
        if toks[:8]:
            fields[(i, "title")] = Counter(toks[:8])
        if toks[8:]:
            fields[(i, "body")] = Counter(toks[8:])
    if not fields:
        assert got == []
        return
    n_docs = float(len({d for d, _ in fields}))
    dls = {k: sum(c.values()) for k, c in fields.items()}
    avgdl = {
        f: sum(v for (d, ff), v in dls.items() if ff == f)
        / sum(1 for (_, ff) in dls if ff == f)
        for f in {ff for _, ff in fields}
    }
    df = Counter()
    for (_, f), c in fields.items():
        for t in c:
            df[(f, t)] += 1
    scores: dict[int, tuple[float, int]] = {}
    for d in {d for d, _ in fields}:
        s_doc, nm = 0.0, 0
        for t in ["spark", "hash", "join"]:
            bdf = max((df[(f, t)] for f in ("title", "body") if (f, t) in df), default=0)
            if bdf == 0:
                continue
            idf = math.log(1.0 + (n_docs - bdf + 0.5) / (bdf + 0.5))
            best = None
            for f in ("title", "body"):
                c = fields.get((d, f))
                if not c or t not in c:
                    continue
                tf = float(c[t])
                s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[(d, f)] / avgdl[f]))
                best = s if best is None else max(best, s)
            if best is not None:
                s_doc += best
                nm += 1
        if nm:
            scores[d] = (s_doc, nm)
    assert len(got) == min(10, len(scores))
    for doc_id, score_q6, nm, rank in got:
        ms, mnm = scores[doc_id]
        assert nm == mnm
        assert abs(score_q6 - round(ms * 1_000_000)) <= 3
    keys = [(-score, doc_id) for doc_id, score, _, _ in got]
    assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# composite_agg_page — exact after-key bucket model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_composite_agg_page_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["composite_agg_page"].sql).fetchall()
    buckets: dict[tuple[str, str], list[int]] = {}
    for i, d in enumerate(docs):
        src, lang = f"src{i % 3}", ["en", "de", "fr"][i % 3]
        if (src, lang) > ("src1", "en"):
            buckets.setdefault((src, lang), []).append(len(" ".join(d)))
    want = sorted((s, l, len(cs), sum(cs)) for (s, l), cs in buckets.items())[:8]
    assert got == want


# ---------------------------------------------------------------------------
# tokenizer_fertility — exact regex-count model + ratio identity
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_tokenizer_fertility_matches_model(docs):
    import re

    from docix_spark.analysis.tokenizer import TOKEN_PATTERN

    con = _con(docs)
    got = con.execute(REGISTRY["tokenizer_fertility"].sql).fetchall()
    wre = re.compile(TOKEN_PATTERN)
    bre = re.compile(r"[a-z]+|[0-9]|[^a-z0-9\s]")
    agg: dict[str, list[int]] = {}
    for i, d in enumerate(docs):
        text = " ".join(d)
        w, b = len(wre.findall(text)), len(bre.findall(text))
        acc = agg.setdefault(f"src{i % 3}", [0, 0])
        acc[0] += w
        acc[1] += b
    want = sorted(
        (src, w, b, (b * 1_000_000 // w) if w else 0) for src, (w, b) in agg.items()
    )
    assert got == want
    # fertility >= 1e6 whenever any word exists: the BPE-ish pattern never
    # emits fewer tokens than the word pattern on this alphabet
    for _, w, b, f in got:
        if w:
            assert b >= w and f >= 1_000_000

# ---------------------------------------------------------------------------
# cross_source_dup_matrix — exact rollup model over the oracle's own
# candidate pairs (the banding itself is covered by the LSH pair tests)
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_cross_source_dup_matrix_matches_model(docs):
    from docix_spark.driver_queries import _SQL_LSH_PAIRS

    con = _con(docs)
    pairs = con.execute(_SQL_LSH_PAIRS + " SELECT doc_a, doc_b FROM pairs").fetchall()
    got = con.execute(REGISTRY["cross_source_dup_matrix"].sql).fetchall()
    matrix = Counter()
    for a, b in pairs:
        sa, sb = f"src{a % 3}", f"src{b % 3}"
        matrix[tuple(sorted((sa, sb)))] += 1
    want = sorted((sa, sb, n) for (sa, sb), n in matrix.items())
    assert got == want
    # every candidate pair lands in exactly one matrix cell
    assert sum(r[2] for r in got) == len(pairs)


# ---------------------------------------------------------------------------
# adjacency_matrix_agg — exact filter-intersection model + ES contract
# (alphabetical '&' keys, empty buckets omitted, intersection <= singles)
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_adjacency_matrix_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["adjacency_matrix_agg"].sql).fetchall()
    langs = [["en", "de", "fr"][i % 3] for i in range(len(docs))]
    bits = [
        ("spark" in d, "join" in d, langs[i] == "en") for i, d in enumerate(docs)
    ]
    model = {
        "en": sum(c for _, _, c in bits),
        "en&join": sum(b and c for _, b, c in bits),
        "en&spark": sum(a and c for a, _, c in bits),
        "join": sum(b for _, b, _ in bits),
        "join&spark": sum(a and b for a, b, _ in bits),
        "spark": sum(a for a, _, _ in bits),
    }
    want = sorted((k, n) for k, n in model.items() if n > 0)
    assert got == want
    d = dict(got)
    for pair, sing in [("en&join", ("en", "join")), ("en&spark", ("en", "spark")),
                       ("join&spark", ("join", "spark"))]:
        if pair in d:
            assert d[pair] <= min(d[sing[0]], d[sing[1]])

# ---------------------------------------------------------------------------
# language_confusion_matrix — exact rollup over the oracle's own per-doc
# predictions (the heuristic itself is covered by lang_id tests)
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_language_confusion_matrix_matches_model(docs):
    from docix_spark.driver_queries import _lang_sql

    con = _con(docs)
    pred = dict(con.execute(_lang_sql()).fetchall())
    got = con.execute(REGISTRY["language_confusion_matrix"].sql).fetchall()
    matrix = Counter()
    for i in range(len(docs)):
        matrix[(["en", "de", "fr"][i % 3], pred[i])] += 1
    want = sorted((l, p, n) for (l, p), n in matrix.items())
    assert got == want
    assert sum(r[2] for r in got) == len(docs)


# ---------------------------------------------------------------------------
# train_eval_split — exact md5-coordinate model + independence from the
# shard coordinate + conservation
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_train_eval_split_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["train_eval_split"].sql).fetchall()
    splits: dict[str, list[int]] = {}
    for i, toks in enumerate(docs):
        v = int(hashlib.md5(str(i).encode()).hexdigest()[4:8], 16) % 100
        split = "train" if v < 98 else ("valid" if v == 98 else "test")
        splits.setdefault(split, []).append(len(toks))
    total = sum(len(d) for d in docs)
    if total == 0:
        return
    want = sorted(
        (s, len(ls), sum(ls), sum(ls) * 1_000_000 // total) for s, ls in splits.items()
    )
    assert got == want
    assert sum(r[1] for r in got) == len(docs)
    assert sum(r[2] for r in got) == total
