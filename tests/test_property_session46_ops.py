"""Property-based semantics checks for the session-46 operators.

Models: exact integer/Counter models for the Q12 bucket counts, the
cohort revenue matrix and Yule's K; an IEEE-identical float model for the
Flesch formula (single shared expression, exact-double sums — same
operation order left-to-right, so equality is exact, the ttest lesson);
and a full Python rerank model for the binary-hamming ANN (dyadic 1/64
vector entries keep every dot product an exact dyadic sum — float32
round-trip included per the session-22 rule). DuckDB-only — ms/example.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from datetime import datetime, timedelta

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _BH_R, _BPE_ROUNDS, _Q12_FAST_US, REGISTRY

_EPOCH = datetime(1970, 1, 1)


def _us(dt: datetime) -> int:
    return int((dt - _EPOCH).total_seconds() * 1_000_000)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


# ---------------------------------------------------------------------------
# shipmode_priority_counts — Q12 bucket model
# ---------------------------------------------------------------------------

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_base = datetime(1996, 1, 1)

_order = st.tuples(
    st.sampled_from(_PRIOS),
    st.integers(min_value=-400, max_value=400),  # orderdate offset days
)
_line = st.tuples(
    st.integers(min_value=0, max_value=9),  # orderkey (may dangle)
    st.integers(min_value=-200, max_value=600),  # shipdate offset days
)


@settings(max_examples=40, deadline=None)
@given(orders=st.lists(_order, min_size=1, max_size=8), lines=st.lists(_line, min_size=0, max_size=24))
def test_shipmode_priority_counts_matches_model(orders, lines):
    odf = pd.DataFrame(
        {
            "o_orderkey": range(len(orders)),
            "o_orderpriority": [p for p, _ in orders],
            "o_orderdate": [_base + timedelta(days=d) for _, d in orders],
        }
    )
    ldf = pd.DataFrame(
        {
            "l_orderkey": pd.Series([k for k, _ in lines], dtype="int64"),
            "l_shipdate": pd.Series(
                [_base + timedelta(days=d) for _, d in lines], dtype="datetime64[us]"
            ),
        }
    )
    con = duckdb.connect()
    con.register("orders", odf)
    con.register("lineitem", ldf)
    got = {r[0]: (r[1], r[2]) for r in con.execute(REGISTRY["shipmode_priority_counts"].sql).fetchall()}

    lo, hi = _us(datetime(1996, 1, 1)), _us(datetime(1997, 1, 1))
    model: dict[str, list[int]] = {}
    for k, d in lines:
        if k >= len(orders):
            continue
        ship = _us(_base + timedelta(days=d))
        if not (lo <= ship < hi):
            continue
        odate = _us(odf["o_orderdate"][k].to_pydatetime())
        bucket = "FAST" if ship <= odate + _Q12_FAST_US else "SLOW"
        high = orders[k][0] in ("1-URGENT", "2-HIGH")
        cell = model.setdefault(bucket, [0, 0])
        cell[0 if high else 1] += 1
    assert got == {b: (c[0], c[1]) for b, c in model.items()}


# ---------------------------------------------------------------------------
# events_cohort_revenue — cohort matrix model (dyadic values: k/4 cents-safe)
# ---------------------------------------------------------------------------

_event = st.tuples(
    st.integers(min_value=0, max_value=5),  # user_id
    st.integers(min_value=0, max_value=40),  # day offset
    st.integers(min_value=-400, max_value=400),  # value * 4
)


@settings(max_examples=40, deadline=None)
@given(events=st.lists(_event, min_size=1, max_size=30))
def test_events_cohort_revenue_matches_model(events):
    base = datetime(2024, 1, 1)
    edf = pd.DataFrame(
        {
            "user_id": [u for u, _, _ in events],
            "ts": [base + timedelta(days=d) for _, d, _ in events],
            "value": [q / 4 for _, _, q in events],
        }
    )
    con = duckdb.connect()
    con.register("events", edf)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(REGISTRY["events_cohort_revenue"].sql).fetchall()
    }

    wk = [_us(base + timedelta(days=d)) // 86_400_000_000 // 7 for _, d, _ in events]
    first = {}
    for (u, _, _), w in zip(events, wk):
        first[u] = min(first.get(u, w), w)
    cells: dict[tuple[int, int], list] = {}
    for (u, _, q), w in zip(events, wk):
        key = (first[u], w - first[u])
        c = cells.setdefault(key, [set(), 0, 0])
        c[0].add(u)
        c[1] += 1
        c[2] += _round_away(100 * (q / 4))
    assert got == {k: (len(c[0]), c[1], c[2]) for k, c in cells.items()}


# ---------------------------------------------------------------------------
# readability_flesch — exact IEEE model over regex counters
# ---------------------------------------------------------------------------

_WORDS = ["spark", "hash", "join.", "scan!", "the", "a?", "rhythm", "xyz", "aeiou"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20)
_corpus = st.lists(_doc, min_size=1, max_size=10)

_TOK_ASCII = re.compile(r"[a-z0-9_]+")
_VOWELS = re.compile(r"[aeiouy]+")
_SENTS = re.compile(r"[.!?]+")


def _doc_con(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(d) for d in docs],
                "source": [f"src{i % 2}" for i in range(len(docs))],
            }
        ),
    )
    return con


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_readability_flesch_matches_model(docs):
    con = _doc_con(docs)
    got = {r[0]: tuple(r[1:]) for r in con.execute(REGISTRY["readability_flesch"].sql).fetchall()}
    agg: dict[str, list[int]] = {}
    for i, d in enumerate(docs):
        text = " ".join(d)
        low = text.lower()
        w = len(_TOK_ASCII.findall(low))
        y = len(_VOWELS.findall(low))
        s = max(1, len(_SENTS.findall(text)))
        a = agg.setdefault(f"src{i % 2}", [0, 0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    model = {}
    for src, (n, w, s, y) in agg.items():
        f = 0 if w == 0 else _round_away(1_000_000 * (206.835 - 1.015 * (w / s) - 84.6 * (y / w)))
        model[src] = (n, w, s, y, f)
    assert got == model


# ---------------------------------------------------------------------------
# yule_k_source — Counter model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_yule_k_matches_model(docs):
    con = _doc_con(docs)
    got = {r[0]: tuple(r[1:]) for r in con.execute(REGISTRY["yule_k_source"].sql).fetchall()}
    per_src: dict[str, Counter] = {}
    for i, d in enumerate(docs):
        text = " ".join(d).lower()
        per_src.setdefault(f"src{i % 2}", Counter()).update(_TOK_ASCII.findall(text))
    model = {}
    for src, c in per_src.items():
        if not c:
            continue
        s1 = sum(c.values())
        s2 = sum(v * v for v in c.values())
        k = _round_away(1e10 * float(s2 - s1) / (float(s1) * float(s1)))
        model[src] = (s1, len(c), s2, k)
    assert got == model


# ---------------------------------------------------------------------------
# ann_hamming_rerank / _recall — full Python rerank model. Dyadic 1/64
# entries: every dot is an exact dyadic sum, sqrt/divide are correctly
# rounded IEEE ops, so the q6 cosine matches bit-for-bit. Entries exclude
# 0 so sign bits are unambiguous; positive-orthant is NOT needed (codes,
# not norms). Vectors round-trip through float32 like the parquet column.
# ---------------------------------------------------------------------------

_coord = st.integers(min_value=-64, max_value=64).filter(lambda i: i != 0).map(lambda i: i / 64)
_vec = st.lists(_coord, min_size=64, max_size=64)
_vecs = st.lists(_vec, min_size=3, max_size=16)


def _emb_con(vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", tbl)
    return con


def _model_rerank(vecs):
    vs = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]
    codes = [
        (
            sum((1 << i) for i in range(32) if v[i] > 0),
            sum((1 << i) for i in range(32) if v[32 + i] > 0),
        )
        for v in vs
    ]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def cosq6(a, b):
        return _round_away(1_000_000 * dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

    out = []
    for qid in range(0, len(vs), 37):
        qlo, qhi = codes[qid]
        ham = sorted(
            (bin((lo ^ qlo)).count("1") + bin((hi ^ qhi)).count("1"), vid)
            for vid, (lo, hi) in enumerate(codes)
        )
        band = ham[:_BH_R]
        rr = sorted(
            (-cosq6(vs[vid], vs[qid]), vid, h) for h, vid in band
        )
        for rnk, (negc, vid, h) in enumerate(rr[:10], start=1):
            out.append((qid, vid, h, -negc, rnk))
    return out


@settings(max_examples=25, deadline=None)
@given(vecs=_vecs)
def test_ann_hamming_rerank_matches_model(vecs):
    con = _emb_con(vecs)
    got = con.execute(REGISTRY["ann_hamming_rerank"].sql).fetchall()
    assert [tuple(r) for r in got] == _model_rerank(vecs)


@settings(max_examples=25, deadline=None)
@given(vecs=_vecs)
def test_ann_hamming_recall_matches_model(vecs):
    con = _emb_con(vecs)
    got = {r[0]: r[1] for r in con.execute(REGISTRY["ann_hamming_recall"].sql).fetchall()}
    rr = _model_rerank(vecs)
    vs = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    model = {}
    for qid in range(0, len(vs), 37):
        approx = {vid for q, vid, *_ in rr if q == qid}
        exact = sorted(
            (
                -_round_away(
                    1_000_000 * dot(v, vs[qid]) / (math.sqrt(dot(v, v)) * math.sqrt(dot(vs[qid], vs[qid])))
                ),
                vid,
            )
            for vid, v in enumerate(vs)
        )
        top = {vid for _, vid in exact[:10]}
        model[qid] = len(approx & top)
    assert got == model


# ---------------------------------------------------------------------------
# bpe_train_merges — classic Python BPE reference (greedy left-to-right
# merge, max-count pair with lexicographic tiebreak). Words repeat a lot
# by construction so pair counts collide and the tiebreak is exercised.
# ---------------------------------------------------------------------------

_BPE_WORDS = ["ab", "abab", "aab", "ba", "hello", "hell", "lo", "x"]
_bpe_doc = st.lists(st.sampled_from(_BPE_WORDS), min_size=0, max_size=15)
_bpe_corpus = st.lists(_bpe_doc, min_size=1, max_size=8)


def _bpe_model(word_counts: Counter) -> list[tuple]:
    wt = [(tuple(w), c) for w, c in sorted(word_counts.items()) if len(w) >= 2]
    merges = []
    for r in range(_BPE_ROUNDS):
        pc: Counter = Counter()
        for syms, c in wt:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r + 1, a, b, n))

        def merge(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        wt = [(merge(s), c) for s, c in wt]
    return merges


@settings(max_examples=40, deadline=None)
@given(docs=_bpe_corpus)
def test_bpe_train_merges_matches_model(docs):
    con = _doc_con(docs)
    got = [tuple(r) for r in con.execute(REGISTRY["bpe_train_merges"].sql).fetchall()]
    counts = Counter(w for d in docs for w in d)
    assert got == _bpe_model(counts)


# ---------------------------------------------------------------------------
# script_mix_source — regex counter model (ASCII words only exercise the
# latin/digit counters; the class ranges themselves are the tokenizer's,
# already parity-tested in test_tokenizer)
# ---------------------------------------------------------------------------

_MIX_WORDS = ["spark", "a1b2", "123", "x", "дом", "λόγος", "日本語", "カタカナ"]
_mix_doc = st.lists(st.sampled_from(_MIX_WORDS), min_size=0, max_size=12)
_mix_corpus = st.lists(_mix_doc, min_size=1, max_size=8)

_SCRIPT_RES = {
    "latin": re.compile(r"[a-zA-Z]"),
    "digit": re.compile(r"[0-9]"),
    "cyrillic": re.compile(r"[Ѐ-ӿ]"),
    "greek": re.compile(r"[ά-ώΆ-Ϋ]"),
    "cjk": re.compile(r"[一-鿿㐀-䶿豈-﫿]"),
    "kana": re.compile(r"[゠-ヿ぀-ゟ]"),
}


@settings(max_examples=40, deadline=None)
@given(docs=_mix_corpus)
def test_script_mix_matches_model(docs):
    con = _doc_con(docs)
    got = {r[0]: tuple(r[1:]) for r in con.execute(REGISTRY["script_mix_source"].sql).fetchall()}
    agg: dict[str, Counter] = {}
    for i, d in enumerate(docs):
        text = " ".join(d)
        c = agg.setdefault(f"src{i % 2}", Counter())
        for name, rx in _SCRIPT_RES.items():
            c[name] += len(rx.findall(text))
    model = {
        src: tuple(c[n] for n in ("latin", "digit", "cyrillic", "greek", "cjk", "kana"))
        for src, c in agg.items()
    }
    assert got == model


# ---------------------------------------------------------------------------
# heldout_unigram_ppl — add-1 LM model over the md5-5-8 split
# ---------------------------------------------------------------------------

import hashlib


def _split_v(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[4:8], 16) % 100


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_heldout_unigram_ppl_matches_model(docs):
    con = _doc_con(docs)
    got = con.execute(REGISTRY["heldout_unigram_ppl"].sql).fetchall()
    assert len(got) == 1
    train: Counter = Counter()
    nll, n_ev_tok, n_ev_docs = 0, 0, 0
    toks = [_TOK_ASCII.findall(" ".join(d).lower()) for d in docs]
    for i, t in enumerate(toks):
        if _split_v(i) < 98:
            train.update(t)
    big_t, vocab = sum(train.values()), len(train)
    denom = float(big_t + vocab + 1)
    nlp = {w: _round_away(-math.log((c + 1) / denom) * 1e6) for w, c in train.items()}
    oov = _round_away(-math.log(1.0 / denom) * 1e6)
    for i, t in enumerate(toks):
        if _split_v(i) >= 98:
            n_ev_docs += 1
            for w in t:
                nll += nlp.get(w, oov)
                n_ev_tok += 1
    ppl = 0 if n_ev_tok == 0 else _round_away(1e6 * math.exp(nll / (1e6 * n_ev_tok)))
    assert got[0] == (big_t, vocab, n_ev_docs, n_ev_tok, nll, ppl)


# ---------------------------------------------------------------------------
# events_autocorrelation — exact sufficient-stats model on the day spine
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(days=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=40))
def test_events_autocorrelation_matches_model(days):
    base = datetime(2024, 1, 1)
    edf = pd.DataFrame(
        {
            "ts": pd.Series([base + timedelta(days=d) for d in days], dtype="datetime64[us]"),
        }
    )
    con = duckdb.connect()
    con.register("events", edf)
    got = [tuple(r) for r in con.execute(REGISTRY["events_autocorrelation"].sql).fetchall()]

    dnum = [_us(base + timedelta(days=d)) // 86_400_000_000 for d in days]
    d0, d1 = min(dnum), max(dnum)
    counts = Counter(dnum)
    xs = [counts.get(d, 0) for d in range(d0, d1 + 1)]
    nd, s, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    model = []
    for k in range(1, 8):
        pairs = [(xs[i], xs[i + k]) for i in range(nd - k)] if nd > k else []
        npr = len(pairs)
        sxy = sum(x * y for x, y in pairs)
        sh = sum(x for x, _ in pairs)
        stl = sum(y for _, y in pairs)
        den = nd * nd * sxx - nd * s * s
        num = nd * nd * sxy - nd * s * (sh + stl) + npr * s * s
        acf = 0 if den == 0 else _round_away(1e6 * float(num) / float(den))
        model.append((k, npr, acf))
    assert got == model


# ---------------------------------------------------------------------------
# source_vocab_overlap — set model with the zero-overlap spine
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_source_vocab_overlap_matches_model(docs):
    con = _doc_con(docs)
    got = [tuple(r) for r in con.execute(REGISTRY["source_vocab_overlap"].sql).fetchall()]
    vocab: dict[str, set] = {}
    for i, d in enumerate(docs):
        vocab.setdefault(f"src{i % 2}", set()).update(
            _TOK_ASCII.findall(" ".join(d).lower())
        )
    srcs = sorted(s for s, v in vocab.items() if v)  # empty-vocab sources drop
    model = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            na, nb = len(vocab[a]), len(vocab[b])
            model.append((a, b, na, nb, inter, (1_000_000 * inter) // (na + nb - inter)))
    assert got == model


# ---------------------------------------------------------------------------
# bloom_fpr_curve — exact md5-slice model + no-false-negatives / monotone-m
# invariants
# ---------------------------------------------------------------------------

from docix_spark.driver_queries import _BLOOM_MS, _TRUNC_LS

_BLOOM_WORDS = ["a", "b", "c", "d"]
_bloom_doc = st.lists(st.sampled_from(_BLOOM_WORDS), min_size=0, max_size=24)
_bloom_corpus = st.lists(_bloom_doc, min_size=1, max_size=12)


def _grams8(tokens):
    return {
        " ".join(tokens[i : i + 8]) for i in range(len(tokens) - 7)
    } if len(tokens) >= 8 else set()


@settings(max_examples=30, deadline=None)
@given(docs=_bloom_corpus)
def test_bloom_fpr_curve_matches_model(docs):
    con = _doc_con(docs)
    got = [tuple(r) for r in con.execute(REGISTRY["bloom_fpr_curve"].sql).fetchall()]
    toks = [_TOK_ASCII.findall(" ".join(d).lower()) for d in docs]
    ev, trg = set(), set()
    for i, t in enumerate(toks):
        (ev if i % 29 == 0 else trg).update(_grams8(t))

    def slices(g):
        h = hashlib.md5(g.encode()).hexdigest()
        return [int(h[4 * j : 4 * j + 4], 16) for j in range(4)]

    model = []
    prev_cand = None
    for m in _BLOOM_MS:
        # membership is position-set only (j-agnostic set bits, like a
        # real bloom filter)
        posset = {s % m for g in ev for s in slices(g)}
        npos = len(posset)
        cand = sum(1 for g in trg if all(s % m in posset for s in slices(g)))
        nex = len(trg & ev)
        fp = cand - nex
        fpr = 0 if len(trg) - nex == 0 else (1_000_000 * fp) // (len(trg) - nex)
        model.append((m, npos, len(trg), nex, cand, fp, fpr))
        # invariants: no false negatives; candidates shrink as m grows
        assert cand >= nex
        if prev_cand is not None:
            assert cand <= prev_cand
        prev_cand = cand
    assert got == model


# ---------------------------------------------------------------------------
# truncation_loss_curve — exact min/max model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_truncation_loss_matches_model(docs):
    con = _doc_con(docs)
    got = [tuple(r) for r in con.execute(REGISTRY["truncation_loss_curve"].sql).fetchall()]
    lens: dict[str, list[int]] = {}
    for i, d in enumerate(docs):
        lens.setdefault(f"src{i % 2}", []).append(
            len(_TOK_ASCII.findall(" ".join(d).lower()))
        )
    model = []
    for src in sorted(lens):
        for L in _TRUNC_LS:
            xs = lens[src]
            tot = sum(xs)
            lost = sum(max(x - L, 0) for x in xs)
            model.append(
                (
                    src, L, len(xs),
                    sum(1 for x in xs if x > L),
                    sum(min(x, L) for x in xs),
                    lost,
                    0 if tot == 0 else (1_000_000 * lost) // tot,
                )
            )
    assert got == model


# ---------------------------------------------------------------------------
# boilerplate_trigram_topk — Counter model with (cnt desc, gram asc) tiebreak
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_boilerplate_trigram_topk_matches_model(docs):
    con = _doc_con(docs)
    got = [tuple(r) for r in con.execute(REGISTRY["boilerplate_trigram_topk"].sql).fetchall()]
    cnt: dict[str, Counter] = {}
    for i, d in enumerate(docs):
        t = _TOK_ASCII.findall(" ".join(d).lower())
        c = cnt.setdefault(f"src{i % 2}", Counter())
        for j in range(len(t) - 2):
            c[" ".join(t[j : j + 3])] += 1
    model = []
    for src in sorted(cnt):
        ranked = sorted(cnt[src].items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for rn, (g, n) in enumerate(ranked, start=1):
            model.append((src, g, n, rn))
    assert got == model
