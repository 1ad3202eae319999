"""Property-based semantics checks for the session-47 operators.

Models: brute-force two-sample KS / Mann-Whitney over the raw value lists
(the oracle only ever sees the weighted histogram — these tests prove the
histogram+window decomposition equals the textbook pairwise definitions),
and a Python float model of the Jensen-Shannon decomposition (shared-term
q6-first contributions + the single residual-mass expression) checked for
exact equality — every float expression in the oracle is replicated
operation-for-operation, so libm/IEEE agreement on this box makes the q6
outputs bit-identical. DuckDB-only (ms per example).
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _LN2_HALF, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _docs_con(rows: list[tuple[str, str, str]]) -> duckdb.DuckDBPyConnection:
    """rows: (text, lang, source)."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [r[0] for r in rows],
                "lang": [r[1] for r in rows],
                "source": [r[2] for r in rows],
            }
        ),
    )
    return con


_lens = st.lists(st.integers(min_value=0, max_value=12), min_size=0, max_size=10)


# ---------------------------------------------------------------------------
# ks_test_doclen — histogram/window D == brute-force sup |F_a - F_b|
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(a=_lens, b=_lens)
def test_ks_matches_bruteforce(a, b):
    rows = [("w " * n, "en", "s0") for n in a] + [("w " * n, "zh", "s0") for n in b]
    rows.append(("w w w", "de", "s0"))  # an ignored third language
    con = _docs_con(rows)
    na, nb, d_q6, at = con.execute(REGISTRY["ks_test_doclen"].sql).fetchall()[0]
    assert (na, nb) == (len(a), len(b))
    values = sorted(set(a) | set(b))
    if not values:
        assert (d_q6, at) == (0, -1)  # totalized degenerate case
        return
    # exact rational sup-difference over the pooled support
    best, best_at = Fraction(-1), None
    for v in values:
        cuma = sum(1 for x in a if x <= v)
        cumb = sum(1 for x in b if x <= v)
        diff = abs(
            Fraction(len(b) * cuma - len(a) * cumb)
        )  # |nb*cum_a - na*cum_b| (scaled by na*nb)
        if diff > best:
            best, best_at = diff, v
    if len(a) * len(b) == 0:
        assert d_q6 == 0
    else:
        assert d_q6 == _round_away(1_000_000.0 * int(best) / (len(a) * len(b)))
    assert at == best_at


# ---------------------------------------------------------------------------
# mannwhitney_doclen — histogram 2U == brute-force pair count with ties
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(a=_lens, b=_lens)
def test_mwu_matches_bruteforce(a, b):
    rows = [("w " * n, "en", "s0") for n in a] + [("w " * n, "zh", "s0") for n in b]
    rows.append(("w w w", "de", "s0"))  # ignored third language; anchors the table
    con = _docs_con(rows)
    out = con.execute(REGISTRY["mannwhitney_doclen"].sql).fetchall()
    na, nb, u2, rb_q6 = out[0]
    assert (na, nb) == (len(a), len(b))
    want_u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    assert u2 == want_u2
    if len(a) * len(b) == 0:
        assert rb_q6 == 0
    else:
        assert rb_q6 == _round_away(
            1_000_000.0 * (want_u2 - len(a) * len(b)) / (len(a) * len(b))
        )


# ---------------------------------------------------------------------------
# jsd_source_pairs — decomposed shared+residual == direct float model, and
# the invariants 0 <= JSD <= ln 2 (up to q6 rounding slack)
# ---------------------------------------------------------------------------

_VOCAB = ["alpha", "beta", "gamma", "delta"]
_texts = st.lists(
    st.sampled_from(_VOCAB), min_size=1, max_size=8
).map(lambda ws: " ".join(ws))


@settings(max_examples=40, deadline=None)
@given(
    ta=st.lists(_texts, min_size=1, max_size=4),
    tb=st.lists(_texts, min_size=1, max_size=4),
)
def test_jsd_matches_float_model(ta, tb):
    rows = [(t, "en", "sa") for t in ta] + [(t, "en", "sb") for t in tb]
    con = _docs_con(rows)
    got = con.execute(REGISTRY["jsd_source_pairs"].sql).fetchall()
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for t in ta:
        for w in t.split():
            ca[w] = ca.get(w, 0) + 1
    for t in tb:
        for w in t.split():
            cb[w] = cb.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    shared = sorted(set(ca) & set(cb))
    if not shared:
        assert got == []  # the pair join carries co-occurring terms only
        return
    int_q6 = 0
    for w in shared:
        pa, pb = ca[w] / float(na), cb[w] / float(nb)
        int_q6 += _round_away(
            500_000
            * (pa * math.log(2 * pa / (pa + pb)) + pb * math.log(2 * pb / (pa + pb)))
        )
    sa_int = sum(ca[w] for w in shared)
    sb_int = sum(cb[w] for w in shared)
    resid = _round_away(
        1_000_000 * float(_LN2_HALF) * ((na - sa_int) / float(na) + (nb - sb_int) / float(nb))
    )
    assert len(got) == 1
    src_a, src_b, n_shared, jsd_q6 = got[0]
    assert (src_a, src_b, n_shared) == ("sa", "sb", len(shared))
    assert jsd_q6 == int_q6 + resid
    # bounded: 0 <= JSD <= ln 2, with one q6 ulp of rounding slack per term
    slack = len(shared) + 1
    assert -slack <= jsd_q6 <= _round_away(1_000_000 * math.log(2.0)) + slack


# ---------------------------------------------------------------------------
# session 47b — weighted A-ES sampling, stupid-backoff trigram LM, minhash
# fuzzy decontamination: DuckDB oracle vs exact Python models
# ---------------------------------------------------------------------------

import hashlib


def _docs_con_ids(rows: list[tuple[int, str, str]]) -> duckdb.DuckDBPyConnection:
    """rows: (doc_id, text, source) — explicit ids so tests can hit the
    md5-coordinate eval splits deterministically."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": [r[2] for r in rows],
            }
        ),
    )
    return con


@settings(max_examples=40, deadline=None)
@given(lens=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=12))
def test_weighted_sample_matches_aes_model(lens):
    rows = [(i, "w " * n, "s0") for i, n in enumerate(lens)]
    con = _docs_con_ids(rows)
    got = con.execute(REGISTRY["weighted_sample_docs"].sql).fetchall()
    model = []
    for i, n in enumerate(lens):
        if n == 0:
            continue  # zero-weight docs are unsampleable
        u = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:13], 16) / 4503599627370496.0
        key = _round_away(1_000_000 * math.log(u) / n)
        model.append((i, "s0", n, key))
    model.sort(key=lambda r: (-r[3], r[0]))
    assert got == model[:100]


# stupid backoff: ids 116/158 sit in the md5-5-8 eval split (v >= 98),
# everything under 100 is train — so hypothesis can populate both sides.
_SB_EVAL_IDS = [116, 158]
_SB_VOCAB = ["aa", "bb", "cc", "dd"]
_sb_text = st.lists(st.sampled_from(_SB_VOCAB), min_size=0, max_size=7).map(" ".join)


def _sb_model(train_texts, eval_rows):
    tri, bi, uni = {}, {}, {}
    for t in train_texts:
        ws = t.split()
        for i in range(len(ws) - 2):
            tri[(ws[i], ws[i + 1], ws[i + 2])] = tri.get((ws[i], ws[i + 1], ws[i + 2]), 0) + 1
        for i in range(len(ws) - 1):
            bi[(ws[i], ws[i + 1])] = bi.get((ws[i], ws[i + 1]), 0) + 1
        for w_ in ws:
            uni[w_] = uni.get(w_, 0) + 1
    big_n, vocab = sum(uni.values()), len(uni)
    out = {}
    for src, t in eval_rows:
        ws = t.split()
        for i in range(len(ws) - 2):
            g = (ws[i], ws[i + 1], ws[i + 2])
            if g in tri:
                lvl, s = 0, tri[g] / float(bi[(g[0], g[1])])
            elif (g[1], g[2]) in bi:
                lvl, s = 1, float("4e-1") * bi[(g[1], g[2])] / float(uni[g[1]])
            else:
                lvl, s = 2, float("16e-2") * (uni.get(g[2], 0) + 1) / float(big_n + vocab + 1)
            nlp = _round_away(-math.log(s) * 1_000_000)
            st_ = out.setdefault(src, [0, 0, 0, 0, 0])
            st_[0] += 1
            st_[1 + lvl] += 1
            st_[4] += nlp
    return {
        src: (v[0], v[1], v[2], v[3], v[4]) for src, v in out.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    train=st.lists(_sb_text, min_size=0, max_size=6),
    ev0=_sb_text,
    ev1=_sb_text,
)
def test_stupid_backoff_matches_model(train, ev0, ev1):
    rows = [(i, t, "s0") for i, t in enumerate(train)]
    rows += [(_SB_EVAL_IDS[0], ev0, "sa"), (_SB_EVAL_IDS[1], ev1, "sb")]
    con = _docs_con_ids(rows)
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(REGISTRY["stupid_backoff_surprisal"].sql).fetchall()
    }
    want = _sb_model(train, [("sa", ev0), ("sb", ev1)])
    assert got == want


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    shingles = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not shingles:
        return set()
    mh = [
        min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in shingles)
        for k in range(4)
    ]
    return {mh[0] + mh[1], mh[2] + mh[3]}


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_SB_VOCAB), min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_decontamination_minhash_matches_model(texts):
    # ids 0 and 29 are the eval split (% 29 == 0); 1.. are training docs
    rows = [(0, texts[0], "s0")] + [(i + 1, t, "s0") for i, t in enumerate(texts[1:])]
    con = _docs_con_ids(rows)
    got = con.execute(REGISTRY["decontamination_minhash"].sql).fetchall()
    ev_bands = {b: 0 for b in _mh_bands(texts[0])}
    model = []
    for i, t in enumerate(texts[1:]):
        n = 1 if (_mh_bands(t) & set(ev_bands)) else 0
        model.append((i + 1, n, 1 if n else 0))
    assert got == model


def test_decontamination_minhash_catches_paraphrase():
    """A doc sharing most (not all) of an eval doc's shingles — no verbatim
    8-gram, but the minhash bands still collide."""
    ev = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"  # one word swapped
    rows = [(0, ev, "s0"), (1, near, "s0"), (2, "totally different words here", "s0")]
    con = _docs_con_ids(rows)
    got = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute(REGISTRY["decontamination_minhash"].sql).fetchall()
    )
    # the near-dup must collide on at least one band for THIS fixture
    assert got[1] == (1, 1)
    assert got[2] == (0, 0)


# ---------------------------------------------------------------------------
# session 47c — Benford audit vs Python model; hybrid-linear bounds
# ---------------------------------------------------------------------------

from docix_spark.driver_queries import _BENFORD_EXP


def _events_con(cents_list: list[int]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(cents_list)),
                "value": [c / 100.0 for c in cents_list],
            }
        ),
    )
    return con


@settings(max_examples=50, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=-1000, max_value=99_999_999), min_size=1, max_size=40
    )
)
def test_benford_matches_model(cents):
    con = _events_con(cents)
    got = con.execute(REGISTRY["benford_value_audit"].sql).fetchall()
    pos = [c for c in cents if c > 0]
    n_tot = len(pos)
    counts = {d: 0 for d in range(1, 10)}
    for c in pos:
        counts[int(str(c)[0])] += 1
    model = []
    for d, exp_q6 in _BENFORD_EXP:
        o = counts[d]
        if n_tot == 0:
            obs_q6, x2 = 0, 0
        else:
            obs_q6 = _round_away(1_000_000.0 * o / n_tot)
            e = n_tot * (exp_q6 / 1_000_000.0)
            x2 = _round_away(1_000_000 * (o - e) * (o - e) / e)
        model.append((d, o, obs_q6, exp_q6, x2))
    assert got == model


def test_benford_expectations_sum_to_one():
    # the folded q6 constants are a probability vector (up to q6 rounding)
    assert abs(sum(e for _, e in _BENFORD_EXP) - 1_000_000) <= 5


def test_hybrid_linear_bounds_sf0001():
    """lin_q6 is a convex combination of [0,1] normalizations: bounded by
    [0, 1e6]; each leg's top doc normalizes to exactly 1."""
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    rows = con.execute(REGISTRY["hybrid_linear_search"].sql).fetchall()
    assert rows, "hybrid_linear_search returned no rows at sf0.001"
    for doc_id, lex_q6, vec_q6, lin_q6 in rows:
        assert 0 <= lin_q6 <= 1_000_000
    # field_value_factor: final = floor(score*boost/1e6) never exceeds
    # score_q6 * ln(1+n_chars) and respects its own ordering
    fvf = con.execute(REGISTRY["field_value_factor_search"].sql).fetchall()
    assert fvf
    finals = [r[3] for r in fvf]
    assert finals == sorted(finals, reverse=True)
    for _, score_q6, boost_q6, final_q6 in fvf:
        assert final_q6 == (score_q6 * boost_q6) // 1_000_000
