"""Property-based semantics checks for the session-54 operators.

Models: batch == per-query-loop identity for the batched BM25 (each
qid's rows must equal the single-query chain run alone — the property
that justifies the one-pass join), a Python Jelinek-Mercer model for the
λ sweep, and a cf/df model for burstiness. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    _BATCH_QUERIES,
    _LM_LAMBDAS,
    _bm25_agg_ctes,
    REGISTRY,
)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_bm25_batch_equals_per_query_loop_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    batch = {}
    for qid, doc_id, score, rank in con.execute(
        REGISTRY["bm25_batch_queries"].sql
    ).fetchall():
        batch.setdefault(qid, []).append((doc_id, score, rank))
    assert batch, "batch query returned nothing"
    for qid, terms in _BATCH_QUERIES:
        single = con.execute(
            _bm25_agg_ctes(terms)
            + """SELECT doc_id, score_q6,
                 row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank
                 FROM agg QUALIFY rank <= 5 ORDER BY rank"""
        ).fetchall()
        assert batch.get(qid, []) == [(d, s, r) for d, s, r in single], f"qid={qid}"


# ---------------------------------------------------------------------------
# interpolated_lm_sweep — Python JM model; ids 116/158 are the eval split
# ---------------------------------------------------------------------------

_EVAL_IDS = [116, 158]
_V = ["aa", "bb", "cc"]
_text = st.lists(st.sampled_from(_V), min_size=0, max_size=7).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(train=st.lists(_text, min_size=0, max_size=5), ev0=_text, ev1=_text)
def test_interpolated_lm_matches_model(train, ev0, ev1):
    rows = [(i, t) for i, t in enumerate(train)]
    rows += [(_EVAL_IDS[0], ev0), (_EVAL_IDS[1], ev1)]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        ),
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(REGISTRY["interpolated_lm_sweep"].sql).fetchall()
    }
    bi: dict[tuple[str, str], int] = {}
    uc: dict[str, int] = {}
    for t in train:
        ws = t.split()
        for w in ws:
            uc[w] = uc.get(w, 0) + 1
        for i in range(len(ws) - 1):
            bi[(ws[i], ws[i + 1])] = bi.get((ws[i], ws[i + 1]), 0) + 1
    big_n, vocab = sum(uc.values()), len(uc)
    evb: dict[tuple[str, str], int] = {}
    for t in (ev0, ev1):
        ws = t.split()
        for i in range(len(ws) - 1):
            evb[(ws[i], ws[i + 1])] = evb.get((ws[i], ws[i + 1]), 0) + 1
    model = {}
    for lam in _LM_LAMBDAS:
        n_scored = sum(evb.values())
        nll = 0
        for (a, b), tf in evb.items():
            p = (lam / 100.0) * (
                (bi.get((a, b), 0) + 1) / float(max(uc.get(a, 0) + vocab, 1))
            ) + (1.0 - (lam / 100.0)) * ((uc.get(b, 0) + 1) / float(big_n + vocab + 1))
            nll += tf * _round_away(-math.log(p) * 1_000_000)
        model[lam] = (n_scored, nll)
    # sources with no eval bigrams produce zero-row groups consistently
    if not evb:
        assert got == {} or all(v == (0, 0) for v in got.values())
    else:
        assert got == model


# ---------------------------------------------------------------------------
# term_burstiness
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_V + ["dd"]), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_burstiness_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["term_burstiness"].sql).fetchall()
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for t in docs:
        ws = t.split()
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    model = [
        (w, df[w], cf[w], _round_away(1_000_000.0 * cf[w] / df[w]))
        for w in df
        if df[w] >= 5
    ]
    model.sort(key=lambda r: (-r[3], r[0]))
    assert got == model[:20]
    # burstiness >= 1 by construction (cf >= df)
    assert all(r[3] >= 1_000_000 for r in got)
