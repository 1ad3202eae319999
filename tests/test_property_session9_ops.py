"""Property-based semantics checks for the session-9 operators
(countmin_heavyhitters, events_asof_join, dsir_importance, search_after).

Same methodology as test_property_pipeline_ops / test_property_graph_sketch_ops:
drive the registered DuckDB oracle SQL over hypothesis-generated inputs and
compare against an independent Python model, so a bug shared by the Spark and
SQL twins cannot hide behind the fixed driver corpus. DuckDB-only keeps each
example at ms cost; the Spark twin is pinned to the same SQL by
test_driver_contract.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.analysis.tokenizer import TOKEN_PATTERN
from docix_spark.driver_queries import REGISTRY, _bm25_sql, _TOPK_TERMS

_WORDS = ["alpha", "beta", "gamma", "delta", "spark", "join", "hash", "x9", "scan"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=12)

_TOK_RE = re.compile(TOKEN_PATTERN)


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _docs_con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
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


def _tokens(docs: list[list[str]]) -> list[list[str]]:
    return [_TOK_RE.findall(" ".join(d).lower()) for d in docs]


# ---------------------------------------------------------------------------
# countmin_heavyhitters — oracle must be bit-identical to a Python CMS model,
# and every estimate must dominate its exact count (pure overestimate)
# ---------------------------------------------------------------------------


def _cms_model(docs: list[list[str]]) -> list[tuple[str, int, int]]:
    totals: dict[str, int] = {}
    for toks in _tokens(docs):
        for t in toks:
            totals[t] = totals.get(t, 0) + 1
    cells: dict[tuple[int, int], int] = {}
    pos: dict[str, list[int]] = {}
    for term, n in totals.items():
        h = hashlib.md5(term.encode()).hexdigest()
        pos[term] = [int(h[4 * i : 4 * i + 4], 16) % 1024 for i in range(4)]
        for i, p in enumerate(pos[term]):
            cells[(i, p)] = cells.get((i, p), 0) + n
    cand = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return [
        (term, n, min(cells[(i, p)] for i, p in enumerate(pos[term])))
        for term, n in cand
    ]


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_countmin_oracle_matches_model(docs):
    got = _docs_con(docs).execute(REGISTRY["countmin_heavyhitters"].sql).fetchall()
    want = _cms_model(docs)
    assert got == want
    for _, exact, est in got:
        assert est >= exact  # CMS never underestimates


# ---------------------------------------------------------------------------
# events_asof_join — oracle vs a pandas-free as-of model (latest strictly-
# prior view per purchase), with deliberate timestamp ties
# ---------------------------------------------------------------------------

_event = st.tuples(
    st.integers(min_value=0, max_value=3),  # user_id
    st.integers(min_value=0, max_value=50),  # ts in micros
    st.sampled_from(["view", "purchase", "click"]),
)
_events_strategy = st.lists(_event, min_size=1, max_size=40)


@settings(max_examples=40, deadline=None)
@given(_events_strategy)
def test_events_asof_oracle_matches_model(evs):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(evs)),
            "user_id": [e[0] for e in evs],
            "ts": pd.to_datetime([e[1] for e in evs], unit="us"),
            "event_type": [e[2] for e in evs],
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(REGISTRY["events_asof_join"].sql).fetchall()
    model = []
    for eid, (u, t, typ) in enumerate(evs):
        if typ != "purchase":
            continue
        prior = [t2 for (u2, t2, ty2) in evs if u2 == u and ty2 == "view" and t2 < t]
        if prior:
            v = max(prior)
            model.append((eid, u, t, v, t - v))
    assert got == model[:200]


# ---------------------------------------------------------------------------
# dsir_importance — oracle vs an add-1 unigram log-ratio model
# ---------------------------------------------------------------------------


def _dsir_model(docs: list[list[str]]) -> list[tuple[int, int]]:
    toks = _tokens(docs)
    tf: dict[tuple[int, str], int] = {}
    for i, ts in enumerate(toks):
        for t in ts:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    vocab = {t for (_, t) in tf}
    vsz = len(vocab)
    tgt: dict[str, int] = {}
    cor: dict[str, int] = {}
    for (i, t), n in tf.items():
        cor[t] = cor.get(t, 0) + n
        if f"src{i % 3}" == "src0":
            tgt[t] = tgt.get(t, 0) + n
    tt, ct = sum(tgt.values()), sum(cor.values())
    lam = {
        t: _round_half_away(
            1_000_000
            * (math.log((tgt.get(t, 0) + 1.0) / (tt + vsz)) - math.log((c + 1.0) / (ct + vsz)))
        )
        for t, c in cor.items()
    }
    imp: dict[int, int] = {}
    for (i, t), n in tf.items():
        imp[i] = imp.get(i, 0) + n * lam[t]
    ranked = sorted(imp.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return [(i, w) for i, w in ranked]


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_dsir_oracle_matches_model(docs):
    # the op needs at least one token overall, else ln() of empty vocab
    if not any(_tokens(docs)):
        return
    got = _docs_con(docs).execute(REGISTRY["dsir_importance"].sql).fetchall()
    assert got == _dsir_model(docs)


# ---------------------------------------------------------------------------
# search_after — keyset page 2 must equal offset-ranked rows 11..20 (the
# ES-documented equivalence that makes cursor paging a drop-in replacement)
# ---------------------------------------------------------------------------

_OFFSET_SQL = _bm25_sql(_TOPK_TERMS, msm=1, page=1, size=10)


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_search_after_equals_offset_page(docs):
    con = _docs_con(docs)
    keyset = con.execute(REGISTRY["search_after"].sql).fetchall()
    offset = [(d, s) for d, s, _ in con.execute(_OFFSET_SQL).fetchall()]
    assert keyset == offset
