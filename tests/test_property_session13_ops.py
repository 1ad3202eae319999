"""Property-based semantics checks for the session-13 operators.

Same methodology as test_property_session12_ops: drive the registered
DuckDB oracle SQL over hypothesis-generated corpora and compare against an
independent Python model, so a bug shared by the Spark and SQL twins
(written together) cannot hide behind the fixed corpus. DuckDB-only keeps
each example at ms cost; the Spark twin is pinned to the same SQL by the
hash-equality tests in test_driver_contract.

For the two BM25-derived result shapers (search_collapse, pinned_query)
the Python model consumes the oracle's OWN match-set CTE output (`agg`),
which is already pinned by the bm25_topk contract + session-12 property
tests — so these tests isolate exactly the NEW logic (collapse merge,
pinned/organic splice) instead of re-litigating the scoring math.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime, timedelta

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _TOPK_TERMS, _bm25_agg_ctes

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


def _match_set(con) -> list[tuple[int, int]]:
    """(doc_id, score_q6) rows from the oracle's own agg CTE."""
    return con.execute(
        _bm25_agg_ctes(_TOPK_TERMS) + " SELECT doc_id, score_q6 FROM agg"
    ).fetchall()


# ---------------------------------------------------------------------------
# search_collapse — oracle vs a per-source best-hit merge over the match set
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_search_collapse_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["search_collapse"].sql).fetchall()
    agg = _match_set(con)
    groups: dict[str, list[tuple[int, int]]] = {}
    for doc_id, s in agg:
        groups.setdefault(f"src{doc_id % 3}", []).append((doc_id, s))
    collapsed = []
    for src, hits in groups.items():
        best = min(hits, key=lambda h: (-h[1], h[0]))
        collapsed.append((src, best[0], best[1], len(hits)))
    collapsed.sort(key=lambda r: (-r[2], r[1]))
    model = [(src, d, s, n, i + 1) for i, (src, d, s, n) in enumerate(collapsed[:10])]
    assert got == model


# ---------------------------------------------------------------------------
# pinned_query — oracle vs an explicit splice: pinned ids [7, 3] first (score
# looked up or 0), then organic top-8 excluding them
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_pinned_query_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["pinned_query"].sql).fetchall()
    score = dict(_match_set(con))
    model = [(1, 7, 1, score.get(7, 0)), (2, 3, 1, score.get(3, 0))]
    organic = sorted(
        ((d, s) for d, s in score.items() if d not in (7, 3)),
        key=lambda h: (-h[1], h[0]),
    )[:8]
    model += [(3 + i, d, 0, s) for i, (d, s) in enumerate(organic)]
    assert got == model


# ---------------------------------------------------------------------------
# terms_shard_error — oracle vs the ES shard-merge model: per-shard top-5 by
# local df, coordinator sum + worst-case bound from non-reporting shards
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_terms_shard_error_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["terms_shard_error"].sql).fetchall()
    local: dict[int, Counter] = {}
    for i, toks in enumerate(docs):
        for t in set(toks):
            local.setdefault(i % 4, Counter())[t] += 1
    reported: dict[int, dict[str, int]] = {}
    cutoff: dict[int, int] = {}
    for shard, cnt in local.items():
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        reported[shard] = dict(top)
        cutoff[shard] = min(c for _, c in top)
    total_cut = sum(cutoff.values())
    terms = {t for rep in reported.values() for t in rep}
    model = []
    for t in terms:
        df_est = sum(rep.get(t, 0) for rep in reported.values())
        covered = sum(cutoff[s] for s, rep in reported.items() if t in rep)
        model.append((t, df_est, total_cut - covered))
    model.sort(key=lambda r: (-r[1], r[0]))
    assert got == model[:10]
    # the published bound must actually bound the true df
    true_df = Counter(t for toks in docs for t in set(toks))
    for t, df_est, err in got:
        assert df_est <= true_df[t] <= df_est + err


# ---------------------------------------------------------------------------
# extended_stats_source — oracle vs exact-integer sufficient statistics
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_extended_stats_source_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["extended_stats_source"].sql).fetchall()
    per_src: dict[str, list[int]] = {}
    for i, toks in enumerate(docs):
        per_src.setdefault(f"src{i % 3}", []).append(len(toks))
    model = []
    for src in sorted(per_src):
        xs = per_src[src]
        n, sx, sq = len(xs), sum(xs), sum(x * x for x in xs)
        model.append(
            (src, n, sx, min(xs), max(xs),
             (sx * 1_000_000) // n,
             ((n * sq - sx * sx) * 1_000_000) // (n * n))
        )
    assert got == model


# ---------------------------------------------------------------------------
# percentile_ranks_doclen + heaps_law_source — exact integer share models
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_percentile_ranks_doclen_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["percentile_ranks_doclen"].sql).fetchall()
    per_src: dict[str, list[int]] = {}
    for i, toks in enumerate(docs):
        per_src.setdefault(f"src{i % 3}", []).append(len(toks))
    model = [
        (
            src,
            len(xs),
            (sum(x <= 30 for x in xs) * 1_000_000) // len(xs),
            (sum(x <= 60 for x in xs) * 1_000_000) // len(xs),
            (sum(x <= 90 for x in xs) * 1_000_000) // len(xs),
        )
        for src, xs in sorted(per_src.items())
    ]
    assert got == model


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_heaps_law_source_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["heaps_law_source"].sql).fetchall()
    per_src: dict[str, list[str]] = {}
    for i, toks in enumerate(docs):
        per_src.setdefault(f"src{i % 3}", []).extend(toks)
    model = []
    for src in sorted(per_src):
        toks = per_src[src]
        n, ty = len(toks), len(set(toks))
        model.append((src, n, ty, 0 if n == 0 else (ty * 1_000_000) // n))
    assert got == model


# ---------------------------------------------------------------------------
# string_stats_source — exact length stats + entropy within q6 rounding slack
# (same bound discipline as the session-12 entropy test: python round() is
# banker's, DuckDB's is half-away — each char contributes <= 1 micro-unit)
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_string_stats_source_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["string_stats_source"].sql).fetchall()
    per_src: dict[str, list[str]] = {}
    for i, toks in enumerate(docs):
        per_src.setdefault(f"src{i % 3}", []).extend(toks)
    model_rows = {src: toks for src, toks in per_src.items() if toks}
    assert [r[0] for r in got] == sorted(model_rows)
    for src, n_terms, min_len, max_len, avg_q6, ent_q6 in got:
        toks = model_rows[src]
        lens = [len(t) for t in toks]
        assert (n_terms, min_len, max_len) == (len(toks), min(lens), max(lens))
        assert avg_q6 == (sum(lens) * 1_000_000) // len(lens)
        chars = Counter(c for t in toks for c in t)  # tokens are [a-z0-9] only
        tot = sum(chars.values())
        h = sum(round(-(c / tot) * math.log(c / tot) * 1_000_000) for c in chars.values())
        assert abs(ent_q6 - h) <= len(chars)


# ---------------------------------------------------------------------------
# events_cum_derivative — oracle vs running-sum/lag model on generated events
# ---------------------------------------------------------------------------

_events_strategy = st.lists(
    st.tuples(st.sampled_from(["view", "click"]), st.integers(0, 9)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(evs=_events_strategy)
def test_events_cum_derivative_matches_model(evs):
    base = datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "event_id": range(len(evs)),
            "ts": [base + timedelta(days=d, minutes=i) for i, (_, d) in enumerate(evs)],
            "user_id": [i % 5 for i in range(len(evs))],
            "event_type": [t for t, _ in evs],
            "value": [1.0] * len(evs),
            "props": ["{}"] * len(evs),
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(REGISTRY["events_cum_derivative"].sql).fetchall()
    day0 = int(base.timestamp()) * 1_000_000 // 86_400_000_000
    counts: dict[tuple[str, int], int] = Counter(
        (t, day0 + d) for t, d in evs
    )
    model = []
    for etype in sorted({t for t, _ in evs}):
        days = sorted(d for t, d in counts if t == etype)
        cum, prev = 0, None
        for d in days:
            n = counts[(etype, d)]
            cum += n
            model.append((etype, d, n, cum, 0 if prev is None else n - prev))
            prev = n
    assert got == model
