"""Property-based semantics checks for the session-10 operators.

Same methodology as test_property_pipeline_ops: drive the registered
DuckDB oracle SQL over hypothesis-generated inputs and compare against an
independent Python model, so a bug shared by the Spark and SQL twins
(written together) cannot hide behind the fixed corpus. DuckDB-only keeps
each example at ms cost; the Spark twin is pinned to the same SQL by the
hash-equality tests in test_driver_contract.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _SQL_LSH_PAIRS, _SQL_UNI_MEAN, REGISTRY

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


# ---------------------------------------------------------------------------
# bigram_lm_surprisal — oracle vs an add-1 bigram LM model
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_bigram_lm_oracle_matches_python(docs):
    con = _con(docs)
    got = {
        r.doc_id: r
        for r in con.execute(REGISTRY["bigram_lm_surprisal"].sql).fetch_df().itertuples()
    }
    bt: dict[int, Counter] = {}
    bc: Counter = Counter()
    for i, toks in enumerate(docs):
        if len(toks) >= 2:
            c = Counter(zip(toks, toks[1:]))
            bt[i] = c
            bc.update(c)
    assert set(got) == set(bt)
    if not bc:
        return
    cx: Counter = Counter()
    for (w1, _), c in bc.items():
        cx[w1] += c
    vocab = len({w2 for (_, w2) in bc})
    nlp = {
        p: round(-math.log((c + 1) / (cx[p[0]] + vocab)) * 1_000_000)
        for p, c in bc.items()
    }
    for i, c in bt.items():
        r = got[i]
        n = sum(c.values())
        assert r.n_bigrams == n
        expect = sum(tf * nlp[p] for p, tf in c.items())
        # libm vs DuckDB ln may differ in the last ulp per model entry
        assert abs(r.surprisal_q6 - expect) <= n
        assert r.mean_nlp_q6 == r.surprisal_q6 // n


# ---------------------------------------------------------------------------
# perplexity_buckets — tercile assignment over the oracle's OWN per-doc
# means (re-deriving the means in Python would be libm-ulp-sensitive and
# is already covered by the unigram_logprob property test)
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_perplexity_buckets_matches_rank_model(docs):
    con = _con(docs)
    means = con.execute(_SQL_UNI_MEAN + " SELECT * FROM m").fetchall()
    got = con.execute(REGISTRY["perplexity_buckets"].sql).fetchall()
    by_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, source, mean in means:
        by_src.setdefault(source, []).append((mean, doc_id))
    model: dict[tuple[str, int], list[int]] = {}
    for source, rows in by_src.items():
        rows.sort()
        n = len(rows)
        for rnk, (mean, _) in enumerate(rows, start=1):
            model.setdefault((source, (rnk - 1) * 3 // n), []).append(mean)
    want = sorted(
        (src, b, len(ms), min(ms), max(ms)) for (src, b), ms in model.items()
    )
    assert got == want
    # buckets partition each source into contiguous, ordered ranges
    for src in by_src:
        bks = [r for r in got if r[0] == src]
        assert [r[1] for r in bks] == sorted(r[1] for r in bks)
        for a, b in zip(bks, bks[1:]):
            assert a[4] <= b[3]  # max of lower bucket <= min of next


# ---------------------------------------------------------------------------
# function_score_decay — oracle vs the ES linear-decay formula in exact
# integer math
# ---------------------------------------------------------------------------

_S_US = 14 * 86_400_000_000

_event = st.tuples(
    st.integers(min_value=0, max_value=30 * 86_400_000_000),  # ts micros
    st.sampled_from(["view", "purchase"]),
    st.integers(min_value=0, max_value=50_000),  # value cents
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_event, min_size=1, max_size=40))
def test_function_score_decay_matches_model(evs):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(evs)),
            "ts": pd.to_datetime([e[0] for e in evs], unit="us"),
            "event_type": [e[1] for e in evs],
            "value": [e[2] / 100.0 for e in evs],
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(REGISTRY["function_score_decay"].sql).fetchall()
    origin = max(e[0] for e in evs)
    model = []
    for eid, (t, typ, cents) in enumerate(evs):
        if typ != "purchase":
            continue
        age = origin - t
        decay_q6 = (1_000_000 * max(0, _S_US - age)) // _S_US
        model.append((eid, cents, age, decay_q6, cents * decay_q6))
    model.sort(key=lambda r: (-r[4], r[0]))
    assert got == model[:20]
    # the decay is within [0, 1e6] and anti-monotone in age
    for _, _, age, dq6, _ in model:
        assert 0 <= dq6 <= 1_000_000
        assert (age >= _S_US) == (dq6 == 0)


# ---------------------------------------------------------------------------
# orders_date_histogram — oracle vs a pandas month-bucket model
# ---------------------------------------------------------------------------

_order = st.tuples(
    st.integers(min_value=0, max_value=3 * 365),  # days since 1992-01-01
    st.integers(min_value=1, max_value=60_000_000),  # cents
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_order, min_size=1, max_size=60))
def test_orders_date_histogram_matches_model(orders):
    base = pd.Timestamp("1992-01-01")
    pdf = pd.DataFrame(
        {
            "o_orderdate": [base + pd.Timedelta(days=d) for d, _ in orders],
            "o_totalprice": [c / 100.0 for _, c in orders],
        }
    )
    con = duckdb.connect()
    con.register("orders", pdf)
    got = con.execute(REGISTRY["orders_date_histogram"].sql).fetchall()
    buckets: dict[int, list[int]] = {}
    for d, c in orders:
        ts = base + pd.Timedelta(days=d)
        month_epoch = int(ts.to_period("M").to_timestamp().timestamp())
        buckets.setdefault(month_epoch, []).append(c)
    want = sorted(
        (m, len(cs), sum(cs), min(cs), max(cs), 1_000_000 * sum(cs) // len(cs))
        for m, cs in buckets.items()
    )
    assert got == want


# ---------------------------------------------------------------------------
# minhash_cluster_stats — histogram + singleton accounting vs union-find
# over the oracle's own candidate-pair graph
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_minhash_cluster_stats_matches_union_find(docs):
    con = _con(docs)
    pairs = con.execute(_SQL_LSH_PAIRS + " SELECT doc_a, doc_b FROM pairs").fetchall()
    got = con.execute(REGISTRY["minhash_cluster_stats"].sql).fetchall()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    sizes: Counter = Counter(find(x) for x in parent)
    hist: Counter = Counter(sizes.values())
    singles = len(docs) - len(parent)
    if singles > 0:
        hist[1] += singles
    assert got == sorted(hist.items())
    # total docs are conserved across the histogram
    assert sum(s * n for s, n in got) == len(docs)
