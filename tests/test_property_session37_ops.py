"""Property-based semantics checks for the session-37 operators.

Models: a pure-Python first-order Markov transition counter (with
deliberate timestamp ties), a float32/sequential-fold numpy model of the
Matryoshka dim-truncation recall curve, and a pairs→degree cross-op
consistency check for the LSH degree histogram. DuckDB-only — ms per
example.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _TRUNC_DIMS


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _seq_dot(a: list[float], b: list[float]) -> float:
    # both engines fold left-to-right; numpy's pairwise summation flips
    # last-ulp roundings (session-22 rule)
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


# ---------------------------------------------------------------------------
# events_markov_transitions — oracle vs a Counter model; small ts range so
# hypothesis generates same-microsecond ties (event_id tiebreak must decide)
# ---------------------------------------------------------------------------

_event = st.tuples(
    st.integers(min_value=0, max_value=3),  # user_id
    st.integers(min_value=0, max_value=20),  # ts in micros (ties likely)
    st.sampled_from(["view", "click", "purchase"]),
)
_events_strategy = st.lists(_event, min_size=1, max_size=50)


@settings(max_examples=40, deadline=None)
@given(_events_strategy)
def test_markov_transitions_matches_model(evs):
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
    got = con.execute(REGISTRY["events_markov_transitions"].sql).fetchall()

    counts: Counter = Counter()
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for eid, (u, t, ty) in enumerate(evs):
        by_user.setdefault(u, []).append((t, eid, ty))
    for seq in by_user.values():
        seq.sort()  # (t, event_id) — the engines' lag-window order
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _), n in counts.items():
        tot[a] += n
    model = sorted(
        (a, b, n, (1_000_000 * n) // tot[a]) for (a, b), n in counts.items()
    )
    assert got == model
    # probability rows of one prev_type sum to ~1e6 (floor loss < n_next)
    for a in tot:
        s = sum(p for (pa_, _, _, p) in model if pa_ == a)
        k = sum(1 for (pa_, _, _, _) in model if pa_ == a)
        assert 1_000_000 - k < s <= 1_000_000


# ---------------------------------------------------------------------------
# ann_dim_truncation_curve — oracle vs a float32 sequential-fold model
# ---------------------------------------------------------------------------

_vec_pos = st.lists(
    st.integers(min_value=1, max_value=3_000_000).map(lambda i: i / 1e6),
    min_size=64,
    max_size=64,
)
# >= 12 rows so top-10 is a real cut; sometimes > 37 rows so a second
# query vector (vec_id 37) exists
_vecs_pos = st.lists(_vec_pos, min_size=12, max_size=45)


def _emb_con(vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), type=pa.int32()),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", tbl)
    return con


def _trunc_model(vecs):
    v32 = [np.array(v, dtype=np.float32).astype(np.float64).tolist() for v in vecs]
    qids = [i for i in range(len(v32)) if i % 37 == 0]
    topk: dict[int, dict[int, set]] = {d: {} for d in _TRUNC_DIMS}
    for d in _TRUNC_DIMS:
        for q in qids:
            qv = v32[q][:d]
            qn = math.sqrt(_seq_dot(qv, qv))
            scored = []
            for vid, v in enumerate(v32):
                av = v[:d]
                c = _seq_dot(av, qv) / (math.sqrt(_seq_dot(av, av)) * qn)
                scored.append((-_round_away(1_000_000 * c), vid))
            scored.sort()
            topk[d][q] = {vid for _, vid in scored[:10]}
    out = []
    for d in _TRUNC_DIMS:
        hits = sum(len(topk[d][q] & topk[64][q]) for q in qids)
        out.append((d, hits, 10 * len(qids), (1_000_000 * hits) // (10 * len(qids))))
    return out


@settings(max_examples=10, deadline=None)
@given(vecs=_vecs_pos)
def test_dim_truncation_matches_model(vecs):
    con = _emb_con(vecs)
    got = con.execute(REGISTRY["ann_dim_truncation_curve"].sql).fetchall()
    assert got == _trunc_model(vecs)
    # the d = 64 self-check row is exact-recall by construction
    d64 = [r for r in got if r[0] == 64]
    assert len(d64) == 1 and d64[0][1] == d64[0][2] and d64[0][3] == 1_000_000
    for _, n_hits, n_possible, _ in got:
        assert 0 <= n_hits <= n_possible


# ---------------------------------------------------------------------------
# lsh_degree_histogram — cross-op consistency: the histogram must be the
# degree distribution of minhash_lsh_pairs' own output on the same corpus
# ---------------------------------------------------------------------------

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30)
_corpus = st.lists(_doc, min_size=1, max_size=12)


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_lsh_degree_histogram_matches_pairs(docs):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    pairs = con.execute(REGISTRY["minhash_lsh_pairs"].sql).fetchall()
    got = con.execute(REGISTRY["lsh_degree_histogram"].sql).fetchall()
    deg: Counter = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    hist: Counter = Counter(deg.get(i, 0) for i in range(len(docs)))
    assert got == sorted(hist.items())
    # handshake lemma: total degree mass = 2 |pairs|; doc mass = corpus
    assert sum(d * n for d, n in got) == 2 * len(pairs)
    assert sum(n for _, n in got) == len(docs)


# ---------------------------------------------------------------------------
# user_activity_histogram — oracle vs a Counter model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(_events_strategy)
def test_user_activity_histogram_matches_model(evs):
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
    got = con.execute(REGISTRY["user_activity_histogram"].sql).fetchall()
    per_user: Counter = Counter(u for (u, _, _) in evs)
    hist: Counter = Counter(n.bit_length() - 1 for n in per_user.values())
    assert got == sorted(hist.items())
    assert sum(n for _, n in got) == len(per_user)


# ---------------------------------------------------------------------------
# lineitem_pricing_summary — oracle vs a cents-exact Python model (the money
# rounding happens per row with the engines' half-away rule, sums are ints)
# ---------------------------------------------------------------------------

_li_row = st.tuples(
    st.integers(min_value=1, max_value=50),  # quantity
    st.integers(min_value=100, max_value=10_000_000).map(lambda c: c / 100.0),
    st.integers(min_value=0, max_value=10).map(lambda b: b / 100.0),  # discount
    st.integers(min_value=0, max_value=8).map(lambda b: b / 100.0),  # tax
    st.sampled_from(["A", "N", "R"]),
    st.sampled_from(["F", "O"]),
    st.integers(min_value=0, max_value=2000),  # days from 1996-01-01
)
_li_rows = st.lists(_li_row, min_size=1, max_size=60)

_LI_EPOCH = pd.Timestamp("1996-01-01")
_LI_CUT_DAYS = (pd.Timestamp("1998-09-02") - _LI_EPOCH).days


@settings(max_examples=40, deadline=None)
@given(rows=_li_rows)
def test_lineitem_pricing_summary_matches_model(rows):
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(len(rows)),
            "l_partkey": [0] * len(rows),
            "l_suppkey": [0] * len(rows),
            "l_linenumber": [1] * len(rows),
            "l_quantity": [float(r[0]) for r in rows],
            "l_extendedprice": [r[1] for r in rows],
            "l_discount": [r[2] for r in rows],
            "l_tax": [r[3] for r in rows],
            "l_returnflag": [r[4] for r in rows],
            "l_linestatus": [r[5] for r in rows],
            "l_shipdate": [_LI_EPOCH + pd.Timedelta(days=r[6]) for r in rows],
        }
    )
    con = duckdb.connect()
    con.register("lineitem", pdf)
    got = con.execute(REGISTRY["lineitem_pricing_summary"].sql).fetchall()
    groups: dict[tuple, list[int]] = {}
    for q, p, d, t, rf, ls, days in rows:
        if days > _LI_CUT_DAYS:
            continue
        g = groups.setdefault((rf, ls), [0, 0, 0, 0, 0])
        g[0] += _round_away(100 * float(q))
        g[1] += _round_away(100 * p)
        # same left-assoc double products as both engines' shared expr
        g[2] += _round_away(100 * p * (1 - d))
        g[3] += _round_away(100 * p * (1 - d) * (1 + t))
        g[4] += 1
    model = sorted((rf, ls, *v) for (rf, ls), v in groups.items())
    assert got == model


# ---------------------------------------------------------------------------
# ivf_cluster_balance — conservation + bound invariants on the oracle output
# (Spark-vs-oracle equality is the contract test's job)
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(vecs=_vecs_pos)
def test_ivf_cluster_balance_invariants(vecs):
    con = _emb_con(vecs)
    got = con.execute(REGISTRY["ivf_cluster_balance"].sql).fetchall()
    # every member vector (vec_id <> 0) lands in exactly one cell
    assert sum(n for _, n, _, _ in got) == len(vecs) - 1
    for cid, n, inertia, worst in got:
        assert n >= 1 and worst <= 1_000_000
        # inertia >= the worst member's own gap, <= n * worst-gap
        assert (1_000_000 - worst) <= inertia <= n * (1_000_000 - worst)


# ---------------------------------------------------------------------------
# source_token_gini — oracle vs the sorted-formula Python model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_source_token_gini_matches_model(docs):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    got = con.execute(REGISTRY["source_token_gini"].sql).fetchall()
    per_src: Counter = Counter()
    for i, d in enumerate(docs):
        per_src[f"src{i % 3}"] += len(d)
    xs = sorted(per_src.values())
    n, tot = len(xs), sum(xs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    gini = (1_000_000 * num) // (n * tot) if tot else 0
    assert got == [(n, tot, gini)]
    assert 0 <= got[0][2] < 1_000_000


# ---------------------------------------------------------------------------
# orders_nation_revenue — oracle vs a cents-exact join model
# ---------------------------------------------------------------------------

_order = st.tuples(
    st.integers(min_value=0, max_value=9),  # custkey
    st.integers(min_value=100, max_value=5_000_000).map(lambda c: c / 100.0),
    st.integers(min_value=0, max_value=900),  # days from 1995-07-01
)
_orders_strategy = st.lists(_order, min_size=1, max_size=50)

_ORD_EPOCH = pd.Timestamp("1995-07-01")
_ORD_LO = (pd.Timestamp("1996-01-01") - _ORD_EPOCH).days
_ORD_HI = (pd.Timestamp("1997-01-01") - _ORD_EPOCH).days


@settings(max_examples=40, deadline=None)
@given(rows=_orders_strategy)
def test_orders_nation_revenue_matches_model(rows):
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(rows)),
            "o_custkey": [r[0] for r in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [r[1] for r in rows],
            "o_orderdate": [_ORD_EPOCH + pd.Timedelta(days=r[2]) for r in rows],
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": range(10),
            "c_name": [f"c{i}" for i in range(10)],
            "c_nationkey": [i % 4 for i in range(10)],
            "c_acctbal": [0.0] * 10,
            "c_mktsegment": ["BUILDING"] * 10,
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": range(4),
            "n_name": ["ALGERIA", "BRAZIL", "CANADA", "DENMARK"],
            "n_regionkey": [0, 1, 1, 2],
        }
    )
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("customer", customer)
    con.register("nation", nation)
    got = con.execute(REGISTRY["orders_nation_revenue"].sql).fetchall()
    groups: dict[str, list[int]] = {}
    names = ["ALGERIA", "BRAZIL", "CANADA", "DENMARK"]
    for ck, price, days in rows:
        if not (_ORD_LO <= days < _ORD_HI):
            continue
        g = groups.setdefault(names[ck % 4], [0, 0])
        g[0] += 1
        g[1] += _round_away(100 * price)
    assert got == sorted((nm, n, rev) for nm, (n, rev) in groups.items())


# ---------------------------------------------------------------------------
# rank_correlation_bm25_tfidf — bound invariants on random corpora, plus a
# constructed corpus where both rankings provably coincide (tau = +1)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(docs=_corpus)
def test_rank_correlation_invariants(docs):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    got = con.execute(REGISTRY["rank_correlation_bm25_tfidf"].sql).fetchall()
    assert len(got) == 1
    n_pairs, conc, disc, tau = got[0]
    assert conc + disc <= n_pairs  # rank-diff product is never 0 off-diagonal
    assert conc == disc or abs(tau) <= 1_000_000
    # n_pairs = k(k-1)/2 for the matched-doc count k <= 20
    ks = [k for k in range(21) if k * (k - 1) // 2 == n_pairs]
    assert ks, f"n_pairs {n_pairs} is not triangular"
    if n_pairs > 0:
        want = (
            (1_000_000 * (conc - disc)) // n_pairs
            if conc >= disc
            else -((1_000_000 * (disc - conc)) // n_pairs)
        )
        assert tau == want


def test_rank_correlation_identical_rankings_tau_one():
    # identical single-term docs of equal length: BM25 and tf-idf both
    # rank purely by doc_id, so every pair is concordant
    docs = [["spark", "hash", "join", "the"] for _ in range(8)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": ["s"] * len(docs),
            "lang": ["en"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    n_pairs, conc, disc, tau = con.execute(
        REGISTRY["rank_correlation_bm25_tfidf"].sql
    ).fetchall()[0]
    assert n_pairs == 28 and conc == 28 and disc == 0 and tau == 1_000_000
