"""Property-based semantics checks for the session-8 sketch/graph operators
(cardinality_sketch, pagerank_ann_graph, decontamination_bloom).

Same methodology as test_property_pipeline_ops: drive the registered DuckDB
oracle SQL over hypothesis-generated inputs and compare against an
independent Python model, so a bug shared by the Spark and SQL twins cannot
hide behind the fixed driver corpus. DuckDB-only keeps each example at ms
cost; the Spark twin is pinned to the same SQL by test_driver_contract.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_WORDS = ["alpha", "beta", "gamma", "delta", "spark", "join", "hash", "x9", "scan"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _round_half_away(x: float) -> int:
    """DuckDB/Spark round(): ties away from zero (Python round() is
    half-even — using it would desync the model at exact .5 fractions)."""
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


# ---------------------------------------------------------------------------
# cardinality_sketch — HLL model must be bit-identical to the oracle
# ---------------------------------------------------------------------------

_HLL_CONST = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0


def _hll_model(docs: list[list[str]]) -> dict[str, tuple[int, int]]:
    by_src: dict[str, set] = {}
    for i, toks in enumerate(docs):
        src = f"src{i % 3}"
        for j in range(len(toks) - 2):
            by_src.setdefault(src, set()).add(" ".join(toks[j : j + 3]))
    out = {}
    for src, shingles in by_src.items():
        if not shingles:
            continue
        regs: dict[int, int] = {}
        for sh in shingles:
            h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16)
            reg, w = h % 256, h >> 8
            rnk = 53 if w == 0 else 53 - w.bit_length()
            regs[reg] = max(regs.get(reg, 0), rnk)
        zeros = 256 - len(regs)
        z_int = sum(1 << (53 - r) for r in regs.values()) + zeros * (1 << 53)
        e = _HLL_CONST / float(z_int)
        if e <= 640.0 and zeros > 0:
            e = 256.0 * math.log(256.0 / float(zeros))
        out[src] = (len(shingles), _round_half_away(e * 1_000_000.0))
    return out


@settings(max_examples=60, deadline=None)
@given(docs=_corpus)
def test_cardinality_sketch_oracle_matches_model(docs):
    con = _docs_con(docs)
    got = {
        r.source: (r.n_exact, r.hll_q6)
        for r in con.execute(REGISTRY["cardinality_sketch"].sql).fetch_df().itertuples()
    }
    assert got == _hll_model(docs)


def test_cardinality_sketch_accuracy_at_driver_scale():
    """At sf0.01 cardinalities (~1.1-1.5k per source) the p=8 estimate must
    land within the ~3/sqrt(256) ≈ 19 %% (3 sigma) HLL error band — the
    sketch is useless if it is merely deterministic."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'"
    )
    df = con.execute(REGISTRY["cardinality_sketch"].sql).fetch_df()
    assert len(df) > 0
    for r in df.itertuples():
        est = r.hll_q6 / 1_000_000.0
        assert abs(est - r.n_exact) / r.n_exact < 0.19, (r.source, r.n_exact, est)


# ---------------------------------------------------------------------------
# pagerank_ann_graph — integer power-iteration KERNEL vs Python model.
# The registry op derives its edges through the trained-IVF batch-ANN chain
# (already pinned by the ann_ivf_batch contract + recall tests); here the
# iteration CTEs the oracle unrolls (_pr_iter_sql) run over hypothesis-
# generated random directed graphs and must match a standalone model.
# ---------------------------------------------------------------------------

from docix_spark.driver_queries import _PR_ROUNDS, _pr_iter_sql

_edge_graph = st.integers(min_value=2, max_value=10).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).filter(lambda e: e[0] != e[1]),
            min_size=0,
            max_size=30,
            unique=True,
        ),
    )
)


def _pagerank_edges_model(n: int, edges: list, rounds: int) -> dict:
    deg: dict = {}
    for s_, _ in edges:
        deg[s_] = deg.get(s_, 0) + 1
    r = {i: 1_000_000 for i in range(n)}
    for _ in range(rounds):
        nxt = {i: 150_000 for i in range(n)}
        for s_, d in edges:
            nxt[d] += (r[s_] * 85) // (100 * deg[s_])
        r = nxt
    return r


@settings(max_examples=60, deadline=None)
@given(g=_edge_graph)
def test_pagerank_iteration_kernel_matches_model(g):
    n, edges = g
    con = duckdb.connect()
    con.register("nodes_in", pd.DataFrame({"doc_id": range(n)}))
    con.register(
        "edges_in",
        pd.DataFrame(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}, dtype="int64"
        ),
    )
    sql = (
        """WITH nodes AS (SELECT doc_id FROM nodes_in),
        edges AS (SELECT src, dst FROM edges_in),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
        + "".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ROUNDS))
        + f" SELECT doc_id, r FROM r{_PR_ROUNDS}"
    )
    got = {r.doc_id: r.r for r in con.execute(sql).fetch_df().itertuples()}
    model = _pagerank_edges_model(n, edges, _PR_ROUNDS)
    assert got == model
    # conservation sanity: floor division only loses mass, and every node
    # keeps the teleport floor
    assert all(v >= 150_000 for v in model.values())
    assert sum(model.values()) <= n * 1_000_000


def test_pagerank_ann_graph_invariants_at_driver_scale():
    """Full registry oracle at sf0.01: top-20 ranks respect the teleport
    floor, carry real (non-degenerate) hub spread, and stay under total
    mass. (Exact Spark==oracle equality is test_driver_contract's job.)"""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.01/embeddings.parquet'"
    )
    df = con.execute(REGISTRY["pagerank_ann_graph"].sql).fetch_df()
    assert len(df) == 20
    assert (df.pagerank_q6 >= 150_000).all()
    assert df.pagerank_q6.nunique() > 5  # hub spread, not a two-valued collapse


# ---------------------------------------------------------------------------
# decontamination_bloom — no false negatives, counts match the model
# ---------------------------------------------------------------------------


def _bloom_model(docs: list[list[str]]) -> dict[int, tuple[int, int]]:
    grams: dict[int, set] = {}
    for i, toks in enumerate(docs):
        grams[i] = {" ".join(toks[j : j + 8]) for j in range(len(toks) - 7)}
    ev = set().union(*(g for i, g in grams.items() if i % 29 == 0)) if grams else set()
    evpos = {
        int(hashlib.md5(g.encode()).hexdigest()[4 * j : 4 * j + 4], 16)
        for g in ev
        for j in range(4)
    }
    out = {}
    for i, gs in grams.items():
        if i % 29 == 0:
            continue
        cand = {
            g
            for g in gs
            if all(
                int(hashlib.md5(g.encode()).hexdigest()[4 * j : 4 * j + 4], 16) in evpos
                for j in range(4)
            )
        }
        out[i] = (len(cand), len(cand & ev))
    return out


@settings(max_examples=40, deadline=None)
@given(docs=_corpus, run=st.lists(st.sampled_from(_WORDS), min_size=8, max_size=10))
def test_decontamination_bloom_oracle_matches_model(docs, run):
    # plant the same >=8-token run into the eval doc (0) and a training doc
    # so the contaminated path is always exercised
    docs = [run + docs[0]] + list(docs[1:]) + [list(reversed(run)) + run]
    con = _docs_con(docs)
    got = {
        r.doc_id: (r.n_bloom, r.n_exact, r.n_false_pos)
        for r in con.execute(REGISTRY["decontamination_bloom"].sql).fetch_df().itertuples()
    }
    model = _bloom_model(docs)
    assert got == {i: (b, e, b - e) for i, (b, e) in model.items()}
    # the planted run guarantees the last doc shares a gram with eval doc 0:
    # Bloom filters have no false negatives, so n_exact > 0 there
    assert got[len(docs) - 1][1] > 0
