"""Property-based semantics checks for the session-170 operators.

Models: the Wilson interval expression against a float model, and the
cross-modal dup-consistency counters with planted identical texts and
controlled embeddings. prf_method_overlap rides the shared BM25 chain
(driver-contract territory). DuckDB-only (ms per example).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=35, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    k_frac=st.integers(min_value=0, max_value=100),
)
def test_wilson_interval_algebra(n, k_frac):
    k = min(n, (n * k_frac) // 100)
    con = duckdb.connect()
    got = con.execute(
        f"""WITH p AS (SELECT CAST({n} AS DOUBLE) AS n,
                   CAST({k} AS DOUBLE) / {n} AS p)
SELECT CAST(round(1000000 * (((p + 3.8416e0 / (2 * n))
       - 1.96e0 * sqrt(p * (1 - p) / n + 3.8416e0 / (4 * n * n)))
       / (1 + 3.8416e0 / n))) AS BIGINT),
       CAST(round(1000000 * (((p + 3.8416e0 / (2 * n))
       + 1.96e0 * sqrt(p * (1 - p) / n + 3.8416e0 / (4 * n * n)))
       / (1 + 3.8416e0 / n))) AS BIGINT)
FROM p"""
    ).fetchall()[0]

    nn = float(n)
    p = float(k) / n
    z2 = 3.8416
    z = 1.96
    center = p + z2 / (2 * nn)
    half = z * math.sqrt(p * (1 - p) / nn + z2 / (4 * nn * nn))
    denom = 1 + z2 / nn
    lo = _round_away(1000000 * ((center - half) / denom))
    hi = _round_away(1000000 * ((center + half) / denom))
    assert got == (lo, hi)
    assert 0 <= lo <= hi <= 1000000 or n < 4  # bounds sanity at modest n


_comp = st.integers(min_value=-16, max_value=16).map(lambda k: k / 32)
_vec = st.lists(_comp, min_size=4, max_size=4).filter(
    lambda v: any(x != 0 for x in v)
)


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.sampled_from(["aa bb", "cc dd", "ee ff"]), min_size=2, max_size=10
    ),
    share_vec=st.booleans(),
    vecs=st.data(),
)
def test_dup_consistency_matches_model(texts, share_vec, vecs):
    n = len(texts)
    base = [vecs.draw(_vec) for _ in range(n)]
    if share_vec:
        # make text-dups share embeddings → consistent pairs
        first_idx: dict[str, int] = {}
        for i, t in enumerate(texts):
            if t in first_idx:
                base[i] = base[first_idx[t]]
            else:
                first_idx[t] = i
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(n), "text": texts}),
    )
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(n),
                "embedding": [np.asarray(v, dtype=np.float32) for v in base],
            }
        ),
    )
    got = con.execute(
        REGISTRY["text_embedding_dup_consistency"].sql
    ).fetchall()[0]

    fv = [[float(np.float32(x)) for x in v] for v in base]

    def cosq(a, b):
        d = na = nb = 0.0
        for x, y in zip(fv[a], fv[b]):
            d += x * y
            na += x * x
            nb += y * y
        return _round_away(1000000 * (d / (math.sqrt(na) * math.sqrt(nb))))

    from collections import defaultdict

    groups = defaultdict(list)
    for i, t in enumerate(texts):
        groups[t].append(i)
    pairs = [
        (a, b)
        for ids in groups.values()
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    ]
    npairs = len(pairs)
    ncons = sum(1 for a, b in pairs if cosq(a, b) >= 999000)
    rate = 0 if npairs == 0 else (1000000 * ncons) // npairs
    assert got == (npairs, ncons, rate)
