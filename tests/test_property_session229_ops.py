"""Session-229 operator checks (ivf_nlist_sweep, hybrid_weight_sweep).

DuckDB-only. Both ops are whole-chain compositions (trained k-means /
the BM25 leg), so the checks are cross-operator consistency against the
already-property-tested parents plus structural invariants, on the fixed
sandbox tables — the hybrid/nprobe-family convention."""

from __future__ import annotations

import duckdb
import pytest

from docix_spark.driver_queries import REGISTRY, _HWS_WEIGHTS, _KMEANS_K, _NLIST_KS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def test_ivf_nlist_sweep_invariants_and_k8_consistency(duck):
    rows = duck.execute(REGISTRY["ivf_nlist_sweep"].sql).fetchall()
    assert [r[0] for r in rows] == list(_NLIST_KS)
    n_q = rows[0][1]
    for nlist, nq, ov, rec, scan in rows:
        assert nq == n_q  # same query batch per K
        assert 0 <= ov <= 10 * nq
        assert rec == (1_000_000 * ov) // (10 * nq)
        assert scan >= 1
    # more cells -> fewer candidates scanned per query (3/K of the data)
    scans = [r[4] for r in rows]
    assert scans == sorted(scans, reverse=True)
    # K=8 row must agree with ann_ivf_batch_recall's per-query overlaps
    k8 = next(r for r in rows if r[0] == _KMEANS_K)
    per_q = duck.execute(REGISTRY["ann_ivf_batch_recall"].sql).fetchall()
    assert k8[2] == sum(n for _, n in per_q)
    assert k8[1] == len(per_q)


def test_hybrid_weight_sweep_invariants_and_w07_consistency(duck):
    rows = duck.execute(REGISTRY["hybrid_weight_sweep"].sql).fetchall()
    assert [r[0] for r in rows] == list(_HWS_WEIGHTS)
    for w, nl, nv, top1 in rows:
        # every page slot is covered by at least one leg
        assert nl + nv >= 10
        assert 0 <= nl <= 10 and 0 <= nv <= 10
    # the lexical share of the page moves with the lexical weight
    nls = [r[1] for r in rows]
    assert nls == sorted(nls)
    # w=0.7 is exactly hybrid_linear_search's configuration: same top-1
    parent = duck.execute(REGISTRY["hybrid_linear_search"].sql).fetchall()
    w7 = next(r for r in rows if r[0] == 700_000)
    assert w7[3] == parent[0][0]
