"""Session-237 checks (shard_topk_fetch_curve, score_tie_census).
DuckDB-only; the fetch-curve invariants are the distributed-top-k
guarantees themselves."""

from __future__ import annotations

import duckdb
import pytest

from docix_spark.driver_queries import REGISTRY, _STF_FETCHES, _STF_SHARDS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    yield con
    con.close()


def test_shard_topk_fetch_curve_guarantees(duck):
    rows = duck.execute(REGISTRY["shard_topk_fetch_curve"].sql).fetchall()
    assert [r[0] for r in rows] == sorted(_STF_FETCHES)
    for fk, s, true_k, ov, fetched in rows:
        assert s == _STF_SHARDS
        assert 0 <= ov <= true_k <= 10
        assert fetched <= s * fk
    # THE guarantee: fetch_k >= k makes the shard merge exact
    exact_row = next(r for r in rows if r[0] == 10)
    assert exact_row[3] == exact_row[2]
    # overlap is monotone in fetch_k (per-shard tops nest)
    ovs = [r[3] for r in rows]
    assert ovs == sorted(ovs)
    # fetched rows are monotone and nested too
    fts = [r[4] for r in rows]
    assert fts == sorted(fts)


def test_score_tie_census_consistency(duck):
    (n_docs, n_scores, max_tie, in_ties, boundary) = duck.execute(
        REGISTRY["score_tie_census"].sql
    ).fetchall()[0]
    assert 1 <= n_scores <= n_docs
    assert 1 <= max_tie <= n_docs
    # docs inside ties never include singleton groups
    assert 0 <= in_ties <= n_docs and in_ties != 1
    # if any tie exists, the distinct count must drop below n_docs
    assert (in_ties > 0) == (n_scores < n_docs)
    # excess multiplicity identity: ties contribute exactly the gap
    assert in_ties == 0 or in_ties - (n_docs - n_scores) >= 1
    if n_docs >= 10:
        assert boundary >= 1  # the boundary score exists, so its group does
    else:
        assert boundary == 0
