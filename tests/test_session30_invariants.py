"""Session-30 invariants: the nprobe curve's recall must be monotone
nondecreasing (candidate sets nest as nprobe grows, and every exact-top-10
member present in a candidate set necessarily ranks inside that set's
top-10 — anything beating it is also exact-top-10), and the export sink
round-trips into an index that searches identically to one built from
the original parquet."""

from __future__ import annotations

import duckdb

from docix_spark.driver_queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_nprobe_recall_monotone():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    rows = con.execute(REGISTRY["ann_ivf_nprobe_curve"].sql).fetchall()
    assert [r[0] for r in rows] == [1, 2, 3]
    recalls = [r[3] for r in rows]
    assert recalls == sorted(recalls)
    # overlap never exceeds 10 per query
    for _, n_queries, sum_overlap, _ in rows:
        assert 0 <= sum_overlap <= 10 * n_queries


def test_index_from_reimported_shards_searches_identically(spark, tmp_root):
    from docix_spark.corpus import from_driver_documents
    from docix_spark.export import read_training_shards, write_training_shards
    from docix_spark.index.build import build_index
    from docix_spark.query.bm25 import search_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "lang", "text", "n_chars"
    )
    out = f"{tmp_root}/loop_shards"
    write_training_shards(docs, out, n_shards=4)
    back = read_training_shards(spark, out).select(
        "doc_id", "source", "lang", "text", "n_chars"
    )
    back.coalesce(2).write.mode("overwrite").parquet(
        f"{tmp_root}/loopsf/documents.parquet"
    )

    idx_a = build_index(
        spark, from_driver_documents(spark, SF_DIR), f"{tmp_root}/idx_orig", n_buckets=8
    )
    idx_b = build_index(
        spark,
        from_driver_documents(spark, f"{tmp_root}/loopsf"),
        f"{tmp_root}/idx_loop",
        n_buckets=8,
    )
    for q in ["spark hash join", "fast window scan"]:
        a = [(r.doc_id, r.rank, r.score) for r in search_topk(spark, idx_a, q, size=10).collect()]
        b = [(r.doc_id, r.rank, r.score) for r in search_topk(spark, idx_b, q, size=10).collect()]
        assert a == b and len(a) > 0
