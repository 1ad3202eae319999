"""docix_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-implements the query and data-processing capabilities of the reference
(JoshuaPangaribuan/DocIx, a Spring Boot service that delegates indexing and
BM25 retrieval to Elasticsearch 8.12) as an idiomatic Spark engine:

- vectorized Arrow/pandas tokenization + posting-list construction
  (no per-row Python),
- term-partitioned segment build with delta-gap + varint compression and
  block-max metadata,
- document-frequency / doc-length statistics tables for BM25
  (k1=1.2, b=0.75 — the ES defaults DocIx inherits, see
  reference ElasticsearchDocumentSearchAdapter.java:249-262),
- top-k ranked retrieval with block-max WAND pruning, rank-identical to the
  reference semantics (score desc, doc_id asc — SearchAdapter.java:448-449),
- resumable builds with per-partition checkpoint/lineage/metrics, mirroring
  the reference's indexing_log / indexing_page_log state machine
  (db/migration/V3__Create_indexing_log_table.sql).

Everything here derives from public knowledge only: the PySpark API, the
reference repo's observable behavior, and published IR techniques.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
