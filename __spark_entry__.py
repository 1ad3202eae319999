"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: builds the real inverted index (vectorized
  mapInPandas posting construction, term-bucketed parquet postings,
  df/doclen/corpus stats) from the sf0.001 documents table, then runs the
  full composite BM25 search (best_fields 5/3/3, fuzzy AUTO, msm 50%,
  wildcard fallback — the query tree of reference
  ElasticsearchDocumentSearchAdapter.java:394-440).
- ``queries()`` / ``oracle_sql()`` — one entry per implemented operator
  from SURVEY.md §2 plus the training-data-pipeline ops, each paired with
  DuckDB-runnable ANSI SQL (see docix_spark.driver_queries for the
  cross-engine determinism rules: shared Unicode tokenizer regex
  (literal-codepoint classes, identical in re/Java/RE2), *_q6 micro-unit
  integers for float outputs, rounded-score rank tiebreaks).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from docix_spark.driver_queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from docix_spark.corpus import from_driver_documents
    from docix_spark.index.build import build_index
    from docix_spark.query.bm25 import search_topk

    corpus = from_driver_documents(spark, "/root/testdata/sf0.001")
    idx_dir = os.path.join(tempfile.gettempdir(), "docix_entry_idx")
    index = build_index(spark, corpus, idx_dir, n_buckets=16)
    result = search_topk(spark, index, "spark hash join", page=0, size=10)
    return result.select(
        "rank", "doc_id", F.round("score", 6).alias("score"), "repo", "path", "lang"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: dq.fn for name, dq in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; rows-only ops are omitted."""
    return {name: dq.sql for name, dq in REGISTRY.items() if dq.sql is not None}
