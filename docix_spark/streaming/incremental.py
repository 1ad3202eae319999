"""Incremental index maintenance via Structured Streaming.

The reference's ingest is a RabbitMQ-driven micro-stream of single-document
tasks (publisher adapter/out/messaging/RabbitMQDocumentProcessingPublisher.java:27-37,
consumer adapter/in/messaging/DocumentProcessingMessageHandler.java:30-62,
at-least-once with manual ack). SURVEY.md §1.3/§2.9: batch + resume covers
the reference semantics; this module is the *streaming* equivalent for
continuously-arriving corpora — new corpus files dropped into a directory
(the idiomatic stand-in for the queue / an Iceberg append stream) are
tokenized and appended to the index incrementally.

Design (idiomatic Structured Streaming):

- ``spark.readStream.schema(...).parquet(dir)`` file source — each new file
  is discovered exactly once (source bookkeeping in the checkpoint dir; the
  streaming analogue of the manifest idempotency key).
- ``foreachBatch``: per micro-batch, run the SAME vectorized posting
  construction as the batch build (one code path, rank-identical results)
  and append bucket-clustered posting files; then refresh the derived
  stats tables (df/doclen/corpus) from the postings table — associative
  aggregates, so refresh = recompute over the appended table (cheap,
  column-pruned) and atomic-swap.
- Exactly-once: the checkpointLocation dedupes input files across restarts;
  per-batch postings land in ``postings/batch=<id>`` so a re-run of a
  failed batch overwrites its own directory (idempotent, like the
  reference's deterministic per-page ``_id`` upsert).

No watermarks/windows are needed — the reference has no temporal
semantics (SURVEY.md §2.9); this is append-only ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docix_spark.corpus import CORPUS_COLUMNS, FIELDS, with_doc_ids
from docix_spark.index.build import (
    DEFAULT_TERM_BUCKETS,
    Index,
    build_postings,
    ensure_parallelism,
    term_bucket,
)

CORPUS_SCHEMA = ", ".join(f"{c} string" for c in CORPUS_COLUMNS)


def _refresh_stats(spark: SparkSession, root: str, n_buckets: int) -> None:
    """Recompute df/doclen/corpus stats from the full postings table and
    atomically swap them in (associative aggs — always correct after any
    number of appends)."""
    postings = ensure_parallelism(
        spark.read.option("basePath", os.path.join(root, "postings")).parquet(
            os.path.join(root, "postings")
        ),
        spark,
    )
    df_stats = (
        postings.groupBy("field", "term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
    )
    df_stats.write.mode("overwrite").parquet(os.path.join(root, "df_stats"))
    from docix_spark.index.build import _write_term_dict

    _write_term_dict(spark, os.path.join(root, "df_stats"), os.path.join(root, "term_dict"))
    doc_stats = postings.groupBy("field", "doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len")
    )
    doc_stats.write.mode("overwrite").parquet(os.path.join(root, "doc_stats"))
    doc_stats = spark.read.parquet(os.path.join(root, "doc_stats"))
    doc_stats.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).write.mode("overwrite").parquet(os.path.join(root, "corpus_stats"))


def incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    checkpoint_dir: str | None = None,
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    available_now: bool = True,
):
    """Start (or continue) the incremental build over a corpus directory.

    With ``available_now=True`` (default) processes everything currently in
    ``input_dir`` and stops — the batch-resume usage. With False it keeps
    running on new files (the live-queue usage).

    Returns the StreamingQuery.
    """
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(index_root, "_stream_checkpoint")

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = with_doc_ids(batch_df).dropDuplicates(["doc_id"])
        # cross-batch idempotency probe: skip already-indexed content
        # (the reference's existsByDocumentId check before upload,
        # BulkUploadService.java:62-65 — SURVEY.md §2.3 J5)
        docs_root = os.path.join(index_root, "docs")
        prior = [
            os.path.join(docs_root, d)
            for d in (os.listdir(docs_root) if os.path.isdir(docs_root) else [])
            if d.startswith("batch=") and d != f"batch={batch_id}"
        ]
        if prior:
            seen = spark.read.parquet(*prior).select("doc_id")
            docs = docs.join(seen, "doc_id", "left_anti")
        docs.write.mode("overwrite").parquet(
            os.path.join(index_root, "docs", f"batch={batch_id}")
        )
        docs = spark.read.parquet(os.path.join(index_root, "docs", f"batch={batch_id}"))
        postings = build_postings(docs, fields=FIELDS).withColumn(
            "term_bucket", term_bucket(F.col("term"), n_buckets)
        )
        (
            postings.repartition(n_buckets, "term_bucket")
            .sortWithinPartitions("term_bucket", "term")
            .write.mode("overwrite")
            .parquet(os.path.join(index_root, "postings", f"batch={batch_id}"))
        )
        _refresh_stats(spark, index_root, n_buckets)

        # compressed-segment maintenance: if segments exist, append the
        # batch (stats-free block bounds keep old rows valid —
        # index/segments.extend_segments)
        if os.path.exists(os.path.join(index_root, "seg_meta.json")):
            from docix_spark.index.segments import SegmentIndex, extend_segments

            seg = SegmentIndex.load(index_root)
            batch_postings = spark.read.parquet(
                os.path.join(index_root, "postings", f"batch={batch_id}")
            )
            extend_segments(spark, seg, batch_postings)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    return q


class StreamingIndex(Index):
    """Index handle over the streaming layout (batch=N subdirs)."""

    def postings(self, spark: SparkSession) -> DataFrame:
        p = os.path.join(self.root, "postings")
        return spark.read.option("basePath", p).parquet(p).drop("batch")

    def docs(self, spark: SparkSession) -> DataFrame:
        p = os.path.join(self.root, "docs")
        df = spark.read.option("basePath", p).parquet(p).drop("batch")
        # a re-ingested doc (same content) may appear in several batches;
        # the deterministic doc_id collapses it, exactly like the
        # reference's _id upsert
        return df.dropDuplicates(["doc_id"])
