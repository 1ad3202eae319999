"""Checkpointed, resumable index build — M2 of SURVEY.md §7.1.

Mirrors the reference's build-state ledger and retry semantics natively in
Spark:

- ``indexing_log`` / ``indexing_page_log`` (reference
  db/migration/V3__Create_indexing_log_table.sql:2-46, domain
  IndexingLog.java:12-37, IndexingPageLog.java:10-31) become a per-partition
  **build manifest** parquet table: one row per (build partition, attempt)
  with status PENDING/INDEXED/FAILED, timestamps, retry count, error message,
  and per-task metrics (docs, postings, bytes_in, bytes_out, docs_per_sec,
  postings_per_sec) — the north rule's "resumable from per-partition
  checkpoints with lineage and metrics recorded per task".
- The unique idempotency key ``(indexing_log_id, page_number)``
  (V3...sql:39-40) becomes ``(build_id, partition_id)`` with
  latest-attempt-wins resolution.
- The retry scheduler's selection of failed logs
  (IndexingRetryScheduler.java:27-36 → IndexingLogJpaRepository.java:22-24,
  ``maxRetry=3`` DocumentIndexingService.java:47-48) becomes
  :func:`resume_build`, which re-runs only partitions whose latest status is
  not INDEXED and whose attempt count is below ``max_retry``.
- The FULLY/PARTIALLY/FAILED rollup (DocumentIndexingService.java:250-259,
  IndexingLog.updateOverallStatus IndexingLog.java:126-136) becomes
  :func:`overall_status` over the manifest.

Execution model (scale design)
------------------------------
Documents are assigned to ``n_parts`` deterministic build partitions by
``pmod(xxhash64(doc_id), n_parts)`` — stable across runs and across cluster
sizes, so a resume at different parallelism re-processes exactly the pending
document set. One Spark job processes *all pending partitions at once*
(``groupBy(build_part).applyInPandas``): each task tokenizes its slice
vectorized (no per-row Python), writes its own posting-fragment parquet file
``fragments/part=<p>/`` via pyarrow (an independent, idempotent,
partition-granular sink — the Spark analogue of the reference's
deterministic per-page ``_id`` upsert, SearchAdapter.java:118,311), and
returns its manifest row. A task failure is caught inside the task and
reported as a FAILED manifest row — the job completes, later partitions are
unaffected, exactly like the reference's per-page loop
(DocumentIndexingService.java:218-266).

Fragments are doc-partitioned; the term-partitioned shuffle + compressed
segment build (M3/M4) reads them downstream (docix_spark.index.segments).
The per-row invariant ``doc_id = sha2(content, 256)`` is carried through and
each manifest row records ``input_sha`` = sha256 over the partition's sorted
doc_ids (lineage: which exact inputs produced this fragment).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docix_spark.corpus import FIELDS, with_doc_ids
from docix_spark.index.build import (
    DEFAULT_TERM_BUCKETS,
    Index,
    _postings_for_batch,
    _write_bucketed,
    term_bucket,
)

# Page/partition status values — reference V3...sql:37-38 / PageStatus enum.
PENDING = "PENDING"
INDEXED = "INDEXED"
FAILED = "FAILED"

# Rollup statuses — reference V3...sql:15-16 / IndexingStatus enum.
FULLY_INDEXED = "FULLY_INDEXED"
PARTIALLY_INDEXED = "PARTIALLY_INDEXED"
ROLLUP_FAILED = "FAILED"

MAX_RETRY = 3  # reference DocumentIndexingService.java:47-48

MANIFEST_SCHEMA = (
    "build_id string, partition_id int, status string, attempt int, "
    "started_at double, finished_at double, docs long, postings long, "
    "bytes_in long, bytes_out long, docs_per_sec double, "
    "postings_per_sec double, input_sha string, error string"
)


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "manifest")


def _fragments_dir(root: str) -> str:
    return os.path.join(root, "fragments")


def read_manifest(spark: SparkSession, root: str) -> DataFrame:
    """All manifest rows ever written (append-only ledger)."""
    return spark.read.parquet(_manifest_dir(root))


def latest_manifest(spark: SparkSession, root: str) -> DataFrame:
    """Latest attempt per partition — the current build state.

    Latest-attempt-wins over the append-only ledger implements the unique
    (log_id, page_number) upsert of the reference (V3...sql:39-40).
    """
    w = Window.partitionBy("partition_id").orderBy(
        F.desc("attempt"), F.desc("finished_at")
    )
    return (
        read_manifest(spark, root)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def overall_status(spark: SparkSession, root: str) -> str:
    """FULLY_INDEXED / PARTIALLY_INDEXED / FAILED rollup
    (reference DocumentIndexingService.java:250-259)."""
    counts = {
        r["status"]: r["n"]
        for r in latest_manifest(spark, root).groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    ok = counts.get(INDEXED, 0)
    bad = sum(v for k, v in counts.items() if k != INDEXED)
    if bad == 0 and ok > 0:
        return FULLY_INDEXED
    if ok > 0:
        return PARTIALLY_INDEXED
    return ROLLUP_FAILED


def indexing_progress(spark: SparkSession, root: str) -> float:
    """pages_indexed / total_pages (reference IndexingLog.java:170-173)."""
    m = latest_manifest(spark, root)
    total = m.count()
    if total == 0:
        return 0.0
    return m.where(F.col("status") == INDEXED).count() / total


@dataclass
class CheckpointedBuild:
    """Handle to a resumable build directory.

    Layout under ``root``::

        docs/                  doc_id-deduped corpus (metadata + content)
        fragments/part=<p>/    doc-partitioned posting fragments (parquet)
        manifest/              append-only per-(partition, attempt) ledger
        postings/ df_stats/ doc_stats/ corpus_stats/   (finalized tables)
    """

    root: str
    build_id: str
    n_parts: int
    n_buckets: int = DEFAULT_TERM_BUCKETS


def _write_fragment(pdf: pd.DataFrame, frag_dir: str, part: int) -> int:
    """Idempotent per-partition sink: one parquet file per build partition,
    full overwrite on retry. Returns bytes written."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    part_dir = os.path.join(frag_dir, f"part={part}")
    os.makedirs(part_dir, exist_ok=True)
    out_path = os.path.join(part_dir, "fragment.parquet")
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, out_path, compression="zstd")
    return os.path.getsize(out_path)


def _build_task(
    frag_dir: str,
    build_id: str,
    attempts: dict[int, int],
    fields: tuple[str, ...],
    fail_hook: Callable[[int, int], None] | None,
):
    """Returns the applyInPandas function for one build partition.

    ``fail_hook(partition_id, attempt)`` may raise to simulate task failure
    (kill-resume tests); real failures are equally caught and ledgered.
    """

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(key[0])
        attempt = attempts.get(part, 0) + 1
        t0 = time.time()
        row = {
            "build_id": build_id,
            "partition_id": part,
            "status": FAILED,
            "attempt": attempt,
            "started_at": t0,
            "finished_at": t0,
            "docs": 0,
            "postings": 0,
            "bytes_in": 0,
            "bytes_out": 0,
            "docs_per_sec": 0.0,
            "postings_per_sec": 0.0,
            "input_sha": "",
            "error": None,
        }
        try:
            if fail_hook is not None:
                fail_hook(part, attempt)
            # lineage: exactly which inputs produced this fragment
            ids = sorted(pdf["doc_id"].tolist())
            row["input_sha"] = hashlib.sha256("\n".join(ids).encode()).hexdigest()
            row["docs"] = len(pdf)
            row["bytes_in"] = int(pdf["content"].str.len().sum())
            out = _postings_for_batch(pdf, fields, positions_field="content")
            row["postings"] = len(out)
            row["bytes_out"] = _write_fragment(out, frag_dir, part)
            dt = max(time.time() - t0, 1e-9)
            row.update(
                status=INDEXED,
                finished_at=time.time(),
                docs_per_sec=row["docs"] / dt,
                postings_per_sec=row["postings"] / dt,
            )
        except Exception as exc:  # ledger the failure, don't fail the job
            row["error"] = f"{type(exc).__name__}: {exc}"[:500]
            row["finished_at"] = time.time()
        return pd.DataFrame([row])

    return run


def _append_manifest(spark: SparkSession, root: str, rows_df: DataFrame) -> None:
    rows_df.write.mode("append").parquet(_manifest_dir(root))


def start_build(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    n_parts: int = 32,
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    fields: tuple[str, ...] = FIELDS,
    fail_hook: Callable[[int, int], None] | None = None,
) -> CheckpointedBuild:
    """Begin a checkpointed build: persist docs, seed PENDING manifest rows
    for every partition (reference initializes per-page PENDING rows before
    the page loop, DocumentIndexingService.java:111-119), then run attempt 1.
    """
    build_id = uuid.uuid4().hex[:12]
    # full rebuild writes plain-named dirs — reset manifest pointers left
    # by earlier compact/merge swaps over this root (index.manifest)
    from docix_spark.index.manifest import clear_table

    if os.path.isdir(root):
        clear_table(
            root, "docs", "postings", "df_stats", "term_dict",
            "doc_stats", "corpus_stats", "tombstones", "trigram_postings",
        )
    docs = with_doc_ids(corpus).dropDuplicates(["doc_id"]).withColumn(
        "build_part", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int")
    )
    docs.write.mode("overwrite").parquet(os.path.join(root, "docs"))

    with open(os.path.join(root, "build.json"), "w") as fh:
        json.dump(
            {"build_id": build_id, "n_parts": n_parts, "n_buckets": n_buckets,
             "fields": list(fields)},
            fh,
        )

    now = time.time()
    pending = spark.createDataFrame(
        [
            (build_id, p, PENDING, 0, now, now, 0, 0, 0, 0, 0.0, 0.0, "", None)
            for p in range(n_parts)
        ],
        MANIFEST_SCHEMA,
    )
    _append_manifest(spark, root, pending)

    build = CheckpointedBuild(root=root, build_id=build_id, n_parts=n_parts, n_buckets=n_buckets)
    _run_pending(spark, build, fields=fields, fail_hook=fail_hook)
    return build


def load_build(root: str) -> CheckpointedBuild:
    with open(os.path.join(root, "build.json")) as fh:
        meta = json.load(fh)
    return CheckpointedBuild(
        root=root, build_id=meta["build_id"], n_parts=meta["n_parts"],
        n_buckets=meta.get("n_buckets", DEFAULT_TERM_BUCKETS),
    )


def _run_pending(
    spark: SparkSession,
    build: CheckpointedBuild,
    fields: tuple[str, ...] = FIELDS,
    fail_hook: Callable[[int, int], None] | None = None,
    max_retry: int = MAX_RETRY,
) -> list[int]:
    """One build pass over every partition whose latest status != INDEXED
    and attempt < max_retry. Returns the partition ids processed."""
    latest = latest_manifest(spark, build.root).select("partition_id", "status", "attempt")
    todo = latest.where((F.col("status") != INDEXED) & (F.col("attempt") < max_retry))
    pending = {int(r.partition_id): int(r.attempt) for r in todo.collect()}
    if not pending:
        return []

    docs = spark.read.parquet(os.path.join(build.root, "docs"))
    slice_df = docs.where(F.col("build_part").isin(sorted(pending)))
    task = _build_task(
        _fragments_dir(build.root), build.build_id, pending, tuple(fields), fail_hook
    )
    manifest_rows = slice_df.groupBy("build_part").applyInPandas(task, schema=MANIFEST_SCHEMA)
    # Materialize via the manifest append itself — one job, tasks write
    # fragments as a side-channel sink and return their ledger rows.
    _append_manifest(spark, build.root, manifest_rows)

    # Partitions no document hashed into produce no group → ledger them as
    # trivially INDEXED (0 docs) so the rollup can reach FULLY_INDEXED.
    seen = {
        int(r.partition_id)
        for r in latest_manifest(spark, build.root)
        .where(F.col("attempt") > 0)
        .select("partition_id")
        .collect()
    }
    empty = [p for p in pending if p not in seen]
    if empty:
        now = time.time()
        sha_empty = hashlib.sha256(b"").hexdigest()
        rows = [
            (build.build_id, p, INDEXED, pending[p] + 1, now, now, 0, 0, 0, 0,
             0.0, 0.0, sha_empty, None)
            for p in empty
        ]
        _append_manifest(spark, build.root, spark.createDataFrame(rows, MANIFEST_SCHEMA))
    return sorted(pending)


def resume_build(
    spark: SparkSession,
    root: str,
    fail_hook: Callable[[int, int], None] | None = None,
    max_retry: int = MAX_RETRY,
) -> list[int]:
    """Re-run only non-INDEXED partitions (reference retry path:
    IndexingRetryScheduler.java:27-36 → DocumentIndexingService.java:361-378,
    selection IndexingLogJpaRepository.java:22-24)."""
    build = load_build(root)
    with open(os.path.join(root, "build.json")) as fh:
        fields = tuple(json.load(fh).get("fields", FIELDS))
    return _run_pending(spark, build, fields=fields, fail_hook=fail_hook, max_retry=max_retry)


def finalize_index(spark: SparkSession, root: str) -> Index:
    """Derive the queryable index tables from the INDEXED fragments.

    Reads only fragments belonging to partitions whose latest manifest status
    is INDEXED (a FAILED partition's half-written file is never picked up),
    then writes the same table layout as build.build_index — the two build
    paths produce byte-identical query inputs.
    """
    build = load_build(root)
    ok_parts = [
        int(r.partition_id)
        for r in latest_manifest(spark, root).where(F.col("status") == INDEXED).collect()
    ]
    # An empty build partition is ledgered INDEXED without ever writing a
    # fragment dir (_run_pending writes fragments only for docs>0), so the
    # constructed paths are filtered to directories that exist — otherwise
    # any corpus that leaves a partition empty fails with PATH_NOT_FOUND.
    frag_paths = [
        p
        for p in (
            os.path.join(_fragments_dir(root), f"part={pp}") for pp in sorted(ok_parts)
        )
        if os.path.isdir(p)
    ]
    if not frag_paths:
        raise ValueError(f"finalize_index: no INDEXED fragments under {root}")
    # JVM-only project + bucketed exchange downstream: scan splits (16 MB)
    # provide the map-side parallelism; a pre-repartition would double-
    # shuffle the fragment stream (see build.ensure_parallelism).
    frags = spark.read.option("basePath", _fragments_dir(root)).parquet(*frag_paths)
    postings = frags.select(
        "field", "term", "doc_id", F.col("tf").cast("int").alias("tf"),
        F.col("doc_len").cast("int").alias("doc_len"),
        F.col("positions").cast("array<int>").alias("positions"),
    ).withColumn(
        "term_bucket", term_bucket(F.col("term"), build.n_buckets)
    )
    # bucket-clustered plain write (see build._write_bucketed scaling note)
    _write_bucketed(postings, build.n_buckets, os.path.join(root, "postings"))
    # aggs below are JVM hash aggregates — no pre-agg repartition (an extra
    # full exchange, measured anti-scaling; see build.ensure_parallelism)
    postings = spark.read.parquet(os.path.join(root, "postings"))

    # persist each aggregate so its tiny derived table reuses in-memory
    # rows instead of re-reading the parquet just written (constant-time
    # Amdahl-serial overhead; see build.build_index)
    from docix_spark.index.build import _write_term_dict_from

    df_stats = (
        postings.groupBy("field", "term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("term_bucket", term_bucket(F.col("term"), build.n_buckets))
    ).persist()
    df_stats.write.mode("overwrite").parquet(os.path.join(root, "df_stats"))
    _write_term_dict_from(df_stats, os.path.join(root, "term_dict"))
    df_stats.unpersist()

    doc_stats = postings.groupBy("field", "doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len")
    ).persist()
    doc_stats.write.mode("overwrite").parquet(os.path.join(root, "doc_stats"))
    corpus_stats = doc_stats.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    corpus_stats.write.mode("overwrite").parquet(os.path.join(root, "corpus_stats"))
    doc_stats.unpersist()
    return Index(root=root, n_buckets=build.n_buckets)


def build_metrics(spark: SparkSession, root: str) -> DataFrame:
    """Per-task metrics view (north_star: docs/sec, postings/sec, bytes)."""
    return latest_manifest(spark, root).select(
        "partition_id", "status", "attempt", "docs", "postings",
        "bytes_in", "bytes_out", "docs_per_sec", "postings_per_sec", "input_sha",
    )
