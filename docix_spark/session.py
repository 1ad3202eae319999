"""SparkSession factory with scale-appropriate defaults.

Local-mode settings stand in for a multi-executor cluster; the knobs that
matter at 100 TB (AQE, shuffle partitions, Arrow batching, broadcast
threshold) are set explicitly so the same code submits unchanged via
``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docix-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 0
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores or os.cpu_count() or 8, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting — the safety net under
        # our explicit hot-term salting (SURVEY.md §4.2).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow end-to-end for every pandas UDF / mapInPandas stage.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Tiny dimension tables (query terms, corpus stats) must broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Parquet dictionary pages sized for the doc_id column: the default
        # 1 MB cap overflows at ~16k distinct 64-char shas per column chunk,
        # silently degrading doc_id to PLAIN — measured 7.3x postings-table
        # bloat (1.6 GB -> 221 MB on a 30k-doc build) because term-sorted
        # row order scatters doc_ids beyond LZ reach. 16 MB keeps dictionary
        # encoding up to ~260k distinct docs per chunk; beyond that (bigger
        # shards at 100 TB) zstd via DOCIX_PARQUET_CODEC recovers most of it.
        .config("spark.hadoop.parquet.dictionary.page.size", str(16 * 1024 * 1024))
        # 16 MB scan splits (vs 128 MB default): parquet splits at row-group
        # boundaries, so mid-size tables (one index table here is 100-500 MB
        # at bench scale) fan out across cores WITHOUT a repartition shuffle.
        # ensure_parallelism()'s repartition used to paper over under-split
        # scans at a full-exchange cost — measured ANTI-scaling: df/doc_stats
        # aggs ran 1.7x SLOWER at 4 cores than 1 because the guard fired only
        # at the higher core count and shuffled the whole postings table.
        # Smaller splits give the same parallelism for free; at true 100 TB
        # scale raise via DOCIX_MAX_SPLIT (splits per table ≫ cores either
        # way, and fewer/larger tasks amortize scheduling better there).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("DOCIX_MAX_SPLIT", str(16 * 1024 * 1024)),
        )
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("DOCIX_PARQUET_CODEC", "snappy"),
        )
        # Shuffle/spill/broadcast stream codec (independent of the parquet
        # file codec above). lz4 default; DOCIX_IO_CODEC=zstd halves shuffle
        # bytes at some CPU cost — the right trade when the shuffle tier's
        # disks (not cores) are the bottleneck.
        .config(
            "spark.io.compression.codec",
            os.environ.get("DOCIX_IO_CODEC", "lz4"),
        )
        .config("spark.driver.memory", os.environ.get("DOCIX_DRIVER_MEM", "8g"))
        # Commit protocol v2: tasks move their own output files at task
        # commit instead of the driver serially renaming every file at job
        # commit — the job-commit phase is pure Amdahl serial time (measured
        # here: tripling fs-metadata latency tripled the non-scaling build
        # component). v2's weaker failure atomicity is fine: table-level
        # atomicity comes from the manifest pointer swap (index/manifest.py),
        # not the committer.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
