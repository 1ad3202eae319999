"""Training-data export sink: token-balanced JSONL shards.

The last mile of the pipeline — after dedup/quality/sampling, a training
run consumes the corpus as N line-delimited JSON shards whose TOKEN
counts (not doc counts) are balanced, so data-parallel loader ranks
finish epochs together. Shard routing reuses shard_token_balance's hash
coordinate (md5 hex chars 1-4 → 16-bit slice % n_shards): deterministic,
engine-independent, and orthogonal to the hold-out-split (chars 5-8) and
sampling (chars 9-12) coordinates by construction.

Scale notes: ONE hash repartition on the shard id (each output task
writes exactly one shard file — no dynamic-partition insert, which
serializes on this box; see CLAUDE.md), docs ordered by doc_id inside a
shard so re-exports are byte-stable. Reference parity: the reference's
export surface is ES scroll + client-side file writing
(DocumentSearchService.java); this is the Spark-native sink equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shard_assignments(docs: DataFrame, n_shards: int) -> DataFrame:
    """(doc_id, shard) via the 16-bit md5 slice — the same routing rule
    shard_token_balance audits, exposed for the writer and its tests."""
    return docs.select(
        "doc_id",
        F.expr(
            f"cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as int)"
            f" % {int(n_shards)}"
        ).alias("shard"),
    )


def write_training_shards(docs: DataFrame, out_dir: str, n_shards: int = 16) -> None:
    """Write ``docs`` (must carry doc_id; other columns pass through) as
    ``n_shards`` JSONL shard groups under ``out_dir``, partitioned by the
    deterministic shard hash and sorted by doc_id within each shard.

    The shard id is embedded in each record (a loader rank filters on
    it), and the physical layout is one hash-repartition — at 100 TB this
    is a single shuffle whose reducers stream straight to their shard
    files; nothing is collected or globally sorted.
    """
    sharded = docs.join(shard_assignments(docs, n_shards), "doc_id")
    (
        sharded.repartition(int(n_shards), F.col("shard"))
        .sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite")
        .json(out_dir)
    )


def read_training_shards(spark, out_dir: str) -> DataFrame:
    """Round-trip reader for the JSONL export (schema inferred)."""
    return spark.read.json(out_dir)
