"""Corpus construction.

The engine's input is an Iceberg-style table of source-code repositories with
columns ``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).
One row = one source file = one indexable unit — the analogue of the
reference's per-PDF-page ``DocumentPage``
(reference domain/port/out/PageExtractor.java:27-58).

Derived columns (added by :func:`with_doc_ids`):

- ``doc_id = sha2(content, 256)`` — the content-sha256 per-row invariant
  (BASELINE.json input_hint). The reference itself derives storage names from
  SHA-256 (domain/util/FileNameEncryptionUtil.java:43-53); we drop its
  obfuscation salts and use pure content hashing so IDs are deterministic and
  re-index is idempotent (the reference gets idempotency from deterministic
  ES ``_id`` values, SearchAdapter.java:118,311).
- ``file_name = path`` and ``original_file_name = basename(path)`` — the two
  filename fields of the ES mapping (SearchAdapter.java:253-256) that
  participate in best_fields scoring with boosts 3/3 vs content 5
  (SearchAdapter.java:405).

:func:`synth_corpus` builds a deterministic seeded corpus with the skew
injectors the north rule calls out (license boilerplate repeated across
repos, stopword-like identifiers at extreme document frequency) — no
external data. :func:`from_driver_documents` adapts the driver's
``documents`` parquet (doc_id, text, lang, source, n_chars) to the corpus
shape so the same engine runs on the graded test tables.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

FIELDS = ("content", "file_name", "original_file_name")

# Skew injector 1: boilerplate license paragraph prepended to ~30% of files
# (FIXTURES.md §1) — every term in it lands at df ≈ 0.3·N.
LICENSE_BOILERPLATE = (
    "permission is hereby granted free of charge to any person obtaining a "
    "copy of this software and associated documentation files the software "
    "to deal in the software without restriction including without "
    "limitation the rights to use copy modify merge publish distribute "
    "sublicense and or sell copies of the software"
)

# Skew injector 2: stopword-like identifiers at very high df.
STOP_IDENTIFIERS = ["i", "get", "value", "data", "self", "x", "result"]

_LANGS = ["java", "py", "go", "js", "md", "txt"]
_LANG_W = [0.3, 0.25, 0.15, 0.15, 0.1, 0.05]

# Identifier vocabulary — Zipf-distributed draw (FIXTURES.md §1).
_VOCAB_SIZE = 10_000


def _vocab() -> list[str]:
    roots = [
        "parse", "build", "index", "token", "merge", "scan", "query", "score",
        "block", "batch", "shard", "store", "fetch", "cache", "flush", "split",
        "count", "chunk", "codec", "field", "group", "order", "limit", "range",
    ]
    out = []
    i = 0
    while len(out) < _VOCAB_SIZE:
        r = roots[i % len(roots)]
        out.append(f"{r}_{i // len(roots)}")
        i += 1
    return out


def synth_corpus_pdf(n_docs: int, seed: int = 42, len_scale: float = 1.0) -> pd.DataFrame:
    """Deterministic synthetic corpus as a pandas frame (driver-side for
    tests; use :func:`synth_corpus` for a distributed generate).
    ``len_scale`` multiplies document length (for compute-heavy bench
    corpora without changing the table shape)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    # Zipf-ish rank weights.
    ranks = np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)

    langs = rng.choice(_LANGS, size=n_docs, p=_LANG_W)
    n_repos = max(n_docs // 20, 1)
    repo_idx = rng.integers(0, n_repos, size=n_docs)
    doc_lens = (rng.integers(40, 400, size=n_docs) * len_scale).astype(np.int64)

    rows = []
    for d in range(n_docs):
        body_terms = list(vocab[rng.choice(_VOCAB_SIZE, size=doc_lens[d], p=probs)])
        # stopword-like identifiers sprayed through most documents
        n_stop = int(rng.integers(0, 12))
        body_terms += [STOP_IDENTIFIERS[int(j)] for j in rng.integers(0, len(STOP_IDENTIFIERS), n_stop)]
        # per-file rare terms for exact-hit tests
        body_terms.append(f"uniq_{d}_0")
        if d % 3 == 0:
            body_terms.append(f"uniq_{d}_1")
        rng.shuffle(body_terms)
        content = " ".join(body_terms)
        if d % 10 < 3:  # ~30% get license boilerplate prepended
            content = LICENSE_BOILERPLATE + " " + content
        repo = f"org{repo_idx[d] % 37}/repo{repo_idx[d]}"
        lang = langs[d]
        path = f"src/main/{lang}/pkg{d % 53}/Module{d}.{lang}"
        commit = hashlib.sha256(f"{repo}:{path}:0".encode()).hexdigest()[:40]
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=CORPUS_COLUMNS)


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None, len_scale: float = 1.0) -> DataFrame:
    """Distributed deterministic corpus: each partition generates its slice
    with a partition-derived seed, so the output is independent of
    parallelism (same rows at local[8] and local[32])."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    per = [(p, n_docs // partitions + (1 if p < n_docs % partitions else 0)) for p in range(partitions)]
    offsets = np.cumsum([0] + [c for _, c in per[:-1]]).tolist()
    plan = spark.createDataFrame(
        [(p, int(offsets[i]), int(c)) for i, (p, c) in enumerate(per)],
        "part int, offset long, cnt int",
    ).repartition(partitions, "part")

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                sub = synth_corpus_pdf(int(row.cnt), seed=seed + int(row.offset), len_scale=len_scale)
                sub["path"] = [
                    f"src/main/{l}/pkg{(int(row.offset)+i) % 53}/Module{int(row.offset)+i}.{l}"
                    for i, l in enumerate(sub["lang"])
                ]
                yield sub[CORPUS_COLUMNS]

    schema = ", ".join(f"{c} string" for c in CORPUS_COLUMNS)
    return plan.mapInPandas(gen, schema=schema)


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Add doc_id (content sha256) + the two filename fields, all JVM-side."""
    return (
        corpus.withColumn("doc_id", F.sha2(F.col("content"), 256))
        .withColumn("file_name", F.col("path"))
        .withColumn("original_file_name", F.substring_index(F.col("path"), "/", -1))
    )


def from_driver_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents parquet (doc_id,text,lang,source,n_chars)
    to the corpus schema. ``path`` is synthesized deterministically from
    (source, doc_id) so filename-field scoring stays testable."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(
            F.col("source").alias("repo"),
            F.concat(F.lit("docs/"), F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
            F.sha2(F.concat_ws(":", "source", F.col("doc_id").cast("string")), 256).substr(1, 40).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
    )


def read_corpus(
    spark: SparkSession,
    table_or_path: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    """Iceberg-shaped source adapter (VERDICT r4 ask #6; SURVEY.md §1.2/§1.3
    frames the ingest source as an Iceberg table snapshot).

    Resolution order:

    1. **Catalog table name** (no path separator, not a ``*.parquet``
       path): read through the session catalog — a real Iceberg catalog
       configured via ``spark.sql.catalog.*`` serves snapshot-pinned reads
       (``snapshot-id`` / ``as-of-timestamp`` read options, Iceberg's
       time-travel contract); a plain catalog table reads directly (the
       options are Iceberg-only and raise there, as they should — a
       snapshot pin against a non-versioned table must not be silently
       ignored).
    2. **Driver documents directory** (contains ``documents.parquet``):
       :func:`from_driver_documents`.
    3. **Parquet path** (file or directory): read as parquet; driver
       ``documents`` schema is adapted, otherwise the corpus schema
       ``(repo, path, commit, lang, content)`` is expected. Snapshot pins
       are refused here — a bare parquet directory has no snapshot log,
       and pretending otherwise would fake isolation the storage can't
       provide. Append-style ingestion still works the Iceberg way at the
       file level (new snapshot == new data files): re-reading picks up
       appended files and the checkpoint/reindex layer processes only the
       delta (see tests/test_read_corpus_adapter.py).

    Every downstream surface (build_index, start_build/resume_build,
    reindex_missing) takes the returned DataFrame, so swapping a parquet
    sandbox for a real Iceberg catalog at scale is a one-argument change.
    """
    import os

    looks_like_path = (
        os.sep in table_or_path
        or table_or_path.endswith(".parquet")
        or os.path.exists(table_or_path)
    )
    if not looks_like_path:
        reader = spark.read
        if snapshot_id is not None or as_of_timestamp_ms is not None:
            reader = reader.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            if as_of_timestamp_ms is not None:
                reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
        df = reader.table(table_or_path)
        return _adapt_corpus_shape(df)
    if snapshot_id is not None or as_of_timestamp_ms is not None:
        raise ValueError(
            "snapshot pinning requires an Iceberg catalog table; "
            f"{table_or_path!r} is a plain parquet path with no snapshot log"
        )
    if os.path.isdir(table_or_path) and os.path.exists(
        os.path.join(table_or_path, "documents.parquet")
    ):
        return from_driver_documents(spark, table_or_path)
    return _adapt_corpus_shape(spark.read.parquet(table_or_path))


def _adapt_corpus_shape(df: DataFrame) -> DataFrame:
    """Map a driver-documents-shaped table to the corpus schema; pass a
    corpus-shaped table through unchanged; reject anything else loudly."""
    cols = set(df.columns)
    if {"text", "source", "lang"} <= cols:
        return df.select(
            F.col("source").alias("repo"),
            F.concat(
                F.lit("docs/"), F.col("source"), F.lit("/doc_"),
                F.col("doc_id").cast("string"), F.lit(".txt"),
            ).alias("path"),
            F.sha2(
                F.concat_ws(":", "source", F.col("doc_id").cast("string")), 256
            ).substr(1, 40).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
    if set(CORPUS_COLUMNS) <= cols:
        return df.select(*CORPUS_COLUMNS)
    raise ValueError(
        f"unrecognized corpus schema {sorted(cols)}; expected driver "
        f"documents (doc_id, text, lang, source, ...) or {CORPUS_COLUMNS}"
    )
