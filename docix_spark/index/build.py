"""Inverted-index build — the engine's core deliverable.

The reference delegates all of this to Elasticsearch/Lucene (it only issues
index requests, reference ElasticsearchDocumentSearchAdapter.java:120-125);
we build the structures natively as Spark tables:

- ``postings(field, term, doc_id, tf, positions, term_bucket)`` —
  one row per (field, term, document). Positions are stored for the
  ``content`` field only (they exist solely to serve phrase matching in
  autocomplete, SearchAdapter.java:198-201 — SURVEY.md §7.3).
- ``df_stats(field, term, df, term_bucket)`` — document frequency per term.
- ``doc_stats(field, doc_id, doc_len)`` — tokens per document per field.
- ``corpus_stats(field, n_docs, avgdl)`` — BM25 normalization constants.
- ``docs(doc_id, repo, path, commit, lang, file_name, original_file_name,
  content)`` — metadata + source text for result shaping / highlighting.

Scale design (100 TB / 10^12 rows):

- Tokenization + per-doc TF aggregation happens **map-side** inside one
  ``mapInPandas`` pass (vectorized pandas/numpy over Arrow batches — no
  per-row Python, no token explosion through the shuffle). Shuffle volume is
  one row per *distinct* (field, term, doc), not per token occurrence.
- Postings are written partitioned by ``term_bucket = pmod(xxhash64(term),
  B)`` so the query path prunes to the handful of buckets containing the
  query's terms (partition pruning via an explicit driver-side filter,
  SURVEY.md §4.3).
- ``df_stats`` is a map-partial + reduce-final hash aggregation (free from
  Catalyst); ``doc_stats`` aggregates map-side within the same pass.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docix_spark.analysis.tokenizer import tokenize_series
from docix_spark.corpus import FIELDS, with_doc_ids

# doc_len is denormalized into every posting row (computed map-side for
# free): BM25's length normalization then needs NO doc_stats join at query
# time or segment-build time — at 10^12 docs that join is a full extra
# shuffle of the posting stream. doc_stats stays derivable as an aggregate.
POSTINGS_SCHEMA = (
    "field string, term string, doc_id string, tf int, doc_len int, "
    "positions array<int>"
)

DEFAULT_TERM_BUCKETS = 64


def term_bucket(col, n_buckets: int):
    """Bucket id for a term column — also computable driver-side for
    query-time partition pruning (see docix_spark.query.bm25)."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def ensure_parallelism(df: DataFrame, spark: SparkSession, min_parts: int | None = None) -> DataFrame:
    """Guarantee enough input splits for a CPU-heavy PYTHON map stage.

    A freshly written small parquet table packs into very few file splits,
    which silently serializes a downstream mapInPandas tokenize stage
    (measured: 3 tasks on 32 cores). Beyond split count, the round-robin
    exchange also yields ROW-EVEN partitions and full-size Arrow batches:
    byte-even-but-row-uneven natural splits straggle the Python stage
    (measured 65 s vs 41 s at 4 cores for the same tokenize). Use it ONLY
    in front of Python-heavy map work: in front of a JVM hash aggregate
    the repartition is a full extra exchange the agg never needed
    (measured: df/doc_stats ran 1.7x SLOWER at 4 cores than at 1 because
    this guard fired only at the higher core count — the scaling run's
    dominant anti-scaling term; those sites now rely on the 16 MB
    ``spark.sql.files.maxPartitionBytes`` scan splits, session.py). At
    real scale natural splits outnumber 3x parallelism and this is a
    no-op — unevenness averages out across many task waves.

    ``df.rdd.getNumPartitions()`` translates the plan to an RDD but runs
    NO job (lazy) — per-call cost is milliseconds of plan translation,
    deliberate and bounded (VERDICT r1 minor #7).
    """
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism * 3
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def _write_term_dict(spark: SparkSession, df_stats_path: str, out_path: str) -> None:
    """Materialize the fuzzy-expansion dictionary once at build time (the
    query path used to re-aggregate df_stats per query)."""
    _write_term_dict_from(spark.read.parquet(df_stats_path), out_path)


def _write_term_dict_from(df_stats: DataFrame, out_path: str) -> None:
    """term_dict from an in-memory df_stats handle — build paths pass the
    persisted DataFrame to skip re-listing/re-scanning the parquet they
    just wrote (constant-time overhead that lands on every cluster size).

    Range-partitioned by (tlen, term), NOT repartition(1): a source-code
    corpus at 10^12 files has a vocabulary of 10^8-10^9 identifiers, and a
    single reducer writing the whole dictionary would serialize the build's
    tail. Range partitioning + in-partition sort keeps the GLOBAL
    (tlen, term) order across part files (readers list files in name =
    range order), so the fuzzy-expansion length-band filters still prune
    whole files/row-groups via min/max stats."""
    n_parts = max(1, df_stats.sparkSession.sparkContext.defaultParallelism // 2)
    (
        df_stats
        .groupBy("term")
        .agg(F.max("df").alias("df"))
        .withColumn("tlen", F.length("term"))
        .repartitionByRange(n_parts, "tlen", "term")
        .sortWithinPartitions("tlen", "term")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def _write_bucketed(df: DataFrame, n_buckets: int, path: str) -> None:
    """Bucket-clustered plain-parquet write: one reducer per term_bucket,
    rows sorted by (term_bucket, term) so pushed filters skip whole
    row-groups/files via min/max stats (see build_index scaling note)."""
    (
        df.repartition(n_buckets, "term_bucket")
        .sortWithinPartitions("term_bucket", "term")
        .write.mode("overwrite")
        .parquet(path)
    )


def _explode_tokens(pdf: pd.DataFrame, field: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized flatten: (doc_row_idx, term, position) arrays for one field."""
    toks = tokenize_series(pdf[field])
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        empty = np.array([], dtype=np.int64)
        return empty, np.array([], dtype=object), empty
    doc_idx = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
    positions = np.concatenate([np.arange(n, dtype=np.int64) for n in lens if n])
    return doc_idx, flat_terms, positions


def _postings_core(
    pdf: pd.DataFrame, field: str
) -> tuple | None:
    """The numpy heart of posting construction for one field of one batch:
    tokenize, factorize terms, stable-sort by (doc, term), find group
    boundaries. Returns (starts, tf, di_s, tc_s, pos_s, uniq_terms,
    doc_lens, n) or None if the field produced no tokens. No per-group
    Python (a per-group positions lambda was 98% of build cost; measured
    6.15s → 0.1s per 2000-doc batch)."""
    doc_idx, terms, positions = _explode_tokens(pdf, field)
    n = len(doc_idx)
    if n == 0:
        return None
    term_codes, uniq_terms = pd.factorize(terms, sort=False)
    # stable sort by (doc, term) via ONE composite int key — 9x faster
    # than the 3-key np.lexsort (1.84 s -> 0.20 s per 3.5M-token batch,
    # identical permutation). Stability keeps positions ascending within
    # each (doc, term) group because tokens are emitted in position order.
    # No overflow: max key = len(pdf) * n_unique_terms, ~1e10 for the
    # largest realistic batch, far under 2^63.
    order = np.argsort(
        doc_idx * len(uniq_terms) + term_codes, kind="stable"
    )
    di_s = doc_idx[order]
    tc_s = term_codes[order]
    pos_s = positions[order]
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = (di_s[1:] != di_s[:-1]) | (tc_s[1:] != tc_s[:-1])
    starts = np.flatnonzero(new_group)
    tf = np.diff(np.append(starts, n))
    doc_lens = np.bincount(doc_idx, minlength=len(pdf)).astype(np.int64)
    return starts, tf, di_s, tc_s, pos_s, uniq_terms, doc_lens, n


def _positions_list_array(
    field: str, positions_field: str, starts: np.ndarray, pos_s: np.ndarray, n: int
):
    """positions as an Arrow list column built from (offsets, values) in
    O(1) — ``np.split`` here created one tiny ndarray PER POSTING ROW
    (1.6M Python objects per 2000-doc batch) which downstream conversion
    then re-walked list-by-list; measured ~2.4 s of a 4.9 s batch kernel
    plus a similar share of serialization."""
    import pyarrow as pa

    if field == positions_field:
        offs = np.empty(len(starts) + 1, dtype=np.int32)
        offs[:-1] = starts
        offs[-1] = n
        return pa.ListArray.from_arrays(
            pa.array(offs), pa.array(pos_s.astype(np.int32, copy=False))
        )
    return pa.nulls(len(starts), type=pa.list_(pa.int32()))


def _postings_for_batch(pdf: pd.DataFrame, fields: Sequence[str], positions_field: str) -> pd.DataFrame:
    """Flatten one batch into posting rows as a pandas frame — the
    checkpointed build's applyInPandas task and the no-Spark control
    script consume this form (the one-shot build path uses the zero-copy
    Arrow form below)."""
    import pyarrow as pa

    frames = []
    for field in fields:
        core = _postings_core(pdf, field)
        if core is None:
            continue
        starts, tf, di_s, tc_s, pos_s, uniq_terms, doc_lens, n = core
        frame = pd.DataFrame(
            {
                "field": field,
                "term": np.asarray(uniq_terms, dtype=object)[tc_s[starts]],
                "doc_id": pdf["doc_id"].to_numpy()[di_s[starts]],
                "tf": tf.astype("int32"),
                "doc_len": doc_lens[di_s[starts]].astype("int32"),
            }
        )
        frame["positions"] = pd.Series(
            _positions_list_array(field, positions_field, starts, pos_s, n),
            dtype=pd.ArrowDtype(pa.list_(pa.int32())),
            index=frame.index,
        )
        frames.append(frame)
    if not frames:
        return pd.DataFrame(
            columns=["field", "term", "doc_id", "tf", "doc_len", "positions"]
        )
    return pd.concat(frames, ignore_index=True)


def _postings_batches_arrow(
    rb, fields: Sequence[str], positions_field: str
):
    """One field's postings of one input RecordBatch as an output
    RecordBatch, assembled ZERO-COPY on the Arrow side:

    - term / doc_id: convert only the per-batch UNIQUE values (vocab-sized
      / row-sized), then gather with Arrow ``take`` — no Python string is
      materialized per posting row (1.6M per 2000-doc batch before);
    - tf / doc_len: numpy int32 arrays wrapped directly;
    - positions: ListArray from (offsets, values);
    - field: dictionary-of-one cast to string (one C pass).

    This is why build_postings uses mapInArrow, not mapInPandas: Spark's
    pandas serializer walks array<int> columns ROW BY ROW through a
    list(value) converter regardless of how the column was built, paying
    per-posting Python cost on the way out."""
    import pyarrow as pa

    pdf = rb.to_pandas()
    for field in fields:
        core = _postings_core(pdf, field)
        if core is None:
            continue
        starts, tf, di_s, tc_s, pos_s, uniq_terms, doc_lens, n = core
        take_idx = pa.array(di_s[starts])
        field_arr = pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(len(starts), dtype=np.int32)),
            pa.array([field], type=pa.string()),
        ).cast(pa.string())
        yield pa.RecordBatch.from_arrays(
            [
                field_arr,
                pa.array(uniq_terms, type=pa.string()).take(
                    pa.array(tc_s[starts])
                ),
                rb.column(rb.schema.get_field_index("doc_id")).take(take_idx),
                pa.array(tf.astype(np.int32, copy=False)),
                pa.array(doc_lens[di_s[starts]].astype(np.int32)),
                _positions_list_array(field, positions_field, starts, pos_s, n),
            ],
            names=["field", "term", "doc_id", "tf", "doc_len", "positions"],
        )


def build_postings(
    corpus_with_ids: DataFrame,
    fields: Sequence[str] = FIELDS,
    positions_field: str = "content",
) -> DataFrame:
    """corpus → postings rows, fully map-side (one mapInArrow pass; see
    _postings_batches_arrow for why not mapInPandas)."""
    cols = ["doc_id", *fields]

    def gen(batches):
        for rb in batches:
            yield from _postings_batches_arrow(rb, fields, positions_field)

    return corpus_with_ids.select(*cols).mapInArrow(gen, schema=POSTINGS_SCHEMA)


# driver-side DataFrame handle cache (see Index._read): avoids re-paying
# parquet file listing + schema discovery on every query over the same
# table version. Bounded; cleared wholesale at capacity.
_DF_HANDLE_CACHE: dict[tuple, DataFrame] = {}


def session_key(spark: SparkSession) -> str:
    """Stable per-session cache-key component. ``id(spark)`` of a
    garbage-collected session can be REUSED by a new session — the exact
    aliasing pitfall the serving tier documents for id(row) block-cache
    keys (ADVICE r3 #5); applicationId embeds a timestamp and never
    aliases."""
    return spark.sparkContext.applicationId


def table_version(path: str) -> tuple[int, int]:
    """(st_mtime_ns, entry count) for a table directory: nanosecond mtime
    plus file count so two same-second appends on a coarse-mtime
    filesystem still change the version (an append always adds files)."""
    try:
        st = os.stat(path)
        n = len(os.listdir(path)) if os.path.isdir(path) else 0
        return (st.st_mtime_ns, n)
    except OSError:
        return (-1, -1)


@dataclass
class Index:
    """Handle to a persisted index directory."""

    root: str
    n_buckets: int = DEFAULT_TERM_BUCKETS

    @staticmethod
    def open(root: str) -> "Index":
        """Open an existing index with its PERSISTED bucket count (from
        index_meta.json or the checkpointed build's build.json) — a handle
        constructed with the wrong n_buckets silently prunes the wrong
        buckets and finds nothing."""
        import json

        for name in ("index_meta.json", "build.json"):
            p = os.path.join(root, name)
            if os.path.exists(p):
                with open(p) as fh:
                    meta = json.load(fh)
                return Index(root=root, n_buckets=int(meta.get("n_buckets", DEFAULT_TERM_BUCKETS)))
        return Index(root=root)

    def path(self, name: str) -> str:
        """Physical directory of a logical table — resolved through the
        atomic-rewrite manifest (index.manifest): rewrites (compact, merge)
        publish new versioned directories behind a pointer flip, so readers
        and appends must always resolve. Plain name when no manifest entry
        exists (fresh builds)."""
        from docix_spark.index.manifest import resolve

        return resolve(self.root, name)

    def _read(self, spark: SparkSession, name: str) -> DataFrame:
        """``spark.read.parquet`` with a driver-side handle cache: each
        fresh read pays file listing + footer schema discovery (~0.1-0.2 s
        per table, several tables per query — the dominant warm-query cost
        after the single-job gate). Keyed by (applicationId, resolved path,
        table version): a manifest pointer flip changes the path, an
        in-place append (extend/streaming) touches the directory mtime_ns
        and file count, so staleness invalidates the key either way."""
        p = self.path(name)
        key = (session_key(spark), p, table_version(p))
        df = _DF_HANDLE_CACHE.get(key)
        if df is None:
            if len(_DF_HANDLE_CACHE) >= 256:
                _DF_HANDLE_CACHE.clear()
            df = spark.read.parquet(p)
            _DF_HANDLE_CACHE[key] = df
        return df

    def postings(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "postings")

    def df_stats(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "df_stats")

    def term_dict(self, spark: SparkSession) -> DataFrame:
        """Compact term dictionary (term, df=max over fields, tlen), sorted
        by tlen so fuzzy-expansion length-band filters prune row groups.
        Falls back to deriving from df_stats for indexes built before the
        dictionary existed."""
        p = self.path("term_dict")
        if os.path.exists(p):
            return self._read(spark, "term_dict")
        return (
            self.df_stats(spark)
            .groupBy("term")
            .agg(F.max("df").alias("df"))
            .withColumn("tlen", F.length("term"))
        )

    def doc_stats(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "doc_stats")

    def corpus_stats(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "corpus_stats")

    def docs(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "docs")

    def corpus_constants(self, spark: SparkSession, field: str = "content") -> tuple[int, float]:
        row = self.corpus_stats(spark).where(F.col("field") == field).collect()[0]
        return int(row.n_docs), float(row.avgdl)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    fields: Sequence[str] = FIELDS,
) -> Index:
    """One-shot (non-checkpointed) index build. The resumable, manifest-
    tracked build lives in docix_spark.index.checkpoint.

    Idempotent: deterministic doc_ids + full overwrite per table — the Spark
    analogue of the reference's deterministic ``_id`` upsert
    (SearchAdapter.java:118,311).
    """
    # A full rebuild writes plain-named directories: reset any manifest
    # pointers left by earlier compact/merge swaps over this root so the
    # fresh tables become the current version.
    from docix_spark.index.manifest import clear_table

    if os.path.isdir(out_dir):
        clear_table(
            out_dir, "docs", "postings", "df_stats", "term_dict",
            "doc_stats", "corpus_stats", "tombstones", "trigram_postings",
        )
    docs = with_doc_ids(corpus)
    # De-duplicate identical content: one doc_id = one document, exactly as
    # the reference's deterministic _id collapses re-uploads.
    docs = docs.dropDuplicates(["doc_id"])
    # doc_id-sorted files: point/IN lookups (metadata fetch, the gated
    # wildcard probe) prune to ~1 row group per file via min/max stats
    # instead of scanning every file's text column. dropDuplicates already
    # hash-partitioned by doc_id, so the sort is in-partition — no extra
    # shuffle (a repartitionByRange here cost ~10% of build throughput).
    (
        docs.sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "docs"))
    )
    docs = ensure_parallelism(spark.read.parquet(os.path.join(out_dir, "docs")), spark)

    postings = build_postings(docs, fields=fields).withColumn(
        "term_bucket", term_bucket(F.col("term"), n_buckets)
    )
    # The term-partitioned shuffle: co-locate each bucket in one reducer and
    # sort rows by (term_bucket, term) within the file, then write PLAIN
    # parquet. Query-time pruning comes from pushed min/max row-group stats
    # on the sorted term_bucket/term columns — measurably as selective as
    # hive-style directories, while Spark's dynamic-partitionBy insert path
    # is a serial bottleneck that flatlines build scaling (8→32 cores:
    # 53s→56s with partitionBy vs 57s→17s without; scripts/scaling_run.py).
    _write_bucketed(postings, n_buckets, os.path.join(out_dir, "postings"))
    # No ensure_parallelism here: the downstream jobs are JVM hash
    # aggregates — scan parallelism comes from the 16 MB split size and a
    # pre-agg repartition would be a full extra exchange of the table
    # (measured as the build's dominant anti-scaling term at 1 -> 4 cores).
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))

    # (field, term, doc_id) is unique by construction → count == countDistinct.
    # Each stats table feeds a tiny derived table (df_stats -> term_dict,
    # doc_stats -> corpus_stats). Persist the aggregate so the derivation
    # reuses the in-memory rows instead of re-listing + re-scanning the
    # parquet just written — that re-read is constant-time driver+scan
    # overhead paid identically at every cluster size (pure Amdahl serial
    # term of the build). The persisted aggregates are agg outputs (terms /
    # docs, not postings), orders of magnitude smaller than the input.
    df_stats = (
        postings.groupBy("field", "term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
    ).persist()
    df_stats.write.mode("overwrite").parquet(os.path.join(out_dir, "df_stats"))
    _write_term_dict_from(df_stats, os.path.join(out_dir, "term_dict"))
    df_stats.unpersist()

    doc_stats = postings.groupBy("field", "doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len")
    ).persist()
    doc_stats.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_stats"))
    corpus_stats = doc_stats.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    corpus_stats.write.mode("overwrite").parquet(os.path.join(out_dir, "corpus_stats"))
    doc_stats.unpersist()

    import json

    with open(os.path.join(out_dir, "index_meta.json"), "w") as fh:
        json.dump({"n_buckets": n_buckets, "fields": list(fields)}, fh)

    return Index(root=out_dir, n_buckets=n_buckets)
