"""Block-max WAND top-k retrieval over compressed segments — M5 core.

This is the serving-path replacement for the raw-postings DataFrame scan
(docix_spark.query.bm25): the pruned top-k scorer Lucene runs for every
query the reference sends (block-max WAND, SURVEY.md §4.2; request issued at
reference ElasticsearchDocumentSearchAdapter.java:443-469).

Distributed shape: segments are doc-range sharded (the build's salted term
shuffle, docix_spark.index.segments), so each shard holds every query term's
postings for its doc range. One vectorized task per shard runs block-max
pruning and returns its local top-k; the global answer is the k-merge of
shard winners (``TakeOrderedAndProject`` — no global sort), then a join back
to doc_ids. Scores are exact float64 BM25 (tf and doc-length streams are
decoded, never approximated) — rank-identical to the DataFrame path and the
pure-Python oracle up to float-sum rounding (SURVEY.md §7.3).

Pruning algorithm (MaxScore with block-max selective decode, provably safe):

1. Terms sorted by weighted max impact descending. The strongest term is
   decoded fully; the kth best of the accumulated scores is θ — a valid
   lower bound on the final kth score (BM25 contributions are
   non-negative, so accumulated scores only grow).
2. While the suffix sum of remaining max impacts ≥ θ, the next term is
   **essential**: decode fully, merge its docs into the candidate set,
   re-tighten θ.
3. Once the suffix sum drops below θ, the candidate set freezes: any doc
   appearing only in the remaining terms is bounded by the suffix < θ ≤
   final kth and cannot enter the top-k. Each remaining term decodes
   **only the blocks containing a candidate ordinal** (binary search of
   candidates against ``block_last``; selective decode via per-block byte
   offsets) and accumulates onto candidates only.
4. Exact float64 accumulation, top-k by (score desc, doc_ord asc) — the
   reference's stable tiebreak (SearchAdapter.java:448-449).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docix_spark.index.build import Index
from docix_spark.index.codec import decode_blocks
from docix_spark.index.segments import SegmentIndex


@dataclass
class WandStats:
    blocks_total: int = 0
    blocks_decoded: int = 0
    postings_total: int = 0
    postings_scored: int = 0

    @property
    def skip_ratio(self) -> float:
        return 1.0 - self.blocks_decoded / max(self.blocks_total, 1)


def _decode_row(row, block_ids: np.ndarray):
    return decode_blocks(
        row["doc_bytes"], row["tf_bytes"], row["dl_bytes"],
        np.asarray(row["block_doc_off"]), np.asarray(row["block_tf_off"]),
        np.asarray(row["block_dl_off"]), block_ids,
    )


def _impacts(tfs: np.ndarray, dls: np.ndarray, idf: float, avgdl: float,
             k1: float, b: float) -> np.ndarray:
    tfs = tfs.astype(np.float64)
    dls = dls.astype(np.float64)
    return idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))


def wand_shard(
    segs: list[dict],
    k: int,
    k1: float,
    b: float,
    dead_ords: np.ndarray | None = None,
    decode_fn=None,
) -> tuple[np.ndarray, np.ndarray, WandStats]:
    """Top-k over one shard. ``segs``: one dict per query term present in
    the shard with keys (weight, idf, avgdl, doc_bytes, tf_bytes, dl_bytes,
    block_last, block_max, block_*_off, count). Returns (ords, scores, stats)
    sorted by (score desc, ord asc).

    ``dead_ords``: sorted int64 array of tombstoned document ordinals (the
    Lucene live-docs bitmap, inverted) — masked at candidate-merge time so
    deleted docs never enter the candidate set, never inflate θ, and never
    displace a live doc from the top-k.

    ``decode_fn(row, block_ids)``: optional decode override — the serving
    tier injects a per-block decode CACHE here so repeated queries skip
    the varint work entirely. ``stats.blocks_decoded`` stays the LOGICAL
    decode count (blocks the algorithm needed), cache hit or not.
    """
    if decode_fn is None:
        decode_fn = _decode_row
    if dead_ords is not None and dead_ords.size == 0:
        dead_ords = None
    stats = WandStats(
        blocks_total=sum(len(s["block_last"]) for s in segs),
        postings_total=sum(int(s["count"]) for s in segs),
    )
    if not segs:
        return np.empty(0, np.int64), np.empty(0, np.float64), stats

    # Per-segment upper bound from raw (max_tf, min_dl) block metadata,
    # scored with the CURRENT idf/avgdl (valid under stats drift: BM25 is
    # increasing in tf and decreasing in dl).
    def seg_ub(s) -> float:
        ub = _impacts(
            np.asarray(s["block_max_tf"], np.int64),
            np.asarray(s["block_min_dl"], np.int64),
            s["idf"], s["avgdl"], k1, b,
        )
        return float(ub.max())

    wmax = np.array([s["weight"] * seg_ub(s) for s in segs])
    order_terms = np.argsort(-wmax, kind="stable")
    suffix = np.zeros(len(segs) + 1)
    suffix[:-1] = np.cumsum(wmax[order_terms][::-1])[::-1]

    cand_ords = np.empty(0, np.int64)
    cand_scores = np.empty(0, np.float64)
    theta = 0.0
    frozen = False
    for rank, ti in enumerate(order_terms):
        s = segs[ti]
        bl = np.asarray(s["block_last"], np.int64)
        if not frozen and theta > 0 and suffix[rank] < theta:
            frozen = True
        if not frozen:
            # essential: decode fully, merge new candidates
            need = np.arange(bl.size, dtype=np.int64)
        else:
            # non-essential: only blocks containing a current candidate
            if cand_ords.size == 0:
                continue
            covering = np.searchsorted(bl, cand_ords, side="left")
            need = np.unique(covering[covering < bl.size])
            if need.size == 0:
                continue
        stats.blocks_decoded += int(need.size)
        o, t, l = decode_fn(s, need)
        if dead_ords is not None and o.size:
            pos = np.searchsorted(dead_ords, o)
            hit = (pos < dead_ords.size) & (dead_ords[np.minimum(pos, dead_ords.size - 1)] == o)
            if hit.any():
                o, t, l = o[~hit], t[~hit], l[~hit]
        sc = s["weight"] * _impacts(t, l, s["idf"], s["avgdl"], k1, b)
        if frozen:
            # accumulate onto existing candidates only
            pos = np.searchsorted(cand_ords, o)
            valid = (pos < cand_ords.size) & (cand_ords[np.minimum(pos, cand_ords.size - 1)] == o)
            stats.postings_scored += int(valid.sum())
            np.add.at(cand_scores, pos[valid], sc[valid])
        else:
            stats.postings_scored += int(o.size)
            merged = np.concatenate([cand_ords, o])
            merged_sc = np.concatenate([cand_scores, sc])
            cand_ords, inv = np.unique(merged, return_inverse=True)
            acc = np.zeros(cand_ords.size, dtype=np.float64)
            np.add.at(acc, inv, merged_sc)
            cand_scores = acc
            if cand_scores.size >= k:
                theta = float(np.partition(cand_scores, -k)[-k])

    topk = np.lexsort((cand_ords, -cand_scores))[:k]
    return cand_ords[topk], cand_scores[topk], stats


def _dead_ords_per_shard(spark: SparkSession, index: Index, seg: SegmentIndex,
                         exclude: DataFrame | None) -> DataFrame | None:
    """Tombstoned doc ordinals as a PER-SHARD relation (shard,
    dead_ords array) — the Lucene live-docs bitmap sliced by doc range.
    Never collected to the driver: each scoring task receives only its
    shard's slice through a join, so the mask scales with deletes-per-shard
    no matter how large the total delete set grows. None when there are no
    deletes (the common case pays nothing)."""
    import os

    from docix_spark.query.service import Tombstones

    dead = Tombstones(index).read(spark) if os.path.exists(
        Tombstones(index).path
    ) else None
    if exclude is not None:
        dead = exclude if dead is None else dead.unionByName(exclude).distinct()
    if dead is None:
        return None
    return (
        seg.doc_ords(spark)
        .join(dead, "doc_id")
        .select(
            "doc_ord",
            (F.col("doc_ord") / F.lit(seg.docs_per_shard)).cast("int").alias("shard"),
        )
        .groupBy("shard")
        .agg(F.sort_array(F.collect_list("doc_ord")).alias("dead_ords"))
    )


def wand_topk(
    spark: SparkSession,
    index: Index,
    seg: SegmentIndex,
    terms: list[str],
    k: int = 10,
    field: str = "content",
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Distributed block-max WAND: top-k (doc_id, score) for a bag of query
    terms (duplicates = clause multiplicity, as ES treats repeated analyzed
    terms). Plain summed BM25 over one field — the Lucene-core contract; the
    composite best_fields/fuzzy/msm tree composes on top (bm25.py).

    Deletes are honored immediately (reference delete-by-query semantics):
    the index's tombstone ledger — plus an optional ``exclude`` doc_id
    DataFrame — is mapped to ordinals and masked inside the kernel before
    top-k selection, mirroring ``search_topk(exclude=...)``."""
    from docix_spark.query.bm25 import _bucket_ids

    weights = Counter(terms)
    uniq_terms = sorted(weights)
    if not uniq_terms:
        return spark.createDataFrame([], "doc_id string, score double")
    buckets = _bucket_ids(spark, uniq_terms, seg.n_buckets)

    cstats = {r.field: (int(r.n_docs), float(r.avgdl)) for r in index.corpus_stats(spark).collect()}
    n_docs, avgdl = cstats[field]
    df_rows = (
        index.df_stats(spark)
        .where((F.col("field") == field) & F.col("term").isin(uniq_terms))
        .collect()
    )
    idf = {
        r.term: float(np.log(1.0 + (n_docs - r.df + 0.5) / (r.df + 0.5))) for r in df_rows
    }
    if not idf:
        return spark.createDataFrame([], "doc_id string, score double")

    winfo = F.broadcast(
        spark.createDataFrame(
            [(t, float(weights[t]), idf[t], avgdl) for t in uniq_terms if t in idf],
            "term string, weight double, idf double, avgdl double",
        )
    )
    segs = (
        seg.segments(spark)
        .where(
            F.col("term_bucket").isin(buckets)
            & (F.col("field") == field)
            & F.col("term").isin(uniq_terms)
        )
        .join(winfo, "term")
    )
    dead_by_shard = _dead_ords_per_shard(spark, index, seg, exclude)
    if dead_by_shard is not None:
        segs = segs.join(dead_by_shard, "shard", "left")

    k1, b = seg.k1, seg.b
    kk = int(k)
    has_dead = dead_by_shard is not None

    def score_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        dead_arr = None
        if has_dead:
            nn = pdf["dead_ords"].dropna()
            if len(nn):
                dead_arr = np.asarray(nn.iloc[0], dtype=np.int64)
            pdf = pdf.drop(columns=["dead_ords"])
        seg_dicts = pdf.to_dict("records")
        ords, scores, _ = wand_shard(seg_dicts, kk, k1, b, dead_ords=dead_arr)
        return pd.DataFrame({"doc_ord": ords, "score": scores})

    per_shard = segs.groupBy("shard").applyInPandas(
        score_shard, schema="doc_ord long, score double"
    )
    top = per_shard.orderBy(F.desc("score"), F.asc("doc_ord")).limit(kk)
    return (
        top.join(seg.doc_ords(spark), "doc_ord")
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
