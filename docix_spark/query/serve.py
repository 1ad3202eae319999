"""Low-latency serving tier over the compressed segment index.

The reference's query path is an HTTP round-trip to an always-on
Elasticsearch node that answers from memory-mapped Lucene segments in
milliseconds (request at ElasticsearchDocumentSearchAdapter.java:443-469).
Launching a Spark job per query reproduces the *semantics* but pays
seconds of scheduling — so, exactly like ES separates indexing from
serving, this module is the data-node analogue: a driver/serving-process
resident :class:`LocalSearcher` that reads segment parquet ONCE via
pyarrow (predicate-pushdown on term/bucket), caches term payloads, and
answers top-k with the same numpy block-max kernel used by the
distributed path (docix_spark.query.wand.wand_shard) — identical
results, millisecond latency.

Scale story: one LocalSearcher instance holds one doc-range partition of
the index (the build's salt shards); a serving fleet shards by doc range
exactly like ES shards, each node answering its range and a coordinator
merging top-k. In this sandbox one process holds the whole (small) index;
the per-shard grouping below is the same code a sharded fleet would run.

No SparkSession is required after construction — suitable for a
`spark-submit`-built index served by a plain Python process.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import numpy as np

from docix_spark import BM25_B, BM25_K1
from docix_spark.analysis.tokenizer import tokenize
from docix_spark.index.xxh64 import term_bucket_py
from docix_spark.query.wand import WandStats, wand_shard

_SEG_COLS = [
    "field", "term", "shard", "count", "doc_bytes", "tf_bytes", "dl_bytes",
    "block_last", "block_max_tf", "block_min_dl",
    "block_doc_off", "block_tf_off", "block_dl_off", "term_bucket",
]


class LocalSearcher:
    """In-process BM25 top-k over a segment index directory."""

    def __init__(self, root: str, field: str = "content"):
        import pyarrow.dataset as ds

        with open(os.path.join(root, "seg_meta.json")) as fh:
            meta = json.load(fh)
        self.root = root
        self.field = field
        self.n_buckets = int(meta["n_buckets"])
        self.k1 = float(meta.get("k1", BM25_K1))
        self.b = float(meta.get("b", BM25_B))
        self._segments = ds.dataset(os.path.join(root, "segments"), format="parquet")
        self._seg_cache: dict[str, list[dict]] = {}

        import pyarrow.parquet as pq

        # df / corpus stats for the serving field (compact tables)
        dfs = pq.read_table(
            os.path.join(root, "df_stats"), columns=["field", "term", "df"]
        ).to_pandas()
        dfs = dfs[dfs["field"] == field]
        self._df = dict(zip(dfs["term"], dfs["df"].astype(int)))
        cs = pq.read_table(os.path.join(root, "corpus_stats")).to_pandas()
        row = cs[cs["field"] == field].iloc[0]
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"])
        # doc_ord -> doc_id (one doc-range partition's mapping; a sharded
        # fleet loads only its range)
        ords = pq.read_table(os.path.join(root, "doc_ords")).to_pandas()
        self._ord_to_doc = np.empty(len(ords), dtype=object)
        self._ord_to_doc[ords["doc_ord"].to_numpy()] = ords["doc_id"].to_numpy()
        self._doc_to_ord = dict(
            zip(ords["doc_id"].to_numpy(), ords["doc_ord"].to_numpy())
        )
        # live-docs mask: tombstoned ordinals, applied inside the kernel —
        # deletes are visible immediately, before any compaction
        self._dead_ords = np.empty(0, np.int64)
        self.refresh_tombstones()

    def refresh_tombstones(self) -> None:
        """Reload the delete ledger (index root ``tombstones`` table) — the
        serving-tier analogue of ES making a delete-by-query visible on the
        next refresh (SearchAdapter.java:331-354)."""
        import pyarrow.parquet as pq

        path = os.path.join(self.root, "tombstones")
        if not os.path.isdir(path):
            self._dead_ords = np.empty(0, np.int64)
            return
        ids = pq.read_table(path, columns=["doc_id"]).to_pandas()["doc_id"]
        ords = [self._doc_to_ord[d] for d in ids if d in self._doc_to_ord]
        self._dead_ords = np.sort(np.array(ords, dtype=np.int64))

    # -- segment access ----------------------------------------------------

    def _load_term_segments(self, term: str) -> list[dict]:
        """All (shard) segment rows of one term, pyarrow-filtered by
        (bucket, field, term) — row-group pruned by the sorted layout."""
        if term in self._seg_cache:
            return self._seg_cache[term]
        import pyarrow.compute as pc

        bucket = term_bucket_py(term, self.n_buckets)
        t = self._segments.to_table(
            columns=_SEG_COLS,
            filter=(
                (pc.field("term_bucket") == bucket)
                & (pc.field("field") == self.field)
                & (pc.field("term") == term)
            ),
        )
        rows = t.to_pylist()
        self._seg_cache[term] = rows
        return rows

    def idf(self, term: str) -> float:
        df = self._df.get(term)
        if df is None:
            return 0.0
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    # -- search ------------------------------------------------------------

    def search_terms(self, terms: list[str], k: int = 10) -> tuple[list[tuple[str, float]], WandStats]:
        """Top-k [(doc_id, score)] for a bag of terms (duplicates =
        multiplicity), identical semantics to wand.wand_topk."""
        weights = Counter(terms)
        by_shard: dict[int, list[dict]] = {}
        for term, w in weights.items():
            idf = self.idf(term)
            if idf == 0.0:
                continue
            for row in self._load_term_segments(term):
                seg = dict(row)
                seg["weight"] = float(w)
                seg["idf"] = idf
                seg["avgdl"] = self.avgdl
                by_shard.setdefault(int(row["shard"]), []).append(seg)

        total = WandStats()
        cand: list[tuple[float, int]] = []
        for shard, segs in sorted(by_shard.items()):
            ords, scores, st = wand_shard(
                segs, k, self.k1, self.b, dead_ords=self._dead_ords
            )
            total.blocks_total += st.blocks_total
            total.blocks_decoded += st.blocks_decoded
            total.postings_total += st.postings_total
            total.postings_scored += st.postings_scored
            cand.extend(zip(scores.tolist(), ords.tolist()))
        # global k-merge: score desc, doc_id asc. Tiebreak happens AFTER
        # mapping ordinals to doc_ids — under incremental appends
        # (segments.extend_segments) ordinal order is batch order, not
        # doc_id order.
        mapped = [(str(self._ord_to_doc[o]), s) for s, o in cand]
        mapped.sort(key=lambda x: (-x[1], x[0]))
        return mapped[:k], total

    def search(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        return self.search_terms(tokenize(query), k)[0]
