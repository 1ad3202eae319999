"""Vectorized posting-list codec: delta-gap + varint + block-max metadata.

This is the on-disk posting representation the reference gets implicitly
from Lucene (DocIx never sees it — it only issues index/search requests,
reference ElasticsearchDocumentSearchAdapter.java:120-125,443-465). We
implement the public IR techniques natively: doc-id delta gaps, LEB128-style
varint byte encoding, fixed-size blocks with per-block skip metadata
(last doc ordinal, byte offsets, max BM25 impact) for block-max pruning
(PAPERS.md: block-max WAND; "Columnar Formatted Inverted Index", ICDE 2025).

Everything here is pure numpy over flat arrays — no per-row Python — so the
same functions run inside Arrow-batched ``applyInPandas`` tasks at build
time and inside the WAND scorer at query time.

Encoding layout per posting list (one segment row):

- ``doc_bytes``  — varint stream of doc-ordinal gaps; ``gaps[0] = ords[0]``
  (absolute), ``gaps[i] = ords[i] - ords[i-1]`` (strictly positive).
- ``tf_bytes``   — varint stream of term frequencies, aligned 1:1 with docs.
- ``dl_bytes``   — varint stream of per-document field lengths (needed to
  recompute exact float64 BM25 at query time → rank identity with the
  DataFrame path and the pure-Python oracle).
- blocks of ``BLOCK_SIZE`` postings; per block: ``block_last`` (last doc
  ordinal — the skip key), ``block_doc_off``/``block_tf_off``/
  ``block_dl_off`` (byte offsets enabling selective block decode), and
  ``block_max_tf`` / ``block_min_dl`` — the raw impact inputs. The BM25
  upper bound is derived at QUERY time as
  ``idf · bound(max_tf, min_dl)`` with the *current* corpus statistics
  (BM25 increases in tf and decreases in dl, so the pair is a true bound
  — proved in tests/test_codec.py). Storing raw inputs instead of a
  precomputed impact is what keeps segments valid when df/avgdl drift
  under incremental appends — the same reason Lucene stores
  (freq, norm) impact pairs rather than final scores.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_MAX_VARINT_BYTES = 9  # covers values < 2**63


def varint_encode(values: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 varint encode of a non-negative int64 array.

    Returns a uint8 array. No Python-level per-element loop: the only loop
    is over byte positions (≤9 iterations), each fully vectorized.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    # bytes needed per value: 1 + floor(bitlen/7) via thresholds
    nbytes = np.ones(v.shape, dtype=np.int64)
    for j in range(1, _MAX_VARINT_BYTES):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * j))).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    rem = v.copy()
    active = np.arange(v.size)
    for j in range(_MAX_VARINT_BYTES):
        if active.size == 0:
            break
        pos = starts[active] + j
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (j + 1) < nbytes[active]
        out[pos] = byte | (more.astype(np.uint8) << np.uint8(7))
        rem[active] >>= np.uint64(7)
        active = active[more]
    return out


def varint_decode(buf: np.ndarray, byte_start: int = 0, byte_end: int | None = None) -> np.ndarray:
    """Vectorized varint decode of ``buf[byte_start:byte_end]`` → int64.

    The slice must contain whole varints (block offsets guarantee this).
    """
    b = np.asarray(buf, dtype=np.uint8)[byte_start:byte_end]
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    cont = (b & 0x80) != 0
    payload = (b & 0x7F).astype(np.uint64)
    ends = np.flatnonzero(~cont)  # terminator byte of each value
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    max_len = int(lengths.max())
    for j in range(max_len):
        sel = lengths > j
        vals[sel] |= payload[starts[sel] + j] << np.uint64(7 * j)
    return vals.astype(np.int64)


def delta_encode(sorted_ords: np.ndarray) -> np.ndarray:
    """Strictly-increasing ordinals → gaps (first value absolute)."""
    o = np.asarray(sorted_ords, dtype=np.int64)
    gaps = np.empty_like(o)
    if o.size:
        gaps[0] = o[0]
        np.subtract(o[1:], o[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def bm25_impact(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float,
                k1: float, b: float) -> np.ndarray:
    """Exact per-posting BM25 contribution (float64) — the same formula as
    docix_spark.query.bm25.bm25_score_col and the oracle (§2.8)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_posting_list(
    ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one (field, term, shard) posting list → segment payload dict.

    ``ords`` must be sorted strictly increasing; tfs/dls aligned. No
    scoring parameters: block metadata stores raw (max_tf, min_dl), scored
    at query time (see module docstring).
    """
    order = np.argsort(ords, kind="stable")
    ords = np.asarray(ords, dtype=np.int64)[order]
    tfs = np.asarray(tfs, dtype=np.int64)[order]
    dls = np.asarray(dls, dtype=np.int64)[order]
    n = ords.size

    n_blocks = (n + block_size - 1) // block_size
    bounds = np.arange(1, n_blocks + 1) * block_size
    bounds[-1] = n
    starts = np.arange(n_blocks) * block_size

    block_last = ords[bounds - 1]
    block_max_tf = np.maximum.reduceat(tfs, starts)
    block_min_dl = np.minimum.reduceat(dls, starts)

    # per-block byte offsets: encode each stream blockwise so offsets are
    # exact and blocks are independently decodable (gaps restart per block
    # with an absolute first value — required for selective decode).
    doc_chunks, tf_chunks, dl_chunks = [], [], []
    doc_off = np.zeros(n_blocks + 1, dtype=np.int64)
    tf_off = np.zeros(n_blocks + 1, dtype=np.int64)
    dl_off = np.zeros(n_blocks + 1, dtype=np.int64)
    for i in range(n_blocks):
        s, e = starts[i], bounds[i]
        dc = varint_encode(delta_encode(ords[s:e]))
        tc = varint_encode(tfs[s:e])
        lc = varint_encode(dls[s:e])
        doc_chunks.append(dc)
        tf_chunks.append(tc)
        dl_chunks.append(lc)
        doc_off[i + 1] = doc_off[i] + dc.size
        tf_off[i + 1] = tf_off[i] + tc.size
        dl_off[i + 1] = dl_off[i] + lc.size

    return {
        "count": int(n),
        "doc_bytes": np.concatenate(doc_chunks).tobytes() if n else b"",
        "tf_bytes": np.concatenate(tf_chunks).tobytes() if n else b"",
        "dl_bytes": np.concatenate(dl_chunks).tobytes() if n else b"",
        "block_last": block_last.tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "block_min_dl": block_min_dl.tolist(),
        "block_doc_off": doc_off.tolist(),
        "block_tf_off": tf_off.tolist(),
        "block_dl_off": dl_off.tolist(),
    }


def decode_blocks(
    doc_bytes: bytes,
    tf_bytes: bytes,
    dl_bytes: bytes,
    block_doc_off: np.ndarray,
    block_tf_off: np.ndarray,
    block_dl_off: np.ndarray,
    block_ids: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Selectively decode the given block ids → (ords, tfs, dls)."""
    db = np.frombuffer(doc_bytes, dtype=np.uint8)
    tb = np.frombuffer(tf_bytes, dtype=np.uint8)
    lb = np.frombuffer(dl_bytes, dtype=np.uint8)
    ords_l, tfs_l, dls_l = [], [], []
    for i in np.asarray(block_ids, dtype=np.int64):
        gaps = varint_decode(db, int(block_doc_off[i]), int(block_doc_off[i + 1]))
        ords_l.append(delta_decode(gaps))
        tfs_l.append(varint_decode(tb, int(block_tf_off[i]), int(block_tf_off[i + 1])))
        dls_l.append(varint_decode(lb, int(block_dl_off[i]), int(block_dl_off[i + 1])))
    if not ords_l:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    return np.concatenate(ords_l), np.concatenate(tfs_l), np.concatenate(dls_l)
