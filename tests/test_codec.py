"""M3 — varint/delta codec round-trips and block-max bound properties
(SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.index.codec import (
    bm25_impact,
    decode_blocks,
    delta_decode,
    delta_encode,
    encode_posting_list,
    varint_decode,
    varint_encode,
)


def test_varint_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**21, 2**28, 2**35,
         2**40, 2**62 - 1],
        dtype=np.int64,
    )
    enc = varint_encode(vals)
    assert np.array_equal(varint_decode(enc), vals)
    # byte sizes match LEB128 expectations
    assert varint_encode(np.array([127])).size == 1
    assert varint_encode(np.array([128])).size == 2
    assert varint_encode(np.array([16384])).size == 3


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=300))
def test_varint_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.int64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=400))
def test_delta_roundtrip(xs):
    ords = np.array(sorted(xs), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(ords)), ords)


@pytest.fixture(scope="module")
def posting_list():
    rng = np.random.default_rng(3)
    n = 1000
    ords = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(10, 5000, size=n).astype(np.int64)
    return ords, tfs, dls


def test_posting_list_roundtrip(posting_list):
    ords, tfs, dls = posting_list
    p = encode_posting_list(ords, tfs, dls, block_size=128)
    n_blocks = len(p["block_last"])
    assert n_blocks == (len(ords) + 127) // 128
    o, t, l = decode_blocks(
        p["doc_bytes"], p["tf_bytes"], p["dl_bytes"],
        np.asarray(p["block_doc_off"]), np.asarray(p["block_tf_off"]),
        np.asarray(p["block_dl_off"]), np.arange(n_blocks),
    )
    assert np.array_equal(o, ords)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)


def test_selective_block_decode(posting_list):
    ords, tfs, dls = posting_list
    p = encode_posting_list(ords, tfs, dls, block_size=128)
    o, t, l = decode_blocks(
        p["doc_bytes"], p["tf_bytes"], p["dl_bytes"],
        np.asarray(p["block_doc_off"]), np.asarray(p["block_tf_off"]),
        np.asarray(p["block_dl_off"]), np.array([2, 5]),
    )
    assert np.array_equal(o, np.concatenate([ords[256:384], ords[640:768]]))
    assert np.array_equal(t, np.concatenate([tfs[256:384], tfs[640:768]]))


def test_block_metadata_gives_true_upper_bound(posting_list):
    """For ANY (idf, avgdl) supplied at query time, every posting's exact
    BM25 impact <= the bound derived from the block's (max_tf, min_dl) —
    the stats-drift-safe invariant the pruning relies on."""
    ords, tfs, dls = posting_list
    p = encode_posting_list(ords, tfs, dls, block_size=128)
    for idf, avgdl in [(1.7, 640.0), (0.05, 100.0), (6.0, 2500.0)]:
        impacts = bm25_impact(tfs, dls, idf, avgdl, 1.2, 0.75)
        ub = bm25_impact(
            np.asarray(p["block_max_tf"]), np.asarray(p["block_min_dl"]),
            idf, avgdl, 1.2, 0.75,
        )
        for i in range(len(p["block_max_tf"])):
            blk = impacts[i * 128:(i + 1) * 128]
            assert blk.max() <= ub[i] + 1e-12
    # and per block the components are attained exactly
    assert p["block_max_tf"][0] == int(tfs[:128].max())
    assert p["block_min_dl"][0] == int(dls[:128].min())


def test_compression_beats_raw(posting_list):
    """Delta+varint on sorted ords must beat 8-byte raw ints comfortably for
    dense lists (the 100 TB storage argument)."""
    rng = np.random.default_rng(9)
    dense = np.sort(rng.choice(200_000, size=50_000, replace=False)).astype(np.int64)
    enc = varint_encode(delta_encode(dense))
    assert enc.size < dense.size * 2  # ~1.1 bytes/doc vs 8 raw
