"""Multimodal binary-column plumbing: schema, mapInPandas shapes,
determinism, payload invariants. Real decode (BMP/PPM) is covered in
test_multimodal_real.py; compressed formats remain NotImplemented."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from docix_spark.analysis.multimodal import (
    decode_image,
    extract_media_features,
    fake_decode,
    frame_sample,
    synth_media,
)
from docix_spark.corpus import synth_corpus_pdf


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(synth_corpus_pdf(60, seed=31)).withColumn(
        "doc_id", F.sha2("content", 256)
    )
    return synth_media(docs, text_col="content")


def test_compressed_decode_not_implemented():
    # PNG needs a real codec library; only BMP/PPM decode natively
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    a, b = fake_decode(b"hello"), fake_decode(b"hello")
    assert a["width"] == b["width"] and a["height"] == b["height"]
    assert (a["features"] == b["features"]).all()
    assert len(a["features"]) == 8
    assert fake_decode(b"")["width"] == 1


def test_media_schema(spark, media):
    assert dict(media.dtypes) == {
        "doc_id": "string", "media_type": "string", "payload": "binary"
    }
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types <= {"image/png", "audio/wav", "video/mp4", "image/jpeg",
                     "application/octet-stream"}


def test_feature_extraction_invariants(spark, media):
    feats = extract_media_features(media)
    joined = (
        feats.join(media, ["doc_id", "media_type"])
        .select(
            "doc_id", "n_bytes", "sha256",
            F.octet_length("payload").alias("true_bytes"),
            F.sha2("payload", 256).alias("true_sha"),
            F.size("features").alias("n_feats"),
        )
    )
    pdf = joined.toPandas()
    assert (pdf.n_bytes == pdf.true_bytes).all()
    assert (pdf.sha256 == pdf.true_sha).all()  # python hashlib == JVM sha2
    assert (pdf.n_feats == 8).all()


def test_feature_extraction_partition_invariant(spark, media):
    a = extract_media_features(media.repartition(1)).orderBy("doc_id").toPandas()
    b = extract_media_features(media.repartition(7)).orderBy("doc_id").toPandas()
    assert a[["doc_id", "sha256", "fake_width", "fake_height"]].equals(
        b[["doc_id", "sha256", "fake_width", "fake_height"]]
    )


def test_frame_sampling(spark, media):
    frames = frame_sample(media, every_n_bytes=200, max_frames=3)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_no", "frame_bytes"}
    assert pdf.groupby("doc_id").frame_no.max().max() <= 2
    assert (pdf.frame_bytes.str.len() <= 64).all()
    # frame 0 of each doc equals the payload head
    m = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for r in pdf[pdf.frame_no == 0].itertuples():
        assert bytes(r.frame_bytes) == m[r.doc_id][:64]


def test_resize_invariants(spark, media):
    from docix_spark.analysis.multimodal import resize_media

    r = resize_media(media, max_dim=64).toPandas()
    assert len(r) > 0
    assert (r["resized_width"] <= 64).all() and (r["resized_height"] <= 64).all()
    assert (r["resized_width"] >= 1).all() and (r["resized_height"] >= 1).all()
    # aspect preserved within integer truncation
    big = r[(r["width"] > 64) | (r["height"] > 64)]
    if len(big):
        assert (big[["resized_width", "resized_height"]].max(axis=1) <= 64).all()
    # small media pass through unscaled
    small = r[(r["width"] <= 64) & (r["height"] <= 64)]
    if len(small):
        assert (small["resized_width"] == small["width"]).all()
        assert (small["resized_height"] == small["height"]).all()
    # thumbnail budget
    assert (r["thumb_bytes"].str.len() <= r["resized_width"] * r["resized_height"]).all()
