"""Multimodal column plumbing — opaque binary payloads with typed metadata.

A large-scale training-data pipeline carries image/audio/video alongside
text as opaque ``binary`` columns plus typed metadata, processed by
Arrow-batched ``mapInPandas`` stages. The image/audio decode libraries are
not available in this environment, so the decode step is STUBBED (a
deterministic fake derived from the payload bytes, or
``NotImplementedError`` for the real path) — but the Spark-side plumbing is
real and tested: schema, partitioning, UDF signature, Arrow batch shape.

Deterministic fake decode: "dimensions" come from the first payload bytes,
the feature vector from the payload's sha256 — stable across runs,
partitionings, and cluster sizes, so the pipeline is testable end-to-end
without the codec libraries.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id string, media_type string, payload binary"

FEATURE_SCHEMA = (
    "doc_id string, media_type string, n_bytes long, sha256 string, "
    "fake_width int, fake_height int, features array<float>"
)

FRAME_SCHEMA = "doc_id string, frame_no int, frame_bytes binary"

_LANG_MEDIA = {"en": "image/png", "fr": "audio/wav", "de": "video/mp4",
               "es": "image/jpeg", "zh": "image/png"}


def _media_type_expr():
    # built lazily: Column construction needs the JVM gateway, which does
    # not exist when this module is imported inside a Python worker
    return F.create_map(
        *[x for k, v in _LANG_MEDIA.items() for x in (F.lit(k), F.lit(v))]
    )


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang") -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the text
    (stands in for encoded image/audio bytes), media_type keyed on lang."""
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.coalesce(_media_type_expr()[F.col(lang_col)], F.lit("application/octet-stream")).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — requires an image codec library that is not in
    this container. STUB: deliberately unimplemented."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow); "
        "use fake_decode() for the deterministic test double"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: pseudo-dimensions from the first
    payload bytes, an 8-dim feature vector from the sha256 digest."""
    digest = hashlib.sha256(payload).digest()
    w = (payload[0] if payload else 0) + 1
    h = (payload[1] if len(payload) > 1 else 0) + 1
    feats = (np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0)
    return {"width": int(w), "height": int(h), "features": feats}


def extract_media_features(media: DataFrame) -> DataFrame:
    """The feature-extraction stage: Arrow-batched mapInPandas over the
    binary column — the real pipeline shape; only the inner decode is the
    deterministic fake."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                d = fake_decode(payload)
                rows.append(
                    (doc_id, mtype, len(payload),
                     hashlib.sha256(payload).hexdigest(),
                     d["width"], d["height"], d["features"].tolist())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "sha256",
                         "fake_width", "fake_height", "features"],
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id string, media_type string, width int, height int, "
    "resized_width int, resized_height int, thumb_bytes binary"
)


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize stage stub: the real path would decode → scale → re-encode
    (codec libs absent in this container); the deterministic fake scales
    the fake-decoded dimensions preserving aspect ratio and emits a
    truncated-payload "thumbnail" — the Spark-side plumbing (Arrow
    batches, schema, partition invariance) is real and tested."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                d = fake_decode(payload)
                w, h = d["width"], d["height"]
                scale = min(max_dim / max(w, h, 1), 1.0)
                rw, rh = max(int(w * scale), 1), max(int(h * scale), 1)
                rows.append((doc_id, mtype, w, h, rw, rh, payload[: rw * rh]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "width", "height",
                         "resized_width", "resized_height", "thumb_bytes"],
            )

    return media.mapInPandas(gen, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub for video payloads: deterministic byte-window
    "frames" every ``every_n_bytes`` (stands in for keyframe extraction);
    real decoding is NotImplemented in this container."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    if i >= max_frames:
                        break
                    rows.append((doc_id, i, payload[off:off + 64]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_bytes"])

    return media.mapInPandas(gen, schema=FRAME_SCHEMA)
