"""Session-232 check: media_decode_roundtrip — the DuckDB analytic
prediction must equal what the REAL encode->decode codec loop produces,
on arbitrary hypothesis-generated texts (unicode included)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.analysis.multimodal import decode_image, encode_bmp, encode_ppm
from docix_spark.driver_queries import REGISTRY


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.text(min_size=0, max_size=40).filter(lambda s: "\x00" not in s),
        min_size=1,
        max_size=12,
    )
)
def test_media_decode_roundtrip_oracle_equals_real_codec(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts}),
    )
    got = con.execute(REGISTRY["media_decode_roundtrip"].sql).fetchall()

    model = []
    for i, text in enumerate(texts, start=1):
        digest = hashlib.sha256(text.encode()).digest()
        w = 4 + digest[0] % 13
        h = 4 + digest[1] % 11
        raster = np.frombuffer(
            (digest * ((w * h * 3) // len(digest) + 1))[: w * h * 3], dtype=np.uint8
        ).reshape(h, w, 3)
        if digest[2] % 2 == 0:
            payload, mtype = encode_bmp(raster), "image/bmp"
        else:
            payload, mtype = encode_ppm(raster), "image/x-portable-pixmap"
        # the REAL parser, not the raster we built — any codec bug breaks this
        px = decode_image(payload)
        assert px.shape == (h, w, 3)
        sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
        model.append((i, mtype, w, h, int(sums[0]), int(sums[1]), int(sums[2])))
    assert got == model
