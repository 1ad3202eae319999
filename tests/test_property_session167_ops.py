"""Property-based semantics check for the session-167 operator.

Model: the full blocking bake-off against a brute-force Python model —
shingles, 4-perm MinHash bands, 60-bit SimHash bands with Hamming ≤ 3
verify, prefix fingerprints, and the J ≥ 0.5 truth set. DuckDB-only.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _h60(term: str) -> int:
    return int(_md5(term)[:15], 16)


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=3, max_size=10), min_size=2, max_size=8
    ),
    dup=st.booleans(),
)
def test_blocking_compare_matches_model(docs, dup):
    if dup:
        docs = docs + [docs[0]]  # plant a near-dup pair
    texts = [" ".join(ws) for ws in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "source": ["web"] * len(texts),
                "text": texts,
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["blocking_strategy_compare"].sql
        ).fetchall()
    }

    # shingles (distinct per doc)
    shg = {
        i: {" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)}
        for i, ws in enumerate(docs)
    }
    ids = [i for i in shg if shg[i]]

    truth = set()
    for x in ids:
        for y in ids:
            if x < y and shg[x] & shg[y]:
                c = len(shg[x] & shg[y])
                if 3 * c >= len(shg[x]) + len(shg[y]):
                    truth.add((x, y))

    # minhash bands
    def sig(i):
        mh = [min(_md5(f"{p}:{s}") for s in shg[i]) for p in range(4)]
        return (mh[0] + mh[1], mh[2] + mh[3])

    sigs = {i: sig(i) for i in ids}
    mpairs = {
        (x, y)
        for x in ids
        for y in ids
        if x < y and (sigs[x][0] == sigs[y][0] or sigs[x][1] == sigs[y][1])
    }

    # simhash
    def simhash(ws):
        from collections import Counter

        tf = Counter(ws)
        votes = [0] * 60
        for t, c in tf.items():
            h = _h60(t)
            for j in range(60):
                votes[j] += c * (((h >> j) & 1) * 2 - 1)
        return sum(1 << j for j in range(60) if votes[j] > 0)

    sh = {i: simhash(ws) for i, ws in enumerate(docs)}

    def bands(v):
        return [(j, (v >> (15 * j)) & 32767) for j in range(4)]

    spairs = set()
    for x in sh:
        for y in sh:
            if x < y and set(bands(sh[x])) & set(bands(sh[y])):
                if bin(sh[x] ^ sh[y]).count("1") <= 3:
                    spairs.add((x, y))

    # prefix fingerprint
    fps = {i: _md5(" ".join(ws[:8])) for i, ws in enumerate(docs)}
    ppairs = {
        (x, y) for x in fps for y in fps if x < y and fps[x] == fps[y]
    }

    nt = len(truth)

    def arm(pairs):
        nc = len(pairs)
        nf = len(pairs & truth)
        p = 0 if nc == 0 else (1000000 * nf) // nc
        r = 0 if nt == 0 else (1000000 * nf) // nt
        return (nc, nf, nt, p, r)

    assert got == {
        "minhash_band": arm(mpairs),
        "simhash_band": arm(spairs),
        "prefix_fingerprint": arm(ppairs),
    }
