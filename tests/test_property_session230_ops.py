"""Session-230 operator checks (hll_window_users,
postings_skiplist_estimate). DuckDB-only exact models."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _SKIP_INTERVAL,
    _SKIP_MAX_LEVELS,
)
from docix_spark.analysis.tokenizer import tokenize

_WORDS = ["alpha", "beta", "gamma", "delta", "x"]


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5 * 3600 - 1),  # seconds
            st.integers(min_value=1, max_value=30),  # user_id
        ),
        min_size=1,
        max_size=60,
    )
)
def test_hll_window_users_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "ts": pd.to_datetime([e[0] for e in events], unit="s"),
                "user_id": [e[1] for e in events],
            }
        ),
    )
    got = con.execute(REGISTRY["hll_window_users"].sql).fetchall()

    per = {}
    for sec, uid in events:
        w = (sec // 3600) * 3600
        per.setdefault(w, set()).add(uid)
    model = []
    for w in sorted(per):
        regs = {}
        for uid in per[w]:
            h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
            reg = h % 256
            suf = h >> 8
            rnk = 53 if suf == 0 else 53 - suf.bit_length()
            regs[reg] = max(regs.get(reg, 0), rnk)
        zeros = 256 - len(regs)
        z_int = sum(1 << (53 - m) for m in regs.values()) + zeros * (1 << 53)
        raw = 4.2399330249068963e20 / float(z_int)
        est = 256.0 * __import__("math").log(256.0 / zeros) if (raw <= 640.0 and zeros > 0) else raw
        model.append((w, len(per[w]), int(round(est * 1_000_000)), len(regs)))
    assert got == [m[:3] for m in model]
    for (_, n_exact, hll_q6), (_, _, _, r) in zip(got, model):
        assert hll_q6 > 0
        # tiny windows run linear counting, which estimates the number of
        # OCCUPIED registers (register collisions genuinely lose users —
        # that is HLL, not a bug): est ~= 256*ln(256/(256-r)) >= r
        if n_exact <= 10:
            assert abs(hll_q6 - r * 1_000_000) <= 120_000 * max(r, 1) + 30_000 * r * r
            assert r <= n_exact  # collisions only ever shrink r


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
        min_size=1,
        max_size=25,
    )
)
def test_postings_skiplist_estimate_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["postings_skiplist_estimate"].sql).fetchall()

    df = Counter()
    for ws in docs:
        for t in set(tokenize(" ".join(ws))):
            df[t] += 1
    bands = {}
    for t, d in df.items():
        band = d.bit_length() - 1
        skips = sum(d // _SKIP_INTERVAL ** l for l in range(1, _SKIP_MAX_LEVELS + 1))
        lv = (d.bit_length() // 3) if d >= _SKIP_INTERVAL else 0
        n, tp, sk, mx = bands.get(band, (0, 0, 0, 0))
        bands[band] = (n + 1, tp + d, sk + skips, max(mx, lv))
    model = [
        (b, n, tp, sk, mx, (1_000_000 * sk) // tp)
        for b, (n, tp, sk, mx) in sorted(bands.items())
    ]
    assert got == model
    for b, n, tp, sk, mx, share in got:
        # a skip ladder with interval 8 never exceeds 1/7 of the postings
        assert sk * 7 <= tp
        assert share <= 142_858
        assert 0 <= mx <= _SKIP_MAX_LEVELS + 1
