"""Property-based semantics checks for the session-94 operators.

Models: DP noisy counts against a literal seeded-Laplace model, the
length-bias audit against a full BM25 + band model, daily CTR against
direct counting. DuckDB-only.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.sampled_from(["s0", "s1", "s2"]), min_size=1, max_size=25
    )
)
def test_dp_counts_match_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "source": docs, "text": [""] * len(docs)}
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["dp_source_counts"].sql).fetchall()
    }
    model = {}
    for src in set(docs):
        n = docs.count(src)
        k = int(hashlib.md5(f"dp:{src}".encode()).hexdigest()[:13], 16)
        u = k / 4503599627370496.0
        sgn = -1.0 if u >= 0.5 else 1.0
        noise = sgn * math.log(
            max(1.0 - 2.0 * abs(u - 0.5), 2.220446049250313e-16)
        )
        noisy = _round_away(1_000_000 * (n + noise))
        model[src] = (n, noisy, abs(noisy - 1_000_000 * n))
        # eps=1 Laplace noise is small with overwhelming probability
        assert abs(noisy - 1_000_000 * n) < 40_000_000
    assert got == model


_WB = list(_RANKEVAL_TERMS) + ["zz", "yy"]
_textb = st.lists(st.sampled_from(_WB), min_size=1, max_size=10).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textb, min_size=1, max_size=12))
def test_length_band_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["score_by_length_band"].sql).fetchall()
    }
    tfs: dict[tuple[int, str], int] = {}
    dfc: dict[str, int] = {}
    dls: dict[int, int] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
    nd = len(docs)
    avgdl = sum(dls.values()) / float(nd)
    scores = {}
    for d in range(nd):
        ss = []
        for w in _RANKEVAL_TERMS:
            if (d, w) not in tfs:
                continue
            tf = tfs[(d, w)]
            ss.append(
                math.log(1.0 + (nd - dfc[w] + 0.5) / (dfc[w] + 0.5))
                * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            )
        if ss:
            scores[d] = _round_away(sum(ss) * 1_000_000)
    model: dict[int, list] = {}
    for d, ln in dls.items():
        band = ln.bit_length() - 1
        cell = model.setdefault(band, [0, 0, 0])
        cell[0] += 1
        if d in scores:
            cell[1] += 1
            cell[2] += scores[d]
    want = {
        band: (
            nd_,
            nm,
            (1_000_000 * nm) // nd_,
            0 if nm == 0 else ssum // nm,
        )
        for band, (nd_, nm, ssum) in model.items()
    }
    assert got == want


_CT0 = datetime.datetime(2024, 6, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_daily_ctr_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [_CT0 + datetime.timedelta(days=d) for d, _ in events],
                "event_type": [e for _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["daily_ctr"].sql).fetchall()
    }
    day0 = (_CT0 - datetime.datetime(1970, 1, 1)).days
    per: dict[int, list[int]] = {}
    for d, e in events:
        cell = per.setdefault(day0 + d, [0, 0])
        if e == "view":
            cell[0] += 1
        elif e == "click":
            cell[1] += 1
    model = {
        d: (v, c, 0 if v == 0 else (1_000_000 * c) // v)
        for d, (v, c) in per.items()
    }
    assert got == model
