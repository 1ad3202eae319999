"""Property-based semantics checks for the session-21 operators.

Models: a pure-Python CDC chunker (md5-slice boundaries), float-mean z^2
over generated day counts, and a Counter+math.log Zipf fit. Plus the
GLOBAL registry-binding invariant (the @register decorator binds to
whatever def follows — a helper inserted between decorator and function
silently mis-maps, which once shipped an exception class as a query).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_WORDS = ["fast", "scan", "spark", "join", "hash", "the", "x9", "dup"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=24)
_corpus = st.lists(_doc, min_size=1, max_size=12)
_days = st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=60)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _doc_con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "source": [f"src{i % 3}" for i in range(len(docs))],
            "lang": ["en"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


def _is_boundary(term: str) -> bool:
    return int(hashlib.md5(term.encode()).hexdigest()[:4], 16) % 16 == 0


def _cdc_chunks(toks: list[str]) -> list[str]:
    chunks: list[list[str]] = []
    cur: list[str] = []
    for t in toks:
        if _is_boundary(t):
            if cur:
                chunks.append(cur)
            cur = [t]
        else:
            cur.append(t)
    if cur:
        chunks.append(cur)
    return [" ".join(c) for c in chunks]


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_cdc_chunk_dedup_matches_model(docs):
    con = _doc_con(docs)
    got = con.execute(REGISTRY["cdc_chunk_dedup"].sql).fetchall()
    per_src: dict[str, list[str]] = {}
    for i, d in enumerate(docs):
        if d:
            per_src.setdefault(f"src{i % 3}", []).extend(_cdc_chunks(d))
    model = []
    for src in sorted(per_src):
        ch = per_src[src]
        n, nd = len(ch), len(set(ch))
        model.append((src, n, nd, (n - nd) * 1_000_000 // n))
    assert got == model
    # CDC invariant: an edit before a boundary never changes chunks after it —
    # prepending junk to a doc keeps every chunk from the first boundary on
    for d in docs:
        if len(d) >= 2 and any(_is_boundary(t) for t in d):
            edited = ["zzz"] + d
            tail = lambda cs: cs[next(i for i, c in enumerate(cs) if _is_boundary(c.split()[0])):]  # noqa: E731
            assert tail(_cdc_chunks(edited)) == tail(_cdc_chunks(d))


@settings(max_examples=40, deadline=None)
@given(days=_days)
def test_events_daily_anomaly_matches_model(days):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(days)),
            "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=3) for d in days],
            "user_id": [i % 5 for i in range(len(days))],
            "event_type": ["view"] * len(days),
            "value": [1.0] * len(days),
            "props": ["{}"] * len(days),
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(REGISTRY["events_daily_anomaly"].sql).fetchall()
    base = int(pd.Timestamp("2024-01-01").timestamp()) // 86400
    counts = Counter(base + d for d in days)
    nd = len(counts)
    s = sum(counts.values())
    ss = sum(v * v for v in counts.values())
    model = []
    for day in sorted(counts):
        n = counts[day]
        if nd < 2 or nd * ss == s * s:
            z2 = 0
        else:
            dev = (nd * n - s) / nd
            var = (nd * ss - s * s) / (nd * nd)
            z2 = _round_away(1_000_000 * (dev * dev) / var)
        model.append((day, n, z2, 1 if z2 >= 4_000_000 else 0))
    assert got == model


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_zipf_slope_matches_model(docs):
    con = _doc_con(docs)
    got = con.execute(REGISTRY["zipf_slope_source"].sql).fetchall()
    per_src: dict[str, Counter] = {}
    for i, d in enumerate(docs):
        per_src.setdefault(f"src{i % 3}", Counter()).update(d)
    model = []
    for src in sorted(per_src):
        freqs = per_src[src]
        if not freqs:
            continue
        ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (
                _round_away(1_000_000 * math.log(rnk)),
                _round_away(1_000_000 * math.log(f)),
            )
            for rnk, (_, f) in enumerate(ranked, start=1)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        if n < 2 or n * sxx == sx * sx:
            slope = 0
        else:
            slope = _round_away(
                1_000_000 * (sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n))
            )
        model.append((src, n, slope))
    assert got == model


def test_registry_binding_global():
    assert len(REGISTRY) >= 166
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
        assert q.fn.__name__ == name, (name, q.fn.__name__)
