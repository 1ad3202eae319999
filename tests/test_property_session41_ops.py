"""Property-based semantics checks for the session-41 operators.

Models: Python `re` over injected PII docs (the patterns live in the
RE2 ∩ Java ∩ Python-re subset, all three leftmost-greedy), an md5-split +
8-gram-set leakage model, the temperature epoch plan re-derived with
math.pow (same libm double on this box), a brute-force Adamic-Adar over the
oracle's OWN candidate pairs (session-17 convention), and calendar models
for the weekday profile and lag-7 serial diff. DuckDB-only hypothesis tests
— plus one Spark test driving pii_scrub_stats over a written parquet corpus
WITH real emails/IPs/URLs (the sandbox corpus is PII-free by construction,
so all-zero driver rows prove nothing about the counters).
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _EPOCH_BUDGET,
    _PII_PATTERNS,
    _SQL_LSH_PAIRS,
)

US_PER_DAY = 86_400_000_000


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _ts(us_list):
    return pd.to_datetime(pd.Series(us_list, dtype="int64"), unit="us")


def _docs_con(texts: list[str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "source": [f"src{i % 3}" for i in range(len(texts))],
            }
        ),
    )
    return con


# ---------------------------------------------------------------------------
# pii_scrub_stats — oracle vs Python-re model over injected PII
# ---------------------------------------------------------------------------

_PII_SNIPPETS = [
    "contact bob@example.com now",
    "server at 10.0.0.1 down",
    "see https://spark.apache.org/docs today",
    "batch 12345 done",
    "plain words only here",
    "a@b.io and 192.168.1.255 and http://x.y/z?q=1",
]


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(st.sampled_from(_PII_SNIPPETS), min_size=1, max_size=8))
def test_pii_scrub_stats_matches_re_model(docs):
    con = _docs_con(docs)
    got = con.execute(REGISTRY["pii_scrub_stats"].sql).fetchall()
    model = []
    for c, p in sorted(_PII_PATTERNS.items()):
        rx = re.compile(p)
        hits = [rx.findall(t) for t in docs]
        model.append(
            (
                c,
                sum(1 for h in hits if h),
                sum(len(h) for h in hits),
                sum(len(m) for h in hits for m in h),
            )
        )
    assert got == model


def test_pii_scrub_stats_spark_matches_oracle_on_injected_corpus(spark, tmp_root):
    """The driver corpus has zero PII by construction; drive the SPARK side
    over a written parquet corpus that actually hits every class."""
    texts = _PII_SNIPPETS * 3
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["inj"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = f"{tmp_root}/pii_sf"
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    got = [
        tuple(r)
        for r in REGISTRY["pii_scrub_stats"].fn(spark, sf).toPandas().itertuples(index=False)
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'")
    want = con.execute(REGISTRY["pii_scrub_stats"].sql).fetchall()
    assert got == want
    assert all(r[1] > 0 for r in want)  # every class actually fired


# ---------------------------------------------------------------------------
# split_leakage_check — oracle vs md5-split + gram-set model
# ---------------------------------------------------------------------------

_WORDS = ["a", "b", "c", "d"]
_long_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=18)


def _split_of(doc_id: int) -> str:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[4:8], 16) % 100
    return "train" if h < 98 else ("valid" if h == 98 else "test")


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_long_doc, min_size=1, max_size=60))
def test_split_leakage_check_matches_model(docs):
    con = _docs_con([" ".join(d) for d in docs])
    got = con.execute(REGISTRY["split_leakage_check"].sql).fetchall()
    grams = {
        i: {" ".join(d[j : j + 8]) for j in range(len(d) - 7)}
        for i, d in enumerate(docs)
    }
    train_g = set()
    for i, g in grams.items():
        if _split_of(i) == "train":
            train_g |= g
    agg: dict[str, list[int]] = {}
    for i, g in grams.items():
        sp = _split_of(i)
        if sp == "train" or not g:
            continue
        a = agg.setdefault(sp, [0, 0, 0, 0])
        leaked = len(g & train_g)
        a[0] += 1
        a[1] += 1 if leaked else 0
        a[2] += len(g)
        a[3] += leaked
    model = [
        (sp, a[0], a[1], a[2], a[3], (1_000_000 * a[3]) // a[2])
        for sp, a in sorted(agg.items())
    ]
    assert got == model
    for _, n_docs, n_leaked_docs, n_grams, n_leaked, _ in got:
        assert n_leaked_docs <= n_docs and n_leaked <= n_grams


# ---------------------------------------------------------------------------
# source_epoch_plan — oracle vs math.pow model; budget roughly conserved
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_long_doc, min_size=1, max_size=12))
def test_source_epoch_plan_matches_model(docs):
    con = _docs_con([" ".join(d) for d in docs])
    got = con.execute(REGISTRY["source_epoch_plan"].sql).fetchall()
    toks: dict[str, int] = {}
    for i, d in enumerate(docs):
        toks[f"src{i % 3}"] = toks.get(f"src{i % 3}", 0) + len(d)
    w = {s: _round_away(1_000_000 * math.pow(float(n), 0.7)) for s, n in toks.items()}
    tot = float(sum(w.values()))
    model = []
    for s in sorted(toks):
        tgt = 0 if tot == 0 else _round_away(_EPOCH_BUDGET * w[s] / tot)
        ep = 0 if toks[s] == 0 else (1_000_000 * tgt) // toks[s]
        model.append((s, toks[s], tgt, ep))
    assert got == model
    # rounding leaves the plan within |sources| tokens of the budget
    if tot > 0:
        assert abs(sum(r[2] for r in got) - _EPOCH_BUDGET) <= len(toks)


# ---------------------------------------------------------------------------
# lsh_common_neighbors — oracle vs brute-force AA over the oracle's pairs
# ---------------------------------------------------------------------------

_dup_doc = st.lists(st.sampled_from(["dup", "spark", "join", "x9"]), min_size=0, max_size=10)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_dup_doc, min_size=1, max_size=8))
def test_lsh_common_neighbors_matches_model(docs):
    con = _docs_con([" ".join(d) for d in docs])
    got = con.execute(REGISTRY["lsh_common_neighbors"].sql).fetchall()
    pairs = set(
        map(tuple, con.execute(_SQL_LSH_PAIRS + " SELECT doc_a, doc_b FROM pairs").fetchall())
    )
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    aaw = {v: _round_away(1_000_000 / math.log(float(len(ns)))) for v, ns in adj.items() if len(ns) >= 2}
    cn: dict[tuple[int, int], list[int]] = {}
    for w, ns in adj.items():
        if len(ns) < 2:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                a = cn.setdefault((u, v), [0, 0])
                a[0] += 1
                a[1] += aaw[w]
    model = [
        (u, v, c, aa, 1 if (u, v) in pairs else 0)
        for (u, v), (c, aa) in cn.items()
    ]
    model.sort(key=lambda r: (-r[2], -r[3], r[0], r[1]))
    assert got == model[:20]


# ---------------------------------------------------------------------------
# events_weekday_profile — always 7 rows; mass conservation; known weekday
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(ts=st.lists(st.integers(min_value=0, max_value=60 * US_PER_DAY), min_size=0, max_size=40))
def test_events_weekday_profile_matches_model(ts):
    con = duckdb.connect()
    con.register("events", pd.DataFrame({"event_id": range(len(ts)), "ts": _ts(ts)}))
    got = con.execute(REGISTRY["events_weekday_profile"].sql).fetchall()
    counts = [0] * 7
    for t in ts:
        counts[(t // US_PER_DAY + 3) % 7] += 1
    tot = sum(counts)
    model = [
        (d, n, 0 if tot == 0 else (1_000_000 * n) // tot)
        for d, n in enumerate(counts)
    ]
    assert got == model
    assert len(got) == 7  # spine keeps empty weekdays


def test_weekday_epoch_anchor():
    """1970-01-01 (epoch day 0) was a Thursday; dow encoding is 0=Monday."""
    con = duckdb.connect()
    con.register("events", pd.DataFrame({"event_id": [0], "ts": _ts([0])}))
    got = con.execute(REGISTRY["events_weekday_profile"].sql).fetchall()
    assert got[3] == (3, 1, 1_000_000)  # Thursday bucket


# ---------------------------------------------------------------------------
# events_serial_diff — lag-7 over the zero-filled calendar spine
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(days=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=50))
def test_events_serial_diff_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(days)),
                "ts": _ts([d * US_PER_DAY + 1000 for d in days]),
            }
        ),
    )
    got = con.execute(REGISTRY["events_serial_diff"].sql).fetchall()
    lo, hi = min(days), max(days)
    n = {d: 0 for d in range(lo, hi + 1)}
    for d in days:
        n[d] += 1
    model = [
        (d, n[d], n[d] - n[d - 7]) for d in range(lo + 7, hi + 1)
    ]
    assert got == model
    assert len(got) == max(0, hi - lo + 1 - 7)
