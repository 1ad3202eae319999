"""Property-based semantics checks for the session-27 operators.

Models: a weighted-Counter PPMI with the exact divide-first float form,
a pure-Python minhash banding sweep with exact-Jaccard verification
(plus the candidate-set nesting invariant), and the md5 HLL register
table. DuckDB-only (ms per example).
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
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=120)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _con(docs: list[list[str]]) -> duckdb.DuckDBPyConnection:
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


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_cooccurrence_ppmi_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["cooccurrence_ppmi"].sql).fetchall()
    pc: Counter = Counter()
    uc: Counter = Counter()
    for d in docs:
        for t in d:
            uc[t] += 1
        for i in range(len(d) - 1):
            pc[tuple(sorted((d[i], d[i + 1])))] += 2
        for i in range(len(d) - 2):
            pc[tuple(sorted((d[i], d[i + 2])))] += 1
    n_tok, w_tot = sum(uc.values()), sum(pc.values())
    rows = []
    for (a, b), w_ab in pc.items():
        if w_ab < 4:
            continue
        pmi = math.log(
            (w_ab / float(w_tot)) / ((uc[a] / float(n_tok)) * (uc[b] / float(n_tok)))
        )
        rows.append((a, b, w_ab, _round_away(1_000_000 * max(0.0, pmi))))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == rows[:30]
    # PPMI is clamped nonnegative and pairs respect the min-count guard
    for a, b, w_ab, q in got:
        assert q >= 0 and w_ab >= 4 and a <= b


def _mh(seed: int, sh: str) -> str:
    return hashlib.md5(f"{seed}:{sh}".encode()).hexdigest()


def _shingles(d: list[str]) -> set[str]:
    return {" ".join(d[i : i + 3]) for i in range(len(d) - 2)}


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_lsh_band_config_curve_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["lsh_band_config_curve"].sql).fetchall()
    sigs = {}
    shs = {}
    for i, d in enumerate(docs):
        s = _shingles(d)
        if s:
            shs[i] = s
            sigs[i] = [min(_mh(k, x) for x in s) for k in range(4)]
    bandsets = {
        1: lambda m: ["0:" + m[0] + m[1] + m[2] + m[3]],
        2: lambda m: ["0:" + m[0] + m[1], "1:" + m[2] + m[3]],
        4: lambda m: [f"{j}:" + m[j] for j in range(4)],
    }
    model = []
    cand_by_b = {}
    for b in (1, 2, 4):
        buckets: dict[str, list[int]] = {}
        for i, m in sigs.items():
            for band in bandsets[b](m):
                buckets.setdefault(band, []).append(i)
        pairs = {
            (x, y)
            for ids in buckets.values()
            for x in ids
            for y in ids
            if x < y
        }
        cand_by_b[b] = pairs
        n_true = 0
        for x, y in pairs:
            c = len(shs[x] & shs[y])
            if 3 * c >= len(shs[x]) + len(shs[y]):
                n_true += 1
        prec = 0 if not pairs else (n_true * 1_000_000) // len(pairs)
        model.append((b, 4 // b, len(pairs), n_true, prec))
    assert got == model
    # candidate sets nest: stricter configs are subsets of looser ones
    assert cand_by_b[1] <= cand_by_b[2] <= cand_by_b[4]


_users = st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=400)


@settings(max_examples=40, deadline=None)
@given(uids=_users)
def test_hll_user_registers_matches_model(uids):
    con = duckdb.connect()
    con.register("events", pd.DataFrame({"user_id": uids}))
    got = con.execute(REGISTRY["hll_user_registers"].sql).fetchall()
    regs: dict[int, int] = {}
    for u in uids:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        reg, w = h % 256, h >> 8
        rnk = 53 if w == 0 else 53 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rnk)
    assert got == sorted(regs.items())
    # duplicate-insensitivity: max-merge absorbs replays
    con2 = duckdb.connect()
    con2.register("events", pd.DataFrame({"user_id": uids + uids}))
    assert con2.execute(REGISTRY["hll_user_registers"].sql).fetchall() == got


def test_registry_names_bound():
    for name in [
        "cooccurrence_ppmi",
        "lsh_band_config_curve",
        "hll_user_registers",
    ]:
        assert REGISTRY[name].fn.__name__ == name
