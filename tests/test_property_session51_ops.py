"""Property-based semantics checks for the session-51 operators.

Models: a Python greedy-BPE trainer/applier (count desc, lexicographic
pair tiebreak — the Sennrich semantics bpe_train_merges already
property-proves, extended here through the APPLY step and the unit
accounting), a union-find over minhash-band candidate pairs + the
md5-13-16 fold coordinate for the leakage histogram, and an exact
weighted/naive average model. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _BPE_ROUNDS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _docs_con(texts: list[str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "source": [f"s{i % 2}" for i in range(len(texts))],
            }
        ),
    )
    return con


# ---------------------------------------------------------------------------
# bpe_apply_compression
# ---------------------------------------------------------------------------


def _bpe_model(word_counts: dict[str, int]):
    """Greedy BPE on word TYPES: returns per-word symbol counts after
    _BPE_ROUNDS merges."""
    syms = {w: list(w) for w in word_counts if len(w) >= 2}
    for _ in range(_BPE_ROUNDS):
        pc: dict[tuple[str, str], int] = {}
        for w, ss in syms.items():
            for i in range(len(ss) - 1):
                pc[(ss[i], ss[i + 1])] = pc.get((ss[i], ss[i + 1]), 0) + word_counts[w]
        if not pc:
            continue
        (a, b), _ = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == a and ss[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    return syms


_bpe_words = ["ab", "abc", "abab", "cd", "x", "abcd", "bc"]
_bpe_text = st.lists(st.sampled_from(_bpe_words), min_size=1, max_size=10).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_bpe_text, min_size=1, max_size=5))
def test_bpe_apply_matches_greedy_model(docs):
    con = _docs_con(docs)
    got = con.execute(REGISTRY["bpe_apply_compression"].sql).fetchall()[0]
    wc: dict[str, int] = {}
    for t in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    syms = _bpe_model(wc)
    n_types = len(wc)
    n_words = sum(wc.values())
    units_before = sum(c * len(w) for w, c in wc.items())
    units_after = sum(
        c * (len(syms[w]) if w in syms else len(w)) for w, c in wc.items()
    )
    comp = (
        0
        if units_before == 0
        else _round_away(1_000_000.0 * units_after / units_before)
    )
    assert got == (n_types, n_words, units_before, units_after, comp)
    assert units_after <= units_before  # merges never add units


# ---------------------------------------------------------------------------
# fold_leakage_check
# ---------------------------------------------------------------------------


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not sh:
        return set()
    mh = [min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh) for k in range(4)]
    return {mh[0] + mh[1], mh[2] + mh[3]}


_leak_text = st.lists(
    st.sampled_from(["aa bb cc dd", "aa bb cc", "ee ff gg hh", "ii jj kk"]),
    min_size=1,
    max_size=3,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_leak_text, min_size=2, max_size=8))
def test_fold_leakage_matches_unionfind(docs):
    con = _docs_con(docs)
    got = {r[0]: (r[1], r[2]) for r in con.execute(REGISTRY["fold_leakage_check"].sql).fetchall()}
    bands = [_mh_bands(t) for t in docs]
    # union-find over band-sharing pairs
    parent = list(range(len(docs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    in_pairs = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if bands[i] & bands[j]:
                in_pairs |= {i, j}
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    clusters: dict[int, list[int]] = {}
    for i in sorted(in_pairs):
        clusters.setdefault(find(i), []).append(i)
    hist: dict[int, list[int]] = {}
    for members in clusters.values():
        folds = {
            int(hashlib.md5(str(m).encode()).hexdigest()[12:16], 16) % 5
            for m in members
        }
        h = hist.setdefault(len(folds), [0, 0])
        h[0] += 1
        h[1] += len(members)
    assert got == {k: tuple(v) for k, v in hist.items()}


# ---------------------------------------------------------------------------
# weighted_avg_ttr
# ---------------------------------------------------------------------------

_wa_text = st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=9).map(
    " ".join
)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_wa_text, min_size=1, max_size=8))
def test_weighted_avg_matches_model(docs):
    con = _docs_con(docs)
    got = {
        r[0]: r[1:] for r in con.execute(REGISTRY["weighted_avg_ttr"].sql).fetchall()
    }
    per_src: dict[str, list[tuple[int, int]]] = {}
    for i, t in enumerate(docs):
        ws = t.split()
        if not ws:
            continue
        ttr = _round_away(1_000_000.0 * len(set(ws)) / len(ws))
        per_src.setdefault(f"s{i % 2}", []).append((len(ws), ttr))
    model = {}
    for s, rows in per_src.items():
        sw = sum(w for w, _ in rows)
        model[s] = (
            len(rows),
            _round_away(sum(w * v for w, v in rows) / float(sw)),
            _round_away(sum(v for _, v in rows) / float(len(rows))),
        )
    assert got == model
