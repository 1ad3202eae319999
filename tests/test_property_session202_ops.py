"""Property-based semantics checks for the session-202 operators.

DuckDB-only (oracle SQL vs exact Python models).
minhash_collision_calibration: brute-force Jaccard deciles + the band
collision theory replayed per pair; theil_sen_daily_trend: median of
pairwise slopes vs a brute-force model incl. the trunc-division
quantization; storage_tier_advisor: the age-tier byte model in Python.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


_WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _shingles(words):
    return (
        {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if len(words) >= 3
        else set()
    )


def _bands(sh):
    if not sh:
        return []
    mins = [
        min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sh)
        for p in range(4)
    ]
    return [mins[0] + mins[1], mins[2] + mins[3]]


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
        min_size=1,
        max_size=10,
    )
)
def test_minhash_collision_calibration_matches_model(docs):
    texts = [" ".join(ws) for ws in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "source": "s"}
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["minhash_collision_calibration"].sql
        ).fetchall()
    }

    shs = [_shingles(tokenize(t)) for t in texts]
    bands = [_bands(s) for s in shs]
    cells = {d: [0, 0, 0] for d in range(10)}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(shs[i] & shs[j])
            if inter == 0:
                continue
            un = len(shs[i] | shs[j])
            dec = min(9, (10 * inter) // un)
            j2 = (float(inter) * inter) / (float(un) * un)
            th = _round_away(1000000 * (1 - (1 - j2) * (1 - j2)))
            is_cand = 1 if set(bands[i]) & set(bands[j]) else 0
            cells[dec][0] += 1
            cells[dec][1] += is_cand
            cells[dec][2] += th
    model = {
        d: (
            c[0],
            c[1],
            (1000000 * c[1]) // max(c[0], 1),
            c[2] // max(c[0], 1),
        )
        for d, c in cells.items()
    }
    assert got == model
    # candidates never exceed pairs, and decile-9 pairs (near-identical
    # shingle sets) always collide: J=1 means identical minima per perm
    for d, (np_, nc, _, _) in got.items():
        assert nc <= np_


_T0 = datetime.datetime(2024, 7, 1)


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=60)
)
def test_theil_sen_matches_bruteforce(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"ts": [_T0 + datetime.timedelta(days=d) for d in days]}),
    )
    got = con.execute(REGISTRY["theil_sen_daily_trend"].sql).fetchall()
    assert len(got) == 1

    lo, hi = min(days), max(days)
    counts = [sum(1 for d in days if d == x) for x in range(lo, hi + 1)]
    n_days = len(counts)
    slopes = []
    for i in range(n_days):
        for j in range(i + 1, n_days):
            slopes.append(_trunc_div(1000000 * (counts[j] - counts[i]), j - i))
    slopes.sort()
    npairs = len(slopes)
    if npairs:
        v_lo = slopes[(npairs - 1) // 2]
        v_hi = slopes[npairs // 2]
        med = _round_away((v_lo + v_hi) / 2.0)
        n_pos = sum(1 for s in slopes if s > 0)
        n_neg = sum(1 for s in slopes if s < 0)
        n_zero = npairs - n_pos - n_neg
        assert got[0] == (n_days, npairs, med, n_pos, n_neg, n_zero)
    else:
        # single-day stream: no pairs → zero sentinels everywhere
        assert got[0] == (1, 0, 0, 0, 0, 0)


@settings(max_examples=40, deadline=None)
@given(
    ships=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.sampled_from(["R", "N"]),
            st.sampled_from(["O", "F"]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_storage_tier_advisor_matches_model(ships):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_shipdate": [
                    _T0 + datetime.timedelta(days=d) for d, _, _ in ships
                ],
                "l_returnflag": [rf for _, rf, _ in ships],
                "l_linestatus": [ls for _, _, ls in ships],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["storage_tier_advisor"].sql).fetchall()
    }

    mx = max(d for d, _, _ in ships)
    cells = {t: [0, 0] for t in ("a_hot", "b_warm", "c_cool", "d_cold")}
    for d, rf, ls in ships:
        age = mx - d
        t = (
            "a_hot"
            if age < 30
            else "b_warm" if age < 90 else "c_cool" if age < 180 else "d_cold"
        )
        cells[t][0] += 1
        cells[t][1] += 72 + len(rf) + 4 + len(ls) + 4
    tn = len(ships)
    model = {
        t: (c[0], c[1], (1000000 * c[0]) // max(tn, 1)) for t, c in cells.items()
    }
    assert got == model
