"""Property-based semantics checks for the session-215 operators.

DuckDB-only. gates_fleiss_kappa and gate_shapley_attribution run
against exact Python models (incl. the Shapley efficiency identity);
ann_adaptive_nprobe_eval is checked on the real sandbox table through
its structural guarantees (fixed1 ⊆ adaptive ⊆ fixed3 scan costs,
recall monotone over nested candidate sets).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize


_LANGS = ["en", "zh", "fr"]
_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj"]


def _flags(docs):
    out = []
    for l, ws in docs:
        ts = tokenize(" ".join(ws))
        n_tok, n_distinct = len(ts), len(set(ts))
        out.append(
            (
                1 if n_tok >= 8 else 0,
                1 if 5 * n_distinct >= 2 * n_tok else 0,
                1 if l != "zh" else 0,
            )
        )
    return out


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(_LANGS),
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=15),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_fleiss_kappa_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [l for l, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["gates_fleiss_kappa"].sql).fetchall()
    assert len(got) == 1

    fl = _flags(docs)
    n = len(fl)
    t = sum(sum(f) for f in fl)
    s6 = sum(6 if sum(f) in (0, 3) else 2 for f in fl)
    pbar = float(s6) / (6 * n)
    p = float(t) / (3 * n)
    pe = p * p + (1 - p) * (1 - p)

    def ra(v):
        return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))

    if t == 0 or t == 3 * n:
        k = 0
    else:
        k = ra(1000000 * (pbar - pe) / (1 - pe))
    assert got[0] == (n, ra(1000000 * pbar), ra(1000000 * pe), k)


def _tdiv(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(_LANGS),
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=15),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_gate_shapley_matches_model_and_efficiency(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [l for l, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["gate_shapley_attribution"].sql).fetchall()
    }

    fl = _flags(docs)
    n = len(fl)
    na = sum(a for a, _, _ in fl)
    nb = sum(b for _, b, _ in fl)
    nc = sum(c for _, _, c in fl)
    nab = sum(a * b for a, b, _ in fl)
    nac = sum(a * c for a, _, c in fl)
    nbc = sum(b * c for _, b, c in fl)
    nabc = sum(a * b * c for a, b, c in fl)
    nums = {
        "a_length": 2 * (na - n) + (nab - nb) + (nac - nc) + 2 * (nabc - nbc),
        "b_ttr": 2 * (nb - n) + (nab - na) + (nbc - nc) + 2 * (nabc - nac),
        "c_lang": 2 * (nc - n) + (nac - na) + (nbc - nb) + 2 * (nabc - nab),
    }
    solos = {"a_length": na, "b_ttr": nb, "c_lang": nc}
    model = {
        g: (_tdiv(1000000 * num, 6 * n), (1000000 * solos[g]) // n)
        for g, num in nums.items()
    }
    assert got == model
    # efficiency on the exact numerators: sum of phis = v(ABC) - v(empty)
    assert sum(nums.values()) == 6 * (nabc - n)
    # gates only remove mass
    assert all(phi <= 0 for phi, _ in got.values())


def test_adaptive_nprobe_structural_guarantees():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        " '/root/testdata/sf0.001/embeddings.parquet'"
    )
    rows = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["ann_adaptive_nprobe_eval"].sql).fetchall()
    }
    assert set(rows) == {"a_fixed1", "b_adaptive", "c_fixed3"}
    nq = rows["a_fixed1"][0]
    assert all(r[0] == nq for r in rows.values())
    # candidate sets nest: fixed1 <= adaptive <= fixed3 in scan cost
    assert rows["a_fixed1"][3] <= rows["b_adaptive"][3] <= rows["c_fixed3"][3]
    # recall is monotone over nested candidate sets (the nprobe-curve proof)
    assert rows["a_fixed1"][1] <= rows["b_adaptive"][1] <= rows["c_fixed3"][1]
