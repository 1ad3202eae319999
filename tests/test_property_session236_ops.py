"""Session-236 checks (dedup_normalization_curve,
lsh_edit_robustness_curve). DuckDB-only exact models; duplicates and
case/whitespace variants are INJECTED (the sandbox corpus has none)."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _LER_KS
from docix_spark.analysis.tokenizer import tokenize

_TEXTS = ["Alpha Beta", "alpha beta", "alpha  beta", "ALPHA BETA", "gamma x", "gamma  X"]


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(st.sampled_from(_TEXTS), min_size=1, max_size=16))
def test_dedup_normalization_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(1, len(docs) + 1), "text": docs}),
    )
    got = con.execute(REGISTRY["dedup_normalization_curve"].sql).fetchall()

    def tally(keys):
        from collections import Counter

        c = Counter(keys)
        return (
            len(c),
            sum(v for v in c.values() if v > 1),
            sum(v - 1 for v in c.values()),
        )

    model = [
        (1, "raw", *tally(docs)),
        (2, "lower", *tally([t.lower() for t in docs])),
        (3, "tokens", *tally([" ".join(tokenize(t)) for t in docs])),
    ]
    assert got == model
    # tiers only merge groups: groups nonincreasing, drops nondecreasing
    groups = [r[2] for r in got]
    drops = [r[4] for r in got]
    assert groups == sorted(groups, reverse=True)
    assert drops == sorted(drops)


_W = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_W), min_size=1, max_size=12),
        min_size=1,
        max_size=10,
    )
)
def test_lsh_edit_robustness_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(docs) + 1), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["lsh_edit_robustness_curve"].sql).fetchall()

    def sig(toks):
        sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        if not sh:
            return None, set()
        mh = lambda p: min(hashlib.md5(f"{p}:{x}".encode()).hexdigest() for x in sh)
        return (mh(0) + mh(1), mh(2) + mh(3)), set(sh)

    model = []
    for k in sorted(_LER_KS):
        nd = nc = sni = snu = 0
        for ws in docs:
            toks = tokenize(" ".join(ws))
            twin = [t for i, t in enumerate(toks, start=1) if i % k != 0]
            so, go = sig(toks)
            sp, gp = sig(twin)
            if so is None or sp is None:
                continue
            nd += 1
            nc += int(so[0] == sp[0] or so[1] == sp[1])
            sni += len(go & gp)
            snu += len(go | gp)
        model.append(
            (
                k,
                nd,
                nc,
                (1_000_000 * nc) // nd if nd else 0,
                (1_000_000 * sni) // snu if snu else 0,
            )
        )
    assert got == model
    # lighter edits (bigger k) keep more shingle mass
    jk = {r[0]: r[4] for r in got}
    assert jk[2] <= jk[4] <= jk[8]
