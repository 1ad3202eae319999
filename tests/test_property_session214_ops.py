"""Property-based semantics checks for the session-214 operators.

DuckDB-only (oracle SQL vs exact Python models): cell-convention
average precision, beta-binomial method-of-moments, and the
post-stratified estimator incl. its missing-stratum renormalization.
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


_WORDS = ["aa", "bb", "cc", "dd"]


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
        min_size=2,
        max_size=16,
    ),
    dup_pairs=st.integers(min_value=0, max_value=3),
)
def test_quality_gate_pr_auc_matches_model(docs, dup_pairs):
    texts = [" ".join(ws) for ws in docs]
    # inject exact duplicates so the positive class is non-degenerate
    for k in range(min(dup_pairs, len(texts))):
        texts.append(texts[k])
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = con.execute(REGISTRY["quality_gate_pr_auc"].sql).fetchall()
    assert len(got) == 1

    from collections import Counter

    hh = Counter(texts)
    rows = []
    for t in texts:
        ts = tokenize(t)
        ttr = _round_away(1e6 * len(set(ts)) / len(ts))
        rows.append((ttr, 1 if hh[t] > 1 else 0))
    cells = {}
    for s, d in rows:
        c = cells.setdefault(s, [0, 0])
        if d:
            c[0] += 1
        else:
            c[1] += 1
    cp = cn = num = 0
    for s in sorted(cells):
        ca, cb = cells[s]
        cp += ca
        cn += cb
        num += ca * ((1000000 * cp) // (cp + cn))
    p, nn = cp, cn
    model = (
        p,
        nn,
        num // max(p, 1),
        (1000000 * p) // max(p + nn, 1),
    )
    assert got[0] == model


_T0 = datetime.datetime(2025, 6, 1)


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # views
            st.integers(min_value=0, max_value=20),  # clicks
        ),
        min_size=1,
        max_size=30,
    )
)
def test_eb_ctr_shrinkage_matches_model(users):
    rows = []
    for uid, (v, c) in enumerate(users):
        for k in range(v):
            rows.append((uid, "view", k))
        for k in range(c):
            rows.append((uid, "click", 100 + k))
    if not rows:
        rows.append((999, "error", 0))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "event_type": [r[1] for r in rows],
                "ts": [_T0 + datetime.timedelta(seconds=r[2]) for r in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["eb_ctr_shrinkage"].sql).fetchall()

    c3s = [(1000 * c) // v for v, c in users if v >= 1]
    # viewless users (and the error-only anchor) drop out of r
    n = len(c3s)
    if n == 0:
        # all users viewless -> r empty -> n=0 row filtered out entirely
        assert got == []
        return
    assert len(got) == 1
    s1, s2 = sum(c3s), sum(x * x for x in c3s)
    mr = float(s1) / (1000 * n)
    vr = (float(s2) * n - float(s1) * s1) / ((float(n) * n) * 1000000)
    bad = n < 2 or vr <= 0 or vr >= mr * (1 - mr)
    if bad:
        ab = al = be = 0
    else:
        abv = mr * (1 - mr) / vr - 1
        ab = _round_away(1000000 * abv)
        al = _round_away(1000000 * mr * abv)
        be = _round_away(1000000 * (1 - mr) * abv)
    model = (
        n,
        _round_away(1000000 * mr),
        _round_away(1000000000000 * vr),
        ab,
        al,
        be,
    )
    assert got[0] == model


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki", "books"]),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_post_stratified_estimate_matches_model(docs):
    texts = [" ".join("tok" for _ in range(k)) for _, k in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": texts,
            }
        ),
    )
    got = con.execute(REGISTRY["post_stratified_estimate"].sql).fetchall()
    assert len(got) == 1

    xs = [len(tokenize(t)) for t in texts]
    keyed = sorted(
        range(len(docs)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[8:12], i),
    )[:100]
    samp = [(docs[i][0], xs[i]) for i in keyed]
    n_sample = len(samp)
    raw = _round_away(1000000 * float(sum(x for _, x in samp)) / max(n_sample, 1))
    true = _round_away(1000000 * float(sum(xs)) / max(len(xs), 1))
    strata = {}
    for s, x in samp:
        st_ = strata.setdefault(s, [0, 0])
        st_[0] += 1
        st_[1] += x
    pop = {}
    for s, _ in docs:
        pop[s] = pop.get(s, 0) + 1
    covered = sum(pop[s] for s in strata)
    terms = [
        _round_away(
            1000000000 * (float(pop[s]) * sx) / (float(ns) * covered)
        )
        for s, (ns, sx) in strata.items()
    ]
    ps = sum(terms) // 1000
    model = (n_sample, raw, ps, true, abs(raw - true), abs(ps - true))
    assert got[0] == model
