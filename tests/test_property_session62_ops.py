"""Property-based semantics checks for the session-62 operators.

Models: an exact q6-first lognormal moment model, a full Python Burrows'
Delta replication (marker selection, q6 frequencies, guarded z-scores,
pairwise mean |Δz|), and a char-coverage cut model. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _CHAR_COV_KS, _DELTA_M, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    cents=st.lists(st.integers(min_value=-100, max_value=100000), min_size=1, max_size=40)
)
def test_lognormal_fit_matches_model(cents):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {"event_id": range(len(cents)), "value": [c / 100.0 for c in cents]}
        ),
    )
    n, mu, s2 = con.execute(REGISTRY["value_lognormal_fit"].sql).fetchall()[0]
    pos = [c for c in cents if c > 0]
    ls = [_round_away(1_000_000 * math.log(c)) for c in pos]
    assert n == len(pos)
    if not pos:
        assert (mu, s2) == (0, 0)
        return
    sl, sll = sum(ls), sum(x * x for x in ls)
    assert mu == _round_away(sl / float(n))
    if n < 2:
        assert s2 == 0
    else:
        assert s2 == _round_away(
            (sll / float(n) - (sl / float(n)) * (sl / float(n))) / 1_000_000.0
        )


_W = ["the", "of", "and", "alpha", "beta", "gamma"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=10).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["sa", "sb", "sc"]), _text), min_size=2, max_size=10
    )
)
def test_burrows_delta_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [t for _, t in docs],
                "source": [s for s, _ in docs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["burrows_delta_sources"].sql).fetchall()
    }
    stc: dict[tuple[str, str], int] = {}
    for s, t in docs:
        for w in t.split():
            stc[(s, w)] = stc.get((s, w), 0) + 1
    sources = sorted({s for s, _ in docs})
    stot = {s: sum(c for (ss, _), c in stc.items() if ss == s) for s in sources}
    cf: dict[str, int] = {}
    for (_, w), c in stc.items():
        cf[w] = cf.get(w, 0) + c
    markers = sorted(cf, key=lambda w: (-cf[w], w))[:_DELTA_M]
    fq = {
        (s, w): _round_away(1_000_000.0 * stc.get((s, w), 0) / stot[s])
        for s in sources
        for w in markers
    }
    z = {}
    for w in markers:
        vals = [fq[(s, w)] for s in sources]
        k = len(vals)
        s_, ss = sum(vals), sum(v * v for v in vals)
        for src in sources:
            if k < 2 or k * ss == s_ * s_:
                z[(src, w)] = 0
            else:
                mean = s_ / float(k)
                std = math.sqrt(ss / float(k) - mean * mean)
                z[(src, w)] = _round_away(1_000_000 * (fq[(src, w)] - mean) / std)
    model = {}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            diffs = [abs(z[(sa, w)] - z[(sb, w)]) for w in markers]
            model[(sa, sb)] = _round_away(sum(diffs) / float(len(diffs)))
    assert got == model


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(st.text(alphabet="abcdef gh", min_size=0, max_size=20), min_size=1, max_size=6))
def test_char_coverage_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["char_coverage_curve"].sql).fetchall()}
    counts: dict[str, int] = {}
    for t in docs:
        for c in t.lower():
            counts[c] = counts.get(c, 0) + 1
    order = sorted(counts, key=lambda c: (-counts[c], c))
    total = sum(counts.values())
    model = {}
    for k in _CHAR_COV_KS:
        cut = order[:k]
        cov = sum(counts[c] for c in cut)
        model[k] = (
            len(cut),
            cov,
            0 if total == 0 else _round_away(1_000_000.0 * cov / total),
        )
    assert got == model
    # coverage is monotone in k
    covs = [model[k][2] for k in _CHAR_COV_KS]
    assert covs == sorted(covs)
