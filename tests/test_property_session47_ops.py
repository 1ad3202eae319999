"""Property-based semantics checks for the session-47 operators.

Models: brute-force two-sample KS / Mann-Whitney over the raw value lists
(the oracle only ever sees the weighted histogram — these tests prove the
histogram+window decomposition equals the textbook pairwise definitions),
and a Python float model of the Jensen-Shannon decomposition (shared-term
q6-first contributions + the single residual-mass expression) checked for
exact equality — every float expression in the oracle is replicated
operation-for-operation, so libm/IEEE agreement on this box makes the q6
outputs bit-identical. DuckDB-only (ms per example).
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _LN2_HALF, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _docs_con(rows: list[tuple[str, str, str]]) -> duckdb.DuckDBPyConnection:
    """rows: (text, lang, source)."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [r[0] for r in rows],
                "lang": [r[1] for r in rows],
                "source": [r[2] for r in rows],
            }
        ),
    )
    return con


_lens = st.lists(st.integers(min_value=0, max_value=12), min_size=0, max_size=10)


# ---------------------------------------------------------------------------
# ks_test_doclen — histogram/window D == brute-force sup |F_a - F_b|
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(a=_lens, b=_lens)
def test_ks_matches_bruteforce(a, b):
    rows = [("w " * n, "en", "s0") for n in a] + [("w " * n, "zh", "s0") for n in b]
    rows.append(("w w w", "de", "s0"))  # an ignored third language
    con = _docs_con(rows)
    na, nb, d_q6, at = con.execute(REGISTRY["ks_test_doclen"].sql).fetchall()[0]
    assert (na, nb) == (len(a), len(b))
    values = sorted(set(a) | set(b))
    if not values:
        assert (d_q6, at) == (0, -1)  # totalized degenerate case
        return
    # exact rational sup-difference over the pooled support
    best, best_at = Fraction(-1), None
    for v in values:
        cuma = sum(1 for x in a if x <= v)
        cumb = sum(1 for x in b if x <= v)
        diff = abs(
            Fraction(len(b) * cuma - len(a) * cumb)
        )  # |nb*cum_a - na*cum_b| (scaled by na*nb)
        if diff > best:
            best, best_at = diff, v
    if len(a) * len(b) == 0:
        assert d_q6 == 0
    else:
        assert d_q6 == _round_away(1_000_000.0 * int(best) / (len(a) * len(b)))
    assert at == best_at


# ---------------------------------------------------------------------------
# mannwhitney_doclen — histogram 2U == brute-force pair count with ties
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(a=_lens, b=_lens)
def test_mwu_matches_bruteforce(a, b):
    rows = [("w " * n, "en", "s0") for n in a] + [("w " * n, "zh", "s0") for n in b]
    rows.append(("w w w", "de", "s0"))  # ignored third language; anchors the table
    con = _docs_con(rows)
    out = con.execute(REGISTRY["mannwhitney_doclen"].sql).fetchall()
    na, nb, u2, rb_q6 = out[0]
    assert (na, nb) == (len(a), len(b))
    want_u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    assert u2 == want_u2
    if len(a) * len(b) == 0:
        assert rb_q6 == 0
    else:
        assert rb_q6 == _round_away(
            1_000_000.0 * (want_u2 - len(a) * len(b)) / (len(a) * len(b))
        )


# ---------------------------------------------------------------------------
# jsd_source_pairs — decomposed shared+residual == direct float model, and
# the invariants 0 <= JSD <= ln 2 (up to q6 rounding slack)
# ---------------------------------------------------------------------------

_VOCAB = ["alpha", "beta", "gamma", "delta"]
_texts = st.lists(
    st.sampled_from(_VOCAB), min_size=1, max_size=8
).map(lambda ws: " ".join(ws))


@settings(max_examples=40, deadline=None)
@given(
    ta=st.lists(_texts, min_size=1, max_size=4),
    tb=st.lists(_texts, min_size=1, max_size=4),
)
def test_jsd_matches_float_model(ta, tb):
    rows = [(t, "en", "sa") for t in ta] + [(t, "en", "sb") for t in tb]
    con = _docs_con(rows)
    got = con.execute(REGISTRY["jsd_source_pairs"].sql).fetchall()
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for t in ta:
        for w in t.split():
            ca[w] = ca.get(w, 0) + 1
    for t in tb:
        for w in t.split():
            cb[w] = cb.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    shared = sorted(set(ca) & set(cb))
    if not shared:
        assert got == []  # the pair join carries co-occurring terms only
        return
    int_q6 = 0
    for w in shared:
        pa, pb = ca[w] / float(na), cb[w] / float(nb)
        int_q6 += _round_away(
            500_000
            * (pa * math.log(2 * pa / (pa + pb)) + pb * math.log(2 * pb / (pa + pb)))
        )
    sa_int = sum(ca[w] for w in shared)
    sb_int = sum(cb[w] for w in shared)
    resid = _round_away(
        1_000_000 * float(_LN2_HALF) * ((na - sa_int) / float(na) + (nb - sb_int) / float(nb))
    )
    assert len(got) == 1
    src_a, src_b, n_shared, jsd_q6 = got[0]
    assert (src_a, src_b, n_shared) == ("sa", "sb", len(shared))
    assert jsd_q6 == int_q6 + resid
    # bounded: 0 <= JSD <= ln 2, with one q6 ulp of rounding slack per term
    slack = len(shared) + 1
    assert -slack <= jsd_q6 <= _round_away(1_000_000 * math.log(2.0)) + slack
