"""Property-based semantics checks for the session-97 operators.

Models: SRM chi² against a literal md5-arm model, the exact-dup census
against direct hashing (with INJECTED duplicate vectors — the i.i.d.
sandbox would never exercise the counters), and SERP diversity against
a full BM25 + entropy model. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(
        st.integers(min_value=0, max_value=300), min_size=1, max_size=40
    )
)
def test_srm_matches_model(users):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": range(len(users)), "user_id": users}),
    )
    n0, n1, chi2 = con.execute(REGISTRY["ab_srm_check"].sql).fetchall()[0]
    arms = [
        int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:4], 16) % 2
        for u in set(users)
    ]
    en0, en1 = arms.count(0), arms.count(1)
    assert (n0, n1) == (en0, en1)
    want = _round_away(
        1_000_000 * ((float(en0 - en1) * (en0 - en1)) / (en0 + en1))
    )
    assert chi2 == want


@settings(max_examples=30, deadline=None)
@given(
    base=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=4).map(lambda k: k / 64.0),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=8,
    ),
    copies=st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=6),
)
def test_exact_dups_match_model(base, copies):
    vecs = list(base) + [base[c % len(base)] for c in copies]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "label": [0] * len(vecs),
                "embedding": vecs,
            }
        ),
    )
    n_vecs, n_distinct, n_dup_groups, max_group = con.execute(
        REGISTRY["embedding_exact_dups"].sql
    ).fetchall()[0]
    keys = [
        ",".join(str(_round_away(1_000_000 * x)) for x in v) for v in vecs
    ]
    from collections import Counter

    c = Counter(keys)
    assert n_vecs == len(vecs)
    assert n_distinct == len(c)
    assert n_dup_groups == sum(1 for v in c.values() if v >= 2)
    assert max_group == max(c.values())


_WS = list(_RANKEVAL_TERMS) + ["zz", "yy"]
_texts = st.lists(st.sampled_from(_WS), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), _texts),
        min_size=1,
        max_size=12,
    )
)
def test_serp_diversity_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    rows = con.execute(REGISTRY["serp_source_diversity"].sql).fetchall()
    tfs: dict[tuple[int, str], int] = {}
    dfc: dict[str, int] = {}
    dls: dict[int, int] = {}
    for d, (_, t) in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
    nd = len(docs)
    avgdl = sum(dls.values()) / float(nd)
    scores = {}
    for d in range(nd):
        ss = []
        for w in _RANKEVAL_TERMS:
            if (d, w) not in tfs:
                continue
            tf = tfs[(d, w)]
            ss.append(
                math.log(1.0 + (nd - dfc[w] + 0.5) / (dfc[w] + 0.5))
                * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            )
        if ss:
            scores[d] = _round_away(sum(ss) * 1_000_000)
    page = sorted(scores, key=lambda d: (-scores[d], d))[:10]
    if not page:
        # no matching docs -> the page-source agg has no rows; the final
        # census still emits one all-empty row in both engines
        assert rows[0][0] == 0
        return
    srcs = [docs[d][0] for d in page]
    from collections import Counter

    c = Counter(srcs)
    t = sum(c.values())
    h = sum(
        _round_away(1_000_000 * (-(n / t) * math.log(n / t)))
        for n in c.values()
    )
    n_sources, top_n, top_share, ent = rows[0]
    assert n_sources == len(c)
    assert top_n == max(c.values())
    assert top_share == (1_000_000 * max(c.values())) // t
    assert ent == h
