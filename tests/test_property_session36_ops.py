"""Property-based check for dedup_policy_compare: a pure-Python
minhash-LSH → union-find → survivor-policy model against the DuckDB
oracle (which recomputes the closure with a recursive CTE)."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_WORDS = ["fast", "scan", "spark", "join", "hash"]
# short docs + tiny vocab → real shingle collisions → non-trivial clusters
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=14)


def _con(docs):
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


def _mh(seed, sh):
    return hashlib.md5(f"{seed}:{sh}".encode()).hexdigest()


@settings(max_examples=30, deadline=None)
@given(docs=_corpus)
def test_dedup_policy_compare_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["dedup_policy_compare"].sql).fetchall()

    # LSH candidate pairs: 2 bands of 2 hashes, shared bucket table
    # (band strings from different positions may collide — the shipped
    # semantics of minhash_lsh_pairs)
    buckets: dict[str, list[int]] = {}
    for i, d in enumerate(docs):
        shs = {" ".join(d[j : j + 3]) for j in range(len(d) - 2)}
        if not shs:
            continue
        m = [min(_mh(k, s) for s in shs) for k in range(4)]
        for band in (m[0] + m[1], m[2] + m[3]):
            buckets.setdefault(band, []).append(i)
    parent = list(range(len(docs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    clustered = set()
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    clustered |= {a, b}
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    cd = {}
    for i in sorted(clustered):
        cd.setdefault(find(i), []).append(i)
    n_clusters = len(cd)
    docs_clustered = len(clustered)
    ntok = {i: len(docs[i]) for i in clustered}
    ndis = {i: len(set(docs[i])) for i in clustered}
    tokens_clustered = sum(ntok.values())

    def kept(orderkey):
        return sum(ntok[min(members, key=orderkey)] for members in cd.values())

    model = []
    for policy, key in (
        ("keep_longest", lambda i: (-ntok[i], i)),
        ("keep_min_id", lambda i: i),
        ("keep_most_distinct", lambda i: (-ndis[i], i)),
    ):
        tk = kept(key)
        model.append(
            (policy, n_clusters, docs_clustered - n_clusters, tk, tokens_clustered - tk)
        )
    assert got == model
    # keep_longest retains at least as many tokens as any policy
    kl = dict((p, t) for p, _, _, t, _ in model)
    assert kl["keep_longest"] >= kl["keep_min_id"]
    assert kl["keep_longest"] >= kl["keep_most_distinct"]


def test_registry_names_bound():
    assert REGISTRY["dedup_policy_compare"].fn.__name__ == "dedup_policy_compare"
