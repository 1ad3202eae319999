"""Property-based rank identity: hypothesis-generated corpora and queries
(including Unicode vocabulary and duplicate documents) must score
identically in the Spark engine and the pure-Python oracle — the
fixed-query-set gate (test_rank_identity) generalized to adversarial
inputs."""

from __future__ import annotations

import hashlib
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docix_spark.corpus import CORPUS_COLUMNS
from docix_spark.index.build import build_index
from docix_spark.oracle import OracleIndex
from docix_spark.query.bm25 import search_topk

# vocabulary mixing high-df, fuzzy-adjacent (scan/scat/spam), Unicode
# (word-forming accents, Han unigrams), and underscore identifiers
_WORDS = [
    "alpha", "beta", "gamma", "delta", "scan", "scat", "spam", "spark",
    "join", "merge_1", "straße", "北京", "データベース", "x9",
]

_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=25).map(" ".join)
_corpus = st.lists(_doc, min_size=3, max_size=8)
_query = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=_corpus, query=_query)
def test_engine_matches_oracle_on_generated_corpora(spark, docs, query):
    rows = [
        ("r0", f"p/m{i}.txt", "c" * 40, "txt", content)
        for i, content in enumerate(docs)
    ]
    corpus = spark.createDataFrame(pd.DataFrame(rows, columns=CORPUS_COLUMNS))
    root = tempfile.mkdtemp(prefix="docix_prop_")
    idx = build_index(spark, corpus, root, n_buckets=4)

    oracle = OracleIndex(
        [
            {
                "doc_id": hashlib.sha256(c.encode()).hexdigest(),
                "content": c,
                "file_name": p,
                "original_file_name": p.rsplit("/", 1)[-1],
            }
            for _, p, _, _, c in rows
        ]
    )
    got = [
        (r.doc_id, round(r.score, 6))
        for r in search_topk(spark, idx, query, size=10, with_metadata=False).collect()
    ]
    want = [(d, round(s, 6)) for d, s in oracle.search(query, k=10)]
    assert got == want, f"query={query!r} docs={docs!r}"

    import shutil

    shutil.rmtree(root, ignore_errors=True)
