"""Pure-Python oracle scorer — the independent implementation the Spark
engine must be rank-identical to (north rule; SURVEY.md §5.2).

Implements the exact scoring spec documented in docix_spark.query.bm25
(BM25 k1=1.2 b=0.75, fuzzy AUTO with Lucene-style boost degradation,
minimum_should_match 50%, best_fields max with boosts 5/3/3, constant-score
wildcard fallback 1/2/2, outer sum, tiebreak score desc / doc_id asc) with
no Spark, no numpy vectorized tricks — deliberately naive so a bug is
unlikely to be shared with the engine.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass, field as dc_field

from docix_spark import BM25_B, BM25_K1
from docix_spark.analysis.tokenizer import tokenize
from docix_spark.query.plan import (
    FIELD_BOOSTS,
    MAX_FUZZY_EXPANSIONS,
    WILDCARD_BOOSTS,
    analyze_query,
    auto_max_edits,
    msm_count,
)


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@dataclass
class OracleIndex:
    """In-memory inverted index over documents given as dicts with keys
    doc_id, content, file_name, original_file_name."""

    docs: list[dict]
    tf: dict = dc_field(default_factory=dict)        # (field, term, doc_id) -> tf
    df: dict = dc_field(default_factory=dict)        # (field, term) -> df
    doc_len: dict = dc_field(default_factory=dict)   # (field, doc_id) -> len
    n_docs: dict = dc_field(default_factory=dict)    # field -> N (docs with field tokens)
    avgdl: dict = dc_field(default_factory=dict)     # field -> avg len
    dictionary: dict = dc_field(default_factory=dict)  # term -> max df across fields

    def __post_init__(self):
        fields = list(FIELD_BOOSTS)
        # identical-content rows collapse to one doc (deterministic doc_id upsert)
        seen, uniq = set(), []
        for d in self.docs:
            if d["doc_id"] not in seen:
                seen.add(d["doc_id"])
                uniq.append(d)
        self.docs = uniq
        for f in fields:
            lens = []
            for d in self.docs:
                toks = tokenize(d.get(f) or "")
                if not toks:
                    continue
                lens.append(len(toks))
                self.doc_len[(f, d["doc_id"])] = len(toks)
                for t, c in Counter(toks).items():
                    self.tf[(f, t, d["doc_id"])] = c
                    self.df[(f, t)] = self.df.get((f, t), 0) + 1
            self.n_docs[f] = len(lens)
            self.avgdl[f] = (sum(lens) / len(lens)) if lens else 0.0
        for (f, t), v in self.df.items():
            self.dictionary[t] = max(self.dictionary.get(t, 0), v)

    # -- scoring ---------------------------------------------------------
    def bm25(self, field: str, term: str, doc_id: str, k1=BM25_K1, b=BM25_B) -> float:
        tf = self.tf.get((field, term, doc_id), 0)
        if tf == 0:
            return 0.0
        df = self.df[(field, term)]
        n, avgdl = self.n_docs[field], self.avgdl[field]
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * self.doc_len[(field, doc_id)] / avgdl))

    def expand(self, qt: str) -> list[tuple[str, float]]:
        """(index_term, fuzzy_boost) expansions of one query term."""
        out = [(qt, 1.0)]
        me = auto_max_edits(len(qt))
        if me == 0:
            return out
        cands = []
        for t, df in self.dictionary.items():
            if t == qt or abs(len(t) - len(qt)) > me:
                continue
            d = levenshtein(qt, t)
            if 0 < d <= me:
                cands.append((t, d, df))
        cands.sort(key=lambda x: (-x[2], x[0]))  # df desc, term asc
        for t, d, _ in cands[:MAX_FUZZY_EXPANSIONS]:
            out.append((t, 1.0 - d / min(len(qt), len(t))))
        return out

    def search(self, query: str, k: int = 10, page: int = 0, k1=BM25_K1, b=BM25_B) -> list[tuple[str, float]]:
        """Top-k [(doc_id, score)] under the full composite semantics."""
        aq = analyze_query(query)
        if aq.is_match_all:
            scored = {d["doc_id"]: 1.0 for d in self.docs}
        else:
            # duplicate analyzed terms are separate clauses in ES: each
            # duplicate scores again and counts again toward msm.
            qt_counts = Counter(aq.terms)
            expansions = {qt: self.expand(qt) for qt in qt_counts}
            msm = msm_count(len(aq.terms))
            best: dict[str, float] = {}
            for f, fboost in FIELD_BOOSTS.items():
                per_doc = defaultdict(float)
                matched_terms = defaultdict(set)
                for qt, exps in expansions.items():
                    for t, tboost in exps:
                        for d in self.docs:
                            s = self.bm25(f, t, d["doc_id"], k1=k1, b=b)
                            if s > 0:
                                per_doc[d["doc_id"]] += qt_counts[qt] * tboost * s
                                matched_terms[d["doc_id"]].add(qt)
                for doc_id, s in per_doc.items():
                    if sum(qt_counts[qt] for qt in matched_terms[doc_id]) >= msm:
                        best[doc_id] = max(best.get(doc_id, 0.0), fboost * s)
            scored = dict(best)
            ql = aq.lower
            for d in self.docs:
                fb = sum(
                    bo
                    for fld, bo in WILDCARD_BOOSTS.items()
                    if ql in (d.get(fld) or "").lower()
                )
                if fb > 0:
                    scored[d["doc_id"]] = scored.get(d["doc_id"], 0.0) + fb
        ranked = sorted(scored.items(), key=lambda x: (-x[1], x[0]))
        return ranked[page * k : (page + 1) * k]
