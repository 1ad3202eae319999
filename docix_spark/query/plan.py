"""Query analysis + validation — the engine-side equivalent of the IR the
reference builds before handing off to Elasticsearch.

The reference's pipeline (SURVEY.md §3.1): bean validation (q 2-200 chars,
reference DocumentController.java:239), use-case validation (non-empty,
len>=2, page>=0, 1<=size<=100 — SearchDocumentService.java:115-131), then an
ES DSL tree (SearchAdapter.java:394-440):

    bool(should, msm=1)
      ├─ multi_match(best_fields, fields=[content^5, fileName^3,
      │              originalFileName^3], fuzziness=AUTO, msm="50%")
      └─ bool(should, msm=1)
           ├─ wildcard(content, *q*, boost=1.0)
           ├─ wildcard(fileName, *q*, boost=2.0)
           └─ wildcard(originalFileName, *q*, boost=2.0)

This module produces the engine's own plan object for that tree. The scoring
semantics implemented against it are specified in docix_spark.query.bm25.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from docix_spark.analysis.tokenizer import tokenize

# Field boosts of the multi_match (reference SearchAdapter.java:405-406).
FIELD_BOOSTS = {"content": 5.0, "file_name": 3.0, "original_file_name": 3.0}
# Wildcard fallback boosts (SearchAdapter.java:412-429).
WILDCARD_BOOSTS = {"content": 1.0, "file_name": 2.0, "original_file_name": 2.0}

MAX_FUZZY_EXPANSIONS = 50  # ES max_expansions default


def auto_max_edits(term_len: int) -> int:
    """ES ``fuzziness=AUTO`` bands (SearchAdapter.java:407): 0-2 chars → 0
    edits, 3-5 → 1 edit, >=6 → 2 edits."""
    if term_len <= 2:
        return 0
    if term_len <= 5:
        return 1
    return 2


def msm_count(n_terms: int, percent: float = 0.5) -> int:
    """minimum_should_match "50%" (SearchAdapter.java:408): ES floors
    percentages; a pure-should match still needs >=1 clause to hit."""
    return max(int(n_terms * percent), 1)


def validate_search(query: str, page: int, size: int) -> None:
    """Reference validation rules (SearchDocumentService.java:115-131)."""
    if query is None or not query.strip():
        raise ValueError("Search query cannot be empty")
    if len(query.strip()) < 2:
        raise ValueError("Search query must be at least 2 characters long")
    if page < 0:
        raise ValueError("Page number cannot be negative")
    if size < 1 or size > 100:
        raise ValueError("Page size must be between 1 and 100")


@dataclass
class AnalyzedQuery:
    raw: str
    terms: list[str] = field(default_factory=list)
    is_match_all: bool = False

    @property
    def msm(self) -> int:
        return msm_count(len(self.terms))

    @property
    def lower(self) -> str:
        return self.raw.strip().lower()


def analyze_query(query: str) -> AnalyzedQuery:
    """Analyze with the same tokenizer as the index side (F1 parity).

    ``"*"`` maps to match_all (reference SearchAdapter.java:395-397)."""
    q = query.strip()
    if q == "*":
        return AnalyzedQuery(raw=query, is_match_all=True)
    return AnalyzedQuery(raw=query, terms=tokenize(q))
