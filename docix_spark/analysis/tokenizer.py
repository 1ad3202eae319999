"""Analyzer reproducing the semantics DocIx selects from Elasticsearch.

The reference creates its ``document_pages`` index with the ``standard``
analyzer on every text field (reference
ElasticsearchDocumentSearchAdapter.java:253-258): Unicode word segmentation
+ lowercasing, no stemming, no stopword removal.

We approximate UAX#29 segmentation with one fixed regex over lowercased
text, kept character-identical across Python ``re``, Java regex (Spark),
and RE2 (DuckDB) by using only literal-codepoint character classes (no
engine-specific ``\\p{L}`` / ``\\x{..}`` syntax):

- **word runs** — ASCII letters/digits/underscore plus accented Latin
  (Latin-1 supplement letters, Latin Extended-A/B), Greek and Cyrillic:
  one token per maximal run (UAX#29 ALetter chaining).
- **Katakana runs** — Katakana chains like ALetter in UAX#29 (and in
  Lucene's StandardTokenizer), so ``データベース`` is one token.
- **ideographs** — Han (CJK Unified + Ext-A + compatibility) and Hiragana
  emit ONE TOKEN PER CHARACTER, matching the ES ``standard`` analyzer's
  unigram treatment of ideographic text — this is what makes CJK content
  searchable (a query of Han characters matches docs containing them).

Rank identity versus the reference query set is preserved because BOTH the
index side and the query side run this same tokenizer (SURVEY.md §2.7 F1);
what matters for BM25 is that the two sides agree.

Three implementations, one behavior:

- :func:`tokenize` — pure Python, used by the oracle scorer in tests.
- :func:`tokenize_series` — vectorized pandas (Arrow batches) for the build
  pipeline's ``mapInPandas`` stages — no per-row Python UDFs.
- :func:`spark_tokens` — a JVM-side Column expression
  (``regexp_extract_all``), used where the whole query must stay inside
  whole-stage codegen and match a DuckDB oracle exactly.

Lowercasing is Unicode-aware and agrees across the engines for the scripts
covered here (Java String.toLowerCase == Python str.lower == DuckDB lower
on Latin/Greek/Cyrillic/CJK input); locale-special cases (Turkish dotless
i, etc.) are out of scope, as they are for the ES standard analyzer with
no locale configured.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Literal-codepoint classes — identical semantics in re / Java / RE2.
_WORD_CLASS = (
    "a-z0-9_"
    "ß-öø-ÿ"  # Latin-1 supplement lowercase letters (ß…ö ø…ÿ)
    "Ā-ɏ"               # Latin Extended-A/B
    "ά-ώ"               # Greek lowercase (ά…ώ incl. α-ω)
    "Ѐ-ӿ"               # Cyrillic
)
_KATAKANA_CLASS = "゠-ヿ"  # Katakana incl. prolonged-sound mark: runs
_IDEO_CLASS = (
    "぀-ゟ"                # Hiragana: one token per char
    "㐀-䶿一-鿿"   # CJK Unified Ext-A + CJK Unified
    "豈-﫿"                # CJK compatibility ideographs
)

# Shared by index build, query analysis, the pytest oracle, and the DuckDB
# oracle SQL (non-capturing groups: findall/regexp_extract_all return the
# full match in every engine).
TOKEN_PATTERN = f"(?:[{_WORD_CLASS}]+|[{_KATAKANA_CLASS}]+|[{_IDEO_CLASS}])"

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str | None) -> list[str]:
    """Lowercase + segment. Pure-Python reference implementation."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer over an Arrow-batch pandas Series.

    Returns a Series of ``list[str]`` aligned with the input index.
    """
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)


def spark_tokens(col: Column | str) -> Column:
    """JVM-side tokenizer: ``regexp_extract_all(lower(col), '[a-z0-9_]+')``.

    Stays inside whole-stage codegen — used for the DuckDB-checkable
    declarative queries in ``__spark_entry__.py``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)
