"""Analyzer reproducing the semantics DocIx selects from Elasticsearch.

The reference creates its ``document_pages`` index with the ``standard``
analyzer on every text field (reference
ElasticsearchDocumentSearchAdapter.java:253-258): Unicode word segmentation
+ lowercasing, no stemming, no stopword removal.

We approximate UAX#29 segmentation with the fixed regex ``[a-z0-9_]+`` over
lowercased text. Rank identity versus the reference query set is preserved
because BOTH the index side and the query side run this same tokenizer
(SURVEY.md §2.7 F1); what matters for BM25 is that the two sides agree.

Three implementations, one behavior:

- :func:`tokenize` — pure Python, used by the oracle scorer in tests.
- :func:`tokenize_series` — vectorized pandas (Arrow batches) for the build
  pipeline's ``mapInPandas`` stages — no per-row Python UDFs.
- :func:`spark_tokens` — a JVM-side Column expression
  (``regexp_extract_all``), used where the whole query must stay inside
  whole-stage codegen and match a DuckDB oracle exactly.

The regex is ASCII-class in all three engines (Python ``re.ASCII``, Java
default ``\\w``, DuckDB RE2 ``\\w``), so the outputs are identical.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared by index build, query analysis, the pytest oracle, and the DuckDB
# oracle SQL. Equivalent to ASCII \w+.
TOKEN_PATTERN = r"[a-z0-9_]+"

_TOKEN_RE = re.compile(TOKEN_PATTERN, re.ASCII)


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
