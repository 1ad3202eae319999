"""Highlight + snippet shaping — F6/F7 of SURVEY.md §2.7.

The reference requests per-field highlight fragments from Elasticsearch
(content: 300 chars / 1 fragment, fileName & originalFileName: 100 chars /
1 fragment, ``<mark>`` pre/post tags — reference
ElasticsearchDocumentSearchAdapter.java:450-465) and then applies its own
priority + fallback shaping in Java (content > fileName > originalFileName,
``extractHighlightFromPage`` :554-575; manual snippet ``createSnippet``
:580-610). ES's fragmenter internals are not observable through the
reference, so the *fragment selection* spec here is our own deterministic
one: a window of the field text around the first matched-term occurrence,
expanded to the fragment size, with every matched-term occurrence inside
the window wrapped in ``<mark>`` tags. The priority and fallback rules are
reproduced exactly:

- priority content > file_name > original_file_name (:556-570);
- fallback when no field fragment matched: ±100 chars around the first
  occurrence of the *whole query string* (case-insensitive) with ``...``
  ellipses for truncation, else the leading 300 chars + ``...`` (:580-610).

Runs only over the ≤ k result rows (post-top-k), as a vectorized pandas
transform — the fetch/highlight phase of §3.1 step 5.
"""

from __future__ import annotations

import re

import pandas as pd

from docix_spark.analysis.tokenizer import TOKEN_PATTERN

FRAGMENT_SIZES = {"content": 300, "file_name": 100, "original_file_name": 100}
FIELD_PRIORITY = ("content", "file_name", "original_file_name")
PRE_TAG, POST_TAG = "<mark>", "</mark>"

_WORD_RE = re.compile(TOKEN_PATTERN)


def _find_term_spans(text: str, terms: set[str]) -> list[tuple[int, int]]:
    """Spans of tokens whose analyzed form is in ``terms`` (the analyzed
    query terms incl. fuzzy expansions — what ES marks)."""
    return [
        m.span() for m in _WORD_RE.finditer(text.lower()) if m.group() in terms
    ]


def highlight_field(text: str | None, terms: set[str], fragment_size: int) -> str:
    """One ``<mark>``-tagged fragment of ≤ fragment_size chars around the
    first matched term; empty string when nothing matches (ES returns no
    fragment for a non-matching field)."""
    if not text:
        return ""
    spans = _find_term_spans(text, terms)
    if not spans:
        return ""
    first_s, first_e = spans[0]
    half = max((fragment_size - (first_e - first_s)) // 2, 0)
    start = max(0, first_s - half)
    end = min(len(text), start + fragment_size)
    start = max(0, min(start, end - fragment_size)) if end - start < fragment_size else start
    inside = [(s, e) for s, e in spans if s >= start and e <= end]
    out, cur = [], start
    for s, e in inside:
        out.append(text[cur:s])
        out.append(PRE_TAG + text[s:e] + POST_TAG)
        cur = e
    out.append(text[cur:end])
    frag = "".join(out)
    if start > 0:
        frag = "..." + frag
    if end < len(text):
        frag = frag + "..."
    return frag


def create_snippet(content: str | None, query: str, max_length: int = 300) -> str:
    """Exact port of the reference's manual snippet fallback
    (SearchAdapter.java:580-610): ±100 chars around the first occurrence of
    the raw query string, else leading ``max_length`` chars."""
    if not content:
        return ""
    pos = content.lower().find(query.lower())
    if pos != -1:
        start = max(0, pos - 100)
        end = min(len(content), pos + len(query) + 100)
        snippet = content[start:end]
        if start > 0:
            snippet = "..." + snippet
        if end < len(content):
            snippet = snippet + "..."
        return snippet
    snippet = content[: min(max_length, len(content))]
    if len(content) > max_length:
        snippet += "..."
    return snippet


def extract_highlight(
    row: dict, terms: set[str], query: str
) -> str:
    """Priority + fallback shaping (SearchAdapter.java:554-575)."""
    for f in FIELD_PRIORITY:
        frag = highlight_field(row.get(f), terms, FRAGMENT_SIZES[f])
        if frag:
            return frag
    return create_snippet(row.get("content"), query, 300)


def add_highlights(pdf: pd.DataFrame, terms: set[str], query: str) -> pd.DataFrame:
    """Vectorized-enough application over the ≤k result rows; also emits the
    highlight-empty metric input (SearchAdapter.java:514-517)."""
    pdf = pdf.copy()
    pdf["highlight"] = [
        extract_highlight(r, terms, query) for r in pdf.to_dict("records")
    ]
    return pdf
