"""Regex → required-literal analysis for trigram-index pruning.

The reference exposes only ``*q*`` wildcards (SearchAdapter.java:412-429);
regex search is the natural extension every code-search engine ships, and
at scale it is served the same way Google Code Search / Zoekt do it
(R. Cox, "Regular Expression Matching with a Trigram Index", 2012): derive
substrings that EVERY match must contain, intersect their trigram posting
lists for a candidate set, and run the real regex engine only over the
candidates. Verification makes the result exactly equal to the full scan;
the index only prunes.

This module implements the analysis conservatively: a single left-to-right
scan over a safe regex subset (literals, escapes, character classes, ``.``,
``*`` ``+`` ``?`` ``{m,n}`` quantifiers, ``^``/``$`` anchors). Constructs
that would make literal-requirement reasoning non-local — alternation and
groups — abort the analysis entirely (empty result → caller falls back to
the verified full scan, the reference's own behavior). Soundness invariant
(pytest-checked): for every returned literal L and every string S where
``re.search(pattern, S)`` matches, ``L in S.lower()`` — i.e. candidates
are always a superset of matches.
"""

from __future__ import annotations

# escapes that consume one input char whose value we cannot pin down
_CLASS_ESCAPES = set("dDwWsS")
# zero-width escapes: consume no input char at all
_ANCHOR_ESCAPES = set("bBAZ")


def required_literals(pattern: str) -> list[str]:
    """Literal substrings guaranteed to occur (lowercased) in every match
    of ``pattern``. Returns ``[]`` when the pattern is outside the safe
    subset (top-level ``|``, ``(``, ``)``, backreferences) or yields no
    usable literal — the caller must then fall back to a full verified
    scan. Lowercasing matches the index side (trigrams are built over
    lowercased field values), so callers must regex-verify against
    lowercased text too."""
    runs: list[str] = []
    run: list[str] = []
    i, n = 0, len(pattern)

    def close(keep_last: bool) -> None:
        if not keep_last and run:
            run.pop()
        if run:
            runs.append("".join(run))
        run.clear()

    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                return []  # dangling escape — not a valid pattern anyway
            nxt = pattern[i + 1]
            if nxt in _ANCHOR_ESCAPES:
                close(keep_last=True)  # zero-width: breaks adjacency only
                i += 2
                continue
            if nxt in _CLASS_ESCAPES:
                close(keep_last=True)  # one unknown char
                i = _skip_any_quantifier(pattern, i + 2)
                continue
            if nxt.isdigit():
                return []  # backreference — bail
            run.append(nxt)  # escaped literal (\. \* \\ …)
            i = _apply_quantifier(pattern, i + 2, run, runs, close_fn=close)
            if i < 0:
                return []
            continue
        if ch == "[":
            j = _skip_class(pattern, i)
            if j < 0:
                return []
            close(keep_last=True)  # one unknown char
            i = j
            i = _skip_any_quantifier(pattern, i)
            continue
        if ch == ".":
            close(keep_last=True)
            i += 1
            i = _skip_any_quantifier(pattern, i)
            continue
        if ch in "(|)":
            return []  # groups/alternation: requirement is non-local
        if ch in "^$":
            close(keep_last=True)
            i += 1
            continue
        if ch in "*+?{":
            # quantifier applying to the run's last literal char
            if ch == "+":
                close(keep_last=True)
                i += 1
            elif ch in "*?":
                close(keep_last=False)
                i += 1
            else:  # {m,n}
                j, min_reps = _parse_braces(pattern, i)
                if j < 0:
                    return []
                close(keep_last=min_reps >= 1)
                i = j
            continue
        run.append(ch)
        i += 1
    close(keep_last=True)
    return [r.lower() for r in runs if r]


def _apply_quantifier(pattern, i, run, runs, close_fn) -> int:
    """After consuming an escaped literal: handle a following quantifier.
    Returns the new position, or -1 to abort."""
    if i >= len(pattern):
        return i
    ch = pattern[i]
    if ch == "+":
        close_fn(keep_last=True)
        return i + 1
    if ch in "*?":
        close_fn(keep_last=False)
        return i + 1
    if ch == "{":
        j, min_reps = _parse_braces(pattern, i)
        if j < 0:
            return -1
        close_fn(keep_last=min_reps >= 1)
        return j
    return i


def _skip_any_quantifier(pattern: str, i: int) -> int:
    """Skip a quantifier following a non-literal atom (class / dot); the
    run is already closed so min-count doesn't matter."""
    if i < len(pattern) and pattern[i] in "*+?":
        return i + 1
    if i < len(pattern) and pattern[i] == "{":
        j, _ = _parse_braces(pattern, i)
        return j if j > 0 else i
    return i


def _skip_class(pattern: str, i: int) -> int:
    """Position just past a ``[...]`` class starting at ``i``; -1 if
    unterminated."""
    j = i + 1
    if j < len(pattern) and pattern[j] == "^":
        j += 1
    if j < len(pattern) and pattern[j] == "]":
        j += 1  # leading ] is a literal member
    while j < len(pattern):
        if pattern[j] == "\\":
            j += 2
            continue
        if pattern[j] == "]":
            return j + 1
        j += 1
    return -1


def _parse_braces(pattern: str, i: int) -> tuple[int, int]:
    """Parse ``{m}`` / ``{m,}`` / ``{m,n}`` at ``i``; returns (next
    position, min repetitions), or (-1, 0) when malformed."""
    j = pattern.find("}", i)
    if j < 0:
        return -1, 0
    body = pattern[i + 1 : j]
    head = body.split(",")[0].strip()
    if not head.isdigit():
        return -1, 0
    return j + 1, int(head)
