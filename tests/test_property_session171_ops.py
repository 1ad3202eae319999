"""Property-based semantics checks for the session-171 operators.

Models: midnight-crossing sessionization, idle-hour gaps-and-islands,
and the lang-ID margin banding (stopword profiles replicated).
DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=5000),  # minutes
        ),
        min_size=1,
        max_size=30,
    )
)
def test_midnight_sessions_match_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "ts": [_D0 + datetime.timedelta(minutes=m) for _, m in evs],
            }
        ),
    )
    got = con.execute(
        REGISTRY["midnight_crossing_sessions"].sql
    ).fetchall()[0]

    epoch = datetime.datetime(1970, 1, 1)
    per: dict[int, list[int]] = {}
    for u, m in evs:
        us = int((_D0 + datetime.timedelta(minutes=m) - epoch).total_seconds() * 1e6)
        per.setdefault(u, []).append(us)
    n_sess = n_cross = 0
    for u, times in per.items():
        times.sort()
        sessions = [[times[0]]]
        for t in times[1:]:
            if t - sessions[-1][-1] > 1_800_000_000:
                sessions.append([t])
            else:
                sessions[-1].append(t)
        for s in sessions:
            n_sess += 1
            if s[-1] // 86_400_000_000 > s[0] // 86_400_000_000:
                n_cross += 1
    assert got == (n_sess, n_cross, (1000000 * n_cross) // n_sess)


@settings(max_examples=35, deadline=None)
@given(
    hours=st.lists(
        st.integers(min_value=0, max_value=60), min_size=1, max_size=25
    )
)
def test_idle_hours_match_model(hours):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(hours)),
                "ts": [_D0 + datetime.timedelta(hours=h) for h in hours],
            }
        ),
    )
    got = con.execute(REGISTRY["idle_hours_census"].sql).fetchall()[0]

    seen = set(hours)
    lo, hi = min(seen), max(seen)
    span = hi - lo + 1
    idle = [h for h in range(lo, hi + 1) if h not in seen]
    runs = []
    for h in idle:
        if runs and h == runs[-1][-1] + 1:
            runs[-1].append(h)
        else:
            runs.append([h])
    longest = max((len(r) for r in runs), default=0)
    assert got == (span, len(idle), len(runs), longest)


_PROFILES = {
    "de": ["der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "des"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "with", "as"],
    "es": ["el", "la", "que", "y", "los", "del", "se", "las", "por", "un"],
    "fr": ["le", "les", "et", "des", "du", "une", "est", "dans", "pour", "sur"],
}
_word = st.sampled_from(
    ["the", "and", "der", "die", "le", "el", "data", "spark"]
)


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=10), min_size=1, max_size=12
    )
)
def test_lang_margin_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["lang_margin_histogram"].sql
        ).fetchall()
    }

    model: dict[int, int] = {}
    for ws in docs:
        counts = {
            lang: sum(1 for w in ws if w in set(prof))
            for lang, prof in _PROFILES.items()
        }
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        margin = ranked[0][1] - ranked[1][1]  # ascii text → no CJK route
        band = 0 if margin == 0 else 1 if margin <= 2 else 2 if margin <= 5 else 3
        model[band] = model.get(band, 0) + 1
    assert got == model
