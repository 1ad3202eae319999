"""Property-based semantics checks for the session-186 operators."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.sampled_from(["error", "view"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_error_concentration_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "event_type": [t for _, t in evs],
            }
        ),
    )
    got = con.execute(
        REGISTRY["error_user_concentration"].sql
    ).fetchall()[0]

    from collections import Counter

    cnt = Counter(u for u, t in evs if t == "error")
    n_err = sum(cnt.values())
    n_users = len(cnt)
    top1 = max(cnt.values(), default=0)
    top5 = sum(
        n for _, n in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    share = 0 if n_err == 0 else (1000000 * top5) // n_err
    assert got == (n_err, n_users, top1, top5, share)


_text = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])


@settings(max_examples=30, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=30))
def test_exact_dup_groups_match_model(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["exact_dup_group_histogram"].sql
        ).fetchall()
    }

    from collections import Counter

    groups = Counter(texts)
    model: dict[int, list[int]] = {}
    for n in groups.values():
        k = min(n, 8)
        cell = model.setdefault(k, [0, 0])
        cell[0] += 1
        cell[1] += n
    assert got == {k: tuple(v) for k, v in model.items()}
