"""Session-240 check: binary_segmentation_daily vs an exact Python model
with planted level changes."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _welch_t2(counts, k):
    a, b = counts[: k + 1], counts[k + 1 :]
    na, nb = len(a), len(b)
    if na < 2 or nb < 2:
        return None
    sa, sb = sum(a), sum(b)
    ssa, ssb = sum(x * x for x in a), sum(x * x for x in b)
    if na * ssa == sa * sa and nb * ssb == sb * sb:
        return 0
    va = float(na * ssa - sa * sa) / (na * na * (na - 1))
    vb = float(nb * ssb - sb * sb) / (nb * nb * (nb - 1))
    m = (sa / na - sb / nb) ** 2
    return int(round(1_000_000 * m / (va + vb)))


def _best(counts, offset=0):
    cands = []
    for k in range(len(counts) - 1):
        t2 = _welch_t2(counts, k)
        if t2 is not None:
            cands.append((t2, -(offset + k)))
    if not cands:
        return None
    t2, negd = max(cands)
    k = -negd - offset
    return offset + k, len(counts[: k + 1]), len(counts[k + 1 :]), t2


@settings(max_examples=40, deadline=None)
@given(
    seg_means=st.tuples(
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=20, max_value=40),
        st.integers(min_value=60, max_value=90),
    ),
    lens=st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
    jitter=st.lists(st.integers(min_value=0, max_value=2), min_size=24, max_size=24),
)
def test_binary_segmentation_daily_matches_model(seg_means, lens, jitter):
    counts, j = [], iter(jitter)
    for m, L in zip(seg_means, lens):
        counts += [m + next(j) for _ in range(L)]
    rows = []
    for d, n in enumerate(counts):
        for i in range(n):
            rows.append(pd.Timestamp(1970, 1, 1) + pd.Timedelta(days=d, seconds=i))
    con = duckdb.connect()
    con.register("events", pd.DataFrame({"ts": rows}))
    got = con.execute(REGISTRY["binary_segmentation_daily"].sql).fetchall()

    root = _best(counts)
    if root is None:  # < 4 days: the sentinel shape
        model = [(1, "root", -1, 0, 0, 0), (2, "left", -1, 0, 0, 0),
                 (2, "right", -1, 0, 0, 0)]
        assert got == model
        return
    k, na, nb, t2 = root
    model = [(1, "root", k, na, nb, t2)]
    for name, seg, off in (
        ("left", counts[: k + 1], 0),
        ("right", counts[k + 1 :], k + 1),
    ):
        r = _best(seg, offset=off)
        model.append((2, name, *(r if r else (-1, 0, 0, 0))))
    model.sort(key=lambda r: (r[0], r[1]))
    assert got == model
    # level-2 splits stay inside their segments
    by = {r[1]: r for r in got}
    if by["left"][2] != -1:
        assert by["left"][2] < by["root"][2]
    if by["right"][2] != -1:
        assert by["root"][2] < by["right"][2]
