"""Property-based checks for the session-31 operators.

events_value_quantiles runs against a pure-Python type-7 model over
random (event_type, cents) data; hard_negative_mining gets invariant
checks on the sf0.001 oracle output (its full model is the trained IVF
— the driver-contract replica covers value parity)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

_event = st.tuples(
    st.sampled_from(["view", "click", "purchase"]),
    st.integers(min_value=-500, max_value=10_000),  # cents
)
_events = st.lists(_event, min_size=1, max_size=200)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _type7_q6(vals: list[int], p_q6: int) -> int:
    s = sorted(vals)
    n = len(s)
    r = (p_q6 / 1000000.0) * (n - 1)
    lo = int(math.floor(r))
    hi = min(lo + 1, n - 1)
    return _round_away(1_000_000.0 * (s[lo] + (r - math.floor(r)) * (s[hi] - s[lo])))


@settings(max_examples=40, deadline=None)
@given(evs=_events)
def test_events_value_quantiles_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_type": [t for t, _ in evs],
                "value": [c / 100.0 for _, c in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["events_value_quantiles"].sql).fetchall()
    by_type: dict[str, list[int]] = {}
    for t, c in evs:
        # replicate the cents quantization: round(value * 100) half-away
        by_type.setdefault(t, []).append(_round_away((c / 100.0) * 100))
    model = [
        (t, p, _type7_q6(by_type[t], p))
        for t in sorted(by_type)
        for p in (500000, 950000, 990000)
    ]
    assert got == model
    # quantiles are monotone in p within each type
    for t in sorted(by_type):
        qs = [q for (tt, _, q) in model if tt == t]
        assert qs == sorted(qs)


def test_hard_negative_invariants():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    rows = con.execute(REGISTRY["hard_negative_mining"].sql).fetchall()
    assert rows, "sf0.001 must yield negatives"
    by_qid: dict[int, list[tuple]] = {}
    for qid, vec_id, cos_q6, rnk in rows:
        assert vec_id != qid  # never self
        assert -1_000_000 <= cos_q6 <= 1_000_000
        by_qid.setdefault(qid, []).append((rnk, cos_q6, vec_id))
    for qid, neg in by_qid.items():
        neg.sort()
        # ranks contiguous from 1, scores nonincreasing in rank
        assert [r for r, _, _ in neg] == list(range(1, len(neg) + 1))
        cs = [c for _, c, _ in neg]
        assert cs == sorted(cs, reverse=True)
        assert len(neg) <= 5
    # negatives come from cells 2-3, never the rank-1 (positive) cell:
    # per query they must be disjoint from the nprobe=1 candidate set's
    # cell members minus... cheapest sound check: a mined negative is
    # never the query's own #1 exact neighbor when that neighbor shares
    # the rank-1 cell — covered by value parity; here assert queries set
    assert all(q % 37 == 0 for q in by_qid)


def test_registry_names_bound():
    for name in ["hard_negative_mining", "events_value_quantiles", "event_type_lift"]:
        assert REGISTRY[name].fn.__name__ == name


_basket = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.sampled_from(["view", "click", "purchase", "refund"])),
    min_size=1, max_size=150,
)


@settings(max_examples=40, deadline=None)
@given(evs=_basket)
def test_event_type_lift_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"user_id": [u for u, _ in evs],
                      "event_type": [t for _, t in evs]}),
    )
    got = con.execute(REGISTRY["event_type_lift"].sql).fetchall()
    baskets: dict[int, set] = {}
    for u, t in evs:
        baskets.setdefault(u, set()).add(t)
    n_users = len(baskets)
    from collections import Counter

    s: Counter = Counter(t for ts in baskets.values() for t in ts)
    pc: Counter = Counter()
    for ts in baskets.values():
        for a in ts:
            for b in ts:
                if a < b:
                    pc[(a, b)] += 1
    model = []
    for (a, b) in sorted(pc):
        n_ab, n_a, n_b = pc[(a, b)], s[a], s[b]
        lift = _round_away(
            1_000_000
            * ((n_ab / float(n_users)) / ((n_a / float(n_users)) * (n_b / float(n_users))))
        )
        conf = _round_away(1_000_000 * (n_ab / float(n_a)))
        model.append((a, b, n_ab, n_a, n_b, lift, conf))
    assert got == model
    # confidence is a proper conditional probability
    for *_, n_ab, n_a, n_b, lift, conf in [(None, None) + m[2:] for m in model]:
        assert 0 < conf <= 1_000_000


@settings(max_examples=40, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=100000), min_size=1,
                    max_size=150, unique=True))
def test_shard_rebalance_matches_model(ids):
    import hashlib

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": ids, "text": [""] * len(ids),
                      "source": ["s"] * len(ids), "lang": ["en"] * len(ids),
                      "n_chars": [0] * len(ids)}),
    )
    got = con.execute(REGISTRY["shard_rebalance_cost"].sql).fetchall()
    n = len(ids)
    mod_moved = sum(
        1 for i in ids
        if (h := int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)) % 16 != h % 17
    )

    def rz(i, ns):
        return max(range(ns), key=lambda s: hashlib.md5(f"{i}:{s}".encode()).hexdigest())

    rz_moved = sum(1 for i in ids if rz(i, 16) != rz(i, 17))

    def frac(m):
        return _round_away(1_000_000 * (m / float(n)))

    assert got == [("mod", n, mod_moved, frac(mod_moved)),
                   ("rendezvous", n, rz_moved, frac(rz_moved))]
    # the rendezvous guarantee: a doc moves IFF shard 16 wins its argmax
    assert rz_moved == sum(1 for i in ids if rz(i, 17) == 16)
