"""Property-based semantics checks for the session-39 operators.

Models: a pure-Python EXISTS/semi-join for the Q4 lateness count, exact
cents/q6 integer money math for the Q14 promo share and Q18 HAVING top-k
(prices/discounts/quantities drawn from dyadic values so the per-row
`round(100 * ...)` is unambiguous in every engine), an integer-q6 numpy-free
centroid-cosine model (sqrt is IEEE-exact, expression order mirrors
`_CENTROID_COS`), a first-8-positions lead-bias model for span_first, and a
day-bucket stats model. DuckDB-only hypothesis tests — ms per example — plus
one Spark test proving `global_row_ids` is byte-identical to the
single-window oracle at degenerate shard counts (1, more-shards-than-docs).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _Q18_QTY_C, _SPAN_FIRST_N

US_PER_DAY = 86_400_000_000
_Q4_LO = int(pd.Timestamp("1996-01-01").value // 1000)
_Q4_HI = int(pd.Timestamp("1997-01-01").value // 1000)
_Q14_LO = int(pd.Timestamp("1996-09-01").value // 1000)
_Q14_HI = int(pd.Timestamp("1996-10-01").value // 1000)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _ts(us_list):
    return pd.to_datetime(pd.Series(us_list, dtype="int64"), unit="us")


# ---------------------------------------------------------------------------
# orders_late_shipment_priority — oracle vs Python EXISTS model
# ---------------------------------------------------------------------------

# order dates straddle the [1996, 1997) window; ship offsets straddle 90 days
_orders_strategy = st.lists(
    st.tuples(
        st.integers(min_value=_Q4_LO - 30 * US_PER_DAY, max_value=_Q4_HI + 30 * US_PER_DAY),
        st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
    ),
    min_size=1,
    max_size=12,
)
_ship_offsets = st.lists(
    st.lists(st.integers(min_value=0, max_value=180 * US_PER_DAY), min_size=0, max_size=4),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(orders=_orders_strategy, offs=_ship_offsets)
def test_orders_late_shipment_priority_matches_model(orders, offs):
    rows = []
    for ok, (odate, _) in enumerate(orders):
        for off in offs[ok % len(offs)]:
            rows.append((ok, odate + off))
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": _ts([o[0] for o in orders]),
                "o_orderpriority": [o[1] for o in orders],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [r[0] for r in rows] or pd.Series([], dtype="int64"),
                "l_shipdate": _ts([r[1] for r in rows]),
            }
        ),
    )
    got = con.execute(REGISTRY["orders_late_shipment_priority"].sql).fetchall()
    late = {}
    for ok, (odate, prio) in enumerate(orders):
        if not (_Q4_LO <= odate < _Q4_HI):
            continue
        if any(s > odate + 90 * US_PER_DAY for o, s in rows if o == ok):
            late[prio] = late.get(prio, 0) + 1
    assert got == sorted(late.items())


# ---------------------------------------------------------------------------
# promo_revenue_ratio — oracle vs exact-cents model (dyadic prices/discounts)
# ---------------------------------------------------------------------------

_li_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # partkey
        st.integers(min_value=_Q14_LO - 10 * US_PER_DAY, max_value=_Q14_HI + 10 * US_PER_DAY),
        st.integers(min_value=0, max_value=4000),  # extendedprice, integer dollars
        st.sampled_from([0.0, 0.25, 0.5]),  # discount, dyadic → exact cents
    ),
    min_size=0,
    max_size=15,
)


@settings(max_examples=40, deadline=None)
@given(items=_li_strategy, promo=st.lists(st.booleans(), min_size=6, max_size=6))
def test_promo_revenue_ratio_matches_model(items, promo):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([i[0] for i in items], dtype="int64"),
                "l_shipdate": _ts([i[1] for i in items]),
                "l_extendedprice": pd.Series([float(i[2]) for i in items], dtype="float64"),
                "l_discount": pd.Series([i[3] for i in items], dtype="float64"),
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(6),
                "p_type": ["PROMO" if p else "STD" for p in promo],
            }
        ),
    )
    got = con.execute(REGISTRY["promo_revenue_ratio"].sql).fetchall()
    promo_c = total_c = n = 0
    for pk, ship, ep, disc in items:
        if not (_Q14_LO <= ship < _Q14_HI):
            continue
        rev = _round_away(100 * float(ep) * (1.0 - disc))
        n += 1
        total_c += rev
        if promo[pk]:
            promo_c += rev
    share = 0 if total_c == 0 else (1_000_000 * promo_c) // total_c
    assert got == [(promo_c, total_c, n, share)]


# ---------------------------------------------------------------------------
# large_orders_topk — oracle vs HAVING/top-k model (dyadic quantities)
# ---------------------------------------------------------------------------

_qty_strategy = st.lists(
    st.lists(st.sampled_from([0.0, 50.25, 100.5, 200.0]), min_size=0, max_size=4),
    min_size=1,
    max_size=15,
)


@settings(max_examples=40, deadline=None)
@given(qtys=_qty_strategy)
def test_large_orders_topk_matches_model(qtys):
    li = [(ok, q) for ok, qs in enumerate(qtys) for q in qs]
    odates = [(_Q4_LO + ok * US_PER_DAY) for ok in range(len(qtys))]
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_quantity": pd.Series([r[1] for r in li], dtype="float64"),
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(qtys)),
                "o_custkey": [ok * 7 for ok in range(len(qtys))],
                "o_orderdate": _ts(odates),
            }
        ),
    )
    got = con.execute(REGISTRY["large_orders_topk"].sql).fetchall()
    totals = {}
    for ok, q in li:
        totals[ok] = totals.get(ok, 0) + _round_away(100 * q)
    surv = [
        (ok, ok * 7, odates[ok], t) for ok, t in totals.items() if t > _Q18_QTY_C
    ]
    surv.sort(key=lambda r: (-r[3], r[0]))
    assert got == surv[:10]


# ---------------------------------------------------------------------------
# label_centroid_drift — oracle vs integer-q6 centroid-cosine model
# (components are multiples of 1/64 → exact in float32 AND float64, so the
# q6 rounding has no engine-dependent ulp; sqrt/div order mirrors
# _CENTROID_COS exactly)
# ---------------------------------------------------------------------------

_vec_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # label
        st.lists(st.integers(min_value=-64, max_value=64), min_size=64, max_size=64),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=30, deadline=None)
@given(vecs=_vec_strategy)
def test_label_centroid_drift_matches_model(vecs):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "label": pd.Series([v[0] for v in vecs], dtype="int32"),
                "embedding": [[k / 64.0 for k in v[1]] for v in vecs],
            }
        ),
    )
    got = con.execute(REGISTRY["label_centroid_drift"].sql).fetchall()
    # per-(label, dim) exact integer sums of q6 components
    ld: dict[tuple[int, int], list[int]] = {}
    for lab, comps in vecs:
        for d, k in enumerate(comps):
            s_n = ld.setdefault((lab, d), [0, 0])
            s_n[0] += _round_away((k / 64.0) * 1_000_000)
            s_n[1] += 1
    gd = {}
    for (lab, d), (s, n) in ld.items():
        g = gd.setdefault(d, [0, 0])
        g[0] += s
        g[1] += n
    model = []
    for lab in sorted({v[0] for v in vecs}):
        dp = nm = ng = 0
        n_vecs = 0
        for d in range(64):
            s, n = ld[(lab, d)]
            n_vecs = max(n_vecs, n)
            mq6 = _round_away(s / n)
            gq6 = _round_away(gd[d][0] / gd[d][1])
            dp += mq6 * gq6
            nm += mq6 * mq6
            ng += gq6 * gq6
        cos = (
            0
            if nm == 0 or ng == 0
            else _round_away(1_000_000 * (dp / (math.sqrt(nm) * math.sqrt(ng))))
        )
        model.append((lab, n_vecs, cos))
    assert got == model


# ---------------------------------------------------------------------------
# span_first_match — oracle vs lead-position model; n_docs_first ≤ df always
# ---------------------------------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "x9", "lead"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=10))
def test_span_first_match_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(d) for d in docs],
                "source": ["s"] * len(docs),
            }
        ),
    )
    got = con.execute(REGISTRY["span_first_match"].sql).fetchall()
    nf: dict[str, int] = {}
    df: dict[str, int] = {}
    for d in docs:
        for t in set(d[:_SPAN_FIRST_N]):
            nf[t] = nf.get(t, 0) + 1
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    model = sorted(
        ((t, n, df[t]) for t, n in nf.items()), key=lambda r: (-r[1], r[0])
    )[:20]
    assert got == model
    for _, n_first, d in got:
        assert n_first <= d  # a lead occurrence is an occurrence


# ---------------------------------------------------------------------------
# stats_bucket_daily — oracle vs day-bucket model; min ≤ avg ≤ max
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(ts=st.lists(st.integers(min_value=0, max_value=40 * US_PER_DAY), min_size=1, max_size=40))
def test_stats_bucket_daily_matches_model(ts):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": range(len(ts)), "ts": _ts(ts)}),
    )
    got = con.execute(REGISTRY["stats_bucket_daily"].sql).fetchall()
    days: dict[int, int] = {}
    for t in ts:
        days[t // US_PER_DAY] = days.get(t // US_PER_DAY, 0) + 1
    ns = list(days.values())
    model = (
        len(ns),
        min(ns),
        max(ns),
        sum(ns),
        (1_000_000 * sum(ns)) // len(ns),
    )
    assert got == [model]
    n_days, lo, hi, total, avg_q6 = got[0]
    assert lo * 1_000_000 <= avg_q6 <= hi * 1_000_000
    assert total == len(ts)  # mass conservation


# ---------------------------------------------------------------------------
# global_row_ids — Spark plan is byte-identical to sorted-enumerate at
# degenerate shard counts (single shard; more shards than docs)
# ---------------------------------------------------------------------------


def test_global_row_ids_degenerate_shard_counts(spark):
    sf = "/root/testdata/sf0.001"
    expect = None
    for n_shards in (1, 7, 100_000):
        pdf = (
            REGISTRY["global_row_ids"]
            .fn(spark, sf, n_shards=n_shards)
            .toPandas()
        )
        ids = list(pdf["global_id"])
        assert ids == list(range(len(ids)))  # contiguous from 0
        keys = list(zip(pdf["source"], pdf["doc_id"]))
        assert keys == sorted(keys)  # (source, doc_id) order
        if expect is None:
            expect = keys
        else:
            assert keys == expect  # shard count never changes the output
