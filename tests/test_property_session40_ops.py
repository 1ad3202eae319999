"""Property-based semantics checks for the session-40 operators.

Models: a zero-inclusive order-count histogram for the Q13 outer-join
distribution, exact-cents integer cross-multiplication models for the Q17
correlated-avg cut and the Q22 above-average threshold (dyadic prices and
quantities so `round(100·x)` is ulp-unambiguous), an all-ties argmax for
Q15, conditional-sum share for the Q8 star join, a deny-set distinct count
for Q16, and a brute-force triangle/wedge counter fed the oracle's OWN LSH
candidate pairs (the session-17 convention). DuckDB-only — ms per example.
"""

from __future__ import annotations

import itertools
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _Q17_BRAND, _SQL_LSH_PAIRS

US_PER_DAY = 86_400_000_000
_2001 = int(pd.Timestamp("2001-01-01").value // 1000)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _ts(us_list):
    return pd.to_datetime(pd.Series(us_list, dtype="int64"), unit="us")


# ---------------------------------------------------------------------------
# customer_order_distribution — zero-inclusive histogram; mass conservation
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    n_cust=st.integers(min_value=1, max_value=8),
    custs=st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=25),
)
def test_customer_order_distribution_matches_model(n_cust, custs):
    orders = [(i, c) for i, c in enumerate(custs) if c < n_cust]
    con = duckdb.connect()
    con.register("customer", pd.DataFrame({"c_custkey": range(n_cust)}))
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": pd.Series([o[0] for o in orders], dtype="int64"),
                "o_custkey": pd.Series([o[1] for o in orders], dtype="int64"),
            }
        ),
    )
    got = con.execute(REGISTRY["customer_order_distribution"].sql).fetchall()
    per_cust = {c: 0 for c in range(n_cust)}
    for _, c in orders:
        per_cust[c] += 1
    hist: dict[int, int] = {}
    for n in per_cust.values():
        hist[n] = hist.get(n, 0) + 1
    model = sorted(hist.items(), key=lambda r: (-r[1], -r[0]))
    assert got == model
    assert sum(r[1] for r in got) == n_cust  # every customer lands somewhere
    assert sum(r[0] * r[1] for r in got) == len(orders)  # order mass conserved


# ---------------------------------------------------------------------------
# small_quantity_revenue — correlated-avg cut as integer cross-mult
# ---------------------------------------------------------------------------

_q17_items = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # partkey
        st.sampled_from([0.25, 1.0, 5.5, 20.0, 40.0]),  # quantity (dyadic)
        st.integers(min_value=0, max_value=500),  # extendedprice dollars
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=40, deadline=None)
@given(items=_q17_items, brands=st.lists(st.booleans(), min_size=4, max_size=4))
def test_small_quantity_revenue_matches_model(items, brands):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([i[0] for i in items], dtype="int64"),
                "l_quantity": pd.Series([i[1] for i in items], dtype="float64"),
                "l_extendedprice": pd.Series(
                    [float(i[2]) for i in items], dtype="float64"
                ),
                "l_discount": pd.Series([0.0] * len(items), dtype="float64"),
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(4),
                "p_brand": [_Q17_BRAND if b else "Brand#9" for b in brands],
            }
        ),
    )
    got = con.execute(REGISTRY["small_quantity_revenue"].sql).fetchall()
    bl = [
        (pk, _round_away(100 * q), _round_away(100 * float(ep)))
        for pk, q, ep in items
        if brands[pk]
    ]
    stats: dict[int, list[int]] = {}
    for pk, qc, _ in bl:
        s = stats.setdefault(pk, [0, 0])
        s[0] += qc
        s[1] += 1
    qual = [rc for pk, qc, rc in bl if 5 * qc * stats[pk][1] < stats[pk][0]]
    assert got == [(len(qual), sum(qual), sum(qual) // 7)]


# ---------------------------------------------------------------------------
# top_supplier_revenue — every revenue tie at the max must surface
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    rev=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # suppkey
            st.sampled_from([0, 100, 100, 250]),  # price dollars (ties likely)
        ),
        min_size=1,
        max_size=15,
    )
)
def test_top_supplier_revenue_returns_all_ties(rev):
    ship = int(pd.Timestamp("1996-02-01").value // 1000)
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": pd.Series([r[0] for r in rev], dtype="int64"),
                "l_shipdate": _ts([ship] * len(rev)),
                "l_extendedprice": pd.Series(
                    [float(r[1]) for r in rev], dtype="float64"
                ),
                "l_discount": pd.Series([0.0] * len(rev), dtype="float64"),
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame(
            {"s_suppkey": range(5), "s_name": [f"Supplier#{i}" for i in range(5)]}
        ),
    )
    got = con.execute(REGISTRY["top_supplier_revenue"].sql).fetchall()
    totals: dict[int, int] = {}
    for sk, ep in rev:
        totals[sk] = totals.get(sk, 0) + 100 * ep
    m = max(totals.values())
    model = [
        (sk, f"Supplier#{sk}", t) for sk, t in sorted(totals.items()) if t == m
    ]
    assert got == model
    assert len(got) >= 1  # argmax is never empty on a non-empty quarter


# ---------------------------------------------------------------------------
# promo_market_share_by_year — conditional-sum share; europe ≤ total
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # partkey
            st.integers(min_value=0, max_value=9),  # orderkey
            st.integers(min_value=0, max_value=3),  # suppkey
            st.integers(min_value=0, max_value=900),  # price dollars
        ),
        min_size=0,
        max_size=20,
    ),
    promo=st.lists(st.booleans(), min_size=4, max_size=4),
    supp_nation=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
    years=st.lists(st.integers(min_value=1995, max_value=1998), min_size=10, max_size=10),
)
def test_promo_market_share_matches_model(li, promo, supp_nation, years):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_orderkey": pd.Series([r[1] for r in li], dtype="int64"),
                "l_suppkey": pd.Series([r[2] for r in li], dtype="int64"),
                "l_extendedprice": pd.Series([float(r[3]) for r in li], dtype="float64"),
                "l_discount": pd.Series([0.0] * len(li), dtype="float64"),
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(4),
                "p_type": ["PROMO" if p else "STD" for p in promo],
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(10),
                "o_orderdate": pd.to_datetime([f"{y}-06-15" for y in years]),
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": range(4),
                "s_nationkey": pd.Series(supp_nation, dtype="int64"),
            }
        ),
    )
    # nations 0,1 sit in EUROPE; nation 2 elsewhere
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": [0, 1, 2], "n_regionkey": [3, 3, 1]}),
    )
    con.register(
        "region",
        pd.DataFrame({"r_regionkey": [1, 3], "r_name": ["AMERICA", "EUROPE"]}),
    )
    got = con.execute(REGISTRY["promo_market_share_by_year"].sql).fetchall()
    agg: dict[int, list[int]] = {}
    for pk, ok, sk, ep in li:
        if not promo[pk]:
            continue
        y = agg.setdefault(years[ok], [0, 0])
        y[0] += 100 * ep
        if supp_nation[sk] in (0, 1):
            y[1] += 100 * ep
    model = [
        (y, t, e, 0 if t == 0 else (1_000_000 * e) // t)
        for y, (t, e) in sorted(agg.items())
    ]
    assert got == model
    for _, t, e, s in got:
        assert 0 <= e <= t and 0 <= s <= 1_000_000


# ---------------------------------------------------------------------------
# supplier_parts_exclusion — deny-set distinct count
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4), st.integers(min_value=0, max_value=4)),
        min_size=0,
        max_size=25,
    ),
    bal=st.lists(st.sampled_from([-5.0, 10.0]), min_size=5, max_size=5),
    ptype=st.lists(st.sampled_from(["A", "B"]), min_size=5, max_size=5),
)
def test_supplier_parts_exclusion_matches_model(pairs, bal, ptype):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([p[0] for p in pairs], dtype="int64"),
                "l_suppkey": pd.Series([p[1] for p in pairs], dtype="int64"),
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(5), "s_acctbal": pd.Series(bal, dtype="float64")}),
    )
    con.register(
        "part", pd.DataFrame({"p_partkey": range(5), "p_type": ptype})
    )
    got = con.execute(REGISTRY["supplier_parts_exclusion"].sql).fetchall()
    ok = {s for s in range(5) if bal[s] >= 0}
    by_type: dict[str, set[int]] = {}
    for pk, sk in set(pairs):
        if sk in ok:
            by_type.setdefault(ptype[pk], set()).add(sk)
    model = sorted(
        ((t, len(s)) for t, s in by_type.items()), key=lambda r: (-r[1], r[0])
    )
    assert got == model


# ---------------------------------------------------------------------------
# idle_rich_customers — strict above-average cut + anti-join
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    bal=st.lists(st.sampled_from([-200.0, 0.0, 50.25, 400.0, 400.0]), min_size=1, max_size=12),
    buyers=st.lists(st.integers(min_value=0, max_value=11), min_size=0, max_size=8),
)
def test_idle_rich_customers_matches_model(bal, buyers):
    n = len(bal)
    orders = [(i, b, _2001 + i * US_PER_DAY) for i, b in enumerate(buyers) if b < n]
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(n),
                "c_nationkey": pd.Series([i % 3 for i in range(n)], dtype="int64"),
                "c_acctbal": pd.Series(bal, dtype="float64"),
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": pd.Series([o[0] for o in orders], dtype="int64"),
                "o_custkey": pd.Series([o[1] for o in orders], dtype="int64"),
                "o_orderdate": _ts([o[2] for o in orders]),
            }
        ),
    )
    got = con.execute(REGISTRY["idle_rich_customers"].sql).fetchall()
    bal_c = [_round_away(100 * b) for b in bal]
    pos = [b for b in bal_c if b > 0]
    s, cnt = sum(pos), len(pos)
    recent = {b for _, b, _ in orders}
    agg: dict[int, list[int]] = {}
    for i, bc in enumerate(bal_c):
        if bc * cnt > s and i not in recent:
            a = agg.setdefault(i % 3, [0, 0])
            a[0] += 1
            a[1] += bc
    assert got == [(k, v[0], v[1]) for k, v in sorted(agg.items())]


# ---------------------------------------------------------------------------
# lsh_triangle_count — oracle vs brute-force counts over the oracle's OWN
# candidate pairs; clustering bounded by [0, 1e6]
# ---------------------------------------------------------------------------

_WORDS = ["dup", "spark", "join", "scan", "x9"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_lsh_triangle_count_matches_brute_force(docs):
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
    got = con.execute(REGISTRY["lsh_triangle_count"].sql).fetchall()
    pairs = set(
        map(tuple, con.execute(_SQL_LSH_PAIRS + " SELECT doc_a, doc_b FROM pairs").fetchall())
    )
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    nodes = sorted(deg)
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in pairs and (b, c) in pairs and (a, c) in pairs
    )
    clustering = 0 if wedges == 0 else (1_000_000 * 3 * tri) // wedges
    assert got == [(len(pairs), wedges, tri, clustering)]
    assert 0 <= got[0][3] <= 1_000_000
