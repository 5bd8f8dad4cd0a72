"""Relational operator coverage over the driver's TPC-H-ish tables.

Each query maps a reference operator shape (SURVEY.md §2.D/E/F) onto the
provided tables so the driver's DuckDB gate exercises the engine's joins,
aggregations, sorts, dedups and set ops:

- D1-style inner hash join .............. customer_order_counts
- D2-style multi-join + grouped sum ..... nation_revenue
- D8 semi-join .......................... customers_with_orders
- D9 anti-join .......................... customers_without_orders
- E1/E2 grouped aggregation ............. pricing_summary, segment_stats
- windowed (streaming-shaped) aggregate . events_hourly
- F1/F7 global sort + limit ............. top_orders
- F4 exact dedup ........................ distinct_flag_status
- F5 first-wins per key ................. first_order_per_customer

Float policy: money columns are exact at 2 decimals in the test data, so
sums are computed in integer cents (exact, order-independent — safe for
the driver's value hash) and divided by 100.0 only at the end; the SQL
oracles do the identical integer arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from ..ops.topk import grouped_topk
from ..stages.salted import partial_count, default_partitions


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col: pa.ChunkedArray) -> pa.Array:
    """Exact integer cents from a 2-dp double column."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str) -> Dataset:
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        disc_price = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, type=pa.int64()), disc_c)
        )
        out = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "price_c": price_c,
                "disc_price_c4": disc_price,  # cents × 100
            }
        )
        # combiner: collapse to one row per key per batch before the shuffle
        g = out.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_c", "sum"), ("disc_price_c4", "sum"),
             ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "price_c", "disc_price_c4", "cnt"]
        )

    agg = li.map_batches(prep, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("price_c", alias_name="_pc"),
        Sum("disc_price_c4", alias_name="_dp"),
        Sum("cnt", alias_name="count_order"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": t.column("sum_qty"),
                "sum_base_price": pc.divide(
                    pc.cast(t.column("_pc"), pa.float64()), pa.scalar(100.0)
                ),
                "sum_disc_price": pc.divide(
                    pc.cast(t.column("_dp"), pa.float64()), pa.scalar(10000.0)
                ),
                "count_order": t.column("count_order"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------


def q_top_orders(sf_dir: str) -> Dataset:
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    return orders.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(100)


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------


def q_customer_order_counts(sf_dir: str) -> Dataset:
    orders = _read(sf_dir, "orders", ["o_custkey"])
    counts = partial_count(orders, ["o_custkey"], out="n_orders")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = counts.join(cust, "inner", num_partitions=default_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))
    return joined.map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": t.column("c_name"),
                "n_orders": t.column("n_orders"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
"""


# ---------------------------------------------------------------------------


def q_nation_revenue(sf_dir: str) -> Dataset:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_c4": pc.multiply(
                    price_c, pc.subtract(pa.scalar(100, type=pa.int64()), disc_c)
                ),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j1 = li.join(orders, "inner", num_partitions=default_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = j1.join(cust, "inner", num_partitions=default_partitions(),
                 on=("o_custkey",), right_on=("c_custkey",))

    # nation is 25 rows → broadcast lookup, no shuffle (SURVEY.md §2.D4)
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nat_keys = pc.cast(nat.column("n_nationkey"), pa.int64()).combine_chunks()
    nat_names = pc.cast(nat.column("n_name"), pa.string()).combine_chunks()

    def add_nation(t: pa.Table) -> pa.Table:
        # D4 idiom (wikiprocess.py:237-245): index_in/take against the
        # 25-key broadcast arrays — no per-row Python over lineitem-scale rows
        idx = pc.index_in(
            pc.cast(t.column("c_nationkey"), pa.int64()), value_set=nat_keys
        )
        return pa.table(
            {
                "n_name": pc.take(nat_names, idx),
                "rev_c4": t.column("rev_c4"),
            }
        )

    agg = (
        j2.map_batches(add_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_c4", alias_name="_r"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "n_name": t.column("n_name"),
                "revenue": pc.divide(pc.cast(t.column("_r"), pa.float64()),
                                     pa.scalar(10000.0)),
            }
        ),
        batch_format="pyarrow",
    )


SQL_NATION_REVENUE = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------


def q_customers_without_orders(sf_dir: str) -> Dataset:
    """Anti-join D9 shape: customers with no order above 300k (plain
    "no orders" is empty in this data — an empty Dataset also loses its
    schema, so the filtered variant keeps the check meaningful)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300000.0)))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return cust.join(big, "left_anti", num_partitions=default_partitions(),
                     on=("c_custkey",), right_on=("o_custkey",))


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer c
ANTI JOIN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0) o
  ON o.o_custkey = c.c_custkey
"""


def q_customers_with_orders(sf_dir: str) -> Dataset:
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return cust.join(orders, "left_semi", num_partitions=default_partitions(),
                     on=("c_custkey",), right_on=("o_custkey",))


SQL_CUSTOMERS_WITH_ORDERS = """
SELECT c_custkey, c_name FROM customer c
SEMI JOIN orders o ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------


def q_first_order_per_customer(sf_dir: str) -> Dataset:
    # F5 with a DEFINED deterministic rule (earliest date, then lowest
    # key) — the reference's DISTINCT ON here is unstable
    # (steps/wikidata_process.sh:51-66, SURVEY.md §2.F5).
    # grouped_topk(k=1), NOT groupby().map_groups: customers are MANY TINY
    # groups, the per-group pandas dispatch regime measured at 6× elsewhere
    # (CLAUDE.md round-2 rule; ops/topk.py is the sorted-run replacement).
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
    return grouped_topk(
        orders, ["o_custkey"], [("o_orderdate", True), ("o_orderkey", True)], k=1
    )


SQL_FIRST_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------


def q_events_hourly(sf_dir: str) -> Dataset:
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        hour = pc.multiply(pc.divide(us, pa.scalar(3_600_000_000)),
                           pa.scalar(3_600_000_000))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": pc.cast(hour, pa.timestamp("us")),
                "value_c": _cents(t.column("value")),
                "value": t.column("value"),
            }
        )

    agg = ev.map_batches(prep, batch_format="pyarrow").groupby(
        ["event_type", "hour"]
    ).aggregate(
        Count(alias_name="n_events"),
        Sum("value_c", alias_name="_sv"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": t.column("hour"),
                "n_events": t.column("n_events"),
                "sum_value": pc.divide(pc.cast(t.column("_sv"), pa.float64()),
                                       pa.scalar(100.0)),
                "min_value": t.column("min_value"),
                "max_value": t.column("max_value"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_HOURLY = """
SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type, DATE_TRUNC('hour', ts)
"""


# ---------------------------------------------------------------------------
# Q: events_hopping — hopping (sliding) window aggregate: 3-hour windows
# advancing every hour, per event_type. Streaming-window class the
# tumbling events_hourly doesn't cover: each event lands in exactly
# ``HOP_WINDOWS`` windows, so the expansion is a bounded fan-out (3×)
# done in-batch, THEN the partial combine collapses it before the one
# shuffle — raw events never shuffle, only (type, window, count, cents)
# partials. Money stays integer cents end-to-end (the pricing_summary
# float policy).

HOP_WINDOWS = 3
_HOUR_US = 3_600_000_000


def q_events_hopping(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_sums

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def expand_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        hour = (us // _HOUR_US) * _HOUR_US
        cents = _cents(t.column("value")).to_numpy()
        types = t.column("event_type")
        parts = []
        for k in range(HOP_WINDOWS):
            parts.append(
                pa.table(
                    {
                        "event_type": types,
                        "window_us": pa.array(hour - k * _HOUR_US),
                        "n_events": pa.array(np.ones(len(t), dtype=np.int64)),
                        "sum_cents": pa.array(cents),
                    }
                )
            )
        exp = pa.concat_tables(parts)
        g = exp.group_by(["event_type", "window_us"]).aggregate(
            [("n_events", "sum"), ("sum_cents", "sum")]
        )
        return g.rename_columns(
            ["event_type", "window_us", "n_events", "sum_cents"]
        )

    partials = ev.map_batches(expand_partial, batch_format="pyarrow")
    merged = merge_group_sums(
        partials, ["event_type", "window_us"], ["n_events", "sum_cents"]
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": pc.cast(t.column("window_us"), pa.timestamp("us")),
                "n_events": t.column("n_events"),
                "sum_value": pc.divide(
                    pc.cast(t.column("sum_cents"), pa.float64()),
                    pa.scalar(100.0),
                ),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


SQL_EVENTS_HOPPING = f"""
SELECT event_type,
       DATE_TRUNC('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value
FROM events, range(0, {HOP_WINDOWS}) r(k)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------


def q_segment_stats(sf_dir: str) -> Dataset:
    cust = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "bal_c": _cents(t.column("c_acctbal")),
            }
        )

    agg = cust.map_batches(prep, batch_format="pyarrow").groupby(
        "c_mktsegment"
    ).aggregate(Count(alias_name="n_customers"), Sum("bal_c", alias_name="_b"))
    return agg.map_batches(
        lambda t: pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "n_customers": t.column("n_customers"),
                "sum_acctbal": pc.divide(pc.cast(t.column("_b"), pa.float64()),
                                         pa.scalar(100.0)),
            }
        ),
        batch_format="pyarrow",
    )


SQL_SEGMENT_STATS = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_acctbal
FROM customer GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------


def q_distinct_flag_status(sf_dir: str) -> Dataset:
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    dedup = partial_count(li, ["l_returnflag", "l_linestatus"], out="_c")
    return dedup.select_columns(["l_returnflag", "l_linestatus"])


SQL_DISTINCT_FLAG_STATUS = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


def q_top_orders_per_customer(sf_dir: str) -> Dataset:
    """Per-group top-k (k=3, highest o_totalprice, o_orderkey tie-break)
    — the ROW_NUMBER() window pattern as a distributed op: block-local
    pre-prune bounds shuffle traffic to ≤ k rows/group/block
    (ops/topk.grouped_topk)."""
    from ..ops.topk import grouped_topk

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return grouped_topk(
        orders,
        keys=["o_custkey"],
        order_by=[("o_totalprice", False), ("o_orderkey", True)],
        k=3,
        rank_col="rn",
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


RELATIONAL_QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_orders": q_top_orders,
    "customer_order_counts": q_customer_order_counts,
    "nation_revenue": q_nation_revenue,
    "customers_without_orders": q_customers_without_orders,
    "customers_with_orders": q_customers_with_orders,
    "first_order_per_customer": q_first_order_per_customer,
    "top_orders_per_customer": q_top_orders_per_customer,
    "events_hourly": q_events_hourly,
    "events_hopping": q_events_hopping,
    "segment_stats": q_segment_stats,
    "distinct_flag_status": q_distinct_flag_status,
}

RELATIONAL_ORACLES = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_orders": SQL_TOP_ORDERS,
    "customer_order_counts": SQL_CUSTOMER_ORDER_COUNTS,
    "nation_revenue": SQL_NATION_REVENUE,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "customers_with_orders": SQL_CUSTOMERS_WITH_ORDERS,
    "first_order_per_customer": SQL_FIRST_ORDER_PER_CUSTOMER,
    "top_orders_per_customer": SQL_TOP_ORDERS_PER_CUSTOMER,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_hopping": SQL_EVENTS_HOPPING,
    "segment_stats": SQL_SEGMENT_STATS,
    "distinct_flag_status": SQL_DISTINCT_FLAG_STATUS,
}


# ---------------------------------------------------------------------------
# Q: order_rollup — multi-dimensional subtotals (GROUP BY ROLLUP
# (status, priority)): the OLAP cube slice every reporting layer needs.
# ONE pass emits each row's THREE grouping-set keys (detail / per-status
# / grand total) as count-sum partials with a sentinel-free NULL for the
# rolled-up level — merge_group_sums' null-safe sort keys (the round-1
# metro_counts hardening) carry them through a single combined shuffle;
# no second aggregation pass, no union of three scans (movement = 3
# partial rows per input group per block).


def q_order_rollup(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_sums

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partials(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        base = pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": pa.array(np.ones(len(t), dtype=np.int64)),
                "total_cents": cents,
            }
        )
        nulls_p = pa.nulls(len(t), pa.string())
        lvl1 = base.set_column(1, "o_orderpriority", nulls_p)
        lvl0 = lvl1.set_column(0, "o_orderstatus", nulls_p)
        allp = pa.concat_tables([base, lvl1, lvl0])
        g = allp.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("n_orders", "sum"), ("total_cents", "sum")]
        )
        return g.rename_columns(
            ["o_orderstatus", "o_orderpriority", "n_orders", "total_cents"]
        )

    return merge_group_sums(
        orders.map_batches(partials, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        ["n_orders", "total_cents"],
    )


SQL_ORDER_ROLLUP = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Q: user_event_pivot — long-to-wide reshaping (PIVOT): per user, one
# column per event type with its count (the feature-vector layout ML
# consumers want). Conditional-aggregation form on both sides: in-batch
# per-(user) conditional sums → ONE combiner merge — the pivot itself
# adds ZERO movement over a plain per-user count.

PIVOT_TYPES = ("view", "click", "purchase", "signup", "error")


def q_user_event_pivot(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    cols = [f"n_{et}" for et in PIVOT_TYPES]

    def partials(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        data = {"user_id": t["user_id"]}
        for name, typ in zip(cols, PIVOT_TYPES):
            data[name] = pc.cast(pc.equal(et, typ), pa.int64())
        p = pa.table(data)
        g = p.group_by(["user_id"]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["user_id", *cols])

    return merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["user_id"],
        cols,
    )


SQL_USER_EVENT_PIVOT = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error
FROM events GROUP BY 1
"""

RELATIONAL_QUERIES["order_rollup"] = q_order_rollup
RELATIONAL_ORACLES["order_rollup"] = SQL_ORDER_ROLLUP
RELATIONAL_QUERIES["user_event_pivot"] = q_user_event_pivot
RELATIONAL_ORACLES["user_event_pivot"] = SQL_USER_EVENT_PIVOT


# ---------------------------------------------------------------------------
# Q: ship_delay_stats — per-priority order-to-ship latency: the classic
# fact-to-fact date-arithmetic join (lineitem ⋈ orders on orderkey) with
# exact integer day deltas, published as count/sum plus the exact
# PERCENTILE_DISC(0.5) median on the histogram-partials path (delay
# days are a small integer domain, so the (priority, delay) histogram
# is bounded regardless of corpus size). Movement: the join moves only
# (orderkey, days) vs (orderkey, priority, date) columns; after it,
# histogram partials ride ONE combiner merge.


def q_ship_delay_stats(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_sums

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def li_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "ship_day": pc.cast(
                    pc.cast(t["l_shipdate"], pa.date32()), pa.int32()
                ),
            }
        )

    def o_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "order_day": pc.cast(
                    pc.cast(t["o_orderdate"], pa.date32()), pa.int32()
                ),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    joined = li.map_batches(li_keyed, batch_format="pyarrow").join(
        orders.map_batches(o_keyed, batch_format="pyarrow"),
        "inner",
        num_partitions=default_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def hist(t: pa.Table) -> pa.Table:
        days = pc.subtract(
            pc.cast(t["ship_day"], pa.int64()),
            pc.cast(t["order_day"], pa.int64()),
        )
        p = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "delay_days": days,
                "cnt": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        g = p.group_by(["o_orderpriority", "delay_days"]).aggregate(
            [("cnt", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "delay_days", "cnt"])

    merged = merge_group_sums(
        joined.map_batches(hist, batch_format="pyarrow"),
        ["o_orderpriority", "delay_days"],
        ["cnt"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        pr = np.asarray(t.column("o_orderpriority").to_pylist(), dtype=object)
        v = t.column("delay_days").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        o = np.lexsort((v, pr))
        pr, v, c = pr[o], v[o], c[o]
        out = {"o_orderpriority": [], "n_items": [], "sum_delay_days": [],
               "median_delay_days": []}
        for p_ in np.unique(pr):
            m = pr == p_
            cs = np.cumsum(c[m])
            idx = max(1, int(np.ceil(0.5 * int(cs[-1]))))
            out["o_orderpriority"].append(p_)
            out["n_items"].append(int(cs[-1]))
            out["sum_delay_days"].append(int((v[m] * c[m]).sum()))
            out["median_delay_days"].append(
                int(v[m][np.searchsorted(cs, idx)])
            )
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    out["o_orderpriority"], type=pa.string()
                ),
                "n_items": pa.array(out["n_items"], type=pa.int64()),
                "sum_delay_days": pa.array(
                    out["sum_delay_days"], type=pa.int64()
                ),
                "median_delay_days": pa.array(
                    out["median_delay_days"], type=pa.int64()
                ),
            }
        )

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


SQL_SHIP_DELAY_STATS = """
WITH j AS (
  SELECT o.o_orderpriority,
         DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS delay_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(delay_days) AS BIGINT) AS sum_delay_days,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY delay_days)
         AS BIGINT) AS median_delay_days
FROM j GROUP BY 1
"""

RELATIONAL_QUERIES["ship_delay_stats"] = q_ship_delay_stats
RELATIONAL_ORACLES["ship_delay_stats"] = SQL_SHIP_DELAY_STATS


# ---------------------------------------------------------------------------
# Q: customer_rfm — RFM segmentation (recency / frequency / monetary),
# the classic behavioral-scoring op of CRM analytics: per customer,
# last-order day, order count and lifetime cents, each bucketed by
# FIXED thresholds into 1-3 scores and combined into an RFM code. All
# integer arithmetic (days since epoch, counts, cents) — exact at any
# parallelism; per-batch combined min/max/sum partials ride ONE
# `merge_group_aggs` shuffle (the I7 combined-aggregate path), buckets
# are a stateless epilogue map.

RFM_R_DAYS = (10000, 11000)  # day-number cuts (fixture span 9131-11535)
RFM_F_CUTS = (9, 12)
RFM_M_CENTS = (150_000_000, 300_000_000)


def q_customer_rfm(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_aggs

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partials(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(t["o_orderdate"], pa.date32()).cast(pa.int32()),
            pa.int64(),
        )
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        p = pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "last_day": day,
                "n_orders": pa.array(np.ones(len(t), dtype=np.int64)),
                "total_cents": cents,
            }
        )
        g = p.group_by(["o_custkey"]).aggregate(
            [("last_day", "max"), ("n_orders", "sum"), ("total_cents", "sum")]
        )
        return g.rename_columns(
            ["o_custkey", "last_day", "n_orders", "total_cents"]
        )

    agg = merge_group_aggs(
        orders.map_batches(partials, batch_format="pyarrow"),
        ["o_custkey"],
        [("last_day", "max"), ("n_orders", "sum"), ("total_cents", "sum")],
    )

    def buckets(t: pa.Table) -> pa.Table:
        d = t.column("last_day").to_numpy(zero_copy_only=False)
        f = t.column("n_orders").to_numpy(zero_copy_only=False)
        m = t.column("total_cents").to_numpy(zero_copy_only=False)
        r_s = 1 + (d >= RFM_R_DAYS[0]).astype(np.int64) + (
            d >= RFM_R_DAYS[1]
        ).astype(np.int64)
        f_s = 1 + (f >= RFM_F_CUTS[0]).astype(np.int64) + (
            f >= RFM_F_CUTS[1]
        ).astype(np.int64)
        m_s = 1 + (m >= RFM_M_CENTS[0]).astype(np.int64) + (
            m >= RFM_M_CENTS[1]
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "last_day": t["last_day"],
                "n_orders": t["n_orders"],
                "total_cents": t["total_cents"],
                "rfm_code": pa.array(r_s * 100 + f_s * 10 + m_s),
            }
        )

    return agg.map_batches(buckets, batch_format="pyarrow")


SQL_CUSTOMER_RFM = f"""
WITH agg AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
           AS last_day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY 1
)
SELECT o_custkey, last_day, n_orders, total_cents,
       CAST(
         (1 + CASE WHEN last_day >= {RFM_R_DAYS[0]} THEN 1 ELSE 0 END
            + CASE WHEN last_day >= {RFM_R_DAYS[1]} THEN 1 ELSE 0 END) * 100
         + (1 + CASE WHEN n_orders >= {RFM_F_CUTS[0]} THEN 1 ELSE 0 END
              + CASE WHEN n_orders >= {RFM_F_CUTS[1]} THEN 1 ELSE 0 END) * 10
         + (1 + CASE WHEN total_cents >= {RFM_M_CENTS[0]} THEN 1 ELSE 0 END
              + CASE WHEN total_cents >= {RFM_M_CENTS[1]} THEN 1 ELSE 0 END)
       AS BIGINT) AS rfm_code
FROM agg
"""

RELATIONAL_QUERIES["customer_rfm"] = q_customer_rfm
RELATIONAL_ORACLES["customer_rfm"] = SQL_CUSTOMER_RFM


# ---------------------------------------------------------------------------
# Q: bloom_semijoin_revenue — the distributed bloom-join (ops/bloom.py):
# revenue per order priority for orders whose customer is in the
# BUILDING market segment. The engine point is the JOIN PLAN, not the
# aggregate: the build side (segment customers) is turned into a
# ~2-byte/key Bloom filter, broadcast ONCE via ray.put, and the probe
# side (orders — the big fact table) is prefiltered IN PLACE before any
# shuffle; only bloom survivors (true matches + ~1% false positives)
# reach the exact verify step. Verify follows the house gated-attach
# contract: `pc.is_in` against the broadcast exact key set ≤ limit, a
# key-partitioned hash join above it (plan-equality pytest both ways +
# a no-false-negative property test in tests/test_bloom.py).
# At 100 TB: orders never shuffles; movement = one m/8-byte filter image
# per worker + the exact key set (or join shuffle of the ~segment-sized
# survivor stream) — vs shipping every order row to a join.


BLOOM_VERIFY_BROADCAST_LIMIT = 20_000_000


def q_bloom_semijoin_revenue(
    sf_dir: str, verify_broadcast_limit: int | None = None
) -> Dataset:
    import ray

    from ..ops.bloom import bloom_contains, bloom_log2m, build_bloom
    from ..stages.salted import merge_group_sums

    if verify_broadcast_limit is None:
        verify_broadcast_limit = BLOOM_VERIFY_BROADCAST_LIMIT

    build = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    ).select_columns(["c_custkey"]).materialize()
    n_build = build.count()

    log2m = bloom_log2m(n_build, bits_per_key=16)
    k = 6
    words_ref = ray.put(build_bloom(build, "c_custkey", log2m, k))

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"]
    )

    def prefilter(t: pa.Table) -> pa.Table:
        words = ray.get(words_ref)  # plasma-cached per worker, zero-copy
        keys = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bloom_contains(keys, words, log2m, k)))

    survivors = orders.map_batches(prefilter, batch_format="pyarrow")

    if n_build <= verify_broadcast_limit:
        keys_arr = pa.concat_tables(
            [b.select(["c_custkey"]) for b in build.iter_batches(
                batch_format="pyarrow")]
        ).column("c_custkey").combine_chunks()
        keys_ref = ray.put(keys_arr)

        def verify(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            return t.filter(pc.is_in(t["o_custkey"], value_set=ks))

        verified = survivors.map_batches(verify, batch_format="pyarrow")
    else:
        # >limit plan: key-partitioned hash join of the survivor stream
        # (already bloom-thinned) against the build keys.
        verified = survivors.join(
            build,
            "left_semi",
            num_partitions=default_partitions(),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )

    def partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": pa.array(np.ones(len(t), dtype=np.int64)),
                "total_cents": _cents(t["o_totalprice"]),
            }
        ).group_by(["o_orderpriority"]).aggregate(
            [("n_orders", "sum"), ("total_cents", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "n_orders", "total_cents"])

    return merge_group_sums(
        verified.map_batches(partials, batch_format="pyarrow"),
        ["o_orderpriority"],
        ["n_orders", "total_cents"],
    )


SQL_BLOOM_SEMIJOIN_REVENUE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY 1
"""

RELATIONAL_QUERIES["bloom_semijoin_revenue"] = q_bloom_semijoin_revenue
RELATIONAL_ORACLES["bloom_semijoin_revenue"] = SQL_BLOOM_SEMIJOIN_REVENUE


# ---------------------------------------------------------------------------
# Q: order_cube — GROUP BY CUBE (status, priority): order_rollup's
# four-grouping-set completion ((s,p), (s), (p), ()) — the full OLAP
# cross-tab. Same ONE-pass shape: each row scatters to its FOUR
# grouping-set keys with NULLs at rolled-up levels, all four sets ride
# one combined null-safe merge (movement = 4 partial rows per input
# group per block; no second pass, no union of scans).


def q_order_cube(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_sums

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partials(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        base = pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": pa.array(np.ones(len(t), dtype=np.int64)),
                "total_cents": cents,
            }
        )
        nulls = pa.nulls(len(t), pa.string())
        no_p = base.set_column(1, "o_orderpriority", nulls)
        no_s = base.set_column(0, "o_orderstatus", nulls)
        none = no_p.set_column(0, "o_orderstatus", nulls)
        allp = pa.concat_tables([base, no_p, no_s, none])
        g = allp.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("n_orders", "sum"), ("total_cents", "sum")]
        )
        return g.rename_columns(
            ["o_orderstatus", "o_orderpriority", "n_orders", "total_cents"]
        )

    return merge_group_sums(
        orders.map_batches(partials, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        ["n_orders", "total_cents"],
    )


SQL_ORDER_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

RELATIONAL_QUERIES["order_cube"] = q_order_cube
RELATIONAL_ORACLES["order_cube"] = SQL_ORDER_CUBE


# ---------------------------------------------------------------------------
# Q: region_trade_flows — the TPC-H Q7 "volume shipping" shape over the
# FULL dimension hierarchy (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
# region on the demand side, lineitem ⋈ supplier ⋈ nation ⋈ region on
# the supply side): revenue flowing from each supplier region to each
# customer region. Star-join plan, not five shuffles: the two FACT
# tables join ONCE each (lineitem⋈orders, →customer); supplier /
# nation / region are dimensions BY SCHEMA (bounded: suppliers ≈ 10⁴ ×
# SF, nations 25, regions 5) and attach via `pc.index_in` broadcast
# lookups (the D4 idiom; a supplier set past the broadcast gate would
# ride one more key join — named fallback). Revenue in exact cents×100
# ints (the pricing_summary policy). Output is |regions|²-bounded.


def q_region_trade_flows(sf_dir: str) -> Dataset:
    import pyarrow.parquet as pq

    from ..stages.salted import merge_group_sums

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    # dimension broadcast maps (suppkey→nationkey, nationkey→regionkey,
    # regionkey→name), all bounded by schema
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    sup_keys = pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks()
    sup_nat = sup["s_nationkey"].to_numpy().astype(np.int64)
    nat_keys = pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks()
    nat_reg = nat["n_regionkey"].to_numpy().astype(np.int64)
    reg_keys = pc.cast(reg["r_regionkey"], pa.int64()).combine_chunks()
    reg_names = pc.cast(reg["r_name"], pa.string()).combine_chunks()

    import ray

    dims_ref = ray.put(
        (sup_keys, sup_nat, nat_keys, nat_reg, reg_keys, reg_names)
    )

    def rev(t: pa.Table) -> pa.Table:
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev_c4": pc.multiply(
                    price_c,
                    pc.subtract(pa.scalar(100, type=pa.int64()), disc_c),
                ),
            }
        )

    j1 = li.map_batches(rev, batch_format="pyarrow").join(
        orders, "inner", num_partitions=default_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    j2 = j1.join(
        cust, "inner", num_partitions=default_partitions(),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def flows(t: pa.Table) -> pa.Table:
        sk, sn, nk, nr, rk, rn = ray.get(dims_ref)

        def lookup(keys_arr, idx_vals):
            pos = pc.index_in(keys_arr, value_set=idx_vals).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            return pos

        spos = lookup(pc.cast(t["l_suppkey"], pa.int64()), sk)
        s_region = nr[
            lookup(pa.array(sn[spos]), nk)
        ]
        cpos = lookup(pc.cast(t["c_nationkey"], pa.int64()), nk)
        c_region = nr[cpos]
        rpos_s = lookup(pa.array(s_region), rk)
        rpos_c = lookup(pa.array(c_region), rk)
        g = pa.table(
            {
                "supp_region": rn.take(pa.array(rpos_s)),
                "cust_region": rn.take(pa.array(rpos_c)),
                "n_items": pa.array(np.ones(len(t), dtype=np.int64)),
                "rev_c4": t["rev_c4"],
            }
        ).group_by(["supp_region", "cust_region"]).aggregate(
            [("n_items", "sum"), ("rev_c4", "sum")]
        )
        return g.rename_columns(
            ["supp_region", "cust_region", "n_items", "rev_c4"]
        )

    return merge_group_sums(
        j2.map_batches(flows, batch_format="pyarrow"),
        ["supp_region", "cust_region"],
        ["n_items", "rev_c4"],
    )


SQL_REGION_TRADE_FLOWS = """
SELECT rs.r_name AS supp_region, rc.r_name AS cust_region,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100.0, 0) AS BIGINT)))
            AS BIGINT) AS rev_c4
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
JOIN region rc ON rc.r_regionkey = nc.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ns ON ns.n_nationkey = s_nationkey
JOIN region rs ON rs.r_regionkey = ns.n_regionkey
GROUP BY 1, 2
"""

RELATIONAL_QUERIES["region_trade_flows"] = q_region_trade_flows
RELATIONAL_ORACLES["region_trade_flows"] = SQL_REGION_TRADE_FLOWS


# ---------------------------------------------------------------------------
# Q: part_brand_revenue — the part-dimension attach (TPC-H Q14 family):
# revenue and volume per part brand. Parts are the LARGEST TPC-H
# dimension (200K × SF — NOT trivially broadcastable at warehouse
# scale), so the attach is GATED: `pc.index_in` broadcast of the
# (partkey → brand) map ≤ limit, a partkey-keyed hash join above it
# (plan-equality pytest with the limit forced to 0). Revenue in exact
# cents×100 ints; output |brands|-bounded.

PART_BROADCAST_LIMIT = 20_000_000


def q_part_brand_revenue(
    sf_dir: str, part_broadcast_limit: int | None = None
) -> Dataset:
    import pyarrow.parquet as pq

    from ..stages.salted import merge_group_sums

    if part_broadcast_limit is None:
        part_broadcast_limit = PART_BROADCAST_LIMIT

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "rev_c4": pc.multiply(
                    price_c,
                    pc.subtract(pa.scalar(100, type=pa.int64()), disc_c),
                ),
            }
        )

    keyed = li.map_batches(rev, batch_format="pyarrow")

    n_parts = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    if n_parts <= part_broadcast_limit:
        import ray

        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_brand"])
        ref = ray.put(
            (
                pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
                pc.cast(part["p_brand"], pa.string()).combine_chunks(),
            )
        )

        def attach(t: pa.Table) -> pa.Table:
            keys, brands = ray.get(ref)
            pos = pc.index_in(t["l_partkey"], value_set=keys)
            return t.append_column("p_brand", brands.take(pos))

        branded = keyed.map_batches(attach, batch_format="pyarrow")
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand"])
        part_ds = part_ds.map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                    "p_brand": pc.cast(t["p_brand"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        branded = keyed.join(
            part_ds, "inner", num_partitions=default_partitions(),
            on=("l_partkey",), right_on=("p_partkey",),
        )

    def partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "p_brand": t["p_brand"],
                "n_items": pa.array(np.ones(len(t), dtype=np.int64)),
                "rev_c4": t["rev_c4"],
            }
        ).group_by(["p_brand"]).aggregate(
            [("n_items", "sum"), ("rev_c4", "sum")]
        )
        return g.rename_columns(["p_brand", "n_items", "rev_c4"])

    return merge_group_sums(
        branded.map_batches(partials, batch_format="pyarrow"),
        ["p_brand"],
        ["n_items", "rev_c4"],
    )


SQL_PART_BRAND_REVENUE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100.0, 0) AS BIGINT)))
            AS BIGINT) AS rev_c4
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1
"""

RELATIONAL_QUERIES["part_brand_revenue"] = q_part_brand_revenue
RELATIONAL_ORACLES["part_brand_revenue"] = SQL_PART_BRAND_REVENUE
