"""Query registry: every operator from SURVEY.md §2 as a (Spark plan,
DuckDB oracle) pair, runnable by the driver harness.

Oracle-parity design rules (learned constraints, applied everywhere):

1. Never SUM/AVG raw doubles. Double addition is non-associative and
   Spark's partial-aggregate order is nondeterministic, so two runs
   (or Spark vs DuckDB) differ in the last ULPs. Instead integer-ize
   per row — ``CAST(ROUND(expr * 100) AS BIGINT)`` — which is a
   deterministic IEEE-754 computation both engines execute identically,
   then SUM exactly as bigint. Averages are exact-int sums divided by
   exact counts (one double division of identical operands → identical
   bits).
2. Cast int-ish computed columns to BIGINT on the Spark side: DuckDB's
   date parts / date_diff / counts are all BIGINT, Spark's are INT.
3. DuckDB ``SUM(BIGINT)`` returns HUGEINT → always CAST back to BIGINT
   in the oracle.
4. ``dayofweek``: Spark is 1=Sunday..7, DuckDB 0=Sunday..6 → +1 in SQL.
5. Timestamps never cross the compare boundary raw: group keys become
   DATE or formatted strings (UTC session timezone, set per query).
6. Deterministic top-k only: every ORDER BY ends with a unique key.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_immigration_data_lake_spark.functions.dates import season_expr, SAS_EPOCH
from us_immigration_data_lake_spark.functions.text import normalized_text
from us_immigration_data_lake_spark.operators.joins import dim_join, semi_join, anti_join
from us_immigration_data_lake_spark.operators.windows import top_k_per_group
from us_immigration_data_lake_spark.operators import dedup as dedup_ops
from us_immigration_data_lake_spark.operators import multimodal as mm_ops
from us_immigration_data_lake_spark.operators import similarity as sim_ops
from us_immigration_data_lake_spark.operators import textstats as ts_ops
from us_immigration_data_lake_spark.operators import pii as pii_ops
from us_immigration_data_lake_spark.sources.events import load_events as _load_events


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    # Declared result schema (Spark DDL string) for queries whose fn is
    # EAGER — i.e. executes actions just to build the result frame (q186
    # runs the full corpus pipeline's .count()s).  The declared-type
    # gate and scripts/type_audit.py read this instead of calling fn(),
    # so "neither side executes" stays true for them; the value-parity
    # sweep still executes fn() and pytest asserts this DDL matches the
    # executed frame's actual schema, so the hook can't drift.
    result_schema: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def _register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    result_schema: str | None = None,
):
    def deco(fn):
        QUERIES[name] = QuerySpec(
            fn=fn, oracle=oracle, tags=tags, bench=bench,
            result_schema=result_schema,
        )
        return fn
    return deco


def _tune(spark: SparkSession) -> None:
    """Deterministic runtime confs — safe on a session we don't own."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # a foreign session's default 200 shuffle partitions is pure
        # overhead at bench scale (AQE coalesces batch shuffles, but
        # streaming state shuffles use the raw value)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # mtime-keyed schema cache skips the ~165 ms/call footer inference
    # (sources/schema_cache.py — the catalog a production deployment
    # would consult instead)
    from us_immigration_data_lake_spark.sources.schema_cache import (
        read_parquet_cached,
    )

    return read_parquet_cached(spark, f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet ts encoding varies by testdata generation
    (epoch-nanos int64 / TIMESTAMP_NTZ / TIMESTAMP); sources/events.py
    normalizes all three to a session-tz TIMESTAMP."""
    return _load_events(spark, f"{sf_dir.rstrip('/')}/events.parquet")


def _cents(col) -> F.Column:
    """Per-row deterministic money→bigint-cents (rule 1)."""
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Q01 — pricing summary (TPC-H Q1 shape; flagship).
# Re-expresses the reference's grouped-aggregate pattern (etl.py:169-183,
# 355-358) over the fact table: filter → groupBy → partial+final hash agg.
# Scale: single shuffle on 2 low-cardinality keys; filter + 7-col pruning
# pushed to the parquet scan.
# ---------------------------------------------------------------------------

@_register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)                        AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)        AS sum_base_price_c,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
           CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)             AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_price_c,
           CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) / COUNT(*)  AS avg_disc_pct,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "scan"),
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    base_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge_c = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(base_c).alias("sum_base_price_c"),
            F.sum(disc_c).alias("sum_disc_price_c"),
            F.sum(charge_c).alias("sum_charge_c"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(base_c).cast("double") / F.count(F.lit(1))).alias("avg_price_c"),
            (F.sum(disc_pct).cast("double") / F.count(F.lit(1))).alias("avg_disc_pct"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q02 — date dimension (the reference's richest single pipeline: the
# ARRIVALDATE build, etl.py:292-336 — SAS day-number, ISO date, date
# parts, season CASE, distinct). Native expressions replace UDFs U1/U4.
# ---------------------------------------------------------------------------

@_register(
    "q02_date_dim",
    oracle=f"""
    SELECT DISTINCT
           date_diff('day', DATE '{SAS_EPOCH}', CAST(l_shipdate AS DATE)) AS sasdate,
           CAST(l_shipdate AS DATE)                  AS iso_date,
           dayofmonth(CAST(l_shipdate AS DATE))      AS date_day,
           month(CAST(l_shipdate AS DATE))           AS date_month,
           year(CAST(l_shipdate AS DATE))            AS date_year,
           dayofweek(CAST(l_shipdate AS DATE)) + 1   AS day_of_week,
           weekofyear(CAST(l_shipdate AS DATE))      AS date_weekofyear,
           CASE WHEN month(CAST(l_shipdate AS DATE)) IN (12,1,2) THEN 'winter'
                WHEN month(CAST(l_shipdate AS DATE)) IN (3,4,5)  THEN 'spring'
                WHEN month(CAST(l_shipdate AS DATE)) IN (6,7,8)  THEN 'summer'
                ELSE 'autumn' END                    AS date_season
    FROM lineitem
    """,
    tags=("dates", "distinct", "case"),
    bench=True,
)
def q02_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    d = F.to_date("l_shipdate")
    return (
        li.select(
            F.datediff(d, F.lit(SAS_EPOCH).cast("date")).cast("long").alias("sasdate"),
            d.alias("iso_date"),
            F.dayofmonth(d).cast("long").alias("date_day"),
            F.month(d).cast("long").alias("date_month"),
            F.year(d).cast("long").alias("date_year"),
            F.dayofweek(d).cast("long").alias("day_of_week"),
            F.weekofyear(d).cast("long").alias("date_weekofyear"),
            season_expr(F.month(d)).alias("date_season"),
        )
        .dropDuplicates()
    )


# ---------------------------------------------------------------------------
# Q03 — fact build (IMMIGRATION analog, etl.py:224-273): project+cast the
# fact, derive `stay` via native datediff (replaces UDF U2, etl.py:76-90),
# join the order dim. Broadcast is wrong here (orders ~ fact/4 rows) so it
# shuffles on the join key — the canonical large-large sort-merge join.
# ---------------------------------------------------------------------------

@_register(
    "q03_fact_stay",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(l.l_quantity AS BIGINT) AS quantity,
           CAST(ROUND(l.l_extendedprice*100) AS BIGINT) AS price_c,
           CAST(l.l_shipdate AS DATE) AS ship_date,
           CAST(o.o_orderdate AS DATE) AS order_date,
           date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS stay_days,
           o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
    tags=("join", "project", "dates"),
    bench=True,
)
def q03_fact_stay(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
    return joined.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_quantity").cast("long").alias("quantity"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.to_date("o_orderdate").alias("order_date"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).cast("long").alias("stay_days"),
        "o_orderpriority",
    )


# ---------------------------------------------------------------------------
# Q04 — top revenue orders (TPC-H Q3 shape): 3-way join, grouped agg,
# deterministic global top-10 → TakeOrderedAndProject, no full sort.
# ---------------------------------------------------------------------------

@_register(
    "q04_top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE)  > DATE '1996-03-15'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue_c DESC, o.o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q04_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1996-03-15").cast("date")
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(rev).alias("revenue_c"))
        .select("o_orderkey", "revenue_c", "order_date")
        .orderBy(F.desc("revenue_c"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q05 — semi join: order-priority counts for orders having ≥1 heavy line
# (LeftSemi — right side never materializes; SURVEY.md §2.3 extension).
# ---------------------------------------------------------------------------

@_register(
    "q05_priority_semi",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
    """,
    tags=("semi-join", "agg"),
)
def q05_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    heavy = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        semi_join(orders, heavy, orders.o_orderkey == heavy.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q06 — anti join: customers with no finished ('F') orders (NOT EXISTS).
# ---------------------------------------------------------------------------

@_register(
    "q06_customers_no_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("anti-join",),
)
def q06_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return anti_join(cust, orders, cust.c_custkey == orders.o_custkey).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# Q07 — pivot (DEMOGRAPHICS race-pivot analog, etl.py:183): nation ×
# market-segment matrix with EXPLICIT value list (no distinct pre-scan;
# unbounded pivots are unsafe at scale — SURVEY.md §7).
# ---------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

@_register(
    "q07_segment_pivot",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN c.c_mktsegment='AUTOMOBILE' THEN CAST(ROUND(c.c_acctbal*100) AS BIGINT) END) AS BIGINT) AS AUTOMOBILE,
           CAST(SUM(CASE WHEN c.c_mktsegment='BUILDING'   THEN CAST(ROUND(c.c_acctbal*100) AS BIGINT) END) AS BIGINT) AS BUILDING,
           CAST(SUM(CASE WHEN c.c_mktsegment='FURNITURE'  THEN CAST(ROUND(c.c_acctbal*100) AS BIGINT) END) AS BIGINT) AS FURNITURE,
           CAST(SUM(CASE WHEN c.c_mktsegment='HOUSEHOLD'  THEN CAST(ROUND(c.c_acctbal*100) AS BIGINT) END) AS BIGINT) AS HOUSEHOLD,
           CAST(SUM(CASE WHEN c.c_mktsegment='MACHINERY'  THEN CAST(ROUND(c.c_acctbal*100) AS BIGINT) END) AS BIGINT) AS MACHINERY
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("pivot", "broadcast-join"),
)
def q07_segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        dim_join(cust, nation, cust.c_nationkey == nation.n_nationkey, how="inner")
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.sum(_cents(F.col("c_acctbal"))))
    )


# ---------------------------------------------------------------------------
# Q08 — dim enrichment (COUNTRY analog, etl.py:338-396): nation ⋈ region
# (broadcast), left join aggregated supplier stats, coalesce fallback for
# nations with no suppliers (replaces the when(isnull) at etl.py:389-390).
# ---------------------------------------------------------------------------

@_register(
    "q08_nation_enrich",
    oracle="""
    SELECT n.n_nationkey, lower(n.n_name) AS nation_name, r.r_name AS region_name,
           COALESCE(s.cnt, 0) AS supplier_cnt,
           COALESCE(s.bal_c, 0) AS supplier_bal_c
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN (SELECT s_nationkey, COUNT(*) AS cnt,
                      CAST(SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_c
               FROM supplier GROUP BY s_nationkey) s
      ON s.s_nationkey = n.n_nationkey
    """,
    tags=("broadcast-join", "left-join", "coalesce"),
)
def q08_nation_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_cents(F.col("s_acctbal"))).alias("bal_c"),
        )
    )
    return (
        dim_join(nation, region, nation.n_regionkey == region.r_regionkey, how="inner")
        .join(F.broadcast(supp), F.col("s_nationkey") == F.col("n_nationkey"), "left")
        .select(
            "n_nationkey",
            F.lower("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.coalesce("cnt", F.lit(0)).alias("supplier_cnt"),
            F.coalesce("bal_c", F.lit(0)).alias("supplier_bal_c"),
        )
    )


# ---------------------------------------------------------------------------
# Q09 — window ranking (SURVEY.md §2.5): top-2 orders per customer,
# deterministic tiebreak on the unique key.
# ---------------------------------------------------------------------------

@_register(
    "q09_top_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 2
    """,
    tags=("window",),
    bench=True,
)
def q09_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    ranked = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=2,
        rank_col="rn",
    )
    return ranked.select(
        "o_custkey",
        "o_orderkey",
        _cents(F.col("o_totalprice")).alias("total_c"),
        F.col("rn").cast("long").alias("rn"),
    )


# ---------------------------------------------------------------------------
# Q10 — rollup (SURVEY.md §2.4 extension): customer counts by region/nation
# with subtotal + grand-total rows.
# ---------------------------------------------------------------------------

@_register(
    "q10_rollup_customers",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS customer_cnt,
           CAST(SUM(CAST(ROUND(c.c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_c
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("rollup",),
)
def q10_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"),
                _cents(F.col("c_acctbal")).alias("bal_c"))
    )
    return joined.rollup("region_name", "nation_name").agg(
        F.count(F.lit(1)).alias("customer_cnt"),
        F.sum("bal_c").alias("bal_c"),
    )


# ---------------------------------------------------------------------------
# Q11 — set ops (SURVEY.md §2.5): tagged union of intersect/except results.
# ---------------------------------------------------------------------------

@_register(
    "q11_setops_custkeys",
    oracle="""
    SELECT 'with_orders' AS tag, c_custkey FROM
      (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'no_orders' AS tag, c_custkey FROM
      (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
    """,
    tags=("setops",),
)
def q11_setops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust_keys = _t(spark, sf_dir, "customer").select("c_custkey")
    order_keys = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    with_orders = cust_keys.intersect(order_keys).select(
        F.lit("with_orders").alias("tag"), "c_custkey"
    )
    no_orders = cust_keys.exceptAll(order_keys.distinct()).distinct().select(
        F.lit("no_orders").alias("tag"), "c_custkey"
    )
    return with_orders.unionByName(no_orders)


# ---------------------------------------------------------------------------
# Q12 — distinct aggregation (SURVEY.md §2.4 extension).
# ---------------------------------------------------------------------------

@_register(
    "q12_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS order_cnt,
           MIN(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS min_total_c,
           MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS max_total_c
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "distinct-agg"),
)
def q12_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    total_c = _cents(F.col("o_totalprice"))
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct(F.col("o_custkey")).alias("distinct_customers"),
        F.count(F.lit(1)).alias("order_cnt"),
        F.min(total_c).alias("min_total_c"),
        F.max(total_c).alias("max_total_c"),
    )


# ---------------------------------------------------------------------------
# Q13 — JSON extraction over events (SURVEY.md §2.6 extension; props is a
# JSON string column).
# ---------------------------------------------------------------------------

@_register(
    "q13_events_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def q13_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# Q14 — hourly event aggregation (batch form of the streaming slice;
# SURVEY.md §2.9). Hour bucket exported as a formatted UTC string so no
# timestamp crosses the compare boundary.
# ---------------------------------------------------------------------------

@_register(
    "q14_events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events
    GROUP BY 1, 2
    """,
    tags=("dates", "agg", "events"),
    bench=True,
)
def q14_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("value_c"),
        )
    )


# ===========================================================================
# LLM-data-pipeline operators (SURVEY.md §2.10) over documents/embeddings.
# ===========================================================================

# ---------------------------------------------------------------------------
# Q15 — exact dedup by content fingerprint: survivor = min doc_id per
# normalized text (deterministic, one hash-aggregate — dedup_exact's
# keyed form, operators/aggregate.py).
# ---------------------------------------------------------------------------

@_register(
    "q15_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    GROUP BY 3
    """,
    tags=("dedup", "fingerprint"),
    bench=True,
)
def q15_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(normalized_text(F.col("text"))).alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_cnt"))
        .select("doc_id", "dup_cnt", "fingerprint")
    )


# ---------------------------------------------------------------------------
# Q16 — text statistics per language: exact-integer token/char/stopword
# counts (operators/textstats.py) rolled up with deterministic averages.
# ---------------------------------------------------------------------------

@_register(
    "q16_text_stats",
    oracle="""
    WITH feat AS (
      SELECT lang,
             length(text) AS n_chars_obs,
             array_length(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             array_length(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS docs,
           CAST(SUM(n_chars_obs) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
           CAST(SUM(n_distinct) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE) AS distinct_ratio
    FROM feat GROUP BY lang
    """,
    tags=("textstats", "agg"),
    bench=True,
)
def q16_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    tok = F.split(F.trim(F.col("text")), r"\s+")
    feat = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars_obs"),
        F.size(tok).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("long").alias("n_distinct"),
    )
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars_obs").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        (F.sum("n_distinct").cast("double") / F.sum("n_tokens").cast("double")).alias("distinct_ratio"),
    )


# ---------------------------------------------------------------------------
# Q17 — quality scoring (textstats.quality_score): per-doc composite from
# exact-integer features; deterministic double formula, rounded.
# ---------------------------------------------------------------------------

@_register(
    "q17_quality_score",
    oracle="""
    WITH tok AS (
      -- drop empty tokens to mirror the engine's tokens() helper, which
      -- filters '' so an empty/whitespace-only document has n_tokens=0
      -- (string_split_regex on '' yields [''] otherwise)
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ), feat AS (
      SELECT doc_id, source,
             CAST(array_length(toks) AS BIGINT) AS n_tokens,
             CAST(array_length(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks, t -> list_contains(['the','a','and','of','to','is','in','it'], t))) AS BIGINT) AS n_stop,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len
      FROM tok
    )
    SELECT doc_id, source,
           CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE ROUND(
             0.4 * (n_distinct / CAST(n_tokens AS DOUBLE))
             + 0.2 * LEAST((n_stop / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0)
             + 0.2 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
             + 0.2 * LEAST((sum_len / CAST(n_tokens AS DOUBLE)) / 8.0, 1.0)
           , 6) END AS quality_score
    FROM feat
    """,
    tags=("textstats", "quality"),
)
def q17_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    feats = ts_ops.text_features(docs, "doc_id", "text")
    scored = ts_ops.quality_score(feats)
    src = docs.select("doc_id", "source")
    return scored.join(src, "doc_id").select("doc_id", "source", "quality_score")


# ---------------------------------------------------------------------------
# Q18 — language-ID heuristic (textstats.lang_id): stopword-profile
# argmax, confusion-matrix rollup. Integer-count comparisons only.
# ---------------------------------------------------------------------------

_LANG_CASES_SQL = """
      CASE
        WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        WHEN s_fr >= s_zh THEN 'fr'
        ELSE 'zh' END
"""

@_register(
    "q18_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> list_contains(['the','a','and','of','to','is'], t))) AS s_en,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> list_contains(['der','die','das','und','ist','nicht'], t))) AS s_de,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> list_contains(['el','la','los','que','y','por'], t))) AS s_es,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> list_contains(['le','les','et','des','une','dans'], t))) AS s_fr,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> list_contains(['的','了','是','在','我','有'], t))) AS s_zh
      FROM documents
    )
    SELECT lang, {_LANG_CASES_SQL} AS predicted_lang, COUNT(*) AS n
    FROM scored GROUP BY 1, 2
    """,
    tags=("textstats", "lang-id"),
)
def q18_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    pred = ts_ops.lang_id(docs, "doc_id", "text")
    return pred.groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Q19 — exact n-gram Jaccard similarity for candidate pairs (restricted
# pair space: same lang, doc_id bucket) — the verification stage of the
# near-dup pipeline, fully SQL-expressible so it gets a real oracle.
# ---------------------------------------------------------------------------

@_register(
    "q19_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks)-1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE doc_id < 100)
      WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
             AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    """,
    tags=("dedup", "jaccard"),
)
def q19_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    sh = docs.select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - 3),
                lambda i: F.array_join(F.slice(tok, i + 1, 3), " "),
            )
        ).alias("shingles"),
    ).filter(F.size(tok) >= 3)
    a = sh.select(F.col("doc_id").alias("id1"), F.col("lang"), F.col("shingles").alias("sh1"))
    b = sh.select(F.col("doc_id").alias("id2"), F.col("lang"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("long")
    union = (F.size("sh1") + F.size("sh2")).cast("long") - inter
    return (
        a.join(b, on="lang")
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(inter > 0)
    )


# ---------------------------------------------------------------------------
# Q20 — MinHash-LSH near-duplicate pairs (operators/dedup.py) over the
# FULL documents table, in PORTABLE hash mode: every stage (shingle
# hash, the 24 minhash mixes, the 4-row band keys, the hashed-set
# verify) runs on md5_long (functions/hashing.py), so DuckDB replays
# the pipeline hash-for-hash — upgraded in r5 from the rows-only
# xxhash64 registration (the r4 verdict's #2 ask: a wrong LSH answer
# was invisible to the driver). The xxhash64 perf path is unchanged in
# operators/dedup.py (portable=False default) and remains covered by
# tests/test_llm_ops.py; the PLAN is identical in both modes — one
# band-key shuffle with capped buckets, only the hash expression
# differs — so benching the portable form still benches the at-scale
# dataflow.
# ---------------------------------------------------------------------------

# rows=4 per band gives a sharp candidate threshold curve (16×2
# banding admits millions of raw candidates on this everything-
# shares-vocabulary corpus); 24 hashes × 6 bands keeps r=4
# selectivity at 25% less signature-aggregation and banding work
# than 32×8 (measured ~40% faster end-to-end, same recall profile)
_Q20_HASHES, _Q20_BANDS = 24, 6


def _portable_minhash_prefix_sql(where: str, num_hashes: int, bands: int) -> str:
    """The SHARED DuckDB replay of the portable MinHash pipeline's
    front half (operators/dedup.py: shingles → hashed shingle sets →
    signatures → band keys), parameterized exactly like the operator —
    one definition for the q20 / q55 / q182 oracles instead of three
    drifting copies (r5 review finding). Emits CTE bodies ``tok, sh,
    hx, sig, bnd``; the caller appends its candidate CTE and the
    shared verify tail (_minhash_verify_sql). The band key is the raw
    comma-joined signature slice (lsh_bands portable mode; a 1-row
    band degenerates to the bare value, matching q55's original)."""
    rows = num_hashes // bands
    mh_cols = ",\n             ".join(
        f"MIN(('0x' || substr(md5('{i}|' || CAST(h AS VARCHAR)), 1, 15))::BIGINT) AS mh{i}"
        for i in range(num_hashes)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, {key} AS band_key FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents{where}
    ), sh AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_distinct([array_to_string(toks[i:i+1], ' ')
                                      for i in range(1, len(toks))])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok
    ), hx AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
    ), sig AS (
      SELECT doc_id,
             {mh_cols}
      FROM hx GROUP BY doc_id
    ), bnd AS (
      {band_selects}
    )"""


def _minhash_verify_sql(threshold: float) -> str:
    """Shared verify tail: exact Jaccard on the hashed shingle sets
    for a candidate CTE named ``cand`` (id1, id2), mirroring
    dedup.py:verify_jaccard_hashed."""
    return f""", hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    )
    SELECT * FROM (
      SELECT c.id1, c.id2,
             CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
               / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
               AS jaccard
      FROM cand c
      JOIN hs h1 ON c.id1 = h1.doc_id
      JOIN hs h2 ON c.id2 = h2.doc_id
    ) WHERE jaccard >= {threshold}
    """


@_register(
    "q20_minhash_near_dups",
    oracle=f"""
    WITH {_portable_minhash_prefix_sql("", _Q20_HASHES, _Q20_BANDS)}, cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bnd a JOIN bnd b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ){_minhash_verify_sql(0.055)}""",
    tags=("dedup", "minhash", "lsh", "portable"),
    bench=True,
)
def q20_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    # the synthetic corpus has no planted duplicates, so the jaccard
    # threshold is set where shared-vocabulary 2-gram overlap still
    # yields pairs (verifies the full pipeline: shingle → signature →
    # band → bucket join → exact verify) without the quadratic pair
    # explosion a 0.02-threshold run produces at sf0.1.
    # max_bucket_size is lifted to the full corpus size so the
    # truncation can never fire: this oracle models NO cap (a capped
    # bucket would make DuckDB emit pairs Spark dropped — a spurious
    # red). The cap + recovery semantics have their own dedicated
    # oracle, q182, with a cap small enough that both branches fire.
    return dedup_ops.near_dup_pairs(
        docs, "doc_id", "text", shingle_n=2, num_hashes=_Q20_HASHES,
        bands=_Q20_BANDS, threshold=0.055, portable=True,
        max_bucket_size=2**31,
    )


# ---------------------------------------------------------------------------
# Q21 — SimHash signatures (operators/dedup.py) in PORTABLE mode:
# 60-bit sign-sum over md5_long token hashes (functions/hashing.py), so
# the full signature value is reproducible in DuckDB and hash-checked —
# upgraded from the r1 rows-only xxhash64 variant (the xxhash64 perf
# path is unchanged and covered by tests). The oracle replicates the
# exact bit arithmetic: per-token 60-bit hash, per-bit ±1 sums, sign →
# bit reassembly.
# ---------------------------------------------------------------------------

_Q21_BIT_SUMS = ",\n             ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(60)
)
_Q21_BIT_TERMS = "\n             + ".join(
    f"CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END"
    for b in range(60)
)


@_register(
    "q21_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                t -> t <> '')) AS t
      FROM documents WHERE doc_id < 200
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
    ), sums AS (
      SELECT doc_id,
             {_Q21_BIT_SUMS}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           ({_Q21_BIT_TERMS}) AS simhash
    FROM sums
    """,
    tags=("dedup", "simhash"),
)
def q21_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup_ops.simhash(docs, "doc_id", "text", portable=True)


# ---------------------------------------------------------------------------
# Q22 — brute-force cosine top-3 neighbors for the first 10 vectors
# (operators/similarity.py). Double-cast arrays; DuckDB oracle computes
# the same cosine (rounded to 6dp so last-ulp formula differences in
# norm order cannot flip the hash).
# ---------------------------------------------------------------------------

@_register(
    "q22_knn_cosine",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
               FROM embeddings),
         scored AS (
           SELECT q.query_id, c.neighbor_id,
                  ROUND(list_cosine_similarity(q.qv, c.cv), 6) AS cosine_sim
           FROM q JOIN c ON q.query_id != c.neighbor_id),
         ranked AS (
           SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rn
           FROM scored)
    SELECT query_id, neighbor_id, cosine_sim, rn FROM ranked WHERE rn <= 3
    """,
    tags=("similarity", "knn"),
    bench=True,
)
def q22_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # deliberately the HOF (dim=None) path: the unrolled fixed-dim dot
    # is ~25% faster at execution but its ~400-node expression tree
    # costs more in per-invocation analysis/optimization than it saves
    # at sf0.1 (A/B: total 1.1s HOF vs 1.9s unrolled, single shot).
    # The unrolled form wins only when one plan is reused many times.
    return sim_ops.cosine_knn(emb, queries, "vec_id", "embedding", k=3)


# ---------------------------------------------------------------------------
# Q23 — embedding stats per label: norms via double fold; per-row
# integer-ization before the sum (oracle rule 1).
# ---------------------------------------------------------------------------

@_register(
    "q23_embedding_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * 10000) AS BIGINT)) AS BIGINT) AS sum_norm_e4,
           CAST(SUM(CAST(len(embedding) AS BIGINT)) AS BIGINT) AS total_dims
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "agg"),
)
def q23_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(norm * 10000).cast("long")).alias("sum_norm_e4"),
        F.sum(F.size("embedding").cast("long")).alias("total_dims"),
    )


# ---------------------------------------------------------------------------
# Q24 — SRP-LSH approximate nearest neighbors (the 100 TB scale path for
# Q22): bucketed join instead of corpus broadcast. Seeded hyperplanes →
# deterministic AND oracle-checked: the plane matrix embeds in the SQL
# as full-precision literals and the dot-product fold is
# association-identical (see _q24_oracle_sql). Recall vs exact is
# additionally asserted in tests/test_llm_ops.py.
# ---------------------------------------------------------------------------

# embeddings.parquet vector width — a fixed property of the dataset
# (every sf dir is generated at dim 64), treated like schema width.
# Parquet's list<float> type does not carry the length, and probing it
# with .first() would cost a driver-side job + scan before the real
# query starts.
EMBEDDING_DIM = 64


def _q24_oracle_sql() -> str:
    """DuckDB replay of the SRP-LSH pipeline, hash-for-hash. The plane
    matrix (seed-fixed, 6×64) is embedded as full-precision repr
    literals — decimal shortest-round-trip parses back to the exact
    double. Each dot product is the same left-fold association Spark's
    aggregate/zip_with uses (SQL + is left-associative; IEEE add/mul
    are correctly rounded), so every sign bit — and therefore every
    bucket — is bit-identical, no tolerance needed."""
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=6, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(6)
    )
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket FROM base),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             ROUND(list_cosine_similarity(q.qv, c.cv), 6) AS cosine_sim
      FROM q JOIN c USING (bucket)
      WHERE q.query_id != c.neighbor_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine_sim FROM ranked WHERE rn <= 3
    """


@_register(
    "q24_srp_lsh_knn",
    oracle=_q24_oracle_sql(),
    tags=("similarity", "lsh"),
    # Headliner since r4: the bench must measure the ANN plan you'd
    # run at 100 TB (bucketed signature equi-join, not O(n·q)).
    # q22 stays in the set as the labeled brute-force baseline.
    bench=True,
)
def q24_srp_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    # plan-embedded width guard: if the dataset is ever regenerated at
    # a different dim, fail loudly instead of silently hashing padded
    # nulls. Wrapping the embedding column itself (not a dropped helper
    # column) keeps the assertion un-prunable; cost is one size()
    # compare on the 10 query rows.
    guarded = F.when(
        F.size("embedding") == EMBEDDING_DIM, F.col("embedding")
    ).otherwise(
        F.raise_error(F.lit(
            "embeddings vector width != EMBEDDING_DIM=64 — regenerate "
            "or update the constant"
        ))
    )
    queries = emb.filter(F.col("vec_id") < 10).withColumn("embedding", guarded)
    return sim_ops.srp_lsh_knn(
        emb, queries, "vec_id", "embedding", k=3, dim=EMBEDDING_DIM,
        num_bits=6,
    )


# ---------------------------------------------------------------------------
# Q25 — multimodal plumbing (operators/multimodal.py): binary payload
# column + byte length + content hash. The decode step is stubbed
# (no codecs in container); the binary/metadata schema and byte ops are
# real and oracle-checked.
# ---------------------------------------------------------------------------

@_register(
    "q25_multimodal_bytes",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS content_sha
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def q25_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    media = mm_ops.text_as_media(docs, "doc_id", "text")
    return media.select(
        "media_id",
        F.octet_length("content").cast("long").alias("byte_len"),
        F.sha2("content", 256).alias("content_sha"),
    )


# ===========================================================================
# Structured Streaming slice (SURVEY.md §2.9) — streaming/ module.
# Each query executes a real streaming job (availableNow → memory sink)
# and returns the materialized result, so the driver's batch-style
# compare still applies.
# ===========================================================================

from us_immigration_data_lake_spark.streaming.windows import (  # noqa: E402
    read_event_stream,
    run_to_memory,
    session_agg,
    stream_static_enrich,
    tumbling_agg,
    tumbling_agg_append,
)
from us_immigration_data_lake_spark.streaming.stateful import (  # noqa: E402
    running_user_stats,
)

import itertools as _it

# memory-sink names must be unique per run; itertools.count.__next__ is
# atomic under the GIL, so concurrent query builds (the parity suite's
# thread-pool prefetch) can't mint duplicate sink names
_STREAM_SEQ = _it.count(1)


def _sink_name(base: str) -> str:
    return f"{base}_{next(_STREAM_SEQ)}"


# ---------------------------------------------------------------------------
# Q26 — streaming tumbling-window hourly aggregation; oracle is the
# equivalent batch SQL (finite source ⇒ identical results).
# ---------------------------------------------------------------------------

@_register(
    "q26_stream_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def q26_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    return run_to_memory(tumbling_agg(stream, "1 hour"), _sink_name("q26_hourly"))


# ---------------------------------------------------------------------------
# Q27 — streaming session windows (10-min gap per user). Oracle:
# lag-based sessionization over exact epoch-micros — new session iff
# gap ≥ 10 min; session end = last event + gap (Spark session_window
# semantics).
# ---------------------------------------------------------------------------

@_register(
    "q27_stream_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
    ), flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                       >= 600000000 OR
                       LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ), sessions AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + 600000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("streaming", "session-window"),
)
def q27_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    return run_to_memory(session_agg(stream, "10 minutes"), _sink_name("q27_sessions"))


# ---------------------------------------------------------------------------
# Q28 — custom stateful operator (applyInPandasWithState): running
# per-user totals, update mode. Upgraded in r5 from rows-only to a
# full hash-checked oracle (the r4 verdict's #2 ask): the source is a
# SINGLE parquet file and availableNow with no maxFilesPerTrigger
# processes all files in one micro-batch, so the update-mode memory
# sink holds exactly ONE emission per user — the final state — which
# is precisely the batch groupBy. (A multi-file source would emit one
# row per (user, batch) and break this equivalence; the streaming
# multi-batch semantics are exercised separately by
# tests/test_streaming.py and the q127 incremental-ingest path.)
# avg_value_c is one IEEE division of exact ints → identical bits in
# both engines; total_value_c uses half-away-from-zero cents, the
# engine-wide _cents convention.
# ---------------------------------------------------------------------------

@_register(
    "q28_stream_stateful",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS total_value_c,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE) / COUNT(*)
             AS avg_value_c
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def q28_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    return run_to_memory(
        running_user_stats(stream), _sink_name("q28_stateful"), mode="update"
    )


# ===========================================================================
# Extended relational surface: as-of join, cube, scalar functions, raw SQL.
# ===========================================================================

from us_immigration_data_lake_spark.operators.joins import as_of_join  # noqa: E402


# ---------------------------------------------------------------------------
# Q29 — as-of join (operators/joins.py:as_of_join): each purchase event
# matched to the user's most recent prior-or-equal view event. Spark
# side is the merge pattern (one sort-shuffle, scale-safe); oracle uses
# DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------

@_register(
    "q29_asof_purchase_view",
    oracle="""
    WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
               FROM events WHERE event_type = 'purchase'),
         -- dedupe views to MAX(event_id) per (user, ts) BEFORE the ASOF:
         -- DuckDB's ASOF picks an arbitrary row among equal timestamps,
         -- while the engine's as_of_join tie-breaks on max view_event_id;
         -- collapsing ties first makes both picks identical.
         v AS (SELECT user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS view_ts_us,
                      MAX(event_id) AS view_event_id
               FROM events WHERE event_type = 'view'
               GROUP BY user_id, epoch_us(CAST(ts AS TIMESTAMP)))
    SELECT p.event_id, p.user_id, p.ts_us,
           v.view_event_id, v.view_ts_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
    """,
    tags=("asof-join", "events"),
)
def q29_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts_us").alias("view_ts_us"),
    )
    return as_of_join(
        purchases,
        views,
        keys=["user_id"],
        left_ts="ts_us",
        right_ts="view_ts_us",
        right_vals=["view_event_id", "view_ts_us"],
        tiebreak="view_event_id",
    )


# ---------------------------------------------------------------------------
# Q30 — cube (SURVEY.md §2.4 extension): all grouping-set combinations
# of (status, priority).
# ---------------------------------------------------------------------------

@_register(
    "q30_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube",),
)
def q30_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_cents(F.col("o_totalprice"))).alias("total_c"),
    )


# ---------------------------------------------------------------------------
# Q31 — scalar function surface (SURVEY.md §2.6): string/math/array
# functions chosen for cross-engine bit-exactness (sqrt is IEEE
# exact-rounded; no libm-divergent fns like ln/pow in compare columns).
# ---------------------------------------------------------------------------

@_register(
    "q31_scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                      AS brand_upper,
           lower(p_type)                       AS type_lower,
           substring(p_name, 1, 8)             AS name_prefix,
           length(p_name)                      AS name_len,
           reverse(p_brand)                    AS brand_rev,
           replace(p_type, ' ', '_')           AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           concat_ws('|', p_brand, p_type)     AS brand_type,
           abs(p_retailprice - 1000.0)         AS price_dev,
           CAST(ceil(p_retailprice) AS BIGINT)  AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           ROUND(sqrt(p_retailprice), 6)       AS price_sqrt,
           CAST(p_size % 7 AS BIGINT)          AS size_mod,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS name_words,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS name_sorted
    FROM part
    """,
    tags=("functions", "strings", "arrays"),
)
def q31_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    part = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
        F.size(words).cast("long").alias("name_words"),
        F.array_join(F.sort_array(words), ",").alias("name_sorted"),
    )


# ---------------------------------------------------------------------------
# Q32 — raw SQL path (SURVEY.md §2.7): every table registered as a temp
# view (sources/catalog.py), query written in Spark SQL with a
# correlated scalar subquery — exercising parser → analyzer → catalog
# resolution, the reference's etl.py:313-330 path generalized.
# ---------------------------------------------------------------------------

@_register(
    "q32_sql_above_avg_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS total_c
    FROM orders o
    WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("sql", "subquery"),
)
def q32_sql_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from us_immigration_data_lake_spark.sources.catalog import Catalog

    Catalog(spark, sf_dir, tables=("orders",)).register_views(prefix="q32_")
    return spark.sql("""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS total_c
        FROM q32_orders o
        WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM q32_orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
    """)


# ---------------------------------------------------------------------------
# Q33 — window frames + lag (SURVEY.md §2.5): running revenue per
# customer in order-date order, previous order's total, frame =
# rows unbounded-preceding..current. All sums on bigint cents.
# ---------------------------------------------------------------------------

@_register(
    "q33_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_total_c,
           LAG(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_total_c,
           CAST(ROW_NUMBER() OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS BIGINT) AS order_seq
    FROM orders
    """,
    tags=("window", "frames", "lag"),
)
def q33_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    total_c = _cents(F.col("o_totalprice"))
    order_cols = [F.to_date("o_orderdate"), F.col("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*order_cols)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        total_c.alias("total_c"),
        F.sum(total_c).over(frame).alias("running_total_c"),
        F.lag(total_c).over(w).alias("prev_total_c"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# Q34 — embedding-cosine near-duplicate pairs (similarity.py): the
# embedding-space analog of Q19/Q20, exact on a restricted id range
# (all-pairs is the verification stage; SRP buckets generate candidates
# at scale).
# ---------------------------------------------------------------------------

@_register(
    "q34_embedding_near_dups",
    oracle="""
    WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 300)
    SELECT x.vec_id AS id1, y.vec_id AS id2,
           ROUND(list_cosine_similarity(x.v, y.v), 6) AS cosine_sim
    FROM a x JOIN a y ON x.vec_id < y.vec_id
    WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= 0.35
    """,
    tags=("similarity", "dedup"),
)
def q34_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return sim_ops.cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.35)


# ---------------------------------------------------------------------------
# Q35 — regex token profiling (SURVEY.md §2.10 token counting): word /
# number / punctuation match counts via regexp_extract_all — the
# BPE-style pre-tokenization census used to budget LLM training data.
# ---------------------------------------------------------------------------

@_register(
    "q35_token_profile",
    oracle="""
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+'))) AS BIGINT) AS word_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT) AS number_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))) AS BIGINT) AS other_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+'))) AS DOUBLE) / COUNT(*) AS words_per_doc
    FROM documents
    GROUP BY source
    """,
    tags=("textstats", "tokenize"),
)
def q35_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0)).cast("long")
    nums = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0)).cast("long")
    other = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9\s]"), 0)).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(words).alias("word_tokens"),
        F.sum(nums).alias("number_tokens"),
        F.sum(other).alias("other_tokens"),
        (F.sum(words).cast("double") / F.count(F.lit(1))).alias("words_per_doc"),
    )


# ---------------------------------------------------------------------------
# Q36 — sliding windows over events (streaming/windows semantics in
# batch form): 1-hour windows sliding every 30 minutes — each event in
# exactly 2 windows; oracle materializes both buckets via UNION ALL.
# ---------------------------------------------------------------------------

@_register(
    "q36_sliding_windows",
    oracle="""
    WITH both_windows AS (
      SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS w, event_type,
             CAST(ROUND(value*100) AS BIGINT) AS v_c
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes',
             event_type, CAST(ROUND(value*100) AS BIGINT)
      FROM events
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(v_c) AS BIGINT) AS value_c
    FROM both_windows
    GROUP BY 1, 2
    """,
    tags=("window", "sliding", "events"),
)
def q36_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("value_c"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "value_c",
        )
    )


# ===========================================================================
# Reference-operator queries: the remaining SURVEY §2.2/§2.6/§2.8 rows
# (cast/recode/fillna, title-case, SAS-date round trip) and exact
# percentiles, each with its own oracle entry.
# ===========================================================================

from us_immigration_data_lake_spark.functions.cleaning import (  # noqa: E402
    cast_types,
    recode,
)
from us_immigration_data_lake_spark.functions.dates import (  # noqa: E402
    date_diff_days,
    sas_to_iso_string,
)
from us_immigration_data_lake_spark.functions.text import title_case  # noqa: E402


# ---------------------------------------------------------------------------
# Q37 — conditional recode + null fallback + typed cast (SURVEY §2.2
# P6/P7/P8/P9; the reference's country-name normalization shape,
# etl.py:92-103,389-390): region names recoded, supplier balance
# coalesced to 0 for nations without suppliers.
# ---------------------------------------------------------------------------

@_register(
    "q37_recode_fillna",
    oracle="""
    SELECT n.n_nationkey,
           CASE WHEN r.r_name = 'AMERICA' THEN 'AMERICAS'
                WHEN r.r_name = 'MIDDLE EAST' THEN 'MENA'
                ELSE r.r_name END AS region_recoded,
           COALESCE(s.bal_c, 0) AS bal_c_filled,
           CAST(n.n_regionkey AS BIGINT) AS region_key
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN (SELECT s_nationkey,
                      CAST(SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_c
               FROM supplier GROUP BY s_nationkey) s
      ON s.s_nationkey = n.n_nationkey
    """,
    tags=("recode", "fillna", "cast"),
)
def q37_recode_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.sum(_cents(F.col("s_acctbal"))).alias("bal_c"))
    )
    out = (
        dim_join(nation, region, nation.n_regionkey == region.r_regionkey, how="inner")
        .join(F.broadcast(supp), F.col("s_nationkey") == F.col("n_nationkey"), "left")
        .select(
            "n_nationkey",
            recode("r_name", {"AMERICA": "AMERICAS", "MIDDLE EAST": "MENA"})
            .alias("region_recoded"),
            F.coalesce("bal_c", F.lit(0)).alias("bal_c_filled"),
            F.col("n_regionkey").alias("region_key"),
        )
    )
    return cast_types(out, {"region_key": "long"})


# ---------------------------------------------------------------------------
# Q38 — title-case (SURVEY §2.8 U3: the reference's capitalize_udf was
# a row-wise Python str.title(); ours is a native expression). Oracle
# reconstructs Python title() semantics with DuckDB list ops (inputs
# here are single-space-separated lowercase words, where per-word
# capitalization ≡ title()).
# ---------------------------------------------------------------------------

@_register(
    "q38_title_case",
    oracle="""
    SELECT p_partkey,
           array_to_string(
             list_transform(string_split(p_name, ' '),
                            w -> upper(w[1]) || lower(w[2:])),
             ' ') AS name_title
    FROM part
    """,
    tags=("text", "udf-replacement"),
)
def q38_title_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    part = _t(spark, sf_dir, "part")
    return part.select("p_partkey", title_case("p_name").alias("name_title"))


# ---------------------------------------------------------------------------
# Q39 — SAS-date round trip (SURVEY §2.8 U1/U2/U4): day-numbers since
# 1960-01-01 decoded to ISO strings and differenced — the IMMIGRATION
# fact's arrdate/depdate/stay computation as a standalone query.
# ---------------------------------------------------------------------------

@_register(
    "q39_sas_dates",
    oracle=f"""
    WITH sas AS (
      SELECT l_orderkey, l_linenumber,
             date_diff('day', DATE '{SAS_EPOCH}', CAST(l_shipdate AS DATE)) AS ship_sas,
             date_diff('day', DATE '{SAS_EPOCH}', CAST(l_shipdate AS DATE)) + CAST(l_quantity AS BIGINT) AS ret_sas
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, ship_sas,
           strftime(DATE '{SAS_EPOCH}' + CAST(ship_sas AS INTEGER), '%Y-%m-%d') AS ship_iso,
           strftime(DATE '{SAS_EPOCH}' + CAST(ret_sas AS INTEGER), '%Y-%m-%d') AS return_iso,
           CAST(ret_sas - ship_sas AS BIGINT) AS stay_days
    FROM sas
    """,
    tags=("dates", "udf-replacement"),
)
def q39_sas_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    ship_sas = F.datediff(F.to_date("l_shipdate"), F.lit(SAS_EPOCH).cast("date")).cast("long")
    sas = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        ship_sas.alias("ship_sas"),
        (ship_sas + F.col("l_quantity").cast("long")).alias("ret_sas"),
    )
    return sas.select(
        "l_orderkey",
        "l_linenumber",
        "ship_sas",
        sas_to_iso_string("ship_sas").alias("ship_iso"),
        sas_to_iso_string("ret_sas").alias("return_iso"),
        date_diff_days(sas_to_iso_string("ret_sas"), sas_to_iso_string("ship_sas"))
        .cast("long").alias("stay_days"),
    )


# ---------------------------------------------------------------------------
# Q40 — exact percentiles per group (SURVEY §2.4 extension): median and
# p95 of order totals in cents; both engines do linear interpolation on
# the sorted exact integers.
# ---------------------------------------------------------------------------

@_register(
    "q40_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5)  AS median_c,
           quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.95) AS p95_c,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("percentile", "agg"),
)
def q40_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    total_c = _cents(F.col("o_totalprice"))
    return orders.groupBy("o_orderstatus").agg(
        F.percentile(total_c, F.lit(0.5)).alias("median_c"),
        F.percentile(total_c, F.lit(0.95)).alias("p95_c"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Q41 — winnowing rolling-hash fingerprints (textstats.py): character
# 8-gram polynomial hashes, window-4 minima, distinct — the chunk-level
# dedup fingerprint. Oracle reproduces the identical modular fold with
# DuckDB list comprehensions (verified fold-equivalent: Spark's
# 0-seeded aggregate ≡ DuckDB's first-element-seeded list_reduce).
# ---------------------------------------------------------------------------

@_register(
    "q41_winnow_fingerprints",
    oracle="""
    WITH t AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS txt
      FROM documents WHERE doc_id < 100
        AND length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) >= 11
    ), c AS (
      SELECT doc_id,
             list_transform(string_split(txt, ''), ch -> CAST(unicode(ch) AS BIGINT)) AS codes
      FROM t
    ), h AS (
      SELECT doc_id,
             [list_reduce(codes[i:i+7], (acc, x) -> (acc*257 + x) % 1000000007)
              for i in range(1, len(codes) - 6)] AS ghs
      FROM c
    ), w AS (
      SELECT doc_id,
             list_distinct([list_min(ghs[i:i+3]) for i in range(1, len(ghs) - 2)]) AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM w
    """,
    tags=("fingerprint", "rolling-hash", "dedup"),
)
def q41_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    # both sides restrict to docs long enough for a full k+window pass:
    # the library's short-doc fallback (one whole-text hash) is not
    # SQL-portable, and modeling it in the oracle would couple the gate
    # to that implementation detail
    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100)
        & (F.length(normalized_text(F.col("text"))) >= 11)
    )
    return ts_ops.winnow_fingerprints(docs, "doc_id", "text", k=8, window=4)


# ---------------------------------------------------------------------------
# Q42 — stream-stream interval join (streaming/windows.py): purchases
# joined to same-user views within a 30-minute lookback, both sides
# watermarked (bounded state). Inner joins emit on match, so the
# finite availableNow run equals the batch time-range join the oracle
# computes.
# ---------------------------------------------------------------------------

from us_immigration_data_lake_spark.streaming.windows import (  # noqa: E402
    purchase_view_interval_join,
)


@_register(
    "q42_stream_stream_join",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_ts_us
               FROM events WHERE event_type = 'purchase'),
         v AS (SELECT event_id AS view_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS view_ts_us
               FROM events WHERE event_type = 'view')
    SELECT p.purchase_id, p.user_id, p.purchase_ts_us, v.view_id, v.view_ts_us
    FROM p JOIN v ON p.user_id = v.user_id
     AND v.view_ts_us >= p.purchase_ts_us - 1800000000
     AND v.view_ts_us <= p.purchase_ts_us
    """,
    tags=("streaming", "stream-stream-join"),
)
def q42_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    joined = purchase_view_interval_join(stream, "30 minutes")
    return run_to_memory(joined, _sink_name("q42_ssj"), mode="append")


# ---------------------------------------------------------------------------
# Q43 — duplicate clustering + survivor selection (operators/dedup.py):
# near-dup pairs → connected components (iterative min-label
# propagation + pointer jumping) → keep-smallest-per-cluster.
# Pairs come from EXACT 2-gram Jaccard via the inverted-index
# candidate generator (postings_jaccard_pairs — r5 re-plan; the r2–r4
# registration demonstrated the WRONG plan, an all-pairs crossJoin),
# so the whole thing is portable and the iterative fixpoint is
# hash-checked against a DuckDB WITH RECURSIVE transitive closure.
# Spark's O(log d)-round algorithm and the oracle's edge-at-a-time
# recursion must agree on every cluster label. The probabilistic LSH
# candidate generator stays the 100 TB path in q20/q55.
# ---------------------------------------------------------------------------

@_register(
    "q43_dup_clusters",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE doc_id < 200
    ), sh AS MATERIALIZED (
      -- mirror operators/dedup.py:shingles — distinct 2-grams; a doc
      -- shorter than 2 tokens contributes its whole normalized text
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_distinct([array_to_string(toks[i:i+1], ' ')
                                      for i in range(1, len(toks))])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok
    ), pairs AS MATERIALIZED (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.08
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           COALESCE(l.cluster, d.doc_id) AS cluster,
           d.doc_id = COALESCE(l.cluster, d.doc_id) AS keep
    FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
    LEFT JOIN labels l ON d.doc_id = l.id
    """,
    tags=("dedup", "clustering", "iterative"),
)
def q43_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = dedup_ops.shingles(docs, "doc_id", "text", n=2)
    # Candidates via the inverted-index generator (dedup.py:
    # postings_jaccard_pairs) instead of the r2–r4 all-pairs crossJoin
    # (the r4 verdict's #3 anti-pattern): pairs materialize only
    # through a shared shingle — key shuffles, no CartesianProduct —
    # and with no doc-frequency cap the Jaccard is EXACT, so the
    # output (and the WITH RECURSIVE oracle) is unchanged: a pair
    # with zero shared shingles can never reach the 0.08 threshold.
    pairs = dedup_ops.postings_jaccard_pairs(sh, "doc_id", min_jaccard=0.08)
    return dedup_ops.dedup_survivors(docs, pairs.select("id1", "id2"), "doc_id")


# ---------------------------------------------------------------------------
# (q43 r5 note: the candidate re-plan above is the dedup.py:567
# inverted-index path; its plan is asserted CartesianProduct-free by
# the registry-wide lint gate in tests/test_plan_lint.py.)
# ---------------------------------------------------------------------------
# Q44 — struct/map construction and field access (SURVEY §2.6 extension;
# the engine's nested-type surface): events props parsed via from_json
# into a typed struct, re-nested into an output struct and a map,
# fields projected back out.
# ---------------------------------------------------------------------------

@_register(
    "q44_nested_types",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           event_type AS meta_type,
           CAST(ROUND(value*100) AS BIGINT) AS meta_value_c,
           concat(event_type, ':', CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)) AS tagged
    FROM events
    """,
    tags=("struct", "map", "json"),
)
def q44_nested_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    _tune(spark)
    ev = load_events(spark, sf_dir)
    props_schema = StructType([StructField("k", LongType(), True)])
    nested = ev.select(
        "event_id",
        F.from_json("props", props_schema).alias("p"),
        F.struct(
            F.col("event_type").alias("type"),
            _cents(F.col("value")).alias("value_c"),
        ).alias("meta"),
        F.create_map(
            F.lit("type"), F.col("event_type"),
        ).alias("m"),
    )
    return nested.select(
        "event_id",
        F.col("p.k").alias("k_value"),
        F.col("meta.type").alias("meta_type"),
        F.col("meta.value_c").alias("meta_value_c"),
        F.concat(
            F.element_at("m", "type"), F.lit(":"), F.col("p.k").cast("string")
        ).alias("tagged"),
    )


# ---------------------------------------------------------------------------
# Q45 — keyword search with term-frequency ranking: tf as exact integer
# (array filter count), deterministic top-20. The retrieval primitive
# for corpus exploration; exact ints so the ranking is oracle-stable.
# ---------------------------------------------------------------------------

@_register(
    "q45_keyword_search",
    oracle="""
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                t -> t = 'spark')) AS BIGINT) AS tf,
           n_chars
    FROM documents
    WHERE len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t = 'spark')) > 0
    ORDER BY tf DESC, doc_id
    LIMIT 20
    """,
    tags=("search", "textstats", "topk"),
)
def q45_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    tok = F.split(F.trim(F.col("text")), r"\s+")
    tf = F.size(F.filter(tok, lambda t: t == F.lit("spark"))).cast("long")
    return (
        docs.select("doc_id", "lang", tf.alias("tf"), "n_chars")
        .filter(F.col("tf") > 0)
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q46 — customer order-count distribution (TPC-H Q13 shape): LEFT join
# so zero-order customers count, aggregate twice (per-customer then
# histogram) — the double-aggregation pattern.
# ---------------------------------------------------------------------------

@_register(
    "q46_order_count_histogram",
    oracle="""
    SELECT order_cnt, COUNT(*) AS customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY order_cnt
    """,
    tags=("left-join", "double-agg", "histogram"),
)
def q46_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return per_cust.groupBy("order_cnt").agg(F.count(F.lit(1)).alias("customers"))


# ---------------------------------------------------------------------------
# Q47 — large-volume orders (TPC-H Q18 shape): HAVING over a grouped
# subquery feeding an IN-style semi join back to the fact.
# ---------------------------------------------------------------------------

@_register(
    "q47_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(t.total_qty AS BIGINT) AS total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS BIGINT)) > 150) t
      ON t.l_orderkey = o.o_orderkey
    """,
    tags=("having", "subquery", "semi-join"),
)
def q47_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("order_date"),
        "total_qty",
    )


# ---------------------------------------------------------------------------
# Q48 — deterministic hash-based train/test split: assignment is a pure
# function of the id (content-stable, leakage-free, reproducible across
# runs and engines) — the split primitive for training-corpus builds.
# Bucket = first 4 hex digits of md5(id) parsed as an integer, mod 100
# (uniform over 65536 values; char-code arithmetic would be hex-digit
# biased and land far from the target ratio).
# ---------------------------------------------------------------------------

@_register(
    "q48_train_test_split",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train' ELSE 'test' END AS split,
           lang,
           COUNT(*) AS docs
    FROM b GROUP BY 1, 2
    """,
    tags=("sampling", "split"),
)
def q48_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.functions.splits import split_label

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(split_label(F.col("doc_id"), 80).alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("docs"))
    )


# ---------------------------------------------------------------------------
# Q49 — document chunking (textstats.chunk_documents): overlapping
# 50-token windows with 10-token overlap — context-window prep for
# training/RAG corpora. Oracle reproduces the stride arithmetic with
# DuckDB list comprehensions.
# ---------------------------------------------------------------------------

@_register(
    "q49_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, len(toks) AS n,
             GREATEST(CAST(ceil((len(toks) - 10) / 40.0) AS BIGINT), 1) AS n_chunks,
             toks
      FROM t
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * 40 AS BIGINT) AS chunk_start_token,
           array_to_string(toks[i*40 + 1 : i*40 + 50], ' ') AS chunk_text,
           CAST(LEAST(n - i*40, 50) AS BIGINT) AS n_tokens
    FROM c, UNNEST(range(0, n_chunks)) AS u(i)
    """,
    tags=("chunking", "textstats"),
)
def q49_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.chunk_documents(docs, "doc_id", "text", chunk_tokens=50, overlap=10)


# ---------------------------------------------------------------------------
# Q50 — sessionized conversion funnel: lag-based sessionization (the
# batch twin of q27's session windows), then per-session view→purchase
# conversion — a session has converted when a view precedes a purchase
# inside it. All exact-integer micros.
# ---------------------------------------------------------------------------

@_register(
    "q50_session_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
    ), flagged AS (
      SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w >= 600000000
                       OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ), sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), per_session AS (
      SELECT user_id, sid,
             MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view_us,
             MAX(CASE WHEN event_type = 'purchase' THEN ts_us END) AS last_purchase_us
      FROM sess GROUP BY user_id, sid
    )
    SELECT COUNT(*) AS total_sessions,
           CAST(SUM(CASE WHEN first_view_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS sessions_with_view,
           CAST(SUM(CASE WHEN last_purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS sessions_with_purchase,
           CAST(SUM(CASE WHEN first_view_us IS NOT NULL AND last_purchase_us > first_view_us
                    THEN 1 ELSE 0 END) AS BIGINT) AS converted_sessions
    FROM per_session
    """,
    tags=("funnel", "sessionization", "window"),
)
def q50_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _tune(spark)
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) >= 600_000_000)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias("first_view_us"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias("last_purchase_us"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("total_sessions"),
        F.sum(F.col("first_view_us").isNotNull().cast("long")).alias("sessions_with_view"),
        F.sum(F.col("last_purchase_us").isNotNull().cast("long")).alias("sessions_with_purchase"),
        F.sum(
            (F.col("first_view_us").isNotNull()
             & (F.col("last_purchase_us") > F.col("first_view_us"))).cast("long")
        ).alias("converted_sessions"),
    )


# ---------------------------------------------------------------------------
# Q51 — data-quality profile (quality.py:profile_table): the quality
# framework's single-pass metrics surfaced as a gate-checked query —
# row count, null counts, key distinctness, value ranges over the fact.
# ---------------------------------------------------------------------------

from us_immigration_data_lake_spark.quality import profile_table  # noqa: E402


@_register(
    "q51_quality_profile",
    oracle="""
    SELECT COUNT(*) AS row_count,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_l_orderkey,
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_l_shipdate,
           COUNT(DISTINCT l_orderkey) AS distinct_l_orderkey,
           COUNT(DISTINCT l_returnflag) AS distinct_l_returnflag,
           CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
           CAST(MAX(l_quantity) AS BIGINT) AS max_qty
    FROM lineitem
    """,
    tags=("quality", "profile"),
)
def q51_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "l_qty_long", F.col("l_quantity").cast("long")
    )
    prof = profile_table(
        li,
        null_cols=["l_orderkey", "l_shipdate"],
        distinct_cols=["l_orderkey", "l_returnflag"],
        minmax_cols=["l_qty_long"],
    )
    return prof.select(
        "row_count",
        "nulls_l_orderkey",
        "nulls_l_shipdate",
        "distinct_l_orderkey",
        "distinct_l_returnflag",
        F.col("min_l_qty_long").alias("min_qty"),
        F.col("max_l_qty_long").alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# Q52 — calendar arithmetic (SURVEY §2.6 date family beyond parts):
# add_months (end-of-month clamping), last_day, month truncation,
# quarter — per-row deterministic dates, no aggregation.
# ---------------------------------------------------------------------------

@_register(
    "q52_calendar_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
           quarter(CAST(o_orderdate AS DATE)) AS q,
           CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS plus_30d
    FROM orders
    """,
    tags=("dates", "calendar"),
)
def q52_calendar_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        d.alias("order_date"),
        F.add_months(d, 3).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.quarter(d).cast("long").alias("q"),
        F.date_add(d, 30).alias("plus_30d"),
    )


# ---------------------------------------------------------------------------
# Q53 — collection aggregation (SURVEY §2.4/§2.6): per-nation sorted
# distinct market segments, exported as a joined string so the compare
# never depends on engine-internal array ordering.
# ---------------------------------------------------------------------------

@_register(
    "q53_collect_segments",
    oracle="""
    SELECT n.n_name,
           array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), ',') AS segments,
           COUNT(DISTINCT c.c_mktsegment) AS n_segments
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("collect", "agg"),
)
def q53_collect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.count_distinct("c_mktsegment").alias("n_segments"),
        )
    )


# ---------------------------------------------------------------------------
# Q54 — generic GROUPING SETS (SURVEY §2.4 extension; completes the
# rollup (q10) / cube (q30) family with an arbitrary set list neither
# can express: the two one-column marginals plus the grand total,
# WITHOUT the (status, priority) cross cells). Same partial+final
# hash-agg shape as cube — the Expand node emits one copy of each row
# per grouping set, so cost scales with |sets|, not the 2^k cube
# lattice.
# ---------------------------------------------------------------------------

@_register(
    "q54_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("grouping-sets",),
)
def q54_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_cents(F.col("o_totalprice"))).alias("total_c"),
    )


# ---------------------------------------------------------------------------
# Q55 — MinHash-LSH near-dup pipeline in PORTABLE mode (operators/
# dedup.py near_dup_pairs(portable=True)): every stage — shingle hash,
# per-function minhash mixing, band keys, bucket join, hashed-set
# Jaccard verify — runs on md5_long (functions/hashing.py) and is
# replayed hash-for-hash by the DuckDB oracle (the shared
# _portable_minhash_prefix_sql/_minhash_verify_sql builders — q20 is
# the full-table run, q55 the restricted doc_id < 100 slice with a
# different banding shape). Small-n caveat: the oracle models no
# bucket cap (buckets here can't exceed 100 members, far under
# max_bucket_size); the cap semantics are q182's oracle.
# ---------------------------------------------------------------------------

# rows = 1 per band: on this no-planted-duplicates corpus a 2-row band
# admits almost nothing through verification (1 pair at sf0.01), which
# would make the hash check vacuous — single-hash bands flood the
# verify stage instead, exercising candidate dedup + verification on a
# meaningful pair volume
_Q55_HASHES, _Q55_BANDS = 8, 8


@_register(
    "q55_minhash_portable",
    oracle=f"""
    WITH {_portable_minhash_prefix_sql(" WHERE doc_id < 100", _Q55_HASHES, _Q55_BANDS)}, cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bnd a JOIN bnd b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ){_minhash_verify_sql(0.055)}""",
    tags=("dedup", "minhash", "lsh", "portable"),
)
def q55_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup_ops.near_dup_pairs(
        docs, "doc_id", "text", shingle_n=2, num_hashes=_Q55_HASHES,
        bands=_Q55_BANDS, threshold=0.055, portable=True,
    )


# ---------------------------------------------------------------------------
# Q56 — watermarked APPEND-mode streaming aggregation (streaming/
# windows.py:tumbling_agg_append): the output mode you actually run at
# scale — each window emitted once when the watermark passes it, state
# dropped. q26 checks the same aggregation in complete mode (all
# windows, driver-held state); this checks the append semantics: ONLY
# windows whose end precedes the final watermark
# (max event time - 1 hour) appear. The oracle computes that exact
# batch-equivalent subset.
# ---------------------------------------------------------------------------

@_register(
    "q56_stream_append_watermark",
    oracle="""
    WITH mx AS (
      -- Spark tracks event-time stats in MILLISECONDS, so its
      -- watermark is floor-to-ms(max ts) - delay; truncate the same
      -- way or a max ts whose sub-ms fraction straddles an hour
      -- boundary flips the emitted-window set
      SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP))) AS mx
      FROM events
    ),
    agg AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
             event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n, value_c
    FROM agg, mx
    WHERE ws + INTERVAL 1 HOUR <= mx - INTERVAL 1 HOUR
    """,
    tags=("streaming", "watermark", "append"),
)
def q56_stream_append_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    return run_to_memory(
        tumbling_agg_append(stream, "1 hour", "1 hour"),
        _sink_name("q56_append"),
        mode="append",
    )


# ---------------------------------------------------------------------------
# Q57 — BM25 relevance ranking, top-10 docs per query term
# (operators/textstats.py:bm25_term_scores). Rational-idf BM25 variant:
# standard BM25's ln() is libm-evaluated and NOT bit-reproducible
# across engines, so the score keeps the monotone pre-log idf argument
# (N-df+0.5)/(df+0.5) and emits the exact bigint fraction
# score_num/score_den (per-term ranking identical to log BM25 — idf is
# a per-term constant). k1=6/5, b=3/4 cleared of denominators give the
# integer coefficients 44/20/6/18 below. Ranking divides the bigints
# once in double: a single IEEE division is correctly rounded, hence
# bit-identical in Spark and DuckDB.
# ---------------------------------------------------------------------------

@_register(
    "q57_bm25_topk",
    oracle="""
    WITH base AS (
      -- explicit Java whitespace class: RE2's backslash-s lacks vertical tab 0x0B
      SELECT doc_id,
             string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tok,
             CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl
      FROM base
    ),
    terms(term) AS (VALUES ('vector'), ('merge'), ('filter')),
    hits AS (
      SELECT b.doc_id, b.dl, t.term,
             CAST(len(list_filter(b.tok, x -> x = t.term)) AS BIGINT) AS tf
      FROM base b CROSS JOIN terms t
      WHERE len(list_filter(b.tok, x -> x = t.term)) > 0
    ),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM hits GROUP BY term),
    scored AS (
      SELECT h.term, h.doc_id, h.tf, h.dl,
             h.tf * 44 * s.sum_dl * (2*s.n_docs - 2*d.df + 1) AS score_num,
             (h.tf * 20 * s.sum_dl + 6 * s.sum_dl + 18 * h.dl * s.n_docs)
               * (2*d.df + 1) AS score_den
      FROM hits h JOIN dfreq d USING (term) CROSS JOIN stats s
    )
    SELECT term, doc_id, tf, dl, score_num, score_den, rnk
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY term
               ORDER BY CAST(score_num AS DOUBLE) / CAST(score_den AS DOUBLE)
                        DESC, doc_id
             ) AS rnk
      FROM scored)
    WHERE rnk <= 10
    ORDER BY term, rnk
    """,
    tags=("search", "bm25", "textstats", "topk"),
)
def q57_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.bm25_term_scores(
        docs, "doc_id", "text", terms=("vector", "merge", "filter"), k=10
    )


# ---------------------------------------------------------------------------
# Q58 — multi-term BM25 ranking (operators/textstats.py:
# bm25_multiterm_topk). The document score sums the per-term exact
# fractions in double over a FIXED-ORDER pivot (one column per query
# term, added left-to-right), so every step is a correctly rounded IEEE
# op on identical inputs — portable where a groupBy SUM of doubles
# (nondeterministic accumulation order) is not.
# ---------------------------------------------------------------------------

@_register(
    "q58_bm25_multiterm",
    oracle="""
    WITH base AS (
      -- explicit Java whitespace class: RE2's backslash-s lacks vertical tab 0x0B
      SELECT doc_id,
             string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tok,
             CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl
      FROM base
    ),
    terms(term) AS (VALUES ('vector'), ('merge'), ('filter')),
    hits AS (
      SELECT b.doc_id, b.dl, t.term,
             CAST(len(list_filter(b.tok, x -> x = t.term)) AS BIGINT) AS tf
      FROM base b CROSS JOIN terms t
      WHERE len(list_filter(b.tok, x -> x = t.term)) > 0
    ),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM hits GROUP BY term),
    contrib AS (
      SELECT h.term, h.doc_id,
             CAST(h.tf * 44 * s.sum_dl * (2*s.n_docs - 2*d.df + 1) AS DOUBLE)
             / ((h.tf * 20 * s.sum_dl + 6 * s.sum_dl + 18 * h.dl * s.n_docs)
                * (2*d.df + 1)) AS c
      FROM hits h JOIN dfreq d USING (term) CROSS JOIN stats s
    ),
    -- fixed-order sum: one MAX(CASE) column per term, added
    -- left-to-right in the query-term order — NOT SUM(c), whose
    -- accumulation order is engine-dependent
    per_doc AS (
      SELECT doc_id,
             ROUND(
               coalesce(MAX(CASE WHEN term = 'vector' THEN c END), 0)
               + coalesce(MAX(CASE WHEN term = 'merge' THEN c END), 0)
               + coalesce(MAX(CASE WHEN term = 'filter' THEN c END), 0),
             6) AS score
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score, rnk
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
      FROM per_doc)
    WHERE rnk <= 20
    ORDER BY rnk
    """,
    tags=("search", "bm25", "multiterm", "topk"),
)
def q58_bm25_multiterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.bm25_multiterm_topk(
        docs, "doc_id", "text", terms=("vector", "merge", "filter"), k=20
    )


# ---------------------------------------------------------------------------
# Q59 — stream-static broadcast enrichment (streaming/windows.py:
# stream_static_enrich): the event stream joins the static customer dim
# per micro-batch (broadcast, stateless — no watermark, no join state)
# and aggregates by market segment x event type. The canonical
# recode-a-stream-against-a-lookup-table pattern; complete-mode finite
# run is batch-equivalent, so a plain SQL join+group oracle applies.
# ---------------------------------------------------------------------------

@_register(
    "q59_stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "stream-static", "broadcast"),
)
def q59_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return run_to_memory(
        stream_static_enrich(
            stream, dim, "user_id", "c_custkey",
            ("c_mktsegment", "event_type"),
        ),
        _sink_name("q59_enrich"),
    )


# ---------------------------------------------------------------------------
# Q60 — Gopher-style repetition quality signals (operators/textstats.py:
# repetition_stats): duplicate-token fraction and top-bigram coverage
# per document — the repeated-content filters of Rae et al. 2021 §A1.1.
# Plan: one explode + two-level partial agg keyed by doc_id (no skew,
# no UDFs); deterministic argmax via min_by on (-count, bigram).
# ---------------------------------------------------------------------------

@_register(
    "q60_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, len(text) AS nc,
             list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    base AS (
      SELECT doc_id, nc,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
             t
      FROM tok
    ),
    big AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
      FROM base, UNNEST(range(1, len(t))) AS r(i)
    ),
    cnts AS (
      SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM big GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, bigram, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, bigram ASC) AS rn
      FROM cnts
    )
    SELECT b.doc_id,
           b.n_tokens,
           b.n_distinct_tokens,
           CASE WHEN b.n_tokens > 0
                THEN CAST(b.n_tokens - b.n_distinct_tokens AS DOUBLE) / b.n_tokens
                ELSE 0.0 END AS dup_token_frac,
           COALESCE(t.cnt, 0) AS top_bigram_count,
           t.bigram AS top_bigram,
           CASE WHEN t.bigram IS NOT NULL AND b.nc > 0
                THEN CAST(t.cnt * len(t.bigram) AS DOUBLE) / b.nc
                ELSE 0.0 END AS top_bigram_ratio
    FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id AND t.rn = 1
    """,
    tags=("llm", "quality", "repetition"),
)
def q60_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.repetition_stats(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Q61 — PII scrub (operators/pii.py): detect + redact emails, IPv4s,
# phone numbers. The corpus has no natural PII, so the contact strings
# are constructed DETERMINISTICALLY from customer x nation on both
# sides (same concat in Spark and the oracle) — what the gate then
# verifies is that the regex count/replace semantics agree exactly
# across engines. Pure map stage: broadcast dim join + codegen'd
# regexes, zero shuffle at any scale.
# ---------------------------------------------------------------------------

# single source of truth: the oracle regexes ARE the operator's
# patterns (operators/pii.py) — a pattern edit cannot desync the gate.
_PII = dict(pii_ops.PII_PATTERNS)
_PII_EMAIL = _PII["email"]
_PII_IPV4 = _PII["ipv4"]
_PII_PHONE = _PII["phone"]


@_register(
    "q61_pii_scrub",
    oracle=f"""
    WITH contact AS (
      SELECT c.c_custkey,
             c.c_name || ' <' || lower(replace(c.c_name, '#', '.')) || '@'
               || lower(replace(n.n_name, '_', '')) || '.example>'
               || CASE WHEN c.c_custkey % 3 > 0
                       THEN ' ip=' || CAST(10 + c.c_custkey % 200 AS VARCHAR)
                            || '.' || CAST((c.c_custkey * 3) % 256 AS VARCHAR)
                            || '.' || CAST((c.c_custkey * 7) % 256 AS VARCHAR)
                            || '.' || CAST((c.c_custkey * 11) % 256 AS VARCHAR)
                       ELSE '' END
               || CASE WHEN c.c_custkey % 4 > 0
                       THEN ' tel=+1-555-'
                            || lpad(CAST(c.c_custkey % 10000 AS VARCHAR), 4, '0')
                            || '-'
                            || lpad(CAST((c.c_custkey * 13) % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS text
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    -- counts run on the PROGRESSIVELY redacted text — the same chain
    -- pii_counts applies — so n_<kind> == number of [<KIND>] markers
    step1 AS (
      SELECT c_custkey,
             CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
             regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1
      FROM contact
    ),
    step2 AS (
      SELECT c_custkey, n_email,
             CAST(len(regexp_extract_all(t1, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
             regexp_replace(t1, '{_PII_IPV4}', '[IPV4]', 'g') AS t2
      FROM step1
    )
    SELECT c_custkey, n_email, n_ipv4,
           CAST(len(regexp_extract_all(t2, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           regexp_replace(t2, '{_PII_PHONE}', '[PHONE]', 'g') AS text_redacted
    FROM step2
    """,
    tags=("llm", "pii", "regex"),
)
def q61_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.pii import pii_counts, scrub_pii

    _tune(spark)
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    k = F.col("c_custkey")
    contact = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            k.alias("c_custkey"),
            F.concat(
                F.col("c_name"), F.lit(" <"),
                F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
                F.lit("@"),
                F.lower(F.replace(F.col("n_name"), F.lit("_"), F.lit(""))),
                F.lit(".example>"),
                F.when(
                    k % 3 > 0,
                    F.concat(
                        F.lit(" ip="), (F.lit(10) + k % 200).cast("string"),
                        F.lit("."), ((k * 3) % 256).cast("string"),
                        F.lit("."), ((k * 7) % 256).cast("string"),
                        F.lit("."), ((k * 11) % 256).cast("string"),
                    ),
                ).otherwise(F.lit("")),
                F.when(
                    k % 4 > 0,
                    F.concat(
                        F.lit(" tel=+1-555-"),
                        F.lpad((k % 10000).cast("string"), 4, "0"),
                        F.lit("-"),
                        F.lpad(((k * 13) % 10000).cast("string"), 4, "0"),
                    ),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
    )
    return scrub_pii(pii_counts(contact, "text"), "text").select(
        "c_custkey", "n_email", "n_ipv4", "n_phone", "text_redacted"
    )


# ---------------------------------------------------------------------------
# Q62 — corpus n-gram census (operators/textstats.py: ngram_profile):
# global top-25 word bigrams. explode -> partial-agg count -> top-k via
# orderBy+limit (TakeOrderedAndProject — never a full sort); the
# (count desc, bigram asc) tiebreak makes the top-k set deterministic.
# ---------------------------------------------------------------------------

@_register(
    "q62_ngram_profile",
    oracle="""
    WITH tok AS (
      SELECT list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT t[i] || ' ' || t[i + 1] AS bigram
      FROM tok, UNNEST(range(1, len(t))) AS r(i)
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS occurrences
    FROM big
    GROUP BY bigram
    ORDER BY occurrences DESC, bigram ASC
    LIMIT 25
    """,
    tags=("llm", "ngram", "top-k"),
)
def q62_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.ngram_profile(docs, "text", top_k=25)


# ---------------------------------------------------------------------------
# Q63 — deterministic stratified downsampling (operators/sampling.py:
# stratified_sample): rebalance the corpus by language (keep 25% of
# 'en', 50% of 'fr', all the rest), selected by md5 bucket of doc_id —
# reproducible across engines/retries, unlike df.sample(). Map-side
# filter only; uses md5 hex digits 5-8 so it composes independently
# with the digits-1-4 train/test split (q48).
# ---------------------------------------------------------------------------

@_register(
    "q63_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))::INTEGER) % 100
          < CASE lang WHEN 'en' THEN 25 WHEN 'fr' THEN 50 ELSE 100 END
    """,
    tags=("llm", "sampling"),
)
def q63_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import stratified_sample

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", "doc_id", {"en": 25, "fr": 50}
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Q64 — benchmark decontamination (operators/dedup.py:
# contaminated_docs): corpus docs sharing >=1 word 5-gram with the
# benchmark subset (doc_id % 50 == 0 — deterministic, SF-stable).
# Benchmark shingles broadcast; corpus text never shuffles.
# ---------------------------------------------------------------------------

@_register(
    "q64_decontaminate",
    oracle="""
    WITH tokc AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                         x -> x <> '') AS t,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 5
                  THEN list_distinct(list_transform(range(1, len(t) - 3),
                                                    i -> array_to_string(t[i:i+4], ' ')))
                  ELSE [norm] END AS s
      FROM tokc
    ),
    bench AS (
      SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 50 = 0
    ),
    corp AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 50 <> 0
    )
    SELECT c.doc_id,
           CAST(COUNT(DISTINCT c.shingle) AS BIGINT) AS n_shared_shingles
    FROM corp c JOIN bench b ON c.shingle = b.shingle
    GROUP BY 1
    """,
    tags=("llm", "decontamination", "broadcast"),
)
def q64_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return dedup_ops.contaminated_docs(corpus, bench, "doc_id", "text", n=5)


# ---------------------------------------------------------------------------
# Q65 — Z-order clustering key (operators/zorder.py): Morton
# interleave of (o_custkey % 1024, o_orderkey % 1024). Both engines
# render the SAME generated term list (zorder_sql), so the oracle
# cannot drift from the operator. Pure map-side int64 math.
# ---------------------------------------------------------------------------

from us_immigration_data_lake_spark.operators.zorder import zorder_key, zorder_sql  # noqa: E402

_Z_ORACLE = f"""
    WITH base AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS zx,
             o_orderkey % 1024 AS zy
      FROM orders
    )
    SELECT o_orderkey, CAST({zorder_sql(('zx', 'zy'), 10, 'duckdb')} AS BIGINT) AS zkey
    FROM base
"""


@_register(
    "q65_zorder_key",
    oracle=_Z_ORACLE,
    tags=("layout", "zorder", "data-skipping"),
)
def q65_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("zx"),
        (F.col("o_orderkey") % 1024).alias("zy"),
    ).select("o_orderkey", zorder_key(("zx", "zy"), 10).alias("zkey"))


# ---------------------------------------------------------------------------
# Q66 — two-phase salted aggregation (operators/aggregate.py:
# salted_sum): revenue by returnflag, salted on l_orderkey % 32 —
# identical results to the direct groupBy (which IS the oracle),
# demonstrating the skew-proof shape: hot groups split across 32
# buckets in shuffle 1; shuffle 2 moves keys x salts pre-agg rows.
# ---------------------------------------------------------------------------

@_register(
    "q66_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY 1
    """,
    tags=("agg", "skew", "salting"),
)
def q66_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.aggregate import salted_sum

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    return salted_sum(
        li,
        keys=["l_returnflag"],
        sums={"revenue_c": _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))},
        salt=(F.col("l_orderkey") % 32),
        with_count="n_items",
    )


# ---------------------------------------------------------------------------
# Q67 — OOV-rate profiling (operators/textstats.py: oov_rate): per-doc
# out-of-vocabulary fraction vs the corpus' deterministic top-100
# token vocabulary. Census pass + broadcast vocab join; exact-integer
# numerators, one double division.
# ---------------------------------------------------------------------------

@_register(
    "q67_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token
      FROM (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1
            ORDER BY c DESC, token ASC LIMIT 100)
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_frac
    FROM toks t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY 1
    """,
    tags=("llm", "vocab", "broadcast"),
)
def q67_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.oov_rate(docs, "doc_id", "text", vocab_size=100)


# ---------------------------------------------------------------------------
# Q68 — SCD Type-2 history (operators/history.py: scd2_history): the
# events log collapsed into per-user event_type validity intervals.
# One shuffle on user_id serves both window passes; intervals in exact
# epoch-micros (rule 5), tiebreak on unique event_id (rule 6).
# ---------------------------------------------------------------------------

from us_immigration_data_lake_spark.operators.history import (  # noqa: E402
    merge_upsert,
    scd2_history,
)


@_register(
    "q68_scd2_history",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
                  WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type THEN 1
                  ELSE 0 END AS chg
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    starts AS (SELECT * FROM flagged WHERE chg = 1)
    SELECT user_id, event_type AS state, ts_us AS valid_from_us,
           LEAD(ts_us) OVER w2 AS valid_to_us,
           (LEAD(ts_us) OVER w2 IS NULL) AS is_current
    FROM starts
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
    tags=("history", "scd2", "window"),
)
def q68_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    hist = scd2_history(
        ev, keys=["user_id"], ts_col="ts_us",
        state_cols=["event_type"], tiebreak="event_id",
    )
    return hist.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# Q69 — keyed MERGE upsert (operators/history.py: merge_upsert): a
# derived change batch (every 10th order: status 'R', +$10) folded
# into orders, updates-win. The oracle states the CONTRACT (updates ∪
# untouched base), not the implementation — the engine's single
# hash-agg must reproduce it exactly.
# ---------------------------------------------------------------------------

@_register(
    "q69_merge_upsert",
    oracle="""
    WITH b AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders
    ),
    u AS (
      SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
             total_c + 1000 AS total_c
      FROM b WHERE o_orderkey % 10 = 0
    )
    SELECT * FROM u
    UNION ALL
    SELECT * FROM b WHERE o_orderkey % 10 <> 0
    """,
    tags=("history", "upsert", "merge"),
)
def q69_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        _cents(F.col("o_totalprice")).alias("total_c"),
    )
    updates = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("total_c") + 1000).alias("total_c"),
    )
    return merge_upsert(base, updates, keys=["o_orderkey"])


# ---------------------------------------------------------------------------
# Q70 — int8 embedding quantization (operators/quantize.py): symmetric
# per-vector scale, round-half-up, exact integer squared norm. Pure
# map-side array expressions — zero shuffles.
#
# Gate contract: the driver canonicalizes results with pandas
# sort_values, which cannot hash ARRAY columns (r3's one red row:
# "unhashable type: 'list'"). So the gate query exports the array as
# an md5 digest of its comma-joined elements — computed identically
# on both sides — alongside the hashable scalars; the raw-array
# operator output stays pytest-verified in tests/test_quantize.py.
# ---------------------------------------------------------------------------

from us_immigration_data_lake_spark.operators.quantize import (  # noqa: E402
    quantize_int8,
    quantized_topk,
)


@_register(
    "q70_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    m AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS maxabs
      FROM v
    ),
    s AS (
      SELECT vec_id, e,
             CAST(CASE WHEN maxabs > 0 THEN CAST(127 AS DOUBLE) / maxabs
                       ELSE 0 END AS DOUBLE) AS scale
      FROM m
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(e, x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS qvec
      FROM s
    )
    SELECT vec_id, scale,
           md5(array_to_string(qvec, ',')) AS qvec_md5,
           CAST(len(qvec) AS BIGINT) AS dim,
           CAST(list_sum(list_transform(qvec, x -> CAST(x AS BIGINT) * x))
                AS BIGINT) AS sq_norm
    FROM q
    """,
    tags=("similarity", "quantize"),
)
def q70_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    quantized = quantize_int8(emb, "vec_id", "embedding")
    return quantized.select(
        "vec_id",
        "scale",
        F.md5(
            F.concat_ws(
                ",", F.transform(F.col("qvec"), lambda x: x.cast("string"))
            )
        ).alias("qvec_md5"),
        F.size("qvec").cast("long").alias("dim"),
        "sq_norm",
    )


# ---------------------------------------------------------------------------
# Q71 — top-k by exact integer dot product over the quantized vectors
# (operators/quantize.py: quantized_topk): broadcast query set, BIGINT
# scores → bit-deterministic ranking, ties on neighbor_id.
# ---------------------------------------------------------------------------

@_register(
    "q71_quantized_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    m AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS maxabs
      FROM v
    ),
    q AS (
      SELECT vec_id,
             list_transform(
               e, x -> CAST(floor(x * (CASE WHEN maxabs > 0
                                            THEN CAST(127 AS DOUBLE) / maxabs
                                            ELSE 0 END) + 0.5) AS INTEGER)
             ) AS qvec
      FROM m
    ),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_dot_product(a.qvec::DOUBLE[], b.qvec::DOUBLE[])
                  AS BIGINT) AS score
      FROM q a JOIN q b
        ON a.vec_id % 50 = 0 AND b.vec_id % 50 <> 0
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id) AS BIGINT) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, score, rn FROM ranked WHERE rn <= 3
    """,
    tags=("similarity", "quantize", "knn", "broadcast"),
)
def q71_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # int8 products are <= 127^2 and dims are small, so the double
    # list_dot_product in the oracle is exact integer arithmetic —
    # same BIGINTs as the engine's zip_with/aggregate fold.
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    quantized = quantize_int8(emb, "vec_id", "embedding")
    queries = quantized.filter(F.col("vec_id") % 50 == 0)
    corpus = quantized.filter(F.col("vec_id") % 50 != 0)
    return quantized_topk(queries, corpus, "vec_id", "qvec", k=3)


# ---------------------------------------------------------------------------
# Q72 — salted-join parity (operators/joins.py: salted_join): the
# skew-proof (key, salt) join aggregated to a salt-independent result;
# the oracle is the PLAIN join — salting must be invisible in the
# output. Demonstrates the hot-key escape hatch the engine ships for
# the 30%-of-100TB pathological key.
# ---------------------------------------------------------------------------

@_register(
    "q72_salted_join_parity",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    tags=("join", "skew", "salting"),
)
def q72_salted_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.joins import salted_join

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus"
    )
    joined = salted_join(li, orders, key="okey", salt=8)
    return joined.groupBy("o_orderstatus").agg(
        F.sum("price_c").alias("revenue_c"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q73 — streaming dedup within watermark (streaming/windows.py:
# stream_dedup): emit each (user_id, event_type)'s first-seen row with
# dropDuplicatesWithinWatermark, state evicted as the watermark
# advances. Output projected to the dedup keys (identical across a
# key's duplicates), so the batch oracle is plain DISTINCT.
# ---------------------------------------------------------------------------

@_register(
    "q73_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup", "watermark"),
)
def q73_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.streaming.windows import stream_dedup

    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    # watermark wider than the testdata's event-time span: state is
    # never evicted mid-run, so the result equals batch DISTINCT even
    # if the source arrives as many files / micro-batches (a 1h delay
    # would re-emit keys recurring later than 1h across batches)
    deduped = stream_dedup(
        stream, ["user_id", "event_type"], watermark="8760 hours"
    )
    return run_to_memory(deduped, _sink_name("q73_dedup"), mode="append")


# ---------------------------------------------------------------------------
# Q74 — HyperLogLog++ approximate distinct with an error-bound
# contract. The sketch estimate itself is engine-specific (Spark HLL++
# vs DuckDB's), so raw estimates can never hash-match across engines;
# what IS portable is the accuracy contract. The query emits the exact
# count plus a boolean asserting the sketch landed within 5% — 5 sigma
# of the requested 1% rsd, so a regenerated testdata set breaches it
# with probability ~1e-6 per group (2% rsd made 5% only 2.5 sigma:
# ~1% per group per regeneration, a flaky gate); the oracle asserts
# the same contract as literal TRUE. At 100 TB the sketch is the only
# affordable distinct: fixed
# ~kB of state per group, partial-aggregated map-side, vs a full
# shuffle of every distinct key for the exact count.
# ---------------------------------------------------------------------------

@_register(
    "q74_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    tags=("sketch", "hll", "agg"),
)
def q74_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("n_users_approx") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * 0.05
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Q75 — full ranking-function suite (rank, dense_rank, percent_rank,
# cume_dist, ntile) over one window — one sort-shuffle on the
# partition key computes all five. percent_rank/cume_dist are rank
# arithmetic ((rank-1)/(n-1), peers/n) — identical IEEE divisions in
# both engines, so they hash-match as doubles.
# ---------------------------------------------------------------------------

@_register(
    "q75_ranking_suite",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist()    OVER w AS cdist,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT), o_orderkey)
    """,
    tags=("window", "ranking"),
)
def q75_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    total_c = _cents(F.col("o_totalprice"))
    w = Window.partitionBy("o_orderstatus").orderBy(total_c, "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        total_c.alias("total_c"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Q76 — binned interval join (operators/joins.py:binned_range_join):
# the BATCH scale path for the q42 purchase↔view interval shape. The
# nested-loop plan Spark picks for a raw inequality join dies when
# both sides are large; binning turns it into one equi-shuffle on a
# coarse time bucket. Oracle is the plain range join — binning must be
# invisible in the output.
# ---------------------------------------------------------------------------

@_register(
    "q76_binned_interval_join",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id AS p_user,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_ts_us
               FROM events WHERE event_type = 'purchase'),
         v AS (SELECT event_id AS view_id, user_id AS v_user,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS view_ts_us
               FROM events WHERE event_type = 'view')
    SELECT p.purchase_id, p.p_user AS user_id, p.purchase_ts_us,
           v.view_id, v.view_ts_us
    FROM p JOIN v ON p.p_user = v.v_user
     AND v.view_ts_us >= p.purchase_ts_us - 1800000000
     AND v.view_ts_us < p.purchase_ts_us
    """,
    tags=("join", "range", "binned", "scale"),
)
def q76_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.joins import binned_range_join

    _tune(spark)
    ev = load_events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts_us").alias("view_ts_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("purchase_ts_us"),
        (F.col("ts_us") - 1_800_000_000).alias("lo_us"),
    )
    joined = binned_range_join(
        views, purchases,
        point_col="view_ts_us", lo_col="lo_us", hi_col="purchase_ts_us",
        bin_width=1_800_000_000,  # = the interval length (30 min)
        keys=[("v_user", "p_user")],
    )
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts_us",
        "view_id",
        "view_ts_us",
    )


# ---------------------------------------------------------------------------
# Q77 — postings-list exact Jaccard (operators/dedup.py:
# postings_jaccard_pairs): the inverted-index scale path for q19's
# all-pairs set similarity. A pair materializes only through a shared
# shingle; every step is a key-shuffle. Oracle = the all-pairs
# formulation (same restricted corpus) — the index must be invisible
# in the output. The blocking col (lang) is folded into the shingle
# key, so cross-language postings never collide, matching q19's
# equi-join on lang.
# ---------------------------------------------------------------------------

@_register(
    "q77_postings_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks)-1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE doc_id < 100)
      WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
             AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    """,
    tags=("dedup", "jaccard", "postings", "scale"),
)
def q77_postings_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    sh = docs.select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - 3),
                lambda i: F.array_join(F.slice(tok, i + 1, 3), " "),
            )
        ).alias("shingles"),
    ).filter(F.size(tok) >= 3)
    blocked = sh.select(
        "doc_id",
        F.transform(
            "shingles", lambda g: F.concat_ws(" ", F.col("lang"), g)
        ).alias("shingles"),
    )
    return dedup_ops.postings_jaccard_pairs(blocked, "doc_id")


# ---------------------------------------------------------------------------
# Q78 — approximate percentile (KLL-style sketch) with a rank-error
# contract. Like q74: the sketch value is engine-specific, the
# ACCURACY contract is portable. approx_percentile(accuracy=1000)
# guarantees rank error ≤ n/1000; the query verifies the returned
# element's rank straddles the target within that bound and emits the
# boolean; the oracle asserts TRUE. At 100 TB the sketch is the only
# affordable quantile: constant memory per group, partial-aggregated,
# vs a full sort for the exact rank.
# ---------------------------------------------------------------------------

@_register(
    "q78_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS median_within_rank_error
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("sketch", "percentile", "agg"),
)
def q78_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", _cents(F.col("o_totalprice")).alias("total_c")
    )
    sketch = orders.groupBy("o_orderstatus").agg(
        F.approx_percentile("total_c", F.lit(0.5), F.lit(1000)).alias("apx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # rank check: #(x <= apx) must reach rank 0.5n - err and
    # #(x < apx) must not exceed 0.5n + err. err = n/1000 + 1: the
    # eps*n sketch bound plus one rank of slack, because the sketch
    # returns a discrete element and its rank convention (floor vs
    # ceil of p*n, 0- vs 1-based) can sit one position off the
    # continuous target — observed at n=514 (rank 256 vs target 257).
    ranked = (
        orders.join(F.broadcast(sketch), "o_orderstatus")
        .groupBy("o_orderstatus", "n")
        .agg(
            F.sum((F.col("total_c") <= F.col("apx")).cast("long")).alias("le"),
            F.sum((F.col("total_c") < F.col("apx")).cast("long")).alias("lt"),
        )
    )
    err = F.col("n") / 1000.0 + 1.0
    target = F.col("n") * 0.5
    return ranked.select(
        "o_orderstatus",
        "n",
        (
            (F.col("le") >= target - err) & (F.col("lt") <= target + err)
        ).alias("median_within_rank_error"),
    )


# ---------------------------------------------------------------------------
# Q79 — unpivot/melt (wide → long): each customer row becomes one row
# per metric column. Spark's native unpivot (DataFrame.unpivot) vs
# DuckDB's UNPIVOT — same relational operator, declared both sides.
# ---------------------------------------------------------------------------

@_register(
    "q79_unpivot",
    oracle="""
    SELECT c_custkey, metric, val
    FROM (
      SELECT c_custkey,
             CAST(c_nationkey AS BIGINT) AS c_nationkey,
             CAST(ROUND(c_acctbal*100) AS BIGINT) AS c_acctbal_c
      FROM customer
    )
    UNPIVOT (val FOR metric IN (c_nationkey, c_acctbal_c))
    """,
    tags=("reshape", "unpivot"),
)
def q79_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        _cents(F.col("c_acctbal")).alias("c_acctbal_c"),
    )
    return cust.unpivot(
        ids=["c_custkey"],
        values=["c_nationkey", "c_acctbal_c"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Q80 — deterministic weighted sampling (operators/sampling.py:
# weighted_sample): exponential-clock A-Res over md5-uniforms, top-50
# documents weighted by length. The oracle replays the identical
# -ln(u)/w arithmetic; selection is stable because clock gaps at the
# boundary are ~1e-3 while cross-engine libm divergence is ≤1 ulp.
# ---------------------------------------------------------------------------

@_register(
    "q80_weighted_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    ORDER BY -ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 12))::BIGINT) + 1)
                 / 281474976710657.0)
             / CAST(n_chars AS DOUBLE) ASC,
             doc_id ASC
    LIMIT 50
    """,
    tags=("llm", "sampling", "weighted"),
)
def q80_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import weighted_sample

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", k=50)


# ---------------------------------------------------------------------------
# Q81 — unigram cross-entropy quality scoring (operators/textstats.py:
# unigram_cross_entropy): perplexity-proxy against the corpus's own
# unigram LM. Per-term surprisal integer-izes to micronats; per-doc
# sums are exact bigints (order-free), so both engines reproduce the
# same bits without a fixed-order fold.
# ---------------------------------------------------------------------------

@_register(
    "q81_unigram_xent",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    dc AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c_dt
           FROM tok GROUP BY 1, 2),
    census AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_t
               FROM tok GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM tok)
    SELECT dc.doc_id,
           CAST(SUM(dc.c_dt) AS BIGINT) AS n_tokens,
           ROUND(-(CAST(SUM(dc.c_dt * CAST(ROUND(ln(CAST(census.c_t AS DOUBLE)
                     / CAST(tot.n_corpus AS DOUBLE)) * 1e6) AS BIGINT)) AS DOUBLE)
                   / 1e6)
                 / CAST(SUM(dc.c_dt) AS DOUBLE), 6) AS xent
    FROM dc JOIN census USING (token) CROSS JOIN tot
    GROUP BY dc.doc_id
    """,
    tags=("llm", "quality", "perplexity"),
)
def q81_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.unigram_cross_entropy(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Q82 — sequence packing (operators/packing.py): documents packed into
# 1024-token training sequences by running offset within md5-bucket
# shards. Exact bigint arithmetic; per-shard windows, no global sort.
# ---------------------------------------------------------------------------

@_register(
    "q82_pack_sequences",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             array_length(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                      t -> t <> '')) AS n_tok,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))::INTEGER) % 8
               AS shard
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tok, shard,
             CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT)
               AS start
      FROM sized
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, CAST(shard AS BIGINT) AS shard,
           start // 1024 AS seq_id, start % 1024 AS "offset"
    FROM cum
    """,
    tags=("llm", "packing"),
)
def q82_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.packing import pack_sequences
    from us_immigration_data_lake_spark.operators.sampling import sample_bucket
    from us_immigration_data_lake_spark.functions.text import token_count

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.lower(F.col("text"))).cast("long").alias("n_tok")
    )
    packed = pack_sequences(
        docs, "doc_id", "n_tok", budget=1024,
        shard_col=sample_bucket("doc_id", 8).cast("long"),
    )
    return packed.select("doc_id", "n_tok", "shard", "seq_id", "offset")


# ---------------------------------------------------------------------------
# Q83 — time-series resample + gap fill (operators/windows.py:
# resample_fill): hourly per-type event counts densified to every hour
# in each type's span, absent hours zero-filled. The dense axis is
# generated per key (sequence+explode) — no driver calendar, no global
# spine cross join.
# ---------------------------------------------------------------------------

@_register(
    "q83_resample_zero_fill",
    oracle="""
    WITH agg AS (
      SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS slot,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT event_type, MIN(slot) AS lo, MAX(slot) AS hi
             FROM agg GROUP BY 1),
    dense AS (SELECT event_type, unnest(generate_series(lo, hi, 1)) AS slot
              FROM span)
    SELECT d.event_type, d.slot, COALESCE(a.n, 0) AS n
    FROM dense d LEFT JOIN agg a USING (event_type, slot)
    """,
    tags=("timeseries", "resample", "window"),
)
def q83_resample_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.windows import resample_fill

    _tune(spark)
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("slot"),
        )
        .groupBy("event_type", "slot")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return resample_fill(hourly, "event_type", "slot", {"n": "zero"}, step=1)


# ---------------------------------------------------------------------------
# Q84 — retention cohorts: users grouped by first-activity week; for
# each (cohort, week-offset), how many are still active. Two
# aggregations and one key-shuffle join — the canonical product-
# analytics rollup, exact integers throughout.
# ---------------------------------------------------------------------------

@_register(
    "q84_retention_cohorts",
    oracle="""
    WITH weekly AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week
      FROM events
    ),
    cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY 1),
    sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM cohorts GROUP BY 1)
    SELECT c.cohort_week,
           w.week - c.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           s.cohort_size
    FROM weekly w
    JOIN cohorts c USING (user_id)
    JOIN sizes s ON s.cohort_week = c.cohort_week
    GROUP BY c.cohort_week, week_offset, s.cohort_size
    """,
    tags=("analytics", "cohort", "retention"),
)
def q84_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir)
    weekly = ev.select(
        "user_id", F.expr("unix_micros(ts) div 604800000000").alias("week")
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        weekly.join(cohorts, "user_id")
        .join(F.broadcast(sizes), "cohort_week")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
            "cohort_size",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .select("cohort_week", "week_offset", "n_active", "cohort_size")
    )


# ---------------------------------------------------------------------------
# Q85 — correlation/covariance from EXACT moments. Built-in corr()/
# covar_samp() accumulate doubles in partial-aggregate order
# (run-dependent last ulps, un-oracle-able); instead the five moments
# sum as DECIMAL(38,0) — exact in both engines at any scale, no int64
# overflow — and the statistics are a fixed double formula over the
# exact moments (identical bits everywhere).
# ---------------------------------------------------------------------------

@_register(
    "q85_exact_corr",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS HUGEINT)
                      * CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS HUGEINT)
                      * CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * (n - 1)), 6) AS covar_samp_c,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr
    FROM m
    """,
    tags=("agg", "statistics"),
)
def q85_exact_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(38,0)").alias("x"),
        _cents(F.col("l_extendedprice")).cast("decimal(38,0)").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(num / (F.col("n") * (F.col("n") - 1)), 6).alias("covar_samp_c"),
        F.round(
            num
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("corr"),
    )


# ---------------------------------------------------------------------------
# Q86 — FILTER-clause conditional aggregation: several differently-
# filtered aggregates in ONE pass over the fact table (the idiom that
# replaces N self-joins with N when() branches inside one shuffle).
# ---------------------------------------------------------------------------

@_register(
    "q86_conditional_aggs",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS finished_revenue_c,
           CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus <> 'P') AS BIGINT)
             AS n_custs_not_pending
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "conditional", "sql"),
)
def q86_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    total_c = _cents(F.col("o_totalprice"))
    is_f = F.col("o_orderstatus") == "F"
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(is_f).alias("n_finished"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.sum(F.when(is_f, total_c)).alias("finished_revenue_c"),
        F.count_distinct(
            F.when(F.col("o_orderstatus") != "P", F.col("o_custkey"))
        ).alias("n_custs_not_pending"),
    )


# ---------------------------------------------------------------------------
# Q87 — blocked fuzzy matching via edit distance: candidate pairs form
# only inside a blocking key (nation), then exact Levenshtein filters
# — the standard entity-resolution shape (block → compare → match).
# All-pairs-within-block is the comparison stage's cost model; at
# scale the blocking key is what keeps it subquadratic.
# ---------------------------------------------------------------------------

@_register(
    "q87_fuzzy_name_match",
    oracle="""
    WITH c AS (SELECT c_custkey, c_name, c_nationkey FROM customer
               WHERE c_custkey < 100)
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    tags=("join", "fuzzy", "entity-resolution"),
)
def q87_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    a = cust.select(
        F.col("c_custkey").alias("id1"),
        F.col("c_name").alias("n1"),
        "c_nationkey",
    )
    b = cust.select(
        F.col("c_custkey").alias("id2"),
        F.col("c_name").alias("n2"),
        "c_nationkey",
    )
    return (
        a.join(b, on="c_nationkey")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("edit_dist", F.levenshtein("n1", "n2").cast("long"))
        .filter(F.col("edit_dist") <= 2)
        .select("id1", "id2", "edit_dist")
    )


# ---------------------------------------------------------------------------
# Q88 — share-of-total (ratio-to-report): each (priority, status)
# cell's revenue as a share of its priority's total, via a window sum
# over the aggregated frame. Sums are exact bigint cents; the share is
# one double division of identical operands.
# ---------------------------------------------------------------------------

@_register(
    "q88_revenue_share",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, o_orderstatus, rev_c,
           ROUND(CAST(rev_c AS DOUBLE) /
                 CAST(SUM(rev_c) OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6)
             AS share_of_priority
    FROM cell
    """,
    tags=("window", "ratio", "analytics"),
)
def q88_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    cell = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("rev_c")
    )
    w = Window.partitionBy("o_orderpriority")
    return cell.select(
        "o_orderpriority",
        "o_orderstatus",
        "rev_c",
        F.round(
            F.col("rev_c").cast("double") / F.sum("rev_c").over(w).cast("double"), 6
        ).alias("share_of_priority"),
    )


# ---------------------------------------------------------------------------
# Q89 — value-positional window functions (first_value, last_value,
# nth_value) over an explicit running frame — the remaining ranking-
# family coverage beyond q33's lag/row_number and q75's rank suite.
# ---------------------------------------------------------------------------

@_register(
    "q89_positional_windows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
           first_value(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER w AS first_c,
           last_value(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER w AS running_last_c,
           nth_value(CAST(ROUND(o_totalprice*100) AS BIGINT), 2) OVER w AS second_c
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "positional"),
)
def q89_positional_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    total_c = _cents(F.col("o_totalprice"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.to_date("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        total_c.alias("total_c"),
        F.first_value(total_c).over(w).alias("first_c"),
        F.last_value(total_c).over(w).alias("running_last_c"),
        F.nth_value(total_c, 2).over(w).alias("second_c"),
    )


# ---------------------------------------------------------------------------
# Q90 — order-independent table checksum: per-row md5-derived bigint,
# summed exactly (DECIMAL(38) — no overflow, no ordering sensitivity
# because integer addition is commutative). The reconciliation
# primitive: comparing two 100 TB copies costs one map + one scalar
# reduce on each side, no sort, no shuffle of data rows — and any
# single-row difference changes the sum. Grouped by l_returnflag so
# a mismatch also localizes.
# ---------------------------------------------------------------------------

@_register(
    "q90_table_checksum",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(('0x' || substr(md5(
                 CAST(l_orderkey AS VARCHAR) || '|' ||
                 CAST(l_linenumber AS VARCHAR) || '|' ||
                 CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS VARCHAR)
               ), 1, 12))::BIGINT) AS VARCHAR) AS checksum
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("quality", "checksum", "reconciliation"),
)
def q90_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    row_key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        _cents(F.col("l_extendedprice")).cast("string"),
    )
    row_hash = F.conv(F.substring(F.md5(row_key), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_hash).cast("string").alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Q91 — BATCH session_window (the streaming q27's aggregation run as a
# plain groupBy): Spark's gap-merge session assignment checked against
# an independent lag-based sessionization in SQL. One sort-shuffle on
# the user key.
# ---------------------------------------------------------------------------

@_register(
    "q91_batch_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
    ), flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                       >= 600000000 OR
                       LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ), sessions AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + 600000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("session-window", "batch", "agg"),
)
def q91_batch_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Q92 — IVF ANN (operators/similarity.py:ivf_knn) as a gate query:
# literal centroids (seed-fixed, like q24's plane matrix) embed in the
# oracle as full-precision repr literals; cell assignment replays via
# the same struct-sort tiebreak (neg sim, cell) and scoring via
# DuckDB's list_cosine_similarity, which q24 established is
# fold-identical to the engine's aggregate/zip_with cosine. In-engine
# k-means training stays test-verified (its oracle would require
# k-means in SQL); THIS row proves the search path end-to-end.
# ---------------------------------------------------------------------------

def _q92_centroids() -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(7)
    return [[float(x) for x in row] for row in rng.randn(4, EMBEDDING_DIM)]


def _q92_oracle_sql() -> str:
    cents = _q92_centroids()

    def lit_list(c: list[float]) -> str:
        return "[" + ", ".join(f"({x!r})" for x in c) + "]"

    negs = ", ".join(
        "{'neg': -list_cosine_similarity(v, " + lit_list(c) + "), 'cell': " + str(i) + "}"
        for i, c in enumerate(cents)
    )
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ranked AS (SELECT vec_id, v, list_sort([{negs}]) AS cells FROM base),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, cells[1].cell AS cell FROM ranked),
    q AS (SELECT vec_id AS query_id, v AS qv, unnest([cells[1].cell, cells[2].cell]) AS cell
          FROM ranked WHERE vec_id % 100 = 3),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             ROUND(list_cosine_similarity(q.qv, c.cv), 6) AS cosine_sim
      FROM q JOIN c USING (cell)
      WHERE q.query_id != c.neighbor_id),
    topk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine_sim FROM topk WHERE rn <= 3
    """


@_register(
    "q92_ivf_knn",
    oracle=_q92_oracle_sql(),
    tags=("similarity", "ivf", "ann"),
)
def q92_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 3)
    return sim_ops.ivf_knn(
        emb, queries, "vec_id", "embedding", k=3,
        centroids=_q92_centroids(), nprobe=2,
    )


# ---------------------------------------------------------------------------
# Q93 — deterministic argmax per group: max(struct(value, tiebreak))
# resolves ties by the unique key inside the ordering itself, unlike
# max_by/arg_max whose tie choice is engine-/order-dependent. One
# partial-aggregated groupBy — the scale-correct "top row per key"
# when k=1 (no window sort needed).
# ---------------------------------------------------------------------------

@_register(
    "q93_argmax_order",
    oracle="""
    SELECT o_orderstatus,
           CAST(max({'c': CAST(ROUND(o_totalprice*100) AS BIGINT), 'k': o_orderkey}).c
                AS BIGINT) AS top_total_c,
           CAST(max({'c': CAST(ROUND(o_totalprice*100) AS BIGINT), 'k': o_orderkey}).k
                AS BIGINT) AS top_orderkey,
           CAST(min({'c': CAST(ROUND(o_totalprice*100) AS BIGINT), 'k': o_orderkey}).k
                AS BIGINT) AS bottom_orderkey
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "argmax"),
)
def q93_argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    pair = F.struct(
        _cents(F.col("o_totalprice")).alias("c"), F.col("o_orderkey").alias("k")
    )
    agg = orders.groupBy("o_orderstatus").agg(
        F.max(pair).alias("hi"), F.min(pair).alias("lo")
    )
    return agg.select(
        "o_orderstatus",
        F.col("hi.c").alias("top_total_c"),
        F.col("hi.k").alias("top_orderkey"),
        F.col("lo.k").alias("bottom_orderkey"),
    )


# ---------------------------------------------------------------------------
# Q94 — referential-integrity audit (operators/audit.py): orphan counts
# per declared FK relationship, LEFT ANTI joins carrying keys only.
# Two relationships are audited against a RESTRICTED parent so the
# orphan path is exercised with nonzero counts.
# ---------------------------------------------------------------------------

# NOTE: aliased import — quality.py also exports a profile_table and
# q51 resolves the module global at call time; a bare name here would
# shadow it (it did, r4 mimic caught the TypeError).
from us_immigration_data_lake_spark.operators.audit import (  # noqa: E402
    profile_table as audit_profile_table,
    referential_audit,
)


@_register(
    "q94_referential_audit",
    oracle="""
    SELECT 'lineitem.orderkey->orders' AS relationship,
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL) AS child_rows,
           (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS orphan_rows
    UNION ALL
    SELECT 'orders.custkey->customer',
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL),
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'orders.custkey->customer[BUILDING]',
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL),
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_mktsegment = 'BUILDING'
                                AND c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'nation.regionkey->region',
           (SELECT COUNT(*) FROM nation WHERE n_regionkey IS NOT NULL),
           (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM region r
                              WHERE r.r_regionkey = n.n_regionkey))
    """,
    tags=("audit", "anti-join", "quality"),
)
def q94_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return referential_audit([
        ("lineitem.orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
        ("orders.custkey->customer", orders, "o_custkey", customer, "c_custkey"),
        (
            "orders.custkey->customer[BUILDING]",
            orders,
            "o_custkey",
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            "c_custkey",
        ),
        ("nation.regionkey->region", nation, "n_regionkey", region, "r_regionkey"),
    ])


# ---------------------------------------------------------------------------
# Q95 — market-basket co-occurrence (operators/basket.py): parts
# bought together in the same order, support >= 2. Equi-join on the
# group key, canonical a<b orientation, group-size cap guards the
# quadratic fan-out.
# ---------------------------------------------------------------------------

from us_immigration_data_lake_spark.operators.basket import (  # noqa: E402
    cooccurrence_pairs,
)


@_register(
    "q95_basket_pairs",
    oracle="""
    WITH pres AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b
      FROM pres a JOIN pres b ON a.g = b.g AND a.i < b.i
    )
    SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_groups
    FROM pairs GROUP BY item_a, item_b HAVING COUNT(*) >= 2
    """,
    tags=("basket", "cooccurrence", "self-join"),
)
def q95_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    lineitem = _t(spark, sf_dir, "lineitem")
    return cooccurrence_pairs(
        lineitem, "l_orderkey", "l_partkey", min_support=2
    ).select("item_a", "item_b", "n_groups")


# ---------------------------------------------------------------------------
# Q96 — fixed-width feature binning: order-value histogram per order
# status. Bin ids via exact integer floor division (the
# binned_range_join rule); one groupBy, partial-agged.
# ---------------------------------------------------------------------------

@_register(
    "q96_price_histogram",
    oracle="""
    WITH b AS (
      SELECT o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    )
    SELECT o_orderstatus,
           CAST((c - ((c % 2500000 + 2500000) % 2500000)) / 2500000 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c) AS BIGINT) AS min_c,
           CAST(MAX(c) AS BIGINT) AS max_c
    FROM b
    GROUP BY 1, 2
    """,
    tags=("binning", "histogram", "agg"),
)
def q96_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    c = _cents(F.col("o_totalprice"))
    w = 2_500_000  # $25k bins
    b = orders.select(
        "o_orderstatus",
        c.alias("c"),
    ).withColumn("bin", F.expr(f"(c - pmod(c, {w})) div {w}"))
    return b.groupBy("o_orderstatus", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("c").alias("min_c"),
        F.max("c").alias("max_c"),
    )


# ---------------------------------------------------------------------------
# Q97 — forward as-of join with tolerance (operators/joins.py): each
# purchase matched to the user's NEXT view within 30 minutes. Single
# sort-shuffle merge plan; DuckDB's native ASOF JOIN (>=) is the
# oracle, with both sides deduped to unique (user, ts) so tie choice
# cannot differ between engines.
# ---------------------------------------------------------------------------

@_register(
    "q97_asof_forward",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS tsu,
             CAST(ROUND(value * 100) AS BIGINT) AS value_c
      FROM events
    ),
    purch AS (SELECT user_id, tsu, event_id, value_c FROM e
              WHERE event_type = 'purchase'),
    views AS (
      SELECT user_id, tsu, MIN(event_id) AS view_event_id FROM e
      WHERE event_type = 'view' GROUP BY user_id, tsu
    ),
    matched AS (
      SELECT p.event_id, p.user_id, p.value_c,
             v.tsu AS vtsu, v.view_event_id
      FROM purch p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND v.tsu >= p.tsu
    )
    SELECT event_id, user_id, value_c,
           CASE WHEN vtsu - (SELECT tsu FROM purch p2
                             WHERE p2.event_id = matched.event_id)
                     <= 1800000000
                THEN view_event_id END AS next_view_id
    FROM matched
    """,
    tags=("asof", "forward", "tolerance"),
    bench=True,
)
def q97_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.joins import as_of_join

    _tune(spark)
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("tsu"),
        _cents(F.col("value")).alias("value_c"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "tsu", "event_id", "value_c"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "tsu")
        .agg(F.min("event_id").alias("view_event_id"))
    )
    out = as_of_join(
        purch,
        views,
        keys=["user_id"],
        left_ts="tsu",
        right_ts="tsu",
        right_vals=["view_event_id"],
        direction="forward",
        tolerance=1_800_000_000,  # 30 min in micros
    )
    return out.select(
        "event_id", "user_id", "value_c",
        F.col("view_event_id").alias("next_view_id"),
    )


# ---------------------------------------------------------------------------
# Q98 — CDC snapshot diff (operators/history.py): added/removed/changed
# classification via one FULL OUTER key join; output proportional to
# churn. The "new" snapshot is derived deterministically in both
# engines (drop %13 keys, flip status on %7, append %17 keys shifted).
# ---------------------------------------------------------------------------

@_register(
    "q98_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             total_c
      FROM old WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', CAST(0 AS BIGINT)
      FROM old WHERE o_orderkey % 17 = 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.total_c IS DISTINCT FROM n.total_c THEN 'changed'
           END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
               WHEN n.o_orderkey IS NULL THEN 'removed'
               WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 OR o.total_c IS DISTINCT FROM n.total_c THEN 'changed'
          END IS NOT NULL
    """,
    tags=("cdc", "diff", "full-outer"),
)
def q98_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.history import snapshot_diff

    _tune(spark)
    old = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        _cents(F.col("o_totalprice")).alias("total_c"),
    )
    new = old.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "total_c",
    ).unionByName(
        old.filter(F.col("o_orderkey") % 17 == 0).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(0).cast("long").alias("total_c"),
        )
    )
    return snapshot_diff(
        old, new, keys=["o_orderkey"], compare_cols=["o_orderstatus", "total_c"]
    )


# ---------------------------------------------------------------------------
# Q99 — rolling 7-day distinct customers (operators/aggregate.py):
# weekly-active-entity counts via dedup → bounded ×7 fan-out → one
# exact distinct per day; no sliding-window DISTINCT exists in any
# engine, this is the standard rewrite.
# ---------------------------------------------------------------------------

@_register(
    "q99_rolling_active",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, o_custkey AS e
      FROM orders
    ),
    days AS (SELECT DISTINCT d FROM pres)
    SELECT days.d AS d, CAST(COUNT(DISTINCT pres.e) AS BIGINT) AS n_distinct
    FROM days JOIN pres ON pres.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
    tags=("rolling", "distinct", "timeseries"),
)
def q99_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.aggregate import (
        rolling_distinct_count,
    )

    _tune(spark)
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"), "o_custkey"
    )
    return rolling_distinct_count(orders, "d", "o_custkey", window_days=7)


# ---------------------------------------------------------------------------
# Q100 — single-pass table profile (operators/audit.py): per-column
# null/distinct/min/max in ONE scan + one tiny unpivot; min/max in
# native type order, stringified after.
# ---------------------------------------------------------------------------

@_register(
    "q100_table_profile",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders
    )
    SELECT 'o_orderkey' AS column, (SELECT COUNT(*) FROM t) AS n_rows,
           (SELECT COUNT(*) FROM t WHERE o_orderkey IS NULL) AS n_nulls,
           (SELECT COUNT(DISTINCT o_orderkey) FROM t) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_str FROM t
    UNION ALL
    SELECT 'o_custkey', (SELECT COUNT(*) FROM t),
           (SELECT COUNT(*) FROM t WHERE o_custkey IS NULL),
           (SELECT COUNT(DISTINCT o_custkey) FROM t),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM t
    UNION ALL
    SELECT 'o_orderstatus', (SELECT COUNT(*) FROM t),
           (SELECT COUNT(*) FROM t WHERE o_orderstatus IS NULL),
           (SELECT COUNT(DISTINCT o_orderstatus) FROM t),
           MIN(o_orderstatus), MAX(o_orderstatus) FROM t
    UNION ALL
    SELECT 'o_orderpriority', (SELECT COUNT(*) FROM t),
           (SELECT COUNT(*) FROM t WHERE o_orderpriority IS NULL),
           (SELECT COUNT(DISTINCT o_orderpriority) FROM t),
           MIN(o_orderpriority), MAX(o_orderpriority) FROM t
    UNION ALL
    SELECT 'total_c', (SELECT COUNT(*) FROM t),
           (SELECT COUNT(*) FROM t WHERE total_c IS NULL),
           (SELECT COUNT(DISTINCT total_c) FROM t),
           CAST(MIN(total_c) AS VARCHAR), CAST(MAX(total_c) AS VARCHAR) FROM t
    """,
    tags=("profile", "quality", "single-pass"),
)
def q100_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    t = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        _cents(F.col("o_totalprice")).alias("total_c"),
    )
    return audit_profile_table(
        t, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "total_c"]
    )


# ---------------------------------------------------------------------------
# Q101 — weighted median (operators/orderstats.py): quantity-weighted
# median line price per return flag; range-frame cumulative weights →
# bit-deterministic pick, no raw-double accumulation.
# ---------------------------------------------------------------------------

@_register(
    "q101_weighted_median",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, v,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM s
    )
    SELECT l_returnflag,
           CAST(MIN(v) AS BIGINT) AS w_median,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM cum WHERE cw * 2 >= tot GROUP BY l_returnflag
    """,
    tags=("median", "weighted", "orderstats"),
)
def q101_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.orderstats import weighted_median

    _tune(spark)
    s = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _cents(F.col("l_extendedprice")).alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    return weighted_median(s, ["l_returnflag"], "v", "w")


# ---------------------------------------------------------------------------
# Q102 — Bloom-filter membership (operators/sketches.py): build over one
# customer segment, probe all customers. Bit positions are md5_long-
# derived, so the DuckDB oracle replays the filter BIT-FOR-BIT — the
# exact false-positive count is value-checked, not just its bound.
# num_bits deliberately small (4096) so false positives actually occur
# at sf0.01 and the fp path is exercised, not vacuously green.
# ---------------------------------------------------------------------------

@_register(
    "q102_bloom_contract",
    oracle="""
    WITH seeds AS (SELECT unnest(range(5)) AS i),
    bld AS (SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_mktsegment = 'BUILDING'),
    bits AS (
      SELECT DISTINCT
        ('0x' || substr(md5(i::VARCHAR || '|' || k::VARCHAR), 1, 15))::BIGINT
          % 4096 AS b
      FROM bld, seeds
    ),
    probe AS (SELECT c_custkey AS k,
                     c_mktsegment = 'BUILDING' AS is_member
              FROM customer),
    pb AS (
      SELECT k, is_member,
        ('0x' || substr(md5(i::VARCHAR || '|' || k::VARCHAR), 1, 15))::BIGINT
          % 4096 AS b
      FROM probe, seeds
    ),
    per_key AS (
      SELECT pb.k, pb.is_member,
             MIN(CASE WHEN bits.b IS NULL THEN 0 ELSE 1 END) = 1 AS might_match
      FROM pb LEFT JOIN bits ON pb.b = bits.b
      GROUP BY pb.k, pb.is_member
    )
    SELECT CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(SUM(CASE WHEN is_member AND NOT might_match THEN 1 ELSE 0 END)
                AS BIGINT) AS member_misses,
           CAST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_non_members,
           CAST(SUM(CASE WHEN NOT is_member AND might_match THEN 1 ELSE 0 END)
                AS BIGINT) AS fp_count,
           SUM(CASE WHEN NOT is_member AND might_match THEN 1 ELSE 0 END)
             <= 0.35 * SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END)
             AS fp_within_bound
    FROM per_key
    """,
    tags=("bloom", "sketch", "portable-hash"),
)
def q102_bloom_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import bloom_contract

    _tune(spark)
    customer = _t(spark, sf_dir, "customer")
    build = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    return bloom_contract(
        build,
        customer.select("c_custkey"),
        "c_custkey",
        "c_custkey",
        max_fp_rate=0.35,
        num_hashes=5,
        num_bits=4096,
    )


# ---------------------------------------------------------------------------
# Q103 — 2-D skyline / Pareto frontier (operators/orderstats.py):
# cheapest-per-size parts. Two-phase bucketed window plan (never a
# global single-partition sort); the DuckDB oracle is the independent
# NOT EXISTS dominance spec, cross-checking the algorithm against the
# definition.
# ---------------------------------------------------------------------------

@_register(
    "q103_skyline_parts",
    oracle="""
    WITH p AS (
      SELECT p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS psize
      FROM part
    )
    SELECT p_partkey, price_c, psize FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price_c <= a.price_c AND b.psize >= a.psize
        AND (b.price_c < a.price_c OR b.psize > a.psize)
    )
    """,
    tags=("skyline", "pareto", "orderstats"),
)
def q103_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.orderstats import skyline_2d

    _tune(spark)
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        _cents(F.col("p_retailprice")).alias("price_c"),
        F.col("p_size").cast("long").alias("psize"),
    )
    return skyline_2d(p, "price_c", "psize", bucket_width=1000)


# ---------------------------------------------------------------------------
# Q104 — first-touch session attribution: purchase revenue credited to
# the FIRST event type of each 10-minute-gap session. session_window
# gap-merge (one sort-shuffle on user) + deterministic first-pick via
# min(struct(ts, event_id, ...)) — the q93 argmax rule applied inside
# sessions; the oracle re-derives sessions independently with the
# lag/cumsum formulation and min_by over the same composite key.
# ---------------------------------------------------------------------------

@_register(
    "q104_session_attribution",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS value_c
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w >= 600000000
                       OR LAG(ts_us) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), per_session AS (
      -- the session's first row by (ts_us, event_id) is exactly the
      -- row that raised new_session; no struct-ordered min_by needed
      SELECT user_id, sid,
             MAX(CASE WHEN new_session = 1 THEN event_type END)
               AS first_event_type,
             CAST(SUM(value_c) AS BIGINT) AS revenue_c,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases
      FROM sessions GROUP BY user_id, sid
    )
    SELECT first_event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_purchases) AS BIGINT) AS n_purchases,
           CAST(SUM(revenue_c) AS BIGINT) AS revenue_c
    FROM per_session GROUP BY first_event_type
    """,
    tags=("session-window", "attribution", "argmax"),
)
def q104_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.when(
            F.col("event_type") == "purchase", _cents(F.col("value"))
        ).otherwise(F.lit(0).cast("long")).alias("value_c"),
    )
    per_session = ev.groupBy(
        F.session_window("ts", "10 minutes").alias("w"), "user_id"
    ).agg(
        F.min(
            F.struct(
                F.col("ts_us").alias("t"),
                F.col("event_id").alias("e"),
                F.col("event_type").alias("et"),
            )
        )["et"].alias("first_event_type"),
        F.sum("value_c").alias("revenue_c"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("n_purchases"),
    )
    return per_session.groupBy("first_event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_purchases").cast("long").alias("n_purchases"),
        F.sum("revenue_c").cast("long").alias("revenue_c"),
    )


# ---------------------------------------------------------------------------
# Q105 — local-supplier revenue by nation (TPC-H Q5 shape): the
# engine's deepest join tree. Only the FIXED-SIZE dims (region: 5
# rows, nation: 25 rows — constant at every scale factor) carry an
# explicit broadcast hint; customer and supplier grow with SF, so
# they must stay size-based decisions — AQE broadcasts them at bench
# scale and shuffles them at 100 TB, where forcing the hint would
# blow the 8 GB broadcast limit. The fact spine (lineitem⋈orders)
# equi-joins on orderkey.
# ---------------------------------------------------------------------------

@_register(
    "q105_local_supplier_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    tags=("join", "multi-join", "broadcast", "agg"),
    # headliner: the bench's join-depth representative. Added in the
    # same round as q24 (the set already changes once, per the r3
    # verdict ask) so the headline set can stay frozen afterwards.
    bench=True,
)
def q105_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(rev).alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q106 — month-over-month revenue growth per nation: window lag on a
# pre-aggregated monthly rollup (the window runs over |nations×months|
# rows, never raw facts), growth as exact integer basis points.
# ---------------------------------------------------------------------------

@_register(
    "q106_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS VARCHAR)
               AS ym,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT nationkey, ym, revenue_c,
           LAG(revenue_c) OVER (PARTITION BY nationkey ORDER BY ym)
             AS prev_revenue_c,
           CASE WHEN LAG(revenue_c) OVER (PARTITION BY nationkey ORDER BY ym)
                     > 0
                THEN CAST(((revenue_c
                            - LAG(revenue_c) OVER (PARTITION BY nationkey
                                                   ORDER BY ym)) * 10000)
                          // LAG(revenue_c) OVER (PARTITION BY nationkey
                                                  ORDER BY ym) AS BIGINT)
           END AS growth_bps
    FROM monthly
    """,
    tags=("window", "lag", "timeseries", "rollup"),
)
def q106_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    monthly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("ym"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("revenue_c"))
    )
    w = Window.partitionBy("nationkey").orderBy("ym")
    prev = F.lag("revenue_c").over(w)
    # exact integer basis points: both engines' integral division
    # truncates toward zero (Spark `div`, DuckDB `//` — verified
    # (-7)//2 = -3), so negative growth months agree bit-for-bit
    growth = F.when(
        prev > 0,
        F.expr(
            "CAST(((revenue_c - prev_revenue_c) * 10000) "
            "div prev_revenue_c AS BIGINT)"
        ),
    )
    return (
        monthly.withColumn("prev_revenue_c", prev)
        .withColumn("growth_bps", growth)
    )


# ---------------------------------------------------------------------------
# Q107 — above-average customers with no URGENT orders (TPC-H Q22
# shape): scalar aggregate subquery (computed once, broadcast into the
# filter) + LEFT ANTI join against the filtered orders. No correlated
# per-row re-evaluation. (Anti-joining ALL orders would be vacuous —
# this dataset gives every customer at least one order — so the
# urgent-only restriction keeps the anti path populated.)
# ---------------------------------------------------------------------------

@_register(
    "q107_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS total_bal_c
    FROM customer c
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
            > (SELECT CAST(s AS DOUBLE) / n FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
    tags=("subquery", "anti-join", "agg"),
)
def q107_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    bal_c = _cents(F.col("c_acctbal"))
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(bal_c).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        bal_c > F.col("__avg")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    idle_rich = rich.join(urgent, on="c_custkey", how="left_anti")
    return idle_rich.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(bal_c).alias("total_bal_c"),
    )


# ---------------------------------------------------------------------------
# Q108 — stream-stream LEFT OUTER interval join (streaming/windows.py):
# q42's purchase↔view join emitting unmatched purchases with NULL view
# columns. Outer emission is watermark-gated: a left row emits its
# NULL-extended result only once the watermark passes its event time
# (from v_ts <= p_ts, no earlier-or-equal view can still arrive).
# The query's GLOBAL watermark is the MIN over both watermarked
# streams — min(floor_ms(max purchase ts), floor_ms(max view ts)) −
# 1 h — which is what makes the cutoff data-dependent: whichever side
# saw events last does not advance the other side's clock. Verified
# empirically at sf0.001 AND sf0.01 (the min-of-sides value lands
# inside the measured emitted/withheld bracket at both SFs; a
# global-max model is provably outside it at sf0.001). The oracle
# replays exactly that cutoff; the withheld tail is the documented
# semantics of streaming outer joins, not data loss.
# ---------------------------------------------------------------------------

@_register(
    "q108_stream_outer_join",
    oracle="""
    WITH wm AS (
      SELECT least(
               date_trunc('milliseconds',
                 max(CAST(ts AS TIMESTAMP)) FILTER (event_type = 'purchase')),
               date_trunc('milliseconds',
                 max(CAST(ts AS TIMESTAMP)) FILTER (event_type = 'view'))
             ) - INTERVAL 1 HOUR AS m
      FROM events
    ),
    p AS (SELECT event_id AS purchase_id, user_id,
                 CAST(ts AS TIMESTAMP) AS ts,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
          FROM events WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS view_id, user_id,
                 CAST(ts AS TIMESTAMP) AS ts,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
          FROM events WHERE event_type = 'view')
    SELECT p.purchase_id, p.user_id, p.ts_us AS purchase_ts_us,
           v.view_id, v.ts_us AS view_ts_us
    FROM p JOIN v ON p.user_id = v.user_id
       AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
    UNION ALL
    SELECT p.purchase_id, p.user_id, p.ts_us,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM p, wm
    WHERE NOT EXISTS (
        SELECT 1 FROM v WHERE v.user_id = p.user_id
          AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts)
      AND p.ts < wm.m
    """,
    tags=("streaming", "stream-stream-join", "outer", "watermark"),
)
def q108_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.sources.events import read_event_stream
    from us_immigration_data_lake_spark.streaming.windows import (
        purchase_view_interval_join,
        run_to_memory,
    )

    _tune(spark)
    stream = read_event_stream(spark, sf_dir)
    joined = purchase_view_interval_join(stream, "30 minutes", how="leftOuter")
    return run_to_memory(joined, _sink_name("q108_outer"), mode="append")


# ---------------------------------------------------------------------------
# Q109 — triangle counting (operators/graph.py) on the co-purchase
# graph: parts are linked when bought together in >= 2 orders (q95's
# pair table), triangles found once each via the canonical a<b<c
# two-join plan, then per-node participation counts. The oracle
# repeats the same joins declaratively.
# ---------------------------------------------------------------------------

@_register(
    "q109_triangle_count",
    oracle="""
    WITH pres AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
    pairs AS (
      SELECT a.i AS x, b.i AS y
      FROM pres a JOIN pres b ON a.g = b.g AND a.i < b.i
    ),
    e AS (
      SELECT x AS a, y AS b FROM pairs GROUP BY x, y HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT xy.a, xy.b, yz.c
      FROM e xy
      JOIN (SELECT a AS b, b AS c FROM e) yz ON xy.b = yz.b
      JOIN (SELECT a, b AS c FROM e) xz ON xz.a = xy.a AND xz.c = yz.c
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    """,
    tags=("graph", "triangles", "self-join"),
)
def q109_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.graph import (
        canonical_edges,
        triangle_count,
    )

    _tune(spark)
    lineitem = _t(spark, sf_dir, "lineitem")
    pairs = cooccurrence_pairs(lineitem, "l_orderkey", "l_partkey", min_support=2)
    edges = canonical_edges(pairs, "item_a", "item_b")
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# Q110 — per-group z-score standardization (the ML feature-prep
# staple): mean and variance derived from EXACT integer sums (rule 1),
# so the one double division/sqrt/quotient chain per row runs on
# identical operands in every engine — bit-identical scores without
# banning floats. Broadcast of the tiny per-group moment table.
# ---------------------------------------------------------------------------

@_register(
    "q110_zscore",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(v * v) AS HUGEINT) AS svv
      FROM s GROUP BY l_returnflag
    )
    SELECT s.l_orderkey, s.l_linenumber, s.l_returnflag,
           CAST(ROUND(
             (CAST(s.v AS DOUBLE) - CAST(m.sv AS DOUBLE) / m.n)
             / sqrt(CAST(svv AS DOUBLE) / m.n
                    - (CAST(sv AS DOUBLE) / m.n) * (CAST(sv AS DOUBLE) / m.n))
             * 1000000) AS BIGINT) AS z_e6
    FROM s JOIN m USING (l_returnflag)
    """,
    tags=("feature-prep", "zscore", "broadcast"),
)
def q110_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        _cents(F.col("l_extendedprice")).alias("v"),
    )
    # v² ~1e14 cents²: a BIGINT sum overflows silently past ~92k rows
    # per group at sf0.1+ (Spark wraps, non-ANSI). DECIMAL(38,0) holds
    # the exact integer to 1e38 — mirrors the oracle's HUGEINT; both
    # convert to the same nearest-double for the variance quotient.
    m = s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(
            (F.col("v") * F.col("v")).cast("decimal(38,0)")
        ).alias("svv"),
    )
    vd = F.col("v").cast("double")
    mean = F.col("sv").cast("double") / F.col("n")
    var = F.col("svv").cast("double") / F.col("n") - mean * mean
    z = (vd - mean) / F.sqrt(var)
    return s.join(F.broadcast(m), "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.round(z * 1e6).cast("long").alias("z_e6"),
    )


# ---------------------------------------------------------------------------
# Q111 — chi-square independence test (orderpriority × orderstatus)
# from exact contingency counts: each cell's statistic term is a
# double computed from identical exact integers, integer-ized per
# CELL before the sum (rule 1 — a raw double total would depend on
# cell order), then summed exactly.
# ---------------------------------------------------------------------------

@_register(
    "q111_chi_square",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS nr FROM obs GROUP BY r),
    ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS nc FROM obs GROUP BY c),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    terms AS (
      SELECT obs.r, obs.c,
             CAST(ROUND(
               (CAST(obs.o AS DOUBLE)
                - CAST(rt.nr AS DOUBLE) * ct.nc / n.n)
               * (CAST(obs.o AS DOUBLE)
                  - CAST(rt.nr AS DOUBLE) * ct.nc / n.n)
               / (CAST(rt.nr AS DOUBLE) * ct.nc / n.n)
               * 1000000) AS BIGINT) AS term_e6
      FROM obs JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN n
    )
    SELECT CAST(SUM(term_e6) AS BIGINT) AS chi2_e6,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM terms
    """,
    tags=("stats", "chi-square", "contingency"),
)
def q111_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rt = obs.groupBy("r").agg(F.sum("o").alias("nr"))
    ct = obs.groupBy("c").agg(F.sum("o").alias("nc"))
    n = obs.agg(F.sum("o").alias("n"))
    e = F.col("nr").cast("double") * F.col("nc") / F.col("n")
    term = (F.col("o").cast("double") - e) * (
        F.col("o").cast("double") - e
    ) / e
    terms = (
        obs.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(n))
        .select(F.round(term * 1e6).cast("long").alias("term_e6"))
    )
    return terms.agg(
        F.sum("term_e6").cast("long").alias("chi2_e6"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )


# ---------------------------------------------------------------------------
# Q112 — event-transition bigrams (first-order Markov counts): per
# user, consecutive event-type pairs by (ts, event_id) order, counted
# corpus-wide. One lag window over the user shuffle, one groupBy —
# the sequence-mining primitive.
# ---------------------------------------------------------------------------

@_register(
    "q112_markov_transitions",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                                            event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM e WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("sequence", "markov", "lag"),
)
def q112_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id")
    )
    e = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        e.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Q113 — join-key skew report: the diagnostic a pipeline runs BEFORE
# choosing salting (q66/q72). Per-key frequencies of the fact join
# key → heaviest keys + skew ratio in integer permille against the
# mean. Pure two-level aggregation, partial-agged.
# ---------------------------------------------------------------------------

@_register(
    "q113_skew_report",
    oracle="""
    WITH f AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_n
      FROM f
    )
    SELECT s.n_keys, s.n_rows, s.max_n,
           CAST(s.max_n * s.n_keys * 1000 // s.n_rows AS BIGINT)
             AS max_over_mean_permille,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM f, s
             WHERE f.n * s.n_keys * 10 >= s.n_rows * 20) AS keys_over_2x_mean
    FROM s
    """,
    tags=("skew", "diagnostics", "agg"),
)
def q113_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    f = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    s = f.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
    )
    heavy = (
        f.crossJoin(F.broadcast(s.select(
            F.col("n_keys").alias("__k"), F.col("n_rows").alias("__r")
        )))
        .filter(F.col("n") * F.col("__k") * 10 >= F.col("__r") * 20)
        .agg(F.count(F.lit(1)).cast("long").alias("keys_over_2x_mean"))
    )
    return s.crossJoin(heavy).select(
        "n_keys", "n_rows", "max_n",
        F.expr(
            "CAST((max_n * n_keys * 1000) div n_rows AS BIGINT)"
        ).alias("max_over_mean_permille"),
        "keys_over_2x_mean",
    )


# ---------------------------------------------------------------------------
# Q114 — group-wise OLS linear regression (REGR_SLOPE family) of
# price-cents on quantity, via exact integer moments (rule 1): the six
# moments are bigint/decimal(38,0) sums, the slope/intercept/r²
# doubles are one fixed chain over identical operands in both engines.
# Scale: single partial+final hash aggregate; 48 bytes per group.
# ---------------------------------------------------------------------------

@_register(
    "q114_groupwise_ols",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM s GROUP BY l_returnflag
    ),
    d AS (
      SELECT l_returnflag, n, sx, sy,
             CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
             CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS den_x,
             CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS den_y
      FROM m
    )
    SELECT l_returnflag, n,
           CAST(ROUND(num / NULLIF(den_x, 0) * 1000000) AS BIGINT) AS slope_e6,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - (num / NULLIF(den_x, 0)) * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS intercept_e6,
           CAST(ROUND((num * num) / NULLIF(den_x * den_y, 0) * 1000000)
                AS BIGINT) AS r2_e6
    FROM d
    """,
    tags=("regression", "modeling", "agg"),
)
def q114_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import groupwise_ols

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        _cents(F.col("l_extendedprice")).alias("y"),
    )
    return groupwise_ols(s, ["l_returnflag"], "x", "y")


# ---------------------------------------------------------------------------
# Q115 — finite-impulse EWMA smoothing of each user's event-value
# series (k=4 lags, alpha=0.5 → exact binary weights .5 .25 .125
# .0625). Series heads renormalize over the lags present. One window
# pass; the k lag() calls share a single sort.
# ---------------------------------------------------------------------------

@_register(
    "q115_ewma_smooth",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    l AS (
      SELECT event_id, user_id, v,
             lag(v, 1) OVER w AS v1,
             lag(v, 2) OVER w AS v2,
             lag(v, 3) OVER w AS v3
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, v,
           CAST(ROUND(
             (0.5 * CAST(v AS DOUBLE)
              + CASE WHEN v1 IS NOT NULL THEN 0.25 * CAST(v1 AS DOUBLE) ELSE 0.0 END
              + CASE WHEN v2 IS NOT NULL THEN 0.125 * CAST(v2 AS DOUBLE) ELSE 0.0 END
              + CASE WHEN v3 IS NOT NULL THEN 0.0625 * CAST(v3 AS DOUBLE) ELSE 0.0 END)
             / (0.5
                + CASE WHEN v1 IS NOT NULL THEN 0.25 ELSE 0.0 END
                + CASE WHEN v2 IS NOT NULL THEN 0.125 ELSE 0.0 END
                + CASE WHEN v3 IS NOT NULL THEN 0.0625 ELSE 0.0 END)
             * 1000000) AS BIGINT) AS ewma_e6
    FROM l
    """,
    tags=("ewma", "timeseries", "window"),
)
def q115_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import ewma_smooth

    _tune(spark)
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts", _cents(F.col("value")).alias("v")
    )
    out = ewma_smooth(
        ev, ["user_id"], ["ts", "event_id"], "v", alpha=0.5, k=4
    )
    return out.select("event_id", "user_id", "v", "ewma_e6")


# ---------------------------------------------------------------------------
# Q116 — MAD robust outlier screen per return flag, entirely in exact
# integer arithmetic via the doubled-units trick (med2 = 2·median,
# mad4 = 4·MAD, test 2·dev2 > 3·mad4). Two exact-median window passes
# — the inherent cost of exact order statistics.
# ---------------------------------------------------------------------------

@_register(
    "q116_mad_outliers",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS g,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             l_orderkey AS k1, l_linenumber AS k2
      FROM lineitem
    ),
    r1 AS (
      SELECT g, v,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, k1, k2) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM s
    ),
    med AS (
      SELECT g,
             CAST(CASE WHEN COUNT(*) = 1 THEN SUM(v) * 2 ELSE SUM(v) END
                  AS BIGINT) AS median2
      FROM r1 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY g
    ),
    d AS (
      SELECT s.g, s.v, s.k1, s.k2,
             ABS(2 * s.v - med.median2) AS dev2, med.median2
      FROM s JOIN med USING (g)
    ),
    r2 AS (
      SELECT g, dev2,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY dev2, k1, k2) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM d
    ),
    mad AS (
      SELECT g,
             CAST(CASE WHEN COUNT(*) = 1 THEN SUM(dev2) * 2 ELSE SUM(dev2) END
                  AS BIGINT) AS mad4
      FROM r2 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY g
    )
    SELECT d.g AS l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(d.median2) AS BIGINT) AS median2,
           CAST(MIN(mad.mad4) AS BIGINT) AS mad4,
           CAST(SUM(CASE WHEN 2 * d.dev2 > 3 * mad.mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (g)
    GROUP BY d.g
    """,
    tags=("mad", "outliers", "robust-stats"),
)
def q116_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import mad_outlier_stats

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag"),
        _cents(F.col("l_extendedprice")).alias("v"),
        "l_orderkey", "l_linenumber",
    )
    out = mad_outlier_stats(
        s, ["l_returnflag"], "v", ["l_orderkey", "l_linenumber"], n_sigmas=3
    )
    return out.select("l_returnflag", "n", "median2", "mad4", "n_outliers")


# ---------------------------------------------------------------------------
# Q117 — small-quantity-order revenue (TPC-H Q17 shape): per-part
# average-quantity threshold as an EXACT integer inequality
# (q < 0.2·avg ⇔ 5·q·n < Σq — no doubles in the predicate). The
# correlated-subquery formulation becomes: broadcast the filtered
# part dim, aggregate per-part moments, broadcast those (≤ |brand
# parts| rows) back onto the lines.
# ---------------------------------------------------------------------------

@_register(
    "q117_small_qty_revenue",
    oracle="""
    WITH l AS (
      SELECT l_partkey,
             CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#13'
    ),
    t AS (
      SELECT l_partkey,
             CAST(SUM(q) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM l GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(l.cents) AS BIGINT) AS below_sum_cents,
           CAST(ROUND(CAST(SUM(l.cents) AS DOUBLE) / 7.0) AS BIGINT)
             AS avg_yearly_cents
    FROM l JOIN t USING (l_partkey)
    WHERE 5 * l.q * t.n < t.sq
    """,
    tags=("tpch-q17", "correlated-agg", "broadcast"),
)
def q117_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    l = li.join(
        F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
    ).select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("long").alias("q"),
        _cents(F.col("l_extendedprice")).alias("cents"),
    )
    t = l.groupBy("l_partkey").agg(
        F.sum("q").cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    below = l.join(F.broadcast(t), "l_partkey").filter(
        F.lit(5) * F.col("q") * F.col("n") < F.col("sq")
    )
    return below.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("cents").cast("long").alias("below_sum_cents"),
        F.round(F.sum("cents").cast("double") / 7.0).cast("long").alias(
            "avg_yearly_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Q118 — large-volume orders (TPC-H Q18 shape): group lineitem on the
# order key (one fact-side shuffle), HAVING-filter to the heavy tail,
# then broadcast that tiny survivor set onto orders. No window, no
# second fact scan.
# ---------------------------------------------------------------------------

@_register(
    "q118_large_orders",
    oracle="""
    WITH t AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 300
    )
    SELECT o.o_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           t.sum_qty
    FROM orders o JOIN t ON o.o_orderkey = t.l_orderkey
    """,
    tags=("tpch-q18", "having", "broadcast"),
)
def q118_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return orders.join(
        F.broadcast(t.withColumnRenamed("l_orderkey", "o_orderkey")), "o_orderkey"
    ).select(
        "o_custkey", "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        _cents(F.col("o_totalprice")).alias("total_cents"),
        "sum_qty",
    )


# ---------------------------------------------------------------------------
# Q119 — disjunctive multi-predicate join revenue (TPC-H Q19 shape).
# The OR-of-conjunctions references both sides, so Catalyst cannot
# push it; the engine derives the part-side UNION of the disjuncts
# (brand ∈ {...} AND size bounds) explicitly — the dim shrinks before
# the broadcast, the residual OR evaluates post-join. Revenue is the
# per-row deterministic cents chain (rule 1).
# ---------------------------------------------------------------------------

@_register(
    "q119_disjunctive_join",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch-q19", "disjunction", "predicate-derivation"),
)
def q119_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # Part-side implied filter (union of the disjuncts' part terms):
    # shrinks the broadcast dim ~20× before the join.
    part_f = part.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    j = li.join(
        F.broadcast(part_f), li.l_partkey == part_f.p_partkey
    )
    disj = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(disj).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Q120 — sole-responsible supplier (TPC-H Q21 shape, adapted to this
# schema's columns): suppliers whose 'R'-flagged lines sit in
# multi-supplier orders where NO other supplier flagged 'R'. The
# EXISTS / NOT EXISTS pair becomes a semi-join + anti-join on the
# order key — both shuffle on l_orderkey only, so the three fact
# references co-partition into one exchange under AQE.
# ---------------------------------------------------------------------------

@_register(
    "q120_sole_blame_supplier",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
    ),
    r AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE l_returnflag = 'R'
    ),
    multi AS (
      SELECT r.l_orderkey, r.l_suppkey FROM r
      WHERE EXISTS (SELECT 1 FROM li l2
                    WHERE l2.l_orderkey = r.l_orderkey
                      AND l2.l_suppkey <> r.l_suppkey)
    ),
    sole AS (
      SELECT m.l_orderkey, m.l_suppkey FROM multi m
      WHERE NOT EXISTS (SELECT 1 FROM li l3
                        WHERE l3.l_orderkey = m.l_orderkey
                          AND l3.l_suppkey <> m.l_suppkey
                          AND l3.l_returnflag = 'R')
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole JOIN supplier s ON sole.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT 10
    """,
    tags=("tpch-q21", "exists", "anti-join"),
)
def q120_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    supplier = _t(spark, sf_dir, "supplier")
    r = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    li2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    multi = r.join(
        li2,
        (r.l_orderkey == li2.o2) & (r.l_suppkey != li2.s2),
        "left_semi",
    )
    li3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole = multi.join(
        li3,
        (multi.l_orderkey == li3.o3) & (multi.l_suppkey != li3.s3),
        "left_anti",
    )
    return (
        sole.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            sole.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q121 — incremental aggregate maintenance: the per-customer order
# stats view refreshed by MERGING partial states (base partition's
# stored state + the delta partition's freshly-aggregated state)
# instead of recomputing over all data. The oracle recomputes from
# scratch — equality IS the IVM correctness proof.
# ---------------------------------------------------------------------------

@_register(
    "q121_incremental_agg",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY 1
    """,
    tags=("ivm", "incremental", "state-merge"),
)
def q121_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.incremental import (
        agg_state,
        merge_states,
    )

    _tune(spark)
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", _cents(F.col("o_totalprice")).alias("cents")
    )
    cut = "1999-01-01"
    base = agg_state(
        orders.filter(F.col("o_orderdate") < cut),
        ["o_custkey"], {"total_cents": "cents"},
    )
    delta = agg_state(
        orders.filter(F.col("o_orderdate") >= cut),
        ["o_custkey"], {"total_cents": "cents"},
    )
    return merge_states(base, delta, ["o_custkey"]).select(
        "o_custkey", "n", "total_cents"
    )


# ---------------------------------------------------------------------------
# Q122 — weighted PageRank over the event-type transition graph,
# integer-quantized (micro-rank bigints, floor-div contributions) so
# three unrolled iterations are bit-identical in any engine — double
# summation order never enters the fixpoint path.
# ---------------------------------------------------------------------------

_PR_TELEPORT = "(SELECT (150 * 1000000) // (1000 * n) FROM nn)"

@_register(
    "q122_pagerank_events",
    oracle=f"""
    WITH tr AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                                            event_id) AS prev_type
      FROM events
    ),
    e AS (
      SELECT prev_type AS s, event_type AS d, CAST(COUNT(*) AS BIGINT) AS w
      FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    outd AS (SELECT s, CAST(SUM(w) AS BIGINT) AS o FROM e GROUP BY s),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT s AS node FROM e UNION SELECT d FROM e)),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, CAST((SELECT 1000000 // n FROM nn) AS BIGINT) AS rank
           FROM nodes),
    c1 AS (SELECT e.d AS node,
                  CAST(SUM((r0.rank * e.w) // outd.o) AS BIGINT) AS sc
           FROM e JOIN outd USING (s) JOIN r0 ON r0.node = e.s GROUP BY e.d),
    r1 AS (SELECT nodes.node,
                  CAST({_PR_TELEPORT} + (850 * COALESCE(c1.sc, 0)) // 1000
                       AS BIGINT) AS rank
           FROM nodes LEFT JOIN c1 USING (node)),
    c2 AS (SELECT e.d AS node,
                  CAST(SUM((r1.rank * e.w) // outd.o) AS BIGINT) AS sc
           FROM e JOIN outd USING (s) JOIN r1 ON r1.node = e.s GROUP BY e.d),
    r2 AS (SELECT nodes.node,
                  CAST({_PR_TELEPORT} + (850 * COALESCE(c2.sc, 0)) // 1000
                       AS BIGINT) AS rank
           FROM nodes LEFT JOIN c2 USING (node)),
    c3 AS (SELECT e.d AS node,
                  CAST(SUM((r2.rank * e.w) // outd.o) AS BIGINT) AS sc
           FROM e JOIN outd USING (s) JOIN r2 ON r2.node = e.s GROUP BY e.d),
    r3 AS (SELECT nodes.node,
                  CAST({_PR_TELEPORT} + (850 * COALESCE(c3.sc, 0)) // 1000
                       AS BIGINT) AS rank
           FROM nodes LEFT JOIN c3 USING (node))
    SELECT node, rank FROM r3
    """,
    tags=("pagerank", "graph", "iterative"),
)
def q122_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from us_immigration_data_lake_spark.operators.graph import pagerank_quantized

    _tune(spark)
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id")
    )
    edges = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return pagerank_quantized(edges, "src", "dst", "n", iterations=3).select(
        "node", "rank"
    )


# ---------------------------------------------------------------------------
# Q123 — TF-IDF top-3 terms per document. idf is integer-quantized
# per TERM (micronat bigint, same measured ln-agreement basis as q81)
# so the per-doc score c_dt·idf_e6 and its ranking are exact integer
# arithmetic. Plan: doc-term counts → token-keyed join of the
# doc-frequency census → per-doc window top-k (WindowGroupLimit keeps
# it partial). Both shuffles are keyed; the corpus is never broadcast.
# HONEST PLAN NOTE: census and n_docs derive LOGICALLY from the
# doc-term table but Spark re-scans/re-tokenizes per branch (no
# subplan reuse without materialization) — a production pipeline
# caches or checkpoints the tokenized table first, as
# pipelines/corpus.py does between its stages.
# ---------------------------------------------------------------------------

@_register(
    "q123_tfidf_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    dc AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c_dt
           FROM tok GROUP BY 1, 2),
    df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs_with
           FROM dc GROUP BY 1),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM documents),
    scored AS (
      SELECT dc.doc_id, dc.token,
             dc.c_dt * CAST(ROUND(ln(CAST(nd.n_docs AS DOUBLE)
                                     / CAST(df.n_docs_with AS DOUBLE)) * 1e6)
                            AS BIGINT) AS score
      FROM dc JOIN df USING (token) CROSS JOIN nd
    )
    SELECT doc_id, token, rank, score FROM (
      SELECT doc_id, token, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, token) AS BIGINT)
               AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    tags=("llm", "tfidf", "topk"),
)
def q123_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from us_immigration_data_lake_spark.functions.text import tokens

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )
    dc = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c_dt")
    )
    df_t = dc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_with")
    )
    nd = docs.select(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    scored = dc.join(df_t, "token").crossJoin(F.broadcast(nd)).select(
        "doc_id", "token",
        (
            F.col("c_dt")
            * F.round(
                F.log(
                    F.col("n_docs").cast("double")
                    / F.col("n_docs_with").cast("double")
                )
                * 1e6
            ).cast("long")
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "rank", "score")
    )


# ---------------------------------------------------------------------------
# Q124 — equi-DEPTH histogram via ntile over a fully-specified order
# (value, unique key — rule 6): per-decile row count and exact cent
# bounds. Complements q96's equi-width bins; ntile's extra-row
# distribution (first buckets take the remainder) is identical in
# Spark and DuckDB given the deterministic order.
# Scale note: a window with no PARTITION BY moves ALL rows through a
# single WindowExec partition in Spark (it logs exactly that warning)
# — the global ntile is inherently one task's sort. That is why
# approx_percentile bounds (q78) are the 100 TB default and exact
# equi-depth is reserved for when depth boundaries are contractual.
# ---------------------------------------------------------------------------

@_register(
    "q124_equidepth_histogram",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             NTILE(10) OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                             o_orderkey) AS bucket
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM s GROUP BY 1
    """,
    tags=("histogram", "equi-depth", "ntile"),
)
def q124_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    s = orders.select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("cents")
    ).withColumn(
        "bucket",
        F.ntile(10).over(Window.orderBy(F.col("cents"), F.col("o_orderkey"))),
    )
    return s.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


# ---------------------------------------------------------------------------
# Q125 — winsorized mean per group: clip at the exact p10/p90 order
# statistics (ranks via integer ceil — (n+9)//10, (9n+9)//10 — no
# float rank arithmetic), then average the clipped exact cents. One
# window pass for ranks, a tiny broadcast of per-group bounds, one
# final aggregate.
# ---------------------------------------------------------------------------

@_register(
    "q125_winsorized_mean",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS g,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             l_orderkey AS k1, l_linenumber AS k2
      FROM lineitem
    ),
    r AS (
      SELECT g, v,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, k1, k2) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM s
    ),
    b AS (
      SELECT g,
             CAST(MIN(CASE WHEN rn = (n + 9) // 10 THEN v END) AS BIGINT)
               AS lo,
             CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS BIGINT)
               AS hi
      FROM r GROUP BY g
    )
    SELECT s.g AS l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(b.lo) AS BIGINT) AS lo_cents,
           CAST(MIN(b.hi) AS BIGINT) AS hi_cents,
           CAST(ROUND(CAST(SUM(CASE WHEN s.v < b.lo THEN b.lo
                                    WHEN s.v > b.hi THEN b.hi
                                    ELSE s.v END) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS wmean_cents
    FROM s JOIN b USING (g)
    GROUP BY s.g
    """,
    tags=("winsorize", "robust-stats", "order-stats"),
)
def q125_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("g"),
        _cents(F.col("l_extendedprice")).alias("v"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
    )
    w = Window.partitionBy("g").orderBy("v", "k1", "k2")
    r = s.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    b = r.groupBy("g").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 9) div 10"), F.col("v"))
        ).cast("long").alias("lo"),
        F.min(
            F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("v"))
        ).cast("long").alias("hi"),
    )
    clipped = s.join(F.broadcast(b), "g").select(
        "g", "v", "lo", "hi",
        F.when(F.col("v") < F.col("lo"), F.col("lo"))
        .when(F.col("v") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("v"))
        .alias("cv"),
    )
    return clipped.groupBy(F.col("g").alias("l_returnflag")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("lo").cast("long").alias("lo_cents"),
        F.min("hi").cast("long").alias("hi_cents"),
        F.round(F.sum("cv").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("wmean_cents"),
    )


# ---------------------------------------------------------------------------
# Q126 — Bloom-pruned join: the runtime-filter pattern a 100 TB join
# relies on, made explicit. Build a portable Bloom filter over the
# selective dim subset's keys, prune the fact SIDE-LOCALLY before the
# shuffle (admitted-key broadcast semi-join), then run the exact join
# — false positives die in the exact join, so the result EQUALS the
# plain join (which is the oracle). The pruned shuffle moves only
# ~|matching|·(1+fp) rows instead of the whole fact table.
# ---------------------------------------------------------------------------

@_register(
    "q126_bloom_pruned_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey = 3
    GROUP BY 1, 2
    """,
    tags=("bloom", "runtime-filter", "join-pruning"),
)
def q126_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        bloom_build_bits,
        bloom_probe,
    )

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    dim = supplier.select("s_suppkey", "s_name")
    bits = bloom_build_bits(dim, "s_suppkey", num_hashes=5, num_bits=50_000)
    admitted = bloom_probe(
        bits,
        li.select(F.col("l_suppkey")).distinct(),
        "l_suppkey",
        num_hashes=5,
        num_bits=50_000,
    ).filter(F.col("might_match")).select("l_suppkey")
    pruned = li.join(F.broadcast(admitted), "l_suppkey", "left_semi")
    return (
        pruned.join(
            F.broadcast(dim), pruned.l_suppkey == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias(
                "revenue_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q127 — STREAMING incremental view maintenance: the per-user order
# stats view of q121, maintained by folding each micro-batch's
# partial state into a versioned parquet state store via foreachBatch
# (streaming/sinks.py:incremental_agg_stream). Version N is a pure
# function of (version N-1, batch N) and overwrites itself — replay-
# safe exactly-once without a transactional format. The oracle
# recomputes from all events; equality proves the fold. Multi-batch
# folding + crash-replay idempotency are exercised in
# tests/test_stream_ivm.py (the gate's single-file source yields one
# batch).
# ---------------------------------------------------------------------------

@_register(
    "q127_stream_ivm",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY 1
    """,
    tags=("streaming", "ivm", "foreachBatch", "exactly-once"),
    bench=True,
)
def q127_stream_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from us_immigration_data_lake_spark.sources.events import read_event_stream
    from us_immigration_data_lake_spark.streaming.sinks import (
        incremental_agg_stream,
        read_latest_state,
    )

    _tune(spark)
    stream = read_event_stream(spark, sf_dir).select(
        "user_id", _cents(F.col("value")).alias("cents")
    )
    root = tempfile.mkdtemp(prefix="q127_ivm_")
    state_dir = f"{root}/state"
    incremental_agg_stream(
        stream, ["user_id"], {"sum_cents": "cents"},
        state_dir, f"{root}/ckpt", name=_sink_name("q127_ivm"),
    )
    return read_latest_state(spark, state_dir).select(
        "user_id", "n", "sum_cents"
    )


# ---------------------------------------------------------------------------
# Q128 — sequence pattern matching (MATCH_RECOGNIZE-lite): count
# non-overlapping 'view>click>purchase' runs in each user's fully
# ordered event-type sequence. One groupBy builds the ordered
# sequence via array_sort over (ts, id, type) structs — deterministic
# without a pre-shuffle sort — then a regex count on the joined
# string. Per-user sequences are bounded by per-user event counts;
# for unbounded streams use q91's session windows first.
# ---------------------------------------------------------------------------

@_register(
    "q128_sequence_pattern",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(
                  string_agg(event_type, '>'
                             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                                      event_id),
                  'view>click>purchase')) AS BIGINT) AS n_patterns
    FROM events
    GROUP BY user_id
    """,
    tags=("sequence", "pattern-match", "regex"),
)
def q128_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    ev = load_events(spark, sf_dir)
    seq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros(F.col("ts")).alias("t"),
                            F.col("event_id").alias("e"),
                            F.col("event_type").alias("y"),
                        )
                    )
                ),
                lambda s: s["y"],
            ),
            ">",
        ).alias("seq"),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.size(F.expr("regexp_extract_all(seq, 'view>click>purchase', 0)"))
        .cast("long")
        .alias("n_patterns"),
    )


# ---------------------------------------------------------------------------
# Q129 — declarative constraint suite (audit.py:constraint_report):
# range/domain/positivity violations in one conditional-sum scan plus
# the PK-uniqueness dup-group count (its own keys-only shuffle).
# ---------------------------------------------------------------------------

@_register(
    "q129_constraint_report",
    oracle="""
    SELECT b.n_rows, b.qty_range_viol, b.price_positive_viol,
           b.flag_domain_viol, b.date_range_viol, d.dup_key_groups
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                           THEN 1 ELSE 0 END) AS BIGINT) AS qty_range_viol,
             CAST(SUM(CASE WHEN l_extendedprice <= 0
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS price_positive_viol,
             CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                           THEN 1 ELSE 0 END) AS BIGINT) AS flag_domain_viol,
             CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1992-01-01'
                             OR CAST(l_shipdate AS DATE) > DATE '2002-12-31'
                           THEN 1 ELSE 0 END) AS BIGINT) AS date_range_viol
      FROM lineitem
    ) b
    CROSS JOIN (
      SELECT CAST(COUNT(*) AS BIGINT) AS dup_key_groups FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY 1, 2 HAVING COUNT(*) > 1
      )
    ) d
    """,
    tags=("quality", "constraints", "audit"),
)
def q129_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.audit import constraint_report

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    return constraint_report(
        li,
        {
            "qty_range_viol": (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50),
            "price_positive_viol": F.col("l_extendedprice") <= 0,
            "flag_domain_viol": ~F.col("l_returnflag").isin("A", "N", "R"),
            "date_range_viol": (
                F.to_date("l_shipdate") < F.lit("1992-01-01").cast("date")
            )
            | (F.to_date("l_shipdate") > F.lit("2002-12-31").cast("date")),
        },
        unique_key=["l_orderkey", "l_linenumber"],
    )


# ---------------------------------------------------------------------------
# Q130 — portable KMV distinct sketch (sketches.py:kmv_distinct):
# distinct parts bought per return flag, estimated from the 64
# smallest md5_long hashes — exact integer estimator an external
# engine replays bit-for-bit, with the exact count alongside for the
# error story. WindowGroupLimit keeps the rank-k scan partial.
# ---------------------------------------------------------------------------

@_register(
    "q130_kmv_distinct",
    oracle="""
    WITH dh AS (
      SELECT DISTINCT l_returnflag,
             ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM dh
    ),
    kept AS (SELECT * FROM r WHERE rn <= 64),
    sk AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(MIN(CASE WHEN rn = 64 THEN h END) AS BIGINT) AS kth_hash
      FROM kept GROUP BY 1
    ),
    ex AS (
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
      FROM lineitem GROUP BY 1
    )
    SELECT sk.l_returnflag, sk.kth_hash,
           CAST(CASE WHEN sk.kth_hash IS NULL THEN sk.n_kept
                     ELSE (CAST(63 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
                          // sk.kth_hash END AS BIGINT) AS est_distinct,
           ex.exact_distinct
    FROM sk JOIN ex USING (l_returnflag)
    """,
    tags=("sketch", "kmv", "approx-distinct", "portable"),
)
def q130_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import kmv_distinct

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    sk = kmv_distinct(li, ["l_returnflag"], "l_partkey", k=64)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_distinct")
    )
    return sk.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag", "kth_hash", "est_distinct", "exact_distinct"
    )


# ---------------------------------------------------------------------------
# Q131 — null-safe join semantics (<=>): nullable derived keys where
# NULL must MATCH NULL (Spark eqNullSafe == SQL IS NOT DISTINCT
# FROM), the semantics regular equi-joins silently drop. Null-safe
# equality still hash-partitions both sides (NULL is an ordinary
# bucket), so the plan is a normal shuffle/broadcast hash join, not a
# cartesian fallback — the point of preferring <=> over
# (a = b OR (a IS NULL AND b IS NULL)), which Catalyst can't hash.
# ---------------------------------------------------------------------------

@_register(
    "q131_null_safe_join",
    oracle="""
    WITH c AS (SELECT NULLIF(c_nationkey, 0) AS k FROM customer),
    s AS (SELECT NULLIF(s_nationkey, 0) AS k FROM supplier)
    SELECT COALESCE(CAST(c.k AS VARCHAR), 'NULL') AS key,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY 1
    """,
    tags=("join", "null-safe", "semantics"),
)
def q131_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    customer = _t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("ck")
    )
    supplier = _t(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("sk")
    )
    return (
        customer.join(
            F.broadcast(supplier), F.col("ck").eqNullSafe(F.col("sk"))
        )
        .groupBy(
            F.coalesce(F.col("ck").cast("string"), F.lit("NULL")).alias("key")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Q132 — time-weighted average price (TWAP): each event's value
# weighted by its holding interval (micros until the user's next
# event; the last event carries no interval). Weights and values are
# exact integers (micros × cents summed as decimal(38,0) == HUGEINT),
# one double division at the end. One window pass for lead().
# ---------------------------------------------------------------------------

@_register(
    "q132_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
               AS t_next
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(t_next - t) AS BIGINT) AS total_us,
           CAST(ROUND(CAST(SUM(CAST(v AS HUGEINT) * (t_next - t)) AS DOUBLE)
                      / CAST(SUM(t_next - t) AS DOUBLE)) AS BIGINT)
             AS twap_cents
    FROM s WHERE t_next IS NOT NULL
    GROUP BY user_id
    """,
    tags=("twap", "timeseries", "window"),
)
def q132_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("t"), F.col("event_id"))
    s = ev.select(
        "user_id",
        "event_id",
        _cents(F.col("value")).alias("v"),
        F.unix_micros(F.col("ts")).alias("t"),
    ).withColumn("t_next", F.lead("t").over(w))
    held = s.filter(F.col("t_next").isNotNull()).withColumn(
        "dt", F.col("t_next") - F.col("t")
    )
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dt").cast("long").alias("total_us"),
        F.round(
            # promote BEFORE multiplying (regress.py rule): cents ×
            # micros as raw int64 wraps past ~2^63 (≈6-year gaps at
            # 49k-cent values); decimal×long mirrors HUGEINT×BIGINT
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("dt")).cast("double")
            / F.sum("dt").cast("double")
        )
        .cast("long")
        .alias("twap_cents"),
    )


# ---------------------------------------------------------------------------
# Q133 — gaps & islands: runs of CONSECUTIVE active days per user via
# the classic date-minus-row_number anchor (consecutive days share an
# anchor; any gap starts a new island). Two aggregates over the
# deduped (user, day) presence — the window and both groupBys all
# partition on user_id, one logical shuffle under AQE.
# ---------------------------------------------------------------------------

@_register(
    "q133_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    anchored AS (
      SELECT user_id, d,
             d - INTERVAL (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d))
                 DAY AS anchor
      FROM days
    ),
    islands AS (
      SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
      FROM anchored GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM islands GROUP BY user_id
    """,
    tags=("gaps-islands", "streaks", "window"),
)
def q133_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    ev = load_events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("len").cast("long").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# Q134 — revenue-share threshold (TPC-H Q11 shape): parts whose
# revenue exceeds 0.07% of global revenue, as the EXACT integer
# inequality rev·10000 > 7·total (no fraction-of-total double). The
# global total is a one-row broadcast onto the per-part aggregate —
# the scalar-subquery plan at any scale.
# ---------------------------------------------------------------------------

@_register(
    "q134_revenue_share_threshold",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM lineitem GROUP BY 1
    ),
    g AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM pr)
    SELECT pr.l_partkey, pr.rev
    FROM pr, g WHERE pr.rev * 10000 > 7 * g.total
    """,
    tags=("tpch-q11", "scalar-subquery", "share"),
)
def q134_revenue_share_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("rev")
    )
    g = pr.agg(F.sum("rev").cast("long").alias("total"))
    return (
        pr.crossJoin(F.broadcast(g))
        .filter(F.col("rev") * 10000 > 7 * F.col("total"))
        .select("l_partkey", "rev")
    )


# ---------------------------------------------------------------------------
# Q135 — top supplier by revenue (TPC-H Q15 shape): the revenue view
# joined against its own scalar MAX — ties all surface (no arbitrary
# LIMIT 1), which is the Q15 semantic. Two passes over the small
# aggregated view, never the fact.
# ---------------------------------------------------------------------------

@_register(
    "q135_top_supplier",
    oracle="""
    WITH sr AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, sr.rev
    FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
    WHERE sr.rev = (SELECT MAX(rev) FROM sr)
    """,
    tags=("tpch-q15", "scalar-subquery", "argmax"),
)
def q135_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    sr = li.groupBy("l_suppkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).cast("long").alias("rev")
    )
    mx = sr.agg(F.max("rev").alias("mx"))
    return (
        sr.crossJoin(F.broadcast(mx))
        .filter(F.col("rev") == F.col("mx"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "rev")
    )


# ---------------------------------------------------------------------------
# Q136 — higher-order array functions (aggregate / filter / exists /
# transform) over the embedding vectors: L2/L1 norms as left-fold
# double chains (same association in both engines — the DuckDB mirror
# unrolls the fold literally, as q24 does for dot products), positive
# count and max element. All map-side expressions; no UDF, no explode.
# ---------------------------------------------------------------------------

@_register(
    "q136_higher_order_fns",
    oracle="""
    WITH base AS (SELECT vec_id, embedding AS v FROM embeddings)
    SELECT vec_id,
           CAST(ROUND((CAST(v[1] AS DOUBLE)*CAST(v[1] AS DOUBLE) + CAST(v[2] AS DOUBLE)*CAST(v[2] AS DOUBLE) + CAST(v[3] AS DOUBLE)*CAST(v[3] AS DOUBLE) + CAST(v[4] AS DOUBLE)*CAST(v[4] AS DOUBLE) + CAST(v[5] AS DOUBLE)*CAST(v[5] AS DOUBLE) + CAST(v[6] AS DOUBLE)*CAST(v[6] AS DOUBLE) + CAST(v[7] AS DOUBLE)*CAST(v[7] AS DOUBLE) + CAST(v[8] AS DOUBLE)*CAST(v[8] AS DOUBLE) + CAST(v[9] AS DOUBLE)*CAST(v[9] AS DOUBLE) + CAST(v[10] AS DOUBLE)*CAST(v[10] AS DOUBLE) + CAST(v[11] AS DOUBLE)*CAST(v[11] AS DOUBLE) + CAST(v[12] AS DOUBLE)*CAST(v[12] AS DOUBLE) + CAST(v[13] AS DOUBLE)*CAST(v[13] AS DOUBLE) + CAST(v[14] AS DOUBLE)*CAST(v[14] AS DOUBLE) + CAST(v[15] AS DOUBLE)*CAST(v[15] AS DOUBLE) + CAST(v[16] AS DOUBLE)*CAST(v[16] AS DOUBLE) + CAST(v[17] AS DOUBLE)*CAST(v[17] AS DOUBLE) + CAST(v[18] AS DOUBLE)*CAST(v[18] AS DOUBLE) + CAST(v[19] AS DOUBLE)*CAST(v[19] AS DOUBLE) + CAST(v[20] AS DOUBLE)*CAST(v[20] AS DOUBLE) + CAST(v[21] AS DOUBLE)*CAST(v[21] AS DOUBLE) + CAST(v[22] AS DOUBLE)*CAST(v[22] AS DOUBLE) + CAST(v[23] AS DOUBLE)*CAST(v[23] AS DOUBLE) + CAST(v[24] AS DOUBLE)*CAST(v[24] AS DOUBLE) + CAST(v[25] AS DOUBLE)*CAST(v[25] AS DOUBLE) + CAST(v[26] AS DOUBLE)*CAST(v[26] AS DOUBLE) + CAST(v[27] AS DOUBLE)*CAST(v[27] AS DOUBLE) + CAST(v[28] AS DOUBLE)*CAST(v[28] AS DOUBLE) + CAST(v[29] AS DOUBLE)*CAST(v[29] AS DOUBLE) + CAST(v[30] AS DOUBLE)*CAST(v[30] AS DOUBLE) + CAST(v[31] AS DOUBLE)*CAST(v[31] AS DOUBLE) + CAST(v[32] AS DOUBLE)*CAST(v[32] AS DOUBLE) + CAST(v[33] AS DOUBLE)*CAST(v[33] AS DOUBLE) + CAST(v[34] AS DOUBLE)*CAST(v[34] AS DOUBLE) + CAST(v[35] AS DOUBLE)*CAST(v[35] AS DOUBLE) + CAST(v[36] AS DOUBLE)*CAST(v[36] AS DOUBLE) + CAST(v[37] AS DOUBLE)*CAST(v[37] AS DOUBLE) + CAST(v[38] AS DOUBLE)*CAST(v[38] AS DOUBLE) + CAST(v[39] AS DOUBLE)*CAST(v[39] AS DOUBLE) + CAST(v[40] AS DOUBLE)*CAST(v[40] AS DOUBLE) + CAST(v[41] AS DOUBLE)*CAST(v[41] AS DOUBLE) + CAST(v[42] AS DOUBLE)*CAST(v[42] AS DOUBLE) + CAST(v[43] AS DOUBLE)*CAST(v[43] AS DOUBLE) + CAST(v[44] AS DOUBLE)*CAST(v[44] AS DOUBLE) + CAST(v[45] AS DOUBLE)*CAST(v[45] AS DOUBLE) + CAST(v[46] AS DOUBLE)*CAST(v[46] AS DOUBLE) + CAST(v[47] AS DOUBLE)*CAST(v[47] AS DOUBLE) + CAST(v[48] AS DOUBLE)*CAST(v[48] AS DOUBLE) + CAST(v[49] AS DOUBLE)*CAST(v[49] AS DOUBLE) + CAST(v[50] AS DOUBLE)*CAST(v[50] AS DOUBLE) + CAST(v[51] AS DOUBLE)*CAST(v[51] AS DOUBLE) + CAST(v[52] AS DOUBLE)*CAST(v[52] AS DOUBLE) + CAST(v[53] AS DOUBLE)*CAST(v[53] AS DOUBLE) + CAST(v[54] AS DOUBLE)*CAST(v[54] AS DOUBLE) + CAST(v[55] AS DOUBLE)*CAST(v[55] AS DOUBLE) + CAST(v[56] AS DOUBLE)*CAST(v[56] AS DOUBLE) + CAST(v[57] AS DOUBLE)*CAST(v[57] AS DOUBLE) + CAST(v[58] AS DOUBLE)*CAST(v[58] AS DOUBLE) + CAST(v[59] AS DOUBLE)*CAST(v[59] AS DOUBLE) + CAST(v[60] AS DOUBLE)*CAST(v[60] AS DOUBLE) + CAST(v[61] AS DOUBLE)*CAST(v[61] AS DOUBLE) + CAST(v[62] AS DOUBLE)*CAST(v[62] AS DOUBLE) + CAST(v[63] AS DOUBLE)*CAST(v[63] AS DOUBLE) + CAST(v[64] AS DOUBLE)*CAST(v[64] AS DOUBLE)) * 1e6) AS BIGINT) AS l2sq_e6,
           CAST(ROUND((abs(CAST(v[1] AS DOUBLE)) + abs(CAST(v[2] AS DOUBLE)) + abs(CAST(v[3] AS DOUBLE)) + abs(CAST(v[4] AS DOUBLE)) + abs(CAST(v[5] AS DOUBLE)) + abs(CAST(v[6] AS DOUBLE)) + abs(CAST(v[7] AS DOUBLE)) + abs(CAST(v[8] AS DOUBLE)) + abs(CAST(v[9] AS DOUBLE)) + abs(CAST(v[10] AS DOUBLE)) + abs(CAST(v[11] AS DOUBLE)) + abs(CAST(v[12] AS DOUBLE)) + abs(CAST(v[13] AS DOUBLE)) + abs(CAST(v[14] AS DOUBLE)) + abs(CAST(v[15] AS DOUBLE)) + abs(CAST(v[16] AS DOUBLE)) + abs(CAST(v[17] AS DOUBLE)) + abs(CAST(v[18] AS DOUBLE)) + abs(CAST(v[19] AS DOUBLE)) + abs(CAST(v[20] AS DOUBLE)) + abs(CAST(v[21] AS DOUBLE)) + abs(CAST(v[22] AS DOUBLE)) + abs(CAST(v[23] AS DOUBLE)) + abs(CAST(v[24] AS DOUBLE)) + abs(CAST(v[25] AS DOUBLE)) + abs(CAST(v[26] AS DOUBLE)) + abs(CAST(v[27] AS DOUBLE)) + abs(CAST(v[28] AS DOUBLE)) + abs(CAST(v[29] AS DOUBLE)) + abs(CAST(v[30] AS DOUBLE)) + abs(CAST(v[31] AS DOUBLE)) + abs(CAST(v[32] AS DOUBLE)) + abs(CAST(v[33] AS DOUBLE)) + abs(CAST(v[34] AS DOUBLE)) + abs(CAST(v[35] AS DOUBLE)) + abs(CAST(v[36] AS DOUBLE)) + abs(CAST(v[37] AS DOUBLE)) + abs(CAST(v[38] AS DOUBLE)) + abs(CAST(v[39] AS DOUBLE)) + abs(CAST(v[40] AS DOUBLE)) + abs(CAST(v[41] AS DOUBLE)) + abs(CAST(v[42] AS DOUBLE)) + abs(CAST(v[43] AS DOUBLE)) + abs(CAST(v[44] AS DOUBLE)) + abs(CAST(v[45] AS DOUBLE)) + abs(CAST(v[46] AS DOUBLE)) + abs(CAST(v[47] AS DOUBLE)) + abs(CAST(v[48] AS DOUBLE)) + abs(CAST(v[49] AS DOUBLE)) + abs(CAST(v[50] AS DOUBLE)) + abs(CAST(v[51] AS DOUBLE)) + abs(CAST(v[52] AS DOUBLE)) + abs(CAST(v[53] AS DOUBLE)) + abs(CAST(v[54] AS DOUBLE)) + abs(CAST(v[55] AS DOUBLE)) + abs(CAST(v[56] AS DOUBLE)) + abs(CAST(v[57] AS DOUBLE)) + abs(CAST(v[58] AS DOUBLE)) + abs(CAST(v[59] AS DOUBLE)) + abs(CAST(v[60] AS DOUBLE)) + abs(CAST(v[61] AS DOUBLE)) + abs(CAST(v[62] AS DOUBLE)) + abs(CAST(v[63] AS DOUBLE)) + abs(CAST(v[64] AS DOUBLE))) * 1e6) AS BIGINT) AS l1_e6,
           CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(list_max(v) AS DOUBLE) * 1e6) AS BIGINT) AS max_e6
    FROM base
    """,
    tags=("array", "higher-order", "functions"),
)
def q136_higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    zero = F.lit(0.0)
    l2sq = F.aggregate(v, zero, lambda acc, x: acc + x * x)
    l1 = F.aggregate(v, zero, lambda acc, x: acc + F.abs(x))
    return emb.select(
        "vec_id",
        F.round(l2sq * 1e6).cast("long").alias("l2sq_e6"),
        F.round(l1 * 1e6).cast("long").alias("l1_e6"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0))
        .cast("long")
        .alias("n_pos"),
        F.round(F.array_max(v) * 1e6).cast("long").alias("max_e6"),
    )


# ---------------------------------------------------------------------------
# Q137 — cross-table reconciliation: the order header's stated total
# vs the total derived from its lines, with mismatches bucketed by
# integer-permille relative error. One fact aggregate + one equi-join
# on the order key; diffs are exact cents, the permille bucketing is
# integer arithmetic (|diff|·1000 vs header total).
# ---------------------------------------------------------------------------

@_register(
    "q137_order_reconciliation",
    oracle="""
    WITH ls AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS line_cents
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS header_cents,
             COALESCE(ls.line_cents, 0) AS line_cents
      FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN line_cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lineless,
           CAST(SUM(CASE WHEN abs(header_cents - line_cents) * 1000
                              > header_cents THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatch_over_permille,
           CAST(MAX(abs(header_cents - line_cents)) AS BIGINT)
             AS max_abs_diff_cents
    FROM j
    """,
    tags=("reconciliation", "integrity", "join"),
)
def q137_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    ls = li.groupBy("l_orderkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("line_cents")
    )
    j = orders.select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("header_cents")
    ).join(
        ls.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left"
    ).select(
        "o_orderkey",
        "header_cents",
        F.coalesce("line_cents", F.lit(0)).alias("line_cents"),
    )
    diff = F.abs(F.col("header_cents") - F.col("line_cents"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum((F.col("line_cents") == 0).cast("long")).cast("long").alias(
            "n_lineless"
        ),
        F.sum((diff * 1000 > F.col("header_cents")).cast("long"))
        .cast("long")
        .alias("n_mismatch_over_permille"),
        F.max(diff).cast("long").alias("max_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# Q138 — per-group mode (most frequent value) with a deterministic
# tie-break: counts → min(struct(-cnt, value)) partial-agg argmax —
# the q93 pattern specialized to frequency, no window sort over the
# count table.
# ---------------------------------------------------------------------------

@_register(
    "q138_group_mode",
    oracle="""
    WITH c AS (
      SELECT c.c_nationkey, o.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_nationkey,
           CAST(min({'negc': -cnt, 'v': o_orderpriority}).negc * -1 AS BIGINT)
             AS mode_count,
           min({'negc': -cnt, 'v': o_orderpriority}).v AS mode_priority
    FROM c GROUP BY c_nationkey
    """,
    tags=("mode", "argmax", "agg"),
)
def q138_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    c = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pick = F.min(
        F.struct(
            (-F.col("cnt")).alias("negc"), F.col("o_orderpriority").alias("v")
        )
    )
    return c.groupBy("c_nationkey").agg(
        (pick.getField("negc") * -1).cast("long").alias("mode_count"),
        pick.getField("v").alias("mode_priority"),
    )


# ---------------------------------------------------------------------------
# Q139 — time since last error: per event, microseconds since the
# user's most recent STRICTLY EARLIER 'error' event (NULL before the
# first error). One window with an explicit
# (unbounded preceding, 1 preceding) row frame — the running-state
# lookup expressed declaratively, no self-join.
# ---------------------------------------------------------------------------

@_register(
    "q139_time_since_error",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    )
    SELECT event_id, user_id,
           CAST(t - MAX(CASE WHEN event_type = 'error' THEN t END)
                    OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS us_since_error
    FROM s
    """,
    tags=("window", "frames", "running-state"),
)
def q139_time_since_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    ev = load_events(spark, sf_dir)
    s = ev.select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_err = F.max(
        F.when(F.col("event_type") == "error", F.col("t"))
    ).over(w)
    return s.select(
        "event_id", "user_id",
        (F.col("t") - last_err).cast("long").alias("us_since_error"),
    )


# ---------------------------------------------------------------------------
# Q140 — maximum drawdown per user: peak-to-trough fall of the
# event-value series via a running max (cumulative row frame), all
# exact cents. The classic sequential-state metric expressed as one
# window + one aggregate — no iteration, no UDF.
# ---------------------------------------------------------------------------

@_register(
    "q140_max_drawdown",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ),
    r AS (
      SELECT user_id, v,
             MAX(v) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM s
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(peak - v) AS BIGINT) AS max_drawdown_cents
    FROM r GROUP BY user_id
    """,
    tags=("drawdown", "running-max", "window"),
)
def q140_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    ev = load_events(spark, sf_dir)
    s = ev.select(
        "user_id", "event_id",
        _cents(F.col("value")).alias("v"),
        F.unix_micros(F.col("ts")).alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = s.withColumn("peak", F.max("v").over(w))
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.col("peak") - F.col("v")).cast("long").alias(
            "max_drawdown_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Q141 — portable count-min frequency sketch (sketches.py:
# countmin_build/countmin_query): per-partkey order-line frequency
# estimated from a 4×2048-cell sketch, exact count alongside. The
# md5-seeded cells are engine-portable, so the oracle rebuilds the
# SAME sketch and replays the same MIN-over-rows estimates — the gate
# checks the estimator itself, not just its bound. never_under is the
# CM guarantee (estimate ≥ truth), true for every row by construction.
# Scale: build is explode(×4)+groupBy (≤ 8192 cells regardless of
# input size); probe broadcasts the sketch — the fact side never
# shuffles.
# ---------------------------------------------------------------------------

@_register(
    "q141_countmin_freq",
    oracle="""
    WITH keys AS (
      SELECT l_partkey AS k FROM lineitem WHERE l_partkey IS NOT NULL
    ),
    rows4 AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(r)),
    cells AS (
      SELECT r,
             ('0x' || substr(md5(r::VARCHAR || '|' || k::VARCHAR), 1, 15))::BIGINT
               % 2048 AS bucket
      FROM keys CROSS JOIN rows4
    ),
    sk AS (
      SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ),
    probe AS (
      SELECT DISTINCT l_partkey AS k FROM lineitem
      WHERE l_partkey % 97 = 0
    ),
    pcells AS (
      SELECT k, r,
             ('0x' || substr(md5(r::VARCHAR || '|' || k::VARCHAR), 1, 15))::BIGINT
               % 2048 AS bucket
      FROM probe CROSS JOIN rows4
    ),
    est AS (
      SELECT k, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est_count
      FROM pcells LEFT JOIN sk USING (r, bucket) GROUP BY k
    ),
    exact AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1
    )
    SELECT est.k AS l_partkey, est.est_count, exact.exact_count,
           est.est_count >= exact.exact_count AS never_under
    FROM est JOIN exact USING (k)
    """,
    tags=("sketch", "count-min", "frequency", "portable"),
)
def q141_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        countmin_build,
        countmin_query,
    )

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    sketch = countmin_build(li, "l_partkey", depth=4, width=2048)
    probe = (
        li.select("l_partkey")
        .filter((F.col("l_partkey") % 97) == 0)
        .distinct()
    )
    est = countmin_query(sketch, probe, "l_partkey", depth=4, width=2048)
    exact = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return est.join(exact, "l_partkey").select(
        "l_partkey",
        "est_count",
        "exact_count",
        (F.col("est_count") >= F.col("exact_count")).alias("never_under"),
    )


# ---------------------------------------------------------------------------
# Q142 — KMV set-similarity from sketch STATE alone (sketches.py:
# kmv_hashes/kmv_union/kmv_jaccard): Jaccard between the part-key
# sets of returned ('R') vs accepted ('A') lines per linestatus,
# estimated purely from the two 64-hash KMV states — no rescan of the
# data at compare time, the property that lets a catalog keep one
# tiny sketch per partition and answer cross-partition overlap
# questions later. Exact Jaccard joined alongside for the error
# story. Oracle replays hashes, ranks, union re-rank, and the
# membership intersection bit-for-bit.
# ---------------------------------------------------------------------------

@_register(
    "q142_kmv_jaccard",
    oracle="""
    WITH ha AS (
      SELECT DISTINCT l_linestatus,
             ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
      FROM lineitem WHERE l_returnflag = 'A' AND l_partkey IS NOT NULL
    ),
    ka AS (
      SELECT l_linestatus, h FROM (
        SELECT l_linestatus, h,
               ROW_NUMBER() OVER (PARTITION BY l_linestatus ORDER BY h) AS rn
        FROM ha
      ) WHERE rn <= 64
    ),
    hb AS (
      SELECT DISTINCT l_linestatus,
             ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
      FROM lineitem WHERE l_returnflag = 'R' AND l_partkey IS NOT NULL
    ),
    kb AS (
      SELECT l_linestatus, h FROM (
        SELECT l_linestatus, h,
               ROW_NUMBER() OVER (PARTITION BY l_linestatus ORDER BY h) AS rn
        FROM hb
      ) WHERE rn <= 64
    ),
    u AS (SELECT l_linestatus, h FROM ka UNION SELECT l_linestatus, h FROM kb),
    uk AS (
      SELECT l_linestatus, h FROM (
        SELECT l_linestatus, h,
               ROW_NUMBER() OVER (PARTITION BY l_linestatus ORDER BY h) AS rn
        FROM u
      ) WHERE rn <= 64
    ),
    bth AS (
      SELECT uk.l_linestatus, uk.h FROM uk
      WHERE EXISTS (SELECT 1 FROM ka
                    WHERE ka.l_linestatus = uk.l_linestatus AND ka.h = uk.h)
        AND EXISTS (SELECT 1 FROM kb
                    WHERE kb.l_linestatus = uk.l_linestatus AND kb.h = uk.h)
    ),
    nu AS (
      SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_union_kept
      FROM uk GROUP BY 1
    ),
    nb AS (
      SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_both
      FROM bth GROUP BY 1
    ),
    ex AS (
      SELECT COALESCE(a.l_linestatus, b.l_linestatus) AS l_linestatus,
             CAST((COUNT(*) FILTER (WHERE a.pk IS NOT NULL
                                      AND b.pk IS NOT NULL)) * 1000
                  // COUNT(*) AS BIGINT) AS exact_permille
      FROM (SELECT DISTINCT l_linestatus, l_partkey AS pk FROM lineitem
            WHERE l_returnflag = 'A' AND l_partkey IS NOT NULL) a
      FULL JOIN (SELECT DISTINCT l_linestatus, l_partkey AS pk FROM lineitem
                 WHERE l_returnflag = 'R' AND l_partkey IS NOT NULL) b
        USING (l_linestatus, pk)
      GROUP BY 1
    )
    SELECT nu.l_linestatus, nu.n_union_kept,
           COALESCE(nb.n_both, 0) AS n_both,
           CAST((COALESCE(nb.n_both, 0) * 1000) // nu.n_union_kept AS BIGINT)
             AS jaccard_permille,
           ex.exact_permille
    FROM nu
    LEFT JOIN nb USING (l_linestatus)
    JOIN ex USING (l_linestatus)
    """,
    tags=("sketch", "kmv", "jaccard", "portable"),
)
def q142_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        kmv_hashes,
        kmv_jaccard,
    )

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    sk_a = kmv_hashes(
        li.filter(F.col("l_returnflag") == "A"), ["l_linestatus"], "l_partkey", k=64
    )
    sk_b = kmv_hashes(
        li.filter(F.col("l_returnflag") == "R"), ["l_linestatus"], "l_partkey", k=64
    )
    est = kmv_jaccard(sk_a, sk_b, ["l_linestatus"], k=64)
    a_keys = (
        li.filter((F.col("l_returnflag") == "A") & F.col("l_partkey").isNotNull())
        .select("l_linestatus", F.col("l_partkey").alias("pk"))
        .distinct()
        .withColumn("in_a", F.lit(1))
    )
    b_keys = (
        li.filter((F.col("l_returnflag") == "R") & F.col("l_partkey").isNotNull())
        .select("l_linestatus", F.col("l_partkey").alias("pk"))
        .distinct()
        .withColumn("in_b", F.lit(1))
    )
    ex = (
        a_keys.join(b_keys, ["l_linestatus", "pk"], "full")
        .groupBy("l_linestatus")
        .agg(
            F.expr(
                "CAST((sum(CASE WHEN in_a IS NOT NULL AND in_b IS NOT NULL"
                " THEN 1 ELSE 0 END) * 1000) div count(*) AS BIGINT)"
            ).alias("exact_permille")
        )
    )
    return est.join(F.broadcast(ex), "l_linestatus").select(
        "l_linestatus", "n_union_kept", "n_both", "jaccard_permille",
        "exact_permille",
    )


# ---------------------------------------------------------------------------
# Q143 — two-nation trade volume (TPC-H Q7 shape): revenue shipped
# between supplier-nation and customer-nation pairs by ship year.
# Scale: both dim chains (supplier→nation, customer→nation) are
# pre-FILTERED to the two nations before touching facts — ~8% of
# suppliers/customers survive, comfortably broadcastable even at
# 100 TB — so the only big-big operation is the lineitem⋈orders
# equi-join; the pair predicate (n1≠n2) runs map-side after the
# broadcasts. Exact cents throughout (rules header).
# ---------------------------------------------------------------------------

@_register(
    "q143_nation_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
      AND CAST(l.l_shipdate AS DATE) BETWEEN DATE '1995-01-01'
                                         AND DATE '1996-12-31'
    GROUP BY 1, 2, 3
    """,
    tags=("tpch-q7", "multi-join", "broadcast"),
)
def q143_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date").between("1995-01-01", "1996-12-31")
    )
    orders = _t(spark, sf_dir, "orders")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).cast("long").alias("l_year"),
        )
        .agg(
            F.sum(rev).cast("long").alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q144 — national market share (TPC-H Q8 shape): NATION_3 suppliers'
# share of STANDARD-part revenue sold into ASIA customers, per order
# year. Share is an exact integer permille of two exact-cent sums —
# no double division crosses the compare boundary. Scale: part is
# pre-filtered on p_type (selective, broadcast); the customer→
# nation→region chain collapses to a broadcast of ASIA custkeys; the
# supplier-nation flag rides along as a 0/1 from a broadcast join, so
# the share needs no second pass over facts.
# ---------------------------------------------------------------------------

@_register(
    "q144_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS rev_c,
             CASE WHEN ns.n_name = 'NATION_3' THEN 1 ELSE 0 END AS is_nat
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(rev_c) AS BIGINT) AS total_c,
           CAST(SUM(CASE WHEN is_nat = 1 THEN rev_c ELSE 0 END) AS BIGINT)
             AS nation_c,
           CAST((SUM(CASE WHEN is_nat = 1 THEN rev_c ELSE 0 END) * 1000)
                // SUM(rev_c) AS BIGINT) AS share_permille
    FROM vol GROUP BY o_year
    """,
    tags=("tpch-q8", "market-share", "multi-join", "broadcast"),
)
def q144_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            (F.col("n_name") == "NATION_3").cast("int").alias("is_nat"),
        )
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year"),
            rev.alias("rev_c"),
            "is_nat",
        )
    )
    return vol.groupBy("o_year").agg(
        F.sum("rev_c").cast("long").alias("total_c"),
        F.sum(F.when(F.col("is_nat") == 1, F.col("rev_c")).otherwise(0))
        .cast("long")
        .alias("nation_c"),
        F.expr(
            "CAST((sum(CASE WHEN is_nat = 1 THEN rev_c ELSE 0 END) * 1000)"
            " div sum(rev_c) AS BIGINT)"
        ).alias("share_permille"),
    )


# ---------------------------------------------------------------------------
# Q145 — order-priority check (TPC-H Q4 shape): orders from one
# quarter having AT LEAST ONE late line (shipped >60 days after the
# order date), counted by priority. The correlated EXISTS compiles to
# a LEFT SEMI hash join on o_orderkey with the date comparison as a
# residual join predicate — one shuffle, no fan-out (semi stops at
# first match, the reason this beats join+distinct). The quarter
# filter is pushed to the orders scan before the join.
# ---------------------------------------------------------------------------

@_register(
    "q145_priority_check",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE)
              > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch-q4", "exists", "semi-join", "residual-predicate"),
)
def q145_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 60)
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q146 — customer order-count distribution (TPC-H Q13 shape): how
# many customers placed exactly N orders, INCLUDING the zero-order
# customers a plain groupBy(orders) would silently drop — the left
# outer join is the point of the shape. Two-level aggregation: the
# first groups |customers| keys, the second collapses to |distinct
# counts| rows (tiny), so the expensive shuffle happens exactly once.
# ---------------------------------------------------------------------------

@_register(
    "q146_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    tags=("tpch-q13", "left-outer", "count-of-counts"),
)
def q146_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q147 — heavy hitters via count-min candidates (sketches.py):
# part keys appearing on ≥45 lines, found sketch-first: estimate every
# distinct key against the broadcast 4×65536-cell sketch, keep keys
# whose estimate clears the threshold (count-min never undercounts →
# NO false negatives), then exact-count only the candidate rows and
# re-apply the threshold to kill the collision false positives. The
# ORACLE is the plain GROUP BY … HAVING spec — deliberately not a
# sketch replay — so the gate proves the two-phase algorithm returns
# exactly the true heavy-hitter set. Scale: the sketch is ≤256k cells
# whatever the input; the exact pass aggregates only candidate-key
# rows (the skewed tail), not the full key space.
# ---------------------------------------------------------------------------

@_register(
    "q147_heavy_hitters",
    oracle="""
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_partkey IS NOT NULL
    GROUP BY l_partkey
    HAVING COUNT(*) >= 45
    """,
    tags=("sketch", "count-min", "heavy-hitters", "two-phase"),
)
def q147_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        countmin_build,
        countmin_query,
    )

    _tune(spark)
    threshold = 45
    li = _t(spark, sf_dir, "lineitem")
    sketch = countmin_build(li, "l_partkey", depth=4, width=65536)
    keys = li.select("l_partkey").filter(F.col("l_partkey").isNotNull()).distinct()
    cand = countmin_query(sketch, keys, "l_partkey", depth=4, width=65536).filter(
        F.col("est_count") >= threshold
    )
    return (
        li.join(F.broadcast(cand.select("l_partkey")), "l_partkey", "left_semi")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
        .filter(F.col("n_lines") >= threshold)
    )


# ---------------------------------------------------------------------------
# Q148 — min-price supplier per part (TPC-H Q2 shape, adapted: no
# partsupp table exists, so the part↔supplier offer relation is
# derived from lineitem and "cost" is the observed unit price).
# The correlated scalar-MIN subquery becomes a window MIN over
# p_partkey — one shuffle on the (already small) offers relation.
# Scale: region/nation/supplier collapse to a broadcast before facts;
# part is pre-filtered (selective class) and broadcast; lineitem is
# the only big input and both filters reach its scan. Unit price is
# one double division of identical operands in both engines, then
# cents-rounded per row (rules header) before any aggregation.
# ---------------------------------------------------------------------------

@_register(
    "q148_min_price_supplier",
    oracle="""
    WITH eur_supp AS (
      SELECT s.s_suppkey, s.s_name, n.n_name,
             CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS acctbal_c
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    ), offers AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(CAST(ROUND(l.l_extendedprice / l.l_quantity * 100)
                      AS BIGINT)) AS unit_c
      FROM lineitem l
      JOIN eur_supp es ON l.l_suppkey = es.s_suppkey
      JOIN part p ON l.l_partkey = p.p_partkey
                 AND p.p_type = 'LARGE' AND p.p_size <= 10
      GROUP BY 1, 2
    ), best AS (
      SELECT o.*, MIN(o.unit_c) OVER (PARTITION BY o.l_partkey) AS best_c
      FROM offers o
    )
    SELECT p.p_partkey, p.p_brand, es.s_name, es.n_name, es.acctbal_c,
           b.unit_c AS min_unit_c
    FROM best b
    JOIN part p ON b.l_partkey = p.p_partkey
    JOIN eur_supp es ON b.l_suppkey = es.s_suppkey
    WHERE b.unit_c = b.best_c
    """,
    tags=("tpch-q2", "correlated-min", "window", "broadcast"),
)
def q148_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    _tune(spark)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            _cents(F.col("s_acctbal")).alias("acctbal_c"),
        )
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    li = _t(spark, sf_dir, "lineitem")
    unit_c = F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast(
        "long"
    )
    offers = (
        li.join(
            F.broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_c).alias("unit_c"))
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("best_c", F.min("unit_c").over(w)).filter(
        F.col("unit_c") == F.col("best_c")
    )
    return (
        best.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(eur_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            "acctbal_c",
            F.col("unit_c").alias("min_unit_c"),
        )
    )


# ---------------------------------------------------------------------------
# Q149 — forecast revenue change (TPC-H Q6 shape): the pure
# filter-and-aggregate query — no join, no group keys. All three
# predicates and the 3-column projection reach the parquet scan
# (min/max row-group pruning takes the year predicate); a single
# partial+final agg returns one row. The canonical scan-throughput
# probe at 100 TB.
# ---------------------------------------------------------------------------

@_register(
    "q149_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
                AS BIGINT) AS forecast_revenue_c,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                       AND DATE '1996-12-31'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("tpch-q6", "scan-agg", "pushdown"),
)
def q149_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").cast("date").between("1996-01-01", "1996-12-31")
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("long")
            .alias("forecast_revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q150 — returned-item report (TPC-H Q10 shape): top-20 customers by
# revenue lost to returns in one quarter. Scale: the quarter filter
# prunes orders at the scan; the R-flag filter prunes lineitem; the
# big-big orders⋈lineitem shuffles once on orderkey, re-aggregates on
# custkey (second, smaller shuffle), and only then joins the customer
# dim — facts never carry customer payload columns through a shuffle.
# Deterministic LIMIT: ties broken by c_custkey (rules header).
# ---------------------------------------------------------------------------

@_register(
    "q150_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
           agg.revenue_c
    FROM (
      SELECT o.o_custkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS revenue_c
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
                                            AND DATE '1996-03-31'
        AND l.l_returnflag = 'R'
      GROUP BY 1
    ) agg
    JOIN customer c ON agg.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY agg.revenue_c DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("tpch-q10", "top-k", "two-phase-agg"),
)
def q150_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date").between("1996-01-01", "1996-03-31")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("long")
            .alias("revenue_c")
        )
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        agg.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            _cents(F.col("c_acctbal")).alias("acctbal_c"),
            "revenue_c",
        )
        .orderBy(F.col("revenue_c").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q151 — promotion revenue share (TPC-H Q14 shape): what permille of
# one ship-month's revenue came from PROMO parts. The share is an
# exact integer division of two exact-cent sums — no double crosses
# the compare boundary (rules header). Scale: month filter prunes
# lineitem row groups; part is broadcast; single partial+final agg.
# ---------------------------------------------------------------------------

@_register(
    "q151_promo_revenue",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN rev_c ELSE 0 END)
                AS BIGINT) AS promo_c,
           CAST(SUM(rev_c) AS BIGINT) AS total_c,
           CAST((SUM(CASE WHEN p.p_type = 'PROMO' THEN rev_c ELSE 0 END)
                 * 1000) // SUM(rev_c) AS BIGINT) AS promo_permille
    FROM (
      SELECT l_partkey,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS rev_c
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-09-01'
                                         AND DATE '1996-09-30'
    ) l
    JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tags=("tpch-q14", "conditional-agg", "broadcast"),
)
def q151_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date").between("1996-09-01", "1996-09-30")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.select(
        "l_partkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c"),
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(0))
    return joined.agg(
        promo.cast("long").alias("promo_c"),
        F.sum("rev_c").cast("long").alias("total_c"),
        F.expr(
            "CAST((sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) * 1000)"
            " div sum(rev_c) AS BIGINT)"
        ).alias("promo_permille"),
    )


# ---------------------------------------------------------------------------
# Q152 — supplier diversity per part class (TPC-H Q16 shape, adapted:
# the part↔supplier relation comes from lineitem; the excluded-
# supplier list is the negative-balance set rather than Q16's
# comment-pattern match). The NOT IN becomes a broadcast anti-join —
# null-safe by construction since s_suppkey is a key. Scale: part is
# pre-filtered and broadcast; the exclusion list is tiny and
# broadcast; COUNT(DISTINCT) shuffles (brand, size, suppkey) once,
# then re-aggregates — Spark's two-phase distinct expansion.
# ---------------------------------------------------------------------------

@_register(
    "q152_supplier_diversity",
    oracle="""
    SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'STANDARD'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
    tags=("tpch-q16", "count-distinct", "anti-join", "broadcast"),
)
def q152_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "STANDARD")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q153 — discount-class-dominant shippers (TPC-H Q20 shape, adapted:
# no partsupp/availqty, so the "more than half" correlated threshold
# compares a supplier's shipped quantity of one part class against
# half their OWN total — the same nested-aggregate-vs-correlated-
# bound shape). Both aggregates come out of ONE pass over facts as a
# conditional sum, then the region-filtered supplier dim joins the
# (supplier-sized) aggregate — never the raw facts.
# ---------------------------------------------------------------------------

@_register(
    "q153_class_dominant_shippers",
    oracle="""
    WITH per AS (
      SELECT l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
             CAST(SUM(CASE WHEN p.p_type IN ('PROMO', 'ECONOMY', 'SMALL')
                           THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS class_qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT s.s_name, n.n_name, per.total_qty, per.class_qty
    FROM per
    JOIN supplier s ON per.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'AFRICA'
    WHERE per.class_qty * 2 > per.total_qty
    """,
    tags=("tpch-q20", "nested-agg", "conditional-agg"),
)
def q153_class_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_type").isin("PROMO", "ECONOMY", "SMALL").alias("in_class"),
    )
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    per = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(qty).cast("long").alias("total_qty"),
            F.sum(F.when(F.col("in_class"), qty).otherwise(0))
            .cast("long")
            .alias("class_qty"),
        )
        .filter(F.col("class_qty") * 2 > F.col("total_qty"))
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return per.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_name", "n_name", "total_qty", "class_qty")


# ---------------------------------------------------------------------------
# Q154 — product-line profit by nation and year (TPC-H Q9 shape,
# adapted: supply cost is modeled as 10% of p_retailprice per unit
# since no partsupp exists). The profit expression is evaluated
# per-row with left-associative double arithmetic — identical
# operand bits in both engines — then cents-rounded before the sum.
# Scale: the LIKE filter prunes part hard (~13%) and broadcasts; the
# supplier→nation chain broadcasts; lineitem is the only shuffle
# input, grouped on (nation, year) — 25×7 groups, partial-agg heavy.
# ---------------------------------------------------------------------------

@_register(
    "q154_product_profit",
    oracle="""
    SELECT n.n_name,
           CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)
                                - p.p_retailprice * 0.1 * l.l_quantity) * 100)
                         AS BIGINT)) AS BIGINT) AS profit_c,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    tags=("tpch-q9", "profit", "like-pushdown", "broadcast"),
)
def q154_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem")
    profit_c = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "n_name",
            F.year(F.col("l_shipdate").cast("date")).cast("long").alias("l_year"),
        )
        .agg(
            F.sum(profit_c).cast("long").alias("profit_c"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q155 — late-shipment priority split (TPC-H Q12 shape, adapted: the
# testdata has no l_shipmode/commitdate, so the mode axis becomes
# l_returnflag and "late" means shipped >90 days after the order
# date). The CASE-split double count is the Q12 signature; the date
# arithmetic is exact integer day_diff in both engines. Scale: the
# ship-year filter prunes lineitem; one big-big equi-join on
# orderkey; 3-group final agg.
# ---------------------------------------------------------------------------

@_register(
    "q155_late_priority_split",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1997-01-01'
                                         AND DATE '1997-12-31'
      AND date_diff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) > 90
    GROUP BY 1
    """,
    tags=("tpch-q12", "case-split", "date-arith"),
)
def q155_late_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date").between("1997-01-01", "1997-12-31")
    )
    orders = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            )
            > 90
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q156 — HyperLogLog distinct-count (operators/sketches.py): the
# third portable sketch family next to KMV (q130/q142) and count-min
# (q141/q147). The oracle rebuilds the registers from md5 in SQL and
# replays the exact-integer estimator, so the value hash checks the
# whole algorithm, not just the estimate's ballpark; the merged
# estimate (two half-scans of lineitem, states max-merged) must be
# BIT-IDENTICAL to the direct estimate — the closure property that
# makes HLL the 100 TB distinct-count: per-partition m-register
# states, merged associatively, never a distinct shuffle.
# ---------------------------------------------------------------------------

def _q156_oracle_sql() -> str:
    from us_immigration_data_lake_spark.operators.sketches import hll_bitlen_sql

    two54 = 1 << 54
    two55 = 1 << 55
    bitlen = hll_bitlen_sql("w", 54)
    est = (
        f"CAST((CAST(709000 AS HUGEINT) * 4096 * {two55})"
        f" // (s_present + (64 - n) * CAST({two55} AS HUGEINT))"
        f" // 1000000 AS BIGINT)"
    )
    return f"""
    WITH vals AS (
      SELECT l_returnflag, l_linenumber,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM lineitem WHERE l_orderkey IS NOT NULL
    ),
    rows_ AS (
      SELECT l_returnflag, l_linenumber,
             h // {two54} AS j, h % {two54} AS w
      FROM vals
    ),
    regs AS (
      SELECT l_returnflag, j, MAX(55 - ({bitlen})) AS max_rho
      FROM rows_ GROUP BY 1, 2
    ),
    regs_a AS (
      SELECT l_returnflag, j, MAX(55 - ({bitlen})) AS max_rho
      FROM rows_ WHERE l_linenumber <= 3 GROUP BY 1, 2
    ),
    regs_b AS (
      SELECT l_returnflag, j, MAX(55 - ({bitlen})) AS max_rho
      FROM rows_ WHERE l_linenumber > 3 GROUP BY 1, 2
    ),
    merged AS (
      SELECT l_returnflag, j, MAX(max_rho) AS max_rho
      FROM (SELECT * FROM regs_a UNION ALL SELECT * FROM regs_b)
      GROUP BY 1, 2
    ),
    est_d AS (
      SELECT l_returnflag, {est} AS est_distinct
      FROM (SELECT l_returnflag, COUNT(*) AS n,
                   SUM({two55} >> max_rho) AS s_present
            FROM regs GROUP BY 1)
    ),
    est_m AS (
      SELECT l_returnflag, {est} AS est_merged
      FROM (SELECT l_returnflag, COUNT(*) AS n,
                   SUM({two55} >> max_rho) AS s_present
            FROM merged GROUP BY 1)
    ),
    ex AS (
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      FROM lineitem GROUP BY 1
    )
    SELECT est_d.l_returnflag, est_d.est_distinct, est_m.est_merged,
           (est_d.est_distinct = est_m.est_merged) AS merge_ok,
           ex.exact_distinct
    FROM est_d
    JOIN est_m USING (l_returnflag)
    JOIN ex USING (l_returnflag)
    """


@_register(
    "q156_hll_distinct",
    oracle=_q156_oracle_sql(),
    tags=("sketch", "hll", "approx-distinct", "portable", "mergeable"),
)
def q156_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    g = ["l_returnflag"]
    est_d = hll_estimate(hll_registers(li, g, "l_orderkey"), g)
    merged = hll_merge(
        hll_registers(li.filter(F.col("l_linenumber") <= 3), g, "l_orderkey"),
        hll_registers(li.filter(F.col("l_linenumber") > 3), g, "l_orderkey"),
        g,
    )
    est_m = hll_estimate(merged, g).withColumnRenamed("est_distinct", "est_merged")
    exact = li.groupBy(g).agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_distinct")
    )
    return (
        est_d.join(est_m, g)
        .join(F.broadcast(exact), g)
        .select(
            "l_returnflag",
            "est_distinct",
            "est_merged",
            (F.col("est_distinct") == F.col("est_merged")).alias("merge_ok"),
            "exact_distinct",
        )
    )


# ---------------------------------------------------------------------------
# Q157 — IVF-PQ ANN (operators/similarity.py:ivfpq_knn): product-
# quantization search gated end-to-end. Like q92, the models (coarse
# centroids + per-subspace codebooks) are seed-fixed literals
# rendered into both sides; the oracle replays encode (struct-sort
# argmin per subspace), probing (nprobe coarse cells), and ADC
# scoring (CASE over code words, exact BIGINT micro-unit sums), so
# the value hash checks the complete IVF-PQ pipeline. In-engine
# training (pq_train_codebooks) is pytest-verified — its oracle
# would require k-means in SQL.
# ---------------------------------------------------------------------------

_Q157_N_SUB = 4
_Q157_K_CODES = 8
_Q157_NPROBE = 2


def _q157_models() -> tuple[list[list[float]], list[list[list[float]]]]:
    import numpy as np

    rng = np.random.RandomState(11)
    coarse = [[float(x) for x in row] for row in rng.randn(4, EMBEDDING_DIM)]
    books = sim_ops.pq_codebooks(
        EMBEDDING_DIM, _Q157_N_SUB, _Q157_K_CODES, seed=12
    )
    return coarse, books


def _q157_oracle_sql() -> str:
    from us_immigration_data_lake_spark.operators.similarity import sq_dist_c_sql

    coarse, books = _q157_models()
    sub = EMBEDDING_DIM // _Q157_N_SUB

    def cell_sorted(vec: str) -> str:
        structs = ", ".join(
            "{'d': " + sq_dist_c_sql(vec, cc, 0, True) + ", 'c': " + str(i) + "}"
            for i, cc in enumerate(coarse)
        )
        return f"list_sort([{structs}])"

    def code_col(vec: str, s: int) -> str:
        structs = ", ".join(
            "{'d': "
            + sq_dist_c_sql(vec, books[s][ci], s * sub, True)
            + ", 'c': "
            + str(ci)
            + "}"
            for ci in range(_Q157_K_CODES)
        )
        return f"list_sort([{structs}])[1].c"

    def adist_case(s: int) -> str:
        whens = " ".join(
            f"WHEN {ci} THEN {sq_dist_c_sql('p.qv', books[s][ci], s * sub, True)}"
            for ci in range(_Q157_K_CODES)
        )
        return f"(CASE e.code{s} {whens} END)"

    code_cols = ",\n             ".join(
        f"{code_col('v', s)} AS code{s}" for s in range(_Q157_N_SUB)
    )
    adist = " + ".join(adist_case(s) for s in range(_Q157_N_SUB))
    probes = ", ".join(f"cells[{i + 1}].c" for i in range(_Q157_NPROBE))
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    enc AS (
      SELECT vec_id AS neighbor_id,
             {cell_sorted('v')}[1].c AS cell,
             {code_cols}
      FROM base),
    q AS (
      SELECT vec_id AS query_id, v AS qv, {cell_sorted('v')} AS cells
      FROM base WHERE vec_id % 100 = 7),
    probe AS (
      SELECT query_id, qv, unnest([{probes}]) AS cell FROM q),
    scored AS (
      SELECT p.query_id, e.neighbor_id, ({adist}) AS adist_c
      FROM probe p JOIN enc e USING (cell)
      WHERE e.neighbor_id != p.query_id),
    topk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adist_c, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, CAST(adist_c AS BIGINT) AS adist_c
    FROM topk WHERE rn <= 3
    """


@_register(
    "q157_ivfpq_knn",
    oracle=_q157_oracle_sql(),
    tags=("similarity", "pq", "ivf-pq", "ann", "adc"),
)
def q157_ivfpq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    coarse, books = _q157_models()
    queries = emb.filter(F.col("vec_id") % 100 == 7)
    return sim_ops.ivfpq_knn(
        emb,
        queries,
        "vec_id",
        "embedding",
        coarse,
        books,
        k=3,
        nprobe=_Q157_NPROBE,
    )


# ---------------------------------------------------------------------------
# Q158 — sub-document boilerplate removal (operators/dedup.py:
# remove_boilerplate): fixed-width word windows whose content repeats
# across >= 2 documents are dropped and each document is reassembled
# from its surviving windows — the segment-level leg of the dedup
# family (exact q15 / MinHash q20 / SimHash q21 operate at document
# grain). The oracle rebuilds windows with DuckDB list slicing and
# compares the reassembled text by md5 digest, so content equality is
# checked end-to-end without shipping raw text through the gate.
# ---------------------------------------------------------------------------

@_register(
    "q158_segment_boilerplate",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    segrows AS (
      SELECT doc_id, w,
             unnest(range(0, CAST(ceil(len(w) / 10.0) AS INT))) AS seg_id
      FROM words
    ),
    segs AS (
      SELECT doc_id, seg_id,
             array_to_string(w[seg_id * 10 + 1 : seg_id * 10 + 10], ' ') AS seg
      FROM segrows
    ),
    boiler AS (
      SELECT md5(seg) AS h FROM segs
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    kept AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             md5(string_agg(seg, ' ' ORDER BY seg_id)) AS cleaned_md5
      FROM segs WHERE md5(seg) NOT IN (SELECT h FROM boiler)
      GROUP BY 1
    ),
    totals AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments
      FROM segs GROUP BY 1
    )
    SELECT t.doc_id, t.n_segments,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.cleaned_md5, md5('')) AS cleaned_md5
    FROM totals t LEFT JOIN kept k USING (doc_id)
    """,
    tags=("dedup", "boilerplate", "segments", "llm-pipeline"),
    bench=True,
)
def q158_segment_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.remove_boilerplate(
        docs, "doc_id", "text", seg_words=10, min_docs=2
    )


# ---------------------------------------------------------------------------
# Q159 — token-budget mixture fill (operators/sampling.py:
# token_budget_fill): assemble a training mix by taking each source's
# documents in deterministic hash order until a per-source permille
# of its own token total is filled — the corpus-mixing step between
# dedup and packing in an LLM data pipeline. Exact-integer budgets
# and token counts; the boundary document is kept (overshoot <= 1
# doc per stratum). The oracle replays the greedy fill with a
# cumulative window over the same md5 ordering.
# ---------------------------------------------------------------------------

_Q159_PERMILLE = {"src0": 200, "src1": 800, "src2": 350}


@_register(
    "q159_token_budget_mix",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord_key
      FROM documents
    ),
    tot AS (
      SELECT source, CAST(SUM(tokens) AS BIGINT) AS total,
             CAST(CASE source WHEN 'src0' THEN 200
                              WHEN 'src1' THEN 800
                              WHEN 'src2' THEN 350
                              ELSE 500 END AS BIGINT) AS p
      FROM toks GROUP BY source
    ),
    cum AS (
      SELECT t.source, t.doc_id, t.tokens,
             CAST(COALESCE(SUM(t.tokens) OVER (
               PARTITION BY t.source ORDER BY t.ord_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before,
             CAST((tot.total * tot.p) // 1000 AS BIGINT) AS budget
      FROM toks t JOIN tot USING (source)
    ),
    kept AS (SELECT * FROM cum WHERE cum_before < budget)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(tokens) AS BIGINT) AS tokens_kept,
           CAST(MIN(budget) AS BIGINT) AS budget_tokens
    FROM kept GROUP BY source
    """,
    tags=("sampling", "mixture", "token-budget", "llm-pipeline"),
)
def q159_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        token_budget_fill,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    kept = token_budget_fill(
        docs.withColumn(
            "tokens", F.size(F.split(F.col("text"), " ")).cast("long")
        ),
        "source",
        "doc_id",
        "tokens",
        _Q159_PERMILLE,
        default_permille=500,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("tokens").cast("long").alias("tokens_kept"),
        F.min("budget").cast("long").alias("budget_tokens"),
    )


# ---------------------------------------------------------------------------
# Q160 — linear quality classifier (operators/textstats.py:
# linear_quality_classifier): model-BASED corpus filtering next to
# the heuristic score (q17) — fixed offline-trained weights applied
# as exact-integer arithmetic, so keep/reject never hinges on float
# rounding and the oracle replays feature extraction AND scoring.
# Weights live in the query as literals (the deployed-model pattern,
# like q24's planes / q157's codebooks).
# ---------------------------------------------------------------------------

_Q160_W = {"uniq_pm": 400, "stop_pm": 300, "len_cap": 1500, "meanlen_milli": 40}
_Q160_BIAS = -480000


@_register(
    "q160_quality_classifier",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(t, x -> list_contains(
               ['the','a','and','of','to','is','in','it'], x))) AS BIGINT)
               AS n_stop,
             CAST(COALESCE(list_sum(list_transform(t, x -> length(x))), 0)
                  AS BIGINT) AS sum_len
      FROM toks
    ),
    scored AS (
      SELECT lang,
             (-480000
              + 400 * (CASE WHEN n_tokens = 0 THEN 0
                            ELSE (n_distinct * 1000) // n_tokens END)
              + 300 * (CASE WHEN n_tokens = 0 THEN 0
                            ELSE (n_stop * 1000) // n_tokens END)
              + 1500 * LEAST(n_tokens, 200)
              + 40 * (CASE WHEN n_tokens = 0 THEN 0
                           ELSE (sum_len * 1000) // n_tokens END)
             ) AS logit_mu
      FROM feat
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN logit_mu >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(logit_mu) AS BIGINT) AS sum_logit_mu
    FROM scored GROUP BY lang
    """,
    tags=("textstats", "classifier", "llm-pipeline", "portable"),
    bench=True,
)
def q160_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    feats = ts_ops.text_features(docs, "doc_id", "text").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    scored = ts_ops.linear_quality_classifier(
        feats, _Q160_W, _Q160_BIAS, threshold_mu=0
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum("logit_mu").cast("long").alias("sum_logit_mu"),
    )


# ---------------------------------------------------------------------------
# Q161 — STREAMING distinct-count via mergeable HLL state
# (streaming/sinks.py:hll_distinct_stream): per event_type, micro-
# batch registers MAX-fold into the versioned state store (q127's
# exactly-once discipline), and because HLL merge is bit-exact
# associative the folded estimate equals the single-pass estimate —
# which is precisely what the oracle computes, replaying registers +
# integer estimator directly over all events in SQL. Multi-batch
# folding and crash-replay idempotency are exercised in
# tests/test_stream_hll.py (the gate's single-file source yields one
# batch).
# ---------------------------------------------------------------------------

def _q161_oracle_sql() -> str:
    from us_immigration_data_lake_spark.operators.sketches import hll_bitlen_sql

    two54 = 1 << 54
    two55 = 1 << 55
    bitlen = hll_bitlen_sql("w", 54)
    return f"""
    WITH vals AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    rows_ AS (
      SELECT event_type, h // {two54} AS j, h % {two54} AS w FROM vals
    ),
    regs AS (
      SELECT event_type, j, MAX(55 - ({bitlen})) AS max_rho
      FROM rows_ GROUP BY 1, 2
    ),
    est AS (
      SELECT event_type,
             CAST((CAST(709000 AS HUGEINT) * 4096 * {two55})
                  // (s_present + (64 - n) * CAST({two55} AS HUGEINT))
                  // 1000000 AS BIGINT) AS est_distinct
      FROM (SELECT event_type, COUNT(*) AS n,
                   SUM({two55} >> max_rho) AS s_present
            FROM regs GROUP BY 1)
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT est.event_type, est.est_distinct, ex.exact_distinct
    FROM est JOIN ex USING (event_type)
    """


@_register(
    "q161_stream_hll_distinct",
    oracle=_q161_oracle_sql(),
    tags=("streaming", "sketch", "hll", "foreachBatch", "exactly-once"),
)
def q161_stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from us_immigration_data_lake_spark.operators.sketches import hll_estimate
    from us_immigration_data_lake_spark.sources.events import read_event_stream
    from us_immigration_data_lake_spark.streaming.sinks import (
        hll_distinct_stream,
        read_latest_state,
    )

    _tune(spark)
    stream = read_event_stream(spark, sf_dir).select("event_type", "user_id")
    root = tempfile.mkdtemp(prefix="q161_hll_")
    state_dir = f"{root}/state"
    hll_distinct_stream(
        stream,
        ["event_type"],
        "user_id",
        state_dir,
        f"{root}/ckpt",
        name=_sink_name("q161_hll"),
    )
    state = read_latest_state(spark, state_dir)
    est = hll_estimate(state, ["event_type"])
    exact = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type", "est_distinct", "exact_distinct"
    )


# ---------------------------------------------------------------------------
# Q162 — STREAMING frequency sketch (streaming/sinks.py:
# countmin_stream): count-min cells SUM-fold through the versioned
# state store; since cell addition is the sketch's exact merge, the
# folded sketch is bit-identical to a single-pass build and the
# oracle replays the whole thing (hash cells, MIN-of-rows estimates,
# never-undercount flag) directly over all events in SQL. Completes
# the streaming-sketch family next to q161 (HLL max-fold): the two
# folds cover both mergeable-state shapes (max / sum).
# ---------------------------------------------------------------------------

@_register(
    "q162_stream_countmin",
    oracle="""
    WITH keys AS (
      SELECT user_id AS k FROM events WHERE user_id IS NOT NULL
    ),
    rows4 AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(r)),
    cells AS (
      SELECT r,
             ('0x' || substr(md5(r::VARCHAR || '|' || k::VARCHAR), 1, 15))::BIGINT
               % 2048 AS bucket
      FROM keys CROSS JOIN rows4
    ),
    sk AS (
      SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ),
    probe AS (
      SELECT DISTINCT user_id AS k FROM events
      WHERE user_id % 37 = 0
    ),
    pcells AS (
      SELECT k, r,
             ('0x' || substr(md5(r::VARCHAR || '|' || k::VARCHAR), 1, 15))::BIGINT
               % 2048 AS bucket
      FROM probe CROSS JOIN rows4
    ),
    est AS (
      SELECT k, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est_count
      FROM pcells LEFT JOIN sk USING (r, bucket) GROUP BY k
    ),
    exact AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )
    SELECT est.k AS user_id, est.est_count, exact.exact_count,
           est.est_count >= exact.exact_count AS never_under
    FROM est JOIN exact USING (k)
    """,
    tags=("streaming", "sketch", "count-min", "foreachBatch", "exactly-once"),
)
def q162_stream_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from us_immigration_data_lake_spark.operators.sketches import countmin_query
    from us_immigration_data_lake_spark.sources.events import read_event_stream
    from us_immigration_data_lake_spark.streaming.sinks import (
        countmin_stream,
        read_latest_state,
    )

    _tune(spark)
    stream = read_event_stream(spark, sf_dir).select("user_id")
    root = tempfile.mkdtemp(prefix="q162_cm_")
    state_dir = f"{root}/state"
    countmin_stream(
        stream, "user_id", state_dir, f"{root}/ckpt",
        name=_sink_name("q162_cm"),
    )
    sketch = read_latest_state(spark, state_dir)
    ev = load_events(spark, sf_dir)
    probe = (
        ev.filter(F.col("user_id") % 37 == 0)
        .select("user_id")
        .distinct()
    )
    est = countmin_query(sketch, probe, "user_id", depth=4, width=2048)
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (F.col("est_count") >= F.col("exact_count")).alias("never_under"),
        )
    )


# ---------------------------------------------------------------------------
# Q163 — sketch-partialized cube rollup: per-(lang, source) HLL
# states roll up to per-lang and grand-total distinct-count estimates
# by MERGING REGISTERS, never rescanning documents — the reason
# warehouses store sketches in cubes: COUNT(DISTINCT) is not
# additive across cells, but HLL states are. All three levels'
# estimates are bit-identical to direct single-pass sketches (the
# oracle replays every level from scratch in SQL and the value hash
# must agree), proving the rollup loses nothing. At 100 TB the base
# cells are the only pass over data; every further rollup touches
# ≤ m rows per cell.
# ---------------------------------------------------------------------------

def _q163_oracle_sql() -> str:
    from us_immigration_data_lake_spark.operators.sketches import hll_bitlen_sql

    two54 = 1 << 54
    two55 = 1 << 55
    bitlen = hll_bitlen_sql("w", 54)
    est = (
        f"CAST((CAST(709000 AS HUGEINT) * 4096 * {two55})"
        f" // (s_present + (64 - n) * CAST({two55} AS HUGEINT))"
        f" // 1000000 AS BIGINT)"
    )

    def level(keys: str, keysel: str) -> str:
        return f"""
      SELECT {keysel},
             {est} AS est_distinct
      FROM (SELECT {keys} COUNT(*) AS n, SUM({two55} >> max_rho) AS s_present
            FROM (SELECT {keys} j, MAX(55 - ({bitlen})) AS max_rho
                  FROM rows_ GROUP BY {'ALL' if keys else 'j'})
            {f'GROUP BY {keys.rstrip(", ")}' if keys else ''})
        """

    return f"""
    WITH vals AS (
      SELECT lang, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM documents WHERE doc_id IS NOT NULL
    ),
    rows_ AS (
      SELECT lang, source, h // {two54} AS j, h % {two54} AS w FROM vals
    ),
    cell AS ({level("lang, source,", "lang, source")}),
    lang_lvl AS ({level("lang,", "lang AS l2, CAST(NULL AS VARCHAR) AS s2")}),
    total AS ({level("", "CAST(NULL AS VARCHAR) AS l3, CAST(NULL AS VARCHAR) AS s3")})
    SELECT 'cell' AS level, lang, source, est_distinct FROM cell
    UNION ALL
    SELECT 'lang', l2, s2, est_distinct FROM lang_lvl
    UNION ALL
    SELECT 'total', l3, s3, est_distinct FROM total
    """


@_register(
    "q163_sketch_cube",
    oracle=_q163_oracle_sql(),
    tags=("sketch", "hll", "cube", "rollup", "mergeable"),
    bench=True,
)
def q163_sketch_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    # ONE pass over data: the base-cell registers
    cells = hll_registers(docs, ["lang", "source"], "doc_id")
    # rollups merge registers (max per j) — no rescan of documents
    lang_regs = cells.groupBy("lang", "__j").agg(
        F.max("max_rho").cast("int").alias("max_rho")
    )
    total_regs = cells.groupBy("__j").agg(
        F.max("max_rho").cast("int").alias("max_rho")
    )
    null_s = F.lit(None).cast("string")
    out_cell = hll_estimate(cells, ["lang", "source"]).select(
        F.lit("cell").alias("level"), "lang", "source", "est_distinct"
    )
    out_lang = hll_estimate(lang_regs, ["lang"]).select(
        F.lit("lang").alias("level"), "lang", null_s.alias("source"),
        "est_distinct",
    )
    out_total = hll_estimate(total_regs, []).select(
        F.lit("total").alias("level"), null_s.alias("lang"),
        null_s.alias("source"), "est_distinct",
    )
    return out_cell.unionByName(out_lang).unionByName(out_total)


# ---------------------------------------------------------------------------
# Q164 — linear-interpolation gap fill (operators/windows.py:
# interpolate_fill): the hypertable trio's third mode next to q83's
# zero/ffill — missing hourly slots in each user's cents series get
# the exact floor-division linear interpolation between neighbors.
# The oracle replays the dense axis, both IGNORE NULLS windows, and
# DuckDB's native // (floor) division, which the Spark side matches
# via the pmod floor-div identity — bit-equal including negative
# slopes.
# ---------------------------------------------------------------------------

@_register(
    "q164_interpolate_gaps",
    oracle="""
    WITH obs AS (
      -- integer epoch path: epoch() returns DOUBLE and DuckDB's //
      -- does NOT floor doubles (and CAST double->BIGINT rounds), so
      -- the hour slot must come from BIGINT // BIGINT, which floors
      SELECT user_id,
             (epoch_ms(CAST(ts AS TIMESTAMP)) // 1000) // 3600 AS slot,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE user_id % 25 = 3
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, MIN(slot) AS lo, MAX(slot) AS hi FROM obs GROUP BY 1
    ),
    dense AS (
      SELECT user_id, unnest(range(lo, hi + 1)) AS slot FROM spans
    ),
    j AS (
      SELECT d.user_id, d.slot, o.v
      FROM dense d LEFT JOIN obs o USING (user_id, slot)
    ),
    w AS (
      SELECT user_id, slot, v,
             last_value(CASE WHEN v IS NOT NULL THEN slot END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY slot
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             last_value(v IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY slot
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(CASE WHEN v IS NOT NULL THEN slot END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY slot
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
             first_value(v IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY slot
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      FROM j
    )
    SELECT user_id, slot,
           -- FLOOR division on integers: DuckDB's BIGINT // truncates
           -- toward zero, so negative slopes need the -1 adjustment
           -- to match the engine's exact pmod floor-div
           CAST(CASE WHEN v IS NOT NULL THEN v
                     ELSE pv + ((nv - pv) * (slot - pt)) // (nt - pt)
                          - (CASE WHEN ((nv - pv) * (slot - pt)) % (nt - pt) != 0
                                   AND (nv - pv) * (slot - pt) < 0
                                  THEN 1 ELSE 0 END)
                END AS BIGINT) AS value,
           (v IS NOT NULL) AS is_observed
    FROM w
    """,
    tags=("time-series", "interpolate", "gap-fill", "window"),
)
def q164_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.windows import (
        interpolate_fill,
    )

    _tune(spark)
    ev = load_events(spark, sf_dir).filter(F.col("user_id") % 25 == 3)
    obs = (
        ev.select(
            "user_id",
            # exact hour slot: pmod floor-div on integer seconds (the
            # double path /3600 + cast would round, not floor)
            F.expr(
                "CAST((unix_timestamp(ts) - pmod(unix_timestamp(ts), 3600))"
                " div 3600 AS BIGINT)"
            ).alias("slot"),
            _cents(F.col("value")).alias("cents"),
        )
        .groupBy("user_id", "slot")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    return interpolate_fill(obs, "user_id", "slot", "cents")


# ---------------------------------------------------------------------------
# Q165 — histogram-sketch quantiles (operators/sketches.py): the
# quantile member of the portable sketch family. Exact-integer state
# (bin counts over $500-wide cent bins), cell-addition merge, and a
# floor-division estimator the oracle replays in SQL — unlike
# approx_percentile (q78), which is implementation-defined and only
# tolerance-checkable. The merged estimate (two half-scans) must be
# bit-identical to the direct one; 100 TB shape: per-partition bins,
# one ≤nbins-row shuffle per group, quantiles from state alone.
# ---------------------------------------------------------------------------

_Q165_LO, _Q165_W, _Q165_NBINS = 0, 50_000, 256


@_register(
    "q165_histogram_quantiles",
    oracle=f"""
    WITH cents AS (
      SELECT l_returnflag, l_linenumber,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ),
    binned AS (
      SELECT l_returnflag, l_linenumber,
             LEAST(GREATEST(c // 50000, 0), 255) AS bin
      FROM cents
    ),
    sk AS (
      SELECT l_returnflag, bin, CAST(COUNT(*) AS BIGINT) AS n
      FROM binned GROUP BY 1, 2
    ),
    sk_m AS (
      -- two half-builds merged by cell addition (the mergeable state)
      SELECT l_returnflag, bin, CAST(SUM(n) AS BIGINT) AS n FROM (
        SELECT l_returnflag, bin, COUNT(*) AS n FROM binned
        WHERE l_linenumber <= 3 GROUP BY 1, 2
        UNION ALL
        SELECT l_returnflag, bin, COUNT(*) AS n FROM binned
        WHERE l_linenumber > 3 GROUP BY 1, 2
      ) GROUP BY 1, 2
    ),
    wind AS (
      SELECT l_returnflag, bin, n,
             COALESCE(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             SUM(n) OVER (PARTITION BY l_returnflag) AS total
      FROM sk
    ),
    windm AS (
      SELECT l_returnflag, bin, n,
             COALESCE(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             SUM(n) OVER (PARTITION BY l_returnflag) AS total
      FROM sk_m
    ),
    est_d AS (
      SELECT w.l_returnflag,
             MIN(CASE WHEN w.cum_before < ((w.total * 500 + 999) // 1000) AND w.cum_before + w.n >= ((w.total * 500 + 999) // 1000) THEN 0 + w.bin * 50000 + ((((w.total * 500 + 999) // 1000) - w.cum_before) * 50000) // w.n END) AS p500_est,
             MIN(CASE WHEN w.cum_before < ((w.total * 950 + 999) // 1000) AND w.cum_before + w.n >= ((w.total * 950 + 999) // 1000) THEN 0 + w.bin * 50000 + ((((w.total * 950 + 999) // 1000) - w.cum_before) * 50000) // w.n END) AS p950_est
      FROM wind w GROUP BY 1
    ),
    est_m AS (
      SELECT w.l_returnflag, MIN(CASE WHEN w.cum_before < ((w.total * 500 + 999) // 1000) AND w.cum_before + w.n >= ((w.total * 500 + 999) // 1000) THEN 0 + w.bin * 50000 + ((((w.total * 500 + 999) // 1000) - w.cum_before) * 50000) // w.n END) AS p500_merged
      FROM windm w GROUP BY 1
    )
    SELECT est_d.l_returnflag,
           CAST(est_d.p500_est AS BIGINT) AS p500_est,
           CAST(est_d.p950_est AS BIGINT) AS p950_est,
           (est_d.p500_est = est_m.p500_merged) AS merge_ok
    FROM est_d JOIN est_m USING (l_returnflag)
    """,
    tags=("sketch", "histogram", "quantile", "mergeable", "portable"),
)
def q165_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_build,
        histogram_merge,
        histogram_quantile,
    )

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "cents", _cents(F.col("l_extendedprice"))
    )
    g = ["l_returnflag"]
    sk = histogram_build(li, g, "cents", _Q165_LO, _Q165_W, _Q165_NBINS)
    p50 = histogram_quantile(sk, g, 500, _Q165_LO, _Q165_W)
    p95 = histogram_quantile(sk, g, 950, _Q165_LO, _Q165_W)
    merged = histogram_merge(
        histogram_build(
            li.filter(F.col("l_linenumber") <= 3), g, "cents",
            _Q165_LO, _Q165_W, _Q165_NBINS,
        ),
        histogram_build(
            li.filter(F.col("l_linenumber") > 3), g, "cents",
            _Q165_LO, _Q165_W, _Q165_NBINS,
        ),
        g,
    )
    p50_m = histogram_quantile(merged, g, 500, _Q165_LO, _Q165_W).withColumnRenamed(
        "p500_est", "p500_merged"
    )
    return (
        p50.join(p95, g)
        .join(p50_m, g)
        .select(
            "l_returnflag",
            "p500_est",
            "p950_est",
            (F.col("p500_est") == F.col("p500_merged")).alias("merge_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Q166 — prefix-filtered set-similarity join (operators/dedup.py:
# prefix_jaccard_pairs): the All-Pairs/SSJoin prefix optimization
# over 3-gram shingle sets. The ORACLE is the plain all-pairs
# threshold join over the same sets — exact equality proves the
# prefix filter generated every qualifying pair (no false negatives,
# the property the p = |s| - ceil(t·|s|) + 1 bound guarantees) and
# the integer verify admitted no extras. Threshold and jaccard are
# exact permille; no float decides a pair.
# ---------------------------------------------------------------------------

@_register(
    "q166_prefix_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks)-1)]) AS shingles
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE doc_id < 1000)
      WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT)
             AS inter,
           CAST(len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles)) AS BIGINT)
             AS union_sz,
           CAST((len(list_intersect(a.shingles, b.shingles)) * 1000)
                // (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles)))
             AS BIGINT) AS jaccard_permille
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles)) * 1000
          >= 150 * (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles)))
    """,
    tags=("dedup", "jaccard", "prefix-filter", "ssjoin", "scale"),
)
def q166_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    tok = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    sh = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - 3),
                lambda i: F.array_join(F.slice(tok, i + 1, 3), " "),
            )
        ).alias("shingles"),
    ).filter(F.size(tok) >= 3)
    return dedup_ops.prefix_jaccard_pairs(sh, "doc_id", 150)


# ---------------------------------------------------------------------------
# Q167 — SQL PIVOT / UNPIVOT clause round-trip (§2.7 surface): the
# declarative SQL spelling of q07's DataFrame pivot — wide per-status
# revenue columns via PIVOT, melted back with UNPIVOT, proving both
# clauses against an oracle that spells the same thing as portable
# CASE aggregation + VALUES-join melt. The round-trip keeps zero
# cells distinguishable from absent combinations (INCLUDE NULLS off:
# absent pairs drop, matching the CASE form's HAVING).
# ---------------------------------------------------------------------------

@_register(
    "q167_sql_pivot_unpivot",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             SUM(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS f_c,
             SUM(CASE WHEN o_orderstatus = 'O'
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS o_c,
             SUM(CASE WHEN o_orderstatus = 'P'
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS p_c
      FROM orders GROUP BY 1
    )
    SELECT w.o_orderpriority, v.o_orderstatus,
           CAST(CASE v.o_orderstatus WHEN 'F' THEN w.f_c
                                     WHEN 'O' THEN w.o_c
                                     ELSE w.p_c END AS BIGINT) AS revenue_c
    FROM wide w, (VALUES ('F'), ('O'), ('P')) AS v(o_orderstatus)
    WHERE CASE v.o_orderstatus WHEN 'F' THEN w.f_c
                               WHEN 'O' THEN w.o_c
                               ELSE w.p_c END IS NOT NULL
    """,
    tags=("sql-surface", "pivot", "unpivot"),
)
def q167_sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q167_orders")
    return spark.sql(
        """
        WITH wide AS (
          SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM q167_orders
          )
          PIVOT (SUM(cents) FOR o_orderstatus IN ('F' AS f_c, 'O' AS o_c,
                                                  'P' AS p_c))
        )
        SELECT o_orderpriority, o_orderstatus, revenue_c FROM wide
        UNPIVOT (revenue_c FOR o_orderstatus IN (f_c F, o_c O, p_c P))
        """
    )


# ---------------------------------------------------------------------------
# Q168 — bag-semantics set operations (INTERSECT ALL / EXCEPT ALL,
# §2.5): q11 covers the DISTINCT forms; the ALL forms keep
# per-element multiplicity (min(count) for intersect, count
# difference for except) — the semantics a dedup-accounting pipeline
# needs when counting occurrences, not membership. Compared as
# per-key multiplicities (group-by on top), so the gate checks the
# exact bag, order-free.
# ---------------------------------------------------------------------------

@_register(
    "q168_setops_bag",
    oracle="""
    SELECT 'both' AS tag, k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ) GROUP BY 2
    UNION ALL
    SELECT 'a_only', k, CAST(COUNT(*) AS BIGINT) FROM (
      SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ) GROUP BY 2
    """,
    tags=("sql-surface", "set-ops", "bag-semantics"),
)
def q168_setops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_suppkey").alias("k")
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k")
    )
    both = (
        a.intersectAll(r)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("both").alias("tag"), "k", "n")
    )
    a_only = (
        a.exceptAll(r)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("a_only").alias("tag"), "k", "n")
    )
    return both.unionByName(a_only)


# ---------------------------------------------------------------------------
# Q169 — set-overlap estimate from HLL states alone (inclusion-
# exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the union
# estimated from the MERGED registers — no rescan, no pairwise data
# join). The audience-overlap / corpus-overlap primitive: at 100 TB
# each set's m-register state is all that ships. Exact overlap rides
# along for calibration; the estimate may legitimately go negative
# on small overlaps (documented property of inclusion-exclusion on
# estimates), which the BIGINT output represents honestly.
# ---------------------------------------------------------------------------

def _q169_oracle_sql() -> str:
    from us_immigration_data_lake_spark.operators.sketches import hll_bitlen_sql

    two54 = 1 << 54
    two55 = 1 << 55
    bitlen = hll_bitlen_sql("w", 54)

    def regs(pred: str) -> str:
        return f"""
      SELECT h // {two54} AS j, MAX(55 - ({bitlen})) AS max_rho
      FROM (SELECT h, h % {two54} AS w FROM vals WHERE {pred})
      GROUP BY 1
        """

    est = (
        f"CAST((CAST(709000 AS HUGEINT) * 4096 * {two55})"
        f" // (s_present + (64 - n) * CAST({two55} AS HUGEINT))"
        f" // 1000000 AS BIGINT)"
    )

    def estimate(src: str) -> str:
        return f"""
      SELECT {est} AS e
      FROM (SELECT COUNT(*) AS n, SUM({two55} >> max_rho) AS s_present
            FROM {src})
        """

    return f"""
    WITH vals AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
      WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')
    ),
    ra AS ({regs("event_type = 'view'")}),
    rb AS ({regs("event_type = 'purchase'")}),
    ru AS (
      SELECT j, MAX(max_rho) AS max_rho
      FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1
    ),
    ea AS ({estimate('ra')}),
    eb AS ({estimate('rb')}),
    eu AS ({estimate('ru')}),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_overlap FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      )
    )
    SELECT ea.e AS est_a, eb.e AS est_b, eu.e AS est_union,
           CAST(ea.e + eb.e - eu.e AS BIGINT) AS est_overlap,
           exact.exact_overlap
    FROM ea, eb, eu, exact
    """


@_register(
    "q169_hll_overlap",
    oracle=_q169_oracle_sql(),
    tags=("sketch", "hll", "overlap", "inclusion-exclusion", "portable"),
)
def q169_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    _tune(spark)
    ev = load_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    ra = hll_registers(views, [], "user_id")
    rb = hll_registers(buys, [], "user_id")
    ru = hll_merge(ra, rb, [])
    ea = hll_estimate(ra, []).withColumnRenamed("est_distinct", "est_a")
    eb = hll_estimate(rb, []).withColumnRenamed("est_distinct", "est_b")
    eu = hll_estimate(ru, []).withColumnRenamed("est_distinct", "est_union")
    # INTERSECT has set semantics (dedups both inputs itself)
    exact = (
        views.select("user_id")
        .intersect(buys.select("user_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(F.broadcast(exact))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union"))
            .cast("long")
            .alias("est_overlap"),
            "exact_overlap",
        )
    )


# ---------------------------------------------------------------------------
# Q170 — join-size estimation from count-min states (the CM inner-
# product estimator): |lineitem ⋈ orders on orderkey| predicted from
# the two tables' depth×width sketches alone — the cardinality
# question a cost-based planner asks before committing to a join
# strategy, answered without touching either table. Never
# undercounts (collisions only add mass); the oracle rebuilds both
# sketches and replays the min-over-rows inner product, and the
# exact join size rides along with the bound check.
# ---------------------------------------------------------------------------

@_register(
    "q170_cm_join_size",
    oracle="""
    WITH rows4 AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(r)),
    ca AS (
      SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT r,
               ('0x' || substr(md5(r::VARCHAR || '|' || l_orderkey::VARCHAR),
                               1, 15))::BIGINT % 2048 AS bucket
        FROM lineitem CROSS JOIN rows4 WHERE l_orderkey IS NOT NULL
      ) GROUP BY 1, 2
    ),
    cb AS (
      SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT r,
               ('0x' || substr(md5(r::VARCHAR || '|' || o_orderkey::VARCHAR),
                               1, 15))::BIGINT % 2048 AS bucket
        FROM orders CROSS JOIN rows4 WHERE o_orderkey IS NOT NULL
      ) GROUP BY 1, 2
    ),
    ip AS (
      SELECT r.r, CAST(COALESCE(SUM(ca.c * cb.c), 0) AS BIGINT) AS v
      FROM rows4 r
      LEFT JOIN ca ON ca.r = r.r
      LEFT JOIN cb ON cb.r = ca.r AND cb.bucket = ca.bucket
      GROUP BY 1
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_size
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST(MIN(ip.v) AS BIGINT) AS est_join_size,
           exact.exact_join_size,
           MIN(ip.v) >= exact.exact_join_size AS never_under
    FROM ip, exact GROUP BY exact.exact_join_size
    """,
    tags=("sketch", "count-min", "join-size", "cardinality", "portable"),
)
def q170_cm_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        countmin_build,
        countmin_inner_product,
    )

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sk_a = countmin_build(li, "l_orderkey", depth=4, width=2048)
    sk_b = countmin_build(orders, "o_orderkey", depth=4, width=2048)
    est = countmin_inner_product(sk_a, sk_b, depth=4)
    exact = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).agg(F.count(F.lit(1)).cast("long").alias("exact_join_size"))
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_size",
        "exact_join_size",
        (F.col("est_join_size") >= F.col("exact_join_size")).alias(
            "never_under"
        ),
    )


# ---------------------------------------------------------------------------
# Q171 — STREAMING quantiles via the histogram fold (streaming/
# sinks.py:histogram_stream): per event_type, the p50/p95 of cents
# read from state folded across micro-batches — bit-identical to a
# single-pass histogram because bin addition is exact, which is
# precisely what the oracle replays directly over all events.
# Completes the streaming-sketch family: distinct (q161, max-fold),
# frequency (q162, sum-fold), quantiles (this, sum-fold over bins).
# ---------------------------------------------------------------------------

_Q171_LO, _Q171_W, _Q171_NBINS = 0, 1000, 64


@_register(
    "q171_stream_quantiles",
    oracle=f"""
    WITH cents AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    sk AS (
      SELECT event_type,
             LEAST(GREATEST(c // {_Q171_W}, 0), {_Q171_NBINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cents GROUP BY 1, 2
    ),
    wind AS (
      SELECT event_type, bin, n,
             COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM sk
    )
    SELECT w.event_type,
           CAST(MIN(CASE WHEN w.cum_before < ((w.total * 500 + 999) // 1000)
                     AND w.cum_before + w.n >= ((w.total * 500 + 999) // 1000)
                    THEN {_Q171_LO} + w.bin * {_Q171_W}
                         + ((((w.total * 500 + 999) // 1000) - w.cum_before)
                            * {_Q171_W}) // w.n END) AS BIGINT) AS p500_est,
           CAST(MIN(CASE WHEN w.cum_before < ((w.total * 950 + 999) // 1000)
                     AND w.cum_before + w.n >= ((w.total * 950 + 999) // 1000)
                    THEN {_Q171_LO} + w.bin * {_Q171_W}
                         + ((((w.total * 950 + 999) // 1000) - w.cum_before)
                            * {_Q171_W}) // w.n END) AS BIGINT) AS p950_est
    FROM wind w GROUP BY 1
    """,
    tags=("streaming", "sketch", "histogram", "quantile", "exactly-once"),
)
def q171_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_quantile,
    )
    from us_immigration_data_lake_spark.sources.events import read_event_stream
    from us_immigration_data_lake_spark.streaming.sinks import (
        histogram_stream,
        read_latest_state,
    )

    _tune(spark)
    stream = (
        read_event_stream(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", _cents(F.col("value")).alias("cents"))
    )
    root = tempfile.mkdtemp(prefix="q171_hist_")
    state_dir = f"{root}/state"
    histogram_stream(
        stream, ["event_type"], "cents", state_dir, f"{root}/ckpt",
        _Q171_LO, _Q171_W, _Q171_NBINS, name=_sink_name("q171_hist"),
    )
    state = read_latest_state(spark, state_dir)
    g = ["event_type"]
    p50 = histogram_quantile(state, g, 500, _Q171_LO, _Q171_W)
    p95 = histogram_quantile(state, g, 950, _Q171_LO, _Q171_W)
    return p50.join(p95, g).select("event_type", "p500_est", "p950_est")


# ---------------------------------------------------------------------------
# Q172 — WEIGHTED histogram quantiles: the sketch's bin mass is the
# quantity-weighted count, so the same state answers q101's
# weighted-median question approximately (±1 bin) and mergeably —
# the exact q101 median rides along with an |Δ| ≤ width bound flag,
# closing the loop between the exact order-statistic and its sketch.
# The oracle replays weighted bins, estimator, AND the exact
# weighted median.
# ---------------------------------------------------------------------------

_Q172_LO, _Q172_W, _Q172_NBINS = 0, 50_000, 256


@_register(
    "q172_weighted_hist_quantile",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ),
    sk AS (
      SELECT l_returnflag,
             LEAST(GREATEST(v // {_Q172_W}, 0), {_Q172_NBINS - 1}) AS bin,
             CAST(SUM(wt) AS BIGINT) AS n
      FROM s GROUP BY 1, 2
    ),
    wind AS (
      SELECT l_returnflag, bin, n,
             COALESCE(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             SUM(n) OVER (PARTITION BY l_returnflag) AS total
      FROM sk
    ),
    est AS (
      SELECT w.l_returnflag,
             CAST(MIN(CASE
               WHEN w.cum_before < ((w.total * 500 + 999) // 1000)
                AND w.cum_before + w.n >= ((w.total * 500 + 999) // 1000)
               THEN {_Q172_LO} + w.bin * {_Q172_W}
                    + ((((w.total * 500 + 999) // 1000) - w.cum_before)
                       * {_Q172_W}) // w.n END) AS BIGINT) AS p500_w_est
      FROM wind w GROUP BY 1
    ),
    ranked AS (
      SELECT l_returnflag, v,
             SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v, wt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM s
    ),
    exact AS (
      SELECT l_returnflag, CAST(MIN(v) AS BIGINT) AS exact_w_median
      FROM ranked WHERE cw * 2 >= tw GROUP BY 1
    )
    SELECT est.l_returnflag, est.p500_w_est, exact.exact_w_median,
           abs(est.p500_w_est - exact.exact_w_median) <= {_Q172_W}
             AS within_one_bin
    FROM est JOIN exact USING (l_returnflag)
    """,
    tags=("sketch", "histogram", "weighted-quantile", "portable"),
)
def q172_weighted_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_build,
        histogram_quantile,
    )

    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _cents(F.col("l_extendedprice")).alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    g = ["l_returnflag"]
    sk = histogram_build(
        li, g, "cents", _Q172_LO, _Q172_W, _Q172_NBINS, weight_col="wt"
    )
    est = histogram_quantile(sk, g, 500, _Q172_LO, _Q172_W).withColumnRenamed(
        "p500_est", "p500_w_est"
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    exact = (
        li.withColumn("cw", F.sum("wt").over(w_cum))
        .withColumn("tw", F.sum("wt").over(w_tot))
        .filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy(g)
        .agg(F.min("cents").cast("long").alias("exact_w_median"))
    )
    return est.join(exact, g).select(
        "l_returnflag",
        "p500_w_est",
        "exact_w_median",
        (
            F.abs(F.col("p500_w_est") - F.col("exact_w_median"))
            <= F.lit(_Q172_W)
        ).alias("within_one_bin"),
    )


# ---------------------------------------------------------------------------
# Q173 — rolling-window distinct via HLL register merge: the SCALE
# path for q99's exact rolling distinct. Daily m-register states are
# built ONCE from one scan; each day's trailing-3-day estimate comes
# from max-merging three day-states (bounded ×3 fan-out of ≤m-row
# states, never of raw data). At 100 TB the q99 rewrite fans out the
# RAW (day, user) pairs ×window; this fans out 64-row sketches —
# the window length stops mattering. Exact rolling distinct rides
# along; the oracle replays registers, merge, and estimator per day.
# ---------------------------------------------------------------------------

def _q173_oracle_sql() -> str:
    from us_immigration_data_lake_spark.operators.sketches import hll_bitlen_sql

    two54 = 1 << 54
    two55 = 1 << 55
    bitlen = hll_bitlen_sql("w", 54)
    return f"""
    WITH vals AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    day_regs AS (
      SELECT d, j, MAX(55 - ({bitlen})) AS max_rho
      FROM (SELECT d, h // {two54} AS j, h % {two54} AS w FROM vals)
      GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT d FROM vals),
    win_regs AS (
      SELECT days.d AS d, r.j, MAX(r.max_rho) AS max_rho
      FROM days JOIN day_regs r
        ON r.d BETWEEN days.d - INTERVAL 2 DAY AND days.d
      GROUP BY 1, 2
    ),
    est AS (
      SELECT d,
             CAST((CAST(709000 AS HUGEINT) * 4096 * {two55})
                  // (s_present + (64 - n) * CAST({two55} AS HUGEINT))
                  // 1000000 AS BIGINT) AS est_rolling
      FROM (SELECT d, COUNT(*) AS n, SUM({two55} >> max_rho) AS s_present
            FROM win_regs GROUP BY 1)
    ),
    exact AS (
      SELECT days.d AS d,
             CAST(COUNT(DISTINCT v.h) AS BIGINT) AS exact_rolling
      FROM days JOIN vals v
        ON v.d BETWEEN days.d - INTERVAL 2 DAY AND days.d
      GROUP BY 1
    )
    SELECT strftime(est.d, '%Y-%m-%d') AS day, est.est_rolling,
           exact.exact_rolling
    FROM est JOIN exact USING (d)
    """


@_register(
    "q173_rolling_hll_distinct",
    oracle=_q173_oracle_sql(),
    tags=("sketch", "hll", "rolling-window", "mergeable", "scale"),
)
def q173_rolling_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    _tune(spark)
    ev = load_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    daily = ev.select(F.col("ts").cast("date").alias("d"), "user_id")
    day_regs = hll_registers(daily, ["d"], "user_id")
    days = daily.select("d").distinct()
    # trailing 3-day window: each day joins the ≤3 day-states whose
    # date falls in [d-2, d] — a bounded fan-out of m-row sketches
    win_regs = (
        days.alias("w")
        .join(
            day_regs.alias("r"),
            F.col("r.d").between(
                F.date_sub(F.col("w.d"), 2), F.col("w.d")
            ),
        )
        .groupBy(F.col("w.d").alias("d"), F.col("r.__j").alias("__j"))
        .agg(F.max("r.max_rho").cast("int").alias("max_rho"))
    )
    est = hll_estimate(win_regs, ["d"]).withColumnRenamed(
        "est_distinct", "est_rolling"
    )
    exact = (
        days.alias("w")
        .join(
            daily.alias("e"),
            F.col("e.d").between(
                F.date_sub(F.col("w.d"), 2), F.col("w.d")
            ),
        )
        .groupBy(F.col("w.d").alias("d"))
        .agg(F.countDistinct("e.user_id").cast("long").alias("exact_rolling"))
    )
    return (
        est.join(exact, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "est_rolling",
            "exact_rolling",
        )
    )


# ---------------------------------------------------------------------------
# Q174 — percentile-rank scoring from the histogram CDF (the inverse
# of q165's quantile read): each probed order total is scored against
# its status group's price distribution using only the sketch — the
# normalization/calibration primitive (a model feature, an anomaly
# score) computed from ≤nbins rows of state per group. Integer
# permille with one floor division; the oracle replays CDF + lookup
# over a DENSIFIED (all-nbins) CDF — r5 upgrade matching the
# histogram_rank gap-bin fix: synthetic probes in bins guaranteed
# EMPTY at every sf (bin 0: min order total is >$1000; bin 505: max
# bin is 499) now gate the mass-below-a-gap-bin behavior the
# r4 advisor showed data-drawn probes could never reach.
# ---------------------------------------------------------------------------

_Q174_LO, _Q174_W, _Q174_NBINS = 0, 100_000, 512
# (group, sentinel key, cents) — bin 0 probe (rank 0: no mass below,
# empty bin) and bin 505 probe (rank 1000: all mass below) per status
_Q174_GAP_PROBES = [
    (g, k, c)
    for g, k in (("F", -1), ("O", -2), ("P", -3))
    for c in (50_000, 50_550_000)
]


def _dense_cdf_rank_sql(
    group: str, val: str, lo: int, width: int, nbins: int, out_select: str
) -> str:
    """The SHARED densified-CDF percentile-rank replay (sketches.py:
    histogram_rank) — one definition for the q174/q183 oracles instead
    of two drifting copies (r5 review finding). Expects prior CTEs
    ``sk`` ({group}, bin, n) and ``probes`` ({group}, <keys>, {val});
    emits the dense/cdf CTE bodies and the final SELECT producing
    ({out_select}, rank_permille)."""
    top = width * nbins - 1
    return f"""dense AS (
      SELECT gb.{group}, gb.bin, COALESCE(sk.n, 0) AS n
      FROM (SELECT {group}, b.range AS bin
            FROM (SELECT DISTINCT {group} FROM sk)
            CROSS JOIN range(0, {nbins}) b) gb
      LEFT JOIN sk ON sk.{group} = gb.{group} AND sk.bin = gb.bin
    ),
    cdf AS (
      SELECT {group}, bin, n,
             COALESCE(SUM(n) OVER (PARTITION BY {group} ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             SUM(n) OVER (PARTITION BY {group}) AS total
      FROM dense
    )
    SELECT {out_select},
           CAST(((COALESCE(cdf.cum_before, 0) * {width}
                  + COALESCE(cdf.n, 0)
                    * (LEAST(GREATEST(p.{val} - ({lo}), 0), {top})
                       % {width})) * 1000)
                // (cdf.total * {width}) AS BIGINT) AS rank_permille
    FROM probes p
    JOIN cdf ON cdf.{group} = p.{group}
            AND cdf.bin = LEAST(GREATEST((p.{val} - ({lo})) // {width}, 0),
                                {nbins - 1})
    """


@_register(
    "q174_histogram_rank",
    oracle=f"""
    WITH vals AS (
      SELECT o_orderstatus AS g, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    sk AS (
      SELECT g, LEAST(GREATEST(c // {_Q174_W}, 0), {_Q174_NBINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM vals GROUP BY 1, 2
    ),
    probes AS (
      SELECT g, o_orderkey, c FROM vals WHERE o_orderkey % 101 = 0
      UNION ALL
      SELECT * FROM (VALUES {", ".join(f"('{g}', CAST({k} AS BIGINT), CAST({c} AS BIGINT))" for g, k, c in _Q174_GAP_PROBES)}) v(g, o_orderkey, c)
    ),
    {_dense_cdf_rank_sql("g", "c", _Q174_LO, _Q174_W, _Q174_NBINS,
                         "p.g AS o_orderstatus, p.o_orderkey, p.c AS total_c")}
    """,
    tags=("sketch", "histogram", "percentile-rank", "calibration"),
)
def q174_histogram_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_build,
        histogram_rank,
    )

    _tune(spark)
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("g"),
        "o_orderkey",
        _cents(F.col("o_totalprice")).alias("total_c"),
    )
    sk = histogram_build(
        orders, ["g"], "total_c", _Q174_LO, _Q174_W, _Q174_NBINS
    )
    gap_probes = spark.createDataFrame(
        _Q174_GAP_PROBES, "g string, o_orderkey long, total_c long"
    )
    probes = orders.filter(F.col("o_orderkey") % 101 == 0).unionByName(
        gap_probes
    )
    ranked = histogram_rank(
        sk, probes, ["g"], "total_c", _Q174_LO, _Q174_W, _Q174_NBINS
    )
    return ranked.select(
        F.col("g").alias("o_orderstatus"),
        "o_orderkey",
        "total_c",
        "rank_permille",
    )


# ---------------------------------------------------------------------------
# Q175 — RECURSIVE CTE (Spark 4's native WITH RECURSIVE, §2.7): a
# compounding schedule — bal_{k+1} = bal_k + trunc(bal_k·5%) for six
# periods per sampled customer — iterated integer arithmetic no
# closed-form window can express. Both engines run the SAME recursion
# (UNION ALL + level bound; Spark does not yet support UNION-dedup
# recursion); integer division TRUNCATES in both (Spark div, DuckDB
# //), so negative balances round identically. Until this round the
# engine's only recursion was driver-side loops (q43's connected
# components); this gates the in-engine fixpoint surface.
# ---------------------------------------------------------------------------

@_register(
    "q175_recursive_compound",
    oracle="""
    WITH RECURSIVE sched AS (
      SELECT c_custkey, 0 AS k,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer WHERE c_custkey % 50 = 0
      UNION ALL
      SELECT c_custkey, k + 1, bal_c + (bal_c * 50) // 1000
      FROM sched WHERE k < 6
    )
    SELECT c_custkey, CAST(k AS BIGINT) AS k, bal_c FROM sched
    """,
    tags=("sql-surface", "recursive-cte", "iteration"),
)
def q175_recursive_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q175_customer")
    return spark.sql(
        """
        WITH RECURSIVE sched AS (
          SELECT c_custkey, 0 AS k,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
          FROM q175_customer WHERE c_custkey % 50 = 0
          UNION ALL
          SELECT c_custkey, k + 1, bal_c + (bal_c * 50) div 1000
          FROM sched WHERE k < 6
        )
        SELECT c_custkey, CAST(k AS BIGINT) AS k, bal_c FROM sched
        """
    )


# ---------------------------------------------------------------------------
# Q176 — recursive DAG traversal in-engine: near-dup edges directed
# low→high doc id form a DAG; WITH RECURSIVE walks each node's
# downstream closure and counts distinct descendants — the
# graph-reachability shape q43 could only run as a driver-side loop
# before Spark 4's recursion. UNION ALL + level bound (Spark's
# recursion has no dedup mode) with an outer DISTINCT collapsing
# path multiplicity; both engines run the same text, and the shingle
# construction mirrors the established q43/q77 cross-dialect parity.
# ---------------------------------------------------------------------------

@_register(
    "q176_recursive_closure",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+1], ' ')
                            for i in range(1, len(toks))]) AS shingles
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                               t -> t <> '') AS toks
            FROM documents WHERE doc_id < 120)
      WHERE len(toks) >= 2
    ),
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.08
    ),
    walk AS (
      SELECT src, dst, 1 AS lvl FROM edges
      UNION ALL
      SELECT w.src, e.dst, w.lvl + 1
      FROM walk w JOIN edges e ON w.dst = e.src
      WHERE w.lvl < 10
    )
    SELECT src AS doc_id,
           CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_descendants
    FROM walk GROUP BY 1
    """,
    tags=("sql-surface", "recursive-cte", "graph", "dag"),
)
def q176_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 120
    ).createOrReplaceTempView("q176_documents")
    # edge construction as its own view: Spark 4's recursion resolver
    # does not yet allow the self-referencing CTE to sit behind
    # sibling CTEs in one WITH list
    spark.sql(
        r"""
        WITH sh AS (
          SELECT doc_id,
                 array_distinct(transform(
                   sequence(0, size(toks) - 2),
                   i -> array_join(slice(toks, i + 1, 2), ' ')
                 )) AS shingles
          FROM (SELECT doc_id,
                       filter(split(trim(lower(text)), '\\s+'),
                              t -> t != '') AS toks
                FROM q176_documents)
          WHERE size(toks) >= 2
        )
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(size(array_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (size(a.shingles) + size(b.shingles)
                 - size(array_intersect(a.shingles, b.shingles))) >= 0.08
        """
    ).createOrReplaceTempView("q176_edges")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT src, dst, 1 AS lvl FROM q176_edges
          UNION ALL
          SELECT w.src, e.dst, w.lvl + 1
          FROM walk w JOIN q176_edges e ON w.dst = e.src
          WHERE w.lvl < 10
        )
        SELECT src AS doc_id,
               CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_descendants
        FROM walk GROUP BY src
        """
    )


# ---------------------------------------------------------------------------
# Q177 — corpus pipeline END-TO-END gate: exact dedup (q15's
# fingerprint) → per-source token-budget mixture fill (q159's greedy
# hash-order fill) → sharded sequence packing (q82's running-offset
# layout), summarized per source. Each stage is individually gated;
# THIS row proves they compose deterministically — the oracle chains
# the three stages' SQL and every count must match, which pins stage
# boundaries (survivor selection feeds the fill's totals, the fill's
# kept set feeds the packer's offsets) and not just stage internals.
# ---------------------------------------------------------------------------

@_register(
    "q177_corpus_pipeline",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             CAST(array_length(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'),
               t -> t <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    surv_ids AS (SELECT MIN(doc_id) AS doc_id FROM toks GROUP BY fp),
    sdocs AS (
      SELECT t.* FROM toks t
      WHERE t.doc_id IN (SELECT doc_id FROM surv_ids)
    ),
    tot AS (
      SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total
      FROM sdocs GROUP BY 1
    ),
    cum AS (
      SELECT s.source, s.doc_id, s.n_tok,
             COALESCE(SUM(s.n_tok) OVER (PARTITION BY s.source
               ORDER BY md5(CAST(s.doc_id AS VARCHAR))
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             (tot.total * 500) // 1000 AS budget
      FROM sdocs s JOIN tot USING (source)
    ),
    kept AS (SELECT * FROM cum WHERE cum_before < budget),
    packed AS (
      SELECT source, doc_id, n_tok,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))::INTEGER)
               % 8 AS shard
      FROM kept
    ),
    off AS (
      SELECT source, shard,
             (CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT)) // 1024
               AS seq_id
      FROM packed
    ),
    base AS (SELECT source, COUNT(*) AS n FROM toks GROUP BY 1)
    SELECT base.source,
           CAST(base.n AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM sdocs s WHERE s.source = base.source)
                AS BIGINT) AS n_survivors,
           CAST((SELECT COUNT(*) FROM kept k WHERE k.source = base.source)
                AS BIGINT) AS n_kept,
           CAST(COALESCE((SELECT SUM(k.n_tok) FROM kept k
                          WHERE k.source = base.source), 0) AS BIGINT)
             AS tokens_kept,
           CAST((SELECT COUNT(DISTINCT (o.shard, o.seq_id)) FROM off o
                 WHERE o.source = base.source) AS BIGINT) AS n_seqs_touched
    FROM base
    """,
    tags=("llm-pipeline", "end-to-end", "dedup", "mixture", "packing"),
    bench=True,
)
def q177_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.functions.text import token_count
    from us_immigration_data_lake_spark.operators.packing import pack_sequences
    from us_immigration_data_lake_spark.operators.sampling import (
        sample_bucket,
        token_budget_fill,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(normalized_text(F.col("text"))).alias("fp"),
        token_count(F.lower(F.col("text"))).cast("long").alias("n_tok"),
    )
    surv_ids = docs.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    sdocs = docs.join(surv_ids, "doc_id", "left_semi")
    kept = token_budget_fill(
        sdocs, "source", "doc_id", "n_tok", {}, default_permille=500
    )
    packed = pack_sequences(
        kept.select("doc_id", F.col("tokens").alias("n_tok")),
        "doc_id",
        "n_tok",
        budget=1024,
        shard_col=sample_bucket("doc_id", 8).cast("long"),
    )
    seqs = (
        kept.select("source", "doc_id")
        .join(packed.select("doc_id", "shard", "seq_id"), "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct(F.struct("shard", "seq_id"))
            .cast("long")
            .alias("n_seqs_touched")
        )
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    surv_cnt = sdocs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_survivors")
    )
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("tokens").cast("long").alias("tokens_kept"),
    )
    return (
        base.join(surv_cnt, "source")
        .join(kept_agg, "source", "left")
        .join(seqs, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_survivors",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).cast("long").alias("tokens_kept"),
            F.coalesce("n_seqs_touched", F.lit(0))
            .cast("long")
            .alias("n_seqs_touched"),
        )
    )


# ---------------------------------------------------------------------------
# Q178 — scalar string-function breadth #2 (§2.6, complements q31):
# levenshtein / lpad / repeat / translate / left / right / split_part
# over supplier names, probed for cross-engine parity before landing
# (all seven agree byte-for-byte between Spark and DuckDB; overlay
# was probed and EXCLUDED — DuckDB only accepts the PLACING syntax
# Spark lacks).
# ---------------------------------------------------------------------------

@_register(
    "q178_string_breadth",
    oracle="""
    SELECT s_suppkey,
           levenshtein(s_name, 'Supplier#1') AS lev_to_one,
           lpad(CAST(s_suppkey AS VARCHAR), 6, '0') AS padded_key,
           left(s_name, 4) AS name_left,
           right(s_name, 3) AS name_right,
           split_part(s_name, '#', 2) AS name_num,
           translate(s_name, '#', '-') AS name_dashed,
           repeat(left(s_name, 1), 3) AS tripled
    FROM supplier WHERE s_suppkey % 7 = 0
    """,
    tags=("scalar-functions", "strings", "sql-surface"),
)
def q178_string_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 7 == 0)
    return supp.select(
        "s_suppkey",
        F.levenshtein(F.col("s_name"), F.lit("Supplier#1")).alias("lev_to_one"),
        F.lpad(F.col("s_suppkey").cast("string"), 6, "0").alias("padded_key"),
        F.expr("left(s_name, 4)").alias("name_left"),
        F.expr("right(s_name, 3)").alias("name_right"),
        F.expr("split_part(s_name, '#', 2)").alias("name_num"),
        F.translate(F.col("s_name"), "#", "-").alias("name_dashed"),
        F.repeat(F.expr("left(s_name, 1)"), 3).alias("tripled"),
    )


# ---------------------------------------------------------------------------
# Q179 — calendar-function breadth #2 (§2.6, complements q52):
# week/quarter truncation, last_day, add_months (including the
# Jan-31 + 1 month → month-end clamp both engines share), ISO
# weekofyear, dayofyear, quarter — each probed for cross-engine
# agreement before landing (DuckDB's month interval returns a
# TIMESTAMP, cast back to DATE in the oracle).
# ---------------------------------------------------------------------------

@_register(
    "q179_calendar_breadth",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
             AS week_start,
           CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
             AS quarter_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
             AS next_month,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
           CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
    FROM orders WHERE o_orderkey % 211 = 0
    """,
    tags=("scalar-functions", "calendar", "dates"),
)
def q179_calendar_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 211 == 0)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 1).alias("next_month"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.quarter(d).cast("long").alias("qtr"),
    )


# ---------------------------------------------------------------------------
# Q180 — bitwise/integer-math breadth (§2.6): and/or/xor, shifts,
# popcount, hex, abs/sign, positive modulus, factorial — probed for
# cross-engine agreement first (DuckDB spells xor()/<<>>/explicit
# pmod; Spark's sign() returns DOUBLE, cast to BIGINT both sides;
# DuckDB's factorial() returns HUGEINT where Spark returns BIGINT,
# so the oracle casts it down — values are identical, only the
# declared type differed, and the driver hash is type-sensitive).
# Bit manipulation is the substrate the sketch family builds on;
# this row gates the primitives directly.
# ---------------------------------------------------------------------------

@_register(
    "q180_bitmath_breadth",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_partkey & 1023 AS and_mask,
           l_partkey | 4096 AS or_mask,
           xor(l_partkey, l_suppkey) AS xored,
           l_suppkey << 4 AS shifted_l,
           l_partkey >> 3 AS shifted_r,
           CAST(bit_count(CAST(l_partkey AS BIGINT)) AS INTEGER) AS popcount,
           hex(l_partkey) AS hexed,
           CAST(sign(l_partkey - l_suppkey) AS BIGINT) AS sgn,
           ((l_partkey - l_suppkey) % 7 + 7) % 7 AS pos_mod,
           CAST(factorial(CAST(l_linenumber AS INTEGER)) AS BIGINT) AS fact
    FROM lineitem WHERE l_orderkey % 977 = 0
    """,
    tags=("scalar-functions", "bitwise", "math"),
)
def q180_bitmath_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 977 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_partkey & 1023").alias("and_mask"),
        F.expr("l_partkey | 4096").alias("or_mask"),
        F.expr("l_partkey ^ l_suppkey").alias("xored"),
        F.expr("shiftleft(l_suppkey, 4)").alias("shifted_l"),
        F.expr("shiftright(l_partkey, 3)").alias("shifted_r"),
        F.expr("CAST(bit_count(CAST(l_partkey AS BIGINT)) AS INT)").alias(
            "popcount"
        ),
        F.expr("hex(l_partkey)").alias("hexed"),
        F.expr("CAST(sign(l_partkey - l_suppkey) AS BIGINT)").alias("sgn"),
        F.expr("pmod(l_partkey - l_suppkey, 7)").alias("pos_mod"),
        F.expr("factorial(CAST(l_linenumber AS INT))").alias("fact"),
    )


# ---------------------------------------------------------------------------
# Q181 — semantic dedup, SemDeDup-shaped (similarity.py:semantic_dedup;
# Abbas et al. 2023): SRP-bucketed embedding near-dup pairs (exact
# cosine only WITHIN a sign bucket — the scale path whose all-pairs
# twin is q34) → connected components → keep-smallest-per-cluster,
# the same survivor convention as the MinHash text path (q43). The
# oracle replays the whole chain: literal 4×64 hyperplanes reproduce
# every bucket bit-for-bit (q24's technique), round-6 cosine decides
# pairs (q34's), WITH RECURSIVE closure labels clusters (q43's).
# ---------------------------------------------------------------------------

_Q181_BITS, _Q181_TAU = 4, 0.35


def _q181_oracle_sql() -> str:
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q181_BITS, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_Q181_BITS)
    )
    return f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket FROM base
    ), pairs AS MATERIALIZED (
      SELECT x.vec_id AS id1, y.vec_id AS id2
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {_Q181_TAU}
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    )
    SELECT d.vec_id,
           COALESCE(l.cluster, d.vec_id) AS cluster,
           d.vec_id = COALESCE(l.cluster, d.vec_id) AS keep
    FROM (SELECT vec_id FROM embeddings) d
    LEFT JOIN labels l ON d.vec_id = l.id
    """


@_register(
    "q181_semantic_dedup",
    oracle=_q181_oracle_sql(),
    tags=("similarity", "dedup", "clustering", "semdedup"),
    # r6: bench headliner — semantic dedup is the operator whose cost
    # explodes first at scale (r5 verdict ask #5), so its SRP-bucketed
    # plan gets a perf axis alongside its correctness row.
    bench=True,
)
def q181_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    # max_bucket_size=None EXPLICITLY: this row pins the uncapped
    # exact-within-bucket SemDeDup oracle semantics (and keeps the
    # super-linear shape visible in the scaling table). The API
    # default is the r7-flipped guarded path (cap=1000 + recovery) —
    # what q187 benches and what a user gets by omission.
    return sim_ops.semantic_dedup(
        emb, "vec_id", "embedding", threshold=_Q181_TAU,
        dim=EMBEDDING_DIM, num_bits=_Q181_BITS, max_bucket_size=None,
    )


# ---------------------------------------------------------------------------
# Q182 — LSH mega-bucket cap + anchor-star recovery, oracle-gated
# (operators/dedup.py:near_dup_frames recover_oversized=True): the
# 100 TB guard the corpus pipeline runs — buckets over max_bucket_size
# are EXCLUDED from all-pairs candidate generation (one boilerplate
# bucket would otherwise emit O(n²) pairs on a single reducer) and
# recovered at linear cost as anchor-star pairs (member ↔ bucket-min),
# which downstream Jaccard verification then filters exactly. q20/q55
# gate the uncapped pipeline; THIS row pins the truncation semantics
# themselves: portable hashes, cap=5 (both branches fire at every sf),
# the oracle reproduces small-bucket all-pairs ∪ mega-bucket star
# pairs before the shared verify stage.
# ---------------------------------------------------------------------------

_Q182_CAP = 5


def _q182_oracle_sql() -> str:
    return f"""
    WITH {_portable_minhash_prefix_sql(" WHERE doc_id < 100", _Q55_HASHES, _Q55_BANDS)}, sizes AS (
      SELECT band_idx, band_key, COUNT(*) AS n
      FROM bnd GROUP BY band_idx, band_key
    ), small_pairs AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bnd a
      JOIN bnd b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
      JOIN sizes s ON s.band_idx = a.band_idx AND s.band_key = a.band_key
      WHERE s.n BETWEEN 2 AND {_Q182_CAP}
    ), anchors AS (
      SELECT b.band_idx, b.band_key, MIN(b.doc_id) AS anchor
      FROM bnd b JOIN sizes s
        ON s.band_idx = b.band_idx AND s.band_key = b.band_key
      WHERE s.n > {_Q182_CAP}
      GROUP BY b.band_idx, b.band_key
    ), star_pairs AS (
      SELECT DISTINCT an.anchor AS id1, m.doc_id AS id2
      FROM anchors an
      JOIN bnd m ON m.band_idx = an.band_idx AND m.band_key = an.band_key
      WHERE an.anchor < m.doc_id
    ), cand AS (
      SELECT id1, id2 FROM small_pairs
      UNION
      SELECT id1, id2 FROM star_pairs
    ){_minhash_verify_sql(0.055)}"""


@_register(
    "q182_lsh_bucket_cap",
    oracle=_q182_oracle_sql(),
    tags=("dedup", "minhash", "lsh", "portable", "skew-guard"),
    # r6: bench headliner — the skew-guard (cap + anchor-star recovery)
    # is the branch that saves the 100 TB run; track its cost too
    # (r5 verdict ask #5).
    bench=True,
)
def q182_lsh_bucket_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    frames = dedup_ops.near_dup_frames(
        docs, "doc_id", "text", shingle_n=2, num_hashes=_Q55_HASHES,
        bands=_Q55_BANDS, threshold=0.055, max_bucket_size=_Q182_CAP,
        recover_oversized=True, portable=True,
    )
    return frames["pairs"]


# ---------------------------------------------------------------------------
# Q183 — perplexity-percentile calibration: per-document unigram
# cross-entropy (q81's micronat-exact form, textstats.py) scored as a
# permille RANK against the document's own language group's
# distribution via the histogram sketch (q174's calibration
# primitive). The cross-FAMILY composition a curriculum/filtering
# pipeline actually runs — "is this doc unusually surprising FOR ITS
# LANGUAGE?" — entirely in exact integers after the one ln() per
# census token: xent_micro = (-Σ c_dt·round(ln p ·1e6)) div n_tokens,
# histogram mass in bigints, rank one floor division. The oracle
# chains q81's census SQL with q174's densified-CDF SQL.
# ---------------------------------------------------------------------------

_Q183_LO, _Q183_W, _Q183_NBINS = 3_000_000, 10_000, 128


@_register(
    "q183_xent_calibration",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    dc AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c_dt
           FROM tok GROUP BY 1, 2),
    census AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_t
               FROM tok GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM tok),
    xent AS (
      SELECT dc.doc_id,
             CAST((-CAST(SUM(dc.c_dt
                    * CAST(ROUND(ln(CAST(census.c_t AS DOUBLE)
                          / CAST(tot.n_corpus AS DOUBLE)) * 1e6) AS BIGINT))
                    AS BIGINT)) // CAST(SUM(dc.c_dt) AS BIGINT) AS BIGINT)
               AS xent_micro
      FROM dc JOIN census USING (token) CROSS JOIN tot
      GROUP BY dc.doc_id
    ),
    probes AS (
      SELECT d.lang, x.doc_id, x.xent_micro
      FROM xent x JOIN documents d USING (doc_id)
    ),
    sk AS (
      SELECT lang,
             LEAST(GREATEST((xent_micro - {_Q183_LO}) // {_Q183_W}, 0),
                   {_Q183_NBINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM probes GROUP BY 1, 2
    ),
    {_dense_cdf_rank_sql("lang", "xent_micro", _Q183_LO, _Q183_W,
                         _Q183_NBINS,
                         "p.lang, p.doc_id, p.xent_micro")}
    """,
    tags=("llm", "perplexity", "sketch", "calibration", "composition"),
)
def q183_xent_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sketches import (
        histogram_build,
        histogram_rank,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    xent = ts_ops.unigram_cross_entropy(
        docs, "doc_id", "text", as_micronats=True
    )
    probe = xent.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang", "doc_id", "xent_micro"
    )
    sk = histogram_build(
        probe, ["lang"], "xent_micro", _Q183_LO, _Q183_W, _Q183_NBINS
    )
    ranked = histogram_rank(
        sk, probe, ["lang"], "xent_micro", _Q183_LO, _Q183_W, _Q183_NBINS
    )
    return ranked.select("lang", "doc_id", "xent_micro", "rank_permille")


# ---------------------------------------------------------------------------
# Q184 — survivor-POLICY dedup: keep the LONGEST document per near-dup
# cluster (operators/dedup.py:dedup_survivors_by) — the policy real
# corpus builds use (the longest member usually subsumes its
# near-duplicates), vs q43's keep-smallest-id convention. Same exact
# candidate generation and WITH RECURSIVE cluster fixpoint as q43;
# the survivor pick is a per-cluster max of (length, -id) — highest
# char length, ties to the smallest id, so retries can't flip it.
# ---------------------------------------------------------------------------

@_register(
    "q184_dedup_keep_longest",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE doc_id < 200
    ), sh AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_distinct([array_to_string(toks[i:i+1], ' ')
                                      for i in range(1, len(toks))])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok
    ), pairs AS MATERIALIZED (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.08
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    ), labeled AS (
      SELECT d.doc_id,
             COALESCE(l.cluster, d.doc_id) AS cluster,
             CAST(length(d.text) AS BIGINT) AS n_chars
      FROM (SELECT doc_id, text FROM documents WHERE doc_id < 200) d
      LEFT JOIN labels l ON d.doc_id = l.id
    ), best AS (
      SELECT cluster, doc_id AS survivor
      FROM (SELECT cluster, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY cluster
                     ORDER BY n_chars DESC, doc_id ASC) AS rn
            FROM labeled)
      WHERE rn = 1
    )
    SELECT lb.doc_id, lb.cluster, lb.doc_id = b.survivor AS keep
    FROM labeled lb JOIN best b USING (cluster)
    """,
    tags=("dedup", "clustering", "survivor-policy"),
)
def q184_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = dedup_ops.shingles(docs, "doc_id", "text", n=2)
    pairs = dedup_ops.postings_jaccard_pairs(sh, "doc_id", min_jaccard=0.08)
    return dedup_ops.dedup_survivors_by(
        docs, pairs.select("id1", "id2"), "doc_id",
        score=F.length("text").cast("long"),
    )


# ---------------------------------------------------------------------------
# Q185 — MinHash+LSH near-dup, PRODUCTION hash path (xxhash64): the
# bench twin of q20 (r5 verdict ask #4). q20 runs portable=True (md5)
# so DuckDB can replay every hash bit — that bought its full-table
# oracle but made the bench track a path users don't run (md5 costs
# more per call than xxhash64; q20 +35% in r5). This row runs the
# exact same plan shape with the production JVM hash so BOTH paths
# are perf-tracked and the portable-vs-production delta is a
# published number. oracle=None is deliberate and confined to this
# one row: xxhash64 is not reproducible in DuckDB, so the driver
# records the weaker rows-only gate here; the operator's CORRECTNESS
# evidence is q20/q182 (hash-oracled portable twins — identical plan,
# only the hash expression differs: operators/dedup.py:_shingle_hash)
# plus the xxhash64-path MLlib-MinHash agreement test
# (tests/test_llm_ops.py:409) and the subset/recall test in
# tests/test_llm_ops.py::test_q185_production_pairs_subset_of_exact.
# ---------------------------------------------------------------------------

@_register(
    "q185_lsh_production_hash",
    oracle=None,
    tags=("dedup", "minhash", "lsh", "bench-twin", "rows-only"),
    bench=True,
)
def q185_lsh_production_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    # identical parameters to q20 — the ONLY difference is
    # portable=False (xxhash64 shingle/band hashing, the default users
    # get), so bench deltas between the two rows isolate hash cost.
    return dedup_ops.near_dup_pairs(
        docs, "doc_id", "text", shingle_n=2, num_hashes=_Q20_HASHES,
        bands=_Q20_BANDS, threshold=0.055, portable=False,
        max_bucket_size=2**31,
    )


# ---------------------------------------------------------------------------
# Q186 — corpus-pipeline STAGE CARDINALITIES, oracle-gated (r5 verdict
# ask #7): q177 gates a stage composition's final frame; THIS row runs
# the actual product entry point `pipelines/corpus.py:
# build_training_corpus` and pins the CorpusStats counts the 100 TB
# argument rests on — input → after-quality → after-exact-dedup →
# after-near-dedup → chunks, PLUS oversized_lsh_buckets (the skew-guard
# counter: how many mega-buckets were capped and anchor-star-recovered
# instead of exploding a reducer). The oracle replays every stage in
# DuckDB: q17's quality formula gates, q15's fingerprint dedups
# exactly, q182's capped-LSH generates candidates, the shared verify
# filters them, q181's recursive closure clusters, and q49's window
# formula counts chunks. Stats are computed by the pipeline itself
# (its .count() actions), returned as a one-row frame. Config keeps
# both skew-guard branches non-vacuous at every sf (cap=5, probed) and
# the quality gate splitting (0.46 sits inside the score IQR at
# sf0.001/0.01/0.1). scrub=False / benchmark=None so the oracle stays
# hash-replayable — those two stages are row-count identities or gated
# by their own rows (PII: q51-family; decontamination: q64), and
# after_decontamination == after_quality is still a pinned equality.
# ---------------------------------------------------------------------------

_Q186_MIN_QUALITY = 0.46


def _q186_oracle_sql() -> str:
    prefix = _portable_minhash_prefix_sql(
        " WHERE doc_id IN (SELECT doc_id FROM exact_surv)",
        _Q55_HASHES, _Q55_BANDS,
    )
    sql = f"""
    WITH RECURSIVE qtok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE doc_id < 100
    ), qfeat AS (
      SELECT doc_id,
             CAST(array_length(toks) AS BIGINT) AS n_tokens,
             CAST(array_length(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks,
               t -> list_contains(['the','a','and','of','to','is','in','it'], t)))
               AS BIGINT) AS n_stop,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
               AS sum_len
      FROM qtok
    ), gate AS (
      SELECT doc_id FROM qfeat
      WHERE CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE ROUND(
              0.4 * (n_distinct / CAST(n_tokens AS DOUBLE))
              + 0.2 * LEAST((n_stop / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0)
              + 0.2 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
              + 0.2 * LEAST((sum_len / CAST(n_tokens AS DOUBLE)) / 8.0, 1.0)
            , 6) END >= {_Q186_MIN_QUALITY}
    ), exact_surv AS (
      SELECT MIN(d.doc_id) AS doc_id
      FROM documents d JOIN gate g ON d.doc_id = g.doc_id
      GROUP BY md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')))
    ), {prefix}, sizes AS (
      SELECT band_idx, band_key, COUNT(*) AS n
      FROM bnd GROUP BY band_idx, band_key
    ), small_pairs AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bnd a
      JOIN bnd b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
      JOIN sizes s ON s.band_idx = a.band_idx AND s.band_key = a.band_key
      WHERE s.n BETWEEN 2 AND {_Q182_CAP}
    ), anchors AS (
      SELECT b.band_idx, b.band_key, MIN(b.doc_id) AS anchor
      FROM bnd b JOIN sizes s
        ON s.band_idx = b.band_idx AND s.band_key = b.band_key
      WHERE s.n > {_Q182_CAP}
      GROUP BY b.band_idx, b.band_key
    ), star_pairs AS (
      SELECT DISTINCT an.anchor AS id1, m.doc_id AS id2
      FROM anchors an
      JOIN bnd m ON m.band_idx = an.band_idx AND m.band_key = an.band_key
      WHERE an.anchor < m.doc_id
    ), cand AS (
      SELECT id1, id2 FROM small_pairs
      UNION
      SELECT id1, id2 FROM star_pairs
    ), hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    ), verified AS (
      SELECT c.id1, c.id2
      FROM cand c
      JOIN hs h1 ON c.id1 = h1.doc_id
      JOIN hs h2 ON c.id2 = h2.doc_id
      WHERE CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
            / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
            >= 0.055
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM verified
      UNION SELECT id2, id1 FROM verified
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    ), nd_surv AS (
      SELECT s.doc_id FROM exact_surv s
      LEFT JOIN labels l ON s.doc_id = l.id
      WHERE COALESCE(l.cluster, s.doc_id) = s.doc_id
    ), ch AS (
      SELECT d.doc_id,
             GREATEST(CAST(ceil((len(string_split_regex(
               trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')),
               '\\s+')) - 10) / 40.0) AS BIGINT), 1) AS n_chunks
      FROM documents d JOIN nd_surv s ON d.doc_id = s.doc_id
    )
    SELECT
      CAST((SELECT COUNT(*) FROM qtok) AS BIGINT) AS input_docs,
      CAST((SELECT COUNT(*) FROM gate) AS BIGINT) AS after_quality,
      CAST((SELECT COUNT(*) FROM gate) AS BIGINT) AS after_decontamination,
      CAST((SELECT COUNT(*) FROM exact_surv) AS BIGINT) AS after_exact_dedup,
      CAST((SELECT COUNT(*) FROM nd_surv) AS BIGINT) AS after_near_dedup,
      CAST((SELECT COALESCE(SUM(n_chunks), 0) FROM ch) AS BIGINT) AS chunks,
      CAST((SELECT COUNT(*) FROM sizes WHERE n > {_Q182_CAP}) AS BIGINT)
        AS oversized_lsh_buckets
    """
    # DuckDB inlines CTEs per reference by default; the seven count
    # subqueries each re-reference the stage chain, and bnd's
    # band-select UNION ALL references sig once PER BAND — unhinted,
    # the minhash aggregation re-executes O(bands × counts) times
    # (measured: 135 s → 0.12 s at sf0.01 with hints, identical row).
    import re

    for name in (
        "qtok", "gate", "exact_surv", "hx", "sig", "bnd", "sizes",
        "cand", "hs", "verified", "labels", "nd_surv", "ch",
    ):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q186_corpus_stats",
    oracle=_q186_oracle_sql(),
    tags=("llm-pipeline", "end-to-end", "dedup", "stats", "portable"),
    bench=True,  # r7: the full corpus build's stage counts — the most
    # end-to-end composite in the registry; benched per the r6 verdict.
    # fn is EAGER (the stats ARE the pipeline's .count() actions), so
    # the type gate reads this declared DDL instead of executing the
    # whole pipeline per schema probe; the parity sweep asserts it
    # matches the executed frame's schema.
    result_schema=(
        "input_docs bigint, after_quality bigint, "
        "after_decontamination bigint, after_exact_dedup bigint, "
        "after_near_dedup bigint, chunks bigint, "
        "oversized_lsh_buckets bigint"
    ),
)
def q186_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.pipelines.corpus import (
        build_training_corpus,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    _, st = build_training_corpus(
        docs,
        min_quality=_Q186_MIN_QUALITY,
        jaccard_threshold=0.055,
        chunk_tokens=50,
        overlap=10,
        max_bucket_size=_Q182_CAP,
        scrub=False,
        shingle_n=2,
        num_hashes=_Q55_HASHES,
        bands=_Q55_BANDS,
        portable=True,
    )
    # the stats ARE the pipeline's own .count() actions — this row's
    # deliverable is those numbers, so a one-row local frame is the
    # honest result shape (no second execution of the pipeline).
    return spark.createDataFrame(
        [(
            st.input_docs, st.after_quality, st.after_decontamination,
            st.after_exact_dedup, st.after_near_dedup, st.chunks,
            st.oversized_lsh_buckets,
        )],
        "input_docs bigint, after_quality bigint, "
        "after_decontamination bigint, after_exact_dedup bigint, "
        "after_near_dedup bigint, chunks bigint, "
        "oversized_lsh_buckets bigint",
    )


# ---------------------------------------------------------------------------
# Q187 — SEMANTIC dedup with the SRP mega-bucket skew guard,
# oracle-gated (operators/similarity.py:srp_near_dup_frames →
# semantic_dedup(max_bucket_size=...)): q182 pins the cap + anchor-star
# recovery semantics for the MinHash TEXT path; THIS row pins the same
# guard on the EMBEDDING path, where it matters even more — with a
# fixed plane count, SRP bucket occupancy grows linearly with the
# corpus and within-bucket pair volume quadratically (the r6 scaling
# probe measured q181 at 21× wall-clock for 3× rows before the guard
# existed). Buckets over the cap contribute anchor-star candidates
# (member ↔ bucket-min) instead of all-pairs; exact cosine then
# filters both kinds, and the closure/survivor tail is q181's.
# 8 planes + cap=5 keep BOTH branches non-vacuous at every sf
# (probed: 123/125/73 small buckets and 11/8/169 capped buckets at
# sf0.001/0.01/0.1). The cap machinery is dedup.py's, reused
# verbatim, so text and embedding guards can never drift.
# ---------------------------------------------------------------------------

_Q187_BITS, _Q187_CAP = 8, 5


def _q187_oracle_sql() -> str:
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q187_BITS, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_Q187_BITS)
    )
    return f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS MATERIALIZED (
      SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket FROM base
    ), sizes AS MATERIALIZED (
      SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket
    ), small_pairs AS (
      SELECT x.vec_id AS id1, y.vec_id AS id2
      FROM b x
      JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      JOIN sizes s ON s.bucket = x.bucket
      WHERE s.n BETWEEN 2 AND {_Q187_CAP}
    ), anchors AS (
      SELECT m.bucket, MIN(m.vec_id) AS anchor
      FROM b m JOIN sizes s ON s.bucket = m.bucket
      WHERE s.n > {_Q187_CAP}
      GROUP BY m.bucket
    ), star_pairs AS (
      SELECT an.anchor AS id1, m.vec_id AS id2
      FROM anchors an
      JOIN b m ON m.bucket = an.bucket
      WHERE an.anchor < m.vec_id
    ), cand AS MATERIALIZED (
      SELECT id1, id2 FROM small_pairs
      UNION
      SELECT id1, id2 FROM star_pairs
    ), pairs AS MATERIALIZED (
      SELECT c.id1, c.id2
      FROM cand c
      JOIN b x ON c.id1 = x.vec_id
      JOIN b y ON c.id2 = y.vec_id
      WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {_Q181_TAU}
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    )
    SELECT d.vec_id,
           COALESCE(l.cluster, d.vec_id) AS cluster,
           d.vec_id = COALESCE(l.cluster, d.vec_id) AS keep
    FROM (SELECT vec_id FROM embeddings) d
    LEFT JOIN labels l ON d.vec_id = l.id
    """


@_register(
    "q187_semantic_dedup_capped",
    oracle=_q187_oracle_sql(),
    tags=("similarity", "dedup", "semdedup", "skew-guard"),
    # benched alongside the uncapped q181 so the scaling table
    # contrasts guarded vs unguarded semantic dedup directly
    bench=True,
)
def q187_semantic_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return sim_ops.semantic_dedup(
        emb, "vec_id", "embedding", threshold=_Q181_TAU,
        dim=EMBEDDING_DIM, num_bits=_Q187_BITS,
        max_bucket_size=_Q187_CAP, recover_oversized=True,
    )


# ---------------------------------------------------------------------------
# Q188 — JOINT text + semantic near-dup dedup, oracle-gated
# (operators/dedup.py:joint_near_dup_survivors): the union of the
# MinHash-LSH text pair graph (q20/q55/q182 machinery, portable
# hashes, bucket cap + anchor-star recovery) and the SRP-bucketed
# embedding pair graph (q181/q187 machinery, same guard) feeds ONE
# connected-components pass — a chain (A ~text~ B ~semantic~ C)
# collapses to a single survivor even though no single modality links
# A to C. This is the dedup a corpus build with both a fingerprint
# and an embedding per document actually runs (paraphrases are caught
# semantically, boilerplate edits lexically). Input: documents ⋈
# embeddings on doc_id = vec_id (the fixture's shared key space).
# The oracle replays BOTH candidate generators (q186's capped-LSH SQL
# and q187's capped-SRP SQL, parameters identical), unions the
# verified edges, and runs the recursive closure once.
# ---------------------------------------------------------------------------


def _q188_oracle_sql() -> str:
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q187_BITS, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_Q187_BITS)
    )
    prefix = _portable_minhash_prefix_sql(
        " WHERE doc_id IN (SELECT vec_id FROM embeddings)",
        _Q55_HASHES, _Q55_BANDS,
    )
    sql = f"""
    WITH RECURSIVE {prefix}, tsizes AS (
      SELECT band_idx, band_key, COUNT(*) AS n
      FROM bnd GROUP BY band_idx, band_key
    ), tsmall AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bnd a
      JOIN bnd b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
      JOIN tsizes s ON s.band_idx = a.band_idx AND s.band_key = a.band_key
      WHERE s.n BETWEEN 2 AND {_Q182_CAP}
    ), tanch AS (
      SELECT b.band_idx, b.band_key, MIN(b.doc_id) AS anchor
      FROM bnd b JOIN tsizes s
        ON s.band_idx = b.band_idx AND s.band_key = b.band_key
      WHERE s.n > {_Q182_CAP}
      GROUP BY b.band_idx, b.band_key
    ), tstar AS (
      SELECT DISTINCT an.anchor AS id1, m.doc_id AS id2
      FROM tanch an
      JOIN bnd m ON m.band_idx = an.band_idx AND m.band_key = an.band_key
      WHERE an.anchor < m.doc_id
    ), tcand AS (
      SELECT id1, id2 FROM tsmall UNION SELECT id1, id2 FROM tstar
    ), hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    ), tpairs AS (
      SELECT c.id1, c.id2
      FROM tcand c
      JOIN hs h1 ON c.id1 = h1.doc_id
      JOIN hs h2 ON c.id2 = h2.doc_id
      WHERE CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
            / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
            >= 0.055
    ), sb AS (
      SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    ), ssz AS (
      SELECT bucket, COUNT(*) AS n FROM sb GROUP BY bucket
    ), ssmall AS (
      SELECT x.vec_id AS id1, y.vec_id AS id2
      FROM sb x
      JOIN sb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      JOIN ssz s ON s.bucket = x.bucket
      WHERE s.n BETWEEN 2 AND {_Q187_CAP}
    ), sanch AS (
      SELECT m.bucket, MIN(m.vec_id) AS anchor
      FROM sb m JOIN ssz s ON s.bucket = m.bucket
      WHERE s.n > {_Q187_CAP}
      GROUP BY m.bucket
    ), sstar AS (
      SELECT an.anchor AS id1, m.vec_id AS id2
      FROM sanch an
      JOIN sb m ON m.bucket = an.bucket
      WHERE an.anchor < m.vec_id
    ), scand AS (
      SELECT id1, id2 FROM ssmall UNION SELECT id1, id2 FROM sstar
    ), spairs AS (
      SELECT c.id1, c.id2
      FROM scand c
      JOIN sb x ON c.id1 = x.vec_id
      JOIN sb y ON c.id2 = y.vec_id
      WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {_Q181_TAU}
    ), jedges AS (
      SELECT id1 AS src, id2 AS dst FROM tpairs
      UNION SELECT id2, id1 FROM tpairs
      UNION SELECT id1, id2 FROM spairs
      UNION SELECT id2, id1 FROM spairs
    ), reach AS (
      SELECT src, dst FROM jedges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN jedges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), jlabels AS (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           COALESCE(l.cluster, d.doc_id) AS cluster,
           d.doc_id = COALESCE(l.cluster, d.doc_id) AS keep
    FROM (SELECT doc_id FROM documents
          WHERE doc_id IN (SELECT vec_id FROM embeddings)) d
    LEFT JOIN jlabels l ON d.doc_id = l.id
    """
    # multi-referenced CTEs (see the MATERIALIZED note on q186): bnd
    # fans out of sig per band; hx/hs, sb, the candidate unions and
    # the closure base+step all re-reference their chain
    import re

    for name in (
        "hx", "sig", "bnd", "tsizes", "tcand", "hs", "tpairs",
        "sb", "ssz", "scand", "spairs", "jedges", "jlabels",
    ):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q188_joint_dedup",
    oracle=_q188_oracle_sql(),
    tags=("dedup", "minhash", "semdedup", "composition", "portable"),
    bench=True,  # r7: the plan a real corpus build runs (both pair
    # graphs + one CC pass); benched per the r6 verdict so its cost is
    # a measured slope next to its parents q182/q187.
)
def q188_joint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    joined = docs.join(
        emb, docs.doc_id == emb.vec_id, "inner"
    ).select("doc_id", "text", "embedding")
    return dedup_ops.joint_near_dup_survivors(
        joined, "doc_id", "text", "embedding", dim=EMBEDDING_DIM,
        jaccard_threshold=0.055, cosine_threshold=_Q181_TAU,
        shingle_n=2, num_hashes=_Q55_HASHES, bands=_Q55_BANDS,
        num_bits=_Q187_BITS, seed=42, max_bucket_size=_Q182_CAP,
        portable=True,
    )


# ---------------------------------------------------------------------------
# Q189 — exact substring dedup (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — the ExactSubstr pass), Spark-shaped
# as a k-token shingle inverted index instead of the paper's single-machine
# suffix array (operators/dedup.py:971). Removes repeated >= k-token runs
# ACROSS documents, keeping each repeat's canonical (corpus-smallest
# (id, pos)) occurrence; output is every doc with its cleaned text plus
# span accounting. PORTABLE mode (md5_long shingle hashes) so DuckDB can
# replay the exact hash, canonical pick, interval merge, and token
# deletion. k=10 at test scale (docs average ~55 tokens; the operator
# default k=50 targets real corpora). The reference has no substring-level
# operator (whole-row dropDuplicates only, etl.py:209) — this is the
# standard production complement to MinHash whole-doc near-dup (q20).
# ---------------------------------------------------------------------------

_Q189_K = 10


def _q189_oracle_sql() -> str:
    k = _Q189_K
    sql = f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS t
      FROM documents
    ), occ AS (
      SELECT doc_id, pos,
             ('0x' || substr(md5(array_to_string(t[pos+1:pos+{k}], ' ')),
                             1, 15))::BIGINT AS h
      FROM (SELECT doc_id, t, unnest(range(0, len(t) - {k} + 1)) AS pos
            FROM tok WHERE len(t) >= {k})
    ), marked AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               COUNT(*) OVER (PARTITION BY h) AS n,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos) AS rn
        FROM occ)
      WHERE n >= 2 AND rn > 1
    ), flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + {k}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      -1) THEN 1 ELSE 0 END AS new_span
      FROM marked
    ), numbered AS (
      SELECT doc_id, pos,
             SUM(new_span)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span
      FROM flagged
    ), spans AS (
      SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {k} AS span_end
      FROM numbered GROUP BY doc_id, span
    ), per_doc AS (
      SELECT doc_id,
             SUM(span_end - span_start) AS removed_tokens,
             COUNT(*) AS n_spans
      FROM spans GROUP BY doc_id
    ), posn AS (
      SELECT tok.doc_id, p.pos, t[p.pos+1] AS tokval
      FROM tok, LATERAL (SELECT unnest(range(0, len(t))) AS pos) p
    ), kept AS (
      SELECT doc_id, pos, tokval FROM posn p
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = p.doc_id
                          AND p.pos >= s.span_start
                          AND p.pos < s.span_end)
    ), rebuilt AS (
      SELECT doc_id,
             COALESCE(string_agg(tokval, ' ' ORDER BY pos), '') AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT tok.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           len(tok.t)::BIGINT AS n_tokens,
           COALESCE(p.removed_tokens, 0)::BIGINT AS removed_tokens,
           COALESCE(p.n_spans, 0)::BIGINT AS n_spans
    FROM tok
    LEFT JOIN rebuilt r ON tok.doc_id = r.doc_id
    LEFT JOIN per_doc p ON tok.doc_id = p.doc_id
    """
    # tok fans out 3 ways, spans 2 ways (see the MATERIALIZED note on
    # q186 for the measured rationale)
    import re

    for name in ("tok", "marked", "spans"):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q189_exact_substring_dedup",
    oracle=_q189_oracle_sql(),
    tags=("dedup", "substring", "llm-pipeline", "portable"),
    bench=True,  # r7: new operator this round — inverted-index span
    # merge is shuffle-bound on the shingle key; benched from day one.
)
def q189_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.remove_repeated_substrings(
        docs, "doc_id", "text", k=_Q189_K, portable=True
    )


# ---------------------------------------------------------------------------
# Q190 — CROSS-corpus near-dup dedup (operators/dedup.py:
# cross_near_dup_frames, new r7): which docs of a NEW batch are
# MinHash-LSH near-dups of a fixed REFERENCE corpus — the
# incremental-ingest dedup (this week's crawl vs the training set you
# already have). Candidate generation is ONE new×ref equi-join on the
# band key (never a self-join — at 100 TB the reference is the big
# side and skipping its self-pairs is most of the work); ref-side
# mega-buckets keep their cap smallest ids (bounded join fan-out,
# observable truncation). Portable hashes; the oracle replays the
# shared signature/band SQL once over the union (signatures are pure
# per-row functions of text, so per-side computation is identical),
# splits sides by doc_id parity, replicates the ref-side cap with a
# ROW_NUMBER window, and runs the cross verify. cap=5 so the
# truncation branch fires at every sf (q182's convention).
# The reference has no cross-corpus surface at all (etl.py:209
# dropDuplicates is whole-frame only).
# ---------------------------------------------------------------------------

_Q190_CAP = 5


def _q190_oracle_sql() -> str:
    sql = f"""
    WITH {_portable_minhash_prefix_sql(" WHERE doc_id < 200", _Q55_HASHES, _Q55_BANDS)}, refb AS (
      SELECT band_idx, band_key, doc_id FROM bnd WHERE doc_id % 2 = 0
    ), newb AS (
      SELECT band_idx, band_key, doc_id FROM bnd WHERE doc_id % 2 = 1
    ), capped AS (
      SELECT band_idx, band_key, doc_id FROM (
        SELECT band_idx, band_key, doc_id,
               ROW_NUMBER() OVER (PARTITION BY band_idx, band_key
                                  ORDER BY doc_id) AS rn
        FROM refb
      ) WHERE rn <= {_Q190_CAP}
    ), cand AS (
      SELECT DISTINCT n.doc_id AS id_new, c.doc_id AS id_ref
      FROM newb n
      JOIN capped c ON n.band_idx = c.band_idx AND n.band_key = c.band_key
    ), hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    )
    SELECT * FROM (
      SELECT c.id_new, c.id_ref,
             CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
               / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
               AS jaccard
      FROM cand c
      JOIN hs h1 ON c.id_new = h1.doc_id
      JOIN hs h2 ON c.id_ref = h2.doc_id
    ) WHERE jaccard >= 0.055
    """
    import re

    for name in ("tok", "sh", "hx", "bnd", "refb", "cand", "hs"):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q190_cross_corpus_dedup",
    oracle=_q190_oracle_sql(),
    tags=("dedup", "minhash", "lsh", "cross-corpus", "portable"),
)
def q190_cross_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    new_df = docs.filter(F.col("doc_id") % 2 == 1)
    ref_df = docs.filter(F.col("doc_id") % 2 == 0)
    return dedup_ops.cross_near_dup_frames(
        new_df, ref_df, "doc_id", "text", shingle_n=2,
        num_hashes=_Q55_HASHES, bands=_Q55_BANDS, threshold=0.055,
        max_bucket_size=_Q190_CAP, portable=True,
    )["pairs"]


# ---------------------------------------------------------------------------
# Q191 — DSIR importance resampling (operators/sampling.py:
# dsir_select, new r7 — Xie et al., NeurIPS 2023, arXiv:2302.03169):
# select the 50 documents whose hashed-ngram (unigram+bigram)
# distribution is most target-like, target = the corpus's English
# docs, via Gumbel-top-k over exact-micronat importance log-weights.
# Every log-probability integer-izes per BUCKET (the q81 micronat
# pattern), the per-doc sum is order-free BIGINT arithmetic, and the
# Gumbel perturbation derives from md5 hex digits 21-32 of the id —
# the oracle replays buckets, censuses, smoothing, rounding, and the
# Gumbel draw bit-for-bit. Selection stability at the k-boundary has
# q80's ≤1-ulp ln() exposure, measured-clean (same family of keys).
# ---------------------------------------------------------------------------

_Q191_BUCKETS, _Q191_K = 4096, 50


def _q191_oracle_sql() -> str:
    b, k = _Q191_BUCKETS, _Q191_K
    sql = f"""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, lang, unnest(toks) AS gram FROM tok
      UNION ALL
      SELECT doc_id, lang,
             unnest(CASE WHEN len(toks) >= 2
                         THEN [array_to_string(toks[i:i+1], ' ')
                               for i in range(1, len(toks))]
                         ELSE CAST([] AS VARCHAR[]) END) AS gram
      FROM tok
    ), gb AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(gram), 1, 15))::BIGINT) % {b} AS bucket
      FROM g
    ), dc AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c_db
      FROM gb GROUP BY 1, 2
    ), rawc AS (
      SELECT bucket, CAST(SUM(c_db) AS BIGINT) AS cr FROM dc GROUP BY 1
    ), tgtc AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
      FROM gb WHERE lang = 'en' GROUP BY 1
    ), nr AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_r FROM rawc),
    nt AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_t FROM tgtc),
    lw AS (
      SELECT dc.doc_id,
             CAST(SUM(dc.c_db) AS BIGINT) AS n_feats,
             CAST(SUM(dc.c_db * (
               CAST(ROUND(ln((COALESCE(tgtc.ct, 0) + 1)
                          / CAST(nt.n_t + {b} AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(ROUND(ln((rawc.cr + 1)
                          / CAST(nr.n_r + {b} AS DOUBLE)) * 1e6) AS BIGINT)
             )) AS BIGINT) AS logratio_micro
      FROM dc
      JOIN rawc USING (bucket)
      LEFT JOIN tgtc USING (bucket)
      CROSS JOIN nr CROSS JOIN nt
      GROUP BY dc.doc_id
    )
    SELECT doc_id, n_feats, logratio_micro,
           logratio_micro
           + CAST(ROUND(-ln(-ln(
               ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 21, 12))::BIGINT) + 1)
               / 281474976710657.0)) * 1e6) AS BIGINT) AS key_micro
    FROM lw
    ORDER BY key_micro DESC, doc_id ASC
    LIMIT {k}
    """
    import re

    for name in ("tok", "g", "gb", "dc", "rawc", "tgtc"):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q191_dsir_selection",
    oracle=_q191_oracle_sql(),
    tags=("llm", "sampling", "dsir", "selection", "portable"),
    bench=True,  # r7: the data-selection family's perf axis — its one
    # corpus-order stage is the tokenize scan; slope measured in SCALE.md
)
def q191_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import dsir_select

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    return dsir_select(
        docs, target, "doc_id", "text", k=_Q191_K,
        num_buckets=_Q191_BUCKETS, portable=True,
    )


# ---------------------------------------------------------------------------
# Q192 — CROSS-corpus SEMANTIC dedup (operators/similarity.py:
# cross_srp_near_dup_frames, new r7): the embedding-side twin of q190
# — which NEW vectors are cosine near-dups of a fixed REFERENCE
# corpus. One new×ref equi-join on the SRP bucket key (never a
# self-join), ref-side buckets capped to their smallest ids with
# observable truncation, exact cosine verify across frames. The
# oracle computes the signature once over all embeddings (a vector's
# bucket is frame-independent), splits sides by vec_id parity,
# replicates the cap with ROW_NUMBER, and cross-verifies. cap=5 so
# the truncation branch fires at every sf (q187's convention).
# ---------------------------------------------------------------------------

_Q192_CAP = 5


def _q192_oracle_sql() -> str:
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q187_BITS, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_Q187_BITS)
    )
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS MATERIALIZED (
      SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket FROM base
    ), capped AS MATERIALIZED (
      SELECT bucket, vec_id FROM (
        SELECT bucket, vec_id,
               ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
        FROM b WHERE vec_id % 2 = 0
      ) WHERE rn <= {_Q192_CAP}
    ), cand AS MATERIALIZED (
      SELECT DISTINCT n.vec_id AS id_new, c.vec_id AS id_ref
      FROM b n JOIN capped c ON n.bucket = c.bucket
      WHERE n.vec_id % 2 = 1
    )
    SELECT * FROM (
      SELECT c.id_new, c.id_ref,
             ROUND(list_cosine_similarity(x.v, y.v), 6) AS cosine_sim
      FROM cand c
      JOIN b x ON c.id_new = x.vec_id
      JOIN b y ON c.id_ref = y.vec_id
    ) WHERE cosine_sim >= {_Q181_TAU}
    """


@_register(
    "q192_cross_semantic_dedup",
    oracle=_q192_oracle_sql(),
    tags=("similarity", "dedup", "semdedup", "cross-corpus", "skew-guard"),
)
def q192_cross_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    new_df = emb.filter(F.col("vec_id") % 2 == 1)
    ref_df = emb.filter(F.col("vec_id") % 2 == 0)
    return sim_ops.cross_srp_near_dup_frames(
        new_df, ref_df, "vec_id", "embedding", threshold=_Q181_TAU,
        dim=EMBEDDING_DIM, num_bits=_Q187_BITS, max_bucket_size=_Q192_CAP,
    )["pairs"]


# ---------------------------------------------------------------------------
# Q193 — hybrid-retrieval Reciprocal Rank Fusion (operators/
# retrieval.py:rrf_fuse, new r7 — Cormack et al., SIGIR 2009): fuse
# the lexical BM25 top-20 (q58's exact machinery and terms) with the
# semantic cosine top-20 for query vector 0 (q22's knn machinery)
# into one list, rrf(d) = Σ 1e6 div (60 + rank) in exact BIGINTs.
# The oracle nests q58's oracle verbatim as the lexical CTE (one
# definition, zero drift), replays the knn ranking for vec 0, and
# fuses with the identical integer floor-division arithmetic.
# ---------------------------------------------------------------------------


def _q193_oracle_sql() -> str:
    lex_sql = QUERIES["q58_bm25_multiterm"].oracle
    return f"""
    WITH lex AS (
      {lex_sql}
    ), sem AS (
      SELECT neighbor_id AS doc_id, rn AS rnk FROM (
        SELECT c.vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC,
                          c.vec_id) AS BIGINT) AS rn
        FROM (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0) q,
             (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
              WHERE vec_id != 0) c
      ) WHERE rn <= 20
    ), un AS (
      SELECT doc_id, rnk FROM lex
      UNION ALL
      SELECT doc_id, rnk FROM sem
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_systems,
           CAST(SUM(1000000 // (60 + rnk)) AS BIGINT) AS rrf_micro
    FROM un GROUP BY doc_id
    ORDER BY rrf_micro DESC, doc_id
    LIMIT 10
    """


@_register(
    "q193_rrf_hybrid_retrieval",
    oracle=_q193_oracle_sql(),
    tags=("search", "retrieval", "rrf", "fusion", "topk"),
)
def q193_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.retrieval import rrf_fuse

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = ts_ops.bm25_multiterm_topk(
        docs, "doc_id", "text", terms=("vector", "merge", "filter"), k=20
    ).select("doc_id", "rnk")
    sem = sim_ops.cosine_knn(
        emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=20
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rn").alias("rnk"))
    return rrf_fuse([lex, sem], "doc_id", "rnk", k0=60, k=10)


# ---------------------------------------------------------------------------
# Q194 — BPE merge training (operators/textstats.py:bpe_merges, new r7
# — Sennrich et al., ACL 2016): learn the first 4 byte-pair-encoding
# merges from the corpus, in-engine. Each round is a deterministic
# argmax over weighted adjacent-symbol pair counts (ties lexicographic
# on (l, r)) followed by a left-to-right non-overlapping merge fold —
# the oracle unrolls all 4 rounds as generated CTE blocks, replaying
# the fold with a DuckDB list_reduce over a '|'-delimited accumulator
# (safe here: corpus tokens are whitespace-split words, never
# containing '|'; the Spark side uses a genuine array fold with no
# delimiter encoding). Exact integers and strings end to end — no
# doubles anywhere, so the merge table is bit-reproducible.
# ---------------------------------------------------------------------------

_Q194_MERGES = 4


def _q194_oracle_sql() -> str:
    n = _Q194_MERGES
    rounds = []
    for k in range(n):
        rounds.append(f"""p{k} AS MATERIALIZED (
      SELECT p[1] AS l, p[2] AS r, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (
        SELECT unnest(CASE WHEN len(symbols) >= 2
                           THEN [[symbols[i], symbols[i+1]]
                                 for i in range(1, len(symbols))]
                           ELSE CAST([] AS VARCHAR[][]) END) AS p,
               cnt
        FROM s{k}
      ) GROUP BY 1, 2
    ), m{k} AS MATERIALIZED (
      SELECT l, r, pair_count FROM p{k}
      ORDER BY pair_count DESC, l, r LIMIT 1
    ), s{k + 1} AS MATERIALIZED (
      SELECT list_filter(string_split(
               list_reduce(list_prepend('', symbols),
                 (acc, x) -> CASE
                   WHEN ends_with(acc, '|' || m.l) AND x = m.r
                   THEN substr(acc, 1, length(acc) - length(m.l) - 1)
                        || '|' || m.l || m.r
                   ELSE acc || '|' || x END),
               '|'), s -> s <> '') AS symbols,
             cnt
      FROM s{k} CROSS JOIN m{k} m
    )""")
    finals = "\n    UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS rank, l AS \"left\", r AS \"right\","
        f" l || r AS merged, pair_count FROM m{k}"
        for k in range(n)
    )
    blocks = ", ".join(rounds)
    return f"""
    WITH words AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                  t -> t <> '')) AS w
        FROM documents
      ) GROUP BY w
    ), s0 AS MATERIALIZED (
      SELECT [w[i] for i in range(1, length(w)+1)] AS symbols, cnt FROM words
    ), {blocks}
    SELECT * FROM ({finals}) ORDER BY rank
    """


@_register(
    "q194_bpe_merges",
    oracle=_q194_oracle_sql(),
    tags=("llm", "tokenizer", "bpe", "iterative", "portable"),
    bench=True,  # r7: the tokenizer-induction family's perf axis — one
    # corpus-order census, then vocab-sized rounds; slope in SCALE.md
    # fn is EAGER (each merge round collects its argmax row), so the
    # type gate reads this declared DDL instead of executing all
    # rounds per schema probe (q186's convention); the parity sweep
    # pins it to the executed frame's schema.
    result_schema=(
        "rank bigint, left string, right string, "
        "merged string, pair_count bigint"
    ),
)
def q194_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.bpe_merges(docs, "text", n_merges=_Q194_MERGES)


# ---------------------------------------------------------------------------
# Q195 — STREAMING cross-corpus dedup (streaming/dedup.py:
# stream_cross_near_dup_pairs, new r7): q190's semantics with the NEW
# batch arriving as a document STREAM — the continuous-ingest shape
# (dedupe the crawl against the training set as it lands). The whole
# hot path is stateless per row (shingle/signature/band arithmetic,
# shingle sets carried through the band explode), candidates + exact
# verify ride ONE stream-static join against the cached capped
# reference lookup, and the only streaming state is the final
# pair-key dropDuplicates. availableNow emission is batch-equivalent
# by construction, so the oracle IS q190's SQL, verbatim — the two
# rows gate the same answer through the batch and streaming engines.
# ---------------------------------------------------------------------------


@_register(
    "q195_stream_cross_dedup",
    oracle=_q190_oracle_sql(),
    tags=("streaming", "dedup", "minhash", "cross-corpus", "portable"),
)
def q195_stream_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.sources.readers import (
        read_parquet_stream,
    )
    from us_immigration_data_lake_spark.streaming.dedup import (
        stream_cross_near_dup_pairs,
    )
    from us_immigration_data_lake_spark.streaming.windows import run_to_memory

    _tune(spark)
    stream = read_parquet_stream(
        spark, f"{sf_dir.rstrip('/')}/documents*.parquet"
    ).filter((F.col("doc_id") < 200) & (F.col("doc_id") % 2 == 1))
    ref_df = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 200) & (F.col("doc_id") % 2 == 0))
    )
    pairs = stream_cross_near_dup_pairs(
        stream, ref_df, "doc_id", "text", shingle_n=2,
        num_hashes=_Q55_HASHES, bands=_Q55_BANDS, threshold=0.055,
        max_bucket_size=_Q190_CAP, portable=True,
    )
    return run_to_memory(pairs, _sink_name("q195_pairs"), mode="append")


# ---------------------------------------------------------------------------
# Q196 — sorted-neighborhood dedup (operators/dedup.py:
# sorted_neighborhood_pairs, new r7 — Hernández & Stolfo, SIGMOD 1995):
# the third candidate-generation family next to LSH banding (q20/q182)
# and prefix-filtered set-similarity (q166). Rows ranked by
# (16-char normalized-text prefix, doc_id) — the engine side computes
# the rank with the two-phase range-partition + per-partition-window
# form (windows.global_row_number), NEVER a single-partition global
# window; the oracle's plain ROW_NUMBER() OVER (ORDER BY ...) is the
# same total order, so ranks agree — then each row is a candidate
# against the 3 rows that follow, with the shared exact hashed-shingle
# Jaccard verify. Candidate volume is exactly n·w by construction (no
# bucket-skew mode to guard).
# ---------------------------------------------------------------------------

_Q196_WINDOW, _Q196_PREFIX = 3, 16


def _q196_oracle_sql() -> str:
    sql = f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks,
             substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                    1, {_Q196_PREFIX}) AS key
      FROM documents
    ), sh AS (
      SELECT doc_id, key,
             CASE WHEN len(toks) >= 2
                  THEN list_distinct([array_to_string(toks[i:i+1], ' ')
                                      for i in range(1, len(toks))])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok
    ), hx AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
    ), hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    ), rnk AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY key, doc_id) AS BIGINT) AS r
      FROM sh
    ), cand AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM rnk a JOIN rnk b ON b.r > a.r AND b.r <= a.r + {_Q196_WINDOW}
    )
    SELECT * FROM (
      SELECT c.id1, c.id2,
             CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
               / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
               AS jaccard
      FROM cand c
      JOIN hs h1 ON c.id1 = h1.doc_id
      JOIN hs h2 ON c.id2 = h2.doc_id
    ) WHERE jaccard >= 0.055
    """
    import re

    for name in ("tok", "sh", "hx", "hs", "rnk", "cand"):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q196_sorted_neighborhood",
    oracle=_q196_oracle_sql(),
    tags=("dedup", "sorted-neighborhood", "blocking", "portable"),
)
def q196_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.sorted_neighborhood_pairs(
        docs, "doc_id", "text", window=_Q196_WINDOW,
        key_prefix_len=_Q196_PREFIX, threshold=0.055, shingle_n=2,
        portable=True,
    )


# ---------------------------------------------------------------------------
# Q197 — bounded edit-distance similarity join (operators/dedup.py:
# edit_distance_pairs, new r7 — q-gram filtering, Gravano et al. VLDB
# 2001): all name pairs within levenshtein distance 2, names being the
# 16-char lowercased text prefix over the doc_id<300 slice. The engine
# prunes via the shared-q-gram pigeonhole (+ a length-band residual
# block for strings too short for the bound); the oracle is the
# BRUTE-FORCE SPEC — every pair, plain levenshtein() — so the gate
# proves the pruning loses nothing (the q166 spec-oracle convention).
# ASCII-only guard on the name: DuckDB's levenshtein is BYTE-level on
# multibyte text (measured: zh 4-char edit = 3 bytes) while Spark's is
# codepoint-level — the one semantic the two engines genuinely
# disagree on, excluded rather than papered over.
# ---------------------------------------------------------------------------

_Q197_D, _Q197_PREFIX = 2, 16


@_register(
    "q197_edit_distance_join",
    oracle=f"""
    WITH s AS MATERIALIZED (
      SELECT doc_id, substr(lower(text), 1, {_Q197_PREFIX}) AS name
      FROM documents
      WHERE doc_id < 300
        AND regexp_matches(substr(lower(text), 1, {_Q197_PREFIX}), '^[ -~]*$')
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS distance
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE abs(length(a.name) - length(b.name)) <= {_Q197_D}
      AND levenshtein(a.name, b.name) <= {_Q197_D}
    """,
    tags=("dedup", "edit-distance", "passjoin", "spec-oracle", "portable"),
)
def q197_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    _tune(spark)
    named = (
        docs.filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.substring(F.lower(F.col("text")), 1, _Q197_PREFIX).alias("name"),
        )
        .filter(F.col("name").rlike("^[ -~]*$"))
    )
    return dedup_ops.edit_distance_pairs(
        named, "doc_id", "name", max_distance=_Q197_D
    )


# ---------------------------------------------------------------------------
# Q198 — Holt linear-trend smoothing + forecast per event type
# (operators/regress.py:holt_linear, new r7 — Holt 1957): daily
# event-value series per type folded through the recursive
# level/trend smoother in exact fixed-point (BIGINT micro-units,
# permille coefficients, engine-agreed FLOOR division — Spark's div
# truncates, DuckDB's // floors, and negative trends hit the
# difference, so both sides divide via the pmod-subtraction form).
# The engine runs the entire recursion as ONE per-row aggregate()
# fold over the collected ordered series; the oracle replays it with
# a RECURSIVE CTE stepping i → i+1. Complements ewma_smooth (q112's
# FIR kernel) with the true recursive smoother + h-step forecast.
# ---------------------------------------------------------------------------

_Q198_A, _Q198_B, _Q198_H = 300, 100, 7


def _q198_oracle_sql() -> str:
    a, b, h = _Q198_A, _Q198_B, _Q198_H

    def fdiv(expr: str) -> str:
        return f"((({expr}) - ((({expr}) % 1000) + 1000) % 1000) // 1000)"

    l_new = fdiv(f"{a} * s.x * 1000000 + {1000 - a} * (r.l + r.b)")
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), idx AS MATERIALIZED (
      SELECT event_type, x,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                  AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM daily
    ), rec AS (
      SELECT a.event_type, CAST(2 AS BIGINT) AS i, a.n,
             b2.x * 1000000 AS l,
             (b2.x - a.x) * 1000000 AS b
      FROM idx a JOIN idx b2
        ON b2.event_type = a.event_type AND b2.i = 2
      WHERE a.i = 1 AND a.n >= 2
      UNION ALL
      SELECT r.event_type, r.i + 1, r.n,
             {l_new} AS l,
             {fdiv(f"{b} * (({l_new}) - r.l) + {1000 - b} * r.b")} AS b
      FROM rec r JOIN idx s
        ON s.event_type = r.event_type AND s.i = r.i + 1
    ), finals AS (
      SELECT event_type, n, l AS level_e6, b AS trend_e6 FROM rec WHERE i = n
      UNION ALL
      SELECT event_type, n, x * 1000000, CAST(0 AS BIGINT)
      FROM idx WHERE n = 1 AND i = 1
    )
    SELECT event_type, n, level_e6, trend_e6,
           level_e6 + {h} * trend_e6 AS forecast_e6
    FROM finals
    """


@_register(
    "q198_holt_forecast",
    oracle=_q198_oracle_sql(),
    tags=("timeseries", "smoothing", "forecast", "recursive", "portable"),
)
def q198_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import holt_linear

    _tune(spark)
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(_cents(F.col("value"))).alias("x"))
    return holt_linear(
        daily, ["event_type"], ["d"], "x",
        alpha_pm=_Q198_A, beta_pm=_Q198_B, horizon=_Q198_H,
    )


# ---------------------------------------------------------------------------
# Q199 — CUSUM drift detection over daily ingest volumes
# (operators/regress.py:cusum_drift, new r7 — Page, Biometrika 1954):
# the control chart a pipeline runs over its own daily counts. Daily
# event counts per type, normalized to permille-of-group-mean (so the
# alarm thresholds are scale-free across sf), folded through the
# two-sided tabular CUSUM with restart — ONE per-row aggregate() fold
# (the q198 pattern). The oracle replays the identical integer
# recursion with a RECURSIVE CTE, including the alarm-reset branches
# and the pmod-floor mean. Alarms fire at every sf (probed: 1-16 per
# side), so both the quiet path and both alarm directions are
# exercised.
# ---------------------------------------------------------------------------

_Q199_K, _Q199_H = 20_000_000, 60_000_000


def _q199_oracle_sql() -> str:
    k, h = _Q199_K, _Q199_H
    sp_raw = "greatest(CAST(0 AS BIGINT), r.sp + (s.x * 1000000 - r.mu - {k}))".format(k=k)
    sn_raw = "greatest(CAST(0 AS BIGINT), r.sn + (r.mu - s.x * 1000000 - {k}))".format(k=k)
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), m AS MATERIALIZED (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nd
      FROM daily GROUP BY 1
    ), idx AS MATERIALIZED (
      SELECT daily.event_type,
             ((daily.c * 1000) - (((daily.c * 1000) % (m.tot // m.nd))
               + (m.tot // m.nd)) % (m.tot // m.nd)) // (m.tot // m.nd) AS x,
             CAST(ROW_NUMBER() OVER (PARTITION BY daily.event_type ORDER BY d)
                  AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY daily.event_type) AS BIGINT) AS n
      FROM daily JOIN m ON daily.event_type = m.event_type
    ), mu AS MATERIALIZED (
      SELECT event_type,
             ((SUM(x) * 1000000) - (((SUM(x) * 1000000) % MAX(n)) + MAX(n))
               % MAX(n)) // MAX(n) AS mu
      FROM idx GROUP BY 1
    ), rec AS (
      SELECT idx.event_type, CAST(0 AS BIGINT) AS i, idx.n,
             CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
             CAST(0 AS BIGINT) AS up, CAST(0 AS BIGINT) AS down,
             CAST(NULL AS BIGINT) AS first, mu.mu
      FROM idx JOIN mu ON idx.event_type = mu.event_type
      WHERE idx.i = 1
      UNION ALL
      SELECT r.event_type, r.i + 1, r.n,
             CASE WHEN {sp_raw} > {h} THEN CAST(0 AS BIGINT)
                  ELSE {sp_raw} END,
             CASE WHEN {sn_raw} > {h} THEN CAST(0 AS BIGINT)
                  ELSE {sn_raw} END,
             r.up + CASE WHEN {sp_raw} > {h} THEN 1 ELSE 0 END,
             r.down + CASE WHEN {sn_raw} > {h} THEN 1 ELSE 0 END,
             CASE WHEN r.first IS NOT NULL THEN r.first
                  WHEN {sp_raw} > {h} OR {sn_raw} > {h} THEN r.i + 1
                  ELSE CAST(NULL AS BIGINT) END,
             r.mu
      FROM rec r JOIN idx s
        ON s.event_type = r.event_type AND s.i = r.i + 1
    )
    SELECT event_type, n, up AS up_alarms, down AS down_alarms,
           first AS first_alarm_idx, sp AS s_pos_e6, sn AS s_neg_e6
    FROM rec WHERE i = n
    """


@_register(
    "q199_cusum_drift",
    oracle=_q199_oracle_sql(),
    tags=("timeseries", "drift", "monitoring", "recursive", "portable"),
)
def q199_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import cusum_drift

    _tune(spark)
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = daily.groupBy("event_type").agg(
        F.expr("CAST(SUM(c) div COUNT(*) AS BIGINT)").alias("mean_c")
    )
    norm = daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "d",
        F.expr("CAST((c * 1000) div mean_c AS BIGINT)").alias("x"),
    )
    return cusum_drift(
        norm, ["event_type"], ["d"], "x", k_e6=_Q199_K, h_e6=_Q199_H
    )


# ---------------------------------------------------------------------------
# Q200 — INCREMENTAL corpus update, stage counts pinned end-to-end
# (pipelines/corpus.py:update_corpus_increment, new r7): the weekly-
# crawl composition the round's cross-corpus machinery exists for —
# quality-gate the NEW batch (odd doc_ids < 100), CROSS-dedup it
# against the already-curated reference (even doc_ids, which never
# self-joins), then WITHIN-batch near-dup dedup of the survivors
# (cap + anchor-star + connected components). Every stage boundary is
# one pinned count, q186's convention; the oracle chains the gate CTEs
# (q186's), the shared portable-minhash prefix over the full slice
# (signatures are frame-independent), the cross cap/verify (q190's),
# the within cap/star/closure (q182/q186's), and counts each stage.
# ---------------------------------------------------------------------------


def _q200_oracle_sql() -> str:
    prefix = _portable_minhash_prefix_sql(
        " WHERE doc_id < 100", _Q55_HASHES, _Q55_BANDS
    )
    sql = f"""
    WITH RECURSIVE qtok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE doc_id < 100 AND doc_id % 2 = 1
    ), qfeat AS (
      SELECT doc_id,
             CAST(array_length(toks) AS BIGINT) AS n_tokens,
             CAST(array_length(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks,
               t -> list_contains(['the','a','and','of','to','is','in','it'], t)))
               AS BIGINT) AS n_stop,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
               AS sum_len
      FROM qtok
    ), gate AS (
      SELECT doc_id FROM qfeat
      WHERE CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE ROUND(
              0.4 * (n_distinct / CAST(n_tokens AS DOUBLE))
              + 0.2 * LEAST((n_stop / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0)
              + 0.2 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
              + 0.2 * LEAST((sum_len / CAST(n_tokens AS DOUBLE)) / 8.0, 1.0)
            , 6) END >= {_Q186_MIN_QUALITY}
    ), {prefix}, hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    ), refb AS (
      SELECT band_idx, band_key, doc_id FROM bnd WHERE doc_id % 2 = 0
    ), newb AS (
      SELECT b.band_idx, b.band_key, b.doc_id
      FROM bnd b JOIN gate g ON b.doc_id = g.doc_id
    ), capped AS (
      SELECT band_idx, band_key, doc_id FROM (
        SELECT band_idx, band_key, doc_id,
               ROW_NUMBER() OVER (PARTITION BY band_idx, band_key
                                  ORDER BY doc_id) AS rn
        FROM refb
      ) WHERE rn <= {_Q182_CAP}
    ), xver AS (
      SELECT DISTINCT n.doc_id AS id_new
      FROM newb n
      JOIN capped c ON n.band_idx = c.band_idx AND n.band_key = c.band_key
      JOIN hs h1 ON n.doc_id = h1.doc_id
      JOIN hs h2 ON c.doc_id = h2.doc_id
      WHERE CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
            / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
            >= 0.055
    ), xsurv AS (
      SELECT g.doc_id FROM gate g
      LEFT JOIN xver v ON g.doc_id = v.id_new
      WHERE v.id_new IS NULL
    ), wb AS (
      SELECT b.band_idx, b.band_key, b.doc_id
      FROM bnd b JOIN xsurv s ON b.doc_id = s.doc_id
    ), sizes AS (
      SELECT band_idx, band_key, COUNT(*) AS n
      FROM wb GROUP BY band_idx, band_key
    ), small_pairs AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM wb a
      JOIN wb b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
      JOIN sizes s ON s.band_idx = a.band_idx AND s.band_key = a.band_key
      WHERE s.n BETWEEN 2 AND {_Q182_CAP}
    ), anchors AS (
      SELECT b.band_idx, b.band_key, MIN(b.doc_id) AS anchor
      FROM wb b JOIN sizes s
        ON s.band_idx = b.band_idx AND s.band_key = b.band_key
      WHERE s.n > {_Q182_CAP}
      GROUP BY b.band_idx, b.band_key
    ), star_pairs AS (
      SELECT DISTINCT an.anchor AS id1, m.doc_id AS id2
      FROM anchors an
      JOIN wb m ON m.band_idx = an.band_idx AND m.band_key = an.band_key
      WHERE an.anchor < m.doc_id
    ), wver AS (
      SELECT c.id1, c.id2
      FROM (SELECT id1, id2 FROM small_pairs
            UNION SELECT id1, id2 FROM star_pairs) c
      JOIN hs h1 ON c.id1 = h1.doc_id
      JOIN hs h2 ON c.id2 = h2.doc_id
      WHERE CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
            / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
            >= 0.055
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM wver
      UNION SELECT id2, id1 FROM wver
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    ), wsurv AS (
      SELECT s.doc_id FROM xsurv s
      LEFT JOIN labels l ON s.doc_id = l.id
      WHERE COALESCE(l.cluster, s.doc_id) = s.doc_id
    )
    SELECT
      CAST((SELECT COUNT(*) FROM documents
            WHERE doc_id < 100 AND doc_id % 2 = 1) AS BIGINT) AS new_docs,
      CAST((SELECT COUNT(*) FROM gate) AS BIGINT) AS after_quality,
      CAST((SELECT COUNT(*) FROM xsurv) AS BIGINT) AS after_cross_dedup,
      CAST((SELECT COUNT(*) FROM wsurv) AS BIGINT) AS after_within_dedup
    """
    import re

    for name in (
        "qtok", "gate", "hx", "sig", "bnd", "hs", "refb", "newb", "capped",
        "xver", "xsurv", "wb", "sizes", "small_pairs", "anchors",
        "star_pairs", "wver", "wsurv",
    ):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q200_incremental_corpus_update",
    oracle=_q200_oracle_sql(),
    tags=("llm-pipeline", "end-to-end", "dedup", "cross-corpus", "portable"),
    # fn is EAGER (the stats ARE the stage counts), q186's convention
    result_schema=(
        "new_docs bigint, after_quality bigint, "
        "after_cross_dedup bigint, after_within_dedup bigint"
    ),
)
def q200_incremental_corpus_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.pipelines.corpus import (
        update_corpus_increment,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    new_df = docs.filter(F.col("doc_id") % 2 == 1)
    ref_df = docs.filter(F.col("doc_id") % 2 == 0)
    _, st = update_corpus_increment(
        new_df, ref_df, "doc_id", "text",
        min_quality=_Q186_MIN_QUALITY, shingle_n=2,
        num_hashes=_Q55_HASHES, bands=_Q55_BANDS, threshold=0.055,
        max_bucket_size=_Q182_CAP, portable=True,
    )
    return spark.createDataFrame(
        [(st.new_docs, st.after_quality, st.after_cross_dedup,
          st.after_within_dedup)],
        "new_docs bigint, after_quality bigint, "
        "after_cross_dedup bigint, after_within_dedup bigint",
    )


# ---------------------------------------------------------------------------
# Q201 — additive Holt-Winters over daily event values, weekly season
# (operators/regress.py:holt_winters_additive, new r7 — Winters 1960):
# the full classical forecaster — level + trend + a length-7 seasonal
# state — completing the smoothing family (q112 FIR kernel, q198
# recursive double-smoother). The engine runs the entire triple
# recursion, seasonal array included, as ONE per-row aggregate() fold
# whose accumulator carries array<bigint> state; the oracle replays
# it with a RECURSIVE CTE carrying a LIST column updated positionally
# per step. Exact fixed-point throughout (micro-units, permille
# coefficients, pmod-floor divisions — the q198 discipline).
# ---------------------------------------------------------------------------

_Q201_M, _Q201_A, _Q201_B, _Q201_G, _Q201_H = 7, 300, 100, 200, 7


def _q201_oracle_sql() -> str:
    m, a, b, g, h = _Q201_M, _Q201_A, _Q201_B, _Q201_G, _Q201_H

    def fdiv(expr: str, den: str) -> str:
        # CAST back to BIGINT: DuckDB widens the %-// chain to HUGEINT,
        # and the driver's value hash is type-sensitive (the q180
        # artifact — this exact drift tripped the declared-type gate)
        return (
            f"CAST((({expr}) - ((({expr}) % ({den})) + ({den})) % ({den}))"
            f" // ({den}) AS BIGINT)"
        )

    mean1 = fdiv(f"SUM(x) FILTER (WHERE i <= {m}) * 1000000", str(m))
    mean2 = fdiv(
        f"SUM(x) FILTER (WHERE i > {m} AND i <= {2 * m}) * 1000000", str(m)
    )
    s_old = f"r.s[(r.i % {m}) + 1]"
    l_new = fdiv(
        f"{a} * (t.x * 1000000 - {s_old}) + {1000 - a} * (r.l + r.b)", "1000"
    )
    b_new = fdiv(f"{b} * (({l_new}) - r.l) + {1000 - b} * r.b", "1000")
    s_new = fdiv(
        f"{g} * (t.x * 1000000 - ({l_new})) + {1000 - g} * ({s_old})", "1000"
    )
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), idx AS MATERIALIZED (
      SELECT event_type, x,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                  AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM daily
    ), seedm AS MATERIALIZED (
      SELECT event_type, MAX(n) AS n,
             {mean1} AS l,
             {fdiv(f"({mean2}) - ({mean1})", str(m))} AS b
      FROM idx
      GROUP BY event_type
      HAVING MAX(n) >= {2 * m}
    ), seed AS MATERIALIZED (
      SELECT sm.event_type, sm.n, sm.l, sm.b,
             list(CAST(i.x * 1000000 - sm.l AS BIGINT) ORDER BY i.i) AS s
      FROM seedm sm JOIN idx i ON i.event_type = sm.event_type
      WHERE i.i <= {m}
      GROUP BY sm.event_type, sm.n, sm.l, sm.b
    ), rec AS (
      SELECT event_type, CAST({m} AS BIGINT) AS i, n, l, b, s FROM seed
      UNION ALL
      SELECT r.event_type, r.i + 1, r.n,
             {l_new} AS l,
             {b_new} AS b,
             [CASE WHEN j = ((r.i % {m}) + 1) THEN {s_new}
                   ELSE r.s[j] END for j in range(1, {m + 1})]::BIGINT[]
      FROM rec r JOIN idx t
        ON t.event_type = r.event_type AND t.i = r.i + 1
    )
    SELECT event_type, n,
           l AS level_e6, b AS trend_e6,
           CAST(s[((n + {h} - 1) % {m}) + 1] AS BIGINT) AS season_e6,
           CAST(l + {h} * b + s[((n + {h} - 1) % {m}) + 1] AS BIGINT)
             AS forecast_e6
    FROM rec WHERE i = n
    """


@_register(
    "q201_holt_winters",
    oracle=_q201_oracle_sql(),
    tags=("timeseries", "smoothing", "seasonal", "forecast", "recursive",
          "portable"),
)
def q201_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import (
        holt_winters_additive,
    )

    _tune(spark)
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(_cents(F.col("value"))).alias("x"))
    return holt_winters_additive(
        daily, ["event_type"], ["d"], "x", period=_Q201_M,
        alpha_pm=_Q201_A, beta_pm=_Q201_B, gamma_pm=_Q201_G,
        horizon=_Q201_H,
    )


# ---------------------------------------------------------------------------
# Q202 — MULTI-pass sorted-neighborhood dedup (operators/dedup.py:
# multi_pass_sorted_neighborhood_pairs, new r8 — the canonical
# Hernández & Stolfo form: q196's single prefix key bounds recall to
# sort-local dups, so the paper runs SEVERAL independent sort orders
# and unions the candidate windows). Three passes — normalized-text
# prefix, REVERSED-text prefix, token-SORTED prefix — each ranked by
# the two-phase global_row_number, pairs canonicalized least/greatest,
# union-deduped, one shared exact hashed-Jaccard verify. The oracle
# replays all three ROW_NUMBER() orders, the window joins, the
# canonicalization, the DISTINCT union, and the md5 hashed-shingle
# Jaccard. ASCII guard on both sides: DuckDB's reverse() is
# grapheme-cluster-based while Spark's is codepoint-based — the one
# primitive the two engines could disagree on (the q197 levenshtein
# precedent); current testdata is 100% ASCII, the guard keeps the
# oracle honest if that ever changes.
# ---------------------------------------------------------------------------


def _q202_oracle_sql() -> str:
    w, p = _Q196_WINDOW, _Q196_PREFIX
    sql = f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
      WHERE regexp_matches(text, '^[ -~]*$')
    ), keyed AS (
      SELECT doc_id, toks,
             substr(norm, 1, {p}) AS k1,
             substr(reverse(norm), 1, {p}) AS k2,
             substr(array_to_string(list_sort(
                      list_filter(string_split(norm, ' '), t -> t <> '')),
                    ' '), 1, {p}) AS k3
      FROM tok
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_distinct([array_to_string(toks[i:i+1], ' ')
                                      for i in range(1, len(toks))])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM keyed
    ), hx AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
    ), hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    ), rnk AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY k1, doc_id) AS BIGINT) AS r1,
             CAST(ROW_NUMBER() OVER (ORDER BY k2, doc_id) AS BIGINT) AS r2,
             CAST(ROW_NUMBER() OVER (ORDER BY k3, doc_id) AS BIGINT) AS r3
      FROM keyed
    ), cand AS (
      SELECT DISTINCT least(a.doc_id, b.doc_id) AS id1,
                      greatest(a.doc_id, b.doc_id) AS id2
      FROM rnk a JOIN rnk b
        ON (b.r1 > a.r1 AND b.r1 <= a.r1 + {w})
        OR (b.r2 > a.r2 AND b.r2 <= a.r2 + {w})
        OR (b.r3 > a.r3 AND b.r3 <= a.r3 + {w})
    )
    SELECT * FROM (
      SELECT c.id1, c.id2,
             CAST(len(list_intersect(h1.hs, h2.hs)) AS DOUBLE)
               / (len(h1.hs) + len(h2.hs) - len(list_intersect(h1.hs, h2.hs)))
               AS jaccard
      FROM cand c
      JOIN hs h1 ON c.id1 = h1.doc_id
      JOIN hs h2 ON c.id2 = h2.doc_id
    ) WHERE jaccard >= 0.055
    """
    import re

    for name in ("tok", "keyed", "sh", "hx", "hs", "rnk", "cand"):
        sql = re.sub(
            rf"(?<![A-Za-z_]){name} AS \(", f"{name} AS MATERIALIZED (", sql
        )
    return sql


@_register(
    "q202_multi_pass_sorted_neighborhood",
    oracle=_q202_oracle_sql(),
    tags=("dedup", "sorted-neighborhood", "multi-pass", "blocking",
          "portable"),
)
def q202_multi_pass_sorted_neighborhood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[ -~]*$")
    )
    return dedup_ops.multi_pass_sorted_neighborhood_pairs(
        docs, "doc_id", "text", window=_Q196_WINDOW,
        key_prefix_len=_Q196_PREFIX, threshold=0.055, shingle_n=2,
        portable=True,
    )


# ---------------------------------------------------------------------------
# Q203 — in-engine quality-classifier TRAINING (operators/training.py:
# train_logreg_hashed, new r8): batch gradient-descent logistic
# regression over hashed token features in EXACT fixed-point — the
# training counterpart of q160's fixed-weight inference, completing
# the in-engine-training family (k-means q24, IVF-PQ codebooks, BPE
# q194, DSIR censuses q191). Hard-sigmoid probabilities in
# quarter-micro BIGINTs, floor-division weight updates, 1/(r+1)
# Robbins-Monro decay (measured necessary: a fixed step oscillates,
# tests/test_training.py). Label: cnt('hash') > cnt('join') per doc —
# the fixture's only learnable target (its lang/source metadata is
# decorrelated from the uniform synthetic vocabulary, verified r8);
# the operator takes any 0/1 label column. The oracle replays all 8
# GD rounds UNROLLED — tokenize, md5 bucket hashing, BIGINT logits,
# the hard-sigmoid clamp, per-bucket gradient sums, and the exact
# pmod floor division — bit-for-bit; a pure-Python differential test
# (q194-style) covers the same spec in tests/test_training.py.
# ---------------------------------------------------------------------------

_Q203_B, _Q203_ROUNDS = 512, 8


def _q203_oracle_sql() -> str:
    b, rounds = _Q203_B, _Q203_ROUNDS
    sql = f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), lab AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(list_filter(toks, t -> t = 'hash'))
                     > len(list_filter(toks, t -> t = 'join'))
                  THEN 1 ELSE 0 END AS y
      FROM base
    ), fx AS MATERIALIZED (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {b} AS b
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      ) GROUP BY doc_id, b
      UNION ALL
      SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM base
    ), nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM base
    ), w0 AS MATERIALIZED (
      SELECT CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS w
      WHERE FALSE
    )"""
    for r in range(1, rounds + 1):
        m = f"(4 * n.n * {r})"
        sql += f""", z{r} AS MATERIALIZED (
      SELECT l.doc_id, l.y, COALESCE(s.z, 0) AS z
      FROM lab l LEFT JOIN (
        SELECT f.doc_id, SUM(w.w * f.cnt) AS z
        FROM fx f JOIN w{r - 1} w ON f.b = w.b GROUP BY f.doc_id
      ) s USING (doc_id)
    ), g{r} AS MATERIALIZED (
      SELECT f.b,
             SUM((4000000 * z.y
                  - least(4000000, greatest(0, z.z + 2000000))) * f.cnt) AS g
      FROM fx f JOIN z{r} z USING (doc_id) GROUP BY f.b
    ), w{r} AS MATERIALIZED (
      SELECT g.b,
             COALESCE(w.w, 0)
               + (g.g - ((g.g % {m}) + {m}) % {m}) // {m} AS w
      FROM g{r} g LEFT JOIN w{r - 1} w ON g.b = w.b, nn n
    )"""
    sql += f"""
    SELECT b AS bucket, CAST(w AS BIGINT) AS w_pm FROM w{rounds}
    """
    return sql


@_register(
    "q203_train_quality_classifier",
    oracle=_q203_oracle_sql(),
    bench=True,  # r9: the training family's perf axis — 8 GD rounds over
    # the cached feature frame; the per-round marginal cost is the
    # measured quantity (SCALE.md r9)
    tags=("training", "classifier", "gradient-descent", "hashing-trick",
          "fixed-point", "portable"),
)
def q203_train_quality_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"[ \t\n\x0B\f\r]+"),
        lambda t: t != F.lit(""),
    )
    labeled = docs.withColumn(
        "__y",
        (
            F.size(F.filter(toks, lambda t: t == F.lit("hash")))
            > F.size(F.filter(toks, lambda t: t == F.lit("join")))
        ).cast("long"),
    )
    return tr_ops.train_logreg_hashed(
        labeled, "doc_id", "text", "__y",
        num_buckets=_Q203_B, rounds=_Q203_ROUNDS,
    )


# ---------------------------------------------------------------------------
# Q204 — STREAMING cross-corpus SEMANTIC dedup (streaming/dedup.py:
# stream_cross_srp_near_dup_pairs, new r8): the embedding twin of
# q195, closing the matrix — q190/q195 are batch/stream text,
# q192/q204 are batch/stream semantic. NEW embeddings arrive as a
# file stream; the static side is similarity.srp_ref_index (capped
# bucket members + vectors + norms, cached once); the hot path is
# per-row SRP signature arithmetic + ONE stream-static bucket join
# with the cosine verify inline. A vector has exactly ONE bucket, so
# a pair surfaces at most once and append mode carries ZERO streaming
# state (no dropDuplicates — stricter than q195's pair-dedup). The
# oracle is q192's SQL VERBATIM: with an availableNow trigger the
# emitted set equals the batch operator's regardless of micro-batch
# boundaries (multi-batch equivalence pinned in
# tests/test_streaming.py).
# ---------------------------------------------------------------------------


@_register(
    "q204_stream_cross_semantic_dedup",
    oracle=_q192_oracle_sql(),
    tags=("streaming", "similarity", "dedup", "semdedup", "cross-corpus",
          "skew-guard"),
)
def q204_stream_cross_semantic_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from us_immigration_data_lake_spark.sources.readers import (
        read_parquet_stream,
    )
    from us_immigration_data_lake_spark.streaming.dedup import (
        stream_cross_srp_near_dup_pairs,
    )
    from us_immigration_data_lake_spark.streaming.windows import run_to_memory

    _tune(spark)
    stream = read_parquet_stream(
        spark, f"{sf_dir.rstrip('/')}/embeddings*.parquet"
    ).filter(F.col("vec_id") % 2 == 1)
    ref_df = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    pairs = stream_cross_srp_near_dup_pairs(
        stream, ref_df, "vec_id", "embedding", threshold=_Q181_TAU,
        dim=EMBEDDING_DIM, num_bits=_Q187_BITS, max_bucket_size=_Q192_CAP,
    )
    return run_to_memory(pairs, _sink_name("q204_pairs"), mode="append")


# ---------------------------------------------------------------------------
# Q205 — in-engine MULTINOMIAL classifier training (operators/
# training.py:train_multinomial_logreg_hashed, new r9): the lang-id
# head — one-vs-rest hard-sigmoid logistic heads over the shared
# hashed-unigram feature frame, full-batch GD in the same exact BIGINT
# fixed-point spec as q203 (hard sigmoid in quarter-micro units, pmod
# floor division, Robbins-Monro decay). OvR instead of softmax so
# every head stays bit-replayable (a softmax needs a per-doc
# normalizing division — order-sensitive in fixed point); argmax
# decoding is the standard linear lang-id construction. Labels come
# from the documents.lang column (5-way CASE to a class index) — on
# this synthetic corpus lang is decorrelated from text (verified r8),
# so the learned weights hover near zero; correctness is exact
# regardless (the oracle unrolls all rounds bit-for-bit) and
# learnability is pinned by a planted-signal test over marker
# vocabularies in tests/test_training.py. Per-round plan: ONE job —
# in-row class-array explode (K× map-side fan-out, no extra shuffle),
# broadcast weight join on (class, bucket), (class, bucket) gradient
# groupBy, model-sized collect (<= K*(B+1) rows).
# ---------------------------------------------------------------------------

_Q205_B, _Q205_ROUNDS, _Q205_K = 256, 4, 5
_Q205_LANG_CASE = (
    "CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 1 WHEN 'es' THEN 2 "
    "WHEN 'de' THEN 3 ELSE 4 END"
)


def _q205_oracle_sql() -> str:
    b, rounds, k = _Q205_B, _Q205_ROUNDS, _Q205_K
    sql = f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), lab AS MATERIALIZED (
      SELECT doc_id, CAST({_Q205_LANG_CASE} AS BIGINT) AS y
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    ), cls AS MATERIALIZED (
      SELECT CAST(unnest(generate_series(0, {k - 1})) AS BIGINT) AS k
    ), fx AS MATERIALIZED (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {b} AS b
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      ) GROUP BY doc_id, b
      UNION ALL
      SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM base
    ), nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM lab
    ), w0 AS MATERIALIZED (
      SELECT CAST(NULL AS BIGINT) AS k, CAST(NULL AS BIGINT) AS b,
             CAST(NULL AS BIGINT) AS w
      WHERE FALSE
    )"""
    for r in range(1, rounds + 1):
        m = f"(4 * n.n * {r})"
        sql += f""", z{r} AS MATERIALIZED (
      SELECT l.doc_id, l.y, c.k, COALESCE(s.z, 0) AS z
      FROM lab l CROSS JOIN cls c
      LEFT JOIN (
        SELECT f.doc_id, w.k, SUM(w.w * f.cnt) AS z
        FROM fx f JOIN w{r - 1} w ON f.b = w.b GROUP BY f.doc_id, w.k
      ) s ON s.doc_id = l.doc_id AND s.k = c.k
    ), g{r} AS MATERIALIZED (
      SELECT z.k, f.b,
             SUM((4000000 * CASE WHEN z.y = z.k THEN 1 ELSE 0 END
                  - least(4000000, greatest(0, z.z + 2000000))) * f.cnt) AS g
      FROM fx f JOIN z{r} z USING (doc_id) GROUP BY z.k, f.b
    ), w{r} AS MATERIALIZED (
      SELECT g.k, g.b,
             COALESCE(w.w, 0)
               + (g.g - ((g.g % {m}) + {m}) % {m}) // {m} AS w
      FROM g{r} g LEFT JOIN w{r - 1} w ON g.k = w.k AND g.b = w.b, nn n
    )"""
    sql += f"""
    SELECT k AS class, b AS bucket, CAST(w AS BIGINT) AS w_pm FROM w{rounds}
    """
    return sql


@_register(
    "q205_train_langid_multinomial",
    oracle=_q205_oracle_sql(),
    tags=("training", "classifier", "multinomial", "lang-id",
          "gradient-descent", "hashing-trick", "fixed-point", "portable"),
)
def q205_train_langid_multinomial(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    labeled = docs.withColumn("__y", F.expr(_Q205_LANG_CASE).cast("long"))
    return tr_ops.train_multinomial_logreg_hashed(
        labeled, "doc_id", "text", "__y", num_classes=_Q205_K,
        num_buckets=_Q205_B, rounds=_Q205_ROUNDS,
    )


# ---------------------------------------------------------------------------
# Q206 — closed-form multinomial NAIVE BAYES train + classify
# (operators/training.py:naive_bayes_model/naive_bayes_classify, new
# r9): the counting complement of the GD trainers — ONE aggregation
# pass is the training (no rounds, no learning rate), Laplace add-1
# over the hashed vocabulary, log-space in micronat BIGINTs per the
# xent/DSIR reproducibility rule (each term integer-izes once via
# ROUND(ln*1e6); every sum downstream is exact bigint, order-free).
# Trains on documents.lang (q205's label), classifies the SAME corpus:
# (doc_id, pred_class, score_micro), argmax ties to the smallest
# class. The unseen-bucket default is algebraically folded
# (score = prior + T_d*default + sum tf*(w-default)) so the scoring
# join is broadcast-of-model only; the (doc x class) grid is an
# in-row explode of the K driver-collected classes.
# ---------------------------------------------------------------------------

_Q206_B = 256


def _q206_oracle_sql() -> str:
    b = _Q206_B
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), lab AS MATERIALIZED (
      SELECT doc_id, CAST({_Q205_LANG_CASE} AS BIGINT) AS k
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    ), fx AS MATERIALIZED (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {b} AS b
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      ) GROUP BY doc_id, b
    ), kb AS MATERIALIZED (
      SELECT l.k, f.b, SUM(f.cnt) AS c_kb
      FROM fx f JOIN lab l USING (doc_id) GROUP BY l.k, f.b
    ), ktot AS (SELECT k, SUM(c_kb) AS tot_k FROM kb GROUP BY k
    ), nk AS (SELECT k, COUNT(*) AS n_k FROM lab GROUP BY k
    ), nn AS (SELECT COUNT(*) AS n_all FROM lab
    ), w AS MATERIALIZED (
      SELECT kb.k, kb.b,
             CAST(ROUND(ln((c_kb + 1.0) / (tot_k + {b})) * 1e6) AS BIGINT)
               AS w_micro
      FROM kb JOIN ktot USING (k)
    ), cls AS MATERIALIZED (
      SELECT nk.k,
             CAST(ROUND(ln(n_k * 1.0 / n.n_all) * 1e6) AS BIGINT)
               AS prior_micro,
             CAST(ROUND(ln(1.0 / (COALESCE(tot_k, 0) + {b})) * 1e6) AS BIGINT)
               AS default_micro
      FROM nk LEFT JOIN ktot USING (k), nn n
    ), tsum AS (
      SELECT base.doc_id, COALESCE(SUM(fx.cnt), 0) AS t_d
      FROM base LEFT JOIN fx USING (doc_id) GROUP BY base.doc_id
    ), sobs AS (
      SELECT f.doc_id, w.k,
             SUM(f.cnt * (w.w_micro - c.default_micro)) AS s_obs
      FROM fx f JOIN w ON f.b = w.b JOIN cls c ON w.k = c.k
      GROUP BY f.doc_id, w.k
    ), scored AS (
      SELECT t.doc_id, c.k,
             c.prior_micro + t.t_d * c.default_micro
               + COALESCE(s.s_obs, 0) AS score
      FROM tsum t CROSS JOIN cls c
      LEFT JOIN sobs s ON s.doc_id = t.doc_id AND s.k = c.k
    )
    SELECT doc_id, k AS pred_class, CAST(score AS BIGINT) AS score_micro
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, k ASC) AS rn
          FROM scored)
    WHERE rn = 1
    """


@_register(
    "q206_naive_bayes_langid",
    oracle=_q206_oracle_sql(),
    bench=True,  # r9: closed-form training — one aggregation pass IS the
    # train; prices the cheapest classifier path
    tags=("training", "classifier", "naive-bayes", "lang-id",
          "closed-form", "micronats", "portable"),
)
def q206_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    labeled = docs.withColumn("__y", F.expr(_Q205_LANG_CASE).cast("long"))
    model = tr_ops.naive_bayes_model(
        labeled, "doc_id", "text", "__y", num_buckets=_Q206_B
    )
    return tr_ops.naive_bayes_classify(
        docs, model, "doc_id", "text", num_buckets=_Q206_B
    )


# ---------------------------------------------------------------------------
# Q207 — NO-STRADDLE sequence packing (operators/packing.py:
# pack_sequences_nextfit, new r9): greedy next-fit of whole documents
# into fixed-capacity context windows — the q82 packer's complement
# (q82 packs by cumulative offset and lets a document straddle a
# boundary; this form never splits a document — instruction-tuning /
# document-objective batch assembly). Inherently sequential, so
# sharded: portable md5 shard of the id, per-shard pack in id order,
# one Arrow-batched applyInPandas pass per shard (the sanctioned
# custom-operator path — a data-dependent running reset has no
# built-in-expression form short of an O(n^2) array-append fold).
# The oracle replays the recursion with a RECURSIVE CTE per shard —
# the q198/q199 fold-oracle pairing applied to a packing fold.
# ---------------------------------------------------------------------------

_Q207_CAP, _Q207_SHARDS = 512, 16


def _q207_oracle_sql() -> str:
    cap, shards = _Q207_CAP, _Q207_SHARDS
    return f"""
    WITH RECURSIVE sized AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tok,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % {shards} AS shard
      FROM documents WHERE text IS NOT NULL
    ), ordered AS (
      SELECT doc_id, n_tok, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM sized
    ), rec AS (
      SELECT shard, rn, doc_id,
             CAST(0 AS BIGINT) AS bin,
             CAST(0 AS BIGINT) AS off,
             n_tok AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id,
             CASE WHEN r.fill > 0 AND r.fill + o.n_tok > {cap}
                  THEN r.bin + 1 ELSE r.bin END,
             CASE WHEN r.fill > 0 AND r.fill + o.n_tok > {cap}
                  THEN CAST(0 AS BIGINT) ELSE r.fill END,
             CASE WHEN r.fill > 0 AND r.fill + o.n_tok > {cap}
                  THEN o.n_tok ELSE r.fill + o.n_tok END
      FROM rec r JOIN ordered o ON o.shard = r.shard AND o.rn = r.rn + 1
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin, off AS "offset"
    FROM rec
    """


@_register(
    "q207_pack_nextfit",
    oracle=_q207_oracle_sql(),
    bench=True,  # r9: the packing family's perf axis — one tokenize pass
    # + sharded applyInPandas (the Arrow slow-path, priced honestly)
    tags=("llm", "packing", "next-fit", "applyInPandas", "portable"),
)
def q207_pack_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.functions.text import token_count
    from us_immigration_data_lake_spark.operators.packing import (
        pack_sequences_nextfit,
    )

    _tune(spark)
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            token_count(F.lower(F.col("text"))).cast("long").alias("n_tok"),
        )
    )
    return pack_sequences_nextfit(
        docs, "doc_id", "n_tok", capacity=_Q207_CAP, num_shards=_Q207_SHARDS
    )


# ---------------------------------------------------------------------------
# Q208 — CCNet-style reference-LM perplexity filter (operators/
# textstats.py:ref_lm_bigram_xent, new r9): score NEW documents (odd
# doc_ids) by cross-entropy under an add-1-smoothed BIGRAM LM counted
# from the CURATED reference (even doc_ids) — Wenzek et al. 2020's
# quality-filter construction at the bigram order, and the
# cross-corpus complement of q81's within-corpus unigram xent. Exact
# micronat log-space (each bigram surprisal integer-izes once via
# ROUND(ln*1e6); per-doc sums and the per-token division are exact
# BIGINT). BOS sentinel chr(1) conditions first tokens; V = |ref
# vocab|+1 add-1 headroom for unseen types; unseen contexts degrade
# to ln(1/V). Tokenless docs emit no row (both engines).
# ---------------------------------------------------------------------------


def _q208_oracle_sql() -> str:
    return """
    WITH dd AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), refp AS MATERIALIZED (
      SELECT unnest((list_prepend(chr(1), toks))[1:len(toks)]) AS prev,
             unnest(toks) AS cur
      FROM dd WHERE doc_id % 2 = 0
    ), newp AS MATERIALIZED (
      SELECT doc_id,
             unnest((list_prepend(chr(1), toks))[1:len(toks)]) AS prev,
             unnest(toks) AS cur
      FROM dd WHERE doc_id % 2 = 1
    ), c2 AS MATERIALIZED (
      SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c2
      FROM refp GROUP BY prev, cur
    ), c1 AS (SELECT prev, SUM(c2) AS c1 FROM c2 GROUP BY prev
    ), v AS (SELECT COUNT(DISTINCT cur) AS v FROM c2
    ), terms AS (
      SELECT n.doc_id,
             CAST(ROUND(ln((COALESCE(c2.c2, 0) + 1.0)
                           / (COALESCE(c1.c1, 0) + v.v + 1)) * 1e6) AS BIGINT)
               AS t
      FROM newp n
      LEFT JOIN c2 ON n.prev = c2.prev AND n.cur = c2.cur
      LEFT JOIN c1 ON n.prev = c1.prev, v
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST((-SUM(t)) // COUNT(*) AS BIGINT) AS xent_micro
    FROM terms GROUP BY doc_id
    """


@_register(
    "q208_ref_lm_quality_filter",
    oracle=_q208_oracle_sql(),
    bench=True,  # r9: the LM-filter family's perf axis — two ref censuses
    # + two key-shuffle joins, linear in tokens
    tags=("llm", "quality", "lm-filter", "ccnet", "cross-corpus",
          "micronats", "portable"),
)
def q208_ref_lm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.textstats import (
        ref_lm_bigram_xent,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    new_df = docs.filter(F.col("doc_id") % 2 == 1)
    ref_df = docs.filter(F.col("doc_id") % 2 == 0)
    return ref_lm_bigram_xent(new_df, ref_df, "doc_id", "text")


# ---------------------------------------------------------------------------
# Q209 — BPE tokenizer APPLICATION (operators/textstats.py:
# bpe_token_counts, new r9): train q194's merge table in-engine, then
# ENCODE the corpus with it and count per-document MODEL tokens — the
# budgeting quantity packing/mixture/DSIR should consume (whitespace
# counts under-price words BPE splits). The merge fold runs on the
# VOCABULARY (per distinct word), documents join the word→count table;
# corpus-order cost is one tokenize pass + one key-shuffle join. The
# oracle re-derives the merges with q194's generated CTE chain
# (list_reduce over a '|'-delimited accumulator, words never contain
# '|'), carrying the word through every round, then replays the join.
# ---------------------------------------------------------------------------


def _q209_oracle_sql() -> str:
    n = _Q194_MERGES
    rounds = []
    for k in range(n):
        rounds.append(f"""p{k} AS MATERIALIZED (
      SELECT p[1] AS l, p[2] AS r, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (
        SELECT unnest(CASE WHEN len(symbols) >= 2
                           THEN [[symbols[i], symbols[i+1]]
                                 for i in range(1, len(symbols))]
                           ELSE CAST([] AS VARCHAR[][]) END) AS p,
               cnt
        FROM s{k}
      ) GROUP BY 1, 2
    ), m{k} AS MATERIALIZED (
      SELECT l, r FROM p{k}
      ORDER BY pair_count DESC, l, r LIMIT 1
    ), s{k + 1} AS MATERIALIZED (
      SELECT w,
             list_filter(string_split(
               list_reduce(list_prepend('', symbols),
                 (acc, x) -> CASE
                   WHEN ends_with(acc, '|' || m.l) AND x = m.r
                   THEN substr(acc, 1, length(acc) - length(m.l) - 1)
                        || '|' || m.l || m.r
                   ELSE acc || '|' || x END),
               '|'), s -> s <> '') AS symbols,
             cnt
      FROM s{k} CROSS JOIN m{k} m
    )""")
    blocks = ", ".join(rounds)
    return f"""
    WITH words AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                  t -> t <> '')) AS w
        FROM documents
      ) GROUP BY w
    ), s0 AS MATERIALIZED (
      SELECT w, [w[i] for i in range(1, length(w)+1)] AS symbols, cnt
      FROM words
    ), {blocks}, wtok AS MATERIALIZED (
      SELECT w, CAST(len(symbols) AS BIGINT) AS n_bpe FROM s{n}
    ), occ AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'),
               t -> t <> '')) AS w
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens
    FROM occ JOIN wtok USING (w) GROUP BY doc_id
    """


@_register(
    "q209_bpe_token_counts",
    oracle=_q209_oracle_sql(),
    bench=True,  # r9: the tokenizer-APPLY perf axis — vocab-sized merge
    # folds + one corpus join (train is q194's axis)
    tags=("llm", "tokenizer", "bpe", "encode", "token-count", "portable"),
)
def q209_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in ts_ops.bpe_merges(docs, "text", n_merges=_Q194_MERGES)
        .orderBy("rank")
        .collect()  # model-sized: the trained merge table
    ]
    return ts_ops.bpe_token_counts(
        docs.filter(F.col("text").isNotNull()), "doc_id", "text", merges
    )


# ---------------------------------------------------------------------------
# Q210 — STREAMING in-flight classification (operators/training.py:
# naive_bayes_classify_rowwise, new r9): score a document STREAM with
# an in-engine-trained Naive Bayes model COMPILED into per-row literal
# weight arrays — zero joins, zero aggregation, ZERO streaming state
# (the q204 construction applied to inference): per row, K folds over
# the token array against dense micronat weights + an argmax chain,
# append mode at any input rate. Model trained batch-side on the EVEN
# documents (q206's machinery), the ODD documents arrive as a file
# stream and are classified in-flight — the ingest-filter shape (score
# this week's crawl with last week's classifier). Oracle = the q206
# construction with train/score split on parity; multi-micro-batch
# equivalence is immediate (per-row expressions cannot see batch
# boundaries) and pinned in tests/test_streaming.py.
# ---------------------------------------------------------------------------


def _q210_oracle_sql() -> str:
    b = _Q206_B
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), lab AS MATERIALIZED (
      SELECT doc_id, CAST({_Q205_LANG_CASE} AS BIGINT) AS y
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 = 0
    ), fx AS MATERIALIZED (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {b} AS b
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      ) GROUP BY doc_id, b
    ), kb AS MATERIALIZED (
      SELECT l.y AS k, f.b, SUM(f.cnt) AS c_kb
      FROM fx f JOIN lab l USING (doc_id) GROUP BY l.y, f.b
    ), ktot AS (SELECT k, SUM(c_kb) AS tot_k FROM kb GROUP BY k
    ), nk AS (SELECT y AS k, COUNT(*) AS n_k FROM lab GROUP BY y
    ), nn AS (SELECT COUNT(*) AS n_all FROM lab
    ), w AS MATERIALIZED (
      SELECT kb.k, kb.b,
             CAST(ROUND(ln((c_kb + 1.0) / (tot_k + {b})) * 1e6) AS BIGINT)
               AS w_micro
      FROM kb JOIN ktot USING (k)
    ), cls AS MATERIALIZED (
      SELECT nk.k,
             CAST(ROUND(ln(n_k * 1.0 / n.n_all) * 1e6) AS BIGINT)
               AS prior_micro,
             CAST(ROUND(ln(1.0 / (COALESCE(tot_k, 0) + {b})) * 1e6) AS BIGINT)
               AS default_micro
      FROM nk LEFT JOIN ktot USING (k), nn n
    ), tsum AS (
      SELECT base.doc_id, COALESCE(SUM(fx.cnt), 0) AS t_d
      FROM base LEFT JOIN fx USING (doc_id)
      WHERE base.doc_id % 2 = 1 GROUP BY base.doc_id
    ), sobs AS (
      SELECT f.doc_id, w.k,
             SUM(f.cnt * (w.w_micro - c.default_micro)) AS s_obs
      FROM fx f JOIN w ON f.b = w.b JOIN cls c ON w.k = c.k
      WHERE f.doc_id % 2 = 1
      GROUP BY f.doc_id, w.k
    ), scored AS (
      SELECT t.doc_id, c.k,
             c.prior_micro + t.t_d * c.default_micro
               + COALESCE(s.s_obs, 0) AS score
      FROM tsum t CROSS JOIN cls c
      LEFT JOIN sobs s ON s.doc_id = t.doc_id AND s.k = c.k
    )
    SELECT doc_id, k AS pred_class, CAST(score AS BIGINT) AS score_micro
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, k ASC) AS rn
          FROM scored)
    WHERE rn = 1
    """


@_register(
    "q210_stream_classify",
    oracle=_q210_oracle_sql(),
    tags=("streaming", "training", "inference", "naive-bayes",
          "stateless", "micronats", "portable"),
)
def q210_stream_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops
    from us_immigration_data_lake_spark.sources.readers import (
        read_parquet_stream,
    )
    from us_immigration_data_lake_spark.streaming.windows import run_to_memory

    _tune(spark)
    train = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") % 2 == 0))
        .withColumn("__y", F.expr(_Q205_LANG_CASE).cast("long"))
    )
    model = tr_ops.naive_bayes_model(
        train, "doc_id", "text", "__y", num_buckets=_Q206_B
    )
    stream = read_parquet_stream(
        spark, f"{sf_dir.rstrip('/')}/documents*.parquet"
    ).filter(F.col("doc_id") % 2 == 1)
    scored = tr_ops.naive_bayes_classify_rowwise(
        stream, model, "doc_id", "text", num_buckets=_Q206_B
    )
    return run_to_memory(scored, _sink_name("q210_scored"), mode="append")


# ---------------------------------------------------------------------------
# Q211 — cross-SOURCE shingle-overlap matrix (operators/dedup.py:
# cross_group_overlap, new r9): the curation diagnostic behind "how
# much does source A overlap source B" — pairwise distinct-shingle
# intersection/Jaccard between all document sources, the GROUP-level
# counterpart of per-doc decontamination (q64). One shingle pass,
# (group, hash) distinct, one self-equi-join on the shingle hash —
# per-shingle fan-out bounded by source-count² (a deployment
# constant). Pairs with zero overlap are absent by construction.
# ---------------------------------------------------------------------------


def _q211_oracle_sql() -> str:
    return """
    WITH tok AS (
      SELECT source,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), sh AS MATERIALIZED (
      SELECT source,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok
    ), gs AS MATERIALIZED (
      SELECT DISTINCT source AS g,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      FROM (SELECT source, unnest(shingles) AS s FROM sh)
    ), sizes AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM gs GROUP BY g
    ), inter AS (
      SELECT a.g AS group_a, b.g AS group_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM gs a JOIN gs b ON a.h = b.h AND a.g < b.g
      GROUP BY 1, 2
    )
    SELECT group_a, group_b, sa.n AS shingles_a, sb.n AS shingles_b,
           shared,
           ROUND(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = group_a
    JOIN sizes sb ON sb.g = group_b
    """


@_register(
    "q211_cross_source_overlap",
    oracle=_q211_oracle_sql(),
    tags=("llm", "curation", "overlap", "contamination", "jaccard",
          "portable"),
)
def q211_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.cross_group_overlap(
        docs, "doc_id", "text", "source", shingle_n=3, portable=True
    )


# ---------------------------------------------------------------------------
# Q212 — EXACT two-sample Kolmogorov-Smirnov drift (operators/
# regress.py:ks_two_sample, new r9): the distribution-drift test a
# pipeline runs between corpus snapshots — here the n_chars length
# distributions of the 'en' vs 'zh' document populations. D is exact
# BIGINT cross-multiplication (d_num = max |n_b·C_a − n_a·C_b|, d_den
# = n_a·n_b; one double division at the end). The cumulative counts
# run through the engine's two-phase global_cumsum (range exchange +
# parallel per-partition cumsums + offset collect) — NEVER a
# single-partition ORDER BY window; the oracle replays with a plain
# window cumsum (fine at oracle scale).
# ---------------------------------------------------------------------------


def _q212_oracle_sql() -> str:
    return """
    WITH base AS (
      SELECT n_chars AS v,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS ca,
             CAST(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS BIGINT) AS cb
      FROM documents
      WHERE n_chars IS NOT NULL AND lang IN ('en', 'zh')
    ), pv AS (
      SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM base GROUP BY v
    ), cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cca,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ccb
      FROM pv
    ), tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b
      FROM base
    )
    SELECT t.n_a, t.n_b,
           CAST(MAX(ABS(t.n_b * c.cca - t.n_a * c.ccb)) AS BIGINT) AS d_num,
           CAST(t.n_a * t.n_b AS BIGINT) AS d_den,
           ROUND(MAX(ABS(t.n_b * c.cca - t.n_a * c.ccb)) * 1.0
                 / (t.n_a * t.n_b), 6) AS d_stat
    FROM cum c, tot t GROUP BY t.n_a, t.n_b
    """


@_register(
    "q212_ks_drift",
    oracle=_q212_oracle_sql(),
    tags=("drift", "ks", "distribution", "monitoring", "exact",
          "portable"),
)
def q212_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import ks_two_sample

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ks_two_sample(docs, "lang", "n_chars", "en", "zh")


# ---------------------------------------------------------------------------
# Q213 — Population Stability Index drift (operators/regress.py:
# psi_drift, new r9): the binned companion to q212's KS — PSI
# integrates distribution shift across a FIXED binning (explicit
# lo/width/n_bins contract, so two snapshots' binnings stay
# comparable), add-1-smoothed shares, each bin's log-ratio
# integer-ized once to micronats and the common denominators factored
# out so psi_num/psi_den are exact BIGINTs with one final division.
# Same populations as q212 (en vs zh n_chars) so the two drift
# metrics are directly comparable in the registry.
# ---------------------------------------------------------------------------

_Q213_LO, _Q213_W, _Q213_B = 0, 50, 12


def _q213_oracle_sql() -> str:
    lo, w, b = _Q213_LO, _Q213_W, _Q213_B
    return f"""
    WITH base AS (
      SELECT least({b - 1}, greatest(0, (n_chars - {lo}) // {w})) AS bin,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS ca,
             CAST(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS BIGINT) AS cb
      FROM documents
      WHERE n_chars IS NOT NULL AND lang IN ('en', 'zh')
    ), per_bin AS (
      SELECT bin, SUM(ca) AS ca, SUM(cb) AS cb FROM base GROUP BY bin
    ), dense AS (
      SELECT g.bin, COALESCE(p.ca, 0) AS ca, COALESCE(p.cb, 0) AS cb
      FROM (SELECT unnest(generate_series(0, {b - 1})) AS bin) g
      LEFT JOIN per_bin p USING (bin)
    ), tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b
      FROM base
    ), terms AS (
      SELECT t.n_a, t.n_b,
             ((d.ca + 1) * (t.n_b + {b})) AS p,
             ((d.cb + 1) * (t.n_a + {b})) AS q
      FROM dense d, tot t
    )
    SELECT CAST({b} AS BIGINT) AS n_bins, n_a, n_b,
           CAST(SUM((p - q) * CAST(ROUND(ln(p * 1.0 / q) * 1e6) AS BIGINT))
                AS BIGINT) AS psi_num,
           CAST((n_a + {b}) * (n_b + {b}) * 1000000 AS BIGINT) AS psi_den,
           ROUND(SUM((p - q) * CAST(ROUND(ln(p * 1.0 / q) * 1e6) AS BIGINT))
                 * 1.0 / ((n_a + {b}) * (n_b + {b})) / 1e6, 6) AS psi
    FROM terms GROUP BY n_a, n_b
    """


@_register(
    "q213_psi_drift",
    oracle=_q213_oracle_sql(),
    tags=("drift", "psi", "distribution", "monitoring", "micronats",
          "portable"),
)
def q213_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.regress import psi_drift

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return psi_drift(
        docs, "lang", "n_chars", "en", "zh",
        lo=_Q213_LO, width=_Q213_W, n_bins=_Q213_B,
    )


# ---------------------------------------------------------------------------
# Q214 — INCREMENTAL EMBEDDING-corpus update end-to-end (pipelines/
# corpus.py:update_embedding_increment, new r9): the semantic twin of
# q200's weekly-crawl composition — dimension gate → cross-corpus SRP
# dedup vs the curated reference (odd vs even vec_ids; one new×ref
# bucket join, the reference never self-joins) → within-batch
# capped-SRP dedup with anchor-star recovery → CC → keep-smallest
# survivors. Output: the surviving new vec_ids. The oracle chains the
# registry's verified pieces: q192's capped cross CTEs (cap=5), an
# anti-join, then q187's within machinery (cap=5, star recovery,
# recursive closure) restricted to the cross survivors.
# ---------------------------------------------------------------------------


def _q214_oracle_sql() -> str:
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q187_BITS, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_Q187_BITS)
    )
    return f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE len(embedding) = {EMBEDDING_DIM}
    ), b AS MATERIALIZED (
      SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket FROM base
    ), capped AS MATERIALIZED (
      SELECT bucket, vec_id FROM (
        SELECT bucket, vec_id,
               ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
        FROM b WHERE vec_id % 2 = 0
      ) WHERE rn <= {_Q192_CAP}
    ), xcand AS MATERIALIZED (
      SELECT DISTINCT n.vec_id AS id_new, c.vec_id AS id_ref
      FROM b n JOIN capped c ON n.bucket = c.bucket
      WHERE n.vec_id % 2 = 1
    ), xpairs AS MATERIALIZED (
      SELECT c.id_new
      FROM xcand c
      JOIN b x ON c.id_new = x.vec_id
      JOIN b y ON c.id_ref = y.vec_id
      WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {_Q181_TAU}
    ), surv AS MATERIALIZED (
      SELECT vec_id, v, bucket FROM b
      WHERE vec_id % 2 = 1
        AND vec_id NOT IN (SELECT id_new FROM xpairs)
    ), sizes AS MATERIALIZED (
      SELECT bucket, COUNT(*) AS n FROM surv GROUP BY bucket
    ), small_pairs AS (
      SELECT x.vec_id AS id1, y.vec_id AS id2
      FROM surv x
      JOIN surv y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      JOIN sizes s ON s.bucket = x.bucket
      WHERE s.n BETWEEN 2 AND {_Q187_CAP}
    ), anchors AS (
      SELECT m.bucket, MIN(m.vec_id) AS anchor
      FROM surv m JOIN sizes s ON s.bucket = m.bucket
      WHERE s.n > {_Q187_CAP}
      GROUP BY m.bucket
    ), star_pairs AS (
      SELECT an.anchor AS id1, m.vec_id AS id2
      FROM anchors an
      JOIN surv m ON m.bucket = an.bucket
      WHERE an.anchor < m.vec_id
    ), wcand AS MATERIALIZED (
      SELECT id1, id2 FROM small_pairs
      UNION
      SELECT id1, id2 FROM star_pairs
    ), wpairs AS MATERIALIZED (
      SELECT c.id1, c.id2
      FROM wcand c
      JOIN surv x ON c.id1 = x.vec_id
      JOIN surv y ON c.id2 = y.vec_id
      WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {_Q181_TAU}
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM wpairs
      UNION SELECT id2, id1 FROM wpairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    )
    SELECT s.vec_id FROM surv s
    LEFT JOIN labels l ON s.vec_id = l.id
    WHERE s.vec_id = COALESCE(l.cluster, s.vec_id)
    """


@_register(
    "q214_embedding_increment",
    oracle=_q214_oracle_sql(),
    tags=("similarity", "dedup", "semdedup", "cross-corpus", "pipeline",
          "skew-guard"),
)
def q214_embedding_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.pipelines.corpus import (
        update_embedding_increment,
    )

    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    final, _stats = update_embedding_increment(
        emb.filter(F.col("vec_id") % 2 == 1),
        emb.filter(F.col("vec_id") % 2 == 0),
        "vec_id", "embedding", threshold=_Q181_TAU, dim=EMBEDDING_DIM,
        num_bits=_Q187_BITS, cross_bucket_cap=_Q192_CAP,
        within_bucket_cap=_Q187_CAP,
    )
    return final.select("vec_id")


# ---------------------------------------------------------------------------
# Q215 — EXACT model evaluation: ROC-AUC of the trained lang-id head
# (operators/training.py:roc_auc_exact + naive_bayes_scores, new r9):
# the evaluation leg closing the training family's loop (train q206 →
# score q206/q210 → EVALUATE). The NB model trains on the EVEN docs
# (q210's split), every ODD doc gets its class-0 ('en') score, and the
# AUC of that score against the true (lang = 'en') label is computed
# as exact Mann-Whitney U with tie correction — BIGINT rank sums over
# the engine's two-phase global_cumsum, one double division at the
# end. On this synthetic corpus lang is decorrelated from text, so
# the expected AUC is ≈ 0.5 — the value is the exact replayable
# pipeline, not the score (a learnable-signal AUC is pinned in
# tests/test_training.py with marker vocabularies).
# ---------------------------------------------------------------------------


def _q215_scored_cte(label_case: str) -> str:
    """The shared train-on-even / score-the-odd NB chain ending in a
    ``scored (doc_id, score, y)`` CTE — q215 (ROC-AUC) and q216
    (PR-AUC) differ only in the metric computed after it.
    ``label_case`` is the SQL CASE mapping lang -> class id; the
    scored head is class 0 and y is the (lang = 'en') truth."""
    b = _Q206_B
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), lab AS MATERIALIZED (
      SELECT doc_id, CAST({label_case} AS BIGINT) AS y
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 = 0
    ), fx AS MATERIALIZED (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {b} AS b
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      ) GROUP BY doc_id, b
    ), kb AS MATERIALIZED (
      SELECT l.y AS k, f.b, SUM(f.cnt) AS c_kb
      FROM fx f JOIN lab l USING (doc_id) GROUP BY l.y, f.b
    ), ktot AS (SELECT k, SUM(c_kb) AS tot_k FROM kb GROUP BY k
    ), nk AS (SELECT y AS k, COUNT(*) AS n_k FROM lab GROUP BY y
    ), nn AS (SELECT COUNT(*) AS n_all FROM lab
    ), w AS MATERIALIZED (
      SELECT kb.k, kb.b,
             CAST(ROUND(ln((c_kb + 1.0) / (tot_k + {b})) * 1e6) AS BIGINT)
               AS w_micro
      FROM kb JOIN ktot USING (k)
    ), cls AS MATERIALIZED (
      SELECT nk.k,
             CAST(ROUND(ln(n_k * 1.0 / n.n_all) * 1e6) AS BIGINT)
               AS prior_micro,
             CAST(ROUND(ln(1.0 / (COALESCE(tot_k, 0) + {b})) * 1e6) AS BIGINT)
               AS default_micro
      FROM nk LEFT JOIN ktot USING (k), nn n
    ), tsum AS (
      SELECT base.doc_id, COALESCE(SUM(fx.cnt), 0) AS t_d
      FROM base LEFT JOIN fx USING (doc_id)
      WHERE base.doc_id % 2 = 1 GROUP BY base.doc_id
    ), sobs AS (
      SELECT f.doc_id, SUM(f.cnt * (w.w_micro - c.default_micro)) AS s_obs
      FROM fx f JOIN w ON f.b = w.b JOIN cls c ON w.k = c.k
      WHERE f.doc_id % 2 = 1 AND w.k = 0
      GROUP BY f.doc_id
    ), scored AS MATERIALIZED (
      SELECT t.doc_id,
             c.prior_micro + t.t_d * c.default_micro
               + COALESCE(s.s_obs, 0) AS score,
             CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM tsum t
      JOIN documents d ON d.doc_id = t.doc_id
      CROSS JOIN (SELECT * FROM cls WHERE k = 0) c
      LEFT JOIN sobs s ON s.doc_id = t.doc_id
    )"""


def _q215_oracle_sql() -> str:
    return _q215_scored_cte(_Q205_LANG_CASE) + """, per_value AS (
      SELECT score AS v, COUNT(*) AS cnt, SUM(y) AS pos
      FROM scored GROUP BY score
    ), cum AS (
      SELECT v, cnt, pos,
             SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ccnt
      FROM per_value
    ), tot AS (
      SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
      FROM scored
    )
    SELECT t.n_pos, t.n_neg,
           CAST(SUM(c.pos * (2 * (c.ccnt - c.cnt) + c.cnt + 1))
                - t.n_pos * (t.n_pos + 1) AS BIGINT) AS auc_num,
           CAST(2 * t.n_pos * t.n_neg AS BIGINT) AS auc_den,
           ROUND((SUM(c.pos * (2 * (c.ccnt - c.cnt) + c.cnt + 1))
                  - t.n_pos * (t.n_pos + 1)) * 1.0
                 / (2 * t.n_pos * t.n_neg), 6) AS auc
    FROM cum c, tot t GROUP BY t.n_pos, t.n_neg
    """


@_register(
    "q215_eval_auc",
    oracle=_q215_oracle_sql(),
    tags=("training", "evaluation", "auc", "mann-whitney", "exact",
          "portable"),
)
def q215_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "__y", F.expr(_Q205_LANG_CASE).cast("long")
    )
    model = tr_ops.naive_bayes_model(
        train, "doc_id", "text", "__y", num_buckets=_Q206_B
    )
    test = docs.filter(F.col("doc_id") % 2 == 1)
    scored = (
        tr_ops.naive_bayes_scores(
            test, model, "doc_id", "text", num_buckets=_Q206_B
        )
        .filter(F.col("class") == 0)  # the 'en' head
        .select("doc_id", "score_micro")
    )
    labeled = scored.join(
        test.select(
            "doc_id", (F.col("lang") == "en").cast("long").alias("__y")
        ),
        "doc_id",
    )
    return tr_ops.roc_auc_exact(labeled, "__y", "score_micro")


# ---------------------------------------------------------------------------
# Q216 — EXACT average precision (step-interpolated PR-AUC) of the
# same trained lang-id head q215 evaluates (operators/training.py:
# pr_auc_exact, new r11 — r9 verdict ask #6): ROC-AUC is blind to
# class imbalance, and a training-data filter head is exactly the
# 1:many setting where the PR curve is the metric that moves. Same
# train-on-even / score-the-odd split, same class-0 ('en') scores;
# the metric is AP = sum_v pos(v) * round(1e6·tp(v)/rank(v)) /
# (1e6·n_pos) over distinct scores — per-step precision integer-ized
# ONCE (the micronat rule), so the distributed sum is exact BIGINT
# adds and DuckDB replays it bit-for-bit. Cumulative ranks through
# the two-phase global_cumsum, never a single-partition window.
# ---------------------------------------------------------------------------


def _q216_oracle_sql() -> str:
    return _q215_scored_cte(_Q205_LANG_CASE) + """, per_value AS (
      SELECT score AS v, COUNT(*) AS cnt, SUM(y) AS pos
      FROM scored GROUP BY score
    ), cum AS (
      SELECT v, cnt, pos,
             SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ccnt,
             SUM(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cpos
      FROM per_value
    ), tot AS (
      SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
      FROM scored
    )
    SELECT t.n_pos, t.n_neg,
           CAST(SUM(c.pos * CAST(ROUND(
                  1000000.0 * (t.n_pos - (c.cpos - c.pos))
                  / ((t.n_pos + t.n_neg) - (c.ccnt - c.cnt))
                ) AS BIGINT)) AS BIGINT) AS ap_micro,
           ROUND(SUM(c.pos * CAST(ROUND(
                   1000000.0 * (t.n_pos - (c.cpos - c.pos))
                   / ((t.n_pos + t.n_neg) - (c.ccnt - c.cnt))
                 ) AS BIGINT)) * 1.0 / (1000000.0 * t.n_pos), 6) AS ap
    FROM cum c, tot t GROUP BY t.n_pos, t.n_neg
    """


@_register(
    "q216_eval_pr_auc",
    oracle=_q216_oracle_sql(),
    tags=("training", "evaluation", "pr-auc", "average-precision",
          "exact", "portable"),
)
def q216_eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "__y", F.expr(_Q205_LANG_CASE).cast("long")
    )
    model = tr_ops.naive_bayes_model(
        train, "doc_id", "text", "__y", num_buckets=_Q206_B
    )
    test = docs.filter(F.col("doc_id") % 2 == 1)
    scored = (
        tr_ops.naive_bayes_scores(
            test, model, "doc_id", "text", num_buckets=_Q206_B
        )
        .filter(F.col("class") == 0)  # the 'en' head
        .select("doc_id", "score_micro")
    )
    labeled = scored.join(
        test.select(
            "doc_id", (F.col("lang") == "en").cast("long").alias("__y")
        ),
        "doc_id",
    )
    return tr_ops.pr_auc_exact(labeled, "__y", "score_micro")


# ---------------------------------------------------------------------------
# Q217 — calibration reliability bins of a BINARY NB head
# (operators/training.py:calibration_bins, new r11 — r9 verdict ask
# #6's second half): per fixed LOG-ODDS bin, empirical positive rate
# vs the scores that landed there — the reliability table neither AUC
# sees (AUC is rank-only; a confidently-miscalibrated head ranks
# fine). The model here is the two-class (lang = 'en') NB — binary so
# the log-odds s1 - s0 is ONE exact BIGINT micronat difference per
# doc, no softmax — trained on even doc_ids, binned over the odd.
# Binning is the q213 PSI contract (explicit lo/width/n_bins, clamped
# floor) so two snapshots' tables are comparable by construction; all
# bins are returned, densified from a range frame. Everything is
# BIGINT-exact up to the two per-bin int/int divisions (mean_score,
# pos_rate), each rounded once.
# ---------------------------------------------------------------------------

_Q217_LABEL_CASE = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
_Q217_LO, _Q217_W, _Q217_B = -50_000_000, 2_000_000, 50


def _q217_oracle_sql() -> str:
    b = _Q206_B
    lo, w, nb = _Q217_LO, _Q217_W, _Q217_B
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), lab AS MATERIALIZED (
      SELECT doc_id, CAST({_Q217_LABEL_CASE} AS BIGINT) AS y
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 = 0
    ), fx AS MATERIALIZED (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {b} AS b
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      ) GROUP BY doc_id, b
    ), kb AS MATERIALIZED (
      SELECT l.y AS k, f.b, SUM(f.cnt) AS c_kb
      FROM fx f JOIN lab l USING (doc_id) GROUP BY l.y, f.b
    ), ktot AS (SELECT k, SUM(c_kb) AS tot_k FROM kb GROUP BY k
    ), nk AS (SELECT y AS k, COUNT(*) AS n_k FROM lab GROUP BY y
    ), nn AS (SELECT COUNT(*) AS n_all FROM lab
    ), w AS MATERIALIZED (
      SELECT kb.k, kb.b,
             CAST(ROUND(ln((c_kb + 1.0) / (tot_k + {b})) * 1e6) AS BIGINT)
               AS w_micro
      FROM kb JOIN ktot USING (k)
    ), cls AS MATERIALIZED (
      SELECT nk.k,
             CAST(ROUND(ln(n_k * 1.0 / n.n_all) * 1e6) AS BIGINT)
               AS prior_micro,
             CAST(ROUND(ln(1.0 / (COALESCE(tot_k, 0) + {b})) * 1e6) AS BIGINT)
               AS default_micro
      FROM nk LEFT JOIN ktot USING (k), nn n
    ), tsum AS (
      SELECT base.doc_id, COALESCE(SUM(fx.cnt), 0) AS t_d
      FROM base LEFT JOIN fx USING (doc_id)
      WHERE base.doc_id % 2 = 1 GROUP BY base.doc_id
    ), sobs AS (
      SELECT f.doc_id, w.k, SUM(f.cnt * (w.w_micro - c.default_micro)) AS s_obs
      FROM fx f JOIN w ON f.b = w.b JOIN cls c ON w.k = c.k
      WHERE f.doc_id % 2 = 1
      GROUP BY f.doc_id, w.k
    ), scored AS MATERIALIZED (
      SELECT t.doc_id, c.k,
             c.prior_micro + t.t_d * c.default_micro
               + COALESCE(s.s_obs, 0) AS score
      FROM tsum t
      CROSS JOIN cls c
      LEFT JOIN sobs s ON s.doc_id = t.doc_id AND s.k = c.k
    ), lodds AS (
      SELECT s.doc_id,
             MAX(CASE WHEN s.k = 1 THEN s.score END)
               - MAX(CASE WHEN s.k = 0 THEN s.score END) AS lo_micro,
             CAST(MAX(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id
      GROUP BY s.doc_id
    ), per_bin AS (
      SELECT LEAST({nb} - 1, GREATEST(0,
               CAST(FLOOR((lo_micro - ({lo})) * 1.0 / {w}) AS BIGINT)
             )) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(lo_micro) AS BIGINT) AS sum_score
      FROM lodds GROUP BY 1
    )
    SELECT r.bin,
           CAST({lo} + r.bin * {w} AS BIGINT) AS bin_lo,
           COALESCE(p.n, 0) AS n,
           COALESCE(p.n_pos, 0) AS n_pos,
           COALESCE(p.sum_score, 0) AS sum_score,
           CASE WHEN COALESCE(p.n, 0) > 0
                THEN ROUND(p.sum_score * 1.0 / p.n, 6) END AS mean_score,
           CASE WHEN COALESCE(p.n, 0) > 0
                THEN ROUND(p.n_pos * 1.0 / p.n, 6) END AS pos_rate
    FROM (SELECT CAST(range AS BIGINT) AS bin FROM range({nb})) r
    LEFT JOIN per_bin p USING (bin)
    ORDER BY r.bin
    """


@_register(
    "q217_eval_calibration",
    oracle=_q217_oracle_sql(),
    tags=("training", "evaluation", "calibration", "reliability",
          "exact", "portable"),
)
def q217_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "__y", F.expr(_Q217_LABEL_CASE).cast("long")
    )
    model = tr_ops.naive_bayes_model(
        train, "doc_id", "text", "__y", num_buckets=_Q206_B
    )
    test = docs.filter(F.col("doc_id") % 2 == 1)
    scores = tr_ops.naive_bayes_scores(
        test, model, "doc_id", "text", num_buckets=_Q206_B
    )
    lodds = scores.groupBy("doc_id").agg(
        (
            F.max(F.when(F.col("class") == 1, F.col("score_micro")))
            - F.max(F.when(F.col("class") == 0, F.col("score_micro")))
        ).alias("lo_micro")
    )
    labeled = lodds.join(
        test.select(
            "doc_id", (F.col("lang") == "en").cast("long").alias("__y")
        ),
        "doc_id",
    )
    return tr_ops.calibration_bins(
        labeled, "__y", "lo_micro",
        lo=_Q217_LO, width=_Q217_W, n_bins=_Q217_B,
    )


# ---------------------------------------------------------------------------
# Q218 — STREAMING drift monitor (streaming/drift.py, new r11 — r9
# verdict ask #7): PSI of a document STREAM against the curated
# reference's FIXED census, per snapshot window. The reference (even
# doc_ids) is binned ONCE (q213's explicit lo/width/n_bins contract);
# the stream (odd doc_ids, snapshot = doc_id % 8) folds per-
# (snapshot, bin) counts through ONE bounded streaming aggregation —
# state is snapshots x n_bins counter cells, never row-order — and
# the exact-BIGINT PSI arithmetic (q213's psi_num/psi_den factoring,
# operators/regress.py:psi_vs_census) runs batch-side on the folded
# census. Counts sum-fold associatively, so ANY micro-batch split of
# the source yields identical output (multi-batch-equals-batch pinned
# in tests/test_streaming_drift.py, which also exercises the
# foreachBatch per-micro-batch monitor shape) — which is what lets a
# batch DuckDB oracle replay the whole monitor.
# ---------------------------------------------------------------------------


def _q218_oracle_sql() -> str:
    lo, w, nb = _Q213_LO, _Q213_W, _Q213_B
    return f"""
    WITH refc AS (
      SELECT LEAST({nb} - 1, GREATEST(0,
               CAST(FLOOR((n_chars - ({lo})) * 1.0 / {w}) AS BIGINT))) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cb
      FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
      GROUP BY 1
    ), nbt AS (SELECT CAST(SUM(cb) AS BIGINT) AS n_b FROM refc
    ), ca AS (
      SELECT doc_id % 8 AS snapshot,
             LEAST({nb} - 1, GREATEST(0,
               CAST(FLOOR((n_chars - ({lo})) * 1.0 / {w}) AS BIGINT))) AS bin,
             CAST(COUNT(*) AS BIGINT) AS ca
      FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
      GROUP BY 1, 2
    ), na AS (SELECT snapshot, CAST(SUM(ca) AS BIGINT) AS n_a
              FROM ca GROUP BY 1
    ), axis AS (
      SELECT s.snapshot, b.bin
      FROM (SELECT DISTINCT snapshot FROM ca) s
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS bin FROM range({nb})) b
    ), dense AS (
      SELECT a.snapshot, a.bin,
             COALESCE(c.ca, 0) AS ca, COALESCE(r.cb, 0) AS cb
      FROM axis a
      LEFT JOIN ca c USING (snapshot, bin)
      LEFT JOIN refc r USING (bin)
    ), terms AS (
      SELECT d.snapshot, na.n_a, nbt.n_b,
             ((d.ca + 1) * (nbt.n_b + {nb})
              - (d.cb + 1) * (na.n_a + {nb}))
             * CAST(ROUND(ln(((d.ca + 1) * (nbt.n_b + {nb})) * 1.0
                             / ((d.cb + 1) * (na.n_a + {nb}))) * 1e6)
                    AS BIGINT) AS t
      FROM dense d JOIN na USING (snapshot), nbt
    )
    SELECT snapshot,
           CAST({nb} AS BIGINT) AS n_bins, n_a, n_b,
           CAST(SUM(t) AS BIGINT) AS psi_num,
           CAST((n_a + {nb}) * (n_b + {nb}) * 1000000 AS BIGINT) AS psi_den,
           ROUND(SUM(t) * 1.0 / ((n_a + {nb}) * (n_b + {nb})) / 1e6, 6)
             AS psi
    FROM terms GROUP BY 1, 3, 4
    ORDER BY 1
    """


@_register(
    "q218_stream_drift_monitor",
    oracle=_q218_oracle_sql(),
    tags=("streaming", "drift", "psi", "monitor", "exact", "fold"),
)
def q218_stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.sources.readers import (
        read_parquet_stream,
    )
    from us_immigration_data_lake_spark.streaming.drift import (
        reference_census,
        stream_psi_by_snapshot,
    )

    _tune(spark)
    ref = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    census = reference_census(
        ref, "n_chars", lo=_Q213_LO, width=_Q213_W, n_bins=_Q213_B
    )
    stream = (
        read_parquet_stream(spark, f"{sf_dir.rstrip('/')}/documents*.parquet")
        .filter(F.col("doc_id") % 2 == 1)
        .withColumn("snapshot", F.pmod(F.col("doc_id"), F.lit(8)))
    )
    return stream_psi_by_snapshot(
        stream, census, "snapshot", "n_chars",
        lo=_Q213_LO, width=_Q213_W, n_bins=_Q213_B,
        sink_name=_sink_name("q218_psi"),
    )


# ---------------------------------------------------------------------------
# Q219 — multiclass classification report (operators/training.py:
# classification_report, new r11): the MULTICLASS leg of the
# evaluation family — q215/q216 evaluate one binary head, this
# evaluates the full K-class lang-id argmax. Train the q206
# closed-form NB on the EVEN docs, classify the ODD docs, and report
# per class: n_true, n_pred, tp, precision, recall, f1 — each ratio
# ONE exact int/int division (f1 = 2tp/(n_true+n_pred), no compounded
# precision/recall rounding). Three ≤K-key aggregations + K-sized
# joins; the oracle replays training, argmax (score DESC, class ASC
# tiebreak) and the confusion arithmetic bit-for-bit.
# ---------------------------------------------------------------------------


def _q219_oracle_sql() -> str:
    b = _Q206_B
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), lab AS MATERIALIZED (
      SELECT doc_id, CAST({_Q205_LANG_CASE} AS BIGINT) AS k
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 = 0
    ), fx AS MATERIALIZED (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {b} AS b
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      ) GROUP BY doc_id, b
    ), kb AS MATERIALIZED (
      SELECT l.k, f.b, SUM(f.cnt) AS c_kb
      FROM fx f JOIN lab l USING (doc_id) GROUP BY l.k, f.b
    ), ktot AS (SELECT k, SUM(c_kb) AS tot_k FROM kb GROUP BY k
    ), nk AS (SELECT k, COUNT(*) AS n_k FROM lab GROUP BY k
    ), nn AS (SELECT COUNT(*) AS n_all FROM lab
    ), w AS MATERIALIZED (
      SELECT kb.k, kb.b,
             CAST(ROUND(ln((c_kb + 1.0) / (tot_k + {b})) * 1e6) AS BIGINT)
               AS w_micro
      FROM kb JOIN ktot USING (k)
    ), cls AS MATERIALIZED (
      SELECT nk.k,
             CAST(ROUND(ln(n_k * 1.0 / n.n_all) * 1e6) AS BIGINT)
               AS prior_micro,
             CAST(ROUND(ln(1.0 / (COALESCE(tot_k, 0) + {b})) * 1e6) AS BIGINT)
               AS default_micro
      FROM nk LEFT JOIN ktot USING (k), nn n
    ), tsum AS (
      SELECT base.doc_id, COALESCE(SUM(fx.cnt), 0) AS t_d
      FROM base LEFT JOIN fx USING (doc_id)
      WHERE base.doc_id % 2 = 1 GROUP BY base.doc_id
    ), sobs AS (
      SELECT f.doc_id, w.k,
             SUM(f.cnt * (w.w_micro - c.default_micro)) AS s_obs
      FROM fx f JOIN w ON f.b = w.b JOIN cls c ON w.k = c.k
      WHERE f.doc_id % 2 = 1
      GROUP BY f.doc_id, w.k
    ), scored AS (
      SELECT t.doc_id, c.k,
             c.prior_micro + t.t_d * c.default_micro
               + COALESCE(s.s_obs, 0) AS score
      FROM tsum t CROSS JOIN cls c
      LEFT JOIN sobs s ON s.doc_id = t.doc_id AND s.k = c.k
    ), predicted AS MATERIALIZED (
      SELECT s.doc_id, s.k AS p,
             CAST({_Q205_LANG_CASE.replace("lang", "d.lang")} AS BIGINT) AS y
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score DESC, k ASC) AS rn
            FROM scored) s
      JOIN documents d ON d.doc_id = s.doc_id
      WHERE s.rn = 1
    ), classes AS (
      SELECT DISTINCT y AS class FROM predicted
      UNION SELECT DISTINCT p FROM predicted
    ), tr AS (SELECT y AS class, CAST(COUNT(*) AS BIGINT) AS n_true
              FROM predicted GROUP BY 1
    ), pr AS (SELECT p AS class, CAST(COUNT(*) AS BIGINT) AS n_pred
              FROM predicted GROUP BY 1
    ), tpx AS (SELECT y AS class, CAST(COUNT(*) AS BIGINT) AS tp
               FROM predicted WHERE y = p GROUP BY 1
    )
    SELECT c.class,
           COALESCE(tr.n_true, 0) AS n_true,
           COALESCE(pr.n_pred, 0) AS n_pred,
           COALESCE(tpx.tp, 0) AS tp,
           CASE WHEN COALESCE(pr.n_pred, 0) > 0
                THEN ROUND(COALESCE(tpx.tp, 0) * 1.0 / pr.n_pred, 6)
           END AS precision,
           CASE WHEN COALESCE(tr.n_true, 0) > 0
                THEN ROUND(COALESCE(tpx.tp, 0) * 1.0 / tr.n_true, 6)
           END AS recall,
           CASE WHEN COALESCE(tr.n_true, 0) + COALESCE(pr.n_pred, 0) > 0
                THEN ROUND(2 * COALESCE(tpx.tp, 0) * 1.0
                           / (COALESCE(tr.n_true, 0) + COALESCE(pr.n_pred, 0)),
                           6)
           END AS f1
    FROM classes c
    LEFT JOIN tr USING (class)
    LEFT JOIN pr USING (class)
    LEFT JOIN tpx USING (class)
    ORDER BY c.class
    """


@_register(
    "q219_eval_classification_report",
    oracle=_q219_oracle_sql(),
    tags=("training", "evaluation", "confusion-matrix", "f1",
          "multiclass", "portable"),
)
def q219_eval_classification_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from us_immigration_data_lake_spark.operators import training as tr_ops

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "__y", F.expr(_Q205_LANG_CASE).cast("long")
    )
    model = tr_ops.naive_bayes_model(
        train, "doc_id", "text", "__y", num_buckets=_Q206_B
    )
    test = docs.filter(F.col("doc_id") % 2 == 1)
    pred = tr_ops.naive_bayes_classify(
        test, model, "doc_id", "text", num_buckets=_Q206_B
    )
    labeled = pred.join(
        test.select("doc_id", F.expr(_Q205_LANG_CASE).cast("long").alias("__y")),
        "doc_id",
    )
    return tr_ops.classification_report(labeled, "__y", "pred_class")


# ---------------------------------------------------------------------------
# Q220 — temperature mixture sampling weights (operators/sampling.py:
# temperature_mixture_weights, new r11): the mT5/XLM-R multi-source
# balancing rule q_s ∝ p_s^α over the documents corpus's language
# axis — the knob a multilingual training mixture actually turns.
# Whitespace
# token counts per doc (q17's counting convention) sum per lang; the
# α-tempered share integer-izes ONCE per source (round(1e6·p^α), the
# micronat rule), then the normalized ppm share and a 10M-token
# budget allocation are each one exact int/int division. ONE corpus
# scan + a K-row source axis; the oracle replays pow/round/divide
# bit-for-bit.
# ---------------------------------------------------------------------------

_Q220_ALPHA, _Q220_BUDGET = 0.3, 10_000_000


def _q220_oracle_sql() -> str:
    a, budget = _Q220_ALPHA, _Q220_BUDGET
    return f"""
    WITH toks AS (
      SELECT lang,
             CAST(len(list_filter(
               string_split_regex(trim(text), '\\s+'), t -> t <> ''
             )) AS BIGINT) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ), per AS (
      SELECT lang AS "group", CAST(SUM(n_tok) AS BIGINT) AS n
      FROM toks GROUP BY 1 HAVING SUM(n_tok) > 0
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM per
    ), wgt AS (
      SELECT p."group", p.n,
             CAST(ROUND(1000000.0 * POW(p.n * 1.0 / t.nn, {a})) AS BIGINT)
               AS w_micro
      FROM per p, tot t
    ), ws AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS ww FROM wgt)
    SELECT w."group", w.n, w.w_micro,
           CAST(ROUND(1000000.0 * w.w_micro / s.ww) AS BIGINT) AS q_ppm,
           CAST(ROUND({budget}.0 * w.w_micro / s.ww) AS BIGINT) AS alloc
    FROM wgt w, ws s
    ORDER BY w."group"
    """


@_register(
    "q220_temperature_mixture",
    oracle=_q220_oracle_sql(),
    tags=("sampling", "mixture", "temperature", "multilingual",
          "portable"),
)
def q220_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sized = docs.select(
        "lang",
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).cast("long").alias("n_tok"),
    )
    return temperature_mixture_weights(
        sized, "lang", "n_tok", alpha=_Q220_ALPHA, budget=_Q220_BUDGET
    )


# ---------------------------------------------------------------------------
# Q221 — ANN recall@k calibration (operators/similarity.py:
# ann_recall_at_k, new r11): the QUALITY metric the ANN family was
# missing in the registry — q22 is the exact baseline, q24 the scale
# plan; this measures per query what the bucketed plan trades away
# (recall = |approx ∩ exact| / k over deterministic top-k sets, both
# sides tie-broken cosine DESC / neighbor_id ASC so two engines agree
# on every member). The oracle replays BOTH sides: q22's brute-force
# chain and q24's hash-for-hash SRP bucket replay (plane literals
# embedded at full precision), joined into per-query hit counts. The
# offline-calibration shape: tune num_bits/multiprobe until recall
# clears target, then deploy the approximate plan.
# ---------------------------------------------------------------------------

_Q221_K, _Q221_BITS, _Q221_NQ = 5, 6, 50


def _q221_oracle_sql() -> str:
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q221_BITS, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_Q221_BITS)
    )
    k, nq = _Q221_K, _Q221_NQ
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket FROM base),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
          WHERE vec_id < {nq}),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC,
                          c.neighbor_id) AS rn
        FROM q JOIN c ON q.query_id != c.neighbor_id
      ) WHERE rn <= {k}
    ), approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC,
                          c.neighbor_id) AS rn
        FROM q JOIN c USING (bucket)
        WHERE q.query_id != c.neighbor_id
      ) WHERE rn <= {k}
    ), ne AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
              FROM exact GROUP BY 1
    ), na AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_approx
              FROM approx GROUP BY 1
    ), h AS (
      SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS hits
      FROM exact e JOIN approx a USING (query_id, neighbor_id)
      GROUP BY 1
    )
    SELECT ne.query_id, ne.n_exact,
           COALESCE(na.n_approx, 0) AS n_approx,
           COALESCE(h.hits, 0) AS hits,
           ROUND(COALESCE(h.hits, 0) * 1.0 / ne.n_exact, 6) AS recall
    FROM ne LEFT JOIN na USING (query_id) LEFT JOIN h USING (query_id)
    ORDER BY ne.query_id
    """


@_register(
    "q221_ann_recall",
    oracle=_q221_oracle_sql(),
    tags=("similarity", "ann", "recall", "evaluation", "calibration"),
)
def q221_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _Q221_NQ)
    return sim_ops.ann_recall_at_k(
        emb, queries, "vec_id", "embedding", k=_Q221_K, dim=EMBEDDING_DIM,
        num_bits=_Q221_BITS, seed=42,
    )


# ---------------------------------------------------------------------------
# Q222 — leakage-safe cluster split (functions/splits.py:
# cluster_split_label, new r11): the eval-contamination guard a real
# training pipeline runs AFTER near-dup detection — a test document
# whose near-duplicate sits in train leaks the benchmark, so the
# train/test split is assigned per CONNECTED near-dup CLUSTER
# (q43's exact-Jaccard postings pairs → CC → cluster = smallest id),
# and the md5 split bucket (q48's one-true-formula) hashes the
# CLUSTER id; members inherit. The oracle chains q43's WITH RECURSIVE
# reachability with q48's bucket CASE — by construction no near-dup
# pair can straddle the boundary, and the planted-pair test pins it.
# ---------------------------------------------------------------------------

@_register(
    "q222_leakage_safe_split",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents WHERE doc_id < 200
    ), sh AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_distinct([array_to_string(toks[i:i+1], ' ')
                                      for i in range(1, len(toks))])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok
    ), pairs AS MATERIALIZED (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) >= 0.08
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    ), clustered AS (
      SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
      FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
      LEFT JOIN labels l ON d.doc_id = l.id
    )
    SELECT doc_id, cluster,
           CASE WHEN (('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 4))
                      ::INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM clustered
    """,
    tags=("sampling", "split", "dedup", "decontamination", "portable"),
)
def q222_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.functions.splits import (
        cluster_split_label,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = dedup_ops.shingles(docs, "doc_id", "text", n=2)
    pairs = dedup_ops.postings_jaccard_pairs(sh, "doc_id", min_jaccard=0.08)
    return cluster_split_label(
        docs, pairs.select("id1", "id2"), "doc_id", train_pct=80
    )


# ---------------------------------------------------------------------------
# Q223 — MinHash estimator calibration (operators/dedup.py:
# minhash_estimate_calibration, new r11): q221's role for the TEXT
# near-dup family. q20 prices the banding's recall; this prices the
# ESTIMATOR the band/threshold math is derived from — per banded
# candidate pair, the signature-agreement estimate (n_match /
# num_hashes) next to the exact hashed-set Jaccard and their
# |error|. The offline tuning loop: raise num_hashes until the
# observed error spread clears the dedup threshold's margin, then
# deploy the cheaper signature. The oracle replays the full portable
# pipeline (shared q20 prefix CTEs) and compares the 24 mh columns
# pairwise, hash-for-hash.
# ---------------------------------------------------------------------------

_Q223_WHERE = " WHERE doc_id < 1000"


def _q223_oracle_sql() -> str:
    nh, nb = _Q20_HASHES, _Q20_BANDS
    match_sum = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(nh)
    )
    est = f"ROUND(({match_sum}) * 1.0 / {nh}, 6)"
    exact = (
        "ROUND(len(list_intersect(h1.hs, h2.hs)) * 1.0"
        " / (len(h1.hs) + len(h2.hs)"
        " - len(list_intersect(h1.hs, h2.hs))), 6)"
    )
    return f"""
    WITH {_portable_minhash_prefix_sql(_Q223_WHERE, nh, nb)}, cand AS (
      SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
      FROM bnd x JOIN bnd y
        ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       AND x.doc_id < y.doc_id
    ), hs AS (
      SELECT doc_id, list(h) AS hs FROM hx GROUP BY doc_id
    )
    SELECT c.id1, c.id2,
           CAST({match_sum} AS BIGINT) AS n_match,
           {est} AS est_jaccard,
           {exact} AS exact_jaccard,
           ROUND(ABS({est} - {exact}), 6) AS abs_err
    FROM cand c
    JOIN sig a ON c.id1 = a.doc_id
    JOIN sig b ON c.id2 = b.doc_id
    JOIN hs h1 ON c.id1 = h1.doc_id
    JOIN hs h2 ON c.id2 = h2.doc_id
    """


@_register(
    "q223_minhash_calibration",
    oracle=_q223_oracle_sql(),
    tags=("dedup", "minhash", "calibration", "evaluation", "portable"),
)
def q223_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return dedup_ops.minhash_estimate_calibration(
        docs, "doc_id", "text", shingle_n=2, num_hashes=_Q20_HASHES,
        bands=_Q20_BANDS, portable=True, max_bucket_size=2**31,
    )


# ---------------------------------------------------------------------------
# Q224 — deterministic epoch shuffle (operators/sampling.py:
# epoch_shuffle_order, new r11): the between-epoch corpus shuffle of a
# training pipeline as a PURE FUNCTION of (epoch, id) — md5_long
# shuffle key, shard = key mod n_shards, position = row_number within
# the shard — so any engine, run, or resumed job reproduces the exact
# byte order with no stored permutation, and resume-mid-epoch is a
# filter on (shard, pos). One hash shuffle + partition-local sort; no
# global ordering exchange (contrast W3's two-phase global
# row_number, which this deliberately avoids because training order
# only needs per-shard addresses).
# ---------------------------------------------------------------------------

_Q224_EPOCH, _Q224_SHARDS = 3, 16


@_register(
    "q224_epoch_shuffle",
    bench=True,  # r11: the training-order perf axis — one hash shuffle
    # + partition-local sort; benches the no-global-exchange claim
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             ('0x' || substr(md5('{_Q224_EPOCH}|' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT AS shuffle_key
      FROM documents
    )
    SELECT doc_id, shuffle_key,
           shuffle_key % {_Q224_SHARDS} AS shard,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY shuffle_key % {_Q224_SHARDS}
                  ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
    FROM keyed
    """,
    tags=("sampling", "shuffle", "training-order", "portable"),
)
def q224_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        epoch_shuffle_order,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return epoch_shuffle_order(
        docs, "doc_id", epoch=_Q224_EPOCH, n_shards=_Q224_SHARDS
    )


# ---------------------------------------------------------------------------
# Q225 — tokenizer fertility per language (operators/textstats.py:
# bpe_token_counts grouped by lang, new r11): fertility = model tokens
# per whitespace word, THE multilingual tokenizer-quality diagnostic
# (a vocabulary trained lopsidedly makes some languages 2-3× more
# expensive per word, which silently reprices every token-budget
# decision q159/q220 make). Rides q209's machinery end-to-end — train
# q194's merges, encode the vocabulary, join the corpus — and adds
# one lang-keyed aggregation; the oracle nests q209's full generated
# replay as a subquery and re-groups it.
# ---------------------------------------------------------------------------


def _q225_oracle_sql() -> str:
    return f"""
    WITH per_doc AS ({_q209_oracle_sql()})
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_words) AS BIGINT) AS n_words,
           CAST(SUM(p.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
           ROUND(SUM(p.n_bpe_tokens) * 1.0 / SUM(p.n_words), 6) AS fertility
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """


@_register(
    "q225_tokenizer_fertility",
    oracle=_q225_oracle_sql(),
    tags=("llm", "tokenizer", "bpe", "fertility", "multilingual",
          "portable"),
)
def q225_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in ts_ops.bpe_merges(docs, "text", n_merges=_Q194_MERGES)
        .orderBy("rank")
        .collect()  # model-sized: the trained merge table
    ]
    counts = ts_ops.bpe_token_counts(
        docs.filter(F.col("text").isNotNull()), "doc_id", "text", merges
    )
    return (
        counts.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_bpe_tokens").cast("double")
                / F.sum("n_words").cast("double"),
                6,
            ).alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# Q226 — per-source document cap (operators/sampling.py:per_group_cap,
# new r11): keep at most CAP docs per source, selected by
# deterministic (source, id) hash order — the per-domain cap a crawl
# pipeline applies so one mega-site cannot dominate the mix; a
# count-based complement to q63's rate-based stratified downsample
# (rates can't express "never more than N", caps can't express "keep
# 10%"; real mixes use both). Kept rows carry their 1-based cap_rank
# so a tighter cap downstream is a filter, not a rescan.
# ---------------------------------------------------------------------------

_Q226_CAP = 15


@_register(
    "q226_per_source_cap",
    oracle=f"""
    SELECT doc_id, source, rn AS cap_rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(source || '|'
                           || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id) AS BIGINT) AS rn
      FROM documents
    ) WHERE rn <= {_Q226_CAP}
    """,
    tags=("sampling", "cap", "group-limit", "portable"),
    bench=True,  # r11: the group-limit window shape at corpus scale
)
def q226_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        per_group_cap,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return per_group_cap(docs, "source", "doc_id", cap=_Q226_CAP)


# ---------------------------------------------------------------------------
# Q227 — curriculum ordering (operators/sampling.py:curriculum_order,
# new r11): the quality-staged training plan — q17's per-doc quality
# score binned on a FIXED [0,1) axis (stable across corpus versions,
# unlike ntile's data-dependent edges) with a deterministic
# pseudo-random order inside each bin (q224's hash contract). A
# trainer consumes bins in its chosen direction and resumes from any
# (bin, pos). The oracle nests q17's scoring replay, re-derives the
# bin arithmetic, and replays the per-bin row_number.
# ---------------------------------------------------------------------------

_Q227_BINS, _Q227_EPOCH = 4, 1


def _q227_oracle_sql() -> str:
    q17 = QUERIES["q17_quality_score"].oracle
    nb, ep = _Q227_BINS, _Q227_EPOCH
    return f"""
    WITH scored AS ({q17}), binned AS (
      SELECT doc_id, quality_score,
             LEAST(GREATEST(CAST(FLOOR(quality_score / (1.0 / {nb}))
                                 AS BIGINT), 0), {nb - 1}) AS quality_bin,
             ('0x' || substr(md5('{ep}|' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT AS k
      FROM scored
    )
    SELECT doc_id, quality_score, quality_bin,
           CAST(ROW_NUMBER() OVER (PARTITION BY quality_bin
                                   ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM binned
    """


@_register(
    "q227_curriculum_order",
    oracle=_q227_oracle_sql(),
    tags=("sampling", "curriculum", "quality", "training-order",
          "portable"),
)
def q227_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        curriculum_order,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(ts_ops.text_features(docs, "doc_id", "text"))
    return curriculum_order(
        scored, "doc_id", "quality_score",
        n_bins=_Q227_BINS, epoch=_Q227_EPOCH,
    )


# ---------------------------------------------------------------------------
# Q228 — mixture interleave order (operators/sampling.py:
# mixture_interleave_order, new r11): the schedule that REALIZES
# q220's mixture policy — weighted-fair-queuing virtual time
# (source s's i-th doc at i·round(1e12/q_ppm)) turns per-source
# shares into one deterministic global reading order whose every
# prefix respects the shares. Per-source positions are q224's hash
# contract; the only global structure is W3's two-phase
# global_row_number range exchange. The oracle nests q220's full
# weights replay, re-derives positions/virtual times, and replays the
# single total order.
# ---------------------------------------------------------------------------

_Q228_EPOCH = 1


def _q228_oracle_sql() -> str:
    ep = _Q228_EPOCH
    return f"""
    WITH w AS ({_q220_oracle_sql()}), keyed AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('{ep}|' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT AS k
      FROM documents WHERE text IS NOT NULL
    ), pos AS (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY k, doc_id) AS BIGINT) AS pos
      FROM keyed
    ), vt AS (
      SELECT p.doc_id, p.lang, p.pos,
             p.pos * CAST(ROUND(1000000000000.0 / w.q_ppm) AS BIGINT)
               AS v_time
      FROM pos p JOIN w ON p.lang = w."group"
      WHERE w.q_ppm > 0
    )
    SELECT doc_id, lang, pos, v_time,
           CAST(ROW_NUMBER() OVER (ORDER BY v_time, lang, doc_id)
                AS BIGINT) AS global_pos
    FROM vt
    """


@_register(
    "q228_mixture_interleave",
    oracle=_q228_oracle_sql(),
    tags=("sampling", "mixture", "interleave", "wfq", "training-order",
          "portable"),
)
def q228_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        mixture_interleave_order,
        temperature_mixture_weights,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sized = docs.select(
        "lang",
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).cast("long").alias("n_tok"),
    )
    weights = temperature_mixture_weights(
        sized, "lang", "n_tok", alpha=_Q220_ALPHA, budget=_Q220_BUDGET
    )
    return mixture_interleave_order(
        docs.select("doc_id", "lang"), "doc_id", "lang", weights,
        epoch=_Q228_EPOCH,
    )


# ---------------------------------------------------------------------------
# Q229 — script profile (operators/textstats.py:script_profile, new
# r11): per-document writing-system mix (latin/digit/whitespace/CJK
# counts, ppm shares, deterministic dominant class) — the diagnostic
# that routes documents BEFORE stopword lang-id (q18 assumes you
# already know the script). Pure per-row regexp_count expressions in
# whole-stage codegen; the pattern strings embed literal characters
# (not \u escapes) so the SAME pattern is valid RE2 and Java regex,
# and the oracle replays it with regexp_extract_all.
# ---------------------------------------------------------------------------


def _q229_oracle_sql() -> str:
    from us_immigration_data_lake_spark.operators.textstats import (
        SCRIPT_CLASSES,
    )

    names = [n for n, _ in SCRIPT_CLASSES] + ["other"]
    cnt = {
        n: f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT)"
        for n, p in SCRIPT_CLASSES
    }
    known = " + ".join(f"n_{n}" for n, _ in SCRIPT_CLASSES)
    ppm = ",\n           ".join(
        f"CASE WHEN n_chars_total = 0 THEN 0 ELSE "
        f"CAST(ROUND(1000000.0 * n_{n} / n_chars_total) AS BIGINT) END"
        f" AS {n}_ppm"
        for n in names
    )
    dom = "CASE WHEN n_chars_total = 0 THEN 'empty' "
    for i, n in enumerate(names):
        others = names[i + 1:]
        if others:
            cond = " AND ".join(f"n_{n} >= n_{o}" for o in others)
            dom += f"WHEN {cond} THEN '{n}' "
        else:
            dom += f"ELSE '{n}' "
    dom += "END AS dominant_script"
    counts_sql = ",\n             ".join(
        f"{cnt[n]} AS n_{n}" for n, _ in SCRIPT_CLASSES
    )
    return f"""
    WITH c AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_total,
             {counts_sql}
      FROM documents
    ), full_c AS (
      SELECT *, CAST(n_chars_total - ({known}) AS BIGINT) AS n_other
      FROM c
    )
    SELECT doc_id, n_chars_total,
           {", ".join(f"n_{n}" for n in names)},
           {ppm},
           {dom}
    FROM full_c
    """


@_register(
    "q229_script_profile",
    oracle=_q229_oracle_sql(),
    tags=("textstats", "script", "unicode", "profile", "portable"),
)
def q229_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    return ts_ops.script_profile(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Q230 — contrastive hard-negative mining (operators/similarity.py:
# hard_negatives, new r11): per vector, the k highest-cosine
# candidates OUTSIDE its exact near-dup CLUSTER — the training-pair
# generator for embedding models. Exclusion is cluster-transitive
# (q34's exact pair graph → q43's connected components): a near-dup
# of a near-dup is the same content, and pushing it away as a
# "negative" poisons the space. Verification-grade all-pairs on the
# contract-restricted slice (the offline mining shape, like q221); at
# corpus scale the candidates come from srp_lsh_knn + a cluster
# anti-join with these semantics as the contract. Oracle: recursive
# reachability over the round-6 cosine pair graph (q222's idiom on
# the embedding side) + the exclusion-filtered ranking replay.
# ---------------------------------------------------------------------------

_Q230_N, _Q230_K, _Q230_THR = 150, 5, 0.35


def _q230_oracle_sql() -> str:
    n, k, thr = _Q230_N, _Q230_K, _Q230_THR
    return f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < {n}
    ), pairs AS MATERIALIZED (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM base a JOIN base b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {thr}
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    ), cl AS (
      SELECT b.vec_id, b.v, COALESCE(l.cluster, b.vec_id) AS cluster
      FROM base b LEFT JOIN labels l ON b.vec_id = l.id
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine_sim
      FROM cl q JOIN cl c
        ON q.vec_id <> c.vec_id AND q.cluster <> c.cluster
    )
    SELECT query_id, neighbor_id, cosine_sim, rn AS neg_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


@_register(
    "q230_hard_negatives",
    oracle=_q230_oracle_sql(),
    tags=("similarity", "contrastive", "hard-negatives", "mining",
          "clustering", "portable"),
)
def q230_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _Q230_N)
    return sim_ops.hard_negatives(
        emb, "vec_id", "embedding", k=_Q230_K, dim=EMBEDDING_DIM,
        dup_threshold=_Q230_THR,
    )


# ---------------------------------------------------------------------------
# Q231 — STREAMING mixture-share monitor (streaming/drift.py:
# stream_mixture_by_snapshot, new r11): q218 asked "does the value
# DISTRIBUTION still look like the curated corpus?"; this asks the
# companion question a mixture pipeline owns — "does the SOURCE MIX?"
# Per snapshot, per-source doc shares against the curated reference's
# own mix (policy_ppm), via ONE bounded streaming count fold
# (snapshots × sources state cells); share/deviation arithmetic
# batch-side. Sources present in the policy but ABSENT from a
# snapshot report n=0 (a vanished source is drift too). Oracle: the
# batch replay of fold + densify + shares (finite source ⇒ identical
# results, the q195/q218 argument).
# ---------------------------------------------------------------------------

_Q231_SNAPS = 6


def _q231_oracle_sql() -> str:
    k = _Q231_SNAPS
    return f"""
    WITH ref AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS rn
      FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    ), rt AS (SELECT CAST(SUM(rn) AS BIGINT) AS rr FROM ref
    ), policy AS (
      SELECT lang, CAST(ROUND(1000000.0 * rn / rr) AS BIGINT) AS policy_ppm
      FROM ref, rt
    ), folded AS (
      SELECT doc_id % {k} AS snapshot, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2
    ), tot AS (
      SELECT snapshot, CAST(SUM(n) AS BIGINT) AS nn
      FROM folded GROUP BY 1
    )
    SELECT t.snapshot, p.lang,
           COALESCE(f.n, 0) AS n,
           CAST(ROUND(1000000.0 * COALESCE(f.n, 0) / t.nn) AS BIGINT)
             AS share_ppm,
           p.policy_ppm,
           CAST(ROUND(1000000.0 * COALESCE(f.n, 0) / t.nn) AS BIGINT)
             - p.policy_ppm AS dev_ppm
    FROM tot t CROSS JOIN policy p
    LEFT JOIN folded f ON f.snapshot = t.snapshot AND f.lang = p.lang
    """


@_register(
    "q231_stream_mixture_monitor",
    oracle=_q231_oracle_sql(),
    tags=("streaming", "mixture", "monitor", "drift", "fold",
          "portable"),
)
def q231_stream_mixture_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.sources.readers import (
        read_parquet_stream,
    )
    from us_immigration_data_lake_spark.streaming.drift import (
        stream_mixture_by_snapshot,
    )

    _tune(spark)
    ref = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    per = ref.groupBy(F.col("lang").alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("rn")
    )
    total = per.agg(F.sum("rn").cast("long").alias("rr"))
    policy = per.crossJoin(F.broadcast(total)).select(
        "group",
        F.round(F.lit(1_000_000.0) * F.col("rn") / F.col("rr"))
        .cast("long").alias("policy_ppm"),
    )
    stream = (
        read_parquet_stream(spark, f"{sf_dir.rstrip('/')}/documents*.parquet")
        .filter(F.col("doc_id") % 2 == 1)
        .withColumn("snapshot", F.pmod(F.col("doc_id"), F.lit(_Q231_SNAPS)))
    )
    return stream_mixture_by_snapshot(
        stream, policy, "snapshot", "lang",
        sink_name=_sink_name("q231_mix"),
    )


# ---------------------------------------------------------------------------
# Q232 — incremental per-source cap (operators/sampling.py:
# update_capped_corpus, new r11): q226 for a LIVING corpus — the
# q200-family increment discipline applied to the count-based cap.
# Existing kept rows are IMMUTABLE (a batch re-rank could evict docs
# that shards/orders already reference); the new batch is admitted
# per source only into the remaining slots, by the same hash order.
# Base = q226's cap over the EVEN docs; increment = the ODD docs.
# Oracle replays base cap → slots → new-batch rank → admission.
# ---------------------------------------------------------------------------

_Q232_CAP = 20


@_register(
    "q232_incremental_cap",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY ('0x' || substr(md5(source || '|'
                             || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                          doc_id) AS rn
        FROM documents WHERE doc_id % 2 = 0
      ) WHERE rn <= {_Q232_CAP}
    ), slots AS (
      SELECT source,
             GREATEST(0, {_Q232_CAP} - CAST(COUNT(*) AS BIGINT)) AS s
      FROM kept GROUP BY source
    ), ranked_new AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(source || '|'
                           || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id) AS rn
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT doc_id, source, 'kept' AS status FROM kept
    UNION ALL
    SELECT r.doc_id, r.source, 'admitted' AS status
    FROM ranked_new r LEFT JOIN slots sl USING (source)
    WHERE r.rn <= COALESCE(sl.s, {_Q232_CAP})
    """,
    tags=("sampling", "cap", "incremental", "group-limit", "portable"),
)
def q232_incremental_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        per_group_cap,
        update_capped_corpus,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = per_group_cap(
        docs.filter(F.col("doc_id") % 2 == 0), "source", "doc_id",
        cap=_Q232_CAP,
    ).select("doc_id", "source")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return update_capped_corpus(base, new, "source", "doc_id", cap=_Q232_CAP)


# ---------------------------------------------------------------------------
# Q233 — INDEXED hard-negative mining (operators/similarity.py:
# hard_negatives_indexed, new r12 — the r11 verdict's named scale path
# for q230): candidates come from the SRP-LSH index (own bucket + all
# Hamming-1 probes, srp_lsh_knn's generation) instead of q230's
# all-pairs cross join, and the exclusion cluster frame comes from the
# bucket-bounded pair graph (srp_bucket_near_dup_pairs → connected
# components) instead of the exact one — i.e. every stage is the plan
# a 100 TB corpus actually runs: one signature projection, equi-joins
# on the bucket key, pair volume Σ|bucket|² not |corpus|², NO
# CartesianProduct (not lint-exempt, unlike q230). Exclusion and
# ranking semantics replicate q230 verbatim (cluster-transitive,
# cosine DESC / neighbor_id ASC); where the probes recall the true
# top-k the two emit identical rows (tests/test_llm_ops.py slice
# agreement). Oracle: hash-for-hash SRP replay (plane literals at
# full precision, q221's idiom) + q230's recursive-reachability
# clustering over the BUCKET-bounded pair graph + multiprobe unnest.
# ---------------------------------------------------------------------------

_Q233_K, _Q233_BITS, _Q233_THR = 5, 6, 0.35


def _q233_oracle_sql() -> str:
    planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q233_BITS, seed=42)

    def dot_expr(i: int) -> str:
        return " + ".join(
            f"v[{j + 1}]*({float(planes[i][j])!r})" for j in range(EMBEDDING_DIM)
        )

    bits = " + ".join(
        f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_Q233_BITS)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(_Q233_BITS)]
    )
    k, thr = _Q233_K, _Q233_THR
    return f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS MATERIALIZED (
      SELECT vec_id, v, CAST({bits} AS BIGINT) AS bucket FROM base
    ), pairs AS MATERIALIZED (
      SELECT x.vec_id AS id1, y.vec_id AS id2
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {thr}
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    ), cl AS MATERIALIZED (
      SELECT b.vec_id, b.v, b.bucket,
             COALESCE(l.cluster, b.vec_id) AS cluster
      FROM b LEFT JOIN labels l ON b.vec_id = l.id
    ), probed AS (
      SELECT vec_id AS query_id, v AS qv, cluster AS q_cluster,
             unnest(list_value({probes})) AS bucket
      FROM cl
    ), scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.qv, c.v), 6) AS cosine_sim
      FROM probed p JOIN cl c USING (bucket)
      WHERE p.query_id <> c.vec_id AND p.q_cluster <> c.cluster
    )
    SELECT query_id, neighbor_id, cosine_sim, rn AS neg_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


@_register(
    "q233_hard_negatives_indexed",
    oracle=_q233_oracle_sql(),
    tags=("similarity", "contrastive", "hard-negatives", "ann", "lsh",
          "mining", "clustering", "portable"),
    bench=True,  # q230's scale twin: the bench prices index vs all-pairs
)
def q233_hard_negatives_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    pairs = sim_ops.srp_bucket_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=_Q233_THR,
        dim=EMBEDDING_DIM, num_bits=_Q233_BITS, seed=42,
    )
    clusters = dedup_ops.dedup_survivors(
        emb, pairs.select("id1", "id2"), "vec_id"
    ).select("vec_id", "cluster")
    return sim_ops.hard_negatives_indexed(
        emb, "vec_id", "embedding", clusters, k=_Q233_K,
        dim=EMBEDDING_DIM, num_bits=_Q233_BITS, seed=42, multiprobe=True,
    )


# ---------------------------------------------------------------------------
# Q234 — training-order pipeline END-TO-END (operators/sampling.py:
# training_order_pipeline, new r12 — the r11 verdict's ask #5): the
# reading order a training run actually executes, as ONE query instead
# of separately-verified pieces — q226's per-source cap → q220's
# temperature policy RECOMPUTED ON THE CAPPED CORPUS (pre-cap totals
# would re-inflate the capped source) → q227's fixed-axis quality bins
# (q17's score) → q228's WFQ interleave WITHIN each bin (stage_col),
# global order (bin, v_time, source, id). Stage boundaries are pinned
# by tests (|output| = |capped|, per-bin conservation); the oracle
# replays the full four-stage chain. Plan: four exchanges end-to-end
# (cap hash, (bin, source) position hash, K-row policy broadcast,
# two-phase range exchange) — no global sort, nothing corpus-sized on
# one partition.
# ---------------------------------------------------------------------------

_Q234_CAP, _Q234_BINS, _Q234_EPOCH, _Q234_ALPHA = 18, 4, 1, 0.3


def _training_order_oracle_prefix(cap: int, nb: int, a: float) -> str:
    """Epoch-invariant CTE chain of the training-order oracle
    (tok -> features -> score -> cap -> temperature policy), shared
    verbatim by q234 (one epoch) and q237 (multi-epoch)."""
    return f"""WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ), feat AS (
      SELECT doc_id, source,
             CAST(array_length(toks) AS BIGINT) AS n_tokens,
             CAST(array_length(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks, t -> list_contains(['the','a','and','of','to','is','in','it'], t))) AS BIGINT) AS n_stop,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len
      FROM tok
    ), scored AS (
      SELECT doc_id, source, n_tokens,
             CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE ROUND(
               0.4 * (n_distinct / CAST(n_tokens AS DOUBLE))
               + 0.2 * LEAST((n_stop / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0)
               + 0.2 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
               + 0.2 * LEAST((sum_len / CAST(n_tokens AS DOUBLE)) / 8.0, 1.0)
             , 6) END AS quality_score
      FROM feat
    ), capped AS (
      SELECT doc_id, source, n_tokens, quality_score FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY source
          ORDER BY ('0x' || substr(md5(source || '|'
                      || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                   doc_id) AS rn
        FROM scored
      ) WHERE rn <= {cap}
    ), per AS (
      SELECT source AS "group", CAST(SUM(n_tokens) AS BIGINT) AS n
      FROM capped GROUP BY 1 HAVING SUM(n_tokens) > 0
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM per
    ), wgt AS (
      SELECT p."group",
             CAST(ROUND(1000000.0 * POW(p.n * 1.0 / t.nn, {a})) AS BIGINT)
               AS w_micro
      FROM per p, tot t
    ), ws AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS ww FROM wgt
    ), w AS (
      SELECT g."group",
             CAST(ROUND(1000000.0 * g.w_micro / s.ww) AS BIGINT) AS q_ppm
      FROM wgt g, ws s
    )"""


def _training_order_oracle_epoch_block(nb: int, ep: int, suffix: str) -> str:
    """One epoch's keyed/pos/vt CTEs, names suffixed so q237 can
    instantiate several; the fold/ordering text is q234's verbatim."""
    keyed, pos, vt = f"keyed{suffix}", f"pos{suffix}", f"vt{suffix}"
    return f""", {keyed} AS (
      SELECT doc_id, source,
             LEAST(GREATEST(CAST(FLOOR(quality_score / (1.0 / {nb}))
                                 AS BIGINT), 0), {nb - 1}) AS quality_bin,
             ('0x' || substr(md5('{ep}|' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT AS k
      FROM capped
    ), {pos} AS (
      SELECT doc_id, source, quality_bin,
             CAST(ROW_NUMBER() OVER (PARTITION BY quality_bin, source
                                     ORDER BY k, doc_id) AS BIGINT) AS pos
      FROM {keyed}
    ), {vt} AS (
      SELECT p.doc_id, p.source, p.quality_bin, p.pos,
             p.pos * CAST(ROUND(1000000000000.0 / w.q_ppm) AS BIGINT)
               AS v_time
      FROM {pos} p JOIN w ON p.source = w."group"
      WHERE w.q_ppm > 0
    )"""


def _q234_oracle_sql() -> str:
    cap, nb, ep, a = _Q234_CAP, _Q234_BINS, _Q234_EPOCH, _Q234_ALPHA
    return f"""
    {_training_order_oracle_prefix(cap, nb, a)}
    {_training_order_oracle_epoch_block(nb, ep, "")}
    SELECT doc_id, source, quality_bin, pos, v_time,
           CAST(ROW_NUMBER() OVER (ORDER BY quality_bin, v_time, source,
                                   doc_id) AS BIGINT) AS global_pos
    FROM vt
    """


@_register(
    "q234_training_order_pipeline",
    oracle=_q234_oracle_sql(),
    tags=("sampling", "pipeline", "cap", "curriculum", "mixture",
          "wfq", "training-order", "portable"),
    bench=True,  # the end-to-end composite prices the composition
)
def q234_training_order_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        training_order_pipeline,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(ts_ops.text_features(docs, "doc_id", "text"))
    base = scored.select("doc_id", "n_tokens", "quality_score").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return training_order_pipeline(
        base, "doc_id", "source", "quality_score", "n_tokens",
        cap=_Q234_CAP, alpha=_Q234_ALPHA, n_bins=_Q234_BINS,
        epoch=_Q234_EPOCH,
    )


# ---------------------------------------------------------------------------
# Q235 — LINE-level repetition signals (operators/textstats.py:
# line_repetition_stats, new r12): the Gopher/MassiveText
# duplicate-LINE rules (Rae et al. 2021 §A1.1, public) — dup-line
# fraction AND dup-line character fraction, the boilerplate/template
# filters real corpus pipelines threshold (q60 covers the
# token/bigram axis of the same ruleset; one long repeated line can
# dominate chars while barely moving the line count, hence both).
# Per-row array arithmetic end to end (line split, distinct, two
# length folds) — zero exchanges in the plan. Oracle replays the line
# pipeline with list_transform/list_filter/list_distinct + list
# length-sums.
# ---------------------------------------------------------------------------


@_register(
    "q235_line_repetition_stats",
    oracle="""
    WITH ml AS (
      -- the fixture's texts are single-line; synthesize a
      -- deterministic multi-line corpus (doc_id mod 3: dup line +
      -- prefix line, CRLF-terminated / distinct prefix line, LF /
      -- unchanged) so the gate exercises REAL duplicate-line
      -- structure AND the CRLF-tolerant split (r12 advice: a bare-LF
      -- split leaves a trailing CR on every CRLF line and zeroes both
      -- signals), identically on both engines
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN concat_ws(chr(13) || chr(10), text, text,
                                     substr(text, 1, 50))
               WHEN 1 THEN concat_ws(chr(10), text, substr(text, 1, 50))
               ELSE text END AS text
      FROM documents
    ), l AS (
      SELECT doc_id,
             list_filter(list_transform(
                         string_split_regex(COALESCE(text, ''),
                                            '\\r?\\n'),
                         x -> trim(x)), x -> x <> '') AS lines
      FROM ml
    ), m AS (
      SELECT doc_id, lines, list_distinct(lines) AS dlines,
             CAST(COALESCE(list_sum(list_transform(lines,
                                                   x -> length(x))), 0)
                  AS BIGINT) AS n_chars,
             CAST(COALESCE(list_sum(list_transform(list_distinct(lines),
                                                   x -> length(x))), 0)
                  AS BIGINT) AS n_dchars
      FROM l
    )
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(dlines) AS BIGINT) AS n_dup_lines,
           CASE WHEN len(lines) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND((len(lines) - len(dlines)) * 1.0 / len(lines), 6)
                END AS dup_line_frac,
           n_chars AS n_line_chars,
           n_chars - n_dchars AS n_dup_line_chars,
           CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND((n_chars - n_dchars) * 1.0 / n_chars, 6)
                END AS dup_line_char_frac
    FROM m
    """,
    tags=("textstats", "quality", "repetition", "gopher", "portable"),
)
def q235_line_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    # deterministic multi-line synthesis (see oracle comment): the
    # fixture's texts are single-line, which would gate the operator
    # on degenerate input
    ml = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            # CRLF-terminated branch: proves the \r?\n split (a bare-\n
            # split would leave '\r' on each line and zero the signals)
            F.concat_ws("\r\n", F.col("text"), F.col("text"),
                        F.substring("text", 1, 50)),
        ).when(
            F.col("doc_id") % 3 == 1,
            F.concat_ws("\n", F.col("text"), F.substring("text", 1, 50)),
        ).otherwise(F.col("text")).alias("text"),
    )
    return ts_ops.line_repetition_stats(ml, "doc_id", "text")


# ---------------------------------------------------------------------------
# Q236 — hard-negative RECALL calibration (operators/similarity.py:
# hard_negative_recall, new r13 — the r12 verdict's ask #3: q233's
# speed axis had no quality axis). Per (num_bits, multiprobe) config,
# the micro-averaged share of the true top-k hard negatives (q230's
# all-pairs, cluster-excluded ground truth) that the SRP-indexed
# miner recovers — BOTH sides sharing the exact pair graph's
# exclusion clusters, so the measured gap isolates candidate-
# generation coverage, the knob the bits-growth rule
# (recommended_num_bits) trades against speed. Oracle: q230's
# recursive-reachability exact replay + one q233-idiom indexed replay
# per config (plane literals at full precision, multiprobe unnest),
# joined and aggregated. SCALE.md r13 pairs these recalls with the
# q233 speed ladder at bits 6/8/10.
# ---------------------------------------------------------------------------

_Q236_N, _Q236_K, _Q236_THR = 150, 5, 0.35
_Q236_CONFIGS = ((2, False), (2, True), (4, True), (6, True))


def _hn_recall_oracle_parts(
    configs: tuple[tuple[int, bool], ...],
) -> tuple[str, str]:
    """(WITH-prefix, per-config UNION body) of the hard-negative-recall
    ladder replay — shared by q236 (the ladder verbatim) and q238 (the
    ladder + the deployment-rule selection)."""
    n, k, thr = _Q236_N, _Q236_K, _Q236_THR

    def config_ctes(bits: int, mp: bool) -> tuple[str, str]:
        planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=bits, seed=42)

        def dot_expr(i: int) -> str:
            return " + ".join(
                f"v[{j + 1}]*({float(planes[i][j])!r})"
                for j in range(EMBEDDING_DIM)
            )

        sig = " + ".join(
            f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(bits)
        )
        probes = ", ".join(
            ["bucket"]
            + ([f"xor(bucket, {1 << i})" for i in range(bits)] if mp else [])
        )
        tag = f"{bits}_{int(mp)}"
        cte = f"""b_{tag} AS MATERIALIZED (
      SELECT vec_id, v, cluster, CAST({sig} AS BIGINT) AS bucket FROM cl
    ), probed_{tag} AS (
      SELECT vec_id AS query_id, v AS qv, cluster AS q_cluster,
             unnest(list_value({probes})) AS bucket
      FROM b_{tag}
    ), idx_{tag} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id, ROW_NUMBER() OVER (
          PARTITION BY s.query_id
          ORDER BY s.cosine_sim DESC, s.neighbor_id) AS rn
        FROM (
          SELECT p.query_id, c.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(p.qv, c.v), 6) AS cosine_sim
          FROM probed_{tag} p JOIN b_{tag} c USING (bucket)
          WHERE p.query_id <> c.vec_id AND p.q_cluster <> c.cluster
        ) s
      ) WHERE rn <= {k}
    )"""
        stat = f"""SELECT CAST({bits} AS BIGINT) AS num_bits,
             CAST({int(mp)} AS BIGINT) AS multiprobe,
             CAST(COUNT(DISTINCT e.query_id) AS BIGINT) AS n_queries,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(COALESCE(SUM(CASE WHEN i.query_id IS NOT NULL
                                    THEN 1 END), 0) AS BIGINT) AS hits,
             ROUND(COALESCE(SUM(CASE WHEN i.query_id IS NOT NULL
                                     THEN 1 END), 0) * 1.0
                   / COUNT(*), 6) AS recall
      FROM exact e LEFT JOIN idx_{tag} i
        ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id"""
        return cte, stat

    ctes, stats = [], []
    for bits, mp in configs:
        cte, stat = config_ctes(bits, mp)
        ctes.append(cte)
        stats.append(stat)
    all_ctes = ",\n    ".join(ctes)
    union = "\n      UNION ALL\n      ".join(f"({s})" for s in stats)
    prefix = f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < {n}
    ), pairs AS MATERIALIZED (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM base a JOIN base b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {thr}
    ), edges AS MATERIALIZED (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ), labels AS MATERIALIZED (
      SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
      FROM reach GROUP BY src
    ), cl AS MATERIALIZED (
      SELECT b.vec_id, b.v, COALESCE(l.cluster, b.vec_id) AS cluster
      FROM base b LEFT JOIN labels l ON b.vec_id = l.id
    ), exact AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id, ROW_NUMBER() OVER (
          PARTITION BY s.query_id
          ORDER BY s.cosine_sim DESC, s.neighbor_id) AS rn
        FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine_sim
          FROM cl q JOIN cl c
            ON q.vec_id <> c.vec_id AND q.cluster <> c.cluster
        ) s
      ) WHERE rn <= {k}
    ),
    {all_ctes}"""
    return prefix, union


def _q236_oracle_sql() -> str:
    prefix, union = _hn_recall_oracle_parts(_Q236_CONFIGS)
    return f"""
    {prefix}
    SELECT * FROM (
      {union}
    ) ORDER BY num_bits, multiprobe
    """


@_register(
    "q236_hard_negative_recall",
    oracle=_q236_oracle_sql(),
    tags=("similarity", "contrastive", "hard-negatives", "recall",
          "calibration", "lsh", "portable"),
)
def q236_hard_negative_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _Q236_N)
    return sim_ops.hard_negative_recall(
        emb, "vec_id", "embedding", k=_Q236_K, dim=EMBEDDING_DIM,
        dup_threshold=_Q236_THR, configs=_Q236_CONFIGS, seed=42,
    )


# ---------------------------------------------------------------------------
# Q237 — MULTI-EPOCH training order (operators/sampling.py:
# training_order_epochs, new r13 — the r12 verdict's ask #5): real
# training runs consume E epochs of q234's order, each epoch a fresh
# epoch-keyed within-(bin, source) permutation (md5('e|id'), q224's
# contract) while the curriculum and the mixture shares stay
# identical across epochs by construction. The epoch-invariant prefix
# (cap → policy-on-capped → bins) runs ONCE (eager checkpoint) and
# feeds every epoch's interleave; pos/v_time/global_pos restart per
# epoch, so resume-mid-run is the (epoch, global_pos) filter. Oracle:
# q234's verbatim CTE chain + one epoch block per epoch, UNION ALL
# with the epoch literal.
# ---------------------------------------------------------------------------

_Q237_EPOCHS = 2


def _q237_oracle_sql() -> str:
    cap, nb, a = _Q234_CAP, _Q234_BINS, _Q234_ALPHA
    blocks = "".join(
        _training_order_oracle_epoch_block(nb, e, f"_e{e}")
        for e in range(_Q237_EPOCHS)
    )
    selects = "\n      UNION ALL\n      ".join(
        f"""(SELECT CAST({e} AS BIGINT) AS epoch, doc_id, source,
             quality_bin, pos, v_time,
             CAST(ROW_NUMBER() OVER (ORDER BY quality_bin, v_time,
                                     source, doc_id) AS BIGINT)
               AS global_pos
      FROM vt_e{e})"""
        for e in range(_Q237_EPOCHS)
    )
    return f"""
    {_training_order_oracle_prefix(cap, nb, a)}
    {blocks}
    SELECT * FROM (
      {selects}
    )
    """


@_register(
    "q237_training_order_epochs",
    oracle=_q237_oracle_sql(),
    tags=("sampling", "order", "mixture", "curriculum", "epochs",
          "training", "portable"),
    bench=True,  # prices the multi-epoch composition vs q234's single
)
def q237_training_order_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from us_immigration_data_lake_spark.operators.sampling import (
        training_order_epochs,
    )

    _tune(spark)
    docs = _t(spark, sf_dir, "documents")
    scored = ts_ops.quality_score(ts_ops.text_features(docs, "doc_id", "text"))
    base = scored.select("doc_id", "n_tokens", "quality_score").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return training_order_epochs(
        base, "doc_id", "source", "quality_score", "n_tokens",
        cap=_Q234_CAP, alpha=_Q234_ALPHA, epochs=_Q237_EPOCHS,
        n_bins=_Q234_BINS,
    )


# ---------------------------------------------------------------------------
# Q238 — SRP config CHOSEN by recall target (operators/similarity.py:
# choose_srp_config, new r14): the q236 deployment rule as code —
# re-run the recall ladder, mark the CHEAPEST config whose negative
# recall clears the target (cost order = the SCALE.md r14 measured
# one: higher bits cheaper, single-probe cheaper at equal bits), or,
# if none clears, the best-recall config so the caller still gets a
# deterministic pick plus the visible miss. met_target is exact
# BIGINT arithmetic (hits·1000 ≥ target·n_exact) on both sides; the
# oracle is q236's ladder replay verbatim + one selection CTE (max
# cost key among meeting configs, hits-then-cost fallback).
# ---------------------------------------------------------------------------

_Q238_TARGET_PERMILLE = 80


def _q238_oracle_sql() -> str:
    prefix, union = _hn_recall_oracle_parts(_Q236_CONFIGS)
    t = _Q238_TARGET_PERMILLE
    return f"""
    {prefix},
    ladder AS (
      SELECT * FROM (
        {union}
      )
    ), ranked AS (
      SELECT *, CAST(2 * num_bits + (1 - multiprobe) AS BIGINT) AS ck,
             (hits * 1000 >= {t} * n_exact) AS met_target
      FROM ladder
    ), pick AS (
      SELECT COALESCE(
               MAX(CASE WHEN met_target THEN ck END),
               (SELECT ck FROM ranked ORDER BY hits DESC, ck DESC LIMIT 1)
             ) AS ck
      FROM ranked
    )
    SELECT num_bits, multiprobe, n_queries, n_exact, hits, recall,
           met_target, (ranked.ck = pick.ck) AS chosen
    FROM ranked, pick
    ORDER BY num_bits, multiprobe
    """


@_register(
    "q238_srp_config_choice",
    oracle=_q238_oracle_sql(),
    tags=("similarity", "hard-negatives", "recall", "calibration",
          "lsh", "deployment-rule", "portable"),
)
def q238_srp_config_choice(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _Q236_N)
    return sim_ops.choose_srp_config(
        emb, "vec_id", "embedding", k=_Q236_K, dim=EMBEDDING_DIM,
        dup_threshold=_Q236_THR, target_recall_permille=_Q238_TARGET_PERMILLE,
        configs=_Q236_CONFIGS, seed=42,
    )


# ---------------------------------------------------------------------------
# Q239 — MULTI-TABLE SRP near-dup pairs (operators/similarity.py:
# srp_multi_table_frames, new r14): the MinHash-banding analog for
# embeddings that the scale notes recommended as prose ("run wider
# signatures or multiple independent tables"), as an operator. L
# independent hyperplane tables (table t seeded seed+t; table 0 IS
# the single-table bucketing — a pinned compat theorem), candidates
# share a bucket in ANY table (band machinery verbatim: band_idx =
# table), exact cosine verifies; per-pair recall 1−(1−p^b)^L vs p^b
# single-table. Registry instance runs UNCAPPED (bucket cap far above
# any fixture bucket) so the oracle is the clean per-table signature
# replay + OR-union distinct + cosine verify; cap semantics on this
# machinery are q182/q187's already-gated surface.
# ---------------------------------------------------------------------------

_Q239_BITS, _Q239_TABLES = 4, 3


def _q239_oracle_sql() -> str:
    def table_bits(t: int) -> str:
        planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q239_BITS,
                                    seed=42 + t)

        def dot_expr(i: int) -> str:
            return " + ".join(
                f"v[{j + 1}]*({float(planes[i][j])!r})"
                for j in range(EMBEDDING_DIM)
            )

        return " + ".join(
            f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(_Q239_BITS)
        )

    bucket_cols = ", ".join(
        f"CAST({table_bits(t)} AS BIGINT) AS b{t}"
        for t in range(_Q239_TABLES)
    )
    any_shared = " OR ".join(
        f"x.b{t} = y.b{t}" for t in range(_Q239_TABLES)
    )
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS MATERIALIZED (
      SELECT vec_id, v, {bucket_cols} FROM base
    ), cand AS MATERIALIZED (
      SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
      FROM b x JOIN b y
        ON x.vec_id < y.vec_id AND ({any_shared})
    )
    SELECT c.id1, c.id2,
           ROUND(list_cosine_similarity(x.v, y.v), 6) AS cosine_sim
    FROM cand c
    JOIN b x ON c.id1 = x.vec_id
    JOIN b y ON c.id2 = y.vec_id
    WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {_Q181_TAU}
    """


@_register(
    "q239_srp_multi_table_pairs",
    oracle=_q239_oracle_sql(),
    tags=("similarity", "dedup", "semdedup", "lsh", "banding",
          "multi-table", "portable"),
)
def q239_srp_multi_table_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return sim_ops.srp_multi_table_pairs(
        emb, "vec_id", "embedding", threshold=_Q181_TAU,
        dim=EMBEDDING_DIM, num_bits=_Q239_BITS,
        num_tables=_Q239_TABLES, seed=42, max_bucket_size=1_000_000,
    )


# ---------------------------------------------------------------------------
# Q240 — CROSS-corpus multi-table semantic dedup (operators/
# similarity.py:srp_multi_table_ref_index_frames +
# cross_srp_multi_table_pairs_indexed, new r14): q192's incremental-
# ingest shape with q239's recall lever — the reference corpus is
# indexed under L independent plane tables, a new-batch row recovers
# a near-dup on a collision in ANY table (1−(1−p^b)^L per pair), a
# multi-collision pair is emitted once (deterministic dropDuplicates
# on the verified pair). Registry instance runs UNCAPPED (the
# per-(table,bucket) cap machinery is q190/q192's already-gated
# surface) so the oracle is the clean OR-union replay: per-table
# signature CASE sums, DISTINCT candidates across tables, cosine
# verify. L=1 ≡ cross_srp_pairs_indexed is a pinned test theorem.
# ---------------------------------------------------------------------------


def _q240_oracle_sql() -> str:
    def table_bits(t: int) -> str:
        planes = sim_ops.srp_planes(EMBEDDING_DIM, num_bits=_Q239_BITS,
                                    seed=42 + t)

        def dot_expr(i: int) -> str:
            return " + ".join(
                f"v[{j + 1}]*({float(planes[i][j])!r})"
                for j in range(EMBEDDING_DIM)
            )

        return " + ".join(
            f"(CASE WHEN ({dot_expr(i)}) > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(_Q239_BITS)
        )

    bucket_cols = ", ".join(
        f"CAST({table_bits(t)} AS BIGINT) AS b{t}"
        for t in range(_Q239_TABLES)
    )
    any_shared = " OR ".join(
        f"n.b{t} = r.b{t}" for t in range(_Q239_TABLES)
    )
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS MATERIALIZED (
      SELECT vec_id, v, {bucket_cols} FROM base
    ), cand AS MATERIALIZED (
      SELECT DISTINCT n.vec_id AS id_new, r.vec_id AS id_ref
      FROM b n JOIN b r ON ({any_shared})
      WHERE n.vec_id % 2 = 1 AND r.vec_id % 2 = 0
    )
    SELECT c.id_new, c.id_ref,
           ROUND(list_cosine_similarity(x.v, y.v), 6) AS cosine_sim
    FROM cand c
    JOIN b x ON c.id_new = x.vec_id
    JOIN b y ON c.id_ref = y.vec_id
    WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {_Q181_TAU}
    """


@_register(
    "q240_cross_multi_table_dedup",
    oracle=_q240_oracle_sql(),
    tags=("similarity", "dedup", "semdedup", "cross-corpus", "lsh",
          "banding", "multi-table", "portable"),
)
def q240_cross_multi_table_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    emb = _t(spark, sf_dir, "embeddings")
    new_df = emb.filter(F.col("vec_id") % 2 == 1)
    ref_df = emb.filter(F.col("vec_id") % 2 == 0)
    frames = sim_ops.srp_multi_table_ref_index_frames(
        ref_df, "vec_id", "embedding", dim=EMBEDDING_DIM,
        num_bits=_Q239_BITS, num_tables=_Q239_TABLES, seed=42,
        max_bucket_size=1_000_000,
    )
    return sim_ops.cross_srp_multi_table_pairs_indexed(
        new_df, frames["index"], "vec_id", "embedding",
        threshold=_Q181_TAU, dim=EMBEDDING_DIM,
        num_bits=frames["num_bits"], num_tables=frames["num_tables"],
        seed=42,
    )
