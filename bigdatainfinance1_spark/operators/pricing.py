"""Flagship query: TPC-H-Q1-shaped pricing summary (SURVEY.md §7 M0).

Scan → filter (pushed to parquet) → hash group-by with 8 aggregates → sort.
Everything stays inside whole-stage codegen; the only shuffle is the group-by
exchange on (l_returnflag, l_linestatus) — 6 groups, so the partial (map-side)
aggregation reduces ~all rows before the exchange. This shape scales linearly:
at 100 TB the scan dominates and the shuffle stays tiny.

Float policy: money is double (FIXTURES.md); sums are rounded to 2 decimals
and averages to 4 in BOTH the Spark plan and the oracle SQL so that the
driver's value-hash is insensitive to summation order (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

CUTOFF = "1998-09-02 00:00:00"


@query(
    "q_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) / 100e0, 2)                                   AS sum_base_price,
      round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100e0, 2)                AS sum_disc_price,
      round(sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) AS BIGINT)) / 100e0, 2)  AS sum_charge,
      round(avg(l_quantity), 4)                                        AS avg_qty,
      round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
            / count(*) / 100, 4)                                       AS avg_price,
      round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
            / count(*) / 100, 4)                                       AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+P1+F2: multi-aggregate pricing summary over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(F.round(disc_price * 100).cast("long")) / 100.0, 2).alias(
                "sum_disc_price"
            ),
            F.round(F.sum(F.round(charge * 100).cast("long")) / 100.0, 2).alias(
                "sum_charge"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            # integer-moments rule: price/discount are exact 2-dp — means
            # sum exact cents (quantity is integer-valued, already exact)
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                / 100,
                4,
            ).alias("avg_price"),
            F.round(
                F.sum(F.round(F.col("l_discount") * 100).cast("long")).cast("double")
                / F.count(F.lit(1))
                / 100,
                4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRIORITY_CUTOFF = "1997-06-15 00:00:00"


@query(
    "q_shipping_priority",
    oracle=f"""
    SELECT
      l_orderkey,
      round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100e0, 2) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{PRIORITY_CUTOFF}'
      AND l_shipdate  > TIMESTAMP '{PRIORITY_CUTOFF}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("agg", "join", "finance"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping priority: top-10 unshipped BUILDING-segment
    orders by open revenue. The selective segment filter prunes customer
    BEFORE the join (predicate pushdown to the parquet scan), the pruned
    customer side broadcasts, and the date filters cut both fact inputs at
    scan time — so the only large shuffle is the final group-by on
    l_orderkey. LIMIT uses l_orderkey as a total-order tiebreak (SURVEY.md
    §5 O2 rule) so top-10 is deterministic on both engines."""
    cutoff = F.lit(PRIORITY_CUTOFF).cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100).cast("long")) / 100.0, 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )
