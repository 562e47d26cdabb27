"""Projection / filter / distinct / null-handling / sort-limit / set ops
(SURVEY.md §2.2, §2.6).

Scale notes: all of these are narrow transformations or single-shuffle ops.
Filters and projections compile to parquet pushdown + column pruning (verified
in tests/test_plans.py); `distinct` and the set ops shuffle on the full row —
at 100 TB you'd pre-aggregate or use approx variants first, which is why the
distinct queries here project to low-cardinality columns before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table


@query(
    "q_projection_compute",
    oracle="""
    SELECT
      l_orderkey                                            AS order_key,
      l_linenumber                                          AS line_no,
      l_extendedprice * (1 - l_discount)                    AS revenue,
      l_extendedprice * (1 - l_discount) * (1 + l_tax)      AS charge
    FROM lineitem
    """,
    tags=("projection",),
)
def projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: projection + rename + computed columns. Per-row IEEE double
    arithmetic is deterministic, so no rounding is needed (only aggregates
    have summation-order sensitivity)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "q_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
    """,
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: IN / BETWEEN / range predicates, all pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "q_case_when_tiers",
    oracle="""
    SELECT
      CASE WHEN o_totalprice < 50000 THEN 'small'
           WHEN o_totalprice < 150000 THEN 'medium'
           ELSE 'large' END                                 AS tier,
      o_orderstatus,
      count(*)                                              AS n_orders,
      round(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) / 100e0, 2)                           AS total
    FROM orders
    GROUP BY tier, o_orderstatus
    """,
    tags=("filter", "agg"),
)
def case_when_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: CASE WHEN bucketing (order-value tiers) + aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        orders.withColumn("tier", tier)
        .groupBy("tier", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 2).alias("total"),
        )
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (exact tier): project to low-cardinality columns BEFORE the
    distinct shuffle — at scale, never distinct the full row."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
    FROM lineitem
    QUALIFY row_number() OVER (
      PARTITION BY l_orderkey
      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
    ) = 1
    """,
    tags=("distinct", "window"),
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: keep-first-per-key dedup via ranked window (the scalable idiom:
    one shuffle on the key, no driver-side state)."""
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in this data — the ordering
    # must be total or "first" is nondeterministic across engines.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT
      count(*)                                                       AS n_rows,
      count(nullif(l_discount, 0.0))                                 AS n_nonzero_disc,
      count(*) - count(nullif(l_discount, 0.0))                      AS n_zero_disc,
      round(sum(coalesce(nullif(l_discount, 0.0), -1.0)), 4)         AS filled_sum
    FROM lineitem
    """,
    tags=("null",),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: nullif / coalesce / null-aware counts (the source tables have no
    nulls, so nulls are manufactured with nullif)."""
    li = load_table(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nz).alias("n_nonzero_disc"),
        (F.count(F.lit(1)) - F.count(nz)).alias("n_zero_disc"),
        F.round(F.sum(F.coalesce(nz, F.lit(-1.0))), 4).alias("filled_sum"),
    )


@query("q_sample_profile", oracle=None, tags=("sample",))
def sample_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: seeded Bernoulli sample for profiling (rows-only: sampling is
    engine-specific, no cross-engine oracle). At 100 TB this is how you
    estimate distributions without a full pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.avg("l_quantity"), 2).alias("approx_avg_qty"),
    )


@query(
    "q_top_revenue_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: global top-k with a unique tiebreak key (o_orderkey) so LIMIT
    is deterministic across engines. Spark executes this as TakeOrderedAndProject
    — no global sort materialization."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, 'customer' AS kind, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
    """,
    tags=("setop",),
)
def union_all_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: UNION ALL of schema-aligned projections (unionByName — never
    positional union, which silently miswires columns)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return cust.unionByName(supp)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: UNION (distinct) — dedup happens after the union shuffle."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@query(
    "q_intersect_custs",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    tags=("setop",),
)
def intersect_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: INTERSECT — customers who ordered in both 1995 and 1996."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    return y95.intersect(y96)


@query(
    "q_except_custs",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop",),
)
def except_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: EXCEPT — customers with no pending ('P') orders."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    pend = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.subtract(pend)


_ABOVE_BRAND_AVG_SQL = """
    SELECT p_brand, p_partkey, p_retailprice
    FROM part p
    WHERE p_retailprice > 1.01 * (
      SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
"""


@query("q_subquery_above_brand_avg", oracle=_ABOVE_BRAND_AVG_SQL, tags=("subquery", "sql"))
def subquery_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: parts priced >1% above their brand's
    average. One SQL text runs verbatim on Spark AND DuckDB; Catalyst
    decorrelates the subquery into an aggregate + join
    (RewriteCorrelatedScalarSubquery), so the physical plan is one
    brand-keyed aggregation broadcast back onto the scan — no per-row
    subquery execution at any scale. The 1% threshold (was 5%) keeps the
    result non-vacuous at EVERY test scale factor on the round-3
    regenerated data — at sf0.001 the tiny per-brand groups put no part
    5% above its brand mean, which the new >=1-row oracle guard caught.
    Raw double comparison is safe: the closest part sits >=0.0033
    absolute from the 1.01×avg boundary at every sf, ~10 orders of
    magnitude above summation-order ulps."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ABOVE_BRAND_AVG_SQL)


@query(
    "q_set_ops_all",
    oracle="""
    WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
    b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    SELECT
      (SELECT count(*) FROM (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b))
        AS n_intersect_all,
      (SELECT count(*) FROM (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b))
        AS n_except_all,
      (SELECT count(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b))
        AS n_intersect_distinct,
      (SELECT count(*) FROM a) AS n_a,
      (SELECT count(*) FROM b) AS n_b
    """,
    tags=("setop",),
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 bag semantics: INTERSECT ALL / EXCEPT ALL on the 1995-vs-1996
    customer order multisets — each customer keeps min(m₁,m₂) /
    max(m₁−m₂,0) copies, the multiplicity algebra DISTINCT set ops erase
    (and the reason bag ops need a count-based shuffle, not a dedup).
    Spark's intersectAll/exceptAll lower to the same count-min plan both
    engines use; the distinct variant rides along for contrast."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return (
        a.intersectAll(b)
        .agg(F.count(F.lit(1)).alias("n_intersect_all"))
        .crossJoin(a.exceptAll(b).agg(F.count(F.lit(1)).alias("n_except_all")))
        .crossJoin(
            a.intersect(b).agg(F.count(F.lit(1)).alias("n_intersect_distinct"))
        )
        .crossJoin(a.agg(F.count(F.lit(1)).alias("n_a")))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_b")))
    )


_KEYSET_SQL = """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal, c_mktsegment
    FROM customer
    WHERE c_acctbal > 5000.00
       OR (c_acctbal = 5000.00 AND c_custkey > 0)
    ORDER BY c_acctbal, c_custkey
    LIMIT 25
"""


@query("q_keyset_pagination", oracle=_KEYSET_SQL, tags=("relational", "scale", "sql-surface"))
def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — the page-N pattern that survives 100 TB
    where OFFSET cannot: the client passes the last row's (acctbal,
    custkey) cursor and the next page is WHERE (key tuple) > cursor
    ORDER BY ... LIMIT page_size. Unlike OFFSET — which must scan and
    discard every earlier row on every page — the cursor predicate pushes
    into the parquet scan (PushedFilters carries the c_acctbal bound;
    asserted in tests/test_plans.py) and the LIMIT plans as
    TakeOrderedAndProject, so page cost is O(page + scan of the pruned
    range) regardless of page number. One SQL text runs verbatim on both
    engines; the (acctbal, custkey) order is total, so the page content
    is engine-identical — which is the property paginated APIs actually
    need (no duplicated/skipped rows across pages)."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_KEYSET_SQL)
