"""Statistical process control (carved out of finance_ts.py when it
crossed the 1.5k-LoC module rule): the XmR individuals/moving-range
chart and the Western Electric runs rules on its sigma zones — the
monitoring layer that flags special-cause variation in a metric stream,
beside the changepoint detectors (q_cusum_changepoint, q_page_hinkley)
which answer "when did the level shift" rather than "is this point out
of control".

Determinism: chart centers and sigma estimates are ratios of exact
BIGINT sums (cents, integer moving ranges), so every zone comparison
evaluates identical doubles on both engines; runs-rule flags are pure
integer window counts. Scale: per-nation partitioned windows, O(nations)
limit relations broadcast back — two shuffles per chart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# q_control_chart — XmR individuals chart (moved verbatim from finance_ts.py)
# ---------------------------------------------------------------------------

@query(
    "q_control_chart",
    oracle="""
    WITH daily AS (
      SELECT c.c_nationkey AS nk,
             datediff('day', DATE '1970-01-01', o.o_orderdate) AS d,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY nk, d
    ),
    mr AS (
      SELECT nk, d, cents,
             abs(cents - lag(cents) OVER (PARTITION BY nk ORDER BY d)) AS moving_range
      FROM daily
    ),
    limits AS (
      SELECT nk,
             CAST(count(*) AS BIGINT)       AS n_days,
             CAST(sum(cents) AS BIGINT)     AS s_cents,
             CAST(sum(moving_range) AS BIGINT) AS s_mr,
             CAST(count(moving_range) AS BIGINT) AS n_mr
      FROM mr GROUP BY nk
    ),
    judged AS (
      SELECT m.nk,
             CASE WHEN m.cents * 1e0 > l.s_cents * 1e0 / l.n_days
                       + 2.66e0 * l.s_mr / l.n_mr THEN 1
                  WHEN m.cents * 1e0 < l.s_cents * 1e0 / l.n_days
                       - 2.66e0 * l.s_mr / l.n_mr THEN 1
                  ELSE 0 END AS breach
      FROM mr m JOIN limits l ON m.nk = l.nk
    )
    SELECT
      j.nk AS nationkey,
      CAST(count(*) AS BIGINT)        AS n_days,
      CAST(sum(j.breach) AS BIGINT)   AS n_breaches,
      round(max(l.s_cents * 1e0 / l.n_days + 2.66e0 * l.s_mr / l.n_mr) / 100, 4) AS ucl_dollars,
      round(max(l.s_cents * 1e0 / l.n_days - 2.66e0 * l.s_mr / l.n_mr) / 100, 4) AS lcl_dollars
    FROM judged j JOIN limits l ON j.nk = l.nk
    GROUP BY j.nk
    """,
    tags=("analytics", "quality", "timeseries"),
)
def control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals / moving-range) control chart per nation's daily
    revenue — the SPC monitor that flags special-cause variation: limits =
    mean ± 2.66·mean(|Δ|), the classic Shewhart constant. Sums of cents
    and of integer moving ranges are exact BIGINTs, so the limit
    expressions divide identical integers on both engines and the breach
    comparison is engine-stable without pre-rounding (2.66·s_mr/n_mr is
    one double product of exact inputs). Scale: the lag runs in the
    nation-partitioned window (25-way parallel), limits are a 25-row
    aggregate joined back broadcast-style — two shuffles total, the
    monitoring shape you'd run per metric per stream at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
                    orders["o_custkey"] == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("d"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"))
    )
    w = Window.partitionBy("nk").orderBy("d")
    mr = daily.withColumn("moving_range", F.abs(F.col("cents") - F.lag("cents").over(w)))
    limits = mr.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("s_cents"),
        F.sum("moving_range").cast("long").alias("s_mr"),
        F.count("moving_range").cast("long").alias("n_mr"),
    )
    ucl = F.col("s_cents") * F.lit(1.0) / F.col("n_days") + F.lit(2.66) * F.col("s_mr") / F.col("n_mr")
    lcl = F.col("s_cents") * F.lit(1.0) / F.col("n_days") - F.lit(2.66) * F.col("s_mr") / F.col("n_mr")
    judged = mr.join(limits, "nk").withColumn(
        "breach",
        F.when((F.col("cents") * F.lit(1.0) > ucl) | (F.col("cents") * F.lit(1.0) < lcl), 1).otherwise(0),
    )
    return judged.groupBy(F.col("nk").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("breach").cast("long").alias("n_breaches"),
        F.round(F.max(ucl) / 100, 4).alias("ucl_dollars"),
        F.round(F.max(lcl) / 100, 4).alias("lcl_dollars"),
    )


# ---------------------------------------------------------------------------
# q_western_electric — runs rules over the XmR sigma zones
# ---------------------------------------------------------------------------

WE_D2 = 1.128  # E[moving range]/sigma for n=2: sigma_hat = MRbar / d2

_WE_SQL = f"""
    WITH daily AS (
      SELECT c.c_nationkey AS nk,
             datediff('day', DATE '1970-01-01', o.o_orderdate) AS d,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY nk, d
    ),
    mr AS (
      SELECT nk, d, cents,
             abs(cents - lag(cents) OVER (PARTITION BY nk ORDER BY d)) AS mrange
      FROM daily
    ),
    limits AS (
      SELECT nk,
             sum(cents) * 1e0 / count(*) AS center,
             (sum(mrange) * 1e0 / count(mrange)) / {WE_D2} AS sigma
      FROM mr GROUP BY nk
    ),
    zoned AS (
      SELECT m.nk, m.d, 
             CASE WHEN m.cents * 1e0 > l.center THEN 1
                  WHEN m.cents * 1e0 < l.center THEN -1 ELSE 0 END AS side,
             CASE WHEN m.cents * 1e0 > l.center + 3 * l.sigma
                    OR m.cents * 1e0 < l.center - 3 * l.sigma THEN 1 ELSE 0 END AS b3,
             CASE WHEN m.cents * 1e0 > l.center + 2 * l.sigma THEN 1 ELSE 0 END AS hi2,
             CASE WHEN m.cents * 1e0 < l.center - 2 * l.sigma THEN 1 ELSE 0 END AS lo2,
             CASE WHEN m.cents * 1e0 > l.center + 1 * l.sigma THEN 1 ELSE 0 END AS hi1,
             CASE WHEN m.cents * 1e0 < l.center - 1 * l.sigma THEN 1 ELSE 0 END AS lo1
      FROM mr m JOIN limits l ON m.nk = l.nk
    ),
    ruled AS (
      SELECT nk, d, b3 AS r1,
        CASE WHEN sum(hi2) OVER w3 >= 2 OR sum(lo2) OVER w3 >= 2 THEN 1 ELSE 0 END AS r2,
        CASE WHEN sum(hi1) OVER w5 >= 4 OR sum(lo1) OVER w5 >= 4 THEN 1 ELSE 0 END AS r3,
        CASE WHEN abs(sum(side) OVER w8) = 8 THEN 1 ELSE 0 END AS r4
      FROM zoned
      WINDOW w3 AS (PARTITION BY nk ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             w5 AS (PARTITION BY nk ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w8 AS (PARTITION BY nk ORDER BY d ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT nk AS nationkey,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(r1) AS BIGINT) AS rule1_beyond_3s,
           CAST(sum(r2) AS BIGINT) AS rule2_2of3_beyond_2s,
           CAST(sum(r3) AS BIGINT) AS rule3_4of5_beyond_1s,
           CAST(sum(r4) AS BIGINT) AS rule4_8_same_side,
           CAST(sum(CASE WHEN r1 + r2 + r3 + r4 > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged
    FROM ruled GROUP BY nk ORDER BY nk
"""


@query("q_western_electric", oracle=_WE_SQL, tags=("analytics", "quality", "timeseries"))
def western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric runs rules over q_control_chart's XmR chart: per
    nation-day, flag (1) a point beyond 3 sigma, (2) >= 2 of the last 3
    beyond 2 sigma on the SAME side, (3) >= 4 of the last 5 beyond
    1 sigma same side, (4) 8 consecutive points one side of center —
    the zone tests that catch drifts and shifts far smaller than the
    3-sigma breach q_control_chart counts (a 1-sigma shift takes ~44
    points to trip rule 1 but ~9 to trip rule 4). sigma comes from the
    same moving-range estimate (MRbar/d2, d2 = {WE_D2}).

    Determinism: center and sigma are ratios of exact BIGINT sums, so
    all zone CASEs compare identical doubles; every rule is then an
    integer count over a fixed ROWS frame; no rounding anywhere until
    nothing is left to round. Scale: the q_control_chart shape — one
    nation-partitioned window pass (the three rule frames share the
    same sort), O(nations) limits broadcast back."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
                "d"
            ),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("nk").orderBy("d")
    mr = daily.withColumn(
        "mrange", F.abs(F.col("cents") - F.lag("cents").over(w))
    )
    limits = mr.groupBy("nk").agg(
        (F.sum("cents") * F.lit(1.0) / F.count(F.lit(1))).alias("center"),
        (
            (F.sum("mrange") * F.lit(1.0) / F.count("mrange")) / F.lit(WE_D2)
        ).alias("sigma"),
    )
    c = F.col("cents") * F.lit(1.0)
    ctr, sg = F.col("center"), F.col("sigma")
    zoned = mr.join(F.broadcast(limits), "nk").select(
        "nk",
        "d",
        F.when(c > ctr, 1).when(c < ctr, -1).otherwise(0).alias("side"),
        F.when((c > ctr + 3 * sg) | (c < ctr - 3 * sg), 1).otherwise(0).alias("b3"),
        F.when(c > ctr + 2 * sg, 1).otherwise(0).alias("hi2"),
        F.when(c < ctr - 2 * sg, 1).otherwise(0).alias("lo2"),
        F.when(c > ctr + 1 * sg, 1).otherwise(0).alias("hi1"),
        F.when(c < ctr - 1 * sg, 1).otherwise(0).alias("lo1"),
    )
    w3 = Window.partitionBy("nk").orderBy("d").rowsBetween(-2, 0)
    w5 = Window.partitionBy("nk").orderBy("d").rowsBetween(-4, 0)
    w8 = Window.partitionBy("nk").orderBy("d").rowsBetween(-7, 0)
    ruled = zoned.select(
        "nk",
        "d",
        F.col("b3").alias("r1"),
        F.when(
            (F.sum("hi2").over(w3) >= 2) | (F.sum("lo2").over(w3) >= 2), 1
        ).otherwise(0).alias("r2"),
        F.when(
            (F.sum("hi1").over(w5) >= 4) | (F.sum("lo1").over(w5) >= 4), 1
        ).otherwise(0).alias("r3"),
        F.when(F.abs(F.sum("side").over(w8)) == 8, 1).otherwise(0).alias("r4"),
    )
    return (
        ruled.groupBy(F.col("nk").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("r1").cast("long").alias("rule1_beyond_3s"),
            F.sum("r2").cast("long").alias("rule2_2of3_beyond_2s"),
            F.sum("r3").cast("long").alias("rule3_4of5_beyond_1s"),
            F.sum("r4").cast("long").alias("rule4_8_same_side"),
            F.sum(
                F.when(F.col("r1") + F.col("r2") + F.col("r3") + F.col("r4") > 0, 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("nationkey")
    )
