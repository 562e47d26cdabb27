"""Advanced inference operators (round 4 continuation): the Nelson-Aalen
cumulative-hazard estimator (completing the survival pair with
q_kaplan_meier) and Benjamini-Hochberg FDR control over the per-nation
mean tests (completing the multiple-testing story the per-test queries
q_welch_ttest / q_two_proportion_ztest leave open — at 25+ simultaneous
hypotheses, uncorrected 5% tests produce false discoveries by design).

Scale notes: Nelson-Aalen reuses the Kaplan-Meier shape — a per-customer
window pass, then everything on the per-segment event-time grid (bounded
by distinct day durations), with all windows partitioned by segment.
Benjamini-Hochberg reduces the fact scan to one per-nation moment
aggregate; the p-value ranking runs on the O(nations) relation through
functions/ranks.py's two-phase global rank (no single-partition window).

Determinism: hazard prefix sums are window-ordered folds (identical
fold order on both engines, ulp-exact), rounded at 6; p-values come from
the shared Abramowitz-Stegun CDF polynomial (quant_pricing's helper — the
SAME SQL text in the oracle, the same algebra via DataFrame expressions
Spark-side) and every BH decision compares round(p, 9) against an exact
rational threshold with the nation key as tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.functions.ranks import global_row_number
from bigdatainfinance1_spark.operators.quant_pricing import _norm_cdf_sql
from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# q_nelson_aalen
# ---------------------------------------------------------------------------


@query(
    "q_nelson_aalen",
    oracle="""
    WITH ranked AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             o.o_orderdate,
             row_number() OVER (PARTITION BY o.o_custkey
                                ORDER BY o.o_orderdate, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    maxd AS (SELECT max(o_orderdate) AS maxdate FROM orders),
    durations AS (
      SELECT f.seg,
             CASE WHEN s.o_custkey IS NOT NULL
                  THEN datediff('day', f.o_orderdate, s.o_orderdate)
                  ELSE datediff('day', f.o_orderdate, m.maxdate) END AS t,
             CASE WHEN s.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM ranked f
      LEFT JOIN ranked s ON f.o_custkey = s.o_custkey AND s.rn = 2
      CROSS JOIN maxd m
      WHERE f.rn = 1
    ),
    grid AS (
      SELECT seg, t, CAST(sum(ev) AS BIGINT) AS d_events, count(*) AS at_t
      FROM durations GROUP BY seg, t
    ),
    risk AS (
      SELECT seg, t, d_events,
             CAST(sum(at_t) OVER (PARTITION BY seg ORDER BY t DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM grid
    )
    SELECT seg, CAST(t AS BIGINT) AS t, d_events, n_risk,
           round(sum(d_events * 1e0 / n_risk) OVER (
             PARTITION BY seg ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_hazard,
           round(sum(d_events * 1e0 / (n_risk * 1e0 * n_risk)) OVER (
             PARTITION BY seg ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS hazard_var,
           round(exp(-sum(d_events * 1e0 / n_risk) OVER (
             PARTITION BY seg ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
             AS survival_fh
    FROM risk
    WHERE d_events > 0
    """,
    tags=("analytics", "stats", "finance"),
)
def nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard per market segment for 'days until
    the second order', on exactly q_kaplan_meier's censored durations:
    H(t) = sum_{t_i <= t} d_i/n_i with its variance estimator
    sum d_i/n_i^2 and the Fleming-Harrington survival exp(-H) — the
    estimator of choice when hazard (instantaneous churn intensity), not
    survival, is the quantity being modeled, and the standard cross-check
    on the KM curve (exp(-H) >= KM pointwise).

    Scale: identical posture to q_kaplan_meier — per-customer window for
    first/second order, then per-segment event-time grid (bounded by
    distinct day durations); at-risk counts via a DESCENDING cumulative
    sum, hazard via ASCENDING prefix sums — all windows partitioned by
    segment. Prefix sums are order-defined folds, so both engines visit
    identical doubles; rounded at 6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        "o_custkey",
        "o_orderdate",
        F.row_number().over(wc).alias("rn"),
    )
    first = ranked.filter(F.col("rn") == 1).select(
        "seg", F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d1")
    )
    second = ranked.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d2")
    )
    maxd = orders.agg(F.max("o_orderdate").alias("maxdate"))
    durations = (
        first.join(second, "ck", "left")
        .crossJoin(F.broadcast(maxd))
        .select(
            "seg",
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            ).otherwise(F.datediff("maxdate", "d1")).alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    grid = durations.groupBy("seg", "t").agg(
        F.sum("ev").cast("long").alias("d_events"), F.count(F.lit(1)).alias("at_t")
    )
    wdesc = Window.partitionBy("seg").orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "seg", "t", "d_events", F.sum("at_t").over(wdesc).cast("long").alias("n_risk")
    )
    wasc = Window.partitionBy("seg").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h = F.sum(F.col("d_events") * 1e0 / F.col("n_risk")).over(wasc)
    v = F.sum(
        F.col("d_events") * 1e0 / (F.col("n_risk") * 1e0 * F.col("n_risk"))
    ).over(wasc)
    return (
        risk.select(
            "seg",
            F.col("t").cast("long").alias("t"),
            "d_events",
            "n_risk",
            F.round(h, 6).alias("cum_hazard"),
            F.round(v, 6).alias("hazard_var"),
            F.round(F.exp(-h), 6).alias("survival_fh"),
        )
        .filter(F.col("d_events") > 0)
    )


# ---------------------------------------------------------------------------
# q_benjamini_hochberg
# ---------------------------------------------------------------------------

BH_Q = 0.10  # target false-discovery rate


def _norm_cdf_col(x: Column) -> Column:
    """Abramowitz-Stegun 26.2.17 as a Spark Column — the same Horner chain
    as quant_pricing._norm_cdf_sql (which the oracle embeds), so both
    engines evaluate the identical polynomial."""
    t = 1.0 / (1.0 + 0.2316419 * F.abs(x))
    poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    upper = 1.0 - F.exp(-F.abs(x) * F.abs(x) / 2.0) / F.sqrt(F.lit(2.0) * F.lit(3.141592653589793)) * poly
    return F.when(x >= 0.0, upper).otherwise(1.0 - upper)


@query(
    "q_benjamini_hochberg",
    oracle=f"""
    WITH g AS (
      SELECT c.c_nationkey AS nationkey,
             count(*) AS n, sum(o.o_totalprice) AS s,
             sum(o.o_totalprice * o.o_totalprice) AS ss
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ),
    gm AS (SELECT sum(s) / sum(n) AS mu FROM g),
    z AS (
      SELECT nationkey, n,
             (s / n - gm.mu) / sqrt((ss / n - (s / n) * (s / n)) / n) AS z
      FROM g CROSS JOIN gm
    ),
    p AS (
      SELECT nationkey, n, round(z, 6) AS z,
             round(2.0 * (1.0 - {_norm_cdf_sql('abs(z)')}), 9) AS p
      FROM z
    ),
    ranked AS (
      SELECT p.*, rnk.k, rnk.m FROM p
      JOIN (
        SELECT nationkey,
               row_number() OVER (ORDER BY round(2.0 * (1.0 - {_norm_cdf_sql('abs(z)')}), 9), nationkey) AS k,
               count(*) OVER () AS m
        FROM z
      ) rnk USING (nationkey)
    ),
    kmax AS (
      SELECT coalesce(max(k), 0) AS kmax
      FROM ranked WHERE p <= k * {BH_Q} / m
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey,
           CAST(n AS BIGINT) AS n_orders,
           z AS z_stat,
           p AS p_value,
           CAST(k AS BIGINT) AS p_rank,
           round(k * {BH_Q} / m, 9) AS bh_threshold,
           k <= kmax.kmax AS rejected
    FROM ranked CROSS JOIN kmax
    """,
    tags=("stats", "inference"),
)
def benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the 25 simultaneous per-nation
    mean tests (is this nation's average order value different from the
    global mean?): per-nation z statistics from one moment aggregate,
    two-sided p-values through the shared A&S normal CDF, p-values ranked
    ascending, and the BH step-up rule — reject ranks 1..k_max where
    k_max is the largest k with p_(k) <= k/m x q at q = {q}. This is the
    discipline that keeps a 25-test (or 25,000-segment) screening from
    manufacturing discoveries — the missing piece above the individual
    test queries.

    Scale: ONE map-side-combinable moment aggregate over the fact join;
    ranking and the step-up scan run on the O(nations) relation via
    functions/ranks.py's two-phase global rank (no single-partition
    window even when m grows to millions of segments). Determinism: the
    rank orders on round(p, 9) with the nation key as tie-break, and the
    BH comparison is against an exact rational threshold."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    g = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
        )
    )
    glob = g.agg((F.sum("s") / F.sum("n")).alias("mu"))
    n = F.col("n").cast("double")
    zc = (F.col("s") / n - F.col("mu")) / F.sqrt(
        (F.col("ss") / n - (F.col("s") / n) * (F.col("s") / n)) / n
    )
    z = g.crossJoin(F.broadcast(glob)).select("nationkey", "n", zc.alias("z"))
    p = z.select(
        "nationkey",
        "n",
        F.round(F.col("z"), 6).alias("z"),
        F.round(2.0 * (1.0 - _norm_cdf_col(F.abs(F.col("z")))), 9).alias("p"),
    )
    ranked = global_row_number(p, [F.col("p").asc(), F.col("nationkey").asc()], rn_col="k")
    m = ranked.agg(F.count(F.lit(1)).alias("m"))
    ranked = ranked.crossJoin(F.broadcast(m))
    kmax = (
        ranked.filter(F.col("p") <= F.col("k") * BH_Q / F.col("m"))
        .agg(F.coalesce(F.max("k"), F.lit(0)).alias("kmax"))
    )
    return ranked.crossJoin(F.broadcast(kmax)).select(
        F.col("nationkey").cast("long").alias("nationkey"),
        F.col("n").cast("long").alias("n_orders"),
        F.col("z").alias("z_stat"),
        F.col("p").alias("p_value"),
        F.col("k").cast("long").alias("p_rank"),
        F.round(F.col("k") * BH_Q / F.col("m"), 9).alias("bh_threshold"),
        (F.col("k") <= F.col("kmax")).alias("rejected"),
    )
