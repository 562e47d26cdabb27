"""Round-2 continuation: robust statistics and finance composites beyond
SURVEY.md §2 — Theil-Sen robust trend, Kendall rank correlation,
Herfindahl-Hirschman market concentration, a month-over-month revenue
bridge (new/expansion/contraction/churn waterfall), RSI technical
indicator, and a two-proportion z-test for conversion A/B comparisons.

Every query carries a full DuckDB value-hash oracle. House rules applied
throughout: money is summed as exact integer cents (BIGINT) and divided
once at the end (large-group double sums flip on half-cent boundaries
between engines — see q_galaxy_join, round-2 finding); day/month indexes
are integer arithmetic so both engines bucket identically; every window
spec starts with partitionBy (repo rule, asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

# Shared spine for the pairwise-trend queries: daily revenue per month,
# in exact integer cents, day index = days since 1970-01-01 (both engines).
_DAILY_SQL = """
    SELECT
      CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate)     AS m,
      datediff('day', DATE '1970-01-01', o_orderdate)                 AS d,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)  AS cents
    FROM orders
    GROUP BY m, d
"""


def _daily_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).alias("m"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )


@query(
    "q_theil_sen",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    slopes AS (
      SELECT a.m AS m,
             (b.cents - a.cents) / 100e0 / (b.d - a.d) AS slope
      FROM daily a JOIN daily b ON a.m = b.m AND a.d < b.d
    )
    SELECT
      m,
      CAST(count(*) AS BIGINT)                    AS n_pairs,
      round(quantile_cont(slope, 0.5), 6)         AS ts_slope
    FROM slopes
    GROUP BY m
    """,
    tags=("analytics", "stats", "finance"),
)
def theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per month: the median of all
    pairwise slopes of the daily-revenue series — the standard
    outlier-resistant alternative to OLS (q_regr_beta is the OLS twin).
    Slopes are computed from exact integer inputs (cents BIGINT, day INT)
    with an identical division order on both engines, so every slope is
    bit-identical; the median interpolates between two such doubles and is
    rounded to 6 dp. Scale shape: the pairwise self-join is keyed on the
    month, whose group is bounded (≤31 days → ≤465 pairs) regardless of
    row count — linear in months, the classic bounded-group trick; one
    percentile aggregation per month ends the plan."""
    daily = _daily_by_month(spark, sf_dir)
    a = daily.select(F.col("m"), F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("m"), F.col("d").alias("db"), F.col("cents").alias("cb"))
    slopes = (
        a.join(b, "m")
        .filter(F.col("da") < F.col("db"))
        .select(
            "m",
            ((F.col("cb") - F.col("ca")) / F.lit(100.0) / (F.col("db") - F.col("da"))).alias(
                "slope"
            ),
        )
    )
    return slopes.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("ts_slope"),
    )


@query(
    "q_kendall_tau",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    pairs AS (
      SELECT a.m AS m,
             CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END AS conc,
             CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END AS disc
      FROM daily a JOIN daily b ON a.m = b.m AND a.d < b.d
    )
    SELECT
      m,
      CAST(sum(conc) AS BIGINT)  AS n_conc,
      CAST(sum(disc) AS BIGINT)  AS n_disc,
      round((sum(conc) - sum(disc)) * 1e0 / count(*), 6) AS tau
    FROM pairs
    GROUP BY m
    """,
    tags=("analytics", "stats"),
)
def kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a rank correlation between day-of-series and daily
    revenue, per month — the rank-based monotonic-trend test that
    complements q_spearman_corr (which ranks both variables) and
    q_theil_sen (which estimates the magnitude). Concordant/discordant
    counts are exact integers over the same bounded month-keyed pair join
    as q_theil_sen (≤465 pairs per group); revenue ties contribute zero to
    both counts but stay in the tau-a denominator n(n-1)/2 = count(*) of
    the a<b pair relation. One integer division at the end, rounded 6 dp."""
    daily = _daily_by_month(spark, sf_dir)
    a = daily.select(F.col("m"), F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("m"), F.col("d").alias("db"), F.col("cents").alias("cb"))
    pairs = (
        a.join(b, "m")
        .filter(F.col("da") < F.col("db"))
        .select(
            "m",
            F.when(F.col("cb") > F.col("ca"), 1).otherwise(0).alias("conc"),
            F.when(F.col("cb") < F.col("ca"), 1).otherwise(0).alias("disc"),
        )
    )
    return pairs.groupBy("m").agg(
        F.sum("conc").cast("long").alias("n_conc"),
        F.sum("disc").cast("long").alias("n_disc"),
        F.round(
            (F.sum("conc") - F.sum("disc")) * F.lit(1.0) / F.count(F.lit(1)), 6
        ).alias("tau"),
    )


@query(
    "q_hhi_concentration",
    oracle="""
    WITH cust_rev AS (
      SELECT c.c_nationkey,
             o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    tot AS (
      SELECT c_nationkey, CAST(sum(cents) AS BIGINT) AS tot_cents
      FROM cust_rev GROUP BY c_nationkey
    )
    SELECT
      n.n_name                                             AS n_name,
      CAST(count(*) AS BIGINT)                             AS n_custs,
      round(max(r.cents * 1e0 / t.tot_cents), 6)           AS top_share,
      round(sum((r.cents * 1e0 / t.tot_cents)
              * (r.cents * 1e0 / t.tot_cents)), 6)         AS hhi
    FROM cust_rev r
    JOIN tot t ON r.c_nationkey = t.c_nationkey
    JOIN nation n ON r.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("analytics", "finance"),
)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue-concentration index per nation: the
    sum of squared customer revenue shares (1/n = perfectly fragmented,
    1.0 = monopoly) plus the single largest share — the antitrust/market-
    structure screen. Shares are ratios of exact integer cents, so both
    engines square identical doubles; the sum over a nation's customers is
    order-sensitive at the ulp level and rounded to 6 dp per convention.
    Scale: two keyed aggregations (customer-grain then nation-grain); the
    nation-total relation is |nations|-sized and broadcast back; the
    25-row nation dim is broadcast for the name join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust_rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"))
    )
    tot = cust_rev.groupBy("c_nationkey").agg(F.sum("cents").cast("long").alias("tot_cents"))
    share = F.col("cents") * F.lit(1.0) / F.col("tot_cents")
    return (
        cust_rev.join(F.broadcast(tot), "c_nationkey")
        .join(F.broadcast(nation), cust_rev.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.round(F.max(share), 6).alias("top_share"),
            F.round(F.sum(share * share), 6).alias("hhi"),
        )
    )


@query(
    "q_revenue_bridge",
    oracle="""
    WITH cm AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey, m
    ),
    bridge AS (
      SELECT
        coalesce(cur.m, prev.m + 1) AS m,
        CASE WHEN prev.o_custkey IS NULL THEN cur.cents ELSE 0 END AS new_c,
        CASE WHEN cur.o_custkey IS NULL THEN -prev.cents ELSE 0 END AS churn_c,
        CASE WHEN cur.o_custkey IS NOT NULL AND prev.o_custkey IS NOT NULL
              AND cur.cents > prev.cents THEN cur.cents - prev.cents ELSE 0 END AS expand_c,
        CASE WHEN cur.o_custkey IS NOT NULL AND prev.o_custkey IS NOT NULL
              AND cur.cents < prev.cents THEN cur.cents - prev.cents ELSE 0 END AS contract_c
      FROM cm cur
      FULL JOIN cm prev
        ON cur.o_custkey = prev.o_custkey AND cur.m = prev.m + 1
    )
    SELECT
      m,
      round(sum(new_c) / 100e0, 2)      AS new_rev,
      round(sum(expand_c) / 100e0, 2)   AS expansion,
      round(sum(contract_c) / 100e0, 2) AS contraction,
      round(sum(churn_c) / 100e0, 2)    AS churned,
      round(sum(new_c + expand_c + contract_c + churn_c) / 100e0, 2) AS net_change
    FROM bridge
    GROUP BY m
    """,
    tags=("analytics", "finance"),
)
def revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue bridge (SaaS-style waterfall): each
    month's revenue change decomposed into new, expansion, contraction,
    and churned customer revenue — the FP&A decomposition behind every
    'why did revenue move' review. A customer-month revenue relation is
    full-outer-joined with itself shifted one month (cur.m = prev.m + 1);
    customers present only on the cur side are new, only on the prev side
    churned (attributed to the month AFTER their last activity — including
    one trailing month past the data's end, where everyone churns by
    construction). All classification and summation is exact integer
    cents; the single divide-by-100 happens at the end, so round(x, 2) is
    exact on both engines. Scale: one shuffle to customer-month grain,
    then a self-join keyed (custkey, month) — both sides share the
    partitioning, AQE reuses it; no windows, no driver state."""
    orders = load_table(spark, sf_dir, "orders")
    m = (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).cast("long")
    cm = orders.groupBy(
        "o_custkey", m.alias("m")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"))
    cur = cm.select(
        F.col("o_custkey").alias("cur_key"), F.col("m").alias("cur_m"), F.col("cents").alias("cur_c")
    )
    prev = cm.select(
        F.col("o_custkey").alias("prev_key"),
        F.col("m").alias("prev_m"),
        F.col("cents").alias("prev_c"),
    )
    br = cur.join(
        prev,
        (F.col("cur_key") == F.col("prev_key")) & (F.col("cur_m") == F.col("prev_m") + 1),
        "full_outer",
    ).select(
        F.coalesce(F.col("cur_m"), F.col("prev_m") + 1).alias("m"),
        F.when(F.col("prev_key").isNull(), F.col("cur_c")).otherwise(0).alias("new_c"),
        F.when(F.col("cur_key").isNull(), -F.col("prev_c")).otherwise(0).alias("churn_c"),
        F.when(
            F.col("cur_key").isNotNull()
            & F.col("prev_key").isNotNull()
            & (F.col("cur_c") > F.col("prev_c")),
            F.col("cur_c") - F.col("prev_c"),
        )
        .otherwise(0)
        .alias("expand_c"),
        F.when(
            F.col("cur_key").isNotNull()
            & F.col("prev_key").isNotNull()
            & (F.col("cur_c") < F.col("prev_c")),
            F.col("cur_c") - F.col("prev_c"),
        )
        .otherwise(0)
        .alias("contract_c"),
    )
    return br.groupBy("m").agg(
        F.round(F.sum("new_c") / 100.0, 2).alias("new_rev"),
        F.round(F.sum("expand_c") / 100.0, 2).alias("expansion"),
        F.round(F.sum("contract_c") / 100.0, 2).alias("contraction"),
        F.round(F.sum("churn_c") / 100.0, 2).alias("churned"),
        F.round(
            F.sum(F.col("new_c") + F.col("expand_c") + F.col("contract_c") + F.col("churn_c"))
            / 100.0,
            2,
        ).alias("net_change"),
    )


@query(
    "q_rsi_daily",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag,
             datediff('day', DATE '1970-01-01', l_shipdate) AS d,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_returnflag, d
    ),
    deltas AS (
      SELECT l_returnflag, d,
             cents - lag(cents) OVER w AS delta,
             row_number() OVER w AS rn
      FROM daily
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY d)
    ),
    gl AS (
      SELECT l_returnflag, d, rn,
             avg(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER w14 AS avg_gain,
             avg(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER w14 AS avg_loss
      FROM deltas
      WINDOW w14 AS (PARTITION BY l_returnflag ORDER BY d
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT l_returnflag, d,
           round(CASE WHEN avg_gain + avg_loss = 0 THEN 50e0
                      ELSE 100e0 * avg_gain / (avg_gain + avg_loss) END, 4) AS rsi
    FROM gl WHERE rn >= 15
    """,
    tags=("analytics", "finance", "windows"),
)
def rsi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI(14) technical indicator (Cutler's SMA variant) over the daily
    revenue series of each return-flag 'instrument' — completes the
    technical-analysis set next to q_bollinger_bands and q_ewma_orders.
    Daily revenue is exact integer cents, so deltas and the 14-row
    gain/loss averages are exact rationals both engines compute
    identically (sum of ints / 14); RSI = 100·AG/(AG+AL) — algebraically
    100 − 100/(1+RS) — is one double division, rounded 4 dp, with the
    flat-window (AG+AL=0) case pinned to 50. Rows-based frames over the
    day-keyed series are deterministic (one row per day by construction).
    Scale: windows are partitioned per instrument — no global window; at
    100 TB the instrument key fans out and each series stays a bounded
    partition."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag",
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"))
    w = Window.partitionBy("l_returnflag").orderBy("d")
    w14 = w.rowsBetween(-13, 0)
    deltas = daily.select(
        "l_returnflag",
        "d",
        (F.col("cents") - F.lag("cents").over(w)).alias("delta"),
        F.row_number().over(w).alias("rn"),
    )
    gl = deltas.select(
        "l_returnflag",
        "d",
        "rn",
        F.avg(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0)).over(w14).alias("avg_gain"),
        F.avg(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0)).over(w14).alias("avg_loss"),
    )
    return gl.filter(F.col("rn") >= 15).select(
        "l_returnflag",
        "d",
        F.round(
            F.when(F.col("avg_gain") + F.col("avg_loss") == 0, F.lit(50.0)).otherwise(
                F.lit(100.0) * F.col("avg_gain") / (F.col("avg_gain") + F.col("avg_loss"))
            ),
            4,
        ).alias("rsi"),
    )


@query(
    "q_two_proportion_ztest",
    oracle="""
    WITH users AS (
      SELECT user_id,
             CAST(ts AS DATE) AS day,
             user_id % 2 AS cohort,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id, day, cohort
    ),
    g AS (
      SELECT
        CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN cohort = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
        CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN cohort = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
      FROM users
    )
    SELECT
      n_a, x_a, n_b, x_b,
      round(x_a * 1e0 / n_a, 6) AS p_a,
      round(x_b * 1e0 / n_b, 6) AS p_b,
      round(
        (x_a * 1e0 / n_a - x_b * 1e0 / n_b)
        / sqrt(((x_a + x_b) * 1e0 / (n_a + n_b))
               * (1e0 - (x_a + x_b) * 1e0 / (n_a + n_b))
               * (1e0 / n_a + 1e0 / n_b)), 4) AS z
    FROM g
    """,
    tags=("analytics", "stats", "events"),
)
def two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between user cohorts
    (split by user_id parity — the deterministic stand-in for an A/B
    assignment): pooled-variance z statistic, the experiment-readout
    companion to q_welch_ttest (means) and q_chi2_independence (full
    contingency). The unit of analysis is the active USER-DAY (did this
    user purchase on this day) — per-user lifetime conversion is
    degenerate on this corpus (every user eventually purchases → pooled
    variance 0 → ANSI DIVIDE_BY_ZERO; hit in round 2 and pinned here).
    Everything up to the final expression is exact integer counts, so both
    engines evaluate identical doubles; sqrt is correctly rounded IEEE on
    both. Scale: one user-day-grain aggregation, one 4-counter reduce."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy(
        "user_id", F.to_date("ts").alias("day"), (F.col("user_id") % 2).alias("cohort")
    ).agg(F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"))
    g = users.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("cohort") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("cohort") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x_b"),
    )
    p_a = F.col("x_a") * F.lit(1.0) / F.col("n_a")
    p_b = F.col("x_b") * F.lit(1.0) / F.col("n_b")
    pool = (F.col("x_a") + F.col("x_b")) * F.lit(1.0) / (F.col("n_a") + F.col("n_b"))
    return g.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(
            (p_a - p_b)
            / F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))),
            4,
        ).alias("z"),
    )


@query(
    "q_kaplan_meier",
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
      SELECT seg, t,
             CAST(sum(ev) AS BIGINT) AS d_events,
             count(*) AS at_t
      FROM durations GROUP BY seg, t
    ),
    risk AS (
      SELECT seg, t, d_events,
             CAST(sum(at_t) OVER (PARTITION BY seg ORDER BY t DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM grid
    ),
    km AS (
      SELECT seg, t, d_events, n_risk,
             exp(sum(ln(1e0 - d_events * 1e0 / n_risk)) OVER (
               PARTITION BY seg ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      FROM risk
      WHERE d_events > 0 AND d_events < n_risk
    )
    SELECT seg, CAST(t AS BIGINT) AS t, d_events, n_risk,
           round(s, 6) AS survival
    FROM km
    """,
    tags=("analytics", "stats", "finance"),
)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve per market segment for 'days until the
    second order' — the churn/repeat-purchase analysis with censoring done
    right: single-order customers are censored at the end of the
    observation window instead of dropped. S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)
    is computed as exp of a cumulative ln-sum (both engines' log/exp are
    ≤1-ulp; the 6-dp round absorbs the accumulated difference). At-risk
    counts come from a DESCENDING cumulative sum over the per-segment
    event-time grid — linear, never a durations×times join. Rows where
    d = n (survival would hit exactly 0 and ln(0) = −inf) are excluded
    identically on both engines before the cumulative product. Scale: the
    customer-grain pass uses a per-customer window (rn ≤ 2); the KM pass
    runs on the per-segment time grid, whose size is bounded by distinct
    durations in days — windows are all partitioned by segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_custkey",
            "o_orderdate",
            F.row_number().over(wc).alias("rn"),
        )
    )
    maxd = orders.agg(F.max("o_orderdate").alias("maxdate"))
    f = ranked.filter(F.col("rn") == 1).select("seg", "o_custkey", F.col("o_orderdate").alias("fd"))
    s = ranked.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("s_custkey"), F.col("o_orderdate").alias("sd")
    )
    durations = (
        f.join(s, f.o_custkey == s.s_custkey, "left")
        .crossJoin(F.broadcast(maxd))
        .select(
            "seg",
            F.when(
                F.col("s_custkey").isNotNull(), F.datediff(F.col("sd"), F.col("fd"))
            )
            .otherwise(F.datediff(F.col("maxdate"), F.col("fd")))
            .alias("t"),
            F.when(F.col("s_custkey").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    grid = durations.groupBy("seg", "t").agg(
        F.sum("ev").cast("long").alias("d_events"), F.count(F.lit(1)).alias("at_t")
    )
    w_desc = (
        Window.partitionBy("seg").orderBy(F.col("t").desc()).rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = grid.select(
        "seg", "t", "d_events", F.sum("at_t").over(w_desc).cast("long").alias("n_risk")
    )
    w_asc = Window.partitionBy("seg").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = (
        risk.filter((F.col("d_events") > 0) & (F.col("d_events") < F.col("n_risk")))
        .withColumn(
            "s",
            F.exp(
                F.sum(F.log(F.lit(1.0) - F.col("d_events") * F.lit(1.0) / F.col("n_risk"))).over(
                    w_asc
                )
            ),
        )
    )
    return km.select(
        "seg", F.col("t").cast("long").alias("t"), "d_events", "n_risk",
        F.round("s", 6).alias("survival"),
    )


@query(
    "q_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts)                 AS s,
             epoch_us(ts) + 300000000     AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island_id,
             count(*) AS n_events,
             max(e) - min(s) AS covered_us
      FROM islands GROUP BY user_id, island_id
    )
    SELECT
      user_id,
      CAST(count(*) AS BIGINT)                    AS n_intervals,
      CAST(max(n_events) AS BIGINT)               AS max_interval_events,
      round(sum(covered_us) / 1e6, 2)             AS covered_s
    FROM merged GROUP BY user_id
    """,
    tags=("analytics", "windows", "events"),
)
def interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals per user (each event opens a 5-minute
    activity interval) — the gaps-and-islands primitive behind coverage,
    uptime, and exposure-window analytics, distinct from q_sessionization
    (gap-to-PREVIOUS-event) because intervals carry explicit ends: a new
    island starts only when an interval's start clears the running MAX of
    all previous ends. Epochs are exact integer microseconds
    (unix_micros ↔ epoch_us, repo convention), so island flags, ids, and
    coverage are pure integer arithmetic; the single /1e6 at the end is
    rounded to 2 dp. Scale: both windows and the two aggregations are
    partitioned/keyed by user_id — fan-out is per-user, no global state."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 300_000_000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.max("e").over(w_prev).isNull() | (F.col("s") > F.max("e").over(w_prev)), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_cum = (
        Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_cum).alias("island_id")
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).alias("n_events"), (F.max("e") - F.min("s")).alias("covered_us")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.max("n_events").cast("long").alias("max_interval_events"),
        F.round(F.sum("covered_us") / 1e6, 2).alias("covered_s"),
    )


@query(
    "q_quantile_normalize",
    oracle="""
    WITH bucketed AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
      FROM events
    ),
    bucket_means AS (
      SELECT decile, avg(value) AS norm_value FROM bucketed GROUP BY decile
    )
    SELECT
      b.event_type,
      CAST(b.decile AS BIGINT)     AS decile,
      CAST(count(*) AS BIGINT)     AS n,
      round(avg(b.value), 4)       AS orig_avg,
      round(min(m.norm_value), 4)  AS norm_avg
    FROM bucketed b JOIN bucket_means m ON b.decile = m.decile
    GROUP BY b.event_type, b.decile
    """,
    tags=("analytics", "stats", "llm-pipeline"),
)
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across event-type distributions (the
    microarray/feature-alignment preprocessing step): each type's values
    are decile-bucketed (ntile over a TOTAL order — event_id tiebreak, so
    both engines assign identical buckets), then every bucket is mapped to
    the cross-type mean of that bucket — after which each type's
    distribution is identical by construction. Output compares the
    original per-(type, decile) mean with the normalized target value.
    Averages of identical value sets are order-sensitive at ulp level →
    rounded 4 dp per convention. Scale: the ntile window is partitioned by
    type; bucket means are a 10-row relation joined back broadcast."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    bucketed = ev.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
    means = bucketed.groupBy("decile").agg(F.avg("value").alias("norm_value"))
    return (
        bucketed.join(F.broadcast(means), "decile")
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 4).alias("orig_avg"),
            F.round(F.min("norm_value"), 4).alias("norm_avg"),
        )
        .select(
            "event_type", F.col("decile").cast("long").alias("decile"), "n", "orig_avg", "norm_avg"
        )
    )


@query(
    "q_mann_whitney",
    oracle="""
    WITH ev AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             event_type, value
      FROM events WHERE event_type IN ('click', 'view')
    ),
    ranked AS (
      SELECT d, event_type,
             rank() OVER (PARTITION BY d ORDER BY value)
               + (count(*) OVER (PARTITION BY d, value) - 1) / 2e0 AS midrank
      FROM ev
    ),
    g AS (
      SELECT d,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)  AS n2,
             sum(CASE WHEN event_type = 'click' THEN midrank ELSE 0 END)           AS r1
      FROM ranked GROUP BY d
    )
    SELECT
      d, n1, n2,
      round(r1 - n1 * (n1 + 1) / 2e0, 1) AS u_stat,
      round((r1 - n1 * (n1 + 1) / 2e0 - n1 * n2 / 2e0)
            / sqrt(n1 * n2 * (n1 + n2 + 1) / 12e0), 4) AS z
    FROM g
    WHERE n1 > 0 AND n2 > 0
    """,
    tags=("analytics", "stats", "events"),
)
def mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test per day: are click event
    values stochastically larger than view values? — the nonparametric
    companion to q_welch_ttest. Computed from the RANK-SUM identity
    U₁ = R₁ − n₁(n₁+1)/2 with midranks for ties (rank() gives the tie
    group's first position; adding (tie_count−1)/2 yields the average
    position), which keeps the plan LINEAR per group — no pairwise join,
    no global sort; the ranking window is partitioned by day. Midranks are
    exact .5-granular doubles and every count is integer, so U and the
    normal-approximation z divide identical doubles on both engines.
    (First written as a month-keyed pair join — the events table spans one
    month, so that collapsed to a single quadratic group; the rank form is
    the right 100 TB shape.)"""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
            "event_type",
            "value",
        )
    )
    w_rank = Window.partitionBy("d").orderBy("value")
    w_tie = Window.partitionBy("d", "value")
    ranked = ev.select(
        "d",
        "event_type",
        (F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - 1) / F.lit(2.0)).alias(
            "midrank"
        ),
    )
    g = ranked.groupBy("d").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("event_type") == "click", F.col("midrank")).otherwise(0)).alias("r1"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    mu = F.col("n1") * F.col("n2") / F.lit(2.0)
    sigma = F.sqrt(F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1) / F.lit(12.0))
    return (
        g.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "d",
            "n1",
            "n2",
            F.round(u, 1).alias("u_stat"),
            F.round((u - mu) / sigma, 4).alias("z"),
        )
    )


@query(
    "q_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a' ELSE 'b' END AS period
      FROM orders
    ),
    grid AS (
      SELECT bin,
             CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS t_a, CAST(sum(n_b) AS BIGINT) AS t_b FROM grid
    )
    SELECT
      CAST(count(*) AS BIGINT) AS n_bins,
      CAST(sum(CASE WHEN g.n_a > 0 AND g.n_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_bins_used,
      round(sum(CASE WHEN g.n_a > 0 AND g.n_b > 0
                THEN (g.n_a * 1e0 / t.t_a - g.n_b * 1e0 / t.t_b)
                     * ln((g.n_a * 1e0 / t.t_a) / (g.n_b * 1e0 / t.t_b))
                ELSE 0e0 END), 6) AS psi
    FROM grid g CROSS JOIN tot t
    """,
    tags=("analytics", "finance", "quality"),
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre-1998 and post-1998 order
    price distributions — the model-monitoring drift metric every deployed
    credit/pricing model is watched with (PSI < 0.1 stable, > 0.25 act).
    Prices are binned on a fixed arithmetic grid (50k-wide bins — no
    engine-specific width_bucket, which DuckDB 1.0 lacks); shares are
    ratios of exact integer counts, and bins empty on either side are
    excluded from the sum identically on both engines (reported via
    n_bins_used). One groupBy over ≤10 bins plus a broadcast scalar of
    the two totals — trivially linear at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bin"),
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "a")
        .otherwise("b")
        .alias("period"),
    )
    grid = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).cast("long").alias("n_b"),
    )
    tot = grid.agg(
        F.sum("n_a").cast("long").alias("t_a"), F.sum("n_b").cast("long").alias("t_b")
    )
    p_a = F.col("n_a") * F.lit(1.0) / F.col("t_a")
    p_b = F.col("n_b") * F.lit(1.0) / F.col("t_b")
    used = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return grid.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.when(used, 1).otherwise(0)).cast("long").alias("n_bins_used"),
        F.round(
            F.sum(F.when(used, (p_a - p_b) * F.log(p_a / p_b)).otherwise(F.lit(0.0))), 6
        ).alias("psi"),
    )


@query(
    "q_woe_iv",
    oracle="""
    WITH flags AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders
    ),
    grid AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bad) AS BIGINT) AS n_bad,
             CAST(count(*) - sum(bad) AS BIGINT) AS n_good
      FROM flags GROUP BY o_orderpriority
    ),
    tot AS (
      SELECT CAST(sum(n_bad) AS BIGINT) AS t_bad, CAST(sum(n_good) AS BIGINT) AS t_good
      FROM grid
    )
    SELECT
      g.o_orderpriority,
      g.n, g.n_bad,
      round(ln((g.n_good * 1e0 / t.t_good) / (g.n_bad * 1e0 / t.t_bad)), 6) AS woe,
      round((g.n_good * 1e0 / t.t_good - g.n_bad * 1e0 / t.t_bad)
            * ln((g.n_good * 1e0 / t.t_good) / (g.n_bad * 1e0 / t.t_bad)), 6) AS iv_contrib
    FROM grid g CROSS JOIN tot t
    """,
    tags=("analytics", "finance"),
)
def woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence and information-value per order-priority bucket
    against the binary target 'order finalized' (status F) — the credit-
    scorecard feature-screening classic: WoE = ln(good share / bad share),
    IV contribution = (share gap)·WoE. Every share is a ratio of exact
    integer counts so both engines take ln of identical doubles; buckets
    here are never empty on either side (every priority has both
    outcomes), and the 6-dp round absorbs ln's ≤1-ulp spread. Scale: one
    groupBy over the bucket key, one broadcast scalar of the two totals."""
    orders = load_table(spark, sf_dir, "orders")
    grid = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("long").alias("n_bad"),
        (F.count(F.lit(1)) - F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)))
        .cast("long")
        .alias("n_good"),
    )
    tot = grid.agg(
        F.sum("n_bad").cast("long").alias("t_bad"), F.sum("n_good").cast("long").alias("t_good")
    )
    g_share = F.col("n_good") * F.lit(1.0) / F.col("t_good")
    b_share = F.col("n_bad") * F.lit(1.0) / F.col("t_bad")
    return grid.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "n",
        "n_bad",
        F.round(F.log(g_share / b_share), 6).alias("woe"),
        F.round((g_share - b_share) * F.log(g_share / b_share), 6).alias("iv_contrib"),
    )


@query(
    "q_target_encoding",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    stats AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT)   AS s
      FROM cents GROUP BY o_orderpriority
    )
    SELECT
      c.o_orderpriority,
      s.n,
      round(avg((s.s - c.c) * 1e0 / (s.n - 1) / 100e0), 4)  AS avg_enc,
      round(min((s.s - c.c) * 1e0 / (s.n - 1) / 100e0), 4)  AS min_enc,
      round(max((s.s - c.c) * 1e0 / (s.n - 1) / 100e0), 4)  AS max_enc
    FROM cents c JOIN stats s ON c.o_orderpriority = s.o_orderpriority
    GROUP BY c.o_orderpriority, s.n
    """,
    tags=("analytics", "llm-pipeline"),
)
def target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the order-priority categorical
    against order value — the leakage-safe mean encoding used in gradient-
    boosting feature pipelines: each row's encoding excludes its own
    target, enc_r = (Σ_c − y_r)/(n_c − 1). Per-category sum and count ride
    in as a broadcast category-sized relation; every encoding is built
    from exact integer cents with identical division order, so min/max are
    exact and only the row-order-sensitive avg needs its 4-dp round.
    Scale: one groupBy for category stats, one broadcast join back — the
    encode pass is a narrow map over the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        "o_orderpriority", F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    stats = cents.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("c").cast("long").alias("s")
    )
    enc = (F.col("s") - F.col("c")) * F.lit(1.0) / (F.col("n") - 1) / F.lit(100.0)
    return (
        cents.join(F.broadcast(stats), "o_orderpriority")
        .groupBy("o_orderpriority", "n")
        .agg(
            F.round(F.avg(enc), 4).alias("avg_enc"),
            F.round(F.min(enc), 4).alias("min_enc"),
            F.round(F.max(enc), 4).alias("max_enc"),
        )
        .select("o_orderpriority", "n", "avg_enc", "min_enc", "max_enc")
    )


@query(
    "q_funnel_latency",
    oracle="""
    WITH touch AS (
      SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)     AS t_view,
        min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)    AS t_click,
        min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    lat AS (
      SELECT 'view_to_click' AS step, (t_click - t_view) / 1e6 AS sec
      FROM touch WHERE t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view
      UNION ALL
      SELECT 'click_to_purchase' AS step, (t_purchase - t_click) / 1e6 AS sec
      FROM touch WHERE t_click IS NOT NULL AND t_purchase IS NOT NULL AND t_purchase > t_click
    )
    SELECT
      step,
      CAST(count(*) AS BIGINT)              AS n_users,
      round(avg(sec), 4)                    AS avg_s,
      round(quantile_cont(sec, 0.5), 4)     AS median_s,
      round(quantile_cont(sec, 0.9), 4)     AS p90_s
    FROM lat GROUP BY step
    """,
    tags=("analytics", "events"),
)
def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel latency: per user, the time from first view to
    first click and from first click to first purchase, summarized as
    avg/median/p90 per step — the 'how long does conversion take'
    companion to q_funnel_steps (how many convert) and
    q_markov_transitions (where they go instead). Latencies are exact
    integer µs differences divided once by 1e6; percentiles interpolate
    between identical doubles (quantile_cont ↔ percentile, rounded 4 dp).
    Scale: one user-grain aggregation, then a 2-group summary — the
    step-label union is a narrow map, no window anywhere."""
    ev = load_table(spark, sf_dir, "events")
    touch = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.unix_micros("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias("t_purchase"),
    )
    v2c = (
        touch.filter(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
        )
        .select(
            F.lit("view_to_click").alias("step"),
            ((F.col("t_click") - F.col("t_view")) / 1e6).alias("sec"),
        )
    )
    c2p = (
        touch.filter(
            F.col("t_click").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_purchase") > F.col("t_click"))
        )
        .select(
            F.lit("click_to_purchase").alias("step"),
            ((F.col("t_purchase") - F.col("t_click")) / 1e6).alias("sec"),
        )
    )
    return (
        v2c.unionByName(c2p)
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("sec"), 4).alias("avg_s"),
            F.round(F.expr("percentile(sec, 0.5)"), 4).alias("median_s"),
            F.round(F.expr("percentile(sec, 0.9)"), 4).alias("p90_s"),
        )
    )


@query(
    "q_feature_hashing",
    oracle="""
    WITH feats AS (
      SELECT event_type || ':' || CAST(CAST(props ->> 'k' AS INT) AS VARCHAR) AS feat
      FROM events
    ),
    hashed AS (
      SELECT feat,
             ((instr('0123456789abcdef', substr(md5(feat), 1, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(md5(feat), 2, 1)) - 1)) % 64 AS bucket
      FROM feats
    )
    SELECT
      CAST(bucket AS BIGINT)          AS bucket,
      CAST(count(*) AS BIGINT)        AS n_events,
      CAST(count(DISTINCT feat) AS BIGINT) AS n_features
    FROM hashed GROUP BY bucket
    """,
    tags=("analytics", "llm-pipeline"),
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: categorical features (event_type × the numeric
    prop extracted from the JSON payload) hashed into 64 fixed buckets —
    the unbounded-vocabulary featurizer for streaming/online models, with
    the bucket histogram and collision census (distinct features per
    bucket) as output. The hash is the first byte of md5 taken mod 64 via
    the cross-engine instr-nibble idiom (md5 hex is the only hash both
    engines share; xxhash64 is Spark-only). Scale: a narrow map plus one
    64-key groupBy — the whole point of feature hashing is that state
    stays O(buckets) forever."""
    ev = load_table(spark, sf_dir, "events")
    feat = F.concat_ws(
        ":", F.col("event_type"), F.get_json_object("props", "$.k").cast("int").cast("string")
    )
    feats = ev.select(feat.alias("feat"), F.md5(feat).alias("h"))
    nib = lambda p: F.instr(F.lit("0123456789abcdef"), F.substring("h", p, 1)) - 1  # noqa: E731
    return (
        feats.select("feat", ((nib(1) * 16 + nib(2)) % 64).alias("bucket"))
        .groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("feat").cast("long").alias("n_features"),
        )
    )


@query(
    "q_ngram_novelty",
    oracle="""
    WITH ds AS (
      SELECT DISTINCT doc_id, unnest(
        list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      ) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3
    ),
    firsts AS (SELECT s, min(doc_id) AS first_doc FROM ds GROUP BY s),
    per_doc AS (
      SELECT d.doc_id,
             count(*) AS n_shingles,
             CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM ds d JOIN firsts f ON d.s = f.s
      GROUP BY d.doc_id
    )
    SELECT
      doc.source,
      CAST(count(*) AS BIGINT)                                  AS n_docs,
      round(avg(p.n_novel * 1e0 / p.n_shingles), 4)             AS avg_novelty,
      CAST(sum(CASE WHEN p.n_novel = p.n_shingles THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS n_fully_novel
    FROM per_doc p JOIN documents doc ON p.doc_id = doc.doc_id
    GROUP BY doc.source
    """,
    tags=("llm-pipeline", "text", "dedup"),
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scoring for curriculum/curation ordering: per
    document, the fraction of its distinct 3-word shingles whose FIRST
    occurrence (lowest doc_id — the deterministic stand-in for crawl
    order) is the document itself; aggregated per source. Low-novelty
    sources are boilerplate farms — this is the corpus-level signal that
    complements pairwise near-dup detection (a doc can be 40% recombined
    boilerplate yet no single pair crosses a jaccard threshold). Reuses
    the dedup module's shingle relation; the ownership pass is one
    groupBy(min) over the shingle key plus a join back — linear in corpus
    shingle count, the same shuffle shape as q_exact_dedup. Novelty ratios
    divide exact integers; only the per-source avg needs its 4-dp round."""
    from bigdatainfinance1_spark.operators.dedup import _doc_shingle_hashes

    ds = _doc_shingle_hashes(spark, sf_dir)
    firsts = ds.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        ds.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(F.col("n_novel") * F.lit(1.0) / F.col("n_shingles")), 4).alias(
                "avg_novelty"
            ),
            F.sum(F.when(F.col("n_novel") == F.col("n_shingles"), 1).otherwise(0))
            .cast("long")
            .alias("n_fully_novel"),
        )
    )


@query(
    "q_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, substr(text, i, 1) AS ch
      FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i FROM documents)
    ),
    freq AS (
      SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM freq GROUP BY doc_id),
    ent AS (
      SELECT f.doc_id,
             -sum((f.c * 1e0 / t.n) * ln(f.c * 1e0 / t.n) / ln(2)) AS h
      FROM freq f JOIN tot t ON f.doc_id = t.doc_id
      GROUP BY f.doc_id
    )
    SELECT
      d.source,
      CAST(count(*) AS BIGINT)  AS n_docs,
      round(avg(e.h), 4)        AS avg_entropy,
      round(min(e.h), 4)        AS min_entropy,
      round(max(e.h), 4)        AS max_entropy
    FROM ent e JOIN documents d ON e.doc_id = d.doc_id
    GROUP BY d.source
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document, profiled per source —
    the cheap quality/gibberish detector every crawl-curation pipeline
    runs (low entropy → repeated filler; high → random noise or
    encodings), complementing q_text_quality's token-level ratios.
    Entropy terms use p·log₂p with identical expression shape from exact
    integer counts; per-doc sums differ only in summation order (≤1-ulp
    terms), absorbed by the 4-dp rounds after the per-source reduce.
    Scale: explode to characters is a narrow map (no shuffle); the
    (doc, char) frequency groupBy keys are high-cardinality and uniform —
    the same shape as the token-stats family, no Python anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = freq.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    ent = (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg((-F.sum(p * F.log(p) / F.log(F.lit(2.0)))).alias("h"))
    )
    src = docs.select("doc_id", "source")
    return (
        ent.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("h"), 4).alias("avg_entropy"),
            F.round(F.min("h"), 4).alias("min_entropy"),
            F.round(F.max("h"), 4).alias("max_entropy"),
        )
    )


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag,
             datediff('day', DATE '1970-01-01', l_shipdate) AS d,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY flag, d
    ),
    trended AS (
      SELECT flag, d, cents,
             CAST(sum(cents) OVER w7 AS BIGINT) AS sum7,
             row_number() OVER wa AS rn,
             count(*) OVER (PARTITION BY flag) AS n_days
      FROM daily
      WINDOW w7 AS (PARTITION BY flag ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING),
             wa AS (PARTITION BY flag ORDER BY d)
    ),
    detrended AS (
      SELECT flag, d % 7 AS dow, 7 * cents - sum7 AS resid7
      FROM trended WHERE rn >= 4 AND rn <= n_days - 3
    ),
    seasonal AS (
      SELECT flag, dow,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(resid7) AS BIGINT) AS s7sum
      FROM detrended GROUP BY flag, dow
    )
    SELECT
      se.flag,
      CAST(se.dow AS BIGINT)                          AS dow,
      se.n_days,
      round(se.s7sum * 1e0 / se.n_days / 700, 4)      AS seasonal,
      round(sum(abs(se.n_days * de.resid7 - se.s7sum)) * 1e0
            / se.n_days / se.n_days / 700, 4)         AS mean_abs_resid
    FROM detrended de
    JOIN seasonal se ON de.flag = se.flag AND de.dow = se.dow
    GROUP BY se.flag, se.dow, se.n_days, se.s7sum
    """,
    tags=("analytics", "finance", "windows"),
)
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of each return-flag's
    daily revenue series: trend = centered 7-day moving average (full
    windows only — the first/last 3 days are trimmed identically on both
    engines), weekly seasonal component = mean detrended residual per
    arithmetic weekday (d mod 7 — engines disagree on dayofweek()
    numbering, round-2 finding), plus the mean absolute remainder as the
    fit diagnostic. EXACTNESS: residuals are kept as scaled integers
    (resid7 = 7·cents − Σ₇cents — the trend average never materializes as
    a double), and the per-group deviations |n·resid7 − Σresid7| are
    integer too, so every sum is an exact BIGINT and the ONLY doubles are
    the final divisions (the first draft averaged doubles and flipped a
    4-dp half-boundary between engines). Scale: all windows partitioned
    per instrument; two keyed aggregations end the plan."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"))
    wa = Window.partitionBy("flag").orderBy("d")
    w7 = wa.rowsBetween(-3, 3)
    wn = Window.partitionBy("flag")
    trended = daily.select(
        "flag",
        "d",
        "cents",
        F.sum("cents").over(w7).cast("long").alias("sum7"),
        F.row_number().over(wa).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_all"),
    )
    detrended = trended.filter(
        (F.col("rn") >= 4) & (F.col("rn") <= F.col("n_all") - 3)
    ).select(
        "flag", (F.col("d") % 7).alias("dow"), (7 * F.col("cents") - F.col("sum7")).alias("resid7")
    )
    seasonal = detrended.groupBy("flag", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("resid7").cast("long").alias("s7sum"),
    )
    return (
        detrended.join(seasonal, ["flag", "dow"])
        .groupBy("flag", "dow", "n_days", "s7sum")
        .agg(
            F.round(
                F.sum(F.abs(F.col("n_days") * F.col("resid7") - F.col("s7sum")))
                * F.lit(1.0)
                / F.col("n_days")
                / F.col("n_days")
                / 700,
                4,
            ).alias("mean_abs_resid")
        )
        .select(
            "flag",
            F.col("dow").cast("long").alias("dow"),
            "n_days",
            F.round(F.col("s7sum") * F.lit(1.0) / F.col("n_days") / 700, 4).alias("seasonal"),
            "mean_abs_resid",
        )
    )


@query(
    "q_confusion_matrix",
    oracle="""
    WITH thr AS (
      SELECT round(quantile_cont(value, 0.5), 6) AS t FROM events
    ),
    scored AS (
      SELECT CASE WHEN e.value > t.t THEN 1 ELSE 0 END AS pred,
             CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events e CROSS JOIN thr t
    ),
    cm AS (
      SELECT
        CAST(sum(pred * label) AS BIGINT)             AS tp,
        CAST(sum(pred * (1 - label)) AS BIGINT)       AS fp,
        CAST(sum((1 - pred) * label) AS BIGINT)       AS fn,
        CAST(sum((1 - pred) * (1 - label)) AS BIGINT) AS tn
      FROM scored
    )
    SELECT
      tp, fp, fn, tn,
      round(tp * 1e0 / (tp + fp), 6) AS precision,
      round(tp * 1e0 / (tp + fn), 6) AS recall,
      round(2e0 * tp / (2 * tp + fp + fn), 6) AS f1,
      round((tp + tn) * 1e0 / (tp + fp + fn + tn), 6) AS accuracy
    FROM cm
    """,
    tags=("analytics", "stats", "llm-pipeline"),
)
def confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classification evaluation scaffold: confusion matrix plus
    precision/recall/F1/accuracy for the rule 'value above the corpus
    median predicts a purchase event' — the eval-harness pattern (scores
    + labels → thresholded metrics) that pairs with q_ndcg's ranking
    metrics. The threshold is the global median ROUNDED TO 6 DP before
    comparison, so both engines classify against the identical double
    (values ≥2.5e-3 from the rounded quantile — no boundary flakiness,
    same guard as q_iqr_outliers); every metric is then a ratio of exact
    integer counts. Scale: one percentile reduce broadcast as a scalar,
    one narrow classification map, one 4-counter reduce."""
    ev = load_table(spark, sf_dir, "events")
    thr = ev.agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("t"))
    scored = ev.crossJoin(F.broadcast(thr)).select(
        F.when(F.col("value") > F.col("t"), 1).otherwise(0).alias("pred"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    cm = scored.agg(
        F.sum(F.col("pred") * F.col("label")).cast("long").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("label"))).cast("long").alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("label")).cast("long").alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("label"))).cast("long").alias("tn"),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.col("tp") * F.lit(1.0) / (F.col("tp") + F.col("fp")), 6).alias("precision"),
        F.round(F.col("tp") * F.lit(1.0) / (F.col("tp") + F.col("fn")), 6).alias("recall"),
        F.round(
            F.lit(2.0) * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
        F.round(
            (F.col("tp") + F.col("tn"))
            * F.lit(1.0)
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("accuracy"),
    )


@query(
    "q_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT n.n_name,
             CAST(year(o.o_orderdate) AS BIGINT) * 12 + month(o.o_orderdate) AS m,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, m
    ),
    shifted AS (
      SELECT n_name, m, cents,
             lag(cents, 12) OVER (PARTITION BY n_name ORDER BY m) AS cents_prev,
             lag(m, 12) OVER (PARTITION BY n_name ORDER BY m)     AS m_prev
      FROM monthly
    )
    SELECT
      n_name, m,
      round(cents / 100e0, 2)      AS revenue,
      round(cents_prev / 100e0, 2) AS revenue_prev,
      round((cents - cents_prev) * 1e0 / cents_prev, 6) AS yoy
    FROM shifted
    WHERE m_prev = m - 12
    """,
    tags=("analytics", "finance", "windows"),
)
def yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth per nation — the BI staple.
    The lag-12 rows-based shift is only meaningful if the series has no
    month gaps, so the oracle-checked guard m_prev = m − 12 drops rows
    whose 12-back neighbour is NOT the same calendar month last year
    (identical filter both engines — correctness does not silently depend
    on series density). Revenue is exact integer cents; the growth ratio
    divides two exact integers. Scale: one (nation × month) aggregation
    (tiny grid), windows partitioned per nation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("m")
    shifted = monthly.select(
        "n_name",
        "m",
        "cents",
        F.lag("cents", 12).over(w).alias("cents_prev"),
        F.lag("m", 12).over(w).alias("m_prev"),
    )
    return shifted.filter(F.col("m_prev") == F.col("m") - 12).select(
        "n_name",
        "m",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("cents_prev") / 100.0, 2).alias("revenue_prev"),
        F.round((F.col("cents") - F.col("cents_prev")) * F.lit(1.0) / F.col("cents_prev"), 6).alias(
            "yoy"
        ),
    )


@query(
    "q_ltv_tenure",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate)) AS m0
      FROM orders GROUP BY o_custkey
    ),
    cum AS (
      SELECT o.o_custkey,
             CAST(year(o.o_orderdate) AS BIGINT) * 12 + month(o.o_orderdate) - f.m0
               AS tenure_m,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY o.o_custkey, tenure_m
    ),
    running AS (
      SELECT o_custkey, tenure_m,
             CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY tenure_m
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      FROM cum
    )
    SELECT
      tenure_m,
      CAST(count(*) AS BIGINT)               AS n_custs,
      round(avg(cum_cents) / 100e0, 2)       AS avg_ltv,
      round(quantile_cont(cum_cents, 0.5), 1) AS median_ltv_cents
    FROM running
    GROUP BY tenure_m
    """,
    tags=("analytics", "finance"),
)
def ltv_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime value by tenure: cumulative revenue per customer
    at each active month-since-first-order, averaged across the customers
    observed at that tenure — the LTV curve finance planning reads growth
    off (conditional on activity; inactive months don't emit rows, same
    semantics both engines). Cumulative sums are exact integer cents over
    a per-customer ordered window; avg(BIGINT) is exact-sum/count on both
    engines and the median interpolates identical integers; the median is
    reported in CENTS because interpolation lands on exact .5-cent values
    (binary-exact doubles) — dividing by 100 first would park it on the
    x.xx5 round-half boundary where the engines' rounding modes disagree
    (hit in round 2). Scale: customer-partitioned window, then a
    tenure-grain aggregation whose key count is bounded by the observation
    window in months."""
    orders = load_table(spark, sf_dir, "orders")
    m = (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).cast("long")
    firsts = orders.groupBy("o_custkey").agg(F.min(m).alias("m0"))
    cum = (
        orders.join(firsts, "o_custkey")
        .groupBy("o_custkey", (m - F.col("m0")).alias("tenure_m"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("tenure_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = cum.select(
        "o_custkey", "tenure_m", F.sum("cents").over(w).cast("long").alias("cum_cents")
    )
    return running.groupBy("tenure_m").agg(
        F.count(F.lit(1)).cast("long").alias("n_custs"),
        F.round(F.avg("cum_cents") / 100.0, 2).alias("avg_ltv"),
        F.round(F.expr("percentile(cum_cents, 0.5)"), 1).alias("median_ltv_cents"),
    )


@query(
    "q_halfsample_se",
    oracle="""
    WITH assigned AS (
      SELECT event_type, value,
             unnest(range(0, 16)) AS b
      FROM events
    ),
    kept AS (
      SELECT event_type, b, value
      FROM assigned
      WHERE (instr('0123456789abcdef',
               substr(md5(CAST(event_type AS VARCHAR) || ':' ||
                          CAST(value AS VARCHAR) || ':' ||
                          CAST(b AS VARCHAR)), 1, 1)) - 1) % 2 = 0
    ),
    reps AS (
      SELECT event_type, b, avg(value) AS rep_mean, count(*) AS n_b
      FROM kept GROUP BY event_type, b
    ),
    full_mean AS (
      SELECT event_type, avg(value) AS mu, count(*) AS n FROM events GROUP BY event_type
    )
    SELECT
      f.event_type,
      CAST(f.n AS BIGINT)                       AS n,
      round(f.mu, 4)                            AS mean_value,
      CAST(count(*) AS BIGINT)                  AS n_replicates,
      round(sqrt(avg((r.rep_mean - f.mu) * (r.rep_mean - f.mu))), 4) AS half_sample_se
    FROM reps r JOIN full_mean f ON r.event_type = f.event_type
    GROUP BY f.event_type, f.n, f.mu
    """,
    tags=("analytics", "stats", "events"),
)
def halfsample_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-based standard error of the per-type mean via 16
    DETERMINISTIC half-sample replicates — the resampling-uncertainty
    pattern (bootstrap family) made engine-reproducible: replicate b keeps
    a row iff the first md5 nibble of (type:value:b) is even, a 50%
    pseudo-random Bernoulli both engines compute identically (no RNG, no
    seed drift — the same md5-quota idiom as q_stratified_sample). SE is
    the root-mean-square deviation of replicate means around the full
    mean. At 100 TB the replicate axis is a 16× explode of a narrow
    projection — embarrassingly parallel, no state; a production run would
    fold the 16 partial sums in ONE pass with conditional aggregates."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    assigned = ev.select(
        "event_type", "value", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b")
    )
    key = F.concat_ws(
        ":",
        F.col("event_type"),
        F.col("value").cast("string"),
        F.col("b").cast("string"),
    )
    nib = F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(key), 1, 1)) - 1
    kept = assigned.filter(nib % 2 == 0)
    reps = kept.groupBy("event_type", "b").agg(F.avg("value").alias("rep_mean"))
    full = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        reps.join(full, "event_type")
        .groupBy("event_type", "n", "mu")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_replicates"),
            F.round(
                F.sqrt(F.avg((F.col("rep_mean") - F.col("mu")) * (F.col("rep_mean") - F.col("mu")))),
                4,
            ).alias("half_sample_se"),
        )
        .select(
            "event_type",
            "n",
            F.round("mu", 4).alias("mean_value"),
            "n_replicates",
            "half_sample_se",
        )
    )


@query(
    "q_brown_forsythe",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS z
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    g AS (
      SELECT event_type, count(*) AS n_g, avg(z) AS zbar_g, sum(z) AS zsum_g
      FROM dev GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n, sum(zsum_g) / sum(n_g) AS zbar,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    between_ss AS (
      SELECT sum(n_g * (zbar_g - t.zbar) * (zbar_g - t.zbar)) AS ssb
      FROM g CROSS JOIN tot t
    ),
    within_ss AS (
      SELECT sum((d.z - g.zbar_g) * (d.z - g.zbar_g)) AS ssw
      FROM dev d JOIN g ON d.event_type = g.event_type
    )
    SELECT
      t.k, t.n,
      round(b.ssb / (t.k - 1), 4)        AS ms_between,
      round(w.ssw / (t.n - t.k), 4)      AS ms_within,
      round((b.ssb / (t.k - 1)) / (w.ssw / (t.n - t.k)), 4) AS f_stat
    FROM tot t CROSS JOIN between_ss b CROSS JOIN within_ss w
    """,
    tags=("analytics", "stats", "events"),
)
def brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test for equality of variances across event types:
    a one-way ANOVA (q_anova_f's machinery) on absolute deviations from
    each group's MEDIAN — the robust Levene variant that gates whether
    pooled-variance tests like q_two_proportion_ztest's assumptions hold.
    Group medians are rounded to 6 dp before the deviation step so both
    engines subtract the identical double (same guard as q_iqr_outliers);
    sums of squares aggregate identical doubles and carry 4-dp rounds.
    Scale: two passes over the fact (deviations, then SS) plus
    group-cardinality-sized relations broadcast — same shape as q_anova_f."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"), F.avg("z").alias("zbar_g"), F.sum("z").alias("zsum_g")
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        (F.sum("zsum_g") / F.sum("n_g")).alias("zbar"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ssb = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n_g") * (F.col("zbar_g") - F.col("zbar")) * (F.col("zbar_g") - F.col("zbar"))
            ).alias("ssb")
        )
    )
    ssw = (
        dev.join(F.broadcast(g.select("event_type", "zbar_g")), "event_type")
        .agg(F.sum((F.col("z") - F.col("zbar_g")) * (F.col("z") - F.col("zbar_g"))).alias("ssw"))
    )
    return (
        tot.crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(ssw))
        .select(
            "k",
            "n",
            F.round(F.col("ssb") / (F.col("k") - 1), 4).alias("ms_between"),
            F.round(F.col("ssw") / (F.col("n") - F.col("k")), 4).alias("ms_within"),
            F.round(
                (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("n") - F.col("k"))), 4
            ).alias("f_stat"),
        )
    )


@query(
    "q_linear_attribution",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts,
             CAST(props ->> 'k' AS INT) % 4 AS channel
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    touched AS (
      SELECT p.event_id, c.channel
      FROM purchases p
      JOIN clicks c
        ON p.user_id = c.user_id
       AND c.ts < p.ts
       AND epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
    ),
    sized AS (
      SELECT event_id, channel,
             count(*) OVER (PARTITION BY event_id) AS n_touch
      FROM touched
    ),
    grid AS (
      SELECT channel, n_touch, count(*) AS cnt,
             count(DISTINCT event_id) AS n_purch
      FROM sized GROUP BY channel, n_touch
    )
    SELECT
      CAST(channel AS BIGINT)            AS channel,
      CAST(sum(cnt) AS BIGINT)           AS n_touches,
      CAST(sum(n_purch) AS BIGINT)       AS n_purchases,
      round(sum(cnt * 1e0 / n_touch), 4) AS credit
    FROM grid GROUP BY channel
    """,
    tags=("analytics", "events"),
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-weight) multi-touch attribution: every click in the
    24 h before a purchase shares that purchase's conversion credit
    equally (credit 1/n per click), aggregated per acquisition channel
    (the event's numeric prop mod 4 — the deterministic channel stand-in).
    Completes the attribution set: q_first_touch_attribution gives 100% to
    the first click; this splits it. The join is user-keyed with the time
    bound as a post-filter (hash join, bounded per-user fan-out); credits
    are summed per (channel, touch-count) cell first so the final sum has
    one exact-integer-ratio term per cell — summation-order noise is
    bounded by the ≤|channels|×|n| grid, absorbed by the 4-dp round. A
    purchase with clicks in k channels contributes to k rows' n_purchases
    (per-channel distinct, documented)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        (F.get_json_object("props", "$.k").cast("int") % 4).alias("channel"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    touched = purchases.join(clicks, "user_id").filter(
        (F.col("c_ts") < F.col("p_ts"))
        & (F.unix_micros("p_ts") - F.unix_micros("c_ts") <= 24 * 3600 * 1_000_000)
    )
    w = Window.partitionBy("event_id")
    sized = touched.select(
        "event_id", "channel", F.count(F.lit(1)).over(w).alias("n_touch")
    )
    grid = sized.groupBy("channel", "n_touch").agg(
        F.count(F.lit(1)).alias("cnt"), F.count_distinct("event_id").alias("n_purch")
    )
    return grid.groupBy(F.col("channel").cast("long").alias("channel")).agg(
        F.sum("cnt").cast("long").alias("n_touches"),
        F.sum("n_purch").cast("long").alias("n_purchases"),
        F.round(F.sum(F.col("cnt") * F.lit(1.0) / F.col("n_touch")), 4).alias("credit"),
    )


@query(
    "q_pps_sample",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(round(o_totalprice * 100) AS BIGINT) AS wc
      FROM orders
    ),
    cum AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice, wc,
             CAST(sum(wc) OVER (PARTITION BY o_orderpriority
                  ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c,
             CAST(sum(wc) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total
      FROM w
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM cum
    WHERE (c * 10) // total > ((c - wc) * 10) // total
    """,
    tags=("analytics", "sample", "scale"),
)
def pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sampling, systematic variant: 10
    orders per priority stratum drawn with probability ∝ order value — the
    unequal-weight companion to q_stratified_sample (equal-probability
    quotas). Items are laid on a cumulative-weight line in deterministic
    md5 order and selected where the line crosses each of the 10 equally
    spaced thresholds: selection reduces to floor((cum·10)/total) >
    floor((prev·10)/total) in EXACT integer cents (no pow/ln perturbation
    keys, which rank on sub-ulp differences and are not engine-stable —
    the reason Efraimidis-Spirakis is avoided here). Integer division is
    Spark DIV ↔ DuckDB // (repo convention). Scale: one
    stratum-partitioned running sum; the md5 order makes the draw
    reproducible across runs, engines, and partitioning."""
    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("wc"),
    )
    wo = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("o_orderpriority")
    cum = w.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        "wc",
        F.sum("wc").over(wo).cast("long").alias("c"),
        F.sum("wc").over(wt).cast("long").alias("total"),
    )
    sel = F.expr("(c * 10) DIV total") > F.expr("((c - wc) * 10) DIV total")
    return cum.filter(sel).select("o_orderpriority", "o_orderkey", "o_totalprice")


@query(
    "q_masked_view",
    oracle="""
    SELECT
      c.c_custkey,
      substr(md5(c.c_name), 1, 8)                          AS name_mask,
      CAST(floor(c.c_acctbal / 1000) * 1000 AS BIGINT)     AS acctbal_band,
      c.c_mktsegment,
      n.n_name                                             AS nation
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    """,
    tags=("analytics", "quality", "governance"),
)
def masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row- and column-level governance in one relation: the EUROPE-only
    row filter (row-level security predicate pushed into the scan) with
    PII masking projected on top — names one-way-hashed to an 8-hex token
    (joinable, not reversible), account balances generalized to 1000-wide
    bands (k-anonymity-style coarsening; q_k_anonymity measures what this
    enforces). The masked relation is exactly what a governed export/BI
    view serves. floor on a 2-decimal double is boundary-safe (values are
    ≥0.01 from integers). Scale: narrow map over the filtered scan; the
    nation→region dims broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select(
            "c_custkey",
            F.substring(F.md5("c_name"), 1, 8).alias("name_mask"),
            (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("acctbal_band"),
            "c_mktsegment",
            F.col("n_name").alias("nation"),
        )
    )


@query(
    "q_pattern_vshape",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag,
             datediff('day', DATE '1970-01-01', l_shipdate) AS d,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY flag, d
    ),
    signed AS (
      SELECT flag, d,
             CASE WHEN cents > lag(cents) OVER w THEN 1
                  WHEN cents < lag(cents) OVER w THEN -1 ELSE 0 END AS sgn
      FROM daily WINDOW w AS (PARTITION BY flag ORDER BY d)
    ),
    flagged AS (
      SELECT flag, d, sgn,
             CASE WHEN sgn = lag(sgn) OVER w2 THEN 0 ELSE 1 END AS chg
      FROM signed WHERE sgn <> 0
      WINDOW w2 AS (PARTITION BY flag ORDER BY d)
    ),
    runs AS (
      SELECT flag, d, sgn,
             sum(chg) OVER (PARTITION BY flag ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM flagged
    ),
    rle AS (
      SELECT flag, run_id,
             min(sgn)  AS sgn,
             count(*)  AS run_len
      FROM runs GROUP BY flag, run_id
    ),
    paired AS (
      SELECT flag, sgn, run_len,
             lead(sgn) OVER w3     AS next_sgn,
             lead(run_len) OVER w3 AS next_len
      FROM rle WINDOW w3 AS (PARTITION BY flag ORDER BY run_id)
    )
    SELECT
      flag,
      CAST(count(*) AS BIGINT)                   AS n_vshapes,
      CAST(max(run_len + next_len) AS BIGINT)    AS max_width,
      round(avg(run_len + next_len), 4)          AS avg_width
    FROM paired
    WHERE sgn = -1 AND next_sgn = 1 AND run_len >= 2 AND next_len >= 2
    GROUP BY flag
    """,
    tags=("analytics", "finance", "windows"),
)
def pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (the MATCH_RECOGNIZE capability class,
    composed from windows): find V-shapes in each instrument's daily
    revenue — a down-run of ≥2 days immediately followed by an up-run of
    ≥2 days. Pipeline: sign of day-over-day delta → run-length encoding
    via change-flag cumulative sum (flat days break runs, dropped before
    RLE identically on both engines) → adjacent-run pairing with lead().
    Every stage is integer arithmetic on exact cents; windows are all
    instrument-partitioned; the RLE relation is runs-sized (≪ days).
    This is the batch shape of streaming CEP — the state the stream
    version would keep per key is exactly one open run."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"))
    w = Window.partitionBy("flag").orderBy("d")
    signed = daily.select(
        "flag",
        "d",
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
        .when(F.col("cents") < F.lag("cents").over(w), -1)
        .otherwise(0)
        .alias("sgn"),
    ).filter(F.col("sgn") != 0)
    w_cum = Window.partitionBy("flag").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    runs = signed.select(
        "flag",
        "d",
        "sgn",
        F.sum(
            F.when(F.col("sgn") == F.lag("sgn").over(w), 0).otherwise(1)
        )
        .over(w_cum)
        .alias("run_id"),
    )
    rle = runs.groupBy("flag", "run_id").agg(
        F.min("sgn").alias("sgn"), F.count(F.lit(1)).alias("run_len")
    )
    w_runs = Window.partitionBy("flag").orderBy("run_id")
    paired = rle.select(
        "flag",
        "sgn",
        "run_len",
        F.lead("sgn").over(w_runs).alias("next_sgn"),
        F.lead("run_len").over(w_runs).alias("next_len"),
    )
    return (
        paired.filter(
            (F.col("sgn") == -1)
            & (F.col("next_sgn") == 1)
            & (F.col("run_len") >= 2)
            & (F.col("next_len") >= 2)
        )
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vshapes"),
            F.max(F.col("run_len") + F.col("next_len")).cast("long").alias("max_width"),
            F.round(F.avg(F.col("run_len") + F.col("next_len")), 4).alias("avg_width"),
        )
    )


@query(
    "q_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS first_d
      FROM events GROUP BY user_id
    ),
    new_per_day AS (
      SELECT first_d AS d, count(*) AS n_new FROM firsts GROUP BY first_d
    ),
    days AS (
      SELECT DISTINCT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      FROM events
    )
    SELECT
      dy.d,
      CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new_users,
      CAST(sum(coalesce(n.n_new, 0)) OVER (
        ORDER BY dy.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS cum_distinct_users
    FROM days dy LEFT JOIN new_per_day n ON dy.d = n.d
    """,
    tags=("analytics", "events", "windows"),
)
def cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — windowed COUNT(DISTINCT) is
    unsupported in every SQL engine, and the classic rewrite is this:
    reduce each user to their FIRST day (one groupBy), count first-
    appearances per day, prefix-sum that day-grain relation. The cumsum
    runs on the bounded day spine via the triangular/offset machinery of
    functions/ranks.py (global_running_sum — no single-partition window,
    repo rule; the oracle's global OVER is DuckDB-side only). All counts
    are exact integers. At 100 TB the user-grain groupBy carries the
    cost; the spine relation is |days|-sized regardless of row count."""
    from bigdatainfinance1_spark.functions.ranks import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    d_expr = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    firsts = ev.groupBy("user_id").agg(F.min(d_expr).alias("first_d"))
    new_per_day = firsts.groupBy(F.col("first_d").alias("d")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = ev.select(d_expr.alias("d")).distinct()
    spine = (
        days.join(new_per_day, "d", "left")
        .select("d", F.coalesce("n_new", F.lit(0)).alias("n_new_users"))
    )
    summed = global_running_sum(spine, ["d"], "n_new_users", "cum_distinct_users")
    return summed.select(
        "d",
        F.col("n_new_users").cast("long").alias("n_new_users"),
        F.col("cum_distinct_users").cast("long").alias("cum_distinct_users"),
    )


@query(
    "q_stress_scenarios",
    oracle="""
    WITH scenarios(scenario, shock) AS (
      VALUES ('base', 0e0), ('mild_down', -0.05e0), ('severe_down', -0.2e0),
             ('boom', 0.1e0), ('crisis', -0.35e0)
    ),
    regional AS (
      SELECT r.r_name,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name
    )
    SELECT
      s.scenario,
      g.r_name,
      round(g.cents / 100e0, 2)                       AS base_revenue,
      round(g.cents / 100e0 * (1e0 + s.shock), 2)     AS shocked_revenue,
      round(g.cents / 100e0 * s.shock, 2)             AS delta
    FROM regional g CROSS JOIN scenarios s
    """,
    tags=("analytics", "finance"),
)
def stress_scenarios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scenario-grid stress test: regional revenue re-priced under a
    5-scenario shock table (the regulatory stress-testing shape — a small
    scenario dim cross-joined against portfolio aggregates, here revenue
    as the exposure proxy). Base aggregates are exact integer cents; each
    shocked value is one multiply of identical doubles, rounded 2 dp
    (shock factors are exact binary-representable-enough literals written
    identically on both engines; margins to the cent boundary are ≥1e-10).
    Scale: the aggregate is region-grain (tiny) before the cross join —
    the scenario fan-out multiplies a 5-row dim against a 5-row relation,
    never against facts."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    regional = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
        )
    )
    scenarios = spark.createDataFrame(
        [("base", 0.0), ("mild_down", -0.05), ("severe_down", -0.2), ("boom", 0.1), ("crisis", -0.35)],
        "scenario string, shock double",
    )
    rev = F.col("cents") / 100.0
    return regional.crossJoin(F.broadcast(scenarios)).select(
        "scenario",
        "r_name",
        F.round(rev, 2).alias("base_revenue"),
        F.round(rev * (1.0 + F.col("shock")), 2).alias("shocked_revenue"),
        F.round(rev * F.col("shock"), 2).alias("delta"),
    )


@query(
    "q_power_analysis",
    oracle="""
    WITH base AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id, day
    ),
    p0 AS (SELECT avg(converted) AS p, count(*) AS n FROM base),
    effects(mde_rel) AS (VALUES (0.01e0), (0.02e0), (0.05e0), (0.1e0))
    SELECT
      e.mde_rel,
      round(p.p, 6) AS baseline_rate,
      CAST(ceil(
        2e0 * (1.959964e0 + 0.841621e0) * (1.959964e0 + 0.841621e0)
        * p.p * (1e0 - p.p) / (p.p * e.mde_rel * p.p * e.mde_rel)
      ) AS BIGINT) AS n_per_variant,
      CAST(p.n AS BIGINT) AS n_observed
    FROM effects e CROSS JOIN p0 p
    """,
    tags=("analytics", "stats", "events"),
)
def power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size (power) analysis from observed data: for
    each candidate relative minimum-detectable-effect, the per-variant n
    required at α=0.05 (two-sided) and 80% power — n = 2(z_α+z_β)²p(1−p)/
    (p·mde)² — against the observed user-day conversion baseline (same
    unit as q_two_proportion_ztest, which this query tells you whether you
    had the power to run). z constants are fixed literals on both engines;
    p is an avg of exact 0/1 integers, so the ceil argument is an
    identical double (ceil is exact — margins to integers are ≥1e-6 times
    n ≫ ulp). Scale: one user-day aggregation, one scalar, a 4-row
    effect grid."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted")
    )
    p0 = base.agg(F.avg("converted").alias("p"), F.count(F.lit(1)).cast("long").alias("n"))
    effects = spark.createDataFrame([(0.01,), (0.02,), (0.05,), (0.1,)], "mde_rel double")
    z = (1.959964 + 0.841621) ** 2
    n_req = F.ceil(
        F.lit(2.0) * F.lit(z) * F.col("p") * (F.lit(1.0) - F.col("p"))
        / (F.col("p") * F.col("mde_rel") * F.col("p") * F.col("mde_rel"))
    )
    return effects.crossJoin(F.broadcast(p0)).select(
        "mde_rel",
        F.round("p", 6).alias("baseline_rate"),
        n_req.cast("long").alias("n_per_variant"),
        F.col("n").alias("n_observed"),
    )


@query(
    "q_join_cardinality_estimate",
    oracle="""
    WITH li AS (
      SELECT count(*) AS n, count(DISTINCT l_orderkey) AS ndv FROM lineitem
    ),
    o AS (
      SELECT count(*) AS n, count(DISTINCT o_orderkey) AS ndv FROM orders
    ),
    c AS (
      SELECT count(*) AS n, count(DISTINCT c_custkey) AS ndv FROM customer
    ),
    oc AS (
      SELECT count(*) AS n, count(DISTINCT o_custkey) AS ndv FROM orders
    ),
    actuals AS (
      SELECT 'orders_lineitem' AS join_name,
             (SELECT count(*) FROM orders o2 JOIN lineitem l2
               ON o2.o_orderkey = l2.l_orderkey) AS actual,
             li.n * o.n / greatest(li.ndv, o.ndv) AS est
      FROM li CROSS JOIN o
      UNION ALL
      SELECT 'customer_orders' AS join_name,
             (SELECT count(*) FROM customer c2 JOIN orders o3
               ON c2.c_custkey = o3.o_custkey) AS actual,
             c.n * oc.n / greatest(c.ndv, oc.ndv) AS est
      FROM c CROSS JOIN oc
    )
    SELECT join_name,
           CAST(actual AS BIGINT) AS actual_rows,
           CAST(est AS BIGINT)    AS estimated_rows,
           round((est - actual) * 1e0 / actual, 4) AS rel_error
    FROM actuals
    """,
    tags=("analytics", "scale", "optimizer"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-model machinery surfaced as a query: the textbook equi-join
    cardinality estimate |A⋈B| ≈ |A|·|B| / max(ndv_A, ndv_B) (the
    containment/uniformity assumption every CBO — Catalyst's stats
    included — starts from) computed next to the TRUE join cardinality,
    with the relative error a planner would have eaten. PK-FK joins
    estimate exactly (error 0 — both here); skewed or filtered keys are
    where it breaks, which is what this harness exists to measure before
    trusting a broadcast decision at 100 TB. Integer division order is
    pinned: n·n/ndv as BIGINT math truncated identically via CAST.
    Scale: counts and NDVs are single-pass aggregates; the actual-count
    joins are the very joins being estimated."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def stats(df, col):
        r = df.agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct(col).alias("ndv")
        ).collect()[0]
        return int(r["n"]), int(r["ndv"])

    n_li, ndv_li = stats(li, "l_orderkey")
    n_o, ndv_o = stats(orders, "o_orderkey")
    n_c, ndv_c = stats(cust, "c_custkey")
    _, ndv_oc = stats(orders, "o_custkey")
    actual_ol = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    actual_co = cust.join(orders, cust.c_custkey == orders.o_custkey).count()
    est_ol = n_li * n_o // max(ndv_li, ndv_o)
    est_co = n_c * n_o // max(ndv_c, ndv_oc)
    rows = [
        ("orders_lineitem", actual_ol, est_ol, round((est_ol - actual_ol) / actual_ol, 4)),
        ("customer_orders", actual_co, est_co, round((est_co - actual_co) / actual_co, 4)),
    ]
    return spark.createDataFrame(
        rows, "join_name string, actual_rows long, estimated_rows long, rel_error double"
    )


@query(
    "q_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag,
             datediff('day', DATE '1970-01-01', l_shipdate) AS d,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY flag, d
    ),
    paired AS (
      SELECT flag, d, cents,
             lag(cents, 7) OVER w AS forecast,
             lag(d, 7) OVER w     AS d_prev
      FROM daily WINDOW w AS (PARTITION BY flag ORDER BY d)
    ),
    scored AS (
      SELECT flag, cents, forecast, cents - forecast AS err
      FROM paired WHERE d_prev = d - 7
    )
    SELECT
      flag,
      CAST(count(*) AS BIGINT)                             AS n_days,
      round(avg(abs(err)) / 100e0, 2)                      AS mae,
      round(sqrt(avg((err / 100e0) * (err / 100e0))), 2)   AS rmse,
      round(avg(abs(err) * 1e0 / cents), 6)                AS mape
    FROM scored GROUP BY flag
    """,
    tags=("analytics", "finance", "windows"),
)
def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting harness: the seasonal-naive baseline (value =
    same weekday last week) scored with MAE/RMSE/MAPE per instrument —
    the evaluation loop every production forecast runs, with seasonal-
    naive as the score-to-beat. The lag-7 pairing carries a calendar
    guard (d_prev = d − 7) so gaps never fake a forecast, same idiom as
    q_yoy_growth. Errors are exact integer cents; MAE's integer-avg is
    exact, RMSE squares identical doubles (cents fit double exactly —
    squares round identically), MAPE divides exact integers — per-group
    summation noise sits at ulp scale under every 2/6-dp round. Scale:
    one instrument-partitioned window over the bounded daily grid."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"))
    w = Window.partitionBy("flag").orderBy("d")
    paired = daily.select(
        "flag",
        "d",
        "cents",
        F.lag("cents", 7).over(w).alias("forecast"),
        F.lag("d", 7).over(w).alias("d_prev"),
    )
    scored = paired.filter(F.col("d_prev") == F.col("d") - 7).select(
        "flag", "cents", (F.col("cents") - F.col("forecast")).alias("err")
    )
    return scored.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg(F.abs("err")) / 100.0, 2).alias("mae"),
        F.round(F.sqrt(F.avg((F.col("err") / 100.0) * (F.col("err") / 100.0))), 2).alias("rmse"),
        F.round(F.avg(F.abs("err") * F.lit(1.0) / F.col("cents")), 6).alias("mape"),
    )


@query(
    "q_audit_fingerprint",
    oracle="""
    WITH hashed AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' ||
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
                 o_orderstatus) AS h
      FROM orders
    )
    SELECT
      yr,
      CAST(count(*) AS BIGINT)            AS n_rows,
      CAST(count(DISTINCT h) AS BIGINT)   AS n_distinct,
      min(h)                              AS min_hash,
      max(h)                              AS max_hash,
      CAST(sum(instr('0123456789abcdef', substr(h, 1, 1)) - 1) AS BIGINT)
                                          AS nibble_sum
    FROM hashed GROUP BY yr
    """,
    tags=("analytics", "quality", "governance"),
)
def audit_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level audit fingerprints: per year, an order-insensitive
    digest of the orders partition — row count, distinct row-hash count
    (dup detector), lexicographic min/max row hash, and a commutative
    nibble checksum. Two snapshots of a 100 TB table compare by exchanging
    these |partitions|-sized fingerprint relations instead of data — the
    reconciliation primitive under q_table_diff (which diffs rows once a
    partition fingerprint mismatches). The row hash canonicalizes exactly
    like q_exact_dedup (pipe-joined canonical strings, prices as integer
    cents); every output is integer or VARCHAR — nothing floats. Scale:
    one narrow hash map, one groupBy per partition key."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            F.col("o_orderstatus"),
        )
    )
    hashed = orders.select(F.year("o_orderdate").cast("long").alias("yr"), h.alias("h"))
    nib = F.instr(F.lit("0123456789abcdef"), F.substring("h", 1, 1)) - 1
    return hashed.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("h").cast("long").alias("n_distinct"),
        F.min("h").alias("min_hash"),
        F.max("h").alias("max_hash"),
        F.sum(nib).cast("long").alias("nibble_sum"),
    )


@query(
    "q_mixture_rebalance",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    quota AS (SELECT min(n) AS q, CAST(sum(n) AS BIGINT) AS total FROM counts),
    kept AS (
      SELECT lang FROM (
        SELECT d.lang,
               row_number() OVER (
                 PARTITION BY d.lang
                 ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
        FROM documents d
      ) r CROSS JOIN quota q
      WHERE r.rn <= q.q
    ),
    after AS (SELECT lang, count(*) AS n_after FROM kept GROUP BY lang),
    after_tot AS (SELECT CAST(sum(n_after) AS BIGINT) AS t FROM after)
    SELECT
      c.lang,
      CAST(c.n AS BIGINT)                      AS n_before,
      CAST(a.n_after AS BIGINT)                AS n_after,
      round(c.n * 1e0 / q.total, 4)            AS share_before,
      round(a.n_after * 1e0 / t.t, 4)          AS share_after
    FROM counts c
    JOIN after a ON c.lang = a.lang
    CROSS JOIN quota q CROSS JOIN after_tot t
    """,
    tags=("llm-pipeline", "sample", "text"),
)
def mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample every language to the
    smallest language's count (uniform target mixture) with the md5-order
    quota draw, reporting each language's share before and after — the
    data-mixture control step LLM pretraining pipelines run between
    curation and packing (q_stratified_sample draws fixed quotas; this
    derives the quota from the mixture target). The draw is reproducible
    across engines/partitionings (md5 order, doc_id tiebreak); shares are
    exact-integer ratios rounded 4 dp. Scale: one count aggregation, one
    per-language ranked window, quota broadcast as a scalar."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    quota = counts.agg(
        F.min("n").alias("q"), F.sum("n").cast("long").alias("total")
    )
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    kept = (
        docs.select("lang", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(quota))
        .filter(F.col("rn") <= F.col("q"))
    )
    after = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after"))
    after_tot = after.agg(F.sum("n_after").cast("long").alias("t"))
    return (
        counts.join(after, "lang")
        .crossJoin(F.broadcast(quota))
        .crossJoin(F.broadcast(after_tot))
        .select(
            "lang",
            F.col("n").cast("long").alias("n_before"),
            F.col("n_after").cast("long").alias("n_after"),
            F.round(F.col("n") * F.lit(1.0) / F.col("total"), 4).alias("share_before"),
            F.round(F.col("n_after") * F.lit(1.0) / F.col("t"), 4).alias("share_after"),
        )
    )


@query(
    "q_supplier_scorecard",
    oracle="""
    WITH perf AS (
      SELECT l.l_suppkey,
             count(*) AS n_lines,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_suppkey
    ),
    ranked AS (
      SELECT s.s_name, n.n_name, p.n_lines, p.cents, p.n_on_time,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY p.cents DESC, s.s_suppkey) AS rnk
      FROM perf p
      JOIN supplier s ON p.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT
      n_name,
      CAST(rnk AS BIGINT)                     AS rnk,
      s_name,
      CAST(n_lines AS BIGINT)                 AS n_lines,
      round(cents / 100e0, 2)                 AS revenue,
      round(n_on_time * 1e0 / n_lines, 4)     AS on_time_share
    FROM ranked WHERE rnk <= 3
    """,
    tags=("analytics", "finance", "join"),
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier performance scorecard: top-3 suppliers per nation by
    revenue, with volume and on-time shipping share (shipped ≤30 days
    after order) — the procurement review composite that exercises the
    supplier dimension end-to-end (fact⋈fact on orderkey for dates, then
    two broadcast dims, then a per-nation ranked window with full
    tiebreak). Revenue is exact integer cents; on-time share divides
    exact counts; ranks order on (cents, suppkey) — a total order.
    Scale: the supplier-grain aggregate collapses the fact before any
    window; per-nation top-3 is a WindowGroupLimit, not a sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    perf = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"),
            F.sum(
                F.when(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_on_time"),
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.col("cents").desc(), "s_suppkey")
    ranked = (
        perf.join(F.broadcast(sup), perf.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )
    return ranked.select(
        "n_name",
        F.col("rnk").cast("long").alias("rnk"),
        "s_name",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("n_on_time") * F.lit(1.0) / F.col("n_lines"), 4).alias("on_time_share"),
    )


@query(
    "q_ols_two_factor",
    oracle="""
    WITH obs AS (
      SELECT CAST(l_quantity AS BIGINT)                       AS x1,
             CAST(round(l_discount * 10000) AS BIGINT)        AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT)     AS y
      FROM lineitem
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT)   AS n,
             CAST(sum(x1) AS BIGINT)    AS s1,
             CAST(sum(x2) AS BIGINT)    AS s2,
             CAST(sum(y)  AS BIGINT)    AS sy,
             CAST(sum(x1 * x1) AS BIGINT) AS s11,
             CAST(sum(x2 * x2) AS BIGINT) AS s22,
             CAST(sum(x1 * x2) AS BIGINT) AS s12,
             CAST(sum(x1 * y) AS BIGINT)  AS s1y,
             CAST(sum(x2 * y) AS BIGINT)  AS s2y
      FROM obs
    ),
    c AS (
      SELECT n,
             n * 1e0 * s11 - s1 * 1e0 * s1 AS a11,
             n * 1e0 * s12 - s1 * 1e0 * s2 AS a12,
             n * 1e0 * s22 - s2 * 1e0 * s2 AS a22,
             n * 1e0 * s1y - s1 * 1e0 * sy AS b1,
             n * 1e0 * s2y - s2 * 1e0 * sy AS b2,
             s1, s2, sy
      FROM m
    )
    SELECT
      n,
      round((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) / 100, 6)   AS beta_qty,
      round((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) / 1000000, 6) AS beta_disc,
      round((sy * 1e0 / n
             - (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) * (s1 * 1e0 / n)
             - (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) * (s2 * 1e0 / n)) / 100, 4)
        AS intercept
    FROM c
    """,
    tags=("analytics", "stats", "finance"),
)
def ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor OLS by closed-form normal equations: extended price
    regressed on quantity and discount simultaneously — the multivariate
    step past the built-in bivariate regr_* family (q_regr_by_brand).
    Every moment (Σx, Σx², Σxy, cross-moments) is an EXACT BIGINT: x₁ is
    integer quantity, x₂ integer basis points, y integer cents. The
    CENTERED terms (n·Σxy − Σx·Σy) exceed int64 from sf0.01 up (n·Σx₂y ≈
    9.5e18 — found by the driver-grain verify, not the sf0.001 unit gate),
    so centering and Cramer's rule run in DOUBLE with the identical
    expression shape on both engines: products of exact integers round
    identically, divisions divide identical doubles, and the 6/4-dp
    rounds absorb nothing beyond ulp. Unit rescaling (/100, /1e6) maps
    betas back to dollars. One single-pass aggregation; nothing but the
    9 moments ever shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    m = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    c = m.select(
        "n",
        (F.col("n") * F.lit(1.0) * F.col("s11") - F.col("s1") * F.lit(1.0) * F.col("s1")).alias("a11"),
        (F.col("n") * F.lit(1.0) * F.col("s12") - F.col("s1") * F.lit(1.0) * F.col("s2")).alias("a12"),
        (F.col("n") * F.lit(1.0) * F.col("s22") - F.col("s2") * F.lit(1.0) * F.col("s2")).alias("a22"),
        (F.col("n") * F.lit(1.0) * F.col("s1y") - F.col("s1") * F.lit(1.0) * F.col("sy")).alias("b1"),
        (F.col("n") * F.lit(1.0) * F.col("s2y") - F.col("s2") * F.lit(1.0) * F.col("sy")).alias("b2"),
        "s1",
        "s2",
        "sy",
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    b_qty = (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det
    b_disc = (F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / det
    return c.select(
        "n",
        F.round(b_qty / 100, 6).alias("beta_qty"),
        F.round(b_disc / 1_000_000, 6).alias("beta_disc"),
        F.round(
            (
                F.col("sy") * F.lit(1.0) / F.col("n")
                - b_qty * (F.col("s1") * F.lit(1.0) / F.col("n"))
                - b_disc * (F.col("s2") * F.lit(1.0) / F.col("n"))
            )
            / 100,
            4,
        ).alias("intercept"),
    )


@query(
    "q_slo_burn",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr,
             count(*) AS n_total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_err
      FROM events GROUP BY hr
    )
    SELECT
      CAST(hr AS TIMESTAMP)                       AS hr,
      CAST(n_total AS BIGINT)                     AS n_total,
      n_err,
      round(n_err * 1e0 / n_total, 6)             AS err_rate,
      CAST(CASE WHEN n_err * 1e0 / n_total > 2 * 0.2 THEN 1 ELSE 0 END AS BIGINT)
                                                  AS burn_alert
    FROM hourly
    """,
    tags=("analytics", "events", "quality"),
)
def slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn monitor: hourly error rate against a 20%
    error budget with a 2× fast-burn alert threshold — the observability
    readout (multi-window burn-rate alerting's single-window core) that a
    platform team runs over this exact events stream; the streaming twin
    is q_stream_tumbling's window with this CASE on top. Rates divide
    exact integer counts; the alert compares against the identical
    literal product on both engines. Scale: one hour-grain aggregation —
    |hours|-sized output regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("n_err"),
    )
    rate = F.col("n_err") * F.lit(1.0) / F.col("n_total")
    return hourly.select(
        "hr",
        "n_total",
        "n_err",
        F.round(rate, 6).alias("err_rate"),
        F.when(rate > 2 * 0.2, 1).otherwise(0).cast("long").alias("burn_alert"),
    )


@query(
    "q_data_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT 'lineitem.l_orderkey' AS key_name, l_orderkey AS k FROM lineitem
      UNION ALL SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
      UNION ALL SELECT 'orders.o_custkey', o_custkey FROM orders
      UNION ALL SELECT 'events.user_id', user_id FROM events
    ),
    groups AS (
      SELECT key_name, k, count(*) AS cnt FROM per_key GROUP BY key_name, k
    )
    SELECT
      key_name,
      CAST(sum(cnt) AS BIGINT)             AS n_rows,
      CAST(count(*) AS BIGINT)             AS ndv,
      CAST(max(cnt) AS BIGINT)             AS max_group,
      round(sum(cnt) * 1e0 / count(*), 4)  AS avg_group,
      round(max(cnt) * count(*) * 1e0 / sum(cnt), 4) AS skew_ratio
    FROM groups GROUP BY key_name
    """,
    tags=("analytics", "scale", "quality"),
)
def data_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the report you run BEFORE choosing
    between a plain shuffle join, AQE skew splitting, and explicit
    salting (q_salted_join): for each join-key candidate, the row count,
    distinct keys, the largest single key's group, and the skew ratio
    max/avg (1.0 = uniform; an executor-breaking hot key shows up as a
    large multiple). Everything is exact integer counts with two exact-
    integer ratios at the end. Scale: one groupBy per key column — the
    same shuffles the real joins would do, so the report costs one pass
    of what it protects; group relations are ndv-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    sources = [
        ("lineitem.l_orderkey", li.select(F.col("l_orderkey").alias("k"))),
        ("lineitem.l_partkey", li.select(F.col("l_partkey").alias("k"))),
        ("lineitem.l_suppkey", li.select(F.col("l_suppkey").alias("k"))),
        ("orders.o_custkey", orders.select(F.col("o_custkey").alias("k"))),
        ("events.user_id", ev.select(F.col("user_id").alias("k"))),
    ]
    per_key = None
    for name, df in sources:
        tagged = df.select(F.lit(name).alias("key_name"), "k")
        per_key = tagged if per_key is None else per_key.unionByName(tagged)
    groups = per_key.groupBy("key_name", "k").agg(F.count(F.lit(1)).alias("cnt"))
    return groups.groupBy("key_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("ndv"),
        F.max("cnt").cast("long").alias("max_group"),
        F.round(F.sum("cnt") * F.lit(1.0) / F.count(F.lit(1)), 4).alias("avg_group"),
        F.round(F.max("cnt") * F.count(F.lit(1)) * F.lit(1.0) / F.sum("cnt"), 4).alias(
            "skew_ratio"
        ),
    )


@query(
    "q_price_index",
    oracle="""
    WITH py AS (
      SELECT l_partkey,
             CAST(year(l_shipdate) AS BIGINT) AS yr,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey, yr
    ),
    base AS (
      SELECT l_partkey, qty AS qty_b, cents * 1e0 / qty AS price_b
      FROM py WHERE yr = 1995
    ),
    cur AS (
      SELECT l_partkey, yr, qty AS qty_y, cents * 1e0 / qty AS price_y
      FROM py WHERE yr > 1995
    )
    SELECT
      c.yr,
      CAST(count(*) AS BIGINT) AS n_parts,
      round(sum(c.price_y * b.qty_b) / sum(b.price_b * b.qty_b), 6) AS laspeyres,
      round(sum(c.price_y * c.qty_y) / sum(b.price_b * c.qty_y), 6) AS paasche,
      round(sqrt((sum(c.price_y * b.qty_b) / sum(b.price_b * b.qty_b))
               * (sum(c.price_y * c.qty_y) / sum(b.price_b * c.qty_y))), 6) AS fisher
    FROM cur c JOIN base b ON c.l_partkey = b.l_partkey
    GROUP BY c.yr
    """,
    tags=("analytics", "finance"),
)
def price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche, and Fisher price indices per year against the
    1995 base basket — the economics/FP&A deflator machinery, computed
    over the parts present in both periods. Unit prices are exact-integer
    ratios (cents/quantity — identical doubles on both engines); the
    basket sums multiply those by exact integer quantities, so per-year
    sums differ only in summation order under the 6-dp round; Fisher is
    the geometric mean of two identical ratios. Scale: one (part, year)
    aggregation, then a year-keyed join against the |parts|-sized base
    relation — broadcastable; nothing beyond the first groupBy touches
    the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        "l_partkey", F.year("l_shipdate").cast("long").alias("yr")
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"),
    )
    price = F.col("cents") * F.lit(1.0) / F.col("qty")
    base = py.filter(F.col("yr") == 1995).select(
        "l_partkey", F.col("qty").alias("qty_b"), price.alias("price_b")
    )
    cur = py.filter(F.col("yr") > 1995).select(
        "l_partkey", "yr", F.col("qty").alias("qty_y"), price.alias("price_y")
    )
    lasp = F.sum(F.col("price_y") * F.col("qty_b")) / F.sum(F.col("price_b") * F.col("qty_b"))
    paas = F.sum(F.col("price_y") * F.col("qty_y")) / F.sum(F.col("price_b") * F.col("qty_y"))
    return (
        cur.join(F.broadcast(base), "l_partkey")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(lasp, 6).alias("laspeyres"),
            F.round(paas, 6).alias("paasche"),
            F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
        )
    )


@query(
    "q_embedding_outliers",
    oracle="""
    WITH cent AS (
      SELECT label, i, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c
      FROM embeddings, generate_series(1, 64) s(i)
      GROUP BY label, i
    ),
    dists AS (
      SELECT e.vec_id, e.label,
             sqrt(sum((CAST(e.embedding[s.i] AS DOUBLE) - c.c)
                    * (CAST(e.embedding[s.i] AS DOUBLE) - c.c))) AS dist
      FROM embeddings e, generate_series(1, 64) s(i)
      JOIN cent c ON c.label = e.label AND c.i = s.i
      GROUP BY e.vec_id, e.label
    ),
    thr AS (
      SELECT label, round(quantile_cont(dist, 0.95), 6) AS p95
      FROM dists GROUP BY label
    )
    SELECT
      d.label,
      CAST(count(*) AS BIGINT)                                  AS n_vecs,
      min(t.p95)                                                AS p95_dist,
      CAST(sum(CASE WHEN d.dist > t.p95 THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS n_outliers,
      round(max(d.dist), 6)                                     AS max_dist
    FROM dists d JOIN thr t ON d.label = t.label
    GROUP BY d.label
    """,
    tags=("similarity", "llm-pipeline"),
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier screen per label: Euclidean distance to the
    label centroid, flagging vectors beyond the label's p95 — the vector-
    hygiene check (mislabeled points, encoder failures, adversarial junk)
    an embedding pipeline runs before training or ANN indexing; completes
    the L7 family next to q_embedding_centroids/q_embedding_dispersion.
    Centroids are ROUNDED TO 6 DP before any distance (both engines
    subtract identical doubles — same pre-rounding guard as
    q_iqr_outliers' quartiles), the p95 threshold is rounded before
    comparison, and per-vector 64-term sums sit ≥1e-10 from every
    decision boundary. Scale: fully distributed — explode → centroid
    groupBy, centroid relation (|labels|×64) broadcast back, one more
    keyed aggregation; no vector ever reaches the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select("vec_id", "label", (F.col("pos") + 1).alias("i"), F.col("val").cast("double").alias("val"))
    cent = exploded.groupBy("label", "i").agg(F.round(F.avg("val"), 6).alias("c"))
    dists = (
        exploded.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c")))).alias("dist"))
    )
    thr = dists.groupBy("label").agg(
        F.round(F.expr("percentile(dist, 0.95)"), 6).alias("p95")
    )
    return (
        dists.join(F.broadcast(thr), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("p95").alias("p95_dist"),
            F.sum(F.when(F.col("dist") > F.col("p95"), 1).otherwise(0)).cast("long").alias(
                "n_outliers"
            ),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
    )


@query(
    "q_funnel_cohort_matrix",
    oracle="""
    WITH signups AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    cohorts AS (
      SELECT user_id, signup_ts,
             datediff('day', DATE '1970-01-01', CAST(signup_ts AS DATE)) // 7 AS cohort_w
      FROM signups
    ),
    converted AS (
      SELECT c.user_id, c.cohort_w,
             max(CASE WHEN e.event_type = 'purchase'
                       AND e.ts > c.signup_ts
                       AND epoch_us(e.ts) - epoch_us(c.signup_ts) <= 604800000000
                      THEN 1 ELSE 0 END) AS conv
      FROM cohorts c LEFT JOIN events e ON c.user_id = e.user_id
      GROUP BY c.user_id, c.cohort_w
    )
    SELECT
      CAST(cohort_w AS BIGINT)        AS cohort_w,
      CAST(count(*) AS BIGINT)        AS n_users,
      CAST(sum(conv) AS BIGINT)       AS n_converted,
      round(sum(conv) * 1e0 / count(*), 4) AS cvr
    FROM converted GROUP BY cohort_w
    """,
    tags=("analytics", "events"),
)
def funnel_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation funnel by signup cohort: users grouped by signup week
    (integer epoch-week — engine-safe arithmetic), converted = made a
    purchase within 7 days AFTER their first signup event — the
    growth-team readout joining q_cohort_retention's cohort axis with
    q_funnel_steps' conversion semantics. The window test runs on exact
    integer µs; integer division is Spark DIV ↔ DuckDB //. Scale: one
    user-grain reduce for signups, one user-keyed join back to events
    (both sides hash on user_id), a cohort-grain rollup."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    cohorts = signups.select(
        "user_id",
        "signup_ts",
        F.expr(
            "datediff(CAST(signup_ts AS DATE), DATE '1970-01-01') DIV 7"
        ).alias("cohort_w"),
    )
    joined = cohorts.join(ev, "user_id", "left")
    conv_flag = F.max(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("signup_ts"))
            & (F.unix_micros("ts") - F.unix_micros("signup_ts") <= 604_800_000_000),
            1,
        ).otherwise(0)
    )
    converted = joined.groupBy("user_id", "cohort_w").agg(conv_flag.alias("conv"))
    return converted.groupBy(F.col("cohort_w").cast("long").alias("cohort_w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_converted"),
        F.round(F.sum("conv") * F.lit(1.0) / F.count(F.lit(1)), 4).alias("cvr"),
    )


@query(
    "q_margin_waterfall",
    oracle="""
    SELECT
      l_returnflag,
      round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100e0, 2)
        AS gross,
      round(-sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) / 100e0, 2)
        AS discount_amt,
      round(sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100) AS BIGINT)) / 100e0, 2)
        AS tax_amt,
      round((sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             - sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
             + sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100) AS BIGINT)))
            / 100e0, 2) AS net_charge
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("analytics", "finance"),
)
def margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall per return flag: gross price → discount given →
    tax collected → net charge (the TPC-H charge algebra laid out as the
    FP&A bridge q_pricing_summary aggregates in one column). Each
    component is per-line rounded to cents BEFORE summation with the
    identical expression on both engines (the per-line products are
    2-decimal×2-decimal — exact at the half-cent grain after round — so
    both engines produce the same BIGINT per line; sums are then exact).
    One scan, one 3-group aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    gross_c = F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
    disc_c = F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long"))
    tax_c = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax") * 100).cast(
            "long"
        )
    )
    return li.groupBy("l_returnflag").agg(
        F.round(gross_c / 100.0, 2).alias("gross"),
        F.round(-disc_c / 100.0, 2).alias("discount_amt"),
        F.round(tax_c / 100.0, 2).alias("tax_amt"),
        F.round((gross_c - disc_c + tax_c) / 100.0, 2).alias("net_charge"),
    )


@query(
    "q_order_reconciliation",
    oracle="""
    WITH line_tot AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    recon AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
             coalesce(l.line_cents, 0) AS line_cents
      FROM orders o LEFT JOIN line_tot l ON o.o_orderkey = l.l_orderkey
    )
    SELECT
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(sum(CASE WHEN line_cents = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
      CAST(sum(CASE WHEN line_cents > 0 AND abs(header_cents - line_cents) > 100
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
      round(max(abs(header_cents - line_cents)) / 100e0, 2) AS max_abs_diff,
      round(sum(CASE WHEN line_cents > 0 AND abs(header_cents - line_cents) > 100
                     THEN 1 ELSE 0 END) * 1e0 / count(*), 6) AS mismatch_share
    FROM recon
    """,
    tags=("analytics", "quality", "finance"),
)
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: does each order's stated total
    match the sum of its line items? — the control every finance close
    runs between a summary ledger and its detail (and, at 100 TB, between
    two systems that were supposed to agree). Reports orders with no
    lines, orders off by more than a dollar, the worst discrepancy, and
    the mismatch share. All comparisons happen in exact integer cents;
    whatever the synthetic generator's answer is, it is deterministic and
    identical on both engines. Scale: one orderkey-grain aggregation of
    the fact, one keyed outer join to the header — the q_galaxy_join
    shuffle shape without the dims."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    line_tot = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("line_cents")
    )
    recon = orders.join(line_tot, orders.o_orderkey == line_tot.l_orderkey, "left").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
        F.coalesce("line_cents", F.lit(0)).alias("line_cents"),
    )
    diff = F.abs(F.col("header_cents") - F.col("line_cents"))
    mism = (F.col("line_cents") > 0) & (diff > 100)
    return recon.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("line_cents") == 0, 1).otherwise(0)).cast("long").alias("n_no_lines"),
        F.sum(F.when(mism, 1).otherwise(0)).cast("long").alias("n_mismatched"),
        F.round(F.max(diff) / 100.0, 2).alias("max_abs_diff"),
        F.round(F.sum(F.when(mism, 1).otherwise(0)) * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "mismatch_share"
        ),
    )


@query(
    "q_gdpr_erasure",
    oracle="""
    WITH targets AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ),
    kept AS (
      SELECT e.* FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM targets t WHERE t.user_id = e.user_id)
    )
    SELECT
      (SELECT count(*) FROM events)                       AS n_before,
      (SELECT count(*) FROM targets)                      AS n_users_erased,
      (SELECT count(*) FROM events) - count(*)            AS n_rows_erased,
      CAST(count(*) AS BIGINT)                            AS n_after,
      CAST(count(DISTINCT user_id) AS BIGINT)             AS n_users_after
    FROM kept
    """,
    tags=("analytics", "quality", "governance"),
)
def gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure batch: remove every event belonging to a deletion
    list (users with id ≡ 0 mod 97 — the deterministic stand-in for a DSR
    queue) via a broadcast anti-join, and emit the audit record a DPO
    actually files: rows before, users and rows erased, rows and users
    remaining. With q_masked_view (masking) and q_k_anonymity
    (re-identification risk) this completes the governance trio. Scale:
    the deletion list is always small → broadcast anti-join, one scan,
    no shuffle of the fact; on a lake the same plan feeds a partition
    overwrite (q_merge_upsert's write path)."""
    ev = load_table(spark, sf_dir, "events")
    targets = ev.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    kept = ev.join(F.broadcast(targets), "user_id", "left_anti")
    n_before = ev.count()
    n_targets = targets.count()
    return kept.agg(
        F.lit(n_before).cast("long").alias("n_before"),
        F.lit(n_targets).cast("long").alias("n_users_erased"),
        (F.lit(n_before) - F.count(F.lit(1))).cast("long").alias("n_rows_erased"),
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.count_distinct("user_id").cast("long").alias("n_users_after"),
    )
