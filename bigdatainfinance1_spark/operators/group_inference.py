"""K-group inference (carved out of stats_advanced.py when it crossed the
1.5k-LoC module rule): Kruskal-Wallis (the nonparametric ANOVA over
month-partitioned midranks), Tukey's HSD post-hoc pairwise comparisons,
and the DerSimonian-Laird meta-analysis of per-region effects — the
"compare many groups" layer above the two-sample tests.

Scale/determinism notes live on each query; all three reduce the corpus
to bounded group-moment relations before any inference arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# q_kruskal_wallis — nonparametric k-group ANOVA per month across regions
# ---------------------------------------------------------------------------

KW_CHI2_4_95 = 9.487729  # chi-square 4 df, 5%


@query(
    "q_kruskal_wallis",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) * 12 + month(o.o_orderdate) AS mi,
             r.r_name AS rg, round(o.o_totalprice, 2) AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    ranked AS (
      SELECT mi, rg,
             rank() OVER (PARTITION BY mi ORDER BY v)
               + (count(*) OVER (PARTITION BY mi, v) - 1) / 2e0 AS midrank,
             CAST(count(*) OVER (PARTITION BY mi, v) AS BIGINT) AS tie_c
      FROM obs
    ),
    grp AS (
      SELECT mi, rg, count(*) AS nj, sum(midrank) AS rj
      FROM ranked GROUP BY mi, rg
    ),
    ties AS (
      SELECT mi, sum(t * t * t - t) AS tie_term FROM (
        SELECT mi, v, CAST(count(*) AS BIGINT) AS t FROM obs GROUP BY mi, v
      ) GROUP BY mi
    ),
    hstat AS (
      SELECT grp.mi, CAST(sum(grp.nj) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             12.0 / (sum(grp.nj) * (sum(grp.nj) + 1.0))
               * sum(grp.rj * grp.rj / grp.nj)
               - 3.0 * (sum(grp.nj) + 1.0) AS h
      FROM grp GROUP BY grp.mi HAVING count(*) = 5
    )
    SELECT hstat.mi, hstat.n,
           round(hstat.h, 6) AS h,
           round(hstat.h / (1.0 - ties.tie_term
                 / (hstat.n * 1.0 * hstat.n * hstat.n - hstat.n)), 6) AS h_corrected,
           hstat.h / (1.0 - ties.tie_term
                 / (hstat.n * 1.0 * hstat.n * hstat.n - hstat.n)) > {KW_CHI2_4_95}
             AS reject_95
    FROM hstat JOIN ties ON ties.mi = hstat.mi
    ORDER BY hstat.mi
    """,
    tags=("stats", "analytics"),
)
def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H per month across the five customer regions on
    order values: H = 12/(N(N+1))·ΣR²ⱼ/nⱼ − 3(N+1) from partitioned
    midranks, with the tie correction 1 − Σ(t³−t)/(N³−N) — the
    nonparametric ANOVA that q_anova_f's normal-theory F cannot replace
    when order values are heavy-tailed (they are: q_jarque_bera). The
    q_mann_whitney midrank identity generalized from 2 groups to k=5;
    months missing any region are excluded so df is the fixed 4.

    Scale: dim-chain broadcast joins, ONE partitioned rank window (by
    month — never a global sort), integer/‌.5-granular midranks summed
    per group, closed forms. Midranks are exact; H divides identical
    doubles on both engines, rounded at 6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    obs = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).alias(
                "mi"
            ),
            F.col("r_name").alias("rg"),
            F.round("o_totalprice", 2).alias("v"),
        )
    )
    w_rank = Window.partitionBy("mi").orderBy("v")
    w_tie = Window.partitionBy("mi", "v")
    ranked = obs.select(
        "mi",
        "rg",
        (
            F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - 1) / F.lit(2.0)
        ).alias("midrank"),
    )
    grp = ranked.groupBy("mi", "rg").agg(
        F.count(F.lit(1)).alias("nj"), F.sum("midrank").alias("rj")
    )
    ties = (
        obs.groupBy("mi", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("mi")
        .agg(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_term"))
    )
    hstat = (
        grp.groupBy("mi")
        .agg(
            F.sum("nj").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("k"),
            (
                12.0
                / (F.sum("nj") * (F.sum("nj") + 1.0))
                * F.sum(F.col("rj") * F.col("rj") / F.col("nj"))
                - 3.0 * (F.sum("nj") + 1.0)
            ).alias("h"),
        )
        .filter(F.col("k") == 5)
    )
    corr = 1.0 - F.col("tie_term") / (
        F.col("n") * 1.0 * F.col("n") * F.col("n") - F.col("n")
    )
    return (
        hstat.join(ties, "mi")
        .select(
            "mi",
            "n",
            F.round(F.col("h"), 6).alias("h"),
            F.round(F.col("h") / corr, 6).alias("h_corrected"),
            (F.col("h") / corr > KW_CHI2_4_95).alias("reject_95"),
        )
        .orderBy("mi")
    )


# ---------------------------------------------------------------------------
# q_tukey_hsd — post-hoc pairwise comparisons after the ANOVA
# ---------------------------------------------------------------------------

TUKEY_Q_5_INF = 3.858  # studentized range q(0.05; k=5, df -> inf)


@query(
    "q_tukey_hsd",
    oracle=f"""
    WITH obs AS (
      SELECT r.r_name AS rg, o.o_totalprice AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    g AS (
      SELECT rg, count(*) AS n, avg(y) AS m,
             (sum(y * y) - count(*) * avg(y) * avg(y)) / (count(*) - 1) AS s2
      FROM obs GROUP BY rg
    ),
    mse AS (
      SELECT sum((n - 1) * s2) / (sum(n) - count(*)) AS mse FROM g
    )
    SELECT a.rg AS region_i, b.rg AS region_j,
           CAST(a.n AS BIGINT) AS n_i, CAST(b.n AS BIGINT) AS n_j,
           round(a.m - b.m, 4) AS mean_diff,
           round(abs(a.m - b.m)
                 / sqrt(mse.mse / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat,
           abs(a.m - b.m) / sqrt(mse.mse / 2.0 * (1.0 / a.n + 1.0 / b.n))
             > {TUKEY_Q_5_INF} AS significant
    FROM g a JOIN g b ON a.rg < b.rg CROSS JOIN mse
    ORDER BY region_i, region_j
    """,
    tags=("stats", "analytics"),
)
def tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's honest significant difference: all 10 pairwise region
    mean comparisons with the studentized-range statistic q =
    |mᵢ−mⱼ|/√(MSE/2·(1/nᵢ+1/nⱼ)) against q₀.₀₅(5, ∞) = 3.858 — the
    post-hoc layer q_anova_f needs (an omnibus rejection says SOME
    means differ; HSD says WHICH, with family-wise error control that
    10 naive t-tests would blow).

    Scale: one dim-chain aggregate to 5 group-moment rows, a 10-pair
    self-join on that bounded relation, closed forms. Group variances
    use the n·mean² identity on exact sums; rounded at 4/6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    obs = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("r_name").alias("rg"), F.col("o_totalprice").alias("y"))
    )
    g = obs.groupBy("rg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("m"),
        (
            (F.sum(F.col("y") * F.col("y")) - F.count(F.lit(1)) * F.avg("y") * F.avg("y"))
            / (F.count(F.lit(1)) - 1)
        ).alias("s2"),
    )
    mse = g.agg(
        (
            F.sum((F.col("n") - 1) * F.col("s2"))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("mse")
    )
    b = g.select(
        F.col("rg").alias("rgb"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
    )
    se = F.sqrt(
        F.col("mse") / 2.0 * (1.0 / F.col("n") + 1.0 / F.col("nb"))
    )
    q = F.abs(F.col("m") - F.col("mb")) / se
    return (
        g.join(F.broadcast(b), F.col("rg") < F.col("rgb"))
        .crossJoin(F.broadcast(mse))
        .select(
            F.col("rg").alias("region_i"),
            F.col("rgb").alias("region_j"),
            F.col("n").cast("long").alias("n_i"),
            F.col("nb").cast("long").alias("n_j"),
            F.round(F.col("m") - F.col("mb"), 4).alias("mean_diff"),
            F.round(q, 6).alias("q_stat"),
            (q > TUKEY_Q_5_INF).alias("significant"),
        )
        .orderBy("region_i", "region_j")
    )


# ---------------------------------------------------------------------------
# q_meta_analysis — inverse-variance pooling across region "studies"
# ---------------------------------------------------------------------------

META_DISC = 0.06  # treatment: any line discounted >= 6% (the q_qini_curve arm)


@query(
    "q_meta_analysis",
    oracle=f"""
    WITH treated AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_discount >= {META_DISC}
    ),
    obs AS (
      SELECT r.r_name AS rg,
             CASE WHEN t.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS tr,
             o.o_totalprice / 1000.0 AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      LEFT JOIN treated t ON t.l_orderkey = o.o_orderkey
    ),
    arm AS (
      SELECT rg, tr, count(*) AS n, avg(y) AS m,
             (sum(y * y) - count(*) * avg(y) * avg(y)) / (count(*) - 1) AS s2
      FROM obs GROUP BY rg, tr
    ),
    study AS (
      SELECT a.rg,
             round(a.m - b.m, 8) AS d,
             round(a.s2 / a.n + b.s2 / b.n, 8) AS v
      FROM arm a JOIN arm b ON b.rg = a.rg AND a.tr = 1 AND b.tr = 0
    ),
    fe AS (
      SELECT count(*) AS k,
             sum(d / v) / sum(1.0 / v) AS theta_fe,
             sum(1.0 / v) AS sw,
             sum(1.0 / (v * v)) AS sw2
      FROM study
    ),
    het AS (
      SELECT fe.k, fe.theta_fe, fe.sw, fe.sw2,
             (SELECT sum((study.d - fe.theta_fe) * (study.d - fe.theta_fe) / study.v)
              FROM study) AS q_het
      FROM fe
    ),
    re AS (
      SELECT k, theta_fe, q_het,
             greatest(0.0, (q_het - (k - 1)) / (sw - sw2 / sw)) AS tau2,
             greatest(0.0, (q_het - (k - 1)) / nullif(q_het, 0.0)) AS i2
      FROM het
    )
    SELECT study.rg AS region,
           round(study.d, 6) AS effect,
           round(sqrt(study.v), 6) AS se,
           round((1.0 / study.v) / re_sw.sw_fe, 6) AS fe_weight,
           round(re.theta_fe, 6) AS pooled_fe,
           round((SELECT sum(s.d / (s.v + re.tau2)) / sum(1.0 / (s.v + re.tau2))
                  FROM study s), 6) AS pooled_re,
           round(re.q_het, 6) AS q_het,
           round(re.i2, 6) AS i_squared
    FROM study
    CROSS JOIN re
    CROSS JOIN (SELECT sum(1.0 / v) AS sw_fe FROM study) re_sw
    ORDER BY region
    """,
    tags=("stats", "experimentation", "analytics"),
)
def meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-analysis of the discount effect across the five region
    "studies": per-region treated-minus-control mean difference with its
    variance, inverse-variance fixed-effect pooling, Cochran's Q
    heterogeneity, I², the DerSimonian-Laird τ², and the random-effects
    pooled estimate — the multi-site experiment readout (was the promo
    effect consistent across regions, and what is the honest pooled
    number if it wasn't?) that single-population tools (q_welch_ttest,
    q_ipw_ate) cannot answer.

    Scale: one annotated fact join + a (region, arm) moment aggregate;
    everything downstream runs on the 5-row study relation. Effects and
    variances round at 8 before pooling; closed forms, rounded at 6."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    treated = li.filter(F.col("l_discount") >= META_DISC).select("l_orderkey").distinct()
    obs = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            treated.withColumn("is_t", F.lit(1)),
            orders.o_orderkey == treated.l_orderkey,
            "left",
        )
        .select(
            F.col("r_name").alias("rg"),
            F.coalesce(F.col("is_t"), F.lit(0)).alias("tr"),
            (F.col("o_totalprice") / 1000.0).alias("y"),
        )
    )
    arm = obs.groupBy("rg", "tr").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("m"),
        (
            (F.sum(F.col("y") * F.col("y")) - F.count(F.lit(1)) * F.avg("y") * F.avg("y"))
            / (F.count(F.lit(1)) - 1)
        ).alias("s2"),
    )
    t_arm = arm.filter(F.col("tr") == 1).select(
        "rg", F.col("n").alias("nt"), F.col("m").alias("mt"), F.col("s2").alias("st")
    )
    c_arm = arm.filter(F.col("tr") == 0).select(
        "rg", F.col("n").alias("nc"), F.col("m").alias("mc"), F.col("s2").alias("sc")
    )
    study = t_arm.join(c_arm, "rg").select(
        "rg",
        F.round(F.col("mt") - F.col("mc"), 8).alias("d"),
        F.round(F.col("st") / F.col("nt") + F.col("sc") / F.col("nc"), 8).alias("v"),
    )
    study = study.localCheckpoint(eager=True)  # 5-row model branched 4 ways
    fe = study.agg(
        F.count(F.lit(1)).alias("k"),
        (F.sum(F.col("d") / F.col("v")) / F.sum(1.0 / F.col("v"))).alias("theta_fe"),
        F.sum(1.0 / F.col("v")).alias("sw"),
        F.sum(1.0 / (F.col("v") * F.col("v"))).alias("sw2"),
    )
    het = study.crossJoin(F.broadcast(fe)).agg(
        F.max("k").alias("k"),
        F.max("theta_fe").alias("theta_fe"),
        F.max("sw").alias("sw"),
        F.max("sw2").alias("sw2"),
        F.sum(
            (F.col("d") - F.col("theta_fe"))
            * (F.col("d") - F.col("theta_fe"))
            / F.col("v")
        ).alias("q_het"),
    )
    re = het.select(
        "k",
        "theta_fe",
        "sw",
        "q_het",
        F.greatest(
            F.lit(0.0),
            (F.col("q_het") - (F.col("k") - 1))
            / (F.col("sw") - F.col("sw2") / F.col("sw")),
        ).alias("tau2"),
        F.greatest(
            F.lit(0.0),
            (F.col("q_het") - (F.col("k") - 1)) / F.nullif(F.col("q_het"), F.lit(0.0)),
        ).alias("i2"),
    )
    pooled_re = study.crossJoin(F.broadcast(re)).agg(
        (
            F.sum(F.col("d") / (F.col("v") + F.col("tau2")))
            / F.sum(1.0 / (F.col("v") + F.col("tau2")))
        ).alias("theta_re")
    )
    return (
        study.crossJoin(F.broadcast(re))
        .crossJoin(F.broadcast(pooled_re))
        .select(
            F.col("rg").alias("region"),
            F.round(F.col("d"), 6).alias("effect"),
            F.round(F.sqrt(F.col("v")), 6).alias("se"),
            F.round((1.0 / F.col("v")) / F.col("sw"), 6).alias("fe_weight"),
            F.round(F.col("theta_fe"), 6).alias("pooled_fe"),
            F.round(F.col("theta_re"), 6).alias("pooled_re"),
            F.round(F.col("q_het"), 6).alias("q_het"),
            F.round(F.col("i2"), 6).alias("i_squared"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# q_wilcoxon_signed_rank — paired nonparametric year-over-year test
# ---------------------------------------------------------------------------

WSR_Y1 = 1999
WSR_Y2 = 2000
WSR_Z95 = 1.959964


@query(
    "q_wilcoxon_signed_rank",
    oracle=f"""
    WITH pairs AS (
      SELECT c.c_nationkey AS nk,
             CAST(round(sum(CASE WHEN year(o.o_orderdate) = {WSR_Y1}
                                 THEN o.o_totalprice END) * 100) AS BIGINT) AS s1,
             CAST(round(sum(CASE WHEN year(o.o_orderdate) = {WSR_Y2}
                                 THEN o.o_totalprice END) * 100) AS BIGINT) AS s2
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate >= TIMESTAMP '{WSR_Y1}-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '{WSR_Y2 + 1}-01-01 00:00:00'
      GROUP BY nk
      HAVING s1 IS NOT NULL AND s2 IS NOT NULL AND s2 <> s1
    ),
    d AS (
      SELECT nk, s2 - s1 AS d, abs(s2 - s1) AS ad FROM pairs
    ),
    ranked AS (
      SELECT nk, d, row_number() OVER (ORDER BY ad, nk) AS rnk,
             count(*) OVER () AS n
      FROM d
    ),
    stat AS (
      SELECT max(n) AS n,
             sum(CASE WHEN d > 0 THEN rnk ELSE 0 END) AS w_plus,
             sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS n_pos
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(w_plus AS BIGINT) AS w_plus,
           CAST(n_pos AS BIGINT) AS n_positive,
           round((w_plus - n * (n + 1) / 4.0)
                 / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0), 6) AS z_wilcoxon,
           round((n_pos - n / 2.0) / sqrt(n / 4.0), 6) AS z_sign,
           abs((w_plus - n * (n + 1) / 4.0)
               / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0)) > {WSR_Z95}
             AS reject_95
    FROM stat
    """,
    tags=("stats", "analytics"),
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on paired nation revenues ({WSR_Y1} vs
    the next year): W⁺ = sum of |difference| ranks where the later year
    won, against E[W] = n(n+1)/4 — the PAIRED nonparametric test
    (q_mann_whitney is the unpaired twin; q_welch_ttest the parametric
    one), with the cruder sign test riding along to show what ranking
    the magnitudes buys. Differences are exact integer cents; zero
    differences drop per the standard procedure.

    Scale: one two-year pushed-down aggregate to ≤25 pairs, one
    global rank over that broadcast-sized relation (nk tie-break),
    closed forms — dimension-bounded past the scan. Rounded at 6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pairs = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{WSR_Y1}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{WSR_Y2 + 1}-01-01 00:00:00").cast("timestamp"))
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.year("o_orderdate") == WSR_Y1, F.col("o_totalprice"))
                )
                * 100
            )
            .cast("long")
            .alias("s1"),
            F.round(
                F.sum(
                    F.when(F.year("o_orderdate") == WSR_Y2, F.col("o_totalprice"))
                )
                * 100
            )
            .cast("long")
            .alias("s2"),
        )
        .filter(
            F.col("s1").isNotNull()
            & F.col("s2").isNotNull()
            & (F.col("s2") != F.col("s1"))
        )
    )
    d = pairs.select(
        "nk", (F.col("s2") - F.col("s1")).alias("d"), F.abs(F.col("s2") - F.col("s1")).alias("ad")
    )
    from bigdatainfinance1_spark.functions.ranks import global_row_number

    ranked = global_row_number(d, ["ad", "nk"], rn_col="rnk")
    nn = ranked.agg(F.count(F.lit(1)).alias("n"))
    stat = ranked.crossJoin(F.broadcast(nn)).agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("rnk")).otherwise(0)).alias("w_plus"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("n_pos"),
    )
    zw = (F.col("w_plus") - F.col("n") * (F.col("n") + 1) / 4.0) / F.sqrt(
        F.col("n") * (F.col("n") + 1.0) * (2 * F.col("n") + 1) / 24.0
    )
    zs = (F.col("n_pos") - F.col("n") / 2.0) / F.sqrt(F.col("n") / 4.0)
    return stat.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("w_plus").cast("long").alias("w_plus"),
        F.col("n_pos").cast("long").alias("n_positive"),
        F.round(zw, 6).alias("z_wilcoxon"),
        F.round(zs, 6).alias("z_sign"),
        (F.abs(zw) > WSR_Z95).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# q_cronbach_alpha — internal consistency of the quality-rater battery
# ---------------------------------------------------------------------------


@query(
    "q_cronbach_alpha",
    oracle="""
    WITH rated AS (
      SELECT CASE WHEN length(text) > 200 THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(string_split(text, ' ')) > 40 THEN 1 ELSE 0 END AS rb,
             CASE WHEN position('.' IN text) > 0 THEN 1 ELSE 0 END AS rc
      FROM documents
    ),
    v AS (
      SELECT count(*) AS n,
             avg(ra * 1.0) * (1.0 - avg(ra * 1.0)) AS va,
             avg(rb * 1.0) * (1.0 - avg(rb * 1.0)) AS vb,
             avg(rc * 1.0) * (1.0 - avg(rc * 1.0)) AS vc,
             avg((ra + rb + rc) * (ra + rb + rc) * 1.0)
               - avg((ra + rb + rc) * 1.0) * avg((ra + rb + rc) * 1.0) AS vt
      FROM rated
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           round(va + vb + vc, 6) AS sum_item_var,
           round(vt, 6) AS total_var,
           round(1.5 * (1.0 - (va + vb + vc) / vt), 6) AS cronbach_alpha,
           1.5 * (1.0 - (va + vb + vc) / vt) >= 0.7 AS acceptable
    FROM v
    """,
    tags=("stats", "text", "quality", "llm"),
)
def cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α (equivalently KR-20 for these binary items) of the
    three document-quality raters: α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total) with
    k = 3 — the internal-consistency reliability of the battery:
    q_fleiss_kappa asks whether raters AGREE per item; α asks whether
    the raters form ONE scale whose sum is a reliable quality score
    (the precondition for using the vote total as a filter threshold).
    Binary item variances are the exact p(1−p) closed form.

    Scale: one linear pass to integer predicates, one moment aggregate,
    closed forms on a 1-row relation — all map-side combinable.
    Rounded at 6."""
    docs = load_table(spark, sf_dir, "documents")
    rated = docs.select(
        F.when(F.length("text") > 200, 1).otherwise(0).alias("ra"),
        F.when(F.size(F.split("text", " ")) > 40, 1).otherwise(0).alias("rb"),
        F.when(F.instr("text", ".") > 0, 1).otherwise(0).alias("rc"),
    )
    tot = (F.col("ra") + F.col("rb") + F.col("rc")) * 1.0
    v = rated.agg(
        F.count(F.lit(1)).alias("n"),
        (F.avg(F.col("ra") * 1.0) * (1.0 - F.avg(F.col("ra") * 1.0))).alias("va"),
        (F.avg(F.col("rb") * 1.0) * (1.0 - F.avg(F.col("rb") * 1.0))).alias("vb"),
        (F.avg(F.col("rc") * 1.0) * (1.0 - F.avg(F.col("rc") * 1.0))).alias("vc"),
        (F.avg(tot * tot) - F.avg(tot) * F.avg(tot)).alias("vt"),
    )
    alpha = 1.5 * (
        1.0 - (F.col("va") + F.col("vb") + F.col("vc")) / F.col("vt")
    )
    return v.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("va") + F.col("vb") + F.col("vc"), 6).alias("sum_item_var"),
        F.round(F.col("vt"), 6).alias("total_var"),
        F.round(alpha, 6).alias("cronbach_alpha"),
        (alpha >= 0.7).alias("acceptable"),
    )


# ---------------------------------------------------------------------------
# q_indirect_standardization — mix-adjusted performance (SMR per region)
# ---------------------------------------------------------------------------


@query(
    "q_indirect_standardization",
    oracle="""
    WITH obs AS (
      SELECT r.r_name AS region, c.c_mktsegment AS seg,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS conv
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    std AS (
      SELECT seg, sum(conv) * 1.0 / count(*) AS rate FROM obs GROUP BY seg
    ),
    cells AS (
      SELECT region, seg, count(*) AS n, sum(conv) AS o FROM obs GROUP BY region, seg
    ),
    smr AS (
      SELECT cells.region,
             CAST(sum(cells.o) AS BIGINT) AS observed,
             sum(cells.n * std.rate) AS expected
      FROM cells JOIN std ON std.seg = cells.seg
      GROUP BY cells.region
    )
    SELECT region, observed,
           round(expected, 4) AS expected,
           round(observed / expected, 6) AS smr,
           round((observed - expected) / sqrt(expected), 6) AS z_byar,
           abs((observed - expected) / sqrt(expected)) > 1.959964 AS significant
    FROM smr ORDER BY region
    """,
    tags=("stats", "analytics", "experimentation"),
)
def indirect_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indirect standardization of region conversion (urgent-order
    rate): expected conversions = Σ (corpus-wide segment rate × the
    region's segment exposure), SMR = observed/expected with the
    Poisson z ≈ (O−E)/√E — the epidemiology machinery answering the
    business question "does this region over/under-perform AFTER
    adjusting for its customer mix?", which raw rate comparisons
    (q_beta_binomial_ab) conflate with composition.

    Scale: one dim-chain aggregate to (region × segment) integer cells
    + broadcast segment rates; closed forms on 25 cells. Rounded at
    4/6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    obs = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)
            .alias("conv"),
        )
    )
    std = obs.groupBy("seg").agg(
        (F.sum("conv") * 1.0 / F.count(F.lit(1))).alias("rate")
    )
    cells = obs.groupBy("region", "seg").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("o")
    )
    smr = (
        cells.join(F.broadcast(std), "seg")
        .groupBy("region")
        .agg(
            F.sum("o").cast("long").alias("observed"),
            F.sum(F.col("n") * F.col("rate")).alias("expected"),
        )
    )
    z = (F.col("observed") - F.col("expected")) / F.sqrt(F.col("expected"))
    return smr.select(
        "region",
        "observed",
        F.round(F.col("expected"), 4).alias("expected"),
        F.round(F.col("observed") / F.col("expected"), 6).alias("smr"),
        F.round(z, 6).alias("z_byar"),
        (F.abs(z) > 1.959964).alias("significant"),
    ).orderBy("region")


# ---------------------------------------------------------------------------
# q_oaxaca_kitagawa — mix-effect vs rate-effect decomposition
# ---------------------------------------------------------------------------

OK_REGION_A = "EUROPE"
OK_REGION_B = "ASIA"


@query(
    "q_oaxaca_kitagawa",
    oracle=f"""
    WITH obs AS (
      SELECT r.r_name AS region, c.c_mktsegment AS seg,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS conv
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name IN ('{OK_REGION_A}', '{OK_REGION_B}')
    ),
    cells AS (
      SELECT region, seg, count(*) AS n, sum(conv) * 1.0 / count(*) AS rate
      FROM obs GROUP BY region, seg
    ),
    tot AS (
      SELECT region, sum(n) AS nt FROM cells GROUP BY region
    ),
    wr AS (
      SELECT cells.region, cells.seg,
             cells.n * 1.0 / tot.nt AS w, cells.rate
      FROM cells JOIN tot ON tot.region = cells.region
    ),
    sides AS (
      SELECT a.seg, a.w AS wa, a.rate AS ra, b.w AS wb, b.rate AS rb
      FROM (SELECT * FROM wr WHERE region = '{OK_REGION_A}') a
      JOIN (SELECT * FROM wr WHERE region = '{OK_REGION_B}') b ON b.seg = a.seg
    ),
    dec AS (
      SELECT sum(wa * ra) - sum(wb * rb) AS gap,
             sum((wa - wb) * (ra + rb) / 2.0) AS mix_effect,
             sum(((wa + wb) / 2.0) * (ra - rb)) AS rate_effect
      FROM sides
    )
    SELECT round(gap, 6) AS total_gap,
           round(mix_effect, 6) AS mix_effect,
           round(rate_effect, 6) AS rate_effect,
           round(mix_effect + rate_effect - gap, 9) AS residual_check
    FROM dec
    """,
    tags=("stats", "analytics", "experimentation"),
)
def oaxaca_kitagawa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kitagawa/Oaxaca-Blinder decomposition of the EUROPE-vs-ASIA
    conversion gap: split the total rate difference into the MIX effect
    Σ(wₐ−w_b)·r̄ (different segment composition) and the RATE effect
    Σw̄·(rₐ−r_b) (different within-segment performance), using the
    symmetric midpoint weighting so the two components sum EXACTLY to
    the gap (residual_check ≈ 0 by construction, emitted as proof) —
    the standard answer to "is the difference who they sell to, or how
    well they sell?".

    Scale: one two-region pushed aggregate to 10 (region, segment)
    cells; closed forms. Rounded at 6/9."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    obs = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                reg.filter(F.col("r_name").isin(OK_REGION_A, OK_REGION_B)).select(
                    "r_regionkey", "r_name"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)
            .alias("conv"),
        )
    )
    cells = obs.groupBy("region", "seg").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("conv") * 1.0 / F.count(F.lit(1))).alias("rate"),
    )
    tot = cells.groupBy("region").agg(F.sum("n").alias("nt"))
    wr = cells.join(F.broadcast(tot), "region").select(
        "region", "seg", (F.col("n") * 1.0 / F.col("nt")).alias("w"), "rate"
    )
    a = wr.filter(F.col("region") == OK_REGION_A).select(
        "seg", F.col("w").alias("wa"), F.col("rate").alias("ra")
    )
    b = wr.filter(F.col("region") == OK_REGION_B).select(
        "seg", F.col("w").alias("wb"), F.col("rate").alias("rb")
    )
    sides = a.join(b, "seg")
    dec = sides.agg(
        (
            F.sum(F.col("wa") * F.col("ra")) - F.sum(F.col("wb") * F.col("rb"))
        ).alias("gap"),
        F.sum((F.col("wa") - F.col("wb")) * (F.col("ra") + F.col("rb")) / 2.0).alias(
            "mix_effect"
        ),
        F.sum(((F.col("wa") + F.col("wb")) / 2.0) * (F.col("ra") - F.col("rb"))).alias(
            "rate_effect"
        ),
    )
    return dec.select(
        F.round(F.col("gap"), 6).alias("total_gap"),
        F.round(F.col("mix_effect"), 6).alias("mix_effect"),
        F.round(F.col("rate_effect"), 6).alias("rate_effect"),
        F.round(
            F.col("mix_effect") + F.col("rate_effect") - F.col("gap"), 9
        ).alias("residual_check"),
    )
