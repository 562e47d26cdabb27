"""Econometric diagnostics (round 4, wave: regression/time-series tests):
the battery a quant or forecasting pipeline runs BEFORE trusting a model —
normality (Jarque-Bera), residual autocorrelation (Durbin-Watson,
Ljung-Box), stationarity (Dickey-Fuller), random-walk behavior
(Lo-MacKinlay variance ratio, Wald-Wolfowitz runs), heteroskedasticity
(Breusch-Pagan), HAC-robust inference (Newey-West), and the two-series
layer: Granger causality and Engle-Granger cointegration between monthly
revenue and monthly shipped quantity.

Scale notes: every query reduces the corpus to the O(calendar) monthly
series (~80 rows) in ONE aggregate scan (two scans for the two-series
queries — orders and lineitem); all subsequent work is calendar-bounded
and corpus-size-independent: lag equi-joins on the dense month index
(broadcast, no windows), one moment aggregate, closed forms. At 100 TB
the only cost that grows is the initial map-side-combinable monthly
aggregate.

Determinism: the monthly observations are rounded at 6 before anything
else (exact on both engines); demeaned/residual state is rounded at 8
before any product; moments divide by a fixed n so ratios are
engine-identical to ulp; outputs round at 6, orders of magnitude above
the ~1e-13 summation-order noise of an 80-term double sum. Critical
values are fixed literals (normal/chi-square/DF percentiles), so verdict
strings are pure CASE over already-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.operators.ts_mining import _MONTHLY_SQL, _monthly
from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

Z95 = 1.959964  # two-sided 5% normal
CHI2_1_95 = 3.841459  # chi-square 1 df, 5%
CHI2_2_95 = 5.991465  # chi-square 2 df, 5%
CHI2_6_95 = 12.591587  # chi-square 6 df, 5%
ADF_CRIT_5 = -2.89  # Dickey-Fuller tau-mu 5% (constant, n ~ 75-100)
EG_CRIT_5 = -3.37  # Engle-Granger 5% (2 variables, constant)
F_1_CRIT_5 = 3.974  # F(1, ~72) 5% — conservative for the ~80-month panel


def _with_lags(idx: DataFrame, lags: int, col: str = "z") -> DataFrame:
    """Broadcast lag equi-joins on the dense month index (the relation is
    O(calendar); no window, no sort) — the Spark twin of the oracles'
    ``LEFT JOIN idx bK ON bK.i = a.i - K`` chains."""
    out = idx.select("i", F.col(col).alias("z0"))
    for k in range(1, lags + 1):
        out = out.join(
            F.broadcast(
                idx.select((F.col("i") + k).alias("i"), F.col(col).alias(f"zl{k}"))
            ),
            "i",
            "left",
        )
    return out


# ---------------------------------------------------------------------------
# q_jarque_bera — normality of monthly revenue via skewness/kurtosis
# ---------------------------------------------------------------------------


@query(
    "q_jarque_bera",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    gmom AS (SELECT count(*) AS n, round(avg(z), 8) AS mu FROM idx),
    xc AS (
      SELECT round(idx.z - gmom.mu, 8) AS x, gmom.n FROM idx CROSS JOIN gmom
    ),
    mom AS (
      SELECT max(n) AS n,
             sum(x * x) / max(n) AS m2,
             sum(x * x * x) / max(n) AS m3,
             sum(x * x * x * x) / max(n) AS m4
      FROM xc
    ),
    sk AS (
      SELECT n, m3 / (m2 * sqrt(m2)) AS s, m4 / (m2 * m2) - 3.0 AS k FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           round(s, 6) AS skewness,
           round(k, 6) AS excess_kurtosis,
           round(n / 6.0 * (s * s + k * k / 4.0), 6) AS jb_stat,
           CASE WHEN n / 6.0 * (s * s + k * k / 4.0) > {CHI2_2_95}
                THEN 'non_normal' ELSE 'normal' END AS verdict
    FROM sk
    """,
    tags=("stats", "timeseries", "finance"),
)
def jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on monthly revenue: JB = n/6·(S² +
    K²/4) from the sample skewness S = m₃/m₂^1.5 and excess kurtosis
    K = m₄/m₂² − 3, against the chi-square(2) 5% critical value — the
    gate every Gaussian-assuming downstream (q_welch_ttest's intervals,
    q_black_scholes' lognormal returns, q_var_cvar's parametric twin)
    should run first.

    Scale: one map-side-combinable monthly aggregate reduces the corpus
    to O(calendar) rows; moments and the statistic are closed forms on a
    1-row relation. Deviations round at 8 before powers; all four
    moments share the fixed divisor n, so S and K are engine-identical
    to ulp, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    gmom = idx.agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("z"), 8).alias("mu"))
    xc = idx.crossJoin(F.broadcast(gmom)).select(
        F.round(F.col("z") - F.col("mu"), 8).alias("x"), "n"
    )
    mom = xc.agg(
        F.max("n").alias("n"),
        (F.sum(F.col("x") * F.col("x")) / F.max("n")).alias("m2"),
        (F.sum(F.col("x") * F.col("x") * F.col("x")) / F.max("n")).alias("m3"),
        (F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")) / F.max("n")).alias(
            "m4"
        ),
    )
    sk = mom.select(
        "n",
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))).alias("s"),
        (F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0).alias("k"),
    )
    jb = F.col("n") / 6.0 * (F.col("s") * F.col("s") + F.col("k") * F.col("k") / 4.0)
    return sk.select(
        F.col("n").cast("long").alias("n_months"),
        F.round(F.col("s"), 6).alias("skewness"),
        F.round(F.col("k"), 6).alias("excess_kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
        F.when(jb > CHI2_2_95, F.lit("non_normal")).otherwise(F.lit("normal")).alias(
            "verdict"
        ),
    )


# ---------------------------------------------------------------------------
# q_durbin_watson — serial correlation of trend-regression residuals
# ---------------------------------------------------------------------------

_DW_RESID_SQL = f"""
    {_MONTHLY_SQL},
    mom AS (
      SELECT count(*) AS n, sum(i * 1.0) AS si, sum(z) AS sz,
             sum(i * 1.0 * i) AS sii, sum(i * z) AS siz
      FROM idx
    ),
    fit AS (
      SELECT n,
             (n * siz - si * sz) / (n * sii - si * si) AS beta,
             (sz - (n * siz - si * sz) / (n * sii - si * si) * si) / n AS alpha
      FROM mom
    ),
    resid AS (
      SELECT idx.i, round(idx.z - fit.alpha - fit.beta * idx.i, 8) AS e, fit.n,
             round(fit.beta, 6) AS beta6
      FROM idx CROSS JOIN fit
    )"""


@query(
    "q_durbin_watson",
    oracle=f"""
    WITH {_DW_RESID_SQL},
    dw AS (
      SELECT max(a.n) AS n, max(a.beta6) AS beta6,
             sum(CASE WHEN b.e IS NOT NULL THEN (a.e - b.e) * (a.e - b.e) END)
               / sum(a.e * a.e) AS d
      FROM resid a LEFT JOIN resid b ON b.i = a.i - 1
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           beta6 AS beta_trend,
           round(d, 6) AS dw_stat,
           CASE WHEN d < 1.5 THEN 'positive_autocorr'
                WHEN d > 2.5 THEN 'negative_autocorr'
                ELSE 'none_detected' END AS verdict
    FROM dw
    """,
    tags=("stats", "timeseries"),
)
def durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation test on the residuals of the
    monthly-revenue-on-time OLS trend: d = Σ(eᵢ−eᵢ₋₁)²/Σeᵢ² ≈ 2(1−ρ̂₁)
    — the classic first regression diagnostic (d → 2 under independence;
    the 1.5/2.5 read is the standard quick-reference band for n ≈ 80,
    documented in place of the tabulated dL/dU bounds).

    Scale: monthly aggregate, one 5-moment fit, one residual pass, one
    broadcast lag equi-join — all calendar-bounded past the first scan.
    Residuals round at 8 before the squared-difference products; the
    ratio divides identical doubles, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    mom = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i") * 1.0).alias("si"),
        F.sum("z").alias("sz"),
        F.sum(F.col("i") * 1.0 * F.col("i")).alias("sii"),
        F.sum(F.col("i") * F.col("z")).alias("siz"),
    )
    beta = (F.col("n") * F.col("siz") - F.col("si") * F.col("sz")) / (
        F.col("n") * F.col("sii") - F.col("si") * F.col("si")
    )
    fit = mom.select(
        "n",
        beta.alias("beta"),
        ((F.col("sz") - beta * F.col("si")) / F.col("n")).alias("alpha"),
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "i",
        F.round(F.col("z") - F.col("alpha") - F.col("beta") * F.col("i"), 8).alias("e"),
        "n",
        F.round(F.col("beta"), 6).alias("beta6"),
    )
    lagged = resid.select("i", F.col("e").alias("ea"), "n", "beta6").join(
        F.broadcast(resid.select((F.col("i") + 1).alias("i"), F.col("e").alias("eb"))),
        "i",
        "left",
    )
    dw = lagged.agg(
        F.max("n").alias("n"),
        F.max("beta6").alias("beta6"),
        (
            F.sum(
                F.when(
                    F.col("eb").isNotNull(),
                    (F.col("ea") - F.col("eb")) * (F.col("ea") - F.col("eb")),
                )
            )
            / F.sum(F.col("ea") * F.col("ea"))
        ).alias("d"),
    )
    return dw.select(
        F.col("n").cast("long").alias("n_months"),
        F.col("beta6").alias("beta_trend"),
        F.round(F.col("d"), 6).alias("dw_stat"),
        F.when(F.col("d") < 1.5, F.lit("positive_autocorr"))
        .when(F.col("d") > 2.5, F.lit("negative_autocorr"))
        .otherwise(F.lit("none_detected"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_breusch_pagan — heteroskedasticity of the same trend regression
# ---------------------------------------------------------------------------


@query(
    "q_breusch_pagan",
    oracle=f"""
    WITH {_DW_RESID_SQL},
    aux AS (
      SELECT max(n) AS n,
             count(*) * sum(i * 1.0 * i) - sum(i * 1.0) * sum(i * 1.0) AS sii_c,
             count(*) * sum(i * (e * e)) - sum(i * 1.0) * sum(e * e) AS siy_c,
             count(*) * sum(e * e * e * e) - sum(e * e) * sum(e * e) AS syy_c
      FROM resid
    ),
    bp AS (
      SELECT n, (siy_c * siy_c) / (sii_c * syy_c) AS r2 FROM aux
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           round(r2, 6) AS aux_r2,
           round(n * r2, 6) AS bp_stat,
           CASE WHEN n * r2 > {CHI2_1_95} THEN 'heteroskedastic'
                ELSE 'homoskedastic' END AS verdict
    FROM bp
    """,
    tags=("stats", "timeseries"),
)
def breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan (Koenker studentized form) heteroskedasticity test:
    regress the squared trend residuals e² on time and report LM =
    n·R²_aux against chi-square(1) — whether revenue volatility itself
    trends, which decides between the OLS and the weighted/HAC variants
    (q_newey_west) for any inference on the trend slope.

    Scale: shares q_durbin_watson's residual machinery (monthly
    aggregate → 5-moment fit → residual pass); the auxiliary R² is one
    centered-moment closed form on a 1-row relation. Residuals round at
    8 before squaring, so e² is engine-identical; the R² ratio divides
    identical doubles, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    mom = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i") * 1.0).alias("si"),
        F.sum("z").alias("sz"),
        F.sum(F.col("i") * 1.0 * F.col("i")).alias("sii"),
        F.sum(F.col("i") * F.col("z")).alias("siz"),
    )
    beta = (F.col("n") * F.col("siz") - F.col("si") * F.col("sz")) / (
        F.col("n") * F.col("sii") - F.col("si") * F.col("si")
    )
    fit = mom.select(
        "n",
        beta.alias("beta"),
        ((F.col("sz") - beta * F.col("si")) / F.col("n")).alias("alpha"),
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "i",
        F.round(F.col("z") - F.col("alpha") - F.col("beta") * F.col("i"), 8).alias("e"),
        "n",
    )
    e2 = F.col("e") * F.col("e")
    aux = resid.agg(
        F.max("n").alias("n"),
        (
            F.count(F.lit(1)) * F.sum(F.col("i") * 1.0 * F.col("i"))
            - F.sum(F.col("i") * 1.0) * F.sum(F.col("i") * 1.0)
        ).alias("sii_c"),
        (
            F.count(F.lit(1)) * F.sum(F.col("i") * e2)
            - F.sum(F.col("i") * 1.0) * F.sum(e2)
        ).alias("siy_c"),
        (F.count(F.lit(1)) * F.sum(e2 * e2) - F.sum(e2) * F.sum(e2)).alias("syy_c"),
    )
    bp = aux.select(
        "n",
        ((F.col("siy_c") * F.col("siy_c")) / (F.col("sii_c") * F.col("syy_c"))).alias(
            "r2"
        ),
    )
    return bp.select(
        F.col("n").cast("long").alias("n_months"),
        F.round(F.col("r2"), 6).alias("aux_r2"),
        F.round(F.col("n") * F.col("r2"), 6).alias("bp_stat"),
        F.when(F.col("n") * F.col("r2") > CHI2_1_95, F.lit("heteroskedastic"))
        .otherwise(F.lit("homoskedastic"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_ljung_box — portmanteau whiteness test at lags 1..6
# ---------------------------------------------------------------------------

LB_LAGS = 6


@query(
    "q_ljung_box",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    gmom AS (SELECT count(*) AS n, round(avg(z), 8) AS mu FROM idx),
    xc AS (
      SELECT idx.i, round(idx.z - gmom.mu, 8) AS x, gmom.n
      FROM idx CROSS JOIN gmom
    ),
    g AS (
      SELECT max(a.n) AS n,
             sum(a.x * a.x) / max(a.n) AS g0,
             {", ".join(
                 f"sum(CASE WHEN b{k}.x IS NOT NULL THEN a.x * b{k}.x END)"
                 f" / max(a.n) AS g{k}" for k in range(1, LB_LAGS + 1)
             )}
      FROM xc a
      {" ".join(f"LEFT JOIN xc b{k} ON b{k}.i = a.i - {k}" for k in range(1, LB_LAGS + 1))}
    ),
    q AS (
      SELECT n,
             n * (n + 2.0) * (
               {" + ".join(f"(g{k} / g0) * (g{k} / g0) / (n - {k})" for k in range(1, LB_LAGS + 1))}
             ) AS q_stat,
             g1 / g0 AS r1
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           round(r1, 6) AS acf_1,
           round(q_stat, 6) AS q_stat,
           CAST({LB_LAGS} AS BIGINT) AS df,
           CASE WHEN q_stat > {CHI2_6_95} THEN 'autocorrelated'
                ELSE 'white_noise' END AS verdict
    FROM q
    """,
    tags=("stats", "timeseries"),
)
def ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on monthly revenue: Q = n(n+2)·
    Σₖ r²ₖ/(n−k) over lags 1..6 against chi-square(6) — the joint
    whiteness test that complements the per-lag reads (q_autocorrelation
    gives the r_k; q_pacf separates direct effects; this answers "is
    there ANY linear structure at all" with one number.

    Scale: monthly aggregate, six broadcast lag equi-joins on the dense
    month index, one moment aggregate, closed form — calendar-bounded.
    Deviations round at 8; autocovariances share the fixed divisor n so
    each r_k is engine-identical to ulp, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    gmom = idx.agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("z"), 8).alias("mu"))
    xc = idx.crossJoin(F.broadcast(gmom)).select(
        "i", F.round(F.col("z") - F.col("mu"), 8).alias("x"), "n"
    )
    a = _with_lags(xc, LB_LAGS, col="x")
    a = a.join(F.broadcast(xc.select("i", "n")), "i")
    aggs = [
        F.max("n").alias("n"),
        (F.sum(F.col("z0") * F.col("z0")) / F.max("n")).alias("g0"),
    ]
    for k in range(1, LB_LAGS + 1):
        aggs.append((F.sum(F.col("z0") * F.col(f"zl{k}")) / F.max("n")).alias(f"g{k}"))
    g = a.agg(*aggs)
    qsum = None
    for k in range(1, LB_LAGS + 1):
        rk2 = (F.col(f"g{k}") / F.col("g0")) * (F.col(f"g{k}") / F.col("g0"))
        term = rk2 / (F.col("n") - k)
        qsum = term if qsum is None else qsum + term
    q = g.select(
        "n",
        (F.col("n") * (F.col("n") + 2.0) * qsum).alias("q_stat"),
        (F.col("g1") / F.col("g0")).alias("r1"),
    )
    return q.select(
        F.col("n").cast("long").alias("n_months"),
        F.round(F.col("r1"), 6).alias("acf_1"),
        F.round(F.col("q_stat"), 6).alias("q_stat"),
        F.lit(LB_LAGS).cast("long").alias("df"),
        F.when(F.col("q_stat") > CHI2_6_95, F.lit("autocorrelated"))
        .otherwise(F.lit("white_noise"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_adf_test — Dickey-Fuller unit-root test (constant, no augmentation)
# ---------------------------------------------------------------------------


@query(
    "q_adf_test",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    d AS (
      SELECT a.i, b.z AS x, round(a.z - b.z, 6) AS dy
      FROM idx a JOIN idx b ON b.i = a.i - 1
    ),
    mm AS (
      SELECT count(*) AS nd, sum(x) AS sx, sum(dy) AS sy,
             sum(x * x) AS sxx, sum(x * dy) AS sxy, sum(dy * dy) AS syy
      FROM d
    ),
    c AS (
      SELECT nd,
             nd * sxx - sx * sx AS sxx_c,
             nd * sxy - sx * sy AS sxy_c,
             nd * syy - sy * sy AS syy_c,
             sx, sy
      FROM mm
    ),
    fit AS (
      SELECT nd, sxy_c / sxx_c AS gamma,
             (syy_c - (sxy_c / sxx_c) * sxy_c) / nd AS ssr,
             sxx_c / nd AS sxx_dev
      FROM c
    )
    SELECT CAST(nd AS BIGINT) AS n_obs,
           round(gamma, 6) AS gamma,
           round(gamma / sqrt((ssr / (nd - 2)) / sxx_dev), 6) AS t_stat,
           CASE WHEN gamma / sqrt((ssr / (nd - 2)) / sxx_dev) < {ADF_CRIT_5}
                THEN 'stationary' ELSE 'unit_root' END AS verdict
    FROM fit
    """,
    tags=("stats", "timeseries", "finance"),
)
def adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test on monthly revenue (constant, zero
    augmentation lags — the DF special case of the ADF family): regress
    Δzᵢ on zᵢ₋₁, report γ̂ and its t-statistic against the tau-mu 5%
    critical value −2.89 — the stationarity gate every ARMA-style
    modeling step (q_pacf's order selection, q_holt_smoothing's level
    assumption) implicitly depends on.

    Scale: monthly aggregate, one broadcast lag equi-join, one 6-moment
    aggregate, closed-form OLS slope + standard error — all
    calendar-bounded. Δz is a difference of 6-dp values (exact); the
    centered moments, SSR and t are one expression shape of identical
    doubles on both engines, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    d = (
        idx.select("i", F.col("z").alias("za"))
        .join(
            F.broadcast(idx.select((F.col("i") + 1).alias("i"), F.col("z").alias("x"))),
            "i",
        )
        .select("i", "x", F.round(F.col("za") - F.col("x"), 6).alias("dy"))
    )
    m = d.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("x").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    c = m.select(
        "nd",
        (F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("sxx_c"),
        (F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("sxy_c"),
        (F.col("nd") * F.col("syy") - F.col("sy") * F.col("sy")).alias("syy_c"),
    )
    gamma = F.col("sxy_c") / F.col("sxx_c")
    fit = c.select(
        "nd",
        gamma.alias("gamma"),
        ((F.col("syy_c") - gamma * F.col("sxy_c")) / F.col("nd")).alias("ssr"),
        (F.col("sxx_c") / F.col("nd")).alias("sxx_dev"),
    )
    t = F.col("gamma") / F.sqrt(
        (F.col("ssr") / (F.col("nd") - 2)) / F.col("sxx_dev")
    )
    return fit.select(
        F.col("nd").cast("long").alias("n_obs"),
        F.round(F.col("gamma"), 6).alias("gamma"),
        F.round(t, 6).alias("t_stat"),
        F.when(t < ADF_CRIT_5, F.lit("stationary"))
        .otherwise(F.lit("unit_root"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_variance_ratio — Lo-MacKinlay random-walk test at horizon q=4
# ---------------------------------------------------------------------------

VR_Q = 4

_RET_SQL = """
    r AS (
      SELECT a.i, round(a.z - b.z, 6) AS r
      FROM idx a JOIN idx b ON b.i = a.i - 1
    ),
    rmom AS (SELECT count(*) AS nr, round(avg(r), 8) AS mu FROM r)
"""


@query(
    "q_variance_ratio",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    {_RET_SQL},
    v1 AS (
      SELECT sum((r.r - rmom.mu) * (r.r - rmom.mu)) / (max(rmom.nr) - 1) AS var1,
             max(rmom.nr) AS nr, max(rmom.mu) AS mu
      FROM r CROSS JOIN rmom
    ),
    s4 AS (
      SELECT a.i, a.r + b1.r + b2.r + b3.r AS s
      FROM r a
      JOIN r b1 ON b1.i = a.i + 1
      JOIN r b2 ON b2.i = a.i + 2
      JOIN r b3 ON b3.i = a.i + 3
    ),
    v4 AS (
      SELECT sum((s4.s - {VR_Q} * v1.mu) * (s4.s - {VR_Q} * v1.mu))
               / (count(*) - 1) AS var4,
             max(v1.var1) AS var1, max(v1.nr) AS nr
      FROM s4 CROSS JOIN v1
    ),
    vr AS (
      SELECT nr, var4 / ({VR_Q} * var1) AS vr FROM v4
    )
    SELECT CAST(nr AS BIGINT) AS n_obs,
           round(vr, 6) AS vr_4,
           round(sqrt(nr) * (vr - 1.0)
                 / sqrt(2.0 * (2 * {VR_Q} - 1) * ({VR_Q} - 1) / (3.0 * {VR_Q})), 6)
             AS z_stat,
           CASE WHEN sqrt(nr) * (vr - 1.0)
                     / sqrt(2.0 * (2 * {VR_Q} - 1) * ({VR_Q} - 1) / (3.0 * {VR_Q}))
                     < -{Z95} THEN 'mean_reverting'
                WHEN sqrt(nr) * (vr - 1.0)
                     / sqrt(2.0 * (2 * {VR_Q} - 1) * ({VR_Q} - 1) / (3.0 * {VR_Q}))
                     > {Z95} THEN 'trending'
                ELSE 'random_walk' END AS verdict
    FROM vr
    """,
    tags=("stats", "timeseries", "finance"),
)
def variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test at horizon q=4 on monthly revenue
    changes: VR(4) = Var(4-month overlapping sums)/(4·Var(1-month)) with
    the homoskedastic asymptotic z = sqrt(n)(VR−1)/sqrt(2(2q−1)(q−1)/3q)
    — VR < 1 flags mean reversion, VR > 1 momentum; the finance-native
    complement to q_adf_test (which tests the unit root itself, not the
    horizon-scaling of variance).

    Scale: monthly aggregate → O(calendar) return series; the 4-sums are
    three broadcast lag equi-joins on the dense index; two variance
    aggregates, closed forms. Returns are differences of 6-dp values
    (exact); sums of four such are exact; both variance estimators share
    expression shape, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    r = (
        idx.select("i", F.col("z").alias("za"))
        .join(
            F.broadcast(
                idx.select((F.col("i") + 1).alias("i"), F.col("z").alias("zb"))
            ),
            "i",
        )
        .select("i", F.round(F.col("za") - F.col("zb"), 6).alias("r"))
    )
    rmom = r.agg(F.count(F.lit(1)).alias("nr"), F.round(F.avg("r"), 8).alias("mu"))
    v1 = r.crossJoin(F.broadcast(rmom)).agg(
        (
            F.sum((F.col("r") - F.col("mu")) * (F.col("r") - F.col("mu")))
            / (F.max("nr") - 1)
        ).alias("var1"),
        F.max("nr").alias("nr"),
        F.max("mu").alias("mu"),
    )
    s4 = r.select("i", F.col("r").alias("r0"))
    for k in (1, 2, 3):
        s4 = s4.join(
            F.broadcast(r.select((F.col("i") - k).alias("i"), F.col("r").alias(f"r{k}"))),
            "i",
        )
    s4 = s4.select(
        "i", (F.col("r0") + F.col("r1") + F.col("r2") + F.col("r3")).alias("s")
    )
    v4 = s4.crossJoin(F.broadcast(v1)).agg(
        (
            F.sum((F.col("s") - VR_Q * F.col("mu")) * (F.col("s") - VR_Q * F.col("mu")))
            / (F.count(F.lit(1)) - 1)
        ).alias("var4"),
        F.max("var1").alias("var1"),
        F.max("nr").alias("nr"),
    )
    vr = v4.select("nr", (F.col("var4") / (VR_Q * F.col("var1"))).alias("vr"))
    denom = (2.0 * (2 * VR_Q - 1) * (VR_Q - 1) / (3.0 * VR_Q)) ** 0.5
    z = F.sqrt(F.col("nr").cast("double")) * (F.col("vr") - 1.0) / denom
    return vr.select(
        F.col("nr").cast("long").alias("n_obs"),
        F.round(F.col("vr"), 6).alias("vr_4"),
        F.round(z, 6).alias("z_stat"),
        F.when(z < -Z95, F.lit("mean_reverting"))
        .when(z > Z95, F.lit("trending"))
        .otherwise(F.lit("random_walk"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_newey_west — HAC-robust t on the mean monthly revenue change
# ---------------------------------------------------------------------------

NW_LAGS = 3


@query(
    "q_newey_west",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    {_RET_SQL},
    xc AS (
      SELECT r.i, round(r.r - rmom.mu, 8) AS x, rmom.nr, rmom.mu
      FROM r CROSS JOIN rmom
    ),
    g AS (
      SELECT max(a.nr) AS nr, max(a.mu) AS mu,
             sum(a.x * a.x) / max(a.nr) AS g0,
             sum(CASE WHEN b1.x IS NOT NULL THEN a.x * b1.x END) / max(a.nr) AS g1,
             sum(CASE WHEN b2.x IS NOT NULL THEN a.x * b2.x END) / max(a.nr) AS g2,
             sum(CASE WHEN b3.x IS NOT NULL THEN a.x * b3.x END) / max(a.nr) AS g3
      FROM xc a
      LEFT JOIN xc b1 ON b1.i = a.i - 1
      LEFT JOIN xc b2 ON b2.i = a.i - 2
      LEFT JOIN xc b3 ON b3.i = a.i - 3
    ),
    lrv AS (
      SELECT nr, mu, g0,
             g0 + 2 * (0.75 * g1 + 0.5 * g2 + 0.25 * g3) AS s2_hac
      FROM g
    )
    SELECT CAST(nr AS BIGINT) AS n_obs,
           round(mu, 6) AS mean_change,
           round(sqrt(g0 / nr), 6) AS se_iid,
           round(sqrt(s2_hac / nr), 6) AS se_hac,
           round(mu / sqrt(s2_hac / nr), 6) AS t_hac,
           CASE WHEN abs(mu / sqrt(s2_hac / nr)) > {Z95}
                THEN 'nonzero_drift' ELSE 'no_drift' END AS verdict
    FROM lrv
    """,
    tags=("stats", "timeseries", "finance"),
)
def newey_west(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West HAC standard error for the mean monthly revenue change:
    long-run variance = γ₀ + 2·Σₖ(1−k/(L+1))·γₖ with Bartlett weights at
    L=3, reported beside the iid standard error — the autocorrelation-
    and heteroskedasticity-robust inference that q_durbin_watson /
    q_breusch_pagan motivate when they reject (both diagnose; this
    corrects).

    Scale: monthly aggregate → return series; three broadcast lag
    equi-joins, one moment aggregate, closed forms — calendar-bounded.
    Demeaned returns round at 8; autocovariances share the fixed divisor
    n so the Bartlett sum is engine-identical to ulp, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    r = (
        idx.select("i", F.col("z").alias("za"))
        .join(
            F.broadcast(
                idx.select((F.col("i") + 1).alias("i"), F.col("z").alias("zb"))
            ),
            "i",
        )
        .select("i", F.round(F.col("za") - F.col("zb"), 6).alias("r"))
    )
    rmom = r.agg(F.count(F.lit(1)).alias("nr"), F.round(F.avg("r"), 8).alias("mu"))
    xc = r.crossJoin(F.broadcast(rmom)).select(
        "i", F.round(F.col("r") - F.col("mu"), 8).alias("x"), "nr", "mu"
    )
    a = _with_lags(xc, NW_LAGS, col="x").join(F.broadcast(xc.select("i", "nr", "mu")), "i")
    g = a.agg(
        F.max("nr").alias("nr"),
        F.max("mu").alias("mu"),
        (F.sum(F.col("z0") * F.col("z0")) / F.max("nr")).alias("g0"),
        (F.sum(F.col("z0") * F.col("zl1")) / F.max("nr")).alias("g1"),
        (F.sum(F.col("z0") * F.col("zl2")) / F.max("nr")).alias("g2"),
        (F.sum(F.col("z0") * F.col("zl3")) / F.max("nr")).alias("g3"),
    )
    lrv = g.select(
        "nr",
        "mu",
        "g0",
        (
            F.col("g0")
            + 2 * (0.75 * F.col("g1") + 0.5 * F.col("g2") + 0.25 * F.col("g3"))
        ).alias("s2_hac"),
    )
    t = F.col("mu") / F.sqrt(F.col("s2_hac") / F.col("nr"))
    return lrv.select(
        F.col("nr").cast("long").alias("n_obs"),
        F.round(F.col("mu"), 6).alias("mean_change"),
        F.round(F.sqrt(F.col("g0") / F.col("nr")), 6).alias("se_iid"),
        F.round(F.sqrt(F.col("s2_hac") / F.col("nr")), 6).alias("se_hac"),
        F.round(t, 6).alias("t_hac"),
        F.when(F.abs(t) > Z95, F.lit("nonzero_drift"))
        .otherwise(F.lit("no_drift"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_runs_test — Wald-Wolfowitz randomness of revenue-change signs
# ---------------------------------------------------------------------------


@query(
    "q_runs_test",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    {_RET_SQL},
    s AS (
      SELECT r.i, CASE WHEN r.r > rmom.mu THEN 1 ELSE 0 END AS pos, rmom.nr
      FROM r CROSS JOIN rmom
    ),
    counts AS (
      SELECT max(nr) AS n, sum(pos) AS n1, max(nr) - sum(pos) AS n2 FROM s
    ),
    runs AS (
      SELECT 1 + sum(CASE WHEN b.pos IS NOT NULL AND a.pos <> b.pos THEN 1 ELSE 0 END)
               AS rn
      FROM s a LEFT JOIN s b ON b.i = a.i - 1
    ),
    stat AS (
      SELECT c.n, c.n1, c.n2, runs.rn,
             1.0 + 2.0 * c.n1 * c.n2 / c.n AS er,
             2.0 * c.n1 * c.n2 * (2.0 * c.n1 * c.n2 - c.n)
               / (c.n * 1.0 * c.n * (c.n - 1)) AS vr
      FROM counts c CROSS JOIN runs
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(rn AS BIGINT) AS runs,
           round(er, 6) AS expected_runs,
           round((rn - er) / sqrt(vr), 6) AS z_stat,
           CASE WHEN (rn - er) / sqrt(vr) < -{Z95} THEN 'clustered'
                WHEN (rn - er) / sqrt(vr) > {Z95} THEN 'alternating'
                ELSE 'random' END AS verdict
    FROM stat
    """,
    tags=("stats", "timeseries"),
)
def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the signs of monthly revenue changes
    (above/below their mean): observed runs R vs E[R] = 1 + 2n₁n₂/n and
    the normal approximation — the distribution-free randomness check
    that catches sign clustering (momentum) or strict alternation
    (overdifferencing) that variance-based tests can miss.

    Scale: monthly aggregate → return series → one broadcast
    consecutive-index equi-join + two tiny aggregates — calendar-bounded.
    Signs are exact integer comparisons of 6-dp values against the 8-dp
    mean; everything downstream is integer arithmetic and one closed
    form, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    r = (
        idx.select("i", F.col("z").alias("za"))
        .join(
            F.broadcast(
                idx.select((F.col("i") + 1).alias("i"), F.col("z").alias("zb"))
            ),
            "i",
        )
        .select("i", F.round(F.col("za") - F.col("zb"), 6).alias("r"))
    )
    rmom = r.agg(F.count(F.lit(1)).alias("nr"), F.round(F.avg("r"), 8).alias("mu"))
    s = r.crossJoin(F.broadcast(rmom)).select(
        "i", F.when(F.col("r") > F.col("mu"), 1).otherwise(0).alias("pos"), "nr"
    )
    counts = s.agg(
        F.max("nr").alias("n"),
        F.sum("pos").alias("n1"),
        (F.max("nr") - F.sum("pos")).alias("n2"),
    )
    runs = (
        s.select("i", F.col("pos").alias("pa"))
        .join(
            F.broadcast(s.select((F.col("i") + 1).alias("i"), F.col("pos").alias("pb"))),
            "i",
            "left",
        )
        .agg(
            (
                1
                + F.sum(
                    F.when(
                        F.col("pb").isNotNull() & (F.col("pa") != F.col("pb")), 1
                    ).otherwise(0)
                )
            ).alias("rn")
        )
    )
    stat = counts.crossJoin(F.broadcast(runs)).select(
        "n",
        "n1",
        "n2",
        "rn",
        (1.0 + 2.0 * F.col("n1") * F.col("n2") / F.col("n")).alias("er"),
        (
            2.0
            * F.col("n1")
            * F.col("n2")
            * (2.0 * F.col("n1") * F.col("n2") - F.col("n"))
            / (F.col("n") * 1.0 * F.col("n") * (F.col("n") - 1))
        ).alias("vr"),
    )
    z = (F.col("rn") - F.col("er")) / F.sqrt(F.col("vr"))
    return stat.select(
        F.col("n").cast("long").alias("n_obs"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        F.col("rn").cast("long").alias("runs"),
        F.round(F.col("er"), 6).alias("expected_runs"),
        F.round(z, 6).alias("z_stat"),
        F.when(z < -Z95, F.lit("clustered"))
        .when(z > Z95, F.lit("alternating"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_chow_test — structural break in the revenue trend at the sample midpoint
# ---------------------------------------------------------------------------

F_2_CRIT_5 = 3.117  # F(2, ~76) 5% — the fixed 80-month calendar's df


@query(
    "q_chow_test",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    half AS (
      SELECT idx.i, idx.z,
             CASE WHEN idx.i <= (SELECT count(*) / 2 FROM idx) THEN 1 ELSE 2 END AS h
      FROM idx
    ),
    gm AS (
      SELECT h, count(*) AS n, sum(i * 1.0) AS si, sum(z) AS sz,
             sum(i * 1.0 * i) AS sii, sum(i * z) AS siz,
             sum(z * z) AS szz
      FROM half GROUP BY h
    ),
    gssr AS (
      SELECT h, n,
             ((n * szz - sz * sz)
              - ((n * siz - si * sz) / (n * sii - si * si)) * (n * siz - si * sz)) / n
               AS ssr
      FROM gm
    ),
    pooled AS (
      SELECT count(*) AS n, sum(i * 1.0) AS si, sum(z) AS sz,
             sum(i * 1.0 * i) AS sii, sum(i * z) AS siz, sum(z * z) AS szz
      FROM half
    ),
    pssr AS (
      SELECT n,
             ((n * szz - sz * sz)
              - ((n * siz - si * sz) / (n * sii - si * si)) * (n * siz - si * sz)) / n
               AS ssr
      FROM pooled
    ),
    stat AS (
      SELECT pssr.n,
             pssr.ssr AS ssr_pooled,
             (SELECT sum(ssr) FROM gssr) AS ssr_split,
             ((pssr.ssr - (SELECT sum(ssr) FROM gssr)) / 2.0)
               / (((SELECT sum(ssr) FROM gssr)) / (pssr.n - 4)) AS f
      FROM pssr
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           round(ssr_pooled, 6) AS ssr_pooled,
           round(ssr_split, 6) AS ssr_split,
           round(f, 6) AS f_stat,
           CASE WHEN f > {F_2_CRIT_5} THEN 'structural_break'
                ELSE 'stable' END AS verdict
    FROM stat
    """,
    tags=("stats", "timeseries"),
)
def chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow test for a structural break in the monthly-revenue trend at
    the sample midpoint: F = [(SSR_pooled − ΣSSR_half)/k] /
    [ΣSSR_half/(n−2k)] with k = 2 (intercept + slope) against F(2,
    n−4) — the TEST companion to the monitoring detectors
    (q_cusum_changepoint and q_page_hinkley flag when a break happens;
    this says whether the two regimes' trend lines differ significantly
    at a known split).

    Scale: monthly aggregate, then per-half and pooled 6-moment
    aggregates with the same closed-form SSR shape as q_adf_test —
    calendar-bounded. One expression shape both engines, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    nn = idx.agg((F.count(F.lit(1)) / 2).alias("half_n"))
    half = idx.crossJoin(F.broadcast(nn)).select(
        "i", "z", F.when(F.col("i") <= F.col("half_n"), 1).otherwise(2).alias("h")
    )

    def ssr_of(df: DataFrame, keys: list[str]) -> DataFrame:
        g = (df.groupBy(*keys) if keys else df).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("i") * 1.0).alias("si"),
            F.sum("z").alias("sz"),
            F.sum(F.col("i") * 1.0 * F.col("i")).alias("sii"),
            F.sum(F.col("i") * F.col("z")).alias("siz"),
            F.sum(F.col("z") * F.col("z")).alias("szz"),
        )
        siz_c = F.col("n") * F.col("siz") - F.col("si") * F.col("sz")
        szz_c = F.col("n") * F.col("szz") - F.col("sz") * F.col("sz")
        sii_c = F.col("n") * F.col("sii") - F.col("si") * F.col("si")
        return g.select(
            *keys,
            "n",
            ((szz_c - (siz_c / sii_c) * siz_c) / F.col("n")).alias("ssr"),
        )

    gssr = ssr_of(half, ["h"]).agg(F.sum("ssr").alias("ssr_split"))
    pssr = ssr_of(half, [])
    stat = pssr.crossJoin(F.broadcast(gssr)).select(
        "n",
        F.col("ssr").alias("ssr_pooled"),
        "ssr_split",
        (
            ((F.col("ssr") - F.col("ssr_split")) / 2.0)
            / (F.col("ssr_split") / (F.col("n") - 4))
        ).alias("f"),
    )
    return stat.select(
        F.col("n").cast("long").alias("n_months"),
        F.round(F.col("ssr_pooled"), 6).alias("ssr_pooled"),
        F.round(F.col("ssr_split"), 6).alias("ssr_split"),
        F.round(F.col("f"), 6).alias("f_stat"),
        F.when(F.col("f") > F_2_CRIT_5, F.lit("structural_break"))
        .otherwise(F.lit("stable"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_arch_lm — ARCH effects (volatility clustering) in revenue changes
# ---------------------------------------------------------------------------


@query(
    "q_arch_lm",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    {_RET_SQL},
    e2 AS (
      SELECT r.i, round((r.r - rmom.mu) * (r.r - rmom.mu), 8) AS e2
      FROM r CROSS JOIN rmom
    ),
    d AS (
      SELECT a.i, a.e2 AS y, b.e2 AS x
      FROM e2 a JOIN e2 b ON b.i = a.i - 1
    ),
    mm AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM d
    ),
    r2 AS (
      SELECT n,
             ((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      FROM mm
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(r2, 6) AS aux_r2,
           round(n * r2, 6) AS lm_stat,
           CASE WHEN n * r2 > {CHI2_1_95} THEN 'arch_effects'
                ELSE 'no_arch' END AS verdict
    FROM r2
    """,
    tags=("stats", "timeseries", "finance"),
)
def arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH-LM test at lag 1 on monthly revenue changes: regress
    the squared demeaned change e²ₜ on e²ₜ₋₁ and report LM = n·R²
    against chi-square(1) — the volatility-CLUSTERING test that
    q_breusch_pagan (trend heteroskedasticity) and q_ljung_box (mean
    autocorrelation) don't cover, and the standard gate before fitting
    any GARCH-family volatility model.

    Scale: monthly aggregate → return series → one squared-deviation
    pass, one broadcast lag equi-join, one 6-moment aggregate, closed
    forms — calendar-bounded. e² rounds at 8 before the regression so
    both engines see identical inputs, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    r = (
        idx.select("i", F.col("z").alias("za"))
        .join(
            F.broadcast(
                idx.select((F.col("i") + 1).alias("i"), F.col("z").alias("zb"))
            ),
            "i",
        )
        .select("i", F.round(F.col("za") - F.col("zb"), 6).alias("r"))
    )
    rmom = r.agg(F.count(F.lit(1)).alias("nr"), F.round(F.avg("r"), 8).alias("mu"))
    e2 = r.crossJoin(F.broadcast(rmom)).select(
        "i",
        F.round((F.col("r") - F.col("mu")) * (F.col("r") - F.col("mu")), 8).alias("e2"),
    )
    d = e2.select("i", F.col("e2").alias("y")).join(
        F.broadcast(e2.select((F.col("i") + 1).alias("i"), F.col("e2").alias("x"))),
        "i",
    )
    mm = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    sxy_c = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r2 = mm.select(
        "n",
        (
            (sxy_c * sxy_c)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("r2"),
    )
    return r2.select(
        F.col("n").cast("long").alias("n_obs"),
        F.round(F.col("r2"), 6).alias("aux_r2"),
        F.round(F.col("n") * F.col("r2"), 6).alias("lm_stat"),
        F.when(F.col("n") * F.col("r2") > CHI2_1_95, F.lit("arch_effects"))
        .otherwise(F.lit("no_arch"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_panel_within_estimator — two-way fixed effects by double demeaning
# ---------------------------------------------------------------------------


@query(
    "q_panel_within_estimator",
    oracle="""
    WITH panel AS (
      SELECT c.c_nationkey AS nk,
             CAST(year(o.o_orderdate) AS BIGINT) * 12 + month(o.o_orderdate) AS mi,
             round(sum(CAST(round((o.o_totalprice) * 100) AS BIGINT))
                   / 100e0 / 1000.0, 6) AS y,
             CAST(count(*) AS BIGINT) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY nk, mi
    ),
    nmean AS (SELECT nk, avg(y) AS ybar_n, avg(x) AS xbar_n FROM panel GROUP BY nk),
    mmean AS (SELECT mi, avg(y) AS ybar_m, avg(x) AS xbar_m FROM panel GROUP BY mi),
    gmean AS (SELECT avg(y) AS ybar, avg(x) AS xbar FROM panel),
    within AS (
      SELECT round(p.y - n.ybar_n - m.ybar_m + g.ybar, 8) AS yt,
             round(p.x - n.xbar_n - m.xbar_m + g.xbar, 8) AS xt,
             p.y, p.x
      FROM panel p
      JOIN nmean n ON n.nk = p.nk
      JOIN mmean m ON m.mi = p.mi
      CROSS JOIN gmean g
    ),
    fit AS (
      SELECT count(*) AS n,
             sum(xt * yt) / sum(xt * xt) AS beta_fe,
             (count(*) * sum(x * y) - sum(x) * sum(y))
               / (count(*) * sum(x * x) - sum(x) * sum(x)) AS beta_pooled
      FROM within
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(beta_pooled, 6) AS beta_pooled,
           round(beta_fe, 6) AS beta_fixed_effects,
           round(beta_pooled - beta_fe, 6) AS confound_gap
    FROM fit
    """,
    tags=("stats", "analytics", "timeseries"),
)
def panel_within_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way fixed-effects (within) estimator on the nation × month
    revenue panel: double-demean y (monthly revenue) and x (order
    count) by nation means, month means, plus the grand mean, then
    β_FE = Σx̃ỹ/Σx̃² — the panel-econometrics workhorse that sweeps out
    every time-invariant nation effect and every nation-invariant month
    shock, reported against the pooled OLS slope; the confound gap IS
    the bias those fixed effects were absorbing. (q_diff_in_diff is the
    2×2 special case; this is the full-panel generalization.)

    Scale: one fact-dim aggregate to the O(nations × calendar) panel,
    two group-mean joins + a broadcast grand mean, one moment pass —
    panel-bounded. Demeaned values round at 8; the within slope is a
    ratio of identical sums, rounded at 6."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    panel = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).alias(
                "mi"
            ),
        )
        .agg(
            F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100e0 / 1000.0, 6).alias("y"),
            F.count(F.lit(1)).cast("long").alias("x"),
        )
    )
    nmean = panel.groupBy("nk").agg(
        F.avg("y").alias("ybar_n"), F.avg("x").alias("xbar_n")
    )
    mmean = panel.groupBy("mi").agg(
        F.avg("y").alias("ybar_m"), F.avg("x").alias("xbar_m")
    )
    gmean = panel.agg(F.avg("y").alias("ybar"), F.avg("x").alias("xbar"))
    within = (
        panel.join(F.broadcast(nmean), "nk")
        .join(F.broadcast(mmean), "mi")
        .crossJoin(F.broadcast(gmean))
        .select(
            F.round(
                F.col("y") - F.col("ybar_n") - F.col("ybar_m") + F.col("ybar"), 8
            ).alias("yt"),
            F.round(
                F.col("x") - F.col("xbar_n") - F.col("xbar_m") + F.col("xbar"), 8
            ).alias("xt"),
            "y",
            "x",
        )
    )
    fit = within.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("xt") * F.col("yt")) / F.sum(F.col("xt") * F.col("xt"))).alias(
            "beta_fe"
        ),
        (
            (F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            )
        ).alias("beta_pooled"),
    )
    return fit.select(
        F.col("n").cast("long").alias("n_obs"),
        F.round(F.col("beta_pooled"), 6).alias("beta_pooled"),
        F.round(F.col("beta_fe"), 6).alias("beta_fixed_effects"),
        F.round(F.col("beta_pooled") - F.col("beta_fe"), 6).alias("confound_gap"),
    )


# ---------------------------------------------------------------------------
# q_vif — multicollinearity check for the two-factor price regression
# ---------------------------------------------------------------------------


@query(
    "q_vif",
    oracle="""
    WITH obs AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_discount * 10000) AS BIGINT) AS x2
      FROM lineitem
    ),
    mm AS (
      SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12
      FROM obs
    ),
    r AS (
      SELECT n,
             (n * 1e0 * s12 - s1 * 1e0 * s2) * (n * 1e0 * s12 - s1 * 1e0 * s2)
               / ((n * 1e0 * s11 - s1 * 1e0 * s1)
                  * (n * 1e0 * s22 - s2 * 1e0 * s2)) AS r2
      FROM mm
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(r2, 6) AS r2_between_regressors,
           round(1.0 / (1.0 - r2), 6) AS vif,
           1.0 / (1.0 - r2) > 5.0 AS collinearity_concern
    FROM r
    """,
    tags=("stats", "ml"),
)
def vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factor for q_ols_two_factor's regressors
    (quantity, discount basis points): VIF = 1/(1−R²) of one regressor
    on the other — the multicollinearity diagnostic that says how much
    the betas' variance is inflated by regressor overlap (VIF > 5 is
    the standard concern flag; with two regressors the auxiliary R² is
    just their squared correlation, so the whole check is one moment
    pass over exact integers).

    Scale: one map-side-combinable 6-moment aggregate; centered
    products in double with identical expression shape (the
    q_ols_two_factor int64-overflow posture). Rounded at 6."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x2"),
    )
    mm = obs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
    )
    num = F.col("n") * 1.0 * F.col("s12") - F.col("s1") * 1.0 * F.col("s2")
    r2 = (
        num
        * num
        / (
            (F.col("n") * 1.0 * F.col("s11") - F.col("s1") * 1.0 * F.col("s1"))
            * (F.col("n") * 1.0 * F.col("s22") - F.col("s2") * 1.0 * F.col("s2"))
        )
    )
    r = mm.select("n", r2.alias("r2"))
    return r.select(
        F.col("n").cast("long").alias("n_obs"),
        F.round(F.col("r2"), 6).alias("r2_between_regressors"),
        F.round(1.0 / (1.0 - F.col("r2")), 6).alias("vif"),
        (1.0 / (1.0 - F.col("r2")) > 5.0).alias("collinearity_concern"),
    )


# ---------------------------------------------------------------------------
# q_influence_diagnostics — leverage and Cook's D on the trend regression
# ---------------------------------------------------------------------------


@query(
    "q_influence_diagnostics",
    oracle=f"""
    WITH {_DW_RESID_SQL},
    sxx AS (
      SELECT count(*) AS n, avg(i * 1.0) AS ibar,
             sum(i * 1.0 * i) - count(*) * avg(i * 1.0) * avg(i * 1.0) AS sxx_c,
             sum(e * e) AS sse
      FROM resid
    ),
    diag AS (
      SELECT resid.i, resid.e,
             1.0 / sxx.n + (resid.i - sxx.ibar) * (resid.i - sxx.ibar) / sxx.sxx_c
               AS h,
             sxx.sse / (sxx.n - 2) AS mse, sxx.n
      FROM resid CROSS JOIN sxx
    ),
    cooks AS (
      SELECT idx.mi, diag.e, diag.h,
             round(diag.e * diag.e / (2.0 * diag.mse) * diag.h
                   / ((1.0 - diag.h) * (1.0 - diag.h)), 8) AS d,
             diag.n
      FROM diag JOIN idx ON idx.i = diag.i
    )
    SELECT CAST(mi AS BIGINT) AS mi,
           round(e, 6) AS residual,
           round(h, 6) AS leverage,
           round(d, 6) AS cooks_d,
           d > 4.0 / n AS influential
    FROM cooks
    ORDER BY d DESC, mi LIMIT 10
    """,
    tags=("stats", "timeseries", "quality"),
)
def influence_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influence diagnostics on the monthly-revenue trend regression:
    leverage hᵢ = 1/n + (xᵢ−x̄)²/Sxx and Cook's distance Dᵢ =
    eᵢ²hᵢ/(p·MSE·(1−hᵢ)²) per month, top-10 by D with the 4/n flag —
    WHICH observations the fitted trend actually hinges on (endpoint
    months carry the leverage; spike months carry the residual;
    Cook's D is their product, and q_grubbs_test's outlier is only
    influential if it also has leverage).

    Scale: shares q_durbin_watson's residual machinery + one closed
    form per month + top-10 TakeOrdered on 8-dp-rounded D with month
    tie-break — calendar-bounded. Rounded at 6."""
    idx = _monthly(spark, sf_dir)
    mom = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i") * 1.0).alias("si"),
        F.sum("z").alias("sz"),
        F.sum(F.col("i") * 1.0 * F.col("i")).alias("sii"),
        F.sum(F.col("i") * F.col("z")).alias("siz"),
    )
    beta = (F.col("n") * F.col("siz") - F.col("si") * F.col("sz")) / (
        F.col("n") * F.col("sii") - F.col("si") * F.col("si")
    )
    fit = mom.select(
        "n",
        beta.alias("beta"),
        ((F.col("sz") - beta * F.col("si")) / F.col("n")).alias("alpha"),
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "mi",
        "i",
        F.round(F.col("z") - F.col("alpha") - F.col("beta") * F.col("i"), 8).alias("e"),
    )
    # 80-row relation branched 3 ways (count, moments, per-row diag) — one
    # materialization instead of three re-runs of the orders scan
    resid = resid.localCheckpoint(eager=True)
    sxx = resid.crossJoin(
        F.broadcast(resid.agg(F.count(F.lit(1)).alias("n")))
    ).agg(
        F.max("n").alias("n"),
        F.avg(F.col("i") * 1.0).alias("ibar"),
        (
            F.sum(F.col("i") * 1.0 * F.col("i"))
            - F.count(F.lit(1)) * F.avg(F.col("i") * 1.0) * F.avg(F.col("i") * 1.0)
        ).alias("sxx_c"),
        F.sum(F.col("e") * F.col("e")).alias("sse"),
    )
    diag = resid.crossJoin(F.broadcast(sxx)).select(
        "mi",
        "e",
        (
            1.0 / F.col("n")
            + (F.col("i") - F.col("ibar")) * (F.col("i") - F.col("ibar")) / F.col("sxx_c")
        ).alias("h"),
        (F.col("sse") / (F.col("n") - 2)).alias("mse"),
        "n",
    )
    d = F.round(
        F.col("e")
        * F.col("e")
        / (2.0 * F.col("mse"))
        * F.col("h")
        / ((1.0 - F.col("h")) * (1.0 - F.col("h"))),
        8,
    )
    cooks = diag.select("mi", "e", "h", d.alias("d"), "n")
    return (
        cooks.orderBy(F.col("d").desc(), F.col("mi"))
        .limit(10)
        .select(
            F.col("mi").cast("long").alias("mi"),
            F.round(F.col("e"), 6).alias("residual"),
            F.round(F.col("h"), 6).alias("leverage"),
            F.round(F.col("d"), 6).alias("cooks_d"),
            (F.col("d") > 4.0 / F.col("n")).alias("influential"),
        )
    )


# ---------------------------------------------------------------------------
# q_boxcox_lambda — transformation selection by profile likelihood
# ---------------------------------------------------------------------------

BOXCOX_GRID = (-1.0, -0.5, 0.0, 0.5, 1.0)

_BOXCOX_SQL = f"""
    WITH {_MONTHLY_SQL},
    lams(lam) AS (VALUES {", ".join(f"({v})" for v in BOXCOX_GRID)}),
    tx AS (
      SELECT l.lam, m.mi,
             round(CASE WHEN l.lam = 0 THEN ln(m.z)
                        ELSE (power(m.z, l.lam) - 1) / l.lam END, 8) AS t,
             round(ln(m.z), 8) AS lz
      FROM m CROSS JOIN lams l
    ),
    ll AS (
      SELECT lam, count(*) AS n,
             round(-count(*) / 2e0
                     * ln(avg(t * t) - avg(t) * avg(t))
                   + (lam - 1) * sum(lz), 6) AS loglik
      FROM tx GROUP BY lam
    )
    SELECT lam, CAST(n AS BIGINT) AS n_months, loglik,
           loglik = max(loglik) OVER () AS is_best
    FROM ll ORDER BY lam
"""


@query("q_boxcox_lambda", oracle=_BOXCOX_SQL, tags=("stats", "timeseries"))
def boxcox_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-Cox transformation selection over the monthly revenue series:
    profile log-likelihood ll(lam) = -(n/2) ln sigma^2(y_lam) +
    (lam-1) sum(ln y) on the grid {BOXCOX_GRID} (lam = 0 is the log
    transform) — the pre-modeling step that decides whether
    q_dickey_fuller / q_holt_winters should see levels, square roots,
    or logs. The winner is flagged per row so the relation IS the
    decision.

    Determinism: the monthly z is the shared 6-dp series; transformed
    values and ln y round at 8 before the 80-term moment sums (reorder
    noise orders below the 6-dp loglik rounding); is_best compares
    ROUNDED logliks over the bounded grid. Scale: one monthly aggregate
    scan, then O(grid x months) — corpus-size-independent past the
    scan (the econometrics.py posture)."""
    m = _monthly(spark, sf_dir).select("mi", "z")
    lams = spark.createDataFrame([(v,) for v in BOXCOX_GRID], "lam double")
    tx = m.crossJoin(F.broadcast(lams)).select(
        "lam",
        F.round(
            F.when(F.col("lam") == 0, F.log("z")).otherwise(
                (F.pow("z", F.col("lam")) - 1) / F.col("lam")
            ),
            8,
        ).alias("t"),
        F.round(F.log("z"), 8).alias("lz"),
    )
    ll = tx.groupBy("lam").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.round(
            -F.count(F.lit(1))
            / F.lit(2.0)
            * F.log(F.avg(F.col("t") * F.col("t")) - F.avg("t") * F.avg("t"))
            + (F.col("lam") - 1) * F.sum("lz"),
            6,
        ).alias("loglik"),
    )
    w = Window.partitionBy()
    return ll.select(
        "lam",
        "n_months",
        "loglik",
        (F.col("loglik") == F.max("loglik").over(w)).alias("is_best"),
    ).orderBy("lam")
