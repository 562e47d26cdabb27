"""Time-series data-mining operators (round 4 continuation): the matrix
profile (per-subsequence nearest-neighbor distance — the modern motif /
anomaly primitive), the classical periodogram (dominant-cycle detection),
and SAX symbolization with motif counting — the pattern-mining layer
above the forecasting stack (q_holt_winters, q_seasonal_decompose) and
the monitoring layer (q_cusum_changepoint, q_page_hinkley).

Scale notes: every query reduces the corpus to the O(calendar) monthly
series first; all subsequent work is calendar-bounded — the matrix
profile's pair join is O(windows^2) ~ 5.6k pairs x 6 offsets, the
periodogram is O(frequencies x months), SAX is O(segments). At 100 TB
the only scan is the monthly aggregate; everything else is
corpus-size-independent.

Determinism: window moments and z-scores are rounded (8 dp) BEFORE any
comparison or pairing; distances/powers are closed forms of those
rounded values summed over <= 6 / 80 bounded terms (ulp noise orders
below the 6-dp output rounding); argmins rank with explicit index
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

_MONTHLY_SQL = """
    m AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate) AS mi,
             round(round(sum(o_totalprice), 2) / 1000000.0, 6) AS z
      FROM orders GROUP BY mi
    ),
    idx AS (SELECT mi, z, row_number() OVER (ORDER BY mi) AS i FROM m)
"""


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatainfinance1_spark.functions.ranks import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).alias("mi")
    ).agg(F.round(F.round(F.sum("o_totalprice"), 2) / 1000000.0, 6).alias("z"))
    return global_row_number(m, ["mi"], rn_col="i")


# ---------------------------------------------------------------------------
# q_matrix_profile
# ---------------------------------------------------------------------------

MP_M = 6  # subsequence length (months)
MP_EXCL = 3  # exclusion zone (m/2): skip trivial self-matches


@query(
    "q_matrix_profile",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    n AS (SELECT count(*) AS n FROM idx),
    win AS (
      SELECT w.i AS w, x.i - w.i AS k, x.z
      FROM idx w JOIN idx x ON x.i BETWEEN w.i AND w.i + {MP_M - 1}
      CROSS JOIN n WHERE w.i <= n.n - {MP_M - 1}
    ),
    mom AS (
      SELECT w, round(avg(z), 8) AS mu,
             round(sqrt(avg(z * z) - avg(z) * avg(z)), 8) AS sd
      FROM win GROUP BY w
    ),
    nz AS (
      SELECT win.w, win.k, round((win.z - mom.mu) / mom.sd, 8) AS v
      FROM win JOIN mom USING (w) WHERE mom.sd > 0
    ),
    d AS (
      SELECT a.w AS i, b.w AS j,
             round(sqrt(sum((a.v - b.v) * (a.v - b.v))), 6) AS dist
      FROM nz a JOIN nz b ON a.k = b.k AND abs(a.w - b.w) >= {MP_EXCL}
      GROUP BY a.w, b.w
    )
    SELECT i AS window_start_idx,
           min_by(j, CAST(round(dist * 1000000) AS BIGINT) * 1000000 + j)
             AS nn_window_idx,
           min(dist) AS nn_dist
    FROM d GROUP BY i
    """,
    tags=("timeseries", "mining"),
)
def matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matrix profile of monthly revenue (Yeh et al.'s UCR primitive):
    for every {m}-month subsequence, the z-normalized Euclidean distance
    to its nearest non-trivial neighbor (exclusion zone m/2) and that
    neighbor's index. Low values = motifs (repeated regimes), high values
    = discords (anomalous months) — one structure answering both queries,
    which is why it displaced ad-hoc motif scans.

    Scale: the corpus reduces to O(calendar) monthly rows; subsequence
    extraction is a bounded band join (offset 0..{m}-1), moments are
    per-window aggregates, and the all-pairs stage is O(windows^2 x m) ~
    33k rows — calendar-bounded, corpus-independent (the brute-force
    exact tier; the production path at long series is the STOMP dot-
    product recurrence over the same normalized vectors). Determinism:
    window z-scores round at 8 before pairing; distances are 6-term sums
    rounded at 6; the neighbor argmin ties break on the index."""
    idx = _monthly(spark, sf_dir)
    n = idx.count()  # O(1) driver scalar — bounds the window range
    # offsets exploded per window start, then an EQUI-join on i = w + k —
    # never a range join (a range condition degrades to BNLJ/cartesian
    # when broadcast is disabled, and an equi-shuffle is the shape that
    # scales anyway)
    w = (
        idx.select(F.col("i").alias("w"))
        .filter(F.col("w") <= n - (MP_M - 1))
        .select("w", F.explode(F.sequence(F.lit(0), F.lit(MP_M - 1))).alias("k"))
        .withColumn("i", F.col("w") + F.col("k"))
    )
    win = w.join(idx.select("i", "z"), "i").select("w", "k", "z")
    mom = win.groupBy("w").agg(
        F.round(F.avg("z"), 8).alias("mu"),
        F.round(F.sqrt(F.avg(F.col("z") * F.col("z")) - F.avg("z") * F.avg("z")), 8).alias("sd"),
    )
    nz = (
        win.join(mom, "w")
        .filter(F.col("sd") > 0)
        .select("w", "k", F.round((F.col("z") - F.col("mu")) / F.col("sd"), 8).alias("v"))
    )
    a = nz.select(F.col("w").alias("i"), "k", F.col("v").alias("va"))
    b = nz.select(F.col("w").alias("j"), F.col("k").alias("kb"), F.col("v").alias("vb"))
    d = (
        a.join(b, (F.col("k") == F.col("kb")) & (F.abs(F.col("i") - F.col("j")) >= MP_EXCL))
        .groupBy("i", "j")
        .agg(F.round(F.sqrt(F.sum((F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb")))), 6).alias("dist"))
    )
    # (dist, j) tie-break encoded as one BIGINT key — DuckDB 1.0's min_by
    # has no struct-key overload; dist is already a multiple of 1e-6
    key = F.round(F.col("dist") * 1000000).cast("long") * 1000000 + F.col("j")
    return d.groupBy(F.col("i").alias("window_start_idx")).agg(
        F.min_by("j", key).alias("nn_window_idx"),
        F.min("dist").alias("nn_dist"),
    )


# ---------------------------------------------------------------------------
# q_periodogram
# ---------------------------------------------------------------------------

PGRAM_MAX_K = 12  # frequencies 1..12 cycles over the series


@query(
    "q_periodogram",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    gmom AS (
      SELECT count(*) AS n, round(avg(z), 8) AS mu,
             round(sqrt(avg(z * z) - avg(z) * avg(z)), 8) AS sd
      FROM idx
    ),
    xn AS (
      SELECT idx.i, round((idx.z - gmom.mu) / gmom.sd, 8) AS x, gmom.n
      FROM idx CROSS JOIN gmom
    ),
    freq AS (SELECT k FROM range(1, {PGRAM_MAX_K} + 1) AS r(k)),
    spec AS (
      SELECT f.k, max(xn.n) AS n,
             sum(xn.x * cos(2.0 * pi() * f.k * xn.i / xn.n)) AS c,
             sum(xn.x * sin(2.0 * pi() * f.k * xn.i / xn.n)) AS s
      FROM freq f CROSS JOIN xn
      GROUP BY f.k
    ),
    p AS (
      SELECT k, round(n * 1.0 / k, 2) AS period_months,
             round((c * c + s * s) * 2.0 / n, 6) AS power
      FROM spec
    )
    SELECT CAST(k AS BIGINT) AS k, period_months, power,
           power = max(power) OVER () AS is_peak
    FROM p
    """,
    tags=("timeseries", "mining", "spectral"),
)
def periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical periodogram of monthly revenue at harmonics k = 1..{K}:
    P(k) = 2/N [ (sum x_t cos(2 pi k t / N))^2 + (sum x_t sin(...))^2 ]
    on the z-normalized series, with the dominant-cycle flag — the
    spectral answer to "what seasonality does this series actually have"
    that q_seasonal_decompose ASSUMES (period = 12) and this MEASURES.

    Scale: one monthly aggregate, then O(frequencies x months) trig
    products — calendar-bounded. Determinism: the series z-normalizes on
    8-dp global moments; each (C, S) is an 80-term sum of O(1) products
    (ulp noise ~1e-13 against the 6-dp rounding), and the peak flag
    compares already-rounded powers."""
    idx = _monthly(spark, sf_dir)
    gmom = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("z"), 8).alias("mu"),
        F.round(F.sqrt(F.avg(F.col("z") * F.col("z")) - F.avg("z") * F.avg("z")), 8).alias("sd"),
    )
    xn = idx.crossJoin(F.broadcast(gmom)).select(
        "i", "n", F.round((F.col("z") - F.col("mu")) / F.col("sd"), 8).alias("x")
    )
    freq = spark.range(1, PGRAM_MAX_K + 1).select(F.col("id").alias("k"))
    ang = 2.0 * F.lit(3.141592653589793) * F.col("k") * F.col("i") / F.col("n")
    spec = (
        F.broadcast(freq)
        .crossJoin(xn)
        .groupBy("k")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("x") * F.cos(ang)).alias("c"),
            F.sum(F.col("x") * F.sin(ang)).alias("s"),
        )
    )
    p = spec.select(
        "k",
        F.round(F.col("n") * 1.0 / F.col("k"), 2).alias("period_months"),
        F.round((F.col("c") * F.col("c") + F.col("s") * F.col("s")) * 2.0 / F.col("n"), 6).alias("power"),
    )
    from pyspark.sql import Window

    return p.select(
        F.col("k").cast("long").alias("k"),
        "period_months",
        "power",
        (F.col("power") == F.max("power").over(Window.partitionBy())).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# q_sax_motifs
# ---------------------------------------------------------------------------

SAX_SEG = 4  # PAA segment length (months)
SAX_WORD = 3  # symbols per word
# N(0,1) quartile breakpoints for a 4-symbol alphabet
SAX_BP = (-0.6745, 0.0, 0.6745)


@query(
    "q_sax_motifs",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    gmom AS (
      SELECT round(avg(z), 8) AS mu,
             round(sqrt(avg(z * z) - avg(z) * avg(z)), 8) AS sd
      FROM idx
    ),
    paa AS (
      SELECT ((idx.i - 1) // {SAX_SEG}) AS seg,
             round(avg(round((idx.z - gmom.mu) / gmom.sd, 8)), 8) AS v,
             count(*) AS n_in_seg
      FROM idx CROSS JOIN gmom
      GROUP BY ((idx.i - 1) // {SAX_SEG})
      HAVING count(*) = {SAX_SEG}
    ),
    sym AS (
      SELECT seg,
             CASE WHEN v < {SAX_BP[0]} THEN 'a'
                  WHEN v < {SAX_BP[1]} THEN 'b'
                  WHEN v < {SAX_BP[2]} THEN 'c'
                  ELSE 'd' END AS s
      FROM paa
    ),
    words AS (
      SELECT a.seg AS start_seg, a.s || b.s || c.s AS word
      FROM sym a JOIN sym b ON b.seg = a.seg + 1 JOIN sym c ON c.seg = a.seg + 2
    )
    SELECT word,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(start_seg) AS BIGINT) AS first_start_seg,
           count(*) >= 2 AS is_motif
    FROM words GROUP BY word
    """,
    tags=("timeseries", "mining", "symbolic"),
)
def sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of monthly revenue:
    z-normalize, Piecewise Aggregate Approximation over {seg}-month
    segments, map segment means to a 4-symbol alphabet at the N(0,1)
    quartile breakpoints, then count {w}-symbol words — words occurring
    >= 2 times are motifs (recurring revenue regimes). SAX is the
    discretization that lets suffix/hash machinery (the corpus's own
    n-gram operators!) run on numeric series; this query is exactly that
    bridge.

    Scale: monthly aggregate -> O(segments) PAA -> O(words) counts, all
    calendar-bounded. Determinism: z-scores and PAA means round at 8
    before the breakpoint comparisons (symbols are then exact), and word
    assembly/counting is pure string/integer work."""
    idx = _monthly(spark, sf_dir)
    gmom = idx.agg(
        F.round(F.avg("z"), 8).alias("mu"),
        F.round(F.sqrt(F.avg(F.col("z") * F.col("z")) - F.avg("z") * F.avg("z")), 8).alias("sd"),
    )
    paa = (
        idx.crossJoin(F.broadcast(gmom))
        .select(
            ((F.col("i") - 1) / SAX_SEG).cast("long").alias("seg"),
            F.round((F.col("z") - F.col("mu")) / F.col("sd"), 8).alias("x"),
        )
        .groupBy("seg")
        .agg(F.round(F.avg("x"), 8).alias("v"), F.count(F.lit(1)).alias("n_in_seg"))
        .filter(F.col("n_in_seg") == SAX_SEG)
    )
    sym = paa.select(
        "seg",
        F.when(F.col("v") < SAX_BP[0], "a")
        .when(F.col("v") < SAX_BP[1], "b")
        .when(F.col("v") < SAX_BP[2], "c")
        .otherwise("d")
        .alias("s"),
    )
    a = sym.select(F.col("seg").alias("start_seg"), F.col("s").alias("sa"))
    b = sym.select(F.col("seg").alias("sb_seg"), F.col("s").alias("sb"))
    c = sym.select(F.col("seg").alias("sc_seg"), F.col("s").alias("sc"))
    words = (
        a.join(b, F.col("sb_seg") == F.col("start_seg") + 1)
        .join(c, F.col("sc_seg") == F.col("start_seg") + 2)
        .select("start_seg", F.concat("sa", "sb", "sc").alias("word"))
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.min("start_seg").cast("long").alias("first_start_seg"),
        (F.count(F.lit(1)) >= 2).alias("is_motif"),
    )


# ---------------------------------------------------------------------------
# q_forecast_combination — Bates-Granger inverse-MSE pooling
# ---------------------------------------------------------------------------

FC_START = 13  # evaluate from the first month with all three forecasts


@query(
    "q_forecast_combination",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    f AS (
      SELECT a.i, a.z,
             n1.z AS f_naive,
             n12.z AS f_snaive,
             (SELECT round(avg(b.z), 8) FROM idx b WHERE b.i < a.i) AS f_mean
      FROM idx a
      JOIN idx n1 ON n1.i = a.i - 1
      JOIN idx n12 ON n12.i = a.i - 12
      WHERE a.i >= {FC_START}
    ),
    mse AS (
      SELECT round(avg((z - f_naive) * (z - f_naive)), 8) AS m1,
             round(avg((z - f_snaive) * (z - f_snaive)), 8) AS m2,
             round(avg((z - f_mean) * (z - f_mean)), 8) AS m3,
             count(*) AS n
      FROM f
    ),
    w AS (
      SELECT n, m1, m2, m3,
             (1.0 / m1) / (1.0 / m1 + 1.0 / m2 + 1.0 / m3) AS w1,
             (1.0 / m2) / (1.0 / m1 + 1.0 / m2 + 1.0 / m3) AS w2,
             (1.0 / m3) / (1.0 / m1 + 1.0 / m2 + 1.0 / m3) AS w3
      FROM mse
    ),
    comb AS (
      SELECT round(avg(pow(f.z - (w.w1 * f.f_naive + w.w2 * f.f_snaive + w.w3 * f.f_mean), 2)), 8)
               AS mc, max(w.w1) AS w1, max(w.w2) AS w2, max(w.w3) AS w3,
             max(w.m1) AS m1, max(w.m2) AS m2, max(w.m3) AS m3, max(w.n) AS n
      FROM f CROSS JOIN w
    )
    SELECT model, round(mse, 6) AS mse, round(weight, 6) AS weight
    FROM (
      SELECT 'naive' AS model, m1 AS mse, w1 AS weight FROM comb
      UNION ALL SELECT 'seasonal_naive', m2, w2 FROM comb
      UNION ALL SELECT 'expanding_mean', m3, w3 FROM comb
      UNION ALL SELECT 'combined', mc, 1.0 FROM comb
    )
    """,
    tags=("timeseries", "forecast"),
)
def forecast_combination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bates-Granger forecast combination over three model-free monthly
    forecasters — naive (last month), seasonal naive (same month last
    year), expanding mean — pooled with inverse-MSE weights, reporting
    each model's one-step in-sample MSE, its weight, and the combined
    forecast's MSE. The empirical point the combination literature
    hammers: the pool is routinely better than every member, and the
    weights double as an interpretable model ranking (q_forecast_backtest
    evaluates ONE model out-of-sample; this is the pooling step above
    it).

    Scale: the corpus reduces to the O(calendar) monthly series; lags are
    equi-joins on the month index (from the two-phase global rank, no
    single-partition window), the expanding mean is an O(months^2) ~ 3k
    bounded correlated prefix, and MSEs/weights are closed forms of
    8-dp-rounded errors, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    a = idx.select(F.col("i").alias("i"), F.col("z").alias("z"))
    n1 = idx.select((F.col("i") + 1).alias("i"), F.col("z").alias("f_naive"))
    n12 = idx.select((F.col("i") + 12).alias("i"), F.col("z").alias("f_snaive"))
    prior = idx.select(F.col("i").alias("j"), F.col("z").alias("zj"))
    fmean = (
        # explicit broadcast: the prior-months side is calendar-bounded, and
        # without the hint this non-equi join degrades to a cartesian when
        # session state has auto-broadcast disabled (the plan-suite catch)
        a.join(F.broadcast(prior), F.col("j") < F.col("i"))
        .groupBy("i")
        .agg(F.round(F.avg("zj"), 8).alias("f_mean"))
    )
    f = (
        a.join(n1, "i")
        .join(n12, "i")
        .join(fmean, "i")
        .filter(F.col("i") >= FC_START)
    )
    mse = f.agg(
        F.round(F.avg((F.col("z") - F.col("f_naive")) * (F.col("z") - F.col("f_naive"))), 8).alias("m1"),
        F.round(F.avg((F.col("z") - F.col("f_snaive")) * (F.col("z") - F.col("f_snaive"))), 8).alias("m2"),
        F.round(F.avg((F.col("z") - F.col("f_mean")) * (F.col("z") - F.col("f_mean"))), 8).alias("m3"),
    )
    inv = 1.0 / F.col("m1") + 1.0 / F.col("m2") + 1.0 / F.col("m3")
    w = mse.select(
        "m1",
        "m2",
        "m3",
        ((1.0 / F.col("m1")) / inv).alias("w1"),
        ((1.0 / F.col("m2")) / inv).alias("w2"),
        ((1.0 / F.col("m3")) / inv).alias("w3"),
    )
    comb = f.crossJoin(F.broadcast(w)).agg(
        F.round(
            F.avg(
                F.pow(
                    F.col("z")
                    - (
                        F.col("w1") * F.col("f_naive")
                        + F.col("w2") * F.col("f_snaive")
                        + F.col("w3") * F.col("f_mean")
                    ),
                    F.lit(2),
                )
            ),
            8,
        ).alias("mc"),
        F.max("w1").alias("w1"),
        F.max("w2").alias("w2"),
        F.max("w3").alias("w3"),
        F.max("m1").alias("m1"),
        F.max("m2").alias("m2"),
        F.max("m3").alias("m3"),
    )
    rows = []
    for model, m_col, w_col in (
        ("naive", "m1", "w1"),
        ("seasonal_naive", "m2", "w2"),
        ("expanding_mean", "m3", "w3"),
    ):
        rows.append(
            comb.select(
                F.lit(model).alias("model"),
                F.round(F.col(m_col), 6).alias("mse"),
                F.round(F.col(w_col), 6).alias("weight"),
            )
        )
    rows.append(
        comb.select(
            F.lit("combined").alias("model"),
            F.round(F.col("mc"), 6).alias("mse"),
            F.lit(1.0).alias("weight"),
        )
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# q_pacf — partial autocorrelation at lags 1..3 (Durbin-Levinson closed forms)
# ---------------------------------------------------------------------------


@query(
    "q_pacf",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    gmom AS (
      SELECT count(*) AS n, round(avg(z), 8) AS mu FROM idx
    ),
    xc AS (
      SELECT idx.i, round(idx.z - gmom.mu, 8) AS x, gmom.n FROM idx CROSS JOIN gmom
    ),
    g AS (
      SELECT max(a.n) AS n,
             sum(a.x * a.x) / max(a.n) AS g0,
             sum(CASE WHEN b1.x IS NOT NULL THEN a.x * b1.x END) / max(a.n) AS g1,
             sum(CASE WHEN b2.x IS NOT NULL THEN a.x * b2.x END) / max(a.n) AS g2,
             sum(CASE WHEN b3.x IS NOT NULL THEN a.x * b3.x END) / max(a.n) AS g3
      FROM xc a
      LEFT JOIN xc b1 ON b1.i = a.i + 1
      LEFT JOIN xc b2 ON b2.i = a.i + 2
      LEFT JOIN xc b3 ON b3.i = a.i + 3
    ),
    rho AS (
      SELECT n, g1 / g0 AS r1, g2 / g0 AS r2, g3 / g0 AS r3 FROM g
    ),
    dl AS (
      SELECT n, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
      FROM rho
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           round(r1, 6) AS pacf_1,
           round(phi22, 6) AS pacf_2,
           round((r3 - (r1 * (1.0 - phi22)) * r2 - phi22 * r1)
                 / (1.0 - (r1 * (1.0 - phi22)) * r1 - phi22 * r2), 6) AS pacf_3,
           round(1.959964 / sqrt(n), 6) AS white_noise_band
    FROM dl
    """,
    tags=("timeseries", "stats"),
)
def pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of monthly revenue at lags 1-3 via the
    Durbin-Levinson closed forms (phi11 = rho1, phi22 =
    (rho2 - rho1^2)/(1 - rho1^2), phi33 from the level-2 coefficients) —
    THE AR-order diagnostic: PACF cuts off after lag p for an AR(p),
    where the raw ACF (q_autocorrelation) decays and cannot separate
    direct from inherited correlation. The +-1.96/sqrt(n) white-noise
    band rides along so the cutoff read is immediate.

    Scale: the monthly aggregate, three lag equi-joins on the month
    index (no windows), one moment aggregate, closed forms — all
    calendar-bounded. Deviations round at 8 before the products; the
    autocovariances share one fixed divisor n so the rho ratios are
    engine-identical to ulp, rounded at 6."""
    idx = _monthly(spark, sf_dir)
    gmom = idx.agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("z"), 8).alias("mu"))
    xc = idx.crossJoin(F.broadcast(gmom)).select(
        "i", F.round(F.col("z") - F.col("mu"), 8).alias("x"), "n"
    )
    a = xc.select("i", F.col("x").alias("xa"), "n")
    for k in (1, 2, 3):
        a = a.join(
            F.broadcast(xc.select((F.col("i") - k).alias("i"), F.col("x").alias(f"xl{k}"))),
            "i",
            "left",
        )
    g = a.agg(
        F.max("n").alias("n"),
        (F.sum(F.col("xa") * F.col("xa")) / F.max("n")).alias("g0"),
        (F.sum(F.col("xa") * F.col("xl1")) / F.max("n")).alias("g1"),
        (F.sum(F.col("xa") * F.col("xl2")) / F.max("n")).alias("g2"),
        (F.sum(F.col("xa") * F.col("xl3")) / F.max("n")).alias("g3"),
    )
    rho = g.select(
        "n",
        (F.col("g1") / F.col("g0")).alias("r1"),
        (F.col("g2") / F.col("g0")).alias("r2"),
        (F.col("g3") / F.col("g0")).alias("r3"),
    )
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (1.0 - F.col("r1") * F.col("r1"))
    dl = rho.select("n", "r1", "r2", "r3", phi22.alias("phi22"))
    phi21 = F.col("r1") * (1.0 - F.col("phi22"))
    return dl.select(
        F.col("n").cast("long").alias("n_months"),
        F.round(F.col("r1"), 6).alias("pacf_1"),
        F.round(F.col("phi22"), 6).alias("pacf_2"),
        F.round(
            (F.col("r3") - phi21 * F.col("r2") - F.col("phi22") * F.col("r1"))
            / (1.0 - phi21 * F.col("r1") - F.col("phi22") * F.col("r2")),
            6,
        ).alias("pacf_3"),
        F.round(1.959964 / F.sqrt(F.col("n").cast("double")), 6).alias("white_noise_band"),
    )
