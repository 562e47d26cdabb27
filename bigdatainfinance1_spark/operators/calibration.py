"""Calibration operators: isotonic (PAV) rate calibration via the
min-max closed form — the "fix the model's probabilities" layer beside
the diagnostics (q_calibration_bins reports miscalibration; this FIXES
it; ml_eval's q_brier_decomposition says how much of the loss was
fixable and q_conformal_interval does the interval counterpart).

Scale posture: the corpus reduces to 10 rate buckets with exact integer
counts, then closed forms / triangular joins run over that bounded
relation only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# q_isotonic_calibration — PAV via the max-min closed form over rate buckets
# ---------------------------------------------------------------------------

ISO_STEP = 50000.0  # price bucket width; 10 ordered buckets
ISO_MAX_B = 9
_POS_SQL = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@query(
    "q_isotonic_calibration",
    oracle=f"""
    WITH g AS (
      SELECT CAST(least(floor(o_totalprice / {ISO_STEP}), {ISO_MAX_B}) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN {_POS_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM orders GROUP BY 1
    ),
    seg AS (
      SELECT a.b AS i, c.b AS j,
             CAST(sum(m.r) AS BIGINT) AS r, CAST(sum(m.n) AS BIGINT) AS n
      FROM g a JOIN g c ON a.b <= c.b JOIN g m ON m.b BETWEEN a.b AND c.b
      GROUP BY a.b, c.b
    ),
    mm AS (
      SELECT s.i, k.b AS k, min(s.r * 1e0 / s.n) AS mn
      FROM seg s JOIN g k ON s.j >= k.b
      GROUP BY s.i, k.b
    ),
    iso AS (
      SELECT k AS b, max(mn) AS iso_rate FROM mm WHERE i <= k GROUP BY k
    ),
    viol AS (
      SELECT CAST(count(*) AS BIGINT) AS n_violations
      FROM g a JOIN g c ON c.b = a.b + 1
      WHERE c.r * 1e0 / c.n < a.r * 1e0 / a.n
    )
    SELECT g.b AS bucket, g.n AS n_orders,
           round(g.r * 1e0 / g.n, 6) AS raw_rate,
           round(i.iso_rate, 6) AS iso_rate,
           round(abs(g.r * 1e0 / g.n - i.iso_rate), 6) AS adjustment,
           v.n_violations
    FROM g JOIN iso i ON g.b = i.b CROSS JOIN viol v
    ORDER BY bucket
    """,
    tags=("ml", "eval", "calibration"),
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the urgent-priority rate over ordered
    order-value buckets — the pool-adjacent-violators fit computed by its
    MIN-MAX closed form iso(k) = max_{{i<=k}} min_{{j>=k}} rate(i..j),
    which needs no sequential merging and therefore no stateful pass:
    with B=10 buckets the whole fit is two triangular joins over a
    10-row relation. Reports each bucket's raw rate, the monotone
    calibrated rate, the adjustment PAV applied, and how many adjacent
    monotonicity violations the raw rates had — the distribution-free
    calibrator used on model scores before thresholding (Platt's
    parametric cousin is the q_logistic_irls machinery).

    Determinism: bucket counts and segment sums are exact BIGINTs;
    every rate is a ratio of integers, and min/max over identical
    doubles are order-free. Scale: ONE map-side histogram aggregate
    touches the corpus; everything after is O(B^3) arithmetic on 10
    rows."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy(
        F.least(F.floor(F.col("o_totalprice") / ISO_STEP), F.lit(ISO_MAX_B))
        .cast("long")
        .alias("b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
        )
        .cast("long")
        .alias("r"),
    )
    a = g.select(F.col("b").alias("i"))
    c = g.select(F.col("b").alias("j"))
    m = g.select(F.col("b").alias("mb"), "r", "n")
    seg = (
        a.join(F.broadcast(c), F.col("i") <= F.col("j"))
        .join(F.broadcast(m), F.col("mb").between(F.col("i"), F.col("j")))
        .groupBy("i", "j")
        .agg(F.sum("r").cast("long").alias("r"), F.sum("n").cast("long").alias("n"))
    )
    k = g.select(F.col("b").alias("k"))
    mm = (
        seg.join(F.broadcast(k), F.col("j") >= F.col("k"))
        .groupBy("i", "k")
        .agg(F.min(F.col("r") * F.lit(1.0) / F.col("n")).alias("mn"))
    )
    iso = (
        mm.filter(F.col("i") <= F.col("k"))
        .groupBy(F.col("k").alias("b"))
        .agg(F.max("mn").alias("iso_rate"))
    )
    nxt = g.select((F.col("b") - 1).alias("b"), (F.col("r") * F.lit(1.0) / F.col("n")).alias("next_rate"))
    viol = (
        g.join(F.broadcast(nxt), "b")
        .filter(F.col("next_rate") < F.col("r") * F.lit(1.0) / F.col("n"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    return (
        g.join(F.broadcast(iso), "b")
        .crossJoin(F.broadcast(viol))
        .select(
            F.col("b").alias("bucket"),
            F.col("n").alias("n_orders"),
            F.round(F.col("r") * F.lit(1.0) / F.col("n"), 6).alias("raw_rate"),
            F.round(F.col("iso_rate"), 6).alias("iso_rate"),
            F.round(F.abs(F.col("r") * F.lit(1.0) / F.col("n") - F.col("iso_rate")), 6).alias(
                "adjustment"
            ),
            "n_violations",
        )
        .orderBy("bucket")
    )

