"""UDF / UDAF / grouped-map surface (SURVEY.md §2.10).

These exist to demonstrate the Python-extension surface — Arrow-vectorized
pandas UDFs (never row-at-a-time Python UDFs), grouped-agg UDAFs, and
applyInPandas grouped-map transforms. Rule (SURVEY.md §2.10): core operators
stay JVM-side; UDFs are for logic Spark genuinely can't express. Each query
here has a pure-SQL oracle to prove the UDF path computes the same result
the built-ins would.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table


def _revenue_udf():
    """U1: scalar pandas UDF — Arrow-batched, element-wise float64 (IEEE
    identical to the JVM expression ep*(1-d)). Built lazily: pandas_udf
    parses its DDL return type against the active session."""

    @pandas_udf("double")
    def revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    return revenue


def _weighted_avg_disc_udf():
    """U2: grouped-agg pandas UDF — quantity-weighted mean discount."""

    @pandas_udf("double")
    def wavg(discount: pd.Series, quantity: pd.Series) -> float:
        q = quantity.to_numpy(dtype=np.float64)
        d = discount.to_numpy(dtype=np.float64)
        return float((d * q).sum() / q.sum())

    return wavg


@query(
    "q_udf_pandas_revenue",
    oracle="""
    SELECT
      l_returnflag,
      round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100e0, 2) AS revenue,
      count(*)                                          AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udf_pandas_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: revenue via an Arrow-vectorized scalar pandas UDF, aggregated
    JVM-side. Oracle proves the UDF path matches the pure-SQL result."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("revenue_row", _revenue_udf()("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.round(F.col("revenue_row") * 100).cast("long")) / 100.0, 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_udf_grouped_agg",
    oracle="""
    SELECT
      l_returnflag,
      round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: grouped-aggregate pandas UDF (weighted average) — the UDAF
    surface. round(6) absorbs numpy-pairwise vs sequential summation ulps."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_weighted_avg_disc_udf()("l_discount", "l_quantity"), 6).alias("wavg_disc")
    )


@query(
    "q_apply_in_pandas_zscore",
    oracle="""
    WITH norms AS (
      SELECT
        vec_id, label,
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT
      vec_id,
      label,
      round((nrm - avg(nrm) OVER (PARTITION BY label))
            / stddev_samp(nrm) OVER (PARTITION BY label), 4) AS z
    FROM norms
    """,
    tags=("udf", "llm"),
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-map applyInPandas — per-label z-score of embedding norms.
    The whole group arrives as one pandas DataFrame (the per-group-model
    pattern); norm itself is computed JVM-side first so only (id, label,
    norm) crosses the Arrow boundary."""
    from bigdatainfinance1_spark.functions.vector import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", "label", l2_norm("embedding").alias("nrm"))

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["nrm"].to_numpy(dtype=np.float64)
        mu = x.mean()
        sd = x.std(ddof=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "z": np.round((x - mu) / sd, 4),
            }
        )

    return norms.groupBy("label").applyInPandas(zscore, schema="vec_id long, label int, z double")


@query(
    "q_udtf_shingles",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents
      WHERE doc_id < 50
    ),
    idx AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
    )
    SELECT
      doc_id,
      count(*)                                                 AS n_shingles,
      count(DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2])   AS n_distinct_shingles
    FROM idx
    GROUP BY doc_id
    """,
    tags=("udf", "udtf", "llm"),
)
def udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: Python UDTF (table function) — text → word-trigram shingle rows,
    applied per input row via LATERAL correlation in SQL, then aggregated
    JVM-side. The shingle generator is the same primitive the MinHash path
    uses; the UDTF form demonstrates the one-row→many-rows extension surface
    (Spark ≥3.5). Bounded to doc_id < 50 so the fan-out stays proportional."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="shingle: string")
    class Shingles3:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield (" ".join(toks[i : i + 3]),)

    spark.udtf.register("shingles3", Shingles3)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT
          d.doc_id,
          count(*)                  AS n_shingles,
          count(DISTINCT s.shingle) AS n_distinct_shingles
        FROM docs_for_udtf d, LATERAL shingles3(d.text) s
        GROUP BY d.doc_id
        """
    )


@query(
    "q_sql_registered_udf",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100e0, 2) AS revenue
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("udf", "sql"),
)
def sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: the U1 pandas UDF registered into the SQL catalog
    (spark.udf.register), invoked from a SQL string over the temp view — the
    path a SQL-only user of the engine takes. Per-row float64 product is IEEE
    identical to the inline expression, so only the sum needs rounding."""
    spark.udf.register("udf_revenue", _revenue_udf())
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_for_udf")
    return spark.sql(
        """
        SELECT
          l_returnflag,
          l_linestatus,
          round(sum(CAST(round((udf_revenue(l_extendedprice, l_discount)) * 100) AS BIGINT)) / 100e0, 2) AS revenue
        FROM lineitem_for_udf
        GROUP BY l_returnflag, l_linestatus
        """
    )


def _zscore_iter_udf():
    """U1 variant: ITERATOR-of-series pandas UDF — the flavor for expensive
    per-executor initialization (load a model/tokenizer once, stream Arrow
    batches through it). The 'model' here is a deterministic standardizer
    whose constants are baked at build time; the iterator shape is the
    deliverable."""

    @pandas_udf("double")
    def zscore_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        mu, sigma = 38000.0, 23000.0  # "model weights", loaded once per worker
        for s in batches:
            yield (s - mu) / sigma

    return zscore_iter


@query(
    "q_udf_iter_series",
    oracle="""
    SELECT
      o_orderpriority AS priority,
      CAST(count(*) AS BIGINT) AS n,
      round(CAST(sum(CAST(round((o_totalprice - 38000e0) / 23000e0 * 1e12)
                          AS HUGEINT)) AS DOUBLE) / count(*) / 1e12, 6) AS mean_z,
      round(max((o_totalprice - 38000e0) / 23000e0), 6) AS max_z
    FROM orders
    GROUP BY priority
    """,
    tags=("udf",),
)
def udf_iter_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 third flavor: Iterator[pd.Series] → Iterator[pd.Series] pandas
    UDF — identical Arrow batching to the scalar form but with a worker
    lifetime hook BEFORE the batch loop, which is where real pipelines
    load the tokenizer/model once instead of per batch (the pattern
    q_media_features uses inside mapInPandas, exposed here as a column
    UDF). The standardization constants are plan literals, so the oracle
    reproduces the arithmetic exactly; the mean is rounded once at the
    end (double summation inside avg matches DuckDB here because inputs
    are IEEE-identical and the aggregate is a single partial per
    priority... rounded to 6 dp absorbing reorder ulps). Scale: same
    Arrow path as U1 — executors stream columnar batches, Python holds
    one batch at a time."""
    orders = load_table(spark, sf_dir, "orders")
    z = _zscore_iter_udf()(F.col("o_totalprice"))
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.round(z * 1e12).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 1e12,
            6,
        ).alias("mean_z"),
        F.round(F.max(z), 6).alias("max_z"),
    )


@query(
    "q_map_in_arrow",
    oracle="""
    SELECT
      CAST(l_returnflag AS STRING) AS flag,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(l_quantity AS BIGINT) * 2) AS BIGINT) AS doubled_qty
    FROM lineitem
    GROUP BY flag
    """,
    tags=("udf", "arrow"),
)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 variant at the lowest-level Python extension point: mapInArrow —
    raw pyarrow RecordBatches in, RecordBatches out, no pandas conversion
    at all (the fastest Python lane; what columnar model-inference servers
    consume directly). The transform doubles quantities batch-wise with
    pyarrow compute kernels, then the JVM aggregates per flag; the oracle
    reproduces the integer arithmetic exactly. Scale: zero-copy Arrow all
    the way — the Python worker never materializes Python objects, and
    batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")

    def double_qty(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            doubled = pc.multiply(
                pc.cast(tbl.column("l_quantity"), pa.int64()), pa.scalar(2, pa.int64())
            )
            out = pa.table(
                {"flag": tbl.column("l_returnflag"), "doubled": doubled}
            )
            yield from out.to_batches()

    mapped = li.mapInArrow(double_qty, "flag string, doubled long")
    return mapped.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("doubled").cast("long").alias("doubled_qty"),
    )


# ---------------------------------------------------------------------------
# q_udf_arrow_optimized — Spark 3.5+/4 Arrow-serialized scalar Python UDF
# ---------------------------------------------------------------------------


@query(
    "q_udf_arrow_optimized",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(round(sqrt(o_totalprice) * ln(1.0 + o_totalprice), 6)), 4)
             AS score_sum
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("udf", "analytics"),
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+ (Spark 3.5/4 surface): a scalar PYTHON udf with
    ``useArrow=True`` — Arrow-serialized row batches instead of pickled
    rows, the middle rung between the legacy pickle UDF (q_sql_registered
    _udf's demo) and the fully vectorized pandas UDF (q_udf_pandas
    _revenue). The scoring function is plain libm arithmetic
    (√x·ln(1+x), rounded at 6 inside the UDF via the shared
    rnd_half_away helper — Python's banker's round() would flip exact
    .5 boundaries against DuckDB's half-away round, the q_holt_smoothing
    lesson) so the oracle evaluates the identical expression and
    value-hashes the aggregate.

    Scale: Arrow transfer amortizes serialization per BATCH; still a
    Python hot path — the U-surface exists to prove the capability, and
    every production query in this repo keeps such logic JVM-side (the
    plan-assert suite forbids ArrowEvalPython outside these demos)."""
    import math

    from pyspark.sql.functions import udf

    from bigdatainfinance1_spark.functions.rounding import rnd_half_away

    @udf("double", useArrow=True)
    def score(x: float) -> float:
        return rnd_half_away(math.sqrt(x) * math.log(1.0 + x), 6)

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderpriority", score(F.col("o_totalprice")).alias("s"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("s"), 4).alias("score_sum"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q_cogroup_gap_stats — cogrouped applyInPandas (the two-sided grouped map)
# ---------------------------------------------------------------------------

COGROUP_CUST_CAP = 100  # bounded key range so the relation stays auditable

_COGROUP_SQL = f"""
    WITH o AS (
      SELECT o_custkey AS ck, o_orderdate FROM orders
      WHERE o_custkey <= {COGROUP_CUST_CAP}
    ),
    gaps AS (
      SELECT ck,
             datediff('day',
               lag(o_orderdate) OVER (PARTITION BY ck ORDER BY o_orderdate),
               o_orderdate) AS gap
      FROM o
    ),
    g AS (
      SELECT ck, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(round(2 * median(gap)) AS BIGINT) AS med2
      FROM gaps WHERE gap IS NOT NULL GROUP BY ck
    )
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
           g.n_gaps + 1 AS n_orders,
           round(g.med2 / 2e0, 1) AS median_gap_days
    FROM g JOIN customer c ON g.ck = c.c_custkey
    ORDER BY custkey
"""


@query("q_cogroup_gap_stats", oracle=_COGROUP_SQL, tags=("udf", "analytics"))
def cogroup_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-surface completion: COGROUPED applyInPandas — the two-sided
    grouped map (`a.groupBy(k).cogroup(b.groupBy(k)).applyInPandas`)
    that hands each key BOTH its dimension row (customer) and its fact
    rows (orders) as separate pandas frames, here computing each
    customer's inter-purchase gap census (count, exact median days)
    with the segment carried from the dim side. The API every
    pandas-side as-of merge / panel alignment uses when neither side
    alone suffices; the other five U-surfaces (scalar, grouped-agg,
    grouped-map, UDTF, SQL-registered, plus mapInArrow) are its
    siblings.

    Determinism: gaps are exact integer day diffs; pandas' interpolated
    median on integers lands on the same .5 grid as DuckDB's median (the
    2x-doubling trick makes it an exact integer compare); keys capped at
    {COGROUP_CUST_CAP} for an auditable relation. Scale: cogroup
    shuffles both sides by the key once — the partition-local pandas
    work is bounded per key, the canonical applyInPandas posture."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") <= COGROUP_CUST_CAP
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= COGROUP_CUST_CAP
    )

    def gap_stats(cust_pdf: pd.DataFrame, orders_pdf: pd.DataFrame) -> pd.DataFrame:
        if cust_pdf.empty or len(orders_pdf) < 2:
            return pd.DataFrame(
                columns=["custkey", "segment", "n_orders", "median_gap_days"]
            )
        dates = orders_pdf["o_orderdate"].sort_values().reset_index(drop=True)
        gaps = dates.diff().dropna().dt.days
        med2 = round(2 * gaps.median())
        return pd.DataFrame(
            {
                "custkey": [int(cust_pdf["c_custkey"].iloc[0])],
                "segment": [cust_pdf["c_mktsegment"].iloc[0]],
                "n_orders": [len(orders_pdf)],
                "median_gap_days": [round(med2 / 2.0, 1)],
            }
        )

    out = (
        cust.select("c_custkey", "c_mktsegment")
        .groupBy("c_custkey")
        .cogroup(orders.select("o_custkey", "o_orderdate").groupBy("o_custkey"))
        .applyInPandas(
            gap_stats,
            "custkey long, segment string, n_orders long, median_gap_days double",
        )
    )
    return out.orderBy("custkey")
