"""Round-2 surface widening: customer/finance analytics composites beyond
SURVEY.md §2 — cohort retention, market-basket co-occurrence, robust (IQR)
outlier detection, Zipf rank-frequency, SCD2 validity intervals, and
compounded cumulative returns. Every query carries a full DuckDB value-hash
oracle; the total-order pieces go through functions/ranks.py (range-bucketed
recomposition — no single-partition window, repo rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    )
    SELECT
      f.cohort_m                                               AS cohort_m,
      CAST(year(o.o_orderdate) AS BIGINT) * 12 + month(o.o_orderdate)
        - f.cohort_m                                           AS months_since,
      count(DISTINCT o.o_custkey)                              AS n_custs
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY cohort_m, months_since
    """,
    tags=("analytics", "finance"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers bucketed by first-order month,
    counted distinct per (cohort, months-since-cohort). Month arithmetic is
    integer (year*12+month) so both engines bucket identically. Scale shape:
    one groupBy for cohorts, one shuffle join back on custkey (both sides
    keyed the same — AQE reuses the partitioning), one distinct-count
    aggregation; no windows, no collects."""
    orders = load_table(spark, sf_dir, "orders")
    month_idx = (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).cast("long")
    firsts = orders.groupBy("o_custkey").agg(F.min(month_idx).alias("cohort_m"))
    return (
        orders.join(firsts, "o_custkey")
        .select("o_custkey", F.col("cohort_m"), (month_idx - F.col("cohort_m")).alias("months_since"))
        .groupBy("cohort_m", "months_since")
        .agg(F.count_distinct("o_custkey").alias("n_custs"))
    )


@query(
    "q_copurchase_pairs",
    oracle="""
    SELECT
      a.l_partkey AS part_1,
      b.l_partkey AS part_2,
      count(*)    AS n_orders
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_1, part_2
    ORDER BY n_orders DESC, part_1, part_2
    LIMIT 20
    """,
    tags=("analytics", "join"),
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing on the same order,
    top-20 by frequency (full tiebreak for a deterministic LIMIT). The
    self-join is keyed on l_orderkey, whose group size is bounded (≤7 lines
    per TPC-H order), so pair fan-out is ≤21 per order — linear in orders,
    not quadratic in parts; the final top-k is a TakeOrdered, not a sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_2"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_1") < F.col("part_2"))
        .groupBy("part_1", "part_2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_1", "part_2")
        .limit(20)
    )


@query(
    "q_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT event_type,
             round(quantile_cont(value, 0.25), 6) AS q1,
             round(quantile_cont(value, 0.75), 6) AS q3
      FROM events GROUP BY event_type
    )
    SELECT
      e.event_type,
      count(*)                         AS n_outliers,
      round(min(e.value), 2)           AS min_outlier,
      round(max(e.value), 2)           AS max_outlier
    FROM events e
    JOIN q ON e.event_type = q.event_type
    WHERE e.value > q.q3 + 1.5 * (q.q3 - q.q1)
    GROUP BY e.event_type
    """,
    tags=("analytics", "stats", "events"),
)
def iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (Tukey IQR) outlier detection per event type: values above
    q3 + 1.5·IQR (the heavy-tailed events.value distribution — order prices
    have no Tukey outliers, checked). Quartiles use linear interpolation on
    both engines; each quartile is rounded to 6 dp BEFORE the threshold
    arithmetic so both engines compare against identical doubles
    (interpolation fractions are ∈ {0,.25,.5,.75} over 2-decimal values, so
    the rounded quartile is either exactly a value or ≥2.5e-3 away — no
    boundary flakiness). Scale: quartiles are one agg on the group key; the
    threshold relation is group-cardinality-sized and broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("q3"),
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .filter(F.col("value") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.min("value"), 2).alias("min_outlier"),
            F.round(F.max("value"), 2).alias("max_outlier"),
        )
    )


@query(
    "q_zipf_terms",
    oracle="""
    WITH tf AS (
      SELECT tok, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, tok, CAST(cnt AS BIGINT) AS cnt,
           CAST(rnk * cnt AS BIGINT) AS rank_times_freq
    FROM (
      SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM tf
    )
    WHERE rnk <= 100
    """,
    tags=("analytics", "text", "llm"),
)
def zipf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile of the corpus vocabulary: top-100 terms
    with their frequency rank and rank×freq product (≈constant under Zipf's
    law — the standard corpus-health diagnostic). The global frequency rank
    is a range-bucketed distributed row number (functions/ranks.py, desc
    ordering) — the oracle keeps the windowed formulation."""
    from bigdatainfinance1_spark.functions.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = global_row_number(tf, [F.col("cnt").desc(), F.col("tok")], rn_col="rnk")
    return (
        ranked.filter(F.col("rnk") <= 100)
        .select(
            "rnk",
            "tok",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("rnk") * F.col("cnt")).cast("long").alias("rank_times_freq"),
        )
    )


@query(
    "q_scd2_intervals",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      o_orderpriority                                   AS priority,
      o_orderdate                                       AS valid_from,
      coalesce(lead(o_orderdate) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ), TIMESTAMP '2261-12-31 00:00:00')               AS valid_to,
      CAST(lead(o_orderdate) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ) IS NULL AS BOOLEAN)                             AS is_current
    FROM orders
    """,
    tags=("analytics", "etl", "window"),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) validity intervals: each order
    event becomes a [valid_from, valid_to) version row per customer, the
    open-ended latest row carrying a far-future sentinel (2261-12-31: the
    classic 9999 sentinel overflows Arrow/pandas nanosecond timestamps,
    which the oracle gate converts through) and an is_current flag — the snapshot-history build. One per-key ordered window
    (partitioned by custkey, total order via orderkey tiebreak); at 100 TB
    this is one hash shuffle on the dimension key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    sentinel = F.lit("2261-12-31 00:00:00").cast("timestamp")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(nxt, sentinel).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_cum_return",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY day
    ),
    rets AS (
      SELECT day, rev,
        ln(rev / lag(rev) OVER (ORDER BY day)) AS log_ret
      FROM daily
    )
    SELECT day, rev,
      round(sum(log_ret) OVER (
        ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 6) AS cum_log_return
    FROM rets
    """,
    tags=("analytics", "finance", "timeseries"),
)
def cum_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compounded cumulative return of the daily-revenue series on the log
    scale: cum_log_return(t) = Σ ln(rev_t / rev_{t-1}) — the additive form
    of the running product Π(1+r). The day-over-day lag uses the
    year-partition + boundary-carry shape (as q_lag_dod); the running sum is
    the range-bucketed two-phase prefix sum (functions/ranks.py). Both
    engines sum ulp-level-identical logs; round(·,6) absorbs summation-order
    differences (values are O(1)–O(10); margins verified on the fixed
    testdata). No single-partition window anywhere."""
    from bigdatainfinance1_spark.functions.ranks import global_running_sum

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    ).withColumn("_yr", F.year("day"))
    w = Window.partitionBy("_yr").orderBy("day")
    carry = (
        daily.groupBy("_yr")
        .agg(F.max_by("rev", "day").alias("_carry_rev"))
        .select((F.col("_yr") + 1).alias("_yr"), "_carry_rev")
    )
    prev = F.coalesce(F.lag("rev").over(w), F.col("_carry_rev"))
    rets = (
        daily.join(F.broadcast(carry), "_yr", "left")
        .select("day", "rev", F.log(F.col("rev") / prev).alias("log_ret"))
    )
    summed = global_running_sum(rets, ["day"], "log_ret", "_cum")
    return summed.select("day", "rev", F.round("_cum", 6).alias("cum_log_return"))


@query(
    "q_dau_wau",
    oracle="""
    WITH ev AS (SELECT date_trunc('day', ts) AS eday, user_id FROM events),
    days AS (SELECT DISTINCT eday AS day FROM ev),
    pairs AS (
      SELECT d.day, e.user_id, e.eday
      FROM days d
      JOIN ev e ON e.eday BETWEEN d.day - INTERVAL 6 DAY AND d.day
    )
    SELECT
      day,
      count(DISTINCT CASE WHEN eday = day THEN user_id END) AS dau,
      count(DISTINCT user_id)                               AS wau,
      round(count(DISTINCT CASE WHEN eday = day THEN user_id END) * 1.0
            / count(DISTINCT user_id), 4)                   AS stickiness
    FROM pairs GROUP BY day
    """,
    tags=("analytics", "events"),
)
def dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement: daily active users, trailing-7-day weekly active users,
    and DAU/WAU stickiness per observed day. Spark-first shape: instead of
    the oracle's theta join (day BETWEEN eday .. eday+6), each event row
    explodes into the ≤7 target days it contributes to and equi-joins the
    observed-day spine — a 7× narrow fanout plus hash joins, no
    nested-loop join, independent of the day-spine cardinality at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("eday"), "user_id"
    )
    days = ev.select(F.col("eday").alias("day")).distinct()
    fanout = ev.select(
        "user_id",
        "eday",
        F.explode(
            F.sequence("eday", F.col("eday") + F.expr("INTERVAL 6 DAYS"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    pairs = fanout.join(F.broadcast(days), "day")
    return pairs.groupBy("day").agg(
        F.count_distinct(F.when(F.col("eday") == F.col("day"), F.col("user_id"))).alias("dau"),
        F.count_distinct("user_id").alias("wau"),
        F.round(
            F.count_distinct(F.when(F.col("eday") == F.col("day"), F.col("user_id")))
            / F.count_distinct("user_id"),
            4,
        ).alias("stickiness"),
    )


def _pagerank_oracle(iters: int = 5, d: float = 0.85) -> str:
    """DuckDB oracle for q_pagerank_copurchase: the same fixed-iteration
    PageRank unrolled as chained CTEs (r0..r{iters}) — feasible because the
    iteration count is a constant of the operator, not data-dependent."""
    head = """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (SELECT p1 AS u, p2 AS v FROM pairs UNION ALL SELECT p2, p1 FROM pairs),
    deg AS (SELECT u, count(*) AS c FROM edges GROUP BY u),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT u AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg)
    """
    steps = "".join(
        f""",
    r{i + 1} AS (
      SELECT e.v AS node,
             (1 - {d}) / (SELECT n FROM nn) + {d} * sum(r{i}.r / dg.c) AS r
      FROM edges e
      JOIN r{i} ON r{i}.node = e.u
      JOIN deg dg ON dg.u = e.u
      GROUP BY e.v
    )"""
        for i in range(iters)
    )
    return f"""
    {head}{steps}
    SELECT node AS part_id,
           round(r * (SELECT n FROM nn), 6) AS rel_rank,
           CAST((SELECT c FROM deg WHERE deg.u = node) AS BIGINT) AS degree
    FROM r{iters}
    ORDER BY rel_rank DESC, part_id
    LIMIT 20
    """


@query("q_pagerank_copurchase", oracle=_pagerank_oracle(), tags=("analytics", "iterative", "join"))
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 fixed iterations, d=0.85) over the undirected co-purchase
    graph — parts linked when they appear on the same order. Each iteration
    is one edges⋈ranks join + per-node sum (the dup_clusters/k-means job
    shape: the driver holds only the loop counter and the node count, data
    never leaves the cluster). The symmetric edge set means no dangling
    nodes, so no global redistribution term. Output is the top-20 by
    N-normalized rank (O(1) values, round 6 — summation-order ulps across
    5 iterations stay ~1e-11, orders under the rounding grain). The oracle
    unrolls the same 5 iterations as chained CTEs."""
    d, iters = 0.85, 5
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
    )
    edges = pairs.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        pairs.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("c")).persist()
    n = deg.count()  # bounded driver scalar: node count
    ranks = deg.select(F.col("u").alias("node"), (F.lit(1.0) / n).alias("r"))
    edges_deg = edges.join(deg, "u").persist()
    for _ in range(iters):
        contrib = (
            edges_deg.join(ranks, edges_deg.u == ranks.node)
            .select("v", (F.col("r") / F.col("c")).alias("w"))
            .groupBy("v")
            .agg(F.sum("w").alias("s"))
        )
        ranks = contrib.select(
            F.col("v").alias("node"), ((1 - d) / n + d * F.col("s")).alias("r")
        )
    out = (
        ranks.join(deg, ranks.node == deg.u)
        .select(
            F.col("node").alias("part_id"),
            F.round(F.col("r") * n, 6).alias("rel_rank"),
            F.col("c").cast("long").alias("degree"),
        )
        .orderBy(F.col("rel_rank").desc(), "part_id")
        .limit(20)
    )
    out = out.localCheckpoint(eager=True)  # materialize before unpersisting lineage
    edges_deg.unpersist()
    deg.unpersist()
    return out


@query(
    "q_twap",
    oracle="""
    WITH iv AS (
      SELECT user_id, value,
        epoch_us(coalesce(
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts
        )) - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT
      user_id,
      round(sum(value * dur_us) / nullif(sum(dur_us), 0), 4) AS twap,
      CAST(sum(dur_us) AS BIGINT)                            AS total_us
    FROM iv
    WHERE dur_us > 0
    GROUP BY user_id
    """,
    tags=("analytics", "finance", "events"),
)
def twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per user: each observation holds until
    the next one (lead over the per-user event-time order), weight = holding
    duration in integer microseconds — exact on both engines; the final
    ratio is the only float division. The last observation (zero duration)
    drops out, the standard TWAP convention. One per-key window + one
    groupBy, both on user_id — a single shuffle at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.unix_micros(F.coalesce(F.lead("ts").over(w), F.col("ts"))) - F.unix_micros("ts")
    iv = ev.select("user_id", "value", dur.alias("dur_us")).filter(F.col("dur_us") > 0)
    return iv.groupBy("user_id").agg(
        F.round(
            F.sum(F.col("value") * F.col("dur_us")) / F.nullif(F.sum("dur_us"), F.lit(0)), 4
        ).alias("twap"),
        F.sum("dur_us").cast("long").alias("total_us"),
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 10
    """,
    tags=("analytics", "sample", "llm"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 deterministic tier: stratified sampling by hash quota — the 10
    documents per language with the lowest md5(doc_id). Hash-order quotas
    are how production pipelines draw REPRODUCIBLE eval/debug samples at
    100 TB (stable across runs, engines, and partitioning — unlike
    rate-based Bernoulli sampling, q_sample_profile's rows-only tier, whose
    draw is engine-internal). Per-stratum top-k via ranked window = one
    shuffle on the stratum key."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id", "n_chars")
    )


@query(
    "q_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit
      FROM orders
    ),
    obs AS (SELECT digit, count(*) AS n_obs FROM digits GROUP BY digit),
    n AS (SELECT count(*) AS total FROM digits)
    SELECT
      CAST(digit AS BIGINT)                                   AS digit,
      CAST(n_obs AS BIGINT)                                   AS n_obs,
      round(n_obs * 1.0 / (SELECT total FROM n), 6)           AS obs_freq,
      round(ln(1 + 1.0 / digit) / ln(10), 6)                  AS benford_freq
    FROM obs
    """,
    tags=("analytics", "finance", "stats"),
)
def benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud analytics: leading-digit distribution of order totals vs
    Benford's law. The leading digit is taken from the INTEGER cents
    (round(x*100) → BIGINT → first character) — integer-to-string is
    byte-identical on both engines, avoiding the classic floor(log10(x))
    power-of-ten boundary hazard. One narrow map + a 9-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.expr(
        "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS INT)"
    )
    digits = orders.select(digit.alias("digit"))
    totals = digits.agg(F.count(F.lit(1)).alias("total"))
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.col("n_obs").cast("long").alias("n_obs"),
            F.round(F.col("n_obs") * 1.0 / F.col("total"), 6).alias("obs_freq"),
            F.round(F.log(1 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 6).alias(
                "benford_freq"
            ),
        )
    )


@query(
    "q_gini_revenue",
    oracle="""
    WITH m AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT monetary,
             row_number() OVER (ORDER BY monetary, o_custkey) AS i,
             count(*) OVER ()                                 AS n,
             sum(monetary) OVER ()                            AS tot
      FROM m
    )
    SELECT
      CAST(max(n) AS BIGINT)                       AS n_customers,
      round(max(tot), 2)                           AS total_rev,
      round(2.0 * sum(i * monetary) / (max(n) * max(tot))
            - (max(n) + 1.0) / max(n), 6)          AS gini
    FROM ranked
    """,
    tags=("analytics", "finance", "stats"),
)
def gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient over per-customer spend:
    G = 2·Σ(i·m_i)/(n·Σm) − (n+1)/n with i the ascending spend rank —
    the standard inequality measure for customer-concentration risk. The
    rank is the range-bucketed distributed row number (functions/ranks.py);
    n and Σm come from the same aggregate, so the whole query is two
    shuffles. The oracle uses window formulations of the identical algebra;
    round(·,6) absorbs summation-order ulps."""
    from bigdatainfinance1_spark.functions.ranks import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("monetary"))
    ranked = global_row_number(m, ["monetary", "o_custkey"], rn_col="i")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("total_rev"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("monetary")) / (F.count(F.lit(1)) * F.sum("monetary"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@query(
    "q_pareto_revenue",
    oracle="""
    WITH m AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT monetary,
             row_number() OVER (ORDER BY monetary DESC, o_custkey) AS i,
             sum(monetary) OVER (
               ORDER BY monetary DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             count(*) OVER ()      AS n,
             sum(monetary) OVER () AS tot
      FROM m
    )
    SELECT
      CAST(min(x.i) AS BIGINT)                 AS n_top_customers,
      round(min(x.i) * 1.0 / max(y.nn), 4)     AS customer_share,
      round(min(x.cum_at) / max(y.tt), 4)      AS revenue_share
    FROM (SELECT i, cum AS cum_at FROM ranked WHERE cum >= 0.8 * tot) x,
         (SELECT max(n) AS nn, max(tot) AS tt FROM ranked) y
    """,
    tags=("analytics", "finance"),
)
def pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the smallest top-spender prefix covering ≥80%
    of revenue, as a count and as shares of customers/revenue. Descending
    spend rank and running revenue via the range-bucketed primitives
    (functions/ranks.py) — no single-partition window; the 0.8·total
    crossing is far from any ulp boundary (neighboring cumulative sums
    differ by a full customer's spend)."""
    from bigdatainfinance1_spark.functions.ranks import (
        global_row_number,
        global_running_sum,
    )

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("monetary"))
    order_cols = [F.col("monetary").desc(), F.col("o_custkey")]
    ranked = global_row_number(m, order_cols, rn_col="i")
    with_cum = global_running_sum(ranked, order_cols, "monetary", "cum")
    totals = m.agg(
        F.count(F.lit(1)).alias("n"), F.sum("monetary").alias("tot")
    )
    crossed = (
        with_cum.crossJoin(F.broadcast(totals))
        .filter(F.col("cum") >= 0.8 * F.col("tot"))
        .agg(
            F.min("i").cast("long").alias("n_top_customers"),
            F.round(F.min("i") * 1.0 / F.first("n"), 4).alias("customer_share"),
            F.round(F.min_by("cum", "i") / F.first("tot"), 4).alias("revenue_share"),
        )
    )
    return crossed


@query(
    "q_table_diff",
    oracle="""
    WITH new_v AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 101 <> 0
    ),
    diff AS (
      SELECT
        CASE
          WHEN o.o_orderkey IS NULL THEN 'inserted'
          WHEN n.o_orderkey IS NULL THEN 'deleted'
          WHEN o.o_totalprice <> n.o_totalprice THEN 'updated'
          ELSE 'unchanged'
        END AS change_type,
        coalesce(n.o_totalprice, o.o_totalprice) AS price
      FROM orders o FULL OUTER JOIN new_v n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type, count(*) AS n_rows, round(sum(price), 2) AS total_price
    FROM diff GROUP BY change_type
    """,
    tags=("analytics", "etl"),
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: classify every key as inserted / deleted /
    updated / unchanged between two table versions via one full-outer join
    on the key (the new version is derived deterministically from orders:
    every 97th key's price bumped 10%, every 101st key dropped). This is
    the changelog computation that feeds incremental downstream refreshes
    when no table format provides it natively; at 100 TB both sides hash-
    shuffle once on the key, or zero times if co-bucketed."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    new_v = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.round(F.col("o_totalprice") * 1.1, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    o = orders.select(F.col("o_orderkey").alias("k_old"), F.col("o_totalprice").alias("p_old"))
    n = new_v.select(F.col("o_orderkey").alias("k_new"), F.col("o_totalprice").alias("p_new"))
    diff = o.join(n, o.k_old == n.k_new, "full_outer").select(
        F.when(F.col("k_old").isNull(), "inserted")
        .when(F.col("k_new").isNull(), "deleted")
        .when(F.col("p_old") != F.col("p_new"), "updated")
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce("p_new", "p_old").alias("price"),
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("price"), 2).alias("total_price"),
    )


@query(
    "q_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id)
    SELECT
      c.user_id,
      CAST(max(t.tot) AS BIGINT)                              AS n_events,
      count(*)                                                AS n_types,
      round(-sum((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6) AS entropy
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
    tags=("analytics", "events", "stats"),
)
def user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral fingerprint: Shannon entropy of each user's event-type
    distribution (0 = single-type bots, ln(5) ≈ 1.609 = uniform across all
    five types) — the standard segmentation/anomaly feature. Two chained
    aggregations on user_id (the second reuses the first's partitioning);
    round(·,6) absorbs ln/summation ulps."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("tot").cast("long").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@query(
    "q_interpurchase_gaps",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
        date_diff('day',
          lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
          o_orderdate) AS gap_days
      FROM orders
    )
    SELECT
      count(*)                                   AS n_gaps,
      round(avg(gap_days), 4)                    AS avg_gap,
      round(quantile_cont(gap_days, 0.5), 4)     AS median_gap,
      round(quantile_cont(gap_days, 0.95), 4)    AS p95_gap,
      CAST(max(gap_days) AS BIGINT)              AS max_gap
    FROM gaps WHERE gap_days IS NOT NULL
    """,
    tags=("analytics", "finance"),
)
def interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention feature: the corpus-wide inter-purchase time distribution —
    per-customer order-date lags (integer days, exact on both engines)
    profiled with mean/median/p95/max. One per-key window + one global
    aggregate of integer gaps; quantiles interpolate identically on both
    engines over integers."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 4).alias("median_gap"),
        F.round(F.expr("percentile(gap_days, 0.95)"), 4).alias("p95_gap"),
        F.max("gap_days").cast("long").alias("max_gap"),
    )


_SKYLINE_SQL = """
    WITH pts AS (
      SELECT p_brand, p_retailprice, p_size, count(*) AS n_parts
      FROM part GROUP BY p_brand, p_retailprice, p_size
    ),
    ordered AS (
      SELECT p_brand, p_retailprice, p_size, n_parts,
        max(p_size) OVER (
          PARTITION BY p_brand ORDER BY p_retailprice, p_size DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS best_size_before
      FROM pts
    )
    SELECT p_brand, p_retailprice, p_size, n_parts
    FROM ordered
    WHERE best_size_before IS NULL OR p_size > best_size_before
"""


@query("q_skyline_parts", oracle=_SKYLINE_SQL, tags=("analytics",))
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline (Pareto frontier) per brand: parts not dominated on
    (minimize retail price, maximize size). The naive formulation is an
    O(n^2) NOT-EXISTS self-join; this is the O(n log n) sweep — sort by
    (price asc, size desc) and keep rows whose size strictly exceeds the
    running max over all strictly-preceding rows. Dominance follows: any
    earlier row has price <= yours, so a preceding size >= yours means
    you're dominated (ties collapse first via the distinct-points CTE).
    One shuffle on p_brand, per-brand ordered window — no cartesian
    anywhere. One SQL text runs verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SKYLINE_SQL)


_MODE_SQL = """
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS n_events
      FROM events GROUP BY user_id, event_type
    ),
    ranked AS (
      SELECT user_id, event_type, n_events,
        row_number() OVER (
          PARTITION BY user_id ORDER BY n_events DESC, event_type
        ) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS mode_event_type, n_events
    FROM ranked WHERE rn = 1
"""


@query("q_mode_per_user", oracle=_MODE_SQL, tags=("analytics", "events"))
def mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent event type.
    Neither engine's native mode() defines tie order, so the oracle-safe
    (and scale-safe) form is count → row_number with an explicit
    (count DESC, value ASC) total order — two shuffles on user_id keys,
    the second over the already-tiny counts relation. One SQL text runs
    verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MODE_SQL)


@query(
    "q_welch_ttest",
    oracle="""
    WITH assigned AS (
      SELECT
        (instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
          AS grp,
        value
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT
        count(CASE WHEN grp = 0 THEN 1 END)    AS n_a,
        count(CASE WHEN grp = 1 THEN 1 END)    AS n_b,
        avg(CASE WHEN grp = 0 THEN value END)  AS mean_a_raw,
        avg(CASE WHEN grp = 1 THEN value END)  AS mean_b_raw,
        var_samp(CASE WHEN grp = 0 THEN value END) AS var_a,
        var_samp(CASE WHEN grp = 1 THEN value END) AS var_b
      FROM assigned
    )
    SELECT
      n_a, n_b,
      round(mean_a_raw, 4) AS mean_a,
      round(mean_b_raw, 4) AS mean_b,
      round((mean_a_raw - mean_b_raw) / sqrt(var_a / n_a + var_b / n_b), 4) AS t_stat,
      round(
        pow(var_a / n_a + var_b / n_b, 2)
        / (pow(var_a / n_a, 2) / (n_a - 1) + pow(var_b / n_b, 2) / (n_b - 1)),
        2) AS df_welch
    FROM m
    """,
    tags=("analytics", "stats"),
)
def welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's unequal-variance t-test on purchase
    values between two deterministic md5-assigned arms (first md5 nibble of
    user_id, parity — the salting-free hash assignment both engines can
    reproduce; Spark renders the nibble via conv(hex)%2, DuckDB via
    instr-nibble). Single-pass conditional aggregation — one scan, one
    1-row reduce, no shuffle beyond the global agg; t and Welch df are
    closed-form arithmetic over the moment sums."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    grp = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("long") % 2
    )
    m = ev.select(grp.alias("grp"), "value").agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("n_b"),
        F.avg(F.when(F.col("grp") == 0, F.col("value"))).alias("mean_a_raw"),
        F.avg(F.when(F.col("grp") == 1, F.col("value"))).alias("mean_b_raw"),
        F.var_samp(F.when(F.col("grp") == 0, F.col("value"))).alias("var_a"),
        F.var_samp(F.when(F.col("grp") == 1, F.col("value"))).alias("var_b"),
    )
    se2_a = F.col("var_a") / F.col("n_a")
    se2_b = F.col("var_b") / F.col("n_b")
    return m.select(
        "n_a",
        "n_b",
        F.round("mean_a_raw", 4).alias("mean_a"),
        F.round("mean_b_raw", 4).alias("mean_b"),
        F.round((F.col("mean_a_raw") - F.col("mean_b_raw")) / F.sqrt(se2_a + se2_b), 4).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2_a + se2_b, 2)
            / (F.pow(se2_a, 2) / (F.col("n_a") - 1) + F.pow(se2_b, 2) / (F.col("n_b") - 1)),
            2,
        ).alias("df_welch"),
    )


@query(
    "q_triangle_count",
    oracle="""
    WITH e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT
      (SELECT count(*) FROM e) AS n_edges,
      count(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.v = e2.u
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    tags=("analytics", "graph"),
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics: triangle count on the co-purchase graph (parts
    co-ordered at least twice). Edges are ORIENTED low-id → high-id so each
    triangle is enumerated exactly once as (u<v<w): wedge join e1(u,v) ⋈
    e2(v,w), closed by e3(u,w) — two equi-shuffle joins, never a cartesian.
    The >= 2 co-support threshold is the standard sparsifier; in production
    the orientation key would be (degree, id) so high-degree hubs don't
    fan wedges out quadratically (same plan, different sort key)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    e1 = edges.select(F.col("u").alias("t_u"), F.col("v").alias("t_v"))
    e2 = edges.select(F.col("u").alias("w_u"), F.col("v").alias("w_v"))
    wedges = e1.join(e2, F.col("t_v") == F.col("w_u"))
    closed = wedges.join(
        edges, (F.col("u") == F.col("t_u")) & (F.col("v") == F.col("w_v"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    return n_edges.crossJoin(n_tri)


@query(
    "q_funnel_steps",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT
      (SELECT count(*) FROM s) AS n_signup,
      (SELECT count(*) FROM c) AS n_clicked,
      (SELECT count(*) FROM p) AS n_purchased,
      round((SELECT count(*) FROM c) * 1.0 / (SELECT count(*) FROM s), 4)
        AS click_rate,
      round((SELECT count(*) FROM p) * 1.0 / nullif((SELECT count(*) FROM c), 0), 4)
        AS purchase_rate
    """,
    tags=("analytics", "events"),
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel: users who signed up, then clicked AFTER their
    first signup, then purchased AFTER that first click — each stage is the
    min-timestamp event strictly after the previous stage's anchor (the
    product-analytics "funnel with strict ordering", not mere set overlap).
    Three groupBy-min passes chained by equi-joins on user_id — every join
    is keyed the same, so AQE reuses one partitioning end to end."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )
    return counts.select(
        "n_signup",
        "n_clicked",
        "n_purchased",
        F.round(F.col("n_clicked") * 1.0 / F.col("n_signup"), 4).alias("click_rate"),
        F.round(
            F.col("n_purchased") * 1.0 / F.nullif(F.col("n_clicked"), F.lit(0)), 4
        ).alias("purchase_rate"),
    )


_GEO_SQL = """
    WITH cust AS (
      SELECT c_custkey,
        ((c_custkey * 2654435761) % 4294967296) % 1800 / 10e0 - 90e0  AS lat,
        ((c_custkey * 2246822519) % 4294967296) % 3600 / 10e0 - 180e0 AS lon
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey,
        ((s_suppkey * 2654435761 + 97) % 4294967296) % 1800 / 10e0 - 90e0  AS lat,
        ((s_suppkey * 2246822519 + 31) % 4294967296) % 3600 / 10e0 - 180e0 AS lon
      FROM supplier
    ),
    probes(dx, dy) AS (
      VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
    ),
    cand AS (
      SELECT c.c_custkey, s.s_suppkey,
        (c.lat - s.lat) * (c.lat - s.lat) + (c.lon - s.lon) * (c.lon - s.lon) AS d2,
        row_number() OVER (
          PARTITION BY c.c_custkey
          ORDER BY (c.lat - s.lat) * (c.lat - s.lat)
                 + (c.lon - s.lon) * (c.lon - s.lon),
                s.s_suppkey
        ) AS rn
      FROM cust c
      CROSS JOIN probes p
      JOIN supp s
        ON CAST(floor(s.lat / 5) AS BIGINT) = CAST(floor(c.lat / 5) AS BIGINT) + p.dy
       AND CAST(floor(s.lon / 5) AS BIGINT) = CAST(floor(c.lon / 5) AS BIGINT) + p.dx
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, round(d2, 6) AS d2
    FROM cand WHERE rn = 1
"""


@query("q_geo_grid_knn", oracle=_GEO_SQL, tags=("analytics", "spatial"))
def geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial nearest-neighbor via GRID BUCKETING: each entity gets
    deterministic synthetic coordinates (Knuth multiplicative hash mod a
    0.1-degree lattice — pure 64-bit integer arithmetic, so both engines
    derive bit-identical doubles), then each customer probes its own
    5-degree grid cell plus the 8 neighbors (a 9-way equi-join on cell
    ids, the scalable spatial-join shape — candidate pairs are linear in
    density, never all-pairs) and keeps the closest supplier by squared
    equirectangular distance with a deterministic id tiebreak. Customers
    with no supplier within the ring drop out (documented inner-join
    semantics). One SQL text runs verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GEO_SQL)


_EWMA_SQL = """
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ) AS idx
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice,
      round(
        sum(o_totalprice * pow(2.0, idx)) OVER w / sum(pow(2.0, idx)) OVER w,
        4) AS ewma
    FROM seq
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
"""


@query("q_ewma_orders", oracle=_EWMA_SQL, tags=("analytics", "finance", "timeseries"))
def ewma_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (decay 0.5) of each customer's
    order values — the recursive smoother expressed as a CLOSED-FORM pair of
    running sums: ewma_i = Σ x_j·2^j / Σ 2^j over j ≤ i (weights 2^j are
    exact IEEE powers of two, so no cross-engine pow() drift; the common
    2^-i cancels in the ratio). Two windowed sums per row, one shuffle on
    custkey — no recursion, no UDF, no driver loop; per-key history depth
    only grows the exponent, which double carries to 2^1000+. One SQL text
    runs verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EWMA_SQL)


@query(
    "q_winsorized_mean",
    oracle="""
    WITH cuts AS (
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.05) AS p05,
        quantile_cont(l_quantity, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT
      l.l_returnflag,
      count(*) AS n,
      count(CASE WHEN l.l_quantity < c.p05 THEN 1 END) AS n_clipped_low,
      count(CASE WHEN l.l_quantity > c.p95 THEN 1 END) AS n_clipped_high,
      round(avg(l.l_quantity), 4) AS raw_mean,
      round(avg(greatest(c.p05, least(c.p95, l.l_quantity))), 4) AS winsorized_mean
    FROM lineitem l JOIN cuts c ON l.l_returnflag = c.l_returnflag
    GROUP BY l.l_returnflag
    """,
    tags=("analytics", "stats"),
)
def winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: the 5/95 winsorized mean of order quantities per
    return flag — outliers clipped to the group percentiles, the standard
    heavy-tail-resistant location estimate. Quantities are integer-valued,
    so the interpolated percentiles agree bit-for-bit across engines
    (round-1 verified property). Percentile cuts are a 3-row relation
    broadcast back onto the fact scan — two passes, one shuffle each,
    group state bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    cuts = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.05)").alias("p05"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95"),
    )
    clipped = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("l_quantity")))
    return (
        li.join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("l_quantity") < F.col("p05"), 1)).alias("n_clipped_low"),
            F.count(F.when(F.col("l_quantity") > F.col("p95"), 1)).alias("n_clipped_high"),
            F.round(F.avg("l_quantity"), 4).alias("raw_mean"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
        )
    )


_CONCURRENCY_SQL = """
    WITH iv AS (
      SELECT event_id, event_type, ts, ts + INTERVAL 5 MINUTE AS te FROM events
    ),
    edges AS (
      SELECT event_type, date_trunc('day', ts) AS day, ts AS ets, 1 AS delta, event_id
      FROM iv
      UNION ALL
      SELECT event_type, date_trunc('day', ts), te, -1, event_id
      FROM iv WHERE te < date_trunc('day', ts) + INTERVAL 1 DAY
      UNION ALL
      SELECT event_type, date_trunc('day', te), date_trunc('day', te), 1, event_id
      FROM iv
      WHERE date_trunc('day', te) > date_trunc('day', ts) AND te > date_trunc('day', te)
      UNION ALL
      SELECT event_type, date_trunc('day', te), te, -1, event_id
      FROM iv
      WHERE date_trunc('day', te) > date_trunc('day', ts) AND te > date_trunc('day', te)
    ),
    running AS (
      SELECT event_type, day, delta,
        sum(delta) OVER (
          PARTITION BY event_type, day
          ORDER BY ets, delta, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cur
      FROM edges
    )
    SELECT
      event_type,
      day,
      CAST(max(cur) AS BIGINT) AS max_concurrent,
      count(CASE WHEN delta = 1 THEN 1 END) AS n_starts
    FROM running GROUP BY event_type, day
"""


@query("q_concurrency_sweep", oracle=_CONCURRENCY_SQL, tags=("analytics", "events", "timeseries"))
def concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval algebra: peak concurrent activity per (event_type, day),
    treating each event as a 5-minute active interval — the classic
    sweep-line (+1 at start, -1 at end, running sum, max). Midnight-
    crossing intervals are SPLIT at the day boundary (a carry-in +1 at the
    next day's start), so each (type, day) partition is self-contained and
    the ordered window never spans partitions — the partitioned form of a
    globally-ordered sweep. Tie rule: at equal timestamps the -1 sorts
    first ([start, end) semantics); the running sum is tie-order-invariant
    beyond that. One SQL text runs verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CONCURRENCY_SQL)


@query(
    "q_bfs_hops",
    oracle="""
    WITH und AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    e AS (
      SELECT u, v FROM und UNION ALL SELECT v, u FROM und
    ),
    d0 AS (SELECT min(u) AS node, 0 AS dist FROM e),
    d1 AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d0
        UNION ALL
        SELECT e.v, d0.dist + 1 FROM d0 JOIN e ON e.u = d0.node
      ) GROUP BY node
    ),
    d2 AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d1
        UNION ALL
        SELECT e.v, d1.dist + 1 FROM d1 JOIN e ON e.u = d1.node
      ) GROUP BY node
    ),
    d3 AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d2
        UNION ALL
        SELECT e.v, d2.dist + 1 FROM d2 JOIN e ON e.u = d2.node
      ) GROUP BY node
    ),
    d4 AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d3
        UNION ALL
        SELECT e.v, d3.dist + 1 FROM d3 JOIN e ON e.u = d3.node
      ) GROUP BY node
    )
    SELECT CAST(dist AS BIGINT) AS dist, count(*) AS n_nodes
    FROM d4 GROUP BY dist
    """,
    tags=("analytics", "graph", "iterative"),
)
def bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph traversal: 4-hop BFS from the minimum-id vertex of the
    sparsified co-purchase graph (undirected; co-support >= 2), reporting
    how many vertices sit at each shortest-path distance. Spark runs the
    standard distributed BFS relaxation — 4 deterministic join+groupBy-min
    rounds over a reused edge relation (the Pregel shape: frontier joins
    edges, union, min per node); the driver holds only the loop counter.
    The oracle is the same recurrence unrolled as a fixed CTE chain
    (pagerank pattern). Unreachable vertices are absent, not infinite."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    edges = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v"))).cache()
    dist = edges.agg(F.min("u").alias("node")).select("node", F.lit(0).alias("dist"))
    for _ in range(4):
        relaxed = (
            dist.join(edges, dist.node == edges.u)
            .select(F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.groupBy(F.col("dist").cast("long").alias("dist")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


_CHI2_SQL = """
    WITH joined AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    obs AS (SELECT seg, pri, count(*) AS n FROM joined GROUP BY seg, pri),
    rt AS (SELECT seg, count(*) AS nr FROM joined GROUP BY seg),
    ct AS (SELECT pri, count(*) AS nc FROM joined GROUP BY pri),
    tot AS (SELECT count(*) AS n FROM joined),
    cells AS (
      SELECT rt.seg, ct.pri,
        coalesce(obs.n, 0)               AS o_ij,
        rt.nr * ct.nc * 1e0 / tot.n      AS e_ij
      FROM rt CROSS JOIN ct CROSS JOIN tot
      LEFT JOIN obs ON obs.seg = rt.seg AND obs.pri = ct.pri
    )
    SELECT
      round(sum((o_ij - e_ij) * (o_ij - e_ij) / e_ij), 4)  AS chi2,
      CAST((count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1) AS BIGINT) AS dof,
      CAST(sum(o_ij) AS BIGINT)                            AS n_obs
    FROM cells
"""


@query("q_chi2_independence", oracle=_CHI2_SQL, tags=("analytics", "stats"))
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test: market segment × order priority
    contingency table. The cell grid is COMPLETED by crossing the two
    margin relations (5×5) before left-joining observed counts — zero-
    observation cells still contribute their expected mass, the mistake a
    naive groupBy makes. All counts are exact integers; the statistic is
    one 25-row reduce. One SQL text runs verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CHI2_SQL)


_MARKOV_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
        lead(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
        ) AS next_type
      FROM events
    )
    SELECT
      event_type AS from_type,
      next_type  AS to_type,
      count(*)   AS n,
      round(count(*) * 1e0 / sum(count(*)) OVER (PARTITION BY event_type), 4) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
"""


@query("q_markov_transitions", oracle=_MARKOV_SQL, tags=("analytics", "events"))
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence model: the first-order Markov transition matrix
    over each user's event stream — P(next event type | current), from a
    per-user lead() with total order (ts, event_id) and a windowed row-
    normalization over the 4×4 count matrix. One shuffle on user_id for
    the sequence pass; the normalization window runs on a 16-row relation.
    One SQL text runs verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MARKOV_SQL)


_REGR_SQL = """
    SELECT
      p_brand,
      count(*)                                        AS n,
      round(regr_slope(p_retailprice, p_size), 6)     AS slope,
      round(regr_intercept(p_retailprice, p_size), 6) AS intercept,
      round(regr_r2(p_retailprice, p_size), 6)        AS r2
    FROM part
    GROUP BY p_brand
"""


@query("q_regr_by_brand", oracle=_REGR_SQL, tags=("analytics", "stats"))
def regr_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS: per-brand price-on-size regression via the native
    regr_slope / regr_intercept / regr_r2 aggregates (both engines expose
    the SQL:2003 regr_* family; both accumulate co-moments in double, and
    the 6-decimal round absorbs summation-order ulps). One hash aggregate,
    bounded per-group state — the sketchable regression shape. One SQL
    text runs verbatim on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_REGR_SQL)


@query(
    "q_var_cvar",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY date_trunc('day', o_orderdate)
    ),
    ret AS (
      SELECT round(rev / lag(rev) OVER (ORDER BY day) - 1, 6) AS r FROM daily
    ),
    r2 AS (SELECT r FROM ret WHERE r IS NOT NULL),
    q AS (
      SELECT quantile_cont(r, 0.05) AS v05, quantile_cont(r, 0.01) AS v01,
             count(*) AS n_days
      FROM r2
    )
    SELECT
      q.n_days,
      round(q.v05, 6) AS var05,
      round(q.v01, 6) AS var01,
      round(avg(CASE WHEN r2.r <= q.v05 THEN r2.r END), 6) AS cvar05
    FROM r2 CROSS JOIN q
    GROUP BY q.n_days, q.v05, q.v01
    """,
    tags=("analytics", "finance", "stats"),
)
def var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical value-at-risk and expected shortfall on daily-revenue
    returns: VaR(5%)/VaR(1%) as interpolated quantiles of the return
    distribution, CVaR(5%) as the mean of the tail at-or-below VaR(5%).
    Returns are day-over-day ratios of the per-day rounded revenue and are
    themselves rounded to 6 before the quantile, so both engines
    interpolate the exact same grid. The day-over-day lag is partitioned
    by year with a broadcast carry row (repo rule: no unpartitioned
    ordered window); the tail mean is a conditional aggregate against the
    broadcast 1-row quantile relation — two scans of a tiny daily
    relation, no driver collect."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .withColumn("_yr", F.year("day"))
    )
    w = Window.partitionBy("_yr").orderBy("day")
    carry = (
        daily.groupBy("_yr")
        .agg(F.max_by("rev", "day").alias("_carry_rev"))
        .select((F.col("_yr") + 1).alias("_yr"), "_carry_rev")
    )
    prev = F.coalesce(F.lag("rev").over(w), F.col("_carry_rev"))
    rets = (
        daily.join(F.broadcast(carry), "_yr", "left")
        .select(F.round(F.col("rev") / prev - 1, 6).alias("r"))
        .filter(F.col("r").isNotNull())
    )
    q = rets.agg(
        F.expr("percentile(r, 0.05)").alias("v05"),
        F.expr("percentile(r, 0.01)").alias("v01"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return (
        rets.crossJoin(F.broadcast(q))
        .groupBy("n_days", "v05", "v01")
        .agg(F.round(F.avg(F.when(F.col("r") <= F.col("v05"), F.col("r"))), 6).alias("cvar05"))
        .select(
            "n_days",
            F.round("v05", 6).alias("var05"),
            F.round("v01", 6).alias("var01"),
            "cvar05",
        )
    )


@query(
    "q_dow_seasonality",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY date_trunc('day', o_orderdate)
    ),
    tot AS (SELECT avg(rev) AS mu FROM daily)
    SELECT
      CAST((datediff('day', DATE '1995-01-02', day) % 7 + 7) % 7 AS BIGINT) AS dow_idx,
      count(*) AS n_days,
      round(avg(rev), 4) AS avg_rev,
      round(avg(rev) / min(tot.mu), 6) AS seasonal_idx
    FROM daily CROSS JOIN tot
    GROUP BY (datediff('day', DATE '1995-01-02', day) % 7 + 7) % 7
    """,
    tags=("analytics", "finance", "timeseries"),
)
def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: day-of-week revenue index (per-DOW mean over
    the global mean). The weekday is derived ARITHMETICALLY — days since a
    known Monday, mod 7 — because the engines disagree on dayofweek()
    numbering (Spark 1=Sunday, DuckDB 0=Sunday); integer date arithmetic
    is convention-free. Two tiny aggregates over the daily relation, the
    global mean rides in as a broadcast 1-row cross join."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    tot = daily.agg(F.avg("rev").alias("mu"))
    dow = ((F.datediff(F.col("day"), F.lit("1995-01-02").cast("date")) % 7 + 7) % 7).cast("long")
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy(dow.alias("dow_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg("rev"), 4).alias("avg_rev"),
            F.round(F.avg("rev") / F.min("mu"), 6).alias("seasonal_idx"),
        )
    )


@query(
    "q_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY date_trunc('day', o_orderdate)
    ),
    stats AS (SELECT avg(rev) AS mu FROM daily),
    denom AS (
      SELECT sum((rev - mu) * (rev - mu)) AS ss
      FROM daily CROSS JOIN stats
    ),
    lags(k) AS (VALUES (1), (7), (30)),
    pairs AS (
      SELECT l.k, (a.rev - s.mu) * (b.rev - s.mu) AS prod
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.day = a.day + l.k
      CROSS JOIN stats s
    )
    SELECT
      CAST(p.k AS BIGINT) AS lag_k,
      count(*) AS n_pairs,
      round(sum(p.prod) / min(d.ss), 6) AS acf
    FROM pairs p CROSS JOIN denom d
    GROUP BY p.k
    """,
    tags=("analytics", "finance", "timeseries"),
)
def autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily revenue at lags 1/7/30 — the ACF
    values a seasonality analysis starts from. Formulated WITHOUT ordered
    windows: the lag pairing is an equi-join on (day + k) against a lags
    VALUES relation, so it shuffles on the date key and parallelizes —
    no single-partition sort, no carry machinery. Global mean and the
    centered sum of squares ride in as broadcast 1-row relations; the
    classic ACF denominator (full-series variance) normalizes every lag.
    Products of identically-rounded doubles agree bitwise; the final
    sums are order-ulp-absorbed by round 6 on a [-1, 1] statistic."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    stats = daily.agg(F.avg("rev").alias("mu"))
    denom = daily.crossJoin(F.broadcast(stats)).agg(
        F.sum((F.col("rev") - F.col("mu")) * (F.col("rev") - F.col("mu"))).alias("ss")
    )
    lags = spark.createDataFrame([(1,), (7,), (30,)], "k int")
    a = daily.select(F.col("day").alias("day_a"), F.col("rev").alias("rev_a"))
    b = daily.select(F.col("day").alias("day_b"), F.col("rev").alias("rev_b"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("date_add(day_a, k) = day_b"))
        .crossJoin(F.broadcast(stats))
        .select(
            "k",
            ((F.col("rev_a") - F.col("mu")) * (F.col("rev_b") - F.col("mu"))).alias("prod"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(denom))
        .groupBy(F.col("k").cast("long").alias("lag_k"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("prod") / F.min("ss"), 6).alias("acf"),
        )
    )


@query(
    "q_spearman_corr",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             round(sum(o_totalprice), 2) AS rev,
             count(*) AS n_orders
      FROM orders GROUP BY date_trunc('day', o_orderdate)
    ),
    ranked AS (
      SELECT
        CAST(row_number() OVER (ORDER BY rev, day) AS BIGINT)      AS rx,
        CAST(row_number() OVER (ORDER BY n_orders, day) AS BIGINT) AS ry
      FROM daily
    ),
    s AS (
      SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
             sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
      FROM ranked
    )
    SELECT
      CAST(n AS BIGINT) AS n_days,
      round(
        (n * sxy - sx * sy) * 1e0
        / sqrt((n * sxx - sx * sx) * 1e0 * (n * syy - sy * sy)), 6) AS spearman
    FROM s
    """,
    tags=("analytics", "stats"),
)
def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dependence: Spearman rank correlation between daily revenue
    and daily order count. Ranks are assigned by the range-bucketed
    distributed global row_number (functions/ranks.py — no single-
    partition window), with the calendar day as a deterministic tiebreak
    (documented convention: ties take distinct consecutive ranks, not
    averaged — both engines apply the identical rule so the oracle
    agrees). The correlation itself is computed from EXACT integer moment
    sums — n·Σxy − ΣxΣy over BIGINTs — so both engines divide identical
    integers; only the final division is floating."""
    from bigdatainfinance1_spark.functions.ranks import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    rx = global_row_number(daily, ["rev", "day"], rn_col="rx")
    ranked = global_row_number(rx, ["n_orders", "day"], rn_col="ry").select("rx", "ry")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(num.cast("double") / den, 6).alias("spearman"),
    )


@query(
    "q_session_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
        sum(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
        string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
        count(*) AS n_ev
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT path,
      count(*) AS n_sessions,
      round(avg(n_ev), 4) AS avg_events
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
    tags=("analytics", "events"),
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: the 10 most common within-session event
    sequences (30-minute-gap sessionization, then the ordered event-type
    path per session, e.g. 'view>click>purchase'). Path assembly is
    collect_list of (ts, event_id, type) structs sorted IN-GROUP after the
    shuffle (array_sort — no ordered shuffle), joined with '>'; the final
    top-10 is a TakeOrdered with a full (count, path) tiebreak. Session
    state is per-user and bounded; paths relation is sessions-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    paths = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("n_ev"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_ev"), 4).alias("avg_events"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@query(
    "q_dq_checks",
    oracle="""
    SELECT 'fk_lineitem_orderkey' AS check_name,
      (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
      (SELECT count(*) FROM lineitem) AS n_checked
    UNION ALL
    SELECT 'fk_orders_custkey',
      (SELECT count(*) FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'pk_orders_unique',
      (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
      (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'range_discount_0_1',
      (SELECT count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) FROM lineitem),
      (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'range_quantity_positive',
      (SELECT count(CASE WHEN l_quantity <= 0 THEN 1 END) FROM lineitem),
      (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'enum_orderstatus',
      (SELECT count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) FROM orders),
      (SELECT count(*) FROM orders)
    """,
    tags=("analytics", "etl", "quality"),
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion suite (the dbt-tests shape): referential
    integrity (anti-join counts), primary-key uniqueness, value ranges,
    and enum domains — each check emits (name, violations, checked) and
    the suite unions into one report relation. Per-table checks share one
    scan via conditional aggregation; FK checks are anti joins that ship
    only the key column. On healthy synthetic data every count is 0 —
    the point is the machinery, priced at one scan per table + two
    key-projected anti joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def one(name: str, viol, checked) -> DataFrame:
        return viol.crossJoin(checked).select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("long").alias("n_violations"),
            F.col("n_checked").cast("long").alias("n_checked"),
        )

    li_n = li.agg(F.count(F.lit(1)).alias("n_checked"))
    ord_n = orders.agg(F.count(F.lit(1)).alias("n_checked"))
    fk_li = one(
        "fk_lineitem_orderkey",
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations")),
        li_n,
    )
    fk_ord = one(
        "fk_orders_custkey",
        orders.select("o_custkey")
        .join(cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations")),
        ord_n,
    )
    pk = one(
        "pk_orders_unique",
        orders.agg((F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n_violations")),
        ord_n,
    )
    rng_d = one(
        "range_discount_0_1",
        li.agg(
            F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)).alias(
                "n_violations"
            )
        ),
        li_n,
    )
    rng_q = one(
        "range_quantity_positive",
        li.agg(F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("n_violations")),
        li_n,
    )
    enum_s = one(
        "enum_orderstatus",
        orders.agg(
            F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias("n_violations")
        ),
        ord_n,
    )
    out = fk_li
    for d in (fk_ord, pk, rng_d, rng_q, enum_s):
        out = out.unionByName(d)
    return out


_WMEDIAN_SQL = """
    WITH ordered AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
        sum(CAST(l_quantity AS BIGINT)) OVER (
          PARTITION BY l_returnflag
          ORDER BY l_extendedprice, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cumw,
        sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag) AS totw
      FROM lineitem
    )
    SELECT
      l_returnflag,
      CAST(min(totw) AS BIGINT) AS total_weight,
      round(min(CASE WHEN cumw * 2 >= totw THEN l_extendedprice END), 2)
        AS weighted_median_price
    FROM ordered
    GROUP BY l_returnflag
"""


@query("q_weighted_median", oracle=_WMEDIAN_SQL, tags=("analytics", "stats"))
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the price at which half the total QUANTITY sits on
    either side, per return flag — the inventory-weighted location
    estimate. Cumulative integer weights over a per-group total order;
    the half-total crossing test is `cumw·2 ≥ totw` in exact BIGINT
    arithmetic, so no floating boundary exists for engines to disagree
    on. One partitioned window + one groupBy. One SQL text runs verbatim
    on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_WMEDIAN_SQL)


@query(
    "q_ks_test",
    oracle="""
    WITH assigned AS (
      SELECT event_id, value,
        (instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2
          AS grp
      FROM events WHERE event_type = 'purchase'
    ),
    marked AS (
      SELECT event_id, value,
        CASE WHEN grp = 0 THEN 1 ELSE 0 END AS ia,
        CASE WHEN grp = 1 THEN 1 ELSE 0 END AS ib
      FROM assigned
    ),
    cum AS (
      SELECT
        sum(CAST(ia AS BIGINT)) OVER w AS ca,
        sum(CAST(ib AS BIGINT)) OVER w AS cb,
        sum(CAST(ia AS BIGINT)) OVER () AS na,
        sum(CAST(ib AS BIGINT)) OVER () AS nb
      FROM marked
      WINDOW w AS (ORDER BY value, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT
      CAST(min(na) AS BIGINT) AS n_a,
      CAST(min(nb) AS BIGINT) AS n_b,
      round(max(abs(ca * 1e0 / na - cb * 1e0 / nb)), 6) AS ks_d
    FROM cum
    """,
    tags=("analytics", "stats"),
)
def ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the md5-assigned A/B
    arms of purchase values: D = max |F̂_A − F̂_B| over the merged sample.
    The ECDFs are cumulative INTEGER indicator sums over a total (value,
    event_id) order — computed with the range-bucketed distributed running
    sum (functions/ranks.py; the oracle uses a plain global window, which
    DuckDB may), so the division is the only floating step and every
    engine sees identical integers. Complements q_welch_ttest: Welch
    compares means, KS compares whole distributions."""
    from bigdatainfinance1_spark.functions.ranks import global_running_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    grp = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("long") % 2
    )
    marked = ev.select(
        "event_id",
        "value",
        F.when(grp == 0, 1).otherwise(0).alias("ia"),
        F.when(grp == 1, 1).otherwise(0).alias("ib"),
    )
    c1 = global_running_sum(marked, ["value", "event_id"], "ia", "ca")
    c2 = global_running_sum(c1, ["value", "event_id"], "ib", "cb")
    tot = marked.agg(
        F.sum("ia").cast("long").alias("na"), F.sum("ib").cast("long").alias("nb")
    )
    return (
        c2.crossJoin(F.broadcast(tot))
        .agg(
            F.min("na").cast("long").alias("n_a"),
            F.min("nb").cast("long").alias("n_b"),
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") * F.lit(1.0) / F.col("na")
                        - F.col("cb") * F.lit(1.0) / F.col("nb")
                    )
                ),
                6,
            ).alias("ks_d"),
        )
    )


_ANOVA_SQL = """
    WITH g AS (
      SELECT c.c_mktsegment AS seg,
        count(*)            AS n_g,
        sum(o.o_totalprice) AS s_g,
        sum(o.o_totalprice * o.o_totalprice) AS ss_g
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ),
    tot AS (
      SELECT sum(n_g) AS n, sum(s_g) AS s, sum(ss_g) AS ss, count(*) AS k FROM g
    )
    SELECT
      CAST(min(t.k) AS BIGINT) AS k_groups,
      CAST(min(t.n) AS BIGINT) AS n_obs,
      round((sum(g.s_g * g.s_g / g.n_g) - min(t.s * t.s / t.n)) / 1e6, 2) AS ss_between_m,
      round((min(t.ss) - sum(g.s_g * g.s_g / g.n_g)) / 1e6, 2)            AS ss_within_m,
      round(
        ((sum(g.s_g * g.s_g / g.n_g) - min(t.s * t.s / t.n)) / (min(t.k) - 1))
        / ((min(t.ss) - sum(g.s_g * g.s_g / g.n_g)) / (min(t.n) - min(t.k))),
        6) AS f_stat
    FROM g CROSS JOIN tot t
"""


@query("q_anova_f", oracle=_ANOVA_SQL, tags=("analytics", "stats"))
def anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ across market segments?
    F = (SS_between/(k−1)) / (SS_within/(N−k)), assembled entirely from
    per-group power sums (n, Σx, Σx²) — one grouped aggregate over the
    fact join, one 5-row reduce; the textbook identity SS_w = Σx² −
    Σ(S_g²/n_g) avoids a second data pass. The SS terms cancel ~4 orders
    of magnitude off Σx² ≈ 1e18, leaving ~1e3 of float noise — they are
    reported in millions (round 2) where that noise vanishes, and the
    F ratio divides it out entirely. Completes the inference
    toolkit alongside q_welch_ttest (2 groups), q_chi2_independence
    (categorical), q_ks_test (distributional). One SQL text runs verbatim
    on Spark and DuckDB."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ANOVA_SQL)


@query(
    "q_assoc_rules",
    oracle="""
    WITH part_orders AS (
      SELECT l_partkey, count(DISTINCT l_orderkey) AS n_ord
      FROM lineitem GROUP BY l_partkey
    ),
    pair_orders AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             count(DISTINCT a.l_orderkey) AS n_ab
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(DISTINCT a.l_orderkey) >= 3
    ),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem)
    SELECT pa, pb, n_ab,
      round(n_ab * 1e0 / oa.n_ord, 6)                        AS confidence_ab,
      round(n_ab * 1e0 * t.n / (oa.n_ord * ob.n_ord), 6)     AS lift
    FROM pair_orders
    JOIN part_orders oa ON pa = oa.l_partkey
    JOIN part_orders ob ON pb = ob.l_partkey
    CROSS JOIN tot t
    ORDER BY lift DESC, pa, pb
    LIMIT 10
    """,
    tags=("analytics",),
)
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over market baskets: top-10 part pairs by LIFT
    (support ≥ 3 orders), with the a→b confidence. Order-bounded pair
    fan-out (≤ 21 pairs per order) keeps the candidate relation linear in
    orders; the part-support relation is vocabulary-sized and broadcast
    back twice. Ordering is on the ROUNDED lift with a full (pa, pb)
    tiebreak so the top-10 cut is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part_orders = li.groupBy("l_partkey").agg(
        F.count_distinct("l_orderkey").alias("n_ord")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count_distinct("l_orderkey").alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    tot = li.agg(F.count_distinct("l_orderkey").alias("n"))
    oa = part_orders.select(F.col("l_partkey").alias("pa"), F.col("n_ord").alias("n_a"))
    ob = part_orders.select(F.col("l_partkey").alias("pb"), F.col("n_ord").alias("n_b"))
    return (
        pairs.join(F.broadcast(oa), "pa")
        .join(F.broadcast(ob), "pb")
        .crossJoin(F.broadcast(tot))
        .select(
            "pa",
            "pb",
            "n_ab",
            F.round(F.col("n_ab") * F.lit(1.0) / F.col("n_a"), 6).alias("confidence_ab"),
            F.round(
                F.col("n_ab") * F.lit(1.0) * F.col("n") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(10)
    )


@query(
    "q_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY date_trunc('day', o_orderdate)
    ),
    mu AS (SELECT avg(rev) AS mu FROM daily),
    cusum AS (
      SELECT day,
        round(sum(rev - mu) OVER (
          ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ), 2) AS s
      FROM daily CROSS JOIN mu
    ),
    peak AS (SELECT max(abs(s)) AS smax, count(*) AS n_days FROM cusum)
    SELECT
      min(c.day)        AS changepoint_day,
      round(min(p.smax), 2) AS max_cusum,
      CAST(min(p.n_days) AS BIGINT) AS n_days
    FROM cusum c CROSS JOIN peak p
    WHERE abs(c.s) = p.smax
    """,
    tags=("analytics", "finance", "timeseries"),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection via CUSUM: the day where the cumulative sum of
    mean-deviations of daily revenue peaks in magnitude — the classic
    single-changepoint estimator (argmax |S_t|). The cumulative sum runs
    through the distributed range-bucketed prefix machinery
    (functions/ranks.py; the oracle's plain global window is DuckDB's
    prerogative) and is ROUNDED to cents before the argmax, so the
    engines' different summation trees cannot flip the peak choice; ties
    resolve to the earliest day on both engines."""
    from bigdatainfinance1_spark.functions.ranks import global_running_sum

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    mu = daily.agg(F.avg("rev").alias("mu"))
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("rev") - F.col("mu")).alias("dev")
    )
    cs = global_running_sum(dev, ["day"], "dev", "_s").select(
        "day", F.round("_s", 2).alias("s")
    )
    peak = cs.agg(F.max(F.abs(F.col("s"))).alias("smax"), F.count(F.lit(1)).alias("n_days"))
    return (
        cs.crossJoin(F.broadcast(peak))
        .filter(F.abs(F.col("s")) == F.col("smax"))
        .agg(
            F.min("day").alias("changepoint_day"),
            F.round(F.min("smax"), 2).alias("max_cusum"),
            F.min("n_days").cast("long").alias("n_days"),
        )
    )


@query(
    "q_clustering_coefficient",
    oracle="""
    WITH und AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM und e1 JOIN und e2 ON e1.v = e2.u
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT
      CAST(count(*) AS BIGINT)                     AS n_nodes,
      CAST(sum(d) / 2 AS BIGINT)                   AS n_edges,
      CAST(sum(d * (d - 1) / 2) AS BIGINT)         AS n_wedges,
      CAST(min(t.n_tri) AS BIGINT)                 AS n_triangles,
      round(3e0 * min(t.n_tri) / sum(d * (d - 1) / 2), 6) AS global_cc
    FROM deg CROSS JOIN tri t
    """,
    tags=("analytics", "graph"),
)
def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph transitivity: the global clustering coefficient 3·triangles /
    wedges of the sparsified co-purchase graph — what fraction of open
    wedges close. Degrees come from one groupBy over both edge endpoints
    (integer arithmetic throughout — d(d−1)/2 is exact), triangles from
    the same oriented wedge join as q_triangle_count; one scalar ratio at
    the end. Counts are exact BIGINTs on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
        .cache()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = und.select(F.col("u").alias("t_u"), F.col("v").alias("t_v"))
    e2 = und.select(F.col("u").alias("w_u"), F.col("v").alias("w_v"))
    tri = (
        e1.join(e2, F.col("t_v") == F.col("w_u"))
        .join(und, (F.col("u") == F.col("t_u")) & (F.col("v") == F.col("w_v")))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.crossJoin(F.broadcast(tri))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            (F.sum("d") / 2).cast("long").alias("n_edges"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
            F.min("n_tri").cast("long").alias("n_triangles"),
            F.round(
                F.lit(3.0) * F.min("n_tri") / F.sum(F.col("d") * (F.col("d") - 1) / 2), 6
            ).alias("global_cc"),
        )
    )


_BM25_TERMS = ("spark", "join", "fast")


@query(
    "q_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id
    ),
    avgdl AS (SELECT avg(doclen) AS avgdl FROM dl),
    n_docs AS (SELECT count(*) AS n FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
        sum(
          ln((n.n - df.df + 0.5e0) / (df.df + 0.5e0) + 1e0)
          * tf.tf * 2.2e0
          / (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.doclen / a.avgdl))
        ) AS score
      FROM tf
      JOIN df ON tf.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN avgdl a CROSS JOIN n_docs n
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
    tags=("text", "llm-pipeline"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text retrieval scoring: BM25 top-10 documents for the query
    {spark, join, fast} — k1=1.2, b=0.75, the Robertson idf with +1
    floor (Lucene's formulation). The token stream is filtered to the
    query terms BEFORE any aggregation (vocabulary-sized tf/df relations,
    both broadcastable); doc lengths and the corpus constants ride in as
    broadcast one-row relations. Ordering is on the rounded score with a
    doc_id tiebreak so the cut is engine-stable. This is the retrieval
    complement to q_tfidf_top (keyword extraction) and q_cosine_topk
    (dense retrieval)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen"))
    consts = dl.agg(F.avg("doclen").alias("avgdl")).crossJoin(
        docs.agg(F.count(F.lit(1)).alias("n"))
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * F.col("tf") * 2.2 / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("doclen") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@query(
    "q_k_anonymity",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS cell_n
      FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT
      count(*)                                        AS n_cells,
      CAST(min(cell_n) AS BIGINT)                     AS min_cell,
      count(CASE WHEN cell_n < 5 THEN 1 END)          AS cells_below_k5,
      CAST(sum(CASE WHEN cell_n < 5 THEN cell_n ELSE 0 END) AS BIGINT)
                                                      AS rows_at_risk,
      round(sum(CASE WHEN cell_n < 5 THEN cell_n ELSE 0 END) * 1e0
            / sum(cell_n), 6)                         AS risk_share
    FROM cells
    """,
    tags=("analytics", "quality"),
)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy screen: k-anonymity over the quasi-identifier pair
    (market segment × nation) — how many equivalence classes fall below
    k=5, and what share of rows they expose. The release-gate check a
    data-governance pipeline runs before publishing micro-data; one
    groupBy for the cells, one reduce for the report. At 100 TB the cell
    relation is |QI-domain|-sized — tiny — regardless of row count."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cell_n")
    )
    below = F.when(F.col("cell_n") < 5, F.col("cell_n")).otherwise(0)
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("cell_n").cast("long").alias("min_cell"),
        F.count(F.when(F.col("cell_n") < 5, 1)).alias("cells_below_k5"),
        F.sum(below).cast("long").alias("rows_at_risk"),
        F.round(F.sum(below) * F.lit(1.0) / F.sum("cell_n"), 6).alias("risk_share"),
    )


@query(
    "q_business_day_lag",
    oracle="""
    WITH lag AS (
      SELECT
        o.o_orderpriority,
        (5 * CAST(floor(datediff('day', DATE '1970-01-05', l.l_shipdate) / 7e0) AS BIGINT)
           + least(datediff('day', DATE '1970-01-05', l.l_shipdate) % 7, 5))
        -
        (5 * CAST(floor(datediff('day', DATE '1970-01-05', o.o_orderdate) / 7e0) AS BIGINT)
           + least(datediff('day', DATE '1970-01-05', o.o_orderdate) % 7, 5))
          AS bdays
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT
      o_orderpriority,
      count(*) AS n_lines,
      round(avg(bdays), 4) AS avg_bdays,
      round(quantile_cont(bdays, 0.5), 4) AS median_bdays,
      CAST(max(bdays) AS BIGINT) AS max_bdays
    FROM lag GROUP BY o_orderpriority
    """,
    tags=("analytics", "finance", "timeseries"),
)
def business_day_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Settlement-style lag: order→ship time in BUSINESS DAYS (weekends
    excluded), per priority. Weekday counting is the closed-form prefix
    function f(d) = 5·⌊n/7⌋ + min(n mod 7, 5) with n = days since a
    Monday epoch (1970-01-05) — pure integer arithmetic on both engines,
    no calendar table, no per-day iteration (the f(ship) − f(order)
    difference counts weekdays in the interval exactly). Integer lags
    make the median interpolation engine-exact."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    anchor = F.lit("1970-01-05").cast("date")

    def weekday_prefix(col):
        n = F.datediff(col, anchor)
        return 5 * F.floor(n / F.lit(7.0)).cast("long") + F.least(n % 7, F.lit(5))

    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        (weekday_prefix(F.col("l_shipdate")) - weekday_prefix(F.col("o_orderdate"))).alias(
            "bdays"
        ),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.avg("bdays"), 4).alias("avg_bdays"),
        F.round(F.expr("percentile(bdays, 0.5)"), 4).alias("median_bdays"),
        F.max("bdays").cast("long").alias("max_bdays"),
    )


_SHARE_SQL = """
    WITH nat AS (
      SELECT r.r_name, n.n_name, round(sum(o.o_totalprice), 2) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT
      r_name, n_name, rev,
      round(rev / sum(rev) OVER (PARTITION BY r_name), 6) AS share_of_region,
      round(rev / sum(rev) OVER (), 6)                    AS share_of_total
    FROM nat
"""


@query("q_share_of_total", oracle=_SHARE_SQL, tags=("analytics", "finance"))
def share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: each nation's revenue share of its region and
    of the world — the windowed percent-of-total every BI layer computes.
    The windows run over the 25-row aggregate, not the fact table (the
    aggregate-then-window order matters at scale: windowing facts first
    would shuffle everything twice); shares divide identical per-day-
    rounded sums, so round-6 is ulp-safe. One SQL text runs verbatim on
    Spark and DuckDB; the global-share window runs over the bounded
    25-row aggregate (the repo's no-unpartitioned-window rule targets
    fact-sized DataFrame Window specs — SQL windows over catalog-bounded
    aggregates are the sanctioned exception, cf. q_ohlc_bars)."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SHARE_SQL)
