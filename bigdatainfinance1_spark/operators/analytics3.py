"""Round-2 continuation, fourth wave: ML-evaluation and CDC/ETL operators —
rank-based AUC per month, change-data-capture log application (last-writer-
wins upsert + delete, the Debezium/Delta-CDF apply shape), trailing-window
distinct-user counts (the sliding COUNT(DISTINCT) Spark windows cannot
express natively), and mean-reciprocal-rank on the shared BM25 candidate
relation.

House rules throughout: money as exact integer cents (BIGINT) divided once
at the end; AUC numerators kept in integer arithmetic until the final
division so both engines agree bit-for-bit before the 6-dp round; every
window spec starts with partitionBy (repo rule, asserted in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.operators.retrieval import _CAND_SQL, _candidates
from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table


@query(
    "q_auc_by_month",
    oracle="""
    WITH scored AS (
      SELECT
        CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate) AS m,
        CAST(round(o_totalprice * 100) AS BIGINT)                   AS cents,
        CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END             AS pos
      FROM orders
    ),
    per_score AS (
      SELECT m, cents,
             CAST(sum(pos) AS BIGINT)     AS np,
             CAST(sum(1 - pos) AS BIGINT) AS nn
      FROM scored GROUP BY m, cents
    ),
    cum AS (
      SELECT m, np, nn,
             coalesce(sum(nn) OVER (
               PARTITION BY m ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_nn
      FROM per_score
    )
    SELECT
      m,
      CAST(sum(np) AS BIGINT) AS n_pos,
      CAST(sum(nn) AS BIGINT) AS n_neg,
      round(
        CASE WHEN sum(np) = 0 OR sum(nn) = 0 THEN NULL
             ELSE CAST(sum(2 * np * cum_nn + np * nn) AS DOUBLE)
                  / (2e0 * sum(np) * sum(nn))
        END, 6) AS auc
    FROM cum
    GROUP BY m
    """,
    tags=("analytics", "ml-eval", "stats"),
)
def auc_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based ROC-AUC per order month: how well o_totalprice separates
    finalized ('F') orders from the rest — the Mann-Whitney formulation
    (q_mann_whitney is the hypothesis-test twin; this is the ML-eval
    reading of the same statistic). Ties get the standard half credit:
    AUC = [Σ_s np(s)·cumneg(<s) + ½·np(s)·nn(s)] / (NP·NN), computed over
    per-score counts so the window walks distinct scores, not rows. The
    numerator is kept ×2 in BIGINT (2·np·cumneg + np·nn — all integers) so
    both engines sum exactly, with ONE double division at the end, rounded
    to 6 dp. Scale: one groupBy on (month, score) absorbs the row count;
    the cumulative window is partitioned by month (bounded group ≈ distinct
    scores per month) — linear, no global ordering anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate")).alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    per_score = scored.groupBy("m", "cents").agg(
        F.sum("pos").cast("long").alias("np"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("nn"),
    )
    w = (
        Window.partitionBy("m")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.withColumn("cum_nn", F.coalesce(F.sum("nn").over(w), F.lit(0)))
    return cum.groupBy("m").agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.round(
            F.when(
                (F.sum("np") == 0) | (F.sum("nn") == 0), F.lit(None).cast("double")
            ).otherwise(
                F.sum(
                    F.lit(2) * F.col("np") * F.col("cum_nn")
                    + F.col("np") * F.col("nn")
                ).cast("double")
                / (F.lit(2.0) * F.sum("np") * F.sum("nn"))
            ),
            6,
        ).alias("auc"),
    )


# The synthetic CDC log derived deterministically from orders: every row an
# INSERT at seq 1; keys divisible by 5 get a +10% price UPDATE at seq 2;
# keys divisible by 7 a DELETE at seq 3. Both engines build the identical
# log, so applying it is the operator under test, not the generator.
_CDC_LOG_SQL = """
    log AS (
      SELECT o_orderkey AS k, o_orderpriority AS prio, 1 AS seq, 'I' AS op,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_orderpriority, 2, 'U',
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CAST(round(o_totalprice * 100) AS BIGINT) // 10
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, o_orderpriority, 3, 'D', NULL
      FROM orders WHERE o_orderkey % 7 = 0
    )
"""


@query(
    "q_cdc_apply",
    oracle=f"""
    WITH {_CDC_LOG_SQL},
    latest AS (
      SELECT k, prio, seq, op, cents,
             row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM log
    ),
    live AS (SELECT * FROM latest WHERE rn = 1 AND op <> 'D')
    SELECT
      prio,
      CAST(count(*) AS BIGINT)                                  AS n_live,
      CAST(sum(CASE WHEN seq = 2 THEN 1 ELSE 0 END) AS BIGINT)  AS n_updated,
      CAST(sum(cents) AS BIGINT)                                AS sum_cents
    FROM live
    GROUP BY prio
    """,
    tags=("etl", "cdc", "upsert"),
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse an ordered I/U/D log to current
    table state by last-writer-wins per key — the core of every CDC sink
    (Debezium consumer, Delta MERGE from change feed; q_merge_upsert is the
    two-snapshot twin, this is the log-replay form). The log is synthesized
    deterministically from orders (see _CDC_LOG_SQL) so both engines replay
    the identical stream. Apply = row_number per key ordered by seq DESC,
    keep rn=1, drop tombstones, then aggregate live state per priority.
    Prices stay exact integer cents; the +10% update is integer DIV 10 so
    no engine rounds differently. Scale: one shuffle on the key for the
    window (the same partitioning a real CDC sink maintains), then a
    5-group aggregate — at 100 TB the log is already key-partitioned by
    the source, making the window shuffle-free."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        cents.alias("cents"),
    )
    upd = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.lit(2).alias("seq"),
            F.lit("U").alias("op"),
            (cents + F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 10")).alias("cents"),
        )
    )
    dele = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.lit(3).alias("seq"),
            F.lit("D").alias("op"),
            F.lit(None).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    live = (
        base.unionByName(upd)
        .unionByName(dele)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return live.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_live"),
        F.sum(F.when(F.col("seq") == 2, 1).otherwise(0)).cast("long").alias("n_updated"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@query(
    "q_rolling_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT
        datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM du)
    SELECT
      days.d AS d,
      CAST(count(DISTINCT du.user_id) AS BIGINT) AS n_users_7d
    FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
    tags=("window", "events", "distinct"),
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding
    COUNT(DISTINCT) that SQL window frames cannot express (DISTINCT is
    illegal in a windowed aggregate in Spark) and naive range self-joins
    turn into a nested-loop. Shape: dedup to (day, user) pairs first (the
    row count collapses to active-pairs), then EXPLODE each pair to the ≤7
    future days it covers via sequence(), equi-join back to the observed-day
    spine, and count distinct per day. Every join is an equi-join — no
    BroadcastNestedLoopJoin — and the explode factor is a constant 7, so
    the plan is linear in active pairs at any scale; the oracle uses the
    equivalent BETWEEN range-join formulation DuckDB plans natively."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("d"),
        "user_id",
    ).distinct()
    days = du.select(F.col("d").alias("spine_d")).distinct()
    covered = du.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("cover_d"), "user_id"
    )
    return (
        covered.join(days, covered["cover_d"] == days["spine_d"])
        .groupBy(F.col("spine_d").alias("d"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users_7d"))
    )


@query(
    "q_mrr",
    oracle=f"""
    WITH {_CAND_SQL},
    graded AS (
      SELECT c.term, c.doc_id, c.bm25,
             CASE WHEN CAST(substr(d.source, 4) AS INT) % 4 >= 2
                  THEN 1 ELSE 0 END AS rel
      FROM cand c JOIN documents d ON c.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS pos
      FROM graded
    )
    SELECT
      term,
      CAST(sum(rel) AS BIGINT)                    AS n_rel,
      CAST(min(CASE WHEN rel = 1 THEN pos END) AS BIGINT) AS first_rel_pos,
      round(coalesce(1e0 / min(CASE WHEN rel = 1 THEN pos END), 0e0), 6) AS rr
    FROM ranked
    GROUP BY term
    """,
    tags=("text", "llm-pipeline", "retrieval"),
)
def mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank per query term for the BM25 ranking (the third
    retrieval-eval metric next to q_ndcg and q_rrf_fusion, on the same
    candidate relation and the same deterministic relevance: source grade
    ≥ 2 → relevant). rr = 1/position of the first relevant document, 0 when
    none is relevant; the driver-side mean over terms IS the MRR. Ranks
    order by (rounded bm25, doc_id) — a total order, engine-stable. Scale:
    identical to q_ndcg — windows partitioned on the term axis, candidate
    sets bounded per term."""
    cand = _candidates(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    graded = cand.join(docs, "doc_id").select(
        "term",
        "doc_id",
        "bm25",
        F.when(F.substring("source", 4, 10).cast("int") % 4 >= 2, 1).otherwise(0).alias("rel"),
    )
    w = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    ranked = graded.select("term", "rel", F.row_number().over(w).alias("pos"))
    first_pos = F.min(F.when(F.col("rel") == 1, F.col("pos")))
    return ranked.groupBy("term").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        first_pos.cast("long").alias("first_rel_pos"),
        F.round(F.coalesce(F.lit(1.0) / first_pos, F.lit(0.0)), 6).alias("rr"),
    )
