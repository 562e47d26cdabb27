"""Iterative distributed algorithms (SURVEY.md §5's "genuinely non-SQL-
expressible ops ... iterative algorithms" class): deterministic Lloyd
k-means over the embeddings table, expressed as a driver-coordinated loop
of pure DataFrame stages.

Scale shape per iteration: centroids are k×64 doubles — always tiny — so
they travel as broadcast literals INTO the plan, never as a join; the
assignment pass is one narrow map over the corpus (no shuffle) and the
update pass is one groupBy(cluster) shuffle of k×64 partial sums. That is
the canonical distributed k-means: O(iters) jobs, O(corpus) work each,
driver holds only k vectors. Determinism: init = the k lowest vec_ids,
ties in argmin broken by lowest cluster id — reruns are identical, which
the rows-only gate (and resumability at 100 TB) requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

K = 8
ITERS = 5
DIM = 64


def _centroid_literal(cents: list[list[float]]):
    """k×64 centroid matrix as a nested array literal baked into the plan."""
    return F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents])


def _assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Narrow map: per vector, squared distance to each centroid, argmin."""
    with_c = emb.withColumn("cents", _centroid_literal(cents))
    dists = F.expr(
        f"transform(sequence(0, {len(cents) - 1}), c -> aggregate("
        "zip_with(embedding, cents[c], (x, m) -> (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    # argmin with lowest-index tiebreak: fold over (best_i, best_d)
    argmin = F.expr(
        f"aggregate(sequence(0, {len(cents) - 1}), named_struct('i', -1, 'd', CAST('Infinity' AS DOUBLE)),"
        " (acc, c) -> IF(dists[c] < acc.d, named_struct('i', c, 'd', dists[c]), acc)).i"
    )
    return (
        with_c.withColumn("dists", dists)
        .withColumn("cid", argmin)
        .select("vec_id", "embedding", "cid", F.element_at("dists", F.col("cid") + 1).alias("d2"))
    )


@query("q_kmeans_embeddings", oracle=None, tags=("ml", "iterative", "llm"))
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (k=8, 5 Lloyd iterations) over embeddings;
    returns per-cluster size and dispersion. Rows-only check: the result is
    iteration-order-defined, not SQL-expressible — determinism is asserted
    by our own rerun test instead."""
    # cache the corpus across the Lloyd iterations — the pattern any
    # iterative job uses at scale (each iteration re-reads the cache, not
    # the source files); unpersisted after the loop so the returned lazy
    # DataFrame recomputes from the scan exactly once for the caller.
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").persist()
    init = (
        emb.orderBy("vec_id")
        .limit(K)
        .select(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("c"))
        .collect()
    )
    cents = [row["c"] for row in init]
    assigned = None
    for _ in range(ITERS):
        assigned = _assign(emb, cents)
        new = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.expr("transform(pm, s -> s.m)").alias("c"))
            .orderBy("cid")
            .collect()
        )
        # empty clusters keep their previous centroid
        by_id = {row["cid"]: row["c"] for row in new}
        cents = [by_id.get(i, cents[i]) for i in range(K)]
    emb.unpersist()
    return (
        assigned.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(F.sqrt("d2")), 4).alias("avg_dist"),
        )
        .withColumn("cid", F.col("cid").cast("long"))
    )
