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

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

K = 8
ITERS = 5
DIM = 64


def _centroid_literal(cents: list[list[float]]):
    """k×64 centroid matrix as a nested array literal baked into the plan —
    one parsed expr instead of k×64 py4j F.lit crossings (~0.5 s/iteration
    at k=8, measured round 5); see double_matrix_literal."""
    from bigdatainfinance1_spark.functions.vector import double_matrix_literal

    return double_matrix_literal(cents)


# Above this k, the plan-literal assignment expression (k x 64 literals
# inside a transform/aggregate fold) blows past codegen limits and runs
# interpreted — measured 25x at 10x corpus via q_semdedup's corpus-derived
# k. The join-based strategy below scales instead.
ASSIGN_LITERAL_MAX_K = 16

# FLOP budget for EXACT assignment: n_rows * k distance evaluations per
# Lloyd pass. With q_semdedup's corpus-derived k = n/250, exact assignment
# is n²/250 FLOPs — measured 60.6x wall at 100x corpus (round-5 verdict
# task 2, the suite's last quadratic trajectory). Above this budget
# ``_assign`` auto-switches to the IVF-bucketed probe (coarse-quantize the
# centroids, probe only the nearest cells), mirroring JACCARD_PAIR_BUDGET's
# auto-switch in dedup.py. Sized so it can NEVER trip at oracle tiers or
# the sf0.1 bench (n <= 2000 -> k = 8 -> 16k evals, and those take the
# literal path anyway) while tripping well before the measured quadratic
# blow-up (100x tier: n = 200k, k = 800 -> 1.6e8 evals).
ASSIGN_EXACT_BUDGET = 2_000_000
# Coarse cells probed per vector on the IVF path. Probe work is
# n * (k_coarse + nprobe * k / k_coarse) ≈ n * sqrt(k) * (1 + nprobe)
# with k_coarse = ceil(sqrt(k)) — n^1.5/16 total for k = n/250, vs n²/250
# exact: sub-linear per-unit growth at every decade.
IVF_ASSIGN_NPROBE = 4


def _coarse_quantize(cents: list[list[float]]):
    """Driver-side numpy Lloyd over the k FINE centroids (k x 64 doubles —
    O(model), already driver-resident by the loop's construction; the
    paper's k = 50k is ~25 MB): returns (coarse_centroids, cell_of_fine).
    Deterministic: init = first ceil(sqrt(k)) centroids, argmin ties break
    to the lowest cell (numpy argmin), 5 fixed iterations. Distances via
    the matmul identity |a-b|² = |a|² + |b|² - 2ab so the intermediate is
    k x k_coarse, never k x k_coarse x 64."""
    import numpy as np

    x = np.asarray(cents, dtype=np.float64)
    k = len(cents)
    kc = max(4, math.isqrt(k - 1) + 1)  # ceil(sqrt(k))
    cc = x[:kc].copy()

    def d2_matrix(a, b):
        return (a * a).sum(axis=1)[:, None] + (b * b).sum(axis=1)[None, :] - 2.0 * (a @ b.T)

    for _ in range(5):
        assign = d2_matrix(x, cc).argmin(axis=1)
        for c in range(kc):
            members = x[assign == c]
            if len(members):
                cc[c] = np.round(members.mean(axis=0), 12)
    return cc, d2_matrix(x, cc).argmin(axis=1)


def _assign_ivf(emb: DataFrame, cents: list[list[float]], nprobe: int = None) -> DataFrame:
    """IVF-bucketed (approximate) Lloyd assignment for over-budget n*k:
    coarse-quantize the k centroids into ~sqrt(k) cells driver-side, then
    ONE narrow Arrow mapInPandas pass over the corpus — zero shuffles —
    where numpy ranks the occupied cells per vector by coarse distance and
    computes exact distances only to the fine centroids of the nprobe
    nearest cells. Dense distance linear algebra is the documented
    exception to the built-ins-first rule (the kNN-label-eval block-matmul
    precedent): the SQL higher-order-function fold runs interpreted per
    element, measured 124 s for the 5-pass loop at n=200k/k=800, vs
    vectorized numpy at memory bandwidth.

    Accumulation is sequential over dims (see _seq_d2) — the same
    left-to-right correctly-rounded IEEE steps as the exact fold — but d2
    is NOT re-rounded to 12 dp here: the rounding exists for cross-engine
    oracle agreement, and no value-hash oracle ever sees this path (it
    runs only above ASSIGN_EXACT_BUDGET). Ties break to the lowest cid,
    like the exact path. Every vector gets >= 1 candidate because only
    occupied cells are ranked; with nprobe >= #occupied cells the probe
    covers every centroid and reproduces the exact argmin (asserted in
    tests up to d2 rounding). Centroids travel inside the serialized
    worker function — O(k x 64) doubles, ~25 MB at the SemDeDup paper's
    k=50k, the same O(model) bound as the driver's centroid state."""
    import numpy as np
    import pandas as pd

    if nprobe is None:
        nprobe = IVF_ASSIGN_NPROBE
    coarse, cell_of = _coarse_quantize(cents)
    fine_mat = np.asarray(cents, dtype=np.float64)
    occupied = sorted({int(c) for c in cell_of})
    coarse_mat = coarse[occupied]
    # fine centroid ids per occupied cell, ascending (argmin first-hit =
    # lowest cid, matching the exact path's struct-min tiebreak)
    cell_members = [np.nonzero(cell_of == c)[0] for c in occupied]
    nprobe_eff = min(nprobe, len(occupied))

    def _seq_d2(x: "np.ndarray", m: "np.ndarray") -> "np.ndarray":
        """(n x d) vs (c x d) -> n x c squared distances, accumulated
        left-to-right over dims: per-element the identical IEEE add/mul
        sequence as the SQL fold, vectorized over rows."""
        acc = np.zeros((x.shape[0], m.shape[0]), dtype=np.float64)
        for d in range(x.shape[1]):
            diff = x[:, d, None] - m[None, :, d]
            acc = acc + diff * diff
        return acc

    def assign_batches(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = x.shape[0]
            cd2 = _seq_d2(x, coarse_mat)
            order = np.argsort(cd2, axis=1, kind="stable")[:, :nprobe_eff]
            best_d = np.full(n, np.inf)
            best_c = np.full(n, 2**31 - 1, dtype=np.int64)
            for j in range(len(occupied)):
                rows = np.nonzero((order == j).any(axis=1))[0]
                if not len(rows):
                    continue
                fd2 = _seq_d2(x[rows], fine_mat[cell_members[j]])
                loc = fd2.argmin(axis=1)  # ties -> first = lowest cid
                d = fd2[np.arange(len(rows)), loc]
                cid = cell_members[j][loc]
                upd = (d < best_d[rows]) | (
                    (d == best_d[rows]) & (cid < best_c[rows])
                )
                best_d[rows] = np.where(upd, d, best_d[rows])
                best_c[rows] = np.where(upd, cid, best_c[rows])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "embedding": pdf["embedding"],
                    "cid": best_c.astype("int32"),
                    "d2": best_d,
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign_batches,
        schema="vec_id long, embedding array<double>, cid int, d2 double",
    )


def _assign(emb: DataFrame, cents: list[list[float]], n_rows: int | None = None) -> DataFrame:
    """Per vector: squared distance to each centroid, argmin. Distances are
    rounded to 12 dp before the argmin so Spark's sequential fold and
    DuckDB's group-sum (different summation orders, ~1e-14 ulps) agree
    bit-for-bit — the q_pca_power_iteration determinism recipe.

    Three strategies; the first two are bitwise-identical exact Lloyd
    (asserted equal in tests/test_fuzz.py):

    - k <= {ASSIGN_LITERAL_MAX_K}: centroids ride as a plan literal into a
      narrow map (no shuffle at all) — right for the oracle tiers.
    - larger k within budget (q_semdedup's corpus-derived k): centroids
      become a k-row broadcast relation; the vector x centroid expansion
      is a broadcast nested-loop of a bounded side, distances stay in
      codegen, and the argmin is one min(struct(d2, cid)) groupBy —
      lexicographic struct min = lowest distance then lowest cid, exactly
      the literal fold's strict-< first-index tiebreak.
    - n_rows * k > ASSIGN_EXACT_BUDGET: exact assignment is the suite's
      one quadratic trajectory (k ∝ n); auto-switch to the IVF-bucketed
      probe (``_assign_ivf``). The gate can never trip at oracle tiers,
      so every value-hash oracle still verifies exact Lloyd unchanged."""
    d2_of = (
        "round(aggregate(zip_with(embedding, {c}, (x, m) ->"
        " (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 12)"
    )
    if len(cents) <= ASSIGN_LITERAL_MAX_K:
        with_c = emb.withColumn("cents", _centroid_literal(cents))
        dists = F.expr(f"transform(sequence(0, {len(cents) - 1}), c -> " + d2_of.format(c="cents[c]") + ")")
        # argmin with lowest-index tiebreak: fold over (best_i, best_d)
        argmin = F.expr(
            f"aggregate(sequence(0, {len(cents) - 1}), named_struct('i', -1, 'd', CAST('Infinity' AS DOUBLE)),"
            " (acc, c) -> IF(dists[c] < acc.d, named_struct('i', c, 'd', dists[c]), acc)).i"
        )
        return (
            with_c.withColumn("dists", dists)
            .withColumn("cid", argmin)
            .select(
                "vec_id", "embedding", "cid", F.element_at("dists", F.col("cid") + 1).alias("d2")
            )
        )
    if n_rows is not None and n_rows * len(cents) > ASSIGN_EXACT_BUDGET:
        import warnings

        warnings.warn(
            f"lloyd _assign: exact-assignment estimate {n_rows * len(cents)} "
            f"(n={n_rows} x k={len(cents)}) exceeds budget {ASSIGN_EXACT_BUDGET}; "
            f"switching to IVF-bucketed probe (nprobe={IVF_ASSIGN_NPROBE}, "
            "approximate — never reached at oracle tiers)",
            stacklevel=2,
        )
        return _assign_ivf(emb, cents)
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "cid int, cent array<double>",
    )
    best = (
        emb.crossJoin(F.broadcast(cdf))
        .select("vec_id", F.expr(d2_of.format(c="cent")).alias("d2"), "cid")
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("b"))
        .select("vec_id", F.col("b.cid").alias("cid"), F.col("b.d2").alias("d2"))
    )
    return emb.join(best, "vec_id").select("vec_id", "embedding", "cid", "d2")


def _kmeans_oracle(k: int = K, iters: int = ITERS) -> str:
    """DuckDB oracle for q_kmeans_embeddings: the 5 Lloyd iterations
    unrolled as chained CTEs (the q_pca_power_iteration pattern — round-2
    verdict task 6 upgraded this query from rows-only to full value-hash).
    Init = the k lowest vec_ids; every distance and centroid mean is
    rounded to 12 dp on both engines so they iterate on bit-identical
    state; argmin ties break to the lowest cluster id in both (Spark's
    strict-< fold keeps the first index; here row_number orders by
    (d2, cid))."""
    return f"""
    {lloyd_cte(k, iters)}
    SELECT
      CAST(cid AS BIGINT)       AS cid,
      CAST(count(*) AS BIGINT)  AS n_vecs,
      round(sum(CAST(round(sqrt(d2) * 1e6) AS BIGINT)) * 1.0 / count(*) / 1e6, 4)
                                AS avg_dist
    FROM a{iters}
    GROUP BY cid
    """


def lloyd_cte(k: int = K, iters: int = ITERS) -> str:
    """The unrolled-Lloyd CTE prefix, factored out so sibling oracles can
    build on the SAME deterministic clustering (q_kmeans_embeddings groups
    it; q_semdedup joins within-cluster pairs onto it). Exposes ``x``
    (exploded vectors: vec_id, i, v) and ``a{iters}`` (the final
    assignment: vec_id, cid, d2)."""
    head = f"""
    WITH x AS MATERIALIZED (
      SELECT vec_id, s.i AS i, CAST(embedding[s.i] AS DOUBLE) AS v
      FROM embeddings, generate_series(1, {DIM}) s(i)
    ),
    init_ids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM embeddings ORDER BY vec_id LIMIT {k}
    ),
    c0 AS (SELECT n.cid, x.i, x.v AS m FROM x JOIN init_ids n USING (vec_id))
    """
    steps = ""
    for t in range(1, iters + 1):
        steps += f""",
    d{t} AS (
      SELECT x.vec_id, c.cid, round(sum((x.v - c.m) * (x.v - c.m)), 12) AS d2
      FROM x JOIN c{t - 1} c ON x.i = c.i
      GROUP BY x.vec_id, c.cid
    ),
    a{t} AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d{t}
      ) WHERE rn = 1
    )"""
        if t < iters:  # the final assignment is the output; no update after it
            steps += f""",
    n{t} AS (
      SELECT a.cid, x.i, round(avg(x.v), 12) AS m
      FROM a{t} a JOIN x ON a.vec_id = x.vec_id
      GROUP BY a.cid, x.i
    ),
    c{t} AS (
      SELECT p.cid, p.i, coalesce(n.m, p.m) AS m
      FROM c{t - 1} p LEFT JOIN n{t} n ON p.cid = n.cid AND p.i = n.i
    )"""
    return f"{head}{steps}"


def lloyd_assignments(
    spark: SparkSession, sf_dir: str, k: int = K, n_rows: int | None = None
) -> DataFrame:
    """Run the deterministic Lloyd loop and return the FINAL assignment
    relation (vec_id, embedding, cid, d2) — shared by q_kmeans_embeddings
    (k=K so its unrolled-Lloyd oracle matches) and q_semdedup (k derived
    from corpus size — the SemDeDup paper's knob; round-3 verdict task 4)
    so the queries and their oracles, via ``lloyd_cte``, agree on one
    clustering wherever k resolves to K. Scale shape per iteration is
    documented in the module docstring: broadcast-literal centroids in,
    one narrow assign pass, one k×64 groupBy out; the driver holds only k
    vectors (at the paper's k=50k that is ~25 MB — at that size the
    centroid matrix should ride a broadcast join instead of a plan
    literal; the literal is right for the k ≤ O(100) tiers here)."""
    from bigdatainfinance1_spark.functions.partitioning import parallelize_scan

    # the per-iteration assignment fold (k x DIM per row, interpreted HOF)
    # runs in the persisted relation's partitions — spread a few-split scan
    # across cores before persisting or all 5 passes serialize on one task
    emb = parallelize_scan(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ).persist()
    init = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("c"))
        .collect()
    )
    cents = [row["c"] for row in init]
    assigned = None
    for _ in range(ITERS):
        assigned = _assign(emb, cents, n_rows=n_rows)
        # One groupBy (cid, pos) shuffle per iteration; the k×DIM mean rows
        # (512 at k=8 — O(model), bounded like every driver collect in this
        # repo) are assembled into centroid arrays driver-side instead of a
        # second collect_list/array_sort shuffle stage. Measured round 5:
        # 5-iteration loop 9.0 s -> 5.4 s at sf0.1; means are the identical
        # 12-dp-rounded per-(cid, pos) averages, so assignments are unchanged.
        new = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 12).alias("m"))
            .collect()
        )
        # empty clusters keep their previous centroid
        by_id: dict[int, list[float]] = {}
        for row in new:
            by_id.setdefault(row["cid"], [None] * DIM)[row["pos"]] = row["m"]
        # round-5 ADVICE: a hole here (short embedding array or an all-null
        # position averaging to null) would crash double_matrix_literal a
        # whole iteration later with an opaque TypeError — fail HERE naming
        # the slot instead.
        for cid, cent in by_id.items():
            holes = [p for p, m in enumerate(cent) if m is None]
            if holes:
                raise ValueError(
                    f"lloyd_assignments: centroid {cid} missing positions "
                    f"{holes[:5]}{'...' if len(holes) > 5 else ''} after the "
                    f"update pass — embeddings shorter than DIM={DIM} or an "
                    "all-null position"
                )
        cents = [by_id.get(i, cents[i]) for i in range(k)]
    emb.unpersist()
    return assigned


@query("q_kmeans_embeddings", oracle=_kmeans_oracle(), tags=("ml", "iterative", "llm"))
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (k=8, 5 Lloyd iterations) over embeddings;
    returns per-cluster size and dispersion. Full value-hash oracle since
    round 3: the Lloyd loop is deterministic by construction (lowest-vec_id
    init, lowest-id tiebreaks, 12-dp-rounded distances and means), so the
    DuckDB oracle unrolls the identical iterations as chained CTEs and both
    engines converge on bit-identical assignments. The loop itself (and
    its corpus-persist caching discipline) lives in ``lloyd_assignments``,
    shared with q_semdedup."""
    # Emission hardening (round-6 window rule): snap each per-vector
    # distance to an exact 1e-6-grain BIGINT before the mean — sqrt(d2) is
    # bit-identical on both engines (d2 is 12-dp state), so the snapped sum
    # is order-insensitive integer arithmetic and the final round sees
    # identical inputs (kills the engine-ordered double-summation flake
    # class, the r5 q_weighted_reservoir_es lesson).
    return (
        lloyd_assignments(spark, sf_dir)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.round(F.sqrt("d2") * 1e6).cast("long"))
                * F.lit(1.0)
                / F.count(F.lit(1))
                / 1e6,
                4,
            ).alias("avg_dist"),
        )
        .withColumn("cid", F.col("cid").cast("long"))
    )


PCA_ITERS = 6


def _pca_oracle(iters: int = PCA_ITERS) -> str:
    """DuckDB oracle for q_pca_power_iteration: identical unrolled power
    iterations as chained CTEs (the q_pagerank_copurchase oracle pattern).
    Every intermediate (covariance, matrix-vector products, norms) is
    rounded to 12 dp so both engines iterate on bit-identical state —
    summation-order ulps (~1e-16) can never compound across iterations."""
    head = """
    WITH exploded AS (
      SELECT vec_id, s.i AS i, CAST(embedding[s.i] AS DOUBLE) AS val
      FROM embeddings, generate_series(1, 64) s(i)
    ),
    mu AS (SELECT i, round(avg(val), 6) AS m FROM exploded GROUP BY i),
    centered AS MATERIALIZED (
      SELECT e.vec_id, e.i, e.val - mu.m AS cv
      FROM exploded e JOIN mu ON e.i = mu.i
    ),
    nn AS (SELECT count(DISTINCT vec_id) AS n FROM exploded),
    cov AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             round(sum(a.cv * b.cv) / ((SELECT n FROM nn) - 1), 12) AS c
      FROM centered a JOIN centered b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i
    ),
    v0 AS (SELECT i, 0.125e0 AS x FROM mu)
    """
    steps = "".join(
        f""",
    w{k + 1} AS (
      SELECT cov.i AS i, round(sum(cov.c * v{k}.x), 12) AS w
      FROM cov JOIN v{k} ON cov.j = v{k}.i
      GROUP BY cov.i
    ),
    n{k + 1} AS (SELECT round(sqrt(sum(w * w)), 12) AS nrm FROM w{k + 1}),
    v{k + 1} AS (SELECT i, round(w / (SELECT nrm FROM n{k + 1}), 12) AS x FROM w{k + 1})"""
        for k in range(iters)
    )
    return f"""
    {head}{steps}
    SELECT
      CAST(v.i AS BIGINT)                         AS dim_idx,
      round(v.x, 6)                               AS loading,
      round((SELECT nrm FROM n{iters}), 6)        AS eigenvalue
    FROM v{iters} v
    """


@query("q_pca_power_iteration", oracle=_pca_oracle(), tags=("iterative", "similarity", "llm-pipeline"))
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA first principal component by distributed power iteration — the
    iterative linear-algebra operator class beyond k-means (q_kmeans) and
    graph propagation (q_pagerank, q_bfs_hops): the 64×64 covariance is
    computed FULLY DISTRIBUTED (per-vector dimension pair join → one
    groupBy over 4096 cells — the only pass that touches the corpus),
    then 6 power iterations run driver-side on the collected 64×64
    matrix — bounded state (4096 doubles, the k-means centroid precedent:
    collect only what is O(model), never O(data)); the corpus is never
    revisited. A first cut iterated via 6 chained join+groupBy stages —
    correct, but the deep lazy plan cost ~2 min of scheduler overhead for
    microseconds of math; collecting the bounded matrix is the honest
    production shape. Determinism across engines: means are
    pre-rounded (6 dp), and every iteration re-rounds products and norms
    at 12 dp — well above the ~1e-16 summation-order noise, well below
    the signal — so Spark and DuckDB iterate on bit-identical state and
    the 6-dp outputs match exactly. The final norm IS the eigenvalue
    estimate (‖Σv‖ → λ₁ as v → e₁). At 100 TB the same plan holds: the
    covariance pass is the corpus scan; iterations are O(d²) regardless
    of rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("vec_id", F.posexplode("embedding").alias("pos", "val")).select(
        "vec_id", (F.col("pos") + 1).alias("i"), F.col("val").cast("double").alias("val")
    )
    mu = exploded.groupBy("i").agg(F.round(F.avg("val"), 6).alias("m"))
    centered = exploded.join(F.broadcast(mu), "i").select(
        "vec_id", "i", (F.col("val") - F.col("m")).alias("cv")
    )
    n = emb.count()
    a = centered.select("vec_id", F.col("i").alias("ai"), F.col("cv").alias("acv"))
    b = centered.select("vec_id", F.col("i").alias("j"), F.col("cv").alias("bcv"))
    cov_rows = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), "j")
        .agg(F.round(F.sum(F.col("acv") * F.col("bcv")) / (n - 1), 12).alias("c"))
        .collect()
    )
    cov = {(r["i"], r["j"]): r["c"] for r in cov_rows}
    # half-away rounding matching DuckDB bitwise (functions/rounding.py) —
    # exact .5 boundaries at the 12th dp are measure-zero over continuous
    # covariances, but the shared helper closes even that door.
    from bigdatainfinance1_spark.functions.rounding import rnd_half_away as rnd

    v = {i: 0.125 for i in range(1, DIM + 1)}
    nrm = 0.0
    for _ in range(PCA_ITERS):
        w = {
            i: rnd(sum(cov[(i, j)] * v[j] for j in range(1, DIM + 1)), 12)
            for i in range(1, DIM + 1)
        }
        nrm = rnd(sum(x * x for x in w.values()) ** 0.5, 12)
        v = {i: rnd(w[i] / nrm, 12) for i in range(1, DIM + 1)}
    rows = [(i, rnd(v[i], 6), rnd(nrm, 6)) for i in range(1, DIM + 1)]
    return spark.createDataFrame(rows, "dim_idx long, loading double, eigenvalue double")
