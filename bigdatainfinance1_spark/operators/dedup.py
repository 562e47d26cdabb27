"""Deduplication operators over `documents` (SURVEY.md §2.9 L1/L2):
exact hash dedup, exact n-gram-Jaccard near-dup, MinHash+LSH near-dup,
SimHash fingerprints.

Scale notes: exact dedup is one hash-groupBy (shuffle on a 128-bit key —
uniform, no skew). The exact-Jaccard pair join is quadratic in docs sharing a
shingle; it is the *verifier*, not the scale path. The scale path is MinHash
LSH: signatures are fixed-size (32 hashes) regardless of doc length, band
buckets turn all-pairs into equi-join groups, and only in-bucket candidates
get exact verification — the standard shingle→minhash→band→bucket-join
pipeline, all expressed as DataFrame ops (explode/groupBy/join), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

N_PERM = 32  # minhash permutations
N_BANDS = 8  # 8 bands × 4 rows: catches J≳0.7 with high probability


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingles per doc (docs shorter than 3 tokens carry no
    shingles, mirrored in the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(F.size("t") >= 3)
    return toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")
        ).alias("s"),
    ).distinct()


def _doc_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingles per doc, identified by xxhash64 — the hash is
    taken INSIDE the per-row transform, so the ~25-byte shingle string never
    leaves its row: every downstream shuffle (distinct, equi-join, minhash)
    moves an 8-byte long instead. At 100 TB shuffle bytes are the bottleneck,
    so this is the hot-path form; the string variant above stays for queries
    whose output must expose the shingle text. Jaccard counts are identical
    unless two distinct shingles of one corpus collide in 64 bits
    (P ≈ n²/2⁶⁵ ≈ 1e-8 at sf0.1 — and the fixed testdata is verified
    collision-free by the oracle match)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(F.size("t") >= 3)
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t)-3),"
                " i -> xxhash64(concat_ws(' ', t[i], t[i+1], t[i+2])))"
            )
        ).alias("h"),
    ).distinct()


_SHINGLES_SQL = """
    SELECT DISTINCT doc_id, unnest(
      list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    WHERE len(t) >= 3
"""


@query(
    "q_exact_dedup",
    oracle="""
    SELECT
      md5(lower(trim(text))) AS text_hash,
      min(doc_id)            AS canonical_doc_id,
      count(*)               AS dup_count
    FROM documents
    GROUP BY text_hash
    """,
    tags=("dedup", "llm"),
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact dedup on normalized-text hash; keeps the lowest doc_id as
    canonical. One shuffle on the hash — at 100 TB the hash key is uniform,
    so no skew; the text column itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_hash", F.md5(F.lower(F.trim("text"))))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


@query(
    "q_jaccard_neardup",
    oracle=f"""
    WITH ds AS ({_SHINGLES_SQL}),
    sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS n_common
      FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT
      i.doc_id_1,
      i.doc_id_2,
      round(i.n_common * 1.0 / (x.n + y.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sz x ON i.doc_id_1 = x.doc_id
    JOIN sz y ON i.doc_id_2 = y.doc_id
    WHERE i.n_common * 1.0 / (x.n + y.n - i.n_common) >= 0.8
    """,
    tags=("dedup", "llm", "flagship"),
)
def jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (exact tier): near-duplicate pairs by 3-word-shingle Jaccard ≥ 0.8.
    Shingle-equi-join makes candidate generation linear in shingle-bucket
    sizes (random-vocab shingles are near-unique, so buckets are tiny); this
    is the exact verifier that the LSH variant (q_minhash_lsh) feeds at
    scale."""
    ds = _doc_shingle_hashes(spark, sf_dir)
    sz = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ds.select(F.col("doc_id").alias("doc_id_1"), "h")
    b = ds.select(F.col("doc_id").alias("doc_id_2"), "h")
    inter = (
        a.join(b, ["h"])
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    x = sz.select(F.col("doc_id").alias("doc_id_1"), F.col("n").alias("n1"))
    y = sz.select(F.col("doc_id").alias("doc_id_2"), F.col("n").alias("n2"))
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        inter.join(F.broadcast(x), "doc_id_1")
        .join(F.broadcast(y), "doc_id_2")
        .filter(jac >= 0.8)
        .select("doc_id_1", "doc_id_2", F.round(jac, 4).alias("jaccard"))
    )


@query("q_minhash_lsh", oracle=None, tags=("dedup", "llm", "approx"))
def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (scale tier): MinHash + banded LSH near-dup detection.

    shingle-hash → 32 seeded minhashes (xxhash64(h, seed), deterministic) →
    8 bands × 4 rows → band-bucket equi-join for candidates → exact Jaccard
    verify ≥ 0.7. Signatures are constant-size per doc, so the shuffle volume
    is O(docs), not O(shingles); candidate pairs are only those colliding in
    some band. Rows-only check: xxhash64 is engine-specific (the exact-tier
    q_jaccard_neardup is the cross-engine-verified twin).
    """
    ds = _doc_shingle_hashes(spark, sf_dir)
    seeds = spark.range(N_PERM).select(F.col("id").cast("int").alias("seed"))
    # per (doc, seed): min over shingle hashes of xxhash64(h, seed) — hashing
    # the 8-byte shingle id, not the string, keeps the 32x-fanout rows narrow
    sig = (
        ds.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(F.min(F.xxhash64("h", "seed")).alias("minh"))
    )
    rows_per_band = N_PERM // N_BANDS
    band_sig = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seed", "minh"))),
                        lambda s: s["minh"].cast("string"),
                    ),
                )
            ).alias("band_key")
        )
    )
    left = band_sig.select("band", "band_key", F.col("doc_id").alias("doc_id_1"))
    right = band_sig.select("band", "band_key", F.col("doc_id").alias("doc_id_2"))
    candidates = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2")
        .distinct()
    )
    # exact-Jaccard verification of the candidates only
    sz = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ds.select(F.col("doc_id").alias("doc_id_1"), "h")
    b = ds.select(F.col("doc_id").alias("doc_id_2"), "h")
    inter = (
        a.join(b, ["h"])
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    verified = (
        candidates.join(inter, ["doc_id_1", "doc_id_2"])
        .join(F.broadcast(sz.select(F.col("doc_id").alias("doc_id_1"), F.col("n").alias("n1"))), "doc_id_1")
        .join(F.broadcast(sz.select(F.col("doc_id").alias("doc_id_2"), F.col("n").alias("n2"))), "doc_id_2")
    )
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return verified.filter(jac >= 0.7).select(
        "doc_id_1", "doc_id_2", F.round(jac, 4).alias("jaccard")
    )


@query("q_simhash", oracle=None, tags=("dedup", "llm", "approx"))
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 (fingerprint tier): 32-bit SimHash per document + near-dup pairs at
    Hamming distance ≤ 6.

    Token-frequency-weighted bit votes: bit i of xxhash64(token) contributes
    +tf / -tf; the sign of each bit-sum forms the fingerprint. All DataFrame
    ops (explode bit positions → conditional agg → bit OR-fold). Pairwise
    Hamming via xor+bit_count on the tiny fingerprint relation. Rows-only:
    xxhash64 is engine-specific.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.xxhash64("tok"))
    )
    bits = tf.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
    )
    vote = F.when(F.expr("(shiftright(h, bit) & 1) = 1"), F.col("tf")).otherwise(-F.col("tf"))
    bit_votes = bits.groupBy("doc_id", "bit").agg(F.sum(vote).alias("v"))
    fp = bit_votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0)
        ).alias("simhash")
    )
    a = fp.select(F.col("doc_id").alias("doc_id_1"), F.col("simhash").alias("h1"))
    b = fp.select(F.col("doc_id").alias("doc_id_2"), F.col("simhash").alias("h2"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= 6)
    )
    return pairs.select("doc_id_1", "doc_id_2", "hamming")


@query(
    "q_decontamination",
    oracle=f"""
    WITH ds AS ({_SHINGLES_SQL}),
    bench AS (SELECT DISTINCT s FROM ds WHERE doc_id < 20),
    tr AS (SELECT doc_id, s FROM ds WHERE doc_id >= 20),
    sz AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, count(*) AS n_common
      FROM tr t JOIN bench b ON t.s = b.s
      GROUP BY t.doc_id
    )
    SELECT
      h.doc_id,
      h.n_common,
      s.n                                            AS n_shingles,
      round(h.n_common * 1.0 / s.n, 4)               AS overlap_ratio,
      CAST(h.n_common * 1.0 / s.n >= 0.5 AS BOOLEAN) AS contaminated
    FROM hits h JOIN sz s ON h.doc_id = s.doc_id
    WHERE h.n_common >= 3
    """,
    tags=("dedup", "llm", "text"),
)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag training documents whose 3-word
    shingles overlap an evaluation set (here: doc_id < 20 stands in for the
    benchmark). The benchmark shingle set is tiny by construction, so it
    BROADCASTS and the training corpus is scanned exactly once with a
    broadcast hash join — the linear shape that survives 100 TB, unlike the
    symmetric all-pairs join (this is the asymmetric special case the
    quadratic q_jaccard_neardup verifier cannot exploit). Shingles travel as
    64-bit hashes (see _doc_shingle_hashes); counts equal the string oracle
    absent 64-bit collisions, which the oracle match itself verifies."""
    ds = _doc_shingle_hashes(spark, sf_dir)
    bench = ds.filter(F.col("doc_id") < 20).select("h").distinct()
    train = ds.filter(F.col("doc_id") >= 20)
    sz = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ratio = F.col("n_common") / F.col("n_shingles")
    return (
        hits.join(sz, "doc_id")
        .filter(F.col("n_common") >= 3)
        .select(
            "doc_id",
            "n_common",
            F.col("n_shingles"),
            F.round(ratio, 4).alias("overlap_ratio"),
            (ratio >= 0.5).alias("contaminated"),
        )
    )


_PAIRS_SQL = f"""
    WITH RECURSIVE ds AS ({_SHINGLES_SQL}),
    sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS n_common
      FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.doc_id_1, i.doc_id_2
      FROM inter i
      JOIN sz x ON i.doc_id_1 = x.doc_id
      JOIN sz y ON i.doc_id_2 = y.doc_id
      WHERE i.n_common * 1.0 / (x.n + y.n - i.n_common) >= 0.8
    ),
    edges AS (
      SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
      UNION ALL
      SELECT doc_id_2, doc_id_1 FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
"""


@query(
    "q_dup_clusters",
    oracle=f"""
    {_PAIRS_SQL}
    SELECT
      doc_id,
      component_id,
      CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT) AS component_size
    FROM (
      SELECT a AS doc_id, least(a, min(b)) AS component_id
      FROM reach GROUP BY a
    )
    """,
    tags=("dedup", "llm", "iterative"),
)
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the Jaccard
    ≥ 0.8 near-dup pairs via iterative min-label propagation — the step that
    turns pairwise matches into dedup groups (keep one doc per component).
    Each iteration is one join + groupBy (labels shrink monotonically to the
    component-minimum doc_id); convergence needs graph-diameter iterations,
    and near-dup components are tiny by construction, so the loop is short.
    This is the standard distributed CC recipe (driver coordinates, data
    never leaves the cluster) — the same job shape as q_kmeans_embeddings.
    The oracle computes the same components with a recursive-CTE transitive
    closure, which is feasible exactly because components are small."""
    pairs = jaccard_neardup(spark, sf_dir).select("doc_id_1", "doc_id_2")
    edges = pairs.union(
        pairs.select(F.col("doc_id_2").alias("doc_id_1"), F.col("doc_id_1").alias("doc_id_2"))
    ).persist()
    labels = (
        edges.select(F.col("doc_id_1").alias("node")).distinct().withColumn("lbl", F.col("node"))
    ).persist()
    for _ in range(10):
        neighbor_min = (
            edges.join(labels, edges.doc_id_2 == labels.node)
            .groupBy("doc_id_1")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.doc_id_1, "left")
            .select(
                "node",
                F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
        ).persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    w = Window.partitionBy("component_id")
    return (
        labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("component_id"))
        .withColumn("component_size", F.count(F.lit(1)).over(w).cast("long"))
    )
