"""The retrieval stack: the BM25 sparse scorer (q_bm25_topk), reciprocal-
rank fusion of two rankings, and the NDCG/MRR ranking-eval metrics —
consolidated here in round 4 (verdict task 7) next to q_cosine_topk's
dense scorer in similarity.py. The eval queries run
per query-term with every window PARTITIONED BY the term (repo rule: no
unpartitioned windows), which is also the 100 TB shape — a real evaluation
harness fans out over thousands of queries, each with a bounded candidate
set, so the term key is the parallelism axis.

Determinism contract: BM25 scores are built from exact integer tf/df/dl
counts with an identical expression shape on both engines, rounded to 6 dp
BEFORE any ranking; every row_number orders by (rounded score, doc_id) —
a total order, so ranks are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

_TERMS = ("spark", "join", "fast")

# Shared DuckDB CTE: per-term BM25 over the candidate docs that contain the
# term (k1=1.2, b=0.75, Robertson idf with +1 floor — same constants as
# q_bm25_topk), rounded to 6 dp before ranking.
_CAND_SQL = f"""
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
    avgdl AS (SELECT avg(doclen) AS avgdl FROM dl),
    n_docs AS (SELECT count(*) AS n FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN {_TERMS!r}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    cand AS (
      SELECT tf.term, tf.doc_id,
        round(
          ln((n.n - df.df + 0.5e0) / (df.df + 0.5e0) + 1e0)
          * tf.tf * 2.2e0
          / (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.doclen / a.avgdl)), 6) AS bm25
      FROM tf
      JOIN df ON tf.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN avgdl a CROSS JOIN n_docs n
    )
"""


def _candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, bm25): rounded BM25 for each doc containing each of
    the three query terms. Mirrors q_bm25_topk's plan: the token stream is
    filtered to the query terms before aggregation, df and the scalar
    constants broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doclen"))
    consts = dl.agg(F.avg("doclen").alias("avgdl")).crossJoin(
        docs.agg(F.count(F.lit(1)).alias("n"))
    )
    tf = (
        toks.filter(F.col("term").isin(*_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = (
        idf
        * F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("doclen") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .select("term", "doc_id", F.round(contrib, 6).alias("bm25"))
    )


@query(
    "q_rrf_fusion",
    oracle=f"""
    WITH {_CAND_SQL},
    ranked AS (
      SELECT c.term, c.doc_id,
        row_number() OVER (PARTITION BY c.term ORDER BY c.bm25 DESC, c.doc_id) AS r_rel,
        row_number() OVER (PARTITION BY c.term ORDER BY d.n_chars DESC, c.doc_id) AS r_prior
      FROM cand c JOIN documents d ON c.doc_id = d.doc_id
    ),
    fused AS (
      SELECT term, doc_id,
             CAST(r_rel AS BIGINT)  AS r_rel,
             CAST(r_prior AS BIGINT) AS r_prior,
             round(1e0 / (60 + r_rel) + 1e0 / (60 + r_prior), 6) AS rrf
      FROM ranked
    )
    SELECT term, doc_id, r_rel, r_prior, rrf
    FROM (
      SELECT *, row_number() OVER (PARTITION BY term ORDER BY rrf DESC, doc_id) AS rk
      FROM fused
    )
    WHERE rk <= 5
    """,
    tags=("text", "llm-pipeline", "retrieval"),
)
def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of two rankings per query term —
    BM25 relevance fused with a document-length prior (n_chars) standing
    in for any second scorer (dense retrieval, freshness, pagerank). RRF
    is THE standard ensemble for hybrid sparse+dense retrieval because it
    needs no score calibration, only ranks. Top-5 fused docs per term;
    every ranking is a per-term window over the candidate set (docs
    containing the term), with doc_id tiebreaks making all three
    row_numbers engine-stable. Scale: candidate sets are bounded per term
    and the term key partitions every window — the query axis fans out."""
    cand = _candidates(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w_rel = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    w_prior = Window.partitionBy("term").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = cand.join(docs, "doc_id").select(
        "term",
        "doc_id",
        F.row_number().over(w_rel).cast("long").alias("r_rel"),
        F.row_number().over(w_prior).cast("long").alias("r_prior"),
    )
    fused = ranked.withColumn(
        "rrf",
        F.round(
            F.lit(1.0) / (60 + F.col("r_rel")) + F.lit(1.0) / (60 + F.col("r_prior")), 6
        ),
    )
    w_f = Window.partitionBy("term").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rk", F.row_number().over(w_f))
        .filter(F.col("rk") <= 5)
        .select("term", "doc_id", "r_rel", "r_prior", "rrf")
    )


@query(
    "q_ndcg",
    oracle=f"""
    WITH {_CAND_SQL},
    graded AS (
      SELECT c.term, c.doc_id, c.bm25,
             CAST(substr(d.source, 4) AS INT) % 4 AS rel
      FROM cand c JOIN documents d ON c.doc_id = d.doc_id
    ),
    sys AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS pos
      FROM graded
    ),
    ideal AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS pos
      FROM graded
    ),
    d AS (
      SELECT term,
             CAST(sum(CAST(round((power(2, rel) - 1) / (ln(pos + 1) / ln(2)) * 1e12)
                           AS BIGINT)) AS DOUBLE) / 1e12 AS dcg
      FROM sys WHERE pos <= 10 GROUP BY term
    ),
    i AS (
      SELECT term,
             CAST(sum(CAST(round((power(2, rel) - 1) / (ln(pos + 1) / ln(2)) * 1e12)
                           AS BIGINT)) AS DOUBLE) / 1e12 AS idcg
      FROM ideal WHERE pos <= 10 GROUP BY term
    ),
    n AS (SELECT term, CAST(count(*) AS BIGINT) AS n_cands FROM graded GROUP BY term)
    SELECT
      n.term, n.n_cands,
      round(d.dcg, 6)  AS dcg,
      round(i.idcg, 6) AS idcg,
      round(CASE WHEN i.idcg = 0 THEN 0e0 ELSE d.dcg / i.idcg END, 6) AS ndcg
    FROM n JOIN d ON n.term = d.term JOIN i ON n.term = i.term
    """,
    tags=("text", "llm-pipeline", "retrieval"),
)
def ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query term for the BM25 ranking, against graded
    relevance derived deterministically from the document source id
    (src{k} → grade k mod 4 ∈ {0..3}) — the offline ranking-quality
    metric every retrieval pipeline reports. DCG uses the exponential-gain
    form (2^rel − 1)/log2(pos+1); the ideal ranking is computed over the
    SAME candidate set ordered by grade. Gains and discounts are built
    from exact integers with identical expression shape on both engines;
    the ≤10-term sums are rounded to 6 dp (summation-order ulps), and the
    final ratio guards idcg = 0. Scale: identical to q_rrf_fusion — all
    windows partitioned by the term axis."""
    cand = _candidates(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    graded = cand.join(docs, "doc_id").select(
        "term",
        "doc_id",
        "bm25",
        (F.substring("source", 4, 10).cast("int") % 4).alias("rel"),
    )
    w_sys = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    w_ideal = Window.partitionBy("term").orderBy(F.col("rel").desc(), "doc_id")
    gain = (F.pow(F.lit(2), F.col("rel")) - 1) / (F.log(F.col("pos") + 1) / F.log(F.lit(2.0)))
    d = (
        graded.select("term", "rel", F.row_number().over(w_sys).alias("pos"))
        .filter(F.col("pos") <= 10)
        .groupBy("term")
        .agg(
            (
                F.sum(F.round(gain * 1e12).cast("long")).cast("double") / 1e12
            ).alias("dcg")
        )
    )
    i = (
        graded.select("term", "rel", F.row_number().over(w_ideal).alias("pos"))
        .filter(F.col("pos") <= 10)
        .groupBy("term")
        .agg(
            (
                F.sum(F.round(gain * 1e12).cast("long")).cast("double") / 1e12
            ).alias("idcg")
        )
    )
    n = graded.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n_cands"))
    return (
        n.join(d, "term")
        .join(i, "term")
        .select(
            "term",
            "n_cands",
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(
                F.when(F.col("idcg") == 0, F.lit(0.0)).otherwise(F.col("dcg") / F.col("idcg")), 6
            ).alias("ndcg"),
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
        CAST(sum(CAST(round(
          ln((n.n - df.df + 0.5e0) / (df.df + 0.5e0) + 1e0)
          * tf.tf * 2.2e0
          / (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.doclen / a.avgdl)) * 1e12
        ) AS BIGINT)) AS DOUBLE) / 1e12 AS score
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
        .agg(
            F.round(
                F.sum(F.round(contrib * 1e12).cast("long")).cast("double") / 1e12,
                6,
            ).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
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


# ---------------------------------------------------------------------------
# q_mmr_rerank — Maximal Marginal Relevance diversification
# ---------------------------------------------------------------------------

MMR_POOL = 16  # candidate pool (top-N by query cosine)
MMR_K = 5  # items selected
MMR_LAMBDA = 0.7  # relevance vs diversity trade-off

_MMR_COS = (
    "round(list_sum(list_transform(range(1, 65),"
    " i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65),"
    " i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({a}.embedding[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65),"
    " i -> CAST({b}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE))))), 6)"
)


def _mmr_oracle() -> str:
    """Greedy MMR selection as MATERIALIZED chained CTEs (the
    q_bradley_terry pattern): every similarity is rounded to 6 dp BEFORE
    any selection, so both engines run the identical greedy on an
    identical 1e-6-grid input and the argmax chain cannot diverge."""
    cos_qb = _MMR_COS.format(a="q", b="b")
    cos_ab = _MMR_COS.format(a="x", b="y")
    steps = []
    prev: list[str] = []
    for k in range(1, MMR_K + 1):
        if not prev:
            steps.append(
                f"s1 AS MATERIALIZED (SELECT vec_id, simq, round(simq, 9) AS mmr"
                f" FROM cand ORDER BY round(simq, 9) DESC, vec_id LIMIT 1)"
            )
        else:
            exclude = " UNION ALL ".join(f"SELECT vec_id FROM {s}" for s in prev)
            sel = " UNION ALL ".join(f"SELECT vec_id FROM {s}" for s in prev)
            score = (
                f"round({MMR_LAMBDA} * c.simq - {round(1 - MMR_LAMBDA, 10)} * "
                f"(SELECT max(p.cos) FROM pairsim p WHERE p.a_id = c.vec_id"
                f" AND p.b_id IN ({sel})), 9)"
            )
            steps.append(
                f"s{k} AS MATERIALIZED (SELECT c.vec_id, c.simq, {score} AS mmr"
                f" FROM cand c WHERE c.vec_id NOT IN ({exclude})"
                f" ORDER BY {score} DESC, c.vec_id LIMIT 1)"
            )
        prev.append(f"s{k}")
    union = " UNION ALL ".join(
        f"SELECT {k} AS rnk, vec_id, simq, mmr FROM s{k}" for k in range(1, MMR_K + 1)
    )
    return f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cand AS MATERIALIZED (
      SELECT b.vec_id, {cos_qb} AS simq
      FROM embeddings b CROSS JOIN q
      WHERE b.vec_id <> 0
      ORDER BY {cos_qb} DESC, b.vec_id
      LIMIT {MMR_POOL}
    ),
    pairsim AS MATERIALIZED (
      SELECT x.vec_id AS a_id, y.vec_id AS b_id, {cos_ab} AS cos
      FROM (SELECT c.vec_id, e.embedding FROM cand c JOIN embeddings e USING (vec_id)) x
      JOIN (SELECT c.vec_id, e.embedding FROM cand c JOIN embeddings e USING (vec_id)) y
        ON x.vec_id <> y.vec_id
    ),
    {', '.join(steps)}
    SELECT CAST(rnk AS BIGINT) AS rnk,
           CAST(vec_id AS BIGINT) AS vec_id,
           round(simq, 6) AS sim_to_query,
           round(mmr, 6) AS mmr_score
    FROM ({union})
    """


@query("q_mmr_rerank", oracle=_mmr_oracle(), tags=("retrieval", "similarity", "llm"))
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell-Goldstein): from
    the top-{pool} cosine candidates for query vector 0, greedily select
    {k} items maximizing lambda x sim(q, i) - (1 - lambda) x
    max_(j in selected) sim(i, j) — the diversification step retrieval
    stacks run after ANN so the context window isn't filled with {k}
    near-copies of the same passage. Complements the relevance-only
    rankers (q_cosine_topk, q_bm25_topk, q_rrf_fusion) with the
    redundancy-aware tier.

    Scale: candidate generation is the broadcast-query corpus scan
    (q_cosine_topk shape); the greedy runs on the O(pool + pool^2)
    candidate/pair-sim relations — bounded model state collected to the
    driver (the q_holt_smoothing precedent), never O(corpus). Determinism:
    every similarity is rounded to 6 dp BEFORE selection on BOTH engines
    (identical 1e-6-grid inputs make the greedy argmax chain
    engine-exact); MMR scores rank at 9 dp with vec_id tie-break; the
    oracle runs the same greedy as chained MATERIALIZED CTEs."""
    from bigdatainfinance1_spark.functions.rounding import rnd_half_away as rnd
    from bigdatainfinance1_spark.functions.vector import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings").withColumn("nrm", l2_norm("embedding"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.round(dot("embedding", "q_emb") / (F.col("nrm") * F.col("q_nrm")), 6).alias(
                "simq"
            ),
        )
        .orderBy(F.col("simq").desc(), F.col("vec_id").asc())
        .limit(MMR_POOL)  # TakeOrdered — distributed global top-N
    )
    a = cand.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = cand.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    pair_rows = (
        a.join(b, F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(dot("ea", "eb") / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
        .collect()  # O(pool^2) = 240 rows — bounded model state, never O(corpus)
    )
    cand_rows = cand.select("vec_id", "simq").collect()  # O(pool)
    sims = {(r["a_id"], r["b_id"]): r["cos"] for r in pair_rows}
    simq = {r["vec_id"]: r["simq"] for r in cand_rows}
    selected: list[tuple[int, int, float, float]] = []
    chosen: list[int] = []
    for rank in range(1, MMR_K + 1):
        best = None
        for vid in sorted(simq):
            if vid in chosen:
                continue
            if not chosen:
                score = rnd(simq[vid], 9)
            else:
                score = rnd(
                    MMR_LAMBDA * simq[vid]
                    - (1 - MMR_LAMBDA) * max(sims[(vid, j)] for j in chosen),
                    9,
                )
            if best is None or score > best[1] or (score == best[1] and vid < best[0]):
                best = (vid, score)
        chosen.append(best[0])
        selected.append((rank, best[0], rnd(simq[best[0]], 6), rnd(best[1], 6)))
    return spark.createDataFrame(
        selected, "rnk long, vec_id long, sim_to_query double, mmr_score double"
    )


# ---------------------------------------------------------------------------
# q_err_ranking — expected reciprocal rank (cascade click model)
# ---------------------------------------------------------------------------

ERR_DEPTH = 10  # evaluate the top-10 ranking, like q_ndcg


def _err_terms() -> tuple[str, str]:
    """(pivot_cols, err_expr): the ERR sum unrolled over 10 explicit
    positions so the position-ordered product chain is ONE fixed
    expression — no engine-ordered aggregation of doubles anywhere. R_p
    values are dyadic rationals (2^g - 1)/8, so every partial product is
    exact in double; only the final /p divisions round."""
    pivots = ",\n        ".join(
        f"coalesce(max(CASE WHEN pos = {p} THEN rel END), 0) AS g{p}"
        for p in range(1, ERR_DEPTH + 1)
    )
    terms = []
    stop = []  # running (1 - R_i) factors
    for p in range(1, ERR_DEPTH + 1):
        rp = f"((power(2, g{p}) - 1) / 8e0)"
        prefix = " * ".join(stop) if stop else "1e0"
        terms.append(f"({prefix}) * {rp} / {p}")
        stop.append(f"(1e0 - {rp})")
    err = "\n        + ".join(terms)
    return pivots, err


@query(
    "q_err_ranking",
    oracle=(
        lambda pivots_err=_err_terms(): f"""
    WITH {_CAND_SQL},
    graded AS (
      SELECT c.term, c.doc_id, c.bm25,
             CAST(substr(d.source, 4) AS INT) % 4 AS rel
      FROM cand c JOIN documents d ON c.doc_id = d.doc_id
    ),
    sys AS (
      SELECT term, rel,
             row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS pos
      FROM graded
    ),
    piv AS (
      SELECT term,
        {pivots_err[0]},
        CAST(count(*) AS BIGINT) AS n_cands
      FROM sys GROUP BY term
    )
    SELECT term, n_cands,
           round({pivots_err[1]}, 6) AS err
    FROM piv
    """
    )(),
    tags=("text", "llm-pipeline", "retrieval"),
)
def err_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected reciprocal rank (ERR@10) per query term under the cascade
    click model (Chapelle et al. 2009): a user scans down the BM25
    ranking, stops at position p with probability R_p = (2^g - 1)/2^gmax,
    and ERR = SUM (1/p) R_p PROD_{{i<p}} (1 - R_i) — unlike q_ndcg's
    position discount, a highly-relevant document at rank 1 SUPPRESSES
    the value of everything below it, which is how users actually behave.
    Grades are the same source-derived {{0..3}} scheme as q_ndcg.

    Determinism: the ranking pivots to one row per term (grades at 10
    explicit positions), and the ERR sum is a FIXED unrolled expression —
    the product chain evaluates exact dyadic doubles left-to-right
    identically on both engines; rounded at 6. Scale: the q_ndcg plan
    (term-partitioned windows over bounded candidate sets) plus an O(1)
    pivot per term."""
    pivots, err_expr = _err_terms()
    cand = _candidates(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    graded = cand.join(docs, "doc_id").select(
        "term",
        "doc_id",
        "bm25",
        (F.substring("source", 4, 10).cast("int") % 4).alias("rel"),
    )
    w_sys = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    sys = graded.select("term", "rel", F.row_number().over(w_sys).alias("pos"))
    piv = sys.groupBy("term").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("pos") == p, F.col("rel"))), F.lit(0)
            ).alias(f"g{p}")
            for p in range(1, ERR_DEPTH + 1)
        ],
        F.count(F.lit(1)).cast("long").alias("n_cands"),
    )
    return piv.select("term", "n_cands", F.round(F.expr(err_expr), 6).alias("err"))


# ---------------------------------------------------------------------------
# q_rocchio_expansion — pseudo-relevance-feedback query expansion
# ---------------------------------------------------------------------------

PRF_TOP_DOCS = 5  # feedback depth
PRF_TOP_TERMS = 5  # expansion terms reported per query
PRF_BETA = 0.75  # Rocchio feedback weight


@query(
    "q_rocchio_expansion",
    oracle=f"""
    WITH {_CAND_SQL},
    fb AS (
      SELECT term AS q, doc_id FROM (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rk
        FROM cand
      ) WHERE rk <= {PRF_TOP_DOCS}
    ),
    toks2 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    tf2 AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM toks2 GROUP BY doc_id, t
    ),
    dfall AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY t),
    w AS (
      SELECT fb.q, tf2.t,
             round({PRF_BETA} * sum(tf2.tf * ln((SELECT count(*) FROM documents)
                                                 * 1e0 / dfall.df))
                   / {PRF_TOP_DOCS}, 6) AS weight
      FROM fb
      JOIN tf2 ON fb.doc_id = tf2.doc_id
      JOIN dfall ON tf2.t = dfall.t
      WHERE tf2.t <> fb.q
      GROUP BY fb.q, tf2.t, dfall.df
    )
    SELECT q AS query_term, t AS expansion_term, weight,
           CAST(rk AS BIGINT) AS rnk
    FROM (
      SELECT q, t, weight,
             row_number() OVER (PARTITION BY q ORDER BY weight DESC, t) AS rk
      FROM w
    ) WHERE rk <= {PRF_TOP_TERMS}
    ORDER BY query_term, rnk
    """,
    tags=("text", "llm-pipeline", "retrieval"),
)
def rocchio_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback: for each query term, assume the
    BM25 top-{PRF_TOP_DOCS} documents are relevant, score every term
    they contain by beta * mean tf-idf over the feedback set, and report
    the top-{PRF_TOP_TERMS} expansion terms — the classic close-the-
    vocabulary-gap step between first-pass retrieval (q_bm25_topk) and
    the rerank tier, and the sparse ancestor of dense query encoders.

    Determinism: feedback sets rank on 6-dp BM25 with doc_id tiebreaks
    (the shared _candidates contract); expansion weights are tf (exact
    int) x ln(N/df) (ratio of exact ints — identical libm input both
    engines), averaged over the FIXED feedback count and rounded at 6;
    the final cut ranks on the rounded weight with the term as tiebreak.
    Scale: the q_bm25_topk plan plus one (doc_id)-keyed join of the
    bounded feedback set against the token stream — linear, no pair
    joins."""
    cand = _candidates(spark, sf_dir)
    w_fb = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    fb = (
        cand.withColumn("rk", F.row_number().over(w_fb))
        .filter(F.col("rk") <= PRF_TOP_DOCS)
        .select(F.col("term").alias("q"), "doc_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    toks2 = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    tf2 = toks2.groupBy("doc_id", "t").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfall = tf2.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    w = (
        fb.join(tf2, "doc_id")
        .filter(F.col("t") != F.col("q"))
        .join(F.broadcast(dfall), "t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "contrib", F.col("tf") * F.log(F.col("nd") * F.lit(1.0) / F.col("df"))
        )
        .groupBy("q", "t", "df")
        .agg(
            F.round(F.lit(PRF_BETA) * F.sum("contrib") / PRF_TOP_DOCS, 6).alias("weight")
        )
    )
    w_rk = Window.partitionBy("q").orderBy(F.col("weight").desc(), "t")
    return (
        w.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= PRF_TOP_TERMS)
        .select(
            F.col("q").alias("query_term"),
            F.col("t").alias("expansion_term"),
            "weight",
            F.col("rk").cast("long").alias("rnk"),
        )
        .orderBy("query_term", "rnk")
    )


# ---------------------------------------------------------------------------
# q_team_draft_interleave — online ranker comparison by interleaving
# ---------------------------------------------------------------------------

TDI_DEPTH = 10  # interleaved list length (5 draft rounds)
TDI_POOL = 12  # per-ranker candidate depth fed to the draft
TDI_REL_CLICK = 2  # cascade click: user clicks docs with grade >= 2


def _tdi_pick(list_pfx: str, n_prior: int) -> str:
    """First candidate from {list_pfx}1..{TDI_POOL} not among the already-
    drafted columns p1..p{n_prior} (NULL-safe; exhausted lists fall
    through to NULL). References PRIOR PICKS AS COLUMNS — each pick lives
    in its own select layer, so expressions stay linear (a first cut
    inlined prior picks and the text grew ~12^n)."""
    cases = " ".join(
        f"WHEN {list_pfx}{i} IS NOT NULL AND "
        + (
            " AND ".join(
                f"{list_pfx}{i} <> coalesce(p{j}, -1)" for j in range(1, n_prior + 1)
            )
            if n_prior
            else "true"
        )
        + f" THEN {list_pfx}{i}"
        for i in range(1, TDI_POOL + 1)
    )
    return f"CASE {cases} END"


def _tdi_oracle() -> str:
    piv_a = ", ".join(
        f"max(CASE WHEN ra = {i} THEN doc_id END) AS a{i}" for i in range(1, TDI_POOL + 1)
    )
    piv_b = ", ".join(
        f"max(CASE WHEN rb = {i} THEN doc_id END) AS b{i}" for i in range(1, TDI_POOL + 1)
    )
    layers = ""
    for pos in range(1, TDI_DEPTH + 1):
        pfx = "a" if pos % 2 == 1 else "b"
        layers += f""",
    d{pos} AS (SELECT *, ({_tdi_pick(pfx, pos - 1)}) AS p{pos} FROM d{pos - 1})"""
    unions = " UNION ALL ".join(
        f"SELECT term, '{'A' if pos % 2 == 1 else 'B'}' AS team, p{pos} AS doc_id"
        f" FROM d{TDI_DEPTH}"
        for pos in range(1, TDI_DEPTH + 1)
    )
    return f"""
    WITH {_CAND_SQL},
    ranked AS (
      SELECT c.term, c.doc_id,
        row_number() OVER (PARTITION BY c.term ORDER BY c.bm25 DESC, c.doc_id) AS ra,
        row_number() OVER (PARTITION BY c.term ORDER BY d.n_chars DESC, c.doc_id) AS rb
      FROM cand c JOIN documents d ON c.doc_id = d.doc_id
    ),
    d0 AS (
      SELECT term, {piv_a}, {piv_b}
      FROM ranked GROUP BY term
    ){layers},
    long AS ({unions}),
    clicked AS (
      SELECT l.term, l.team,
             CASE WHEN CAST(substr(d.source, 4) AS INT) % 4 >= {TDI_REL_CLICK}
                  THEN 1 ELSE 0 END AS click
      FROM long l JOIN documents d ON l.doc_id = d.doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS n_interleaved,
           CAST(sum(CASE WHEN team = 'A' THEN click ELSE 0 END) AS BIGINT) AS clicks_a,
           CAST(sum(CASE WHEN team = 'B' THEN click ELSE 0 END) AS BIGINT) AS clicks_b,
           CASE WHEN sum(CASE WHEN team = 'A' THEN click ELSE 0 END)
                     > sum(CASE WHEN team = 'B' THEN click ELSE 0 END) THEN 'A'
                WHEN sum(CASE WHEN team = 'A' THEN click ELSE 0 END)
                     < sum(CASE WHEN team = 'B' THEN click ELSE 0 END) THEN 'B'
                ELSE 'tie' END AS winner
    FROM clicked GROUP BY term ORDER BY term
    """


@query(
    "q_team_draft_interleave",
    oracle=_tdi_oracle(),
    tags=("text", "llm-pipeline", "retrieval", "eval"),
)
def team_draft_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team-draft interleaving (Radlinski et al.) between the BM25 ranker
    and the length-prior ranker: the two rankings alternately draft their
    best not-yet-picked document into one interleaved top-{TDI_DEPTH}
    (A drafts odd slots, B even), simulated users click relevant results
    (source-derived grade >= {TDI_REL_CLICK}), and each click credits
    the team that drafted the document — the ONLINE ranker-comparison
    design that needs ~10x less traffic than an A/B split because every
    impression carries both systems. The offline twins are q_ndcg /
    q_err_ranking; interleaving is how you validate them in production.

    Determinism: both rankings tie-break on doc_id; the draft is a fixed
    chain of 10 pick layers, each referencing prior picks as COLUMNS
    (identical SQL-generated expressions on both engines, linear size);
    clicks are exact integer counts. Scale: the q_rrf_fusion plan
    (term-partitioned windows) + an O(1)-per-term pivot and pick chain.
    The pick→long melt is ONE stack() pass — a first cut melted via 10
    unionByName branches, which replicated the pick-chain plan 10× and
    sent Catalyst into a multi-minute optimization spiral; stack keeps
    the chain in the plan exactly once."""
    cand = _candidates(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "source")
    w_a = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    w_b = Window.partitionBy("term").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = cand.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        "term",
        "doc_id",
        F.row_number().over(w_a).alias("ra"),
        F.row_number().over(w_b).alias("rb"),
    )
    drafted = ranked.groupBy("term").agg(
        *[
            F.max(F.when(F.col("ra") == i, F.col("doc_id"))).alias(f"a{i}")
            for i in range(1, TDI_POOL + 1)
        ],
        *[
            F.max(F.when(F.col("rb") == i, F.col("doc_id"))).alias(f"b{i}")
            for i in range(1, TDI_POOL + 1)
        ],
    )
    for pos in range(1, TDI_DEPTH + 1):
        pfx = "a" if pos % 2 == 1 else "b"
        drafted = drafted.withColumn(f"p{pos}", F.expr(_tdi_pick(pfx, pos - 1)))
    stack_args = ", ".join(
        f"'{'A' if pos % 2 == 1 else 'B'}', p{pos}" for pos in range(1, TDI_DEPTH + 1)
    )
    long = drafted.select(
        "term", F.expr(f"stack({TDI_DEPTH}, {stack_args}) AS (team, doc_id)")
    )
    clicked = long.join(docs.select("doc_id", "source"), "doc_id").select(
        "term",
        "team",
        F.when(
            (F.substring("source", 4, 10).cast("int") % 4) >= TDI_REL_CLICK, 1
        ).otherwise(0).alias("click"),
    )
    ca = F.sum(F.when(F.col("team") == "A", F.col("click")).otherwise(0))
    cb = F.sum(F.when(F.col("team") == "B", F.col("click")).otherwise(0))
    return (
        clicked.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_interleaved"),
            ca.cast("long").alias("clicks_a"),
            cb.cast("long").alias("clicks_b"),
            F.when(ca > cb, F.lit("A")).when(ca < cb, F.lit("B")).otherwise(F.lit("tie")).alias("winner"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# q_best_snippet — keyword-in-context window extraction for top hits
# ---------------------------------------------------------------------------

SNIP_W = 10  # tumbling window width (tokens)
SNIP_DOCS = 3  # top BM25 docs per term to snippet

_SNIP_SQL = f"""
    WITH {_CAND_SQL},
    top AS (
      SELECT term, doc_id FROM (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term
                                  ORDER BY bm25 DESC, doc_id) AS rnk
        FROM cand
      ) WHERE rnk <= {SNIP_DOCS}
    ),
    pos AS (
      SELECT t.term, t.doc_id, u.i - 1 AS p, d.t[u.i] AS tok
      FROM top t
      JOIN (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d
        ON t.doc_id = d.doc_id,
      unnest(range(1, len(d.t) + 1)) AS u(i)
    ),
    wins AS (
      SELECT term, doc_id, p // {SNIP_W} AS w,
             CAST(sum(CASE WHEN tok IN {_TERMS!r} THEN 1 ELSE 0 END) AS BIGINT)
               AS hits
      FROM pos GROUP BY term, doc_id, p // {SNIP_W}
    ),
    best AS (
      SELECT term, doc_id,
             CAST(min_by(w, -hits * 1000000 + w) AS BIGINT) AS w,
             CAST(max(hits) AS BIGINT) AS n_hits
      FROM wins GROUP BY term, doc_id
    )
    SELECT b.term, b.doc_id, b.w AS win_idx, b.n_hits,
           array_to_string(list_slice(string_split(d.text, ' '),
                                      b.w * {SNIP_W} + 1,
                                      b.w * {SNIP_W} + {SNIP_W}), ' ') AS snippet
    FROM best b JOIN documents d ON b.doc_id = d.doc_id
    ORDER BY b.term, b.doc_id
"""


@query("q_best_snippet", oracle=_SNIP_SQL, tags=("text", "retrieval"))
def best_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context snippet extraction for the top-{SNIP_DOCS}
    BM25 hits per query term: tile each document into {SNIP_W}-token
    tumbling windows, score every window by how many QUERY-TERM tokens
    it contains (all three terms count — a window dense in the whole
    query beats one repeating a single term), and return the best
    window's text — the SERP-snippet / RAG-context-selection step
    between ranking (q_bm25_topk) and presentation, where sending whole
    documents to a context window wastes the token budget the snippet
    exists to protect.

    Determinism: window scores are exact integer counts; the argmax
    rides one integer key (-hits * 1e6 + w, so ties prefer the earliest
    window); the snippet text is a pure slice-and-join of the identical
    whitespace tokenization both engines use everywhere. Scale: only
    the top hits' documents are tokenized with positions (the candidate
    relation gates the explode); windows are one keyed aggregate."""
    cand = _candidates(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    w_rank = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    top = (
        cand.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= SNIP_DOCS)
        .select("term", "doc_id")
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    pos = top.join(toks, "doc_id").select(
        "term",
        "doc_id",
        F.posexplode("t").alias("p", "tok"),
    )
    wins = pos.groupBy(
        "term", "doc_id", F.floor(F.col("p") / SNIP_W).alias("w")
    ).agg(
        F.sum(F.when(F.col("tok").isin(*_TERMS), 1).otherwise(0))
        .cast("long")
        .alias("hits")
    )
    best = wins.groupBy("term", "doc_id").agg(
        F.min_by("w", -F.col("hits") * 1000000 + F.col("w")).cast("long").alias("w"),
        F.max("hits").cast("long").alias("n_hits"),
    )
    return (
        best.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "term",
            "doc_id",
            F.col("w").alias("win_idx"),
            "n_hits",
            F.array_join(
                F.slice(
                    F.split("text", " "),
                    (F.col("w") * SNIP_W + 1).cast("int"),
                    SNIP_W,
                ),
                " ",
            ).alias("snippet"),
        )
        .orderBy("term", "doc_id")
    )
