"""Storage-level dedup primitives: content-defined chunking (the
Rabin-fingerprint boundary trick behind LBFS/rsync/backup dedup and
modern blob stores) measured as a relation — chunk-size behavior and the
cross-document chunk dedup ratio per source. Complements the
document-level dedup stack (dedup.py finds duplicate DOCUMENTS; CDC
quantifies sub-document byte-level redundancy that survives it —
boilerplate headers, shared passages — the dedup that matters to the
storage bill rather than the training distribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# q_cdc_chunking — content-defined chunking dedup audit
# ---------------------------------------------------------------------------

CDC_W = 8  # rolling-window width (chars) the boundary test hashes
CDC_HEX = "0"  # boundary when md5(window) starts with this -> p = 1/16,
# expected chunk ~16 chars; docs shorter than CDC_W are excluded (named)


_CDC_SQL = f"""
    WITH d AS (
      SELECT doc_id, source, text, length(text) AS n
      FROM documents WHERE length(text) >= {CDC_W}
    ),
    pos AS (
      SELECT d.doc_id, d.source, d.text, d.n, u.i
      FROM d, unnest(range({CDC_W}, d.n + 1)) AS u(i)
    ),
    bnd AS (
      SELECT doc_id, source, text, i
      FROM pos
      WHERE i = n OR substr(md5(substr(text, i - {CDC_W} + 1, {CDC_W})), 1, 1)
                     = '{CDC_HEX}'
    ),
    chunks AS (
      SELECT doc_id, source,
             coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
             i AS e
      FROM bnd
    ),
    hashed AS (
      SELECT c.doc_id, c.source, c.e - c.s + 1 AS len,
             md5(substr(d.text, c.s, c.e - c.s + 1)) AS h
      FROM chunks c JOIN d ON c.doc_id = d.doc_id
    ),
    per_h AS (
      SELECT source, h, CAST(count(*) AS BIGINT) AS cnt,
             CAST(max(len) AS BIGINT) AS len
      FROM hashed GROUP BY source, h
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_unique_chunks,
           CAST(sum(cnt * len) AS BIGINT) AS bytes_total,
           CAST(sum(len) AS BIGINT) AS bytes_unique,
           round(sum(cnt * len) * 1e0 / sum(cnt), 4) AS avg_chunk_bytes,
           round(1 - count(*) * 1e0 / sum(cnt), 6) AS chunk_dedup_ratio,
           round(1 - sum(len) * 1e0 / sum(cnt * len), 6) AS byte_dedup_ratio
    FROM per_h GROUP BY source ORDER BY source
"""


@query("q_cdc_chunking", oracle=_CDC_SQL, tags=("llm-pipeline", "dedup", "scale"))
def cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Muthitacharoen et al., LBFS 2001): cut
    every document where the hash of the trailing {CDC_W}-char window
    opens with '{CDC_HEX}' (p = 1/16 -> ~16-char expected chunks), so
    boundaries depend on CONTENT, not offsets — an insertion reshuffles
    fixed-size blocks but only perturbs the one CDC chunk it lands in,
    which is why every dedup store cuts this way. Per source: chunk
    census, and the chunk/byte dedup ratios (1 - unique/total) — the
    sub-document redundancy (shared boilerplate, repeated passages)
    that document-level dedup (q_exact_dedup, q_minhash_lsh_fast)
    cannot see and a storage engine pays for. Docs shorter than the
    window are excluded by the named predicate.

    Determinism: boundaries and chunk identities are md5-of-substring
    facts (identical digests both engines); everything else is exact
    integer counting; ratios round 6/4. Scale: the position explode is
    O(total chars) — the same cost class as the token explodes all
    over text.py — with map-side filtering to boundary rows; chunk
    hashing re-reads the text by (doc, span) equi-join; the census is
    one (source, hash) aggregate. At 100 TB you'd fold the boundary
    test into one mapInPandas pass (no position blow-up); the relation
    form here keeps the oracle exact."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", "text", F.length("text").alias("n")
    ).filter(F.col("n") >= CDC_W)
    pos = d.select(
        "doc_id",
        "source",
        "text",
        "n",
        F.explode(F.sequence(F.lit(CDC_W), F.col("n"))).alias("i"),
    )
    bnd = pos.filter(
        (F.col("i") == F.col("n"))
        | (
            F.substring(
                F.md5(F.expr(f"substr(text, i - {CDC_W} + 1, {CDC_W})")), 1, 1
            )
            == CDC_HEX
        )
    ).select("doc_id", "source", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    chunks = bnd.select(
        "doc_id",
        "source",
        (F.coalesce(F.lag("i").over(w), F.lit(0)) + 1).alias("s"),
        F.col("i").alias("e"),
    )
    hashed = chunks.join(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "source",
        (F.col("e") - F.col("s") + 1).alias("len"),
        F.md5(F.expr("substr(text, s, e - s + 1)")).alias("h"),
    )
    per_h = hashed.groupBy("source", "h").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.max("len").cast("long").alias("len"),
    )
    return (
        per_h.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).cast("long").alias("n_unique_chunks"),
            F.sum(F.col("cnt") * F.col("len")).cast("long").alias("bytes_total"),
            F.sum("len").cast("long").alias("bytes_unique"),
            F.round(
                F.sum(F.col("cnt") * F.col("len")) * F.lit(1.0) / F.sum("cnt"), 4
            ).alias("avg_chunk_bytes"),
            F.round(
                1 - F.count(F.lit(1)) * F.lit(1.0) / F.sum("cnt"), 6
            ).alias("chunk_dedup_ratio"),
            F.round(
                1 - F.sum("len") * F.lit(1.0) / F.sum(F.col("cnt") * F.col("len")),
                6,
            ).alias("byte_dedup_ratio"),
        )
        .orderBy("source")
    )
