"""Multimodal columns (SURVEY.md §2.9 L6): text + embedding + typed metadata
in one relation, and opaque-binary media plumbing with a stubbed decoder.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake behind the same mapInPandas plumbing a real
decoder would use (schema, Arrow batching, partitioning are real — swap
`_fake_decode` for a PIL/ffmpeg call in production). See
bigdatainfinance1_spark.functions.media.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatainfinance1_spark.functions.vector import l2_norm
from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table


@query(
    "q_multimodal_join",
    oracle="""
    SELECT
      d.doc_id,
      d.lang,
      d.source,
      d.n_chars,
      e.label,
      CAST(len(e.embedding) AS BIGINT) AS dim,
      round(sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
                                       AS emb_norm
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.lang IN ('en', 'zh')
    """,
    tags=("multimodal", "llm"),
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: one relation carrying text metadata + vector modality — join
    documents ⋈ embeddings on id, filter on text-side attrs, compute on the
    vector side. Both tables are id-partitioned, so at scale this is a
    co-partitioned join (bucket both by id to eliminate the shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.filter(F.col("lang").isin("en", "zh"))
        .join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "label",
            F.size("embedding").cast("long").alias("dim"),
            F.round(l2_norm("embedding"), 6).alias("emb_norm"),
        )
    )


@query(
    "q_binary_media_meta",
    oracle="""
    SELECT
      lang,
      count(*)                          AS n_media,
      CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
      round(avg(strlen(text)), 4)       AS avg_bytes,
      CAST(max(strlen(text)) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY lang
    """,
    tags=("multimodal", "llm"),
)
def binary_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: opaque-binary metadata pass — treat the payload as bytes (here the
    utf-8 encoding of text stands in for an image/audio blob) and aggregate
    typed metadata (byte sizes) without ever decoding. This is the cheap
    metadata-only scan you run at 100 TB before deciding what to decode."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("lang", F.encode("text", "utf-8").alias("payload"))
    return media.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.round(F.avg(F.octet_length("payload")), 4).alias("avg_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
    )


@query(
    "q_media_features",
    oracle="""
    WITH bytes AS (
      SELECT doc_id, lang, n_bytes, (i - 1) % 8 AS stripe,
             ascii(substr(text, i, 1)) AS v
      FROM (
        SELECT doc_id, lang, text, strlen(text) AS n_bytes,
               unnest(range(1, strlen(text) + 1)) AS i
        FROM documents
      )
    ),
    stripes AS (
      SELECT doc_id, lang, n_bytes, stripe,
             (1000000000 * sum(v)) // (256 * count(*)) AS q
      FROM bytes GROUP BY doc_id, lang, n_bytes, stripe
    ),
    docfeat AS (
      SELECT doc_id, lang, n_bytes, sum(q) AS feat_grain
      FROM stripes GROUP BY doc_id, lang, n_bytes
    )
    SELECT
      lang,
      count(*)                   AS n_media,
      round(avg(n_bytes), 4)     AS avg_bytes,
      round(sum(feat_grain) * 1.0 / count(*) / 8 / 1e9, 6) AS avg_feat_mean
    FROM docfeat GROUP BY lang
    """,
    tags=("multimodal", "llm", "pandas-udf"),
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (decode path): mapInPandas feature extraction over binary payloads.

    The Spark-side plumbing is real — Arrow-batched iterator, explicit output
    schema, per-partition batching; the decoder is a deterministic fake
    (real codecs aren't in this container — see functions/media.py, swap
    `fake_decode` for the real library call).

    Oracle upgrade (round 2): fake_decode is byte arithmetic — stripe s of a
    payload is bytes s, s+8, s+16, …; its feature is mean(stripe)/256 and
    feat_mean averages the 8 stripes — and the payload is the utf-8 encoding
    of ASCII text (byte i == ascii(char i), which the binary_media_meta
    strlen/octet_length hash match already proves), so DuckDB reproduces the
    whole decode numerically and this query is value-hash-checked instead of
    rows-only. Output: per-lang mean fake-feature stats.

    Emission hardening (round-6 window rule): the per-lang feature mean
    aggregates feat_grain — fake_grain's exact-INTEGER stripe statistic
    (pure integer division per stripe, order-insensitive BIGINT sum) —
    instead of the double feat_mean, whose 8-stripe float sum is
    summation-order-sensitive across engines. avg_bytes stays: n_bytes is
    integer-valued so its sum is exact in either order.
    """
    from bigdatainfinance1_spark.functions.media import decode_features_schema, extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", "lang", F.encode("text", "utf-8").alias("payload"))
    feats = media.mapInPandas(extract_features, schema=decode_features_schema())
    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
        F.round(
            F.sum("feat_grain") * F.lit(1.0) / F.count(F.lit(1)) / 8 / 1e9, 6
        ).alias("avg_feat_mean"),
    )


@query(
    "q_frame_sample",
    oracle="""
    WITH guard AS (
      -- The byte arithmetic below (strlen/substr/ascii) equals the Spark
      -- side's utf-8 byte slicing ONLY for single-byte ASCII text. If the
      -- driver ever regenerates a corpus with multibyte text, fail loudly
      -- here instead of hash-mismatching mysteriously (round-2 ADVICE).
      SELECT CASE WHEN count(*) = 0 THEN 0
                  ELSE error('q_frame_sample oracle assumes single-byte ASCII text; corpus violates it')
             END AS ok
      FROM documents WHERE strlen(text) <> length(text)
    ),
    f AS (
      SELECT doc_id, lang, text,
             (strlen(text) + 63) // 64 AS n_frames,
             ((strlen(text) + 63) // 64 + 3) // 4 AS n_sampled
      FROM documents, guard
      WHERE guard.ok = 0
    ),
    firsts AS (
      SELECT f.doc_id, f.lang,
             ascii(substr(f.text, 1 + 256 * k.k, 1)) AS b
      FROM f
      -- bound derived from the corpus, not a hard-coded 4096 (round-2 ADVICE)
      JOIN (SELECT unnest(range(0, (SELECT max(n_sampled) FROM f))) AS k) k ON k.k < f.n_sampled
    )
    SELECT
      f.lang,
      CAST(count(DISTINCT f.doc_id) AS BIGINT) AS n_docs,
      CAST(sum(f.n_frames) AS BIGINT)          AS total_frames,
      CAST(sum(f.n_sampled) AS BIGINT)         AS total_sampled,
      round(
        (SELECT sum(b) FROM firsts fi WHERE fi.lang = f.lang) * 1e0
        / sum(f.n_sampled), 4)                 AS mean_first_byte
    FROM f
    GROUP BY f.lang
    """,
    tags=("multimodal", "llm"),
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 frame-sampling plumbing: treat each payload as a pseudo-video of
    64-byte frames, keep every 4th frame (the stride-sampling every vision
    pipeline runs before the expensive per-frame model), and profile the
    kept frames per language. The frame slicing and byte access are REAL
    mapInPandas work over Arrow batches of binary payloads — swap the
    byte-slice for an ffmpeg keyframe call in production (same schema,
    same batch shape; functions/media.py posture). The payload bytes are
    the utf-8 text (1 byte/char in this corpus), so DuckDB reproduces the
    sampled first-byte profile exactly via substr/ascii arithmetic — a
    full value-hash oracle ON the sampling arithmetic, not just row
    counts. Scale: narrow map, no shuffle until the per-lang aggregate;
    frames never materialize outside the Python batch."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", "lang", F.encode("text", "utf-8").alias("payload"))

    def sample_frames(batches):
        for pdf in batches:
            rows = []
            for doc_id, lang, payload in zip(pdf["doc_id"], pdf["lang"], pdf["payload"]):
                b = bytes(payload)
                frames = [b[i : i + 64] for i in range(0, len(b), 64)]
                sampled = frames[::4]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "lang": lang,
                        "n_frames": len(frames),
                        "n_sampled": len(sampled),
                        "sum_first": int(sum(fr[0] for fr in sampled)),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "lang", "n_frames", "n_sampled", "sum_first"],
            )

    per_doc = media.mapInPandas(
        sample_frames,
        "doc_id long, lang string, n_frames long, n_sampled long, sum_first long",
    )
    return per_doc.groupBy("lang").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.sum("n_sampled").cast("long").alias("total_sampled"),
        F.round(F.sum("sum_first") * F.lit(1.0) / F.sum("n_sampled"), 4).alias("mean_first_byte"),
    )


@query(
    "q_media_dedup",
    oracle="""
    WITH guard AS (
      -- byte==char only for single-byte ASCII payloads (q_frame_sample's
      -- guard): fail loudly on a multibyte corpus instead of hash-diverging
      SELECT CASE WHEN count(*) = 0 THEN 0
                  ELSE error('q_media_dedup oracle assumes single-byte ASCII text')
             END AS ok
      FROM documents WHERE strlen(text) <> length(text)
    ),
    f AS (
      SELECT doc_id, text,
             (strlen(text) + 63) // 64 AS n_frames,
             ((strlen(text) + 63) // 64 + 3) // 4 AS n_sampled
      FROM documents, guard WHERE guard.ok = 0
    ),
    p AS (
      SELECT doc_id,
             md5(array_to_string(
                   list_transform(range(0, n_sampled), k -> substr(text, 1 + 256 * k, 1)), '')
                 || ':' || n_frames)  AS phash,
             md5(text)                AS exact_hash
      FROM f
    )
    SELECT
      phash,
      CAST(count(*) AS BIGINT)                    AS n_media,
      CAST(count(DISTINCT exact_hash) AS BIGINT)  AS n_exact_variants,
      min(doc_id)                                 AS canonical_doc_id,
      CAST(count(DISTINCT exact_hash) > 1 AS BOOLEAN) AS near_dup_group
    FROM p GROUP BY phash
    HAVING count(*) >= 2
    """,
    tags=("multimodal", "dedup", "llm"),
)
def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 media dedup, two tiers in one pass — the image-corpus curation
    shape (exact byte dedup + perceptual-hash near-dup): per blob compute
    (a) the exact content hash of the payload bytes and (b) a perceptual
    fingerprint from the SAMPLED frame signature — the first byte of every
    4th 64-byte frame plus the frame count (stride-256 byte probe; a real
    pipeline puts pHash/dHash of decoded pixels here — same plumbing, no
    codecs in this container). Groups sharing a fingerprint but holding
    >1 distinct payload are near-duplicate candidates: re-encodes, crops,
    metadata-stripped copies. Output: every fingerprint group of ≥2 blobs
    with its canonical (lowest) doc_id.

    Execution is REAL byte plumbing: payloads travel as binary through
    mapInPandas (Arrow batches), hashed with hashlib on raw bytes — no
    text functions anywhere Spark-side; the DuckDB oracle reproduces both
    hashes with substr/ascii arithmetic under the ASCII guard (byte==char
    on this corpus, asserted — the q_frame_sample posture). Scale: narrow
    map then ONE groupBy on the 16-byte fingerprint — the q_exact_dedup
    shuffle shape; payload bytes never shuffle (only their hashes do),
    which is the entire point for TB-scale media."""
    import hashlib

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def fingerprint(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + 63) // 64
                sig = b[0::256] + b":" + str(n_frames).encode()
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "phash": hashlib.md5(sig).hexdigest(),
                        "exact_hash": hashlib.md5(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "phash", "exact_hash"])

    hashed = media.mapInPandas(fingerprint, "doc_id long, phash string, exact_hash string")
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.count_distinct("exact_hash").alias("n_exact_variants"),
            F.min("doc_id").alias("canonical_doc_id"),
            (F.count_distinct("exact_hash") > 1).alias("near_dup_group"),
        )
        .filter(F.col("n_media") >= 2)
    )


SHARD_TARGET_BYTES = 4096  # shard size target (WebDataset tars use ~100 MB-1 GB;
# scaled to this corpus's ~300-byte payloads so shards hold ~a dozen blobs)


@query(
    "q_media_shard_manifest",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, strlen(text) AS n_bytes FROM documents
    ),
    cum AS (
      SELECT doc_id, n_bytes,
             sum(n_bytes) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_bytes AS cum_before
      FROM sized
    )
    SELECT
      CAST(cum_before // {SHARD_TARGET_BYTES} AS BIGINT) AS shard_id,
      CAST(count(*) AS BIGINT)                           AS n_items,
      CAST(sum(n_bytes) AS BIGINT)                       AS shard_bytes,
      min(doc_id)                                        AS first_doc,
      max(doc_id)                                        AS last_doc,
      round(sum(n_bytes) * 1.0 / {SHARD_TARGET_BYTES}, 4) AS fill_ratio
    FROM cum GROUP BY shard_id
    """,
    tags=("multimodal", "layout", "llm"),
)
def media_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 physical layout: the WebDataset/tar-shard manifest — assign media
    blobs, in stable doc_id order, to size-bounded shards by exclusive
    running byte offset (shard = cum_before // target), then report each
    shard's item count, byte size, id range, and fill ratio. This is the
    relation a training loader consumes (sequential reads within a shard,
    shard-level shuffling across epochs) and the sharding arithmetic every
    tar-packer runs; contiguous-id ranges per shard double as the index for
    range-pruned reads.

    Scale shape: the exclusive prefix sum is the range-bucketed two-phase
    recomposition (functions/ranks.py global_running_sum — never a
    single-partition window), then one groupBy on the derived shard id —
    payload bytes themselves never move, only their sizes. Exact integer
    arithmetic end to end; the only round is the display fill_ratio.
    Sizes are BYTES (octet_length = UTF-8 bytes, matching the oracle's
    strlen) — shard packing is byte accounting, and character counts would
    silently diverge on multibyte text."""
    from bigdatainfinance1_spark.functions.ranks import global_running_sum

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", F.octet_length("text").cast("long").alias("n_bytes"))
    cum = global_running_sum(sized, ["doc_id"], "n_bytes", "cum_incl")
    shard = ((F.col("cum_incl") - F.col("n_bytes")) / SHARD_TARGET_BYTES).cast("long")
    return (
        cum.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.round(F.sum("n_bytes") * 1.0 / SHARD_TARGET_BYTES, 4).alias("fill_ratio"),
        )
    )


VAD_RMS_THRESHOLD = 24.0  # frames with RMS >= this count as "speech"


@query(
    "q_audio_vad_windows",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, lang,
             ((i - 1) // 40) AS frame_idx,
             ascii(substr(text, i, 1)) - 96 AS v,
             strlen(text) AS n_bytes
      FROM (
        SELECT doc_id, lang, text, unnest(range(1, strlen(text) + 1)) AS i
        FROM documents
      )
    ),
    frames AS (
      SELECT doc_id, lang, frame_idx,
             sqrt(sum(v * v) * 1.0 / 40) AS rms
      FROM bytes
      WHERE frame_idx < (n_bytes // 40)
      GROUP BY doc_id, lang, frame_idx
    )
    SELECT lang,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN rms >= {VAD_RMS_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
             AS speech_frames,
           round(sum(CASE WHEN rms >= {VAD_RMS_THRESHOLD} THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS speech_ratio,
           round(CAST(sum(CAST(round(rms * 1e9) AS BIGINT)) AS DOUBLE)
                 / count(*) / 1e9, 6) AS avg_rms
    FROM frames GROUP BY lang
    """,
    tags=("multimodal", "llm", "pandas-udf", "audio"),
)
def audio_vad_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 (audio path): voice-activity-detection-style windowed energy over
    binary payloads — the framing/energy pipeline every audio curation
    stack runs before ASR (silence trimming, speech-ratio quality gates).
    The Spark side is the REAL production shape: Arrow-batched mapInPandas
    (functions/media.py:extract_audio_frames) turning each blob into
    40-sample frames with per-frame RMS after DC removal, then a JVM-side
    aggregate to per-language file/frame counts, speech ratio at the
    {VAD_RMS_THRESHOLD} threshold, and mean energy. The decode is the
    deterministic fake-PCM stand-in (payload = utf-8 bytes; a real
    pipeline swaps one numpy frombuffer line for torchaudio/soundfile).

    Oracle: the fake decode is pure byte arithmetic, so DuckDB reproduces
    every frame numerically (integer square sums, one division, one
    sqrt — all correctly rounded IEEE, bit-identical) and the query is
    value-hash-checked instead of rows-only. Scale: the Python stage is
    Arrow-batched and embarrassingly parallel per file; frames never
    shuffle as raw bytes (RMS is computed before the exchange), and the
    aggregate is map-side-combinable."""
    from bigdatainfinance1_spark.functions.media import (
        audio_frames_schema,
        extract_audio_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", "lang", F.encode("text", "utf-8").alias("payload"))
    frames = media.mapInPandas(extract_audio_frames, schema=audio_frames_schema())
    return frames.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_files"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum(F.when(F.col("rms") >= VAD_RMS_THRESHOLD, 1).otherwise(0))
        .cast("long")
        .alias("speech_frames"),
        F.round(
            F.sum(F.when(F.col("rms") >= VAD_RMS_THRESHOLD, 1).otherwise(0)) * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("speech_ratio"),
        # integer-moments rule: per-frame RMS values are identical doubles
        # on both engines — the mean snaps them at a 1e-9 grain
        F.round(
            F.sum(F.round(F.col("rms") * 1e9).cast("long")).cast("double")
            / F.count(F.lit(1))
            / 1e9,
            6,
        ).alias("avg_rms"),
    )
