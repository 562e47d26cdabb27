"""Language-model smoothing operators (round 4 continuation): interpolated
Kneser-Ney — the standard n-gram smoothing that actually works at corpus
scale — completing the LM ladder next to the MLE bigram
(q_bigram_lm_perplexity) and Stupid Backoff (q_stupid_backoff_score).

Scale notes: one token explode (the unavoidable corpus pass) feeding four
vocabulary-sized model relations (bigram counts, left-context totals,
right-continuation type counts, the global bigram-type count); scoring is
equi-joins of the bigram relation against those models. Nothing holds
per-document state; everything after the explode is vocabulary-bounded.

Determinism: all model quantities are exact integer counts; probabilities
are one closed form per bigram; the per-language perplexity aggregates
sum c x ln p over vocabulary-sized groups (the house moment-sum posture)
and round at 4/6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

KN_D = 0.75  # absolute discount


@query(
    "q_kneser_ney_perplexity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT lang, t.t[u.i] AS w1, t.t[u.i + 1] AS w2, count(*) AS c
      FROM t, unnest(range(1, len(t.t))) AS u(i)
      GROUP BY lang, t.t[u.i], t.t[u.i + 1]
    ),
    ctx AS (
      SELECT lang, w1, sum(c) AS c1, count(*) AS n1p_fwd
      FROM bg GROUP BY lang, w1
    ),
    cont AS (
      SELECT lang, w2, count(*) AS n1p_bwd FROM bg GROUP BY lang, w2
    ),
    btypes AS (SELECT lang, count(*) AS b FROM bg GROUP BY lang),
    scored AS (
      SELECT bg.lang, bg.c,
             greatest(bg.c - {KN_D}, 0.0) / ctx.c1
               + {KN_D} * ctx.n1p_fwd / ctx.c1 * cont.n1p_bwd / btypes.b AS p
      FROM bg
      JOIN ctx ON ctx.lang = bg.lang AND ctx.w1 = bg.w1
      JOIN cont ON cont.lang = bg.lang AND cont.w2 = bg.w2
      JOIN btypes ON btypes.lang = bg.lang
    )
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_bigram_tokens,
           round(CAST(sum(CAST(round(c * ln(p) * 1e6) AS HUGEINT)) AS DOUBLE)
                 / 1e6 / sum(c), 6) AS avg_logp,
           round(exp(-CAST(sum(CAST(round(c * ln(p) * 1e6) AS HUGEINT)) AS DOUBLE)
                     / 1e6 / sum(c)), 4) AS perplexity
    FROM scored GROUP BY lang
    """,
    tags=("text", "llm", "lm"),
)
def kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM per language, scored on its own
    training corpus: p(w2|w1) = max(c(w1,w2) - D, 0)/c(w1) +
    D x N1+(w1 .)/c(w1) x P_cont(w2), with the continuation probability
    P_cont(w2) = N1+(. w2)/|bigram types| that makes KN the smoothing of
    record for n-gram LMs (a word seen often in ONE context — "Francisco"
    — gets low continuation mass; the property MLE and additive smoothing
    miss, and the reason CCNet-style quality filters use KN models).
    Reports per-language mean log-probability and perplexity.

    Scale: one bigram explode + four vocabulary-sized model aggregates;
    scoring joins key on (lang, w1) / (lang, w2) — the model relations
    broadcast at production vocabulary sizes. All counts exact integers;
    the interpolation is one closed form per bigram type; perplexity
    rounds at 4 (mean log-prob ulp noise ~1e-12 against it).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    bg = (
        toks.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .groupBy("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ctx = bg.groupBy("lang", "w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = bg.groupBy("lang", "w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    btypes = bg.groupBy("lang").agg(F.count(F.lit(1)).alias("b"))
    p = (
        F.greatest(F.col("c") - KN_D, F.lit(0.0)) / F.col("c1")
        + KN_D * F.col("n1p_fwd") / F.col("c1") * F.col("n1p_bwd") / F.col("b")
    )
    scored = (
        bg.join(ctx, ["lang", "w1"])
        .join(cont, ["lang", "w2"])
        .join(F.broadcast(btypes), "lang")
        .select("lang", "c", p.alias("p"))
    )
    return scored.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_bigram_tokens"),
        # integer-moments rule: the weighted log-prob sum snaps at 1e-6
        F.round(
            F.sum(
                F.round(F.col("c") * F.log("p") * 1e6).cast("decimal(38,0)")
            ).cast("double")
            / 1e6
            / F.sum("c"),
            6,
        ).alias("avg_logp"),
        F.round(
            F.exp(
                -F.sum(
                    F.round(F.col("c") * F.log("p") * 1e6).cast("decimal(38,0)")
                ).cast("double")
                / 1e6
                / F.sum("c")
            ),
            4,
        ).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# q_chao1_vocabulary — unseen-vocabulary estimation
# ---------------------------------------------------------------------------


@query(
    "q_chao1_vocabulary",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT lang, term, count(*) AS c FROM tok GROUP BY lang, term),
    s AS (
      SELECT lang,
             count(*) AS v_obs,
             sum(c) AS n_tokens,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
      FROM tf GROUP BY lang
    )
    SELECT lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(v_obs AS BIGINT) AS vocab_observed,
           CAST(f1 AS BIGINT) AS singletons,
           CAST(f2 AS BIGINT) AS doubletons,
           round(v_obs + f1 * 1.0 * f1 / (2.0 * nullif(f2, 0)), 2) AS chao1_vocab,
           round(v_obs / (v_obs + f1 * 1.0 * f1 / (2.0 * nullif(f2, 0))), 6)
             AS vocab_coverage,
           round(f1 * 1.0 / n_tokens, 6) AS good_turing_unseen_mass
    FROM s
    """,
    tags=("text", "llm", "stats"),
)
def chao1_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseen-vocabulary estimation per language: the Chao1 lower bound
    V_obs + F1^2/(2 F2) from singleton/doubleton type counts — "how many
    word types exist that this crawl hasn't seen yet" — with the implied
    coverage ratio and the Good-Turing unseen probability mass F1/N (the
    chance the NEXT token is a brand-new type). The
    capture-recapture-style answer to "is more crawling worth it" that
    q_heaps_law approaches by curve extrapolation; here it comes from
    the frequency-of-frequencies spectrum instead, and the two should
    agree in order of magnitude — a built-in cross-check.

    Scale: one token explode + one (lang, term) count + one
    frequency-spectrum aggregate; all closed forms of exact integers,
    nullif-guarded for the no-doubletons corner."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    s = tf.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v_obs"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    chao = F.col("v_obs") + F.col("f1") * 1.0 * F.col("f1") / (
        2.0 * F.nullif(F.col("f2"), F.lit(0))
    )
    return s.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("v_obs").cast("long").alias("vocab_observed"),
        F.col("f1").cast("long").alias("singletons"),
        F.col("f2").cast("long").alias("doubletons"),
        F.round(chao, 2).alias("chao1_vocab"),
        F.round(F.col("v_obs") / chao, 6).alias("vocab_coverage"),
        F.round(F.col("f1") * 1.0 / F.col("n_tokens"), 6).alias("good_turing_unseen_mass"),
    )


# ---------------------------------------------------------------------------
# q_good_turing — count-of-counts frequency re-estimation (trigram spectrum)
# ---------------------------------------------------------------------------

GT_SPECTRUM_ROWS = 8  # report the sparse head of the frequency spectrum


@query(
    "q_good_turing",
    oracle=f"""
    WITH tri AS (
      SELECT unnest(
        list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      ) AS g
      FROM (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 2 = 0)
      WHERE len(t) >= 3
    ),
    tc AS (SELECT g, CAST(count(*) AS BIGINT) AS r FROM tri GROUP BY g),
    n AS (SELECT CAST(sum(r) AS BIGINT) AS n_tokens FROM tc),
    coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tc GROUP BY r),
    head AS (SELECT r, n_r FROM coc ORDER BY r LIMIT {GT_SPECTRUM_ROWS}),
    gt AS (
      SELECT a.r, a.n_r, coalesce(b.n_r, 0) AS n_r1
      FROM head a LEFT JOIN coc b ON b.r = a.r + 1
    )
    SELECT g.r, g.n_r, g.n_r1 AS n_r_plus_1,
           round((g.r + 1) * 1e0 * g.n_r1 / g.n_r, 6) AS r_star,
           round((g.r + 1) * 1e0 * g.n_r1 / g.n_r / n.n_tokens, 9) AS p_gt,
           round(g.r * 1e0 / n.n_tokens, 9) AS p_mle
    FROM gt g CROSS JOIN n
    ORDER BY g.r
    """,
    tags=("text", "llm-pipeline", "lm"),
)
def good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency re-estimation over the even-doc trigram
    spectrum: for each of the smallest observed counts r, the adjusted
    count r* = (r+1) N_{r+1} / N_r from the count-of-counts relation —
    the classical smoothing estimate (r=1's deflation IS the unseen-mass
    N_1/N transfer) completing the repo's LM-smoothing ladder beside the
    MLE, stupid-backoff, and Kneser-Ney tiers. Trigrams, not unigrams:
    the corpus vocabulary is 31 types with every count deep in the
    hundreds, so only the n-gram spectrum has the sparse low-r head GT
    exists to fix; taking the 8 SMALLEST r present (rather than r <= 8)
    keeps the relation non-vacuous at every scale factor. p_gt vs p_mle
    per row shows exactly how much mass each band gives up.

    Determinism: shingle counts, the spectrum, and N are exact BIGINTs;
    r* and the probabilities are closed-form ratios of those integers,
    rounded at 6/9. Scale: one shingle explode -> two map-side
    aggregates; the spectrum relation is O(distinct counts) — tiny — and
    both the head selection and the r+1 self-join run on it, never the
    corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    toks = docs.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 3)
    tri = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3),"
                " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
            )
        ).alias("g")
    )
    tc = tri.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("r"))
    n = tc.agg(F.sum("r").cast("long").alias("n_tokens"))
    coc = tc.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    head = coc.orderBy("r").limit(GT_SPECTRUM_ROWS)
    nxt = coc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    gt = head.join(F.broadcast(nxt), "r", "left").na.fill({"n_r1": 0})
    r, n_r, n_r1 = F.col("r"), F.col("n_r"), F.col("n_r1")
    r_star = (r + 1) * F.lit(1.0) * n_r1 / n_r
    return (
        gt.crossJoin(F.broadcast(n))
        .select(
            r,
            n_r,
            n_r1.alias("n_r_plus_1"),
            F.round(r_star, 6).alias("r_star"),
            F.round(r_star / F.col("n_tokens"), 9).alias("p_gt"),
            F.round(r * F.lit(1.0) / F.col("n_tokens"), 9).alias("p_mle"),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# q_oov_rate — held-out vocabulary coverage per language
# ---------------------------------------------------------------------------


@query(
    "q_oov_rate",
    oracle="""
    WITH train AS (
      SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id % 2 = 0
    ),
    test AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id % 2 = 1
    ),
    tt AS (
      SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
      FROM test GROUP BY lang, term
    ),
    j AS (
      SELECT tt.lang, tt.term, tt.cnt,
             CASE WHEN tr.term IS NULL THEN 1 ELSE 0 END AS is_oov
      FROM tt LEFT JOIN train tr ON tt.lang = tr.lang AND tt.term = tr.term
    ),
    v AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_train_types FROM train GROUP BY lang
    )
    SELECT j.lang,
           v.n_train_types,
           CAST(sum(j.cnt) AS BIGINT) AS n_test_tokens,
           CAST(sum(j.is_oov * j.cnt) AS BIGINT) AS n_oov_tokens,
           round(sum(j.is_oov * j.cnt) * 1e0 / sum(j.cnt), 6) AS oov_token_rate,
           CAST(count(*) AS BIGINT) AS n_test_types,
           CAST(sum(j.is_oov) AS BIGINT) AS n_oov_types,
           round(sum(j.is_oov) * 1e0 / count(*), 6) AS oov_type_rate
    FROM j JOIN v ON j.lang = v.lang
    GROUP BY j.lang, v.n_train_types
    ORDER BY j.lang
    """,
    tags=("text", "llm-pipeline", "lm"),
)
def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language: train a type vocabulary on the
    even-doc half, measure what fraction of held-out (odd-doc) tokens and
    types fall outside it — the vocabulary-coverage QA metric that decides
    tokenizer vocab size and flags language/domain shift between corpus
    slices (the open-vocabulary problem q_bpe_train exists to solve; this
    query quantifies how bad the closed-vocab baseline is).

    Determinism: all eight reported quantities are exact integer counts or
    single ratios of them, rounded at 6. Scale: two token explodes, a
    distinct per (lang, term), and a (lang, term)-keyed left join — all
    linear, key-partitioned shapes; per-language output is 5 rows."""
    docs = load_table(spark, sf_dir, "documents")
    train = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("lang", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    tt = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    j = tt.join(
        train.withColumn("_hit", F.lit(1)), ["lang", "term"], "left"
    ).select(
        "lang", "cnt", F.when(F.col("_hit").isNull(), 1).otherwise(0).alias("is_oov")
    )
    v = train.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_train_types"))
    return (
        j.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_test_tokens"),
            F.sum(F.col("is_oov") * F.col("cnt")).cast("long").alias("n_oov_tokens"),
            F.round(
                F.sum(F.col("is_oov") * F.col("cnt")) * F.lit(1.0) / F.sum("cnt"), 6
            ).alias("oov_token_rate"),
            F.count(F.lit(1)).cast("long").alias("n_test_types"),
            F.sum("is_oov").cast("long").alias("n_oov_types"),
            F.round(F.sum("is_oov") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "oov_type_rate"
            ),
        )
        .join(F.broadcast(v), "lang")
        .select(
            "lang", "n_train_types", "n_test_tokens", "n_oov_tokens",
            "oov_token_rate", "n_test_types", "n_oov_types", "oov_type_rate",
        )
        .orderBy("lang")
    )
