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
           round(sum(c * ln(p)) / sum(c), 6) AS avg_logp,
           round(exp(-sum(c * ln(p)) / sum(c)), 4) AS perplexity
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
        F.round(F.sum(F.col("c") * F.log("p")) / F.sum("c"), 6).alias("avg_logp"),
        F.round(F.exp(-F.sum(F.col("c") * F.log("p")) / F.sum("c")), 4).alias("perplexity"),
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
