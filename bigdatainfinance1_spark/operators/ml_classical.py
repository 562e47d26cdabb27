"""Classical-ML evaluation and modeling operators (round 4 continuation):
ROC threshold sweep from bucketed suffix sums, Cramér's V association,
a single-feature decision stump learned by Gini impurity, Jensen-Shannon
divergence between language unigram distributions, and a multinomial
Naive Bayes language classifier with a train/test split.

These extend the ML-eval surface (q_auc_by_month, q_confusion_matrix,
q_calibration_bins, q_woe_iv) from *scoring* metrics to *model-side*
machinery: a learned split, a generative classifier, and
distribution-level divergences — each still a pure DataFrame program
with a full DuckDB value-hash oracle.

Scale notes: q_roc_curve and q_decision_stump first reduce the fact scan
to O(buckets) integer counts (one groupBy), then do all threshold work on
that bounded relation — the 100 TB cost is one map-side-combinable
aggregate regardless of the threshold grid. q_cramers_v is one
contingency aggregate over bounded (segment x priority) cells.
q_js_divergence and q_naive_bayes_langid are one token explode
(O(corpus tokens), the unavoidable scan) followed by vocabulary- or
model-bounded joins; the language dimension (5 rows) and the top-V
vocabulary ride broadcasts.

Determinism contract: every decision (ROC flags, stump argmin, NB argmax)
is made on integer counts or on doubles rounded to 6-9 dp BEFORE the
comparison, with an explicit total-order tie-break, so both engines pick
identical winners; log-sum scores follow the house moment-sum posture
(bounded summand count per key, rounding step orders of magnitude above
ulp noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatainfinance1_spark.registry import query
from bigdatainfinance1_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# q_roc_curve
# ---------------------------------------------------------------------------

ROC_BUCKET = 25000.0  # score bucket width = threshold step
ROC_MAX_BUCKET = 20  # thresholds 0, 25k, ..., 500k

_POS_SQL = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@query(
    "q_roc_curve",
    oracle=f"""
    WITH b AS (
      SELECT CAST(least(floor(o_totalprice / {ROC_BUCKET}), {ROC_MAX_BUCKET}) AS BIGINT) AS bkt,
             sum(CASE WHEN {_POS_SQL} THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN {_POS_SQL} THEN 0 ELSE 1 END) AS neg
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(pos) AS p, sum(neg) AS n FROM b),
    thr AS (SELECT unnest(range(0, {ROC_MAX_BUCKET} + 1)) AS t),
    roc AS (
      SELECT t.t,
             coalesce(sum(CASE WHEN b.bkt >= t.t THEN b.pos END), 0) AS tp,
             coalesce(sum(CASE WHEN b.bkt >= t.t THEN b.neg END), 0) AS fp
      FROM thr t LEFT JOIN b ON true
      GROUP BY t.t
    )
    SELECT CAST(t * {ROC_BUCKET} AS DOUBLE) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(tot.p - tp AS BIGINT) AS fn, CAST(tot.n - fp AS BIGINT) AS tn,
           round(tp * 1.0 / tot.p, 6) AS tpr,
           round(fp * 1.0 / tot.n, 6) AS fpr,
           round(tp * 1.0 / nullif(tp + fp, 0), 6) AS precision,
           round(tp * 1.0 / tot.p - fp * 1.0 / tot.n, 6) AS youden_j
    FROM roc CROSS JOIN tot
    """,
    tags=("ml", "eval"),
)
def roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating points for the order-value-predicts-urgency
    classifier (label = priority URGENT/HIGH, score = o_totalprice) at a
    fixed 25k-wide threshold ladder: per threshold the exact integer
    confusion counts, TPR/FPR, precision, and Youden's J. (TPC-H priority
    is independent of price, so the curve hugs the diagonal — the point
    is the exactly-verified machinery, which is input-agnostic.)

    Scale: the fact scan collapses to O(buckets) integer counts in ONE
    map-side-combinable groupBy; the threshold sweep is then suffix sums
    over that <=21-row relation, so the grid size never touches the
    corpus pass (contrast with the naive per-threshold scan, which costs
    grid x corpus). All ratios come from exact integers, rounded at 6 —
    nothing engine-specific anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    is_pos = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    b = orders.groupBy(
        F.least(F.floor(F.col("o_totalprice") / ROC_BUCKET), F.lit(ROC_MAX_BUCKET))
        .cast("long")
        .alias("bkt")
    ).agg(
        F.sum(F.when(is_pos, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(is_pos, 0).otherwise(1)).alias("neg"),
    )
    tot = b.agg(F.sum("pos").alias("p"), F.sum("neg").alias("n"))
    thr = spark.range(0, ROC_MAX_BUCKET + 1).select(F.col("id").alias("t"))
    roc = (
        thr.join(F.broadcast(b), F.lit(True), "left")
        .groupBy("t")
        .agg(
            F.coalesce(F.sum(F.when(F.col("bkt") >= F.col("t"), F.col("pos"))), F.lit(0)).alias("tp"),
            F.coalesce(F.sum(F.when(F.col("bkt") >= F.col("t"), F.col("neg"))), F.lit(0)).alias("fp"),
        )
    )
    return roc.crossJoin(F.broadcast(tot)).select(
        (F.col("t") * ROC_BUCKET).cast("double").alias("threshold"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        (F.col("p") - F.col("tp")).cast("long").alias("fn"),
        (F.col("n") - F.col("fp")).cast("long").alias("tn"),
        F.round(F.col("tp") * 1.0 / F.col("p"), 6).alias("tpr"),
        F.round(F.col("fp") * 1.0 / F.col("n"), 6).alias("fpr"),
        F.round(F.col("tp") * 1.0 / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6).alias(
            "precision"
        ),
        F.round(F.col("tp") * 1.0 / F.col("p") - F.col("fp") * 1.0 / F.col("n"), 6).alias(
            "youden_j"
        ),
    )


# ---------------------------------------------------------------------------
# q_cramers_v
# ---------------------------------------------------------------------------


@query(
    "q_cramers_v",
    oracle="""
    WITH cell AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri, count(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT sum(n) AS n_total,
             count(DISTINCT seg) AS r, count(DISTINCT pri) AS c
      FROM cell
    ),
    marg AS (
      SELECT cell.seg, cell.pri, cell.n,
             rs.rn, cs.cn, tot.n_total, tot.r, tot.c
      FROM cell
      JOIN (SELECT seg, sum(n) AS rn FROM cell GROUP BY seg) rs USING (seg)
      JOIN (SELECT pri, sum(n) AS cn FROM cell GROUP BY pri) cs USING (pri)
      CROSS JOIN tot
    ),
    chi AS (
      SELECT max(n_total) AS n_total, max(r) AS r, max(c) AS c,
             sum(pow(n - rn * 1.0 * cn / n_total, 2) / (rn * 1.0 * cn / n_total)) AS chi2
      FROM marg
    )
    SELECT CAST(n_total AS BIGINT) AS n,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (n_total * least(r - 1, c - 1))), 6) AS cramers_v
    FROM chi
    """,
    tags=("ml", "stats"),
)
def cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized strength of association between
    market segment and order priority: chi-square over the 5x5
    contingency table, then V = sqrt(chi2 / (n x min(r-1, c-1))). This is
    the effect-size companion to q_chi2_independence's significance test
    (a chi2 can be "significant" at 100 TB row counts while V ~ 0 shows
    the association is practically nil — exactly the large-n trap).

    Scale: one fact-dim join + one groupBy to O(|seg| x |priority|) = 25
    integer cells; everything downstream is closed-form arithmetic on
    those integers (expected counts as rn x cn / n), rounded at 6.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cell = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rs = cell.groupBy("seg").agg(F.sum("n").alias("rn"))
    cs = cell.groupBy("pri").agg(F.sum("n").alias("cn"))
    tot = cell.agg(
        F.sum("n").alias("n_total"),
        F.countDistinct("seg").alias("r"),
        F.countDistinct("pri").alias("c"),
    )
    marg = (
        cell.join(F.broadcast(rs), "seg")
        .join(F.broadcast(cs), "pri")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("rn") * 1.0 * F.col("cn") / F.col("n_total")
    chi = marg.agg(
        F.max("n_total").alias("n_total"),
        F.max("r").alias("r"),
        F.max("c").alias("c"),
        F.sum(F.pow(F.col("n") - e, F.lit(2)) / e).alias("chi2"),
    )
    return chi.select(
        F.col("n_total").cast("long").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n_total") * F.least(F.col("r") - 1, F.col("c") - 1))),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# q_decision_stump
# ---------------------------------------------------------------------------

STUMP_STEP = 25000.0
STUMP_MIN_T = 1  # thresholds 25k .. 475k (both sides non-empty at every sf)
STUMP_MAX_T = 19


@query(
    "q_decision_stump",
    oracle=f"""
    WITH b AS (
      SELECT CAST(least(floor(o_totalprice / {STUMP_STEP}), {STUMP_MAX_T}) AS BIGINT) AS bkt,
             sum(CASE WHEN {_POS_SQL} THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN {_POS_SQL} THEN 0 ELSE 1 END) AS neg
      FROM orders GROUP BY 1
    ),
    thr AS (SELECT unnest(range({STUMP_MIN_T}, {STUMP_MAX_T} + 1)) AS t),
    split AS (
      SELECT t.t,
             coalesce(sum(CASE WHEN b.bkt < t.t THEN b.pos END), 0) AS pl,
             coalesce(sum(CASE WHEN b.bkt < t.t THEN b.neg END), 0) AS nl,
             coalesce(sum(CASE WHEN b.bkt >= t.t THEN b.pos END), 0) AS pr,
             coalesce(sum(CASE WHEN b.bkt >= t.t THEN b.neg END), 0) AS nr
      FROM thr t LEFT JOIN b ON true
      GROUP BY t.t
    ),
    scored AS (
      SELECT t, pl, nl, pr, nr,
             round((
               (pl + nl) * (1.0 - (pl * 1.0 * pl + nl * 1.0 * nl) / nullif((pl + nl) * 1.0 * (pl + nl), 0))
               + (pr + nr) * (1.0 - (pr * 1.0 * pr + nr * 1.0 * nr) / nullif((pr + nr) * 1.0 * (pr + nr), 0))
             ) / (pl + nl + pr + nr), 9) AS wgini
      FROM split
      WHERE pl + nl > 0 AND pr + nr > 0
    ),
    parent AS (
      SELECT 1.0 - (sum(pos) * 1.0 * sum(pos) + sum(neg) * 1.0 * sum(neg))
                   / (sum(pos + neg) * 1.0 * sum(pos + neg)) AS g0
      FROM b
    ),
    best AS (
      SELECT * FROM scored ORDER BY wgini ASC, t ASC LIMIT 1
    )
    SELECT CAST(best.t * {STUMP_STEP} AS DOUBLE) AS best_threshold,
           CAST(best.pl + best.nl AS BIGINT) AS n_left,
           CAST(best.pr + best.nr AS BIGINT) AS n_right,
           round(best.wgini, 6) AS weighted_gini,
           round(parent.g0, 6) AS parent_gini,
           round(parent.g0 - best.wgini, 6) AS gini_gain
    FROM best CROSS JOIN parent
    """,
    tags=("ml", "model"),
)
def decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A depth-1 decision tree (stump) learned on order value to predict
    urgent/high priority: evaluate every threshold on a fixed 25k ladder,
    score each split by weighted Gini impurity, and return the argmin
    split with its impurity gain over the parent — the exact inner-loop
    step of distributed tree learners (the histogram-split trick
    XGBoost/LightGBM use), verified end to end.

    Scale: identical posture to q_roc_curve — ONE map-side-combinable
    groupBy reduces the scan to O(buckets) integer (pos, neg) counts;
    the threshold sweep, impurity algebra, and argmin all run on that
    bounded relation. Determinism: Gini values are products/ratios of
    exact integers rounded at 9 dp before the ORDER BY, with the
    threshold index as total-order tie-break.
    """
    orders = load_table(spark, sf_dir, "orders")
    is_pos = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    b = orders.groupBy(
        F.least(F.floor(F.col("o_totalprice") / STUMP_STEP), F.lit(STUMP_MAX_T))
        .cast("long")
        .alias("bkt")
    ).agg(
        F.sum(F.when(is_pos, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(is_pos, 0).otherwise(1)).alias("neg"),
    )
    thr = spark.range(STUMP_MIN_T, STUMP_MAX_T + 1).select(F.col("id").alias("t"))
    split = (
        thr.join(F.broadcast(b), F.lit(True), "left")
        .groupBy("t")
        .agg(
            F.coalesce(F.sum(F.when(F.col("bkt") < F.col("t"), F.col("pos"))), F.lit(0)).alias("pl"),
            F.coalesce(F.sum(F.when(F.col("bkt") < F.col("t"), F.col("neg"))), F.lit(0)).alias("nl"),
            F.coalesce(F.sum(F.when(F.col("bkt") >= F.col("t"), F.col("pos"))), F.lit(0)).alias("pr"),
            F.coalesce(F.sum(F.when(F.col("bkt") >= F.col("t"), F.col("neg"))), F.lit(0)).alias("nr"),
        )
        .filter((F.col("pl") + F.col("nl") > 0) & (F.col("pr") + F.col("nr") > 0))
    )

    def gini_side(p, n):
        tot = (p + n) * 1.0 * (p + n)
        return (p + n) * (
            1.0 - (p * 1.0 * p + n * 1.0 * n) / F.nullif(tot, F.lit(0.0))
        )

    wgini = F.round(
        (gini_side(F.col("pl"), F.col("nl")) + gini_side(F.col("pr"), F.col("nr")))
        / (F.col("pl") + F.col("nl") + F.col("pr") + F.col("nr")),
        9,
    )
    scored = split.withColumn("wgini", wgini)
    best = scored.orderBy(F.col("wgini").asc(), F.col("t").asc()).limit(1)
    parent = b.agg(
        (
            1.0
            - (F.sum("pos") * 1.0 * F.sum("pos") + F.sum("neg") * 1.0 * F.sum("neg"))
            / (F.sum(F.col("pos") + F.col("neg")) * 1.0 * F.sum(F.col("pos") + F.col("neg")))
        ).alias("g0")
    )
    return best.crossJoin(F.broadcast(parent)).select(
        (F.col("t") * STUMP_STEP).cast("double").alias("best_threshold"),
        (F.col("pl") + F.col("nl")).cast("long").alias("n_left"),
        (F.col("pr") + F.col("nr")).cast("long").alias("n_right"),
        F.round(F.col("wgini"), 6).alias("weighted_gini"),
        F.round(F.col("g0"), 6).alias("parent_gini"),
        F.round(F.col("g0") - F.col("wgini"), 6).alias("gini_gain"),
    )


# ---------------------------------------------------------------------------
# q_js_divergence
# ---------------------------------------------------------------------------

JSD_VOCAB = 100  # global top-V vocabulary (ties broken alphabetically)


@query(
    "q_js_divergence",
    oracle=f"""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
    vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, term) AS rnk
        FROM tok GROUP BY term
      ) WHERE rnk <= {JSD_VOCAB}
    ),
    lt AS (
      SELECT t.lang, t.term, count(*) AS n
      FROM tok t JOIN vocab v USING (term)
      GROUP BY t.lang, t.term
    ),
    grid AS (
      SELECT l.lang, v.term, coalesce(lt.n, 0) AS n
      FROM (SELECT DISTINCT lang FROM documents) l
      CROSS JOIN vocab v
      LEFT JOIN lt ON lt.lang = l.lang AND lt.term = v.term
    ),
    p AS (
      SELECT lang, term,
             (n + 1.0) / (sum(n) OVER (PARTITION BY lang) + {JSD_VOCAB}) AS p
      FROM grid
    ),
    pair AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, a.term,
             a.p AS pa, b.p AS pb
      FROM p a JOIN p b ON a.term = b.term AND a.lang < b.lang
    )
    SELECT lang_a, lang_b,
           round(sum(0.5 * pa * ln(pa / ((pa + pb) / 2.0))
                     + 0.5 * pb * ln(pb / ((pa + pb) / 2.0))), 6) AS jsd_nats,
           round(sqrt(sum(0.5 * pa * ln(pa / ((pa + pb) / 2.0))
                          + 0.5 * pb * ln(pb / ((pa + pb) / 2.0)))), 6) AS js_distance
    FROM pair GROUP BY lang_a, lang_b
    """,
    tags=("text", "llm", "stats"),
)
def js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every language pair's unigram
    distribution over the global top-{V} vocabulary (add-1 smoothed so no
    zero probabilities) — the symmetric, bounded corpus-drift measure
    used to compare data mixtures (it is the metric behind mixture-drift
    monitors; complements q_psi_drift's bucketed PSI with a
    distribution-level one).

    Scale: the only corpus-sized step is the token explode + one
    vocabulary-filtered groupBy; the vocabulary (top-{V}, alphabetical
    tie-break) and the language dimension are broadcast-sized, so the
    pair join runs on an O(langs x V) relation. The per-pair sum spans
    exactly {V} terms of magnitude <= ~0.05 — ulp noise sits 9 orders
    under the 6-dp rounding.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(JSD_VOCAB)  # TakeOrdered — distributed global top-V, no window
        .select("term")
    )
    lt = (
        tok.join(F.broadcast(vocab), "term")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    langs = docs.select("lang").distinct()
    grid = (
        F.broadcast(langs)
        .crossJoin(F.broadcast(vocab))
        .join(lt, ["lang", "term"], "left")
        .select("lang", "term", F.coalesce("n", F.lit(0)).alias("n"))
    )
    wl = Window.partitionBy("lang")
    p = grid.select(
        "lang",
        "term",
        ((F.col("n") + 1.0) / (F.sum("n").over(wl) + F.lit(JSD_VOCAB))).alias("p"),
    )
    a, b = p.alias("a"), p.alias("b")
    pair = a.join(
        b, (F.col("a.term") == F.col("b.term")) & (F.col("a.lang") < F.col("b.lang"))
    ).select(
        F.col("a.lang").alias("lang_a"),
        F.col("b.lang").alias("lang_b"),
        F.col("a.p").alias("pa"),
        F.col("b.p").alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2.0
    term_jsd = 0.5 * F.col("pa") * F.log(F.col("pa") / m) + 0.5 * F.col("pb") * F.log(
        F.col("pb") / m
    )
    return (
        pair.groupBy("lang_a", "lang_b")
        .agg(F.sum(term_jsd).alias("s"))
        .select(
            "lang_a",
            "lang_b",
            F.round(F.col("s"), 6).alias("jsd_nats"),
            F.round(F.sqrt(F.col("s")), 6).alias("js_distance"),
        )
    )


# ---------------------------------------------------------------------------
# q_naive_bayes_langid
# ---------------------------------------------------------------------------


@query(
    "q_naive_bayes_langid",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
    test AS (
      SELECT doc_id, lang AS true_lang, term, count(*) AS c
      FROM tok WHERE doc_id % 2 = 1
      GROUP BY doc_id, lang, term
    ),
    lt AS (SELECT lang, term, count(*) AS n FROM train GROUP BY lang, term),
    ltot AS (SELECT lang, count(*) AS tot FROM train GROUP BY lang),
    vocab AS (SELECT count(DISTINCT term) AS v FROM train),
    prior AS (
      SELECT lang, count(DISTINCT doc_id) AS nd FROM train GROUP BY lang
    ),
    npri AS (SELECT sum(nd) AS nd_total FROM prior),
    score AS (
      SELECT t.doc_id, t.true_lang, l.lang AS cand_lang,
             min(ln(pr.nd * 1.0 / np.nd_total))
               - sum(t.c) * min(ln(l.tot + vc.v))
               + sum(t.c * ln(coalesce(lt.n, 0) + 1.0)) AS score
      FROM test t
      CROSS JOIN ltot l
      CROSS JOIN vocab vc
      CROSS JOIN npri np
      JOIN prior pr ON pr.lang = l.lang
      LEFT JOIN lt ON lt.lang = l.lang AND lt.term = t.term
      GROUP BY t.doc_id, t.true_lang, l.lang
    ),
    pred AS (
      SELECT doc_id, true_lang, cand_lang AS pred_lang
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY round(score, 6) DESC, cand_lang
        ) AS rnk
        FROM score
      ) WHERE rnk = 1
    )
    SELECT true_lang, pred_lang,
           count(*) AS n_docs,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY true_lang), 6)
             AS share_of_true
    FROM pred GROUP BY true_lang, pred_lang
    """,
    tags=("ml", "text", "llm", "model"),
)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identification with a real
    train/test split: train on even doc_ids (per-language term counts,
    Laplace add-1 over the train vocabulary, log priors from document
    counts), classify odd doc_ids by argmax of log prior + sum_t c_t x
    [ln(n_lt + 1) - ln(tot_l + V)], and report the test confusion matrix
    with per-true-language shares. The generative-model counterpart of
    q_langid_profile's overlap heuristic.

    Scale: token explode + two groupBys (train model, test doc-term
    vectors) are the corpus-sized passes; the model relations (lang-term
    counts, totals, priors, vocab size) are vocabulary-bounded, and
    scoring is one equi-join of test doc-terms against the model per
    candidate language (5x fan-out via a broadcast language dim).
    Determinism: the factored score needs ONE order-ambiguous sum
    (sum c x ln(n+1), bounded per doc, magnitude ~1e2 vs 1e-13 noise);
    the argmax ranks on round(score, 6) DESC with the language as
    total-order tie-break, so both engines pick the same winner.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))
    train = tok.filter(F.col("doc_id") % 2 == 0)
    test = (
        tok.filter(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lt = train.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    ltot = train.groupBy("lang").agg(F.count(F.lit(1)).alias("tot"))
    vocab = train.agg(F.countDistinct("term").alias("v"))
    prior = train.groupBy("lang").agg(F.countDistinct("doc_id").alias("nd"))
    npri = prior.agg(F.sum("nd").alias("nd_total"))
    cand = (
        F.broadcast(ltot)
        .join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(npri))
    )
    score = (
        test.crossJoin(cand.select(F.col("lang").alias("cand_lang"), "tot", "v", "nd", "nd_total"))
        .join(
            lt.select(F.col("lang").alias("cand_lang"), "term", "n"),
            ["cand_lang", "term"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(
            (
                F.min(F.log(F.col("nd") * 1.0 / F.col("nd_total")))
                - F.sum("c") * F.min(F.log(F.col("tot") + F.col("v")))
                + F.sum(F.col("c") * F.log(F.coalesce(F.col("n"), F.lit(0)) + 1.0))
            ).alias("score")
        )
    )
    wd = Window.partitionBy("doc_id").orderBy(F.round(F.col("score"), 6).desc(), F.col("cand_lang").asc())
    pred = (
        score.withColumn("rnk", F.row_number().over(wd))
        .filter(F.col("rnk") == 1)
        .select("doc_id", "true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    wt = Window.partitionBy("true_lang")
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "true_lang",
            "pred_lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(wt), 6).alias("share_of_true"),
        )
    )


# ---------------------------------------------------------------------------
# q_bleu_pairs
# ---------------------------------------------------------------------------


@query(
    "q_bleu_pairs",
    oracle="""
    WITH pairs AS (
      SELECT a.doc_id AS ref_doc, b.doc_id AS cand_doc, a.lang,
             string_split(a.text, ' ') AS rt, string_split(b.text, ' ') AS ct
      FROM documents a JOIN documents b
        ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0 AND a.lang = b.lang
    ),
    cg AS (
      SELECT ref_doc, n, gram, count(*) AS c FROM (
        SELECT ref_doc, 1 AS n, unnest(ct) AS gram FROM pairs
        UNION ALL
        SELECT ref_doc, 2 AS n,
               unnest(list_transform(range(1, len(ct)), i -> ct[i] || ' ' || ct[i + 1])) AS gram
        FROM pairs
      ) GROUP BY ref_doc, n, gram
    ),
    rg AS (
      SELECT ref_doc, n, gram, count(*) AS r FROM (
        SELECT ref_doc, 1 AS n, unnest(rt) AS gram FROM pairs
        UNION ALL
        SELECT ref_doc, 2 AS n,
               unnest(list_transform(range(1, len(rt)), i -> rt[i] || ' ' || rt[i + 1])) AS gram
        FROM pairs
      ) GROUP BY ref_doc, n, gram
    ),
    prec AS (
      SELECT cg.ref_doc,
             sum(CASE WHEN cg.n = 1 THEN least(cg.c, coalesce(rg.r, 0)) ELSE 0 END) AS clip1,
             sum(CASE WHEN cg.n = 1 THEN cg.c ELSE 0 END) AS tot1,
             sum(CASE WHEN cg.n = 2 THEN least(cg.c, coalesce(rg.r, 0)) ELSE 0 END) AS clip2,
             sum(CASE WHEN cg.n = 2 THEN cg.c ELSE 0 END) AS tot2
      FROM cg LEFT JOIN rg ON rg.ref_doc = cg.ref_doc AND rg.n = cg.n AND rg.gram = cg.gram
      GROUP BY cg.ref_doc
    )
    SELECT p.ref_doc, p.cand_doc, p.lang,
           CAST(len(p.ct) AS BIGINT) AS cand_len,
           CAST(len(p.rt) AS BIGINT) AS ref_len,
           round(pr.clip1 * 1.0 / pr.tot1, 6) AS p1,
           round(pr.clip2 * 1.0 / pr.tot2, 6) AS p2,
           round(CASE WHEN len(p.ct) > len(p.rt) THEN 1.0
                      ELSE exp(1.0 - len(p.rt) * 1.0 / len(p.ct)) END, 6) AS brevity_penalty,
           CASE WHEN pr.clip1 > 0 AND pr.clip2 > 0 THEN
             round(CASE WHEN len(p.ct) > len(p.rt) THEN 1.0
                        ELSE exp(1.0 - len(p.rt) * 1.0 / len(p.ct)) END
                   * exp(0.5 * (ln(pr.clip1 * 1.0 / pr.tot1) + ln(pr.clip2 * 1.0 / pr.tot2))), 6)
           ELSE 0.0 END AS bleu2
    FROM pairs p JOIN prec pr USING (ref_doc)
    """,
    tags=("ml", "eval", "text", "llm"),
)
def bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 between adjacent same-language document pairs (even doc_id =
    reference, odd successor = candidate): clipped unigram/bigram
    precision, brevity penalty, and the geometric-mean BLEU-2 score — the
    standard machine-translation/generation quality metric, exercised
    here as a corpus-similarity measure (the word-salad corpus makes
    within-language unigram overlap high while bigram overlap stays low,
    which is exactly the degenerate-repetition signature BLEU's higher
    orders exist to catch).

    Scale: gram counts are per-document aggregates off the token explode
    (linear corpus pass); the clip join keys on (pair, n, gram) — an
    equi-join whose group sizes are per-document gram counts, never
    cross-document. All precisions are ratios of exact integers; the only
    transcendentals (exp/ln in BP and the geometric mean) are one closed
    form per pair, rounded at 6.
    """
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id").alias("ref_doc"), "lang", F.split("text", " ").alias("rt")
    ).filter(F.col("ref_doc") % 2 == 0)
    b = docs.select(
        F.col("doc_id").alias("cand_doc"),
        F.col("lang").alias("lang_b"),
        F.split("text", " ").alias("ct"),
    )
    pairs = a.join(
        b, (F.col("cand_doc") == F.col("ref_doc") + 1) & (F.col("lang") == F.col("lang_b"))
    ).select("ref_doc", "cand_doc", "lang", "rt", "ct")

    def grams(df: DataFrame, col: str) -> DataFrame:
        uni = df.select("ref_doc", F.lit(1).alias("n"), F.explode(col).alias("gram"))
        bi = df.select(
            "ref_doc",
            F.lit(2).alias("n"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size({col}) - 1),"
                    f" i -> concat(element_at({col}, i), ' ', element_at({col}, i + 1)))"
                )
            ).alias("gram"),
        )
        return uni.unionByName(bi)

    cg = grams(pairs, "ct").groupBy("ref_doc", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    rg = grams(pairs, "rt").groupBy("ref_doc", "n", "gram").agg(F.count(F.lit(1)).alias("r"))
    prec = (
        cg.join(rg, ["ref_doc", "n", "gram"], "left")
        .groupBy("ref_doc")
        .agg(
            F.sum(F.when(F.col("n") == 1, F.least(F.col("c"), F.coalesce(F.col("r"), F.lit(0)))).otherwise(0)).alias("clip1"),
            F.sum(F.when(F.col("n") == 1, F.col("c")).otherwise(0)).alias("tot1"),
            F.sum(F.when(F.col("n") == 2, F.least(F.col("c"), F.coalesce(F.col("r"), F.lit(0)))).otherwise(0)).alias("clip2"),
            F.sum(F.when(F.col("n") == 2, F.col("c")).otherwise(0)).alias("tot2"),
        )
    )
    j = pairs.join(prec, "ref_doc")
    clen, rlen = F.size("ct"), F.size("rt")
    bp = F.when(clen > rlen, F.lit(1.0)).otherwise(F.exp(1.0 - rlen * 1.0 / clen))
    p1 = F.col("clip1") * 1.0 / F.col("tot1")
    p2 = F.col("clip2") * 1.0 / F.col("tot2")
    return j.select(
        "ref_doc",
        "cand_doc",
        "lang",
        clen.cast("long").alias("cand_len"),
        rlen.cast("long").alias("ref_len"),
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(bp, 6).alias("brevity_penalty"),
        F.when(
            (F.col("clip1") > 0) & (F.col("clip2") > 0),
            F.round(bp * F.exp(0.5 * (F.log(p1) + F.log(p2))), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("bleu2"),
    )


# ---------------------------------------------------------------------------
# q_mann_kendall
# ---------------------------------------------------------------------------

MK_Z95 = 1.959964  # two-sided 5% normal critical value


@query(
    "q_mann_kendall",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             round(sum(CAST(round((o_totalprice) * 100) AS BIGINT))
                   / 100e0 / 1000000.0, 6) AS z
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    ),
    s AS (
      SELECT sum(CASE WHEN b.z > a.z THEN 1 WHEN b.z < a.z THEN -1 ELSE 0 END) AS s,
             count(*) AS n_pairs
      FROM m a JOIN m b ON b.month > a.month
    ),
    ties AS (
      SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
      FROM (SELECT count(*) AS t FROM m GROUP BY z HAVING count(*) > 1)
    ),
    nn AS (SELECT count(*) AS n FROM m),
    stat AS (
      SELECT nn.n, s.s,
             (nn.n * (nn.n - 1.0) * (2 * nn.n + 5) - ties.tie_term) / 18.0 AS var_s
      FROM s CROSS JOIN ties CROSS JOIN nn
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(s AS BIGINT) AS s,
           round(var_s, 6) AS var_s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                      WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z_stat,
           CASE WHEN s > 0 AND (s - 1) / sqrt(var_s) > 1.959964 THEN 'increasing'
                WHEN s < 0 AND (s + 1) / sqrt(var_s) < -1.959964 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM stat
    """,
    tags=("stats", "timeseries"),
)
def mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on monthly revenue: S =
    sum over month pairs of sign(z_j - z_i), tie-corrected variance
    n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18, and the continuity-corrected
    Z statistic with the 5% two-sided trend verdict — the
    distribution-free companion to the parametric slope fits
    (q_theil_sen supplies the matching slope estimator; this supplies
    the significance call that needs no normality assumption).

    Scale: the corpus reduces to O(calendar) monthly rows in one
    aggregate; the pair join is O(months^2) ~ 3k rows — calendar-bounded,
    corpus-independent. S and the tie groups are exact integers (the
    observations are 6-dp-rounded doubles compared for order/equality
    only), so the statistic is one closed form of integers rounded at 6.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100e0 / 1000000.0, 6).alias("z")
    )
    a = m.select(F.col("month").alias("ma"), F.col("z").alias("za"))
    b = m.select(F.col("month").alias("mb"), F.col("z").alias("zb"))
    s = (
        a.join(b, F.col("mb") > F.col("ma"))
        .agg(
            F.sum(
                F.when(F.col("zb") > F.col("za"), 1)
                .when(F.col("zb") < F.col("za"), -1)
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    ties = (
        m.groupBy("z")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            ).alias("tie_term")
        )
    )
    nn = m.agg(F.count(F.lit(1)).alias("n"))
    stat = s.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(nn)).select(
        F.col("n"),
        F.col("s"),
        (
            (F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5) - F.col("tie_term"))
            / 18.0
        ).alias("var_s"),
    )
    zc = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return stat.select(
        F.col("n").cast("long").alias("n_months"),
        F.col("s").cast("long").alias("s"),
        F.round(F.col("var_s"), 6).alias("var_s"),
        F.round(zc, 6).alias("z_stat"),
        F.when((F.col("s") > 0) & (zc > MK_Z95), F.lit("increasing"))
        .when((F.col("s") < 0) & (zc < -MK_Z95), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# q_adaboost_round
# ---------------------------------------------------------------------------


def _ada_sql() -> str:
    """Two AdaBoost rounds over the bucketed stump space, as one SQL text
    both engines run verbatim (every quantity is a closed form of the
    O(buckets) integer counts, so there is nothing engine-specific to
    drift)."""
    B = STUMP_MAX_T
    return f"""
    WITH b AS (
      SELECT CAST(least(floor(o_totalprice / {STUMP_STEP}), {B}) AS BIGINT) AS bkt,
             sum(CASE WHEN {_POS_SQL} THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN {_POS_SQL} THEN 0 ELSE 1 END) AS neg
      FROM orders GROUP BY 1
    ),
    thr AS (SELECT t FROM range({STUMP_MIN_T}, {B} + 1) AS r(t)),
    -- round 1: uniform weights; stump = argmin unnormalized weighted error.
    -- each side predicts its weighted-majority class (tie -> -1).
    s1 AS (
      SELECT t.t,
             sum(CASE WHEN b.bkt < t.t THEN b.pos ELSE 0 END) AS pl,
             sum(CASE WHEN b.bkt < t.t THEN b.neg ELSE 0 END) AS nl,
             sum(CASE WHEN b.bkt >= t.t THEN b.pos ELSE 0 END) AS pr,
             sum(CASE WHEN b.bkt >= t.t THEN b.neg ELSE 0 END) AS nr
      FROM thr t LEFT JOIN b ON true GROUP BY t.t
    ),
    e1 AS (
      SELECT t, pl, nl, pr, nr,
             (CASE WHEN pl > nl THEN nl ELSE pl END
              + CASE WHEN pr > nr THEN nr ELSE pr END) * CAST(1.0 AS DOUBLE)
               / (pl + nl + pr + nr) AS err
      FROM s1 WHERE pl + nl > 0 AND pr + nr > 0
    ),
    best1 AS (SELECT * FROM e1 ORDER BY round(err, 9) ASC, t ASC LIMIT 1),
    a1 AS (
      SELECT t AS t1,
             CASE WHEN pl > nl THEN 1 ELSE -1 END AS hl1,
             CASE WHEN pr > nr THEN 1 ELSE -1 END AS hr1,
             round(err, 12) AS err1,
             round(0.5 * ln((1.0 - round(err, 12)) / round(err, 12)), 12) AS alpha1
      FROM best1
    ),
    -- per-(bucket, label) weights after round 1: exp(-+alpha1)
    wb AS (
      SELECT b.bkt, a1.t1, a1.hl1, a1.hr1, a1.err1, a1.alpha1,
             b.pos * exp(-a1.alpha1 * (CASE WHEN b.bkt < a1.t1 THEN a1.hl1 ELSE a1.hr1 END))
               AS wpos,
             b.neg * exp( a1.alpha1 * (CASE WHEN b.bkt < a1.t1 THEN a1.hl1 ELSE a1.hr1 END))
               AS wneg,
             b.pos, b.neg
      FROM b CROSS JOIN a1
    ),
    s2 AS (
      SELECT t.t,
             sum(CASE WHEN w.bkt < t.t THEN w.wpos ELSE 0 END) AS pl,
             sum(CASE WHEN w.bkt < t.t THEN w.wneg ELSE 0 END) AS nl,
             sum(CASE WHEN w.bkt >= t.t THEN w.wpos ELSE 0 END) AS pr,
             sum(CASE WHEN w.bkt >= t.t THEN w.wneg ELSE 0 END) AS nr
      FROM thr t LEFT JOIN wb w ON true GROUP BY t.t
    ),
    e2 AS (
      SELECT t, pl, nl, pr, nr,
             (CASE WHEN pl > nl THEN nl ELSE pl END
              + CASE WHEN pr > nr THEN nr ELSE pr END) / (pl + nl + pr + nr) AS err
      FROM s2 WHERE pl + nl > 0 AND pr + nr > 0
    ),
    best2 AS (SELECT * FROM e2 ORDER BY round(err, 9) ASC, t ASC LIMIT 1),
    a2 AS (
      SELECT t AS t2,
             CASE WHEN pl > nl THEN 1 ELSE -1 END AS hl2,
             CASE WHEN pr > nr THEN 1 ELSE -1 END AS hr2,
             round(err, 12) AS err2,
             round(0.5 * ln((1.0 - round(err, 12)) / round(err, 12)), 12) AS alpha2
      FROM best2
    ),
    -- ensemble sign(alpha1 h1 + alpha2 h2) scored on the bucket counts
    acc AS (
      SELECT sum(CASE WHEN (a1.alpha1 * (CASE WHEN b.bkt < a1.t1 THEN a1.hl1 ELSE a1.hr1 END)
                          + a2.alpha2 * (CASE WHEN b.bkt < a2.t2 THEN a2.hl2 ELSE a2.hr2 END))
                          > 0 THEN b.pos ELSE b.neg END) AS n_correct,
             sum(b.pos + b.neg) AS n
      FROM b CROSS JOIN a1 CROSS JOIN a2
    )
    SELECT CAST(a1.t1 * {STUMP_STEP} AS DOUBLE) AS threshold_1,
           CAST(a1.hl1 AS INT) AS left_pred_1,
           round(a1.err1, 6) AS err_1,
           round(a1.alpha1, 6) AS alpha_1,
           CAST(a2.t2 * {STUMP_STEP} AS DOUBLE) AS threshold_2,
           CAST(a2.hl2 AS INT) AS left_pred_2,
           round(a2.err2, 6) AS err_2,
           round(a2.alpha2, 6) AS alpha_2,
           round(acc.n_correct * CAST(1.0 AS DOUBLE) / acc.n, 6) AS ensemble_train_acc
    FROM a1 CROSS JOIN a2 CROSS JOIN acc
    """


@query("q_adaboost_round", oracle=_ada_sql(), tags=("ml", "model", "iterative"))
def adaboost_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of AdaBoost over the bucketed decision-stump space:
    round 1 picks the minimum-error stump under uniform weights, computes
    alpha = 0.5 ln((1-err)/err), reweights every example by
    exp(-+alpha x h1(x)y) — which collapses to ONE closed-form weight per
    (bucket, label) cell, the trick that makes boosting distributable —
    then round 2 picks the minimum weighted-error stump and the ensemble
    sign(alpha1 h1 + alpha2 h2) is scored exactly on the same cells.
    This is the actual boosting inner loop (weights never materialize
    per-row; histogram cells carry them), verified end to end.

    ONE SQL text runs verbatim on both engines: after the single
    map-side-combinable bucket aggregate, every relation is O(buckets) or
    O(thresholds) and every decision ranks on round(err, 9) with the
    threshold as tie-break. Scale: identical posture to q_decision_stump
    — the corpus pass is one aggregate; rounds add O(grid x buckets)
    arithmetic, not scans."""
    from bigdatainfinance1_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ada_sql())


# ---------------------------------------------------------------------------
# q_ridge_path
# ---------------------------------------------------------------------------

RIDGE_LAMBDAS = (0.0, 0.1, 1.0, 10.0)


@query(
    "q_ridge_path",
    oracle=f"""
    WITH f AS (
      SELECT (year(o_orderdate) - 1998) * 12.0 / 42.0
               + (month(o_orderdate) - 1) / 42.0 AS x1,
             (CAST(substr(o_orderpriority, 1, 1) AS INT) - 3.0) / 2.0 AS x2,
             o_totalprice / 500000.0 AS y
      FROM orders
    ),
    mo AS (
      SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
             sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
      FROM f
    ),
    c AS (
      SELECT n,
             s11 - s1 * s1 / n AS c11, s12 - s1 * s2 / n AS c12,
             s22 - s2 * s2 / n AS c22,
             s1y - s1 * sy / n AS c1y, s2y - s2 * sy / n AS c2y,
             syy - sy * sy / n AS cyy,
             s1 / n AS m1, s2 / n AS m2, sy / n AS my
      FROM mo
    ),
    grid AS (SELECT unnest([{', '.join(f'CAST({v} AS DOUBLE)' for v in RIDGE_LAMBDAS)}]) AS lam)
    SELECT round(lam, 1) AS lambda,
           round(((c22 + lam) * c1y - c12 * c2y)
                 / ((c11 + lam) * (c22 + lam) - c12 * c12), 6) AS beta_trend,
           round(((c11 + lam) * c2y - c12 * c1y)
                 / ((c11 + lam) * (c22 + lam) - c12 * c12), 6) AS beta_priority,
           round(my - ((c22 + lam) * c1y - c12 * c2y)
                      / ((c11 + lam) * (c22 + lam) - c12 * c12) * m1
                    - ((c11 + lam) * c2y - c12 * c1y)
                      / ((c11 + lam) * (c22 + lam) - c12 * c12) * m2, 6) AS intercept,
           CAST(n AS BIGINT) AS n_rows
    FROM grid CROSS JOIN c
    """,
    tags=("ml", "model"),
)
def ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression path: order value (rescaled to O(1))
    on a centered time-trend feature and the priority digit, solving the
    2x2 regularized normal equations (C + lambda I) beta = c_xy
    explicitly at four lambda values — the regularization-path companion
    to q_ols_two_factor (lambda = 0 reproduces OLS; the betas visibly
    shrink toward 0 as lambda grows, the coefficient-stability story a
    modeling pipeline audits).

    Scale: ONE map-side-combinable moment aggregate over the scan; the
    solve is per-lambda closed-form arithmetic on the 1-row moment
    relation (the 4-row lambda grid rides a broadcast cross join).
    Determinism: features are rescaled to O(1) before the moment sums so
    the order-ambiguous sums carry ~1e-12 ulp noise against 6-dp
    rounding; both engines apply the identical centered-moment algebra.
    """
    orders = load_table(spark, sf_dir, "orders")
    f = orders.select(
        (
            (F.year("o_orderdate") - 1998) * 12.0 / 42.0
            + (F.month("o_orderdate") - 1) / 42.0
        ).alias("x1"),
        ((F.substring("o_orderpriority", 1, 1).cast("int") - 3.0) / 2.0).alias("x2"),
        (F.col("o_totalprice") / 500000.0).alias("y"),
    )
    mo = f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    c = mo.select(
        F.col("n"),
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
        (F.col("s1") / n).alias("m1"),
        (F.col("s2") / n).alias("m2"),
        (F.col("sy") / n).alias("my"),
    )
    grid = spark.createDataFrame([(v,) for v in RIDGE_LAMBDAS], "lam double")
    det = (F.col("c11") + F.col("lam")) * (F.col("c22") + F.col("lam")) - F.col("c12") * F.col("c12")
    b1 = ((F.col("c22") + F.col("lam")) * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = ((F.col("c11") + F.col("lam")) * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    return grid.crossJoin(F.broadcast(c)).select(
        F.round(F.col("lam"), 1).alias("lambda"),
        F.round(b1, 6).alias("beta_trend"),
        F.round(b2, 6).alias("beta_priority"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 6).alias("intercept"),
        F.col("n").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q_cohens_kappa
# ---------------------------------------------------------------------------

KAPPA_VALUE_CUT = 225000.0  # rater B: "urgent" if order value >= this


@query(
    "q_cohens_kappa",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS a,
             CASE WHEN o_totalprice >= {KAPPA_VALUE_CUT} THEN 1 ELSE 0 END AS b
      FROM orders
    ),
    c AS (
      SELECT count(*) AS n,
             sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
             sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
             sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
             sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS both_urgent,
           CAST(n00 AS BIGINT) AS both_normal,
           round((n11 + n00) * 1.0 / n, 6) AS observed_agreement,
           round(((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                 + ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n), 6)
             AS chance_agreement,
           round(((n11 + n00) * 1.0 / n
                  - (((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                     + ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n)))
                 / (1.0 - (((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                           + ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n))), 6)
             AS cohens_kappa
    FROM c
    """,
    tags=("ml", "eval", "stats"),
)
def cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two "annotators" labeling orders urgent —
    rater A reads the priority field, rater B thresholds order value at
    {cut} — chance-corrected agreement (po - pe)/(1 - pe), the
    inter-annotator metric every labeling pipeline reports before
    trusting its gold data (raw agreement is inflated whenever one class
    dominates; kappa ~ 0 here exposes that the raters share a base rate
    but no signal — exactly the trap). One 2x2 integer contingency
    aggregate and closed forms, rounded at 6; one map-side-combinable
    pass at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    r = orders.select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("a"),
        F.when(F.col("o_totalprice") >= KAPPA_VALUE_CUT, 1).otherwise(0).alias("b"),
    )
    c = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)).alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0)).alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0)).alias("n01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0)).alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) * 1.0 / n
    pe = ((F.col("n11") + F.col("n10")) * 1.0 / n) * ((F.col("n11") + F.col("n01")) * 1.0 / n) + (
        (F.col("n01") + F.col("n00")) * 1.0 / n
    ) * ((F.col("n10") + F.col("n00")) * 1.0 / n)
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.col("n11").cast("long").alias("both_urgent"),
        F.col("n00").cast("long").alias("both_normal"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("chance_agreement"),
        F.round((po - pe) / (1.0 - pe), 6).alias("cohens_kappa"),
    )


# ---------------------------------------------------------------------------
# q_linear_shap — exact SHAP attribution for the ridge model
# ---------------------------------------------------------------------------

SHAP_LAMBDA = 1.0  # which point of the q_ridge_path to explain


@query(
    "q_linear_shap",
    oracle=f"""
    WITH f AS (
      SELECT (year(o_orderdate) - 1998) * 12.0 / 42.0
               + (month(o_orderdate) - 1) / 42.0 AS x1,
             (CAST(substr(o_orderpriority, 1, 1) AS INT) - 3.0) / 2.0 AS x2,
             o_totalprice / 500000.0 AS y
      FROM orders
    ),
    mo AS (
      SELECT count(*) AS n,
             CAST(sum(CAST(round(x1 * 42) AS BIGINT)) AS DOUBLE) / 42 AS s1,
             CAST(sum(CAST(round(x2 * 2) AS BIGINT)) AS DOUBLE) / 2 AS s2,
             CAST(sum(CAST(round(y * 5e7) AS BIGINT)) AS DOUBLE) / 5e7 AS sy,
             CAST(sum(CAST(round(x1 * 42) AS HUGEINT)
                      * CAST(round(x1 * 42) AS BIGINT)) AS DOUBLE) / 1764 AS s11,
             CAST(sum(CAST(round(x1 * 42) AS HUGEINT)
                      * CAST(round(x2 * 2) AS BIGINT)) AS DOUBLE) / 84 AS s12,
             CAST(sum(CAST(round(x2 * 2) AS HUGEINT)
                      * CAST(round(x2 * 2) AS BIGINT)) AS DOUBLE) / 4 AS s22,
             CAST(sum(CAST(round(x1 * 42) AS HUGEINT)
                      * CAST(round(y * 5e7) AS BIGINT)) AS DOUBLE) / 42 / 5e7 AS s1y,
             CAST(sum(CAST(round(x2 * 2) AS HUGEINT)
                      * CAST(round(y * 5e7) AS BIGINT)) AS DOUBLE) / 2 / 5e7 AS s2y
      FROM f
    ),
    c AS (
      SELECT n,
             s11 - s1 * s1 / n AS c11, s12 - s1 * s2 / n AS c12,
             s22 - s2 * s2 / n AS c22,
             s1y - s1 * sy / n AS c1y, s2y - s2 * sy / n AS c2y,
             s1 / n AS m1, s2 / n AS m2
      FROM mo
    ),
    beta AS (
      SELECT n, m1, m2,
             ((c22 + {SHAP_LAMBDA}) * c1y - c12 * c2y)
               / ((c11 + {SHAP_LAMBDA}) * (c22 + {SHAP_LAMBDA}) - c12 * c12) AS b1,
             ((c11 + {SHAP_LAMBDA}) * c2y - c12 * c1y)
               / ((c11 + {SHAP_LAMBDA}) * (c22 + {SHAP_LAMBDA}) - c12 * c12) AS b2
      FROM c
    ),
    shap AS (
      SELECT 'trend' AS feature,
             round(CAST(sum(CAST(round(abs(beta.b1 * (f.x1 - beta.m1)) * 1e12)
                                 AS HUGEINT)) AS DOUBLE) / count(*) / 1e12, 6)
               AS mean_abs_shap,
             round(beta.b1, 6) AS beta
      FROM f CROSS JOIN beta GROUP BY beta.b1
      UNION ALL
      SELECT 'priority' AS feature,
             round(CAST(sum(CAST(round(abs(beta.b2 * (f.x2 - beta.m2)) * 1e12)
                                 AS HUGEINT)) AS DOUBLE) / count(*) / 1e12, 6)
               AS mean_abs_shap,
             round(beta.b2, 6) AS beta
      FROM f CROSS JOIN beta GROUP BY beta.b2
    )
    SELECT feature, beta, mean_abs_shap,
           round(mean_abs_shap / sum(mean_abs_shap) OVER (), 6) AS importance_share
    FROM shap
    """,
    tags=("ml", "xai"),
)
def linear_shap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SHAP global feature importance for the q_ridge_path model at
    lambda = {lam}: for a linear model the Shapley value of feature j on
    row i is EXACTLY beta_j (x_ij - mean_j) (no sampling, no surrogate),
    so mean |SHAP| per feature — the bar chart every model card shows —
    is one closed-form pass: fit the betas from the moment aggregate,
    then average the absolute centered contributions. The explainability
    (XAI) surface, computed with zero approximation because linearity
    makes Shapley tractable (contrast q_shapley_attribution's exact
    16-coalition enumeration where it isn't).

    Scale: two map-side-combinable passes over the scan (moments, then
    |beta (x - mean)| with the 1-row beta relation broadcast) — no
    per-row model state. Determinism: same centered-moment algebra as
    q_ridge_path; the second pass averages O(1)-magnitude values,
    rounded at 6."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.select(
        (
            (F.year("o_orderdate") - 1998) * 12.0 / 42.0
            + (F.month("o_orderdate") - 1) / 42.0
        ).alias("x1"),
        ((F.substring("o_orderpriority", 1, 1).cast("int") - 3.0) / 2.0).alias("x2"),
        (F.col("o_totalprice") / 500000.0).alias("y"),
    )
    # integer-moments rule: x1 is a multiple of 1/42, x2 of 1/2, y of
    # 1/5e7 (exact cents) — all moments sum exact integers
    a1 = F.round(F.col("x1") * 42).cast("long")
    a2 = F.round(F.col("x2") * 2).cast("long")
    cy = F.round(F.col("y") * 5e7).cast("long")
    mo = f.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(a1).cast("double") / 42).alias("s1"),
        (F.sum(a2).cast("double") / 2).alias("s2"),
        (F.sum(cy).cast("double") / 5e7).alias("sy"),
        (F.sum(a1.cast("decimal(19,0)") * a1).cast("double") / 1764).alias("s11"),
        (F.sum(a1.cast("decimal(19,0)") * a2).cast("double") / 84).alias("s12"),
        (F.sum(a2.cast("decimal(19,0)") * a2).cast("double") / 4).alias("s22"),
        (F.sum(a1.cast("decimal(19,0)") * cy).cast("double") / 42 / 5e7).alias("s1y"),
        (F.sum(a2.cast("decimal(19,0)") * cy).cast("double") / 2 / 5e7).alias("s2y"),
    )
    n = F.col("n").cast("double")
    c = mo.select(
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
        (F.col("s1") / n).alias("m1"),
        (F.col("s2") / n).alias("m2"),
    )
    det = (F.col("c11") + SHAP_LAMBDA) * (F.col("c22") + SHAP_LAMBDA) - F.col("c12") * F.col("c12")
    beta = c.select(
        "m1",
        "m2",
        (((F.col("c22") + SHAP_LAMBDA) * F.col("c1y") - F.col("c12") * F.col("c2y")) / det).alias("b1"),
        (((F.col("c11") + SHAP_LAMBDA) * F.col("c2y") - F.col("c12") * F.col("c1y")) / det).alias("b2"),
    )
    j = f.crossJoin(F.broadcast(beta))
    def _shap_mean(term):
        return F.round(
            F.sum(F.round(F.abs(term) * 1e12).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 1e12,
            6,
        )

    s1 = j.groupBy("b1").agg(
        _shap_mean(F.col("b1") * (F.col("x1") - F.col("m1"))).alias("mean_abs_shap")
    ).select(F.lit("trend").alias("feature"), F.round(F.col("b1"), 6).alias("beta"), "mean_abs_shap")
    s2 = j.groupBy("b2").agg(
        _shap_mean(F.col("b2") * (F.col("x2") - F.col("m2"))).alias("mean_abs_shap")
    ).select(F.lit("priority").alias("feature"), F.round(F.col("b2"), 6).alias("beta"), "mean_abs_shap")
    from pyspark.sql import Window

    shap = s1.unionByName(s2)
    return shap.select(
        "feature",
        "beta",
        "mean_abs_shap",
        F.round(
            F.col("mean_abs_shap") / F.sum("mean_abs_shap").over(Window.partitionBy()), 6
        ).alias("importance_share"),
    )


# ---------------------------------------------------------------------------
# q_mcnemar_test — paired classifier comparison
# ---------------------------------------------------------------------------


@query(
    "q_mcnemar_test",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS truth,
             CASE WHEN o_totalprice >= {KAPPA_VALUE_CUT} THEN 1 ELSE 0 END AS pred_b,
             CASE WHEN o_totalprice >= 100000.0 THEN 1 ELSE 0 END AS pred_c
      FROM orders
    ),
    d AS (
      SELECT sum(CASE WHEN (pred_b = truth) AND (pred_c <> truth) THEN 1 ELSE 0 END) AS n10,
             sum(CASE WHEN (pred_b <> truth) AND (pred_c = truth) THEN 1 ELSE 0 END) AS n01,
             count(*) AS n
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n10 AS BIGINT) AS only_b_correct,
           CAST(n01 AS BIGINT) AS only_c_correct,
           round(pow(abs(n10 - n01) - 1.0, 2) / nullif(n10 + n01, 0), 6) AS mcnemar_chi2,
           pow(abs(n10 - n01) - 1.0, 2) / nullif(n10 + n01, 0) > 3.841459 AS reject_95
    FROM d
    """,
    tags=("ml", "eval", "stats"),
)
def mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) comparing two classifiers on
    the SAME examples — threshold-at-{cut} vs threshold-at-100k
    predicting urgent priority: only the DISCORDANT pairs (exactly one
    model right) carry information, chi2 = (|n10 - n01| - 1)^2 /
    (n10 + n01). This is the correct paired comparison two models on one
    test set demand — two independent accuracy CIs (q_wilson_interval)
    overlap or not tells you nothing when the errors are correlated.

    Scale: one map-side-combinable aggregate; exact integer counts,
    nullif-guarded for the zero-discordance degenerate case."""
    orders = load_table(spark, sf_dir, "orders")
    r = orders.select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("truth"),
        F.when(F.col("o_totalprice") >= KAPPA_VALUE_CUT, 1).otherwise(0).alias("pred_b"),
        F.when(F.col("o_totalprice") >= 100000.0, 1).otherwise(0).alias("pred_c"),
    )
    d = r.agg(
        F.sum(
            F.when((F.col("pred_b") == F.col("truth")) & (F.col("pred_c") != F.col("truth")), 1).otherwise(0)
        ).alias("n10"),
        F.sum(
            F.when((F.col("pred_b") != F.col("truth")) & (F.col("pred_c") == F.col("truth")), 1).otherwise(0)
        ).alias("n01"),
        F.count(F.lit(1)).alias("n"),
    )
    chi2 = F.pow(F.abs(F.col("n10") - F.col("n01")) - 1.0, F.lit(2)) / F.nullif(
        F.col("n10") + F.col("n01"), F.lit(0)
    )
    return d.select(
        F.col("n").cast("long").alias("n"),
        F.col("n10").cast("long").alias("only_b_correct"),
        F.col("n01").cast("long").alias("only_c_correct"),
        F.round(chi2, 6).alias("mcnemar_chi2"),
        (chi2 > 3.841459).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# q_pr_auc — average precision + trapezoidal ROC AUC on the threshold ladder
# ---------------------------------------------------------------------------


@query(
    "q_pr_auc",
    oracle=f"""
    WITH b AS (
      SELECT CAST(least(floor(o_totalprice / {ROC_BUCKET}), {ROC_MAX_BUCKET}) AS BIGINT) AS bkt,
             sum(CASE WHEN {_POS_SQL} THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN {_POS_SQL} THEN 0 ELSE 1 END) AS neg
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(pos) AS p, sum(neg) AS n FROM b),
    thr AS (SELECT unnest(range(0, {ROC_MAX_BUCKET} + 1)) AS t),
    pts AS (
      SELECT t.t,
             coalesce(sum(CASE WHEN b.bkt >= t.t THEN b.pos END), 0) AS tp,
             coalesce(sum(CASE WHEN b.bkt >= t.t THEN b.neg END), 0) AS fp
      FROM thr t LEFT JOIN b ON true
      GROUP BY t.t
    ),
    steps AS (
      SELECT a.t,
             (a.tp - coalesce(bb.tp, 0)) * 1.0 / tot.p AS dr,
             a.tp * 1.0 / nullif(a.tp + a.fp, 0) AS prec,
             (a.fp - coalesce(bb.fp, 0)) * 1.0 / tot.n AS dfpr,
             (a.tp + coalesce(bb.tp, 0)) * 0.5 / tot.p AS mid_tpr
      FROM pts a
      LEFT JOIN pts bb ON bb.t = a.t + 1
      CROSS JOIN tot
    )
    SELECT round(sum(dr * coalesce(prec, 1.0)), 6) AS pr_auc,
           round(sum(dfpr * mid_tpr), 6) AS roc_auc_trap,
           CAST(max(tot.p) AS BIGINT) AS n_pos,
           CAST(max(tot.n) AS BIGINT) AS n_neg
    FROM steps CROSS JOIN tot
    """,
    tags=("ml", "eval"),
)
def pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-integral PR-AUC) and trapezoidal ROC AUC
    on q_roc_curve's fixed 21-point threshold ladder: walking thresholds
    from strict to lenient, AP = Σ ΔR·P and AUC = Σ ΔFPR·mean(TPR) —
    the single-number summaries of the curve that q_roc_curve emits
    point-by-point (and the PR view is the one that stays informative
    under the heavy class imbalance typical of quality-filter labels;
    q_auc_by_month gives the exact rank-based AUC, this the bucketed
    curve integral).

    Scale: identical posture to q_roc_curve — ONE map-side-combinable
    bucket aggregate off the fact scan, then suffix sums and a 21-term
    step integral on the bounded grid. Exact integers until the final
    ratios, rounded at 6."""
    orders = load_table(spark, sf_dir, "orders")
    is_pos = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    b = orders.groupBy(
        F.least(F.floor(F.col("o_totalprice") / ROC_BUCKET), F.lit(ROC_MAX_BUCKET))
        .cast("long")
        .alias("bkt")
    ).agg(
        F.sum(F.when(is_pos, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(is_pos, 0).otherwise(1)).alias("neg"),
    )
    tot = b.agg(F.sum("pos").alias("p"), F.sum("neg").alias("n"))
    thr = spark.range(0, ROC_MAX_BUCKET + 1).select(F.col("id").alias("t"))
    pts = (
        thr.join(F.broadcast(b), F.lit(True), "left")
        .groupBy("t")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bkt") >= F.col("t"), F.col("pos"))), F.lit(0)
            ).alias("tp"),
            F.coalesce(
                F.sum(F.when(F.col("bkt") >= F.col("t"), F.col("neg"))), F.lit(0)
            ).alias("fp"),
        )
    )
    nxt = pts.select(
        (F.col("t") - 1).alias("t"), F.col("tp").alias("ptp"), F.col("fp").alias("pfp")
    )
    steps = (
        pts.join(F.broadcast(nxt), "t", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("tp") - F.coalesce(F.col("ptp"), F.lit(0))) * 1.0 / F.col("p")
            ).alias("dr"),
            (
                F.col("tp") * 1.0 / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
            ).alias("prec"),
            (
                (F.col("fp") - F.coalesce(F.col("pfp"), F.lit(0))) * 1.0 / F.col("n")
            ).alias("dfpr"),
            (
                (F.col("tp") + F.coalesce(F.col("ptp"), F.lit(0))) * 0.5 / F.col("p")
            ).alias("mid_tpr"),
            "p",
            "n",
        )
    )
    return steps.agg(
        F.round(F.sum(F.col("dr") * F.coalesce(F.col("prec"), F.lit(1.0))), 6).alias(
            "pr_auc"
        ),
        F.round(F.sum(F.col("dfpr") * F.col("mid_tpr")), 6).alias("roc_auc_trap"),
        F.max("p").cast("long").alias("n_pos"),
        F.max("n").cast("long").alias("n_neg"),
    )
