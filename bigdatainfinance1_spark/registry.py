"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a named query with an
optional DuckDB oracle SQL. ``__spark_entry__.py`` exposes this registry to
the driver verbatim; tests iterate it to hash-check Spark vs DuckDB locally
before the driver does.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver's weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query.

    ``oracle`` is the equivalent DuckDB SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events documents
    embeddings). Column names/aliases MUST match the Spark output exactly —
    the driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


# The driver's per-round correctness run caps at the FIRST 50 entries of
# ``queries()`` in dict order. Rounds 1-3 drove 136 distinct queries green
# (r1∪r2∪r3 disjoint); this round-4 window rotates to 50 more
# NEVER-driver-checked names, following VERDICT.md round 3 "Next round"
# task 1: the flagships that run the production scale paths
# (q_minhash_lsh_fast — the xxhash64 dedup path, q_semdedup,
# q_knn_label_eval, q_stream_minhash_dedup), the paper-backed curation
# layer (DSIR, Gopher, CCNet, exact-substring spans, SoftDeDup), the
# auditable end-to-end composite q_dedup_funnel (verdict task 8 —
# q_curation_pipeline already has its r1 driver row), 3 TPC-H picks,
# and at least one representative per remaining analytics wave. All 50
# carry full DuckDB value-hash oracles. Everything not listed follows in
# registration order, so the r1/r2/r3 windows remain reproducible from
# git history.
DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    # Verdict-named flagships: production dedup / semantic / ANN paths
    "q_minhash_lsh_fast",         # xxhash64 banded LSH — THE production dedup path
    "q_semdedup",                 # semantic dedup (k now corpus-derived, task 4)
    "q_knn_label_eval",           # exact LOO 5-NN on block matmul
    "q_stream_minhash_dedup",     # in-stream signatures vs broadcast static index
    "q_tfidf_cosine_pairs",       # round-3 weak marks fixed this round (tasks 2+3)
    "q_lsh_band_sweep",           # band/recall trade-off audit
    "q_ann_ivf_topk",             # IVF scale path, full unrolled-Lloyd oracle
    "q_embedding_quantize",       # int8 quantization recall
    "q_matryoshka_recall",        # prefix-dim recall curve
    "q_embedding_outliers",       # centroid-distance outlier tier
    # Paper-backed curation layer + composites (verdict tasks 1+8)
    "q_dedup_funnel",             # end-to-end dedup census composite
    "q_dsir_select",              # importance resampling selection
    "q_substring_dup_spans",      # exact-substring duplicate spans
    "q_softdedup_weights",        # soft dedup loss weights
    "q_gopher_rules",             # Gopher quality rule gates
    "q_ccnet_ppl_buckets",        # CCNet perplexity buckets
    "q_pii_redaction",            # PII scrub pass
    "q_token_stats",              # L4 token accounting
    "q_doc_fingerprint",          # rolling-hash fingerprints
    "q_zipf_terms",               # corpus Zipf fit
    # TPC-H picks (verdict: 3-4 of the 14)
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q18",
    # Heavy/bench tail + money correctness
    "q_poisson_bootstrap",
    "q_decimal_money",
    # Sampling wave (full-oracle tiers)
    "q_stratified_sample",
    "q_pps_sample",
    # Stats / experimentation wave
    "q_cuped_adjustment",
    "q_diff_in_diff",
    "q_srm_check",
    "q_ks_test",
    "q_benford",
    "q_kaplan_meier",
    # Finance / time-series wave (incl. task-6 scale stragglers)
    "q_portfolio_cov",
    "q_rsi_daily",
    "q_holt_smoothing",
    "q_croston_forecast",
    "q_lorenz_curve",
    # Governance / data-quality wave
    "q_scd2_intervals",
    "q_dq_checks",
    "q_k_anonymity",
    "q_duplicate_payments",
    # IO / format wave
    "q_csv_malformed",
    # Join strategies wave
    "q_salted_join",
    # Spark-4 SQL surface
    "q_group_by_all",
    # Product-analytics wave
    "q_dau_wau",
    "q_markov_transitions",
    # ML feature wave
    "q_woe_iv",
    # Streaming wave 3
    "q_stream_file_sink",
    "q_stream_window_topk",
)


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module so their @query decorators run.

    Returns the registry re-ordered so the driver's 50-entry correctness
    window (taken from the head of this dict) spans every SURVEY §2 family.
    """
    import bigdatainfinance1_spark.operators  # noqa: F401
    import bigdatainfinance1_spark.streaming  # noqa: F401

    head = {n: QUERIES[n] for n in DRIVER_WINDOW_ORDER if n in QUERIES}
    tail = {n: s for n, s in QUERIES.items() if n not in head}
    return {**head, **tail}
