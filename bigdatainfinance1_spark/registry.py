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
# ``queries()`` in dict order. Rounds 1-5 drove 236 distinct queries
# (windows mutually disjoint, 229 green). This round-6 window follows
# VERDICT.md round 5 "Next round" tasks 1 and 3: it opens with the THREE
# re-green retries — q_weighted_reservoir_es (the project's first red
# driver row, r5 hash-only flake; emission hardened to rank +
# integer-cents this round) and the two stale r1 `err` rows
# q_kmeans_embeddings / q_media_features (fixed in-round r1, locally
# green ever since, never re-driver-checked) — then 47 NEVER-checked
# names, heaviest/most distinctive first: the remaining eight TPC-H
# queries, the verdict's named heavies (dtw, knapsack, fellegi_sunter,
# garch_grid, kyle_lambda, doremi_weights, consistent_hash_rebalance),
# the iterative/linear-algebra wave (ALS, label propagation, LSA, PQ,
# k-center, random projection), and the scale_check-measured bench
# queries that still lacked rows. All 50 carry full DuckDB value-hash
# oracles; the tripwire test allows the 3 retries precisely because
# their LATEST driver row is non-green. Everything not listed follows in
# registration order, so the r1-r5 windows remain reproducible from git
# history.
DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    # Re-green retries (verdict tasks 1 + 3): latest driver row non-green
    "q_weighted_reservoir_es",    # r5 hash flake -> rank + integer-cents emission
    "q_kmeans_embeddings",        # r1 err, fixed same round, never re-checked
    "q_media_features",           # r1 err, fixed same round, never re-checked
    # Remaining TPC-H — closes the suite's driver coverage (q1-q22 all rowed)
    "q_tpch_q4",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q19",
    # Verdict-named heavies
    "q_dtw_distance",             # banded dynamic-time-warping pairs
    "q_knapsack",                 # DP over driver-bounded capacity grid
    "q_fellegi_sunter",           # EM-weighted record-linkage scores
    "q_garch_grid",               # volatility grid search
    "q_kyle_lambda",              # price-impact regression
    "q_doremi_weights",           # domain-reweighting iteration
    "q_consistent_hash_rebalance",
    "q_optimal_assignment",       # Hungarian-style LP rounding (stable-matching kin)
    # Iterative ML / linear algebra / embedding storage
    "q_als_factorization",
    "q_label_propagation",
    "q_lsa_power_iteration",
    "q_embedding_pq",             # product quantization codebooks
    "q_kcenter_coreset",
    "q_random_projection",
    # Pattern mining
    "q_frequent_itemsets",
    "q_sequential_patterns",
    # scale_check-measured bench queries still without rows
    "q_doc_chunking",
    "q_ohlc_multigrain",
    "q_ngram_novelty",
    "q_char_entropy",
    "q_global_shuffle",
    "q_concurrency_sweep",
    "q_rolling_distinct_users",
    "q_bigram_lm_perplexity",
    "q_quality_filter_sweep",
    "q_unimax_mixture",
    "q_media_dedup",
    "q_media_shard_manifest",
    "q_countmin_sketch",
    "q_stupid_backoff_score",
    "q_source_overlap",
    "q_sql_variables",
    "q_xml_roundtrip",
    "q_stream_last_per_key",
    # Governance / profiling
    "q_fd_discovery",
    "q_gdpr_erasure",
    # Portfolio / survival / information theory
    "q_cov_shrinkage",
    "q_weibull_fit",
    "q_mutual_information",
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
