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
# ``queries()`` in dict order. Rounds 1+2 drove 86 distinct queries green;
# this round-3 window rotates to 50 NEVER-driver-checked names (the round-2
# verdict's top evidence gap: 202 of 288 queries had zero driver rows).
# Priorities follow VERDICT.md round 2 "Next round" task 2: the flagships
# that earned a row (q_embedding_neardup's distributed rewrite, the ANN/CF/
# sketch/graph/recursive paths) plus at least one representative per
# analytics wave (dedup-census, sketches, ml-eval, product, finance, stats,
# graph, io-formats, Spark-4 SQL, streaming wave 2). All 50 carry full
# DuckDB value-hash oracles. Everything not listed follows in registration
# order, so the r1/r2 windows remain reproducible from git history.
DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    # Verdict-named flagships (round-2 rewrites and scale paths)
    "q_embedding_neardup",        # L2 embedding tier — distributed block matmul
    "q_ann_lsh_topk",             # L3 — bucketed sign-LSH with literal hyperplanes
    "q_user_cf_neighbors",        # most expensive query in the repo
    "q_hll_distinct",             # A4 portable full-oracle twin
    "q_recursive_reachability",   # WITH RECURSIVE (Spark 4)
    "q_galaxy_join",              # multi-fact star chain
    "q_fifo_allocation",          # cumulative-interval equi-join
    "q_stream_stream_join",       # ST6 stream-stream tier
    "q_cdc_apply",                # change-data-capture upsert semantics
    "q_bm25_topk",                # retrieval stack flagship
    # Heavy hitters promoted into bench.py this round + scale stragglers
    "q_triangle_count",
    "q_interval_overlap_bucketed",
    "q_fuzzy_match_names",
    "q_theil_sen",
    "q_kendall_tau",
    # Round-2 defect, fixed this round (wrong-era window made it vacuous)
    "q_power_user_curve",
    # Dedup census / curation wave
    "q_cross_source_dedup",
    "q_dup_rate_by_source",
    "q_containment_neardup",
    "q_lsh_recall_audit",
    "q_bpe_train",                # round-3 flagship: distributed BPE merge learning
    # Portable sketches
    "q_kmv_overlap",
    "q_hist_quantile_sketch",
    "q_bloom_semi_join",
    # ML-eval wave
    "q_confusion_matrix",
    "q_auc_by_month",
    "q_ndcg",
    "q_mrr",
    "q_calibration_bins",
    "q_psi_drift",
    # Product-analytics wave
    "q_cohort_retention",
    "q_growth_accounting",
    "q_stickiness",
    "q_funnel_steps",
    "q_session_paths",
    # Finance wave
    "q_vwap",
    "q_max_drawdown",
    "q_ohlc_bars",
    "q_var_cvar",
    "q_negative_sampling",        # the round-2 38x scale fix — earn its row
    # Statistics wave
    "q_welch_ttest",
    "q_spearman_corr",
    "q_weighted_median",
    # Graph wave
    "q_pagerank_copurchase",
    "q_bfs_hops",
    # IO / format wave
    "q_orc_roundtrip",
    "q_schema_evolution",
    # Spark-4 SQL surface
    "q_lateral_topn",
    "q_pipe_syntax",
    # Streaming wave 2 (file-replay ordering hardened this round)
    "q_stream_dedup_bounded",
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
