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
# ``queries()`` in dict order. Rounds 1-4 drove 186 distinct queries green
# (windows mutually disjoint); this round-5 window rotates to 50 more
# NEVER-driver-checked names, following VERDICT.md round 4 "Next round"
# task 1: the heavy-tail bench queries that carry round 4's engineering
# weight (ann_nprobe_sweep, prefix_filter_join — budget-gated this round,
# winnowing, amortization, entity_resolution, recsys_list_metrics), the
# three graph queries whose hub mitigation landed this round
# (adamic_adar's deg cap, the degree-oriented triangle paths), the
# reserving pair whose oracle degenerate-case fix landed this round, the
# remaining THREE custom-connector queries (task 8 — q_python_datasource
# got its row in r1; the sink halves changed this round: attempt-id
# filenames + manifest readback), three more TPC-H picks, and one
# representative per remaining analytics wave. All 50 carry full DuckDB
# value-hash oracles and none has a prior CORRECTNESS row (tripwire test
# enforces both). Everything not listed follows in registration order,
# so the r1-r4 windows remain reproducible from git history.
DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    # Heavy-tail / bench flagships (round-4 engineering weight)
    "q_ann_nprobe_sweep",         # IVF nprobe/recall sweep, one trained index
    "q_prefix_filter_join",       # lossless PPJoin — candidate budget gate NEW this round
    "q_winnowing_fingerprint",    # MOSS window-min fingerprints
    "q_amortization_schedule",    # recursive-CTE loan schedule
    "q_entity_resolution",        # blocked fuzzy match -> CC -> golden records
    "q_grid_dbscan",              # grid-bucketed density clustering
    "q_recsys_list_metrics",      # item-CF top-20 partner pruning
    # Graph wave — hub mitigation implemented this round (verdict task 2)
    "q_adamic_adar",              # AA_DEG_CAP wedge bound, 21x -> 1.5x at 10x
    "q_kcore",                    # iterative peeling, localCheckpoint loop
    "q_clustering_coefficient",   # (degree,id)-oriented triangle path
    # Reserving pair — oracle degenerate-case fix this round (ADVICE)
    "q_chain_ladder",
    "q_bornhuetter_ferguson",
    # Quant pricing / filtering wave
    "q_black_scholes",
    "q_irr_bisection",
    "q_kalman_level",
    "q_implied_vol",
    # Eval / ranking / attribution wave
    "q_kneser_ney_perplexity",
    "q_bradley_terry",
    "q_pass_at_k",
    "q_shapley_attribution",
    "q_mmr_rerank",
    "q_rrf_fusion",
    "q_isotonic_calibration",
    # Governance / multimodal
    "q_dp_histogram",
    "q_audio_vad_windows",
    # Forecast / time-series mining
    "q_holt_winters",
    "q_matrix_profile",
    # Custom-connector matrix (verdict task 8; sink code changed this round)
    "q_python_datasink",
    "q_stream_python_sink",
    "q_stream_python_source",
    # TPC-H picks
    "q_tpch_q7",
    "q_tpch_q17",
    "q_tpch_q22",
    # Streaming wave
    "q_stream_session_funnel",
    "q_stream_stream_left_join",
    # Arrow / UDF surface
    "q_map_in_arrow",
    "q_cogroup_gap_stats",
    # Econometrics / factor models
    "q_granger_causality",
    "q_fama_macbeth",
    # Inference / survival
    "q_benjamini_hochberg",
    "q_nelson_aalen",
    # Iterative ML / linear algebra
    "q_logistic_irls",
    "q_pca_power_iteration",
    "q_textrank",
    # Sampling / product / temporal
    "q_weighted_reservoir_es",
    "q_markov_absorption",
    "q_scd2_pit_join",
    # Physical-layout / join-strategy wave
    "q_bucketed_join",
    "q_zone_map_prune",
    # Combinatorial optimization
    "q_stable_matching",
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
