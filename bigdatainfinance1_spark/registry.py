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

# The FOUR queries registered without a DuckDB oracle — their cumulative
# driver CORRECTNESS rows read `err: no_oracle` forever BY DESIGN, not
# omission (round-6 verdict task 6: recorded here so no future round burns
# window slots or judge time re-deriving it). Each result is inherently
# engine-specific, the docstring says so, and a FULL value-hash oracle twin
# covers the same operator family with a deterministic formulation:
#   q_approx_distinct    — HLL++ sketch estimates differ per engine build;
#                          twin q_hll_distinct (portable md5-register HLL,
#                          green driver row r3).
#   q_approx_percentile  — t-digest/KLL estimates differ per engine;
#                          twin q_percentiles (exact interpolation, r2).
#   q_sample_profile     — engine-RNG Bernoulli sample; deterministic twins
#                          q_weighted_reservoir_es (integer priority
#                          sampling) and q_pps_sample (systematic PPS).
#   q_stream_watermarked — watermark progression is engine-internal; twin
#                          q_watermark_design (closed-form late-data census,
#                          pytest-green full oracle).
ROWS_ONLY_BY_DESIGN: dict[str, str] = {
    "q_approx_distinct": "q_hll_distinct",
    "q_approx_percentile": "q_percentiles",
    "q_sample_profile": "q_weighted_reservoir_es",
    "q_stream_watermarked": "q_watermark_design",
}


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
# ``queries()`` in dict order. Rounds 1-8 drove 381 distinct queries (ALL
# green on their latest row — round 8 was the first 50/50). This round-9
# window follows VERDICT.md round 8 "Next round" task 10: 50 NEVER-checked
# names from the 221-name backlog, HEAVIEST FIRST by their recorded sf0.1
# standalone time in BASELINE.md (a slot on a heavy query buys evidence on
# the code with the most plan surface; the per-name time is in the comment).
# All 50 carry full DuckDB value-hash oracles, none is in
# ROWS_ONLY_BY_DESIGN, and none has any prior CORRECTNESS row (asserted by
# tests/test_registry.py::test_window_rotation_spends_no_slot_on_checked_
# queries). Everything not listed follows in registration order, so the
# r1-r8 windows remain reproducible from git history. Backlog after this
# window: 171 names.
DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    "q_forecast_combination",        # 15.2 s
    "q_interarrival_burstiness",     # 13.6 s (grouped_lag lineage, r8 fix)
    "q_boxcox_lambda",               # 11.3 s
    "q_durbin_watson",               # 10.7 s
    "q_modularity_brands",           # 8.8 s
    "q_iv_wald_2sls",                # 8.1 s
    "q_median_polish",               # 8.0 s
    "q_tukey_hsd",                   # 7.3 s
    "q_panel_within_estimator",      # 6.9 s (r8 decimal-widening lineage)
    "q_huber_mean",                  # 6.8 s
    "q_momentum_spread",             # 6.5 s
    "q_abc_xyz",                     # 6.2 s (global_running_sum lineage)
    "q_meta_analysis",               # 5.9 s
    "q_influence_diagnostics",       # 5.9 s
    "q_learning_curve",              # 5.9 s (r8 single-tokenize lineage)
    "q_levene_test",                 # 5.9 s
    "q_survival_rmst",               # 5.8 s
    "q_compression_codecs",          # 5.6 s
    "q_ljung_box",                   # 5.6 s
    "q_ucb_replay",                  # 5.5 s
    "q_adaboost_round",              # 5.1 s
    "q_binary_segmentation",         # 5.0 s
    "q_permutation_test",            # 5.0 s (r8 parallelize_scan lineage)
    "q_western_electric",            # 5.0 s
    "q_degree_assortativity",        # 4.9 s
    "q_l28_engagement",              # 4.8 s
    "q_fulfillment_aging",           # 4.7 s
    "q_theta_method",                # 4.7 s
    "q_information_coefficient",     # 4.6 s
    "q_removal_effect_attribution",  # 4.6 s
    "q_rmst",                        # 4.5 s
    "q_cr4_concentration",           # 4.4 s
    "q_conformal_interval",          # 4.3 s
    "q_kruskal_wallis",              # 4.3 s
    "q_placebo_did",                 # 4.3 s
    "q_roll_measure",                # 4.3 s
    "q_ridge_path",                  # 4.2 s
    "q_ts_feature_vector",           # 4.1 s
    "q_pacf",                        # 3.9 s
    "q_tail_dependence",             # 3.9 s
    "q_wilcoxon_signed_rank",        # 3.8 s
    "q_fairness_metrics",            # 3.6 s
    "q_cum_return",                  # 3.5 s
    "q_garman_klass",                # 3.4 s
    "q_uncertainty_sampling",        # 3.4 s
    "q_sprt_monitor",                # 3.4 s
    "q_burrows_delta",               # 3.3 s (r8 TakeOrdered lineage)
    "q_competing_risks",             # 3.3 s
    "q_distance_correlation",        # 3.3 s
    "q_ou_halflife",                 # 3.3 s
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
