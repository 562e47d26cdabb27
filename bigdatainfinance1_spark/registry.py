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
# ``queries()`` in dict order. Round 1 used alphabetical module-import order,
# which spent all 50 slots on aggregates/dedup/io/joins and left the windows,
# scalars, set-ops, text, similarity, UDF, and streaming families with zero
# driver rows (VERDICT.md round 1, top finding). This curated list puts at
# least one representative of every SURVEY §2 family inside the window:
# positions 1-37 are the families the round-1 window missed, 38-50 re-confirm
# one flagship per already-green family. 48 of the 50 carry full DuckDB
# oracles; q_sample_profile (P6) and q_stream_watermarked (ST4) are rows-only
# by design. Everything not listed follows in registration order.
DRIVER_WINDOW_ORDER: tuple[str, ...] = (
    # Windows W1-W9 (zero driver rows in round 1)
    "q_sessionization",          # W9
    "q_range_window_events",     # W6
    "q_rank_top_customers",      # W1+W2
    "q_lag_dod",                 # W3
    "q_running_total",           # W4
    "q_moving_avg",              # W5
    "q_first_last_order",        # W7
    "q_percent_rank_suppliers",  # W8
    "q_ntile_quartiles",         # W1
    # Scalar function families F1-F7
    "q_string_funcs",            # F1
    "q_date_funcs",              # F2
    "q_math_funcs",              # F3
    "q_array_funcs",             # F4
    "q_json_funcs",              # F5/F6
    "q_hash_funcs",              # F7
    # Sort/limit + set ops O1-O4
    "q_top_revenue_orders",      # O1/O2
    "q_union_all",               # O3
    "q_intersect_custs",         # O4
    "q_simhash",                 # L2 fingerprint tier (oracle-checked since round 2)
    # Similarity / text / embedding flagships L3-L5, L7
    "q_cosine_topk",             # L3
    "q_top_terms",               # L4
    "q_tfidf_top",               # L5
    "q_embedding_centroids",     # L7
    # UDF surface U1-U5
    "q_udf_pandas_revenue",      # U1
    "q_udf_grouped_agg",         # U2
    "q_apply_in_pandas_zscore",  # U3
    "q_udtf_shingles",           # U4
    "q_sql_registered_udf",      # U5
    # Remaining projection-family IDs P5/P6
    "q_null_handling",           # P5
    "q_sample_profile",          # P6 (rows-only by design)
    # Streaming ST1-ST7 (S5 source exercised by every entry)
    "q_stream_tumbling",         # ST1
    "q_stream_sliding",          # ST2
    "q_session_window",          # ST3
    "q_stream_watermarked",      # ST4 (rows-only by design)
    "q_stream_dedup",            # ST5
    "q_stream_static_join",      # ST6
    "q_stream_stateful_totals",  # ST7
    # One flagship per family already driver-green in round 1
    "q_pricing_summary",         # A1
    "q_global_agg",              # A2
    "q_percentiles",             # A5
    "q_rollup_revenue",          # A7
    "q_star_join",               # J1
    "q_broadcast_dim_join",      # J2
    "q_asof_join",               # J7
    "q_exact_dedup",             # L1
    "q_jaccard_neardup",         # L2 exact tier
    "q_minhash_lsh",             # L2 scale tier
    "q_multimodal_join",         # L6
    "q_csv_roundtrip",           # S2
    "q_partitioned_sink",        # S3
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
