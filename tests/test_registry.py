"""Registration-order contract: the driver hash-checks only the FIRST 50
entries of ``queries()``. These tests pin the curated window so a refactor
can't silently push a family back out of driver visibility (the round-1
failure mode — see VERDICT.md)."""

from __future__ import annotations

from bigdatainfinance1_spark.registry import DRIVER_WINDOW_ORDER, load_all_queries

DRIVER_CAP = 50

# One representative query per SURVEY §2 family that MUST sit inside the
# driver's correctness window.
FAMILY_REPRESENTATIVES = {
    "S": "q_csv_roundtrip",
    "P": "q_null_handling",
    "J": "q_star_join",
    "A": "q_pricing_summary",
    "W": "q_sessionization",
    "O": "q_union_all",
    "F": "q_string_funcs",
    "ST": "q_stream_tumbling",
    "L": "q_cosine_topk",
    "U": "q_udf_pandas_revenue",
}


def test_window_order_names_are_registered():
    specs = load_all_queries()
    missing = [n for n in DRIVER_WINDOW_ORDER if n not in specs]
    assert not missing, f"DRIVER_WINDOW_ORDER names not in registry: {missing}"


def test_window_order_has_no_duplicates():
    assert len(set(DRIVER_WINDOW_ORDER)) == len(DRIVER_WINDOW_ORDER)


def test_first_50_cover_every_family():
    window = list(load_all_queries())[:DRIVER_CAP]
    for family, name in FAMILY_REPRESENTATIVES.items():
        assert name in window, f"family {family} rep {name} fell out of the driver window"


def test_first_50_are_mostly_hash_checkable():
    specs = load_all_queries()
    window = list(specs)[:DRIVER_CAP]
    with_oracle = [n for n in window if specs[n].oracle is not None]
    # VERDICT round-1 target: >=45 of the 50 slots hash-checked.
    assert len(with_oracle) >= 45, (
        f"only {len(with_oracle)}/{DRIVER_CAP} window queries have oracles: "
        f"rows-only = {sorted(set(window) - set(with_oracle))}"
    )


def test_registry_still_contains_everything():
    # Reordering must not drop registrations: full surface stays >= 109.
    assert len(load_all_queries()) >= 109
