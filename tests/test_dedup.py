"""Behavioral tests for the dedup family beyond oracle parity: the
quadratic-verifier gate and the LSH candidate path (VERDICT round-1 task 4)."""

from __future__ import annotations

import warnings

import pytest

import bigdatainfinance1_spark.operators.dedup as dedup
from bigdatainfinance1_spark.registry import load_all_queries
from tests.conftest import SF_DIR

SPECS = load_all_queries()


def _pair_set(df):
    return {(r["doc_id_1"], r["doc_id_2"]) for r in df.collect()}


def test_jaccard_budget_not_tripped_at_gate_scale(spark):
    """At oracle-gate scales the estimate must stay under budget so the
    driver checks the EXACT path."""
    ds = dedup._shingle_hashes_raw(spark, SF_DIR)
    from pyspark.sql import functions as F

    est = (
        ds.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    assert est < dedup.JACCARD_PAIR_BUDGET


def test_jaccard_gate_switches_to_lsh_and_warns(spark, monkeypatch):
    """Forcing the budget to trip must (a) warn, (b) produce the same J>=0.8
    pairs via the LSH prefilter on this corpus (all true pairs collide in
    >=1 band — deterministic, md5-seeded), and (c) SAY SO in the relation:
    the constant `method` column flips 'exact' -> 'lsh_prefilter' (round-2
    verdict task 3 — no silent semantics change)."""
    exact_df = SPECS["q_jaccard_neardup"].fn(spark, SF_DIR)
    assert {r["method"] for r in exact_df.select("method").distinct().collect()} == {"exact"}
    exact = _pair_set(exact_df)
    monkeypatch.setattr(dedup, "JACCARD_PAIR_BUDGET", 1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        gated_df = SPECS["q_jaccard_neardup"].fn(spark, SF_DIR)
        assert {r["method"] for r in gated_df.select("method").distinct().collect()} == {
            "lsh_prefilter"
        }
        gated = _pair_set(gated_df)
    assert any("MinHash-LSH prefilter" in str(w.message) for w in caught)
    assert gated == exact
    assert gated  # non-vacuous


def test_prefix_join_budget_not_tripped_at_gate_scale(spark):
    """The driver must check the EXACT ('prefix_exact') tier: oracle-gate
    corpora stay under PREFIX_PAIR_BUDGET."""
    df = SPECS["q_prefix_filter_join"].fn(spark, SF_DIR)
    assert {r["method"] for r in df.select("method").distinct().collect()} == {
        "prefix_exact"
    }


def test_prefix_join_gate_switches_to_lsh_and_warns(spark, monkeypatch):
    """Forcing the budget to trip must (a) warn, (b) flip the method column
    to 'lsh_prefilter' (no silent semantics change), and (c) still recover
    the same J>=0.7 pairs on this corpus (its true pairs are near-verbatim
    twins, which collide in >=1 band deterministically)."""
    exact = _pair_set(SPECS["q_prefix_filter_join"].fn(spark, SF_DIR))
    monkeypatch.setattr(dedup, "PREFIX_PAIR_BUDGET", 1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        gated_df = SPECS["q_prefix_filter_join"].fn(spark, SF_DIR)
        assert {r["method"] for r in gated_df.select("method").distinct().collect()} == {
            "lsh_prefilter"
        }
        gated = _pair_set(gated_df)
    assert any("MinHash-LSH" in str(w.message) for w in caught)
    assert gated == exact
    assert gated  # non-vacuous


def test_lsh_sweep_budget_not_tripped_at_gate_scale(spark):
    """The driver must check the EXACT tier: every banding's bucket
    fan-out stays under LSH_SWEEP_PAIR_BUDGET at oracle-gate scales."""
    df = SPECS["q_lsh_band_sweep"].fn(spark, SF_DIR)
    assert {r["method"] for r in df.select("method").distinct().collect()} == {
        "exact"
    }


def test_lsh_sweep_gate_switches_to_stratum_and_warns(spark, monkeypatch):
    """Forcing the budget to trip must (a) warn, (b) flip the method
    column to the stratum tier (no silent semantics change), (c) report
    counts no larger than the exact tier's (the stratum is a subset of
    docs), and (d) keep the banding/threshold columns identical."""
    exact = {
        r["n_bands"]: r
        for r in SPECS["q_lsh_band_sweep"].fn(spark, SF_DIR).collect()
    }
    monkeypatch.setattr(dedup, "LSH_SWEEP_PAIR_BUDGET", -1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        gated = {
            r["n_bands"]: r
            for r in SPECS["q_lsh_band_sweep"].fn(spark, SF_DIR).collect()
        }
    assert any("hash-sampled doc stratum" in str(w.message) for w in caught)
    assert set(gated) == set(exact)
    for b, row in gated.items():
        assert row["method"] == f"stratum_1_of_{dedup.LSH_SWEEP_SAMPLE_MOD}"
        assert row["n_candidate_pairs"] <= exact[b]["n_candidate_pairs"]
        assert row["rows_per_band"] == exact[b]["rows_per_band"]
        assert row["s50_threshold"] == exact[b]["s50_threshold"]


def test_lsh_audit_budget_not_tripped_at_gate_scale(spark):
    """The driver must check the EXACT (whole-corpus) audit: oracle-gate
    corpora stay under LSH_AUDIT_PAIR_BUDGET."""
    df = SPECS["q_lsh_recall_audit"].fn(spark, SF_DIR)
    assert {r["method"] for r in df.select("method").distinct().collect()} == {
        "exact"
    }


def test_lsh_audit_gate_switches_to_stratum_and_warns(spark, monkeypatch):
    """Forcing the budget to trip must (a) warn, (b) flip the method
    column to the stratum tier (no silent semantics change), (c) report
    pair counts no larger than the exact tier's (the stratum restricts
    BOTH the ground truth and the candidate generator to a doc subset),
    and (d) keep recall/precision well-defined ratios in [0, 1]."""
    exact = SPECS["q_lsh_recall_audit"].fn(spark, SF_DIR).collect()[0]
    monkeypatch.setattr(dedup, "LSH_AUDIT_PAIR_BUDGET", -1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        gated = SPECS["q_lsh_recall_audit"].fn(spark, SF_DIR).collect()[0]
    assert any("doc stratum" in str(w.message) for w in caught)
    assert gated["method"] == f"stratum_1_of_{dedup.LSH_AUDIT_SAMPLE_MOD}"
    assert gated["n_true_pairs"] <= exact["n_true_pairs"]
    assert gated["n_candidates"] <= exact["n_candidates"]
    assert gated["n_hits"] <= gated["n_candidates"]
    for col in ("recall", "precision"):
        if gated[col] is not None:
            assert 0.0 <= gated[col] <= 1.0


def test_minhash_families_equivalent(spark):
    """Round-2 verdict task 4 'done' criterion: the xxhash64 production path
    (q_minhash_lsh_fast) and the md5 oracle twin (q_minhash_lsh) must yield
    the same verified pair set — same candidates surviving the same exact
    verifier — so demoting md5 to verification duty loses nothing."""
    fast = _pair_set(SPECS["q_minhash_lsh_fast"].fn(spark, SF_DIR))
    twin = _pair_set(SPECS["q_minhash_lsh"].fn(spark, SF_DIR))
    assert fast == twin
    assert fast  # non-vacuous


def test_gated_verify_plan_has_no_allpairs_shingle_join(spark, monkeypatch):
    """The gated path must be candidate-driven: the shingle relation joins
    against candidate pairs, never against itself. Detectable in the plan:
    the exact path's self-equi-join on `h` produces a join ON h alone,
    which the candidate-driven build never does (its shingle join includes
    doc_id_2)."""
    monkeypatch.setattr(dedup, "JACCARD_PAIR_BUDGET", 1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        df = SPECS["q_jaccard_neardup"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    # exact path joins on the bare shingle hash; gated path always pairs it
    # with doc_id_2 in the same equi-join condition
    bare_h_joins = [
        m for m in re.findall(r"Join Inner, \(([^\n]+)\)", plan) if "doc_id" not in m
    ]
    assert not bare_h_joins, bare_h_joins


def test_blocking_quality_budget_not_tripped_at_gate_scale(spark):
    """The driver must check the EXACT (whole-corpus) truth set: oracle-gate
    corpora stay under BQ_TRUTH_PAIR_BUDGET (the method column says so)."""
    df = SPECS["q_blocking_quality"].fn(spark, SF_DIR)
    assert {r["method"] for r in df.select("method").distinct().collect()} == {
        "exact"
    }


def test_blocking_quality_gate_switches_to_stratum_and_warns(spark, monkeypatch):
    """Forcing the budget to trip must (a) warn, (b) flip the method column
    to the stratum tier (no silent semantics change), (c) keep the blocking
    census (reduction-ratio side) full-corpus — those columns are linear and
    must NOT shrink with the stratum — while the truth-set counts can only
    shrink, and (d) keep pairs_completeness a well-defined ratio in [0, 1]."""
    import bigdatainfinance1_spark.operators.record_linkage as rl

    exact = SPECS["q_blocking_quality"].fn(spark, SF_DIR).collect()[0]
    monkeypatch.setattr(rl, "BQ_TRUTH_PAIR_BUDGET", -1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        gated = SPECS["q_blocking_quality"].fn(spark, SF_DIR).collect()[0]
    assert any("doc stratum" in str(w.message) for w in caught)
    assert gated["method"] == f"stratum_1_of_{rl.BQ_SAMPLE_MOD}"
    for col in ("n_docs", "n_blocks", "max_block", "total_pairs", "blocked_pairs"):
        assert gated[col] == exact[col]
    assert gated["n_true_matches"] <= exact["n_true_matches"]
    assert gated["n_matches_blocked"] <= gated["n_true_matches"]
    if gated["pairs_completeness"] is not None:
        assert 0.0 <= gated["pairs_completeness"] <= 1.0
