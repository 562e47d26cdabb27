"""rnd_half_away must be bit-identical to DuckDB round(CAST(x AS DOUBLE), nd)
at every magnitude — the bounded-model recursions (Holt, Markov absorption,
dedup funnel) iterate on its output, so a single ulp of drift compounds.
Covers the two failure modes it replaces: Python banker's rounding on exact
.5 boundaries, and the floor(abs*p10+0.5) fold losing its effect / slipping
an ulp once abs(x)*p10 approaches 2**52 (ADVICE round 3)."""

from __future__ import annotations

import math
import struct

import duckdb
import pytest

from bigdatainfinance1_spark.functions.rounding import rnd_half_away


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


CASES = [
    # (value, nd) — exact .5 boundaries where banker's round() flips
    (0.5, 0), (1.5, 0), (2.5, 0), (-0.5, 0), (-2.5, 0),
    (0.12345,  4), (0.123450000001, 4), (0.123455, 5),
    (1.0005, 3), (-1.0005, 3),
    # 12-dp recursion territory (Holt/Markov state)
    (123456.789012345678, 12), (0.999999999999500, 12),
    (7.0 / 3.0, 12), (-7.0 / 3.0, 12), (1e-13, 12), (5e-13, 12),
    # magnitudes where abs(x)*1e12 crosses 2**52/2**53 (monthly revenue at
    # large SFs — the ADVICE finance_ts.py:1190 case)
    (4503.599627370497, 12), (9007.199254740993, 12),
    (1234567.891234567891, 12), (98765432.1234567891234, 12),
    (12345678912.345678912, 12), (1e15 + 1 / 3, 12),
    # near the float boundary where x + 0.5 misbehaves in the old fold
    (0.49999999999999994, 0), (4503599627370496.5e-12, 12),
    # display precision (4 dp) used by every ledger query
    (0.33335, 4), (0.666650000000001, 4), (123.45675, 4),
]


@pytest.mark.parametrize("x,nd", CASES)
def test_matches_duckdb_bitwise(x, nd):
    # bind as a parameter so the value reaches round() as a genuine DOUBLE —
    # the path oracle queries take (parquet columns). Inline decimal literals
    # constant-fold through DECIMAL first and can round differently; no
    # oracle feeds round() that way.
    duck = duckdb.execute("select round(cast(? as double), ?)", [x, nd]).fetchone()[0]
    ours = rnd_half_away(x, nd)
    assert _bits(ours) == _bits(duck), (x, nd, ours, duck)


def test_half_away_not_bankers():
    assert rnd_half_away(0.5, 0) == 1.0       # round() gives 0
    assert rnd_half_away(2.5, 0) == 3.0       # round() gives 2
    assert rnd_half_away(-2.5, 0) == -3.0
    assert round(2.5) == 2  # the builtin really is banker's — the bug exists


def test_huge_and_special_values_pass_through():
    assert rnd_half_away(1e308, 12) == 1e308  # inf intermediate → identity
    assert math.isnan(rnd_half_away(float("nan"), 4))
    assert rnd_half_away(0.0, 6) == 0.0
