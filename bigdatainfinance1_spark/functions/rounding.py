"""Driver-side rounding that matches DuckDB's ``round(x, nd)`` exactly.

The bounded-model operators (Holt smoothing, Markov absorption, the dedup
funnel ledger) iterate tiny state on the driver and must visit bit-identical
doubles to their DuckDB oracles. Two pitfalls this helper closes:

1. Python's builtin ``round()`` is banker's rounding — exact .5 boundaries
   (which 12-dp recursions do produce) flip half-to-even while SQL rounds
   half-away-from-zero (observed flipping q_holt_smoothing at sf0.001).
2. The obvious half-away fold ``floor(abs(x)*p10 + 0.5)`` misrounds once
   ``abs(x)*p10`` nears 2**52: the ``+ 0.5`` is absorbed or rounds the sum
   up a full ulp, drifting from C++ ``std::round`` (what DuckDB applies to
   ``x * 10^nd``) by an ulp that then compounds through recursions.

``rnd_half_away`` reproduces ``std::round(x * 10^nd) / 10^nd`` exactly at
all magnitudes: ``v - floor(v)`` is an EXACT double subtraction for any
finite v >= 0 (Sterbenz for v >= 1, trivially exact below), so the >= .5
test never sees representation error, and above 2**53 every double is an
integer so the fold is the identity — same as std::round.
"""

from __future__ import annotations

import math


def rnd_half_away(x: float, nd: int) -> float:
    """Half-away-from-zero rounding of a double to ``nd`` decimal places,
    bit-identical to DuckDB ``round(CAST(x AS DOUBLE), nd)`` =
    ``std::round(x * 10^nd) / 10^nd``."""
    p10 = 10.0 ** nd
    v = abs(x) * p10
    if math.isinf(v) or math.isnan(v):
        return x
    f = math.floor(v)
    if v - f >= 0.5:  # exact: v - floor(v) carries no rounding error
        f += 1.0
    return math.copysign(f, x) / p10
