#!/usr/bin/env python
"""Empirical summation-order-sensitivity detector for the driver window.

Runs every DRIVER_WINDOW_ORDER query at sf0.01 under two different
shuffle-partition counts — different partial-aggregation merge orders —
and requires tuple-exact equality (NaN == NaN). Any engine-ordered double
reduction that reaches an emitted round() shows up as a DIFF here long
before it flips a driver hash at a rounding boundary (the
q_weighted_reservoir_es r5 flake class). Round-6 window swept clean:
50/50 stable (BASELINE.md "Round-6 gates").

Usage: python tools_order_check.py [query ...]   (default: whole window)
       python tools_order_check.py --all          (every registered query
       with a batch-deterministic result — streaming rows-only queries
       replay a staged stream and are checked by their own harness)
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdatainfinance1_spark.registry import DRIVER_WINDOW_ORDER, load_all_queries
from bigdatainfinance1_spark.session import get_spark

SF = "/root/testdata/sf0.01"
PARTITION_COUNTS = ("32", "5")


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or a == b  # NaN == NaN
    try:
        import pandas as pd

        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> None:
    spark = get_spark(app_name="bigdatainfinance1_spark-order-check")
    specs = load_all_queries()
    picked = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--all" in sys.argv:
        names = list(specs)
    else:
        names = picked or list(DRIVER_WINDOW_ORDER)
    unknown = [n for n in names if n not in specs]
    if unknown:
        sys.exit(f"order_check: unknown query name(s): {', '.join(unknown)}")
    bad = []
    for name in names:
        outs = []
        for parts in PARTITION_COUNTS:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            pdf = specs[name].fn(spark, SF).toPandas()
            cols = sorted(pdf.columns)
            pdf = (
                pdf.reindex(cols, axis=1)
                .sort_values(by=cols, kind="mergesort")
                .reset_index(drop=True)
            )
            outs.append(pdf)
        a, b = outs
        same = a.shape == b.shape and all(
            all(_cells_equal(x, y) for x, y in zip(a[c], b[c])) for c in a.columns
        )
        print(("OK  " if same else "DIFF") + " " + name, flush=True)
        if not same:
            bad.append(name)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print("RESULT:", "all stable" if not bad else f"UNSTABLE: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
