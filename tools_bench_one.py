#!/usr/bin/env python
"""Ad-hoc single-query timer: python tools_bench_one.py q_name [q_name ...]
Same protocol as bench.py (noop write, warmup, median of N runs)."""
from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdatainfinance1_spark.registry import load_all_queries
from bigdatainfinance1_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(app_name="bench-one")
    specs = load_all_queries()
    specs["q_pricing_summary"].fn(spark, sf_dir).limit(1).collect()
    out = {}
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        out[name] = {"median": sorted(samples)[len(samples) // 2], "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
