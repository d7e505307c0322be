#!/usr/bin/env python
"""Bench a SUBSET of queries under the exact bench.py protocol
(warm-up + min-of-3 noop sink, clearCache between queries, load_1min
recorded) — the A/B instrument for single-family optimization work.

Usage: python scripts/bench_subset.py q433_... q459_... [...]
Prints one JSON line per run: {"queries": {...}, "queries_honest":
{...}, "total": ..., "total_honest": ..., "load_1min": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from azure_batch_map_reduce_spark.registry import load_all
from azure_batch_map_reduce_spark.session import get_spark


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(app_name="abmr-bench-subset")

    def materialize(name: str) -> tuple[float, float]:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        return t2 - t1, t2 - t0

    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        load = -1.0
    materialize("q01_pricing_summary")  # session warmup, untimed
    times: dict[str, float] = {}
    honest: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench-subset: {name}")
        materialize(name)
        runs = [materialize(name) for _ in range(3)]
        times[name] = round(min(r[0] for r in runs), 3)
        honest[name] = round(min(r[1] for r in runs), 3)
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "queries": times,
                "queries_honest": honest,
                "total": round(sum(times.values()), 3),
                "total_honest": round(sum(honest.values()), 3),
                "sf_dir": sf_dir,
                "load_1min": load,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
