#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to text files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX q443_... q447_...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, built at
$SPARK_GRAFT_SF_DIR (default sf0.1). Run from any checkout (the repo
root on sys.path decides which code version's plan is captured) —
the r14 plan evidence regenerates "before" files from a git worktree
of the pre-change commit and "after" files from HEAD.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from azure_batch_map_reduce_spark.registry import load_all
    from azure_batch_map_reduce_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark(app_name="abmr-plan-dump")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-dump: {name}")
        df = reg[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
