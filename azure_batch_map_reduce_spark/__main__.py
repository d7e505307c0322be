"""CLI entry point: run or list registered queries from a shell.

The reference is driven as a console program (``Program.cs:92-158``:
parse config, run the pipeline, print results and elapsed time); this
is the engine's equivalent console surface::

    python -m azure_batch_map_reduce_spark list [--tag TAG]
    python -m azure_batch_map_reduce_spark run q21_revenue_by_nation \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain]

``run`` prints the result (driver-truncated by --limit; the query's
distributed materialization is unaffected) and wall time; ``--explain``
prints the formatted physical plan instead of executing.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="azure_batch_map_reduce_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", help="filter by tag substring")

    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("name", help="query name (see `list`)")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument(
        "--explain", action="store_true", help="print the physical plan, don't execute"
    )

    args = p.parse_args(argv)

    from azure_batch_map_reduce_spark.registry import load_all

    registry = load_all()

    if args.cmd == "list":
        for name in sorted(registry):
            q = registry[name]
            if args.tag and not any(args.tag in t for t in q.tags):
                continue
            oracle = "sql-oracle" if q.oracle else "rows-only"
            print(f"{name:32s} [{oracle}] {', '.join(q.tags)}")
        return 0

    if args.name not in registry:
        print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
        return 2

    from azure_batch_map_reduce_spark.session import get_spark

    spark = get_spark(app_name=f"abmr-{args.name}")
    df = registry[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    t0 = time.perf_counter()
    rows = df.limit(args.limit).collect()
    elapsed = time.perf_counter() - t0
    if rows:
        cols = rows[0].__fields__
        print("\t".join(cols))
        for r in rows:
            print("\t".join(str(v) for v in r))
    print(f"-- {len(rows)} row(s) shown (limit {args.limit}) in {elapsed:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
