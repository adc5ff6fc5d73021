"""Command-line runner — the user-facing entrypoint for the engine.

    python -m bangumi_notion_data_integration_project_spark.run --list
    python -m bangumi_notion_data_integration_project_spark.run \
        --query category_summary --sf-dir /root/testdata/sf0.01 --show 20
    python -m bangumi_notion_data_integration_project_spark.run \
        --query dedup_exact --out /tmp/dedup.parquet
    python -m bangumi_notion_data_integration_project_spark.run \
        --query revenue_by_nation --explain

A reference user runs one script per job (bangumi_data_ingestion.py,
notion_data_ingestion.py, ...); here every registered query/operator is
addressable by name from one CLI, writes parquet instead of collecting
when ``--out`` is given, and can print the physical plan for review.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="bangumi_notion_data_integration_project_spark",
        description="Run a registered query against a table directory.",
    )
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    ap.add_argument("--query", help="registered query name")
    ap.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory holding the parquet tables",
    )
    ap.add_argument("--show", type=int, metavar="N", help="print first N rows")
    ap.add_argument("--out", help="write result parquet to this path")
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    return ap


def main(argv: list[str] | None = None) -> int:
    from .queries import ORACLES, QUERIES
    from .session import get_spark

    args = build_parser().parse_args(argv)

    if args.list:
        for name in QUERIES:
            marker = "" if name in ORACLES else "  (no SQL oracle)"
            print(f"{name}{marker}")
        return 0
    if not args.query:
        build_parser().print_usage()
        return 2
    if args.query not in QUERIES:
        print(f"unknown query: {args.query!r} (use --list)", file=sys.stderr)
        return 2

    spark = get_spark(f"run:{args.query}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0

    t0 = time.perf_counter()
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = df.count()
    wall = time.perf_counter() - t0
    if args.show:
        df.show(args.show, truncate=False)
    print(
        json.dumps(
            {"query": args.query, "rows": n, "sec": round(wall, 3), "out": args.out}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
