"""Execute EVERY registry query at $SPARK_GRAFT_SF_DIR (default
sf0.1) into the noop sink, reporting every failure and exiting
nonzero if any occurred (a full sweep, not fail-fast, so one broken
query doesn't hide others).

Exists because data-dependent crashes can be scale-selective: the
triangle-census transitivity divide-by-zero appeared ONLY at sf0.1
(the support-≥3 co-purchase graph thins out there), so the sf0.001
smoke suite and the sf0.01 oracle mirror both missed it. This sweep is
the execution-completeness gate at the scale the driver benches.

Usage: python tools/sweep_all.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangumi_notion_data_integration_project_spark.queries import QUERIES  # noqa: E402
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark("sweep-all")
    t0 = time.time()
    failures = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures.append(name)
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}", flush=True)
    print(
        f"{len(QUERIES) - len(failures)}/{len(QUERIES)} executed clean at "
        f"{sf_dir} in {time.time() - t0:.0f}s"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
