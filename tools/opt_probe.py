"""Optimization-round probe: quiet multi-pass timing + formatted-plan
dump for named queries (guide §1: measure first, isolate with the noop
sink, capture the plan).

    python tools/opt_probe.py [--sf DIR] [--passes N] [--plans TAG] q1 q2 ...

Each query is built fresh and written to the noop sink ``N`` times
(default 3); all pass times print so clock wobble is visible.  With
``--plans TAG`` the .explain("formatted") text is written to
``plans/r13/<query>_<TAG>.txt`` (TAG is usually "before" or "after").
Jobs are labelled so a UI/event-log reader can attribute stages.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangumi_notion_data_integration_project_spark.queries import QUERIES  # noqa: E402
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, metavar="TAG")
    ap.add_argument(
        "--loadgate",
        type=float,
        default=None,
        metavar="L",
        help="wait (up to 10 min/pass) until 1-min load average < L "
        "before each timed pass — defends the quiet-clock protocol "
        "against co-tenant load spikes",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    def gate() -> None:
        if args.loadgate is None:
            return
        deadline = time.time() + 600
        while time.time() < deadline:
            with open("/proc/loadavg") as fh:
                load1 = float(fh.read().split()[0])
            if load1 < args.loadgate:
                return
            time.sleep(10)
        print(f"!! loadgate: still >= {args.loadgate} after 10 min, proceeding", file=sys.stderr)

    spark = get_spark("opt-probe")
    # warm the sink + Arrow workers exactly as bench.py does
    QUERIES["order_priority_counts"](spark, args.sf).write.mode("overwrite").format("noop").save()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    for name in args.queries:
        if name not in QUERIES:
            print(f"?? unknown query {name}", file=sys.stderr)
            return 2
        times = []
        for p in range(args.passes):
            gate()
            spark.sparkContext.setJobDescription(f"opt-probe:{name}:pass{p+1}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        if args.plans:
            df = QUERIES[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(txt)
        print(f"{name}: " + " / ".join(f"{t:.2f}s" for t in times) + f"  min={min(times):.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
