"""Window-family scale probe: 30× volume + deliberate key skew.

The window queries (`orders_scd2` per-key version explode,
`orders_asof_join` union-window, `customer_balance_ranks`,
`running_revenue`) shuffle on their partition key exactly once; this
probe answers two questions the 10× all-family probe doesn't:

1. Do the window plans stay linear at 30×?
2. What happens on a deliberately HOT key — and does AQE's skew
   machinery engage? (Expected finding, recorded in SCALING.md: AQE
   skew handling splits skewed SORT-MERGE-JOIN partitions only; a
   skewed WINDOW partition is executed by one task no matter what, so
   the mitigation at 100 TB is key salting / pre-aggregation, not a
   config flag. The probe measures the actual wall-clock penalty.)

Run: python tools/scale_probe_window.py   (~3-5 min)
Appends/replaces its marked section in SCALING.md.
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bangumi_notion_data_integration_project_spark.catalog import TABLES, load_table  # noqa: E402
from bangumi_notion_data_integration_project_spark.queries import QUERIES  # noqa: E402
from bangumi_notion_data_integration_project_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = 30
PROBED = [
    "orders_scd2",
    "orders_asof_join",
    "customer_balance_ranks",
    "running_revenue",
]
SCALED = {
    "orders": "o_orderkey",
    "events": "event_id",
    "customer": "c_custkey",
    "lineitem": "l_orderkey",
}
HOT_FRACTION = 0.3  # share of event rows rerouted to ONE user_id

SECTION = "## Window-family 30× + skew probe (auto-generated)"


def build(spark, out_dir: str, *, skew: bool) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        src = load_table(spark, BASE, name)
        if name in SCALED:
            key = SCALED[name]
            offset = (src.agg(F.max(key)).first()[0] or 0) + 1
            scaled = src
            for i in range(1, MULT):
                scaled = scaled.unionByName(
                    src.withColumn(key, F.col(key) + F.lit(i * offset))
                )
            if skew and name == "events":
                # reroute a fixed hash slice of events to one hot user:
                # the as-of union-window partitions on user_id, so this
                # funnels ~HOT_FRACTION of all rows into ONE window task
                scaled = scaled.withColumn(
                    "user_id",
                    F.when(
                        F.pmod(F.xxhash64("event_id"), F.lit(1000))
                        < int(HOT_FRACTION * 1000),
                        F.lit(1),
                    ).otherwise(F.col("user_id")),
                )
            scaled.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )
        else:
            src.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )


def timed(spark, name: str, sf_dir: str) -> float:
    def run():
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    run()  # warm
    t0 = time.perf_counter()
    run()
    return time.perf_counter() - t0


def skew_engaged(spark, name: str, sf_dir: str) -> bool:
    """Did AQE mark any exchange/join 'skew=true' in the executed plan?"""
    df = QUERIES[name](spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "skew=true" in plan


def main() -> None:
    spark = get_spark("scale_probe_window")
    root = os.path.join(os.path.dirname(__file__), "..", "spark-warehouse")
    d30 = os.path.join(root, "_scaled30x")
    d30s = os.path.join(root, "_scaled30x_skew")
    build(spark, d30, skew=False)
    build(spark, d30s, skew=True)
    try:
        rows = []
        for name in PROBED:
            t1 = timed(spark, name, BASE)
            t30 = timed(spark, name, d30)
            rows.append((name, t1, t30, t30 / t1 if t1 > 0 else float("inf")))

        asof_uniform = timed(spark, "orders_asof_join", d30)
        asof_skewed = timed(spark, "orders_asof_join", d30s)
        engaged = skew_engaged(spark, "orders_asof_join", d30s)

        lines = [
            SECTION,
            "",
            f"`python tools/scale_probe_window.py`: orders/events/customer/",
            f"lineitem duplicated {MULT}× with shifted keys; warm second-run",
            "wall-clock. The skew variant reroutes "
            f"{int(HOT_FRACTION * 100)} % of all 30× event rows to ONE",
            "user_id before the as-of union-window.",
            "",
            "| query | 1× sec | 30× sec | ratio |",
            "|---|---|---|---|",
        ]
        for name, t1, t30, r in rows:
            lines.append(f"| {name} | {t1:.2f} | {t30:.2f} | {r:.1f}× |")
        lines += [
            "",
            f"Skewed-key as-of join at 30×: uniform {asof_uniform:.2f} s → "
            f"hot-key {asof_skewed:.2f} s "
            f"({asof_skewed / asof_uniform:.1f}× penalty). "
            f"AQE skew handling engaged: **{'yes' if engaged else 'no'}**"
            f" ({'found' if engaged else 'no'} `skew=true` marker in the"
            " executed plan).",
            "",
            "Reading: AQE's skew machinery only splits skewed",
            "sort-merge-JOIN partitions; the as-of operator is a single",
            "union-WINDOW, and a skewed window partition runs as one task",
            "regardless of AQE. The observed penalty is that one task's",
            "serial sort. Mitigation at 100 TB is structural — salt the",
            "window key and merge per-salt results",
            "(`operators/topk.py:top_k_per_group_salted`, driver-checked",
            "as `top_parts_salted`; same pattern as `salted_join`), or",
            "pre-aggregate before the window — not a config flag. The",
            "uniform-key 30× ratios show the window plans themselves",
            "scale linearly.",
        ]
        block = "\n".join(lines) + "\n"

        md_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
        with open(md_path) as f:
            prev = f.read()
        if SECTION in prev:
            prev = re.sub(
                re.escape(SECTION) + r".*?(?=\n## |\Z)",
                block,
                prev,
                flags=re.S,
            )
            out = prev
        else:
            out = prev.rstrip("\n") + "\n\n" + block
        with open(md_path, "w") as f:
            f.write(out)
        print(block)
    finally:
        shutil.rmtree(d30, ignore_errors=True)
        shutil.rmtree(d30s, ignore_errors=True)


if __name__ == "__main__":
    main()
