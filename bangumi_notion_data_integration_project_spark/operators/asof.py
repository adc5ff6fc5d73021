"""As-of (most-recent-prior) join — a custom operator Spark lacks.

For each left row, attach the latest right row with the same key whose
timestamp is <= the left timestamp. Implemented as a composition of
built-in operators (SURVEY §7.2 preference order (a)): union the two
sides tagged by origin, sort within key by time, and carry the last
seen right row forward with a window ``last(..., ignorenulls=True)``.

Scale shape: ONE shuffle on the join key (the window partition), no
range explosion, no per-key driver loops — this is the standard
scalable restatement of an as-of join on Spark. Skew caveat (measured,
SCALING.md window probe): AQE's skew machinery splits skewed
sort-merge-JOIN partitions only — a hot window key runs as one task
regardless, so a heavily skewed key needs structural mitigation
(salt + per-salt window + merge, or pre-aggregation), not a config.

DuckDB's native ``ASOF JOIN`` provides the oracle for correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: left rows + latest right values at or before
    left_ts. Right columns come back as ``{col}{suffix}`` (null when no
    prior right row exists).
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (key, right_ts)]

    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts (<= semantics)
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(_struct_type_ddl(right, right_value_cols)).alias("__r"),
    )

    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(_struct_type_ddl(left, left.columns)).alias("__l"),
        F.struct(*right_value_cols).alias("__r"),
    )

    unioned = l_tag.select("__k", "__ts", "__side", "__l", "__r").unionByName(
        r_tag.select("__k", "__ts", "__side", "__l", "__r")
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__rlast", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__l").getField(c).alias(c) for c in left.columns],
        *[F.col("__rlast").getField(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    return out


def _struct_type_ddl(df: DataFrame, cols: list[str]) -> str:
    from pyspark.sql import types as T

    fields = {f.name: f for f in df.schema.fields}
    st = T.StructType([fields[c] for c in cols])
    return st.simpleString()
