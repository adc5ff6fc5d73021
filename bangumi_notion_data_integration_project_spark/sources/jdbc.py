"""JDBC source (S4) — the reference's `pd.read_sql` scan, Spark-native.

Reference: `pd.read_sql("SELECT * FROM {table}", con=engine)` pulls the
whole table through one connection into driver memory
(data_loading_to_mysql_database.py:202,207). Spark's JDBC reader
replaces that with a *partitioned* scan: N executors each issue a
bounded-range query (`partitionColumn BETWEEN lo AND hi`), so the read
parallelizes and no single process holds the table.

At 100 TB the partitioned form is the only viable one — `read_jdbc`
therefore takes the stride bounds explicitly and derives sane defaults
(min/max probe) when asked, mirroring how the reference probes
category totals before scanning (S2, bangumi_data_ingestion.py:105-153).

Tested against embedded Derby (the JDBC engine bundled with Spark) in
tests/test_jdbc_roundtrip.py — a real JDBC write + readback, not a
config-only pass-through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    properties: dict | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Scan a JDBC table (S4).

    Without ``partition_column`` this is a single-connection read (only
    acceptable for small dims). With it, Spark issues ``num_partitions``
    range-bounded queries in parallel; bounds default to a min/max probe
    of the column (one tiny aggregate query, the S2 pattern).
    """
    props = dict(properties or {})
    reader = spark.read
    if partition_column is None:
        return reader.jdbc(url, table, properties=props)
    if lower_bound is None or upper_bound is None:
        # ANSI-quoted so case-folding engines (Derby, Postgres) resolve
        # the exact column name Spark's writer created
        qc = '"' + partition_column.replace('"', '""') + '"'
        probe = reader.jdbc(
            url,
            f"(SELECT MIN({qc}) AS lo, MAX({qc}) AS hi FROM {table}) probe",
            properties=props,
        ).first()
        lower_bound, upper_bound = probe[0], probe[1]
        if lower_bound is None:  # empty table
            return reader.jdbc(url, table, properties=props)
    return reader.jdbc(
        url,
        table,
        column=partition_column,
        lowerBound=int(lower_bound),
        upperBound=int(upper_bound),
        numPartitions=num_partitions,
        properties=props,
    )
