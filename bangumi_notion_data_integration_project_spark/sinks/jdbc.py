"""JDBC sink (K3) — the reference's chunked MySQL load, Spark-native.

Reference: pandas to_sql with if_exists='replace'/'append',
chunksize=1000 (data_loading_to_mysql_database.py:149-155,166-172).
Spark's JDBC writer batches per partition (``batchsize``) and
parallelizes across executors — the chunking the reference hand-rolls
is the default behavior here.

Complex columns are JSON-stringified before the write, mirroring the
reference's list→JSON pre-pass (prepare_dataframe_for_mysql,
data_loading_to_mysql_database.py:73-96) — relational sinks can't hold
native arrays/maps.

Exercised end-to-end against embedded Derby (bundled in Spark's jars)
in tests/test_jdbc_roundtrip.py: overwrite/append modes, batch
chunking, complex-column stringification, and partitioned readback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BATCH_SIZE = 1000  # reference chunksize=1000


def prepare_for_jdbc(df: DataFrame) -> DataFrame:
    """JSON-stringify complex columns (arrays/maps/structs)."""
    out = df
    for name, dtype in df.dtypes:
        if dtype.startswith(("array", "map", "struct")):
            out = out.withColumn(name, F.to_json(name))
    return out


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    properties: dict | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
) -> None:
    """mode='overwrite' ≙ if_exists='replace'; 'append' ≙ 'append'."""
    props = dict(properties or {})
    props.setdefault("batchsize", str(batch_size))
    out = prepare_for_jdbc(df)
    if num_partitions:
        out = out.repartition(num_partitions)
    out.write.jdbc(url, table, mode=mode, properties=props)
