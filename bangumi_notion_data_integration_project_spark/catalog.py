"""Table loaders for the star-schema testdata.

Parquet scans are left fully declarative so Catalyst applies column
pruning and predicate pushdown (verify with ``.explain`` — look for
``PushedFilters`` / ``ReadSchema``). Nothing is cached here; callers
decide persistence at the pipeline level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# fact-sized tables worth spreading; dims stay as-is (they broadcast,
# and a pre-broadcast exchange would only add a stage)
SPREAD_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}

# memo for _spread's planned-partition probe: (sorted input files with
# sizes, parallelism) → bool. Keyed on the file listing + per-file
# byte sizes, not the table name, so a rewritten or grown table
# re-probes even when a rewrite keeps identical file names (e.g. a
# fixture regenerated in place by a non-Spark writer). Entries are
# O(tables × sessions) — effectively bounded.
_SPREAD_DECISIONS: dict[tuple[str, int], bool] = {}


def _file_size(path: str) -> int:
    p = path[7:] if path.startswith("file://") else path
    try:
        return os.path.getsize(p)
    except OSError:
        return -1  # remote/unstat-able: fall back to name-only keying


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Unlock scan-side parallelism for single-file test fixtures.

    The driver testdata ships ONE parquet file with ONE row group per
    table, so the scan (and everything Catalyst collapses into it —
    projections, explodes, per-row hashing) runs as a SINGLE task no
    matter how many cores the session has. Parquet can only split at
    row-group boundaries, so no ``maxPartitionBytes`` setting helps. On
    a real corpus the file count provides the parallelism and this
    function is a structural no-op (the condition is false — no
    exchange appears in the plan); on the fixtures it pays one tiny
    round-robin shuffle of the raw scan output to put all cores to
    work.

    The split probe (``df.rdd.getNumPartitions()``) forces a
    DataFrame→RDD plan conversion on the driver, so its DECISION is
    memoized per (plan fingerprint, parallelism): repeated
    ``load_table`` calls in the same session (every registry query
    re-loads its tables) pay the conversion once. A file-count
    shortcut would NOT be a safe substitute — Spark bin-packs many
    small files into few input partitions and splits one big file into
    many, so the file count bounds nothing in either direction; only
    the planned partition count answers the question."""
    cache_key = (
        "\n".join(f"{f}:{_file_size(f)}" for f in sorted(df.inputFiles())),
        spark.sparkContext.defaultParallelism,
    )
    decision = _SPREAD_DECISIONS.get(cache_key)
    if decision is None:
        decision = df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
        _SPREAD_DECISIONS[cache_key] = decision
    if decision:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


# Memo of LOADED TABLE HANDLES (unexecuted logical plans), the
# process-local equivalent of a metastore's resolved-table cache:
# every load_table call otherwise pays parquet footer schema
# resolution plus a file listing (and, for spread tables, the
# _spread probe's listing again) — measured at 0.1-0.4 s per call,
# and the registry queries call it 1-3 times EACH, twice per bench
# pass. Keyed on (application, session conf identity via
# defaultParallelism, sf_dir, name, spread, file mtime+size) so a
# rewritten fixture or a different session re-resolves, and stored ON
# the owning SparkSession object (see load_table). This caches
# METADATA ONLY — a DataFrame is an immutable plan; every query
# execution still scans the parquet data from disk.


def _table_stamp(path: str) -> "tuple[int, int] | None":
    p = path[7:] if path.startswith("file://") else path
    try:
        st = os.stat(p)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, spread: bool = True
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    stamp = _table_stamp(os.path.join(sf_dir, f"{name}.parquet"))
    memo_key = None
    if stamp is not None:
        memo_key = (
            spark.sparkContext.applicationId,
            spark.sparkContext.defaultParallelism,
            sf_dir,
            name,
            spread,
            stamp,
        )
        # The memo lives ON the owning session object (ADVICE r13): a
        # DataFrame is bound to the SparkSession that built it, so a
        # hit served to a sibling session of the same application
        # would execute under the OWNER's conf (the events
        # nanosAsLong hazard). A per-session dict cannot alias across
        # sessions and dies with the session.
        memo = getattr(spark, "_graft_table_memo", None)
        if memo is None:
            memo = {}
            spark._graft_table_memo = memo
        hit = memo.get(memo_key)
        if hit is not None:
            if name == "events":
                # the reader conf must hold at EXECUTION time too
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return hit
    df = _load_table_uncached(spark, sf_dir, name, spread=spread)
    if memo_key is not None:
        memo[memo_key] = df
    return df


def _load_table_uncached(
    spark: SparkSession, sf_dir: str, name: str, *, spread: bool
) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
        # natively. Read nanos as long (dynamic legacy conf) and truncate
        # to microseconds — the same truncation DuckDB applies, so oracle
        # comparisons stay consistent.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Fixture generations vary: tz-naive parquet timestamp[us]
            # loads as TIMESTAMP_NTZ, which unix_micros/to_utc_timestamp
            # reject outright. Normalize to plain TIMESTAMP once here so
            # every downstream consumer sees one type; the session is
            # UTC-pinned (session.py) so the cast is numerically a no-op.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread and name in SPREAD_TABLES:
        return _spread(spark, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Silver-table layout: hive-style partition directories on the
    natural reporting key (SURVEY §4 physical-layout decision — the
    reference scans per (subject_type, collection_type) cell, so those
    are the partition columns). Readers filtering on the key scan only
    matching directories (PartitionFilters, zero data read elsewhere).

    Partition columns must be low-cardinality: at 100 TB a high-card
    key (user_id) would create millions of small files — use bucketing
    for those instead."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_by: str,
    n_buckets: int,
    sort_by: str | None = None,
    path: str | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles rows into ``n_buckets`` hash
    buckets on the join/agg key so repeated joins and aggregations on
    that key skip their exchange entirely (the scan reports the hash
    partitioning to the planner). This is the co-located-join layout
    for fact-fact joins at 100 TB — pay the shuffle once at write time.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def zorder_key(x: str, y: str, bits: int = 16) -> "DataFrame":
    """Morton (Z-order) key: bit-interleave two non-negative integer
    columns so that sorting by the key clusters rows that are close in
    BOTH dimensions — the multi-dimensional locality layout behind
    Delta/Iceberg OPTIMIZE ZORDER. A range/sort by one column clusters
    only that column; the Z-curve gives every conjunctive range filter
    (x BETWEEN … AND y BETWEEN …) a compact file-level min/max span,
    so data skipping prunes on both predicates.

    Pure int64 expression (shift/mask/sum over a literal sequence) —
    stays inside whole-stage codegen, no Python. Columns must fit in
    ``bits`` bits (truncate or bucketize wider domains first).
    """
    from pyspark.sql import functions as F

    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc"
        f" + shiftleft(shiftright(cast({x} as bigint), i) & 1, 2 * i)"
        f" + shiftleft(shiftright(cast({y} as bigint), i) & 1, 2 * i + 1))"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    x: str,
    y: str,
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered along the Z-curve of (x, y): range-
    partition on the Morton key (balanced files via sampled boundaries)
    and sort within partitions, so parquet row-group min/max stats on
    BOTH columns are tight and readers skip aggressively on either
    predicate. The key is dropped before writing — it is a layout
    artifact, not data.

    Each dimension is normalized to the ``bits``-bit grid
    automatically (affine min/max scaling off a broadcast 1-row
    aggregate; timestamps via epoch micros) — raw wide domains like
    epoch seconds would otherwise contribute only their cycling low
    bits and silently destroy the clustering (a raw ts key produced
    files spanning the FULL range of both columns; see
    tools/bench_zorder.py for the measured before/after). Min/max
    scaling keeps the map monotone under skew; rank-bucketize upstream
    if one dimension is pathologically heavy-tailed."""
    from pyspark.sql import functions as F

    def _numeric(c: str):
        dt = dict(df.dtypes)[c]
        col = F.col(c)
        if dt.startswith("timestamp"):
            col = F.unix_micros(col.cast("timestamp"))
        elif dt == "date":
            col = F.datediff(col, F.lit("1970-01-01"))
        return col.cast("double")

    xs, ys = _numeric(x), _numeric(y)
    mm = df.agg(
        F.min(xs).alias("__xmin"),
        F.max(xs).alias("__xmax"),
        F.min(ys).alias("__ymin"),
        F.max(ys).alias("__ymax"),
    )
    top = float(2**bits - 1)

    def _scaled(col, lo: str, hi: str):
        span = F.col(hi) - F.col(lo)
        return F.when(
            span > 0, F.floor((col - F.col(lo)) / span * F.lit(top)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))

    keyed = (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__zx", _scaled(xs, "__xmin", "__xmax"))
        .withColumn("__zy", _scaled(ys, "__ymin", "__ymax"))
        .withColumn("__z", zorder_key("__zx", "__zy", bits))
        .drop("__zx", "__zy", "__xmin", "__xmax", "__ymin", "__ymax")
    )
    keyed = (
        keyed.repartitionByRange(n_files, "__z")
        if n_files
        else keyed.repartitionByRange("__z")
    )
    keyed.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
