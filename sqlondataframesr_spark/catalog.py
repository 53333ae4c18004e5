"""Table loading + temp-view registration.

The reference's sqldf auto-imports any data.frame named inside the SQL
string into its embedded engine (RDataFramesSQL.Rmd:75, 176, ...); the
Spark-native analogue is loading each parquet table lazily and
registering it as a temp view so both the fluent API and ``spark.sql``
resolve the same catalog — no copy happens until an action runs.

Scale notes (100 TB posture):

- Loads are plain ``spark.read.parquet`` — predicate pushdown, column
  pruning and partition pruning all happen at the scan, so "load then
  query" costs nothing extra versus hand-fused reads.
- ``BROADCAST_TABLES`` lists the dimensions whose size is *bounded by
  the schema*, not the scale factor (region: 5 rows, nation: 25 rows
  — fixed in TPC-H at any SF). Queries wrap these in
  ``F.broadcast`` so their joins never shuffle the fact side.
  customer/supplier/part grow with SF and are NOT broadcast —
  Catalyst/AQE decides from observed sizes instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import session as _session

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

#: Dimensions with schema-bounded cardinality — safe to broadcast at
#: ANY scale factor (TPC-H fixes region=5, nation=25 independent of SF).
BROADCAST_TABLES = frozenset({"region", "nation"})


#: (applicationId, sf_dir, name) -> DataFrame. Caches the *analyzed
#: relation* (file listing + schema), not data — Spark still scans
#: parquet lazily per action. Keyed by applicationId so a stopped
#: session's stale plans are never reused.
_table_cache: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, canonicalizing types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects; with ``nanosAsLong`` it arrives as int64 nanos and
    we convert to a microsecond timestamp (exactly what DuckDB stores,
    so differential checks see identical instants).
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _table_cache.get(key)
    if cached is not None:
        return cached
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception:
        # Externally-created session (e.g. the driver's) without our
        # confs: apply them and retry once.
        _session.configure(spark)
        df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — float division loses precision at 1e18 nanos
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    _table_cache[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table as a temp view (the sqldf-import analogue)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
