"""Activity concentration over ``events``: Pareto deciles and the Gini
coefficient, both in exact integer arithmetic.

North-star extension (no reference counterpart): the "do 10% of users
generate 90% of traffic?" questions — the measurement side of the
skew story that `operators/salt` handles mechanically.

Scale design (100 TB): both operators reduce events to ONE row per
user in a single partial-aggregated shuffle; the decile `ntile` and
the Gini rank then run over the user-level aggregate (the same
dimension-sized single-task-sort trade documented for
`journeys.cust_rfm_segments`; the approximate path at extreme user
counts is `percentile_approx` breakpoints).

Determinism: shares are integer ppm; the Gini numerator
``2*Σ(i·x_i) − (n+1)·Σx`` is exact bigint with a documented range
contract — |Σ(i·x_i)| ≤ n²·avg(x), inside int64 through ~3·10^7 users
at ~10^4 events each; beyond that compute the ratio in double as an
approximation (the rank sum, not the data, is what overflows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table

#: Pareto bucket count (deciles)
N_DECILES = 10


def _per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def evt_activity_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users bucketed into activity deciles (1 = most active): per
    decile the user count, event count, and share of all events in
    integer ppm.

    Output: (decile, n_users, n_events, share_ppm) ordered by decile.
    """
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    bucketed = _per_user(spark, sf_dir).select(
        F.ntile(N_DECILES).over(w).cast("long").alias("decile"), "n_events"
    )
    per_decile = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
    return per_decile.select(
        "decile",
        "n_users",
        "n_events",
        F.expr("n_events * 1000000L div sum(n_events) over ()")
        .cast("long")
        .alias("share_ppm"),
    ).orderBy("decile")


_DECILES_BODY = f"""
  WITH per_user AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
  ),
  bucketed AS (
    SELECT CAST(NTILE({N_DECILES}) OVER
             (ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS decile,
           n_events
    FROM per_user
  ),
  per_decile AS (
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM bucketed GROUP BY decile
  )
  SELECT decile, n_users, n_events,
         CAST(n_events * 1000000 {{DIV}} SUM(n_events) OVER () AS BIGINT)
           AS share_ppm
  FROM per_decile
  ORDER BY decile
"""

EVT_ACTIVITY_DECILES_ORACLE = _DECILES_BODY.format(DIV="//")
EVT_ACTIVITY_DECILES_SPARK_SQL = _DECILES_BODY.format(DIV="div")


def evt_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts, exact to 6 decimal
    places: ``gini_ppm = (2*Σ(i·x_i) − (n+1)·Σx) · 10^6 div (n·Σx)``
    with i = ascending rank (ties broken by user_id — the rank-sum
    formula is tie-break-invariant because tied x contribute the same
    total either way).

    Output: ONE row (n_users, total_events, gini_ppm).
    """
    w = Window.orderBy(F.col("n_events").asc(), F.col("user_id").asc())
    ranked = _per_user(spark, sf_dir).select(
        F.row_number().over(w).cast("long").alias("i"), "n_events"
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.expr(
            "cast((2 * sum(i * n_events) - (count(1) + 1) * sum(n_events))"
            " * 1000000 div (count(1) * sum(n_events)) as bigint)"
        ).alias("gini_ppm"),
    )


_GINI_BODY = """
  WITH per_user AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
  ),
  ranked AS (
    SELECT CAST(row_number() OVER
             (ORDER BY n_events ASC, user_id ASC) AS BIGINT) AS i, n_events
    FROM per_user
  )
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(n_events) AS BIGINT) AS total_events,
         CAST((2 * SUM(i * n_events) - (COUNT(*) + 1) * SUM(n_events))
              * 1000000 {DIV} (COUNT(*) * SUM(n_events)) AS BIGINT)
           AS gini_ppm
  FROM ranked
"""

EVT_ACTIVITY_GINI_ORACLE = _GINI_BODY.format(DIV="//")
EVT_ACTIVITY_GINI_SPARK_SQL = _GINI_BODY.format(DIV="div")


QUERIES = {
    "evt_activity_deciles": evt_activity_deciles,
    "evt_activity_gini": evt_activity_gini,
}
ORACLES = {
    "evt_activity_deciles": EVT_ACTIVITY_DECILES_ORACLE,
    "evt_activity_gini": EVT_ACTIVITY_GINI_ORACLE,
}
SPARK_SQL = {
    "evt_activity_deciles": EVT_ACTIVITY_DECILES_SPARK_SQL,
    "evt_activity_gini": EVT_ACTIVITY_GINI_SPARK_SQL,
}
