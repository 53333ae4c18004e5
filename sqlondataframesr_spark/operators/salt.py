"""Key-salting — the manual fix for shuffle-join skew.

AQE's skew-join splitting (on in our sessions) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins with statistics; when one key holds a double-digit
percentage of a 100 TB fact table (the null-key, the default-value
key, the bot user), pre-salting is the deterministic fix:

- the FACT side gets a salt column in [0, n): any cheap spread over
  rows of the same key (here: hash of the whole row mod n, so it is
  deterministic and needs no unique column);
- the DIM side is replicated n times (explode of a 0..n-1 sequence);
- the join runs on (key, salt) — the hot key's rows now land in n
  shuffle partitions instead of one.

Cost model: dim side grows n-fold (keep n small, 8-32, and the dim
side the smaller one); fact side is unchanged. Result is row-for-row
identical to the unsalted join — pinned by the test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | None = None,
    keys: list[str] | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` (skewed, large) with ``dim`` (small) spreading
    each fact key over ``n_salts`` shuffle buckets.

    Pass ``keys`` for same-named join columns. The salt is
    deterministic (xxhash64 of the full fact row mod n), so results
    are reproducible run to run.
    """
    if keys is None:
        raise ValueError("salted_join requires same-named join keys via keys=[...]")
    if how not in {"inner", "left", "left_outer", "leftsemi", "left_semi", "left_anti"}:
        # right/full outer would emit unmatched dim rows once PER SALT
        raise ValueError(f"salted_join does not preserve {how} join semantics")
    fact_s = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    dim_s = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [*keys, SALT_COL], how).drop(SALT_COL)


def two_phase_count_distinct(
    df: DataFrame, keys: list[str], value: str
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, as two cheap aggregates.

    A direct ``countDistinct`` keeps a per-key value SET through the
    shuffle — map-side partials barely reduce, and a hot key
    concentrates its whole value universe on one reducer. The standard
    scale rewrite:

    1. ``groupBy(keys, value)`` — dedup rides a shuffle keyed on
       (key, VALUE), so a hot key's values spread across the cluster
       (the value acts as a natural salt);
    2. ``groupBy(keys).count()`` — counting the now-distinct rows; the
       second shuffle carries one row per (key, value), already tiny.

    Identical output to ``countDistinct`` (tested): NULL values are
    dropped before the first aggregate, matching COUNT(DISTINCT)'s
    NULL-skipping semantics. Use when keys are few/hot and values are
    many. For merely-approximate needs, ``approx_count_distinct``
    (q22) beats both.
    """
    return (
        df.filter(F.col(value).isNotNull())
        .groupBy(*keys, value)
        .agg(F.lit(1))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{value}"))
    )


def evt_distinct_users_2phase(spark, sf_dir: str) -> DataFrame:
    from ..catalog import load_table

    return two_phase_count_distinct(
        load_table(spark, sf_dir, "events"), ["event_type"], "user_id"
    ).orderBy("event_type")


EVT_DISTINCT_USERS_2PHASE_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES = {"evt_distinct_users_2phase": evt_distinct_users_2phase}
ORACLES = {"evt_distinct_users_2phase": EVT_DISTINCT_USERS_2PHASE_ORACLE}
SPARK_SQL = {"evt_distinct_users_2phase": EVT_DISTINCT_USERS_2PHASE_ORACLE}
