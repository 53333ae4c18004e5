"""Distributed exact global rank / prefix sum — the scale-safe
replacement for an unpartitioned ``Window.orderBy`` (VERDICT r9 item 1).

An unpartitioned ``row_number()`` / ``ntile()`` / running ``sum()``
window forces ``Exchange SinglePartition``: the WHOLE relation
serializes through one task's sort. Fine on a 15k-row dimension
aggregate; the single-task bottleneck at 10^8-10^9 rows (SCALE.md's
"global window" trap). This module computes the SAME exact rank in
three parallel steps, all JVM-side:

1. ``repartitionByRange(N, keys...)`` — range shuffle on the total
   order (every key list ends in a unique tie-break column, so the
   order is total and the rank deterministic); partition *i* holds a
   contiguous, disjoint key range, ranges ascending in *i*.
2. A per-partition count (and optional value sum) — one bounded
   aggregate of N rows — turned into per-partition rank/value OFFSETS
   with a broadcast ``b.pid < a.pid`` self-join (N^2 <= 1024 pairs;
   deliberately NOT an unpartitioned window, so the fix doesn't
   reintroduce the disease at toy size).
3. ``row_number()`` (and optional running sum) over
   ``Window.partitionBy(__pid)`` — N parallel sorts of ~1/N of the
   data — plus the broadcast offsets.

global_rank = within-partition rank + (rows in lower partitions);
global prefix sum likewise. Exactness: ranges are disjoint and ordered,
so offsets reconstruct the single sort's output bit-for-bit — the
oracle SQL keeps its plain ``row_number() OVER (ORDER BY ...)``.

The grand totals (row count / value sum) ride along as columns via a
1-row broadcast cross join (the repo's standard bounded-rows idiom),
so callers can express ``ntile``/share math without ``OVER ()``:
:func:`ntile_expr` maps (rank, n, k) to the exact SQL NTILE bucket.

Plan contract (pinned in tests/test_plans.py): the output plan contains
``Exchange rangepartitioning`` and NO Sort fed by
``Exchange SinglePartition`` — ``PlanAudit.has_single_task_sort`` is
False for every consumer.

Reference parity note: the reference (RDataFramesSQL.Rmd) has no
ranking surface at all; this backs the repo's extension operators
(concentration, journeys) per SURVEY.md north-star scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..materialize import materialize

__all__ = ["with_global_rank", "ntile_expr"]

#: temp column names (dropped before return)
_PID = "__drank_pid"
_CNT = "__drank_cnt"
_VSUM = "__drank_vsum"
_ROFF = "__drank_rank_off"
_VOFF = "__drank_cum_off"


def _order_cols(order_by: list[tuple[str, str]]) -> list[Column]:
    cols = []
    for name, direction in order_by:
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        c = F.col(name)
        cols.append(c.asc() if direction == "asc" else c.desc())
    return cols


def with_global_rank(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    *,
    rank_name: str = "g_rank",
    total_name: str = "g_n",
    value_col: str | None = None,
    cum_name: str = "g_cum",
    vtotal_name: str = "g_vtotal",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an exact 1-based global rank (``rank_name``) over the total
    order ``order_by`` (list of ``(column, "asc"|"desc")``; MUST end in
    a unique tie-break column for determinism), plus the grand row
    count (``total_name``). With ``value_col``: also the exact running
    sum including the current row (``cum_name``) and grand value total
    (``vtotal_name``), both bigint.

    No single-task sort: see module docstring for the plan shape.
    """
    spark = df.sparkSession
    npart = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    order = _order_cols(order_by)
    # PIN the range-shuffled frame: both consumers below (the offsets
    # aggregate and the ranking join) key on spark_partition_id(), and
    # pid labels are only consistent across consumers if both read the
    # SAME physical partitions. Without the pin that consistency hangs
    # on ReuseExchange firing — and under AQE the two duplicated
    # subtrees can be re-planned with DIFFERENT coalesced shuffle
    # reads, renumbering pids in one branch only (observed at sf0.1 on
    # the chained RFM ranks: single-level reuse held, nested reuse
    # did not). The cached RDD fixes partition identity structurally.
    # Memory contract: every consumer ranks a dimension-sized
    # aggregate (per-user / per-customer rows), never a fact table,
    # and the pin is MEMORY_AND_DISK (spills, lineage preserved).
    sdf = materialize(
        df.repartitionByRange(npart, *order).withColumn(
            _PID, F.spark_partition_id()
        )
    )

    aggs = [F.count(F.lit(1)).cast("long").alias(_CNT)]
    if value_col is not None:
        aggs.append(F.sum(value_col).cast("long").alias(_VSUM))
    counts = sdf.groupBy(_PID).agg(*aggs)

    # Per-partition offsets: broadcast inequality self-join on the
    # bounded counts table (npart rows), NOT an unpartitioned window.
    b_cols = [F.col(_PID).alias("__b_pid"), F.col(_CNT).alias("__b_cnt")]
    if value_col is not None:
        b_cols.append(F.col(_VSUM).alias("__b_vsum"))
    lower = counts.select(*b_cols)
    off_aggs = [F.coalesce(F.sum("__b_cnt"), F.lit(0)).cast("long").alias(_ROFF)]
    group_keys = [_PID]
    if value_col is not None:
        off_aggs.append(
            F.coalesce(F.sum("__b_vsum"), F.lit(0)).cast("long").alias(_VOFF)
        )
    offsets = (
        counts.join(F.broadcast(lower), F.col("__b_pid") < F.col(_PID), "left")
        .groupBy(*group_keys)
        .agg(*off_aggs)
    )

    tot_aggs = [F.sum(_CNT).cast("long").alias(total_name)]
    if value_col is not None:
        tot_aggs.append(F.sum(_VSUM).cast("long").alias(vtotal_name))
    totals = counts.agg(*tot_aggs)

    w = Window.partitionBy(_PID).orderBy(*order)
    out = (
        sdf.join(F.broadcast(offsets), _PID)
        .withColumn(
            rank_name,
            (F.row_number().over(w).cast("long") + F.col(_ROFF)).cast("long"),
        )
    )
    if value_col is not None:
        out = out.withColumn(
            cum_name,
            (
                F.sum(value_col)
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("long")
                + F.col(_VOFF)
            ).cast("long"),
        )
    out = out.crossJoin(F.broadcast(totals))
    drop = [_PID, _ROFF] + ([_VOFF] if value_col is not None else [])
    return out.drop(*drop)


def ntile_expr(rank_col: str, n_col: str, k: int) -> Column:
    """Exact SQL ``NTILE(k)`` bucket from a 1-based global rank and the
    total row count: the first ``n % k`` buckets get ``ceil(n/k)``
    rows, the rest ``floor(n/k)`` — identical to Spark's and DuckDB's
    NTILE over the same total order. bigint, 1-based.
    """
    i, n = rank_col, n_col
    q = f"({n} div {k})"
    r = f"({n} % {k})"
    return F.expr(
        f"cast(case when {i} <= {r} * ({q} + 1) "
        f"then ({i} - 1) div ({q} + 1) + 1 "
        f"else {r} + 1 + ({i} - {r} * ({q} + 1) - 1) div {q} end as bigint)"
    )
