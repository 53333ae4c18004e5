"""Entity resolution (blocked fuzzy self-join) and item-item
collaborative filtering — the two record-linkage workloads a curation
team runs on a 100 TB catalog.

North-star extensions (no reference counterpart — RDataFramesSQL.Rmd
has no fuzzy matching or recommender surface; SURVEY.md §2 north-star
scope). Related: the text near-dup family in llm/dedup.py does
*document* linkage by content; this module links *entities* by name
and *items* by co-occurrence.

Scale design (100 TB):

- ``er_customer_pairs`` — the classic blocking decomposition: candidate
  pairs are generated ONLY within a blocking key
  ``(c_nationkey, c_mktsegment)``, so the quadratic blow-up is bounded
  per block (b rows → b²/2 pairs) instead of corpus-wide. The join is
  an equi-join on the block key (shuffle- or broadcast-hash, Catalyst's
  choice) with the `a.key < b.key` dedup and the Levenshtein threshold
  applied as post-join filters — `.explain` shows the equi-keys in the
  join condition, NOT a cartesian product. At 1000× data, blocks grow
  linearly, so per-block pairs grow quadratically: the documented
  escape is a finer block key (append a name-prefix bucket), the same
  knob every ER system exposes. Levenshtein runs JVM-side
  (whole-stage codegen), never in Python.
- ``rec_item_cosine`` — user×item counts reduce first (partial-agg
  shuffle keyed (user_id, event_type) moves pre-aggregated rows, not
  raw events), then the pair join runs on the REDUCED relation (≤
  |items| rows per user) and collapses straight to the |items|²
  cosine matrix. The norm join joins a |items|-row frame — broadcast.

Determinism: Levenshtein is the classic unit-cost edit distance in
both engines (exact INT). Cosines are computed from exact BIGINT
dot/norm sums with one IEEE-754 expression —
``dot / (sqrt(na) * sqrt(nb))`` — where /, *, sqrt are all correctly
rounded, so Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..materialize import materialize, spread_scan
from .components import min_label_components
from ..functions.closure_sql import packed_closure_sql

#: max edit distance for a candidate match
ER_MAX_DISTANCE = 2

#: top-k emitted match pairs
ER_TOP_K = 100


def er_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate duplicate customers: pairs inside the same
    (nation, mktsegment) block whose names are within edit distance
    2. Top-100 by (distance, custkey_a, custkey_b) — deterministic,
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    # single-row-group dim parquet = 1 split: without the spread the
    # whole blocked pair space (~1M Levenshtein evals at sf0.1) lands
    # in ONE probe task (materialize.spread_scan, SCALE.md r4)
    a = spread_scan(c).alias("a")
    b = c.alias("b")
    lev = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.c_nationkey") == F.col("b.c_nationkey"),
                F.col("a.c_mktsegment") == F.col("b.c_mktsegment"),
                F.col("a.c_custkey") < F.col("b.c_custkey"),
            ],
        )
        .filter(lev <= ER_MAX_DISTANCE)
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_nationkey").alias("nationkey"),
            F.col("a.c_mktsegment").alias("mktsegment"),
            lev.cast("long").alias("name_distance"),
        )
    )
    return pairs.orderBy("name_distance", "custkey_a", "custkey_b").limit(ER_TOP_K)


def _match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNCAPPED threshold match pairs (the top-k cap in
    er_customer_pairs is presentation; clustering needs every edge)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    a = spread_scan(c).alias("a")
    b = c.alias("b")
    lev = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            on=[
                F.col("a.c_nationkey") == F.col("b.c_nationkey"),
                F.col("a.c_mktsegment") == F.col("b.c_mktsegment"),
                F.col("a.c_custkey") < F.col("b.c_custkey"),
            ],
        )
        .filter(lev <= ER_MAX_DISTANCE)
        .select(
            F.col("a.c_custkey").alias("ka"), F.col("b.c_custkey").alias("kb")
        )
    )


def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ER pipeline's last mile: transitive closure of the
    match pairs -> one entity id per customer (min custkey of the
    component) plus the entity size. Iterative min-label propagation
    (operators/components.py) vs the oracle's FULL recursive closure —
    same iterative-vs-closure differential as dedup_clusters.

    Output: (custkey, entity_id, entity_size), one row per customer,
    ordered by custkey."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    pairs = _match_pairs(spark, sf_dir)
    # pin the edge list: every propagation round joins it, and without
    # the persist each round would recompute the blocked Levenshtein
    # self-join (measured 6 s/round -> ~1 s/round at sf0.1)
    edges = (
        pairs.select(F.col("ka").alias("src"), F.col("kb").alias("dst"))
        .union(pairs.select(F.col("kb").alias("src"), F.col("ka").alias("dst")))
        .transform(materialize)
    )
    labels = min_label_components(
        cust.select(F.col("c_custkey").alias("node")), edges
    )
    sized = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("entity_size")
    )
    return (
        labels.join(sized, "label")
        .select(
            F.col("node").alias("custkey"),
            F.col("label").alias("entity_id"),
            "entity_size",
        )
        .orderBy("custkey")
    )


def rec_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity between
    event types over the user × event_type count matrix. Output: one
    row per unordered item pair (≤ |items|² / 2), ordered."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    ui = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    norms = ui.groupBy("event_type").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("nrm")
    )
    a = ui.alias("a")
    b = ui.alias("b")
    dots = (
        a.join(
            b,
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("a.event_type") < F.col("b.event_type"),
            ],
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("dot"))
    )
    na = norms.alias("na")
    nb = norms.alias("nb")
    # one IEEE expression, mirrored verbatim in the oracle: each of
    # /, *, sqrt is correctly rounded, so the doubles are bit-identical
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("na.nrm").cast("double"))
        * F.sqrt(F.col("nb.nrm").cast("double"))
    )
    return (
        dots.join(F.broadcast(na), F.col("na.event_type") == F.col("item_a"))
        .join(F.broadcast(nb), F.col("nb.event_type") == F.col("item_b"))
        .select("item_a", "item_b", "dot", cosine.alias("cosine"))
        .orderBy("item_a", "item_b")
    )


ER_PAIRS_ORACLE = f"""
SELECT a.c_custkey AS custkey_a,
       b.c_custkey AS custkey_b,
       a.c_nationkey AS nationkey,
       a.c_mktsegment AS mktsegment,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_distance
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_DISTANCE}
ORDER BY name_distance, custkey_a, custkey_b
LIMIT {ER_TOP_K}
"""

REC_COSINE_ORACLE = """
WITH ui AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY user_id, event_type
),
norms AS (
    SELECT event_type, CAST(SUM(cnt * cnt) AS BIGINT) AS nrm
    FROM ui
    GROUP BY event_type
),
dots AS (
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
    FROM ui a
    JOIN ui b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT d.item_a, d.item_b, d.dot,
       CAST(d.dot AS DOUBLE)
         / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
         AS cosine
FROM dots d
JOIN norms na ON na.event_type = d.item_a
JOIN norms nb ON nb.event_type = d.item_b
ORDER BY d.item_a, d.item_b
"""

ER_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
    SELECT a.c_custkey AS ka, b.c_custkey AS kb
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_DISTANCE}
),
edges AS (
    SELECT ka AS src, kb AS dst FROM pairs
    UNION
    SELECT kb AS src, ka AS dst FROM pairs
),
reach(src, dst) AS (
    SELECT c_custkey, c_custkey FROM customer
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
clusters AS (
    SELECT src AS custkey, MIN(dst) AS entity_id FROM reach GROUP BY src
)
SELECT c.custkey, c.entity_id, cs.entity_size
FROM clusters c
JOIN (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS entity_size
      FROM clusters GROUP BY entity_id) cs USING (entity_id)
ORDER BY c.custkey
"""

#: Spark-SQL dual of :func:`er_entity_clusters` (VERDICT r10 item 5):
#: the bounded-round packed-array hash-to-min closure, generated by
#: the shared helper (functions/closure_sql.py — r12 generalized this
#: file's original unroll so the label-propagation family shares one
#: audited spelling). Poisons every id to -1 on non-convergence.
ER_CLUSTERS_SPARK_SQL = packed_closure_sql(
    prelude=f"""pairs AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb
  FROM customer a
  JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_DISTANCE}),
edges AS (
  SELECT ka AS src, kb AS dst FROM pairs
  UNION ALL
  SELECT kb AS src, ka AS dst FROM pairs)""",
    nodes_sql="SELECT c_custkey AS node FROM customer",
    key_name="custkey",
    id_name="entity_id",
    size_name="entity_size",
)

QUERIES = {
    "er_customer_pairs": er_customer_pairs,
    "er_entity_clusters": er_entity_clusters,
    "rec_item_cosine": rec_item_cosine,
}

ORACLES = {
    "er_customer_pairs": ER_PAIRS_ORACLE,
    "er_entity_clusters": ER_CLUSTERS_ORACLE,
    "rec_item_cosine": REC_COSINE_ORACLE,
}

# Spark-SQL duals: the pair/cosine oracle text is fully
# dialect-portable (levenshtein, sqrt, CAST) — the same string runs on
# both engines. er_entity_clusters' dual is the bounded-round unrolled
# closure (Spark 4's recursive CTE supports only UNION ALL —
# UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — which on a cyclic edge list
# never terminates; the unroll + poison-on-nonconvergence flag closes
# the gap instead, VERDICT r10 item 5).
SPARK_SQL = {
    "er_customer_pairs": ER_PAIRS_ORACLE,
    "er_entity_clusters": ER_CLUSTERS_SPARK_SQL,
    "rec_item_cosine": REC_COSINE_ORACLE,
}
