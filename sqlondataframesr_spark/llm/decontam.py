"""Benchmark decontamination: flag training documents that overlap an
evaluation set (n-gram contamination check).

North-star training-pipeline operator (no reference counterpart —
the reference is batch SQL only, RDataFramesSQL.Rmd:60-704). This is
the standard pre-training hygiene step: before training, remove any
corpus document sharing too many n-grams with the benchmark/eval set.

The "eval set" here is a deterministic pseudo-benchmark slice of
``documents`` (doc_id % 53 == 0) so the operator is self-contained and
oracle-checkable on the driver's tables; in production the eval set is
an external (small) table and the same plan applies unchanged.

Scale design: the eval set is tiny relative to the corpus (MBs vs
100 TB), so its distinct shingle set is **broadcast** — the corpus-side
shingle stream joins against an in-memory hash set on every executor,
no shuffle of corpus shingles at all. The only shuffle is the per-doc
overlap count (groupBy doc_id), which is partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..materialize import materialize
from ..catalog import load_table
from .dedup import _SHINGLES_SPARK_SQL, _SHINGLES_SQL, _with_shingles

#: flag a training doc when >= this fraction of its 3-shingles appear in the eval set
CONTAM_THRESHOLD = 0.2
#: deterministic pseudo-eval-set selector
EVAL_MOD = 53


def decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training document: distinct-3-shingle overlap with the eval
    slice, as (doc_id, n_shingles, n_overlap, overlap_ratio,
    contaminated). Training docs = doc_id % 53 != 0; docs with <3
    tokens have no shingles and are trivially clean (ratio 0).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shingled = _with_shingles(docs).transform(materialize)

    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_sh = (
        shingled.filter(is_eval)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train_sh = shingled.filter(~is_eval).select(
        "doc_id", F.explode("sh").alias("s")
    )
    overlap = (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    sizes = shingled.filter(~is_eval).select(
        "doc_id", F.size("sh").alias("n_shingles")
    )
    base = docs.filter(~is_eval).select("doc_id")
    return (
        base.join(sizes, "doc_id", "left")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_overlap", F.lit(0)).cast("double")
                    / F.col("n_shingles").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("overlap_ratio"),
        )
        .withColumn("contaminated", F.col("overlap_ratio") >= CONTAM_THRESHOLD)
        .orderBy("doc_id")
    )


DECONTAM_OVERLAP_ORACLE = f"""
WITH s AS ({_SHINGLES_SQL}),
eval_sh AS (
  SELECT DISTINCT unnest(sh) AS sh FROM s WHERE doc_id % {EVAL_MOD} = 0
),
train AS (SELECT doc_id, sh FROM s WHERE doc_id % {EVAL_MOD} != 0),
train_e AS (SELECT doc_id, unnest(sh) AS sh FROM train),
overlap AS (
  SELECT t.doc_id, COUNT(*) AS n_overlap
  FROM train_e t JOIN eval_sh e ON t.sh = e.sh
  GROUP BY t.doc_id
),
sizes AS (SELECT doc_id, len(sh) AS n_shingles FROM train)
SELECT d.doc_id,
       CAST(COALESCE(sz.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CASE WHEN COALESCE(sz.n_shingles, 0) > 0
            THEN ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE)
                       / CAST(sz.n_shingles AS DOUBLE), 6)
            ELSE 0.0 END AS overlap_ratio,
       (CASE WHEN COALESCE(sz.n_shingles, 0) > 0
             THEN ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE)
                        / CAST(sz.n_shingles AS DOUBLE), 6)
             ELSE 0.0 END) >= {CONTAM_THRESHOLD} AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {EVAL_MOD} != 0) d
LEFT JOIN sizes sz USING (doc_id)
LEFT JOIN overlap o USING (doc_id)
ORDER BY d.doc_id
"""


QUERIES = {"decontam_overlap": decontam_overlap}
ORACLES = {"decontam_overlap": DECONTAM_OVERLAP_ORACLE}

#: Spark-SQL ratio expression (shared by overlap_ratio and contaminated)
_RATIO_SPARK = """CASE WHEN COALESCE(sz.n_shingles, 0) > 0
            THEN ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE)
                       / CAST(sz.n_shingles AS DOUBLE), 6)
            ELSE 0.0D END"""

# Spark-SQL N-version form (fluent ≡ SQL, tests/test_reference_queries.py)
SPARK_SQL: dict[str, str] = {
    "decontam_overlap": f"""
WITH s AS ({_SHINGLES_SPARK_SQL}),
eval_sh AS (
  SELECT DISTINCT sx FROM (SELECT explode(sh) AS sx FROM s
                           WHERE doc_id % {EVAL_MOD} = 0)
),
train AS (SELECT doc_id, sh FROM s WHERE doc_id % {EVAL_MOD} != 0),
train_e AS (SELECT doc_id, explode(sh) AS sx FROM train),
overlap AS (
  SELECT t.doc_id, COUNT(1) AS n_overlap
  FROM train_e t JOIN eval_sh e ON t.sx = e.sx
  GROUP BY t.doc_id
),
sizes AS (SELECT doc_id, size(sh) AS n_shingles FROM train)
SELECT d.doc_id,
       CAST(COALESCE(sz.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       {_RATIO_SPARK} AS overlap_ratio,
       ({_RATIO_SPARK}) >= {CONTAM_THRESHOLD}D AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {EVAL_MOD} != 0) d
LEFT JOIN sizes sz USING (doc_id)
LEFT JOIN overlap o USING (doc_id)
ORDER BY d.doc_id
""",
}
