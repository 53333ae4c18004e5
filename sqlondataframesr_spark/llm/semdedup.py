"""SemDeDup — semantic deduplication via cluster-then-compare
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540).

North-star training-pipeline operator (the reference,
RDataFramesSQL.Rmd:60-704, has no vector surface at all). The published
recipe: k-means the corpus embeddings, then compare pairs ONLY within
a cluster and drop all but one of each semantic-duplicate group. The
clustering is what kills the all-pairs O(n^2): with K clusters the
pair space is sum(n_k^2) ~ n^2/K, and K is chosen to grow with the
corpus (the paper runs 50k clusters on LAION) so per-cluster work
stays bounded.

Pipeline here = :func:`~.similarity.kmeans_train`'s unrolled Lloyd
codebook (KM_K clusters, deterministic init/tie-breaks) feeding a
within-cluster pair scorer. Keep-policy: a vector is a duplicate iff
some SMALLER-id member of its cluster matches at >= TAU cosine;
``dup_of`` names the smallest such keeper (-1 for keepers — no NULLs,
so harness row-sorting never compares None). Note the policy is
one-hop, not transitive-closure: b may be dropped as a dup of a
while c is dropped as a dup of b — exactly the paper's per-pair
epsilon-dedup, and deterministic on any engine.

Scale (100 TB posture): training is KM_ITERS corpus scans with one
K-group aggregate each (see kmeans_train); assignment is a broadcast
of K tiny centroid rows (no corpus shuffle); the pair join shuffles
the corpus ONCE keyed on the cluster id, and AQE's skew-join splits
oversized clusters. The quadratic term lives only inside a cluster —
capacity-planned via K, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..materialize import materialize
from .similarity import (
    KM_ITERS,
    _COS,
    _COS_DUCK,
    _assign_lists,
    _kmeans_centroids,
    _kmeans_parts,
    _kmeans_spark_parts,
    _vectors,
)

#: semantic-duplicate cosine threshold (the paper's epsilon)
TAU = 0.4


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per vector: its trained cluster, whether it is a semantic
    duplicate, and the keeper it duplicates.

    Output: (vec_id, c_id, is_dup, dup_of) — dup_of = smallest
    smaller-id cluster-mate with cosine >= TAU, else -1.
    """
    vec = _vectors(spark, sf_dir).transform(materialize)
    cent = _kmeans_centroids(vec).select("c_id", "cv", "cn")
    asg = _assign_lists(vec, cent, "vec_id")
    # members feeds both sides of the pair join — pin it so training
    # and assignment run once, not per join branch
    members = materialize(
        vec.join(asg, "vec_id").select("vec_id", "list_id", "v", "nrm")
    )
    a = members.select(
        F.col("vec_id").alias("a_id"),
        F.col("list_id").alias("a_list"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = members.select(
        F.col("vec_id").alias("b_id"),
        F.col("list_id").alias("b_list"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dup = (
        a.join(
            b,
            (F.col("a_list") == F.col("b_list")) & (F.col("a_id") < F.col("b_id")),
        )
        .filter(
            F.expr(_COS.format(a="va", b="vb", na="na", nb="nb")) >= F.lit(TAU)
        )
        .groupBy(F.col("b_id").alias("vec_id"))
        .agg(F.min("a_id").alias("dup_of"))
    )
    return (
        members.select("vec_id", "list_id")
        .join(dup, "vec_id", "left")
        .select(
            "vec_id",
            F.col("list_id").alias("c_id"),
            F.col("dup_of").isNotNull().alias("is_dup"),
            F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
        )
        .orderBy("vec_id")
    )


def _final_assign_sql(cos_tpl: str) -> str:
    """Assignment of every vector to the trained codebook (CTE text,
    dialect-parametrized by the cosine template)."""
    cos = cos_tpl.format(a="vec.v", b="cent.cv", na="vec.nrm", nb="cent.cn")
    return f"""fa AS (
  SELECT vec_id, c_id AS list_id FROM (
    SELECT vec.vec_id, cent.c_id,
           row_number() OVER (PARTITION BY vec.vec_id
                              ORDER BY {cos} DESC, cent.c_id) AS arnk
    FROM vec CROSS JOIN cent) WHERE arnk = 1),
m AS (SELECT vec.vec_id, fa.list_id, vec.v, vec.nrm
      FROM vec JOIN fa USING (vec_id))"""


def _semdedup_tail(cos_tpl: str) -> str:
    cos = cos_tpl.format(a="a.v", b="b.v", na="a.nrm", nb="b.nrm")
    return f"""pairs AS (
  SELECT b.vec_id, a.vec_id AS keeper
  FROM m a JOIN m b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
  WHERE {cos} >= {TAU}),
dup AS (SELECT vec_id, MIN(keeper) AS dup_of FROM pairs GROUP BY vec_id)
SELECT m.vec_id, m.list_id AS c_id,
       dup.dup_of IS NOT NULL AS is_dup,
       CAST(COALESCE(dup.dup_of, -1) AS BIGINT) AS dup_of
FROM m LEFT JOIN dup USING (vec_id)
ORDER BY m.vec_id"""


def _semdedup_oracle() -> str:
    return (
        "WITH "
        + ",\n".join(_kmeans_parts())
        + f",\ncent AS (SELECT c_id, cv, cn FROM c{KM_ITERS}),\n"
        + _final_assign_sql(_COS_DUCK)
        + ",\n"
        + _semdedup_tail(_COS_DUCK)
    )


def _semdedup_spark_sql() -> str:
    return (
        "WITH "
        + ",\n".join(_kmeans_spark_parts())
        + f",\ncent AS (SELECT c_id, cv, cn FROM c{KM_ITERS}),\n"
        + _final_assign_sql(_COS)
        + ",\n"
        + _semdedup_tail(_COS)
    )


QUERIES = {"semdedup": semdedup}
ORACLES = {"semdedup": _semdedup_oracle()}
SPARK_SQL: dict[str, str] = {"semdedup": _semdedup_spark_sql()}
