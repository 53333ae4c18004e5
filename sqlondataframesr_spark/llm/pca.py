"""Distributed PCA: the top principal component of the embedding
covariance by power iteration — the dimensionality probe a curation
team runs before choosing projection/compression parameters (random
projection, PQ codebooks, matryoshka prefix dims all assume they know
where the variance lives).

North-star extension (no reference counterpart — RDataFramesSQL.Rmd
has no linear-algebra surface). Related: emb_random_projection
compresses with a FIXED basis; this operator finds the data's OWN
leading direction. The eigensolve itself is the Markov-attribution
idiom (operators/journeys.py): distill to a bounded matrix, then
log₂-many truncated matrix squarings instead of a long sequential
chain.

Algorithm (all exact integers):

1. int8-quantize each vector (the emb_quantize_int8 floor(x·s+0.5)
   spelling — half-up on every engine).
2. ONE pass computes the sufficient statistics: per-dim sums Σq_a and
   the flattened pairwise-product sums Σq_a·q_b (4096 map-side values
   per row, partial-aggregated to DIM² keys — no shuffle of row-scale
   data, no join of the exploded corpus).
3. Scatter matrix C = n·Σq_aq_b − Σq_a·Σq_b (×n² covariance — exact,
   no mean truncation), rescaled to ppm of max|C|.
4. Three rescaled truncated squarings give B^8; the component is
   B^8 · 1 (row sums), L1-normalized to ppm.

Signed-truncation contract: DuckDB ``//`` FLOORS while Spark ``div``
truncates toward zero — they disagree on negatives, and covariance
entries ARE negative. Every division here goes through the sign-split
form sign(x)·(|x| div d), on which both engines agree exactly.

Scale (100 TB): the corpus is touched ONCE (map-side product fan,
DIM² aggregate keys); everything downstream — the DIM² scatter
matrix, the three squaring joins, the normalization — is bounded by
the embedding dimension, not the row count.

Output: (dim, loading_ppm) — DIM rows ordered by dim; loadings sum to
±10⁶ in absolute value (L1-normalized, truncation dust aside).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..materialize import materialize

#: embedding dimensionality of the testdata embeddings table
PCA_DIM = 64

#: rescale unit for the matrix entries (ppm)
_U = 1_000_000


def _tdiv_spark(x: str, d: str) -> str:
    """Truncate-toward-zero division, sign-split so Spark ``div``
    (trunc) and DuckDB ``//`` (floor) compute the same value."""
    return f"(CASE WHEN {x} >= 0 THEN ({x}) div ({d}) ELSE -((-({x})) div ({d})) END)"


def _tdiv_duck(x: str, d: str) -> str:
    return f"(CASE WHEN {x} >= 0 THEN ({x}) // ({d}) ELSE -((-({x})) // ({d})) END)"


_Q8_SPARK = (
    "transform(v, x -> cast(floor(x * (CASE WHEN maxabs > 0"
    " THEN 127.0 / maxabs ELSE 0.0 END) + 0.5) as bigint))"
)


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the int8-quantized embeddings (see
    module docstring for the exact-integer contract).

    Output: (dim, loading_ppm) ordered by dim (1-based)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q8 = materialize(
        emb.select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
        .withColumn("maxabs", F.expr("array_max(transform(v, x -> abs(x)))"))
        .selectExpr("vec_id", f"{_Q8_SPARK} as q")
    )
    n = q8.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = (
        q8.select(F.posexplode("q").alias("a0", "qa"))
        .groupBy("a0")
        .agg(F.sum("qa").cast("long").alias("s"))
    )
    prod = (
        q8.select(
            F.posexplode(
                F.expr("flatten(transform(q, x -> transform(q, y -> x * y)))")
            ).alias("pos", "p")
        )
        .groupBy("pos")
        .agg(F.sum("p").cast("long").alias("sp"))
    )
    c = (
        prod.selectExpr(
            f"pos div {PCA_DIM} as a0", f"pmod(pos, {PCA_DIM}) as b0", "sp"
        )
        .join(F.broadcast(s.selectExpr("a0", "s as sa")), "a0")
        .join(F.broadcast(s.selectExpr("a0 as b0", "s as sb")), "b0")
        .crossJoin(F.broadcast(n))
        .selectExpr("a0 + 1 as a", "b0 + 1 as b", "n * sp - sa * sb as cv")
    )

    def rescale(m: DataFrame, col: str) -> DataFrame:
        mx = m.agg(F.max(F.expr(f"abs({col})")).alias("mx"))
        return m.crossJoin(F.broadcast(mx)).selectExpr(
            "a",
            "b",
            _tdiv_spark(f"{col} * {_U}", "nullif(mx, 0)") + " as p",
        )

    b1 = materialize(rescale(c, "cv"))

    def square(m: DataFrame) -> DataFrame:
        x = m.selectExpr("a", "b as k", "p as pa")
        y = m.selectExpr("a as k_", "b", "p as pb")
        mm = (
            x.join(F.broadcast(y), F.col("k") == F.col("k_"))
            .selectExpr("a", "b", _tdiv_spark("pa * pb", str(_U)) + " as m")
            .groupBy("a", "b")
            .agg(F.sum("m").cast("long").alias("raw"))
        )
        return materialize(rescale(mm, "raw"))

    b8 = square(square(square(b1)))
    v = b8.groupBy("a").agg(F.sum("p").cast("long").alias("v"))
    l1 = v.agg(F.sum(F.expr("abs(v)")).cast("long").alias("l1"))
    return (
        v.crossJoin(F.broadcast(l1))
        .selectExpr(
            "a as dim",
            _tdiv_spark(f"v * {_U}", "nullif(l1, 0)") + " as loading_ppm",
        )
        .orderBy("dim")
    )


def _pca_sql(tdiv, div: str) -> str:
    """The oracle runs the SAME chain but builds the product sums via
    an exploded self-join (a second implementation of step 2 — the
    N-version discipline)."""
    sq_ctes = []
    prev = "b1"
    for name in ("b2", "b4", "b8"):
        sq_ctes.append(f"""
{name}_raw AS MATERIALIZED (
  SELECT x.a, y.b, CAST(SUM({tdiv("x.p * y.p", str(_U))}) AS BIGINT) AS raw
  FROM {prev} x JOIN {prev} y ON x.b = y.a
  GROUP BY x.a, y.b
),
{name} AS MATERIALIZED (
  SELECT a, b,
         {tdiv(f"raw * {_U}", f"nullif((SELECT MAX(abs(raw)) FROM {name}_raw), 0)")}
           AS p
  FROM {name}_raw
)""")
        prev = name
    return f"""
WITH q8 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * (CASE WHEN
                 list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0
               THEN 127.0 / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))
               ELSE 0.0 END) + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
long_ AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(q, 1) AS a, unnest(q) AS qa FROM q8
),
nrow AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q8),
s AS MATERIALIZED (SELECT a, CAST(SUM(qa) AS BIGINT) AS s FROM long_ GROUP BY a),
prod AS MATERIALIZED (
  SELECT x.a, y.a AS b, CAST(SUM(x.qa * y.qa) AS BIGINT) AS sp
  FROM long_ x JOIN long_ y USING (vec_id)
  GROUP BY x.a, y.a
),
c AS MATERIALIZED (
  SELECT p.a, p.b, nrow.n * p.sp - sa.s * sb.s AS cv
  FROM prod p
  JOIN s sa ON sa.a = p.a
  JOIN s sb ON sb.a = p.b
  CROSS JOIN nrow
),
b1 AS MATERIALIZED (
  SELECT a, b,
         {tdiv(f"cv * {_U}", "nullif((SELECT MAX(abs(cv)) FROM c), 0)")} AS p
  FROM c
),{",".join(sq_ctes)},
v AS MATERIALIZED (SELECT a, CAST(SUM(p) AS BIGINT) AS v FROM b8 GROUP BY a),
l1 AS MATERIALIZED (SELECT CAST(SUM(abs(v)) AS BIGINT) AS l1 FROM v)
SELECT CAST(v.a AS BIGINT) AS dim,
       {tdiv(f"v.v * {_U}", "nullif(l1.l1, 0)")} AS loading_ppm
FROM v CROSS JOIN l1
ORDER BY dim
"""


EMB_PCA_ORACLE = _pca_sql(_tdiv_duck, "//")

QUERIES = {"emb_pca_power": emb_pca_power}
ORACLES = {"emb_pca_power": EMB_PCA_ORACLE}
# no Spark-SQL dual: generate_subscripts/zipped-unnest has no direct
# Spark spelling; the fluent form + DuckDB oracle are the two versions
SPARK_SQL: dict[str, str] = {}
