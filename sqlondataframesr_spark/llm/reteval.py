"""Rank-agreement report for the text-retrieval family — pairwise
overlap@k and top-1 agreement between BM25, Dirichlet-QL, and hybrid
RRF over the family's standard query set. The retrieval twin of
``ann_recall_report`` (llm/annrecall.py): every ranker in the repo
gets a quality meter on the same dashboard row.

Why agreement, not labeled relevance: the corpus ships no relevance
labels, every ranker excludes the query document itself (bm25.py's
``doc_id != q_id`` filter; ANN excludes self-pairs), and the document
near-duplicate plants sit outside the BM25_N_QUERIES query window —
so any labeled-metric protocol here would be degenerate (all-zero) and
a bug that zeroes the metric would pass unseen. Pairwise agreement is
the non-degenerate dashboard a retrieval stack actually watches:
overlap@k between the lexical arms says how much the scoring functions
disagree on the SAME candidate pool; overlap between each arm and the
RRF fusion says how much of each arm survives fusion (RRF fuses BM25
with the cosine ANN arm, so bm25↔rrf overlap is expected to dominate
ql↔rrf — the report shows the fusion's lexical bias explicitly).

North-star extension (no reference counterpart — RDataFramesSQL.Rmd
has no retrieval surface).

Determinism: overlap counts are exact integers; ``overlap_ppm`` is the
repo-wide ``n * 1e6 div possible`` truncating-BIGINT idiom — both
engines hash identically. No transcendentals anywhere.

Scale: aggregates three already-top-k frames (N_QUERIES x k rows
each) — the join is top-k x top-k WITHIN a (method pair, query), never
corpus-sized. Two r12 structure changes (ADVICE r11 + VERDICT r11
item 5): (a) the 3-ranker union is MATERIALIZED and consumed by ONE
method-vs-method self-join + ONE aggregate (the oracle's own shape)
instead of the per-pair filter/join/agg loop (6 scans + 3 agg jobs);
(b) the rankers share the corpus pass — bm25.py's ``_postings``
builds ONE cached tf frame (dl derived from it, no second tokenize)
with plan-identical construction across all three arms, so Spark's
CacheManager dedupes the tokenization within the report action.
Honest accounting: this took the sf0.1 median 8.1 s -> ~7.4 s only —
the r11 hypothesis that the arms re-derived shared work was mostly
already false (plan-identical persists deduped via CacheManager
before r12); the residual wall is the three pipelines' ~25 sequential
sub-second stages, the same toy-scale stage-latency floor the
headline-six floor analysis documents, with per-run cpu_s now in
BENCH_DETAILS per_query_stats to prove it. Oracle = literal
composition of the three gated oracle texts (the annrecall.py
pattern); the SPARK_SQL dual (r12) is the same composition over the
rankers' registered Spark-SQL statements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import bm25 as _bm25
from . import hybrid as _hybrid
from . import similarity as _sim
from ..materialize import force_concurrently, materialize

#: (method label, fn, output id column) — label-sorted
_METHODS = [
    ("bm25", _bm25.bm25_topk, "doc_id"),
    ("hybrid_rrf", _hybrid.hybrid_rrf_topk, "id"),
    ("ql_dirichlet", _bm25.ql_dirichlet_topk, "doc_id"),
]

#: ordered method pairs reported (label-sorted, a < b)
_PAIRS = [
    ("bm25", "hybrid_rrf"),
    ("bm25", "ql_dirichlet"),
    ("hybrid_rrf", "ql_dirichlet"),
]


def ret_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per ranker pair: pooled overlap@k of their top-k id
    sets and the number of queries where they agree on the top-1,
    over the :data:`bm25.BM25_N_QUERIES` standard queries.

    Output: (method_a, method_b, n_queries, k, n_overlap, overlap_ppm,
    n_same_top1) ordered by (method_a, method_b)."""
    n_q, k = _bm25.BM25_N_QUERIES, _bm25.BM25_TOP_K
    # r13 (optimization-guide §2.6): the three ranker arms used to
    # evaluate sequentially inside the one report action (r12: 6.35 s
    # wall vs 62 s cpu — the arms are stage-latency bound and leave
    # cores idle). Build the SHARED roots first in one thread each —
    # the tokenized postings (bm25 + ql + hybrid's lexical arm) and the
    # normalized vectors (hybrid's ANN arm) — then force the three
    # pinned arm frames concurrently: wall ≈ max(arm), not Σ(arm).
    # All within this run; nothing outlives release_all().
    postings, _dl = _bm25._postings(spark, sf_dir)
    vec = materialize(_sim._vectors(spark, sf_dir))
    force_concurrently([postings, vec], max_workers=2)
    arms = []
    for label, fn, id_col in _METHODS:
        arms.append(
            materialize(
                fn(spark, sf_dir).select(
                    F.lit(label).alias("method"),
                    "q_id",
                    F.col(id_col).alias("id"),
                    "rnk",
                )
            )
        )
    force_concurrently(arms, max_workers=3)
    ranked = None
    for r in arms:
        ranked = r if ranked is None else ranked.unionByName(r)
    # ONE self-join across methods replaces the r11 per-pair
    # filter/join/agg loop (6 scans + 3 agg jobs -> 1 join + 1 agg —
    # the oracle's own shape); both join sides read the three arm
    # caches forced above, so no extra pin is needed. The static pair
    # frame restores zero-overlap pairs via left join.
    a, b = ranked.alias("a"), ranked.alias("b")
    j = (
        a.join(
            b,
            (F.col("a.q_id") == F.col("b.q_id"))
            & (F.col("a.id") == F.col("b.id"))
            & (F.col("a.method") < F.col("b.method")),
        )
        .groupBy(
            F.col("a.method").alias("method_a"),
            F.col("b.method").alias("method_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("j_overlap"),
            F.sum(
                F.expr("if(a.rnk = 1 and b.rnk = 1, 1L, 0L)")
            ).alias("j_top1"),
        )
    )
    pairs = spark.range(1).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(ma).alias("method_a"), F.lit(mb).alias("method_b")
                )
                for ma, mb in _PAIRS
            ])
        ).alias("p")
    ).select("p.method_a", "p.method_b")
    return (
        pairs.join(F.broadcast(j), ["method_a", "method_b"], "left")
        .select(
            "method_a",
            "method_b",
            F.lit(n_q).cast("long").alias("n_queries"),
            F.lit(k).cast("long").alias("k"),
            F.coalesce("j_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.expr(
                f"coalesce(j_overlap, 0L) * 1000000L div {n_q * k}"
            ).cast("long").alias("overlap_ppm"),
            F.coalesce("j_top1", F.lit(0)).cast("long").alias("n_same_top1"),
        )
        .orderBy("method_a", "method_b")
    )


def _agreement_sql(texts: dict[str, tuple[str, str]], intdiv: str) -> str:
    """The report as one composed SQL text over the three rankers'
    own registered (dialect-specific) statements — shared by the
    DuckDB oracle and (r12) the Spark-SQL dual."""
    n_q, k = _bm25.BM25_N_QUERIES, _bm25.BM25_TOP_K
    branches = " UNION ALL ".join(
        f"SELECT '{label}' AS method, q_id, {col} AS id, rnk"
        f" FROM ({sql}) t_{label}"
        for label, (col, sql) in texts.items()
    )
    pair_rows = " UNION ALL ".join(
        f"SELECT '{ma}' AS method_a, '{mb}' AS method_b" for ma, mb in _PAIRS
    )
    return f"""
WITH ranked AS ({branches}),
pairs AS ({pair_rows}),
joined AS (
  SELECT p.method_a, p.method_b, a.q_id, a.rnk AS rnk_a, b.rnk AS rnk_b
  FROM pairs p
  JOIN ranked a ON a.method = p.method_a
  JOIN ranked b ON b.method = p.method_b AND b.q_id = a.q_id AND b.id = a.id
)
SELECT p.method_a, p.method_b,
       CAST({n_q} AS BIGINT) AS n_queries,
       CAST({k} AS BIGINT) AS k,
       CAST(COUNT(j.q_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(j.q_id) * 1000000 {intdiv} {n_q * k} AS BIGINT) AS overlap_ppm,
       CAST(COALESCE(SUM(CASE WHEN j.rnk_a = 1 AND j.rnk_b = 1
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_same_top1
FROM pairs p
LEFT JOIN joined j ON j.method_a = p.method_a AND j.method_b = p.method_b
GROUP BY p.method_a, p.method_b
ORDER BY p.method_a, p.method_b
"""


QUERIES = {"ret_rank_agreement": ret_rank_agreement}
ORACLES = {
    "ret_rank_agreement": _agreement_sql(
        {
            "bm25": ("doc_id", _bm25.ORACLES["bm25_topk"]),
            "hybrid_rrf": ("id", _hybrid.ORACLES["hybrid_rrf_topk"]),
            "ql_dirichlet": ("doc_id", _bm25.ORACLES["ql_dirichlet_topk"]),
        },
        "//",
    )
}
# composed dual (r12): same composition over the rankers' registered
# Spark-SQL statements — replaces the "composition" COVERAGE waiver
SPARK_SQL: dict[str, str] = {
    "ret_rank_agreement": _agreement_sql(
        {
            "bm25": ("doc_id", _bm25.SPARK_SQL["bm25_topk"]),
            "hybrid_rrf": ("id", _hybrid.SPARK_SQL["hybrid_rrf_topk"]),
            "ql_dirichlet": ("doc_id", _bm25.SPARK_SQL["ql_dirichlet_topk"]),
        },
        "div",
    )
}
