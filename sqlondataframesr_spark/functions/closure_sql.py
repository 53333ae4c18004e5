"""Bounded-round connected-components closure in pure Spark SQL — the
shared generator behind the label-propagation duals (VERDICT r11 item
2, generalizing the r10/r11 `er_entity_clusters` pattern to
`dedup_clusters` and `emb_semantic_clusters`).

Why this shape exists at all: Spark 4's recursive CTE cannot express
a reachability fixpoint over a cyclic edge list
(UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), and a CTE-per-round unroll is
ANALYSIS-EXPONENTIAL — Spark inlines every multi-referenced CTE, so a
round chain referencing the previous round twice doubles the logical
plan per round (measured 12.6s -> 47.8s for 2 -> 4 rounds at sf0.001,
pure Catalyst time; see memory: spark-plan-depth-traps). The dual
therefore packs the graph into ONE row (sorted node array +
index-aligned adjacency) and runs the rounds as an ``aggregate`` fold
over arrays — each fold step references only the materialized
accumulator, so nothing compounds.

Semantics per fold step (2 per round): odd steps take the neighbor
min (label(v) <- min(label(v), min over N(v))), even steps pointer-
jump (label(v) <- label(label(v))) — the same alternation the fluent
iterative operators run, so ``rounds`` jump rounds cover component
diameter ~2^rounds. The final projection POISONS every id (to -1) if
one more neighbor-min step still moves a label, so an undersized
unroll is a loud fluent≡SQL mismatch, never a silent wrong-pass.

Single-row closure = deliberately NOT the distributed path (the
fluent hash-to-min loops in llm/dedup.py, llm/similarity.py and
operators/er.py are); it is the N-version twin, in the same
scalability class as the DuckDB WITH RECURSIVE oracles it mirrors.
"""

from __future__ import annotations

#: unrolled propagation rounds; with pointer jumping each round
#: roughly squares reachable distance, so 8 rounds cover component
#: diameters far past anything a blocked/banded match graph produces
CLOSURE_SQL_ROUNDS = 8


def packed_closure_sql(
    *,
    prelude: str,
    nodes_sql: str,
    key_name: str,
    id_name: str,
    size_name: str,
    rounds: int = CLOSURE_SQL_ROUNDS,
) -> str:
    """Full Spark-SQL text: ``WITH {prelude}, <closure CTEs>`` ending
    in ``SELECT {key_name}, {id_name}, {size_name} ... ORDER BY
    {key_name}``.

    ``prelude`` must define (at least) an ``edges`` CTE with BIGINT
    columns (src, dst) carrying every undirected edge in BOTH
    directions; ``nodes_sql`` is a standalone SELECT yielding one
    BIGINT ``node`` per distinct graph node (superset of edge
    endpoints — isolated nodes become singleton clusters). The id is
    the component's minimum node (hash-to-min convention, matching
    the fluent operators and the recursive oracles)."""
    steps = 2 * rounds
    nbr_min = (
        "transform(li, (x, i) -> least(x, coalesce(array_min("
        "transform(element_at(p.rows, i + 1).nbrs,"
        " j -> element_at(li, j + 1))), x)))"
    )
    jump = "transform(li, j -> element_at(li, j + 1))"
    one_more = (
        "transform(lf, (x, i) -> least(x, coalesce(array_min("
        "transform(element_at(p2.rows, i + 1).nbrs,"
        " j -> element_at(lf, j + 1))), x)))"
    )
    return f"""WITH {prelude},
idx AS (
  SELECT node,
         CAST(row_number() OVER (ORDER BY node) - 1 AS INT) AS i
  FROM ({nodes_sql})),
eidx AS (
  SELECT di.i AS d, si.i AS s
  FROM edges e
  JOIN idx si ON e.src = si.node
  JOIN idx di ON e.dst = di.node),
adjr AS (SELECT d, collect_list(s) AS nbrs FROM eidx GROUP BY d),
packed AS (
  SELECT array_sort(collect_list(struct(ii.i AS i,
           coalesce(a.nbrs, CAST(array() AS ARRAY<INT>)) AS nbrs))) AS rows,
         array_sort(collect_list(ii.node)) AS ns
  FROM idx ii LEFT JOIN adjr a ON a.d = ii.i),
solved AS (
  SELECT p.ns, p.rows,
         aggregate(sequence(1, {steps}),
                   transform(p.rows, r -> r.i),
                   (li, stepn) -> IF(pmod(stepn, 2) = 1,
                                     {nbr_min},
                                     {jump})) AS lf
  FROM packed p),
final AS (
  SELECT p2.ns, p2.lf,
         (p2.lf = {one_more}) AS converged
  FROM (SELECT ns, rows, lf FROM solved) p2),
labels AS (
  SELECT element_at(ns, pos + 1) AS {key_name},
         IF(converged, element_at(ns, lbl + 1), CAST(-1 AS BIGINT))
           AS {id_name}
  FROM final LATERAL VIEW posexplode(lf) pe AS pos, lbl),
sized AS (
  SELECT {id_name}, CAST(COUNT(*) AS BIGINT) AS {size_name}
  FROM labels GROUP BY {id_name})
SELECT l.{key_name}, l.{id_name}, s.{size_name}
FROM labels l JOIN sized s USING ({id_name})
ORDER BY l.{key_name}"""
