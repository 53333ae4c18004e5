"""Deduplication operators over ``documents``: exact, n-gram Jaccard,
MinHash-LSH, SimHash.

The family covers the full scale ladder for a training corpus:

- exact (hash groupBy)           — always-on, one shuffle of hashes;
- n-gram Jaccard (inverted index)— exact near-dup ground truth; cost
  grows with shared-shingle pair count, fine to ~10^6 docs;
- MinHash + LSH banding          — the 100 TB path: fixed-size
  signatures, candidates only from band-bucket collisions, exact
  verification on the (tiny) candidate set;
- SimHash                        — bit-sketch variant (llm/simhash.py).

All hashing is md5-based so the DuckDB oracles reproduce signatures
bit-for-bit — no engine-private hash functions anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table

#: near-duplicate decision threshold on word-3-shingle Jaccard
JACCARD_THRESHOLD = 0.8


def _with_shingles(docs: DataFrame) -> DataFrame:
    """doc_id + distinct word 3-shingles (documents with <3 tokens are
    excluded — they have no 3-shingle and no Jaccard identity)."""
    return (
        docs.withColumn("w", F.split(F.col("text"), " "))
        .filter(F.size("w") >= 3)
        .withColumn(
            "sh",
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(w)-3),"
                    " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                )
            ),
        )
        .select("doc_id", "sh")
    )


_SHINGLES_SQL = """
  SELECT doc_id,
         list_distinct([w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2]
                        for i in range(1, len(w)-1)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup decision table: one row per distinct text, with the
    canonical keeper (min doc_id) and the duplicate count.

    Scale: the groupBy key is md5(text) — 16 opaque bytes instead of
    the full document — so the shuffle moves hashes, not text. This is
    THE first pass on any corpus; at 100 TB it is one all-to-all
    shuffle of ~doc_count * 40B.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


def _jaccard_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a < doc_b, jaccard) pairs with word-3-shingle Jaccard >=
    JACCARD_THRESHOLD, via an inverted shingle index (see
    dedup_ngram_jaccard for the scale discussion)."""
    # shingled feeds four branches (sizes x2, inverted index x2);
    # checkpoint so shingling runs once instead of per-branch.
    shingled = _with_shingles(docs).localCheckpoint(eager=False)
    sizes = shingled.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = shingled.select("doc_id", F.explode("sh").alias("s"))

    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ),
        )
    )
    return jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "jaccard"
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs: word-3-shingle Jaccard >= 0.8.

    Implementation is an inverted shingle index: explode distinct
    shingles, self-join on the shingle (doc_a < doc_b), count common
    shingles per pair, compute |A|+|B|-common. All JVM-side.

    Scale: cost is sum over shingles of df^2 (df = docs containing the
    shingle) — exact but quadratic in hot shingles. At corpus scale
    you (a) drop stop-shingles above a document-frequency cap, or
    (b) switch to dedup_minhash_lsh, which this operator ground-truths
    at test scale. The shingle join shuffles (shingle, doc_id) pairs;
    skewed hot shingles are exactly what AQE skew-join splitting
    handles.
    """
    return _jaccard_pairs(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_a", "doc_b"
    )


DEDUP_NGRAM_JACCARD_ORACLE = f"""
WITH s AS ({_SHINGLES_SQL}),
e AS (SELECT doc_id, unnest(sh) AS sh FROM s),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM s),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(c.n_common AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE ROUND(CAST(c.n_common AS DOUBLE)
      / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components of the duplicate graph
    (edges = identical text OR word-3-shingle Jaccard >= 0.8), with
    cluster_id = min doc_id in the component and the cluster size.
    This is the operator that turns pairwise dedup verdicts into the
    keep/drop decision for a corpus: keep doc_id == cluster_id.

    Scale design (two-level, like the reference pipeline none of which
    exists in the reference — north-star op):

    1. **Fingerprint compression first.** Identical docs collapse to
       one representative (min doc_id per md5) BEFORE any pair work —
       a 249-copy document contributes 1 graph node, not 249^2 edges.
    2. **Near-dup edges between representatives only** via the
       inverted-shingle Jaccard join (identical texts have identical
       shingle sets, so the relation factors exactly through
       fingerprints).
    3. **Iterative min-label propagation** on the compressed graph:
       label(v) <- min(label(v), min over neighbours) until fixpoint,
       O(component diameter) rounds, each round one shuffle of the
       (tiny) label table; localCheckpoint per round keeps the plan
       from growing. This is the hash-to-min CC scheme (Kiveris et
       al., "Connected Components in MapReduce"); for adversarial
       long-chain graphs swap in large-star/small-star — dup graphs
       in practice are dense blobs with diameter 1-2.
    4. **Expand members back** through the fingerprint map.

    min doc_id of a component is always a representative (the min doc
    of its own fingerprint group), so labels over representatives give
    exactly the per-document min over the full component.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = docs.select(F.col("doc_id"), F.md5("text").alias("fp"))
    reps = (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(
            F.min("doc_id").alias("rep"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .localCheckpoint(eager=False)
    )

    pairs = _jaccard_pairs(reps.select(F.col("rep").alias("doc_id"), "text"))
    # undirected edge list, both directions, between representatives
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=False)
    )

    labels = reps.select(F.col("rep").alias("node"), F.col("rep").alias("label"))
    for _ in range(20):  # cap >> real dup-graph diameter
        msg = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msg, labels.node == msg.node2, "left")
            .select(
                "node",
                F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint()  # eager: cuts lineage and lets us count
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    member_label = fp.join(reps.select("fp", "rep"), "fp").join(
        labels, F.col("rep") == F.col("node")
    )
    sized = member_label.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        member_label.join(sized, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE s AS ({_SHINGLES_SQL}),
e AS (SELECT doc_id, unnest(sh) AS sh FROM s),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM s),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near AS (
  SELECT c.doc_a, c.doc_b
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE ROUND(CAST(c.n_common AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
),
exact AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b
    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM (SELECT * FROM near UNION SELECT * FROM exact)
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM (SELECT * FROM near UNION SELECT * FROM exact)
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
clusters AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT c.doc_id, c.cluster_id, cs.cluster_size
FROM clusters c
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM clusters GROUP BY cluster_id) cs
  USING (cluster_id)
ORDER BY c.doc_id
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_clusters": dedup_clusters,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_ORACLE,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_ORACLE,
    "dedup_clusters": DEDUP_CLUSTERS_ORACLE,
}

# Spark-SQL N-version forms (fluent ≡ SQL, tests/test_reference_queries.py)
SPARK_SQL: dict[str, str] = {
    "dedup_exact": DEDUP_EXACT_ORACLE,  # dialect-neutral: valid in both engines
}
