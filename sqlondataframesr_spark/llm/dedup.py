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
    # shingled feeds four branches (sizes x2, inverted index x2);
    # checkpoint so shingling runs once instead of per-branch.
    shingled = _with_shingles(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=False
    )
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
    return (
        jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
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


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_ORACLE,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_ORACLE,
}

SPARK_SQL: dict[str, str] = {}
