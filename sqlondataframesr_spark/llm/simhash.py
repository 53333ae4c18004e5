"""SimHash — bit-sketch near-duplicate detection (Charikar random
hyperplanes over the token set, the Manku et al. WWW'07 web-dedup
construction).

Fingerprint: 64 bits. Bit j is the sign of sum over distinct tokens
of (bit_j(h(token)) ? +1 : -1) where h = the first 16 hex digits of
md5 — i.e. each token votes its hash bit pattern, the majority wins.
Near-duplicates (high token overlap) differ in few bits, so dedup is
"hamming distance <= T" instead of set intersection.

Candidate generation is the same block-banding trick as MinHash-LSH:
split the 64 bits into 4 blocks of 16; any pair within hamming
distance 3 shares at least one identical block (pigeonhole), so an
equality join per block finds all such pairs without an all-pairs
scan. We report candidates up to hamming 8 (pairs beyond distance 3
are caught only when their differing bits cluster, which is the
standard recall trade-off of the scheme).

Determinism: md5-derived bits + integer votes (+1/-1, ties broken
toward 0) — the DuckDB oracle reproduces fingerprints bit-for-bit.

Scale: fingerprinting is map-only inside codegen (one md5 per token,
then 64 integer folds); the pair join shuffles 4 fixed 16-char keys
per doc. At 100 TB this is the cheapest near-dup pass there is — a
64-bit sketch per document and equality joins.

Reference scope note: north-star surface (no near-dup operator in the
reference — SURVEY.md §2.6); cited as a first-class dedup family
member in BASELINE.json's north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table

NUM_BITS = 64
BLOCKS = 4
BLOCK_BITS = NUM_BITS // BLOCKS
HAMMING_MAX = 8

#: Spark SQL: bit j (0-based, MSB-first per nibble) of the hex digest m.
_BIT_SPARK = (
    "((instr('0123456789abcdef', substring(m, (j div 4) + 1, 1)) - 1)"
    "  div shiftleft(1, 3 - (j % 4))) % 2"
)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """doc_id + 64-char '0'/'1' fingerprint over distinct tokens."""
    return (
        docs.withColumn("toks", F.array_distinct(F.split(F.col("text"), " ")))
        .withColumn("hs", F.expr("transform(toks, t -> md5(t))"))
        .select(
            "doc_id",
            F.expr(
                "concat_ws('', transform(sequence(0, 63), j ->"
                f"  CASE WHEN aggregate(hs, bigint(0), (acc, m) -> acc + 2 * ({_BIT_SPARK}) - 1) > 0"
                "   THEN '1' ELSE '0' END))"
            ).alias("fingerprint"),
            F.size("toks").alias("n_tokens"),
        )
    )


def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_fingerprints(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: share a 16-bit block, hamming <= 8."""
    fp = simhash_fingerprints(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )
    blocks = fp.select(
        "doc_id",
        "fingerprint",
        F.explode(F.expr(
            f"transform(sequence(0, {BLOCKS - 1}),"
            f"  b -> struct(b as blk, substring(fingerprint, b * {BLOCK_BITS} + 1, {BLOCK_BITS}) as bkey))"
        )).alias("e"),
    ).select("doc_id", "fingerprint", "e.blk", "e.bkey")

    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fingerprint").alias("fa"),
            F.col("b.fingerprint").alias("fb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr(
                "aggregate(sequence(1, 64), 0, (acc, i) ->"
                " acc + IF(substring(fa, i, 1) = substring(fb, i, 1), 0, 1))"
            ),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


#: DuckDB: same bit extraction, dialect-local operators.
_BIT_DUCK = (
    "((strpos('0123456789abcdef', m[(j // 4) + 1]) - 1) >> (3 - (j % 4))) & 1"
)

_FP_SQL = f"""
  SELECT doc_id,
         list_aggregate([CASE WHEN list_sum([2 * ({_BIT_DUCK}) - 1 for m in hs]) > 0
                         THEN '1' ELSE '0' END for j in range(0, 64)],
                        'string_agg', '') AS fingerprint,
         len(toks) AS n_tokens
  FROM (
    SELECT doc_id, toks, [md5(t) for t in toks] AS hs
    FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents)
  )
"""

SIMHASH_FINGERPRINT_ORACLE = f"""
WITH fp AS ({_FP_SQL})
SELECT doc_id, fingerprint, n_tokens FROM fp ORDER BY doc_id
"""

DEDUP_SIMHASH_ORACLE = f"""
WITH fp AS ({_FP_SQL}),
blocks AS (
  SELECT doc_id, fingerprint, t.b AS blk,
         fingerprint[t.b * {BLOCK_BITS} + 1 : t.b * {BLOCK_BITS} + {BLOCK_BITS}] AS bkey
  FROM fp, range(0, {BLOCKS}) t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.fingerprint AS fa, b.fingerprint AS fb
  FROM blocks a
  JOIN blocks b ON a.blk = b.blk AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       len(list_filter([fa[i] != fb[i] for i in range(1, 65)], v -> v)) AS hamming
FROM cand
WHERE len(list_filter([fa[i] != fb[i] for i in range(1, 65)], v -> v)) <= {HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "simhash_fingerprint": simhash_fingerprint,
    "dedup_simhash": dedup_simhash,
}

ORACLES = {
    "simhash_fingerprint": SIMHASH_FINGERPRINT_ORACLE,
    "dedup_simhash": DEDUP_SIMHASH_ORACLE,
}

SPARK_SQL: dict[str, str] = {}
