"""BPE tokenizer training on-cluster: learn the top merge operations
over the corpus (Sennrich et al. 2016, the algorithm behind GPT/LLaMA
tokenizers) — the missing half of ``text.bpe_token_estimate``, which
only APPLIES a tokenization heuristic.

Algorithm (byte-pair encoding over word types):

1. word-frequency table: lowercase, split on non-letters, count;
2. each word becomes a symbol sequence (initially characters);
3. repeat MERGES times: count adjacent symbol pairs weighted by word
   frequency, pick the most frequent pair (ties: lexicographically
   smallest), fuse every adjacent occurrence greedily left-to-right.

Output: the learned merge table (rank, left, right, pair_count) — the
artifact a tokenizer ships.

Representation trick (shared with the DuckDB oracle so EXACT hashing
holds): a word's symbol sequence is its symbols joined by TWO spaces.
With one pad space on each end, every symbol owns one space on each
side, so fusing pair (l, r) is a single engine-native ``replace`` of
``' l  r '`` with ``' lr '`` — adjacent occurrences don't share
delimiter characters, so plain left-to-right non-overlapping replace
implements exactly the greedy BPE merge ('a a a' + (a,a) -> [aa, a])
with no UDF and no fold. Both engines' ``replace`` have identical
left-to-right semantics; counts are integer-exact; the argmax
tie-break (count DESC, left, right) is total — bit-for-bit
reproducible.

Scale (100 TB posture): the corpus collapses to its word-TYPE
frequency table after one shuffle (vocabulary ~10^7 rows regardless of
corpus size — Heaps' law), so every merge round runs on the small
type table: one groupBy on (left, right) pairs plus a 1-row broadcast
of the chosen merge. MERGES rounds = MERGES small shuffles; real
tokenizer training (32k merges) would checkpoint the type table every
few hundred rounds, exactly like the pagerank/kmeans unrolled loops
here (operators/graph.py, llm/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..materialize import materialize, spread_scan
from ..catalog import load_table

#: number of merge rounds to learn (real tokenizers: ~32k; unrolled
#: here like the pagerank iterations, enough to pin the algorithm)
MERGES = 4

#: minimum word length — 1-char words have no pair and no merge vote
MIN_WORD_LEN = 2


def _word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq): lowercase [a-z]+ word types with corpus counts."""
    return (
        spread_scan(docs, "doc_id")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .filter(F.length("word") >= MIN_WORD_LEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(w: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the double-space symbol encoding."""
    return (
        w.withColumn("l", F.split("sp", "  "))
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1),"
                    " (a, b) -> struct(a AS lft, b AS rgt))"
                )
            ).alias("p"),
            "freq",
        )
        .groupBy("p.lft", "p.rgt")
        .agg(F.sum("freq").alias("cnt"))
    )


def _learn_merges(docs: DataFrame) -> DataFrame:
    """Merge table over an arbitrary (doc_id, text) frame — body of
    :func:`bpe_learn_merges`, split out for planted-corpus tests."""
    words = (
        _word_freqs(docs)
        .select(
            F.expr("trim(regexp_replace(word, '(.)', '$1  '))").alias("sp"), "freq"
        )
        .transform(materialize)
    )
    merges = []
    w = words
    for i in range(MERGES):
        best = (
            _pair_counts(w)
            .orderBy(F.desc("cnt"), "lft", "rgt")
            .limit(1)
            .transform(materialize)
        )
        merges.append(
            best.select(
                F.lit(i + 1).alias("merge_rank"),
                F.col("lft").alias("left_sym"),
                F.col("rgt").alias("right_sym"),
                F.col("cnt").alias("pair_count"),
            )
        )
        if i + 1 < MERGES:  # last round's fused table feeds nothing
            w = (
                w.crossJoin(F.broadcast(best.select("lft", "rgt")))
                .select(
                    F.expr(
                        "trim(replace(concat(' ', sp, ' '),"
                        " concat(' ', lft, '  ', rgt, ' '),"
                        " concat(' ', lft, rgt, ' ')))"
                    ).alias("sp"),
                    "freq",
                )
                .transform(materialize)
            )
    out = merges[0]
    for m in merges[1:]:
        out = out.union(m)
    return out.orderBy("merge_rank")


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-4 BPE merges over ``documents`` (see module doc).

    Returns (merge_rank, left_sym, right_sym, pair_count) ordered by
    rank — the merge table a tokenizer would persist.
    """
    return _learn_merges(load_table(spark, sf_dir, "documents"))


def _oracle_sql(dialect: str) -> str:
    """Unrolled CTE chain for the identical computation.

    dialect='duck': DuckDB list slicing + parallel unnest.
    dialect='spark': explode(zip_with(...)) pair extraction.
    """
    if dialect == "duck":
        words = r"""
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE length(w) >= 2
  GROUP BY w"""
        w0 = r"SELECT trim(regexp_replace(word, '(.)', '\1  ', 'g')) AS sp, freq FROM words"
        pairs = (
            "SELECT unnest(l[1:len(l)-1]) AS lft, unnest(l[2:len(l)]) AS rgt, freq"
            " FROM (SELECT string_split(sp, '  ') AS l, freq FROM {w})"
        )
        cnt = "CAST(SUM(freq) AS BIGINT)"
    else:
        words = r"""
  SELECT w AS word, COUNT(*) AS freq
  FROM (SELECT explode(split(lower(text), '[^a-z]+')) AS w FROM documents)
  WHERE length(w) >= 2
  GROUP BY w"""
        w0 = "SELECT trim(regexp_replace(word, '(.)', '$1  ')) AS sp, freq FROM words"
        pairs = (
            "SELECT p.lft AS lft, p.rgt AS rgt, freq"
            " FROM (SELECT explode(zip_with(slice(l, 1, size(l) - 1),"
            " slice(l, 2, size(l) - 1), (a, b) -> struct(a AS lft, b AS rgt))) AS p,"
            " freq FROM (SELECT split(sp, '  ') AS l, freq FROM {w}))"
        )
        cnt = "SUM(freq)"
    ctes = [f"words AS ({words})", f"w0 AS ({w0})"]
    for i in range(MERGES):
        ctes.append(
            f"c{i} AS (SELECT lft, rgt, {cnt} AS cnt"
            f" FROM ({pairs.format(w=f'w{i}')}) GROUP BY lft, rgt)"
        )
        ctes.append(
            f"b{i} AS (SELECT lft, rgt, cnt FROM c{i}"
            " ORDER BY cnt DESC, lft, rgt LIMIT 1)"
        )
        if i + 1 < MERGES:
            ctes.append(
                f"w{i + 1} AS (SELECT trim(replace(' ' || sp || ' ',"
                f" ' ' || b.lft || '  ' || b.rgt || ' ',"
                f" ' ' || b.lft || b.rgt || ' ')) AS sp, freq FROM w{i}, b{i} b)"
            )
    unions = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS merge_rank, lft AS left_sym, rgt AS right_sym,"
        f" cnt AS pair_count FROM b{i}"
        for i in range(MERGES)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions + "\nORDER BY merge_rank"


BPE_LEARN_ORACLE = _oracle_sql("duck")
BPE_LEARN_SPARK_SQL = _oracle_sql("spark")

QUERIES = {"bpe_learn_merges": bpe_learn_merges}
ORACLES = {"bpe_learn_merges": BPE_LEARN_ORACLE}
SPARK_SQL = {"bpe_learn_merges": BPE_LEARN_SPARK_SQL}
