"""Empty-input robustness: every flagship operator must return an
EMPTY (or degenerate-report) result on empty tables, never crash.

A production engine meets empty partitions constantly — a new tenant,
a filtered-to-nothing date range, a fresh incremental batch. The
fixtures can't exercise this (the driver's tables are never empty), so
this battery seeds the loader's table cache with zero-row frames of
the real schemas and runs a representative operator from every family. The
TOTAL-expression discipline (IF-guarded generators, nullif'd
divisions, None-guarded driver-side collects) is what makes these
pass."""

from __future__ import annotations

import pytest


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"
EVT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

#: representative op per family (all read only documents/embeddings/events)
BATTERY = [
    "lm_bigram_logprob",
    "lm_perplexity_tercile_gate",
    "nb_lang_confusion",
    "corpus_ngram_diversity",
    "corpus_zipf_slope",
    "corpus_source_overlap",
    "evt_hypertable_rollup",
    "text_unigram_logprob",
    "text_token_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "decontam_scrub_spans",
    "ann_cosine_topk",
    "sample_hash_split",
    "bm25_topk",
    "semdedup",
    "kmeans_train",
    "bpe_learn_merges",
]


EMPTY_SF = "_empty_fixture"


@pytest.fixture()
def empty_loader(spark):
    """Serve zero-row frames for the EMPTY_SF pseudo-dir by seeding
    catalog._table_cache — the loader's first lookup — instead of
    monkeypatching every module's imported load_table binding (which
    is leak-prone across modules imported mid-battery)."""
    import sqlondataframesr_spark.catalog as C

    app = spark.sparkContext.applicationId
    fake = {
        "documents": spark.createDataFrame([], DOC_SCHEMA),
        "embeddings": spark.createDataFrame([], EMB_SCHEMA),
        "events": spark.createDataFrame([], EVT_SCHEMA),
    }
    keys = []
    for name, df in fake.items():
        k = (app, EMPTY_SF, name)
        C._table_cache[k] = df
        keys.append(k)
    yield
    for k in keys:
        C._table_cache.pop(k, None)


@pytest.mark.parametrize("name", BATTERY)
def test_operator_survives_empty_tables(spark, empty_loader, name):
    from sqlondataframesr_spark import registry

    rows = registry.queries()[name](spark, EMPTY_SF).collect()
    # zipf is a 1-row REPORT (n_terms=0, NULL fit) — everything else empty
    if name == "corpus_zipf_slope":
        assert len(rows) == 1 and rows[0]["n_terms"] == 0
    else:
        assert rows == [] or all(r is not None for r in rows)
