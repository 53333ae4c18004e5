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
STAR_SCHEMAS = {
    "region": "r_regionkey long, r_name string, r_comment string",
    "nation": "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    "customer": (
        "c_custkey long, c_name string, c_address string, c_nationkey long,"
        " c_phone string, c_acctbal double, c_mktsegment string, c_comment string"
    ),
    "supplier": (
        "s_suppkey long, s_name string, s_address string, s_nationkey long,"
        " s_phone string, s_acctbal double, s_comment string"
    ),
    "part": (
        "p_partkey long, p_name string, p_mfgr string, p_brand string,"
        " p_type string, p_size int, p_container string, p_retailprice double,"
        " p_comment string"
    ),
}

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
    "graph_nation_pagerank",   # r9 sweep regression: n=0 division
    "evt_asof_attribution",
    "q20_regional_revenue",
    # r10 inferential/linkage family
    "cdc_scd2_summary",
    "cdc_scd2_incremental",
    "er_entity_clusters",
    "ab_conversion_ztest",
    "evt_mad_spikes",
    "evt_cusum_shifts",
    "km_survival_curve",
    "dq_benford_digits",
    # r10 sketch/attribution family
    "ml_theilsen_trend",
    "evt_value_percentiles_exact",
    "orders_seasonal_naive_mase",
    "dq_ks_statistic",
    "ab_mannwhitney_auc",
    "evt_chisq_type_weekday",
    "sketch_kmv_distinct",
    "sketch_kmv_merge_check",
    "sketch_cms_freq_report",
    "evt_daily_acf",
    "evt_linear_attribution",
    "evt_cms_daily_cells",
    "evt_cms_user_merge_report",
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
        **{n: spark.createDataFrame([], s) for n, s in STAR_SCHEMAS.items()},
    }
    import duckdb

    con = duckdb.connect()
    tmap = {"BIGINT": "long", "VARCHAR": "string", "DOUBLE": "double",
            "INTEGER": "int", "TIMESTAMP": "timestamp", "DATE": "date"}
    for t in ("orders", "lineitem"):
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        ).fetchall()
        schema = ", ".join(f"{c[0]} {tmap.get(c[1], c[1].lower())}" for c in cols)
        fake[t] = spark.createDataFrame([], schema)
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
