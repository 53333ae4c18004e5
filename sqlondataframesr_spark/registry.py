"""Central registry: collects QUERIES / ORACLES / SPARK_SQL from every
query module. ``__spark_entry__`` re-exports these for the driver."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .llm import (
    annrecall,
    bloom,
    bm25,
    bpe,
    contrastive,
    corpus,
    curation,
    decontam,
    dedup,
    diversity,
    dsir,
    hybrid,
    incremental,
    linear,
    lm,
    minhash,
    pca,
    pipeline,
    pq,
    reteval,
    sampling,
    semdedup,
    simhash,
    similarity,
    text,
)
from .multimodal import media
from .sources import binary as sources_binary
from .operators import (
    affinity,
    aggmerge,
    asof,
    concentration,
    er,
    features,
    forensics,
    graph,
    grouped,
    growth,
    hypertable,
    journeys,
    privacy,
    rangejoin,
    salt,
    scd,
    sessionize,
    sketches,
    stats,
    survival,
    timeseries,
    udtf,
)
from .queries import extensions, quality, reference, stackexchange, tpch_shapes
from .streaming import dedup_sink as streaming_dedup_sink
from .streaming import windows as streaming_windows

_MODULES = [
    affinity,
    annrecall,
    reference,
    extensions,
    stackexchange,
    tpch_shapes,
    quality,
    text,
    bloom,
    bm25,
    bpe,
    decontam,
    dedup,
    diversity,
    dsir,
    hybrid,
    incremental,
    linear,
    lm,
    minhash,
    pca,
    pq,
    reteval,
    semdedup,
    simhash,
    similarity,
    sampling,
    contrastive,
    corpus,
    curation,
    pipeline,
    streaming_windows,
    streaming_dedup_sink,
    media,
    sources_binary,
    grouped,
    growth,
    aggmerge,
    asof,
    concentration,
    graph,
    hypertable,
    journeys,
    rangejoin,
    salt,
    scd,
    er,
    features,
    privacy,
    stats,
    survival,
    forensics,
    timeseries,
    sessionize,
    sketches,
    udtf,
]


def _collect(attr: str) -> dict:
    out: dict = {}
    for mod in _MODULES:
        entries = getattr(mod, attr, {})
        dup = set(entries) & set(out)
        if dup:
            raise ValueError(f"duplicate query names across modules: {dup}")
        out.update(entries)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect("QUERIES")


def oracles() -> dict[str, str]:
    return _collect("ORACLES")


def spark_sql() -> dict[str, str]:
    return _collect("SPARK_SQL")


def sql_prereqs() -> dict[str, Callable[[], None]]:
    """Per-query setup hooks a runner must invoke BEFORE executing the
    corresponding ``spark_sql()`` text (ADVICE r6): a SQL dual that
    reads a generated fixture (e.g. the binaryFile blob dir) cannot
    rely on the fluent form having run first. Runners do::

        registry.sql_prereqs().get(name, lambda: None)()
        spark.sql(registry.spark_sql()[name])

    Kept separate from spark_sql() so collecting the SQL surface stays
    free of filesystem side effects (test_import_side_effects)."""
    return _collect("SQL_PREREQS")
