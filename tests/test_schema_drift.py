"""Testdata schema-drift defenses.

Round 3 regressed because the driver regenerated events.parquet with a
different ts encoding (TIMESTAMP(NANOS)-as-int64 → TIMESTAMP(MICROS)
without UTC adjustment) and the canonicalizer was keyed on the old
encoding's symptom. These tests pin the *invariant*: whatever parquet
encoding the generator ships, ``load_table`` must produce the same
session-TZ ``timestamp`` column with the same instants, and the
preflight must fail loudly (one clear message) on an encoding nobody
taught it yet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sqlondataframesr_spark.catalog import (
    EXPECTED_DTYPES,
    _preflight,
    load_table,
)


def _write_events_variant(src_dir: str, out_dir, ts_type) -> str:
    """Rewrite sf events.parquet with ts re-encoded as ``ts_type``."""
    tbl = pq.read_table(f"{src_dir}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    ts = tbl.column(i)
    # normalize to int64 micros first, then to the target type
    if pa.types.is_timestamp(ts.type):
        micros = ts.cast(pa.timestamp("us")).cast(pa.int64())
    else:  # already int64 nanos
        micros = pa.compute.divide(ts, 1000)
    if pa.types.is_timestamp(ts_type):
        recoded = micros.cast(pa.timestamp("us")).cast(ts_type)
    else:  # int64 nanos
        recoded = pa.compute.multiply(micros.cast(pa.int64()), 1000)
    tbl = tbl.set_column(i, pa.field("ts", recoded.type), recoded)
    out = str(out_dir)
    pq.write_table(tbl, f"{out}/events.parquet", version="2.6")
    return out


ENCODINGS = {
    "nanos_int64": pa.int64(),  # legacy: TIMESTAMP(NANOS) under nanosAsLong
    "micros_ntz": pa.timestamp("us"),  # current: no UTC adjustment → NTZ
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


def _fingerprint(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.selectExpr(
        "count(*) as n",
        "min(unix_micros(ts)) as lo",
        "max(unix_micros(ts)) as hi",
        "sum(unix_micros(ts) % 1000003) as chk",
    ).collect()[0]
    return tuple(row)


def test_all_ts_encodings_identical(spark, sf_dir, tmp_path):
    """int64-nanos, micros-NTZ and micros-UTC parquet must canonicalize
    to byte-identical instants."""
    prints = {}
    for tag, ts_type in ENCODINGS.items():
        d = tmp_path / tag
        d.mkdir()
        prints[tag] = _fingerprint(
            spark, _write_events_variant(sf_dir, d, ts_type)
        )
    assert len(set(prints.values())) == 1, prints


def test_preflight_rejects_unknown_encoding(spark):
    """A drifted dtype fails with one clear TypeError, not a scattered
    DATATYPE_MISMATCH later."""
    df = spark.range(1).selectExpr(
        "id as event_id", "cast(id as string) as ts", "cast(1.0 as double) as value"
    )
    with pytest.raises(TypeError, match="schema drift"):
        _preflight("events", df)


def test_manifest_matches_live_testdata(spark, sf_dir):
    """The preflight manifest agrees with what load_table produces on
    the real testdata (i.e. the manifest itself hasn't drifted)."""
    for name in EXPECTED_DTYPES:
        got = dict(load_table(spark, sf_dir, name).dtypes)
        for col, want in EXPECTED_DTYPES[name].items():
            assert got.get(col) == want, (name, col, want, got.get(col))


def test_catalog_canonicalizes_date_and_double_embedding(spark, sf_dir, tmp_path):
    """Future-drift guards: DATE-encoded order dates and double-typed
    embeddings canonicalize to the manifest types with equal values."""
    import pyarrow.parquet as pq

    d = tmp_path / "drift"
    d.mkdir()
    tbl = pq.read_table(f"{sf_dir}/orders.parquet")
    i = tbl.schema.get_field_index("o_orderdate")
    as_date = tbl.column(i).cast(pa.timestamp("us")).cast(pa.date32())
    tbl = tbl.set_column(i, pa.field("o_orderdate", as_date.type), as_date)
    pq.write_table(tbl, f"{d}/orders.parquet", version="2.6")

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    j = emb.schema.get_field_index("embedding")
    as_double = emb.column(j).cast(pa.list_(pa.float64()))
    emb = emb.set_column(j, pa.field("embedding", as_double.type), as_double)
    pq.write_table(emb, f"{d}/embeddings.parquet", version="2.6")

    orders = load_table(spark, str(d), "orders")
    assert dict(orders.dtypes)["o_orderdate"] == "timestamp"
    ref = load_table(spark, sf_dir, "orders")
    got = orders.selectExpr("sum(unix_micros(o_orderdate)) s").collect()[0]["s"]
    # a DATE keeps only the day, so compare against the day-truncated
    # original timestamps
    want = ref.selectExpr(
        "sum(unix_micros(date_trunc('DAY', o_orderdate))) s"
    ).collect()[0]["s"]
    assert got == want

    emb_df = load_table(spark, str(d), "embeddings")
    assert dict(emb_df.dtypes)["embedding"] == "array<float>"
    a = emb_df.selectExpr("sum(aggregate(embedding, 0D, (s, x) -> s + x)) t").collect()[0]["t"]
    b = load_table(spark, sf_dir, "embeddings").selectExpr(
        "sum(aggregate(embedding, 0D, (s, x) -> s + x)) t"
    ).collect()[0]["t"]
    assert abs(a - b) < 1e-6 * max(1.0, abs(b))
