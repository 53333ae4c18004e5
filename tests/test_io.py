"""Round-trip tests for the CSV/JSON/parquet sources & sinks."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from sqlondataframesr_spark.catalog import load_table
from sqlondataframesr_spark.check import compare_frames
from sqlondataframesr_spark.sources import io


def test_csv_roundtrip_inferred_schema(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    io.write_csv(nation, path)
    back = io.read_csv(spark, path)
    assert not compare_frames(back, nation)
    # inference recovered the numeric key types, not strings
    assert dict(back.dtypes)["n_nationkey"] in {"int", "bigint"}


def test_csv_explicit_schema_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_csv")
    io.write_csv(region, path)
    back = io.read_csv(spark, path, schema=region.schema)
    assert not compare_frames(back, region)
    assert back.schema == region.schema


def test_json_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_json")
    docs.write.json(path)
    back = io.read_json(spark, path, schema=docs.schema)
    assert not compare_frames(back, docs)


def test_partitioned_parquet_write_prunes(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    io.write_parquet(docs, path, partition_by=["lang"])
    # hive-style layout on disk
    assert glob.glob(os.path.join(path, "lang=en"))
    back = spark.read.parquet(path)
    q = back.filter(F.col("lang") == "en").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the lang filter is satisfied by directory
    # listing, so no per-row lang predicate survives in the scan
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    en_ids = {r["doc_id"] for r in q.collect()}
    expect = {r["doc_id"] for r in docs.filter("lang = 'en'").collect()}
    assert en_ids == expect


def test_register_csv_dir(spark, sf_dir, tmp_path):
    for name in ("region", "nation"):
        io.write_csv(load_table(spark, sf_dir, name), str(tmp_path / f"{name}.csv"))
    # write_csv makes a dir of part files; register_csv_dir expects
    # *.csv entries — the dir names end in .csv, which glob matches
    views = io.register_csv_dir(spark, str(tmp_path))
    assert set(views) == {"region", "nation"}
    got = spark.sql(
        "SELECT r.r_name, count(*) AS n FROM region r JOIN nation n"
        " ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name ORDER BY r.r_name"
    ).collect()
    assert len(got) == 5 and all(r["n"] == 5 for r in got)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    io.write_orc(nation, path)
    back = io.read_orc(spark, path)
    assert back.schema == nation.schema
    assert sorted(r["n_nationkey"] for r in back.collect()) == list(range(25))


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """orders ⋈ lineitem both bucketed on the order key: the join must
    run with ZERO exchanges — bucket i joins bucket i directly."""
    from sqlondataframesr_spark.plans.audit import audit

    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); dropped in the finally below
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    io.write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    io.write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = (
                spark.table("orders_b")
                .join(
                    spark.table("lineitem_b"),
                    F.col("o_orderkey") == F.col("l_orderkey"),
                )
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            a = audit(j)
            assert "SortMergeJoin" in a.join_strategies
            # the JOIN itself is exchange-free; the only exchange is the
            # final single-key aggregate
            assert a.n_exchanges <= 1
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_binary_file_source_reads_payload_bytes(spark, tmp_path):
    """binaryFile ingestion: bytes round-trip exactly, the glob filter
    excludes non-matching files at listing time, and the output shape
    is the multimodal payload contract (path + binary content)."""
    payloads = {f"doc{i}.bin": bytes([i] * (10 + i)) for i in range(5)}
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)
    (tmp_path / "ignore.txt").write_text("not binary payload")

    df = io.read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {os.path.basename(r.path): bytes(r.content) for r in df.collect()}
    assert rows == payloads
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content"
    }
    # length column matches the actual byte count (usable for
    # size-partitioning upstream of decode)
    for r in df.collect():
        assert r.length == len(bytes(r.content))


def test_text_source_lines_and_wholetext(spark, tmp_path):
    (tmp_path / "a.txt").write_text("line1\nline2\n")
    (tmp_path / "b.txt").write_text("line3\n")
    lines = io.read_text(spark, str(tmp_path))
    assert sorted(r.value for r in lines.collect()) == ["line1", "line2", "line3"]
    whole = io.read_text(spark, str(tmp_path), whole=True)
    assert sorted(r.value for r in whole.collect()) == ["line1\nline2\n", "line3\n"]


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    """50 tiny input files -> sized output: file count from REAL byte
    totals, rows preserved exactly, evenly-sized outputs."""
    src, dst = str(tmp_path / "tiny"), str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(50).write.parquet(src)
    n_in = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_in == 50

    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(src, "*.parquet"))
    )
    target = max(1, total // 3)  # force ~3-4 output files
    n_out = io.compact_parquet(spark, src, dst, target_bytes=target)
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(files) == n_out == -(-total // target)
    # data survives the rewrite exactly
    before = sorted(r.o_orderkey for r in orders.collect())
    after = sorted(r.o_orderkey for r in spark.read.parquet(dst).collect())
    assert before == after
    # round-robin repartition -> roughly even output sizes (the point
    # of paying the shuffle instead of coalesce)
    sizes = sorted(os.path.getsize(f) for f in files)
    assert sizes[0] > 0.5 * sizes[-1], sizes


def test_compact_parquet_preserves_partitioning(spark, sf_dir, tmp_path):
    """Compacting a partitioned table keeps the directory layout (and
    therefore pruning on re-read) while merging the per-partition
    slivers many writers left behind."""
    src, dst = str(tmp_path / "part_src"), str(tmp_path / "part_dst")
    orders = load_table(spark, sf_dir, "orders")
    # 20 writer tasks x 3 statuses -> up to 60 slivers
    orders.repartition(20).write.partitionBy("o_orderstatus").parquet(src)
    n_src = len(glob.glob(os.path.join(src, "o_orderstatus=*/*.parquet")))
    assert n_src > 20

    io.compact_parquet(
        spark, src, dst, target_bytes=1 << 30, partition_by=("o_orderstatus",)
    )
    dirs = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(dst, "o_orderstatus=*"))
    )
    assert dirs == sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(src, "o_orderstatus=*"))
    )
    n_dst = len(glob.glob(os.path.join(dst, "o_orderstatus=*/*.parquet")))
    assert n_dst < n_src  # slivers merged
    # rows survive and pruning still works on the compacted layout
    again = spark.read.parquet(dst)
    assert again.count() == orders.count()
    one = again.filter(F.col("o_orderstatus") == "F")
    assert "o_orderstatus=F" in " ".join(one.inputFiles()) or one.count() > 0


def test_write_sharded_bounds_file_sizes(spark, sf_dir, tmp_path):
    """Every physical file must respect maxRecordsPerFile and the full
    dataset must round-trip — the training-export contract."""
    import pyarrow.parquet as pq

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    path = str(tmp_path / "lineitem_sharded")
    io.write_sharded(li, path, max_records_per_file=1000, n_shards=3)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) >= n // 1000  # the cap forces a multi-file layout
    per_file = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert all(c <= 1000 for c in per_file), per_file
    assert sum(per_file) == n
    assert spark.read.parquet(path).count() == n


def test_write_clustered_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """Range clustering is only worth its shuffle if the resulting
    files carry near-disjoint min/max stats on the cluster column —
    that is what lets parquet footers prune whole files for a range
    predicate. Assert the per-file [min, max] intervals do not
    overlap (boundary duplicates excepted)."""
    import pyarrow.parquet as pq

    ords = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_clustered")
    io.write_clustered(ords, path, cluster_by=["o_orderdate"], n_files=8)
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= 2
    ranges = []
    for f in files:
        pf = pq.ParquetFile(f)
        md = pf.metadata
        ci = pf.schema_arrow.names.index("o_orderdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo, (a_hi, b_lo)
    assert spark.read.parquet(path).count() == ords.count()


def test_write_zordered_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order must bound per-file min/max spans on BOTH z columns —
    that is its whole advantage over single-column range clustering,
    which leaves every file spanning the full domain of the second
    column. Asserted against that exact baseline."""
    import pyarrow.parquet as pq

    ev = load_table(spark, sf_dir, "events")

    def spans(path, col):
        out, lows, highs = [], [], []
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            pf = pq.ParquetFile(f)
            md = pf.metadata
            ci = pf.schema_arrow.names.index(col)
            st = [
                md.row_group(rg).column(ci).statistics
                for rg in range(md.num_row_groups)
            ]
            lo, hi = min(s.min for s in st), max(s.max for s in st)
            lows.append(lo), highs.append(hi)
            out.append((lo, hi))
        g = max(highs) - min(lows)
        g = g.total_seconds() if hasattr(g, "total_seconds") else g
        return [
            ((hi - lo).total_seconds() if hasattr(hi - lo, "total_seconds")
             else hi - lo) / g
            for lo, hi in out
        ]

    zpath = str(tmp_path / "ev_z")
    io.write_zordered(ev, zpath, zorder_by=["user_id", "ts"], n_files=8)
    cpath = str(tmp_path / "ev_range")
    io.write_clustered(ev, cpath, cluster_by=["user_id"], n_files=8)

    z_user, z_ts = spans(zpath, "user_id"), spans(zpath, "ts")
    c_ts = spans(cpath, "ts")
    # every z file covers a bounded slice of the leading column...
    assert max(z_user) <= 0.6, z_user
    # ...and the SECOND column is also bounded on average (one file may
    # straddle a Morton-curve jump), where range clustering prunes
    # nothing on it
    assert sum(z_ts) / len(z_ts) <= 0.8, z_ts
    assert sum(c_ts) / len(c_ts) >= 0.9, c_ts
    # lossless: same rows back
    assert spark.read.parquet(zpath).count() == ev.count()
