"""Group A — scans, sources, sinks (SURVEY.md §2.A): the crawler's
format surface. A crawler must read what it finds (Parquet/CSV/JSON,
with schema inference) and persist what it produces (DataFrame writes,
partitioned layouts) — BASELINE.json:7 "Spark SQL for metadata
extraction + DataFrame writes".

Scratch writes go to <repo>/.tmp (gitignored); every sink query writes
then READS BACK through a fresh scan, so the returned DataFrame proves
the round-trip, not just the write call.

Scale notes: partitioned writes (A5) are the 100 TB layout primitive —
partition column choices bound both write fan-out (files = partitions ×
tasks) and read pruning. `input_file_name()` (A6) is the per-file
lineage hook a crawler uses to map rows back to objects in the lake.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load, multi_count
from datalakecrawler_spark.registry import SUM_D, dsum, register

_TMP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
)
# Per-process scratch: concurrent drivers (pytest + a driver run) must
# never share a sink path — a reader in one process can observe a
# half-written file from the other (seen as a format_detect sniff race).
_TMP = os.path.join(_TMP_ROOT, f"p{os.getpid()}")


def _reap_stale_tmp() -> None:
    """Best-effort removal of scratch dirs left by dead processes."""
    import shutil

    try:
        entries = os.listdir(_TMP_ROOT)
    except OSError:
        return
    for d in entries:
        if not (d.startswith("p") and d[1:].isdigit()):
            continue
        if os.path.exists(f"/proc/{d[1:]}"):
            continue
        shutil.rmtree(os.path.join(_TMP_ROOT, d), ignore_errors=True)


_reap_stale_tmp()


def _tmp(name: str) -> str:
    os.makedirs(_TMP, exist_ok=True)
    return os.path.join(_TMP, name)


@register(
    "scan_parquet",
    group="A",
    oracle=f"""
    select count(*) as n_rows,
           count(distinct l_orderkey) as n_orders,
           {SUM_D.format('l_extendedprice')} as checksum
    from lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: full Parquet scan with count + content checksum."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("checksum"),
    )


@register(
    "scan_csv_infer",
    group="A",
    oracle="select * from nation",
)
def scan_csv_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: CSV with header + schema inference (crawler format support).
    Writes a CSV copy of `nation`, re-reads it inferring types, and
    returns the typed rows — content-checked against the source table."""
    path = _tmp("nation_csv")
    load(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", True
    ).csv(path)
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )
    # inference must recover integer keys — fail loudly if it didn't
    assert dict(df.dtypes)["n_nationkey"] in ("int", "bigint"), df.dtypes
    return df.orderBy("n_nationkey")


@register(
    "scan_json_infer",
    group="A",
    oracle="select * from region",
)
def scan_json_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: JSON-lines read with inferred schema, content-checked."""
    path = _tmp("region_json")
    load(spark, sf_dir, "region").write.mode("overwrite").json(path)
    return spark.read.json(path).orderBy("r_regionkey")


@register(
    "sink_parquet",
    group="A",
    oracle="""
    select o_orderkey, o_custkey, o_totalprice
    from orders where o_orderstatus = 'P'
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: DataFrame → Parquet → read-back round trip; the oracle
    checks the read-back CONTENT equals the source selection."""
    path = _tmp("orders_roundtrip")
    src = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    src.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    # r10 (guide §1.2): both assertion counts in ONE action/job
    n_src, n_back = multi_count(src, back)
    assert n_src == n_back, f"round-trip lost rows: {n_src} != {n_back}"
    return back.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "sink_partitioned",
    group="A",
    oracle=f"""
    select l_returnflag, l_linestatus, count(*) as cnt,
           {SUM_D.format('l_quantity')} as sum_qty
    from lineitem where l_returnflag = 'R'
    group by l_returnflag, l_linestatus
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: partitioned write + partition-pruned read-back. The filter on
    the partition column prunes directories (no data read outside
    l_returnflag=R) — verify with .explain → PartitionFilters. The
    oracle checks the pruned read-back content against the source."""
    path = _tmp("lineitem_by_flag")
    load(spark, sf_dir, "lineitem").write.mode("overwrite").partitionBy(
        "l_returnflag"
    ).parquet(path)
    back = spark.read.parquet(path).where(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_quantity").alias("sum_qty"),
    )


@register(
    "source_files_metadata",
    group="A",
    oracle="""
    select 'lineitem.parquet' as file_name, count(*) as n_rows
    from lineitem
    """,
)
def source_files_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: crawler file inventory — per-input-file row counts via
    input_file_name(). Absolute paths are env-specific, so only the
    basename is emitted — which the fixture layout (one parquet file
    per table) makes deterministic and oracle-checkable. Uses the
    `_metadata.file_name` hidden column on a direct parquet read: the
    metadata column makes the scan's logical plan distinct from the
    cached fixture frame, so Spark's CacheManager cannot substitute the
    InMemoryRelation (which has no file lineage — input_file_name()
    over it silently returns empty strings)."""
    from datalakecrawler_spark.io import table_path

    li = spark.read.parquet(table_path(sf_dir, "lineitem"))
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "scan_orc",
    group="A",
    oracle="select * from nation",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: ORC format support (crawlers meet ORC lakes as often as
    Parquet ones). Write a fixture out as ORC, read it back through the
    ORC reader (predicate pushdown works there too), verify count."""
    path = _tmp("nation_orc")
    src = load(spark, sf_dir, "nation")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    # r10 (guide §1.2): both assertion counts in ONE action/job
    n_back, n_src = multi_count(back, src)
    assert n_back == n_src
    return back.orderBy("n_nationkey")


@register(
    "catalog_crawl_run",
    group="B",
    oracle="""
    select 'customer' as dataset, count(*) as n_rows,
           count(distinct c_custkey) as pk_ndv from customer
    union all select 'orders', count(*), count(distinct o_orderkey) from orders
    union all select 'lineitem', count(*),
           count(distinct l_orderkey * 10 + l_linenumber) from lineitem
    union all select 'documents', count(*), count(distinct doc_id) from documents
    """,
)
def catalog_crawl_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: one crawl_run log row per crawled dataset — row count +
    primary-key NDV (the pair whose drift between runs signals dup
    ingestion or key corruption). lineitem's composite PK is encoded as
    orderkey*10+linenumber (≤ 7 lines/order in the fixtures)."""
    c = load(spark, sf_dir, "customer").agg(
        F.lit("customer").alias("dataset"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").alias("pk_ndv"),
    )
    o = load(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("dataset"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("pk_ndv"),
    )
    li = load(spark, sf_dir, "lineitem").agg(
        F.lit("lineitem").alias("dataset"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(
            F.col("l_orderkey") * 10 + F.col("l_linenumber")
        ).alias("pk_ndv"),
    )
    d = load(spark, sf_dir, "documents").agg(
        F.lit("documents").alias("dataset"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("pk_ndv"),
    )
    return c.unionByName(o).unionByName(li).unionByName(d)


@register(
    "sink_compact",
    group="A",
    oracle="""
    select count(*) as n_rows,
           cast(32 as integer) as files_before,
           cast(2 as integer) as files_after
    from orders
    """,
)
def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: small-files compaction — the lake-maintenance operator.
    Stage orders as 32 small files (the pathological layout produced by
    over-parallel writers), compact to 2 with a shuffle-free coalesce,
    verify row preservation. At 100 TB this runs per-partition-dir with
    target_size/maxPartitionBytes sizing; coalesce (not repartition)
    keeps it a narrow, no-shuffle rewrite.

    Promoted r4 from rows-only: the layout outcome is deterministic —
    repartition(32) writes exactly 32 non-empty part files, coalesce(2)
    exactly 2 — and n_rows is re-counted from the compacted files, so
    the oracle pins both row preservation and the file-count contract."""
    small = _tmp("orders_small_files")
    compacted = _tmp("orders_compacted")
    src = load(spark, sf_dir, "orders")
    src.repartition(32).write.mode("overwrite").parquet(small)
    staged = spark.read.parquet(small)
    staged.coalesce(2).write.mode("overwrite").parquet(compacted)
    back = spark.read.parquet(compacted)
    n_files_small = len([f for f in os.listdir(small) if f.endswith(".parquet")])
    n_files_comp = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    # r10 (guide §1.2): both assertion counts in ONE action/job
    n_back, n_src = multi_count(back, src)
    assert n_back == n_src, "compaction lost rows"
    assert n_files_comp < n_files_small, (n_files_comp, n_files_small)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(n_files_small).alias("files_before"),
        F.lit(n_files_comp).alias("files_after"),
    )


@register(
    "scan_binary_files",
    group="A",
    oracle="""
    select cast(10 as bigint) as n_files,
           cast(1 as integer) as sizes_match_os,
           cast(1 as integer) as all_nonempty
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: binary-file ingest — the multimodal on-ramp. Spark's
    binaryFile source lists files distributed and exposes (path,
    modificationTime, length, content); image/audio/video corpora enter
    the engine here before the mm_* decode/feature UDFs. Selecting only
    path+length prunes the content column so the files are NOT read —
    listing-only metadata pass, which is what a 100 TB crawl does first.

    Promoted r4 from rows-only (verdict-boolean pattern): absolute
    byte totals are environment-specific, so the result carries the
    CHECKS instead — the listing must see exactly the 10 fixture
    tables, every listed length must equal the size an independent
    os.stat reports, and every file must be non-empty. The oracle pins
    the verdicts as literals; pytest additionally reconciles the raw
    listing."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    listed = [
        (r["path"].removeprefix("file:"), r["length"])
        for r in files.select("path", "length").collect()
    ]
    sizes_ok = all(os.path.getsize(p) == n for p, n in listed)
    return spark.createDataFrame(
        [(len(listed), int(sizes_ok), int(all(n > 0 for _, n in listed)))],
        "n_files long, sizes_match_os int, all_nonempty int",
    )


@register(
    "scan_text_lines",
    group="A",
    oracle="""
    select count(*) as n_lines,
           cast(sum(len(text)) as bigint) as total_chars,
           min(len(text)) as min_chars,
           max(len(text)) as max_chars
    from documents
    """,
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: line-oriented text source — raw-corpus ingestion (the
    format most web-scrape dumps arrive in before they become parquet).
    Writes documents.text as .txt lines, reads it back with
    spark.read.text, and aggregates line stats; the oracle computes the
    same stats from the source column, so a hash-match proves the
    write→read round-trip is lossless. At 100 TB text files split by
    line boundary into maxPartitionBytes tasks — no small-file penalty
    as long as the writer salted the layout."""
    path = _tmp("documents_text")
    d = load(spark, sf_dir, "documents")
    d.select("text").write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_chars"),
        F.max(F.length("value")).alias("max_chars"),
    )


@register(
    "sink_csv_roundtrip",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as n_orders,
           {SUM_D.format('o_totalprice')} as total_price
    from orders group by o_orderstatus
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: CSV sink proven by content, not just by write success —
    write orders to CSV (header, explicit timestamp format), re-read
    with the original schema, aggregate; the oracle aggregates the
    parquet source, so the hash-match certifies the CSV round-trip
    preserved every value (the classic CSV hazards: type erasure,
    quoting, timestamp formatting)."""
    path = _tmp("orders_csv_roundtrip")
    o = load(spark, sf_dir, "orders")
    o.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(o.schema).option("header", "true").csv(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "crawl_incremental",
    group="B",
    oracle="""
    select cast(1 as bigint) as n_new_files,
           cast(1 as bigint) as n_expected_new
    """,
)
def crawl_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(Promoted r4 from rows-only: the staged outcome is fully
    deterministic — exactly ONE file is newer than the watermark and it
    is the planted one — so the oracle states it as literals.)

    B-ext: incremental crawl by modification-time high-watermark —
    the crawler primitive that makes re-crawling a 100 TB lake cheap:
    list files (metadata only, no reads), keep max(modificationTime)
    from the previous run, and re-profile only files newer than it.
    Staged here: snapshot A (2 files) → record watermark → new file
    arrives → the incremental pass must pick exactly the new file.
    Listing is driver-distributed (binaryFile source); at 100 TB the
    watermark lives in the catalog and the filter prunes the listing
    before any scan task launches."""
    import time

    # Per-process staging dir: the watermark logic is mtime-ordering
    # sensitive, so two sessions staging into one directory interleave
    # writes and corrupt each other's "what is new" answer (observed
    # when the pytest suite and a driver-sim sweep overlap). Content
    # is identical per process; only isolation matters.
    base = _tmp(f"incremental_crawl_{os.getpid()}")
    n = load(spark, sf_dir, "nation")
    n.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "t0_a"))
    n.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "t0_b"))

    def listing() -> DataFrame:
        return (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .load(base)
            .select("path", "modificationTime", "length")
        )

    watermark = listing().agg(F.max("modificationTime")).collect()[0][0]
    time.sleep(1.1)  # fs mtime granularity
    n.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "t1_new"))

    new_files = listing().where(F.col("modificationTime") > F.lit(watermark))
    return new_files.agg(
        F.count(F.lit(1)).alias("n_new_files"),
        F.count_if(F.col("path").contains("t1_new")).alias("n_expected_new"),
    )


@register(
    "catalog_skew_histogram",
    group="B",
    oracle="""
    with per_key as (
        select l_orderkey, count(*) as freq from lineitem group by 1
    )
    select freq, count(*) as n_keys,
           min(l_orderkey) as sample_key
    from per_key group by freq
    """,
)
def catalog_skew_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: join-key skew diagnostics — the multiplicity histogram of
    a join key (how many keys occur once, twice, …, N times). This is
    the measurement that decides between a plain shuffle join, AQE skew
    splitting, and salting (join_skew_salted): a heavy tail here means
    a straggler task there. Two partial-agg passes, output is
    max-multiplicity-sized — O(10) rows regardless of corpus size."""
    li = load(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("freq"))
    return per_key.groupBy("freq").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("l_orderkey").alias("sample_key"),
    )


_ORDER_COLS = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,"
    " o_orderpriority"
)


@register(
    "sink_merge_upsert",
    group="A",
    oracle=f"""
    with snapshot as (
        select * from orders where o_orderkey % 3 <> 0
    ),
    changes as (
        select o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 1.1 as o_totalprice, o_orderdate,
               o_orderpriority
        from orders where o_orderkey % 2 = 0
    ),
    merged as (
        select {_ORDER_COLS} from changes
        union all
        select {_ORDER_COLS} from snapshot s
        where not exists (select 1 from changes c
                          where c.o_orderkey = s.o_orderkey)
    )
    select o_orderstatus, count(*) as n_rows,
           {{SUM_D}} as total_price
    from merged group by 1
    """.replace("{SUM_D}", SUM_D.format("o_totalprice")),
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: MERGE/upsert sink — apply a changeset (updates for
    existing keys + inserts of new keys) onto a snapshot and persist
    the merged table. Snapshot = orders sans every 3rd key; changeset =
    every 2nd key with a repriced total. Copy-on-write formulation:
    changeset UNION ALL (snapshot ANTI JOIN changeset) — one shuffle on
    the merge key, no row-at-a-time updates; this is the plan a Delta/
    Iceberg MERGE compiles to. The merged result round-trips through a
    parquet sink (doubles are bit-exact through parquet), then is
    verified via a per-status micro-unit aggregate. Scale: partition
    the table on a merge-key-aligned column so the anti join prunes to
    touched partitions only, and let AQE size the rewrite tasks."""
    o = load(spark, sf_dir, "orders")
    snapshot = o.filter(F.col("o_orderkey") % 3 != 0)
    changes = o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    merged = changes.unionByName(
        snapshot.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
    )
    path = _tmp("orders_merged")
    merged.write.mode("overwrite").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "sink_bucketed_join",
    group="A",
    oracle=f"""
    select o.o_orderstatus, count(*) as n_lines,
           {SUM_D.format("l.l_extendedprice")} as total_price
    from orders o join lineitem l on o.o_orderkey = l.l_orderkey
    group by 1
    """,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: bucketed-table write + shuffle-free co-located join — the
    single biggest join optimization available to a recurring pipeline.
    Both fact tables are persisted with ``bucketBy(8, key).sortBy(key)``
    (external tables, explicit paths), so every later join on that key
    reads bucket i against bucket i: a SortMergeJoin with NO Exchange
    on either input — the shuffle is paid once at write time and
    amortized over every downstream run. At 100 TB this is the
    difference between re-shuffling 100 TB per query and zero; pick
    bucket counts ~= cluster cores × small factor and the same count on
    both tables (plan pinned in tests/test_plans.py)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    for name, df, key in [
        ("bkt_orders", o, "o_orderkey"),
        ("bkt_lineitem", li, "l_orderkey"),
    ]:
        spark.sql(f"drop table if exists {name}")
        (
            df.write.mode("overwrite")
            .option("path", _tmp(name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    bo = spark.table("bkt_orders")
    bl = spark.table("bkt_lineitem")
    return (
        bo.hint("merge")
        .join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )


@register(
    "crawl_format_detect",
    group="B",
    oracle="""
    select 'parquet' as detected_format, cast(1 as bigint) as n_files
    union all select 'orc', 1
    union all select 'json', 1
    union all select 'avro', 1
    union all select 'delimited', 1
    """,
)
def crawl_format_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: content-based format detection — a crawler must classify
    files that lie about (or lack) an extension before it can pick a
    reader. Stage 1 lists candidates with the binaryFile source
    selecting path only (content pruned → nothing is read). Stage 2
    sniffs the leading magic bytes per file inside an Arrow-batched
    pandas UDF: `PAR1` → parquet, `ORC` → orc, `Obj\\x01` → avro
    (the r5 native container codec makes it readable too), a `{`/`[`
    lead → JSON, else delimited text. At 100 TB that is one 8-byte ranged GET per
    object distributed over executors — never a full scan, never a
    driver loop. Promoted r4 from rows-only: one file of each format is
    planted (coalesce(1)), so the classification histogram is exactly
    one file per format and the oracle states it as literals."""

    # Plant one file of each format (extension deliberately unhelpful).
    root = _tmp("format_detect")
    nation = load(spark, sf_dir, "nation").limit(5)
    nation.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, "a.data"))
    nation.coalesce(1).write.mode("overwrite").orc(os.path.join(root, "b.data"))
    nation.coalesce(1).write.mode("overwrite").option("header", True).csv(
        os.path.join(root, "c.data")
    )
    nation.coalesce(1).write.mode("overwrite").json(os.path.join(root, "d.data"))
    from datalakecrawler_spark.sources.avro import write_avro

    write_avro(nation.coalesce(1), os.path.join(root, "e.data")).collect()

    @F.pandas_udf("string")
    def sniff(paths: pd.Series) -> pd.Series:
        def one(p: str) -> str:
            with open(p.removeprefix("file:"), "rb") as f:
                head = f.read(8)
            if head[:4] == b"PAR1":
                return "parquet"
            if head[:3] == b"ORC":
                return "orc"
            if head[:4] == b"Obj\x01":
                return "avro"
            lead = head.decode("utf-8", "ignore").lstrip()[:1]
            if lead in ("{", "["):
                return "json"
            return "delimited"

        return paths.map(one)

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path")
        .where(~F.element_at(F.split(F.col("path"), "/"), -1).startswith("_"))
        .where(~F.col("path").endswith(".crc"))
    )
    return (
        files.withColumn("detected_format", sniff(F.col("path")))
        .groupBy("detected_format")
        .agg(F.count(F.lit(1)).alias("n_files"))
    )


@register(
    "source_date_spine",
    group="A",
    oracle="""
    with b as (
      select min(cast(o_orderdate as date)) as mn,
             max(cast(o_orderdate as date)) as mx
      from orders
    ),
    spine as (
      select unnest(generate_series(mn, mx, interval 1 day))::date as day from b
    ),
    present as (select distinct cast(o_orderdate as date) as day from orders)
    select year(s.day) as yr, count(*) as n_missing
    from spine s left join present p on s.day = p.day
    where p.day is null
    group by 1
    """,
)
def source_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: generated date-spine source — a calendar dimension built
    with sequence()+explode spanning the data's own date range, anti-
    joined to the observed order dates to report gap days per year (the
    crawler's freshness/continuity check). The spine is generated, not
    scanned — a few thousand rows regardless of data scale — so the
    anti join broadcasts the spine side after `present` collapses the
    fact to distinct dates (one shuffle, dimension-sized output)."""
    o = load(spark, sf_dir, "orders")
    b = o.agg(
        F.min(F.to_date("o_orderdate")).alias("mn"),
        F.max(F.to_date("o_orderdate")).alias("mx"),
    )
    spine = b.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 day"))
        ).alias("day")
    )
    present = o.select(F.to_date("o_orderdate").alias("day")).distinct()
    return (
        spine.join(present, "day", "left_anti")
        .groupBy(F.year("day").cast("long").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n_missing"))
    )


@register(
    "join_partition_pruned_dynamic",
    group="A",
    oracle="""
    select 'F' as o_orderstatus, 'finalized' as status_name,
           count(*) as n_orders
    from orders where o_orderstatus = 'F'
    """,
)
def join_partition_pruned_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: dynamic partition pruning — the fact table is laid out
    partitioned by o_orderstatus; the join's dim side is filtered at
    runtime, and DPP injects the surviving dim keys as a partition
    filter into the fact scan, so unneeded partitions are never read.
    This is THE mechanism that makes star joins over partitioned lakes
    scan-efficient at 100 TB (static pruning can't see through a join).
    Rows-only (tmp paths); the physical plan's dynamicpruning subquery
    is pinned in tests/test_plans.py."""
    fact_path = _tmp("orders_by_status")
    dim_path = _tmp("status_dim")
    load(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(fact_path)
    spark.createDataFrame(
        [("F", "finalized"), ("O", "open"), ("P", "pending")],
        "status string, status_name string",
    ).write.mode("overwrite").parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("status_name") == "finalized")
    return (
        fact.join(dim, fact.o_orderstatus == dim.status)
        .groupBy("o_orderstatus", "status_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "sink_jsonl_roundtrip",
    group="A",
    oracle="select n_nationkey, n_name, n_regionkey from nation",
)
def sink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: JSON-lines sink + re-crawl — write a typed projection to
    newline-delimited JSON, read it back with schema inference (the
    crawler's JSON format path), verify row fidelity. Timestamps round-
    trip via ISO strings; the count assertion catches silent row loss.
    Rows-only (tmp paths are env-specific)."""
    path = _tmp("nation_jsonl")
    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    src.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    # r10 (guide §1.2): both assertion counts in ONE action/job
    n_src, n_back = multi_count(src, back)
    assert n_src == n_back, f"jsonl round-trip lost rows: {n_src} != {n_back}"
    return back.select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")


@register(
    "scan_csv_malformed",
    group="A",
    oracle="""
    select 23 as n_total, 3 as n_corrupt, 20 as n_dropmalformed_kept
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: crawler robustness on dirty CSV — a file with rows whose
    arity/types are broken is read three ways: PERMISSIVE (bad rows
    null-filled and captured in a corrupt-record column), DROPMALFORMED
    (bad rows silently dropped), and the counts reported side by side.
    A real crawl must quantify malformedness, not die on it (FAILFAST
    is the third mode, exercised in unit tests). Rows-only (tmp file).
    """
    import os

    path = _tmp("malformed_csv")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/data.csv", "w") as f:
        f.write("id,name,score\n")
        for i in range(20):
            f.write(f"{i},name_{i},{i * 1.5}\n")
        f.write("21,toofew\n")                  # arity too low
        f.write("22,name_22,notanumber\n")      # type error
        f.write("23,name_23,3.5,extracol\n")    # arity too high
    schema = "id int, name string, score double, _corrupt string"
    permissive = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema)
        .csv(f"{path}/data.csv")
        .cache()
    )
    # r10 (guide §1.2): both counts in ONE action/job
    n_total, n_corrupt = multi_count(
        permissive, permissive.where(F.col("_corrupt").isNotNull())
    )
    dropped = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema("id int, name string, score double")
        .csv(f"{path}/data.csv")
    )
    # count() alone would column-prune the scan to zero fields, so the
    # parser never sees the malformed values and drops nothing — a real
    # crawler counting "clean rows" must force a full-row parse. Do it
    # executor-side (VERDICT r1: collect() materialized all clean rows
    # on the driver): aggregate max(xxhash64(*)) next to the count —
    # the max genuinely depends on every column's value, so pruning
    # cannot remove the fields (a bare count(xxhash64(*)) gets
    # rewritten to count(1) because the hash is provably non-null, and
    # pruning returns). Only two scalars move to the driver.
    n_clean = (
        dropped.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*dropped.columns)).alias("_full_row_probe"),
        ).collect()[0]["n"]
    )
    return spark.createDataFrame(
        [(n_total, n_corrupt, n_clean)],
        "n_total long, n_corrupt long, n_dropmalformed_kept long",
    )


@register(
    "scan_parquet_schema_merge",
    group="A",
    oracle="""
    select 1 as gen, count(*) as n_rows, count(*) as n_null_added_col
    from nation
    union all
    select 2, count(*), 0 from nation
    """,
)
def scan_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: schema evolution on read — two parquet files written at
    different 'crawl generations' (the newer one adds a column), read
    together with mergeSchema=true: the union schema applies and the
    older file's missing column is null-filled. This is the read-side
    half of schema drift (catalog_schema_drift diffs the shapes; this
    op proves the engine still reads the lake mid-evolution). Returns
    per-generation row counts and null counts of the added column.
    Rows-only (tmp paths)."""
    path = _tmp("evolving_parquet")
    n = load(spark, sf_dir, "nation")
    n.select("n_nationkey", "n_name").write.mode("overwrite").parquet(f"{path}/gen=1")
    n.select(
        "n_nationkey", "n_name", F.col("n_regionkey").alias("region_added")
    ).write.mode("overwrite").parquet(f"{path}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "region_added" in merged.columns, merged.columns
    return (
        merged.groupBy("gen")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("region_added").isNull().cast("long")).alias(
                "n_null_added_col"
            ),
        )
        .orderBy("gen")
    )


@register(
    "sink_compression_codecs",
    group="A",
    oracle="""
    select 'snappy' as codec, count(*) as n_rows,
           cast(1 as integer) as readback_ok,
           cast(1 as integer) as compresses
    from documents
    union all
    select 'zstd', count(*), 1, 1 from documents
    union all
    select 'none', count(*), 1, 1 from documents
    """,
)
def sink_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: storage-codec comparison — the same dataset written with
    snappy / zstd / uncompressed parquet, re-read for fidelity, with
    on-disk bytes measured per codec (the crawler's storage-tuning
    signal; zstd typically wins at rest, snappy on CPU).

    Promoted r4 from rows-only (verdict-boolean pattern): absolute
    byte counts are environment-dependent, so the result carries the
    row-count (content check, oracle-recomputed from the source table)
    plus two measured verdicts — the re-read returned every row, and
    each compressed codec produced strictly fewer bytes than the
    uncompressed write ('none' reports its trivially-true baseline).
    Text documents compress several-fold, so the strict inequality is
    robust at any sf."""
    import os

    src = load(spark, sf_dir, "documents")
    codecs = ("snappy", "zstd", "none")
    sizes = {}
    for codec in codecs:
        path = _tmp(f"docs_codec_{codec}")
        src.write.mode("overwrite").option("compression", codec).parquet(path)
        sizes[codec] = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    # r10 (guide §1.2): the source + three read-back counts in ONE
    # action/job instead of four sequential driver actions
    n_src, *n_backs = multi_count(
        src, *[spark.read.parquet(_tmp(f"docs_codec_{c}")) for c in codecs]
    )
    measured = {
        c: (n_back, sizes[c]) for c, n_back in zip(codecs, n_backs)
    }
    rows = [
        (
            codec,
            measured[codec][0],
            int(measured[codec][0] == n_src),
            int(codec == "none" or measured[codec][1] < measured["none"][1]),
        )
        for codec in ("snappy", "zstd", "none")
    ]
    return spark.createDataFrame(
        rows, "codec string, n_rows long, readback_ok int, compresses int"
    )


@register(
    "scan_format_fidelity",
    group="A",
    oracle="""
    with cs as (
      select count(*) as n, cast(sum(s_suppkey) as bigint) as k,
             cast(sum(cast(floor(s_acctbal * 1e6 + 0.5) as bigint)) as bigint) as b
      from supplier
    )
    select 'parquet_src' as format, n as n_rows, k as key_sum, b as bal_micro from cs
    union all select 'parquet', n, k, b from cs
    union all select 'csv', n, k, b from cs
    union all select 'json', n, k, b from cs
    """,
)
def scan_format_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: cross-format fidelity audit — the same dataset persisted
    as parquet, CSV (schema re-inferred), and JSON-lines, re-read and
    checksummed: counts and integer/micro-unit sums must agree across
    all three, proving the crawler's format readers see one truth.
    Catches the classic CSV silent-type-degradation class of bug.
    Rows-only (tmp paths); the cross-format equality asserts are the
    hard check."""
    src = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )

    def checksum(df: DataFrame):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s_suppkey").alias("key_sum"),
            F.sum(F.floor(F.col("s_acctbal") * 1e6 + 0.5)).alias("bal_micro"),
        ).collect()[0]
        return (r["n"], r["key_sum"], r["bal_micro"])

    base = checksum(src)
    rows = [("parquet_src",) + base]
    p1 = _tmp("fid_parquet")
    src.write.mode("overwrite").parquet(p1)
    rows.append(("parquet",) + checksum(spark.read.parquet(p1)))
    p2 = _tmp("fid_csv")
    src.write.mode("overwrite").option("header", True).csv(p2)
    rows.append(
        ("csv",)
        + checksum(
            spark.read.option("header", True).option("inferSchema", True).csv(p2)
        )
    )
    p3 = _tmp("fid_json")
    src.write.mode("overwrite").json(p3)
    rows.append(("json",) + checksum(spark.read.json(p3)))
    assert all(r[1:] == base for r in rows), rows
    return spark.createDataFrame(
        rows, "format string, n_rows long, key_sum long, bal_micro long"
    )


_Z_BITS = 16  # covers keys < 65536 (sf0.1 part/supplier keys fit easily)


def _z_sql(a: str, b: str, shiftleft: str, shiftright: str) -> str:
    """Z-value (Morton code) of two integer keys as a bit-interleave
    expression, rendered per dialect (Spark: shiftleft/shiftright
    functions; DuckDB: <</>> operators via the same format strings)."""
    terms = []
    for i in range(_Z_BITS):
        bit_a = f"({shiftright.format(a, i)} & 1)"
        bit_b = f"({shiftright.format(b, i)} & 1)"
        terms.append(shiftleft.format(bit_a, 2 * i))
        terms.append(shiftleft.format(bit_b, 2 * i + 1))
    return " + ".join(terms)


_Z_SPARK = _z_sql(
    "l_partkey", "l_suppkey", "shiftleft({0}, {1})", "shiftright({0}, {1})"
)
_Z_DUCK = _z_sql("l_partkey", "l_suppkey", "(({0}) << {1})", "(({0}) >> {1})")


@register(
    "layout_zorder_cluster",
    group="A",
    oracle=f"""
    with z as (
        select l_partkey, l_suppkey,
               ({_Z_DUCK}) >> 16 as z_bucket
        from lineitem
    )
    select z_bucket, count(*) as n_rows,
           min(l_partkey) as min_part, max(l_partkey) as max_part,
           min(l_suppkey) as min_supp, max(l_suppkey) as max_supp
    from z group by z_bucket
    """,
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Z-order (Morton) clustering — the multi-dimensional
    layout primitive behind Delta/Iceberg OPTIMIZE ZORDER BY. Each
    row's (l_partkey, l_suppkey) is bit-interleaved into a single
    z-value; sorting/partitioning by it co-locates rows that are close
    in BOTH dimensions, so min/max file statistics prune scans on
    either key (a one-dimensional sort can only serve one). Here the
    z-value is computed with pure integer bit arithmetic (identical
    expression text in both engines — exact, no float anywhere) and
    rows are summarized per coarse z-bucket (z >> 16, i.e. key bits ≥ 8 of each dimension): the per-bucket min/max
    spans of BOTH keys are what a writer would persist as file-skipping
    stats. At 100 TB: `repartitionByRange(z)` + `sortWithinPartitions(z)`
    before the write turns these buckets into physical files."""
    li = load(spark, sf_dir, "lineitem")
    z = li.select(
        "l_partkey",
        "l_suppkey",
        F.shiftright(F.expr(_Z_SPARK), 16).alias("z_bucket"),
    )
    return z.groupBy("z_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )


@register(
    "sink_sorted_layout",
    group="A",
    oracle="""
    select count(*) as n_rows,
           cast(4 as bigint) as n_files,
           cast(1 as integer) as spans_disjoint,
           min(l_shipdate) as min_shipdate,
           max(l_shipdate) as max_shipdate
    from lineitem
    """,
)
def sink_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: range-partitioned sorted write —
    `repartitionByRange(l_shipdate)` + `sortWithinPartitions` before
    the Parquet write produces files with DISJOINT shipdate ranges, so
    a date-filtered read prunes whole files from their footer min/max
    alone (the 1-D complement of layout_zorder_cluster). At 100 TB this
    is the standard time-series layout: the range partitioner samples
    the key distribution, so files are size-balanced even when the key
    is skewed.

    Promoted r4 from rows-only (verdict-boolean pattern): per-file rows
    are keyed by env-specific file names and the range boundaries are
    sampler-chosen, so the result carries what IS deterministic — total
    rows and the global span (content, oracle-recomputed from the
    source), the file count (4 non-empty range partitions), and the
    measured disjointness verdict: sorted by min_shipdate, every file's
    min must be strictly after the previous file's max (computed with a
    window lag over the per-file span table)."""
    path = _tmp("lineitem_sorted_by_shipdate")
    li = load(spark, sf_dir, "lineitem")
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), "l_shipdate"
    )
    spans = back.groupBy("file").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )
    w = Window.orderBy("min_shipdate")
    return (
        spans.withColumn("prev_max", F.lag("max_shipdate").over(w))
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_files"),
            F.min(
                (
                    F.col("prev_max").isNull()
                    | (F.col("min_shipdate") > F.col("prev_max"))
                ).cast("int")
            ).alias("spans_disjoint"),
            F.min("min_shipdate").alias("min_shipdate"),
            F.max("max_shipdate").alias("max_shipdate"),
        )
    )


@register(
    "source_python_datasource",
    group="A",
    oracle="""
    select 'parquet' as ext, cast(10 as bigint) as n_files,
           cast(1 as integer) as bytes_match_os
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: the crawler's file-inventory source built on Spark 4's
    Python Data Source API (`spark.read.format("lakefiles")`) — the
    lake directory becomes a DataFrame of file rows, listed in
    PARALLEL: one input partition per top-level entry, executed by the
    executors via the DataSource partitions()/read() contract (a real
    object-store crawler shards its LIST calls exactly like this;
    the driver never walks the tree). Summarized per extension so the
    contract row set is stable.

    Promoted r4 from rows-only (verdict-boolean pattern): absolute
    byte totals are env-specific, so per-extension rows carry the
    file count plus a measured verdict — the parallel-listed sizes must
    sum to exactly what an independent os.walk of the same root
    reports. The property test additionally reconciles the raw listing
    path-by-path."""
    from datalakecrawler_spark.sources.connectors import register_lakefiles

    if not register_lakefiles(spark):  # pragma: no cover - Spark < 4
        raise NotImplementedError("Python DataSource API requires Spark 4")
    inv = spark.read.format("lakefiles").option("path", sf_dir).load()
    per_ext = (
        inv.groupBy("ext")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").alias("total_bytes"),
        )
        .orderBy("ext")
        .collect()
    )
    truth = {}
    for root, _dirs, fs in os.walk(sf_dir):
        for f in fs:
            ext = os.path.splitext(f)[1].lstrip(".")
            sz = os.path.getsize(os.path.join(root, f))
            n, b = truth.get(ext, (0, 0))
            truth[ext] = (n + 1, b + sz)
    rows = [
        (
            r["ext"],
            r["n_files"],
            int(truth.get(r["ext"], (0, 0)) == (r["n_files"], r["total_bytes"])),
        )
        for r in per_ext
    ]
    return spark.createDataFrame(
        rows, "ext string, n_files long, bytes_match_os int"
    )


@register(
    "scan_xml_infer",
    group="A",
    oracle="select r_regionkey, r_name from region",
)
def scan_xml_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: XML read with schema inference (Spark ≥4 ships the XML
    datasource natively — no external package). Stages `region` as an
    XML document, re-reads it with rowTag inference, and asserts the
    integer key type was recovered. Content-checked against the
    region table: the round-tripped rows must hash-match the oracle's
    `select r_regionkey, r_name from region` (same contract wording as
    the other upgraded A-group scans). At scale XML lands as many
    files and the reader parallelizes per-file like every other
    DataSource V2 format."""
    path = _tmp("region_xml")
    rows = load(spark, sf_dir, "region").orderBy("r_regionkey").collect()
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "region.xml"), "w") as f:
        f.write("<regions>\n")
        for r in rows:
            name = r["r_name"].replace("&", "&amp;").replace("<", "&lt;")
            f.write(
                f"  <region><r_regionkey>{r['r_regionkey']}</r_regionkey>"
                f"<r_name>{name}</r_name></region>\n"
            )
        f.write("</regions>\n")
    df = spark.read.option("rowTag", "region").format("xml").load(path)
    assert dict(df.dtypes)["r_regionkey"] in ("int", "bigint"), df.dtypes
    return df.select("r_regionkey", "r_name").orderBy("r_regionkey")


@register(
    "crawl_rename_detect",
    group="B",
    oracle="""
    select 'stable.csv' as name_v1, 'stable.csv' as name_v2,
           'unchanged' as change
    union all
    select 'oldname.csv', 'newname.csv', 'renamed'
    union all
    select cast(null as varchar), 'brandnew.csv', 'added'
    """,
)
def crawl_rename_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler rename detection: between two crawl listings, a file
    whose content hash matches but whose path changed is a RENAME, not
    a delete+add — getting this right preserves dataset lineage and
    avoids re-profiling terabytes. Stages two generations (one file
    kept, one renamed, one genuinely new), lists both with binaryFile,
    and full-outer-joins on content md5: matched-both-sides+path-diff →
    renamed; right-only → added; left-only → deleted. The hash join is
    the only shuffle; content hashing streams file bytes on executors
    (binaryFile source), never the driver. Promoted r4 from rows-only:
    the result drops to basenames, so the classification triple set is
    fully deterministic and the oracle states it as literals."""
    import os
    import shutil

    root = _tmp(f"rename_detect_{os.getpid()}")
    v1, v2 = f"{root}/v1", f"{root}/v2"
    for d in (v1, v2):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    with open(f"{v1}/stable.csv", "w") as f:
        f.write("a,b\n1,2\n")
    with open(f"{v1}/oldname.csv", "w") as f:
        f.write("x,y\n3,4\n")
    shutil.copy(f"{v1}/stable.csv", f"{v2}/stable.csv")
    shutil.copy(f"{v1}/oldname.csv", f"{v2}/newname.csv")
    with open(f"{v2}/brandnew.csv", "w") as f:
        f.write("p,q\n5,6\n")

    def listing(path: str, gen: str) -> DataFrame:
        return (
            spark.read.format("binaryFile")
            .load(path)
            .select(
                F.element_at(F.split("path", "/"), -1).alias(f"name_{gen}"),
                F.md5("content").alias("content_md5"),
            )
        )

    a = listing(v1, "v1")
    b = listing(v2, "v2")
    j = a.join(b, "content_md5", "full_outer").select(
        "content_md5",
        "name_v1",
        "name_v2",
        F.when(F.col("name_v1").isNull(), "added")
        .when(F.col("name_v2").isNull(), "deleted")
        .when(F.col("name_v1") != F.col("name_v2"), "renamed")
        .otherwise("unchanged")
        .alias("change"),
    )
    changes = {r["change"] for r in j.collect()}
    assert changes == {"unchanged", "renamed", "added"}, changes
    return j.select("name_v1", "name_v2", "change")


@register(
    "crawl_duplicate_files",
    group="B",
    oracle="""
    select 'metrics.csv' as keeper, cast(2 as bigint) as n_copies,
           cast(21 as bigint) as file_bytes,
           cast(21 as bigint) as reclaimable_bytes
    union all
    select 'users.csv', 1, 20, 0
    """,
)
def crawl_duplicate_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler FILE-level dedup: find byte-identical files under
    different paths — the storage-reclamation / copy-detection pass a
    lake crawler runs before any row-level dedup (a re-uploaded or
    team-copied dataset wastes its full size and double-counts in
    every downstream profile). Stages a small lake (two distinct
    files, one exact copy under a different subdir/name), lists it
    with the binaryFile source, hashes content on the EXECUTORS
    (sha2-256 streams the bytes; the driver never sees content), and
    rolls up per content hash: duplicate groups, reclaimable bytes,
    canonical keeper (lexicographically first path — deterministic).
    At 100 TB the content hash comes from the object store's ETag /
    a first-MB fingerprint instead of a full read, and the rollup
    shuffles 32-byte digests — the same linear shape as dedup_exact.
    Promoted r4 from rows-only: keeper basenames, copy counts, and
    byte sizes of the staged content are fully deterministic, so the
    oracle states the expected rollup as literals (metrics.csv = 21
    staged bytes × 2 copies → 21 reclaimable; users.csv unique)."""
    import os
    import shutil

    root = _tmp(f"dupfiles_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(f"{root}/teamA", exist_ok=True)
    os.makedirs(f"{root}/teamB", exist_ok=True)
    with open(f"{root}/teamA/metrics.csv", "w") as f:
        f.write("day,clicks\n1,10\n2,20\n")
    with open(f"{root}/teamA/users.csv", "w") as f:
        f.write("uid,name\n1,ann\n2,bo\n")
    shutil.copy(f"{root}/teamA/metrics.csv", f"{root}/teamB/metrics_copy.csv")

    inv = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            "path",
            "length",
            F.sha2("content", 256).alias("content_sha"),
        )
    )
    groups = inv.groupBy("content_sha").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("path").alias("keeper_path"),
        F.max("length").alias("file_bytes"),
        ((F.count(F.lit(1)) - 1) * F.max("length")).alias("reclaimable_bytes"),
    )
    out = (
        groups.select(
            F.element_at(F.split("keeper_path", "/"), -1).alias("keeper"),
            "n_copies",
            "file_bytes",
            "reclaimable_bytes",
        )
        .orderBy(F.col("n_copies").desc(), "keeper")
    )
    rows = out.collect()
    dup = [r for r in rows if r["n_copies"] > 1]
    assert len(dup) == 1 and dup[0]["n_copies"] == 2, rows
    assert dup[0]["reclaimable_bytes"] == dup[0]["file_bytes"], rows
    return out
