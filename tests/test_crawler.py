"""End-to-end crawler tests: discovery, schema inference, profiling
accuracy, and catalog persistence over the fixture lake."""

from __future__ import annotations

import os

from datalakecrawler_spark import crawler
from datalakecrawler_spark.io import TABLES, load
from tests.conftest import SF_DIR


def test_discover_finds_all_fixture_datasets(spark):
    found = {name for name, _, _ in crawler.discover(SF_DIR)}
    assert set(TABLES) <= found


def test_crawl_counts_match_direct_reads(spark):
    catalog = crawler.crawl(spark, SF_DIR)
    counts = {r["dataset"]: r["num_rows"] for r in catalog["dataset"].collect()}
    for t in ["orders", "lineitem", "documents", "embeddings"]:
        assert counts[t] == load(spark, SF_DIR, t).count()
    fmts = {r["dataset"]: r["format"] for r in catalog["dataset"].collect()}
    assert all(f == "parquet" for f in fmts.values())


def test_crawl_schema_fields_complete(spark):
    catalog = crawler.crawl(spark, SF_DIR)
    fields = catalog["schema_field"].collect()
    by_ds = {}
    for r in fields:
        by_ds.setdefault(r["dataset"], []).append(r)
    li = sorted(by_ds["lineitem"], key=lambda r: r["position"])
    assert [r["field_name"] for r in li][:4] == [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
    ]
    assert li[0]["spark_type"] == "bigint"


def test_crawl_profile_sane(spark):
    catalog = crawler.crawl(spark, SF_DIR)
    prof = {
        (r["dataset"], r["field_name"]): r
    for r in catalog["column_profile"].collect()}
    qty = prof[("lineitem", "l_quantity")]
    assert qty["null_count"] == 0
    assert qty["min_value"] >= 1.0 and qty["max_value"] <= 50.0
    lang = prof[("documents", "lang")]
    assert lang["min_value"] is None  # non-numeric → no min/max
    assert 4 <= lang["approx_ndv"] <= 6  # 5 languages ± HLL error


def test_crawl_detects_mixed_formats(spark, tmp_path):
    """Discovery classifies a lake with parquet + csv + json datasets."""
    import shutil

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    shutil.copy(f"{SF_DIR}/region.parquet", f"{lake}/region.parquet")
    load(spark, SF_DIR, "nation").write.option("header", True).csv(f"{lake}/nation_csv")
    load(spark, SF_DIR, "region").write.json(f"{lake}/region_json")
    found = {name: fmt for name, _, fmt in crawler.discover(lake)}
    assert found == {
        "region": "parquet",
        "nation_csv": "csv",
        "region_json": "json",
    }
    catalog = crawler.crawl(spark, lake)
    counts = {r["dataset"]: r["num_rows"] for r in catalog["dataset"].collect()}
    assert counts == {"region": 5, "nation_csv": 25, "region_json": 5}


def test_crawl_detects_lakehouse_tables(spark, tmp_path):
    """Table-format markers must win over extension sniffing: a Delta
    root is full of parquet files, but a naive parquet read would
    include the logically-removed ones — the crawler must catalog the
    LIVE snapshot row count. Iceberg roots (parquet + avro manifests)
    previously fell through discovery entirely."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.sources.delta_native import write_delta
    from datalakecrawler_spark.sources.hudi_native import write_hudi
    from datalakecrawler_spark.sources.iceberg_native import write_iceberg

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    src = load(spark, SF_DIR, "orders")
    # delta: overwrite twice → stale parquet of the F-snapshot on disk
    write_delta(src.where(F.col("o_orderstatus") == "F"),
                f"{lake}/orders_delta", "overwrite")
    write_delta(src.where(F.col("o_orderstatus") == "O"),
                f"{lake}/orders_delta", "overwrite")
    write_iceberg(load(spark, SF_DIR, "nation"), f"{lake}/nation_ice", "overwrite")
    # hudi: upsert leaves the superseded base files on disk — a naive
    # parquet read would double-count the rewritten file group
    cust = load(spark, SF_DIR, "customer")
    write_hudi(cust, f"{lake}/cust_hudi", "c_custkey",
               "19700101000000001", op="bulk_insert")
    write_hudi(cust.limit(50), f"{lake}/cust_hudi", "c_custkey",
               "19700101000000002", op="upsert")
    load(spark, SF_DIR, "region").write.parquet(f"{lake}/region_pq")

    found = {name: fmt for name, _, fmt in crawler.discover(lake)}
    assert found == {
        "orders_delta": "delta",
        "nation_ice": "iceberg",
        "cust_hudi": "hudi",
        "region_pq": "parquet",
    }
    catalog = crawler.crawl(spark, lake)
    counts = {r["dataset"]: r["num_rows"] for r in catalog["dataset"].collect()}
    n_live = src.where(F.col("o_orderstatus") == "O").count()
    n_stale = src.where(F.col("o_orderstatus") == "F").count()
    assert counts["orders_delta"] == n_live != n_live + n_stale
    assert counts["nation_ice"] == 25
    assert counts["cust_hudi"] == cust.count()  # live slices only
    assert counts["region_pq"] == 5


def test_connector_stubs_fail_actionably(spark):
    """Lakehouse connectors: every format falls back to a native
    pure-Python implementation when its jar is absent (their error on
    a missing PATH is file-not-found, not jar-not-found); unknown
    format → ValueError."""
    import pytest

    from datalakecrawler_spark.sources import connectors

    avail = connectors.available_formats()
    assert set(avail) == {"delta", "iceberg", "hudi", "avro"}
    native_fallback = {
        "avro": (FileNotFoundError, "no .avro files"),
        "delta": (FileNotFoundError, "no Delta log"),
        "iceberg": (FileNotFoundError, "no Iceberg metadata"),
        "hudi": (FileNotFoundError, "no Hudi timeline"),
    }
    for fmt, ok in avail.items():
        if ok:
            continue
        if fmt in native_fallback:
            exc, msg = native_fallback[fmt]
            with pytest.raises(exc, match=msg):
                connectors.open_table(spark, fmt, "/nonexistent")
        else:
            with pytest.raises(NotImplementedError, match=fmt):
                connectors.open_table(spark, fmt, "/nonexistent")
    with pytest.raises(ValueError, match="unknown lakehouse format"):
        connectors.open_table(spark, "excel", "/x")


def test_format_detect_classifies_all_planted_formats(spark):
    """Magic-byte sniffing must classify each planted file (extensions
    are deliberately unhelpful '.data') by content alone."""
    from datalakecrawler_spark.registry import queries

    rows = queries()["crawl_format_detect"](spark, "/root/testdata/sf0.001").collect()
    got = {r["detected_format"]: r["n_files"] for r in rows}
    assert got == {"parquet": 1, "orc": 1, "json": 1, "avro": 1, "delimited": 1}


def test_cli_list_and_query(capsys):
    """`python -m datalakecrawler_spark` surface: list filters by group;
    query runs a registered operator."""
    from datalakecrawler_spark.__main__ import main

    assert main(["list", "--group", "F"]) == 0
    out = capsys.readouterr().out
    assert "events_trigram_paths" in out and "win_agg_over" in out
    assert main(["query", "catalog_sample_rows", "--sf-dir", SF_DIR]) == 0
    out = capsys.readouterr().out
    assert "NATION_" in out
    assert main(["query", "no_such_query"]) == 2


def test_verify_module_reports_match_and_rows_only(spark):
    """The self-verification surface agrees with the test harness: a
    known-good oracle query reports match, a rows-only one reports
    rows-only, and an induced mismatch is detected (not swallowed)."""
    from datalakecrawler_spark import registry
    from datalakecrawler_spark.verify import VerifyResult, verify_queries

    res = {
        r.name: r
        for r in verify_queries(
            spark, SF_DIR, ["scan_parquet", "mm_embed_pca"]
        )
    }
    assert res["scan_parquet"].status == "match"
    assert res["mm_embed_pca"].status == "rows-only"

    # induce a mismatch through a doctored registry entry
    good = registry.all_queries()["scan_parquet"]
    bad = registry.Query(
        "scan_parquet", good.fn, good.oracle.replace("lineitem", "orders"),
        good.group, good.tags,
    )
    orig = registry._REGISTRY["scan_parquet"]
    registry._REGISTRY["scan_parquet"] = bad
    try:
        r = verify_queries(spark, SF_DIR, ["scan_parquet"])[0]
        assert isinstance(r, VerifyResult) and r.status in ("mismatch", "error")
    finally:
        registry._REGISTRY["scan_parquet"] = orig


def test_table_maintenance_report_thresholds(spark, tmp_path):
    """Recommendations flip exactly at the thresholds, and the report
    is metadata-only (works after data files are present but never
    scanned — counts come from the log/manifests/timeline)."""
    from datalakecrawler_spark.crawler import table_maintenance_report
    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.sources.iceberg_native import write_iceberg

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    nation = load(spark, SF_DIR, "nation")
    # healthy iceberg: 1 snapshot, 1 manifest
    write_iceberg(nation, f"{lake}/ok_ice", "overwrite")
    # snapshot-heavy but manifest-light: overwrites don't accumulate
    # manifests, so the expiry recommendation fires
    p = f"{lake}/snappy_ice"
    for _ in range(6):
        write_iceberg(nation.limit(3), p, "overwrite")
    rep = {
        r["dataset"]: r
        for r in table_maintenance_report(spark, lake).collect()
    }
    assert rep["ok_ice"]["recommendation"] == "ok"
    assert rep["snappy_ice"]["recommendation"] == "expire_snapshots"
    assert rep["snappy_ice"]["n_metadata_objects"] == 1  # one live manifest


def test_convert_feasibility_dry_runs_leave_no_trace(spark, tmp_path):
    """The feasibility probes run the converters' real gates but must
    write NOTHING — no Iceberg metadata, no Hudi timeline, no Delta
    log appears anywhere, and the source tables stay untouched."""
    import glob

    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.sources.delta_native import (
        delete_delta,
        write_delta,
    )
    from datalakecrawler_spark.sources.hudi_native import write_hudi
    from datalakecrawler_spark.sources.iceberg_native import write_iceberg

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    nation = load(spark, SF_DIR, "nation")
    write_delta(nation, f"{lake}/d", "overwrite")
    delete_delta(spark, f"{lake}/d", "n_nationkey = 3")
    write_iceberg(nation, f"{lake}/i", "overwrite", format_version=2)
    write_hudi(nation, f"{lake}/h", "n_nationkey", "19700101000000001",
               op="bulk_insert")
    before = sorted(glob.glob(f"{lake}/**", recursive=True))
    feas = {r["dataset"]: r for r in crawler.convert_feasibility(spark, lake)}
    assert sorted(glob.glob(f"{lake}/**", recursive=True)) == before
    assert feas["d"] == {
        "dataset": "d", "format": "delta", "to_delta": "is",
        "to_iceberg": "ok", "to_hudi": "blocked",  # carries a DV
    }
    assert feas["i"]["to_delta"] == "ok"
    assert feas["i"]["to_hudi"] == "ok (via delta)"
    assert feas["h"]["to_delta"] == "ok"
    assert feas["h"]["to_iceberg"] == "ok (via delta)"


def test_convert_feasibility_nongate_error_does_not_crash_report(
    spark, tmp_path
):
    """ADVICE r8 (crawler _probe): converters raise TypeError for
    unsupported types (variant) — one such table must map to a
    distinct 'error' status instead of crashing the whole per-lake
    feasibility report."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.sources.delta_native import write_delta

    lake = str(tmp_path / "lake_err")
    os.makedirs(lake)
    nation = load(spark, SF_DIR, "nation")
    write_delta(nation, f"{lake}/ok_d", "overwrite")
    write_delta(
        nation.select(
            "n_nationkey",
            F.parse_json(
                F.format_string('{"k": %s}', "n_regionkey")
            ).alias("v"),
        ),
        f"{lake}/variant_d",
        "overwrite",
    )
    feas = {r["dataset"]: r for r in crawler.convert_feasibility(spark, lake)}
    assert feas["ok_d"]["to_iceberg"] == "ok"
    assert feas["variant_d"]["to_iceberg"] == "error"
    assert feas["variant_d"]["to_hudi"] in ("ok", "blocked", "error")


def test_lakehouse_cursor_incremental_recrawl(spark, tmp_path):
    """Txlog-cursor re-crawl (r9): unchanged tables verdict from one
    metadata probe — their paths never reach the reader — while
    changed tables re-profile through the native readers."""
    from datalakecrawler_spark.io import load
    from datalakecrawler_spark.sources.delta_native import write_delta
    from datalakecrawler_spark.sources.hudi_native import write_hudi
    from datalakecrawler_spark.sources.iceberg_native import write_iceberg

    lake = str(tmp_path / "lake_cursors")
    os.makedirs(lake)
    nation = load(spark, SF_DIR, "nation")
    write_delta(nation.where("n_nationkey < 10"), f"{lake}/d", "overwrite")
    write_iceberg(nation, f"{lake}/i", "overwrite", format_version=2)
    write_hudi(nation, f"{lake}/h", "n_nationkey", "19700101000000001",
               op="bulk_insert")
    c0 = crawler.lakehouse_cursors(lake)
    assert set(c0) == {"d", "h", "i"}
    # first crawl with no prev: everything is new/changed
    res0 = {r["dataset"]: r for r in
            crawler.crawl_incremental_lakehouse(spark, lake)}
    assert all(r["changed"] for r in res0.values())
    assert res0["d"]["n_rows"] == 10 and res0["i"]["n_rows"] == 25
    # idempotent re-crawl: nothing changed, nothing read
    reads = []
    orig = crawler._read

    def tracked(sp, path, fmt):
        reads.append(path)
        return orig(sp, path, fmt)

    crawler._read = tracked
    try:
        res1 = crawler.crawl_incremental_lakehouse(spark, lake, c0)
    finally:
        crawler._read = orig
    assert reads == []
    assert all(not r["changed"] and r["n_rows"] is None for r in res1)
    # one delta append, one hudi upsert: exactly those re-read
    write_delta(nation.where("n_nationkey >= 10"), f"{lake}/d", "append")
    write_hudi(
        nation.where("n_nationkey = 1"), f"{lake}/h", "n_nationkey",
        "19700101000000002", op="upsert",
    )
    res2 = {r["dataset"]: r for r in
            crawler.crawl_incremental_lakehouse(spark, lake, c0)}
    assert res2["d"]["changed"] and res2["d"]["n_rows"] == 25
    assert res2["h"]["changed"] and res2["h"]["n_rows"] == 25
    assert not res2["i"]["changed"] and res2["i"]["n_rows"] is None
