"""Native Delta-protocol tests (sources/delta_native.py): on-disk log
conformance with the public PROTOCOL.md layout, append/overwrite/time-
travel semantics, capability gates, and scan pushdown through the
resolved file list. The registered ops are additionally oracle-checked
by test_registry_parity."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.sources.delta_native import (
    delta_history,
    read_delta,
    write_delta,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def table(spark, tmp_path):
    """A two-commit table: v0 = F orders (overwrite), v1 = P orders
    appended."""
    path = str(tmp_path / "delta_tbl")
    src = load(spark, SF_DIR, "orders")
    v0 = write_delta(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    v1 = write_delta(src.where(F.col("o_orderstatus") == "P"), path, "append")
    assert (v0, v1) == (0, 1)
    return path, src


def _commit_actions(path: str, version: int) -> list[dict]:
    f = os.path.join(path, "_delta_log", f"{version:020d}.json")
    with open(f) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def test_log_layout_matches_protocol(table):
    """Commit 0 carries protocol(reader 1/writer 2) + metaData with a
    parquet format and a parseable schemaString + one add per data
    file; names are the zero-padded 20-digit convention."""
    path, _ = table
    names = sorted(os.listdir(os.path.join(path, "_delta_log")))
    assert names[0] == "00000000000000000000.json"
    assert names[1] == "00000000000000000001.json"
    a0 = _commit_actions(path, 0)
    kinds = [next(iter(a)) for a in a0]
    assert kinds[0] == "protocol"
    # orders carries a TIMESTAMP_NTZ column (o_orderdate), so the
    # creating commit must declare the feature per protocol
    assert a0[0]["protocol"] == {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["timestampNtz"],
        "writerFeatures": ["timestampNtz"],
    }
    meta = next(a["metaData"] for a in a0 if "metaData" in a)
    assert meta["format"]["provider"] == "parquet"
    schema = json.loads(meta["schemaString"])
    assert {f["name"] for f in schema["fields"]} >= {"o_orderkey", "o_orderdate"}
    adds = [a["add"] for a in a0 if "add" in a]
    assert adds and all(
        os.path.exists(os.path.join(path, a["path"])) and a["size"] > 0
        for a in adds
    )


def test_append_accumulates_and_latest_reads_union(table, spark):
    path, src = table
    want_f = src.where(F.col("o_orderstatus") == "F").count()
    want_p = src.where(F.col("o_orderstatus") == "P").count()
    snap = read_delta(spark, path)
    got = {r["o_orderstatus"]: r["cnt"] for r in
           snap.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == {"F": want_f, "P": want_p}
    # v1 commit has no remove actions (append)
    assert all("remove" not in a for a in _commit_actions(path, 1))


def test_overwrite_time_travel(spark, tmp_path):
    """Overwrite logically removes v0's files (remove actions) but
    leaves them on disk, so version 0 still serves the old rows."""
    path = str(tmp_path / "delta_tt")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "overwrite")
    n_f = src.where(F.col("o_orderstatus") == "F").count()
    n_o = src.where(F.col("o_orderstatus") == "O").count()
    assert read_delta(spark, path, version=0).count() == n_f
    assert read_delta(spark, path, version=1).count() == n_o
    assert read_delta(spark, path).count() == n_o
    removes = [a for a in _commit_actions(path, 1) if "remove" in a]
    assert removes, "overwrite must emit remove actions"
    for a in removes:  # logical delete: files stay for time travel
        assert os.path.exists(os.path.join(path, a["remove"]["path"]))
    hist = delta_history(path)
    assert [h["mode"] for h in hist] == ["OVERWRITE", "OVERWRITE"]
    assert hist[1]["n_remove"] == len(removes)


def test_filter_pushdown_survives_file_list_scan(table, spark):
    """read_delta hands Spark an explicit parquet file list — Catalyst
    must still push predicates into the scan."""
    path, _ = table
    plan = (
        read_delta(spark, path)
        .where(F.col("o_totalprice") > 100000.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1][:200]


def test_capability_gates(table, spark, tmp_path):
    path, _ = table
    # unknown version
    with pytest.raises(ValueError, match="version 7 not in log"):
        read_delta(spark, path, version=7)
    # a _last_checkpoint naming parts that are not on disk is a
    # CORRUPT checkpoint → loud refusal, never a partial file set
    # (readable multi-part checkpoints are covered in
    # test_multipart_checkpoint_roundtrip)
    ckpt = os.path.join(path, "_delta_log", "_last_checkpoint")
    with open(ckpt, "w") as fh:
        fh.write('{"version": 1, "parts": 4}')
    try:
        with pytest.raises(ValueError, match="missing 4 of 4 parts"):
            read_delta(spark, path)
    finally:
        os.remove(ckpt)
    # reader v3 with a feature we don't implement → explicit refusal
    # (v3 with deletionVectors/columnMapping/timestampNtz/v2Checkpoint
    # is SUPPORTED)
    p2 = str(tmp_path / "delta_v3_unknown")
    os.makedirs(os.path.join(p2, "_delta_log"))
    with open(os.path.join(p2, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "readerFeatures": ["icebergCompatV2"],
                    }
                }
            )
            + "\n"
        )
        fh.write(json.dumps({"metaData": {"schemaString": "{}"}}) + "\n")
    with pytest.raises(NotImplementedError, match="icebergCompatV2"):
        read_delta(spark, p2)
    # reader version beyond v3 → explicit refusal
    p3 = str(tmp_path / "delta_v4")
    os.makedirs(os.path.join(p3, "_delta_log"))
    with open(os.path.join(p3, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 4}}) + "\n")
        fh.write(json.dumps({"metaData": {"schemaString": "{}"}}) + "\n")
    with pytest.raises(NotImplementedError, match="reader version 4"):
        read_delta(spark, p3)


def test_commits_are_deterministic(spark, tmp_path):
    """Same input → byte-identical commit JSON (wall clock is pinned
    out of the format), so reruns don't churn the log."""
    src = load(spark, SF_DIR, "nation")
    p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    write_delta(src, p1, "overwrite")
    write_delta(src, p2, "overwrite")

    def log0(p):
        import re

        with open(os.path.join(p, "_delta_log", f"{0:020d}.json")) as fh:
            # table id derives from the path; the physical-file token
            # is writer-unique (concurrency safety) — normalize both
            txt = fh.read().replace(p, "<path>")
        return re.sub(r"part-(\d{5})-(\d{5})-[0-9a-f]{8}-c000", r"part-\1-\2-<tok>-c000", txt)

    a, b = log0(p1), log0(p2)
    a = "\n".join(l for l in a.splitlines() if '"metaData"' not in l)
    b = "\n".join(l for l in b.splitlines() if '"metaData"' not in l)
    assert a == b


def test_optimize_compacts_without_data_change(spark, tmp_path):
    """OPTIMIZE: 12 small files -> 1, rows identical, the commit's
    add/remove actions all carry dataChange:false, and time travel to
    the pre-optimize version still serves the small-file layout."""
    from datalakecrawler_spark.sources.delta_native import optimize_delta

    path = str(tmp_path / "delta_opt")
    src = load(spark, SF_DIR, "nation")
    write_delta(src.repartition(12), path, "overwrite")
    res = optimize_delta(spark, path)
    assert res == {"version": 1, "files_compacted": 12, "files_written": 1}
    assert read_delta(spark, path).count() == 25
    assert read_delta(spark, path, version=0).count() == 25
    a1 = _commit_actions(path, 1)
    assert all(
        a[k]["dataChange"] is False
        for a in a1
        for k in ("add", "remove")
        if k in a
    )
    assert next(a for a in a1 if "commitInfo" in a)["commitInfo"][
        "operation"
    ] == "OPTIMIZE"
    # large files are left alone: a second optimize is a no-op
    res2 = optimize_delta(spark, path)
    assert res2["files_compacted"] == 0


def test_optimize_respects_target_size(spark, tmp_path):
    """Files already >= target are not rewritten; only the small ones
    bin-pack."""
    from datalakecrawler_spark.sources.delta_native import optimize_delta

    path = str(tmp_path / "delta_opt_target")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.repartition(8), path, "overwrite")
    sizes = [
        a["add"]["size"] for a in _commit_actions(path, 0) if "add" in a
    ]
    target = sorted(sizes)[4]  # 4 files below, 4 at-or-above
    res = optimize_delta(spark, path, target_file_bytes=target)
    assert res["files_compacted"] == 4
    assert read_delta(spark, path).count() == src.count()


def test_vacuum_reclaims_only_unreferenced_files(spark, tmp_path):
    from datalakecrawler_spark.sources.delta_native import vacuum_delta

    path = str(tmp_path / "delta_vac")
    src = load(spark, SF_DIR, "orders")
    f = src.where(F.col("o_orderstatus") == "F")
    o = src.where(F.col("o_orderstatus") == "O")
    write_delta(f.repartition(3), path, "overwrite")
    write_delta(o, path, "overwrite")
    # retain both versions -> nothing to reclaim
    assert vacuum_delta(path, retain_last=2) == []
    doomed = vacuum_delta(path, retain_last=1)
    assert len(doomed) == 3
    assert read_delta(spark, path).count() == o.count()
    with pytest.raises(Exception):
        read_delta(spark, path, version=0).count()
    with pytest.raises(ValueError, match="retain_last"):
        vacuum_delta(path, retain_last=0)


def test_merge_rewrites_only_matched_files(spark, tmp_path):
    """MERGE cost model: files containing no matched key survive the
    commit untouched (same add entry), matched files are removed and
    replaced, inserts land in the new files."""
    from datalakecrawler_spark.sources.delta_native import merge_delta

    path = str(tmp_path / "delta_merge")
    src = load(spark, SF_DIR, "orders")
    f = src.where(F.col("o_orderstatus") == "F")
    p = src.where(F.col("o_orderstatus") == "P")
    o = src.where(F.col("o_orderstatus") == "O")
    write_delta(f.repartition(4), path)
    write_delta(p.repartition(2), path, "append")

    def active_files():
        from datalakecrawler_spark.sources.delta_native import _replay

        return set(_replay(path, None)[0])

    before = active_files()
    changes = p.withColumn("o_totalprice", F.lit(1.0)).unionByName(o)
    res = merge_delta(spark, path, changes, "o_orderkey")
    assert res["files_rewritten"] == 2
    assert res["files_untouched"] == 4
    after = active_files()
    # the 4 F files survive by identity; the 2 P files are gone
    assert len(before & after) == 4
    assert len(before - after) == 2
    out = read_delta(spark, path)
    assert out.count() == f.count() + p.count() + o.count()
    # updates applied, no duplicate keys
    assert (
        out.where(F.col("o_orderstatus") == "P")
        .where(F.col("o_totalprice") != 1.0)
        .count()
        == 0
    )
    assert out.select("o_orderkey").distinct().count() == out.count()
    # merge into keys nobody has: pure insert, zero rewrites
    res2 = merge_delta(
        spark,
        path,
        src.where(F.col("o_orderkey") < 0),
        "o_orderkey",
    )
    assert res2["files_rewritten"] == 0


def test_partitioned_write_read_and_pruning(spark, tmp_path):
    """Hive-style layout + partitionValues in the log; a filtered read
    resolves only the matching partition's files; partition columns
    come back typed through basePath; partitioning is fixed at table
    creation."""
    from datalakecrawler_spark.sources.delta_native import _replay

    path = str(tmp_path / "delta_part")
    src = load(spark, SF_DIR, "orders")
    write_delta(src, path, "overwrite", partition_by=["o_orderstatus"])
    active, _, _, parts = _replay(path, None)
    assert parts == ["o_orderstatus"]
    assert all("=" in rel.split("/")[0] for rel in active)
    assert all(
        a["partitionValues"].keys() == {"o_orderstatus"} for a in active.values()
    )
    full = read_delta(spark, path)
    assert full.count() == src.count()
    assert dict(full.dtypes)["o_orderstatus"] == "string"
    f_only = read_delta(spark, path, partition_filter={"o_orderstatus": "F"})
    assert (
        f_only.count()
        == src.where(F.col("o_orderstatus") == "F").count()
    )
    assert f_only.where(F.col("o_orderstatus") != "F").count() == 0
    # appends must repeat the table's partitioning
    with pytest.raises(ValueError, match="partitioning is fixed"):
        write_delta(src.limit(5), path, "append")
    with pytest.raises(ValueError, match="non-partition columns"):
        read_delta(spark, path, partition_filter={"o_orderkey": "1"})
    # empty partition filter result -> empty frame with full schema
    none = read_delta(spark, path, partition_filter={"o_orderstatus": "Z"})
    assert none.count() == 0 and "o_orderkey" in none.columns


def test_partitioned_vacuum(spark, tmp_path):
    from datalakecrawler_spark.sources.delta_native import vacuum_delta

    path = str(tmp_path / "delta_part_vac")
    src = load(spark, SF_DIR, "orders")
    write_delta(src, path, "overwrite", partition_by=["o_orderstatus"])
    write_delta(
        src.where(F.col("o_orderstatus") == "O"),
        path,
        "overwrite",
        partition_by=["o_orderstatus"],
    )
    doomed = vacuum_delta(path, retain_last=1)
    assert doomed and all(d.startswith("o_orderstatus=") for d in doomed)
    assert read_delta(spark, path).count() == src.where(
        F.col("o_orderstatus") == "O"
    ).count()


def test_partitioned_optimize_bin_packs_within_partitions(spark, tmp_path):
    """OPTIMIZE on a partitioned table compacts per partitionValues
    group (never across), keeps partitionValues on every new add, is
    dataChange:false throughout, and time travel still serves the
    pre-compaction layout."""
    from datalakecrawler_spark.sources.delta_native import (
        _replay,
        optimize_delta,
    )

    path = str(tmp_path / "delta_part_opt")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.repartition(3), path, "overwrite", partition_by=["o_orderstatus"])
    before, _, _, _ = _replay(path, None)
    res = optimize_delta(spark, path)
    after, _, _, _ = _replay(path, None)
    assert res["files_compacted"] == len(before) > len(after)
    by_part: dict[str, int] = {}
    for rel, add in after.items():
        pv = add["partitionValues"]
        assert list(pv) == ["o_orderstatus"]
        assert rel.startswith(f"o_orderstatus={pv['o_orderstatus']}/")
        by_part[pv["o_orderstatus"]] = by_part.get(pv["o_orderstatus"], 0) + 1
    assert set(by_part.values()) == {1}
    # every action in the optimize commit is dataChange:false
    for a in _commit_actions(path, 1):
        for kind in ("add", "remove"):
            if kind in a:
                assert a[kind]["dataChange"] is False, a
    # same rows, partition pruning intact, time travel serves v0 layout
    got = read_delta(
        spark, path, partition_filter={"o_orderstatus": "F"}
    ).count()
    assert got == src.where(F.col("o_orderstatus") == "F").count()
    v0, _, _, _ = _replay(path, 0)
    assert sorted(v0) == sorted(before)


def test_partitioned_merge_scope_and_partition_values(spark, tmp_path):
    """MERGE on a partitioned table: partition_scope bounds the probe
    to the scoped partition's files, other partitions' files survive
    by identity, rewritten adds carry partitionValues, the CDF rows
    embed the partition column, and scoping a non-partition column
    refuses."""
    from datalakecrawler_spark.sources.delta_native import (
        _replay,
        merge_delta,
        read_delta_changes,
    )

    path = str(tmp_path / "delta_part_merge")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.repartition(2), path, "overwrite", partition_by=["o_orderstatus"])
    before, _, _, _ = _replay(path, None)
    p_files = {
        rel
        for rel, add in before.items()
        if add["partitionValues"]["o_orderstatus"] == "P"
    }
    changes = src.where(F.col("o_orderstatus") == "P").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2.0
    )
    with pytest.raises(ValueError, match="non-partition columns"):
        merge_delta(spark, path, changes, "o_orderkey",
                    partition_scope={"o_orderkey": "1"})
    res = merge_delta(spark, path, changes, "o_orderkey",
                      partition_scope={"o_orderstatus": "P"})
    assert res["files_probed"] == len(p_files)
    assert res["files_rewritten"] == len(p_files)
    after, _, _, _ = _replay(path, None)

    def _non_p(active):
        return {
            r
            for r, add in active.items()
            if add["partitionValues"]["o_orderstatus"] != "P"
        }

    assert _non_p(after) == _non_p(before)
    new_p = [r for r in after if r not in before]
    assert new_p and all(
        after[r]["partitionValues"] == {"o_orderstatus": "P"} for r in new_p
    )
    # snapshot correctness: P prices doubled, everything else untouched
    got = (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    )
    want = {
        r["o_orderstatus"]: r["s"]
        for r in src.groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    }
    for r in got:
        factor = 2.0 if r["o_orderstatus"] == "P" else 1.0
        assert abs(r["s"] - want[r["o_orderstatus"]] * factor) < 1e-4
    # the CDF of the merge embeds the partition column as a data column
    feed = read_delta_changes(spark, path, from_version=0)
    pre = feed.where(F.col("_change_type") == "update_preimage")
    assert pre.where(F.col("o_orderstatus").isNull()).count() == 0
    assert pre.count() == changes.count()


def test_partitioned_incremental_read_carries_partition_column(spark, tmp_path):
    """read_delta_incremental over a partitioned table re-derives the
    partition column from the hive dirs (basePath) — never NULLs."""
    from datalakecrawler_spark.sources.delta_native import (
        read_delta_incremental,
    )

    path = str(tmp_path / "delta_part_inc")
    src = load(spark, SF_DIR, "orders")
    write_delta(
        src.where(F.col("o_orderstatus") == "F"),
        path, "overwrite", partition_by=["o_orderstatus"],
    )
    write_delta(
        src.where(F.col("o_orderstatus") == "P"),
        path, "append", partition_by=["o_orderstatus"],
    )
    inc = read_delta_incremental(spark, path, from_version=0)
    assert inc.where(F.col("o_orderstatus").isNull()).count() == 0
    assert inc.count() == src.where(F.col("o_orderstatus") == "P").count()
    assert set(
        r[0] for r in inc.select("o_orderstatus").distinct().collect()
    ) == {"P"}


def test_add_actions_carry_footer_stats(spark, tmp_path):
    from datalakecrawler_spark.sources.delta_native import _replay

    path = str(tmp_path / "delta_stats")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.repartition(4), path, "overwrite")
    active, _, _, _ = _replay(path, None)
    for add in active.values():
        s = json.loads(add["stats"])
        assert s["numRecords"] > 0
        assert "o_orderkey" in s["minValues"]
        assert s["minValues"]["o_orderkey"] <= s["maxValues"]["o_orderkey"]
        assert s["nullCount"].get("o_orderkey", 0) == 0
    total = sum(json.loads(a["stats"])["numRecords"] for a in active.values())
    assert total == src.count()


def test_data_skipping_is_conservative_and_effective(spark, tmp_path):
    from datalakecrawler_spark.sources.delta_native import (
        _replay,
        read_delta,
        skip_files,
    )

    path = str(tmp_path / "delta_skip")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.repartitionByRange(8, "o_orderkey"), path, "overwrite")
    active, _, _, _ = _replay(path, None)
    lo_keys = src.agg(F.max("o_orderkey")).collect()[0][0] // 10
    kept = skip_files(active, "o_orderkey", None, lo_keys)
    assert len(kept) < len(active)  # clustered layout -> real skipping
    out = read_delta(spark, path, data_filter=("o_orderkey", None, lo_keys))
    # every matching row survives the skip (conservative)
    want = src.where(F.col("o_orderkey") <= lo_keys).count()
    assert out.where(F.col("o_orderkey") <= lo_keys).count() == want
    # a range with no possible match resolves to zero files -> empty
    beyond = src.agg(F.max("o_orderkey")).collect()[0][0] + 1
    none = read_delta(
        spark, path, data_filter=("o_orderkey", beyond, None)
    )
    assert none.count() == 0
    # files without stats for the column are always kept
    stripped = {
        rel: {**add, "stats": json.dumps({"minValues": {}, "maxValues": {}})}
        for rel, add in active.items()
    }
    assert len(skip_files(stripped, "o_orderkey", None, 1)) == len(active)


def test_schema_enforcement_and_evolution(spark, tmp_path):
    from datalakecrawler_spark.sources.delta_native import _replay

    path = str(tmp_path / "delta_evolve")
    src = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    f = src.where(F.col("o_orderstatus") == "F")
    p = src.where(F.col("o_orderstatus") == "P")
    write_delta(f, path, "overwrite")
    wide = p.withColumn("even_key", F.col("o_orderkey") % 2 == 0)
    # enforcement: differing schema refuses by default
    with pytest.raises(ValueError, match="merge_schema=True"):
        write_delta(wide, path, "append")
    # type change refuses even with merge_schema
    retyped = p.withColumn("o_totalprice", F.col("o_totalprice").cast("string"))
    with pytest.raises(ValueError, match="type changes"):
        write_delta(retyped, path, "append", merge_schema=True)
    # evolution: union schema, old rows read NULL in the new column
    write_delta(wide, path, "append", merge_schema=True)
    _, schema_string, _, _ = _replay(path, None)
    names = [fld["name"] for fld in json.loads(schema_string)["fields"]]
    assert names == ["o_orderkey", "o_orderstatus", "o_totalprice", "even_key"]
    out = read_delta(spark, path)
    assert out.count() == f.count() + p.count()
    assert (
        out.where(F.col("o_orderstatus") == "F")
        .where(F.col("even_key").isNotNull())
        .count()
        == 0
    )
    assert (
        out.where(F.col("o_orderstatus") == "P")
        .where(F.col("even_key").isNull())
        .count()
        == 0
    )
    # time travel serves v0 under v0's schema (no even_key column)
    v0 = read_delta(spark, path, version=0)
    assert "even_key" not in v0.columns


def test_incremental_read_appends_only(spark, tmp_path):
    """(v_from, v_to] appends come back exactly; optimize
    rearrangements are invisible; in-range data removals refuse."""
    from datalakecrawler_spark.sources.delta_native import (
        optimize_delta,
        read_delta_incremental,
    )

    path = str(tmp_path / "delta_inc")
    src = load(spark, SF_DIR, "orders")
    f = src.where(F.col("o_orderstatus") == "F")
    p = src.where(F.col("o_orderstatus") == "P")
    o = src.where(F.col("o_orderstatus") == "O")
    write_delta(f, path, "overwrite")          # v0
    write_delta(p.repartition(3), path, "append")  # v1
    write_delta(o, path, "append")             # v2
    optimize_delta(spark, path)                # v3, dataChange:false

    inc = read_delta_incremental(spark, path, from_version=0, to_version=2)
    assert inc.count() == p.count() + o.count()
    assert inc.where(F.col("o_orderstatus") == "F").count() == 0
    # v3 alone adds nothing for change consumers
    assert read_delta_incremental(spark, path, from_version=2).count() == 0
    # only v2 in range
    assert (
        read_delta_incremental(spark, path, 1, 2).count() == o.count()
    )
    with pytest.raises(ValueError, match="no commits"):
        read_delta_incremental(spark, path, from_version=99)
    # a data-removing commit in range refuses
    write_delta(o.limit(10), path, "overwrite")  # v4 removes
    with pytest.raises(NotImplementedError, match="read_delta_changes"):
        read_delta_incremental(spark, path, from_version=0)


def test_checkpoint_accelerates_replay(spark, tmp_path):
    """Replay from a checkpoint consumes only newer JSON commits —
    proven by hiding the pre-checkpoint commits; pre-checkpoint time
    travel still full-replays; txn idempotence state survives the
    checkpoint; partition pruning works from checkpoint state."""
    from datalakecrawler_spark.sources.delta_native import (
        checkpoint_delta,
        last_txn_version,
    )

    path = str(tmp_path / "delta_ckpt")
    src = load(spark, SF_DIR, "orders")
    for i in range(4):
        write_delta(
            src.where(F.col("o_orderkey") % 5 == i),
            path,
            "append",
            txn=("app", i),
        )
    res = checkpoint_delta(path)
    assert res == {"version": 3, "n_files": res["n_files"], "n_txns": 1}
    write_delta(src.where(F.col("o_orderkey") % 5 == 4), path, "append")

    log_dir = os.path.join(path, "_delta_log")
    hidden = []
    try:
        for v in range(4):
            f = os.path.join(log_dir, f"{v:020d}.json")
            os.replace(f, f + ".hid")
            hidden.append(f)
        assert read_delta(spark, path).count() == src.count()
    finally:
        for f in hidden:
            os.replace(f + ".hid", f)
    # pre-checkpoint time travel: full JSON replay still works
    assert (
        read_delta(spark, path, version=0).count()
        == src.where(F.col("o_orderkey") % 5 == 0).count()
    )
    assert last_txn_version(path, "app") == 3
    # a checkpointed PARTITIONED table still partition-prunes
    p2 = str(tmp_path / "delta_ckpt_part")
    write_delta(src, p2, "overwrite", partition_by=["o_orderstatus"])
    checkpoint_delta(p2)
    f_only = read_delta(spark, p2, partition_filter={"o_orderstatus": "F"})
    assert f_only.count() == src.where(F.col("o_orderstatus") == "F").count()
    # a parts stamp with no part files on disk is corruption → refusal
    lc = os.path.join(p2, "_delta_log", "_last_checkpoint")
    with open(lc, "w") as fh:
        json.dump({"version": 0, "parts": 2}, fh)
    with pytest.raises(ValueError, match="missing 2 of 2 parts"):
        read_delta(spark, p2)


def test_concurrent_commits_never_lose_an_append(spark, tmp_path):
    """The version file is a put-if-absent commit lock: racing appends
    retry at the next version; no commit is silently overwritten."""
    from concurrent.futures import ThreadPoolExecutor

    from datalakecrawler_spark.sources.delta_native import (
        CommitConflict,
        _publish_commit,
    )

    path = str(tmp_path / "delta_occ")
    src = load(spark, SF_DIR, "nation")
    write_delta(src, path, "overwrite")

    # direct conflict: same version published twice
    with pytest.raises(CommitConflict, match="version 1"):
        _publish_commit(path, 1, [{"commitInfo": {"operation": "X",
                                                  "operationParameters": {}}}])
        _publish_commit(path, 1, [{"commitInfo": {"operation": "X",
                                                  "operationParameters": {}}}])
    os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))

    # racing appends: all 6 land, every row survives
    slices = [src.where(F.col("n_nationkey") % 6 == i) for i in range(6)]
    with ThreadPoolExecutor(max_workers=6) as ex:
        got = list(ex.map(lambda df: write_delta(df, path, "append"), slices))
    assert sorted(got) == [1, 2, 3, 4, 5, 6], got
    assert read_delta(spark, path).count() == src.count() * 2
    assert len(delta_history(path)) == 7

    # overwrite losing the race surfaces the conflict (stale snapshot)
    import datalakecrawler_spark.sources.delta_native as dn

    real = dn._publish_commit
    calls = {"n": 0}

    def flaky(path_, version_, actions_):
        if calls["n"] == 0:
            calls["n"] += 1
            raise CommitConflict("simulated")
        return real(path_, version_, actions_)

    try:
        dn._publish_commit = flaky
        with pytest.raises(CommitConflict):
            write_delta(src, path, "overwrite")
    finally:
        dn._publish_commit = real


def test_auto_checkpoint_bounds_log_replay(spark, tmp_path, monkeypatch):
    """A 30-commit table auto-checkpoints every _CHECKPOINT_INTERVAL
    commits (protocol delta.checkpointInterval convention): the latest
    read starts from the newest checkpoint and parses < K JSON commits,
    while history / time travel stay exact via full replay."""
    from datalakecrawler_spark.sources import delta_native as dn

    path = str(tmp_path / "delta_autocp")
    src = load(spark, SF_DIR, "region").limit(1)
    for v in range(30):
        dn.write_delta(src, path, mode="append" if v else "overwrite")

    # checkpoints exist at every interval multiple; newest wins
    cp = dn._checkpoint_info(path)
    assert cp is not None and cp[0] == 20, cp
    for v in (10, 20):
        assert os.path.exists(
            os.path.join(path, "_delta_log", f"{v:020d}.checkpoint.parquet")
        )

    # replay of HEAD opens only the post-checkpoint JSON commits
    opened = []
    real = dn._commit_file

    def spy(p, v):
        opened.append(v)
        return real(p, v)

    monkeypatch.setattr(dn, "_commit_file", spy)
    active, _schema, version, _parts = dn._replay(path, None)
    assert version == 29
    assert opened == list(range(21, 30)), opened
    assert len(opened) < dn._CHECKPOINT_INTERVAL
    assert len(active) == 30  # every append's file is live

    # time travel BEFORE the checkpoint still replays exactly
    assert dn.read_delta(spark, path, version=5).count() == 6
    assert dn.read_delta(spark, path).count() == 30


def test_change_data_feed_rules(spark, tmp_path):
    """CDF protocol rules: merge commits carry cdc actions whose
    _change_data files are the complete change record (skipped by
    snapshot reads and checkpoints); commits without cdc derive
    inserts from dataChange adds and deletes from dataChange removes
    (overwrite = delete old + insert new); OPTIMIZE's
    dataChange=false moves are invisible; vacuumed ranges raise."""
    from datalakecrawler_spark.sources import delta_native as dn

    path = str(tmp_path / "delta_cdf")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.where("n_nationkey < 10"), path)          # v0
    changes = (
        src.where("n_nationkey < 5")
        .withColumn("n_regionkey", F.col("n_regionkey") + 100)
        .unionByName(src.where("n_nationkey >= 20"))
    )
    dn.merge_delta(spark, path, changes, "n_nationkey")          # v1 (cdc)
    dn.write_delta(
        src.where("(n_nationkey >= 10) and (n_nationkey < 15)"),
        path, "append",
    )                                                            # v2 derive
    feed = dn.read_delta_changes(spark, path, from_version=0)
    by = {
        (r["_change_type"], r["_commit_version"]): r["cnt"]
        for r in feed.groupBy("_change_type", "_commit_version")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert by[("update_preimage", 1)] == 5
    assert by[("update_postimage", 1)] == 5
    assert by[("insert", 1)] == 5   # keys 20-24 were not in the table
    assert by[("insert", 2)] == 5   # derived from the plain append
    # postimages carry the changed values
    post = feed.where(
        "_change_type = 'update_postimage' and n_regionkey < 100"
    ).count()
    assert post == 0
    # overwrite derives delete(old) + insert(new)
    dn.write_delta(src.where("n_nationkey >= 15"), path)         # v3
    f3 = dn.read_delta_changes(spark, path, 2, 3)
    got = {
        r["_change_type"]: r["cnt"]
        for r in f3.groupBy("_change_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got["insert"] == 10  # keys 15-24
    assert got["delete"] == 20  # v2 head: 0-14 + 20-24
    # snapshot reads and checkpoints never see cdc files
    assert dn.read_delta(spark, path).count() == 10
    dn.checkpoint_delta(path)
    assert dn.read_delta(spark, path).count() == 10
    # vacuum reclaims the removed files → in-range delete read raises
    dn.vacuum_delta(path, retain_last=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        dn.read_delta_changes(spark, path, 2, 3).count()
    # but the cdc-backed range still serves (cdc files are not part-*)
    assert dn.read_delta_changes(spark, path, 0, 1).count() == 15


def test_restore_is_metadata_only_and_vacuum_safe(spark, tmp_path):
    """RESTORE flips the active set back as a forward commit reusing
    the original physical files; restoring to the current version is a
    no-op; restoring to a vacuumed version refuses loudly; a restored
    OPTIMIZE add becomes dataChange:true so change consumers see it."""
    from datalakecrawler_spark.sources.delta_native import (
        _replay,
        delta_history,
        restore_delta,
        vacuum_delta,
    )

    path = str(tmp_path / "delta_restore")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F").repartition(2), path)
    v0_active, _, _, _ = _replay(path, None)
    write_delta(src.where(F.col("o_orderstatus") == "P"), path, "overwrite")
    # no-op restore
    assert restore_delta(spark, path, 1)["files_added"] == 0
    res = restore_delta(spark, path, 0)
    assert res == {"version": 2, "files_added": 2, "files_removed": 1}
    head, _, _, _ = _replay(path, None)
    assert sorted(head) == sorted(v0_active)
    assert delta_history(path)[-1]["operation"] == "RESTORE"
    assert read_delta(spark, path).count() == src.where(
        F.col("o_orderstatus") == "F"
    ).count()
    # restore commit carries the restored schema
    # vacuum away everything but the head, then try restoring to v1
    vacuum_delta(path, retain_last=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_delta(spark, path, 1)


def test_restore_partitioned_keeps_partition_values(spark, tmp_path):
    from datalakecrawler_spark.sources.delta_native import (
        _replay,
        restore_delta,
    )

    path = str(tmp_path / "delta_restore_part")
    src = load(spark, SF_DIR, "orders")
    write_delta(src, path, "overwrite", partition_by=["o_orderstatus"])
    v0, _, _, _ = _replay(path, None)
    write_delta(
        src.where(F.col("o_orderstatus") == "F"), path, "overwrite",
        partition_by=["o_orderstatus"],
    )
    restore_delta(spark, path, 0)
    head, _, _, parts = _replay(path, None)
    assert parts == ["o_orderstatus"] and sorted(head) == sorted(v0)
    assert head[next(iter(head))]["partitionValues"]  # pvals preserved
    got = read_delta(spark, path, partition_filter={"o_orderstatus": "O"}).count()
    assert got == src.where(F.col("o_orderstatus") == "O").count()


def test_optimize_zorder_clusters_both_dimensions(spark, tmp_path):
    """ZORDER rewrite: same rows, dataChange:false commit, and footer
    stats become selective on EVERY z-order column; bounds come from
    the log's stats, no extra scan; non-numeric columns refuse."""
    from datalakecrawler_spark.sources.delta_native import (
        _replay,
        optimize_delta,
        skip_files,
    )

    path = str(tmp_path / "delta_zorder")
    src = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    write_delta(src.repartition(6), path, "overwrite")
    before, _, _, _ = _replay(path, None)
    total = sum(a["size"] for a in before.values())
    res = optimize_delta(
        spark, path, target_file_bytes=max(total // 6, 1),
        zorder_by=["o_orderkey", "o_custkey"],
    )
    assert res["files_compacted"] == 6 and res["files_written"] >= 3
    after, _, _, _ = _replay(path, None)
    # same rows (full frame equality via counts per status + sum)
    got = read_delta(spark, path)
    assert got.count() == src.count()
    # double sums are order-dependent and zorder reorders rows —
    # compare within float tolerance
    got_sum = got.agg(F.sum("o_totalprice")).collect()[0][0]
    want_sum = src.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got_sum - want_sum) < 1e-3 * max(abs(want_sum), 1.0)
    # all actions dataChange:false
    a1 = _commit_actions(path, 1)
    assert all(
        a[k]["dataChange"] is False
        for a in a1
        for k in ("add", "remove")
        if k in a
    )
    info = next(a for a in a1 if "commitInfo" in a)["commitInfo"]
    assert json.loads(info["operationParameters"]["zOrderBy"]) == [
        "o_orderkey", "o_custkey",
    ]
    # stats now skip on both dimensions
    max_ok = int(src.agg(F.max("o_orderkey")).collect()[0][0])
    max_ck = int(src.agg(F.max("o_custkey")).collect()[0][0])
    assert len(skip_files(after, "o_orderkey", None, max_ok // 6)) < len(after)
    assert len(skip_files(after, "o_custkey", None, max_ck // 6)) < len(after)
    with pytest.raises(ValueError, match="not in the data schema"):
        optimize_delta(spark, path, zorder_by=["nope"])
    with pytest.raises(ValueError, match="no numeric min/max"):
        optimize_delta(spark, path, zorder_by=["o_orderstatus"])


def test_multipart_checkpoint_roundtrip(spark, tmp_path):
    """A parts=3 checkpoint writes the protocol's part names, records
    parts in _last_checkpoint, and replays to the identical state a
    single-file checkpoint would; a deleted part refuses loudly."""
    from datalakecrawler_spark.sources.delta_native import (
        _checkpoint_info,
        _replay,
        checkpoint_delta,
    )

    path = str(tmp_path / "delta_mp_ckpt")
    src = load(spark, SF_DIR, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F").repartition(5), path)
    write_delta(src.where(F.col("o_orderstatus") == "P"), path, "append")
    plain, plain_schema, _, _ = _replay(path, None)
    res = checkpoint_delta(path, parts=3)
    assert res["parts"] == 3
    names = sorted(os.listdir(os.path.join(path, "_delta_log")))
    part_names = [n for n in names if ".checkpoint." in n]
    assert part_names == [
        f"{1:020d}.checkpoint.{i:010d}.{3:010d}.parquet" for i in (1, 2, 3)
    ]
    with open(os.path.join(path, "_delta_log", "_last_checkpoint")) as fh:
        assert json.load(fh)["parts"] == 3
    v, files = _checkpoint_info(path)
    assert v == 1 and len(files) == 3
    via_ckpt, ckpt_schema, _, _ = _replay(path, None)
    # checkpoint rows normalize dataChange to false per protocol, so
    # compare the state modulo that flag
    def _norm(active):
        return {
            rel: {k: v for k, v in add.items() if k != "dataChange"}
            for rel, add in active.items()
        }

    assert _norm(via_ckpt) == _norm(plain) and ckpt_schema == plain_schema
    assert read_delta(spark, path).count() == src.where(
        F.col("o_orderstatus").isin("F", "P")
    ).count()
    # checkpoint + later commits: replay starts at the checkpoint
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "append")
    assert read_delta(spark, path).count() == src.count()
    # a vanished part is corruption, not silence
    os.remove(os.path.join(path, "_delta_log", part_names[1]))
    with pytest.raises(ValueError, match="missing 1 of 3 parts"):
        _replay(path, None)


def test_overwrite_partitions_dynamic(spark, tmp_path):
    """Dynamic partition overwrite replaces only the partitions the new
    data lands in; unpartitioned tables refuse; schema enforcement
    applies like append; time travel serves the old partition."""
    from datalakecrawler_spark.sources.delta_native import _replay

    path = str(tmp_path / "delta_dpo")
    src = load(spark, SF_DIR, "orders")
    with pytest.raises(ValueError, match="partitioned table"):
        write_delta(src, str(tmp_path / "x"), "overwrite_partitions")
    write_delta(src, path, "overwrite", partition_by=["o_orderstatus"])
    repl = src.where(F.col("o_orderstatus") == "F").limit(10)
    write_delta(repl, path, "overwrite_partitions",
                partition_by=["o_orderstatus"])
    back = read_delta(spark, path)
    assert back.where(F.col("o_orderstatus") == "F").count() == 10
    assert back.where(F.col("o_orderstatus") == "O").count() == src.where(
        F.col("o_orderstatus") == "O"
    ).count()
    # time travel to v0 serves the original F partition
    assert read_delta(spark, path, version=0).where(
        F.col("o_orderstatus") == "F"
    ).count() == src.where(F.col("o_orderstatus") == "F").count()
    # schema enforcement: differing columns refuse without merge_schema
    with pytest.raises(ValueError, match="differs from the table schema"):
        write_delta(
            repl.withColumn("extra", F.lit(1)), path,
            "overwrite_partitions", partition_by=["o_orderstatus"],
        )
    active, _, _, _ = _replay(path, None)
    assert all(a["partitionValues"] for a in active.values())


def test_shallow_clone_independence_and_safety(spark, tmp_path):
    """Clone references source files by absolute path (no copy); clone
    commits never touch the source; clone-side VACUUM cannot reclaim
    source files; cloning onto an existing table or from a partitioned
    source refuses."""
    import glob as _glob

    from datalakecrawler_spark.sources.delta_native import (
        clone_delta,
        vacuum_delta,
    )

    src_p = str(tmp_path / "src")
    dst_p = str(tmp_path / "dst")
    src = load(spark, SF_DIR, "nation")
    write_delta(src, src_p, "overwrite")
    res = clone_delta(spark, src_p, dst_p)
    assert res["files_referenced"] >= 1
    assert not _glob.glob(os.path.join(dst_p, "*.parquet"))
    assert read_delta(spark, dst_p).count() == 25
    # clone evolves independently; source untouched
    write_delta(src.limit(5), dst_p, "append")
    assert read_delta(spark, dst_p).count() == 30
    assert read_delta(spark, src_p).count() == 25
    # clone vacuum only walks the clone's own dir
    write_delta(src.limit(3), dst_p, "overwrite")
    doomed = vacuum_delta(dst_p, retain_last=1)
    assert all(not d.startswith("/") or dst_p in d for d in doomed)
    assert read_delta(spark, src_p).count() == 25  # source files intact
    with pytest.raises(ValueError, match="already a Delta table"):
        clone_delta(spark, src_p, dst_p)
    # partitioned sources clone too (details in
    # tests/test_delta_dv.py::test_shallow_clone_partitioned)
    part_p = str(tmp_path / "src_part")
    write_delta(src, part_p, "overwrite", partition_by=["n_regionkey"])
    clone_delta(spark, part_p, str(tmp_path / "dst2"))
    assert read_delta(spark, str(tmp_path / "dst2")).count() == 25
