"""Native Iceberg v1 tests (sources/iceberg_native.py): on-disk
metadata conformance with the public table spec (v{N}.metadata.json,
Avro manifest lists + manifests with spec field-ids), snapshot
semantics (append manifest reuse, overwrite time travel), capability
gates, and pushdown through the resolved file list. The registered ops
are additionally oracle-checked by test_registry_parity."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.sources.avro import read_container_header
from datalakecrawler_spark.sources.iceberg_native import (
    _decode_avro_records,
    iceberg_snapshots,
    read_iceberg,
    write_iceberg,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def table(spark, tmp_path):
    """snapshot 1 = F orders (overwrite), snapshot 2 = P orders
    appended."""
    path = str(tmp_path / "ice_tbl")
    src = load(spark, SF_DIR, "orders")
    s1 = write_iceberg(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    s2 = write_iceberg(src.where(F.col("o_orderstatus") == "P"), path, "append")
    assert (s1, s2) == (1, 2)
    return path, src


def _meta(path, v):
    with open(os.path.join(path, "metadata", f"v{v}.metadata.json")) as fh:
        return json.load(fh)


def test_metadata_layout_matches_spec(table):
    path, _ = table
    with open(os.path.join(path, "metadata", "version-hint.text")) as fh:
        assert fh.read().strip() == "2"
    meta = _meta(path, 2)
    assert meta["format-version"] == 1
    assert meta["current-snapshot-id"] == 2
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [1, 2]
    assert meta["schema"]["type"] == "struct"
    ids = [f["id"] for f in meta["schema"]["fields"]]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    # manifest list is real Avro with the spec's field-ids
    ml = os.path.join(path, meta["snapshots"][-1]["manifest-list"])
    with open(ml, "rb") as fh:
        schema, codec, _sync, _pos = read_container_header(fh.read(65536))
    by_name = {f["name"]: f for f in schema["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["added_snapshot_id"]["field-id"] == 503
    # manifest carries manifest_entry records with data_file field-ids
    mf = _decode_avro_records(ml)[0]
    mpath = os.path.join(path, mf["manifest_path"])
    with open(mpath, "rb") as fh:
        mschema, _c, _s, _p = read_container_header(fh.read(65536))
    data_file = next(f for f in mschema["fields"] if f["name"] == "data_file")
    df_ids = {f["name"]: f["field-id"] for f in data_file["type"]["fields"]}
    assert df_ids["file_path"] == 100 and df_ids["record_count"] == 103


def test_append_reuses_prior_manifests(table):
    """Spec property: an append's manifest list = prior manifests + one
    new manifest, so commit cost is O(new files)."""
    path, _ = table
    m1 = _meta(path, 1)["snapshots"][-1]["manifest-list"]
    m2 = _meta(path, 2)["snapshots"][-1]["manifest-list"]
    l1 = _decode_avro_records(os.path.join(path, m1))
    l2 = _decode_avro_records(os.path.join(path, m2))
    assert len(l2) == len(l1) + 1
    assert {m["manifest_path"] for m in l1} <= {m["manifest_path"] for m in l2}


def test_snapshot_reads_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "ice_tt")
    src = load(spark, SF_DIR, "orders")
    write_iceberg(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    write_iceberg(src.where(F.col("o_orderstatus") == "O"), path, "overwrite")
    n_f = src.where(F.col("o_orderstatus") == "F").count()
    n_o = src.where(F.col("o_orderstatus") == "O").count()
    assert read_iceberg(spark, path, snapshot_id=1).count() == n_f
    assert read_iceberg(spark, path, snapshot_id=2).count() == n_o
    assert read_iceberg(spark, path).count() == n_o
    assert [s["operation"] for s in iceberg_snapshots(path)] == [
        "overwrite",
        "overwrite",
    ]


def test_append_union_content(table, spark):
    path, src = table
    want = {
        r["o_orderstatus"]: r["cnt"]
        for r in src.where(F.col("o_orderstatus").isin("F", "P"))
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    got = {
        r["o_orderstatus"]: r["cnt"]
        for r in read_iceberg(spark, path)
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want


def test_filter_pushdown_survives_file_list_scan(table, spark):
    path, _ = table
    plan = (
        read_iceberg(spark, path)
        .where(F.col("o_totalprice") > 100000.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1][:200]


def test_capability_gates(table, spark, tmp_path):
    path, _ = table
    with pytest.raises(ValueError, match="snapshot 99 not in table"):
        read_iceberg(spark, path, snapshot_id=99)
    # v4+ → explicit refusal; v3 refuses only on FEATURE USE (r8 —
    # a defaults-carrying schema here; plain v3 scans are covered by
    # test_v3_metadata_with_v2_shaped_content_scans)
    p2 = str(tmp_path / "ice_v4")
    os.makedirs(os.path.join(p2, "metadata"))
    with open(os.path.join(p2, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump({"format-version": 4, "schema": {"fields": []}}, fh)
    with open(os.path.join(p2, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    with pytest.raises(NotImplementedError, match="format v4"):
        read_iceberg(spark, p2)
    # top-level defaults are SERVED since r8, struct-path defaults
    # since r9; the remaining v3 gate is defaults buried inside
    # LIST/MAP element types
    p3 = str(tmp_path / "ice_v3_listburied_defaults")
    os.makedirs(os.path.join(p3, "metadata"))
    with open(os.path.join(p3, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(
            {
                "format-version": 3,
                "schema": {
                    "fields": [
                        {"id": 1, "name": "arr", "required": False,
                         "type": {"type": "list", "element-id": 2,
                                  "element-required": False,
                                  "element": {"type": "struct", "fields": [
                                      {"id": 3, "name": "k",
                                       "required": False, "type": "int",
                                       "initial-default": 7}
                                  ]}}}
                    ]
                },
            },
            fh,
        )
    with open(os.path.join(p3, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    with pytest.raises(NotImplementedError, match="LIST/MAP"):
        read_iceberg(spark, p3)


def test_commits_are_deterministic(spark, tmp_path):
    """Same input → identical metadata json (modulo the path-derived
    uuid/location) and identical manifest bytes."""
    src = load(spark, SF_DIR, "nation")
    p1, p2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    write_iceberg(src, p1, "overwrite")
    write_iceberg(src, p2, "overwrite")

    def norm_meta(p):
        m = _meta(p, 1)
        m.pop("table-uuid"), m.pop("location")
        return m

    assert norm_meta(p1) == norm_meta(p2)
    m1 = _decode_avro_records(
        os.path.join(p1, _meta(p1, 1)["snapshots"][0]["manifest-list"])
    )
    m2 = _decode_avro_records(
        os.path.join(p2, _meta(p2, 1)["snapshots"][0]["manifest-list"])
    )
    assert m1 == m2


def test_expire_snapshots_reclaims_only_unreachable(spark, tmp_path):
    """Expiry deletes the files reachable ONLY from expired snapshots
    and publishes pruned metadata as a new version; time travel to the
    expired id fails by name."""
    from datalakecrawler_spark.sources.iceberg_native import expire_snapshots

    path = str(tmp_path / "ice_expire")
    src = load(spark, SF_DIR, "orders")
    f = src.where(F.col("o_orderstatus") == "F")
    o = src.where(F.col("o_orderstatus") == "O")
    write_iceberg(f.repartition(3), path, "overwrite")
    write_iceberg(o, path, "overwrite")
    # retaining everything is a no-op
    assert expire_snapshots(path, retain_last=2)["expired"] == []
    res = expire_snapshots(path, retain_last=1)
    assert res["expired"] == [1]
    assert res["data_files_deleted"] == 3
    assert res["manifests_deleted"] == 2  # manifest + manifest list
    assert [s["snapshot_id"] for s in iceberg_snapshots(path)] == [2]
    assert read_iceberg(spark, path).count() == o.count()
    with pytest.raises(ValueError, match="snapshot 1 not in table"):
        read_iceberg(spark, path, snapshot_id=1)
    with pytest.raises(ValueError, match="retain_last"):
        expire_snapshots(path, retain_last=0)


def test_expire_protects_manifests_shared_with_retained(spark, table):
    """An append snapshot REUSES the prior snapshot's manifest; when
    the prior snapshot expires, that shared manifest and its data
    files are still reachable from the retained append snapshot and
    must survive — the reachability walk, not snapshot ownership,
    decides deletion."""
    from datalakecrawler_spark.sources.iceberg_native import expire_snapshots

    path, src = table  # s1 = F overwrite, s2 = P append (reuses s1 manifest)
    f = src.where(F.col("o_orderstatus") == "F")
    p = src.where(F.col("o_orderstatus") == "P")
    n_before = read_iceberg(spark, path).count()
    res = expire_snapshots(path, retain_last=1)
    assert res["expired"] == [1]
    assert res["data_files_deleted"] == 0  # s1's data lives on in s2
    assert res["manifests_deleted"] == 1  # only s1's manifest LIST
    out = read_iceberg(spark, path)
    assert out.count() == n_before == f.count() + p.count()


def test_expire_refuses_to_drop_current_snapshot(spark, tmp_path):
    from datalakecrawler_spark.sources.iceberg_native import expire_snapshots

    path = str(tmp_path / "ice_expire_cur")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src, path, "overwrite")
    # hand-corrupt: point current-snapshot-id at the about-to-expire one
    # is not constructible through the writer, so assert the guard via
    # retain window arithmetic instead: retain_last=1 on a 1-snapshot
    # table is a no-op and never raises.
    assert expire_snapshots(path, retain_last=1)["expired"] == []


def test_partitioned_writes_and_entry_pruning(spark, tmp_path):
    """Typed r102 partition records round-trip through the Avro
    manifest; partition_filter prunes entries (fewer input files) with
    no lost rows; the partition column comes back typed; the spec is
    fixed at table creation."""
    from datalakecrawler_spark.sources.iceberg_native import (
        _decode_avro_records,
        _read_metadata,
        _resolve,
        write_iceberg,
    )

    path = str(tmp_path / "ice_part")
    src = load(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year(F.to_date("o_orderdate"))
    )
    write_iceberg(src, path, "overwrite", partition_by=["o_year"])
    meta = _read_metadata(path)
    spec = meta["partition-specs"][0]["fields"]
    assert spec and spec[0]["name"] == "o_year"
    assert spec[0]["transform"] == "identity"
    assert spec[0]["field-id"] == 1000
    snap = meta["snapshots"][-1]
    entries = []
    for mf in _decode_avro_records(_resolve(path, snap["manifest-list"])):
        entries += _decode_avro_records(_resolve(path, mf["manifest_path"]))
    years = {e["data_file"]["partition"]["o_year"] for e in entries}
    assert years and all(isinstance(y, int) for y in years)  # typed, not str

    y0 = min(years)
    full = read_iceberg(spark, path)
    pruned = read_iceberg(spark, path, partition_filter={"o_year": y0})
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    assert pruned.count() == src.where(F.col("o_year") == y0).count()
    assert pruned.where(F.col("o_year") != y0).count() == 0
    assert dict(pruned.dtypes)["o_year"] == "int"

    with pytest.raises(ValueError, match="spec is fixed"):
        write_iceberg(src.limit(5), path, "append")
    with pytest.raises(ValueError, match="non-source columns"):
        read_iceberg(spark, path, partition_filter={"o_orderkey": 1})
    with pytest.raises(TypeError, match="identity partition column"):
        write_iceberg(
            src.withColumn("f", F.lit(0.5)),
            str(tmp_path / "bad"),
            partition_by=["f"],
        )


def test_manifest_summaries_skip_whole_manifests(spark, tmp_path, monkeypatch):
    """Appends that each cover a disjoint partition range produce
    manifests with field summaries (spec field-id 507); a filtered
    read must skip non-matching manifests WITHOUT reading their Avro —
    counted via the decode hook. Summary-less manifests are never
    pruned (conservative)."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_summaries")
    src = load(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year(F.to_date("o_orderdate"))
    )
    years = sorted(r[0] for r in src.select("o_year").distinct().collect())
    assert len(years) >= 3
    ice.write_iceberg(
        src.where(F.col("o_year") == years[0]), path, "overwrite",
        partition_by=["o_year"],
    )
    for y in years[1:3]:
        ice.write_iceberg(
            src.where(F.col("o_year") == y), path, "append",
            partition_by=["o_year"],
        )

    decoded = []
    real = ice._decode_avro_records

    def counting(fname):
        decoded.append(os.path.basename(fname))
        return real(fname)

    monkeypatch.setattr(ice, "_decode_avro_records", counting)
    out = ice.read_iceberg(spark, path, partition_filter={"o_year": years[0]})
    assert out.count() == src.where(F.col("o_year") == years[0]).count()
    manifests_read = [f for f in decoded if f.startswith("manifest-")]
    assert len(manifests_read) == 1, manifests_read  # 2 of 3 skipped

    # prune logic: summary-less manifests always survive
    assert not ice._manifest_pruned({}, {"o_year": 1}, [("o_year", "int")])
    assert not ice._manifest_pruned(
        {"partitions": None}, {"o_year": 1}, [("o_year", "int")]
    )
    s = {
        "partitions": [
            {
                "contains_null": False,
                "lower_bound": ice._bound_ser(1995, "int"),
                "upper_bound": ice._bound_ser(1996, "int"),
            }
        ]
    }
    assert ice._manifest_pruned(s, {"o_year": 1994}, [("o_year", "int")])
    assert not ice._manifest_pruned(s, {"o_year": 1995}, [("o_year", "int")])
    # string bounds round-trip
    assert ice._bound_deser(ice._bound_ser("ASIA", "string"), "string") == "ASIA"


def test_concurrent_metadata_publish_conflicts_loudly(spark, tmp_path):
    """Two writers racing to the same metadata version: the second
    put-if-absent fails with IcebergCommitConflict instead of silently
    replacing the first commit."""
    from datalakecrawler_spark.sources.iceberg_native import (
        IcebergCommitConflict,
        _publish_metadata,
        _read_metadata,
        write_iceberg,
    )

    path = str(tmp_path / "ice_occ")
    write_iceberg(load(spark, SF_DIR, "nation"), path, "overwrite")
    meta = _read_metadata(path)
    with pytest.raises(IcebergCommitConflict, match="version 1"):
        _publish_metadata(path, 1, meta)
    # the original commit is intact
    assert _read_metadata(path)["current-snapshot-id"] == 1


def test_rewrite_manifests_compacts_and_preserves(table, spark):
    """Manifest compaction: after rewrite_manifests the current
    snapshot serves the identical rows from the identical data files
    through ONE manifest (entries carried as EXISTING with their
    original snapshot ids), time travel to the pre-rewrite snapshots
    still works, and expire reclaims the superseded small manifests."""
    import glob as _glob

    from datalakecrawler_spark.sources.iceberg_native import (
        expire_snapshots,
        rewrite_manifests,
    )
    from datalakecrawler_spark.sources import iceberg_native as ice

    path, src = table
    before = read_iceberg(spark, path)
    rows_before = before.count()
    files_before = sorted(before.inputFiles())

    res = rewrite_manifests(path)
    assert res == {"manifests_before": 2, "manifests_after": 1,
                   "entries": len(files_before)}
    after = read_iceberg(spark, path)
    assert after.count() == rows_before
    assert sorted(after.inputFiles()) == files_before

    meta = ice._read_metadata(path)
    assert meta["snapshots"][-1]["summary"]["operation"] == "replace"
    ml = ice._resolve(path, meta["snapshots"][-1]["manifest-list"])
    manifests = _decode_avro_records(ml)
    assert len(manifests) == 1
    m = manifests[0]
    assert m["added_data_files_count"] == 0
    assert m["existing_data_files_count"] == len(files_before)
    entries = _decode_avro_records(ice._resolve(path, m["manifest_path"]))
    assert all(e["status"] == ice._ST_EXISTING for e in entries)
    # original snapshot ids preserved on carried-forward entries
    assert {e["snapshot_id"] for e in entries} == {1, 2}

    # time travel to pre-rewrite snapshots still resolves their manifests
    assert read_iceberg(spark, path, snapshot_id=2).count() == rows_before

    # expire everything but the rewrite snapshot: the old small
    # manifests become unreachable and are deleted; data files are
    # shared with the rewrite snapshot and MUST survive
    n_manifests_disk = len(_glob.glob(os.path.join(path, "metadata", "manifest-*.avro")))
    out = expire_snapshots(path, retain_last=1)
    assert out["expired"] == [1, 2]
    assert out["data_files_deleted"] == 0
    assert len(_glob.glob(os.path.join(path, "metadata", "manifest-*.avro"))) < n_manifests_disk
    assert read_iceberg(spark, path).count() == rows_before


def test_rewrite_manifests_partitioned_keeps_summaries(spark, tmp_path):
    """Partitioned tables: the compacted manifest recomputes the
    field-507 partition summaries, so manifest-level skipping still
    prunes after a rewrite; per-entry pruning is unchanged."""
    from datalakecrawler_spark.sources.iceberg_native import rewrite_manifests
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_rw_part")
    src = load(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year(F.to_date("o_orderdate"))
    )
    years = sorted(r[0] for r in src.select("o_year").distinct().collect())
    for i, y in enumerate(years[:3]):
        write_iceberg(
            src.where(F.col("o_year") == y),
            path,
            "overwrite" if i == 0 else "append",
            partition_by=["o_year"],
        )
    res = rewrite_manifests(path)
    assert res["manifests_before"] == 3 and res["manifests_after"] == 1
    meta = ice._read_metadata(path)
    ml = ice._resolve(path, meta["snapshots"][-1]["manifest-list"])
    (m,) = _decode_avro_records(ml)
    (summ,) = m["partitions"]
    assert ice._bound_deser(summ["lower_bound"], "int") == years[0]
    assert ice._bound_deser(summ["upper_bound"], "int") == years[2]
    pruned = read_iceberg(spark, path, partition_filter={"o_year": int(years[0])})
    n0 = src.where(F.col("o_year") == years[0]).count()
    assert pruned.count() == n0


def test_v2_positional_deletes_layout_and_semantics(spark, tmp_path):
    """Format-v2 on-disk conformance: metadata carries format-version 2
    + last-sequence-number, the delete commit adds a content=1 manifest
    whose entry is a content=1 (position deletes) data_file, the delete
    parquet holds (file_path, pos) rows, and reads merge the deletes
    while time travel and idempotence hold."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_v2_tbl")
    src = load(spark, SF_DIR, "nation")
    s1 = write_iceberg(src, path, "overwrite", format_version=2)
    res = ice.add_position_deletes(spark, path, "n_nationkey % 5 = 0")
    n_del = src.where("n_nationkey % 5 = 0").count()
    assert res["deleted_rows"] == n_del

    meta = ice._read_metadata(path)
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 2
    assert [s.get("sequence-number") for s in meta["snapshots"]] == [1, 2]
    assert meta["snapshots"][-1]["summary"]["operation"] == "delete"

    ml = ice._resolve(path, meta["snapshots"][-1]["manifest-list"])
    manifests = _decode_avro_records(ml)
    contents = sorted(m.get("content", 0) for m in manifests)
    assert contents == [0, 1]
    (dm,) = [m for m in manifests if m.get("content") == 1]
    assert dm["sequence_number"] == 2
    (entry,) = _decode_avro_records(ice._resolve(path, dm["manifest_path"]))
    assert entry["data_file"]["content"] == ice._DF_CONTENT_POS_DELETES
    import pyarrow.parquet as pq

    t = pq.read_table(ice._resolve(path, entry["data_file"]["file_path"]))
    assert t.column_names == ["file_path", "pos"]
    assert t.num_rows == n_del

    assert read_iceberg(spark, path).count() == 25 - n_del
    assert read_iceberg(spark, path, snapshot_id=s1).count() == 25
    # remaining rows are exactly the non-matching ones
    left = {r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect()}
    assert left == {k for k in range(25) if k % 5 != 0}
    # second delete on an overlapping predicate only removes NEW rows
    res2 = ice.add_position_deletes(spark, path, "n_nationkey % 10 = 0")
    assert res2["deleted_rows"] == 0
    res3 = ice.add_position_deletes(spark, path, "n_nationkey <= 1")
    assert res3["deleted_rows"] == 1  # key 0 already deleted; key 1 new
    assert read_iceberg(spark, path).count() == 25 - n_del - 1


def test_v2_capability_gates(spark, tmp_path):
    """The honest v2 scope cuts raise with actionable messages:
    deletes on v1 tables and format-version changes mid-table.
    (Equality deletes, partitioned positional deletes, and
    rewrite_manifests over delete manifests are SUPPORTED since r6 —
    their semantics are pinned in their own tests.)"""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p1 = str(tmp_path / "v1_tbl")
    write_iceberg(src, p1, "overwrite")
    with pytest.raises(ValueError, match="format-v2"):
        ice.add_position_deletes(spark, p1, "n_nationkey = 0")
    with pytest.raises(ValueError, match="format .*fixed|fixed at table"):
        write_iceberg(src, p1, "append", format_version=2)



def test_v2_rewrite_manifests_without_deletes(spark, tmp_path):
    """rewrite_manifests on a delete-free v2 table compacts with the
    v2 schemas (content/sequence fields preserved) and bumps the
    sequence number."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "v2_rw")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite",
                  format_version=2)
    write_iceberg(src.where("n_nationkey >= 10"), path, "append",
                  format_version=2)
    res = ice.rewrite_manifests(path)
    assert res["manifests_before"] == 2 and res["manifests_after"] == 1
    meta = ice._read_metadata(path)
    assert meta["last-sequence-number"] == 3
    ml = ice._resolve(path, meta["snapshots"][-1]["manifest-list"])
    (m,) = _decode_avro_records(ml)
    assert m["content"] == 0 and m["sequence_number"] == 3
    assert m["min_sequence_number"] == 1
    assert read_iceberg(spark, path).count() == 25


def test_partition_transform_spec_conformance():
    """The spec's own Appendix-B test vectors for the bucket hash
    (murmur3_x86_32: int/long hash as 8-byte LE, strings as UTF-8) and
    the pinned semantics of truncate / temporal transforms (floored
    mod, prefix, since-epoch ordinals)."""
    import datetime as dt

    from datalakecrawler_spark.sources import iceberg_native as ice

    # Appendix B: hash(34 as int) = hash(34 as long) = 2017239379,
    # hash("iceberg") = 1210000089
    import struct

    assert ice._murmur3_32(struct.pack("<q", 34)) == 2017239379
    assert ice._murmur3_32("iceberg".encode()) == 1210000089
    assert ice._iceberg_bucket(34, 16, "int") == 2017239379 % 16
    assert ice._iceberg_bucket(34, 16, "bigint") == ice._iceberg_bucket(34, 16, "int")
    assert ice._iceberg_bucket("iceberg", 16, "string") == 1210000089 % 16

    trunc = {"transform": "truncate", "param": 10}
    assert ice._transform_value(trunc, 17, "int") == 10
    assert ice._transform_value(trunc, -3, "int") == -10  # floored mod
    s5 = {"transform": "truncate", "param": 5}
    assert ice._transform_value(s5, "icebergs", "string") == "icebe"
    d = dt.date(1971, 3, 5)
    assert ice._transform_value({"transform": "year", "param": None}, d, "x") == 1
    assert ice._transform_value({"transform": "month", "param": None}, d, "x") == 14
    assert ice._transform_value({"transform": "day", "param": None}, d, "x") == (
        d - dt.date(1970, 1, 1)
    ).days


def test_partition_transform_table_roundtrip(spark, tmp_path):
    """Transform-partitioned table: spec JSON carries the transform
    string and source-id, r102 records hold the TRANSFORM values, the
    source column survives inside the data files, and pruning by
    source value keeps exactly the matching partition's files."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_trunc")
    src = load(spark, SF_DIR, "customer")
    write_iceberg(src, path, "overwrite",
                  partition_by=["truncate(1000, c_custkey)"])
    meta = ice._read_metadata(path)
    (sf,) = meta["partition-specs"][0]["fields"]
    assert sf["transform"] == "truncate[1000]"
    assert sf["name"] == "c_custkey_trunc"
    src_field = next(
        f for f in meta["schema"]["fields"] if f["id"] == sf["source-id"]
    )
    assert src_field["name"] == "c_custkey"
    snap = meta["snapshots"][-1]
    for mf in ice._decode_avro_records(ice._resolve(path, snap["manifest-list"])):
        for e in ice._decode_avro_records(ice._resolve(path, mf["manifest_path"])):
            v = e["data_file"]["partition"]["c_custkey_trunc"]
            assert isinstance(v, int) and v % 1000 == 0
    full = read_iceberg(spark, path)
    assert "c_custkey" in full.columns and full.count() == src.count()
    pruned = read_iceberg(spark, path, partition_filter={"c_custkey": 1500})
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    got = pruned.select("c_custkey").distinct().collect()
    assert all(1000 <= r[0] < 2000 for r in got)

    # bucket on a double refuses
    with pytest.raises(TypeError, match="bucket source"):
        write_iceberg(
            src, str(tmp_path / "ice_badbkt"), "overwrite",
            partition_by=["bucket(4, c_acctbal)"],
        )


def test_nested_type_json_structure(spark, tmp_path):
    """Nested schema JSON conformance: list/struct/map nodes carry
    spec-unique element/key/value field ids, top-level columns keep
    ids 1..N, last-column-id covers the nested ids, and the read-back
    schema reconstructs the exact Spark types from metadata alone."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_nested")
    src = load(spark, SF_DIR, "embeddings").select(
        "vec_id",
        "embedding",
        F.struct(F.col("label").alias("lab")).alias("meta"),
        F.create_map(F.lit("k"), F.col("vec_id")).alias("tags"),
    )
    write_iceberg(src, path, "overwrite")
    meta = ice._read_metadata(path)
    fields = {f["name"]: f for f in meta["schema"]["fields"]}
    assert [f["id"] for f in meta["schema"]["fields"]] == [1, 2, 3, 4]
    emb = fields["embedding"]["type"]
    assert emb["type"] == "list" and emb["element"] == "float"
    st = fields["meta"]["type"]
    assert st["type"] == "struct" and st["fields"][0]["name"] == "lab"
    mp = fields["tags"]["type"]
    assert mp["type"] == "map" and mp["key"] == "string" and mp["value"] == "long"
    ids = [emb["element-id"], st["fields"][0]["id"], mp["key-id"], mp["value-id"]]
    assert len(set(ids)) == len(ids) and min(ids) > 4
    assert meta["last-column-id"] == max(ids)
    assert "last-column-id" not in meta["schema"]
    back = read_iceberg(spark, path)
    assert dict(back.dtypes) == dict(src.dtypes)
    assert back.count() == src.count()
    # decimal/fixed/uuid map (r6); genuinely unknown types still refuse
    import pyspark.sql.types as T

    assert ice._ice_type_to_spark("decimal(10,2)") == T.DecimalType(10, 2)
    assert ice._ice_type_to_spark("fixed[16]") == T.BinaryType()
    assert ice._ice_type_to_spark("uuid") == T.StringType()
    with pytest.raises(NotImplementedError, match="unmapped"):
        ice._ice_type_to_spark("variant")


def test_decimal_binary_roundtrip(spark, tmp_path):
    """Decimal and binary columns round-trip through write/read with
    exact types and values (decimal is the money type every TPC-style
    schema leans on)."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_decimal")
    src = (
        load(spark, SF_DIR, "orders")
        .limit(100)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(12,2)").alias("price_dec"),
            F.encode(F.col("o_orderpriority"), "utf-8").alias("prio_bin"),
        )
    )
    write_iceberg(src, path, "overwrite")
    meta = ice._read_metadata(path)
    types = {f["name"]: f["type"] for f in meta["schema"]["fields"]}
    assert types["price_dec"] == "decimal(12,2)"
    assert types["prio_bin"] == "binary"
    back = read_iceberg(spark, path)
    assert dict(back.dtypes) == dict(src.dtypes)
    assert back.selectExpr("sum(price_dec)").collect() == src.selectExpr(
        "sum(price_dec)"
    ).collect()
    # appends enforce decimal precision/scale as part of the type
    with pytest.raises(ValueError, match="not evolvable"):
        write_iceberg(
            src.withColumn("price_dec", F.col("price_dec").cast("decimal(18,4)")),
            path,
            "append",
        )


def test_append_schema_enforcement_and_evolution(spark, tmp_path):
    """Appends enforce the table schema: a differing column set
    refuses without merge_schema=True; with it, the committed schema
    is prior ∪ new with prior ids preserved and fresh ids for new
    columns; type changes always refuse. Old files lack the new
    column and read back as NULLs."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_evolve")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite")
    wide = src.where("n_nationkey >= 10").withColumn(
        "extra", F.col("n_nationkey") * 2
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        write_iceberg(wide, path, "append")
    with pytest.raises(ValueError, match="not evolvable"):
        write_iceberg(
            src.withColumn("n_regionkey", F.col("n_regionkey").cast("string")),
            path,
            "append",
        )
    write_iceberg(wide, path, "append", merge_schema=True)
    meta = ice._read_metadata(path)
    names = [f["name"] for f in meta["schema"]["fields"]]
    assert names == ["n_nationkey", "n_name", "n_regionkey", "extra"]
    ids = [f["id"] for f in meta["schema"]["fields"]]
    assert ids == [1, 2, 3, 4] and meta["last-column-id"] == 4
    back = read_iceberg(spark, path)
    assert back.count() == 25
    assert back.where("n_nationkey < 10").where(F.col("extra").isNull()).count() == 10
    assert back.where("n_nationkey >= 10").where(
        F.col("extra") == F.col("n_nationkey") * 2
    ).count() == 15
    # same-schema appends stay frictionless (ids preserved)
    write_iceberg(wide.limit(1), path, "append")
    assert read_iceberg(spark, path).count() == 26


def test_metadata_tables(spark, tmp_path):
    """files/snapshots metadata tables: one row per live file with
    typed-as-string partition values and footer-true record counts;
    snapshots table carries operations and (v2) sequence numbers."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_meta_tbl")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src, path, "overwrite", format_version=2)
    ice.add_position_deletes(spark, path, "n_nationkey = 0")
    ft = ice.iceberg_files_table(spark, path)
    data_rows = ft.where("content = 0").collect()
    assert sum(r["record_count"] for r in data_rows) == 25
    del_rows = ft.where("content = 1").collect()
    assert len(del_rows) == 1 and del_rows[0]["record_count"] == 1
    st = ice.iceberg_snapshots_table(spark, path).orderBy("snapshot_id").collect()
    assert [r["operation"] for r in st] == ["overwrite", "delete"]
    assert [r["sequence_number"] for r in st] == [1, 2]


def test_equality_deletes_sequencing_and_values(spark, tmp_path):
    """Equality deletes: value-based, null-safe, applied only to data
    files with a strictly smaller sequence number; multi-column keys;
    never rewrites data files; equality_ids recorded in the manifest."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_eqdel")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite",
                  format_version=2)  # seq 1
    res = ice.add_equality_deletes(
        spark, path, src.where("n_nationkey in (2, 4)").select("n_nationkey")
    )  # seq 2
    assert res["delete_rows"] == 2 and res["sequence_number"] == 2
    assert res["equality_ids"] == [1]  # n_nationkey is field id 1
    write_iceberg(src.where("n_nationkey in (2, 15)"), path, "append",
                  format_version=2)  # seq 3: re-inserts key 2
    back = read_iceberg(spark, path)
    keys = sorted(r[0] for r in back.select("n_nationkey").collect())
    # 0..9 minus {2,4} from seq1, plus the seq-3 re-insert of 2 and 15
    assert keys == [0, 1, 2, 3, 5, 6, 7, 8, 9, 15]
    # a later delete hits both earlier commits
    ice.add_equality_deletes(
        spark, path, src.where("n_nationkey = 2").select("n_nationkey")
    )  # seq 4
    keys = sorted(
        r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect()
    )
    assert keys == [0, 1, 3, 5, 6, 7, 8, 9, 15]


def test_equality_deletes_multicolumn_and_nulls(spark, tmp_path):
    """Multi-column equality keys match null-safely: a delete row with
    a NULL value deletes data rows whose column IS NULL (the spec's
    null-equals-null rule for equality fields)."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_eqdel_nulls")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, None, 11.0), (2, "a", 12.0), (2, "b", 13.0)],
        "k int, tag string, v double",
    )
    write_iceberg(df, path, "overwrite", format_version=2)
    dels = spark.createDataFrame([(1, None), (2, "b")], "k int, tag string")
    res = ice.add_equality_deletes(spark, path, dels)
    assert sorted(res["equality_ids"]) == [1, 2]
    left = read_iceberg(spark, path).select("k", "tag", "v").collect()
    assert sorted((r[0], r[1]) for r in left) == [(1, "a"), (2, "a")]


def test_equality_and_positional_deletes_compose(spark, tmp_path):
    """A table carrying BOTH delete flavors applies each with its own
    rule: positional by (file, pos), equality by value + sequencing."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_mixed_del")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src, path, "overwrite", format_version=2)  # seq 1
    ice.add_position_deletes(spark, path, "n_nationkey = 0")  # seq 2
    ice.add_equality_deletes(
        spark, path, src.where("n_nationkey in (1, 3)").select("n_nationkey")
    )  # seq 3
    # positional idempotence must survive the eq manifest in the list
    res = ice.add_position_deletes(spark, path, "n_nationkey = 0")
    assert res["deleted_rows"] == 0
    keys = sorted(
        r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect()
    )
    assert keys == sorted(set(range(25)) - {0, 1, 3})


def test_equality_delete_gates(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p1 = str(tmp_path / "ice_eq_v1")
    write_iceberg(src, p1, "overwrite")
    with pytest.raises(ValueError, match="format-v2"):
        ice.add_equality_deletes(spark, p1, src.select("n_nationkey"))
    p3 = str(tmp_path / "ice_eq_cols")
    write_iceberg(src, p3, "overwrite", format_version=2)
    with pytest.raises(ValueError, match="not in the table schema"):
        ice.add_equality_deletes(
            spark, p3, src.selectExpr("n_nationkey as nope")
        )


def test_positional_deletes_on_partitioned_tables(spark, tmp_path):
    """Positional deletes on an identity-partitioned v2 table: the
    predicate may reference the partition column (re-derived from the
    hive dirs), no data file is rewritten, reads — including
    partition-filtered reads — apply the deletes, and time travel
    still serves the pre-delete rows."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_pos_part")
    src = load(spark, SF_DIR, "nation")
    s1 = write_iceberg(src, path, "overwrite", partition_by=["n_regionkey"],
                       format_version=2)
    files_before = sorted(
        glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                  recursive=True)
    )
    # predicate mixes a partition column and a data column
    res = ice.add_position_deletes(
        spark, path, "n_regionkey = 0 or n_nationkey = 24"
    )
    assert res["deleted_rows"] == 6  # 5 in region 0 + nation 24
    assert sorted(
        f for f in glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                             recursive=True)
        if "delete-" not in os.path.basename(f)
    ) == files_before
    back = read_iceberg(spark, path)
    assert back.count() == 19
    assert back.where("n_regionkey = 0").count() == 0
    # partition-filtered read still applies the deletes (nation 24
    # lives in region 4 in this fixture: n_regionkey = key % 5)
    r1 = read_iceberg(spark, path, partition_filter={"n_regionkey": 4})
    keys = {r[0] for r in r1.select("n_nationkey").collect()}
    assert 24 not in keys and keys == {4, 9, 14, 19}
    # pre-delete snapshot intact
    assert read_iceberg(spark, path, snapshot_id=s1).count() == 25
    # transform-spec table: source column stays in the files, so the
    # predicate works without re-derivation
    p2 = str(tmp_path / "ice_pos_bucket")
    write_iceberg(src, p2, "overwrite", partition_by=["bucket(4, n_nationkey)"],
                  format_version=2)
    res2 = ice.add_position_deletes(spark, p2, "n_nationkey < 5")
    assert res2["deleted_rows"] == 5
    assert read_iceberg(spark, p2).count() == 20


def test_rollback_snapshot_is_metadata_only(spark, tmp_path):
    """Rollback re-points current-snapshot-id; all snapshots stay in
    the list (rolling forward again works); unknown ids refuse; a
    same-id rollback is a no-op that publishes nothing."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_rollback")
    src = load(spark, SF_DIR, "nation")
    s1 = write_iceberg(src.where("n_nationkey < 10"), path, "overwrite")
    s2 = write_iceberg(src, path, "overwrite")
    n_meta = len(glob.glob(os.path.join(path, "metadata", "v*.metadata.json")))
    assert ice.rollback_snapshot(path, s2) == {"current": s2, "previous": s2}
    assert (
        len(glob.glob(os.path.join(path, "metadata", "v*.metadata.json")))
        == n_meta
    )  # no-op publishes nothing
    res = ice.rollback_snapshot(path, s1)
    assert res == {"current": s1, "previous": s2}
    assert read_iceberg(spark, path).count() == 10
    # roll forward again
    ice.rollback_snapshot(path, s2)
    assert read_iceberg(spark, path).count() == 25
    with pytest.raises(ValueError, match="not in table"):
        ice.rollback_snapshot(path, 999)
    # appends after a rollback build on the rolled-back state
    ice.rollback_snapshot(path, s1)
    write_iceberg(src.where("n_nationkey >= 20"), path, "append")
    assert read_iceberg(spark, path).count() == 15


def test_rewrite_manifests_preserves_delete_sequencing(spark, tmp_path):
    """The killer case for naive manifest compaction: seq1 appends keys
    0-9, seq2 equality-deletes {2,4}, seq3 re-appends key 2. The
    rewrite merges the two data manifests into one — if entries
    inherited the MERGED manifest's (newer) sequence number, the seq-2
    delete would stop applying and keys 2,4 from seq1 would resurrect.
    Explicit per-entry sequence numbers keep the read identical before
    and after; positional deletes carry through too."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_rw_del")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite",
                  format_version=2)  # seq 1
    ice.add_equality_deletes(
        spark, path, src.where("n_nationkey in (2, 4)").select("n_nationkey")
    )  # seq 2
    write_iceberg(src.where("n_nationkey = 2"), path, "append",
                  format_version=2)  # seq 3 re-inserts key 2
    ice.add_position_deletes(spark, path, "n_nationkey = 7")  # seq 4

    def keys():
        return sorted(
            r[0]
            for r in read_iceberg(spark, path).select("n_nationkey").collect()
        )

    before = keys()
    assert before == [0, 1, 2, 3, 5, 6, 8, 9]  # 2 is the seq-3 re-insert
    res = ice.rewrite_manifests(path)
    assert res["entries"] == 2  # one data file each from seq1 and seq3
    assert keys() == before
    # the rewritten manifest's entries carry explicit sequence numbers
    meta = ice._read_metadata(path)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    mls = ice._decode_avro_records(ice._resolve(path, snap["manifest-list"]))
    data_mfs = [m for m in mls if m.get("content", 0) == 0]
    del_mfs = [m for m in mls if m.get("content", 0) == 1]
    assert len(data_mfs) == 1 and len(del_mfs) == 2
    entries = ice._decode_avro_records(
        ice._resolve(path, data_mfs[0]["manifest_path"])
    )
    seqs = sorted(e["sequence_number"] for e in entries)
    assert seqs == [1, 3]


def test_refs_tags_branches_and_retention(spark, tmp_path):
    """Refs: tags are immutable names, branches move, both pin their
    snapshot against expiry, refs survive commits, and dropping a ref
    releases the retention lease."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_refs")
    src = load(spark, SF_DIR, "nation")
    s1 = write_iceberg(src.where("n_nationkey < 10"), path, "overwrite")
    ice.set_ref(path, "v1", s1, "tag")
    ice.set_ref(path, "dev", s1, "branch")
    s2 = write_iceberg(src, path, "overwrite")
    # refs survive the commit
    meta = ice._read_metadata(path)
    assert set(meta["refs"]) == {"v1", "dev"}
    # reads by ref
    assert read_iceberg(spark, path, ref="v1").count() == 10
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, path, snapshot_id=s1, ref="v1")
    with pytest.raises(ValueError, match="no ref named"):
        read_iceberg(spark, path, ref="nope")
    # branches move; tags refuse
    ice.set_ref(path, "dev", s2, "branch")
    assert read_iceberg(spark, path, ref="dev").count() == 25
    with pytest.raises(ValueError, match="immutable"):
        ice.set_ref(path, "v1", s2, "tag")
    with pytest.raises(ValueError, match="not in table"):
        ice.set_ref(path, "v2", 999, "tag")
    # expiry retains the tagged snapshot
    res = ice.expire_snapshots(path, retain_last=1)
    assert res["expired"] == []
    assert read_iceberg(spark, path, ref="v1").count() == 10
    # dropping the tag releases it
    ice.drop_ref(path, "v1")
    with pytest.raises(ValueError, match="no ref named"):
        ice.drop_ref(path, "v1")
    res2 = ice.expire_snapshots(path, retain_last=1)
    assert res2["expired"] == [s1]


def test_overwrite_partitions_manifest_handling(spark, tmp_path):
    """Dynamic partition overwrite at the manifest level: untouched
    manifests reuse by path, mixed manifests rewrite keeping survivors
    as EXISTING with original sequence numbers (v2), wholly-replaced
    manifests drop, and delete manifests carry through."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_dpo")
    src = load(spark, SF_DIR, "nation")
    with pytest.raises(ValueError, match="partitioned table"):
        write_iceberg(src, str(tmp_path / "x"), "overwrite_partitions")
    # v2 table: region-partitioned, with an equality delete in between
    write_iceberg(src, path, "overwrite", partition_by=["n_regionkey"],
                  format_version=2)  # seq 1
    write_iceberg(
        src.limit(0), path, "append", partition_by=["n_regionkey"],
        format_version=2,
    )  # seq 2: empty append → an extra (empty) manifest to reuse
    repl = spark.createDataFrame(
        [(100, "NEWLAND", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    write_iceberg(repl, path, "overwrite_partitions",
                  partition_by=["n_regionkey"], format_version=2)  # seq 3
    back = read_iceberg(spark, path)
    # region 0 replaced by the single new row; others intact
    assert back.where("n_regionkey = 0").count() == 1
    assert back.where("n_regionkey = 0").collect()[0]["n_nationkey"] == 100
    assert back.count() == 25 - 5 + 1
    # time travel to seq 1 serves the original region 0
    assert read_iceberg(spark, path, snapshot_id=1).count() == 25
    # the rewritten manifest's survivors carry explicit original seqs
    meta = ice._read_metadata(path)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    mls = ice._decode_avro_records(ice._resolve(path, snap["manifest-list"]))
    rewritten = [
        m for m in mls if "dpo" in os.path.basename(m["manifest_path"])
    ]
    assert len(rewritten) == 1
    entries = ice._decode_avro_records(
        ice._resolve(path, rewritten[0]["manifest_path"])
    )
    assert all(e["status"] == 0 for e in entries)  # EXISTING
    assert {e["sequence_number"] for e in entries} == {1}
    assert all(
        e["data_file"]["partition"]["n_regionkey"] != 0 for e in entries
    )


def test_incremental_append_scan(spark, tmp_path):
    """Incremental reads serve exactly the in-range appends; ranges
    with overwrites refuse; unknown snapshot ids refuse; partitioned
    tables re-derive partition columns."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_inc")
    src = load(spark, SF_DIR, "nation")
    s1 = write_iceberg(src.where("n_nationkey < 10"), path, "overwrite",
                       partition_by=["n_regionkey"])
    s2 = write_iceberg(src.where("n_nationkey >= 10 and n_nationkey < 20"),
                       path, "append", partition_by=["n_regionkey"])
    s3 = write_iceberg(src.where("n_nationkey >= 20"), path, "append",
                       partition_by=["n_regionkey"])
    inc = ice.read_iceberg_incremental(spark, path, s1)
    assert sorted(r[0] for r in inc.select("n_nationkey").collect()) == list(
        range(10, 25)
    )
    assert inc.where(F.col("n_regionkey").isNull()).count() == 0
    only2 = ice.read_iceberg_incremental(spark, path, s1, s2)
    assert only2.count() == 10
    with pytest.raises(ValueError, match="no snapshots in"):
        ice.read_iceberg_incremental(spark, path, s3)
    with pytest.raises(ValueError, match="not in table"):
        ice.read_iceberg_incremental(spark, path, 99)
    # a range crossing an overwrite refuses
    write_iceberg(src.limit(5), path, "overwrite", partition_by=["n_regionkey"])
    with pytest.raises(NotImplementedError, match="append-only"):
        ice.read_iceberg_incremental(spark, path, s2)


def test_write_audit_publish_branch_flow(spark, tmp_path):
    """Branch writes stage snapshots (main head unmoved), successive
    branch appends build on the branch head, fast_forward publishes,
    tags refuse as write targets, and branch writes need an existing
    table."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    with pytest.raises(ValueError, match="EXISTING table"):
        write_iceberg(src, str(tmp_path / "nope"), "append", branch="b")
    path = str(tmp_path / "ice_wap")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite")
    write_iceberg(src.where("n_nationkey >= 10 and n_nationkey < 15"),
                  path, "append", branch="dev")
    # second branch append builds on the BRANCH head, not main
    write_iceberg(src.where("n_nationkey >= 15"), path, "append",
                  branch="dev")
    assert read_iceberg(spark, path).count() == 10  # main unmoved
    assert read_iceberg(spark, path, ref="dev").count() == 25
    # a tag is not a write target
    ice.set_ref(path, "v1", 1, "tag")
    with pytest.raises(ValueError, match="immutable"):
        write_iceberg(src.limit(1), path, "append", branch="v1")
    with pytest.raises(ValueError, match="not a branch"):
        ice.fast_forward(path, "v1")
    with pytest.raises(ValueError, match="no ref named"):
        ice.fast_forward(path, "nope")
    res = ice.fast_forward(path, "dev")
    assert res["previous"] == 1
    assert read_iceberg(spark, path).count() == 25
    # publish is idempotent
    assert ice.fast_forward(path, "dev")["previous"] == res["current"]


def test_equality_deletes_on_partitioned_tables(spark, tmp_path):
    """Global equality deletes on an identity-partitioned v2 table:
    value-based across every partition, sequencing preserved,
    partition-filtered reads still apply them, and deleting by the
    partition column itself works (it is just another equality
    field)."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_eqdel_part")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src, path, "overwrite", partition_by=["n_regionkey"],
                  format_version=2)  # seq 1
    ice.add_equality_deletes(
        spark, path, src.where("n_nationkey in (2, 4)").select("n_nationkey")
    )  # seq 2
    write_iceberg(src.where("n_nationkey = 2"), path, "append",
                  partition_by=["n_regionkey"], format_version=2)  # seq 3
    keys = sorted(
        r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect()
    )
    assert keys == sorted(set(range(25)) - {4} )  # 2 re-inserted at seq 3
    # partition-filtered read still applies the delete (4 is region 4)
    r4 = read_iceberg(spark, path, partition_filter={"n_regionkey": 4})
    assert sorted(r[0] for r in r4.select("n_nationkey").collect()) == [9, 14, 19, 24]
    # delete by the PARTITION column value: drops a whole partition
    ice.add_equality_deletes(
        spark, path,
        spark.createDataFrame([(0,)], "n_regionkey int"),
    )  # seq 4
    back = read_iceberg(spark, path)
    assert back.where("n_regionkey = 0").count() == 0
    assert back.count() == 24 - 5  # minus region 0's five (2 was region 2)


def test_equality_deletes_special_char_path_fails_closed(spark, tmp_path):
    """A table path with spaces and '%' — the characters Spark's
    _metadata.file_path percent-encodes — must still apply equality
    deletes exactly (the seq join key is computed driver-side in
    Spark's own URI form); a normalization miss would raise, never
    silently resurrect deleted rows."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice eq%del dir")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 8"), path, "overwrite",
                  format_version=2)
    ice.add_equality_deletes(
        spark, path, src.where("n_nationkey in (1, 5)").select("n_nationkey")
    )
    keys = sorted(
        r[0]
        for r in read_iceberg(spark, path).select("n_nationkey").collect()
    )
    assert keys == [0, 2, 3, 4, 6, 7]


def test_spark_file_uri_matches_metadata_column(spark, tmp_path):
    """_spark_file_uri reproduces _metadata.file_path byte-for-byte on
    hostile path characters (space, %, +, #, unicode)."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.sources.iceberg_native import _spark_file_uri

    base = str(tmp_path / "a b%c+d#é")
    spark.range(1).coalesce(1).write.parquet(base)
    got = (
        spark.read.parquet(base)
        .select(F.col("_metadata.file_path").alias("p"))
        .first()["p"]
    )
    import glob as _glob

    fs = _glob.glob(os.path.join(base, "*.parquet"))[0]
    assert _spark_file_uri(fs) == got


def test_changelog_scan_over_deletes_and_overwrites(spark, tmp_path):
    """read_iceberg_changelog serves exact per-snapshot (insert/delete)
    row sets across append, equality-delete, positional-delete, and
    overwrite snapshots — the range the plain incremental scan refuses."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_changelog")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite",
                  format_version=2)  # s1: insert 0..9
    ice.add_equality_deletes(
        spark, path, src.where("n_nationkey in (2, 4)").select("n_nationkey")
    )  # s2: delete 2, 4
    write_iceberg(src.where("n_nationkey between 10 and 14"), path, "append",
                  format_version=2)  # s3: insert 10..14
    ice.add_position_deletes(spark, path, "n_nationkey = 11")  # s4: delete 11
    snaps = [s["snapshot_id"] for s in ice.iceberg_snapshots(path)]
    assert len(snaps) == 4

    ch = ice.read_iceberg_changelog(spark, path, snaps[0])
    got = sorted(
        (r["n_nationkey"], r["_change_type"], snaps.index(r["_snapshot_id"]) + 1)
        for r in ch.collect()
    )
    want = sorted(
        [(2, "delete", 2), (4, "delete", 2)]
        + [(k, "insert", 3) for k in range(10, 15)]
        + [(11, "delete", 4)]
    )
    assert got == want
    # sub-ranges slice exactly
    ch2 = ice.read_iceberg_changelog(spark, path, snaps[1], snaps[2])
    assert sorted(r["n_nationkey"] for r in ch2.collect()) == list(range(10, 15))
    # the plain incremental scan still refuses a delete-bearing range
    with pytest.raises(NotImplementedError, match="changelog"):
        ice.read_iceberg_incremental(spark, path, snaps[0])
    # changes replay to the head state: base + inserts - deletes
    base = read_iceberg(spark, path, snapshot_id=snaps[0])
    replayed = set(r[0] for r in base.select("n_nationkey").collect())
    for k, t, _ in sorted(got, key=lambda x: x[2]):  # snapshot order
        replayed = (replayed | {k}) if t == "insert" else (replayed - {k})
    head = set(r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect())
    assert replayed == head


def test_changelog_overwrite_snapshot(spark, tmp_path):
    """An OVERWRITE snapshot changelogs as delete(old rows) +
    insert(new rows) — and unchanged-by-value rows rewritten into new
    files cancel out of the multiset diff."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_changelog_ow")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 5"), path, "overwrite")  # s1
    write_iceberg(
        src.where("n_nationkey between 3 and 7"), path, "overwrite"
    )  # s2: drops 0-2, keeps 3-4 (new files), adds 5-7
    snaps = [s["snapshot_id"] for s in ice.iceberg_snapshots(path)]
    ch = ice.read_iceberg_changelog(spark, path, snaps[0])
    got = sorted(
        (r["n_nationkey"], r["_change_type"]) for r in ch.collect()
    )
    assert got == [
        (0, "delete"), (1, "delete"), (2, "delete"),
        (5, "insert"), (6, "insert"), (7, "insert"),
    ]


def test_mixed_identity_transform_spec_roundtrip(spark, tmp_path):
    """MIXED identity+transform spec: the identity column re-derives
    from its hive dir, the transform SOURCE column survives inside the
    data files, r102 records carry both typed values, and pruning
    works at both metadata levels on either field."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_mixed_spec")
    src = load(spark, SF_DIR, "customer")
    write_iceberg(
        src, path, "overwrite",
        partition_by=["c_mktsegment", "bucket(4, c_custkey)"],
    )
    meta = ice._read_metadata(path)
    sfs = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in sfs] == ["identity", "bucket[4]"]
    snap = meta["snapshots"][-1]
    for mf in ice._decode_avro_records(ice._resolve(path, snap["manifest-list"])):
        for e in ice._decode_avro_records(ice._resolve(path, mf["manifest_path"])):
            p = e["data_file"]["partition"]
            assert isinstance(p["c_mktsegment"], str)
            assert p["c_custkey_bucket"] in (0, 1, 2, 3)
    full = read_iceberg(spark, path)
    assert sorted(full.columns) == sorted(src.columns)
    assert full.count() == src.count()
    # exact value equality (identity col re-derived, source col in-file)
    got = sorted(
        (r["c_custkey"], r["c_mktsegment"])
        for r in full.select("c_custkey", "c_mktsegment").collect()
    )
    want = sorted(
        (r[0], r[1]) for r in src.select("c_custkey", "c_mktsegment").collect()
    )
    assert got == want
    # prune on the identity source
    seg = src.select("c_mktsegment").first()[0]
    pruned = read_iceberg(spark, path, partition_filter={"c_mktsegment": seg})
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    assert pruned.count() == src.where(F.col("c_mktsegment") == seg).count()
    # prune on the bucket source (lossy: superset of matching files)
    pruned2 = read_iceberg(spark, path, partition_filter={"c_custkey": 17})
    assert 0 < len(pruned2.inputFiles()) < len(full.inputFiles())
    assert pruned2.where("c_custkey = 17").count() == 1
    # appends keep the spec; the table stays readable
    write_iceberg(
        src.limit(5).withColumn("c_custkey", F.col("c_custkey") + 1000000),
        path, "append",
        partition_by=["c_mktsegment", "bucket(4, c_custkey)"],
    )
    assert read_iceberg(spark, path).count() == src.count() + 5


def test_partition_scoped_equality_deletes(spark, tmp_path):
    """partition_scope commits the spec's PARTITIONED delete file: the
    manifest entry carries the typed r102 tuple and the read applies
    the delete ONLY to that partition — the same key surviving in
    another partition stays live. Changelog scans narrow their
    candidate set to the scoped partition."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_eqdel_scoped")
    rows = spark.createDataFrame(
        [(1, "A", 10), (1, "B", 20), (2, "A", 30), (2, "B", 40)],
        "k int, p string, v int",
    )
    write_iceberg(rows, path, "overwrite", partition_by=["p"],
                  format_version=2)
    dels = spark.createDataFrame([(1,)], "k int")
    res = ice.add_equality_deletes(
        spark, path, dels, partition_scope={"p": "A"}
    )
    assert res["partition_scope"] == {"p": "A"}
    got = sorted(
        (r["k"], r["p"]) for r in read_iceberg(spark, path).collect()
    )
    # (1, 'B') SURVIVES: the delete is scoped to partition A
    assert got == [(1, "B"), (2, "A"), (2, "B")]
    # a second, GLOBAL delete of k=2 hits both partitions
    ice.add_equality_deletes(spark, path, spark.createDataFrame([(2,)], "k int"))
    got2 = sorted(
        (r["k"], r["p"]) for r in read_iceberg(spark, path).collect()
    )
    assert got2 == [(1, "B")]
    # changelog over the range reports exactly the right delete rows
    snaps = [s["snapshot_id"] for s in ice.iceberg_snapshots(path)]
    ch = ice.read_iceberg_changelog(spark, path, snaps[0])
    chg = sorted(
        (r["k"], r["p"], r["_change_type"]) for r in ch.collect()
    )
    assert chg == [
        (1, "A", "delete"), (2, "A", "delete"), (2, "B", "delete"),
    ]
    # scope validation: incomplete scopes refuse; transform specs are
    # keyed by SOURCE column (spec-field names refuse)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="every spec SOURCE column"):
        ice.add_equality_deletes(spark, path, dels, partition_scope={})
    p2 = str(tmp_path / "ice_eqdel_scoped_tx")
    write_iceberg(rows, p2, "overwrite", partition_by=["bucket(4, k)"],
                  format_version=2)
    with _pytest.raises(ValueError, match="every spec SOURCE column"):
        ice.add_equality_deletes(spark, p2, dels, partition_scope={"k_bucket": 1})


def test_partition_scoped_equality_deletes_transform_spec(spark, tmp_path):
    """Scoped equality deletes on a TRANSFORM spec (VERDICT r7 §5): the
    scope names the SOURCE column with a source-domain value; the
    committed delete tuple carries the murmur3 bucket value derived by
    the same transform the write path applies, so it matches exactly
    the data files of that bucket — and only that bucket."""
    from datalakecrawler_spark.sources import iceberg_native as ice
    from datalakecrawler_spark.sources.iceberg_native import (
        _iceberg_bucket,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_eqdel_bucket_scoped")
    rows = spark.createDataFrame(
        [(k, f"v{k}") for k in range(8)], "k int, v string"
    )
    write_iceberg(
        rows, path, "overwrite", partition_by=["bucket(4, k)"],
        format_version=2,
    )
    # delete key k=3 scoped to ITS OWN bucket — the delete erases it
    dels = spark.createDataFrame([(3,)], "k int")
    res = ice.add_equality_deletes(spark, path, dels, partition_scope={"k": 3})
    b3 = _iceberg_bucket(3, 4, "int")
    assert res["partition_scope"] == {"k_bucket": b3}
    assert sorted(
        r["k"] for r in read_iceberg(spark, path).collect()
    ) == [k for k in range(8) if k != 3]
    # delete key k=5 scoped to a DIFFERENT key's bucket — k=5 survives
    # unless it happens to share that bucket (derive honestly)
    other = next(
        k for k in range(8) if _iceberg_bucket(k, 4, "int")
        != _iceberg_bucket(5, 4, "int")
    )
    dels5 = spark.createDataFrame([(5,)], "k int")
    ice.add_equality_deletes(
        spark, path, dels5, partition_scope={"k": other}
    )
    assert 5 in {r["k"] for r in read_iceberg(spark, path).collect()}


def test_upsert_single_snapshot(spark, tmp_path):
    """upsert_iceberg commits retraction + reinsertion ATOMICALLY: one
    snapshot, one sequence number, eq-delete applies to prior images
    only (strict seq rule keeps this commit's own files), and time
    travel never exposes a keys-deleted intermediate state."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_upsert")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src, path, "overwrite", format_version=2)
    changes = (
        src.where("n_nationkey in (2, 7)")
        .withColumn("n_name", F.concat(F.col("n_name"), F.lit("_v2")))
        .unionByName(
            spark.createDataFrame([(100, "NEWLAND", 0)], src.schema)
        )
    )
    res = ice.upsert_iceberg(spark, path, changes, ["n_nationkey"])
    assert res["keys_retracted"] == 3 and res["rows_upserted"] == 3
    snaps = ice.iceberg_snapshots(path)
    assert len(snaps) == 2 and snaps[-1]["operation"] == "overwrite"
    got = {
        r["n_nationkey"]: r["n_name"]
        for r in read_iceberg(spark, path).collect()
    }
    assert len(got) == 26
    assert got[2].endswith("_v2") and got[7].endswith("_v2")
    assert got[100] == "NEWLAND" and not got[3].endswith("_v2")
    # a second upsert of the SAME key wins again (latest sequence)
    ice.upsert_iceberg(
        spark, path,
        spark.createDataFrame([(2, "FINAL", 0)], src.schema),
        ["n_nationkey"],
    )
    got2 = {
        r["n_nationkey"]: r["n_name"]
        for r in read_iceberg(spark, path).collect()
    }
    assert got2[2] == "FINAL" and len(got2) == 26
    # time travel: snapshot 1 serves the original table untouched
    assert read_iceberg(spark, path, snapshot_id=1).count() == 25
    # validation gates
    with pytest.raises(ValueError, match="not in the table schema"):
        ice.upsert_iceberg(spark, path, changes, ["nope"])


def test_compact_deletes_converts_eq_to_positional(spark, tmp_path):
    """compact_iceberg_deletes replaces accumulated equality (and
    positional) delete files with ONE positional manifest; reads are
    identical before and after; sequencing semantics already applied
    at conversion stay respected (post-delete appends untouched)."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_delcompact")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite",
                  format_version=2)  # seq 1
    ice.add_equality_deletes(
        spark, path, src.where("n_nationkey in (2, 4)").select("n_nationkey")
    )  # seq 2
    write_iceberg(src.where("n_nationkey in (2, 15)"), path, "append",
                  format_version=2)  # seq 3: re-inserts 2
    ice.add_position_deletes(spark, path, "n_nationkey = 7")  # seq 4
    before = sorted(
        r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect()
    )
    res = ice.compact_iceberg_deletes(spark, path)
    assert res["eq_delete_files_removed"] >= 1
    assert res["converted_rows"] == 3  # keys 2 (seq1 image), 4, and 7
    after = sorted(
        r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect()
    )
    assert after == before
    # no equality-delete manifests remain at the head
    meta = ice._read_metadata(path)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    _f, _pd, eq_dels, _ds, _dp, _sp = ice._resolve_state(path, snap)
    assert eq_dels == []
    # idempotent: nothing left to convert
    assert ice.compact_iceberg_deletes(spark, path)["converted_rows"] == 0
    # time travel to the pre-compaction snapshot still applies eq rules
    snaps = [s["snapshot_id"] for s in ice.iceberg_snapshots(path)]
    assert read_iceberg(spark, path, snapshot_id=snaps[-2]).count() == len(before)


def test_rename_column_metadata_only(spark, tmp_path):
    """rename_iceberg_column touches one metadata.json: files written
    BEFORE the rename (under the old parquet name) resolve by FIELD ID
    to the new name; appends after the rename interleave; pushdown on
    the renamed column still reaches the scan; positional deletes
    survive; equality-delete tables gate until compacted."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_rename")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 10"), path, "overwrite",
                  format_version=2)
    data_before = sorted(
        glob.glob(os.path.join(path, "data", "*.parquet"))
    )
    ice.add_position_deletes(spark, path, "n_nationkey = 3")
    v = ice.rename_iceberg_column(path, "n_name", "nation_name")
    assert sorted(glob.glob(os.path.join(path, "data", "*.parquet"))) != []
    assert sorted(
        f for f in glob.glob(os.path.join(path, "data", "*.parquet"))
        if "delete" not in os.path.basename(f)
    ) == data_before, "rename must not rewrite data files"
    back = read_iceberg(spark, path)
    assert "nation_name" in back.columns and "n_name" not in back.columns
    assert back.where("nation_name = 'NATION_5'").count() == 1
    assert back.count() == 9  # the positional delete still applies
    # append AFTER the rename: new files store the new name, old files
    # the old one — both resolve by id in one scan
    write_iceberg(
        src.where("n_nationkey between 10 and 12")
        .withColumnRenamed("n_name", "nation_name"),
        path, "append", format_version=2,
    )
    keys = sorted(
        r[0] for r in read_iceberg(spark, path).select("n_nationkey").collect()
    )
    assert keys == sorted(set(range(13)) - {3})
    # filter pushdown by the new name over the OLD files
    got = read_iceberg(spark, path).where("nation_name = 'NATION_2'")
    assert got.count() == 1 and got.first()["n_nationkey"] == 2
    # gates
    with pytest.raises(ValueError, match="already exists"):
        ice.rename_iceberg_column(path, "n_regionkey", "nation_name")
    p2 = str(tmp_path / "ice_rename_eq")
    write_iceberg(src.where("n_nationkey < 5"), p2, "overwrite",
                  format_version=2)
    ice.add_equality_deletes(
        spark, p2, src.where("n_nationkey = 1").select("n_nationkey")
    )
    with pytest.raises(NotImplementedError, match="EQUALITY delete"):
        ice.rename_iceberg_column(p2, "n_name", "x")
    # ...until the deletes compact to positional form
    ice.compact_iceberg_deletes(spark, p2)
    ice.rename_iceberg_column(p2, "n_name", "x")
    assert "x" in read_iceberg(spark, p2).columns
    # partition-spec source renames are wired since r9 — see
    # test_rename_partition_source_column_metadata_only


def test_add_and_drop_column_metadata_only(spark, tmp_path):
    """ADD/DROP COLUMN touch only metadata.json: old files serve NULLs
    for added fields (fresh id), dropped fields stop resolving while
    their bytes stay, the retired id is never reused (a re-added name
    can't leak old values), and appends interleave."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_adddrop")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src.where("n_nationkey < 5"), path, "overwrite",
                  format_version=2)
    data_before = sorted(glob.glob(os.path.join(path, "data", "*.parquet")))
    ice.add_iceberg_column(path, "score", "double")
    assert sorted(glob.glob(os.path.join(path, "data", "*.parquet"))) == data_before
    back = read_iceberg(spark, path)
    assert "score" in back.columns
    assert back.where("score is null").count() == 5  # old files: NULLs
    # append WITH the new column
    write_iceberg(
        src.where("n_nationkey between 5 and 7").withColumn(
            "score", F.col("n_nationkey") * 1.5
        ),
        path, "append", format_version=2,
    )
    got = {r["n_nationkey"]: r["score"] for r in read_iceberg(spark, path).collect()}
    assert got[6] == 9.0 and got[2] is None
    # drop it again: bytes stay, resolution stops
    ice.drop_iceberg_column(path, "score")
    back2 = read_iceberg(spark, path)
    assert "score" not in back2.columns and back2.count() == 8
    # re-adding the same name maps to a FRESH id: old values never leak
    ice.add_iceberg_column(path, "score", "double")
    assert read_iceberg(spark, path).where("score is not null").count() == 0
    # gates
    with pytest.raises(ValueError, match="already exists"):
        ice.add_iceberg_column(path, "score", "double")
    p2 = str(tmp_path / "ice_adddrop_part")
    write_iceberg(src, p2, "overwrite", partition_by=["n_regionkey"])
    with pytest.raises(NotImplementedError, match="partition-spec source"):
        ice.drop_iceberg_column(p2, "n_regionkey")


def test_upsert_partitioned_scoped_deletes(spark, tmp_path):
    """Single-snapshot upsert on a PARTITIONED table (VERDICT r7 §6):
    when the spec source is one of the key columns, the retraction
    commits one partition-scoped delete file per touched partition —
    untouched partitions' manifests never see a delete."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_upsert_part")
    rows = spark.createDataFrame(
        [(k, "A" if k % 2 == 0 else "B", f"v{k}") for k in range(10)],
        "k int, p string, v string",
    )
    write_iceberg(rows, path, "overwrite", partition_by=["p"],
                  format_version=2)
    changes = spark.createDataFrame(
        [(2, "A", "v2_new"), (4, "A", "v4_new"), (100, "A", "fresh")],
        "k int, p string, v string",
    )
    res = ice.upsert_iceberg(spark, path, changes, ["k", "p"])
    assert res["keys_retracted"] == 3 and res["rows_upserted"] == 3
    assert len(ice.iceberg_snapshots(path)) == 2  # ONE snapshot
    got = {r["k"]: r["v"] for r in read_iceberg(spark, path).collect()}
    assert len(got) == 11
    assert got[2] == "v2_new" and got[4] == "v4_new" and got[100] == "fresh"
    assert got[3] == "v3" and got[1] == "v1"  # partition B untouched
    # the delete files are scoped: every eq-delete entry carries a
    # typed partition tuple naming only touched partition A
    meta = ice._read_metadata(path)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    _f, _pd, eq_dels, _ds, _dp, _sp = ice._resolve_state(path, snap)
    assert eq_dels and all(scope is not None for _, _, scope in eq_dels)
    import json as _json

    assert {
        _json.loads(scope)["p"] for _, _, scope in eq_dels
    } == {"A"}
    # partition pruning still serves B without reading A's deletes
    only_b = read_iceberg(spark, path, partition_filter={"p": "B"})
    assert sorted(r["k"] for r in only_b.collect()) == [1, 3, 5, 7, 9]


def test_upsert_partitioned_global_fallback_on_moved_keys(spark, tmp_path):
    """When the partition source is NOT a key column a key can move
    partitions; the upsert must fall back to a GLOBAL delete file or
    the old image resurrects — pinned with exactly that shape."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_upsert_moved")
    rows = spark.createDataFrame(
        [(1, "A", "old1"), (2, "B", "old2")], "k int, p string, v string"
    )
    write_iceberg(rows, path, "overwrite", partition_by=["p"],
                  format_version=2)
    # key 1 MOVES from partition A to partition B
    changes = spark.createDataFrame(
        [(1, "B", "moved1")], "k int, p string, v string"
    )
    res = ice.upsert_iceberg(spark, path, changes, ["k"])
    assert res["keys_retracted"] == 1
    got = sorted(
        (r["k"], r["p"], r["v"]) for r in read_iceberg(spark, path).collect()
    )
    assert got == [(1, "B", "moved1"), (2, "B", "old2")]
    # and the delete file is global (no partition scope)
    meta = ice._read_metadata(path)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    _f, _pd, eq_dels, _ds, _dp, _sp = ice._resolve_state(path, snap)
    assert eq_dels and all(scope is None for _, _, scope in eq_dels)


def test_upsert_partitioned_transform_spec(spark, tmp_path):
    """Partitioned upsert composes with TRANSFORM specs: bucket(4, k)
    with key k → scoped delete files whose tuples carry the murmur3
    bucket values."""
    from datalakecrawler_spark.sources import iceberg_native as ice
    from datalakecrawler_spark.sources.iceberg_native import _iceberg_bucket

    path = str(tmp_path / "ice_upsert_bucket")
    rows = spark.createDataFrame(
        [(k, f"v{k}") for k in range(8)], "k int, v string"
    )
    write_iceberg(rows, path, "overwrite", partition_by=["bucket(4, k)"],
                  format_version=2)
    changes = spark.createDataFrame([(3, "v3_new")], "k int, v string")
    res = ice.upsert_iceberg(spark, path, changes, ["k"])
    assert res["keys_retracted"] == 1
    got = {r["k"]: r["v"] for r in read_iceberg(spark, path).collect()}
    assert len(got) == 8 and got[3] == "v3_new" and got[5] == "v5"
    meta = ice._read_metadata(path)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    _f, _pd, eq_dels, _ds, _dp, _sp = ice._resolve_state(path, snap)
    import json as _json

    assert {
        _json.loads(s)["k_bucket"] for _, _, s in eq_dels if s
    } == {_iceberg_bucket(3, 4, "int")}


def test_v3_metadata_with_v2_shaped_content_scans(spark, tmp_path):
    """Format-v3 gate is on FEATURE USE, not version number (VERDICT
    r7 §8): a v3 table whose content is v2-shaped (parquet data +
    parquet deletes, no defaults, lineage fields ignorable) scans
    green; a v3 schema carrying a default value refuses loudly."""
    import json as _json

    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_v3")
    rows = spark.createDataFrame(
        [(k, f"v{k}") for k in range(6)], "k int, v string"
    )
    write_iceberg(rows, path, "overwrite", format_version=2)
    ice.add_equality_deletes(
        spark, path, spark.createDataFrame([(2,)], "k int")
    )
    # promote the metadata to v3 with row-lineage bookkeeping, content
    # untouched — what a v3 writer that never used DVs/defaults leaves
    meta_file = sorted(
        glob.glob(os.path.join(path, "metadata", "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )[-1]
    meta = _json.load(open(meta_file))
    meta["format-version"] = 3
    meta["next-row-id"] = 100
    for s in meta["snapshots"]:
        s["first-row-id"] = 0
    _json.dump(meta, open(meta_file, "w"))
    got = sorted(r["k"] for r in read_iceberg(spark, path).collect())
    assert got == [0, 1, 3, 4, 5]  # eq delete still applies
    # and a v3 DEFAULT VALUE is SERVED (r8): every file predates the
    # injected column, so all surviving rows read the default
    meta["schema"]["fields"].append(
        {"id": 99, "name": "d", "required": False, "type": "int",
         "initial-default": 7}
    )
    _json.dump(meta, open(meta_file, "w"))
    got_d = {r["d"] for r in read_iceberg(spark, path).collect()}
    assert got_d == {7}


def test_ddl_autocompose_on_live_equality_deletes(spark, tmp_path):
    """DROP/RENAME COLUMN handed a SparkSession auto-run
    compact_iceberg_deletes on live equality deletes and then commit;
    without a session the interlock still refuses with the recipe."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_ddl_auto")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(src, path, "overwrite", format_version=2)
    ice.add_equality_deletes(
        spark, path, spark.createDataFrame([(3,), (9,)], "n_nationkey int")
    )
    with pytest.raises(NotImplementedError, match="compact"):
        ice.drop_iceberg_column(path, "n_regionkey")  # no session
    ice.drop_iceberg_column(path, "n_regionkey", spark=spark)
    got = {r["n_nationkey"] for r in read_iceberg(spark, path).collect()}
    assert got == set(range(25)) - {3, 9}
    assert "n_regionkey" not in read_iceberg(spark, path).columns
    # rename path: fresh live eq delete, auto-composed the same way
    ice.add_equality_deletes(
        spark, path, spark.createDataFrame([(5,)], "n_nationkey int")
    )
    with pytest.raises(NotImplementedError, match="compact"):
        ice.rename_iceberg_column(path, "n_name", "nation_name")
    ice.rename_iceberg_column(path, "n_name", "nation_name", spark=spark)
    out = read_iceberg(spark, path)
    assert "nation_name" in out.columns
    assert {r["n_nationkey"] for r in out.collect()} == (
        set(range(25)) - {3, 9, 5}
    )


def test_roaring_portable64_roundtrip():
    """RoaringFormatSpec portable 64-bit framing: sparse high words,
    array AND bitset containers, >2^32 positions."""
    from datalakecrawler_spark.sources.roaring import (
        deserialize_portable64,
        serialize_portable64,
    )

    cases = [
        [],
        [0],
        [0, 1, 2, 65536, 1 << 20],
        list(range(5000)),  # bitset container
        [3, (1 << 32) + 7, (5 << 32) + 123456],  # sparse high keys
    ]
    for pos in cases:
        assert deserialize_portable64(serialize_portable64(pos)) == sorted(
            set(pos)
        ), pos


def test_v3_deletion_vectors_end_to_end(spark, tmp_path):
    """Format-v3 DELETE via Puffin deletion vectors: zero data files
    rewritten, scans apply blobs executor-side, sequential deletes
    merge (one DV per file, newest carries the union), re-deletes are
    no-ops, time travel serves the pre-delete snapshot, and the
    changelog diffs the DV snapshot row-level."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_v3_dv")
    src = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_iceberg(src.repartition(3), path, "overwrite", format_version=3)
    data_before = sorted(glob.glob(os.path.join(path, "data", "*.parquet")))
    res = ice.add_deletion_vectors(spark, path, "o_orderkey % 7 = 3")
    n_doomed = src.where("o_orderkey % 7 = 3").count()
    assert res["rows_deleted"] == n_doomed and res["files_touched"] >= 1
    assert sorted(glob.glob(os.path.join(path, "data", "*.parquet"))) == (
        data_before
    ), "DV delete must not rewrite data files"
    assert glob.glob(os.path.join(path, "data", "dv-*.puffin"))
    got = read_iceberg(spark, path)
    assert got.where("o_orderkey % 7 = 3").count() == 0
    assert got.count() == src.count() - n_doomed
    # puffin footers are self-describing (one part per writer task)
    blobs = [
        b
        for puf in glob.glob(os.path.join(path, "data", "dv-*.puffin"))
        for b in ice.read_puffin_blobs(puf)
    ]
    assert blobs and all(b["type"] == "deletion-vector-v1" for b in blobs)
    assert sum(
        int(b["properties"]["cardinality"]) for b in blobs
    ) == n_doomed
    # second delete merges with the existing DVs (union, no resurrect)
    res2 = ice.add_deletion_vectors(
        spark, path, "o_orderkey % 7 in (3, 5)"
    )
    n2 = src.where("o_orderkey % 7 = 5").count()
    assert res2["rows_deleted"] == n2  # %7=3 already dead → no-op
    got2 = read_iceberg(spark, path)
    assert got2.where("o_orderkey % 7 in (3, 5)").count() == 0
    assert got2.count() == src.count() - n_doomed - n2
    # time travel: the first snapshot still serves every row
    assert read_iceberg(spark, path, snapshot_id=1).count() == src.count()
    # changelog over the second DV snapshot = exactly the %7=5 rows
    ch = ice.read_iceberg_changelog(spark, path, from_snapshot=2)
    rows = ch.collect()
    assert all(r["_change_type"] == "delete" for r in rows)
    assert sorted(r["o_orderkey"] for r in rows) == sorted(
        r["o_orderkey"]
        for r in src.where("o_orderkey % 7 = 5").collect()
    )


def test_v3_dv_writer_never_collects_data_proportional_rows(spark, tmp_path):
    """Same writer-scale lint as the Delta DV path: add_deletion_vectors
    must only collect O(touched files) descriptor rows, never the
    matched positions."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame

    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_v3_dv_scale")
    src = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    write_iceberg(src.repartition(4), path, "overwrite", format_version=3)
    n_files = len(glob.glob(os.path.join(path, "data", "*.parquet")))
    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    DataFrame.collect = spy
    try:
        res = ice.add_deletion_vectors(spark, path, "o_orderstatus = 'O'")
    finally:
        DataFrame.collect = orig
    assert res["rows_deleted"] > 100 * n_files
    assert sizes and max(sizes) <= n_files, sizes


# ------------------------------------------------- v3 default values (r8)


def test_column_default_serves_old_files_and_stored_rows(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "defaults")
    ice.write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        p, "overwrite", format_version=3,
    )
    import glob as g
    import os as o

    before = sorted(g.glob(o.path.join(p, "data", "*.parquet")))
    ice.add_iceberg_column(p, "score", "long", initial_default=42)
    assert sorted(g.glob(o.path.join(p, "data", "*.parquet"))) == before
    ice.write_iceberg(
        spark.createDataFrame(
            [(3, "c", 7), (4, "d", None)], "id long, s string, score long"
        ),
        p, "append", format_version=3,
    )
    rows = {
        r["id"]: r["score"]
        for r in ice.read_iceberg(spark, p).collect()
    }
    # pre-ADD files serve the default; post-ADD rows read AS STORED —
    # including the explicit NULL
    assert rows == {1: 42, 2: 42, 3: 7, 4: None}


def test_column_default_composes_with_v3_deletion_vectors(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "defaults_dv")
    ice.write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        p, "overwrite", format_version=3,
    )
    ice.add_iceberg_column(p, "score", "long", initial_default=9)
    ice.add_deletion_vectors(spark, p, "id = 2")
    got = sorted(
        tuple(r) for r in ice.read_iceberg(spark, p).collect()
    )
    assert got == [(1, "a", 9)]


def test_column_default_typed_forms(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "defaults_typed")
    ice.write_iceberg(
        spark.createDataFrame([(1,)], "id long"), p, "overwrite",
        format_version=3,
    )
    ice.add_iceberg_column(p, "d0", "date", initial_default="2023-06-01")
    ice.add_iceberg_column(p, "f0", "double", initial_default=1.5)
    ice.add_iceberg_column(p, "b0", "boolean", initial_default=True)
    r = ice.read_iceberg(spark, p).collect()[0]
    assert str(r["d0"]) == "2023-06-01" and r["f0"] == 1.5 and r["b0"] is True


def test_column_default_refuses_on_v2(spark, tmp_path):
    import pytest as _pytest

    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "defaults_v2")
    ice.write_iceberg(
        spark.createDataFrame([(1,)], "id long"), p, "overwrite",
        format_version=2,
    )
    with _pytest.raises(ValueError, match="format-v3"):
        ice.add_iceberg_column(p, "x", "long", initial_default=1)


def test_nested_struct_member_defaults_served(spark, tmp_path):
    """Struct-path defaults are SERVED since r9 (VERDICT r8 #3):
    adding a member with initial-default to an existing struct column
    is metadata-only; pre-ADD files read the default through the
    struct path, post-ADD rows read AS STORED (explicit NULLs
    included), and a NULL struct stays NULL — its members do not
    exist, so no default applies."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "defaults_nested")
    df1 = spark.createDataFrame(
        [(1, (10, "a")), (2, (20, "b"))],
        "id long, st struct<a:long,b:string>",
    )
    ice.write_iceberg(df1, p, "overwrite", format_version=3)
    data_before = sorted(glob.glob(os.path.join(p, "data", "*.parquet")))
    ice.add_iceberg_column(p, "st.c", "long", initial_default=5)
    assert sorted(glob.glob(os.path.join(p, "data", "*.parquet"))) == (
        data_before
    ), "nested ADD with default must be metadata-only"
    got = {
        r["id"]: (r["st"]["a"], r["st"]["c"])
        for r in ice.read_iceberg(spark, p).collect()
    }
    assert got == {1: (10, 5), 2: (20, 5)}
    # a member existing in the files reads AS STORED, never defaulted
    df2 = spark.createDataFrame(
        [(3, (30, "c", 99)), (4, (40, "d", None)), (5, None)],
        "id long, st struct<a:long,b:string,c:long>",
    )
    ice.write_iceberg(df2, p, "append", format_version=3)
    got2 = {
        r["id"]: (None if r["st"] is None else r["st"]["c"])
        for r in ice.read_iceberg(spark, p).collect()
    }
    assert got2 == {1: 5, 2: 5, 3: 99, 4: None, 5: None}
    # gates: path through a non-struct refuses; duplicate refuses
    with pytest.raises(ValueError, match="not a struct"):
        ice.add_iceberg_column(p, "id.x", "long")
    with pytest.raises(ValueError, match="already exists"):
        ice.add_iceberg_column(p, "st.c", "long")


def test_nested_default_depth_two(spark, tmp_path):
    """Defaults project through multiple struct levels."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "defaults_depth2")
    df1 = spark.createDataFrame(
        [(1, ((7,),)), (2, ((8,),))],
        "id long, outer struct<inner:struct<x:long>>",
    )
    ice.write_iceberg(df1, p, "overwrite", format_version=3)
    ice.add_iceberg_column(p, "outer.inner.y", "string",
                           initial_default="dflt")
    got = {
        r["id"]: (r["outer"]["inner"]["x"], r["outer"]["inner"]["y"])
        for r in ice.read_iceberg(spark, p).collect()
    }
    assert got == {1: (7, "dflt"), 2: (8, "dflt")}


# ----------------------------------------------------- type widening (r8)


def test_iceberg_widen_int_to_long(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "widen")
    ice.write_iceberg(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, qty int"),
        p, "overwrite", format_version=2,
    )
    v = ice.widen_iceberg_column(p, "qty", "long")
    assert v >= 2
    ice.write_iceberg(
        spark.createDataFrame([(3, 2**40)], "id long, qty long"),
        p, "append", format_version=2,
    )
    out = ice.read_iceberg(spark, p)
    from pyspark.sql import types as T

    assert isinstance(out.schema["qty"].dataType, T.LongType)
    assert sorted(r["qty"] for r in out.collect()) == [10, 20, 2**40]


def test_iceberg_widen_refusals(spark, tmp_path):
    import pytest as _pytest

    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "widen_bad")
    ice.write_iceberg(
        spark.createDataFrame([(1, 10, 1.5)], "id long, qty int, f float"),
        p, "overwrite", format_version=2,
    )
    with _pytest.raises(ValueError, match="not a spec type promotion"):
        ice.widen_iceberg_column(p, "id", "int")  # narrowing
    with _pytest.raises(ValueError, match="not a spec type promotion"):
        ice.widen_iceberg_column(p, "qty", "double")  # not in the spec set
    with _pytest.raises(ValueError, match="no column"):
        ice.widen_iceberg_column(p, "nope", "long")
    ice.widen_iceberg_column(p, "f", "double")  # float→double allowed
    out = ice.read_iceberg(spark, p).collect()[0]
    assert out["f"] == 1.5


def test_iceberg_widen_decimal_same_scale_only(spark, tmp_path):
    import pytest as _pytest

    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "widen_dec")
    ice.write_iceberg(
        spark.sql("select cast(1.25 as decimal(5,2)) as d"),
        p, "overwrite", format_version=2,
    )
    with _pytest.raises(ValueError, match="not a spec type promotion"):
        ice.widen_iceberg_column(p, "d", "decimal(10,4)")  # scale change
    ice.widen_iceberg_column(p, "d", "decimal(10,2)")
    out = ice.read_iceberg(spark, p)
    from pyspark.sql import types as T

    assert out.schema["d"].dataType == T.DecimalType(10, 2)
    assert float(out.collect()[0]["d"]) == 1.25


def test_iceberg_widen_autocompacts_equality_deletes(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "widen_eq")
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id long, qty int"
    )
    ice.write_iceberg(df, p, "overwrite", format_version=2)
    ice.add_equality_deletes(
        spark, p, spark.createDataFrame([(2,)], "id long")
    )
    ice.widen_iceberg_column(p, "qty", "long", spark=spark)
    meta = ice._read_metadata(p)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    assert not ice._resolve_state(p, snap)[2], (
        "widen must have compacted the live equality deletes"
    )
    assert sorted(
        r["id"] for r in ice.read_iceberg(spark, p).collect()
    ) == [1, 3]


# ------------------------------------------------------ row lineage (r8)


def test_row_lineage_ids_and_seq(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "lineage")
    d1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, s string"
    ).repartition(1).sortWithinPartitions("id")
    ice.write_iceberg(d1, p, "overwrite", format_version=3)
    d2 = spark.createDataFrame(
        [(4, "d"), (5, "e")], "id long, s string"
    ).repartition(1).sortWithinPartitions("id")
    ice.write_iceberg(d2, p, "append", format_version=3)
    meta = ice._read_metadata(p)
    assert meta["next-row-id"] == 5
    snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])
    assert [s["first-row-id"] for s in snaps] == [0, 3]
    out = ice.read_iceberg(spark, p, row_lineage=True)
    got = sorted(
        (r["id"], r["_row_id"], r["_last_updated_sequence_number"])
        for r in out.collect()
    )
    assert got == [(1, 0, 1), (2, 1, 1), (3, 2, 1), (4, 3, 2), (5, 4, 2)]


def test_row_lineage_stable_across_dv_delete(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "lineage_dv")
    d1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, s string"
    ).repartition(1).sortWithinPartitions("id")
    ice.write_iceberg(d1, p, "overwrite", format_version=3)
    ice.add_deletion_vectors(spark, p, "id = 2")
    out = ice.read_iceberg(spark, p, row_lineage=True)
    got = sorted((r["id"], r["_row_id"]) for r in out.collect())
    # survivors KEEP their original row ids — lineage, not renumbering
    assert got == [(1, 0), (3, 2)]


def test_row_lineage_refuses_v2(spark, tmp_path):
    import pytest as _pytest

    from datalakecrawler_spark.sources import iceberg_native as ice

    p = str(tmp_path / "lineage_v2")
    ice.write_iceberg(
        spark.createDataFrame([(1,)], "id long"), p, "overwrite",
        format_version=2,
    )
    with _pytest.raises(ValueError, match="format-v3"):
        ice.read_iceberg(spark, p, row_lineage=True)


# ---------------------------------------------- r9: spec-source DDL


def test_rename_partition_source_column_metadata_only(spark, tmp_path):
    """Renaming the column an IDENTITY partition spec derives from is
    metadata-only (VERDICT r8 top_next): the spec field name — which
    the hive dirs and r102 record keys carry — stays frozen; only the
    schema field renames (source-id pairing unchanged). Scans project
    dir name → schema name, partition pruning answers to the NEW
    name, and appends stated on the new name stage their dirs under
    the frozen spec name so old and new manifests stay uniform."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_rename_specsrc")
    src = load(spark, SF_DIR, "nation")
    write_iceberg(
        src.where("n_nationkey < 15"), path, "overwrite",
        partition_by=["n_regionkey"], format_version=2,
    )
    data_before = sorted(
        glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                  recursive=True)
    )
    ice.rename_iceberg_column(path, "n_regionkey", "rk")
    assert sorted(
        glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                  recursive=True)
    ) == data_before, "rename must not rewrite data files"
    out = read_iceberg(spark, path)
    assert "rk" in out.columns and "n_regionkey" not in out.columns
    got = {r["n_nationkey"]: r["rk"] for r in out.collect()}
    want = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in src.where("n_nationkey < 15").collect()
    }
    assert got == want
    # partition pruning by the NEW name
    pruned = read_iceberg(spark, path, partition_filter={"rk": 2})
    assert sorted(r["n_nationkey"] for r in pruned.collect()) == sorted(
        k for k, v in want.items() if v == 2
    )
    with pytest.raises(ValueError, match="non-source"):
        read_iceberg(spark, path, partition_filter={"n_regionkey": 2})
    # append AFTER the rename, stated on the new name
    write_iceberg(
        src.where("n_nationkey >= 15").withColumnRenamed(
            "n_regionkey", "rk"
        ),
        path, "append", partition_by=["rk"], format_version=2,
    )
    full = {r["n_nationkey"]: r["rk"] for r in
            read_iceberg(spark, path).collect()}
    assert sorted(full) == list(range(25))
    # the appended files landed under the FROZEN spec-name dirs
    assert not glob.glob(os.path.join(path, "data", "rk=*")), (
        "dirs must stay uniform under the frozen spec field name"
    )
    # pruning spans pre- and post-rename manifests
    pruned2 = read_iceberg(spark, path, partition_filter={"rk": 2})
    assert sorted(r["n_nationkey"] for r in pruned2.collect()) == sorted(
        r["n_nationkey"] for r in src.where("n_regionkey = 2").collect()
    )


def test_widen_partition_source_column_metadata_only(spark, tmp_path):
    """int→long on an identity partition source is metadata-only:
    dir strings parse natively under the wide type, pre-widen 4-byte
    summary bounds decode width-aware, and appends under the wide
    type interleave with pruning across both generations."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_widen_specsrc")
    rows = spark.createDataFrame(
        [(k, k % 3, f"v{k}") for k in range(12)], "k int, p int, v string"
    )
    write_iceberg(rows, path, "overwrite", partition_by=["p"],
                  format_version=2)
    data_before = sorted(
        glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                  recursive=True)
    )
    ice.widen_iceberg_column(path, "p", "long")
    assert sorted(
        glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                  recursive=True)
    ) == data_before
    out = read_iceberg(spark, path)
    assert dict(out.dtypes)["p"] == "bigint"
    assert sorted((r["k"], r["p"]) for r in out.collect()) == [
        (k, k % 3) for k in range(12)
    ]
    # pruned read decodes the pre-widen int bounds width-aware
    pruned = read_iceberg(spark, path, partition_filter={"p": 1})
    assert sorted(r["k"] for r in pruned.collect()) == [1, 4, 7, 10]
    # append under the wide type; pruning spans int and long manifests
    more = spark.createDataFrame(
        [(k, k % 3, f"v{k}") for k in range(12, 18)],
        "k int, p long, v string",
    )
    write_iceberg(more, path, "append", partition_by=["p"],
                  format_version=2)
    pruned2 = read_iceberg(spark, path, partition_filter={"p": 1})
    assert sorted(r["k"] for r in pruned2.collect()) == [
        1, 4, 7, 10, 13, 16
    ]


def test_widen_bucket_spec_source_column(spark, tmp_path):
    """int→long under a BUCKET spec: the spec hashes int and long
    identically (8-byte LE) — which is exactly why the promotion is
    legal; bucket pruning still serves the right rows after."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    path = str(tmp_path / "ice_widen_bucket")
    rows = spark.createDataFrame(
        [(k, f"v{k}") for k in range(20)], "k int, v string"
    )
    write_iceberg(rows, path, "overwrite", partition_by=["bucket(4, k)"],
                  format_version=2)
    ice.widen_iceberg_column(path, "k", "long")
    out = read_iceberg(spark, path)
    assert dict(out.dtypes)["k"] == "bigint"
    pruned = read_iceberg(spark, path, partition_filter={"k": 7})
    assert 7 in {r["k"] for r in pruned.collect()}
    assert pruned.count() < 20  # actually pruned to one bucket


# ------------------------------------------- r9: non-parquet data files


def test_import_avro_datafiles_mixed_scan(spark, tmp_path):
    """import_iceberg_datafiles registers existing Avro containers as
    one O(files) metadata commit; the scan unions the parquet epoch
    (id-resolved) with the Avro epoch (native container decode) under
    the committed schema. Row counts come from block headers."""
    from datalakecrawler_spark.sources import iceberg_native as ice
    from datalakecrawler_spark.sources.avro import write_avro

    src = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "ice_avro_mix")
    av = str(tmp_path / "avro_files")
    write_iceberg(src.where("n_nationkey < 10"), p, "overwrite",
                  format_version=2)
    write_avro(src.where("n_nationkey >= 10").repartition(2), av).collect()
    files = sorted(glob.glob(os.path.join(av, "*.avro")))
    assert len(files) >= 1
    ice.import_iceberg_datafiles(spark, p, files, "avro")
    got = sorted(
        (r["n_nationkey"], r["n_name"])
        for r in read_iceberg(spark, p).collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["n_name"]) for r in src.collect()
    )
    # zero copies: no new parquet, the avro bytes stay where they were
    assert sorted(glob.glob(os.path.join(av, "*.avro"))) == files
    # time travel: the parquet-only snapshot still serves
    assert read_iceberg(spark, p, snapshot_id=1).count() == 10
    # row-level deletes on a mixed-format snapshot refuse loudly
    with pytest.raises(NotImplementedError, match="ORC/AVRO"):
        ice.add_position_deletes(spark, p, "n_nationkey = 3")


def test_import_orc_datafiles_and_parquet_append(spark, tmp_path):
    """ORC files import into a NEW table (schema inferred via Spark's
    ORC reader); a later parquet append through the normal writer
    interleaves — one scan serves both formats."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "ice_orc_new")
    od = str(tmp_path / "orc_files")
    src.where("n_nationkey < 15").repartition(2).write.orc(od)
    ofiles = sorted(glob.glob(os.path.join(od, "*.orc")))
    ice.import_iceberg_datafiles(spark, p, ofiles, "orc")
    assert read_iceberg(spark, p).count() == 15
    write_iceberg(src.where("n_nationkey >= 15"), p, "append",
                  format_version=2)
    got = sorted(r["n_nationkey"] for r in read_iceberg(spark, p).collect())
    assert got == list(range(25))


def test_import_parquet_records_name_mapping(spark, tmp_path):
    """Foreign parquet (no footer field ids) imports with the spec's
    identity name mapping so the id-resolved read doesn't null every
    column; appending foreign parquet into an id-resolved table
    refuses with the recipe."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    pdir = str(tmp_path / "pq_files")
    src.repartition(2).write.parquet(pdir)
    pfiles = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    p = str(tmp_path / "ice_pq_imp")
    ice.import_iceberg_datafiles(spark, p, pfiles, "parquet")
    out = read_iceberg(spark, p)
    assert out.where("n_name is not null").count() == 25
    meta = ice._read_metadata(p)
    assert "schema.name-mapping.default" in meta["properties"]
    # an id-resolved table (written by write_iceberg) refuses foreign
    # parquet imports
    p2 = str(tmp_path / "ice_idtable")
    write_iceberg(src, p2, "overwrite", format_version=2)
    with pytest.raises(NotImplementedError, match="name-mapping"):
        ice.import_iceberg_datafiles(spark, p2, pfiles, "parquet")


def test_import_gates(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "ice_part_imp")
    write_iceberg(src, p, "overwrite", partition_by=["n_regionkey"],
                  format_version=2)
    od = str(tmp_path / "orc_g")
    src.write.orc(od)
    ofiles = sorted(glob.glob(os.path.join(od, "*.orc")))
    with pytest.raises(NotImplementedError, match="PARTITIONED"):
        ice.import_iceberg_datafiles(spark, p, ofiles, "orc")
    with pytest.raises(ValueError, match="file_format"):
        ice.import_iceberg_datafiles(spark, str(tmp_path / "x"), ofiles, "csv")


# ------------------------------------------ r9: partition-spec evolution


def test_partition_spec_evolution_unpartitioned_to_identity(
    spark, tmp_path
):
    """The canonic Iceberg evolution story: start unpartitioned, add
    a partition field later — metadata-only, zero files rewritten.
    Old files keep the column as ordinary data; new files identity-
    exclude it; one scan serves both via the r102 record overlay, and
    a filtered read is exact across epochs (file pruning on new
    manifests, row predicate over old mixed files)."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "evolve1")
    write_iceberg(src.where("n_nationkey < 12"), p, "overwrite",
                  format_version=2)
    data_before = sorted(
        glob.glob(os.path.join(p, "data", "**", "*.parquet"),
                  recursive=True)
    )
    sid = ice.evolve_iceberg_partition_spec(p, ["n_regionkey"])
    assert sid == 1
    assert sorted(
        glob.glob(os.path.join(p, "data", "**", "*.parquet"),
                  recursive=True)
    ) == data_before, "evolution must not rewrite data files"
    write_iceberg(src.where("n_nationkey >= 12"), p, "append",
                  partition_by=["n_regionkey"], format_version=2)
    got = sorted(
        (r["n_nationkey"], r["n_regionkey"])
        for r in read_iceberg(spark, p).collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["n_regionkey"]) for r in src.collect()
    )
    pr = read_iceberg(spark, p, partition_filter={"n_regionkey": 2})
    assert sorted(r["n_nationkey"] for r in pr.collect()) == sorted(
        r["n_nationkey"] for r in src.where("n_regionkey = 2").collect()
    )
    # appends must state the NEW default spec
    with pytest.raises(ValueError, match="spec is fixed"):
        write_iceberg(src.limit(1), p, "append", format_version=2)
    # re-declaring the same spec refuses
    with pytest.raises(ValueError, match="already matches"):
        ice.evolve_iceberg_partition_spec(p, ["n_regionkey"])


def test_partition_spec_evolution_change_identity_column(spark, tmp_path):
    """Identity column A → identity column B: both columns are served
    for every row (stored where ordinary, record-overlaid where
    identity-excluded) and filters on either — or both — stay exact."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    p = str(tmp_path / "evolve2")
    write_iceberg(src.where("o_orderkey % 2 = 0"), p, "overwrite",
                  partition_by=["o_orderstatus"], format_version=2)
    ice.evolve_iceberg_partition_spec(p, ["o_orderpriority"])
    write_iceberg(src.where("o_orderkey % 2 = 1"), p, "append",
                  partition_by=["o_orderpriority"], format_version=2)
    out = read_iceberg(spark, p)
    assert out.count() == src.count()
    assert out.where(
        "o_orderstatus is null or o_orderpriority is null"
    ).count() == 0
    for flt, cond in [
        ({"o_orderstatus": "F"}, "o_orderstatus = 'F'"),
        ({"o_orderpriority": "2-HIGH"}, "o_orderpriority = '2-HIGH'"),
        (
            {"o_orderstatus": "F", "o_orderpriority": "2-HIGH"},
            "o_orderstatus = 'F' and o_orderpriority = '2-HIGH'",
        ),
    ]:
        assert (
            read_iceberg(spark, p, partition_filter=flt).count()
            == src.where(cond).count()
        ), flt
    # spec field-id reuse: evolving BACK to o_orderstatus reuses its id
    sid3 = ice.evolve_iceberg_partition_spec(p, ["o_orderstatus"])
    meta = ice._read_metadata(p)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    assert specs[0]["fields"][0]["field-id"] == (
        specs[sid3]["fields"][0]["field-id"]
    )


def test_partition_spec_evolution_gates(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "evolve_g")
    write_iceberg(src.where("n_nationkey < 5"), p, "overwrite",
                  format_version=2)
    ice.evolve_iceberg_partition_spec(p, ["n_regionkey"])
    write_iceberg(src.where("n_nationkey >= 5"), p, "append",
                  partition_by=["n_regionkey"], format_version=2)
    # row-level deletes on evolved tables refuse loudly
    with pytest.raises(NotImplementedError, match="EVOLVED"):
        ice.add_position_deletes(spark, p, "n_nationkey = 3")
    # transform filters on evolved tables refuse loudly
    with pytest.raises(NotImplementedError, match="identity"):
        read_iceberg(spark, p, partition_filter={"n_name": "x"})


def test_evolve_then_drop_former_partition_source(spark, tmp_path):
    """The complete DROP-partition-column story (r9): evolve the spec
    away from the column, then drop it metadata-only — old manifests
    keep their spec, their identity records for the dropped column
    stop being projected, rows stay complete. While the column still
    sources the DEFAULT spec, the drop refuses with the recipe."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "evolve_drop")
    write_iceberg(src, p, "overwrite", partition_by=["n_regionkey"],
                  format_version=2)
    with pytest.raises(NotImplementedError, match="evolve the"):
        ice.drop_iceberg_column(p, "n_regionkey")
    ice.evolve_iceberg_partition_spec(p, [])  # unpartition going forward
    write_iceberg(
        src.withColumn("n_nationkey", F.col("n_nationkey") + 100),
        p, "append", format_version=2,
    )
    ice.drop_iceberg_column(p, "n_regionkey")
    out = read_iceberg(spark, p)
    assert "n_regionkey" not in out.columns
    assert out.count() == 50
    assert out.where("n_name is null").count() == 0


# ------------------------------------- r9: sort orders + stats pruning


def test_sort_order_clusters_files_and_records_metadata(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    p = str(tmp_path / "ice_sorted")
    write_iceberg(src.repartition(4), p, "overwrite", format_version=2,
                  sort_by=["o_orderkey"])
    meta = ice._read_metadata(p)
    assert meta["default-sort-order-id"] == 1
    assert meta["sort-orders"][1]["fields"][0]["direction"] == "asc"
    # range clustering: per-file key ranges are disjoint
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    mf = ice._decode_avro_records(ice._resolve(p, snap["manifest-list"]))[0]
    ents = ice._decode_avro_records(ice._resolve(p, mf["manifest_path"]))
    fid = {f["name"]: f["id"] for f in meta["schema"]["fields"]}["o_orderkey"]
    ranges = sorted(
        (
            ice._stats_deser(
                {e["key"]: e["value"] for e in d["lower_bounds"]}[fid],
                "long",
            ),
            ice._stats_deser(
                {e["key"]: e["value"] for e in d["upper_bounds"]}[fid],
                "long",
            ),
        )
        for d in (e["data_file"] for e in ents)
    )
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2, ranges
    # an identical later sort order is reused, not re-appended
    write_iceberg(src.limit(0), p, "append", format_version=2,
                  sort_by=["o_orderkey"])
    meta2 = ice._read_metadata(p)
    assert len(meta2["sort-orders"]) == 2
    assert meta2["default-sort-order-id"] == 1


def test_stats_filter_prunes_files_exactly(spark, tmp_path):
    """stats_filter skips data files whose bounds prove no match at
    scan PLANNING; surviving rows still pass through the exact
    predicate, so results equal a full scan + filter."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    p = str(tmp_path / "ice_stats")
    write_iceberg(src.repartition(6), p, "overwrite", format_version=2,
                  sort_by=["o_orderkey"])
    meta = ice._read_metadata(p)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    fid = {f["name"]: f["id"] for f in meta["schema"]["fields"]}["o_orderkey"]
    full = ice._resolve_state(p, snap)[0]
    lo, hi = 50, 300
    pruned = ice._resolve_state(
        p, snap, stats_prune={fid: (lo, hi, "long")}
    )[0]
    assert 0 < len(pruned) < len(full)
    out = ice.read_iceberg(spark, p, stats_filter={"o_orderkey": (lo, hi)})
    want = sorted(
        r["o_orderkey"]
        for r in src.where(f"o_orderkey between {lo} and {hi}").collect()
    )
    assert sorted(r["o_orderkey"] for r in out.collect()) == want
    # one-sided ranges
    n_hi = ice.read_iceberg(
        spark, p, stats_filter={"o_orderkey": (None, 100)}
    ).count()
    assert n_hi == src.where("o_orderkey <= 100").count()
    # string bounds work too
    n_f = ice.read_iceberg(
        spark, p, stats_filter={"o_orderstatus": ("F", "F")}
    ).count()
    assert n_f == src.where("o_orderstatus = 'F'").count()
    # unknown / unsupported columns refuse
    with pytest.raises(ValueError, match="unknown column"):
        ice.read_iceberg(spark, p, stats_filter={"nope": (1, 2)})


# ----------------------------------------- r9: data-file compaction


def test_binpack_compaction_one_file_per_partition(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p = str(tmp_path / "bp")
    for i, cond in enumerate(
        ["n_nationkey < 8", "n_nationkey between 8 and 16",
         "n_nationkey > 16"]
    ):
        write_iceberg(
            src.where(cond), p, "overwrite" if i == 0 else "append",
            partition_by=["n_regionkey"], format_version=2,
        )
    res = ice.compact_iceberg_data_files(spark, p)
    assert res["mode"] == "binpack"
    assert res["output_files"] == res["compacted_partitions"] == 5
    got = sorted(
        (r["n_nationkey"], r["n_regionkey"])
        for r in read_iceberg(spark, p).collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["n_regionkey"]) for r in src.collect()
    )
    # pruning + time travel survive; idempotent rerun is a no-op
    assert read_iceberg(
        spark, p, partition_filter={"n_regionkey": 2}
    ).count() == src.where("n_regionkey = 2").count()
    assert read_iceberg(spark, p, snapshot_id=1).count() == 8
    assert ice.compact_iceberg_data_files(spark, p)["rewritten_files"] == 0


def test_compaction_rewrite_applies_deletes(spark, tmp_path):
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    p = str(tmp_path / "rw")
    write_iceberg(src.repartition(4), p, "overwrite", format_version=2)
    ice.add_position_deletes(spark, p, "o_orderkey % 7 = 2")
    res = ice.compact_iceberg_data_files(spark, p)
    assert res["mode"] == "rewrite" and res["deletes_applied"] == 1
    want = src.where("o_orderkey % 7 <> 2").count()
    assert read_iceberg(spark, p).count() == want
    meta = ice._read_metadata(p)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    st = ice._resolve_state(p, snap)
    assert not st[1] and not st[2], "deletes must be applied and dropped"


def test_materialize_consolidates_evolved_table(spark, tmp_path):
    """materialize_iceberg_table is the consolidation remedy the
    evolved-table gates name: the destination is a plain single-spec
    table on which every gated op (row-level deletes, in-place
    compaction) is available again."""
    from datalakecrawler_spark.sources import iceberg_native as ice

    src = load(spark, SF_DIR, "nation")
    p, d = str(tmp_path / "evm"), str(tmp_path / "evm_dst")
    write_iceberg(src.where("n_nationkey < 12"), p, "overwrite",
                  format_version=2)
    ice.evolve_iceberg_partition_spec(p, ["n_regionkey"])
    write_iceberg(src.where("n_nationkey >= 12"), p, "append",
                  partition_by=["n_regionkey"], format_version=2)
    with pytest.raises(NotImplementedError, match="materialize"):
        ice.compact_iceberg_data_files(spark, p)
    res = ice.materialize_iceberg_table(spark, p, d)
    assert res["rows"] == 25 and res["partition_by"] == ["n_regionkey"]
    got = sorted(
        (r["n_nationkey"], r["n_regionkey"])
        for r in read_iceberg(spark, d).collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["n_regionkey"]) for r in src.collect()
    )
    ice.add_position_deletes(spark, d, "n_nationkey = 3")
    assert read_iceberg(spark, d).count() == 24
    # source untouched
    assert read_iceberg(spark, p).count() == 25
