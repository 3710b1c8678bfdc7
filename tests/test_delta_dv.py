"""Deletion-vector (reader v3) and column-mapping (reader v2) tests
for sources/delta_native.py, plus the roaring codec: DELETE without a
file rewrite, DV sequencing across commits, checkpoint carry-through,
OPTIMIZE purge, MERGE on DV tables, VACUUM sidecar retention, CDF
row-level derivation from DV commits, and metadata-only renames."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.sources import delta_native as dn
from tests.conftest import SF_DIR


def _data_files(path):
    return sorted(
        os.path.relpath(f, path)
        for f in glob.glob(os.path.join(path, "part-*.parquet"))
    )


def _keys(spark, path, col="n_nationkey", **kw):
    return sorted(
        r[0] for r in dn.read_delta(spark, path, **kw).select(col).collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "dv_tbl")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.repartition(3), path, "overwrite")
    return path, src


def test_delete_marks_rows_without_rewriting_files(spark, table):
    path, src = table
    before = _data_files(path)
    res = dn.delete_delta(spark, path, "n_nationkey in (2, 7, 11)")
    assert res["rows_deleted"] == 3 and res["version"] == 1
    # zero data files rewritten — only a DV sidecar appeared
    assert _data_files(path) == before
    assert glob.glob(os.path.join(path, "deletion_vector_*.bin"))
    assert _keys(spark, path) == sorted(set(range(25)) - {2, 7, 11})
    # time travel to pre-delete still serves all rows
    assert _keys(spark, path, version=0) == list(range(25))
    # protocol upgraded to v3 + deletionVectors in the commit
    acts = []
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json")) as fh:
        acts = [json.loads(l) for l in fh if l.strip()]
    prot = [a["protocol"] for a in acts if "protocol" in a][0]
    assert prot["minReaderVersion"] == 3
    assert "deletionVectors" in prot["readerFeatures"]
    # add actions carry spec-shaped descriptors
    dvs = [a["add"]["deletionVector"] for a in acts if "add" in a]
    assert dvs and all(
        d["storageType"] == "u" and d["cardinality"] >= 1 for d in dvs
    )


def test_second_delete_unions_bitmaps(spark, table):
    path, _ = table
    dn.delete_delta(spark, path, "n_nationkey in (2, 7)")
    res = dn.delete_delta(spark, path, "n_nationkey in (7, 9)")
    # 7 is already deleted: the DV-aware matching scan never sees it
    assert res["rows_deleted"] == 1
    assert _keys(spark, path) == sorted(set(range(25)) - {2, 7, 9})
    # no-op delete commits nothing
    res2 = dn.delete_delta(spark, path, "n_nationkey = 2")
    assert res2["rows_deleted"] == 0
    assert res2["version"] == res["version"]


def test_fully_deleted_file_drops_to_bare_remove(spark, tmp_path):
    path = str(tmp_path / "dv_dead")
    spark_df = load(spark, SF_DIR, "nation")
    dn.write_delta(spark_df.where("n_nationkey < 5").coalesce(1), path, "overwrite")
    dn.write_delta(spark_df.where("n_nationkey >= 5").coalesce(1), path, "append")
    res = dn.delete_delta(spark, path, "n_nationkey < 5")
    assert res["files_removed_entirely"] == 1
    active, *_ = dn._replay_full(path, None)
    assert len(active) == 1
    assert not any(a.get("deletionVector") for a in active.values())
    assert _keys(spark, path) == list(range(5, 25))


def test_checkpoint_preserves_dvs_and_protocol(spark, table):
    path, _ = table
    dn.delete_delta(spark, path, "n_nationkey in (0, 24)")
    dn.checkpoint_delta(path)
    # replay now starts from the checkpoint: DVs and protocol survive
    (
        active,
        _s,
        _v,
        _p,
        _conf,
        protocol,
    ) = dn._replay_full(path, None)
    assert protocol["minReaderVersion"] == 3
    assert any(a.get("deletionVector") for a in active.values())
    assert _keys(spark, path) == list(range(1, 24))


def test_optimize_purges_dvs(spark, table):
    path, _ = table
    dn.delete_delta(spark, path, "n_nationkey in (3, 4)")
    res = dn.optimize_delta(spark, path)
    assert res["files_compacted"] >= 1
    active, *_ = dn._replay_full(path, None)
    assert not any(a.get("deletionVector") for a in active.values())
    assert _keys(spark, path) == sorted(set(range(25)) - {3, 4})


def test_merge_on_dv_table_sees_only_live_rows(spark, table):
    path, _ = table
    dn.delete_delta(spark, path, "n_nationkey = 5")
    # upsert key 5 (dead) and key 6 (live): 5 inserts, 6 updates
    changes = spark.createDataFrame(
        [(5, "REBORN", 0), (6, "CHANGED", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    dn.merge_delta(spark, path, changes, "n_nationkey")
    got = {
        r["n_nationkey"]: r["n_name"]
        for r in dn.read_delta(spark, path).collect()
    }
    assert got[5] == "REBORN" and got[6] == "CHANGED"
    assert len(got) == 25


def test_vacuum_retains_then_reclaims_dv_sidecars(spark, table):
    path, _ = table
    dn.delete_delta(spark, path, "n_nationkey = 1")
    sidecars = glob.glob(os.path.join(path, "deletion_vector_*.bin"))
    assert len(sidecars) == 1
    # DV still referenced by the head: vacuum must keep it
    dn.vacuum_delta(path, retain_last=1)
    assert os.path.exists(sidecars[0])
    # after OPTIMIZE purges the DV, vacuum reclaims the sidecar
    dn.optimize_delta(spark, path)
    dn.vacuum_delta(path, retain_last=1)
    assert not os.path.exists(sidecars[0])
    assert _keys(spark, path) == sorted(set(range(25)) - {1})


def test_cdf_serves_dv_deletes_row_level(spark, table):
    path, _ = table
    dn.delete_delta(spark, path, "n_nationkey in (2, 7)")  # v1
    dn.delete_delta(spark, path, "n_nationkey = 9")  # v2
    ch = dn.read_delta_changes(spark, path, from_version=0)
    rows = [
        (r["n_nationkey"], r["_change_type"], r["_commit_version"])
        for r in ch.collect()
    ]
    assert sorted(rows) == [
        (2, "delete", 1),
        (7, "delete", 1),
        (9, "delete", 2),
    ]


def test_cdf_across_optimize_and_full_file_dv_remove(spark, tmp_path):
    path = str(tmp_path / "dv_cdf2")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.where("n_nationkey < 6").coalesce(1), path, "overwrite")
    dn.delete_delta(spark, path, "n_nationkey = 0")  # v1: DV delete
    dn.optimize_delta(spark, path)  # v2: dataChange=false, invisible
    dn.delete_delta(spark, path, "n_nationkey >= 1")  # v3: kills the file
    ch = dn.read_delta_changes(spark, path, from_version=0)
    rows = sorted(
        (r["n_nationkey"], r["_change_type"], r["_commit_version"])
        for r in ch.collect()
    )
    # v1 deletes row 0; v2 contributes NOTHING; v3 deletes the five
    # survivors of the compacted file (row 0 must not re-delete)
    assert rows == [(0, "delete", 1)] + [
        (k, "delete", 3) for k in range(1, 6)
    ]
    assert dn.read_delta(spark, path).count() == 0


def test_dv_on_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "dv_part")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src, path, "overwrite", partition_by=["n_regionkey"])
    res = dn.delete_delta(spark, path, "n_nationkey in (3, 20)")
    assert res["rows_deleted"] == 2
    assert _keys(spark, path) == sorted(set(range(25)) - {3, 20})
    # partition pruning still works over DV-bearing adds
    want = sorted(
        r[0]
        for r in src.where("n_regionkey = 0").select("n_nationkey").collect()
        if r[0] not in (3, 20)
    )
    pruned = dn.read_delta(spark, path, partition_filter={"n_regionkey": "0"})
    assert sorted(r[0] for r in pruned.select("n_nationkey").collect()) == want


def test_restore_resurrects_deleted_rows(spark, table):
    path, _ = table
    dn.delete_delta(spark, path, "n_nationkey = 4")
    assert 4 not in _keys(spark, path)
    dn.restore_delta(spark, path, 0)
    assert _keys(spark, path) == list(range(25))


def test_inline_dv_descriptor_reads(spark, tmp_path):
    """A hand-written log with an INLINE ('i') DV descriptor — the
    form small DVs take from other engines — reads correctly."""
    from datalakecrawler_spark.sources.roaring import serialize_rbm_array

    path = str(tmp_path / "dv_inline")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.coalesce(1), path, "overwrite")
    active, *_ = dn._replay_full(path, None)
    (rel,) = active
    # find the row indexes of keys 0 and 1 (order within the file is
    # whatever the writer produced)
    rows = (
        spark.read.parquet(os.path.join(path, rel))
        .withColumn("i", F.col("_metadata.row_index"))
        .where("n_nationkey in (0, 1)")
        .select("i")
        .collect()
    )
    positions = sorted(r["i"] for r in rows)
    desc = {
        "storageType": "i",
        "pathOrInlineDv": dn._z85_encode(
            serialize_rbm_array(positions).ljust(
                (len(serialize_rbm_array(positions)) + 3) // 4 * 4, b"\0"
            )
        ),
        "sizeInBytes": len(serialize_rbm_array(positions)),
        "cardinality": 2,
    }
    add = {**active[rel], "dataChange": True, "deletionVector": desc}
    dn._publish_commit(
        path,
        1,
        [
            {"protocol": dict(dn._DV_PROTOCOL)},
            {"remove": {"path": rel, "deletionTimestamp": 0, "dataChange": True}},
            {"add": add},
        ],
    )
    assert _keys(spark, path) == list(range(2, 25))


def test_column_mapping_roundtrip_and_rename(spark, tmp_path):
    path = str(tmp_path / "cm_tbl")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta_column_mapped(src, path, "overwrite")
    # physical parquet columns are col-<uuid>, logical read is exact
    pf = glob.glob(os.path.join(path, "part-*.parquet"))[0]
    import pyarrow.parquet as pq

    phys_names = [c for c in pq.ParquetFile(pf).schema_arrow.names]
    assert all(c.startswith("col-") for c in phys_names)
    back = dn.read_delta(spark, path)
    assert back.columns == src.columns
    assert sorted(r[0] for r in back.select("n_nationkey").collect()) == list(
        range(25)
    )
    # rename = metadata-only commit: same data files, new logical name
    before = _data_files(path)
    dn.rename_delta_column(path, "n_name", "nation_name")
    assert _data_files(path) == before
    back2 = dn.read_delta(spark, path)
    assert "nation_name" in back2.columns and "n_name" not in back2.columns
    assert back2.where("nation_name = 'NATION_7'").count() == 1
    # append reuses the mapping (by current logical names)
    dn.write_delta_column_mapped(
        back2.limit(0)
        .unionByName(back2.where("nation_name = 'NATION_7'"))
        .withColumn("n_nationkey", F.col("n_nationkey") + 100),
        path,
        "append",
    )
    assert dn.read_delta(spark, path).count() == 26
    # DELETE and UPDATE work on the mapped table under LOGICAL names:
    # DV marks the physical rows, new files stage physically
    res_d = dn.delete_delta(spark, path, "n_nationkey = 0")
    assert res_d["rows_deleted"] == 1
    back3 = dn.read_delta(spark, path)
    assert back3.where("n_nationkey = 0").count() == 0
    assert back3.count() == 25
    dn.update_delta(
        spark, path, "n_nationkey = 107",
        {"nation_name": "upper(concat(nation_name, '_CM'))"},
    )
    back4 = dn.read_delta(spark, path)
    assert back4.where("n_nationkey = 107").first()["nation_name"].endswith("_CM")
    assert back4.count() == 25
    # the updated image landed under PHYSICAL parquet names
    import pyarrow.parquet as _pq2

    newest = max(
        glob.glob(os.path.join(path, "part-*.parquet")), key=os.path.getmtime
    )
    assert all(
        c.startswith("col-")
        for c in _pq2.ParquetFile(newest).schema_arrow.names
    )


def test_roaring_codec_delta_framing(tmp_path):
    """Sidecar wire format: version byte, BE length + CRC framing,
    magic — verified byte-level, not just through the API."""
    import struct
    import zlib

    from datalakecrawler_spark.sources.roaring import (
        deserialize_rbm_array,
        serialize_rbm_array,
    )

    descs = dn._dv_write_sidecar(
        str(tmp_path), {"f1": [1, 5, 70000], "f2": list(range(5000))}
    )
    assert set(descs) == {"f1", "f2"}
    sidecar = glob.glob(os.path.join(str(tmp_path), "deletion_vector_*.bin"))[0]
    raw = open(sidecar, "rb").read()
    assert raw[0] == 1  # DV file format version
    d1 = descs["f1"]
    (n,) = struct.unpack_from(">i", raw, d1["offset"])
    assert n == d1["sizeInBytes"]
    data = raw[d1["offset"] + 4 : d1["offset"] + 4 + n]
    (crc,) = struct.unpack_from(">I", raw, d1["offset"] + 4 + n)
    assert zlib.crc32(data) & 0xFFFFFFFF == crc
    assert deserialize_rbm_array(data) == [1, 5, 70000]
    assert descs["f2"]["cardinality"] == 5000
    # and the resolver round-trips the z85 uuid back to the file
    assert dn._dv_abs_path(str(tmp_path), d1) == sidecar


def test_shallow_clone_partitioned(spark, tmp_path):
    """Shallow clone of a PARTITIONED source: zero bytes copied,
    partition columns served from the stored partitionValues (no
    basePath across roots), clone-side appends and deletes never touch
    the source, and clone VACUUM cannot reclaim source files."""
    src_path = str(tmp_path / "clone_src")
    dst_path = str(tmp_path / "clone_dst")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src, src_path, "overwrite", partition_by=["n_regionkey"])
    res = dn.clone_delta(spark, src_path, dst_path)
    assert res["files_referenced"] > 0
    # no data parquet under the clone
    assert not glob.glob(os.path.join(dst_path, "**", "part-*.parquet"),
                         recursive=True)
    back = dn.read_delta(spark, dst_path)
    assert set(back.columns) == set(src.columns)
    got = sorted(
        (r["n_nationkey"], r["n_regionkey"])
        for r in back.select("n_nationkey", "n_regionkey").collect()
    )
    want = sorted(
        (r[0], r[1])
        for r in src.select("n_nationkey", "n_regionkey").collect()
    )
    assert got == want
    # partition_filter prunes from the clone's log
    r0 = dn.read_delta(spark, dst_path, partition_filter={"n_regionkey": "0"})
    assert sorted(r[0] for r in r0.select("n_nationkey").collect()) == sorted(
        r[0] for r in src.where("n_regionkey = 0").select("n_nationkey").collect()
    )
    # clone-side append lands only in the clone
    extra = spark.createDataFrame([(100, "XANADU", 0)], back.schema)
    dn.write_delta(extra, dst_path, "append", partition_by=["n_regionkey"])
    assert dn.read_delta(spark, dst_path).count() == 26
    assert dn.read_delta(spark, src_path).count() == 25
    # clone-side DV delete marks a SOURCE file's row without touching it
    src_files = set(
        glob.glob(os.path.join(src_path, "**", "*.parquet"), recursive=True)
    )
    dn.delete_delta(spark, dst_path, "n_nationkey = 7")
    assert dn.read_delta(spark, dst_path).count() == 25
    assert dn.read_delta(spark, src_path).count() == 25  # source intact
    assert set(
        glob.glob(os.path.join(src_path, "**", "*.parquet"), recursive=True)
    ) == src_files
    # clone VACUUM walks only the clone dir: source files survive
    dn.vacuum_delta(dst_path, retain_last=1)
    assert set(
        glob.glob(os.path.join(src_path, "**", "*.parquet"), recursive=True)
    ) == src_files
    # OPTIMIZE of a partitioned clone compacts INTO the clone root
    # (r8 — the gate lifted; full coverage in
    # tests/test_delta_features.py::test_optimize_partitioned_clone)
    dn.optimize_delta(spark, dst_path)
    assert dn.read_delta(spark, dst_path).count() == 25
    assert set(
        glob.glob(os.path.join(src_path, "**", "*.parquet"), recursive=True)
    ) == src_files


def test_update_via_dv_and_cdf(spark, table):
    """UPDATE = DV-delete the old images in place + append the new
    ones; untouched rows' files are never rewritten; CDF serves
    update_preimage/update_postimage pairs."""
    path, _ = table
    before = _data_files(path)
    res = dn.update_delta(
        spark, path, "n_nationkey in (3, 8)",
        {"n_name": "upper(concat(n_name, '_v2'))", "n_regionkey": "n_regionkey + 10"},
    )
    assert res["rows_updated"] == 2 and res["files_added"] >= 1
    # original files untouched; only new appended files + sidecar
    assert set(before) <= set(_data_files(path))
    got = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in dn.read_delta(spark, path).collect()
    }
    assert len(got) == 25
    assert got[3][0].endswith("_V2") and got[3][1] >= 10
    assert got[8][0].endswith("_V2")
    assert not got[5][0].endswith("_V2")
    # CDF: exactly one pre+post pair per updated row
    ch = dn.read_delta_changes(spark, path, from_version=0)
    rows = sorted(
        (r["n_nationkey"], r["_change_type"]) for r in ch.collect()
    )
    assert rows == [
        (3, "update_postimage"), (3, "update_preimage"),
        (8, "update_postimage"), (8, "update_preimage"),
    ]
    # time travel pre-update
    assert not any(
        r["n_name"].endswith("_V2")
        for r in dn.read_delta(spark, path, version=0).collect()
    )
    # no-op update commits nothing
    res2 = dn.update_delta(spark, path, "n_nationkey = 999", {"n_name": "'X'"})
    assert res2["rows_updated"] == 0 and res2["version"] == res["version"]


def test_update_moves_rows_across_partitions(spark, tmp_path):
    path = str(tmp_path / "dv_upd_part")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src, path, "overwrite", partition_by=["n_regionkey"])
    dn.update_delta(
        spark, path, "n_nationkey = 2", {"n_regionkey": "99"}
    )
    moved = dn.read_delta(spark, path, partition_filter={"n_regionkey": "99"})
    assert [r["n_nationkey"] for r in moved.collect()] == [2]
    assert dn.read_delta(spark, path).count() == 25


def test_maintenance_report_flags_dv_debt(spark, tmp_path):
    """The crawler's auditor counts DV-bearing files as reclaimable and
    recommends 'purge' when >=10% of their rows are dead; OPTIMIZE
    clears the debt."""
    from datalakecrawler_spark.crawler import table_maintenance_report

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    src = load(spark, SF_DIR, "nation")
    path = os.path.join(lake, "dv_tbl")
    dn.write_delta(src.coalesce(1), path, "overwrite")
    dn.delete_delta(spark, path, "n_nationkey < 5")  # 5/25 dead = 20%
    rep = {r["dataset"]: r for r in table_maintenance_report(spark, lake).collect()}
    assert rep["dv_tbl"]["recommendation"] == "purge"
    assert rep["dv_tbl"]["n_reclaimable_files"] == 1
    dn.optimize_delta(spark, path)
    rep2 = {r["dataset"]: r for r in table_maintenance_report(spark, lake).collect()}
    assert rep2["dv_tbl"]["recommendation"] == "ok"
    assert rep2["dv_tbl"]["n_reclaimable_files"] == 0


def test_timestamp_ntz_declares_feature_and_roundtrips(spark, tmp_path):
    """A table with a TIMESTAMP_NTZ column declares the protocol's
    timestampNtz feature at creation (readers without it would misread
    zoneless values) and round-trips exactly."""
    path = str(tmp_path / "ntz_tbl")
    df = spark.sql(
        "select timestamp_ntz'2024-03-01 12:34:56' as ts, 1 as k"
    )
    dn.write_delta(df, path, "overwrite")
    acts = [
        json.loads(l)
        for l in open(os.path.join(path, "_delta_log", f"{0:020d}.json"))
        if l.strip()
    ]
    prot = next(a["protocol"] for a in acts if "protocol" in a)
    assert prot["minReaderVersion"] == 3
    assert "timestampNtz" in prot["readerFeatures"]
    back = dn.read_delta(spark, path)
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    assert back.first()["ts"].isoformat() == "2024-03-01T12:34:56"
    # plain tables keep the v1 protocol (no gratuitous upgrades)
    p2 = str(tmp_path / "plain_tbl")
    dn.write_delta(df.select("k"), p2, "overwrite")
    acts2 = [
        json.loads(l)
        for l in open(os.path.join(p2, "_delta_log", f"{0:020d}.json"))
        if l.strip()
    ]
    assert next(a["protocol"] for a in acts2 if "protocol" in a) == {
        "minReaderVersion": 1, "minWriterVersion": 2,
    }


def test_v2_checkpoint_roundtrip(spark, tmp_path):
    """V2 checkpoint: UUID-named checkpoint + sidecar add-file parquet,
    protocol auto-upgraded to (3,7)+v2Checkpoint in its own commit,
    replay starts from the checkpoint (proven by hiding the earlier
    JSON commits), and DVs survive through the sidecar."""
    path = str(tmp_path / "v2ckpt")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.where("n_nationkey < 20"), path, "overwrite")
    dn.write_delta(src.where("n_nationkey >= 20"), path, "append")
    dn.delete_delta(spark, path, "n_nationkey = 3")  # v2 (DV protocol)
    res = dn.checkpoint_delta(path, v2=True)
    assert res["v2"] and res["checkpoint"].endswith(".parquet")
    # the upgrade commit landed, then the checkpoint covers it
    assert res["version"] == 3
    acts = [
        json.loads(l)
        for l in open(os.path.join(path, "_delta_log", f"{3:020d}.json"))
        if l.strip()
    ]
    prot = next(a["protocol"] for a in acts if "protocol" in a)
    assert "v2Checkpoint" in prot["readerFeatures"]
    assert "deletionVectors" in prot["readerFeatures"]  # implied carried
    # sidecar exists and carries the adds
    sc = os.path.join(path, "_delta_log", "_sidecars", res["sidecars"][0])
    assert os.path.exists(sc)
    # one post-checkpoint commit, then hide every pre-checkpoint JSON:
    # the read must serve checkpoint state + the v4 delta only
    dn.write_delta(
        spark.createDataFrame([(99, "X", 0)], src.schema), path, "append"
    )
    hidden = []
    try:
        for v in range(4):
            f = os.path.join(path, "_delta_log", f"{v:020d}.json")
            os.replace(f, f + ".hidden")
            hidden.append(f)
        back = dn.read_delta(spark, path)
        keys = sorted(r[0] for r in back.select("n_nationkey").collect())
        assert keys == sorted((set(range(25)) - {3}) | {99})
    finally:
        for f in hidden:
            os.replace(f + ".hidden", f)


def test_drop_column_metadata_only(spark, tmp_path):
    """DROP COLUMN on a mapped table: one JSON commit, zero file
    rewrites, the dropped values unreadable afterwards, and time
    travel to the pre-drop version still serves them."""
    path = str(tmp_path / "cm_drop")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta_column_mapped(src, path, "overwrite")
    before = _data_files(path)
    v = dn.drop_delta_column(path, "n_regionkey")
    assert _data_files(path) == before
    back = dn.read_delta(spark, path)
    assert sorted(back.columns) == ["n_name", "n_nationkey"]
    assert back.count() == 25
    # time travel pre-drop still serves the column
    old = dn.read_delta(spark, path, version=v - 1)
    assert "n_regionkey" in old.columns
    with pytest.raises(ValueError, match="no column"):
        dn.drop_delta_column(path, "nope")


def test_column_mapping_partitioned(spark, tmp_path):
    """Partitioned column-mapped table: hive dirs / partitionValues /
    partitionColumns all carry PHYSICAL names (per protocol), logical
    reads and partition_filter translate, renaming the partition
    column stays metadata-only, and DELETE/UPDATE work."""
    path = str(tmp_path / "cm_part")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta_column_mapped(
        src, path, "overwrite", partition_by=["n_regionkey"]
    )
    # dirs are physical col-<uuid>=value
    dirs = [
        os.path.basename(d)
        for d in glob.glob(os.path.join(path, "col-*=*"))
    ]
    assert dirs and all(d.startswith("col-") for d in dirs)
    back = dn.read_delta(spark, path)
    assert sorted(back.columns) == sorted(src.columns)
    assert back.count() == 25
    # partition_filter by LOGICAL name prunes from the log
    want = sorted(
        r[0] for r in src.where("n_regionkey = 1").select("n_nationkey").collect()
    )
    pruned = dn.read_delta(spark, path, partition_filter={"n_regionkey": "1"})
    assert sorted(r["n_nationkey"] for r in pruned.collect()) == want
    # renaming the PARTITION column is metadata-only (dirs physical)
    before = sorted(glob.glob(os.path.join(path, "**", "part-*.parquet"),
                              recursive=True))
    dn.rename_delta_column(path, "n_regionkey", "region_id")
    assert sorted(glob.glob(os.path.join(path, "**", "part-*.parquet"),
                            recursive=True)) == before
    back2 = dn.read_delta(spark, path, partition_filter={"region_id": "1"})
    assert sorted(r["n_nationkey"] for r in back2.collect()) == want
    # append reuses mapping + partitioning; DELETE/UPDATE logical
    dn.write_delta_column_mapped(
        back2.limit(1).withColumn("n_nationkey", F.lit(100)),
        path, "append", partition_by=["region_id"],
    )
    assert dn.read_delta(spark, path).count() == 26
    dn.delete_delta(spark, path, "n_nationkey = 100")
    assert dn.read_delta(spark, path).count() == 25
    dn.update_delta(spark, path, "n_nationkey = 3", {"region_id": "77"})
    moved = dn.read_delta(spark, path, partition_filter={"region_id": "77"})
    assert [r["n_nationkey"] for r in moved.collect()] == [3]


def test_cdf_on_column_mapped_table(spark, tmp_path):
    """read_delta_changes on a mapped table serves LOGICAL names —
    inserts from physical appends, DV-commit deletes by row index, and
    update pre/post images from cdc files all project back."""
    path = str(tmp_path / "cm_cdf")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta_column_mapped(src.where("n_nationkey < 6"), path)
    dn.delete_delta(spark, path, "n_nationkey = 2")  # v1: DV delete
    dn.update_delta(
        spark, path, "n_nationkey = 4", {"n_name": "'UPDATED'"}
    )  # v2: cdc update
    dn.write_delta_column_mapped(
        src.where("n_nationkey = 20"), path, "append"
    )  # v3: physical-name insert
    ch = dn.read_delta_changes(spark, path, from_version=0)
    rows = sorted(
        (r["n_nationkey"], r["_change_type"], r["_commit_version"])
        for r in ch.collect()
    )
    assert rows == [
        (2, "delete", 1),
        (4, "update_postimage", 2),
        (4, "update_preimage", 2),
        (20, "insert", 3),
    ]
    # values are real, not nulled-out physical misses
    names = {
        (r["_change_type"]): r["n_name"]
        for r in ch.where("n_nationkey = 4").collect()
    }
    assert names["update_postimage"] == "UPDATED"
    assert names["update_preimage"] == "NATION_4"


def test_delete_never_collects_data_proportional_rows(spark, tmp_path):
    """Writer-side scale lint (VERDICT r7 §2): DELETE serializes DV
    bitmaps executor-side; the only rows that may cross to the driver
    are O(touched files) descriptor rows — never the matched row
    positions. Asserted behaviorally: every DataFrame.collect() during
    delete_delta must return at most n_active_files rows, on a delete
    that matches ~100x more rows than there are files."""
    try:  # Spark 4: concrete sessions build classic.DataFrame
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover — older layout
        from pyspark.sql import DataFrame

    path = str(tmp_path / "dv_scale_tbl")
    src = load(spark, SF_DIR, "orders")  # 1500 rows at sf0.001
    dn.write_delta(src.repartition(4), path, "overwrite")
    n_files = len(_data_files(path))
    collected_sizes = []
    orig_collect = DataFrame.collect

    def spy(self):
        rows = orig_collect(self)
        collected_sizes.append(len(rows))
        return rows

    DataFrame.collect = spy
    try:
        res = dn.delete_delta(spark, path, "o_orderstatus = 'O'")
    finally:
        DataFrame.collect = orig_collect
    assert res["rows_deleted"] > 100 * n_files  # data >> files
    assert collected_sizes, "spy never saw a collect"
    assert max(collected_sizes) <= n_files, (
        f"DELETE collected {max(collected_sizes)} rows to the driver "
        f"(> {n_files} active files) — data-proportional writer"
    )
    # and the delete is correct
    assert dn.read_delta(spark, path).where("o_orderstatus = 'O'").count() == 0


def test_delete_merges_existing_dv_executor_side(spark, table):
    """Sequenced DELETEs union bitmaps (newest add wins) with the old
    bitmap read + merged in executors; fully-dead files drop to bare
    removes even when the killing blow arrives across two commits."""
    path, src = table
    dn.delete_delta(spark, path, "n_nationkey < 12")
    res2 = dn.delete_delta(spark, path, "n_nationkey < 20")
    assert res2["rows_deleted"] == 8  # 12..19 only — re-deletes are no-ops
    assert _keys(spark, path) == list(range(20, 25))
    # every surviving add's DV cardinality equals rows actually dead in it
    acts = dn._replay_full(path, None)[0]
    total_dead = sum(
        a["deletionVector"]["cardinality"]
        for a in acts.values()
        if a.get("deletionVector")
    )
    live = dn.read_delta(spark, path).count()
    stats_total = sum(
        json.loads(a["stats"])["numRecords"] for a in acts.values()
    )
    assert stats_total - total_dead == live
