"""sources/convert.py — the metadata-only conversion matrix (Delta ⇄
Iceberg ⇄ Hudi): zero data-file copies, name-mapping resolution
(nested and physical column-mapped names included), delete translation
(DVs ⇄ positional deletes; equality via consented compaction),
partition carry-through (identity values, transform sources, hive-dir
re-derivation for Hudi), and the remaining fail-loudly gates."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.sources import delta_native as dn
from datalakecrawler_spark.sources import iceberg_native as ice
from datalakecrawler_spark.sources.convert import (
    convert_delta_to_iceberg,
    convert_iceberg_to_delta,
)
from tests.conftest import SF_DIR


def _no_parquet_under(path):
    return not glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_delta_to_iceberg_zero_copy(spark, tmp_path):
    pd_, pi = str(tmp_path / "d"), str(tmp_path / "i")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.repartition(3), pd_, "overwrite")
    res = convert_delta_to_iceberg(spark, pd_, pi)
    assert res == {
        "files_referenced": 3,
        "files_copied": 0,
        "rows": 25,
        "deleted_rows_converted": 0,
    }
    assert _no_parquet_under(pi)
    got = sorted(r["n_nationkey"] for r in ice.read_iceberg(spark, pi).collect())
    assert got == list(range(25))
    # the spec's name-mapping rode along (imported files have no ids)
    meta = ice._read_metadata(pi)
    mapping = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {m["names"][0] for m in mapping} == set(src.columns)


def test_delta_to_iceberg_partitioned_prunes(spark, tmp_path):
    pd_, pi = str(tmp_path / "dp"), str(tmp_path / "ip")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src, pd_, "overwrite", partition_by=["n_regionkey"])
    convert_delta_to_iceberg(spark, pd_, pi)
    pruned = ice.read_iceberg(spark, pi, partition_filter={"n_regionkey": 2})
    assert sorted(r["n_nationkey"] for r in pruned.collect()) == sorted(
        r["n_nationkey"]
        for r in src.where("n_regionkey = 2").collect()
    )


def test_iceberg_to_delta_roundtrip_and_pruning(spark, tmp_path):
    pi, pd_ = str(tmp_path / "i2"), str(tmp_path / "d2")
    src = load(spark, SF_DIR, "nation")
    ice.write_iceberg(
        src, pi, "overwrite", partition_by=["n_regionkey"], format_version=2
    )
    res = convert_iceberg_to_delta(spark, pi, pd_)
    assert res["files_copied"] == 0 and res["rows"] == 25
    assert _no_parquet_under(pd_)
    out = dn.read_delta(spark, pd_)
    assert sorted(r["n_nationkey"] for r in out.collect()) == list(range(25))
    pruned = dn.read_delta(spark, pd_, partition_filter={"n_regionkey": "0"})
    assert pruned.count() == src.where("n_regionkey = 0").count()


def test_convert_dv_becomes_positional_deletes(spark, tmp_path):
    """Delta DVs convert to Iceberg positional-delete files: dead rows
    stay dead across the format switch, no data file is copied, and
    the only new parquet is the O(deleted rows) delete file."""
    src = load(spark, SF_DIR, "nation")
    pd_ = str(tmp_path / "dv_src")
    pi = str(tmp_path / "dv_dst")
    dn.write_delta(src.repartition(3), pd_, "overwrite")
    dn.delete_delta(spark, pd_, "n_nationkey in (3, 17)")
    res = convert_delta_to_iceberg(spark, pd_, pi)
    assert res["deleted_rows_converted"] == 2
    new_parquet = glob.glob(os.path.join(pi, "**", "*.parquet"), recursive=True)
    assert [os.path.basename(f) for f in new_parquet] == [
        "delete-cv00001.parquet"
    ]
    got = sorted(r["n_nationkey"] for r in ice.read_iceberg(spark, pi).collect())
    assert got == sorted(set(range(25)) - {3, 17})


def test_convert_gates(spark, tmp_path):
    src = load(spark, SF_DIR, "nation")
    # column-mapped Delta converts via (nested) name mapping — see
    # test_column_mapped_delta_to_iceberg /
    # test_nested_column_mapped_delta_to_iceberg
    # Iceberg with live EQUALITY deletes refuses (value-keyed; a DV
    # needs positions) — positional deletes convert, see
    # test_iceberg_positional_deletes_become_delta_dvs
    pi = str(tmp_path / "gate_eq")
    ice.write_iceberg(src, pi, "overwrite", format_version=2)
    ice.add_equality_deletes(
        spark, pi, spark.createDataFrame([(1,)], "n_nationkey int")
    )
    with pytest.raises(NotImplementedError, match="EQUALITY deletes"):
        convert_iceberg_to_delta(spark, pi, str(tmp_path / "x3"))
    # transform specs CONVERT (the source column is in the file
    # bytes; only the pruning dimension is lost) — see
    # test_transform_spec_iceberg_to_delta


def test_converted_iceberg_accepts_appends_preserving_mapping(spark, tmp_path):
    """write_iceberg appends onto a converted table must not strip the
    name-mapping property (it is what keeps the imported files
    readable)."""
    pd_, pi = str(tmp_path / "d3"), str(tmp_path / "i3")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.where("n_nationkey < 20"), pd_, "overwrite")
    convert_delta_to_iceberg(spark, pd_, pi)
    ice.write_iceberg(
        src.where("n_nationkey >= 20"), pi, "append", format_version=2
    )
    meta = ice._read_metadata(pi)
    assert "schema.name-mapping.default" in meta["properties"]
    got = sorted(r["n_nationkey"] for r in ice.read_iceberg(spark, pi).collect())
    assert got == list(range(25))


def test_sync_mirrors_appends_and_dv_deletes(spark, tmp_path):
    from datalakecrawler_spark.sources.convert import sync_delta_to_iceberg

    pd_, pi = str(tmp_path / "sd"), str(tmp_path / "si")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.where("n_nationkey < 10"), pd_, "overwrite")
    convert_delta_to_iceberg(spark, pd_, pi)
    assert sync_delta_to_iceberg(spark, pd_, pi) == {
        "synced": False, "delta_version": 0,
    }
    dn.write_delta(src.where("n_nationkey >= 10"), pd_, "append")
    dn.delete_delta(spark, pd_, "n_nationkey in (1, 15)")
    res = sync_delta_to_iceberg(spark, pd_, pi)
    assert res["synced"] and res["deleted_rows_converted"] == 2
    got = sorted(r["n_nationkey"] for r in ice.read_iceberg(spark, pi).collect())
    assert got == sorted(set(range(25)) - {1, 15})
    # history intact, repeat no-op
    meta = ice._read_metadata(pi)
    first = min(s["snapshot-id"] for s in meta["snapshots"])
    assert ice.read_iceberg(spark, pi, snapshot_id=first).count() == 10
    assert not sync_delta_to_iceberg(spark, pd_, pi)["synced"]


def test_convert_refuses_existing_target_and_unsynced_source(spark, tmp_path):
    from datalakecrawler_spark.sources.convert import sync_delta_to_iceberg

    src = load(spark, SF_DIR, "nation")
    pd_, pi = str(tmp_path / "rd"), str(tmp_path / "ri")
    dn.write_delta(src, pd_, "overwrite")
    convert_delta_to_iceberg(spark, pd_, pi)
    with pytest.raises(ValueError, match="already holds Iceberg metadata"):
        convert_delta_to_iceberg(spark, pd_, pi)
    # a native (non-converted) iceberg table refuses sync
    pn = str(tmp_path / "native_ice")
    ice.write_iceberg(src, pn, "overwrite", format_version=2)
    with pytest.raises(ValueError, match="dlc.convert.delta-version"):
        sync_delta_to_iceberg(spark, pd_, pn)


def test_hudi_to_delta_latest_slices_only(spark, tmp_path):
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_hudi_to_delta

    ph, pd_ = str(tmp_path / "h"), str(tmp_path / "hd")
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi(src, ph, "n_nationkey", "20240101000000", op="bulk_insert")
    upd = src.where("n_nationkey < 5").withColumn(
        "n_name", F.lit("UPDATED")
    )
    hn.write_hudi(upd, ph, "n_nationkey", "20240102000000", op="upsert")
    res = convert_hudi_to_delta(spark, ph, pd_)
    assert res["files_copied"] == 0 and res["rows"] == 25
    assert _no_parquet_under(pd_)
    out = dn.read_delta(spark, pd_)
    assert not [c for c in out.columns if c.startswith("_hoodie_")]
    got = {r["n_nationkey"]: r["n_name"] for r in out.collect()}
    assert len(got) == 25
    assert all(got[k] == "UPDATED" for k in range(5))
    assert got[10] != "UPDATED"


def test_hudi_mor_with_logs_refuses_then_converts_after_compaction(
    spark, tmp_path
):
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_hudi_to_delta

    ph = str(tmp_path / "mor")
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi_mor(
        src, ph, "n_nationkey", "20240101000000", op="bulk_insert"
    )
    hn.write_hudi_mor(
        src.where("n_nationkey = 1").withColumn("n_name", F.lit("X")),
        ph, "n_nationkey", "20240102000000", op="upsert",
    )
    with pytest.raises(NotImplementedError, match="unmerged log"):
        convert_hudi_to_delta(spark, ph, str(tmp_path / "x"))
    hn.compact_hudi_mor(spark, ph, "20240103000000")
    res = convert_hudi_to_delta(spark, ph, str(tmp_path / "x"))
    assert res["rows"] == 25
    got = {
        r["n_nationkey"]: r["n_name"]
        for r in dn.read_delta(spark, str(tmp_path / "x")).collect()
    }
    assert got[1] == "X" and len(got) == 25


def test_iceberg_positional_deletes_become_delta_dvs(spark, tmp_path):
    pi, pd_ = str(tmp_path / "pid"), str(tmp_path / "pdd")
    src = load(spark, SF_DIR, "nation")
    ice.write_iceberg(src.repartition(3), pi, "overwrite", format_version=2)
    ice.add_position_deletes(spark, pi, "n_nationkey in (4, 9)")
    res = convert_iceberg_to_delta(spark, pi, pd_)
    assert res["deleted_rows_converted"] == 2
    assert _no_parquet_under(pd_)
    assert glob.glob(os.path.join(pd_, "deletion_vector_*.bin"))
    got = sorted(r["n_nationkey"] for r in dn.read_delta(spark, pd_).collect())
    assert got == sorted(set(range(25)) - {4, 9})


def test_iceberg_v3_dvs_become_delta_dvs(spark, tmp_path):
    pi, pd_ = str(tmp_path / "v3d"), str(tmp_path / "v3dd")
    src = load(spark, SF_DIR, "nation")
    ice.write_iceberg(src, pi, "overwrite", format_version=3)
    ice.add_deletion_vectors(spark, pi, "n_nationkey < 3")
    res = convert_iceberg_to_delta(spark, pi, pd_)
    assert res["deleted_rows_converted"] == 3
    got = sorted(r["n_nationkey"] for r in dn.read_delta(spark, pd_).collect())
    assert got == list(range(3, 25))


def test_hudi_to_iceberg_composed(spark, tmp_path):
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_hudi_to_iceberg

    ph = str(tmp_path / "h2i")
    pt = str(tmp_path / "h2i_tmp")
    pi = str(tmp_path / "h2i_ice")
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi(src, ph, "n_nationkey", "20240101000000", op="bulk_insert")
    hn.write_hudi(
        src.where("n_nationkey = 7").withColumn("n_name", F.lit("SEVEN")),
        ph, "n_nationkey", "20240102000000", op="upsert",
    )
    res = convert_hudi_to_iceberg(spark, ph, pi, pt)
    assert res["files_copied"] == 0
    assert _no_parquet_under(pt) and _no_parquet_under(pi)
    got = {
        r["n_nationkey"]: r["n_name"]
        for r in ice.read_iceberg(spark, pi).collect()
    }
    assert len(got) == 25 and got[7] == "SEVEN" and got[8] != "SEVEN"


def test_delta_to_hudi_zero_copy_roundtrip(spark, tmp_path):
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_delta_to_hudi

    pd_, ph = str(tmp_path / "d2h"), str(tmp_path / "d2h_hudi")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src.where("n_nationkey < 20").repartition(2), pd_, "overwrite")
    dn.write_delta(src.where("n_nationkey >= 20"), pd_, "append")
    res = convert_delta_to_hudi(spark, pd_, ph)
    assert res["files_copied"] == 0 and res["rows"] == 25
    assert _no_parquet_under(ph)
    got = {r["n_nationkey"] for r in hn.read_hudi(spark, ph).collect()}
    assert got == set(range(25))
    tl = hn.hudi_timeline(ph)
    assert len(tl) == 1 and tl[0]["operation"] == "CONVERT"
    # converting onto an existing timeline refuses
    with pytest.raises(ValueError, match="already holds a Hudi timeline"):
        convert_delta_to_hudi(spark, pd_, ph)


def test_delta_to_hudi_gates(spark, tmp_path):
    from datalakecrawler_spark.sources.convert import convert_delta_to_hudi

    src = load(spark, SF_DIR, "nation")
    # partitioned SHALLOW-CLONE-shaped sources (absolute add paths)
    # refuse: their partition values live in partitionValues, not
    # under their own hive dirs — plain partitioned tables convert,
    # see test_partitioned_delta_to_hudi
    pi0 = str(tmp_path / "gate_abs_src")
    pp = str(tmp_path / "gate_abs")
    ice.write_iceberg(
        src, pi0, "overwrite", partition_by=["n_regionkey"],
        format_version=2,
    )
    convert_iceberg_to_delta(spark, pi0, pp)
    with pytest.raises(NotImplementedError, match="absolute path"):
        convert_delta_to_hudi(spark, pp, str(tmp_path / "x1"))
    # deletion vectors: Hudi CoW has no row-level sidecar
    pv = str(tmp_path / "gate_dv")
    dn.write_delta(src, pv, "overwrite")
    dn.delete_delta(spark, pv, "n_nationkey = 3")
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        convert_delta_to_hudi(spark, pv, str(tmp_path / "x2"))
    # column-mapped tables CONVERT — flat via the stored rename map
    # (test_cm_delta_to_hudi), nested via the stored logical schema
    # since r9 (test_nested_cm_delta_to_hudi)


def test_cm_delta_to_hudi(spark, tmp_path):
    """Flat column-mapped Delta → Hudi: the stored rename map projects
    physical col-<uuid> file names back to the logical schema, a
    logical RENAME COLUMN before converting carries through, and the
    partitioned variant composes rename + basePath re-derivation +
    the partition-type cast."""
    from datalakecrawler_spark.sources.convert import convert_delta_to_hudi
    from datalakecrawler_spark.sources import hudi_native as hn

    src = load(spark, SF_DIR, "nation")
    pd_, ph = str(tmp_path / "cmh"), str(tmp_path / "cmh_h")
    dn.write_delta_column_mapped(src, pd_, "overwrite")
    dn.rename_delta_column(pd_, "n_name", "name")
    res = convert_delta_to_hudi(spark, pd_, ph)
    assert res["files_copied"] == 0 and res["rows"] == 25
    out = hn.read_hudi(spark, ph)
    assert out.columns == ["n_nationkey", "name", "n_regionkey"]
    got = sorted((r["n_nationkey"], r["name"]) for r in out.collect())
    assert got == sorted((r["n_nationkey"], r["n_name"]) for r in src.collect())
    # partitioned cm: rename + dir re-derivation + type cast compose
    qd, qh = str(tmp_path / "cmhp"), str(tmp_path / "cmhp_h")
    dn.write_delta_column_mapped(
        src, qd, "overwrite", partition_by=["n_regionkey"]
    )
    convert_delta_to_hudi(spark, qd, qh)
    out2 = hn.read_hudi(spark, qh)
    assert {
        f.name: f.dataType.simpleString() for f in out2.schema
    } == {f.name: f.dataType.simpleString() for f in src.schema}
    assert sorted(
        (r["n_nationkey"], r["n_regionkey"]) for r in out2.collect()
    ) == sorted((r["n_nationkey"], r["n_regionkey"]) for r in src.collect())


def test_converted_hudi_is_readonly(spark, tmp_path):
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_delta_to_hudi

    pd_, ph = str(tmp_path / "ro_d"), str(tmp_path / "ro_h")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src, pd_, "overwrite")
    convert_delta_to_hudi(spark, pd_, ph)
    with pytest.raises(NotImplementedError, match="converted from delta"):
        hn.write_hudi(src, ph, "n_nationkey", "99999999999999", op="upsert")
    with pytest.raises(NotImplementedError, match="converted from delta"):
        hn.read_hudi_incremental(spark, ph, "00000000000000")
    # snapshot reads still serve the table
    assert hn.read_hudi(spark, ph).count() == 25


def test_iceberg_to_hudi_composed(spark, tmp_path):
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_iceberg_to_hudi

    pi = str(tmp_path / "i2h_src")
    pt = str(tmp_path / "i2h_tmp")
    ph = str(tmp_path / "i2h_dst")
    src = load(spark, SF_DIR, "nation")
    ice.write_iceberg(src.where("n_nationkey < 10"), pi, "overwrite",
                      format_version=2)
    ice.write_iceberg(src.where("n_nationkey >= 10"), pi, "append",
                      format_version=2)
    res = convert_iceberg_to_hudi(spark, pi, ph, pt)
    assert res["files_copied"] == 0 and res["rows"] == 25
    assert _no_parquet_under(pt) and _no_parquet_under(ph)
    got = {r["n_nationkey"] for r in hn.read_hudi(spark, ph).collect()}
    assert got == set(range(25))
    # a snapshot with live positional deletes refuses transitively:
    # the Delta leg carries them as DVs, which Hudi CoW cannot express
    pi2, pt2 = str(tmp_path / "i2h_dv"), str(tmp_path / "i2h_dv_tmp")
    ice.write_iceberg(src, pi2, "overwrite", format_version=2)
    ice.add_position_deletes(spark, pi2, "n_nationkey = 1")
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        convert_iceberg_to_hudi(spark, pi2, str(tmp_path / "x"), pt2)


def test_column_mapped_delta_to_iceberg(spark, tmp_path):
    """Unpartitioned column-mapped Delta (both mapping modes) converts
    via Iceberg name mapping: physical col-<uuid> file names resolve
    to logical schema names, deletes ride along as positional
    deletes, and sync_delta_to_iceberg keeps mirroring."""
    src = load(spark, SF_DIR, "nation")
    for cm_mode in ("name", "id"):
        pd_ = str(tmp_path / f"cm_{cm_mode}")
        pi = str(tmp_path / f"cm_{cm_mode}_ice")
        dn.write_delta_column_mapped(src, pd_, "overwrite", cm_mode=cm_mode)
        dn.delete_delta(spark, pd_, "n_nationkey in (4, 11)")
        res = convert_delta_to_iceberg(spark, pd_, pi)
        assert res["files_copied"] == 0
        assert res["deleted_rows_converted"] == 2
        out = ice.read_iceberg(spark, pi)
        assert out.columns == ["n_nationkey", "n_name", "n_regionkey"]
        got = sorted(r["n_nationkey"] for r in out.collect())
        assert got == sorted(set(range(25)) - {4, 11})
    # RENAME COLUMN then sync: the mapping follows the logical rename
    from datalakecrawler_spark.sources.convert import sync_delta_to_iceberg

    pd_ = str(tmp_path / "cm_name")
    pi = str(tmp_path / "cm_name_ice")
    dn.write_delta_column_mapped(
        src.where("n_nationkey >= 25"), pd_, "append"
    )  # no-op rows, just a new version to sync
    s = sync_delta_to_iceberg(spark, pd_, pi)
    assert s["synced"] is True
    assert ice.read_iceberg(spark, pi).count() == 23
    # nested structs convert too — see
    # test_nested_column_mapped_delta_to_iceberg


def test_nested_column_mapped_delta_to_iceberg(spark, tmp_path):
    """NESTED column-mapped structs convert: the name mapping carries
    nested 'fields' sub-entries (physical name per struct member at
    every level), the scan reads under the physical struct and
    projects back through one positional cast, and a DV delete plus a
    top-level struct rename ride along."""
    src = load(spark, SF_DIR, "nation")
    nested = src.select(
        "n_nationkey",
        F.struct(
            F.col("n_name").alias("name"),
            F.struct(F.col("n_regionkey").alias("rk")).alias("inner"),
        ).alias("info"),
    )
    pd_, pi = str(tmp_path / "ncm"), str(tmp_path / "ncm_ice")
    dn.write_delta_column_mapped(nested, pd_, "overwrite")
    dn.delete_delta(spark, pd_, "n_nationkey = 5")
    dn.rename_delta_column(pd_, "info", "details")
    res = convert_delta_to_iceberg(spark, pd_, pi)
    assert res["files_copied"] == 0 and res["deleted_rows_converted"] == 1
    out = ice.read_iceberg(spark, pi)
    assert out.schema.simpleString() == (
        "struct<n_nationkey:int,details:struct<name:string,"
        "inner:struct<rk:int>>>"
    )
    got = sorted(
        (r["n_nationkey"], r["details"]["name"], r["details"]["inner"]["rk"])
        for r in out.collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["info"]["name"], r["info"]["inner"]["rk"])
        for r in nested.where("n_nationkey <> 5").collect()
    )


def test_partitioned_column_mapped_delta_to_iceberg(spark, tmp_path):
    """Partitioned cm tables: Delta keys partitionColumns /
    partitionValues / hive dirs by PHYSICAL name; the Iceberg
    manifest records logical names, pruning works, and a DV delete
    plus a partition-column RENAME survive the conversion."""
    from datalakecrawler_spark.sources.convert import sync_delta_to_iceberg
    from datalakecrawler_spark.sources.delta_native import (
        rename_delta_column,
    )

    src = load(spark, SF_DIR, "nation")
    pd_ = str(tmp_path / "pcm")
    pi = str(tmp_path / "pcm_ice")
    dn.write_delta_column_mapped(
        src, pd_, "overwrite", partition_by=["n_regionkey"]
    )
    dn.delete_delta(spark, pd_, "n_nationkey in (6, 19)")
    rename_delta_column(pd_, "n_regionkey", "region")
    res = convert_delta_to_iceberg(spark, pd_, pi)
    assert res["files_copied"] == 0 and res["deleted_rows_converted"] == 2
    out = ice.read_iceberg(spark, pi)
    assert set(out.columns) == {"n_nationkey", "n_name", "region"}
    got = sorted(r["n_nationkey"] for r in out.collect())
    assert got == sorted(set(range(25)) - {6, 19})
    pruned = ice.read_iceberg(spark, pi, partition_filter={"region": 2})
    assert pruned.count() == src.where(
        "n_regionkey = 2 and n_nationkey not in (6, 19)"
    ).count()
    # sync keeps mirroring after another delete
    dn.delete_delta(spark, pd_, "n_nationkey = 0")
    s = sync_delta_to_iceberg(spark, pd_, pi)
    assert s["synced"] and s["deleted_rows_converted"] == 3
    assert ice.read_iceberg(spark, pi).count() == 22


def test_transform_spec_iceberg_to_delta(spark, tmp_path):
    """Transform partition specs convert: the transform's SOURCE
    column lives inside the data files (only identity values are
    dir-derived), so a bucket-spec table converts with the bucket
    dimension as an ordinary data column, and a MIXED
    identity+transform spec keeps Delta-side pruning on the identity
    part. Positional deletes still ride along as DVs."""
    src = load(spark, SF_DIR, "nation")
    # pure transform spec + a positional delete
    pb, pd1 = str(tmp_path / "tf_i"), str(tmp_path / "tf_d")
    ice.write_iceberg(
        src, pb, "overwrite", partition_by=["bucket(4, n_nationkey)"],
        format_version=2,
    )
    ice.add_position_deletes(spark, pb, "n_nationkey = 8")
    res = convert_iceberg_to_delta(spark, pb, pd1)
    assert res["files_copied"] == 0 and res["deleted_rows_converted"] == 1
    assert _no_parquet_under(pd1)
    got = sorted(r["n_nationkey"] for r in dn.read_delta(spark, pd1).collect())
    assert got == sorted(set(range(25)) - {8})
    # mixed identity + transform: identity pruning survives
    pm, pd2 = str(tmp_path / "mx_i"), str(tmp_path / "mx_d")
    ice.write_iceberg(
        src, pm, "overwrite",
        partition_by=["n_regionkey", "bucket(4, n_nationkey)"],
        format_version=2,
    )
    convert_iceberg_to_delta(spark, pm, pd2)
    out = dn.read_delta(spark, pd2)
    assert sorted(
        (r["n_nationkey"], r["n_regionkey"], r["n_name"])
        for r in out.collect()
    ) == sorted(
        (r["n_nationkey"], r["n_regionkey"], r["n_name"])
        for r in src.collect()
    )
    pruned = dn.read_delta(spark, pd2, partition_filter={"n_regionkey": "1"})
    assert pruned.count() == src.where("n_regionkey = 1").count()


def test_partitioned_delta_to_hudi(spark, tmp_path):
    """Partitioned Delta → Hudi: commit metadata keys write stats by
    the hive dir, read_hudi re-derives the partition column via the
    stored base-path and casts it back to the committed type, and
    partition_path pruning works on the dir strings."""
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_delta_to_hudi

    pd_, ph = str(tmp_path / "pdh"), str(tmp_path / "pdh_h")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src, pd_, "overwrite", partition_by=["n_regionkey"])
    res = convert_delta_to_hudi(spark, pd_, ph)
    assert res["files_copied"] == 0 and res["rows"] == 25
    assert _no_parquet_under(ph)
    out = hn.read_hudi(spark, ph)
    assert {
        f.name: f.dataType.simpleString() for f in out.schema
    } == {f.name: f.dataType.simpleString() for f in src.schema}
    got = sorted(
        (r["n_nationkey"], r["n_regionkey"]) for r in out.collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["n_regionkey"]) for r in src.collect()
    )
    pruned = hn.read_hudi(spark, ph, partition_path="n_regionkey=3")
    assert pruned.count() == src.where("n_regionkey = 3").count()
    assert pruned.select("n_regionkey").distinct().collect()[0][0] == 3


def test_cm_round_trip_back_to_delta(spark, tmp_path):
    """cm Delta → Iceberg → Delta must publish a COLUMN-MAPPED Delta
    metaData (physical names from the Iceberg name mapping): a plain
    logical-name schema over physical-named parquet would read every
    column as NULL — the silent-wrong-data shape this module refuses
    everywhere else. Covers flat+DV, partitioned (pruning intact),
    and nested structs."""
    from datalakecrawler_spark.sources.convert import (
        convert_delta_to_iceberg as d2i,
        convert_iceberg_to_delta as i2d,
    )

    src = load(spark, SF_DIR, "nation")
    # flat + DV delete
    p1, p2, p3 = (str(tmp_path / x) for x in ("f_d", "f_i", "f_d2"))
    dn.write_delta_column_mapped(src, p1, "overwrite")
    dn.delete_delta(spark, p1, "n_nationkey = 9")
    d2i(spark, p1, p2)
    i2d(spark, p2, p3)
    got = sorted(r["n_nationkey"] for r in dn.read_delta(spark, p3).collect())
    assert got == sorted(set(range(25)) - {9})
    assert not any(
        r["n_name"] is None for r in dn.read_delta(spark, p3).collect()
    )
    # partitioned: values and pruning survive, keyed physically
    q1, q2, q3 = (str(tmp_path / x) for x in ("p_d", "p_i", "p_d2"))
    dn.write_delta_column_mapped(
        src, q1, "overwrite", partition_by=["n_regionkey"]
    )
    d2i(spark, q1, q2)
    i2d(spark, q2, q3)
    pr = dn.read_delta(spark, q3, partition_filter={"n_regionkey": "2"})
    assert pr.count() == src.where("n_regionkey = 2").count()
    # nested struct
    n1, n2, n3 = (str(tmp_path / x) for x in ("n_d", "n_i", "n_d2"))
    nested = src.select(
        "n_nationkey", F.struct(F.col("n_name").alias("nm")).alias("info")
    )
    dn.write_delta_column_mapped(nested, n1, "overwrite")
    d2i(spark, n1, n2)
    i2d(spark, n2, n3)
    got = sorted(
        (r["n_nationkey"], r["info"]["nm"])
        for r in dn.read_delta(spark, n3).collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["info"]["nm"]) for r in nested.collect()
    )


def test_equality_deletes_convert_with_compact_source_opt_in(spark, tmp_path):
    """convert_iceberg_to_delta(compact_source=True) composes the
    shipped minor compaction: equality deletes become positional on
    the SOURCE (one consented snapshot, data files untouched), then
    convert as DVs. Without the flag the gate still refuses."""
    pi, pd_ = str(tmp_path / "eq_i"), str(tmp_path / "eq_d")
    src = load(spark, SF_DIR, "nation")
    ice.write_iceberg(src, pi, "overwrite", format_version=2)
    ice.add_equality_deletes(
        spark, pi, spark.createDataFrame([(2,), (11,)], "n_nationkey int")
    )
    with pytest.raises(NotImplementedError, match="compact_source=True"):
        convert_iceberg_to_delta(spark, pi, pd_)
    res = convert_iceberg_to_delta(spark, pi, pd_, compact_source=True)
    assert res["files_copied"] == 0 and res["deleted_rows_converted"] == 2
    got = sorted(r["n_nationkey"] for r in dn.read_delta(spark, pd_).collect())
    assert got == sorted(set(range(25)) - {2, 11})
    # the source gained exactly one compaction snapshot, same rows
    assert sorted(
        r["n_nationkey"] for r in ice.read_iceberg(spark, pi).collect()
    ) == got


# -------------------------------------------------- r9 ADVICE closures


def test_append_onto_converted_cm_table_stages_physical_names(
    spark, tmp_path
):
    """ADVICE r8 (iceberg_native write_iceberg): appending onto a
    converted COLUMN-MAPPED table used to stage files under logical
    names while the persisted name mapping reads every file under the
    physical col-<uuid> names — silently serving NULL for every
    appended column. The append now stages its files under the
    mapping's physical names, so the name-mapped read resolves them
    like the converted files."""
    import pyarrow.parquet as pq

    src = load(spark, SF_DIR, "nation")
    pd_, pi = str(tmp_path / "cma"), str(tmp_path / "cma_ice")
    dn.write_delta_column_mapped(
        src.where("n_nationkey < 20"), pd_, "overwrite"
    )
    convert_delta_to_iceberg(spark, pd_, pi)
    ice.write_iceberg(
        src.where("n_nationkey >= 20"), pi, "append", format_version=2
    )
    out = ice.read_iceberg(spark, pi)
    assert out.columns == src.columns
    rows = {r["n_nationkey"]: r["n_name"] for r in out.collect()}
    assert sorted(rows) == list(range(25))
    assert all(v is not None for v in rows.values()), (
        "appended rows must serve real values, not the silent NULLs "
        "of a logical-named file under a physical name mapping"
    )
    # the appended file itself stores the PHYSICAL names
    new_files = glob.glob(os.path.join(pi, "data", "*.parquet"))
    assert new_files
    stored = set(pq.read_schema(new_files[0]).names)
    assert not stored & set(src.columns)


def test_append_onto_partitioned_converted_table_refused(spark, tmp_path):
    """A partitioned converted table's identity basePath is the SOURCE
    root — an appended file under this table's data/ would fail the
    basePath-ancestor check at scan; refuse at write time."""
    src = load(spark, SF_DIR, "nation")
    pd_, pi = str(tmp_path / "pc"), str(tmp_path / "pc_ice")
    dn.write_delta(src, pd_, "overwrite", partition_by=["n_regionkey"])
    convert_delta_to_iceberg(spark, pd_, pi)
    with pytest.raises(NotImplementedError, match="PARTITIONED converted"):
        ice.write_iceberg(
            src, pi, "append",
            partition_by=["n_regionkey"], format_version=2,
        )


def test_overwrite_onto_cm_converted_table_refused(spark, tmp_path):
    """Overwrite would re-key field ids against the persisted physical
    name mapping — refuse loudly instead of nulling."""
    src = load(spark, SF_DIR, "nation")
    pd_, pi = str(tmp_path / "cmo"), str(tmp_path / "cmo_ice")
    dn.write_delta_column_mapped(src, pd_, "overwrite")
    convert_delta_to_iceberg(spark, pd_, pi)
    with pytest.raises(NotImplementedError, match="physical"):
        ice.write_iceberg(src, pi, "overwrite", format_version=2)


def test_nested_cm_append_stages_physical_struct_members(spark, tmp_path):
    """Struct members rename through the same physical staging (one
    cast, the inverse of the scan's physical→logical projection)."""
    src = load(spark, SF_DIR, "nation")
    nested = src.select(
        "n_nationkey",
        F.struct(
            F.col("n_name").alias("nm"), F.col("n_regionkey").alias("rk")
        ).alias("info"),
    )
    pd_, pi = str(tmp_path / "ncma"), str(tmp_path / "ncma_ice")
    dn.write_delta_column_mapped(
        nested.where("n_nationkey < 15"), pd_, "overwrite"
    )
    convert_delta_to_iceberg(spark, pd_, pi)
    ice.write_iceberg(
        nested.where("n_nationkey >= 15"), pi, "append", format_version=2
    )
    got = sorted(
        (r["n_nationkey"], r["info"]["nm"], r["info"]["rk"])
        for r in ice.read_iceberg(spark, pi).collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["info"]["nm"], r["info"]["rk"])
        for r in nested.collect()
    )


def test_partitioned_absolute_delta_to_iceberg_refused(spark, tmp_path):
    """ADVICE r8 (convert.py): a partitioned Delta table whose adds
    are absolute paths (itself converted from Iceberg) has no hive
    dirs of its own — publishing Iceberg metadata over it would set
    dlc.convert.base-path to the WRONG root and every read would fail
    the basePath-ancestor check. The gate refuses, in dry_run too."""
    src = load(spark, SF_DIR, "nation")
    pi1 = str(tmp_path / "srcice")
    pd_ = str(tmp_path / "absd")
    pi2 = str(tmp_path / "absd_ice")
    ice.write_iceberg(
        src, pi1, "overwrite",
        partition_by=["n_regionkey"], format_version=2,
    )
    convert_iceberg_to_delta(spark, pi1, pd_)
    with pytest.raises(NotImplementedError, match="absolute path"):
        convert_delta_to_iceberg(spark, pd_, pi2, dry_run=True)
    with pytest.raises(NotImplementedError, match="absolute path"):
        convert_delta_to_iceberg(spark, pd_, pi2)
    assert not os.path.exists(os.path.join(pi2, "metadata"))


def test_mor_convert_with_compact_source_opt_in(spark, tmp_path):
    """convert_hudi_to_delta(compact_source=True) composes the shipped
    MoR compaction (one consented instant on the source, log backlog
    folded into new bases) then converts; without the flag the gate
    still refuses with the recipe."""
    from datalakecrawler_spark.sources import hudi_native as hn
    from datalakecrawler_spark.sources.convert import convert_hudi_to_delta

    ph = str(tmp_path / "mor_cs")
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi_mor(src, ph, "n_nationkey", "20240101000000",
                      op="bulk_insert")
    hn.write_hudi_mor(
        src.where("n_nationkey = 1").withColumn("n_name", F.lit("X")),
        ph, "n_nationkey", "20240102000000", op="upsert",
    )
    with pytest.raises(NotImplementedError, match="compact_source=True"):
        convert_hudi_to_delta(spark, ph, str(tmp_path / "d"))
    res = convert_hudi_to_delta(
        spark, ph, str(tmp_path / "d"), compact_source=True
    )
    assert res["rows"] == 25 and res["files_copied"] == 0
    got = {
        r["n_nationkey"]: r["n_name"]
        for r in dn.read_delta(spark, str(tmp_path / "d")).collect()
    }
    assert got[1] == "X" and len(got) == 25
    # the compaction instant landed on the SOURCE timeline,
    # deterministically as the successor of the latest instant
    tl = hn._mor_timeline(ph)
    assert ("20240102000001", "commit") in tl, tl


def test_nested_cm_delta_to_hudi(spark, tmp_path):
    """NESTED column-mapped Delta → Hudi (r9, VERDICT r8 missing #5):
    the conversion stores the logical schema alongside the flat
    rename map, and read_hudi casts each struct to its logical twin
    (positional member rename) after the top-level aliasing."""
    from datalakecrawler_spark.sources.convert import convert_delta_to_hudi
    from datalakecrawler_spark.sources import hudi_native as hn

    src = load(spark, SF_DIR, "nation")
    nested = src.select(
        "n_nationkey",
        F.struct(
            F.col("n_name").alias("nm"), F.col("n_regionkey").alias("rk")
        ).alias("info"),
    )
    pd_, ph = str(tmp_path / "ncmh"), str(tmp_path / "ncmh_hudi")
    dn.write_delta_column_mapped(nested, pd_, "overwrite")
    res = convert_delta_to_hudi(spark, pd_, ph)
    assert res["files_copied"] == 0
    out = hn.read_hudi(spark, ph)
    assert out.columns == ["n_nationkey", "info"]
    assert out.schema["info"].dataType.fieldNames() == ["nm", "rk"]
    got = sorted(
        (r["n_nationkey"], r["info"]["nm"], r["info"]["rk"])
        for r in out.collect()
    )
    assert got == sorted(
        (r["n_nationkey"], r["info"]["nm"], r["info"]["rk"])
        for r in nested.collect()
    )
    # dry_run reports ok now
    assert convert_delta_to_hudi(
        spark, pd_, str(tmp_path / "x"), dry_run=True
    )["ok"]
