"""Reader-feature tests for sources/delta_native.py round 8: TYPE
WIDENING (metadata-only ALTER COLUMN TYPE, PROTOCOL.md "Type
Widening"), VARIANT columns (variantType table feature over Spark 4's
VariantType), and COLUMN MAPPING mode=id (parquet field-id
resolution). Each pins the protocol action shape on disk, the
metadata-only guarantee (zero data files rewritten), and the
fail-loudly gates."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalakecrawler_spark.sources import delta_native as dn


def _data_files(path):
    return sorted(
        os.path.relpath(f, path)
        for f in glob.glob(
            os.path.join(path, "**", "part-*.parquet"), recursive=True
        )
    )


def _log_actions(path, version):
    with open(os.path.join(path, "_delta_log", f"{version:020d}.json")) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _schema_fields(path):
    _a, ss, *_ = dn._replay_full(path, None)
    return json.loads(ss)["fields"]


# ---------------------------------------------------------------- widening


@pytest.fixture()
def int_table(spark, tmp_path):
    path = str(tmp_path / "widen_tbl")
    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 2), (3, 30, 3)], "id long, qty int, ln int"
    )
    dn.write_delta(df.repartition(2), path, "overwrite")
    return path


def test_widen_is_metadata_only_and_promotes_old_files(spark, int_table):
    before = _data_files(int_table)
    v = dn.widen_delta_column(int_table, "qty", "long")
    assert v == 1
    assert _data_files(int_table) == before, "widen must not touch data"
    out = dn.read_delta(spark, int_table)
    assert isinstance(out.schema["qty"].dataType, T.LongType)
    # old int32 parquet pages promote natively under the wide schema
    assert sorted(r["qty"] for r in out.collect()) == [10, 20, 30]


def test_widen_append_beyond_int_range(spark, int_table):
    dn.widen_delta_column(int_table, "qty", "long")
    dn.write_delta(
        spark.createDataFrame([(4, 2**40, 4)], "id long, qty long, ln int"),
        int_table,
        "append",
    )
    vals = sorted(
        r["qty"] for r in dn.read_delta(spark, int_table).collect()
    )
    assert vals == [10, 20, 30, 2**40]


def test_widen_time_travel_serves_narrow_type(spark, int_table):
    dn.widen_delta_column(int_table, "qty", "long")
    old = dn.read_delta(spark, int_table, version=0)
    assert isinstance(old.schema["qty"].dataType, T.IntegerType)


def test_widen_protocol_and_provenance(spark, int_table):
    v = dn.widen_delta_column(int_table, "qty", "long")
    acts = _log_actions(int_table, v)
    prot = [a["protocol"] for a in acts if "protocol" in a][0]
    assert prot["minReaderVersion"] == 3
    assert "typeWidening" in prot["readerFeatures"]
    assert "typeWidening" in prot["writerFeatures"]
    f = [f for f in _schema_fields(int_table) if f["name"] == "qty"][0]
    assert f["metadata"]["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long", "tableVersion": v}
    ]


def test_widen_provenance_survives_append(spark, int_table):
    dn.widen_delta_column(int_table, "qty", "long")
    dn.write_delta(
        spark.createDataFrame([(4, 40, 4)], "id long, qty long, ln int"),
        int_table,
        "append",
    )
    f = [f for f in _schema_fields(int_table) if f["name"] == "qty"][0]
    assert f["metadata"].get("delta.typeChanges"), (
        "append re-commits metaData; the widening provenance must ride along"
    )


def test_widen_twice_accumulates_provenance(spark, tmp_path):
    path = str(tmp_path / "widen2")
    df = spark.sql("select cast(1 as byte) as b")
    dn.write_delta(df, path, "overwrite")
    dn.widen_delta_column(path, "b", "short")
    dn.widen_delta_column(path, "b", "integer")
    f = _schema_fields(path)[0]
    hops = f["metadata"]["delta.typeChanges"]
    assert [(h["fromType"], h["toType"]) for h in hops] == [
        ("byte", "short"),
        ("short", "integer"),
    ]
    assert [r["b"] for r in dn.read_delta(spark, path).collect()] == [1]


def test_widen_decimal_precision_growth(spark, tmp_path):
    path = str(tmp_path / "widen_dec")
    dn.write_delta(
        spark.sql("select cast(1.25 as decimal(5,2)) as d"), path, "overwrite"
    )
    dn.widen_delta_column(path, "d", "decimal(12,4)")
    out = dn.read_delta(spark, path)
    assert out.schema["d"].dataType == T.DecimalType(12, 4)
    assert float(out.collect()[0]["d"]) == 1.25


def test_widen_date_to_timestamp_ntz(spark, tmp_path):
    path = str(tmp_path / "widen_date")
    dn.write_delta(
        spark.sql("select date'2024-01-15' as dt"), path, "overwrite"
    )
    dn.widen_delta_column(path, "dt", "timestamp_ntz")
    out = dn.read_delta(spark, path)
    assert isinstance(out.schema["dt"].dataType, T.TimestampNTZType)
    assert str(out.collect()[0]["dt"]) == "2024-01-15 00:00:00"
    # the ntz-bearing schema also means the feature set carries both
    prot = dn._replay_full(path, None)[5]
    assert "typeWidening" in prot["readerFeatures"]


@pytest.mark.parametrize(
    "col,new_type,msg",
    [
        ("qty", "integer", "already has type"),
        ("id", "integer", "not a supported type widening"),  # long→int narrows
        ("id", "double", "not a supported type widening"),  # lossy above 2^53
        ("qty", "string", "not a supported type widening"),
        ("nope", "long", "no column"),
    ],
)
def test_widen_refusals(spark, int_table, col, new_type, msg):
    with pytest.raises(ValueError, match=msg):
        dn.widen_delta_column(int_table, col, new_type)


def test_widen_decimal_scale_shrink_refuses(spark, tmp_path):
    path = str(tmp_path / "widen_dec_bad")
    dn.write_delta(
        spark.sql("select cast(1.25 as decimal(5,2)) as d"), path, "overwrite"
    )
    with pytest.raises(ValueError, match="not a supported type widening"):
        dn.widen_delta_column(path, "d", "decimal(6,1)")


def test_widen_partition_column_refuses(spark, tmp_path):
    path = str(tmp_path / "widen_part")
    df = spark.createDataFrame([(1, 10)], "id long, bucket int")
    dn.write_delta(df, path, "overwrite", partition_by=["bucket"])
    with pytest.raises(ValueError, match="partition column"):
        dn.widen_delta_column(path, "bucket", "long")


def test_narrow_reappend_refuses_after_widen(spark, int_table):
    dn.widen_delta_column(int_table, "qty", "long")
    with pytest.raises(ValueError, match="type changes are not evolvable"):
        dn.write_delta(
            spark.createDataFrame([(5, 50, 5)], "id long, qty int, ln int"),
            int_table,
            "append",
        )


def test_widened_table_checkpoint_replay(spark, int_table):
    dn.widen_delta_column(int_table, "qty", "long")
    dn.write_delta(
        spark.createDataFrame([(4, 2**40, 4)], "id long, qty long, ln int"),
        int_table,
        "append",
    )
    dn.checkpoint_delta(int_table)
    out = dn.read_delta(spark, int_table)
    assert isinstance(out.schema["qty"].dataType, T.LongType)
    assert sorted(r["qty"] for r in out.collect()) == [10, 20, 30, 2**40]


# ----------------------------------------------------------------- variant


def _variant_df(spark):
    return spark.sql(
        """select id, parse_json(js) as v from values
           (1, '{"a": 1, "tag": "x"}'),
           (2, '{"a": 2, "tag": "y"}') as t(id, js)"""
    )


def test_variant_write_declares_feature_and_reads_back(spark, tmp_path):
    path = str(tmp_path / "var_tbl")
    dn.write_delta(_variant_df(spark), path, "overwrite")
    prot = [a["protocol"] for a in _log_actions(path, 0) if "protocol" in a][0]
    assert prot["minReaderVersion"] == 3
    assert "variantType" in prot["readerFeatures"]
    out = dn.read_delta(spark, path)
    assert isinstance(out.schema["v"].dataType, T.VariantType)
    got = sorted(
        (r["id"], r["a"], r["tag"])
        for r in out.select(
            "id",
            F.variant_get("v", "$.a", "int").alias("a"),
            F.variant_get("v", "$.tag", "string").alias("tag"),
        ).collect()
    )
    assert got == [(1, 1, "x"), (2, 2, "y")]


def test_variant_file_stats_fail_soft(spark, tmp_path):
    # pyarrow cannot parse VARIANT footers; the add action must still
    # carry VALID (empty) stats rather than crash or lie
    path = str(tmp_path / "var_stats")
    dn.write_delta(_variant_df(spark).coalesce(1), path, "overwrite")
    active, *_ = dn._replay_full(path, None)
    (add,) = active.values()
    stats = json.loads(add["stats"])
    assert stats["minValues"] == {} and "numRecords" not in stats


def test_variant_merge_schema_append_upgrades_protocol(spark, tmp_path):
    path = str(tmp_path / "var_evolve")
    dn.write_delta(
        spark.createDataFrame([(7,)], "id int"), path, "overwrite"
    )
    v = dn.write_delta(
        _variant_df(spark), path, "append", merge_schema=True
    )
    prot = [a["protocol"] for a in _log_actions(path, v) if "protocol" in a][0]
    assert "variantType" in prot["readerFeatures"], (
        "first variant column arriving via merge_schema must upgrade "
        "the protocol in the same commit"
    )
    out = dn.read_delta(spark, path)
    assert out.where("v is null").count() == 1  # the pre-evolution row


# ------------------------------------------------------- column mapping id


@pytest.fixture()
def id_table(spark, tmp_path):
    path = str(tmp_path / "cmid_tbl")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    dn.write_delta_column_mapped(df.coalesce(1), path, "overwrite", cm_mode="id")
    return path


def test_cm_id_footers_carry_field_ids(spark, id_table):
    import pyarrow.parquet as pq

    (f,) = glob.glob(os.path.join(id_table, "part-*.parquet"))
    sch = pq.read_schema(f)
    ids = {
        sch.field(i).name: sch.field(i).metadata.get(b"PARQUET:field_id")
        for i in range(len(sch))
    }
    assert all(name.startswith("col-") for name in ids), ids
    assert sorted(int(v) for v in ids.values()) == [1, 2, 3]
    conf = dn._replay_full(id_table, None)[4]
    assert conf["delta.columnMapping.mode"] == "id"


def test_cm_id_reads_logical_names(spark, id_table):
    out = dn.read_delta(spark, id_table)
    assert out.columns == ["k", "s", "v"]
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 3]


def test_cm_id_survives_foreign_rename_of_physical_columns(spark, id_table):
    """The id-mode contract: a foreign engine may rewrite a data file
    under ARBITRARY column names as long as the parquet field ids are
    kept — readers resolve by id, so the table stays correct where
    name-mode matching would serve all-NULLs."""
    fields = _schema_fields(id_table)
    ids = {
        f["name"]: f["metadata"]["delta.columnMapping.id"] for f in fields
    }
    wschema = T.StructType(
        [
            T.StructField("totally", T.IntegerType(), True,
                          {"parquet.field.id": ids["k"]}),
            T.StructField("different", T.StringType(), True,
                          {"parquet.field.id": ids["s"]}),
            T.StructField("names", T.DoubleType(), True,
                          {"parquet.field.id": ids["v"]}),
        ]
    )
    rows = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "x int, y string, z double",
    )
    foreign = spark.createDataFrame(rows.rdd, wschema).coalesce(1)
    stage = os.path.join(id_table, "_foreign_stage")
    foreign.write.mode("overwrite").parquet(stage)
    (src,) = glob.glob(os.path.join(stage, "part-*.parquet"))
    (dst,) = glob.glob(os.path.join(id_table, "part-*.parquet"))
    os.replace(src, dst)
    out = dn.read_delta(spark, id_table)
    got = sorted((r["k"], r["s"], r["v"]) for r in out.collect())
    assert got == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_cm_id_rename_and_delete(spark, id_table):
    before = _data_files(id_table)
    dn.rename_delta_column(id_table, "v", "value")
    assert _data_files(id_table) == before
    res = dn.delete_delta(spark, id_table, "k = 2")
    assert res["rows_deleted"] == 1
    out = dn.read_delta(spark, id_table)
    assert sorted(r["k"] for r in out.collect()) == [1, 3]
    assert "value" in out.columns


def test_cm_id_append_reuses_mapping(spark, id_table):
    df = spark.createDataFrame([(4, "d", 40.0)], "k int, s string, v double")
    dn.write_delta_column_mapped(df, id_table, "append", cm_mode="id")
    assert sorted(
        r["k"] for r in dn.read_delta(spark, id_table).collect()
    ) == [1, 2, 3, 4]


def test_cm_mode_mismatch_refuses(spark, id_table, tmp_path):
    df = spark.createDataFrame([(4, "d", 40.0)], "k int, s string, v double")
    with pytest.raises(ValueError, match="mode is fixed at table creation"):
        dn.write_delta_column_mapped(df, id_table, "append", cm_mode="name")
    with pytest.raises(ValueError, match="cm_mode must be"):
        dn.write_delta_column_mapped(
            df, str(tmp_path / "bad"), "overwrite", cm_mode="wat"
        )


# ------------------------------------------- optimize of partitioned clone


def test_optimize_partitioned_clone(spark, tmp_path):
    from datalakecrawler_spark.io import load
    from tests.conftest import SF_DIR

    src_path = str(tmp_path / "clone_src")
    dst_path = str(tmp_path / "clone_dst")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(
        src.repartition(4), src_path, "overwrite", partition_by=["n_regionkey"]
    )
    src_files = _data_files(src_path)
    dn.clone_delta(spark, src_path, dst_path)
    active0, *_ = dn._replay(dst_path, None)
    assert all(os.path.isabs(r) for r in active0)
    res = dn.optimize_delta(spark, dst_path)
    assert res["files_compacted"] == len(active0)
    active1, *_ = dn._replay(dst_path, None)
    # every compacted add is a relative hive path under the clone root
    assert all(not os.path.isabs(r) for r in active1)
    assert all(r.startswith("n_regionkey=") for r in active1), active1
    # partitionValues re-derived from the new dirs
    assert all(
        a["partitionValues"].get("n_regionkey") is not None
        for a in active1.values()
    )
    # source untouched, clone correct, pruning works
    assert _data_files(src_path) == src_files
    got = sorted(
        r[0] for r in dn.read_delta(spark, dst_path).select("n_nationkey").collect()
    )
    assert got == list(range(25))
    pruned = dn.read_delta(spark, dst_path, partition_filter={"n_regionkey": "0"})
    assert pruned.count() == src.where("n_regionkey = 0").count()
    # time travel to the zero-copy layout still reads
    assert dn.read_delta(spark, dst_path, version=0).count() == 25


def test_optimize_clone_after_local_append_mixed_layout(spark, tmp_path):
    """A clone that took a LOCAL append has groups mixing absolute
    (cloned) and relative (appended) files — the rewrite must land
    everything under the clone root."""
    from datalakecrawler_spark.io import load
    from tests.conftest import SF_DIR

    src_path = str(tmp_path / "mixed_src")
    dst_path = str(tmp_path / "mixed_dst")
    src = load(spark, SF_DIR, "nation")
    dn.write_delta(src, src_path, "overwrite", partition_by=["n_regionkey"])
    dn.clone_delta(spark, src_path, dst_path)
    extra = src.where("n_regionkey = 2").withColumn(
        "n_nationkey", F.col("n_nationkey") + 100
    )
    dn.write_delta(extra, dst_path, "append", partition_by=["n_regionkey"])
    active0, *_ = dn._replay(dst_path, None)
    kinds = {os.path.isabs(r) for r in active0}
    assert kinds == {True, False}, "fixture must mix clone + local files"
    dn.optimize_delta(spark, dst_path)
    active1, *_ = dn._replay(dst_path, None)
    # the MIXED group (region 2: cloned + appended files) compacted to
    # relative clone-root files; untouched singleton groups rightly
    # keep their zero-copy absolute reference
    r2 = {
        r: a
        for r, a in active1.items()
        if a["partitionValues"].get("n_regionkey") == "2"
    }
    assert r2 and all(not os.path.isabs(r) for r in r2)
    got = sorted(
        r[0]
        for r in dn.read_delta(spark, dst_path)
        .where("n_regionkey = 2")
        .select("n_nationkey")
        .collect()
    )
    base = sorted(r[0] for r in src.where("n_regionkey = 2").select("n_nationkey").collect())
    assert got == sorted(base + [k + 100 for k in base])


# ------------------------------------------------ generated columns (r9)


def test_generated_columns_compute_verify_and_prune(spark, tmp_path):
    """write_delta_generated stamps delta.generationExpression and the
    writer-only generatedColumns feature; plain appends compute a
    missing generated column from the stored expression, verify a
    supplied one, and partition pruning works on the derived column."""
    from datalakecrawler_spark.io import load
    from tests.conftest import SF_DIR

    src = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    path = str(tmp_path / "gen")
    dn.write_delta_generated(
        src.where("o_orderkey % 2 = 0"), path, "overwrite",
        generation={"o_month": "month(o_orderdate)"},
        partition_by=["o_month"],
    )
    prot = [a["protocol"] for a in _log_actions(path, 0) if "protocol" in a][0]
    assert prot["minWriterVersion"] == 7
    assert "generatedColumns" in prot["writerFeatures"]
    # writer-only: generatedColumns never rides in readerFeatures
    assert "generatedColumns" not in (prot.get("readerFeatures") or [])
    f = [f for f in _schema_fields(path) if f["name"] == "o_month"][0]
    assert f["metadata"]["delta.generationExpression"] == (
        "month(o_orderdate)"
    )
    # plain append without the column: computed
    dn.write_delta(
        src.where("o_orderkey % 2 = 1"), path, "append",
        partition_by=["o_month"],
    )
    out = dn.read_delta(spark, path)
    assert out.count() == src.count()
    assert out.where("o_month <> month(o_orderdate)").count() == 0
    # supplying contradicting values refuses
    with pytest.raises(ValueError, match="contradict"):
        dn.write_delta(
            src.limit(5).withColumn("o_month", F.lit(99)),
            path, "append", partition_by=["o_month"],
        )
    with pytest.raises(ValueError, match="contradict"):
        dn.write_delta_generated(
            src.limit(5).withColumn("o_month", F.lit(99)),
            str(tmp_path / "gen2"), "overwrite",
            generation={"o_month": "month(o_orderdate)"},
        )
    # pruning on the generated column
    pr = dn.read_delta(spark, path, partition_filter={"o_month": "3"})
    assert pr.count() == src.where("month(o_orderdate) = 3").count()
