"""Native Hudi CoW tests (sources/hudi_native.py): on-disk timeline
conformance with the public layout (.hoodie instants, base-file
naming, _hoodie_* meta columns), upsert merge semantics, partial
file-group rewrite (the CoW selling point), time travel, and the
capability / monotonicity gates. The registered ops are additionally
oracle-checked by test_registry_parity."""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.sources.hudi_native import (
    _META_COLS,
    _N_BUCKETS,
    hudi_timeline,
    read_hudi,
    read_hudi_incremental,
    write_hudi,
)
from tests.conftest import SF_DIR

_T1 = "19700101000000001"
_T2 = "19700101000000002"

# base-file name: <uuid>-<bucket>_<writeToken>_<instant>.parquet
_BASE_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    r"-(\d+)_0-0-0_(\d{17})\.parquet$"
)


@pytest.fixture()
def table(spark, tmp_path):
    """bulk_insert of the F orders at T1, then one upsert commit at T2
    that updates the even keys (price * 1.1) and inserts the P orders."""
    path = str(tmp_path / "hudi_tbl")
    src = load(spark, SF_DIR, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi(base, path, "o_orderkey", _T1, op="bulk_insert")
    changes = (
        src.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(src.where(F.col("o_orderstatus") == "P"))
    )
    write_hudi(changes, path, "o_orderkey", _T2, op="upsert")
    return path, src


def test_timeline_layout(table):
    path, _ = table
    tdir = os.path.join(path, ".hoodie")
    names = set(os.listdir(tdir))
    assert "hoodie.properties" in names
    assert f"{_T1}.commit" in names and f"{_T2}.commit" in names
    # state-machine markers are cleaned up after completion
    assert not any(n.endswith((".inflight", ".requested")) for n in names)
    props = dict(
        line.strip().split("=", 1)
        for line in open(os.path.join(tdir, "hoodie.properties"))
    )
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.recordkey.fields"] == "o_orderkey"
    meta = json.load(open(os.path.join(tdir, f"{_T2}.commit")))
    assert meta["operationType"] == "UPSERT"
    stats = meta["partitionToWriteStats"][""]
    assert all(s["numWrites"] > 0 for s in stats)
    assert sum(s["numUpdateWrites"] for s in stats) > 0


def test_base_file_naming_and_meta_columns(spark, table):
    path, _ = table
    files = [
        os.path.basename(f)
        for f in glob.glob(os.path.join(path, "*.parquet"))
    ]
    assert files and all(_BASE_RE.match(f) for f in files)
    raw = spark.read.parquet(os.path.join(path, files[0]))
    assert set(_META_COLS) <= set(raw.columns)
    row = raw.limit(1).collect()[0]
    assert row["_hoodie_record_key"] == str(row["o_orderkey"])
    assert row["_hoodie_partition_path"] == ""
    assert row["_hoodie_file_name"] in files
    # the stamped file name is the file the record actually lives in
    got = raw.select("_hoodie_file_name").distinct().collect()
    assert [r[0] for r in got] == [files[0].rsplit("/", 1)[-1]] or len(got) == 1


def test_upsert_merge_semantics(spark, table):
    path, src = table
    out = read_hudi(spark, path)
    f = src.where(F.col("o_orderstatus") == "F")
    p = src.where(F.col("o_orderstatus") == "P")
    assert out.count() == f.count() + p.count()
    # even keys carry the updated price, odd keys the original
    joined = (
        out.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.col("o_totalprice").alias("new_price"))
        .join(f.select("o_orderkey", "o_totalprice"), "o_orderkey")
    )
    bad = joined.where(
        (
            (F.col("o_orderkey") % 2 == 0)
            & (F.abs(F.col("new_price") - F.col("o_totalprice") * 1.1) > 1e-6)
        )
        | (
            (F.col("o_orderkey") % 2 == 1)
            & (F.col("new_price") != F.col("o_totalprice"))
        )
    ).count()
    assert bad == 0
    # no duplicate keys survive the merge
    assert out.select("o_orderkey").distinct().count() == out.count()


def test_upsert_rewrites_only_affected_file_groups(spark, tmp_path):
    """CoW economy: an upsert touching keys in ONE bucket must rewrite
    exactly that file group; every other group keeps serving its T1
    base file."""
    path = str(tmp_path / "hudi_partial")
    src = load(spark, SF_DIR, "orders").limit(2000)
    write_hudi(src, path, "o_orderkey", _T1, op="bulk_insert")
    one_key = src.select("o_orderkey").limit(1).collect()[0][0]
    changes = src.where(F.col("o_orderkey") == one_key).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    write_hudi(changes, path, "o_orderkey", _T2, op="upsert")
    meta = json.load(
        open(os.path.join(path, ".hoodie", f"{_T2}.commit"))
    )
    stats = meta["partitionToWriteStats"][""]
    assert len(stats) == 1, "one bucket touched -> one file group rewritten"
    assert stats[0]["prevCommit"] == _T1
    # reader serves T1 files for the other groups + the one T2 file
    t1_files = {
        s["path"]
        for s in json.load(
            open(os.path.join(path, ".hoodie", f"{_T1}.commit"))
        )["partitionToWriteStats"][""]
    }
    out = read_hudi(spark, path)
    assert out.count() == 2000
    assert out.where(F.col("o_orderkey") == one_key).collect()[0][
        "o_totalprice"
    ] == 0.0
    # superseded base file still on disk (time travel needs it)
    assert all(os.path.exists(os.path.join(path, f)) for f in t1_files)


def test_time_travel(spark, table):
    path, src = table
    f = src.where(F.col("o_orderstatus") == "F")
    at1 = read_hudi(spark, path, as_of=_T1)
    assert at1.count() == f.count()
    # pre-upsert prices intact at T1
    assert (
        at1.agg(F.sum("o_totalprice")).collect()[0][0]
        == pytest.approx(f.agg(F.sum("o_totalprice")).collect()[0][0])
    )
    tl = hudi_timeline(path)
    assert [t["instant"] for t in tl] == [_T1, _T2]
    assert [t["operation"] for t in tl] == ["BULK_INSERT", "UPSERT"]


def test_copied_forward_records_keep_their_commit_time(spark, table):
    """CoW rewrites whole file groups, but unchanged records copied
    into the new base file must retain their ORIGINAL commit time —
    the invariant incremental queries depend on."""
    path, src = table
    t2_files = [
        os.path.join(path, s["path"])
        for s in json.load(
            open(os.path.join(path, ".hoodie", f"{_T2}.commit"))
        )["partitionToWriteStats"][""]
    ]
    raw = spark.read.parquet(*t2_files)
    # odd-keyed F orders were copied forward -> still stamped T1
    odd = raw.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 1)
    )
    assert odd.count() > 0
    assert odd.where(F.col("_hoodie_commit_time") != _T1).count() == 0
    # updated/inserted records carry T2
    changed = raw.where(
        (F.col("o_orderstatus") == "P") | (F.col("o_orderkey") % 2 == 0)
    )
    assert changed.where(F.col("_hoodie_commit_time") != _T2).count() == 0


def test_incremental_query_returns_exact_changeset(spark, table):
    path, src = table
    inc = read_hudi_incremental(spark, path, from_instant=_T1, to_instant=_T2)
    n_changed = (
        src.where(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0)
        ).count()
        + src.where(F.col("o_orderstatus") == "P").count()
    )
    assert inc.count() == n_changed
    assert inc.where(F.col("_hoodie_commit_time") != _T2).count() == 0
    # copied-forward odd-F records must NOT leak into the changeset
    assert (
        inc.where(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 1)
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="no completed instants"):
        read_hudi_incremental(spark, path, from_instant=_T2)


def test_gates(spark, tmp_path):
    path = str(tmp_path / "hudi_gates")
    src = load(spark, SF_DIR, "orders").limit(100)
    write_hudi(src, path, "o_orderkey", _T2, op="bulk_insert")
    # timeline must be monotonic
    with pytest.raises(ValueError, match="monotonic"):
        write_hudi(src, path, "o_orderkey", _T1, op="upsert")
    # bulk_insert into a non-empty table
    with pytest.raises(ValueError, match="non-empty"):
        write_hudi(src, path, "o_orderkey", "19700101000000003", op="bulk_insert")
    # MERGE_ON_READ tables are honestly refused
    open(
        os.path.join(path, ".hoodie", "19700101000000004.deltacommit"), "w"
    ).close()
    with pytest.raises(NotImplementedError, match="COPY_ON_WRITE"):
        read_hudi(spark, path)
    os.remove(os.path.join(path, ".hoodie", "19700101000000004.deltacommit"))
    # as_of before the first instant
    with pytest.raises(ValueError, match="no completed instants"):
        read_hudi(spark, path, as_of="19700101000000000")


def test_bucket_routing_is_stable(spark, table):
    """Every record's file lands in the bucket its key hashes to —
    re-deriving the bucket from the stored record key must match the
    bucket encoded in the base-file name (the arithmetic index is the
    reason upserts need no lookup table)."""
    path, _ = table
    raw = spark.read.parquet(
        *glob.glob(os.path.join(path, "*.parquet"))
    ).select("_hoodie_record_key", "_hoodie_file_name")
    derived = raw.withColumn(
        "bucket", F.pmod(F.crc32(F.col("_hoodie_record_key")), F.lit(_N_BUCKETS))
    ).withColumn(
        "named",
        F.regexp_extract(
            "_hoodie_file_name", r"-(\d+)_0-0-0_", 1
        ).cast("int"),
    )
    assert derived.where(F.col("bucket") != F.col("named")).count() == 0


def test_partitioned_layout_and_bounded_upsert(spark, tmp_path):
    """Partitioned tables: base files under <value>/ with partition
    metadata, file groups per (partition, bucket), upsert rewrites
    only the touched partition's groups, partition-pruned reads list
    only that partition's files, and the partitioning is fixed."""
    path = str(tmp_path / "hudi_part")
    src = load(spark, SF_DIR, "customer")
    write_hudi(
        src, path, "c_custkey", _T1, op="bulk_insert",
        partition_by="c_mktsegment",
    )
    segs = [r[0] for r in src.select("c_mktsegment").distinct().collect()]
    for s in segs:
        assert os.path.isdir(os.path.join(path, s))
        assert os.path.exists(
            os.path.join(path, s, ".hoodie_partition_metadata")
        )
    # meta column records the real partition path
    one = glob.glob(os.path.join(path, segs[0], "*.parquet"))[0]
    raw = spark.read.parquet(one)
    assert raw.select("_hoodie_partition_path").distinct().collect()[0][0] == segs[0]

    before = {
        f for f in glob.glob(os.path.join(path, "*", "*.parquet"))
    }
    changes = src.where(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.lit(0.0)
    )
    write_hudi(
        changes, path, "c_custkey", _T2, op="upsert",
        partition_by="c_mktsegment",
    )
    meta = json.load(open(os.path.join(path, ".hoodie", f"{_T2}.commit")))
    assert set(meta["partitionToWriteStats"]) == {"BUILDING"}
    # other partitions' files untouched on disk
    after_others = {
        f
        for f in glob.glob(os.path.join(path, "*", "*.parquet"))
        if "/BUILDING/" not in f
    }
    assert after_others == {f for f in before if "/BUILDING/" not in f}

    out = read_hudi(spark, path)
    assert out.count() == src.count()
    pruned = read_hudi(spark, path, partition_path="BUILDING")
    assert pruned.count() == changes.count()
    assert pruned.where(F.col("c_acctbal") != 0.0).count() == 0
    assert all("/BUILDING/" in f for f in pruned.inputFiles())

    with pytest.raises(ValueError, match="partitioning is fixed"):
        write_hudi(src.limit(5), path, "c_custkey", "19700101000000003")
    with pytest.raises(ValueError, match="no file slices"):
        read_hudi(spark, path, partition_path="NOPE")


def test_instant_claim_is_exclusive(spark, tmp_path):
    """A second writer claiming an already-requested instant fails at
    the claim (O_EXCL marker), before touching any base files."""
    path = str(tmp_path / "hudi_claim")
    src = load(spark, SF_DIR, "nation")
    write_hudi(src, path, "n_nationkey", _T1, op="bulk_insert")
    # simulate a writer mid-flight on _T2
    open(os.path.join(path, ".hoodie", f"{_T2}.commit.requested"), "w").close()
    with pytest.raises(RuntimeError, match="already claimed"):
        write_hudi(src.limit(5), path, "n_nationkey", _T2, op="upsert")


def test_mor_timeline_slices_and_views(spark, tmp_path):
    """MoR layout: data writes publish .deltacommit instants, upserts
    append logfile-*.parquet (bases untouched), slices track the log
    backlog, snapshot merges latest-wins while read-optimized serves
    bases, time travel and incremental stay exact, and compaction
    (.commit) folds logs into new bases preserving commit times."""
    import glob as _glob

    from datalakecrawler_spark.sources import hudi_native as hn

    path = str(tmp_path / "mor_tbl")
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi_mor(src, path, "n_nationkey", _T1, op="bulk_insert")
    upd = src.where("n_nationkey < 5").withColumn(
        "n_regionkey", F.col("n_regionkey") + 100
    )
    hn.write_hudi_mor(upd, path, "n_nationkey", _T2, op="upsert")

    tdir = os.path.join(path, ".hoodie")
    assert os.path.exists(os.path.join(tdir, f"{_T1}.deltacommit"))
    assert os.path.exists(os.path.join(tdir, f"{_T2}.deltacommit"))
    assert not _glob.glob(os.path.join(tdir, "*.requested"))
    assert not _glob.glob(os.path.join(tdir, "*.inflight"))
    logs = _glob.glob(os.path.join(path, "logfile-*.log.*.parquet"))
    assert logs, "upsert must append log files"

    slices = hn._mor_slices_at(path)
    with_logs = {k: v for k, v in slices.items() if v["logs"]}
    assert with_logs and all(v["base_instant"] == _T1 for v in slices.values())

    snap = hn.read_hudi(spark, path)
    assert snap.count() == 25
    bumped = {r[0] for r in snap.where("n_regionkey >= 100").select("n_nationkey").collect()}
    assert bumped == {0, 1, 2, 3, 4}
    ro = hn.read_hudi(spark, path, view="read_optimized")
    assert ro.where("n_regionkey >= 100").count() == 0  # stale by design
    assert hn.read_hudi(spark, path, as_of=_T1).where("n_regionkey >= 100").count() == 0

    inc = hn.read_hudi_incremental(spark, path, from_instant=_T1)
    assert inc.count() == 5
    assert {r[0] for r in inc.select("n_nationkey").collect()} == bumped

    res = hn.compact_hudi_mor(spark, path, "19700101000000003")
    assert res["compacted_groups"] == len(with_logs)
    assert os.path.exists(os.path.join(tdir, "19700101000000003.commit"))
    slices2 = hn._mor_slices_at(path)
    assert all(not v["logs"] for v in slices2.values())
    snap2 = hn.read_hudi(spark, path)
    ro2 = hn.read_hudi(spark, path, view="read_optimized")
    assert snap2.count() == ro2.count() == 25
    assert {r[0] for r in ro2.where("n_regionkey >= 100").select("n_nationkey").collect()} == bumped
    # compaction preserves original commit times → incremental unchanged
    inc2 = hn.read_hudi_incremental(spark, path, from_instant=_T1)
    assert inc2.count() == 5
    # timeline records the three operations with MoR actions
    ops = [t["operation"] for t in hn.hudi_timeline(path)]
    assert ops == ["BULK_INSERT", "UPSERT", "COMPACT"]


def test_mor_gates_and_occ(spark, tmp_path):
    """Type mismatches refuse (CoW writer on MoR table and vice
    versa); upsert into empty MoR refuses; non-monotonic instants
    refuse and release the claim; compaction is a no-op without
    logs."""
    from datalakecrawler_spark.sources import hudi_native as hn

    src = load(spark, SF_DIR, "region")
    p1 = str(tmp_path / "mor_g")
    hn.write_hudi_mor(src, p1, "r_regionkey", _T1, op="bulk_insert")
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        write_hudi(src, p1, "r_regionkey", _T2, op="upsert")
    p2 = str(tmp_path / "cow_g")
    write_hudi(src, p2, "r_regionkey", _T1, op="bulk_insert")
    with pytest.raises(ValueError, match="COPY_ON_WRITE"):
        hn.write_hudi_mor(src, p2, "r_regionkey", _T2, op="upsert")
    p3 = str(tmp_path / "mor_empty")
    with pytest.raises(ValueError, match="bulk_insert first"):
        hn.write_hudi_mor(src, p3, "r_regionkey", _T1, op="upsert")
    # non-monotonic instant refuses and does NOT burn the marker
    with pytest.raises(ValueError, match="monotonic"):
        hn.write_hudi_mor(src, p1, "r_regionkey", _T1, op="upsert")
    import glob as _glob

    assert not _glob.glob(os.path.join(p1, ".hoodie", "*.requested"))
    # no logs → compaction no-op, no instant claimed
    res = hn.compact_hudi_mor(spark, p1, _T2)
    assert res == {"instant": None, "compacted_groups": 0}


def test_mor_partitioned_upsert_scope(spark, tmp_path):
    """Partitioned MoR: log files land under the partition dirs, an
    upsert's deltacommit touches only the partitions its keys map to,
    snapshot/RO views respect the merge, and compaction rebuilds only
    the logged groups in place."""
    from datalakecrawler_spark.sources import hudi_native as hn

    path = str(tmp_path / "mor_part")
    src = load(spark, SF_DIR, "customer")
    hn.write_hudi_mor(src, path, "c_custkey", _T1, op="bulk_insert",
                      partition_by="c_mktsegment")
    changes = src.where("c_mktsegment = 'BUILDING'").withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000
    )
    hn.write_hudi_mor(changes, path, "c_custkey", _T2, op="upsert",
                      partition_by="c_mktsegment")
    meta = json.load(open(os.path.join(path, ".hoodie", f"{_T2}.deltacommit")))
    assert set(meta["partitionToWriteStats"]) == {"BUILDING"}
    import glob as _glob

    logs = _glob.glob(os.path.join(path, "*", "logfile-*.parquet"))
    assert logs and all("/BUILDING/" in f for f in logs)
    snap = hn.read_hudi(spark, path, partition_path="BUILDING")
    n_b = src.where("c_mktsegment = 'BUILDING'").count()
    assert snap.count() == n_b
    want = src.where("c_mktsegment = 'BUILDING'").agg(
        F.round(F.sum(F.col("c_acctbal") + 1000), 2)
    ).collect()[0][0]
    got = snap.agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0]
    assert got == want
    res = hn.compact_hudi_mor(spark, path, "19700101000000003")
    assert res["compacted_groups"] == len(
        {k for k, v in hn._mor_slices_at(path).items() if k[0] == "BUILDING"}
    ) or res["compacted_groups"] > 0
    ro = hn.read_hudi(spark, path, view="read_optimized",
                      partition_path="BUILDING")
    assert ro.agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0] == want
    # untouched partitions still serve their original slices
    other = hn.read_hudi(spark, path, partition_path="MACHINERY")
    assert other.count() == src.where("c_mktsegment = 'MACHINERY'").count()


def test_clean_mor_and_gates(spark, tmp_path):
    """Cleaner on MoR: retained slices keep base + logs; superseded
    bases from compaction are reclaimed; non-monotonic clean instants
    refuse; the snapshot stays exact after cleaning."""
    from datalakecrawler_spark.sources import hudi_native as hn

    path = str(tmp_path / "mor_clean")
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi_mor(src, path, "n_nationkey", _T1, op="bulk_insert")
    upd = src.where("n_nationkey < 5").withColumn(
        "n_regionkey", F.col("n_regionkey") + 100
    )
    hn.write_hudi_mor(upd, path, "n_nationkey", _T2, op="upsert")
    hn.compact_hudi_mor(spark, path, "19700101000000003")
    import glob as _glob

    with pytest.raises(ValueError, match="monotonic"):
        hn.clean_hudi(path, _T1)
    res = hn.clean_hudi(path, "19700101000000004", retain_commits=1)
    # compaction rebuilt the logged groups: their old bases + logs die
    assert res["files_deleted"] > 0
    assert not _glob.glob(os.path.join(path, "logfile-*.parquet"))
    snap = hn.read_hudi(spark, path)
    assert snap.count() == 25
    assert {r[0] for r in snap.where("n_regionkey >= 100").select("n_nationkey").collect()} == {0, 1, 2, 3, 4}


def test_delete_rewrites_only_affected_groups(spark, tmp_path):
    """DELETE by key: survivors keep their original commit time, only
    affected file groups rewrite, and a fully-emptied group publishes
    an empty shadowing slice instead of resurrecting rows."""
    from datalakecrawler_spark.sources.hudi_native import (
        _slices_at,
        read_hudi,
        write_hudi,
    )

    path = str(tmp_path / "hudi_del")
    src = load(spark, SF_DIR, "nation")
    write_hudi(src, path, "n_nationkey", _T1, op="bulk_insert")
    before = _slices_at(path, None)
    # delete two keys — their buckets rewrite, others don't
    dels = src.where("n_nationkey in (2, 7)").select("n_nationkey")
    write_hudi(dels, path, "n_nationkey", _T2, op="delete")
    after = _slices_at(path, None)
    changed = {k for k in after if after[k] != before.get(k)}
    assert 1 <= len(changed) <= 2  # both keys may share a bucket
    back = read_hudi(spark, path)
    keys = sorted(r[0] for r in back.select("n_nationkey").collect())
    assert keys == sorted(set(range(25)) - {2, 7})
    # survivors keep their original commit time
    raw = spark.read.parquet(
        *[path + "/" + rel for _, rel in after.values()]
    )
    assert (
        raw.where("_hoodie_commit_time = '" + _T2 + "'").count() == 0
    ), "delete must not restamp survivors"
    # time travel to the pre-delete instant
    assert read_hudi(spark, path, as_of=_T1).count() == 25


def test_delete_validation_and_empty_groups(spark, tmp_path):
    from datalakecrawler_spark.sources.hudi_native import (
        read_hudi,
        write_hudi,
    )

    path = str(tmp_path / "hudi_del_part")
    src = load(spark, SF_DIR, "nation")
    write_hudi(
        src, path, "n_nationkey", _T1,
        op="bulk_insert", partition_by="n_name",
    )
    # partitioned delete keys must carry the partition column
    with pytest.raises(ValueError, match="delete keys must carry"):
        write_hudi(
            src.select("n_nationkey"), path, "n_nationkey", _T2,
            op="delete", partition_by="n_name",
        )
    # single-row partitions: deleting the row empties its group; the
    # shadow slice must hide it
    dels = src.where("n_nationkey = 3").select("n_nationkey", "n_name")
    write_hudi(
        dels, path, "n_nationkey", _T2,
        op="delete", partition_by="n_name",
    )
    back = read_hudi(spark, path)
    assert back.count() == 24
    assert back.where("n_nationkey = 3").count() == 0
    # unknown keys → loud error, not a silent empty commit
    with pytest.raises(ValueError, match="match no live file group"):
        write_hudi(
            spark.createDataFrame([(999, "NOWHERE")], "n_nationkey int, n_name string"),
            path, "n_nationkey", "19700101000000003",
            op="delete", partition_by="n_name",
        )


def test_savepoint_pins_against_cleaner(spark, tmp_path):
    from datalakecrawler_spark.sources.hudi_native import (
        clean_hudi,
        read_hudi,
        release_savepoint_hudi,
        savepoint_hudi,
        write_hudi,
    )

    path = str(tmp_path / "hudi_sp")
    src = load(spark, SF_DIR, "nation")
    write_hudi(src, path, "n_nationkey", _T1, op="bulk_insert")
    write_hudi(
        src.withColumn("n_name", F.upper("n_name")),
        path, "n_nationkey", _T2, op="upsert",
    )
    with pytest.raises(ValueError, match="not a completed instant"):
        savepoint_hudi(path, "19700101000000003", at_instant="19700101000000009")
    savepoint_hudi(path, "19700101000000003", at_instant=_T1)
    res = clean_hudi(path, "19700101000000004", retain_commits=1)
    assert res["files_deleted"] == 0
    assert read_hudi(spark, path, as_of=_T1).count() == 25
    release_savepoint_hudi(path, "19700101000000003")
    with pytest.raises(ValueError, match="no savepoint"):
        release_savepoint_hudi(path, "19700101000000003")
    res2 = clean_hudi(path, "19700101000000005", retain_commits=1)
    assert res2["files_deleted"] > 0
    assert read_hudi(spark, path).count() == 25  # head intact


def test_delete_is_partition_scoped(spark, tmp_path):
    """A delete batch naming (K, pA) and (K2, pB) where bucket(K) ==
    bucket(K2) must NOT drop the row (K, pB) that lives in pB's
    affected bucket — the delete contract is (key, partition), not
    key-across-all-affected-groups. Keys 1 and 11 share crc32 bucket
    7, which is exactly the collision that used to over-delete."""
    from datalakecrawler_spark.sources.hudi_native import read_hudi, write_hudi

    path = str(tmp_path / "hudi_del_scope")
    rows = spark.createDataFrame(
        [(1, "A", 10), (1, "B", 20), (11, "B", 30), (4, "A", 40)],
        "k int, p string, v int",
    )
    write_hudi(rows, path, "k", _T1, op="bulk_insert", partition_by="p")
    dels = spark.createDataFrame([(1, "A"), (11, "B")], "k int, p string")
    write_hudi(dels, path, "k", _T2, op="delete", partition_by="p")
    back = read_hudi(spark, path)
    got = sorted((r["k"], r["p"]) for r in back.select("k", "p").collect())
    assert got == [(1, "B"), (4, "A")], got


def test_maintenance_report_survives_mor_tables(spark, tmp_path):
    """One MERGE_ON_READ table in the lake must not crash the whole
    maintenance report: MoR tables dispatch to the MoR timeline, report
    log backlog as 'compact' debt, and CoW neighbors still report."""
    from datalakecrawler_spark.crawler import table_maintenance_report
    from datalakecrawler_spark.sources import hudi_native as hn

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi(src, f"{lake}/cow_tbl", "n_nationkey", _T1, op="bulk_insert")
    mor = f"{lake}/mor_tbl"
    hn.write_hudi_mor(src, mor, "n_nationkey", _T1, op="bulk_insert")
    hn.write_hudi_mor(
        src.where("n_nationkey < 5").withColumn(
            "n_regionkey", F.col("n_regionkey") + 100
        ),
        mor, "n_nationkey", _T2, op="upsert",
    )
    rep = {
        r["dataset"]: r for r in table_maintenance_report(spark, lake).collect()
    }
    assert rep["cow_tbl"]["recommendation"] == "ok"
    assert rep["mor_tbl"]["recommendation"] == "compact"
    assert rep["mor_tbl"]["format"] == "hudi"
    # after compaction the logs fold into new bases: debt flips to clean
    hn.compact_hudi_mor(spark, mor, "19700101000000003")
    rep2 = {
        r["dataset"]: r for r in table_maintenance_report(spark, lake).collect()
    }
    assert rep2["mor_tbl"]["recommendation"] == "clean"


def test_mor_delete_tombstones_and_compaction(spark, tmp_path):
    """MoR DELETE: tombstone log rows (_hoodie_is_deleted) hide keys in
    the snapshot view while the read-optimized view still serves the
    untouched bases; compaction materializes the deletes (marker gone,
    survivors only); a later re-insert of a deleted key wins."""
    import glob as _glob

    from datalakecrawler_spark.sources import hudi_native as hn

    path = str(tmp_path / "mor_del")
    src = load(spark, SF_DIR, "nation")
    hn.write_hudi_mor(src, path, "n_nationkey", _T1, op="bulk_insert")
    bases_before = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    hn.write_hudi_mor(
        src.where("n_nationkey in (2, 7)").select("n_nationkey"),
        path, "n_nationkey", _T2, op="delete",
    )
    # no base touched; one tombstone log per affected group
    assert sorted(
        f for f in _glob.glob(os.path.join(path, "*.parquet"))
        if "logfile-" not in os.path.basename(f)
    ) == bases_before
    logs = _glob.glob(os.path.join(path, "logfile-*.parquet"))
    assert logs
    snap = hn.read_hudi(spark, path)
    keys = sorted(r[0] for r in snap.select("n_nationkey").collect())
    assert keys == sorted(set(range(25)) - {2, 7})
    assert "_hoodie_is_deleted" not in snap.columns
    # read-optimized still serves all 25 (deletes not yet compacted)
    ro = hn.read_hudi(spark, path, view="read_optimized")
    assert ro.count() == 25
    # re-insert key 2: latest-wins over the tombstone
    hn.write_hudi_mor(
        src.where("n_nationkey = 2").withColumn("n_name", F.lit("BACK")),
        path, "n_nationkey", "19700101000000003", op="upsert",
    )
    snap2 = {r["n_nationkey"]: r["n_name"]
             for r in hn.read_hudi(spark, path).collect()}
    assert snap2[2] == "BACK" and 7 not in snap2
    # compaction materializes: marker gone from the new bases, RO view
    # now agrees with the snapshot view
    hn.compact_hudi_mor(spark, path, "19700101000000004")
    ro2 = hn.read_hudi(spark, path, view="read_optimized")
    got = sorted(r[0] for r in ro2.select("n_nationkey").collect())
    assert got == sorted(set(range(25)) - {7})
    import pyarrow.parquet as _pq

    newest_base = max(
        (f for f in _glob.glob(os.path.join(path, "*.parquet"))
         if "logfile-" not in os.path.basename(f)),
        key=os.path.getmtime,
    )
    assert "_hoodie_is_deleted" not in _pq.ParquetFile(newest_base).schema_arrow.names
    # deletes of unknown groups refuse; bad op refuses
    with pytest.raises(ValueError, match="op must be"):
        hn.write_hudi_mor(src, path, "n_nationkey",
                          "19700101000000005", op="nope")


def test_mor_delete_emptied_group_shadows(spark, tmp_path):
    """A group whose every key is tombstoned publishes an EMPTY
    shadowing base at compaction — the old rows must not resurrect."""
    from datalakecrawler_spark.sources import hudi_native as hn

    path = str(tmp_path / "mor_del_empty")
    rows = spark.createDataFrame([(4, 40), (5, 50)], "k int, v int")
    # crc32 buckets: 4 -> 0, 5 -> 6 (distinct groups)
    hn.write_hudi_mor(rows, path, "k", _T1, op="bulk_insert")
    hn.write_hudi_mor(
        spark.createDataFrame([(4,)], "k int"), path, "k", _T2, op="delete"
    )
    hn.compact_hudi_mor(spark, path, "19700101000000003")
    got = [(r["k"], r["v"]) for r in hn.read_hudi(spark, path).collect()]
    assert got == [(5, 50)]
    ro = hn.read_hudi(spark, path, view="read_optimized")
    assert [(r["k"], r["v"]) for r in ro.collect()] == [(5, 50)]


def test_mor_delete_partitioned_scope(spark, tmp_path):
    """Partitioned MoR delete is (key, partition)-scoped: the same key
    in another partition survives, matching the CoW contract."""
    from datalakecrawler_spark.sources import hudi_native as hn

    path = str(tmp_path / "mor_del_part")
    rows = spark.createDataFrame(
        [(1, "A", 10), (1, "B", 20), (11, "B", 30), (4, "A", 40)],
        "k int, p string, v int",
    )
    hn.write_hudi_mor(rows, path, "k", _T1, op="bulk_insert", partition_by="p")
    with pytest.raises(ValueError, match="partition column"):
        hn.write_hudi_mor(
            spark.createDataFrame([(1,)], "k int"), path, "k", _T2, op="delete",
            partition_by="p",
        )
    dels = spark.createDataFrame([(1, "A"), (11, "B")], "k int, p string")
    hn.write_hudi_mor(dels, path, "k", _T2, op="delete", partition_by="p")
    got = sorted((r["k"], r["p"]) for r in hn.read_hudi(spark, path).collect())
    assert got == [(1, "B"), (4, "A")]
    hn.compact_hudi_mor(spark, path, "19700101000000003")
    got2 = sorted(
        (r["k"], r["p"])
        for r in hn.read_hudi(spark, path, view="read_optimized").collect()
    )
    assert got2 == [(1, "B"), (4, "A")]
