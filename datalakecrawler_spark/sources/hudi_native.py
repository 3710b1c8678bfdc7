"""Native Apache Hudi Copy-on-Write table support — the PUBLIC Hudi
table layout (hudi.apache.org/tech-specs: a ``.hoodie/`` timeline of
instant files, base parquet files named
``<fileId>_<writeToken>_<instantTime>.parquet``, ``_hoodie_*`` meta
columns on every record), implemented in pure Python over Spark's
parquet writer/reader. No hudi-spark bundle jar:
``connectors.open_table`` still prefers the jar when present; this
module makes the TABLES real — timeline, file groups, and meta
columns follow the published layout.

What Hudi adds over the Delta/Iceberg modules next door is
RECORD-LEVEL UPSERT: every record has a key, keys are routed to a
fixed FILE GROUP by a bucket index (the public
``hoodie.index.type=BUCKET`` design — hash(key) % N, no lookup
table), and an upsert rewrites ONLY the file groups that received
changes (copy-on-write). The scale story:

- **Commit** = write the new base files first, publish one
  ``<instant>.commit`` JSON (HoodieCommitMetadata: per-file write
  stats) by atomic rename last; ``.commit.requested`` / ``.inflight``
  markers bracket the write per the timeline state machine. Readers
  only trust completed instants, so partial writes are invisible.
- **Upsert cost is O(changed file groups), not O(table).** The bucket
  index routes each change key to its group arithmetically; only
  those groups' latest base files are read, merged (change wins by
  key — one anti-join, the same plan a MERGE compiles to), and
  rewritten under the new instant. Untouched groups keep serving
  their old base file.
- **Read at instant t** = walk completed commits ≤ t (driver-side:
  small JSON, the same cost class as parquet footers), keep the
  LATEST base file per file group (a "file slice"), and hand the
  explicit file list to ``spark.read.parquet`` — scans, pushdown, and
  pruning stay fully distributed and Catalyst-owned. Time travel =
  stop the walk early.

Honest gates: Merge-on-Read tables (log files + compaction) raise
with the exact missing capability rather than serving wrong answers;
only COPY_ON_WRITE is written or read. ``_hoodie_commit_seqno`` is
stamped ``<instant>_<bucket>_<recordkey>`` (unique per record, as the
spec requires) rather than Hudi's task-monotonic counter — the value
is opaque to any conforming reader. Tables are unpartitioned
(partition path ``""``), the layout Hudi itself uses for
non-partitioned tables.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import urllib.parse

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META_DIR = ".hoodie"
_META_COLS = (
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
)
_N_BUCKETS = 8


def _timeline_dir(path: str) -> str:
    return os.path.join(path, _META_DIR)


def _completed_instants(path: str) -> list[str]:
    """Completed commit instants, ascending (instant times are strings
    ordered lexically per spec)."""
    tdir = _timeline_dir(path)
    if not os.path.isdir(tdir):
        raise FileNotFoundError(f"no Hudi timeline at {tdir}")
    if glob.glob(os.path.join(tdir, "*.deltacommit*")) or glob.glob(
        os.path.join(tdir, "*.compaction*")
    ):
        raise NotImplementedError(
            "hudi_native reads COPY_ON_WRITE tables only; this timeline "
            "has deltacommit/compaction instants (MERGE_ON_READ), whose "
            "log files this reader does not merge."
        )
    return sorted(
        os.path.basename(f)[: -len(".commit")]
        for f in glob.glob(os.path.join(tdir, "*.commit"))
    )


def _file_id(bucket: int) -> str:
    """Deterministic uuid-shaped fileId per bucket (bucket-index
    tables derive the file group from the hash bucket)."""
    h = hashlib.md5(f"filegroup-{bucket}".encode()).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}-{bucket}"


def _base_file_name(bucket: int, instant: str) -> str:
    return f"{_file_id(bucket)}_0-0-0_{instant}.parquet"


def _bucket_col(key_col: str):
    """The bucket index: a pure hash of the record key — stable across
    sessions/engines (crc32 of the utf-8 key), no lookup state."""
    return F.pmod(F.crc32(F.col(key_col).cast("string")), F.lit(_N_BUCKETS))


def _slices_at(
    path: str, as_of: str | None
) -> dict[tuple[str, str], tuple[str, str]]:
    """(partition path, fileId) -> (instant, base file relpath): the
    latest file slice per file group among completed instants <=
    as_of. File groups are per-partition, so the same fileId under two
    partition paths is two independent groups — exactly the published
    layout."""
    slices: dict[tuple[str, str], tuple[str, str]] = {}
    for instant in _completed_instants(path):
        if as_of is not None and instant > as_of:
            break
        with open(os.path.join(_timeline_dir(path), f"{instant}.commit")) as fh:
            meta = json.load(fh)
        for ppath, stats_list in meta["partitionToWriteStats"].items():
            for stats in stats_list:
                slices[(ppath, stats["fileId"])] = (instant, stats["path"])
    return slices


def write_hudi(
    df: DataFrame,
    path: str,
    record_key: str,
    instant: str,
    op: str = "upsert",
    partition_by: str | None = None,
) -> str:
    """Commit ``df`` to a Hudi CoW table at ``path``; returns the
    instant. ``bulk_insert`` lays out the initial file groups (every
    record routed to its bucket); ``upsert`` merges by ``record_key``
    into ONLY the affected file groups and rewrites those groups'
    base files under the new instant (copy-on-write). Data files are
    written by Spark's distributed parquet writer (one file per
    bucket via a bucket-repartition, so group rewrite parallelism =
    number of touched groups); the commit JSON is published last by
    atomic rename.

    ``partition_by`` names one column whose string value becomes the
    record's PARTITION PATH: base files land under ``<val>/…``, file
    groups are per-(partition, bucket), and an upsert's scope is the
    partitions its changes actually touch — the mechanism that bounds
    upsert cost on a date-partitioned 100 TB table to the hot days.
    Partitioning is a table property (hoodie.properties records it;
    later commits must repeat it). Values must not contain '/'."""
    if op not in ("bulk_insert", "upsert"):
        raise ValueError(f"op must be bulk_insert|upsert, got {op!r}")
    tdir = _timeline_dir(path)
    first = not os.path.isdir(tdir)
    os.makedirs(tdir, exist_ok=True)
    props_file = os.path.join(tdir, "hoodie.properties")
    if first:
        props = {
            "hoodie.table.name": os.path.basename(path.rstrip("/")),
            "hoodie.table.type": "COPY_ON_WRITE",
            "hoodie.table.version": "5",
            "hoodie.table.recordkey.fields": record_key,
            "hoodie.table.partition.fields": partition_by or "",
            "hoodie.datasource.write.hive_style_partitioning": "false",
            "hoodie.timeline.layout.version": "1",
        }
        with open(props_file, "w") as fh:
            for k, v in sorted(props.items()):
                fh.write(f"{k}={v}\n")
    else:
        prior_props = dict(
            line.strip().split("=", 1)
            for line in open(props_file)
            if "=" in line
        )
        prior_part = prior_props.get("hoodie.table.partition.fields", "")
        if prior_part != (partition_by or ""):
            raise ValueError(
                f"table partition fields are {prior_part!r}; this commit "
                f"declares {partition_by or ''!r} — partitioning is fixed "
                "at table creation"
            )
    # Timeline state machine: requested -> inflight -> completed.
    # The requested marker is created exclusively (O_EXCL — the local
    # form of a conditional put): two writers claiming the same
    # instant fail loudly at the claim, not by clobbering each other's
    # base files mid-write. The claim happens BEFORE the monotonicity
    # read below (mirroring delta_native's commit-lock discipline) so
    # the validation runs under the claim, and it is re-checked again
    # immediately before the put-if-absent .commit publish.
    try:
        os.close(
            os.open(
                os.path.join(tdir, f"{instant}.commit.requested"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        )
    except FileExistsError:
        raise RuntimeError(
            f"instant {instant!r} is already claimed by another writer "
            "(requested marker exists); pick a later instant"
        ) from None
    try:
        done = _completed_instants(path)
        if done and done[-1] >= instant:
            raise ValueError(
                f"instant {instant!r} is not after the last completed "
                f"instant {done[-1]!r} (timeline must be monotonic)"
            )
        return _write_hudi_claimed(
            df, path, record_key, instant, op, partition_by, tdir, first
        )
    except BaseException:
        # release the claim — a failed attempt must not permanently
        # burn the instant (data staged under it is invisible to
        # readers, who only follow completed instants)
        for sfx in ("inflight", "commit.requested"):
            try:
                os.remove(os.path.join(tdir, f"{instant}.{sfx}"))
            except FileNotFoundError:
                pass
        raise


def _write_hudi_claimed(
    df: DataFrame,
    path: str,
    record_key: str,
    instant: str,
    op: str,
    partition_by: str | None,
    tdir: str,
    first: bool,
) -> str:
    """write_hudi's body, run while holding the instant's requested
    marker (the claim); the caller releases the markers on failure."""
    open(os.path.join(tdir, f"{instant}.inflight"), "w").close()

    # The file name is derivable from the bucket because the bucket
    # index fixes fileId arithmetically; F.md5 matches hashlib.md5 in
    # _file_id, so the stamp stays JVM-side.
    h = F.md5(F.format_string("filegroup-%d", F.col("__bucket")))
    fname = F.format_string(
        f"%s-%s-%s-%s-%s-%d_0-0-0_{instant}.parquet",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
        F.col("__bucket"),
    )

    ppath_expr = (
        F.col(partition_by).cast("string") if partition_by else F.lit("")
    )

    def _stamp_new(frame: DataFrame) -> DataFrame:
        """Meta columns for records written BY this commit."""
        return (
            frame.withColumn("_hoodie_commit_time", F.lit(instant))
            .withColumn(
                "_hoodie_commit_seqno",
                F.format_string(
                    f"{instant}_%d_%s",
                    F.col("__bucket"),
                    F.col(record_key).cast("string"),
                ),
            )
            .withColumn("_hoodie_record_key", F.col(record_key).cast("string"))
            .withColumn("_hoodie_partition_path", F.col("__ppath"))
            .withColumn("_hoodie_file_name", fname)
        )

    changes = df.withColumn("__bucket", _bucket_col(record_key)).withColumn(
        "__ppath", ppath_expr
    )
    prev_slice: dict[tuple[str, str], tuple[str, str]] = {}
    n_updates = 0
    if op == "bulk_insert":
        if not first and _slices_at(path, None):
            raise ValueError("bulk_insert into a non-empty table")
        stamped = _stamp_new(changes)
        n_groups = _N_BUCKETS
    else:
        prev_slice = _slices_at(path, None)
        # Affected file groups: the (partition, bucket) pairs the
        # change rows map to — bounded by touched partitions ×
        # _N_BUCKETS, never by table size.
        affected = {
            (r[0], r[1])
            for r in changes.select("__ppath", "__bucket").distinct().collect()
        }
        n_groups = max(len(affected), 1)
        old_files = [
            os.path.join(path, rel)
            for (pp, fid), (_, rel) in sorted(prev_slice.items())
            if (pp, int(fid.rsplit("-", 1)[1])) in affected
        ]
        if old_files:
            # Copied-forward records KEEP their original commit time /
            # seqno (only the physical file name moves) — this is what
            # makes incremental queries able to tell changed records
            # from rewritten-but-unchanged ones.
            old = (
                df.sparkSession.read.parquet(*old_files)
                .withColumn("__bucket", _bucket_col(record_key))
                .withColumn("__ppath", F.col("_hoodie_partition_path"))
            )
            keys = changes.select(record_key)
            n_updates = old.join(keys, record_key, "left_semi").count()
            kept = old.join(keys, record_key, "left_anti").withColumn(
                "_hoodie_file_name", fname
            )
            stamped = _stamp_new(changes).unionByName(kept)
        else:
            stamped = _stamp_new(changes)
    # One base file per touched file group: repartition ON the group
    # key puts each group wholly in one task; partitionBy splits the
    # stage dir per group so the rename below is a pure metadata move.
    # Unpartitioned tables stage by bucket only — an empty-string
    # partition value would otherwise become __HIVE_DEFAULT_PARTITION__
    # and the constant __ppath column would leak into the data files.
    stage = os.path.join(path, f".stage-{instant}")
    stage_cols = ["__ppath", "__bucket"] if partition_by else ["__bucket"]
    (
        (stamped if partition_by else stamped.drop("__ppath"))
        .repartition(n_groups, *stage_cols)
        .write.mode("overwrite")
        .partitionBy(*stage_cols)
        .parquet(stage)
    )
    # Per-group record counts come straight from each staged file's
    # parquet FOOTER (num_rows) in the directory loop below — no Spark
    # job, and no re-inferred-partition-type mismatch: reading the
    # stage back through Spark would re-infer __ppath as date/int for
    # date- or numeric-valued partitions while this loop keys by the
    # directory-name string.
    per_partition: dict[str, list] = {}
    bucket_dirs = (
        glob.glob(os.path.join(stage, "__ppath=*", "__bucket=*"))
        if partition_by
        else glob.glob(os.path.join(stage, "__bucket=*"))
    )
    for bdir in sorted(bucket_dirs):
        bucket = int(os.path.basename(bdir).split("=")[1])
        # Spark's hive-style writer %XX-escapes special characters in
        # the directory segment; the table convention (commit metadata
        # keys, _hoodie_partition_path, on-disk layout) is the RAW
        # string value, so decode here.
        ppath = (
            urllib.parse.unquote(
                os.path.basename(os.path.dirname(bdir)).split("=", 1)[1]
            )
            if partition_by
            else ""
        )
        if "/" in ppath:
            raise ValueError(f"partition value {ppath!r} contains '/'")
        parts = sorted(glob.glob(os.path.join(bdir, "part-*.parquet")))
        assert len(parts) == 1, f"expected one base file per group, got {parts}"
        num_rows = pq.ParquetFile(parts[0]).metadata.num_rows
        rel = os.path.join(ppath, _base_file_name(bucket, instant)).lstrip("/")
        pdir_abs = os.path.dirname(os.path.join(path, rel))
        os.makedirs(pdir_abs, exist_ok=True)
        pmeta = os.path.join(pdir_abs, ".hoodie_partition_metadata")
        if ppath and not os.path.exists(pmeta):
            with open(pmeta, "w") as fh:
                fh.write(
                    "#partition metadata\n"
                    f"commitTime={instant}\npartitionDepth=1\n"
                )
        os.replace(parts[0], os.path.join(path, rel))
        fid = _file_id(bucket)
        prev = prev_slice.get((ppath, fid), (None, None))[0]
        per_partition.setdefault(ppath, []).append(
            {
                "fileId": fid,
                "path": rel,
                "prevCommit": prev if prev is not None else "null",
                "numWrites": num_rows,
                "numUpdateWrites": 0,
                "fileSizeInBytes": os.path.getsize(os.path.join(path, rel)),
                "totalWriteBytes": os.path.getsize(os.path.join(path, rel)),
            }
        )
    shutil.rmtree(stage)

    if per_partition and n_updates:
        first_pp = sorted(per_partition)[0]
        per_partition[first_pp][0]["numUpdateWrites"] = n_updates

    commit_meta = {
        "partitionToWriteStats": per_partition,
        "compacted": False,
        "operationType": op.upper(),
    }
    tmp = os.path.join(tdir, f"{instant}.commit.tmp")
    with open(tmp, "w") as fh:
        json.dump(commit_meta, fh, sort_keys=True, indent=2)
    # Publish-time monotonicity re-check + put-if-absent (os.link
    # fails loudly if the .commit somehow exists): a concurrent writer
    # on a LATER instant that completed while this upsert ran would
    # otherwise be silently ordered after us — both upserts read the
    # same base snapshot, so committing under it would lose its
    # updates. Fail instead; the caller retries at a fresh instant.
    done_now = _completed_instants(path)
    if done_now and done_now[-1] >= instant:
        os.remove(tmp)
        raise RuntimeError(
            f"concurrent commit {done_now[-1]!r} completed after this "
            f"writer validated instant {instant!r}; retry the upsert at "
            "a fresh instant against the new snapshot"
        )
    try:
        os.link(tmp, os.path.join(tdir, f"{instant}.commit"))
    except FileExistsError:
        os.remove(tmp)
        raise RuntimeError(
            f"instant {instant!r} was published by another writer"
        ) from None
    os.remove(tmp)
    os.remove(os.path.join(tdir, f"{instant}.inflight"))
    os.remove(os.path.join(tdir, f"{instant}.commit.requested"))
    return instant


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    partition_path: str | None = None,
) -> DataFrame:
    """Snapshot scan: resolve the latest file slice per file group at
    ``as_of`` (None = latest) driver-side, then let Spark's parquet
    source scan exactly those base files — pushdown/pruning/codegen
    unchanged from any parquet read. Meta columns are dropped; pass
    the raw files to ``spark.read.parquet`` directly to keep them.

    ``partition_path`` restricts the timeline walk's result to one
    partition's file slices — the other partitions' files are never
    listed (the partition source column itself stays in the data
    files, so the result needs no dir-derived columns)."""
    slices = _slices_at(path, as_of)
    if partition_path is not None:
        slices = {
            (pp, fid): v
            for (pp, fid), v in slices.items()
            if pp == partition_path
        }
        if not slices:
            raise ValueError(
                f"no file slices for partition {partition_path!r}"
            )
    files = [os.path.join(path, rel) for _, (_, rel) in sorted(slices.items())]
    if not files:
        raise ValueError(f"no completed instants at or before {as_of!r}")
    return spark.read.parquet(*files).drop(*_META_COLS)


def read_hudi_incremental(
    spark: SparkSession,
    path: str,
    from_instant: str,
    to_instant: str | None = None,
) -> DataFrame:
    """Hudi's signature INCREMENTAL QUERY: the records changed in
    instants (from_instant, to_instant] — the capability that lets a
    downstream pipeline consume a 100 TB table as a change stream
    instead of re-reading snapshots. Copy-on-write rewrites whole file
    groups, so the new base files also carry unchanged records copied
    forward; ``_hoodie_commit_time`` (stamped per record at write)
    distinguishes them — the filter is pushed into the parquet scan of
    ONLY the files the in-range commits wrote. I/O is proportional to
    the changed file groups, never the table."""
    instants = [
        i
        for i in _completed_instants(path)
        if i > from_instant and (to_instant is None or i <= to_instant)
    ]
    if not instants:
        raise ValueError(
            f"no completed instants in ({from_instant!r}, {to_instant!r}]"
        )
    files = []
    for instant in instants:
        with open(os.path.join(_timeline_dir(path), f"{instant}.commit")) as fh:
            meta = json.load(fh)
        files += [
            os.path.join(path, s["path"])
            for stats_list in meta["partitionToWriteStats"].values()
            for s in stats_list
        ]
    out = spark.read.parquet(*sorted(files)).where(
        F.col("_hoodie_commit_time") > from_instant
    )
    if to_instant is not None:
        out = out.where(F.col("_hoodie_commit_time") <= to_instant)
    keep = [c for c in out.columns if c not in _META_COLS] + [
        "_hoodie_commit_time"
    ]
    return out.select(*keep)


def hudi_timeline(path: str) -> list[dict]:
    """Per-instant summary: files written, update counts, operation."""
    out = []
    for instant in _completed_instants(path):
        with open(os.path.join(_timeline_dir(path), f"{instant}.commit")) as fh:
            meta = json.load(fh)
        stats = [
            s
            for stats_list in meta["partitionToWriteStats"].values()
            for s in stats_list
        ]
        out.append(
            {
                "instant": instant,
                "operation": meta["operationType"],
                "n_files": len(stats),
                "n_writes": sum(s["numWrites"] for s in stats),
                "n_update_writes": sum(s["numUpdateWrites"] for s in stats),
            }
        )
    return out


# ---------------------------------------------------------------------------
# Registered operators (group A extensions)
# ---------------------------------------------------------------------------

from datalakecrawler_spark.io import load  # noqa: E402
from datalakecrawler_spark.registry import SUM_D, dsum, register  # noqa: E402
from datalakecrawler_spark.sources.scans import _tmp  # noqa: E402


def _fresh(path: str) -> str:
    if os.path.exists(path):
        shutil.rmtree(path)
    return path


# Deterministic spec-shaped instant times (yyyyMMddHHmmssSSS); wall
# clock is not part of query semantics, exactly like delta_native's
# fixed modificationTime.
_T1 = "19700101000000001"
_T2 = "19700101000000002"


@register(
    "sink_hudi_upsert",
    group="A",
    oracle=f"""
    with base as (select * from orders where o_orderstatus = 'F'),
    changes as (
      select * replace (o_totalprice * 1.1 as o_totalprice)
      from orders where o_orderstatus = 'F' and o_orderkey % 2 = 0
      union all
      select * from orders where o_orderstatus = 'P'
    ),
    merged as (
      select * from changes
      union all
      select * from base
      where o_orderkey not in (select o_orderkey from changes)
    )
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from merged group by o_orderstatus
    """,
)
def sink_hudi_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Hudi CoW record-level upsert — the capability the other
    two lakehouse modules don't exercise. bulk_insert lays the 'F'
    orders into 8 bucket-indexed file groups; the upsert then updates
    the even-keyed 'F' orders (price * 1.1) and inserts the 'P'
    orders in ONE commit. Only the file groups the change keys hash
    to are rewritten (copy-on-write); the snapshot read must serve
    change-wins-by-key merge semantics, which the oracle recomputes
    relationally. The timeline on disk is the real public layout
    (.hoodie/<instant>.commit with per-file write stats, base files
    named <fileId>_<writeToken>_<instant>.parquet, _hoodie_* meta
    columns on every record)."""
    path = _fresh(_tmp("orders_hudi"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi(base, path, "o_orderkey", _T1, op="bulk_insert")
    changes = (
        src.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(src.where(F.col("o_orderstatus") == "P"))
    )
    write_hudi(changes, path, "o_orderkey", _T2, op="upsert")
    tl = hudi_timeline(path)
    assert [t["operation"] for t in tl] == ["BULK_INSERT", "UPSERT"], tl
    return (
        read_hudi(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_hudi_partitioned",
    group="A",
    oracle=f"""
    select count(*) as cnt,
           {SUM_D.format('c_acctbal + 1000')} as sum_bal
    from customer where c_mktsegment = 'BUILDING'
    """,
)
def sink_hudi_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: partitioned Hudi table — upsert scope bounded by
    partition. Customers bulk-insert partitioned by market segment
    (base files under <segment>/, .hoodie_partition_metadata per dir,
    file groups per (partition, bucket)); the upsert then touches ONLY
    the BUILDING segment (+1000 balance), and the commit metadata must
    show exactly that one partition rewritten — every other segment's
    file slices survive by identity. The partition-pruned read lists
    only BUILDING's files (timeline-level skip) and must serve the
    updated balances, which the oracle recomputes. On a
    date-partitioned 100 TB table this is what bounds a hot-day upsert
    to the hot day."""
    path = _fresh(_tmp("customer_hudi_part"))
    src = load(spark, sf_dir, "customer")
    write_hudi(
        src, path, "c_custkey", _T1, op="bulk_insert",
        partition_by="c_mktsegment",
    )
    changes = src.where(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000
    )
    write_hudi(
        changes, path, "c_custkey", _T2, op="upsert",
        partition_by="c_mktsegment",
    )
    with open(os.path.join(path, ".hoodie", f"{_T2}.commit")) as fh:
        meta = json.load(fh)
    assert set(meta["partitionToWriteStats"]) == {"BUILDING"}, sorted(
        meta["partitionToWriteStats"]
    )
    return read_hudi(spark, path, partition_path="BUILDING").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("c_acctbal").alias("sum_bal")
    )


@register(
    "scan_hudi_incremental",
    group="A",
    oracle=f"""
    with changes as (
      select * replace (o_totalprice * 1.1 as o_totalprice)
      from orders where o_orderstatus = 'F' and o_orderkey % 2 = 0
      union all
      select * from orders where o_orderstatus = 'P'
    )
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from changes group by o_orderstatus
    """,
)
def scan_hudi_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Hudi incremental query — pull EXACTLY the records
    changed in instants (T1, T2], the change-stream consumption model
    that lets a downstream pipeline avoid snapshot re-reads. CoW
    rewrites whole file groups, so the T2 base files also carry
    unchanged records copied forward — but those keep their original
    ``_hoodie_commit_time`` (only changed records are stamped T2), so
    the commit-time filter recovers the precise changeset. The oracle
    recomputes the changeset relationally; a hash match proves no
    copied-forward record leaked into the incremental view. I/O =
    files written by the in-range commits only."""
    path = _fresh(_tmp("orders_hudi_inc"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi(base, path, "o_orderkey", _T1, op="bulk_insert")
    changes = (
        src.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(src.where(F.col("o_orderstatus") == "P"))
    )
    write_hudi(changes, path, "o_orderkey", _T2, op="upsert")
    return (
        read_hudi_incremental(spark, path, from_instant=_T1, to_instant=_T2)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "scan_hudi_time_travel",
    group="A",
    oracle=f"""
    with t1 as (
      select 1 as instant_no, count(*) as cnt,
             {SUM_D.format('o_totalprice')} as sum_price
      from orders where o_orderstatus = 'F'
    ),
    t2 as (
      with merged as (
        select * replace (o_totalprice * 1.1 as o_totalprice)
        from orders where o_orderstatus = 'F' and o_orderkey % 2 = 0
        union all
        select * from orders
        where o_orderstatus = 'F' and o_orderkey % 2 <> 0
      )
      select 2 as instant_no, count(*) as cnt,
             {SUM_D.format('o_totalprice')} as sum_price
      from merged
    )
    select * from t1 union all select * from t2
    """,
)
def scan_hudi_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Hudi time travel by timeline walk — reading as of the
    first instant serves the pre-upsert rows (the superseded base
    files stay on disk; older file slices remain addressable), while
    the latest snapshot serves the merged state. Each snapshot scan
    is a plain distributed parquet read over that instant's resolved
    file-slice list."""
    path = _fresh(_tmp("orders_hudi_tt"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi(base, path, "o_orderkey", _T1, op="bulk_insert")
    updates = base.where(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    write_hudi(updates, path, "o_orderkey", _T2, op="upsert")

    def snap(no: int, as_of: str) -> DataFrame:
        return (
            read_hudi(spark, path, as_of=as_of)
            .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
            .select(F.lit(no).alias("instant_no"), "cnt", "sum_price")
        )

    return snap(1, _T1).unionByName(snap(2, _T2))
