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

MERGE_ON_READ (r6): ``write_hudi_mor`` appends per-group LOG files on
upsert instead of rewriting bases (write cost O(change rows)),
``read_hudi`` dispatches on ``hoodie.table.type`` and serves either
the snapshot view (base ⟕ logs merged latest-wins by key, one
distributed window — never a per-group driver loop) or the
read-optimized view (bases only), and ``compact_hudi_mor`` folds log
backlogs into new bases under a ``commit`` instant with original
commit times preserved so incremental queries stay exact. MoR DELETE
(r7) appends ``_hoodie_is_deleted`` tombstone log rows — the public
convention: the snapshot view drops tombstoned keys at merge,
read-optimized serves them until compaction materializes the
survivors (fully-emptied groups shadow with an empty base). Log payload
container honesty: see the MoR section comment — plain parquet under
spec-shaped names, not HoodieLogFormat framing (Spark's file index
hard-filters the spec's dot-prefixed log names).

``_hoodie_commit_seqno`` is
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
            "this helper walks COPY_ON_WRITE timelines only; the table "
            "has deltacommit/compaction instants (MERGE_ON_READ) — use "
            "the MoR paths (_mor_timeline / read_hudi, which dispatches "
            "on hoodie.table.type)."
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
    later commits must repeat it). Values must not contain '/'.

    ``op="delete"`` takes ``df`` as the KEYS to remove (``record_key``
    plus, on partitioned tables, the partition column — Hudi's delete
    contract) and rewrites only the affected file groups WITHOUT the
    matching records. A group whose records are all deleted still gets
    a new (empty) base file slice — skipping it would leave the old
    slice live and resurrect the rows. Cost is O(affected groups), the
    same bound as upsert."""
    if op not in ("bulk_insert", "upsert", "delete"):
        raise ValueError(f"op must be bulk_insert|upsert|delete, got {op!r}")
    if op == "delete":
        need = {record_key} | ({partition_by} if partition_by else set())
        missing_cols = need - set(df.columns)
        if missing_cols:
            raise ValueError(
                f"delete keys must carry {sorted(need)} "
                f"(missing {sorted(missing_cols)})"
            )
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
        _refuse_converted(path, prior_props, f"write_hudi(op={op!r})")
        if prior_props.get("hoodie.table.type") != "COPY_ON_WRITE":
            raise ValueError(
                "table is MERGE_ON_READ; use write_hudi_mor (table type "
                "is fixed at creation)"
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
    n_deletes = 0
    affected: set[tuple[str, int]] = set()
    if op == "bulk_insert":
        if not first and _slices_at(path, None):
            raise ValueError("bulk_insert into a non-empty table")
        stamped = _stamp_new(changes)
        n_groups = _N_BUCKETS
    elif op == "delete":
        prev_slice = _slices_at(path, None)
        affected = {
            (r[0], r[1])
            for r in changes.select("__ppath", "__bucket").distinct().collect()
        }
        # only groups that actually have a live slice need rewriting
        affected = {
            (pp, b)
            for (pp, b) in affected
            if (pp, _file_id(b)) in prev_slice
        }
        n_groups = max(len(affected), 1)
        old_files = [
            os.path.join(path, rel)
            for (pp, fid), (_, rel) in sorted(prev_slice.items())
            if (pp, int(fid.rsplit("-", 1)[1])) in affected
        ]
        if not old_files:
            raise ValueError("delete keys match no live file group")
        old = (
            df.sparkSession.read.parquet(*old_files)
            .withColumn("__bucket", _bucket_col(record_key))
            .withColumn("__ppath", F.col("_hoodie_partition_path"))
        )
        # Delete keys are scoped to their OWN partition: the contract
        # is (key, partition), so a batch deleting (K, pA) and (K2, pB)
        # must not drop a row keyed K that lives in pB's (affected)
        # bucket. Unpartitioned tables join on __ppath="" both sides —
        # a no-op key component.
        keys = changes.select(record_key, "__ppath")
        n_deletes = old.join(keys, [record_key, "__ppath"], "left_semi").count()
        # survivors keep their original commit time/seqno; only the
        # physical file name moves to this instant's slice
        stamped = old.join(
            keys, [record_key, "__ppath"], "left_anti"
        ).withColumn("_hoodie_file_name", fname)
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
    staged_groups: set[tuple[str, int]] = set()
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
        staged_groups.add((ppath, bucket))
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

    # Fully-emptied groups (op=delete removed every record) still need
    # a NEW slice: the hive-partitioned staging writes nothing for an
    # empty group, but skipping its write stat would leave the prior
    # slice live and resurrect the deleted rows. Shadow each with an
    # empty base file carrying the same schema.
    emptied = sorted(affected - staged_groups) if op == "delete" else []
    if emptied:
        estage = os.path.join(path, f".stage-empty-{instant}")
        # the staging writer excludes the stage columns from data files
        # either way, so the empty file's schema is stamped minus both
        (
            stamped.drop("__ppath", "__bucket")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(estage)
        )
        (empty_part,) = glob.glob(os.path.join(estage, "part-*.parquet"))
        for ppath, bucket in emptied:
            rel = os.path.join(ppath, _base_file_name(bucket, instant)).lstrip("/")
            pdir_abs = os.path.dirname(os.path.join(path, rel))
            os.makedirs(pdir_abs, exist_ok=True)
            shutil.copyfile(empty_part, os.path.join(path, rel))
            fid = _file_id(bucket)
            per_partition.setdefault(ppath, []).append(
                {
                    "fileId": fid,
                    "path": rel,
                    "prevCommit": prev_slice[(ppath, fid)][0],
                    "numWrites": 0,
                    "numUpdateWrites": 0,
                    "fileSizeInBytes": os.path.getsize(os.path.join(path, rel)),
                    "totalWriteBytes": os.path.getsize(os.path.join(path, rel)),
                }
            )
        shutil.rmtree(estage)

    if per_partition and n_updates:
        first_pp = sorted(per_partition)[0]
        per_partition[first_pp][0]["numUpdateWrites"] = n_updates
    if per_partition and n_deletes:
        first_pp = sorted(per_partition)[0]
        per_partition[first_pp][0]["numDeletes"] = n_deletes

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
    view: str = "snapshot",
) -> DataFrame:
    """Snapshot scan: resolve the latest file slice per file group at
    ``as_of`` (None = latest) driver-side, then let Spark's parquet
    source scan exactly those base files — pushdown/pruning/codegen
    unchanged from any parquet read. Meta columns are dropped; pass
    the raw files to ``spark.read.parquet`` directly to keep them.

    ``partition_path`` restricts the timeline walk's result to one
    partition's file slices — the other partitions' files are never
    listed (the partition source column itself stays in the data
    files, so the result needs no dir-derived columns).

    MERGE_ON_READ tables dispatch to the merge reader: ``view=
    "snapshot"`` (default) merges base + log files latest-wins by key;
    ``view="read_optimized"`` serves base files only (CoW tables
    ignore ``view`` — their base files ARE the snapshot)."""
    if _table_type(path) == "MERGE_ON_READ":
        return _read_hudi_mor(spark, path, as_of, partition_path, view)
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
    reader = spark.read
    props = _table_props(path)
    base = props.get("hoodie.table.converted.base-path")
    if base:
        # converted PARTITIONED source (Delta keeps partition values
        # in hive dirs, not in the file bytes): basePath re-derives
        # the partition columns from the source table's dirs — the
        # same mechanism the Iceberg conversion uses — and the stored
        # DDL casts them back to the committed types (dir inference
        # would narrow e.g. bigint to int)
        reader = reader.option("basePath", base)
    out = reader.parquet(*files).drop(*_META_COLS)
    if props.get("hoodie.table.converted.rename"):
        # converted COLUMN-MAPPED source: files store physical
        # col-<uuid> names; project back to the logical schema (one
        # codegen'd alias per column, before the partition cast below,
        # which keys logical names). NESTED schemas (r9) carry the
        # logical schema in a property: each struct casts to its
        # logical twin — a positional member rename, still one
        # codegen'd expression, no Python on the rows.
        import json as _json

        ren = _json.loads(props["hoodie.table.converted.rename"])
        lsch = None
        if props.get("hoodie.table.converted.schema"):
            from pyspark.sql import types as _T

            lsch = _T.StructType.fromJson(
                _json.loads(props["hoodie.table.converted.schema"])
            )
        sel = []
        for c in out.columns:
            logical = ren.get(c, c)
            expr = F.col(c)
            if lsch is not None and logical in lsch.fieldNames():
                want = lsch[logical].dataType
                if out.schema[c].dataType != want:
                    from datalakecrawler_spark.sources.delta_native import (
                        _nullable_twin,
                    )

                    expr = expr.cast(_nullable_twin(want))
            sel.append(expr.alias(logical))
        out = out.select(*sel)
    if base and props.get("hoodie.table.converted.partition-ddl"):
        for part in props["hoodie.table.converted.partition-ddl"].split(";"):
            cname, ctype = part.strip().split(" ", 1)
            out = out.withColumn(cname, F.col(cname).cast(ctype))
    return out


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
    _refuse_converted(path, _table_props(path), "read_hudi_incremental")
    if _table_type(path) == "MERGE_ON_READ":
        # MoR: change records live in the deltacommit files (logs +
        # bulk-insert bases). Compaction commits are skipped — they
        # move bytes, not history (merged records keep their original
        # commit times), so including them would double-count.
        items = [
            (i, a)
            for i, a in _mor_timeline(path)
            if a == "deltacommit"
            and i > from_instant
            and (to_instant is None or i <= to_instant)
        ]
    else:
        items = [
            (i, "commit")
            for i in _completed_instants(path)
            if i > from_instant and (to_instant is None or i <= to_instant)
        ]
    if not items:
        raise ValueError(
            f"no completed instants in ({from_instant!r}, {to_instant!r}]"
        )
    files = []
    for instant, action in items:
        meta = _instant_meta(path, instant, action)
        files += [
            os.path.join(path, s["path"])
            for stats_list in meta["partitionToWriteStats"].values()
            for s in stats_list
        ]
    # mergeSchema: delete-tombstone log rows carry _hoodie_is_deleted
    # and surface in the change stream as retraction records
    out = spark.read.option("mergeSchema", "true").parquet(
        *sorted(files)
    ).where(F.col("_hoodie_commit_time") > from_instant)
    if to_instant is not None:
        out = out.where(F.col("_hoodie_commit_time") <= to_instant)
    keep = [c for c in out.columns if c not in _META_COLS] + [
        "_hoodie_commit_time"
    ]
    return out.select(*keep)


def hudi_timeline(path: str) -> list[dict]:
    """Per-instant summary: files written, update counts, operation.
    Works for both table types (MoR timelines interleave deltacommit
    and compaction commit instants)."""
    if _table_type(path) == "MERGE_ON_READ":
        items = _mor_timeline(path)
    else:
        items = [(i, "commit") for i in _completed_instants(path)]
    out = []
    for instant, action in items:
        meta = _instant_meta(path, instant, action)
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
# MERGE_ON_READ (r6)
# ---------------------------------------------------------------------------
#
# MoR semantics per the public spec: upserts APPEND a log file to the
# affected file slice instead of rewriting its base file (write cost
# O(changes), zero read amplification of untouched data); the snapshot
# ("real-time") view merges base + logs by record key at query time,
# latest commit wins; the read-optimized view serves base files only;
# COMPACTION folds a slice's log backlog into a new base file under a
# `commit` instant while all data writes are `deltacommit` instants.
#
# Honest format deviation, stated once: log files here are PLAIN
# PARQUET named `logfile-<fileId>_<baseInstant>.log.<version>.parquet`
# next to their base files. Modern Hudi supports parquet data blocks
# in log files (hoodie.logfile.data.block.format=parquet), but wraps
# them in the HoodieLogFormat container (magic + block headers) under
# a dot-prefixed name. Neither survives this stack: Spark's file index
# hard-filters dot-prefixed paths even when listed explicitly (probed:
# "All paths were ignored"), and the block container would force every
# log read through Python instead of the distributed parquet source.
# The TIMELINE and slice semantics are the spec's; the log payload
# container is not. Readers here never glob — every scan gets the
# explicit file list resolved from commit metadata.


def _table_props(path: str) -> dict[str, str]:
    props_file = os.path.join(_timeline_dir(path), "hoodie.properties")
    if not os.path.exists(props_file):
        raise FileNotFoundError(
            f"no Hudi timeline at {_timeline_dir(path)} "
            "(missing hoodie.properties)"
        )
    return dict(
        line.strip().split("=", 1) for line in open(props_file) if "=" in line
    )


def _table_type(path: str) -> str:
    return _table_props(path).get("hoodie.table.type", "COPY_ON_WRITE")


def _refuse_converted(path: str, props: dict[str, str], what: str) -> None:
    """Converted tables (convert_delta_to_hudi / convert_iceberg_to_
    hudi published a timeline over foreign parquet) are READ-ONLY
    through Hudi's record-level surfaces: their base files carry no
    ``_hoodie_*`` meta columns (a metadata-only switch cannot stamp
    bytes), which upsert/delete merging and incremental filtering
    both key on. Snapshot reads (read_hudi) work — that's the point
    of the conversion."""
    src = props.get("hoodie.table.converted.from")
    if src:
        raise NotImplementedError(
            f"{what} on a table converted from {src} ({path}): base "
            "files lack the _hoodie_* meta columns a metadata-only "
            "conversion cannot add — read the snapshot via read_hudi "
            "and bulk_insert it to a NEW location for a writable table"
        )


def _mor_timeline(path: str) -> list[tuple[str, str]]:
    """Completed (instant, action) pairs, ascending — MoR timelines
    interleave deltacommit (data) and commit (compaction) instants."""
    tdir = _timeline_dir(path)
    if not os.path.isdir(tdir):
        raise FileNotFoundError(f"no Hudi timeline at {tdir}")
    out = []
    for action in ("commit", "deltacommit"):
        for f in glob.glob(os.path.join(tdir, f"*.{action}")):
            out.append((os.path.basename(f)[: -len(action) - 1], action))
    return sorted(out)


def _instant_meta(path: str, instant: str, action: str) -> dict:
    with open(os.path.join(_timeline_dir(path), f"{instant}.{action}")) as fh:
        return json.load(fh)


def _mor_slices_at(path: str, as_of: str | None = None) -> dict:
    """(partition path, fileId) -> {"base": rel, "base_instant": str,
    "logs": [rel, ...]}: the latest file slice per file group with its
    ordered log backlog. A base write (bulk_insert / compaction)
    starts a fresh slice — its instant supersedes the merged logs; a
    log append extends the current slice."""
    slices: dict = {}
    for instant, action in _mor_timeline(path):
        if as_of is not None and instant > as_of:
            break
        meta = _instant_meta(path, instant, action)
        for pp, stats_list in meta["partitionToWriteStats"].items():
            for s in stats_list:
                key = (pp, s["fileId"])
                if s.get("logVersion") is not None:
                    slices[key]["logs"].append(s["path"])
                else:
                    slices[key] = {
                        "base": s["path"],
                        "base_instant": instant,
                        "logs": [],
                    }
    return slices


def _claim_instant(tdir: str, instant: str, action: str) -> None:
    """O_EXCL claim on <instant>.<action>.requested — the conditional
    put that serializes writers per instant (same discipline as the
    CoW path and delta_native)."""
    try:
        os.close(
            os.open(
                os.path.join(tdir, f"{instant}.{action}.requested"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        )
    except FileExistsError:
        raise RuntimeError(
            f"instant {instant!r} is already claimed by another writer "
            "(requested marker exists); pick a later instant"
        ) from None


def _release_instant(tdir: str, instant: str, action: str) -> None:
    for sfx in ("inflight", f"{action}.requested"):
        try:
            os.remove(os.path.join(tdir, f"{instant}.{sfx}"))
        except FileNotFoundError:
            pass


def _publish_instant(path: str, instant: str, action: str, meta: dict) -> None:
    """Monotonicity re-check + put-if-absent publish of the completed
    instant file, mirroring the CoW publish discipline."""
    tdir = _timeline_dir(path)
    tmp = os.path.join(tdir, f"{instant}.{action}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True, indent=2)
    done_now = [i for i, _ in _mor_timeline(path)]
    if done_now and done_now[-1] >= instant:
        os.remove(tmp)
        raise RuntimeError(
            f"concurrent commit {done_now[-1]!r} completed after this "
            f"writer validated instant {instant!r}; retry at a fresh "
            "instant against the new snapshot"
        )
    try:
        os.link(tmp, os.path.join(tdir, f"{instant}.{action}"))
    except FileExistsError:
        os.remove(tmp)
        raise RuntimeError(
            f"instant {instant!r} was published by another writer"
        ) from None
    os.remove(tmp)
    _release_instant(tdir, instant, action)


def _mor_base_fname_col(instant: str):
    h = F.md5(F.format_string("filegroup-%d", F.col("__bucket")))
    return F.format_string(
        f"%s-%s-%s-%s-%s-%d_0-0-0_{instant}.parquet",
        F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
        F.substring(h, 17, 4), F.substring(h, 21, 12), F.col("__bucket"),
    )


def _mor_stage_groups(
    stamped: DataFrame, path: str, instant: str, partitioned: bool,
    n_groups: int,
) -> list[tuple[str, int, str]]:
    """Distributed write of one parquet per (partition, bucket) group
    into a staging dir; returns [(ppath, bucket, staged file)] with
    ppath decoded from the hive segment (same conventions as the CoW
    path)."""
    stage = os.path.join(path, f".stage-{instant}")
    stage_cols = ["__ppath", "__bucket"] if partitioned else ["__bucket"]
    (
        (stamped if partitioned else stamped.drop("__ppath"))
        .repartition(max(n_groups, 1), *stage_cols)
        .write.mode("overwrite")
        .partitionBy(*stage_cols)
        .parquet(stage)
    )
    out = []
    bucket_dirs = (
        glob.glob(os.path.join(stage, "__ppath=*", "__bucket=*"))
        if partitioned
        else glob.glob(os.path.join(stage, "__bucket=*"))
    )
    for bdir in sorted(bucket_dirs):
        bucket = int(os.path.basename(bdir).split("=")[1])
        ppath = (
            urllib.parse.unquote(
                os.path.basename(os.path.dirname(bdir)).split("=", 1)[1]
            )
            if partitioned
            else ""
        )
        if "/" in ppath:
            raise ValueError(f"partition value {ppath!r} contains '/'")
        parts = sorted(glob.glob(os.path.join(bdir, "part-*.parquet")))
        assert len(parts) == 1, f"expected one file per group, got {parts}"
        out.append((ppath, bucket, parts[0]))
    return out


def _mor_partitioned(path: str) -> bool:
    props = dict(
        line.strip().split("=", 1)
        for line in open(os.path.join(_timeline_dir(path), "hoodie.properties"))
        if "=" in line
    )
    return bool(props.get("hoodie.table.partition.fields"))


def write_hudi_mor(
    df: DataFrame,
    path: str,
    record_key: str,
    instant: str,
    op: str = "upsert",
    partition_by: str | None = None,
) -> str:
    """Commit ``df`` to a Hudi MERGE_ON_READ table; returns the
    instant. ``bulk_insert`` lays out the initial base files (same
    bucket-index layout as CoW); ``upsert`` APPENDS one log file per
    affected file group — the base files are untouched, so an upsert's
    write cost is O(change rows) however large the groups it hits (the
    CoW path would rewrite them whole). Data writes publish
    ``.deltacommit`` instants; ``compact_hudi_mor`` folds logs into
    new bases under a ``.commit`` instant. Change keys must be unique
    per commit (the precombine step is the caller's, as with a Hudi
    writer configured without a precombine field).

    ``delete`` appends TOMBSTONE log rows — Hudi's public
    ``_hoodie_is_deleted`` convention: the key's meta columns plus a
    true marker, data columns null. The snapshot view drops tombstoned
    keys at merge; the read-optimized view serves bases only (deletes
    become visible there after compaction, which materializes
    survivors and drops the marker) — exactly the MoR latency/
    freshness trade. Delete cost is O(keys): one log row per key, no
    base file touched. Partitioned deletes carry the partition column
    in the keys frame and are scoped to their own (key, partition)."""
    if op not in ("bulk_insert", "upsert", "delete"):
        raise ValueError(f"op must be bulk_insert|upsert|delete, got {op!r}")
    tdir = _timeline_dir(path)
    first = not os.path.isdir(tdir)
    os.makedirs(tdir, exist_ok=True)
    props_file = os.path.join(tdir, "hoodie.properties")
    if first:
        props = {
            "hoodie.table.name": os.path.basename(path.rstrip("/")),
            "hoodie.table.type": "MERGE_ON_READ",
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
        if _table_type(path) != "MERGE_ON_READ":
            raise ValueError(
                "table is COPY_ON_WRITE; use write_hudi (table type is "
                "fixed at creation)"
            )
        prior_props = dict(
            line.strip().split("=", 1)
            for line in open(props_file)
            if "=" in line
        )
        if prior_props.get("hoodie.table.partition.fields", "") != (
            partition_by or ""
        ):
            raise ValueError(
                "table partition fields are "
                f"{prior_props.get('hoodie.table.partition.fields', '')!r}; "
                f"this commit declares {partition_by or ''!r}"
            )
    _claim_instant(tdir, instant, "deltacommit")
    try:
        done = [i for i, _ in _mor_timeline(path)]
        if done and done[-1] >= instant:
            raise ValueError(
                f"instant {instant!r} is not after the last completed "
                f"instant {done[-1]!r} (timeline must be monotonic)"
            )
        open(os.path.join(tdir, f"{instant}.inflight"), "w").close()
        return _write_hudi_mor_claimed(
            df, path, record_key, instant, op, partition_by
        )
    except BaseException:
        _release_instant(tdir, instant, "deltacommit")
        raise


def _write_hudi_mor_claimed(
    df: DataFrame,
    path: str,
    record_key: str,
    instant: str,
    op: str,
    partition_by: str | None,
) -> str:
    spark = df.sparkSession
    is_delete = op == "delete"
    if is_delete:
        # keys → tombstones: the table's data schema with nulls
        # everywhere except the key (and partition) columns, plus the
        # public _hoodie_is_deleted marker the merge reader drops on
        slices0 = _mor_slices_at(path)
        if not slices0:
            raise ValueError("delete from an empty table")
        if partition_by and partition_by not in df.columns:
            raise ValueError(
                "delete keys must carry the partition column "
                f"{partition_by!r} (the contract is (key, partition))"
            )
        any_base = os.path.join(path, sorted(slices0.values(),
                                             key=lambda v: v["base"])[0]["base"])
        data_fields = [
            f
            for f in spark.read.parquet(any_base).schema.fields
            if f.name not in _META_COLS
        ]
        df = df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name == record_key
                or (partition_by and f.name == partition_by)
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in data_fields
            ]
        ).withColumn("_hoodie_is_deleted", F.lit(True))
        op = "upsert"  # tombstones append through the log-file path
    ppath_expr = (
        F.col(partition_by).cast("string") if partition_by else F.lit("")
    )
    changes = df.withColumn("__bucket", _bucket_col(record_key)).withColumn(
        "__ppath", ppath_expr
    )
    stamped = (
        changes.withColumn("_hoodie_commit_time", F.lit(instant))
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
        .withColumn("_hoodie_file_name", _mor_base_fname_col(instant))
    )
    slices = _mor_slices_at(path)
    per_partition: dict[str, list] = {}
    if op == "bulk_insert":
        if slices:
            raise ValueError("bulk_insert into a non-empty table")
        staged = _mor_stage_groups(
            stamped, path, instant, bool(partition_by), _N_BUCKETS
        )
        for ppath, bucket, part in staged:
            rel = os.path.join(ppath, _base_file_name(bucket, instant)).lstrip("/")
            pdir_abs = os.path.dirname(os.path.join(path, rel)) or path
            os.makedirs(pdir_abs, exist_ok=True)
            _write_partition_metadata(pdir_abs, ppath, instant)
            n = pq.ParquetFile(part).metadata.num_rows
            os.replace(part, os.path.join(path, rel))
            per_partition.setdefault(ppath, []).append(
                {
                    "fileId": _file_id(bucket),
                    "path": rel,
                    "prevCommit": "null",
                    "numWrites": n,
                    "numUpdateWrites": 0,
                    "fileSizeInBytes": os.path.getsize(os.path.join(path, rel)),
                    "totalWriteBytes": os.path.getsize(os.path.join(path, rel)),
                }
            )
        op_type = "BULK_INSERT"
    else:
        if not slices:
            raise ValueError("upsert into an empty table (bulk_insert first)")
        affected = {
            (r[0], r[1])
            for r in changes.select("__ppath", "__bucket").distinct().collect()
        }
        if is_delete:
            homeless = {
                (pp, b)
                for (pp, b) in affected
                if (pp, _file_id(b)) not in slices
            }
            if homeless:
                raise ValueError(
                    "delete keys match no live file group "
                    f"(e.g. {sorted(homeless)[:2]})"
                )
        # update count: change keys already present in the affected
        # slices (bases + logs)
        old_files = [
            os.path.join(path, rel)
            for (pp, fid), sl in sorted(slices.items())
            if (pp, int(fid.rsplit("-", 1)[1])) in affected
            for rel in [sl["base"], *sl["logs"]]
        ]
        n_updates = (
            spark.read.parquet(*old_files)
            .select(F.col("_hoodie_record_key").alias("k"))
            .distinct()
            .join(
                changes.select(
                    F.col(record_key).cast("string").alias("k")
                ).distinct(),
                "k",
                "left_semi",
            )
            .count()
            if old_files
            else 0
        )
        staged = _mor_stage_groups(
            stamped, path, instant, bool(partition_by), len(affected)
        )
        for ppath, bucket, part in staged:
            fid = _file_id(bucket)
            sl = slices.get((ppath, fid))
            if sl is None:
                # first records ever routed to this group: a log file
                # needs a base to attach to — write the group's base
                rel = os.path.join(
                    ppath, _base_file_name(bucket, instant)
                ).lstrip("/")
                log_version = None
                prev = "null"
            else:
                log_version = len(sl["logs"]) + 1
                rel = os.path.join(
                    ppath,
                    f"logfile-{fid}_{sl['base_instant']}"
                    f".log.{log_version}.parquet",
                ).lstrip("/")
                prev = sl["base_instant"]
            pdir_abs = os.path.dirname(os.path.join(path, rel)) or path
            os.makedirs(pdir_abs, exist_ok=True)
            _write_partition_metadata(pdir_abs, ppath, instant)
            n = pq.ParquetFile(part).metadata.num_rows
            os.replace(part, os.path.join(path, rel))
            stat = {
                "fileId": fid,
                "path": rel,
                "prevCommit": prev,
                "numWrites": n,
                "numUpdateWrites": 0,
                "fileSizeInBytes": os.path.getsize(os.path.join(path, rel)),
                "totalWriteBytes": os.path.getsize(os.path.join(path, rel)),
            }
            if log_version is not None:
                stat["logVersion"] = log_version
            per_partition.setdefault(ppath, []).append(stat)
        if per_partition and n_updates:
            first_pp = sorted(per_partition)[0]
            per_partition[first_pp][0]["numUpdateWrites"] = n_updates
        op_type = "DELETE" if is_delete else "UPSERT"
    shutil.rmtree(os.path.join(path, f".stage-{instant}"))
    _publish_instant(
        path,
        instant,
        "deltacommit",
        {
            "partitionToWriteStats": per_partition,
            "compacted": False,
            "operationType": op_type,
        },
    )
    return instant


def _write_partition_metadata(pdir_abs: str, ppath: str, instant: str) -> None:
    pmeta = os.path.join(pdir_abs, ".hoodie_partition_metadata")
    if ppath and not os.path.exists(pmeta):
        with open(pmeta, "w") as fh:
            fh.write(
                "#partition metadata\n"
                f"commitTime={instant}\npartitionDepth=1\n"
            )


def compact_hudi_mor(spark: SparkSession, path: str, instant: str) -> dict:
    """COMPACTION: fold every file slice's log backlog into a new base
    file published under a ``commit`` instant (the spec's action type
    for compaction). Merged records KEEP their original commit time /
    seqno — compaction moves bytes, not history — so incremental
    queries stay exact. One distributed job: union(bases+logs of
    compacting groups) → latest-per-key → repartition by group →
    one file per group; groups without logs are untouched."""
    if _table_type(path) != "MERGE_ON_READ":
        raise ValueError("compact_hudi_mor requires a MERGE_ON_READ table")
    tdir = _timeline_dir(path)
    slices = _mor_slices_at(path)
    with_logs = {k: v for k, v in slices.items() if v["logs"]}
    if not with_logs:
        return {"instant": None, "compacted_groups": 0}
    _claim_instant(tdir, instant, "commit")
    try:
        done = [i for i, _ in _mor_timeline(path)]
        if done and done[-1] >= instant:
            raise ValueError(
                f"instant {instant!r} is not after the last completed "
                f"instant {done[-1]!r} (timeline must be monotonic)"
            )
        open(os.path.join(tdir, f"{instant}.inflight"), "w").close()

        files = [
            os.path.join(path, rel)
            for (pp, fid), sl in sorted(with_logs.items())
            for rel in [sl["base"], *sl["logs"]]
        ]
        merged = _latest_per_key(
            spark.read.option("mergeSchema", "true").parquet(*files)
        )
        if "_hoodie_is_deleted" in merged.columns:
            # compaction MATERIALIZES deletes: tombstoned keys drop out
            # of the new bases and the marker column disappears
            merged = merged.where(
                ~F.coalesce(F.col("_hoodie_is_deleted"), F.lit(False))
            ).drop("_hoodie_is_deleted")
        # re-derive the group key from the meta columns; only the
        # physical file name moves (same rule as a CoW rewrite)
        merged = (
            merged.withColumn(
                "__bucket",
                F.pmod(F.crc32(F.col("_hoodie_record_key")), F.lit(_N_BUCKETS)),
            )
            .withColumn("__ppath", F.col("_hoodie_partition_path"))
            .withColumn("_hoodie_file_name", _mor_base_fname_col(instant))
        )
        staged = _mor_stage_groups(
            merged, path, instant, _mor_partitioned(path), len(with_logs)
        )
        per_partition: dict[str, list] = {}
        for ppath, bucket, part in staged:
            rel = os.path.join(ppath, _base_file_name(bucket, instant)).lstrip("/")
            n = pq.ParquetFile(part).metadata.num_rows
            os.makedirs(os.path.dirname(os.path.join(path, rel)) or path,
                        exist_ok=True)
            os.replace(part, os.path.join(path, rel))
            per_partition.setdefault(ppath, []).append(
                {
                    "fileId": _file_id(bucket),
                    "path": rel,
                    "prevCommit": with_logs.get(
                        (ppath, _file_id(bucket)), {}
                    ).get("base_instant", "null"),
                    "numWrites": n,
                    "numUpdateWrites": 0,
                    "fileSizeInBytes": os.path.getsize(os.path.join(path, rel)),
                    "totalWriteBytes": os.path.getsize(os.path.join(path, rel)),
                }
            )
        # groups whose every key was tombstoned stage nothing — they
        # still need a write stat and an EMPTY shadowing base, or the
        # old slice (with its live rows) would stay current
        staged_keys = {(pp, _file_id(b)) for pp, b, _ in staged}
        emptied = sorted(set(with_logs) - staged_keys)
        if emptied:
            estage = os.path.join(path, f".stage-empty-{instant}")
            merged.limit(0).drop("__bucket", "__ppath").coalesce(
                1
            ).write.mode("overwrite").parquet(estage)
            (empty_part,) = glob.glob(os.path.join(estage, "part-*.parquet"))
            for pp, fid in emptied:
                bucket = int(fid.rsplit("-", 1)[1])
                rel = os.path.join(
                    pp, _base_file_name(bucket, instant)
                ).lstrip("/")
                os.makedirs(
                    os.path.dirname(os.path.join(path, rel)) or path,
                    exist_ok=True,
                )
                shutil.copyfile(empty_part, os.path.join(path, rel))
                per_partition.setdefault(pp, []).append(
                    {
                        "fileId": fid,
                        "path": rel,
                        "prevCommit": with_logs[(pp, fid)]["base_instant"],
                        "numWrites": 0,
                        "numUpdateWrites": 0,
                        "fileSizeInBytes": os.path.getsize(
                            os.path.join(path, rel)
                        ),
                        "totalWriteBytes": os.path.getsize(
                            os.path.join(path, rel)
                        ),
                    }
                )
            shutil.rmtree(estage)
        shutil.rmtree(os.path.join(path, f".stage-{instant}"))
        _publish_instant(
            path,
            instant,
            "commit",
            {
                "partitionToWriteStats": per_partition,
                "compacted": True,
                "operationType": "COMPACT",
            },
        )
        return {"instant": instant, "compacted_groups": len(with_logs)}
    except BaseException:
        _release_instant(tdir, instant, "commit")
        raise


def _latest_per_key(df: DataFrame) -> DataFrame:
    """Latest record per (partition path, key): commit time desc,
    seqno desc as the deterministic tiebreak. Window partitioned by
    the record key — distributed, never single-partition."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_hoodie_partition_path", "_hoodie_record_key")
        .orderBy(
            F.col("_hoodie_commit_time").desc(),
            F.col("_hoodie_commit_seqno").desc(),
        )
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _read_hudi_mor(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    partition_path: str | None = None,
    view: str = "snapshot",
) -> DataFrame:
    if view not in ("snapshot", "read_optimized"):
        raise ValueError(f"view must be snapshot|read_optimized, got {view!r}")
    slices = _mor_slices_at(path, as_of)
    if partition_path is not None:
        slices = {
            (pp, fid): v for (pp, fid), v in slices.items()
            if pp == partition_path
        }
        if not slices:
            raise ValueError(f"no file slices for partition {partition_path!r}")
    if not slices:
        raise ValueError(f"no completed instants at or before {as_of!r}")
    bases = [
        os.path.join(path, sl["base"]) for _, sl in sorted(slices.items())
    ]
    logs = [
        os.path.join(path, rel)
        for _, sl in sorted(slices.items())
        for rel in sl["logs"]
    ]
    if view == "read_optimized" or not logs:
        return spark.read.parquet(*bases).drop(*_META_COLS)
    # mergeSchema: delete-tombstone log files carry the extra
    # _hoodie_is_deleted column; base rows read it as null (= live)
    merged = _latest_per_key(
        spark.read.option("mergeSchema", "true").parquet(*bases, *logs)
    )
    if "_hoodie_is_deleted" in merged.columns:
        merged = merged.where(
            ~F.coalesce(F.col("_hoodie_is_deleted"), F.lit(False))
        ).drop("_hoodie_is_deleted")
    return merged.drop(*_META_COLS)


# ---------------------------------------------------------------------------
# Registered operators (group A extensions)
# ---------------------------------------------------------------------------

from datalakecrawler_spark.io import load, multi_count  # noqa: E402
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


_T3 = "19700101000000003"


@register(
    "sink_hudi_mor_upsert",
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
           {SUM_D.format("o_totalprice")} as sum_price
    from merged group by o_orderstatus
    """,
)
def sink_hudi_mor_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Hudi MERGE_ON_READ upsert — same merge semantics as the
    CoW twin (sink_hudi_upsert, same oracle) but the upsert APPENDS
    log files instead of rewriting base files: the assertion pins that
    every base file written by the bulk_insert is byte-identical after
    the upsert (mtime-stable path set), with the changes living in
    logfile-*.parquet next to them. Snapshot read = base ⟕ logs merged
    latest-wins by key in one distributed window — this is the
    write-cheap/read-merge half of the CoW/MoR tradeoff, the right
    table type for a high-churn 100 TB upsert stream."""
    path = _fresh(_tmp("orders_hudi_mor"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi_mor(base, path, "o_orderkey", _T1, op="bulk_insert")
    base_files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    base_sizes = [os.path.getsize(f) for f in base_files]
    changes = (
        src.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(src.where(F.col("o_orderstatus") == "P"))
    )
    write_hudi_mor(changes, path, "o_orderkey", _T2, op="upsert")
    after = sorted(
        f for f in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith("logfile-")
    )
    assert after == base_files, "MoR upsert must not rewrite base files"
    assert [os.path.getsize(f) for f in after] == base_sizes
    logs = glob.glob(os.path.join(path, "logfile-*.parquet"))
    assert logs, "upsert must produce log files"
    tl = hudi_timeline(path)
    assert [t["operation"] for t in tl] == ["BULK_INSERT", "UPSERT"], tl
    return (
        read_hudi(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "scan_hudi_mor_read_optimized",
    group="A",
    oracle=f"""
    select count(*) as ro_cnt,
           {SUM_D.format("o_totalprice")} as ro_sum_price
    from orders where o_orderstatus = 'F'
    """,
)
def scan_hudi_mor_read_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: the MoR READ-OPTIMIZED view — base files only, by
    construction stale by exactly the unflushed log backlog. After an
    upsert that only touched logs, the RO view must still serve the
    ORIGINAL bulk-inserted rows (the oracle recomputes them from the
    source), while the snapshot view differs — the freshness/cost
    tradeoff the two MoR views exist to offer. The assertion pins the
    two views apart; at 100 TB the RO view is the one that costs a
    plain parquet scan with zero merge work."""
    path = _fresh(_tmp("orders_hudi_mor_ro"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi_mor(base, path, "o_orderkey", _T1, op="bulk_insert")
    changes = base.where(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2.0
    )
    write_hudi_mor(changes, path, "o_orderkey", _T2, op="upsert")
    ro = read_hudi(spark, path, view="read_optimized")
    snap = read_hudi(spark, path)
    ro_sum = ro.agg(F.sum("o_totalprice")).collect()[0][0]
    snap_sum = snap.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(ro_sum - snap_sum) > 1.0, "views must diverge while logs exist"
    return ro.agg(
        F.count(F.lit(1)).alias("ro_cnt"),
        dsum("o_totalprice").alias("ro_sum_price"),
    )


@register(
    "sink_hudi_mor_compaction",
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
           {SUM_D.format("o_totalprice")} as sum_price
    from merged group by o_orderstatus
    """,
)
def sink_hudi_mor_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: MoR COMPACTION — the maintenance op that folds the log
    backlog into fresh base files under a ``commit`` instant, after
    which the read-optimized view catches up to the snapshot view
    (asserted equal) and the snapshot read needs zero merge work. The
    result must be value-identical to the pre-compaction snapshot (the
    oracle recomputes the merge relationally); merged records keep
    their original commit times so incremental queries are unaffected.
    Compaction is what bounds MoR read amplification: without it the
    merge window grows with every upsert."""
    path = _fresh(_tmp("orders_hudi_mor_cp"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi_mor(base, path, "o_orderkey", _T1, op="bulk_insert")
    changes = (
        src.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(src.where(F.col("o_orderstatus") == "P"))
    )
    write_hudi_mor(changes, path, "o_orderkey", _T2, op="upsert")
    res = compact_hudi_mor(spark, path, _T3)
    assert res["compacted_groups"] > 0, res
    slices = _mor_slices_at(path)
    assert all(not sl["logs"] for sl in slices.values()), "logs must clear"
    tl = hudi_timeline(path)
    assert [t["operation"] for t in tl] == [
        "BULK_INSERT", "UPSERT", "COMPACT",
    ], tl
    snap = read_hudi(spark, path)
    ro = read_hudi(spark, path, view="read_optimized")
    s1 = snap.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    s2 = ro.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert s1 == s2, "after compaction the two views must agree"
    return snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price")
    )


def savepoint_hudi(path: str, instant: str, at_instant: str) -> dict:
    """SAVEPOINT: pin the table state at ``at_instant`` against the
    cleaner — Hudi's retention lease (the timeline's ``.savepoint``
    action). The cleaner keeps every file slice reachable from a
    savepointed state regardless of its retention window, so a
    savepoint makes an old state restorable/time-travelable by name
    for as long as the savepoint lives. Metadata-only: one timeline
    file recording the pinned slices. Delete the ``.savepoint`` file
    (``release_savepoint_hudi``) to let the state age out."""
    mor = _table_type(path) == "MERGE_ON_READ"
    done = (
        [i for i, _ in _mor_timeline(path)]
        if mor
        else _completed_instants(path)
    )
    if at_instant not in done:
        raise ValueError(
            f"instant {at_instant!r} is not a completed instant ({done})"
        )
    if done and done[-1] >= instant:
        raise ValueError(
            f"instant {instant!r} is not after the last completed "
            f"instant {done[-1]!r} (timeline must be monotonic)"
        )
    if mor:
        pinned = sorted(
            {sl["base"] for sl in _mor_slices_at(path, at_instant).values()}
            | {
                log
                for sl in _mor_slices_at(path, at_instant).values()
                for log in sl["logs"]
            }
        )
    else:
        pinned = sorted(
            rel for _i, rel in _slices_at(path, at_instant).values()
        )
    meta = {
        "operationType": "SAVEPOINT",
        "savepointedAt": at_instant,
        "pinnedFiles": pinned,
    }
    tmp = os.path.join(_timeline_dir(path), f"{instant}.savepoint.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True, indent=2)
    os.replace(tmp, os.path.join(_timeline_dir(path), f"{instant}.savepoint"))
    return {"instant": instant, "at": at_instant, "n_pinned": len(pinned)}


def release_savepoint_hudi(path: str, instant: str) -> dict:
    """Delete a savepoint; its pinned state becomes cleanable again."""
    f = os.path.join(_timeline_dir(path), f"{instant}.savepoint")
    if not os.path.exists(f):
        raise ValueError(f"no savepoint at instant {instant!r}")
    with open(f) as fh:
        meta = json.load(fh)
    os.remove(f)
    return {"instant": instant, "at": meta["savepointedAt"]}


def _savepointed_files(path: str) -> set[str]:
    """Union of every live savepoint's pinned file relpaths."""
    pinned: set[str] = set()
    for f in glob.glob(os.path.join(_timeline_dir(path), "*.savepoint")):
        with open(f) as fh:
            pinned.update(json.load(fh)["pinnedFiles"])
    return pinned


def clean_hudi(path: str, instant: str, retain_commits: int = 1) -> dict:
    """CLEANER (the spec's KEEP_LATEST_COMMITS policy): physically
    delete base/log files referenced by NO file slice of the newest
    ``retain_commits`` table states, and publish a ``.clean`` instant
    recording what was reclaimed. This is the storage-reclamation leg
    Hudi shares with Delta's VACUUM and Iceberg's expire_snapshots:
    without it a churn-heavy CoW table keeps every superseded base
    file forever. Time travel to states older than the retained window
    then fails at scan (files gone), the documented post-clean
    behavior; the timeline itself is never rewritten. Metadata-only
    driver work: slice resolution per retained instant + one disk
    walk. Files pinned by a live SAVEPOINT are always retained —
    ``savepoint_hudi`` is the retention lease, release it to let the
    state age out."""
    mor = _table_type(path) == "MERGE_ON_READ"
    timeline = (
        _mor_timeline(path)
        if mor
        else [(i, "commit") for i in _completed_instants(path)]
    )
    if not timeline:
        raise ValueError("clean on an empty timeline")
    if timeline[-1][0] >= instant:
        raise ValueError(
            f"instant {instant!r} is not after the last completed "
            f"instant {timeline[-1][0]!r} (timeline must be monotonic)"
        )
    retained = [i for i, _ in timeline][-retain_commits:]
    keep: set[str] = set()
    for t in retained:
        if mor:
            for sl in _mor_slices_at(path, t).values():
                keep.add(sl["base"])
                keep.update(sl["logs"])
        else:
            for _instant, rel in _slices_at(path, t).values():
                keep.add(rel)
    keep |= _savepointed_files(path)
    on_disk = {
        os.path.relpath(f, path)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if _META_DIR not in f and "/.stage-" not in f
    }
    doomed = sorted(on_disk - keep)
    for rel in doomed:
        os.remove(os.path.join(path, rel))
    meta = {
        "operationType": "CLEAN",
        "retainedInstants": retained,
        "filesDeleted": doomed,
    }
    tmp = os.path.join(_timeline_dir(path), f"{instant}.clean.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True, indent=2)
    os.replace(tmp, os.path.join(_timeline_dir(path), f"{instant}.clean"))
    return {"instant": instant, "files_deleted": len(doomed),
            "retained_instants": retained}


@register(
    "sink_hudi_clean",
    group="A",
    oracle=f"""
    with base as (select * from orders where o_orderstatus = 'F'),
    changes as (
      select * replace (o_totalprice * 1.1 as o_totalprice)
      from orders where o_orderstatus = 'F' and o_orderkey % 2 = 0
    ),
    merged as (
      select * from changes
      union all
      select * from base
      where o_orderkey not in (select o_orderkey from changes)
    )
    select count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price,
           cast(1 as integer) as ok
    from merged
    """,
)
def sink_hudi_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: the Hudi CLEANER — storage reclamation, completing the
    maintenance triad with Delta's VACUUM and Iceberg's
    expire_snapshots. A CoW upsert rewrites every file group (all
    8 bucket groups receive even-keyed changes), leaving 8 superseded
    base files on disk; clean with retain_commits=1 must delete
    exactly those (asserted by count), publish a .clean instant, keep
    the live snapshot byte-identical (the oracle recomputes the merge),
    and make time travel to the cleaned state fail at SCAN (files
    gone, timeline intact) rather than serve partial data."""
    path = _fresh(_tmp("orders_hudi_clean"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi(base, path, "o_orderkey", _T1, op="bulk_insert")
    changes = base.where(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    write_hudi(changes, path, "o_orderkey", _T2, op="upsert")
    n_files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    res = clean_hudi(path, _T3, retain_commits=1)
    assert res["files_deleted"] == 8, res
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == n_files_before - 8
    assert os.path.exists(os.path.join(path, ".hoodie", f"{_T3}.clean"))
    ok = 1
    try:
        read_hudi(spark, path, as_of=_T1).count()
        ok = 0  # cleaned state must not be servable
    except Exception:
        pass
    return read_hudi(spark, path).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
        F.lit(ok).cast("int").alias("ok"),
    )


@register(
    "sink_hudi_delete",
    group="A",
    oracle=f"""
    select count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price,
           count(distinct o_orderstatus) as n_status
    from orders where o_orderstatus <> 'P'
    """,
)
def sink_hudi_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Hudi DELETE by key on a partitioned CoW table. Orders
    bulk-insert partitioned by o_orderstatus; the delete removes EVERY
    'P' order by (key, partition) — which empties every file group of
    the P partition, exercising the slice-shadowing rule: an emptied
    group still publishes a new (empty) base file, because skipping
    its write stat would leave the old slice live and resurrect the
    rows. Asserted: the delete's scope never touched the other
    partitions' files (same physical base files before/after), the
    timeline records a DELETE commit with numDeletes, and time travel
    to the pre-delete instant still serves the P rows. The oracle
    recomputes the survivors."""
    path = _fresh(_tmp("orders_hudi_delete"))
    src = load(spark, sf_dir, "orders")
    write_hudi(
        src, path, "o_orderkey", _T1,
        op="bulk_insert", partition_by="o_orderstatus",
    )
    others_before = sorted(
        f for f in glob.glob(os.path.join(path, "*", "*.parquet"))
        if not f.startswith(os.path.join(path, "P") + os.sep)
    )
    dels = src.where(F.col("o_orderstatus") == "P").select(
        "o_orderkey", "o_orderstatus"
    )
    write_hudi(
        dels, path, "o_orderkey", _T2,
        op="delete", partition_by="o_orderstatus",
    )
    others_after = sorted(
        f for f in glob.glob(os.path.join(path, "*", "*.parquet"))
        if not f.startswith(os.path.join(path, "P") + os.sep)
        and f"_{_T2}.parquet" not in f
    )
    assert others_after == others_before, "delete must not touch other partitions"
    with open(os.path.join(path, ".hoodie", f"{_T2}.commit")) as fh:
        meta = json.load(fh)
    assert meta["operationType"] == "DELETE"
    n_del = sum(
        s.get("numDeletes", 0)
        for stats in meta["partitionToWriteStats"].values()
        for s in stats
    )
    # r10 (guide §1.2): all four assertion counts in ONE action — n_p
    # is over the immutable source, so it folds with the post-delete
    # probes; time travel: the pre-delete snapshot still has the P rows
    n_p, n_src, n_t1, n_p_after = multi_count(
        src.where(F.col("o_orderstatus") == "P"),
        src,
        read_hudi(spark, path, as_of=_T1),
        read_hudi(spark, path).where(F.col("o_orderstatus") == "P"),
    )
    assert n_del == n_p, (n_del, n_p)
    assert n_t1 == n_src
    assert n_p_after == 0
    return read_hudi(spark, path).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


_T4 = "19700101000000004"
_T5 = "19700101000000005"


@register(
    "sink_hudi_savepoint",
    group="A",
    oracle=f"""
    with merged as (
      select o_orderkey,
             case when o_orderkey % 2 = 0 then o_totalprice * 1.1
                  else o_totalprice end as o_totalprice
      from orders where o_orderstatus = 'F'
    )
    select count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price,
           cast(0 as integer) as deleted_while_pinned
    from merged
    """,
)
def sink_hudi_savepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: SAVEPOINT as a retention lease. The F orders bulk-insert
    at T1; an upsert at T2 rewrites every bucket (superseding T1's 8
    base files); a savepoint pins the T1 state, so a clean with
    retain_commits=1 deletes NOTHING (asserted — deleted_while_pinned
    rides in the result) and time travel to T1 still serves the
    pre-upsert rows. Releasing the savepoint lets the next clean
    reclaim exactly the 8 superseded files while the head — which the
    oracle recomputes as the merged state — is untouched. The Hudi
    twin of Iceberg's tag-pins-expiry rule."""
    path = _fresh(_tmp("orders_hudi_savepoint"))
    src = load(spark, sf_dir, "orders")
    base = src.where(F.col("o_orderstatus") == "F")
    write_hudi(base, path, "o_orderkey", _T1, op="bulk_insert")
    changes = base.where(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    write_hudi(changes, path, "o_orderkey", _T2, op="upsert")
    sp = savepoint_hudi(path, _T3, at_instant=_T1)
    assert sp["n_pinned"] == 8, sp
    res1 = clean_hudi(path, _T4, retain_commits=1)
    assert res1["files_deleted"] == 0, res1  # savepoint pins everything
    # r10 (guide §1.2): both assertion counts in ONE action/job
    n_t1, n_base = multi_count(read_hudi(spark, path, as_of=_T1), base)
    assert n_t1 == n_base
    release_savepoint_hudi(path, _T3)
    res2 = clean_hudi(path, _T5, retain_commits=1)
    assert res2["files_deleted"] == 8, res2
    return read_hudi(spark, path).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
        F.lit(res1["files_deleted"]).cast("int").alias("deleted_while_pinned"),
    )


@register(
    "sink_hudi_mor_delete",
    group="A",
    oracle=f"""
    with live as (
      select * from orders
      where o_orderstatus = 'F' and o_orderkey % 3 <> 0
    ),
    ro_before as (
      select count(*) as cnt from orders where o_orderstatus = 'F'
    )
    select count(*) as cnt,
           (select cnt from ro_before) as ro_cnt_before_compact,
           {SUM_D.format('o_totalprice')} as sum_price
    from live
    """,
)
def sink_hudi_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: MERGE_ON_READ DELETE via the public _hoodie_is_deleted
    tombstone convention. The 'F' orders bulk-insert as MoR bases; a
    delete of every o_orderkey ≡ 0 (mod 3) appends ONE tombstone log
    row per key — no base file touched (cost O(keys), the MoR selling
    point). The snapshot view merges the tombstones away; the
    read-optimized view still serves ALL rows until compaction
    (asserted, and its pre-compaction count rides in the result —
    exactly the MoR freshness/latency trade); after compact_hudi_mor
    both views agree and the marker column is gone from the new bases.
    The oracle recomputes the survivors from the source."""
    path = _fresh(_tmp("orders_hudi_mor_del"))
    src = load(spark, sf_dir, "orders")
    f_orders = src.where(F.col("o_orderstatus") == "F")
    write_hudi_mor(f_orders, path, "o_orderkey", _T1, op="bulk_insert")
    write_hudi_mor(
        f_orders.where(F.col("o_orderkey") % 3 == 0).select("o_orderkey"),
        path, "o_orderkey", _T2, op="delete",
    )
    # r10 (guide §1.2): fold each before/after assertion pair into one
    # action (two jobs total instead of four)
    ro_before, n_f = multi_count(
        read_hudi(spark, path, view="read_optimized"), f_orders
    )
    assert ro_before == n_f  # bases untouched pre-compaction
    compact_hudi_mor(spark, path, "19700101000000003")
    snap = read_hudi(spark, path)
    n_ro_after, n_snap = multi_count(
        read_hudi(spark, path, view="read_optimized"), snap
    )
    assert n_ro_after == n_snap
    return snap.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.lit(ro_before).cast("long").alias("ro_cnt_before_compact"),
        dsum("o_totalprice").alias("sum_price"),
    )
