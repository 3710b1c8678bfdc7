"""Native Apache Iceberg table support (format v1) — the PUBLIC
Iceberg table spec (iceberg.apache.org/spec/), implemented in pure
Python over the repo's own Avro codec (sources/avro.py) and Spark's
parquet reader. No pyiceberg / iceberg-spark jar:
``connectors.open_table`` still prefers those when present.

What the spec makes easy at scale — and this module preserves:

- **A snapshot is self-contained.** Unlike a Delta log replay, reading
  Iceberg at snapshot S touches only S's manifest list (one Avro file)
  and the manifests it names: no history walk, O(manifests) metadata
  I/O however old the table is. Time travel = pick a different
  snapshot id from ``metadata.json``.
- **Commits are metadata swaps.** Data parquet is written first by
  Spark's distributed writer; the manifest Avro, manifest list, and
  the next ``v{N}.metadata.json`` are published last, tiny, and
  immutable — the ``version-hint.text`` update is the single
  visibility switch (a conditional put on object stores).
- **Appends reuse prior manifests.** An append snapshot's manifest
  list points at the old manifests PLUS one new manifest — commit cost
  is O(new files), not O(table).
- **Scans stay Catalyst-owned.** The resolved data-file list + schema
  go to ``spark.read.parquet`` — pushdown/pruning/codegen identical to
  any parquet scan.

Honest gates: format v2 features (row-level deletes / delete
manifests, sequence numbers) raise with the exact missing capability;
the type mapping covers the scalar surface + date/timestamp (nested
Iceberg types would map through the same recursive machinery as the
Avro codec if ever needed). Identity partition specs are first-class:
the writer records typed partition values in each manifest entry's
r102 record plus per-manifest field summaries (field-id 507), and
``read_iceberg``'s partition_filter prunes at BOTH metadata levels —
whole manifests whose summary bounds exclude the filter are skipped
without being read, then surviving entries prune file-by-file
(non-identity transforms raise).

Manifest files carry the spec's well-known field-ids (100-105 for
data_file, 500-514 for manifest_file) in the Avro schemas so strict
external readers can resolve columns by id.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalakecrawler_spark.sources.avro import (
    AvroDatumFileWriter,
    decode_avro_blocks,
)

# ---------------------------------------------------------------------------
# Spec schemas (format v1) — Avro schemas with the spec's field-ids
# ---------------------------------------------------------------------------

def _data_file_schema(pfields: list[tuple[str, str]] | None = None) -> dict:
    """The r2 data_file record; ``pfields`` = [(name, avro primitive)]
    for identity-partitioned tables — the spec types the r102
    partition record per the table's partition spec (field-ids
    1000+)."""
    part_fields = [
        {"name": n, "type": t, "field-id": 1000 + i}
        for i, (n, t) in enumerate(pfields or [])
    ]
    return {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {"type": "record", "name": "r102", "fields": part_fields},
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "block_size_in_bytes", "type": "long", "field-id": 105},
        ],
    }


def _manifest_entry_schema(pfields: list[tuple[str, str]] | None = None) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "data_file", "type": _data_file_schema(pfields), "field-id": 2},
        ],
    }


_DATA_FILE_SCHEMA = _data_file_schema()
_MANIFEST_ENTRY_SCHEMA = _manifest_entry_schema()

_FIELD_SUMMARY_SCHEMA = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "lower_bound", "type": ["null", "bytes"], "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"], "field-id": 511},
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": ["null", "long"], "field-id": 503},
        {"name": "added_data_files_count", "type": ["null", "int"], "field-id": 504},
        {"name": "existing_data_files_count", "type": ["null", "int"], "field-id": 505},
        {"name": "deleted_data_files_count", "type": ["null", "int"], "field-id": 506},
        {
            "name": "partitions",
            "type": ["null", {"type": "array", "items": _FIELD_SUMMARY_SCHEMA}],
            "field-id": 507,
        },
        {"name": "added_rows_count", "type": ["null", "long"], "field-id": 512},
        {"name": "existing_rows_count", "type": ["null", "long"], "field-id": 513},
        {"name": "deleted_rows_count", "type": ["null", "long"], "field-id": 514},
    ],
}


def _bound_ser(val, avro_t: str) -> bytes:
    """Iceberg single-value serialization for partition bounds: int =
    4-byte LE, long = 8-byte LE, string = UTF-8."""
    import struct as _struct

    if avro_t == "int":
        return _struct.pack("<i", val)
    if avro_t == "long":
        return _struct.pack("<q", val)
    return str(val).encode("utf-8")


def _bound_deser(b: bytes, avro_t: str):
    import struct as _struct

    if avro_t == "int":
        return _struct.unpack("<i", b)[0]
    if avro_t == "long":
        return _struct.unpack("<q", b)[0]
    return b.decode("utf-8")


def _manifest_pruned(mf: dict, partition_filter: dict, pfields) -> bool:
    """True when the manifest's field summaries prove NO entry can
    match the filter — the whole manifest Avro is then skipped without
    being read. Conservative: a manifest without summaries (older
    writer) is never pruned."""
    summaries = mf.get("partitions")
    if not summaries:
        return False
    for i, (name, avro_t) in enumerate(pfields):
        if name not in partition_filter or i >= len(summaries):
            continue
        s = summaries[i]
        if s["lower_bound"] is None or s["upper_bound"] is None:
            continue
        v = partition_filter[name]
        lo = _bound_deser(s["lower_bound"], avro_t)
        hi = _bound_deser(s["upper_bound"], avro_t)
        if v < lo or v > hi:
            return True
    return False

# manifest_entry.status values (spec)
_ST_EXISTING, _ST_ADDED, _ST_DELETED = 0, 1, 2

# ---------------------------------------------------------------------------
# Type mapping (Iceberg schema JSON ↔ Spark)
# ---------------------------------------------------------------------------

_ICE_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "binary": T.BinaryType(),
}
_SPARK_TO_ICE: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.IntegerType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.StringType, "string"),
    (T.DateType, "date"),
    (T.TimestampNTZType, "timestamp"),
    (T.TimestampType, "timestamptz"),
]


def _spark_schema_to_iceberg(schema: T.StructType) -> dict:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        for spark_t, ice in _SPARK_TO_ICE:
            if isinstance(f.dataType, spark_t):
                fields.append(
                    {"id": i, "name": f.name, "required": False, "type": ice}
                )
                break
        else:
            raise TypeError(
                f"iceberg_native: unsupported Spark type {f.dataType} "
                f"for column {f.name!r} (scalar surface only)"
            )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _iceberg_schema_to_spark(ice: dict) -> T.StructType:
    out = []
    for f in ice["fields"]:
        t = f["type"]
        if not isinstance(t, str) or t.split("(")[0] not in _ICE_TO_SPARK:
            raise NotImplementedError(
                f"iceberg_native: column {f['name']!r} has type {t!r}; "
                "this reader maps the scalar surface only"
            )
        out.append(T.StructField(f["name"], _ICE_TO_SPARK[t], not f.get("required")))
    return T.StructType(out)


# ---------------------------------------------------------------------------
# Metadata location / parsing
# ---------------------------------------------------------------------------


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _read_metadata(path: str) -> dict:
    """Resolve the current table metadata: version-hint.text if
    present, else the highest v*.metadata.json."""
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = int(fh.read().strip())
        f = os.path.join(_meta_dir(path), f"v{v}.metadata.json")
    else:
        cands = sorted(
            glob.glob(os.path.join(_meta_dir(path), "v*.metadata.json")),
            key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
        )
        if not cands:
            raise FileNotFoundError(f"no Iceberg metadata under {_meta_dir(path)}")
        f = cands[-1]
    with open(f) as fh:
        meta = json.load(fh)
    if meta.get("format-version", 1) > 1:
        raise NotImplementedError(
            f"table is format v{meta['format-version']}; this implementation "
            "is v1 (no delete manifests / sequence numbers)"
        )
    return meta


def _resolve(path: str, loc: str) -> str:
    """Manifest/data paths are full URIs per spec; accept file:// and
    table-relative forms too."""
    if loc.startswith("file://"):
        return loc[len("file://"):]
    if os.path.isabs(loc):
        return loc
    return os.path.join(path, loc)


def _decode_avro_records(fname: str) -> list[dict]:
    with open(fname, "rb") as fh:
        buf = fh.read()
    rows: list[dict] = []
    for frame in decode_avro_blocks(buf):
        rows.extend(frame.to_dict("records"))
    return rows


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Snapshot scan: metadata.json → manifest list (Avro) → manifests
    (Avro) → live data-file list → distributed parquet scan. All
    metadata I/O is driver-side and O(manifests); the data scan is a
    plain Catalyst parquet read.

    ``partition_filter={"col": value, ...}`` prunes manifest ENTRIES
    by their typed r102 partition record — files of other partitions
    are never listed, let alone scanned (manifest-level SUMMARY
    skipping, which would also skip whole manifests, is the remaining
    optimization; entry-level pruning already bounds the scan)."""
    meta = _read_metadata(path)
    spec_cols = {
        f["name"]
        for f in meta.get("partition-specs", [{}])[0].get("fields", [])
    }
    if partition_filter:
        missing = set(partition_filter) - spec_cols
        if missing:
            raise ValueError(
                f"partition_filter on non-spec columns {sorted(missing)} "
                f"(spec has {sorted(spec_cols)})"
            )
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    if sid is None or sid == -1 or not snaps:
        return spark.createDataFrame(
            [], _iceberg_schema_to_spark(meta["schema"])
        )
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in table (have {sorted(snaps)})")
    snap = snaps[sid]
    files: list[str] = []
    ice_types = {f["name"]: f["type"] for f in meta["schema"]["fields"]}
    read_pfields = [
        (f["name"], ice_types.get(f["name"], "string"))
        for f in meta.get("partition-specs", [{}])[0].get("fields", [])
    ]
    for mf in _decode_avro_records(_resolve(path, snap["manifest-list"])):
        if partition_filter and _manifest_pruned(
            mf, partition_filter, read_pfields
        ):
            continue  # whole manifest skipped — its Avro is never read
        for entry in _decode_avro_records(_resolve(path, mf["manifest_path"])):
            if entry["status"] == _ST_DELETED:
                continue
            df_rec = entry["data_file"]
            if df_rec["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"data file format {df_rec['file_format']} (parquet only)"
                )
            if partition_filter and any(
                df_rec["partition"].get(k) != v
                for k, v in partition_filter.items()
            ):
                continue
            files.append(_resolve(path, df_rec["file_path"]))
    schema = _iceberg_schema_to_spark(meta["schema"])
    if not files:
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema)
    if spec_cols:
        # hive-style dirs under data/ carry the partition columns;
        # basePath re-derives them with the committed schema's types
        reader = reader.option("basePath", os.path.join(path, "data"))
    return reader.parquet(*files)


def iceberg_snapshots(path: str) -> list[dict]:
    meta = _read_metadata(path)
    return [
        {"snapshot_id": s["snapshot-id"],
         "operation": s.get("summary", {}).get("operation")}
        for s in meta.get("snapshots", [])
    ]


# ---------------------------------------------------------------------------
# Writer (format v1, unpartitioned)
# ---------------------------------------------------------------------------


# Spark dtypes usable as identity partition sources → avro primitive
_PARTITION_AVRO = {"int": "int", "bigint": "long", "string": "string"}


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> int:
    """Commit ``df`` as a new snapshot; returns the snapshot id.
    ``append`` reuses every prior manifest in the new manifest list
    (O(new files) commit); ``overwrite`` starts the file set fresh
    (old snapshots stay readable — files are never deleted here).

    ``partition_by`` declares an identity partition spec: data files
    land under ``data/<col>=<val>/…``, each manifest entry's r102
    partition record carries the TYPED partition values (spec
    field-ids 1000+), and ``read_iceberg``'s partition_filter prunes
    entries from the manifests — metadata-level skipping, the scan
    never lists the other partitions' files. The spec is a table
    property: later commits must repeat it."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    partition_by = list(partition_by or [])
    dtypes = dict(df.dtypes)
    for c in partition_by:
        if dtypes.get(c) not in _PARTITION_AVRO:
            raise TypeError(
                f"identity partition column {c!r} must be one of "
                f"{sorted(_PARTITION_AVRO)} (got {dtypes.get(c)})"
            )
    pfields = [(c, _PARTITION_AVRO[dtypes[c]]) for c in partition_by]
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    os.makedirs(_meta_dir(path), exist_ok=True)

    prior_meta = None
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    if os.path.exists(hint):
        prior_meta = _read_metadata(path)
        prior_spec = [
            f["name"]
            for f in prior_meta.get("partition-specs", [{}])[0].get("fields", [])
        ]
        if prior_spec != partition_by:
            raise ValueError(
                f"table partition spec is {prior_spec}; this commit "
                f"declares {partition_by} — the spec is fixed at table "
                "creation"
            )
    version = 1 if prior_meta is None else (
        max(
            int(os.path.basename(p)[1:].split(".")[0])
            for p in glob.glob(os.path.join(_meta_dir(path), "v*.metadata.json"))
        )
        + 1
    )
    snapshot_id = version  # deterministic, monotone — valid per spec

    # 1) data files (distributed parquet write, then linked under data/)
    stage = os.path.join(path, f"_stage-{version}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)
    entries = []
    n_rows_total = 0

    def _typed(val: str, avro_t: str):
        return int(val) if avro_t in ("int", "long") else val

    staged = sorted(
        glob.glob(os.path.join(stage, *["*=*"] * len(partition_by), "part-*.parquet"))
    )
    for i, f in enumerate(staged):
        pdir = os.path.relpath(os.path.dirname(f), stage) if partition_by else ""
        segs = dict(s.split("=", 1) for s in pdir.split(os.sep) if "=" in s)
        pvals = {n: _typed(segs[n], t) for n, t in pfields}
        rel = os.path.join(
            "data", pdir, f"{snapshot_id:05d}-{i:05d}.parquet"
        ).replace(os.sep + os.sep, os.sep)
        os.makedirs(os.path.dirname(os.path.join(path, rel)), exist_ok=True)
        os.replace(f, os.path.join(path, rel))
        # record_count from the parquet footer (pyarrow, driver-side,
        # bytes not data)
        import pyarrow.parquet as pq

        n = pq.ParquetFile(os.path.join(path, rel)).metadata.num_rows
        n_rows_total += n
        entries.append(
            {
                "status": _ST_ADDED,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": pvals,
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(os.path.join(path, rel)),
                    "block_size_in_bytes": 67108864,
                },
            }
        )
    shutil.rmtree(stage)

    # 2) one new manifest for this snapshot's added files
    manifest_rel = os.path.join("metadata", f"manifest-{snapshot_id:05d}.avro")
    with open(os.path.join(path, manifest_rel), "wb") as fh:
        w = AvroDatumFileWriter(
            fh, _manifest_entry_schema(pfields), "deflate", sync_seed=manifest_rel
        )
        w.write_block(entries)
    summaries = None
    if pfields and entries:
        summaries = []
        for name, avro_t in pfields:
            vals = [e["data_file"]["partition"][name] for e in entries]
            summaries.append(
                {
                    "contains_null": False,
                    "lower_bound": _bound_ser(min(vals), avro_t),
                    "upper_bound": _bound_ser(max(vals), avro_t),
                }
            )
    new_manifest = {
        "manifest_path": manifest_rel,
        "manifest_length": os.path.getsize(os.path.join(path, manifest_rel)),
        "partition_spec_id": 0,
        "added_snapshot_id": snapshot_id,
        "added_data_files_count": len(entries),
        "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
        "partitions": summaries,
        "added_rows_count": n_rows_total,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }

    # 3) manifest list: append keeps the prior snapshot's manifests
    manifests = [new_manifest]
    if mode == "append" and prior_meta and prior_meta.get("current-snapshot-id", -1) != -1:
        prior_snap = {
            s["snapshot-id"]: s for s in prior_meta.get("snapshots", [])
        }[prior_meta["current-snapshot-id"]]
        reused = _decode_avro_records(_resolve(path, prior_snap["manifest-list"]))
        for m in reused:
            # manifests from a pre-summary writer lack the optional
            # partitions field; re-encode them with an explicit null
            m.setdefault("partitions", None)
        manifests += reused
    ml_rel = os.path.join("metadata", f"snap-{snapshot_id:05d}.avro")
    with open(os.path.join(path, ml_rel), "wb") as fh:
        w = AvroDatumFileWriter(
            fh, _MANIFEST_FILE_SCHEMA, "deflate", sync_seed=ml_rel
        )
        w.write_block(manifests)

    # 4) table metadata + atomic version-hint publish
    table_uuid = (
        prior_meta["table-uuid"]
        if prior_meta
        else str(uuid.UUID(hashlib.md5(f"dlc-iceberg:{path}".encode()).hexdigest()))
    )
    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": 0,  # wall clock pinned out: reproducible commits
        "manifest-list": ml_rel,
        "summary": {"operation": "append" if mode == "append" else "overwrite"},
    }
    meta = {
        "format-version": 1,
        "table-uuid": table_uuid,
        "location": path,
        "last-updated-ms": 0,
        "last-column-id": len(df.schema.fields),
        "schema": _spark_schema_to_iceberg(df.schema),
        "partition-spec": [
            {
                "name": c,
                "transform": "identity",
                "source-id": [f.name for f in df.schema.fields].index(c) + 1,
                "field-id": 1000 + i,
            }
            for i, c in enumerate(partition_by)
        ],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": c,
                        "transform": "identity",
                        "source-id": [f.name for f in df.schema.fields].index(c)
                        + 1,
                        "field-id": 1000 + i,
                    }
                    for i, c in enumerate(partition_by)
                ],
            }
        ],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": (prior_meta.get("snapshots", []) if prior_meta else [])
        + [snapshot],
        "snapshot-log": [],
    }
    _publish_metadata(path, version, meta)
    return snapshot_id


class IcebergCommitConflict(Exception):
    """Another writer published this metadata version first. The data
    files and manifest Avro this commit wrote remain valid; re-read
    the table metadata, rebuild the manifest list against the new
    current snapshot, and retry — the catalog-swap OCC loop every
    Iceberg writer runs."""


def _publish_metadata(path: str, version: int, meta: dict) -> None:
    """Atomic put-if-absent on v{N}.metadata.json (the commit lock —
    on an object store, a conditional put; against a catalog, a CAS
    swap), then the version-hint update as the visibility switch.
    Racing writers fail loudly instead of silently last-write-winning
    the same metadata version."""
    mfile = os.path.join(_meta_dir(path), f"v{version}.metadata.json")
    tmp = mfile + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True, indent=1)
    try:
        os.link(tmp, mfile)
    except FileExistsError:
        raise IcebergCommitConflict(
            f"metadata version {version} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    with open(hint + ".tmp", "w") as fh:
        fh.write(str(version))
    os.replace(hint + ".tmp", hint)


def expire_snapshots(path: str, retain_last: int = 1) -> dict:
    """EXPIRE SNAPSHOTS: drop all but the newest ``retain_last``
    snapshots from table metadata and physically delete every manifest
    list, manifest, and data file reachable ONLY from the expired ones
    — Iceberg's storage-reclamation maintenance (the spec keeps
    snapshots immutable, so history pruning is the one sanctioned way
    to free space). Reachability is computed from the retained
    snapshots' manifest lists (driver-side metadata I/O, O(manifests));
    shared files — e.g. manifests an append snapshot reused — survive.
    The pruned metadata publishes as a NEW version via the same
    version-hint atomic swap as a commit; time travel to an expired
    snapshot id then fails by name."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    meta = _read_metadata(path)
    snaps = meta.get("snapshots", [])
    if len(snaps) <= retain_last:
        return {"expired": [], "data_files_deleted": 0, "manifests_deleted": 0}
    keep, expired = snaps[-retain_last:], snaps[:-retain_last]
    if meta.get("current-snapshot-id") not in {s["snapshot-id"] for s in keep}:
        raise ValueError("cannot expire the current snapshot")

    def _reach(snapshots: list[dict]):
        mls, mans, data = set(), set(), set()
        for s in snapshots:
            mls.add(s["manifest-list"])
            for mf in _decode_avro_records(_resolve(path, s["manifest-list"])):
                mans.add(mf["manifest_path"])
                for e in _decode_avro_records(_resolve(path, mf["manifest_path"])):
                    data.add(e["data_file"]["file_path"])
        return mls, mans, data

    k_mls, k_mans, k_data = _reach(keep)
    e_mls, e_mans, e_data = _reach(expired)
    doomed = sorted((e_mls - k_mls) | (e_mans - k_mans) | (e_data - k_data))
    for rel in doomed:
        os.remove(_resolve(path, rel))

    version = (
        max(
            int(os.path.basename(p)[1:].split(".")[0])
            for p in glob.glob(os.path.join(_meta_dir(path), "v*.metadata.json"))
        )
        + 1
    )
    meta["snapshots"] = keep
    _publish_metadata(path, version, meta)
    return {
        "expired": [s["snapshot-id"] for s in expired],
        "data_files_deleted": len([d for d in doomed if d.startswith("data")]),
        "manifests_deleted": len([d for d in doomed if d.startswith("metadata")]),
    }


# ---------------------------------------------------------------------------
# Registered operators (group A extensions)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from datalakecrawler_spark.io import load  # noqa: E402
from datalakecrawler_spark.registry import SUM_D, dsum, register  # noqa: E402
from datalakecrawler_spark.sources.scans import _tmp  # noqa: E402


def _fresh(path: str) -> str:
    if os.path.exists(path):
        shutil.rmtree(path)
    return path


@register(
    "sink_iceberg_native",
    group="A",
    oracle=f"""
    with unioned as (
      select * from orders where o_orderstatus = 'F'
      union all
      select * from orders where o_orderstatus = 'P'
    )
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from unioned group by o_orderstatus
    """,
)
def sink_iceberg_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Iceberg v1 commit + snapshot read. Snapshot 1 overwrites
    with the 'F' orders; snapshot 2 APPENDS the 'P' orders — and per
    spec the append's manifest list simply reuses snapshot 1's manifest
    plus one new one (commit cost O(new files)). The current-snapshot
    read must serve exactly the union; the oracle recomputes it from
    the source. Metadata on disk is the real public layout
    (v{{N}}.metadata.json, snap-*.avro manifest lists, manifest-*.avro
    with spec field-ids), written through our own Avro codec."""
    path = _fresh(_tmp("orders_iceberg"))
    src = load(spark, sf_dir, "orders")
    s1 = write_iceberg(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    s2 = write_iceberg(src.where(F.col("o_orderstatus") == "P"), path, "append")
    assert (s1, s2) == (1, 2), f"unexpected snapshot ids {(s1, s2)}"
    return (
        read_iceberg(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "scan_iceberg_time_travel",
    group="A",
    oracle=f"""
    with s1 as (
      select 1 as snapshot_id, count(*) as cnt,
             {SUM_D.format('o_totalprice')} as sum_price
      from orders where o_orderstatus = 'F'
    ),
    s2 as (
      select 2 as snapshot_id, count(*) as cnt,
             {SUM_D.format('o_totalprice')} as sum_price
      from orders where o_orderstatus = 'O'
    )
    select * from s1 union all select * from s2
    """,
)
def scan_iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Iceberg time travel — snapshot 2 OVERWRITES snapshot 1,
    and reading at each snapshot id serves that snapshot's exact file
    set (a snapshot is self-contained: no log replay, just its own
    manifest list). Old data files stay on disk, so both reads are
    plain parquet scans over disjoint file lists."""
    path = _fresh(_tmp("orders_iceberg_tt"))
    src = load(spark, sf_dir, "orders")
    write_iceberg(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    write_iceberg(src.where(F.col("o_orderstatus") == "O"), path, "overwrite")

    def snap(sid: int) -> DataFrame:
        return (
            read_iceberg(spark, path, snapshot_id=sid)
            .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
            .select(F.lit(sid).alias("snapshot_id"), "cnt", "sum_price")
        )

    return snap(1).unionByName(snap(2))


@register(
    "sink_iceberg_expire",
    group="A",
    oracle=f"""
    select cast(1 as integer) as n_expired,
           cast(3 as integer) as data_files_deleted,
           count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderstatus = 'O'
    """,
)
def sink_iceberg_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: snapshot expiry — the storage-reclamation half of time
    travel. Snapshot 1 overwrites with the 'F' orders in 3 data files;
    snapshot 2 overwrites with the 'O' orders. Expiring all but the
    newest snapshot must delete exactly snapshot 1's 3 data files (its
    manifest + manifest list too), keep the live snapshot serving the
    'O' rows (oracle recomputes them), and make time travel to the
    expired id fail by name rather than scan missing files. Appends
    that SHARE manifests with retained snapshots are protected by the
    reachability walk (pinned in tests/test_iceberg_native.py)."""
    path = _fresh(_tmp("orders_iceberg_exp"))
    src = load(spark, sf_dir, "orders")
    write_iceberg(
        src.where(F.col("o_orderstatus") == "F").repartition(3), path, "overwrite"
    )
    write_iceberg(src.where(F.col("o_orderstatus") == "O"), path, "overwrite")
    res = expire_snapshots(path, retain_last=1)
    assert res["expired"] == [1] and res["data_files_deleted"] == 3, res
    try:
        read_iceberg(spark, path, snapshot_id=1)
        raise AssertionError("time travel to an expired snapshot must fail")
    except ValueError:
        pass
    return read_iceberg(spark, path).agg(
        F.lit(len(res["expired"])).cast("int").alias("n_expired"),
        F.lit(res["data_files_deleted"]).cast("int").alias("data_files_deleted"),
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "sink_iceberg_partitioned",
    group="A",
    oracle=f"""
    select count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders
    where year(cast(o_orderdate as date)) =
          (select min(year(cast(o_orderdate as date))) from orders)
    """,
)
def sink_iceberg_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: identity-partitioned Iceberg table + manifest-entry
    pruning. Orders commit partitioned by order YEAR (an int column —
    the typed r102 partition record round-trips through the Avro
    manifest, not a string-coerced copy); the filtered read prunes
    manifest entries to the earliest year's files before any scan is
    planned, and the partition column comes back typed through the
    hive-style data/ layout. Assertion pins that the pruned file list
    is a strict subset; the oracle recomputes the partition's rows
    from the source. This is the metadata skip that makes Iceberg's
    'query one partition of a 100 TB table' cost one partition."""
    path = _fresh(_tmp("orders_iceberg_part"))
    src = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year(F.to_date("o_orderdate"))
    )
    write_iceberg(src, path, "overwrite", partition_by=["o_year"])
    y0 = src.agg(F.min("o_year")).collect()[0][0]
    full = read_iceberg(spark, path)
    pruned = read_iceberg(spark, path, partition_filter={"o_year": int(y0)})
    n_full = len(full.inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert 0 < n_pruned < n_full, (n_pruned, n_full)
    return pruned.agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price")
    )
