"""Native Delta Lake table support — the PUBLIC Delta transaction
protocol (delta-io PROTOCOL.md: ``_delta_log/%020d.json`` commits of
newline-delimited protocol/metaData/add/remove actions, reader v1 /
writer v2), implemented in pure Python over Spark's parquet reader.
No delta-spark jar: ``connectors.open_table`` still prefers the jar
when present; this module makes the tables themselves real — a table
written here is readable by delta-rs / Spark+delta / DuckDB's delta
extension, because the LOG is the format.

Relationship to ``sources/txlog.py``: txlog is this engine's own
versioned-manifest commit model (same atomic-publish discipline,
engine-private layout); delta_native is the interoperable wire format
of the same idea. Both share the scale story:

- **Commit** = write data files first, publish one JSON log entry by
  atomic rename last — readers never observe partial writes. On an
  object store the rename becomes a conditional put (optimistic
  concurrency), exactly the Delta commit model; nothing else changes.
- **Data files** are written by Spark's own distributed parquet writer
  (executor-parallel, never through the driver); the log entry adds
  one ``add`` action per file with size stats.
- **Read** = replay the log (driver-side: JSON lines, KBs per commit,
  the same cost class as parquet footers), resolve the active file
  set (adds minus removes, last action per path wins), then hand the
  EXPLICIT file list + schema to ``spark.read.parquet`` — scans,
  pushdown, and pruning stay fully distributed and Catalyst-owned.
  Time travel = stop the replay at the requested version.

Parquet CHECKPOINTS (single- and multi-part) are written
(``checkpoint_delta``) and consumed: replay starts from the checkpoint
state — including the table's protocol, configuration, and deletion
vectors — and touches only newer JSON commits, keeping metadata I/O
O(active files) however long the commit history grows.

Reader v2/v3 features (r7-r8): DELETION VECTORS (``delete_delta`` /
``update_delta`` attach roaring bitmaps of doomed row indexes in
protocol-shaped sidecars; scans apply them as one distributed
``_metadata.row_index`` anti join; OPTIMIZE doubles as PURGE; CDF
serves DV commits row-level), COLUMN MAPPING modes name AND id
(``write_delta_column_mapped`` stores physical ``col-<uuid>`` parquet
names — id mode additionally stamps parquet field ids and readers
resolve by THOSE, so foreign rewrites under different names stay
readable; ``rename_delta_column`` is a metadata-only commit; DELETE/
UPDATE work on column-mapped tables through the logical view), TYPE
WIDENING (``widen_delta_column``: metadata-only ALTER COLUMN TYPE,
old narrow parquet promotes natively at scan), and VARIANT columns
(``variantType`` declared automatically when the schema carries one;
footer stats degrade to empty for those files, never to wrong
answers). Scope gates (honest, probed): reader v3 features outside
{deletionVectors, columnMapping, timestampNtz, v2Checkpoint,
typeWidening, variantType}, ``write_delta`` onto a column-mapped
table (use ``write_delta_column_mapped``), and OPTIMIZE of
partitioned shallow clones raise with the exact missing capability
rather than returning wrong answers.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import urllib.parse
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}

# Protocol support surface (PROTOCOL.md "Table Features"): reader v1
# always; v2 = column mapping possibility (mode checked at read); v3 =
# feature-gated — any readerFeature outside this set refuses LOUDLY
# (the protocol's own rule: a reader MUST NOT read a table whose
# features it doesn't implement).
_READER_FEATURES = {
    "deletionVectors",
    "columnMapping",
    "timestampNtz",
    "v2Checkpoint",
    "typeWidening",
    "variantType",
}
_DV_PROTOCOL = {
    "minReaderVersion": 3,
    "minWriterVersion": 7,
    "readerFeatures": ["deletionVectors"],
    "writerFeatures": ["deletionVectors"],
}


def _check_reader_protocol(p: dict) -> None:
    mrv = p.get("minReaderVersion", 1)
    if mrv <= 2:
        return  # v2 only adds column mapping, resolved at read time
    if mrv == 3:
        feats = set(p.get("readerFeatures") or [])
        unsupported = sorted(feats - _READER_FEATURES)
        if unsupported:
            raise NotImplementedError(
                f"table requires reader features {unsupported}; this "
                f"reader implements {sorted(_READER_FEATURES)}"
            )
        return
    raise NotImplementedError(
        f"table requires reader version {mrv}; this reader implements "
        "v1-v3 (deletionVectors, columnMapping, timestampNtz, v2Checkpoint)"
    )


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _commit_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


def _list_versions(path: str) -> list[int]:
    return sorted(
        int(os.path.basename(f)[:-5])
        for f in glob.glob(os.path.join(_log_dir(path), "*.json"))
        if os.path.basename(f)[:-5].isdigit()
    )


def _checkpoint_info(path: str) -> tuple[int, list[str]] | None:
    """(version, checkpoint parquet part paths) from _last_checkpoint,
    or None when the table has no checkpoint. Multi-part checkpoints
    (the protocol's ``parts`` field, part names
    ``{v}.checkpoint.{i}.{parts}.parquet``) resolve to their full part
    list; a missing part is a corrupt checkpoint and fails loudly
    rather than serving a partial file set."""
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as fh:
        info = json.load(fh)
    v = int(info["version"])
    parts = info.get("parts")
    if info.get("path"):
        # V2 checkpoint: _last_checkpoint names the UUID checkpoint
        # file explicitly (its sidecar actions resolve inside
        # _read_checkpoint)
        return v, [os.path.join(_log_dir(path), info["path"])]
    if parts is None:
        classic = os.path.join(_log_dir(path), f"{v:020d}.checkpoint.parquet")
        if not os.path.exists(classic):
            # fallback discovery per protocol: a v2 UUID-named
            # checkpoint at this version
            cands = sorted(
                glob.glob(
                    os.path.join(_log_dir(path), f"{v:020d}.checkpoint.*.parquet")
                )
            )
            if len(cands) == 1:
                return v, cands
        return v, [classic]
    files = [
        os.path.join(
            _log_dir(path),
            f"{v:020d}.checkpoint.{i + 1:010d}.{int(parts):010d}.parquet",
        )
        for i in range(int(parts))
    ]
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise ValueError(
            f"multi-part checkpoint at version {v} is missing "
            f"{len(missing)} of {parts} parts (e.g. "
            f"{os.path.basename(missing[0])})"
        )
    return v, files


def _read_checkpoint(cp_paths: list[str]):
    """Load checkpoint state driver-side (pyarrow — the files are
    metadata-sized: one row per active file + protocol/metaData).
    Parts partition the action set arbitrarily, so reading them in any
    order and merging is exact."""
    import pyarrow.parquet as pq

    active: dict[str, dict] = {}
    schema_string = None
    partition_columns: list[str] = []
    configuration: dict[str, str] = {}
    protocol: dict = dict(_PROTOCOL)
    removed: set[str] = set()
    sidecars: list[str] = []

    def _consume(row: dict, log_dir: str) -> None:
        nonlocal schema_string, partition_columns, configuration, protocol
        if row.get("add") and row["add"].get("path"):
            add = {k: v for k, v in row["add"].items() if v is not None}
            # pyarrow maps come back as [(k, v), ...]
            add["partitionValues"] = dict(add.get("partitionValues") or [])
            dv = add.get("deletionVector")
            if isinstance(dv, dict) and dv.get("storageType") is None:
                add.pop("deletionVector")
            active[add["path"]] = add
        elif row.get("remove") and row["remove"].get("path"):
            # v2 sidecars may carry remove tombstones; they are not
            # part of the active set
            removed.add(row["remove"]["path"])
        elif row.get("metaData") and row["metaData"].get("schemaString"):
            schema_string = row["metaData"]["schemaString"]
            partition_columns = row["metaData"].get("partitionColumns") or []
            configuration = dict(row["metaData"].get("configuration") or [])
        elif row.get("protocol") and row["protocol"].get("minReaderVersion"):
            protocol = {
                k: v for k, v in row["protocol"].items() if v is not None
            }
            _check_reader_protocol(protocol)
        elif row.get("sidecar") and row["sidecar"].get("path"):
            sidecars.append(
                os.path.join(log_dir, "_sidecars", row["sidecar"]["path"])
            )
        # checkpointMetadata rows (v2 marker) carry no state

    for cp_path in cp_paths:
        log_dir = os.path.dirname(cp_path)
        for row in pq.read_table(cp_path).to_pylist():
            _consume(row, log_dir)
    for sc_path in sidecars:
        if not os.path.exists(sc_path):
            raise ValueError(
                f"v2 checkpoint names a missing sidecar {sc_path!r}; "
                "refusing a partial file set"
            )
        for row in pq.read_table(sc_path).to_pylist():
            _consume(row, os.path.dirname(os.path.dirname(sc_path)))
    for rel in removed:
        active.pop(rel, None)
    return active, schema_string, partition_columns, configuration, protocol


def _replay_full(path: str, version: int | None):
    """Replay the log up to ``version`` (inclusive; None = latest).
    Returns (active {relpath: add_action}, schemaString, version,
    partitionColumns, configuration, protocol).

    When the table has a checkpoint at C and the requested version is
    >= C (or latest), state starts from the checkpoint parquet and
    only the JSON commits AFTER C replay — O(1) metadata I/O in table
    history, the protocol's log-scaling mechanism. Requests for
    versions before C fall back to the full JSON replay (this writer
    never deletes JSON commits)."""
    versions = _list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no Delta log at {_log_dir(path)}")
    if version is not None:
        versions = [v for v in versions if v <= version]
        if not versions or versions[-1] != version:
            raise ValueError(
                f"version {version} not in log (have {_list_versions(path)})"
            )
    resolved = versions[-1]
    active: dict[str, dict] = {}
    schema_string = None
    partition_columns: list[str] = []
    configuration: dict[str, str] = {}
    protocol: dict = dict(_PROTOCOL)
    cp = _checkpoint_info(path)
    if cp is not None and resolved >= cp[0]:
        (
            active,
            schema_string,
            partition_columns,
            configuration,
            protocol,
        ) = _read_checkpoint(cp[1])
        versions = [v for v in versions if v > cp[0]]
    for v in versions:
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    schema_string = action["metaData"]["schemaString"]
                    partition_columns = action["metaData"].get(
                        "partitionColumns", []
                    )
                    configuration = (
                        action["metaData"].get("configuration") or {}
                    )
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
                elif "protocol" in action:
                    protocol = action["protocol"]
                    _check_reader_protocol(protocol)
    if schema_string is None:
        raise ValueError("log replay found no metaData action")
    return (
        active,
        schema_string,
        resolved,
        partition_columns,
        configuration,
        protocol,
    )


def _replay(path: str, version: int | None):
    """4-tuple view of ``_replay_full`` (active, schemaString, version,
    partitionColumns) — the shape most call sites want."""
    active, schema_string, resolved, partition_columns, _c, _p = _replay_full(
        path, version
    )
    return active, schema_string, resolved, partition_columns


def last_txn_version(path: str, app_id: str) -> int:
    """Highest ``txn`` (transaction-identifier) action version
    recorded for ``app_id`` across the log, or -1. Streaming writers
    use this per PROTOCOL.md to make commits idempotent: before
    committing batch N they check whether N was already recorded."""
    latest = -1
    for v in _list_versions(path):
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "txn" in a and a["txn"]["appId"] == app_id:
                    latest = max(latest, a["txn"]["version"])
    return latest


def _file_stats_json(fpath: str) -> str:
    """Per-file column statistics from the parquet FOOTER (pyarrow,
    driver-side, bytes not data): the add action's ``stats`` JSON
    ({numRecords, minValues, maxValues, nullCount}) that data skipping
    reads instead of the files. Columns whose row groups lack footer
    stats are simply omitted — skipping is conservative by design.
    Files whose footer pyarrow cannot parse at all (VARIANT columns
    carry a LogicalType newer than its thrift tables) get empty stats
    — every consumer reads stats with .get(), and data skipping
    without stats degrades to scanning the file, never to wrong
    answers."""
    import datetime

    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(fpath).metadata
    except Exception:
        return json.dumps(
            {"minValues": {}, "maxValues": {}, "nullCount": {}},
            sort_keys=True,
        )
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    no_stats: set = set()

    def _plain(v):
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return v

    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            try:
                st = col.statistics
                ok = st is not None and st.has_min_max
                lo, hi = (_plain(st.min), _plain(st.max)) if ok else (None, None)
            except Exception:
                # pyarrow can't extract min/max for every physical type
                # (e.g. decimals) — treat as stats-less, same contract
                ok = False
            if not ok or name in no_stats:
                no_stats.add(name)
                mins.pop(name, None), maxs.pop(name, None)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        },
        sort_keys=True,
    )


def _enforce_or_merge_schema(
    writer_fields: list[dict],
    prior_schema: str,
    mode: str,
    merge_schema: bool,
) -> list[dict]:
    """Schema enforcement with explicit evolution (the Delta
    mergeSchema contract): an append whose schema differs from the
    table's refuses unless ``merge_schema=True``, in which case the
    committed schema becomes prior ∪ new (prior order kept, new
    columns appended; type conflicts always refuse). Old files simply
    lack the new columns — the explicit-schema read serves NULLs
    there, per protocol. Factored out so the OCC retry path can
    re-run it against the post-conflict head (see write_delta's
    publish loop)."""
    prior_fields = json.loads(prior_schema)["fields"]
    prior_by_name = {f["name"]: f for f in prior_fields}
    conflicts = [
        f["name"]
        for f in writer_fields
        if f["name"] in prior_by_name
        and f["type"] != prior_by_name[f["name"]]["type"]
    ]
    if conflicts:
        raise ValueError(f"column type changes are not evolvable: {conflicts}")
    new_names = {f["name"] for f in writer_fields}
    # overwrite_partitions keeps other partitions' data live, so it
    # enforces like an append — a full overwrite may replace the schema
    if mode in ("append", "overwrite_partitions") and new_names != set(
        prior_by_name
    ):
        if not merge_schema:
            raise ValueError(
                f"{mode} schema differs from the table schema "
                f"(new: {sorted(new_names - set(prior_by_name))}, "
                f"missing: {sorted(set(prior_by_name) - new_names)}); "
                "pass merge_schema=True to evolve"
            )
        return prior_fields + [
            f for f in writer_fields if f["name"] not in prior_by_name
        ]
    if mode in ("append", "overwrite_partitions"):
        # same column set: keep the TABLE's field entries in the
        # TABLE's order — they carry protocol metadata the writer's
        # DataFrame schema doesn't know (delta.typeChanges
        # provenance); a full overwrite may still replace the schema
        # wholesale below
        return prior_fields
    return writer_fields


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    now_ms: int | None = None,
    txn: tuple[str, int] | None = None,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
) -> int | None:
    """Commit ``df`` to a Delta table at ``path``; returns the new
    version. ``overwrite`` logically removes the previously active
    files (they stay on disk for time travel, per protocol);
    ``append`` adds alongside them. Data files are written by Spark's
    distributed parquet writer into a per-version staging dir, then
    linked into the table root under version-prefixed names; the JSON
    commit is published last by atomic rename.

    ``txn=(app_id, txn_version)`` stamps the protocol's transaction
    identifier into the commit and makes the write IDEMPOTENT: if the
    log already records ``app_id`` at ``txn_version`` or later the
    call is a no-op returning None — the exactly-once contract a
    streaming foreachBatch sink needs across epoch retries and query
    restarts.

    ``partition_by`` lays files out hive-style (``col=val/…``) and
    records each file's ``partitionValues`` in its add action — the
    hook ``read_delta``'s partition_filter uses to prune files from
    the LOG, before any scan is planned. Partitioning is a table
    property: later commits must repeat the same columns.

    Schema is ENFORCED on append: a differing column set refuses
    unless ``merge_schema=True``, which commits the union (prior
    order kept, new columns appended; type changes always refuse).
    Old files simply lack the new columns — the explicit-schema read
    serves NULLs there, and time travel serves each version under the
    schema it was committed with.

    ``mode="overwrite_partitions"`` is DYNAMIC partition overwrite
    (INSERT OVERWRITE ... PARTITION): only the partitions the new data
    actually lands in are logically replaced — their prior files get
    remove actions — while every other partition's files stay active
    untouched. Requires a partitioned table; the remove set is derived
    from the staged files' partitionValues, so the commit cost is
    O(files in touched partitions), never O(table)."""
    if mode not in ("overwrite", "append", "overwrite_partitions"):
        raise ValueError(
            f"mode must be overwrite|append|overwrite_partitions, got {mode!r}"
        )
    if mode == "overwrite_partitions" and not partition_by:
        raise ValueError(
            "overwrite_partitions needs a partitioned table "
            "(pass partition_by)"
        )
    if txn is not None and os.path.isdir(_log_dir(path)):
        if last_txn_version(path, txn[0]) >= txn[1]:
            return None
    partition_by = list(partition_by or [])
    os.makedirs(_log_dir(path), exist_ok=True)
    versions = _list_versions(path)
    version = (versions[-1] + 1) if versions else 0
    prior_active: dict[str, dict] = {}
    prior_conf: dict[str, str] = {}
    writer_fields = [f.jsonValue() for f in df.schema.fields]
    schema_fields = writer_fields
    prior_protocol: dict = dict(_PROTOCOL)
    if versions:
        prior_active, prior_schema, _, prior_parts, prior_conf, prior_protocol = (
            _replay_full(path, None)
        )
        prior_conf = dict(prior_conf or {})
        # Scope gate (ADVICE r7): this writer commits LOGICAL-named
        # schema/parquet; on a column-mapped table that metaData would
        # silently wipe delta.columnMapping.mode and make old
        # col-<uuid> files resolve to all-NULL columns. Fail loudly,
        # same rule as the reverse direction in
        # write_delta_column_mapped.
        if prior_conf.get("delta.columnMapping.mode", "none") != "none":
            raise NotImplementedError(
                "write_delta on a column-mapped table would commit a "
                "logical-name schema over physical-name data files — "
                "use write_delta_column_mapped for appends/overwrites "
                "of this table"
            )
        if prior_parts != partition_by:
            raise ValueError(
                f"table is partitioned by {prior_parts}; this commit "
                f"declares {partition_by} — partitioning is fixed at "
                "table creation"
            )
        # GENERATED COLUMNS (r9, protocol "Generated Columns" writer
        # requirement): on append, a generated column absent from the
        # writer's frame is COMPUTED from the table's stored
        # expression; a provided one is VERIFIED against it (one
        # bounded existence probe per generated column) — a writer
        # must never commit values the expression contradicts.
        if mode in ("append", "overwrite_partitions"):
            gen_exprs = {
                f["name"]: (f.get("metadata") or {}).get(
                    "delta.generationExpression"
                )
                for f in json.loads(prior_schema)["fields"]
            }
            gen_exprs = {k: v for k, v in gen_exprs.items() if v}
            if gen_exprs:
                from pyspark.sql import functions as _F

                for c, gexpr in sorted(gen_exprs.items()):
                    if c not in df.columns:
                        df = df.withColumn(c, _F.expr(gexpr))
                    elif df.where(
                        ~_F.col(c).eqNullSafe(_F.expr(gexpr))
                    ).limit(1).count():
                        raise ValueError(
                            f"generated column {c!r} was supplied with "
                            f"values that contradict its stored "
                            f"generation expression {gexpr!r}"
                        )
                writer_fields = [f.jsonValue() for f in df.schema.fields]
        schema_fields = _enforce_or_merge_schema(
            writer_fields, prior_schema, mode, merge_schema
        )

    # 1) data files: Spark's executor-parallel parquet writer
    stage = os.path.join(path, f"_stage-{version:020d}-{uuid.uuid4().hex[:8]}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)
    # deterministic mtime stand-in keeps commits reproducible byte-for-
    # byte across reruns (wall clock is not part of query semantics)
    mtime = now_ms if now_ms is not None else 0
    adds = _stage_to_adds(path, stage, version, partition_by, True, mtime)
    shutil.rmtree(stage)

    # 2) actions
    actions: list[dict] = []
    # tables whose schema carries types readers must OPT INTO declare
    # the matching table feature per protocol: a reader without
    # timestampNtz would misread the values as zoned timestamps; one
    # without variantType can't decode the binary-encoded variant pair
    # at all. Checked on EVERY commit, not just v0 — a merge_schema
    # append may introduce the first such column to an existing table.
    # (A recursive TYPE walk, not a json substring match — a column
    # merely NAMED "variant" must not trip the feature.)
    def _type_names(t, acc: set) -> set:
        if isinstance(t, str):
            acc.add(t)
        elif isinstance(t, dict):
            kind = t.get("type")
            acc.add(kind if isinstance(kind, str) else None)
            for sub in ("elementType", "keyType", "valueType"):
                if sub in t:
                    _type_names(t[sub], acc)
            for f in t.get("fields", []) or []:
                _type_names(f.get("type"), acc)
        return acc

    _tnames: set = set()
    for f in schema_fields:
        _type_names(f.get("type"), _tnames)
    feats = sorted(
        feat
        for marker, feat in (
            ("timestamp_ntz", "timestampNtz"),
            ("variant", "variantType"),
        )
        if marker in _tnames
    )
    # WRITER-only features: generatedColumns constrains writers, not
    # readers — declared without raising minReaderVersion (r9)
    wonly = (
        ["generatedColumns"]
        if any(
            (f.get("metadata") or {}).get("delta.generationExpression")
            for f in schema_fields
        )
        else []
    )
    if version == 0:
        if feats or wonly:
            prot = {
                "minReaderVersion": 3 if feats else 1,
                "minWriterVersion": 7,
                "writerFeatures": sorted(set(feats) | set(wonly)),
            }
            if feats:
                prot["readerFeatures"] = feats
            actions.append({"protocol": prot})
        else:
            actions.append({"protocol": dict(_PROTOCOL)})
    elif (set(feats) - set(prior_protocol.get("readerFeatures") or [])) or (
        set(wonly) - set(prior_protocol.get("writerFeatures") or [])
    ):
        rfeats = sorted(
            set(prior_protocol.get("readerFeatures") or []) | set(feats)
        )
        prot = {
            "minReaderVersion": (
                3 if rfeats else prior_protocol.get("minReaderVersion", 1)
            ),
            "minWriterVersion": 7,
            "writerFeatures": sorted(
                set(prior_protocol.get("writerFeatures") or [])
                | set(feats)
                | set(wonly)
            ),
        }
        if rfeats:
            prot["readerFeatures"] = rfeats
        actions.append({"protocol": prot})
    if txn is not None:
        actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
    actions.append(
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{path}".encode()).hexdigest(),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": schema_fields}
                ),
                # carry the table's configuration forward — a fresh
                # metaData action REPLACES the old one wholesale, so
                # {} here would strip table properties set by earlier
                # commits (ADVICE r7)
                "configuration": prior_conf,
                "partitionColumns": partition_by,
                "createdTime": mtime,
            }
        }
    )
    if mode == "overwrite":
        doomed = sorted(prior_active)
    elif mode == "overwrite_partitions":
        touched = {
            tuple(sorted(a["add"]["partitionValues"].items())) for a in adds
        }
        doomed = sorted(
            rel
            for rel, add in prior_active.items()
            if tuple(sorted(add["partitionValues"].items())) in touched
        )
    else:
        doomed = []
    actions += [
        {
            "remove": {
                "path": rel,
                "deletionTimestamp": mtime,
                "dataChange": True,
            }
        }
        for rel in doomed
    ]
    actions += adds
    actions.append(
        {
            "commitInfo": {
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
                "timestamp": mtime,
            }
        }
    )

    # 3) publish: put-if-absent on the version file = the commit lock.
    # Blind appends commute, so losing the race means retrying at the
    # new head's next version with the same adds (per the protocol's
    # conflict rules) — but the metaData action must be REBUILT against
    # the post-conflict head: if the winner was a merge_schema append,
    # re-publishing our pre-conflict (narrower) schemaString would
    # silently revert the evolution. Overwrite's remove set was
    # computed against a snapshot that is now stale, so its conflict
    # surfaces to the caller.
    while True:
        try:
            _publish_commit(path, version, actions)
            return version
        except CommitConflict:
            if mode != "append":
                raise
            if txn is not None and last_txn_version(path, txn[0]) >= txn[1]:
                return None  # the racing commit already recorded our epoch
            _, head_schema, head_v, head_parts, head_conf, head_proto = (
                _replay_full(path, None)
            )
            head_conf = dict(head_conf or {})
            if head_conf.get("delta.columnMapping.mode", "none") != "none":
                raise NotImplementedError(
                    "concurrent commit column-mapped this table; "
                    "retry via write_delta_column_mapped"
                )
            if head_parts != partition_by:
                raise ValueError(
                    f"table is partitioned by {head_parts} after a "
                    f"concurrent commit; this commit declares "
                    f"{partition_by} — partitioning is fixed at table "
                    "creation"
                )
            schema_fields = _enforce_or_merge_schema(
                writer_fields, head_schema, mode, merge_schema
            )
            for a in actions:
                if "metaData" in a:
                    a["metaData"]["schemaString"] = json.dumps(
                        {"type": "struct", "fields": schema_fields}
                    )
                    a["metaData"]["configuration"] = head_conf
            version = head_v + 1
            # the v0-creation protocol belongs to the commit that WON;
            # but a feature upgrade this append carries (first
            # variant/ntz column via merge_schema) must be REBUILT
            # against the post-conflict head, not dropped — committing
            # the column without its feature would hand v1 readers
            # undecodable bytes
            actions = [a for a in actions if "protocol" not in a]
            if set(feats) - set(head_proto.get("readerFeatures") or []):
                actions.insert(
                    0,
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": sorted(
                                set(head_proto.get("readerFeatures") or [])
                                | set(feats)
                            ),
                            "writerFeatures": sorted(
                                set(head_proto.get("writerFeatures") or [])
                                | set(feats)
                            ),
                        }
                    },
                )


def _stage_to_adds(
    path: str,
    stage: str,
    version: int,
    partition_by: list[str],
    data_change: bool,
    mtime: int = 0,
) -> list[dict]:
    """Link a staging dir's parquet outputs into the table root under
    version-prefixed, writer-unique names and return their add actions.
    Hive-style partition dirs are preserved (the %XX-escaped on-disk
    segment stays in the file path; the add action's partitionValues
    carries the DECODED values, per protocol). Shared by write_delta /
    optimize_delta / merge_delta so every writer emits identical add
    shapes."""
    adds: list[dict] = []
    # writer-unique physical file names (the Delta convention): two
    # writers racing the same version must never rename onto each
    # other's data files
    tok = uuid.uuid4().hex[:8]
    staged = sorted(
        glob.glob(os.path.join(stage, *["*=*"] * len(partition_by), "part-*.parquet"))
    )
    for i, f in enumerate(staged):
        pdir = os.path.relpath(os.path.dirname(f), stage) if partition_by else ""
        pvals = {
            k: urllib.parse.unquote(v)
            for k, v in (
                seg.split("=", 1) for seg in pdir.split(os.sep) if "=" in seg
            )
        }
        rel = os.path.join(
            pdir, f"part-{version:05d}-{i:05d}-{tok}-c000.parquet"
        ).lstrip("./")
        os.makedirs(os.path.dirname(os.path.join(path, rel)) or path, exist_ok=True)
        os.replace(f, os.path.join(path, rel))
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": pvals,
                    "size": os.path.getsize(os.path.join(path, rel)),
                    "modificationTime": mtime,
                    "dataChange": data_change,
                    "stats": _file_stats_json(os.path.join(path, rel)),
                }
            }
        )
    return adds


def skip_files(
    active: dict[str, dict], col: str, lo, hi
) -> dict[str, dict]:
    """Data skipping over add-action stats: keep only the files whose
    footer [min, max] range for ``col`` intersects [lo, hi] (either
    bound may be None for open intervals). Conservative: a file
    without stats for the column is always kept — skipping may keep
    extra files, never drop a matching row, so the caller still
    applies the real predicate to the scan."""
    kept: dict[str, dict] = {}
    for rel, add in active.items():
        st = add.get("stats")
        if not st:
            kept[rel] = add
            continue
        s = json.loads(st) if isinstance(st, str) else st
        fmin = s.get("minValues", {}).get(col)
        fmax = s.get("maxValues", {}).get(col)
        if fmin is None or fmax is None:
            kept[rel] = add
            continue
        if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
            continue
        kept[rel] = add
    return kept


# ---------------------------------------------------------------------------
# Deletion vectors (reader v3 feature `deletionVectors`, PROTOCOL.md)
# ---------------------------------------------------------------------------

# Z85 (ZeroMQ RFC 32) — the protocol's encoding for DV UUIDs ('u'
# storage) and inline DV bytes ('i'): 4 binary bytes -> 5 chars.
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def _z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def _z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def _dv_abs_path(table_path: str, desc: dict) -> str:
    """Absolute sidecar path for a 'u' (relative, z85 uuid, optional
    prefix) or 'p' (absolute) DV descriptor."""
    st = desc["storageType"]
    if st == "p":
        loc = desc["pathOrInlineDv"]
        return loc[len("file://"):] if loc.startswith("file://") else loc
    if st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, uid_z85 = enc[:-20], enc[-20:]
        u = uuid.UUID(bytes=_z85_decode(uid_z85))
        name = f"deletion_vector_{u}.bin"
        return os.path.join(table_path, prefix, name) if prefix else os.path.join(
            table_path, name
        )
    raise NotImplementedError(f"DV storageType {st!r}")


def _dv_read_bytes(abs_path: str, offset: int, size: int) -> bytes:
    """One DV's serialized bitmap from a sidecar file: at ``offset``
    sits <4-byte BE length><bitmap bytes><4-byte BE CRC32>, per the
    protocol's DV file storage format; length and checksum both
    verify — a truncated or corrupted sidecar fails loudly instead of
    serving a partial delete."""
    import zlib

    with open(abs_path, "rb") as fh:
        fh.seek(offset)
        (n,) = __import__("struct").unpack(">i", fh.read(4))
        if n != size:
            raise ValueError(
                f"DV at {abs_path}:{offset} declares {n} bytes, descriptor "
                f"says {size}"
            )
        data = fh.read(n)
        (crc,) = __import__("struct").unpack(">I", fh.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch at {abs_path}:{offset}")
    return data


def _dv_positions(table_path: str, desc: dict) -> list[int]:
    """Sorted deleted row indexes for one DV descriptor ('u'/'p'
    sidecar or 'i' inline)."""
    from datalakecrawler_spark.sources.roaring import deserialize_rbm_array

    if desc["storageType"] == "i":
        return deserialize_rbm_array(_z85_decode(desc["pathOrInlineDv"]))
    return deserialize_rbm_array(
        _dv_read_bytes(
            _dv_abs_path(table_path, desc), desc["offset"], desc["sizeInBytes"]
        )
    )


def _dv_write_sidecar(
    table_path: str, per_file_positions: dict[str, list[int]]
) -> dict[str, dict]:
    """Write ONE sidecar holding every touched file's bitmap (the
    protocol's multi-DV file layout: a version byte, then per DV
    <4B BE len><bitmap><4B BE crc32>) and return {relpath: descriptor}.
    One sidecar per commit keeps DV metadata O(1) files per DELETE
    however many data files it touches."""
    import struct as _struct
    import zlib

    from datalakecrawler_spark.sources.roaring import serialize_rbm_array

    u = uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    tmp = os.path.join(table_path, name + ".tmp")
    descs: dict[str, dict] = {}
    with open(tmp, "wb") as fh:
        fh.write(b"\x01")  # format version
        for rel in sorted(per_file_positions):
            data = serialize_rbm_array(per_file_positions[rel])
            offset = fh.tell()
            fh.write(_struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(_struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descs[rel] = {
                "storageType": "u",
                "pathOrInlineDv": _z85_encode(u.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": len(per_file_positions[rel]),
            }
    os.replace(tmp, os.path.join(table_path, name))
    return descs


def _scan_active(
    spark: SparkSession,
    path: str,
    active: dict[str, dict],
    schema: T.StructType,
    partition_columns: list[str],
    keep_rowmeta: bool = False,
) -> DataFrame:
    """The shared physical scan of a resolved active-file set: one
    parquet read of the explicit file list, with every file's deletion
    vector applied as ONE distributed anti join on
    (_metadata.file_path, _metadata.row_index) — the same plan shape as
    the Iceberg positional-delete path. DV bitmaps are decoded in
    EXECUTORS (mapInPandas over the descriptor rows, one task per DV),
    so a 1000-file DELETE never materializes positions on the driver.
    ``keep_rowmeta=True`` keeps the __dlc_file_uri/__dlc_row_pos
    columns for callers (DELETE) that need row addresses.

    When the active set holds ABSOLUTE add paths (a shallow clone
    referencing another table's files), hive-dir basePath re-derivation
    can't work — the dirs live under the SOURCE root. Partition columns
    are instead injected from each add action's stored partitionValues
    via one broadcast join on the file URI (O(files) metadata, zero
    extra scans), cast to the committed schema types."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.sources.iceberg_native import _spark_file_uri

    files = [os.path.join(path, rel) for rel in sorted(active)]
    pv_join = partition_columns and any(os.path.isabs(rel) for rel in active)
    read_schema = (
        T.StructType(
            [f for f in schema.fields if f.name not in partition_columns]
        )
        if pv_join
        else schema
    )
    reader = spark.read.schema(read_schema)
    if partition_columns and not pv_join:
        reader = reader.option("basePath", path)
    out = reader.parquet(*files)
    dv_adds = {
        rel: add for rel, add in active.items() if add.get("deletionVector")
    }
    if not dv_adds and not keep_rowmeta and not pv_join:
        return out
    out = out.withColumn(
        "__dlc_file_uri", F.col("_metadata.file_path")
    ).withColumn("__dlc_row_pos", F.col("_metadata.row_index"))
    if pv_join:
        pv_rows = [
            tuple(
                [_spark_file_uri(os.path.abspath(os.path.join(path, rel)))]
                + [
                    active[rel].get("partitionValues", {}).get(c)
                    for c in partition_columns
                ]
            )
            for rel in sorted(active)
        ]
        pv_df = spark.createDataFrame(
            pv_rows,
            ", ".join(
                ["__dlc_file_uri string"]
                + [f"__dlc_pv_{i} string" for i in range(len(partition_columns))]
            ),
        )
        out = out.join(F.broadcast(pv_df), "__dlc_file_uri", "left")
        for i, c in enumerate(partition_columns):
            out = out.withColumn(
                c, F.col(f"__dlc_pv_{i}").cast(schema[c].dataType)
            ).drop(f"__dlc_pv_{i}")
        # restore the committed column order
        out = out.select(
            *[f.name for f in schema.fields],
            "__dlc_file_uri",
            "__dlc_row_pos",
        )
    if dv_adds:
        rows = []
        for rel, add in sorted(dv_adds.items()):
            d = add["deletionVector"]
            inline = (
                bytearray(_z85_decode(d["pathOrInlineDv"]))
                if d["storageType"] == "i"
                else None
            )
            sidecar = (
                _dv_abs_path(path, d) if d["storageType"] != "i" else None
            )
            rows.append(
                (
                    _spark_file_uri(os.path.abspath(os.path.join(path, rel))),
                    sidecar,
                    d.get("offset", 0) or 0,
                    d["sizeInBytes"],
                    inline,
                )
            )
        desc_df = spark.createDataFrame(
            rows,
            "__dlc_file_uri string, sidecar string, offset long, "
            "size long, inline binary",
        )

        def _expand(batches):
            import pandas as pd

            from datalakecrawler_spark.sources.roaring import (
                deserialize_rbm_array,
            )

            for pdf in batches:
                # name=None: plain tuples in column order — itertuples
                # would mangle the dunder-prefixed column names
                for uri, sidecar, offset, size, inline in pdf.itertuples(
                    index=False, name=None
                ):
                    data = (
                        bytes(inline)
                        if inline is not None
                        else _dv_read_bytes(sidecar, int(offset), int(size))
                    )
                    pos = deserialize_rbm_array(data)
                    yield pd.DataFrame(
                        {
                            "__dlc_file_uri": uri,
                            "__dlc_row_pos": pd.Series(pos, dtype="int64"),
                        }
                    )

        dels = desc_df.repartition(max(1, min(len(rows), 64))).mapInPandas(
            _expand, "__dlc_file_uri string, __dlc_row_pos long"
        )
        # Fail-closed normalization probe (ADVICE r7): the anti join
        # keys driver-computed ``_spark_file_uri`` strings against the
        # executor's ``_metadata.file_path``; descriptor URIs are built
        # from the SAME active set as the scan's file list, so the only
        # way the join can miss (silently resurrecting deleted rows) is
        # the two normalizations drifting apart — an API-drift mode
        # that hits every path at once. One limit-1 row probe (a
        # single early-exit task, O(1) rows at any table size) checks
        # the executor-produced URI is one the driver predicted; the
        # per-file special-character cases are pinned by tests.
        expected = {
            _spark_file_uri(os.path.abspath(os.path.join(path, rel)))
            for rel in active
        }
        probe = out.select("__dlc_file_uri").limit(1).collect()
        if probe and probe[0][0] not in expected:
            raise RuntimeError(
                "DV scan URI normalization drift: executor produced "
                f"{probe[0][0]!r}, which matches no active file URI — "
                "refusing a scan that would resurrect deleted rows"
            )
        out = out.join(dels, ["__dlc_file_uri", "__dlc_row_pos"], "left_anti")
    if not keep_rowmeta:
        out = out.drop("__dlc_file_uri", "__dlc_row_pos")
    return out


def _nullable_twin(dt: T.DataType) -> T.DataType:
    """A copy of ``dt`` with every nested field nullable — the shape a
    CAST can target (a cast cannot prove NOT NULL for struct members);
    the cast is for NAMES, nullability stays the data's."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _nullable_twin(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable_twin(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _nullable_twin(dt.keyType), _nullable_twin(dt.valueType), True
        )
    return dt


def _scan_logical_rowmeta(
    spark: SparkSession,
    path: str,
    active: dict[str, dict],
    schema_string: str,
    conf: dict,
    partition_columns: list[str],
):
    """The DV-aware scan under LOGICAL column names with row addresses
    kept — the matching view DELETE/UPDATE predicates run over. Plain
    tables scan directly; column-mapped (mode=name) tables scan the
    physical schema and project back, so predicates written against
    logical names address the physical rows exactly."""
    from pyspark.sql import functions as F

    schema = T.StructType.fromJson(json.loads(schema_string))
    cm_mode = conf.get("delta.columnMapping.mode", "none")
    if cm_mode == "none":
        return (
            _scan_active(
                spark, path, active, schema, partition_columns,
                keep_rowmeta=True,
            ),
            schema,
            None,
        )
    mapped = json.loads(schema_string)["fields"]
    physical = _cm_physical_struct(mapped, with_field_ids=(cm_mode == "id"))
    if cm_mode == "id":
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    phys_schema = T.StructType.fromJson({"type": "struct", "fields": physical})
    logical = T.StructType.fromJson(
        {"type": "struct", "fields": [{**f, "metadata": {}} for f in mapped]}
    )
    out = _scan_active(
        spark, path, active, phys_schema, partition_columns, keep_rowmeta=True
    ).select(
        *[
            F.col(pf["name"])
            .cast(_nullable_twin(logical[f["name"]].dataType))
            .alias(f["name"])
            for f, pf in zip(mapped, physical)
        ],
        "__dlc_file_uri",
        "__dlc_row_pos",
    )
    return out, logical, {f["name"]: pf["name"] for f, pf in zip(mapped, physical)}


def delete_delta(spark: SparkSession, path: str, predicate: str) -> dict:
    """Row-level DELETE via DELETION VECTORS (reader v3 feature): mark
    the matching rows deleted by attaching a roaring bitmap of their
    row indexes to each touched file — O(matched rows) written, ZERO
    data files rewritten. This is how current engines run low-latency
    deletes (GDPR erasure, CDC retraction) on 100 TB tables: a
    copy-on-write rewrite of every touched file would move terabytes
    to delete kilobytes. The matching scan is distributed (predicate
    over the DV-aware table view, so re-deleting an already-deleted
    row is a no-op); per-file bitmaps are serialized EXECUTOR-SIDE
    (see ``_dv_delete_actions`` — only O(touched files) descriptors
    reach the driver); files whose every remaining row dies drop to a
    plain remove action. A file with an existing DV gets the UNION
    bitmap (the protocol: one DV per file, newest add wins). Commits
    remove+add pairs with ``dataChange: true`` and upgrades the
    protocol to (3, 7) + deletionVectors."""
    (
        active,
        schema_string,
        version,
        partition_columns,
        conf,
        protocol,
    ) = _replay_full(path, None)
    cur, _schema, _phys = _scan_logical_rowmeta(
        spark, path, active, schema_string, conf, partition_columns
    )
    actions, stats = _dv_delete_actions(
        spark, path, active, cur.where(predicate)
    )
    if stats["n_deleted"] == 0:
        return {"version": version, "rows_deleted": 0, "files_touched": 0}
    actions.append(
        {
            "commitInfo": {
                "operation": "DELETE",
                "operationParameters": {"predicate": predicate},
                "timestamp": 0,
            }
        }
    )
    new_version = version + 1
    _publish_commit(path, new_version, actions)
    return {"version": new_version, "rows_deleted": stats["n_deleted"], **{
        k: v for k, v in stats.items() if k != "n_deleted"
    }}


def _dv_delete_actions(
    spark: SparkSession,
    path: str,
    active: dict[str, dict],
    matched_df: DataFrame,
) -> tuple[list[dict], dict]:
    """The DV commit assembly shared by DELETE and UPDATE, fully
    distributed (VERDICT r7 §2 — the r7 version collected every matched
    (file, positions) group to the driver, which a 1%-of-100TB DELETE
    turns into ~10⁹ positions of driver memory plus single-threaded
    bitmap serialization).

    Shape: ``matched_df`` (the new deletions, __dlc_file_uri +
    __dlc_row_pos) joins a broadcast O(active-files) descriptor
    side-table (rel path, existing-DV address, numRecords), is
    repartitioned BY FILE into ≤64 tasks, and each task serializes the
    bitmaps of the files it owns EXECUTOR-SIDE — merging any existing
    bitmap it reads from storage, exactly mirroring the read path's
    executor-side decode — and writes ONE sidecar part for its files
    (tmp + atomic rename, the protocol's multi-DV file layout; a task
    retry orphans at most one unreferenced sidecar, which VACUUM
    collects, same as staged parquet parts). Only O(touched files)
    descriptor rows return to the driver, which assembles remove/add
    actions — the same order the commit path is everywhere else.

    Fail-closed URI resolution: a matched row whose file URI misses
    the descriptor table (driver-computed ``_spark_file_uri`` vs
    executor ``_metadata.file_path`` normalization drift) raises in
    the executor instead of silently not deleting."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.sources.iceberg_native import _spark_file_uri

    table_abs = os.path.abspath(path)
    desc_rows = []
    for rel in sorted(active):
        add = active[rel]
        d = add.get("deletionVector")
        stats_json = add.get("stats")
        num_records = (
            json.loads(stats_json).get("numRecords")
            if isinstance(stats_json, str)
            else None
        )
        desc_rows.append(
            (
                _spark_file_uri(os.path.abspath(os.path.join(path, rel))),
                rel,
                None
                if d is None or d["storageType"] == "i"
                else _dv_abs_path(path, d),
                0 if d is None else int(d.get("offset", 0) or 0),
                0 if d is None else int(d["sizeInBytes"]),
                bytearray(_z85_decode(d["pathOrInlineDv"]))
                if d is not None and d["storageType"] == "i"
                else None,
                -1 if num_records is None else int(num_records),
            )
        )
    desc_df = spark.createDataFrame(
        desc_rows,
        "__dlc_file_uri string, rel string, old_sidecar string, "
        "old_offset long, old_size long, old_inline binary, num_records long",
    )
    joined = matched_df.select("__dlc_file_uri", "__dlc_row_pos").join(
        F.broadcast(desc_df), "__dlc_file_uri", "left"
    )

    def _write_parts(batches):
        import numpy as np
        import pandas as pd

        from datalakecrawler_spark.sources.delta_native import (
            _dv_read_bytes,
            _z85_encode,
        )
        from datalakecrawler_spark.sources.roaring import (
            deserialize_rbm_array,
            serialize_rbm_array,
        )

        meta: dict = {}
        chunks: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            unresolved = pdf[pdf["rel"].isna()]["__dlc_file_uri"]
            if len(unresolved):
                raise ValueError(
                    "DV delete: matched row's file URI did not resolve "
                    f"to an active add action: {unresolved.iloc[0]!r} — "
                    "refusing a silent no-op delete"
                )
            for uri, g in pdf.groupby("__dlc_file_uri", sort=False):
                chunks.setdefault(uri, []).append(
                    g["__dlc_row_pos"].to_numpy(dtype="int64")
                )
                if uri not in meta:
                    r0 = g.iloc[0]
                    meta[uri] = (
                        r0["rel"],
                        r0["old_sidecar"],
                        int(r0["old_offset"]),
                        int(r0["old_size"]),
                        r0["old_inline"],
                        int(r0["num_records"]),
                    )
        if not chunks:
            return
        import struct as _struct
        import uuid as _uuid
        import zlib as _zlib

        u = _uuid.uuid4()
        sidecar_name = f"deletion_vector_{u}.bin"
        tmp = os.path.join(table_abs, sidecar_name + ".tmp")
        out_rows = []
        fh = None
        try:
            for uri in sorted(chunks, key=lambda k: meta[k][0]):
                rel, old_sc, old_off, old_sz, old_inline, nrec = meta[uri]
                new_pos = np.unique(np.concatenate(chunks[uri]))
                n_new = int(len(new_pos))
                merged = [int(x) for x in new_pos]
                if old_inline is not None:
                    merged = sorted(
                        set(merged)
                        | set(deserialize_rbm_array(bytes(old_inline)))
                    )
                elif old_sc is not None:
                    merged = sorted(
                        set(merged)
                        | set(
                            deserialize_rbm_array(
                                _dv_read_bytes(old_sc, old_off, old_sz)
                            )
                        )
                    )
                if nrec >= 0 and len(merged) >= nrec:
                    out_rows.append((rel, None, n_new, True))
                    continue
                data = serialize_rbm_array(merged)
                if fh is None:
                    fh = open(tmp, "wb")
                    fh.write(b"\x01")  # format version
                offset = fh.tell()
                fh.write(_struct.pack(">i", len(data)))
                fh.write(data)
                fh.write(_struct.pack(">I", _zlib.crc32(data) & 0xFFFFFFFF))
                out_rows.append(
                    (
                        rel,
                        json.dumps(
                            {
                                "storageType": "u",
                                "pathOrInlineDv": _z85_encode(u.bytes),
                                "offset": offset,
                                "sizeInBytes": len(data),
                                "cardinality": len(merged),
                            }
                        ),
                        n_new,
                        False,
                    )
                )
        finally:
            if fh is not None:
                fh.close()
        if fh is not None:
            os.replace(tmp, os.path.join(table_abs, sidecar_name))
        yield pd.DataFrame(
            out_rows, columns=["rel", "desc", "n_new", "fully_dead"]
        )

    res = (
        # one shuffle keyed by file so each task owns whole files; the
        # task count tracks the table's file count up to 64 — a 4-file
        # fixture gets 4 python workers, a 100 TB table gets 64 tasks
        # each serializing its files' bitmaps in parallel
        joined.repartition(max(1, min(len(desc_rows), 64)), "__dlc_file_uri")
        .mapInPandas(
            _write_parts,
            "rel string, desc string, n_new long, fully_dead boolean",
        )
        .collect()
    )
    if not res:
        return [], {
            "n_deleted": 0,
            "files_touched": 0,
            "files_removed_entirely": 0,
        }
    n_deleted = sum(r["n_new"] for r in res)
    fully_dead = [r["rel"] for r in res if r["fully_dead"]]
    descs = {r["rel"]: json.loads(r["desc"]) for r in res if not r["fully_dead"]}
    new_positions = descs  # rel → descriptor (names kept for the loop below)
    actions: list[dict] = [{"protocol": dict(_DV_PROTOCOL)}]
    for rel in sorted(set(new_positions) | set(fully_dead)):
        old = active[rel]
        remove = {
            "path": rel,
            "deletionTimestamp": 0,
            "dataChange": True,
            "partitionValues": old.get("partitionValues", {}),
        }
        if old.get("deletionVector"):
            remove["deletionVector"] = old["deletionVector"]
        actions.append({"remove": remove})
        if rel in descs:
            actions.append(
                {
                    "add": {
                        **{
                            k: v
                            for k, v in old.items()
                            if k != "deletionVector"
                        },
                        "dataChange": True,
                        "deletionVector": descs[rel],
                    }
                }
            )
    return actions, {
        "n_deleted": n_deleted,
        "files_touched": len(new_positions) + len(fully_dead),
        "files_removed_entirely": len(fully_dead),
    }


def _write_cdc(path: str, cdf: DataFrame, version: int) -> list[dict]:
    """Write a commit's row-level change record as _change_data/ files
    and return its cdc actions (dataChange=false, so snapshot readers
    skip them while read_delta_changes serves them verbatim)."""
    cdc_stage = os.path.join(
        path, f"_stage-{version:020d}-{uuid.uuid4().hex[:8]}-cdc"
    )
    cdf.write.mode("overwrite").parquet(cdc_stage)
    os.makedirs(os.path.join(path, "_change_data"), exist_ok=True)
    cdc_actions: list[dict] = []
    for i, f in enumerate(
        sorted(glob.glob(os.path.join(cdc_stage, "part-*.parquet")))
    ):
        rel = os.path.join(
            "_change_data",
            f"cdc-{version:05d}-{i:05d}-{uuid.uuid4().hex[:8]}.parquet",
        )
        os.replace(f, os.path.join(path, rel))
        cdc_actions.append(
            {
                "cdc": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(path, rel)),
                    "dataChange": False,
                }
            }
        )
    shutil.rmtree(cdc_stage)
    return cdc_actions


def update_delta(
    spark: SparkSession, path: str, predicate: str, assignments: dict[str, str]
) -> dict:
    """Row-level UPDATE via DELETION VECTORS: rows matching
    ``predicate`` are DV-marked deleted in place (zero rewrite of the
    untouched rows' files) and their updated images — ``assignments``
    maps column → SQL expression over the OLD row — append as new
    files. This is how DV-native engines run UPDATE on 100 TB tables:
    cost is O(matched rows), never a copy-on-write of every touched
    file. The commit also ships the protocol's Change Data Feed record
    (update_preimage/update_postimage under a cdc action), so
    ``read_delta_changes`` serves the row-level update exactly.
    Updated rows that move partitions land in their new hive dirs with
    correct partitionValues. Column-mapped tables work too: the
    predicate and assignments run over the LOGICAL view, and the new
    files stage back under the physical names."""
    from pyspark.sql import functions as F

    (
        active,
        schema_string,
        version,
        partition_columns,
        conf,
        _protocol,
    ) = _replay_full(path, None)
    cur, schema, phys_by_logical = _scan_logical_rowmeta(
        spark, path, active, schema_string, conf, partition_columns
    )
    data_cols = [f.name for f in schema.fields]
    bad = sorted(set(assignments) - set(data_cols))
    if bad:
        raise ValueError(f"assignments to unknown columns {bad}")
    matched_rows = cur.where(predicate).persist()
    try:
        # DV bitmaps serialize executor-side; only O(touched files)
        # descriptor rows come back (see _dv_delete_actions).
        dv_actions, stats = _dv_delete_actions(
            spark, path, active, matched_rows
        )
        if stats["n_deleted"] == 0:
            return {"version": version, "rows_updated": 0, "files_touched": 0}
        old_rows = matched_rows.select(*data_cols)
        new_rows = matched_rows.select(
            *[
                F.expr(assignments[c]).alias(c) if c in assignments else F.col(c)
                for c in data_cols
            ]
        )
        new_version = version + 1
        stage = os.path.join(
            path, f"_stage-{new_version:020d}-{uuid.uuid4().hex[:8]}"
        )
        staged_rows = new_rows
        if phys_by_logical:
            # mapped tables store physical names in the data files
            # (positional cast renames nested struct fields too)
            physical = _cm_physical_struct(
                json.loads(schema_string)["fields"]
            )
            phys_type = T.StructType.fromJson(
                {"type": "struct", "fields": physical}
            )
            staged_rows = new_rows.select(
                *[
                    F.col(c)
                    .cast(phys_type[phys_by_logical[c]].dataType)
                    .alias(phys_by_logical[c])
                    for c in new_rows.columns
                ]
            )
        w = staged_rows.write.mode("overwrite")
        if partition_columns:
            w = w.partitionBy(*partition_columns)
        w.parquet(stage)
        adds = _stage_to_adds(path, stage, new_version, partition_columns, True)
        shutil.rmtree(stage)
        cdf = old_rows.withColumn(
            "_change_type", F.lit("update_preimage")
        ).unionByName(
            new_rows.withColumn("_change_type", F.lit("update_postimage"))
        )
        cdc_actions = _write_cdc(path, cdf, new_version)
        actions = cdc_actions + dv_actions + adds
        actions.append(
            {
                "commitInfo": {
                    "operation": "UPDATE",
                    "operationParameters": {
                        "predicate": predicate,
                        "assignments": json.dumps(
                            dict(sorted(assignments.items()))
                        ),
                    },
                    "timestamp": 0,
                }
            }
        )
        _publish_commit(path, new_version, actions)
        return {
            "version": new_version,
            "rows_updated": stats["n_deleted"],
            "files_touched": stats["files_touched"],
            "files_added": len(adds),
        }
    finally:
        matched_rows.unpersist()


# ---------------------------------------------------------------------------
# Column mapping (reader v2, mode=name — PROTOCOL.md "Column Mapping")
# ---------------------------------------------------------------------------

def _cm_map_fields(fields: list[dict], next_id: list[int]) -> list[dict]:
    """Assign delta.columnMapping.{id,physicalName} metadata to every
    (recursively nested struct) field — the rename-safe indirection:
    parquet stores immutable physical names; logical renames later
    touch only the schemaString."""
    out = []
    for f in fields:
        nf = dict(f)
        next_id[0] += 1
        nf["metadata"] = {
            **(f.get("metadata") or {}),
            "delta.columnMapping.id": next_id[0],
            "delta.columnMapping.physicalName": f"col-{uuid.uuid4()}",
        }
        if isinstance(f["type"], dict) and f["type"].get("type") == "struct":
            nf["type"] = {
                "type": "struct",
                "fields": _cm_map_fields(f["type"]["fields"], next_id),
            }
        out.append(nf)
    return out


def _cm_physical_struct(
    fields: list[dict], with_field_ids: bool = False
) -> list[dict]:
    """The PHYSICAL schema (what the parquet files store): every field
    renamed to its delta.columnMapping.physicalName, recursively.
    ``with_field_ids=True`` (column mapping mode=id) stamps each field
    with ``parquet.field.id`` = its delta.columnMapping.id — the
    metadata key Spark's parquet source writes into the file footer
    and, with ``spark.sql.parquet.fieldId.read.enabled``, uses to
    RESOLVE columns by id instead of by name, per the id-mode protocol
    rule that physical names in the files are not authoritative."""
    out = []
    for f in fields:
        pf = dict(f)
        pf["name"] = f["metadata"]["delta.columnMapping.physicalName"]
        pf["metadata"] = (
            {"parquet.field.id": f["metadata"]["delta.columnMapping.id"]}
            if with_field_ids
            else {}
        )
        if isinstance(f["type"], dict) and f["type"].get("type") == "struct":
            pf["type"] = {
                "type": "struct",
                "fields": _cm_physical_struct(
                    f["type"]["fields"], with_field_ids
                ),
            }
        out.append(pf)
    return out


def write_delta_column_mapped(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    cm_mode: str = "name",
) -> int:
    """Commit ``df`` to a Delta table with COLUMN MAPPING (reader v2 /
    writer v5): data files store immutable physical names
    (``col-<uuid>``), the committed schemaString carries the logical
    names plus the protocol's delta.columnMapping.{id,physicalName}
    field metadata, and reads project physical back to logical. This
    is the indirection that makes renaming a column on a 100 TB table
    a metadata-only commit — no parquet file rewrites. Appends reuse
    the table's existing mapping (matched by logical name; a new
    column set refuses). ``partition_by`` names LOGICAL columns; per
    protocol the hive dirs, add.partitionValues keys, and
    metaData.partitionColumns all carry the PHYSICAL names — which is
    exactly what makes renaming a partition column metadata-only too.

    ``cm_mode`` picks the protocol's mapping mode: ``"name"`` resolves
    parquet columns by their stored physical names; ``"id"``
    additionally stamps every physical field (and parquet footer, via
    Spark's ``parquet.field.id`` write support) with the column's
    mapping id, and readers resolve by THAT id — so even a foreign
    rewrite of a data file under different column names stays
    readable, the contract Iceberg-style engines rely on."""
    writer_fields = df.schema.jsonValue()["fields"]
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode {mode!r}")
    if cm_mode not in ("name", "id"):
        raise ValueError(f"cm_mode must be 'name' or 'id', got {cm_mode!r}")
    prior_version = None
    if os.path.isdir(_log_dir(path)) and _list_versions(path):
        (
            _pa,
            prior_schema,
            prior_version,
            prior_parts,
            prior_conf,
            _pp,
        ) = _replay_full(path, None)
        prior_cm = prior_conf.get("delta.columnMapping.mode", "none")
        if prior_cm == "none":
            raise ValueError(
                "table exists without column mapping; cannot convert in "
                "place (Delta's upgrade rewrites the metadata, not done here)"
            )
        if prior_cm != cm_mode:
            raise ValueError(
                f"table uses column mapping mode {prior_cm!r}; this "
                f"commit declares {cm_mode!r} — the mode is fixed at "
                "table creation"
            )
        mapped = json.loads(prior_schema)["fields"]
        if {f["name"] for f in mapped} != {f["name"] for f in writer_fields}:
            raise ValueError(
                "append schema differs from the mapped table schema"
            )
        max_id = int(prior_conf.get("delta.columnMapping.maxColumnId", 0))
        prior_phys_parts = prior_parts
    else:
        next_id = [0]
        mapped = _cm_map_fields(writer_fields, next_id)
        max_id = next_id[0]
        prior_phys_parts = None
    version = 0 if prior_version is None else prior_version + 1
    os.makedirs(_log_dir(path), exist_ok=True)

    physical = _cm_physical_struct(mapped, with_field_ids=(cm_mode == "id"))
    phys_by_logical = {
        f["name"]: pf["name"] for f, pf in zip(mapped, physical)
    }
    bad_parts = sorted(set(partition_by or []) - set(phys_by_logical))
    if bad_parts:
        raise ValueError(f"partition_by names unknown columns {bad_parts}")
    phys_parts = [phys_by_logical[c] for c in (partition_by or [])]
    if prior_phys_parts is not None and prior_phys_parts != phys_parts:
        raise ValueError(
            f"table is partitioned by physical columns {prior_phys_parts}; "
            f"this commit declares {phys_parts} — partitioning is fixed "
            "at table creation"
        )
    # rename + nested-struct field renames in one positional cast
    phys_type = T.StructType.fromJson({"type": "struct", "fields": physical})
    from pyspark.sql import functions as F

    phys_df = df.select(
        *[
            F.col(f["name"])
            .cast(phys_type[pf["name"]].dataType)
            # id mode: the alias metadata is what makes Spark's parquet
            # writer stamp PARQUET:field_id into the file footers
            # (spark.sql.parquet.fieldId.write.enabled, default on)
            .alias(pf["name"], metadata=pf.get("metadata") or None)
            for f, pf in zip(mapped, physical)
        ]
    )
    stage = os.path.join(path, f"_stage-{version:020d}-{uuid.uuid4().hex[:8]}")
    w = phys_df.write.mode("overwrite")
    if phys_parts:
        w = w.partitionBy(*phys_parts)
    w.parquet(stage)
    adds = _stage_to_adds(path, stage, version, phys_parts, True)
    shutil.rmtree(stage)
    actions: list[dict] = []
    if version == 0:
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": 2,
                    "minWriterVersion": 5,
                }
            }
        )
    actions.append(
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{path}".encode()).hexdigest(),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": mapped}
                ),
                "partitionColumns": phys_parts,
                "configuration": {
                    "delta.columnMapping.mode": cm_mode,
                    "delta.columnMapping.maxColumnId": str(max_id),
                },
                "createdTime": 0,
            }
        }
    )
    if mode == "overwrite" and prior_version is not None:
        active_prior, *_ = _replay_full(path, None)
        actions += [
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
            for rel in sorted(active_prior)
        ]
    actions += adds
    actions.append(
        {
            "commitInfo": {
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
                "timestamp": 0,
            }
        }
    )
    _publish_commit(path, version, actions)
    return version


def rename_delta_column(path: str, old: str, new: str) -> int:
    """RENAME COLUMN as a metadata-only commit — the whole point of
    column mapping: the physical name in every parquet file is
    untouched; only the logical name in the schemaString changes."""
    (
        _active,
        schema_string,
        version,
        partition_columns,
        conf,
        _protocol,
    ) = _replay_full(path, None)
    if conf.get("delta.columnMapping.mode") not in ("name", "id"):
        raise ValueError(
            "rename without rewrite requires column mapping (mode=name or id)"
        )
    fields = json.loads(schema_string)["fields"]
    names = [f["name"] for f in fields]
    if old not in names:
        raise ValueError(f"no column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    for f in fields:
        if f["name"] == old:
            f["name"] = new
    actions = [
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{path}".encode()).hexdigest(),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": fields}),
                "partitionColumns": partition_columns,
                "configuration": conf,
                "createdTime": 0,
            }
        },
        {
            "commitInfo": {
                "operation": "RENAME COLUMN",
                "operationParameters": {"from": old, "to": new},
                "timestamp": 0,
            }
        },
    ]
    _publish_commit(path, version + 1, actions)
    return version + 1


def drop_delta_column(path: str, name: str) -> int:
    """DROP COLUMN as a metadata-only commit (column mapping): the
    field leaves the schemaString; the physical data stays in the
    parquet files but is never read again — dropping a column from a
    100 TB table costs one JSON publish, not a rewrite. The physical
    name is retired with the field, so a later ADD of the same logical
    name maps to a fresh physical column (old values never leak
    back)."""
    (
        _active,
        schema_string,
        version,
        partition_columns,
        conf,
        _protocol,
    ) = _replay_full(path, None)
    if conf.get("delta.columnMapping.mode") not in ("name", "id"):
        raise ValueError(
            "drop without rewrite requires column mapping (mode=name or id)"
        )
    fields = json.loads(schema_string)["fields"]
    names = [f["name"] for f in fields]
    if name not in names:
        raise ValueError(f"no column {name!r} (have {names})")
    if len(fields) == 1:
        raise ValueError("cannot drop the only column")
    fields = [f for f in fields if f["name"] != name]
    actions = [
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{path}".encode()).hexdigest(),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": fields}),
                "partitionColumns": partition_columns,
                "configuration": conf,
                "createdTime": 0,
            }
        },
        {
            "commitInfo": {
                "operation": "DROP COLUMN",
                "operationParameters": {"column": name},
                "timestamp": 0,
            }
        },
    ]
    _publish_commit(path, version + 1, actions)
    return version + 1


# Type Widening (PROTOCOL.md "Type Widening", table feature
# `typeWidening`): the widenings a metadata-only ALTER may declare.
# The set here is the protocol's scalar table RESTRICTED to promotions
# Spark 4's vectorized parquet reader performs natively when handed a
# wider read schema (verified: int32→int64, int32→double, float→double,
# decimal precision growth at fixed scale tail-room, date→timestampNtz)
# — so a widened table needs NO file rewrites and NO per-file casts:
# the existing explicit-schema scan serves old narrow files under the
# new wide schema for free.
_WIDENINGS: dict[str, set[str]] = {
    "byte": {"short", "integer", "long", "double"},
    "short": {"integer", "long", "double"},
    "integer": {"long", "double"},
    "long": set(),  # long→double is lossy above 2^53: NOT a widening
    "float": {"double"},
    "date": {"timestamp_ntz"},
}


def _widening_ok(from_t, to_t) -> bool:
    """True when ``from_t → to_t`` is one of the protocol's allowed
    (and Spark-reader-native) widenings. Decimal(p,s) widens to
    decimal(p',s') when both the scale and the integral digits only
    grow — the protocol's rule, and exactly what the parquet reader
    promotes losslessly."""
    if isinstance(from_t, str) and isinstance(to_t, str):
        if from_t.startswith("decimal(") and to_t.startswith("decimal("):
            fp, fs = map(int, from_t[8:-1].split(","))
            tp, ts = map(int, to_t[8:-1].split(","))
            return ts >= fs and tp - ts >= fp - fs and (tp, ts) != (fp, fs)
        return to_t in _WIDENINGS.get(from_t, set())
    return False


def widen_delta_column(path: str, column: str, new_type: str) -> int:
    """ALTER COLUMN ... TYPE as a METADATA-ONLY commit — the Delta
    ``typeWidening`` table feature (PROTOCOL.md "Type Widening"): the
    schemaString's field type widens, the field's metadata records the
    protocol's ``delta.typeChanges`` provenance entry
    ({fromType, toType, tableVersion}), and the protocol action
    upgrades to reader v3 / writer v7 carrying the feature. NO parquet
    file is touched: Spark's vectorized reader promotes the old narrow
    physical values to the wide read schema at scan time (int32→long
    etc.), so widening a column on a 100 TB table costs one JSON
    publish. Time travel before this commit still serves the narrow
    type. Later appends must supply the widened type (the schema
    enforcement in write_delta already refuses a narrow re-append)."""
    (
        _active,
        schema_string,
        version,
        partition_columns,
        conf,
        protocol,
    ) = _replay_full(path, None)
    if column in partition_columns:
        raise ValueError(
            f"cannot widen partition column {column!r}: partition values "
            "are directory names, not parquet-encoded — a widen would "
            "change their parse type under existing dirs"
        )
    fields = json.loads(schema_string)["fields"]
    names = [f["name"] for f in fields]
    if column not in names:
        raise ValueError(f"no column {column!r} (have {names})")
    new_fields = []
    for f in fields:
        if f["name"] != column:
            new_fields.append(f)
            continue
        old_type = f["type"]
        if old_type == new_type:
            raise ValueError(f"column {column!r} already has type {new_type!r}")
        if not _widening_ok(old_type, new_type):
            raise ValueError(
                f"{old_type!r} → {new_type!r} is not a supported type "
                "widening (lossless, reader-native promotions only: "
                f"{ {k: sorted(v) for k, v in _WIDENINGS.items() if v} } "
                "and decimal precision/scale growth)"
            )
        meta = dict(f.get("metadata") or {})
        # ADVICE r8: the protocol's provenance key is
        # ``delta.typeChanges`` (PROTOCOL.md "Type Widening" — Writer
        # Requirements record type changes under typeChanges), not a
        # typeWidening-named field key; external Delta readers look it
        # up under the spec name.
        meta["delta.typeChanges"] = list(
            meta.get("delta.typeChanges") or []
        ) + [
            {
                "fromType": old_type,
                "toType": new_type,
                "tableVersion": version + 1,
            }
        ]
        new_fields.append({**f, "type": new_type, "metadata": meta})
    reader_feats = sorted(
        set(protocol.get("readerFeatures") or []) | {"typeWidening"}
    )
    writer_feats = sorted(
        set(protocol.get("writerFeatures") or []) | {"typeWidening"}
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": reader_feats,
                "writerFeatures": writer_feats,
            }
        },
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{path}".encode()).hexdigest(),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": new_fields}
                ),
                "partitionColumns": partition_columns,
                "configuration": conf,
                "createdTime": 0,
            }
        },
        {
            "commitInfo": {
                "operation": "CHANGE COLUMN",
                "operationParameters": {
                    "column": column,
                    "toType": new_type,
                },
                "timestamp": 0,
            }
        },
    ]
    _publish_commit(path, version + 1, actions)
    return version + 1


def _read_column_mapped(
    spark: SparkSession,
    path: str,
    active: dict[str, dict],
    schema_string: str,
    partition_columns: list[str],
    cm_mode: str = "name",
) -> DataFrame:
    """Scan a column-mapped table: read the parquet files under their
    PHYSICAL schema, then project every column back to its logical
    name (nested struct fields rename through one positional cast —
    Catalyst folds it into the scan, no row cost). mode=name resolves
    file columns by physical name; mode=id hands Spark a read schema
    stamped with each column's mapping id and flips
    ``spark.sql.parquet.fieldId.read.enabled`` so the scan resolves by
    footer field id — names in the files stop mattering, per
    protocol. The conf is global but inert for schemas without id
    metadata (Spark falls back to name matching), so setting it does
    not change any other read's semantics."""
    from pyspark.sql import functions as F

    mapped = json.loads(schema_string)["fields"]
    logical = T.StructType.fromJson(
        {"type": "struct", "fields": [{**f, "metadata": {}} for f in mapped]}
    )
    if not active:
        return spark.createDataFrame([], logical)
    physical = _cm_physical_struct(mapped, with_field_ids=(cm_mode == "id"))
    if cm_mode == "id":
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    phys_schema = T.StructType.fromJson(
        {"type": "struct", "fields": physical}
    )
    # partition_columns hold PHYSICAL names (protocol); the hive dirs
    # carry them too, so basePath re-derivation works unchanged and
    # the projection below renames them to logical with everything else
    out = _scan_active(spark, path, active, phys_schema, partition_columns)
    return out.select(
        *[
            F.col(pf["name"])
            .cast(_nullable_twin(logical[f["name"]].dataType))
            .alias(f["name"])
            for f, pf in zip(mapped, physical)
        ]
    )


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    partition_filter: dict[str, str] | None = None,
    data_filter: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Log-replay scan: resolve the active file set at ``version``
    (None = latest) driver-side, then let Spark's parquet source scan
    exactly those files with the committed schema — pushdown/pruning/
    codegen unchanged from any parquet read.

    ``partition_filter={"col": "val", ...}`` prunes files from the LOG
    (each add action carries its partitionValues), so a filtered read
    of a partitioned table never even lists the other partitions'
    files — the metadata-level skip that makes a 1-of-N-partition
    query cost 1/N at any table size.

    ``data_filter=(col, lo, hi)`` additionally skips files whose
    footer-stats range for ``col`` can't intersect [lo, hi] (see
    ``skip_files``); conservative, so the caller still applies the
    real predicate — but on a key-clustered layout the scan never
    opens the non-matching files at all.

    Files carrying a DELETION VECTOR (reader v3) scan through
    ``_scan_active``'s distributed bitmap anti join; tables with
    COLUMN MAPPING (reader v2+, mode=name) read physical parquet
    names and project back to logical ones."""
    (
        active,
        schema_string,
        _v,
        partition_columns,
        configuration,
        _protocol,
    ) = _replay_full(path, version)
    cm_mode = configuration.get("delta.columnMapping.mode", "none")
    if cm_mode not in ("none", "name", "id"):
        raise ValueError(
            f"unknown column mapping mode {cm_mode!r} (protocol defines "
            "none/name/id)"
        )
    schema = T.StructType.fromJson(json.loads(schema_string))
    if partition_filter and cm_mode in ("name", "id"):
        # filters name LOGICAL columns; partitionColumns/partitionValues
        # carry the physical names per protocol
        mapped = json.loads(schema_string)["fields"]
        phys_by_logical = {
            f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
            for f in mapped
        }
        unknown = sorted(set(partition_filter) - set(phys_by_logical))
        if unknown:
            raise ValueError(f"partition_filter on unknown columns {unknown}")
        partition_filter = {
            phys_by_logical[k]: v for k, v in partition_filter.items()
        }
    if partition_filter:
        missing = set(partition_filter) - set(partition_columns)
        if missing:
            raise ValueError(
                f"partition_filter on non-partition columns {sorted(missing)} "
                f"(table is partitioned by {partition_columns})"
            )
        active = {
            rel: add
            for rel, add in active.items()
            if all(
                add["partitionValues"].get(k) == v
                for k, v in partition_filter.items()
            )
        }
    if data_filter is not None:
        active = skip_files(active, *data_filter)
    if cm_mode in ("name", "id"):
        return _read_column_mapped(
            spark, path, active, schema_string, partition_columns, cm_mode
        )
    if not active:
        return spark.createDataFrame([], schema)
    return _scan_active(spark, path, active, schema, partition_columns)


class CommitConflict(Exception):
    """Another writer already published this version — the optimistic-
    concurrency signal. Blind appends retry at the next version;
    operations whose action set depends on the read snapshot
    (overwrite/OPTIMIZE/MERGE) surface it to the caller."""


# The protocol's delta.checkpointInterval convention (default 10):
# every K-th published commit also writes a checkpoint, so log replay
# is bounded at <K JSON files however many commits the table takes —
# without this, a long-lived streaming sink degrades to O(history)
# metadata reads per query.
_CHECKPOINT_INTERVAL = 10


def _publish_commit(path: str, version: int, actions: list[dict]) -> None:
    """Atomic put-if-absent: the version file is the commit lock, per
    protocol. os.link refuses to clobber an existing name (the local-FS
    equivalent of an object store's conditional put), so two writers
    racing to version N cannot silently lose one commit — the loser
    gets CommitConflict. Every ``_CHECKPOINT_INTERVAL``-th version
    auto-publishes a checkpoint after the commit lands (all commit
    paths — write/merge/optimize/vacuum — flow through here, so the
    replay bound holds table-wide)."""
    dest = _commit_file(path, version)
    tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"  # per-call: threads share a pid
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, sort_keys=True) + "\n")
    try:
        os.link(tmp, dest)
    except FileExistsError:
        raise CommitConflict(
            f"version {version} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)
    if version > 0 and version % _CHECKPOINT_INTERVAL == 0:
        checkpoint_delta(path)


def checkpoint_delta(
    path: str, parts: int | None = None, v2: bool = False
) -> dict:
    """Write a parquet CHECKPOINT of the latest version's state (one
    row per active file + protocol/metaData/txn rows) and publish it
    via ``_last_checkpoint`` — after this, readers start replay from
    the checkpoint and touch only newer JSON commits: metadata I/O
    stays O(active files), not O(commit history). On a table taking
    thousands of streaming micro-batch commits this is the difference
    between millisecond and minute replays. JSON commits are never
    deleted, so pre-checkpoint time travel still works by full
    replay.

    ``parts=N`` writes the protocol's MULTI-PART form — N parquet
    files named ``{v}.checkpoint.{i}.{N}.parquet`` whose rows
    partition the action set, with ``"parts": N`` in _last_checkpoint.
    A table with millions of active files checkpoints in parallel and
    readers fetch parts concurrently; correctness is unchanged because
    the action set is order-free.

    ``v2=True`` writes the protocol's V2 CHECKPOINT (table feature
    ``v2Checkpoint``): a UUID-named ``{v}.checkpoint.{uuid}.parquet``
    holding protocol/metaData/txn plus a ``checkpointMetadata`` marker
    and ``sidecar`` actions pointing at ``_delta_log/_sidecars/``
    parquet files that carry the add actions — the layout that lets
    writers REUSE unchanged sidecars across checkpoints instead of
    rewriting the whole file-set snapshot every interval. The table's
    protocol upgrades to (3, 7)+v2Checkpoint in its own commit first
    if needed (implied features carried over)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    (
        active,
        schema_string,
        version,
        partition_columns,
        configuration,
        protocol,
    ) = _replay_full(path, None)
    txns = {}
    for v in _list_versions(path):
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if line.strip():
                    a = json.loads(line)
                    if "txn" in a:
                        txns[a["txn"]["appId"]] = max(
                            txns.get(a["txn"]["appId"], -1),
                            a["txn"]["version"],
                        )
    # the table's ACTUAL protocol — checkpointing a reader-v3 (DV /
    # column-mapped) table must never downgrade it back to v1
    rows = [{"protocol": dict(protocol)}]
    rows.append(
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{path}".encode()).hexdigest(),
                "format": {"provider": "parquet"},
                "schemaString": schema_string,
                "partitionColumns": partition_columns,
                "configuration": configuration or {},
            }
        }
    )
    rows += [
        {"txn": {"appId": app, "version": v}} for app, v in sorted(txns.items())
    ]
    for rel in sorted(active):
        add = active[rel]
        rows.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": add.get("partitionValues", {}),
                    "size": add.get("size"),
                    "modificationTime": add.get("modificationTime", 0),
                    "dataChange": False,
                    "stats": add.get("stats"),
                    "deletionVector": add.get("deletionVector"),
                }
            }
        )
    # union-of-structs table: absent action columns stay null per row
    schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string())])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            pa.field(
                "txn",
                pa.struct([("appId", pa.string()), ("version", pa.int64())]),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            pa.field(
                "checkpointMetadata",
                pa.struct(
                    [
                        ("version", pa.int64()),
                        ("tags", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            pa.field(
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("tags", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
        ]
    )
    def _write_part(part_rows: list[dict], fname: str) -> None:
        cols = {name: [r.get(name) for r in part_rows] for name in schema.names}
        # pa.map_ wants list-of-tuples, not dicts
        cols["add"] = [
            (
                {**a, "partitionValues": sorted(a["partitionValues"].items())}
                if a
                else None
            )
            for a in cols["add"]
        ]
        cols["metaData"] = [
            (
                {**m, "configuration": sorted((m.get("configuration") or {}).items())}
                if m
                else None
            )
            for m in cols["metaData"]
        ]
        table = pa.Table.from_pydict(cols, schema=schema)
        pq.write_table(table, fname + ".tmp")
        os.replace(fname + ".tmp", fname)

    if v2 and parts is not None:
        raise ValueError("pass v2=True or parts=N, not both")
    if v2:
        feats = set(protocol.get("readerFeatures") or [])
        if protocol.get("minReaderVersion", 1) < 3 or "v2Checkpoint" not in feats:
            implied = set(feats)
            if configuration.get("delta.columnMapping.mode", "none") != "none":
                implied.add("columnMapping")
            up = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(implied | {"v2Checkpoint"}),
                "writerFeatures": sorted(
                    set(protocol.get("writerFeatures") or [])
                    | implied
                    | {"v2Checkpoint"}
                ),
            }
            _publish_commit(
                path,
                version + 1,
                [
                    {"protocol": up},
                    {
                        "commitInfo": {
                            "operation": "UPGRADE PROTOCOL",
                            "operationParameters": {},
                            "timestamp": 0,
                        }
                    },
                ],
            )
            return checkpoint_delta(path, v2=True)
        os.makedirs(os.path.join(_log_dir(path), "_sidecars"), exist_ok=True)
        sc_name = f"{uuid.uuid4()}.parquet"
        sc_path = os.path.join(_log_dir(path), "_sidecars", sc_name)
        add_rows = [r for r in rows if "add" in r]
        head_rows = [r for r in rows if "add" not in r]
        _write_part(add_rows, sc_path)
        cp_name = f"{version:020d}.checkpoint.{uuid.uuid4()}.parquet"
        _write_part(
            head_rows
            + [
                {"checkpointMetadata": {"version": version, "tags": None}},
                {
                    "sidecar": {
                        "path": sc_name,
                        "sizeInBytes": os.path.getsize(sc_path),
                        "modificationTime": 0,
                        "tags": None,
                    }
                },
            ],
            os.path.join(_log_dir(path), cp_name),
        )
        info = {"version": version, "size": len(rows), "path": cp_name}
        lc = os.path.join(_log_dir(path), "_last_checkpoint")
        with open(lc + ".tmp", "w") as fh:
            json.dump(info, fh)
        os.replace(lc + ".tmp", lc)
        return {
            "version": version,
            "n_files": len(active),
            "n_txns": len(txns),
            "v2": True,
            "checkpoint": cp_name,
            "sidecars": [sc_name],
        }
    info: dict = {"version": version, "size": len(rows)}
    if parts is None:
        _write_part(
            rows,
            os.path.join(_log_dir(path), f"{version:020d}.checkpoint.parquet"),
        )
    else:
        if parts < 1:
            raise ValueError("parts must be >= 1")
        # contiguous chunks; every part file must exist even if empty
        per = -(-len(rows) // parts)
        for i in range(parts):
            _write_part(
                rows[i * per : (i + 1) * per],
                os.path.join(
                    _log_dir(path),
                    f"{version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet",
                ),
            )
        info["parts"] = parts
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    with open(lc + ".tmp", "w") as fh:
        json.dump(info, fh)
    os.replace(lc + ".tmp", lc)
    out = {"version": version, "n_files": len(active), "n_txns": len(txns)}
    if parts is not None:
        out["parts"] = parts
    return out


def _zorder_column(
    cols_bounds: list[tuple[str, float, float]], bits: int = 8
) -> Column:
    """Z-order (Morton) key over numeric columns, pure JVM expressions:
    each column maps to a 2^bits-bucket ordinal over its [lo, hi] range
    (uniform width_bucket — the stats-derived bounds make this a decent
    equi-depth proxy on key-like columns), then the ordinals' bits are
    interleaved so sorting by the key clusters rows that are close in
    EVERY dimension. NULLs bucket to 0. Everything stays inside
    whole-stage codegen — no UDF, no Python."""
    from pyspark.sql import functions as F

    ncols = len(cols_bounds)
    ordinals = []
    for c, lo, hi in cols_bounds:
        if hi <= lo:
            ordinals.append(F.lit(0).cast("long"))
            continue
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)),
            F.lit(2**bits),
        ) - F.lit(1)
        b = F.coalesce(b, F.lit(0))
        ordinals.append(
            F.least(F.greatest(b, F.lit(0)), F.lit(2**bits - 1)).cast("long")
        )
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, b in enumerate(ordinals):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * ncols + ci,
                )
            )
    return z


def optimize_delta(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE: bin-pack small active files into ~target-sized ones
    and commit the rearrangement with ``dataChange: false`` — the
    protocol's marker that the new version holds the SAME rows (so
    incremental/streaming consumers skip it). This is the 100 TB
    housekeeping operator: over-parallel writers leave thousands of
    KB-sized files per partition, and every later scan pays the
    per-file open cost until someone compacts. The rewrite reads only
    the small files (large ones are left in place), coalesces them to
    ceil(total_bytes / target) outputs — a shuffle-free plan — and the
    commit is one JSON publish. Returns a summary dict.

    ``zorder_by=[col, ...]`` switches to OPTIMIZE ZORDER: ALL active
    files rewrite (clustering is a whole-layout property, not a
    small-file patch), range-partitioned on a Morton key interleaving
    the columns' bucket ordinals — so every output file covers a tight
    range in EACH named column and ``skip_files`` prunes selective
    predicates on ANY of them. Column bounds come from the add-action
    stats already in the log (no extra scan); the sort is one range
    shuffle. This is the layout operator that turns a 100 TB full scan
    into a handful of file opens for multi-dimension point/range
    queries. Z-order columns must be numeric with logged stats.

    Partitioned tables bin-pack WITHIN each partitionValues group (a
    data file belongs to exactly one partition, so cross-partition
    packing would be protocol-invalid): each group's files are
    rewritten independently and the outputs land back in that group's
    hive dir. Groups are independent rewrites — an engine with a job
    scheduler runs them concurrently; here they run as successive
    jobs and publish under ONE commit, so readers see the whole
    compaction atomically."""
    active, schema_string, version, partition_columns = _replay(path, None)
    schema = T.StructType.fromJson(json.loads(schema_string))
    # partition columns live in the directory name, not the data files:
    # the group rewrite reads and writes data-only schemas
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in partition_columns]
    )
    if zorder_by:
        bad = set(zorder_by) - {f.name for f in data_schema.fields}
        if bad:
            raise ValueError(
                f"zorder_by columns {sorted(bad)} not in the data schema"
            )
    groups: dict[tuple, list[str]] = {}
    for rel in sorted(active):
        if (
            zorder_by
            or active[rel]["size"] < target_file_bytes
            or active[rel].get("deletionVector")
        ):
            key = tuple(sorted(active[rel]["partitionValues"].items()))
            groups.setdefault(key, []).append(rel)
    if not zorder_by:
        # DV-bearing files compact even alone — OPTIMIZE doubles as the
        # protocol's PURGE: survivors materialize, the DV drops
        groups = {
            k: rels
            for k, rels in groups.items()
            if len(rels) >= 2
            or any(active[r].get("deletionVector") for r in rels)
        }
    if not groups:
        return {"version": version, "files_compacted": 0, "files_written": 0}
    new_version = version + 1
    actions: list[dict] = []
    adds: list[dict] = []
    small: list[str] = []
    for key, rels in sorted(groups.items()):
        total = sum(active[rel]["size"] for rel in rels)
        n_out = max(1, -(-total // target_file_bytes))
        # DV-aware rewrite: deleted rows must not resurrect into the
        # compacted files; the rewrite materializes survivors and the
        # new adds carry no deletionVector
        df = _scan_active(
            spark, path, {rel: active[rel] for rel in rels}, data_schema, []
        )
        if zorder_by:
            bounds = []
            for c in zorder_by:
                los, his = [], []
                for rel in rels:
                    st = active[rel].get("stats")
                    s = json.loads(st) if isinstance(st, str) else (st or {})
                    lo = s.get("minValues", {}).get(c)
                    hi = s.get("maxValues", {}).get(c)
                    if isinstance(lo, (int, float)) and isinstance(
                        hi, (int, float)
                    ):
                        los.append(float(lo))
                        his.append(float(hi))
                if not los:
                    raise ValueError(
                        f"zorder_by column {c!r} has no numeric min/max "
                        "stats in the log — z-ordering needs bounds"
                    )
                bounds.append((c, min(los), max(his)))
            from pyspark.sql import functions as F

            df = (
                df.withColumn("__dlc_z", _zorder_column(bounds))
                .repartitionByRange(n_out, F.col("__dlc_z"))
                .sortWithinPartitions("__dlc_z")
                .drop("__dlc_z")
            )
        else:
            df = df.coalesce(n_out)
        stage = os.path.join(
            path, f"_stage-{new_version:020d}-{uuid.uuid4().hex[:8]}"
        )
        if partition_columns and any(os.path.isabs(r) for r in rels):
            # partitioned SHALLOW CLONE group: the source files live
            # under the SOURCE root, so their dirname is unusable —
            # re-materialize the hive layout under the CLONE root by
            # injecting the group's stored partitionValues as literal
            # columns and letting Spark's writer create (and escape)
            # the partition dirs; _stage_to_adds re-derives the
            # partitionValues from those dirs, so the compacted adds
            # are ordinary RELATIVE partitioned adds from here on
            from pyspark.sql import functions as F

            pv = dict(key)
            out_df = df
            for c in partition_columns:
                out_df = out_df.withColumn(
                    c, F.lit(pv.get(c)).cast(schema[c].dataType)
                )
            out_df.write.mode("overwrite").partitionBy(
                *partition_columns
            ).parquet(stage)
        else:
            # outputs go back into the group's own hive dir: every
            # file in the group shares one partition directory by
            # construction
            pdir = os.path.dirname(rels[0])
            gstage = os.path.join(stage, pdir) if pdir else stage
            df.write.mode("overwrite").parquet(gstage)
        adds += _stage_to_adds(
            path, stage, new_version, partition_columns, False
        )
        shutil.rmtree(stage)
        small += rels
    actions += [
        {"remove": {"path": rel, "deletionTimestamp": 0, "dataChange": False}}
        for rel in sorted(small)
    ]
    actions += adds
    op_params: dict[str, str] = {"targetSize": str(target_file_bytes)}
    if zorder_by:
        op_params["zOrderBy"] = json.dumps(list(zorder_by))
    actions.append(
        {
            "commitInfo": {
                "operation": "OPTIMIZE",
                "operationParameters": op_params,
                "timestamp": 0,
            }
        }
    )
    _publish_commit(path, new_version, actions)
    return {
        "version": new_version,
        "files_compacted": len(small),
        "files_written": len(adds),
    }


def merge_delta(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    partition_scope: dict[str, str] | None = None,
) -> dict:
    """MERGE (upsert by key): update matched rows, insert the rest —
    executed the way Delta engines actually run it, as a FILE-LEVEL
    selective rewrite. Phase 1 finds the active files containing any
    matched key (one semi-join over ``input_file_name()``, result
    bounded by the file count); phase 2 rewrites ONLY those files —
    their unmatched survivors plus all change rows — and commits
    remove(matched files) + add(new files) with ``dataChange: true``.
    Untouched files are never read past the join nor rewritten, so
    merge cost is O(matched files + changes), not O(table). At 100 TB
    with partition- or Z-ordered layout, key-clustered tables touch a
    handful of files per merge.

    Partitioned tables work the same way, partitionValues-preserving:
    the probe re-derives partition columns from the hive dirs
    (basePath), the rewrite of matched files + changes is written back
    through the hive-partitioned writer, and every new add action
    carries its file's partitionValues — so partition pruning on later
    reads survives any number of merges. ``partition_scope`` (a
    {col: value} dict) restricts the PROBE to those partitions' files,
    the file-skipping a real engine derives when the ON clause pins the
    partition — the caller asserts every matched key lives there
    (change rows may still insert anywhere); with a key that can move
    partitions, leave it None and pay the key-column probe over all
    active files."""
    active, schema_string, version, partition_columns = _replay(path, None)
    if partition_scope:
        bad = set(partition_scope) - set(partition_columns)
        if bad:
            raise ValueError(
                f"partition_scope on non-partition columns {sorted(bad)} "
                f"(table is partitioned by {partition_columns})"
            )
    schema = T.StructType.fromJson(json.loads(schema_string))
    from pyspark.sql import functions as F

    probe = {
        rel: add
        for rel, add in active.items()
        if not partition_scope
        or all(add["partitionValues"].get(k) == v for k, v in partition_scope.items())
    }
    files = {os.path.join(path, rel): rel for rel in sorted(probe)}
    keys = changes.select(key).distinct()
    matched_abs: list[str] = []
    if files:
        # column pruning cuts the probe scan to the key column; the
        # semi-join output is bounded by the file count. The probe is
        # DV-aware (keep_rowmeta supplies the file URI), so a key whose
        # only occurrences are DV-deleted rows matches no file.
        cur = _scan_active(
            spark, path, probe, schema, partition_columns, keep_rowmeta=True
        ).withColumnRenamed("__dlc_file_uri", "__file")
        matched_abs = [
            r[0]
            for r in cur.join(keys, key, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        ]
    # _metadata.file_path returns URI-style paths; map back to relpaths
    matched_rel = sorted(
        files[k]
        for k in files
        if any(m.endswith("/" + files[k]) or m.endswith(files[k]) for m in matched_abs)
    )
    if matched_rel:
        # DV-aware rewrite: the new files hold only LIVE survivors and
        # carry no deletionVector
        touched = _scan_active(
            spark,
            path,
            {rel: active[rel] for rel in matched_rel},
            schema,
            partition_columns,
        )
        survivors = touched.join(keys, key, "left_anti")
        new_df = changes.unionByName(survivors)
    else:
        new_df = changes

    new_version = version + 1
    stage = os.path.join(path, f"_stage-{new_version:020d}-{uuid.uuid4().hex[:8]}")
    w = new_df.write.mode("overwrite")
    if partition_columns:
        w = w.partitionBy(*partition_columns)
    w.parquet(stage)

    # Change Data Feed (protocol: cdc actions + _change_data/ files):
    # the row-level change record of THIS merge — matched old rows as
    # update_preimage, their replacements as update_postimage, and
    # never-matched change rows as insert. Written by the distributed
    # writer, committed under a cdc action with dataChange=false so
    # snapshot readers skip it while read_delta_changes serves it.
    if matched_rel:
        old_matched = touched.join(keys, key, "left_semi")
        old_keys = touched.select(key).distinct()
        cdf = (
            old_matched.withColumn("_change_type", F.lit("update_preimage"))
            .unionByName(
                changes.join(old_keys, key, "left_semi").withColumn(
                    "_change_type", F.lit("update_postimage")
                )
            )
            .unionByName(
                changes.join(old_keys, key, "left_anti").withColumn(
                    "_change_type", F.lit("insert")
                )
            )
        )
    else:
        cdf = changes.withColumn("_change_type", F.lit("insert"))
    cdc_actions = _write_cdc(path, cdf, new_version)

    actions: list[dict] = cdc_actions + [
        {"remove": {"path": rel, "deletionTimestamp": 0, "dataChange": True}}
        for rel in matched_rel
    ]
    adds = _stage_to_adds(path, stage, new_version, partition_columns, True)
    actions += adds
    n_add = len(adds)
    shutil.rmtree(stage)
    actions.append(
        {
            "commitInfo": {
                "operation": "MERGE",
                "operationParameters": {"matchedPredicate": key},
                "timestamp": 0,
            }
        }
    )
    _publish_commit(path, new_version, actions)
    return {
        "version": new_version,
        "files_rewritten": len(matched_rel),
        "files_added": n_add,
        "files_untouched": len(active) - len(matched_rel),
        "files_probed": len(files),
    }


def clone_delta(spark: SparkSession, src_path: str, dst_path: str) -> dict:
    """SHALLOW CLONE: create a new, independently-writable Delta table
    whose v0 add actions reference the SOURCE's current data files by
    absolute path — zero bytes copied, O(active files) metadata, the
    instant-sandbox primitive (test a migration against 100 TB of
    production data without duplicating a byte). The clone's own
    commits (appends, merges, optimizes) land in its own log and its
    own directory; the source never sees them. Clone-side VACUUM can
    never reclaim source files (it only walks the clone's directory),
    and the clone reads the source files as of CLONE TIME — a source
    VACUUM that later drops a still-referenced file breaks the clone
    at scan, the documented shallow-clone hazard. Partitioned sources
    work too: each absolute add keeps its partitionValues, and the
    clone's scans inject the partition columns from those stored
    values (one broadcast metadata join) instead of hive-dir
    re-derivation, which could never span two roots."""
    (
        active,
        schema_string,
        src_version,
        partition_columns,
        _conf,
        src_protocol,
    ) = _replay_full(src_path, None)
    if os.path.exists(dst_path) and os.path.isdir(
        os.path.join(dst_path, "_delta_log")
    ):
        raise ValueError(f"destination {dst_path!r} is already a Delta table")
    os.makedirs(_log_dir(dst_path), exist_ok=True)
    # the clone inherits the SOURCE's protocol: its adds may carry
    # deletion vectors or feature-typed columns a v1 reader would
    # misread
    actions: list[dict] = [{"protocol": dict(src_protocol)}]
    actions.append(
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{dst_path}".encode()).hexdigest(),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": partition_columns,
                "configuration": {},
                "createdTime": 0,
            }
        }
    )
    for rel in sorted(active):
        add = dict(active[rel])
        add["path"] = os.path.abspath(os.path.join(src_path, rel))
        add["dataChange"] = True
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "operation": "CLONE",
                "operationParameters": {
                    "source": src_path,
                    "sourceVersion": str(src_version),
                },
                "timestamp": 0,
            }
        }
    )
    _publish_commit(dst_path, 0, actions)
    return {
        "version": 0,
        "source_version": src_version,
        "files_referenced": len(active),
    }


def restore_delta(spark: SparkSession, path: str, version: int) -> dict:
    """RESTORE the table to an earlier version as a NEW commit — the
    protocol's undo: the restored state is appended to history (time
    travel to the bad version still works, nothing is rewritten or
    lost), and the commit just flips the active file set back — a
    remove for every file the bad commits added, an add (reusing the
    original stats/partitionValues) for every file they dropped. Cost
    is O(files changed since ``version``), metadata-only: no data file
    is read or written, which is what makes un-doing a bad load on a
    100 TB table instant. The target version's files must still exist
    (a vacuumed version refuses loudly rather than restoring partial
    data); the schema is restored along with the file set."""
    cur_active, _cur_schema, cur_v, cur_parts = _replay(path, None)
    if version == cur_v:
        return {"version": cur_v, "files_added": 0, "files_removed": 0}
    tgt_active, tgt_schema, _, tgt_parts = _replay(path, version)
    missing = [
        rel for rel in tgt_active if not os.path.exists(os.path.join(path, rel))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore to version {version}: {len(missing)} of its "
            f"files were vacuumed (e.g. {missing[:3]})"
        )
    to_remove = sorted(set(cur_active) - set(tgt_active))
    to_add = sorted(set(tgt_active) - set(cur_active))
    # a path live in BOTH versions can still differ in its DELETION
    # VECTOR (a DV delete keeps the path, swaps the add action): the
    # restore must re-publish the target's version of the add, or the
    # deleted rows stay dead
    to_add += sorted(
        rel
        for rel in set(tgt_active) & set(cur_active)
        if cur_active[rel].get("deletionVector")
        != tgt_active[rel].get("deletionVector")
    )
    new_version = cur_v + 1
    actions: list[dict] = [
        {
            "metaData": {
                "id": hashlib.md5(f"dlc-delta:{path}".encode()).hexdigest(),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": tgt_schema,
                "partitionColumns": tgt_parts,
                "configuration": {},
                "createdTime": 0,
            }
        }
    ]
    actions += [
        {"remove": {"path": rel, "deletionTimestamp": 0, "dataChange": True}}
        for rel in to_remove
    ]
    # re-adding is a data change even if the original add was an
    # OPTIMIZE rearrangement (dataChange=false) — change consumers
    # must see the restored rows
    actions += [
        {"add": {**tgt_active[rel], "dataChange": True}} for rel in to_add
    ]
    actions.append(
        {
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": str(version)},
                "timestamp": 0,
            }
        }
    )
    _publish_commit(path, new_version, actions)
    return {
        "version": new_version,
        "files_added": len(to_add),
        "files_removed": len(to_remove),
    }


def vacuum_delta(path: str, retain_last: int = 1) -> list[str]:
    """VACUUM: physically delete data files referenced by NO retained
    version (the newest ``retain_last`` versions stay time-travelable;
    Delta expresses retention as an age cutoff — with deterministic
    zero timestamps this implementation retains by version count,
    the same reclaim semantics). The log itself is never rewritten:
    older versions remain listed, and reading one whose files were
    reclaimed fails at scan time — exactly the post-VACUUM behavior
    the protocol documents. Returns the deleted relpaths."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    versions = _list_versions(path)
    keep: set[str] = set()
    keep_dv: set[str] = set()
    for v in versions[-retain_last:]:
        active, _, _, _ = _replay(path, v)
        keep |= set(active)
        for add in active.values():
            dv = add.get("deletionVector")
            if dv and dv["storageType"] != "i":
                keep_dv.add(os.path.relpath(_dv_abs_path(path, dv), path))
    # data files live at the root or under hive-style partition dirs;
    # keys are log-relative paths either way
    on_disk = {
        os.path.relpath(f, path)
        for f in glob.glob(os.path.join(path, "**", "part-*.parquet"), recursive=True)
        if "_stage-" not in f
    }
    # DV sidecars reclaim by the same rule: referenced by NO retained
    # version -> deletable; a sidecar named by any retained add stays
    on_disk |= {
        os.path.relpath(f, path)
        for f in glob.glob(os.path.join(path, "deletion_vector_*.bin"))
    }
    doomed = sorted(on_disk - keep - keep_dv)
    for rel in doomed:
        os.remove(os.path.join(path, rel))
    return doomed


def read_delta_incremental(
    spark: SparkSession, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Change feed for append workloads: the rows ADDED by commits in
    (from_version, to_version] — read from exactly the files those
    commits added with ``dataChange: true`` (OPTIMIZE's
    dataChange:false rearrangements are correctly invisible). This is
    the log-derived incremental consumption a downstream pipeline uses
    instead of snapshot re-reads; I/O is proportional to the new data.
    Commits that REMOVE data in-range (overwrite/merge rewrites) raise
    — their row-level deltas are the Change Data Feed's job: use
    ``read_delta_changes`` (r6), which serves cdc files where present
    and derives insert rows from plain appends; refusing here beats
    silently double-counting rewritten rows."""
    versions = [v for v in _list_versions(path) if v > from_version]
    if to_version is not None:
        versions = [v for v in versions if v <= to_version]
    if not versions:
        raise ValueError(
            f"no commits in ({from_version}, {to_version}]"
        )
    _, schema_string, _, partition_columns = _replay(path, versions[-1])
    schema = T.StructType.fromJson(json.loads(schema_string))
    rels: list[str] = []
    for v in versions:
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "remove" in a and a["remove"].get("dataChange", True):
                    raise NotImplementedError(
                        f"version {v} removes data (rewrite/overwrite/"
                        "delete); incremental append scans cover append-"
                        "only ranges — use read_delta_changes, which "
                        "serves cdc files, DV commits, and remove+add "
                        "rewrites row-level"
                    )
                if "add" in a and a["add"].get("dataChange", True):
                    rels.append(a["add"]["path"])
    if not rels:
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema)
    if partition_columns:
        # partition columns live in the hive dir names, not the files
        reader = reader.option("basePath", path)
    return reader.parquet(*[os.path.join(path, rel) for rel in sorted(rels)])


def read_delta_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CHANGE DATA FEED read: the row-level changes committed in
    (from_version, to_version], each row carrying ``_change_type``
    (insert / update_preimage / update_postimage / delete) and
    ``_commit_version`` — the protocol's readChangeFeed surface.

    Per commit, per protocol: if the commit carries ``cdc`` actions,
    its ``_change_data/`` files ARE the complete change record (merge
    writes them; snapshot readers skip them via dataChange=false);
    otherwise changes derive from the main actions — add files with
    dataChange=true are inserts, removed files read back as deletes
    (overwrite = delete old + insert new). A DELETION-VECTOR commit (a
    same-path remove+add pair whose add carries a deletionVector) is a
    pure row-level delete: its change rows are exactly the positions in
    (new DV minus old DV), read back from the untouched data file by
    row index; a DV-bearing file that drops to a bare remove serves
    (all rows minus its DV) as deletes — never resurrect-then-redelete.
    OPTIMIZE rearrangements (dataChange=false) are correctly invisible.
    File-list resolution is driver-side metadata; every scan is a
    distributed parquet read, so consuming a 100 TB table's changes
    costs O(changed rows). Deletes need the removed files still on
    disk — a vacuumed range raises at scan, the documented post-VACUUM
    behavior."""
    from pyspark.sql import functions as F

    versions = [v for v in _list_versions(path) if v > from_version]
    if to_version is not None:
        versions = [v for v in versions if v <= to_version]
    if not versions:
        raise ValueError(f"no commits in ({from_version}, {to_version}]")
    (
        _a,
        schema_string,
        _v2,
        partition_columns,
        _cdf_conf,
        _cdf_prot,
    ) = _replay_full(path, versions[-1])
    schema = T.StructType.fromJson(json.loads(schema_string))
    # column-mapped tables: data files (and partition dirs) carry
    # PHYSICAL names — read physically and project back to logical so
    # the change rows never silently null out. cdc files are written
    # under logical names and read schemaless either way.
    _cdf_cm_mode = _cdf_conf.get("delta.columnMapping.mode", "none")
    _cm = _cdf_cm_mode in ("name", "id")
    if _cm:
        _mapped = json.loads(schema_string)["fields"]
        _physical = _cm_physical_struct(
            _mapped, with_field_ids=(_cdf_cm_mode == "id")
        )
        if _cdf_cm_mode == "id":
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        _read_schema = T.StructType.fromJson(
            {"type": "struct", "fields": _physical}
        )
        _logical_pairs = [
            (f["name"], pf["name"]) for f, pf in zip(_mapped, _physical)
        ]
    else:
        _read_schema = schema

    def _to_logical(df: DataFrame) -> DataFrame:
        if not _cm:
            return df
        return df.select(
            *[
                F.col(pn).cast(schema[ln].dataType).alias(ln)
                for ln, pn in _logical_pairs
            ],
            *[c for c in df.columns if c.startswith("__dlc_")],
        )

    def _read(rels: list[str], ctype: str | None, v: int) -> DataFrame:
        missing = [r for r in rels if not os.path.exists(os.path.join(path, r))]
        if missing:
            raise FileNotFoundError(
                f"change files for version {v} were vacuumed: {missing[:3]}"
            )
        sch = _read_schema if ctype is not None else None
        reader = spark.read.schema(sch) if sch is not None else spark.read
        if sch is not None and partition_columns:
            # add/remove files of a partitioned table carry their
            # partition columns in the hive dir, not the data; cdc
            # files embed them as ordinary columns (no basePath)
            reader = reader.option("basePath", path)
        df = reader.parquet(*[os.path.join(path, r) for r in sorted(rels)])
        if ctype is not None:
            df = _to_logical(df)
            df = df.withColumn("_change_type", F.lit(ctype))
        return df.withColumn("_commit_version", F.lit(v).cast("long"))

    def _read_rows(rel: str, positions, exclude: bool, v: int) -> DataFrame:
        """Rows of one data file selected (or anti-selected) by row
        index — the DV-commit change reader. ``positions`` is bounded
        by that commit's deleted-row count."""
        if not os.path.exists(os.path.join(path, rel)):
            raise FileNotFoundError(
                f"change files for version {v} were vacuumed: [{rel!r}]"
            )
        reader = spark.read.schema(_read_schema)
        if partition_columns:
            reader = reader.option("basePath", path)
        df = reader.parquet(os.path.join(path, rel)).withColumn(
            "__dlc_row_pos", F.col("_metadata.row_index")
        )
        pos_df = spark.createDataFrame(
            [(int(p),) for p in positions], "__dlc_row_pos long"
        )
        how = "left_anti" if exclude else "left_semi"
        return (
            _to_logical(df.join(F.broadcast(pos_df), "__dlc_row_pos", how))
            .drop("__dlc_row_pos")
            .withColumn("_change_type", F.lit("delete"))
            .withColumn("_commit_version", F.lit(v).cast("long"))
        )

    parts: list[DataFrame] = []
    for v in versions:
        cdc: list[str] = []
        adds: dict[str, dict] = {}
        removes: dict[str, dict] = {}
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "cdc" in a:
                    cdc.append(a["cdc"]["path"])
                elif "add" in a and a["add"].get("dataChange", True):
                    adds[a["add"]["path"]] = a["add"]
                elif "remove" in a and a["remove"].get("dataChange", True):
                    removes[a["remove"]["path"]] = a["remove"]
        if cdc:
            parts.append(_read(cdc, None, v))
            continue
        dv_pairs = {
            p: (adds[p], removes[p])
            for p in adds
            if p in removes and adds[p].get("deletionVector")
        }
        for p, (a, r) in sorted(dv_pairs.items()):
            new_pos = set(_dv_positions(path, a["deletionVector"]))
            old_dv = r.get("deletionVector")
            old_pos = set(_dv_positions(path, old_dv)) if old_dv else set()
            parts.append(_read_rows(p, sorted(new_pos - old_pos), False, v))
        plain_removes = {
            p: r for p, r in removes.items() if p not in dv_pairs
        }
        dv_removes = {
            p: r
            for p, r in plain_removes.items()
            if r.get("deletionVector")
        }
        bare_removes = sorted(set(plain_removes) - set(dv_removes))
        for p, r in sorted(dv_removes.items()):
            parts.append(
                _read_rows(
                    p, sorted(_dv_positions(path, r["deletionVector"])), True, v
                )
            )
        if bare_removes:
            parts.append(_read(bare_removes, "delete", v))
        plain_adds = sorted(p for p in adds if p not in dv_pairs)
        if plain_adds:
            parts.append(_read(plain_adds, "insert", v))
    if not parts:
        return spark.createDataFrame(
            [], schema.add("_change_type", "string").add("_commit_version", "long")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def delta_history(path: str) -> list[dict]:
    """Per-version summary from the log: files added/removed, the
    commitInfo operation (WRITE/OPTIMIZE/MERGE), and the write mode
    where the operation has one."""
    out = []
    for v in _list_versions(path):
        n_add = n_remove = 0
        mode = None
        operation = None
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    n_add += 1
                elif "remove" in a:
                    n_remove += 1
                elif "commitInfo" in a:
                    operation = a["commitInfo"].get("operation")
                    mode = a["commitInfo"]["operationParameters"].get("mode")
        out.append(
            {
                "version": v,
                "n_add": n_add,
                "n_remove": n_remove,
                "mode": mode,
                "operation": operation,
            }
        )
    return out


# ---------------------------------------------------------------------------
# Registered operators (group A extensions)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from datalakecrawler_spark.io import load, multi_count  # noqa: E402
from datalakecrawler_spark.registry import SUM_D, dsum, register  # noqa: E402
from datalakecrawler_spark.sources.scans import _tmp  # noqa: E402


def _fresh(path: str) -> str:
    if os.path.exists(path):
        shutil.rmtree(path)
    return path


@register(
    "sink_delta_native",
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
def sink_delta_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Delta-protocol commit + snapshot read. v0 overwrites with
    the 'F' orders, v1 APPENDS the 'P' orders; the latest snapshot must
    contain exactly their union (the oracle recomputes it from the
    source), proving add-action accumulation across commits. The log on
    disk is the real public wire format (protocol/metaData/add/
    commitInfo JSON lines), so any conforming Delta reader sees the
    same table."""
    path = _fresh(_tmp("orders_delta"))
    src = load(spark, sf_dir, "orders")
    v0 = write_delta(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    v1 = write_delta(src.where(F.col("o_orderstatus") == "P"), path, "append")
    assert (v0, v1) == (0, 1), f"unexpected versions {(v0, v1)}"
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_optimize",
    group="A",
    oracle=f"""
    select cast(16 as integer) as files_before,
           cast(1 as integer) as files_after,
           count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders
    """,
)
def sink_delta_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: transactional small-file compaction. v0 commits orders
    as 16 deliberately-small files (the over-parallel-writer layout);
    OPTIMIZE bin-packs them into one and commits the rearrangement
    with ``dataChange: false`` — so the post-optimize snapshot must
    hold EXACTLY the same rows (the oracle recomputes count+sum from
    the source), while the active file count drops 16 → 1 and
    incremental consumers can skip the new version entirely. Unlike
    sink_compact next door this is a LOG commit: time travel to v0
    still serves the 16-file layout."""
    path = _fresh(_tmp("orders_delta_opt"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.repartition(16), path, "overwrite")
    before, _, _, _ = _replay(path, None)
    res = optimize_delta(spark, path)  # default target >> fixture bytes
    after, _, _, _ = _replay(path, None)
    assert res["files_compacted"] == 16 and len(after) == 1, (res, len(after))
    hist = delta_history(path)
    assert hist[-1]["version"] == 1 and hist[-1]["n_add"] == 1
    return read_delta(spark, path).agg(
        F.lit(len(before)).cast("int").alias("files_before"),
        F.lit(len(after)).cast("int").alias("files_after"),
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "sink_delta_partitioned",
    group="A",
    oracle=f"""
    select count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderstatus = 'F'
    """,
)
def sink_delta_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: partitioned Delta table + LOG-level partition pruning.
    Orders commit partitioned by o_orderstatus (hive-style dirs, each
    add action carrying its partitionValues); the filtered read prunes
    to the 'F' partition's files from the log BEFORE any scan is
    planned — the other partitions are never even listed. The
    assertion pins the pruning (resolved file set ⊂ o_orderstatus=F/);
    the oracle recomputes the partition's contents from the source. At
    100 TB this metadata skip is what makes a 1-of-N-partition query
    cost 1/N regardless of table size."""
    path = _fresh(_tmp("orders_delta_part"))
    src = load(spark, sf_dir, "orders")
    write_delta(src, path, "overwrite", partition_by=["o_orderstatus"])
    active, _, _, parts = _replay(path, None)
    assert parts == ["o_orderstatus"]
    pruned = read_delta(spark, path, partition_filter={"o_orderstatus": "F"})
    kept = [
        rel
        for rel, add in active.items()
        if add["partitionValues"] == {"o_orderstatus": "F"}
    ]
    assert kept and all(rel.startswith("o_orderstatus=F/") for rel in kept)
    return pruned.agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "sink_delta_checkpoint",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders group by o_orderstatus
    """,
)
def sink_delta_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: parquet checkpoint — the log-scaling mechanism. Orders
    arrive as 5 append commits (the streaming-micro-batch shape that
    makes JSON-only replay O(history)); checkpoint_delta snapshots the
    v4 state into one parquet + _last_checkpoint, then commit v5
    appends the final slice. The read below runs with the
    pre-checkpoint JSON commits HIDDEN (renamed away) — it must still
    serve the complete table, proving replay started from the
    checkpoint and consumed only v5's JSON. The oracle recomputes the
    full table; commits are restored afterwards so time travel keeps
    working."""
    path = _fresh(_tmp("orders_delta_ckpt"))
    src = load(spark, sf_dir, "orders")
    for i in range(5):
        write_delta(src.where(F.col("o_orderkey") % 6 == i), path, "append")
    res = checkpoint_delta(path)
    assert res["version"] == 4, res
    write_delta(src.where(F.col("o_orderkey") % 6 == 5), path, "append")

    hidden = []
    try:
        for v in range(5):
            f = _commit_file(path, v)
            os.replace(f, f + ".hidden")
            hidden.append(f)
        out = (
            read_delta(spark, path)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                dsum("o_totalprice").alias("sum_price"),
            )
        )
        rows = out.collect()  # force the scan while commits are hidden
        return spark.createDataFrame(rows, out.schema)
    finally:
        for f in hidden:
            os.replace(f + ".hidden", f)


@register(
    "scan_delta_incremental",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderstatus in ('P', 'O')
    group by o_orderstatus
    """,
)
def scan_delta_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: log-derived incremental consumption. v0 = 'F' orders,
    v1 appends 'P', v2 appends 'O', v3 is an OPTIMIZE rearrangement
    (dataChange:false). The incremental read over (0, 3] must serve
    exactly the P+O appends — the optimize commit's files are
    correctly invisible to change consumers, which is the entire point
    of the dataChange flag. The oracle recomputes the appended rows
    from the source. In-range commits that REMOVE data refuse
    (row-level deltas over rewrites need the CDF protocol feature) —
    pinned in tests/test_delta_native.py."""
    path = _fresh(_tmp("orders_delta_inc"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    write_delta(
        src.where(F.col("o_orderstatus") == "P").repartition(4), path, "append"
    )
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "append")
    res = optimize_delta(spark, path)
    assert res["version"] == 3 and res["files_compacted"] > 0, res
    return (
        read_delta_incremental(spark, path, from_version=0, to_version=3)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "scan_delta_schema_evolution",
    group="A",
    oracle=f"""
    with evolved as (
      select o_orderkey, o_orderstatus, o_totalprice,
             cast(null as boolean) as even_key
      from orders where o_orderstatus = 'F'
      union all
      select o_orderkey, o_orderstatus, o_totalprice, o_orderkey % 2 = 0
      from orders where o_orderstatus = 'P'
    )
    select even_key, count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from evolved group by even_key
    """,
)
def scan_delta_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: schema evolution under enforcement. v0 commits three
    columns; v1 appends rows carrying a NEW boolean column with
    merge_schema=True — the committed schema becomes the union, and
    the snapshot read serves v0's rows with NULL in the evolved column
    (old files are never rewritten; the explicit-schema scan fills the
    gap). The oracle recomputes exactly that union. Appends with a
    differing schema and no merge_schema flag refuse — enforcement is
    the default, evolution is opt-in, per the public contract."""
    path = _fresh(_tmp("orders_delta_evolve"))
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_delta(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    evolved = src.where(F.col("o_orderstatus") == "P").withColumn(
        "even_key", F.col("o_orderkey") % 2 == 0
    )
    try:
        write_delta(evolved, path, "append")
        raise AssertionError("schema enforcement must refuse by default")
    except ValueError:
        pass
    write_delta(evolved, path, "append", merge_schema=True)
    return (
        read_delta(spark, path)
        .groupBy("even_key")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "scan_delta_data_skip",
    group="A",
    oracle=f"""
    select count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders
    where o_orderkey <= (select cast(floor(max(o_orderkey) / 10) as bigint)
                         from orders)
    """,
)
def scan_delta_data_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: footer-stats data skipping. Orders commit key-CLUSTERED
    (range-repartitioned on o_orderkey, so each of the 8 files holds a
    disjoint key range recorded as minValues/maxValues in its add
    action); a read filtered to the bottom tenth of the key space
    skips every file whose stats range can't match — asserted below —
    and the real predicate still applies to the survivors
    (conservative skipping never drops a matching row, which is
    exactly what the oracle's full recompute checks). On a Z-ordered
    100 TB table this is the mechanism that turns a selective query
    into a handful of file opens."""
    path = _fresh(_tmp("orders_delta_skip"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.repartitionByRange(8, "o_orderkey"), path, "overwrite")
    thr = int(src.agg(F.max("o_orderkey")).collect()[0][0] // 10)
    active, _, _, _ = _replay(path, None)
    kept = skip_files(active, "o_orderkey", None, thr)
    assert 0 < len(kept) < len(active), (len(kept), len(active))
    return (
        read_delta(spark, path, data_filter=("o_orderkey", None, thr))
        .where(F.col("o_orderkey") <= thr)
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_merge",
    group="A",
    oracle=f"""
    with merged as (
      select * from orders where o_orderstatus = 'F'
      union all
      select * replace (o_totalprice * 1.1 as o_totalprice)
      from orders where o_orderstatus = 'P'
      union all
      select * from orders where o_orderstatus = 'O'
    )
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from merged group by o_orderstatus
    """,
)
def sink_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Delta MERGE as a file-level selective rewrite. The table
    is laid out key-clustered by construction (commit 0 = the 'F'
    orders in 4 files, commit 1 = the 'P' orders in 2 files; statuses
    are per-order, so key sets are disjoint per file set). The merge
    updates every 'P' order (price * 1.1) and inserts the 'O' orders:
    the matched-file probe must find EXACTLY the 2 'P' files, rewrite
    those plus the inserts, and leave the 4 'F' files untouched in the
    log — asserted below, because that pruning is the whole cost model
    of MERGE at 100 TB. The oracle recomputes update-wins-by-key
    relationally over the source."""
    path = _fresh(_tmp("orders_delta_merge"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F").repartition(4), path)
    write_delta(
        src.where(F.col("o_orderstatus") == "P").repartition(2), path, "append"
    )
    changes = (
        src.where(F.col("o_orderstatus") == "P")
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(src.where(F.col("o_orderstatus") == "O"))
    )
    res = merge_delta(spark, path, changes, "o_orderkey")
    assert res["files_rewritten"] == 2 and res["files_untouched"] == 4, res
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_vacuum",
    group="A",
    oracle=f"""
    select cast(4 as integer) as n_reclaimed,
           count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderstatus = 'O'
    """,
)
def sink_delta_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: VACUUM reclaims data files no retained version
    references — the storage-cost counterpart to time travel. v0
    writes the 'F' orders as 4 files, v1 overwrites with the 'O'
    orders (v0's files become logically removed but stay on disk);
    vacuum with retain_last=1 must physically delete exactly those 4
    files while the live snapshot still reads correctly (oracle
    recomputes it), and a post-vacuum time travel to v0 fails at scan
    time rather than serving partial data."""
    path = _fresh(_tmp("orders_delta_vac"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F").repartition(4), path)
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "overwrite")
    doomed = vacuum_delta(path, retain_last=1)
    assert len(doomed) == 4, doomed
    try:
        read_delta(spark, path, version=0).count()
        raise AssertionError("time travel to a vacuumed version must fail")
    except Exception:
        pass
    return read_delta(spark, path).agg(
        F.lit(len(doomed)).cast("int").alias("n_reclaimed"),
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "scan_delta_time_travel",
    group="A",
    oracle=f"""
    with v0 as (
      select 0 as version, count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
      from orders where o_orderstatus = 'F'
    ),
    v1 as (
      select 1 as version, count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
      from orders where o_orderstatus = 'O'
    )
    select * from v0 union all select * from v1
    """,
)
def scan_delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Delta time travel by log replay. v1 OVERWRITES v0
    (logical remove actions; the v0 parquet stays on disk per
    protocol), then the table is read at BOTH versions: version 0 must
    still serve the pre-overwrite rows, version 1 only the new ones.
    Replay cost is the JSON log (KBs, driver-side); each snapshot scan
    is a plain distributed parquet read over the resolved file list."""
    path = _fresh(_tmp("orders_delta_tt"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "overwrite")

    def snap(v: int) -> DataFrame:
        return (
            read_delta(spark, path, version=v)
            .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
            .select(F.lit(v).alias("version"), "cnt", "sum_price")
        )

    return snap(0).unionByName(snap(1))


@register(
    "scan_delta_cdf",
    group="A",
    oracle=f"""
    with pre as (
      select 'update_preimage' as change_type,
             cast(1 as bigint) as commit_version,
             count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
      from orders where o_orderstatus = 'F' and o_orderkey % 2 = 0
    ),
    post as (
      select 'update_postimage', 1, count(*),
             {SUM_D.format('o_totalprice * 1.1')}
      from orders where o_orderstatus = 'F' and o_orderkey % 2 = 0
    ),
    ins as (
      select 'insert', 1, count(*), {SUM_D.format('o_totalprice')}
      from orders where o_orderstatus = 'P'
    ),
    app as (
      select 'insert', 2, count(*), {SUM_D.format('o_totalprice')}
      from orders where o_orderstatus = 'O'
    )
    select * from pre union all select * from post
    union all select * from ins union all select * from app
    """,
)
def scan_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: the Delta CHANGE DATA FEED. Version 0 commits the 'F'
    orders; version 1 MERGEs (even-key 'F' prices * 1.1 + the 'P'
    orders inserted) and writes the protocol's _change_data files
    under cdc actions (dataChange=false, so the snapshot read is
    untouched — asserted); version 2 appends the 'O' orders with NO
    cdc files, exercising the derive-from-adds rule. The feed over
    (0, 2] must carry exactly update_preimage/update_postimage rows
    for the even 'F' keys, insert rows for 'P' (from the cdc file) and
    for 'O' (derived), each stamped with its commit version — the
    oracle recomputes every slice from the source. This is what lets a
    downstream pipeline consume a 100 TB table as a row-level change
    stream instead of diffing snapshots."""
    path = _fresh(_tmp("orders_delta_cdf"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F"), path)
    changes = (
        src.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(src.where(F.col("o_orderstatus") == "P"))
    )
    merge_delta(spark, path, changes, "o_orderkey")
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "append")
    # snapshot readers must not see the cdc files
    # (r10: both counts in ONE action — guide §1.2)
    n_snap, n_want = multi_count(
        read_delta(spark, path),
        src.where(F.col("o_orderstatus").isin("F", "P", "O")),
    )
    assert n_snap == n_want, (n_snap, n_want)
    feed = read_delta_changes(spark, path, from_version=0)
    return feed.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "sink_delta_optimize_partitioned",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price,
           cast(1 as integer) as files_after
    from orders group by o_orderstatus
    """,
)
def sink_delta_optimize_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: per-partition OPTIMIZE. Orders commit partitioned by
    o_orderstatus from 4 writer tasks, leaving several small files in
    EVERY hive dir (the over-parallel layout each partition suffers
    independently); OPTIMIZE must bin-pack within each partitionValues
    group — never across, a data file belongs to one partition — down
    to 1 file per status, keep every add's partitionValues (asserted,
    because log-level pruning must survive compaction), and commit the
    whole rearrangement atomically with dataChange:false. The oracle
    recomputes each partition's contents from the source; time travel
    to v0 still serves the small-file layout."""
    path = _fresh(_tmp("orders_delta_opt_part"))
    src = load(spark, sf_dir, "orders")
    write_delta(
        src.repartition(4), path, "overwrite", partition_by=["o_orderstatus"]
    )
    before, _, _, _ = _replay(path, None)
    res = optimize_delta(spark, path)  # default target >> fixture bytes
    after, _, _, _ = _replay(path, None)
    by_part: dict[str, int] = {}
    for add in after.values():
        s = add["partitionValues"]["o_orderstatus"]
        by_part[s] = by_part.get(s, 0) + 1
    assert set(by_part.values()) == {1}, by_part
    assert res["files_compacted"] == len(before), (res, len(before))
    # log-level partition pruning must survive the rewrite
    pruned, _, _, _ = _replay(path, None)
    f_files = [
        rel
        for rel, add in pruned.items()
        if add["partitionValues"] == {"o_orderstatus": "F"}
    ]
    assert len(f_files) == 1 and f_files[0].startswith("o_orderstatus=F/"), f_files
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
        .withColumn("files_after", F.lit(1).cast("int"))
    )


@register(
    "sink_delta_merge_partitioned",
    group="A",
    oracle=f"""
    with merged as (
      select * from orders where o_orderstatus <> 'P'
      union all
      select * replace (o_totalprice * 1.1 as o_totalprice)
      from orders where o_orderstatus = 'P'
    )
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from merged group by o_orderstatus
    """,
)
def sink_delta_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: MERGE on a partitioned table, partition-scoped. Orders
    commit hive-partitioned by o_orderstatus (2 files per partition);
    the merge updates every 'P' order (price * 1.1) with
    partition_scope pinning the probe to the P partition — the
    file-skipping a real engine derives when the ON clause fixes the
    partition. Asserted: the probe touched ONLY P's files, the other
    partitions' files survive by identity (same physical paths in the
    log), and every rewritten add carries partitionValues, so log-level
    pruning still works after the merge. The oracle recomputes
    update-wins-by-key relationally over the source. At 100 TB this is
    the difference between a merge that scans one partition and one
    that scans the table."""
    path = _fresh(_tmp("orders_delta_merge_part"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.repartition(2), path, "overwrite", partition_by=["o_orderstatus"])
    before, _, _, _ = _replay(path, None)
    untouched_before = {
        rel
        for rel, add in before.items()
        if add["partitionValues"]["o_orderstatus"] != "P"
    }
    n_p_files = len(before) - len(untouched_before)
    changes = src.where(F.col("o_orderstatus") == "P").withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    res = merge_delta(
        spark, path, changes, "o_orderkey",
        partition_scope={"o_orderstatus": "P"},
    )
    assert res["files_probed"] == n_p_files, (res, n_p_files)
    assert res["files_rewritten"] == n_p_files, res
    after, _, _, _ = _replay(path, None)
    untouched_after = {
        rel
        for rel, add in after.items()
        if add["partitionValues"]["o_orderstatus"] != "P"
    }
    assert untouched_after == untouched_before
    p_after = [
        rel
        for rel, add in after.items()
        if add["partitionValues"] == {"o_orderstatus": "P"}
    ]
    assert p_after and all(rel.startswith("o_orderstatus=P/") for rel in p_after)
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_restore",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderstatus = 'F'
    group by o_orderstatus
    """,
)
def sink_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: RESTORE as a forward commit. v0 commits the 'F' orders;
    v1 is a bad overwrite (the 'O' orders); RESTORE(0) publishes v2
    flipping the active set back — metadata-only, O(files changed),
    no data file read or written (asserted: v2's adds reuse v0's exact
    physical paths). History keeps all three versions: time travel to
    the bad v1 still serves it, and the head — which the oracle
    recomputes from the source — is the v0 state again. A post-vacuum
    restore refuses loudly instead of serving partial data (pinned in
    tests/test_delta_native.py)."""
    path = _fresh(_tmp("orders_delta_restore"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F").repartition(3), path)
    v0_active, _, _, _ = _replay(path, None)
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "overwrite")
    res = restore_delta(spark, path, 0)
    assert res["version"] == 2 and res["files_added"] == 3, res
    head_active, _, _, _ = _replay(path, None)
    assert sorted(head_active) == sorted(v0_active)
    hist = delta_history(path)
    assert hist[-1]["operation"] == "RESTORE"
    # the bad version stays time-travelable
    # (r10: both counts in ONE action — guide §1.2)
    n_bad, n_o = multi_count(
        read_delta(spark, path, version=1),
        src.where(F.col("o_orderstatus") == "O"),
    )
    assert n_bad == n_o
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_zorder",
    group="A",
    oracle=f"""
    select count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders
    where o_orderkey <= (select cast(floor(max(o_orderkey) / 8) as bigint)
                         from orders)
      and o_custkey <= (select cast(floor(max(o_custkey) / 8) as bigint)
                        from orders)
    """,
)
def sink_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: OPTIMIZE ZORDER. Orders commit hash-scattered (every
    file spans the whole o_orderkey AND o_custkey range, so footer
    stats can skip nothing); the z-order rewrite range-partitions on a
    Morton key interleaving both columns' bucket ordinals and commits
    dataChange:false. Asserted: a selective range on o_orderkey now
    skips files via stats AND so does one on o_custkey — the property
    a single-column sort cannot give — while the oracle recomputes the
    query from the source (clustering must never change results).
    This is the layout operator that makes multi-dimension selective
    queries on 100 TB cost a handful of file opens."""
    path = _fresh(_tmp("orders_delta_zorder"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.repartition(8), path, "overwrite")
    scattered, _, _, _ = _replay(path, None)
    max_ok = int(src.agg(F.max("o_orderkey")).collect()[0][0])
    max_ck = int(src.agg(F.max("o_custkey")).collect()[0][0])
    # before: hash layout → stats ranges are table-wide, nothing skips
    assert len(skip_files(scattered, "o_orderkey", None, max_ok // 8)) == len(
        scattered
    )
    total = sum(a["size"] for a in scattered.values())
    res = optimize_delta(
        spark, path, target_file_bytes=max(total // 8, 1),
        zorder_by=["o_orderkey", "o_custkey"],
    )
    assert res["files_compacted"] == 8 and res["files_written"] >= 4, res
    clustered, _, _, _ = _replay(path, None)
    kept_ok = skip_files(clustered, "o_orderkey", None, max_ok // 8)
    kept_ck = skip_files(clustered, "o_custkey", None, max_ck // 8)
    assert len(kept_ok) < len(clustered), (len(kept_ok), len(clustered))
    assert len(kept_ck) < len(clustered), (len(kept_ck), len(clustered))
    return (
        read_delta(spark, path, data_filter=("o_orderkey", None, max_ok // 8))
        .where(
            (F.col("o_orderkey") <= max_ok // 8)
            & (F.col("o_custkey") <= max_ck // 8)
        )
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_checkpoint_multipart",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders group by o_orderstatus
    """,
)
def sink_delta_checkpoint_multipart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: MULTI-PART checkpoint (the protocol's parts form). The
    state is checkpointed as 3 parquet parts named
    {v}.checkpoint.{i}.{3}.parquet with "parts": 3 in _last_checkpoint
    — how engines checkpoint tables whose action set is too large for
    one writer. A later append then replays from the parts + 1 JSON
    commit; the oracle recomputes the final snapshot. Asserted: the
    exact part names exist and the parts stamp round-trips. A missing
    part refuses loudly (pinned in tests/test_delta_native.py) — a
    partial checkpoint must never serve a partial table."""
    path = _fresh(_tmp("orders_delta_mp_ckpt"))
    src = load(spark, sf_dir, "orders")
    write_delta(
        src.where(F.col("o_orderstatus") != "O").repartition(4), path
    )
    res = checkpoint_delta(path, parts=3)
    assert res["parts"] == 3, res
    log = os.path.join(path, "_delta_log")
    assert all(
        os.path.exists(
            os.path.join(log, f"{0:020d}.checkpoint.{i:010d}.{3:010d}.parquet")
        )
        for i in (1, 2, 3)
    )
    write_delta(src.where(F.col("o_orderstatus") == "O"), path, "append")
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_overwrite_partitions",
    group="A",
    oracle=f"""
    with final as (
      select * from orders where o_orderstatus <> 'P'
      union all
      select * replace (o_totalprice * 2.0 as o_totalprice)
      from orders where o_orderstatus = 'P' and o_orderkey % 2 = 0
    )
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from final group by o_orderstatus
    """,
)
def sink_delta_overwrite_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: DYNAMIC partition overwrite. v0 commits all orders
    partitioned by o_orderstatus; v1 overwrites with a frame that only
    lands in the P partition (even keys, doubled price) — the commit
    must remove EXACTLY P's prior files (asserted: every other
    partition's files stay active by identity) and replace them with
    the new data, so P now holds only the even-key rows. The oracle
    recomputes the final table. This is INSERT OVERWRITE PARTITION:
    reloading one day of a date-partitioned 100 TB table costs that
    day, not the table."""
    path = _fresh(_tmp("orders_delta_dpo"))
    src = load(spark, sf_dir, "orders")
    write_delta(src, path, "overwrite", partition_by=["o_orderstatus"])
    before, _, _, _ = _replay(path, None)
    repl = (
        src.where((F.col("o_orderstatus") == "P") & (F.col("o_orderkey") % 2 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
    )
    write_delta(repl, path, "overwrite_partitions", partition_by=["o_orderstatus"])
    after, _, _, _ = _replay(path, None)

    def _others(active):
        return {
            r for r, a in active.items()
            if a["partitionValues"]["o_orderstatus"] != "P"
        }

    assert _others(after) == _others(before)
    assert all(
        rel.startswith("o_orderstatus=P/")
        for rel in set(after) - set(before)
    )
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "sink_delta_clone",
    group="A",
    oracle=f"""
    with cloned as (
      select * from orders where o_orderstatus = 'F'
      union all
      select * from orders where o_orderstatus = 'P'
    ),
    source_now as (
      select count(*) as src_cnt from orders where o_orderstatus = 'F'
    )
    select (select src_cnt from source_now) as src_cnt,
           cast(0 as integer) as files_copied,
           count(*) as clone_cnt, {SUM_D.format('o_totalprice')} as sum_price
    from cloned
    """,
)
def sink_delta_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: SHALLOW CLONE as the zero-copy sandbox. The source table
    holds the 'F' orders; the clone references those files by absolute
    path — asserted: the clone directory contains NO parquet at clone
    time (files_copied=0 rides in the result). An append of the 'P'
    orders then lands ONLY in the clone: the source still counts F
    (src_cnt, oracle-recomputed) while the clone serves F+P. This is
    how an experiment forks 100 TB of production data for the cost of
    its metadata."""
    path_src = _fresh(_tmp("orders_delta_clone_src"))
    path_dst = _fresh(_tmp("orders_delta_clone_dst"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F"), path_src)
    res = clone_delta(spark, path_src, path_dst)
    assert res["files_referenced"] > 0, res
    n_copied = len(
        glob.glob(os.path.join(path_dst, "**", "*.parquet"), recursive=True)
    ) - len(glob.glob(os.path.join(path_dst, "_delta_log", "*.parquet")))
    assert n_copied == 0, n_copied
    write_delta(src.where(F.col("o_orderstatus") == "P"), path_dst, "append")
    # r10 (guide §1.2): both assertion counts in ONE action/job
    src_cnt, n_f = multi_count(
        read_delta(spark, path_src), src.where(F.col("o_orderstatus") == "F")
    )
    assert src_cnt == n_f
    return read_delta(spark, path_dst).agg(
        F.lit(src_cnt).cast("long").alias("src_cnt"),
        F.lit(n_copied).cast("int").alias("files_copied"),
        F.count(F.lit(1)).alias("clone_cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "scan_delta_deletion_vectors",
    group="A",
    oracle=f"""
    select o_orderstatus,
           cast(0 as integer) as files_rewritten,
           count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderkey % 7 <> 3
    group by o_orderstatus
    """,
)
def scan_delta_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: DELETION VECTORS (reader v3) — row-level DELETE with ZERO
    data files rewritten. Orders commit as a multi-file table; a DELETE
    of every ``o_orderkey % 7 = 3`` row attaches roaring bitmaps of the
    doomed row indexes (one sidecar file, protocol wire format:
    z85-uuid 'u' descriptors, BE length + CRC32 framing) and upgrades
    the protocol to (3, 7)+deletionVectors. Asserted: the on-disk data
    file set is BYTE-IDENTICAL before and after (files_rewritten=0
    rides in the result); the DV-aware scan applies the bitmaps as one
    distributed `_metadata.row_index` anti join. This is the operator
    that makes GDPR-erasure on a 100 TB table cost O(deleted rows),
    not a terabyte rewrite. The oracle recomputes survivors from the
    source."""
    path = _fresh(_tmp("orders_delta_dv"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.repartition(4), path, "overwrite")
    before = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    res = delete_delta(spark, path, "o_orderkey % 7 = 3")
    assert res["rows_deleted"] > 0, res
    after = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert after == before, "DV delete must not rewrite data files"
    active, *_ = _replay_full(path, None)
    assert any(a.get("deletionVector") for a in active.values())
    return (
        read_delta(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(len(after) - len(before)).cast("int").alias("files_rewritten"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


@register(
    "scan_delta_column_mapping",
    group="A",
    oracle=f"""
    select o_orderstatus as status, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as total_price
    from orders group by o_orderstatus
    """,
)
def scan_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: COLUMN MAPPING (reader v2, mode=name) — the indirection
    that makes renaming a column on a 100 TB table a metadata-only
    commit. Orders commit with physical ``col-<uuid>`` parquet names +
    delta.columnMapping.{{id,physicalName}} field metadata; then
    ``o_orderstatus`` renames to ``status`` and ``o_totalprice`` to
    ``total_price`` WITHOUT touching a single data file (asserted: the
    parquet set is unchanged across both renames). The read projects
    physical back to the current logical names. The oracle recomputes
    the aggregate from the source under the new names."""
    path = _fresh(_tmp("orders_delta_cm"))
    src = load(spark, sf_dir, "orders")
    write_delta_column_mapped(src, path, "overwrite")
    before = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    rename_delta_column(path, "o_orderstatus", "status")
    rename_delta_column(path, "o_totalprice", "total_price")
    assert sorted(glob.glob(os.path.join(path, "part-*.parquet"))) == before
    out = read_delta(spark, path)
    assert "status" in out.columns and "o_orderstatus" not in out.columns
    return out.groupBy("status").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("total_price").alias("total_price"),
    )


@register(
    "scan_delta_cdf_rewrites",
    group="A",
    oracle=f"""
    with deleted as (
      select * from orders where o_orderstatus = 'F' and o_orderkey % 5 = 2
    ),
    appended as (
      select * from orders where o_orderstatus = 'P'
    ),
    changes as (
      select 'delete' as change_type, cast(1 as bigint) as commit_version,
             o_totalprice from deleted
      union all
      select 'insert', 3, o_totalprice from appended
    )
    select change_type, commit_version, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from changes group by change_type, commit_version
    """,
)
def scan_delta_cdf_rewrites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: CHANGE DATA FEED across a REWRITE — the range spans a DV
    DELETE (v1), an OPTIMIZE compaction (v2), and an append (v3). The
    feed must serve exactly: the deleted rows as row-level 'delete's
    at v1 (read back from the untouched file by DV row index, NOT the
    whole file), NOTHING at v2 (dataChange=false rearrangements are
    invisible to change consumers even though they rewrite every
    byte), and the appended rows as 'insert's at v3. This is the
    incremental-consumer contract that lets a downstream pipeline
    follow a 100 TB table through housekeeping without re-reading it.
    The oracle recomputes both change sets from the source."""
    path = _fresh(_tmp("orders_delta_cdf_rw"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.where(F.col("o_orderstatus") == "F"), path, "overwrite")
    delete_delta(spark, path, "o_orderkey % 5 = 2")  # v1: DV delete
    res = optimize_delta(spark, path)  # v2: purge + compact
    assert res["version"] == 2 and res["files_compacted"] >= 1, res
    write_delta(src.where(F.col("o_orderstatus") == "P"), path, "append")  # v3
    ch = read_delta_changes(spark, path, from_version=0)
    return ch.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "sink_delta_clone_partitioned",
    group="A",
    oracle=f"""
    with cloned as (
      select * from orders
      union all
      select * from orders where o_orderstatus = 'P'
    )
    select o_orderstatus, cast(0 as integer) as files_copied,
           count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from cloned group by o_orderstatus
    """,
)
def sink_delta_clone_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: SHALLOW CLONE of a PARTITIONED table. The source commits
    orders hive-partitioned by o_orderstatus; the clone references
    those files by absolute path (files_copied=0 asserted and carried
    in the result) and serves the partition column from each add
    action's stored partitionValues through ONE broadcast metadata
    join — hive-dir re-derivation can't span two roots. A clone-side
    append of the 'P' orders doubles that partition only in the clone;
    log-level partition pruning keeps working (asserted on the 'F'
    slice). The zero-copy sandbox, now for the everyday partitioned
    table shape."""
    path_src = _fresh(_tmp("orders_delta_clonep_src"))
    path_dst = _fresh(_tmp("orders_delta_clonep_dst"))
    src = load(spark, sf_dir, "orders")
    write_delta(src, path_src, "overwrite", partition_by=["o_orderstatus"])
    res = clone_delta(spark, path_src, path_dst)
    assert res["files_referenced"] > 0, res
    n_copied = len(
        glob.glob(
            os.path.join(path_dst, "**", "part-*.parquet"), recursive=True
        )
    )
    assert n_copied == 0, n_copied
    write_delta(
        src.where(F.col("o_orderstatus") == "P"),
        path_dst,
        "append",
        partition_by=["o_orderstatus"],
    )
    pruned = read_delta(
        spark, path_dst, partition_filter={"o_orderstatus": "F"}
    )
    # r10 (guide §1.2): all four assertion counts in ONE action/job
    n_pruned, n_f, n_src_tbl, n_src = multi_count(
        pruned,
        src.where("o_orderstatus = 'F'"),
        read_delta(spark, path_src),
        src,
    )
    assert n_pruned == n_f
    assert n_src_tbl == n_src
    return (
        read_delta(spark, path_dst)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(n_copied).cast("int").alias("files_copied"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


@register(
    "sink_delta_update_dv",
    group="A",
    oracle=f"""
    with updated as (
      select o_orderkey, o_orderstatus,
             case when o_orderpriority = '1-URGENT'
                  then o_totalprice * 1.1 else o_totalprice end as price,
             case when o_orderpriority = '1-URGENT'
                  then 'ESCALATED' else o_orderpriority end as prio
      from orders
    )
    select prio, count(*) as cnt, {SUM_D.format('price')} as sum_price
    from updated group by prio
    """,
)
def sink_delta_update_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: row-level UPDATE via deletion vectors. Every urgent order
    escalates (priority relabeled, price * 1.1) in ONE commit that
    DV-marks the old images in their untouched files and appends only
    the updated rows — O(matched rows), never a copy-on-write of the
    touched files (asserted: the original data files all remain on
    disk). The commit ships update_preimage/update_postimage cdc files,
    asserted to pair 1:1 with the matched rows. The oracle recomputes
    the post-update table from the source."""
    path = _fresh(_tmp("orders_delta_upd"))
    src = load(spark, sf_dir, "orders")
    write_delta(src.repartition(4), path, "overwrite")
    before = set(glob.glob(os.path.join(path, "part-*.parquet")))
    res = update_delta(
        spark, path, "o_orderpriority = '1-URGENT'",
        {
            "o_totalprice": "o_totalprice * 1.1",
            "o_orderpriority": "'ESCALATED'",
        },
    )
    assert res["rows_updated"] > 0, res
    assert before <= set(glob.glob(os.path.join(path, "part-*.parquet")))
    ch = read_delta_changes(spark, path, from_version=0)
    # r10 (guide §1.2): both assertion counts in ONE action/job
    pre, post = multi_count(
        ch.where("_change_type = 'update_preimage'"),
        ch.where("_change_type = 'update_postimage'"),
    )
    assert pre == post == res["rows_updated"], (pre, post, res)
    return (
        read_delta(spark, path)
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


@register(
    "sink_delta_checkpoint_v2",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders group by o_orderstatus
    """,
)
def sink_delta_checkpoint_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: V2 CHECKPOINT (table feature v2Checkpoint) — the modern
    layout: a UUID-named checkpoint file carrying protocol/metaData +
    a checkpointMetadata marker + sidecar actions, with the add-file
    state in _delta_log/_sidecars/ parquet (reusable across
    checkpoints instead of rewritten every interval). Orders arrive as
    5 appends; checkpoint_delta(v2=True) upgrades the protocol to
    (3,7)+v2Checkpoint in its own commit and snapshots; commit then
    appends the final slice. The read below runs with every
    pre-checkpoint JSON HIDDEN — it must serve the complete table,
    proving replay resolved the UUID checkpoint via _last_checkpoint's
    path and consumed the sidecars. The oracle recomputes the full
    table."""
    path = _fresh(_tmp("orders_delta_ckpt_v2"))
    src = load(spark, sf_dir, "orders")
    for i in range(5):
        write_delta(src.where(F.col("o_orderkey") % 6 == i), path, "append")
    res = checkpoint_delta(path, v2=True)
    assert res.get("v2") and res["sidecars"], res
    write_delta(src.where(F.col("o_orderkey") % 6 == 5), path, "append")

    hidden = []
    try:
        for v in range(res["version"] + 1):
            f = _commit_file(path, v)
            os.replace(f, f + ".hidden")
            hidden.append(f)
        out = (
            read_delta(spark, path)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                dsum("o_totalprice").alias("sum_price"),
            )
        )
        rows = out.collect()  # force the scan while commits are hidden
        return spark.createDataFrame(rows, out.schema)
    finally:
        for f in hidden:
            os.replace(f + ".hidden", f)


@register(
    "scan_delta_drop_column",
    group="A",
    oracle=f"""
    select o_orderstatus, cast(0 as integer) as files_rewritten,
           count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders group by o_orderstatus
    """,
)
def scan_delta_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: DROP COLUMN without rewrite. Orders commit column-mapped;
    dropping o_custkey is ONE metadata commit — the parquet set is
    byte-identical (files_rewritten=0 asserted and carried), the
    column simply stops resolving (asserted absent from the read),
    and time travel to the pre-drop version still serves it. The
    remaining columns aggregate exactly as the oracle recomputes from
    the source."""
    path = _fresh(_tmp("orders_delta_dropcol"))
    src = load(spark, sf_dir, "orders")
    write_delta_column_mapped(src, path, "overwrite")
    before = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    v = drop_delta_column(path, "o_custkey")
    after = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert after == before, "drop must not rewrite data files"
    out = read_delta(spark, path)
    assert "o_custkey" not in out.columns
    assert "o_custkey" in read_delta(spark, path, version=v - 1).columns
    return out.groupBy("o_orderstatus").agg(
        F.lit(len(after) - len(before)).cast("int").alias("files_rewritten"),
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "scan_delta_cm_partitioned",
    group="A",
    oracle=f"""
    select count(*) as cnt_f, {SUM_D.format('o_totalprice')} as sum_price_f
    from orders where o_orderstatus = 'F' and o_orderkey % 7 <> 2
    """,
)
def scan_delta_cm_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: COLUMN MAPPING on a PARTITIONED table — the combination
    real mapped lakes run. Orders commit mapped and hive-partitioned:
    per protocol the dirs, add.partitionValues keys, and
    metaData.partitionColumns all carry the PHYSICAL col-<uuid> names
    (asserted on disk). The partition column renames to `status`
    WITHOUT touching a file (dirs stay physical), a DV DELETE removes
    every o_orderkey ≡ 2 (mod 7) row through the logical view, and the
    final read partition-filters by the NEW logical name — pruned from
    the log, recomputed by the oracle from the source."""
    path = _fresh(_tmp("orders_delta_cm_part"))
    src = load(spark, sf_dir, "orders")
    write_delta_column_mapped(
        src, path, "overwrite", partition_by=["o_orderstatus"]
    )
    pdirs = [
        os.path.basename(d) for d in glob.glob(os.path.join(path, "col-*=*"))
    ]
    assert pdirs and all(d.startswith("col-") for d in pdirs), pdirs
    files_before = sorted(
        glob.glob(os.path.join(path, "**", "part-*.parquet"), recursive=True)
    )
    rename_delta_column(path, "o_orderstatus", "status")
    assert sorted(
        glob.glob(os.path.join(path, "**", "part-*.parquet"), recursive=True)
    ) == files_before
    delete_delta(spark, path, "o_orderkey % 7 = 2")
    out = read_delta(spark, path, partition_filter={"status": "F"})
    return out.agg(
        F.count(F.lit(1)).alias("cnt_f"),
        dsum("o_totalprice").alias("sum_price_f"),
    )


@register(
    "scan_delta_type_widening",
    group="A",
    oracle="""
    with base as (
      select l_orderkey, cast(l_quantity as integer) as qty,
             cast(l_linenumber as integer) as ln
      from lineitem where l_orderkey % 4 = 0
    ), widened as (
      select l_orderkey, cast(l_quantity as bigint) * 1000000000 as qty,
             cast(l_linenumber as double) as ln
      from lineitem where l_orderkey % 4 = 1
    ), unioned as (
      select l_orderkey, cast(qty as bigint) as qty, cast(ln as double) as ln
      from base
      union all select * from widened
    )
    select count(*) as cnt,
           cast(sum(qty) as bigint) as sum_qty,
           cast(sum(ln) as double) as sum_ln,
           cast(max(qty) as bigint) as max_qty
    from unioned
    """,
)
def scan_delta_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: the Delta `typeWidening` table feature (PROTOCOL.md "Type
    Widening") end-to-end. v0 commits lineitem measures as INT columns;
    `widen_delta_column` widens qty→long and ln→double as METADATA-ONLY
    commits (asserted: zero data files touched — on a 100 TB table this
    ALTER costs one JSON publish, not a rewrite); the next append
    carries genuinely-long values (×10⁹, outside int range). The final
    scan reads old int32 parquet pages and new int64 pages under ONE
    wide schema — Spark's vectorized reader promotes the narrow files
    natively, so there is no per-file cast plan and no UDF. Time travel
    to v0 still serves the narrow type. The oracle recomputes the union
    from the source with explicit casts."""
    path = _fresh(_tmp("lineitem_delta_widen"))
    src = load(spark, sf_dir, "lineitem")
    base = src.where(F.col("l_orderkey") % 4 == 0).select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_linenumber").cast("int").alias("ln"),
    )
    write_delta(base, path, "overwrite")
    files_v0 = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    widen_delta_column(path, "qty", "long")
    widen_delta_column(path, "ln", "double")
    assert sorted(glob.glob(os.path.join(path, "part-*.parquet"))) == files_v0, (
        "widen must be metadata-only"
    )
    extra = src.where(F.col("l_orderkey") % 4 == 1).select(
        "l_orderkey",
        (F.col("l_quantity").cast("long") * F.lit(1000000000)).alias("qty"),
        F.col("l_linenumber").cast("double").alias("ln"),
    )
    write_delta(extra, path, "append")
    out = read_delta(spark, path)
    assert isinstance(out.schema["qty"].dataType, T.LongType), out.schema
    assert isinstance(out.schema["ln"].dataType, T.DoubleType), out.schema
    narrow = read_delta(spark, path, version=0)
    assert isinstance(narrow.schema["qty"].dataType, T.IntegerType)
    return out.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("qty").alias("sum_qty"),
        F.sum("ln").alias("sum_ln"),
        F.max("qty").alias("max_qty"),
    )


@register(
    "scan_delta_variant",
    group="A",
    oracle="""
    select lang, count(*) as cnt,
           cast(sum(n_chars) as bigint) as sum_n,
           cast(max(n_chars) as bigint) as max_n
    from documents group by lang
    """,
)
def scan_delta_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: the Delta `variantType` table feature — semi-structured
    VARIANT columns (Spark 4 VariantType, binary-encoded metadata+value
    pair) committed through the native log. Each document's (lang,
    n_chars) pair round-trips text→parse_json→variant→parquet→scan→
    variant_get: the write declares readerFeatures=[variantType] per
    protocol (asserted), the parquet footers carry a LogicalType newer
    than pyarrow's thrift tables (which is why add-action stats are
    empty-but-valid for these files — data skipping degrades to
    scanning, never to wrong answers), and the typed extractions
    aggregate exactly as the oracle recomputes from the source
    columns. Shredding is single-pass and distributed; variant_get is
    a JVM expression, no Python in the plan."""
    path = _fresh(_tmp("documents_delta_variant"))
    src = load(spark, sf_dir, "documents")
    dv = src.select(
        "doc_id",
        F.parse_json(
            F.to_json(F.struct(F.col("lang"), F.col("n_chars").alias("n")))
        ).alias("meta"),
    )
    write_delta(dv, path, "overwrite")
    _a, _s, _v, _pc, _c, proto = _replay_full(path, None)
    assert "variantType" in (proto.get("readerFeatures") or []), proto
    out = read_delta(spark, path)
    assert isinstance(out.schema["meta"].dataType, T.VariantType), out.schema
    return (
        out.select(
            F.variant_get("meta", "$.lang", "string").alias("lang"),
            F.variant_get("meta", "$.n", "long").alias("n"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n").alias("sum_n"),
            F.max("n").alias("max_n"),
        )
    )


@register(
    "scan_delta_cm_id_mode",
    group="A",
    oracle=f"""
    select o_orderstatus as status, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderkey % 5 <> 3
    group by o_orderstatus
    """,
)
def scan_delta_cm_id_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: COLUMN MAPPING mode=id — resolution by parquet FIELD ID
    instead of physical name. The orders table commits mapped with
    every physical field stamped parquet.field.id = its
    delta.columnMapping.id (Spark's parquet writer puts the id into
    the file footers; asserted via the physical schema metadata), and
    reads resolve columns through spark.sql.parquet.fieldId.read
    matching — the protocol contract that keeps a table readable even
    when a foreign engine rewrites data files under different column
    names (pinned with a real foreign-rewrite in
    tests/test_delta_cm_id.py). RENAME stays metadata-only, and a DV
    DELETE addresses rows through the logical view exactly as in name
    mode. The oracle recomputes the surviving rows from the source."""
    path = _fresh(_tmp("orders_delta_cm_id"))
    src = load(spark, sf_dir, "orders")
    write_delta_column_mapped(src, path, "overwrite", cm_mode="id")
    _a, ss, _v, _pc, conf, _p = _replay_full(path, None)
    assert conf["delta.columnMapping.mode"] == "id"
    phys = _cm_physical_struct(
        json.loads(ss)["fields"], with_field_ids=True
    )
    assert all(
        pf["metadata"].get("parquet.field.id") for pf in phys
    ), phys
    files_before = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    rename_delta_column(path, "o_orderstatus", "status")
    assert sorted(glob.glob(os.path.join(path, "part-*.parquet"))) == files_before
    delete_delta(spark, path, "o_orderkey % 5 = 3")
    out = read_delta(spark, path)
    assert "status" in out.columns and "o_orderstatus" not in out.columns
    return out.groupBy("status").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "sink_delta_clone_optimize",
    group="A",
    oracle=f"""
    select o_orderstatus, count(*) as cnt,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders group by o_orderstatus
    """,
)
def sink_delta_clone_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: OPTIMIZE of a PARTITIONED SHALLOW CLONE — the r7 gate,
    lifted. The source commits orders hive-partitioned as deliberately
    small files; the clone references them by ABSOLUTE path (zero
    copies). OPTIMIZE on the clone compacts per partition-group and
    re-materializes the hive layout UNDER THE CLONE ROOT (the stored
    partitionValues become literal columns and Spark's writer creates
    the escaped dirs) — after which every active add is an ordinary
    RELATIVE partitioned file (asserted), the SOURCE's files and log
    are untouched (asserted), log-level partition pruning still works,
    and time travel to the pre-OPTIMIZE version still serves the
    zero-copy layout. dataChange=false, so incremental consumers skip
    the rearrangement. The oracle recomputes the table from the
    source."""
    path_src = _fresh(_tmp("orders_delta_cloneopt_src"))
    path_dst = _fresh(_tmp("orders_delta_cloneopt_dst"))
    src = load(spark, sf_dir, "orders")
    write_delta(
        src.repartition(6), path_src, "overwrite",
        partition_by=["o_orderstatus"],
    )
    src_files = sorted(
        glob.glob(os.path.join(path_src, "**", "part-*.parquet"),
                  recursive=True)
    )
    clone_delta(spark, path_src, path_dst)
    active_before, *_ = _replay(path_dst, None)
    assert all(os.path.isabs(rel) for rel in active_before)
    res = optimize_delta(spark, path_dst)
    assert res["files_compacted"] == len(active_before), res
    active_after, *_ = _replay(path_dst, None)
    assert all(not os.path.isabs(rel) for rel in active_after), (
        "compacted clone files must be relative hive paths"
    )
    assert sorted(
        glob.glob(os.path.join(path_src, "**", "part-*.parquet"),
                  recursive=True)
    ) == src_files, "OPTIMIZE of the clone must not touch the source"
    pruned = read_delta(spark, path_dst, partition_filter={"o_orderstatus": "F"})
    # r10 (guide §1.2): all four assertion counts in ONE action/job;
    # time travel to the zero-copy version still works
    n_pruned, n_f, n_v0, n_src = multi_count(
        pruned,
        src.where("o_orderstatus = 'F'"),
        read_delta(spark, path_dst, version=0),
        src,
    )
    assert n_pruned == n_f
    assert n_v0 == n_src
    return (
        read_delta(spark, path_dst)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


def write_delta_generated(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    generation: dict[str, str] | None = None,
    partition_by: list[str] | None = None,
    now_ms: int | None = None,
    txn: tuple[str, int] | None = None,
) -> int | None:
    """GENERATED COLUMNS (r9 — the protocol's ``generatedColumns``
    writer feature): each ``generation`` entry maps a column to a SQL
    expression stored as the field's ``delta.generationExpression``.
    A column absent from ``df`` is COMPUTED from its expression; a
    provided one is VERIFIED against it (writers must never commit
    contradicting values — one bounded existence probe per column).
    The classic use is partitioning by a derived column —
    ``{"o_month": "month(o_orderdate)"}`` + ``partition_by=
    ["o_month"]`` — so partition pruning works on a column no user
    query writes. Later plain ``write_delta`` appends inherit the
    stored expressions: missing generated columns are computed,
    supplied ones verified (see write_delta). Protocol: the table
    declares the writer-only ``generatedColumns`` feature
    (minWriterVersion 7, reader version untouched)."""
    from pyspark.sql import functions as _F

    generation = dict(generation or {})
    if not generation:
        raise ValueError("generation must map at least one column")
    for c, gexpr in sorted(generation.items()):
        if c in df.columns:
            if df.where(
                ~_F.col(c).eqNullSafe(_F.expr(gexpr))
            ).limit(1).count():
                raise ValueError(
                    f"generated column {c!r} was supplied with values "
                    f"that contradict its generation expression "
                    f"{gexpr!r}"
                )
        else:
            df = df.withColumn(c, _F.expr(gexpr))
    df = df.select(
        *[
            _F.col(c).alias(
                c,
                metadata={"delta.generationExpression": generation[c]},
            )
            if c in generation
            else _F.col(c)
            for c in df.columns
        ]
    )
    return write_delta(
        df, path, mode, now_ms=now_ms, txn=txn, partition_by=partition_by
    )


@register(
    "sink_delta_generated_columns",
    group="A",
    oracle=f"""
    select cast(month(o_orderdate) as integer) as o_month,
           count(*) as cnt, {SUM_D.format('o_totalprice')} as sum_price
    from orders
    where month(o_orderdate) = 3
    group by month(o_orderdate)
    """,
)
def sink_delta_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext (r9): Delta GENERATED COLUMNS end-to-end. Half the orders
    commit with ``o_month`` generated as ``month(o_orderdate)`` and
    PARTITIONED on it (the classic derive-then-partition pattern); the
    other half appends through plain write_delta WITHOUT the column —
    the writer computes it from the stored expression. A commit
    supplying contradicting values refuses (asserted). The
    partition-filtered read prunes files from the LOG by the generated
    column and the oracle recomputes the same slice via the
    expression."""
    from datalakecrawler_spark.sources.scans import _tmp as _t

    path = _fresh(_t("orders_delta_generated"))
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_delta_generated(
        src.where(F.col("o_orderkey") % 2 == 0),
        path, "overwrite",
        generation={"o_month": "month(o_orderdate)"},
        partition_by=["o_month"],
    )
    prot = _replay_full(path, None)[5]
    assert "generatedColumns" in (prot.get("writerFeatures") or []), prot
    # plain append WITHOUT the generated column: computed by the writer
    write_delta(
        src.where(F.col("o_orderkey") % 2 == 1), path, "append",
        partition_by=["o_month"],
    )
    # contradicting values refuse
    try:
        write_delta(
            src.where(F.col("o_orderkey") % 2 == 1)
            .withColumn("o_month", F.lit(99)),
            path, "append", partition_by=["o_month"],
        )
        raise AssertionError("contradicting generated values must refuse")
    except ValueError:
        pass
    out = read_delta(spark, path, partition_filter={"o_month": "3"})
    return out.groupBy("o_month").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("sum_price"),
    )
