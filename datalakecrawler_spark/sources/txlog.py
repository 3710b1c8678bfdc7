"""A-ext — minimal versioned transaction log ("lakelet"): the
Delta/Iceberg-style ACID layer a lake engine needs over raw parquet
directories, reduced to its load-bearing core:

- every write is a COMMIT: data lands in an immutable per-version
  directory, then a JSON manifest (version, mode, adds, removes,
  row counts) is published by atomic rename — readers never see a
  half-written version because the manifest IS the visibility switch.
- a snapshot at version V is "replay manifests 0..V": overwrite
  manifests drop all previously-active directories, append manifests
  add one. Time travel = stop the replay early.
- vacuum deletes directories no longer active at HEAD (breaking time
  travel behind the retained version — same contract as Delta VACUUM).

Single-writer by construction here (version = max existing + 1); at
cluster scale the publish step becomes a conditional put / rename-if-
absent on the object store — the optimistic-concurrency pattern — and
manifests would carry file-level stats for data skipping. Reads stay
plain `spark.read.parquet(*active_dirs)`, so every downstream operator
(including the DuckDB oracle, pointed at the same directories) sees an
ordinary parquet dataset.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load, multi_count
from datalakecrawler_spark.registry import register

from datalakecrawler_spark.sources.scans import _TMP as _SCRATCH

_TMP_BASE = os.path.join(_SCRATCH, "txlog")


def _manifest_dir(base: str) -> str:
    return os.path.join(base, "_txlog")


def _versions(base: str) -> list[int]:
    mdir = _manifest_dir(base)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f.split(".")[0]) for f in os.listdir(mdir) if f.endswith(".json")
    )


def _read_manifest(base: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(base), f"{version:05d}.json")) as fh:
        return json.load(fh)


def txlog_write(
    df: DataFrame, base: str, mode: str = "append", stats_cols: tuple = ()
) -> int:
    """Commit `df` as the next version. mode: 'append' | 'overwrite'.
    Data first (immutable dir), manifest last (atomic rename) — the
    commit point is the rename. `stats_cols` records per-column
    min/max in the manifest (one agg over the written files — served
    from parquet footers at scale), enabling manifest-level data
    skipping at read time (see txlog_scan_pruned)."""
    assert mode in ("append", "overwrite"), mode
    os.makedirs(_manifest_dir(base), exist_ok=True)
    version = (_versions(base)[-1] + 1) if _versions(base) else 0
    data_dir = os.path.join(base, f"v{version:05d}")
    df.write.mode("overwrite").parquet(data_dir)
    written = df.sparkSession.read.parquet(data_dir)
    # r10 (guide §1.2): row count + every column's min/max stats in ONE
    # aggregate action instead of 1 + len(stats_cols) sequential jobs
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(stats_cols):
        aggs += [F.min(c).alias(f"__lo{i}"), F.max(c).alias(f"__hi{i}")]
    row = written.agg(*aggs).collect()[0]
    n_rows = row["__n"]
    stats = {
        c: [row[f"__lo{i}"], row[f"__hi{i}"]] for i, c in enumerate(stats_cols)
    }
    removes = active_dirs(base) if mode == "overwrite" else []
    manifest = {
        "version": version,
        "mode": mode,
        "adds": [f"v{version:05d}"],
        "removes": [os.path.basename(d) for d in removes],
        "rows_added": n_rows,
        "stats": stats,
    }
    tmp = os.path.join(_manifest_dir(base), f".{version:05d}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    # put-if-absent: the manifest file is the commit lock (os.link
    # refuses to clobber — the local form of the conditional put the
    # module doc names); a racing writer fails loudly instead of
    # silently last-write-winning the version
    dest = os.path.join(_manifest_dir(base), f"{version:05d}.json")
    try:
        os.link(tmp, dest)
    except FileExistsError:
        raise RuntimeError(
            f"txlog version {version} was committed concurrently at "
            f"{base}; re-read HEAD and retry"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def active_dirs(base: str, version: int | None = None) -> list[str]:
    """Replay manifests 0..version → currently-visible data dirs."""
    active: list[str] = []
    for v in _versions(base):
        if version is not None and v > version:
            break
        m = _read_manifest(base, v)
        active = [d for d in active if d not in m["removes"]]
        active.extend(m["adds"])
    return [os.path.join(base, d) for d in active]


def txlog_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read the table as of `version` (None = HEAD)."""
    dirs = active_dirs(base, version)
    if not dirs:
        raise ValueError(f"no active data at version {version} in {base}")
    for d in dirs:
        if not os.path.isdir(d):
            raise ValueError(
                f"version {version} references vacuumed data dir {d}"
            )
    return spark.read.parquet(*dirs)


def txlog_history(spark: SparkSession, base: str) -> DataFrame:
    rows = [
        (
            m["version"],
            m["mode"],
            len(m["adds"]),
            len(m["removes"]),
            m["rows_added"],
        )
        for m in (_read_manifest(base, v) for v in _versions(base))
    ]
    return spark.createDataFrame(
        rows, "version int, mode string, n_adds int, n_removes int, rows_added long"
    )


def txlog_vacuum(base: str) -> int:
    """Delete data dirs not active at HEAD. Returns #dirs removed.
    Breaks time travel to versions that referenced them (the VACUUM
    contract)."""
    head_active = {os.path.basename(d) for d in active_dirs(base)}
    removed = 0
    for entry in sorted(os.listdir(base)):
        if entry.startswith("v") and entry not in head_active:
            shutil.rmtree(os.path.join(base, entry))
            removed += 1
    return removed


@register(
    "sink_txlog_versioned",
    group="A",
    oracle="""
    with c as (
      select year(o_orderdate) as y, count(*) as c from orders group by 1
    )
    select 0 as version,
           cast((select sum(c) from c where y <= 1995) as bigint) as n_rows
    union all
    select 1, cast((select sum(c) from c where y <= 1996) as bigint)
    union all
    select 2, cast((select sum(c) from c where y = 1997) as bigint)
    union all
    select 3, cast((select sum(c) from c where y in (1997, 1998)) as bigint)
    order by version
    """,
)
def sink_txlog_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: versioned-table lifecycle — four commits (append, append,
    OVERWRITE, append) against the transaction log, then a time-travel
    read of every version. The oracle derives each version's expected
    row count from the source predicates, so the whole ACID replay
    chain (manifest ordering, overwrite-removes-everything semantics,
    append accumulation) is value-checked, not just smoke-tested.
    Commit = data dir + atomically-renamed JSON manifest; see module
    docstring for the cluster-scale mapping (conditional put,
    file-stats for skipping)."""
    base = os.path.join(_TMP_BASE, "demo")
    shutil.rmtree(base, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    txlog_write(o.where(yr <= 1995), base, "append")
    txlog_write(o.where(yr == 1996), base, "append")
    txlog_write(o.where(yr == 1997), base, "overwrite")
    txlog_write(o.where(yr == 1998), base, "append")
    # r10 (guide §1.2): all four snapshot counts in ONE action/job
    ns = multi_count(*[txlog_snapshot(spark, base, v) for v in range(4)])
    counts = list(zip(range(4), ns))
    return spark.createDataFrame(counts, "version int, n_rows long").orderBy(
        "version"
    )


def txlog_merge(
    spark: SparkSession,
    base: str,
    updates: DataFrame,
    key: str,
) -> int:
    """MERGE INTO the versioned table: rows in `updates` replace
    HEAD rows with the same key, others insert — committed as one
    OVERWRITE version (copy-on-write, the Delta MERGE execution
    model). The rewrite is an anti-join (HEAD minus matched keys)
    unioned with the updates: one shuffle on the key. At cluster
    scale the anti-join narrows to only the files whose key ranges
    intersect the update keys (file-stats pruning via the manifest
    stats below) — copy-on-write never rewrites untouched files."""
    head = txlog_snapshot(spark, base)
    keep = head.join(updates.select(key).distinct(), key, "left_anti")
    merged = keep.unionByName(updates)
    return txlog_write(merged, base, "overwrite")


@register(
    "sink_txlog_merge",
    group="A",
    oracle="""
    with head as (select * from orders where year(o_orderdate) <= 1996),
    upd as (
      select o_orderkey,
             'MERGED' as o_orderstatus
      from orders where year(o_orderdate) <= 1996 and o_orderkey % 10 = 3
    ),
    merged as (
      select o_orderkey, o_orderstatus from head
      where o_orderkey not in (select o_orderkey from upd)
      union all
      select o_orderkey, o_orderstatus from upd
    )
    select count(*) as n_rows,
           count(*) filter (where o_orderstatus = 'MERGED') as n_merged,
           count(distinct o_orderkey) as n_keys
    from merged
    """,
)
def sink_txlog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: MERGE INTO the transaction-log table — copy-on-write
    upsert: every ≡3 (mod 10) order key gets its status rewritten to
    'MERGED', the rest carry over; the merge is one anti-join + union
    committed as an overwrite version, so readers switch atomically
    from pre- to post-merge. The audit row (total rows, merged rows,
    distinct keys) is oracle-derived from the same predicates — total
    and key count must be unchanged by the upsert (property of a
    keyed merge) and is value-checked here."""
    base = os.path.join(_TMP_BASE, "merge_demo")
    shutil.rmtree(base, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    head = o.where(F.year("o_orderdate") <= 1996).select(
        "o_orderkey", "o_orderstatus"
    )
    txlog_write(head, base, "append")
    updates = head.where(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", F.lit("MERGED").alias("o_orderstatus")
    )
    txlog_merge(spark, base, updates, "o_orderkey")
    merged = txlog_snapshot(spark, base)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_orderstatus") == "MERGED").alias("n_merged"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )


def txlog_scan_pruned(
    spark: SparkSession, base: str, col: str, lo, hi
) -> tuple[DataFrame, int, int]:
    """Manifest-level data skipping: read only active dirs whose
    recorded [min, max] for `col` intersects [lo, hi] (dirs with no
    recorded stats are always read — skipping must be sound, never
    required). Returns (frame, n_dirs_scanned, n_dirs_total). This is
    file skipping one level up: at cluster scale the same check runs
    per file against manifest stats BEFORE any footer is opened —
    the planner never even lists pruned data."""
    stats_by_dir = {}
    for v in _versions(base):
        m = _read_manifest(base, v)
        for d in m["adds"]:
            stats_by_dir[d] = m.get("stats", {}).get(col)
    dirs = active_dirs(base)
    keep = []
    for d in dirs:
        s = stats_by_dir.get(os.path.basename(d))
        if s is None or (s[0] <= hi and s[1] >= lo):
            keep.append(d)
    df = spark.read.parquet(*keep).where(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
    return df, len(keep), len(dirs)


@register(
    "scan_txlog_pruned",
    group="A",
    oracle="""
    select 4 as n_dirs_total,
           2 as n_dirs_scanned,
           count(*) as n_rows,
           count(distinct year(o_orderdate)) as n_years
    from orders
    where year(o_orderdate) between 1996 and 1997
    """,
)
def scan_txlog_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: manifest-stats data skipping on the versioned table —
    four yearly commits each record min/max(o_year) in their manifest;
    a [1996, 1997] predicate read then touches exactly the two
    matching version dirs (asserted in the output: the expected
    dir counts are part of the oracle row, so a skipping regression
    hash-mismatches). Skipping is sound-by-construction: dirs without
    stats are always scanned, and the residual predicate still applies
    after pruning."""
    base = os.path.join(_TMP_BASE, "prune_demo")
    shutil.rmtree(base, ignore_errors=True)
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    for y in (1995, 1996, 1997, 1998):
        txlog_write(
            o.where(F.col("o_year") == y), base, "append", stats_cols=("o_year",)
        )
    df, scanned, total = txlog_scan_pruned(spark, base, "o_year", 1996, 1997)
    return df.agg(
        F.lit(total).alias("n_dirs_total"),
        F.lit(scanned).alias("n_dirs_scanned"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_year").alias("n_years"),
    )


def txlog_write_commit(
    df: DataFrame,
    base: str,
    mode: str = "append",
    stats_cols: tuple = (),
    epoch: int | None = None,
) -> int | None:
    """Exactly-once variant of txlog_write for streaming sinks: if a
    manifest already records `epoch`, the commit is a no-op (a retried
    micro-batch cannot double-commit). The epoch check + rename is the
    idempotence point — stronger than overwrite-by-path, because a
    replayed epoch neither rewrites data nor adds a version."""
    if epoch is not None:
        for v in _versions(base):
            if _read_manifest(base, v).get("epoch") == epoch:
                return None
    version = txlog_write(df, base, mode, stats_cols)
    if epoch is not None:
        # annotate the just-written manifest (single-writer; see module doc)
        path = os.path.join(_manifest_dir(base), f"{version:05d}.json")
        m = _read_manifest(base, version)
        m["epoch"] = epoch
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.rename(tmp, path)
    return version


@register(
    "sink_txlog_schema_evolution",
    group="A",
    oracle="""
    select cast(count(*) as bigint) as n_rows,
           cast(count(*) filter (where year(o_orderdate) <= 1995) as bigint)
             as n_without_flag,
           cast(count(*) filter (where year(o_orderdate) = 1996) as bigint)
             as n_with_flag
    from orders where year(o_orderdate) <= 1996
    """,
)
def sink_txlog_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: additive schema evolution on the versioned table — v0
    commits two columns, v1 appends the same shape PLUS a new o_flag
    column; the snapshot read merges schemas (mergeSchema), so v0 rows
    surface the new column as NULL. That null/non-null split is the
    oracle check: rows without the flag must be exactly the v0
    predicate's rows. Additive evolution is the only kind this layer
    permits (same contract as Delta's schema-on-write default);
    renames/drops require an explicit overwrite commit."""
    base = os.path.join(_TMP_BASE, "evolve_demo")
    shutil.rmtree(base, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    txlog_write(o.where(yr <= 1995).select("o_orderkey", "o_totalprice"), base)
    txlog_write(
        o.where(yr == 1996).select(
            "o_orderkey", "o_totalprice", F.lit("backfilled").alias("o_flag")
        ),
        base,
    )
    dirs = active_dirs(base)
    snap = spark.read.option("mergeSchema", "true").parquet(*dirs)
    return snap.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_flag").isNull()).alias("n_without_flag"),
        F.count_if(F.col("o_flag").isNotNull()).alias("n_with_flag"),
    )


@register(
    "txlog_time_travel_diff",
    group="A",
    oracle="""
    with c as (
      select year(o_orderdate) as y, cast(count(*) as bigint) as c
      from orders group by 1
    )
    select 0 as v_from, 1 as v_to,
           (select c from c where y = 1996) as n_inserted,
           cast(0 as bigint) as n_deleted
    union all
    select 1, 2,
           (select c from c where y = 1997),
           (select cast(sum(c) as bigint) from c where y <= 1996)
    union all
    select 2, 3,
           (select c from c where y = 1998),
           cast(0 as bigint)
    order by v_from
    """,
)
def txlog_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: version-to-version CHANGE FEED over the transaction log —
    for each adjacent version pair of the demo table (append 1995-,
    append 1996, OVERWRITE with 1997, append 1998), the count of
    inserted and deleted rows computed by key anti-joins between the
    two time-travel snapshots. This is Delta CDF / Iceberg
    changelog-scan semantics reconstructed from plain snapshots — the
    operator a downstream incremental consumer runs when the table
    doesn't materialize a change feed. Computed as ONE job, not one
    anti-join pair per version step: every snapshot is tagged with
    its version, one shuffle on the key collects each key's version-
    membership set, and all adjacent-pair insert/delete counts fall
    out of a single aggregation — per-pair anti-joins re-shuffle the
    table once per version step, which is the wrong shape for a
    change feed over a long history. The oracle derives expected
    counts from the source predicates, so overwrite-drops-everything
    and append-accumulates are value-checked across the whole replay
    chain."""
    base = os.path.join(_TMP_BASE, f"ttdiff-{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    txlog_write(o.where(yr <= 1995), base, "append")
    txlog_write(o.where(yr == 1996), base, "append")
    txlog_write(o.where(yr == 1997), base, "overwrite")
    txlog_write(o.where(yr == 1998), base, "append")
    n_vers = 4
    tagged = None
    for v in range(n_vers):
        t = txlog_snapshot(spark, base, v).select(
            "o_orderkey", F.lit(v).alias("v")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    membership = tagged.groupBy("o_orderkey").agg(
        F.collect_set("v").alias("vs")
    )
    wide = membership.agg(
        *[
            F.count_if(
                F.array_contains("vs", v + 1) & ~F.array_contains("vs", v)
            ).alias(f"ins_{v}")
            for v in range(n_vers - 1)
        ],
        *[
            F.count_if(
                F.array_contains("vs", v) & ~F.array_contains("vs", v + 1)
            ).alias(f"del_{v}")
            for v in range(n_vers - 1)
        ],
    )
    stack_args = ", ".join(
        f"{v}, {v + 1}, ins_{v}, del_{v}" for v in range(n_vers - 1)
    )
    return wide.select(
        F.expr(
            f"stack({n_vers - 1}, {stack_args}) "
            "as (v_from, v_to, n_inserted, n_deleted)"
        )
    ).orderBy("v_from")


@register(
    "txlog_vacuum_audit",
    group="A",
    oracle="""
    select cast(2 as integer) as n_dirs_vacuumed,
           cast(1 as integer) as reclaim_positive,
           cast(1 as integer) as head_identical,
           (select count(*) from nation where n_nationkey >= 20) as head_rows,
           cast(3 as integer) as n_manifests,
           cast(1 as integer) as time_travel_broken
    """,
)
def txlog_vacuum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: the VACUUM leg of the transaction-log lifecycle — build a
    lakelet whose history strands data (append, append, OVERWRITE: the
    overwrite's manifest removes both earlier dirs from visibility but
    their bytes stay on disk), then vacuum and audit the contract:
    (1) only non-HEAD-active dirs are deleted and their byte count is
    the reclaim, (2) the HEAD snapshot is BIT-IDENTICAL before/after
    (vacuum must never touch visible data), (3) time travel to the
    pre-overwrite version now fails loudly (the documented trade —
    same contract as Delta VACUUM), (4) history metadata survives
    (manifests are never vacuumed, only data dirs). At 100 TB this is
    an object-store LIST + prefix-delete planned from manifests alone
    — no data read. Promoted r4 from rows-only (verdict-boolean
    pattern): byte totals and directory layout are env-specific, so the
    result carries the four contract clauses as measured verdicts
    (vacuumed-dir count, positive reclaim, HEAD bit-identity, broken
    time travel, surviving manifests) plus the deterministic HEAD row
    count, which the oracle recomputes from the source predicate."""
    base = os.path.join(_TMP_BASE, f"vacuum_audit_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    txlog_write(n.where(F.col("n_nationkey") < 10), base, mode="append")
    txlog_write(
        n.where((F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 20)),
        base,
        mode="append",
    )
    txlog_write(n.where(F.col("n_nationkey") >= 20), base, mode="overwrite")

    def _dir_bytes(d: str) -> int:
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    stranded = [
        d
        for d in (os.path.join(base, e) for e in sorted(os.listdir(base)))
        if os.path.basename(d).startswith("v")
        and d not in active_dirs(base)
    ]
    expect_reclaim = sum(_dir_bytes(d) for d in stranded)
    head_before = sorted(
        tuple(r) for r in txlog_snapshot(spark, base).collect()
    )
    n_versions_before = len(_versions(base))

    n_removed = txlog_vacuum(base)

    head_after = sorted(tuple(r) for r in txlog_snapshot(spark, base).collect())
    assert head_after == head_before, "vacuum touched HEAD-visible data"
    assert n_removed == len(stranded) == 2, (n_removed, stranded)
    assert len(_versions(base)) == n_versions_before, "manifests vacuumed"
    time_travel_broken = False
    try:
        txlog_snapshot(spark, base, version=1).count()
    except ValueError:
        time_travel_broken = True
    assert time_travel_broken, "time travel to vacuumed version must fail"

    return spark.createDataFrame(
        [
            (
                n_removed,
                int(expect_reclaim > 0),
                int(head_after == head_before),
                len(head_after),
                n_versions_before,
                int(time_travel_broken),
            )
        ],
        "n_dirs_vacuumed int, reclaim_positive int, head_identical int, "
        "head_rows long, n_manifests int, time_travel_broken int",
    )
