"""Distributed exact global ranks / prefix sums — the single-partition
window killer.

``row_number().over(Window.orderBy(...))`` (no partitionBy) funnels the
whole frame through ONE task: correct, and fine for calendar-bounded
frames (per-day/per-month rollups), but a 1000-executor death sentence
for any frame that grows with the data (fact rows, customer/user/part
grain, high-cardinality distinct values). This module provides the
exact distributed equivalent, factored out of the sorted-neighborhood
rank in ``pipeline/dedup.py`` (``_snm_candidate_pairs``):

    range-partition on the order key → per-partition local rank /
    cumulative sum → add per-partition offsets (a ≤#partitions-row
    collect — the distributed zipWithIndex shape).

Rank = local rank + offset is exact for ANY boundary placement because
range partitions are disjoint and ordered; the result is bit-identical
to the single-partition window, so converting a call site can never
change an oracle hash. The input layout is frozen with localCheckpoint
so the offset collect and every consumer branch see one assignment
(same determinism discipline as the SNM rank and the prefix-filter gid
table).

``order_cols`` must be a TIE-FREE total order (append a unique key —
every call site here has one). For tied/rank() semantics, rank at the
distinct-value grain (groupBy value → count → exclusive global cumsum
→ 2·avg-rank = 2·cum_before + cnt + 1) and join back — the
rank-map pattern of ``stats_spearman_corr``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark import memo as _memo

# Bounded per-application registry of checkpointed layout RDD ids
# (ADVICE r4, medium). Every distrank call localCheckpoints its input
# frame — often fact-sized — and checkpointed blocks live in executor
# storage until the context dies, so a long-lived driver running many
# distrank queries would accumulate storage unboundedly (the exact
# problem memo.py bounds for memoized intermediates). Layouts are not
# memoized (each call is query-private), so the discipline here is a
# FIFO: keep the newest _KEEP_LAYOUTS layouts per app and release the
# storage of anything older via the same persistent-RDD-id attribution
# memo.py uses (snapshot getPersistentRDDs around the checkpoint under
# memo's process lock, honest JavaRDD.unpersist on eviction, _CLAIMED
# cross-registry bookkeeping so a memoized build that calls distrank
# internally never double-attributes blocks).
#
# Safety: localCheckpoint TRUNCATES lineage, so an evicted layout's
# DataFrame must never be re-read. _KEEP_LAYOUTS = 16 gives that
# headroom structurally: a single query plan uses at most ~3 layouts,
# and every consumer in the repo (driver, driver_sim, bench, pytest
# compare) fully materializes one query before building the next, so a
# layout is only evicted ≥5 queries after its plan was last buildable.
# A caller that holds a distrank-backed DataFrame across many
# subsequent distrank queries and re-collects it later must cache the
# RESULT it needs, not the lazy frame — documented contract.
_LAYOUTS: list = []  # [(applicationId, frozenset(rdd_ids)), ...] FIFO
_KEEP_LAYOUTS = 16

# Memoized layouts (r10, VERDICT r9 'Next round' #6): a distrank call
# does two build-time Spark actions — the layout localCheckpoint and
# the offset collect — so every FRESH PLAN BUILD of a distrank-backed
# query re-pays them (bench replan profile: events_power_user_curve
# ~0.47 s/plan, almost all of it these two actions). When the caller's
# input frame is a deterministic function of the immutable fixture
# snapshot (same contract as memo.memoized_scalar's catalog
# statistics), the frozen layout AND its collected offsets can be
# memoized per (applicationId, caller key): a real engine would serve
# both from a materialized sorted projection + catalog stats. The
# offsets are stored WITH the layout entry (never recomputed against a
# rebuilt layout, whose range boundaries need not reproduce), and
# eviction releases both together via the same persistent-RDD-id
# discipline as memo.memoized_checkpoint.
_RANK_MEMO: dict = {}  # (app, memo_key) -> [part_df, rdd_ids, {stats}]
_RANK_KEEP = 8


def _memoized_layout(df: DataFrame, order_cols: list, memo_key) -> list:
    spark = df.sparkSession
    sc = spark.sparkContext
    app = sc.applicationId
    npart = _npart(spark)
    key = (app, memo_key, npart)
    with _memo._LOCK:
        hit = _RANK_MEMO.get(key)
        if hit is not None:
            return hit
        try:
            before = _memo._persistent_rdd_ids(sc)
        except Exception:
            before = None
        part = (
            df.repartitionByRange(npart, *order_cols)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint()
        )
        new_ids: set = set()
        if before is not None:
            try:
                new_ids = _memo._persistent_rdd_ids(sc) - before - _memo._CLAIMED
            except Exception:
                new_ids = set()
        _memo._CLAIMED.update(new_ids)
        entry = [part, new_ids, {}]
        _RANK_MEMO[key] = entry
        # evict dead apps, then oldest beyond the keep window
        dead = [k for k in _RANK_MEMO if k[0] != app]
        for k in dead:
            _e = _RANK_MEMO.pop(k)
            _memo._CLAIMED.difference_update(_e[1])
        mine = [k for k in _RANK_MEMO if k[0] == app]
        while len(mine) > _RANK_KEEP:
            victim = mine.pop(0)
            _e = _RANK_MEMO.pop(victim)
            _memo._CLAIMED.difference_update(_e[1])
            try:
                _memo._unpersist_ids(sc, _e[1])
            except Exception:
                pass
        return entry


def _register_layout(sc, rdd_ids: set) -> None:
    _memo._CLAIMED.update(rdd_ids)
    _LAYOUTS.append((sc.applicationId, frozenset(rdd_ids)))
    # drop entries from dead applications (their storage died with the
    # context), then evict beyond the keep window for the live one
    app = sc.applicationId
    dead = [e for e in _LAYOUTS if e[0] != app]
    for e in dead:
        _LAYOUTS.remove(e)
        _memo._CLAIMED.difference_update(e[1])
    while sum(1 for e in _LAYOUTS if e[0] == app) > _KEEP_LAYOUTS:
        victim = next(e for e in _LAYOUTS if e[0] == app)
        _LAYOUTS.remove(victim)
        _memo._CLAIMED.difference_update(victim[1])
        try:
            _memo._unpersist_ids(sc, victim[1])
        except Exception:
            pass  # best-effort: the FIFO stays bounded regardless


def _npart(spark: SparkSession) -> int:
    """Session shuffle-partition count with a safe fallback (ADVICE
    r9: some AQE platforms hold a non-numeric value like "auto")."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", ""))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _with_partition_layout(df: DataFrame, order_cols: list) -> DataFrame:
    """Range-partition by the order key, stamp the partition id, and
    freeze the layout (see module doc). The partition count follows
    spark.sql.shuffle.partitions so the offset table scales with the
    cluster, not a constant (on a 1000-executor session the session
    config carries the right width; the offset collect stays
    #partitions-sized either way). The checkpointed blocks are
    tracked in the bounded per-app layout FIFO above."""
    npart = _npart(df.sparkSession)
    sc = df.sparkSession.sparkContext
    with _memo._LOCK:
        try:
            before = _memo._persistent_rdd_ids(sc)
        except Exception:
            before = None
        part = (
            df.repartitionByRange(npart, *order_cols)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint()
        )
        new_ids: set = set()
        if before is not None:
            try:
                new_ids = (
                    _memo._persistent_rdd_ids(sc) - before - _memo._CLAIMED
                )
            except Exception:
                new_ids = set()
        _register_layout(sc, new_ids)
    return part


def with_global_row_number(
    df: DataFrame,
    spark: SparkSession,
    order_cols: list,
    out: str = "rn",
    with_total: str | None = None,
    memo_key=None,
) -> DataFrame:
    """Exact global ``row_number() over (order by *order_cols)`` as a
    distributed plan. ``order_cols`` must be tie-free. When
    ``with_total`` is given, a column holding the total row count is
    added too (free — it is the last partition offset), replacing the
    ``count().over(Window.partitionBy())`` global-window idiom.
    ``memo_key`` (only for inputs that are deterministic functions of
    an immutable fixture snapshot — include the sf_dir) memoizes the
    frozen layout and its offset collect per application, so repeated
    plan builds of the same registered query skip both build-time
    actions (see _RANK_MEMO)."""
    if memo_key is not None:
        entry = _memoized_layout(df, order_cols, memo_key)
        part = entry[0]
        sizes = entry[2].get("sizes")
        if sizes is None:
            sizes = {
                r["__pid"]: r["n"]
                for r in part.groupBy("__pid")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            with _memo._LOCK:
                entry[2].setdefault("sizes", sizes)
    else:
        part = _with_partition_layout(df, order_cols)
        sizes = {
            r["__pid"]: r["n"]
            for r in part.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    offs, acc = [], 0
    for pid in sorted(sizes):
        offs.append((pid, acc))
        acc += sizes[pid]
    off_df = F.broadcast(spark.createDataFrame(offs, "__pid int, __off long"))
    lw = W.partitionBy("__pid").orderBy(*order_cols)
    out_df = (
        part.withColumn("__lrn", F.row_number().over(lw))
        .join(off_df, "__pid")
        .withColumn(out, (F.col("__lrn") + F.col("__off")).cast("long"))
    )
    if with_total is not None:
        out_df = out_df.withColumn(with_total, F.lit(acc).cast("long"))
    return out_df.drop("__pid", "__lrn", "__off")


def with_global_cumsum(
    df: DataFrame,
    spark: SparkSession,
    order_cols: list,
    val_col: str,
    out: str = "cum",
    inclusive: bool = True,
    with_total: str | None = None,
    rn_out: str | None = None,
    rows_total: str | None = None,
    extra: list | None = None,
    extra_totals: list | None = None,
    memo_key=None,
) -> DataFrame:
    """Exact global ``sum(val) over (order by *order_cols rows
    unbounded preceding [and -1])`` as a distributed plan. ``val_col``
    must be an exact INTEGRAL type (int/long — the offset table is
    long-typed; decimals would need a wider offset schema, and float
    addition reassociated across partitions would not be bit-stable).
    ``order_cols`` must be tie-free (with ties the
    row-level cum depends on the tie order exactly as it does in the
    single-partition window — only call with ties when the consumer is
    tie-insensitive, e.g. a monotone-crossing predicate).

    ``rn_out``/``rows_total`` additionally emit the global row number
    and total row count from the SAME frozen layout and the same
    single offset collect — the cumulative-distribution shape
    (rank + running share + totals) in one range shuffle. ``extra``
    is a list of further ``(val_col, out_col)`` running sums over the
    same order (e.g. a two-sample ECDF), again sharing the layout and
    collect; ``extra_totals`` (aligned with ``extra``) names columns
    to carry each extra sum's GRAND total (already known from the
    same offset collect — the ECDF denominator, free like
    ``with_total``)."""
    extra = extra or []
    pairs = [(val_col, out)] + list(extra)

    def _collect_stats(part):
        aggs = [F.sum(v).alias(f"__s{i}") for i, (v, _) in enumerate(pairs)]
        return {
            r["__pid"]: ([r[f"__s{i}"] for i in range(len(pairs))], r["__c"])
            for r in part.groupBy("__pid")
            .agg(*aggs, F.count(F.lit(1)).alias("__c"))
            .collect()
        }

    if memo_key is not None:
        # memoized layout + offsets (see with_global_row_number doc)
        entry = _memoized_layout(df, order_cols, memo_key)
        part = entry[0]
        stats_key = ("cumsum",) + tuple(str(v) for v, _ in pairs)
        stats = entry[2].get(stats_key)
        if stats is None:
            stats = _collect_stats(part)
            with _memo._LOCK:
                entry[2].setdefault(stats_key, stats)
    else:
        part = _with_partition_layout(df, order_cols)
        stats = _collect_stats(part)
    offs, accs, nacc = [], [0] * len(pairs), 0
    for pid in sorted(stats):
        offs.append((pid, *accs, nacc))
        accs = [a + (s or 0) for a, s in zip(accs, stats[pid][0])]
        nacc += stats[pid][1]
    off_cols = ", ".join(f"__off{i} long" for i in range(len(pairs)))
    off_df = F.broadcast(
        spark.createDataFrame(offs, f"__pid int, {off_cols}, __noff long")
    )
    hi = W.currentRow if inclusive else -1
    lw = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, hi)
    )
    out_df = part.join(off_df, "__pid")
    for i, (v, o) in enumerate(pairs):
        out_df = out_df.withColumn(
            o,
            (
                F.coalesce(F.sum(v).over(lw), F.lit(0)) + F.col(f"__off{i}")
            ).cast("long"),
        )
    if rn_out is not None:
        lwr = W.partitionBy("__pid").orderBy(*order_cols)
        out_df = out_df.withColumn(
            rn_out,
            (F.row_number().over(lwr) + F.col("__noff")).cast("long"),
        )
    if with_total is not None:
        out_df = out_df.withColumn(with_total, F.lit(accs[0]).cast("long"))
    if extra_totals is not None:
        for i, name in enumerate(extra_totals, start=1):
            if name is not None:
                out_df = out_df.withColumn(
                    name, F.lit(accs[i]).cast("long")
                )
    if rows_total is not None:
        out_df = out_df.withColumn(rows_total, F.lit(nacc).cast("long"))
    return out_df.drop(
        "__pid", "__noff", *[f"__off{i}" for i in range(len(pairs))]
    )


def ntile_from_rank(rn, n, k: int):
    """Spark/SQL ``ntile(k)`` computed from an exact global row number
    ``rn`` (1-based) and total ``n`` — bucket sizes differ by ≤1 with
    the larger buckets first, exactly the WindowExec definition, so a
    converted call site stays hash-identical. All-integer arithmetic."""
    base = F.floor(n / k)
    rem = n - base * k
    cut = rem * (base + 1)  # rows covered by the (base+1)-sized buckets
    return (
        F.when(rn <= cut, F.ceil(rn / (base + 1)))
        .otherwise(rem + F.ceil((rn - cut) / F.when(base > 0, base)))
        .cast("int")
    )


def with_global_cummax(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    out: str = "cummax",
    inclusive: bool = True,
) -> DataFrame:
    """Exact global ``max(val) over (order by *order_cols rows
    unbounded preceding [and -1])`` as a distributed plan — running
    max = greatest(per-partition running max, max over all PRECEDING
    partitions). The partition-offset table is ≤#partitions rows, so
    its own prefix-max window is bounded, not data-proportional; no
    driver round-trip is needed (types stay native — timestamps,
    dates, decimals all work). First-row semantics match the window
    form: an exclusive frame with no predecessor yields NULL."""
    part = _with_partition_layout(df, order_cols)
    offs = (
        part.groupBy("__pid")
        .agg(F.max(val_col).alias("__m"))
        .select(
            "__pid",
            F.max("__m")
            .over(
                W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
            )
            .alias("__offmax"),
        )
    )
    hi = W.currentRow if inclusive else -1
    lw = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, hi)
    )
    return (
        part.join(F.broadcast(offs), "__pid")
        .withColumn(
            out, F.greatest(F.max(val_col).over(lw), F.col("__offmax"))
        )
        .drop("__pid", "__offmax")
    )
