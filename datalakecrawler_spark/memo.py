"""Bounded per-application memo for localCheckpoint'ed DataFrames.

Several operator families memoize an expensive shared intermediate (the
LSH banded-signature table, IVF centroids/inverted file, the
co-purchase edge list, connected components) as a localCheckpoint'ed
DataFrame keyed by ``(applicationId, sf_dir)``. Checkpointed RDD blocks
live in executor storage until the SparkContext dies, so an unbounded
memo in a long-lived driver that iterates many ``sf_dir`` values (a
multi-tenant catalog service, a test matrix over scale factors) would
accumulate storage indefinitely (ADVICE r3 item 3).

This module gives every memo the same discipline:

- **Bounded**: keep at most ``keep`` entries per ``applicationId``
  (insertion order; oldest evicted first). Entries from dead
  applications are dropped opportunistically too.
- **Unpersist on eviction**: ``DataFrame.localCheckpoint`` persists the
  underlying RDD at MEMORY_AND_DISK, but the returned Dataset is backed
  by a ``LogicalRDD`` — ``Dataset.unpersist()`` is a cache-manager
  no-op for it. The only honest release is via the context's persistent
  -RDD registry: we snapshot ``JavaSparkContext.getPersistentRDDs()``
  around the checkpoint call, attribute the newly-persistent RDD ids to
  the memo entry, and call ``JavaRDD.unpersist(false)`` on exactly
  those ids when the entry is evicted. Best-effort by design: if the
  py4j probe fails (API drift, context already stopped) the eviction
  still happens and only the storage release is skipped.
- **Serialized builds**: one lock per process. Builds are heavyweight
  (that is why they are memoized), so serializing them costs nothing
  and prevents the id-attribution snapshot from racing a concurrent
  checkpoint in another thread (the catalog profilers run thread pools
  within a single query).
"""
from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.RLock()

# RDD ids already attributed to a live memo entry (any memo). Nested
# memoized builds (_copurchase_components builds on the memoized
# _edges table) would otherwise double-attribute the inner entry's
# blocks to the outer entry, and evicting the outer would unpersist
# blocks the inner still serves — a lost-checkpoint job failure.
_CLAIMED: set = set()

# how many (applicationId, sf_dir, …) entries each memo keeps per app:
# the test matrix touches sf0.001/0.01/0.1 plus a couple of tmp dirs.
DEFAULT_KEEP = 4


def _persistent_rdd_ids(sc) -> set:
    """Snapshot the ids of all persistent RDDs in the context — one
    py4j round trip (toArray), not one per entry: this runs twice per
    memo build AND per distrank layout, under the build lock."""
    return {int(x) for x in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _unpersist_ids(sc, rdd_ids) -> None:
    """Release specific persistent RDDs by id (non-blocking)."""
    jmap = sc._jsc.getPersistentRDDs()
    for rid in rdd_ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def memoized_checkpoint(
    memo: dict,
    spark: SparkSession,
    key_extra,
    build: Callable[[], DataFrame],
    keep: int = DEFAULT_KEEP,
) -> DataFrame:
    """Return ``memo``'s entry for ``(applicationId, key_extra)``,
    building it via ``build().localCheckpoint()`` on first use and
    evicting (with storage release) beyond ``keep`` entries per app.

    ``build`` must return a NON-checkpointed DataFrame; the checkpoint
    happens here so the newly-persisted RDD ids can be attributed to
    the memo entry for later release.
    """
    sc = spark.sparkContext
    app = sc.applicationId
    key = (app, key_extra)
    with _LOCK:
        hit = memo.get(key)
        if hit is not None:
            return hit[0]
        try:
            before = _persistent_rdd_ids(sc)
        except Exception:
            before = None
        df = build().localCheckpoint()
        new_ids: set = set()
        if before is not None:
            try:
                new_ids = _persistent_rdd_ids(sc) - before - _CLAIMED
            except Exception:
                new_ids = set()
        _CLAIMED.update(new_ids)
        memo[key] = (df, new_ids)
        _evict(memo, sc, app, keep)
        return df


# --------------------------------------------------------------------------
# Driver-side scalar statistics memo
# --------------------------------------------------------------------------
#
# Several query builders need one scalar table statistic (row count of a
# fixture corpus, node count of the co-purchase graph) as a Python value
# baked into the plan (e.g. the 1/N teleport term of PageRank). Computing
# it inline makes every *plan construction* launch a Spark job — the
# replan profile in BENCH_DETAIL.json showed `deg.count()` style scalars
# dominating per-query rebuild cost. Real engines serve exactly these
# numbers from catalog statistics; this memo is that catalog, scoped per
# (applicationId, sf_dir, stat-key) and bounded like the DataFrame memos.
# The underlying tables are immutable driver fixtures, so per-application
# caching is semantics-preserving.

_SCALAR_MEMO: dict = {}
_SCALAR_KEEP = 64  # scalars are a few bytes; bound only against leaks


def memoized_scalar(spark: SparkSession, key_extra, compute: Callable[[], object]):
    """Return the memoized scalar for ``(applicationId, key_extra)``,
    computing it once per application via ``compute()`` (which may run
    a Spark action)."""
    app = spark.sparkContext.applicationId
    key = (app, key_extra)
    with _LOCK:
        if key in _SCALAR_MEMO:
            return _SCALAR_MEMO[key]
    val = compute()  # outside the lock: actions can be slow
    with _LOCK:
        _SCALAR_MEMO.setdefault(key, val)
        dead = [k for k in _SCALAR_MEMO if k[0] != app]
        for k in dead:
            _SCALAR_MEMO.pop(k)
        mine = [k for k in _SCALAR_MEMO if k[0] == app]
        while len(mine) > _SCALAR_KEEP:
            _SCALAR_MEMO.pop(mine.pop(0))
        return _SCALAR_MEMO[key]


def _evict(memo: dict, sc, app: str, keep: int) -> None:
    """Drop entries beyond ``keep`` for ``app`` (oldest first) and any
    entries whose application is not the live one (their context — and
    with it every checkpointed block — is already gone)."""
    dead = [k for k in memo if k[0] != app]
    for k in dead:
        _df, rdd_ids = memo.pop(k)  # storage died with that context
        _CLAIMED.difference_update(rdd_ids)
    mine = [k for k in memo if k[0] == app]
    while len(mine) > keep:
        victim = mine.pop(0)  # dicts preserve insertion order
        _df, rdd_ids = memo.pop(victim)
        _CLAIMED.difference_update(rdd_ids)
        try:
            _unpersist_ids(sc, rdd_ids)
        except Exception:
            pass  # best-effort: eviction still bounds the memo
