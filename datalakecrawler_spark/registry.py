"""Single source of truth: operator name → (Spark callable, oracle SQL).

Every operator from SURVEY.md §2 registers itself here via ``@register``.
``__spark_entry__.py`` (the driver contract) and ``tests/`` both read
this registry, so a query cannot be declared to the driver without the
pytest harness exercising it first.

Float parity policy (SURVEY.md §2.L trap 1, hardened):
Plain double sums are order-dependent — Spark's per-partition partial
aggregation and DuckDB's vectorized chunks sum in different orders, and
at sf0.01 the divergence (~1e-5 absolute at 1e9 magnitude) survives a
round-to-6. We therefore sum in exact integer micro-units (see dsum):
per-row quantization is IEEE-deterministic and engine-identical, the
integer sum is order-independent, and the final int→double conversion
rounds identically in both engines. Helpers ``dsum``/``davg`` (Spark
side) pair with ``SUM_D``/``AVG_D`` SQL templates (oracle side).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.session import configure_session

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    group: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    group: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark, sf_dir) -> DataFrame operator + its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = Query(name, wrapped, oracle, group, tuple(tags))
        return fn

    return deco


def reorder_contract_first(contract: tuple[str, ...]) -> None:
    """Rebuild the registry so the SURVEY §2 contract names come first
    (in inventory order), then all extensions in import order.

    The external driver walks ``queries()`` in dict-insertion order and
    its correctness window may be capped (round 1: first 50 entries
    only). Contract-first ordering guarantees a capped run always
    checks the 97 binding operators before any extension."""
    global _REGISTRY
    missing = [n for n in contract if n not in _REGISTRY]
    if missing:
        raise KeyError(f"contract names not registered: {missing}")
    head = {n: _REGISTRY[n] for n in contract}
    tail = {n: q for n, q in _REGISTRY.items() if n not in head}
    _REGISTRY = {**head, **tail}


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _REGISTRY.values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


# --------------------------------------------------------------------------
# Cross-engine float parity helpers (Spark side)
# --------------------------------------------------------------------------

_DEC = "decimal(38,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def r6(col: Column | str) -> Column:
    """Round a double to 6 decimals (final-output policy for doubles)."""
    return F.round(_c(col), 6)


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double expression (see module doc).

    Implementation: micro-unit integer sums — ``sum(floor(x·1e6 + 0.5))``
    as long, converted back to double at the end. Every step is
    IEEE-deterministic and engine-identical: the ×1e6 multiply and the
    +0.5/floor are exact-rounded double ops (same bits both engines),
    the long sum is exact integer math (order-independent), and the
    final long→double conversion rounds identically. This stays on
    Tungsten's codegen'd long fast path — ~3.4× faster than routing
    through decimal(38,10), which overflows Spark's compact-long
    Decimal representation and falls back to BigDecimal per row.

    Envelope: exact while |sum| ≤ 9.2e12 (micro-units fit int64). For
    larger magnitudes drop the scale (1e4 micro-units reach 9.2e14 and
    double ulp already exceeds 1e-4 there, so nothing is lost).
    DuckDB accumulates sum(bigint) in int128 — no overflow on its side.
    """
    return F.sum(F.floor(_c(col) * 1e6 + 0.5)).cast("double") / 1e6


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact micro-unit sum / count, rounded.
    Division order (sum/count, then /1e6, then round) must match AVG_D
    exactly — double division is deterministic but not associative."""
    c = _c(col)
    return F.round(F.sum(F.floor(c * 1e6 + 0.5)).cast("double") / F.count(c) / 1e6, 6)


# Oracle-side (DuckDB) templates matching dsum/davg. Usage:
#   SUM_D.format("l_extendedprice * (1 - l_discount)")
SUM_D = "cast(sum(cast(floor(({0}) * 1e6 + 0.5) as bigint)) as double) / 1e6"
AVG_D = (
    "round(cast(sum(cast(floor(({0}) * 1e6 + 0.5) as bigint)) as double)"
    " / count({0}) / 1e6, 6)"
)
