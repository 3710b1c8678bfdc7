"""Single source of truth: operator name → (Spark callable, oracle SQL).

Every operator from SURVEY.md §2 registers itself here via ``@register``.
``__spark_entry__.py`` (the driver contract) and ``tests/`` both read
this registry, so a query cannot be declared to the driver without the
pytest harness exercising it first.

Float parity policy (SURVEY.md §2.L trap 1, hardened):
Plain double sums are order-dependent — Spark's per-partition partial
aggregation and DuckDB's vectorized chunks sum in different orders, and
at sf0.01 the divergence (~1e-5 absolute at 1e9 magnitude) survives a
round-to-6. We therefore route every SUM/AVG over doubles through
decimal(38,10): the per-row double→decimal conversion is deterministic
and identical in both engines, decimal addition is exact and hence
order-independent, and the final cast-back + round(6) is deterministic.
Helpers ``dsum``/``davg`` (Spark side) pair with ``SUM_D``/``AVG_D``
SQL templates (oracle side).
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

    The final rounding happens IN DECIMAL (cast 38,10 → 38,6, HALF_UP in
    both engines) before the double cast: at sum magnitudes ≥ ~4e9 the
    double ulp (≥ 4.8e-7) is comparable to the 1e-6 round grid, so
    rounding the already-cast double is engine-dependent at midpoints.
    Decimal-rounding first makes the cast-to-double input identical.
    """
    return F.sum(_c(col).cast(_DEC)).cast("decimal(38,6)").cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, then round.
    Safe for |avg| « 1e8 where the double grid is far finer than 1e-6
    (sum/count division happens in double, identically in both engines).
    """
    c = _c(col)
    return F.round(F.sum(c.cast(_DEC)).cast("double") / F.count(c), 6)


# Oracle-side (DuckDB) templates matching dsum/davg. Usage:
#   SUM_D.format("l_extendedprice * (1 - l_discount)")
SUM_D = "cast(cast(sum(cast({0} as decimal(38,10))) as decimal(38,6)) as double)"
AVG_D = "round(cast(sum(cast({0} as decimal(38,10))) as double) / count({0}), 6)"
