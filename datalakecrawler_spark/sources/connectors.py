"""Lakehouse table-format connectors (Delta Lake / Iceberg / Hudi).

The v1 image ships no connector jars, so these are import-gated stubs:
``open_table`` resolves the right reader the moment the corresponding
package/jar is present, and fails with an actionable message until
then. The crawler (crawler.py) treats these formats as opaque
directories today; wiring them in is config, not code — the
DataFrame-level operators in this engine are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMAT_PROBES = {
    # format name → (python module probe, spark format string, extra conf)
    "delta": ("delta", "delta", "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"),
    "iceberg": ("pyiceberg", "iceberg", "spark.sql.catalog.* (Iceberg catalog)"),
    "hudi": ("hudi", "hudi", "spark.serializer=KryoSerializer"),
}


def available_formats() -> dict[str, bool]:
    """Which lakehouse formats are usable in this environment."""
    import importlib.util

    return {
        name: importlib.util.find_spec(probe[0]) is not None
        for name, probe in _FORMAT_PROBES.items()
    }


def open_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Open a lakehouse table of the given format, or raise with the
    exact missing dependency."""
    if fmt not in _FORMAT_PROBES:
        raise ValueError(f"unknown lakehouse format {fmt!r}; one of {list(_FORMAT_PROBES)}")
    module, spark_fmt, conf_hint = _FORMAT_PROBES[fmt]
    if not available_formats()[fmt]:
        raise NotImplementedError(
            f"{fmt} support requires the '{module}' package and its Spark jars "
            f"on the classpath (plus {conf_hint}); neither ships in this image. "
            "The engine's operators are format-agnostic — once the jar is "
            f"present, spark.read.format({spark_fmt!r}).load(path) is the only "
            "wiring needed."
        )
    return spark.read.format(spark_fmt).load(path)
