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
    # Avro is Spark-bundled but an EXTERNAL module since 2.4: the
    # spark-avro jar must be on the classpath (--packages
    # org.apache.spark:spark-avro_2.13:<spark version>). No Python
    # module exists, so the probe looks for the jar itself.
    "avro": (None, "avro", "--packages org.apache.spark:spark-avro_2.13"),
}


def _jar_present(stem: str) -> bool:
    import glob
    import os

    spark_home = os.environ.get("SPARK_HOME")
    if not spark_home:
        try:
            import pyspark

            spark_home = os.path.dirname(pyspark.__file__)
        except Exception:
            return False
    return bool(glob.glob(os.path.join(spark_home, "jars", f"{stem}*.jar")))


def available_formats() -> dict[str, bool]:
    """Which gated formats are usable in this environment."""
    import importlib.util

    out = {}
    for name, (module, _fmt, _hint) in _FORMAT_PROBES.items():
        if module is None:
            out[name] = _jar_present(f"spark-{name}")
        else:
            out[name] = importlib.util.find_spec(module) is not None
    return out


def open_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Open a lakehouse table of the given format, or raise with the
    exact missing dependency. Three formats no longer dead-end when
    their jars are absent — native pure-Python implementations of the
    PUBLIC specs serve the read path (the jars, when present, stay
    preferred for their JVM-side integration):

    - avro    → sources/avro.py (container codec, full type surface)
    - delta   → sources/delta_native.py (JSON log replay, reader v1)
    - iceberg → sources/iceberg_native.py (v1 metadata + Avro manifests)
    - hudi    → sources/hudi_native.py (CoW timeline walk, latest file
      slice per group; MERGE_ON_READ tables still raise there)"""
    if fmt not in _FORMAT_PROBES:
        raise ValueError(f"unknown lakehouse format {fmt!r}; one of {list(_FORMAT_PROBES)}")
    module, spark_fmt, conf_hint = _FORMAT_PROBES[fmt]
    if not available_formats()[fmt]:
        if fmt == "avro":
            from datalakecrawler_spark.sources.avro import read_avro

            return read_avro(spark, path)
        if fmt == "delta":
            from datalakecrawler_spark.sources.delta_native import read_delta

            return read_delta(spark, path)
        if fmt == "iceberg":
            from datalakecrawler_spark.sources.iceberg_native import read_iceberg

            return read_iceberg(spark, path)
        if fmt == "hudi":
            from datalakecrawler_spark.sources.hudi_native import read_hudi

            return read_hudi(spark, path)
        dep = (
            f"the '{module}' package and its Spark jars"
            if module
            else f"the spark-{fmt} jar"
        )
        raise NotImplementedError(
            f"{fmt} support requires {dep} on the classpath "
            f"(plus {conf_hint}); not shipped in this image. "
            "The engine's operators are format-agnostic — once the jar is "
            f"present, spark.read.format({spark_fmt!r}).load(path) is the only "
            "wiring needed."
        )
    return spark.read.format(spark_fmt).load(path)


# ---------------------------------------------------------------------------
# Custom Python Data Source (Spark 4 API): the crawler's file-inventory
# source. `spark.read.format("lakefiles").option("path", root)` turns a
# lake directory into a DataFrame of file rows, listed in parallel —
# one input partition per top-level entry, so a million-object prefix
# fans out across executors instead of serializing through the driver
# (the Python DataSource's partitions()/read() contract is exactly the
# list-shard protocol an object-store crawler needs).
# ---------------------------------------------------------------------------

try:  # Spark ≥ 4 only; import-gated like the lakehouse formats above
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class LakeFilesDataSource(DataSource):
        """Batch data source: rows = files under option 'path'."""

        @classmethod
        def name(cls) -> str:
            return "lakefiles"

        def schema(self) -> str:
            return (
                "dir string, file_name string, ext string, size_bytes bigint"
            )

        def reader(self, schema):  # noqa: ANN001 - API signature
            return _LakeFilesReader(self.options)

    class _LakeFilesReader(DataSourceReader):
        def __init__(self, options) -> None:  # noqa: ANN001
            self.root = options.get("path")
            if not self.root:
                raise ValueError("lakefiles source requires option 'path'")

        def partitions(self):
            import os

            entries = sorted(os.listdir(self.root))
            return [InputPartition(e) for e in entries] or [
                InputPartition(None)
            ]

        def read(self, partition):  # noqa: ANN001
            import os

            if partition.value is None:
                return
            top = os.path.join(self.root, partition.value)
            if os.path.isfile(top):
                yield self._row(self.root, partition.value)
                return
            for dirpath, _dirs, files in os.walk(top):
                for f in sorted(files):
                    yield self._row(dirpath, f)

        @staticmethod
        def _row(dirpath: str, fname: str):
            import os

            full = os.path.join(dirpath, fname)
            ext = fname.rsplit(".", 1)[-1].lower() if "." in fname else ""
            return (dirpath, fname, ext, os.path.getsize(full))

    HAVE_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover - older Spark
    HAVE_PYTHON_DATASOURCE = False


def register_lakefiles(spark: SparkSession) -> bool:
    """Register the custom source once per session; True if available."""
    if not HAVE_PYTHON_DATASOURCE:
        return False
    key = "dlc.lakefiles.registered"
    if spark.conf.get(key, None) != "1":
        spark.dataSource.register(LakeFilesDataSource)
        spark.conf.set(key, "1")
    return True


# ---------------------------------------------------------------------------
# Streaming Python Data Source: deterministic event REPLAY. The events
# parquet replays through Structured Streaming in fixed-size offset
# ranges — the standard backfill/reprocessing source shape: offsets are
# row indices (exactly-once across restarts comes free from the offset
# log), each micro-batch's range splits into fixed slices so the read
# fans out across executors, and every slice is served by a pyarrow
# row-range read of the same file (no driver materialization).
# ---------------------------------------------------------------------------

if HAVE_PYTHON_DATASOURCE:
    from pyspark.sql.datasource import DataSourceStreamReader

    class EventReplayDataSource(DataSource):
        """Streaming source: replay option 'path' parquet by row ranges."""

        @classmethod
        def name(cls) -> str:
            return "eventreplay"

        def schema(self) -> str:
            return (
                "event_id bigint, user_id bigint, event_type string, "
                "value double"
            )

        def streamReader(self, schema):  # noqa: ANN001 - API signature
            return _EventReplayStreamReader(self.options)

    class _ReplaySlice(InputPartition):
        def __init__(self, path: str, start: int, end: int) -> None:
            self.path = path
            self.start = start
            self.end = end

    class _EventReplayStreamReader(DataSourceStreamReader):
        BATCH_ROWS = 2500
        SLICES = 4

        def __init__(self, options) -> None:  # noqa: ANN001
            self.path = options.get("path")
            if not self.path:
                raise ValueError("eventreplay source requires option 'path'")
            import pyarrow.parquet as pq

            self.n_rows = pq.ParquetFile(self.path).metadata.num_rows

        def initialOffset(self):
            return {"row": 0}

        def latestOffset(self):
            # advance one batch per trigger until the file is replayed
            if not hasattr(self, "_cur"):
                self._cur = 0
            self._cur = min(self._cur + self.BATCH_ROWS, self.n_rows)
            return {"row": self._cur}

        def partitions(self, start, end):  # noqa: ANN001
            lo, hi = start["row"], end["row"]
            step = max(1, (hi - lo + self.SLICES - 1) // self.SLICES)
            return [
                _ReplaySlice(self.path, s, min(s + step, hi))
                for s in range(lo, hi, step)
            ]

        def read(self, partition):  # noqa: ANN001
            import pyarrow.parquet as pq

            t = pq.read_table(
                partition.path,
                columns=["event_id", "user_id", "event_type", "value"],
            ).slice(partition.start, partition.end - partition.start)
            for batch in t.to_batches():
                yield from zip(
                    batch.column(0).to_pylist(),
                    batch.column(1).to_pylist(),
                    batch.column(2).to_pylist(),
                    batch.column(3).to_pylist(),
                )

        def commit(self, end) -> None:  # noqa: ANN001
            pass


def register_eventreplay(spark: SparkSession) -> bool:
    """Register the streaming replay source once; True if available."""
    if not HAVE_PYTHON_DATASOURCE:
        return False
    key = "dlc.eventreplay.registered"
    if spark.conf.get(key, None) != "1":
        spark.dataSource.register(EventReplayDataSource)
        spark.conf.set(key, "1")
    return True
