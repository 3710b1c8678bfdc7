"""Native Apache Avro Object Container File support — pure Python,
built from the PUBLIC Avro 1.11 specification (container magic
``Obj\\x01``, metadata map, 16-byte sync marker, zigzag-varint
primitives, ``deflate`` codec = raw RFC-1951), no spark-avro jar.

VERDICT r1–r4 carried "Avro" under environment-gated lakehouse
formats because the spark-avro jar isn't shipped; the container format
itself needs nothing beyond stdlib (struct + zlib), so this module
closes that gap natively while ``connectors.open_table`` still prefers
the jar when present.

Distribution model (the part that must survive 100 TB):

- **Writer** — ``write_avro(df, path)`` is a ``mapInPandas`` sink: one
  container file per input partition (named by TaskContext partition
  id), one Avro block per Arrow batch, so peak memory is a single
  batch and the encoder streams. No data moves through the driver; the
  returned manifest (file, rows, blocks) is one row per partition.
- **Reader** — ``read_avro(spark, path)`` reads ONE file header on the
  driver (a few hundred bytes — schema discovery only, the same thing
  spark.read.parquet does with a footer), then fans the files out via
  the ``binaryFile`` source and decodes block-by-block inside
  ``mapInPandas``, yielding one pandas frame per Avro block so
  downstream Arrow batches stay block-sized. Parallelism = file count,
  which equals the writing job's partition count; a production reader
  for externally-written giant files would additionally split at sync
  markers (the format is splittable by design) — that refinement is a
  partitions() change in a Python DataSource, not a codec change.

Type surface: null-union of boolean/int/long/float/double/string plus
the date and timestamp-micros logical types — the full fixture schema
space. Nested records/arrays/maps are out of scope here (the engine's
canonical nested carrier is Parquet; see SURVEY §2.L nested-output
rule).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import zlib
from collections.abc import Iterator
from datetime import date, timedelta

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# Primitive codec (Avro spec §Binary encoding)
# ---------------------------------------------------------------------------


def _wlong(out: bytearray, n: int) -> None:
    """Zigzag + varint encode a signed long."""
    u = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _wbytes(out: bytearray, b: bytes) -> None:
    _wlong(out, len(b))
    out += b


class _Cursor:
    """Byte cursor for decoding."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf, self.pos = buf, pos

    def long(self) -> int:
        u, shift = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def fixed(self, n: int) -> bytes:
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def eof(self) -> bool:
        return self.pos >= len(self.buf)


# ---------------------------------------------------------------------------
# Schema mapping (Spark ↔ Avro)
# ---------------------------------------------------------------------------

# kind → avro schema fragment; every field is the null-union ["null", t]
_KIND_TO_AVRO: dict[str, object] = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "local-timestamp-micros"},
}

_SPARK_TO_KIND: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.IntegerType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.StringType, "string"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamp"),
    (T.TimestampNTZType, "timestamp_ntz"),
]

_KIND_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
}


def avro_fields(schema: T.StructType) -> list[tuple[str, str]]:
    """Spark schema → [(field_name, kind)]; rejects unsupported types."""
    fields = []
    for f in schema.fields:
        for spark_t, kind in _SPARK_TO_KIND:
            if isinstance(f.dataType, spark_t):
                fields.append((f.name, kind))
                break
        else:
            raise TypeError(
                f"avro codec: unsupported Spark type {f.dataType} for "
                f"column {f.name!r} (primitives + date/timestamp only)"
            )
    return fields


def _schema_json(fields: list[tuple[str, str]]) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": n, "type": ["null", _KIND_TO_AVRO[k]]}
                for n, k in fields
            ],
        }
    )


def _fields_from_avro_schema(schema_json: str) -> list[tuple[str, str]]:
    """Inverse of _schema_json for the schemas this module writes."""
    rec = json.loads(schema_json)
    out = []
    for f in rec["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", t]
            t = next(x for x in t if x != "null")
        if isinstance(t, dict):
            lt = t.get("logicalType", "")
            if lt == "date":
                kind = "date"
            elif lt.startswith("local-timestamp"):
                kind = "timestamp_ntz"
            elif lt.startswith("timestamp"):
                kind = "timestamp"
            else:
                kind = t["type"]
        else:
            kind = t
        out.append((f["name"], kind))
    return out


# ---------------------------------------------------------------------------
# Row codec
# ---------------------------------------------------------------------------

_EPOCH = date(1970, 1, 1)


def _encode_value(out: bytearray, v, kind: str) -> None:
    # pd.isna covers None/NaN/NaT/pd.NA; guard strings (isna is False
    # for them anyway, but skip the call on the hot string path)
    if v is None or (not isinstance(v, str) and pd.isna(v)):
        _wlong(out, 0)  # union branch 0 = null
        return
    _wlong(out, 1)  # union branch 1 = value
    if kind in ("long", "int"):
        _wlong(out, int(v))
    elif kind == "double":
        out += struct.pack("<d", float(v))
    elif kind == "float":
        out += struct.pack("<f", float(v))
    elif kind == "string":
        _wbytes(out, str(v).encode("utf-8"))
    elif kind == "boolean":
        out.append(1 if v else 0)
    elif kind == "date":
        if isinstance(v, pd.Timestamp):
            v = v.date()
        _wlong(out, (v - _EPOCH).days)
    elif kind in ("timestamp", "timestamp_ntz"):
        _wlong(out, pd.Timestamp(v).value // 1000)  # ns → micros
    else:  # pragma: no cover - avro_fields rejects these upfront
        raise TypeError(f"unsupported kind {kind}")


def _decode_value(cur: _Cursor, kind: str):
    if cur.long() == 0:
        return None
    if kind in ("long", "int"):
        return cur.long()
    if kind == "double":
        return struct.unpack("<d", cur.fixed(8))[0]
    if kind == "float":
        return struct.unpack("<f", cur.fixed(4))[0]
    if kind == "string":
        return cur.bytes_().decode("utf-8")
    if kind == "boolean":
        return cur.fixed(1) == b"\x01"
    if kind == "date":
        return _EPOCH + timedelta(days=cur.long())
    if kind in ("timestamp", "timestamp_ntz"):
        return pd.Timestamp(cur.long() * 1000)  # micros → ns
    raise TypeError(f"unsupported kind {kind}")  # pragma: no cover


# ---------------------------------------------------------------------------
# Generic datum codec — the FULL spec type surface (records, arrays,
# maps, bytes, fixed, enums, null-unions), recursive. The flat
# kind-based codec above stays as the fast path for tabular schemas;
# this layer is what lets the reader consume arbitrary Avro written by
# other systems (nested event payloads, Iceberg-style manifests, …).
# ---------------------------------------------------------------------------


def _logical_kind(sch: dict) -> str | None:
    lt = sch.get("logicalType", "")
    if lt == "date":
        return "date"
    if lt.startswith("local-timestamp"):
        return "timestamp_ntz"
    if lt.startswith("timestamp"):
        return "timestamp"
    return None


def encode_datum(out: bytearray, v, sch) -> None:
    """Encode one value against a parsed Avro schema (str | dict | list)."""
    if isinstance(sch, list):  # union
        if v is None:
            if "null" in sch:
                _wlong(out, sch.index("null"))
                return
            raise TypeError("None for a union without a null branch")
        branches = [(i, b) for i, b in enumerate(sch) if b != "null"]
        if len(branches) != 1:
            raise TypeError(
                "encode supports null-unions only (write the value "
                "branch explicitly for multi-type unions)"
            )
        i, b = branches[0]
        _wlong(out, i)
        encode_datum(out, v, b)
        return
    if isinstance(sch, dict):
        lk = _logical_kind(sch)
        if lk is not None:
            _encode_value_nonnull(out, v, lk)
            return
        t = sch["type"]
        if t == "record":
            for f in sch["fields"]:
                encode_datum(out, v[f["name"]], f["type"])
            return
        if t == "array":
            items = list(v)
            if items:
                _wlong(out, len(items))
                for item in items:
                    encode_datum(out, item, sch["items"])
            _wlong(out, 0)
            return
        if t == "map":
            kv = dict(v)
            if kv:
                _wlong(out, len(kv))
                for k in sorted(kv):  # deterministic bytes across reruns
                    _wbytes(out, str(k).encode("utf-8"))
                    encode_datum(out, kv[k], sch["values"])
            _wlong(out, 0)
            return
        if t == "fixed":
            if len(v) != sch["size"]:
                raise ValueError(f"fixed size {sch['size']} != {len(v)}")
            out += bytes(v)
            return
        if t == "enum":
            _wlong(out, sch["symbols"].index(v))
            return
        sch = t  # e.g. {"type": "string"} wrapper
    if sch == "null":
        if v is not None:
            raise TypeError("non-None for null type")
        return
    if sch == "bytes":
        _wbytes(out, bytes(v))
        return
    _encode_value_nonnull(out, v, sch)


def _encode_value_nonnull(out: bytearray, v, kind: str) -> None:
    """Primitive encode without the union prefix (generic path):
    _encode_value writes the one-byte union index (zigzag(1) = 0x02)
    first — reuse it and strip that byte."""
    if v is None or (not isinstance(v, str) and pd.isna(v)):
        raise TypeError(f"None for non-union primitive {kind!r}")
    tmp = bytearray()
    _encode_value(tmp, v, kind)
    out += tmp[1:]


def decode_datum(cur: _Cursor, sch):
    """Decode one value against a parsed Avro schema."""
    if isinstance(sch, list):  # union: index then branch
        branch = sch[cur.long()]
        return None if branch == "null" else decode_datum(cur, branch)
    if isinstance(sch, dict):
        lk = _logical_kind(sch)
        if lk is not None:
            return _decode_value_nonnull(cur, lk)
        t = sch["type"]
        if t == "record":
            return {f["name"]: decode_datum(cur, f["type"]) for f in sch["fields"]}
        if t == "array":
            out = []
            while True:
                n = cur.long()
                if n == 0:
                    break
                if n < 0:
                    cur.long()  # block byte size (skippable form)
                    n = -n
                for _ in range(n):
                    out.append(decode_datum(cur, sch["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = cur.long()
                if n == 0:
                    break
                if n < 0:
                    cur.long()
                    n = -n
                for _ in range(n):
                    k = cur.bytes_().decode("utf-8")
                    out[k] = decode_datum(cur, sch["values"])
            return out
        if t == "fixed":
            return cur.fixed(sch["size"])
        if t == "enum":
            return sch["symbols"][cur.long()]
        sch = t
    if sch == "null":
        return None
    if sch == "bytes":
        return cur.bytes_()
    return _decode_value_nonnull(cur, sch)


def _decode_value_nonnull(cur: _Cursor, kind: str):
    if kind in ("long", "int"):
        return cur.long()
    if kind == "double":
        return struct.unpack("<d", cur.fixed(8))[0]
    if kind == "float":
        return struct.unpack("<f", cur.fixed(4))[0]
    if kind == "string":
        return cur.bytes_().decode("utf-8")
    if kind == "boolean":
        return cur.fixed(1) == b"\x01"
    if kind == "date":
        return _EPOCH + timedelta(days=cur.long())
    if kind in ("timestamp", "timestamp_ntz"):
        return pd.Timestamp(cur.long() * 1000)
    raise TypeError(f"unsupported primitive {kind}")


def avro_type_to_spark(sch) -> T.DataType:
    """Recursive Avro → Spark type mapping (null-unions collapse to the
    nullable inner type; enums read as strings; bytes/fixed as binary)."""
    if isinstance(sch, list):
        branches = [b for b in sch if b != "null"]
        if len(branches) != 1:
            raise TypeError("multi-type unions have no Spark column type")
        return avro_type_to_spark(branches[0])
    if isinstance(sch, dict):
        lk = _logical_kind(sch)
        if lk is not None:
            return _KIND_TO_SPARK[lk]
        t = sch["type"]
        if t == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], avro_type_to_spark(f["type"]), True)
                    for f in sch["fields"]
                ]
            )
        if t == "array":
            return T.ArrayType(avro_type_to_spark(sch["items"]), True)
        if t == "map":
            return T.MapType(T.StringType(), avro_type_to_spark(sch["values"]), True)
        if t in ("fixed",):
            return T.BinaryType()
        if t == "enum":
            return T.StringType()
        sch = t
    if sch == "bytes":
        return T.BinaryType()
    if sch == "null":
        return T.NullType()
    return _KIND_TO_SPARK[sch]


def _is_flat_record(rec: dict) -> bool:
    """True only for the exact tabular shape AvroFileWriter emits:
    every field a ["null", primitive-or-logical] union. The flat
    decoder reads a union index per field, so bare (non-union)
    primitives must route through the generic datum codec."""
    for f in rec.get("fields", []):
        t = f["type"]
        if not (isinstance(t, list) and len(t) == 2 and t[0] == "null"):
            return False
        inner = t[1]
        if isinstance(inner, dict):
            if _logical_kind(inner) is None:
                return False
        elif inner not in ("boolean", "int", "long", "float", "double", "string"):
            return False
    return True


class AvroDatumFileWriter:
    """Container writer over the generic datum codec: rows are Python
    mappings matching an arbitrary record schema (nested records,
    arrays, maps, …). Same streaming block discipline as
    AvroFileWriter."""

    def __init__(self, fh, schema: dict, codec: str = "deflate",
                 sync_seed: str = "") -> None:
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported avro codec {codec!r}")
        if schema.get("type") != "record":
            raise TypeError("top-level Avro schema must be a record")
        self.fh, self.schema, self.codec = fh, schema, codec
        self.sync = hashlib.md5(f"dlc-avro:{sync_seed}".encode()).digest()
        self.n_rows = self.n_blocks = 0
        out = bytearray(_MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        _wlong(out, len(meta))
        for k, v in sorted(meta.items()):
            _wbytes(out, k.encode())
            _wbytes(out, v)
        _wlong(out, 0)
        out += self.sync
        fh.write(bytes(out))

    def write_block(self, rows: list) -> None:
        if not rows:
            return
        buf = bytearray()
        for row in rows:
            for f in self.schema["fields"]:
                encode_datum(buf, row[f["name"]], f["type"])
        data = (
            zlib.compress(bytes(buf), 6)[2:-4]
            if self.codec == "deflate"
            else bytes(buf)
        )
        head = bytearray()
        _wlong(head, len(rows))
        _wlong(head, len(data))
        self.fh.write(bytes(head) + data + self.sync)
        self.n_rows += len(rows)
        self.n_blocks += 1


# ---------------------------------------------------------------------------
# Container file codec
# ---------------------------------------------------------------------------


class AvroFileWriter:
    """Streaming Object Container File writer: header once, then one
    block per ``write_block`` call (the mapInPandas sink calls it once
    per Arrow batch — peak memory is one encoded block)."""

    def __init__(self, fh, fields: list[tuple[str, str]],
                 codec: str = "deflate", sync_seed: str = "") -> None:
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported avro codec {codec!r}")
        self.fh, self.fields, self.codec = fh, fields, codec
        # spec: sync is 16 arbitrary bytes; derive deterministically so
        # reruns produce byte-identical files
        self.sync = hashlib.md5(f"dlc-avro:{sync_seed}".encode()).digest()
        self.n_rows = self.n_blocks = 0
        self._write_header()

    def _write_header(self) -> None:
        out = bytearray(_MAGIC)
        meta = {
            "avro.schema": _schema_json(self.fields).encode(),
            "avro.codec": self.codec.encode(),
        }
        _wlong(out, len(meta))
        for k, v in sorted(meta.items()):
            _wbytes(out, k.encode())
            _wbytes(out, v)
        _wlong(out, 0)  # end of map
        out += self.sync
        self.fh.write(bytes(out))

    def write_block(self, pdf: pd.DataFrame) -> None:
        if len(pdf) == 0:
            return
        buf = bytearray()
        cols = [pdf[n].tolist() for n, _ in self.fields]
        kinds = [k for _, k in self.fields]
        for row in zip(*cols):
            for v, kind in zip(row, kinds):
                _encode_value(buf, v, kind)
        data = (
            zlib.compress(bytes(buf), 6)[2:-4]  # raw RFC-1951: strip zlib wrap
            if self.codec == "deflate"
            else bytes(buf)
        )
        head = bytearray()
        _wlong(head, len(pdf))
        _wlong(head, len(data))
        self.fh.write(bytes(head) + data + self.sync)
        self.n_rows += len(pdf)
        self.n_blocks += 1


def read_container_header(buf: bytes):
    """Parse magic + metadata map. Returns (schema_dict, codec, sync, pos)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    cur = _Cursor(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = cur.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            cur.long()
            n = -n
        for _ in range(n):
            k = cur.bytes_().decode()
            meta[k] = cur.bytes_()
    sync = cur.fixed(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, cur.pos


def read_avro_header(buf: bytes):
    """Tabular view of the header: (flat fields, codec, sync, pos)."""
    schema, codec, sync, pos = read_container_header(buf)
    fields = _fields_from_avro_schema(json.dumps(schema))
    return fields, codec, sync, pos


def decode_avro_blocks(buf: bytes) -> Iterator[pd.DataFrame]:
    """Decode a whole container file, yielding one frame per block.
    Flat tabular schemas take the kind-columnar fast path; anything
    nested routes through the generic recursive datum codec."""
    schema, codec, sync, pos = read_container_header(buf)
    flat = _is_flat_record(schema)
    fields = (
        _fields_from_avro_schema(json.dumps(schema))
        if flat
        else [(f["name"], f["type"]) for f in schema["fields"]]
    )
    cur = _Cursor(buf, pos)
    while not cur.eof():
        n_rows = cur.long()
        data = cur.bytes_()
        if cur.fixed(16) != sync:
            raise ValueError("avro block sync marker mismatch")
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bcur = _Cursor(data)
        cols: list[list] = [[] for _ in fields]
        if flat:
            for _ in range(n_rows):
                for ci, (_, kind) in enumerate(fields):
                    cols[ci].append(_decode_value(bcur, kind))
        else:
            for _ in range(n_rows):
                for ci, (_, ftype) in enumerate(fields):
                    cols[ci].append(decode_datum(bcur, ftype))
            yield pd.DataFrame(
                {n: pd.Series(vals, dtype="object")
                 for (n, _), vals in zip(fields, cols)}
            )
            continue
        yield _as_pandas(fields, cols)


_PANDAS_DTYPE = {
    "long": "Int64",
    "int": "Int32",
    "double": "float64",
    "float": "float32",
    "boolean": "boolean",
}


def _as_pandas(fields: list[tuple[str, str]], cols: list[list]) -> pd.DataFrame:
    out = {}
    for (name, kind), vals in zip(fields, cols):
        if kind in ("timestamp", "timestamp_ntz"):
            out[name] = pd.Series(pd.to_datetime(vals), dtype="datetime64[ns]")
        elif kind in _PANDAS_DTYPE:
            out[name] = pd.Series(vals, dtype=_PANDAS_DTYPE[kind])
        else:  # string / date stay object
            out[name] = pd.Series(vals, dtype="object")
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Spark-level distributed writer / reader
# ---------------------------------------------------------------------------


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> DataFrame:
    """Distributed Avro sink: one container file per input partition,
    one block per Arrow batch. Returns the (lazy) one-row-per-file
    manifest; the caller's action on it drives the write, exactly like
    ``df.write`` actions drive built-in sinks."""
    fields = avro_fields(df.schema)
    os.makedirs(path, exist_ok=True)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        # Task-attempt isolation: a speculative or retried attempt for
        # the same partition must never interleave writes with the
        # first attempt's file handle — stage under an attempt-unique
        # temp name, then os.replace (atomic, last-complete-attempt
        # wins) into the final name. The sync marker stays seeded by
        # the FINAL name so output bytes are attempt-independent.
        tmp = f"{fname}.attempt-{ctx.taskAttemptId()}.tmp"
        writer = None
        fh = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if writer is None:
                fh = open(tmp, "wb")
                writer = AvroFileWriter(fh, fields, codec, sync_seed=fname)
            writer.write_block(pdf)
        if writer is None:
            return  # empty partition: no file
        fh.close()
        os.replace(tmp, fname)
        yield pd.DataFrame(
            {"file": [os.path.basename(fname)],
             "n_rows": [writer.n_rows], "n_blocks": [writer.n_blocks]}
        )

    return df.mapInPandas(
        write_partition, schema="file string, n_rows long, n_blocks long"
    )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro scan: driver reads ONE header for schema
    discovery (bytes, not data), then binaryFile fans the container
    files across executors and mapInPandas decodes block-by-block."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(65536)  # schema map is at the front, tiny
    schema, _codec, _sync, _pos = read_container_header(head)
    spark_schema = avro_type_to_spark(schema)  # nested records included

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                yield from decode_avro_blocks(bytes(content))

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )
    return bf.mapInPandas(decode, spark_schema)


def _clean_avro_dir(path: str) -> None:
    """Overwrite semantics for the native sink: drop prior container
    files so a rerun with fewer partitions leaves no stale parts."""
    import glob as _glob

    os.makedirs(path, exist_ok=True)
    for f in _glob.glob(os.path.join(path, "*.avro")):
        os.remove(f)


# ---------------------------------------------------------------------------
# Registered operators (group A extensions)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from datalakecrawler_spark.io import load  # noqa: E402
from datalakecrawler_spark.registry import SUM_D, dsum, register  # noqa: E402
from datalakecrawler_spark.sources.scans import _tmp  # noqa: E402


@register(
    "scan_avro_native",
    group="A",
    oracle="select n_nationkey, n_name, n_regionkey from nation",
)
def scan_avro_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: Avro container scan with the native pure-Python codec —
    nation is written through the distributed mapInPandas sink (one
    container per partition, deflate blocks), then read back through
    binaryFile + block decode. The oracle checks full CONTENT equality
    against the source table, so header/map/sync/zigzag/deflate are all
    on the verified path. Closes the VERDICT 'missing: Avro' row from
    public spec + stdlib; spark-avro (when its jar exists) remains the
    preferred plan via connectors.open_table."""
    path = _tmp("nation_avro")
    _clean_avro_dir(path)
    src = load(spark, sf_dir, "nation")
    manifest = write_avro(src, path, codec="deflate").collect()
    n_written = sum(r["n_rows"] for r in manifest)
    n_src = src.count()
    assert n_written == n_src, f"avro write lost rows: {n_written} != {n_src}"
    return read_avro(spark, path).select("n_nationkey", "n_name", "n_regionkey")


_NESTED_ORDERS_SCHEMA = {
    "type": "record",
    "name": "customer_orders",
    "fields": [
        {"name": "o_custkey", "type": ["null", "long"]},
        {
            "name": "orders",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "order",
                    "fields": [
                        {"name": "o_orderkey", "type": "long"},
                        {"name": "o_totalprice", "type": "double"},
                    ],
                },
            },
        },
        {"name": "status_counts", "type": {"type": "map", "values": "long"}},
    ],
}


@register(
    "scan_avro_nested_flatten",
    group="A",
    oracle=f"""
    select o_custkey, count(*) as n_orders,
           {SUM_D.format('o_totalprice')} as sum_price,
           count(distinct o_orderstatus) as n_statuses
    from orders group by o_custkey
    """,
)
def scan_avro_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: NESTED Avro end-to-end — per-customer records holding an
    array<record> of orders and a map<string,long> of status counts are
    encoded with the generic datum codec (executor-side, one container
    per partition), read back through the nested schema mapping
    (array→ArrayType, record→StructType, map→MapType), and flattened
    JVM-side: the order-array total uses a higher-order F.aggregate in
    dsum's exact micro-unit convention (no explode, no extra shuffle —
    the data is already grouped per customer), map cardinality via
    map_keys. The oracle recomputes everything from the flat source, so
    array element values, map keys, and union-null handling are all on
    the hashed path."""
    from collections import Counter

    path = _tmp("orders_avro_nested")
    _clean_avro_dir(path)
    src = load(spark, sf_dir, "orders")
    nested = src.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(F.struct("o_orderkey", "o_totalprice"))
        ).alias("orders"),
        F.collect_list("o_orderstatus").alias("statuses"),
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        writer = fh = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if writer is None:
                fh = open(fname, "wb")
                writer = AvroDatumFileWriter(
                    fh, _NESTED_ORDERS_SCHEMA, "deflate", sync_seed=fname
                )
            rows = [
                {
                    "o_custkey": int(cust),
                    "orders": [
                        {
                            "o_orderkey": int(o["o_orderkey"]),
                            "o_totalprice": float(o["o_totalprice"]),
                        }
                        for o in orders
                    ],
                    "status_counts": {
                        k: int(v) for k, v in Counter(statuses).items()
                    },
                }
                for cust, orders, statuses in zip(
                    pdf["o_custkey"], pdf["orders"], pdf["statuses"]
                )
            ]
            writer.write_block(rows)
        if writer is None:
            return
        fh.close()
        yield pd.DataFrame({"file": [os.path.basename(fname)],
                            "n_rows": [writer.n_rows]})

    nested.mapInPandas(write_partition, "file string, n_rows long").collect()

    back = read_avro(spark, path)
    micro = F.aggregate(
        "orders",
        F.lit(0).cast("bigint"),
        lambda acc, o: acc + F.floor(o["o_totalprice"] * 1e6 + 0.5),
    )
    return back.select(
        "o_custkey",
        F.size("orders").cast("bigint").alias("n_orders"),
        (micro.cast("double") / 1e6).alias("sum_price"),
        F.size(F.map_keys("status_counts")).cast("bigint").alias("n_statuses"),
    )


@register(
    "sink_avro_roundtrip",
    group="A",
    oracle=f"""
    select o_orderpriority, count(*) as cnt,
           min(o_orderdate) as first_order, max(o_orderdate) as last_order,
           {SUM_D.format('o_totalprice')} as sum_price
    from orders where o_orderstatus = 'F'
    group by o_orderpriority
    """,
)
def sink_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ext: fact-sized Avro round trip — filtered orders (with a
    timestamp column exercising the timestamp-micros logical type) are
    written with the deflate codec and aggregated from the READ-BACK
    frame; the oracle aggregates the source directly, so any codec
    corruption (value, null-union, timestamp precision) breaks the
    hash. Writer parallelism = input partitions; reader parallelism =
    file count; neither path moves rows through the driver."""
    path = _tmp("orders_avro")
    _clean_avro_dir(path)
    src = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    write_avro(src, path, codec="deflate").collect()
    back = read_avro(spark, path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        dsum("o_totalprice").alias("sum_price"),
    )
