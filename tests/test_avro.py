"""Native Avro container codec tests (sources/avro.py): byte-level
spec conformance (magic, metadata map, sync markers, zigzag varints,
raw-deflate blocks) plus hypothesis round-trip properties over the
full supported type surface, plus the distributed Spark write→read
path. The registered ops (scan_avro_native / sink_avro_roundtrip) are
additionally oracle-checked by test_registry_parity like every other
query."""

from __future__ import annotations

import io
import struct
import zlib
from datetime import date, timedelta

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from datalakecrawler_spark.sources.avro import (
    AvroFileWriter,
    _Cursor,
    _wlong,
    avro_fields,
    decode_avro_blocks,
    read_avro,
    read_avro_header,
    write_avro,
)

_SCHEMA = T.StructType(
    [
        T.StructField("i64", T.LongType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("f64", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
_FIELDS = avro_fields(_SCHEMA)


def _roundtrip(pdf: pd.DataFrame, codec: str = "deflate") -> pd.DataFrame:
    buf = io.BytesIO()
    w = AvroFileWriter(buf, _FIELDS, codec, sync_seed="test")
    w.write_block(pdf)
    frames = list(decode_avro_blocks(buf.getvalue()))
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


# ---------------------------------------------------------------------------
# Spec conformance at byte level
# ---------------------------------------------------------------------------


def test_container_layout_matches_spec():
    """Magic, schema/codec metadata, 16-byte sync repeated per block,
    and raw RFC-1951 block bodies — checked against an independent
    parse, not via our own decoder."""
    pdf = pd.DataFrame({c: [v] for c, v in zip(
        [f.name for f in _SCHEMA.fields],
        [1, 2, 3.0, "x", True, date(2024, 1, 2), pd.Timestamp("2024-01-02")],
    )})
    buf = io.BytesIO()
    w = AvroFileWriter(buf, _FIELDS, "deflate", sync_seed="layout")
    w.write_block(pdf)
    raw = buf.getvalue()
    assert raw[:4] == b"Obj\x01"
    fields, codec, sync, pos = read_avro_header(raw)
    assert codec == "deflate" and len(sync) == 16
    assert [n for n, _ in fields] == [f.name for f in _SCHEMA.fields]
    # block: count, size, payload, sync — decode the varints by hand
    cur = _Cursor(raw, pos)
    assert cur.long() == 1  # row count
    size = cur.long()
    body = cur.fixed(size)
    assert cur.fixed(16) == sync
    zlib.decompress(body, wbits=-15)  # must be valid raw deflate
    assert cur.eof()


def test_zigzag_varint_extremes():
    for n in (0, -1, 1, 2**31 - 1, -(2**31), 2**62, -(2**62), 2**63 - 1, -(2**63)):
        out = bytearray()
        _wlong(out, n)
        assert _Cursor(bytes(out)).long() == n


def test_header_rejects_garbage():
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro_header(b"PAR1" + b"\x00" * 64)


def test_null_and_deflate_codecs_agree():
    pdf = pd.DataFrame({c: [v, None] for c, v in zip(
        [f.name for f in _SCHEMA.fields],
        [7, -8, 9.5, "héllo", False, date(1999, 12, 31), pd.Timestamp("1999-12-31 23:59:59.000001")],
    )})
    a = _roundtrip(pdf, "null")
    b = _roundtrip(pdf, "deflate")
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# Hypothesis round-trip over the full type surface
# ---------------------------------------------------------------------------

_ROW = st.tuples(
    st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
    st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=True, width=64)),
    st.one_of(st.none(), st.text(max_size=80)),
    st.one_of(st.none(), st.booleans()),
    st.one_of(st.none(), st.dates(date(1, 1, 1), date(9999, 12, 31))),
    st.one_of(
        st.none(),
        # pandas ns-timestamp range, micro precision (avro timestamp-micros)
        st.integers(-(2**52), 2**52).map(lambda us: pd.Timestamp(us * 1000)),
    ),
)


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(_ROW, min_size=0, max_size=25))
def test_roundtrip_property(rows):
    cols = list(zip(*rows)) if rows else [[]] * 7
    pdf = pd.DataFrame(
        {f.name: pd.Series(list(vals), dtype="object")
         for f, vals in zip(_SCHEMA.fields, cols)}
    )
    back = _roundtrip(pdf)
    if not rows:
        assert back.empty
        return
    assert len(back) == len(rows)
    for ri, row in enumerate(rows):
        for ci, (name, want) in enumerate(zip(pdf.columns, row)):
            got = back.iloc[ri, ci]
            if want is None:
                assert got is None or pd.isna(got)
            elif isinstance(want, pd.Timestamp):
                assert pd.Timestamp(got) == want
            elif isinstance(want, float):
                assert got == want or (got != got and want != want)
            elif isinstance(want, date):
                assert got == want
            else:
                assert got == want, (name, want, got)


# ---------------------------------------------------------------------------
# Distributed write → read on Spark
# ---------------------------------------------------------------------------


def test_spark_write_read_roundtrip(spark, tmp_path):
    """Partition-parallel write (one container per partition), then the
    binaryFile + block-decode scan — content equality with the source,
    including the timestamp column."""
    from pyspark.sql import functions as F

    from datalakecrawler_spark.io import load
    from tests.conftest import SF_DIR

    src = load(spark, SF_DIR, "orders").repartition(4)
    path = str(tmp_path / "orders_avro")
    manifest = write_avro(src, path, codec="deflate").collect()
    assert sum(r["n_rows"] for r in manifest) == src.count()
    assert 1 <= len(manifest) <= 4  # ≤ one file per partition

    back = read_avro(spark, path)
    assert back.schema == src.schema

    def key(df):
        return {
            (r["o_orderkey"], r["o_totalprice"], str(r["o_orderdate"]))
            for r in df.select("o_orderkey", "o_totalprice", "o_orderdate").collect()
        }

    assert key(back) == key(src)
    # open_table's native fallback serves the same frame when the
    # spark-avro jar is absent
    from datalakecrawler_spark.sources import connectors

    if not connectors.available_formats()["avro"]:
        via_connector = connectors.open_table(spark, "avro", path)
        assert via_connector.count() == src.count()


def test_unsupported_type_rejected():
    with pytest.raises(TypeError, match="unsupported Spark type"):
        avro_fields(T.StructType([T.StructField("a", T.ArrayType(T.LongType()))]))


# ---------------------------------------------------------------------------
# Generic datum codec: the full spec surface (nested records, arrays,
# maps, bytes, fixed, enums, unions)
# ---------------------------------------------------------------------------

_NESTED = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "scores", "type": {"type": "map", "values": "double"}},
        {
            "name": "meta",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "meta",
                    "fields": [
                        {"name": "kind", "type": {"type": "enum", "name": "k",
                                                  "symbols": ["A", "B", "C"]}},
                        {"name": "digest", "type": {"type": "fixed", "name": "d16",
                                                    "size": 4}},
                        {"name": "blob", "type": "bytes"},
                        {"name": "children", "type": {"type": "array",
                                                      "items": ["null", "long"]}},
                    ],
                },
            ],
        },
    ],
}


def _datum_roundtrip(rows, schema=_NESTED, codec="deflate"):
    from datalakecrawler_spark.sources.avro import (
        AvroDatumFileWriter,
        decode_avro_blocks,
    )

    buf = io.BytesIO()
    w = AvroDatumFileWriter(buf, schema, codec, sync_seed="nested")
    w.write_block(rows)
    out = []
    for frame in decode_avro_blocks(buf.getvalue()):
        out.extend(frame.to_dict("records"))
    return out


def test_nested_datum_roundtrip():
    rows = [
        {
            "id": 1,
            "tags": ["a", "β", ""],
            "scores": {"x": 1.5, "y": -2.0},
            "meta": {
                "kind": "B",
                "digest": b"\x01\x02\x03\x04",
                "blob": b"raw\x00bytes",
                "children": [1, None, -(2**40)],
            },
        },
        {"id": 2, "tags": [], "scores": {}, "meta": None},
    ]
    back = _datum_roundtrip(rows)
    assert back == rows


def test_union_rules():
    from datalakecrawler_spark.sources.avro import decode_datum, encode_datum
    from datalakecrawler_spark.sources.avro import _Cursor

    # decode side handles arbitrary unions (pick by index)
    tri = ["null", "long", "string"]
    buf = bytearray()
    from datalakecrawler_spark.sources.avro import _wlong, _wbytes

    _wlong(buf, 2)  # branch 2 = string
    _wbytes(buf, "hi".encode())
    assert decode_datum(_Cursor(bytes(buf)), tri) == "hi"
    # encode side: null-unions only, stated explicitly
    out = bytearray()
    with pytest.raises(TypeError, match="null-unions only"):
        encode_datum(out, 5, tri)


def test_bare_primitive_fields_take_generic_path():
    """A third-party writer may emit bare (non-union) primitive fields.
    The flat decoder consumes a ["null", X] branch index per field, so
    such schemas MUST route through the generic datum codec — a bare
    long decoded on the flat path would be misread as a union index."""
    from datalakecrawler_spark.sources.avro import (
        AvroDatumFileWriter,
        _is_flat_record,
    )

    bare = {
        "type": "record",
        "name": "bare",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    assert not _is_flat_record(bare)

    rows = [{"k": -3, "s": "x"}, {"k": 2**40, "s": ""}, {"k": 0, "s": "βγ"}]
    buf = io.BytesIO()
    w = AvroDatumFileWriter(buf, bare, "deflate", sync_seed="bare")
    w.write_block(rows)
    back = []
    for frame in decode_avro_blocks(buf.getvalue()):
        back.extend(frame.to_dict("records"))
    assert back == rows

    # The shape AvroFileWriter emits still takes the fast path, and a
    # null-last union does not.
    assert _is_flat_record(
        {"type": "record", "name": "r",
         "fields": [{"name": "k", "type": ["null", "long"]}]}
    )
    assert not _is_flat_record(
        {"type": "record", "name": "r",
         "fields": [{"name": "k", "type": ["long", "null"]}]}
    )


def test_avro_type_to_spark_nested():
    from datalakecrawler_spark.sources.avro import avro_type_to_spark

    t = avro_type_to_spark(_NESTED)
    assert isinstance(t, T.StructType)
    assert isinstance(t["tags"].dataType, T.ArrayType)
    assert isinstance(t["scores"].dataType, T.MapType)
    meta = t["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert isinstance(meta["kind"].dataType, T.StringType)  # enum → string
    assert isinstance(meta["digest"].dataType, T.BinaryType)  # fixed
    assert isinstance(meta["blob"].dataType, T.BinaryType)


# Avro strings are utf-8 by definition — lone surrogates (category Cs)
# are outside the format's domain, not a codec gap
_SCORE_KEYS = st.text(
    alphabet=st.characters(blacklist_characters="\x00",
                           blacklist_categories=("Cs",)),
    min_size=0, max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(-(2**63), 2**63 - 1),
                "tags": st.lists(st.text(max_size=12), max_size=6),
                "scores": st.dictionaries(
                    _SCORE_KEYS,
                    st.floats(allow_nan=False, width=64),
                    max_size=5,
                ),
                "meta": st.one_of(
                    st.none(),
                    st.fixed_dictionaries(
                        {
                            "kind": st.sampled_from(["A", "B", "C"]),
                            "digest": st.binary(min_size=4, max_size=4),
                            "blob": st.binary(max_size=64),
                            "children": st.lists(
                                st.one_of(st.none(),
                                          st.integers(-(2**63), 2**63 - 1)),
                                max_size=5,
                            ),
                        }
                    ),
                ),
            }
        ),
        max_size=12,
    )
)
def test_nested_roundtrip_property(rows):
    assert _datum_roundtrip(rows) == rows
