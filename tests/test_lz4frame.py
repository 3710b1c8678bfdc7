"""sources/lz4frame.py — pure-Python LZ4 frame decompression, used for
compressed Puffin footer payloads. Round-trips against pyarrow's LZ4
frame compressor (an independent implementation of the same public
format), plus strictness cases."""

from __future__ import annotations

import json
import os
import struct

import pytest

from datalakecrawler_spark.sources.lz4frame import lz4_frame_decompress

pa = pytest.importorskip("pyarrow")


def _lz4(data: bytes) -> bytes:
    return bytes(pa.Codec("lz4").compress(data))


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"abc" * 1000,  # highly compressible → match-heavy blocks
        bytes(range(256)) * 64,
        json.dumps({"blobs": [{"type": "deletion-vector-v1"}] * 50}).encode(),
        os.urandom(10000),  # incompressible → stored block path
        b"x" * 70000,  # spans a 64 KB block boundary
    ],
)
def test_roundtrip_against_pyarrow(data):
    assert lz4_frame_decompress(_lz4(data)) == data


def test_roundtrip_property(spark_noop=None):
    import random

    rnd = random.Random(8)
    for _ in range(50):
        n = rnd.randrange(0, 5000)
        # mix runs (compressible) and noise (stored/literal-heavy)
        data = b"".join(
            bytes([rnd.randrange(256)]) * rnd.randrange(1, 30)
            for _ in range(n // 10 + 1)
        )[:n]
        assert lz4_frame_decompress(_lz4(data)) == data


def test_bad_magic_refuses():
    with pytest.raises(ValueError, match="bad frame magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00" + b"x" * 20)


def test_truncated_refuses():
    good = _lz4(b"hello world" * 100)
    with pytest.raises(ValueError):
        lz4_frame_decompress(good[: len(good) // 2])


def test_content_size_field_verified():
    # hand-build a frame WITH the content-size field (pyarrow omits
    # it): magic, FLG(version1 + content-size + block-indep), BD,
    # size, HC, one stored block, EndMark
    payload = b"spec-compliant frame"
    frame = struct.pack("<I", 0x184D2204)
    frame += bytes([0x68, 0x40])  # FLG: v1|indep|content-size, BD: 64KB
    frame += struct.pack("<Q", len(payload))
    frame += b"\x00"  # HC (not verified)
    frame += struct.pack("<I", 0x80000000 | len(payload)) + payload
    frame += struct.pack("<I", 0)
    assert lz4_frame_decompress(frame) == payload
    # corrupt the declared content size → refuse
    bad = bytearray(frame)
    bad[6] ^= 0xFF
    with pytest.raises(ValueError, match="content size mismatch"):
        lz4_frame_decompress(bytes(bad))


# ---------------------------------------------- compressed Puffin footers


def _puffin_with_compressed_footer(tmp_path, blobs_meta):
    from datalakecrawler_spark.sources.iceberg_native import _PUFFIN_MAGIC

    payload = json.dumps({"blobs": blobs_meta, "properties": {}}).encode()
    comp = _lz4(payload)
    p = str(tmp_path / "compressed_footer.puffin")
    with open(p, "wb") as fh:
        fh.write(_PUFFIN_MAGIC)
        fh.write(b"blobbytes")
        fh.write(_PUFFIN_MAGIC)
        fh.write(comp)
        fh.write(struct.pack("<i", len(comp)))
        fh.write(b"\x01\x00\x00\x00")  # flags: footer payload compressed
        fh.write(_PUFFIN_MAGIC)
    return p


def test_read_puffin_compressed_footer(tmp_path):
    from datalakecrawler_spark.sources.iceberg_native import read_puffin_blobs

    meta = [
        {
            "type": "deletion-vector-v1",
            "fields": [],
            "offset": 4,
            "length": 9,
            "properties": {"referenced-data-file": "f.parquet"},
        }
    ]
    p = _puffin_with_compressed_footer(tmp_path, meta)
    assert read_puffin_blobs(p) == meta


def test_read_puffin_reserved_flags_refuse(tmp_path):
    from datalakecrawler_spark.sources.iceberg_native import (
        _PUFFIN_MAGIC,
        read_puffin_blobs,
    )

    payload = json.dumps({"blobs": [], "properties": {}}).encode()
    p = str(tmp_path / "reserved.puffin")
    with open(p, "wb") as fh:
        fh.write(_PUFFIN_MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(b"\x02\x00\x00\x00")  # reserved bit
        fh.write(_PUFFIN_MAGIC)
    with pytest.raises(ValueError, match="reserved footer flag"):
        read_puffin_blobs(p)
