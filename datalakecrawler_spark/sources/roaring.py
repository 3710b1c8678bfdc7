"""Roaring bitmap serialization for Delta Lake and Iceberg deletion
vectors.

Implements the three PUBLIC wire formats the lakehouse DV paths need,
from their specs alone:

- the standard 32-bit RoaringBitmap *portable* serialization
  (github.com/RoaringBitmap/RoaringFormatSpec): little-endian, a
  cookie word (12346 = no run containers / 12347 = with), a
  descriptive header of (key, cardinality-1) uint16 pairs, an
  optional offsets header, then array (sorted uint16s), bitset
  (1024 x uint64), or run (count + (start, len-1) pairs) containers;
- Delta's *RoaringBitmapArray* framing over it (delta-io PROTOCOL.md,
  "Deletion Vector Format"): magic 1681511377 (int32 LE), a count of
  32-bit bitmaps (int64 LE), then each bitmap's portable bytes —
  bitmap i covers row indexes [i * 2^32, (i+1) * 2^32);
- the RoaringFormatSpec *portable 64-bit* framing (the format the
  Iceberg v3 spec names for deletion-vector-v1 blobs): a count of
  (key, bitmap) pairs (int64 LE), then per pair a 4-byte LE high-32
  key followed by that key's portable 32-bit bitmap — SPARSE in the
  high words, unlike Delta's dense array.

The writer emits array/bitset containers under the 12346 cookie (the
always-offsets layout every reader accepts); the reader handles both
cookies and all three container types, so sidecars written by Spark's
own DV writer (which may run-compress) decode too.

Pure driver/executor-side Python over ``bytes`` — no external
dependency; positions are plain sorted ``int`` row indexes, which is
exactly the currency of ``_metadata.row_index`` anti joins.
"""

from __future__ import annotations

import struct

_ARRAY_MAGIC = 1681511377  # Delta RoaringBitmapArray magic number
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # containers; below this, 12347 omits offsets
_ARRAY_MAX_CARD = 4096  # standard array->bitset switch point


# ---------------------------------------------------------------------------
# 32-bit RoaringBitmap, portable format
# ---------------------------------------------------------------------------

def _serialize_rb32(values: list[int]) -> bytes:
    """Portable bytes for one 32-bit bitmap; ``values`` sorted unique
    ints in [0, 2^32)."""
    # bucket by high 16 bits, preserving order
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        key, low = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == key:
            containers[-1][1].append(low)
        else:
            containers.append((key, [low]))
    n = len(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    for key, lows in containers:
        out += struct.pack("<HH", key, len(lows) - 1)
    # offsets header (always present under cookie 12346): byte offset
    # of each container from the START of the bitmap's serialization
    header_len = 8 + 4 * n + 4 * n
    offsets: list[int] = []
    pos = header_len
    bodies: list[bytes] = []
    for key, lows in containers:
        offsets.append(pos)
        if len(lows) <= _ARRAY_MAX_CARD:
            body = struct.pack(f"<{len(lows)}H", *lows)
        else:
            words = [0] * 1024
            for lo in lows:
                words[lo >> 6] |= 1 << (lo & 63)
            body = struct.pack("<1024Q", *words)
        bodies.append(body)
        pos += len(body)
    out += struct.pack(f"<{n}i", *offsets)
    for body in bodies:
        out += body
    return bytes(out)


def _deserialize_rb32(buf: bytes, base: int) -> tuple[list[int], int]:
    """Decode one portable 32-bit bitmap starting at ``base``; returns
    (sorted values, bytes consumed)."""
    (cookie,) = struct.unpack_from("<i", buf, base)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        has_run = True
        p = base + 4
        run_bits = buf[p : p + (n + 7) // 8]
        p += (n + 7) // 8
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, base + 4)
        has_run = False
        run_bits = b""
        p = base + 8
    else:
        raise ValueError(f"not a portable RoaringBitmap (cookie={cookie})")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(n):
        key, cm1 = struct.unpack_from("<HH", buf, p + 4 * i)
        keys.append(key)
        cards.append(cm1 + 1)
    p += 4 * n
    if not has_run or n >= _NO_OFFSET_THRESHOLD:
        p += 4 * n  # offsets header — we read sequentially instead
    values: list[int] = []
    for i in range(n):
        hi = keys[i] << 16
        is_run = has_run and bool(run_bits[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, p)
            p += 2
            for _ in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", buf, p)
                p += 4
                values.extend(hi | v for v in range(start, start + len_m1 + 1))
        elif cards[i] > _ARRAY_MAX_CARD:
            words = struct.unpack_from("<1024Q", buf, p)
            p += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(hi | (wi << 6) | b.bit_length() - 1)
                    w ^= b
        else:
            lows = struct.unpack_from(f"<{cards[i]}H", buf, p)
            p += 2 * cards[i]
            values.extend(hi | v for v in lows)
    return values, p - base


# ---------------------------------------------------------------------------
# Delta RoaringBitmapArray framing
# ---------------------------------------------------------------------------

def serialize_rbm_array(positions: list[int]) -> bytes:
    """Delta RoaringBitmapArray (portable) bytes for sorted unique
    non-negative row indexes (64-bit: split into 32-bit bitmaps by the
    high word)."""
    if any(p < 0 for p in positions):
        raise ValueError("row indexes must be non-negative")
    positions = sorted(set(positions))
    n_maps = (positions[-1] >> 32) + 1 if positions else 0
    out = bytearray(struct.pack("<iq", _ARRAY_MAGIC, n_maps))
    for i in range(n_maps):
        lo, hi = i << 32, (i + 1) << 32
        chunk = [p - lo for p in positions if lo <= p < hi]
        out += _serialize_rb32(chunk)
    return bytes(out)


def deserialize_rbm_array(buf: bytes) -> list[int]:
    """Sorted row indexes from Delta RoaringBitmapArray bytes."""
    magic, n_maps = struct.unpack_from("<iq", buf, 0)
    if magic != _ARRAY_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    p = 12
    values: list[int] = []
    for i in range(n_maps):
        vals, used = _deserialize_rb32(buf, p)
        values.extend((i << 32) | v for v in vals)
        p += used
    return values


# ---------------------------------------------------------------------------
# RoaringFormatSpec portable 64-bit framing (Iceberg v3 DV blobs)
# ---------------------------------------------------------------------------

def serialize_portable64(positions: list[int]) -> bytes:
    """Portable 64-bit roaring bytes for sorted unique non-negative
    positions: int64 LE pair count, then per populated high-32 key a
    4-byte LE key + that key's portable 32-bit bitmap."""
    if any(p < 0 for p in positions):
        raise ValueError("positions must be non-negative")
    positions = sorted(set(positions))
    groups: list[tuple[int, list[int]]] = []
    for p in positions:
        key, low = p >> 32, p & 0xFFFFFFFF
        if groups and groups[-1][0] == key:
            groups[-1][1].append(low)
        else:
            groups.append((key, [low]))
    out = bytearray(struct.pack("<q", len(groups)))
    for key, lows in groups:
        out += struct.pack("<I", key)
        out += _serialize_rb32(lows)
    return bytes(out)


def deserialize_portable64(buf: bytes) -> list[int]:
    """Sorted positions from portable 64-bit roaring bytes."""
    (n_pairs,) = struct.unpack_from("<q", buf, 0)
    p = 8
    values: list[int] = []
    for _ in range(n_pairs):
        (key,) = struct.unpack_from("<I", buf, p)
        p += 4
        vals, used = _deserialize_rb32(buf, p)
        values.extend((key << 32) | v for v in vals)
        p += used
    return values
