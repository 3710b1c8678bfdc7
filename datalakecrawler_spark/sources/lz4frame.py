"""Pure-Python LZ4 FRAME decompression — enough of the public LZ4
specs (lz4 Frame Format description v1.6.x + Block Format description,
github.com/lz4/lz4/tree/dev/doc) to read compressed Puffin footer
payloads (Iceberg Puffin spec: the FooterPayloadCompressed flag means
the payload is an LZ4 frame). Decompression only — this engine always
WRITES uncompressed footers (always legal per the flag) — and no
content-size hint is required, so frames from any conforming writer
(with or without the content-size header field) decode.

Deliberately strict: unknown frame magic, reserved FLG bits, and
truncated blocks raise instead of returning partial output — a footer
that does not decode must refuse loudly, same rule as every other
codec in sources/ (roaring.py CRC checks)."""

from __future__ import annotations

import struct

_FRAME_MAGIC = 0x184D2204


def _decode_block(src: bytes, out: bytearray) -> None:
    """One LZ4 BLOCK (the raw compression format): a sequence of
    [token | literal-length extension | literals | 2-byte match offset
    | match-length extension] records, match copies allowed to overlap
    their own output (the RLE trick), final record literals-only."""
    i, n = 0, len(src)
    while True:
        if i >= n:
            raise ValueError("lz4: truncated block (missing token)")
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise ValueError("lz4: truncated literals")
        out += src[i : i + lit_len]
        i += lit_len
        if i == n:
            return  # last sequence is literals-only, per block spec
        if i + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4: invalid match offset {offset}")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        # byte-at-a-time when the match overlaps its own output
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            for k in range(match_len):
                out.append(out[start + k])


def lz4_frame_decompress(data: bytes) -> bytes:
    """Decompress one LZ4 frame. Handles compressed and stored
    (uncompressed) blocks, optional content-size header field,
    optional block checksums (skipped — 4 bytes each) and content
    checksum (skipped); content size, when present, is VERIFIED
    against the actual output length."""
    if len(data) < 7:
        raise ValueError("lz4: frame shorter than minimal header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _FRAME_MAGIC:
        raise ValueError(f"lz4: bad frame magic {magic:#x}")
    flg = data[4]
    version = flg >> 6
    if version != 1:
        raise ValueError(f"lz4: unsupported frame version {version}")
    if flg & 0x02:
        raise ValueError("lz4: reserved FLG bit set")
    has_content_size = bool(flg & 0x08)
    has_content_checksum = bool(flg & 0x04)
    has_block_checksum = bool(flg & 0x10)
    has_dict_id = bool(flg & 0x01)
    i = 6  # magic(4) + FLG + BD
    content_size = None
    if has_content_size:
        (content_size,) = struct.unpack_from("<Q", data, i)
        i += 8
    if has_dict_id:
        i += 4
    i += 1  # HC byte (header checksum, XXH32-derived; not verified)
    out = bytearray()
    while True:
        if i + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        (bsize,) = struct.unpack_from("<I", data, i)
        i += 4
        if bsize == 0:
            break  # EndMark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if i + bsize > len(data):
            raise ValueError("lz4: truncated block body")
        block = data[i : i + bsize]
        i += bsize
        if has_block_checksum:
            i += 4
        if stored:
            out += block
        else:
            _decode_block(block, out)
    if has_content_checksum:
        i += 4
    if content_size is not None and content_size != len(out):
        raise ValueError(
            f"lz4: content size mismatch (header {content_size}, "
            f"decoded {len(out)})"
        )
    return bytes(out)
