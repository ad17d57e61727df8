"""Unsigned LEB128 varint + zigzag, as used by Parquet's RLE/bit-pack
hybrid run headers and delta encoding.

Semantics match the reference implementation
(/root/reference/fastparquet/cencoding.pyx:170-187 read_unsigned_var_int,
:245-249 encode_unsigned_varint, :456-465 zigzag) — reimplemented from
the public Parquet spec, scalar for headers (runs are few) plus
vectorized helpers for per-miniblock streams.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_uvarint",
    "decode_uvarint",
    "uvarint_len",
    "zigzag_encode",
    "zigzag_decode",
]


def encode_uvarint(value: int) -> bytes:
    """Encode a non-negative int as unsigned LEB128."""
    if value < 0:
        raise ValueError("uvarint requires non-negative value")
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def decode_uvarint(buf, pos: int = 0) -> tuple[int, int]:
    """Decode unsigned LEB128 starting at ``pos``; returns (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def uvarint_len(value: int) -> int:
    """Number of bytes encode_uvarint would emit."""
    n = 1
    value >>= 7
    while value:
        n += 1
        value >>= 7
    return n


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Signed -> unsigned zigzag mapping (vectorized), int64 -> uint64."""
    v = values.astype(np.int64, copy=False)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).astype(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """Unsigned zigzag -> signed (vectorized), uint64 -> int64."""
    v = values.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)) ^ (np.uint64(0) - (v & np.uint64(1)))).astype(
        np.int64
    )
