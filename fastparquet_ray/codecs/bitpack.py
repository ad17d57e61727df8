"""Parquet-spec bit packing: values laid out as a contiguous LSB-first
bitstream (width bits per value, little-endian bit order within bytes).

Ground truth is the reference decoder
/root/reference/fastparquet/cencoding.pyx:127-167 (read_bitpacked) and
its unit vector b"\\x88\\xc6\\xfa" -> [0..7] at width 3
(/root/reference/fastparquet/test/test_encoding.py:91-104). Here the
kernels are numpy-vectorized (np.unpackbits/np.packbits with
bitorder="little") instead of a per-value Cython loop.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bit_width",
    "bit_width_arr",
    "pack_bits",
    "unpack_bits",
    "unpack_bits_add",
]

_MAX_WIDTH = 32


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (0 -> 0), cf.
    cencoding.pyx:53-59 width_from_max_int."""
    if max_value < 0:
        raise ValueError("bit_width requires non-negative max_value")
    return int(max_value).bit_length()


def bit_width_arr(values: np.ndarray) -> int:
    """Bit width needed for a non-negative integer array (0 for empty)."""
    if values.size == 0:
        return 0
    return bit_width(int(values.max()))


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into an LSB-first bitstream of ``width``
    bits per value. Output is padded with zero bits to a whole byte
    (exactly ``(n*width + 7) // 8`` bytes).

    Fast paths: width % 8 == 0 -> pure byte truncation (memcpy speed);
    otherwise groups of 8 values span exactly ``width`` bytes, built by
    8 vectorized shift/OR passes over uint64 lanes — no per-bit arrays.
    """
    if width == 0:
        return b""
    if not 0 < width <= _MAX_WIDTH:
        raise ValueError(f"width must be in 1..{_MAX_WIDTH}, got {width}")
    v = np.ascontiguousarray(values, dtype="<u4")
    n = v.size
    if n == 0:
        return b""
    out_len = (n * width + 7) // 8
    if width % 8 == 0:
        nb = width // 8
        return np.ascontiguousarray(
            v.view(np.uint8).reshape(n, 4)[:, :nb]
        ).tobytes()
    # pad to a multiple of 8 values; 8 values * width bits == width bytes.
    # Writes go through UNALIGNED STRIDED u64 read-modify-write views
    # over one padded buffer (same trick as unpack_bits; consecutive j
    # windows overlap but the loop is sequential, and within one pass
    # rows are stride-separated) — avoids a per-pass byte-matrix copy.
    g = (n + 7) // 8
    if n % 8:
        v = np.concatenate([v, np.zeros(g * 8 - n, dtype="<u4")])
    lanes = v.reshape(g, 8).astype("<u8")
    stride = width + 8  # +8 slack so the last u64 write stays in-row
    out = np.zeros(g * stride, dtype=np.uint8)
    for j in range(8):
        start_bit = j * width
        p0, r = divmod(start_bit, 8)
        dst = np.ndarray(
            (g,), dtype="<u8", buffer=out, offset=p0, strides=(stride,)
        )
        dst |= lanes[:, j] << np.uint64(r)
    return (
        np.ascontiguousarray(out.reshape(g, stride)[:, :width])
        .tobytes()[:out_len]
    )


def unpack_bits(buf: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Inverse of pack_bits: read ``count`` values of ``width`` bits from
    an LSB-first bitstream. Returns uint32.
    """
    if count == 0:
        return np.empty(0, dtype=np.uint32)
    if width == 0:
        return np.zeros(count, dtype=np.uint32)
    if not 0 < width <= _MAX_WIDTH:
        raise ValueError(f"width must be in 1..{_MAX_WIDTH}, got {width}")
    raw = np.frombuffer(buf, dtype=np.uint8)
    need_bytes = (count * width + 7) // 8
    if raw.size < need_bytes:
        raise ValueError(
            f"buffer too small: need {need_bytes} bytes for "
            f"{count} x {width}-bit values, have {raw.size}"
        )
    if width % 8 == 0:
        nb = width // 8
        padded = np.zeros((count, 4), dtype=np.uint8)
        padded[:, :nb] = raw[: count * nb].reshape(count, nb)
        return padded.reshape(-1).view("<u4").copy()
    # groups of 8 values == width bytes each; last group may be partial.
    # Per-lane u64 loads come from UNALIGNED STRIDED views over one
    # contiguous padded buffer (np.ndarray with byte offset + stride):
    # measured 1.5-1.9x faster than materializing a contiguous copy of
    # the 8-byte window per lane (x86 handles unaligned loads natively).
    g = (count + 7) // 8
    grp = np.zeros(g * (width + 8), dtype=np.uint8)  # +8 slack for u64 reads
    full = raw[: g * width]
    if full.size < g * width:
        tmp = np.zeros(g * width, dtype=np.uint8)
        tmp[: full.size] = full
        full = tmp
    grp.reshape(g, width + 8)[:, :width] = full.reshape(g, width)
    mask = np.uint64((1 << width) - 1)
    out = np.empty((g, 8), dtype=np.uint64)
    stride = width + 8
    for j in range(8):
        start_bit = j * width
        p0, r = divmod(start_bit, 8)
        lanes = np.ndarray(
            (g,), dtype="<u8", buffer=grp, offset=p0, strides=(stride,)
        )
        out[:, j] = (lanes >> np.uint64(r)) & mask
    return out.reshape(-1)[:count].astype(np.uint32)


def unpack_bits_add(
    buf: bytes | np.ndarray, width: int, count: int, out: np.ndarray
) -> None:
    """Fused unpack+add for FOR decode (NEXT r3 #3): adds ``count``
    ``width``-bit values from the bitstream into ``out[:count]``
    (int64, preloaded with the per-value frame minimums) IN PLACE.
    Skips unpack_bits' intermediate (g, 8) u64 matrix and its
    astype(uint32) copy plus the caller's separate add pass — each
    lane goes shift->mask->cast->strided-add in one sweep."""
    if count == 0 or width == 0:
        return
    if not 0 < width <= _MAX_WIDTH:
        raise ValueError(f"width must be in 1..{_MAX_WIDTH}, got {width}")
    raw = np.frombuffer(buf, dtype=np.uint8)
    need_bytes = (count * width + 7) // 8
    if raw.size < need_bytes:
        raise ValueError(
            f"buffer too small: need {need_bytes} bytes for "
            f"{count} x {width}-bit values, have {raw.size}"
        )
    if width % 8 == 0:
        nb = width // 8
        padded = np.zeros((count, 4), dtype=np.uint8)
        padded[:, :nb] = raw[: count * nb].reshape(count, nb)
        out[:count] += padded.reshape(-1).view("<u4")
        return
    g = (count + 7) // 8
    grp = np.zeros(g * (width + 8), dtype=np.uint8)  # +8 slack for u64 reads
    full = raw[: g * width]
    if full.size < g * width:
        tmp = np.zeros(g * width, dtype=np.uint8)
        tmp[: full.size] = full
        full = tmp
    grp.reshape(g, width + 8)[:, :width] = full.reshape(g, width)
    mask = np.uint64((1 << width) - 1)
    stride = width + 8
    for j in range(8):
        p0, r = divmod(j * width, 8)
        lanes = np.ndarray(
            (g,), dtype="<u8", buffer=grp, offset=p0, strides=(stride,)
        )
        tgt = out[j:count:8]  # values j, j+8, ... across groups
        tgt += ((lanes[: tgt.size] >> np.uint64(r)) & mask).astype(np.int64)
