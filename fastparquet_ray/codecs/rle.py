"""Parquet RLE / bit-packed hybrid codec (encode AND decode).

Format (public Parquet spec; reference decoder
/root/reference/fastparquet/cencoding.pyx:190-211
read_rle_bit_packed_hybrid, RLE runs :22-50, bit-packed runs :127-167):

    stream  := run*
    run     := varint-header body
    header even -> RLE run:        count = header >> 1,
                                   body = value in ceil(width/8) LE bytes
    header odd  -> bit-packed run: groups = header >> 1,
                                   body = groups*8 values, width bits each,
                                   LSB-first

The reference *encoder* only ever emits a single bit-packed run
(cencoding.pyx:272-282 encode_rle_bp); this encoder is a real chooser
(RLE for runs >= _MIN_RLE_RUN, bit-packing between them), which is the
engine's improvement — decoded output is what must match.

Vectorization strategy: run boundaries via np.diff; the Python loop is
over *runs emitted* (RLE runs are >= 8 values each; consecutive short
runs collapse into one bit-packed span), never over values.
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack_bits, unpack_bits
from .varint import decode_uvarint, encode_uvarint

__all__ = ["rle_encode", "rle_decode"]

_MIN_RLE_RUN = 8  # shorter runs are cheaper bit-packed


def _rle_run(value: int, count: int, width: int) -> bytes:
    nbytes = (width + 7) // 8  # 0 when width == 0
    return encode_uvarint(count << 1) + int(value).to_bytes(nbytes, "little")


def _bitpacked_run(values: np.ndarray, width: int) -> bytes:
    n = values.size
    groups = (n + 7) // 8
    if n % 8:
        values = np.concatenate(
            [values, np.zeros(groups * 8 - n, dtype=values.dtype)]
        )
    return encode_uvarint((groups << 1) | 1) + pack_bits(values, width)


def rle_encode(values: np.ndarray, width: int) -> bytes:
    """Encode non-negative ints (< 2**width) into the hybrid stream."""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    n = v.size
    if n == 0:
        return b""
    if width == 0:
        # all values are 0: single RLE run
        return _rle_run(0, n, 0)
    # run-length segmentation
    change = np.flatnonzero(v[1:] != v[:-1])
    starts = np.concatenate([[0], change + 1])
    lengths = np.diff(np.concatenate([starts, [n]]))
    rle_mask = lengths >= _MIN_RLE_RUN
    out = []
    pos = 0  # next value index not yet emitted
    # Invariant: every bit-packed run except the terminal one holds a
    # multiple of 8 values — the decoder consumes groups*8 values, so
    # mid-stream padding would corrupt. When the preceding span isn't
    # 8-aligned we steal the first (8 - span%8) values from the RLE run.
    for s, ln in zip(starts[rle_mask], lengths[rle_mask]):
        s = int(s)
        ln = int(ln)
        span = s - pos
        pad = (-span) % 8
        if pad:
            if ln - pad < _MIN_RLE_RUN:
                continue  # run too short once aligned: absorb into bitpack
            out.append(_bitpacked_run(v[pos : s + pad], width))
            out.append(_rle_run(int(v[s]), ln - pad, width))
        else:
            if span:
                out.append(_bitpacked_run(v[pos:s], width))
            out.append(_rle_run(int(v[s]), ln, width))
        pos = s + ln
    if pos < n:
        out.append(_bitpacked_run(v[pos:], width))
    return b"".join(out)


def rle_decode(buf: bytes, width: int, count: int) -> np.ndarray:
    """Decode ``count`` values from the hybrid stream. Returns uint32."""
    out = np.empty(count, dtype=np.uint32)
    raw = memoryview(buf)
    pos = 0
    filled = 0
    nbytes = (width + 7) // 8
    while filled < count:
        header, pos = decode_uvarint(raw, pos)
        if header & 1:  # bit-packed run
            groups = header >> 1
            nvals = groups * 8
            nbuf = (nvals * width + 7) // 8
            vals = unpack_bits(raw[pos : pos + nbuf], width, nvals)
            pos += nbuf
            take = min(nvals, count - filled)
            out[filled : filled + take] = vals[:take]
            filled += take
        else:  # RLE run
            run = header >> 1
            if width:
                value = int.from_bytes(raw[pos : pos + nbytes], "little")
                pos += nbytes
            else:
                value = 0
            take = min(run, count - filled)
            out[filled : filled + take] = value
            filled += take
    return out
