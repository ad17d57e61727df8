"""Kernel unit tests with the reference's hand-computed spec vectors
(they encode the public Parquet spec) plus randomized roundtrips —
mirrors /root/reference/fastparquet/test/test_encoding.py and
test_output.py layers 1-2 of SURVEY.md §5.
"""

import numpy as np
import pytest

from fastparquet_ray.codecs.bitpack import bit_width, pack_bits, unpack_bits
from fastparquet_ray.codecs.rle import rle_decode, rle_encode
from fastparquet_ray.codecs.varint import (
    decode_uvarint,
    encode_uvarint,
    zigzag_decode,
    zigzag_encode,
)
from fastparquet_ray.codecs import intcodec as ic


class TestSpecVectors:
    """Hand values from the reference test suite (test_encoding.py)."""

    def test_bitpack_width3(self):
        # test_encoding.py:91-104: b'\x88\xc6\xfa' <-> [0..7] at width 3
        assert unpack_bits(b"\x88\xc6\xfa", 3, 8).tolist() == list(range(8))
        assert pack_bits(np.arange(8), 3) == b"\x88\xc6\xfa"

    def test_rle_run(self):
        # test_encoding.py:62-69: header 2<<1, width 30, value 1<<30, x2
        buf = encode_uvarint(2 << 1) + (1 << 30).to_bytes(4, "little")
        assert rle_decode(buf, 30, 2).tolist() == [1 << 30] * 2

    def test_varint(self):
        # test_encoding.py:73-88
        assert decode_uvarint(b"\x7f") == (127, 1)
        assert decode_uvarint(b"\xff\xff\xff\x7f") == (0x0FFFFFFF, 4)
        assert encode_uvarint(127) == b"\x7f"
        assert encode_uvarint(0x0FFFFFFF) == b"\xff\xff\xff\x7f"

    def test_width_from_max_int(self):
        # test_encoding.py:107-126 table
        expect = {0: 0, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 7: 3, 8: 4, 15: 4,
                  16: 5, 255: 8, 256: 9, 2**31 - 1: 31}
        for k, v in expect.items():
            assert bit_width(k) == v


class TestBitpackRoundtrip:
    @pytest.mark.parametrize("width", list(range(1, 33)))
    def test_all_widths(self, width, rng):
        hi = 2**width if width < 32 else 2**32
        for n in (1, 7, 8, 9, 1000):
            v = rng.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)
            b = pack_bits(v, width)
            assert len(b) == (n * width + 7) // 8
            assert (unpack_bits(b, width, n) == v).all()

    def test_width_zero(self):
        assert pack_bits(np.array([0, 0]), 0) == b""
        assert unpack_bits(b"", 0, 5).tolist() == [0] * 5


class TestRleHybrid:
    @pytest.mark.parametrize("width", [1, 3, 8, 13, 20, 32])
    def test_random_roundtrip(self, width, rng):
        hi = 2**width if width < 32 else 2**32
        v = rng.integers(0, hi, size=2000, dtype=np.uint64).astype(np.uint32)
        assert (rle_decode(rle_encode(v, width), width, v.size) == v).all()

    def test_runny_roundtrip(self, rng):
        v = np.repeat(
            rng.integers(0, 100, 200), rng.integers(1, 40, 200)
        ).astype(np.uint32)
        enc = rle_encode(v, 7)
        assert (rle_decode(enc, 7, v.size) == v).all()
        assert len(enc) < v.size  # genuinely compresses runs

    def test_mixed_runs_alignment(self, rng):
        # short spans between long runs exercise the 8-alignment stealing
        parts = []
        for i in range(50):
            parts.append(rng.integers(0, 32, rng.integers(1, 12)))
            parts.append(np.full(rng.integers(8, 30), i % 32))
        v = np.concatenate(parts).astype(np.uint32)
        assert (rle_decode(rle_encode(v, 5), 5, v.size) == v).all()

    def test_all_equal(self):
        v = np.full(1000, 7, dtype=np.uint32)
        enc = rle_encode(v, 3)
        assert len(enc) <= 3
        assert (rle_decode(enc, 3, 1000) == v).all()


class TestZigzag:
    def test_roundtrip(self, rng):
        v = rng.integers(-(2**40), 2**40, 1000)
        assert (zigzag_decode(zigzag_encode(v)) == v).all()
        assert zigzag_encode(np.array([0, -1, 1, -2])).tolist() == [0, 1, 2, 3]


class TestIntCodecs:
    CASES = [
        np.array([], dtype=np.int32),
        np.array([7], dtype=np.int32),
        np.arange(-500, 500, dtype=np.int32),
        np.arange(10_000, dtype=np.int64) * 1000,
    ]

    @pytest.mark.parametrize("codec", list(ic.INT_ENCODERS))
    def test_roundtrip(self, codec, rng):
        enc = ic.INT_ENCODERS[codec]
        cases = self.CASES + [
            rng.integers(0, 50257, 20000).astype(np.int32),
            np.repeat(rng.integers(0, 5, 100), 50).astype(np.int64),
            rng.integers(0, 3, 500).astype(np.int16),
            rng.integers(0, 200, 500).astype(np.uint8),
        ]
        for arr in cases:
            try:
                b = enc(arr)
            except ValueError:
                continue  # documented fallback (range too wide)
            d = ic.decode_any_int(b)
            assert d.dtype == arr.dtype
            assert (d == arr).all()

    def test_for_bp_compresses_tokens(self, rng):
        tok = rng.integers(0, 50257, 100_000).astype(np.int32)
        b = ic.encode_for_bp(tok)
        assert len(b) < 0.55 * tok.nbytes  # 16 bits vs 32

    def test_for_bp_rejects_wide_range(self):
        v = np.array([0, 2**40], dtype=np.int64)
        with pytest.raises(ValueError):
            ic.encode_for_bp(v)


def test_for64_roundtrip_wide_ranges():
    """64-bit FOR: full-range int64 data (e.g. unsorted microsecond
    timestamps spanning weeks) that exceeds the 32-bit miniblock limit
    of for_bp/pfor must still beat PLAIN and roundtrip exactly."""
    import numpy as np

    from fastparquet_ray.codecs import intcodec as ic

    rng = np.random.default_rng(11)
    base = 1_700_000_000_000_000  # epoch us
    span = 30 * 86_400_000_000  # 30 days in us
    v = base + rng.integers(0, span, 50_000)
    v = v.astype(np.int64)
    blob = ic.encode_for_bp64(v)
    out = ic.decode_any_int(blob)
    assert out.dtype == v.dtype and (out == v).all()
    assert len(blob) < v.nbytes  # beats PLAIN (42-ish bits vs 64)
    # 32-bit codecs refuse this range; auto selection must not fall
    # back to PLAIN any more
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ic.encode_for_bp(v)
    from fastparquet_ray.container import _encode_int_auto

    auto = _encode_int_auto(v, None)
    assert auto[0] != 0, "auto selection picked PLAIN for wide timestamps"
    out2 = ic.decode_any_int(auto)
    assert (out2 == v).all()


def test_for64_mixed_width_blocks_and_negatives():
    import numpy as np

    from fastparquet_ray.codecs import intcodec as ic

    rng = np.random.default_rng(12)
    parts = [
        rng.integers(-(2**62), 2**62, 3000),   # wide blocks
        rng.integers(0, 100, 3000),            # narrow blocks
        np.full(1500, -5),                     # zero-width blocks
        rng.integers(-(2**40), 2**40, 100),    # tail partial block
    ]
    v = np.concatenate(parts).astype(np.int64)
    out = ic.decode_any_int(ic.encode_for_bp64(v))
    assert (out == v).all()


def test_delta_wide_deltas_falls_back_to_for64():
    import numpy as np

    from fastparquet_ray.codecs import intcodec as ic

    rng = np.random.default_rng(13)
    v = np.cumsum(rng.integers(-(2**40), 2**40, 20_000)).astype(np.int64)
    out = ic.decode_any_int(ic.encode_delta(v))
    assert (out == v).all()
