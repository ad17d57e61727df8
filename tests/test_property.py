"""Hypothesis property tests over the codec kernels (SURVEY.md §5
layer 4 randomized style, strengthened with shrinking)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fastparquet_ray.codecs import intcodec as ic
from fastparquet_ray.codecs import strcodec as sc
from fastparquet_ray.codecs.bitpack import pack_bits, unpack_bits
from fastparquet_ray.codecs.fsst import train_fsst
from fastparquet_ray.codecs.rle import rle_decode, rle_encode


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 32),
    st.lists(st.integers(0, 2**32 - 1), min_size=0, max_size=300),
)
def test_bitpack_roundtrip(width, values):
    v = (np.array(values, dtype=np.uint64) & ((1 << width) - 1)).astype(
        np.uint32
    )
    assert (unpack_bits(pack_bits(v, width), width, v.size) == v).all()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 20),
    st.lists(
        st.tuples(st.integers(0, 2**20 - 1), st.integers(1, 40)),
        min_size=1,
        max_size=60,
    ),
)
def test_rle_runs_roundtrip(width, runs):
    width = max(width, 1)
    vals = np.concatenate(
        [np.full(n, v & ((1 << width) - 1), dtype=np.uint32) for v, n in runs]
    )
    enc = rle_encode(vals, width)
    assert (rle_decode(enc, width, vals.size) == vals).all()


@settings(max_examples=30, deadline=None)
@given(
    st.sampled_from(list(ic.INT_ENCODERS)),
    st.lists(st.integers(-(2**31), 2**31 - 1), min_size=0, max_size=400),
)
def test_intcodec_roundtrip(codec, values):
    v = np.array(values, dtype=np.int64)
    try:
        blob = ic.INT_ENCODERS[codec](v)
    except ValueError:
        return
    out = ic.decode_any_int(blob)
    assert out.dtype == v.dtype and (out == v).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=60), min_size=0, max_size=60))
def test_fsst_roundtrip(strs):
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    lengths = np.array([len(s) for s in strs], dtype=np.int64)
    table = train_fsst(lengths, data)
    el, ed = table.encode(lengths, data)
    dl, dd = table.decode(el, ed)
    assert (dl == lengths).all()
    assert dd.tobytes() == data.tobytes()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=0, max_size=80))
def test_strcodec_roundtrip(strs):
    arr = pa.array(strs, pa.string())
    l, d = sc.str_to_bufs(arr)
    for blob in [sc.encode_plain_str(l, d), sc.encode_dict_str(l, d)]:
        dl, dd = sc.decode_any_str(blob)
        assert sc.bufs_to_arrow(dl, dd).to_pylist() == strs
