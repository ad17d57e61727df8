"""Golden encoded corpus replay (SURVEY.md §5 layer 2 — the reference
replays test-data/{bitpack,rle,hybrid,uvarint} blobs the same way,
test_with_n.py:11-112; those blobs are absent from the mirror so ours
are regenerated and checked in). Guards against silent format drift:
decoders must keep reading bytes produced by earlier rounds, and
encoders must stay deterministic.
"""

import json
import os

import numpy as np
import pyarrow as pa

from fastparquet_ray.codecs import intcodec as ic
from fastparquet_ray.codecs import strcodec as sc
from fastparquet_ray.codecs.bitpack import pack_bits, unpack_bits
from fastparquet_ray.codecs.rle import rle_decode, rle_encode

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_codecs.json")


def load():
    with open(GOLDEN) as f:
        return json.load(f)


def test_bitpack_golden():
    for case in load()["bitpack"]:
        v = np.array(case["values"], dtype=np.uint32)
        blob = bytes.fromhex(case["bytes"])
        assert pack_bits(v, case["width"]) == blob  # encoder stability
        assert (unpack_bits(blob, case["width"], v.size) == v).all()


def test_rle_golden():
    for case in load()["rle"]:
        v = np.array(case["values"], dtype=np.uint32)
        blob = bytes.fromhex(case["bytes"])
        # decoder must read historic bytes; encoder may improve layout
        assert (rle_decode(blob, case["width"], v.size) == v).all()
        rt = rle_encode(v, case["width"])
        assert (rle_decode(rt, case["width"], v.size) == v).all()


def test_intcodec_golden():
    for case in load()["intcodec"]:
        v = np.array(case["values"], dtype=case["dtype"])
        blob = bytes.fromhex(case["bytes"])
        out = ic.decode_any_int(blob)
        assert out.dtype == v.dtype and (out == v).all()


def test_strcodec_golden():
    for case in load()["strcodec"]:
        blob = bytes.fromhex(case["bytes"])
        lengths, data = sc.decode_any_str(blob)
        assert sc.bufs_to_arrow(lengths, data).to_pylist() == case["values"]


def test_zranks_golden():
    """Shared-rank-table wire format (round 3): decoder must keep
    reading blobs + serialized tables produced by earlier rounds,
    including the embedded-extras escape for unseen values."""
    for case in load().get("zranks", []):
        blob = bytes.fromhex(case["bytes"])
        tables = {case["table_hash"]: bytes.fromhex(case["table_bytes"])}
        out = ic.decode_any_int(blob, tables)
        v = np.array(case["values"], dtype=case["dtype"])
        assert out.dtype == v.dtype and (out == v).all()
