"""String codec roundtrips: PLAIN / DICT (embedded + shared table) /
FSST (embedded + shared table), incl. escape-heavy and empty inputs.
"""

import numpy as np
import pyarrow as pa
import pytest

from fastparquet_ray.codecs import strcodec as sc
from fastparquet_ray.codecs.fsst import FsstTable, train_fsst


def roundtrip_bytes(strs: list[bytes]):
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    lengths = np.array([len(s) for s in strs], dtype=np.int64)
    return lengths, data


def to_list(lengths, data):
    offs = np.concatenate([[0], np.cumsum(lengths)])
    b = data.tobytes()
    return [b[offs[i] : offs[i + 1]] for i in range(len(lengths))]


CASES = [
    ["web/doc-%012d" % i for i in range(500)],
    ["web", "books", "code", "wiki", "forums"] * 100,
    [""],
    ["", "x", ""],
    ["hello"] * 10,
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_plain_dict_fsst_roundtrip(case):
    vals = CASES[case]
    arr = pa.array(vals, pa.string())
    l, d = sc.str_to_bufs(arr)
    assert sc.bufs_to_arrow(l, d).to_pylist() == vals
    for blob in [
        sc.encode_plain_str(l, d),
        sc.encode_dict_str(l, d),
        sc.encode_fsst_str(l, d, train_fsst(l, d)),
    ]:
        dl, dd = sc.decode_any_str(blob)
        assert sc.bufs_to_arrow(dl, dd).to_pylist() == vals


def test_shared_dict_partial_coverage():
    vals = ["web", "books", "mystery", "web", "other"]
    arr = pa.array(vals)
    l, d = sc.str_to_bufs(arr)
    shared = [b"web", b"books"]
    blob = sc.encode_dict_str(l, d, shared_table=shared)
    tables = {sc.dict_table_hash(shared): sc._pack_str_list(shared)}
    dl, dd = sc.decode_any_str(blob, tables)
    assert sc.bufs_to_arrow(dl, dd).to_pylist() == vals


def test_shared_fsst():
    vals = ["web/doc-%012d" % i for i in range(200)]
    arr = pa.array(vals)
    l, d = sc.str_to_bufs(arr)
    t = train_fsst(l, d)
    blob = sc.encode_fsst_str(l, d, t, shared=True)
    dl, dd = sc.decode_any_str(blob, {t.table_hash(): t.serialize()})
    assert sc.bufs_to_arrow(dl, dd).to_pylist() == vals
    with pytest.raises(KeyError):
        sc.decode_any_str(blob, {})


def test_fsst_escape_heavy(rng):
    strs = [bytes([255] * 5), b"a\xffb", b"\xff", b"\xff\xff\xff"]
    l, d = roundtrip_bytes(strs)
    for table in [train_fsst(l, d), FsstTable([])]:
        el, ed = table.encode(l, d)
        rl, rd = table.decode(el, ed)
        assert to_list(rl, rd) == strs


def test_fsst_random_binary(rng):
    strs = [
        bytes(rng.integers(0, 256, rng.integers(0, 60)).astype(np.uint8))
        for _ in range(300)
    ]
    l, d = roundtrip_bytes(strs)
    t = train_fsst(l, d)
    el, ed = t.encode(l, d)
    rl, rd = t.decode(el, ed)
    assert to_list(rl, rd) == strs


def test_fsst_long_strings(rng):
    words = ["the", "fast", "key", "order", "sort", "merge", "scan"]
    strs = [
        (" ".join(rng.choice(words, rng.integers(50, 150)))).encode()
        for _ in range(100)
    ]
    l, d = roundtrip_bytes(strs)
    t = train_fsst(l, d)
    el, ed = t.encode(l, d)
    assert ed.size < 0.5 * d.size  # compresses word soup well
    rl, rd = t.decode(el, ed)
    assert to_list(rl, rd) == strs


def test_fsst_compresses_doc_ids():
    vals = [f"{s}/doc-{i:012d}" for i, s in
            zip(range(2000), ["web", "books", "code", "wiki", "forums"] * 400)]
    arr = pa.array(vals)
    l, d = sc.str_to_bufs(arr)
    t = train_fsst(l, d)
    blob = sc.encode_fsst_str(l, d, t, shared=True)
    raw = d.size + 4 * len(l)
    assert len(blob) < 0.45 * raw
