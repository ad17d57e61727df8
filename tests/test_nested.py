"""Nested / nullable / binary container support (VERDICT r01 missing
items 2-4): list<string>, null list values, null list elements, binary
columns, one-level struct and map — roundtrip-exact through the shard
container, and through the full Ray pipeline for the parquet-expressible
shapes. Reference semantics: one-level LIST/MAP Dremel assembly
(/root/reference/fastparquet/cencoding.pyx:376-439, core.py:584-595)
and null handling via definition levels (writer.py:375-408)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.container import ShardEncoder, decode_table

CASES = {
    "list_string": pa.array(
        [["a", "bb"], [], ["ccc", "", "dd"], ["e"]], pa.list_(pa.string())
    ),
    "list_string_nulls": pa.array(
        [["a", None, "b"], None, [], ["c"]], pa.list_(pa.string())
    ),
    "null_list_int": pa.array(
        [[1, 2], None, [], [3, 4, 5]], pa.list_(pa.int32())
    ),
    "list_int_null_elems": pa.array(
        [[1, None], [2], None, [None, None]], pa.list_(pa.int64())
    ),
    "binary": pa.array([b"\x00\xffbin", b"", b"xyz", b"\x01\x02"], pa.binary()),
    "binary_nulls": pa.array([b"ab", None, b"", b"\x80"], pa.binary()),
    "large_string": pa.array(["x", "yy", "", "zzz"], pa.large_string()),
    "struct": pa.array(
        [
            {"a": 1, "b": "x"},
            {"a": None, "b": "y"},
            None,
            {"a": 3, "b": None},
        ],
        pa.struct([("a", pa.int32()), ("b", pa.string())]),
    ),
    "map": pa.array(
        [
            [("k1", 1), ("k2", 2)],
            [],
            None,
            [("k3", 30)],
        ],
        pa.map_(pa.string(), pa.int64()),
    ),
    "list_float_nulls": pa.array(
        [[1.5, 2.5], None, [0.0]], pa.list_(pa.float64())
    ),
    "list_bool": pa.array(
        [[True, False], None, [True]], pa.list_(pa.bool_())
    ),
    "list_of_list": pa.array(
        [[[1, 2], [3]], [], [[4]], None],
        pa.list_(pa.list_(pa.int32())),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_container_roundtrip_nested(name):
    arr = CASES[name]
    t = pa.table({"doc_id": [f"d{i}" for i in range(len(arr))], "col": arr})
    enc = ShardEncoder()
    blob = enc.encode_table(t, "p0")
    got = decode_table(blob)
    assert got.schema.equals(t.schema), f"{got.schema} != {t.schema}"
    assert got.equals(t), f"{got.to_pylist()} != {t.to_pylist()}"


def test_container_roundtrip_nested_with_outer_zstd():
    t = pa.table(
        {
            "ls": CASES["list_string"],
            "nl": CASES["null_list_int"],
            "st": CASES["struct"],
        }
    )
    enc = ShardEncoder(outer=("zstd", 3))
    got = decode_table(enc.encode_table(t, "p0"))
    assert got.equals(t)


def test_pipeline_roundtrip_list_string_and_nullable(ray_session, tmp_path):
    from fastparquet_ray.pipelines import decode_dataset, encode_pipeline

    rng = np.random.default_rng(7)
    n = 500
    tags = pa.array(
        [
            None
            if rng.random() < 0.1
            else [f"t{j}" for j in range(rng.integers(0, 4))]
            for _ in range(n)
        ],
        pa.list_(pa.string()),
    )
    vals = pa.array(
        [
            None if rng.random() < 0.1 else rng.integers(0, 100, rng.integers(0, 5)).tolist()
            for _ in range(n)
        ],
        pa.list_(pa.int32()),
    )
    t = pa.table(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "tags": tags,
            "vals": vals,
            "blob": pa.array([bytes([i % 256, 255 - i % 256]) for i in range(n)]),
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "p0.parquet"))
    out = str(tmp_path / "enc")
    encode_pipeline([str(src / "p0.parquet")], out)
    # gather through Arrow (Ray's to_pandas TensorArray conversion
    # rejects ragged list columns; pyarrow's to_pandas handles them)
    got = (
        pa.concat_tables(
            decode_dataset(out).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for col in ["tags", "vals"]:
        for a, b in zip(got[col], exp[col]):
            if b is None or (not isinstance(b, (list, np.ndarray)) and b != b):
                assert a is None or not isinstance(a, (list, np.ndarray))
            else:
                assert list(a) == list(b)
    assert got["blob"].tolist() == exp["blob"].tolist()
