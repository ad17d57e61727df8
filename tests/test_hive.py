"""Hive `key=value` partition layout of the OWN shard format (M8
completion, VERDICT r02 #7): write-side partition_on analog, read-side
typed path parsing, partition-value pruning, resume."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.pipelines import decode_dataset, encode_pipeline
from fastparquet_ray.pipelines.decode import prune_shards, shard_files
from fastparquet_ray.pipelines.hive import (
    encode_component,
    parse_hive_parts,
    val_to_typed,
)


def test_val_to_typed():
    assert val_to_typed("7") == 7 and isinstance(val_to_typed("7"), int)
    assert val_to_typed("7.5") == 7.5
    assert val_to_typed("true") is True and val_to_typed("False") is False
    assert val_to_typed("web") == "web"
    assert val_to_typed("__HIVE_DEFAULT_PARTITION__") is None
    assert val_to_typed("2024-01-02") == pd.Timestamp("2024-01-02")
    assert val_to_typed("nan") == "nan"  # left as string, like the ref
    # URL-quoted roundtrip
    comp = encode_component("k", "a/b=c d")
    assert "/" not in comp.split("=", 1)[1]
    assert parse_hive_parts(comp + "/shard-x.fprs") == {"k": "a/b=c d"}


def test_parse_hive_parts_mixed_path():
    assert parse_hive_parts("source=web/year=2024/shard-1.fprs") == {
        "source": "web",
        "year": 2024,
    }
    assert parse_hive_parts("shard-1.fprs") == {}
    assert parse_hive_parts("/plain/dir/shard-1.fprs") == {}


@pytest.fixture()
def hive_encoded(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    n = 300
    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "doc_id": [f"d{i:04d}" for i in range(n)],
            "n_tok": pa.array(rng.integers(1, 50, n), pa.int32()),
            "source": pa.array([["web", "book", "code"][i % 3] for i in range(n)]),
        }
    )
    p = str(src / "part-0.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_pipeline([p], out, resume=True, hive_cols=["source"])
    return p, out, t


def test_hive_roundtrip_reconstructs_partition_column(hive_encoded):
    p, out, t = hive_encoded
    paths = shard_files(out)
    assert len(paths) == 3
    assert all("source=" in sp for sp in paths)
    got = (
        decode_dataset(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["source"]) == list(want["source"])
    assert list(got["n_tok"]) == list(want["n_tok"])
    # shards themselves must NOT store the partition column
    from fastparquet_ray.container import read_header

    with open(paths[0], "rb") as f:
        hdr = read_header(f.read(256 * 1024))
    assert "source" not in [c["name"] for c in hdr["columns"]]


def test_hive_filter_prunes_by_path(hive_encoded):
    _, out, t = hive_encoded
    paths = shard_files(out)
    from fastparquet_ray.state import fs as fsmod

    _, root = fsmod.get_fs(out)
    kept = prune_shards(paths, [("source", "==", "web")], root=root)
    assert len(kept) == 1 and "source=web" in kept[0]
    got = decode_dataset(out, filters=[("source", "==", "web")]).to_pandas()
    want = t.to_pandas().query("source == 'web'")
    assert len(got) == len(want)
    assert set(got["source"]) == {"web"}


def test_hive_projection_with_partition_column(hive_encoded):
    _, out, _ = hive_encoded
    got = decode_dataset(out, columns=["doc_id", "source"]).to_pandas()
    assert sorted(got.columns) == ["doc_id", "source"]
    assert set(got["source"]) == {"web", "book", "code"}


def test_hive_resume_noop(hive_encoded):
    p, out, _ = hive_encoded
    summary = encode_pipeline([p], out, resume=True, hive_cols=["source"])
    assert summary["encoded"] == 0
    assert summary["skipped"] == summary["partitions"] == 3


def test_hive_typed_int_partition(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    t = pa.table(
        {
            "doc_id": ["a", "b", "c", "d"],
            "year": pa.array([2023, 2023, 2024, 2024], pa.int64()),
            "v": [1.5, 2.5, 3.5, 4.5],
        }
    )
    p = str(src / "x.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_pipeline([p], out, resume=False, hive_cols=["year"])
    got = decode_dataset(out).to_pandas().sort_values("doc_id")
    assert got["year"].tolist() == [2023, 2023, 2024, 2024]
    assert str(got["year"].dtype).startswith("int")
