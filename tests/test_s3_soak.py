"""S3-compatible endpoint soak (closes SURVEY S10, VERDICT r02 #10):
the full encode -> manifest -> resume -> prune -> decode -> verify
loop against an in-process moto S3 server, through the REAL S3 wire
API (CreateMultipartUpload / UploadPart / CompleteMultipartUpload,
prefix listing, HeadObject) via state.s3compat — including Ray
actors/tasks on the write and read paths (the filesystem instance is
pickled into them).

moto's server speaks HTTP on localhost, so this exercises
cross-process object-store access the memory:// layer can't.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytest.importorskip("moto")
pytest.importorskip("boto3")

from fastparquet_ray.pipelines import decode_dataset, encode_pipeline
from fastparquet_ray.pipelines.decode import prune_shards, shard_files
from fastparquet_ray.state.s3compat import (
    MULTIPART_THRESHOLD,
    S3CompatFileSystem,
)


@pytest.fixture(scope="module")
def s3fs_moto():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    port = server._server.socket.getsockname()[1]
    fs = S3CompatFileSystem(endpoint_url=f"http://127.0.0.1:{port}")
    fs.makedirs("bkt/x")  # creates the bucket
    yield fs
    server.stop()


def _src(tmp_path, n=500, seed=0):
    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "doc_id": [f"d{seed}-{i:05d}" for i in range(n)],
            "tokens": pa.array(
                [rng.integers(0, 1000, rng.integers(1, 40)).tolist() for _ in range(n)],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array(rng.integers(1, 40, n), pa.int32()),
            "source": pa.array(rng.choice(["web", "wiki"], n)),
        }
    )
    p = str(tmp_path / f"part-{seed}.parquet")
    pq.write_table(t, p)
    return p, t


def test_multipart_upload_roundtrip(s3fs_moto):
    """Writes above the threshold go through real multipart calls."""
    fs = s3fs_moto
    big = bytes(np.random.default_rng(1).integers(0, 256, MULTIPART_THRESHOLD + 1024, dtype=np.uint8))
    with fs.open("bkt/big.bin", "wb") as f:
        f.write(big)
    assert fs.size("bkt/big.bin") == len(big)
    with fs.open("bkt/big.bin", "rb") as f:
        assert f.read() == big
    fs.rm("bkt/big.bin")
    assert not fs.exists("bkt/big.bin")


def test_listing_consistency(s3fs_moto):
    fs = s3fs_moto
    for i in range(3):
        with fs.open(f"bkt/list/shard-{i}.fprs", "wb") as f:
            f.write(b"data" * 10)
    assert fs.glob("bkt/list/shard-*.fprs") == [
        f"bkt/list/shard-{i}.fprs" for i in range(3)
    ]
    assert fs.isdir("bkt/list")
    assert not fs.exists("bkt/list/missing.fprs")


def test_encode_decode_verify_against_s3(ray_session, s3fs_moto, tmp_path):
    """Full pipeline against the S3 endpoint, Ray actors included."""
    fs = s3fs_moto
    p, t = _src(tmp_path)
    out = "bkt/enc"
    summary = encode_pipeline([p], out, resume=False, filesystem=fs)
    assert summary["encoded"] >= 1
    # shards + manifest + plan landed as S3 objects
    assert shard_files(out, filesystem=fs)
    assert fs.exists("bkt/enc/_manifest.jsonl")
    assert fs.exists("bkt/enc/_plan.json")
    got = (
        decode_dataset(out, filesystem=fs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert all(
        list(a) == list(b) for a, b in zip(got["tokens"], want["tokens"])
    )

    # resume no-op: nothing re-encodes against the remote store
    summary2 = encode_pipeline([p], out, resume=True, filesystem=fs)
    assert summary2["encoded"] == 0
    assert summary2["skipped"] == summary["partitions"]

    # the ParquetFile-analog API works against the endpoint too
    from fastparquet_ray.api import EncodedDataset

    eds = EncodedDataset(out, filesystem=fs)
    assert eds.count() == 500
    assert "tokens" in eds.columns


def test_filter_pruning_against_s3(ray_session, s3fs_moto, tmp_path):
    fs = s3fs_moto
    src = tmp_path / "s2"
    src.mkdir()
    paths = []
    for seed, lo in ((1, 0), (2, 10_000)):
        n = 100
        t = pa.table(
            {
                "doc_id": [f"k{seed}-{i}" for i in range(n)],
                "v": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
            }
        )
        p = str(src / f"part-{seed}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = "bkt/enc2"
    encode_pipeline(paths, out, resume=False, filesystem=fs)
    all_paths = shard_files(out, filesystem=fs)
    assert len(all_paths) == 2
    kept = prune_shards(all_paths, [("v", ">=", 10_000)], filesystem=fs)
    assert len(kept) == 1
    got = decode_dataset(out, filters=[("v", ">=", 10_000)], filesystem=fs)
    assert got.count() == 100
