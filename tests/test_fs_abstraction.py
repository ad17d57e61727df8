"""Filesystem abstraction (reference S10: fsspec/open_with threading,
/root/reference/fastparquet/api.py:95-103, writer.py:864-869): shard +
manifest I/O must work against non-local filesystems.

Three layers:
1. memory:// — full encode -> manifest -> prune -> decode in-process
   against fsspec's in-memory store (process-local by nature, so no
   Ray workers — the components themselves are exercised for real).
2. file:// URIs through the whole Ray pipeline (URI parsing end-to-end
   across processes).
3. a wrapped fsspec filesystem (DirFileSystem) inside Ray read tasks
   via read_fprs(filesystem=...) — the PyFileSystem/FSSpecHandler
   bridge that any remote store uses.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.container import decode_table
from fastparquet_ray.pipelines import decode_dataset, encode_pipeline
from fastparquet_ray.pipelines.decode import prune_shards, shard_files
from fastparquet_ray.plan import train_plan
from fastparquet_ray.stages.encode_stage import EncodeShard
from fastparquet_ray.state import fs as fsmod
from fastparquet_ray.state.manifest import Manifest


def _table(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": [f"d{seed}-{i:04d}" for i in range(n)],
            "tokens": pa.array(
                [rng.integers(0, 1000, rng.integers(1, 30)).tolist() for _ in range(n)],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array(rng.integers(1, 30, n), pa.int32()),
            "source": pa.array(rng.choice(["web", "wiki"], n)),
        }
    )


def test_memory_fs_encode_decode_verify():
    from fsspec.implementations.memory import MemoryFileSystem

    MemoryFileSystem.store.clear()
    out = "memory://enc_test"
    plan = train_plan(_table(80, seed=1))
    manifest = Manifest(out)
    manifest.write_plan(plan)
    assert manifest.has_plan()
    enc = EncodeShard(plan_json=plan.to_json(), out_dir=out)
    recs = []
    for seed in (1, 2):
        recs.extend(enc(_table(80, seed=seed)).to_pylist())
    manifest.write_records(recs)

    # manifest round-trips + self-certifying shards are found
    assert len(manifest.load_records()) == 2
    assert manifest.finished_ids() == {r["partition_id"] for r in recs}

    # stats pruning + decode through the same fs
    paths = shard_files(out)
    assert len(paths) == 2 and all(p.startswith("memory://") for p in paths)
    assert prune_shards(paths, [("n_tok", ">", 9999)]) == []
    got = []
    for p in paths:
        fs, rp = fsmod.get_fs(p)
        got.append(decode_table(fsmod.read_bytes(fs, rp), manifest.load_plan().tables))
    dec = pa.concat_tables(got).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = (
        pa.concat_tables([_table(80, seed=1), _table(80, seed=2)])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert dec["doc_id"].tolist() == exp["doc_id"].tolist()
    assert all(
        list(a) == list(b) for a, b in zip(dec["tokens"], exp["tokens"])
    )

    # resume skip path through the fs
    enc2 = EncodeShard(
        plan_json=plan.to_json(), out_dir=out, finished=manifest.finished_ids()
    )
    rec = enc2(_table(80, seed=1)).to_pylist()[0]
    assert rec["status"] == "skipped"

    # orphan removal through the fs
    removed = manifest.remove_orphan_shards({recs[0]["partition_id"]})
    assert removed == 1 and len(shard_files(out)) == 1
    MemoryFileSystem.store.clear()


def test_file_uri_pipeline(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    t = _table(200, seed=3)
    pq.write_table(t, str(src / "part-0.parquet"))
    out = f"file://{tmp_path}/enc"
    summary = encode_pipeline(f"file://{src}", out)
    assert summary["rows"] == 200
    got = decode_dataset(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tok"].tolist() == exp["n_tok"].tolist()


def test_wrapped_fsspec_fs_inside_ray_read(ray_session, tmp_path):
    from fsspec.implementations.dirfs import DirFileSystem
    from fsspec.implementations.local import LocalFileSystem

    from fastparquet_ray.sources.fprs import read_fprs

    src = tmp_path / "src"
    src.mkdir()
    t = _table(150, seed=4)
    pq.write_table(t, str(src / "part-0.parquet"))
    out = str(tmp_path / "enc")
    encode_pipeline([str(src / "part-0.parquet")], out)
    tables = Manifest(out).load_plan().tables

    # DirFileSystem is not "local" by protocol -> read_fprs wraps it in
    # a pyarrow PyFileSystem and Ray read tasks open through it
    dfs = DirFileSystem(path=out, fs=LocalFileSystem())
    assert not fsmod.is_local(dfs)
    names = sorted(p.rsplit("/", 1)[-1] for p in shard_files(out))
    ds = read_fprs(names, tables=tables, filesystem=dfs)
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert all(list(a) == list(b) for a, b in zip(got["tokens"], exp["tokens"]))
