"""Decode pipeline: shard files -> streaming Dataset of Arrow batches.

Mirrors the reference read path (ParquetFile.to_pandas,
/root/reference/fastparquet/api.py:387-475) as a Ray Data source:
shard blobs are read as binary files and decoded by an actor pool that
holds the shared symbol tables (read once from the plan sidecar).
Column projection is honored at decode (reference analog M1,
api.py:433-439): unneeded buffers are never touched.
"""

from __future__ import annotations

import glob
import os

from ..stages.encode_stage import DecodeShard
from ..state.manifest import Manifest


def shard_files(out_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(out_dir, "shard-*.fprs")))


def decode_dataset(
    out_dir: str,
    columns: list[str] | None = None,
    concurrency=None,
):
    """ray.data.Dataset over the decoded rows of an encoded dataset."""
    import ray
    import ray.data

    manifest = Manifest(out_dir)
    tables = {}
    if manifest.has_plan():
        tables = manifest.load_plan().tables
    paths = shard_files(out_dir)
    if not paths:
        raise FileNotFoundError(f"no shards under {out_dir}")
    # native datasource: decode happens inside stateless read tasks on
    # the warm worker pool (symbol tables are KBs, shipped once with
    # the serialized datasource) — no actor-pool spin-up cost. (The
    # encode side stays an actor pool: it holds encoder state and
    # writes shards.)
    from ..sources.fprs import read_fprs

    return read_fprs(
        paths, tables=tables, columns=columns, concurrency=concurrency
    )
