"""Regression tests for the round-2 ADVICE findings:

1. EncodeShard must not consume a USER-OWNED 'path' column as the
   provenance salt — only the synthetic include_paths column is
   stripped (encode_stage.py provenance_col flag).
2. time32/time64 filter values must be coerced to the COLUMN's unit
   for shard pruning (pandas .value is always ns, inflating the value
   1000x+ and wrongly pruning matching shards).
3. ensure_encoded's input fingerprint must use nanosecond mtime so a
   same-size rewrite within one second is not served stale shards.
"""

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fastparquet_ray.pipelines import decode_dataset, encode_pipeline
from fastparquet_ray.pipelines.decode import (
    _coerce_stat_value,
    prune_shards,
    shard_files,
)
from fastparquet_ray.pipelines.flagship import _input_fingerprint


def test_user_owned_path_column_roundtrips(ray_session, tmp_path):
    """ADVICE r02 #1: a schema that owns 'path' keeps it end-to-end."""
    src = tmp_path / "src"
    src.mkdir()
    p = str(src / "part-0.parquet")
    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "path": ["/data/x", "/data/y", "/data/z"],
            "v": [1, 2, 3],
        }
    )
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_pipeline([p], out, resume=False)
    got = decode_dataset(out).to_pandas().sort_values("doc_id")
    assert list(got.columns) == ["doc_id", "path", "v"]
    assert got["path"].tolist() == ["/data/x", "/data/y", "/data/z"]


def test_synthetic_path_column_still_salts(ray_session, tmp_path):
    """Duplicate input files (identical content) must still land in
    distinct shards via the synthetic provenance salt."""
    src = tmp_path / "src"
    src.mkdir()
    t = pa.table({"doc_id": ["a", "b"], "v": [1, 2]})
    p1, p2 = str(src / "p1.parquet"), str(src / "p2.parquet")
    pq.write_table(t, p1)
    pq.write_table(t, p2)
    out = str(tmp_path / "enc")
    summary = encode_pipeline([p1, p2], out, resume=False)
    assert summary["partitions"] == 2  # not collapsed into one shard
    got = decode_dataset(out).to_pandas()
    assert len(got) == 4
    assert "path" not in got.columns


def test_time_filter_value_coerced_to_column_unit():
    """ADVICE r02 #2: the coerced value is in the column's unit."""
    assert _coerce_stat_value("time64[us]", pd.Timedelta("1s")) == 1_000_000
    assert _coerce_stat_value("time64[ns]", pd.Timedelta("1s")) == 10**9
    assert _coerce_stat_value("time32[ms]", pd.Timedelta("1s")) == 1000
    assert _coerce_stat_value("time32[s]", pd.Timedelta("90s")) == 90


def test_time64_pruning_keeps_matching_shard(ray_session, tmp_path):
    """A shard covering 0-10s of time64[us] must NOT be pruned for
    't > 1s' (the old ns-inflated value pruned it)."""
    src = tmp_path / "src"
    src.mkdir()
    p = str(src / "part-0.parquet")
    us = np.arange(0, 10_000_001, 1_000_000, dtype=np.int64)  # 0..10s
    t = pa.table({"t": pa.array(us, pa.time64("us")), "v": np.arange(len(us))})
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_pipeline([p], out, resume=False)
    paths = shard_files(out)
    kept = prune_shards(paths, [("t", ">", pd.Timedelta("1s"))])
    assert kept == paths  # shard contains 2s..10s matches
    # and a filter beyond the range IS pruned
    assert prune_shards(paths, [("t", ">", pd.Timedelta("11s"))]) == []


def test_input_fingerprint_uses_ns_mtime(tmp_path):
    """ADVICE r02 #3: same-size rewrite within one second changes the
    fingerprint."""
    p = tmp_path / "a.parquet"
    p.write_bytes(b"x" * 64)
    fp1 = _input_fingerprint([str(p)], False)
    time.sleep(0.01)  # sub-second gap
    p.write_bytes(b"y" * 64)  # same size
    fp2 = _input_fingerprint([str(p)], False)
    assert fp1 != fp2
