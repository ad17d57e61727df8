"""Full Ray pipeline over non-tokens schemas (mixed scalars /
nullable — FIXTURES F2/F3 through encode_pipeline + decode_dataset,
not just the container)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.pipelines import decode_dataset, encode_pipeline


def _mixed_table(rng, n=1200):
    return pa.table(
        {
            "k": pa.array(np.arange(n), pa.int64()),
            "i32": pa.array(rng.integers(-100, 100, n), pa.int32()),
            "f": pa.array(rng.standard_normal(n), pa.float64()),
            "s": pa.array([f"v{i % 13}" for i in range(n)], pa.string()),
            "b": pa.array(rng.integers(0, 2, n).astype(bool)),
            "ts": pa.array(rng.integers(0, 2**40, n), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "maybe": pa.array(
                [None if i % 7 == 0 else i * 1.5 for i in range(n)],
                pa.float64(),
            ),
        }
    )


def test_pipeline_mixed_schema(ray_session, tmp_path, rng):
    t = _mixed_table(rng)
    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    pq.write_table(t.slice(0, 600), src + "/a.parquet")
    pq.write_table(t.slice(600), src + "/b.parquet")
    out = str(tmp_path / "enc")
    s = encode_pipeline(
        [src + "/a.parquet", src + "/b.parquet"], out, key_column="k"
    )
    assert s["rows"] == 1200
    back = decode_dataset(out).to_pandas().sort_values("k").reset_index(drop=True)
    orig = t.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig, check_dtype=True)


def test_multimodal_pipeline_stages(ray_session):
    """frame-sample -> resize -> feature chain: schema + invariants
    (payloads resampled to the fixed target, frame counts sane)."""
    import numpy as np
    import pyarrow as pa

    from fastparquet_ray.functions.multimodal import (
        FeatureExtractor,
        FrameSampler,
        Resizer,
    )

    rng = np.random.default_rng(3)
    payloads = [
        rng.integers(0, 255, int(n), dtype=np.uint8).tobytes()
        for n in rng.integers(0, 1500, 50)
    ] + [b""]
    t = pa.table(
        {
            "doc_id": pa.array(range(51), pa.int64()),
            "source": ["s"] * 51,
            "payload": pa.array(payloads, pa.binary()),
            "media_type": ["video/raw"] * 51,
        }
    )
    fs = FrameSampler(frame_bytes=64, stride=4)(t)
    assert fs.column("kept_frames").to_pylist() == [
        (len(p) // 64 + 3) // 4 for p in payloads
    ]
    # every kept frame must be byte-identical to a source frame
    for p, newp, kf in zip(
        payloads, fs.column("payload").to_pylist(), fs.column("kept_frames").to_pylist()
    ):
        assert len(newp) == kf * 64
        for j in range(kf):
            assert newp[j * 64 : (j + 1) * 64] == p[j * 4 * 64 : j * 4 * 64 + 64]
    rz = Resizer(target=128)(fs)
    assert all(len(p) == 128 for p in rz.column("payload").to_pylist())
    feats = FeatureExtractor()(rz)
    assert feats.num_rows == 51
    assert feats.column("payload_bytes").to_pylist() == [128] * 51


def test_hll_accuracy(ray_session):
    """HLL distinct estimate within 3% of exact on lineitem keys."""
    import duckdb

    from fastparquet_ray.functions.sketches import distinct_count_approx

    sf_dir = "/root/testdata/sf0.01"
    approx = distinct_count_approx(sf_dir)
    con = duckdb.connect()
    exact = con.execute(
        "SELECT count(DISTINCT l_partkey), count(DISTINCT l_suppkey) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()
    for got, ex in zip(
        [approx["n_part_approx"][0], approx["n_supp_approx"][0]], exact
    ):
        assert abs(got - ex) / ex < 0.03, (got, ex)
