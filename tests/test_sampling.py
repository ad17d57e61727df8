"""Deterministic sampling operators: hash-Bernoulli, stratified
quota, weighted mixture — reproducibility and quota semantics."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions import sampling


@pytest.fixture()
def corpus(tmp_path):
    n = 600
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x"] * n,
            "lang": ["en"] * n,
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": rng.integers(10, 500, n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    return str(tmp_path), df


def _h(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)


def test_sample_hash_deterministic_and_correct(ray_session, corpus):
    sf_dir, df = corpus
    out1 = sampling.sample_hash(sf_dir, rate_pct=7)
    out2 = sampling.sample_hash(sf_dir, rate_pct=7)
    pd.testing.assert_frame_equal(out1, out2)  # reproducible
    want = sorted(
        int(d) for d in df["doc_id"] if _h(int(d)) % 100 < 7
    )
    assert out1["doc_id"].tolist() == want
    assert 0 < len(out1) < len(df)


def test_sample_stratified_quota_and_order(ray_session, corpus):
    sf_dir, df = corpus
    out = sampling.sample_stratified(sf_dir, per_source=5)
    assert len(out) == 15  # 3 sources x 5
    assert (out.groupby("source").size() == 5).all()
    # per source: exactly the 5 hash-smallest doc ids
    for s, g in df.groupby("source"):
        ids = sorted(g["doc_id"].tolist(), key=lambda d: (_h(int(d)), d))[:5]
        got = sorted(out[out["source"] == s]["doc_id"].tolist())
        assert got == sorted(ids)


def test_mixture_sample_weighted_quotas(ray_session, corpus):
    sf_dir, df = corpus
    out = sampling.mixture_sample(
        sf_dir, weights={"s0": 0.5, "s2": 0.25}, total=40
    )
    sizes = out.groupby("source").size().to_dict()
    assert sizes == {"s0": 20, "s2": 10}  # s1 excluded entirely
    # quota larger than the source -> capped at the source size
    out2 = sampling.mixture_sample(sf_dir, weights={"s1": 1.0}, total=10_000)
    assert len(out2) == (df["source"] == "s1").sum()
