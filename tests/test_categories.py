"""VERDICT r02 #8: categorical decode surface — decode(categories=[c])
returns pa.DictionaryArray; dictionary-coded shards skip the per-row
label gather (codes + symbol table become the array directly)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import fastparquet_ray.codecs.strcodec as sc
from fastparquet_ray.container import ShardEncoder, decode_table
from fastparquet_ray.pipelines import decode_dataset, encode_pipeline

LABELS = [f"source-{i:02d}-" + "x" * 48 for i in range(5)]


def _shard_blob(n=4000):
    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "source": pa.array([LABELS[i % 5] for i in range(n)]),
        }
    )
    enc = ShardEncoder({}, {})
    return enc.encode_table(t, "p0"), t


def test_categories_zero_gather(monkeypatch):
    """The dict fast path must never call the gathering decoder."""
    blob, t = _shard_blob()

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("label gather ran on the categories path")

    monkeypatch.setattr(sc, "decode_any_str", boom)
    got = decode_table(blob, columns=["source"], categories=["source"])
    col = got.column("source").combine_chunks()
    assert pa.types.is_dictionary(col.type)
    assert len(col.dictionary) == 5
    assert col.cast(pa.string()).to_pylist() == t.column("source").to_pylist()


def test_categories_memory_below_gather_path():
    blob, _ = _shard_blob()
    plain = decode_table(blob, columns=["source"])
    cat = decode_table(blob, columns=["source"], categories=["source"])
    assert cat.column("source").nbytes * 5 < plain.column("source").nbytes


def test_categories_through_decode_dataset(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    n = 2000
    t = pa.table(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "source": pa.array([LABELS[i % 5] for i in range(n)]),
            "v": np.arange(n, dtype=np.int64),
        }
    )
    p = str(src / "x.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_pipeline([p], out, resume=False)
    ds = decode_dataset(out, categories=["source"])
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    assert all(
        pa.types.is_dictionary(b.column("source").type) for b in batches
    )
    got = pa.concat_tables(batches).to_pandas().sort_values("doc_id")
    assert isinstance(got["source"].dtype, pd.CategoricalDtype)
    assert got["source"].astype(str).tolist() == t.column("source").to_pylist()
