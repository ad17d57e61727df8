"""Distributed shuffle hash join: inner-join semantics (unmatched keys
on both sides dropped) against a pandas merge oracle on synthetic
tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fastparquet_ray.functions.relational import hash_join


def test_hash_join_matches_pandas(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 800
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["t"] * n,
            "lang": ["en"] * n,
            "source": [f"s{i % 4}" for i in range(n)],
            "n_chars": rng.integers(10, 500, n),
        }
    )
    # half the embeddings match, half point at absent ids; some docs
    # have no embedding — inner join must drop both kinds
    vec_id = np.concatenate(
        [rng.choice(n, n // 2, replace=False), np.arange(n, n + n // 2)]
    ).astype(np.int64)
    emb = pd.DataFrame(
        {
            "vec_id": vec_id,
            "embedding": [np.zeros(4, np.float32)] * vec_id.size,
            "label": (vec_id % 7).astype(np.int32),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pandas(emb), tmp_path / "embeddings.parquet")

    got = (
        hash_join(str(tmp_path))
        .to_pandas()
        .sort_values(["source", "label"])
        .reset_index(drop=True)
    )
    exp = (
        docs.merge(emb, left_on="doc_id", right_on="vec_id")
        .groupby(["source", "label"], as_index=False)
        .agg(n=("doc_id", "count"), sum_chars=("n_chars", "sum"))
        .sort_values(["source", "label"])
        .reset_index(drop=True)
    )
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["sum_chars"].tolist() == exp["sum_chars"].tolist()
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["label"].tolist() == exp["label"].tolist()
