"""embedding_centroids (vector sufficient-statistic aggregate) and
dup_ngram_spans (windowed substring-dedup approximation) vs numpy /
DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fastparquet_ray.functions.dedup import _window_hashes, dup_ngram_spans
from fastparquet_ray.functions.similarity import embedding_centroids


def test_embedding_centroids(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n, d = 700, 16
    emb = rng.normal(0, 1, (n, d)).astype(np.float32)
    labels = rng.integers(0, 5, n).astype(np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet", row_group_size=128)

    got = (
        embedding_centroids(str(tmp_path))
        .to_pandas()
        .sort_values(["label", "pos"])
        .reset_index(drop=True)
    )
    assert len(got) == 5 * d
    for lab in range(5):
        exp = emb[labels == lab].astype(np.float64).mean(axis=0)
        sub = got[got["label"] == lab].sort_values("pos")
        np.testing.assert_allclose(sub["mean"].to_numpy(), exp, atol=1e-6)
        assert sub["pos"].tolist() == list(range(1, d + 1))


def test_window_hashes_mask_and_equality():
    """Windows never straddle documents; equal content hashes equal."""
    docA = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    docB = np.array([9, 9, 1, 2, 3, 4, 5], dtype=np.int64)
    flat = np.concatenate([docA, docB])
    offs = np.array([0, 5, 12], dtype=np.int64)
    h, di = _window_hashes(flat, offs, 3)
    # doc 0: 3 windows, doc 1: 5 windows — none across the boundary
    assert di.tolist() == [0, 0, 0, 1, 1, 1, 1, 1]
    hA = h[di == 0]
    hB = h[di == 1]
    # docB's last 3 windows are docA's 3 windows
    assert hA.tolist() == hB[-3:].tolist()
    # and the shared-content hashes differ from the 9,9,1-ish windows
    assert len(set(h.tolist())) == 5


def test_dup_ngram_spans_vs_duckdb(ray_session):
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    got = (
        dup_ngram_spans(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        "WITH w AS (SELECT doc_id, list_slice(tokens, g, g + 7) AS win "
        "FROM (SELECT doc_id, tokens, "
        "unnest(generate_series(1, len(tokens) - 7)) AS g "
        f"FROM read_parquet('{glob}') WHERE len(tokens) >= 8)), "
        "d AS (SELECT win FROM w GROUP BY win "
        "HAVING count(DISTINCT doc_id) >= 2) "
        "SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows, "
        "CAST(count(d.win) AS BIGINT) AS n_dup "
        "FROM w LEFT JOIN d ON w.win = d.win GROUP BY w.doc_id "
        "ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_windows"].tolist() == exp["n_windows"].tolist()
    assert got["n_dup"].tolist() == exp["n_dup"].tolist()


def test_decontaminate_vs_duckdb(ray_session):
    """Eval-split n-gram decontamination vs the literal-window DuckDB
    join on the sf0.001 tokens corpus (short docs with < w tokens are
    excluded on both sides; eval docs never appear in the output)."""
    from fastparquet_ray.functions.dedup import decontaminate
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf_dir = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf_dir)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    got = (
        decontaminate(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        "WITH w AS (SELECT doc_id, list_slice(tokens, g, g + 7) AS win "
        "FROM (SELECT doc_id, tokens, "
        "unnest(generate_series(1, len(tokens) - 7)) AS g "
        f"FROM read_parquet('{glob}') WHERE len(tokens) >= 8)), "
        "ev AS (SELECT DISTINCT win FROM w "
        "WHERE CAST(right(doc_id, 12) AS BIGINT) % 29 = 0) "
        "SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows, "
        "CAST(count(ev.win) AS BIGINT) AS n_hits "
        "FROM w LEFT JOIN ev ON w.win = ev.win "
        "WHERE CAST(right(w.doc_id, 12) AS BIGINT) % 29 <> 0 "
        "GROUP BY w.doc_id HAVING count(ev.win) > 0 ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_windows"].tolist() == exp["n_windows"].tolist()
    assert got["n_hits"].tolist() == exp["n_hits"].tolist()
    # no eval doc leaks into the contaminated-train report
    assert (got["doc_id"].str[-12:].astype(int) % 29 != 0).all()
