"""Sequence packing: bit-identical to the concat-then-chunk ground
truth, including under tiny blocks where one example is assembled
from 3+ boundary fragments of single-doc blocks."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions.packing import pack_sequences, pack_stats


def _ground_truth(paths, length):
    t = pa.concat_tables(
        [pq.read_table(p, columns=["doc_id", "tokens"]) for p in paths]
    )
    tdf = t.to_pandas().sort_values("doc_id")
    stream = np.concatenate(
        [np.asarray(x, dtype=np.int32) for x in tdf["tokens"]]
    )
    n_ex = len(stream) // length
    return stream[: n_ex * length].reshape(n_ex, length)


def _assert_packed_equal(ds, want, length):
    df = ds.to_pandas().sort_values("example_id").reset_index(drop=True)
    assert df["example_id"].is_unique
    assert (df["example_id"].to_numpy() == np.arange(len(df))).all()
    assert (df["tokens"].map(len) == length).all()
    got = np.stack(df["tokens"].map(np.asarray).to_numpy())
    assert got.shape == want.shape
    assert (got == want).all()


def test_pack_sequences_bit_identical(ray_session):
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf)
    want = _ground_truth(paths, 512)
    _assert_packed_equal(pack_sequences(sf, length=512), want, 512)


def test_pack_sequences_multi_fragment_examples(ray_session):
    """length far above the per-block token count: every example is
    stitched from MANY block fragments on the driver fix-up path."""
    import ray.data

    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf)
    ctx = ray.data.DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # many tiny sorted blocks
    try:
        want = _ground_truth(paths, 4096)
        _assert_packed_equal(pack_sequences(sf, length=4096), want, 4096)
    finally:
        ctx.target_max_block_size = old_target


def test_pack_stats_consistency(ray_session):
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf)
    want = _ground_truth(paths, 512)
    st = (
        pack_stats(sf, length=512)
        .to_pandas()
        .sort_values("example_id")
        .reset_index(drop=True)
    )
    assert (st["n_tok"] == 512).all()
    np.testing.assert_array_equal(
        st["tok_sum"].to_numpy(), want.astype(np.int64).sum(axis=1)
    )


def test_pack_bins_vs_duckdb(ray_session):
    import duckdb

    from fastparquet_ray.pipelines.flagship import ensure_encoded

    from fastparquet_ray.functions.packing import pack_bins

    sf = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf)
    got = pack_bins(sf, length=512)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    exp = duckdb.connect().execute(
        "WITH t AS (SELECT doc_id, n_tok, "
        "COALESCE(sum(n_tok) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev "
        f"FROM read_parquet('{glob}')) "
        "SELECT CAST(prev // 512 AS BIGINT) AS example_id, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS tok_sum "
        "FROM t GROUP BY example_id ORDER BY example_id"
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )
    # docs are conserved: every token lands in exactly one bin
    import pyarrow.parquet as pq

    total = sum(
        int(pq.read_table(p, columns=["n_tok"]).column("n_tok")
            .to_numpy().sum())
        for p in paths
    )
    assert int(got["tok_sum"].sum()) == total
    assert got["example_id"].is_monotonic_increasing


def test_chunk_windows_vs_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from fastparquet_ray.functions.packing import chunk_windows
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    sf = "/root/testdata/sf0.001"
    paths, _ = ensure_encoded(sf)
    glob = paths[0].rsplit("/", 1)[0] + "/*.parquet"
    got = (
        chunk_windows(sf, size=128, stride=64)
        .to_pandas()
        .sort_values(["doc_id", "win_idx"])
        .reset_index(drop=True)
    )
    exp = duckdb.connect().execute(
        "SELECT doc_id, CAST(s // 64 AS BIGINT) AS win_idx, "
        "CAST(least(s + 128, n_tok) - s AS BIGINT) AS win_len, "
        "CAST(list_aggregate(list_slice(tokens, s + 1, "
        "least(s + 128, n_tok)), 'sum') AS BIGINT) AS tok_sum "
        "FROM (SELECT doc_id, tokens, n_tok, "
        "unnest(generate_series(0, n_tok - 1, 64)) AS s "
        f"FROM read_parquet('{glob}')) ORDER BY doc_id, win_idx"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # overlapping stride: windows past the first overlap by half
    assert (got[got["win_idx"] > 0]["win_len"] <= 128).all()


def _greedy_serial(sizes, L):
    """Serial reference: first-fit-sequential, no splitting; returns
    (n_docs, tok_sum) per example in closing order, final open
    example included."""
    rows = []
    nd = ts = 0
    for c in sizes:
        if ts > 0 and ts + c > L:
            rows.append((nd, ts))
            nd = ts = 0
        nd += 1
        ts += c
    if nd:
        rows.append((nd, ts))
    return rows


def _check_greedy(sf, L):
    import pyarrow.parquet as pq

    from fastparquet_ray.functions.packing import pack_greedy
    from fastparquet_ray.pipelines.flagship import ensure_encoded

    paths, _ = ensure_encoded(sf)
    t = pa.concat_tables(
        [pq.read_table(p, columns=["doc_id", "n_tok"]) for p in paths]
    )
    tdf = t.to_pandas().sort_values("doc_id")
    want = _greedy_serial(tdf["n_tok"].tolist(), L)
    got = (
        pack_greedy(sf, length=L)
        .to_pandas()
        .sort_values("example_id")
        .reset_index(drop=True)
    )
    assert (got["example_id"].to_numpy() == np.arange(len(got))).all()
    assert got[["n_docs", "tok_sum"]].values.tolist() == [
        list(r) for r in want
    ]
    assert (
        got["n_pad"].to_numpy()
        == np.maximum(L - got["tok_sum"].to_numpy(), 0)
    ).all()


def test_pack_greedy_vs_serial(ray_session):
    _check_greedy("/root/testdata/sf0.001", 512)


def test_pack_greedy_oversized_docs(ray_session):
    """L below many doc sizes: oversized docs sit alone with fills
    past L carried across borders (the clamped transfer slot)."""
    _check_greedy("/root/testdata/sf0.001", 64)


def test_pack_greedy_tiny_blocks_multiblock_examples(ray_session):
    import ray.data

    ctx = ray.data.DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    try:
        _check_greedy("/root/testdata/sf0.001", 4096)
    finally:
        ctx.target_max_block_size = old_target
