"""Regression tests for the round-4 ADVICE findings."""
import numpy as np
import pandas as pd
import pyarrow as pa


def _flat_rebased(col: pa.ListArray):
    """The exact _flat recipe dup_ngram_spans/decontaminate use after
    the r04 fix: flatten + zero-re-based offsets."""
    flat = col.flatten().to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    return flat, offs


def test_window_hashes_sliced_listarray_rebase():
    """ADVICE r04 (medium): sliced ListArrays carry nonzero-base
    offsets while flatten() compacts — the _flat helpers must re-base
    or window->doc attribution is wrong / crashes."""
    from fastparquet_ray.functions.dedup import _window_hashes

    full = pa.array(
        [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10, 11, 12]],
        pa.list_(pa.int32()),
    )
    sliced = full.slice(1, 3)
    assert sliced.offsets.to_numpy(zero_copy_only=False)[0] != 0

    compact = pa.array(
        [[4, 5], [6, 7, 8, 9], [10, 11, 12]], pa.list_(pa.int32())
    )

    f_s, o_s = _flat_rebased(sliced)
    f_c, o_c = _flat_rebased(compact)
    h_s, d_s = _window_hashes(f_s, o_s, 2)
    h_c, d_c = _window_hashes(f_c, o_c, 2)
    np.testing.assert_array_equal(h_s, h_c)
    np.testing.assert_array_equal(d_s, d_c)
    # doc attribution: doc 0 has 1 bigram, doc 1 has 3, doc 2 has 2
    np.testing.assert_array_equal(
        np.bincount(d_s, minlength=3), [1, 3, 2]
    )


def test_cohort_retention_ns_vs_us_dtype(tmp_path, ray_session):
    """ADVICE r04 (low): cohort_retention must apply the same us/ns
    guard as its siblings; a ns-typed events table must produce the
    same weeks as a us-typed one."""
    from fastparquet_ray.functions.analytics import cohort_retention
    import pyarrow.parquet as pq

    base = 1_700_000_000  # epoch secs
    wk = 604_800
    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "ts": pd.to_datetime(
                np.array(
                    [base, base + wk, base, base + 2 * wk, base],
                    dtype="int64",
                )
                * 1_000_000_000
            ),
        }
    )
    for unit, sub in (("us", "us_dir"), ("ns", "ns_dir")):
        d = tmp_path / sub
        d.mkdir()
        t = pa.Table.from_pandas(
            rows.assign(ts=rows["ts"].astype(f"datetime64[{unit}]")),
            preserve_index=False,
        )
        pq.write_table(t, d / "events.parquet")
    out_us = cohort_retention(str(tmp_path / "us_dir"))
    out_ns = cohort_retention(str(tmp_path / "ns_dir"))
    if hasattr(out_us, "to_pandas"):
        out_us = out_us.to_pandas()
    if hasattr(out_ns, "to_pandas"):
        out_ns = out_ns.to_pandas()
    pd.testing.assert_frame_equal(
        out_us.reset_index(drop=True), out_ns.reset_index(drop=True)
    )
    # user 1 active in w0 and w1 -> retained in w0; sane magnitudes
    assert (out_us["wk"] < (1 << 20)).all()


def test_zscore_outliers_no_qualifying_users(tmp_path, ray_session):
    """ADVICE r04 (low): Flag must return zero rows (not IndexError)
    when no user passes the n>=2 & sd>0 filter."""
    from fastparquet_ray.functions.analytics import zscore_outliers
    import pyarrow.parquet as pq

    rows = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "user_id": np.array([1, 2, 3], dtype=np.int64),
            "ts": pd.to_datetime([1_700_000_000 * 10**9] * 3),
            "value": np.array([1.0, 2.0, 3.0]),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(rows, preserve_index=False),
        tmp_path / "events.parquet",
    )
    out = zscore_outliers(str(tmp_path))
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) == 0
    # Ray's to_pandas on all-empty block lists may drop column names;
    # the contract under test is "no IndexError, zero rows"
    if len(out.columns):
        assert list(out.columns) == ["event_id", "user_id", "z"]


def test_cc_distributed_nonconvergence_fallback(monkeypatch, ray_session):
    """ADVICE r04 (low): _cc_distributed with max_rounds too small to
    converge must still return the exact components (driver union-find
    fallback), not a non-star edge set."""
    import ray.data
    from fastparquet_ray.functions.graph import (
        _cc_distributed,
        _union_find,
    )

    rng = np.random.default_rng(7)
    # a long path graph needs several star rounds; max_rounds=1 won't
    # converge
    n = 64
    a = np.arange(n - 1, dtype=np.int64) * 10
    b = a + 10
    perm = rng.permutation(n - 1)
    edges = ray.data.from_pandas(
        pd.DataFrame({"a": a[perm], "b": b[perm]})
    )
    got = (
        _cc_distributed(edges, max_rounds=1)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _union_find(a, b).sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
