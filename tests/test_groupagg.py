"""merge_partials: driver and sort modes agree with a plain pandas
groupby at every cardinality shape, including boundary-straddling
groups under the range sort."""

import numpy as np
import pandas as pd
import pytest

from fastparquet_ray.functions.groupagg import merge_partials


def _expected(df, keys, ops):
    return (
        df.groupby(keys, as_index=False).agg(ops)
        .sort_values(keys)
        .reset_index(drop=True)
    )


def _check(got, want):
    got = got.sort_values(list(want.columns[:1])).reset_index(drop=True)
    got = got[want.columns]
    pd.testing.assert_frame_equal(
        got.sort_values(list(want.columns)).reset_index(drop=True),
        want.sort_values(list(want.columns)).reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.parametrize("mode", ["driver", "sort", "auto"])
def test_merge_modes_match_pandas(ray_session, rng, mode):
    import ray.data

    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 500, n),
            "s": rng.normal(size=n),
            "m": rng.integers(-1000, 1000, n),
        }
    )
    ops = {"s": "sum", "m": "min"}
    # partial per block first (the module contract)
    ds = ray.data.from_pandas(
        [df.iloc[i : i + 1000] for i in range(0, n, 1000)]
    )
    parts = ds.map_batches(
        lambda d: d.groupby("k", as_index=False).agg(ops),
        batch_format="pandas",
    )
    got = merge_partials(parts, ["k"], ops, mode=mode)
    want = _expected(df, ["k"], ops)
    got["s"] = got["s"].round(6)
    want["s"] = want["s"].round(6)
    _check(got, want)


def test_merge_multikey_max(ray_session, rng):
    import ray.data

    df = pd.DataFrame(
        {
            "a": rng.integers(0, 20, 5000),
            "b": rng.integers(0, 7, 5000),
            "v": rng.integers(0, 10**9, 5000),
        }
    )
    ops = {"v": "max"}
    ds = ray.data.from_pandas(
        [df.iloc[i : i + 500] for i in range(0, 5000, 500)]
    )
    parts = ds.map_batches(
        lambda d: d.groupby(["a", "b"], as_index=False).agg(ops),
        batch_format="pandas",
    )
    for mode in ("driver", "sort"):
        got = merge_partials(parts, ["a", "b"], ops, mode=mode)
        _check(got, _expected(df, ["a", "b"], ops))


def test_merge_rejects_unknown_op(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    with pytest.raises(ValueError):
        merge_partials(ds, ["k"], {"v": "mean"})


def test_auto_over_cap_bails_to_sort(ray_session, rng):
    """auto must abandon the streaming driver fold the moment the
    running group count exceeds driver_row_cap and still return the
    exact answer through the sort path."""
    import ray.data

    n = 5_000
    df = pd.DataFrame(
        {
            "k": np.arange(n) % 2_000,  # 2000 groups > cap of 50
            "s": rng.normal(size=n),
        }
    )
    parts = ray.data.from_pandas(df).repartition(8)
    got = merge_partials(
        parts, ["k"], {"s": "sum"}, mode="auto", driver_row_cap=50
    )
    want = _expected(df, ["k"], {"s": "sum"})
    _check(got, want)


def test_auto_empty_input(ray_session):
    import ray.data

    parts = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series([], dtype="int64"),
                      "s": pd.Series([], dtype="float64")})
    )
    got = merge_partials(parts, ["k"], {"s": "sum"}, mode="auto")
    assert len(got) == 0
    assert list(got.columns) == ["k", "s"]
