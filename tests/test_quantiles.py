"""Exact distributed quantiles (histogram rank-partition selection):
percentile_disc parity with numpy on adversarial shapes — skew, heavy
repetition, constant columns, tiny n."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions.sketches import quantiles

QS = (0.01, 0.25, 0.5, 0.75, 0.99)


def _disc(v: np.ndarray, q: float) -> float:
    s = np.sort(v)
    return float(s[max(1, int(np.ceil(q * s.size))) - 1])


def _write(tmp_path, v: np.ndarray) -> str:
    t = pa.table({"o_totalprice": pa.array(v, pa.float64())})
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


@pytest.mark.parametrize(
    "make",
    [
        lambda rng: rng.lognormal(8, 2, 5000),  # heavy right skew
        lambda rng: np.repeat([1.0, 2.0, 3.0], [4900, 90, 10]),  # repetition
        lambda rng: np.full(777, 42.5),  # constant (mn == mx fast path)
        lambda rng: rng.normal(0, 1, 7),  # tiny n
        lambda rng: np.concatenate(
            [np.full(4999, 10.0), [1e9]]
        ),  # one outlier stretches the histogram range
    ],
)
def test_quantiles_exact_vs_numpy(ray_session, tmp_path, make):
    rng = np.random.default_rng(11)
    v = np.asarray(make(rng), dtype=np.float64)
    sf_dir = _write(tmp_path, v)
    got = quantiles(sf_dir, qs=QS)
    exp = [_disc(v, q) for q in QS]
    assert got["value"].tolist() == exp
    assert got["q"].tolist() == list(QS)


def test_quantiles_ignore_nan(ray_session, tmp_path):
    v = np.array([np.nan, 5.0, 1.0, np.nan, 3.0, 2.0, 4.0])
    sf_dir = _write(tmp_path, v)
    got = quantiles(sf_dir, qs=(0.5,))
    assert got["value"].tolist() == [3.0]


def test_quantiles_cont_vs_numpy(ray_session, tmp_path):
    from fastparquet_ray.functions.sketches import quantiles_cont

    rng = np.random.default_rng(3)
    v = rng.lognormal(8, 2, 3000)
    sf_dir = _write(tmp_path, v)
    got = quantiles_cont(sf_dir, qs=QS)
    exp = [round(float(np.quantile(v, q, method="linear")), 6) for q in QS]
    np.testing.assert_allclose(got["value"].to_numpy(), exp, atol=1e-6)


def test_quantiles_cont_constant(ray_session, tmp_path):
    from fastparquet_ray.functions.sketches import quantiles_cont

    v = np.full(123, 7.5)
    sf_dir = _write(tmp_path, v)
    got = quantiles_cont(sf_dir, qs=(0.5,))
    assert got["value"].tolist() == [7.5]
