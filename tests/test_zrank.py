"""zrank codec (round 3): frequency-ranked dict + zstd entropy stage
over the rank codes — the entropy stage lightweight codecs lack. On
the flagship zipf token stream it measures ~2.7x smaller than DICT2
(3.7 vs 9.9 bits/token) and drops the tokens-table shard ratio from
0.30 to ~0.115."""

import numpy as np
import pytest

from fastparquet_ray.codecs import intcodec as ic
from fastparquet_ray.plan import _pick_int_codec


def _zipf_tokens(n=200_000, vocab=4000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n).clip(1, vocab).astype(np.int32)


@pytest.mark.parametrize(
    "arr",
    [
        np.array([], np.int32),
        np.array([7], np.int64),
        np.array([-5, -5, -5, 9] * 500, np.int32),
        np.arange(70_000, dtype=np.int64),  # >65536 distinct -> u32 codes
        np.array([2**40, -(2**40), 0] * 100, np.int64),
    ],
    ids=["empty", "single", "dups", "wide-vocab", "64bit"],
)
def test_zrank_roundtrip(arr):
    b = ic.encode_zrank_int(arr)
    got = ic.decode_any_int(b)
    assert got.dtype == arr.dtype
    assert (got == arr).all()


def test_zrank_deterministic():
    v = _zipf_tokens()
    assert ic.encode_zrank_int(v) == ic.encode_zrank_int(v.copy())


def test_zrank_beats_dict2_on_zipf():
    v = _zipf_tokens()
    z = len(ic.encode_zrank_int(v))
    d2 = len(ic.encode_dict2_int(v))
    # iid zipf: ~0.68x (zeroth-order entropy only); real token streams
    # with context repeats measure ~0.37x (sf0.1 shard: 3.7 vs 9.9
    # bits/token)
    assert z < d2 * 0.75


def test_plan_picks_zrank_for_zipf_tokens():
    codec, stats = _pick_int_codec(_zipf_tokens())
    assert codec == "zrank"
    assert stats["n_distinct_sample"] < 5000


def test_plan_still_picks_cheap_codec_for_sequential():
    codec, _ = _pick_int_codec(np.arange(100_000, dtype=np.int64))
    assert codec in ("delta", "for_bp")  # zrank must not win here
