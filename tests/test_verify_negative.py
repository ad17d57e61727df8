"""The correctness gate must actually FAIL on corrupted data — both
verify modes detect a single flipped token in one shard."""

import glob
import os

import numpy as np
import pytest

from fastparquet_ray.container import decode_table, ShardEncoder, read_header
from fastparquet_ray.data import write_tokens_dataset
from fastparquet_ray.pipelines import encode_pipeline, verify_roundtrip
from fastparquet_ray.state.manifest import Manifest


@pytest.mark.parametrize("mode", ["moments", "exact"])
def test_verify_detects_corruption(ray_session, tmp_path, mode):
    src = str(tmp_path / "src")
    paths = write_tokens_dataset(src, 1000, n_fragments=2)
    out = str(tmp_path / "enc")
    encode_pipeline(paths, out)
    assert verify_roundtrip(paths, out, mode=mode)["ok"]

    # corrupt: decode one shard, flip one token, re-encode in place
    shard = sorted(glob.glob(os.path.join(out, "shard-*.fprs")))[0]
    plan = Manifest(out).load_plan()
    t = decode_table(open(shard, "rb").read(), plan.tables)
    tokens = t.column("tokens").to_pylist()
    tokens[0] = list(tokens[0])
    tokens[0][0] = (tokens[0][0] + 1) % 50257
    import pyarrow as pa

    t2 = t.set_column(
        t.column_names.index("tokens"),
        "tokens",
        pa.array(tokens, pa.list_(pa.int32())),
    )
    hdr = read_header(open(shard, "rb").read())
    enc = ShardEncoder(plan.specs, plan.tables, outer=plan.outer)
    with open(shard, "wb") as f:
        f.write(enc.encode_table(t2, hdr["partition_id"]))

    res = verify_roundtrip(paths, out, mode=mode)
    assert not res["ok"]
