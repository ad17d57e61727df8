"""tz-aware timestamp round-trip (VERDICT r03 missing #1).

The reference carries timezone metadata through write/read
(fastparquet util.py:300-315, dataframe.py:246-254). Here the shard
header stores the full Arrow schema via IPC serialization, which
includes the timezone; the int codec path stores raw epoch ints in
the column unit and the decode cast restores `timestamp[unit, tz=]`.
These tests pin that contract, including stats-based shard pruning
with tz-aware filter values."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import fastparquet_ray as fr
from fastparquet_ray.container import ShardEncoder, decode_table


def _tz_table() -> pa.Table:
    base = pd.Timestamp("2024-03-10 00:30:00", tz="UTC")  # spans a US
    ts = [base + pd.Timedelta(minutes=30 * i) for i in range(200)]  # DST jump
    return pa.table(
        {
            "k": pa.array(np.arange(200, dtype=np.int64)),
            "utc_us": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
            "ny_ns": pa.array(ts, type=pa.timestamp("ns", tz="America/New_York")),
            "naive": pa.array(
                [t.tz_localize(None) for t in ts], type=pa.timestamp("us")
            ),
        }
    )


def test_container_tz_roundtrip():
    t = _tz_table()
    blob = ShardEncoder().encode_table(t)
    back = decode_table(blob)
    assert back.schema.field("utc_us").type == pa.timestamp("us", tz="UTC")
    assert back.schema.field("ny_ns").type == pa.timestamp(
        "ns", tz="America/New_York"
    )
    assert back.equals(t)


def test_container_tz_nullable_roundtrip():
    ts = pa.array(
        [pd.Timestamp("2021-06-01 12:00", tz="Europe/Berlin"), None,
         pd.Timestamp("2021-12-01 12:00", tz="Europe/Berlin")],
        type=pa.timestamp("us", tz="Europe/Berlin"),
    )
    t = pa.table({"ts": ts})
    back = decode_table(ShardEncoder().encode_table(t))
    assert back.equals(t)


def test_tz_pandas_roundtrip_and_filter(ray_session, tmp_path):
    """write -> EncodedDataset: dtype survives to pandas and tz-aware
    filter values prune/select correctly (ltype carries the tz)."""
    t = _tz_table()
    df = t.to_pandas()
    out = str(tmp_path / "enc_tz")
    fr.write(out, df)
    eds = fr.EncodedDataset(out)
    back = eds.to_pandas().sort_values("k").reset_index(drop=True)
    assert str(back["utc_us"].dtype) == "datetime64[us, UTC]"
    assert str(back["ny_ns"].dtype) == "datetime64[ns, America/New_York]"
    pd.testing.assert_frame_equal(back, df)

    cut = pd.Timestamp("2024-03-12 00:30:00", tz="UTC")
    got = eds.to_pandas(filters=[("utc_us", ">=", cut)])
    want = df[df["utc_us"] >= cut]
    assert len(got) == len(want)
    assert got["utc_us"].min() == want["utc_us"].min()
    # tz-aware value expressed in ANOTHER zone selects the same instant
    got2 = eds.to_pandas(
        filters=[("utc_us", ">=", cut.tz_convert("Asia/Tokyo"))]
    )
    assert len(got2) == len(want)


def test_tz_stats_pruning(ray_session, tmp_path):
    """An out-of-range tz-aware filter must prune every shard (header
    min/max are raw ints in the column unit; the filter value goes
    through the same unit conversion)."""
    t = _tz_table()
    out = str(tmp_path / "enc_tz2")
    fr.write(out, t.to_pandas())
    eds = fr.EncodedDataset(out)
    far = pd.Timestamp("2030-01-01", tz="UTC")
    assert len(eds.to_pandas(filters=[("utc_us", ">", far)])) == 0
