"""Foreign-table conformance (SURVEY.md §5 layer 3): encode/decode the
driver-generated testdata tables — written by an external writer, with
timestamps, nulls, float lists, strings — and require exact equality.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.container import ShardEncoder, decode_table
from fastparquet_ray.plan import train_plan

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.mark.parametrize("table", TABLES)
def test_testdata_roundtrip(table):
    t = pq.read_table(os.path.join(SF_DIR, f"{table}.parquet"))
    t = pa.table({n: t.column(n) for n in t.column_names})  # drop metadata
    plan = train_plan(t.slice(0, min(500, t.num_rows)))
    enc = ShardEncoder(plan.specs, plan.tables)
    blob = enc.encode_table(t, table)
    out = decode_table(blob, plan.tables)
    assert out.schema == t.schema
    assert out.equals(t)


@pytest.mark.parametrize("table", ["lineitem", "documents"])
def test_testdata_roundtrip_zstd(table):
    t = pq.read_table(os.path.join(SF_DIR, f"{table}.parquet"))
    t = pa.table({n: t.column(n) for n in t.column_names})
    plan = train_plan(t.slice(0, 500))
    enc = ShardEncoder(plan.specs, plan.tables, outer=("zstd", 3))
    blob = enc.encode_table(t, table)
    assert decode_table(blob, plan.tables).equals(t)
    assert len(blob) < t.nbytes


def test_all_tables_full_pipeline_verify(ray_session, tmp_path):
    """Every testdata table through the FULL Ray pipeline (encode ->
    shards+manifest -> decode) with the generic all-columns fingerprint
    verify (exact mode) — the strongest cross-table conformance
    statement: per-row content equality for every column of every
    table."""
    from fastparquet_ray.pipelines import encode_pipeline, verify_roundtrip

    for table in TABLES:
        src = os.path.join(SF_DIR, f"{table}.parquet")
        out = str(tmp_path / f"enc_{table}")
        s = encode_pipeline([src], out)
        assert s["rows"] == pq.read_metadata(src).num_rows, table
        res = verify_roundtrip(src, out, mode="exact")
        assert res["ok"], (table, res)
