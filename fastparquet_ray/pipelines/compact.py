"""Shard compaction: merge many small shards into target-size ones.

Lakehouse maintenance analog of the reference's dataset-merge surface
(/root/reference/fastparquet/writer.py:1066-1105 merge /
api.py:1246-1283 metadata_from_many — which concatenates row-group
metadata across files); here the data itself is rewritten at the shard
level. Small shards accumulate from salted/hive splits and incremental
appends; at 100 TB a shard-per-tiny-bucket layout pays per-shard
header + symbol-table + open overhead on every read.

Design (Ray-Data-first, resume-safe):

- The frozen CodecPlan is REUSED — codec choice and shared symbol
  tables stay stable, so compaction never changes how values encode,
  only how rows group into shards.
- Bins are formed driver-side from manifest metadata only (one tiny
  row per partition): records ordered by (key_min, partition_id),
  greedily accumulated to ``target_rows``. Single-shard bins are left
  untouched byte-for-byte.
- Each bin is decoded + re-encoded INSIDE a Ray actor-pool task
  (plan tables deserialized once per actor); the driver only ever
  sees manifest records.
- New shard ids are content-derived (partition_id_for), so the op is
  idempotent; the manifest rewrite + orphan removal at the end
  publishes the new layout atomically — a killed run leaves the old
  manifest pointing at the old (still present) shards.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..container import ShardEncoder, decode_table, partition_id_for, read_header
from ..plan import CodecPlan
from ..state.manifest import Manifest
from ..stages.encode_stage import _manifest_batch


class _CompactBin:
    """Actor: decode a bin's shards, concat, re-encode as ONE shard."""

    def __init__(self, plan_json: str, out_dir: str, key_column: str):
        from ..state import fs as fsmod

        plan = CodecPlan.from_json(plan_json)
        self.tables = plan.tables
        self.encoder = ShardEncoder(plan.specs, plan.tables, outer=plan.outer)
        self.fs, self.root = fsmod.get_fs(out_dir)
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.compute as pc

        from ..state import fs as fsmod

        outs = []
        for shards_json in batch.column("shards").to_pylist():
            names = json.loads(shards_json)
            parts = [
                decode_table(
                    fsmod.read_bytes(
                        self.fs, fsmod.join(self.fs, self.root, s)
                    ),
                    self.tables,
                )
                for s in names
            ]
            merged = pa.concat_tables(parts).combine_chunks()
            pid = partition_id_for(merged)
            key_range = None
            if self.key_column in merged.column_names and merged.num_rows:
                mm = pc.min_max(merged.column(self.key_column))
                key_range = (str(mm["min"].as_py()), str(mm["max"].as_py()))
            shard = f"shard-{pid}.fprs"
            blob = self.encoder.encode_table(merged, pid)
            fsmod.atomic_write(
                self.fs,
                fsmod.join(self.fs, self.root, shard),
                blob,
                suffix=f".{os.getpid()}",
            )
            outs.append(
                _manifest_batch(
                    pid, shard, merged.num_rows, read_header(blob),
                    "encoded", key_range,
                )
            )
        return pa.concat_tables(outs)


def compact_shards(
    enc_dir: str,
    target_rows: int = 50_000,
    key_column: str = "doc_id",
    filesystem=None,
) -> dict:
    """Merge small shards into ~``target_rows``-row shards under the
    dataset's frozen plan. Returns a summary dict. Hive ``key=value``
    layouts are rejected (their shard grouping IS the layout)."""
    import ray
    import ray.data

    manifest = Manifest(enc_dir, filesystem=filesystem)
    records = manifest.load_records()
    if any("/" in r["shard"] for r in records.values()):
        raise NotImplementedError(
            "compact_shards does not support hive-partitioned layouts"
        )
    plan = manifest.load_plan()

    ordered = sorted(
        records.values(), key=lambda r: (r.get("key_min", ""), r["partition_id"])
    )
    bins: list[list[dict]] = []
    cur: list[dict] = []
    cur_rows = 0
    for r in ordered:
        cur.append(r)
        cur_rows += r["rows"]
        if cur_rows >= target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
    if cur:
        # fold a trailing undersized bin into its predecessor when that
        # keeps the merge meaningful (more than one shard either way)
        if bins and len(cur) == 1 and len(bins[-1]) > 1:
            bins[-1].extend(cur)
        else:
            bins.append(cur)

    multi = [b for b in bins if len(b) > 1]
    untouched = [r for b in bins if len(b) == 1 for r in b]
    if not multi:
        return {
            "bins": 0,
            "compacted_shards": 0,
            "partitions": len(records),
            "out_dir": enc_dir,
        }

    ds = ray.data.from_arrow(
        pa.table(
            {
                "shards": pa.array(
                    [json.dumps([r["shard"] for r in b]) for b in multi]
                )
            }
        )
    ).repartition(len(multi))
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    new_records = (
        ds.map_batches(
            _CompactBin,
            fn_constructor_kwargs={
                "plan_json": plan.to_json(),
                "out_dir": enc_dir,
                "key_column": key_column,
            },
            batch_format="pyarrow",
            batch_size=1,
            concurrency=(1, max(2, ncpu - 2)),
            num_cpus=1,
        )
        .take_all()
    )
    all_records = [dict(r) for r in new_records] + untouched
    manifest.write_records(all_records)
    orphans = manifest.remove_orphan_shards(
        {r["partition_id"] for r in all_records}
    )
    return {
        "bins": len(multi),
        "compacted_shards": sum(len(b) for b in multi),
        "partitions": len(all_records),
        "orphans_removed": orphans,
        "rows": int(sum(r["rows"] for r in all_records)),
        "out_dir": enc_dir,
    }


def optimize_layout(
    enc_dir: str,
    out_dir: str,
    cluster_by,
    key_column: str = "doc_id",
) -> dict:
    """Re-layout an EXISTING encoded dataset into a clustered (str
    ``cluster_by``) or Z-ORDERED (list) shard arrangement — the
    OPTIMIZE / OPTIMIZE ZORDER BY operation a table format runs after
    append-heavy ingestion, composed from the engine's own pieces:
    stream-decode to a temporary Parquet spill, then the standard
    encode pipeline with the requested layout, re-using the dataset's
    FROZEN codec plan (compact_shards precedent) so symbol tables —
    and therefore decoded bytes — stay identical across the rewrite.
    Returns the encode summary.

    Scale shape: both hops stream (decode writes one spill file per
    block; encode reads them back pruned to nothing extra); the only
    all-to-all is the layout sort itself. The spill doubles transient
    storage — inherent to any full re-layout (Delta/Iceberg OPTIMIZE
    rewrites files the same way)."""
    import shutil
    import tempfile

    from .encode import encode_pipeline
    from .export import export_parquet

    manifest = Manifest(enc_dir)
    plan = manifest.load_plan() if manifest.has_plan() else None
    spill = tempfile.mkdtemp(prefix="fpray_optimize_")
    try:
        # temp spill: no _metadata sidecar needed
        export_parquet(enc_dir, spill, common_metadata=False)
        return encode_pipeline(
            spill,
            out_dir,
            plan=plan,
            cluster_by=cluster_by,
            key_column=key_column,
            resume=False,
        )
    finally:
        shutil.rmtree(spill, ignore_errors=True)
