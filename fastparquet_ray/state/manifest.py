"""Checkpoint manifest: per-partition lineage records + plan/symbol
sidecars, the engine's resume mechanism.

Reference analogs: the `_metadata` sidecar consolidating row-group
metadata (/root/reference/fastparquet/writer.py:1044-1047,
util.py:115-213 metadata_from_many) and `append='overwrite'`
idempotent partition replacement (writer.py:1014-1032). Here: one
JSONL line per encoded partition (partition id, shard path, codec ids,
symbol-table hashes, byte counts); a killed run resumes by pruning
finished partition ids before encoding (SURVEY.md §3.4).

All I/O goes through state.fs (fsspec), so the encoded dataset can
live on any filesystem/object store (reference S10: open_with
threading, api.py:95-103) — ``out_dir`` may be a plain path or a URI.
"""

from __future__ import annotations

import json

from ..plan import CodecPlan
from . import fs as fsmod

MANIFEST_NAME = "_manifest.jsonl"
PLAN_NAME = "_plan.json"


class Manifest:
    def __init__(self, out_dir: str, filesystem=None):
        self.out_dir = out_dir
        self.fs, self.root = fsmod.get_fs(out_dir, filesystem)
        self.path = fsmod.join(self.fs, self.root, MANIFEST_NAME)
        self.plan_path = fsmod.join(self.fs, self.root, PLAN_NAME)

    # ----- plan sidecar (includes shared symbol tables) -----

    def has_plan(self) -> bool:
        return self.fs.exists(self.plan_path)

    def write_plan(self, plan: CodecPlan) -> None:
        """Publish the plan sidecar. Symbol tables are MERGED with any
        existing sidecar's tables (old entries kept, new win on hash
        collision — hashes are content-addressed so a collision is the
        same table): an append run with a re-trained plan (vocabulary
        drift) must not orphan the table hashes that already-encoded
        shards reference, or decode of the mixed dataset would fail."""
        if self.has_plan():
            try:
                old_tables = self.load_plan().tables
            except Exception:
                old_tables = {}
            if old_tables:
                merged = CodecPlan(
                    specs=plan.specs,
                    tables={**old_tables, **plan.tables},
                    stats=plan.stats,
                    outer=plan.outer,
                )
                fsmod.atomic_write(
                    self.fs, self.plan_path, merged.to_json().encode()
                )
                return
        fsmod.atomic_write(self.fs, self.plan_path, plan.to_json().encode())

    def load_plan(self) -> CodecPlan:
        return CodecPlan.from_json(
            fsmod.read_bytes(self.fs, self.plan_path).decode()
        )

    # ----- per-partition records -----

    def load_records(self) -> dict[str, dict]:
        """partition_id -> last record (later lines win)."""
        out: dict[str, dict] = {}
        if not self.fs.exists(self.path):
            return out
        for line in fsmod.read_bytes(self.fs, self.path).decode().splitlines():
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            out[rec["partition_id"]] = rec
        return out

    def finished_ids(self) -> set[str]:
        """Partitions proven complete: manifest record with the shard
        present, PLUS any valid orphan shard (written atomically by a
        run that was killed before the driver appended its manifest
        line — shards are content-addressed and self-certifying, so
        mid-run kills lose no finished work)."""
        done = set()
        for pid, rec in self.load_records().items():
            if rec.get("status") in ("encoded", "skipped") and self.fs.exists(
                fsmod.join(self.fs, self.root, rec["shard"])
            ):
                done.add(pid)
        done |= self.valid_shard_ids()
        return done

    def _shard_glob(self) -> list[str]:
        found = set(
            self.fs.glob(fsmod.join(self.fs, self.root, "shard-*.fprs"))
        )
        # hive `key=value` layouts nest shards in partition dirs
        found |= set(
            self.fs.glob(fsmod.join(self.fs, self.root, "**", "shard-*.fprs"))
        )
        return sorted(found)

    def valid_shard_ids(self) -> set[str]:
        """Scan shard files and validate completeness (magic + header
        parse + exact file length). Atomic publish means a present,
        length-consistent shard is complete."""
        from ..container import MAGIC, read_header

        out = set()
        for path in self._shard_glob():
            try:
                with self.fs.open(path, "rb") as f:
                    head = f.read(256 * 1024)
                if head[:5] != MAGIC:
                    continue
                hlen = int.from_bytes(head[5:9], "little")
                if hlen > len(head) - 9:
                    with self.fs.open(path, "rb") as f:
                        head = f.read(9 + hlen)
                hdr = read_header(head)
                expect = 9 + hlen + hdr["enc_bytes"]
                if self.fs.size(path) == expect and hdr.get("partition_id"):
                    out.add(hdr["partition_id"])
            except Exception:
                continue
        return out

    def append(self, records: list[dict]) -> None:
        payload = "".join(
            json.dumps(rec, separators=(",", ":")) + "\n" for rec in records
        )
        if fsmod.is_local(self.fs):
            with self.fs.open(self.path, "ab") as f:
                f.write(payload.encode())
        else:
            # object stores have no append — read-modify-write the
            # (tiny, one-line-per-partition) manifest
            prior = (
                fsmod.read_bytes(self.fs, self.path)
                if self.fs.exists(self.path)
                else b""
            )
            fsmod.atomic_write(self.fs, self.path, prior + payload.encode())

    def write_records(self, records: list[dict]) -> None:
        """Atomically rewrite the manifest to EXACTLY this partition
        set (overwrite semantics, reference append='overwrite'
        writer.py:1014-1032) — stale entries from older runs with a
        different input set/configuration disappear."""
        payload = "".join(
            json.dumps(rec, separators=(",", ":")) + "\n" for rec in records
        )
        fsmod.atomic_write(self.fs, self.path, payload.encode())

    def remove_orphan_shards(self, keep_ids: set[str]) -> int:
        """Delete shard files whose partition id is not in keep_ids
        (left behind by runs over a different input set). Returns the
        number removed."""
        removed = 0
        for path in self._shard_glob():
            name = path.rsplit("/", 1)[-1]
            pid = name[len("shard-") : -len(".fprs")]
            if pid not in keep_ids:
                try:
                    self.fs.rm(path)
                    removed += 1
                except OSError:
                    pass
        return removed

    def shard_paths(self) -> list[str]:
        recs = self.load_records()
        return sorted(
            fsmod.join(self.fs, self.root, r["shard"])
            for r in recs.values()
            if r.get("status") in ("encoded", "skipped")
        )
