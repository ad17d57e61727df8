"""Checkpoint manifest: per-partition lineage records + plan/symbol
sidecars, the engine's resume mechanism.

Reference analogs: the `_metadata` sidecar consolidating row-group
metadata (/root/reference/fastparquet/writer.py:1044-1047,
util.py:115-213 metadata_from_many) and `append='overwrite'`
idempotent partition replacement (writer.py:1014-1032). Here: one
JSONL line per encoded partition (partition id, shard path, codec ids,
symbol-table hashes, byte counts); a killed run resumes by pruning
finished partition ids before encoding (SURVEY.md §3.4).
"""

from __future__ import annotations

import json
import os

from ..plan import CodecPlan

MANIFEST_NAME = "_manifest.jsonl"
PLAN_NAME = "_plan.json"


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, MANIFEST_NAME)
        self.plan_path = os.path.join(out_dir, PLAN_NAME)

    # ----- plan sidecar (includes shared symbol tables) -----

    def has_plan(self) -> bool:
        return os.path.exists(self.plan_path)

    def write_plan(self, plan: CodecPlan) -> None:
        tmp = self.plan_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(plan.to_json())
        os.replace(tmp, self.plan_path)

    def load_plan(self) -> CodecPlan:
        with open(self.plan_path) as f:
            return CodecPlan.from_json(f.read())

    # ----- per-partition records -----

    def load_records(self) -> dict[str, dict]:
        """partition_id -> last record (later lines win)."""
        out: dict[str, dict] = {}
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                out[rec["partition_id"]] = rec
        return out

    def finished_ids(self) -> set[str]:
        """Partitions proven complete: manifest record with the shard
        on disk, PLUS any valid orphan shard (written atomically by a
        run that was killed before the driver appended its manifest
        line — shards are content-addressed and self-certifying, so
        mid-run kills lose no finished work)."""
        done = set()
        for pid, rec in self.load_records().items():
            if rec.get("status") in ("encoded", "skipped") and os.path.exists(
                os.path.join(self.out_dir, rec["shard"])
            ):
                done.add(pid)
        done |= self.valid_shard_ids()
        return done

    def valid_shard_ids(self) -> set[str]:
        """Scan shard files and validate completeness (magic + header
        parse + exact file length). Atomic rename means a present,
        length-consistent shard is complete."""
        import glob

        from ..container import MAGIC, read_header

        out = set()
        for path in glob.glob(os.path.join(self.out_dir, "shard-*.fprs")):
            try:
                with open(path, "rb") as f:
                    head = f.read(256 * 1024)
                if head[:5] != MAGIC:
                    continue
                hlen = int.from_bytes(head[5:9], "little")
                if hlen > len(head) - 9:
                    with open(path, "rb") as f:
                        head = f.read(9 + hlen)
                hdr = read_header(head)
                expect = 9 + hlen + hdr["enc_bytes"]
                if os.path.getsize(path) == expect and hdr.get("partition_id"):
                    out.add(hdr["partition_id"])
            except Exception:
                continue
        return out

    def append(self, records: list[dict]) -> None:
        with open(self.path, "a") as f:
            for rec in records:
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")

    def write_records(self, records: list[dict]) -> None:
        """Atomically rewrite the manifest to EXACTLY this partition
        set (overwrite semantics, reference append='overwrite'
        writer.py:1014-1032) — stale entries from older runs with a
        different input set/configuration disappear."""
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for rec in records:
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
        os.replace(tmp, self.path)

    def remove_orphan_shards(self, keep_ids: set[str]) -> int:
        """Delete shard files whose partition id is not in keep_ids
        (left behind by runs over a different input set). Returns the
        number removed."""
        import glob

        from ..container import read_header

        removed = 0
        for path in glob.glob(os.path.join(self.out_dir, "shard-*.fprs")):
            pid = os.path.basename(path)[len("shard-") : -len(".fprs")]
            if pid not in keep_ids:
                try:
                    os.remove(path)
                    removed += 1
                except OSError:
                    pass
        return removed

    def shard_paths(self) -> list[str]:
        recs = self.load_records()
        return sorted(
            os.path.join(self.out_dir, r["shard"])
            for r in recs.values()
            if r.get("status") in ("encoded", "skipped")
        )
