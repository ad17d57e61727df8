"""User-facing API mirroring the reference's surface so a fastparquet
user can switch pipelines with minimal changes:

    reference                           this engine
    ---------                           -----------
    write(fn, df, compression=...)      write(out_dir, df, outer=...,
      (writer.py:810-1049)                column_codecs=..., partition_on=...)
    ParquetFile(fn)                     EncodedDataset(out_dir)
      .to_pandas(columns=...)             .to_pandas(columns=...)
      (api.py:387-475)
      .iter_row_groups()                  .iter_batches()
      (api.py:321-337)
      .head(n) (api.py:231-250)           .head(n)
      .count() (api.py:512-525)           .count()
      .statistics (api.py:822-902)        .statistics()
      .info / .columns                    .info / .columns

Everything is backed by the Ray Data pipelines (streaming, distributed)
— Ray must already be initialised by the caller (or Ray Data will
auto-init a local session on first use).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Iterator

import pandas as pd
import pyarrow as pa

from .container import read_header
from .pipelines.decode import decode_dataset, shard_files
from .pipelines.encode import encode_pipeline
from .pipelines.export import shard_statistics
from .pipelines.verify import verify_roundtrip
from .state.manifest import Manifest


def write(
    out_dir: str,
    data: "pd.DataFrame | pa.Table | str | list[str]",
    outer: str | None = None,
    column_codecs: dict | None = None,
    partition_on_source: "bool | str" = False,
    resume: bool = True,
    hive_cols: list[str] | None = None,
    filesystem=None,
    write_index: bool = False,
) -> dict:
    """Encode a table (or existing parquet path(s)) into an encoded
    shard dataset with manifest. Returns the job summary.

    partition_on_source: True -> write-side "local" bucket split
    (source-pure shards, ZERO network exchange — the measured scale
    default; the salted groupby costs ~5x, BENCH r01); pass "shuffle"
    explicitly for the one-shard-per-bucket salted groupby layout.

    write_index: materialize a DataFrame's index as ordinary columns
    and record them in a ``_pandas.json`` sidecar so
    ``EncodedDataset.to_pandas()`` restores the index (reference
    write_index, writer.py:938-953; read back api.py:556-604).
    Ray blocks don't carry pandas schema metadata, so the sidecar —
    not the per-shard Arrow schema — is the contract here."""
    index_meta = None
    if partition_on_source is True:
        partition_on_source = "local"
    elif partition_on_source == "shuffle":
        partition_on_source = True
    if isinstance(data, (str, list)):
        paths = data
    else:
        if isinstance(data, pd.DataFrame):
            table = pa.Table.from_pandas(data, preserve_index=write_index)
            if write_index:
                pmd = table.schema.pandas_metadata or {}
                idx_cols = [
                    c for c in pmd.get("index_columns", [])
                    if isinstance(c, str)  # RangeIndex descriptors are dicts
                ]
                if idx_cols:
                    names = {
                        c["field_name"]: c["name"]
                        for c in pmd.get("columns", [])
                        if c.get("field_name") in idx_cols
                    }
                    index_meta = {
                        "index_columns": idx_cols,
                        "index_names": [names.get(c) for c in idx_cols],
                    }
        else:
            table = data
        tmp = tempfile.mkdtemp(prefix="fpray_write_")
        import pyarrow.parquet as pq

        src = os.path.join(tmp, "input-00000.parquet")
        pq.write_table(table, src, compression="none")
        paths = [src]
    summary = encode_pipeline(
        paths,
        out_dir,
        resume=resume,
        outer=outer,
        column_codecs=column_codecs,
        partition_by_source=partition_on_source,
        hive_cols=hive_cols,
        filesystem=filesystem,
    )
    if not isinstance(data, (str, list)):
        import json

        from .state import fs as fsmod

        fs, root = fsmod.get_fs(out_dir, filesystem)
        sidecar = root.rstrip("/") + "/_pandas.json"
        if index_meta is not None:
            fsmod.atomic_write(fs, sidecar, json.dumps(index_meta).encode())
        else:
            try:  # overwrite without write_index: drop a stale sidecar
                fs.rm(sidecar)
            except (FileNotFoundError, OSError):
                pass
    return summary


def write_simple(
    path: str,
    data: "pd.DataFrame | pa.Table",
    outer: str | None = None,
    write_index: bool = False,
) -> dict:
    """Single-file writer (reference S6: write_simple,
    writer.py:773-807): the whole table becomes ONE self-describing
    shard blob — no manifest, no Ray job; for small side tables and
    interchange. Read back with :func:`read_simple`. Any filesystem
    URI works (fs layer). ``write_index`` preserves a DataFrame index
    through the shard header's pandas schema metadata."""
    from .container import ShardEncoder, partition_id_for, read_header
    from .state import fs as fsmod

    table = (
        pa.Table.from_pandas(data, preserve_index=write_index)
        if isinstance(data, pd.DataFrame)
        else data
    )
    spec = None
    if outer:
        name, _, lvl = outer.partition(":")
        spec = (name, int(lvl) if lvl else None)
    blob = ShardEncoder(outer=spec).encode_table(
        table, partition_id_for(table)
    )
    fs, rp = fsmod.get_fs(path)
    fsmod.atomic_write(fs, rp, blob)
    hdr = read_header(blob)
    return {
        "rows": hdr["num_rows"],
        "raw_bytes": hdr["raw_bytes"],
        "enc_bytes": hdr["enc_bytes"],
        "path": path,
    }


def read_simple(path: str, columns: list[str] | None = None) -> pa.Table:
    """Read a :func:`write_simple` file back into an Arrow table."""
    from .container import decode_table
    from .state import fs as fsmod

    fs, rp = fsmod.get_fs(path)
    return decode_table(fsmod.read_bytes(fs, rp), columns=columns)


class EncodedDataset:
    """Reader over an encoded dataset directory (shards + manifest),
    the `ParquetFile` analog."""

    def __init__(self, out_dir: str, filesystem=None):
        self.out_dir = out_dir
        # explicit fsspec instance (e.g. state.s3compat) wins over URI
        # protocol resolution — reference S10 open_with analog
        self.filesystem = filesystem
        self.manifest = Manifest(out_dir, filesystem=filesystem)
        self._paths = shard_files(out_dir, filesystem=filesystem)
        if not self._paths:
            raise FileNotFoundError(f"no shards under {out_dir}")

    # ----- metadata (no data read) -----

    @property
    def columns(self) -> list[str]:
        hdr = self._first_header()
        return [c["name"] for c in hdr["columns"]]

    @property
    def schema(self) -> pa.Schema:
        """Arrow schema from the first shard header (no data read) —
        reference ParquetFile.schema analog (api.py:529-536)."""
        import base64

        hdr = self._first_header()
        return pa.ipc.read_schema(
            pa.py_buffer(base64.b64decode(hdr["schema"]))
        )

    @property
    def dtypes(self) -> dict:
        """column -> pandas dtype, metadata-only — reference
        ParquetFile.dtypes analog (api.py:538-555)."""
        return {
            f.name: f.type.to_pandas_dtype() for f in self.schema
        }

    @property
    def info(self) -> dict:
        recs = self.manifest.load_records()
        return {
            "partitions": len(self._paths),
            "rows": sum(r.get("rows", 0) for r in recs.values()),
            "raw_bytes": sum(r.get("raw_bytes", 0) for r in recs.values()),
            "enc_bytes": sum(r.get("enc_bytes", 0) for r in recs.values()),
            "columns": self.columns,
        }

    def _first_header(self) -> dict:
        from .state import fs as fsmod

        fs, rp = fsmod.get_fs(self._paths[0], self.filesystem)
        return read_header(fsmod.read_header_bytes(fs, rp))

    def count(self) -> int:
        recs = self.manifest.load_records()
        if recs:
            return sum(r.get("rows", 0) for r in recs.values())
        from .state import fs as fsmod

        total = 0
        for p in self._paths:
            fs, rp = fsmod.get_fs(p, self.filesystem)
            total += read_header(fsmod.read_header_bytes(fs, rp))["num_rows"]
        return total

    def statistics(self) -> pd.DataFrame:
        return shard_statistics(self.out_dir)

    # ----- data reads (streaming Ray pipelines) -----

    def dataset(
        self,
        columns: list[str] | None = None,
        filters=None,
        categories: list[str] | None = None,
    ):
        """The underlying ray.data.Dataset (lazy, streaming).
        ``filters``: [(col, op, val)] conjunctions with shard-stats
        pruning (the reference's to_pandas(filters=...) analog,
        api.py:948-999). ``categories``: string columns returned as
        DictionaryArray without a label gather (reference categories=,
        api.py:387-475)."""
        return decode_dataset(
            self.out_dir, columns=columns, filters=filters,
            categories=categories, filesystem=self.filesystem,
        )

    def to_pandas(
        self, columns: list[str] | None = None, filters=None,
        categories: list[str] | None = None,
    ) -> pd.DataFrame:
        """Full materializing read — small datasets / tests only (the
        reference's to_pandas is the same contract). Gathers through
        Arrow batches: pyarrow's to_pandas handles ragged list / nested
        columns that Ray's TensorArray conversion rejects.
        ``categories`` columns come back as pandas.Categorical."""
        batches = list(
            self.dataset(columns, filters=filters, categories=categories)
            .iter_batches(batch_format="pyarrow")
        )
        if not batches:
            return pd.DataFrame()
        df = pa.concat_tables(batches).to_pandas()
        return self._restore_index(df)

    def _restore_index(self, df: pd.DataFrame) -> pd.DataFrame:
        """Re-apply a write(write_index=True) index from the
        ``_pandas.json`` sidecar (reference pandas-metadata read-back,
        api.py:556-604). Skipped when a projection dropped the index
        columns."""
        import json

        from .state import fs as fsmod

        fs, root = fsmod.get_fs(self.out_dir, self.filesystem)
        sidecar = root.rstrip("/") + "/_pandas.json"
        try:
            meta = json.loads(fsmod.read_bytes(fs, sidecar))
        except (FileNotFoundError, OSError):
            return df
        cols = meta.get("index_columns", [])
        if not cols or not set(cols) <= set(df.columns):
            return df
        df = df.set_index(cols)
        df.index.names = meta.get("index_names", [None] * len(cols))
        return df

    def iter_batches(
        self,
        columns: list[str] | None = None,
        batch_size: int | None = None,
        filters=None,
    ) -> Iterator[pa.Table]:
        """Streaming batches (reference S3 iter_row_groups,
        api.py:321-337, including its filters= support)."""
        yield from self.dataset(columns, filters=filters).iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        )

    def head(
        self, n: int = 5, columns: list[str] | None = None, filters=None
    ) -> pd.DataFrame:
        return self.dataset(columns, filters=filters).limit(n).to_pandas()

    def take_range(
        self, start: int, stop: int, columns: list[str] | None = None
    ) -> pd.DataFrame:
        """Rows [start, stop) of the key-sorted corpus by GLOBAL ROW
        POSITION (clustered layouts only): manifest row-count
        arithmetic locates the overlapping shards, nothing else is
        decoded — the dataloader-resume primitive."""
        from .pipelines.decode import take_row_range

        return take_row_range(
            self.out_dir, start, stop, columns=columns,
            filesystem=self.filesystem,
        )

    def __len__(self) -> int:
        return len(self._paths)

    def __getitem__(self, key):
        """Shard-subset dataset (reference S4: ParquetFile.__getitem__
        row-group slicing, api.py:251-263) — ``eds[2:5]`` is a lazy
        Dataset over shards 2..4 only."""
        from .sources.fprs import read_fprs

        paths = self._paths[key] if isinstance(key, slice) else [self._paths[key]]
        tables = (
            self.manifest.load_plan().tables if self.manifest.has_plan() else {}
        )
        return read_fprs(paths, tables=tables)

    def verify_against(self, src_paths: list[str] | str) -> dict:
        return verify_roundtrip(src_paths, self.out_dir)


def read_jsonl(path: str, columns: list[str] | None = None):
    """Lazy ray.data.Dataset over JSON-Lines files (a file, a dir, or
    a glob) — the ingest side of ``pipelines.export.export_jsonl``.
    List columns come back as Arrow lists; integer payloads roundtrip
    losslessly."""
    import ray.data

    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds
