"""Ray Data datasource for .fprs shard files — the engine's native
read path (reference analog: ParquetFile + to_pandas,
/root/reference/fastparquet/api.py:95-162/387-475, re-expressed as a
FileBasedDatasource so shards stream through the normal read operator
with per-file parallelism, column projection at decode, and lineage-
based retry for free).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from ray.data.datasource import FileBasedDatasource

from ..container import decode_table

if TYPE_CHECKING:
    import pyarrow


class FprsDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["fprs"]

    def __init__(
        self,
        paths,
        tables: dict[str, bytes] | None = None,
        columns: list[str] | None = None,
        hive: str | None = None,
        categories: list[str] | None = None,
        **kwargs,
    ):
        super().__init__(paths, **kwargs)
        self._tables = tables or {}
        self._columns = columns
        self._categories = categories
        # hive = dataset ROOT path: `key=value` components BELOW it are
        # partition dirs (None disables hive parsing)
        self._hive = hive

    def _read_stream(
        self, f: "pyarrow.NativeFile", path: str
    ) -> Iterator["pyarrow.Table"]:
        blob = f.readall()
        if self._hive is None:
            yield decode_table(
                blob, self._tables, columns=self._columns,
                categories=self._categories,
            )
            return
        # hive layout: `key=value` path components are typed partition
        # columns, not stored in the shard (reference paths_to_cats,
        # api.py:700-758)
        from ..pipelines.hive import attach_hive_columns, parse_hive_parts

        rel = path
        root = self._hive.rstrip("/")
        if rel.startswith(root):
            rel = rel[len(root):]
        parts = parse_hive_parts(rel)
        stored = (
            None
            if self._columns is None
            else [c for c in self._columns if c not in parts]
        )
        t = decode_table(
            blob, self._tables, columns=stored,
            categories=self._categories,
        )
        yield attach_hive_columns(t, parts, self._columns)


def read_fprs(
    paths: list[str] | str,
    tables: dict[str, bytes] | None = None,
    columns: list[str] | None = None,
    concurrency=None,
    filesystem=None,
    hive: str | None = None,
    categories: list[str] | None = None,
):
    """ray.data Dataset over shard files (one read task per shard).
    ``filesystem`` may be an fsspec filesystem (wrapped for pyarrow) or
    a pyarrow FileSystem — reference S10 remote-FS analog. ``hive``
    (the dataset root path) parses `key=value` components below it
    into typed partition columns."""
    import ray.data

    if filesystem is not None and not hasattr(filesystem, "type_name"):
        # fsspec -> pyarrow wrapper (Ray Data wants pyarrow.fs)
        from ..state.fs import to_pyarrow_fs

        filesystem = to_pyarrow_fs(filesystem)
    return ray.data.read_datasource(
        FprsDatasource(
            paths, tables=tables, columns=columns, hive=hive,
            categories=categories, filesystem=filesystem,
        ),
        concurrency=concurrency,
    )
