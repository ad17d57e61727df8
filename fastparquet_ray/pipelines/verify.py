"""Distributed roundtrip verification: per-row token-array equality
joined on doc_id (BASELINE.md correctness gate; reference analog: the
roundtrip assertions in
/root/reference/fastparquet/test/test_output.py:104-130).

Fully distributed: both sides map to 64-bit row fingerprints
(key + positional token hash), tagged +1 / -1, then one small groupby
checks every fingerprint group sums to zero. No driver-side
materialization of data rows.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.encode_stage import row_fingerprints
from .decode import decode_dataset


def _fp_ds(ds, side: int, key: str, list_col: str):
    import numpy as np

    def fp(batch: pa.Table) -> pa.Table:
        out = row_fingerprints(batch, key=key, list_col=list_col)
        return out.set_column(
            1, "n", pa.array(np.full(out.num_rows, side, dtype=np.int64))
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def verify_roundtrip(
    src_paths: list[str] | str,
    out_dir: str,
    key: str = "doc_id",
    list_col: str = "tokens",
) -> dict:
    """Compare source parquet vs decoded shards; returns counts."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    if isinstance(src_paths, str):
        import glob
        import os

        src_paths = sorted(glob.glob(os.path.join(src_paths, "*.parquet")))
    src = ray.data.read_parquet(src_paths, columns=[key, list_col])
    dec = decode_dataset(out_dir, columns=[key, list_col])
    tagged = _fp_ds(src, +1, key, list_col).union(
        _fp_ds(dec, -1, key, list_col)
    )
    grouped = tagged.groupby("fp").aggregate(
        Sum("n", alias_name="balance"), Count(alias_name="cnt")
    )
    bad = grouped.filter(expr="balance != 0")
    n_bad = bad.count()
    total = grouped.count()
    return {
        "fingerprint_groups": int(total),
        "mismatched_groups": int(n_bad),
        "ok": n_bad == 0,
    }
