"""Distributed roundtrip verification: per-row token-array equality
joined on doc_id (BASELINE.md correctness gate; reference analog: the
roundtrip assertions in
/root/reference/fastparquet/test/test_output.py:104-130).

Two modes, both fully distributed with no driver-side data rows:

- "moments" (default, the 100TB path): each side streams to 64-bit row
  fingerprints (key + positional token hash) and reduces them to
  order-insensitive multiset moments (count, sum, xor, sum-of-squares
  mod 2**64). Equal moments <=> equal fingerprint multisets (up to a
  ~2**-128 collision bound). NO shuffle at all.
- "exact": tag fingerprints +1/-1, union, groupby(fp), check balances —
  one all-to-all exchange; used in tests as the stronger check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.encode_stage import row_fingerprints
from .decode import decode_dataset


def _moments(ds, key: str, list_col: str) -> dict:
    def part(batch: pa.Table) -> pa.Table:
        fp = row_fingerprints(batch, key=key, list_col=list_col)
        h = fp.column("fp").to_numpy().view(np.uint64)
        return pa.table(
            {
                "cnt": pa.array([len(h)], pa.int64()),
                "sum": pa.array([int(h.sum(dtype=np.uint64))], pa.uint64()),
                "xor": pa.array(
                    [int(np.bitwise_xor.reduce(h)) if len(h) else 0],
                    pa.uint64(),
                ),
                "sq": pa.array([int((h * h).sum(dtype=np.uint64))], pa.uint64()),
            }
        )

    df = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    u64 = lambda s: int(np.sum(s.to_numpy().astype(np.uint64), dtype=np.uint64))
    return {
        "cnt": int(df["cnt"].sum()),
        "sum": u64(df["sum"]),
        "xor": int(np.bitwise_xor.reduce(df["xor"].to_numpy().astype(np.uint64)))
        if len(df)
        else 0,
        "sq": u64(df["sq"]),
    }


def verify_roundtrip(
    src_paths: list[str] | str,
    out_dir: str,
    key: str = "doc_id",
    list_col: str = "tokens",
    mode: str = "moments",
) -> dict:
    """Compare source parquet vs decoded shards; returns counts."""
    import ray.data

    if isinstance(src_paths, str):
        import glob
        import os

        if os.path.isdir(src_paths):
            src_paths = sorted(glob.glob(os.path.join(src_paths, "*.parquet")))
        else:
            src_paths = [src_paths]
    import pyarrow.parquet as pq

    schema_names = pq.read_schema(src_paths[0]).names
    if key in schema_names and list_col in schema_names:
        cols = [key, list_col]  # tokens contract: key + token arrays
    else:
        cols = list(schema_names)  # generic table: fingerprint ALL columns
    src = ray.data.read_parquet(src_paths, columns=cols)
    dec = decode_dataset(out_dir, columns=cols)

    if mode == "moments":
        a = _moments(src, key, list_col)
        b = _moments(dec, key, list_col)
        ok = a == b
        return {
            "fingerprint_groups": a["cnt"],
            "mismatched_groups": 0 if ok else -1,
            "src_moments": a,
            "dec_moments": b,
            "ok": ok,
        }

    # exact mode: one all-to-all exchange over the fingerprints
    from ray.data.aggregate import Count, Sum

    def fp_side(ds, side):
        def fp(batch: pa.Table) -> pa.Table:
            out = row_fingerprints(batch, key=key, list_col=list_col)
            return out.set_column(
                1, "n", pa.array(np.full(out.num_rows, side, dtype=np.int64))
            )

        return ds.map_batches(fp, batch_format="pyarrow")

    tagged = fp_side(src, +1).union(fp_side(dec, -1))
    grouped = tagged.groupby("fp").aggregate(
        Sum("n", alias_name="balance"), Count(alias_name="cnt")
    )

    def summarize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bad = (
            pc.sum(pc.cast(pc.not_equal(t["balance"], 0), pa.int64())).as_py()
            or 0
        )
        return pa.table({"groups": [t.num_rows], "bad": [bad]})

    parts = grouped.map_batches(summarize, batch_format="pyarrow").to_pandas()
    total = int(parts["groups"].sum())
    n_bad = int(parts["bad"].sum())
    return {
        "fingerprint_groups": total,
        "mismatched_groups": n_bad,
        "ok": n_bad == 0,
    }
