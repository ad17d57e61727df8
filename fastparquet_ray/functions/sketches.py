"""Sketch / heavy-aggregate operators for training-data pipelines.

- token_topk: exact top-k most frequent token ids across the corpus —
  per-batch bincount partials (vectorized over the flattened token
  stream) pre-shrink the shuffle to one row per (block, distinct
  token), then a groupby-sum and a tiny global top-k. SQL-checkable
  (unnest + GROUP BY), so oracle-verified.
- distinct_count_approx: HyperLogLog distinct estimate (Flajolet et
  al. 2007, public algorithm) — per-batch 2^p-register partials, a
  #blocks-bounded driver max-merge (registers are 4 KB each), never a
  value shuffle. Approximate by design -> rows-only check; accuracy
  asserted against the exact count in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def token_topk(sf_dir: str, k: int = 20):
    """Top-k token ids by total occurrence count over the encoded
    corpus (answered FROM DECODED SHARDS like the other tokens
    queries, proving the token stream roundtrip under an aggregate the
    oracle can cross-check)."""
    from ray.data.aggregate import Sum

    from ..pipelines.decode import decode_dataset
    from ..pipelines.flagship import ensure_encoded

    _, enc = ensure_encoded(sf_dir)
    ds = decode_dataset(enc, columns=["tokens"])

    def partial(t: pa.Table) -> pa.Table:
        flat = t.column("tokens").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        if flat.size == 0:
            return pa.table(
                {"tok": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        counts = np.bincount(flat)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"tok": pa.array(nz, pa.int64()),
             "n": pa.array(counts[nz], pa.int64())}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "tok"
    ).aggregate(Sum("n", alias_name="n"))
    # global top-k: per-block partial top-k, then a k*blocks-row merge
    def block_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.select_k_unstable(
            t, k, [("n", "descending"), ("tok", "ascending")]
        )
        return t.take(idx)

    parts = agg.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["n", "tok"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


_HLL_P = 12  # 4096 registers; relative error ~ 1.04/sqrt(m) ~ 1.6%


class HLLPartial:
    """Per-batch HyperLogLog registers over one column's values."""

    def __init__(self, column: str):
        self.column = column
        self.m = 1 << _HLL_P

    def __call__(self, t: pa.Table) -> pa.Table:
        vals = t.column(self.column).to_pandas().to_numpy()
        h = pd.util.hash_array(vals).astype(np.uint64)
        bucket = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
        w = h & np.uint64((1 << (64 - _HLL_P)) - 1)
        # rank = leading zeros of the (64-p)-bit remainder + 1; frexp is
        # exact below 2^53 and 64-p = 52 here
        bl = np.frexp(w.astype(np.float64))[1]
        rank = (64 - _HLL_P) - bl + 1
        regs = np.zeros(self.m, dtype=np.int64)
        np.maximum.at(regs, bucket, rank)
        return pa.table({"regs": pa.array([regs.astype(np.uint8).tobytes()])})


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear-counting small-range fix
    return float(est)


def distinct_count_approx(sf_dir: str):
    """Approximate distinct l_partkey / l_suppkey counts via HLL:
    register partials per batch, #blocks x 4 KB driver merge — the
    constant-memory alternative to the exact groupby in
    distinct_count. Rows-only check (approximate by design; accuracy
    asserted in tests)."""
    import ray.data

    out = {}
    for col in ("l_partkey", "l_suppkey"):
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=[col]
        )
        parts = ds.map_batches(
            HLLPartial,
            fn_constructor_kwargs={"column": col},
            batch_format="pyarrow",
            concurrency=(1, 2),
        ).to_pandas()  # one 4 KB row per batch
        regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
        for blob in parts["regs"]:
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
        out[col] = int(round(_hll_estimate(regs)))
    return pd.DataFrame(
        {"n_part_approx": [out["l_partkey"]], "n_supp_approx": [out["l_suppkey"]]}
    )
