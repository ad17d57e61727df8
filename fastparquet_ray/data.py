"""Deterministic synthetic tokens table (FIXTURES.md F1, BASELINE.json
input_hint): doc_id:string, tokens:list<int32>, n_tok:int32,
source:string. Seeded per fragment so generation is reproducible and
fragments are independent (generation can be distributed).

Token streams are Zipf-ish over vocab 0..50256 with geometric runs so
RLE / dict / FOR all win on some partitions; `source` is drawn with
skewed weights to drive the salting/skew path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = np.array(["web", "books", "code", "wiki", "forums"])
DEFAULT_WEIGHTS = (0.70, 0.12, 0.10, 0.05, 0.03)
SKEWED_WEIGHTS = (0.95, 0.02, 0.01, 0.01, 0.01)  # FIXTURES F5


def generate_fragment(
    n_rows: int,
    fragment_idx: int = 0,
    seed: int = 42,
    weights: tuple = DEFAULT_WEIGHTS,
    start_id: int = 0,
) -> pa.Table:
    """One deterministic fragment of the tokens table."""
    rng = np.random.default_rng([seed, fragment_idx])
    n_tok = np.clip(
        rng.lognormal(mean=5.0, sigma=0.8, size=n_rows), 1, 2048
    ).astype(np.int32)
    total = int(n_tok.sum())
    # runs of zipf-ish values: ranks ~ zipf(1.5) -> token ids
    m = total // 3 + 64
    while True:
        ranks = np.minimum(rng.zipf(1.5, size=m), VOCAB) - 1
        run_lens = rng.geometric(0.3, size=m)
        if run_lens.sum() >= total:
            break
        m *= 2
    flat = np.repeat(ranks.astype(np.int32), run_lens)[:total]
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
    )
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=weights)
    source = SOURCES[src_idx]
    ids = np.arange(start_id, start_id + n_rows)
    doc_id = np.char.add(
        np.char.add(source, "/doc-"),
        np.char.zfill(ids.astype("U12"), 12),
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(source, pa.string()),
        }
    )


def write_tokens_dataset(
    out_dir: str,
    n_rows: int,
    n_fragments: int = 8,
    seed: int = 42,
    weights: tuple = DEFAULT_WEIGHTS,
    overwrite: bool = False,
) -> list[str]:
    """Write the table as ``n_fragments`` parquet files; returns paths.
    Skips generation when the directory already holds the files (the
    generator is deterministic, so cached fragments are valid)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"tokens-{i:05d}.parquet")
        for i in range(n_fragments)
    ]
    per = [n_rows // n_fragments] * n_fragments
    per[-1] += n_rows - sum(per)
    start = 0
    for i, (path, rows) in enumerate(zip(paths, per)):
        if overwrite or not os.path.exists(path):
            t = generate_fragment(
                rows, fragment_idx=i, seed=seed, weights=weights, start_id=start
            )
            pq.write_table(t, path + ".tmp", compression="none")
            os.replace(path + ".tmp", path)
        start += rows
    return paths


def tokens_dir_for_sf(sf: float, base: str = "/tmp/fpray_tokens") -> str:
    """Cache dir for a given scale factor; sf 0.01 ~= 20k rows."""
    return os.path.join(base, f"sf{sf:g}")


def ensure_tokens_dataset(
    sf: float,
    base: str = "/tmp/fpray_tokens",
    seed: int = 42,
    weights: tuple = DEFAULT_WEIGHTS,
) -> list[str]:
    """Deterministic sf-scaled dataset under /tmp, generated on first
    use. sf=0.001 -> 2k rows, sf=0.01 -> 20k, sf=0.1 -> 200k."""
    n_rows = max(int(2_000_000 * sf), 200)
    n_fragments = max(min(int(16 * max(sf / 0.01, 1)), 64), 8)
    out = tokens_dir_for_sf(sf, base)
    return write_tokens_dataset(
        out, n_rows, n_fragments=n_fragments, seed=seed, weights=weights
    )
