"""Sequence packing — the canonical pretraining data-prep operator:
concatenate the corpus token stream in a deterministic document order
and chunk it into fixed-length training examples (GPT-style
concat-then-chunk; the ragged tail example is dropped).

Scale shape (the segmented-sort / border-fold house recipe):
ONE range sort on doc_id defines the global order; a per-block token
count partial folds to an exclusive prefix sum on the driver
(O(blocks) state); every block then emits its FULL examples directly
— (m, L) reshape of the block's aligned token span, distributed, the
corpus never funnels anywhere — while the <= 2 boundary fragments per
block route to a driver fix-up bounded by blocks x L tokens. No
shuffle beyond the one sort; example_id is globally unique by
construction.

Reference: the reference engine has no packing (it is a file-format
library); this operator exists because the north star is an LLM
training-data pipeline, where packing sits between tokenization and
the dataloader.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_sequences(sf_dir: str, length: int = 512):
    """Pack the decoded tokens corpus into fixed-``length`` examples.
    Returns a Dataset of (example_id int64, tokens list<int32>), every
    row exactly ``length`` tokens; example k holds global token
    positions [k*length, (k+1)*length) under the doc_id order."""
    import ray
    import ray.data

    from ..pipelines.decode import decode_dataset
    from ..pipelines.flagship import ensure_encoded

    _, enc = ensure_encoded(sf_dir)
    srt = (
        decode_dataset(enc, columns=["doc_id", "tokens"])
        .sort("doc_id")
        .materialize()  # consumed twice: block-sum pull + pack pass
    )

    def block_sums(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"first_doc": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        col = t.column("tokens").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "first_doc": pa.array(
                    [str(t.column("doc_id")[0])], pa.string()
                ),
                "n": pa.array([int(offs[-1] - offs[0])], pa.int64()),
            }
        )

    # one row per block; blocks sort by first_doc exactly like the
    # global doc_id order (doc_id is unique, blocks are contiguous)
    bs = (
        srt.map_batches(block_sums, batch_format="pyarrow",
                        batch_size=None)
        .to_pandas()
        .sort_values("first_doc")
        .reset_index(drop=True)
    )
    total = int(bs["n"].sum()) if len(bs) else 0
    n_examples = total // length
    cut = n_examples * length  # positions >= cut form the dropped tail
    excl = np.zeros(len(bs), dtype=np.int64)
    if len(bs) > 1:
        np.cumsum(bs["n"].to_numpy()[:-1], out=excl[1:])
    off_ref = ray.put(dict(zip(bs["first_doc"], excl)))

    L = length

    def pack_block(t: pa.Table, _memo={}) -> pa.Table:
        empty = pa.table(
            {
                "example_id": pa.array([], pa.int64()),
                "tokens": pa.array([], pa.list_(pa.int32())),
                "frag_pos": pa.array([], pa.int64()),
                "is_frag": pa.array([], pa.bool_()),
            }
        )
        if t.num_rows == 0:
            return empty
        if "o" not in _memo:
            _memo["o"] = ray.get(off_ref)  # O(blocks) entries
        col = t.column("tokens").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.int32
        )
        g0 = _memo["o"][str(t.column("doc_id")[0])]
        g1 = g0 + flat.size
        # the dropped ragged tail: clip this block's span to < cut
        if g0 >= cut:
            return empty
        if g1 > cut:
            flat = flat[: cut - g0]
            g1 = cut
        lo = -(-g0 // L) * L  # first example boundary >= g0
        hi = (g1 // L) * L    # last boundary <= g1
        ex_ids: list[np.ndarray] = []
        toks: list = []
        fpos: list[np.ndarray] = []
        frag: list[np.ndarray] = []
        if hi > lo:  # full examples, emitted distributed
            m = (hi - lo) // L
            body = flat[lo - g0 : hi - g0].reshape(m, L)
            ex_ids.append(np.arange(lo // L, hi // L, dtype=np.int64))
            toks.extend(list(body))
            fpos.append(np.zeros(m, dtype=np.int64))
            frag.append(np.zeros(m, dtype=bool))
        bounds = [(g0, min(lo, g1))] if lo > g0 else []
        if hi < g1 and max(hi, g0) < g1:
            bounds.append((max(hi, g0), g1))
        if lo > hi:  # block strictly inside one example: one fragment
            bounds = [(g0, g1)]
        for a, b in bounds:
            if b <= a:
                continue
            ex_ids.append(
                np.array([a // L], dtype=np.int64)
            )
            toks.append(flat[a - g0 : b - g0])
            fpos.append(np.array([a], dtype=np.int64))
            frag.append(np.array([True]))
        if not ex_ids:
            return empty
        return pa.table(
            {
                "example_id": pa.array(
                    np.concatenate(ex_ids), pa.int64()
                ),
                "tokens": pa.array(
                    [tk for tk in toks], pa.list_(pa.int32())
                ),
                "frag_pos": pa.array(np.concatenate(fpos), pa.int64()),
                "is_frag": pa.array(np.concatenate(frag), pa.bool_()),
            }
        )

    packed = srt.map_batches(
        pack_block, batch_format="pyarrow", batch_size=None
    )
    full = packed.filter(expr="is_frag == False").drop_columns(
        ["frag_pos", "is_frag"]
    )
    # boundary fragments: <= 2 per block -> driver assembly is
    # O(blocks x L) tokens, block-bounded (never corpus-bounded)
    frags = packed.filter(expr="is_frag == True").to_pandas()
    if len(frags):
        import ray.data

        rows_id, rows_tok = [], []
        for eid, sub in frags.groupby("example_id", sort=True):
            parts = [
                np.asarray(x, dtype=np.int32)
                for x in sub.sort_values("frag_pos")["tokens"]
            ]
            joined = np.concatenate(parts)
            if joined.size == L:  # tail fragments short of L: dropped
                rows_id.append(int(eid))
                rows_tok.append(joined)
        if rows_id:
            fix = pa.table(
                {
                    "example_id": pa.array(rows_id, pa.int64()),
                    "tokens": pa.array(
                        [r for r in rows_tok], pa.list_(pa.int32())
                    ),
                }
            )
            full = full.union(ray.data.from_arrow(fix))
    return full


def pack_stats(sf_dir: str, length: int = 512):
    """Per-example token count + token sum of the PACKED dataset —
    the SQL-checkable invariant of pack_sequences (the oracle derives
    the same numbers from the raw parquet with a window cumsum over
    per-token global positions)."""
    ds = pack_sequences(sf_dir, length=length)

    def stats(t: pa.Table) -> pa.Table:
        col = t.column("tokens").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        vals = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lens = np.diff(offs)
        sums = (
            np.add.reduceat(vals, offs[:-1])
            if vals.size
            else np.zeros(0, np.int64)
        )
        sums = np.where(lens > 0, sums, 0).astype(np.int64)
        return pa.table(
            {
                "example_id": t.column("example_id"),
                "n_tok": pa.array(lens.astype(np.int64), pa.int64()),
                "tok_sum": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def pack_bins(sf_dir: str, length: int = 512):
    """Boundary-respecting packing: each document lands WHOLE in the
    bin its global start offset falls into (example_id =
    exclusive_cumsum(n_tok) // length under the doc_id order) — the
    sequence-length bucketing used when cross-document attention is
    masked and documents must not split. Bin token counts float
    around ``length`` instead of hitting it exactly; returns
    (example_id, n_docs, tok_sum) per bin.

    Scale shape: the SAME one doc_id range sort + O(blocks) exclusive
    prefix fold as pack_sequences; every block emits its (bin, count,
    sum) partials and a bin straddles at most the blocks its docs
    span, so merge_partials finishes the job — no second exchange
    class, no driver corpus state."""
    import ray

    from ..pipelines.decode import decode_dataset
    from ..pipelines.flagship import ensure_encoded
    from .groupagg import merge_partials

    _, enc = ensure_encoded(sf_dir)
    srt = (
        decode_dataset(enc, columns=["doc_id", "n_tok"])
        .sort("doc_id")
        .materialize()
    )

    def block_sums(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"first_doc": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "first_doc": pa.array(
                    [str(t.column("doc_id")[0])], pa.string()
                ),
                "n": pa.array(
                    [int(
                        t.column("n_tok").to_numpy(
                            zero_copy_only=False
                        ).sum()
                    )],
                    pa.int64(),
                ),
            }
        )

    bs = (
        srt.map_batches(block_sums, batch_format="pyarrow",
                        batch_size=None)
        .to_pandas()
        .sort_values("first_doc")
        .reset_index(drop=True)
    )
    excl = np.zeros(len(bs), dtype=np.int64)
    if len(bs) > 1:
        np.cumsum(bs["n"].to_numpy()[:-1], out=excl[1:])
    off_ref = ray.put(dict(zip(bs["first_doc"], excl)))
    L = length

    def partial(t: pa.Table, _memo={}) -> pa.Table:
        empty = pa.table(
            {"example_id": pa.array([], pa.int64()),
             "n_docs": pa.array([], pa.int64()),
             "tok_sum": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        if "o" not in _memo:
            _memo["o"] = ray.get(off_ref)
        n = t.column("n_tok").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        g0 = _memo["o"][str(t.column("doc_id")[0])]
        prev = g0 + np.cumsum(n) - n
        eid = prev // L
        uniq, inv = np.unique(eid, return_inverse=True)
        return pa.table(
            {
                "example_id": pa.array(uniq, pa.int64()),
                "n_docs": pa.array(
                    np.bincount(inv).astype(np.int64), pa.int64()
                ),
                "tok_sum": pa.array(
                    np.bincount(inv, weights=n).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    out = merge_partials(
        srt.map_batches(partial, batch_format="pyarrow",
                        batch_size=None),
        ["example_id"], {"n_docs": "sum", "tok_sum": "sum"},
    )
    return out.sort_values("example_id").reset_index(drop=True)


def chunk_windows(sf_dir: str, size: int = 128, stride: int = 64):
    """Sliding-window chunking of each document's token array
    (windows start every ``stride`` tokens while inside the doc, the
    last ones truncated at the doc end) — the long-context eval /
    retrieval-indexing chunker. Per-window (doc_id, win_idx, win_len,
    tok_sum) derived fully vectorized from the list offsets + one
    prefix sum per batch; embarrassingly parallel, zero exchanges."""
    from ..pipelines.decode import decode_dataset
    from ..pipelines.flagship import ensure_encoded

    _, enc = ensure_encoded(sf_dir)
    ds = decode_dataset(enc, columns=["doc_id", "tokens"])

    def windows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.string()),
             "win_idx": pa.array([], pa.int64()),
             "win_len": pa.array([], pa.int64()),
             "tok_sum": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        col = t.column("tokens").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lens = np.diff(offs)
        n_win = np.where(lens > 0, (lens - 1) // stride + 1, 0)
        total = int(n_win.sum())
        if total == 0:
            return empty
        doc_i = np.repeat(
            np.arange(lens.size, dtype=np.int64), n_win
        )
        cum = np.zeros(lens.size, dtype=np.int64)
        np.cumsum(n_win[:-1], out=cum[1:])
        widx = np.arange(total, dtype=np.int64) - np.repeat(cum, n_win)
        s = widx * stride
        wlen = np.minimum(s + size, lens[doc_i]) - s
        csum = np.concatenate([[0], np.cumsum(flat)])
        g0 = offs[:-1][doc_i] + s
        tok_sum = csum[g0 + wlen] - csum[g0]
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_i], pa.string()),
                "win_idx": pa.array(widx, pa.int64()),
                "win_len": pa.array(wlen, pa.int64()),
                "tok_sum": pa.array(tok_sum.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(windows, batch_format="pyarrow")
