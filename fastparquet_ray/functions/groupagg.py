"""Generic final-merge for partial-aggregate pipelines, replacing
Ray's ``groupby().aggregate()`` on the *merged* side where its fixed
per-key overhead dominates (measured on this box, 150k rows / 15k
keys / 32 CPUs: native hash aggregate 4.35 s, partial rows pulled to
the driver and merged with one pandas groupby 1.02 s, partial rows
range-sorted then segment-reduced per block 1.95 s).

The contract: the caller has already collapsed each input block to at
most one row per (block, group) — the "partial" — so the surviving
row count is bounded by ``groups x blocks``, never by the corpus.
This module only merges those partials:

- mode="driver": pull all partial rows to the driver, one vectorized
  pandas groupby. O(groups x blocks) driver memory — right whenever
  that product is small (low/mid cardinality keys, the common case).
- mode="sort": ONE range sort of the partial rows (exchange bounded
  by the partial size, not the corpus), a per-block segmented reduce
  (each sorted block collapses to one row per group it contains, so a
  group survives in at most the few blocks it straddles), then the
  driver merges O(groups + blocks) rows. Right when blocks is large
  enough that groups x blocks would swamp the driver but O(groups)
  still fits — e.g. a 1M-term vocabulary over 800k blocks at 100 TB.
- mode="auto": stream the partial batches to the driver and fold each
  into a running O(groups) aggregate (no materialize barrier, no
  object-store copy, memory bounded by groups + one batch); bail to
  mode="sort" only if the running GROUP count exceeds
  ``driver_row_cap`` — i.e. the driver fold is abandoned exactly when
  its output wouldn't fit either.

Output is a pandas DataFrame (O(groups) — the same driver footprint
every consumer of these aggregates already accepts); use
``ray.data.from_pandas`` when a Dataset is needed downstream.

Reference analog: the reference merges row-group statistics on the
driver unconditionally (fastparquet writer.py:1166-1209
consolidate_categories / metadata merge); this module gives the same
merge a distributed escape hatch.
"""

from __future__ import annotations

import pandas as pd

_VALID_OPS = {"sum", "min", "max"}


def _merge_pandas(df: pd.DataFrame, keys: list[str], ops: dict[str, str]):
    agg = df.groupby(keys, as_index=False, sort=False).agg(ops)
    return agg


def merge_partials(
    parts,
    keys: list[str],
    ops: dict[str, str],
    *,
    mode: str = "auto",
    driver_row_cap: int = 2_000_000,
) -> pd.DataFrame:
    """Merge a Dataset of per-block partial-aggregate rows into one
    row per group.

    ``parts``: Dataset with columns ``keys + list(ops)``. ``ops`` maps
    each value column to its merge op ("sum" | "min" | "max" — Count
    partials merge with "sum"; mean = sum/count done by the caller).
    """
    bad = set(ops.values()) - _VALID_OPS
    if bad:
        raise ValueError(f"unsupported merge ops: {sorted(bad)}")

    if mode == "auto":
        # streaming driver fold: one pass over the partial batches,
        # accumulated and COMPACTED (one pandas groupby) only when the
        # buffered raw rows pass a threshold — so total driver work is
        # O(partial rows) with a handful of groupbys, never a re-group
        # of the running aggregate per batch (that was measured
        # catastrophic at 1M-group vocabularies: bigram_pmi 3.5 s ->
        # 330 s). No materialize() barrier, no full-row-count
        # pre-pass; memory stays O(compact threshold + groups). If
        # group cardinality alone exceeds the cap the fold is
        # abandoned (its output wouldn't fit the driver anyway) and
        # the sort path re-executes parts from lineage.
        compact_rows = max(driver_row_cap, 4_000_000)
        # bail BEFORE pulling a corpus-scaled partial stream through
        # the driver: once the cumulative raw rows pulled exceed this,
        # the fold aborts immediately and the sort path re-executes
        # from lineage (cheaper than streaming 100M rows to one node;
        # callers that KNOW their partials are corpus-scaled pass
        # mode="sort" and skip the probe entirely)
        bail_rows = 4 * compact_rows
        acc: list[pd.DataFrame] = []
        acc_rows = 0
        pulled = 0
        over_cap = False

        def _compact() -> pd.DataFrame:
            return _merge_pandas(
                acc[0] if len(acc) == 1 else pd.concat(
                    acc, ignore_index=True
                ),
                keys,
                ops,
            )

        for b in parts.iter_batches(batch_format="pandas"):
            if b.empty:
                continue
            acc.append(b)
            acc_rows += len(b)
            pulled += len(b)
            if pulled > bail_rows:
                over_cap = True
                break
            if acc_rows > compact_rows:
                m = _compact()
                if len(m) > driver_row_cap:
                    over_cap = True
                    break
                acc = [m]
                acc_rows = len(m)
        if not over_cap:
            if not acc:  # empty input: recover the schema
                empty = parts.to_pandas()
                if empty.empty and not set(keys) <= set(empty.columns):
                    # an empty Dataset can lose its column names
                    empty = pd.DataFrame(
                        {c: pd.Series([], dtype="object")
                         for c in [*keys, *ops]}
                    )
                return _merge_pandas(empty, keys, ops)
            m = _compact()
            if len(m) <= driver_row_cap:
                return m
            over_cap = True
        mode = "sort"

    if mode == "driver":
        return _merge_pandas(parts.to_pandas(), keys, ops)
    if mode != "sort":
        raise ValueError(f"unknown mode: {mode!r}")

    srt = parts.sort(keys)

    def seg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return _merge_pandas(df, keys, ops)

    # each sorted block collapses to one row per group it contains; a
    # group spans >1 block only at range boundaries, so the driver
    # sees O(groups + blocks) rows and resolves the stragglers with
    # one more tiny groupby
    out = srt.map_batches(seg, batch_format="pandas").to_pandas()
    return _merge_pandas(out, keys, ops)
