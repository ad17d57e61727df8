"""Distributed graph primitives for dedup pipelines.

connected_components turns a near-duplicate PAIR set (the output of
minhash_lsh_pairs / ngram_jaccard_pairs / embedding_neardup) into
duplicate CLUSTERS — the final step of an LLM-corpus dedup pass, where
one representative per component is kept and the rest dropped.

Two modes, same contract as groupagg.merge_partials:

- ``driver``: numpy union-find with path halving over an edge array.
  Right when the edge set already sits on the driver (verified
  near-dup pairs are OUTPUT-bounded by the LSH star cap, orders of
  magnitude smaller than the corpus). O(E alpha(N)) single-core.
- ``dist``: the alternating large-star / small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14 — public algorithm) over a Ray Dataset of edges. Each star
  step is ONE range sort keyed on the star center plus a vectorized
  per-block emission (no per-node map_groups dispatch); straddling
  centers heal from an O(blocks) border min-frame. The edge list
  converges to a star forest pointing every node at its component
  minimum in O(log^2 n) rounds. No driver materialization of the edge
  set; convergence is detected with an exact distinct-edge checksum.

The reference has no graph surface (fastparquet stops at columnar
I/O); this is part of the training-data-pipeline family the engine
adds on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _union_find(edges_a: np.ndarray, edges_b: np.ndarray) -> pd.DataFrame:
    """Union-find with path halving; labels = component min node id."""
    nodes = np.unique(np.concatenate([edges_a, edges_b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]  # path halving
            i = parent[i]
        return i

    for a, b in zip(edges_a, edges_b):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            # union by smaller ROOT INDEX: nodes[] is sorted, so the
            # root with the smaller index carries the smaller node id
            # and every component's root ends at its min node
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    return pd.DataFrame(
        {"doc_id": nodes.astype("int64"),
         "cluster_id": nodes[roots].astype("int64")}
    )


def _hash_edges(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-independent-summable per-edge fingerprints (uint64)."""
    k = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ b.astype(
        np.uint64
    )
    return k ^ (k >> np.uint64(33))


def _star_minmap(srt, kcol: str, vcol: str, with_checksum: bool):
    """Global per-key min of ``vcol`` for the sorted edge stream's
    border segments, plus (optionally) an exact distinct-edge
    checksum. A key straddling blocks has ALL its portions at block
    edges, so the driver min over the O(2 x blocks) edge-portion
    rows is the key's true global min; keys interior to one block
    never appear here and fall back to their in-block min. The
    checksum sums per-block fingerprints over in-block-adjacent-
    deduped rows with k < v (the canonical orientation), then
    subtracts once per block boundary whose adjacent rows are equal
    — exact distinct-set arithmetic, independent of block layout.
    Returns ((keys_sorted, mins), (csum, count) | None)."""

    def frame(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "kind": pd.Series([], dtype="int8"),  # 0 block, 1 segment
            "k": pd.Series([], dtype="int64"),
            "vmin": pd.Series([], dtype="int64"),
            "fk": pd.Series([], dtype="int64"),
            "fv": pd.Series([], dtype="int64"),
            "lk": pd.Series([], dtype="int64"),
            "lv": pd.Series([], dtype="int64"),
            "cs": pd.Series([], dtype="uint64"),
            "cnt": pd.Series([], dtype="int64"),
        }
        if df.empty:
            return pd.DataFrame(cols)
        k = df[kcol].to_numpy(dtype=np.int64)
        v = df[vcol].to_numpy(dtype=np.int64)
        start = np.ones(len(df), dtype=bool)
        start[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(start)
        take = sorted({0, len(starts) - 1})
        cs, cnt = np.uint64(0), 0
        if with_checksum:
            keep = np.ones(len(df), dtype=bool)
            keep[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
            canonical = keep & (k < v)
            with np.errstate(over="ignore"):
                cs = _hash_edges(k[canonical], v[canonical]).sum(
                    dtype=np.uint64
                )
            cnt = int(canonical.sum())
        rows = [
            (0, 0, 0, int(k[0]), int(v[0]), int(k[-1]), int(v[-1]),
             cs, cnt)
        ] + [
            (1, int(k[starts[i]]), int(v[starts[i]]), 0, 0, 0, 0,
             np.uint64(0), 0)
            for i in take
        ]
        return pd.DataFrame(rows, columns=list(cols)).astype(
            {c: s.dtype for c, s in cols.items()}
        )

    # O(3 x blocks) rows — never edges or nodes
    bd = srt.map_batches(
        frame, batch_format="pandas", batch_size=None
    ).to_pandas()
    if bd.empty:
        return (np.empty(0, np.int64), np.empty(0, np.int64)), (0, 0)
    seg = bd[bd["kind"] == 1]
    mins = seg.groupby("k", sort=True)["vmin"].min()
    keys = mins.index.to_numpy(dtype=np.int64)
    vals = mins.to_numpy(dtype=np.int64)
    check = None
    if with_checksum:
        blk = bd[bd["kind"] == 0]
        with np.errstate(over="ignore"):
            total = np.uint64(blk["cs"].to_numpy(dtype=np.uint64).sum())
        count = int(blk["cnt"].sum())
        # block order == (first-row, last-row) order (contiguous
        # sorted ranges; the last-row tiebreak orders whole-duplicate
        # blocks correctly); subtract each boundary whose adjacent
        # rows are the same canonical edge — exact distinct-set math
        blk = blk.sort_values(
            ["fk", "fv", "lk", "lv"], kind="mergesort"
        ).reset_index(drop=True)
        fk = blk["fk"].to_numpy(dtype=np.int64)
        fv = blk["fv"].to_numpy(dtype=np.int64)
        lk = blk["lk"].to_numpy(dtype=np.int64)
        lv = blk["lv"].to_numpy(dtype=np.int64)
        dup = (lk[:-1] == fk[1:]) & (lv[:-1] == fv[1:]) & (
            lk[:-1] < lv[:-1]
        )
        if dup.any():
            with np.errstate(over="ignore"):
                total -= _hash_edges(lk[:-1][dup], lv[:-1][dup]).sum(
                    dtype=np.uint64
                )
            count -= int(dup.sum())
        check = (int(total) & 0xFFFFFFFFFFFFFFFF, count)
    return (keys, vals), check


def _cc_distributed(edges_ds, max_rounds: int = 50) -> pd.DataFrame:
    """Large-star/small-star over a Ray Dataset of (a, b) edges.

    Invariants per Kiveris'14: large-star connects every strictly
    LARGER neighbor to the neighborhood minimum (keeps edges to
    smaller neighbors intact), small-star re-points every <=-neighbor
    of each node at the neighborhood minimum. Both preserve
    connectivity; alternating them converges to edges (v, min(C(v))).

    Segmented-sort execution (round 4): each star step is ONE range
    sort keyed on the star center + a vectorized per-block emission —
    no per-node map_groups dispatch. A center straddling blocks gets
    its true neighborhood min from an O(blocks) border frame (min is
    commutative, so no block ordering is needed); duplicate edges are
    adjacent-deduped in-block, the bounded residue at block borders
    is tolerated (next round's sort collapses it), and convergence is
    detected with an EXACT distinct-edge checksum (per-block deduped
    fingerprint sums minus the border-duplicate corrections, computed
    from the same O(blocks) frame). Skew is bounded because a sorted
    block never holds more than a block's worth of any star; the
    driver holds O(blocks) state, never nodes or edges.
    """
    import ray
    import ray.data

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pd.DataFrame({"a": lo[keep], "b": hi[keep]})

    def bidir(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"u": np.concatenate([a, b]), "v": np.concatenate([b, a])}
        )

    def _seg_mins(k, v, minmap):
        """Per-row global neighborhood min for a sorted block: the
        in-block per-segment min (first v of the run), overridden by
        the border map wherever the key appears there (a key in the
        map is border-straddling somewhere, and the map min is its
        global min)."""
        keys, vals = minmap
        start = np.ones(k.size, dtype=bool)
        start[1:] = k[1:] != k[:-1]
        seg_id = np.cumsum(start) - 1
        seg_keys = k[start]
        seg_min = v[np.flatnonzero(start)]
        if keys.size:
            pos = np.searchsorted(keys, seg_keys)
            pos_c = np.clip(pos, 0, keys.size - 1)
            hit = keys[pos_c] == seg_keys
            seg_min = np.where(
                hit, np.minimum(seg_min, vals[pos_c]), seg_min
            )
        return seg_id, seg_min, seg_keys

    def large_emit(minmap):
        def fn(df: pd.DataFrame, _memo={}) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"a": pd.Series([], dtype="int64"),
                     "b": pd.Series([], dtype="int64")}
                )
            if "m" not in _memo:
                _memo["m"] = ray.get(minmap)  # O(blocks) entries
            k = df["u"].to_numpy(dtype=np.int64)
            v = df["v"].to_numpy(dtype=np.int64)
            seg_id, seg_min, seg_keys = _seg_mins(k, v, _memo["m"])
            m = np.minimum(seg_keys, seg_min)[seg_id]
            keep = np.ones(k.size, dtype=bool)
            keep[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
            # emit (neighborhood-min, larger-neighbor) ONLY —
            # Kiveris'14 Lemma 1 proves this preserves connectivity
            keep &= v > k
            return pd.DataFrame({"a": m[keep], "b": v[keep]})

        return fn

    def small_emit(minmap):
        def fn(df: pd.DataFrame, _memo={}) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {"a": pd.Series([], dtype="int64"),
                     "b": pd.Series([], dtype="int64")}
                )
            if "m" not in _memo:
                _memo["m"] = ray.get(minmap)  # O(blocks) entries
            k = df["b"].to_numpy(dtype=np.int64)
            v = df["a"].to_numpy(dtype=np.int64)
            seg_id, seg_min, _sk = _seg_mins(k, v, _memo["m"])
            m = seg_min[seg_id]
            keep = np.ones(k.size, dtype=bool)
            keep[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
            # re-point every <=-neighbor at the min, plus one
            # (min, center) edge per center portion (cross-portion
            # duplicates collapse in the next round's sort)
            start = np.ones(k.size, dtype=bool)
            start[1:] = k[1:] != k[:-1]
            out_a = np.concatenate([m[keep & (v != m)], m[start]])
            out_b = np.concatenate([v[keep & (v != m)], k[start]])
            return pd.DataFrame({"a": out_a, "b": out_b})

        return fn

    ds = edges_ds.map_batches(canon, batch_format="pandas")
    prev = None
    if ds.count() == 0:  # self-loop-only input
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cluster_id": pd.Series([], dtype="int64")}
        )
    converged = False
    for _ in range(max_rounds):
        big = ds.map_batches(bidir, batch_format="pandas")
        srt = big.sort(["u", "v"]).materialize()
        minmap, cur = _star_minmap(srt, "u", "v", with_checksum=True)
        if cur == prev:
            converged = True
            break
        prev = cur
        # broadcast is O(blocks) entries — block-count-bounded
        mref = ray.put(minmap)
        mid = srt.map_batches(
            large_emit(mref), batch_format="pandas", batch_size=None
        )
        srt2 = mid.sort(["b", "a"]).materialize()
        minmap2, _ = _star_minmap(srt2, "b", "a", with_checksum=False)
        # broadcast is O(blocks) entries — block-count-bounded
        mref2 = ray.put(minmap2)
        ds = srt2.map_batches(
            small_emit(mref2), batch_format="pandas", batch_size=None
        ).materialize()
    if not converged:
        # non-convergence (or an astronomically unlikely checksum
        # collision masking it) must not silently return a non-star
        # edge set — fall back to the exact driver union-find over the
        # current (already much-contracted) edge set, but never pull
        # an edge set the driver can't hold
        n_edges = ds.count()
        if n_edges > 50_000_000:
            raise RuntimeError(
                "connected_components: star contraction did not "
                f"converge in {max_rounds} rounds and the residual "
                f"edge set ({n_edges} edges) exceeds the driver "
                "fallback cap; raise max_rounds"
            )
        df = ds.to_pandas().drop_duplicates()
        return _union_find(
            df["a"].to_numpy(dtype=np.int64),
            df["b"].to_numpy(dtype=np.int64),
        ).sort_values("doc_id").reset_index(drop=True)

    # converged: every edge is (component_min, node)
    stars = ds.to_pandas().drop_duplicates()  # output-sized: one row/node
    out = pd.DataFrame(
        {"doc_id": stars["b"].astype("int64"),
         "cluster_id": stars["a"].astype("int64")}
    )
    mins = np.unique(stars["a"].to_numpy(dtype=np.int64))
    out = pd.concat(
        [out, pd.DataFrame({"doc_id": mins, "cluster_id": mins})],
        ignore_index=True,
    )
    return out.drop_duplicates("doc_id")


def connected_components(
    edges, mode: str = "auto", driver_edge_cap: int = 2_000_000
) -> pd.DataFrame:
    """(doc_id, cluster_id = component-min doc_id) for every node that
    appears in >= 1 edge. ``edges``: pandas DataFrame with id_a/id_b
    columns or a Ray Dataset of the same. mode: driver | dist | auto.

    ``auto`` selects by edge count, not input type: a local frame
    within ``driver_edge_cap`` uses the exact O(E alpha(N)) driver
    union-find; anything larger (or any Dataset input, whose size the
    driver hasn't paid for yet) runs the distributed
    large-star/small-star path so the edge set never has to fit on
    one node."""
    import ray.data

    is_ds = not isinstance(edges, pd.DataFrame)
    if mode == "auto":
        if is_ds:
            mode = "dist"
        else:
            mode = "driver" if len(edges) <= driver_edge_cap else "dist"
    if mode == "driver":
        df = edges.to_pandas() if is_ds else edges
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64")}
            )
        return (
            _union_find(
                df["id_a"].to_numpy(dtype=np.int64),
                df["id_b"].to_numpy(dtype=np.int64),
            )
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    if not is_ds:
        if edges.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64")}
            )
        edges = ray.data.from_pandas(
            pd.DataFrame(
                {"a": edges["id_a"].astype("int64"),
                 "b": edges["id_b"].astype("int64")}
            )
        )
    else:
        edges = edges.map_batches(
            lambda df: pd.DataFrame(
                {"a": df["id_a"].astype("int64"),
                 "b": df["id_b"].astype("int64")}
            ),
            batch_format="pandas",
        )
    return (
        _cc_distributed(edges)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
