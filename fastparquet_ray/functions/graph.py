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
  SoCC'14 — public algorithm) over a Ray Dataset of edges. Each round
  is ONE hash exchange (groupby node + map_groups); the edge list
  converges to a star forest pointing every node at its component
  minimum in O(log^2 n) rounds. No driver materialization of the edge
  set; convergence is detected with a scalar checksum aggregate.

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


def _cc_distributed(edges_ds, max_rounds: int = 50) -> pd.DataFrame:
    """Large-star/small-star over a Ray Dataset of (a, b) edges.

    Invariants per Kiveris'14: large-star connects every strictly
    LARGER neighbor to the neighborhood minimum (keeps edges to
    smaller neighbors intact), small-star re-points every <=-neighbor
    of each node at the neighborhood minimum. Both preserve
    connectivity; alternating them converges to edges (v, min(C(v))).
    Each step is one groupby exchange keyed on the star center; skew
    is bounded because star sizes shrink geometrically toward the
    final hub, whose group is O(component size) — the same footprint
    the OUTPUT (node -> component min) necessarily has.
    """
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

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        # emit (larger-neighbor, neighborhood-min) ONLY — Kiveris'14
        # Lemma 1 proves this alone preserves connectivity
        u = int(g["u"].iloc[0])
        nbrs = np.unique(g["v"].to_numpy(dtype=np.int64))
        m = min(u, int(nbrs[0]))
        big = nbrs[nbrs > u]
        return pd.DataFrame(
            {"a": np.full(big.size, m, dtype=np.int64), "b": big}
        )

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        # groups keyed on b = the LARGER endpoint (canonical edges):
        # re-point every <=-neighbor plus the center at the minimum
        u = int(g["b"].iloc[0])
        nbrs = np.unique(g["a"].to_numpy(dtype=np.int64))
        m = int(nbrs[0])
        out_b = nbrs.copy()
        out_b[0] = u  # slot of m itself becomes the (m, center) edge
        return pd.DataFrame(
            {"a": np.full(nbrs.size, m, dtype=np.int64), "b": out_b}
        )

    ds = edges_ds.map_batches(canon, batch_format="pandas")

    def checksum(d) -> int:
        # order-independent scalar fingerprint of the distinct edge set
        def h(df: pd.DataFrame) -> pd.DataFrame:
            a = df["a"].to_numpy(dtype=np.uint64)
            b = df["b"].to_numpy(dtype=np.uint64)
            k = a * np.uint64(0x9E3779B97F4A7C15) ^ b
            k ^= k >> np.uint64(33)
            return pd.DataFrame({"s": [int(k.sum(dtype=np.uint64))],
                                 "n": [len(df)]})

        t = d.map_batches(h, batch_format="pandas").to_pandas()
        return (int(t["s"].sum()) & 0xFFFFFFFFFFFFFFFF, int(t["n"].sum()))

    prev = None
    if ds.count() == 0:  # self-loop-only input
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cluster_id": pd.Series([], dtype="int64")}
        )
    converged = False
    for _ in range(max_rounds):
        ds = (
            ds.map_batches(bidir, batch_format="pandas")
            .groupby("u")
            .map_groups(large_star, batch_format="pandas")
            .map_batches(canon, batch_format="pandas")
            .groupby("b")
            .map_groups(small_star, batch_format="pandas")
            .map_batches(canon, batch_format="pandas")
            .materialize()
        )
        cur = checksum(ds)
        if cur == prev:
            converged = True
            break
        prev = cur
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
