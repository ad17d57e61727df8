"""connected_components (driver union-find vs distributed
large-star/small-star) vs a BFS ground truth, plus the dedup_clusters
pipeline contract over the real sf0.001 corpus."""

import collections

import numpy as np
import pandas as pd
import pytest

from fastparquet_ray.functions.graph import connected_components


def _bfs_truth(df: pd.DataFrame) -> dict[int, int]:
    adj = collections.defaultdict(set)
    for a, b in zip(df["id_a"], df["id_b"]):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    truth, seen = {}, set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, q = [], [start]
        while q:
            n = q.pop()
            if n in seen:
                continue
            seen.add(n)
            comp.append(n)
            q.extend(adj[n])
        mn = min(comp)
        for n in comp:
            truth[n] = mn
    return truth


def _as_map(out: pd.DataFrame) -> dict[int, int]:
    return {int(r.doc_id): int(r.cluster_id) for r in out.itertuples()}


def test_union_find_random_graph_vs_bfs():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"id_a": rng.integers(0, 200, 150),
         "id_b": rng.integers(0, 200, 150)}
    )
    df = df[df.id_a != df.id_b].reset_index(drop=True)
    got = _as_map(connected_components(df, mode="driver"))
    assert got == _bfs_truth(df)


def test_distributed_matches_driver(ray_session):
    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {"id_a": rng.integers(0, 300, 220),
         "id_b": rng.integers(0, 300, 220)}
    )
    df = df[df.id_a != df.id_b].reset_index(drop=True)
    d_driver = _as_map(connected_components(df, mode="driver"))
    d_dist = _as_map(connected_components(df, mode="dist"))
    assert d_driver == d_dist


def test_distributed_adversarial_shapes(ray_session):
    """Long chain (worst-case diameter for min-label propagation: the
    log-round convergence must actually iterate), a hub star, an
    isolated pair, and duplicate/reversed edges."""
    chain = [(i, i + 1) for i in range(60)]
    star = [(1000, 1000 + i) for i in range(1, 30)]
    extra = [(5000, 6000), (6000, 5000), (5000, 6000)]  # dupes+reverse
    df = pd.DataFrame(
        {"id_a": [a for a, _ in chain + star + extra],
         "id_b": [b for _, b in chain + star + extra]}
    )
    got = _as_map(connected_components(df, mode="dist"))
    assert got == _bfs_truth(df)
    assert got[60] == 0  # chain end reaches the chain min
    assert got[1029] == 1000
    assert got[6000] == 5000


def test_empty_and_self_loop_edges(ray_session):
    empty = connected_components(
        pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                      "id_b": pd.Series([], dtype="int64")})
    )
    assert len(empty) == 0
    loops = pd.DataFrame({"id_a": [5, 5], "id_b": [5, 5]})
    assert len(connected_components(loops, mode="dist")) == 0


def test_dedup_clusters_sf0001(ray_session):
    """Pipeline contract on the real corpus: every verified near-dup
    pair lands in ONE cluster, the cluster id is the component min,
    and the node set equals the pair-member set."""
    from fastparquet_ray.functions.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    sf_dir = "/root/testdata/sf0.001"
    pairs = minhash_lsh_pairs(sf_dir)
    clusters = dedup_clusters(sf_dir)
    cmap = _as_map(clusters)
    assert set(cmap) == set(pairs["id_a"]) | set(pairs["id_b"])
    for r in pairs.itertuples():
        assert cmap[int(r.id_a)] == cmap[int(r.id_b)]
    byc = collections.defaultdict(list)
    for n, c in cmap.items():
        byc[c].append(n)
    for c, members in byc.items():
        assert c == min(members)
    # BFS over the pair graph is the exact answer
    assert cmap == _bfs_truth(pairs)


def test_auto_mode_selects_by_edge_count(ray_session):
    """auto = driver within the cap, dist past it (same answer both
    ways); a Dataset input always stays distributed."""
    import ray.data

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {"id_a": rng.integers(0, 500, 400),
         "id_b": rng.integers(0, 500, 400)}
    )
    df = df[df.id_a != df.id_b].reset_index(drop=True)
    truth = _bfs_truth(df)
    # tiny cap forces the dist path for a local frame
    got_dist = _as_map(
        connected_components(df, mode="auto", driver_edge_cap=10)
    )
    assert got_dist == truth
    got_driver = _as_map(connected_components(df, mode="auto"))
    assert got_driver == truth
    ds = ray.data.from_pandas(df)
    assert _as_map(connected_components(ds, mode="auto")) == truth


def test_distributed_large_edge_count(ray_session):
    """Synthetic many-edge graph through the distributed path: 20k
    edges over 4k nodes across several blocks — exercises multi-round
    star contraction at a size where per-group pandas folds matter."""
    import ray.data

    rng = np.random.default_rng(99)
    df = pd.DataFrame(
        {"id_a": rng.integers(0, 4000, 20_000),
         "id_b": rng.integers(0, 4000, 20_000)}
    )
    df = df[df.id_a != df.id_b].reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(8)
    got = _as_map(connected_components(ds, mode="auto"))
    assert got == _bfs_truth(df)


def test_distributed_many_tiny_blocks(ray_session):
    """Sorted-segment star rounds under adversarial block splits: tiny
    target block size forces star centers and duplicate edges to
    straddle block borders; the border min-frame and the exact
    distinct-edge checksum must still converge to BFS truth."""
    import ray.data
    from ray.data import DataContext

    rng = np.random.default_rng(17)
    # a long path (worst case for round count) + random clutter +
    # heavy duplicate edges
    path = pd.DataFrame(
        {"id_a": np.arange(0, 400), "id_b": np.arange(1, 401)}
    )
    clutter = pd.DataFrame(
        {"id_a": rng.integers(500, 700, 300),
         "id_b": rng.integers(500, 700, 300)}
    )
    df = pd.concat(
        [path, clutter, path.iloc[::3], clutter.iloc[::2]],
        ignore_index=True,
    )
    df = df[df.id_a != df.id_b].reset_index(drop=True)

    ctx = DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        got = _as_map(
            connected_components(
                ray.data.from_pandas(df).repartition(7), mode="dist"
            )
        )
    finally:
        ctx.target_max_block_size = old_target
    assert got == _bfs_truth(df)
