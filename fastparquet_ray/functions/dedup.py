"""Deduplication operators over the documents table — exact, MinHash+
LSH near-dup, SimHash, n-gram Jaccard verification. The reference has
no dedup (SURVEY.md §2.8); these are the training-data-pipeline ops
the north star requires, built on the canonical Ray patterns:
hash -> groupby for exact; shingle -> minhash -> band-bucket groupby ->
candidate pairs -> verify for near-dup.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pandas as pd

_SEED = np.uint64(0x9E3779B97F4A7C15)
_PRIME = np.uint64(1099511628211)


def _docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def dedup_exact(sf_dir: str):
    """Exact dedup: group by full text, keep the smallest doc_id
    (hash-partition + per-group first — SURVEY §2.8). Returns one row
    per distinct text with the survivor id and duplicate count."""
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.groupby("text").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups")
    )
    return out


def corpus_clean(sf_dir: str):
    """The composed training-data cleaning pipeline: exact dedup (keep
    the smallest doc_id per distinct text — one hash shuffle on the
    text key) -> quality heuristics (word-count bounds + average word
    length band, same rules as textops.quality_filter) -> per-source
    survivor counts. This is the end-to-end flow a corpus-prep job
    runs; oracle reproduces it with a window function + the rules."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text", "source", "n_chars"])

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id").head(1)

    survivors = ds.groupby("text").map_groups(keep_first, batch_format="pandas")

    def partial(t: pa.Table) -> pa.Table:
        words = pc.add(pc.count_substring(t.column("text"), " "), 1).cast(
            pa.int64()
        )
        chars = t.column("n_chars").cast(pa.int64())
        awl = pc.divide(
            pc.cast(chars, pa.float64()), pc.cast(words, pa.float64())
        )
        keep = pc.and_(
            pc.and_(pc.greater_equal(words, 10), pc.less_equal(words, 2000)),
            pc.and_(pc.greater_equal(awl, 3.0), pc.less_equal(awl, 12.0)),
        )
        kept = pa.table({"source": t.column("source")}).filter(keep)
        g = kept.group_by(["source"]).aggregate([("source", "count")])
        return g.rename_columns(["source", "n_kept"])

    parts = survivors.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("source").aggregate(Sum("n_kept", alias_name="n_kept"))


def _word_shingles(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per text: uint64 hashes of word k-shingles. Shingle hashing is
    vectorized (pandas hash_array, stable across processes); only the
    shingle-string construction is per doc. split(' ') exactly — the
    same tokenization DuckDB's string_split uses, so the exact-Jaccard
    oracle reproduces the verify step bit for bit."""
    all_shingles: list[str] = []
    counts: list[int] = []
    for t in texts:
        words = t.split(" ")
        if len(words) < k:
            sh = [" ".join(words)] if words else []
        else:
            sh = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        all_shingles.extend(sh)
        counts.append(len(sh))
    if all_shingles:
        hs = pd.util.hash_array(
            np.array(all_shingles, dtype=object)
        ).astype(np.uint64)
    else:
        hs = np.empty(0, dtype=np.uint64)
    out = []
    pos = 0
    for c in counts:
        out.append(np.unique(hs[pos : pos + c]))
        pos += c
    return out


class MinHasher:
    """k=64 minhash signatures via universal hashing over shingle
    hashes — vectorized per doc; the permutation constants are built
    once per actor."""

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3):
        rng = np.random.default_rng(42)
        self.a = rng.integers(1, 2**61, num_hashes, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61, num_hashes, dtype=np.uint64)
        self.k = shingle_k
        self.num = num_hashes

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if shingles.size == 0:
            return np.full(self.num, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_hashes, n_shingles) universal hashes, row-min
        vals = (
            self.a[:, None] * shingles[None, :] + self.b[:, None]
        )  # uint64 wraparound
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        shingles = _word_shingles(df["text"].tolist(), self.k)
        sigs = np.stack([self.signature(s) for s in shingles])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "sig": [row.tobytes() for row in sigs],
            }
        )


def minhash_lsh_pairs(
    sf_dir: str,
    bands: int = 16,
    rows_per_band: int = 4,
    jaccard_threshold: float = 0.5,
):
    """MinHash+LSH near-duplicate candidate pairs, verified with exact
    shingle Jaccard. Pipeline: minhash (actor pool) -> explode to
    (band, band_hash, doc_id) -> groupby band buckets -> candidate
    pairs -> distributed verify (candidate-id semi-join computes
    shingles inside map_batches; pair Jaccard vectorized over the pair
    dataset with a candidate-bounded broadcast map). Driver state is
    OUTPUT-bounded throughout — the corpus never leaves the cluster.
    """
    import ray
    import ray.data

    ds = _docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas", concurrency=2, batch_size=4096
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "band_hash": [], "doc_id": []}
        for did, sig in zip(df["doc_id"], df["sig"]):
            s = np.frombuffer(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = s[b * rows_per_band : (b + 1) * rows_per_band]
                rows["band"].append(b)
                rows["band_hash"].append(int(chunk.sum() % (2**63)))
                rows["doc_id"].append(did)
        return pd.DataFrame(rows)

    buckets = sigs.map_batches(explode, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64")}
            )
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    # candidate pairs are OUTPUT-bounded (LSH buckets, not the corpus),
    # so the driver may hold them — it may NOT hold the corpus
    cand = (
        buckets.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if cand.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    # exact-verify, distributed (the r01 version shipped ALL document
    # texts to the driver): (1) semi-join the corpus to candidate ids
    # via a broadcast id set, computing shingle hashes inside
    # map_batches; (2) broadcast the candidate-bounded shingle map and
    # verify pairs vectorized in map_batches over the pair dataset.
    cand_ids = set(
        np.unique(np.concatenate([cand["id_a"].to_numpy(), cand["id_b"].to_numpy()]))
        .astype(np.int64)
        .tolist()
    )
    ids_ref = ray.put(cand_ids)
    k = 3  # same word-shingle size as the MinHasher

    class CandidateShingles:
        def __init__(self, ref):
            self.ids = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["doc_id"].isin(self.ids)]
            if df.empty:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "sh": pd.Series([], dtype=object)}
                )
            shingles = _word_shingles(df["text"].tolist(), k)
            return pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(),
                 "sh": [s.tobytes() for s in shingles]}
            )

    sh_df = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            CandidateShingles,
            fn_constructor_kwargs={"ref": ids_ref},
            batch_format="pandas",
            concurrency=2,
        )
        .to_pandas()  # candidate-bounded, not corpus-bounded
    )
    smap_ref = ray.put(dict(zip(sh_df["doc_id"], sh_df["sh"])))

    class VerifyJaccard:
        def __init__(self, ref):
            self.smap = {
                d: np.frombuffer(b, dtype=np.uint64)
                for d, b in ray.get(ref).items()
            }

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            jac = []
            for a, b in zip(df["id_a"], df["id_b"]):
                sa, sb = self.smap[int(a)], self.smap[int(b)]
                inter = np.intersect1d(sa, sb).size
                union = sa.size + sb.size - inter
                jac.append(inter / union if union else 1.0)
            return df.assign(jaccard=jac)

    verified = (
        ray.data.from_pandas(cand.reset_index(drop=True))
        .map_batches(
            VerifyJaccard,
            fn_constructor_kwargs={"ref": smap_ref},
            batch_format="pandas",
            concurrency=2,
        )
        .to_pandas()
    )
    out = verified[verified["jaccard"] >= jaccard_threshold].reset_index(drop=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


class SimHasher:
    """64-bit SimHash over single-space word tokens. The word hash is
    the first 8 bytes of md5 — chosen so the DuckDB oracle can compute
    the EXACT same function in SQL (hash-verified, not rows-only).
    Stateful actor: the word->hash cache persists across batches
    (SURVEY ST1 pattern); bit votes stay vectorized via reduceat."""

    def __init__(self):
        import hashlib

        self._md5 = hashlib.md5
        self._cache: dict[str, int] = {}

    def _hash_words(self, words: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(words, return_inverse=True)
        cache = self._cache
        md5 = self._md5
        vals = np.empty(uniq.size, dtype=np.uint64)
        for i, w in enumerate(uniq):
            h = cache.get(w)
            if h is None:
                h = int(md5(w.encode()).hexdigest()[:16], 16)
                cache[w] = h
            vals[i] = h
        return vals[inv]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].tolist()
        # split(' ') exactly (not split()): matches SQL string_split
        word_lists = [t.split(" ") for t in texts]
        counts = np.array([len(w) for w in word_lists], dtype=np.int64)
        all_words = np.array(
            [w for ws in word_lists for w in ws], dtype=object
        )
        out = np.zeros(len(df), dtype=np.uint64)
        if all_words.size:
            hs = self._hash_words(all_words)
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int64)
            nz = counts > 0
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            sums = np.add.reduceat(bits, starts[nz], axis=0)
            votes = sums * 2 - counts[nz][:, None]
            simbits = (votes > 0).astype(np.uint64)
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            out[nz] = (simbits * weights).sum(axis=1, dtype=np.uint64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                # hex string: avoids uint64/int64 comparator wraparound
                "simhash": [f"{int(v):016x}" for v in out],
            }
        )


def simhash(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        SimHasher, batch_format="pandas", concurrency=2, batch_size=4096
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.0, top_k: int = 10):
    """Embedding-cosine near-duplicate candidates within each label
    group (label plays the LSH-bucket role so the pair space stays
    bounded; a skewed label needs sub-bucketing at scale). Vectorized:
    per-group normalized matmul, per-group partial top-k, tiny global
    merge — the driver only ever sees k rows per group.

    Returns the ``top_k`` most similar pairs with sim >= threshold as
    (id_a, id_b) — deterministic and SQL-expressible, so this query is
    oracle-verified (r01 was rows-only AND returned 0 rows because the
    synthetic corpus has no pairs above 0.95)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        sim = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        s = sim[iu]
        mask = s >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        s = s[mask]
        order = np.lexsort((hi, lo, -s))[:top_k]  # sim desc, id tiebreak
        return pd.DataFrame(
            {"id_a": lo[order].astype("int64"),
             "id_b": hi[order].astype("int64"),
             "sim": s[order]}
        )

    parts = ds.groupby("label").map_groups(group_topk, batch_format="pandas")
    df = parts.to_pandas()  # k rows per label group only
    if df.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64")}
        )
    df = df.sort_values(
        ["sim", "id_a", "id_b"], ascending=[False, True, True]
    ).head(top_k)
    return df[["id_a", "id_b"]].reset_index(drop=True)
