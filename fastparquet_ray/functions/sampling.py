"""Deterministic corpus sampling operators (SURVEY.md §2.7 "sampling"
extended to the training-data shapes): hash-Bernoulli row sampling,
stratified per-group quotas, and weighted training-mixture assembly.

All three key on md5(doc_id) — a content hash, NOT randomness — so a
sample is reproducible across runs, machines, and engines (the DuckDB
oracle computes the identical hash in SQL, the simhash/fingerprint
precedent). Reference analog: fastparquet has no sampling; its head
slicing (api.py:387-475 row-group selection) is positional, which is
not stable under repartition — hash sampling is.

Scale notes: sample_hash is embarrassingly parallel (stateless filter,
no exchange). The stratified/mixture samplers use the token_topk
shape — per-block partial quota -> groupby(source) final quota — so
the one exchange moves at most blocks x sources x k rows, never the
corpus. md5 per doc_id is a per-row loop here because the oracle must
reproduce it bit-for-bit; a production pipeline would swap in a
vectorized 128-bit hash (pd.util.hash_array) with identical
architecture.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd


def _docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _md5_u64(ids: np.ndarray) -> np.ndarray:
    """First 16 hex chars of md5(str(id)) as uint64 — matches DuckDB's
    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 16))::UBIGINT."""
    out = np.empty(ids.size, dtype=np.uint64)
    md5 = hashlib.md5
    for i, v in enumerate(ids):
        out[i] = int(md5(str(int(v)).encode()).hexdigest()[:16], 16)
    return out


def sample_hash(sf_dir: str, rate_pct: int = 5) -> pd.DataFrame:
    """Deterministic Bernoulli sample: keep rows whose
    md5(doc_id) % 100 < rate_pct. Stateless per-batch filter — zero
    exchange, prunes to (doc_id, source, n_chars) at the read."""
    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def fil(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_u64(df["doc_id"].to_numpy())
        return df[(h % np.uint64(100)) < rate_pct]

    out = ds.map_batches(fil, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _quota_sample(
    ds, quotas: dict[str, int], default_quota: int = 0
) -> pd.DataFrame:
    """Shared tail of the stratified/mixture samplers: per-block
    partial quota per source, then a tiny groupby(source) final quota.
    Selection order is (md5(doc_id), doc_id) ascending — a total,
    engine-independent order. Sources outside ``quotas`` get
    ``default_quota`` (0 = excluded, pruned before the exchange)."""
    max_k = max(list(quotas.values()) + [default_quota], default=0)
    qset = set(quotas)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if default_quota == 0 and not df.empty:
            df = df[df["source"].isin(qset)]
        if df.empty or max_k == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "source": pd.Series([], dtype="object"),
                 "h": pd.Series([], dtype="uint64")}
            )
        df = df.assign(h=_md5_u64(df["doc_id"].to_numpy()))
        df = df.sort_values(["h", "doc_id"])
        return df.groupby("source", sort=False).head(max_k)[
            ["doc_id", "source", "h"]
        ]

    def final(g: pd.DataFrame) -> pd.DataFrame:
        k = quotas.get(str(g["source"].iloc[0]), default_quota)
        g = g.sort_values(["h", "doc_id"]).head(k)
        return g[["doc_id", "source"]]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


def sample_stratified(sf_dir: str, per_source: int = 10) -> pd.DataFrame:
    """Equal per-source quota: the per_source hash-smallest docs of
    every source (deterministic stratified subsample)."""
    ds = _docs(sf_dir, ["doc_id", "source"])
    return _quota_sample(ds, {}, default_quota=per_source)


# default training mix: named source weights, everything else excluded
MIXTURE_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
MIXTURE_TOTAL = 60


def mixture_sample(
    sf_dir: str,
    weights: dict[str, float] | None = None,
    total: int = MIXTURE_TOTAL,
) -> pd.DataFrame:
    """Weighted training-mixture assembly: per-source quotas
    round(total * weight), filled with each source's hash-smallest
    docs. The canonical 'build a 60/30/10 training mix' operation,
    deterministic end to end."""
    weights = MIXTURE_WEIGHTS if weights is None else weights
    quotas = {s: int(round(total * w)) for s, w in weights.items()}
    ds = _docs(sf_dir, ["doc_id", "source"])
    return _quota_sample(ds, quotas)


def split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment: every document
    lands in exactly one split by md5(doc_id) bucket (90/5/5) —
    stable across runs, machines and engine versions, the property a
    reproducible training corpus needs. Returns the per
    (source, split) membership counts.

    Scale shape: zero exchange for the assignment itself (a stateless
    per-batch hash), one tiny (sources x 3)-sized partial-count merge
    for the report. The same fil() applied as a filter materializes
    any one split without touching the others."""
    ds = _docs(sf_dir, ["doc_id", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "split": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            )
        b = (_md5_u64(df["doc_id"].to_numpy()) % np.uint64(100)).astype(
            np.int64
        )
        split = np.where(b < 90, "train", np.where(b < 95, "val", "test"))
        out = (
            pd.DataFrame({"source": df["source"].to_numpy(), "split": split})
            .groupby(["source", "split"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out

    from .groupagg import merge_partials

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "split"], {"n": "sum"},
    )
    return out.sort_values(["source", "split"]).reset_index(drop=True)


def shuffle_head(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """First k examples of the DETERMINISTIC global corpus shuffle —
    the reproducible training-order primitive: epoch order is
    md5(doc_id) ascending (doc_id tie-break), so every run, machine
    and engine version feeds the model the identical sequence, and
    any contiguous slice of the shuffle is addressable without
    materializing the permutation.

    Scale shape: select-k, not sort — each block keeps its k
    hash-smallest rows (per-block partial), the driver merges
    blocks x k candidate rows and ranks the winners. The full
    corpus is never exchanged or ordered; a 100 TB shuffle head
    costs one streaming scan plus a k-row fold."""
    ds = _docs(sf_dir, ["doc_id", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(h=pd.Series([], dtype="uint64"))
        df = df.assign(h=_md5_u64(df["doc_id"].to_numpy()))
        return df.sort_values(["h", "doc_id"]).head(k)

    out = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = out.sort_values(["h", "doc_id"]).head(k).reset_index(drop=True)
    out["pos"] = np.arange(1, len(out) + 1, dtype="int64")
    return out[["pos", "doc_id", "source"]]


def weighted_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, public algorithm): weight w = n_chars,
    uniform u = md5(doc_id)/2^64, key = ln(u)/w; the global top-k
    keys ARE a weighted sample without replacement — long docs win
    proportionally more often, yet the draw is fully reproducible
    (no RNG state, stable across engines — the md5 parity the
    sample_hash family already proves against DuckDB).

    Scale shape: select-k, not sort — each block keeps its k best
    (rounded key DESC, doc_id ASC) candidates, the driver merges
    blocks x k rows. Zero exchange beyond the candidate fold."""
    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "source": pd.Series([], dtype="object"),
         "es_key": pd.Series([], dtype="float64")}
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty
        h = _md5_u64(df["doc_id"].to_numpy())
        u = h.astype(np.float64) / 18446744073709551616.0
        w = np.maximum(df["n_chars"].to_numpy(np.float64), 1.0)
        key = np.round(np.log(u) / w, 6)
        doc = df["doc_id"].to_numpy().astype(np.int64)
        o = np.lexsort((doc, -key))[: min(len(doc), k)]
        return pd.DataFrame(
            {"doc_id": doc[o],
             "source": df["source"].to_numpy()[o],
             "es_key": key[o]}
        )

    cand = ds.map_batches(part, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["es_key", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    return cand.head(k).reset_index(drop=True)
