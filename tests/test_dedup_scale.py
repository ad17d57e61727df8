"""VERDICT r02 #2/#3: dedup shuffles are keyed on a 128-bit text hash
(never the full text) and LSH bucket fan-out is capped — a degenerate
bucket of N identical docs yields O(N) candidates, not N^2/2."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions import dedup


@pytest.fixture()
def dup_corpus(tmp_path):
    """40 distinct texts, each duplicated a different number of times,
    shuffled across two fragments."""
    rng = np.random.default_rng(7)
    rows = []
    did = 0
    for i in range(40):
        text = " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "eps"], 12).tolist()
        ) + f" uniq{i}"
        for _ in range(1 + i % 4):
            rows.append((did, text, "en", ["web", "book"][i % 2], len(text)))
            did += 1
    rng.shuffle(rows)
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    return str(tmp_path), df


def test_dedup_exact_hash_grouping_equals_text_grouping(ray_session, dup_corpus):
    sf_dir, df = dup_corpus
    got = (
        dedup.dedup_exact(sf_dir)
        .to_pandas()
        .sort_values("text")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("text")
        .agg(keep_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        .reset_index()
        .sort_values("text")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["text", "keep_id", "n_dups"]],
        want[["text", "keep_id", "n_dups"]],
        check_dtype=False,
    )


def test_corpus_clean_matches_pandas_reference(ray_session, dup_corpus):
    sf_dir, df = dup_corpus
    got = (
        dedup.corpus_clean(sf_dir)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    surv = df.sort_values("doc_id").drop_duplicates("text", keep="first")
    words = surv["text"].str.count(" ") + 1
    awl = surv["n_chars"] / words
    kept = surv[(words >= 10) & (words <= 2000) & (awl >= 3.0) & (awl <= 12.0)]
    want = (
        kept.groupby("source")
        .size()
        .rename("n_kept")
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lsh_degenerate_bucket_bounded(ray_session, tmp_path):
    """1000 identical docs land in one LSH bucket in every band: the
    star cap must emit N-1 candidate pairs, not N^2/2 ~ 500k."""
    n = 1000
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [text] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = dedup.minhash_lsh_pairs(str(tmp_path))
    # star over the cluster: every doc pairs with the min id only
    assert len(out) == n - 1
    assert (out["id_a"] == 0).all()
    assert (out["jaccard"] == 1.0).all()
    assert sorted(out["id_b"].tolist()) == list(range(1, n))


def test_embedding_neardup_skewed_label_tiled_exact(ray_session, tmp_path):
    """A skewed label group (3000 identical vectors) runs through the
    TILE x n blocked matmul — bounded memory — and still returns the
    EXACT top-k by (sim desc, id asc): the all-ties case is decided
    purely by ids, so any approximate truncation would be caught."""
    n_ident, n_rand = 3000, 64
    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    vecs = [base.copy() for _ in range(n_ident)] + [
        rng.normal(size=16) for _ in range(n_rand)
    ]
    ids = rng.permutation(100_000)[: n_ident + n_rand].astype(np.int64)
    df = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": ["hot"] * (n_ident + n_rand),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "embeddings.parquet")
    out = dedup.embedding_neardup(str(tmp_path), threshold=0.999, top_k=5)
    # every identical pair ties at sim 1.0 -> winners are the 5
    # lexicographically-smallest (lo, hi) pairs among the identical ids
    ident_ids = np.sort(ids[:n_ident])
    lo0 = ident_ids[0]
    want = [(int(lo0), int(h)) for h in ident_ids[1:6]]
    got = list(zip(out["id_a"].tolist(), out["id_b"].tolist()))
    assert got == want

def test_ngram_jaccard_pairs_exact_vs_allpairs(ray_session, tmp_path):
    """Prefix-filter exact similarity join equals brute-force all-pairs
    shingle Jaccard — including pairs whose Jaccard sits just above
    the threshold (lossless candidate generation, not LSH recall)."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(60):
        texts.append(" ".join(rng.choice(vocab, 20).tolist()))
    # plant near-dup pairs at varied similarity levels
    for i in range(0, 24, 2):
        words = texts[i].split(" ")
        mutated = list(words)
        for j in range(i % 7):  # 0..6 word edits
            mutated[rng.integers(0, len(mutated))] = rng.choice(vocab)
        texts.append(" ".join(mutated))
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["web"] * n,
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    got = dedup.ngram_jaccard_pairs(str(tmp_path), jaccard_threshold=0.5)

    # brute force ground truth over word 3-shingle sets
    def shset(t):
        ws = t.split(" ")
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shset(t) for i, t in enumerate(texts)}
    want = []
    for a in range(n):
        for b in range(a + 1, n):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union if union else 1.0
            if j >= 0.5:
                want.append((a, b, j))
    assert len(want) > 3  # the planted pairs actually exist
    got_pairs = list(
        zip(got["id_a"].tolist(), got["id_b"].tolist(), got["jaccard"].tolist())
    )
    assert len(got_pairs) == len(want)
    for (ga, gb, gj), (wa, wb, wj) in zip(got_pairs, sorted(want)):
        assert (ga, gb) == (wa, wb)
        assert abs(gj - wj) < 1e-12
