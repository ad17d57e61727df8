"""Text-analysis operators over the documents table: token counting,
quality scoring, document fingerprinting, language-ID — the
training-data-pipeline companions to the encode engine. All are
vectorized map_batches stages; stateful ones (lang-ID profiles) are
actor classes.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def token_count(sf_dir: str):
    """Whitespace token count per document (oracle-matching definition:
    words = spaces + 1). Vectorized pandas str ops."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n_words = (df["text"].str.count(" ") + 1).astype("int64")
        return pd.DataFrame({"doc_id": df["doc_id"], "n_words": n_words})

    return ds.map_batches(fn, batch_format="pandas")


class BpeishCounter:
    """BPE-ish regex token counting — the regex is compiled ONCE per
    actor (the stateful-stage pattern, SURVEY ST1 / ray_guide). The
    pattern is RE2-compatible so the DuckDB oracle can run the exact
    same one."""

    PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"

    def __init__(self):
        import re

        self.pat = re.compile(self.PATTERN)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = [len(self.pat.findall(t)) for t in df["text"].tolist()]
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_bpe": pd.Series(n, dtype="int64")}
        )


def token_count_bpe(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        BpeishCounter, batch_format="pandas", concurrency=2, batch_size=4096
    )


def quality_score(sf_dir: str):
    """Per-source quality aggregates: doc length, word count, average
    word length (reference has no analog; core training-data op).
    Pre-aggregated per batch before the tiny groupby."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["source", "text", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = (df["text"].str.count(" ") + 1).astype("int64")
        g = pd.DataFrame(
            {
                "source": df["source"],
                "chars": df["n_chars"].astype("int64"),
                "words": words,
            }
        ).groupby("source", as_index=False).agg(
            sum_chars=("chars", "sum"),
            sum_words=("words", "sum"),
            n=("chars", "size"),
        )
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    agg = parts.groupby("source").aggregate(
        Sum("sum_chars", alias_name="sum_chars"),
        Sum("sum_words", alias_name="sum_words"),
        Sum("n", alias_name="n"),
    )
    df = agg.to_pandas()
    df["avg_chars"] = df["sum_chars"] / df["n"]
    df["avg_words"] = df["sum_words"] / df["n"]
    return df[["source", "avg_chars", "avg_words", "n"]]


def fingerprint(sf_dir: str):
    """Content fingerprint per document (md5, matching DuckDB's md5()
    for the oracle). Distributed via map_batches; the per-row hash loop
    is the hash itself, not pipeline overhead."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fp = [
            hashlib.md5(t.encode()).hexdigest() for t in df["text"].tolist()
        ]
        return pd.DataFrame({"doc_id": df["doc_id"], "fp": fp})

    return ds.map_batches(fn, batch_format="pandas")


def adjacent_similarity(sf_dir: str):
    """Character-set Jaccard similarity between consecutive documents
    (definition matches DuckDB's jaccard(s1, s2) so the oracle can
    verify a similarity computation end-to-end).

    Scale note: pairs are formed per-batch after a sort on doc_id; the
    one cross-batch pair per boundary is recovered from boundary rows
    on the driver (O(#blocks) work)."""
    import ray.data

    ds = _docs(sf_dir, ["doc_id", "text"]).sort("doc_id")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        a = df.iloc[:-1].reset_index(drop=True)
        b = df.iloc[1:].reset_index(drop=True)
        sets_a = [set(t) for t in a["text"]]
        sets_b = [set(t) for t in b["text"]]
        sim = [
            len(x & y) / len(x | y) if (x | y) else 1.0
            for x, y in zip(sets_a, sets_b)
        ]
        return pd.DataFrame(
            {"id_a": a["doc_id"], "id_b": b["doc_id"], "sim": sim}
        )

    # consecutive pairs within and across batch boundaries: iterate the
    # sorted stream once on the driver with a 1-row carry — per-pair
    # work stays vectorized in pandas
    outs = []
    carry = None
    for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):
        if carry is not None:
            batch = pd.concat([carry, batch], ignore_index=True)
        outs.append(pairs(batch))
        carry = batch.iloc[[-1]]
    out = (
        pd.concat(outs, ignore_index=True)
        if outs
        else pairs(pd.DataFrame({"doc_id": [], "text": []}))
    )
    return out


class LangId:
    """Heuristic language ID from character n-gram profiles — a
    stateful actor stage: profiles are built once per actor in
    __init__ (SURVEY.md ST1 pattern). Deterministic; rows-only check
    (the heuristic is not SQL-expressible)."""

    PROFILES = {
        "en": "the and of to in is that it was for on are with as",
        "es": "el la de que y en los se del las un por con una",
        "de": "der die und in den von zu das mit sich des auf",
        "fr": "le de la et les des en un du une que est pour",
        "zh": "的 一 是 在 不 了 有 和 人 这 中 大 为 上",
    }

    def __init__(self):
        self.grams = {}
        for lang, words in self.PROFILES.items():
            g = set()
            for w in words.split():
                s = f" {w} "
                g.update(s[i : i + 2] for i in range(len(s) - 1))
            self.grams[lang] = g

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in df["text"].tolist():
            t = f" {text[:200].lower()} "
            bigrams = {t[i : i + 2] for i in range(len(t) - 1)}
            scores = {
                lang: len(bigrams & g) / max(len(g), 1)
                for lang, g in self.grams.items()
            }
            preds.append(max(sorted(scores), key=lambda k: scores[k]))
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": preds})


def lang_id(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pandas", concurrency=2, batch_size=4096
    )
