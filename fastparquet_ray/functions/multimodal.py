"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by an actor-pool map_batches stage.

The image/audio libraries are not available in this environment, so the
decode kernel is a clearly-marked deterministic STUB — but the Ray-side
plumbing (binary schema, small batch sizing for large payloads, actor
signature, output layout) is real and tested, per the build brief.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _payloads(sf_dir: str):
    """Binary payload dataset: documents.text bytes stand in for an
    opaque media payload column (payload: binary, meta columns)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    def to_binary(t: pa.Table) -> pa.Table:
        payload = t.column("text").cast(pa.binary())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": payload,
                "media_type": pa.array(["text/plain"] * t.num_rows),
                "source": t.column("source"),
            }
        )

    return ds.map_batches(to_binary, batch_format="pyarrow")


class FeatureExtractor:
    """Actor-pool media feature extractor.

    Real deployments load a decoder/model here (once per actor). In
    this sandbox the decode step is STUBBED with a deterministic fake:
    features are byte-histogram moments of the payload. Set
    ``strict=True`` to see the NotImplementedError a real decoder would
    replace.
    """

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.dim = feature_dim
        self.strict = strict

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio libs not present in "
                "this environment; deterministic stub used instead"
            )
        b = np.frombuffer(payload, dtype=np.uint8)
        if b.size == 0:
            return np.zeros(self.dim)
        hist = np.bincount(b % self.dim, minlength=self.dim).astype(np.float64)
        return hist / b.size

    def _decode_batch(self, col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized stub decode over the whole batch: the Arrow binary
        buffers (offsets + data) are sliced directly — no per-row
        .as_py() materialization (r01 scale defect). Returns
        (per-row normalized byte histograms, per-row byte lengths)."""
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio libs not present in "
                "this environment; deterministic stub used instead"
            )
        n = len(col)
        if n == 0:
            return np.zeros((0, self.dim)), np.zeros(0, dtype=np.int64)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        lengths = np.diff(offs)
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        vals = data[offs[0] : offs[-1]].astype(np.int64) % self.dim
        h = np.bincount(row * self.dim + vals, minlength=n * self.dim).reshape(
            n, self.dim
        )
        hist = h / np.maximum(lengths, 1)[:, None]
        return hist, lengths

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("payload").combine_chunks()
        m, lengths = self._decode_batch(col)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "feat_mean": pa.array(m.mean(axis=1)),
                "feat_max": pa.array(m.max(axis=1) if len(m) else []),
                "payload_bytes": pa.array(lengths, pa.int64()),
            }
        )


def multimodal_features(sf_dir: str):
    """payload -> feature pipeline: binary rows through an actor pool
    with small batches (large payloads: bound memory by rows-per-batch,
    not row count heuristics)."""
    ds = _payloads(sf_dir)
    return ds.map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        batch_size=512,  # small: payloads can be MBs each in real media
        concurrency=2,
        num_cpus=1,
    )
