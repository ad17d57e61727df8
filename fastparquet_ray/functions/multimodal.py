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
import pyarrow as pa

from ._util import pool_max as _pool_max


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


def _payload_bufs(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64, data uint8) views of a binary column."""
    n = len(col)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return offs, data


def _ragged_gather(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather variable slices -> (packed values, new offsets)."""
    total = int(lengths.sum())
    new_offs = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=new_offs[1:])
    idx = np.repeat(starts - new_offs[:-1], lengths) + np.arange(
        total, dtype=np.int64
    )
    return data[idx], new_offs


class FrameSampler:
    """Actor-pool frame sampling: payloads are treated as sequences of
    ``frame_bytes``-byte frames; every ``stride``-th frame is kept (a
    real video pipeline decodes containers here — same plumbing, the
    frame math is the deterministic stand-in). Fully vectorized over
    the Arrow binary buffers."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4):
        self.fb = frame_bytes
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("payload").combine_chunks()
        offs, data = _payload_bufs(col)
        lengths = np.diff(offs)
        n_frames = lengths // self.fb
        keep = (n_frames + self.stride - 1) // self.stride
        # kept bytes per row = keep * fb, gathered as strided frame runs
        out_lens = keep * self.fb
        row = np.repeat(np.arange(len(col)), keep)
        within = (
            np.arange(int(keep.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(keep)[:-1]]), keep)
        )
        frame_starts = offs[:-1][row] + within * self.stride * self.fb
        vals, new_offs = _ragged_gather(
            data, frame_starts, np.full(row.size, self.fb, dtype=np.int64)
        )
        arr = pa.Array.from_buffers(
            pa.binary(),
            len(col),
            [
                None,
                pa.py_buffer(
                    np.concatenate(
                        [[0], np.cumsum(out_lens)]
                    ).astype(np.int32).tobytes()
                ),
                pa.py_buffer(vals.tobytes()),
            ],
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "payload": arr,
                "media_type": t.column("media_type"),
                "n_frames": pa.array(n_frames, pa.int64()),
                "kept_frames": pa.array(keep, pa.int64()),
            }
        )


class Resizer:
    """Actor-pool resize stage: every payload is strided-resampled to
    exactly ``target`` bytes (image-resize stand-in; a real deployment
    loads the imaging library once per actor here). Vectorized gather."""

    def __init__(self, target: int = 256):
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column("payload").combine_chunks()
        offs, data = _payload_bufs(col)
        lengths = np.diff(offs)
        n = len(col)
        # per row: target indices floor(i * len / target), empty rows -> 0s
        pos = np.tile(np.arange(self.target, dtype=np.int64), n)
        row = np.repeat(np.arange(n, dtype=np.int64), self.target)
        ln = lengths[row]
        if data.size == 0:
            vals = np.zeros(n * self.target, dtype=np.uint8)
        else:
            src = offs[:-1][row] + np.where(ln > 0, pos * ln // self.target, 0)
            vals = np.where(
                ln > 0, data[np.minimum(src, np.maximum(offs[1:][row] - 1, 0))], 0
            ).astype(np.uint8)
        arr = pa.Array.from_buffers(
            pa.binary(),
            n,
            [
                None,
                pa.py_buffer(
                    (np.arange(n + 1, dtype=np.int64) * self.target)
                    .astype(np.int32)
                    .tobytes()
                ),
                pa.py_buffer(vals.tobytes()),
            ],
        )
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "payload": arr,
                "media_type": t.column("media_type"),
            }
        )
        for extra in ("n_frames", "kept_frames"):
            if extra in t.column_names:
                out = out.append_column(extra, t.column(extra))
        return out


def multimodal_pipeline(sf_dir: str):
    """Full media pipeline shape: payloads -> frame-sample -> resize ->
    feature-extract, three chained actor-pool stages with small batches
    (the Ray plumbing a real video/image pipeline needs; kernels are
    deterministic stand-ins — no media libs in this sandbox).
    Rows-only check (stub kernels are not SQL-expressible)."""
    ds = _payloads(sf_dir)
    # autoscaling (1, 2) pools: three chained fixed pools of 2 would
    # reserve 6 CPUs of minimum actors and can starve the upstream
    # read task on a small session (the dedup LSH pipeline wedged this
    # way on the 4-CPU test session) — a min of 1 per pool always
    # leaves CPUs for upstream tasks, and the pools still scale to 2
    # on a full-size session.
    ds = ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=512, concurrency=(1, _pool_max()),
        num_cpus=1,
    )
    ds = ds.map_batches(
        Resizer, batch_format="pyarrow", batch_size=512, concurrency=(1, _pool_max()),
        num_cpus=1,
    )
    ds = ds.map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, _pool_max()),
        num_cpus=1,
    )
    return ds


def multimodal_features(sf_dir: str):
    """payload -> feature pipeline: binary rows through an actor pool
    with small batches (large payloads: bound memory by rows-per-batch,
    not row count heuristics)."""
    ds = _payloads(sf_dir)
    return ds.map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        batch_size=512,  # small: payloads can be MBs each in real media
        concurrency=(1, _pool_max()),
        num_cpus=1,
    )
