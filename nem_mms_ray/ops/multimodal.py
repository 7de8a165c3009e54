"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns moved zero-copy through
Arrow; decode / feature-extract / resize / frame-sample run as actor-pool
map_batches stages.  The actual media libraries are NOT in this container
(per the build constraints), so the decode kernel is STUBBED — clearly
marked — behind `backend="fake"` (deterministic byte-level features) or
`backend="real"` (raises NotImplementedError).  The Ray-side plumbing
(schema, batch sizing for large blobs, actor signature, output layout) is
real and tested against the webtable html column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16


class DecodeMedia:
    """Actor-pool stage: binary payload -> (ok, width, height, format).

    STUB: `backend="real"` would dispatch to an image decoder (PIL/ffmpeg);
    unavailable here, raises NotImplementedError.  `backend="fake"` derives
    deterministic pseudo-metadata from the payload bytes so downstream
    plumbing (schema, nulls, batch sizing) is exercised end-to-end.
    """

    def __init__(self, payload_col: str = "html", backend: str = "fake"):
        if backend not in ("fake", "real"):
            raise ValueError(f"unknown backend {backend!r}")
        self.payload_col = payload_col
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "real":
            raise NotImplementedError(
                "media decoding requires an image/audio library not present "
                "in this environment; use backend='fake' for plumbing tests"
            )
        payloads = batch.column(self.payload_col)
        lengths = []
        oks = []
        w, h = [], []
        for v in payloads.to_pylist():
            if v is None:
                oks.append(False)
                lengths.append(0)
                w.append(None)
                h.append(None)
            else:
                oks.append(True)
                lengths.append(len(v))
                # deterministic fake dimensions from content
                w.append(64 + (len(v) % 1024))
                h.append(64 + (sum(v[:16]) % 1024) if len(v) else 64)
        out = batch.drop_columns([self.payload_col])
        return (
            out.append_column("media_ok", pa.array(oks, pa.bool_()))
            .append_column("media_bytes", pa.array(lengths, pa.int64()))
            .append_column("media_w", pa.array(w, pa.int32()))
            .append_column("media_h", pa.array(h, pa.int32()))
        )


class ExtractFeatures:
    """Actor-pool stage: binary payload -> fixed-dim feature vector.

    STUB kernel: 16-bin byte histogram (deterministic, vectorized) standing
    in for a real embedding model.  The actor pattern (weights loaded once
    in __init__), list<float> output schema and batch sizing are the real
    contract a model stage would use.
    """

    def __init__(self, payload_col: str = "html", dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.dim = dim
        # "model load" happens once per actor: here, the bin edges
        self.edges = np.linspace(0, 256, dim + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for v in batch.column(self.payload_col).to_pylist():
            if v is None or len(v) == 0:
                feats.append(np.zeros(self.dim, np.float32))
                continue
            arr = np.frombuffer(v, np.uint8)
            hist, _ = np.histogram(arr, bins=self.edges)
            feats.append((hist / len(arr)).astype(np.float32))
        out = batch.drop_columns([self.payload_col])
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class FrameSample:
    """Actor-pool stage: 'video' payload -> K fixed-stride byte frames.

    STUB for video frame sampling: slices K evenly-spaced fixed-size windows
    from the payload (a real backend would seek keyframes).  Output is one
    row per (id, frame_idx) — the flat_map-style explode a real sampler uses.
    """

    def __init__(self, payload_col: str = "html", id_col: str = "url",
                 k: int = 4, frame_bytes: int = 256):
        self.payload_col = payload_col
        self.id_col = id_col
        self.k = k
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for i, v in zip(batch.column(self.id_col).to_pylist(),
                        batch.column(self.payload_col).to_pylist()):
            if v is None or len(v) == 0:
                continue
            stride = max(1, (len(v) - self.frame_bytes) // max(1, self.k - 1))
            for f in range(self.k):
                off = min(f * stride, max(0, len(v) - self.frame_bytes))
                ids.append(i)
                fidx.append(f)
                frames.append(v[off : off + self.frame_bytes])
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def decode_media(ds, payload_col: str = "html", backend: str = "fake",
                 concurrency: int = 4, batch_size: int = 256):
    """Small batch_size: multi-MB blobs x concurrency must fit worker heaps."""
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"payload_col": payload_col, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_features(ds, payload_col: str = "html", concurrency: int = 4,
                     batch_size: int = 256):
    return ds.map_batches(
        ExtractFeatures,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
