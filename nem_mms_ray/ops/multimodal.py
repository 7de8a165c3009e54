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


def sniff_media(buf: bytes) -> tuple[str, int, int] | None:
    """Pure-stdlib image metadata decoder: (format, width, height) for
    PNG / GIF / BMP / JPEG / PPM-family headers, None if unrecognized.

    This is the `backend="real"` kernel — real header parsing with no
    external media library (none exists in this container).  Pixel-level
    decode of compressed formats is out of scope and documented as such.
    """
    n = len(buf)
    if n >= 24 and buf[:8] == b"\x89PNG\r\n\x1a\n" and buf[12:16] == b"IHDR":
        return ("png", int.from_bytes(buf[16:20], "big"),
                int.from_bytes(buf[20:24], "big"))
    if n >= 10 and buf[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(buf[6:8], "little"),
                int.from_bytes(buf[8:10], "little"))
    if n >= 26 and buf[:2] == b"BM":
        return ("bmp", int.from_bytes(buf[18:22], "little", signed=True),
                abs(int.from_bytes(buf[22:26], "little", signed=True)))
    if n >= 4 and buf[:2] == b"\xff\xd8":  # JPEG: walk segments to SOFn
        i = 2
        while i + 9 < n:
            if buf[i] != 0xFF:
                return None
            marker = buf[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(buf[i + 2 : i + 4], "big")
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return ("jpeg", int.from_bytes(buf[i + 7 : i + 9], "big"),
                        int.from_bytes(buf[i + 5 : i + 7], "big"))
            i += 2 + seg_len
        return None
    if n >= 2 and buf[0:1] == b"P" and buf[1:2] in b"123456":
        # PNM: ASCII width/height after magic, '#' comments allowed
        fields: list[int] = []
        i = 2
        while i < n and len(fields) < 2:
            c = buf[i : i + 1]
            if c == b"#":
                while i < n and buf[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            elif c.isdigit():
                j = i
                while j < n and buf[j : j + 1].isdigit():
                    j += 1
                fields.append(int(buf[i:j]))
                i = j
            else:
                return None
        if len(fields) == 2:
            return ("pnm", fields[0], fields[1])
    return None


class DecodeMedia:
    """Actor-pool stage: binary payload -> (ok, bytes, width, height, format).

    `backend="real"` parses actual image headers (`sniff_media`: PNG / GIF /
    BMP / JPEG / PNM) with no external library; unrecognized payloads get
    media_ok=False.  `backend="fake"` derives deterministic pseudo-metadata
    from the payload bytes so plumbing tests run on any binary column
    (e.g. the webtable html column).
    """

    def __init__(self, payload_col: str = "html", backend: str = "fake"):
        if backend not in ("fake", "real"):
            raise ValueError(f"unknown backend {backend!r}")
        self.payload_col = payload_col
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col)
        lengths = []
        oks = []
        w, h, fmt = [], [], []
        for v in payloads.to_pylist():
            if v is None:
                oks.append(False)
                lengths.append(0)
                w.append(None)
                h.append(None)
                fmt.append(None)
            elif self.backend == "real":
                meta = sniff_media(v)
                lengths.append(len(v))
                if meta is None:
                    oks.append(False)
                    w.append(None)
                    h.append(None)
                    fmt.append(None)
                else:
                    oks.append(True)
                    fmt.append(meta[0])
                    w.append(meta[1])
                    h.append(meta[2])
            else:
                oks.append(True)
                lengths.append(len(v))
                # deterministic fake dimensions from content
                w.append(64 + (len(v) % 1024))
                h.append(64 + (sum(v[:16]) % 1024) if len(v) else 64)
                fmt.append("fake")
        out = batch.drop_columns([self.payload_col])
        return (
            out.append_column("media_ok", pa.array(oks, pa.bool_()))
            .append_column("media_bytes", pa.array(lengths, pa.int64()))
            .append_column("media_w", pa.array(w, pa.int32()))
            .append_column("media_h", pa.array(h, pa.int32()))
            .append_column("media_format", pa.array(fmt, pa.string()))
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
