"""Universal fallback codec: the column chunk as an Arrow IPC stream.

Covers every type the typed codecs don't (list/struct/map/decimal...):
exact round-trip incl. nulls comes from Arrow's own serialization, at
roughly plain-storage size.  The selector never *scores* it (estimate is
inf); the encode planner assigns it explicitly when a column's type has no
sketch/typed-codec support — the engine-wide analog of the reference's
Error::UnsupportedDataType (/root/reference/src/flatfile.rs:143) except the
unit is stored rather than aborting the run, per the skip-vs-abort split
(/root/reference/src/packages/mod.rs:201-216).
"""

from __future__ import annotations

import io

import pyarrow as pa

from nem_mms_ray.codecs.base import Codec, EncodedColumn, register


class IpcCodec(Codec):
    """Arrow-IPC passthrough (any type, exact, ~plain size)."""

    name = "ipc"

    def can_encode(self, typ: pa.DataType) -> bool:
        return True

    def estimate(self, sketch) -> float:
        return float("inf")  # explicit-fallback only, never competes

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = pa.table({"c": arr})
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        payload = sink.getvalue()
        return EncodedColumn(
            codec=self.name,
            n=len(arr),
            dtype="ipc",            # the IPC stream itself carries the schema
            payload=payload,
            validity=None,          # nulls live inside the stream
            params={},
        )

    def decode(self, ec: EncodedColumn) -> pa.Array:
        with pa.ipc.open_stream(pa.py_buffer(ec.payload)) as r:
            t = r.read_all()
        return t.column("c").combine_chunks()


register(IpcCodec())
