"""Multimodal span processing: decode / feature-extract stages.

Media payloads are opaque ``binary`` columns + typed metadata; decode
stages are actor pools so codec state loads once per worker. The actual
decoders (PIL/ffmpeg) are NOT in this container — the decode kernel is
stubbed behind ``MediaDecodeStub`` (deterministic fake: stable
pseudo-metadata from the payload hash), while the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and
tested. Swap ``_decode_stub`` for a real kernel on a cluster with
codecs installed.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
        pa.field("sha256", pa.string()),
    ]
)


def _decode_stub(kind: str, payload: bytes) -> dict:
    """Deterministic fake decode. A real kernel would raise
    NotImplementedError here until PIL/ffmpeg are available."""
    digest = hashlib.sha256(payload).hexdigest()
    seed = int(digest[:8], 16)
    width = 64 + (seed % 1920)
    height = 64 + ((seed >> 8) % 1080)
    duration = (seed >> 16) % 600_000 if kind in ("video", "audio") else 0
    return {
        "n_bytes": len(payload),
        "width": width if kind in ("image", "video") else 0,
        "height": height if kind in ("image", "video") else 0,
        "duration_ms": duration,
        "sha256": digest,
    }


class MediaDecodeStub:
    """Actor-pool stage over rows of (doc_id, media_ref, kind, payload).

    Large binary payloads → keep ``batch_size`` small (e.g. 4-16) so a
    batch × concurrency fits worker heap; the object store spills the
    rest. Per-item failures become ``error`` values, not task failures.
    """

    def __init__(self, decoder=None):
        self.decoder = decoder or _decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = (
            batch.column("payload").to_pylist()
            if "payload" in batch.column_names
            else [b""] * len(doc_ids)
        )
        metas, errors = [], []
        for kind, ref, payload in zip(kinds, refs, payloads):
            try:
                info = self.decoder(kind or "", payload or b"")
                metas.append({"media_ref": ref or "", "kind": kind or "", **info})
                errors.append("")
            except NotImplementedError as exc:
                metas.append(
                    {
                        "media_ref": ref or "", "kind": kind or "", "n_bytes": len(payload or b""),
                        "width": 0, "height": 0, "duration_ms": 0, "sha256": "",
                    }
                )
                errors.append(f"decode-unavailable: {exc}")
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(metas, type=MEDIA_META_TYPE),
                pa.array(errors, type=pa.string()),
            ],
            names=["doc_id", "media_meta", "error"],
        )


def media_spans_table(article_batch: pa.Table) -> pa.Table:
    """Explode extracted article rows into one row per media span —
    the hand-off from extraction output to media-processing stages."""
    out_doc, out_ref, out_kind, out_offset = [], [], [], []
    for doc_id, spans in zip(
        article_batch.column("doc_id").to_pylist(),
        article_batch.column("spans").to_pylist(),
    ):
        for span in spans or []:
            if span["kind"] in ("image", "video", "embed") and span["media_ref"]:
                out_doc.append(doc_id)
                out_ref.append(span["media_ref"])
                out_kind.append(span["kind"])
                out_offset.append(span["offset"])
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(out_doc, type=pa.string()),
            "media_ref": pa.array(out_ref, type=pa.string()),
            "kind": pa.array(out_kind, type=pa.string()),
            "offset": pa.array(out_offset, type=pa.int32()),
        }
    )
