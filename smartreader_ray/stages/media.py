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


# ---------------------------------------------------------------------------
# data-URI image inlining (Image.cs:29-36, Article.cs:236-260)
# ---------------------------------------------------------------------------
#: extension (no dot, lowercase) → mime type; the reference delegates to
#: the MimeTypeNames package — this is the image/video subset it resolves.
MIME_FROM_EXTENSION = {
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "webp": "image/webp", "svg": "image/svg+xml",
    "bmp": "image/bmp", "ico": "image/x-icon", "tif": "image/tiff",
    "tiff": "image/tiff", "avif": "image/avif",
    "mp4": "video/mp4", "webm": "video/webm", "ogv": "video/ogg",
    "mp3": "audio/mpeg", "ogg": "audio/ogg", "wav": "audio/wav",
}


def convert_image_to_data_uri(path: str, data: bytes) -> str:
    """`Image.ConvertImageToDataUri` parity (Image.cs:29-36): mime from
    the path's last-dot extension, standard padded base64."""
    import base64

    dot = path.rfind(".")
    ext = path[dot + 1 :].lower() if dot > 0 else ""
    # strip URL query/fragment remnants ("logo.png?v=2")
    ext = ext.split("?", 1)[0].split("#", 1)[0]
    mime = MIME_FROM_EXTENSION.get(ext, "application/octet-stream")
    return f"data:{mime};base64,{base64.b64encode(data).decode('ascii')}"


def convert_images_to_data_uri(
    content_html: str, fetch, min_size: int = 75000
) -> tuple[str, int, int]:
    """`Article.ConvertImagesToDataUriAsync` parity (Article.cs:236-260):
    every ``<img src>`` whose payload exceeds ``min_size`` bytes gets its
    src replaced by the data-URI form; smaller images are REMOVED; fetch
    errors leave the img untouched (the reference's bare catch).

    ``fetch(src) -> bytes`` replaces the network GET (out of scope here);
    pipelines pass a payload-column resolver or the deterministic stub.
    Returns (new_html, n_inlined, n_removed).
    """
    from urllib.parse import urlparse

    from ..dom import parse_html
    from ..dom.serialize import inner_html

    doc = parse_html(content_html)
    body = doc.body
    if body is None:
        return content_html, 0, 0
    inlined = removed = 0
    for img in list(body.get_elements_by_tag_name("img")):
        src = img.get_attribute("src")
        if not src or src.startswith("data:"):
            continue
        try:
            data = fetch(src)
            if data is None:
                continue
            if len(data) > min_size:
                img.set_attribute(
                    "src", convert_image_to_data_uri(urlparse(src).path, data)
                )
                inlined += 1
            else:
                img.remove()
                removed += 1
        except Exception:
            continue
    return inner_html(body), inlined, removed


def _payload_stub(media_ref: str) -> bytes:
    """Deterministic fake image bytes (size derived from the ref hash) —
    stands in for the network GET the sandbox cannot do."""
    digest = hashlib.sha256((media_ref or "").encode()).digest()
    size = 1000 + int.from_bytes(digest[:4], "big") % 200_000
    reps = -(-size // len(digest))
    return (digest * reps)[:size]


class ImageDataUriInliner:
    """Actor-pool stage over extracted article rows: rewrite
    ``content_html`` inlining images as data URIs (resolver-fed payloads,
    default deterministic stub). Emits per-doc inline/remove counts."""

    def __init__(self, resolver=None, min_size: int = 75000):
        self.resolver = resolver or _payload_stub
        self.min_size = min_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_html, out_inlined, out_removed = [], [], []
        for html in batch.column("content_html").to_pylist():
            new_html, n_in, n_rm = convert_images_to_data_uri(
                html or "", self.resolver, self.min_size
            )
            out_html.append(new_html)
            out_inlined.append(n_in)
            out_removed.append(n_rm)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "content_html": pa.array(out_html, type=pa.string()),
                "n_inlined": pa.array(out_inlined, type=pa.int64()),
                "n_removed": pa.array(out_removed, type=pa.int64()),
            }
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


# ---------------------------------------------------------------------------
# resize / frame-sample / feature-extract stages
#
# A documented fake codec ("FIMG"/"FVID" framing, below) stands in for
# PIL/ffmpeg so every stage's plumbing — schema, actor signature, batch
# sizing, flat-map expansion — runs and is tested end to end in this
# container; swap the two `_fake_*` kernels for real decoders on a
# cluster with codecs. The byte-histogram feature extractor needs no
# codec at all and is fully real.

FIMG_MAGIC = b"FIMG"
FVID_MAGIC = b"FVID"


def fake_image_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Sandbox image format: magic + uint16 w/h (big-endian) + pixels."""
    return (FIMG_MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big")
            + pixels)


def _fake_image_decode(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:4] != FIMG_MAGIC or len(payload) < 8:
        raise NotImplementedError("not a FIMG payload (real codec required)")
    w = int.from_bytes(payload[4:6], "big")
    h = int.from_bytes(payload[6:8], "big")
    return w, h, payload[8:]


def fake_video_encode(frames: list[bytes]) -> bytes:
    """Sandbox video format: magic + uint16 frame count, then per frame
    uint32 length + bytes."""
    out = [FVID_MAGIC, len(frames).to_bytes(2, "big")]
    for f in frames:
        out.append(len(f).to_bytes(4, "big"))
        out.append(f)
    return b"".join(out)


def _fake_video_decode(payload: bytes):
    if payload[:4] != FVID_MAGIC or len(payload) < 6:
        raise NotImplementedError("not a FVID payload (real codec required)")
    n = int.from_bytes(payload[4:6], "big")
    pos = 6
    for _ in range(n):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        pos += 4
        yield payload[pos:pos + ln]
        pos += ln


class ImageResizeStage:
    """Actor-pool stage: (doc_id, media_ref, payload) → resized payload
    + before/after dimensions. The "resize" kernel on the fake codec is
    a deterministic pixel-stride subsample — real enough to verify byte
    budgets shrink and the output schema holds. Per-item codec failures
    become error rows (the skew/error philosophy of `ExtractBatch`).

    Batch sizing rule for binary columns: payload_bytes × batch_size ×
    concurrency must fit the worker heap — callers pass batch_size≈4-16
    for multi-MB images.
    """

    def __init__(self, max_dim: int = 256):
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_payload, out_w, out_h, src_w, src_h, errors = [], [], [], [], [], []
        for p in payloads:
            try:
                w, h, px = _fake_image_decode(p or b"")
                scale = max(w, h) / self.max_dim if max(w, h) > self.max_dim else 1.0
                nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
                stride = max(1, int(scale))
                npx = px[::stride] if stride > 1 else px
                out_payload.append(fake_image_encode(nw, nh, npx))
                out_w.append(nw); out_h.append(nh)
                src_w.append(w); src_h.append(h)
                errors.append("")
            except NotImplementedError as exc:
                out_payload.append(b"")
                out_w.append(0); out_h.append(0); src_w.append(0); src_h.append(0)
                errors.append(str(exc))
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(refs, type=pa.string()),
                pa.array(out_payload, type=pa.binary()),
                pa.array(src_w, type=pa.int32()),
                pa.array(src_h, type=pa.int32()),
                pa.array(out_w, type=pa.int32()),
                pa.array(out_h, type=pa.int32()),
                pa.array(errors, type=pa.string()),
            ],
            names=["doc_id", "media_ref", "payload", "src_width", "src_height",
                   "width", "height", "error"],
        )


class FrameSampleStage:
    """Actor-pool flat-map: one input video row → one output row per
    sampled frame (every ``every_k``-th). The row-count expansion is the
    real thing being exercised: a generator-style stage whose output
    row count differs from its input's, with frame index metadata."""

    def __init__(self, every_k: int = 10):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_doc, o_ref, o_idx, o_frame, o_err = [], [], [], [], []
        for d, r, p in zip(doc_ids, refs, payloads):
            try:
                for i, frame in enumerate(_fake_video_decode(p or b"")):
                    if i % self.every_k == 0:
                        o_doc.append(d); o_ref.append(r)
                        o_idx.append(i); o_frame.append(frame); o_err.append("")
            except NotImplementedError as exc:
                o_doc.append(d); o_ref.append(r)
                o_idx.append(-1); o_frame.append(b""); o_err.append(str(exc))
        return pa.Table.from_arrays(
            [
                pa.array(o_doc, type=pa.string()),
                pa.array(o_ref, type=pa.string()),
                pa.array(o_idx, type=pa.int32()),
                pa.array(o_frame, type=pa.binary()),
                pa.array(o_err, type=pa.string()),
            ],
            names=["doc_id", "media_ref", "frame_idx", "frame", "error"],
        )


class ByteHistogramFeatures:
    """Real (no codec needed) feature extraction: normalized 256-bin
    byte histogram per payload → ``list<float>`` embedding column,
    directly consumable by `functions/similarity.py` (ann_topk /
    embedding_neardup). The batched-inference pattern: "model" (here
    just numpy) set up once per actor, whole batch vectorized per call.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), 256), dtype=np.float32)
        for i, p in enumerate(payloads):
            if p:
                counts = np.bincount(
                    np.frombuffer(p, dtype=np.uint8), minlength=256
                )
                feats[i] = counts / counts.sum()
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                pa.array(list(feats), type=pa.list_(pa.float32())),
            ],
            names=["doc_id", "media_ref", "embedding"],
        )
