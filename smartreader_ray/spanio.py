"""Span ⇄ HTML codecs — the engine's interchange data model.

``BASELINE.json.input_hint``: documents are interleaved text+media spans
``list<struct<kind, text, media_ref, offset>>``. Raw markup travels in
``kind="html"`` spans; extracted articles flatten to ``kind="text"`` runs
plus ``kind="image" | "video" | "embed"`` media spans. The flattener is the
per-row invariant used against the reference fixtures (span-sequence
equality on (kind, text, media_ref, order) — applied identically to our
output and to the reference's ``expected.html``).
"""

from __future__ import annotations

from typing import Iterable, Optional

from .dom import CommentNode, Element, TextNode, collapse_whitespace, parse_html
from .dom.node import ParentNode

#: default chunking for synthetic span construction (~64 KB)
DEFAULT_CHUNK = 64 * 1024

#: media element → span kind
_MEDIA_KINDS = {
    "IMG": "image",
    "PICTURE": "image",
    "VIDEO": "video",
    "AUDIO": "video",
    "IFRAME": "embed",
    "EMBED": "embed",
    "OBJECT": "embed",
}

#: elements that break a text run (block-level display, readability's O8
#: plaintext rules put newlines at P/BR — we break runs at all blocks so
#: the invariant is insensitive to inline-markup serialization)
_BLOCK_BREAKERS = frozenset(
    """ADDRESS ARTICLE ASIDE BLOCKQUOTE BODY CAPTION DD DIV DL DT FIELDSET
    FIGCAPTION FIGURE FOOTER FORM H1 H2 H3 H4 H5 H6 HEADER HR LI MAIN NAV
    OL P PRE SECTION TABLE TBODY TD TFOOT TH THEAD TR UL BR""".split()
)

_SKIP_SUBTREES = frozenset({"SCRIPT", "STYLE", "NOSCRIPT", "TEMPLATE", "HEAD"})


def make_span(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# ---------------------------------------------------------------------------
# assemble: spans -> source html (input side)
# ---------------------------------------------------------------------------
def assemble_html(spans: Iterable[dict]) -> str:
    """Concatenate ``kind='html'`` span text in offset order (F1 rule)."""
    html_spans = [s for s in spans if s.get("kind") == "html"]
    html_spans.sort(key=lambda s: s.get("offset", 0))
    return "".join(s.get("text") or "" for s in html_spans)


def html_to_spans(html: str, chunk_size: int = DEFAULT_CHUNK) -> list[dict]:
    """Chunk raw HTML into consecutive ``kind='html'`` spans (≥1 per doc)."""
    if not html:
        return [make_span("html", "", "", 0)]
    spans = []
    for i, start in enumerate(range(0, len(html), chunk_size)):
        spans.append(make_span("html", html[start:start + chunk_size], "", i))
    return spans


# ---------------------------------------------------------------------------
# flatten: extracted DOM -> interleaved text+media spans (output side)
# ---------------------------------------------------------------------------
def _media_ref_of(el: Element) -> str:
    for attr in ("src", "poster", "data", "srcset", "href"):
        v = el.get_attribute(attr)
        if v:
            if attr == "srcset":
                return v.split(",")[0].strip().split(" ")[0]
            return v
    return ""


def flatten_element(root: ParentNode) -> list[dict]:
    """DFS over the extracted article emitting interleaved spans.

    - text runs break at block boundaries, are whitespace-collapsed and
      trimmed; empty runs are dropped
    - media elements emit (kind, text=alt/caption, media_ref=resolved src)
      at their document position
    """
    spans: list[dict] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            text = collapse_whitespace("".join(buf)).strip()
            del buf[:]
            if text:
                spans.append(make_span("text", text, "", len(spans)))

    def walk(node) -> None:
        if isinstance(node, TextNode):
            buf.append(node.data)
            return
        if isinstance(node, CommentNode):
            return
        if isinstance(node, Element):
            tag = node.tag
            if tag in _SKIP_SUBTREES:
                return
            kind = _MEDIA_KINDS.get(tag)
            if kind is not None:
                ref = _media_ref_of(node)
                if tag == "PICTURE":
                    # pick the nested img's src if present
                    imgs = node.get_elements_by_tag_name("img")
                    if imgs:
                        ref = _media_ref_of(imgs[0]) or ref
                flush()
                alt = node.get_attribute("alt") or node.get_attribute("title") or ""
                spans.append(make_span(kind, collapse_whitespace(alt).strip(), ref, len(spans)))
                return
            breaker = tag in _BLOCK_BREAKERS
            if breaker:
                flush()
            for child in node.childNodes:
                walk(child)
            if breaker:
                flush()

    for child in root.childNodes:
        walk(child)
    flush()
    return spans


def flatten_html(html: str) -> list[dict]:
    """Parse an HTML (fragment or document) and flatten its body."""
    doc = parse_html(html)
    body = doc.body if doc.body is not None else doc
    return flatten_element(body)


def spans_equal(a: list[dict], b: list[dict]) -> bool:
    """The per-row invariant: equality on (kind, text, media_ref, order)."""
    if len(a) != len(b):
        return False
    for sa, sb in zip(a, b):
        if (
            sa["kind"] != sb["kind"]
            or sa["text"] != sb["text"]
            or sa["media_ref"] != sb["media_ref"]
        ):
            return False
    return True


def caption_pairs_batch(article_batch) -> "pa.Table":
    """Interleaved-span caption pairing: for every MEDIA span in a
    ``(doc_id, spans)`` row, find its caption text —

    1. the media span's own non-empty ``text`` (alt / ``figcaption``
       markup captured at flatten time) → ``caption_src='alt'``;
    2. else the nearest non-empty TEXT span by span-offset distance,
       the PRECEDING one winning ties → ``'prev'`` / ``'next'``;
    3. else ``caption=''``, ``caption_src='none'``.

    ``distance`` is the span-offset delta (0 for alt, -1 for none).
    The text⇄media alignment step a multimodal training pipeline runs
    right after extraction (image-caption pair mining). Per-doc numpy
    searchsorted over the text-span offsets — no quadratic scan.

    Batch-level function: one input row per document, output one row
    per media span; use inside ``map_batches(..., batch_format="pyarrow")``.
    """
    import numpy as np
    import pyarrow as pa

    media_kinds = ("image", "video", "audio", "embed")
    o_doc, o_ref, o_kind, o_off = [], [], [], []
    o_cap, o_src, o_dist = [], [], []
    doc_col = article_batch.column("doc_id")
    for doc_id, spans in zip(doc_col.to_pylist(),
                             article_batch.column("spans").to_pylist()):
        spans = spans or []
        t_off = np.array([s["offset"] for s in spans
                          if s["kind"] == "text" and (s["text"] or "").strip()],
                         dtype=np.int64)
        t_txt = [s["text"] for s in spans
                 if s["kind"] == "text" and (s["text"] or "").strip()]
        for s in spans:
            if s["kind"] not in media_kinds or not s["media_ref"]:
                continue
            o_doc.append(doc_id)
            o_ref.append(s["media_ref"])
            o_kind.append(s["kind"])
            off = int(s["offset"])
            o_off.append(off)
            alt = (s["text"] or "").strip()
            if alt:
                o_cap.append(alt)
                o_src.append("alt")
                o_dist.append(0)
                continue
            if t_off.size == 0:
                o_cap.append("")
                o_src.append("none")
                o_dist.append(-1)
                continue
            i = int(np.searchsorted(t_off, off))
            prev_d = off - t_off[i - 1] if i > 0 else None
            next_d = t_off[i] - off if i < t_off.size else None
            if next_d is None or (prev_d is not None and prev_d <= next_d):
                o_cap.append(t_txt[i - 1])
                o_src.append("prev")
                o_dist.append(int(prev_d))
            else:
                o_cap.append(t_txt[i])
                o_src.append("next")
                o_dist.append(int(next_d))
    return pa.table({
        "doc_id": pa.array(o_doc, type=doc_col.type),
        "media_ref": pa.array(o_ref, type=pa.string()),
        "kind": pa.array(o_kind, type=pa.string()),
        "offset": pa.array(o_off, type=pa.int64()),
        "caption": pa.array(o_cap, type=pa.string()),
        "caption_src": pa.array(o_src, type=pa.string()),
        "distance": pa.array(o_dist, type=pa.int64()),
    })


def interleave_stats_batch(article_batch) -> "pa.Table":
    """Per-document modality-balance audit over an interleaved
    ``(doc_id, spans)`` row: text/media span counts and the number of
    kind ALTERNATIONS along the span order (adjacent spans of differing
    text-vs-media class) — the MMC4-style interleaving statistic a
    multimodal training mix is tuned on (a doc with images clumped at
    the end trains differently from one with the same images woven
    through the text).

    Fully vectorized over the Arrow list column: one flatten + offsets
    pass, boundary-safe adjacent compare via the list offsets — no
    per-span Python. Batch-level function for
    ``map_batches(..., batch_format="pyarrow")``; output one row per
    document: (doc_id, n_spans, n_text, n_media, n_alt).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    spans = article_batch.column("spans").combine_chunks()
    # offsets into the flattened child array, robust to a sliced batch
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = spans.flatten()
    kinds = flat.field("kind")
    is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)
    # spans are ordered by construction (flatten emits offset order);
    # alternation = adjacent pair whose text-vs-media class differs,
    # masked at document boundaries
    n = len(is_text)
    if n > 1:
        diff = is_text[1:] != is_text[:-1]
    else:
        diff = np.zeros(0, dtype=bool)
    # position i in `diff` compares flat span i and i+1 — kill pairs
    # that straddle a document boundary (i+1 == some offsets[k])
    cum = np.concatenate(([0], np.cumsum(diff, dtype=np.int64)))
    starts = offsets[:-1] - offsets[0]
    ends = offsets[1:] - offsets[0]
    # per-doc alternations = cum[end-1] - cum[start] for non-empty docs
    n_spans = ends - starts
    n_alt = np.where(n_spans > 1,
                     cum[np.maximum(ends - 1, 0)] - cum[starts], 0)
    cum_t = np.concatenate(([0], np.cumsum(is_text, dtype=np.int64)))
    n_text = cum_t[ends] - cum_t[starts]
    return pa.table({
        "doc_id": article_batch.column("doc_id"),
        "n_spans": pa.array(n_spans, type=pa.int64()),
        "n_text": pa.array(n_text, type=pa.int64()),
        "n_media": pa.array(n_spans - n_text, type=pa.int64()),
        "n_alt": pa.array(n_alt, type=pa.int64()),
    })


def pack_spans_batch(article_batch, budget: int = 256,
                     media_cost: int = 64) -> "pa.Table":
    """Multimodal sequence packing over interleaved ``(doc_id, spans)``
    rows: assign every span to a fixed-budget training sequence where a
    TEXT span costs its whitespace-token count and a MEDIA span costs a
    fixed ``media_cost`` token patch budget (the vision-token cost of
    one image in an interleaved-multimodal batch, à la Flamingo/MMC4
    packing).

    Boundary rule is **prefix packing**: a span belongs to the sequence
    its FIRST token falls in — ``seq_idx = (sum of costs of preceding
    spans in the doc) // budget`` — so a sequence can overflow by at
    most one span but the assignment is closed-form (one cumulative sum,
    SQL-replayable), unlike greedy never-split packing which needs
    sequential state. Documents never share a sequence (packing is
    per-doc; cross-doc concat is a shuffle-order question, not a
    per-row one).

    Fully vectorized: one flatten + offsets pass, token counts via ONE
    ``count_substring_regex(\\S+)`` kernel, per-doc exclusive cumsum by
    offset arithmetic, segment rollup via ``np.add.reduceat`` — no
    per-span Python. Output one row per (doc_id, seq_idx): n_spans,
    n_text_tokens, n_media, cost.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    spans = article_batch.column("spans").combine_chunks()
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts = offsets[:-1] - offsets[0]
    ends = offsets[1:] - offsets[0]
    flat = spans.flatten()
    is_text = pc.equal(flat.field("kind"), "text").to_numpy(
        zero_copy_only=False)
    tok = pc.count_substring_regex(
        pc.coalesce(flat.field("text"), pa.scalar("", type=pa.string())),
        r"\S+").to_numpy(zero_copy_only=False).astype(np.int64)
    tok = np.where(is_text, tok, 0)
    cost = np.where(is_text, tok, np.int64(media_cost))
    # per-doc EXCLUSIVE cumsum: global running sum minus the doc's base
    cum = np.concatenate(([0], np.cumsum(cost, dtype=np.int64)))
    excl = cum[:-1]                       # cost of everything before span i
    n_spans_doc = ends - starts
    doc_base = np.repeat(excl[starts[n_spans_doc > 0]]
                         if len(starts) else np.zeros(0, np.int64),
                         n_spans_doc[n_spans_doc > 0])
    seq = np.zeros(len(cost), dtype=np.int64)
    if len(cost):
        seq = (excl - doc_base) // np.int64(budget)
    # segment boundaries: doc start OR seq change within the doc
    doc_first = np.zeros(len(cost), dtype=bool)
    doc_first[starts[n_spans_doc > 0]] = True
    new_seg = doc_first.copy()
    if len(cost) > 1:
        new_seg[1:] |= (seq[1:] != seq[:-1]) & ~doc_first[1:]
    seg_starts = np.flatnonzero(new_seg)
    doc_idx_per_span = np.repeat(np.arange(len(n_spans_doc)), n_spans_doc)
    if len(seg_starts):
        out_doc_idx = doc_idx_per_span[seg_starts]
        out_seq = seq[seg_starts]
        out_n = np.add.reduceat(np.ones(len(cost), np.int64), seg_starts)
        out_tok = np.add.reduceat(tok, seg_starts)
        out_media = np.add.reduceat((~is_text).astype(np.int64), seg_starts)
        out_cost = np.add.reduceat(cost, seg_starts)
    else:
        out_doc_idx = np.zeros(0, np.int64)
        out_seq = out_n = out_tok = out_media = out_cost = np.zeros(
            0, np.int64)
    return pa.table({
        "doc_id": article_batch.column("doc_id").combine_chunks().take(
            pa.array(out_doc_idx, type=pa.int64())),
        "seq_idx": pa.array(out_seq, type=pa.int64()),
        "n_spans": pa.array(out_n, type=pa.int64()),
        "n_text_tokens": pa.array(out_tok, type=pa.int64()),
        "n_media": pa.array(out_media, type=pa.int64()),
        "cost": pa.array(out_cost, type=pa.int64()),
    })
