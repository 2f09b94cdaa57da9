"""Span codec tests: assemble/chunk round-trip + flattener semantics."""

from smartreader_ray.dom import parse_html
from smartreader_ray.spanio import (
    assemble_html,
    flatten_element,
    flatten_html,
    html_to_spans,
    spans_equal,
)


def test_chunk_roundtrip():
    html = "<html><body>" + "x" * 200_000 + "</body></html>"
    spans = html_to_spans(html, chunk_size=64 * 1024)
    assert len(spans) == 4
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]
    assert assemble_html(spans) == html


def test_assemble_sorts_by_offset_and_skips_media():
    spans = [
        {"kind": "html", "text": "b", "media_ref": "", "offset": 1},
        {"kind": "media", "text": "", "media_ref": "m.png", "offset": 2},
        {"kind": "html", "text": "a", "media_ref": "", "offset": 0},
    ]
    assert assemble_html(spans) == "ab"


def test_flatten_interleaves_text_and_media():
    doc = parse_html(
        "<body><div><p>one two</p>"
        '<img src="i.png" alt="pic"><p>three</p>'
        '<iframe src="https://player.example/e"></iframe></div></body>'
    )
    spans = flatten_element(doc.body)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "image", "text", "embed"]
    assert spans[0]["text"] == "one two"
    assert spans[1]["media_ref"] == "i.png"
    assert spans[1]["text"] == "pic"
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]


def test_flatten_collapses_whitespace_and_drops_empty():
    spans = flatten_html("<div>  a \n b  </div><div>   </div>")
    assert len(spans) == 1
    assert spans[0]["text"] == "a b"


def test_spans_equal():
    a = flatten_html("<p>x</p><img src='u'>")
    b = flatten_html("<div><p>x</p></div><img src='u'>")  # same flattened view
    assert spans_equal(a, b)
    c = flatten_html("<p>y</p><img src='u'>")
    assert not spans_equal(a, c)


def test_caption_pairs_rules():
    import pyarrow as pa

    from smartreader_ray.spanio import caption_pairs_batch, make_span

    spans = [
        make_span("image", "", "lead.png", 0),        # next (no prev)
        make_span("text", "alpha", "", 1),
        make_span("image", "my alt", "alt.png", 2),   # own alt wins
        make_span("text", "beta", "", 3),
        make_span("image", "", "tie.png", 4),         # tie: prev wins
        make_span("text", "gamma", "", 5),
        make_span("text", "   ", "", 6),              # blank text ignored
        make_span("image", "", "far.png", 7),         # prev=gamma d=2
        make_span("image", "", "", 8),                # no ref -> skipped
    ]
    lonely = [make_span("image", "", "only.png", 0)]  # none
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "spans": pa.array([spans, lonely]),
    })
    rows = {r["media_ref"]: r
            for r in caption_pairs_batch(batch).to_pylist()}
    assert len(rows) == 5
    assert rows["lead.png"] == {
        "doc_id": 1, "media_ref": "lead.png", "kind": "image",
        "offset": 0, "caption": "alpha", "caption_src": "next",
        "distance": 1}
    assert (rows["alt.png"]["caption"], rows["alt.png"]["caption_src"],
            rows["alt.png"]["distance"]) == ("my alt", "alt", 0)
    assert (rows["tie.png"]["caption"],
            rows["tie.png"]["caption_src"]) == ("beta", "prev")
    assert (rows["far.png"]["caption"],
            rows["far.png"]["distance"]) == ("gamma", 2)
    assert (rows["only.png"]["caption_src"],
            rows["only.png"]["distance"]) == ("none", -1)


def test_caption_pairs_on_real_extraction():
    """End-to-end on real markup: flatten -> pair uses the img alt."""
    import pyarrow as pa

    from smartreader_ray.spanio import caption_pairs_batch, flatten_html

    spans = flatten_html(
        "<div><p>intro paragraph</p>"
        "<img src='a.png' alt='a chart'>"
        "<p>middle text</p><img src='b.png'>"
        "<p>closing text</p></div>")
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "spans": pa.array([spans]),
    })
    rows = {r["media_ref"]: r
            for r in caption_pairs_batch(batch).to_pylist()}
    assert rows["a.png"]["caption_src"] == "alt"
    assert rows["a.png"]["caption"] == "a chart"
    assert rows["b.png"]["caption_src"] in ("prev", "next")
    assert rows["b.png"]["caption"] in ("middle text", "closing text")
    assert rows["b.png"]["doc_id"] == "d1"  # string doc ids preserved


def test_interleave_stats_vectorized_matches_naive():
    """interleave_stats_batch == a per-row Python reference, including
    doc-boundary masking, empty docs, and sliced batches."""
    import pyarrow as pa

    from smartreader_ray.spanio import interleave_stats_batch, make_span

    def doc(kinds):
        return [make_span(k, "t" if k == "text" else "",
                          "" if k == "text" else "m.png", i)
                for i, k in enumerate(kinds)]

    docs = [
        ["text", "image", "text", "text", "image"],  # 4 alternations? t/i,i/t,t/t,t/i -> 3
        ["image"],                                    # single span, 0 alt
        [],                                           # empty doc
        ["text", "text"],                             # 0 alt
        ["image", "text", "image", "text"],           # 3 alt
    ]
    batch = pa.table({
        "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
        "spans": pa.array([doc(k) for k in docs],
                          type=pa.list_(pa.struct([
                              ("kind", pa.string()),
                              ("text", pa.string()),
                              ("media_ref", pa.string()),
                              ("offset", pa.int64()),
                          ]))),
    })

    def naive(kinds):
        it = [k == "text" for k in kinds]
        alt = sum(1 for a, b in zip(it, it[1:]) if a != b)
        return (len(kinds), sum(it), len(kinds) - sum(it), alt)

    for sl in (batch, batch.slice(1), batch.slice(2, 2)):
        out = {r["doc_id"]: r for r in
               interleave_stats_batch(sl).to_pylist()}
        ids = sl.column("doc_id").to_pylist()
        assert set(out) == set(ids)
        for did in ids:
            ns, nt, nm, na = naive(docs[did])
            r = out[did]
            assert (r["n_spans"], r["n_text"], r["n_media"],
                    r["n_alt"]) == (ns, nt, nm, na), did


def test_pack_spans_vectorized_matches_naive():
    """pack_spans_batch == a per-row Python replay of the prefix-packing
    rule, including doc boundaries, empty docs, sliced batches, and a
    span overflowing the budget."""
    import pyarrow as pa

    from smartreader_ray.spanio import make_span, pack_spans_batch

    BUDGET, MCOST = 10, 4

    def span(kind, ntok):
        if kind == "text":
            return make_span("text", " ".join(["w"] * ntok), "", 0)
        return make_span("image", "", "m.png", 0)

    docs = [
        [("text", 3), ("image", 0), ("text", 6), ("text", 12),
         ("image", 0), ("text", 1)],        # crosses budgets, overflow span
        [("image", 0)],                      # single media
        [],                                  # empty doc
        [("text", 25)],                      # one span >> budget
        [("text", 2), ("text", 2), ("image", 0), ("image", 0),
         ("text", 5)],
    ]
    batch = pa.table({
        "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
        "spans": pa.array(
            [[span(k, n) for k, n in d] for d in docs],
            type=pa.list_(pa.struct([
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int64()),
            ]))),
    })

    def naive(d):
        out, run = {}, 0
        for k, n in d:
            cost = n if k == "text" else MCOST
            s = run // BUDGET
            run += cost
            ns, nt, nm, c = out.get(s, (0, 0, 0, 0))
            out[s] = (ns + 1, nt + (n if k == "text" else 0),
                      nm + (0 if k == "text" else 1), c + cost)
        return out

    for sl in (batch, batch.slice(1), batch.slice(2, 2)):
        res = pack_spans_batch(sl, budget=BUDGET, media_cost=MCOST)
        got = {}
        for r in res.to_pylist():
            got.setdefault(r["doc_id"], {})[r["seq_idx"]] = (
                r["n_spans"], r["n_text_tokens"], r["n_media"], r["cost"])
        ids = sl.column("doc_id").to_pylist()
        exp = {d: naive(docs[d]) for d in ids if docs[d]}
        assert got == exp
