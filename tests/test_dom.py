"""DOM layer: parser tree shapes, serializer conventions, selectors."""

from smartreader_ray.dom import (
    Element,
    element_matches,
    inner_html,
    parse_html,
    query_selector,
    query_selector_all,
)


def test_basic_structure():
    doc = parse_html("<html><head><title>T</title></head><body><p>x</p></body></html>")
    assert doc.body is not None
    assert doc.head is not None
    assert doc.title == "T"
    assert [e.tag for e in doc.body.children] == ["P"]


def test_implied_p_close_and_li():
    doc = parse_html("<body><p>one<p>two<ul><li>a<li>b</ul></body>")
    body = doc.body
    assert [e.tag for e in body.children] == ["P", "P", "UL"]
    ul = body.children[2]
    assert [e.tag for e in ul.children] == ["LI", "LI"]
    assert ul.children[0].text_content == "a"


def test_table_synthesis_and_foster():
    doc = parse_html("<body><table>oops<tr><td>cell</table></body>")
    body = doc.body
    # non-space text inside table fosters before it
    assert body.text_content.startswith("oops")
    table = body.get_elements_by_tag_name("table")[0]
    assert table.get_elements_by_tag_name("tbody")
    assert table.get_elements_by_tag_name("td")[0].text_content == "cell"


def test_nested_dl_not_collapsed():
    doc = parse_html("<body><dl><dd>outer<dl><dd>inner</dd></dl>tail</dd></dl></body>")
    outer_dd = doc.body.get_elements_by_tag_name("dd")[0]
    assert "tail" in outer_dd.text_content
    assert outer_dd.get_elements_by_tag_name("dl")


def test_noscript_is_raw_text():
    doc = parse_html("<body><noscript><img src='x.png'></noscript></body>")
    ns = doc.body.get_elements_by_tag_name("noscript")[0]
    assert not ns.children  # scripting-on: content is text, not elements
    assert "<img" in ns.text_content


def test_misnested_anchor_keeps_blocks_open():
    doc = parse_html(
        "<body><div id=w><a id=a1><div id=inner><a id=a2>x</a></div></a>"
        "<p id=after>y</p></div></body>"
    )
    w = query_selector(doc, "[id=w]")
    assert w is not None
    after = query_selector(doc, "[id=after]")
    assert after.parent_element.id == "w"


def test_serializer_conventions():
    doc = parse_html(
        '<body><p title="a&quot;b">x &amp; y\xa0z &lt;tag&gt;</p><br><img src="u"></body>'
    )
    html = inner_html(doc.body)
    assert html == (
        '<p title="a&quot;b">x &amp; y&nbsp;z &lt;tag&gt;</p><br><img src="u">'
    )


def test_raw_text_serialization():
    doc = parse_html("<body><script>if (a < b) & c</script></body>")
    assert "<script>if (a < b) & c</script>" in inner_html(doc.body)


def test_selectors():
    doc = parse_html(
        '<body><div><br></div><li><p id=inli>x</p></li>'
        '<meta http-equiv="content-language" content="en">'
        '<span rel="Author">r</span></body>'
    )
    assert len(query_selector_all(doc, "div > br")) == 1
    p = query_selector(doc, "[id=inli]")
    assert element_matches(p, "li p")
    # legacy case-insensitive attribute values (http-equiv, rel)
    assert query_selector(doc, 'meta[http-equiv="Content-Language"]') is not None
    assert query_selector(doc, '[rel="author"]') is not None


def test_svg_case_preserved():
    doc = parse_html('<body><svg viewBox="0 0 1 1"><feGaussianBlur stdDeviation="2"/></svg></body>')
    html = inner_html(doc.body)
    assert 'viewBox="0 0 1 1"' in html
    assert "<feGaussianBlur" in html


def test_entity_decoding_and_pre():
    doc = parse_html("<body><pre>\nkeep  it</pre><p>&euro;&#65;</p></body>")
    pre = doc.body.get_elements_by_tag_name("pre")[0]
    assert pre.text_content == "keep  it"  # leading newline stripped
    p = doc.body.get_elements_by_tag_name("p")[0]
    assert p.text_content == "€A"


def test_mutation_api():
    doc = parse_html("<body><div id=a><span>1</span></div></body>")
    div = query_selector(doc, "[id=a]")
    span = div.children[0]
    p = Element("p")
    div.replace_child(p, span)
    assert span.parent is None
    assert div.children[0].tag == "P"
    div.insert_before(span, p)
    assert [c.tag for c in div.children] == ["SPAN", "P"]
