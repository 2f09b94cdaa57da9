"""Tier-2 unit tests mirroring the reference's BasicTests / UtilityTests /
TextUtilityTests / UriExtensionsTests coverage buckets (SURVEY §5.2-5.3)."""

from datetime import datetime, timezone

from smartreader_ray.dom import parse_html
from smartreader_ray.extraction import (
    get_jsonld,
    parse_article,
    text_similarity,
    try_parse_date,
)
from smartreader_ray.extraction.article import (
    chars_per_minute,
    convert_to_plaintext,
    count_letters,
)
from smartreader_ray.extraction.metadata import clean_title, get_article_title
from smartreader_ray.extraction.nodeutil import (
    clean_xml_name,
    get_display_from_style,
    get_visibility_from_style,
    is_probably_visible,
)
from smartreader_ray.extraction.urialg import PageUri


def _doc(html):
    return parse_html(html)


# -- titles (BasicTests.cs:29-153) ------------------------------------------
def test_clean_title_removes_sitename_suffix():
    assert clean_title("Big News - My Site", "My Site") == "Big News"
    assert clean_title("Big News | My Site", "My Site") == "Big News"
    assert clean_title("Big News", "Other") == "Big News"
    # no site name → untouched (whitespace still normalized)
    assert clean_title("A  B", None) == "A B"


def test_get_article_title_separator():
    doc = _doc(
        "<html><head><title>The Big Interesting Article Headline - Some Site</title></head><body></body></html>"
    )
    assert get_article_title(doc) == "The Big Interesting Article Headline"


def test_get_article_title_short_keeps_original():
    # result would be < 3 words → falls back to original title
    doc = _doc("<html><head><title>Hi There - X</title></head><body></body></html>")
    assert get_article_title(doc) == "Hi There - X"


def test_get_article_title_colon():
    doc = _doc(
        "<html><head><title>Site: The Very Real Interesting Title Here</title></head><body></body></html>"
    )
    assert get_article_title(doc) == "The Very Real Interesting Title Here"


def test_get_article_title_h1_fallback():
    doc = _doc(
        "<html><head><title>x</title></head><body><h1>The Actual Long Headline Here</h1></body></html>"
    )
    assert get_article_title(doc) == "The Actual Long Headline Here"


# -- dates (BasicTests.cs:365-426) ------------------------------------------
def test_date_from_meta():
    a = parse_article(
        "https://localhost/",
        '<html><head><title>t</title><meta property="article:published_time" content="2019-10-18T19:23:34+02:00"></head><body><p>hello</p></body></html>',
    )
    assert a.publication_date == datetime(2019, 10, 18, 17, 23, 34, tzinfo=timezone.utc)


def test_date_from_time_pubdate():
    # the reference requires a non-empty pubDate attribute VALUE
    # (BasicTests.cs:400: pubDate="pubDate")
    a = parse_article(
        "https://localhost/",
        '<html><body><time pubdate="pubdate" datetime="2018-12-21T12:55:00">x</time><p>hello</p></body></html>',
    )
    assert a.publication_date == datetime(2018, 12, 21, 12, 55)
    # bare (empty-valued) pubdate attr is ignored, as in the reference
    b = parse_article(
        "https://localhost/",
        '<html><body><time pubdate datetime="2018-12-21T12:55:00">x</time><p>hello</p></body></html>',
    )
    assert b.publication_date is None


def test_date_from_url_with_day_clamp():
    a = parse_article(
        "https://localhost/2110/10/37/article.html",
        "<html><body><p>hello</p></body></html>",
    )
    assert a.publication_date == datetime(2110, 10, 1)


def test_date_from_url():
    a = parse_article(
        "https://localhost/2020/05/12/x", "<html><body><p>hello</p></body></html>"
    )
    assert a.publication_date == datetime(2020, 5, 12)


def test_try_parse_date_formats():
    assert try_parse_date("2015-04-30T07:19:58") == datetime(2015, 4, 30, 7, 19, 58)
    assert try_parse_date("2024-04-20T04:20:00.000Z") == datetime(
        2024, 4, 20, 4, 20, tzinfo=timezone.utc
    )
    assert try_parse_date("May 3, 2021") == datetime(2021, 5, 3)
    assert try_parse_date("garbage") is None


# -- JSON-LD (BasicTests.cs:595-673) ----------------------------------------
def _jsonld_doc(payload):
    return _doc(
        "<html><head><title>t</title>"
        f'<script type="application/ld+json">{payload}</script>'
        "</head><body></body></html>"
    )


def test_jsonld_author_object():
    meta = get_jsonld(
        _jsonld_doc(
            '{"@context":"https://schema.org","@type":"Article","name":"N",'
            '"author":{"name":"John Doe"}}'
        )
    )
    assert meta["jsonld:author"] == "John Doe"
    assert meta["jsonld:title"] == "N"


def test_jsonld_author_array():
    meta = get_jsonld(
        _jsonld_doc(
            '{"@context":"https://schema.org","@type":"Article",'
            '"author":[{"name":"A"},{"name":"B"}]}'
        )
    )
    assert meta["jsonld:author"] == "A, B"


def test_jsonld_wrong_type_rejected():
    meta = get_jsonld(
        _jsonld_doc('{"@context":"https://schema.org","@type":"WebSite","name":"N"}')
    )
    assert meta == {}


def test_jsonld_non_schema_context_rejected():
    meta = get_jsonld(
        _jsonld_doc('{"@context":"https://example.org","@type":"Article","name":"N"}')
    )
    assert meta == {}


def test_jsonld_graph():
    # quirk parity (Readability.cs:377-402): after @graph promotion the
    # @context check runs on the INNER object — a graph child without its
    # own @context is rejected
    meta = get_jsonld(
        _jsonld_doc(
            '{"@context":"https://schema.org","@graph":[{"@type":"Article","name":"G"}]}'
        )
    )
    assert meta == {}
    meta = get_jsonld(
        _jsonld_doc(
            '{"@context":"https://schema.org","@graph":'
            '[{"@context":"https://schema.org","@type":"Article","name":"G"}]}'
        )
    )
    assert meta.get("jsonld:title") == "G"


# -- plaintext (BasicTests.cs:489-519) --------------------------------------
def test_plaintext_whitespace_rules():
    doc = _doc("<body><div><p>one  two</p>\t<p>three</p><br>four</div></body>")
    text = convert_to_plaintext(doc.body)
    assert "one two" in text
    assert "\n\n" in text  # paragraph gap normalized to exactly two newlines
    assert "\n\n\n" not in text


# -- alternative languages (BasicTests.cs:222-330) --------------------------
def test_alt_language_links():
    a = parse_article(
        "https://localhost/",
        '<html><head><title>t</title>'
        '<link rel="alternate" hreflang="de" href="/de">'
        '<link rel="alternate" hreflang="x-default" href="/x">'
        '<link rel="alternate" hreflang="de" href="/de2">'
        '<link rel="alternate" hreflang="fr" href="https://ex.com/fr">'
        "</head><body><p>hello</p></body></html>",
    )
    assert a.alternative_language_uris == {
        "de": "https://localhost/de",
        "fr": "https://ex.com/fr",
    }


# -- similarity / utilities --------------------------------------------------
def test_text_similarity():
    assert text_similarity("the big title", "the big title") == 1.0
    assert text_similarity("abc", "xyz") == 0.0
    # asymmetric by design: measures how much of B is NOT in A
    assert text_similarity("the big red title", "the big title") == 1.0
    assert 0.0 < text_similarity("the big title", "the big red title") < 1.0


def test_visibility_style_parsing():
    assert get_display_from_style("display:none") == "none"
    assert get_display_from_style("color:red;display:none;x:y") == "none"
    # quirk parity: no trailing-trim when there is no semicolon after value
    assert get_display_from_style("display: none") == " none"
    assert get_visibility_from_style("visibility: hidden") == "hidden"

    doc = _doc(
        '<body><div id=a style="display:none"></div>'
        '<div id=b hidden></div>'
        '<div id=c aria-hidden="true"></div>'
        '<div id=d aria-hidden="true" class="fallback-image"></div>'
        "<div id=e></div></body>"
    )
    by = {e.id: e for e in doc.body.children}
    assert not is_probably_visible(by["a"])
    assert not is_probably_visible(by["b"])
    assert not is_probably_visible(by["c"])
    assert is_probably_visible(by["d"])
    assert is_probably_visible(by["e"])


def test_clean_xml_name():
    assert clean_xml_name("123abc") == "abc"
    assert clean_xml_name("a b") == "ab"
    assert clean_xml_name("ok-name") == "ok-name"


# -- time to read (TimeToReadCalculator.cs) ----------------------------------
def test_time_to_read_weights():
    assert chars_per_minute("en") == 987
    assert chars_per_minute("it-IT") == 950
    assert chars_per_minute("xx") == 960
    assert chars_per_minute(None) == 960


def test_count_letters_utf16_units():
    assert count_letters("ab c.") == 3  # space + punct excluded
    assert count_letters("🌟") == 2  # astral → 2 UTF-16 units


# -- URI algebra (UriExtensionsTests.cs) -------------------------------------
def test_uri_absolutization():
    u = PageUri("https://ex.com/a/b/page.html?q=1")
    assert u.to_absolute_uri("") == "https://ex.com/a/b/"
    assert u.to_absolute_uri("#frag") == "#frag"
    assert u.to_absolute_uri("//cdn.com/x") == "https://cdn.com/x"
    assert u.to_absolute_uri("/root.png") == "https://ex.com/root.png"
    assert u.to_absolute_uri("./sib.png") == "https://ex.com/a/b/sib.png"
    assert u.to_absolute_uri("rel.png") == "https://ex.com/a/b/rel.png"
    assert u.to_absolute_uri("http://abs.com/x") == "http://abs.com/x"
    assert u.to_absolute_uri("data:text/plain,hi") == "data:text/plain,hi"
    assert u.to_absolute_uri("blob:http://x/1-2") == "blob:http://x/1-2"


# -- error isolation ---------------------------------------------------------
def test_error_row_not_exception(monkeypatch):
    import smartreader_ray.extraction.core as core

    def boom(*a, **k):
        raise RuntimeError("injected")

    monkeypatch.setattr(core, "get_jsonld", boom)
    a = parse_article("https://localhost/", "<html><body><p>x</p></body></html>")
    assert not a.completed
    assert "injected" in a.error


def test_not_readable_still_extracts():
    a = parse_article("https://localhost/", "<html><body><p>tiny</p></body></html>")
    assert a.completed
    assert not a.is_readable
    assert "tiny" in a.text_content


# -- §2.6 extension surface (BasicTests.cs:522-592, 701-723 mirrors) --------
_SIMPLE_DOC = (
    "<html><head><title>A Title</title></head><body><article>"
    "<p>" + "reasonably long paragraph of content text here. " * 20 + "</p>"
    "</article></body></html>"
)


def test_custom_serializer_and_converter():
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    cfg = ExtractorConfig(
        serializer=lambda el: "<custom/>",
        converter=lambda el: "CONVERTED",
    )
    a = parse_article("https://localhost/", _SIMPLE_DOC, cfg)
    assert a.completed
    assert a.content_html == "<custom/>"
    assert a.text_content == "CONVERTED"
    assert a.length == len("CONVERTED")


def test_language_id_and_summary_delegates():
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    cfg = ExtractorConfig(
        language_identification=lambda text, lang: "xx",
        create_summary=lambda text, excerpt: "MY SUMMARY",
    )
    a = parse_article("https://localhost/", _SIMPLE_DOC, cfg)
    assert a.language == "xx"
    assert a.excerpt == "MY SUMMARY"


def test_max_elems_to_parse_error_row():
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    a = parse_article(
        "https://localhost/", _SIMPLE_DOC, ExtractorConfig(max_elems_to_parse=2)
    )
    assert not a.completed
    assert "Aborting parsing document" in a.error
    assert "elements found" in a.error


def test_custom_operations_start_and_end():
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    calls = []

    def start_op(doc_el):
        calls.append(("start", doc_el.tag))

    def end_op(article_el):
        calls.append(("end", article_el.tag))
        # mutate the final article like the reference's console demo
        for img in article_el.get_elements_by_tag_name("img"):
            img.remove()

    cfg = ExtractorConfig(
        custom_operations_start=(start_op,), custom_operations_end=(end_op,)
    )
    a = parse_article("https://localhost/", _SIMPLE_DOC, cfg)
    assert a.completed
    assert ("start", "HTML") in calls
    assert calls[-1][0] == "end"


def test_replace_and_add_regex_options():
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    doc = (
        "<html><body><article>"
        "<p>" + "main content paragraph with plenty of text here. " * 20 + "</p>"
        '<div class="xyzzy-block"><p>'
        + "this block would normally survive the unlikely filter fine. " * 10
        + "</p></div></article></body></html>"
    )
    base = parse_article("https://localhost/", doc)
    assert "normally survive" in base.text_content

    # AddOptionToRegularExpression equivalent: xyzzy-block becomes unlikely
    cfg = ExtractorConfig(add_regex_options=(("unlikelyCandidates", "xyzzy"),))
    patched = parse_article("https://localhost/", doc, cfg)
    assert "normally survive" not in patched.text_content
    assert "main content paragraph" in patched.text_content

    # ReplaceRegularExpression equivalent: neutralize the default list
    cfg2 = ExtractorConfig(
        replace_regexes=(("unlikelyCandidates", "match-nothing-ever-xq"),)
    )
    doc2 = doc.replace("xyzzy-block", "sidebar comment")  # normally stripped
    kept = parse_article("https://localhost/", doc2, cfg2)
    assert "normally survive" in kept.text_content


def test_keep_classes_and_classes_to_preserve():
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    doc = (
        "<html><body><article>"
        '<p class="lede keep-me">' + "text content of the paragraph here. " * 20
        + "</p></article></body></html>"
    )
    default = parse_article("https://localhost/", doc)
    assert 'class="lede keep-me"' not in default.content_html

    kept = parse_article("https://localhost/", doc, ExtractorConfig(keep_classes=True))
    assert 'class="lede keep-me"' in kept.content_html

    preserved = parse_article(
        "https://localhost/", doc, ExtractorConfig(classes_to_preserve=("page", "keep-me"))
    )
    assert 'class="keep-me"' in preserved.content_html


def test_custom_start_ops_persist_across_retry_rounds():
    """SmartReader.cs:1020/2308: the retry loop restores HTML cached AFTER
    CustomOperationsStart ran, so start-hook effects persist into relaxed
    rounds. Our _reprep re-applies the hooks; if it didn't, the injected
    sidebar below would vanish in round 2 and extraction would fail."""
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    marker = "retrymarker" + " persistent sidebar prose, with commas," * 20

    def start_op(doc_el):
        body = doc_el.get_elements_by_tag_name("body")[0]
        from smartreader_ray.dom import parse_html

        frag = parse_html(
            f'<div class="sidebar"><p>{marker}</p></div>'
        ).get_elements_by_tag_name("div")[0]
        body.append_child(frag)

    # base doc is too short to pass char_threshold on its own; the injected
    # content sits in an "unlikely candidate" (sidebar) so round 1
    # (StripUnlikelys on) drops it and fails, round 2 must still have it
    doc = (
        "<html><body><div><p>short real paragraph, just a few words here"
        "</p></div></body></html>"
    )
    cfg = ExtractorConfig(custom_operations_start=(start_op,))
    a = parse_article("https://localhost/", doc, cfg)
    assert a.attempts >= 2  # round 1 failed, a flag was relaxed
    assert "retrymarker" in a.text_content
    assert a.length > 500


def test_logger_delegate_call_sites():
    """LoggerDelegate parity (SmartReader.cs:122 + GrabArticle trace
    sites): info-level messages fire only when debug/logging=='info';
    issue-level sites (role removal, not-readable warning) always fire."""
    from smartreader_ray.extraction import ExtractorConfig, parse_article

    doc = (
        "<html><body>"
        '<div style="display:none">hidden stuff</div>'
        '<div class="sidebar">unlikely sidebar content</div>'
        '<nav role="navigation">site nav</nav>'
        "<div><p>"
        + "Real article prose, with commas, goes here and keeps going. " * 20
        + "</p></div></body></html>"
    )

    # info level: the full trace fires
    info_msgs = []
    cfg = ExtractorConfig(logging="info", logger=info_msgs.append)
    parse_article("https://localhost/", doc, cfg)
    joined = "\n".join(info_msgs)
    assert "**** grabArticle ****" in joined
    assert "Starting grabArticle loop" in joined
    assert "Removing hidden node - " in joined
    assert "Removing unlikely candidate - sidebar" in joined
    assert "Removing content with role navigation" in joined
    assert "<h2>Article content pre-prep:</h2>" in joined
    assert "<h2>Article content post-prep:</h2>" in joined
    assert "<h2>Pre-GrabArticle:</h2>" in joined
    assert "<h2>Grabbed:</h2>" in joined
    assert "<h2>Post Process result:</h2>" in joined

    # default (issue) level: only unguarded sites fire
    issue_msgs = []
    cfg2 = ExtractorConfig(logger=issue_msgs.append)
    parse_article("https://localhost/", doc, cfg2)
    joined2 = "\n".join(issue_msgs)
    assert "Removing content with role navigation" in joined2
    assert "grabArticle" not in joined2
    assert "Removing hidden node" not in joined2

    # not-readable warning is issue-level
    warn_msgs = []
    cfg3 = ExtractorConfig(logger=warn_msgs.append)
    parse_article("https://localhost/", "<html><body><p>tiny</p></body></html>", cfg3)
    assert any("probably not readable" in m for m in warn_msgs)

    # no logger → no crash, debug off → zero overhead path
    a = parse_article("https://localhost/", doc, ExtractorConfig())
    assert a.completed


def test_normalize_url_rfc3986_subset():
    from smartreader_ray.extraction.urialg import normalize_url as n

    assert n("HTTP://Example.COM:80/Path/#frag") == "http://example.com/Path/"
    assert n("https://Example.com:443/a?b=1#x") == "https://example.com/a?b=1"
    assert n("https://example.com:8443/a") == "https://example.com:8443/a"
    assert n("http://example.com") == "http://example.com/"
    # userinfo and query are preserved verbatim (semantics-bearing)
    assert n("HTTP://User:Pw@Host.COM/p") == "http://User:Pw@host.com/p"
    assert n("http://h.com/p?b=2&a=1") == "http://h.com/p?b=2&a=1"
    # total function: junk and empties normalize to themselves stripped
    assert n("not a url") == "not a url"
    assert n("  http://A.com/x  ") == "http://a.com/x"
    assert n("") == "" and n(None) == ""
