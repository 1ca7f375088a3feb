"""Raw HTML/Markdown → spans adapters (stages/htmlparse.py)."""

import pyarrow as pa

from linkinator_ray.stages.extract import ExtractLinks
from linkinator_ray.stages.htmlparse import (
    build_corpus_from_text, gfm_heading_id, html_to_spans, markdown_to_spans)


def kinds_refs(spans):
    return [(s["kind"], s["media_ref"]) for s in spans if s["kind"] != "text"]


def test_html_anchor_img_srcset():
    spans = html_to_spans(
        '<a href="a.html">x</a><img src="i.png" srcset="s1.png 1x, s2.png 2x">')
    assert ("anchor", "a.html") in kinds_refs(spans)
    assert ("img_src", "i.png") in kinds_refs(spans)
    assert ("srcset_raw", "s1.png 1x, s2.png 2x") in kinds_refs(spans)


def test_html_base_first_and_order():
    spans = html_to_spans('<base href="/b/"><a href="x.html">x</a>')
    kinds = [s["kind"] for s in spans]
    assert kinds.index("base") < kinds.index("anchor")
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets)


def test_html_dns_prefetch_ignored():
    spans = html_to_spans(
        '<link rel="dns-prefetch" href="//cdn.test">'
        '<link rel="stylesheet" href="s.css">')
    refs = kinds_refs(spans)
    assert ("anchor", "s.css") in refs
    assert not any(r == "//cdn.test" for _, r in refs)


def test_html_meta_refresh_and_content():
    spans = html_to_spans(
        '<meta http-equiv="refresh" content="0;url=/next">'
        '<meta property="og:image" content="http://m.test/i.png">')
    refs = kinds_refs(spans)
    assert ("meta_refresh", "0;url=/next") in refs
    assert ("meta_content", "http://m.test/i.png") in refs


def test_html_style_and_jsonld():
    import json
    payload = json.dumps({"image": "http://m.test/x.png"})
    spans = html_to_spans(
        '<style>body{background:url(bg.png)}</style>'
        f'<script type="application/ld+json">{payload}</script>'
        '<div style="background:url(inline.png)">t</div>')
    style_texts = [s["text"] for s in spans if s["kind"] == "style_url"]
    assert any("bg.png" in t for t in style_texts)
    assert any("inline.png" in t for t in style_texts)
    assert any(s["kind"] == "jsonld_url" and "x.png" in s["text"] for s in spans)


def test_html_fragment_targets():
    spans = html_to_spans(
        '<div id="sec-1">x</div><a name="legacy">y</a>'
        '<a id="user-content-p" href="#perma">z</a>')
    frags = [s["text"] for s in spans if s["kind"] == "fragment_target"]
    assert "sec-1" in frags and "legacy" in frags
    assert "perma" in frags and "user-content-p" in frags


def test_html_roundtrip_through_extractor():
    corpus = build_corpus_from_text(pa.table({
        "doc_id": ["page.html"],
        "text": ['<a href="one.html">1</a><img src="two.png">'
                 '<blockquote cite="http://q.test/src">q</blockquote>'],
    }))
    links = ExtractLinks()(corpus).to_pylist()
    assert [r["raw_link"] for r in links] == \
        ["one.html", "two.png", "http://q.test/src"]
    assert [r["order"] for r in links] == [0, 1, 2]


def test_gfm_heading_id():
    assert gfm_heading_id("Hello World") == "hello-world"
    assert gfm_heading_id("What's New?!") == "whats-new"
    assert gfm_heading_id("  Mixed CASE 2.0 ") == "mixed-case-20"


def test_markdown_spans():
    spans = markdown_to_spans(
        "# Intro Section\n\nSee [license](LICENSE.md) and "
        "![logo](img/logo.png) or <http://auto.test/x>\n")
    refs = kinds_refs(spans)
    assert ("anchor", "LICENSE.md") in refs
    assert ("img_src", "img/logo.png") in refs
    assert ("anchor", "http://auto.test/x") in refs
    frags = [s["text"] for s in spans if s["kind"] == "fragment_target"]
    assert frags == ["intro-section"]


def test_markdown_link_with_title():
    spans = markdown_to_spans('[x](page.html "the title")')
    assert ("anchor", "page.html") in kinds_refs(spans)


def test_crawl_over_raw_html_corpus():
    """End-to-end: raw HTML docs → spans → full crawl."""
    from linkinator_ray.options import CheckOptions
    from linkinator_ray.pipelines.crawl import LinkChecker
    corpus = build_corpus_from_text(pa.table({
        "doc_id": ["index.html", "second.html"],
        "text": ['<a href="second.html">next</a>',
                 '<a href="missing.html">gone</a>'],
    }))
    res = LinkChecker(CheckOptions(paths=[""], recurse=True), corpus).check()
    rows = {r["url"]: r["state"] for r in res.results.to_pylist()}
    assert rows["http://corpus.test/second.html"] == "OK"
    assert rows["http://corpus.test/missing.html"] == "BROKEN"
