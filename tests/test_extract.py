"""Span extraction stage (stages/extract.py) including the per-row
span-sequence-equality invariant (FIXTURES.md / BASELINE.json input_hint)."""

import pyarrow as pa

from linkinator_ray import schema
from linkinator_ray.sources import fixtures as fx
from linkinator_ray.stages.extract import ExtractLinks, explode_spans


def test_explode_spans_roundtrip_order():
    """Span-sequence equality: exploded (kind, text, media_ref) ordered by
    offset must equal the input span list per doc."""
    table = fx.docs_table(
        fx.doc("a.html", fx.span("text", "", "hello"), fx.span("anchor", "x.html", "x"),
               fx.span("img_src", "i.png")),
        fx.doc("b.html", fx.span("anchor", "y.html", "y")),
    )
    flat = explode_spans(table)
    rows = flat.to_pylist()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, doc_rows in by_doc.items():
        doc_rows.sort(key=lambda r: r["offset"])
        orig = [s for d in table.to_pylist() if d["doc_id"] == doc_id
                for s in d["spans"]]
        orig.sort(key=lambda s: s["offset"])
        got = [(r["kind"], r["text"], r["media_ref"]) for r in doc_rows]
        want = [(s["kind"], s["text"], s["media_ref"]) for s in orig]
        assert got == want, doc_id
        assert [r["order"] for r in doc_rows] == list(range(len(doc_rows)))


def test_all_fixture_corpora_roundtrip():
    for name, builder in fx.ALL.items():
        fixture = builder()
        if fixture.documents.num_rows == 0:
            continue
        flat = explode_spans(fixture.documents)
        orig_docs = fixture.documents.to_pylist()
        total = sum(len(d["spans"]) for d in orig_docs)
        assert flat.num_rows == total, name
        by_doc = {}
        for r in flat.to_pylist():
            by_doc.setdefault(r["doc_id"], []).append(r)
        for d in orig_docs:
            got = sorted(by_doc.get(d["doc_id"], []), key=lambda r: r["offset"])
            want = sorted(d["spans"], key=lambda s: s["offset"])
            assert [(r["kind"], r["text"], r["media_ref"]) for r in got] == \
                [(s["kind"], s["text"], s["media_ref"]) for s in want], \
                (name, d["doc_id"])


def test_anchor_extraction_and_order():
    ex = ExtractLinks()
    links, frags = ex.extract_with_fragments(fx.docs_table(
        fx.doc("d/index.html",
               fx.span("anchor", "a.html"),
               fx.span("text", "", "hi"),
               fx.span("anchor", "http://ext.test/x"),
               fx.span("fragment_target", "", "sec-1"))))
    rows = links.to_pylist()
    assert [r["raw_link"] for r in rows] == ["a.html", "http://ext.test/x"]
    assert [r["order"] for r in rows] == [0, 1]
    assert rows[0]["url"] == "http://corpus.test/d/a.html"
    assert frags.to_pylist() == [
        {"page_url": "http://corpus.test/d/index.html", "fragment_id": "sec-1"}]


def test_base_tag_first_wins():
    ex = ExtractLinks()
    links, _ = ex.extract_with_fragments(fx.docs_table(
        fx.doc("d/index.html",
               fx.span("base", "http://b.test/dir/"),
               fx.span("base", "http://ignored.test/"),
               fx.span("anchor", "page.html"))))
    assert links.to_pylist()[0]["url"] == "http://b.test/dir/page.html"


def test_srcset_raw_split():
    ex = ExtractLinks()
    links, _ = ex.extract_with_fragments(fx.docs_table(
        fx.doc("s/index.html",
               fx.span("srcset_raw", "a.png 1x,  b.png   2x"))))
    assert [r["raw_link"] for r in links.to_pylist()] == ["a.png", "b.png"]
    assert all(r["kind"] == "srcset_candidate" for r in links.to_pylist())


def test_meta_refresh_and_meta_content():
    ex = ExtractLinks()
    links, _ = ex.extract_with_fragments(fx.docs_table(
        fx.doc("m/index.html",
               fx.span("meta_refresh", "0;url=/redirected"),
               fx.span("meta_content", "http://abs.test/ok"),
               fx.span("meta_content", "not-a-url-keyword"))))
    raws = [r["raw_link"] for r in links.to_pylist()]
    assert raws == ["/redirected", "http://abs.test/ok"]


def test_style_gated_by_check_css():
    docs = fx.docs_table(fx.doc("c/index.html",
                                fx.span("style_url", "", "body{background:url(x.png)}")))
    off = ExtractLinks(check_css=False)
    on = ExtractLinks(check_css=True)
    assert off(docs).num_rows == 0
    got = on(docs).to_pylist()
    assert [r["raw_link"] for r in got] == ["x.png"]


def test_jsonld_unconditional():
    import json
    docs = fx.docs_table(fx.doc("j/index.html", fx.span(
        "jsonld_url", "", json.dumps({"image": "http://m.test/i.png"}))))
    got = ExtractLinks(check_css=False)(docs).to_pylist()
    assert [r["raw_link"] for r in got] == ["http://m.test/i.png"]


def test_parse_error_row():
    got = ExtractLinks()(fx.docs_table(
        fx.doc("e/index.html", fx.span("anchor", "https://[")))).to_pylist()
    assert len(got) == 1
    assert got[0]["parse_error"] != ""
    assert got[0]["url"] == ""


def test_links_schema():
    out = ExtractLinks()(fx.docs_table(fx.doc("x.html", fx.span("anchor", "y.html"))))
    assert out.schema.equals(schema.LINKS)


def test_fast_path_equals_scalar_path_randomized():
    """Differential: the vectorized batch kernel must produce exactly the
    scalar per-doc extraction for randomized corpora mixing every kind."""
    import random
    rng = random.Random(1234)
    kinds_pool = [
        ("anchor", "/d/{i}.html", ""),
        ("anchor", "rel{i}.html", ""),
        ("anchor", "http://ext.invalid/p{i}", ""),
        ("anchor", "../up/{i}", ""),
        ("anchor", "weird path {i}", ""),
        ("anchor", "", ""),  # empty ref — no emit
        ("img_src", "img/{i}.png", ""),
        ("srcset_raw", "a{i}.png 1x, b{i}.png 2x", ""),
        ("meta_refresh", "0;url=/go/{i}.html", ""),
        ("meta_content", "http://abs.invalid/m{i}", ""),
        ("meta_content", "not-a-url {i}", ""),
        ("style_url", "", "body {{ background: url('/bg{i}.png') }}"),
        ("jsonld_url", "", '{{"url": "http://ld.invalid/{i}"}}'),
        ("fragment_target", "", "frag-{i}"),
        ("text", "", "hello {i}"),
        ("base", "/based/", ""),
    ]
    for check_css in (False, True):
        docs = []
        for d in range(40):
            spans = []
            for j in range(rng.randrange(0, 9)):
                kind, ref, text = rng.choice(kinds_pool)
                spans.append(fx.span(kind, ref.format(i=j), text.format(i=j)))
            docs.append(fx.doc(f"dir/doc{d}.html", *spans))
        table = fx.docs_table(*docs)
        ex = ExtractLinks(check_css=check_css)
        links_v, frags_v = ex.extract_with_fragments(table)
        ex2 = ExtractLinks(check_css=check_css)
        links_s, frags_s = ex2._extract_scalar(table)

        def norm(t):
            return sorted(map(tuple, zip(*[t[c].to_pylist() for c in t.column_names])))
        assert norm(links_v) == norm(links_s)
        assert norm(frags_v) == norm(frags_s)


def test_fast_path_unsorted_offsets_fall_back():
    """Docs whose spans are not offset-sorted take the scalar path and
    keep offset-ordered emission."""
    import pyarrow as pa
    from linkinator_ray import schema as sch
    rows = [{"doc_id": "u/x.html", "spans": [
        {"kind": "anchor", "text": "", "media_ref": "/b.html", "offset": 20},
        {"kind": "anchor", "text": "", "media_ref": "/a.html", "offset": 10},
    ]}]
    table = pa.Table.from_pylist(rows, schema=sch.DOCUMENTS)
    links, _ = ExtractLinks().extract_with_fragments(table)
    assert links["raw_link"].to_pylist() == ["/a.html", "/b.html"]
    assert links["order"].to_pylist() == [0, 1]
