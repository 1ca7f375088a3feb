"""URL scalar kit semantics (reference: /root/reference/src/links.ts)."""

import numpy as np

from linkinator_ray import urlkit


class TestIsAbsoluteUrl:
    def test_schemes(self):
        assert urlkit.is_absolute_url("http://x.test/")
        assert urlkit.is_absolute_url("mailto:a@b.c")
        assert urlkit.is_absolute_url("irc://server/channel")

    def test_windows_path_excluded(self):
        assert not urlkit.is_absolute_url("c:\\temp\\file.html")

    def test_relative(self):
        assert not urlkit.is_absolute_url("foo/bar.html")
        assert not urlkit.is_absolute_url("/rooted/path")
        assert not urlkit.is_absolute_url("../up")


class TestNormalize:
    def test_default_port_stripped(self):
        assert urlkit.normalize_url("http://X.test:80/a") == "http://x.test/a"
        assert urlkit.normalize_url("https://x.test:443/") == "https://x.test/"
        assert urlkit.normalize_url("http://x.test:8080/") == "http://x.test:8080/"

    def test_empty_path_becomes_slash(self):
        assert urlkit.normalize_url("http://example.invalid") == "http://example.invalid/"

    def test_dot_segments(self):
        assert urlkit.normalize_url("http://x.test/a/../b") == "http://x.test/b"
        assert urlkit.normalize_url("http://x.test/a/./b/") == "http://x.test/a/b/"

    def test_fragment_stripped_by_default(self):
        assert urlkit.normalize_url("http://x.test/p#frag") == "http://x.test/p"
        assert urlkit.normalize_url("http://x.test/p#frag", keep_fragment=True) \
            == "http://x.test/p#frag"

    def test_space_encoded(self):
        assert urlkit.normalize_url("http://x.test/a b") == "http://x.test/a%20b"


class TestParseLink:
    def test_relative_resolution(self):
        parsed = urlkit.parse_link("sub/page.html", "http://x.test/dir/index.html")
        assert parsed.url == "http://x.test/dir/sub/page.html"
        assert parsed.error is None

    def test_fragment_split_and_decode(self):
        parsed = urlkit.parse_link("page.html#a%20b", "http://x.test/")
        assert parsed.url == "http://x.test/page.html"
        assert parsed.fragment == "a b"
        assert parsed.url_with_fragment == "http://x.test/page.html#a%20b"

    def test_parse_error(self):
        parsed = urlkit.parse_link("https://[", "http://x.test/")
        assert parsed.error is not None
        assert parsed.url is None

    def test_no_base_relative_fails(self):
        parsed = urlkit.parse_link("relative.html", "")
        assert parsed.error is not None

    def test_non_http_scheme_ok(self):
        parsed = urlkit.parse_link("mailto:a@b.c", "http://x.test/")
        assert parsed.error is None
        assert parsed.url.startswith("mailto:")


class TestBaseUrl:
    def test_absolute_wins(self):
        assert urlkit.get_base_url("http://b.test/dir/", "http://a.test/x") \
            == "http://b.test/dir/"

    def test_relative_resolves_against_doc(self):
        assert urlkit.get_base_url("sub/", "http://a.test/dir/index.html") \
            == "http://a.test/dir/sub/"


class TestMetaRefresh:
    def test_formats(self):
        assert urlkit.parse_meta_refresh("0;url=http://x.test/") == "http://x.test/"
        assert urlkit.parse_meta_refresh("5; url = /delayed") == "/delayed"
        assert urlkit.parse_meta_refresh("0;URL=/upper") == "/upper"
        assert urlkit.parse_meta_refresh("not a refresh") is None
        assert urlkit.parse_meta_refresh("zz;url=x") is None


class TestSrcset:
    def test_basic(self):
        assert urlkit.parse_srcset("a.png 1x, b.png 2x") == ["a.png", "b.png"]

    def test_multi_space(self):
        assert urlkit.parse_srcset("a.png   1x,   b.png     2x") == ["a.png", "b.png"]

    def test_no_descriptor(self):
        assert urlkit.parse_srcset("a.png, b.png") == ["a.png", "b.png"]


class TestCssExtraction:
    def test_imports_and_urls(self):
        css = (
            "/* url(commented.png) */\n"
            '@import url("i1.css");\n'
            "@import 'i2.css';\n"
            "body { background: url(bg.png); }\n"
            ".x { background: url(data:image/gif;base64,AA); }\n"
        )
        urls = urlkit.extract_urls_from_css(css)
        assert "i1.css" in urls and "i2.css" in urls and "bg.png" in urls
        assert "commented.png" not in urls
        assert not any(u.startswith("data:") for u in urls)

    def test_import_url_double_extracted(self):
        # parity with the reference: @import url(x) matches both regexes
        urls = urlkit.extract_urls_from_css("@import url(x.css);")
        assert urls.count("x.css") == 2


class TestJsonLd:
    def test_known_fields_only(self):
        payload = {
            "image": ["http://m.test/1.png", "http://m.test/2.png"],
            "author": {"url": "http://p.test/a"},
            "unknownField": "http://no.test/x",
            "logo": "not a url",
        }
        links = urlkit.extract_links_from_json(payload)
        assert set(links) == {"http://m.test/1.png", "http://m.test/2.png",
                              "http://p.test/a"}

    def test_bad_json_ignored(self):
        assert urlkit.extract_links_from_jsonld_text("{not json") == []


class TestHash:
    def test_stable(self):
        assert urlkit.hash64("x") == urlkit.hash64("x")
        assert urlkit.hash64("x") != urlkit.hash64("y")

    def test_array(self):
        arr = urlkit.hash64_array(["a", "b", "a"])
        assert arr.dtype == np.uint64
        assert arr[0] == arr[2] != arr[1]
        assert arr[0] == urlkit.hash64("a")


class TestFastResolveEquivalence:
    """The fast resolver must agree with the urllib-based slow path."""

    CASES = [
        ("page.html", "http://h.test/dir/index.html"),
        ("sub/page.html", "http://h.test/dir/"),
        ("/rooted/x.html", "http://h.test/dir/index.html"),
        ("http://other.test/abs.html", "http://h.test/"),
        ("https://other.test", "http://h.test/"),
        ("http://other.test/a/b/c", "http://h.test/"),
        ("page.html#frag", "http://h.test/"),
        ("#onlyfrag", "http://h.test/page.html"),
        ("page.html#", "http://h.test/"),
        ("../up.html", "http://h.test/a/b/"),
        ("./here.html", "http://h.test/a/"),
        ("a//b.html", "http://h.test/"),
        ("HTTP://UPPER.test/X", "http://h.test/"),
        ("http://h.test:80/x", "http://h.test/"),
        ("http://h.test:8080/x", "http://h.test/"),
        ("with space.html", "http://h.test/"),
        ("q.html?x=1", "http://h.test/"),
        ("/a/../b", "http://h.test/"),
        ("d17.html", "http://h3.test/"),
        ("/d/412.html", "http://corpus.test/d/5.html"),
        ("mailto:x@y.z", "http://h.test/"),
        ("pct%20enc.html", "http://h.test/"),
        ("http://user:pw@h.test/x", "http://h.test/"),
    ]

    def test_fixed_cases(self):
        import linkinator_ray.urlkit as uk
        for link, base in self.CASES:
            fast = uk.parse_link(link, base)
            # force the slow path by bypassing _fast_resolve
            orig = uk._fast_resolve
            uk._fast_resolve = lambda h, b: None
            try:
                slow = uk.parse_link(link, base)
            finally:
                uk._fast_resolve = orig
            assert (fast.url, fast.url_with_fragment, fast.fragment,
                    fast.error is None) == \
                (slow.url, slow.url_with_fragment, slow.fragment,
                 slow.error is None), (link, base)

    def test_hypothesis_paths(self):
        from hypothesis import given, settings, strategies as st
        import linkinator_ray.urlkit as uk
        seg = st.text(alphabet="abcZ09._-", min_size=1, max_size=5)
        links = st.one_of(
            st.builds(lambda a, b: f"{a}/{b}.html", seg, seg),
            st.builds(lambda a: f"/{a}.html", seg),
            st.builds(lambda a, b: f"http://{a.lower()}.test/{b}", seg, seg),
            st.builds(lambda a, f: f"{a}.html#{f}", seg, seg),
        )

        @settings(max_examples=300, deadline=None)
        @given(link=links)
        def check(link):
            base = "http://h.test/dir/page.html"
            fast = uk.parse_link(link, base)
            orig = uk._fast_resolve
            uk._fast_resolve = lambda h, b: None
            try:
                slow = uk.parse_link(link, base)
            finally:
                uk._fast_resolve = orig
            assert (fast.url, fast.url_with_fragment, fast.fragment) == \
                (slow.url, slow.url_with_fragment, slow.fragment), link

        check()


class TestUnicodeUrls:
    def test_unicode_path_roundtrip(self):
        parsed = urlkit.parse_link("café/menü.html", "http://x.test/")
        assert parsed.error is None
        # non-ascii path chars percent-encode like WHATWG href
        assert "caf%C3%A9" in parsed.url

    def test_unicode_fragment_decoded(self):
        parsed = urlkit.parse_link("p.html#%C3%BCber", "http://x.test/")
        assert parsed.fragment == "über"

    def test_unicode_host_lowercased(self):
        assert urlkit.host_of("http://EXAMPLE.test/x") == "example.test"
