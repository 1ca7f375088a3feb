"""Deterministic fixture corpora (FIXTURES.md) — the conformance inputs.

Each fixture mirrors one of the reference's on-disk corpora
(/root/reference/test/fixtures/*) as a spans documents table + an
``http_map`` (the MockAgent stand-in) + seeds/options. All content is
synthesized here deterministically; no external data.
"""

from __future__ import annotations

import dataclasses
import json

import pyarrow as pa

from linkinator_ray import schema

EXT = "http://example.invalid"


def span(kind: str, media_ref: str = "", text: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def doc(doc_id: str, *spans_in: dict) -> dict:
    spans = []
    for i, s in enumerate(spans_in):
        s = dict(s)
        s["offset"] = i * 10
        spans.append(s)
    return {"doc_id": doc_id, "spans": spans}


def docs_table(*docs: dict) -> pa.Table:
    return pa.Table.from_pylist(list(docs), schema=schema.DOCUMENTS) if docs \
        else schema.empty(schema.DOCUMENTS)


def http(url: str, status: int, method: str = "*", seq: int = -1,
         content_type: str = "", retry_after: str = "", headers: dict | None = None,
         body_doc_id: str = "", error: str = "") -> dict:
    return {
        "url": url, "method": method, "seq": seq, "status": status,
        "content_type": content_type, "retry_after": retry_after,
        "headers_json": json.dumps(headers) if headers else "",
        "body_doc_id": body_doc_id, "error": error,
    }


@dataclasses.dataclass
class Fixture:
    name: str
    documents: pa.Table
    http_map: list[dict]
    seeds: list[str]
    options: dict  # CheckOptions overrides


def _anchor(url: str, text: str = "link") -> dict:
    return span("anchor", url, text)


# ---------------------------------------------------------------------------


def basic() -> Fixture:
    return Fixture(
        "basic",
        docs_table(doc("basic/index.html", _anchor(EXT))),
        [http(EXT, 200)],
        ["basic/index.html"], {})


def twice() -> Fixture:
    spans = [_anchor(EXT) for _ in range(5)] + [_anchor(EXT + "#lolfragment")]
    return Fixture(
        "twice",
        docs_table(doc("twice/index.html", *spans)),
        [http(EXT, 200)],
        ["twice/index.html"], {})


def recurse() -> Fixture:
    return Fixture(
        "recurse",
        docs_table(
            doc("recurse/index.html", _anchor("first.html")),
            doc("recurse/first.html", _anchor("/recurse/"), _anchor("second.html")),
            doc("recurse/second.html", _anchor(EXT)),
        ),
        [http(EXT, 200)],
        ["recurse/"], {"recurse": True})


def broke() -> Fixture:
    return Fixture(
        "broke",
        docs_table(doc("broke/index.html", _anchor(EXT + "/"))),
        [http(EXT + "/", 404)],
        ["broke/index.html"], {})


def skip_fixture() -> Fixture:
    return Fixture(
        "skip",
        docs_table(doc("skip/index.html", _anchor("http://very.bad"))),
        [],
        ["skip/index.html"],
        {"links_to_skip": ["http://very.bad"]})


def protocols() -> Fixture:
    return Fixture(
        "protocols",
        docs_table(doc(
            "protocols/index.html",
            _anchor("irc://irc.example.invalid/channel"),
            _anchor("mailto:nobody@example.invalid"),
            span("img_src", "data:image/gif;base64,R0lGOD"),
        )),
        [],
        ["protocols/index.html"], {})


def image() -> Fixture:
    return Fixture(
        "image",
        docs_table(
            doc("image/index.html",
                span("img_src", "missing.png"),
                span("img_src", "boo.jpg"),
                span("srcset_candidate", "missing2.jpg")),
            doc("image/boo.jpg", span("text", "", "JPEGDATA")),
            doc("image/missing2.jpg", span("text", "", "JPEGDATA")),
        ),
        [],
        ["image/index.html"], {})


def srcset() -> Fixture:
    return Fixture(
        "srcset",
        docs_table(
            doc("srcset/index.html",
                span("srcset_raw", "_site/foo.html 1x,  _site/bar.html   2x")),
            doc("srcset/_site/foo.html", span("text", "", "foo")),
            doc("srcset/_site/bar.html", span("text", "", "bar")),
        ),
        [],
        ["srcset/index.html"], {})


def metarefresh() -> Fixture:
    return Fixture(
        "metarefresh",
        docs_table(
            doc("metarefresh/index.html",
                span("meta_refresh", "0;url=/metarefresh/redirected.html"),
                span("meta_refresh", "5; url = /metarefresh/delayed.html"),
                span("meta_refresh", "0;URL=/metarefresh/uppercase.html")),
            doc("metarefresh/redirected.html", span("text", "", "a")),
            doc("metarefresh/delayed.html", span("text", "", "b")),
            doc("metarefresh/uppercase.html", span("text", "", "c")),
        ),
        [],
        ["metarefresh/index.html"], {})


def basetag_cases() -> list[Fixture]:
    """Five <base href> variants (reference test/test.index.ts:264-334)."""
    cases = []
    variants = [
        ("absolute", "http://base.invalid/dir/", "http://base.invalid/dir/ok.html",
         "http://base.invalid/dir/broken.html"),
        ("relative", "dir/", "http://corpus.test/basetag/dir/ok.html",
         "http://corpus.test/basetag/dir/broken.html"),
        ("rooted", "/rooted/", "http://corpus.test/rooted/ok.html",
         "http://corpus.test/rooted/broken.html"),
        ("dotdot", "../up/", "http://corpus.test/up/ok.html",
         "http://corpus.test/up/broken.html"),
        ("hostonly", "http://base2.invalid", "http://base2.invalid/ok.html",
         "http://base2.invalid/broken.html"),
    ]
    for name, base_href, ok_url, broken_url in variants:
        fixture = Fixture(
            f"basetag-{name}",
            docs_table(doc(
                "basetag/index.html",
                span("base", base_href),
                _anchor("ok.html"),
                _anchor("broken.html"))),
            [http(ok_url, 200), http(broken_url, 404)],
            ["basetag/index.html"], {})
        cases.append(fixture)
    return cases


def relative() -> Fixture:
    return Fixture(
        "relative",
        docs_table(
            doc("relative/index.html", _anchor("./a/b.html")),
            doc("relative/a/b.html", _anchor("../c.html")),
            doc("relative/c.html", _anchor("a/../index.html")),
        ),
        [],
        ["relative/"], {"recurse": True})


def markdown() -> Fixture:
    return Fixture(
        "markdown",
        docs_table(
            doc("markdown/README.md",
                span("fragment_target", "", "introduction"),
                _anchor("LICENSE.md"),
                span("img_src", "boo.jpg")),
            doc("markdown/LICENSE.md", span("text", "", "MIT")),
            doc("markdown/unlinked.md", _anchor("LICENSE.md")),
            doc("markdown/deep/deep.md", _anchor("../LICENSE.md")),
            doc("markdown/boo.jpg", span("text", "", "JPEG")),
        ),
        [],
        ["markdown/README.md"], {"markdown": True})


def repeated_broken_link() -> Fixture:
    return Fixture(
        "repeated-broken-link",
        docs_table(
            doc("repeat/index.html", _anchor("a.html"), _anchor("b.html")),
            doc("repeat/a.html",
                _anchor("/repeat/broken123"), _anchor("/repeat/broken456")),
            doc("repeat/b.html",
                _anchor("/repeat/broken123"), _anchor("/repeat/broken789")),
        ),
        [],
        ["repeat/"], {"recurse": True})


def retry_fixture() -> Fixture:
    """429 + Retry-After host gating (test/test.retry.ts:142-221)."""
    return Fixture(
        "retry",
        docs_table(
            doc("retry/index.html",
                _anchor("http://slow.invalid/1"),
                _anchor("http://slow.invalid/3"),
                _anchor("subpage.html")),
            doc("retry/subpage.html", _anchor("http://slow.invalid/2")),
        ),
        [
            http("http://slow.invalid/1", 429, seq=0, retry_after="3"),
            http("http://slow.invalid/1", 200, seq=1),
            http("http://slow.invalid/3", 429, seq=0, retry_after="3"),
            http("http://slow.invalid/3", 200, seq=1),
            http("http://slow.invalid/2", 200),
        ],
        ["retry/"], {"recurse": True, "retry": True})


def retry_errors(times_503: int = 2, then_ok: bool = True) -> Fixture:
    entries = [http("http://flaky.invalid/", 503, method="GET", seq=i)
               for i in range(times_503)]
    if then_ok:
        entries.append(http("http://flaky.invalid/", 200, method="GET", seq=times_503))
    # HEAD always 503 so the GET path is exercised
    entries.append(http("http://flaky.invalid/", 503, method="HEAD"))
    return Fixture(
        "retry-errors",
        docs_table(doc("retryerr/index.html", _anchor("http://flaky.invalid/"))),
        entries,
        ["retryerr/index.html"], {"retry_errors": True})


def redirects(mode: str = "allow") -> Fixture:
    return Fixture(
        f"redirects-{mode}",
        docs_table(doc(
            "redir/index.html",
            _anchor("http://r.invalid/hop1"),
            _anchor("http://r.invalid/nonstandard"))),
        [
            http("http://r.invalid/hop1", 301,
                 headers={"location": "http://r.invalid/hop2"}),
            http("http://r.invalid/hop2", 200),
            # non-standard 3xx: no Location, with body on GET
            http("http://r.invalid/nonstandard", 302, method="GET",
                 body_doc_id="redir/index.html"),
            http("http://r.invalid/nonstandard", 302, method="HEAD"),
        ],
        ["redir/index.html"], {"redirects": mode})


def redirect_chain(hops: int) -> Fixture:
    entries = []
    for i in range(hops):
        entries.append(http(
            f"http://chain.invalid/{i}", 302,
            headers={"location": f"http://chain.invalid/{i + 1}"}))
    entries.append(http(f"http://chain.invalid/{hops}", 200))
    return Fixture(
        f"redirect-chain-{hops}",
        docs_table(doc("chain/index.html", _anchor("http://chain.invalid/0"))),
        entries,
        ["chain/index.html"], {})


def status_codes() -> Fixture:
    return Fixture(
        "status-codes",
        docs_table(doc(
            "codes/index.html",
            _anchor("http://codes.invalid/200"),
            _anchor("http://codes.invalid/403"),
            _anchor("http://codes.invalid/404"),
            _anchor("http://codes.invalid/500"))),
        [
            http("http://codes.invalid/200", 200),
            http("http://codes.invalid/403", 403),
            http("http://codes.invalid/404", 404),
            http("http://codes.invalid/500", 500),
        ],
        ["codes/index.html"], {})


def fragments() -> Fixture:
    return Fixture(
        "fragments",
        docs_table(
            doc("frag/index.html",
                _anchor("target.html#valid-section"),
                _anchor("target.html#missing-section"),
                _anchor("#local-ok"),
                _anchor("#local-missing"),
                _anchor("gh.html#gh-anchor"),
                span("fragment_target", "", "local-ok")),
            doc("frag/target.html",
                span("fragment_target", "", "valid-section"),
                span("fragment_target", "", "named-anchor")),
            doc("frag/gh.html",
                span("fragment_target", "", "user-content-gh-anchor"),
                span("fragment_target", "", "gh-anchor")),
        ),
        [],
        ["frag/"], {"recurse": True, "check_fragments": True})


def css_fixture() -> Fixture:
    css_text = (
        "/* comment url(nope.css) */\n"
        '@import url("imported1.css");\n'
        "@import 'imported2.css';\n"
        "body { background: url(bg1.png); }\n"
        ".a { background-image: url('bg2.png'); }\n"
        '.b { background-image: url("bg3.png"); }\n'
        ".c { background: url(data:image/gif;base64,AAAA); }\n"
    )
    return Fixture(
        "css",
        docs_table(
            doc("css/index.html",
                span("style_url", "", css_text),
                _anchor("/css/regular-link.html"),
                span("anchor", "styles.css", "stylesheet")),
            doc("css/styles.css",
                span("style_url", "", "h1 { background: url(deep.png); }")),
            doc("css/regular-link.html", span("text", "", "x")),
            doc("css/imported1.css", span("text", "", "")),
            doc("css/imported2.css", span("text", "", "")),
            doc("css/bg1.png", span("text", "", "PNG")),
            doc("css/bg2.png", span("text", "", "PNG")),
            doc("css/bg3.png", span("text", "", "PNG")),
            doc("css/deep.png", span("text", "", "PNG")),
        ),
        [],
        ["css/"], {"recurse": True, "check_css": True})


def json_ld() -> Fixture:
    payload = json.dumps({
        "@context": "http://schema.invalid",
        "image": ["http://media.invalid/img1.png", "http://media.invalid/img2.png"],
        "author": {"name": "nobody", "url": "http://people.invalid/nobody"},
        "publisher": {"logo": {"url": "http://media.invalid/logo.png"}},
        "notAUrlField": "http://should-not.invalid/x",
        "description": "plain text",
    })
    return Fixture(
        "json-ld",
        docs_table(doc(
            "jsonld/index.html",
            span("jsonld_url", "", payload),
            _anchor("http://plain.invalid/page"))),
        [
            http("http://media.invalid/img1.png", 200),
            http("http://media.invalid/img2.png", 200),
            http("http://people.invalid/nobody", 200),
            http("http://media.invalid/logo.png", 200),
            http("http://plain.invalid/page", 200),
        ],
        ["jsonld/index.html"], {})


def baseurl() -> Fixture:
    """Absolute <base> pointing off-host: same-origin recursion gate
    (test/test.index.ts:405-424)."""
    return Fixture(
        "baseurl",
        docs_table(doc(
            "baseurl/index.html",
            span("base", "http://elsewhere.invalid/dir/"),
            _anchor("page.html"))),
        [http("http://elsewhere.invalid/dir/page.html", 200)],
        ["baseurl/"], {"recurse": True})


def malformed() -> Fixture:
    return Fixture(
        "malformed",
        docs_table(doc("malformed/index.html", _anchor("https://["))),
        [],
        ["malformed/index.html"], {})


def bot_protection() -> Fixture:
    return Fixture(
        "bot-protection",
        docs_table(doc(
            "bot/index.html",
            _anchor("http://linkedin.invalid/x"),
            _anchor("http://cf.invalid/y"))),
        [
            http("http://linkedin.invalid/x", 999),
            http("http://cf.invalid/y", 403, headers={"cf-mitigated": "challenge"}),
        ],
        ["bot/index.html"], {})


def head_fallback() -> Fixture:
    return Fixture(
        "head-fallback",
        docs_table(doc(
            "headfb/index.html",
            _anchor("http://nohead.invalid/a"),
            _anchor("http://forbidden.invalid/b"))),
        [
            http("http://nohead.invalid/a", 405, method="HEAD"),
            http("http://nohead.invalid/a", 200, method="GET"),
            http("http://forbidden.invalid/b", 403, method="HEAD"),
            http("http://forbidden.invalid/b", 200, method="GET"),
        ],
        ["headfb/index.html"], {})


def rewrite() -> Fixture:
    return Fixture(
        "rewrite",
        docs_table(
            doc("rewrite/README.md", _anchor("NOTLICENSE.md")),
            doc("rewrite/LICENSE.md", span("text", "", "MIT")),
        ),
        [],
        ["rewrite/README.md"],
        {"markdown": True,
         "url_rewrites": [("NOTLICENSE", "LICENSE")]})


ALL = {
    "basic": basic, "twice": twice, "recurse": recurse, "broke": broke,
    "skip": skip_fixture, "protocols": protocols, "image": image,
    "srcset": srcset, "metarefresh": metarefresh, "relative": relative,
    "markdown": markdown, "repeated-broken-link": repeated_broken_link,
    "retry": retry_fixture, "status-codes": status_codes,
    "fragments": fragments, "css": css_fixture, "json-ld": json_ld,
    "baseurl": baseurl, "malformed": malformed,
    "bot-protection": bot_protection, "head-fallback": head_fallback,
    "rewrite": rewrite,
}
