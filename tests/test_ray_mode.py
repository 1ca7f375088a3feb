"""Distributed-mode crawl: Ray actor seen-set shards + fetch actor pool
must produce the same final sets as local mode."""

import pyarrow.compute as pc

from linkinator_ray.options import CheckOptions
from linkinator_ray.pipelines.crawl import LinkChecker
from linkinator_ray.sources import fixtures as fx


def key_set(res):
    return {(r["url"], r["state"], r["status"], r["parent"])
            for r in res.results.to_pylist()}


def test_ray_mode_matches_local(ray_session):
    for builder in (fx.recurse, fx.repeated_broken_link, fx.css_fixture):
        fixture = builder()
        opts = CheckOptions(paths=fixture.seeds, **fixture.options,
                            fetch_concurrency=2, seen_shards=2)
        local = LinkChecker(opts, fixture.documents, fixture.http_map,
                            use_ray=False).check()
        opts2 = CheckOptions(paths=fixture.seeds, **fixture.options,
                             fetch_concurrency=2, seen_shards=2)
        distributed = LinkChecker(opts2, fixture.documents, fixture.http_map,
                                  use_ray=True).check()
        assert key_set(local) == key_set(distributed), fixture.name
        assert local.passed == distributed.passed


def test_ray_mode_retry(ray_session):
    fixture = fx.retry_fixture()
    opts = CheckOptions(paths=fixture.seeds, **fixture.options,
                        fetch_concurrency=2)
    res = LinkChecker(opts, fixture.documents, fixture.http_map,
                      use_ray=True).check()
    assert res.passed
    # host-sticky routing keeps the 429→200 sequence deterministic
    one = [c for c in res.call_log if c[0] == "http://slow.invalid/1"]
    assert [c[2] for c in one] == [429, 200]
