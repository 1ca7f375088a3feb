"""Retry semantics with a fake clock (reference: test/test.retry.ts)."""

import pyarrow.compute as pc

from linkinator_ray.options import CheckOptions
from linkinator_ray.pipelines.crawl import LinkChecker
from linkinator_ray.sources import fixtures as fx
from linkinator_ray.state.clock import FakeClock


def run(fixture, **extra):
    opts = dict(fixture.options)
    opts.update(extra)
    clock = FakeClock()
    checker = LinkChecker(CheckOptions(paths=fixture.seeds, **opts),
                          fixture.documents, fixture.http_map, clock=clock)
    return checker.check(), clock


def test_retry_after_429():
    res, clock = run(fx.retry_fixture())
    assert res.passed, res.results.to_pylist()
    # /1 and /3 each fetched twice (429 then 200)
    one = [c for c in res.call_log if c[0] == "http://slow.invalid/1"]
    assert len(one) == 2
    assert one[0][2] == 429 and one[1][2] == 200
    # the fake clock advanced ≥ the 3s retry-after
    assert clock.now() >= 1_000_000.0 + 3
    assert res.stats["retries"] >= 2


def test_retry_host_wide_gating():
    """/2 (discovered via subpage) must not be fetched before the host
    deadline set by /1's 429 (test/test.retry.ts:142-221)."""
    res, clock = run(fx.retry_fixture())
    calls_2 = [c for c in res.call_log if c[0] == "http://slow.invalid/2"]
    assert len(calls_2) == 1 and calls_2[0][2] == 200
    assert res.passed


def test_retry_disabled_broken():
    fixture = fx.Fixture(
        "noretry",
        fx.docs_table(fx.doc("noretry/index.html",
                             fx._anchor("http://slow.invalid/1"))),
        [fx.http("http://slow.invalid/1", 429, retry_after="3")],
        ["noretry/index.html"], {"retry": False})
    res, _ = run(fixture)
    assert not res.passed
    broken = res.results.filter(pc.equal(res.results["state"], "BROKEN"))
    urls = {r["url"] for r in broken.to_pylist()}
    assert "http://slow.invalid/1" in urls


def test_retry_errors_eventual_success():
    res, clock = run(fx.retry_errors(times_503=2, then_ok=True))
    assert res.passed, res.results.to_pylist()
    gets = [c for c in res.call_log
            if c[0] == "http://flaky.invalid/" and c[1] == "GET"]
    assert [c[2] for c in gets] == [503, 503, 200]
    # exponential backoff: clock advanced ≥ 2 + 4 seconds
    assert clock.now() >= 1_000_000.0 + 6


def test_retry_errors_exhausted():
    res, _ = run(fx.retry_errors(times_503=10, then_ok=False),
                 retry_errors_count=3)
    assert not res.passed
    gets = [c for c in res.call_log
            if c[0] == "http://flaky.invalid/" and c[1] == "GET"]
    # initial + 3 retries = 4 GETs (plus HEAD attempts each pass)
    assert len(gets) == 4


def test_retry_errors_count_zero():
    res, _ = run(fx.retry_errors(times_503=10, then_ok=False),
                 retry_errors_count=0)
    gets = [c for c in res.call_log
            if c[0] == "http://flaky.invalid/" and c[1] == "GET"]
    assert len(gets) == 1


def test_retry_errors_disabled_one_shot():
    res, _ = run(fx.retry_errors(times_503=10, then_ok=False),
                 retry_errors=False)
    assert not res.passed
    gets = [c for c in res.call_log
            if c[0] == "http://flaky.invalid/" and c[1] == "GET"]
    assert len(gets) == 1


def test_max_of_retry_after_deadlines():
    """Two 429s on one host: the host waits for the max deadline
    (src/index.ts:1035-1043)."""
    fixture = fx.Fixture(
        "maxdl",
        fx.docs_table(fx.doc("maxdl/index.html",
                             fx._anchor("http://slow.invalid/a"),
                             fx._anchor("http://slow.invalid/b"))),
        [
            fx.http("http://slow.invalid/a", 429, seq=0, retry_after="2"),
            fx.http("http://slow.invalid/a", 200, seq=1),
            fx.http("http://slow.invalid/b", 429, seq=0, retry_after="10"),
            fx.http("http://slow.invalid/b", 200, seq=1),
        ],
        ["maxdl/index.html"], {"retry": True})
    res, clock = run(fixture)
    assert res.passed
    assert clock.now() >= 1_000_000.0 + 10
