"""Unit matrix for the vectorized classifier (stages/classify.py),
mirroring test/test.status-codes.ts + test.redirects.ts decision rows."""

import numpy as np
import pyarrow as pa

from linkinator_ray import schema
from linkinator_ray.options import CheckOptions
from linkinator_ray.stages.classify import (
    backoff_delays, classify_batch, should_retry_error_mask, status_code_action)


def batch(rows):
    defaults = {
        "url": "http://x.test/a", "url_hash": 0, "host": "x.test",
        "parent": "", "depth": 0, "do_crawl": False, "root_path": "",
        "attempt": 0, "status": 200, "final_url": "http://x.test/a",
        "has_body": False, "body_doc_id": "", "content_type": "",
        "has_location": False, "retry_after_epoch": 0.0,
        "cf_mitigated": False, "redirect_skipped": "", "error_details": "",
        "soft404": False,
    }
    return pa.Table.from_pylist([{**defaults, **r} for r in rows],
                                schema=schema.FETCH_RESULTS)


def states(rows, **opts):
    verdict = classify_batch(batch(rows), CheckOptions(paths=["x"], **opts))
    return list(verdict["state"])


def test_basic_matrix():
    assert states([{"status": 200}]) == ["OK"]
    assert states([{"status": 204}]) == ["OK"]
    assert states([{"status": 404}]) == ["BROKEN"]
    assert states([{"status": 500}]) == ["BROKEN"]
    assert states([{"status": 0, "final_url": ""}]) == ["BROKEN"]


def test_bot_protection():
    assert states([{"status": 999}]) == ["SKIPPED"]
    assert states([{"status": 403, "cf_mitigated": True}]) == ["SKIPPED"]
    assert states([{"status": 403}]) == ["BROKEN"]


def test_redirect_modes():
    redirect = {"status": 302, "has_location": True}
    assert states([redirect], redirects="allow") == ["BROKEN"]  # not followed, no body
    assert states([redirect], redirects="error") == ["BROKEN"]
    followed_nonstandard = {"status": 302, "has_body": True,
                            "body_doc_id": "d", "has_location": False}
    assert states([followed_nonstandard], redirects="allow") == ["OK"]
    assert states([followed_nonstandard], redirects="warn") == ["OK"]
    assert states([followed_nonstandard], redirects="error") == ["BROKEN"]


def test_custom_status_actions_priority():
    # custom action outranks bot-protection skip (src/index.ts:484-523)
    assert states([{"status": 999}], status_codes={"999": "error"}) == ["BROKEN"]
    assert states([{"status": 404}], status_codes={"404": "ok"}) == ["OK"]
    assert states([{"status": 418}], status_codes={"4xx": "skip"}) == ["SKIPPED"]
    assert states([{"status": 200}], status_codes={"200": "error"}) == ["BROKEN"]


def test_status_code_action_lookup():
    codes = {"403": "ok", "4xx": "error", "5xx": "skip"}
    assert status_code_action(403, codes) == "ok"     # exact beats pattern
    assert status_code_action(404, codes) == "error"
    assert status_code_action(500, codes) == "skip"
    assert status_code_action(200, codes) is None
    assert status_code_action(200, {}) is None


def test_require_https_override():
    rows = [{"status": 200, "url": "http://plain.test/x",
             "final_url": "http://plain.test/x"}]
    assert states(rows, require_https="error") == ["BROKEN"]
    assert states(rows, require_https="warn") == ["OK"]
    # https links unaffected
    rows2 = [{"status": 200, "url": "https://sec.test/x",
              "final_url": "https://sec.test/x"}]
    assert states(rows2, require_https="error") == ["OK"]


def test_retry_error_mask():
    opts = CheckOptions(paths=["x"], retry_errors=True, retry_errors_count=3)
    status = np.array([0, 503, 429, 429, 404, 500])
    attempt = np.array([0, 0, 0, 0, 0, 3])
    ra = np.array([0.0, 0.0, 0.0, 99.0, 0.0, 0.0])
    mask = should_retry_error_mask(status, attempt, ra, opts)
    # 429 WITH usable retry-after is not an error-retry; attempts
    # exhausted (500 @ attempt 3) is not retried
    assert mask.tolist() == [True, True, True, False, False, False]


def test_backoff_is_exponential_with_bounded_jitter():
    opts = CheckOptions(paths=["x"], retry_errors_jitter=3.0)
    rng = np.random.default_rng(0)
    delays = backoff_delays(np.array([0, 1, 2]), opts, rng)
    assert 2.0 <= delays[0] <= 5.0
    assert 4.0 <= delays[1] <= 7.0
    assert 8.0 <= delays[2] <= 11.0
