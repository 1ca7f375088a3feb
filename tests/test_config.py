"""Config loading / merging (reference: test/test.config.ts)."""

import json

import pytest

from linkinator_ray.options import (
    CheckOptions, find_config, load_config, merge_config, validate_status_codes)


def test_load_and_merge(tmp_path):
    cfg = tmp_path / "linkinator.config.json"
    cfg.write_text(json.dumps({"recurse": True, "concurrency": 7,
                               "links_to_skip": ["skip-me"]}))
    loaded = load_config(str(cfg))
    assert loaded["recurse"] is True
    # CLI flags (non-None) win over config (src/config.ts:120-130)
    merged = merge_config({"concurrency": 3, "recurse": None}, loaded)
    assert merged["concurrency"] == 3
    assert merged["recurse"] is True
    assert merged["links_to_skip"] == ["skip-me"]


def test_find_config(tmp_path):
    assert find_config(str(tmp_path)) is None
    (tmp_path / "linkinator.config.json").write_text("{}")
    assert find_config(str(tmp_path)) is not None


def test_options_from_config_roundtrip(tmp_path):
    cfg = {"recurse": True, "check_css": True,
           "status_codes": {"403": "ok", "5xx": "skip"},
           "redirects": "warn"}
    opts = CheckOptions(paths=["x"], **cfg)
    assert opts.redirects.value == "warn"
    assert opts.status_codes == {"403": "ok", "5xx": "skip"}


def test_validate_status_codes_rejects():
    with pytest.raises(ValueError):
        validate_status_codes({"abc": "ok"})
    with pytest.raises(ValueError):
        validate_status_codes({"404": "explode"})
    assert validate_status_codes({"404": "ok", "4XX": "warn"}) == \
        {"404": "ok", "4xx": "warn"}


def test_concurrency_caps_fetch_pool():
    from linkinator_ray.pipelines.crawl import LinkChecker
    from linkinator_ray.sources import fixtures as fx
    fixture = fx.basic()
    checker = LinkChecker(
        CheckOptions(paths=fixture.seeds, concurrency=1, fetch_concurrency=8),
        fixture.documents, fixture.http_map)
    res = checker.check()
    assert res.passed  # single-connection crawl still completes


def test_url_rewrite_forms():
    opts = CheckOptions(paths=["x"], url_rewrites=[
        ("foo", "bar"),
        {"pattern": "a+", "replacement": "b"},
    ])
    assert opts.url_rewrites[0].pattern.pattern == "foo"
    assert opts.url_rewrites[1].replacement == "b"
    with pytest.raises(ValueError):
        CheckOptions(paths=["x"], url_rewrites=["not-a-pair"])


def test_toml_config_flavor(tmp_path):
    """TOML config flavor (the Python-world analogue of the reference's
    .js/.mjs/.cjs flavors, src/config.ts:35-118)."""
    from linkinator_ray.options import find_config, load_config, merge_config
    cfg = tmp_path / "linkinator.config.toml"
    cfg.write_text('concurrency = 7\nrecurse = true\n'
                   'links_to_skip = ["^http://skip"]\n')
    loaded = load_config(str(cfg))
    assert loaded == {"concurrency": 7, "recurse": True,
                      "links_to_skip": ["^http://skip"]}
    merged = merge_config({"concurrency": 9, "recurse": None}, loaded)
    assert merged["concurrency"] == 9 and merged["recurse"] is True
    # discovery order: json wins over toml when both exist
    assert find_config(str(tmp_path)) == str(cfg)
    (tmp_path / "linkinator.config.json").write_text('{"concurrency": 1}')
    assert find_config(str(tmp_path)).endswith(".json")
