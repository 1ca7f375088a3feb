"""Options / config surface of the engine.

Mirrors the reference's option surface (``CheckOptions`` at
/root/reference/src/options.ts:13-40 and its validation at :54-191) as a
plain dataclass — driver-side only, never shipped per batch. Regexes are
compiled once here and reused by every stage.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
import re
from collections.abc import Callable
from typing import Any


class LinkState(str, enum.Enum):
    """Per-URL verdict (reference: src/index.ts:94-98)."""

    OK = "OK"
    BROKEN = "BROKEN"
    SKIPPED = "SKIPPED"


class RedirectsMode(str, enum.Enum):
    """How 3xx responses are treated (src/options.ts:74, src/index.ts:503-553)."""

    ALLOW = "allow"
    WARN = "warn"
    ERROR = "error"


class RequireHttpsMode(str, enum.Enum):
    """http:// link policy (src/options.ts:114, src/index.ts:556-604)."""

    OFF = "off"
    WARN = "warn"
    ERROR = "error"


# statusCodes action vocabulary (src/index.ts:1314-1361)
STATUS_ACTIONS = ("ok", "warn", "skip", "error")

# any 3-digit code (999 bot-blocks are real) or a Nxx wildcard
_STATUS_PATTERN = re.compile(r"^(\d{3}|[1-9]xx)$", re.IGNORECASE)


def validate_status_codes(mapping: dict[str, str]) -> dict[str, str]:
    """Validate a statusCodes map {code-or-pattern: action}.

    Exact codes like "403" and wildcard patterns like "4xx"/"5xx" are
    accepted; exact beats pattern at lookup time
    (src/index.ts:1314-1361).
    """
    out: dict[str, str] = {}
    for key, action in mapping.items():
        key = str(key).lower()
        if not _STATUS_PATTERN.match(key):
            raise ValueError(f"invalid status code pattern: {key!r}")
        if action not in STATUS_ACTIONS:
            raise ValueError(f"invalid status code action: {action!r}")
        out[key] = action
    return out


@dataclasses.dataclass
class UrlRewrite:
    """One urlRewriteExpressions entry (src/options.ts:28, src/index.ts:311-318)."""

    pattern: re.Pattern
    replacement: str

    @classmethod
    def of(cls, pattern: str, replacement: str) -> "UrlRewrite":
        return cls(re.compile(pattern), replacement)


@dataclasses.dataclass
class CheckOptions:
    """Full conformance option surface (src/options.ts:13-40; SURVEY.md §2.9).

    ``paths`` are seed doc-ids/URLs into the documents corpus. Options
    that only make sense for a live network (port, proxy TLS agents) are
    accepted for API parity but inert against the mock/corpus transport.
    """

    paths: list[str] = dataclasses.field(default_factory=list)
    concurrency: int = 100  # per-fetch-actor async fan-out cap (src/index.ts:256-258)
    recurse: bool = False
    timeout: float = 0.0  # MILLISECONDS, 0 = no timeout (reference --timeout unit, src/cli.ts:118-119)
    markdown: bool = False
    links_to_skip: list[str] | Callable[[str], bool] = dataclasses.field(default_factory=list)
    server_root: str | None = None
    directory_listing: bool = False
    clean_urls: bool = False
    retry: bool = False  # honor 429 + Retry-After (src/index.ts:1019-1060)
    retry_errors: bool = False  # retry 5xx/0 with backoff (src/index.ts:1069-1109)
    retry_errors_count: int = 5  # src/index.ts:285
    retry_errors_jitter: float = 3.0  # seconds; src/index.ts:286 (3000 ms)
    url_rewrites: list[UrlRewrite] = dataclasses.field(default_factory=list)
    user_agent: str = "Mozilla/5.0 (compatible; linkinator-ray/0.1)"
    headers: dict[str, str] = dataclasses.field(default_factory=dict)
    redirects: RedirectsMode = RedirectsMode.ALLOW
    require_https: RequireHttpsMode = RequireHttpsMode.OFF
    allow_insecure_certs: bool = False
    proxy: str | None = None  # explicit HTTP(S) proxy URL; None → env https_proxy/HTTPS_PROXY/http_proxy/HTTP_PROXY (src/index.ts:17-62)
    check_css: bool = False
    check_fragments: bool = False
    fragments_to_skip: list[str] | Callable[[str], bool] = dataclasses.field(default_factory=list)
    status_codes: dict[str, str] = dataclasses.field(default_factory=dict)

    # --- engine knobs (no reference analogue; Ray-side physical tuning) ---
    execution: str = "auto"  # 'ray' | 'local' | 'auto' (auto: ray when a round is big)
    transport: str = "mock"  # 'mock' (corpus/http_map) | 'http' (real stdlib HTTP, loopback-tested)
    ray_threshold_rows: int = 4096  # auto switches to Ray Dataset stages at this round size
    fetch_concurrency: int = 8  # fetch actor-pool size
    seen_shards: int = 8  # URL-seen set shard count
    seen_filter: str = "exact"  # 'exact' | 'cuckoo' (cuckoo at 10^10-URL scale)
    batch_size: int = 4096  # rows per Arrow batch in map_batches stages
    pipelined: bool = False  # continuous-queue execution (no round barriers)
    mesh: bool = False  # actor-mesh frontier: dedup + routing in actors, driver only seeds/quiesces
    mesh_frontier_spill_rows: int = 0  # per-node frontier queue cap; past it the tail spills to parquet (0 = unbounded in-memory)
    max_rounds: int = 10_000  # BFS safety valve
    checkpoint_dir: str | None = None  # per-round frontier/seen/lineage checkpoints
    checkpoint_interval_s: float = 10.0  # mesh mode: seconds between epoch snapshots
    results_dir: str | None = None     # stream results out as parquet parts
    results_flush_rows: int = 1_000_000  # spill threshold (rows held in driver)
    politeness_delay: float = 0.0  # min seconds between fetches to one host (token bucket)
    respect_robots: bool = False  # consult the robots cache actor

    def __post_init__(self) -> None:
        if isinstance(self.redirects, str):
            self.redirects = RedirectsMode(self.redirects)
        if isinstance(self.require_https, str):
            self.require_https = RequireHttpsMode(self.require_https)
        self.status_codes = validate_status_codes(self.status_codes)
        rewrites = []
        for rw in self.url_rewrites:
            if isinstance(rw, UrlRewrite):
                rewrites.append(rw)
            elif isinstance(rw, (tuple, list)) and len(rw) == 2:
                rewrites.append(UrlRewrite.of(rw[0], rw[1]))
            elif isinstance(rw, dict):
                rewrites.append(UrlRewrite.of(rw["pattern"], rw["replacement"]))
            else:
                raise ValueError(f"invalid url rewrite: {rw!r}")
        self.url_rewrites = rewrites

    # --- skip predicates (src/index.ts:929-971) ---

    def compiled_skips(self) -> list[re.Pattern]:
        if callable(self.links_to_skip):
            return []
        return [re.compile(p) for p in self.links_to_skip]

    def compiled_fragment_skips(self) -> list[re.Pattern]:
        if callable(self.fragments_to_skip):
            return []
        return [re.compile(p) for p in self.fragments_to_skip]


def load_config(path: str) -> dict[str, Any]:
    """Load a config file. The reference supports .json/.js/.mjs/.cjs
    (src/config.ts:35-118); the Python-world equivalents here are JSON
    and TOML (stdlib tomllib) — the code-module flavors' job (computed
    config) is served by passing CheckOptions programmatically."""
    if path.endswith(".toml"):
        import tomllib
        with open(path, "rb") as f:
            return tomllib.load(f)
    with open(path) as f:
        return json.load(f)


def merge_config(flags: dict[str, Any], config: dict[str, Any]) -> dict[str, Any]:
    """CLI-over-config merge with undefined-stripping (src/config.ts:120-130):
    a flag explicitly set (non-None) wins over the config file value."""
    merged = dict(config)
    for key, value in flags.items():
        if value is not None:
            merged[key] = value
    return merged


def find_config(start_dir: str = ".") -> str | None:
    """Config file discovery (src/config.ts:38-61):
    linkinator.config.{json,toml} in the working directory, JSON first
    (mirroring the reference's flavor precedence order)."""
    for name in ("linkinator.config.json", "linkinator.config.toml"):
        candidate = os.path.join(start_dir, name)
        if os.path.exists(candidate):
            return candidate
    return None
