"""robots.txt cache — the politeness companion the north_rule requires.

The reference has no robots support; this is a new capability: per-host
``robots.txt`` documents in the corpus are parsed once into compiled
prefix rules and consulted before any fetch. On a cluster the compiled
table is broadcast (ray.put) and each fetch actor holds it — a cache
actor only becomes necessary when rules are fetched live and mutate
mid-crawl, which the corpus model doesn't need.

Supported subset: ``User-agent: *`` groups, ``Disallow:`` path
prefixes, ``Allow:`` exceptions with longest-match-wins (the de facto
Google semantics for prefix rules).
"""

from __future__ import annotations

from urllib.parse import urlsplit


def parse_robots(text: str) -> list[tuple[str, bool]]:
    """→ list of (path_prefix, allowed) rules for User-agent: * groups."""
    rules: list[tuple[str, bool]] = []
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif applies and field in ("disallow", "allow"):
            if value:
                rules.append((value, field == "allow"))
            elif field == "disallow":
                pass  # empty Disallow = allow all (no rule)
    return rules


class RobotsCache:
    """host → compiled rules; ``allowed(url)`` is the politeness gate."""

    def __init__(self, rules_by_host: dict[str, list[tuple[str, bool]]] | None = None):
        self._rules = {h: sorted(r, key=lambda t: -len(t[0]))
                       for h, r in (rules_by_host or {}).items()}

    @classmethod
    def from_corpus(cls, corpus, multi_host: bool) -> "RobotsCache":
        """Collect `robots.txt` docs: '{host}/robots.txt' in multi-host
        corpora, plain 'robots.txt' otherwise."""
        rules: dict[str, list] = {}
        for doc_id in corpus.doc_ids():
            if multi_host:
                if not doc_id.endswith("/robots.txt") or doc_id.count("/") != 1:
                    continue
                host = doc_id.split("/", 1)[0]
            else:
                if doc_id != "robots.txt":
                    continue
                host = corpus.host
            text = "".join(
                (s.get("text") or "") for s in corpus.spans_of(doc_id))
            parsed = parse_robots(text)
            if parsed:
                rules[host] = parsed
        return cls(rules)

    def has_rules(self) -> bool:
        return bool(self._rules)

    def allowed(self, url: str) -> bool:
        parts = urlsplit(url)
        rules = self._rules.get((parts.hostname or "").lower())
        if not rules:
            return True
        path = parts.path or "/"
        if path == "/robots.txt":
            return True
        for prefix, allow in rules:  # longest prefix first
            if path.startswith(prefix):
                return allow
        return True

    def to_blob(self) -> dict:
        return dict(self._rules)

    @classmethod
    def from_blob(cls, blob: dict) -> "RobotsCache":
        return cls(blob)
