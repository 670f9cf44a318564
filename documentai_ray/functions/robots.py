"""robots.txt parsing and path matching (RFC 9309) — the crawl-side
compliance gate that runs BEFORE fetch/extract cost is spent on a URL.

Reference parity note: the reference repo has no crawler (its inputs
arrive via HTTP multipart), so this operator comes from the web-scale
extension surface: a Common-Crawl-style pipeline must honor per-host
robots policies when (re)constructing fetch frontiers. The page-level
``<meta name=robots>`` scan (stages/extract.py::robots_filter_batch)
covers the *document* side; this module covers the *host* side.

Semantics implemented (RFC 9309 + the de-facto Google rules):

- Groups: consecutive ``User-agent:`` lines open a group; the rules that
  follow belong to ALL of those agents. We select the union of rules
  from every group naming the requested agent (exact, case-insensitive)
  and fall back to the ``*`` groups when none match.
- Matching: a rule pattern matches the path as a prefix; ``*`` matches
  any substring, a trailing ``$`` anchors the end. The rule with the
  LONGEST pattern (octet length, wildcards counted) wins; on a tie the
  ``Allow`` rule wins. No matching rule → allowed. Empty pattern
  (``Disallow:``) matches nothing.
- Lines are ``key: value`` with ``#`` comments; unknown keys (Sitemap,
  Crawl-delay, ...) are ignored; keys are case-insensitive; BOM and
  surrounding whitespace stripped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["RobotsPolicy", "parse_robots_txt", "is_allowed"]


@dataclass(frozen=True)
class _Rule:
    allow: bool
    pattern: str
    # precompiled matcher: None → plain prefix (the overwhelmingly common
    # case, matched vectorizably by callers); else a compiled regex
    rx: "re.Pattern | None"

    def matches(self, path: str) -> bool:
        if self.rx is None:
            return path.startswith(self.pattern)
        return self.rx.match(path) is not None


def _compile_rule(allow: bool, pattern: str) -> "_Rule | None":
    if pattern == "":
        return None                       # "Disallow:" matches nothing
    if "*" not in pattern and not pattern.endswith("$"):
        return _Rule(allow, pattern, None)
    body = pattern[:-1] if pattern.endswith("$") else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = ".*".join(parts) + ("$" if pattern.endswith("$") else "")
    return _Rule(allow, pattern, re.compile(rx))


class RobotsPolicy:
    """Compiled rule set for one (host, agent) pair. ``prefix_rules``
    exposes the plain-prefix subset as (allow, pattern, length) tuples so
    batch stages can vectorize the common case with str.startswith.
    ``crawl_delay`` is the group's ``Crawl-delay`` in seconds (None when
    unspecified) — the de-facto extension most crawlers honor."""

    def __init__(self, rules: list[_Rule], crawl_delay: "float | None" = None):
        # pre-sort by (pattern length desc, allow desc): the FIRST match
        # in this order is the longest-match / tie-goes-to-allow winner
        self.rules = sorted(rules, key=lambda r: (-len(r.pattern), not r.allow))
        self.crawl_delay = crawl_delay

    def allowed(self, path: str) -> bool:
        for r in self.rules:
            if r.matches(path):
                return r.allow
        return True

    @property
    def all_plain_prefix(self) -> bool:
        return all(r.rx is None for r in self.rules)


def parse_robots_txt(text: str, agent: str = "*") -> RobotsPolicy:
    """Parse robots.txt content and compile the rule set governing
    ``agent`` (union of its groups; ``*`` groups only as fallback)."""
    agent = agent.lower()
    exact_rules: list[_Rule] = []
    star_rules: list[_Rule] = []
    exact_delay: "float | None" = None
    star_delay: "float | None" = None
    cur_agents: list[str] = []
    in_group_header = True   # consecutive User-agent lines accumulate

    for raw in (text or "").replace("﻿", "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                cur_agents = []
                in_group_header = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_header = False
            rule = _compile_rule(key == "allow", val)
            if rule is None:
                continue
            if agent in cur_agents and agent != "*":
                exact_rules.append(rule)
            if "*" in cur_agents:
                star_rules.append(rule)
        elif key == "crawl-delay":
            in_group_header = False
            try:
                d = float(val)
            except ValueError:
                continue
            if agent in cur_agents and agent != "*":
                exact_delay = d
            if "*" in cur_agents:
                star_delay = d
        else:
            # Sitemap/unknown: ends the UA header run but does not end
            # the group's rule scope
            in_group_header = False

    if exact_rules or exact_delay is not None:
        return RobotsPolicy(exact_rules, exact_delay)
    return RobotsPolicy(star_rules, star_delay)


def is_allowed(robots_text: str, path: str, agent: str = "*") -> bool:
    """One-shot convenience: parse + match."""
    return parse_robots_txt(robots_text, agent).allowed(path)
