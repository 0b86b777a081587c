r"""robots.txt parser (Robots Exclusion Protocol, RFC 9309).

The reference has no robots handling at all (its politeness is the 8 s
timeout + failed-domain counter, crawler.go:503-518); the north rule
requires "per-host politeness tokens + robots.txt caching".
`operators/politeness.py` provides the cache + gate over PARSED rules;
this module is the missing front half — turning raw robots.txt bytes
into those rules. Pure functions, no network: the fetch stage calls
them inside its mapInPandas batch, one parse per (host, agent).

Implemented semantics (RFC 9309 + the de-facto wildcard extension):
- groups: one or more consecutive ``User-agent`` lines followed by
  rules; ALL groups matching the agent are merged (RFC 9309 §2.2.1);
- group selection: exact product-token match (case-insensitive) wins;
  otherwise the ``*`` groups apply; no match at all → allow everything;
- rule precedence: the matching rule with the LONGEST path pattern
  wins; on a length tie, ``Allow`` wins (RFC 9309 §2.2.2);
- patterns: literal path prefixes, ``*`` matches any char sequence,
  ``$`` anchors the end (``$`` only special as the last char);
- ``Crawl-delay``: not in the RFC but honored by most crawlers and by
  the politeness token budget; first valid value in the selected
  groups wins (seconds, int or float);
- ``Sitemap``: a non-group directive (sitemaps.org protocol) — valid
  anywhere in the file, applies regardless of agent; all occurrences
  are collected in file order (feeds `functions/sitemaps.py`);
- empty ``Disallow:`` = allow everything (classic 1994 idiom);
- unknown directives and comments (``#`` to end of line) are ignored;
  parsing is line-oriented and never throws on garbage (a crawler
  must survive arbitrary bytes here).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RobotsRules:
    """Parsed view for one (robots.txt, agent) pair."""

    # (pattern, is_allow), in file order; pattern '' never matches
    rules: tuple[tuple[str, bool], ...] = ()
    crawl_delay_ms: int | None = None
    matched_group: bool = False  # False → no group applied (allow all)
    # Sitemap: URLs, file order — non-group scope, agent-independent
    sitemaps: tuple[str, ...] = ()


def _match_len(pattern: str, path: str) -> int:
    """Length of `pattern` if it matches `path` per REP wildcard rules,
    else -1. Longer pattern = more specific (RFC 9309 §2.2.2 uses
    octet length of the matched pattern)."""
    if not pattern:
        return -1
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    rx = "^" + rx + ("$" if anchored else "")
    return len(pattern) if re.search(rx, path) else -1


def parse_robots(text: str, agent: str) -> RobotsRules:
    """Parse robots.txt `text` for product token `agent`."""
    agent_lc = agent.lower()
    # group assembly: (agents, rules, delays) triples
    groups: list[tuple[list[str], list[tuple[str, bool]], list[float]]] = []
    cur_agents: list[str] = []
    sitemap_urls: list[str] = []
    in_agent_run = False  # consecutive User-agent lines open a group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                cur_agents = []
                groups.append((cur_agents, [], []))
                in_agent_run = True
            cur_agents.append(val.lower())
            continue
        if key == "sitemap":
            # non-group directive: valid anywhere, even before any group
            if val:
                sitemap_urls.append(val)
            continue
        if key not in ("allow", "disallow", "crawl-delay"):
            # RFC 9309 §2.2.4: records outside the grammar MUST NOT
            # interfere — in particular an unknown line between two
            # User-agent lines must not split their group
            continue
        in_agent_run = False
        if not groups:
            continue  # rules before any User-agent line: ignored
        _, rules, delays = groups[-1]
        if key in ("allow", "disallow"):
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            if val:
                rules.append((val, key == "allow"))
        else:  # crawl-delay
            try:
                delays.append(float(val))
            except ValueError:
                pass

    def collect(want_exact: bool) -> RobotsRules | None:
        rules: list[tuple[str, bool]] = []
        delay: float | None = None
        hit = False
        for agents, grules, gdelays in groups:
            sel = (
                agent_lc in agents
                if want_exact
                else ("*" in agents and agent_lc not in agents)
            )
            if not sel:
                continue
            hit = True
            rules.extend(grules)
            if delay is None and gdelays:
                delay = gdelays[0]
        if not hit:
            return None
        return RobotsRules(
            rules=tuple(rules),
            crawl_delay_ms=None if delay is None else int(delay * 1000),
            matched_group=True,
            sitemaps=tuple(sitemap_urls),
        )

    return (
        collect(True)
        or collect(False)
        or RobotsRules(sitemaps=tuple(sitemap_urls))
    )


def is_allowed(rules: RobotsRules, path: str) -> bool:
    """Longest-match verdict for `path` (must start with '/')."""
    best_len, best_allow = -1, True
    for pattern, allow in rules.rules:
        m = _match_len(pattern, path)
        if m > best_len or (m == best_len and allow and not best_allow):
            if m >= 0:
                best_len, best_allow = m, allow
    return best_allow if best_len >= 0 else True


def disallow_prefixes_conservative(rules: RobotsRules) -> list[str]:
    """Adapter to the politeness cache's prefix-only schema
    (operators/politeness.py): keep Disallow rules only, truncating
    each pattern at its first '*' and stripping a trailing '$' —
    always over-blocking or exact, never under-blocking (the safe
    direction for a prefix cache; the fetch-stage recheck with
    is_allowed() restores exactness)."""
    out = []
    for pattern, allow in rules.rules:
        if allow:
            continue
        prefix = pattern.split("*", 1)[0].rstrip("$")
        # a leading-'*' pattern truncates to '' — conservative is
        # "could match anything on this host", i.e. the '/' prefix,
        # NOT dropping the rule (that would under-block)
        out.append(prefix or "/")
    return out
