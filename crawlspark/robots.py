"""robots.txt matcher — Google-REP semantics matching the reference's
external dependency (github.com/benjaminestes/robots/v2, used at
/root/reference/crawler/crawler.go:278-295 and state.go:46-64).

Behavioural contract reproduced here:
- ``locate(url)``: robots.txt URL for an address = scheme://host/robots.txt
  (per-authority scope).
- ``from_status(status, body)``:
  2xx  -> parse body;
  4xx  -> allow-all (REP: unavailable means unrestricted);
  5xx / fetch error / 3xx (redirect not followed by the reference's
  client) -> disallow-all (crawler.go:281-283 maps any failure to 503).
- group selection: the group whose user-agent token is the longest
  case-insensitive prefix of the crawler's RobotsUserAgent; '*' as
  fallback; no group -> allow-all.
- rule match on path+query: '*' wildcard, '$' end anchor, longest
  pattern wins, tie -> allow wins, no match -> allow.

Pure Python; the Spark engine evaluates it inside a pandas UDF with
the per-host rule table broadcast (SURVEY.md A10).
"""

from __future__ import annotations

import re

from . import canon

__all__ = ["locate", "parse_rules", "Matcher", "from_status", "DISALLOW_ALL", "ALLOW_ALL"]

ALLOW_ALL = "__allow_all__"
DISALLOW_ALL = "__disallow_all__"


def locate(url: str) -> str | None:
    """robots.txt URL governing ``url`` (scheme://host/robots.txt)."""
    u = canon.parse_url(url)
    if u is None or not u.host or not u.scheme:
        return None
    return f"{u.scheme}://{u.host}/robots.txt"


def parse_rules(body: str) -> list[tuple[str, int, str]]:
    """Parse robots.txt into (agent_token_lower, allow(1)/disallow(0),
    path_pattern) tuples. Group structure is flattened: each rule is
    tagged with every agent token of its group."""
    rules: list[tuple[str, int, str]] = []
    agents: list[str] = []
    last_was_agent = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent:
                agents = []
            agents.append(value.lower())
            last_was_agent = True
        elif field in ("allow", "disallow"):
            last_was_agent = False
            if not agents:
                continue
            for a in agents:
                rules.append((a, 1 if field == "allow" else 0, value))
        else:
            last_was_agent = False
    return rules


def _pattern_to_regex(pat: str) -> re.Pattern:
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    rx = ".*".join(re.escape(p) for p in pat.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


class Matcher:
    """Compiled allow/deny tester for one (robots_url, user-agent)."""

    def __init__(self, rules: list[tuple[str, int, str]] | str, robots_user_agent: str):
        if rules == ALLOW_ALL:
            self._rules = []
            return
        if rules == DISALLOW_ALL:
            self._rules = [(_pattern_to_regex("/"), 0, 1)]
            return
        ua = robots_user_agent.lower()
        # longest agent token that prefixes our UA; '*' fallback
        tokens = {a for a, _, _ in rules}
        best = None
        for t in tokens:
            if t != "*" and ua.startswith(t):
                if best is None or len(t) > len(best):
                    best = t
        if best is None and "*" in tokens:
            best = "*"
        self._rules = []
        if best is not None:
            for a, allow, pat in rules:
                if a == best and pat != "":
                    self._rules.append((_pattern_to_regex(pat), allow, len(pat)))

    def allowed(self, url: str) -> bool:
        u = canon.parse_url(url)
        if u is None:
            return True
        target = (u.raw_path or "/") + (("?" + u.raw_query) if u.raw_query else "")
        best_len = -1
        best_allow = True
        for rx, allow, plen in self._rules:
            if rx.match(target):
                # longest pattern wins; tie -> allow wins
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = bool(allow)
        return best_allow


def from_status(status_code: int | None, body: str | None) -> list | str:
    """Map a robots.txt fetch outcome to a rule set (see module doc)."""
    if status_code is None:
        return DISALLOW_ALL
    if 200 <= status_code < 300:
        return parse_rules(body or "")
    if 400 <= status_code < 500:
        return ALLOW_ALL
    return DISALLOW_ALL
