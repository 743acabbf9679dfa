"""robots.txt parsing + crawl-permission filtering — the compliance
gate every crawler applies before a URL enters the corpus (RFC 9309,
the Robots Exclusion Protocol). Subset implemented (documented):

* ``User-agent`` groups (consecutive agent lines share one group),
  case-insensitive agent match, ``*`` fallback; the MOST SPECIFIC
  matching group wins (longest agent token);
* ``Allow`` / ``Disallow`` path-prefix rules; decision = the
  LONGEST-match rule across the winning group (Allow wins ties, the
  RFC's rule); an empty Disallow value allows everything;
* comments (#) and blank lines; unknown directives ignored
  (Crawl-delay, Sitemap — per spec they do not affect permissions);
* ``*`` wildcards and ``$`` anchors inside path patterns FAIL CLOSED —
  out of the subset, never silently treated as literals.

Reference scope: beyond-reference capability (the reference moves
bytes, main.go:199). Scale shape: the rule set is tiny and parses once
per task (broadcast-sized); the per-URL decision is a pure function —
embarrassingly parallel inside mapInPandas.
"""

from __future__ import annotations


def parse_robots(text: str) -> list[dict]:
    """robots.txt → [{agents: [lowercased], rules: [(allow?, path)]}]
    in file order."""
    groups: list[dict] = []
    current: dict | None = None
    agents_open = False  # consecutive User-agent lines accumulate
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not value:
                raise ValueError("robots: empty User-agent value")
            if current is None or not agents_open:
                current = {"agents": [], "rules": []}
                groups.append(current)
                agents_open = True
            current["agents"].append(value.lower())
        elif key in ("allow", "disallow"):
            if current is None:
                raise ValueError("robots: rule before any User-agent")
            agents_open = False
            if "*" in value or "$" in value:
                raise ValueError(
                    "robots: path wildcards/anchors are out of the "
                    "implemented subset"
                )
            current["rules"].append((key == "allow", value))
        else:
            agents_open = False  # unknown directive closes the agent run
    if not groups:
        raise ValueError("robots: no User-agent groups")
    return groups


def _matching_group(groups: list[dict], agent: str) -> dict | None:
    """The most specific group for ``agent``: longest agent token that
    is a substring of the agent name; '*' as the fallback."""
    agent = agent.lower()
    best, best_len = None, -1
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                if best is None and best_len < 0:
                    best = best if best_len > 0 else g
                    # '*' only wins when nothing specific matched
                continue
            if a in agent and len(a) > best_len:
                best, best_len = g, len(a)
    if best_len >= 0 and best is not None:
        return best
    for g in groups:
        if "*" in g["agents"]:
            return g
    return None


def is_allowed(groups: list[dict], agent: str, path: str) -> bool:
    """RFC 9309 decision: longest-match rule in the winning group;
    Allow wins length ties; no matching rule (or no group) = allowed."""
    g = _matching_group(groups, agent)
    if g is None:
        return True
    verdict, best_len = True, -1
    for allow, prefix in g["rules"]:
        if prefix == "" and not allow:
            continue  # empty Disallow: allows everything (no match)
        if path.startswith(prefix):
            if len(prefix) > best_len or (
                len(prefix) == best_len and allow
            ):
                verdict, best_len = allow, len(prefix)
    return verdict
