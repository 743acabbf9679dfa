"""robots.txt parsing + permission decisions (operators/robots.py):
the RFC 9309 subset — agent-group selection, longest-match rules,
Allow-wins-ties — plus fail-closed guards for out-of-subset patterns."""

from __future__ import annotations

import pytest

from duckdb_server_spark.operators.robots import is_allowed, parse_robots

POLICY = """
# crawler policy
User-agent: dss-bot
User-agent: dss-bot-images
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp/

User-agent: megabot
Disallow:

User-agent: *
Disallow: /
Crawl-delay: 10
Sitemap: https://x.example/sitemap.xml
"""


@pytest.fixture(scope="module")
def groups():
    return parse_robots(POLICY)


def test_group_structure(groups):
    assert groups[0]["agents"] == ["dss-bot", "dss-bot-images"]
    assert groups[1]["agents"] == ["megabot"]
    assert groups[2]["agents"] == ["*"]


@pytest.mark.parametrize(
    "agent, path, want",
    [
        ("dss-bot/1.0", "/doc/1", True),
        ("dss-bot/1.0", "/private/x", False),
        ("dss-bot/1.0", "/private/ok/y", True),   # longest match wins
        ("dss-bot/1.0", "/private/okno", False),  # prefix, not directory
        ("dss-bot/1.0", "/tmp/z", False),
        ("Mozilla dss-bot-images v2", "/private/a", False),
        ("megabot", "/anything", True),    # empty Disallow allows all
        ("randombot", "/doc/1", False),    # '*' fallback disallows all
        ("DSS-BOT", "/doc/1", True),       # case-insensitive agent
    ],
)
def test_decisions(groups, agent, path, want):
    assert is_allowed(groups, agent, path) is want


def test_most_specific_agent_group_wins():
    g = parse_robots(
        "User-agent: bot\nDisallow: /\n\n"
        "User-agent: bot-special\nAllow: /\n"
    )
    # 'bot-special' is the longer matching token for this agent name
    assert is_allowed(g, "bot-special/9", "/x") is True
    assert is_allowed(g, "bot/1", "/x") is False


def test_no_matching_group_allows():
    g = parse_robots("User-agent: onlyme\nDisallow: /\n")
    assert is_allowed(g, "someone-else", "/x") is True


@pytest.mark.parametrize(
    "text, msg",
    [
        ("User-agent: a\nDisallow: /x*\n", "subset"),
        ("User-agent: a\nAllow: /y$\n", "subset"),
        ("Disallow: /x\n", "before any User-agent"),
        ("# only comments\n", "no User-agent"),
        ("User-agent:\nDisallow: /\n", "empty User-agent"),
    ],
)
def test_fail_closed(text, msg):
    with pytest.raises(ValueError, match=msg):
        parse_robots(text)


def test_allow_wins_length_ties():
    g = parse_robots(
        "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    )
    assert is_allowed(g, "any", "/a/x") is True
