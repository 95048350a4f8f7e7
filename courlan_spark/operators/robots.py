"""robots.txt rule tables for crawl filtering and scheduling.

The reference stores one RobotFileParser per host
(/root/reference/courlan/urlstore.py:509-530) and consults it in
filter_links (core.py:257-259).  The distributed form is two small
tables derived from raw robots.txt bodies:

    rules(host, rules array<struct<prefix,allow>>)  -> broadcast into
        crawlable_links (host equi-join + first-match verdict)
    crawl_delays(host, crawl_delay)  -> broadcast into download_schedule

Rule semantics mirror urllib.robotparser.RobotFileParser for the
wildcard agent: Allow and Disallow lines are kept in file order and
the FIRST rule whose prefix matches the path decides; no match means
allowed; a bare ``Disallow:`` becomes an allow-everything rule
(RuleLine('', False) flips to allowance=True in the stdlib).  The one
simplification vs the stdlib is prefix matching on raw strings
(no percent re-quoting of exotic paths).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots_body(body: str) -> tuple[list[tuple[str, bool]], float | None]:
    """(ordered rules [(prefix, allow)], crawl delay) for the wildcard
    agent.  Mirrors RobotFileParser's grouping (rules apply to the
    last seen 'User-agent: *' group) and rule order (first match
    wins in can_fetch)."""
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    current_agents: list[str] = []
    last_was_agent = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value)
            last_was_agent = True
            continue
        last_was_agent = False
        if "*" not in current_agents:
            continue
        if key == "disallow":
            if value:
                rules.append((value, False))
            else:
                # stdlib: empty Disallow flips to allow-everything
                rules.append(("", True))
        elif key == "allow":
            rules.append((value, True))
        elif key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return rules, delay


def can_fetch(rules: list[tuple[str, bool]], path: str) -> bool:
    "First-match verdict over ordered rules; no match = allowed."
    for prefix, allow in rules:
        if path.startswith(prefix):
            return allow
    return True


def robots_tables(robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """robots(host string, body string) ->
    (rules(host, rules array<struct<prefix,allow>>),
     crawl_delays(host, crawl_delay)).

    Hosts whose rule list is empty are omitted from the rules table
    (everything allowed — the join in crawlable_links is left-style)."""

    def parse(iterator):
        for pdf in iterator:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                parsed, delay = parse_robots_body(
                    body if isinstance(body, str) else ""
                )
                rows.append(
                    {
                        "host": host,
                        "rules": [
                            {"prefix": p, "allow": a} for p, a in parsed
                        ],
                        "crawl_delay": delay,
                    }
                )
            yield pd.DataFrame(rows, columns=["host", "rules", "crawl_delay"])

    # one row per host BEFORE parsing: duplicate host rows in the
    # input (re-fetches of the same robots.txt) would otherwise fan
    # out every link row per duplicate in crawlable_links' host
    # equi-join, and deduping pre-parse also parses each host's body
    # once instead of once per fetch.  The survivor is deterministic
    # AND rule-preserving: max over (looks_like_rules, body) — a
    # re-fetch that returned an error page (no directive lines) can
    # never out-rank a body that parses to real rules, which a plain
    # max(body) allowed, silently making the host fully crawlable
    # (round-4/5 ADVICE fix).  Ties among rule-bearing bodies fall
    # back to lexicographic max, the old deterministic contract.
    has_rules = F.col("body").rlike(r"(?im)^\s*(dis)?allow\s*:")
    robots = robots.groupBy("host").agg(
        F.max(F.struct(has_rules.alias("has_rules"), F.col("body"))).getField(
            "body"
        ).alias("body")
    )
    parsed = robots.mapInPandas(
        parse,
        schema="host string, rules array<struct<prefix:string,allow:boolean>>, "
        "crawl_delay double",
    )
    rules = parsed.where(F.size("rules") > 0).select("host", "rules")
    delays = parsed.where("crawl_delay IS NOT NULL").select("host", "crawl_delay")
    return rules, delays
