"""robots.txt compliance filtering for crawl-curation pipelines.

Every responsible crawl pipeline filters fetched URLs against the
site's robots.txt before the corpus sees them (reference parity: none —
this is beyond-reference crawl plumbing, same family as the WARC/PSL
work). Implements the RFC 9309 (Robots Exclusion Protocol) semantics:

- group selection: the group whose ``User-agent`` line is the LONGEST
  match for the product token wins; ``*`` groups apply only when no
  specific group matched; multiple adjacent user-agent lines share one
  group.
- rule matching: among the selected group's ``Allow``/``Disallow``
  rules, the rule with the LONGEST matched pattern wins; on a
  length tie ``Allow`` wins; no matching rule (or an empty Disallow
  value) means allowed. ``*`` in a pattern matches any character run;
  ``$`` anchors the pattern end. Percent-encoding is compared verbatim
  (both sides are expected normalized — pair with
  :func:`pandas_plus_spark.functions.urls.url_normalize`).

Scale shape: robots bodies live at DOMAIN grain (tiny relative to the
URL table). :func:`filter_robots` parses each body ONCE per domain into
a rule list, broadcast-joins it to the URL frame on the registrable
host, and evaluates the longest-match rule per URL inside one
Arrow-batched ``mapInPandas`` — map-side only after the one (broadcast)
join, no per-row Python UDF, URLs never shuffled. Pattern matching
compiles each domain's rules once per batch, not per row.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ua_token(val: str) -> str:
    """Product token of a ``User-agent:`` line value: the leading
    ``[a-zA-Z0-9_-]`` run, lowercased — ``FooBot/1.2`` -> ``foobot``
    (RFC 9309 §2.2.1: crawlers match their product token against the
    line value, ignoring any trailing version)."""
    m = re.match(r"[a-zA-Z0-9_-]+", val)
    return m.group(0).lower() if m else ""


def parse_robots_rules(body: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Parse a robots.txt body into the rule list RFC 9309 selects for
    ``agent``: ``[(allow?, pattern), ...]``. A group matches when its
    ``User-agent`` line's PRODUCT TOKEN (leading alnum/-/_ run, so
    ``FooBot/1.2`` matches agent ``foobot``) equals the agent
    case-insensitively; rules from ALL matching groups are combined
    (§2.2.1: "the matching groups' rules MUST be combined"); the ``*``
    groups (also combined) apply only when no named group matched;
    adjacent ``User-agent`` lines share a group; unknown directives and
    comments are skipped. Returns ``[]`` when nothing applies (allowed).
    """
    if body is None:
        return []
    agent = _ua_token(agent) or agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agents = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:                    # new group starts
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if cur_agents:                       # rules before any UA
                cur_rules.append((key == "allow", val))
        else:
            in_agents = False                    # crawl-delay, sitemap…
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    named_rules: list[tuple[bool, str]] = []
    named_hit = False
    star_rules: list[tuple[bool, str]] = []
    star_hit = False
    for agents, rules in groups:
        if agent in {_ua_token(ua) for ua in agents}:
            named_hit = True                     # combine ALL matches
            named_rules.extend(rules)
        if any(ua.strip() == "*" for ua in agents):
            star_hit = True
            star_rules.extend(rules)
    if named_hit:                                # a matched-but-empty
        return named_rules                       # group = unrestricted
    return star_rules if star_hit else []


def _pattern_regex(pattern: str) -> re.Pattern:
    """RFC 9309 pattern -> anchored regex: ``*`` = any run, trailing
    ``$`` = end anchor, everything else literal, match from path start."""
    anchor = pattern.endswith("$")
    if anchor:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchor else ""))


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-match evaluation (RFC 9309 §2.2.2): the longest matched
    pattern decides; a tie prefers Allow; no match or an empty pattern
    means allowed."""
    best = (-1, True)
    for allow, pattern in rules:
        if pattern == "":
            continue                             # 'Disallow:' = allow all
        if _pattern_regex(pattern).match(path):
            key = (len(pattern), allow)
            if key[0] > best[0] or (key[0] == best[0] and allow):
                best = key
    return best[1]


ROBOTS_FLAG_SCHEMA = T.StructType([
    T.StructField("robots_allowed", T.BooleanType()),
])


def url_path(url) -> Column:
    """Path + query of a URL (the robots matching subject): strip the
    scheme://host prefix; empty path becomes ``/``."""
    u = F.col(url) if isinstance(url, str) else url
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    return F.when(rest == "", F.lit("/")).otherwise(rest)


def filter_robots(
    urls: DataFrame,
    robots: DataFrame,
    *,
    url_col: str = "url",
    host_col: str = "host",
    robots_host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str = "*",
    keep_disallowed: bool = False,
) -> DataFrame:
    """Flag (or drop) URLs a site's robots.txt disallows for ``agent``.

    ``urls``: frame with ``url_col`` and ``host_col``; ``robots``: one
    row per host with the robots.txt body (NULL/missing host = fully
    allowed, the RFC default for unavailable robots). Returns the URL
    frame plus ``robots_allowed``; with ``keep_disallowed=False`` only
    allowed rows survive (flag retained for lineage).

    Scale: robots is domain-grain — broadcast it; the join output flows
    straight into one Arrow-batched ``mapInPandas`` that parses each
    DISTINCT body once per batch (memoized) and longest-matches each
    URL's path. No shuffle of the URL table beyond the broadcast join.
    """
    joined = urls.join(
        F.broadcast(robots.select(
            F.col(robots_host_col).alias(host_col),
            F.col(body_col).alias("__robots"))),
        host_col, "left")
    out_schema = T.StructType(
        list(joined.drop("__robots").schema.fields)
        + list(ROBOTS_FLAG_SCHEMA.fields))
    cols = [f.name for f in joined.drop("__robots").schema.fields]

    def flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            rules_for = []
            for body in pdf["__robots"]:
                if body is None:
                    rules_for.append(None)
                    continue
                got = memo.get(body)
                if got is None:
                    got = [(a, p, _pattern_regex(p))
                           for a, p in parse_robots_rules(body, agent)
                           if p != ""]
                    memo[body] = got
                rules_for.append(got)
            allowed = []
            for url, rules in zip(pdf[url_col], rules_for):
                if not rules:
                    allowed.append(True)
                    continue
                path = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "",
                              str(url)) or "/"
                best = (-1, True)
                for a, p, rx in rules:
                    if rx.match(path):
                        if len(p) > best[0] or (len(p) == best[0] and a):
                            best = (len(p), a)
                allowed.append(best[1])
            out = pdf[cols].copy()
            out["robots_allowed"] = pd.Series(allowed, dtype="boolean")
            yield out

    flagged = joined.mapInPandas(flag, schema=out_schema)
    if keep_disallowed:
        return flagged
    return flagged.where(F.col("robots_allowed"))
