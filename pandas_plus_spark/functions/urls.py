"""URL / domain utilities for crawl curation.

Beyond the reference (no string tooling, SURVEY §2.11) — the column
functions a WARC-fed training pipeline runs between ingest and the
per-source guards (``sampling.cap_per_key``, ``source_cap``,
``temperature_mixture``): extract the host, normalize the URL for exact
URL-dedup, and reduce hosts to a REGISTRABLE DOMAIN so caps and mixing
operate per site, not per subdomain.

All pure Column expressions (``parse_url`` is a JVM built-in; the rest is
string arithmetic) — zero Python in the hot path, and every function has
deterministic semantics an independent SQL engine can reproduce, so the
gates value-check end to end.

``registrable_domain`` note: the exact answer needs the Public Suffix
List (a ~10k-rule dataset, updated continuously — ship it as a broadcast
lookup table in a real deployment, same join shape). The dependency-free
heuristic here covers the dominant patterns: last TWO labels, or last
THREE when the second-to-last label is a well-known multi-part suffix
second level (``co``, ``com``, ``org``, ``net``, ``gov``, ``ac``,
``edu`` — co.uk, com.au, gov.br, …). IP hosts pass through whole.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# second-to-last labels that signal a multi-part public suffix (co.uk,
# com.au, ...) — the PSL's dominant families, embedded so the heuristic
# is dependency-free and ANSI-reproducible
MULTIPART_SECOND_LEVELS = ("co", "com", "org", "net", "gov", "ac", "edu")


def url_host(url) -> Column:
    """Lower-cased host of a URL (port stripped), NULL for unparseable
    input. JVM ``try_parse_url`` — no Python, no regex backtracking;
    invalid URLs yield NULL instead of throwing (Spark 4 ANSI contract)."""
    host = F.try_parse_url(F.col(url) if isinstance(url, str) else url,
                       F.lit("HOST"))
    return F.lower(host)


def url_normalize(url) -> Column:
    """Canonical form for exact URL-dedup: lower-case scheme and host,
    default ports stripped, fragment dropped, trailing slash on a bare
    path removed. Query strings are KEPT verbatim (reordering parameters
    changes semantics on plenty of real sites — curation dedups
    conservatively).
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = url_host(u)
    # parse_url has no PORT part (Hive part list: HOST/PATH/QUERY/REF/
    # PROTOCOL/FILE/AUTHORITY/USERINFO) — take it off the AUTHORITY
    port = F.nullif(
        F.regexp_extract(F.try_parse_url(u, F.lit("AUTHORITY")),
                         r":(\d+)$", 1), F.lit(""))
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443"))
    port_part = F.when(port.isNull() | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.try_parse_url(u, F.lit("QUERY"))
    query_part = F.when(query.isNull(), F.lit("")).otherwise(
        F.concat(F.lit("?"), query))
    return F.when(
        host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part))


def registrable_domain(host) -> Column:
    """Registrable domain of a (already lower-cased) host column — the
    PSL heuristic documented in the module docstring. NULL host → NULL;
    single-label hosts and IPv4 literals pass through unchanged."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    second_last = F.element_at(labels, -2)
    multi = F.lit(False)
    for s in MULTIPART_SECOND_LEVELS:
        multi = multi | (second_last == s)
    take = F.when(multi & (n >= 3), F.lit(3)).otherwise(F.lit(2))
    tail = F.slice(labels, n - take + 1, take)
    return F.when(h.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(is_ip | (n <= 2), h)
        .otherwise(F.concat_ws(".", tail)))
