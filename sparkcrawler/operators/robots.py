"""robots.txt: content parser + gate as a broadcast-dimension join.

The reference fetches + Protego-parses robots.txt per URL and defaults
to ALLOW when the fetch fails (reference simple_crawler/downloader.py:24-44,
return True on exception). Here the parse runs ONCE per host over the
``http(s)://<host>/robots.txt`` rows of the corpus (an Arrow-batched
pandas UDF → :func:`robots_from_corpus`), producing the small dimension
table ``robots(host, disallow_prefixes, rules, crawl_delay,
request_rate, sitemap_urls)`` that is broadcast to every executor; the
allow decision is a builtin higher-order-function match — fully
JVM-side, no Python in the gate.

Parser semantics follow what the reference gets from Protego for the
``*`` user-agent (downloader.py:29-32 ``can_fetch(url, "*")``, :36-44
``crawl_delay("*")`` / ``request_rate("*")`` / ``sitemaps``):
RFC 9309 grouping (consecutive ``User-agent`` lines share one group,
blank lines do not end a group), ``#`` comments stripped,
case-insensitive field names, multiple ``*`` groups merged, empty
``Disallow:`` = allow-all, ``Sitemap:`` lines are file-global,
``Request-rate: a/b`` = a/b requests per second — and the full rule
semantics of §2.2.2: **Allow** directives, ``*`` wildcards and the
``$`` end anchor inside rule values, with longest-pattern-wins
precedence (Allow wins length ties). Rules are compiled to anchored
regexes at parse time (driver/dim-build side), so the per-URL gate
stays a JVM builtin filter over the broadcast dim.

Match target is ``path?query`` (Protego matches the URL's path plus
query string); a host absent from the dim or a URL matching no rule is
allowed — the reference's allow-on-error default.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_RULE_STRUCT = StructType(
    [
        StructField("regex", StringType()),
        StructField("allow", BooleanType()),
    ]
)

_ROBOTS_STRUCT = StructType(
    [
        StructField("disallow_prefixes", ArrayType(StringType())),
        StructField("rules", ArrayType(_RULE_STRUCT)),
        StructField("crawl_delay", DoubleType()),
        StructField("request_rate", DoubleType()),
        StructField("sitemap_urls", ArrayType(StringType())),
    ]
)


def rule_regex(pattern: str) -> str:
    """One robots path pattern → an anchored regex (RFC 9309 §2.2.2-3):
    ``*`` matches any char sequence, a trailing ``$`` anchors the end,
    everything else is literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored else "")


def parse_robots_py(content) -> dict:
    """Parse one robots.txt body for the ``*`` user-agent.

    ``rules`` is the ordered match list the gate consumes: every
    Allow/Disallow of the ``*`` group compiled to a regex and sorted by
    (pattern length DESC, allow DESC) — i.e. longest pattern wins, and
    Allow beats Disallow on equal length (Protego/Google precedence).
    ``disallow_prefixes`` keeps the raw Disallow values (back-compat
    with hand-built dims and simple-prefix consumers).
    """
    out = {
        "disallow_prefixes": [], "rules": [], "crawl_delay": None,
        "request_rate": None, "sitemap_urls": [],
    }
    if content is None:
        return out
    if isinstance(content, (bytes, bytearray, memoryview)):
        content = bytes(content).decode("utf-8", errors="replace")
    raw_rules: list[tuple[str, bool]] = []
    agents: list[str] = []
    last_was_agent = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue  # blank lines do not end a group (RFC 9309 §2.2)
        field, sep, value = line.partition(":")
        if not sep:
            continue
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            # consecutive UA lines share a group; a UA line after
            # directives starts a new group
            agents = agents + [value.lower()] if last_was_agent else [value.lower()]
            last_was_agent = True
            continue
        last_was_agent = False
        if field == "sitemap":  # file-global, any group
            if value:
                out["sitemap_urls"].append(value)
            continue
        if "*" not in agents:
            continue
        if field == "disallow":
            if value:  # empty Disallow: = allow all
                out["disallow_prefixes"].append(value)
                raw_rules.append((value, False))
        elif field == "allow":
            if value:  # empty Allow matches nothing
                raw_rules.append((value, True))
        elif field == "crawl-delay":
            try:
                out["crawl_delay"] = float(value)
            except ValueError:
                pass
        elif field == "request-rate":
            a, slash, b = value.partition("/")
            try:
                out["request_rate"] = (
                    float(a) / float(b) if slash else float(a)
                )
            except (ValueError, ZeroDivisionError):
                pass
    # longest pattern first; Allow outranks Disallow on ties
    raw_rules.sort(key=lambda r: (-len(r[0]), not r[1]))
    out["rules"] = [
        {"regex": rule_regex(p), "allow": a} for p, a in raw_rules
    ]
    return out


def can_fetch_py(parsed: dict, path_query: str) -> bool:
    """Driver-side twin of the JVM gate (first matching rule decides;
    no match = allow) — used by tests and the pure-Python oracle."""
    for r in parsed.get("rules", []):
        if re.match(r["regex"], path_query):
            return bool(r["allow"])
    return True


@F.pandas_udf(_ROBOTS_STRUCT)
def parse_robots_udf(html: pd.Series) -> pd.DataFrame:
    """Vectorized robots.txt parse (Arrow-batched, one Python call per
    batch of hosts — the dimension build is off the crawl hot path)."""
    return pd.DataFrame([parse_robots_py(h) for h in html])


def robots_from_corpus(pages: DataFrame) -> DataFrame:
    """Build the robots dimension from the corpus' own
    ``http(s)://<host>/robots.txt`` rows (reference downloader.py:24-27
    fetches exactly that URL per host). Hosts without a robots.txt row
    simply have no dim entry → the gate's allow-on-error default.

    The result matches ROBOTS_SCHEMA plus the compiled ``rules`` match
    list, and is small (one row per host), so callers broadcast it
    exactly like a hand-built dim.
    """
    robots_pages = pages.where(
        F.col("url").rlike(r"^https?://[^/]+/robots\.txt$")
    ).select(
        F.coalesce(F.parse_url(F.col("url"), F.lit("AUTHORITY")), F.lit("")).alias(
            "host"
        ),
        F.col("html"),
    )
    # one row per host: deterministic winner if duplicates exist
    robots_pages = robots_pages.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("host").orderBy("html")),
    ).where(F.col("_rn") == 1)
    return robots_pages.select(
        "host", parse_robots_udf(F.col("html")).alias("p")
    ).select(
        "host",
        F.col("p.disallow_prefixes").alias("disallow_prefixes"),
        F.col("p.rules").alias("rules"),
        F.col("p.crawl_delay").alias("crawl_delay"),
        F.col("p.request_rate").alias("request_rate"),
        F.col("p.sitemap_urls").alias("sitemap_urls"),
    )


def apply_robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Append ``allowed: boolean`` and ``crawl_delay: double``.

    - host missing from the dim → allowed (the reference's
      allow-on-error default, downloader.py:34): ``coalesce(..., true)``.
    - a dim with a compiled ``rules`` column (corpus-parsed) gets the
      full Protego semantics: the rules are pre-sorted longest-first
      with Allow outranking Disallow on ties, so the FIRST matching
      rule against ``path?query`` decides; no match → allow. All
      JVM-side: ``filter`` + ``regexp_like`` + ``get`` over the
      broadcast dim's array column.
    - a legacy prefix-only dim (hand-built, e.g. the synthetic
      corpus's) keeps the original any-prefix-disallows check.
    """
    has_rules = "rules" in robots.columns
    dim = robots.select(
        "host", "disallow_prefixes", "crawl_delay",
        *(["rules"] if has_rules else []),
    )
    out = frontier.join(F.broadcast(dim), "host", "left")
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    if has_rules:
        query = F.parse_url(F.col("url"), F.lit("QUERY"))
        target = F.concat(
            path,
            F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(
                F.lit("")
            ),
        )
        first_match = F.get(
            F.filter(
                F.col("rules"),
                lambda r: F.regexp_like(target, r.getField("regex")),
            ),
            0,
        )
        allowed = F.coalesce(first_match.getField("allow"), F.lit(True))
        return out.withColumn("allowed", allowed).drop(
            "disallow_prefixes", "rules"
        )
    disallowed = F.exists(
        F.col("disallow_prefixes"), lambda p: path.startswith(p)
    )
    return out.withColumn(
        "allowed", F.coalesce(~disallowed, F.lit(True))
    ).drop("disallow_prefixes")
