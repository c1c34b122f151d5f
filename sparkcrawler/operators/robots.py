"""robots.txt: content parser + gate as a broadcast-dimension join.

The reference fetches + Protego-parses robots.txt per URL and defaults
to ALLOW when the fetch fails (reference simple_crawler/downloader.py:24-44,
return True on exception). Here the parse runs ONCE per host over the
``http(s)://<host>/robots.txt`` rows of the corpus (an Arrow-batched
pandas UDF → :func:`robots_from_corpus`), producing the small dimension
table ``robots(host, disallow_prefixes, crawl_delay, request_rate,
sitemap_urls)`` that is broadcast to every executor; the allow decision
is a builtin higher-order-function prefix match — fully JVM-side, no
Python in the gate.

Parser semantics follow what the reference gets from Protego for the
``*`` user-agent (downloader.py:29-32 ``can_fetch(url, "*")``, :36-44
``crawl_delay("*")`` / ``request_rate("*")`` / ``sitemaps``):
RFC 9309 grouping (consecutive ``User-agent`` lines share one group,
blank lines do not end a group), ``#`` comments stripped,
case-insensitive field names, multiple ``*`` groups merged, empty
``Disallow:`` = allow-all, ``Sitemap:`` lines are file-global,
``Request-rate: a/b`` = a/b requests per second.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_ROBOTS_STRUCT = StructType(
    [
        StructField("disallow_prefixes", ArrayType(StringType())),
        StructField("crawl_delay", DoubleType()),
        StructField("request_rate", DoubleType()),
        StructField("sitemap_urls", ArrayType(StringType())),
    ]
)


def parse_robots_py(content) -> dict:
    """Parse one robots.txt body for the ``*`` user-agent."""
    out = {
        "disallow_prefixes": [], "crawl_delay": None,
        "request_rate": None, "sitemap_urls": [],
    }
    if content is None:
        return out
    if isinstance(content, (bytes, bytearray, memoryview)):
        content = bytes(content).decode("utf-8", errors="replace")
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
    return out


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

    The result matches ROBOTS_SCHEMA and is small (one row per host),
    so callers broadcast it exactly like a hand-built dim.
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
        F.col("p.crawl_delay").alias("crawl_delay"),
        F.col("p.request_rate").alias("request_rate"),
        F.col("p.sitemap_urls").alias("sitemap_urls"),
    )


def apply_robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Append ``allowed: boolean`` and ``crawl_delay: double``.

    - host missing from the dim → allowed (the reference's
      allow-on-error default, downloader.py:34): ``coalesce(..., true)``.
    - disallow check = any disallow prefix is a prefix of the URL path.
    """
    dim = robots.select("host", "disallow_prefixes", "crawl_delay")
    out = frontier.join(F.broadcast(dim), "host", "left")
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    disallowed = F.exists(
        F.col("disallow_prefixes"), lambda p: path.startswith(p)
    )
    return out.withColumn(
        "allowed", F.coalesce(~disallowed, F.lit(True))
    ).drop("disallow_prefixes")
