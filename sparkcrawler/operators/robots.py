"""robots.txt gate as a broadcast-dimension join.

The reference fetches + Protego-parses robots.txt per URL and defaults
to ALLOW when the fetch fails (reference simple_crawler/downloader.py:24-34,
return True on exception). Here robots rules are a small dimension table
``robots(host, disallow_prefixes, crawl_delay, ...)`` broadcast to every
executor; the allow decision is a builtin higher-order-function prefix
match — fully JVM-side, no Python in the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
