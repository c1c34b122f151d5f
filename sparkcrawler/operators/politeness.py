"""Per-host politeness scheduler.

The reference reads ``crawl_delay`` but never enforces it
(reference simple_crawler/downloader.py:36-44 returns it; nothing
consumes) and self-throttles with a global 0.5s poll
(main.py:91). The north rule requires real enforcement: per crawl
round, a host with ``crawl_delay=d`` may be fetched at most
``floor(round_seconds / d)`` times; the overflow stays in the frontier
for the next round.

Skew design: a ``Window.partitionBy(host)`` puts a mega-host's entire
frontier in ONE task. We therefore only window the rows whose host has
a finite budget (hosts without a crawl_delay bypass the shuffle
entirely), and within the budgeted subset we pre-trim per salted
sub-partition first — each (host, salt) group keeps at most ``budget``
rows, an upper bound of the true winners — then run the exact per-host
window on the much smaller survivor set. The mega-host's rows never
all meet in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

def _order():
    """Deterministic admission order: BFS depth, then priority, then hash."""
    return [F.col("depth"), F.col("priority"), F.col("url_hash"), F.col("url")]


def politeness_decided(
    frontier: DataFrame,
    round_seconds: float = 60.0,
    salt_buckets: int = 16,
) -> DataFrame:
    """Tag each frontier row with ``_admitted`` under per-host budgets.

    ``frontier`` must already carry ``crawl_delay`` (from the robots
    gate). Hosts with NULL/0 delay have no budget — admitted without
    any shuffle. Returning ONE tagged DataFrame (instead of two plans)
    lets the caller persist it so the admitted and deferred branches
    share the window computation across the round's jobs.
    """
    cols = [c for c in frontier.columns]
    budget = F.floor(F.lit(round_seconds) / F.col("crawl_delay")).cast("int")
    has_budget = F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0)

    free = frontier.where(~has_budget).withColumn("_admitted", F.lit(True))
    budgeted = frontier.where(has_budget).withColumn(
        "_budget", F.greatest(budget, F.lit(1))
    )

    # phase 1: salted pre-trim — keep ≤ budget rows per (host, salt);
    # superset of the true per-host top-budget, but no single giant task.
    salted = Window.partitionBy(
        "host", F.pmod(F.col("url_hash"), F.lit(salt_buckets))
    ).orderBy(*_order())
    pre = budgeted.withColumn("_rs", F.row_number().over(salted))
    survivors = pre.where(F.col("_rs") <= F.col("_budget")).drop("_rs")
    pre_deferred = (
        pre.where(F.col("_rs") > F.col("_budget"))
        .select(*cols)
        .withColumn("_admitted", F.lit(False))
    )

    # phase 2: exact per-host rank on ≤ salt_buckets×budget rows per host.
    exact = Window.partitionBy("host").orderBy(*_order())
    ranked = (
        survivors.withColumn("_rn", F.row_number().over(exact))
        .withColumn("_admitted", F.col("_rn") <= F.col("_budget"))
        .select(*cols, "_admitted")
    )
    return free.unionByName(ranked).unionByName(pre_deferred)


def apply_politeness(
    frontier: DataFrame,
    round_seconds: float = 60.0,
    salt_buckets: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """(admitted, deferred) split view over :func:`politeness_decided`."""
    decided = politeness_decided(frontier, round_seconds, salt_buckets)
    return (
        decided.where(F.col("_admitted")).drop("_admitted"),
        decided.where(~F.col("_admitted")).drop("_admitted"),
    )
