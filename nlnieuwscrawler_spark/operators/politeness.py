"""O8+O9+O10: per-host priority ranking + politeness budgets + skew salting.

Reference behavior (north_star "per-host priority queue enforcing ...
per-domain politeness delays"): the reference loops one site at a time and
``time.sleep(crawl_delay)``s between fetches. The discrete-epoch mapping
(pinned in :mod:`nlnieuwscrawler_spark.spec`): an epoch is EPOCH_SECONDS of
wall time; each host gets ``budget = floor(EPOCH_SECONDS / crawl_delay)``
fetch slots at offsets ``(rank-1) * crawl_delay`` — order-isomorphic to the
reference's sleep loop under the same budget, and (unlike sleep) expressible
as a deterministic window computation.

Scale note (the SURVEY §7.3.5 hard part): ``Window.partitionBy(host)``
puts ALL of nu.nl in one task — at 10^10 URLs with Zipf hosts that task
OOMs. ``ranked_with_budget`` therefore uses a TWO-PHASE salted rank when
``salt > 1``: phase 1 ranks within (host, pmod(url_fp, salt)) partitions and
prunes each to the host budget (a candidate ranked > budget within its salt
can never make the global top-budget — safe prune); phase 2 re-ranks the
≤ salt×budget survivors per host exactly. Same result, bounded task size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nlnieuwscrawler_spark import spec

#: total-order tie-break: higher priority first, earlier discovery first,
#: then fingerprint — crawl order must be deterministic across parallelism.
def _order_cols():
    return [
        F.col("priority").desc(),
        F.col("discovered_epoch").asc(),
        F.col("url_fp").asc(),
    ]


def with_budget(
    df: DataFrame,
    delay_col: str = "crawl_delay",
    epoch_seconds: float | None = None,
) -> DataFrame:
    """budget = floor(epoch_seconds / coalesce(delay, DEFAULT)), ≥ 1."""
    es = spec.EPOCH_SECONDS if epoch_seconds is None else epoch_seconds
    d = F.coalesce(F.col(delay_col), F.lit(spec.DEFAULT_CRAWL_DELAY))
    d = F.when(d <= 0, F.lit(spec.DEFAULT_CRAWL_DELAY)).otherwise(d)
    budget = F.greatest(F.floor(F.lit(es) / d).cast("int"), F.lit(1))
    return df.withColumn("crawl_delay_eff", d).withColumn("host_budget", budget)


def ranked_with_budget(df: DataFrame, salt: int = 1) -> DataFrame:
    """Add per-host ``host_rank`` (1-based, total order) and keep rank ≤ budget.

    Also emits ``sched_offset`` = (host_rank-1) × crawl_delay_eff, the
    within-epoch fetch time offset that politeness guarantees are stated in.
    """
    if salt > 1:
        presel = (
            df.repartition("host", F.pmod(F.col("url_fp"), F.lit(salt)))
            .withColumn(
                "__salt_rank",
                F.row_number().over(
                    Window.partitionBy(
                        "host", F.pmod(F.col("url_fp"), F.lit(salt))
                    ).orderBy(*_order_cols())
                ),
            )
            .filter(F.col("__salt_rank") <= F.col("host_budget"))
            .drop("__salt_rank")
        )
    else:
        presel = df
    ranked = presel.withColumn(
        "host_rank",
        F.row_number().over(Window.partitionBy("host").orderBy(*_order_cols())),
    )
    return ranked.filter(F.col("host_rank") <= F.col("host_budget")).withColumn(
        "sched_offset",
        (F.col("host_rank") - 1).cast("double") * F.col("crawl_delay_eff"),
    )


def epoch_schedule(
    candidates: DataFrame,
    epoch: int,
    salt: int = 1,
    epoch_seconds: float | None = None,
) -> DataFrame:
    """Full politeness gate for one epoch: budget + salted rank + offsets.

    Input: robots-filtered candidates with (host, priority, discovered_epoch,
    url_fp, crawl_delay). Output adds host_budget, host_rank, sched_offset,
    and ``fetch_ts_offset`` = epoch*epoch_seconds + sched_offset.
    """
    es = spec.EPOCH_SECONDS if epoch_seconds is None else epoch_seconds
    out = ranked_with_budget(with_budget(candidates, epoch_seconds=es), salt=salt)
    return out.withColumn(
        "fetch_ts_offset", F.lit(float(epoch) * es) + F.col("sched_offset")
    )
