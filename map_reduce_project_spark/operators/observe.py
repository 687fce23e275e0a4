"""Single-pass pipeline metrics via ``DataFrame.observe``.

At 100 TB you cannot afford a second scan to answer "how many rows
did this stage drop / how many nulls came through" — ``observe``
attaches accumulator-style metric expressions to a plan node and
collects them as a side effect of the action you were already
running. Unlike raw Spark accumulators, observed metrics are
exactly-once per completed action (no task-retry double counting —
the same reason the CCF loop counts convergence with an agg,
SURVEY §4.3).

Caveat (measured, round 1): ``observe`` composes with normal actions
and writes, but NOT with ``localCheckpoint`` — checkpointing swaps
the plan for a LogicalRDD and the CollectMetrics node never fires.
Keep observations on the un-checkpointed output side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame,
    check_cols: list[str],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``.

    Returns (df_with_observation, observation). After ANY action on
    the returned DataFrame, ``observation.get`` yields
    ``{"n_rows": ..., "nulls_<col>": ...}`` without a second scan.
    """
    obs = Observation(name)
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in check_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs


def observed_filter(
    df: DataFrame, condition: Column, name: str = "filter"
) -> tuple[DataFrame, Observation, Observation]:
    """Filter with before/after row counts observed in the same pass.

    Returns (filtered_df, obs_before, obs_after); selectivity =
    after.n_rows / before.n_rows once an action has run.
    """
    before = Observation(f"{name}_before")
    after = Observation(f"{name}_after")
    observed = df.observe(before, F.count(F.lit(1)).alias("n_rows"))
    filtered = observed.where(condition).observe(
        after, F.count(F.lit(1)).alias("n_rows")
    )
    return filtered, before, after
