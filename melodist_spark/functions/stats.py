"""Validation skill scores (sim vs obs).

The reference notebook's ``calc_stats`` (examples.ipynb cell 2):
mean/std of both series, Pearson r, RMSE, Nash-Sutcliffe efficiency —
one distributed aggregation per key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skill_scores(
    joined: DataFrame,
    obs_col: str = "obs",
    sim_col: str = "sim",
    keys: list[str] = ("station_id",),
) -> DataFrame:
    """Per-key skill metrics of a joined (obs, sim) frame.

    Returns (keys..., obs_mean, sim_mean, obs_std, sim_std, r, rmse, nse).
    NSE needs the per-key obs mean inside a sum — computed via a window
    so everything stays one aggregation pass.
    """
    keys = list(keys)
    o, s = F.col(obs_col), F.col(sim_col)
    d = joined.na.drop(subset=[obs_col, sim_col]).withColumn(
        "__obar", F.avg(obs_col).over(Window.partitionBy(*keys))
    )
    return d.groupBy(*keys).agg(
        F.avg(o).alias("obs_mean"),
        F.avg(s).alias("sim_mean"),
        F.stddev(o).alias("obs_std"),
        F.stddev(s).alias("sim_std"),
        # Pearson r in closed form: Spark's corr() raises an ANSI
        # division error on zero-variance inputs; try_divide → null
        F.try_divide(
            F.covar_samp(o, s), F.stddev_samp(o) * F.stddev_samp(s)
        ).alias("r"),
        F.sqrt(F.avg(F.pow(o - s, 2))).alias("rmse"),
        (
            1
            - F.try_divide(
                F.sum(F.pow(o - s, 2)), F.sum(F.pow(o - F.col("__obar"), 2))
            )
        ).alias("nse"),  # zero-variance obs → null, not an ANSI error
    )
