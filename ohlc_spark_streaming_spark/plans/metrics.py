"""Pipeline metrics via ``Dataset.observe`` — measured during the action,
never with a second scan.

A 100 TB pipeline can't afford a separate ``count()`` / null-audit pass
per stage: ``observe`` attaches aggregate expressions to a plan node and
the metrics materialize as a by-product of whatever action runs the plan
(write, collect, foreachBatch). This module standardizes the pattern:

* :func:`observed` wraps a DataFrame with a named
  :class:`pyspark.sql.Observation` carrying row count + per-column null
  counts (the minimum viable data-quality heartbeat).
* After ANY action on the returned frame, ``observation.get`` yields the
  metrics dict — zero extra jobs (asserted in tests/test_observe.py).

Only aggregate expressions are legal observation points (Spark enforces
this); distinct-style aggregates are disallowed by Spark because they
would need a shuffle — the free-ride property is exactly that metrics
reduce map-side inside the existing stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame,
    name: str,
    null_cols: Sequence[str] = (),
) -> tuple[DataFrame, Observation]:
    """Attach a row-count + null-count observation to ``df``.

    Returns ``(observed_df, observation)``; run any action on
    ``observed_df``, then read ``observation.get``. Metrics: ``n_rows``
    plus ``null_<col>`` for each requested column.
    """
    obs = Observation(name)
    exprs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        .cast("long")
        .alias(f"null_{c}")
        for c in null_cols
    ]
    return df.observe(obs, *exprs), obs
