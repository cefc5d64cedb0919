"""Single-pass side metrics via ``Dataset.observe``.

The 100 TB rule for data-quality counters: NEVER pay a second scan for
them.  ``observe`` attaches named aggregate expressions to a plan node;
Spark folds them into the SAME job that materializes the main result,
and the driver reads the metric row afterwards.  This is the engine's
mechanism behind Structured Streaming's per-batch metrics, exposed for
batch jobs: write the curated output AND learn row counts / violation
counts / null rates from that one pass.

Contrast: `queries.py::validate_events` computes validation counters as
the RESULT (one aggregation scan by itself); this wrapper attaches the
same counters to some other job as a passenger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_observed_metrics(
    df: DataFrame,
    metrics: dict[str, Column],
) -> tuple[DataFrame, Observation]:
    """Attach named metric aggregates to ``df``'s plan.

    Returns (df, observation).  After ANY action on the returned df,
    ``observation.get`` yields {name: value} — computed during that
    action, not by a new job.  Metric expressions must be aggregates
    over the observed node's rows (counts, conditional counts, sums —
    the usual validation counters).
    """
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs
