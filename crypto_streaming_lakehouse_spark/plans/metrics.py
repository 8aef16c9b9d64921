"""Single-pass pipeline metrics via ``df.observe`` / ``Observation``.

At 100 TB a separate ``count()`` or data-quality probe is another full
scan of the table. ``observe()`` piggybacks named aggregate expressions
onto the job that is already running — they are computed inside the same
stages (accumulator-backed, no extra shuffle, no extra scan) and become
available on the driver the moment the action finishes. That makes row
counts, null tallies, and freshness bounds effectively free on every
batch write, which is how a production pipeline should emit its
operational metrics (the reference instead re-reads each layer and
counts it: scripts/count_data.sh:35-38 — a second scan per layer that
would be prohibitive at scale).

Only aggregate expressions are allowed (and none may reference
``distinct``); Spark enforces this at analysis time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_metrics(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next execution.

    Returns the instrumented DataFrame and the ``Observation`` handle;
    ``obs.get`` blocks until the first action on the returned frame
    completes, then yields ``{metric_name: value}``.
    """
    obs = Observation(name)
    cols = [c.alias(k) for k, c in metrics.items()]
    return df.observe(obs, *cols), obs
