"""Single-pass pipeline health metrics via ``DataFrame.observe``.

The reference pipeline has no observability beyond printed batch
output; a production pipeline needs row/error counters. The naive way
— ``df.count()`` plus ``df.filter(corrupt).count()`` — scans the data
two extra times; ``observe`` attaches named aggregates to the normal
action, so metrics ride along the job for free (at 100 TB an extra
scan is hours). In streaming, the same observed metrics surface per
micro-batch in ``QueryProgress.observedMetrics`` for alerting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_parse_health(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, Observation]:
    """Attach (n_rows, n_corrupt, corrupt_pct) counters to the parse
    stage. Returns the observed frame (use it in place of ``df``) and
    the Observation; read ``obs.get`` after any action on the frame."""
    obs = Observation("parse_health")
    n_corrupt = F.sum(
        F.when(F.col(corrupt_col).isNotNull(), 1).otherwise(0)
    ).alias("n_corrupt")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        n_corrupt,
    )
    return observed, obs
