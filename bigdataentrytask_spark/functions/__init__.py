"""Column-expression helpers (all JVM-side, whole-stage-codegen friendly)."""

from bigdataentrytask_spark.functions.time import (  # noqa: F401
    day_bucket,
    hour_bucket,
    minute_bucket,
    ts_from_epoch_seconds,
)
