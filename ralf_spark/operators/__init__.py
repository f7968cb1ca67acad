from ralf_spark.operators.windows import (
    sliding_count_window,
    tumbling_count_window,
)
from ralf_spark.operators.joins import asof_join, enrichment_join
from ralf_spark.operators.policies import (
    change_detection_filter,
    keep_latest,
    sampling_shed,
)

__all__ = [
    "asof_join",
    "change_detection_filter",
    "enrichment_join",
    "keep_latest",
    "sampling_shed",
    "sliding_count_window",
    "tumbling_count_window",
]
