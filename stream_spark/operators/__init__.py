from stream_spark.operators.rownum import with_global_row_number
from stream_spark.operators.windows import (
    sliding_count_window,
    sliding_time_window,
    tumbling_count_window,
    tumbling_time_window,
)
from stream_spark.operators.filters import non_zero, apply_filter

__all__ = [
    "with_global_row_number",
    "tumbling_count_window",
    "sliding_count_window",
    "tumbling_time_window",
    "sliding_time_window",
    "non_zero",
    "apply_filter",
]
