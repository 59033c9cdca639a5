"""Physical-plan inspection helpers.

The engine's scale contract is expressed as plan properties —
broadcast the small side, prune top-k below the shuffle, push
filters into scans, combine map-side — and these helpers make those
properties assertable (tests/test_plans.py) and debuggable
(``explain_summary`` for a one-screen view of the operators that
matter).
"""

from big_data_fknn_spark.plans.inspect import (
    broadcast_hint_groupings,
    executed_plan,
    explain_summary,
    has_operator,
    pushed_filters,
    read_schema_width,
    single_partition_consumers,
    single_partition_window_feeds,
)

__all__ = [
    "broadcast_hint_groupings",
    "executed_plan",
    "explain_summary",
    "has_operator",
    "pushed_filters",
    "read_schema_width",
    "single_partition_consumers",
    "single_partition_window_feeds",
]
