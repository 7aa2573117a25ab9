"""Physical-plan inspection: make 100 TB-scale plan properties testable.

The reference has no optimizer to inspect (SURVEY.md section 4); Spark has
Catalyst, and at scale the difference between a right plan and a wrong one
(scan-heavy vs pruned, shuffle join vs broadcast) is the whole performance
story.  These helpers turn `.explain()` text into assertions so plan
regressions fail tests instead of surfacing as cluster bills.
"""

from simple_land_registry_data_ingestion_spark.plans.inspect import (
    assert_no_cartesian_product,
    broadcast_join_count,
    empty_partition_windows,
    formatted_plan,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "assert_no_cartesian_product",
    "broadcast_join_count",
    "empty_partition_windows",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
]
