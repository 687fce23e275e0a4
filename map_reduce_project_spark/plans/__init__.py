from map_reduce_project_spark.plans.inspect import (
    codegen_fraction,
    formatted_plan,
    num_exchanges,
    operator_counts,
    pushed_filters,
    read_schemas,
    scan_columns,
    simple_plan,
    uses_broadcast_join,
)

__all__ = [
    "codegen_fraction",
    "formatted_plan",
    "num_exchanges",
    "operator_counts",
    "pushed_filters",
    "read_schemas",
    "scan_columns",
    "simple_plan",
    "uses_broadcast_join",
]
