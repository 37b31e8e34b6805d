from datastream_io_spark.plans.explain import (  # noqa: F401
    executed_plan,
    plan_summary,
    scan_info,
)
