"""Plan-inspection helpers (SURVEY.md §4): programmatic access to the
executed physical plan so tests can ASSERT the optimizer behaviors the
engine's layout is designed for — partition pruning on term_bucket /
cluster directories, filter pushdown into parquet, broadcast joins —
instead of hoping for them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_info(df: DataFrame) -> list[dict]:
    """Per-FileScan dict: partition filters, pushed filters, read schema."""
    out = []
    for line in executed_plan(df).splitlines():
        if "FileScan" not in line:
            continue
        d = {"raw": line.strip()}
        for key in ("PartitionFilters", "PushedFilters", "ReadSchema"):
            m = re.search(rf"{key}: (\[[^\]]*\]|\S+)", line)
            d[key] = m.group(1) if m else ""
        out.append(d)
    return out


def plan_summary(df: DataFrame) -> dict:
    plan = executed_plan(df)
    return {
        "n_exchanges": plan.count("Exchange"),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sort_merge_joins": plan.count("SortMergeJoin"),
        # executedPlan.toString renders codegen stages as "*(n) Op"
        "whole_stage_codegen": "WholeStageCodegen" in plan or "*(" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "scans": scan_info(df),
    }
