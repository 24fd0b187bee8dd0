"""Physical-plan introspection helpers.

Tests use these to pin the properties that matter at scale instead of
eyeballing ``explain()`` output: a bucketed edge table must join without
an Exchange on the edge side; a parquet scan with a filter must show
PushedFilters; a projection must prune the scan schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan."""
    plan = simple_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange hashpartitioning" in line
               or "Exchange rangepartitioning" in line)


def python_nodes(df: DataFrame) -> list[str]:
    """Plan lines that route rows through per-row Python (PythonRDD /
    SerializeFromObject / row-at-a-time BatchEvalPython). Vectorized Arrow
    nodes (ArrowEvalPython, MapInPandas, FlatMapGroupsInPandas) are NOT
    flagged — the input_hint allows pandas/Arrow UDFs, it bans per-row
    Python."""
    plan = simple_plan(df)
    bad = ("PythonRDD", "SerializeFromObject", "DeserializeToObject",
           "BatchEvalPython")
    return [l.strip() for l in plan.splitlines() if any(b in l for b in bad)]


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of a formatted plan ('' if none)."""
    plan = physical_plan(df)
    return "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)


def scan_schema(df: DataFrame) -> str:
    """The ReadSchema lines of a formatted plan (column pruning check)."""
    plan = physical_plan(df)
    return "\n".join(l for l in plan.splitlines() if "ReadSchema" in l)
