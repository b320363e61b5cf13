"""Physical-plan inspection (SURVEY.md §3.2 "debug surface", §4).

The engine owns no custom Catalyst rules — its planner obligations are
(a) declaring plans Catalyst can optimize and (b) PROVING the optimized
plan has the shape that survives a 100x scale-up. These helpers make
(b) assertable in tests: pushdown reached the scan, the dimension join
broadcast, the top-k never global-sorts, Python only appears where a
UDF was the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (what `df.explain('formatted')` prints)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def has_node(df: DataFrame, node: str) -> bool:
    """True if the physical plan contains `node` (e.g. 'BroadcastHashJoin')."""
    return node in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        ln.strip() for ln in physical_plan(df).splitlines() if "PushedFilters" in ln
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema lines of every scan (column-pruning evidence)."""
    return "\n".join(
        ln.strip() for ln in physical_plan(df).splitlines() if "ReadSchema" in ln
    )


#: Physical-plan node names that mean "rows leave the JVM for Python".
PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "AggregateInPandas",
)


def uses_python(df: DataFrame) -> bool:
    """True if any Python evaluation appears (Batch/ArrowEvalPython,
    FlatMapGroupsInPandas, MapInPandas...). Non-UDF operators must keep
    this False — Python in the hot path is the #1 scale killer."""
    plan = physical_plan(df)
    return any(marker in plan for marker in PY_MARKERS)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange nodes — every one is a full-data network pass
    at scale; operators assert their expected shuffle budget."""
    plan = physical_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("+- Exchange")
        or ln.strip().startswith("Exchange")
        or "- Exchange" in ln
    )
