"""Physical-plan audits: make the Catalyst properties the engine
depends on ASSERTABLE, so a regression that silently un-broadcasts a
join or un-pushes a filter fails a test instead of a 100 TB run.

The checks mirror SURVEY §4's optimizer table: predicate pushdown /
column pruning (free from Catalyst once the plan is declarative),
broadcast of the small join side, bounded shuffle (Exchange) counts,
and wide whole-stage-codegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints,
    but returned instead of printed-from-the-JVM)."""
    jdf = df._jdf  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning audit: a
    scan reading all columns for a 2-column projection is a bug."""
    return re.findall(r"ReadSchema: (\S+)", plan_string(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df) or (
        "BroadcastNestedLoopJoin" in plan_string(df)
    )


def count_shuffles(df: DataFrame) -> int:
    """Shuffle Exchange operators in the plan, each node counted once
    (formatted plans print every node in both the tree and the details
    section; broadcast and reused exchanges are not shuffles)."""
    plan = plan_string(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def codegen_stage_count(df: DataFrame, execute: bool = False) -> int:
    """WholeStageCodegen stages. Under AQE the pre-execution plan
    hides codegen markers entirely; pass ``execute=True`` to
    materialize the final plan first (cheap at test/doc scale) and
    count the ``*(N)`` stage markers of the finalized tree."""
    if execute:
        # collect(), not count(): count() builds a NEW query (Aggregate
        # on top) with its own queryExecution and never finalizes df's
        # AQE plan — df's executedPlan would still say isFinalPlan=false
        df.collect()
        s = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        n = len(set(re.findall(r"\*\((\d+)\)", s)))
        if n:
            return n
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_string(df))))


def audit(df: DataFrame, execute: bool = False) -> dict:
    """One-call summary used by tests and by hand at the REPL."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_join": has_broadcast_join(df),
        "shuffles": count_shuffles(df),
        "codegen_stages": codegen_stage_count(df, execute=execute),
    }
