"""Physical-plan linter: flags the patterns that break at 100 TB.

PySpark can't inject Catalyst rules without a JVM extension jar, and none
are needed for this engine (SURVEY §4.3) — but plans can still silently
regress (a join flips to cartesian, a filter stops reaching the scan, an
unbounded collect_list sneaks into an aggregate). The linter inspects the
executed plan and reports scale hazards; CI asserts the registry's
headline queries stay clean (tests/test_plan_linter.py).

Each finding is ``(severity, code, message)``; severity is ``error`` for
certain scale-breakers and ``info`` for patterns that are fine in bounded
shapes. Codes:

* ``CARTESIAN``      (error) — CartesianProduct: both sides unbounded.
* ``NL_BROADCAST``   (info)  — BroadcastNestedLoopJoin: bounded by the
                       broadcast side; legitimate for scalar attachment
                       (crossJoin of a 1-row aggregate), a hazard if the
                       broadcast side is a real table.
* ``COLLECT_LIST``   (error) — unbounded per-group buffers in an aggregate
                       (the reference's open/close bug, main.py:153-158).
* ``FULL_SCAN``      (error) — parquet scan reads 15+ columns: projection
                       likely not pruned.
* ``NO_PARTIAL_AGG`` (info)  — aggregation without a partial (map-side)
                       phase.
* ``ROW_PYTHON``     (error) — row-at-a-time Python eval (BatchEvalPython);
                       Arrow variants are fine.
* ``GLOBAL_WINDOW``  (info)  — a Window fed by Exchange SinglePartition:
                       every input row crosses one task. Benign when the
                       input is provably tiny (an O(#partitions) totals
                       table, a top-k limit); a scale-killer when it is
                       the corpus — use operators.ranking's distributed
                       rank instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame) -> list[tuple[str, str, str]]:
    plan = plan_string(df)
    findings: list[tuple[str, str, str]] = []

    if "CartesianProduct" in plan:
        findings.append(
            (
                "error",
                "CARTESIAN",
                "cartesian join: O(left x right) comparisons with neither "
                "side bounded — add an equi key (bucketize a band predicate "
                "if needed)",
            )
        )
    elif "BroadcastNestedLoopJoin" in plan:
        findings.append(
            (
                "info",
                "NL_BROADCAST",
                "nested-loop join bounded by a broadcast side — fine for "
                "scalar attachment; a hazard if the broadcast side is a "
                "full table",
            )
        )

    if re.search(r"\bcollect_list\(", plan) or re.search(r"\bcollect_set\(", plan):
        findings.append(
            (
                "error",
                "COLLECT_LIST",
                "unbounded per-group buffer in aggregate: state grows with "
                "group size — prefer min_by/max_by/struct-extrema or an "
                "explicit bounded slice",
            )
        )

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        n_cols = m.group(1).count(",") + 1 if m.group(1) else 0
        if n_cols >= 15:
            findings.append(
                (
                    "error",
                    "FULL_SCAN",
                    f"parquet scan reads {n_cols} columns — column pruning "
                    "is probably not reaching this scan",
                )
            )
            break

    has_agg = re.search(r"(HashAggregate|SortAggregate|ObjectHashAggregate)", plan)
    if has_agg and not re.search(r"partial_", plan):
        findings.append(
            (
                "info",
                "NO_PARTIAL_AGG",
                "aggregation without a partial (map-side) phase — every row "
                "crosses the shuffle; check for distinct-on-expression or "
                "non-partial-able aggregates",
            )
        )

    if "Window" in plan and "Exchange SinglePartition" in plan:
        findings.append(
            (
                "info",
                "GLOBAL_WINDOW",
                "window over a single partition — fine for tiny inputs "
                "(per-partition totals, post-limit top-k), a scale-killer "
                "over the corpus; prefer operators.ranking.with_global_rank",
            )
        )

    if "BatchEvalPython" in plan:
        findings.append(
            (
                "error",
                "ROW_PYTHON",
                "row-at-a-time Python UDF on the path — use built-in "
                "expressions or an Arrow-batched pandas UDF",
            )
        )

    return findings
