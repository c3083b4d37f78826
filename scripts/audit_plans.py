#!/usr/bin/env python
"""Physical-plan audit over every __spark_entry__ query.

Dumps `explain("formatted")` per query and summarizes the signals that
matter at 100 TB into PLANS.md:
- ReadSchema column count per parquet scan (column pruning),
- PushedFilters presence (predicate pushdown),
- join strategies chosen (broadcast vs SMJ vs BNL vs cartesian),
- number of Exchanges (shuffles),
- Python/Pandas eval nodes (should be Arrow-batched, few, deliberate),
- WholeStageCodegen span count.

Red flags are listed at the top so regressions are one glance away.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# these run a streaming job at construction time — no static plan
SKIP = {
    "q34_stream_tail_state",
    "q44_stream_stateful_stats",
    "q45_stream_windowed_agg",
    "q104_stream_session_window",
    "q111_stream_dedup_redelivery",
    "q146_stream_interval_join",
}


def explain_str(df) -> str:
    jdf = df._jdf
    return jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def count_global_windows(plan: str) -> int:
    """Windows with NO partition columns funnel all rows through one
    task — a scale red flag. In the plan text a partition-less window's
    windowspecdefinition starts directly with a sort spec (first arg
    carries ASC/DESC); a partitioned one starts with bare columns."""
    n = 0
    for m in re.finditer(r"windowspecdefinition\(([^,]*),", plan):
        first = m.group(1)
        if " ASC" in first or " DESC" in first:
            n += 1
    return n


def summarize(plan: str) -> dict:
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "global_window": count_global_windows(plan),
        "scans": [len([c for c in s.split(",") if c.strip()]) for s in scans],
        "pushed": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnl": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "python": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("AggregateInPandas"),
        "batch_eval": plan.count("BatchEvalPython"),  # row-at-a-time: bad
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
    }


def main() -> None:
    from haskell_dbfunctor_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="plan-audit", cores=8)
    rows = []
    flags = []
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans_dump")
    os.makedirs(plans_dir, exist_ok=True)
    for name, fn in entry.queries().items():
        if name in SKIP:
            continue
        plan = explain_str(fn(spark, SF_DIR))
        with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        s = summarize(plan)
        rows.append((name, s))
        if s["cartesian"]:
            flags.append(f"- `{name}`: CartesianProduct in plan")
        if s["batch_eval"]:
            flags.append(f"- `{name}`: row-at-a-time BatchEvalPython (use pandas_udf)")
        if s["global_window"]:
            flags.append(
                f"- `{name}`: {s['global_window']} partition-less window(s) "
                "(single-task global sort at scale — partition it)"
            )

    # completeness: the audit can never silently go stale again
    audited = {name for name, _ in rows}
    expected = set(entry.queries()) - SKIP
    assert audited == expected, (
        f"plan audit incomplete: missing {expected - audited}, "
        f"stale {audited - expected}"
    )

    out = ["# Physical-plan audit", "",
           f"sf dir: `{SF_DIR}` — regenerate with `python scripts/audit_plans.py`.",
           f"Covers {len(rows)} of {len(entry.queries())} queries "
           f"(skipped: {', '.join(sorted(SKIP))} — streaming, no static plan); "
           "completeness is asserted at generation time and by "
           "tests/test_plans_fresh.py.",
           "", "## Red flags", ""]
    out.extend(flags or ["(none)"])
    out += ["", "## Per-query summary", "",
            "| query | scan cols | pushed filters | BHJ | SMJ | BNL | exchanges | arrow-py | codegen spans |",
            "|---|---|---|---|---|---|---|---|---|"]
    for name, s in rows:
        out.append(
            f"| {name} | {','.join(map(str, s['scans'])) or '-'} | {s['pushed']} "
            f"| {s['bhj']} | {s['smj']} | {s['bnl']} | {s['exchanges']} "
            f"| {s['python']} | {s['codegen']} |"
        )
    out += ["", "Full plans in `plans_dump/*.txt` (gitignored).", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(rows)} queries, {len(flags)} flags)")


if __name__ == "__main__":
    main()
