"""Physical-plan audit over the query suite.

Reports, per query: shuffle exchange count, broadcast joins, sort-merge
joins, and whether the deepest scan carries pushed filters. Run after
adding or changing operators — a plan regression (new exchange, lost
pushdown, a dropped broadcast hint falling back to SMJ) shows up as a
diff against PLANS.txt, and tests/test_plan_gate.py fails CI on it.

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]   # print audit
    python tools/plan_audit.py --write [sf_dir]       # regenerate PLANS.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.txt"
)


def audit(df) -> dict:
    from tern_ep_data_pipeline_spark.sources.lake import exchange_count

    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        # EXECUTED exchanges: lake.exchange_count dedupes cached subtrees
        # (the plan string prints a staged frame's lineage under every
        # scan referencing it) and excludes ReusedExchange — the r8/r9
        # substring counts overstated plans with shared staged frames
        "exchanges": exchange_count(df),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "pushed": "PushedFilters: []" not in plan and "PushedFilters" in plan,
    }


#: Bench-only queries (outside the 50-entry registry) whose plan shape
#: still deserves the CI regression gate — add here to bring a q_* under
#: PLANS.txt protection without spending a registry slot.
EXTRA_AUDITED = ["substring_dedup"]


def audit_all(spark, sf_dir: str, only=None) -> dict[str, dict | str]:
    """Audit every registry query (plus EXTRA_AUDITED bench-only ones);
    value is the audit dict, or the error string for a query that failed
    to plan."""
    import __spark_entry__ as entrymod

    targets = dict(entrymod.queries())
    for name in EXTRA_AUDITED:
        targets[name] = getattr(entrymod, f"q_{name}")

    out: dict[str, dict | str] = {}
    for name, fn in targets.items():
        if only and name not in only:
            continue
        try:
            out[name] = audit(fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - diagnostics only
            out[name] = f"ERROR {type(exc).__name__}: {str(exc)[:120]}"
    return out


def format_line(name: str, a: dict) -> str:
    return (
        f"{name:26s} exch={a['exchanges']:2d} bcast={a['broadcasts']} "
        f"SMJ={a['smj']} BHJ={a['bhj']} "
        f"pushdown={'y' if a['pushed'] else '-'}"
    )


def parse_baseline(path: str = PLANS_PATH) -> dict[str, dict]:
    """Parse PLANS.txt back into audit dicts (inverse of format_line)."""
    import re

    out = {}
    pat = re.compile(
        r"^(\S+)\s+exch=\s*(-?\d+) bcast=(\d+) SMJ=(\d+) BHJ=(\d+) pushdown=(y|-)$"
    )
    with open(path) as fh:
        for line in fh:
            m = pat.match(line.strip())
            if m:
                out[m.group(1)] = {
                    "exchanges": int(m.group(2)),
                    "broadcasts": int(m.group(3)),
                    "smj": int(m.group(4)),
                    "bhj": int(m.group(5)),
                    "pushed": m.group(6) == "y",
                }
    return out


def main() -> None:
    from tern_ep_data_pipeline_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    write = "--write" in args
    args = [a for a in args if a != "--write"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("plan-audit", shuffle_partitions=8)
    results = audit_all(spark, sf_dir, only or None)
    lines = [
        format_line(n, a) if isinstance(a, dict) else f"{n:26s} {a}"
        for n, a in results.items()
    ]
    print("\n".join(lines))
    if write:
        with open(PLANS_PATH, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"\nwrote {PLANS_PATH}")
    spark.stop()


if __name__ == "__main__":
    main()
