"""Physical-plan audit over the query suite.

Reports, per query: shuffle exchange count, broadcast joins, sort-merge
joins, and whether the deepest scan carries pushed filters. Run after
adding or changing operators — a plan regression (new exchange, lost
pushdown, a dropped broadcast hint falling back to SMJ) shows up as a
diff against PLANS.txt, and tests/test_plan_gate.py fails CI on it.

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]   # print audit
    python tools/plan_audit.py --write [sf_dir]       # regenerate PLANS.txt
    # the hinted-plan twin (VERDICT r11 #2): audit the SHUFFLE_HASH
    # size gate's ON state over the self-generated sf10 grid data —
    # the gated queries must show SHJ>0 / SMJ=0 there
    python tools/plan_audit.py --write --out PLANS_sf10.txt \
        scaledata/sf10 pricing_summary region_revenue small_quantity_revenue
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
        # ShuffledHashJoin: the size-gated hint's ON-state signature
        # (VERDICT r11 #2) — audited so the gate firing (or silently
        # NOT firing) at a big sf is a recorded plan fact, not a timing
        "shj": plan.count("ShuffledHashJoin"),
        "pushed": "PushedFilters: []" not in plan and "PushedFilters" in plan,
    }


#: Bench-only queries (outside the 50-entry registry) whose plan shape
#: still deserves the CI regression gate — add here to bring a q_* under
#: PLANS.txt protection without spending a registry slot.
EXTRA_AUDITED = ["substring_dedup", "small_quantity_revenue"]


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
        f"SMJ={a['smj']} BHJ={a['bhj']} SHJ={a['shj']} "
        f"pushdown={'y' if a['pushed'] else '-'}"
    )


def parse_baseline(path: str = PLANS_PATH) -> dict[str, dict]:
    """Parse PLANS.txt back into audit dicts (inverse of format_line)."""
    import re

    out = {}
    pat = re.compile(
        r"^(\S+)\s+exch=\s*(-?\d+) bcast=(\d+) SMJ=(\d+) BHJ=(\d+) "
        r"SHJ=(\d+) pushdown=(y|-)$"
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
                    "shj": int(m.group(6)),
                    "pushed": m.group(7) == "y",
                }
    return out


def main() -> None:
    from tern_ep_data_pipeline_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    write = "--write" in args
    args = [a for a in args if a != "--write"]
    out_path = PLANS_PATH
    if "--out" in args:  # e.g. PLANS_sf10.txt: the hinted-plan twin
        i = args.index("--out")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            raise SystemExit("--out requires a file path argument")
        out_path = args[i + 1]
        del args[i : i + 2]
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
        with open(out_path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"\nwrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
