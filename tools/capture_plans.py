"""Dump .explain("formatted") for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix] [sf_dir] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
Queries default to the bench HEADLINE + EXTENDED sets. The formatted
plan is the pre-execution plan (AdaptiveSparkPlan isFinalPlan=false),
which is what the optimization-round judge audits: Exchange placement,
join strategy, PushedFilters/ReadSchema, codegen spans, Python nodes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from tern_ep_data_pipeline_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or (bench.HEADLINE + bench.EXTENDED)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    from tern_ep_data_pipeline_spark.operators.dedup import release_staged

    for name in names:
        fn = getattr(entrymod, f"q_{name}")
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        release_staged(spark)
    spark.stop()


if __name__ == "__main__":
    main()
