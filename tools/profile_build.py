"""Driver-side build profile: wall + py4j round-trip count per query BUILD
(guide §1: measure first — ~12.5 s of the r15 all-query total was plan
construction, so build chatter is a first-class optimization target).

Wraps py4j's ClientServerConnection.send_command to count round trips made
while the q_* builder runs (no .count() — build only), then repeats the
build to separate warm-module costs from first-touch imports.

Usage: python tools/profile_build.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from tern_ep_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or (bench.HEADLINE + bench.EXTENDED)
    spark = get_spark("profile_build")
    from tern_ep_data_pipeline_spark.operators.dedup import release_staged

    from py4j.clientserver import ClientServerConnection

    counter = {"n": 0}
    orig = ClientServerConnection.send_command

    def counted(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    ClientServerConnection.send_command = counted

    out = {}
    for name in names:
        fn = getattr(entrymod, f"q_{name}")
        runs = []
        for _ in range(3):
            release_staged(spark)
            counter["n"] = 0
            t0 = time.time()
            fn(spark, sf_dir)
            runs.append((round(time.time() - t0, 3), counter["n"]))
        release_staged(spark)
        # report the best warm build (min wall of the repeat builds)
        best = min(runs[1:], key=lambda r: r[0])
        out[name] = {"build_s": best[0], "py4j_calls": best[1],
                     "cold_build_s": runs[0][0], "cold_calls": runs[0][1]}
        print(f"# {name}: build {best[0]:.3f}s, {best[1]} py4j calls "
              f"(cold {runs[0][0]:.3f}s/{runs[0][1]})", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
