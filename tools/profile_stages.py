"""Stage-level profile of one bench query (guide §1/§7: where does the
time go — per stage, with shuffle bytes). Runs the query with the Spark UI
enabled, then dumps every stage's duration, task time, shuffle read/write
and row counts from the REST API, slowest first.

Usage: python tools/profile_stages.py <query> [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tern_ep_data_pipeline_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(
        "profile_stages", extra_conf={"spark.ui.enabled": "true"}
    )
    from tern_ep_data_pipeline_spark.operators.dedup import release_staged

    fn = getattr(entrymod, f"q_{name}")
    walls = []
    for i in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        walls.append(round(time.time() - t0, 3))
        if i < runs - 1:
            release_staged(spark)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    # keep only the LAST run's stages: find the max stageId seen per run by
    # splitting on submission time is fiddly; instead report all, sorted.
    done.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"# walls: {walls}")
    print(
        f"{'stage':>5} {'wall_ms':>8} {'taskTime_ms':>11} {'in_rows':>9} "
        f"{'out_rows':>9} {'shufR_kB':>9} {'shufW_kB':>9} {'tasks':>5}  name"
    )
    for s in done[:40]:
        wall = None
        try:
            t0 = s.get("firstTaskLaunchedTime")
            t1 = s.get("completionTime")
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            wall = (
                datetime.strptime(t1, fmt) - datetime.strptime(t0, fmt)
            ).total_seconds() * 1000
        except Exception:
            pass
        print(
            f"{s['stageId']:>5} {wall and int(wall) or -1:>8} "
            f"{s.get('executorRunTime', -1):>11} "
            f"{s.get('inputRecords', -1):>9} {s.get('outputRecords', -1):>9} "
            f"{int(s.get('shuffleReadBytes', 0)/1024):>9} "
            f"{int(s.get('shuffleWriteBytes', 0)/1024):>9} "
            f"{s.get('numCompleteTasks', -1):>5}  {s['name'][:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
