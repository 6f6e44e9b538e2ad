"""SQL-node-level profile of one bench query: runs it with the UI on and
dumps the executed-plan node metrics (the SQL tab) for the LAST execution —
codegen span times, rows per operator, shuffle bytes, broadcast sizes.

Usage: python tools/profile_sql.py <query> [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import re
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
    spark = get_spark("profile_sql", extra_conf={"spark.ui.enabled": "true"})
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
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=1000"
    ) as r:
        sqls = json.load(r)
    print(f"# walls: {walls}")

    def dur_ms(v: str) -> float:
        # metric values like "1.2 s", "340 ms", "2.1 m", "45"
        m = re.match(r"^([\d.,]+)\s*(ms|s|m|h)?$", v.strip())
        if not m:
            return 0.0
        x = float(m.group(1).replace(",", ""))
        mult = {"ms": 1, "s": 1000, "m": 60000, "h": 3600000}.get(m.group(2) or "ms", 1)
        return x * mult

    # group executions belonging to the LAST run: take every execution whose
    # submissionTime is after the second-to-last count started; simpler: the
    # last `1` executions (each run() = one count = one execution id, plus
    # staged-persist materialisations share it)
    done = [s for s in sqls if s.get("status") == "COMPLETED"]
    last = done[-1:]
    for s in last:
        print(f"== exec {s['id']}: {s.get('duration')} ms  {s.get('description','')[:60]}")
        rows = []
        for node in s.get("nodes", []):
            mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
            t = 0.0
            for k, v in mets.items():
                if "total time" in k or k in ("time in aggregation build", "scan time", "duration"):
                    # values can be "total (min, med, max...)" — take total
                    first = v.split("(")[0].strip()
                    t = max(t, dur_ms(first))
            nrows = mets.get("number of output rows", "")
            rows.append((t, node["nodeId"], node["nodeName"], nrows.split("(")[0].strip()))
        rows.sort(reverse=True)
        for t, nid, nm, nr in rows[:35]:
            print(f"  {t:>9.0f} ms  node {nid:>3}  {nm[:58]:58s} rows={nr}")
    spark.stop()


if __name__ == "__main__":
    main()
