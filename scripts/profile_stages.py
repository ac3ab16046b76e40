"""Per-stage shuffle-byte/wall profile of the recrawl scaling workload.

Runs bench.run_recrawl at N pages on local[CORES] with the UI enabled,
then dumps every completed stage's shuffle read/write bytes, input bytes,
task count and wall from the Spark REST API — the evidence table behind
BENCH/BASELINE.md's byte-floor analysis.

Usage: python scripts/profile_stages.py [pages] [cores]
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, ".")


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import bench
    from nlnieuwscrawler_spark.session import get_spark

    spark = get_spark(
        "nlnc-profile",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.task.cpus": "2",
            "spark.sql.adaptive.enabled": "true",
        },
    )
    res = bench.run_recrawl(spark, pages)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    rows = []
    for s in stages:
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:70],
                "tasks": s["numCompleteTasks"],
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "exec_cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "wall_s": round(
                    s.get("executorRunTime", 0) / 1e3 / max(cores, 1), 2
                ),
            }
        )
    rows.sort(key=lambda x: -(x["sh_write_mb"] + x["sh_read_mb"]))
    print(json.dumps({"recrawl": res, "pages": pages, "cores": cores}))
    hdr = ["stage", "tasks", "input_mb", "sh_read_mb", "sh_write_mb",
           "exec_cpu_s", "wall_s", "name"]
    print("\t".join(hdr))
    for x in rows[:25]:
        print("\t".join(str(x[h]) for h in hdr))
    tot_w = sum(x["sh_write_mb"] for x in rows)
    tot_r = sum(x["sh_read_mb"] for x in rows)
    print(f"TOTAL shuffle write {tot_w:.0f} MB, read {tot_r:.0f} MB")


if __name__ == "__main__":
    main()
