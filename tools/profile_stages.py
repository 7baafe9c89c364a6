"""Round-7 profiling helper: run one registry/bench entry with an
UNCOMPRESSED event log and print per-stage durations, task counts and
parallelism — the Spark-UI substitute in this headless sandbox (guide
§7.1; spark.ui.enabled is off for bench fidelity).

Usage: python tools/profile_stages.py <entry> [reps]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_extra import _registry  # noqa: E402
from icdar_2019_rrc_sroie_spark.operators.indexes import (  # noqa: E402
    release_indexes,
)
from icdar_2019_rrc_sroie_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(f"profile-{name}", extra_confs={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": evdir,
    })
    spark.sparkContext.setLogLevel("ERROR")
    reg = _registry(spark, sf_dir)
    ent = reg[name]
    is_call = isinstance(ent, tuple)
    thunk = ent[1] if is_call else ent
    for rep in range(reps):
        t0 = time.perf_counter()
        if is_call:
            thunk()
        else:
            thunk().write.format("noop").mode("overwrite").save()
        print(f"rep {rep}: {time.perf_counter() - t0:.3f}s", flush=True)
        release_indexes()
    spark.stop()

    path = sorted(glob.glob(f"{evdir}/*"), key=os.path.getmtime)[-1]
    if os.path.isdir(path):
        path = glob.glob(f"{path}/events*")[0]
    stages, exec_run, jobs = [], {}, []
    for line in open(path):
        e = json.loads(line)
        if e.get("Event") == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            dur = (si.get("Completion Time", 0)
                   - si.get("Submission Time", 0)) / 1000
            stages.append((dur, si["Stage ID"], si["Number of Tasks"],
                           si["Stage Name"].split("\n")[0][:70]))
        elif e.get("Event") == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            exec_run[sid] = exec_run.get(sid, 0) + \
                m.get("Executor Run Time", 0) / 1000
        elif e.get("Event") == "SparkListenerJobStart":
            jobs.append(e["Job ID"])
    stages.sort(reverse=True)
    print(f"n_jobs={len(jobs)} n_stages={len(stages)} "
          f"stage-wall-sum={sum(s[0] for s in stages):.1f}s")
    for dur, sid, ntask, sname in stages[:25]:
        print(f"{dur:7.2f}s wall  {exec_run.get(sid, 0):7.2f}s cpu  "
              f"stage={sid:4d} tasks={ntask:4d}  {sname}")


if __name__ == "__main__":
    main()
