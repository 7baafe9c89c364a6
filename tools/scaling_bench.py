"""Scaling-efficiency evidence for the north rule: run the identical
flagship extraction job at N and 4N local cores on the same input and
report throughput at both plus efficiency = tps_{4N} / (4 * tps_N).

Primary pair: local[2] → local[8] (within the sandbox's physical-core
budget). Secondary pair: local[8] → local[32] (the box exposes 32
hardware threads, but a pure-CPU calibration shows 32 concurrent
processes only reach ~2.9× the throughput of 8 — SMT/hypervisor
ceiling ≈ 0.72 — so the secondary pair is reported with that ceiling
alongside).

Each run is a separate subprocess (fresh JVM); timing is best-of-3 on a
warmed JVM and covers the extraction job only.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from icdar_2019_rrc_sroie_spark.session import get_spark
from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
n_convs = int(os.environ.get("SCALING_N_CONVS", "24000"))
spark = get_spark("scaling", extra_confs={
    "spark.sql.shuffle.partitions": str(4 * cpus),
})
spark.sparkContext.setLogLevel("ERROR")
t = transcripts_df(spark, n_convs=n_convs).cache()
n_turns = t.count()
extract_spans(t).write.format("noop").mode("overwrite").save()  # warm-up
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    extract_spans(t).write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"cpus": cpus, "turns": n_turns, "sec": round(best, 3),
                  "tps": round(n_turns / best, 1)}))
"""

CPU_CALIBRATION = r"""
import subprocess, sys, time
CODE = "n=0\nfor i in range(30_000_000): n+=i"
out = {}
for procs in (8, 32):
    t0 = time.perf_counter()
    ps = [subprocess.Popen([sys.executable, "-c", CODE]) for _ in range(procs)]
    for p in ps:
        p.wait()
    out[procs] = procs / (time.perf_counter() - t0)
print(round(out[32] / (4 * out[8]), 3))
"""


def run(cpus: int, n_convs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SCALING_N_CONVS=str(n_convs))
    out = subprocess.run([sys.executable, "-c", RUN_SNIPPET], env=env,
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_convs = int(os.environ.get("SCALING_N_CONVS", "24000"))
    r2 = run(2, n_convs)
    r8 = run(8, n_convs)
    r32 = run(32, n_convs)
    cal = subprocess.run([sys.executable, "-c", CPU_CALIBRATION],
                         capture_output=True, text=True, check=True)
    hw_ceiling = float(cal.stdout.strip().splitlines()[-1])
    print(json.dumps({
        "local2": r2, "local8": r8, "local32": r32,
        "efficiency_2_to_8": round(r8["tps"] / (4 * r2["tps"]), 3),
        "efficiency_8_to_32": round(r32["tps"] / (4 * r8["tps"]), 3),
        "hw_ceiling_8_to_32_pure_cpu": hw_ceiling,
    }))


if __name__ == "__main__":
    main()
