"""Scaling-efficiency evidence for the north rule: run the identical
flagship extraction job at N and 4N local cores on the same input and
report throughput at both plus efficiency = tps_{4N} / (4 * tps_N).

Methodology: the synthetic corpus is materialized ONCE to parquet (all
cores), then each cluster size runs in its own subprocess (fresh JVM)
reading the identical files; timing is best-of-3 after a warm-up run
and covers the extraction job only.

Pairs reported: local[2] → local[8] (within the sandbox's physical-core
budget) and local[8] → local[32]. The box exposes 32 hardware threads
but a pure-CPU calibration (32 spin processes vs 8) tops out at ~0.84
of ideal 4× — that ceiling is printed alongside so the 8→32 number can
be read against what the hardware permits.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CORPUS = "/dev/shm/scaling_corpus"

GEN_SNIPPET = rf"""
import sys
sys.path.insert(0, "/root/repo")
import os
from icdar_2019_rrc_sroie_spark.session import get_spark
from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df
spark = get_spark("gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
# 48k convs ≈ 572k turns: large enough that per-job fixed overhead
# (JVM plan/codegen, python worker spin-up) is <5% of the local[8]
# runtime — the steady-state regime the 100 TB claim is about. The
# round-2 speedups made the old 24k corpus finish in ~7 s at local[8],
# where overhead masked the true scaling.
n = int(os.environ.get("SCALING_N_CONVS", "48000"))
transcripts_df(spark, n_convs=n).write.mode("overwrite").parquet("{CORPUS}")
print("generated")
"""

RUN_SNIPPET = rf"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from icdar_2019_rrc_sroie_spark.session import get_spark
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
spark = get_spark("scaling", extra_confs={{
    "spark.sql.shuffle.partitions": str(4 * cpus),
    # size input splits so the small local corpus still yields >= 4
    # tasks per core — the local-mode analog of a many-file 100TB scan
    "spark.sql.files.maxPartitionBytes": "2m",
    "spark.sql.files.openCostInBytes": "0",
}})
spark.sparkContext.setLogLevel("ERROR")
t = spark.read.parquet("{CORPUS}").cache()
n_turns = t.count()
extract_spans(t).write.format("noop").mode("overwrite").save()  # warm-up
times = []
for _ in range(5):
    t0 = time.perf_counter()
    extract_spans(t).write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
times.sort()
med = times[len(times) // 2]
print(json.dumps({{"cpus": cpus, "turns": n_turns, "sec": round(med, 3),
                  "best_sec": round(times[0], 3),
                  "tps": round(n_turns / med, 1)}}))
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


def _sub(snippet: str, **env_extra) -> str:
    env = dict(os.environ, **{k: str(v) for k, v in env_extra.items()})
    out = subprocess.run([sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, check=True)
    return out.stdout.strip().splitlines()[-1]


def single_thread_calib() -> float:
    """Single-thread Mops sample — the host-throttle detector (this
    box shows hour-long external throttle windows where the quiet-band
    13+ Mops drops to 3-8 at ZERO load; ratios measured there invert,
    see BASELINE.md)."""
    import time

    n, acc = 4_000_000, 0
    t0 = time.perf_counter()
    for i in range(n):
        acc += i * 31 & 1023
    return round(n / (time.perf_counter() - t0) / 1e6, 2)


def main() -> None:
    calib_before = single_thread_calib()
    _sub(GEN_SNIPPET)
    r2 = json.loads(_sub(RUN_SNIPPET, SPARK_GRAFT_CPUS=2))
    r8 = json.loads(_sub(RUN_SNIPPET, SPARK_GRAFT_CPUS=8))
    r32 = json.loads(_sub(RUN_SNIPPET, SPARK_GRAFT_CPUS=32))
    hw_ceiling = float(_sub(CPU_CALIBRATION))
    calibs = [calib_before, single_thread_calib()]
    print(json.dumps({
        "local2": r2, "local8": r8, "local32": r32,
        "efficiency_2_to_8": round(r8["tps"] / (4 * r2["tps"]), 3),
        "efficiency_8_to_32": round(r32["tps"] / (4 * r8["tps"]), 3),
        "hw_ceiling_8_to_32_pure_cpu": hw_ceiling,
        "cpu_calib_mops": calibs,
        # quiet band on this host is 11-14 Mops; below ~9 the run sat
        # in an external-throttle window and the ratios are suspect
        "throttled_window": min(calibs) < 9.0,
    }))


if __name__ == "__main__":
    main()
