"""Scaling-efficiency evidence for the north rule: run the identical
flagship extraction job at local[8] and local[32] on the same input and
report throughput at both plus efficiency = tps32 / (4 * tps8).

Each run is a separate subprocess (fresh JVM) so the two cluster sizes
are isolated. Timing covers the extraction job only, not JVM startup.
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
n_convs = int(os.environ.get("SCALING_N_CONVS", "12000"))
spark = get_spark("scaling", extra_confs={
    "spark.sql.shuffle.partitions": str(4 * cpus),
})
spark.sparkContext.setLogLevel("ERROR")
t = transcripts_df(spark, n_convs=n_convs).cache()
n_turns = t.count()
# warm-up (JIT + code cache), then timed run
extract_spans(t).write.format("noop").mode("overwrite").save()
t0 = time.perf_counter()
extract_spans(t).write.format("noop").mode("overwrite").save()
sec = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "turns": n_turns, "sec": round(sec, 3),
                  "tps": round(n_turns / sec, 1)}))
"""


def run(cpus: int, n_convs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SCALING_N_CONVS=str(n_convs))
    out = subprocess.run([sys.executable, "-c", RUN_SNIPPET], env=env,
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_convs = int(os.environ.get("SCALING_N_CONVS", "12000"))
    r8 = run(8, n_convs)
    r32 = run(32, n_convs)
    eff = r32["tps"] / (4 * r8["tps"])
    print(json.dumps({"local8": r8, "local32": r32,
                      "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
