"""Orchestrate the multi-process execution evidence (north rule:
"spark-submit --py-files on a multi-executor cluster at two cluster
sizes (N and 4N executors), scaling efficiency ≥ 0.8").

Builds the --py-files zip, materializes the flagship corpus once, then
spark-submits tools/cluster_job.py under ``local-cluster[2,4,4096]``
(2 executor JVMs × 4 cores) and ``local-cluster[8,4,4096]`` (8 × 4 —
4× the executors, filling the host's 32 hardware threads). Executors
are REAL separate JVMs with their own python workers; broadcast,
shuffle and the CC parquet checkpoints cross process boundaries.

Prints a summary JSON with per-size throughput, the 2→8 executor
scaling efficiency, and a pure-CPU concurrency ceiling measured the
same way scaling_bench does (the host's 8→32-thread SMT ceiling is
~0.84 of ideal; the efficiency number must be read against it).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/dev/shm/cluster_evidence_corpus"
SCRATCH = "/dev/shm/cluster_evidence_scratch"


def cpu_ceiling(small: int = 8, big: int = 32) -> float:
    """Measured concurrent pure-CPU ceiling big/small (ideal = big/small):
    spin `n` processes, sum their op rates."""
    import multiprocessing as mp

    def spin(q):
        n, acc = 2_000_000, 0
        t0 = time.perf_counter()
        for i in range(n):
            acc += i * 31 & 1023
        q.put(n / (time.perf_counter() - t0))

    def total(k):
        q = mp.Queue()
        ps = [mp.Process(target=spin, args=(q,)) for _ in range(k)]
        [p.start() for p in ps]
        rates = [q.get() for _ in ps]
        [p.join() for p in ps]
        return sum(rates)

    return round(total(big) / total(small) / (big / small), 3)


def main() -> None:
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from package import build

    zip_path = build()

    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from icdar_2019_rrc_sroie_spark.session import get_spark; "
        "from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df; "
        "s = get_spark('gen', master='local[32]'); "
        "s.sparkContext.setLogLevel('ERROR'); "
        "transcripts_df(s, n_convs=int(__import__('os').environ.get("
        "'SCALING_N_CONVS', '48000')))"
        ".write.mode('overwrite').parquet(%r); print('generated')"
    ) % (ROOT, CORPUS)
    subprocess.run([sys.executable, "-c", gen], check=True)

    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                "bin", "spark-submit")
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable,
               # local-cluster WORKERS override spark.local.dir with
               # SPARK_LOCAL_DIRS (default /tmp — real disk); pin the
               # same tmpfs shuffle dir the in-process engine uses or
               # executor shuffle/spill I/O serializes on disk
               SPARK_LOCAL_DIRS="/dev/shm/spark-local")
    # default pair 1→4 executors (4→16 cores): N→4N inside the host's
    # physical-core budget, mirroring scaling_bench's local[2]→local[8]
    # pair; pass e.g. "2,8" to probe the SMT-limited full-host regime
    sizes = tuple(int(x) for x in
                  (sys.argv[1] if len(sys.argv) > 1 else "1,4").split(","))
    if len(sizes) != 2 or sizes[0] >= sizes[1]:
        raise SystemExit("pass exactly two ascending executor counts, "
                         "e.g. 1,4 — validated BEFORE the batteries run")
    results = {}
    for n_exec in sizes:
        cmd = [
            spark_submit,
            "--master", f"local-cluster[{n_exec},4,4096]",
            "--conf", "spark.executor.memory=3g",
            "--conf", "spark.sql.shuffle.partitions=%d" % (n_exec * 4),
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            os.path.join(ROOT, "tools", "cluster_job.py"),
            CORPUS, SCRATCH,
        ]
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
        m = re.search(r"CLUSTER_EVIDENCE (\{.*\})", proc.stdout)
        if not m:
            sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-5000:])
            raise SystemExit(f"cluster_job failed at {n_exec} executors")
        results[n_exec] = json.loads(m.group(1))

    small, big = sizes
    ratio = big / small
    eff = round(results[big]["flagship_tps"]
                / (ratio * results[small]["flagship_tps"]), 3)
    print(json.dumps({
        "mode": "local-cluster, spark-submit --py-files",
        "executors": {k: v for k, v in results.items()},
        f"scaling_efficiency_{small}to{big}_executors": eff,
        "cpu_ceiling_concurrency": cpu_ceiling(small * 4, big * 4),
    }))


if __name__ == "__main__":
    main()
