"""Train the committed k-means centroids (models/centroids_k8.json).

The ANN/SemDeDup driver queries need centroid PARAMETERS both engines
agree on: the DuckDB oracle cannot replay a Spark-side k-means (Lloyd
is iterative with data-dependent float centroids), so — like the
charlm_lite / trigram / quality_clf models — the centroids are trained
once, deterministically, by this script and committed. Both the Spark
query and the generated SQL then embed the identical float literals,
and the assignment/cosine/top-k algebra is value-compared exactly.

Recipe: `train_centroids` (deterministic xxhash64 sample, lowest-id
init, 10 numpy-float64 Lloyd iterations) on the sf0.01 embeddings
table — the scale the driver checks at. Reruns are byte-identical
(no RNG anywhere; numpy float64 ops are deterministic).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icdar_2019_rrc_sroie_spark.operators.similarity import (  # noqa: E402
    train_centroids,
)
from icdar_2019_rrc_sroie_spark.session import get_spark  # noqa: E402

K = 8
SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "icdar_2019_rrc_sroie_spark", "models",
                   "centroids_k8.json")


def main() -> None:
    spark = get_spark("train-centroids", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = train_centroids(emb, k=K, iters=10, sample_size=2000)
    with open(OUT, "w") as f:
        json.dump(cents, f)
    print(f"wrote {OUT}: k={len(cents)} dim={len(cents[0])}")


if __name__ == "__main__":
    main()
