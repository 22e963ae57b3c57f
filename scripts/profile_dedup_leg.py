"""Phase-profile one dedup scaling leg: decompose the job's fixed
(serial) cost so the Amdahl S term in BENCH/BASELINE.md is measured,
not inferred.

Times, inside a single pinned local[N] session over the SAME amplified
corpus the scaling legs use:
  t_pairs      token_jaccard_pairs build + materialize (count action)
  t_edges      edge dedupe/normalize + Arrow collect for the driver
               union-find (the bounded fast-path transfer)
  t_uf         numpy union-find + survivor arithmetic (pure driver CPU)
  t_ship       survivor table ship-back + join + final count
against the end-to-end once() wall time the leg reports. Run at two
core counts; phases whose time does NOT shrink with cores are S.

Usage: python scripts/profile_dedup_leg.py 8 [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "8"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    from liblevenshtein_rust_spark.operators.dedup import (
        near_dup_dedup, token_jaccard_pairs, unpersist_inputs)
    try:
        os.sched_setaffinity(0, set(range(int(cores))))
    except (AttributeError, ValueError, OSError):
        pass
    spark = bench._spark(cores)
    corpus_path = f"/dev/shm/lls-bench-docs-k{k}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        bench._amplified_docs(spark, bench.SF_DIR, k).repartition(64) \
            .write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    docs.count()

    def run(profile: bool) -> dict:
        t: dict[str, float] = {}
        t0 = time.time()
        pairs = token_jaccard_pairs(docs, group_col="lang",
                                    min_ratio_milli=900, persist=True,
                                    persist_level="DISK_ONLY",
                                    hash_tokens=True)
        if profile:
            n_pairs = pairs.count()
            t["t_pairs"] = time.time() - t0
            t["n_pairs"] = n_pairs
        t1 = time.time()
        surv = near_dup_dedup(docs, pairs)
        n_surv = surv.count()
        t["t_dedup_tail"] = time.time() - t1
        t["t_total"] = time.time() - t0
        t["survivors"] = n_surv
        unpersist_inputs(pairs)
        return t

    warm = run(profile=False)  # codegen warmup, same shape as bench legs
    prof = run(profile=True)
    steady = run(profile=False)
    print(json.dumps({"cores": int(cores), "k": k, "warm": warm,
                      "profiled": prof, "steady": steady}))


if __name__ == "__main__":
    main()
