#!/usr/bin/env python3
"""One pinned-core sample of the dedup family's dominant stage.

Times the minhash SIGNATURE stage (tokenize → 3-gram shingles → K
seeded hashes → per-seed min; operators/dedup.py) over a slice of the
planted bench corpus at ``local[N]`` in a fresh process/JVM, exactly
like scripts/scale_probe.py does for extraction. bench.py pins each
invocation to N physical cores with taskset and compares 1 vs 4 cores
— the measured basis for the README's cores-per-executor guidance for
the dedup family (shingling is string/bandwidth-bound like the
extraction kernel, so packing many cores per executor shares one
memory-bandwidth domain).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# see scale_probe.py: one Arrow/BLAS thread per worker so a pinned
# 1-core probe doesn't time a 32-thread pool thrashing one core
os.environ["OMP_NUM_THREADS"] = "1"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, required=True)
    p.add_argument("--corpus", required=True,
                   help="pre-sliced doc corpus parquet (bench.py "
                        "materializes it with many small files so the "
                        "uniform-scan configs give every level the same "
                        "task shape)")
    p.add_argument("--runs", type=int, default=2)
    a = p.parse_args()

    import bench
    from quiet import calibrate

    spark = bench.session(a.cores, uniform_scan=True)
    spark.sparkContext.setLogLevel("ERROR")

    from pdf_parser_python_spark.operators import dedup

    docs = spark.read.parquet(a.corpus)
    sigs = dedup.minhash_signatures(docs)
    bench.run_to_noop(sigs)  # untimed: JIT + page cache + codegen
    calibrate(a.cores)
    times, calibs = [], []
    for _ in range(a.runs):
        c1 = calibrate(a.cores)
        times.append(bench.run_to_noop(dedup.minhash_signatures(docs)))
        c2 = calibrate(a.cores)
        calibs.append(max(c1, c2))
    n_docs = docs.count()
    spark.stop()
    print(json.dumps({
        "cores": a.cores,
        "docs": n_docs,
        "times": [round(t, 3) for t in times],
        "calibs": [round(c, 4) for c in calibs],
    }))


if __name__ == "__main__":
    main()
