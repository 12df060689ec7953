#!/usr/bin/env python3
"""One scaling sample for bench.py phase 2.

Runs the full extraction job (parquet scan → packed kernel →
finalize → flatten → noop sink) at a given ``local[N]`` parallelism in
a FRESH process/JVM, repeats it ``--runs`` times inside the session,
and prints one JSON line with the per-run walls.

Process isolation matters on this shared host: restarting the JVM
inside one long-lived bench process accumulates allocator/GC state and
couples consecutive measurements to the same noise window. bench.py
interleaves invocations of this probe across parallelism levels and
takes the minimum wall per level — repeated-measurement minima are the
standard estimator of intrinsic runtime under one-sided (additive)
co-tenant noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# One Arrow compute thread per Python worker: pyarrow sizes its pool by
# the MACHINE's cpu count (32), not the taskset mask, so a pinned
# 1-core probe would otherwise time 32 threads thrashing one core
# (measured: 41 s vs 34 s on the 40k corpus). local[N] spawns N
# workers, so pool=1 per worker is exactly the N-single-core-executor
# emulation the north rule asks for. Set before any JVM/worker spawns.
os.environ["OMP_NUM_THREADS"] = "1"


def _calibrate(cores: int) -> float:
    """Quiet-window detector (shared impl: scripts/quiet.py)."""
    from quiet import calibrate

    return calibrate(cores)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--runs", type=int, default=3)
    a = p.parse_args()

    import bench  # session()/warmup() shared with phase 1

    spark = bench.session(a.cores, uniform_scan=True)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    from pdf_parser_python_spark.plans import pipeline

    entrymod._ensure_shipped(spark)
    bench.warmup(spark)

    corpus = spark.read.parquet(a.corpus)
    # one untimed run of the real job: JIT, Python-worker spin-up and
    # page-cache warming otherwise land entirely in the first sample
    bench.run_to_noop(pipeline.extract_flat_spans(corpus))
    _calibrate(a.cores)  # calibration warmup (allocator, JIT)
    times, calibs = [], []
    for _ in range(a.runs):
        c1 = _calibrate(a.cores)
        times.append(bench.run_to_noop(pipeline.extract_flat_spans(corpus)))
        c2 = _calibrate(a.cores)
        calibs.append(max(c1, c2))
    spark.stop()
    print(json.dumps({
        "cores": a.cores,
        "times": [round(t, 3) for t in times],
        "calibs": [round(c, 4) for c in calibs],
    }))


if __name__ == "__main__":
    main()
