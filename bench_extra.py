#!/usr/bin/env python3
"""Round-8 optimization harness: isolated, noop-sink timings for the
operators under optimization (guide §1.4), selectable per phase so a
single change can be re-measured in seconds instead of a full bench.py
run. bench.py itself is FROZEN for driver measurement; numbers cited in
OPTIMIZATION_r08.md come from here unless stated otherwise.

Usage: python bench_extra.py phase [phase ...]
Phases: headline minhash clusters simhash embedding para gate lineage
        e2e mixpack
Env: R08_RUNS (default 2) best-of-N per timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("R08_RUNS", "2"))
DOCS_1M = "/tmp/bench_dedup_docs_1000000.parquet"
EMB_1M = "/tmp/bench_dedup_emb_1000000.parquet"


def session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-extra-r08")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def best(tag, fn, runs=RUNS):
    spark = fn.__globals__.get("spark")
    walls = []
    for _ in range(runs):
        walls.append(round(fn(), 3))
    out = {"phase": tag, "best": min(walls), "walls": walls}
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    phases = sys.argv[1:] or ["minhash", "simhash", "embedding"]
    spark = session()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    entry._ensure_shipped(spark)
    from pyspark.sql import functions as F

    sc = spark.sparkContext

    def timed(tag, mk, runs=RUNS, action="noop"):
        # t0 BEFORE construction: operators that localCheckpoint run
        # their upstream stages eagerly at DataFrame build (AQE
        # materializes every stage up to the last exchange inside
        # Dataset.localCheckpoint), exactly like the frozen bench.py
        # timed regions, which all construct inside the timer.
        walls = []
        for _ in range(runs):
            sc.setJobDescription(f"r08:{tag}")
            t0 = time.perf_counter()
            df = mk()
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
        print(json.dumps({"phase": tag, "best": min(walls),
                          "walls": walls}), flush=True)

    if "headline" in phases:
        q = entry.queries()
        for name in ("extract_questions", "extract_flat_spans",
                     "extract_validation", "a1_duplicates",
                     "a3_conditional", "j1_join_revenue", "j3_anti",
                     "w8_ordered_flatten", "w9_topk", "dedup_exact",
                     "text_stats", "sim_topk"):
            timed(name, lambda n=name: q[n](spark, SF_DIR), runs=3)

    docs = spark.read.parquet(DOCS_1M) if os.path.exists(DOCS_1M) else None
    emb = spark.read.parquet(EMB_1M) if os.path.exists(EMB_1M) else None

    if "minhash" in phases and docs is not None:
        from pdf_parser_python_spark.operators import dedup

        timed("minhash_pairs_1m",
              lambda: dedup.minhash_lsh_pairs(docs), runs=RUNS)

    if "clusters" in phases and docs is not None:
        from pdf_parser_python_spark.operators import dedup

        def run_clusters():
            out = dedup.minhash_dedup_clusters(docs)
            n = out.count()
            out.unpersist()
            assert n > 0
            return 0.0

        timed("minhash_clusters_1m", run_clusters, runs=RUNS,
              action="wall")

    if "simhash" in phases and docs is not None:
        from pdf_parser_python_spark.operators import dedup

        timed("simhash_vec_1m",
              lambda: dedup.simhash_near_dups(docs, vectorized=True),
              runs=RUNS)

    if "embedding" in phases and emb is not None:
        from pdf_parser_python_spark.operators import dedup

        timed(
            "embedding_vec_1m",
            lambda: dedup.embedding_near_dups(
                emb, threshold=0.99, id_col="vec_id",
                vec_col="embedding", vectorized=True,
            ),
            runs=RUNS,
        )

    if "para" in phases and docs is not None:
        from pdf_parser_python_spark.operators.dedup import paragraph_dedup
        from pdf_parser_python_spark.operators.repetition import (
            chunked_lines,
        )

        timed(
            "para_dedup_1m",
            lambda: paragraph_dedup(
                docs, paragraphs=chunked_lines(F.col("text"), 15)
            ),
        )

    if "gate" in phases and docs is not None:
        from pdf_parser_python_spark.operators.curation import (
            curation_filter,
        )

        timed(
            "curation_gate_arrow_1m",
            lambda: curation_filter(docs, engine="arrow", line_width=10),
        )

    if "lineage" in phases:
        import shutil

        from pdf_parser_python_spark.plans.lineage import ExtractionJob
        from pdf_parser_python_spark.sources.spans import GRAMMAR_VERSION

        corpus = f"/tmp/bench_corpus_v{GRAMMAR_VERSION}ns_20000.parquet"
        cdf = spark.read.parquet(corpus)

        def run_lineage():
            out_dir = "/tmp/r08_lineage_job"
            shutil.rmtree(out_dir, ignore_errors=True)
            job = ExtractionJob(out_dir, n_buckets=16)
            job._stage_input(cdf)
            t0 = time.perf_counter()
            job.run(spark, cdf)
            return time.perf_counter() - t0

        walls = [round(run_lineage(), 3) for _ in range(RUNS)]
        print(json.dumps({"phase": "lineage_loop_16b",
                          "best": min(walls), "walls": walls}),
              flush=True)

    if "e2e" in phases and docs is not None:
        import bench as _bench

        corpus = f"/tmp/bench_corpus_v2ns_20000.parquet"
        cdf = (spark.read.parquet(corpus)
               if os.path.exists(corpus) else None)
        for _ in range(RUNS):
            r = _bench._e2e_phase(spark, cdf)
            print(json.dumps({"phase": "e2e", **r}), flush=True)

    if "mixpack" in phases and docs is not None:
        from pdf_parser_python_spark.operators.mixture import (
            mixture_plan,
            mixture_sample,
        )
        from pdf_parser_python_spark.operators.packing import (
            pack_sequences,
            pack_stats,
        )

        srcd = docs.withColumn(
            "source",
            F.concat(F.lit("s"), (F.col("doc_id") % 16).cast("string")),
        )
        mweights = {f"s{i}": float(1 + (i % 3)) for i in range(8)}

        def run_mix():
            t0 = time.perf_counter()
            msamp = mixture_sample(
                srcd, mixture_plan(srcd, mweights,
                                   target_tokens=20_000_000)
            )
            msamp.agg(F.count("*"), F.max("epoch")).first()
            return time.perf_counter() - t0

        walls = [round(run_mix(), 3) for _ in range(RUNS)]
        print(json.dumps({"phase": "mixture_1m", "best": min(walls),
                          "walls": walls}), flush=True)

        def run_pack():
            t0 = time.perf_counter()
            pack_stats(pack_sequences(docs, seq_len=2048)).agg(
                F.count("*"), F.sum("n_tokens")
            ).first()
            return time.perf_counter() - t0

        walls = [round(run_pack(), 3) for _ in range(RUNS)]
        print(json.dumps({"phase": "packing_1m", "best": min(walls),
                          "walls": walls}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
