"""Sequence packing: exact prefix sums at any bucket width, no
single-partition global window."""

import random

from pyspark.sql import functions as F

from pdf_parser_python_spark.operators.packing import (
    pack_sequences,
    pack_stats,
)


def test_prefix_sums_exact_across_bucket_widths(spark):
    rng = random.Random(13)
    rows = [(i, " ".join("w" for _ in range(rng.randint(0, 40))))
            for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # brute force
    start, want = 0, {}
    for i, t in rows:
        nt = len(t.split())
        want[i] = (nt, start, start // 128, start % 128)
        start += nt
    for bw in (7, 64, 100000):  # smaller / comparable / one-bucket
        got = {
            r["doc_id"]: (r["n_tokens"], r["start"], r["pack_id"],
                          r["pack_offset"])
            for r in pack_sequences(df, seq_len=128, bucket_width=bw).collect()
        }
        assert got == want, bw


def test_pack_stats_totals(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(100)],  # 8 tokens each
        "doc_id long, text string",
    )
    st = {r["pack_id"]: r for r in
          pack_stats(pack_sequences(df, seq_len=64), seq_len=64).collect()}
    # 800 tokens, 64/pack → 12.5 packs of starts; 8 docs start per pack
    assert sum(r["n_docs"] for r in st.values()) == 100
    assert sum(r["n_tokens"] for r in st.values()) == 800
    assert st[0]["n_docs"] == 8 and st[0]["fill_ratio"] == 1.0


def test_no_unpartitioned_corpus_window(spark):
    # the corpus-sized window must be partitioned by bucket; only the
    # #buckets-row offsets window may be global
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = (
        pack_sequences(df, bucket_width=64)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    wins = re.findall(r"Window \[.*?\]", plan)
    assert wins  # plan shape sanity: windows are present
    # every Window over corpus rows (n_tokens) must carry a partition
    # spec on _b; only the bucket-totals window (_tot) may be global
    for w in wins:
        if "n_tokens" in w and "_tot" not in w:
            assert "windowspecdefinition(_b" in w, w
