"""Composite curation gate: each rule fires on a crafted doc, the
verdict composes, and the plan stays map-only."""

from pyspark.sql import functions as F

from pdf_parser_python_spark.operators.curation import RULES, curation_filter

GOOD = (
    "The quick brown fox jumps over the lazy dog and then runs far "
    "away into the quiet green hills. It was a calm day for the fox "
    "and everything that is good stayed good for a while longer. "
    "The sun set in the west and the night came softly to the land."
)


def test_each_rule_fires_and_good_doc_keeps(spark):
    docs = spark.createDataFrame(
        [
            (0, GOOD),
            (1, "el la de que los una por con para " * 9),  # es stopwords
            (2, GOOD + "\nsame line\nsame line\nsame line\nsame line"
                + "\nsame line\nsame line\nsame line\nsame line"
                + "\nsame line\nsame line\nsame line\nsame line"),
            (3, ("the fox " * 60) + GOOD),  # repetitive bigram
            (4, "too few tokens here."),
            (5, "@@ ## $$ %% ^^ && ** (( )) !! " * 8),  # punct flood
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in curation_filter(docs, min_quality=60).collect()
    }
    assert out[0]["keep"] and out[0]["reasons"] == ""
    assert "lang" in out[1]["reasons"]
    assert "dup_lines" in out[2]["reasons"]
    assert "repetitive_ngram" in out[3]["reasons"]
    assert "too_short" in out[4]["reasons"]
    assert "low_quality" in out[5]["reasons"]
    for d in (1, 2, 3, 4, 5):
        assert not out[d]["keep"]


def test_reasons_fixed_order_and_compose(spark):
    bad = "zz qq " * 5  # short, non-lang, repetitive, low quality
    docs = spark.createDataFrame([(1, bad)], "doc_id long, text string")
    row = curation_filter(docs).first()
    got = row["reasons"].split(",")
    # every fired reason appears in RULES order
    assert got == [r for r in RULES if r in got]
    assert len(got) >= 3 and not row["keep"]


def test_curation_plan_is_map_only(spark):
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(GOOD).alias("text")
    )
    plan = (
        curation_filter(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_arrow_engine_matches_native(spark):
    import random

    rng = random.Random(23)
    words = ["the", "and", "fox", "runs", "el", "la", "zz", "good", "day"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 60))))
        for i in range(120)
    ] + [(900, None), (901, ""), (902, GOOD)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    nat = {
        r["doc_id"]: r.asDict()
        for r in curation_filter(
            docs,
            lines=__import__(
                "pdf_parser_python_spark.operators.repetition",
                fromlist=["chunked_lines"],
            ).chunked_lines(F.col("text"), 10),
        ).collect()
    }
    arw = {
        r["doc_id"]: r.asDict()
        for r in curation_filter(docs, engine="arrow", line_width=10).collect()
    }
    assert nat == arw
    plan = (
        curation_filter(docs, engine="arrow", line_width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and plan.count("MapInPandas") == 1


def test_arrow_engine_matches_native_hostile_chars(spark):
    # punctuation floods, NBSP (unicode-\s divergence trap), digits,
    # marks, stopword ties — the quality/lang kernel mirrors must agree
    docs = spark.createDataFrame(
        [
            (1, "@@ ## $$ %% !! ?? .. " * 10),
            (2, "word with nbsp separators and the usual filler"),
            (3, "123 456 789 0!? mixed. digits? and marks!"),
            (4, "the el the el the el balanced stopword tie text"),
            (5, "x" * 250),
            (6, "short"),
        ],
        "doc_id long, text string",
    )
    nat = {r["doc_id"]: r.asDict() for r in curation_filter(docs).collect()}
    arw = {
        r["doc_id"]: r.asDict()
        for r in curation_filter(docs, engine="arrow").collect()
    }
    assert nat == arw


def test_passthrough_columns_both_engines(spark):
    """r6: passthrough carries input columns through the verdict
    unchanged on BOTH engines, so compositions can .where('keep')
    map-side instead of semi-joining the corpus."""
    from pyspark.sql import functions as F

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and is in that for with the end. " * 3, "web"),
        (2, "xy", "code"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    outs = {}
    for eng in ("native", "arrow"):
        out = curation_filter(
            df, engine=eng, line_width=10, passthrough=("text", "src")
        )
        assert set(("text", "src", "keep")) <= set(out.columns)
        outs[eng] = {r["doc_id"]: r.asDict() for r in out.collect()}
        for i, text, src in rows:
            assert outs[eng][i]["text"] == text
            assert outs[eng][i]["src"] == src
    assert outs["native"] == outs["arrow"]


def test_rarity_scores_semantics(spark):
    """r6: CCNet-style rarity proxy — integer-exact contributions,
    OOV = max rarity, null/empty docs score 0."""
    from pdf_parser_python_spark.operators.textstats import (
        corpus_token_freq,
        rarity_scores,
    )

    d = spark.createDataFrame(
        [(1, "the the the rare"), (2, ""), (3, None), (4, "the unseen zebra")],
        "doc_id long, text string",
    )
    freq = corpus_token_freq(d, top_k=2)  # keeps {the:4, rare:1}
    out = {r["doc_id"]: (r["n_tokens"], r["rarity"])
           for r in rarity_scores(d, freq).collect()}
    assert out[1] == (4, 437500)          # (3*250000 + 1000000) / 4
    assert out[2] == (0, 0) and out[3] == (0, 0)
    assert out[4] == (3, 750000)          # the + 2 OOV at 1e6
    # stock prose scores lower than gibberish on a shared vocab
    d2 = spark.createDataFrame(
        [(i, "the quick brown fox jumps again") for i in range(20)]
        + [(99, "zxqv jkwp mmorx")],
        "doc_id long, text string",
    )
    f2 = corpus_token_freq(d2)
    r2 = {r["doc_id"]: r["rarity"] for r in rarity_scores(d2, f2).collect()}
    assert r2[99] > r2[0]
