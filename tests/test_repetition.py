"""Repetition filters + decontamination: brute-force parity, edge
cases, and plan-shape guarantees."""

import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from pdf_parser_python_spark.functions.hashing import md5_64
from pdf_parser_python_spark.operators.contamination import (
    contamination_report,
    decontaminated,
)
from pdf_parser_python_spark.operators.repetition import (
    chunked_lines,
    repetition_profile,
    word_ngrams,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _r4(x: float) -> float:
    """HALF_UP 4-decimal rounding — Spark's F.round mode (Python's
    built-in round is banker's and differs on exact ties, e.g.
    0.28125)."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def _brute_profile(text: str, n: int = 2, width: int | None = None):
    """Pure-Python mirror of repetition_profile's documented
    definitions (lines = \\n split unless width gives chunked mode)."""
    toks = text.split()
    if width is None:
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    else:
        lines = [
            " ".join(toks[i : i + width]) for i in range(0, len(toks), width)
        ]
    m = len(lines)
    lc = Counter(lines)
    dup_line_frac = _r4((m - len(lc)) / m) if m else 0.0
    total = sum(len(x) for x in lines)
    dup_chars = sum(len(x) for x in lines if lc[x] > 1)
    dup_line_char_frac = _r4(dup_chars / total) if total else 0.0

    ltoks = text.lower().split()
    grams = [
        " ".join(ltoks[i : i + n]) for i in range(len(ltoks) - n + 1)
    ]
    if grams:
        gc = Counter(grams)
        best = max(gc.items(), key=lambda kv: (kv[1], kv[0]))
        top_ngram = best[0]
        top_frac = (
            _r4(best[1] * len(best[0]) / len(text)) if text else 0.0
        )
        dup_ngram_frac = _r4((len(grams) - len(gc)) / len(grams))
    else:
        top_ngram, top_frac, dup_ngram_frac = "", 0.0, 0.0
    return {
        "n_lines": m,
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "top_ngram": top_ngram,
        "top_ngram_char_frac": top_frac,
        "dup_ngram_frac": dup_ngram_frac,
    }


def _rand_text(rng: random.Random) -> str:
    n_lines = rng.randint(0, 8)
    lines = []
    for _ in range(n_lines):
        if lines and rng.random() < 0.4:
            lines.append(rng.choice(lines))  # plant duplicate lines
        else:
            lines.append(
                " ".join(
                    rng.choice(VOCAB) for _ in range(rng.randint(1, 6))
                )
            )
    return "\n".join(lines)


def test_profile_matches_bruteforce_random(spark):
    rng = random.Random(7)
    rows = [(i, _rand_text(rng)) for i in range(120)]
    rows += [(1000, ""), (1001, "solo"), (1002, "a a a a a a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(df).collect()
    }
    for doc_id, text in rows:
        want = _brute_profile(text)
        have = got[doc_id]
        for k, v in want.items():
            assert have[k] == pytest.approx(v, abs=1e-9), (
                doc_id,
                k,
                text,
            )


def test_profile_chunked_lines_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 35))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(
            df, lines=chunked_lines(F.col("text"), 10)
        ).collect()
    }
    for doc_id, text in rows:
        want = _brute_profile(text, width=10)
        have = got[doc_id]
        for k, v in want.items():
            assert have[k] == pytest.approx(v, abs=1e-9), (doc_id, k, text)


def test_top_ngram_tiebreak_deterministic(spark):
    # "x y" and "y x" both occur twice → gram-desc tie-break picks "y x"
    df = spark.createDataFrame(
        [(1, "x y x y x")], "doc_id long, text string"
    )
    row = repetition_profile(df).first()
    assert row["top_ngram"] == "y x"


def test_repetition_plan_is_map_only(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a b c a b").alias("text")
    )
    plan = (
        repetition_profile(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_contamination_report_and_clean_partition(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight tail"),
            (2, "ONE TWO THREE FOUR FIVE SIX SEVEN EIGHT upper case hit"),
            (3, "no overlap with anything here at all whatsoever truly"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "one two three four five six seven eight")], "bid long, text string"
    )
    rep = contamination_report(docs, bench, n=8, hasher=md5_64)
    got = {r["doc_id"]: r["n_matched_grams"] for r in rep.collect()}
    assert got == {1: 1, 2: 1}  # case-folded match, set semantics
    clean = decontaminated(docs, bench, n=8, hasher=md5_64)
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4]
    assert clean.columns == docs.columns


def test_contamination_joins_are_broadcast(spark):
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.lit(w) for w in "a b c d e f g h i j".split()]
        ).alias("text"),
    )
    bench = docs.limit(2)
    for df in (
        contamination_report(docs, bench),
        decontaminated(docs, bench),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
        assert "SortMergeJoin" not in plan


def test_word_ngrams_set_matches_python(spark):
    rng = random.Random(3)
    texts = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 12)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", word_ngrams(F.col("text"), 3).alias("g")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.lower().split()
        want = [
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        ]
        assert got[i] == want, (i, t)


def test_null_text_yields_zero_metrics(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_profile(df).collect()}
    for d in (1, 2):
        assert rows[d]["n_lines"] == 0
        assert rows[d]["dup_line_frac"] == 0.0
        assert rows[d]["top_ngram"] == ""
        assert rows[d]["dup_ngram_frac"] == 0.0


def test_arrow_twin_matches_native_both_modes(spark):
    from pdf_parser_python_spark.operators.repetition import (
        repetition_profile_arrow,
    )

    rng = random.Random(19)
    rows = [(i, _rand_text(rng)) for i in range(100)]
    rows += [(900, ""), (901, None), (902, "a a a a a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nat = {r["doc_id"]: r.asDict() for r in repetition_profile(df).collect()}
    arw = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile_arrow(df).collect()
    }
    assert nat == arw
    nat2 = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(
            df, lines=chunked_lines(F.col("text"), 10)
        ).collect()
    }
    arw2 = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile_arrow(df, line_width=10).collect()
    }
    assert nat2 == arw2


def test_paragraph_dedup_first_wins_and_rebuilds(spark):
    from pdf_parser_python_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "keep one\n\nboiler plate\n\nkeep two"),
            (2, "boiler plate\n\nfresh text"),   # loses the boilerplate
            (3, "boiler plate"),                  # loses everything
            (4, ""),
            (5, "boiler plate\n\nboiler plate\n\nown text"),  # in-doc dup
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[1]["text_deduped"] == "keep one\n\nboiler plate\n\nkeep two"
    assert got[1]["n_paras"] == 3 and got[1]["n_kept"] == 3
    assert got[2]["text_deduped"] == "fresh text"
    assert got[3]["text_deduped"] == "" and got[3]["n_kept"] == 0
    assert got[4]["n_paras"] == 0 and got[4]["text_deduped"] == ""
    assert got[5]["text_deduped"] == "own text"


def test_paragraph_dedup_plan_avoids_hash_window(spark):
    # the winner must be an aggregation (map-side combinable), never a
    # row_number window over the paragraph hash (mega-dup skew hazard)
    from pdf_parser_python_spark.operators.dedup import paragraph_dedup

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"), F.lit("a\n\nb\n\nc").alias("text")
    )
    plan = (
        paragraph_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_corpus_top_ngrams_counts_and_plan(spark):
    from pdf_parser_python_spark.operators.repetition import corpus_top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "click here to buy now and click here to win"),
            (2, "click here to see more text about things"),
            (3, "totally unrelated words without repeats whatsoever"),
        ],
        "doc_id long, text string",
    )
    top = corpus_top_ngrams(docs, n=3, k=5).collect()
    assert top[0]["gram"] == "click here to" and top[0]["cnt"] == 3
    assert all(top[i]["cnt"] >= top[i + 1]["cnt"] for i in range(len(top) - 1))
    plan = (
        corpus_top_ngrams(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global sort
