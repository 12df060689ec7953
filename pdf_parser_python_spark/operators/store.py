"""Normalized relational store: the reference's SQLite schema
(exams/questions/options/question_images — /root/reference/parser/
database.py:60-127) as Spark tables, plus the hydration joins that
rebuild nested entities (database.py:745-803, crud.py format).

normalize():  nested questions → 4 flat tables (explode children)
hydrate():    4 flat tables → nested questions (joins + sorted
              collect_list re-assembly) — round-trip == identity,
              asserted in tests.

At scale these are the Iceberg output tables; children carry
(doc_id, seq) foreign keys so hydration joins are co-partitionable
(bucket all four tables by doc_id to make every join shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize(questions: DataFrame) -> dict[str, DataFrame]:
    """Finalized question table → normalized child tables."""
    base = questions.select(
        "doc_id", "seq", "question_number", "question_type",
        "question_text", "answer_text", "explanation_text",
        "page_start", "page_end", "anomaly_score",
    )

    options = questions.select(
        "doc_id", "seq", F.posexplode_outer("options").alias("opt_idx", "o")
    ).select(
        "doc_id", "seq", "opt_idx",
        F.col("o.key").alias("key"),
        F.col("o.text").alias("text"),
        F.col("o.is_correct").alias("is_correct"),
        F.col("o.images").alias("images"),
    ).where(F.col("opt_idx").isNotNull())

    def _img_section(section: str, col: str) -> DataFrame:
        return questions.select(
            "doc_id", "seq",
            F.lit(section).alias("section"),
            F.lit(None).cast("string").alias("option_key"),
            F.posexplode_outer(col).alias("block_order", "image_path"),
        ).where(F.col("image_path").isNotNull())

    opt_images = options.select(
        "doc_id", "seq",
        F.lit("option").alias("section"),
        F.col("key").alias("option_key"),
        F.posexplode_outer("images").alias("block_order", "image_path"),
    ).where(F.col("image_path").isNotNull())

    images = (
        _img_section("question", "question_images")
        .unionByName(_img_section("answer", "answer_images"))
        .unionByName(_img_section("explanation", "explanation_images"))
        .unionByName(opt_images)
    )

    anomalies = questions.select(
        "doc_id", "seq", F.posexplode_outer("anomalies").alias("ord", "a")
    ).select(
        "doc_id", "seq", "ord",
        F.col("a.type").alias("type"),
        F.col("a.severity").alias("severity"),
        F.col("a.message").alias("message"),
        F.col("a.context").alias("context"),  # models.py:118
    ).where(F.col("type").isNotNull())

    return {
        "questions": base,
        "options": options.drop("images"),
        "images": images,
        "anomalies": anomalies,
    }


def hydrate(tables: dict[str, DataFrame]) -> DataFrame:
    """Rebuild nested question entities from the normalized tables."""
    q = tables["questions"]
    opts = tables["options"]
    imgs = tables["images"]
    anoms = tables["anomalies"]

    sec_imgs = (
        imgs.where(F.col("section") != "option")
        .groupBy("doc_id", "seq", "section")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("block_order", "image_path"))
                ),
                lambda x: x["image_path"],
            ).alias("paths")
        )
        .groupBy("doc_id", "seq")
        .pivot("section", ["question", "answer", "explanation"])
        .agg(F.first("paths"))
    )

    opt_imgs = (
        imgs.where(F.col("section") == "option")
        .groupBy("doc_id", "seq", "option_key")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("block_order", "image_path"))
                ),
                lambda x: x["image_path"],
            ).alias("opt_paths")
        )
    )

    opts_full = (
        opts.join(
            opt_imgs,
            (opts.doc_id == opt_imgs.doc_id)
            & (opts.seq == opt_imgs.seq)
            & (opts.key == opt_imgs.option_key),
            "left",
        )
        .select(
            opts.doc_id, opts.seq, "opt_idx", "key", "text", "is_correct",
            F.coalesce("opt_paths", F.array().cast("array<string>")).alias(
                "images"
            ),
        )
        .groupBy("doc_id", "seq")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("opt_idx", "key", "text", "is_correct",
                                 "images")
                    )
                ),
                lambda x: F.struct(
                    x["key"].alias("key"),
                    x["text"].alias("text"),
                    x["is_correct"].alias("is_correct"),
                    x["images"].alias("images"),
                ),
            ).alias("options")
        )
    )

    # explicit ord comparator: natural struct ordering is rejected for
    # map-bearing structs; arrays here are ≤3 elements, interpretation
    # cost is nil
    anoms_g = anoms.groupBy("doc_id", "seq").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("ord", "type", "severity", "message", "context")
                ),
                lambda a, b: a["ord"].cast("int") - b["ord"].cast("int"),
            ),
            lambda x: F.struct(
                x["type"].alias("type"),
                x["severity"].alias("severity"),
                x["message"].alias("message"),
                x["context"].alias("context"),
            ),
        ).alias("anomalies")
    )

    empty_s = F.array().cast("array<string>")
    out = (
        q.join(opts_full, ["doc_id", "seq"], "left")
        .join(sec_imgs, ["doc_id", "seq"], "left")
        .join(anoms_g, ["doc_id", "seq"], "left")
        .select(
            "doc_id", "seq", "question_number", "question_type",
            "question_text",
            F.coalesce("question", empty_s).alias("question_images"),
            F.coalesce(
                "options",
                F.array().cast(
                    "array<struct<key:string,text:string,"
                    "is_correct:boolean,images:array<string>>>"
                ),
            ).alias("options"),
            "answer_text",
            F.coalesce("answer", empty_s).alias("answer_images"),
            "explanation_text",
            F.coalesce("explanation", empty_s).alias("explanation_images"),
            "page_start", "page_end",
            F.coalesce(
                "anomalies",
                F.array().cast(
                    "array<struct<type:string,severity:int,message:string,"
                    "context:map<string,string>>>"
                ),
            ).alias("anomalies"),
            "anomaly_score",
        )
    )
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` so later joins
    and aggregations on that key read co-located buckets and skip the
    shuffle entirely (bucket metadata lives in the table catalog;
    Spark matches bucket specs at plan time and drops both Exchanges
    — plan-asserted in tests/test_store.py).

    This is the at-rest layout the module docstring promises for the
    normalized store: bucket all child tables by doc_id once at write
    time, and every hydration join — including repeated downstream
    reads at 100 TB — becomes a zero-shuffle sort-merge join. The
    write itself pays ONE shuffle to route rows to buckets; with
    ``sort_col`` the buckets are also pre-sorted so the join skips
    its Sort too. Bucketed output requires the table catalog
    (``saveAsTable``); ``path`` makes it an external table.
    """
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").mode("overwrite").saveAsTable(table)
