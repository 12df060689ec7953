"""End-to-end extraction plan.

    documents(doc_id, spans[]) ──explode──▶ line tokens (native)
        ──noise prefilter (native, pushed below the UDF barrier)──▶
        groupBy(doc_id).applyInPandas(segment_kernel) ──▶ raw questions
        ──finalize (native HOFs)──▶ questions
        ──flatten (native)──▶ canonical output spans

Stage placement mirrors the reference's hand-fusion (SURVEY.md §4): the
always-ignore noise filter (state_machine.py:200-202) and empty-line
drop (:95,182,196-198) run as Column predicates *before* the grouped
kernel, so Catalyst prunes columns and the Arrow transfer ships only
surviving lines. Cover-page noise is state-dependent and stays in the
kernel.

Scale notes (100 TB / 10^12 docs):
- the only shuffle is the hash partition by ``doc_id`` feeding the
  grouped kernel; it is also the skew point — see ``repartition_hint``
  and operators/native.py's segment-level alternative;
- tokenization is explode + split: narrow, no shuffle, whole-stage
  codegen;
- finalize/flatten are per-row expressions: no shuffle after the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema
from ..functions import anchors as A
from ..operators import finalize as _finalize
from ..operators import flatten as _flatten
from ..operators import dkernel
from ..operators.kernel import segment_kernel
from ..operators.pkernel import parse_partition


def tokenize(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans[]) → LINE-schema rows (native only).

    Text spans are split on newlines (posexplode keeps intra-block
    order), trimmed, empty lines dropped, and always-ignored noise
    filtered JVM-side. Image spans pass through untouched.
    """
    has_page = "page" in documents.schema["spans"].dataType.elementType.names
    s = F.explode("spans").alias("s")
    base = documents.select("doc_id", s).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
        (F.col("s.page") if has_page else F.lit(1)).cast("int").alias("page"),
    )

    text_lines = (
        base.where(F.col("kind") == "text")
        .select(
            "doc_id",
            "kind",
            F.posexplode(F.split("text", "\n")).alias("line_no", "line"),
            "media_ref",
            "offset",
            "page",
        )
        # python str.strip() parity (shared class, anchors.py — includes
        # the \x1C-\x1F separators Java's \s misses)
        .withColumn(
            "text",
            F.regexp_replace(
                "line",
                f"^{A.J_PY_STRIP_CLASS}+|{A.J_PY_STRIP_CLASS}+$",
                "",
            ),
        )
        .drop("line")
        .where(F.col("text") != "")
        # F2 noise pushdown: always-ignored boilerplate never reaches
        # the kernel (state-independent by definition)
        .where(~F.col("text").rlike(A.J_NOISE_CI) & ~F.col("text").rlike(A.J_NOISE_CS))
    )
    images = base.where(F.col("kind") == "image").select(
        "doc_id", "kind", F.lit(0).alias("line_no"), "media_ref", "offset", "page",
    ).withColumn("text", F.lit(""))

    cols = ["doc_id", "kind", "text", "media_ref", "offset", "line_no", "page"]
    return text_lines.select(cols).unionByName(images.select(cols))


def parse_raw(
    documents: DataFrame,
    shuffle_partitions: int | None = None,
    engine: str = "packed",
    chunk_size: int | None = None,
) -> DataFrame:
    """documents → raw question rows (pre-finalize).

    engine="packed" (default): zero-shuffle — the input is already one
    row per document, so parse straight off the packed span arrays
    (operators/dkernel.py). Scan → mapInPandas, single stage.

    engine="partition": line-grained scale path — explode + repartition
    by doc_id + sortWithinPartitions + mapInPandas over whole Arrow
    batches, FSM state carried across batches. Use for line-grained
    sources or documents too large for a single Arrow row.

    engine="grouped": groupBy(doc_id).applyInPandas — one invocation
    per document; kept as the semantically-obvious reference
    implementation (tests assert all engines agree).
    """
    if engine == "packed":
        proj = dkernel.packed_projection(documents)
        return proj.mapInPandas(dkernel.parse_docs, schema=schema.QUESTION_RAW)
    if engine == "native":
        from ..operators.native import parse_native

        # chunk_size: intra-doc parallel segmentation for giant docs
        return parse_native(tokenize(documents), chunk_size=chunk_size)
    lines = tokenize(documents)
    if engine == "grouped":
        grouped = (
            lines.repartition(shuffle_partitions, "doc_id")
            if shuffle_partitions
            else lines
        )
        return grouped.groupBy("doc_id").applyInPandas(
            segment_kernel, schema=schema.QUESTION_RAW
        )
    parts = (
        lines.repartition(shuffle_partitions, "doc_id")
        if shuffle_partitions
        else lines.repartition("doc_id")
    )
    return parts.sortWithinPartitions("doc_id", "offset", "line_no").mapInPandas(
        parse_partition, schema=schema.QUESTION_RAW
    )


def extract_questions(documents: DataFrame, **kw) -> DataFrame:
    """documents → finalized question table (the flagship operator).

    Packed default = fused kernel (parse + finalize in one pass, see
    extract_flat_spans note); other engines keep parse → native
    finalize, and tests assert row equality between the two."""
    if kw.get("engine", "packed") == "packed" and not kw.get(
        "shuffle_partitions"
    ):
        proj = dkernel.packed_projection(documents)
        return proj.mapInPandas(
            dkernel.parse_docs_final, schema=schema.QUESTION_FINAL
        )
    return _finalize.finalize_questions(parse_raw(documents, **kw))


def extract_validation(documents: DataFrame, **kw) -> DataFrame:
    """documents → per-doc ValidationReport (reference validator.py).

    The default packed engine computes the report INSIDE the parse
    kernel (dkernel.validate_docs): one scan → mapInPandas pass, zero
    shuffle, and no question text ever crosses the Arrow boundary —
    where extract_questions → validation_report pays the full FSM parse
    and then aggregates it away (r2 bench: 6.99 s vs 5.69 s for the
    parse alone at sf0.1). Other engines keep the relational
    decomposition (operators/validate.py), row-equal by test."""
    if kw.get("engine", "packed") == "packed" and not kw.get(
        "shuffle_partitions"
    ):
        from ..operators import dkernel as _dk

        proj = dkernel.packed_projection(documents)
        return proj.mapInPandas(
            _dk.validate_docs, schema=schema.VALIDATION_REPORT
        )
    from ..operators.validate import validation_report

    return validation_report(extract_questions(documents, **kw))


def extract_flat_spans(documents: DataFrame, **kw) -> DataFrame:
    """documents → canonical ordered output spans (§1.4 contract).

    The default packed engine uses the FUSED kernel
    (dkernel.parse_docs_flat): scan → one mapInPandas emitting flat
    primitive columns. The Column-API finalize+flatten stage it
    replaces is interpreted HOF expressions costing ~3× the FSM itself;
    the fused path is row-equal by test. Other engines keep
    parse → finalize → flatten (the reference decomposition).
    """
    engine = kw.get("engine", "packed")
    if engine in ("packed", "packed-pandas") and not kw.get(
        "shuffle_partitions"
    ):
        proj = dkernel.packed_projection(documents)
        if engine == "packed":
            # vectorized kernel (operators/vkernel.py): RE2 classify +
            # numpy segmented cumsums + arrow-side joins — strings never
            # become Python objects (~2.7x the pandas fused kernel)
            from ..operators import vkernel

            return proj.mapInArrow(
                vkernel.parse_docs_flat_arrow, schema=schema.FLAT_SPAN_SEQ
            )
        return proj.mapInPandas(
            dkernel.parse_docs_flat, schema=schema.FLAT_SPAN_SEQ
        )
    return _flatten.flat_spans(extract_questions(documents, **kw))


def extract_question_scalars(documents: DataFrame) -> DataFrame:
    """documents → per-question scalar columns (doc_id, seq,
    question_number, question_type, question_text, answer_text,
    anomaly_score) via the vectorized kernel — the flagship query's
    projection without materializing nested options/images/anomalies.
    For the full QUESTION_FINAL entity table use extract_questions."""
    from ..operators import vkernel

    proj = dkernel.packed_projection(documents)
    return proj.mapInArrow(
        vkernel.question_scalars_arrow, schema=schema.QUESTION_SCALARS
    )
