"""Event-time streaming aggregations with watermarks, plus a custom
stateful operator for line-grained streaming ingestion.

The reference is batch-only (SURVEY.md §2.8: no watermarks/session
windows exist there), but a 100 TB ingestion pipeline consumes span
streams; these are the streaming building blocks:

- :func:`windowed_event_counts` — tumbling event-time windows with a
  watermark bounding state and dropping late data (the standard
  "metrics rollup" shape for extraction-metric streams);
- :func:`sessionize_stream` — session windows keyed by user with a
  gap timeout (the time-based cousin of the anchor-based FSM
  sessionization);
- :func:`stateful_doc_assembler` — applyInPandasWithState: reassembles
  documents from a stream of individual spans (doc_id, span) and emits
  a completed document row once a document goes quiet for
  ``timeout_ms`` — the custom stateful operator for sources that
  deliver spans incrementally instead of packed rows. Downstream, the
  normal batch pipeline parses the emitted packed rows.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window counts per event_type; state bounded by the
    watermark, late rows beyond it dropped."""
    # watermarks require TIMESTAMP (not NTZ)
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user with a gap timeout."""
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


ASSEMBLED = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_spans", T.IntegerType(), False),
        T.StructField("spans_json", T.StringType(), False),
    ]
)

_STATE = T.StructType(
    [T.StructField("buf", T.StringType(), True)]
)


def stateful_doc_assembler(
    span_stream: DataFrame, timeout_ms: int = 1000
) -> DataFrame:
    """Span stream (doc_id, kind, text, media_ref, offset) → packed
    document rows via applyInPandasWithState (processing-time timeout =
    "document went quiet")."""

    def assemble(key, pdfs, state):
        import json

        if state.hasTimedOut:
            (buf,) = state.get
            state.remove()
            spans = json.loads(buf) if buf else []
            spans.sort(key=lambda s: s["offset"])
            yield pd.DataFrame(
                [(key[0], len(spans), json.dumps(spans))],
                columns=["doc_id", "n_spans", "spans_json"],
            )
            return

        existing = json.loads(state.get[0]) if state.exists else []
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                existing.append(
                    {
                        "kind": r["kind"],
                        "text": r["text"] or "",
                        "media_ref": r["media_ref"] or "",
                        "offset": int(r["offset"]),
                    }
                )
        state.update((json.dumps(existing),))
        state.setTimeoutDuration(timeout_ms)
        return
        yield  # pragma: no cover

    return span_stream.groupBy("doc_id").applyInPandasWithState(
        assemble,
        outputStructType=ASSEMBLED,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def assembled_documents(assembled: DataFrame) -> DataFrame:
    """Assembler output (doc_id, n_spans, spans_json) → packed
    DOCUMENT_SPANS rows, so finished documents flow straight into the
    vectorized batch kernel (``pipeline.extract_questions`` /
    ``extract_flat_spans``) INSIDE the same streaming query — the
    stateful op is the only stateful stage; everything after it is a
    stateless mapInArrow, which Structured Streaming permits in append
    mode. This is how the streaming and batch paths share vkernel."""
    from .. import schema as _schema

    span_type = _schema.DOCUMENT_SPANS["spans"].dataType
    return assembled.select(
        "doc_id",
        F.from_json("spans_json", span_type).alias("spans"),
        "n_spans",
    )
