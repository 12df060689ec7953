"""Temporal joins Spark has no built-in operator for: as-of join and
bounded range join, composed from shuffle-friendly primitives.

The reference is batch-and-timeless (SURVEY.md §2: no temporal
operators exist there), but an event-stream analytics engine needs
both — and the naive formulations are non-starters at 100 TB:

- a correlated "latest row before t" subquery per probe row is a
  per-row range scan;
- an inequality-only join (``a.ts <= b.ts < a.ts + w``) plans as a
  BroadcastNestedLoopJoin — quadratic in the partition.

Instead:

- :func:`asof_join` — union both sides, ONE window pass per key
  (carry the last right-side payload forward), filter back to left
  rows. Cost: one shuffle on the join key + a per-key sort; no range
  probe, no self-join. DuckDB's native ``ASOF JOIN`` is the oracle
  (driver query ``asof_attribution``).
- :func:`range_join` — coarse time-bin equi-join then exact filter:
  each right row joins at most 2 bins (bin width = the range width),
  so the join stays an equi-join a hash shuffle can route, and the
  inequality is a cheap post-filter. Linear output + linear fan-out,
  never a nested-loop plan (plan-asserted in tests).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_payload: Sequence[str] = ("event_id",),
    suffix: str = "_matched",
    how: str = "inner",
    chunk_micros: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row
    of the same ``on`` key with ``right.ts <= left.ts`` (inclusive —
    a right row exactly at the probe instant matches, same as DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``). With ``how="inner"`` left
    rows with no prior right row are dropped; ``how="left"`` keeps
    them with null payload (DuckDB ``ASOF LEFT JOIN``) — same plan,
    the final filter is simply skipped.

    Mechanics: right rows get marker 0, left rows marker 1; the union
    sorts per key by (ts, marker) so at equal ts the right row lands
    first; ``last(payload, ignorenulls=True)`` over an unbounded-
    preceding window carries the newest right payload onto every
    subsequent left row. ONE hash shuffle on ``on`` + a per-key sort;
    window state is one row of payload, so key cardinality (users)
    spreads across executors and no per-row range probe exists.

    **Hot-key salting** (r8, VERDICT r7 watch-item): one pathological
    key (10⁷ events for one user) serializes its whole timeline onto a
    single window task. Pass ``chunk_micros`` to partition each key's
    timeline into fixed time chunks and run the SAME carry in two
    phases (the chunked-kernel / packing prefix-sum pattern): a window
    per (key, chunk) — parallel across chunks — then a per-(key,
    chunk) last-right-state table (tiny: one row per non-empty chunk)
    whose running carry re-seeds every chunk's rows through an
    equi-join. Row-identical to the single-window plan whenever no two
    right rows of a key share an exact timestamp (where the single
    window's own pick is partition-order-dependent anyway); the
    default None keeps the exact single-window plan. Pick the chunk so
    a hot key's densest chunk holds ~10⁵-10⁶ rows; empty chunks cost
    nothing (the spine only materializes observed (key, chunk) pairs).
    """
    rp = list(right_payload)
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_m"),
        *[F.col(c).alias(c + suffix) for c in rp],
        F.col(ts).alias(ts + suffix),
    )
    matched = [c + suffix for c in rp] + [ts + suffix]
    l = left.select(
        "*", F.lit(1).alias("_m"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in matched],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be inner|left, got {how!r}")
    keep = [c for c in left.columns]

    if chunk_micros:
        u = u.withColumn(
            "_ck",
            F.floor(F.unix_micros(F.col(ts)) / F.lit(int(chunk_micros))),
        )
        w1 = (
            Window.partitionBy(on, "_ck")
            .orderBy(F.col(ts).asc(), F.col("_m").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = u.select(
            "*",
            *[
                F.last(c, ignorenulls=True).over(w1).alias(c + "_c")
                for c in matched
            ],
        )
        # last right state per non-empty chunk: max(struct(ts, ...))
        # = the newest right row (ties on exact ts break by payload —
        # the single-window pick is unspecified there, see docstring)
        chunk_last = (
            u.where(F.col("_m") == 0)
            .groupBy(on, "_ck")
            .agg(
                F.max(
                    F.struct(F.col(ts).alias("_t"), *matched)
                ).alias("_st")
            )
        )
        # chunk spine = every observed (key, chunk); running carry of
        # the PRECEDING chunks' last state — rows = #non-empty chunks,
        # orders of magnitude below the event count
        spine = u.select(on, "_ck").distinct().join(
            chunk_last, [on, "_ck"], "left"
        )
        w2 = (
            Window.partitionBy(on)
            .orderBy("_ck")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = spine.select(
            on,
            "_ck",
            F.last("_st", ignorenulls=True).over(w2).alias("_prev"),
        )
        out = (
            carried.filter(F.col("_m") == 1)
            .join(prev, [on, "_ck"], "left")
            .select(
                "*",
                *[
                    F.coalesce(F.col(c + "_c"), F.col("_prev")[c]).alias(
                        c + "_f"
                    )
                    for c in matched
                ],
            )
        )
        if how == "inner":
            out = out.filter(F.col(ts + suffix + "_f").isNotNull())
        return out.select(
            *keep, *[F.col(c + "_f").alias(c) for c in matched]
        )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_m").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c + "_c")
            for c in matched
        ],
    )
    out = carried.filter(F.col("_m") == 1)
    if how == "inner":
        out = out.filter(F.col(ts + suffix + "_c").isNotNull())
    return out.select(
        *keep, *[F.col(c + "_c").alias(c) for c in matched]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    window_sec: int = 3600,
    right_payload: Sequence[str] = ("event_id",),
    suffix: str = "_after",
) -> DataFrame:
    """Bounded-interval pairs: every (left, right) pair of the same
    key with ``left.ts <= right.ts < left.ts + window_sec``.

    The inequality is made routable by binning: with bin width =
    ``window_sec``, a qualifying right row's bin is either the left
    row's bin or the next one, so the right side explodes ×2 to
    (bin, bin-1) and the join is a plain equi-join on (key, bin) —
    hash-partitionable, AQE-skew-splittable, output-linear. The exact
    inequality filters after the join; no nested-loop plan appears
    (plan-asserted in tests/test_temporal.py).
    """
    us = int(window_sec) * 1_000_000

    def _idiv(c):
        # exact long floor-division (epoch_us is non-negative and
        # far below 2^53, so the double round-trip is exact)
        return ((c - c % us) / us).cast("long")

    lb = left.select(
        "*", _idiv(F.unix_micros(F.col(ts))).alias("_bin")
    )
    rb = right.select(
        F.col(on),
        F.unix_micros(F.col(ts)).alias("_r_us"),
        *[F.col(c).alias(c + suffix) for c in right_payload],
    ).select(
        "*",
        F.explode(
            F.array(_idiv(F.col("_r_us")), _idiv(F.col("_r_us")) - 1)
        ).alias("_bin"),
    )
    j = lb.join(rb, [on, "_bin"])
    lt = F.unix_micros(F.col(ts))
    out = j.filter((F.col("_r_us") >= lt) & (F.col("_r_us") < lt + us))
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(c + suffix) for c in right_payload],
        F.col("_r_us").alias(ts + suffix + "_us"),
    )
