"""As-of and bounded range joins: equality vs a brute-force reference
and the no-nested-loop / single-shuffle plan guarantees."""

import itertools

from pyspark.sql import functions as F

from pdf_parser_python_spark.operators.temporal import asof_join, range_join


def _events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def test_asof_join_matches_bruteforce(spark):
    ev = _events(spark)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    got = {
        (r.event_id, r.event_id_matched)
        for r in asof_join(p, v, right_payload=("event_id",)).collect()
    }

    views = sorted(
        ((r.user_id, r.ts, r.event_id) for r in v.collect()),
        key=lambda t: (t[0], t[1]),
    )
    by_user = {
        u: sorted((ts, eid) for _, ts, eid in g)
        for u, g in itertools.groupby(views, key=lambda t: t[0])
    }
    expected = set()
    for r in p.collect():
        prior = [
            (ts, eid)
            for ts, eid in by_user.get(r.user_id, [])
            if ts <= r.ts
        ]
        if prior:
            expected.add((r.event_id, prior[-1][1]))
    assert got == expected and len(got) > 50


def test_asof_join_plan_single_shuffle_no_range_probe(spark):
    ev = _events(spark)
    p = ev.filter(F.col("event_type") == "purchase")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    plan = (
        asof_join(p, v, right_payload=("event_id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # one hash shuffle on the key for the window, nothing else
    assert plan.count("hashpartitioning(user_id") == 1


def test_range_join_matches_bruteforce_and_edges(spark):
    # hand-built edge set: boundary-inclusive start, exclusive end,
    # cross-bin pairs (the explode(bin, bin-1) path), other-user noise
    rows_a = [(1, 100, 0), (2, 101, 5_000_000), (3, 101, 0)]
    rows_b = [
        (10, 100, 0),            # gap 0 → included (ts >= start)
        (11, 100, 3_600_000_000),  # exactly +1 h → EXCLUDED
        (12, 100, 3_599_999_999),  # 1 µs inside → included
        (13, 101, 3_500_000_000),  # in range of id 2 AND id 3
        (14, 999, 1),            # other user
    ]
    a = spark.createDataFrame(
        [(i, u, ts) for i, u, ts in rows_a],
        "event_id long, user_id long, us long",
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    b = spark.createDataFrame(
        [(i, u, ts) for i, u, ts in rows_b],
        "event_id long, user_id long, us long",
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "event_id")
    got = {
        (r.event_id, r.event_id_after)
        for r in range_join(a, b, right_payload=("event_id",)).collect()
    }
    assert got == {(1, 10), (1, 12), (2, 13), (3, 13)}


def test_range_join_plan_is_equi_join(spark):
    ev = _events(spark)
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    plan = (
        range_join(c, p, right_payload=("event_id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_left_join_keeps_unmatched(spark):
    """how="left" keeps probe rows with no prior right row (null
    payload), and matched rows equal the inner variant exactly."""
    a = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 10), (3, 2, 100)],
        "event_id long, user_id long, us long",
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    b = spark.createDataFrame(
        [(10, 1, 50)],
        "event_id long, user_id long, us long",
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "event_id")

    left = {
        (r.event_id, r.event_id_matched)
        for r in asof_join(
            a, b, right_payload=("event_id",), how="left"
        ).collect()
    }
    # id 1 matches (50 <= 100); id 2 predates every right row; user 2
    # has no right rows at all — both survive with null payload
    assert left == {(1, 10), (2, None), (3, None)}

    inner = {
        (r.event_id, r.event_id_matched)
        for r in asof_join(a, b, right_payload=("event_id",)).collect()
    }
    assert inner == {(1, 10)}
