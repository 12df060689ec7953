"""PII detection/redaction: fixed cases, Python-re parity, plan shape."""

import re

from pyspark.sql import functions as F

from pdf_parser_python_spark.operators.redact import (
    PII_PATTERNS,
    pii_profile,
)

CASES = [
    # (text, n_email, n_ssn, n_phone, n_ipv4, redacted)
    (
        "mail a.b+c@ex-1.co and d@e.org now",
        2, 0, 0, 0,
        "mail <EMAIL> and <EMAIL> now",
    ),
    (
        "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1",
        0, 1, 1, 1,
        "ssn <SSN> phone <PHONE> ip <IPV4>",
    ),
    (
        "call (555) 123-4567 or +1 555 123 4567",
        0, 0, 2, 0,
        "call <PHONE> or <PHONE>",
    ),
    ("plain text, no pii at all", 0, 0, 0, 0, "plain text, no pii at all"),
    (
        "dotted 10.20.30.40 is an ip not a phone",
        0, 0, 0, 1,
        "dotted <IPV4> is an ip not a phone",
    ),
    (None, 0, 0, 0, 0, ""),
]


def test_fixed_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_ ) in enumerate(CASES)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_profile(df).collect()}
    for i, (t, ne, ns, np_, ni, red) in enumerate(CASES):
        r = got[i]
        assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"]) == (
            ne, ns, np_, ni,
        ), t
        assert r["redacted"] == red, t


def test_python_re_parity(spark):
    """The patterns are in the Java∩RE2 common subset; Python re agrees
    on them too — cross-check counts + redaction on generated text."""
    rows = []
    for i in range(60):
        parts = ["filler text segment"]
        if i % 2 == 0:
            parts.append(f"user{i}@host{i % 7}.net")
        if i % 3 == 0:
            parts.append(f"555-{100 + i % 900:03d}-{1000 + i:04d}")
        if i % 5 == 0:
            parts.append(f"192.168.{i % 256}.{(i * 7) % 256}")
        if i % 7 == 0:
            parts.append(f"{100 + i % 900:03d}-{10 + i % 90:02d}-{1000 + i:04d}")
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_profile(df).collect()}
    for i, text in rows:
        expect_red = text
        for k, pat, tok in PII_PATTERNS:
            assert got[i][f"n_{k}"] == len(re.findall(pat, text)), (
                k, text,
            )
            expect_red = re.sub(pat, tok, expect_red)
        assert got[i]["redacted"] == expect_red, text


def test_pii_plan_is_map_only(spark):
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("a@b.co").alias("text")
    )
    plan = pii_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
