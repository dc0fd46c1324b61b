"""PII redaction semantics + Spark⇄DuckDB regex parity.

The oracle-graded pii query depends on Java regex and RE2 producing
byte-identical matches for every PII_PATTERNS entry; the parity test here
localizes any divergence to the exact pattern and input.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import pii

SAMPLES = [
    "reach me at jane.doe+spam@mail.example.org or at work",
    "card 1234-5678-9012-3456 expires soon",
    "ssn 123-45-6789 on file",
    "call 555-867-5309 after 5pm",
    "host 192.168.0.1 and 10.0.0.255 are up",
    "no pii here at all",
    "overlap 123-45-6789 and 555.867.5309 and a@b.co",
    "digits 1234567890123456 without separators",
    "",
    "edge a@b.c x@y.zz trailing@dot.com.",
]


def _spark_rows(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], ["i", "t"])
    cols = [
        pii.pii_count(F.col("t"), k).alias(f"n_{k}")
        for k, _, _ in pii.PII_PATTERNS
    ]
    return (
        df.select("i", pii.redact_pii(F.col("t")).alias("red"), *cols)
        .orderBy("i")
        .collect()
    )


def test_redaction_semantics(spark):
    rows = _spark_rows(spark)
    red = [r.red for r in rows]
    assert red[0] == "reach me at <EMAIL> or at work"
    assert red[1] == "card <CARD> expires soon"
    assert red[2] == "ssn <SSN> on file"
    assert red[3] == "call <PHONE> after 5pm"
    assert red[4] == "host <IP> and <IP> are up"
    assert red[5] == "no pii here at all"
    assert red[7] == "digits 1234567890123456 without separators"
    assert rows[6].n_ssn == 1 and rows[6].n_phone == 1 and rows[6].n_email == 1


def test_counts_match_redactions(spark):
    rows = _spark_rows(spark)
    for r in rows:
        total = sum(r[f"n_{k}"] for k, _, _ in pii.PII_PATTERNS)
        placeholders = sum(
            r.red.count(repl) for _, _, repl in pii.PII_PATTERNS
        )
        assert placeholders == total, (r.i, r.red)


def test_duckdb_parity(spark):
    spark_rows = {r.i: (r.red, *(r[f"n_{k}"] for k, _, _ in pii.PII_PATTERNS)) for r in _spark_rows(spark)}
    con = duckdb.connect()
    con.register("s", pd.DataFrame({"i": range(len(SAMPLES)), "t": SAMPLES}))
    counts = ", ".join(
        f"CAST({pii.duck_pii_count('t', k)} AS INTEGER)"
        for k, _, _ in pii.PII_PATTERNS
    )
    duck_rows = {
        row[0]: tuple(row[1:])
        for row in con.sql(
            f"SELECT i, {pii.duck_redact_pii('t')}, {counts} FROM s"
        ).fetchall()
    }
    assert spark_rows == duck_rows
