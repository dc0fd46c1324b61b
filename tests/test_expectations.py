"""Declarative data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators import expectations as dq


def _frame(spark):
    rows = [
        (1, "view", 10.0, "u1"),
        (2, None, 5.0, "u2"),          # null type → type_known fails
        (3, "purchase", -2.0, "u3"),   # negative value
        (4, "weird", 1.0, None),       # bad type AND null user
        (5, "cart", None, "u5"),       # null value passes nonneg rule
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, user string"
    )


def _rules():
    return [
        dq.expect(
            "type_known", "event_type IN ('view','cart','purchase')"
        ),
        dq.expect("nonneg_value", "value IS NULL OR value >= 0"),
        dq.expect("user_present", F.col("user").isNotNull()),
    ]


def test_annotation_names_sorted_and_null_safe(spark):
    """Violation strings are the SORTED failing-rule names; a NULL
    predicate result (null event_type in an IN list — ANSI three-valued
    logic) counts as a violation, not a silent pass."""
    out = {
        r.event_id: r.dq_violations
        for r in dq.apply_expectations(_frame(spark), _rules()).collect()
    }
    assert out == {
        1: "",
        2: "type_known",
        3: "nonneg_value",
        4: "type_known,user_present",
        5: "",
    }


def test_split_quarantine_partitions_exactly(spark):
    clean, bad = dq.split_quarantine(_frame(spark), _rules())
    assert sorted(r.event_id for r in clean.collect()) == [1, 5]
    assert sorted(r.event_id for r in bad.collect()) == [2, 3, 4]
    assert dq.VIOLATIONS_COL not in clean.columns
    assert dq.VIOLATIONS_COL in bad.columns


def test_report_counts_and_total(spark):
    """Per-rule counts match brute force; _total counts rows violating
    ANY rule (not the sum of per-rule counts — row 4 violates two)."""
    rep = {
        r.rule: r
        for r in dq.expectation_report(_frame(spark), _rules()).collect()
    }
    assert rep["type_known"].violations == 2
    assert rep["nonneg_value"].violations == 1
    assert rep["user_present"].violations == 1
    assert rep["_total"].violations == 3
    assert all(r.rows == 5 for r in rep.values())
    assert rep["_total"].violation_rate == round(3 / 5, 6)


def test_annotation_is_shuffle_free(spark):
    """The contract the module docstring sells: rule evaluation is a
    pure projection — the annotated plan contains NO exchange."""
    plan = (
        dq.apply_expectations(_frame(spark), _rules())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(r"Exchange", plan), plan


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="empty rule list"):
        dq.apply_expectations(_frame(spark), [])
    with pytest.raises(ValueError, match="duplicate"):
        dq.apply_expectations(
            _frame(spark), [dq.expect("a", "1=1"), dq.expect("a", "1=1")]
        )


def test_uniqueness_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "k long, v string",
    )
    out = dq.uniqueness_violations(df, ["k"]).collect()
    assert sorted((r.k, r.dup_count) for r in out) == [
        (1, 2),
        (1, 2),
        (3, 3),
        (3, 3),
        (3, 3),
    ]


def test_rule_name_validation(spark):
    """Rule names ride into stack() SQL and aggregate aliases unescaped
    — non-identifiers and the report-internal names are rejected up
    front (round-12 advice)."""
    f = _frame(spark)
    with pytest.raises(ValueError, match="not a valid identifier"):
        dq.apply_expectations(f, [dq.expect("bad name", "1=1")])
    with pytest.raises(ValueError, match="not a valid identifier"):
        dq.expectation_report(f, [dq.expect("x'); drop", "1=1")])
    for reserved in ("_total", "_rows"):
        with pytest.raises(ValueError, match="reserved"):
            dq.expectation_report(f, [dq.expect(reserved, "1=1")])
