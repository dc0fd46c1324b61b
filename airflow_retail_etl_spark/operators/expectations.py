"""Data-quality expectations: declarative row contracts with quarantine
routing and a single-scan audit report.

The reference enforces its data contract implicitly — ``dropna`` on the
raw frame, hard-coded ``fillna`` defaults, and an empty-input guard
(reference ``dags/retail_pipeline_assets.py:41-47``; our S1/P4 surface
``sources/csv_events.py`` FILL_DEFAULTS + EmptyInputError). This module
makes that contract EXPLICIT: a pipeline declares named row
expectations, every row is annotated with the exact rules it violates,
violating rows route to a quarantine table instead of silently
vanishing, and one aggregation-only pass produces the per-rule audit
(the Delta-Live-Tables "expectations" idea, re-expressed as plain
DataFrame algebra with no engine extension).

Design for 100 TB:
- Rule evaluation is a pure PROJECTION — every predicate is a Catalyst
  column expression inside whole-stage codegen; annotating N rules adds
  zero shuffles and zero Python.
- :func:`expectation_report` is ONE map-side-combined aggregation (a
  conditional SUM per rule) followed by a constant-size unpivot — a
  single scan regardless of rule count.
- Non-row-local rules (e.g. key uniqueness) are deliberately separate
  (:func:`uniqueness_violations`): they need a keyed shuffle, and hiding
  a shuffle inside a "row contract" API is how accidental 100 TB
  re-partitions happen. The function makes the cost visible.
- Quarantine routing is two filters over one annotated frame — with
  lazy evaluation both sides reuse the same scan; no row is dropped
  unrecorded (the delta from the reference's silent ``dropna``).
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the annotation column added by apply_expectations
VIOLATIONS_COL = "dq_violations"

#: rule names double as SQL identifiers (aggregate aliases and stack()
#: literals in expectation_report) — restrict them up front
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

#: report-internal column names a rule must not shadow
_RESERVED_NAMES = frozenset({"_total", "_rows"})


def _validate_rules(rules: Sequence["Expectation"], fn: str) -> None:
    """Shared rule-list validation (round-12 advice): names are
    interpolated unescaped into ``expectation_report``'s ``stack()``
    string and used as aggregate aliases, so a non-identifier breaks
    parsing and ``_total``/``_rows`` silently collide with the report's
    internal columns. Fail fast with the offending name instead."""
    if not rules:
        raise ValueError(f"{fn}: empty rule list")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")
    for n in names:
        if not _NAME_RE.match(n):
            raise ValueError(
                f"{fn}: rule name {n!r} is not a valid identifier "
                "(must match ^[A-Za-z_][A-Za-z0-9_]*$)"
            )
        if n in _RESERVED_NAMES:
            raise ValueError(
                f"{fn}: rule name {n!r} is reserved for report-internal "
                "columns"
            )


@dataclass(frozen=True)
class Expectation:
    """A named row contract: ``predicate`` must hold (be TRUE) for the
    row to pass. NULL predicate results count as violations (ANSI
    three-valued logic would otherwise let NULLs slip through the NOT)."""

    name: str
    predicate: Column


def expect(name: str, predicate: Column | str) -> Expectation:
    """Build an :class:`Expectation`; ``predicate`` may be a SQL string
    (parsed once with ``F.expr``) or a Column."""
    col = F.expr(predicate) if isinstance(predicate, str) else predicate
    return Expectation(name, col)


def _passes(e: Expectation) -> Column:
    # NULL-safe: a NULL predicate is a violation, not a pass
    return F.coalesce(e.predicate.cast("boolean"), F.lit(False))


def apply_expectations(
    df: DataFrame, rules: Sequence[Expectation]
) -> DataFrame:
    """Annotate every row with the SORTED comma-joined names of the
    rules it violates (empty string = clean row). A pure projection:
    one array literal of conditional names, compacted and joined —
    whole-stage codegen, no shuffle, no Python."""
    _validate_rules(rules, "apply_expectations")
    tagged = F.array(
        *[F.when(~_passes(r), F.lit(r.name)) for r in rules]
    )
    compact = F.array_sort(
        F.filter(tagged, lambda x: x.isNotNull())
    )
    return df.withColumn(
        VIOLATIONS_COL, F.array_join(compact, ",")
    )


def split_quarantine(
    df: DataFrame, rules: Sequence[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): two filters over one annotated frame. The
    quarantined side keeps the violation annotation so the quarantine
    table is self-describing; the clean side drops it."""
    annotated = apply_expectations(df, rules)
    clean = annotated.filter(F.col(VIOLATIONS_COL) == "").drop(
        VIOLATIONS_COL
    )
    bad = annotated.filter(F.col(VIOLATIONS_COL) != "")
    return clean, bad


def expectation_report(
    df: DataFrame, rules: Sequence[Expectation], *, rate_dp: int = 6
) -> DataFrame:
    """Per-rule audit in ONE aggregation-only scan: (rule, violations,
    rows, violation_rate) + a ``_total`` row counting rows that violate
    ANY rule. Rates are one exact-integer division rounded to
    ``rate_dp`` before publication (the ratio policy)."""
    _validate_rules(rules, "expectation_report")
    aggs = [
        F.sum(F.when(~_passes(r), 1).otherwise(0))
        .cast("long")
        .alias(r.name)
        for r in rules
    ]
    any_pass = _passes(rules[0])
    for r in rules[1:]:
        any_pass = any_pass & _passes(r)
    aggs.append(
        F.sum(F.when(~any_pass, 1).otherwise(0))
        .cast("long")
        .alias("_total")
    )
    aggs.append(F.count(F.lit(1)).cast("long").alias("_rows"))
    one = df.agg(*aggs)
    stack_items = ", ".join(
        f"'{n}', {n}" for n in [*[r.name for r in rules], "_total"]
    )
    n_out = len(rules) + 1
    return one.select(
        F.expr(
            f"stack({n_out}, {stack_items}) AS (rule, violations)"
        ),
        F.col("_rows").alias("rows"),
    ).select(
        "rule",
        "violations",
        "rows",
        F.round(
            F.col("violations").cast("double") / F.col("rows"), rate_dp
        ).alias("violation_rate"),
    )


def uniqueness_violations(
    df: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows whose key occurs more than once — the non-row-local
    expectation, kept separate because it costs a keyed shuffle (one
    count aggregation on ``keys``, then a semi join back; both sides
    shuffle on the same key so AQE plans one exchange each). Returns
    the offending rows with a ``dup_count`` column."""
    counts = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
    return df.join(counts, list(keys))
