"""Structural guards on the driver contract itself."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

#: queries that intentionally have no SQL oracle. Empty since round 2: the
#: former rows-only LSH/ANN queries are now oracle-checked via cross-engine
#: md5 hash families (functions.xhash), inlined hyperplane literals, and
#: IVF integrity mode (probe-all ≡ brute force). Approximate-recall
#: behaviour of the production xxhash64/sampled paths stays pinned in
#: tests/test_dedup.py and tests/test_similarity.py.
ROWS_ONLY: set[str] = set()


def test_every_oracle_key_has_a_query():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)


def test_rows_only_set_is_exactly_declared():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) - set(o) == ROWS_ONLY


def test_oracle_sql_parses_in_duckdb(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    for name, sql in entry.oracle_sql().items():
        try:
            con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"oracle for {name} does not parse/bind: {exc}")


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()[0] == "event_date"
