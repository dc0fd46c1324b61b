"""Structural guards on the driver contract itself."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

#: queries that intentionally have no SQL oracle (hash-seeded candidate
#: generation with no DuckDB equivalent); each must have an exactness or
#: recall test in tests/ instead.
ROWS_ONLY = {
    "ann_ivf",
    "ann_lsh",
    "minhash_lsh_pairs",
    "neardup_cosine_lsh",
    "simhash",
}


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
