"""JSONL corpus ingest/egress — the LLM training-data interchange format.

Web-scale corpora (Common Crawl derivatives, RedPajama/Dolma-style
releases) ship as JSON Lines: one document object per line. The
Spark-native reader below is the S1-analogue for that world (same
explicit-schema / corrupt-capture / empty-guard discipline as
``csv_events.read_events_csv``):

- EXPLICIT schema, never inference: schema inference is a full extra
  pass over the corpus, and a drifting field type silently rewrites the
  schema mid-dataset. Callers pass the contract; violations land in the
  corrupt-record column instead of mutating the schema.
- PERMISSIVE + ``_corrupt_record``: a torn line (truncated upload,
  invalid UTF-8 escape, schema violation) yields one quarantine row, not
  a failed 100 TB job. ``split_valid`` separates the streams so the bad
  lines can be landed for forensics — malformed-rate is itself a
  data-quality signal.
- splittability: uncompressed and zstd/bzip2 JSONL split by input
  ranges, so a single huge file still fans out across executors; gzip
  does NOT split (one task per .gz file) — the writer therefore
  defaults to zstd.

Line-per-doc also means the format needs no multiline parsing: Spark's
text-input splits align to newlines, making JSONL the only JSON layout
that scales horizontally. (Nested JSON *values* inside a line are fine —
the schema can be arbitrarily deep.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema-explicit JSONL scan with corrupt-line quarantine.

    The returned frame carries ``corrupt_col`` (NULL for clean rows);
    pass it through ``split_valid`` to separate the streams.

    Implementation: text scan + ``from_json`` rather than
    ``spark.read.json`` — same single pass and the same PERMISSIVE
    semantics, but the corrupt column is an ordinary derived field, so
    downstream queries may reference it alone (the raw-JSON reader
    raises QUERY_ONLY_CORRUPT_RECORD_COLUMN for that, and its documented
    cache() workaround is a non-starter on a 100 TB corpus).
    """
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType())]
        )
    parsed = F.from_json(
        F.col("value"),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    return (
        spark.read.text(path)
        .select(parsed.alias("__j"))
        .select("__j.*")
    )


def split_valid(
    df: DataFrame, *, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_lines)."""
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """JSONL sink with a SPLITTABLE-on-re-read codec.

    Default: zstd where the Hadoop native codec is loaded, else bzip2
    (pure-Java, always present). Both re-read with input-range splits;
    gzip does NOT — a 100 GB .json.gz re-reads as ONE task — so it is
    deliberately not the default even though it is always available.
    """
    if compression is None:
        jvm = df.sparkSession._jvm
        compression = (
            "zstd"
            if jvm.org.apache.hadoop.util.NativeCodeLoader.isNativeCodeLoaded()
            else "bzip2"
        )
    df.write.mode(mode).option("compression", compression).json(path)
