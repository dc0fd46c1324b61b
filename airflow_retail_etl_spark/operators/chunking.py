"""Document chunking for LLM training-data pipelines.

Splits documents into fixed-size sliding token windows with overlap — the
standard pre-tokenization step before embedding or packing into training
sequences. Entirely built-in HOFs (sequence / transform / slice /
posexplode), so chunking a 100 TB corpus is one projection + one generate:
no shuffle at all, and the output inherits the input's partitioning by
document. Chunk counts are derived per-row from token counts — no driver
interaction, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.partitioning import spread

from airflow_retail_etl_spark.functions.text import normalize_text, tokens


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text).

    Window i covers tokens [i·stride, i·stride + chunk_size) with
    stride = chunk_size − overlap; the last window is truncated at the
    document end. n_chunks = ⌈(n_tokens − overlap) / stride⌉, floored at 1,
    so every document — including one shorter than a single chunk, or empty
    (one empty chunk) — yields at least one row and no token is dropped.

    The token array is materialized behind a repartition before the
    span-generating lambdas reference it (the Catalyst HOF re-evaluation
    trap — see dedup._with_shingles): without the exchange, CollapseProject
    would re-inline tokenization once per generated span. posexplode_OUTER
    for the same reason explode_outer is used in dedup.jaccard_pairs —
    plain explode lets InferFiltersFromGenerate push a size()>0 filter
    below the exchange, re-inlining the whole expression.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap=} {chunk_size=}"
        )
    stride = chunk_size - overlap
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("toks"),
    ).transform(lambda d: spread(d, "doc_id"))
    n = F.size("toks")
    # integer ceil((n - overlap) / stride), clamped to >= 1; values are
    # token counts (< 2^31) so the double round-trip under floor is exact
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast(
            "int"
        ),
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * F.lit(stride)
    )
    exploded = base.select(
        "doc_id",
        "toks",
        F.posexplode_outer(starts).alias("chunk_id", "start_token"),
    )
    piece = F.slice(F.col("toks"), F.col("start_token") + 1, chunk_size)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_token").cast("int").alias("start_token"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
