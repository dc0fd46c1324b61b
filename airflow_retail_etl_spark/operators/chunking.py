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


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    rate: float = 0.5,
    min_chars: int = 32,
    seed: str = "fim",
    keep_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, the PSM
    permutation): for a deterministic ``rate`` fraction of documents,
    pick two interior cut points and emit
    ``<pre>prefix<suf>suffix<mid>middle`` — the data-side augmentation
    that teaches infilling to a left-to-right LM "for free". Code-model
    pipelines run this over the whole corpus at a fixed rate; it
    belongs beside chunk/pack because it must happen BEFORE packing
    (the permuted doc is what gets packed).

    Everything is a per-row projection — zero shuffle, membership and
    cut points are pure functions of (seed, doc id) via the engine's
    md5-u64 draw family (layout/rerun/engine invariant, exact integer
    threshold `u < rate·2^64`, cut draws `1 + u mod (L−1)`), and
    coordinates index the NORMALIZED text (the span-family contract),
    so the output is a fixed point of normalize_text for downstream
    chunk/pack stages (the sentinels are LOWERCASE and whitespace-free
    precisely so re-normalization is the identity — uppercase markers
    would be silently case-folded downstream). ``keep_cols`` pass
    through unchanged, keeping pipeline composition a pure projection.
    Docs shorter than ``min_chars`` normalized chars
    (or < 2 chars) pass through unchanged. Returns (id, fim_applied,
    prefix_len, middle_len, suffix_len, fim_text); lens are NULL on
    pass-through rows; prefix/suffix are never empty and an empty
    middle (lo == hi) is legal — the model must learn "nothing to
    fill" too.
    """
    from airflow_retail_etl_spark.functions import xhash
    from airflow_retail_etl_spark.operators.sampling import threshold_for

    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if min_chars < 2:
        raise ValueError(f"min_chars must be >= 2, got {min_chars}")

    def draw(tag: str) -> F.Column:
        return xhash.md5_u64(
            F.concat_ws(
                "\x1f",
                F.lit(f"{seed}:{tag}"),
                F.col(id_col).cast("string"),
            )
        )

    # NULL docs normalize to NULL — coalesce so they take the
    # pass-through branch with fim_applied = false, not NULL
    t = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    ln = F.length(t)
    thr = F.lit(str(threshold_for(rate))).cast("decimal(21,0)")
    applied = (ln >= F.lit(min_chars)) & (draw("apply") < thr)
    # NULLIF guards the ln == 1 pass-through rows (mod 0 is an ANSI
    # error even in a branch both engines might pre-evaluate); applied
    # requires ln >= min_chars >= 2, so real cuts never see the NULL
    div = F.nullif((ln - F.lit(1)).cast("decimal(20,0)"), F.lit(0).cast("decimal(20,0)"))
    c1 = (F.lit(1) + F.pmod(draw("p1"), div)).cast("int")
    c2 = (F.lit(1) + F.pmod(draw("p2"), div)).cast("int")
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    prefix = F.substring(t, F.lit(1), lo)
    middle = F.substring(t, lo + F.lit(1), hi - lo)
    suffix = F.substring(t, hi + F.lit(1), ln - hi)
    fim_text = F.concat(
        F.lit("<pre>"), prefix, F.lit("<suf>"), suffix, F.lit("<mid>"), middle
    )
    return df.select(
        F.col(id_col),
        *[F.col(c_) for c_ in keep_cols],
        applied.alias("fim_applied"),
        F.when(applied, lo).alias("prefix_len"),
        F.when(applied, hi - lo).alias("middle_len"),
        F.when(applied, ln - hi).alias("suffix_len"),
        F.when(applied, fim_text).otherwise(t).alias("fim_text"),
    )
