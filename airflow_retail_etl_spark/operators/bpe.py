"""Distributed BPE merge learning (tokenizer training on the corpus).

Byte-pair encoding training is the canonical "needs the whole corpus"
tokenizer step: repeatedly find the most frequent adjacent symbol pair
and merge it everywhere. The classic implementation is single-machine
(a dict of word counts); this one keeps the corpus distributed:

- state is the WORD-SHAPE table (distinct word → weight), orders of
  magnitude smaller than the corpus and the only thing the loop touches;
- each round is one aggregation (pair counts, map-side combined) plus a
  one-ROW driver action (the argmax pair — never data rows), then an HOF
  rewrite of the symbol arrays and an eager localCheckpoint so 50 rounds
  don't build a 50-deep lazy plan;
- greedy left-to-right merge semantics inside a word match the reference
  BPE algorithm (overlaps consume: "aaa" + merge(a,a) → ["aa","a"]),
  pinned against a pure-Python reference implementation in tests.

Rounds are inherently sequential (merge i+1's counts depend on merge i),
so wall-clock is rounds × one-aggregation latency; each aggregation is
fully parallel. The driver transfer is O(1) per round — this is the same
iterate-with-checkpoint shape as dedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from airflow_retail_etl_spark.functions.partitioning import _spread_id
from airflow_retail_etl_spark.functions.text import normalize_text, tokens

#: end-of-word sentinel (classic BPE: lets merges learn word endings)
EOW = "</w>"


def word_shapes(df: DataFrame, text_col: str) -> DataFrame:
    """(word, weight) with each word as its char-symbol array + EOW."""
    toks = df.select(
        tokens(normalize_text(F.col(text_col))).alias("toks")
    ).select(F.explode("toks").alias("word"))
    counted = (
        toks.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
    )
    symbols = F.concat(
        F.split(F.col("word"), ""),  # chars
        F.array(F.lit(EOW)),
    )
    return counted.select(symbols.alias("syms"), "weight")


def _pair_counts(shapes: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.try_element_at("syms", i).alias("a"),
            F.try_element_at("syms", i + 1).alias("b"),
        ),
    )
    # a fully-merged word has ONE symbol; sequence(1, 0) DESCENDS in Spark
    # (the repetition.ngrams_all trap), so guard the empty case explicitly
    pairs = F.when(F.size("syms") >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )
    return (
        shapes.select(F.explode(pairs).alias("p"), "weight")
        .groupBy("p.a", "p.b")
        .agg(F.sum("weight").alias("n"))
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) inside ``syms``."""
    merged = a + b
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    df: DataFrame, text_col: str, *, n_merges: int = 32
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ranked
    merge list (the tokenizer artifact). Ties break lexicographically so
    the result is deterministic across layouts and engines."""
    shapes = word_shapes(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(shapes)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] is None:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        shapes = shapes.select(
            _merge_expr(a, b).alias("syms"), "weight"
        ).localCheckpoint(eager=True)
    return merges


#: token/word boundary markers for the string-form merge pass. Both are
#: outside normalized text's alphabet by construction; a literal "</w>"
#: in text char-splits into <,/,w,> so it can never collide with EOW.
_SEP = "•"  # • wraps every symbol: •sym•
_WSEP = "‖"  # ‖ joins words, so merges cannot cross word boundaries


def apply_bpe(
    df: DataFrame, text_col: str, id_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize with a learned merge list: (id, bpe_tokens, n_bpe_tokens).

    Merges apply in learned order as chained NATIVE string replaces over
    a boundary-marked form (each symbol wrapped ``•sym•``, words joined
    by ``‖``): ``replace`` resumes scanning after each match, which IS
    the greedy left-to-right merge of the training fold — the
    equivalence is pinned by tests and the DuckDB oracle, and native
    replace stays inside whole-stage codegen where the equivalent nested
    HOF folds (one per merge) ran interpreted and ~5× slower. No
    shuffles; the merge list is a plan constant, exactly how a trained
    tokenizer ships."""
    wrapped_word = lambda w: F.concat(  # noqa: E731  # •c••c•…••</w>•
        F.lit(_SEP),
        F.array_join(F.split(w, ""), _SEP + _SEP),
        F.lit(_SEP + _SEP + EOW + _SEP),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        tokens(normalize_text(F.col(text_col))).alias("toks"),
    ).transform(_spread_id)
    s = F.array_join(
        F.transform(F.col("toks"), wrapped_word), _WSEP
    )
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(f"{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}"),
            F.lit(f"{_SEP}{a}{b}{_SEP}"),
        )
    joined = F.btrim(
        F.replace(
            F.replace(s, F.lit(_WSEP), F.lit("")),
            F.lit(_SEP + _SEP),
            F.lit(_SEP),
        ),
        F.lit(_SEP),
    )
    # the merge chain feeds three output expressions; materialize it once
    # behind an exchange instead of evaluating the replaces per reference
    mid = base.select("id", joined.alias("j")).transform(_spread_id)
    toks_out = F.when(
        F.length("j") == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.col("j"), _SEP))
    return mid.select(
        "id",
        toks_out.alias("bpe_tokens"),
        F.size(toks_out).alias("n_bpe_tokens"),
    )
