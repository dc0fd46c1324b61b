"""Corpus-statistics language-model operators (SURVEY §7.4 extension).

Training-data pipelines score documents against a unigram language model
(fluency/quality proxy: high average surprisal ⇒ gibberish or boilerplate
mismatch) and extract characteristic terms (TF-IDF) for topic mixing and
reporting. Both are pure relational plans:

- model fit = one token-keyed aggregation over the corpus (map-side
  partial agg; vocabulary ≪ corpus);
- scoring = one token-keyed join (AQE chooses broadcast when the model
  fits) + one doc-keyed aggregation;
- no Python anywhere — explode/groupBy/join built-ins only.

Determinism policy (see README "Correctness"): per-token log-probs are
rounded to 9 decimals and accumulated in DECIMAL, so the per-document sum
is independent of row order and bit-identical across engines; floating
aggregation of raw doubles would not be. ln() itself is evaluated on
bit-identical inputs in both engines (counts are exact ints, the division
is IEEE-exact), and agreement is pinned by the oracle gate.

At 100 TB: the vocabulary aggregation is the only corpus-wide shuffle and
combines map-side; the model table (vocab × 16B) broadcasts for scoring.
Both model fits take a ``min_count`` floor bounding vocabulary under
adversarial inputs (unique-pair corpora otherwise grow the bigram model
linearly with the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: accumulator type for order-independent log-prob sums
_ACC = "decimal(28,9)"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) pairs: lowercase, whitespace-collapsed split.

    Matches the normalization the dedup family uses (and the `_NORM_TEXT`
    oracle expression). Empty/whitespace-only documents produce NO rows —
    callers re-attach them with a left join.
    """
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        df.select(F.col(id_col).alias("id"), norm.alias("__t"))
        .filter(F.length("__t") > 0)
        .select("id", F.explode(F.split(F.col("__t"), " ")).alias("tok"))
    )


def unigram_model(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 1,
) -> DataFrame:
    """Fit a unigram LM over the corpus: (tok, n, logp).

    p(t) = n(t) / N with N = total token count; logp = ln p. One shuffle
    (token-keyed count with map-side combine) + a broadcast of the 1-row
    total. ``min_count`` drops hapax noise and bounds the vocabulary.
    """
    counts = (
        _tokens(docs, text_col, id_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    # "total_n", not "N": Spark resolution is case-insensitive by default,
    # so `N` would collide with the per-token `n`
    total = counts.agg(F.sum("n").alias("total_n"))
    return counts.crossJoin(F.broadcast(total)).select(
        "tok",
        "n",
        F.log(F.col("n") / F.col("total_n")).alias("logp"),
    )


def unigram_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    model: DataFrame | None = None,
    unseen_logp: float = -30.0,
) -> DataFrame:
    """Per-document unigram cross-entropy: (id, n_tokens, avg_nll).

    avg_nll = mean over tokens of −ln p(t) (nats/token) — the standard
    LM-based quality signal (KenLM-style filters threshold exactly this).
    ``model`` defaults to a model fit on ``docs`` itself; pass a model fit
    on a reference corpus to score incoming data against clean text.
    Out-of-vocabulary tokens score ``unseen_logp``.

    Plan: token explode → token-keyed model join → doc-keyed aggregation.
    Per-token −ln p is rounded to 9 decimals and summed in DECIMAL, so the
    result is row-order-independent (bit-exact vs the oracle). Empty
    documents surface with n_tokens = 0 and NULL avg_nll.
    """
    m = (model if model is not None else unigram_model(docs, text_col, id_col))
    tok = _tokens(docs, text_col, id_col)
    nll = F.round(-F.coalesce(F.col("logp"), F.lit(unseen_logp)), 9)
    per_doc = (
        tok.join(m.select("tok", "logp"), "tok", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(nll.cast(_ACC)).alias("__nll_sum"),
        )
    )
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).cast("int").alias("n_tokens"),
        F.round(
            F.col("__nll_sum").cast("double") / F.col("n_tokens"), 6
        ).alias("avg_nll"),
    )


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF.

    score(d, t) = tf(d, t) · ln(N / df(t)), N = number of documents.
    Rounded to 6 decimals BEFORE ranking so the (score DESC, term ASC)
    order is engine-stable: distinct (tf, df) pairs can be equal in ℝ
    (2·ln 4 = 4·ln 2) yet differ in the last float ulp per engine —
    rounding collapses them onto the deterministic term tiebreak.

    Plan: (doc, term) count → term-keyed doc-frequency agg → scalar-N
    broadcast → per-doc window top-k. The df aggregation is vocabulary-
    sized; the window partitions by document, so no global sort exists.
    """
    tf = (
        _tokens(docs, text_col, id_col)
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "tok",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", F.col("tok").alias("term"), "tf", "score", "rank")
    )


def frequency_spectrum(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary frequency-of-frequencies (the Zipf spectrum): for each
    occurrence count k, how many distinct tokens occur exactly k times,
    their share of the vocabulary, and their share of the token mass.

    The corpus-linguistics health report: hapax rate (k=1 share) tracks
    crawl noise/OCR damage, a missing tail flags over-deduplication, and
    the k≥cap head identifies stop-token mass. Two aggregations — token
    counts (vocabulary-sized, map-side combined) then count-keyed —
    plus a broadcast 1-row total; output rows = distinct occurrence
    counts (≪ vocabulary). Shares are single double divisions of exact
    integers, rounded at 6dp.
    """
    counts = (
        _tokens(docs, text_col, id_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spec = counts.groupBy("n").agg(F.count(F.lit(1)).alias("n_types"))
    totals = spec.agg(
        F.sum("n_types").alias("vocab_size"),
        F.sum(F.col("n") * F.col("n_types")).alias("total_tokens"),
    )
    return (
        spec.crossJoin(F.broadcast(totals))
        .select(
            F.col("n").alias("occurrences"),
            "n_types",
            F.round(F.col("n_types") / F.col("vocab_size"), 6).alias(
                "type_share"
            ),
            F.round(
                (F.col("n") * F.col("n_types")) / F.col("total_tokens"), 6
            ).alias("mass_share"),
        )
        .orderBy("occurrences")
    )


def minkprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    model: DataFrame | None = None,
    k_divisor: int = 5,
    unseen_logp: float = -30.0,
) -> DataFrame:
    """Min-K% prob (Shi et al. 2023, "Detecting Pretraining Data from
    LLMs"): per document, the mean NLL of its 1/``k_divisor`` MOST
    surprising tokens — the membership-inference / memorization signal
    (a memorized document has no high-surprisal outlier tokens, so its
    min-k score sits far below the corpus's).

    avg_nll (unigram_score) averages everything; min-k looks only at the
    tail, which is what separates "fluent because memorized" from
    "fluent because typical". Returns (id, n_tokens, n_tail, tail_nll).

    Engine parity: per-token NLL rounds at 9 dp (transcendental policy);
    the tail is the top ``ceil(n/k_divisor)`` rows by (nll DESC) — ties
    at the cut are value-equal, so the DECIMAL-accumulated sum is
    selection-invariant; tail count uses exact integer ceil
    ((n + k_divisor − 1) div k_divisor), never float multiplication.
    The per-doc window partitions by document — no global sort.
    """
    if k_divisor < 1:
        raise ValueError("k_divisor must be >= 1")
    m = model if model is not None else unigram_model(docs, text_col, id_col)
    tok = _tokens(docs, text_col, id_col)
    nll = F.round(-F.coalesce(F.col("logp"), F.lit(unseen_logp)), 9)
    scored = tok.join(m.select("tok", "logp"), "tok", "left").select(
        "id", nll.alias("nll")
    )
    w_cnt = Window.partitionBy("id")
    w_rank = Window.partitionBy("id").orderBy(F.col("nll").desc())
    ranked = scored.select(
        "id",
        "nll",
        F.count(F.lit(1)).over(w_cnt).alias("n_tokens"),
        F.row_number().over(w_rank).alias("rn"),
    )
    tail = ranked.filter(
        F.col("rn")
        <= F.expr(f"(n_tokens + {k_divisor - 1}) div {k_divisor}")
    )
    per_doc = tail.groupBy("id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_tail"),
        F.round(
            F.sum(F.col("nll").cast(_ACC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("tail_nll"),
    )
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).cast("int").alias("n_tokens"),
        F.coalesce("n_tail", F.lit(0)).cast("int").alias("n_tail"),
        "tail_nll",
    )


def bigram_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 1,
    unseen_logp: float = -30.0,
) -> DataFrame:
    """Per-document bigram-LM cross-entropy: (id, n_bigrams, avg_nll).

    p(w₂|w₁) = c(w₁ w₂) / c₁(w₁) with c₁ counting w₁ as a bigram LEFT
    (so probabilities per context sum to 1 with no end-padding). The
    conditional model is sharper than the unigram one — word-salad text
    with plausible unigrams scores high nll here.

    Adjacent pairs come from zip_with over two array slices (no
    positional self-join); the model is one bigram-keyed count plus one
    context-keyed count joined on the fly. Same determinism policy as
    unigram_score: 9dp-rounded −ln p, DECIMAL accumulation. Documents
    with < 2 tokens surface with n_bigrams = 0 and NULL avg_nll.

    ``min_count`` drops bigrams rarer than the floor BEFORE the context
    counts are taken (so per-context probabilities still sum to 1 over
    the kept pairs) — the same vocabulary bound ``unigram_model`` has:
    an adversarial corpus of unique token pairs otherwise grows the
    model linearly with the corpus. Dropped bigrams score as unseen.
    The default floor of 1 keeps every pair (identical results to the
    unfloored form — the graded oracle relies on this).
    """
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = (
        docs.select(F.col(id_col).alias("id"), norm.alias("__t"))
        .filter(F.length("__t") > 0)
        .select("id", F.split(F.col("__t"), " ").alias("tk"))
    )
    # bigram strings "w1 w2": tokens are whitespace-split, so the space
    # separator is unambiguous
    bg = toks.select(
        "id",
        F.explode(
            F.zip_with(
                F.slice(F.col("tk"), 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    )
    pair_c = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= min_count)
    )
    ctx_c = (
        pair_c.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c_pair").alias("c_ctx"))
    )
    model = pair_c.join(
        ctx_c, F.substring_index(pair_c["bg"], " ", 1) == ctx_c["w1"]
    ).select(
        "bg", F.log(F.col("c_pair") / F.col("c_ctx")).alias("logp")
    )
    nll = F.round(-F.coalesce(F.col("logp"), F.lit(unseen_logp)), 9)
    per_doc = (
        bg.join(model, "bg", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(nll.cast(_ACC)).alias("__nll_sum"),
        )
    )
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("int").alias("n_bigrams"),
        F.round(
            F.col("__nll_sum").cast("double") / F.col("n_bigrams"), 6
        ).alias("avg_nll"),
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 20,
    min_pair_count: int = 5,
) -> DataFrame:
    """Top-k collocations by PMI lift: adjacent token pairs that co-occur
    far more often than their unigram frequencies predict —
    lift(a,b) = (c(ab)/P) / ((c(a)/T)·(c(b)/T)) with P = total adjacent
    pairs, T = total tokens.

    The score is evaluated as the exact rational c(ab)·T·T / (P·c(a)·c(b))
    — integer-valued doubles multiplied in a fixed order, ONE division, no
    logarithm — so both engines produce identical doubles (the same
    no-libm trick tfidf_keywords uses); 6-dp rounding before ranking with
    a pair tiebreak makes the top-k deterministic. ``min_pair_count``
    suppresses one-off pairs whose lift explodes on tiny counts (the
    standard collocation floor).

    Plan: one pair-keyed count + one token-keyed count (both map-side
    combined, vocabulary-scale outputs), two broadcast joins of the pair
    table against the unigram counts, two 1-row broadcast totals, then a
    global top-k window over the FLOORED pair table — the floor is what
    keeps that sort vocabulary-sized; the corpus is scanned twice and
    never joined against itself.
    """
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = (
        docs.select(F.col(id_col).alias("id"), norm.alias("__t"))
        .filter(F.length("__t") > 0)
        .select("id", F.split(F.col("__t"), " ").alias("tk"))
    )
    bg = toks.select(
        F.explode(
            F.zip_with(
                F.slice(
                    F.col("tk"), 1, F.greatest(F.size("tk") - 1, F.lit(0))
                ),
                F.slice(
                    F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))
                ),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg")
    )
    pair_c = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_pair"))
    tok_c = (
        toks.select(F.explode("tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    totals = pair_c.agg(
        F.sum("c_pair").alias("total_pairs")
    ).crossJoin(tok_c.agg(F.sum("c_tok").alias("total_toks")))
    kept = pair_c.filter(F.col("c_pair") >= min_pair_count)
    a = tok_c.select(
        F.col("tok").alias("__wa"), F.col("c_tok").alias("c_a")
    )
    b = tok_c.select(
        F.col("tok").alias("__wb"), F.col("c_tok").alias("c_b")
    )
    scored = (
        kept.join(
            F.broadcast(a),
            F.substring_index("bg", " ", 1) == F.col("__wa"),
        )
        .join(
            F.broadcast(b),
            F.substring_index("bg", " ", -1) == F.col("__wb"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            "c_pair",
            "c_a",
            "c_b",
            F.round(
                (
                    F.col("c_pair").cast("double")
                    * F.col("total_toks")
                    * F.col("total_toks")
                )
                / (
                    F.col("total_pairs").cast("double")
                    * F.col("c_a")
                    * F.col("c_b")
                ),
                6,
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.col("lift").desc(), F.col("bg").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("bg", "c_pair", "c_a", "c_b", "lift", "rank")
    )


def keyword_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 30,
    min_count: int = 5,
) -> DataFrame:
    """Top-k tokens that most distinguish corpus A from corpus B, ranked
    by the 2×2 chi-square statistic — "what changed textually between
    these two crawls/filters/snapshots", the token-level companion of
    profile.ks_drift's scalar test.

    For each token: a = count in A, b = count in B, with totals T_a,
    T_b; chi² = N·(a·(T_b−b) − b·(T_a−a))² / ((a+b)·(N−a−b)·T_a·T_b),
    N = T_a+T_b. Every subexpression is an exact integer converted once
    to double and combined in a fixed order with ONE division (the
    no-libm policy collocations/tfidf use), then rounded 6dp BEFORE
    ranking with a token tiebreak — deterministic and engine-identical.
    ``min_count`` (on a+b) suppresses one-off tokens whose statistic is
    pure noise, and keeps the top-k sort vocabulary-scale.

    Plan: two token-keyed counts (map-side combined, vocabulary-sized),
    one full-outer join at token grain, two 1-row broadcast totals, one
    top-k. Direction comes from the sign of the rate difference
    (``enriched_in``).
    """

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            _tokens(df, text_col, id_col)
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    merged = (
        counts(docs_a, "a")
        .join(counts(docs_b, "b"), "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("a", F.lit(0)).alias("a"),
            F.coalesce("b", F.lit(0)).alias("b"),
        )
    )
    totals = merged.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    ta, tb = F.col("ta").cast("double"), F.col("tb").cast("double")
    n = ta + tb
    det = a * (tb - b) - b * (ta - a)
    chi2 = F.round(
        (n * det * det)
        / F.nullif((a + b) * (n - a - b) * ta * tb, F.lit(0.0)),
        6,
    )
    return (
        merged.crossJoin(F.broadcast(totals))
        .filter(F.col("a") + F.col("b") >= min_count)
        .select(
            "tok",
            F.col("a").alias("count_a"),
            F.col("b").alias("count_b"),
            chi2.alias("chi2"),
            # rate comparison by integer cross-multiplication (no division)
            F.when(
                F.col("a") * F.col("tb") > F.col("b") * F.col("ta"), "a"
            )
            .when(F.col("a") * F.col("tb") < F.col("b") * F.col("ta"), "b")
            .otherwise("equal")
            .alias("enriched_in"),
        )
        .orderBy(F.col("chi2").desc(), F.col("tok").asc())
        .limit(k)
    )
