"""Linear-model scoring over engineered columns (logistic quality filter).

Production pretraining pipelines gate documents with a trained quality
classifier (fastText-style logistic regression over cheap text features)
rather than hand-set heuristics alone. Training happens offline; what the
engine needs is the SCORING path at corpus scale: a pure projection — no
shuffle, no UDF, whole-stage-codegen arithmetic — applying shipped weights
to feature columns.

Engine-exact numerics: the dot product accumulates in DECIMAL from
6-dp-rounded feature values and 6-dp weight literals (exact — no float
addition order to disagree on), and only the final sigmoid runs in double,
on bit-identical inputs, rounded to 6 dp before any thresholding (the
transcendental policy, README "Correctness"). The keep/drop decision
compares the ROUNDED score, so membership is reproducible across engines,
partitionings, and reruns.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.columns import pub_round

#: fixed-point type for weights and rounded features; products get scale 12
#: and the sum stays exact (Spark and DuckDB both keep DECIMAL × DECIMAL
#: exact until a cast).
_DEC = "decimal(18,6)"

#: shipped default text-quality model: weights over the 6-dp-rounded
#: features default_text_features builds. Chosen so the gate splits the
#: testdata corpus rather than rubber-stamping it (mean logit ≈ 0); a
#: production deployment replaces these with trained weights, same shape.
DEFAULT_TEXT_WEIGHTS = {
    "f_ln_tokens": 1.2,
    "f_ttr": 5.0,
    "f_stop_ratio": 2.0,
    "f_avg_len": -0.3,
}
DEFAULT_TEXT_BIAS = -6.1


def default_text_features(t: Column) -> dict[str, Column]:
    """The default model's feature map — each value 6-dp-rounded, one
    division or one transcendental on exact inputs (engine-identical, so
    an oracle can replay the model bit-for-bit)."""
    from airflow_retail_etl_spark.functions import text as tf

    n_tok = tf.token_count(t)
    return {
        "f_ln_tokens": F.round(F.log(F.lit(1.0) + n_tok), 6),
        "f_ttr": F.round(
            F.size(F.array_distinct(tf.tokens(t)))
            / F.nullif(n_tok, F.lit(0)),
            6,
        ),
        "f_stop_ratio": F.round(tf.stopword_ratio(t), 6),
        "f_avg_len": F.round(tf.avg_token_len(t), 6),
    }


def _w(value: float) -> Column:
    return F.lit(format(round(value, 6), ".6f")).cast(_DEC)


def linear_logit(
    features: Mapping[str, Column], weights: Mapping[str, float], bias: float
) -> Column:
    """DECIMAL-exact z = bias + Σ wᵢ·fᵢ, returned as double.

    ``features`` values MUST already be rounded to ≤6 decimals (the cast
    to DECIMAL(18,6) is then exact); weights/bias are quantized to 6 dp.
    Raises on weights without a matching feature so a typo cannot silently
    drop a model term.
    """
    missing = set(weights) - set(features)
    if missing:
        raise ValueError(f"weights without features: {sorted(missing)}")
    z: Column = _w(bias)
    for name in sorted(weights):
        z = z + _w(weights[name]) * features[name].cast(_DEC)
    return z.cast("double")


def logistic_score(
    df: DataFrame,
    features: Mapping[str, Column],
    weights: Mapping[str, float],
    bias: float,
    *,
    score_col: str = "score",
    keep_col: str = "keep",
    threshold: float = 0.5,
) -> DataFrame:
    """Append sigmoid(z) rounded to 6 dp and the thresholded keep flag.

    One projection over the input — feature extraction, dot product,
    sigmoid and threshold all fuse into the scan stage (zero shuffles;
    at 100 TB this runs at read bandwidth). The feature columns are also
    materialized in the output for score debugging/calibration audits.
    """
    z = linear_logit(features, weights, bias)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    out = df
    for name in sorted(features):
        out = out.withColumn(name, features[name])
    return out.withColumn(score_col, score).withColumn(
        keep_col, F.col(score_col) >= F.lit(threshold)
    )


def ridge_fit(
    df: DataFrame,
    features: Mapping[str, Column],
    label: Column,
    *,
    l2: float = 0.001,
) -> tuple[dict[str, float], float]:
    """Closed-form ridge regression trained IN-ENGINE — the fit side of
    the quality gate (distill a rule-based label, e.g. the Gopher keep
    flag, into a smooth linear scorer whose threshold can then be tuned).

    Normal equations: (XᵀX + λI)w = Xᵀy with the intercept unpenalized.
    Every XᵀX / Xᵀy entry is ONE DECIMAL aggregate over the 6-dp-rounded
    feature columns — products of DECIMAL(18,6) stay exact and the sums
    are order-independent, so the collected matrix is bit-identical
    across partitionings and reruns (the transcendental/DECIMAL policy,
    README "Correctness"). Rows with any NULL feature (empty docs) are
    excluded. The (p+1)×(p+1) system — model-sized, never data-sized —
    is solved driver-side with numpy (deterministic on identical bytes)
    and the weights are rounded to 6 dp: per the seeded-literal policy
    they are INJECTED as literals into downstream scoring plans (and
    their oracle twins), never re-derived per engine.

    Rows with a NULL label are excluded along with NULL-feature rows:
    F.sum skips NULLs, so a NULL-y row would otherwise count in every
    XᵀX entry while silently dropping out of the Xᵀy sums — an
    inconsistent normal-equation system (it would fit as if y=0).

    Returns (weights by feature name, bias). One aggregation job total;
    at 100 TB the fit costs one scan with a 20-cell partial-agg state.
    """
    import numpy as np

    names = sorted(features)
    cols = [F.lit(1).cast(_DEC)] + [
        features[n].cast(_DEC) for n in names
    ]
    y = label.cast(_DEC)
    ok = label.isNotNull()
    for n in names:
        ok = ok & features[n].isNotNull()
    base = df.select(
        *[c.alias(f"x{i}") for i, c in enumerate(cols)],
        y.alias("y"),
        ok.alias("ok"),
    ).filter("ok")
    p = len(cols)
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(
                F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"xx_{i}_{j}")
            )
        aggs.append(F.sum(F.col(f"x{i}") * F.col("y")).alias(f"xy_{i}"))
    row = base.agg(*aggs).first()
    xtx = np.zeros((p, p))
    xty = np.zeros(p)
    for i in range(p):
        for j in range(i, p):
            v = float(row[f"xx_{i}_{j}"] or 0)
            xtx[i, j] = xtx[j, i] = v
        xty[i] = float(row[f"xy_{i}"] or 0)
    reg = np.eye(p) * float(l2)
    reg[0, 0] = 0.0  # intercept unpenalized
    w = np.linalg.solve(xtx + reg, xty)
    weights = {n: round(float(w[i + 1]), 6) for i, n in enumerate(names)}
    return weights, round(float(w[0]), 6)


def ridge_score(
    df: DataFrame,
    features: Mapping[str, Column],
    weights: Mapping[str, float],
    bias: float,
    *,
    score_col: str = "score",
    keep_col: str = "keep",
    threshold: float = 0.5,
) -> DataFrame:
    """Apply a ridge_fit model: score = ROUND(bias + Σ wᵢ·fᵢ, 6) (linear
    probability — no sigmoid), keep = score ≥ threshold on the ROUNDED
    value. Same DECIMAL-exact projection shape as logistic_score."""
    z = linear_logit(features, weights, bias)
    out = df
    for name in sorted(features):
        out = out.withColumn(name, features[name])
    return out.withColumn(score_col, pub_round(z, 6)).withColumn(
        keep_col, F.col(score_col) >= F.lit(threshold)
    )
