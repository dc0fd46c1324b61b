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
