"""Round-6 regression pins for the round-5 ADVICE items.

- recursion depth: RUNTIME_CONFS must let a recursive CTE step past
  Spark's default 100-level limit (q_compound_growth_index does one step
  per distinct day; a quarter+ of history already exceeds 100).
- containment capped branch: exact integer intersection, no float
  reconstruction (see test_dedup for behavioural coverage; here we pin
  capped ≡ uncapped on a corpus where the cap binds).
- assign_split: cluster-keyed splits must not silently degrade to
  doc-keyed hashing when the component table is absent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.session import configure


def test_recursive_cte_past_default_100_levels(spark):
    configure(spark)
    assert int(spark.conf.get("spark.sql.cteRecursionLevelLimit")) >= 20000
    # 150 sequential steps — would throw RECURSION_LEVEL_LIMIT_EXCEEDED
    # at Spark's default of 100.
    spark.range(1, 151).select(
        F.col("id").cast("int").alias("rn")
    ).createOrReplaceTempView("__r6_steps")
    rows = spark.sql(
        """
        WITH RECURSIVE acc(rn, total) AS (
            SELECT rn, CAST(rn AS BIGINT) FROM __r6_steps WHERE rn = 1
            UNION ALL
            SELECT s.rn, a.total + s.rn
            FROM acc a JOIN __r6_steps s ON s.rn = a.rn + 1
        )
        SELECT MAX(rn) AS depth, MAX(total) AS total FROM acc
        """
    ).collect()
    assert rows[0]["depth"] == 150
    assert rows[0]["total"] == 150 * 151 // 2


def test_containment_capped_branch_exact_integer_division(spark):
    from airflow_retail_etl_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "alpha beta gamma delta unrelated words entirely here"),
            (4, "completely different text with no overlap at all okay"),
            (5, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    kw = dict(kind="token", n=2, min_containment=0.0)
    uncapped = {
        (r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
        for r in containment_pairs(docs, "text", "doc_id", **kw).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
        for r in containment_pairs(
            docs, "text", "doc_id", max_doc_freq=3, **kw
        ).collect()
    }
    assert capped, "cap must leave surviving candidate pairs"
    for pair, vals in capped.items():
        # bit-equal, not approx: both branches are one integer division
        assert vals == uncapped[pair], pair


def test_assign_split_cluster_mode_never_degrades_to_doc_hash(spark):
    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        _neardup_clusters,
        assign_split,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    docs = spark.createDataFrame(
        [(i, base * 3 + f"tail {i % 4}") for i in range(40)]
        + [(100 + i, f"totally unrelated corpus line number {i} " * 8)
           for i in range(10)],
        "doc_id long, text string",
    )
    cfg = CorpusConfig(split_by_cluster=True, neardup_jaccard=0.3)
    # direct call WITHOUT a precomputed cc must still honour the flag:
    # near-dup clusters may never straddle splits
    split_df = assign_split(docs, cfg, cc=None)
    cc = _neardup_clusters(docs, cfg)
    straddlers = (
        split_df.select(F.col("doc_id").alias("node"), "split")
        .join(cc, "node")
        .groupBy("comp")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    # and it matches the precomputed-cc path exactly
    explicit = assign_split(docs, cfg, cc=cc)
    assert sorted(
        (r["doc_id"], r["split"]) for r in split_df.collect()
    ) == sorted((r["doc_id"], r["split"]) for r in explicit.collect())


def test_assign_split_cluster_mode_raises_without_text(spark):
    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        assign_split,
    )

    # no text column and no cc: the leakage guard cannot be honoured —
    # must fail loudly, never silently fall back to the per-doc hash
    bare = spark.createDataFrame([(1,), (2,)], "doc_id long")
    cfg = CorpusConfig(split_by_cluster=True)
    with pytest.raises(ValueError, match="split_by_cluster"):
        assign_split(bare, cfg, cc=None)
