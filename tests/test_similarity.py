from __future__ import annotations

import math

import pytest

from airflow_retail_etl_spark.operators import similarity
from airflow_retail_etl_spark.sources.tables import load_table

VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),   # closest to 0
    (2, [0.0, 1.0, 0.0]),
    (3, [-1.0, 0.0, 0.0]),  # opposite of 0
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"])


def test_brute_force_topk_ordering(vecs):
    out = similarity.brute_force_topk(vecs, vecs.filter("vec_id = 0"), k=3).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["sim"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert out[2]["sim"] == -1.0


def test_cosine_neardup_pairs_threshold(vecs):
    out = similarity.cosine_neardup_pairs(vecs, min_sim=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1)}


def test_lsh_neardup_finds_planted_duplicates(spark):
    # plant near-identical vectors among random-ish ones
    import math
    base = [math.sin(i * 0.7) for i in range(64)]
    near = [x + (0.001 if i % 2 else -0.001) for i, x in enumerate(base)]
    rows = [(0, base), (1, near)] + [
        (i, [math.sin(i * 1000 + j * 17.3) for j in range(64)])
        for i in range(2, 30)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.lsh_neardup_pairs(df, min_sim=0.95).collect()
    }
    assert (0, 1) in out and out[(0, 1)] > 0.999
    # verified precision: nothing below the threshold sneaks in
    assert all(s >= 0.95 for s in out.values())


def test_ivf_topk_recall_on_testdata(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=10).collect()
    }
    # sampled-fit quantizer (the 100 TB path: KMeans never sees the full
    # corpus) — tuned config measures 0.94 recall at sf0.001 and 0.96 at
    # sf0.01; a regression in training, assignment, or probing drops it
    # well below the 0.8 floor
    approx_rows = similarity.ivf_topk(
        emb, queries, k=10, n_cells=16, n_probe=12, fit_fraction=0.5
    ).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall}"
    # exact sims and contiguous ranks for what it does return
    for r in approx_rows:
        assert -1.0 <= r["sim"] <= 1.0


def test_ivf_probe_all_equals_brute_force(spark, sf_dir):
    # integrity mode (the oracle-graded form): probing every cell must
    # reproduce the exact top-k regardless of how KMeans carved the cells —
    # any lost/duplicated vector in cell assignment breaks this equality
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in similarity.brute_force_topk(emb, queries, k=10).collect()
    }
    probed_all = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in similarity.ivf_topk(
            emb, queries, k=10, n_cells=16, n_probe=16, fit_fraction=0.5
        ).collect()
    }
    assert probed_all == exact


def test_lsh_topk_recall_on_testdata(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.lsh_topk(emb, queries, k=10).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # uniformly random 64-d vectors are LSH's worst case; multi-table
    # (p=4, L=24) measures 0.94 here — same floor as the IVF family
    assert recall >= 0.8, f"LSH recall too low: {recall}"
    ranks = [r["rank"] for r in approx if r["query_id"] == approx[0]["query_id"]]
    assert ranks == sorted(ranks)


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def test_pq_encode_codes_shape_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    enc = similarity.pq_encode(emb, m=8, ksub=16, dims=64)
    rows = {r["id"]: r["codes"] for r in enc.collect()}
    again = {r["id"]: r["codes"] for r in
             similarity.pq_encode(emb, m=8, ksub=16, dims=64).collect()}
    assert rows == again
    for codes in rows.values():
        assert len(codes) == 8
        assert all(1 <= c <= 16 for c in codes)


def test_pq_integrity_full_shortlist_equals_brute_force(spark, sf_dir):
    """shortlist >= corpus degenerates PQ to exact brute force — proves
    the ADC scan loses/duplicates nothing and rescoring is exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    n = emb.count()
    pq = similarity.pq_topk(emb, queries, k=5, shortlist=n).collect()
    bf = similarity.brute_force_topk(emb, queries, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(((r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
                   for r in pq)) == \
           sorted(((r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
                   for r in bf))


def _recall(pq_rows, bf_rows):
    truth, got = {}, {}
    for r in bf_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in pq_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    return sum(recalls) / len(recalls)


def test_pq_recall_beats_chance_on_structureless_corpus(spark, sf_dir):
    """sf0.001 embeddings are i.i.d. Gaussian — the worst case for ANY
    coarse quantizer (no cluster structure to exploit; true top-10 sims
    sit barely above the bulk). The untrained-codebook ADC shortlist must
    still beat random candidate selection (shortlist/corpus ≈ 0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    pq = similarity.pq_topk(emb, queries, k=10, shortlist=50).collect()
    bf = similarity.brute_force_topk(emb, queries, k=10).collect()
    assert _recall(pq, bf) >= 0.15


def test_pq_recall_high_on_clustered_corpus(spark):
    """On data with cluster structure (what real embedding corpora have),
    the same untrained codebook ranks true neighbors into a 3x-k
    shortlist reliably — quantization error is small relative to
    inter-cluster separation."""
    import math
    import random

    rnd = random.Random(7)
    centroids = [
        [rnd.gauss(0, 1) for _ in range(64)] for _ in range(10)
    ]
    rows = []
    for i in range(300):
        c = centroids[i % 10]
        rows.append(
            (i, [x + rnd.gauss(0, 0.15) for x in c])
        )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter("vec_id % 30 = 0")
    pq = similarity.pq_topk(df, queries, k=10, shortlist=30).collect()
    bf = similarity.brute_force_topk(df, queries, k=10).collect()
    assert _recall(pq, bf) >= 0.8


# ---------------------------------------------------------------------------
# IVF-PQ composition + trained codebook
# ---------------------------------------------------------------------------


def test_ivf_pq_probe_all_equals_pq_topk(spark, sf_dir):
    """Integrity mode (the oracle-graded form): probing every cell makes
    the cell join enumerate exactly the pair set pq_topk's exhaustive
    crossJoin scans, so the results must be IDENTICAL tuples — cells can
    then only lose or duplicate pairs, which this equality would expose."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    pq = similarity.pq_topk(emb, queries, k=10, shortlist=50).collect()
    ivfpq = similarity.ivf_pq_topk(
        emb, queries, k=10, shortlist=50,
        n_cells=16, n_probe=16, fit_fraction=0.5,
    ).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"]) for r in rows
    )
    assert key(ivfpq) == key(pq)


def test_ivf_pq_recall_with_trained_codebook(spark, sf_dir):
    """The production configuration: sampled-fit coarse cells gating the
    ADC scan (n_probe < n_cells), data-trained codebook. Measures 0.94
    on the testdata — a regression in cell probing, code assignment, or
    codebook training drops it well below the 0.8 floor."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    cb = similarity.pq_train_codebook(emb, fit_fraction=0.5)
    bf = similarity.brute_force_topk(emb, queries, k=10).collect()
    out = similarity.ivf_pq_topk(
        emb, queries, k=10, shortlist=150,
        n_cells=16, n_probe=12, fit_fraction=0.5, codebook=cb,
    ).collect()
    assert _recall(out, bf) >= 0.8
    # exact sims, contiguous per-query ranks
    for r in out:
        assert -1.0 <= r["sim"] <= 1.0


def test_fit_sample_membership_invariant_under_repartition(spark, sf_dir):
    """The round-10 flake's root cause, pinned: fit-sample membership
    must be a pure function of the DATA. ``DataFrame.sample`` is
    Bernoulli-per-partition-layout (repartition(n) changes the draw);
    the content-hash draw (_fit_sample) must select the IDENTICAL row
    set under any layout."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    sets = []
    for n in (3, 11):
        got = similarity._fit_sample(
            emb.repartition(n), F.col("vec_id").cast("string"), 0.5, seed=7
        )
        sets.append({r["vec_id"] for r in got.select("vec_id").collect()})
    assert sets[0] == sets[1] and sets[0]
    # and a sane Bernoulli fraction: 0.5 ± a loose binomial band
    total = emb.count()
    assert 0.4 * total < len(sets[0]) < 0.6 * total


def test_trained_codebook_layout_independent(spark, sf_dir):
    """Trained codebooks are bit-identical regardless of the input's
    partition layout — the property that makes in-suite and isolated
    recall numbers equal by construction (round-10 verdict item 1)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    cb1 = similarity.pq_train_codebook(emb.repartition(3), fit_fraction=0.5)
    cb2 = similarity.pq_train_codebook(emb.repartition(11), fit_fraction=0.5)
    assert np.array_equal(cb1, cb2)


def test_trained_codebook_beats_seeded(spark, sf_dir):
    """pq_train_codebook's reason to exist: on the same corpus/queries/
    shortlist the data-adapted codebook recalls far more true neighbors
    than the seeded data-independent one (measured 0.68 vs 0.20)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    bf = similarity.brute_force_topk(emb, queries, k=10).collect()
    seeded = similarity.pq_topk(emb, queries, k=10, shortlist=50).collect()
    cb = similarity.pq_train_codebook(emb, fit_fraction=0.5)
    trained = similarity.pq_topk(
        emb, queries, k=10, shortlist=50, codebook=cb
    ).collect()
    assert cb.shape == (8, 16, 8)
    assert _recall(trained, bf) > _recall(seeded, bf) + 0.2


def test_hard_negative_topk_excludes_query_label(spark, sf_dir):
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators.similarity import (
        hard_negative_topk,
    )
    from airflow_retail_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = hard_negative_topk(emb, queries, k=5)
    labels = {
        r["vec_id"]: r["label"] for r in queries.select("vec_id", "label").collect()
    }
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["neg_label"] != labels[r["query_id"]]
        assert r["neg_label"] is not None
    # ranks are dense from 1 per query
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hard_negatives_are_topmost_cross_label_neighbors(spark, sf_dir):
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators.similarity import (
        brute_force_topk,
        hard_negative_topk,
    )
    from airflow_retail_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0)
    qlabel = queries.first()["label"]
    # exhaustive ranking with self excluded, filtered to cross-label,
    # must equal the mined negatives (same order)
    full = brute_force_topk(emb, queries, k=10_000)
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")
    )
    expected = [
        r["neighbor_id"]
        for r in full.join(lab, "neighbor_id")
        .filter(F.col("nl") != qlabel)
        .orderBy("rank")
        .limit(5)
        .collect()
    ]
    mined = [
        r["neighbor_id"]
        for r in hard_negative_topk(emb, queries, k=5).orderBy("rank").collect()
    ]
    assert mined == expected


def test_embedding_dim_stats_detects_dead_dims_and_is_exact(spark):
    """A constant dimension shows variance 0 (dead); stats match the
    hand computation on 6dp-rounded components; partition-invariant."""
    from airflow_retail_etl_spark.operators.similarity import (
        embedding_dim_stats,
    )

    rows = [
        (i, [float(i), 7.0, 0.125 * i]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.dim: r for r in embedding_dim_stats(df).collect()}
    assert set(got) == {0, 1, 2}
    # dim 1 constant -> dead
    assert got[1].variance == 0.0 and got[1].mean == 7.0
    # dim 0: 0..7 -> mean 3.5, population variance 5.25
    assert got[0].mean == 3.5 and got[0].variance == 5.25
    assert got[0].min_val == 0.0 and got[0].max_val == 7.0
    assert all(got[d].n == 8 for d in got)
    # layout invariance
    again = {
        r.dim: r
        for r in embedding_dim_stats(df.repartition(5)).collect()
    }
    assert {d: (v.mean, v.variance) for d, v in again.items()} == {
        d: (v.mean, v.variance) for d, v in got.items()
    }


def test_embedding_dim_stats_products_are_exact_decimal(spark):
    """Round-15 regression: the Σx² accumulation must square
    DECIMAL(18,6) operands (product DECIMAL(37,12) — exact). With
    DECIMAL(24,6) operands the product precision (49) overflows 38 and
    Spark SILENTLY rounds every per-row square back to 6 dp — on this
    witness set the buggy form publishes variance 10.121994 while the
    exact sum (and DuckDB, which keeps the product exact) publishes
    10.121995. Found live at sf0.001, dim 61 (Spark 0.014891 vs oracle
    0.014892)."""
    from airflow_retail_etl_spark.operators.similarity import (
        embedding_dim_stats,
    )

    vals = [2.441057, 1.819583, 9.249732, 1.558591]
    df = spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(vals)],
        "vec_id long, embedding array<double>",
    )
    r = embedding_dim_stats(df).collect()[0]
    assert r["variance"] == 10.121995
    assert r["mean"] == 3.767241


def test_embedding_gram_faces_identical_and_partition_invariant(spark):
    """The pair-join oracle face and the integer-matmul production face
    produce BIT-identical (i, j, n, sum_xy, cov) rows, and neither
    depends on layout (exact scaled-integer sums)."""
    from airflow_retail_etl_spark.operators.similarity import (
        embedding_gram,
        embedding_gram_matmul,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    pair = [tuple(r) for r in embedding_gram(emb).collect()]
    matmul = [tuple(r) for r in embedding_gram_matmul(emb).collect()]
    assert pair == matmul
    assert len(pair) == 64 * 65 // 2
    again = [
        tuple(r)
        for r in embedding_gram_matmul(emb.repartition(7)).collect()
    ]
    assert again == pair


def test_embedding_gram_values_match_numpy(spark):
    """cov agrees with numpy's population covariance of the 6dp-rounded
    components (to the published 6dp)."""
    import numpy as np

    from airflow_retail_etl_spark.operators.similarity import (
        embedding_gram,
    )

    rows = [
        (0, [1.0, 2.0, 0.5]),
        (1, [0.25, -1.0, 0.125]),
        (2, [-0.5, 0.75, 2.0]),
        (3, [1.5, 0.0, -0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.i, r.j): r for r in embedding_gram(df).collect()}
    x = np.array([v for _, v in rows])
    cov = np.cov(x, rowvar=False, bias=True)
    gram = x.T @ x
    for (i, j), r in got.items():
        assert r.n == 4
        assert abs(r.sum_xy - gram[i, j]) < 1e-9
        assert abs(r.cov - round(cov[i, j], 6)) <= 1e-6


def test_whiten_transform_identity_covariance(spark):
    """whiten_transform's output covariance is ≈ identity (the property
    the operator exists for; not an oracle face — LAPACK eigh)."""
    from airflow_retail_etl_spark.operators.similarity import (
        embedding_gram,
        whiten_transform,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    white = whiten_transform(emb, embedding_gram(emb))
    g = embedding_gram(white).collect()
    offdiag = max(abs(r.cov) for r in g if r.i != r.j)
    diag = [r.cov for r in g if r.i == r.j]
    assert offdiag < 1e-3
    assert all(abs(d - 1.0) < 1e-2 for d in diag)


def test_embedding_gram_matmul_overflow_guard(spark):
    """Unnormalized embeddings that would silently wrap the int64
    partial raise a named error instead (ADVICE r13: the exactness
    bound was an unchecked assumption). |x| = 4000 scales to 4e9;
    one product is 1.6e19 > 2^63."""
    from py4j.protocol import Py4JJavaError

    from airflow_retail_etl_spark.operators.similarity import (
        embedding_gram_matmul,
    )

    df = spark.createDataFrame(
        [(0, [4000.0, 1.0]), (1, [4000.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises((Py4JJavaError, Exception)) as exc:
        embedding_gram_matmul(df).collect()
    assert "overflow" in str(exc.value)


def test_embedding_gram_matmul_bound_is_not_overtight(spark):
    """Components at the documented |x| <= 1 limit pass the guard (the
    check must reject only genuinely unsafe batches)."""
    from airflow_retail_etl_spark.operators.similarity import (
        embedding_gram,
        embedding_gram_matmul,
    )

    df = spark.createDataFrame(
        [(i, [1.0, -1.0, 0.999999]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    assert [tuple(r) for r in embedding_gram_matmul(df).collect()] == [
        tuple(r) for r in embedding_gram(df).collect()
    ]


def test_whiten_transform_rejects_empty_and_partial_gram(spark):
    """ADVICE r13: empty gram input raised a bare IndexError and a
    filtered gram silently zero-filled the covariance; both are now
    named ValueErrors."""
    from airflow_retail_etl_spark.operators.similarity import (
        embedding_gram,
        whiten_transform,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    gram = embedding_gram(emb)
    with pytest.raises(ValueError, match="empty"):
        whiten_transform(emb, gram.filter("1 = 0"))
    with pytest.raises(ValueError, match="partial"):
        whiten_transform(emb, gram.filter("i <> 3 or j <> 7"))


def test_grouped_topk_equals_naive_window(spark):
    """The two-phase sharded trim must be IDENTICAL to the one-window
    per-group top-k — (sim DESC, id ASC) is a strict total order."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators import similarity as sim_ops

    rng = np.random.default_rng(7)
    rows = [
        (i, int(i % 4), [float(x) for x in rng.standard_normal(8)])
        for i in range(120)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    q = emb.filter(F.col("vec_id") == 0)
    got = sim_ops.grouped_topk(
        emb, q, k=3, shards=8
    ).orderBy("label", "rank").collect()

    qv = q.select(sim_ops.as_double(F.col("embedding")).alias("qv"),
                  F.col("vec_id").alias("qid"))
    naive = (
        emb.join(F.broadcast(qv), F.col("vec_id") != F.col("qid"))
        .select(
            "label", "vec_id",
            sim_ops.cosine(F.col("qv"),
                           sim_ops.as_double(F.col("embedding"))).alias("s"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("label").orderBy(
                    F.col("s").desc(), F.col("vec_id").asc())),
        )
        .filter(F.col("rank") <= 3)
        .select("label", "rank", "vec_id", F.round("s", 6).alias("sim"))
        .orderBy("label", "rank")
        .collect()
    )
    assert got == naive
    # every group is served and the query never matches itself
    assert {r["label"] for r in got} == {0, 1, 2, 3}
    assert all(r["vec_id"] != 0 for r in got)


def test_grouped_topk_validation(spark):
    from airflow_retail_etl_spark.operators import similarity as sim_ops

    emb = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "vec_id long, label int, embedding array<double>"
    )
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        sim_ops.grouped_topk(emb, emb, k=0)
    with pytest.raises(ValueError, match="shards"):
        sim_ops.grouped_topk(emb, emb, shards=0)


def test_grouped_topk_rejects_multi_row_query(spark):
    """A multi-row query frame would silently interleave different
    queries' scores inside one group ranking — named error instead."""
    import pytest
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators import similarity as sim_ops

    emb = spark.createDataFrame(
        [(i, 0, [1.0, float(i)]) for i in range(6)],
        "vec_id long, label int, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ONE query row"):
        sim_ops.grouped_topk(emb, emb.filter(F.col("vec_id") < 2))
    with pytest.raises(ValueError, match="ONE query row"):
        sim_ops.grouped_topk(emb, emb.filter(F.col("vec_id") < 0))
