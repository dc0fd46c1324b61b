from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.graph import (
    bipartite_edges,
    out_degrees,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_two_node_cycle_is_uniform(spark):
    # a↔b is perfectly symmetric: pr stays 0.5/0.5 at every iteration
    pr = {
        r["node"]: r["pagerank"]
        for r in pagerank(
            _edges(spark, [("a", "b"), ("b", "a")]), n_iter=5
        ).collect()
    }
    assert pr == {"a": 0.5, "b": 0.5}


def test_hub_outranks_spokes(spark):
    # undirected star: the hub holds more mass than any spoke, and the
    # spokes are symmetric
    e = [("h", s) for s in ("a", "b", "c")] + [
        (s, "h") for s in ("a", "b", "c")
    ]
    pr = {
        r["node"]: r["pagerank"]
        for r in pagerank(_edges(spark, e), n_iter=3).collect()
    }
    assert pr["h"] > pr["a"]
    assert pr["a"] == pr["b"] == pr["c"]


def test_mass_conserved_without_dangling(spark):
    # symmetrized graph has no dangling nodes: total mass stays 1
    # (up to the 9-dp per-iterate rounding)
    e = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")]
    total = (
        pagerank(_edges(spark, e), n_iter=4)
        .agg(F.sum("pagerank").alias("t"))
        .collect()[0]["t"]
    )
    assert total == pytest.approx(1.0, abs=1e-5)


def test_one_iteration_matches_hand_computation(spark):
    # chain a→b→c with symmetrized edges: outdeg a=1,b=2,c=1; after one
    # round pr(b) = 0.15/3 + 0.85*(1/3 + 1/3), pr(a) = pr(c) =
    # 0.15/3 + 0.85*(1/6)
    e = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    pr = {
        r["node"]: r["pagerank"]
        for r in pagerank(_edges(spark, e), n_iter=1).collect()
    }
    assert pr["b"] == pytest.approx(0.15 / 3 + 0.85 * (2 / 3), abs=2e-6)
    assert pr["a"] == pytest.approx(0.15 / 3 + 0.85 * (1 / 6), abs=2e-6)
    assert pr["a"] == pr["c"]


def test_partitioning_invariance(spark):
    # DECIMAL-accumulated contributions: identical scores at any layout
    e = [
        (f"u{i}", f"v{i % 7}") for i in range(50)
    ] + [(f"v{i % 7}", f"u{i}") for i in range(50)]
    one = {
        r["node"]: r["pagerank"]
        for r in pagerank(
            _edges(spark, e).coalesce(1), n_iter=3
        ).collect()
    }
    many = {
        r["node"]: r["pagerank"]
        for r in pagerank(
            _edges(spark, e).repartition(16), n_iter=3
        ).collect()
    }
    assert one == many


def test_materialize_off_same_result(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")])
    lazy = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, n_iter=2, materialize=False).collect()
    }
    pinned = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, n_iter=2, materialize=True).collect()
    }
    assert lazy == pinned


def test_bipartite_edges_symmetrized_distinct(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10), (2, 20)], "s long, p long"
    )
    e = bipartite_edges(df, "s", "p", left_prefix="s:", right_prefix="p:")
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert rows == {
        ("s:1", "p:10"),
        ("s:2", "p:10"),
        ("s:2", "p:20"),
        ("p:10", "s:1"),
        ("p:10", "s:2"),
        ("p:20", "s:2"),
    }
    # duplicates collapsed → count equals the distinct pair count ×2
    assert e.count() == 6
    deg = {r["src"]: r["outdeg"] for r in out_degrees(e).collect()}
    assert deg == {"s:1": 1, "s:2": 2, "p:10": 2, "p:20": 1}


def test_n_iter_validation(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [("a", "b")]), n_iter=0)


def test_label_propagation_spreads_and_clamps(spark):
    from airflow_retail_etl_spark.operators.graph import label_propagation

    # a—b—c chain (symmetrized); only a is seeded
    e = _edges(
        spark, [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    )
    seeds = spark.createDataFrame([("a", 7)], "node string, label int")
    one = {
        r["node"]: r["label"]
        for r in label_propagation(e, seeds, n_iter=1).collect()
    }
    assert one == {"a": 7, "b": 7, "c": None}  # 1 hop reaches b only
    two = {
        r["node"]: r["label"]
        for r in label_propagation(e, seeds, n_iter=2).collect()
    }
    assert two == {"a": 7, "b": 7, "c": 7}


def test_label_propagation_majority_and_tiebreak(spark):
    from airflow_retail_etl_spark.operators.graph import label_propagation

    # x hears 2 votes for 1, 1 vote for 9 → majority 1;
    # y hears 1 vote each for 1 and 9 → tie → min label 1
    e = _edges(
        spark,
        [("a", "x"), ("b", "x"), ("c", "x"), ("a", "y"), ("c", "y")],
    )
    seeds = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 9)], "node string, label int"
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(e, seeds, n_iter=1).collect()
    }
    assert out["x"] == 1
    assert out["y"] == 1


def test_label_propagation_seed_never_flips(spark):
    from airflow_retail_etl_spark.operators.graph import label_propagation

    # seed b=5 surrounded by three 1-votes stays 5 (clamped)
    e = _edges(
        spark,
        [("a", "b"), ("c", "b"), ("d", "b"), ("b", "a"), ("b", "c"), ("b", "d")],
    )
    seeds = spark.createDataFrame(
        [("a", 1), ("c", 1), ("d", 1), ("b", 5)], "node string, label int"
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(e, seeds, n_iter=3).collect()
    }
    assert out["b"] == 5


def test_pagerank_empty_edges(spark):
    out = pagerank(
        spark.createDataFrame([], "src string, dst string"), n_iter=2
    )
    assert out.count() == 0
    assert out.columns == ["node", "pagerank"]


def test_label_propagation_empty_seeds(spark):
    from airflow_retail_etl_spark.operators.graph import label_propagation

    e = _edges(spark, [("a", "b"), ("b", "a")])
    seeds = spark.createDataFrame([], "node string, label int")
    out = {
        r["node"]: r["label"]
        for r in label_propagation(e, seeds, n_iter=2).collect()
    }
    assert out == {"a": None, "b": None}


def test_nodes_from_sources_equivalent_on_symmetric_graphs(spark):
    from airflow_retail_etl_spark.operators.graph import label_propagation

    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c")],
    )
    pr_full = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, n_iter=3, nodes_from_sources=False).collect()
    }
    pr_fast = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, n_iter=3, nodes_from_sources=True).collect()
    }
    assert pr_fast == pr_full

    seeds = spark.createDataFrame([("a", 1)], "node string, label int")
    lp_full = {
        r["node"]: r["label"]
        for r in label_propagation(
            e, seeds, n_iter=3, nodes_from_sources=False
        ).collect()
    }
    lp_fast = {
        r["node"]: r["label"]
        for r in label_propagation(
            e, seeds, n_iter=3, nodes_from_sources=True
        ).collect()
    }
    assert lp_fast == lp_full


def test_bipartite_long_encoding_matches_string_path(spark):
    """encode='long' + decode_bipartite_node must reproduce the string
    path EXACTLY — same nodes, same scores (the keys never enter the
    numerics; round 10's pagerank hot-path change rides on this)."""
    from airflow_retail_etl_spark.operators.graph import (
        bipartite_edges,
        decode_bipartite_node,
    )

    rows = [(1, 10), (1, 20), (2, 10), (3, 30), (3, 30)]
    df = spark.createDataFrame(rows, ["s", "p"])
    es = bipartite_edges(df, "s", "p", left_prefix="s:", right_prefix="p:")
    el = bipartite_edges(df, "s", "p", encode="long")
    assert sorted(
        tuple(r) for r in el.select(
            decode_bipartite_node("src", left_prefix="s:", right_prefix="p:"),
            decode_bipartite_node("dst", left_prefix="s:", right_prefix="p:"),
        ).collect()
    ) == sorted(tuple(r) for r in es.collect())

    got_s = {
        r["node"]: r["pagerank"] for r in pagerank(es, n_iter=3).collect()
    }
    got_l = {
        r["node"]: r["pagerank"]
        for r in pagerank(el, n_iter=3)
        .select(
            decode_bipartite_node(
                "node", left_prefix="s:", right_prefix="p:"
            ).alias("node"),
            "pagerank",
        )
        .collect()
    }
    assert got_l == got_s

    import pytest as _pytest

    with _pytest.raises(ValueError, match="encode"):
        bipartite_edges(df, "s", "p", encode="typo")
