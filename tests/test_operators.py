"""Unit tests for the generic distributed operators."""

from pyspark.sql import functions as F

from theoremkb_spark.operators.graph import connected_components
from theoremkb_spark.operators.joins import salted_join


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_chain_transitive(spark):
    # chain of 6 — needs multiple propagation rounds
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(5)], "src string, dst string"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(comp.values()) == {"n0"}


def test_connected_components_distributed_path_matches_driver_path(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(5)]
        + [("a", "b"), ("c", "b"), ("z", "z9")],
        "src string, dst string",
    )
    fast = {
        (r.id, r.component) for r in connected_components(edges).collect()
    }
    dist = {
        (r.id, r.component)
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert fast == dist


def test_salted_join_matches_plain_join(spark):
    fact = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(7)], "k long, name string"
    )
    plain = fact.join(dim, "k", "left").select("k", "v", "name")
    salted = salted_join(fact, dim, on=["k"], how="left", salt=4).select(
        "k", "v", "name"
    )
    assert plain.exceptAll(salted).isEmpty() and salted.exceptAll(plain).isEmpty()


def test_salted_join_no_row_explosion(spark):
    fact = spark.range(0, 500).select((F.col("id") % 3).alias("k"), "id")
    dim = spark.createDataFrame([(0, "x"), (1, "y")], "k long, s string")
    assert salted_join(fact, dim, on=["k"], how="left", salt=8).count() == 500
