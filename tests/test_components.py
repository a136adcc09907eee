"""Connected-components / dedup-survivor tests on hand-built graphs."""

from __future__ import annotations

from concepts_pipeline_spark.operators.dedup import connected_components


def run(spark, edges, nodes):
    p = spark.createDataFrame(edges, "key_a string, key_b string") if edges else \
        spark.createDataFrame([], "key_a string, key_b string")
    n = spark.createDataFrame([(x,) for x in nodes], "key string")
    return {r["key"]: r["cluster_rep"]
            for r in connected_components(p, n, "key").collect()}


def test_chain_collapses_to_min(spark):
    # a-b-c-d chain: diameter 3, needs multiple propagation rounds
    got = run(spark, [("b", "a"), ("c", "b"), ("d", "c")], ["a", "b", "c", "d"])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_star_and_singleton(spark):
    got = run(spark, [("m", "z"), ("m", "y"), ("m", "x")],
              ["m", "x", "y", "z", "lonely"])
    assert got == {"m": "m", "x": "m", "y": "m", "z": "m", "lonely": "lonely"}


def test_two_components(spark):
    got = run(spark, [("b", "a"), ("d", "c")], ["a", "b", "c", "d"])
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_no_edges(spark):
    got = run(spark, [], ["p", "q"])
    assert got == {"p": "p", "q": "q"}


def test_connected_components_raises_on_nonconvergence(spark):
    """A chain longer than max_iter must fail loudly, not silently split."""
    import pytest

    from concepts_pipeline_spark.operators.dedup import connected_components

    # path graph 0-1-2-...-7 has diameter 7; min-label needs ~7 rounds
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(7)], "key_a string, key_b string"
    )
    nodes = spark.createDataFrame([(f"d{i}",) for i in range(8)], "key string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, nodes, "key", max_iter=2)
    # and with enough rounds it converges to one cluster
    out = connected_components(pairs, nodes, "key", max_iter=10)
    assert {r["cluster_rep"] for r in out.collect()} == {"d0"}


def test_long_path_converges_in_log_rounds(spark, tmp_path):
    """Pointer doubling: a 200-node path (diameter 199) converges within 12
    rounds — plain propagation would need 199 and abort. Zero-padded keys keep
    lexicographic min == numeric min."""
    pairs = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(199)],
        "key_a string, key_b string",
    )
    nodes = spark.createDataFrame(
        [(f"d{i:03d}",) for i in range(200)], "key string"
    )
    out = connected_components(pairs, nodes, "key", max_iter=12)
    reps = {r["cluster_rep"] for r in out.collect()}
    assert reps == {"d000"}


def test_durable_checkpoint_identical_output(spark, tmp_path):
    """checkpoint_dir switches localCheckpoint → reliable checkpoint; output
    must be identical."""
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    nodes = ["a", "b", "c", "x", "y", "solo"]
    p = spark.createDataFrame(edges, "key_a string, key_b string")
    n = spark.createDataFrame([(k,) for k in nodes], "key string")
    base = {
        r["key"]: r["cluster_rep"]
        for r in connected_components(p, n, "key").collect()
    }
    durable = {
        r["key"]: r["cluster_rep"]
        for r in connected_components(
            p, n, "key", checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert durable == base == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "solo": "solo"
    }
    # the reliable checkpoint actually wrote to the requested directory
    import os

    assert any(os.scandir(tmp_path / "ckpt"))
