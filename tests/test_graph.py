"""Tests: BFS reachability."""

from __future__ import annotations

import pytest

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.graph import (
    bfs_min_hops,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_bfs_min_hops_chain_and_cutoff(spark):
    # a -> b -> c -> d -> e, seed {a}, max 3: e is out of reach
    edges = _edges(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    )
    got = {
        r.node: r.hops
        for r in bfs_min_hops(edges, _seeds(spark, ["a"]), 3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_min_hops_takes_shortest_path(spark):
    # two routes to d: a->b->c->d and a->d; min hop must win
    edges = _edges(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    )
    got = {
        r.node: r.hops
        for r in bfs_min_hops(edges, _seeds(spark, ["a"]), 5).collect()
    }
    assert got["d"] == 1
    # cycles terminate (early stop on empty frontier, not max_hops)
    cyc = _edges(spark, [("x", "y"), ("y", "x")])
    got2 = {
        r.node: r.hops
        for r in bfs_min_hops(cyc, _seeds(spark, ["x"]), 100).collect()
    }
    assert got2 == {"x": 0, "y": 1}


def test_bfs_min_hops_multi_source_and_validation(spark):
    edges = _edges(spark, [("a", "m"), ("z", "m"), ("m", "q")])
    got = {
        r.node: r.hops
        for r in bfs_min_hops(edges, _seeds(spark, ["a", "z"]), 2).collect()
    }
    assert got == {"a": 0, "z": 0, "m": 1, "q": 2}
    with pytest.raises(ValueError, match="max_hops"):
        bfs_min_hops(edges, _seeds(spark, ["a"]), -1)
    # max_hops=0: just the seeds
    only = bfs_min_hops(edges, _seeds(spark, ["a"]), 0).collect()
    assert {(r.node, r.hops) for r in only} == {("a", 0)}
