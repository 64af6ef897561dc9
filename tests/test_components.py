"""Connected components over near-dup pairs (operators/components.py),
verified against a driver-side union-find on random graphs."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.components import (
    connected_components,
    dedup_by_components,
)


def _union_find_labels(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference labeling: component = min node id, via union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


class TestConnectedComponents:
    def test_two_triangles_and_a_bridge(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)]
        got = _cc(spark, edges)
        assert got == {x: 1 for x in (2, 3, 10, 11, 12)} | {1: 1}

    def test_long_chain_converges(self, spark):
        """A 40-node path has diameter 39 — naive propagation would need
        39 rounds; the star algorithm must finish within the cap."""
        edges = [(i, i + 1) for i in range(40)]
        got = _cc(spark, edges)
        assert set(got.values()) == {0}
        assert len(got) == 41

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(7)
        for trial in range(3):
            n = 60
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(45)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            assert _cc(spark, edges) == _union_find_labels(n, edges)

    def test_distributed_loop_matches_driver_finish(self, spark):
        """Force the distributed star loop (driver_finish_edges=0) and
        check it labels identically to the driver union-find path —
        both must equal the reference on tie-heavy random graphs."""
        rng = random.Random(11)
        for _ in range(2):
            n = 50
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(40)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            df = spark.createDataFrame(edges, "id_a long, id_b long")
            loop = {
                r["node"]: r["component"]
                for r in connected_components(
                    df, driver_finish_edges=0
                ).collect()
            }
            assert loop == _union_find_labels(n, edges)
            assert loop == _cc(spark, edges)

    def test_driver_finish_schema_matches_loop(self, spark):
        # both paths must emit the same column types (downstream joins
        # and the oracle schema gate depend on it)
        df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        a = connected_components(df)
        b = connected_components(df, driver_finish_edges=0)
        assert [f.dataType for f in a.schema.fields] == [
            f.dataType for f in b.schema.fields
        ]

    def test_empty_pairs(self, spark):
        df = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(df).count() == 0

    def test_extra_columns_ignored(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 0.9), (2, 3, 0.85)], "id_a long, id_b long, jaccard double"
        )
        got = {r["node"]: r["component"]
               for r in connected_components(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}


class TestDedupByComponents:
    def test_keeps_one_per_cluster_plus_singletons(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 5), (6, 7)], "id_a long, id_b long"
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup_by_components(docs, pairs).collect()
        )
        # clusters {1,2,5} -> keep 1, {6,7} -> keep 6; 0,3,4 untouched
        assert kept == [0, 1, 3, 4, 6]


class TestSoftDedupWeights:
    def test_cluster_mass_sums_to_one_doc(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.components import (
            soft_dedup_weights,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(7)], ["doc_id"]
        )
        # clusters: {0,1,2} (chained), {3,4}; 5 and 6 untouched
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4)], ["id_a", "id_b"]
        )
        rows = {r["doc_id"]: r for r in soft_dedup_weights(
            docs, pairs).collect()}
        assert len(rows) == 7
        assert [rows[i]["component"] for i in range(5)] == [0, 0, 0, 3, 3]
        assert [rows[i]["cluster_size"] for i in range(7)] == [
            3, 3, 3, 2, 2, 1, 1
        ]
        assert rows[0]["weight"] == pytest.approx(1 / 3, abs=1e-6)
        assert rows[3]["weight"] == 0.5
        assert rows[5]["weight"] == 1.0
        # each cluster's total mass equals exactly one document
        total = sum(r["weight"] for r in rows.values())
        assert total == pytest.approx(4.0, abs=1e-5)  # 2 clusters + 2 singles
