from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import clustering as CL

SF = "/root/testdata/sf0.001"


def _blobs(spark, n_per=40, seed=3):
    """Three well-separated gaussian blobs in 8-d."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4]
    )
    rows, truth = [], []
    for c, ctr in enumerate(centers):
        pts = ctr + 0.3 * rng.standard_normal((n_per, 8))
        for i, p in enumerate(pts):
            rows.append(Row(vec_id=c * n_per + i,
                            embedding=[float(x) for x in p]))
            truth.append(c)
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        centers,
        np.array(truth),
    )


class TestKMeans:
    def test_recovers_blob_centers(self, spark):
        df, centers, truth = _blobs(spark)
        C = np.array(CL.kmeans_fit(df, k=3, max_iter=8, seed=1))
        # each true center has a fitted centroid within the blob radius
        for ctr in centers:
            assert np.min(np.linalg.norm(C - ctr, axis=1)) < 1.0

    def test_assignment_matches_truth(self, spark):
        df, centers, truth = _blobs(spark)
        C = CL.kmeans_fit(df, k=3, max_iter=8, seed=1)
        got = (
            CL.assign_clusters(df, C)
            .orderBy("vec_id")
            .select("cluster")
            .collect()
        )
        labels = np.array([r.cluster for r in got])
        # cluster ids are arbitrary: check the partition matches truth
        for c in range(3):
            members = labels[truth == c]
            assert len(set(members.tolist())) == 1
        assert len({labels[truth == c][0] for c in range(3)}) == 3

    def test_exact_assign_agrees_with_arrow_assign(self, spark):
        df, _, _ = _blobs(spark)
        C = CL.kmeans_fit(df, k=3, max_iter=4, seed=1)
        cent_df = spark.createDataFrame(
            [Row(cid=i, cvec=c) for i, c in enumerate(C)],
            "cid int, cvec array<double>",
        )
        exact = {
            r.vec_id: r.cluster
            for r in CL.assign_clusters_exact(df, cent_df).collect()
        }
        arrow = {
            r.vec_id: r.cluster for r in CL.assign_clusters(df, C).collect()
        }
        assert exact == arrow

    def test_inertia_decreases_with_iterations(self, spark):
        df, _, _ = _blobs(spark)
        C1 = CL.kmeans_fit(df, k=3, max_iter=1, seed=9)
        C8 = CL.kmeans_fit(df, k=3, max_iter=8, seed=9)
        i1 = CL.inertia(CL.assign_clusters(df, C1), C1)
        i8 = CL.inertia(CL.assign_clusters(df, C8), C8)
        assert i8 <= i1 + 1e-9

    def test_empty_input_raises(self, spark):
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError):
            CL.kmeans_fit(empty, k=2)


class TestBalancedSample:
    def test_caps_each_group(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = CL.balanced_sample(emb, "label", 5, "vec_id")
        sizes = {
            r.label: r.n
            for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
        }
        orig = {
            r.label: r.n
            for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
        }
        for lbl, n in sizes.items():
            assert n == min(5, orig[lbl])

    def test_deterministic_and_growth_stable(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        pick = lambda df: {  # noqa: E731
            r.vec_id for r in CL.balanced_sample(df, "label", 5, "vec_id").collect()
        }
        first = pick(emb)
        assert pick(emb) == first
        # dropping OTHER rows never changes which kept rows rank first…
        # (growth stability: the md5 order is a property of the row alone,
        # so adding/removing competitors only shifts the cut, not the order)
        again = pick(emb.where(F.col("vec_id") % 7 != 3))
        kept_both = again & first
        assert kept_both <= first


class TestSemanticDedup:
    def test_planted_pairs_flag_exactly_one_member(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.clustering import (
            semantic_dedup_flags,
        )

        # period-101 pattern: no two base vectors coincide (i*37 mod
        # 101 distinct for i < 40), unlike small moduli that create
        # genuine duplicates and break the no-twin assertion below
        base = [
            (i, [float((i * 37 + j * j * 11) % 101) - 50.0
                 for j in range(8)])
            for i in range(40)
        ]
        emb = spark.createDataFrame(base, ["vec_id", "embedding"])
        planted = emb.where(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 1000).alias("vec_id"),
            F.transform("embedding", lambda x: x + F.lit(1e-4)).alias(
                "embedding"
            ),
        )
        both = emb.unionByName(planted)
        cent = emb.where(F.col("vec_id").isin(0, 1)).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
        out = semantic_dedup_flags(both, cent, threshold=0.9999)
        rows = {r["vec_id"]: r for r in out.collect()}
        assert len(rows) == 45
        # each planted pair has exactly one dropped member, same cluster
        for i in range(5):
            a, b = rows[i], rows[i + 1000]
            assert a["cluster"] == b["cluster"]
            assert a["is_dup"] + b["is_dup"] == 1
        # vectors with no near-twin are never flagged
        assert all(rows[i]["is_dup"] == 0 for i in range(5, 40))

    def test_keep_the_outlier_rule(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.clustering import (
            semantic_dedup_flags,
        )

        # centroid c; v1 = c (cosine 1 to centroid), v2 = near-copy of
        # v1 but slightly rotated away from c → v2 is the outlier and
        # must be KEPT, v1 dropped
        c = [1.0, 0.0, 0.0, 0.0]
        v1 = [1.0, 0.0, 0.0, 0.0]
        v2 = [1.0, 0.02, 0.0, 0.0]
        emb = spark.createDataFrame(
            [(10, v1), (20, v2)], ["vec_id", "embedding"]
        )
        cent = spark.createDataFrame([(0, c)], ["cid", "cvec"])
        rows = {r["vec_id"]: r["is_dup"] for r in semantic_dedup_flags(
            emb, cent, threshold=0.99).collect()}
        assert rows == {10: 1, 20: 0}


class TestDbscan2d:
    def _run(self, spark, pts, eps, min_pts):
        from inception_eventstore_spark.operators.clustering import (
            dbscan_2d,
        )

        df = spark.createDataFrame(pts, "id long, x double, y double")
        return {
            r["id"]: (r["role"], r["cluster"])
            for r in dbscan_2d(df, "id", "x", "y", eps, min_pts).collect()
        }

    def test_two_blobs_and_noise(self, spark):
        """Two 5-point crosses (every point within eps of the center,
        centers far apart) and one isolated point: two clusters headed
        by their min ids, arms are cores too (4 neighbors through the
        center? no — arms see center + 2 near arms), isolated = noise."""
        eps = 1.0
        blob = lambda x0, y0, base: [  # noqa: E731
            (base, x0, y0),
            (base + 1, x0 + 0.5, y0),
            (base + 2, x0 - 0.5, y0),
            (base + 3, x0, y0 + 0.5),
            (base + 4, x0, y0 - 0.5),
        ]
        pts = blob(0.0, 0.0, 10) + blob(100.0, 100.0, 20) + [(99, 50.0, 50.0)]
        got = self._run(spark, pts, eps, min_pts=4)
        assert got[99] == ("noise", None)
        # centers see 4 neighbors; arms see center + 2 side arms (dist
        # 0.5√2 ≈ 0.707 < 1) + opposite arm at dist 1.0 — exactly eps,
        # inclusive → 4 neighbors: everyone is core
        for base in (10, 20):
            for i in range(5):
                role, cl = got[base + i]
                assert role == "core"
                assert cl == base

    def test_border_vs_noise(self, spark):
        """A 5-point dense blob plus a satellite within eps of one blob
        member only: the satellite has 1 neighbor → border, assigned
        the blob's cluster; a farther point is noise."""
        pts = [
            (1, 0.0, 0.0),
            (2, 0.1, 0.0),
            (3, 0.0, 0.1),
            (4, 0.1, 0.1),
            (5, 0.05, 0.05),
            # within eps only of (0.1, 0) and (0.1, 0.1): 2 neighbors
            # < min_pts → border of cluster 1
            (6, 1.05, 0.0),
            (7, 5.0, 5.0),  # noise
        ]
        got = self._run(spark, pts, eps=1.0, min_pts=4)
        assert got[6][0] == "border" and got[6][1] == 1
        assert got[7] == ("noise", None)
        assert all(got[i] == ("core", 1) for i in range(1, 6))

    def test_stencil_is_lossless_across_cells(self, spark):
        """Two points 0.9·eps apart straddling a cell boundary (cells
        differ in both coordinates) still pair — the 3×3 stencil
        catches every true eps-neighbor."""
        eps = 1.0
        pts = [
            (1, -0.01, -0.01),
            (2, 0.62, 0.62),  # dist ≈ 0.891 < 1, cell (0,0) vs (-1,-1)
            (3, 1.3, 1.3),    # dist to 2 ≈ 0.96 < 1, cell (1,1)
        ]
        got = self._run(spark, pts, eps, min_pts=1)
        # chain 1-2-3: all cores (≥1 neighbor), one cluster headed by 1
        assert got == {1: ("core", 1), 2: ("core", 1), 3: ("core", 1)}

    def test_guards(self, spark):
        from inception_eventstore_spark.operators.clustering import (
            dbscan_2d,
        )

        df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
        with pytest.raises(ValueError):
            dbscan_2d(df, "id", "x", "y", eps=0.0)
        with pytest.raises(ValueError):
            dbscan_2d(df, "id", "x", "y", eps=1.0, min_pts=0)
