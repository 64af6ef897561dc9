from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from inception_eventstore_spark.operators import embeddings as EB
from inception_eventstore_spark.operators.similarity import (
    brute_force_topk,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


class TestHashedBow:
    def test_counts_and_norm(self, spark):
        d = _docs(spark, ["a a b", ""])
        out = {r.doc_id: r.embedding
               for r in EB.hashed_bow_embedding(d, dim=8).collect()}
        v = out[0]
        assert len(v) == 8
        nz = sorted(x for x in v if x > 0)
        # counts 2 and 1 (or a single 3 on bucket collision), normalized
        assert abs(math.fsum(x * x for x in v) - 1.0) < 1e-12
        assert len(nz) in (1, 2)
        assert out[1] == [0.0] * 8  # empty doc → zero vector, not NaN

    def test_deterministic_and_case_normalized(self, spark):
        a = EB.hashed_bow_embedding(_docs(spark, ["Cat DOG"]), dim=16)
        b = EB.hashed_bow_embedding(_docs(spark, ["cat dog"]), dim=16)
        assert a.first().embedding == b.first().embedding

    def test_unnormalized_counts_are_integers(self, spark):
        d = _docs(spark, ["x y x z x"])
        v = EB.hashed_bow_embedding(d, dim=4, normalize=False).first().embedding
        assert sorted(v, reverse=True)[0] >= 1.0
        assert math.fsum(v) == 5.0

    def test_feeds_similarity_family(self, spark):
        """The produced vectors slot straight into brute_force_topk."""
        d = _docs(
            spark,
            ["alpha beta gamma", "alpha beta gamma", "delta epsilon zeta"],
        )
        emb = EB.hashed_bow_embedding(d, dim=16).select(
            "doc_id", "embedding"
        )
        q = emb.where("doc_id = 0").first().embedding
        top = brute_force_topk(emb, list(q), k=2, id_col="doc_id",
                               vec_col="embedding").collect()
        assert {r.doc_id for r in top} == {0, 1}  # the duplicate wins

    def test_sparse_and_dense_agree(self, spark):
        d = _docs(spark, ["a a b c", "b b"])
        dense = {
            r.doc_id: r.embedding
            for r in EB.hashed_bow_embedding(
                d, dim=8, normalize=False
            ).collect()
        }
        sparse = EB.bow_bucket_counts(d, dim=8).collect()
        rebuilt = {k: [0.0] * 8 for k in dense}
        for r in sparse:
            rebuilt[r.doc_id][r.bucket] = float(r.cnt)
        assert rebuilt == dense

    def test_partial_aggregation_plan(self, spark):
        """Each token hashed once; the (id, bucket) count partial-
        aggregates map-side (the per-bucket-lambda formulation re-hashes
        every token dim× — see module docstring)."""
        d = _docs(spark, ["a b c"])
        plan = (
            EB.bow_bucket_counts(d, dim=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "partial_count" in plan or "partial" in plan


class TestTfidf:
    def test_matches_hand_computation(self, spark):
        import math

        d = _docs(spark, ["a a b", "a c", "c c"])
        out = EB.tfidf_bucket_weights(d, dim=512)
        # recover bucket->token mapping via the sparse counts
        cnts = EB.bow_bucket_counts(d, dim=512).collect()
        # df per bucket from the counts themselves
        df = {}
        for r in cnts:
            df[r.bucket] = df.get(r.bucket, 0) + 1
        want = {
            (r.doc_id, r.bucket): r.cnt * math.log(4.0 / (df[r.bucket] + 1))
            for r in cnts
        }
        got = {(r.doc_id, r.bucket): r.w for r in out.collect()}
        assert set(got) == set(want)
        assert all(abs(got[k] - want[k]) < 1e-12 for k in got)

    def test_rare_tokens_outweigh_common(self, spark):
        d = _docs(spark, ["common rare1", "common x", "common y"])
        out = EB.tfidf_bucket_weights(d, dim=512).collect()
        ws = sorted(r.w for r in out)
        # the bucket shared by all three docs gets the smallest weight
        assert ws[0] < ws[-1]


class TestStandardize:
    def test_zero_mean_unit_std(self, spark):
        import numpy as np
        from pyspark.sql import Row as R

        rng = np.random.default_rng(5)
        X = rng.normal(loc=3.0, scale=2.5, size=(50, 4))
        df = spark.createDataFrame(
            [R(vec_id=i, embedding=[float(x) for x in X[i]])
             for i in range(50)],
            "vec_id long, embedding array<double>",
        )
        out = EB.standardize_embeddings(df).collect()
        Z = np.array([r.embedding_std for r in sorted(out, key=lambda r: r.vec_id)])
        want = (X - X.mean(axis=0)) / X.std(axis=0)
        assert np.allclose(Z, want, atol=1e-9)

    def test_constant_dim_maps_to_zero(self, spark):
        from pyspark.sql import Row as R

        df = spark.createDataFrame(
            [R(vec_id=i, embedding=[7.0, float(i)]) for i in range(4)],
            "vec_id long, embedding array<double>",
        )
        out = EB.standardize_embeddings(df).collect()
        assert all(r.embedding_std[0] == 0.0 for r in out)


class TestRandomProjection:
    def test_numpy_parity_and_determinism(self, spark):
        import numpy as np

        from inception_eventstore_spark.operators.embeddings import (
            projection_matrix,
            random_projection,
        )
        from inception_eventstore_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
        rows = random_projection(emb, out_dim=8, seed="v1").orderBy(
            "vec_id"
        ).collect()
        R = projection_matrix(64, 8, "v1")
        src = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
               for r in emb.collect()}
        for r in rows:
            expect = np.round(src[r["vec_id"]] @ R, 6)
            assert r["proj"] == pytest.approx(expect.tolist(), abs=1e-9)
        again = random_projection(emb, out_dim=8, seed="v1").orderBy(
            "vec_id"
        ).collect()
        assert [r["proj"] for r in again] == [r["proj"] for r in rows]
        # a different seed gives a different projection
        other = random_projection(emb, out_dim=8, seed="v2").orderBy(
            "vec_id"
        ).collect()
        assert [r["proj"] for r in other] != [r["proj"] for r in rows]

    def test_distances_roughly_preserved(self, spark):
        # JL with out_dim 32 over d=64: relative distance distortion of
        # far-apart planted points stays bounded
        import numpy as np

        from inception_eventstore_spark.operators.embeddings import (
            random_projection,
        )

        rng = np.random.default_rng(3)
        X = rng.standard_normal((40, 64))
        df = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(40)],
            "vec_id long, embedding array<float>",
        )
        rows = random_projection(
            df, out_dim=32, seed="v1", round_dp=None
        ).orderBy("vec_id").collect()
        Y = np.array([r["proj"] for r in rows])
        Xf = np.array([r["embedding"] for r in
                       df.orderBy("vec_id").collect()], dtype=np.float64)
        for _ in range(30):
            i, j = rng.integers(0, 40, 2)
            if i == j:
                continue
            dx = np.linalg.norm(Xf[i] - Xf[j])
            dy = np.linalg.norm(Y[i] - Y[j])
            assert 0.4 < dy / dx < 1.9  # loose JL band at out_dim 32

    def test_guard(self, spark):
        from inception_eventstore_spark.operators.embeddings import (
            random_projection,
        )
        from inception_eventstore_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        with pytest.raises(ValueError):
            random_projection(emb, out_dim=0)


class TestMahalanobisOutliers:
    def test_planted_outlier_ranks_first(self, spark):
        import random

        from inception_eventstore_spark.operators.embeddings import (
            mahalanobis_outliers,
        )

        rng = random.Random(7)
        rows = [
            (i, [rng.gauss(0.0, 1.0) for _ in range(8)]) for i in range(200)
        ]
        rows.append((999, [25.0] * 8))  # 25-sigma-ish on every dim
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        top = mahalanobis_outliers(df, top_n=3).collect()
        assert top[0]["vec_id"] == 999
        assert top[0]["maha2_u"] > top[1]["maha2_u"]

    def test_score_is_integer_micro_units(self, spark):
        from inception_eventstore_spark.operators.embeddings import (
            mahalanobis_outliers,
        )

        # two dims, three vectors: stats are exact, score checkable by
        # hand. mean = 0 on both dims, std_pop = sqrt(2/3) ~ 0.816497
        vecs = [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 0.0])]
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        got = {
            r["vec_id"]: r["maha2_u"]
            for r in mahalanobis_outliers(df, top_n=3).collect()
        }
        import math

        sd = round(math.sqrt(2.0 / 3.0), 6)
        z2 = (1.0 / sd) ** 2
        expect = math.floor(z2 * (1 << 20))  # + floor(0) for dim 2
        assert got[1] == expect and got[2] == expect and got[3] == 0

    def test_guards(self, spark):
        import pytest

        from inception_eventstore_spark.operators.embeddings import (
            mahalanobis_outliers,
        )

        df = spark.createDataFrame([(1, [1.0])], ["vec_id", "embedding"])
        with pytest.raises(ValueError):
            mahalanobis_outliers(df, top_n=0)
        empty = df.where("vec_id < 0")
        with pytest.raises(ValueError):
            mahalanobis_outliers(empty)


class TestEmbeddingIsotropy:
    def test_single_direction_is_one(self, spark):
        from inception_eventstore_spark.operators.embeddings import (
            embedding_isotropy,
        )

        # all vectors along +e0 (different magnitudes): unit vectors
        # identical -> anisotropy exactly 1
        rows = [(i, [float(i + 1)] + [0.0] * 63) for i in range(10)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        r = embedding_isotropy(df, dim=64).first()
        assert r["n"] == 10 and r["anisotropy"] == 1.0

    def test_symmetric_pair_is_zero(self, spark):
        from inception_eventstore_spark.operators.embeddings import (
            embedding_isotropy,
        )

        v = [1.0] * 64
        rows = [(1, v), (2, [-x for x in v])]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        r = embedding_isotropy(df, dim=64).first()
        assert r["anisotropy"] == 0.0
        assert r["mean_norm"] == pytest.approx(8.0, abs=1e-6)

    def test_matches_numpy_centroid_identity(self, spark):
        import numpy as np

        from inception_eventstore_spark.operators.embeddings import (
            embedding_isotropy,
        )

        rng = np.random.default_rng(9)
        M = rng.normal(size=(200, 64))
        df = spark.createDataFrame(
            [(i, [float(x) for x in M[i]]) for i in range(200)],
            ["vec_id", "embedding"],
        )
        U = M / np.linalg.norm(M, axis=1, keepdims=True)
        want = float((U.mean(axis=0) ** 2).sum())
        r = embedding_isotropy(df, dim=64).first()
        assert r["anisotropy"] == pytest.approx(want, abs=1e-6)
        assert r["mean_norm"] == pytest.approx(
            float(np.linalg.norm(M, axis=1).mean()), abs=1e-6
        )

    def test_zero_vectors_excluded(self, spark):
        from inception_eventstore_spark.operators.embeddings import (
            embedding_isotropy,
        )

        rows = [(1, [1.0] * 64), (2, [0.0] * 64)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        r = embedding_isotropy(df, dim=64).first()
        assert r["n"] == 1
