"""Tests for IVF-PQ product-quantized ANN (operators/pq.py)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import similarity as S
from inception_eventstore_spark.operators.pq import IvfPqVectorIndex, PqQuantizer


@pytest.fixture(scope="module")
def vectors(spark):
    """200 random 16-dim vectors + a planted neighbor of vector 0."""
    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    rows.append((500, [x + 0.01 for x in rows[0][1]]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestPqQuantizer:
    def test_rejects_bad_shapes(self):
        X = np.random.default_rng(1).normal(size=(50, 10))
        with pytest.raises(ValueError):
            PqQuantizer.train(X, m_subspaces=3)  # 10 % 3 != 0
        with pytest.raises(ValueError):
            PqQuantizer.train(X, m_subspaces=2, n_codes=300)

    def test_encode_decode_error_is_small(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(400, 16))
        pq = PqQuantizer.train(X, m_subspaces=4, n_codes=32)
        codes = pq.encode(X)
        assert codes.shape == (400, 4) and codes.dtype == np.uint8
        # ADC of a vector against itself ≈ its quantization error,
        # far below the typical inter-vector distance (~sqrt(32))
        lut = pq.adc_lut(X[0])
        self_dist = lut[np.arange(4), codes[0]].sum()
        other = ((X[0] - X[1]) ** 2).sum()
        assert self_dist < other * 0.5

    def test_adc_approximates_true_distance(self):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(500, 16))
        pq = PqQuantizer.train(X, m_subspaces=4, n_codes=64)
        codes = pq.encode(X)
        q = X[7]
        lut = pq.adc_lut(q)
        approx = lut[np.arange(4)[None, :], codes].sum(axis=1)
        true = ((X - q) ** 2).sum(axis=1)
        # spearman-ish check: the true nearest 10 mostly rank in the
        # approx nearest 30
        t10 = set(np.argsort(true)[:10])
        a30 = set(np.argsort(approx)[:30])
        assert len(t10 & a30) >= 7


class TestIvfPqIndex:
    def test_build_topk_and_recall(self, vectors, tmp_path):
        base = vectors.where(F.col("vec_id") != 0)
        idx = IvfPqVectorIndex.build(
            base, str(tmp_path / "pq_idx"),
            n_cells=4, m_subspaces=4, n_codes=32,
        )
        rows = vectors.collect()
        q = [float(x) for x in
             next(r for r in rows if r["vec_id"] == 0)["embedding"]]
        got = idx.topk(q, k=10, n_probe=2, rerank=4).collect()
        assert got and got[0]["vec_id"] == 500
        truth = {r["vec_id"] for r in S.brute_force_topk(base, q, k=10).collect()}
        assert len(truth & {r["vec_id"] for r in got}) >= 5
        # re-rank distances are EXACT L2 (not the ADC approximation)
        import math
        emb = {r["vec_id"]: r["embedding"] for r in rows}
        for r in got:
            d = math.sqrt(sum((a - b) ** 2 for a, b in zip(emb[r["vec_id"]], q)))
            assert r["dist"] == pytest.approx(d, abs=1e-9)

    def test_codes_are_m_bytes(self, vectors, tmp_path):
        base = vectors.where(F.col("vec_id") != 0)
        IvfPqVectorIndex.build(
            base, str(tmp_path / "pq_sz"),
            n_cells=2, m_subspaces=8, n_codes=16,
        )
        idx = IvfPqVectorIndex.load(
            vectors.sparkSession, str(tmp_path / "pq_sz")
        )
        row = idx.vectors().select("_code").first()
        assert len(row["_code"]) == 8  # 16 dims → 8 subspaces → 8 bytes

    def test_probe_plan_is_partition_pruned(self, vectors, tmp_path):
        base = vectors.where(F.col("vec_id") != 0)
        idx = IvfPqVectorIndex.build(
            base, str(tmp_path / "pq_plan"),
            n_cells=4, m_subspaces=4, n_codes=16,
        )
        probe = idx.probe_cells([0.0] * 16, n_probe=2)
        plan = (
            idx.vectors()
            .where(F.col("_cell").isin(probe))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan
        assert "_cell" in plan.split("PartitionFilters", 1)[1][:200]

    def test_load_round_trip(self, vectors, tmp_path):
        base = vectors.where(F.col("vec_id") != 0)
        built = IvfPqVectorIndex.build(
            base, str(tmp_path / "pq_rt"),
            n_cells=3, m_subspaces=2, n_codes=16,
        )
        loaded = IvfPqVectorIndex.load(
            vectors.sparkSession, str(tmp_path / "pq_rt")
        )
        assert np.allclose(loaded.pq.codebooks, built.pq.codebooks)
        assert loaded.centroids == built.centroids
        q = [0.5] * 16
        a = [(r["vec_id"], round(r["dist"], 9)) for r in built.topk(q, k=5).collect()]
        b = [(r["vec_id"], round(r["dist"], 9)) for r in loaded.topk(q, k=5).collect()]
        assert a == b


class TestSq8:
    def test_code_semantics(self, spark):
        from inception_eventstore_spark.operators import pq as PQ

        rows = [(0, [0.0, 5.0]), (1, [10.0, 5.0]), (2, [2.5, 5.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {r["vec_id"]: r["codes"]
               for r in PQ.sq8_encode(df).collect()}
        # dim 0 spans [0,10]: 0→0, 10→floor(256)→clamp 255, 2.5→64
        assert got[0][0] == 0 and got[1][0] == 255 and got[2][0] == 64
        # constant dim encodes 0 for every vector
        assert [got[i][1] for i in range(3)] == [0, 0, 0]

    def test_dequant_error_bound(self, spark):
        import numpy as np

        from inception_eventstore_spark.operators import pq as PQ
        from inception_eventstore_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
        b = {int(r["dim"]): (r["lo"], r["hi"])
             for r in PQ.sq8_bounds(emb).collect()}
        lo = F.array(*[F.lit(b[i][0]) for i in sorted(b)])
        hi = F.array(*[F.lit(b[i][1]) for i in sorted(b)])
        dq = PQ.sq8_encode(emb).select(
            "vec_id", PQ.sq8_dequantize(F.col("codes"), lo, hi).alias("dv")
        )
        src = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
               for r in emb.collect()}
        widths = np.array([b[i][1] - b[i][0] for i in sorted(b)])
        for r in dq.collect():
            err = np.abs(np.array(r["dv"]) - src[r["vec_id"]])
            assert np.all(err <= widths / 512.0 + 1e-12)

    def test_topk_recall_single_and_batched(self, spark):
        from inception_eventstore_spark.operators import similarity as S2

        exact = spark.createDataFrame(
            [(i,) for i in range(10)], ["vec_id"]
        )
        approx = spark.createDataFrame(
            [(i,) for i in range(7)] + [(99,), (98,), (97,)], ["vec_id"]
        )
        r = S2.topk_recall(approx, exact).collect()[0]
        assert (r["n_exact"], r["n_hit"], r["recall"]) == (10, 7, 0.7)
        # batched: query b has zero hits and still reports a row
        ex2 = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], ["q", "vec_id"]
        )
        ap2 = spark.createDataFrame(
            [("a", 1), ("a", 9), ("b", 9)], ["q", "vec_id"]
        )
        got = {r["q"]: (r["n_exact"], r["n_hit"], r["recall"])
               for r in S2.topk_recall(ap2, ex2, query_col="q").collect()}
        assert got == {"a": (2, 1, 0.5), "b": (1, 0, 0.0)}
