"""IVF-PQ: product-quantized ANN index (Jégou et al. 2011, FAISS-style).

The memory/IO story the plain IVF index lacks: each vector's residual
(v − cell centroid) is encoded as M uint8 codes — 64-dim float32
embeddings (256 B) compress to M = 8 bytes, 32×. A probe reads ONLY
the ``_code`` column of the probed cell partitions (Parquet column
pruning + ``_cell`` directory pruning), computes approximate distances
with one numpy lookup-table pass per Arrow batch (ADC — asymmetric
distance computation), and re-ranks the few surviving candidates
exactly by fetching their ``embedding`` column. At 100 TB the scan
cost per probe is ``n_probe/n_cells · M bytes/vector`` — the full
float vectors are touched for ~k·rerank rows only.

Training is driver-side numpy over a bounded sample (same rationale as
``build_ivf_index``: quantizer quality saturates at tens of thousands
of points; a distributed k-means would rescan the full table per
iteration). Codebooks are shared across cells (standard residual-PQ),
so the metadata sidecar stays small: n_cells·D + M·K·(D/M) floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.ann_index import (
    _read_meta,
    _write_meta,
)
from inception_eventstore_spark.operators.similarity import (
    _lloyd_kmeans,
    l2_distance,
    rank_cells,
)


class PqQuantizer:
    """Product quantizer: M independent sub-space codebooks."""

    def __init__(self, codebooks: "np.ndarray"):
        self.codebooks = np.asarray(codebooks, dtype=np.float64)  # M×K×dsub

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @classmethod
    def train(
        cls,
        residuals: "np.ndarray",
        m_subspaces: int = 8,
        n_codes: int = 256,
        seed: int = 7,
        max_iter: int = 10,
    ) -> "PqQuantizer":
        n, dim = residuals.shape
        if dim % m_subspaces != 0:
            raise ValueError(
                f"dim={dim} not divisible by m_subspaces={m_subspaces}"
            )
        if n_codes > 256:
            raise ValueError("n_codes must fit a uint8 code (≤ 256)")
        dsub = dim // m_subspaces
        books = [
            _lloyd_kmeans(
                residuals[:, s * dsub:(s + 1) * dsub],
                n_codes, seed + s, max_iter,
            )
            for s in range(m_subspaces)
        ]
        return cls(np.stack(books))

    def encode(self, R: "np.ndarray") -> "np.ndarray":
        """Residual matrix (n × D) → uint8 codes (n × M): per subspace,
        nearest codebook entry by L2 (one matmul each)."""
        n = R.shape[0]
        codes = np.empty((n, self.m), dtype=np.uint8)
        for s in range(self.m):
            X = R[:, s * self.dsub:(s + 1) * self.dsub]
            C = self.codebooks[s]
            D = (
                (X**2).sum(1)[:, None]
                - 2.0 * (X @ C.T)
                + (C**2).sum(1)[None, :]
            )
            codes[:, s] = D.argmin(axis=1).astype(np.uint8)
        return codes

    def adc_lut(self, query_residual: "np.ndarray") -> "np.ndarray":
        """(M × K) table: squared L2 from the query residual's s-th
        sub-vector to every codebook entry; an encoded vector's
        approximate squared distance is ``lut[s, code[s]].sum()``."""
        q = np.asarray(query_residual, dtype=np.float64)
        lut = np.empty((self.m, self.k), dtype=np.float64)
        for s in range(self.m):
            qs = q[s * self.dsub:(s + 1) * self.dsub]
            lut[s] = ((self.codebooks[s] - qs[None, :]) ** 2).sum(axis=1)
        return lut


class IvfPqVectorIndex:
    """IVF cells (directory partitions) + PQ codes (8-byte payload).

    Layout mirrors ``IvfVectorIndex``: ``<path>/vectors`` partitioned
    by ``_cell`` carrying (id, embedding, _code); centroids + codebooks
    in the one-line JSON metadata sidecar."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.centroids: list[list[float]] = meta["centroids"]
        self.id_col: str = meta["id_col"]
        self.vec_col: str = meta["vec_col"]
        self.pq = PqQuantizer(np.asarray(meta["codebooks"]))

    @staticmethod
    def _vectors_path(path: str) -> str:
        return path.rstrip("/") + "/vectors"

    @staticmethod
    def _meta_path(path: str) -> str:
        return path.rstrip("/") + "/meta"

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        path: str,
        n_cells: int = 16,
        m_subspaces: int = 8,
        n_codes: int = 256,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 7,
        max_iter: int = 10,
        train_sample: int = 65_536,
    ) -> "IvfPqVectorIndex":
        spark = embeddings.sparkSession
        sample = (
            embeddings.select(F.col(vec_col).alias("_v"))
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(train_sample)
            .collect()
        )
        if not sample:
            raise ValueError("cannot build IVF-PQ over an empty DataFrame")
        X = np.array([r["_v"] for r in sample], dtype=np.float64)
        C = _lloyd_kmeans(X, n_cells, seed, max_iter)
        # residuals of the training sample w.r.t. their nearest cell
        D = (X**2).sum(1)[:, None] - 2.0 * (X @ C.T) + (C**2).sum(1)[None, :]
        R = X - C[D.argmin(axis=1)]
        pq = PqQuantizer.train(R, m_subspaces, min(n_codes, len(X)),
                               seed, max_iter)

        centroids = C
        books = pq.codebooks

        @F.pandas_udf("struct<c: int, code: binary>")
        def assign_encode(v: pd.Series) -> pd.DataFrame:
            M = np.vstack(v.to_numpy()).astype(np.float64)
            D = (
                (M**2).sum(1)[:, None]
                - 2.0 * (M @ centroids.T)
                + (centroids**2).sum(1)[None, :]
            )
            cell = D.argmin(axis=1)
            codes = PqQuantizer(books).encode(M - centroids[cell])
            return pd.DataFrame(
                {"c": cell.astype(np.int32), "code": [c.tobytes() for c in codes]}
            )

        enc = embeddings.withColumn("_ac", assign_encode(F.col(vec_col)))
        out = enc.select(
            F.col(id_col), F.col(vec_col),
            F.col("_ac.c").alias("_cell"), F.col("_ac.code").alias("_code"),
        )
        (
            out.repartition("_cell")
            .write.mode("overwrite")
            .partitionBy("_cell")
            .parquet(cls._vectors_path(path))
        )
        meta = {
            "centroids": [list(map(float, c)) for c in C],
            "codebooks": [[list(map(float, e)) for e in b] for b in books],
            "id_col": id_col,
            "vec_col": vec_col,
        }
        _write_meta(spark, cls._meta_path(path), meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfPqVectorIndex":
        return cls(spark, path, _read_meta(spark, cls._meta_path(path)))

    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(self._vectors_path(self.path))

    def probe_cells(self, query_vector: list[float], n_probe: int = 3) -> list[int]:
        return rank_cells(self.centroids, query_vector)[:n_probe]

    def topk(
        self,
        query_vector: list[float],
        k: int = 10,
        n_probe: int = 3,
        rerank: int = 4,
    ) -> DataFrame:
        """ADC scan of the probed cells' ``_code`` column, exact re-rank
        of the best ``k·rerank`` candidates using their stored vectors.
        Returns (id, dist) exactly like the other topk operators."""
        probe = self.probe_cells(query_vector, n_probe)
        q = np.asarray(query_vector, dtype=np.float64)
        luts = {
            c: self.pq.adc_lut(q - np.asarray(self.centroids[c]))
            for c in probe
        }
        m = self.pq.m

        @F.pandas_udf("double")
        def adc(cell: pd.Series, code: pd.Series) -> pd.Series:
            cells = cell.to_numpy()
            out = np.empty(len(cells), dtype=np.float64)
            if len(cells):
                C = np.vstack(
                    [np.frombuffer(b, dtype=np.uint8) for b in code]
                ).astype(np.int64)
                for c in np.unique(cells):
                    mask = cells == c
                    out[mask] = luts[int(c)][np.arange(m), C[mask]].sum(axis=1)
            return pd.Series(out)

        scan = self.vectors().where(F.col("_cell").isin(probe))
        cand = (
            scan.select(
                F.col(self.id_col), "_cell", "_code",
            )
            .withColumn("_adist", adc(F.col("_cell"), F.col("_code")))
            .orderBy(F.col("_adist").asc(), F.col(self.id_col).asc())
            .limit(k * rerank)
            .select(self.id_col)
        )
        qcol = F.array(*[F.lit(float(x)) for x in query_vector])
        return (
            cand.join(scan.select(self.id_col, self.vec_col), self.id_col)
            .select(
                F.col(self.id_col),
                l2_distance(F.col(self.vec_col), qcol).alias("dist"),
            )
            .orderBy(F.col("dist").asc(), F.col(self.id_col).asc())
            .limit(k)
        )
