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
        centroids: list | None = None,
        codebooks: list | None = None,
    ) -> "IvfPqVectorIndex":
        """``centroids`` / ``codebooks`` pin a pre-trained quantizer
        (lists shaped n_cells×D and M×K×dsub) and skip the sample +
        k-means pass entirely — the same pinning seam
        ``IvfVectorIndex.build(centroids=...)`` grew for the
        value-oracle replay: with both quantizers named as data (table
        rows / their residual sub-vectors), assignment, encode, the
        ADC scan and the re-rank are all exact SQL arithmetic."""
        spark = embeddings.sparkSession
        if (centroids is None) != (codebooks is None):
            raise ValueError("pin centroids and codebooks together")
        if centroids is not None:
            C = np.asarray(centroids, dtype=np.float64)
            pq = PqQuantizer(np.asarray(codebooks, dtype=np.float64))
        else:
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


# ---------------------------------------------------------------------
# SQ8 scalar quantization (complementing the PQ codes above)
# ---------------------------------------------------------------------
def sq8_bounds(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(dim, lo, hi) — per-dimension min/max for SQ8 scalar
    quantization. One posexplode + partial-aggregated groupBy; d rows
    out, broadcast back by the encoder."""
    ex = emb.select(
        F.posexplode(vec_col).alias("dim", "_x")
    ).select("dim", F.col("_x").cast("double").alias("_x"))
    return ex.groupBy("dim").agg(
        F.min("_x").alias("lo"), F.max("_x").alias("hi")
    )


def sq8_encode(
    emb: DataFrame,
    bounds: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> in 0..255) — int8 scalar quantization of
    each embedding: 4× smaller than float32 (32× smaller than the
    float64 math), the standard memory cut before brute-force or IVF
    search when PQ's codebook training is overkill.

        code = clamp(floor((x − lo) / (hi − lo) · 256), 0, 255)

    FLOOR binning on purpose: a round() here is not engine-portable
    (Spark HALF_UP vs DuckDB half-even diverge whenever the scaled
    value lands on .5 — same class as the CLAUDE.md money rule), while
    floor of an identically-computed double is exact on both engines;
    x = hi maps to 256 and clamps to 255. Constant dimensions encode
    as 0. Shape: posexplode + broadcast bounds join + re-collect via
    groupBy(id) sort-by-dim — shuffles d small ints per vector;
    ``bounds`` defaults to `sq8_bounds` of the same table (pass a
    reference snapshot's bounds to encode new batches consistently)."""
    b = bounds if bounds is not None else sq8_bounds(emb, vec_col)
    ex = emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("dim", "_x"),
    ).select(id_col, "dim", F.col("_x").cast("double").alias("_x"))
    code = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("_x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 256.0
                ).cast("int"),
            ),
        ),
    ).otherwise(F.lit(0))
    coded = ex.join(F.broadcast(b), "dim").select(
        id_col, "dim", code.alias("_c")
    )
    return (
        coded.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "_c"))
            ).alias("_s")
        )
        .select(
            id_col,
            F.transform(F.col("_s"), lambda s: s["_c"]).alias("codes"),
        )
    )


def sq8_dequantize(codes_col, bounds_lo, bounds_hi):
    """codes array → array<double> of bin centers:
    x̂ = lo + (code + 0.5)·(hi − lo)/256, with lo/hi passed as literal
    arrays (zero-shuffle map pass, same broadcast-by-value shape as
    pca_project)."""
    return F.zip_with(
        codes_col,
        F.zip_with(
            bounds_lo, bounds_hi,
            lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi")),
        ),
        lambda c, b: b["lo"]
        + (c.cast("double") + 0.5) * (b["hi"] - b["lo"]) / 256.0,
    )
