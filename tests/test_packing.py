from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import packing as PK


def _docs(spark, counts, start_id=0):
    return spark.createDataFrame(
        [Row(doc_id=start_id + i, n_tok=int(n)) for i, n in enumerate(counts)],
        "doc_id long, n_tok long",
    )


class TestTokenOffsets:
    def test_matches_python_cumsum(self, spark):
        counts = [5, 0, 7, 3, 12, 1, 9]
        out = (
            PK.token_offsets(_docs(spark, counts), shard_size=3)
            .orderBy("doc_id")
            .collect()
        )
        acc, want = 0, []
        for n in counts:
            want.append(acc)
            acc += n
        assert [r.tok_start for r in out] == want

    def test_sharding_invariant(self, spark):
        """Offsets are a pure function of the id order — shard size is
        an execution detail."""
        counts = list(range(1, 40))
        d = _docs(spark, counts)
        a = {r.doc_id: r.tok_start
             for r in PK.token_offsets(d, shard_size=5).collect()}
        b = {r.doc_id: r.tok_start
             for r in PK.token_offsets(d, shard_size=1000).collect()}
        assert a == b

    def test_sparse_ids(self, spark):
        d = spark.createDataFrame(
            [Row(doc_id=2, n_tok=4), Row(doc_id=1000, n_tok=6),
             Row(doc_id=2_500_000, n_tok=1)],
            "doc_id long, n_tok long",
        )
        got = {r.doc_id: r.tok_start
               for r in PK.token_offsets(d, shard_size=1_000_000).collect()}
        assert got == {2: 0, 1000: 4, 2_500_000: 10}


class TestPackChunked:
    def test_seq_assignment_and_spans(self, spark):
        # budget 10: doc0 [0,5) seq0; doc1 [5,12) spans; doc2 [12,14) seq1
        out = (
            PK.pack_chunked(_docs(spark, [5, 7, 2]), budget=10)
            .orderBy("doc_id")
            .collect()
        )
        assert [(r.seq_id, r.seq_offset, r.spans_cut) for r in out] == [
            (0, 0, False),
            (0, 5, True),
            (1, 2, False),
        ]

    def test_zero_token_doc(self, spark):
        out = (
            PK.pack_chunked(_docs(spark, [10, 0, 1]), budget=10)
            .orderBy("doc_id")
            .collect()
        )
        # the empty doc sits exactly on the cut at offset 0, spans nothing
        assert [(r.seq_id, r.seq_offset, r.spans_cut) for r in out] == [
            (0, 0, False),
            (1, 0, False),
            (1, 0, False),
        ]


class TestPackGreedy:
    def _reference(self, counts, budget):
        bins, b, fill = [], 0, 0
        for n in counts:
            n_eff = min(n, budget)
            if fill > 0 and fill + n_eff > budget:
                b, fill = b + 1, 0
            bins.append(b)
            fill += n_eff
        return bins

    def test_matches_reference_within_shard(self, spark):
        counts = [4, 4, 4, 9, 2, 2, 2, 2, 2, 11, 1]
        out = (
            PK.pack_greedy(_docs(spark, counts), budget=10,
                           shard_size=1_000_000)
            .orderBy("doc_id")
            .collect()
        )
        assert [r.bin_in_shard for r in out] == self._reference(counts, 10)

    def test_no_bin_overflows(self, spark):
        counts = [3, 8, 2, 7, 7, 1, 10, 5, 5, 5, 6]
        out = PK.pack_greedy(_docs(spark, counts), budget=10)
        fills = (
            out.groupBy("shard", "bin_in_shard")
            .agg(F.sum(F.least("n_tok", F.lit(10))).alias("tok"))
            .collect()
        )
        assert all(r.tok <= 10 for r in fills)

    def test_overlong_doc_owns_a_bin(self, spark):
        out = (
            PK.pack_greedy(_docs(spark, [25, 3]), budget=10)
            .orderBy("doc_id")
            .collect()
        )
        # 25 > budget: capped at the budget, so doc1 starts bin 1
        assert [r.bin_in_shard for r in out] == [0, 1]

    def test_shards_pack_independently(self, spark):
        d = _docs(spark, [9, 9], start_id=0).unionByName(
            _docs(spark, [9, 9], start_id=1_000_000)
        )
        # shard_size = 2 rows → two range shards; each packs on its own
        out = PK.pack_greedy(d, budget=10, shard_size=2).collect()
        per_shard = {}
        for r in out:
            per_shard.setdefault(r.shard, []).append(r.bin_in_shard)
        assert len(per_shard) == 2
        assert all(sorted(v) == [0, 1] for v in per_shard.values())

    def test_sparse_ids_keep_shard_count_bounded(self, spark):
        """Hashed-style sparse ids: the old ``id div shard_size`` shard
        key degenerated to one shard per doc (ADVICE r2) — the adaptive
        range shard keeps #shards ≈ rows/shard_size and packing dense."""
        import random

        from pyspark.sql import Row

        rnd = random.Random(7)
        ids = sorted(rnd.sample(range(10**12), 40))
        d = spark.createDataFrame(
            [Row(doc_id=i, n_tok=5) for i in ids], "doc_id long, n_tok long"
        )
        out = PK.pack_greedy(d, budget=10, shard_size=10)
        assert out.select("shard").distinct().count() <= 8
        stats = PK.packing_stats(out, budget=10).collect()[0]
        assert stats.avg_docs_per_seq >= 1.8  # two 5-tok docs per bin

    def test_stats(self, spark):
        stats = PK.packing_stats(
            PK.pack_greedy(_docs(spark, [5, 5, 5, 5]), budget=10), budget=10
        ).collect()[0]
        assert stats.sequences == 2
        assert stats.avg_fill == 1.0
