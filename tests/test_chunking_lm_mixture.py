"""Tests for round-3 pipeline operators: context chunking, vocabulary,
bigram LM scoring, quality-aware dedup survivors, temperature mixture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.chunking import (
    chunk_stats,
    chunk_text,
)
from inception_eventstore_spark.operators.components import dedup_survivors
from inception_eventstore_spark.operators.lm import bigram_lm_score
from inception_eventstore_spark.operators.sampling import temperature_mixture
from inception_eventstore_spark.operators.text import vocabulary


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )


class TestChunkText:
    def test_boundaries_and_overlap(self, spark):
        text = "abcdefghij" * 3  # 30 chars
        out = (
            chunk_text(_docs(spark, [text]), chunk_chars=12, overlap_chars=4)
            .orderBy("chunk_idx")
            .collect()
        )
        # stride 8: starts 0, 8, 16, 24 → ceil((30-4)/8) = 4 chunks
        assert [(r.chunk_idx, r.chunk_start) for r in out] == [
            (0, 0), (1, 8), (2, 16), (3, 24)
        ]
        assert [r.chunk_text for r in out] == [
            text[0:12], text[8:20], text[16:28], text[24:30]
        ]
        # consecutive chunks share exactly overlap chars
        assert out[0].chunk_text[-4:] == out[1].chunk_text[:4]

    def test_short_and_empty_docs(self, spark):
        out = chunk_text(
            _docs(spark, ["abc", ""]), chunk_chars=10, overlap_chars=2
        ).collect()
        assert [(r.doc_id, r.chunk_idx, r.chunk_text) for r in out] == [
            (0, 0, "abc")
        ]

    def test_no_overlap_covers_exactly(self, spark):
        out = chunk_text(
            _docs(spark, ["x" * 25]), chunk_chars=10, overlap_chars=0
        ).collect()
        assert "".join(r.chunk_text for r in sorted(out, key=lambda r: r.chunk_idx)) == "x" * 25

    def test_validation(self, spark):
        d = _docs(spark, ["abc"])
        with pytest.raises(ValueError):
            chunk_text(d, chunk_chars=0)
        with pytest.raises(ValueError):
            chunk_text(d, chunk_chars=5, overlap_chars=5)

    def test_stats(self, spark):
        chunks = chunk_text(
            _docs(spark, ["x" * 25]), chunk_chars=10, overlap_chars=0
        )
        row = chunk_stats(chunks).collect()[0]
        assert (row.n_chunks, row.chunk_chars_total) == (3, 25)


class TestVocabulary:
    def test_counts_and_order(self, spark):
        d = _docs(spark, ["the cat the dog", "the bird"])
        out = vocabulary(d, k=2).collect()
        assert [(r.token, r.tf, r.df) for r in out] == [
            ("the", 3, 2), ("bird", 1, 1)  # tie on tf=1 → token asc
        ]


class TestBigramLm:
    def test_matches_python_reference(self, spark):
        corpus = ["a b a b", "a b c", "c c"]
        d = _docs(spark, corpus)
        got = {
            r.doc_id: (r.n_bigrams, r.lm_score)
            for r in bigram_lm_score(d).collect()
        }
        # python reference model over the same corpus
        bgs, c1, vocab = {}, {}, set()
        for t in corpus:
            toks = t.split()
            vocab.update(toks)
            for a, b in zip(toks, toks[1:]):
                bgs[(a, b)] = bgs.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
        for i, t in enumerate(corpus):
            toks = t.split()
            lps = [
                math.log((bgs[(a, b)] + 1) / (c1[a] + len(vocab)))
                for a, b in zip(toks, toks[1:])
            ]
            assert got[i][0] == len(lps)
            assert got[i][1] == pytest.approx(
                round(sum(lps) / len(lps), 6), abs=1e-6
            )

    def test_single_token_docs_dropped(self, spark):
        out = bigram_lm_score(_docs(spark, ["solo", "a b"])).collect()
        assert [r.doc_id for r in out] == [1]

    def test_unseen_bigrams_fall_back_to_floor(self, spark):
        ref = _docs(spark, ["a b a b"])
        target = spark.createDataFrame(
            [Row(doc_id=100, text="a z"), Row(doc_id=101, text="q z")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.lm_score
            for r in bigram_lm_score(target, ref=ref).collect()
        }
        # ref: c2(a,b)=2, c1(a)=2 (only 'a' continues), V=2
        assert got[100] == pytest.approx(round(math.log(1 / 4), 6), abs=1e-6)
        assert got[101] == pytest.approx(round(math.log(1 / 2), 6), abs=1e-6)


class TestDedupSurvivors:
    def test_highest_quality_wins(self, spark):
        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 20), (4, 5), (5, 99)],
            "doc_id long, quality long",
        )
        # components: {1,2,3} (via 1-2, 2-3) and {4}; 5 untouched
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 4)], "id_a long, id_b long"
        ).where(F.col("id_a") != F.col("id_b"))
        out = sorted(
            r.doc_id
            for r in dedup_survivors(docs, pairs, "quality").collect()
        )
        assert out == [2, 4, 5]  # 2 wins its cluster; 4,5 untouched

    def test_tie_breaks_to_smallest_id(self, spark):
        docs = spark.createDataFrame(
            [(7, 1), (8, 1)], "doc_id long, quality long"
        )
        pairs = spark.createDataFrame([(7, 8)], "id_a long, id_b long")
        out = [r.doc_id for r in dedup_survivors(docs, pairs, "quality").collect()]
        assert out == [7]


class TestTemperatureMixture:
    def _domains(self, spark):
        rows = [(i, "big") for i in range(900)] + [
            (1000 + i, "small") for i in range(100)
        ]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_alpha_one_keeps_everything(self, spark):
        d = self._domains(spark)
        assert temperature_mixture(d, alpha=1.0).count() == 1000

    def test_flattening_downsamples_dominant_domain(self, spark):
        d = self._domains(spark)
        out = temperature_mixture(d, alpha=0.5)
        by = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by["small"] == 100  # rare domain capped at keep-all
        # big: w=(0.9^.5)/(0.9^.5+0.1^.5)≈0.75 → frac≈0.833·1000/900
        assert 700 < by["big"] < 900

    def test_deterministic(self, spark):
        d = self._domains(spark)
        a = {r.doc_id for r in temperature_mixture(d, alpha=0.5).collect()}
        b = {r.doc_id for r in temperature_mixture(d, alpha=0.5).collect()}
        assert a == b

    def test_alpha_validation(self, spark):
        with pytest.raises(ValueError):
            temperature_mixture(self._domains(spark), alpha=-0.1)

    def test_null_domains_are_sampled_not_dropped(self, spark):
        rows = [(i, None if i % 2 else "en") for i in range(400)]
        d = spark.createDataFrame(rows, "doc_id long, lang string")
        out = temperature_mixture(d, alpha=1.0)
        # alpha=1 keeps the natural distribution: every row survives,
        # including the 200 null-domain ones
        assert out.count() == 400
        assert out.where(out.lang.isNull()).count() == 200

    def test_many_domains_join_path_matches_case_path(self, spark):
        """> 64 domains switches to the broadcast threshold table — the
        selected id set must be identical to the CASE-chain arithmetic."""
        rows = [(i, f"d{i % 100}") for i in range(2000)]
        d = spark.createDataFrame(rows, "doc_id long, lang string")
        out = temperature_mixture(d, alpha=0.5)
        kept = {r.doc_id for r in out.collect()}
        # replicate the fraction arithmetic + md5 bucket test in python
        import hashlib

        counts: dict[str, int] = {}
        for _, dom in rows:
            counts[dom] = counts.get(dom, 0) + 1
        total = len(rows)
        weights = {k: (v / total) ** 0.5 for k, v in counts.items()}
        wsum = sum(weights.values())
        fracs = {
            k: min(1.0, (w / wsum) * total / counts[k])
            for k, w in weights.items()
        }
        expect = set()
        for i, dom in rows:
            h = int(hashlib.md5(f"v1:{i}".encode()).hexdigest()[:15], 16)
            if h % 1_000_000 < int(round(fracs[dom] * 1_000_000)):
                expect.add(i)
        assert kept == expect


class TestStupidBackoff:
    def _py_model(self, docs, alpha=0.4):
        import math
        from collections import Counter

        toks = {i: t.split() for i, t in docs.items()}
        c3, c2, c1 = Counter(), Counter(), Counter()
        for t in toks.values():
            c1.update(t)
            c2.update(zip(t, t[1:]))
            c3.update(zip(t, t[1:], t[2:]))
        T, V = sum(c1.values()), len(c1)
        out = {}
        for i, t in toks.items():
            lps = []
            for a, b, c in zip(t, t[1:], t[2:]):
                if c3[(a, b, c)]:
                    s = c3[(a, b, c)] / c2[(a, b)]
                elif c2[(b, c)]:
                    s = alpha * c2[(b, c)] / c1[b]
                else:
                    s = alpha * alpha * (c1[c] + 1) / (T + V)
                lps.append(math.log(s))
            if lps:
                out[i] = (len(lps), round(sum(lps) / len(lps), 6))
        return out

    def test_matches_python_model(self, spark):
        from inception_eventstore_spark.operators.lm import (
            stupid_backoff_score,
        )

        docs = {
            0: "the cat sat on the mat",
            1: "the cat sat on the hat",
            2: "a dog ran over the mat",
            3: "completely novel words entirely",
            4: "hi",  # < 3 tokens → dropped
        }
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_trigrams"], r["sb_score"])
            for r in stupid_backoff_score(df).collect()
        }
        want = self._py_model(docs)
        assert set(got) == set(want)
        for d in want:
            assert got[d][0] == want[d][0]
            assert got[d][1] == pytest.approx(want[d][1], abs=2e-6), d

    def test_fluent_beats_shuffled(self, spark):
        from inception_eventstore_spark.operators.lm import (
            stupid_backoff_score,
        )

        base = "the quick brown fox jumps over the lazy dog"
        ref_rows = [(i, base) for i in range(10)]
        probe = [(100, base), (101, "dog the over quick lazy fox the brown jumps")]
        ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
        df = spark.createDataFrame(probe, "doc_id long, text string")
        got = {
            r["doc_id"]: r["sb_score"]
            for r in stupid_backoff_score(df, ref=ref).collect()
        }
        assert got[100] > got[101]


class TestHeldoutPerplexity:
    def test_matches_python_reference(self, spark):
        import hashlib
        import math

        from inception_eventstore_spark.operators.lm import (
            heldout_perplexity,
        )

        docs = [(i, " ".join(
            ["alpha", "beta", "gamma", "delta"][j % 4]
            for j in range(i % 7 + 2)
        )) for i in range(40)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])

        def fold(d):
            h = hashlib.md5(f"kfold-v1:{d}".encode()).hexdigest()
            return int(h[:15], 16) % 5

        train = [t for d, t in docs if fold(d) != 0]
        test = [(d, t) for d, t in docs if fold(d) == 0]
        c2, c1, vocab = {}, {}, set()
        for t in train:
            tk = t.split()
            vocab.update(tk)
            for a, b in zip(tk, tk[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
        per_doc = []
        for d, t in test:
            tk = t.split()
            lps = [
                math.log((c2.get((a, b), 0) + 1)
                         / (c1.get(a, 0) + len(vocab)))
                for a, b in zip(tk, tk[1:])
            ]
            if lps:
                per_doc.append((len(lps), round(sum(lps) / len(lps), 6)))
        nb = sum(n for n, _ in per_doc)
        xe = -sum(n * s for n, s in per_doc) / nb
        row = heldout_perplexity(df, k_folds=5, test_fold=0).first()
        assert row["n_test_docs"] == len(per_doc)
        assert row["n_bigrams"] == nb
        assert row["cross_entropy"] == pytest.approx(xe, abs=1e-6)
        assert row["perplexity"] == pytest.approx(math.exp(xe), abs=1e-4)

    def test_unseen_bigrams_hit_smoothing_floor(self, spark):
        from inception_eventstore_spark.operators.lm import (
            heldout_perplexity,
        )

        # ppl on a real split must exceed the self-scored corpus (the
        # held-out fold contains bigrams the train counts never saw)
        docs = spark.createDataFrame(
            [(i, f"w{i} w{i + 1} w{i + 2} shared tail") for i in range(30)],
            ["doc_id", "text"],
        )
        row = heldout_perplexity(docs).first()
        assert row["perplexity"] > 1.0 and row["cross_entropy"] > 0

    def test_fold_guard(self, spark):
        from inception_eventstore_spark.operators.lm import (
            heldout_perplexity,
        )

        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            heldout_perplexity(df, k_folds=5, test_fold=5)
