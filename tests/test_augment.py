"""Tests for deterministic augmentation plans (operators/augment)."""

from __future__ import annotations

import hashlib

import pytest

from inception_eventstore_spark.operators.augment import (
    span_corruption_plan,
)


def _masked(doc_id: int, idx: int, thr: int) -> bool:
    h = hashlib.md5(f"span-v1:{doc_id}:{idx}".encode()).hexdigest()
    return int(h[:15], 16) < thr


class TestSpanCorruption:
    def test_matches_python_reference(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(30))) for i in range(8)],
            ["doc_id", "text"],
        )
        thr = ((1 << 60) * 150) // 1000
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["n_masked"], r["n_spans"],
                r["max_span_len"],
            )
            for r in span_corruption_plan(docs).collect()
        }
        for d in range(8):
            mask = [_masked(d, i, thr) for i in range(30)]
            spans = []
            run = 0
            for m in mask:
                if m:
                    run += 1
                elif run:
                    spans.append(run)
                    run = 0
            if run:
                spans.append(run)
            assert got[d] == (
                30, sum(mask), len(spans), max(spans) if spans else 0
            )

    def test_rate_controls_mask_fraction(self, spark):
        docs = spark.createDataFrame(
            [(1, " ".join(f"t{j}" for j in range(4000)))],
            ["doc_id", "text"],
        )
        row = span_corruption_plan(docs, rate_permille=150).first()
        # content-keyed hash is uniform: 4000 draws at 15% land well
        # inside +-3 sigma (~+-1.7%)
        assert 0.12 < row["mask_rate"] < 0.18
        # spans collapse runs, so there are never more spans than
        # masked tokens, and at least one multi-token span shows up
        # at this length
        assert row["n_spans"] <= row["n_masked"]
        assert row["max_span_len"] >= 2

    def test_empty_and_zero_token_docs_absent(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, ""), (3, "   ")], ["doc_id", "text"]
        )
        ids = {r["doc_id"] for r in span_corruption_plan(docs).collect()}
        assert ids == {1}

    def test_rate_guard(self, spark):
        docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            span_corruption_plan(docs, rate_permille=0)
        with pytest.raises(ValueError):
            span_corruption_plan(docs, rate_permille=1000)
