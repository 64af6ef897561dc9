from __future__ import annotations

import math

from pyspark.sql import Row

from inception_eventstore_spark.operators import importance as IM


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [Row(doc_id=start + i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


class TestImportance:
    def test_logratios_match_hand_computation(self, spark):
        target = _docs(spark, ["cat cat dog"])
        source = _docs(spark, ["dog dog fish"], start=10)
        w = {r.token: r.logratio
             for r in IM.token_logratios(target, source).collect()}
        # union vocab = {cat, dog, fish}, k=0.5 → denoms = 3 + 1.5
        exp = lambda tc, sc: math.log((tc + 0.5) / 4.5) - math.log(  # noqa: E731
            (sc + 0.5) / 4.5
        )
        assert abs(w["cat"] - exp(2, 0)) < 1e-12
        assert abs(w["dog"] - exp(1, 2)) < 1e-12
        assert abs(w["fish"] - exp(0, 1)) < 1e-12

    def test_target_like_docs_score_higher(self, spark):
        target = _docs(spark, ["alpha beta gamma"] * 3)
        source = _docs(spark, ["delta epsilon zeta"] * 3, start=10)
        w = IM.token_logratios(target, source)
        cands = _docs(
            spark,
            ["alpha beta alpha", "delta zeta epsilon", "alpha zeta"],
            start=100,
        )
        scores = {r.doc_id: r.score
                  for r in IM.importance_scores(cands, w).collect()}
        assert scores[100] > scores[102] > scores[101]

    def test_multiplicity_counts(self, spark):
        target = _docs(spark, ["x"])
        source = _docs(spark, ["y"], start=10)
        w = IM.token_logratios(target, source)
        cands = _docs(spark, ["x", "x x"], start=100)
        s = {r.doc_id: r.score for r in IM.importance_scores(cands, w).collect()}
        assert abs(s[101] - 2 * s[100]) < 1e-12

    def test_empty_and_unknown_docs_score_zero(self, spark):
        target = _docs(spark, ["x"])
        source = _docs(spark, ["y"], start=10)
        w = IM.token_logratios(target, source)
        cands = _docs(spark, ["", "qqq zzz"], start=100)
        out = {r.doc_id: (r.n_scored, r.score)
               for r in IM.importance_scores(cands, w).collect()}
        assert out[100] == (0, 0.0)
        assert out[101] == (0, 0.0)  # unseen by both models → no weight rows

    def test_dsir_select_keeps_target_like(self, spark):
        target = _docs(spark, ["alpha beta gamma delta"] * 2)
        pool = _docs(
            spark,
            ["alpha beta gamma", "zeta eta theta", "iota kappa mu",
             "alpha gamma beta", "nu xi omicron", "pi rho sigma",
             "alpha beta", "tau upsilon phi"],
            start=100,
        )
        kept = {r.doc_id for r in IM.dsir_select(pool, target, 0.25).collect()}
        assert kept <= {100, 103, 106}
        assert len(kept) >= 2


class TestEssReport:
    def _run(self, spark, rows):
        from inception_eventstore_spark.operators.importance import (
            ess_report,
        )

        df = spark.createDataFrame(rows, "g string, w long")
        return {
            r["g"]: r for r in ess_report(df, "w", ["g"]).collect()
        }

    def test_equal_weights_ess_equals_n(self, spark):
        got = self._run(spark, [("a", 7)] * 20)
        r = got["a"]
        assert r["n"] == 20 and r["ess"] == 20.0
        assert r["ess_ratio"] == 1.0
        assert r["max_share"] == 0.05

    def test_dominant_weight_collapses_ess(self, spark):
        """One weight 1000 against nine weight-1 rows: ESS =
        (1009)²/(1000009) ≈ 1.018 — the weighted sample is
        effectively ONE row."""
        rows = [("a", 1000)] + [("a", 1)] * 9
        r = self._run(spark, rows)["a"]
        assert r["n"] == 10
        assert r["ess"] == round(1009.0**2 / 1000009.0, 6)
        assert r["ess"] < 1.1
        assert r["max_share"] == round(1000.0 / 1009.0, 6)

    def test_zero_and_null_weights_excluded(self, spark):
        rows = [("a", 5), ("a", 0), ("a", None), ("a", 5)]
        r = self._run(spark, rows)["a"]
        assert r["n"] == 2 and r["sw"] == 10
