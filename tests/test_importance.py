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
