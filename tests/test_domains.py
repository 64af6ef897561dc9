from __future__ import annotations

from pyspark.sql import Row

from inception_eventstore_spark.operators import domains as DM


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


class TestDomains:
    def test_host_normalization(self, spark):
        d = _docs(
            spark,
            [
                (1, "see https://WWW.Example.COM:8080/path?q=1 and "
                    "http://sub.example.org/x"),
                (2, "no urls here"),
            ],
        )
        got = sorted(
            (r.doc_id, r.domain) for r in DM.doc_domains(d).collect()
        )
        assert got == [(1, "example.com"), (1, "sub.example.org")]

    def test_distinct_per_doc_but_counted_mentions(self, spark):
        d = _docs(
            spark,
            [(1, "https://a.com/x https://a.com/y"), (2, "https://a.com/z")],
        )
        assert DM.doc_domains(d).count() == 2  # distinct per doc
        stats = {r.domain: (r.docs, r.mentions)
                 for r in DM.domain_stats(d).collect()}
        assert stats == {"a.com": (2, 3)}

    def test_blocklist_filter(self, spark):
        d = _docs(
            spark,
            [
                (1, "link https://spam.example/x"),
                (2, "link https://good.example/y"),
                (3, "plain text"),
            ],
        )
        blocked = spark.createDataFrame(
            [Row(domain="SPAM.example")], "domain string"
        )
        kept = sorted(
            r.doc_id for r in DM.domain_blocklist_filter(d, blocked).collect()
        )
        assert kept == [2, 3]

    def test_blocklist_plan_broadcasts_when_small(self, spark):
        """The blocklist side is hint-broadcast; the bad-id anti-join
        has no hint (an aggressive blocklist can match most of the
        corpus) — AQE still picks broadcast for a small id set, so the
        FINALIZED plan shows no shuffle join here."""
        d = _docs(spark, [(1, "https://a.com/x")])
        blocked = spark.createDataFrame([Row(domain="a.com")], "domain string")
        out = DM.domain_blocklist_filter(d, blocked)
        out.collect()  # finalize AQE so runtime join selection applies
        plan = out._jdf.queryExecution().executedPlan().toString()
        # AQE's toString appends the pre-adaptive plan after this marker
        plan = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
