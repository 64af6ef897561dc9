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


class TestCanonicalUrl:
    def _canon(self, spark, urls):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.domains import (
            canonical_url,
        )

        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                                   ["i", "u"])
        return [r["c"] for r in
                df.select(canonical_url(F.col("u")).alias("c"))
                .orderBy("i").collect()]

    def test_variants_collapse(self, spark):
        variants = [
            "https://WWW.Shop.Example.com:443/item/3/?utm_source=x&b=2&a=1#f",
            "https://shop.example.com/item/3?a=1&b=2&gclid=zz",
            "HTTPS://shop.example.com/item/3?b=2&a=1",
        ]
        got = self._canon(spark, variants)
        assert got == ["https://shop.example.com/item/3?a=1&b=2"] * 3

    def test_individual_rules(self, spark):
        cases = {
            "http://a.com:80/x": "http://a.com/x",
            "http://a.com:8080/x": "http://a.com:8080/x",  # non-default kept
            "http://a.com/": "http://a.com",
            "http://a.com/p?utm_campaign=c": "http://a.com/p",
            "http://a.com/p?ref=h&z=1": "http://a.com/p?z=1",
            "http://a.com/CasePath": "http://a.com/CasePath",  # path case kept
        }
        got = self._canon(spark, list(cases))
        assert got == list(cases.values())

    def test_corpus_collapse_counts(self, spark):
        from inception_eventstore_spark.operators.domains import (
            canonical_doc_urls,
        )

        df = spark.createDataFrame(
            [(0, "see https://x.com/a?b=1&a=2 and https://X.com/a?a=2&b=1"),
             (1, "ref https://www.x.com/a/?a=2&b=1#top")],
            ["doc_id", "text"],
        )
        rows = canonical_doc_urls(df).collect()
        assert len(rows) == 1
        assert rows[0]["canonical_url"] == "https://x.com/a?a=2&b=1"
        assert (rows[0]["n_raw"], rows[0]["n_docs"]) == (3, 2)
