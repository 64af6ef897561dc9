"""Tests for PII detection/redaction (operators/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from inception_eventstore_spark.operators import pii as P


def _row(spark, text):
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    return P.redact_documents(df).first()


class TestDetection:
    def test_email(self, spark):
        r = _row(spark, "write to jane.doe+spam@sub.example.co.uk today")
        assert r["n_email"] == 1
        assert "[EMAIL]" in r["redacted"] and "@" not in r["redacted"]

    def test_url_and_ipv4(self, spark):
        r = _row(spark, "visit https://ex.org/a?b=1 or ping 10.0.255.7 now")
        assert r["n_url"] == 1 and r["n_ipv4"] == 1
        assert "[URL]" in r["redacted"] and "[IP]" in r["redacted"]

    def test_phone_requires_plus_or_paren(self, spark):
        r = _row(spark, "call +1 (555) 123-4567 or (020) 7946 0958 now")
        assert r["n_phone"] == 2
        # bare digit runs (order ids, IPs) must NOT match the phone rule
        r2 = _row(spark, "order 123456789012 shipped to 192.168.0.1")
        assert r2["n_phone"] == 0

    def test_ip_not_counted_as_phone(self, spark):
        r = _row(spark, "server 192.168.100.200 port 8080")
        assert r["n_ipv4"] == 1 and r["n_phone"] == 0

    def test_clean_text_untouched(self, spark):
        text = "perfectly ordinary sentence with no identifiers"
        r = _row(spark, text)
        assert r["redacted"] == text
        assert (r["n_email"], r["n_url"], r["n_ipv4"], r["n_phone"]) == (
            0, 0, 0, 0,
        )


class TestRedactionOrder:
    def test_masks_contain_no_digits_for_rematch(self, spark):
        # an IP-literal "email" misses the email rule (no alpha TLD) but
        # the IP rule still masks the raw address — nothing leaks
        r = _row(spark, "odd address user@192.168.1.1 here")
        assert r["redacted"] == "odd address user@[IP] here"
        # a URL containing digits is consumed whole by the URL rule
        # before the IP rule can bite into its path
        r2 = _row(spark, "see http://1.2.3.4/path?x=9 there")
        assert r2["redacted"] == "see [URL] there"

    def test_multiple_kinds_one_doc(self, spark):
        r = _row(
            spark,
            "a@b.com then https://c.de/f then 1.2.3.4 then +49 30 901820",
        )
        assert r["redacted"] == (
            "[EMAIL] then [URL] then [IP] then [PHONE]"
        )


class TestLDiversity:
    def _df(self, spark):
        # class A: 4 rows, 1 distinct secret (violates l=3, 4 at risk)
        # class B: 3 rows, 3 distinct (ok)  class C: 2 rows, 2 (violates)
        rows = (
            [("A", f"r{i}", "s1") for i in range(4)]
            + [("B", f"r{i}", f"s{i}") for i in range(3)]
            + [("C", "r0", "s1"), ("C", "r1", "s2")]
        )
        return spark.createDataFrame(rows, ["qi", "pad", "secret"])

    def test_report(self, spark):
        from inception_eventstore_spark.operators.pii import (
            l_diversity_report,
        )

        r = l_diversity_report(self._df(spark), ["qi"], "secret", l=3).first()
        assert r["l_diversity"] == 1
        assert r["n_groups"] == 3
        assert r["n_violating_groups"] == 2
        assert r["rows_at_risk"] == 6  # A(4) + C(2)
        assert r["n_rows"] == 9

    def test_k_anonymous_but_not_diverse(self, spark):
        """The case the check exists for: class A is 4-anonymous yet
        1-diverse — k alone would pass it at k=4."""
        from inception_eventstore_spark.operators.pii import (
            k_anonymity_report,
            l_diversity_report,
        )

        df = self._df(spark).where(F.col("qi") == "A")
        assert k_anonymity_report(df, ["qi"], k=4).first()["k_anonymity"] == 4
        assert (
            l_diversity_report(df, ["qi"], "secret", l=2).first()[
                "n_violating_groups"
            ]
            == 1
        )

    def test_guards(self, spark):
        import pytest

        from inception_eventstore_spark.operators.pii import (
            l_diversity_report,
        )

        df = self._df(spark)
        with pytest.raises(ValueError):
            l_diversity_report(df, [], "secret")
        with pytest.raises(ValueError):
            l_diversity_report(df, ["qi"], "secret", l=0)


class TestTCloseness:
    def _df(self, spark):
        # secrets domain {s1, s2}; global: s1=6, s2=2, N=8
        # A=[s1,s1,s1] TVD=1/4;  B=[s1,s2,s2] TVD=5/12;  C=[s1,s1] TVD=1/4
        rows = (
            [("A", "s1")] * 3
            + [("B", "s1"), ("B", "s2"), ("B", "s2")]
            + [("C", "s1")] * 2
        )
        return spark.createDataFrame(rows, ["qi", "secret"])

    def test_report_exact_tvd(self, spark):
        r = P.t_closeness_report(
            self._df(spark), ["qi"], "secret", t_num=3, t_den=10
        ).first()
        assert r["max_tvd"] == 0.416667  # 5/12 at 6 dp
        assert r["n_groups"] == 3
        assert r["n_violating_groups"] == 1  # only B > 0.3
        assert r["rows_at_risk"] == 3
        assert r["n_rows"] == 8

    def test_threshold_is_strict(self, spark):
        # t = 1/4: A and C sit EXACTLY at 1/4 -> not violations
        r = P.t_closeness_report(
            self._df(spark), ["qi"], "secret", t_num=1, t_den=4
        ).first()
        assert r["n_violating_groups"] == 1
        assert r["rows_at_risk"] == 3
        # t just below 1/4: the boundary classes flip in
        r2 = P.t_closeness_report(
            self._df(spark), ["qi"], "secret", t_num=249, t_den=1000
        ).first()
        assert r2["n_violating_groups"] == 3
        assert r2["rows_at_risk"] == 8

    def test_single_class_matches_global(self, spark):
        # one class == the corpus -> TVD 0, nothing violates
        df = self._df(spark).withColumn("qi", F.lit("all"))
        r = P.t_closeness_report(df, ["qi"], "secret", 1, 100).first()
        assert r["max_tvd"] == 0.0
        assert r["n_violating_groups"] == 0

    def test_guards(self, spark):
        import pytest

        df = self._df(spark)
        with pytest.raises(ValueError):
            P.t_closeness_report(df, [], "secret")
        with pytest.raises(ValueError):
            P.t_closeness_report(df, ["qi"], "secret", t_num=0)


class TestDpNoisyCounts:
    def test_noise_bounded_and_deterministic(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.pii import (
            dp_noisy_counts,
        )

        rows = [
            (u, ("click", "view", "purchase")[u % 3],
             dt.datetime(2024, 1, 1 + u % 5, 0, 0, 0))
            for u in range(300)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        a = {r["grp"]: (r["noise"], r["noisy_count"])
             for r in dp_noisy_counts(df, bound=24).collect()}
        b = {r["grp"]: (r["noise"], r["noisy_count"])
             for r in dp_noisy_counts(df, bound=24).collect()}
        assert a == b  # deterministic release
        assert all(abs(n) <= 24 for n, _ in a.values())
        assert a["click"][1] == 100 + a["click"][0]

    def test_release_id_changes_draw_thresholds_calibrated(self, spark):
        from inception_eventstore_spark.operators.pii import (
            discrete_laplace_thresholds,
        )
        import math

        th = discrete_laplace_thresholds(epsilon=0.5, bound=24)
        assert len(th) == 49 and th[-1] == 1 << 20
        assert all(b >= a for a, b in zip(th, th[1:]))
        # P(noise = 0) mass matches (1−α)/(1+α) within quantization
        a = math.exp(-0.5)
        p0 = (th[24] - th[23]) / float(1 << 20)
        assert abs(p0 - (1 - a) / (1 + a)) < 1e-5
