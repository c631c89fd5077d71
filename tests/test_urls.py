"""URL / domain curation functions (functions/urls.py)."""

import pytest

from pyspark.sql import functions as F

from pandas_plus_spark.functions import urls


def _one(spark, url, col):
    return spark.createDataFrame([(url,)], "u string").select(
        col(F.col("u")).alias("v")).first()["v"]


class TestUrlHost:
    @pytest.mark.parametrize("url,host", [
        ("http://Example.COM/path", "example.com"),
        ("https://www.Site.co.uk:8443/x?y=1#z", "www.site.co.uk"),
        ("http://10.0.0.1:8080/", "10.0.0.1"),
        ("not a url at all", None),
    ])
    def test_host(self, spark, url, host):
        assert _one(spark, url, urls.url_host) == host


class TestUrlNormalize:
    @pytest.mark.parametrize("url,norm", [
        # scheme/host case, default port, fragment, bare path
        ("HTTP://Example.COM:80/#frag", "http://example.com"),
        ("https://Example.com:443/a/b", "https://example.com/a/b"),
        # non-default port kept; query kept verbatim (order preserved)
        ("http://h.io:8080/p?b=2&a=1", "http://h.io:8080/p?b=2&a=1"),
        ("https://h.io/?q=1#s", "https://h.io?q=1"),
        # default port of the OTHER scheme is not default here
        ("http://h.io:443/x", "http://h.io:443/x"),
    ])
    def test_normalize(self, spark, url, norm):
        assert _one(spark, url, urls.url_normalize) == norm


class TestRegistrableDomain:
    @pytest.mark.parametrize("host,dom", [
        ("www.example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("news.site.com.au", "site.com.au"),
        ("example.io", "example.io"),
        ("www.example.io", "example.io"),
        ("localhost", "localhost"),
        ("10.1.2.3", "10.1.2.3"),          # IPv4 passes through whole
        ("co.uk", "co.uk"),                 # bare suffix: passthrough
        (None, None),
    ])
    def test_domain(self, spark, host, dom):
        got = spark.createDataFrame([(host,)], "h string").select(
            urls.registrable_domain(F.col("h")).alias("v")).first()["v"]
        assert got == dom

    def test_composes_with_host(self, spark):
        df = spark.createDataFrame(
            [("https://News.Site.co.uk/a",), ("http://www.x.org/b",)],
            "u string")
        got = [r["d"] for r in df.select(
            urls.registrable_domain(urls.url_host(F.col("u"))).alias("d")
        ).collect()]
        assert got == ["site.co.uk", "x.org"]
