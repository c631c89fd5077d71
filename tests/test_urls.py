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

class TestRegistrableDomainPSL:
    """with_registrable_domain — the REAL publicsuffix.org algorithm as
    broadcast joins: longest matching rule, wildcards, exceptions,
    private-section platform suffixes."""

    def _run(self, spark, hosts, **kw):
        df = spark.createDataFrame([(h,) for h in hosts], "h string")
        out = urls.with_registrable_domain(df, "h", out="d", **kw)
        return dict(out.select("h", "d").collect())

    def test_exact_and_private_rules(self, spark):
        got = self._run(spark, [
            "www.example.com", "a.b.example.co.uk", "news.site.com.au",
            "deep.sub.x.gob.mx", "user.github.io", "www.user.github.io",
            "b.s3.amazonaws.com", "plain.org",
        ])
        assert got["www.example.com"] == "example.com"
        assert got["a.b.example.co.uk"] == "example.co.uk"
        assert got["news.site.com.au"] == "site.com.au"
        # gob.mx: outside the heuristic's 7-family set, right under PSL
        assert got["deep.sub.x.gob.mx"] == "x.gob.mx"
        # private-section platform rule: user content is the registrable unit
        assert got["user.github.io"] == "user.github.io"
        assert got["www.user.github.io"] == "user.github.io"
        assert got["b.s3.amazonaws.com"] == "b.s3.amazonaws.com"
        assert got["plain.org"] == "plain.org"

    def test_wildcard_and_exception(self, spark):
        got = self._run(spark, [
            "anything.ck", "www.anything.ck", "www.ck", "sub.www.ck",
            "foo.bar.np", "ck",
        ])
        # *.ck: every second-level label is itself a public suffix
        assert got["anything.ck"] == "anything.ck"     # host == suffix
        assert got["www.anything.ck"] == "www.anything.ck"
        # !www.ck exception: www.ck IS registrable
        assert got["www.ck"] == "www.ck"
        assert got["sub.www.ck"] == "www.ck"
        assert got["foo.bar.np"] == "foo.bar.np"       # *.np
        assert got["ck"] == "ck"                       # bare TLD

    def test_passthrough_and_null(self, spark):
        got = self._run(spark, ["10.1.2.3", "localhost", "co.uk", None])
        assert got["10.1.2.3"] == "10.1.2.3"
        assert got["localhost"] == "localhost"
        assert got["co.uk"] == "co.uk"                 # host == public suffix
        assert got[None] is None

    def test_heuristic_divergence_documented(self, spark):
        """The cases the retired heuristic got wrong, pinned."""
        got = self._run(spark, ["www.x.gob.mx", "u.github.io"])
        assert got["www.x.gob.mx"] == "x.gob.mx"
        assert got["u.github.io"] == "u.github.io"
        # heuristic answers for the same hosts (kept as the no-join fallback)
        heur = dict(spark.createDataFrame(
            [("www.x.gob.mx",), ("u.github.io",)], "h string").select(
            "h", urls.registrable_domain(F.col("h")).alias("d")).collect())
        assert heur["www.x.gob.mx"] == "gob.mx"        # wrong: suffix only
        assert heur["u.github.io"] == "github.io"      # wrong: platform root

    def test_full_dat_loader(self, spark, tmp_path):
        """load_psl_rules parses the publicsuffix.org dat format: comments,
        wildcards, exceptions, the private-section markers."""
        dat = tmp_path / "psl.dat"
        dat.write_text("\n".join([
            "// ===BEGIN ICANN DOMAINS===",
            "com", "uk", "co.uk",
            "jp",
            "*.kawasaki.jp",
            "!city.kawasaki.jp",
            "// ===END ICANN DOMAINS===",
            "// ===BEGIN PRIVATE DOMAINS===",
            "example-pages.dev",
            "// ===END PRIVATE DOMAINS===",
        ]))
        rules = urls.load_psl_rules(str(dat))
        assert ("co.uk", False, False) in rules
        assert ("kawasaki.jp", True, False) in rules
        assert ("city.kawasaki.jp", False, True) in rules
        assert ("example-pages.dev", False, False) in rules
        assert not any(k == "com" for k, _, _ in rules)  # bare TLD skipped
        no_priv = urls.load_psl_rules(str(dat), include_private=False)
        assert not any(k == "example-pages.dev" for k, _, _ in no_priv)
        rdf = urls.psl_rules_df(spark, rules)
        got = self._run(spark, [
            "a.b.kawasaki.jp", "city.kawasaki.jp", "x.city.kawasaki.jp",
            "shop.example-pages.dev",
        ], rules_df=rdf)
        # *.kawasaki.jp: b.kawasaki.jp is a public suffix
        assert got["a.b.kawasaki.jp"] == "a.b.kawasaki.jp"
        # !city.kawasaki.jp: the exception carves the city domain out
        assert got["city.kawasaki.jp"] == "city.kawasaki.jp"
        assert got["x.city.kawasaki.jp"] == "city.kawasaki.jp"
        assert got["shop.example-pages.dev"] == "shop.example-pages.dev"


class TestPSLProperty:
    def test_random_hosts_match_reference_algorithm(self, spark):
        """with_registrable_domain == an independent pure-Python
        implementation of the publicsuffix.org algorithm over the same
        rules, on a randomized host corpus (labels drawn from rule
        vocabulary + noise so exact, wildcard, exception, private and
        default paths all fire). Since r10 ``psl_rules()`` returns the
        FULL packaged list (~8k rules), so the property samples the
        complete rule set, including 5-label private rules."""
        import random
        rules = urls.psl_rules()
        assert len(rules) > 5000  # the full packaged list, not the subset

        def ref_domain(host):
            if host is None:
                return None
            import re
            if re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", host):
                return host
            labels = host.split(".")
            n = len(labels)
            ps = 1
            exc = None
            for key, wild, is_exc in rules:
                klabels = key.split(".")
                k = len(klabels)
                if k > n or labels[n - k:] != klabels:
                    continue
                if is_exc:
                    exc = max(exc or 0, k - 1)
                elif wild:
                    if n >= k + 1:
                        ps = max(ps, k + 1)
                else:
                    ps = max(ps, k)
            if exc is not None:
                ps = exc
            # registrable domain = public suffix + one label
            return host if n <= ps else ".".join(labels[n - ps - 1:])

        rng = random.Random(91)
        vocab = ["www", "a", "blog", "shop", "deep", "co", "com", "gov",
                 "uk", "au", "jp", "mx", "gob", "github", "io", "ck",
                 "np", "kawasaki", "example", "x1", "localhost", "dev",
                 "pages", "amazonaws", "s3", "dualstack", "city",
                 "nagoya", "bw"]
        hosts = [".".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, 5)))
                 for _ in range(300)]
        hosts += ["10.0.0.1", "www.ck", "sub.www.ck", None,
                  # full-list-only rules: 5-label private suffix (derived
                  # join depth), wildcard+exception jp city domains, a
                  # ccTLD second-level outside the old curated subset
                  "x.s3.dualstack.eu-central-1.amazonaws.com",
                  "www.city.kawasaki.jp", "foo.city.nagoya.jp",
                  "pix.akita.jp", "a.co.bw"]
        df = spark.createDataFrame([(h,) for h in hosts], "h string")
        got = {r.h: r.d for r in urls.with_registrable_domain(
            df, "h", out="d").select("h", "d").distinct().collect()}
        for h in set(hosts):
            assert got[h] == ref_domain(h), h


class TestRobots:
    """RFC 9309 robots.txt semantics: group selection, longest-match
    precedence, wildcards/anchors, and the Spark-side broadcast flow."""

    def test_group_selection_longest_ua_and_star_fallback(self):
        from pandas_plus_spark.functions.robots import parse_robots_rules
        body = ("User-agent: bot\nDisallow: /a\n\n"
                "User-agent: bot-special\nAllow: /a\n\n"
                "User-agent: *\nDisallow: /\n")
        # exact product-token match picks the group ('bot' does NOT
        # absorb 'bot-special'); '*' only when nothing matches
        assert parse_robots_rules(body, "bot-special/1.0") == [(True, "/a")]
        assert parse_robots_rules(body, "bot/2") == [(False, "/a")]
        assert parse_robots_rules(body, "unrelated") == [(False, "/")]
        # adjacent UA lines share one group
        multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots_rules(multi, "b") == [(False, "/x")]
        assert parse_robots_rules(None, "b") == []

    def test_versioned_ua_and_multi_group_merge(self):
        """r12 advisor fixes: a 'User-agent: FooBot/1.2' line matches
        product token 'foobot' (RFC 9309 strips the version), and rules
        from ALL groups matching the agent are COMBINED, not just one."""
        from pandas_plus_spark.functions.robots import (parse_robots_rules,
                                                        robots_allowed)
        body = ("User-agent: FooBot/1.2\nDisallow: /a\n\n"
                "User-agent: foobot\nDisallow: /b\n\n"
                "User-agent: *\nDisallow: /c\n")
        rules = parse_robots_rules(body, "FooBot")
        # both foobot groups merged; star group NOT mixed in
        assert rules == [(False, "/a"), (False, "/b")]
        assert not robots_allowed(rules, "/a/x")
        assert not robots_allowed(rules, "/b/x")
        assert robots_allowed(rules, "/c/x")
        # a matched group with directive-terminated empty rules means
        # unrestricted — no fallback to '*'
        empty = ("User-agent: foobot\nCrawl-delay: 5\n\n"
                 "User-agent: *\nDisallow: /\n")
        assert parse_robots_rules(empty, "foobot") == []
        # star groups combine too
        stars = ("User-agent: *\nDisallow: /x\n\n"
                 "User-agent: *\nDisallow: /y\n")
        assert parse_robots_rules(stars, "any") == [(False, "/x"),
                                                    (False, "/y")]

    def test_longest_match_wildcard_anchor_and_ties(self):
        from pandas_plus_spark.functions.robots import (parse_robots_rules,
                                                        robots_allowed)
        rules = parse_robots_rules(
            "User-agent: *\n"
            "Disallow: /p/\nAllow: /p/ok/\n"
            "Disallow: /q*z$\n"
            "Allow: /tie\nDisallow: /tie\n"     # equal length: Allow wins
            "Disallow:\n")                       # empty = no restriction
        assert not robots_allowed(rules, "/p/x")
        assert robots_allowed(rules, "/p/ok/deep")
        assert not robots_allowed(rules, "/q-anything-z")
        assert robots_allowed(rules, "/q-anything-z-more")  # anchor
        assert robots_allowed(rules, "/tie")                # tie -> allow
        assert robots_allowed(rules, "/other")

    def test_filter_robots_sparkside(self, spark):
        import pandas as pd

        from pandas_plus_spark.functions.robots import filter_robots
        urls = spark.createDataFrame(pd.DataFrame({
            "url": ["http://a.com/private/x", "http://a.com/private/ok/y",
                    "http://b.com/tmp/q", "http://nobots.com/z"],
            "host": ["a.com", "a.com", "b.com", "nobots.com"]}))
        robots = spark.createDataFrame(pd.DataFrame({
            "host": ["a.com", "b.com"],
            "robots_txt": [
                "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n",
                "User-agent: *\nDisallow: /tmp/*\n"]}))
        got = {r.url: r.robots_allowed for r in
               filter_robots(urls, robots, keep_disallowed=True).collect()}
        assert got == {"http://a.com/private/x": False,
                       "http://a.com/private/ok/y": True,
                       "http://b.com/tmp/q": False,
                       "http://nobots.com/z": True}  # missing = allowed
        kept = filter_robots(urls, robots)
        assert kept.count() == 2
        # the broadcast-joined flow is shuffle-free for the URL table
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestSitemaps:
    """sitemap.xml parsing: urlset/sitemapindex, gzip, escaping."""

    def test_urlset_and_index_roundtrip(self):
        from pandas_plus_spark.sources.sitemaps import (parse_sitemap,
                                                        sitemap_bytes)
        urls = [{"loc": "http://a.com/x?q=1&r=2", "lastmod": "2026-01-02",
                 "changefreq": "daily", "priority": 0.8},
                "http://a.com/plain"]
        for gz in (False, True):
            got = parse_sitemap(sitemap_bytes(urls, gzipped=gz))
            assert got[0] == {"kind": "url",
                              "loc": "http://a.com/x?q=1&r=2",
                              "lastmod": "2026-01-02",
                              "changefreq": "daily", "priority": 0.8}, gz
            assert got[1]["loc"] == "http://a.com/plain"
            assert got[1]["priority"] is None
        idx = parse_sitemap(sitemap_bytes(
            ["http://a.com/s1.xml", "http://a.com/s2.xml.gz"], index=True))
        assert [e["kind"] for e in idx] == ["sitemap", "sitemap"]
        assert idx[1]["loc"] == "http://a.com/s2.xml.gz"

    def test_rejects_non_sitemaps(self):
        from pandas_plus_spark.sources.sitemaps import parse_sitemap
        assert parse_sitemap(None) is None
        assert parse_sitemap(b"<html>nope</html>") is None
        assert parse_sitemap(b"\x1f\x8bcorrupt gzip....") is None

    def test_sparkside_fanout(self, spark):
        import pandas as pd

        from pandas_plus_spark.sources.sitemaps import (
            extract_sitemap_entries, sitemap_bytes)
        df = spark.createDataFrame(pd.DataFrame({
            "id": [1, 2, 3],
            "blob": [sitemap_bytes(["http://a/1", "http://a/2"]),
                     sitemap_bytes(["http://a/sm.xml"], index=True,
                                   gzipped=True),
                     b"junk"]}))
        rows = extract_sitemap_entries(df, "blob", "id") \
            .orderBy("id", "loc").collect()
        assert [(r.id, r.kind, r.loc) for r in rows] == [
            (1, "url", "http://a/1"), (1, "url", "http://a/2"),
            (2, "sitemap", "http://a/sm.xml")]


class TestExtractLinks:
    """href harvesting + RFC 3986 resolution, all JVM column logic."""

    def test_resolution_shapes(self, spark):
        import pandas as pd

        from pandas_plus_spark.functions.urls import extract_links
        html = ("<a href=\"http://ext.com/abs\">x</a> "
                "<a href=\'/rooted\'>y</a> "
                "<a href=\"rel/page.html\">z</a> "
                "<a href=\"//cdn.com/p\">w</a> "
                "<a href=\"javascript:void(0)\">j</a> "
                "<a href=\"#frag\">f</a> "
                "<a href=\"mailto:a@b.c\">m</a> "
                "<a href=\"tel:12345\">t</a>")
        df = spark.createDataFrame(pd.DataFrame({
            "id": [1, 2],
            "url": ["https://site.org/dir/page.html",
                    "http://root.org"],
            "html": [html, "<a href=\"x.html\">r</a>"]}))
        got = sorted((r.id, r.link) for r in
                     extract_links(df, "html", "url", "id").collect())
        assert got == [
            (1, "http://ext.com/abs"),
            (1, "https://cdn.com/p"),
            (1, "https://site.org/dir/rel/page.html"),
            (1, "https://site.org/rooted"),
            (2, "http://root.org/x.html"),       # bare-origin base
        ]

    def test_anchor_links_text_and_markup(self, spark):
        """r12: anchor-text extraction — inner markup stripped,
        whitespace collapsed, non-navigational hrefs dropped, empty
        (image) anchors preserved, unquoted hrefs read."""
        import pandas as pd

        from pandas_plus_spark.functions.urls import extract_anchor_links
        html = ('<a href="http://x.org/a">Plain text</a> '
                "<a class='z' href='/rooted'><b>Bold</b>\n  spaced</a> "
                "<a href=bare.html>bare</a> "
                '<a href="#frag">skip me</a> '
                '<a href="javascript:void(0)">also skip</a> '
                '<a href="http://y.org/img"><img src="i.png"/></a>')
        df = spark.createDataFrame(pd.DataFrame({
            "id": [1], "url": ["https://s.org/d/p.html"], "html": [html]}))
        got = [(r.link, r.anchor) for r in
               extract_anchor_links(df, "html", "url", "id").collect()]
        assert got == [
            ("http://x.org/a", "Plain text"),
            ("https://s.org/rooted", "Bold spaced"),
            ("https://s.org/d/bare.html", "bare"),
            ("http://y.org/img", ""),
        ]
        # pure JVM path — no Python in the plan
        plan = (extract_anchor_links(df, "html", "url", "id")
                ._jdf.queryExecution().executedPlan().toString())
        assert "EvalPython" not in plan

    def test_anchor_links_malformed_html(self, spark):
        """Unclosed anchors, hrefless <a>, and attribute-order variants:
        the extractor must harvest what is well-formed and drop the
        rest, never erroring."""
        import pandas as pd

        from pandas_plus_spark.functions.urls import extract_anchor_links
        html = ('<a href="http://ok.org/1">good</a> '
                "<a href='http://ok.org/2' never closed "
                "<a>no href</a> "
                '<a target="_b" href="http://ok.org/3" rel="x">attrs</a> '
                '<A HREF="http://ok.org/4">caps</A>')
        df = spark.createDataFrame(pd.DataFrame({
            "id": [1], "url": ["https://s.org/"], "html": [html]}))
        got = {(r.link, r.anchor) for r in
               extract_anchor_links(df, "html", "url", "id").collect()}
        assert ("http://ok.org/1", "good") in got
        assert ("http://ok.org/3", "attrs") in got
        assert ("http://ok.org/4", "caps") in got   # (?i) tag match
        # the unclosed anchor's open tag swallows up to the NEXT '>', so
        # the regex extractor attributes the following element's text to
        # it — the documented best-effort behavior of any regex-level
        # harvester (the LINK is still correct; the hrefless <a> element
        # itself contributes nothing)
        assert ("http://ok.org/2", "no href") in got
        assert len(got) == 4
        assert all(l.startswith("http") for l, _ in got)

    def test_hrefs_document_order_and_unquoted(self, spark):
        """r12 advisor fix: one alternation regex keeps TRUE document
        order for mixed quoting (previously all double-quoted came
        first) and harvests unquoted href values."""
        import pandas as pd

        from pandas_plus_spark.functions.urls import extract_hrefs
        html = ("<a href='s1'>a</a> <a href=\"d1\">b</a> "
                "<a href=u1.html>c</a> <a href='s2'>d</a> "
                "<a href=\"\">empty</a>")
        df = spark.createDataFrame(pd.DataFrame({"html": [html]}))
        [row] = df.select(extract_hrefs("html").alias("h")).collect()
        assert row.h == ["s1", "d1", "u1.html", "s2"]

    def test_plan_is_pure_codegen(self, spark):
        import io
        from contextlib import redirect_stdout

        import pandas as pd

        from pandas_plus_spark.functions.urls import extract_links
        df = spark.createDataFrame(pd.DataFrame(
            {"id": [1], "url": ["http://a.com/"], "html": ["<a></a>"]}))
        buf = io.StringIO()
        with redirect_stdout(buf):
            extract_links(df, "html", "url", "id").explain()
        plan = buf.getvalue()
        assert "EvalPython" not in plan          # no Python in the path
