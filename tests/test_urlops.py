"""URL canonicalization / domain extraction / domain-cap tests."""

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.webtext.urlops import (
    canonicalize_url, url_host, registrable_domain,
    with_url_parts, domain_cap, domain_counts, domain_mixture_weights,
)

CANON_CASES = [
    ("HTTPS://Example.COM/Path/X", "https://example.com/Path/X"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a?b=1&a=2", "https://example.com/a?b=1&a=2"),
    ("https://example.com:443", "https://example.com"),
    # path/query case is preserved; only scheme+authority lowercases
    ("HTTP://A.B/QUERY?X=Y#Z", "http://a.b/QUERY?X=Y"),
]

HOST_CASES = [
    ("https://www.Example.com/x", "example.com", "example.com"),
    ("https://a.b.Example.com/x", "a.b.example.com", "example.com"),
    ("https://news.bbc.co.uk/x", "news.bbc.co.uk", "bbc.co.uk"),
    ("https://shop.foo.com.au/x", "shop.foo.com.au", "foo.com.au"),
    ("https://localhost/x", "localhost", "localhost"),
    ("not a url", "", ""),
]


@pytest.fixture(scope="module")
def url_df(spark):
    rows = [(i, u) for i, (u, _) in enumerate(CANON_CASES)]
    return spark.createDataFrame(rows, "id long, url string")


def test_canonicalize(spark, url_df):
    got = [r["c"] for r in
           url_df.orderBy("id")
                 .select(canonicalize_url(F.col("url")).alias("c"))
                 .collect()]
    assert got == [want for _, want in CANON_CASES]


def test_canonicalize_idempotent(spark, url_df):
    once = url_df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select("c", canonicalize_url(F.col("c")).alias("c2"))
    assert twice.where(F.col("c") != F.col("c2")).count() == 0


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(HOST_CASES)],
        "id long, url string")
    rows = (df.orderBy("id")
              .select(url_host(F.col("url")).alias("h"),
                      registrable_domain(F.col("url")).alias("d"))
              .collect())
    for (u, want_h, want_d), r in zip(HOST_CASES, rows):
        assert r["h"] == want_h, (u, r["h"])
        assert r["d"] == want_d, (u, r["d"])


def test_with_url_parts_on_synth_pages(spark):
    from sedona_db_spark.webtext import synth_pages
    p = with_url_parts(synth_pages(spark, 200))
    assert p.where(F.col("domain") == "").count() == 0
    # synth urls are https://hostN.example/path/N -> domain hostN.example
    r = p.select("url", "domain").first()
    assert r["domain"] == r["url"].split("/")[2].removeprefix("www.")


def test_domain_cap(spark):
    rows = [(f"https://d{i % 3}.com/p{i}", i) for i in range(30)]
    df = spark.createDataFrame(rows, "url string, n long")
    capped = domain_cap(df, 4)
    cnt = {r["domain"]: r["n_pages"] for r in
           domain_counts(capped).collect()}
    assert cnt == {"d0.com": 4, "d1.com": 4, "d2.com": 4}
    # deterministic survivor set: lowest canonical urls win
    kept = sorted(r["url"] for r in capped.where(
        registrable_domain(F.col("url")) == "d0.com").collect())
    want = sorted(u for u, _ in rows if "d0" in u)[:4]
    assert kept == want
    # cap larger than any domain is the identity
    assert domain_cap(df, 100).count() == 30
    with pytest.raises(ValueError):
        domain_cap(df, 0)


def test_domain_mixture_weights(spark):
    rows = ([("https://big.com/p%d" % i,) for i in range(64)]
            + [("https://mid.com/p%d" % i,) for i in range(16)]
            + [("https://small.com/p%d" % i,) for i in range(4)])
    df = spark.createDataFrame(rows, "url string")
    w = {r["domain"]: r for r in
         domain_mixture_weights(df, alpha=0.5).collect()}
    assert w["small.com"]["keep_rate"] == 1.0
    # n**(alpha-1) ratios: (16/4)**-0.5 = 0.5, (64/4)**-0.5 = 0.25
    assert w["mid.com"]["keep_rate"] == pytest.approx(0.5)
    assert w["big.com"]["keep_rate"] == pytest.approx(0.25)
    # expected kept counts follow n**alpha: 2, 8, 16 -> shares flatten
    # alpha=1 keeps everything
    w1 = {r["domain"]: r["keep_rate"] for r in
          domain_mixture_weights(df, alpha=1.0).collect()}
    assert all(v == 1.0 for v in w1.values())
    with pytest.raises(ValueError):
        domain_mixture_weights(df, alpha=1.5)


def test_plan_is_pure_jvm(spark):
    from sedona_db_spark.webtext import synth_pages
    p = domain_cap(with_url_parts(synth_pages(spark, 100)), 5)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
