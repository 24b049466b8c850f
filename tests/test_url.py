"""URL canonicalization (operators/text.py::url_normalize/url_host,
round 10) — the crawl pipeline's URL-first dedup key.

The q62 gate pins the planted-URL pass against DuckDB at three SFs; this
test drives the formula pair over adversarial hand-built cases (every
normalization step, plus the not-a-URL passthrough) and checks the
variant-folding property the operator exists for.
"""

from __future__ import annotations

import duckdb

from exon_duckdb_spark.operators.text import (
    url_host,
    url_host_sql,
    url_normalize,
    url_normalize_sql,
)

CASES = [
    # scheme/host case, www, default port, trailing slash, tracking, frag
    ("HTTP://WWW.Site7.Example.COM:80/Path/p3/?utm_source=x&id=4&b=2&a=1#f",
     "http://site7.example.com/Path/p3?a=1&b=2&id=4", "site7.example.com"),
    ("https://api.Example.com:443/V1/Items?b=2&utm_campaign=z&A=1",
     "https://api.example.com/V1/Items?A=1&b=2", "api.example.com"),
    # explicit non-default port survives; host keeps it out
    ("https://api.example.com:8443/V1/Items/",
     "https://api.example.com:8443/V1/Items", "api.example.com"),
    # bare host -> root path
    ("http://example.com", "http://example.com/", "example.com"),
    # all-tracking query disappears entirely
    ("http://example.com/?gclid=abc&fbclid=def&ref=tw",
     "http://example.com/", "example.com"),
    # non-http scheme: port untouched (only http/https defaults strip)
    ("  ftp://Files.Example.org:21/pub/  ",
     "ftp://files.example.org:21/pub", "files.example.org"),
    # not a URL: trimmed passthrough, empty host
    ("not a url at all", "not a url at all", ""),
    # interior duplicate slashes preserved (only the trailing run folds)
    ("http://example.com/a//b///", "http://example.com/a//b", "example.com"),
    # param case-sensitivity: REF= and Utm_x= are NOT utm_*/ref (exact,
    # lowercase family match), so they survive and sort
    ("https://www.x.com/p?ref=1&REF=2&Utm_x=3",
     "https://x.com/p?REF=2&Utm_x=3", "x.com"),
    ("http://x.com#onlyfrag", "http://x.com/", "x.com"),
    ("http://x.com:80?z=1", "http://x.com/?z=1", "x.com"),
]


def test_url_normalize_spark_matches_pins_and_duckdb(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _, _) in enumerate(CASES)], "i long, u string"
    )
    got = {
        r["i"]: (r["n"], r["h"])
        for r in df.select(
            "i",
            url_normalize("u").alias("n"),
            url_host("u").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, u VARCHAR)")
    for i, (c, _, _) in enumerate(CASES):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, c])
    duck = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"SELECT i, {url_normalize_sql('u')}, {url_host_sql('u')} FROM t"
        ).fetchall()
    }
    for i, (raw, want_n, want_h) in enumerate(CASES):
        assert got[i] == (want_n, want_h), (raw, got[i])
        assert duck[i] == (want_n, want_h), (raw, duck[i])


def test_url_variants_fold_to_one_key(spark):
    """The dedup property: every cosmetic variant of one resource lands
    on one canonical key, distinct resources stay distinct."""
    variants = [
        "http://www.shop.example.com/item/42?a=1",
        "HTTP://SHOP.EXAMPLE.COM:80/item/42/?a=1",
        "http://shop.example.com/item/42?utm_source=mail&a=1#top",
    ]
    other = "http://shop.example.com/item/43?a=1"
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(variants + [other])], "i long, u string"
    )
    keys = [r["k"] for r in df.select(url_normalize("u").alias("k")).collect()]
    assert len(set(keys[:3])) == 1
    assert keys[3] != keys[0]
