"""weburl operators: canonicalization equivalence classes, dedup keeper
policy, blocklist suffix matching."""

import pytest
from pyspark.sql import functions as F

from slowspark.weburl import (
    host_suffixes_expr,
    url_blocklist_filter,
    url_dedup,
    with_canonical_url,
)


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return with_canonical_url(df).first().canonical_url


@pytest.mark.parametrize(
    "raw,expect",
    [
        # scheme/host case, default port, fragment
        ("HTTP://WWW.Example.COM:80/Path#frag", "http://www.example.com/Path"),
        ("https://example.com:443/", "https://example.com/"),
        # non-default port survives
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("ftp://Host.net:21/f", "ftp://host.net:21/f"),
        # path normalization: slash runs, trailing slash, empty path
        ("https://e.com//a///b//", "https://e.com/a/b"),
        ("https://e.com", "https://e.com/"),
        ("https://e.com/", "https://e.com/"),
        # query: tracking params out, rest sorted, empty segments dropped
        (
            "https://e.com/p?utm_source=x&b=2&fbclid=1&a=1",
            "https://e.com/p?a=1&b=2",
        ),
        ("https://e.com/p?b=2&a=1", "https://e.com/p?a=1&b=2"),
        ("https://e.com/p?utm_campaign=z", "https://e.com/p"),
        ("https://e.com/p?&&a=1&", "https://e.com/p?a=1"),
        # empty-VALUED param is kept (meaningful), empty SEGMENT is not
        ("https://e.com/p?a=", "https://e.com/p?a="),
        # ref is a tracking param; refine is not (anchored key match)
        ("https://e.com/p?ref=nav&refine=1", "https://e.com/p?refine=1"),
        # non-URL strings pass through untouched
        ("not a url", "not a url"),
        ("", ""),
    ],
)
def test_canonical_url_cases(spark, raw, expect):
    assert _canon(spark, raw) == expect


def test_canonicalization_merges_equivalent_fetches(spark):
    variants = [
        "http://WWW.site.org:80/a//b/?utm_source=x&id=1#top",
        "http://www.site.org/a/b?id=1",
        "http://www.site.org/a/b/?id=1&utm_medium=email",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    assert (
        with_canonical_url(df).select("canonical_url").distinct().count() == 1
    )


def test_url_dedup_keeper_earliest_ts_then_min_id(spark):
    rows = [
        (10, "https://e.com/x", "2024-01-02"),
        (3, "https://E.com/x/", "2024-01-01"),   # earliest -> keeper
        (7, "https://e.com/x?utm_source=a", "2024-01-01"),  # tie ts, id 7 > 3
        (5, "https://e.com/other", "2024-01-05"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts string")
    out = {r.doc_id: r for r in url_dedup(df, ts_col="ts").collect()}
    assert set(out) == {3, 5}
    assert out[3].n_url_dups == 3
    assert out[5].n_url_dups == 1


def test_url_dedup_min_id_for_negative_hash_ids(spark):
    # the substring-dedup lesson: keeper must be exact for xxhash64-style
    # negative 64-bit ids
    rows = [(-(2**62) - 5, "https://e.com/x"), (2**61, "https://e.com/x/")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df).collect()
    assert len(out) == 1 and out[0].doc_id == -(2**62) - 5


def test_host_suffixes(spark):
    df = spark.createDataFrame(
        [("https://User:pw@A.B.Example.com:8080/x",)], "url string"
    )
    assert df.select(host_suffixes_expr("url").alias("s")).first().s == [
        "a.b.example.com", "b.example.com", "example.com", "com",
    ]


def test_blocklist_blocks_subdomains_not_substrings(spark):
    rows = [
        (1, "https://blocked.org/"),
        (2, "https://a.b.blocked.org/x"),      # subdomain -> blocked
        (3, "https://notblocked.org/"),        # substring only -> kept
        (4, "https://fine.com/"),
        (5, "https://ORG.example.com/"),       # 'org' is a LABEL here -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("blocked.org",), ("Other.net",)], "domain string")
    kept = sorted(r.doc_id for r in url_blocklist_filter(df, bl).collect())
    assert kept == [3, 4, 5]


def test_blocklist_plan_broadcasts(spark):
    """The suffix ⋈ blocklist semi-join must be a broadcast hash join —
    a sort-merge there would shuffle the exploded corpus on the suffix."""
    df = spark.createDataFrame([(1, "https://x.com/")], "doc_id long, url string")
    bl = spark.createDataFrame([("y.com",)], "domain string")
    plan = url_blocklist_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the final anti-join's strategy is left to AQE (hit-set size is
    # data-dependent); only the suffix semi-join must never sort-merge
    semi_region = plan.split("LeftAnti")[1]
    assert "SortMergeJoin" not in semi_region


# ---------------------------------------------------------------------------
# latest_capture / crawl_delta
# ---------------------------------------------------------------------------

def test_latest_capture_keeps_newest_then_max_id(spark):
    from slowspark.weburl import latest_capture

    df = spark.createDataFrame(
        [
            # url A: three captures, newest ts wins
            ("a", 1, 10), ("a", 3, 11), ("a", 2, 12),
            # url B: ts tie -> max doc_id wins
            ("b", 5, 20), ("b", 5, 21),
            # url C: single capture
            ("c", 7, 30),
        ],
        "url string, warc_ts long, doc_id long",
    )
    out = {r["url"]: (r["warc_ts"], r["doc_id"], r["n_captures"])
           for r in latest_capture(df).collect()}
    assert out == {"a": (3, 11, 3), "b": (5, 21, 2), "c": (7, 30, 1)}


def test_crawl_delta_statuses(spark):
    from slowspark.weburl import crawl_delta

    old = spark.createDataFrame(
        [("u1", "f1"), ("u2", "f2"), ("u3", "f3")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u1", "f1"), ("u2", "f2x"), ("u4", "f4")], "url string, fingerprint string"
    )
    out = {r["url"]: (r["status"], r["old_fp"], r["new_fp"])
           for r in crawl_delta(old, new).collect()}
    assert out == {
        "u1": ("unchanged", "f1", "f1"),
        "u2": ("changed", "f2", "f2x"),
        "u3": ("gone", "f3", None),
        "u4": ("new", None, "f4"),
    }


def test_crawl_delta_no_fanout_and_latest_capture_no_window(spark):
    from slowspark.weburl import crawl_delta, latest_capture

    old = spark.createDataFrame([("u", "f")], "url string, fingerprint string")
    # full outer join on a unique key: result rows = |old ∪ new| exactly
    out = crawl_delta(old, old)
    assert out.count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan or "Full" in plan
    cap = spark.createDataFrame(
        [("u", 1, 1)], "url string, warc_ts long, doc_id long"
    )
    cplan = latest_capture(cap)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in cplan  # max-struct aggregate, not a window rank


def test_crawl_delta_null_fingerprint_raises(spark):
    """Presence is row presence, not fingerprint null-ness (ADVICE r7):
    a present row carrying a NULL fingerprint is bad input and raises at
    execution time instead of being classified 'new'/'gone'/'changed'."""
    import pytest as _pt
    from py4j.protocol import Py4JJavaError
    from slowspark.weburl import crawl_delta

    ok = spark.createDataFrame([("u1", "f1")], "url string, fingerprint string")
    bad = spark.createDataFrame(
        [("u1", None)], "url string, fingerprint string"
    )
    with _pt.raises(Exception, match="crawl_delta: NULL fingerprint"):
        crawl_delta(bad, ok).collect()
    with _pt.raises(Exception, match="crawl_delta: NULL fingerprint"):
        crawl_delta(ok, bad).collect()
    # and NULL==NULL on both sides is NOT 'changed' — it raises too
    with _pt.raises(Exception, match="crawl_delta: NULL fingerprint"):
        crawl_delta(bad, bad).collect()


def test_extract_links_uppercase_anchor(spark):
    """'<A HREF="...">' (older/uppercase markup) is double-quoted and
    therefore inside the documented coverage — must extract (ADVICE r7)."""
    from slowspark.weburl import extract_links

    html = '<html><A CLASS="y" HREF="https://up.example/U">x</A></html>'
    df = spark.createDataFrame(
        [("http://base.example/", html.encode())], "url string, html binary"
    )
    out = {r["href"]: r["resolved_url"] for r in extract_links(df).collect()}
    assert out == {"https://up.example/U": "https://up.example/U"}


def test_keep_new_or_changed(spark):
    from slowspark.weburl import keep_new_or_changed

    docs = spark.createDataFrame(
        [(1, "u1", "same"), (2, "u2", "edited"), (3, "u3", "fresh")],
        "doc_id long, url string, text string",
    )
    # old snapshot with precomputed fingerprints (md5 contract)
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "original")], "url string, text string"
    ).selectExpr("url", "md5(text) AS fingerprint")
    kept = {r["doc_id"] for r in keep_new_or_changed(docs, old).collect()}
    assert kept == {2, 3}  # u1 unchanged -> dropped; u2 changed; u3 new
    # old snapshot with raw text instead of fingerprints: same result
    old_txt = spark.createDataFrame(
        [("u1", "same"), ("u2", "original")], "url string, text string"
    )
    kept2 = {r["doc_id"]
             for r in keep_new_or_changed(docs, old_txt).collect()}
    assert kept2 == {2, 3}
    # schema is preserved exactly (no helper columns leak)
    assert keep_new_or_changed(docs, old).columns == docs.columns
    import pytest as _pt
    with _pt.raises(ValueError, match="old snapshot"):
        keep_new_or_changed(
            docs, spark.createDataFrame([("u1",)], "url string")
        )


def test_extract_links_resolution_cases(spark):
    from slowspark.weburl import extract_links

    html = (
        '<html><body>'
        '<a href="https://other.example/x">abs</a>'
        '<a class="y" href="//cdn.example/z">proto</a>'
        '<a href="/rooted/p?q=1">root</a>'
        '<a href="rel/path">rel</a>'
        '<a href="mailto:a@b.c">mail</a>'
        "<a href='single-quoted'>skipped</a>"
        '</body></html>'
    )
    df = spark.createDataFrame(
        [("http://base.example.com:8080/dir/page", html.encode())],
        "url string, html binary",
    )
    out = {r["href"]: r["resolved_url"] for r in extract_links(df).collect()}
    assert out == {
        "https://other.example/x": "https://other.example/x",
        "//cdn.example/z": "http://cdn.example/z",
        "/rooted/p?q=1": "http://base.example.com:8080/rooted/p?q=1",
        "rel/path": None,
        # mailto: matches scheme:// ? no — mailto has no '//', so NULL
        "mailto:a@b.c": None,
    }
    # pure codegen, no shuffle
    plan = extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_noindex_filter(spark):
    from slowspark.weburl import noindex_filter

    def pg(i, html):
        return (i, html.encode() if html is not None else None)

    df = spark.createDataFrame(
        [
            pg(1, "<html><head></head><body>plain</body></html>"),
            pg(2, '<html><head><meta name="robots" content="noindex, '
                  'nofollow"></head></html>'),
            pg(3, '<html><META CONTENT="NOINDEX" NAME="robots"></html>'),
            pg(4, '<html><meta name="robots" content="all"></html>'),
            pg(5, '<html><meta name="viewport" content="noindex-like">'
                  '</html>'),  # wrong meta name -> kept
            pg(6, None),  # NULL html -> kept (nothing to judge)
        ],
        "doc_id long, html binary",
    )
    kept = {r["doc_id"] for r in noindex_filter(df).collect()}
    assert kept == {1, 4, 5, 6}
    import pytest as _pt
    with _pt.raises(ValueError, match="html"):
        noindex_filter(df.drop("html"))
    plan = noindex_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_latest_capture_exact_duplicate_rows_emit_one(spark):
    """Regression (hypothesis-found): fully duplicated capture rows
    (same url+ts+id) must consolidate to ONE output row — a join-back
    keeper matched both; the single-pass max-struct keeper cannot."""
    from slowspark.weburl import latest_capture

    df = spark.createDataFrame(
        [("u", 1, 5, "fp"), ("u", 1, 5, "fp"), ("u", 0, 9, "old")],
        "url string, warc_ts long, doc_id long, fingerprint string",
    )
    out = latest_capture(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["warc_ts"], r["doc_id"], r["fingerprint"],
            r["n_captures"]) == (1, 5, "fp", 3)
    # ambiguous same-(url,ts,id) different-payload rows: deterministic
    # single keeper (max over the remaining columns), never both
    amb = spark.createDataFrame(
        [("u", 1, 5, "a"), ("u", 1, 5, "b")],
        "url string, warc_ts long, doc_id long, fingerprint string",
    )
    got = latest_capture(amb).collect()
    assert len(got) == 1 and got[0]["fingerprint"] == "b"


def test_extract_anchor_texts(spark):
    """Anchor text comes out tag-stripped, whitespace-collapsed,
    lowercased; textless anchors yield ''; resolution matches
    extract_links (shared CASE); pure codegen, no shuffle."""
    from slowspark.weburl import extract_anchor_texts

    html = (
        '<html><body>'
        '<a href="https://t.example/x">  Spark\n  <b>SQL</b> Guide </a>'
        '<a class="y" href="/rooted">CLICK HERE</a>'
        '<a href="//cdn.example/z"><img src="i.png"/></a>'
        '<a href="rel/p">relative text</a>'
        '</body></html>'
    )
    df = spark.createDataFrame(
        [("http://base.example.com/dir/page", html.encode())],
        "url string, html binary",
    )
    out = extract_anchor_texts(df)
    rows = {r["href"]: r for r in out.collect()}
    assert rows["https://t.example/x"]["anchor_text"] == "spark sql guide"
    assert rows["https://t.example/x"]["resolved_url"] == "https://t.example/x"
    assert rows["/rooted"]["anchor_text"] == "click here"
    assert rows["/rooted"]["resolved_url"] == "http://base.example.com/rooted"
    assert rows["//cdn.example/z"]["anchor_text"] == ""  # image link
    assert rows["rel/p"]["resolved_url"] is None
    assert all(r["src_url"] == "http://base.example.com/dir/page"
               for r in rows.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_anchor_text_agg_topk(spark):
    """Top-k phrases per target by (count desc, phrase asc); NULL
    targets and ''-text anchors don't vote; rank is dense from 1."""
    from slowspark.weburl import anchor_text_agg

    rows = (
        [("s%d" % i, "https://t/a", "best docs") for i in range(3)]
        + [("s%d" % i, "https://t/a", "api reference") for i in range(3)]
        + [("x", "https://t/a", "zzz rare"), ("y", "https://t/a", "aaa rare")]
        + [("x", "https://t/b", "one"), ("y", None, "ignored"),
           ("z", "https://t/b", "")]
    )
    links = spark.createDataFrame(
        rows, "src_url string, resolved_url string, anchor_text string"
    )
    out = anchor_text_agg(links, k=3).collect()
    a = sorted(
        [(r["anchor_text"], r["n_anchors"], r["rank"]) for r in out
         if r["target_url"] == "https://t/a"],
        key=lambda t: t[2],
    )
    # ties on count=3 break by phrase asc; the two rare phrases tie on
    # count=1 and only the lexicographically smaller makes rank 3
    assert a == [("api reference", 3, 1), ("best docs", 3, 2),
                 ("aaa rare", 1, 3)]
    b = [(r["anchor_text"], r["n_anchors"], r["rank"]) for r in out
         if r["target_url"] == "https://t/b"]
    assert b == [("one", 1, 1)]  # '' and NULL-target rows never voted


# ---------------------------------------------------------------- robots

_ROBOTS_BODY = """# crawl policy
User-agent: badbot
User-Agent: gptbot
Disallow: /

user-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 5
Disallow: /*.zip$
Disallow:
Sitemap: https://h/sitemap.xml
"""


def test_parse_robots_groups_and_directives(spark):
    from slowspark.weburl import parse_robots

    robots = spark.createDataFrame(
        [("h1.example.com", _ROBOTS_BODY)], "host string, body string"
    )
    rules = {
        (r["pattern"], r["allow"], r["spec"])
        for r in parse_robots(robots, agent="slowcrawler").collect()
    }
    # the * group only: empty Disallow and unknown directives dropped
    assert rules == {
        ("/private", False, 8),
        ("/private/ok", True, 11),
        ("/*.zip$", False, 7),
    }
    # a named agent picks ITS group and ignores * (most-specific-UA rule)
    got = {
        (r["pattern"], r["allow"])
        for r in parse_robots(robots, agent="GPTBot").collect()
    }
    assert got == {("/", False)}


def test_robots_filter_longest_match_and_defaults(spark):
    from slowspark.weburl import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [("h1.example.com", _ROBOTS_BODY)], "host string, body string"
    )
    rules = parse_robots(robots, agent="slowcrawler")
    urls = spark.createDataFrame(
        [
            (1, "https://h1.example.com/public/page"),     # no match -> allow
            (2, "https://h1.example.com/private/x"),       # Disallow /private
            (3, "https://h1.example.com/private/ok/x"),    # Allow wins (longer)
            (4, "https://h1.example.com/files/data.zip"),  # $-anchored wildcard
            (5, "https://h1.example.com/files/data.zipx"), # NOT anchored match
            (6, "https://other.example.com/private/x"),    # no robots -> allow
            (7, "https://h1.example.com"),                 # bare host -> path /
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["robots_allowed"]
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True,
                   6: True, 7: True}


def test_robots_allow_wins_specificity_tie(spark):
    from slowspark.weburl import parse_robots, robots_filter

    body = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    robots = spark.createDataFrame(
        [("h.example.com", body)], "host string, body string"
    )
    rules = parse_robots(robots, agent="x")
    urls = spark.createDataFrame(
        [(1, "https://h.example.com/dir/a")], "doc_id long, url string"
    )
    assert robots_filter(urls, rules).collect()[0]["robots_allowed"] is True


def test_robots_filter_plan_is_broadcast(spark):
    from slowspark.weburl import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [("h.example.com", "User-agent: *\nDisallow: /x\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [(1, "https://h.example.com/x")], "doc_id long, url string"
    )
    plan = (
        robots_filter(urls, parse_robots(robots, agent="z"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_crawl_schedule_waves_per_host(spark):
    from slowspark.weburl import crawl_schedule

    rows = [
        ("https://a.com/1", 10.0),
        ("https://a.com/2", 30.0),
        ("https://a.com/3", 20.0),
        ("https://b.com/x", 5.0),
    ]
    df = spark.createDataFrame(rows, "url string, priority double")
    got = {r["url"]: (r["host"], r["fetch_wave"]) for r in crawl_schedule(df).collect()}
    assert got == {
        "https://a.com/2": ("a.com", 1),
        "https://a.com/3": ("a.com", 2),
        "https://a.com/1": ("a.com", 3),
        "https://b.com/x": ("b.com", 1),
    }


# ---------------------------------------------------------- url_history


def test_url_history_scd2_intervals(spark):
    from datetime import datetime

    from slowspark.weburl import url_history

    t = lambda d: datetime(2024, 1, d)
    rows = [
        # /a: fp1 (d1,d2), fp2 (d3), fp1 again (d5) -> THREE runs (a
        # reverted page reopens a new interval, not the old one)
        ("http://x.com/a", t(1), "fp1"),
        ("http://x.com/a", t(2), "fp1"),
        ("http://x.com/a", t(3), "fp2"),
        ("http://x.com/a", t(5), "fp1"),
        # /b: never changed -> one open row
        ("http://x.com/b", t(2), "fpb"),
        ("http://x.com/b", t(4), "fpb"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, fingerprint string"
    )
    out = sorted(
        url_history(df).collect(),
        key=lambda r: (r["url"], r["valid_from"]),
    )
    a = [r for r in out if r["url"].endswith("/a")]
    b = [r for r in out if r["url"].endswith("/b")]
    assert [(r["fingerprint"], r["valid_from"].day,
             r["valid_to"].day if r["valid_to"] else None,
             r["n_captures"], r["is_current"]) for r in a] == [
        ("fp1", 1, 3, 2, False),
        ("fp2", 3, 5, 1, False),
        ("fp1", 5, None, 1, True),
    ]
    assert [(r["fingerprint"], r["valid_from"].day, r["valid_to"],
             r["n_captures"], r["is_current"]) for r in b] == [
        ("fpb", 2, None, 2, True),
    ]


def test_url_history_guards(spark):
    from datetime import datetime

    from slowspark.weburl import url_history

    t = datetime(2024, 1, 1)
    null_fp = spark.createDataFrame(
        [("u", t, None)], "url string, warc_ts timestamp, fingerprint string"
    )
    with pytest.raises(Exception, match="NULL fingerprint"):
        url_history(null_fp).collect()
    conflict = spark.createDataFrame(
        [("u", t, "f1"), ("u", t, "f2")],
        "url string, warc_ts timestamp, fingerprint string",
    )
    with pytest.raises(Exception, match="conflicting"):
        url_history(conflict).collect()
    # agreeing duplicate (url, ts) captures collapse, not raise
    agree = spark.createDataFrame(
        [("u", t, "f1"), ("u", t, "f1")],
        "url string, warc_ts timestamp, fingerprint string",
    )
    got = url_history(agree).collect()
    assert len(got) == 1 and got[0]["n_captures"] == 2


def test_url_history_partition_invariance(spark):
    from datetime import datetime, timedelta

    from slowspark.weburl import url_history

    base = datetime(2024, 1, 1)
    rows = [
        (f"http://h{i % 7}.com/p{i % 13}", base + timedelta(days=i),
         f"fp{(i * i) % 5}")
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, fingerprint string"
    )
    key = lambda r: (r["url"], str(r["valid_from"]), str(r["valid_to"]),
                     r["fingerprint"], r["n_captures"], r["is_current"])
    a = sorted(map(key, url_history(df.repartition(1)).collect()))
    b = sorted(map(key, url_history(df.repartition(17)).collect()))
    assert a == b


# ------------------------------------------------------------ sitemaps


def test_parse_sitemaps(spark):
    from slowspark.weburl import parse_sitemaps

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://x.com/a </loc>"
        "<lastmod>2024-01-05</lastmod>"
        "<changefreq>DAILY</changefreq><priority>0.9</priority></url>"
        "<url><loc>https://x.com/b</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # no loc -> dropped
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("https://x.com/sitemap.xml", xml)], "sitemap_url string, xml string"
    )
    out = {r["url"]: r for r in parse_sitemaps(df).collect()}
    assert set(out) == {"https://x.com/a", "https://x.com/b"}
    a = out["https://x.com/a"]
    assert (a["lastmod"], a["changefreq"], a["priority"]) == (
        "2024-01-05", "daily", 0.9)
    b = out["https://x.com/b"]
    assert b["lastmod"] is None and b["changefreq"] is None
    assert b["priority"] == 0.5  # protocol default


def test_frontier_scores(spark):
    from datetime import datetime

    from slowspark.weburl import frontier_scores, url_history

    t = lambda d: d  # integer capture clock
    rows = [
        # /hot: 3 captures, changes every time -> churn 1.0
        ("u/hot", 1, "f1"), ("u/hot", 2, "f2"), ("u/hot", 3, "f3"),
        # /cold: 3 captures, never changes -> churn 0.0
        ("u/cold", 1, "g1"), ("u/cold", 2, "g1"), ("u/cold", 3, "g1"),
        # /single: one capture -> churn 0 by definition
        ("u/single", 3, "h1"),
    ]
    caps = spark.createDataFrame(
        rows, "url string, warc_ts int, fingerprint string"
    )
    hist = url_history(caps)
    ranks = spark.createDataFrame(
        [("u/hot", 0.5), ("u/cold", 0.5), ("u/single", 0.5)],
        "url string, rank double",
    )
    out = {r["url"]: r for r in
           frontier_scores(hist, ranks, now_ts=10).collect()}
    assert out["u/hot"]["churn"] == 1.0
    assert out["u/cold"]["churn"] == 0.0
    assert out["u/single"]["churn"] == 0.0
    # hot changed at ts3 -> staleness 7; score = 0.5 * 1.1 * 7
    assert out["u/hot"]["staleness"] == 7
    assert out["u/hot"]["score"] == pytest.approx(0.5 * 1.1 * 7)
    # cold last version STARTED at ts1 (never changed) -> staleness 9
    assert out["u/cold"]["staleness"] == 9
    assert out["u/hot"]["score"] > out["u/cold"]["score"]


def test_frontier_scores_raises_on_clock_skew(spark):
    """ADVICE r8: a now_ts older than the newest capture used to yield
    negative staleness, silently inverting the ranking; it now raises."""
    import pytest
    from pyspark.sql import functions as F
    from slowspark.weburl import frontier_scores

    hist = spark.createDataFrame(
        [("u1", 3, 2, 10)],
        "url string, n_captures long, version int, valid_from long",
    )
    ranks = spark.createDataFrame([("u1", 0.5)], "url string, rank double")
    with pytest.raises(Exception, match="now_ts predates"):
        frontier_scores(hist, ranks, now_ts=5).collect()
    ok = frontier_scores(hist, ranks, now_ts=20).collect()
    assert ok[0]["staleness"] == 10
