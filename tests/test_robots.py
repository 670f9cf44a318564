"""RFC 9309 robots.txt parser + gate stage."""

from __future__ import annotations

from documentai_ray.functions.robots import is_allowed, parse_robots_txt

BASIC = """
# comment
User-agent: *
Disallow: /private
Allow: /private/ok
"""


def test_longest_match_wins():
    assert is_allowed(BASIC, "/public")
    assert not is_allowed(BASIC, "/private/x")
    assert is_allowed(BASIC, "/private/ok/page")      # longer Allow wins


def test_tie_goes_to_allow():
    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    assert is_allowed(txt, "/a/x")


def test_empty_disallow_matches_nothing():
    assert is_allowed("User-agent: *\nDisallow:\n", "/anything")


def test_group_selection_exact_vs_star():
    txt = ("User-agent: googlebot\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /tmp\n")
    assert not is_allowed(txt, "/x", agent="googlebot")
    assert is_allowed(txt, "/x")                      # * group, /x not /tmp
    assert not is_allowed(txt, "/tmp/y")


def test_multiple_agents_share_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /d\n"
    assert not is_allowed(txt, "/d", agent="a")
    assert not is_allowed(txt, "/d", agent="b")
    assert is_allowed(txt, "/d", agent="c")           # no * group → allow


def test_new_group_after_rules():
    txt = ("User-agent: a\nDisallow: /x\n"
           "User-agent: *\nDisallow: /y\n")           # 2nd UA opens new group
    assert is_allowed(txt, "/y", agent="a")
    assert not is_allowed(txt, "/x", agent="a")
    assert not is_allowed(txt, "/y")


def test_wildcards_and_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /img*big\n"
    assert not is_allowed(txt, "/docs/report.pdf")
    assert is_allowed(txt, "/docs/report.pdfx")       # $ anchors the end
    assert not is_allowed(txt, "/img/very/big")
    assert is_allowed(txt, "/img/small")


def test_case_insensitive_keys_and_agent():
    txt = "USER-AGENT: MyBot\nDISALLOW: /z\n"
    assert not is_allowed(txt, "/z/1", agent="mybot")


def test_unknown_keys_ignored_but_break_header_run():
    txt = ("User-agent: a\nCrawl-delay: 10\nDisallow: /q\n")
    assert not is_allowed(txt, "/q", agent="a")


def test_no_rules_allows_everything():
    assert is_allowed("", "/x")
    assert is_allowed("Sitemap: https://e.com/s.xml\n", "/x")


def test_gate_stage_vectorized_vs_scalar(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.curation import robots_txt_gate

    robots = {"a.com": "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n",
              "w.com": "User-agent: *\nDisallow: /*.pdf$\n"}
    urls = ([f"https://a.com/p/{i}" for i in range(150)]
            + ["https://b.com/p/7", "https://w.com/f/x.pdf",
               "https://w.com/f/x.txt"])
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)})).repartition(4)
    out = robots_txt_gate(ds, robots).to_pandas().set_index("url")
    # vectorized prefix path == scalar matcher on every a.com row
    for i in range(150):
        path_ok = not str(i).startswith("1") or str(i).startswith("2") is False
        expect = (not f"/p/{i}".startswith("/p/1")) or f"/p/{i}".startswith("/p/12")
        assert out.loc[f"https://a.com/p/{i}", "allowed"] == expect, i
    assert out.loc["https://b.com/p/7", "allowed"]          # unknown host
    assert not out.loc["https://w.com/f/x.pdf", "allowed"]  # wildcard path
    assert out.loc["https://w.com/f/x.txt", "allowed"]
    # keep_only drops the blocked rows
    kept = robots_txt_gate(ds, robots, keep_only=True).to_pandas()
    assert set(kept["url"]) == set(out.index[out["allowed"]])


def test_surt_canonicalization_rules():
    from documentai_ray.stages.dedup import surt

    assert surt("https://WWW.Example.com:443/A/b?z=1&a=2") == \
        "com,example)/a/b?a=2&z=1"
    assert surt("http://sub.host.org:8080/x#frag") == "org,host,sub:8080)/x"
    assert surt("http://a.com:80/") == "com,a)/"
    assert surt("plain.com/p") == "com,plain)/p"          # schemeless → http
    assert surt("https://b.net") == "net,b)/"             # no path


def test_anchor_edge_extraction_rules():
    from documentai_ray.stages.extract import extract_anchor_edges

    html = ('<a href="/x"><b>Bold</b>  link\ntext</a>'
            '<a href="mailto:a@b">mail</a>'
            '<a href=/rel>bare</a>'
            '<a href="#frag">skip</a>'
            '<a href="//cdn.net/y">proto-rel</a>')
    edges = extract_anchor_edges("https://h.com/p/1", html)
    assert edges == [("https://h.com/x", "Bold link text"),
                     ("https://h.com/rel", "bare"),
                     ("https://cdn.net/y", "proto-rel")]


def test_sitemap_parse_kinds():
    from documentai_ray.functions.sitemap import parse_sitemap

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    kind, urls = parse_sitemap(
        f'<urlset {ns}><url><loc> https://a/x </loc>'
        '<lastmod>2024-01-02</lastmod></url>'
        '<url><loc>https://a/y</loc></url><url></url></urlset>')
    assert kind == "urlset"
    assert urls == [("https://a/x", "2024-01-02"), ("https://a/y", None)]
    kind, locs = parse_sitemap(
        f'<sitemapindex {ns}><sitemap><loc>https://a/s1.xml</loc>'
        '</sitemap></sitemapindex>')
    assert (kind, locs) == ("index", ["https://a/s1.xml"])
    # no-namespace and prefixed variants parse identically
    assert parse_sitemap('<urlset><url><loc>u</loc></url></urlset>')[1] == [("u", None)]
    assert parse_sitemap(
        '<s:urlset xmlns:s="http://www.sitemaps.org/schemas/sitemap/0.9">'
        '<s:url><s:loc>u</s:loc></s:url></s:urlset>')[1] == [("u", None)]
    # malformed → empty proposals, not an exception
    assert parse_sitemap("<urlset><url>")[1] == []
    assert parse_sitemap("not xml at all")[1] == []


def test_sitemap_expand_depth_and_cycles(ray_session):
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.curation import sitemap_expand

    idx = ('<sitemapindex><sitemap><loc>c1</loc></sitemap>'
           '<sitemap><loc>self</loc></sitemap></sitemapindex>')
    bodies = {
        "c1": '<urlset><url><loc>https://h/a</loc></url></urlset>',
        # a cycle: 'self' points back to an index referencing c1 + self
        "self": idx,
    }
    ds = ray.data.from_arrow(pa.table({"host": ["h"], "xml": [idx]}))
    out = sitemap_expand(ds, bodies).to_pandas()
    assert sorted(out["url"]) == ["https://h/a"]      # cycle-safe, no dups


def test_surt_percent_normalization():
    from documentai_ray.stages.dedup import surt

    # unreserved escapes decode; reserved escapes uppercase; equivalent
    # URIs get EQUAL keys
    assert surt("https://a.com/%41bc%2Fd") == "com,a)/abc%2fd"
    assert surt("https://a.com/Abc%2fd") == surt("https://a.com/%41bc%2Fd")
    assert surt("https://a.com/x%zz") == "com,a)/x%zz"   # malformed untouched
    assert surt("https://a.com/p%7E") == "com,a)/p~"


def test_crawl_delay_parsing_and_group_selection():
    from documentai_ray.functions.robots import parse_robots_txt

    txt = ("User-agent: slowbot\nCrawl-delay: 30\n\n"
           "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert parse_robots_txt(txt, "slowbot").crawl_delay == 30
    assert parse_robots_txt(txt).crawl_delay == 2.5
    assert parse_robots_txt(txt, "otherbot").crawl_delay == 2.5  # * fallback
    assert parse_robots_txt("User-agent: *\nDisallow: /\n").crawl_delay is None
    assert parse_robots_txt(
        "User-agent: *\nCrawl-delay: nope\n").crawl_delay is None
