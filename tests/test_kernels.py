"""Kernel unit tests (no Spark): the pure functions shared by the
engine UDFs, the oracle, and the fixture generator."""

import re

from doccrawler_spark.kernels.chunker import chunk_text
from doccrawler_spark.kernels.embed import (
    bm25_encode_document,
    bm25_encode_query,
    dense_embed,
    fit_bm25,
    hybrid_score,
    rerank_score,
    sparse_dot,
)
from doccrawler_spark.kernels.filters import keep_url, rule_filter_batch
from doccrawler_spark.kernels.html import (
    discover_links,
    extract_hidden_snippets,
    extract_page,
    extract_text,
    extract_title,
    parse_robots,
    parse_sitemap,
    site_id_from_title,
)
from doccrawler_spark.kernels.merge import merge_content
from doccrawler_spark.kernels.urls import (
    filter_urls_by_domain,
    strip_fragment,
    url_hash,
)

HTML = (
    "<html><head><title>Demo &amp; Docs</title><script>x=1</script></head>"
    "<body><h1>Getting started</h1><p>Hello   world.</p>"
    "<h2>Install</h2><ul><li>step one</li><li>step two</li></ul>"
    '<pre><code class="language-python">import x\nx.run()</code></pre>'
    '<div style="display: none"><pre><code class="language-go">go run()</code></pre></div>'
    '<div style="display:none"><pre><code class="language-go">go run()</code></pre></div>'
    '<a href="https://a.test/doc/1#frag">one</a>'
    '<a href="https://b.test/doc/2">two</a>'
    "</body></html>"
)


def test_strip_fragment():
    assert strip_fragment("https://a.test/x#y") == "https://a.test/x"
    assert strip_fragment("https://a.test/x") == "https://a.test/x"
    assert strip_fragment("not a url") == "not a url"
    # reference regex also cuts at whitespace (helper.py:65-68)
    assert strip_fragment("https://a.test/x y") == "https://a.test/x"


def test_url_hash_stable():
    assert url_hash("https://a.test/") == url_hash("https://a.test/")
    assert 0 <= url_hash("anything") < 2**63


def test_domain_filter():
    urls = ["https://a.test/x", "https://b.test/y", "http://a.test/z"]
    assert filter_urls_by_domain("https://a.test/page", urls) == [
        "https://a.test/x",
        "http://a.test/z",
    ]


def test_extract_page():
    md, hidden = extract_page(HTML)
    assert md.startswith("# Getting started")
    assert "Hello world." in md          # whitespace collapsed
    assert "- step one" in md
    assert "```python\nimport x\nx.run()\n```" in md
    assert "x=1" not in md               # script dropped
    assert "go run()" not in md          # hidden excluded from visible
    assert hidden == {"go": ["go run()"]}  # deduped
    assert extract_text(HTML) == md
    assert extract_hidden_snippets(HTML) == hidden


def test_title_and_site_id():
    assert extract_title(HTML) == "Demo & Docs"
    # helper.py:41-63: strip non-word chars, then \s+ → single _
    assert site_id_from_title("Demo & Docs!", "https://a.test") == "Demo_Docs"
    assert site_id_from_title("", "https://docs.a.test") == "docs_a_test"


def test_discover_links():
    assert discover_links(HTML) == [
        "https://a.test/doc/1#frag",
        "https://b.test/doc/2",
    ]


def test_merge_content_exact_bytes():
    md = "intro\n```python\na\n```\ntail"
    out = merge_content(md, {"python": ["b"], "go": ["g1", "g2"]})
    # the reference re-emits the matched block with an extra newline
    # (helper.py:93-131) and appends leftovers under the header
    assert out == (
        "intro\n```python\na\n\n```\n"
        "\n```python\nb\n```\n"
        "\ntail"
        "\n\n# Additional Code Snippets\n"
        "\n```go\ng1\n```\n"
        "\n```go\ng2\n```\n"
    )


def test_merge_content_no_hidden_identity_shape():
    md = "no code here"
    assert merge_content(md, {}) == md


def test_merge_content_only_first_block_gets_snippets():
    md = "```js\n1\n```\nmid\n```js\n2\n```\n"
    out = merge_content(md, {"js": ["X"]})
    assert out.count("```js\nX\n```") == 1
    assert out.index("X") < out.index("2")


def test_merge_does_not_mutate_input():
    hidden = {"go": ["a"]}
    merge_content("```go\nz\n```", hidden)
    assert hidden == {"go": ["a"]}


def test_rule_filter():
    assert not keep_url("https://a.test/login")
    assert not keep_url("https://app.a.test/?sessionType=signup")
    assert not keep_url("https://a.test/support")
    assert not keep_url("https://a.test/es/doc/1")
    assert keep_url("https://a.test/docs/estimate")  # 'es' only as locale segment
    assert keep_url("https://status.a.test")          # kept per prompt example
    assert rule_filter_batch(["https://a.test/x", "https://a.test/x"]) == [
        "https://a.test/x"
    ]


def test_parse_sitemap_order():
    xml = "<urlset><url><loc>https://a.test/2</loc></url><url><loc> https://a.test/1 </loc></url></urlset>"
    assert parse_sitemap(xml) == ["https://a.test/2", "https://a.test/1"]


def test_parse_robots():
    dis, delay = parse_robots(
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp\nCrawl-delay: 2.5\n# c\n"
    )
    assert dis == ["/private/", "/tmp"]
    assert delay == 2.5


def test_chunker():
    text = (
        "# Title\nintro text " + "x" * 300 + "\n\n## Section A\nbody " + "y" * 300 +
        "\n```python\ncode\n```\n\n# Additional Code Snippets\n\n```go\ngg\n```\n"
    )
    chunks = chunk_text(text, href="https://a.test/1", base_url="https://a.test",
                        site_id="A")
    assert len(chunks) == 2
    assert chunks[0]["chunked_data"].startswith("# Title")
    # go snippet has no matching chunk language → lands in last chunk
    assert "```go\ngg\n```" in chunks[1]["chunked_data"]
    assert chunks[1]["metadata"]["has_code_snippet"] is True
    assert chunks[0]["metadata"]["href"] == "https://a.test/1"


def test_bm25_roundtrip():
    corpus = ["spark shuffles data", "spark joins tables", "ducks quack loudly"]
    stats = fit_bm25(corpus)
    di, dv = bm25_encode_document(corpus[0], stats)
    qi, qv = bm25_encode_query("spark data", stats)
    assert di == sorted(di) and len(di) == len(dv)
    # doc 0 should outscore doc 2 for this query
    di2, dv2 = bm25_encode_document(corpus[2], stats)
    assert sparse_dot(qi, qv, di, dv) > sparse_dot(qi, qv, di2, dv2)


def test_dense_embed_deterministic():
    a = dense_embed("hello world", dim=32)
    assert a == dense_embed("hello world", dim=32)
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9


def test_hybrid_score_alpha_bounds():
    import pytest

    d = dense_embed("a", 8)
    with pytest.raises(ValueError):
        hybrid_score(d, d, [], [], [], [], alpha=1.5)
    full_dense = hybrid_score(d, d, [1], [1.0], [1], [1.0], alpha=1.0)
    assert abs(full_dense - 1.0) < 1e-9


def test_rerank_score():
    assert rerank_score("spark join", "spark joins everything with join") == 1.0
    assert rerank_score("spark join", "nothing relevant") == 0.0


def test_fast_parser_equivalence():
    """The regex-scanner extract_page must reproduce the html.parser
    reference byte-identically on every well-formed input the fixture
    generator can emit, plus hand-picked html.parser quirk cases."""
    from doccrawler_spark.kernels.html import extract_page_reference
    from doccrawler_spark.webgen import (
        _page_html, _robots_txt, _sitemap_xml, small_spec, tiny_spec,
    )

    inputs = []
    for spec in (tiny_spec(), small_spec()):
        for s in spec.sites:
            step = max(1, s.n_pages // 100)
            inputs += [_page_html(spec, s, i) for i in range(0, s.n_pages, step)]
            inputs += [_sitemap_xml(s), _robots_txt(s)]
    inputs += [
        "<p>unclosed block at eof",
        "<p>a &amp; b &lt;c&gt; &#65;&#x42;</p>",
        "<P>UPPER</P><H1>H</H1>",
        "<!-- comment --><p>x<!-- inner --></p>",
        "<!DOCTYPE html><?xml version='1.0'?><p>y</p>",
        "<div style='display: none'><pre><code class='language-go'>g()</code></pre></div>",
        '<div STYLE="display:none"><pre>hidden</pre></div>',
        "<div style=display:none><pre>unquoted</pre></div>",
        "<br/><p>self closed</p><div/><p>z</p>",
        "<script>if (a<b) { emit('<p>no</p>'); }</script><p>after</p>",
        "<style>p { color: red; }</style><p>after style</p>",
        "<head><title>T</title><script>x</script></head><body><p>b</p></body>",
        '<pre><code class="language-PYTHON">X</code></pre>',
        "<pre>no code tag</pre>",
        "<p>a < b and c > d</p>",
        '<div style="display :none"><div><pre>deep hidden</pre></div></div>',
        "<p>nested <a href=\"http://x\">anchor text</a> kept</p>",
        "<pre><pre>nested pre</pre></pre>",
        "<p></p><p>  </p><p>multi\n  line\n\ttext</p>",
        "< p>bogus</p></p>stray<script>never closed",
        "<p attr='<fake>'>quoted angle</p>",
    ]
    for h in inputs:
        assert extract_page(h) == extract_page_reference(h), h[:200]


# ------------------------- property: JVM url columns == python kernels


def test_url_columns_match_python_kernels_hypothesis(spark):
    """host_col/path_col/strip_fragment_col (JVM regex) must agree with
    the python kernels (urlparse semantics) on generated URLs including
    query-only, fragment-only and empty-path shapes — the class of
    divergence that silently breaks the same-domain filter (F5)."""
    from hypothesis import given, settings, strategies as st

    from doccrawler_spark import functions as Fx
    from doccrawler_spark.kernels.urls import host_of, strip_fragment

    host = st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z][a-z0-9]{0,5}){1,2}",
                         fullmatch=True)
    tail = st.one_of(
        st.just(""),
        st.from_regex(r"/[a-zA-Z0-9/_\-.]{0,20}", fullmatch=True),
        st.from_regex(r"\?[a-z]{1,5}=[a-z0-9]{0,6}", fullmatch=True),
        st.from_regex(r"/[a-zA-Z0-9/_\-.]{0,12}\?[a-z]{1,4}=[a-z0-9]{0,5}",
                      fullmatch=True),
        st.from_regex(r"#[a-zA-Z0-9\-]{0,10}", fullmatch=True),
        st.from_regex(r"/[a-zA-Z0-9/_\-.]{0,12}#[a-zA-Z0-9\-]{0,8}",
                      fullmatch=True),
    )
    urls_strategy = st.lists(
        st.builds(lambda h, t: f"https://{h}{t}", host, tail),
        min_size=1, max_size=60, unique=True,
    )

    from pyspark.sql import functions as F

    @given(urls_strategy)
    @settings(max_examples=12, deadline=None)
    def check(urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            "url",
            Fx.host_col(F.col("url")).alias("h"),
            Fx.strip_fragment_col(F.col("url")).alias("s"),
        ).collect()
        for r in rows:
            assert r["h"] == host_of(r["url"]), r["url"]
            assert r["s"] == strip_fragment(r["url"]), r["url"]

    check()
