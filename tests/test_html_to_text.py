"""HTML -> text extraction (scale/text.py html_to_text): the WET-style
step feeding every other text op. Script/style payload never leaks,
block structure becomes paragraph breaks (so dedup_paragraphs works on
the output), entities decode, whitespace normalizes, the default plan
stays pure JVM."""

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale import html_to_text
from datar_polars_spark.tibble import ensure_tibble


def _run(spark, docs, **kw):
    td = ensure_tibble(
        spark.createDataFrame(
            [(i, h) for i, h in enumerate(docs)], "id long, html string"
        )
    )
    rows = sorted(html_to_text(td, **kw).df.collect(), key=lambda r: r["id"])
    return [r[kw.get("out_col", "text")] for r in rows]


def test_basic_page(spark):
    html = (
        "<!DOCTYPE html><html><head><title>T</title>"
        "<style>body{color:red}</style>"
        "<script>var secret = 'LEAK';</script></head>"
        "<body><h1>Heading</h1>"
        "<!-- hidden comment -->"
        "<p>First <b>para</b> text.</p>"
        "<p>Second&nbsp;para &amp; more.</p>"
        "<div>Block<br>break</div></body></html>"
    )
    (got,) = _run(spark, [html])
    assert got == (
        "T\n\nHeading\n\nFirst para text.\n\nSecond para & more.\n\n"
        "Block\nbreak"
    )
    assert "LEAK" not in got and "color:red" not in got
    assert "hidden" not in got


def test_lists_and_tables_break_lines(spark):
    html = "<ul><li>one</li><li>two</li></ul><table><tr><td>a</td></tr></table>"
    (got,) = _run(spark, [html])
    # list items are lines; the </ul> block boundary is a blank line
    assert got.splitlines() == ["one", "two", "", "a"]


def test_entities_default_and_full(spark):
    html = "a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt; &copy; &#8212;"
    (d,) = _run(spark, [html])
    # default (r12): common named entities AND all numeric refs decode
    # JVM-side; '&amp;lt;' decodes ONCE to '&lt;'; only the named long
    # tail (&copy;) needs full_entities
    assert d == "a <tag> \"q\" 's' &lt; &copy; —"
    (f_,) = _run(spark, [html], full_entities=True)
    assert f_ == "a <tag> \"q\" 's' &lt; © —"


def test_numeric_charrefs_match_html_unescape(spark):
    """r12 (VERDICT #6): numeric character references decode in
    DEFAULT (pure-JVM) mode with html.unescape's exact HTML5
    semantics: decimal/hex/optional-semicolon forms, full Unicode, the
    windows-1252 C1 remap, U+FFFD for out-of-range and surrogates,
    noncharacter removal, and no double-decode of decoded '&'."""
    import html as _html

    cases = [
        "&#39;quoted&#39;",
        "&#039;leading zero",
        "&#x27;hex&#X27;upper-x",
        "&#8212;em&#x2014;dash",
        "curly &#8216;quotes&#8217; and &#x201C;double&#x201D;",
        "emoji &#128512; supplementary",
        "no semicolon &#39end and &#x27end",
        "amp ref &#38;lt; must stay &lt;",          # one-pass rule
        "double-escaped &amp;#8212; stays a ref",   # one-pass rule
        "C1 remap &#147;smart&#148; and &#0128;euro",
        "out of range &#1114112; and &#x110000;",
        "surrogate &#xD800; pair &#55296;",
        "noncharacter &#x0b; &#xfdd0; &#xFFFE; gone",
        "zero &#0; and CR &#13; specials",
        "huge &#99999999999999999999; overflow",
        "not refs: &# x27; &#; &#zz; 100% & plain",
        "adjacent&#65;&#66;&#67;refs",
    ]
    got = _run(spark, cases)
    for src, g in zip(cases, got):
        # the surrounding pipeline also collapses whitespace — apply
        # the same normalization to the oracle
        import re

        want = _html.unescape(src)
        want = re.sub(r"[ \t\x0B\r]+", " ", want)
        want = re.sub(r" ?\n ?", "\n", want)
        want = re.sub(r"\n{3,}", "\n\n", want)
        want = re.sub(r"^\s+|\s+$", "", want)
        assert g == want, f"{src!r}: {g!r} != {want!r}"


def test_feeds_dedup_paragraphs(spark):
    """The composition the op exists for: block breaks become the
    \\n\\n paragraph boundaries the corpus dedup keys on."""
    from datar_polars_spark.scale import dedup_paragraphs

    pages = [
        (1, "<p>Cookie banner.</p><p>Unique one.</p>"),
        (2, "<p>Cookie banner.</p><p>Unique two.</p>"),
    ]
    td = ensure_tibble(spark.createDataFrame(pages, "doc_id long, html string"))
    texts = html_to_text(td)
    out = {r["doc_id"]: r for r in dedup_paragraphs(texts).df.collect()}
    assert out[1]["text"] == "Cookie banner.\n\nUnique one."
    assert out[2]["text"] == "Unique two."
    assert out[2]["paras_removed"] == 1


def test_null_and_malformed(spark):
    got = _run(spark, [None, "no tags at all", "<p>unclosed", "a < b math"])
    assert got[0] is None
    assert got[1] == "no tags at all"
    assert got[2] == "unclosed"
    # a bare '<' with no closing '>' survives as text (documented)
    assert got[3] == "a < b math"


def test_validation_and_plan(spark):
    td = ensure_tibble(
        spark.createDataFrame([(1, "<p>x</p>", "t")], "id long, html string, text string")
    )
    with pytest.raises(ValueError, match="out_col"):
        html_to_text(td)  # default out_col='text' already exists
    out = html_to_text(td, out_col="extracted")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # default: pure JVM regex chain
    assert "Exchange" not in plan
