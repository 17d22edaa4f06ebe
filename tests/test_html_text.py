"""HTML → text extraction: behavior pins on crafted pages, exact parity
with a Python reference implementing the same documented pipeline, and
the safety ordering (entities decode after tag stripping)."""

import re

import pytest

from streamsum_spark.operators.html_text import (
    _ANY_TAG,
    _BLOCK_TAGS,
    _COMMENTS,
    _DROP_ELEMENTS,
    _NAMED_ENTITIES,
    clean_html,
)


def _py_reference(s: str) -> str:
    s = re.sub(_DROP_ELEMENTS, " ", s)
    s = re.sub(_COMMENTS, " ", s)
    s = re.sub(_BLOCK_TAGS, "\n", s)
    s = re.sub(_ANY_TAG, " ", s)
    for ent, rep in _NAMED_ENTITIES:
        s = s.replace(ent, rep)
    s = re.sub(r"[ \t\x0b\f\r]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{2,}", "\n", s)
    return s.strip()


PAGE = """<!DOCTYPE html><html><head>
<title>My Page</title>
<style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head><body>
<!-- navigation -->
<div class="nav"><ul><li>Home</li><li>About</li></ul></div>
<h1>The &quot;Heading&quot;</h1>
<p>First paragraph with <b>bold</b> and <a href="/x?a=1&amp;b=2">a link</a>.</p>
<p>Second&nbsp;paragraph &#8212; with entities: 2 &lt; 3 &amp;&amp; 5 &gt; 4.</p>
<table><tr><td>cell one</td><td>cell two</td></tr></table>
<noscript>Enable JS!</noscript>
</body></html>"""


def _run(spark, pages):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], "doc_id long, html string")
    return [r.text for r in clean_html(df).orderBy("doc_id").collect()]


def test_page_extraction(spark):
    (text,) = _run(spark, [PAGE])
    assert "color: red" not in text
    assert "not text" not in text          # script content gone
    assert "Enable JS!" not in text        # noscript gone
    assert "navigation" not in text        # comment gone
    assert 'The "Heading"' in text
    assert "a link" in text and "/x?a=1" not in text
    assert "2 < 3 && 5 > 4" in text
    assert "Second paragraph —" in text    # nbsp + numeric mdash decoded
    # block boundaries became newlines: heading and paragraph don't fuse
    assert re.search(r'Heading"\nFirst paragraph', text)
    assert "<" not in text.replace("2 < 3", "")  # no live markup remains


def test_matches_python_reference(spark):
    pages = [
        PAGE,
        "plain text, no markup at all",
        "<p>a</p><p>b</p><br><br><br><div>c</div>",
        "<SCRIPT>upper case</SCRIPT>ok<Style a=b>x</style>done",
        "entities only: &lt;tag&gt; &amp;amp; &#39;quoted&#39;",
        "<p class='unterminated",
        "",
        "<ul><li>one<li>two<li>three</ul>",
    ]
    got = _run(spark, pages)
    assert got == [_py_reference(p) for p in pages]


def test_entity_decode_cannot_resurrect_markup(spark):
    # "&lt;script&gt;alert()&lt;/script&gt;" is TEXT in the source;
    # decoding after stripping keeps it text
    (text,) = _run(spark, ["<p>&lt;script&gt;alert()&lt;/script&gt;</p>"])
    assert text == "<script>alert()</script>"
    # and "&amp;lt;" single-decodes to the literal "&lt;"
    (text,) = _run(spark, ["<p>&amp;lt;</p>"])
    assert text == "&lt;"


def test_clean_html_emits_length(spark):
    df = spark.createDataFrame([(1, "<p>abc</p>")], "doc_id long, html string")
    (row,) = clean_html(df).collect()
    assert row.text == "abc" and row.text_chars == 3


def test_plan_is_expression_level(spark):
    # one projection, no BatchEvalPython / ArrowEvalPython in the plan
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    plan = clean_html(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
