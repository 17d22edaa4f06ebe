"""HTML → text extraction as a pure expression chain — the standard
first step of a web-crawl training pipeline (strip markup before
quality scoring, language ID, and dedup).

Entirely JVM-side (chained ``regexp_replace`` — no UDF, no Python in
the hot path, whole-stage codegen keeps the scan fused), which is the
point at 100 TB: boilerplate stripping is a per-byte cost over the
whole crawl.  The transform is deliberately the classic WET-style
extraction, not a DOM-accurate renderer:

1. drop <script>/<style>/<noscript>/<template> elements with their
   contents (case-insensitive, dotall, backreference-matched close),
2. drop HTML comments,
3. turn block-level boundaries (p, div, br, li, headings, table rows,
   ...) into newlines so sentences from different blocks never fuse,
4. strip every remaining tag,
5. decode entities LAST (named big-6 + nbsp + decimal/hex numeric for
   the printable ASCII range) — decoding after tag-stripping means an
   ``&lt;script&gt;`` literal can never resurrect as live markup,
6. collapse whitespace (intra-line runs to one space, blank-line runs
   to one newline, trim).

Numeric entities outside printable ASCII are left verbatim (a regexp
cannot synthesize arbitrary Unicode); documented, and the cases a
crawl actually contains (&#39;, &#8217; etc.) are covered by the
explicit table below.

Known tradeoff, shared with the WET convention: an UNCLOSED <script>
(no closing tag anywhere) cannot be dropped with its contents by a
close-matched pattern, so its tag is stripped and its body leaks into
the text.  Real crawls close their scripts; the quality filters
downstream (symbol ratio, stopword density) are the net for the rest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DROP_ELEMENTS = r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>"
_COMMENTS = r"(?s)<!--.*?-->"
_BLOCK_TAGS = (
    r"(?i)</?(p|div|br|li|ul|ol|dl|dt|dd|h[1-6]|tr|table|thead|tbody|"
    r"blockquote|pre|section|article|header|footer|nav|aside|figure|"
    r"figcaption|form|fieldset|hr|address)\b[^>]*/?>"
)
_ANY_TAG = r"(?s)<[^>]*>"

# entity → replacement, decoded AFTER tag stripping.  &amp; must come
# last so "&amp;lt;" decodes to "&lt;" (text), not "<" (double decode).
_NAMED_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&#x27;", "'"),
    ("&#8217;", "’"),
    ("&#8216;", "‘"),
    ("&#8220;", "“"),
    ("&#8221;", "”"),
    ("&#8211;", "–"),
    ("&#8212;", "—"),
    ("&hellip;", "…"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def html_to_text_col(col: Column) -> Column:
    """The extraction as a Column expression, composable into any
    projection."""
    c = F.regexp_replace(col, _DROP_ELEMENTS, " ")
    c = F.regexp_replace(c, _COMMENTS, " ")
    c = F.regexp_replace(c, _BLOCK_TAGS, "\n")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    for ent, rep in _NAMED_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t\x0b\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # Spark trim() strips spaces only — btrim both whitespace kinds
    return F.btrim(c, F.lit(" \n"))


def clean_html(df: DataFrame, col: str = "html", out: str = "text") -> DataFrame:
    """One projection over the scan: the input relation plus the
    extracted ``out`` column and its length (the field quality filters
    key on first)."""
    c = html_to_text_col(F.col(col))
    return df.withColumn(out, c).withColumn(
        f"{out}_chars", F.length(F.col(out)).cast("long")
    )
