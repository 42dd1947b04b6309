"""Document parsers — boilerplate removal for training-data curation.

Reference analogue: ``xpacks/llm/parsers.py:53-746`` (ParseUnstructured /
ParseUtf8 — external-service UDFs, out of engine scope).  The in-engine
analogues handle the codec-free formats a 100 TB text pipeline actually
meets in bulk: HTML tag soup and markdown markup, reduced to clean text
with deterministic regexp chains.

All transforms are pure column expressions (regexp_replace → whole-stage
codegen, no UDF), and every pattern is dialect-portable (RE2-compatible:
no lookaround, no backrefs in the MATCH; replacement groups use the
engine's own syntax) so the operators are exactly SQL-oracle-checkable.

>>> import pyspark.sql.functions as F
>>> t = spark.createDataFrame([("<p>Hi &amp; bye</p><script>x=1</script>",)], "h string")
>>> t.select(strip_html(F.col("h")).alias("s")).first()["s"]
'Hi & bye'
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# (pattern, spark_replacement) — ORDER MATTERS and is mirrored by the oracle
_HTML_RULES: list[tuple[str, str]] = [
    (r"(?s)<(script|style)[^>]*>.*?</(script|style)>", " "),  # active content
    (r"(?s)<!--.*?-->", " "),                                  # comments
    (r"<[^>]+>", " "),                                         # tags
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),  # LAST: earlier would double-unescape '&amp;lt;' to '<'
]

_MD_RULES: list[tuple[str, str]] = [
    (r"(?s)```.*?```", " "),            # fenced code blocks
    (r"`([^`]*)`", "$1"),               # inline code
    (r"!\[[^\]]*\]\([^)]*\)", " "),     # images
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),   # links → anchor text
    (r"(?m)^#{1,6}[ \t]*", ""),         # headers
    (r"(?m)^[-*+][ \t]+", ""),          # list bullets
    (r"(?m)^>[ \t]?", ""),              # blockquotes
    # emphasis markers only at token boundaries — a bare [*_]{1,3} would
    # corrupt snake_case identifiers and inline arithmetic (my_var, 2*3);
    # boundary-anchored via capture groups (RE2-portable: no lookaround)
    (r"(^|[\s(\[{])[*_]{1,3}", "$1"),
    (r"[*_]{1,3}([\s)\]}.,;:!?]|$)", "$1"),
]


def _apply_rules(text: Column, rules: list[tuple[str, str]]) -> Column:
    out = text
    for pattern, repl in rules:
        out = F.regexp_replace(out, pattern, repl)
    # collapse the whitespace the removals leave behind
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_html(text: Column) -> Column:
    """HTML → clean text: drop script/style/comments, strip tags, unescape
    the common entities, collapse whitespace."""
    return _apply_rules(text, _HTML_RULES)


def markdown_to_text(text: Column) -> Column:
    """Markdown → clean text: drop code fences/images, keep link anchor
    text, strip headers/bullets/quotes/emphasis markers.

    >>> import pyspark.sql.functions as F
    >>> t = spark.createDataFrame([("# Title\\nsee [docs](http://x) *now*",)], "m string")
    >>> t.select(markdown_to_text(F.col("m")).alias("s")).first()["s"]
    'Title see docs now'
    """
    return _apply_rules(text, _MD_RULES)


def extract_links(html: Column) -> Column:
    """Array of href targets from raw HTML — the frontier-building step
    between fetch/parse and URL canonicalization (compose with
    ``text.canonicalize_urls`` after exploding).  Double-quoted hrefs
    come first, then single-quoted, each family in document order;
    case-insensitive attribute match.  Pure regexp_extract_all (RE2-
    portable, no lookaround) so the extraction is exactly
    SQL-oracle-checkable and runs inside whole-stage codegen at any
    scale.  Target filtering (javascript:/mailto:/#fragment) and
    relative-URL resolution are left to the caller — they need
    page-context policy this column expression shouldn't bake in.

    >>> import pyspark.sql.functions as F
    >>> t = spark.createDataFrame(
    ...     [('<a HREF="https://a.com/x">t</a><a href=\\'/rel\\'>r</a>',)],
    ...     "h string")
    >>> t.select(extract_links(F.col("h")).alias("l")).first()["l"]
    ['https://a.com/x', '/rel']
    """
    dq = F.regexp_extract_all(html, F.lit(r'(?i)href\s*=\s*"([^"]*)"'), 1)
    sq = F.regexp_extract_all(html, F.lit(r"(?i)href\s*=\s*'([^']*)'"), 1)
    return F.concat(dq, sq)


def sitemap_locs(xml: Column) -> Column:
    """Array of ``<loc>`` URLs from a sitemap (or sitemap-index) XML blob
    — the other half of frontier discovery next to
    :func:`~pathwaydataframework_spark.operators.text.parse_robots`.
    Whitespace around the URL is the spec's to allow and ours to trim;
    same RE2-portable regexp_extract_all shape as :func:`extract_links`,
    composing with the identical explode → canonicalize pipeline.

    >>> import pyspark.sql.functions as F
    >>> t = spark.createDataFrame(
    ...     [("<urlset><url><loc> https://a.com/1 </loc></url>"
    ...       "<url><loc>https://a.com/2</loc></url></urlset>",)], "x string")
    >>> t.select(sitemap_locs(F.col("x")).alias("l")).first()["l"]
    ['https://a.com/1', 'https://a.com/2']
    """
    raw = F.regexp_extract_all(xml, F.lit(r"(?is)<loc>\s*([^<]*?)\s*</loc>"), 1)
    return F.filter(raw, lambda u: u != "")
