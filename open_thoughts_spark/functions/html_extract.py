"""Main-content HTML extraction — boilerplate-block removal.

The reference extracts article text from crawled HTML with resiliparse's
``extract_plain_text(..., main_content=True)``
(/root/reference/open_thoughts_3/dcft/data_strategies/WebInstruct/
utils.py:32-50). resiliparse isn't installable here, so this module
implements the PUBLIC algorithm family that option implements: block-level
boilerplate classification in the style of jusText (Pomikálek 2011) and
Arc90 Readability — segment the DOM into text blocks, score each by length,
link density and stopword density, drop boilerplate, and rescue short
blocks sandwiched between good ones.

Classification rules (deterministic, language-light):
- blocks inside <nav>/<header>/<footer>/<aside> (HTML5 landmark tags) and
  <script>/<style>/<noscript>/<template>/comments are dropped outright;
- link density > 0.33 (chars inside <a> / total chars) -> boilerplate
  (Arc90's link-density test);
- length >= 80 chars with link density <= 0.2 -> good (jusText's
  length-based shortcut for long low-link paragraphs);
- otherwise stopword density >= 0.30 -> good, >= 0.15 -> near-good
  (rescued when an adjacent block is good — jusText's context smoothing),
  else boilerplate. Headings (<h1>-<h6>) are near-good by default so a
  title above a good paragraph survives.

Spark-first: the extractor is pure Python over strings (stdlib
``html.parser``), run as an Arrow-batched pandas UDF — the standard
harness for logic Catalyst can't express. Use ``rules.transforms.
strip_html`` when you want ALL text (native regex chain, zero Python).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from open_thoughts_spark.functions.text_stats import STOPWORDS

_STOPSET = frozenset(STOPWORDS)

# tags that terminate/open a text block (block-level elements)
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "ul", "ol", "td", "th",
    "tr", "table", "pre", "blockquote", "br", "h1", "h2", "h3", "h4", "h5",
    "h6", "figure", "figcaption", "dd", "dt", "dl", "form", "fieldset",
}
# subtrees whose text never reaches the output
_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
# HTML5 landmark containers that are boilerplate by construction
_LANDMARK_TAGS = {"nav", "header", "footer", "aside"}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

GOOD, NEAR_GOOD, BAD = 2, 1, 0


class _BlockParser(HTMLParser):
    """Stream HTML into (text, linked_chars, in_landmark, is_heading)
    blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool, bool]] = []
        self._parts: list[str] = []
        self._linked = 0
        self._drop_depth = 0
        self._landmark_depth = 0
        self._link_depth = 0
        self._heading = False

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                (text, self._linked, self._landmark_depth > 0, self._heading)
            )
        self._parts, self._linked, self._heading = [], 0, False

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag in _LANDMARK_TAGS:
            self._flush()
            self._landmark_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADING_TAGS:
                self._heading = True

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(self._drop_depth - 1, 0)
            return
        if tag in _LANDMARK_TAGS:
            self._flush()
            self._landmark_depth = max(self._landmark_depth - 1, 0)
            return
        if tag == "a":
            self._link_depth = max(self._link_depth - 1, 0)
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._parts.append(data)
        if self._link_depth:
            self._linked += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def _classify(text: str, linked: int, in_landmark: bool, heading: bool) -> int:
    if in_landmark:
        return BAD
    n = len(text)
    if n == 0:
        return BAD
    link_density = linked / n
    if link_density > 0.33:
        return BAD
    if n >= 80 and link_density <= 0.2:
        return GOOD
    words = [w.strip(".,;:!?\"'()").lower() for w in text.split()]
    if not words:
        return BAD
    stop = sum(1 for w in words if w in _STOPSET) / len(words)
    if stop >= 0.30:
        return GOOD
    if stop >= 0.15 or heading:
        return NEAR_GOOD
    return BAD


def extract_main_text(html: str | None) -> str:
    """Main content of one HTML document (empty string when none survives).

    Near-good blocks are kept only when an adjacent block (before or
    after, ignoring other near-goods between) is good — jusText's context
    smoothing, which is what keeps a headline glued to its article while
    dropping an isolated tagline."""
    if not html:
        return ""
    parser = _BlockParser()
    try:
        parser.feed(html)  # convert_charrefs handles the entities
        parser.close()
    except Exception:
        # malformed HTML beyond the tolerant parser: strip-tags fallback
        import re

        return " ".join(re.sub(r"<[^>]+>", " ", html).split())
    labels = [_classify(*b) for b in parser.blocks]
    # smoothing: near-good -> good if the nearest non-near neighbor on
    # either side is good
    n = len(labels)
    resolved = list(labels)
    for i, lab in enumerate(labels):
        if lab != NEAR_GOOD:
            continue
        prev_lab = next(
            (labels[j] for j in range(i - 1, -1, -1) if labels[j] != NEAR_GOOD),
            BAD,
        )
        next_lab = next(
            (labels[j] for j in range(i + 1, n) if labels[j] != NEAR_GOOD),
            BAD,
        )
        resolved[i] = GOOD if GOOD in (prev_lab, next_lab) else BAD
    return "\n\n".join(
        b[0] for b, lab in zip(parser.blocks, resolved) if lab == GOOD
    )


def main_content_expr(col: Column | str) -> Column:
    """Arrow-batched pandas UDF column: html -> main-content text."""

    @F.pandas_udf(StringType())
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(extract_main_text)

    return _extract(F.col(col) if isinstance(col, str) else col)


def with_main_content(df, html_col: str = "html", out_col: str = "text"):
    """parse_html parity (WebInstruct/utils.py:32-50): extract main content
    into ``out_col`` (Spark DataFrame -> Spark DataFrame)."""
    return df.withColumn(out_col, main_content_expr(html_col))
