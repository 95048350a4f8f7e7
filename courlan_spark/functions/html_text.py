"""Minimal HTML -> text extraction for pages lacking a text column.

Not a boilerplate-removal engine (that is a different project's job —
the north-rule input ships `text` alongside `html`); this is the
fallback that keeps the dedup pipeline runnable when only raw HTML is
present: drop script/style/comments, strip tags, unescape entities,
normalize whitespace.  Deterministic and vectorizable.
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd

_RX_DROP = re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_RX_BLOCK = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer)\b[^>]*>",
    re.IGNORECASE,
)
_RX_TAG = re.compile(r"<[^>]+>")
_RX_WS = re.compile(r"[ \t\r\f\v]+")
_RX_NL = re.compile(r"\n\s*\n+")


def html_to_text(html: str) -> str:
    "Strip markup; block-level tags become newlines."
    if not html:
        return ""
    text = _RX_DROP.sub(" ", html)
    text = _RX_BLOCK.sub("\n", text)
    text = _RX_TAG.sub(" ", text)
    text = unescape(text)
    text = _RX_WS.sub(" ", text)
    text = _RX_NL.sub("\n", text)
    return text.strip()


def make_html_text_udf():
    "binary/string html column -> extracted text."
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def html_text_udf(htmls: pd.Series) -> pd.Series:
        out = []
        for html in htmls:
            if isinstance(html, (bytes, bytearray)):
                html = html.decode("utf-8", errors="replace")
            out.append(html_to_text(html) if isinstance(html, str) else "")
        return pd.Series(out)

    return html_text_udf
