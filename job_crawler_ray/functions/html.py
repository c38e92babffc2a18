"""HTML render/parse for the synthetic crawl corpus.

The input contract (`/root/repo/BASELINE.json` ``input_hint``) carries
both ``html:binary`` (the fetched page bytes) and ``text:large_string``
(the golden extracted text). The parity invariant is **byte-identical
extracted text per url**: ``parse_pages_batch`` run over ``html`` must
reproduce ``text`` exactly (mirrors the reference's per-record text
path `/root/reference/src/claude_job_agent/main.py:222-236`, where the
posting body is carried verbatim, truncated downstream).

Pages are a fixed template with head ``<meta>`` fields (title, company,
location, salary bounds, contract type, posting date, category) and the
posting body inside ``<article>...</article>``, HTML-escaped. Escape /
unescape are exact inverses, all implemented as vectorized pandas
string kernels — no per-row Python, no regex backtracking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_ARTICLE_OPEN = "<article>"
_ARTICLE_CLOSE = "</article>"

META_FIELDS = [
    "title",
    "company",
    "location",
    "salary_min",
    "salary_max",
    "contract_type",
    "posted_date",
    "category",
]


def escape_html(s: pd.Series) -> pd.Series:
    """``&`` → ``&amp;``, ``<`` → ``&lt;``, ``>`` → ``&gt;`` (order matters)."""
    return (
        s.str.replace("&", "&amp;", regex=False)
        .str.replace("<", "&lt;", regex=False)
        .str.replace(">", "&gt;", regex=False)
    )


def unescape_html(s: pd.Series) -> pd.Series:
    """Exact inverse of :func:`escape_html` (reverse order)."""
    return (
        s.str.replace("&gt;", ">", regex=False)
        .str.replace("&lt;", "<", regex=False)
        .str.replace("&amp;", "&", regex=False)
    )


def render_pages(fields: pd.DataFrame, text: pd.Series) -> pd.Series:
    """Vectorized page renderer: field frame + body text → html string Series."""
    head = pd.Series("<!DOCTYPE html><html><head>", index=text.index)
    for name in META_FIELDS:
        col = fields[name].astype("object").fillna("").astype(str)
        head = head + '<meta name="' + name + '" content="' + escape_html(col) + '">'
    return (
        head
        + "</head><body>"
        + _ARTICLE_OPEN
        + escape_html(text.fillna(""))
        + _ARTICLE_CLOSE
        + "</body></html>"
    )


def _between(s: pd.Series, left: str, right: str) -> pd.Series:
    """Substring strictly between first `left` and next `right` ('' if absent)."""
    return s.str.partition(left)[2].str.partition(right)[0]


def parse_pages_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """map_batches parser: html bytes → structured job-record columns.

    Appends ``extracted_text`` (the byte-identity target) plus the
    flattened record fields the reference reader produces
    (`main.py:222-236`): title, company, location, salary bounds,
    contract_type, posted_date, category, and ``description`` =
    ``extracted_text[:1000]`` (the ingest truncation `main.py:231-233`).
    """
    col = batch[html_col]
    col_type = col.type if hasattr(col, "type") else col.chunk(0).type
    if pa.types.is_binary(col_type) or pa.types.is_large_binary(col_type):
        col = pa.compute.cast(col, pa.string())  # corpus is UTF-8 by construction
    html = col.to_pandas().fillna("")

    out = batch
    parsed: dict[str, pd.Series] = {}
    for name in META_FIELDS:
        parsed[name] = unescape_html(_between(html, f'<meta name="{name}" content="', '">'))
    text = unescape_html(_between(html, _ARTICLE_OPEN, _ARTICLE_CLOSE))

    for name in ("title", "company", "location", "contract_type", "posted_date", "category"):
        out = out.append_column(name, pa.array(parsed[name], type=pa.string()))
    for name in ("salary_min", "salary_max"):
        num = pd.to_numeric(parsed[name], errors="coerce")
        out = out.append_column(name, pa.array(num.astype("float64"), from_pandas=True))
    out = out.append_column("extracted_text", pa.array(text, type=pa.large_string()))
    out = out.append_column(
        "description", pa.array(text.str.slice(0, 1000), type=pa.string())
    )
    return out
