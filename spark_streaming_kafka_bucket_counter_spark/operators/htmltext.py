"""HTML main-content extraction — the step between WARC ingest and text
curation in a real crawl pipeline (what trafilatura/jusText do, reduced
to its deterministic core so it can sit under the DuckDB oracle gate).

Extraction contract (stdlib ``html.parser``, no dependencies):
- content tags are the block-level text carriers ``p h1..h6 li``; each
  contributes one block (inline children like ``<b>``/``<a>`` merge
  into the enclosing block's text).
- ``script``/``style`` subtrees and comments contribute NOTHING (the
  classic boilerplate trap: a naive tag-stripper leaks JS into the
  corpus).
- non-content containers (``div``/``nav``/``header``/...) contribute
  nothing by themselves — their text outside content tags is dropped
  (menu/footer boilerplate).
- entities (``&amp;`` etc.) are decoded; blocks join with ``\\n``.

The synthesis side builds a deterministic page per document (title +
``<h1>`` + one ``<p>`` per text line + script/style/comment/nav noise,
all text HTML-escaped), so the extracted result must be EXACTLY
``"Doc <id>"`` + the original text lines — any leak of boilerplate or
loss of content diverges the oracle hash.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CONTENT_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li"}
SKIP_TAGS = {"script", "style"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] | None = None
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
        elif tag in CONTENT_TAGS and self._skip == 0:
            self._buf = []

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in CONTENT_TAGS and self._buf is not None:
            self.blocks.append("".join(self._buf))
            self._buf = None

    def handle_data(self, data):
        if self._buf is not None and self._skip == 0:
            self._buf.append(data)


def extract_main_text(html_doc: str) -> str:
    """One page -> newline-joined content blocks (see module contract)."""
    ex = _Extractor()
    try:
        ex.feed(html_doc)
        ex.close()
    except Exception:
        pass  # crawl HTML is dirty; keep whatever parsed
    if ex._buf is not None:  # unclosed content tag at EOF
        ex.blocks.append("".join(ex._buf))
    return "\n".join(ex.blocks)


def synthesize_html(doc_id: int, text: str | None) -> str:
    """Deterministic page for a document: escaped content plus the
    boilerplate an extractor must drop (script, style, comments, nav
    text outside content tags)."""
    lines = (text or "").split("\n") if text else []
    paras = "".join(f"<p>{_html.escape(ln)}</p>" for ln in lines)
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>t{doc_id}</title>"
        "<style>body { color: #000; }</style>"
        f"<script>var page = {doc_id}; if (page < 3) {{}}</script>"
        "</head><body>"
        f"<h1><b>Doc</b> {doc_id}</h1>"
        f"{paras}"
        "<!-- build marker <p>not content</p> -->"
        f"<div class=\"nav\">menu item {doc_id} &copy;</div>"
        "</body></html>"
    )


def html_extract_stats(df: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang) -> per-doc extracted text stats by
    synthesizing a page and running the extractor over it (one Arrow
    stage, no shuffle until the caller aggregates)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                txt = None if txt is None or txt is pd.NA else str(txt)
                texts.append(extract_main_text(synthesize_html(int(did), txt)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "lang": pdf["lang"],
                    "extracted_chars": pd.Series(
                        [len(t) for t in texts], dtype="int64"
                    ),
                    "extracted_newlines": pd.Series(
                        [t.count("\n") for t in texts], dtype="int64"
                    ),
                }
            )

    return df.select("doc_id", "text", "lang").mapInPandas(
        _run,
        "doc_id long, lang string, extracted_chars long, extracted_newlines long",
    )
