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
        # links live OUTSIDE content tags: the text extractor must drop
        # them (nav boilerplate) while the link extractor reads them —
        # one relative messy href (urljoin + canonicalization under
        # test) and one absolute cross-host href
        f"<div class=\"nav\">menu item {doc_id} &copy;"
        f"<a href=\"/doc/{(doc_id * 3 + 1) % 1000}?utm_source=track&amp;b=2#frag\">"
        f"next {doc_id}</a>"
        f"<a href=\"HTTP://Other.EXAMPLE:80/doc/{doc_id % 50}/\">other</a>"
        "</div>"
        "</body></html>"
    )


class _LinkExtractor(HTMLParser):
    """Collect ``(href, anchor_text)`` pairs; anchor text merges nested
    inline children, script/style subtrees contribute nothing."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
        elif tag == "a" and self._skip == 0:
            href = dict(attrs).get("href")
            if href:
                self._href = href
                self._buf = []

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag == "a" and self._href is not None:
            self.links.append((self._href, "".join(self._buf)))
            self._href = None

    def handle_data(self, data):
        if self._href is not None and self._skip == 0:
            self._buf.append(data)


def extract_links(html_doc: str, base_url: str) -> list[tuple[str, str]]:
    """One page -> ``[(absolute_url, anchor_text)]``: hrefs resolved
    against ``base_url`` (crawl pages link relatively far more often
    than absolutely), in document order."""
    from urllib.parse import urljoin

    ex = _LinkExtractor()
    try:
        ex.feed(html_doc)
        ex.close()
    except Exception:
        pass  # dirty crawl HTML: keep whatever parsed
    out = []
    for href, anchor in ex.links:
        try:
            out.append((urljoin(base_url, href), anchor))
        except ValueError:
            continue  # unresolvable href: not an edge
    return out


def html_links(df: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> raw outlink edges ``(doc_id, href,
    anchor)`` by synthesizing each page and running the link extractor
    over it — the crawl-frontier/link-graph feed (every doc's page URL
    is its base for relative resolution). Raw hrefs only: URL
    canonicalization happens downstream in whole-stage codegen
    (:func:`functions.text.canonicalize_url`), keeping the Python stage
    minimal. One Arrow stage, no shuffle."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                txt = None if txt is None or txt is pd.NA else str(txt)
                page = synthesize_html(did, txt)
                base = f"http://corpus.invalid/doc/{did}"
                for url, anchor in extract_links(page, base):
                    rows.append((did, url, anchor))
            yield pd.DataFrame(
                rows, columns=["doc_id", "href", "anchor"]
            ).astype({"doc_id": "int64"})

    return df.select("doc_id", "text").mapInPandas(
        _run, "doc_id long, href string, anchor string"
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
