"""Charset detection + transcoding for crawled text (round 7).

Real corpora are NOT all UTF-8: Common Crawl is ~5-10% legacy encodings
(windows-1252 and friends), and a reader that hard-decodes UTF-8 with
replacement silently mojibakes every such document — corrupting dedup
fingerprints, quality scores and the training text itself. This module
is the dependency-free core of what production pipelines use chardet /
cchardet for, covering the detection ladder that handles the vast
majority of crawl text:

1. **BOM** — UTF-8-sig, UTF-16 LE/BE byte-order marks are definitive
   (and real: Windows tooling emits them constantly).
2. **Declared charset** (the HTTP ``Content-Type: ...; charset=`` the
   crawler captured) — trusted when the bytes actually decode under it
   strictly; a wrong declaration falls through rather than mojibake.
3. **Strict UTF-8 attempt** — UTF-8 is self-validating: random legacy
   bytes are overwhelmingly unlikely to form valid multi-byte
   sequences, so a clean strict decode IS the detection.
4. **windows-1252 fallback** — the de-facto meaning of undeclared
   8-bit web text (it strictly supersets printable latin-1); decodes
   any byte string, so the ladder always terminates.

Statistical detection of BOM-less UTF-16 and East-Asian encodings
(GB18030, Shift-JIS, EUC-KR) is out of scope and documented as such —
those require the frequency tables a chardet-class library carries; a
cluster with those installed plugs them in between steps 3 and 4.
"""

from __future__ import annotations

import codecs

# charset-label normalization: HTTP declarations in the wild
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "utf_8": "utf-8",
    "utf-16": "utf-16",
    "utf16": "utf-16",
    "utf-16le": "utf-16",
    "utf-16be": "utf-16",
    "latin-1": "cp1252",  # the WHATWG rule: latin-1 means cp1252 on the web
    "latin1": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "utf-8",  # ascii is a utf-8 subset; label the superset
    "us-ascii": "utf-8",
}

_DECODERS = {"utf-8": "utf-8", "utf-16": "utf-16", "cp1252": "cp1252"}


def normalize_charset_label(declared: str | None) -> str | None:
    """HTTP charset token -> canonical label, ``None`` if unknown."""
    if not declared:
        return None
    return _ALIASES.get(declared.strip().strip('"').lower())


def detect_and_decode(b: bytes, declared: str | None = None) -> tuple[str, str]:
    """``(text, charset_label)`` for raw crawl bytes via the module
    ladder (BOM > valid declaration > strict UTF-8 > cp1252). Never
    raises and never returns replacement characters for the supported
    encodings — cp1252 maps every byte."""
    # 1. BOMs are definitive
    if b[:3] == codecs.BOM_UTF8:
        return b[3:].decode("utf-8", "replace"), "utf-8"
    if b[:2] in (codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE):
        # python's 'utf-16' consumes the BOM and picks the right order
        return b.decode("utf-16", "replace"), "utf-16"
    # 2. a declaration that actually decodes strictly wins
    label = normalize_charset_label(declared)
    if label is not None:
        try:
            return b.decode(_DECODERS[label], "strict"), label
        except UnicodeDecodeError:
            pass  # lying server: fall through to content detection
    # 3. UTF-8 is self-validating
    try:
        return b.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        pass
    # 4. the web's default 8-bit meaning
    return b.decode("cp1252", "replace"), "cp1252"


def charset_from_content_type(content_type: str | None) -> str | None:
    """Extract the ``charset=`` token from an HTTP Content-Type value."""
    if not content_type:
        return None
    for part in content_type.split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset":
            return v.strip()
    return None
