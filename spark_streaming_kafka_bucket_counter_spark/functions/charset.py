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
3. **BOM-less UTF-16** (round 8) — structural: legitimate text never
   contains NUL bytes, so a byte string whose NULs sit almost
   exclusively at one parity IS UTF-16 of ASCII-range text, and the
   parity names the endianness. This rung sits BEFORE the UTF-8
   attempt because NUL is a valid UTF-8 code point — UTF-16LE of
   ASCII text would otherwise pass strict UTF-8 as NUL-riddled junk.
4. **Strict UTF-8 attempt** — UTF-8 is self-validating: random legacy
   bytes are overwhelmingly unlikely to form valid multi-byte
   sequences, so a clean strict decode IS the detection.
5. **East-Asian multibyte** (round 8, Big5 round 9) — GB18030/GBK,
   Shift_JIS (windows-31j), EUC-KR (cp949), Big5 (cp950): a structural
   gate first — high bytes must cluster into adjacent multi-byte runs
   (Western legacy text has ISOLATED accented bytes, EUC-family CJK
   text has runs), OR pair-walk as well-formed Big5, whose ASCII-range
   trail bytes (0x40-0x7E) make Traditional-Chinese text carry isolated
   high bytes the adjacency gate cannot see — then strict candidate
   decodes scored the way chardet-class detectors score them, in
   miniature: kana is unique to Shift_JIS output (the EUC families
   decode under cp932 to HALF-width kana, deliberately excluded); the
   GB-vs-KR ambiguity (GB2312 and KS X 1001 occupy the SAME byte
   ranges — bytes alone cannot settle it) is broken by home-script
   fraction plus tiny built-in frequency anchors (the most common
   hanzi / hangul syllables, public linguistic data); the Big5-vs-GB
   ambiguity (both decode each other's bytes strictly much of the
   time, into the same Han block) is broken by whether the DECODE
   produces frequent characters — simplified anchors for gb18030,
   traditional anchors for Big5, ties to gb18030 (web prevalence).
   Kana-less Japanese (rare headline fragments) scores as Han and
   lands on gb18030 — the documented residual, same as any frequency
   detector at this table size.
6. **windows-1252 fallback** — the de-facto meaning of undeclared
   8-bit web text (it strictly supersets printable latin-1); decodes
   any byte string, so the ladder always terminates.
"""

from __future__ import annotations

import codecs

# charset-label normalization: HTTP declarations in the wild.
# WHATWG mappings: latin-1 family means cp1252 on the web; shift_jis
# means windows-31j (cp932); euc-kr means cp949; the gbk/gb2312 family
# decodes under the gb18030 superset.
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "utf_8": "utf-8",
    "utf-16": "utf-16",
    "utf16": "utf-16",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
    "latin-1": "cp1252",  # the WHATWG rule: latin-1 means cp1252 on the web
    "latin1": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "utf-8",  # ascii is a utf-8 subset; label the superset
    "us-ascii": "utf-8",
    "gb18030": "gb18030",
    "gbk": "gb18030",
    "gb2312": "gb18030",
    "gb_2312-80": "gb18030",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "windows-31j": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-kr": "euc-kr",
    "euckr": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "ksc_5601": "euc-kr",
    "korean": "euc-kr",
    "cseuckr": "euc-kr",
    "big5": "big5",
    "big-5": "big5",
    "big5-hkscs": "big5",
    "cn-big5": "big5",
    "csbig5": "big5",
    "x-x-big5": "big5",
    "cp950": "big5",
}

_DECODERS = {
    "utf-8": "utf-8",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "cp1252": "cp1252",
    "gb18030": "gb18030",
    "shift_jis": "cp932",  # WHATWG: Shift_JIS labels mean windows-31j
    "euc-kr": "cp949",  # WHATWG: EUC-KR labels mean cp949
    "big5": "cp950",  # WHATWG: Big5 labels mean the Windows-950 superset
}

# declared utf-16le/be decode with the declared endianness but surface
# the family label, matching the BOM path
_CANONICAL_LABEL = {"utf-16le": "utf-16", "utf-16be": "utf-16"}


def normalize_charset_label(declared: str | None) -> str | None:
    """HTTP charset token -> canonical label, ``None`` if unknown."""
    if not declared:
        return None
    return _ALIASES.get(declared.strip().strip('"').lower())


# -- statistical detectors (ladder steps 4-5, round 8) ----------------------

#: most common hanzi / hangul syllables in running text — the miniature
#: frequency tables that break the GB2312-vs-KSX1001 byte-range tie
#: (public linguistic frequency data; 的 alone is ~4% of Chinese text)
_ZH_ANCHORS = frozenset(
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得"
    "就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日"
    "于起还发成事只作当想看文无开手十用主行方又如前所本见经"
)
_KO_ANCHORS = frozenset(
    "이다의를에은는가하고지한로서수있기되어아게보으나사람도만그때문"
    "우리나라년것해주시간같장말대상동안중내더니까습니었입요적면과였"
)
#: the same high-frequency list in TRADITIONAL forms (round 9, Big5):
#: characters identical in both scripts stay (的一是不...), divergent
#: ones use the traditional glyph (這 來 國 個 說 們 為 時 會 著 過 學
#: 對 裡 後 麼 於 沒 發 無 見 經 還 當 開). The anchor table scores the
#: DECODED text, so GB-mojibake of Big5 bytes (random hanzi) scores ~0
#: while the correct decode scores high — that, not byte ranges, breaks
#: the Big5-vs-GB18030 tie (both decode each other's bytes strictly
#: much of the time, always into the same Han block).
_ZH_TRAD_ANCHORS = frozenset(
    "的一是不了人我在有他這中大來上國個到說們為子和你地出道也時年得"
    "就那要下以生會自著去之過家學對可她裡後小麼心多天而能好都然沒日"
    "於起還發成事只作當想看文無開手十用主行方又如前所本見經台灣與點"
)


def _detect_utf16_heuristic(b: bytes) -> str | None:
    """BOM-less UTF-16 by NUL-byte parity: 8-bit text never carries
    NULs, UTF-16 of Latin-range text carries one per character, always
    at the same parity. Returns the python codec name or None."""
    if len(b) < 8 or len(b) % 2:
        return None
    odd = b[1::2].count(0)
    even = b[0::2].count(0)
    half = len(b) // 2
    if odd / half >= 0.5 and even / half < 0.05:
        return "utf-16-le"
    if even / half >= 0.5 and odd / half < 0.05:
        return "utf-16-be"
    return None


def _clustered_high_bytes(b: bytes) -> bool:
    """True when high bytes are numerous AND overwhelmingly adjacent to
    other high bytes — the signature of multi-byte CJK encodings.
    Western legacy text has ISOLATED accented bytes (naïve, café,
    Straße), so it never trips this gate."""
    high = [i for i, x in enumerate(b) if x >= 0x80]
    if len(high) < 8:
        return False
    adjacent = sum(
        1
        for k, i in enumerate(high)
        if (k > 0 and high[k - 1] == i - 1)
        or (k + 1 < len(high) and high[k + 1] == i + 1)
    )
    return adjacent / len(high) >= 0.75


def _big5_pair_structure(b: bytes) -> bool:
    """Big5's structural signature (round 9): lead bytes 0x81-0xF9 take
    trail bytes in 0x40-0x7E *or* 0xA1-0xFE — the ASCII-range trails
    mean Traditional-Chinese text carries ISOLATED high bytes
    (lead-high, trail-low, lead-high, ...) that the adjacency gate
    built for the EUC family rejects, which is exactly how Big5 pages
    used to fall through to cp1252. Validate instead by pair-walking:
    nearly every high byte must open a well-formed Big5 pair, with
    enough pairs that a Western document's few isolated accents (which
    can fake 1-2 pairs: ï+'v' is byte-wise a legal pair) cannot trip
    it. Frequency anchors still make the final call."""
    pairs = 0
    bad = 0
    i = 0
    n = len(b)
    while i < n:
        x = b[i]
        if x < 0x80:
            i += 1
            continue
        if (
            0x81 <= x <= 0xF9
            and i + 1 < n
            and (0x40 <= b[i + 1] <= 0x7E or 0xA1 <= b[i + 1] <= 0xFE)
        ):
            pairs += 1
            i += 2
        else:
            bad += 1
            i += 1
    return pairs >= 4 and bad * 8 <= pairs


def _detect_east_asian(b: bytes) -> tuple[str, str] | None:
    """GB18030 / Shift_JIS / EUC-KR / Big5 structural + frequency
    detection. Returns ``(label, decoded_text)`` or None (fall through
    to cp1252). Conservative by construction: a structure gate rejects
    Western legacy text before any candidate decode — the EUC-family
    adjacency gate (isolated accented bytes never cluster), or the
    Big5 pair-walk (round 9) for the ASCII-trail shape the adjacency
    gate cannot see. Entries through the Big5-only gate additionally
    demand multiple frequency-anchor hits, because a handful of
    accented-letter + ASCII byte pairs are byte-wise legal Big5 (and
    GBK) — structure alone cannot clear cp1252 bodies there."""
    clustered = _clustered_high_bytes(b)
    big5_shape = _big5_pair_structure(b) if not clustered else False
    if not clustered and not big5_shape:
        return None
    base_min_hits = 0 if clustered else 2

    def _strict(codec: str) -> str | None:
        try:
            return b.decode(codec, "strict")
        except (UnicodeDecodeError, ValueError):
            return None

    # kana is decisive: only true Shift_JIS bytes decode under cp932 to
    # FULL-width kana (EUC-family bytes land in the half-width block)
    t = _strict("cp932")
    if t is not None:
        kana = sum(1 for c in t if 0x3040 <= ord(c) <= 0x30FF)
        if kana >= 2:
            return "shift_jis", t

    # GB-vs-KR-vs-Big5: overlapping byte ranges, so score home-script
    # fraction plus anchor hits and require a clear, confident winner.
    # Big5 sits LAST with a mandatory anchor hit: at equal scores the
    # web-prevalence prior (GB material outweighs Big5) wins, and a
    # strict-decoding-but-anchorless Big5 claim is never made — GB
    # bytes usually decode strictly under cp950 too (into anchorless
    # mojibake), so for the Han pair the anchors ARE the evidence.
    best: tuple[float, str, str] | None = None
    for label, codec, lo, hi, anchors, min_hits in (
        ("euc-kr", "cp949", 0xAC00, 0xD7A3, _KO_ANCHORS, base_min_hits),
        ("gb18030", "gb18030", 0x4E00, 0x9FFF, _ZH_ANCHORS, base_min_hits),
        ("big5", "cp950", 0x4E00, 0x9FFF, _ZH_TRAD_ANCHORS,
         max(1, base_min_hits)),
    ):
        t = _strict(codec)
        if t is None:
            continue
        non_ascii = [c for c in t if ord(c) > 0x7F]
        if not non_ascii:
            continue
        home = sum(1 for c in non_ascii if lo <= ord(c) <= hi)
        hits = sum(1 for c in non_ascii if c in anchors)
        if hits < min_hits:
            continue
        score = home / len(non_ascii) + 2.0 * hits / len(non_ascii)
        if score >= 0.8 and (best is None or score > best[0]):
            best = (score, label, t)
    if best is not None:
        return best[1], best[2]
    return None


def detect_and_decode(b: bytes, declared: str | None = None) -> tuple[str, str]:
    """``(text, charset_label)`` for raw crawl bytes via the module
    ladder (BOM > valid declaration > BOM-less UTF-16 > strict UTF-8 >
    East-Asian statistical > cp1252). Never raises and never returns
    replacement characters for the supported encodings — cp1252 maps
    every byte."""
    # 1. BOMs are definitive
    if b[:3] == codecs.BOM_UTF8:
        return b[3:].decode("utf-8", "replace"), "utf-8"
    if b[:2] in (codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE):
        # python's 'utf-16' consumes the BOM and picks the right order
        return b.decode("utf-16", "replace"), "utf-16"
    # 2. a declaration that actually decodes strictly wins — EXCEPT an
    # 8-bit declaration over bytes with multi-byte structure: cp1252
    # strictly decodes almost any byte string, so "decodes" proves
    # nothing there. A Korean page declared latin-1 (the classic
    # mojibake) carries clustered high bytes or parity NULs that an
    # honest cp1252 page never does; distrust and fall through.
    label = normalize_charset_label(declared)
    if label == "cp1252" and (
        _clustered_high_bytes(b) or _big5_pair_structure(b)
    ):
        label = None
    if label in ("cp1252", "utf-8") and _detect_utf16_heuristic(b) is not None:
        # NUL is valid in both cp1252 and UTF-8, so "decodes strictly"
        # proves nothing against parity-structured NULs either
        label = None
    if label is not None:
        try:
            text = b.decode(_DECODERS[label], "strict")
            return text, _CANONICAL_LABEL.get(label, label)
        except UnicodeDecodeError:
            pass  # lying server: fall through to content detection
    # 3. BOM-less UTF-16 (NUL parity names the endianness). BEFORE the
    # UTF-8 rung on purpose: NUL is a *valid* UTF-8 code point, so
    # UTF-16LE of ASCII text strictly "decodes" as UTF-8 — but no
    # legitimate text carries NULs, so parity-structured NULs win.
    u16 = _detect_utf16_heuristic(b)
    if u16 is not None:
        try:
            return b.decode(u16, "strict"), "utf-16"
        except UnicodeDecodeError:
            pass
    # 4. UTF-8 is self-validating
    try:
        return b.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        pass
    # 5. East-Asian multibyte (structural gate + frequency anchors)
    ea = _detect_east_asian(b)
    if ea is not None:
        return ea[1], ea[0]
    # 6. the web's default 8-bit meaning
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
