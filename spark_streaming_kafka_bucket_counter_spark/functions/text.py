"""Text-analysis building blocks for training-data pipelines: tokenize,
shingle, hash, language-ID, quality scoring, fingerprinting.

Beyond-reference scope (BASELINE.json north star): these are the column
primitives a 100 TB LLM-data pipeline needs, built as pure Catalyst
expressions — no Python in the row path, whole-stage codegen end to end.

Every builder here has a DuckDB-SQL twin (the ``*_SQL`` constants /
``*_sql`` helpers) used by the oracle queries; keeping both sides in one
module is what keeps them semantically locked:

- tokens: non-empty pieces of lower(text) split on whitespace runs
- shingles: k-word n-grams (k-grams over the token sequence)
- token_hash16: first 4 hex chars of md5 -> 16-bit int (the shared,
  engine-portable hash for simhash/fingerprints — Spark ``conv`` vs
  DuckDB ``CAST('0x…')``)
- quality score: punctuation / stopword / length ratios; all counts are
  exact integers, each ratio is ONE IEEE division (deterministic across
  engines — never a float accumulation)
- lang-id: stopword-list hit counts + argmax (n-gram heuristic)
- fingerprints: md5 over normalized text (exact) and a position-weighted
  rolling hash over token hashes (content-sensitive), both exact-integer
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------


def tokens(col: Column) -> Column:
    """Non-empty lowercase whitespace tokens."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != F.lit(""))


def tokens_sql(col: str) -> str:
    return f"list_filter(string_split_regex(lower({col}), '\\s+'), x -> x <> '')"


# BPE-ish pre-tokenization regex (GPT-2 style simplified so the same
# pattern runs identically under Java regex and DuckDB's RE2 — RE2 has no
# lookahead, so the trailing-space rules are dropped): a word with an
# optional apostrophe suffix, a digit run, or one non-space symbol.
BPE_TOKEN_RE = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^A-Za-z0-9\s]"


def token_count_ws(text_col: Column, tok: Column | None = None) -> Column:
    """Whitespace token count (size of the `tokens` array)."""
    return F.size(tok if tok is not None else tokens(text_col)).cast("long")


def token_count_ws_sql(col: str) -> str:
    return f"CAST(len({tokens_sql(col)}) AS BIGINT)"


def token_count_bpe(text_col: Column) -> Column:
    """BPE-ish token count: number of `BPE_TOKEN_RE` matches. A cheap,
    deterministic proxy for LLM token accounting (true BPE merges need a
    vocab; the regex pre-tokenizer is the scale-relevant part — one
    codegen'd regex pass per row, no Python)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def token_count_bpe_sql(col: str) -> str:
    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"CAST(len(regexp_extract_all({col}, '{pat}')) AS BIGINT)"


def shingles(tok: Column, k: int = 3) -> Column:
    """k-word shingles of a token array (empty when fewer than k tokens).

    Construction: k shifted ``slice``s of the token array combined with
    ``zip_with`` concatenation — NOT ``transform(sequence, i ->
    element_at(tok, i+j))``. The lambda-free-variable form matters for
    performance: higher-order-function lambdas re-evaluate any captured
    outer EXPRESSION once per element (there is no common-subexpression
    elimination inside interpreted lambdas), so an inline ``tok`` like
    ``tokens(text)`` would re-tokenize the document O(n_tokens * k) times
    per row (~10x wall-clock on the bench corpus). Here every lambda
    touches only its own lambda variables; ``tok`` is referenced k+2
    times at projection top level, each a single per-row evaluation.

    Guarded with ``when`` because a negative ``slice`` length errors,
    unlike DuckDB's empty ``generate_series``.
    """
    n = F.size(tok)
    m = n - (k - 1)  # number of shingles
    make = F.slice(tok, 1, m)
    for j in range(1, k):
        make = F.zip_with(
            make,
            F.slice(tok, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))


def shingles_sql(tok: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return (
        f"(SELECT CASE WHEN len(t) >= {k} THEN "
        f"list_transform(generate_series(1, len(t) - {k - 1}), i -> {parts}) "
        f"ELSE [] END FROM (SELECT {tok} AS t))"
    )


# ---------------------------------------------------------------------------
# Portable hashing
# ---------------------------------------------------------------------------


def token_hash16(col: Column) -> Column:
    """16-bit integer hash: first 4 hex chars of md5 (portable to DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")


def token_hash16_sql(col: str) -> str:
    return f"CAST('0x' || substr(md5({col}), 1, 4) AS BIGINT)"


def token_hash16_at(col: Column, part: int) -> Column:
    """16-bit hash from md5 hex chars [4*part+1, 4*part+4] — four
    independent 16-bit hashes (part 0..3) from ONE md5, used as the
    per-band bit sources of the 64-bit SimHash."""
    return F.conv(F.substring(F.md5(col), 4 * part + 1, 4), 16, 10).cast("long")


def token_hash16_at_sql(col: str, part: int) -> str:
    return f"CAST('0x' || substr(md5({col}), {4 * part + 1}, 4) AS BIGINT)"


def token_hash32(col: Column) -> Column:
    """32-bit variant (first 8 hex chars) for lower collision rates."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def token_hash32_sql(col: str) -> str:
    return f"CAST('0x' || substr(md5({col}), 1, 8) AS BIGINT)"


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
_PUNCT_RE = r"[.,!?;:]"


def quality_columns(text_col: Column, tok: Column | None = None) -> dict[str, Column]:
    """Exact-integer quality components + single-division ratios.

    Pass a pre-materialized token COLUMN as ``tok`` when calling from a
    plan that can ``withColumn`` it first: higher-order functions are
    interpreted without common-subexpression elimination, so an inline
    ``tokens(text)`` expression would re-tokenize once per lambda
    reference.
    """
    if tok is None:
        tok = tokens(text_col)
    n_tokens = F.size(tok)
    n_chars = F.length(text_col)
    punct = n_chars - F.length(F.regexp_replace(text_col, _PUNCT_RE, ""))
    stop_hits = F.size(F.filter(tok, lambda x: x.isin(*STOPWORDS)))
    uniq = F.size(F.array_distinct(tok))
    # ratios are NULL for token-less documents (empty/whitespace-only
    # text): Spark ANSI mode errors on x/0 where DuckDB yields NULL, so
    # the explicit guard is what keeps the engines identical — and NULL
    # is the honest value (a ratio over nothing), which quality gates
    # treat as fail-closed
    def _ratio(num):
        return F.when(n_tokens > 0, num.cast("double") / n_tokens)

    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "n_uniq_tokens": uniq.cast("long"),
        "punct_count": punct.cast("long"),
        "stopword_count": stop_hits.cast("long"),
        # each ratio: one division of two exact ints -> bit-identical
        # across engines
        "stopword_ratio": _ratio(stop_hits),
        "uniq_ratio": _ratio(uniq),
        "avg_token_len": _ratio(n_chars - n_tokens + 1),
    }


def quality_sql(text_col: str) -> dict[str, str]:
    tok = tokens_sql(text_col)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return {
        "n_chars": f"CAST(length({text_col}) AS BIGINT)",
        "n_tokens": f"CAST(len({tok}) AS BIGINT)",
        "n_uniq_tokens": f"CAST(len(list_distinct({tok})) AS BIGINT)",
        "punct_count": (
            f"CAST(length({text_col}) - length(regexp_replace({text_col}, '{_PUNCT_RE}', '', 'g')) AS BIGINT)"
        ),
        "stopword_count": f"CAST(len(list_filter({tok}, x -> x IN ({stop_list}))) AS BIGINT)",
        "stopword_ratio": f"CAST(len(list_filter({tok}, x -> x IN ({stop_list}))) AS DOUBLE) / len({tok})",
        "uniq_ratio": f"CAST(len(list_distinct({tok})) AS DOUBLE) / len({tok})",
        "avg_token_len": f"CAST(length({text_col}) - len({tok}) + 1 AS DOUBLE) / len({tok})",
    }


# ---------------------------------------------------------------------------
# Language ID (stopword n-gram heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "is", "that"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "y", "es", "los"),
}


def langid_columns(text_col: Column, tok: Column | None = None) -> dict[str, Column]:
    """Marker-hit counts per language + argmax (ties/zero -> 'und')."""
    if tok is None:
        tok = tokens(text_col)

    def _hit_counter(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    hits = {
        lang: F.size(F.filter(tok, _hit_counter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[hits[lang] for lang in langs])
    # first language (in declaration order) achieving the max, if any hit
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    out = {f"hits_{lang}": hits[lang].cast("long") for lang in langs}
    out["lang_pred"] = pred
    return out


def langid_sql(text_col: str) -> dict[str, str]:
    tok = tokens_sql(text_col)
    hits = {
        lang: f"len(list_filter({tok}, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join(hits[lang] for lang in langs)})"
    whens = " ".join(f"WHEN {hits[lang]} = {best} THEN '{lang}'" for lang in langs)
    out = {f"hits_{lang}": f"CAST({hits[lang]} AS BIGINT)" for lang in langs}
    out["lang_pred"] = f"CASE WHEN {best} = 0 THEN 'und' ELSE (CASE {whens} ELSE 'und' END) END"
    return out


# ---------------------------------------------------------------------------
# Character entropy (compression-proxy quality signal)
# ---------------------------------------------------------------------------


def char_array(text_col: Column) -> Column:
    """Lowercased per-character array — MATERIALIZE this via withColumn
    before passing to :func:`char_entropy` (interpreted HOF lambdas have
    no CSE: an inline split would re-split the text once per referenced
    element; see the quality_columns note)."""
    return F.split(F.lower(text_col), "")


def char_entropy(chars: Column, decimals: int = 6) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    cheap compression-ratio proxy (low entropy = repetitive/boilerplate,
    high = diverse text). ``chars`` must be a pre-materialized
    :func:`char_array` COLUMN.

    Determinism: float sums are accumulation-order dependent, so the
    entropy terms are folded IN CHARACTER ORDER over the sorted distinct
    chars — one fixed left-to-right fold per row that the DuckDB oracle
    replays identically (list_reduce), then one rounding. No shuffle, no
    explode: counting happens inside per-row higher-order functions.
    """
    n = F.size(chars).cast("double")
    distinct_sorted = F.array_sort(F.array_distinct(chars))
    counts = F.transform(
        distinct_sorted,
        lambda c: F.size(F.filter(chars, lambda x: x == c)).cast("double"),
    )
    terms = F.transform(counts, lambda cnt: (cnt / n) * F.log2(cnt / n))
    ent = -F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    # + 0.0 normalizes IEEE negative zero: a single-distinct-char doc
    # folds to -(0.0) and engines disagree on the sign of that zero
    # (Spark renders 0.0, DuckDB -0.0 — caught by the r10 edge sweep
    # once the harness stopped collapsing int-like floats)
    return F.when(
        n > 0, F.round(ent, decimals) + F.lit(0.0)
    ).otherwise(F.lit(0.0))


def char_array_sql(col: str) -> str:
    return f"string_split(lower({col}), '')"


def char_entropy_sql(chars: str, decimals: int = 6) -> str:
    """DuckDB twin over a (CTE-materialized) char-array expression:
    same sorted distinct chars, same in-order fold."""
    n = f"CAST(len({chars}) AS DOUBLE)"
    distinct_sorted = f"list_sort(list_distinct({chars}))"
    counts = (
        f"list_transform({distinct_sorted}, "
        f"c -> CAST(len(list_filter({chars}, x -> x = c)) AS DOUBLE))"
    )
    terms = f"list_transform({counts}, cnt -> (cnt / {n}) * log2(cnt / {n}))"
    ent = f"-list_reduce(list_prepend(0.0, {terms}), (acc, x) -> acc + x)"
    # + 0.0: IEEE negative-zero normalization (see char_entropy)
    return (
        f"CASE WHEN len({chars}) > 0 "
        f"THEN ROUND({ent}, {decimals}) + CAST(0 AS DOUBLE) ELSE 0.0 END"
    )


# ---------------------------------------------------------------------------
# Redaction (safety filtering)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 (DuckDB) treat
# identically: no lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_DIGITS_RE = r"[0-9]{7,}"  # phone-ish / account-ish digit runs


def redact_columns(text_col: Column) -> dict[str, Column]:
    """PII-ish scrub: count then mask emails and long digit runs.

    Counts are exact integers from the PRE-redaction text; the redacted
    text replaces matches with fixed tags (stable across engines). One
    codegen'd regex pass per pattern, no Python."""
    n_emails = F.size(F.regexp_extract_all(text_col, F.lit(EMAIL_RE), F.lit(0)))
    n_digit_runs = F.size(
        F.regexp_extract_all(text_col, F.lit(LONG_DIGITS_RE), F.lit(0))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(text_col, EMAIL_RE, "<EMAIL>"),
        LONG_DIGITS_RE,
        "<NUM>",
    )
    return {
        "n_emails": n_emails.cast("long"),
        "n_digit_runs": n_digit_runs.cast("long"),
        "redacted_len": F.length(redacted).cast("long"),
        "redacted_fp": F.md5(redacted),
    }


def redact_sql(col: str) -> dict[str, str]:
    email = EMAIL_RE.replace("'", "''")
    digits = LONG_DIGITS_RE
    red = (
        f"regexp_replace(regexp_replace({col}, '{email}', '<EMAIL>', 'g'), "
        f"'{digits}', '<NUM>', 'g')"
    )
    return {
        "n_emails": f"CAST(len(regexp_extract_all({col}, '{email}')) AS BIGINT)",
        "n_digit_runs": f"CAST(len(regexp_extract_all({col}, '{digits}')) AS BIGINT)",
        "redacted_len": f"CAST(length({red}) AS BIGINT)",
        "redacted_fp": f"md5({red})",
    }


# ---------------------------------------------------------------------------
# Fingerprints
# ---------------------------------------------------------------------------

ROLL_MOD = 1_000_000_007
ROLL_WEIGHTS = (1, 31, 961, 29791)  # 31^(pos % 4)


def normalized_text(col: Column) -> Column:
    """lower + collapse whitespace runs + trim (the canonical form)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def normalized_text_sql(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def canonicalize_url(col: Column) -> Column:
    """Canonical URL form for crawl-frontier / document-identity dedup —
    the normalization step every web-scale corpus applies before URL-level
    dedup (variant pages fetched once, duplicate fetches collapsed):

    - scheme and host lowercase; a leading ``www.`` stripped
    - the scheme's default port (``:80``/``:443``) stripped, any other
      port kept
    - the fragment dropped (never sent to the server)
    - trailing slash runs stripped from the path (root stays ``/``)
    - tracking params (``utm_*``) dropped, the rest sorted byte-wise so
      param order never splits an identity group

    Entirely Catalyst built-ins (``parse_url`` + string/array kernels),
    so it runs inside whole-stage codegen at scan speed — no Python in
    the loop, and the subsequent dedup is ONE groupBy shuffle on the
    canonical string. IPv6 bracket authorities and userinfo are out of
    scope and FAIL CLOSED: an authority containing ``@`` or ``[`` would
    make the naive ``substring_index(auth, ':', -1)`` port split produce
    garbage like ``pass@host`` or ``1]`` and silently merge unrelated
    URLs into one identity, so those yield NULL — the same contract as
    malformed URLs (try_parse_url; plain parse_url THROWS under ANSI
    mode): out-of-scope input never fabricates an identity.
    """
    proto = F.lower(F.try_parse_url(col, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(col, F.lit("HOST"))), r"^www\.", ""
    )
    auth = F.try_parse_url(col, F.lit("AUTHORITY"))
    port = F.when(
        auth.contains(":"), F.substring_index(auth, ":", -1)
    ).otherwise(F.lit(""))
    is_default = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    portpart = F.when(
        (port != "") & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(col, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.coalesce(F.try_parse_url(col, F.lit("QUERY")), F.lit(""))
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda p: (p != "") & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    out_of_scope = auth.isNotNull() & (
        auth.contains("@") | auth.contains("[")
    )
    return F.when(out_of_scope, F.lit(None).cast("string")).otherwise(
        F.concat(
            proto,
            F.lit("://"),
            host,
            portpart,
            path,
            F.when(params != "", F.concat(F.lit("?"), params)).otherwise(
                F.lit("")
            ),
        )
    )


def md5_fingerprint(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text."""
    return F.md5(normalized_text(col))


def md5_fingerprint_sql(col: str) -> str:
    return f"md5({normalized_text_sql(col)})"


def rolling_fingerprint(text_col: Column, tok: Column | None = None) -> Column:
    """Position-weighted token-hash fingerprint (rolling-hash flavor).

    fp = SUM_i( hash16(token_i) * 31^(i % 4) ) mod 1e9+7 — order-sensitive
    (via the position weight) yet expressible as a commutative integer
    SUM, so it is exact and parallelizable: each partition sums its rows,
    no sequential fold needed at 100 TB.

    Pass a materialized token column as ``tok`` (see quality_columns note:
    an inline expression re-tokenizes once per element_at reference).
    """
    if tok is None:
        tok = tokens(text_col)
    idx = F.sequence(F.lit(1), F.size(tok))
    w = ROLL_WEIGHTS
    terms = F.transform(
        idx,
        lambda i: token_hash16(F.element_at(tok, i.cast("int")))
        * F.element_at(F.array(*[F.lit(x) for x in w]), ((i - 1) % 4 + 1).cast("int")),
    )
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(F.size(tok) > 0, total % ROLL_MOD).otherwise(F.lit(0)).cast("long")


def rolling_fingerprint_sql(text_col: str) -> str:
    tok = tokens_sql(text_col)
    h = token_hash16_sql("t[i]")
    weights = f"[{', '.join(map(str, ROLL_WEIGHTS))}]"
    return (
        "(SELECT CASE WHEN len(t) = 0 THEN 0 ELSE CAST("
        f"list_sum(list_transform(generate_series(1, len(t)), i -> {h} * ({weights})[(i-1) % 4 + 1]))"
        f" % {ROLL_MOD} AS BIGINT) END FROM (SELECT {tok} AS t))"
    )
