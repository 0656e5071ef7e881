"""Multi-format ingest: the lossless JSONL / CSV round-trip contract.

The catalog queries (`ingest_jsonl_roundtrip`, `ingest_csv_roundtrip`)
hash-check the aggregate against DuckDB; these tests pin the row-level
dialect semantics on adversarial values the test tables may not carry —
NULL vs empty string, quotes+commas, embedded newlines, leading/trailing
whitespace, a literal backslash-N, and astral unicode.
"""

from __future__ import annotations

import os

from spark_streaming_kafka_bucket_counter_spark.sources.files import (
    _CSV_LOSSLESS,
    export_documents_files,
    read_documents_files,
)

ROWS = [
    (1, "plain"),
    (2, ""),
    (3, None),
    (4, 'with "quote" and, comma'),
    (5, "line1\nline2\nline3"),
    (6, "trailing space "),
    (7, " leading space"),
    (8, "\\N suffix"),  # contains the sentinel but is not equal to it
    (9, "unicode £ü中 and astral 🎉"),
    (10, ","),
]


def _roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    p = os.path.join(str(tmp_path), fmt)
    if fmt == "jsonl":
        df.write.json(p)
    else:
        w = df.write
        for k, v in _CSV_LOSSLESS.items():
            w = w.option(k, v)
        w.csv(p)
    back = read_documents_files(spark, p, fmt)
    return sorted((r.doc_id, r.text) for r in back.select("doc_id", "text").collect())


def test_jsonl_roundtrip_is_lossless(spark, tmp_path):
    assert _roundtrip(spark, tmp_path, "jsonl") == sorted(ROWS)


def test_csv_roundtrip_is_lossless(spark, tmp_path):
    """Every hazard the default CSV dialect LOSES survives the pinned
    one: '' vs NULL stay distinct, whitespace is not trimmed, embedded
    newlines parse under multiLine, literal backslash-N is not a null."""
    assert _roundtrip(spark, tmp_path, "csv") == sorted(ROWS)


def test_csv_default_dialect_would_lose_data(spark, tmp_path):
    """Negative control: the DEFAULT dialect really does conflate '' with
    NULL and trim trailing whitespace — the reason _CSV_LOSSLESS exists.
    If Spark ever changes these defaults this test flags the dead
    workaround."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    p = os.path.join(str(tmp_path), "default_csv")
    df.write.option("header", True).csv(p)
    back = (
        spark.read.schema("doc_id long, text string")
        .option("header", True)
        .option("multiLine", True)
        .csv(p)
    )
    got = dict((r.doc_id, r.text) for r in back.collect())
    assert got[2] is None  # '' became NULL
    assert got[6] == "trailing space"  # trimmed


def test_csv_sentinel_collision_is_null_and_export_fails_fast(spark, tmp_path):
    """The inherent '\\N' convention limitation, pinned: a value EXACTLY
    equal to the sentinel reads back as NULL (writer emits data and NULL
    identically — quoteAll quotes the null representation too, so no
    option set fixes it). The exporter therefore refuses to write a
    corpus containing a colliding value instead of silently nullifying."""
    import pytest

    df = spark.createDataFrame([(1, "\\N"), (2, None)], "doc_id long, text string")
    p = os.path.join(str(tmp_path), "collide")
    w = df.write
    for k, v in _CSV_LOSSLESS.items():
        w = w.option(k, v)
    w.csv(p)
    back = read_documents_files(spark, p, "csv")
    assert [r.text for r in back.collect()] == [None, None]

    # fail-fast at export: a documents table whose text IS the sentinel
    sf = os.path.join(str(tmp_path), "sf_collide")
    os.makedirs(sf)
    spark.createDataFrame(
        [(1, "\\N", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    with pytest.raises(ValueError, match="null sentinel"):
        export_documents_files(spark, sf, "csv")
    # the jsonl path has no sentinel and exports the same corpus fine
    out = export_documents_files(spark, sf, "jsonl")
    assert [r.text for r in read_documents_files(spark, out, "jsonl").collect()] == [
        "\\N"
    ]


def test_export_cache_hits_and_rereads(spark):
    """export_documents_files is build-once per (sf_dir, fingerprint):
    the second call returns the same directory without rebuilding, and
    the rendition reads back with the full documents schema."""
    sf = "/root/testdata/sf0.001"
    p1 = export_documents_files(spark, sf, "jsonl")
    p2 = export_documents_files(spark, sf, "jsonl")
    assert p1 == p2
    back = read_documents_files(spark, p1, "jsonl")
    assert back.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert back.count() > 0


def test_avro_ocf_roundtrip_codec_and_corruption():
    """The OCF layer: deflate and null blocks round-trip exactly
    (unicode, NULLs, empties), output is deterministic, and corrupt
    containers raise (ingest fails loudly — unlike crawl-payload
    decoders, which fail closed per row)."""
    import json

    import pytest

    from spark_streaming_kafka_bucket_counter_spark.functions.avro_lite import (
        decode_ocf,
        encode_ocf,
    )

    schema = json.dumps(
        {
            "type": "record",
            "name": "doc",
            "fields": [
                {"name": "doc_id", "type": "long"},
                {"name": "text", "type": ["null", "string"]},
            ],
        }
    )
    recs = [
        {"doc_id": i, "text": None if i % 7 == 0 else f"t{i} 🎉\n\\N,\"q\""}
        for i in range(2500)  # > block_records: multiple sync-marked blocks
    ]
    for codec in ("null", "deflate"):
        blob = encode_ocf(schema, recs, codec=codec)
        s2, r2 = decode_ocf(blob)
        assert r2 == recs and json.loads(s2) == json.loads(schema)
    assert encode_ocf(schema, recs) == encode_ocf(schema, recs)
    assert decode_ocf(encode_ocf(schema, []))[1] == []

    blob = bytearray(encode_ocf(schema, recs))
    with pytest.raises(ValueError, match="not an Avro"):
        decode_ocf(b"PK\x03\x04" + bytes(blob[4:]))
    blob[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError):
        decode_ocf(bytes(blob))


def test_avro_export_read_spark_path(spark, tmp_path):
    """End-to-end through Spark: executor-written OCF part files read
    back via binaryFile + the container decoder with full fidelity,
    including NULLs in every nullable column."""
    import os as _os

    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        export_documents_files,
    )

    sf = _os.path.join(str(tmp_path), "sf")
    _os.makedirs(sf)
    rows = [
        (1, "hello 🎉", "en", "web", 7),
        (2, None, None, None, None),
        (3, "", "fr", "\\N", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(_os.path.join(sf, "documents.parquet"))
    out = export_documents_files(spark, sf, "avro")
    back = read_documents_files(spark, out, "avro")
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_warc_codec_roundtrip_and_tolerance():
    """WARC response records round-trip both layouts (plain and
    Common-Crawl member-gzip); bodies are sliced by BYTE Content-Length
    then decoded (astral unicode safe); truncation yields a prefix plus
    a malformed count — never an exception."""
    from spark_streaming_kafka_bucket_counter_spark.sources.warc import (
        build_warc_response,
        encode_warc,
        parse_warc,
    )

    bodies = ["", "plain", 'nl\nand "q", comma', "astral 🎉 £ü中", "\\N"]
    recs = [
        build_warc_response(f"urn:ssbc:{i}", f"http://c/{i}", b.encode())
        for i, b in enumerate(bodies)
    ]
    for gz in (True, False):
        out, bad = parse_warc(encode_warc(recs, member_gzip=gz))
        assert bad == 0 and [r["body"] for r in out] == bodies
        assert all(r["status"] == 200 for r in out)
    assert encode_warc(recs) == encode_warc(recs)  # deterministic (mtime=0)
    out, bad = parse_warc(encode_warc(recs, member_gzip=False)[:60])
    assert bad == 1 and out == []
    # garbage is counted, not raised
    assert parse_warc(b"\x1f\x8b not actually gzip")[1] == 1
    assert parse_warc(b"HTTP nonsense")[0] == []


def test_warc_mixed_record_types_and_chunked_bodies():
    """Round-7 fidelity: request / metadata / revisit records parse into
    uniform rows (method, warc-fields body, refers_to + status) instead
    of type-only stubs, and chunked transfer-encoded response bodies are
    de-chunked — with bad chunk framing counted malformed, never
    returned as framing-polluted text."""
    from spark_streaming_kafka_bucket_counter_spark.sources.warc import (
        _dechunk,
        build_warc_metadata,
        build_warc_request,
        build_warc_response,
        build_warc_revisit,
        encode_warc,
        parse_warc,
    )

    body = "chunked body with a long tail " * 4
    recs = [
        build_warc_request("urn:r:1", "http://c/1", method="GET"),
        build_warc_response("urn:ssbc:1", "http://c/1", body.encode(), chunked=True),
        build_warc_revisit("urn:rev:1", "http://c/1", "urn:ssbc:1"),
        build_warc_metadata("urn:m:1", "http://c/1", {"fetchDurationMs": "42"}),
        build_warc_response("urn:ssbc:2", "http://c/2", b"plain"),
    ]
    for gz in (True, False):
        out, bad = parse_warc(encode_warc(recs, member_gzip=gz))
        assert bad == 0 and len(out) == 5
        req, resp1, rev, meta, resp2 = out
        assert req["type"] == "request" and req["method"] == "GET"
        assert req["status"] is None and req["refers_to"] is None
        assert resp1["body"] == body  # framing stripped
        assert resp1["status"] == 200
        assert rev["type"] == "revisit" and rev["status"] == 304
        assert rev["refers_to"] == "urn:ssbc:1" and rev["body"] is None
        assert meta["body"] == "fetchDurationMs: 42\r\n"
        assert resp2["body"] == "plain"
    # de-chunker edges: empty body, exact boundary, bad framing
    assert _dechunk(b"0\r\n\r\n") == b""
    assert _dechunk(b"3\r\nabc\r\n0\r\n\r\n") == b"abc"
    assert _dechunk(b"3;ext=1\r\nabc\r\n0\r\n\r\n") == b"abc"  # extensions
    assert _dechunk(b"zz\r\nabc\r\n0\r\n\r\n") is None  # bad hex
    assert _dechunk(b"5\r\nabc\r\n0\r\n\r\n") is None  # short chunk
    assert _dechunk(b"3\r\nabcXX0\r\n\r\n") is None  # missing CRLF
    # a response with corrupt chunk framing is malformed, not text
    bad_resp = build_warc_response("urn:x", "http://c/x", b"zzz", chunked=True)
    bad_resp = bad_resp.replace(b"3\r\nzzz", b"9\r\nzzz", 1)
    out, bad = parse_warc(bad_resp)
    assert bad == 1 and out == []


def test_charset_detection_ladder():
    """functions/charset.py: BOM beats declaration beats content
    sniffing; a lying declaration falls through instead of mojibaking;
    cp1252 terminates the ladder on any byte string."""
    import codecs

    from spark_streaming_kafka_bucket_counter_spark.functions.charset import (
        charset_from_content_type,
        detect_and_decode,
    )

    t = "héllo wörld — ünïcode"
    # BOMs are definitive, regardless of declaration
    assert detect_and_decode(codecs.BOM_UTF8 + t.encode("utf-8")) == (t, "utf-8")
    assert detect_and_decode(
        codecs.BOM_UTF16_LE + t.encode("utf-16-le"), "utf-8"
    ) == (t, "utf-16")
    assert detect_and_decode(
        codecs.BOM_UTF16_BE + t.encode("utf-16-be")
    ) == (t, "utf-16")
    # declared charset wins when the bytes really decode under it
    assert detect_and_decode(t.encode("cp1252"), "windows-1252") == (t, "cp1252")
    assert detect_and_decode(t.encode("cp1252"), "ISO-8859-1")[1] == "cp1252"
    # lying declaration: bytes are valid UTF-8 multibyte, declared
    # cp1252 decodes them too (cp1252 rarely fails) — but a declared
    # utf-8 over cp1252 bytes MUST fall through, not mojibake
    legacy = t.encode("cp1252")
    text, label = detect_and_decode(legacy, "utf-8")
    assert (text, label) == (t, "cp1252")
    # strict UTF-8 self-validation without any declaration
    assert detect_and_decode(t.encode("utf-8")) == (t, "utf-8")
    # undeclared legacy bytes land on the web default
    assert detect_and_decode(legacy) == (t, "cp1252")
    # empty and ASCII
    assert detect_and_decode(b"") == ("", "utf-8")
    assert detect_and_decode(b"plain ascii", "us-ascii") == ("plain ascii", "utf-8")
    # every byte string terminates (cp1252's 5 unmapped bytes included)
    text, label = detect_and_decode(bytes(range(256)))
    assert label == "cp1252" and len(text) == 256
    # Content-Type parsing
    assert charset_from_content_type("text/html; charset=UTF-8") == "UTF-8"
    assert charset_from_content_type('text/html; charset="utf-8"') == '"utf-8"'
    assert charset_from_content_type("text/plain") is None
    assert charset_from_content_type(None) is None


def test_warc_charset_families_roundtrip():
    """WARC responses in UTF-16 (BOM, undeclared) and declared cp1252
    transcode back to the exact original text with the charset
    surfaced — including a CHUNKED UTF-16 body (dechunk before
    decode)."""
    import codecs

    from spark_streaming_kafka_bucket_counter_spark.sources.warc import (
        build_warc_response,
        encode_warc,
        parse_warc,
    )

    t16 = "utf-sixteen — émojis 🎉 and\nnewlines"
    t1252 = "ascii only body"
    recs = [
        build_warc_response(
            "urn:a", "http://c/a",
            codecs.BOM_UTF16_LE + t16.encode("utf-16-le"),
            content_type="text/plain",
        ),
        build_warc_response(
            "urn:b", "http://c/b", t1252.encode("cp1252"),
            content_type="text/plain; charset=windows-1252",
        ),
        build_warc_response(
            "urn:c", "http://c/c",
            codecs.BOM_UTF16_LE + t16.encode("utf-16-le"),
            content_type="text/plain", chunked=True,
        ),
    ]
    out, bad = parse_warc(encode_warc(recs))
    assert bad == 0
    assert (out[0]["body"], out[0]["charset"]) == (t16, "utf-16")
    assert (out[1]["body"], out[1]["charset"]) == (t1252, "cp1252")
    assert (out[2]["body"], out[2]["charset"]) == (t16, "utf-16")


def test_warc_census_split_path_equals_whole_file(spark, tmp_path):
    """read_warc_records surfaces every record type through BOTH read
    paths (whole-file and splittable byte-range) identically."""
    import os as _os

    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        read_warc_records,
    )

    sf = _os.path.join(str(tmp_path), "sf")
    _os.makedirs(sf)
    rows = [(i, f"text {i} " * (i % 7), "en", "src", i) for i in range(60)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(_os.path.join(sf, "documents.parquet"))
    out = export_documents_files(spark, sf, "warc")
    whole = sorted(map(tuple, read_warc_records(spark, out).collect()))
    split = sorted(map(tuple, read_warc_records(spark, out, split_bytes=512).collect()))
    assert whole == split
    types = {}
    for r in whole:
        types[r[0]] = types.get(r[0], 0) + 1
    assert types["response"] == 60
    assert types["request"] == len([i for i in range(60) if i % 3 == 0])
    assert types["revisit"] == len([i for i in range(60) if i % 5 == 0])
    assert types["metadata"] == len([i for i in range(60) if i % 7 == 0])
    assert all(r[-1] == 0 for r in whole)  # zero malformed


def test_warc_spark_roundtrip_with_nulls_and_weird_sources(spark, tmp_path):
    """End-to-end Spark WARC export/read: NULL text becomes an empty
    fetch body (the pinned COALESCE contract), NULL source survives as
    NULL, and a source containing '/' and spaces round-trips through the
    percent-encoded target URI."""
    import os as _os

    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        read_documents_warc,
    )

    sf = _os.path.join(str(tmp_path), "sf")
    _os.makedirs(sf)
    # doc_ids 6/9/15: %9 in {0, 6} keeps all three on the plain UTF-8
    # path (ids %9 in {1,2,3,4,5,7,8} belong to the charset-fixture
    # families, which append phrases / re-encode bodies by design)
    rows = [
        (6, "hello 🎉", "en", "plain", 7),
        (9, None, None, None, None),
        (15, "a\nb", "fr", "weird/src with space", 3),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(_os.path.join(sf, "documents.parquet"))
    out = export_documents_files(spark, sf, "warc")
    back = read_documents_warc(spark, out)
    got = sorted(
        (r.doc_id, r.text, r.source, r.n_malformed) for r in back.collect()
    )
    assert got == [
        (6, "hello 🎉", "plain", 0),
        (9, "", None, 0),  # NULL text -> empty fetch body, by contract
        (15, "a\nb", "weird/src with space", 0),
    ]


def test_parquet_ext_all_codecs_read_in_one_scan(spark, tmp_path):
    """Every codec the external writer rotates through (zstd, gzip,
    snappy, lz4/LZ4_RAW) lands in ONE directory — deterministically,
    one file per codec, rather than trusting the rotation to cover all
    four on tiny data — and Spark's native reader takes the mixed tree
    losslessly in a single scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = os.path.join(str(tmp_path), "pq_ext")
    os.makedirs(p)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    expected = []
    for k, codec in enumerate(("zstd", "gzip", "snappy", "lz4")):
        doc_id, text = ROWS[2 * k][0], ROWS[2 * k][1]
        expected.append((doc_id, text))
        t = pa.table(
            {
                "doc_id": pa.array([doc_id], pa.int64()),
                "text": pa.array([text], pa.string()),
                "lang": pa.array([codec], pa.string()),
                "source": pa.array(["ext"], pa.string()),
                "n_chars": pa.array(
                    [len(text) if text is not None else None], pa.int64()
                ),
            },
            schema=schema,
        )
        pq.write_table(t, os.path.join(p, f"part-{codec}.parquet"), compression=codec)
    back = read_documents_files(spark, p, "parquet_ext")
    got = sorted(
        (r.doc_id, r.text) for r in back.select("doc_id", "text").collect()
    )
    assert got == sorted(expected)


def test_parquet_ext_export_read_spark_path(spark, tmp_path):
    """The executor-side exporter itself: full documents fixture out
    through _write_documents_parquet_ext, back through the native
    reader, value-exact including NULL vs '' and unicode."""
    df = spark.createDataFrame(
        [(i, t, "xx", "src", len(t) if t is not None else None) for i, t in ROWS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        _write_documents_parquet_ext,
    )

    p = os.path.join(str(tmp_path), "pq_ext_full")
    _write_documents_parquet_ext(df.repartition(4), p)
    back = read_documents_files(spark, p, "parquet_ext")
    got = sorted((r.doc_id, r.text, r.n_chars) for r in back.collect())
    assert got == sorted(
        (i, t, len(t) if t is not None else None) for i, t in ROWS
    )


def test_jsonl_gz_roundtrip_is_lossless(spark, tmp_path):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    p = os.path.join(str(tmp_path), "gz")
    df.write.option("compression", "gzip").json(p)
    import glob

    assert glob.glob(os.path.join(p, "*.json.gz"))  # really compressed
    back = read_documents_files(spark, p, "jsonl_gz")
    got = sorted((r.doc_id, r.text) for r in back.select("doc_id", "text").collect())
    assert got == sorted(ROWS)


def test_html_extraction_contract_property():
    """For ANY text (hypothesis: unicode incl. markup-looking chars),
    synthesize -> extract recovers exactly 'Doc <id>' + the original
    lines; boilerplate (script/style/comment/nav) never leaks."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_streaming_kafka_bucket_counter_spark.operators.htmltext import (
        extract_main_text,
        synthesize_html,
    )

    @given(
        st.integers(min_value=0, max_value=10**9),
        st.one_of(st.none(), st.text(max_size=200)),
    )
    @settings(max_examples=200, deadline=None)
    def check(did, txt):
        got = extract_main_text(synthesize_html(did, txt))
        exp = f"Doc {did}" + (("\n" + txt) if txt else "")
        assert got == exp

    check()


def test_html_link_extraction_rules():
    """Outlink extraction: relative hrefs resolve against the base,
    anchor text merges nested inline tags, script-subtree links are
    dropped, href-less anchors skipped, dirty HTML never raises."""
    from spark_streaming_kafka_bucket_counter_spark.operators.htmltext import (
        extract_links,
        synthesize_html,
    )

    page = (
        "<html><body>"
        '<a href="/rel/path?q=1#f">go <b>deep</b> now</a>'
        '<a href="http://abs.example/x">abs</a>'
        "<a>no href</a>"
        '<script>var s = \'<a href="/fake">js</a>\';</script>'
        '<a href="../up">up</a>'
        "</body></html>"
    )
    got = extract_links(page, "http://host.example/dir/page")
    assert got == [
        ("http://host.example/rel/path?q=1#f", "go deep now"),
        ("http://abs.example/x", "abs"),
        ("http://host.example/up", "up"),
    ]
    # the synthesized page exposes exactly the two formula links
    links = extract_links(synthesize_html(7, "body"), "http://corpus.invalid/doc/7")
    assert links == [
        ("http://corpus.invalid/doc/22?utm_source=track&b=2#frag", "next 7"),
        # urljoin lowercases the scheme of absolute hrefs; the host case
        # and default port survive for the canonicalizer to normalize
        ("http://Other.EXAMPLE:80/doc/7/", "other"),
    ]
    # dirty input: no exception, list result
    assert isinstance(extract_links("<a href=" , "http://h/"), list)


def test_html_extractor_drops_boilerplate_and_survives_dirt():
    from spark_streaming_kafka_bucket_counter_spark.operators.htmltext import (
        extract_main_text,
    )

    page = (
        "<html><body><script>var x = '<p>js not text</p>';</script>"
        "<style>.c{}</style><div>menu</div><p>keep <b>this</b> &amp; that</p>"
        "<!-- <p>comment</p> --><li>item</li></body></html>"
    )
    assert extract_main_text(page) == "keep this & that\nitem"
    # unclosed content tag at EOF keeps its text; garbage never raises
    assert extract_main_text("<p>tail") == "tail"
    for bad in ("", "<<<>>", "<script>while(1){", "<p>&bogus;</p>"):
        extract_main_text(bad)


def test_warc_split_read_parity(spark, tmp_path):
    """The splittable byte-range WARC read returns EXACTLY the whole-file
    read's rows at every split size — including splits far smaller than
    a record (tasks that own no member yield nothing; resync never
    duplicates or drops the straddling member)."""
    import os as _os

    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        read_documents_warc,
    )

    sf = _os.path.join(str(tmp_path), "sf")
    _os.makedirs(sf)
    rows = [(i, f"text {i} " * (i % 40), "en", f"s{i % 4}", 8) for i in range(300)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(_os.path.join(sf, "documents.parquet"))
    out = export_documents_files(spark, sf, "warc")
    whole = sorted(
        (r.doc_id, r.text, r.source)
        for r in read_documents_warc(spark, out).collect()
    )
    assert len(whole) == 300
    for split in (512, 7_000, 10**9):
        got = sorted(
            (r.doc_id, r.text, r.source)
            for r in read_documents_warc(spark, out, split_bytes=split).collect()
        )
        assert got == whole, f"split={split}"


def test_charset_statistical_rungs():
    """Round 8 (r7 VERDICT ask #4): BOM-less UTF-16 by NUL parity,
    East-Asian multibyte by run structure + frequency anchors, and the
    wrong-declaration fixtures — a lying label must fall through to
    the statistical rungs, never mojibake."""
    from spark_streaming_kafka_bucket_counter_spark.functions.charset import (
        detect_and_decode,
    )

    zh = "的一是不了我们在用它这个句子很好，测试中文检测。"
    zt = "這是一個測試用的句子我們來看看結果，繁體中文檢測。"
    ja = "これはデータパイプラインのテスト用の日本語の文です。"
    ko = "이것은 데이터 파이프라인 테스트를 위한 한국어 문장입니다."
    west = "héllo wörld — ünïcode café naïve résumé Straße"
    ascii_doc = "a plain ascii crawl document body"

    # undeclared statistical detection, pure and ASCII-prefixed
    for text, codec, want in (
        (zh, "gb18030", "gb18030"),
        (zt, "cp950", "big5"),  # round 9: Traditional Chinese
        (ja, "cp932", "shift_jis"),
        (ko, "cp949", "euc-kr"),
        (ascii_doc + "\n" + zh, "gb18030", "gb18030"),
        (ascii_doc + "\n" + zt, "cp950", "big5"),
        (ascii_doc + "\n" + ja, "cp932", "shift_jis"),
        (ascii_doc + "\n" + ko, "cp949", "euc-kr"),
        (ascii_doc, "utf-16-le", "utf-16"),
        (ascii_doc, "utf-16-be", "utf-16"),
    ):
        assert detect_and_decode(text.encode(codec)) == (text, want), want

    # wrong declarations: the bytes win over the label
    for text, codec, lie, want in (
        (zh, "gb18030", "utf-8", "gb18030"),
        (ja, "cp932", "utf-8", "shift_jis"),
        (ko, "cp949", "latin-1", "euc-kr"),  # the classic mojibake page
        (zt, "cp950", "iso-8859-1", "big5"),  # Traditional-Chinese twin
        (zt, "cp950", "utf-8", "big5"),
        (ascii_doc, "utf-16-le", "utf-8", "utf-16"),
        (ascii_doc, "utf-16-le", "windows-1252", "utf-16"),
    ):
        assert detect_and_decode(text.encode(codec), lie) == (text, want), want

    # declared East-Asian labels (WHATWG alias families) trusted when
    # the bytes really decode
    for text, codec, decl, want in (
        (zh, "gb18030", "GBK", "gb18030"),
        (zh, "gb18030", "gb2312", "gb18030"),
        (ja, "cp932", "Shift_JIS", "shift_jis"),
        (ja, "cp932", "windows-31j", "shift_jis"),
        (ko, "cp949", "EUC-KR", "euc-kr"),
        (zt, "cp950", "Big5", "big5"),
        (zt, "cp950", "big5-hkscs", "big5"),
        (west, "utf-16-be", "utf-16be", "utf-16"),  # endianness honored
        (west, "utf-16-le", "utf-16le", "utf-16"),
    ):
        assert detect_and_decode(text.encode(codec), decl) == (text, want), decl

    # Western legacy text is NEVER claimed by the statistical rungs:
    # isolated accents fail the run-structure gate, honest cp1252
    # declarations stay trusted
    assert detect_and_decode(west.encode("cp1252")) == (west, "cp1252")
    assert detect_and_decode(west.encode("cp1252"), "latin-1") == (west, "cp1252")
    # short strings never trip the heuristics
    assert detect_and_decode(b"ab") == ("ab", "utf-8")
    assert detect_and_decode("é".encode("cp1252")) == ("é", "cp1252")


def test_warc_statistical_charset_families_roundtrip():
    """The r8 WARC fixture families transcode back exactly through the
    full parse path: BOM-less UTF-16LE, undeclared gb18030/cp932, and
    cp949 behind the lying latin-1 declaration — chunked framing
    included."""
    from spark_streaming_kafka_bucket_counter_spark.sources.files import (
        WARC_CJK_PHRASES,
    )
    from spark_streaming_kafka_bucket_counter_spark.sources.warc import (
        build_warc_response,
        encode_warc,
        parse_warc,
    )

    doc = "ascii document body line"
    zh = doc + "\n" + WARC_CJK_PHRASES["gb18030"]
    ja = doc + "\n" + WARC_CJK_PHRASES["shift_jis"]
    ko = doc + "\n" + WARC_CJK_PHRASES["euc-kr"]
    zt = doc + "\n" + WARC_CJK_PHRASES["big5"]
    recs = [
        build_warc_response(
            "urn:a", "http://c/a", doc.encode("utf-16-le"),
            content_type="text/plain",
        ),
        build_warc_response(
            "urn:b", "http://c/b", zh.encode("gb18030"),
            content_type="text/plain", chunked=True,
        ),
        build_warc_response(
            "urn:c", "http://c/c", ja.encode("cp932"),
            content_type="text/plain",
        ),
        build_warc_response(
            "urn:d", "http://c/d", ko.encode("cp949"),
            content_type="text/plain; charset=latin-1",
        ),
        build_warc_response(
            "urn:e", "http://c/e", zt.encode("cp950"),
            content_type="text/plain; charset=iso-8859-1", chunked=True,
        ),
    ]
    out, bad = parse_warc(encode_warc(recs))
    assert bad == 0
    got = {r["record_id"]: (r["body"], r["charset"]) for r in out}
    assert got["urn:a"] == (doc, "utf-16")
    assert got["urn:b"] == (zh, "gb18030")
    assert got["urn:c"] == (ja, "shift_jis")
    assert got["urn:d"] == (ko, "euc-kr")
    assert got["urn:e"] == (zt, "big5")
