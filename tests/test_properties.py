"""Property-based tests (hypothesis) for the pure-Python pieces: the
Avro wire codec, the upsert-SQL escaping, and the MinHash parameter
bounds — fast (no Spark) and exhaustive where example tests are not."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_kafka_bucket_counter_spark.functions import avro_lite as A
from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
    MINHASH_P,
    minhash_params,
)
from spark_streaming_kafka_bucket_counter_spark.streaming.sinks import upsert_sql

settings.register_profile("no_deadline", deadline=None)
settings.load_profile("no_deadline")

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@given(I64)
def test_zigzag_roundtrip_any_int64(n):
    out = bytearray()
    A._write_long(out, n)
    back, pos = A._read_long(bytes(out), 0)
    assert back == n and pos == len(out)


_FIELD_TYPES = st.sampled_from(
    ["long", "string", "boolean", "double", "bytes", ["long", "null"], ["string", "null"]]
)


def _value_for(typ):
    if isinstance(typ, list):
        base = [t for t in typ if t != "null"][0]
        return st.one_of(st.none(), _value_for(base))
    return {
        "long": I64,
        "string": st.text(max_size=40),
        "boolean": st.booleans(),
        # avoid NaN (NaN != NaN breaks equality) but keep inf
        "double": st.floats(allow_nan=False),
        "bytes": st.binary(max_size=40),
    }[typ]


@st.composite
def _schema_and_record(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    types = [draw(_FIELD_TYPES) for _ in range(n)]
    fields = [(f"f{i}", t) for i, t in enumerate(types)]
    record = {name: draw(_value_for(t)) for name, t in fields}
    return fields, record


@given(_schema_and_record())
@settings(max_examples=200, deadline=None)
def test_avro_record_roundtrip_property(sr):
    fields, record = sr
    blob = A.encode_record(fields, record)
    assert A.decode_record(fields, blob) == record


@given(_schema_and_record(), st.integers(min_value=0, max_value=5))
@settings(max_examples=50, deadline=None)
def test_avro_multi_record_framing_property(sr, count):
    fields, record = sr
    blob = b"".join(A.encode_record(fields, record) for _ in range(count))
    assert A.decode_records(fields, blob) == [record] * count


@given(st.text(max_size=60))
def test_upsert_sql_escapes_any_text(v):
    sql = upsert_sql("t", {"k": v})
    # the VALUES literal must contain no bare single quote: every quote in
    # the payload is doubled (models.py:359-363 interpolated raw)
    inner = sql.split("VALUES (", 1)[1].rsplit(")", 1)[0]
    assert inner.startswith("'") and inner.endswith("'")
    body = inner[1:-1]
    assert "'" not in body.replace("''", "")


@given(st.integers(min_value=1, max_value=512))
def test_minhash_params_never_overflow_int64(num_hashes):
    """A_j * max_h32 + B_j must stay under 2^63 for every generated
    parameter pair (the no-overflow invariant the affine family relies
    on for exact arithmetic in both engines)."""
    max_h32 = (1 << 32) - 1
    for a, b in minhash_params(num_hashes):
        assert 0 < a and 0 <= b
        assert a * max_h32 + b < (1 << 63)
        assert (a * max_h32 + b) % MINHASH_P >= 0


def test_avro_schema_json_shape_accepted():
    fields = A.parse_schema(
        json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "x", "type": "long"},
                    {"name": "y", "type": ["string", "null"]},
                ],
            }
        )
    )
    assert fields == [("x", "long"), ("y", ["string", "null"])]


# ---------------------------------------------------------------------------
# Insight-layer SQL twins vs brute-force Python references (DuckDB is
# fast enough to run per-example; Spark <-> oracle equality is already
# pinned by the catalog gate at two scale factors)
# ---------------------------------------------------------------------------

import duckdb
import pandas as pd

from spark_streaming_kafka_bucket_counter_spark.operators.events import (
    cohort_retention_sql,
    funnel_sql,
)
from spark_streaming_kafka_bucket_counter_spark.operators.temporal import (
    densify_buckets_sql,
    scd2_sql,
)

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),     # user
        st.integers(min_value=0, max_value=50),    # ts
        st.sampled_from(["A", "B", "C"]),          # type
    ),
    min_size=1,
    max_size=40,
)


def _duck(rows, cols, types):
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=cols).astype(types)
    con.register("_df", df)
    con.execute("CREATE TABLE ev AS SELECT * FROM _df")
    return con


@given(_EVENTS)
@settings(max_examples=60)
def test_funnel_sql_matches_bruteforce(rows):
    # unique (user, ts) pairs keep the reference simple (real funnels
    # tie-break equal timestamps arbitrarily; the operator treats equal
    # ts as NOT strictly after, mirrored here)
    seen, ev = set(), []
    for u, t, ty in rows:
        if (u, t) not in seen:
            seen.add((u, t))
            ev.append((u, t, ty))
    con = _duck(ev, ["user_id", "ts", "event_type"], {"user_id": "int64", "ts": "int64"})
    got = {
        r[1]: r[2]
        for r in con.execute(
            funnel_sql("ev", "user_id", "ts", "event_type", ["A", "B", "C"])
        ).fetchall()
    }
    # brute force: per user, earliest A, then earliest B strictly after,
    # then earliest C strictly after that
    reached = {"A": 0, "B": 0, "C": 0}
    users = {u for u, _, _ in ev}
    for u in users:
        mine = sorted((t, ty) for uu, t, ty in ev if uu == u)
        t_a = min((t for t, ty in mine if ty == "A"), default=None)
        if t_a is None:
            continue
        reached["A"] += 1
        t_b = min((t for t, ty in mine if ty == "B" and t > t_a), default=None)
        if t_b is None:
            continue
        reached["B"] += 1
        t_c = min((t for t, ty in mine if ty == "C" and t > t_b), default=None)
        if t_c is not None:
            reached["C"] += 1
    assert got == reached


@given(_EVENTS)
@settings(max_examples=60)
def test_cohort_sql_matches_bruteforce(rows):
    period = 10
    con = _duck(rows, ["user_id", "ts", "event_type"], {"user_id": "int64", "ts": "int64"})
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            cohort_retention_sql("ev", "user_id", "ts", period)
        ).fetchall()
    }
    first = {}
    for u, t, _ in rows:
        first[u] = min(first.get(u, t), t)
    expected: dict[tuple[int, int], set] = {}
    for u, t, _ in rows:
        cohort = first[u] // period
        key = (cohort * period, t // period - cohort)
        expected.setdefault(key, set()).add(u)
    assert got == {k: len(v) for k, v in expected.items()}


@given(_EVENTS)
@settings(max_examples=60)
def test_scd2_sql_adjacent_chain(rows):
    # unique (user, ts) so the version chain order is unambiguous
    seen, ev = set(), []
    for i, (u, t, ty) in enumerate(rows):
        if (u, t) not in seen:
            seen.add((u, t))
            ev.append((u, t, ty, i))
    con = _duck(
        ev,
        ["user_id", "ts", "attr", "rid"],
        {"user_id": "int64", "ts": "int64", "rid": "int64"},
    )
    out = con.execute(
        scd2_sql("ev", "user_id", "ts", ["attr"], tie_cols=["rid"])
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, attr, vf, vt, cur in out:
        by_user.setdefault(u, []).append((vf, vt, cur))
    for u, versions in by_user.items():
        versions.sort(key=lambda v: v[0])
        # chain adjacency + exactly one current version
        for (vf, vt, _), (vf2, _, _) in zip(versions, versions[1:]):
            assert vt == vf2
        assert [v[2] for v in versions].count(True) == 1
        assert versions[-1][1] is None
        # starts = the user's change timestamps
        assert [v[0] for v in versions] == sorted(t for uu, t, _, _ in ev if uu == u)


@given(_EVENTS)
@settings(max_examples=60)
def test_densify_sql_dense_and_consistent(rows):
    interval = 10
    con = _duck(rows, ["k", "ts", "event_type"], {"k": "int64", "ts": "int64"})
    out = con.execute(
        densify_buckets_sql("ev", "k", "ts", interval, "n")
    ).fetchall()
    lo = min(t for _, t, _ in rows) // interval * interval
    hi = max(t for _, t, _ in rows) // interval * interval
    keys = {k for k, _, _ in rows}
    buckets = list(range(lo, hi + 1, interval))
    # complete spine
    assert {(r[0], r[1]) for r in out} == {(k, b) for k in keys for b in buckets}
    # counts match the raw data everywhere (zeros included)
    for k, b, n in out:
        assert n == sum(1 for kk, t, _ in rows if kk == k and t // interval * interval == b)


# ---------------------------------------------------------------------------
# Media container header parsers: never raise on arbitrary bytes
# ---------------------------------------------------------------------------

from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (  # noqa: E402
    parse_audio_header,
    parse_image_header,
    parse_video_header,
)

_MAGIC_PREFIXES = [
    b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"GIF87a", b"BM",
    b"RIFF", b"RIFFxxxxWAVE", b"\x00\x00\x00\x18ftyp", b"\x00\x00\x00\x08moov",
]


@given(st.sampled_from(_MAGIC_PREFIXES), st.binary(max_size=300))
def test_media_header_parsers_never_raise(prefix, tail):
    """Curation pipelines feed these parsers arbitrary crawled payloads;
    a crash in the Arrow worker kills the whole task, so malformed bytes
    (including valid magic numbers followed by garbage) must parse to
    None or a well-typed tuple, never raise."""
    payload = prefix + tail
    for parser, width in (
        (parse_image_header, 4),
        (parse_audio_header, 4),
        (parse_video_header, 3),
    ):
        out = parser(payload)
        assert out is None or (
            isinstance(out, tuple)
            and len(out) == width
            and isinstance(out[0], str)
            and all(isinstance(x, int) and x >= 0 for x in out[1:])
        )


# ---------------------------------------------------------------------------
# PNG codec: encode -> decode identity, and mutation rejection
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 2, 3, 4]),
    st.randoms(use_true_random=False),
    st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, channels, rnd, filter_type):
    """encode_png -> decode_png_pixels is the identity for ANY size,
    color type, pixel content, and row-filter choice."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    pixels = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    png = encode_png(pixels, w, h, channels, filter_type=filter_type)
    assert decode_png_pixels(png) == (w, h, channels, pixels)


@given(st.randoms(use_true_random=False), st.integers(min_value=0, max_value=10**9))
@settings(max_examples=80, deadline=None)
def test_png_decoder_never_crashes_on_mutations(rnd, seed):
    """Arbitrary byte corruption of a valid PNG must yield either None
    or a well-formed (w, h, ch, pixels) tuple — never an exception
    (decoder robustness on untrusted 100 TB crawl payloads)."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    base = bytearray(
        encode_png(bytes(rnd.randrange(256) for _ in range(9 * 8 * 3)), 9, 8, 3)
    )
    for _ in range(rnd.randrange(1, 6)):
        base[rnd.randrange(len(base))] = rnd.randrange(256)
    cut = rnd.randrange(len(base) + 1)
    for payload in (bytes(base), bytes(base[:cut])):
        out = decode_png_pixels(payload)
        if out is not None:
            w, h, ch, px = out
            assert len(px) == w * h * ch


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=256),
    st.randoms(use_true_random=False),
    st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
)
@settings(max_examples=50, deadline=None)
def test_png_palette_roundtrip_property(w, h, n_entries, rnd, filter_type):
    """encode_png_palette -> decode_png_pixels maps every index through
    the PLTE table: decoded output is the palette-expanded RGB plane."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_palette,
    )

    palette = bytes(rnd.randrange(256) for _ in range(3 * n_entries))
    idx = bytes(rnd.randrange(n_entries) for _ in range(w * h))
    png = encode_png_palette(idx, palette, w, h, filter_type=filter_type)
    expected = b"".join(palette[3 * v : 3 * v + 3] for v in idx)
    assert decode_png_pixels(png) == (w, h, 3, expected)


@given(st.randoms(use_true_random=False))
@settings(max_examples=25, deadline=None)
def test_png_batch_decoder_equals_scalar(rnd):
    """decode_png_pixels_batch (numpy lockstep hot path) is byte-exact
    against the scalar reference decoder on a mixed corpus: every color
    type incl. palette, every filter mode, plus corrupted/truncated
    payloads (both must fail closed identically)."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        decode_png_pixels_batch,
        encode_png,
        encode_png_palette,
    )

    corpus = []
    for _ in range(rnd.randrange(3, 12)):
        ch = rnd.choice([1, 2, 3, 4])
        w, h = rnd.randrange(1, 16), rnd.randrange(1, 16)
        px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        corpus.append(
            encode_png(px, w, h, ch, filter_type=rnd.choice([0, 1, 2, 3, 4, "cycle"]))
        )
    for _ in range(rnd.randrange(1, 5)):
        w, h = rnd.randrange(1, 12), rnd.randrange(1, 12)
        n_entries = rnd.randrange(1, 257)
        palette = bytes(rnd.randrange(256) for _ in range(3 * n_entries))
        idx = bytes(rnd.randrange(n_entries) for _ in range(w * h))
        corpus.append(encode_png_palette(idx, palette, w, h))
    valid_n = len(corpus)
    corpus += [b"", b"junk", corpus[0][:30]]
    for _ in range(rnd.randrange(2, 8)):
        mut = bytearray(corpus[rnd.randrange(valid_n)])
        for _ in range(rnd.randrange(1, 4)):
            mut[rnd.randrange(len(mut))] = rnd.randrange(256)
        corpus.append(bytes(mut[: rnd.randrange(len(mut) + 1)]))
    assert decode_png_pixels_batch(corpus) == [decode_png_pixels(p) for p in corpus]


@given(
    st.integers(min_value=9, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.sampled_from([1, 2, 3, 4]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_dhash_numpy_equals_scalar(w, h, channels, rnd):
    """_dhash_from_pixels_np (integral-image hot path) matches the
    scalar reference hash for every geometry and color type."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        _dhash_from_pixels,
        _dhash_from_pixels_np,
    )

    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    assert _dhash_from_pixels_np(w, h, channels, px) == _dhash_from_pixels(
        w, h, channels, px
    )


@given(
    st.integers(min_value=1, max_value=18),
    st.integers(min_value=1, max_value=18),
    st.sampled_from([1, 2, 3, 4]),
    st.randoms(use_true_random=False),
    st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
)
@settings(max_examples=40, deadline=None)
def test_png16_roundtrip_keeps_high_byte(w, h, channels, rnd, filter_type):
    """decode(encode_png_16(s)) is the per-sample high byte — the
    standard 16->8 reduction, exact."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_16,
    )

    s16 = [rnd.randrange(65536) for _ in range(w * h * channels)]
    png = encode_png_16(s16, w, h, channels, filter_type)
    assert decode_png_pixels(png) == (w, h, channels, bytes(v >> 8 for v in s16))


@given(
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=25),
    st.sampled_from([1, 2, 4]),
    st.randoms(use_true_random=False),
    st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
)
@settings(max_examples=40, deadline=None)
def test_png_lowdepth_gray_roundtrip_scales(w, h, depth, rnd, filter_type):
    """Sub-byte grayscale unpacks MSB-first (row-padded) and scales by
    left-bit replication: 1-bit x255, 2-bit x85, 4-bit x17."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_lowdepth,
    )

    scale = {1: 255, 2: 85, 4: 17}[depth]
    vals = [rnd.randrange(1 << depth) for _ in range(w * h)]
    png = encode_png_lowdepth(vals, depth, w, h, filter_type)
    assert decode_png_pixels(png) == (w, h, 1, bytes(v * scale for v in vals))


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.sampled_from([1, 2, 3, 4]),
    st.randoms(use_true_random=False),
    st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
)
@settings(max_examples=40, deadline=None)
def test_png_adam7_roundtrip_property(w, h, channels, rnd, filter_type):
    """Adam7: seven independently filtered passes scatter back to the
    exact source pixels for every geometry (incl. degenerate 1xN/Nx1
    where several passes are empty)."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_adam7,
    )

    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    png = encode_png_adam7(px, w, h, channels, filter_type)
    assert decode_png_pixels(png) == (w, h, channels, px)


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.sampled_from([1, 2, 4]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=30, deadline=None)
def test_png_subbyte_palette_roundtrip(w, h, depth, rnd):
    """Sub-byte palette indices unpack then map through PLTE."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_palette,
    )

    n = 1 << depth
    palette = bytes(rnd.randrange(256) for _ in range(3 * n))
    idx = bytes(rnd.randrange(n) for _ in range(w * h))
    png = encode_png_palette(idx, palette, w, h, depth=depth)
    expected = b"".join(palette[3 * v : 3 * v + 3] for v in idx)
    assert decode_png_pixels(png) == (w, h, 3, expected)


@given(st.randoms(use_true_random=False))
@settings(max_examples=20, deadline=None)
def test_png_batch_equals_scalar_on_exotic_shapes(rnd):
    """The batch decoder routes 16-bit / sub-byte / Adam7 payloads to
    the scalar general path — results identical, incl. under mutation."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        decode_png_pixels,
        decode_png_pixels_batch,
        encode_png,
        encode_png_16,
        encode_png_adam7,
        encode_png_lowdepth,
        encode_png_palette,
    )

    w, h = rnd.randrange(1, 12), rnd.randrange(1, 12)
    corpus = [
        encode_png(bytes(rnd.randrange(256) for _ in range(w * h * 3)), w, h, 3),
        encode_png_16([rnd.randrange(65536) for _ in range(w * h * 2)], w, h, 2),
        encode_png_lowdepth([rnd.randrange(4) for _ in range(w * h)], 2, w, h),
        encode_png_adam7(bytes(rnd.randrange(256) for _ in range(w * h * 4)), w, h, 4),
        encode_png_palette(
            bytes(rnd.randrange(4) for _ in range(w * h)),
            bytes(rnd.randrange(256) for _ in range(12)), w, h, depth=2,
        ),
    ]
    for _ in range(rnd.randrange(3, 10)):
        mut = bytearray(corpus[rnd.randrange(5)])
        for _ in range(rnd.randrange(1, 4)):
            mut[rnd.randrange(len(mut))] = rnd.randrange(256)
        corpus.append(bytes(mut[: rnd.randrange(len(mut) + 1)]))
    assert decode_png_pixels_batch(corpus) == [decode_png_pixels(p) for p in corpus]
