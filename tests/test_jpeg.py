"""Baseline JPEG codec (operators/jpeg.py): round-trip error bounds,
the uniform-image exactness contract behind the oracle-checked catalog
query, restart/subsampling structure, and decoder robustness on
corrupted bytes. No Spark needed — pure codec pins."""

from __future__ import annotations

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)
from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
    parse_image_header,
)


def _gradient(w: int, h: int, ch: int) -> bytes:
    return bytes(
        int(127 + 80 * np.sin((x + 2 * y + 3 * c) / 8))
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def test_roundtrip_error_bound_high_quality():
    """Smooth content at quality 95 must round-trip within a few code
    values (4:4:4) — the codec's accuracy pin."""
    for w, h in ((24, 17), (8, 8), (33, 9)):
        px = _gradient(w, h, 3)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(px, w, h, 3, quality=95))
        assert dec is not None and dec[:3] == (w, h, 3)
        err = np.abs(
            np.frombuffer(px, np.uint8).astype(int)
            - np.frombuffer(dec[3], np.uint8).astype(int)
        )
        assert err.max() <= 8, (w, h, err.max())


def test_subsampled_and_restart_streams_decode():
    """4:2:0 (multi-block MCUs + chroma upsampling) and DRI/RSTn resync
    are real decoder paths, driven by our own conformant streams."""
    px = _gradient(24, 18, 3)
    for sub in (False, True):
        for ri in (0, 1, 3):
            enc = encode_jpeg_baseline(
                px, 24, 18, 3, quality=92, subsample=sub, restart_interval=ri
            )
            dec = decode_jpeg_baseline(enc)
            assert dec is not None and dec[:3] == (24, 18, 3), (sub, ri)
            err = np.abs(
                np.frombuffer(px, np.uint8).astype(int)
                - np.frombuffer(dec[3], np.uint8).astype(int)
            )
            # chroma detail is halved under 4:2:0 — luma stays tight
            assert err.max() <= (40 if sub else 10), (sub, ri, err.max())


def test_grayscale_roundtrip():
    g = _gradient(19, 11, 1)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(g, 19, 11, 1, quality=95))
    assert dec is not None and dec[:3] == (19, 11, 1)
    err = np.abs(
        np.frombuffer(g, np.uint8).astype(int)
        - np.frombuffer(dec[3], np.uint8).astype(int)
    )
    assert err.max() <= 4


@given(
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from([0, 2]),
)
@settings(max_examples=60, deadline=None)
def test_uniform_gray_q75_is_exact(doc_id, restart):
    """The oracle contract of multimodal_jpeg_roundtrip: at quality 75
    the luma DC step is exactly 8 and a uniform block's DC is exactly
    8*(v-128), so the decode returns the EXACT uniform value for every
    id-derived geometry — including odd sizes (edge padding) and
    restart-marker streams."""
    w, h = 8 + doc_id % 9, 8 + doc_id % 5
    val = 96 + doc_id % 64
    enc = encode_jpeg_baseline(
        bytes([val]) * (w * h), w, h, 1, quality=75, restart_interval=restart
    )
    dec = decode_jpeg_baseline(enc)
    assert dec == (w, h, 1, bytes([val]) * (w * h))


def test_header_parser_recognizes_our_streams():
    enc = encode_jpeg_baseline(_gradient(24, 17, 3), 24, 17, 3)
    assert parse_image_header(enc) == ("jpeg", 24, 17, 3)
    sub = encode_jpeg_baseline(_gradient(24, 18, 3), 24, 18, 3, subsample=True)
    assert parse_image_header(sub) == ("jpeg", 24, 18, 3)


@given(st.randoms(use_true_random=False))
@settings(max_examples=25, deadline=None)
def test_fast_decoder_equals_scalar(rnd):
    """The LUT/batched-IDCT fast path is byte-exact against the per-bit
    scalar reference on a mixed corpus — every subsampling mode,
    grayscale, DRI streams, plus corrupted/truncated payloads (both
    must fail closed identically)."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg_baseline_scalar,
    )

    corpus = []
    for _ in range(rnd.randrange(4, 10)):
        ch = rnd.choice([1, 3])
        w, h = rnd.randrange(1, 34), rnd.randrange(1, 34)
        px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        corpus.append(
            encode_jpeg_baseline(
                px, w, h, ch,
                quality=rnd.choice([40, 75, 90]),
                subsample=(ch == 3 and rnd.random() < 0.5),
                restart_interval=rnd.choice([0, 0, 1, 2, 3]),
            )
        )
    valid_n = len(corpus)
    corpus += [b"", b"junk", corpus[0][:40]]
    for _ in range(rnd.randrange(3, 10)):
        mut = bytearray(corpus[rnd.randrange(valid_n)])
        for _ in range(rnd.randrange(1, 4)):
            mut[rnd.randrange(len(mut))] = rnd.randrange(256)
        corpus.append(bytes(mut[: rnd.randrange(len(mut) + 1)]))
    for p in corpus:
        assert decode_jpeg_baseline(p) == decode_jpeg_baseline_scalar(p)


def test_jpeg_fast_decode_throughput_pinned():
    """The LUT entropy decode + batched IDCT must hold >=3x the scalar
    reference decoder's throughput (r6 VERDICT ask #3: the per-bit
    Huffman walk was the last per-bit Python kernel in the multimodal
    path — this pins the fix like the r5 PNG unfilter pin). Corpus:
    textured thumbnails at the catalog shape plus one camera-ish frame;
    best-of-3 each side; measured margin ~1.5x the bar."""
    import time

    rnd = random.Random(20260815)
    corpus = []
    for i in range(300):
        px = bytes(rnd.randrange(256) for _ in range(9 * 8 * 3))
        corpus.append(
            encode_jpeg_baseline(
                px, 9, 8, 3, quality=90,
                subsample=(i % 3 == 1), restart_interval=2 if i % 4 == 1 else 0,
            )
        )
    corpus.append(encode_jpeg_baseline(_gradient(160, 120, 3), 160, 120, 3, quality=85, subsample=True))
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg_baseline_scalar,
    )

    decode_jpeg_baseline(corpus[0])  # warm LUT cache + numpy
    best_scalar = best_fast = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        scalar = [decode_jpeg_baseline_scalar(p) for p in corpus]
        t1 = time.perf_counter()
        fast = [decode_jpeg_baseline(p) for p in corpus]
        t2 = time.perf_counter()
        assert scalar == fast
        best_scalar = min(best_scalar, t1 - t0)
        best_fast = min(best_fast, t2 - t1)
    speedup = best_scalar / best_fast
    assert speedup >= 3.0, f"fast decoder only {speedup:.1f}x scalar"


def test_progressive_equals_baseline_pixels():
    """THE progressive contract: SOF2 only reorders transmission of the
    same quantized coefficients, so decoding the progressive stream
    must reproduce the baseline stream's pixels BIT-FOR-BIT — gradient
    and structural shapes, every subsampling mode, gray, 1x1, and
    non-8-multiple geometries."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    for w, h, ch, q, sub in (
        (24, 17, 3, 90, False),
        (24, 18, 3, 85, True),
        (16, 16, 1, 75, False),
        (9, 8, 3, 90, True),
        (33, 31, 3, 50, False),
        (1, 1, 1, 75, False),
        (64, 48, 3, 75, True),
    ):
        px = _gradient(w, h, ch)
        base = decode_jpeg(encode_jpeg_baseline(px, w, h, ch, quality=q, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(px, w, h, ch, quality=q, subsample=sub))
        assert prog is not None and prog == base, (w, h, ch, q, sub)


@given(st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None)
def test_progressive_parity_on_noise(rnd):
    """Noise images maximize coefficient density — the hardest case for
    the AC refinement correction-bit bookkeeping (ZRL spans interleaved
    with history-nonzero coefficients)."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    w, h = rnd.randrange(1, 50), rnd.randrange(1, 50)
    ch = rnd.choice([1, 3])
    sub = ch == 3 and rnd.random() < 0.5
    q = rnd.choice([10, 40, 75, 95])
    px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    base = decode_jpeg(encode_jpeg_baseline(px, w, h, ch, quality=q, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(px, w, h, ch, quality=q, subsample=sub))
    assert prog is not None and prog == base


@given(st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None)
def test_progressive_decoder_never_crashes_on_mutations(rnd):
    """Corrupted/truncated progressive streams must yield None or a
    well-formed tuple — never throw (untrusted crawl bytes)."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    base = encode_jpeg_progressive(
        _gradient(24, 18, 3), 24, 18, 3,
        quality=rnd.choice([50, 90]), subsample=rnd.random() < 0.5,
    )
    mut = bytearray(base)
    for _ in range(rnd.randrange(1, 6)):
        mut[rnd.randrange(len(mut))] = rnd.randrange(256)
    payload = bytes(mut[: rnd.randrange(len(mut) + 1)])
    out = decode_jpeg(payload)
    if out is not None:
        w, h, ch, px = out
        assert len(px) == w * h * ch


def test_jpeg_structure_reads_sampling_and_dri():
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        jpeg_structure,
    )

    full = encode_jpeg_baseline(_gradient(24, 17, 3), 24, 17, 3)
    assert jpeg_structure(full) == (24, 17, 3, "444", 0)
    sub = encode_jpeg_baseline(
        _gradient(24, 18, 3), 24, 18, 3, subsample=True, restart_interval=2
    )
    assert jpeg_structure(sub) == (24, 18, 3, "420", 2)
    gray = encode_jpeg_baseline(bytes(100), 10, 10, 1)
    assert jpeg_structure(gray) == (10, 10, 1, "gray", 0)
    # progressive SOF2 still carries geometry (structure parse is
    # decode-independent)
    prog = full.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert jpeg_structure(prog) == (24, 17, 3, "444", 0)
    assert jpeg_structure(b"") is None
    assert jpeg_structure(b"\xff\xd8\xff\xd9") is None


def test_encoder_is_deterministic():
    px = _gradient(16, 16, 3)
    a = encode_jpeg_baseline(px, 16, 16, 3, quality=85)
    b = encode_jpeg_baseline(px, 16, 16, 3, quality=85)
    assert a == b


def test_rejects_non_baseline_shapes():
    good = encode_jpeg_baseline(_gradient(16, 16, 3), 16, 16, 3)
    assert decode_jpeg_baseline(good) is not None
    # progressive SOF2 marker in place of SOF0
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_baseline(prog) is None
    # 12-bit precision
    i = good.find(b"\xff\xc0")
    deep = bytearray(good)
    deep[i + 4] = 12
    assert decode_jpeg_baseline(bytes(deep)) is None
    assert decode_jpeg_baseline(b"") is None
    assert decode_jpeg_baseline(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_baseline(good[:40]) is None


@given(st.randoms(use_true_random=False))
@settings(max_examples=40, deadline=None)
def test_decoder_never_crashes_on_mutations(rnd):
    """Arbitrary corruption/truncation of valid streams (4:4:4, 4:2:0,
    DRI, gray) must yield None or a well-formed tuple — never throw
    (untrusted crawl bytes)."""
    base = rnd.choice(
        [
            encode_jpeg_baseline(_gradient(16, 16, 3), 16, 16, 3),
            encode_jpeg_baseline(
                _gradient(24, 18, 3), 24, 18, 3, subsample=True, restart_interval=2
            ),
            encode_jpeg_baseline(_gradient(9, 8, 1), 9, 8, 1),
        ]
    )
    mut = bytearray(base)
    for _ in range(rnd.randrange(1, 6)):
        mut[rnd.randrange(len(mut))] = rnd.randrange(256)
    payload = bytes(mut[: rnd.randrange(len(mut) + 1)])
    out = decode_jpeg_baseline(payload)
    if out is not None:
        w, h, ch, px = out
        assert len(px) == w * h * ch


def test_quality_monotonicity():
    """Lower quality -> smaller payloads (quant tables coarsen); both
    ends still decode to the right geometry."""
    px = _gradient(32, 24, 3)
    sizes = []
    for q in (95, 75, 50, 25):
        enc = encode_jpeg_baseline(px, 32, 24, 3, quality=q)
        assert decode_jpeg_baseline(enc)[:3] == (32, 24, 3)
        sizes.append(len(enc))
    assert sizes == sorted(sizes, reverse=True), sizes


def test_random_noise_structural_roundtrip():
    """Worst-case content (uniform noise) still produces decodable
    streams at every quality — structure, not fidelity."""
    rnd = random.Random(9)
    px = bytes(rnd.randrange(256) for _ in range(17 * 13 * 3))
    for q in (10, 50, 90):
        dec = decode_jpeg_baseline(encode_jpeg_baseline(px, 17, 13, 3, quality=q))
        assert dec is not None and dec[:3] == (17, 13, 3)


def test_dispatching_decoder_handles_both_formats():
    """decode_image_pixels_batch feeds phash from PNG *or* JPEG bytes
    (mixed crawl batches); junk stays None."""
    from spark_streaming_kafka_bucket_counter_spark.operators.multimodal import (
        _dhash_from_pixels_np,
        decode_image_pixels_batch,
        encode_png,
    )

    jpg = encode_jpeg_baseline(_gradient(16, 16, 3), 16, 16, 3, quality=95)
    png_px = _gradient(9, 8, 3)
    png = encode_png(png_px, 9, 8, 3)
    decs = decode_image_pixels_batch([jpg, png, b"junk", b""])
    assert decs[0] is not None and decs[0][:3] == (16, 16, 3)
    assert decs[1] == (9, 8, 3, png_px)
    assert decs[2] is None and decs[3] is None
    assert _dhash_from_pixels_np(*decs[0]) is not None


@given(st.randoms(use_true_random=False))
@settings(max_examples=25, deadline=None)
def test_fast_progressive_encoder_equals_scalar(rnd):
    """The vectorized progressive scan encoders (r8 — field-array
    build + one-shot bit pack) are byte-exact against the per-
    coefficient scalar reference on a mixed corpus: every scan kind
    (DC first/refine, AC spectral bands, AC refinement with correction
    bits), both subsampling modes, grayscale, degenerate 1-pixel-tall/
    wide shapes, flat and noise content."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    for _ in range(rnd.randrange(4, 9)):
        ch = rnd.choice([1, 3])
        w, h = rnd.randrange(1, 34), rnd.randrange(1, 34)
        kind = rnd.choice(["noise", "flat", "grad"])
        if kind == "noise":
            px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        elif kind == "flat":
            px = bytes([rnd.randrange(256)]) * (w * h * ch)
        else:
            px = _gradient(w, h, ch)
        q = rnd.choice([30, 75, 90])
        sub = ch == 3 and rnd.random() < 0.5
        fast = encode_jpeg_progressive(px, w, h, ch, quality=q, subsample=sub)
        ref = encode_jpeg_progressive(
            px, w, h, ch, quality=q, subsample=sub, scalar=True
        )
        assert fast == ref, (w, h, ch, q, sub, kind)


def test_jpeg_progressive_encode_throughput_pinned():
    """The vectorized progressive encoder must hold >=3x the scalar
    reference's throughput (r7 VERDICT ask #3: the per-block scan
    encoders were the last scalar media kernel — the sf1 curve's one
    super-linear row). Corpus: textured camera-ish frames plus one
    noise frame — the sizes the vectorized path targets; thumbnails
    below the ``_VEC_MIN_BLOCKS`` crossover dispatch to the scalar
    path by design (pinned byte-equal in the parity test above) and
    so carry no vectorization claim. Best-of-3 each side."""
    import time

    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rnd = random.Random(20260815)
    corpus = [
        (_gradient(160, 120, 3), 160, 120, 3, 85, True),
        (_gradient(320, 240, 3), 320, 240, 3, 90, False),
        (_gradient(240, 176, 3), 240, 176, 3, 75, True),
        (_gradient(200, 150, 1), 200, 150, 1, 90, False),
        (
            bytes(rnd.randrange(256) for _ in range(96 * 96 * 3)),
            96, 96, 3, 90, False,
        ),
    ]
    encode_jpeg_progressive(*corpus[0][:4])  # warm LUT cache + numpy
    best_scalar = best_fast = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ref = [
            encode_jpeg_progressive(p, w, h, c, quality=q, subsample=s, scalar=True)
            for p, w, h, c, q, s in corpus
        ]
        t1 = time.perf_counter()
        fast = [
            encode_jpeg_progressive(p, w, h, c, quality=q, subsample=s)
            for p, w, h, c, q, s in corpus
        ]
        t2 = time.perf_counter()
        assert ref == fast
        best_scalar = min(best_scalar, t1 - t0)
        best_fast = min(best_fast, t2 - t1)
    speedup = best_scalar / best_fast
    assert speedup >= 3.0, f"fast progressive encoder only {speedup:.1f}x scalar"


def test_cmyk_adobe_roundtrip_both_transforms():
    """Round 8: Adobe CMYK (APP14 transform 0) and YCCK (transform 2)
    baseline streams decode to the naive CMYK->RGB compose within tight
    lossy bounds; a 4-component stream WITHOUT the Adobe marker fails
    closed (this codec never guesses); scalar and fast decoders agree
    byte-exactly on CMYK streams too."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_baseline,
        decode_jpeg_baseline_scalar,
        encode_jpeg_cmyk,
    )

    w, h = 24, 16
    yy, xx = np.mgrid[0:h, 0:w]
    cmyk = np.stack(
        [
            np.clip(np.round(np.sin(xx / 9) * 40 + 100), 0, 255),
            np.clip(np.round(np.cos(yy / 7) * 40 + 80), 0, 255),
            np.clip(np.round((xx + yy) * 2), 0, 255),
            np.clip(np.round(np.sin((xx + yy) / 11) * 30 + 60), 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    px = cmyk.tobytes()
    inv = 255.0 - cmyk.astype(np.float64)
    want = np.stack(
        [inv[:, :, i] * inv[:, :, 3] / 255.0 for i in range(3)], axis=-1
    )
    for ycck in (False, True):
        b = encode_jpeg_cmyk(px, w, h, quality=97, ycck=ycck)
        dec = decode_jpeg(b)
        assert dec is not None and dec[:3] == (w, h, 3)
        got = np.frombuffer(dec[3], np.uint8).reshape(h, w, 3).astype(np.float64)
        err = np.abs(got - np.clip(np.round(want), 0, 255)).max()
        assert err <= 12, (ycck, err)
        assert decode_jpeg_baseline(b) == decode_jpeg_baseline_scalar(b)

    # uniform inks at quality 75: transform-0 decode is INTEGER-EXACT
    # (DC quantizer 8 divides 8*(p-128); the catalog oracle's claim)
    flat = np.empty((h, w, 4), np.uint8)
    for i, v in enumerate((40, 170, 200, 90)):
        flat[:, :, i] = v
    dec = decode_jpeg(encode_jpeg_cmyk(flat.tobytes(), w, h, quality=75))
    got = np.frombuffer(dec[3], np.uint8).reshape(h, w, 3)
    exact = [round((255 - v) * (255 - 90) / 255.0) for v in (40, 170, 200)]
    assert [int(got[0, 0, i]) for i in range(3)] == exact

    # no APP14 -> fail closed
    b = bytearray(encode_jpeg_cmyk(px, w, h))
    i = b.find(b"\xff\xee")
    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
    del b[i : i + 2 + seglen]
    assert decode_jpeg(bytes(b)) is None

def test_lossless_roundtrip_every_predictor_and_precision():
    """SOF3 lossless (round 9): decode(encode(x)) is BIT-EXACT for all
    seven predictors at 8/12/16-bit precision, gray and RGB, with and
    without a point transform — the property that distinguishes this
    family from every lossy path (and what the full SQL oracle of
    multimodal_jpeg_lossless rests on)."""
    import numpy as np

    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    rng = np.random.RandomState(42)
    for prec in (2, 8, 12, 16):
        for nc in (1, 3):
            for pred in range(1, 8):
                pt = 0 if pred % 2 else min(2, prec - 1)
                h, w = 11, 7
                img = rng.randint(0, 1 << prec, size=(h, w, nc)).astype(np.int64)
                img = (img >> pt) << pt
                blob = encode_jpeg_lossless(
                    img, w, h, nc, precision=prec,
                    predictor=pred, point_transform=pt,
                )
                dec = decode_jpeg_lossless(blob)
                assert dec is not None, (prec, nc, pred, pt)
                dw, dh, dnc, dprec, vals = dec
                assert (dw, dh, dnc, dprec) == (w, h, nc, prec)
                assert np.array_equal(vals, img), (prec, nc, pred, pt)


def test_lossless_fails_closed():
    """Fail-closed envelope: DCT decoders return None on SOF3 streams
    and the lossless decoder returns None on DCT streams, truncation,
    declared restarts, and garbage — never a guess, never a raise."""
    import numpy as np

    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_baseline,
        decode_jpeg_lossless,
        encode_jpeg_baseline,
        encode_jpeg_lossless,
    )

    img = np.arange(5 * 4 * 1, dtype=np.int64).reshape(4, 5, 1) % 256
    blob = encode_jpeg_lossless(img, 5, 4, 1)
    assert decode_jpeg(blob) is None
    assert decode_jpeg_baseline(blob) is None
    base = encode_jpeg_baseline(bytes(4 * 5 * 3), 5, 4, 3)
    assert decode_jpeg_lossless(base) is None
    for cut in (len(blob) // 3, len(blob) - 3):
        assert decode_jpeg_lossless(blob[:cut]) is None
    assert decode_jpeg_lossless(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_lossless(b"not a jpeg at all") is None
    # a DRI segment with nonzero interval puts the stream outside the
    # supported envelope (prediction-reset semantics not guessed)
    with_dri = blob[:2] + b"\xff\xdd\x00\x04\x00\x08" + blob[2:]
    assert decode_jpeg_lossless(with_dri) is None
    # zero restart interval is harmless and legal
    with_dri0 = blob[:2] + b"\xff\xdd\x00\x04\x00\x00" + blob[2:]
    assert decode_jpeg_lossless(with_dri0) is not None
