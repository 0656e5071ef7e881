"""Arithmetic-coded JPEG (operators/jpeg_arith.py): QM-coder
self-consistency under adversarial bit sequences, SOF9-vs-SOF0 pixel
parity (the same quantized coefficients MUST decode bit-identically),
restart-interval resync, DAC handling, and fail-closed behavior on
corrupt or still-gated streams. No Spark needed — pure codec pins."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
    _BitReader,
    decode_jpeg,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)
from spark_streaming_kafka_bucket_counter_spark.operators.jpeg_arith import (
    _QE,
    _QMDecoder,
    _QMEncoder,
    encode_jpeg_arith,
)


def _texture(did: int, w: int, h: int, ch: int) -> bytes:
    yy, xx = np.mgrid[0:h, 0:w]
    planes = [
        (did * 7 + yy * 31 + xx * 13) % 256,
        (did * 11 + yy * 17 + xx * 19) % 256,
        (did * 13 + yy * 23 + xx * 29) % 256,
    ][:ch]
    return np.stack(planes, axis=-1).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# QM-coder core
# ---------------------------------------------------------------------------


def test_qe_table_shape():
    """113 adaptive states + the non-adaptive sign state; every
    transition index stays inside the table; switch only on the
    renorm-boundary states (Qe near 0.5)."""
    assert len(_QE) == 114
    for qe, nlps, nmps, sw in _QE:
        assert 0 < qe < 0x8000
        assert 0 <= nlps < 114 and 0 <= nmps < 114
        assert sw in (0, 1)
        if sw:
            assert qe > 0x5000  # MPS switch only near equiprobability
    # the fixed state self-loops and never flips its MPS
    qe, nlps, nmps, sw = _QE[113]
    assert (nlps, nmps, sw) == (113, 113, 0)


def _roundtrip_bits(bits: list[int], ctxs: list[int], nctx: int) -> list[int]:
    enc = _QMEncoder()
    st_e = bytearray(nctx)
    for b, cx in zip(bits, ctxs):
        enc.encode(st_e, cx, b)
    data = enc.flush()
    # stuffing invariant: inside entropy data every 0xFF is followed by
    # 0x00, so the stream can never forge a marker
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] == 0x00
    assert data[-1] != 0xFF or True  # trailing 0xFF gets its stuffed 0x00
    dec = _QMDecoder(_BitReader(data, 0))
    st_d = bytearray(nctx)
    return [dec.decode(st_d, cx) for cx in ctxs]


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_qm_roundtrip_random(data):
    """Any bit sequence over any context assignment decodes exactly —
    the coder and decoder walk the same estimation state machine."""
    n = data.draw(st.integers(1, 600))
    nctx = data.draw(st.integers(1, 6))
    bits = data.draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    ctxs = data.draw(st.lists(st.integers(0, nctx - 1), min_size=n, max_size=n))
    assert _roundtrip_bits(bits, ctxs, nctx) == bits


def test_qm_roundtrip_adversarial_patterns():
    """Worst cases for carry/stuffing: long MPS runs (drives Qe tiny,
    C accumulates 0xFF bytes), alternating bits, long LPS runs."""
    cases = [
        [1] * 5000,
        [0] * 5000,
        [0, 1] * 2500,
        [1] * 100 + [0] * 100 + [1] * 100,
        ([1] * 31 + [0]) * 100,
    ]
    for bits in cases:
        ctxs = [0] * len(bits)
        assert _roundtrip_bits(bits, ctxs, 1) == bits


def test_qm_carry_over_stacked_ff():
    """Sequences engineered to emit 0xFF bytes then carry across them
    (the stacked-FF resolution path) still roundtrip."""
    rng = np.random.RandomState(7)
    for _ in range(200):
        n = int(rng.randint(50, 400))
        bits = (rng.rand(n) < 0.95).astype(int).tolist()  # skewed: tiny Qe
        ctxs = rng.randint(0, 3, n).tolist()
        assert _roundtrip_bits(bits, ctxs, 3) == bits


# ---------------------------------------------------------------------------
# SOF9 streams
# ---------------------------------------------------------------------------


def test_arith_matches_baseline_bit_for_bit():
    """The flagship contract: SOF9 and SOF0 streams built from the same
    pixels carry identical quantized coefficients, so their decodes
    must agree byte-for-byte (same assembled-IDCT path)."""
    for did, (w, h, ch, q, sub) in enumerate([
        (9, 8, 3, 90, False),
        (9, 8, 3, 90, True),
        (16, 16, 1, 75, False),
        (33, 9, 3, 50, False),
        (24, 17, 3, 95, True),
    ]):
        px = _texture(did + 1, w, h, ch)
        base = encode_jpeg_baseline(px, w, h, ch, quality=q, subsample=sub)
        ari = encode_jpeg_arith(px, w, h, ch, quality=q, subsample=sub)
        db = decode_jpeg(base)
        da = decode_jpeg(ari)
        assert db is not None
        assert da == db


def test_arith_restart_intervals():
    """RSTn boundaries: each interval is an independently flushed
    codeword with fresh statistics and DC predictors; resync must land
    exactly on the markers."""
    for ri in (1, 2, 3, 5):  # 19x15 at 4:4:4 = 6 MCUs; ri must fire
        px = _texture(5, 19, 15, 3)
        base = encode_jpeg_baseline(px, 19, 15, 3, quality=80, restart_interval=ri)
        ari = encode_jpeg_arith(px, 19, 15, 3, quality=80, restart_interval=ri)
        assert decode_jpeg(ari) == decode_jpeg(base)
        # the arithmetic stream really carries restart markers
        body = ari[2:]
        assert any(
            body[i] == 0xFF and 0xD0 <= body[i + 1] <= 0xD7
            for i in range(len(body) - 1)
        )


def test_arith_stream_is_sof9_with_dac():
    b = encode_jpeg_arith(_texture(1, 9, 8, 3), 9, 8, 3)
    assert b"\xff\xc9" in b  # SOF9 frame
    assert b"\xff\xcc" in b  # DAC conditioning declared explicitly
    assert b"\xff\xc4" not in b  # no Huffman tables in an arithmetic stream


def test_arith_smaller_than_huffman():
    """Not a correctness pin, a sanity one: adaptive arithmetic coding
    should beat the encoder's flat Huffman tables on textured content."""
    px = _texture(3, 48, 32, 3)
    base = encode_jpeg_baseline(px, 48, 32, 3, quality=85)
    ari = encode_jpeg_arith(px, 48, 32, 3, quality=85)
    assert len(ari) < len(base)


def test_arith_fails_closed():
    """Truncation and corruption return None, never raise; the baseline
    entry points still refuse SOF9; SOF10 stays gated."""
    px = _texture(2, 16, 16, 3)
    b = encode_jpeg_arith(px, 16, 16, 3)
    assert decode_jpeg_baseline(b) is None  # baseline path: not its job
    assert decode_jpeg(b[: len(b) // 2]) is None  # truncated
    corrupt = bytearray(b)
    sos = bytes(corrupt).find(b"\xff\xda")
    for off in (sos + 20, sos + 25, sos + 30):
        mut = bytearray(b)
        if mut[off] not in (0xFF, 0x00) and off < len(mut) - 2:
            mut[off] ^= 0x55
            # corrupt entropy data either still decodes (arith is dense:
            # every byte string is "valid" bits) or fails closed — never
            # raises; geometry must survive either way
            got = decode_jpeg(bytes(mut))
            assert got is None or (got[0], got[1]) == (16, 16)
    # progressive-arithmetic (SOF10) remains honestly gated
    sof10 = b.replace(b"\xff\xc9", b"\xff\xca")
    assert decode_jpeg(sof10) is None


def test_progressive_arith_matches_baseline():
    """SOF10: every T.81 G.2 arithmetic scan kind (interleaved DC first
    at Al=1, fixed-bin DC refinement, AC spectral bands, AC
    successive-approximation refinement) reconstructs the exact
    coefficients — pinned by bit-identical pixels vs the SOF0 twin."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    for did, (w, h, ch, q, sub) in enumerate([
        (9, 8, 3, 90, False),
        (9, 8, 3, 90, True),
        (16, 16, 1, 75, False),
        (24, 17, 3, 95, True),
    ]):
        px = _texture(did + 3, w, h, ch)
        base = encode_jpeg_baseline(px, w, h, ch, quality=q, subsample=sub)
        aprog = encode_jpeg_arith_progressive(
            px, w, h, ch, quality=q, subsample=sub
        )
        assert b"\xff\xca" in aprog and b"\xff\xc4" not in aprog
        assert aprog.count(b"\xff\xda") == (11 if ch == 3 else 5)
        assert decode_jpeg(aprog) == decode_jpeg(base)


def test_progressive_arith_12bit():
    """SOF10 at precision 12 decodes to the same int64 samples as the
    12-bit Huffman twin."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg_extended,
        encode_jpeg_ext12,
    )
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.RandomState(13)
    s12 = rng.randint(0, 4096, (11, 14, 3)).astype(np.int64)
    ap = encode_jpeg_arith_progressive(s12, 14, 11, 3, quality=85, precision=12)
    hh = encode_jpeg_ext12(s12, 14, 11, 3, quality=85)
    da = decode_jpeg_extended(ap)
    dh = decode_jpeg_extended(hh)
    assert da is not None and da[:4] == (14, 11, 3, 12)
    assert (da[4] == dh[4]).all()
    assert decode_jpeg(ap) is None  # 8-bit entry still refuses 12-bit


def test_progressive_arith_truncation_fails_closed():
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    px = _texture(6, 16, 16, 3)
    b = encode_jpeg_arith_progressive(px, 16, 16, 3)
    # cut inside the scan sequence: either decodes the scans seen so
    # far... no — a progressive stream without EOI is truncated
    assert decode_jpeg(b[: len(b) // 3]) is None


def test_12bit_huffman_arith_parity():
    """12-bit extended sequential: SOF1 (Pq=1 tables, widened
    categories) and SOF9 (arithmetic at precision 12) must decode to
    identical int64 samples; 8-bit entry points must keep rejecting."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg_extended,
        encode_jpeg_ext12,
    )

    rng = np.random.RandomState(11)
    for w, h, ch, q, sub in [
        (9, 8, 3, 90, False), (14, 11, 3, 75, True), (9, 9, 1, 80, False),
    ]:
        s12 = rng.randint(0, 4096, (h, w, ch)).astype(np.int64)
        huff = encode_jpeg_ext12(s12, w, h, ch, quality=q, subsample=sub)
        ari = encode_jpeg_arith(
            s12, w, h, ch, quality=q, subsample=sub, precision=12
        )
        dh = decode_jpeg_extended(huff)
        da = decode_jpeg_extended(ari)
        assert dh is not None and da is not None
        assert dh[:4] == (w, h, ch, 12) and da[:4] == (w, h, ch, 12)
        assert (dh[4] == da[4]).all()
        assert int(dh[4].max()) <= 4095 and int(dh[4].min()) >= 0
        # the 8-bit contract refuses 12-bit rather than mis-scaling
        assert decode_jpeg(huff) is None and decode_jpeg(ari) is None


def test_12bit_uniform_exact():
    """Uniform gray at q98: scaled DC quantizer is exactly 16 and the
    DC-only IDCT divides by a power of two, so even sample values
    round-trip EXACTLY — the integer layer the catalog oracle replays."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg_extended,
        encode_jpeg_ext12,
    )

    for v in (0, 2, 254, 2048, 3000, 4094):
        uni = np.full((8, 9, 1), v, np.int64)
        du = decode_jpeg_extended(encode_jpeg_ext12(uni, 9, 8, 1, quality=98))
        assert du is not None and du[:4] == (9, 8, 1, 12)
        assert (du[4] == v).all()


def test_12bit_roundtrip_error_bound():
    """Smooth 12-bit content at high quality stays within a small
    absolute error — the lossy accuracy pin at the wider precision."""
    from spark_streaming_kafka_bucket_counter_spark.operators.jpeg import (
        decode_jpeg_extended,
        encode_jpeg_ext12,
    )

    yy, xx = np.mgrid[0:16, 0:24]
    s12 = (2048 + 1500 * np.sin((xx + 2 * yy) / 8.0))[:, :, None].astype(np.int64)
    du = decode_jpeg_extended(encode_jpeg_ext12(s12, 24, 16, 1, quality=95))
    assert du is not None
    err = np.abs(du[4].astype(np.int64) - s12)
    # 12-bit code values: quantizer 16-32 at q95 bounds DCT error well
    # under 1% of full scale on smooth content
    assert int(err.max()) <= 40, int(err.max())


def test_arith_decode_without_dac_uses_defaults():
    """A stream missing the DAC marker decodes with the spec default
    conditioning (L=0, U=1, Kx=5) — which is exactly what the encoder
    declares, so stripping DAC must not change the pixels."""
    px = _texture(4, 9, 8, 3)
    b = encode_jpeg_arith(px, 9, 8, 3)
    i = b.find(b"\xff\xcc")
    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
    stripped = b[:i] + b[i + 2 + seglen :]
    assert decode_jpeg(stripped) == decode_jpeg(b)
