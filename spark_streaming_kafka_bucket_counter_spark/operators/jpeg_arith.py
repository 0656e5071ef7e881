"""Arithmetic-coded JPEG (ITU-T T.81 Annex D QM-coder + Annex F
sequential DCT statistical models) — SOF9, dependency-free.

Round 9: closes the largest remaining rung of the r8 "What's missing
#3" codec tail. The QM-coder is the binary adaptive arithmetic coder
of T.81 Annex D: a 113-state probability estimation machine (Table
D.3, transcribed below) driving interval subdivision with conditional
MPS/LPS exchange, renormalization-coupled estimation, byte stuffing
(0x00 after 0xFF so entropy data never forges a marker) and
carry-over resolution across stacked 0xFF bytes. On top of it sit the
sequential DCT conditioning models of F.1.4.4: DC differences coded
through a 5-category context (zero / small± / large± of the PREVIOUS
diff, thresholds from the DAC marker's L/U), AC coefficients through
per-index EOB/zero/nonzero decision bins with the low/high spectral
split at Kx, magnitudes as unary log2 category plus literal bits, AC
signs through the non-adaptive "fixed" state.

Both directions are implemented, for BOTH DCT modes:
:func:`encode_jpeg_arith` emits a conformant SOF9 interleaved
sequential stream (DAC-declared conditioning, optional restart
intervals — each interval an independently flushed codeword with fresh
statistics) and :func:`encode_jpeg_arith_progressive` a SOF10
progressive stream over the same scan script as the Huffman
progressive encoder (per-scan codewords, T.81 G.2 models: DC
first/refine, AC spectral bands, AC successive-approximation
refinement with EOB decisions, newly-significant flags and fixed-bin
signs). The scan decoders plug into ``jpeg._decode_jpeg_inner`` so
:func:`~.jpeg.decode_jpeg` transparently handles SOF9/10 next to
SOF0/1/2/3, at 8-bit and (via ``decode_jpeg_extended``) 12-bit
precision. Because arithmetic coding transports the SAME quantized
coefficients as Huffman coding, decode parity with the Huffman twins
of the same image is BIT-EXACT — the catalog pin
(`multimodal_jpeg_arith`) and pytest both use that property, the same
oracle the progressive decoder earned in round 7.

Honesty notes:
- the state-transition table is transcribed from the public spec
  (T.81 Table D.3); roundtrip + cross-coder parity are machine-checked
  here, but no arithmetic-coded corpus exists in this container to
  cross-validate against a foreign encoder.
- lossless-arithmetic (SOF11) remains gated ``None`` in ``jpeg.py``
  (the Annex H.2 conditioning layout has no second implementation here
  to pin against — never a guess); restart markers inside a
  progressive arithmetic scan are likewise gated.

Reference scope: the reference repo (kelvinfann-zz/
spark-streaming-kafka-bucket-counter) has no media path at all; this
module extends the training-data-pipeline surface (SURVEY §2.13).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.81 Table D.3 — Qe value and probability-estimation state machine.
# Each row: (Qe, next_index_LPS, next_index_MPS, switch_MPS).
# Index 113 is the conventional NON-ADAPTIVE near-equiprobable state
# (self-looping, no MPS switch) used for AC sign decisions.
# ---------------------------------------------------------------------------

_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 110, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 112, 0), (0x59EB, 112, 112, 1), (0x5A1D, 113, 113, 0),
)

_FIXED = 113  # the non-adaptive sign state

# hot-path packing: one list index + shifts per coding decision instead
# of a tuple unpack (the QM coder is inherently serial per bit, so
# constant-factor Python costs are THE cost — measured ~25% off the
# parity query)
_QE_PACKED = tuple(
    qe | (nlps << 16) | (nmps << 24) | (sw << 32)
    for qe, nlps, nmps, sw in _QE
)

# statistics-area sizes per conditioning table (T.81 Tables F.4/F.5)
_DC_BINS = 64
_AC_BINS = 256


class _QMEncoder:
    """T.81 Annex D encoder: C/A registers with 3 spacer bits for
    carry, CT byte countdown, stacked-0xFF carry resolution, and 0x00
    stuffing after emitted 0xFF bytes. A statistics bin is one byte:
    ``(mps << 7) | state_index``."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending byte (-1 = none yet)
        self.sc = 0  # count of stacked 0xFF bytes awaiting carry fate
        self.out = bytearray()

    def _emit(self, byte: int) -> None:
        self.out.append(byte & 0xFF)
        if (byte & 0xFF) == 0xFF:
            self.out.append(0x00)  # stuff: entropy data never forges markers

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: ripples into the buffered byte; every stacked 0xFF
            # becomes 0x00 with the carry absorbed by the buffer byte
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self.out.append(0x00)
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # fate depends on a later carry
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        row = _QE_PACKED[sv & 0x7F]
        qe = row & 0xFFFF
        mps = sv >> 7
        a = self.a - qe
        if bit == mps:
            if a & 0x8000:
                self.a = a
                return  # no renorm, no estimation update
            if a < qe:  # conditional exchange: MPS takes the top
                self.c += a
                a = qe
            st[i] = (mps << 7) | ((row >> 24) & 0xFF)
        else:
            if a >= qe:  # normal: LPS takes the top subinterval
                self.c += a
                a = qe
            if row >> 32:
                mps ^= 1
            st[i] = (mps << 7) | ((row >> 16) & 0xFF)
        # renorm (inline: this is THE hot loop)
        c = self.c
        ct = self.ct
        while a < 0x8000:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self.c = c
                self._byteout()
                c = self.c
                ct = 8
        self.a = a
        self.c = c
        self.ct = ct

    def flush(self) -> bytes:
        """D.1.8 termination: choose the codepoint in the final interval
        with the most trailing zeros, push out all buffered state.
        Trailing 0x00 bytes are retained (legal; decoders zero-fill past
        the end anyway)."""
        temp = (self.c + self.a - 1) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # one final carry
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self.out.append(0x00)
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
        self.sc = 0
        self.buffer = -1
        self._emit((self.c >> 19) & 0xFF)
        self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


class _QMDecoder:
    """Annex D decoder over a de-stuffed, marker-stopping bit feed.
    Byte position and any encountered marker live on the wrapped
    ``jpeg._BitReader`` (so restart resync and scan-termination checks
    read the same state), but bits buffer locally — the renorm loop is
    the hot path and a method call per bit doubles its cost. Exhausted
    input feeds zero bits, the spec's convention at a marker."""

    __slots__ = ("br", "chigh", "a", "acc", "nbits")

    def __init__(self, br) -> None:
        self.br = br
        self.acc = 0
        self.nbits = 0
        c = 0
        for _ in range(2):
            b = self._fill8()
            c = (c << 8) | (b if b >= 0 else 0)
        self.chigh = c
        self.a = 0x10000

    def _fill8(self) -> int:
        """Next de-stuffed data byte, or -1 at end/marker (zero-fill)."""
        br = self.br
        if br.marker is not None:
            return -1
        data = br.data
        pos = br.pos
        if pos >= len(data):
            return -1
        byte = data[pos]
        if byte == 0xFF:
            if pos + 1 >= len(data):
                return -1
            if data[pos + 1] == 0x00:
                br.pos = pos + 2
                return 0xFF
            br.marker = data[pos + 1]
            return -1
        br.pos = pos + 1
        return byte

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        row = _QE_PACKED[sv & 0x7F]
        qe = row & 0xFFFF
        mps = sv >> 7
        a_bot = self.a - qe
        ch = self.chigh
        if ch < a_bot:
            # bottom subinterval (nominal MPS share)
            if a_bot & 0x8000:
                self.a = a_bot
                return mps
            a = a_bot
            if a_bot < qe:  # conditional exchange: bottom is the LPS
                bit = mps ^ 1
                if row >> 32:
                    mps ^= 1
                st[i] = (mps << 7) | ((row >> 16) & 0xFF)
            else:
                bit = mps
                st[i] = (mps << 7) | ((row >> 24) & 0xFF)
        else:
            # top subinterval (nominal LPS share, size qe)
            ch -= a_bot
            a = qe
            if a_bot < qe:  # conditional exchange: top is the MPS
                bit = mps
                st[i] = (mps << 7) | ((row >> 24) & 0xFF)
            else:
                bit = mps ^ 1
                if row >> 32:
                    mps ^= 1
                st[i] = (mps << 7) | ((row >> 16) & 0xFF)
        acc = self.acc
        nb = self.nbits
        while a < 0x8000:
            a <<= 1
            if nb == 0:
                b = self._fill8()
                acc = b if b >= 0 else 0
                nb = 8
            nb -= 1
            ch = (ch << 1) | ((acc >> nb) & 1)
        self.acc = acc
        self.nbits = nb
        self.a = a
        self.chigh = ch
        return bit


# ---------------------------------------------------------------------------
# F.1.4.4 statistical models: DC difference and AC coefficient coding
# ---------------------------------------------------------------------------


def _encode_dc(enc, st, ctx, diff, cond):
    """Code one DC difference; returns the next conditioning category
    (0 zero / 4 small+ / 8 small- / 12 large+ / 16 large-)."""
    low, up = cond
    s0 = ctx
    if diff == 0:
        enc.encode(st, s0, 0)
        return 0
    enc.encode(st, s0, 1)
    if diff > 0:
        enc.encode(st, s0 + 1, 0)
        sp = s0 + 2
        sign = 0
    else:
        diff = -diff
        enc.encode(st, s0 + 1, 1)
        sp = s0 + 3
        sign = 1
    m = 0
    v = diff - 1
    if v:
        enc.encode(st, sp, 1)
        m = 1
        sp = 20  # X1
        v2 = v
        while v2 >> 1:
            v2 >>= 1
            enc.encode(st, sp, 1)
            m <<= 1
            sp += 1
    enc.encode(st, sp, 0)
    if m < (1 << low) >> 1:
        nxt = 0
    elif m > (1 << up) >> 1:
        nxt = 12 if sign == 0 else 16
    else:
        nxt = 4 if sign == 0 else 8
    sp += 14
    mm = m >> 1
    while mm:
        enc.encode(st, sp, 1 if (v & mm) else 0)
        mm >>= 1
    return nxt


def _decode_dc(dec, st, ctx, cond):
    """Decode one DC difference; returns (diff, next_context) or None
    on a corrupt magnitude walk."""
    low, up = cond
    s0 = ctx
    if dec.decode(st, s0) == 0:
        return 0, 0
    sign = dec.decode(st, s0 + 1)
    sp = s0 + 2 + sign
    m = 0
    if dec.decode(st, sp):
        m = 1
        sp = 20
        while dec.decode(st, sp):
            m <<= 1
            sp += 1
            if m > 0x8000:
                return None  # corrupt: 8/12-bit DC diffs never reach here
    if m < (1 << low) >> 1:
        nxt = 0
    elif m > (1 << up) >> 1:
        nxt = 12 if sign == 0 else 16
    else:
        nxt = 4 if sign == 0 else 8
    sp += 14
    v = m
    mm = m >> 1
    while mm:
        if dec.decode(st, sp):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), nxt


def _encode_ac(enc, st, fixed, coeffs_zz, kx):
    """Code one block's AC coefficients (zigzag order, index 1..63)."""
    ke = 63
    while ke > 0 and coeffs_zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        s = 3 * (k - 1)
        enc.encode(st, s, 0)  # not EOB
        while coeffs_zz[k] == 0:
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
        enc.encode(st, s + 1, 1)
        v = int(coeffs_zz[k])
        if v > 0:
            enc.encode(fixed, 0, 0)
        else:
            v = -v
            enc.encode(fixed, 0, 1)
        s += 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, s, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, s, 1)
                m <<= 1
                s = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
        enc.encode(st, s, 0)
        s += 14
        mm = m >> 1
        while mm:
            enc.encode(st, s, 1 if (v & mm) else 0)
            mm >>= 1
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _decode_ac(dec, st, fixed, coeffs_zz, kx):
    """Decode one block's AC run into ``coeffs_zz`` (zigzag order).
    Returns False on a corrupt stream."""
    k = 1
    while k <= 63:
        s = 3 * (k - 1)
        if dec.decode(st, s):
            return True  # EOB
        while dec.decode(st, s + 1) == 0:
            s += 3
            k += 1
            if k > 63:
                return False  # ran past the block without a nonzero
        sign = dec.decode(fixed, 0)
        s += 2
        m = 0
        if dec.decode(st, s):
            m = 1
            if dec.decode(st, s):
                m = 2
                s = 189 if k <= kx else 217
                while dec.decode(st, s):
                    m <<= 1
                    s += 1
                    if m > 0x8000:
                        return False
        s += 14
        v = m
        mm = m >> 1
        while mm:
            if dec.decode(st, s):
                v |= mm
            mm >>= 1
        v += 1
        coeffs_zz[k] = -v if sign else v
        k += 1
    return True


# ---------------------------------------------------------------------------
# progressive (T.81 G.2) models: the DC model is reused verbatim on
# point-transformed values; AC first is the sequential AC model over a
# spectral band; AC refine codes EOB decisions, newly-significant
# flags, fixed-bin signs and correction bits
# ---------------------------------------------------------------------------


def _enc_ac_first_band(enc, st, fixed, blk, ss, se, al, kx):
    """AC-first scan, one block: sequential AC coding of the band
    [ss, se] at point transform ``al`` (T.81 G.2.3 — same decision
    tree as F.1.4.4.2, band-limited)."""
    ke = se
    while ke >= ss and (abs(int(blk[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        s = 3 * (k - 1)
        enc.encode(st, s, 0)  # not EOB
        while (abs(int(blk[k])) >> al) == 0:
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
        enc.encode(st, s + 1, 1)
        v = int(blk[k])
        if v > 0:
            enc.encode(fixed, 0, 0)
            v >>= al
        else:
            v = (-v) >> al
            enc.encode(fixed, 0, 1)
        s += 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, s, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, s, 1)
                m <<= 1
                s = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
        enc.encode(st, s, 0)
        s += 14
        mm = m >> 1
        while mm:
            enc.encode(st, s, 1 if (v & mm) else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _dec_ac_first_band(dec, st, fixed, blk, ss, se, al, kx):
    """Decode one AC-first block into ``blk`` (values << al)."""
    k = ss
    while k <= se:
        s = 3 * (k - 1)
        if dec.decode(st, s):
            return True  # EOB
        while dec.decode(st, s + 1) == 0:
            s += 3
            k += 1
            if k > se:
                return False
        sign = dec.decode(fixed, 0)
        s += 2
        m = 0
        if dec.decode(st, s):
            m = 1
            if dec.decode(st, s):
                m = 2
                s = 189 if k <= kx else 217
                while dec.decode(st, s):
                    m <<= 1
                    s += 1
                    if m > 0x8000:
                        return False
        s += 14
        v = m
        mm = m >> 1
        while mm:
            if dec.decode(st, s):
                v |= mm
            mm >>= 1
        v += 1
        blk[k] = (-v << al) if sign else (v << al)
        k += 1
    return True


def _enc_ac_refine_band(enc, st, fixed, blk, ss, se, al):
    """AC successive-approximation refinement, one block (T.81
    G.2.3 / the Annex G flow the sequential model extends): EOB
    decisions past the previous stage's end index, newly-significant
    flags walked down the zero run, correction bits for history
    coefficients, fixed-bin signs."""
    ke = se
    while ke >= ss and (abs(int(blk[ke])) >> al) == 0:
        ke -= 1
    kex = se
    while kex >= ss and (abs(int(blk[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        s = 3 * (k - 1)
        if k > kex:
            enc.encode(st, s, 0)  # EOB decision: block continues
        while True:
            v = int(blk[k])
            mag = abs(v) >> al
            if abs(v) >> (al + 1):  # history coefficient: correction bit
                enc.encode(st, s + 2, mag & 1)
                break
            if mag:  # newly significant: flag + fixed-bin sign
                enc.encode(st, s + 1, 1)
                enc.encode(fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _dec_ac_refine_band(dec, st, fixed, blk, ss, se, al):
    """Decode one AC-refinement block in place."""
    kex = se
    while kex >= ss and int(blk[kex]) == 0:
        kex -= 1
    k = ss
    while k <= se:
        s = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, s):
                return True  # EOB
        while True:
            v = int(blk[k])
            if v:
                if dec.decode(st, s + 2):
                    blk[k] = v + (1 << al) if v > 0 else v - (1 << al)
                break
            if dec.decode(st, s + 1):
                sign = dec.decode(fixed, 0)
                blk[k] = (-1 << al) if sign else (1 << al)
                break
            s += 3
            k += 1
            if k > se:
                return False
        k += 1
    return True


# ---------------------------------------------------------------------------
# SOF9 encoder
# ---------------------------------------------------------------------------


def encode_jpeg_arith(
    pixels, width: int, height: int, channels: int = 3,
    quality: int = 90, subsample: bool = False, restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Conformant arithmetic-coded sequential JPEG (SOF9) for 8-bit
    grayscale or RGB — same front half (color transform, optional 4:2:0
    downsample, DCT, quantization) as :func:`~.jpeg.encode_jpeg_baseline`,
    so the two streams carry IDENTICAL quantized coefficients and their
    decodes must agree bit-for-bit. Emits an explicit DAC marker with
    the default conditioning (DC L=0/U=1, AC Kx=5). ``restart_interval``
    flushes the codeword and resets all statistics + DC state at each
    RSTn, per the spec. ``precision=12`` takes array-like samples in
    [0, 4096) and emits a 12-bit frame with Pq=1 quant tables — the
    conditioning models are magnitude-unary, so they widen for free."""
    from .jpeg import _ZIGZAG, _marker, _prepare_components

    comps, sampling, qtbls, mcux, mcuy = _prepare_components(
        pixels, width, height, channels, quality, subsample, precision
    )
    zig = np.array(_ZIGZAG)
    dc_cond = (0, 1)
    kx = 5
    ntab = 1 if channels == 1 else 2

    def _fresh():
        return (
            _QMEncoder(),
            [bytearray(_DC_BINS) for _ in range(ntab)],
            [bytearray(_AC_BINS) for _ in range(ntab)],
            bytearray([_FIXED]),
            [0] * channels,  # dc_context
            [0] * channels,  # last dc
        )

    enc, dc_st, ac_st, fixed, dcctx, preds = _fresh()
    entropy = bytearray()
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                entropy += enc.flush()
                entropy += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                enc, dc_st, ac_st, fixed, dcctx, preds = _fresh()
            for ci in range(channels):
                hs, vs = sampling[ci]
                t = min(ci, 1)
                for by in range(vs):
                    for bx in range(hs):
                        czz = comps[ci][my * vs + by, mx * hs + bx]
                        dc = int(czz[0])
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        dcctx[ci] = _encode_dc(
                            enc, dc_st[t], dcctx[ci], diff, dc_cond
                        )
                        _encode_ac(enc, ac_st[t], fixed, czz, kx)
            mcu_count += 1
    entropy += enc.flush()

    out = bytearray(b"\xff\xd8")
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtbls):
        if precision > 8:  # Pq=1: 16-bit entries
            payload = bytes([0x10 | ti])
            payload += b"".join(int(qt[z]).to_bytes(2, "big") for z in zig)
        else:
            payload = bytes([ti]) + bytes(int(qt[z]) for z in zig)
        out += _marker(0xDB, payload)
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    sof = bytes([precision]) + height.to_bytes(2, "big")
    sof += width.to_bytes(2, "big")
    sof += bytes([channels])
    for ci in range(channels):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    out += _marker(0xC9, sof)  # SOF9: extended sequential, arithmetic
    dac = bytearray()
    for t in range(ntab):
        dac += bytes([0x00 | t, (dc_cond[1] << 4) | dc_cond[0]])
        dac += bytes([0x10 | t, kx])
    out += _marker(0xCC, bytes(dac))
    sos = bytes([channels])
    for ci in range(channels):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# SOF10 encoder: progressive DCT, arithmetic coding
# ---------------------------------------------------------------------------


def encode_jpeg_arith_progressive(
    pixels, width: int, height: int, channels: int = 3,
    quality: int = 90, subsample: bool = False, precision: int = 8,
) -> bytes:
    """Conformant progressive arithmetic JPEG (SOF10) over the same
    scan script as :func:`~.jpeg.encode_jpeg_progressive` — interleaved
    DC first at Al=1, DC refinement, per-component AC spectral bands
    (1-5, 6-63) at Al=1 and an AC refinement sweep — so all four T.81
    G.2 arithmetic scan kinds are exercised and the decode must be
    bit-identical to the Huffman twins of the same coefficients. Each
    scan is an independently flushed QM codeword with fresh statistics,
    per the spec."""
    from .jpeg import _ZIGZAG, _marker, _prepare_components

    comps, sampling, qtbls, mcux, mcuy = _prepare_components(
        pixels, width, height, channels, quality, subsample, precision
    )
    zig = np.array(_ZIGZAG)
    dc_cond = (0, 1)
    kx = 5
    ntab = 1 if channels == 1 else 2
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)

    def _dc_first(al: int) -> bytes:
        enc = _QMEncoder()
        dc_st = [bytearray(_DC_BINS) for _ in range(ntab)]
        dcctx = [0] * channels
        preds = [0] * channels
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(channels):
                    hs, vs = sampling[ci]
                    t = min(ci, 1)
                    for by in range(vs):
                        for bx in range(hs):
                            dc = int(comps[ci][my * vs + by, mx * hs + bx][0])
                            sv = dc >> al  # arithmetic shift (G.1.2.1)
                            diff = sv - preds[ci]
                            preds[ci] = sv
                            dcctx[ci] = _encode_dc(
                                enc, dc_st[t], dcctx[ci], diff, dc_cond
                            )
        return enc.flush()

    def _dc_refine(al: int) -> bytes:
        enc = _QMEncoder()
        fixed = bytearray([_FIXED])
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(channels):
                    hs, vs = sampling[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            dc = int(comps[ci][my * vs + by, mx * hs + bx][0])
                            # next bit of the two's-complement DC value
                            enc.encode(fixed, 0, (dc >> al) & 1)
        return enc.flush()

    def _ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        hs, vs = sampling[ci]
        cw = (width * hs + hmax - 1) // hmax
        chh = (height * vs + vmax - 1) // vmax
        gw, gh = (cw + 7) // 8, (chh + 7) // 8
        enc = _QMEncoder()
        ac_st = bytearray(_AC_BINS)
        fixed = bytearray([_FIXED])
        for by in range(gh):
            for bx in range(gw):
                blk = comps[ci][by, bx]
                if ah == 0:
                    _enc_ac_first_band(enc, ac_st, fixed, blk, ss, se, al, kx)
                else:
                    _enc_ac_refine_band(enc, ac_st, fixed, blk, ss, se, al)
        return enc.flush()

    out = bytearray(b"\xff\xd8")
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtbls):
        if precision > 8:
            payload = bytes([0x10 | ti])
            payload += b"".join(int(qt[z]).to_bytes(2, "big") for z in zig)
        else:
            payload = bytes([ti]) + bytes(int(qt[z]) for z in zig)
        out += _marker(0xDB, payload)
    sof = bytes([precision]) + height.to_bytes(2, "big")
    sof += width.to_bytes(2, "big") + bytes([channels])
    for ci in range(channels):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    out += _marker(0xCA, sof)  # SOF10: progressive DCT, arithmetic
    dac = bytearray()
    for t in range(ntab):
        dac += bytes([0x00 | t, (dc_cond[1] << 4) | dc_cond[0]])
        dac += bytes([0x10 | t, kx])
    out += _marker(0xCC, bytes(dac))

    def _sos(comp_ids_tables, ss, se, ah, al, payload):
        hdr = bytes([len(comp_ids_tables)])
        for cid, td_ta in comp_ids_tables:
            hdr += bytes([cid, td_ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        return _marker(0xDA, hdr) + payload

    all_comps = [(ci + 1, (0x00 if ci == 0 else 0x11)) for ci in range(channels)]
    out += _sos(all_comps, 0, 0, 0, 1, _dc_first(1))
    out += _sos(all_comps, 0, 0, 1, 0, _dc_refine(0))
    for ci in range(channels):
        ta = 0x00 if ci == 0 else 0x11
        out += _sos([(ci + 1, ta)], 1, 5, 0, 1, _ac_scan(ci, 1, 5, 0, 1))
        out += _sos([(ci + 1, ta)], 6, 63, 0, 1, _ac_scan(ci, 6, 63, 0, 1))
        out += _sos([(ci + 1, ta)], 1, 63, 1, 0, _ac_scan(ci, 1, 63, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# SOF10 scan decoder (plugs into jpeg._decode_jpeg_inner's progressive
# multi-scan loop; accumulates into the shared zigzag-order arrays)
# ---------------------------------------------------------------------------


def decode_prog_scan_arith(
    b, pos, sos, frame, cond, restart_interval, prog_coef, prog_grid
):
    """Decode one progressive ARITHMETIC scan into the per-component
    zigzag-order coefficient arrays; returns the offset of the
    terminating marker or None. Restart intervals inside a progressive
    arithmetic scan are gated (this encoder never emits them; guessing
    resync semantics on foreign streams risks silent corruption)."""
    from .jpeg import _BitReader

    if restart_interval:
        return None
    w, h, comps, adobe, prec = frame
    nc_scan = sos[0]
    if len(sos) < 1 + 2 * nc_scan + 3 or not 1 <= nc_scan <= len(comps):
        return None
    ss, se, ahl = sos[1 + 2 * nc_scan : 4 + 2 * nc_scan]
    ah, al = ahl >> 4, ahl & 0xF
    if ss == 0:
        if se != 0:
            return None
        kind = "dc"
    else:
        if not (ss <= se <= 63) or nc_scan != 1:
            return None
        kind = "ac"
    if al > 13 or ah > 13 or (ah and ah != al + 1):
        return None
    cid_index = {cid: ci for ci, (cid, *_r) in enumerate(comps)}
    scan_cis = []
    scan_tables = {}
    for c in range(nc_scan):
        cid, td_ta = sos[1 + 2 * c], sos[2 + 2 * c]
        if cid not in cid_index:
            return None
        scan_cis.append(cid_index[cid])
        scan_tables[cid_index[cid]] = (td_ta >> 4, td_ta & 0xF)
    mcux, mcuy = prog_grid
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    interleaved = nc_scan > 1
    if interleaved:
        units = mcux * mcuy
        gw = gh = 0
    else:
        ci0 = scan_cis[0]
        _, hs, vs, _ = comps[ci0]
        cw = (w * hs + hmax - 1) // hmax
        chh = (h * vs + vmax - 1) // vmax
        gw, gh = (cw + 7) // 8, (chh + 7) // 8
        units = gw * gh

    br = _BitReader(b, pos)
    dec = _QMDecoder(br)
    dc_st = {}
    ac_st = {}
    for ci in scan_cis:
        td, ta = scan_tables[ci]
        dc_st.setdefault(td, bytearray(_DC_BINS))
        ac_st.setdefault(ta, bytearray(_AC_BINS))
    fixed = bytearray([_FIXED])
    dcctx = [0] * len(comps)
    preds = [0] * len(comps)

    for unit in range(units):
        if interleaved:
            my, mx = divmod(unit, mcux)
            blocks = []
            for ci in scan_cis:
                _, hs, vs, _ = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blocks.append((ci, my * vs + by, mx * hs + bx))
        else:
            ci = scan_cis[0]
            by, bx = divmod(unit, gw)
            blocks = [(ci, by, bx)]
        for ci, by, bx in blocks:
            carr = prog_coef[ci]
            td, ta = scan_tables[ci]
            if kind == "dc":
                if ah == 0:
                    dcc = cond.get(("dc", td), (0, 1))
                    got = _decode_dc(dec, dc_st[td], dcctx[ci], dcc)
                    if got is None:
                        return None
                    diff, dcctx[ci] = got
                    preds[ci] += diff
                    carr[by, bx, 0] = preds[ci] << al
                else:
                    # two's-complement OR, exactly the Huffman twin's
                    if dec.decode(fixed, 0):
                        carr[by, bx, 0] = int(carr[by, bx, 0]) | (1 << al)
            else:
                kx = cond.get(("ac", ta), 5)
                blk = carr[by, bx]
                if ah == 0:
                    ok = _dec_ac_first_band(
                        dec, ac_st[ta], fixed, blk, ss, se, al, kx
                    )
                else:
                    ok = _dec_ac_refine_band(
                        dec, ac_st[ta], fixed, blk, ss, se, al
                    )
                if not ok:
                    return None
    # resume header parsing at the scan-terminating marker
    if br.marker is not None:
        return br.pos
    p = br.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            return p
        p += 1
    return None  # truncated: no terminating marker


# ---------------------------------------------------------------------------
# SOF9 scan decoder (plugs into jpeg._decode_jpeg_inner)
# ---------------------------------------------------------------------------


def decode_scan_arith(b, pos, sos, frame, qtables, cond, restart_interval):
    """Decode one interleaved sequential arithmetic scan; returns the
    same ``(w, h, channels, pixels)`` contract as the Huffman scan
    decoders, assembled through the shared batched-IDCT path so pixels
    are bit-identical to the baseline twin's."""
    from .jpeg import _assemble_planes, _BitReader, _ZIGZAG

    w, h, comps, adobe, prec = frame
    nc = sos[0]
    if nc != len(comps) or len(sos) < 1 + 2 * nc + 3:
        return None
    scan_tables = {}
    for c in range(nc):
        cid, td_ta = sos[1 + 2 * c], sos[2 + 2 * c]
        scan_tables[cid] = (td_ta >> 4, td_ta & 0xF)
    for _, hs, vs, tq in comps:
        if tq not in qtables:
            return None
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    zig = list(_ZIGZAG)
    coef = [
        np.zeros((mcuy * vs, mcux * hs, 64), np.int64)
        for _, hs, vs, _ in comps
    ]

    def _fresh(p):
        br = _BitReader(b, p)
        dc_st = {}
        ac_st = {}
        for cid, *_ in comps:
            td, ta = scan_tables.get(cid, (0, 0))
            dc_st.setdefault(td, bytearray(_DC_BINS))
            ac_st.setdefault(ta, bytearray(_AC_BINS))
        return (
            br, _QMDecoder(br), dc_st, ac_st, bytearray([_FIXED]),
            {cid: 0 for cid, *_ in comps}, {cid: 0 for cid, *_ in comps},
        )

    def _terminated(reader) -> bool:
        # Zero-fill past end-of-interval is the spec's convention ONLY
        # once a marker bounds the entropy data; a scan that ran off the
        # end of the buffer is a truncated stream and must fail closed.
        if reader.marker is not None:
            return True
        p = reader.pos
        while p + 1 < len(b):
            if b[p] == 0xFF and b[p + 1] != 0x00:
                return True
            p += 1
        return False

    br, dec, dc_st, ac_st, fixed, dcctx, preds = _fresh(pos)
    mcu_count = 0
    zz = np.zeros(64, np.int64)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # resync: the QM decoder never reads past a marker, so
                # scan forward from its byte position to the RSTn
                if not br.align_and_expect_rst():
                    return None
                br, dec, dc_st, ac_st, fixed, dcctx, preds = _fresh(br.pos)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_tables.get(cid, (0, 0))
                dcc = cond.get(("dc", td), (0, 1))
                kx = cond.get(("ac", ta), 5)
                for by in range(vs):
                    for bx in range(hs):
                        got = _decode_dc(dec, dc_st[td], dcctx[cid], dcc)
                        if got is None:
                            return None
                        diff, dcctx[cid] = got
                        preds[cid] += diff
                        zz[:] = 0
                        zz[0] = preds[cid]
                        if not _decode_ac(dec, ac_st[ta], fixed, zz, kx):
                            return None
                        blk = np.zeros(64, np.int64)
                        blk[zig] = zz
                        coef[ci][my * vs + by, mx * hs + bx] = blk
            mcu_count += 1
    if not _terminated(br):
        return None
    return _assemble_planes(
        coef, comps, qtables, mcux, mcuy, w, h, adobe, prec
    )
