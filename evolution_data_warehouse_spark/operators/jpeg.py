"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF).

Removes the repo's last gated decode path: ``decode_image_auto`` can
now parse real baseline-sequential JPEG (SOF0) — Huffman entropy
decode, dequantize, inverse zigzag, 8x8 IDCT, chroma upsampling for
arbitrary 1-2 sampling factors, YCbCr→RGB — with no PIL/libjpeg.
Progressive JPEG (SOF2, Huffman — the majority mode in real web
corpora) decodes too: spectral-selection + successive-approximation
scans accumulate into per-block integer coefficient grids, then the
shared dequantize/IDCT/upsample tail runs once, so a progressive
stream decodes BIT-IDENTICALLY to its baseline equivalent (the
progressive round-trip test asserts exactly that). Arithmetic-coded
JPEG raises ValueError: a genuinely different entropy path, stated
plainly rather than half-supported.

The encoder exists to make the decoder testable hermetically (the
container has no image libraries to synthesize fixtures with): it
emits spec-compliant baseline 4:4:4 JPEG using the Annex K example
Huffman tables. With all-ones quant tables the only loss is DCT
integer rounding, so decode-of-encode reconstructs the source image
within a tight, assertable bound (tests check max|err| <= 2) — a real
end-to-end proof of both halves.

Everything is deterministic: integer/bit operations plus IEEE double
DCT with a fixed basis matrix — identical output for identical bytes
on any partitioning.

Reference behavior being re-expressed: the reference pipeline treats
media as opaque blobs and delegates decode to client tools; this
implements the decode step the curation extension suite
(operators/multimodal.py) stubs for JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

#: Decode-side sanity cap on frame pixels: a corrupt SOF can declare
#: 65535x65535 (a 12.9 GB RGB allocation) — reject before allocating so
#: corrupt objects cannot OOM an executor. 2^26 px covers any real
#: photographic asset by a wide margin.
_MAX_PIXELS = 1 << 26

# 8x8 DCT-II basis matrix: row k = c(k)/2 * cos((2n+1)k*pi/16).
_C = np.array(
    [
        [
            (np.sqrt(0.125) if k == 0 else 0.5)
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# Annex K (T.81 Tables K.3-K.6) example Huffman tables:
# (bits[1..16] counts, symbol values).
DC_LUM_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical Huffman per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, all-ones quant)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC value → (size category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(block: np.ndarray) -> np.ndarray:
    """Level-shifted 8x8 → zigzagged integer coefficients (q=1)."""
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.floor(coef + 0.5).astype(np.int64)
    return q.reshape(-1)[ZIGZAG]


def _encode_block(
    bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes: dict, ac_codes: dict
) -> int:
    """Entropy-encode one zigzagged block; returns the new DC pred."""
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    bw.put(code, length)
    if size:
        bw.put(bits, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i] != 0), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.put(code, length)
        bw.put(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, subsample: bool = False) -> bytes:
    """RGB uint8 (h, w, 3) → baseline JFIF bytes (quant=1).

    ``subsample=False`` emits 4:4:4; ``subsample=True`` emits 4:2:0
    (chroma box-averaged 2x2, MCU = 4 Y blocks + Cb + Cr) so the
    decoder's sampling-factor/upsample path has a hermetic fixture.
    """
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
    yp, cbp, crp = (
        np.clip(np.floor(p + 0.5), 0, 255).astype(np.float64)
        for p in (y, cb, cr)
    )
    if subsample:
        # pad to even dims by edge replication, then 2x2 box average
        def down(p: np.ndarray) -> np.ndarray:
            ph = np.pad(
                p,
                ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                mode="edge",
            )
            return np.floor(
                (ph[0::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 0::2]
                 + ph[1::2, 1::2]) / 4.0 + 0.5
            )

        cbp, crp = down(cbp), down(crp)
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    planes = [yp, cbp, crp]

    dc_codes = [_build_codes(DC_LUM_BITS, DC_LUM_VALS),
                _build_codes(DC_CHR_BITS, DC_CHR_VALS)]
    ac_codes = [_build_codes(AC_LUM_BITS, AC_LUM_VALS),
                _build_codes(AC_CHR_BITS, AC_CHR_VALS)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, plane in enumerate(planes):
                ch, cv = samp[ci]
                tbl = 0 if ci == 0 else 1
                ph, pw = plane.shape
                for by in range(cv):
                    for bx in range(ch):
                        ys = np.minimum(
                            np.arange((my * cv + by) * 8, (my * cv + by) * 8 + 8),
                            ph - 1,
                        )
                        xs = np.minimum(
                            np.arange((mx * ch + bx) * 8, (mx * ch + bx) * 8 + 8),
                            pw - 1,
                        )
                        zz = _fdct_quant(plane[np.ix_(ys, xs)])
                        pred[ci] = _encode_block(
                            bw, zz, pred[ci], dc_codes[tbl], ac_codes[tbl]
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qtab = bytes([0]) + bytes(np.ones(64, dtype=np.uint8))
    qtab1 = bytes([1]) + bytes(np.ones(64, dtype=np.uint8))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (cid, tq), (sh, sv) in zip(((1, 0), (2, 1), (3, 1)), samp):
        sof += struct.pack(">BBB", cid, sh << 4 | sv, tq)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([cls << 4 | tid]) + bytes(bits[1:]) + bytes(vals)

    sos = struct.pack(">B", 3)
    for cid, tbl in ((1, 0), (2, 1), (3, 1)):
        sos += struct.pack(">BB", cid, tbl << 4 | tbl)
    sos += struct.pack(">BBB", 0, 63, 0)

    return b"".join(
        [
            b"\xff\xd8",
            seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(0xFFDB, qtab),
            seg(0xFFDB, qtab1),
            seg(0xFFC0, sof),
            seg(0xFFC4, dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)),
            seg(0xFFC4, dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)),
            seg(0xFFC4, dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)),
            seg(0xFFC4, dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)),
            seg(0xFFDA, sos),
            bytes(bw.out),
            b"\xff\xd9",
        ]
    )


# ---------------------------------------------------------------------------
# progressive encoder (4:4:4, all-ones quant) — hermetic test fixture
# ---------------------------------------------------------------------------


def _emit_ac_first_band(
    bw: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, ac: dict
) -> None:
    """AC-first scan, one block's band: run/size coding of the
    point-transformed magnitudes, per-block EOB (run length 1 — valid,
    just less compact than cross-block EOBRUN accumulation)."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if a == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, bits = _magnitude(a if v > 0 else -a)
        code, ln = ac[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if run > 0:
        code, ln = ac[0x00]  # EOB
        bw.put(code, ln)


def _emit_ac_refine_band(
    bw: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, ac: dict
) -> None:
    """AC refinement scan, one block's band (T.81 G.1.2.3 mirrored):
    newly significant coefficients (|v|>>Al == 1) emit (run<<4)|1 plus
    a sign bit; already-nonzero ones queue one correction bit, flushed
    after the next emitted symbol; the trailing EOB carries the rest."""
    absv = [abs(int(zz[k])) >> al for k in range(64)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eob = k
    run = 0
    pending: list[int] = []

    def _flush() -> None:
        for bit in pending:
            bw.put(bit, 1)
        pending.clear()

    for k in range(ss, se + 1):
        a = absv[k]
        if a == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            code, ln = ac[0xF0]
            bw.put(code, ln)
            run -= 16
            _flush()
        if a > 1:  # nonzero history: correction bit (bit Al of |v|)
            pending.append((abs(int(zz[k])) >> al) & 1)
            continue
        code, ln = ac[(run << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if int(zz[k]) > 0 else 0, 1)
        _flush()
        run = 0
    if run > 0 or pending:
        code, ln = ac[0x00]
        bw.put(code, ln)
        _flush()


def encode_jpeg_progressive(
    pixels: np.ndarray, restart_interval: int = 0
) -> bytes:
    """RGB uint8 (h, w, 3) → progressive (SOF2) JFIF bytes, 4:4:4,
    quant=1. Scan script (the common libjpeg shape): interleaved
    DC-first at Al=1, DC refinement to Al=0, then per component the
    AC bands 1-5 and 6-63 at Al=1 followed by a full-band refinement
    to Al=0 — exercising every progressive decode path (EOB runs, ZRL,
    insertions, correction bits). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every N units in every scan (DC
    prediction resets; per-block EOB coding means no EOB run ever
    spans an interval). Carries the same coefficients as
    ``encode_jpeg``, so decoding both must produce identical pixels.
    """
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
    planes = [
        np.clip(np.floor(p + 0.5), 0, 255).astype(np.float64)
        for p in (y, cb, cr)
    ]
    bwx, bhy = -(-w // 8), -(-h // 8)
    coef = np.zeros((3, bhy, bwx, 64), dtype=np.int64)
    for ci, plane in enumerate(planes):
        ph, pw = plane.shape
        for by in range(bhy):
            ys = np.minimum(np.arange(by * 8, by * 8 + 8), ph - 1)
            for bx in range(bwx):
                xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), pw - 1)
                coef[ci, by, bx] = _fdct_quant(plane[np.ix_(ys, xs)])

    dc_codes = [_build_codes(DC_LUM_BITS, DC_LUM_VALS),
                _build_codes(DC_CHR_BITS, DC_CHR_VALS)]
    ac_codes = [_build_codes(AC_LUM_BITS, AC_LUM_VALS),
                _build_codes(AC_CHR_BITS, AC_CHR_VALS)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos(scomps: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(scomps)])
        for cid, td, ta in scomps:
            body += struct.pack(">BB", cid, td << 4 | ta)
        body += bytes([ss, se, ah << 4 | al])
        return seg(0xFFDA, body)

    ri = restart_interval

    def _rst(bw: _BitWriter, n: int, m: list[int], pred=None) -> None:
        """Emit an RSTn boundary before unit n when the interval says so."""
        if not ri or n == 0 or n % ri:
            return
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + (m[0] % 8)])
        m[0] += 1
        if pred is not None:
            pred[:] = [0, 0, 0]

    scans: list[bytes] = []
    # scan 1: interleaved DC first, Al=1 — diffs in the shifted domain
    bw = _BitWriter()
    pred = [0, 0, 0]
    m = [0]
    n = 0
    for by in range(bhy):
        for bx in range(bwx):
            _rst(bw, n, m, pred)
            n += 1
            for ci in range(3):
                t = 0 if ci == 0 else 1
                v = int(coef[ci, by, bx, 0]) >> 1
                size, bits = _magnitude(v - pred[ci])
                pred[ci] = v
                code, ln = dc_codes[t][size]
                bw.put(code, ln)
                if size:
                    bw.put(bits, size)
    bw.flush()
    scans.append(sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
                 + bytes(bw.out))
    # scan 2: interleaved DC refinement to Al=0 — one raw bit per block
    bw = _BitWriter()
    m = [0]
    n = 0
    for by in range(bhy):
        for bx in range(bwx):
            _rst(bw, n, m)
            n += 1
            for ci in range(3):
                bw.put(int(coef[ci, by, bx, 0]) & 1, 1)
    bw.flush()
    scans.append(sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
                 + bytes(bw.out))
    # per component: AC bands at Al=1, then full-band refinement to Al=0
    for ci in range(3):
        t = 0 if ci == 0 else 1
        cid = ci + 1
        for ss, se, ah, al, emit in (
            (1, 5, 0, 1, _emit_ac_first_band),
            (6, 63, 0, 1, _emit_ac_first_band),
            (1, 63, 1, 0, _emit_ac_refine_band),
        ):
            bw = _BitWriter()
            m = [0]
            n = 0
            for by in range(bhy):
                for bx in range(bwx):
                    _rst(bw, n, m)
                    n += 1
                    emit(bw, coef[ci, by, bx], ss, se, al, ac_codes[t])
            bw.flush()
            scans.append(sos([(cid, 0, t)], ss, se, ah, al) + bytes(bw.out))

    qtab = bytes([0]) + bytes(np.ones(64, dtype=np.uint8))
    qtab1 = bytes([1]) + bytes(np.ones(64, dtype=np.uint8))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([cls << 4 | tid]) + bytes(bits[1:]) + bytes(vals)

    return b"".join(
        [
            b"\xff\xd8",
            seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(0xFFDB, qtab),
            seg(0xFFDB, qtab1),
            seg(0xFFC2, sof),
            seg(0xFFC4, dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)),
            seg(0xFFC4, dht(0, 1, DC_CHR_BITS, DC_CHR_VALS)),
            seg(0xFFC4, dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)),
            seg(0xFFC4, dht(1, 1, AC_CHR_BITS, AC_CHR_VALS)),
            *([seg(0xFFDD, struct.pack(">H", ri))] if ri else []),
            *scans,
            b"\xff\xd9",
        ]
    )


# ---------------------------------------------------------------------------
# decoder (baseline sequential, arbitrary 1-2 sampling, restart markers)
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # real marker (EOI etc.): pad with zeros per spec
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """JFIF bytes → (width, height, RGB uint8 array).

    Supports SOF0/SOF1 baseline with 1, 3 (YCbCr) or any component
    count decoded independently, sampling factors 1-2, multiple
    DQT/DHT segments, and DRI/RSTn restart intervals; SOF2
    (progressive, Huffman) dispatches to the multi-scan decoder.
    Arithmetic-coded and hierarchical modes raise ValueError.

    Error contract: EVERY malformed input fails with ValueError. A
    valid stream never reads past a buffer or a segment header, so an
    IndexError/struct.error inside the parser IS a malformed-input
    signal — converted here rather than guarded at each of the dozens
    of read sites (an arbitrary-truncation fuzz holds this contract;
    per-row pipelines at corpus scale need one catchable class, not a
    worker crash)."""
    try:
        return _decode_jpeg_impl(data)
    except (
        IndexError, struct.error, KeyError, ZeroDivisionError,
        OverflowError,
    ) as exc:
        # KeyError: a scan referencing an undefined DQT/DHT table id;
        # ZeroDivisionError: a zero sampling factor in SOF;
        # OverflowError: corrupt entropy data driving an accumulator
        # outside int64. All are byte-corruption shapes truncation
        # fuzzing cannot produce — valid streams never raise them, so
        # they're data errors too.
        raise ValueError(
            f"truncated or corrupt JPEG stream ({type(exc).__name__})"
        ) from exc


def _decode_jpeg_impl(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = -1
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        length = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq == 0:
                    qtabs[tq] = np.frombuffer(
                        body[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
                else:
                    qtabs[tq] = np.frombuffer(
                        body[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.int64)
                    i += 129
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = [0] + list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                tab = _build_decoder(bits, vals)
                (dc_tabs if cls == 0 else ac_tabs)[tid] = tab
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if h * w > _MAX_PIXELS:
                raise ValueError(
                    f"implausible JPEG dimensions {w}x{h} "
                    f"(cap {_MAX_PIXELS} pixels)"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker == 0xC2:  # SOF2: progressive — different scan model
            return _decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode SOF{marker - 0xC0} "
                "(baseline SOF0/SOF1 and progressive SOF2 are implemented)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + si * 2 : 3 + si * 2]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tabs >> 4, tabs & 0x0F
            scan_pos = pos + 2 + length
            break
        pos += 2 + length
    if scan_pos < 0 or not comps:
        raise ValueError("no SOS/SOF found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )

    br = _BitReader(data, scan_pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_idx = 0
    my = mx = 0
    while my < mcuy:
        try:
            for c in comps:
                qt = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        s = _decode_huff(br, dc_tabs[c["td"]])
                        diff = _extend(br.bits(s), s)
                        pred[c["id"]] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tabs[c["ta"]])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = (zz * qt)[_UNZIGZAG].reshape(8, 8)
                        block = _C.T @ coef.astype(np.float64) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_idx += 1
            mx += 1
            if mx == mcux:
                mx = 0
                my += 1
            if (
                restart_interval
                and mcu_idx % restart_interval == 0
                and my < mcuy
            ):
                br.align_to_marker()
                # After discarding pad bits the reader sits exactly on
                # the marker in a well-formed stream — anything else
                # means the stream is corrupt, and scanning forward for
                # marker-like bytes would silently swallow entropy data
                # (or run off the buffer); fail the decode contract
                # loudly instead.
                if not (
                    br.pos + 1 < len(data)
                    and data[br.pos] == 0xFF
                    and 0xD0 <= data[br.pos + 1] <= 0xD7
                ):
                    raise ValueError("expected restart marker")
                br.pos += 2
                pred = {c["id"]: 0 for c in comps}
        except _RestartMarker:
            br.pos += 2
            br.align_to_marker()
            pred = {c["id"]: 0 for c in comps}

    return _assemble_rgb(comps, w, h, hmax, vmax)


def _assemble_rgb(
    comps: list[dict], w: int, h: int, hmax: int, vmax: int
) -> tuple[int, int, np.ndarray]:
    """Upsample each component's ``plane`` to full resolution and
    color-convert — shared tail of the baseline and progressive paths."""
    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return w, h, np.stack([g, g, g], axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.floor(ch + 0.5), 0, 255) for ch in (r, g, b)], axis=2
    ).astype(np.uint8)
    return w, h, rgb


# ---------------------------------------------------------------------------
# progressive decoder (SOF2, spectral selection + successive approximation)
# ---------------------------------------------------------------------------
#
# T.81 Annex G (Huffman progressive). A progressive stream carries the
# SAME coefficients as a baseline stream, delivered across multiple
# scans: DC-first (point-transformed by Al), DC refinement (one raw bit
# per block), AC-first over a spectral band [Ss, Se] with EOB-run
# coding, and AC refinement (correction bits for already-nonzero
# coefficients + newly visible +-1<<Al insertions). Decode therefore
# accumulates integer coefficients per block across scans and runs the
# dequantize/IDCT/upsample tail once at the end — bit-identically to
# decoding the equivalent baseline stream.


def _comp_blocks(c: dict, w: int, h: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Non-interleaved scan block grid (T.81 A.2.2): the component's own
    sampled dimensions, NOT the MCU-padded grid."""
    cw = -(-(w * c["h"]) // hmax)
    ch = -(-(h * c["v"]) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _dc_unit(
    br: _BitReader, c: dict, blk: np.ndarray, pred: dict, ah: int, al: int,
    dc_tabs: dict,
) -> None:
    if ah == 0:
        s = _decode_huff(br, dc_tabs[c["td"]])
        pred[c["id"]] += _extend(br.bits(s), s)
        blk[0] = pred[c["id"]] << al
    elif br.bit():
        blk[0] |= 1 << al


def _ac_first_block(
    br: _BitReader, tab: dict, zz: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """First (Ah=0) AC scan for one block; returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index out of range in progressive scan")
        zz[k] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(
    br: _BitReader, tab: dict, zz: np.ndarray, ss: int, se: int, al: int,
    eobrun: int,
) -> int:
    """Refinement (Ah>0) AC scan for one block (T.81 G.1.2.3): newly
    visible coefficients arrive as +-1<<Al; every already-nonzero
    coefficient crossed on the way carries one correction bit."""
    p1, m1 = 1 << al, -1 << al

    def _correct(k: int) -> None:
        c = int(zz[k])
        if br.bit() and (c & p1) == 0:
            zz[k] = c + (p1 if c >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                # spec: s == 1 (one newly significant coefficient)
                val = p1 if br.bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                break
            # advance past r zero-history coefficients, refining
            # nonzero-history ones crossed on the way (r == 15 with
            # s == 0 is ZRL: 16 zero-history positions, no insertion)
            while k <= se:
                if zz[k] != 0:
                    _correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    data: bytes, pos: int, scomps: list[dict], ss: int, se: int, ah: int,
    al: int, dc_tabs: dict, ac_tabs: dict, ri: int, mcux: int, mcuy: int,
    hmax: int, vmax: int, w: int, h: int,
) -> int:
    """Decode one scan's entropy data starting at ``pos``; mutates the
    components' coefficient grids and returns the byte position of the
    next marker."""
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in scomps}
    state = {"eobrun": 0}

    def _restart(done: int, total: int) -> None:
        if not ri or done == 0 or done % ri or done == total:
            return
        br.align_to_marker()
        if not (
            br.pos + 1 < len(data)
            and data[br.pos] == 0xFF
            and 0xD0 <= data[br.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        br.pos += 2
        state["eobrun"] = 0
        for cid in pred:
            pred[cid] = 0

    try:
        if ss == 0 and len(scomps) > 1:  # interleaved DC scan
            total = mcux * mcuy
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    _restart(n, total)
                    for c in scomps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                                _dc_unit(br, c, blk, pred, ah, al, dc_tabs)
                    n += 1
        else:  # non-interleaved (single-component) DC or AC scan
            if len(scomps) != 1:
                raise ValueError("progressive AC scan must be single-component")
            c = scomps[0]
            bwx, bhy = _comp_blocks(c, w, h, hmax, vmax)
            total = bwx * bhy
            n = 0
            for by in range(bhy):
                for bx in range(bwx):
                    _restart(n, total)
                    blk = c["coef"][by, bx]
                    if ss == 0:
                        _dc_unit(br, c, blk, pred, ah, al, dc_tabs)
                    elif ah == 0:
                        state["eobrun"] = _ac_first_block(
                            br, ac_tabs[c["ta"]], blk, ss, se, al,
                            state["eobrun"],
                        )
                    else:
                        state["eobrun"] = _ac_refine_block(
                            br, ac_tabs[c["ta"]], blk, ss, se, al,
                            state["eobrun"],
                        )
                    n += 1
    except _RestartMarker as exc:
        raise ValueError("unexpected restart marker in scan") from exc
    except IndexError as exc:
        raise ValueError("truncated progressive scan") from exc
    br.align_to_marker()
    return br.pos


def _decode_progressive(data: bytes) -> tuple[int, int, np.ndarray]:
    """SOF2 progressive JFIF bytes → (width, height, RGB uint8)."""
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    saw_scan = False
    saw_eoi = False
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        length = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq == 0:
                    qtabs[tq] = np.frombuffer(
                        body[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
                else:
                    qtabs[tq] = np.frombuffer(
                        body[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.int64)
                    i += 129
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = [0] + list(body[i + 1 : i + 17])
                nsym = sum(bits)
                vals = list(body[i + 17 : i + 17 + nsym])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _build_decoder(
                    bits, vals
                )
                i += 17 + nsym
        elif marker == 0xC2:  # SOF2
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if h * w > _MAX_PIXELS:
                raise ValueError(
                    f"implausible JPEG dimensions {w}x{h} "
                    f"(cap {_MAX_PIXELS} pixels)"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["coef"] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — one of possibly many scans
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scomps = []
            for si in range(ns):
                cid, tabs = body[1 + si * 2 : 3 + si * 2]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tabs >> 4, tabs & 0x0F
                        scomps.append(c)
            ss, se = body[1 + ns * 2], body[2 + ns * 2]
            ahal = body[3 + ns * 2]
            pos = _progressive_scan(
                data, pos + 2 + length, scomps, ss, se, ahal >> 4,
                ahal & 0x0F, dc_tabs, ac_tabs, restart_interval,
                mcux, mcuy, hmax, vmax, w, h,
            )
            saw_scan = True
            continue
        pos += 2 + length
    if not comps or not saw_scan:
        raise ValueError("no SOS/SOF found")
    if not saw_eoi:
        # A progressive prefix ending cleanly after scan k is a VALID
        # coarser image to a display decoder — browsers render it — but
        # a data pipeline must not silently emit half-refined pixels
        # from a truncated object; EOI is the integrity seal.
        raise ValueError("truncated progressive JPEG (missing EOI)")

    for c in comps:
        qt = qtabs[c["tq"]]
        nat = (c["coef"] * qt)[:, :, _UNZIGZAG].astype(np.float64)
        by, bx = nat.shape[:2]
        blocks = _C.T @ nat.reshape(by, bx, 8, 8) @ _C + 128.0
        c["plane"] = blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return _assemble_rgb(comps, w, h, hmax, vmax)
