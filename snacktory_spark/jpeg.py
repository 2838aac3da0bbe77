"""Pure-python JPEG codec (baseline + progressive) for the multimodal
pipeline.

The container ships no PIL/libjpeg, but Huffman DCT JPEG needs nothing
beyond numpy: this module implements a real encoder (baseline) and
decoder (baseline AND progressive) for 8-bit JPEG (ITU-T T.81):

- decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF1/SOF2/SOS marker walk,
  canonical Huffman entropy decode (tables read from the file,
  byte-stuffing and RSTn restart handling), dequantize, vectorized 8x8
  IDCT (orthonormal DCT-II matrix via einsum), generic sampling-factor
  MCU layout (4:4:4, 4:2:2, 4:2:0, grayscale), nearest-neighbor chroma
  upsample, JFIF YCbCr->RGB. **Progressive (SOF2) is fully decoded**
  (T.81 Annex G: interleaved/non-interleaved DC first+refinement scans,
  AC spectral-selection first scans with EOB runs, AC successive-
  approximation refinement with correction bits) — cross-validated
  against Java ImageIO's progressive writer. Arithmetic, hierarchical,
  lossless and 12-bit streams raise ImageError.
- encoder: quality-scaled Annex-K quantization tables, Annex-K standard
  Huffman tables, FDCT, 4:4:4 or 4:2:0 (2x2-average chroma downsample),
  optional restart intervals; used to synthesize test/bench fixtures
  (the encoder is how the sandbox gets JPEG bytes at all) and valid as a
  standalone baseline writer.

All table constants (zigzag order, Annex-K quant + Huffman tables) are
public ITU-T T.81 spec data. Reference parity: the reference repo treats
images as opaque fetched bytes (src/main/java/.../HtmlFetcher.java routes
by extension only); decode here serves SURVEY §2's multimodal-column ops.

Hostile-input contract (same as imaging.py/pdf.py): every failure path
raises ImageError — callers map it to ok=false, never a task failure.
Decoded size is capped (MAX_PIXELS) so crafted headers can't OOM an
executor.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import ImageError

MAX_PIXELS = 1 << 24  # 16 MP decoded cap — a header bomb can't OOM a worker

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K — public standard data)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables: (bits[1..16] code counts, symbol values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: row k = s(k)*cos(pi*(2n+1)*k/16)
_DCT_T = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
    for _n in range(8):
        _DCT_T[_k, _n] = _s * np.cos(np.pi * (2 * _n + 1) * _k / 16)
del _k, _s, _n


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial (level-shifted) → (n, 8, 8) DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _DCT_T, blocks, _DCT_T, optimize=True)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficients → (n, 8, 8) spatial (still level-shifted)."""
    return np.einsum("ji,njk,kl->nil", _DCT_T, coefs, _DCT_T, optimize=True)


# ---------------------------------------------------------------------------
# Huffman (canonical, per T.81 C.2)
# ---------------------------------------------------------------------------

def _build_codes(bits, vals):
    """(bits, vals) → list of (symbol, code, length) in canonical order."""
    if sum(bits) != len(vals):
        raise ImageError("DHT count/value mismatch")
    out, code, i = [], 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[i], code, length))
            code += 1
            i += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical-Huffman decode table: (length, code) → symbol."""

    def __init__(self, bits, vals):
        self.table = {(ln, code): sym for sym, code, ln in _build_codes(bits, vals)}

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ImageError("invalid Huffman code in entropy stream")


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ImageError("entropy stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s-bit magnitude code → signed value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw row-major samples).

    channels is 1 (grayscale) or 3 (RGB). Decodes 8-bit baseline,
    extended-sequential and progressive Huffman JPEG; raises ImageError
    on anything else — hostile input contract: never any other
    exception type."""
    try:
        return _decode_jpeg(data)
    except ImageError:
        raise
    except (ValueError, IndexError, struct.error, OverflowError,
            MemoryError) as e:
        raise ImageError(
            f"malformed JPEG: {type(e).__name__}: {e}") from None


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        raise ImageError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) where comps = [(cid, hi, vi, tq)]
    progressive = False
    prog = None  # _ProgState once the first progressive SOS arrives
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ImageError("marker sync lost")
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= len(data):
            raise ImageError("truncated JPEG")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            if prog is not None:
                return _assemble(frame, prog.coefs, qt)
            raise ImageError("EOI before SOS")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone markers
        if pos + 2 > len(data):
            raise ImageError("truncated segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ImageError("truncated segment")
        nxt = pos + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ImageError("16-bit quant tables not supported")
                if p + 65 > len(seg):
                    raise ImageError("truncated DQT")
                zz = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                qt[tq] = zz[UNZIGZAG].astype(np.int32).reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                if len(vals) != n:
                    raise ImageError("truncated DHT")
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            if len(seg) < 6:
                raise ImageError("truncated SOF")
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ImageError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ImageError(f"{nc}-component JPEG not supported")
            if w == 0 or h == 0 or w * h > MAX_PIXELS:
                raise ImageError("image dimensions out of bounds")
            if len(seg) < 6 + 3 * nc:
                raise ImageError("truncated SOF component list")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ImageError("bad sampling factors")
                comps.append((cid, hi, vi, tq))
            frame = (w, h, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageError("lossless/arithmetic/hierarchical JPEG "
                             "not supported")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ImageError("truncated DRI")
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ImageError("SOS before SOF")
            if not progressive:
                return _decode_scan(data, nxt, seg, frame, qt, huff,
                                    restart_interval)
            if prog is None:
                prog = _ProgState(frame)
            pos = _decode_prog_scan(data, nxt, seg, frame, huff,
                                    restart_interval, prog)
            continue
        # APPn / COM / others: skip
        pos = nxt
    if prog is not None:
        # tolerate a missing/truncated EOI after complete scans
        return _assemble(frame, prog.coefs, qt)
    raise ImageError("no SOS marker found")


def _decode_scan(data, pos, seg, frame, qt, huff, restart_interval):
    w, h, comps = frame
    if not seg or len(seg) < 1 + 2 * seg[0]:
        raise ImageError("truncated SOS header")
    ns = seg[0]
    if ns != len(comps):
        raise ImageError("partial/multi-scan files not supported")
    scan_tables = {}
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        scan_tables[cs] = (tdta >> 4, tdta & 0x0F)

    segments, _scan_end = _split_entropy(data, pos)

    max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)

    # per-component coefficient stores, MCU-padded
    planes_coef = []
    for cid, hi, vi, tq in comps:
        if tq not in qt:
            raise ImageError(f"missing quant table {tq}")
        planes_coef.append(np.zeros(
            (mcus_y * vi, mcus_x * hi, 8, 8), dtype=np.int32))

    dc_pred = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ImageError("missing restart segment")
            br = _BitReader(segments[seg_idx])
            dc_pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            if cid not in scan_tables:
                raise ImageError("scan component not in frame")
            td, ta = scan_tables[cid]
            dec_dc = huff.get((0, td))
            dec_ac = huff.get((1, ta))
            if dec_dc is None or dec_ac is None:
                raise ImageError("missing Huffman table")
            for by in range(vi):
                for bx in range(hi):
                    blk = np.zeros(64, dtype=np.int32)
                    s = dec_dc.decode(br)
                    if s > 11:
                        raise ImageError("bad DC category")
                    diff = _extend(br.read_bits(s), s) if s else 0
                    dc_pred[ci] += diff
                    blk[0] = dc_pred[ci]
                    k = 1
                    while k < 64:
                        rs = dec_ac.decode(br)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        if s > 10:  # 8-bit baseline AC cats are 1..10
                            raise ImageError("bad AC category")
                        k += r
                        if k > 63:
                            raise ImageError("AC run past block end")
                        blk[ZIGZAG[k]] = _extend(br.read_bits(s), s)
                        k += 1
                    planes_coef[ci][my * vi + by, mx * hi + bx] = \
                        blk.reshape(8, 8)

    return _assemble(frame, planes_coef, qt)


def _split_entropy(data: bytes, pos: int):
    """Unstuff entropy bytes from `pos`, splitting at RSTn boundaries.
    → (segments, end_pos) where end_pos is the offset of the 0xFF that
    begins the scan-terminating marker (or len(data))."""
    segments, cur = [], bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif m == 0xFF:
            # fill byte before a marker (T.81 B.1.1.2) — legal padding,
            # skip ONE 0xFF and reprocess (review finding: treating
            # FF FF as end-of-scan rejected valid hardware-encoder files)
            i += 1
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker — scan ends
            break
    segments.append(bytes(cur))
    return segments, i


def _mcu_geometry(frame):
    w, h, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    return max_h, max_v, mcus_x, mcus_y


def _assemble(frame, planes_coef, qt):
    """Dequantize + IDCT per component (vectorized), upsample, convert."""
    w, h, comps = frame
    max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        if tq not in qt:
            raise ImageError(f"missing quant table {tq}")
        coefs = planes_coef[ci].reshape(-1, 8, 8) * qt[tq][None, :, :]
        spatial = _idct_blocks(coefs.astype(np.float64)) + 128.0
        nby, nbx = mcus_y * vi, mcus_x * hi
        plane = (spatial.reshape(nby, nbx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
        # upsample to full-resolution grid, then crop
        plane = np.repeat(np.repeat(plane, max_v // vi, axis=0),
                          max_h // hi, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 Annex G, Huffman only
# ---------------------------------------------------------------------------

class _ProgState:
    """Per-component coefficient accumulators across progressive scans."""

    def __init__(self, frame):
        w, h, comps = frame
        max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)
        self.coefs = []
        self.true_blocks = []  # non-interleaved scans walk the TRUE grid
        for cid, hi, vi, tq in comps:
            self.coefs.append(np.zeros((mcus_y * vi, mcus_x * hi, 8, 8),
                                       dtype=np.int32))
            cw = -(-w * hi // max_h)
            ch = -(-h * vi // max_v)
            self.true_blocks.append((-(-ch // 8), -(-cw // 8)))


def _decode_prog_scan(data, pos, seg, frame, huff, restart_interval, prog):
    """Decode one progressive scan into prog.coefs; → scan end offset."""
    w, h, comps = frame
    if not seg or len(seg) < 4 + 2 * seg[0]:
        raise ImageError("truncated SOS header")
    ns = seg[0]
    cid_index = {c[0]: i for i, c in enumerate(comps)}
    scan_comps = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        if cs not in cid_index:
            raise ImageError("scan component not in frame")
        scan_comps.append((cid_index[cs], tdta >> 4, tdta & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
    if ss == 0:
        if se != 0:
            raise ImageError("DC scan with nonzero Se")
    else:
        if ns != 1 or not (ss <= se <= 63):
            raise ImageError("bad AC scan band")
    if al > 13 or ah > 13:
        raise ImageError("bad successive approximation")
    segments, end = _split_entropy(data, pos)

    if ss == 0 and ns > 1:
        _prog_dc_interleaved(segments, frame, huff, restart_interval,
                             prog, scan_comps, ah, al)
    else:
        _prog_noninterleaved(segments, frame, huff, restart_interval,
                             prog, scan_comps[0], ss, se, ah, al)
    return end


def _prog_dc_interleaved(segments, frame, huff, restart_interval, prog,
                         scan_comps, ah, al):
    w, h, comps = frame
    max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)
    dc_pred = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ImageError("missing restart segment")
            br = _BitReader(segments[seg_idx])
            dc_pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, td, _ta in scan_comps:
            cid, hi, vi, tq = comps[ci]
            for by in range(vi):
                for bx in range(hi):
                    blk = prog.coefs[ci][my * vi + by, mx * hi + bx]
                    dc_pred[ci] = _prog_dc_block(
                        blk.reshape(64), br, huff, td, ah, al, dc_pred[ci])


def _prog_noninterleaved(segments, frame, huff, restart_interval, prog,
                         scan_comp, ss, se, ah, al):
    ci, td, ta = scan_comp
    nby, nbx = prog.true_blocks[ci]
    dec_ac = huff.get((1, ta)) if ss else None
    if ss and dec_ac is None:
        raise ImageError("missing Huffman table")
    dc_pred = 0
    eobrun = 0
    seg_idx = 0
    br = _BitReader(segments[0])
    for bidx in range(nby * nbx):
        # in a non-interleaved scan the restart interval counts BLOCKS
        if restart_interval and bidx and bidx % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ImageError("missing restart segment")
            br = _BitReader(segments[seg_idx])
            dc_pred = 0
            eobrun = 0
        by, bx = divmod(bidx, nbx)
        blk = prog.coefs[ci][by, bx].reshape(64)
        if ss == 0:
            dc_pred = _prog_dc_block(blk, br, huff, td, ah, al, dc_pred)
        elif ah == 0:
            eobrun = _ac_first(blk, br, dec_ac, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine(blk, br, dec_ac, ss, se, al, eobrun)


def _prog_dc_block(blk, br, huff, td, ah, al, dc_pred):
    if ah == 0:  # first DC scan: ordinary diff coding, shifted by Al
        dec_dc = huff.get((0, td))
        if dec_dc is None:
            raise ImageError("missing Huffman table")
        s = dec_dc.decode(br)
        if s > 11:
            raise ImageError("bad DC category")
        diff = _extend(br.read_bits(s), s) if s else 0
        dc_pred += diff
        blk[0] = dc_pred << al
    else:  # refinement: one raw bit per block
        if br.read_bit():
            blk[0] |= 1 << al
    return dc_pred


def _ac_first(blk, br, dec_ac, ss, se, al, eobrun):
    """AC spectral-selection first scan for one block (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = dec_ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            return eobrun
        if s > 10:  # 8-bit AC size categories are 1..10 (T.81 F.1.2.2.1)
            raise ImageError("bad AC category")
        k += r
        if k > se:
            raise ImageError("AC run past band end")
        blk[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(blk, br, dec_ac, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (G.1.2.3):
    each already-nonzero coefficient passed gets a correction bit; newly
    significant coefficients arrive as +/-(1<<Al)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = dec_ac.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # NO -1 here (unlike _ac_first): the EOB tail below
                    # consumes the current block's unit itself
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break  # remaining coefs corrected in the EOB tail
                # r == 15: ZRL — pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ImageError("bad refinement magnitude")
                val = p1 if br.read_bit() else m1
            while k <= se:
                c = ZIGZAG[k]
                if blk[c] != 0:
                    if br.read_bit() and (blk[c] & p1) == 0:
                        blk[c] += p1 if blk[c] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ImageError("refinement run past band end")
                blk[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = ZIGZAG[k]
            if blk[c] != 0:
                if br.read_bit() and (blk[c] & p1) == 0:
                    blk[c] += p1 if blk[c] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_component(bw, blocks_q, dc_pred, enc_dc, enc_ac):
    """Huffman-encode one quantized 8x8 block; returns new DC predictor."""
    zz = blocks_q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - dc_pred
    s = int(diff).bit_length() if diff else 0
    code, ln = enc_dc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = enc_ac[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = enc_ac[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """2-D sample plane → (nby*nbx, 8, 8) blocks, edge-padded to 8n."""
    ph = -(-plane.shape[0] // 8) * 8
    pw = -(-plane.shape[1] // 8) * 8
    padded = np.pad(plane, ((0, ph - plane.shape[0]),
                            (0, pw - plane.shape[1])), mode="edge")
    return (padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)), ph // 8, pw // 8


def encode_jpeg(pixels: bytes, width: int, height: int, channels: int = 3,
                quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline sequential JFIF JPEG from raw 8-bit row-major samples.

    channels: 1 (grayscale) or 3 (RGB). subsample=True emits 4:2:0
    (2x2-average chroma downsample); default is 4:4:4. restart_interval>0
    emits DRI + RSTn markers every that many MCUs (resync points real
    encoders place for error resilience)."""
    if channels not in (1, 3):
        raise ImageError("encode_jpeg supports 1 or 3 channels")
    if len(pixels) != width * height * channels:
        raise ImageError("pixel buffer size mismatch")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if channels == 1:
        planes = [arr.reshape(height, width)]
        samplings = [(1, 1)]
    else:
        rgb = arr.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even dims then 2x2 box average
            ph, pw = -(-height // 2) * 2, -(-width // 2) * 2
            def down(p):
                p = np.pad(p, ((0, ph - height), (0, pw - width)),
                           mode="edge")
                return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y, down(cb), down(cr)]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samplings = [(1, 1), (1, 1), (1, 1)]

    qlum = _quality_scale(QUANT_LUM, quality).reshape(8, 8)
    qchrom = _quality_scale(QUANT_CHROM, quality).reshape(8, 8)
    qtables = [qlum] + ([qchrom] if channels == 3 else [])

    # quantized blocks per component, in plane block-row order
    comp_blocks = []
    comp_dims = []
    for ci, plane in enumerate(planes):
        q = qlum if ci == 0 else qchrom
        blocks, nby, nbx = _plane_blocks(plane)
        coefs = _fdct_blocks(blocks - 128.0)
        quantized = np.round(coefs / q[None, :, :]).astype(np.int32)
        # T.81 8-bit baseline bounds coefficients to 11 bits; with an
        # all-ones quant table (quality=100) an adversarial block can
        # quantize to 1025 — clamp like libjpeg's range limit, else the
        # AC table (categories <= 10) has no code for it
        np.clip(quantized, -1023, 1023, out=quantized)
        comp_blocks.append(quantized.reshape(nby, nbx, 8, 8))
        comp_dims.append((nby, nbx))

    enc_dc_lum = {s: (c, ln) for s, c, ln in _build_codes(DC_LUM_BITS, DC_LUM_VALS)}
    enc_ac_lum = {s: (c, ln) for s, c, ln in _build_codes(AC_LUM_BITS, AC_LUM_VALS)}
    enc_dc_chr = {s: (c, ln) for s, c, ln in _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)}
    enc_ac_chr = {s: (c, ln) for s, c, ln in _build_codes(AC_CHROM_BITS, AC_CHROM_VALS)}

    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    mcus_x = -(-width // (8 * max_h))
    mcus_y = -(-height // (8 * max_v))

    bw = _BitWriter()
    entropy = bytearray()
    dc_pred = [0] * len(planes)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            entropy += bw.out
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            dc_pred = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci in range(len(planes)):
            hi, vi = samplings[ci]
            nby, nbx = comp_dims[ci]
            e_dc = enc_dc_lum if ci == 0 else enc_dc_chr
            e_ac = enc_ac_lum if ci == 0 else enc_ac_chr
            for by in range(vi):
                for bx in range(hi):
                    # clamp handles MCU padding beyond the plane's blocks
                    yy = min(my * vi + by, nby - 1)
                    xx = min(mx * hi + bx, nbx - 1)
                    dc_pred[ci] = _encode_component(
                        bw, comp_blocks[ci][yy, xx], dc_pred[ci], e_dc, e_ac)
    bw.flush()
    entropy += bw.out

    out = bytearray(b"\xFF\xD8")  # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for tq, q in enumerate(qtables):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) + zz
    nc = channels
    out += (b"\xFF\xC0" + struct.pack(">H", 8 + 3 * nc) + bytes([8])
            + struct.pack(">HH", height, width) + bytes([nc]))
    for ci in range(nc):
        hi, vi = samplings[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    tables = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if nc == 3:
        tables += [(0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                   (0x11, AC_CHROM_BITS, AC_CHROM_VALS)]
    for tcth, bits, vals in tables:
        payload = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])  # Ss/Se/AhAl
    out += entropy
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
