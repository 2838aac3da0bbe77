"""VP9-shaped raw-frame codec — real bool-coder machinery, marked tier.

Moves VP9 from declared stub to the audio tiers' self-consistent
contract (mpeg.py's two-tier model). What is REAL and public here:

- the IVF container and the VP9 UNCOMPRESSED frame header — written
  and parsed through containers.build_ivf / vp9_frame_header (frame
  marker, profile, keyframe sync code, color config, coded size);
- the BOOLEAN ARITHMETIC CODER: the exact range coder VP8/VP9 entropy
  coding runs on, implemented from its full public specification (RFC
  6386 §§7-8 documents the decoder and encoder with reference C; VP9
  reuses the identical mechanism) — 8-bit probability split,
  renormalization at range < 128, carry propagation on the encode
  side. Round-tripped against itself across the probability range in
  tests; this is the machinery whose ABSENCE kept VP9 a stub.

Substituted (documented, same honesty contract as Layer III / AAC):
everything between the bool coder and the pixels — VP9's default
probability tables, symbol trees, intra prediction, transform and
loop filter are replaced by the simplest model the coder supports:
each pixel is 8 bool-coded literal bits at probability 128, preceded
by a bool-coded zero-run flag at probability 200 (a non-uniform
probability, so the renormalization/carry paths are genuinely
exercised) that run-length-skips rows of zeros. Consequence:
encode→decode round-trips BIT-EXACTLY (literals are lossless), but
the payload is NOT a conformant VP9 compressed frame — a real VP9
decoder would reject it, and a real VP9 frame would decode to garbage
through this model. The payload therefore opens with a bool-coded
24-bit marker; a frame without it raises (the guard analog of the
MPEG tiers' private bit — here a false accept is ~2^-24).

Hostile-input contract (CLAUDE.md): public decode raises ImageError
only; caps before allocation.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import ImageError

_MARKER = 0x5A9C3E               # bool-coded stream marker (24 bits)
_P_LIT = 128                     # literal bits: equiprobable
_P_RUN = 200                     # zero-run flag: skewed (carry paths)
MAX_PIXELS_VP9 = 1 << 24         # per-frame cap
MAX_TOTAL_PIXELS_VP9 = 1 << 26   # aggregate decode cap: the zero-run
# RLE makes compact payloads expand (a ~520-byte all-zero 4096x4096
# frame decodes to 16.7 MB), so the TOTAL output must be bounded
# before each frame's allocation — the MAX_DECODE_SAMPLES analog
# (review finding r7: without this the decoder is a decompression
# bomb, ~14,650x amplification per crafted frame)


class _BoolEncoder:
    """RFC 6386 §8 range encoder (the VP8/VP9 bool coder)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def put(self, p: int, bit: int):
        split = 1 + (((self.range - 1) * p) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            if self.bottom & (1 << 31):          # carry propagation
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                if i < 0:
                    raise ImageError("bool-coder carry underflow")
                self.out[i] += 1
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.range <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def literal(self, v: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.put(_P_LIT, (v >> i) & 1)

    def finish(self) -> bytes:
        for _ in range(32):
            self.put(_P_LIT, 0)
        return bytes(self.out)


class _BoolDecoder:
    """RFC 6386 §7 range decoder."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        if len(data) < 2:
            raise ImageError("bool-coded payload too short")
        self.value = (data[0] << 8) | data[1]
        self.range = 255
        self.bit_count = 0

    def get(self, p: int) -> int:
        split = 1 + (((self.range - 1) * p) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return bit

    def literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.get(_P_LIT)
        return v


def encode_vp9_raw(frames: list[np.ndarray], fps: int = 30,
                   keyframe_interval: int = 8) -> bytes:
    """Grayscale frames (h, w) uint8 → an IVF/VP90 stream whose frames
    carry real VP9 uncompressed headers followed by this module's
    bool-coded raw-pixel payload (marker + zero-run-flagged literal
    rows). Lossless by construction; see the module docstring for what
    is real vs substituted."""
    if not frames:
        raise ImageError("no frames")
    f0 = np.asarray(frames[0])
    if f0.ndim != 2:
        raise ImageError("frames must be 2-D grayscale")
    h, w = f0.shape
    if not (1 <= w <= 0xFFFF and 1 <= h <= 0xFFFF):
        raise ImageError("frame dimensions out of range")
    if w * h > MAX_PIXELS_VP9:
        raise ImageError("frame exceeds pixel cap")
    from .containers import write_ivf_header, write_vp9_frame_header
    payloads = []
    for fi, frame in enumerate(frames):
        fr = np.asarray(frame)
        if fr.shape != (h, w) or fr.dtype != np.uint8:
            raise ImageError("all frames must be uint8 with one shape")
        # real uncompressed header — the ONE writer the scanner's
        # parser round-trips (containers.write_vp9_frame_header)
        hdr = write_vp9_frame_header(fi % keyframe_interval == 0, w, h)
        enc = _BoolEncoder()
        enc.literal(_MARKER, 24)
        for row in fr:
            if not row.any():
                enc.put(_P_RUN, 1)           # zero row: one flag bit
                continue
            enc.put(_P_RUN, 0)
            for v in row:
                enc.literal(int(v), 8)
        payloads.append(hdr + enc.finish())
    out = bytearray(write_ivf_header(len(frames), w, h, fps))
    for fi, body in enumerate(payloads):
        out += struct.pack("<IQ", len(body), fi)
        out += body
    return bytes(out)


def decode_vp9_raw(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode an encode_vp9_raw stream → (width, height, [frames]),
    bit-exact. The real IVF walk and VP9 uncompressed-header parse come
    from containers; the payload must open with this module's
    bool-coded marker — a conformant (real-entropy) VP9 frame fails
    that check and raises, instead of silently decoding garbage through
    the substituted model."""
    try:
        return _decode_vp9_raw(data)
    except ImageError:
        raise
    except (ValueError, IndexError, struct.error, OverflowError,
            MemoryError) as e:
        raise ImageError(f"malformed VP9-raw: {type(e).__name__}: {e}") \
            from None


def _decode_vp9_raw(data: bytes):
    from .containers import ivf_info, vp9_frame_header
    info = ivf_info(data)
    if info["fourcc"] != "VP90":
        raise ImageError("not a VP90 IVF stream")
    w, h = info["width"], info["height"]
    if w * h > MAX_PIXELS_VP9:
        raise ImageError("frame exceeds pixel cap")
    frames = []
    # start at the DECLARED header size (ivf_info validated it): a
    # legal hdr_size > 32 would misalign a hardcoded-32 walk into
    # garbage frame records (review finding r7)
    pos = info["header_bytes"]
    while pos + 12 <= len(data):
        size, _pts = struct.unpack_from("<IQ", data, pos)
        if pos + 12 + size > len(data):
            break
        if (len(frames) + 1) * w * h > MAX_TOTAL_PIXELS_VP9:
            raise ImageError("VP9-raw output exceeds total pixel cap")
        payload = data[pos + 12:pos + 12 + size]
        fh = vp9_frame_header(payload)
        # header length in bytes: the bit layout the encoder wrote —
        # keyframe 8+24+4+32+1 = 69 bits -> 9 bytes; inter 8 bits -> 1
        hdr_len = 9 if fh["keyframe"] else 1
        dec = _BoolDecoder(payload[hdr_len:])
        if dec.literal(24) != _MARKER:
            raise ImageError(
                "payload lacks this module's bool-coded marker: a "
                "conformant VP9 compressed frame cannot be decoded "
                "through the substituted entropy model (see vp9.py)")
        fr = np.zeros((h, w), dtype=np.uint8)
        for y in range(h):
            if dec.get(_P_RUN):
                continue                     # zero row
            for x in range(w):
                fr[y, x] = dec.literal(8)
        frames.append(fr)
        pos += 12 + size
    if not frames:
        raise ImageError("no VP9-raw frames")
    return w, h, frames
