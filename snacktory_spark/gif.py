"""Pure-python GIF decoder (LZW) for the multimodal pipeline.

GIF87a/GIF89a per the public spec: logical screen descriptor, global and
local color tables, graphic-control extensions (transparency, disposal),
interlacing (4-pass), and the variable-width LZW decompressor (clear /
EOI codes, 12-bit cap, deferred-clear tolerance). Frames are composited
onto the logical screen — draw-over (disposal 0/1/3 treated as leave-in-
place; 3 'restore previous' is approximated, noted below) and
restore-to-background (2) — so `decode_gif` yields the first displayed
frame and `iter_gif_frames` yields every k-th composited frame
(animation = frame-sampling like av.iter_y4m_luma).

Unlike the DCT codecs, GIF is palette-indexed and lossless: our decode of
an ImageIO-written file must match ImageIO's own decode EXACTLY —
tests/test_gif.py asserts byte equality.

Hostile-input contract (same as imaging/jpeg/pdf/av): ImageError only;
decoded sizes capped (MAX_PIXELS per frame and per LZW stream) so crafted
headers or LZW bombs can't OOM an executor.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import ImageError

MAX_PIXELS = 1 << 24  # per-frame decoded cap


def _lzw_decode(min_code_size: int, data: bytes, max_out: int) -> bytes:
    """GIF variable-width LZW (LSB-first packing, 12-bit cap)."""
    if not (1 <= min_code_size <= 8):  # GIF spec max: 8 (256 colors)
        raise ImageError("bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    code_size = min_code_size + 1
    next_code = eoi + 1
    out = bytearray()
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = dict(base)
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ImageError("bad first LZW code")
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ImageError("LZW code out of sequence")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        if len(out) > max_out:
            raise ImageError("LZW output exceeds frame size (bomb)")
        prev = entry
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain; → (payload, pos after 0 block)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ImageError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ImageError("truncated sub-block")
        out += data[pos:pos + n]
        pos += n


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def iter_gif_frames(data: bytes, every_k: int = 1):
    """Yield (frame_index, RGB uint8 (h, w, 3)) composited frames.
    Hostile-input contract: ImageError only (generator-wrapped)."""
    it = _iter_gif_frames_impl(data, every_k)
    while True:
        try:
            item = next(it)
        except StopIteration:
            return
        except ImageError:
            raise
        except (ValueError, IndexError, struct.error, OverflowError,
                MemoryError) as e:
            raise ImageError(
                f"malformed GIF: {type(e).__name__}: {e}") from None
        yield item


def _iter_gif_frames_impl(data: bytes, every_k: int = 1):
    if every_k < 1:
        raise ImageError("every_k must be >= 1")
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    flags, bg_idx, _aspect = data[10], data[11], data[12]
    if sw < 1 or sh < 1 or sw * sh > MAX_PIXELS:
        raise ImageError("GIF screen dimensions out of bounds")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ImageError("truncated global color table")
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3).copy()
        pos += 3 * n

    if gct is not None and bg_idx < len(gct):
        bg = gct[bg_idx]
    else:
        bg = np.zeros(3, np.uint8)
    canvas = np.tile(bg, (sh, sw, 1)).astype(np.uint8)

    transparent = None   # index from the pending graphic control ext
    disposal = 0
    idx = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if pos >= len(data):
                raise ImageError("truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                gflags = payload[0]
                disposal = (gflags >> 2) & 0x07
                transparent = payload[3] if gflags & 0x01 else None
            continue
        if b != 0x2C:  # image descriptor is the only other valid block
            raise ImageError(f"unknown GIF block 0x{b:02x}")
        if pos + 9 > len(data):
            raise ImageError("truncated image descriptor")
        left, top, w, h = struct.unpack("<HHHH", data[pos:pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if w < 1 or h < 1 or w * h > MAX_PIXELS:
            raise ImageError("GIF frame dimensions out of bounds")
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                raise ImageError("truncated local color table")
            ct = np.frombuffer(data[pos:pos + 3 * n],
                               np.uint8).reshape(n, 3).copy()
            pos += 3 * n
        if ct is None:
            raise ImageError("GIF frame without any color table")
        if pos >= len(data):
            raise ImageError("truncated image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        pixels = _lzw_decode(min_code, lzw, w * h + 64)
        if len(pixels) < w * h:
            raise ImageError("LZW stream shorter than frame")
        indices = np.frombuffer(pixels[:w * h], np.uint8).reshape(h, w)
        if iflags & 0x40:  # interlaced: reorder rows (4 passes)
            rows = []
            for start, step in _DEINTERLACE:
                rows.extend(range(start, h, step))
            deint = np.empty_like(indices)
            deint[rows, :] = indices
            indices = deint
        if int(indices.max()) >= len(ct):
            raise ImageError("palette index out of range")
        if left + w > sw or top + h > sh:
            raise ImageError("frame rect outside logical screen")
        rgb = ct[indices]
        region = canvas[top:top + h, left:left + w]
        if transparent is not None and transparent < len(ct):
            mask = indices != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        if idx % every_k == 0:
            yield idx, canvas.copy()
        if disposal == 2:  # restore to background for the NEXT frame
            canvas[top:top + h, left:left + w] = bg
        # disposal 3 (restore previous) approximated as leave-in-place
        transparent = None
        disposal = 0
        idx += 1
    raise ImageError("GIF missing trailer")


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """First displayed frame → (width, height, 3, RGB bytes)."""
    for _idx, canvas in iter_gif_frames(data, every_k=1):
        h, w, _ = canvas.shape
        return w, h, 3, canvas.tobytes()
    raise ImageError("GIF contains no image frame")


def count_gif_frames(data: bytes) -> int:
    n = 0
    for _ in iter_gif_frames(data, every_k=1):
        n += 1
    return n
