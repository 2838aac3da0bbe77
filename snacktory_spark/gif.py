"""Pure-python GIF decoder (LZW) for the multimodal pipeline.

GIF87a/GIF89a per the public spec: logical screen descriptor, global and
local color tables, graphic-control extensions (transparency, disposal),
interlacing (4-pass), and the variable-width LZW decompressor (clear /
EOI codes, 12-bit cap, deferred-clear tolerance). Frames are composited
onto the logical screen with full disposal-method semantics — draw-over
(0/1), restore-to-background (2; cleared to the RGB transparent stand-in
when the disposing frame declared the background index transparent), and
restore-previous (3; exact saved-region undo) — so `decode_gif` yields
the first displayed frame and `iter_gif_frames` yields every k-th
composited frame (animation = frame-sampling like av.iter_y4m_luma).

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
        saved = region.copy() if disposal == 3 else None
        if transparent is not None and transparent < len(ct):
            mask = indices != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        if idx % every_k == 0:
            yield idx, canvas.copy()
        if disposal == 2:
            # restore-to-background; when the disposing frame declared
            # the background index transparent, renderers clear to
            # transparent — black is the RGB stand-in (opaque surface)
            if transparent is not None and transparent == bg_idx:
                canvas[top:top + h, left:left + w] = 0
            else:
                canvas[top:top + h, left:left + w] = bg
        elif disposal == 3:  # restore-previous: exact saved-region undo
            canvas[top:top + h, left:left + w] = saved
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


# ---------------------------------------------------------------------------
# Encoder (round-trip partner for the decoder above; GIF is lossless for
# palette images, so encode->decode must recover pixels byte-exactly)
# ---------------------------------------------------------------------------

def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF variable-width LZW compressor — the exact inverse of
    `_lzw_decode` above, including its late width-change rule (the
    decoder bumps when ITS next_code reaches 1<<code_size; the encoder's
    table runs one entry ahead, so the mirrored condition here is
    next_code == (1 << width) + 1) and a clear-code reset when the
    12-bit table fills."""
    if not (1 <= min_code_size <= 8):
        raise ImageError("bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear)
    prefix = -1
    for k in indices:
        if prefix < 0:
            prefix = k
            continue
        code = table.get((prefix, k))
        if code is not None:
            prefix = code
            continue
        emit(prefix)
        if next_code < 4096:
            table[(prefix, k)] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = k
    if prefix >= 0:
        emit(prefix)
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def encode_gif(pixels: bytes, width: int, height: int,
               channels: int = 3) -> bytes:
    """Single-frame GIF89a encoder: exact palette (≤256 unique colors —
    GIF is palette-indexed; quantization is out of scope, callers with
    richer images use PNG/JPEG), global color table, non-interlaced,
    LZW-compressed. decode_gif(encode_gif(px)) == px byte-exactly."""
    if channels not in (1, 3):
        raise ImageError("encode_gif takes 1- or 3-channel pixels")
    if width < 1 or height < 1 or width > 0xFFFF or height > 0xFFFF:
        raise ImageError("GIF dimensions out of bounds")
    if len(pixels) != width * height * channels:
        raise ImageError("pixel buffer size mismatch")
    px = np.frombuffer(pixels, np.uint8).reshape(height * width, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=1)
    palette, indices = np.unique(px, axis=0, return_inverse=True)
    n_colors = palette.shape[0]
    if n_colors > 256:
        raise ImageError(f"GIF encode needs <=256 unique colors "
                         f"(got {n_colors})")
    gct_bits = max(1, int(n_colors - 1).bit_length())
    gct = np.zeros(((1 << gct_bits), 3), np.uint8)
    gct[:n_colors] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    # GCT present | color resolution 8 bits | GCT size field
    out.append(0x80 | 0x70 | (gct_bits - 1))
    out += b"\x00\x00"  # background index, aspect ratio
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    mcs = max(2, gct_bits)  # spec: LZW min code size >= 2
    out.append(mcs)
    body = _lzw_encode(mcs, indices.astype(np.uint8).tobytes())
    for i in range(0, len(body), 255):
        chunk = body[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(frames, delays_cs=10, disposal=1,
                         loop: bool = True) -> bytes:
    """Animated GIF89a encoder: frames are (h, w, 3) uint8 arrays sharing
    one exact global palette (≤256 unique colors ACROSS all frames —
    same scope rule as encode_gif), full-screen draw-over frames with
    per-frame delay (centiseconds) and disposal method, optional
    NETSCAPE2.0 infinite-loop block. Decoding with iter_gif_frames
    composites each frame back byte-exactly (full-screen draw-over)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ImageError("animation needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ImageError("all frames must be (h, w, 3) and equal size")
    if w < 1 or h < 1 or w > 0xFFFF or h > 0xFFFF:
        raise ImageError("GIF dimensions out of bounds")
    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * len(frames)
    if isinstance(disposal, int):
        disposal = [disposal] * len(frames)
    if len(delays_cs) != len(frames) or len(disposal) != len(frames):
        raise ImageError("per-frame delay/disposal length mismatch")
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, indices = np.unique(stack, axis=0, return_inverse=True)
    n_colors = palette.shape[0]
    if n_colors > 256:
        raise ImageError(f"GIF animation needs <=256 unique colors "
                         f"across frames (got {n_colors})")
    gct_bits = max(1, int(n_colors - 1).bit_length())
    gct = np.zeros(((1 << gct_bits), 3), np.uint8)
    gct[:n_colors] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | 0x70 | (gct_bits - 1))
    out += b"\x00\x00"
    out += gct.tobytes()
    if loop:  # NETSCAPE2.0 application extension: loop forever
        out += b"\x21\xFF\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, gct_bits)
    npx = w * h
    for fi in range(len(frames)):
        out += bytes([0x21, 0xF9, 4, (disposal[fi] & 7) << 2])
        out += struct.pack("<H", delays_cs[fi]) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(mcs)
        idx = indices[fi * npx:(fi + 1) * npx].astype(np.uint8)
        body = _lzw_encode(mcs, idx.tobytes())
        for i in range(0, len(body), 255):
            chunk = body[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
